#!/usr/bin/env python
"""Same-session A/B harness used for the r7 merge-fusion EXPERIMENT.

Historical note: when this was written, merge(deduped=False) folded the
in-batch dedup into the bucket repartition (single exchange).  The
experiment's verdict — fused wins single large batches but loses the
chunked headline replay 2-3× to bucket-hash collision skew (guide §2.5;
see OPTIMIZATION_r07.md §3) — led to REVERTING the fusion, so today both
modes plan the same two-shuffle pipeline:

  A: standalone last_wins dedup (exchange on key) → merge(deduped=True)
     (second exchange on bucket);
  B: merge(deduped=False) → the same last_wins inside merge().

Kept as the measurement tool (interleaved best-of-N with a mini host probe
per leg, plus a snapshot-equality check) for any future write-path change.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import CPUS, mini_probe  # noqa: E402
from go_data_publisher_spark.lake.table import TranscriptTable  # noqa: E402
from go_data_publisher_spark.operators.dedup import last_wins  # noqa: E402
from go_data_publisher_spark.session import get_spark  # noqa: E402
from go_data_publisher_spark.sources.changelog import generate_changelog  # noqa: E402


def main():
    n_events = int(os.environ.get("AB_EVENTS", "1000000"))
    reps = int(os.environ.get("AB_REPS", "3"))
    spark = get_spark(app_name="merge_ab", cores=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    mini_probe(spark)

    log = generate_changelog(spark, n_events,
                             n_convs=max(200, n_events // 500), seed=42) \
        .where("conv_id is not null and turn_idx is not null").persist()
    log.count()
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_ab_", dir=scratch)
    results = {"n_events": n_events,
               "A_two_shuffle": [], "B_fused": [], "probes": []}
    try:
        cols = None
        epoch = 0
        # warm both pipelines once
        for mode in ("A", "B"):
            tbl = TranscriptTable(spark, f"{root}/warm{mode}", n_buckets=32)
            if cols is None:
                cols = [f.name for f in tbl.schema.fields]
            batch = log
            if mode == "A":
                win = last_wins(batch, key=tuple(tbl.key),
                                order=(tbl.order_col,)).select(*cols, "op")
                tbl.merge(win, epoch_id=0, deduped=True)
            else:
                tbl.merge(batch.select(*cols, "op"), epoch_id=0, deduped=False)
        for rep in range(reps):
            results["probes"].append(round(mini_probe(spark), 3))
            for mode in ("A", "B"):
                tbl = TranscriptTable(spark, f"{root}/t{rep}{mode}", n_buckets=32)
                t0 = time.perf_counter()
                if mode == "A":
                    win = last_wins(log, key=tuple(tbl.key),
                                    order=(tbl.order_col,)).select(*cols, "op")
                    tbl.merge(win, epoch_id=epoch, deduped=True)
                else:
                    tbl.merge(log.select(*cols, "op"), epoch_id=epoch,
                              deduped=False)
                dt = time.perf_counter() - t0
                results["A_two_shuffle" if mode == "A" else "B_fused"].append(
                    round(dt, 3))
                epoch += 1
        # row parity: fused and two-shuffle tables hold identical state
        a = TranscriptTable(spark, f"{root}/t0A", n_buckets=32).snapshot()
        b = TranscriptTable(spark, f"{root}/t0B", n_buckets=32).snapshot()
        ca = sorted(a.columns)
        results["rows_equal"] = (
            a.select(*ca).exceptAll(b.select(*ca)).count() == 0
            and b.select(*ca).exceptAll(a.select(*ca)).count() == 0
        )
    finally:
        log.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    results["A_best"] = min(results["A_two_shuffle"])
    results["B_best"] = min(results["B_fused"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
