#!/usr/bin/env python
"""Same-session interleaved A/B: two-phase dedup+write vs FUSED single-
exchange merge, both on the r7 balanced pkey placement (the collision skew
that sank the first fusion attempt is gone — this re-decides the question).

A: two-phase (ChangeApplier does last_wins, merge repartitions winners)
B: fused     (SPARK_GRAFT_MERGE_FUSED=1 — merge folds last_wins into the
              balanced bucket shuffle; one exchange per microbatch)

Shape = bench.py's headline merge replay (4 chunks, fresh table per rep,
full-size untimed warm-up per mode), interleaved with a mini host probe
before every rep.  Also verifies snapshot equality across modes.
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
from go_data_publisher_spark.session import get_spark  # noqa: E402
from go_data_publisher_spark.sources.changelog import generate_changelog  # noqa: E402
from go_data_publisher_spark.streaming.apply import (  # noqa: E402
    ChangeApplier,
    replay_batch_range,
)


def main():
    n_events = int(os.environ.get("AB_EVENTS", "4000000"))
    n_chunks = int(os.environ.get("AB_CHUNKS", "4"))
    reps = int(os.environ.get("AB_REPS", "3"))
    spark = get_spark(app_name="fused_ab", cores=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    log = generate_changelog(spark, n_events,
                             n_convs=max(200, n_events // 500), seed=42)
    log = log.persist()
    log.count()
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo) // n_chunks + 1
    bounds = [(lo + i * span, min(hi, lo + (i + 1) * span - 1))
              for i in range(n_chunks)]

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_fused_ab_", dir=scratch)
    res = {"n_events": n_events, "n_chunks": n_chunks,
           "A_two_phase": [], "B_fused": [], "probes": []}
    modes = [("A_two_phase", "0"), ("B_fused", "1")]
    try:
        for name, flag in modes:
            os.environ["SPARK_GRAFT_MERGE_FUSED"] = flag
            wt = TranscriptTable(spark, f"{root}/warm_{name}", n_buckets=32)
            replay_batch_range(ChangeApplier(wt), log, bounds)
        snaps = {}
        for rep in range(reps):
            for name, flag in modes:
                os.environ["SPARK_GRAFT_MERGE_FUSED"] = flag
                res["probes"].append(round(mini_probe(spark), 3))
                tbl = TranscriptTable(spark, f"{root}/{name}_{rep}",
                                      n_buckets=32)
                app = ChangeApplier(tbl, lineage_dir=f"{root}/lin_{name}_{rep}")
                t0 = time.perf_counter()
                replay_batch_range(app, log, bounds)
                res[name].append(round(time.perf_counter() - t0, 3))
                if rep == 0:
                    snaps[name] = tbl
        # value identity: full-row symmetric difference between the two
        # mode-0 snapshots must be empty
        a = snaps["A_two_phase"].snapshot()
        b = snaps["B_fused"].snapshot()
        res["rows"] = {"A": a.count(), "B": b.count()}
        res["sym_diff"] = (a.exceptAll(b).count() + b.exceptAll(a).count())
        res["rows_equal"] = (res["sym_diff"] == 0
                             and res["rows"]["A"] == res["rows"]["B"])
    finally:
        log.unpersist()
        shutil.rmtree(root, ignore_errors=True)
        os.environ.pop("SPARK_GRAFT_MERGE_FUSED", None)
    res["best"] = {k: min(v) for k, v in res.items()
                   if k in ("A_two_phase", "B_fused")}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
