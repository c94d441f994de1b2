#!/usr/bin/env python
"""Same-session interleaved A/B for the r7 balanced write placement.

A: raw bucket hash  — repartition(n, "__bucket")    (SPARK_GRAFT_BALANCED_WRITE=0)
B: preimage pkey    — repartition(n, j(__bucket))   (default)

Shape = bench.py's headline merge replay (4 chunks, fresh table per rep,
full-size untimed warm-up), interleaved A,B,A,B,... with a mini host probe
before every rep so a window shift between legs is visible in the artifact.
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
    spark = get_spark(app_name="pkey_ab", cores=CPUS,
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
    root = tempfile.mkdtemp(prefix="cdc_pkey_ab_", dir=scratch)
    res = {"n_events": n_events, "n_chunks": n_chunks,
           "A_bucket_hash": [], "B_pkey": [], "probes": []}
    modes = [("A_bucket_hash", "0"), ("B_pkey", "1")]
    try:
        # full-size warm-up per mode, untimed
        for name, flag in modes:
            os.environ["SPARK_GRAFT_BALANCED_WRITE"] = flag
            wt = TranscriptTable(spark, f"{root}/warm_{name}", n_buckets=32)
            replay_batch_range(ChangeApplier(wt), log, bounds)
        counts = {}
        for rep in range(reps):
            for name, flag in modes:
                os.environ["SPARK_GRAFT_BALANCED_WRITE"] = flag
                res["probes"].append(round(mini_probe(spark), 3))
                tbl = TranscriptTable(spark, f"{root}/{name}_{rep}", n_buckets=32)
                app = ChangeApplier(tbl, lineage_dir=f"{root}/lin_{name}_{rep}")
                t0 = time.perf_counter()
                replay_batch_range(app, log, bounds)
                res[name].append(round(time.perf_counter() - t0, 3))
                if rep == 0:
                    counts[name] = tbl.snapshot().count()
        res["final_rows"] = counts
        res["rows_equal"] = len(set(counts.values())) == 1
    finally:
        log.unpersist()
        shutil.rmtree(root, ignore_errors=True)
        os.environ.pop("SPARK_GRAFT_BALANCED_WRITE", None)
    res["best"] = {k: min(v) for k, v in res.items()
                   if k in ("A_bucket_hash", "B_pkey")}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
