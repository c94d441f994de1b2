#!/usr/bin/env python
"""Optimization-round iteration harness (bench.py stays FROZEN — guide §1).

Times an arbitrary subset of the declared queries with bench.py's exact
methodology (untimed warm-up + interleaved mini host probe + best-of-REPEATS
``.count()``), optionally with the noop sink instead (guide §1.4: computes
every column, so column-pruning can't flatter a plan the way ``.count()``
can), and captures ``.explain("formatted")`` per query for the plans/r07
evidence files.

Usage:
  python bench_extra.py q1 q2 ...            # time with .count() (bench parity)
  python bench_extra.py --noop q1 ...        # time with the noop sink
  python bench_extra.py --explain-dir plans/r07 --suffix before q1 ...
  python bench_extra.py --all-explains plans/r07 --suffix before
  python bench_extra.py --merge              # merge-replay microbench only
Prints one JSON line: {"queries": {name: best_s}, "control": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from bench import (  # noqa: E402 — reuse the frozen methodology verbatim
    HEADLINE,
    REPEATS,
    SF_DIR,
    CPUS,
    MINI_PROBE_GOOD_S,
    bench_merge_throughput,
    mini_probe,
)
from go_data_publisher_spark.session import get_spark  # noqa: E402


def time_query_sink(spark, fn, sf_dir: str, noop: bool) -> tuple[float, dict]:
    """bench.time_query, parameterized on the materialization: ``.count()``
    (bench parity) or the noop sink (guide §1.4 — evaluates every column)."""
    def run(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    run(fn(spark, sf_dir))  # untimed warm-up
    probe = mini_probe(spark)
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run(fn(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
    best = min(samples)
    return best, {
        "samples": [round(s, 3) for s in samples],
        "spread": round(max(samples) / best, 2),
        "probe_s": round(probe, 3),
        "probe_factor": round(probe / MINI_PROBE_GOOD_S, 2),
    }


def write_explain(spark, name, fn, sf_dir, out_dir, suffix):
    os.makedirs(out_dir, exist_ok=True)
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
        f.write(plan)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="*", help="query names (default: headline set)")
    p.add_argument("--noop", action="store_true", help="noop sink instead of .count()")
    p.add_argument("--explain-dir", default=None)
    p.add_argument("--all-explains", default=None,
                   help="write explain files for EVERY declared query to this dir")
    p.add_argument("--suffix", default="before")
    p.add_argument("--merge", action="store_true", help="run the merge microbench")
    p.add_argument("--merge-events", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "4000000")))
    p.add_argument("--no-time", action="store_true", help="explains only")
    args = p.parse_args()

    extra = json.loads(os.environ.get("BENCH_EXTRA_CONF", "{}"))
    extra.setdefault("spark.ui.showConsoleProgress", "false")
    spark = get_spark(app_name="bench_extra", cores=CPUS, extra_conf=extra)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/events.parquet").limit(10).collect()
    mini_probe(spark)  # warm probe codegen

    queries = E.queries()
    out = {"sf_dir": SF_DIR, "cpus": CPUS, "queries": {}, "control": {}}

    if args.all_explains:
        for name, fn in queries.items():
            try:
                write_explain(spark, name, fn, SF_DIR, args.all_explains, args.suffix)
            except Exception as exc:  # noqa: BLE001 — record and continue
                print(f"explain failed for {name}: {exc}", file=sys.stderr)

    names = args.names or (HEADLINE if not args.all_explains else [])
    for name in names:
        fn = queries[name]
        if args.explain_dir:
            write_explain(spark, name, fn, SF_DIR, args.explain_dir, args.suffix)
        if not args.no_time:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            best, control = time_query_sink(spark, fn, SF_DIR, args.noop)
            spark.sparkContext.setJobDescription(None)
            out["queries"][name] = round(best, 3)
            out["control"][name] = control

    if args.merge:
        out["merge"] = bench_merge_throughput(spark, args.merge_events)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
