#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule / driver instruction).

Runs the IDENTICAL end-to-end merge-replay job at two parallelism levels —
local[8] (N) and local[32] (4N), the sandbox stand-in for N vs 4N executors —
on the same deterministic input, then reports throughput at both and the
scaling efficiency  eff = (T8/T32) / 4  into BENCH.md.

Each level runs in its own subprocess: one JVM cannot host two masters.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "4000000"))

CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from go_data_publisher_spark.session import get_spark
from bench import bench_merge_throughput

cores = int(sys.argv[1]); n_events = int(sys.argv[2])
spark = get_spark(app_name=f"scalebench-{cores}", cores=cores,
                  shuffle_partitions=max(cores, 8))
out = bench_merge_throughput(spark, n_events)
out["cores"] = cores
print("RESULT " + json.dumps(out))
"""


def run_level(cores: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(N_EVENTS)],
        capture_output=True, text=True, timeout=3600, cwd="/root/repo",
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result from cores={cores}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    lo = run_level(8)
    hi = run_level(32)
    speedup = lo["seconds"] / hi["seconds"]
    eff = speedup / 4.0
    result = {"N_cores": lo, "4N_cores": hi,
              "speedup": round(speedup, 3), "scaling_efficiency": round(eff, 3),
              "n_events": N_EVENTS}
    print(json.dumps(result))

    md = f"""# BENCH — merge-replay throughput & scaling efficiency

Evidence for the north_rule's two-cluster-size criterion, per driver
instruction: the identical end-to-end job (deterministic change log →
chunked last-wins dedup → bucketed LSN-guarded MERGE with manifest commits)
run at two parallelism levels on the same input ({N_EVENTS:,} logical events,
seed 42).

| parallelism | events | wall sec | events/sec |
|---|---|---|---|
| local[8]  (N)  | {lo['n_events']:,} | {lo['seconds']} | {lo['events_per_sec']:,} |
| local[32] (4N) | {hi['n_events']:,} | {hi['seconds']} | {hi['events_per_sec']:,} |

**speedup N→4N: {speedup:.2f}×, scaling efficiency: {eff:.2f}**
(target ≥ 0.8; single-host caveat: local[8] vs local[32] share one memory bus
and disk, so this under-states true multi-executor scaling, where each
executor brings its own memory bandwidth and spill disk.)

Regenerate: `python bench_scaling.py` (env `SPARK_GRAFT_SCALE_EVENTS` to resize).
"""
    with open("/root/repo/BENCH.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
