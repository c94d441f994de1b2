#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the engine's primary number per BASELINE.json:
**change-events/sec applied end-to-end** through the chunked dedup+MERGE
replay (reported as `events_per_sec` inside the JSON; `value` is total
wall-seconds across the headline queries, as the driver expects).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as E
from go_data_publisher_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries: the CDC core + one representative per operator family,
# including the scale-safe twins (r5 verdict #4): range_join_chunked is the
# shuffled equi-join shape you'd run when the epoch dim stops being tiny,
# range_join_stab is the pair-free sweep for the dense-overlap regime the
# sf1 gate flagged in r6, cdc_final_state_salted is the explicit salted
# reduction for defeated map-side aggregation — all tracked beside their
# by-design siblings
HEADLINE = [
    "cdc_final_state",
    "cdc_final_state_salted",
    "latest_per_group",
    "count_per_key",
    "gap_detection",
    "range_join",
    "range_join_chunked",
    "range_join_stab",
    "set_difference",
    "dedup_exact_docs",
    "minhash_pairs_docs",
    "emb_topk",
    "asof_enrich",
    "windowed_counts",
    "docs_curated",
]


REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

# Good-day wall time of the host-control probe below on THIS sandbox class
# (local[32], measured across rounds 4-5).  The probe is pure JVM compute —
# spark.range(1e9) → xxhash64 → avg, no shuffle, no disk, no Python — so its
# ratio to the good-day constant measures the BOX, not the engine: this host
# shows documented multi-second hypervisor stalls and whole sessions where
# local[32] underperforms (BENCH.md).  Readers normalize any run's numbers
# by host_control.slowdown_factor instead of trusting a single day's wall
# clock (the r4 verdict's ask: make "the host had a bad day" machine-checkable).
HOST_CONTROL_GOOD_S = float(os.environ.get("SPARK_GRAFT_HOST_GOOD_S", "0.45"))


def host_control_probe(spark) -> float:
    """One timed run of the fixed pure-compute calibration job (already
    warmed by the caller): the same probe bench_scaling.py uses for its
    host-ceiling normalization, embedded here so every BENCH_r*.json is
    self-normalizing."""
    t0 = time.perf_counter()
    spark.range(0, 1_000_000_000, numPartitions=128).select(
        F.avg(F.xxhash64("id", F.lit(1)))).first()
    return time.perf_counter() - t0


def bandwidth_probe(spark) -> float:
    """Memory-bandwidth/storage twin of the CPU probe: write ~20M rows of
    parquet to the same tmpfs scratch the bench tables use, read it back,
    count.  The CPU probe is compute-bound and cache-resident, so it MISSES
    the host condition that actually hurts this engine — memory-bandwidth
    steal / tmpfs throughput (measured: an evening where the CPU probe read
    1.35× while every shuffle-heavy leg ran 2-6× slow).  Reported raw
    beside the CPU probe so a reader can classify a slow artifact as
    compute-starved, bandwidth-starved, or engine regression."""
    import shutil
    import tempfile

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_bwprobe_", dir=scratch)
    try:
        t0 = time.perf_counter()
        (spark.range(0, 20_000_000, numPartitions=32)
              .select("id", F.md5(F.col("id").cast("string")).alias("pad"))
              .write.mode("overwrite").parquet(f"{root}/p"))
        spark.read.parquet(f"{root}/p").count()
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def mini_probe(spark) -> float:
    """Quarter-scale twin of host_control_probe (~0.11s on a good day),
    cheap enough to interleave between query timings: each per-query row in
    the artifact carries its own host-validity signal (r5 verdict #2 — four
    headline queries regressed 30-90% with no code change and only the
    artifact-level probes, sampled before/after the whole run, could argue
    host noise)."""
    t0 = time.perf_counter()
    spark.range(0, 250_000_000, numPartitions=128).select(
        F.avg(F.xxhash64("id", F.lit(1)))).first()
    return time.perf_counter() - t0


# Calibrated solo (r6, big probe at its 0.45s good-day): the quarter-size
# job runs at ~half the per-row efficiency of the 1e9 probe (fixed job
# overhead amortizes worse), so its good-day is ~0.22s — NOT good_s/4.
# Deriving it by division overstated probe_factor ~2x in early r6 artifacts.
# Env-overridable alongside SPARK_GRAFT_HOST_GOOD_S: a host that recalibrates
# the big probe must recalibrate this one too, or every per-query
# probe_factor gates against the wrong ceiling.
MINI_PROBE_GOOD_S = float(os.environ.get("SPARK_GRAFT_MINI_GOOD_S", "0.22"))


def time_query(spark, fn, sf_dir: str) -> tuple[float, dict]:
    """One untimed warm-up + best of REPEATS runs; returns
    (best_seconds, control) where control carries every sample and a
    mini host probe taken immediately before the first timed run.

    The warm-up mirrors the merge bench's untimed warm-up replay: the FIRST
    heavy query after the merge pays the merge's leftover JVM state (GC of
    the replay's old-gen garbage — measured 34.8s vs 3.2s for the identical
    minhash plan back-to-back in one session), which is session ordering,
    not the operator.  Best-of then covers this host's documented random
    multi-second stalls (same binary, same input, 3s → 25s swings) — a
    single sample measures the hypervisor, not the engine.  The per-query
    probe factor and the sample spread are validity gates, not divisors:
    a slow best-of with probe_factor ≈ 1 and a tight spread is an engine
    number; a slow one with probe_factor ≫ 1 or a wide spread is the box."""
    fn(spark, sf_dir).count()  # untimed warm-up (plan + JVM settling)
    probe = mini_probe(spark)
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # materialize
        assert n >= 0
        samples.append(time.perf_counter() - t0)
    best = min(samples)
    control = {
        "samples": [round(s, 3) for s in samples],
        "spread": round(max(samples) / best, 2),
        "probe_s": round(probe, 3),
        "probe_factor": round(probe / MINI_PROBE_GOOD_S, 2),
    }
    return best, control


def bench_merge_throughput(spark, n_events: int, n_chunks: int = 4) -> dict:
    """End-to-end binlog-replay merge throughput: generate a deterministic
    change log, replay it through dedup + bucketed MERGE, report events/sec.

    The scratch table lives on tmpfs when available: this sandbox's single
    virtio disk has multi-second stalls under concurrent writers, which
    measures the disk, not the engine (a cluster's executors write to their
    own local disks / object store)."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.sources.changelog import generate_changelog
    from go_data_publisher_spark.streaming.apply import ChangeApplier, replay_batch_range

    log = generate_changelog(spark, n_events, n_convs=max(200, n_events // 500), seed=42)
    log = log.persist()
    n = log.count()  # materialize input outside the timed region

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_bench_", dir=scratch)
    try:
        tbl = TranscriptTable(spark, f"{root}/tbl", n_buckets=32)
        app = ChangeApplier(tbl, lineage_dir=f"{root}/lineage")
        lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
        span = (hi - lo) // n_chunks + 1
        bounds = [(lo + i * span, min(hi, lo + (i + 1) * span - 1)) for i in range(n_chunks)]

        # One FULL-size warm-up replay into a throwaway table, outside the
        # timed region (r4 verdict item #1: a single-chunk warm-up left later
        # chunks paying first-execution cost inside the timing): the first
        # execution of the scan→dedup→bucket-write pipeline pays one-time
        # JIT/codegen cost (measured ~19s at 32 threads, then 3-5s per
        # identical chunk).  Steady-state throughput is the engine number; a
        # long-running CDC ingest is in steady state its whole life.
        warm_tbl = TranscriptTable(spark, f"{root}/warm", n_buckets=32)
        replay_batch_range(ChangeApplier(warm_tbl), log, bounds)

        # best-of-max(REPEATS,3) full replays (fresh table each), same
        # rationale as time_query but with a higher floor — this is the
        # headline metric, and single samples measure host stalls
        dt = float("inf")
        for rep in range(max(REPEATS, 3)):
            tbl_r = TranscriptTable(spark, f"{root}/tbl{rep}", n_buckets=32) \
                if rep else tbl
            app_r = ChangeApplier(tbl_r, lineage_dir=f"{root}/lineage{rep}") \
                if rep else app
            t0 = time.perf_counter()
            replay_batch_range(app_r, log, bounds)
            dt = min(dt, time.perf_counter() - t0)
        final_rows = tbl.snapshot().count()
    finally:
        log.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    return {
        "n_events": n,
        "seconds": round(dt, 3),
        "events_per_sec": round(n / dt, 1),
        "final_rows": final_rows,
        "n_chunks": n_chunks,
    }


def driver_metadata_phase(tbl) -> tuple[float, int]:
    """Re-measure JUST the driver-side per-commit metadata work of the
    newest commit: thread-pooled footer-stat reads (incl. the __del
    null-count split) + a manifest fold — the only merge phase that runs on
    the driver.  The remainder of the commit is the Spark write stage (scan
    → dedup shuffle → bucket write), which a cluster parallelizes across
    executors.  Returns (seconds, n_files_in_newest_commit)."""
    from concurrent.futures import ThreadPoolExecutor

    from go_data_publisher_spark.lake.table import _footer_stats

    m = tbl.manifest()
    newest = max(int(f.get("seq", 0)) for f in m["files"])
    paths = [f["path"] for f in m["files"]
             if int(f.get("seq", 0)) == newest]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
        list(ex.map(lambda p: _footer_stats(p, "lsn", "__del"), paths))
    tbl.manifest()
    return time.perf_counter() - t0, len(paths)


def bench_commit_cost(spark, preload_events: int = 1_000_000,
                      small_batch: int = 20_000) -> dict:
    """Merge-on-read evidence: the cost of committing a SMALL batch must not
    grow with table size (the round-1 copy-on-write design rewrote every
    touched bucket, making every commit O(table)).  Times the same small-
    batch merge into (a) an empty table and (b) a table preloaded with
    ``preload_events`` — at 100 TB the ratio is the difference between a
    working CDC tail and one that falls behind forever."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.sources.changelog import generate_changelog
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_commit_", dir=scratch)
    try:
        big = generate_changelog(spark, preload_events,
                                 n_convs=max(200, preload_events // 500), seed=7).persist()
        big.count()
        small = generate_changelog(spark, small_batch, n_convs=200, seed=11).persist()
        small.count()

        loaded = TranscriptTable(spark, f"{root}/loaded", n_buckets=32)
        ChangeApplier(loaded).apply_batch(big, epoch_id=0)  # preload + warm-up
        empty = TranscriptTable(spark, f"{root}/empty", n_buckets=32)

        def timed(tbl, epoch):
            app = ChangeApplier(tbl)
            best = float("inf")
            for rep in range(REPEATS):
                t0 = time.perf_counter()
                app.apply_batch(small, epoch_id=epoch + rep)
                best = min(best, time.perf_counter() - t0)
            return best

        t_empty = timed(empty, 0)
        meta_empty, files_empty = driver_metadata_phase(empty)
        t_loaded = timed(loaded, 1)
        meta_loaded, files_loaded = driver_metadata_phase(loaded)
        big.unpersist()
        small.unpersist()
        return {
            "small_batch_events": small_batch,
            "preload_events": preload_events,
            "empty_table_s": round(t_empty, 3),
            "loaded_table_s": round(t_loaded, 3),
            "ratio": round(t_loaded / t_empty, 2),
            # r5 verdict #3: the ratio drifted 0.92 → 1.21 → 1.40 over three
            # rounds with no code change — split it into the driver-side
            # metadata phase (the part that could hide an O(live-files)
            # term) vs the executor write stage (scan→dedup→bucket write; on
            # the loaded table Spark's commit protocol lists a bigger data/
            # dir and the JVM carries the preload's heap state — box/JVM
            # effects a cluster doesn't serialize on one driver)
            "driver_phase_s": {"empty": round(meta_empty, 3),
                               "loaded": round(meta_loaded, 3)},
            "write_stage_s": {"empty": round(max(0.0, t_empty - meta_empty), 3),
                              "loaded": round(max(0.0, t_loaded - meta_loaded), 3)},
            "commit_files": {"empty": files_empty, "loaded": files_loaded},
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_commit_metadata(spark, small_batch: int = 5_000,
                          few_files: int = 100, many_files: int = 10_000) -> dict:
    """Manifest-plane evidence: commit wall time must stay FLAT as the live
    FILE count grows (per-commit file-list deltas; the round-2 design
    rewrote the full O(live-files) JSON under the commit lock every merge).

    Preloads each table's manifest with synthetic file entries through the
    same metadata path real commits use (`_publish`) — merge() never opens
    other commits' files, so the timed small merges differ ONLY in manifest
    size: 10^2 vs 10^4 live files, the round-2 VERDICT's target range."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.sources.changelog import generate_changelog
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_meta_", dir=scratch)
    try:
        small = generate_changelog(spark, small_batch, n_convs=200, seed=13).persist()
        small.count()

        def preload(tbl, n_entries):
            added = 0
            while added < n_entries:
                chunk = min(2500, n_entries - added)
                tbl._publish(tbl.manifest(), files_added=[
                    {"path": f"/synthetic/f{added + i}.parquet", "bucket": 0,
                     "schema_id": 0, "kind": "delta", "seq": 1}
                    for i in range(chunk)])
                added += chunk

        reps = max(REPEATS, 3)

        def timed(tbl, epoch0):
            # fresh epoch ids per call (disjoint ranges of width `reps`): a
            # reused id hits the replay guard and measures a no-op
            app = ChangeApplier(tbl)
            best = float("inf")
            for rep in range(reps):
                t0 = time.perf_counter()
                stats = app.apply_batch(small, epoch_id=epoch0 + rep)
                assert stats["status"] == "committed", stats
                best = min(best, time.perf_counter() - t0)
            return best

        t_few = TranscriptTable(spark, f"{root}/few", n_buckets=32)
        preload(t_few, few_files)
        t_many = TranscriptTable(spark, f"{root}/many", n_buckets=32)
        preload(t_many, many_files)
        timed(t_few, 0)  # warm-up pipeline shape once, outside the compared pair
        s_few = timed(t_few, reps)
        s_many = timed(t_many, 0)
        small.unpersist()
        return {
            "small_batch_events": small_batch,
            "few_live_files": few_files,
            "many_live_files": many_files,
            "few_files_commit_s": round(s_few, 3),
            "many_files_commit_s": round(s_many, 3),
            "ratio": round(s_many / s_few, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_commit_buckets(spark, small_batch: int = 20_000,
                         few_buckets: int = 16, many_buckets: int = 256) -> dict:
    """Bucket-count evidence: commit wall time must stay ~flat as n_buckets
    grows from a test (16) to a production (256) layout.  The driver-side
    per-commit work is the footer-stat enumeration (≤ 2·n_buckets parquet
    footer reads, now thread-pooled) + the O(batch) manifest delta; a serial
    footer loop would make this section grow linearly with bucket count."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.sources.changelog import generate_changelog
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_buckets_", dir=scratch)
    try:
        small = generate_changelog(spark, small_batch, n_convs=2000, seed=17).persist()
        small.count()
        reps = max(REPEATS, 3)

        def timed(n_buckets, name):
            tbl = TranscriptTable(spark, f"{root}/{name}", n_buckets=n_buckets)
            app = ChangeApplier(tbl)
            app.apply_batch(small, epoch_id=0)  # warm-up, outside the timing
            best = float("inf")
            for rep in range(reps):
                t0 = time.perf_counter()
                stats = app.apply_batch(small, epoch_id=1 + rep)
                assert stats["status"] == "committed", stats
                best = min(best, time.perf_counter() - t0)
            return best, tbl

        s_few, t_few = timed(few_buckets, "few")
        s_many, t_many = timed(many_buckets, "many")
        meta_few, files_few = driver_metadata_phase(t_few)
        meta_many, files_many = driver_metadata_phase(t_many)
        small.unpersist()
        return {
            "small_batch_events": small_batch,
            "few_buckets": few_buckets,
            "many_buckets": many_buckets,
            "few_buckets_commit_s": round(s_few, 3),
            "many_buckets_commit_s": round(s_many, 3),
            "ratio": round(s_many / s_few, 2),
            # first-class split (r4 verdict): the driver-side metadata phase
            # (footer stats + manifest fold — serialized on the driver even
            # on a cluster) vs the executor-side write stage (file-write work
            # a cluster parallelizes; here = commit minus the driver phase)
            "driver_phase_s": {"few": round(meta_few, 3),
                               "many": round(meta_many, 3)},
            "write_stage_s": {"few": round(max(0.0, s_few - meta_few), 3),
                              "many": round(max(0.0, s_many - meta_many), 3)},
            "commit_files": {"few": files_few, "many": files_many},
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_read_path(spark, batch_events: int = 8_000,
                    depths=(1, 4, 16, 64), n_buckets: int = 16,
                    policy_threshold: int = 8) -> dict:
    """Merge-on-read read-path curve (r5 verdict #1): the classic failure
    mode of a delta-chain design is reads degrading as deltas accumulate
    between compactions.  Commits ``max(depths)`` small batches with inline
    compaction DISABLED, times ``snapshot().count()`` at each delta depth,
    then compacts and times again — the curve plus the post-compact floor
    is the read-amplification evidence.  A second table replays the same
    stream WITH the inline policy (``compact_delta_files``) to show it
    holds read latency near the floor while writes stream.

    Reference semantics: the verifier's read-after-write path
    (status-service/sync/tick_processor.go:251-310) — reads must stay cheap
    while writes stream."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.sources.changelog import generate_changelog
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    max_depth = max(depths)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_readpath_", dir=scratch)
    try:
        log = generate_changelog(spark, batch_events * max_depth,
                                 n_convs=4000, seed=23).persist()
        log.count()
        lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
        span = (hi - lo) // max_depth + 1
        bounds = [(lo + i * span, min(hi, lo + (i + 1) * span - 1))
                  for i in range(max_depth)]

        def timed_snapshot(tbl):
            tbl.snapshot().count()  # warm-up
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                tbl.snapshot().count()
                best = min(best, time.perf_counter() - t0)
            return best

        # curve: no inline compaction — delta depth == commits per bucket
        tbl = TranscriptTable(spark, f"{root}/tbl", n_buckets=n_buckets)
        app = ChangeApplier(tbl)
        curve = {}
        done = 0
        for depth in sorted(depths):
            for i in range(done, depth):
                app.apply_batch(
                    log.where(F.col("lsn").between(*bounds[i])), epoch_id=i)
            done = depth
            observed = max(tbl.delta_file_counts().values(), default=0)
            curve[str(depth)] = {
                "snapshot_s": round(timed_snapshot(tbl), 3),
                "max_delta_files_per_bucket": observed,
            }
        tbl.compact()
        post_compact_s = timed_snapshot(tbl)

        # policy: same stream, inline compaction at the threshold — depth
        # stays bounded and the read stays near the post-compact floor
        ptbl = TranscriptTable(spark, f"{root}/ptbl", n_buckets=n_buckets)
        papp = ChangeApplier(ptbl, compact_delta_files=policy_threshold)
        compactions = 0
        max_observed = 0
        for i in range(max_depth):
            stats = papp.apply_batch(
                log.where(F.col("lsn").between(*bounds[i])), epoch_id=i)
            if "compacted_buckets" in stats:
                compactions += 1
            max_observed = max(
                max_observed,
                max(ptbl.delta_file_counts().values(), default=0))
        policy_read_s = timed_snapshot(ptbl)

        # hot-bucket variant: a fully-compacted table that keeps taking
        # deltas in ONE of its n_buckets (the hot-partition write pattern).
        # snapshot()'s dirty-bucket split shuffles only that bucket's files,
        # so the read should sit near the post-compact floor even at a delta
        # depth that costs multiples of the floor when every bucket is dirty.
        from go_data_publisher_spark.lake.table import bucket_expr

        htbl = TranscriptTable(spark, f"{root}/htbl", n_buckets=n_buckets)
        happ = ChangeApplier(htbl)
        happ.apply_batch(log, epoch_id=0)
        htbl.compact()
        hot = log.where(bucket_expr("conv_id", n_buckets) == 0).persist()
        hot.count()
        hot_depth = 16
        # the same hot-bucket traffic re-delivered each tick (a real CDC
        # redelivery shape): every commit adds one more delta file to the
        # hot bucket, which is the read-amplification variable under test
        for i in range(hot_depth):
            happ.apply_batch(hot, epoch_id=i + 1)
        hot.unpersist()
        hot_read_s = timed_snapshot(htbl)
        log.unpersist()
        return {
            "batch_events": batch_events,
            "n_buckets": n_buckets,
            "snapshot_s_at_delta_depth": curve,
            "post_compact_snapshot_s": round(post_compact_s, 3),
            "policy": {
                "compact_delta_files": policy_threshold,
                "commits": max_depth,
                "compactions_triggered": compactions,
                "max_delta_files_observed": max_observed,
                "snapshot_s_after_stream": round(policy_read_s, 3),
                # the pinned claim: the inline policy keeps streamed-write
                # read latency within ~2x of the fully compacted floor
                "read_vs_post_compact": round(policy_read_s / post_compact_s, 2),
            },
            "hot_bucket": {
                # 1 dirty bucket of n_buckets at hot_depth deltas: the
                # dirty-bucket split confines the fold shuffle to that
                # bucket, so this should sit near the floor while the
                # all-buckets curve at the same depth costs multiples of it
                "delta_depth": hot_depth,
                "snapshot_s": round(hot_read_s, 3),
                "vs_post_compact": round(hot_read_s / post_compact_s, 2),
                "all_buckets_same_depth_s":
                    curve.get(str(hot_depth), {}).get("snapshot_s"),
            },
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_microbatch_latency(spark, n_batches: int = 30,
                             batch_events: int = 2_000) -> dict:
    """Per-microbatch end-to-end latency distribution (r5 verdict #8): the
    reference consumes on a 100 ms poll cadence
    (transactions-consumer/consume/transaction_consumer.go:72-91), so its
    operators experience COMMIT LATENCY, not just throughput.  Applies
    ``n_batches`` small batches sequentially through ChangeApplier (dedup →
    bucket write → footer stats → manifest swap, the full exactly-once
    path) and reports the wall-clock distribution."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.sources.changelog import generate_changelog
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="cdc_lat_", dir=scratch)
    try:
        total = batch_events * (n_batches + 3)
        log = generate_changelog(spark, total, n_convs=2000, seed=29).persist()
        log.count()
        lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
        span = (hi - lo) // (n_batches + 3) + 1
        bounds = [(lo + i * span, min(hi, lo + (i + 1) * span - 1))
                  for i in range(n_batches + 3)]
        tbl = TranscriptTable(spark, f"{root}/tbl", n_buckets=32)
        app = ChangeApplier(tbl)
        lats = []
        for i, b in enumerate(bounds):
            batch = log.where(F.col("lsn").between(*b))
            t0 = time.perf_counter()
            app.apply_batch(batch, epoch_id=i)
            dt = time.perf_counter() - t0
            if i >= 3:  # first batches pay one-time JIT/codegen — warm-up
                lats.append(dt)
        log.unpersist()
        lats.sort()

        def pct(p):
            return lats[min(len(lats) - 1, int(p * len(lats)))]

        return {
            "batch_events": batch_events,
            "batches_timed": len(lats),
            "p50_s": round(pct(0.50), 3),
            "p95_s": round(pct(0.95), 3),
            "max_s": round(lats[-1], 3),
            "min_s": round(lats[0], 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def synthesize_sf1(spark, src: str, dst: str, factor: int = 10) -> None:
    """Deterministic 10x scale-up of the driver's sf0.1 tables (no external
    data): ``factor`` copies with disjoint id spaces.

    Copies must NOT be byte-identical, or the scale-up is adversarial
    instead of linear — 10 exact copies of every document give each doc 9
    artificial near-duplicates and blow the LSH verify stage up ~100x,
    measuring the synthesis, not the operator.  So:

    - events: id/user spaces shifted per copy (10x conversations at the
      same time density — 10x traffic, same window);
    - documents: text alphabet-rotated per copy (rot-i over a-z/A-Z):
      length/punctuation/whitespace stats preserved EXACTLY, within-copy
      near-dup structure preserved EXACTLY, zero cross-copy shingle
      overlap → candidate pairs scale linearly, the honest 10x;
    - embeddings: vector dims rotated per copy (norms and within-copy
      geometry preserved, cross-copy cosines decorrelated)."""
    import string

    from functools import reduce

    from pyspark.sql import DataFrame

    ev = spark.read.parquet(f"{src}/events.parquet")
    id_span = ev.agg(F.max("event_id")).first()[0] + 1
    user_span = ev.agg(F.max("user_id")).first()[0] + 1
    ev_copies = [
        ev.select(
            (F.col("event_id") + F.lit(i * id_span)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * user_span)).alias("user_id"),
            "event_type", "value", "props")
        for i in range(factor)
    ]
    reduce(DataFrame.unionAll, ev_copies).repartition(32) \
        .write.mode("overwrite").parquet(f"{dst}/events.parquet")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    doc_span = docs.agg(F.max("doc_id")).first()[0] + 1
    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    doc_copies = []
    for i in range(factor):
        rot = i % 26
        tr = lower[rot:] + lower[:rot] + upper[rot:] + upper[:rot]
        doc_copies.append(docs.select(
            (F.col("doc_id") + F.lit(i * doc_span)).alias("doc_id"),
            F.translate("text", lower + upper, tr).alias("text"),
            "lang", "source", "n_chars"))
    reduce(DataFrame.unionAll, doc_copies).repartition(32) \
        .write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    vec_span = emb.agg(F.max("vec_id")).first()[0] + 1
    emb_copies = []
    for i in range(factor):
        rot = i % dim
        rolled = (F.col("embedding") if rot == 0 else F.concat(
            F.slice("embedding", rot + 1, dim - rot),
            F.slice("embedding", 1, rot)))
        emb_copies.append(emb.select(
            (F.col("vec_id") + F.lit(i * vec_span)).alias("vec_id"),
            rolled.alias("embedding"), "label"))
    reduce(DataFrame.unionAll, emb_copies).repartition(16) \
        .write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")


def bench_sf1(spark, queries, base_times: dict, factor: int = 10) -> dict:
    """Full-query-set 10x evidence (r5 verdict #6): the 10x scaling story so
    far covered only the merge (BENCH.md scale10, ratio 0.98); this runs the
    headline queries at a synthesized sf1 and reports per-event ratios —
    ratio_per_event = t_sf1 / (factor × t_sf0.1); ≈1 is linear, <1 is
    sublinear (fixed job overhead amortizing), >1 flags superlinear work.
    The merge's own 10x number stays in BENCH.md (bench_scaling scale10)."""
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    dst = tempfile.mkdtemp(prefix="cdc_sf1_", dir=scratch)
    try:
        t0 = time.perf_counter()
        synthesize_sf1(spark, SF_DIR, dst, factor=factor)
        gen_s = time.perf_counter() - t0
        per_query = {}
        for name in HEADLINE:
            best, control = time_query(spark, queries[name], dst)
            base = base_times.get(name)
            per_query[name] = {
                "sf1_s": round(best, 3),
                "sf01_s": base,
                "ratio_per_event": round(best / (factor * base), 2)
                if base else None,
                "probe_factor": control["probe_factor"],
            }
        return {
            "factor": factor,
            "synthesis": "disjoint-id copies; documents alphabet-rotated, "
                         "embeddings dim-rotated (see synthesize_sf1): "
                         "within-copy structure exact, no artificial "
                         "cross-copy duplicates",
            "generate_s": round(gen_s, 3),
            "queries": per_query,
        }
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def main():
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench", cores=CPUS)

    # warm-up: JVM, codegen, parquet reader — outside every timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/events.parquet").limit(10).collect()
    host_control_probe(spark)  # warm the probe's own codegen once

    # host-noise control, sampled immediately before the headline metric and
    # again after all queries: pure-compute probe ÷ good-day constant = how
    # slow the BOX is right now, independent of the engine
    probe_before = host_control_probe(spark)
    bw_before = bandwidth_probe(spark)

    # The merge replay is the HEADLINE metric (north rule) — run it FIRST,
    # on a fresh JVM: measured after the 13 headline queries it inherits
    # their heap/codegen state (observed 6.2s solo vs 16-26s when last,
    # same binary same input — the same ordering effect bench_scaling's
    # scale10 mode documents for its query timings).
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "4000000"))
    merge = bench_merge_throughput(spark, n_events)

    queries = E.queries()
    per_query = {}
    query_control = {}
    total = 0.0
    for name in HEADLINE:
        dt, control = time_query(spark, queries[name], SF_DIR)
        per_query[name] = round(dt, 3)
        query_control[name] = control
        total += dt

    per_query["cdc_merge_replay"] = merge["seconds"]
    total += merge["seconds"]

    probe_after = host_control_probe(spark)
    bw_after = bandwidth_probe(spark)

    sf1 = (bench_sf1(spark, queries, per_query)
           if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0" else None)

    commit_cost = bench_commit_cost(spark)
    commit_metadata = bench_commit_metadata(spark)
    commit_buckets = bench_commit_buckets(spark)
    read_path = bench_read_path(spark)
    latency = bench_microbatch_latency(spark)

    host_control = {
        "probe": "spark.range(1e9, 128 parts) -> avg(xxhash64) (pure JVM "
                 "compute, no shuffle/disk/Python; bench_scaling.py's "
                 "host-ceiling calibration job)",
        "good_day_s": HOST_CONTROL_GOOD_S,
        "probe_s_before_merge": round(probe_before, 3),
        "probe_s_after_queries": round(probe_after, 3),
        # >1 = the box was running that many times slower than its own
        # calibrated good day AT THE MOMENT THE HEADLINE MERGE STARTED;
        # divide the merge wall time by this to normalize across rounds.
        # The after-queries probe is reported separately because it also
        # reflects accumulated JVM heap/codegen state (measured up to ~4×
        # on the same box seconds apart), which is session state, not the
        # host — comparing the two localizes a slowdown to box vs JVM.
        "slowdown_factor": round(probe_before / HOST_CONTROL_GOOD_S, 2),
        # bandwidth twin (write+read 20M-row parquet on the bench's own
        # tmpfs scratch): the CPU probe misses memory-bandwidth/tmpfs
        # starvation — the condition that actually slows this shuffle-heavy
        # engine (measured: CPU probe 1.35× while every heavy leg ran
        # 2-6× slow).  Raw seconds; classify a slow artifact by WHICH
        # probe moved.  The factor is a validity gate, not a divisor.
        "bw_probe": "range(2e7) + md5 pad -> parquet write + read-back "
                    "count on the bench scratch (tmpfs when available)",
        "bw_probe_s_before_merge": round(bw_before, 3),
        "bw_probe_s_after_queries": round(bw_after, 3),
    }

    print(
        json.dumps(
            {
                "metric": "change-events/sec applied (end-to-end merge replay) + headline query wall time",
                "value": round(total, 3),
                "unit": "sec",
                # the headline set GROWS across rounds (scale twins added in
                # r6): compare per-query rows, not totals, across artifacts
                "n_headline_queries": len(HEADLINE),
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "merge_throughput": merge,
                "host_control": host_control,
                # per-query validity signals (r5 verdict #2): every headline
                # row carries its own sample spread + interleaved mini-probe
                "query_control": query_control,
                "sf1": sf1,
                "commit_cost": commit_cost,
                "commit_metadata": commit_metadata,
                "commit_buckets": commit_buckets,
                "read_path": read_path,
                "microbatch_latency": latency,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
