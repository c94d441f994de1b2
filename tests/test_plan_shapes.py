"""Physical-plan regression tests: the optimizations we rely on at 100 TB
must be visible in `.explain` — pushdown, pruning, map-side partial
aggregation, broadcast merge joins.  A code change that silently loses one of
these passes correctness but regresses at scale; these tests pin the plan."""

import tempfile

from pyspark.sql import functions as F

from go_data_publisher_spark.lake.table import TranscriptTable
from go_data_publisher_spark.operators.dedup import last_wins
from go_data_publisher_spark.sources.changelog import generate_changelog

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = ev.where((F.col("event_id") > 100) & (F.col("event_id") <= 500)).select(
        "event_id", "user_id"
    )
    plan = _plan(df)
    assert "PushedFilters" in plan and "GreaterThan(event_id,100)" in plan
    # only the two projected columns reach the scan
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint>" in plan


def test_dedup_has_mapside_partial_aggregation(spark):
    log = generate_changelog(spark, 2000, seed=3).where("conv_id is not null")
    plan = _plan(last_wins(log))
    # partial_max_by before the exchange = hot keys reduced locally (skew-robust)
    assert "partial_max_by" in plan
    assert "Exchange hashpartitioning(conv_id" in plan


def test_small_merge_uses_broadcast_join(spark):
    root = tempfile.mkdtemp()
    tbl = TranscriptTable(spark, f"{root}/t", n_buckets=4)
    log = generate_changelog(spark, 500, seed=5).where(
        "conv_id is not null and turn_idx is not null"
    )
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    ChangeApplier(tbl).apply_batch(log, epoch_id=0)

    # build the broadcast-strategy merge plan against the committed table
    cols = [f.name for f in tbl.schema.fields]
    changes = last_wins(log).select(*cols, "op")
    current = tbl.snapshot()
    batch_keys = changes.select("conv_id", "turn_idx").distinct()
    survivors = current.join(F.broadcast(batch_keys), on=["conv_id", "turn_idx"], how="left_anti")
    plan = _plan(survivors)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_streaming_source_respects_max_files_per_trigger(spark, tmpdir_path):
    from go_data_publisher_spark.sources.changelog import write_changelog_stream_dir
    from go_data_publisher_spark.streaming.apply import ChangeApplier
    from go_data_publisher_spark.streaming.pipeline import run_stream

    log = generate_changelog(spark, 600, seed=7)
    src = f"{tmpdir_path}/src"
    write_changelog_stream_dir(log, src, n_chunks=4)
    tbl = TranscriptTable(spark, f"{tmpdir_path}/t", n_buckets=2)
    state = run_stream(spark, src, ChangeApplier(tbl), f"{tmpdir_path}/ck",
                       max_files_per_trigger=1)
    assert state["applied"] == 4  # one microbatch per file (Q2 clamp semantics)


def test_monotonic_check_window_is_partitioned(spark):
    """Q6 at scale: the violation count over the big table must run in a
    window PARTITIONED by the seq-range slice (parallel), never a global
    orderBy window (single reducer).  The only unpartitioned window allowed
    is the O(n_parts) boundary stitch over the per-slice summary."""
    from go_data_publisher_spark.operators.sequencing import verify_monotonic

    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = verify_monotonic(ev, "event_id", attr_cols=("ts",), strict=False)
    plan = _plan(df)
    # the data-sized window partitions by the range slice
    assert "hashpartitioning(__part" in plan


def test_merge_on_read_snapshot_folds_with_partial_agg(spark, tmpdir_path):
    """The MOR fold must be the skew-robust max_by hash aggregate with
    map-side partial aggregation — same shape as the write-side dedup."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    tbl = TranscriptTable(spark, f"{tmpdir_path}/t", n_buckets=4)
    log = generate_changelog(spark, 400, seed=11)
    app = ChangeApplier(tbl)
    app.apply_batch(log, epoch_id=0)
    plan = _plan(tbl.snapshot())
    assert "partial_max_by" in plan
    # after compaction there are no deltas: the fold disappears entirely
    tbl.compact()
    plan2 = _plan(tbl.snapshot())
    assert "max_by" not in plan2


def test_quota_window_consumes_boundary_filter_not_full_scan(spark):
    """quota_per_group's ranking window must sit above the boundary-bucket
    filter (only the straddling hash-prefix bucket per group is sorted) —
    losing that filter silently reverts to a full-group single-task sort."""
    from go_data_publisher_spark.operators.sampling import quota_per_group

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = quota_per_group(docs, "lang", quota=5, key_col="doc_id")
    opt = _optimized(out)
    # the two-phase shape: a count aggregate feeds the plan...
    assert "count(1)" in opt
    # ...and the row_number window's input subtree carries the boundary
    # predicate on the cumulative count (below < quota AND below + c > quota)
    win_at = opt.index("row_number()")
    below_window = opt[win_at:]
    assert "__below" in below_window and "window" in opt.lower()
    # the window operates after a Filter mentioning __below — i.e. on the
    # boundary bucket, not on the raw scan
    import re
    filt = re.search(r"Filter .*__below", opt)
    assert filt is not None, "boundary filter missing from the optimized plan"


def test_sliding_window_agg_has_partial_aggregation(spark):
    """Sliding windows stay inside the partial→exchange→final hash-agg shape
    (the window structs are emitted BEFORE the aggregate, so map-side
    combine applies and shuffle volume is rows × overlap, not history)."""
    from go_data_publisher_spark.streaming.windows import sliding_event_counts

    log = generate_changelog(spark, 2000, seed=9).where("ts is not null")
    plan = _plan(sliding_event_counts(
        log, ts_col="ts", window_duration="1 hour",
        slide_duration="30 minutes", keys=("conv_id",)))
    assert "partial_count" in plan or "partial_min" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_session_window_agg_is_time_local(spark):
    """Session windows shuffle on (session candidate, key) — one exchange,
    no global sort of the whole stream."""
    from go_data_publisher_spark.streaming.windows import session_event_counts

    log = generate_changelog(spark, 2000, seed=9).where("ts is not null")
    plan = _plan(session_event_counts(
        log, ts_col="ts", gap_duration="5 minutes", keys=("conv_id",)))
    assert "Exchange hashpartitioning" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_snapshot_fold_covers_only_dirty_buckets(spark, tmpdir_path):
    """The MOR fold shuffles ONLY buckets that hold delta files; compacted
    buckets bypass the aggregate as a plain scan.  A mostly-compacted table
    must not pay a full-table shuffle because one bucket has fresh deltas
    (lake/table.py:_split_snapshot_files)."""
    from go_data_publisher_spark.lake.table import (
        TranscriptTable, _split_snapshot_files, bucket_expr,
    )
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    tbl = TranscriptTable(spark, f"{tmpdir_path}/t", n_buckets=4)
    log = generate_changelog(spark, 2000, seed=13).where(
        "conv_id is not null and turn_idx is not null")
    app = ChangeApplier(tbl)
    app.apply_batch(log, epoch_id=0)
    tbl.compact()

    # second batch touches ONE bucket only
    hot = log.where(bucket_expr("conv_id", 4) == 0)
    assert hot.count() > 0
    app.apply_batch(hot, epoch_id=1)

    files = tbl.manifest()["files"]
    fold_files, clean_files = _split_snapshot_files(files)
    assert {f["bucket"] for f in fold_files} == {0}
    assert {f["bucket"] for f in clean_files} == {1, 2, 3}

    plan = _plan(tbl.snapshot())
    # the fold is still the skew-robust partial max_by...
    assert "partial_max_by" in plan
    # ...but the clean buckets ride a Union branch around it
    assert "Union" in plan
    # exactly one hash-exchange in the whole snapshot: the dirty-bucket fold
    assert plan.count("Exchange hashpartitioning") == 1


def test_snapshot_split_path_equals_pure_fold_path(spark, tmpdir_path):
    """Correctness of the dirty-bucket split: a compact-then-delta table
    (union of folded + clean branches) returns exactly the rows of the same
    change stream applied with no compaction (single full fold)."""
    from go_data_publisher_spark.lake.table import TranscriptTable, bucket_expr
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    log = generate_changelog(spark, 3000, seed=17).where(
        "conv_id is not null and turn_idx is not null")
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    b1, b2 = log.where(F.col("lsn") <= mid), log.where(F.col("lsn") > mid)
    # bias the second batch to one bucket so the split table is mostly clean
    b2 = b2.where(bucket_expr("conv_id", 4) == 2)

    split_tbl = TranscriptTable(spark, f"{tmpdir_path}/split", n_buckets=4)
    app = ChangeApplier(split_tbl)
    app.apply_batch(b1, epoch_id=0)
    split_tbl.compact()
    app.apply_batch(b2, epoch_id=1)

    fold_tbl = TranscriptTable(spark, f"{tmpdir_path}/fold", n_buckets=4)
    app2 = ChangeApplier(fold_tbl)
    app2.apply_batch(b1, epoch_id=0)
    app2.apply_batch(b2, epoch_id=1)

    cols = sorted(c for c in split_tbl.snapshot().columns)
    left = sorted(map(tuple, split_tbl.snapshot().select(*cols).collect()))
    right = sorted(map(tuple, fold_tbl.snapshot().select(*cols).collect()))
    assert left == right


def test_split_snapshot_files_multi_base_bucket_is_folded():
    """A bucket holding >1 base file (foreign-tool manifest edit) loses the
    one-winner-per-key invariant and must route through the fold."""
    from go_data_publisher_spark.lake.table import _split_snapshot_files

    files = [
        {"path": "a", "bucket": 0, "kind": "base"},
        {"path": "b", "bucket": 0, "kind": "base"},
        {"path": "c", "bucket": 1, "kind": "base"},
        {"path": "d", "bucket": 2, "kind": "base"},
        {"path": "e", "bucket": 2, "kind": "delta"},
    ]
    fold, clean = _split_snapshot_files(files)
    assert {f["bucket"] for f in fold} == {0, 2}
    assert [f["path"] for f in clean] == ["c"]


def test_stab_count_plan_enumerates_no_pairs(spark):
    """interval_stab_count must contain NO pair-enumerating join: no
    broadcast nested loop, no sort-merge join — its only join is the
    broadcast of the <= n_parts per-slice offsets."""
    from go_data_publisher_spark.operators.sequencing import (
        group_intervals, interval_stab_count,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    iv = group_intervals(ev, ["user_id"], "event_id")
    out = interval_stab_count(ev.select("event_id"), iv, lsn_col="event_id")
    plan = _plan(out)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the offsets stitch
    # the only nested-loop joins are the 1-ROW min/max bounds broadcast (a
    # scalar ride-along, not pair enumeration — same shape as next_range's
    # bounds crossJoin), which appears once under the running-sum branch and
    # once under the per-slice offsets branch; the interval side must never
    # nested-loop the events
    assert plan.count("BroadcastNestedLoopJoin") == 2


def test_lookup_reads_one_bucket_with_pushed_filter(spark, tmpdir_path):
    """TranscriptTable.lookup must be a single-bucket read (file pruning via
    the manifest, NOT a filtered table scan) with the key equality pushed
    down into the parquet scan."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    tbl = TranscriptTable(spark, f"{tmpdir_path}/t", n_buckets=8)
    log = generate_changelog(spark, 2000, seed=19).where(
        "conv_id is not null and turn_idx is not null")
    ChangeApplier(tbl).apply_batch(log, epoch_id=0)
    tbl.compact()

    conv = log.select("conv_id").first()["conv_id"]
    b = tbl.bucket_of(conv)
    out = tbl.lookup(conv)

    # file pruning: only the key's bucket is read
    def norm(p):  # inputFiles returns file:// URIs; the manifest raw paths
        return p.removeprefix("file://")

    expected_files = {f["path"] for f in tbl.manifest()["files"]
                      if f["bucket"] == b}
    assert {norm(p) for p in out.inputFiles()} <= expected_files
    assert len(out.inputFiles()) < len(tbl.manifest()["files"])
    # predicate pushdown into the pruned scan
    plan = _plan(out)
    assert "PushedFilters" in plan and "IsNotNull(conv_id)" in plan

    # correctness: equals the full-snapshot filter
    cols = out.columns
    got = sorted(map(tuple, out.select(*cols).collect()))
    want = sorted(map(tuple, tbl.snapshot().where(
        F.col("conv_id") == conv).select(*cols).collect()))
    assert got == want and got
    # compound-key form pins to one row
    ti = got[0][cols.index("turn_idx")]
    one = tbl.lookup(conv, second=ti).collect()
    assert len(one) == 1
