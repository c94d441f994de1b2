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
