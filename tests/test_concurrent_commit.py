"""Optimistic concurrency: the manifest filename is the commit lock.

Two writers that both read manifest version v-1 and race to commit v must
not silently last-write-wins each other — the loser raises
ConcurrentCommitError (retriable: a re-run merge re-reads the manifest and
self-heals).  A crash that leaves a manifest file unpointed (written but
CURRENT never swung) must NOT poison the version slot forever.
"""

import pytest
from pyspark.sql import functions as F

from go_data_publisher_spark.lake.table import ConcurrentCommitError, TranscriptTable
from go_data_publisher_spark.sources.changelog import generate_changelog
from go_data_publisher_spark.streaming.apply import ChangeApplier, RetryPolicy


def _clean(log):
    return log.where("conv_id is not null and turn_idx is not null")


def test_lost_race_raises_concurrent_commit(spark, tmpdir_path):
    root = f"{tmpdir_path}/tbl"
    ta = TranscriptTable(spark, root, n_buckets=4)
    tb = TranscriptTable(spark, root, n_buckets=4)
    log = _clean(generate_changelog(spark, 400, n_convs=10, seed=3)).persist()

    # A reads the manifest (version 0), then B commits version 1 first
    ma = ta.manifest()
    assert tb.merge(log.where("lsn <= 200"), epoch_id=0)["status"] == "committed"
    # A's commit, computed against the stale read, must lose LOUDLY
    with pytest.raises(ConcurrentCommitError):
        ta._commit(ma, epoch_id=1, batch_max_lsn=None)
    # nothing was clobbered: B's commit is intact and readable
    assert tb.manifest()["version"] == 1
    assert tb.snapshot().count() > 0


def test_merge_retry_after_lost_race_self_heals(spark, tmpdir_path):
    root = f"{tmpdir_path}/tbl"
    ta = TranscriptTable(spark, root, n_buckets=4)
    tb = TranscriptTable(spark, root, n_buckets=4)
    log = _clean(generate_changelog(spark, 400, n_convs=10, seed=3)).persist()
    ta.manifest()  # A's stale read happens implicitly inside merge(); simulate
    # the race by having B commit between A's construction and A's merge
    assert tb.merge(log.where("lsn <= 200"), epoch_id=0)["status"] == "committed"
    # merge() re-reads the manifest at the top of each call, so A's merge
    # targets version 2 and succeeds — no conflict, no lost data
    out = ta.merge(log.where("lsn > 200"), epoch_id=1)
    assert out["status"] == "committed"
    assert ta.manifest()["version"] == 2
    # the applier's RetryPolicy classifies the conflict retriable
    assert RetryPolicy().is_retriable(ConcurrentCommitError("x"))


def test_crash_leftover_manifest_slot_is_reclaimed(spark, tmpdir_path):
    root = f"{tmpdir_path}/tbl"
    tbl = TranscriptTable(spark, root, n_buckets=4)
    log = _clean(generate_changelog(spark, 200, n_convs=5, seed=4)).persist()
    # simulate a crash between manifest write and CURRENT swap: version 1
    # exists on disk but CURRENT still points at 0.  Under the flock commit
    # section no live writer can be mid-commit while we hold the lock, so
    # the slot is reclaimed immediately — no grace-window stall, and the
    # replayed epoch commits on its first retry-free attempt.
    leftover = tbl._manifest_path(1)
    with open(leftover, "w") as f:
        f.write("{}")
    assert tbl.merge(log, epoch_id=0)["status"] == "committed"
    assert tbl.manifest()["version"] == 1
    assert tbl.snapshot().count() > 0


def test_overlap_guard_survives_reopen(spark, tmpdir_path):
    # the D5 guard is merge SEMANTICS: a maintenance CLI reopening the table
    # with default args must not silently disarm it
    root = f"{tmpdir_path}/iv"
    t1 = TranscriptTable(
        spark, root, n_buckets=4, key=["k"], order_col="v_to",
        schema=_interval_schema(), overlap_guard=("v_from", "v_to"),
    )
    assert t1.overlap_guard == ("v_from", "v_to")
    t2 = TranscriptTable(spark, root)
    assert t2.overlap_guard == ("v_from", "v_to")
    assert t2.key == ["k"] and t2.order_col == "v_to" and t2.n_buckets == 4


def _interval_schema():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("k", T.StringType(), True),
        T.StructField("v_from", T.LongType(), True),
        T.StructField("v_to", T.LongType(), True),
    ])


def test_interleaved_appliers_with_conflict_retry(spark, tmpdir_path):
    """Two writer-scoped appliers on one table: each commit advances the
    shared manifest; the epoch guards stay per-writer; final state equals a
    single-writer application of the union."""
    root = f"{tmpdir_path}/tbl"
    log = _clean(generate_changelog(spark, 1000, n_convs=20, seed=9)).persist()
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    ta = ChangeApplier(TranscriptTable(spark, root, n_buckets=4), writer_id="wa")
    tb = ChangeApplier(TranscriptTable(spark, root, n_buckets=4), writer_id="wb")
    ta.apply_batch(log.where(F.col("lsn") <= mid), epoch_id=0)
    tb.apply_batch(log.where(F.col("lsn") > mid), epoch_id=0)
    # replay of each writer's epoch 0 is a per-writer no-op
    assert ta.apply_batch(log.where(F.col("lsn") <= mid), epoch_id=0)["status"] == "skipped_replay"
    assert tb.apply_batch(log.where(F.col("lsn") > mid), epoch_id=0)["status"] == "skipped_replay"

    solo_root = f"{tmpdir_path}/solo"
    solo = ChangeApplier(TranscriptTable(spark, solo_root, n_buckets=4))
    solo.apply_batch(log, epoch_id=0)
    a = sorted(map(tuple, TranscriptTable(spark, root, n_buckets=4).snapshot().collect()))
    b = sorted(map(tuple, TranscriptTable(spark, solo_root, n_buckets=4).snapshot().collect()))
    assert a == b
