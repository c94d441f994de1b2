"""Table maintenance: compaction and vacuum (snapshot expiry + orphan GC)."""

import os

from go_data_publisher_spark.lake.table import TranscriptTable
from go_data_publisher_spark.sources.changelog import generate_changelog
from go_data_publisher_spark.streaming.apply import ChangeApplier, replay_batch_range
from pyspark.sql import functions as F


def _count_data_files(root):
    n = 0
    for dirpath, _dirs, files in os.walk(f"{root}/data"):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_compact_and_vacuum(spark, tmpdir_path):
    root = f"{tmpdir_path}/tbl"
    tbl = TranscriptTable(spark, root, n_buckets=4)
    app = ChangeApplier(tbl)
    log = generate_changelog(spark, 2000, n_convs=40, seed=51).persist()
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo) // 4 + 1
    bounds = [(lo + i * span, min(hi, lo + (i + 1) * span - 1)) for i in range(4)]
    replay_batch_range(app, log, bounds)

    before_rows = sorted(tbl.snapshot().collect())
    files_before = _count_data_files(root)
    assert files_before > 4  # several commits' worth

    tbl.compact()
    assert sorted(tbl.snapshot().collect()) == before_rows

    stats = tbl.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert stats["removed_files"] > 0 and stats["removed_manifests"] > 0
    # current snapshot unaffected; all remaining files referenced
    assert sorted(tbl.snapshot().collect()) == before_rows
    live = {f["path"] for f in tbl.manifest()["files"]}
    on_disk = set()
    for dirpath, _dirs, files in os.walk(f"{root}/data"):
        on_disk |= {f"{dirpath}/{f}" for f in files if f.endswith(".parquet")}
    kept_manifest_refs = set()
    for h in tbl.history():
        kept_manifest_refs |= {f["path"] for f in tbl.manifest(h["version"])["files"]}
    assert on_disk == kept_manifest_refs
    assert live <= on_disk

    # replay guard survives vacuum (epoch hwm kept in current manifest)
    stats2 = app.apply_batch(log.where(F.col("lsn").between(*bounds[0])), epoch_id=0)
    assert stats2["status"] == "skipped_replay"


def test_inline_compaction_policy(spark, tmpdir_path):
    """compact_delta_files: buckets accumulating deltas past the threshold
    are folded back to base incrementally during the stream, keeping
    read amplification bounded without whole-table rewrites."""
    root = f"{tmpdir_path}/tbl"
    tbl = TranscriptTable(spark, root, n_buckets=4)
    app = ChangeApplier(tbl, compact_delta_files=3)
    log = generate_changelog(spark, 3000, n_convs=40, seed=77).persist()
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    span = (hi - lo) // 6 + 1
    bounds = [(lo + i * span, min(hi, lo + (i + 1) * span - 1)) for i in range(6)]
    stats = replay_batch_range(app, log, bounds)
    assert any("compacted_buckets" in s for s in stats)
    # policy held: no bucket carries >= 3+1 deltas after any commit
    assert all(n <= 3 for n in tbl.delta_file_counts().values())
    # state identical to a never-compacted replay
    from conftest import pandas_final_state
    import pandas as pd

    snap = tbl.snapshot().orderBy("conv_id", "turn_idx").toPandas()
    oracle = pandas_final_state(log.toPandas()).sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        snap["text"].reset_index(drop=True), oracle["text"].reset_index(drop=True),
        check_names=False, obj="text")


def test_compaction_retains_tombstones_against_late_changes(spark, tmpdir_path):
    """A delete folded away by compaction must still beat a lower-LSN change
    that arrives afterwards (out-of-order redelivery behind a compaction) —
    tombstones persist in base files until explicitly expired."""
    from go_data_publisher_spark.lake.table import TranscriptTable
    from go_data_publisher_spark.streaming.apply import ChangeApplier

    SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp, schema_version int")
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    app = ChangeApplier(tbl)
    app.apply_batch(spark.createDataFrame(
        [(5, "D", "c1", 0, "user", None, None, None, 1),
         (6, "I", "c2", 0, "user", "keep", None, None, 1)], SCHEMA), epoch_id=1)
    tbl.compact()
    app.apply_batch(spark.createDataFrame(
        [(1, "I", "c1", 0, "user", "stale", None, None, 1)], SCHEMA), epoch_id=0)
    assert [(r.conv_id, r.text) for r in tbl.snapshot().collect()] == [("c2", "keep")]

    # expiry below a replay low-watermark drops the tombstone for good
    tbl.compact(drop_tombstones_below=10)
    winners = tbl.snapshot(keep_tombstones=True).collect()
    assert [(r.conv_id, r.op) for r in winners] == [("c2", "I")]


def test_random_maintenance_interleaving_preserves_state(spark, tmpdir_path):
    """Merge chunks interleaved with incremental compactions and vacuums (in
    random but seeded order) must fold to exactly the no-maintenance replay
    state — the manifest-delta plane may never lose or resurrect a file
    across squash/expiry/compaction."""
    import random

    from conftest import pandas_final_state
    import pandas as pd

    for seed in (101, 202):
        rng = random.Random(seed)
        root = f"{tmpdir_path}/tbl{seed}"
        tbl = TranscriptTable(spark, root, n_buckets=4)
        app = ChangeApplier(tbl)
        log = generate_changelog(spark, 2500, n_convs=30, seed=seed).persist()
        lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
        n_chunks = 5
        span = (hi - lo) // n_chunks + 1
        for i in range(n_chunks):
            b = (lo + i * span, min(hi, lo + (i + 1) * span - 1))
            app.apply_batch(log.where(F.col("lsn").between(*b)), epoch_id=i)
            action = rng.random()
            if action < 0.4:
                tbl.compact(buckets=rng.sample(range(4), rng.randint(1, 3)))
            elif action < 0.7:
                tbl.vacuum(keep_versions=rng.randint(1, 3),
                           orphan_grace_seconds=0)
        snap = tbl.snapshot().orderBy("conv_id", "turn_idx").toPandas()
        oracle = pandas_final_state(log.toPandas()).sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        pd.testing.assert_series_equal(
            snap["text"].reset_index(drop=True),
            oracle["text"].reset_index(drop=True),
            check_names=False, obj=f"text seed={seed}")
        log.unpersist()
