"""Manifest metadata plane: per-commit file-list DELTAS + periodic
checkpoints (Delta Lake's JSON-actions-plus-checkpoint log).  A commit must
write O(batch-files) metadata regardless of live-file count — the reference's
cursor write is O(1) (status-service/db/store.go:144); rewriting the full
live-file list per commit was the last O(table) driver artifact."""

import json
import os

import pytest

from go_data_publisher_spark.lake.table import TranscriptTable

SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, schema_version int"
)


def _raw(tbl, v):
    with open(tbl._manifest_path(v)) as f:
        return json.load(f)


def _entry(i, bucket=0, kind="delta", seq=1):
    return {"path": f"/x/f{i}.parquet", "bucket": bucket,
            "schema_id": 0, "kind": kind, "seq": seq}


def test_commit_writes_delta_not_full_list(spark, tmpdir_path):
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    # preload many synthetic live files via the metadata plane alone
    m = tbl.manifest()
    tbl._publish(m, files_added=[_entry(i) for i in range(500)])
    v1 = tbl.manifest()["version"]
    assert tbl.manifest()["n_live_files"] == 500

    # a small commit on top writes a DELTA manifest naming only its own files
    m = tbl.manifest()
    tbl._publish(m, files_added=[_entry(1000), _entry(1001)])
    v2 = tbl.manifest()["version"]
    raw = _raw(tbl, v2)
    assert "files" not in raw
    assert raw["base_version"] == v1
    assert len(raw["files_added"]) == 2 and raw["files_removed"] == []
    # O(batch) on disk: the delta manifest is much smaller than a checkpoint
    assert (os.path.getsize(tbl._manifest_path(v2))
            < os.path.getsize(tbl._manifest_path(0)) + 2000)

    # ...but the folded view is the full live set
    assert tbl.manifest()["n_live_files"] == 502
    assert len(tbl.manifest()["files"]) == 502


def test_checkpoint_every_interval_and_chain_resolution(spark, tmpdir_path):
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    n = tbl._CHECKPOINT_INTERVAL + 5
    for i in range(1, n + 1):
        tbl._publish(tbl.manifest(), files_added=[_entry(i)])
    ck = tbl._CHECKPOINT_INTERVAL
    assert "files" in _raw(tbl, ck), "interval version must be a checkpoint"
    assert "files" not in _raw(tbl, ck - 1) and "files" not in _raw(tbl, ck + 1)
    # resolution across the checkpoint boundary sees every added file, and a
    # fresh reader (empty cache) folds the chain identically
    assert len(tbl.manifest()["files"]) == n
    fresh = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    assert {f["path"] for f in fresh.manifest()["files"]} \
        == {_entry(i)["path"] for i in range(1, n + 1)}
    # n_files in history comes from the running counter (no folding)
    hist = {h["version"]: h for h in tbl.history()}
    assert hist[n]["n_files"] == n and hist[ck]["kind"] == "checkpoint"
    assert hist[ck + 1]["kind"] == "delta"


def test_removals_fold_and_count(spark, tmpdir_path):
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    tbl._publish(tbl.manifest(), files_added=[_entry(i) for i in range(10)])
    tbl._publish(tbl.manifest(),
                 files_added=[_entry(100)],
                 files_removed=[_entry(i)["path"] for i in range(4)])
    m = tbl.manifest()
    assert m["n_live_files"] == 7 == len(m["files"])
    assert _entry(0)["path"] not in {f["path"] for f in m["files"]}
    assert _entry(100)["path"] in {f["path"] for f in m["files"]}


def test_vacuum_squashes_stranded_chains(spark, tmpdir_path):
    """Expiring manifests below the keep window must not strand a kept delta
    manifest's base chain: vacuum folds such manifests into content-identical
    checkpoints in place before deleting."""
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    for i in range(1, 6):
        tbl._publish(tbl.manifest(), files_added=[_entry(i)])
    before = {f["path"] for f in tbl.manifest()["files"]}
    assert "files" not in _raw(tbl, 5)  # delta chained to v4 -> ... -> v0
    stats = tbl.vacuum(keep_versions=2, orphan_grace_seconds=0)
    assert stats["removed_manifests"] == 4  # v0..v3 gone (kept: v4, v5)
    # kept versions still resolve, from a fresh reader, to the same live set
    fresh = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    assert {f["path"] for f in fresh.manifest()["files"]} == before
    assert {f["path"] for f in fresh.manifest(4)["files"]} == before - {_entry(5)["path"]}
    # the oldest kept version was squashed to a self-contained checkpoint
    assert "files" in _raw(tbl, 4)

    # a vacuumed version now raises a clear retention error, not FileNotFound
    with pytest.raises(ValueError, match="oldest retained version is 4"):
        fresh.manifest(2)
    with pytest.raises(ValueError, match="not retained"):
        fresh.snapshot(version=1)


def test_writer_expiry(spark, tmpdir_path):
    """Stale named writers are dropped from the manifest at the next commit
    once past the retention window (Delta's txn retention) — the writers map
    must not grow forever with rotated checkpoint ids."""
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    df = spark.createDataFrame([(1, "I", "c1", 0, "user", "t", None, None, 1)], SCHEMA)
    assert tbl.merge(df, epoch_id=0, writer_id="old-pipeline")["status"] == "committed"
    assert "old-pipeline" in tbl.manifest()["writers"]
    assert tbl.is_epoch_committed(0, writer_id="old-pipeline")

    tbl.writer_retention_seconds = 0.0  # everything not committing NOW is stale
    df2 = spark.createDataFrame([(2, "I", "c2", 0, "user", "t", None, None, 1)], SCHEMA)
    assert tbl.merge(df2, epoch_id=0, writer_id="new-pipeline")["status"] == "committed"
    writers = tbl.manifest()["writers"]
    assert "new-pipeline" in writers and "old-pipeline" not in writers
    assert "last_commit_at" in writers["new-pipeline"]
    # within retention, both survive
    tbl.writer_retention_seconds = 3600.0
    df3 = spark.createDataFrame([(3, "I", "c3", 0, "user", "t", None, None, 1)], SCHEMA)
    tbl.merge(df3, epoch_id=1, writer_id="new-pipeline")
    assert tbl.is_epoch_committed(1, writer_id="new-pipeline")


def test_leftover_manifest_does_not_poison_history_or_vacuum(spark, tmpdir_path):
    """A crashed writer's unpointed manifest (version > CURRENT, arbitrary
    garbage content) must be invisible to history()/manifest() readers and
    reclaimed by vacuum — never parsed as a snapshot."""
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    for i in range(1, 4):
        tbl._publish(tbl.manifest(), files_added=[_entry(i)])
    cur = tbl.manifest()["version"]
    with open(tbl._manifest_path(cur + 1), "w") as f:
        f.write("{}")  # crash between manifest write and CURRENT swap
    with open(tbl._manifest_path(cur + 5), "w") as f:
        f.write("not json at all")

    assert [h["version"] for h in tbl.history()] == [0, 1, 2, 3]
    assert tbl.manifest()["version"] == cur  # CURRENT untouched

    stats = tbl.vacuum(keep_versions=2, orphan_grace_seconds=0)
    # expired: v0, v1 (outside keep) + both leftovers
    assert stats["removed_manifests"] == 4
    assert {h["version"] for h in tbl.history()} == {2, 3}
    # table still fully functional: next commit takes the reclaimed slot
    tbl._publish(tbl.manifest(), files_added=[_entry(99)])
    assert tbl.manifest()["version"] == cur + 1
    assert len(tbl.manifest()["files"]) == 4
