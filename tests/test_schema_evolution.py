"""Schema-evolution stage (archiverv1/v2 analogue, status-service/main.go:
157-163): v1 table + v2 batch → column added; int widening; old files
readable after evolution; incompatible change rejected."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_data_publisher_spark.lake.table import TranscriptTable
from go_data_publisher_spark.sources.changelog import generate_changelog
from go_data_publisher_spark.streaming.apply import ChangeApplier

V1_TARGET = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("lsn", T.LongType(), False),
    ]
)


def test_v1_to_v2_adds_tool_column(spark, tmpdir_path):
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=4, schema=V1_TARGET)
    app = ChangeApplier(tbl)

    v1 = generate_changelog(spark, 800, n_convs=30, seed=41, schema_v2_from=1.1).drop("tool")
    app.apply_batch(v1, epoch_id=0)
    assert "tool" not in [f.name for f in tbl.schema.fields]
    rows_v1 = tbl.snapshot().count()
    assert rows_v1 > 0

    # v2 batch carries `tool`: schema diff must widen the target before merge
    v2 = generate_changelog(spark, 1600, n_convs=30, seed=41).where("lsn > 830")
    app.apply_batch(v2, epoch_id=1)
    names = [f.name for f in tbl.schema.fields]
    assert "tool" in names

    snap = tbl.snapshot()
    assert "tool" in snap.columns
    # old rows (from v1 files, never rewritten) read back as null tool
    assert snap.where(F.col("tool").isNotNull()).count() > 0
    assert snap.where(F.col("tool").isNull()).count() > 0


def test_int_widening(spark, tmpdir_path):
    narrow = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("amount", T.IntegerType(), True),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2, schema=narrow)
    changed = tbl.evolve_schema(
        T.StructType([T.StructField("amount", T.LongType(), True)])
    )
    assert changed
    amount = next(f for f in tbl.schema.fields if f.name == "amount")
    assert amount.dataType == T.LongType()


def test_noop_when_schema_unchanged(spark, tmpdir_path):
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    v = tbl.manifest()["version"]
    assert tbl.evolve_schema(tbl.schema) is False
    assert tbl.manifest()["version"] == v


def test_incompatible_change_rejected(spark, tmpdir_path):
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2)
    with pytest.raises(ValueError, match="incompatible"):
        tbl.evolve_schema(T.StructType([T.StructField("turn_idx", T.StringType(), True)]))


def test_old_files_cast_up_after_widening(spark, tmpdir_path):
    narrow = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("amount", T.IntegerType(), True),
            T.StructField("lsn", T.LongType(), False),
        ]
    )
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=2, schema=narrow,
                          key=("conv_id", "turn_idx"))
    batch = spark.createDataFrame(
        [("c1", 0, 7, 1, "I")], "conv_id string, turn_idx int, amount int, lsn long, op string"
    )
    tbl.merge(batch, epoch_id=0)
    tbl.evolve_schema(T.StructType([T.StructField("amount", T.LongType(), True)]))
    snap = tbl.snapshot()
    assert dict(snap.dtypes)["amount"] == "bigint"
    assert snap.first()["amount"] == 7


def test_compaction_collapses_schema_groups(spark, tmpdir_path):
    """evolve → merge → compact: the rewrite folds every old-schema file
    group into base files at the CURRENT schema id (lake/table.py:compact
    reads winners via snapshot(), which upcasts) — snapshot content is
    unchanged by the fold, the manifest ends with one schema group, and a
    pre-compact version still time-travels with the old NULL-fill."""
    tbl = TranscriptTable(spark, f"{tmpdir_path}/tbl", n_buckets=4, schema=V1_TARGET)
    app = ChangeApplier(tbl)

    v1 = generate_changelog(spark, 800, n_convs=30, seed=41, schema_v2_from=1.1).drop("tool")
    app.apply_batch(v1, epoch_id=0)
    v2 = generate_changelog(spark, 1600, n_convs=30, seed=41).where("lsn > 830")
    app.apply_batch(v2, epoch_id=1)
    assert "tool" in [f.name for f in tbl.schema.fields]

    pre_version = tbl.manifest()["version"]
    pre = {tuple(r) for r in tbl.snapshot().collect()}
    pre_sids = {int(f["schema_id"]) for f in tbl.manifest()["files"]}
    assert len(pre_sids) > 1, "fixture must actually span schema groups"

    tbl.compact()
    post = {tuple(r) for r in tbl.snapshot().collect()}
    assert post == pre, "compaction must not change visible state"
    cur_sid = int(tbl.manifest()["current_schema_id"])
    post_sids = {int(f["schema_id"]) for f in tbl.manifest()["files"]}
    assert post_sids == {cur_sid}, "fold must rewrite old groups to the current schema"
    # the retained pre-compact version still reads with its own group layout
    assert {tuple(r) for r in tbl.snapshot(version=pre_version).collect()} == pre
