"""Backend-parametrized table-contract tests (SURVEY.md §7: "Iceberg if the
jar can be fetched, else mini-lake").

The same contract assertions run against every backend the environment
provides: the mini-lake always (in-process); Iceberg when the spark-runtime
artifact is resolvable (`iceberg_artifact_available`), in a SUBPROCESS —
spark.jars.packages must be set before the JVM starts, so the shared test
session can't host it.  Offline sandboxes skip the Iceberg leg cleanly.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

from go_data_publisher_spark.lake.iceberg import iceberg_artifact_available

CONTRACT = """
Contract exercised per backend:
 1. merge commits a batch; snapshot shows last-wins state
 2. replaying the same epoch is a no-op (skipped or idempotent-in-effect)
 3. a stale (lower-LSN) change loses to the stored row
 4. a delete removes the row and survives replay of an older update
 5. schema evolution adds a column without rewriting old rows
 6. a redelivered lower-LSN upsert under a FRESH epoch does not resurrect
    a deleted key (tombstone retention)
 7. an out-of-order epoch arrival does not mark the skipped epochs
    committed (hwm + recent-set fold, not hwm-only)
 8. a batch column narrower than the table's is a no-op, not a narrowing
    ALTER
"""


def _contract_minilake(spark, root):
    from pyspark.sql import functions as F

    from go_data_publisher_spark.lake.table import TranscriptTable

    SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp, schema_version int")
    tbl = TranscriptTable(spark, root, n_buckets=4)
    r = tbl.merge(spark.createDataFrame(
        [(10, "I", "c1", 0, "user", "v1", None, None, 1),
         (11, "U", "c1", 0, "user", "v2", None, None, 1)], SCHEMA), epoch_id=0)
    assert r["status"] == "committed"
    assert [x["text"] for x in tbl.snapshot().collect()] == ["v2"]          # 1
    assert tbl.merge(spark.createDataFrame(
        [(11, "U", "c1", 0, "user", "v2", None, None, 1)], SCHEMA),
        epoch_id=0)["status"] == "skipped_replay"                            # 2
    tbl.merge(spark.createDataFrame(
        [(5, "U", "c1", 0, "user", "stale", None, None, 1)], SCHEMA), epoch_id=1)
    assert [x["text"] for x in tbl.snapshot().collect()] == ["v2"]          # 3
    tbl.merge(spark.createDataFrame(
        [(20, "D", "c1", 0, "user", None, None, None, 1)], SCHEMA), epoch_id=2)
    assert tbl.snapshot().count() == 0                                      # 4
    evolved = spark.createDataFrame(
        [(30, "I", "c2", 0, "user", "v3", None, None, 1, "extra")],
        SCHEMA + ", note string")
    tbl.evolve_schema(evolved.drop("op").schema)
    tbl.merge(evolved, epoch_id=3)
    row = tbl.snapshot().where(F.col("conv_id") == "c2").first()
    assert row["note"] == "extra"                                           # 5
    # 6: redelivered lower-LSN upsert under a FRESH epoch after the delete
    tbl.merge(spark.createDataFrame(
        [(11, "U", "c1", 0, "user", "v2", None, None, 1)], SCHEMA), epoch_id=4)
    assert tbl.snapshot().where(F.col("conv_id") == "c1").count() == 0
    # 7: out-of-order epoch arrival — 6 commits before 5; 5 must still apply
    tbl.merge(spark.createDataFrame(
        [(40, "I", "c3", 0, "user", "late-epoch", None, None, 1)], SCHEMA),
        epoch_id=6)
    assert not tbl.is_epoch_committed(5)
    r5 = tbl.merge(spark.createDataFrame(
        [(41, "I", "c4", 0, "user", "filled-gap", None, None, 1)], SCHEMA),
        epoch_id=5)
    assert r5["status"] == "committed"
    assert tbl.snapshot().where("conv_id in ('c3','c4')").count() == 2
    assert tbl.is_epoch_committed(5) and tbl.is_epoch_committed(6)
    # 8: a narrower batch column (int vs long lsn) is a no-op
    import pyspark.sql.types as T
    narrow = T.StructType([T.StructField("lsn", T.IntegerType(), True)])
    assert tbl.evolve_schema(narrow) is False
    assert dict((f.name, f.dataType) for f in tbl.schema.fields)["lsn"] == T.LongType()


def test_contract_minilake(spark, tmpdir_path):
    _contract_minilake(spark, f"{tmpdir_path}/tbl")


_ICEBERG_SELFTEST = textwrap.dedent("""
    import json, sys
    from go_data_publisher_spark.lake.iceberg import IcebergTable, iceberg_session

    warehouse = sys.argv[1]
    spark = iceberg_session(warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
    SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp, schema_version int")
    tbl = IcebergTable(spark, "transcripts", n_buckets=4)
    r = tbl.merge(spark.createDataFrame(
        [(10, "I", "c1", 0, "user", "v1", None, None, 1),
         (11, "U", "c1", 0, "user", "v2", None, None, 1)], SCHEMA), epoch_id=0)
    assert r["status"] == "committed"
    assert [x["text"] for x in tbl.snapshot().collect()] == ["v2"]
    assert tbl.merge(spark.createDataFrame(
        [(11, "U", "c1", 0, "user", "v2", None, None, 1)], SCHEMA),
        epoch_id=0)["status"] == "skipped_replay"
    tbl.merge(spark.createDataFrame(
        [(5, "U", "c1", 0, "user", "stale", None, None, 1)], SCHEMA), epoch_id=1)
    assert [x["text"] for x in tbl.snapshot().collect()] == ["v2"]
    tbl.merge(spark.createDataFrame(
        [(20, "D", "c1", 0, "user", None, None, None, 1)], SCHEMA), epoch_id=2)
    assert tbl.snapshot().count() == 0
    evolved = spark.createDataFrame(
        [(30, "I", "c2", 0, "user", "v3", None, None, 1, "extra")],
        SCHEMA + ", note string")
    tbl.evolve_schema(evolved.drop("op").schema)
    tbl.merge(evolved, epoch_id=3)
    assert tbl.snapshot().where("conv_id = 'c2'").first()["note"] == "extra"
    # 6: tombstone retention — redelivered lower-LSN upsert, fresh epoch
    tbl.merge(spark.createDataFrame(
        [(11, "U", "c1", 0, "user", "v2", None, None, 1)], SCHEMA), epoch_id=4)
    assert tbl.snapshot().where("conv_id = 'c1'").count() == 0
    # 7: out-of-order epochs — 6 before 5; 5 must still apply
    tbl.merge(spark.createDataFrame(
        [(40, "I", "c3", 0, "user", "late-epoch", None, None, 1)], SCHEMA),
        epoch_id=6)
    assert not tbl.is_epoch_committed(5)
    assert tbl.merge(spark.createDataFrame(
        [(41, "I", "c4", 0, "user", "filled-gap", None, None, 1)], SCHEMA),
        epoch_id=5)["status"] == "committed"
    assert tbl.snapshot().where("conv_id in ('c3','c4')").count() == 2
    assert tbl.is_epoch_committed(5) and tbl.is_epoch_committed(6)
    # 8: narrower batch column is a no-op, not a narrowing ALTER
    import pyspark.sql.types as T
    assert tbl.evolve_schema(
        T.StructType([T.StructField("lsn", T.IntegerType(), True)])) is False
    print(json.dumps({"ok": True}))
""")


@pytest.mark.skipif(
    not iceberg_artifact_available(),
    reason="Iceberg spark-runtime artifact unreachable (offline, no ivy cache)",
)
def test_contract_iceberg(tmpdir_path):
    """Same contract against a real Iceberg hadoop-catalog warehouse.
    Subprocess: the runtime jar must be on the classpath at JVM launch."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _ICEBERG_SELFTEST, f"{tmpdir_path}/warehouse"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, f"stderr tail: {out.stderr[-2000:]}"
    assert json.loads(out.stdout.strip().splitlines()[-1])["ok"] is True
