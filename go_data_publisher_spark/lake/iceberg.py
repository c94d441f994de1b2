"""Iceberg backend of the table contract (SURVEY.md §7's declared
production path for the metadata plane at 100×).

The mini-lake (`table.py`) reproduces the properties the engine needs with
a local JSON manifest log; Iceberg provides the same properties with a real
catalog: per-snapshot manifest deltas + a manifest list (the O(batch)
commit-metadata shape `table.py` now mirrors), atomic compare-and-swap
commits through the catalog (replacing the flock critical section, and
valid across hosts/object stores), schema-id-per-data-file evolution, and
merge-on-read row-level deletes.

This environment has no network and no cached runtime jar, so the backend
is gated: `iceberg_artifact_available()` detects — quickly, without letting
Ivy hang on a dead resolver — whether the spark-runtime artifact can load,
and the contract tests in tests/test_iceberg_backend.py skip cleanly when
it can't.  On a networked cluster the same tests run against a real Iceberg
warehouse.

Reference parity: the MERGE INTO below is the same widen-or-ignore upsert
(D1/D5, tick-intervals-consumer/consume/intervals_processor.go:124-149)
the mini-lake's snapshot fold implements; idempotence under redelivery is
carried by the LSN guard itself (re-applying any previously-applied batch
is a no-op in effect), with the epoch high-watermark as a fast-path skip.
"""

from __future__ import annotations

import os

# Spark 4.x runtime artifact (scala 2.13).  Version pinned to the newest
# release line that supports Spark 4 at time of writing; override via env
# for newer clusters.
ICEBERG_PACKAGE = os.environ.get(
    "SPARK_GRAFT_ICEBERG_PACKAGE",
    "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0",
)
_MAVEN_HOSTS = ("repo1.maven.org", "repo.maven.apache.org")


def _ivy_cached() -> bool:
    """A previously-resolved runtime jar in the local ivy/maven caches lets
    the backend work offline."""
    import glob

    home = os.path.expanduser("~")
    pats = (
        f"{home}/.ivy2/jars/*iceberg-spark-runtime*.jar",
        f"{home}/.ivy2/cache/org.apache.iceberg/*/jars/*.jar",
        f"{home}/.m2/repository/org/apache/iceberg/**/*.jar",
    )
    return any(glob.glob(p, recursive=True) for p in pats)


def iceberg_artifact_available(timeout: float = 4.0) -> bool:
    """True when the Iceberg spark-runtime artifact can be loaded: either a
    local ivy/maven cache hit, or a resolver host is reachable.  A socket
    probe, not an Ivy resolution — Ivy retries unreachable resolvers for
    minutes, which would stall every offline test session."""
    if _ivy_cached():
        return True
    import socket

    for host in _MAVEN_HOSTS:
        try:
            socket.create_connection((host, 443), timeout=timeout).close()
            return True
        except OSError:
            continue
    return False


def iceberg_session(warehouse: str, app_name: str = "cdc-iceberg",
                    cores: str = "4", shuffle_partitions: int = 8):
    """A SparkSession wired for a local hadoop-catalog Iceberg warehouse.

    Must be the FIRST session in the JVM (spark.jars.packages is resolved at
    JVM launch) — the contract tests therefore run this in a subprocess, not
    against the shared test session.
    """
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]").appName(app_name)
        .config("spark.jars.packages", ICEBERG_PACKAGE)
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


class IcebergTable:
    """The table contract over an Iceberg table — the `TranscriptTable`
    surface `ChangeApplier` uses (merge / snapshot / schema / epoch guard /
    cursor), backed by catalog commits instead of the JSON manifest log.

    Physical strategy mirrors the mini-lake: the table is PARTITIONED BY
    bucket(n, key0) (co-locating each key's rows for the MERGE), writes are
    merge-on-read (`write.merge.mode=merge-on-read` → positional delete
    files, commit cost O(batch)), and the MERGE conditions encode the
    LSN-guarded widen-or-ignore upsert.
    """

    def __init__(self, spark, name: str, n_buckets: int = 16,
                 key=("conv_id", "turn_idx"), order_col: str = "lsn",
                 schema_ddl: str | None = None):
        from .. import schemas

        self.spark = spark
        self.name = f"lake.db.{name}"
        self.key = list(key)
        self.order_col = order_col
        ddl = schema_ddl or ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schemas.TRANSCRIPT_SCHEMA
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.name} ({ddl}) USING iceberg "
            f"PARTITIONED BY (bucket({n_buckets}, {self.key[0]})) "
            f"TBLPROPERTIES ("
            f"  'write.merge.mode'='merge-on-read',"
            f"  'write.update.mode'='merge-on-read',"
            f"  'write.delete.mode'='merge-on-read',"
            f"  'format-version'='2',"
            f"  'cdc.epoch.hwm'='-1',"
            f"  'cdc.cursor.lsn'='-1')"
        )

    # -- epoch guard (fast-path skip; correctness rides the LSN guard) ------

    def _prop(self, key: str) -> str | None:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self.name}").collect()
        for r in rows:
            if r["key"] == key:
                return r["value"]
        return None

    def is_epoch_committed(self, epoch_id: int, writer_id: str = "default") -> bool:
        prop = f"cdc.epoch.hwm.{writer_id}" if writer_id != "default" else "cdc.epoch.hwm"
        v = self._prop(prop)
        return v is not None and int(epoch_id) <= int(v)

    def cursor_lsn(self) -> int:
        return int(self._prop("cdc.cursor.lsn") or -1)

    @property
    def schema(self):
        return self.spark.table(self.name).schema

    def evolve_schema(self, batch_schema) -> bool:
        """ALTER TABLE ADD COLUMNS / ALTER COLUMN TYPE — Iceberg enforces the
        same value-preserving promotion rules the mini-lake implements."""
        cur = {f.name: f for f in self.schema.fields}
        changed = False
        for f in batch_schema.fields:
            if f.name not in cur:
                self.spark.sql(
                    f"ALTER TABLE {self.name} ADD COLUMN "
                    f"{f.name} {f.dataType.simpleString()}"
                )
                changed = True
            elif cur[f.name].dataType != f.dataType:
                self.spark.sql(
                    f"ALTER TABLE {self.name} ALTER COLUMN {f.name} "
                    f"TYPE {f.dataType.simpleString()}"
                )
                changed = True
        return changed

    # -- MERGE --------------------------------------------------------------

    def merge(self, changes, epoch_id: int, batch_max_lsn: int | None = None,
              deduped: bool = False, writer_id: str = "default",
              write_parallelism: int | None = None) -> dict:
        """The D1/D5 upsert as native MERGE INTO (the SQL the mini-lake's
        docstring quotes, executed by Iceberg's merge-on-read writer)."""
        if self.is_epoch_committed(epoch_id, writer_id):
            return {"status": "skipped_replay", "epoch_id": epoch_id}
        if not deduped:
            from ..operators.dedup import last_wins

            changes = last_wins(changes, key=self.key, order=(self.order_col,))
        changes.createOrReplaceTempView("__cdc_batch")
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.key)
        cols = [f.name for f in self.schema.fields]
        src_cols = set(changes.columns)
        ins_cols = [c for c in cols if c in src_cols]
        self.spark.sql(
            f"MERGE INTO {self.name} t USING __cdc_batch s ON {on} "
            f"WHEN MATCHED AND s.{self.order_col} >= t.{self.order_col} "
            f"  AND s.op = 'D' THEN DELETE "
            f"WHEN MATCHED AND s.{self.order_col} >= t.{self.order_col} "
            f"  THEN UPDATE SET "
            + ", ".join(f"t.{c} = s.{c}" for c in ins_cols)
            + f" WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT ({', '.join(ins_cols)}) "
            f"VALUES ({', '.join('s.' + c for c in ins_cols)})"
        )
        if batch_max_lsn is None:
            row = changes.selectExpr(f"max({self.order_col}) m").first()
            batch_max_lsn = row["m"]
        prop = f"cdc.epoch.hwm.{writer_id}" if writer_id != "default" else "cdc.epoch.hwm"
        cursor = max(self.cursor_lsn(),
                     int(batch_max_lsn) if batch_max_lsn is not None else -1)
        # property update is a separate catalog commit (not atomic with the
        # MERGE) — safe because replaying the MERGE is a no-op in effect
        # under the LSN guard; the property is only the fast-path skip
        self.spark.sql(
            f"ALTER TABLE {self.name} SET TBLPROPERTIES "
            f"('{prop}'='{int(epoch_id)}', 'cdc.cursor.lsn'='{cursor}')"
        )
        return {"status": "committed", "epoch_id": epoch_id}

    def snapshot(self, version: int | None = None):
        if version is not None:
            return self.spark.read.option("snapshot-id", version).table(self.name)
        return self.spark.table(self.name)

    def history(self):
        return [
            {"version": r["snapshot_id"], "committed_at": r["committed_at"]}
            for r in self.spark.sql(f"SELECT * FROM {self.name}.snapshots").collect()
        ]

    def compact(self, **_kw):
        self.spark.sql(
            f"CALL lake.system.rewrite_data_files(table => '{self.name}')"
        )

    def vacuum(self, **_kw):
        self.spark.sql(
            f"CALL lake.system.expire_snapshots(table => '{self.name}')"
        )
