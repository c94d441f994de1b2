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
    LSN-guarded widen-or-ignore upsert.  Deletes are TOMBSTONES (a retained
    ``__op='D'`` row), exactly like the mini-lake's fold: a physically
    MERGE-DELETEd row would be resurrected by a redelivered lower-LSN upsert
    under a fresh epoch (NOT MATCHED → INSERT), because no stored row
    remains to win the LSN comparison.  `snapshot()` filters tombstones;
    `expire_tombstones()` drops them below a replay low-watermark.
    """

    def __init__(self, spark, name: str, n_buckets: int = 16,
                 key=("conv_id", "turn_idx"), order_col: str = "lsn",
                 schema_ddl: str | None = None):
        from .. import schemas

        self.spark = spark
        self.name = f"lake.db.{name}"
        self.key = list(key)
        self.order_col = order_col
        # stored (not just baked into the CREATE DDL): the degrade-to-serial
        # write ladder in streaming/apply.py reads it to pick retry widths
        self.n_buckets = n_buckets
        ddl = schema_ddl or ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schemas.TRANSCRIPT_SCHEMA
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.name} ({ddl}, __op string) "
            f"USING iceberg "
            f"PARTITIONED BY (bucket({n_buckets}, {self.key[0]})) "
            f"TBLPROPERTIES ("
            f"  'write.merge.mode'='merge-on-read',"
            f"  'write.update.mode'='merge-on-read',"
            f"  'write.delete.mode'='merge-on-read',"
            f"  'format-version'='2',"
            f"  'cdc.cursor.lsn'='-1')"
        )

    # -- epoch guard: hwm + out-of-order recent set, the mini-lake's exact
    # bounded fold (an hwm-only guard would mark every epoch below an
    # out-of-order arrival committed and silently drop the late ones) ------

    def _prop(self, key: str) -> str | None:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self.name}").collect()
        for r in rows:
            if r["key"] == key:
                return r["value"]
        return None

    def _epoch_props(self, writer_id: str) -> tuple[str, str]:
        sfx = "" if writer_id == "default" else f".{writer_id}"
        return f"cdc.epoch.hwm{sfx}", f"cdc.epoch.recent{sfx}"

    def _epoch_state(self, writer_id: str) -> tuple[int, set]:
        import json as _json

        hwm_p, rec_p = self._epoch_props(writer_id)
        hwm = int(self._prop(hwm_p) or -1)
        recent = set(_json.loads(self._prop(rec_p) or "[]"))
        return hwm, recent

    def is_epoch_committed(self, epoch_id: int, writer_id: str = "default") -> bool:
        hwm, recent = self._epoch_state(writer_id)
        return int(epoch_id) <= hwm or int(epoch_id) in recent

    def cursor_lsn(self) -> int:
        return int(self._prop("cdc.cursor.lsn") or -1)

    @property
    def schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [f for f in self.spark.table(self.name).schema.fields if f.name != "__op"]
        )

    def evolve_schema(self, batch_schema) -> bool:
        """ALTER TABLE ADD COLUMNS / widening ALTER COLUMN TYPE — the same
        value-preserving promotion rules as the mini-lake (`table._widen`):
        a batch column NARROWER than the table's is a no-op (old rows cast
        up at scan time), an incompatible change raises, and key columns
        never change type (Iceberg's bucket transform would re-hash them
        into different partitions)."""
        from .table import _widen

        cur = {f.name: f for f in self.schema.fields}
        changed = False
        for f in batch_schema.fields:
            if f.name not in cur:
                self.spark.sql(
                    f"ALTER TABLE {self.name} ADD COLUMN "
                    f"{f.name} {f.dataType.simpleString()}"
                )
                changed = True
                continue
            w = _widen(cur[f.name].dataType, f.dataType)
            if w is None:
                raise ValueError(
                    f"incompatible schema change for column {f.name}: "
                    f"{cur[f.name].dataType} vs {f.dataType}"
                )
            if w != cur[f.name].dataType:
                if f.name in self.key:
                    raise ValueError(
                        f"type change on key column {f.name} is not allowed"
                    )
                self.spark.sql(
                    f"ALTER TABLE {self.name} ALTER COLUMN {f.name} "
                    f"TYPE {w.simpleString()}"
                )
                changed = True
        return changed

    # -- MERGE --------------------------------------------------------------

    def merge(self, changes, epoch_id: int, batch_max_lsn: int | None = None,
              deduped: bool = False, writer_id: str = "default",
              write_parallelism: int | None = None) -> dict:
        """The D1/D5 upsert as native MERGE INTO (the SQL the mini-lake's
        docstring quotes, executed by Iceberg's merge-on-read writer).

        Deletes become ``__op='D'`` TOMBSTONE rows (UPDATE/INSERT, never
        MERGE DELETE): the stored tombstone's order value keeps beating
        redelivered lower-LSN changes, which is what makes re-applying any
        previously-applied batch a no-op in effect."""
        import json as _json
        import uuid

        if self.is_epoch_committed(epoch_id, writer_id):
            return {"status": "skipped_replay", "epoch_id": epoch_id}
        # fold + gap guard BEFORE the data commit (shared helper with the
        # mini-lake): a permanent epoch gap must fail before paying the
        # MERGE, not after
        from .table import fold_epoch_state

        hwm, recent = fold_epoch_state(
            *self._epoch_state(writer_id), epoch_id, writer_id)
        if not deduped:
            from ..operators.dedup import last_wins

            changes = last_wins(changes, key=self.key, order=(self.order_col,))
        if write_parallelism is not None:
            # degrade-ladder support: narrowing the source frame narrows the
            # merge job's write width (AQE follows the reduced input
            # parallelism) — the Iceberg analogue of the mini-lake's
            # write_parallelism repartition
            changes = changes.repartition(max(1, int(write_parallelism)))
        # unique per-merge view name: a fixed name would let two interleaved
        # merges on one session consume each other's batch
        view = f"__cdc_batch_{uuid.uuid4().hex[:12]}"
        changes.createOrReplaceTempView(view)
        try:
            on = " AND ".join(f"t.{k} = s.{k}" for k in self.key)
            cols = [f.name for f in self.schema.fields]
            src_cols = set(changes.columns)
            ins_cols = [c for c in cols if c in src_cols]
            set_all = ", ".join(f"t.{c} = s.{c}" for c in ins_cols)
            self.spark.sql(
                f"MERGE INTO {self.name} t USING {view} s ON {on} "
                f"WHEN MATCHED AND s.{self.order_col} >= t.{self.order_col} "
                f"  THEN UPDATE SET {set_all}, t.__op = s.op "
                f"WHEN NOT MATCHED THEN "
                f"  INSERT ({', '.join(ins_cols)}, __op) "
                f"  VALUES ({', '.join('s.' + c for c in ins_cols)}, s.op)"
            )
        finally:
            self.spark.catalog.dropTempView(view)
        if batch_max_lsn is None:
            row = changes.selectExpr(f"max({self.order_col}) m").first()
            batch_max_lsn = row["m"]
        cursor = max(self.cursor_lsn(),
                     int(batch_max_lsn) if batch_max_lsn is not None else -1)
        hwm_p, rec_p = self._epoch_props(writer_id)
        # property update is a separate catalog commit (not atomic with the
        # MERGE) — safe because replaying the MERGE is a no-op in effect
        # under the LSN guard; the property is only the fast-path skip.
        # NOTE: this read-modify-write is last-write-wins across CONCURRENT
        # commits under the same writer_id — losing an epoch from the
        # fast-path property only costs a redundant (no-op) re-merge, never
        # correctness; pipelines that need a races-free guard must use one
        # writer per writer_id (the documented contract, as in the mini-lake)
        self.spark.sql(
            f"ALTER TABLE {self.name} SET TBLPROPERTIES "
            f"('{hwm_p}'='{hwm}', '{rec_p}'='{_json.dumps(sorted(recent))}', "
            f"'cdc.cursor.lsn'='{cursor}')"
        )
        return {"status": "committed", "epoch_id": epoch_id}

    def snapshot(self, version: int | None = None):
        df = (self.spark.read.option("snapshot-id", version).table(self.name)
              if version is not None else self.spark.table(self.name))
        # tombstones are storage, not state — same contract as the
        # mini-lake's fold-then-filter
        return df.where("__op IS NULL OR __op <> 'D'").drop("__op")

    def expire_tombstones(self, below: int) -> None:
        """Drop delete tombstones whose order value is below a caller-supplied
        replay low-watermark (mini-lake's compact(drop_tombstones_below))."""
        self.spark.sql(
            f"DELETE FROM {self.name} WHERE __op = 'D' "
            f"AND {self.order_col} < {int(below)}"
        )

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
