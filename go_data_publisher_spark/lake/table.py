"""Manifest-committed, hash-bucketed lake table — the MERGE target.

This is the Iceberg-fallback backend from SURVEY.md §7 (no Iceberg runtime jar
ships in this environment).  It reproduces the properties the engine needs
from a lake table, with the same commit discipline the reference gets from
"ES bulk index with deterministic doc IDs, then commit Kafka offsets"
(transactions-consumer/consume/transaction_consumer.go:134-150):

- **atomic snapshot commits**: data files are written first, then a JSON
  manifest naming the complete live-file set is published by an atomic
  rename of the CURRENT pointer.  Readers resolve CURRENT → manifest → files;
  a crash mid-write leaves orphan data files that no manifest references.
- **epoch replay guard (exactly-once-in-effect)**: every manifest records the
  set of committed foreachBatch epoch ids; `merge()` of an already-committed
  epoch is a no-op, so at-least-once redelivery of a microbatch cannot
  double-apply (the reference's idempotent doc-id upsert, D1 in SURVEY §2.3).
- **hash-bucket partitioning + copy-on-write MERGE**: rows live in
  ``n_buckets`` directories by ``pmod(xxhash64(conv_id), n_buckets)``.  A
  merge only rewrites the buckets its batch touches — at 100 TB with, say,
  1024 buckets, a microbatch touching 5% of conversations rewrites ~5% of
  buckets, not the table.  This is Iceberg copy-on-write MERGE with bucket
  partition pruning, expressed directly.
- **schema evolution**: the manifest carries a schema id per file group;
  `evolve_schema()` widens/extends the current schema (new columns, int→long
  etc.) without rewriting old files — readers cast old file groups up to the
  current schema at scan time (exactly Iceberg's schema-id-per-data-file).

Scale notes: the manifest holds file *names* only (O(files), kept in check by
per-bucket compaction on rewrite); all data movement is executor-side.  The
driver only lists/renames manifest JSON — the same metadata-plane work an
Iceberg catalog commit does.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas


def bucket_expr(conv_col: str, n_buckets: int):
    """The table's partition transform: bucket(n, conv_id), Iceberg-style."""
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")


def _widen(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Least common widened type for schema evolution, or None if incompatible."""
    if a == b:
        return a
    numeric_order = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType()]
    if a in numeric_order and b in numeric_order:
        return max(a, b, key=numeric_order.index)
    return None


class TranscriptTable:
    """The partitioned MERGE target with atomic manifest commits."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16,
                 schema: T.StructType | None = None, key=schemas.TRANSCRIPT_KEY,
                 broadcast_merge_max_keys: int = 200_000):
        self.spark = spark
        self.root = root.rstrip("/")
        self.n_buckets = n_buckets
        self.key = list(key)
        self.broadcast_merge_max_keys = broadcast_merge_max_keys
        os.makedirs(f"{self.root}/data", exist_ok=True)
        os.makedirs(f"{self.root}/_manifests", exist_ok=True)
        if self._current_version() is None:
            init_schema = schema or schemas.TRANSCRIPT_SCHEMA
            self._write_manifest(
                version=0,
                manifest={
                    "version": 0,
                    "schemas": {"0": init_schema.json()},
                    "current_schema_id": 0,
                    # file groups: list of {path, bucket, schema_id, rows}
                    "files": [],
                    "committed_epochs": [],
                    "cursor_lsn": -1,
                    "n_buckets": n_buckets,
                },
            )

    # ---------------- manifest plumbing ----------------

    def _current_path(self) -> str:
        return f"{self.root}/_manifests/CURRENT"

    def _current_version(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, version: int) -> str:
        return f"{self.root}/_manifests/manifest-{version:012d}.json"

    def manifest(self, version: int | None = None) -> dict:
        v = self._current_version() if version is None else version
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """All committed snapshot versions (time travel index): one dict per
        manifest with version, committed epochs, cursor.  Iceberg-style
        snapshot log — old manifests are retained, so any past version can
        be read back with ``snapshot(version=...)``."""
        out = []
        for name in sorted(os.listdir(f"{self.root}/_manifests")):
            if name.startswith("manifest-"):
                with open(f"{self.root}/_manifests/{name}") as f:
                    m = json.load(f)
                out.append(
                    {"version": m["version"], "cursor_lsn": m["cursor_lsn"],
                     "n_files": len(m["files"]),
                     "committed_epochs": m["committed_epochs"],
                     "committed_at": m.get("committed_at")}
                )
        return out

    def _write_manifest(self, version: int, manifest: dict) -> None:
        """Write manifest file, then atomically swing the CURRENT pointer."""
        with open(self._manifest_path(version), "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        # atomic publish (the fsync'd cursor write of the reference,
        # status-service/db/store.go:144)
        fd, tmp = tempfile.mkstemp(dir=f"{self.root}/_manifests")
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._current_path())

    # ---------------- schema ----------------

    @property
    def schema(self) -> T.StructType:
        m = self.manifest()
        return T.StructType.fromJson(json.loads(m["schemas"][str(m["current_schema_id"])]))

    def evolve_schema(self, batch_schema: T.StructType) -> bool:
        """Diff batch schema vs table schema; add columns / widen types.

        Returns True if the table schema changed.  Reference analogue: the
        archiverv1/v2 dual wire schemas mapped into one domain schema
        (status-service/main.go:157-163).  Incompatible changes raise.
        """
        cur = self.schema
        cur_by_name = {f.name: f for f in cur.fields}
        out = list(cur.fields)
        changed = False
        for f in batch_schema.fields:
            if f.name not in cur_by_name:
                out.append(T.StructField(f.name, f.dataType, True))
                changed = True
            else:
                w = _widen(cur_by_name[f.name].dataType, f.dataType)
                if w is None:
                    raise ValueError(
                        f"incompatible schema change for column {f.name}: "
                        f"{cur_by_name[f.name].dataType} vs {f.dataType}"
                    )
                if w != cur_by_name[f.name].dataType:
                    i = next(i for i, g in enumerate(out) if g.name == f.name)
                    out[i] = T.StructField(f.name, w, True)
                    changed = True
        if not changed:
            return False
        m = self.manifest()
        new_id = int(m["current_schema_id"]) + 1
        m["schemas"][str(new_id)] = T.StructType(out).json()
        m["current_schema_id"] = new_id
        self._write_manifest(m["version"] + 1, {**m, "version": m["version"] + 1})
        return True

    # ---------------- reads ----------------

    def snapshot(self, buckets: list[int] | None = None,
                 version: int | None = None) -> DataFrame:
        """Committed state (optionally pruned to a bucket subset), at the
        current version or any past one (time travel).

        File groups are read per schema-id and cast up to that version's
        schema — the scan-time cast Iceberg does for old data files.
        """
        m = self.manifest(version)
        target = T.StructType.fromJson(
            json.loads(m["schemas"][str(m["current_schema_id"])])
        )
        files = m["files"]
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]
        if not files:
            return self.spark.createDataFrame([], target)
        by_schema: dict[int, list[str]] = {}
        for f in files:
            by_schema.setdefault(int(f["schema_id"]), []).append(f["path"])
        parts = []
        for sid, paths in by_schema.items():
            df = self.spark.read.parquet(*paths)
            missing = [f for f in target.fields if f.name not in df.columns]
            cols = [F.col(f.name).cast(f.dataType).alias(f.name) for f in target.fields
                    if f.name in df.columns]
            cols += [F.lit(None).cast(f.dataType).alias(f.name) for f in missing]
            parts.append(df.select(*cols).select([f.name for f in target.fields]))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def committed_epochs(self) -> set:
        return set(self.manifest()["committed_epochs"])

    def cursor_lsn(self) -> int:
        return int(self.manifest()["cursor_lsn"])

    # ---------------- MERGE (copy-on-write, bucket-pruned) ----------------

    def merge(
        self,
        changes: DataFrame,
        epoch_id: int,
        batch_max_lsn: int | None = None,
        order_col: str = "lsn",
        touched: list[int] | None = None,
        strategy: str = "auto",
        n_changes: int | None = None,
    ) -> dict:
        """Idempotent, LSN-guarded MERGE of one deduped batch.

        ``changes`` must be unique per key, carry every target column plus an
        ``op`` column (I/U/D), and use ``order_col`` as the per-key version
        authority.  Equivalent SQL (the reference's conditional
        widen-or-ignore upsert, D5 — tick-intervals-consumer/consume/
        intervals_processor.go:124-137 — generalized to LSN monotonicity):

            MERGE INTO target t USING batch s ON t.conv_id = s.conv_id
                                            AND t.turn_idx = s.turn_idx
            WHEN MATCHED AND s.lsn >= t.lsn AND s.op = 'D' THEN DELETE
            WHEN MATCHED AND s.lsn >= t.lsn THEN UPDATE SET *
            WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *

        A stale change (lsn below the row already in the table) is ignored,
        so re-applying any previously-applied batch — even under a fresh
        epoch id — is a no-op.  Deletes are not retained as tombstones: a
        cross-batch regression (delete applied, then a later batch delivers
        an older update for the same key) would resurrect the row; a binlog
        tail applied in offset order cannot produce that sequence.

        Physical strategy — two plans, picked by batch size (the analogue of
        Iceberg's COW merge join strategies):
        - **broadcast** (small batch, the streaming steady state): prune the
          target scan to touched buckets; survivors = broadcast anti-join
          (the big target side never shuffles); contested keys = broadcast
          semi-join pulls ≤|batch| current rows into a small last-wins
          reduce; one big shuffle total (the bucket-write repartition).
        - **shuffle** (large batch / backfill): broadcast-building millions
          of batch keys serializes on the driver, so instead union the
          touched-bucket rows (as op='U' defenders at their own lsn) with the
          batch winners and run one fully-parallel last-wins reduce — every
          stage scales with cores.
        ``strategy``: "broadcast" | "shuffle" | "auto" (by ``n_changes``).
        """
        if epoch_id in self.committed_epochs():
            return {"status": "skipped_replay", "epoch_id": epoch_id}

        m = self.manifest()
        target_schema = self.schema
        cols = [f.name for f in target_schema.fields]

        batch_keys = changes.select(*self.key).distinct()
        if touched is None:
            touched = sorted(
                r["__bucket"]
                for r in batch_keys.select(
                    bucket_expr(self.key[0], self.n_buckets).alias("__bucket")
                ).distinct().collect()
            )
        else:
            touched = sorted(touched)
        if not touched:
            self._commit(m, kept_files=m["files"], new_files=[], epoch_id=epoch_id,
                         batch_max_lsn=batch_max_lsn)
            return {"status": "committed", "epoch_id": epoch_id, "touched_buckets": [],
                    "files_written": 0}

        if strategy == "auto":
            strategy = (
                "broadcast"
                if n_changes is not None and n_changes <= self.broadcast_merge_max_keys
                else "shuffle" if n_changes is not None else "broadcast"
            )

        from ..operators.dedup import last_wins

        current = self.snapshot(buckets=touched)
        if strategy == "broadcast":
            survivors = current.join(F.broadcast(batch_keys), on=self.key, how="left_anti") \
                               .select(*cols)
            contested_cur = (
                current.join(F.broadcast(batch_keys), on=self.key, how="left_semi")
                .select(*cols)
                .withColumn("op", F.lit("U"))  # existing row defends with its own lsn
            )
            fight = changes.select(*cols, "op").unionByName(contested_cur)
            winners = last_wins(fight, key=self.key, order=(order_col,))
            merged = survivors.unionByName(winners.where(F.col("op") != "D").select(*cols))
        else:
            fight = changes.select(*cols, "op").unionByName(
                current.select(*cols).withColumn("op", F.lit("U"))
            )
            winners = last_wins(fight, key=self.key, order=(order_col,))
            merged = winners.where(F.col("op") != "D").select(*cols)
        merged = merged.withColumn("__bucket", bucket_expr(self.key[0], self.n_buckets))

        # Rewrite touched buckets: one output dir per commit, partitioned by
        # bucket, one writer task per touched bucket → exactly one file per
        # bucket per commit (AQE-coalesced writes over-serialize small
        # batches; fixed per-bucket tasks measured fastest at both 8 and 32
        # cores).
        commit_id = uuid.uuid4().hex[:12]
        out_dir = f"{self.root}/data/commit={commit_id}"
        (merged.repartition(max(1, len(touched)), "__bucket")
               .write.mode("overwrite").partitionBy("__bucket").parquet(out_dir))

        # Enumerate written files per bucket (driver-side metadata only).
        new_files = []
        sid = int(m["current_schema_id"])
        for b in touched:
            bdir = f"{out_dir}/__bucket={b}"
            if os.path.isdir(bdir):
                for name in sorted(os.listdir(bdir)):
                    if name.endswith(".parquet"):
                        new_files.append({"path": f"{bdir}/{name}", "bucket": b, "schema_id": sid})

        kept = [f for f in m["files"] if f["bucket"] not in set(touched)]
        self._commit(m, kept_files=kept, new_files=new_files, epoch_id=epoch_id,
                     batch_max_lsn=batch_max_lsn)
        return {
            "status": "committed",
            "epoch_id": epoch_id,
            "touched_buckets": touched,
            "files_written": len(new_files),
        }

    def _commit(self, m: dict, kept_files, new_files, epoch_id, batch_max_lsn) -> None:
        v = m["version"] + 1
        cursor = max(int(m["cursor_lsn"]), int(batch_max_lsn)) if batch_max_lsn is not None \
            else int(m["cursor_lsn"])
        self._write_manifest(v, {
            **m,
            "version": v,
            "files": kept_files + new_files,
            "committed_epochs": sorted(set(m["committed_epochs"]) | {int(epoch_id)}),
            "cursor_lsn": cursor,
            "committed_at": time.time(),
        })

    # ---------------- maintenance ----------------

    def vacuum(self, keep_versions: int = 2) -> dict:
        """Garbage-collect: delete data files not referenced by the newest
        ``keep_versions`` manifests, and drop older manifests (bounding time
        travel).  Crash-safe: files are unlinked only after the surviving
        manifest set is known; a reader of a retained version never loses a
        file.  (Iceberg's expire_snapshots + remove_orphan_files.)"""
        cur = self._current_version()
        versions = sorted(
            int(n.split("-")[1].split(".")[0])
            for n in os.listdir(f"{self.root}/_manifests")
            if n.startswith("manifest-")
        )
        keep = set(v for v in versions if v > cur - keep_versions) | {cur}
        live: set[str] = set()
        for v in keep:
            live |= {f["path"] for f in self.manifest(v)["files"]}
        removed_files = 0
        for dirpath, _dirs, files in os.walk(f"{self.root}/data"):
            for name in files:
                p = f"{dirpath}/{name}"
                if name.endswith(".parquet") and p not in live:
                    os.unlink(p)
                    removed_files += 1
        removed_manifests = 0
        for v in versions:
            if v not in keep:
                os.unlink(self._manifest_path(v))
                removed_manifests += 1
        return {"removed_files": removed_files, "removed_manifests": removed_manifests,
                "kept_versions": sorted(keep)}

    def compact(self) -> None:
        """Rewrite every bucket to one file group at the current schema."""
        df = self.snapshot().withColumn("__bucket", bucket_expr(self.key[0], self.n_buckets))
        m = self.manifest()
        commit_id = uuid.uuid4().hex[:12]
        out_dir = f"{self.root}/data/commit={commit_id}"
        df.repartition(self.n_buckets, "__bucket").write.mode("overwrite") \
          .partitionBy("__bucket").parquet(out_dir)
        new_files = []
        sid = int(m["current_schema_id"])
        for entry in sorted(os.listdir(out_dir)):
            if not entry.startswith("__bucket="):
                continue
            b = int(entry.split("=")[1])
            for name in sorted(os.listdir(f"{out_dir}/{entry}")):
                if name.endswith(".parquet"):
                    new_files.append({"path": f"{out_dir}/{entry}/{name}", "bucket": b, "schema_id": sid})
        self._write_manifest(m["version"] + 1, {**m, "version": m["version"] + 1, "files": new_files})
