"""The merge-apply stage: one microbatch of change events → target table.

This is the engine's core pipeline (SURVEY.md §7 step 2), the Spark-first
re-expression of the reference consumer loop
(transactions-consumer/consume/transaction_consumer.go:93-155):

    poll batch → validate/route → dedupe → idempotent keyed upsert →
    commit offsets after the sink write.

Stages (all declarative; one shuffle total — the per-key dedup):
 1. validity guard  → quarantine invalid rows (F4/V4)
 2. schema-evolution diff → widen target before apply (archiverv1/v2 analogue)
 3. last-wins dedup per (conv_id, turn_idx) by (lsn, op-rank)  (D4)
 4. split upserts / deletes, MERGE into bucketed lake table    (D1/D5)
 5. lineage manifest row per touched partition + batch metrics (A5/S8)

Exactly-once: the table's manifest commit records epoch_id; a replayed batch
(same epoch_id) is a no-op.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..lake.table import TranscriptTable, bucket_expr
from ..operators.dedup import last_wins, last_wins_salted
from ..operators.routing import split_valid


class ChangeApplier:
    """Applies deduped change batches into a TranscriptTable."""

    def __init__(
        self,
        table: TranscriptTable,
        quarantine_dir: str | None = None,
        lineage_dir: str | None = None,
        salted: bool = False,
        n_salts: int = 8,
        route_sql: str | None = None,
        ephemeral_table: TranscriptTable | None = None,
    ):
        """``route_sql`` + ``ephemeral_table``: F3 routing — winners matching
        the predicate are merged into a second target instead of the main
        one (the reference's ephemeral-transactions index,
        transactions-consumer/consume/transaction_consumer.go:118-123,
        134-146; both bulk writes commit before the offset commit, which here
        means both tables' manifests record the epoch before foreachBatch
        returns)."""
        self.table = table
        self.quarantine_dir = quarantine_dir
        self.lineage_dir = lineage_dir
        self.salted = salted
        self.n_salts = n_salts
        self.route_sql = route_sql
        self.ephemeral_table = ephemeral_table
        if (route_sql is None) != (ephemeral_table is None):
            raise ValueError("route_sql and ephemeral_table must be set together")

    # -- called by foreachBatch and by the batch driver ----------------------

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> dict:
        spark = batch.sparkSession
        if epoch_id in self.table.committed_epochs():
            # replayed microbatch after crash-before-checkpoint: no-op
            return {"status": "skipped_replay", "epoch_id": epoch_id}

        # NOTE: the batch is deliberately NOT cached — it is re-read twice
        # (stats, dedup input) but the source is columnar (parquet microbatch
        # file or an already-cached upstream), and caching every microbatch
        # churns the block manager / old-gen at high core counts (measured:
        # erratic multi-second stalls at local[32]).
        dedup = None
        try:
            from pyspark.sql import Observation

            from ..operators.routing import validity_predicate

            # Batch-level stats (valid lsn bounds + invalid count) ride the
            # dedup pass as an Observation — zero extra jobs/scans (the
            # reference piggybacks its counters on the consume loop the same
            # way, A5).
            vp = validity_predicate()
            obs = Observation(f"cdc_batch_{epoch_id}")
            observed = batch.observe(
                obs,
                F.sum(F.when(~F.coalesce(vp, F.lit(False)), 1).otherwise(0)).alias("nq"),
                F.min(F.when(vp, F.col("lsn"))).alias("mn"),
                F.max(F.when(vp, F.col("lsn"))).alias("mx"),
            )
            valid, quarantined = split_valid(observed)

            # schema evolution BEFORE apply: v2 events may add columns/widen
            self.table.evolve_schema(valid.drop("op", "schema_version").schema)
            target_schema = self.table.schema

            dedup = last_wins_salted(valid, n_salts=self.n_salts) if self.salted else last_wins(valid)
            dedup = dedup.persist()

            # Job 1: per-bucket lineage aggregate over the winners.  This one
            # action materializes the dedup cache, fires the Observation, and
            # yields both the touched-bucket set and the lineage counters
            # (≤ n_buckets rows to the driver).
            per_bucket = (
                dedup.withColumn("__bucket", bucket_expr(self.table.key[0], self.table.n_buckets))
                .groupBy("__bucket")
                .agg(
                    F.sum(F.when(F.col("op") != "D", 1).otherwise(0)).alias("rows_upserted"),
                    F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("rows_deleted"),
                    F.min("lsn").alias("lsn_from"),
                    F.max("lsn").alias("lsn_to"),
                )
                .collect()
            )
            try:
                stats_row = obs.get
            except Exception:
                # degenerate (e.g. empty) batch: the observed metrics row may
                # be unavailable — fall back to a direct aggregate
                stats_row = batch.agg(
                    F.sum(F.when(~F.coalesce(vp, F.lit(False)), 1).otherwise(0)).alias("nq"),
                    F.min(F.when(vp, F.col("lsn"))).alias("mn"),
                    F.max(F.when(vp, F.col("lsn"))).alias("mx"),
                ).first()
            n_quarantined = int(stats_row["nq"] or 0)
            if n_quarantined and self.quarantine_dir:
                quarantined.write.mode("append").parquet(self.quarantine_dir)

            # project winners into target schema + op (lsn records the applied
            # version; columns missing from an old-schema batch become null)
            cols = []
            for f in target_schema.fields:
                if f.name in dedup.columns:
                    cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
                else:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            changes = dedup.select(*cols, "op")

            # Job 2: the MERGE itself (touched buckets + change count known
            # from the lineage aggregate → strategy picked without extra jobs)
            n_changes = sum(r["rows_upserted"] + r["rows_deleted"] for r in per_bucket)
            if self.route_sql is not None:
                # F3 dual-target routing: split winners by predicate; each
                # target computes its own touched-bucket set
                eph = changes.where(F.expr(self.route_sql))
                perm = changes.where(
                    ~F.coalesce(F.expr(self.route_sql), F.lit(False))
                )
                self.ephemeral_table.merge(
                    eph, epoch_id=epoch_id, batch_max_lsn=stats_row["mx"],
                    n_changes=n_changes,
                )
                stats = self.table.merge(
                    perm, epoch_id=epoch_id, batch_max_lsn=stats_row["mx"],
                    n_changes=n_changes,
                )
            else:
                stats = self.table.merge(
                    changes,
                    epoch_id=epoch_id,
                    batch_max_lsn=stats_row["mx"],
                    touched=[r["__bucket"] for r in per_bucket],
                    n_changes=n_changes,
                )
            if stats["status"] == "committed":
                self._write_lineage(epoch_id, per_bucket, n_quarantined)
            stats["rows_quarantined"] = n_quarantined
            return stats
        finally:
            if dedup is not None:
                dedup.unpersist()

    def _write_lineage(self, epoch_id, per_bucket_rows, n_q):
        """Per-partition lineage manifest rows (FIXTURES.md §3), appended
        driver-side as JSON lines — ≤ n_buckets tiny rows per microbatch, so
        a Spark write job would be pure overhead.  Queryable via
        ``lineage()`` (spark.read.json with the declared schema)."""
        if not self.lineage_dir:
            return
        import json
        import os
        import time

        os.makedirs(self.lineage_dir, exist_ok=True)
        now = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(f"{self.lineage_dir}/epoch-{int(epoch_id):012d}.json", "w") as f:
            for r in per_bucket_rows:
                f.write(
                    json.dumps(
                        {
                            "epoch_id": int(epoch_id),
                            "partition_id": int(r["__bucket"]),
                            "lsn_from": r["lsn_from"],
                            "lsn_to": r["lsn_to"],
                            "rows_upserted": r["rows_upserted"],
                            "rows_deleted": r["rows_deleted"],
                            "rows_quarantined": int(n_q),
                            "committed_at": now,
                        }
                    )
                    + "\n"
                )

    def lineage(self) -> DataFrame:
        return self.table.spark.read.schema(schemas.LINEAGE_SCHEMA).json(self.lineage_dir)


def replay_batch_range(
    applier: ChangeApplier,
    changelog: DataFrame,
    chunk_bounds: list[tuple[int, int]],
    epoch_offset: int = 0,
) -> list[dict]:
    """Batch-mode driver: replay the log one LSN-chunk at a time (the
    reference publisher's chunked processTickRange loop,
    transactions-producer/domain/processor.go:128-155)."""
    out = []
    for i, (lo, hi) in enumerate(chunk_bounds):
        batch = changelog.where(F.col("lsn").between(lo, hi))
        out.append(applier.apply_batch(batch, epoch_id=epoch_offset + i))
    return out
