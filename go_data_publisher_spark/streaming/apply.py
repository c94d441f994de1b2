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
    ):
        self.table = table
        self.quarantine_dir = quarantine_dir
        self.lineage_dir = lineage_dir
        self.salted = salted
        self.n_salts = n_salts

    # -- called by foreachBatch and by the batch driver ----------------------

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> dict:
        spark = batch.sparkSession
        if epoch_id in self.table.committed_epochs():
            # replayed microbatch after crash-before-checkpoint: no-op
            return {"status": "skipped_replay", "epoch_id": epoch_id}

        # The batch is re-read several times (bounds, dedup, merge) — cache it.
        batch = batch.persist()
        dedup = None
        try:
            valid, quarantined = split_valid(batch)
            # One pass for all batch-level stats (valid bounds + invalid count)
            # instead of separate count()/agg() jobs.
            from ..operators.routing import validity_predicate

            vp = validity_predicate()
            stats_row = batch.agg(
                F.sum(F.when(~F.coalesce(vp, F.lit(False)), 1).otherwise(0)).alias("nq"),
                F.min(F.when(vp, F.col("lsn"))).alias("mn"),
                F.max(F.when(vp, F.col("lsn"))).alias("mx"),
            ).first()
            n_quarantined = int(stats_row["nq"] or 0)
            if n_quarantined and self.quarantine_dir:
                quarantined.write.mode("append").parquet(self.quarantine_dir)

            # schema evolution BEFORE apply: v2 events may add columns/widen
            self.table.evolve_schema(valid.drop("op", "schema_version").schema)
            target_schema = self.table.schema

            dedup = last_wins_salted(valid, n_salts=self.n_salts) if self.salted else last_wins(valid)
            dedup = dedup.persist()

            # project winners into target schema + op (lsn records the applied
            # version; columns missing from an old-schema batch become null)
            cols = []
            for f in target_schema.fields:
                if f.name in dedup.columns:
                    cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
                else:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            changes = dedup.select(*cols, "op")

            bounds = stats_row
            stats = self.table.merge(
                changes, epoch_id=epoch_id, batch_max_lsn=bounds["mx"]
            )
            if stats["status"] == "committed":
                self._write_lineage(
                    spark, epoch_id, dedup, bounds, n_quarantined
                )
            stats["rows_quarantined"] = n_quarantined
            return stats
        finally:
            batch.unpersist()
            if dedup is not None:
                dedup.unpersist()

    def _write_lineage(self, spark: SparkSession, epoch_id, dedup, bounds, n_q):
        """Per-partition lineage manifest rows (FIXTURES.md §3)."""
        if not self.lineage_dir:
            return
        per_bucket = (
            dedup.withColumn("__bucket", bucket_expr(self.table.key[0], self.table.n_buckets))
            .groupBy("__bucket")
            .agg(
                F.sum(F.when(F.col("op") != "D", 1).otherwise(0)).alias("rows_upserted"),
                F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("rows_deleted"),
                F.min("lsn").alias("lsn_from"),
                F.max("lsn").alias("lsn_to"),
            )
        )
        rows = per_bucket.select(
            F.lit(int(epoch_id)).cast("long").alias("epoch_id"),
            F.col("__bucket").cast("int").alias("partition_id"),
            F.col("lsn_from").cast("long"),
            F.col("lsn_to").cast("long"),
            F.col("rows_upserted").cast("long"),
            F.col("rows_deleted").cast("long"),
            F.lit(int(n_q)).cast("long").alias("rows_quarantined"),
            F.current_timestamp().alias("committed_at"),
        )
        rows.write.mode("append").parquet(self.lineage_dir)

    def lineage(self) -> DataFrame:
        return self.table.spark.read.schema(schemas.LINEAGE_SCHEMA).parquet(self.lineage_dir)


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
