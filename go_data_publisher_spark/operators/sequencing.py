"""Sequencing / range / watermark operators — SURVEY.md §2.4 (Q1-Q9).

The reference navigates an append-only log by a persisted cursor plus a list
of processed [from,to] intervals per epoch; these are the DataFrame forms of
that vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_range(df: DataFrame, lsn_col: str, cursor: int, head: int | None = None) -> DataFrame:
    """Q1+Q2: the unprocessed slice (cursor, head] of the log.

    Reference: calculateTickRange skips gaps and clamps to the source
    watermark (transactions-producer/domain/processor.go:194-210,
    tick-data-publisher/sync/tick_data_processor.go:99).  The between-filter
    pushes down to the parquet/lake scan (min/max row-group pruning), so at
    100 TB this reads only the tail files.
    """
    out = df.where(F.col(lsn_col) > cursor)
    if head is not None:
        out = out.where(F.col(lsn_col) <= head)
    return out


def unprocessed_suffix(df: DataFrame, epoch_col: str, cursor_epoch: int) -> DataFrame:
    """Q5/F6: only groups strictly after the cursor (closed epochs only)."""
    return df.where(F.col(epoch_col) > cursor_epoch)


def epoch_for_lsn(events: DataFrame, intervals: DataFrame, lsn_col="lsn",
                  lo_col="from_lsn", hi_col="to_lsn") -> DataFrame:
    """Q3: range-containment lookup of each event's epoch.

    The intervals dimension is tiny (one row per epoch) → broadcast, so the
    range join is a broadcast-nested-loop that never shuffles the event side.
    """
    return events.join(
        F.broadcast(intervals),
        (events[lsn_col] >= intervals[lo_col]) & (events[lsn_col] <= intervals[hi_col]),
        "left",
    )


def verify_monotonic(intervals: DataFrame, seq_col: str, attr_cols=("epoch", "from_lsn")) -> DataFrame:
    """Q6: count rows where the attribute tuple is not strictly ascending in
    ``seq_col`` order (must be 0).

    Reference: tick-intervals-publisher asserts intervals ascending by
    (epoch, from) (processing/tick_interval_processor.go:167-179).  A
    DataFrame has no inherent order, so the position in the original list is
    an explicit sequence column.
    """
    w = Window.orderBy(F.col(seq_col))
    cur = F.struct(*[F.col(c) for c in attr_cols])
    prev = F.lag(cur).over(w)
    df = intervals.select(cur.alias("__cur"), prev.alias("__prev"))
    cond = F.col("__prev").isNotNull() & (F.col("__cur") <= F.col("__prev"))
    return df.agg(
        F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast("long").alias("n_violations")
    )


def detect_gaps(df: DataFrame, key_cols, lsn_col: str, min_gap: int = 1) -> DataFrame:
    """Q7: holes in the sequence space — [prev+1, cur-1] per gap.

    Reference: calculateSkippedTicks (status-service/rpc/status_service.go:
    218-231).  Partitioned window → scales with the number of keys.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(lsn_col))
    prev = F.lag(lsn_col).over(w)
    return (
        df.select(*key_cols, F.col(lsn_col))
        .withColumn("__prev", prev)
        .where(F.col("__prev").isNotNull() & (F.col(lsn_col) - F.col("__prev") > min_gap))
        .select(
            *key_cols,
            (F.col("__prev") + 1).alias("gap_from"),
            (F.col(lsn_col) - 1).alias("gap_to"),
        )
    )


def group_intervals(df: DataFrame, group_cols, lsn_col: str) -> DataFrame:
    """Q9-ish: fold rows into per-group [min,max] interval summaries."""
    return df.groupBy(*group_cols).agg(
        F.min(lsn_col).alias("from_lsn"),
        F.max(lsn_col).alias("to_lsn"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def trim_to_cursor(intervals: DataFrame, cursor: int, lo_col="from_lsn", hi_col="to_lsn") -> DataFrame:
    """Q8: union'd intervals truncated at the live cursor.

    Reference: GetTickIntervals merges stored + live intervals and clamps the
    last one (status-service/rpc/status_service.go:68-116).
    """
    return (
        intervals.where(F.col(lo_col) <= cursor)
        .withColumn(hi_col, F.least(F.col(hi_col), F.lit(cursor)))
    )
