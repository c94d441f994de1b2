"""Event-time windowed aggregation with watermark-bounded late data.

The reference publishes per-interval progress counters keyed by wall ranges
(status-service/metrics/metrics.go gauges; per-epoch processed maps) — the
Structured Streaming form is an event-time tumbling window over the change
stream with a watermark: late events inside the allowed lateness update
their window, events older than the watermark are dropped and the window
state is eventually evicted (bounded state — the requirement for an
unbounded 100 TB stream; without the watermark, window state grows forever).

All aggregates are built-in Catalyst expressions (map-side partial
aggregation applies); the shuffle key is (window, *keys) — time-local, so
state and shuffle volume scale with event-time breadth per trigger, not with
stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    slide_duration: str = "5 minutes",
    watermark_delay: str = "2 minutes",
    keys: tuple[str, ...] = (),
    lsn_col: str = "lsn",
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    duration/slide overlapping windows — the moving-average / rolling-rate
    shape of a progress dashboard (beyond-parity: the reference has no
    event-time windows at all; its per-interval gauges are tumbling-only).

    Same engine mechanics as the tumbling form: `F.window(ts, d, s)` emits
    the overlapping window structs BEFORE the aggregate, so map-side partial
    aggregation and (window, keys)-keyed time-local state apply unchanged —
    state is bounded by the watermark, volume grows only by the d/s overlap
    factor."""
    df = stream_df
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(
            F.window(ts_col, window_duration, slide_duration).alias("__w"),
            *keys,
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(lsn_col).alias("min_lsn"),
            F.max(lsn_col).alias("max_lsn"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *keys,
            "n_events",
            "min_lsn",
            "max_lsn",
        )
    )


def session_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    gap_duration: str = "5 minutes",
    watermark_delay: str = "2 minutes",
    keys: tuple[str, ...] = (),
    lsn_col: str = "lsn",
) -> DataFrame:
    """Session windows: per-key activity bursts closed by ``gap_duration``
    of silence (Spark semantics: a session's end is its last event time +
    gap; a gap of EXACTLY the duration still merges — only a strictly
    larger one opens a new session).  The natural shape for conversation
    activity over the transcript stream — one row per (key, burst).

    `F.session_window` keeps state per OPEN session only; the watermark
    closes and evicts sessions whose gap has passed, so state is bounded by
    concurrent activity, not stream history.  Batch frames compute the same
    result via the unified semantics (what the DuckDB gaps-and-islands
    oracle checks)."""
    df = stream_df
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(
            F.session_window(ts_col, gap_duration).alias("__w"),
            *keys,
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(lsn_col).alias("min_lsn"),
            F.max(lsn_col).alias("max_lsn"),
        )
        .select(
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            *keys,
            "n_events",
            "min_lsn",
            "max_lsn",
        )
    )


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    keys: tuple[str, ...] = (),
    lsn_col: str = "lsn",
) -> DataFrame:
    """Per-window throughput/progress counters over an event-time stream.

    Works on both streaming and batch frames (batch ignores the watermark —
    Spark's unified semantics — which is what the DuckDB oracle checks).
    Output: one row per (window_start, window_end, *keys) with n_events and
    the lsn bounds observed in that window.
    """
    df = stream_df
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("__w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(lsn_col).alias("min_lsn"),
            F.max(lsn_col).alias("max_lsn"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *keys,
            "n_events",
            "min_lsn",
            "max_lsn",
        )
    )
