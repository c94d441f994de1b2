"""Streaming windowed aggregation: watermark drops late data across a
checkpoint restart.

The watermark is persisted in the checkpoint's offset log, so a restarted
query resumes with the previous high-water mark — an event older than it is
dropped before the stateful aggregation (bounded state at stream scale).
"""

from __future__ import annotations

import datetime as dt

from go_data_publisher_spark.streaming.windows import windowed_event_counts

SCHEMA = "ts timestamp, lsn long, grp string"


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run_phase(spark, src, ckpt):
    # foreachBatch sink: supports checkpoint recovery (the memory sink does
    # not) and is the engine's own sink shape; per-trigger update rows are
    # tiny (one per changed window)
    rows = []
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = windowed_event_counts(
        stream, ts_col="ts", window_duration="1 hour",
        watermark_delay="30 minutes", keys=("grp",),
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(lambda df, _eid: rows.extend(df.collect()))
        .option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return rows


def test_late_event_dropped_after_restart(spark, tmpdir_path):
    src = f"{tmpdir_path}/src"
    ckpt = f"{tmpdir_path}/ckpt"
    t = lambda h, m: dt.datetime(2024, 3, 1, h, m)

    # phase 1: windows W10 and W12; watermark advances to 12:10 - 30m = 11:40
    _write(spark, src, [(t(10, 5), 1, "a"), (t(12, 10), 2, "a")])
    out1 = _run_phase(spark, src, ckpt)
    rows1 = {(r.window_start, r.n_events) for r in out1}
    assert (t(10, 0), 1) in rows1 and (t(12, 0), 1) in rows1

    # phase 2: a late event at 10:20 (older than the recovered watermark —
    # must be dropped) and a fresh one at 12:40 (updates W12)
    _write(spark, src, [(t(10, 20), 3, "a"), (t(12, 40), 4, "a")])
    rows2 = _run_phase(spark, src, ckpt)
    assert all(r.window_start != t(10, 0) for r in rows2), \
        "late event must not reopen the 10:00 window"
    w12 = [r for r in rows2 if r.window_start == t(12, 0)]
    assert len(w12) == 1 and w12[0].n_events == 2 and w12[0].max_lsn == 4


def test_sliding_windows_batch_semantics(spark):
    """Each event lands in duration/slide overlapping windows with correct
    bounds (batch form; unified semantics)."""
    from go_data_publisher_spark.streaming.windows import sliding_event_counts

    t = lambda h, m: dt.datetime(2024, 3, 1, h, m)
    df = spark.createDataFrame(
        [(t(10, 5), 1, "a"), (t(10, 35), 2, "a"), (t(11, 5), 3, "a")], SCHEMA)
    out = sliding_event_counts(
        df, ts_col="ts", window_duration="1 hour", slide_duration="30 minutes",
        keys=("grp",),
    ).collect()
    got = {(r.window_start, r.n_events, r.min_lsn, r.max_lsn) for r in out}
    # 10:05 → windows [9:30,10:30) and [10:00,11:00); 10:35 → [10:00,11:00)
    # and [10:30,11:30); 11:05 → [10:30,11:30) and [11:00,12:00)
    assert got == {
        (t(9, 30), 1, 1, 1),
        (t(10, 0), 2, 1, 2),
        (t(10, 30), 2, 2, 3),
        (t(11, 0), 1, 3, 3),
    }


def test_session_windows_batch_semantics(spark):
    """Bursts merge while gaps <= gap_duration (a gap of EXACTLY the
    duration still merges — adjacent [t, t+gap) windows coalesce in Spark);
    only a strictly larger gap starts a new session; session end = last
    event + gap.  The DuckDB oracle's strict `>` encodes the same rule."""
    from go_data_publisher_spark.streaming.windows import session_event_counts

    t = lambda h, m: dt.datetime(2024, 3, 1, h, m)
    df = spark.createDataFrame(
        [
            (t(10, 0), 1, "a"), (t(10, 20), 2, "a"),   # one burst
            (t(11, 20), 3, "a"),     # exactly 1h after #2 → still merges
            (t(12, 21), 4, "a"),     # 1h01m after #3 → NEW session
            (t(10, 0), 5, "b"),
        ],
        SCHEMA,
    )
    out = session_event_counts(
        df, ts_col="ts", gap_duration="1 hour", keys=("grp",)
    ).collect()
    got = {(r.grp, r.session_start, r.session_end, r.n_events) for r in out}
    assert got == {
        ("a", t(10, 0), t(12, 20), 3),   # burst incl. the exactly-gap event
        ("a", t(12, 21), t(13, 21), 1),
        ("b", t(10, 0), t(11, 0), 1),
    }


def test_sliding_stream_drops_late_events(spark, tmpdir_path):
    """Sliding windows under a streaming watermark: a late event below the
    recovered watermark must not reopen its (already-finalized) windows."""
    from go_data_publisher_spark.streaming.windows import sliding_event_counts

    src = f"{tmpdir_path}/ssrc"
    ckpt = f"{tmpdir_path}/sckpt"
    t = lambda h, m: dt.datetime(2024, 3, 1, h, m)

    def phase(rows_out):
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        agg = sliding_event_counts(
            stream, ts_col="ts", window_duration="1 hour",
            slide_duration="30 minutes", watermark_delay="30 minutes",
            keys=("grp",),
        )
        q = (agg.writeStream.outputMode("update")
             .foreachBatch(lambda df, _eid: rows_out.extend(df.collect()))
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    out1 = []
    _write(spark, src, [(t(10, 5), 1, "a"), (t(13, 0), 2, "a")])
    phase(out1)
    assert {r.window_start for r in out1} >= {t(9, 30), t(10, 0)}

    out2 = []
    _write(spark, src, [(t(10, 20), 3, "a"), (t(13, 10), 4, "a")])
    phase(out2)
    assert all(r.window_start > t(10, 30) for r in out2), \
        "late event must not reopen windows below the watermark"


def test_session_stream_closes_on_watermark(spark, tmpdir_path):
    """Streaming session windows: a session is emitted (append mode) once
    the watermark passes its end, and a later event within a NEW burst forms
    a separate session."""
    from go_data_publisher_spark.streaming.windows import session_event_counts

    src = f"{tmpdir_path}/sessrc"
    ckpt = f"{tmpdir_path}/sessckpt"
    t = lambda h, m: dt.datetime(2024, 3, 1, h, m)

    rows = []

    def phase():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        agg = session_event_counts(
            stream, ts_col="ts", gap_duration="30 minutes",
            watermark_delay="10 minutes", keys=("grp",),
        )
        q = (agg.writeStream.outputMode("append")
             .foreachBatch(lambda df, _eid: rows.extend(df.collect()))
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    # burst at 10:00-10:10, then activity far past it advances the watermark
    _write(spark, src, [(t(10, 0), 1, "a"), (t(10, 10), 2, "a")])
    phase()
    _write(spark, src, [(t(12, 0), 3, "a")])
    phase()
    _write(spark, src, [(t(14, 0), 4, "a")])
    phase()

    done = {(r.session_start, r.session_end, r.n_events) for r in rows}
    # the first burst closed (end 10:40) once the watermark passed it
    assert (t(10, 0), t(10, 40), 2) in done
    assert (t(12, 0), t(12, 30), 1) in done
