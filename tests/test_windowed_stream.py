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
