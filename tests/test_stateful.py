"""Custom stateful streaming operator (applyInPandasWithState):
per-conversation watermark state survives across microbatches."""

from go_data_publisher_spark.sources.changelog import (
    generate_changelog,
    write_changelog_stream_dir,
)
from go_data_publisher_spark.streaming.stateful import track_conversation_watermarks
from go_data_publisher_spark import schemas


def test_watermark_state_across_microbatches(spark, tmpdir_path):
    log = generate_changelog(spark, 900, n_convs=10, seed=61).where(
        "conv_id is not null"
    ).persist()
    src = f"{tmpdir_path}/src"
    write_changelog_stream_dir(log, src, n_chunks=3)

    stream = (
        spark.readStream.schema(schemas.CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = track_conversation_watermarks(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("wm")
        .option("checkpointLocation", f"{tmpdir_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emitted row per conv carries totals accumulated over ALL batches
    rows = spark.sql(
        "SELECT conv_id, max(max_lsn) AS max_lsn, max(n_events) AS n_events FROM wm GROUP BY conv_id"
    ).collect()
    got = {r["conv_id"]: (r["max_lsn"], r["n_events"]) for r in rows}

    expected = {
        r["conv_id"]: (r["mx"], r["cnt"])
        for r in log.groupBy("conv_id")
        .agg({"lsn": "max", "*": "count"})
        .withColumnRenamed("max(lsn)", "mx")
        .withColumnRenamed("count(1)", "cnt")
        .collect()
    }
    assert got == expected
