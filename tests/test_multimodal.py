"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic stubs."""

from go_data_publisher_spark.functions import multimodal as M


def test_image_features(spark):
    media = M.make_media_fixture(spark, n=32)
    feats = M.extract_image_features(media.where("kind = 'image'"))
    rows = feats.collect()
    assert len(rows) == media.where("kind = 'image'").count()
    for r in rows:
        assert 16 <= r["width"] < 64 and 16 <= r["height"] < 64
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # normalized histogram


def test_image_features_deterministic(spark):
    media = M.make_media_fixture(spark, n=16)
    a = sorted(M.extract_image_features(media).collect())
    b = sorted(M.extract_image_features(media.repartition(7)).collect())
    assert a == b


def test_audio_features(spark):
    media = M.make_media_fixture(spark, n=32)
    feats = M.extract_audio_features(media.where("kind = 'audio'")).collect()
    assert feats and all(r["rms"] > 0 and r["duration_s"] > 0 for r in feats)


def test_video_frame_sampling(spark):
    media = M.make_media_fixture(spark, n=32)
    frames = M.sample_video_frames(media, every_n=10)
    got = frames.groupBy("media_id").count().collect()
    assert got and all(r["count"] >= 1 for r in got)
