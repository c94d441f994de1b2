"""S9 external watermark store: contract parity with the reference's Redis
last-ingested-tick status (status-service/redis/logs.go:41-65)."""

import pytest
from pyspark.sql import functions as F

from go_data_publisher_spark.sources.watermark import (
    ExternalWatermarkStore,
    WatermarkKeyError,
    clamp_to_external_watermark,
    external_count_equality,
)


def test_set_get_roundtrip_and_missing_key(tmpdir_path):
    st = ExternalWatermarkStore(f"{tmpdir_path}/wm")
    st.set_status("logs-status", tick_number=4242, count=100_000)
    assert st.get_status("logs-status") == (4242, 100_000)
    # overwrite is atomic last-wins
    st.set_status("logs-status", tick_number=4300, count=100_500)
    assert st.get_status("logs-status") == (4300, 100_500)
    # missing key errors LOUDLY (redis/logs.go:50), never a zero watermark
    with pytest.raises(WatermarkKeyError, match=r"no data found for key \[nope\]"):
        st.get_status("nope")


def test_clamp_to_external_watermark(spark, tmpdir_path):
    st = ExternalWatermarkStore(f"{tmpdir_path}/wm")
    st.set_status("head", tick_number=600, count=0)
    df = spark.range(1000).select(F.col("id").alias("lsn"))
    got = clamp_to_external_watermark(df, st, "head", cursor=100)
    lo, hi = got.agg(F.min("lsn"), F.max("lsn")).first()
    # (cursor, external tick] — the publisher never runs ahead of the
    # downstream system's ingestion point
    assert (lo, hi) == (101, 600)
    assert got.count() == 500


def test_external_count_equality(spark, tmpdir_path):
    st = ExternalWatermarkStore(f"{tmpdir_path}/wm")
    df = spark.range(1000).select(F.col("id").alias("lsn"))
    st.set_status("v5", tick_number=499, count=500)
    ok = external_count_equality(df, st, "v5")
    assert ok["match"] and ok["our_count"] == 500 == ok["external_count"]
    # divergence is reported, not swallowed
    st.set_status("v5", tick_number=499, count=777)
    bad = external_count_equality(df, st, "v5")
    assert not bad["match"] and bad["external_count"] == 777


def test_key_sanitization_no_traversal(tmpdir_path):
    st = ExternalWatermarkStore(f"{tmpdir_path}/wm")
    st.set_status("../../evil", 1, 1)
    # sanitized into the store root, not written outside it
    import os
    assert not os.path.exists(f"{tmpdir_path}/evil.json")
    assert st.get_status("../../evil") == (1, 1)


def test_distinct_keys_never_alias(tmpdir_path):
    """Injective filename encoding: 'a/b' and 'a_b' are different external
    systems and must keep independent watermarks."""
    st = ExternalWatermarkStore(f"{tmpdir_path}/wm2")
    st.set_status("logs/status", 100, 10)
    st.set_status("logs_status", 200, 20)
    assert st.get_status("logs/status") == (100, 10)
    assert st.get_status("logs_status") == (200, 20)
