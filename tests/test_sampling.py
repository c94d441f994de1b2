"""Deterministic sampling / quota operators: stability, composition, caps."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from go_data_publisher_spark.operators.sampling import (
    deterministic_sample,
    quota_per_group,
)


def _py_keep(key, fraction, salt=""):
    h = hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8]
    return h < format(int(fraction * (1 << 32)), "08x")


def test_sample_matches_python_hash(spark):
    df = spark.range(2000).select(F.col("id"))
    got = sorted(r.id for r in deterministic_sample(df, 0.3, "id").collect())
    want = sorted(i for i in range(2000) if _py_keep(i, 0.3))
    assert got == want
    # roughly the asked fraction
    assert 0.25 < len(got) / 2000 < 0.35


def test_sample_is_stable_under_repartition(spark):
    df = spark.range(1000)
    a = set(r.id for r in deterministic_sample(df, 0.5, "id").collect())
    b = set(
        r.id for r in deterministic_sample(df.repartition(13), 0.5, "id").collect()
    )
    assert a == b


def test_sample_composes(spark):
    df = spark.range(5000)
    nested = deterministic_sample(deterministic_sample(df, 0.5, "id"), 0.2, "id")
    direct = deterministic_sample(df, 0.2, "id")
    assert set(r.id for r in nested.collect()) == set(
        r.id for r in direct.collect()
    )


def test_sample_null_keys_face_the_same_threshold(spark):
    """NULL keys hash the sentinel and obey the fraction like any other key
    (the round-4 coalesce-to-'' form kept 100% of null-keyed rows in a 1%
    sample).  All nulls share one hash, so per (fraction, salt) they are an
    all-or-nothing block whose membership matches the python-side md5."""
    from go_data_publisher_spark.operators.sampling import NULL_KEY_SENTINEL

    rows = [(str(i),) for i in range(200)] + [(None,)] * 50
    df = spark.createDataFrame(rows, "k string")
    for fraction, salt in ((0.01, ""), (0.5, ""), (0.5, "a"), (0.5, "b")):
        kept_nulls = deterministic_sample(df, fraction, "k", salt=salt) \
            .where("k IS NULL").count()
        want = 50 if _py_keep(NULL_KEY_SENTINEL, fraction, salt) else 0
        assert kept_nulls == want, (fraction, salt)
    # the sentinel's md5 starts 'acc8...' > 1% threshold: a 1% sample must
    # NOT contain every null-keyed row (the exact regression ADVICE flagged)
    assert deterministic_sample(df, 0.01, "k").where("k IS NULL").count() == 0


def test_salt_decorrelates(spark):
    df = spark.range(4000)
    a = set(r.id for r in deterministic_sample(df, 0.5, "id", salt="a").collect())
    b = set(r.id for r in deterministic_sample(df, 0.5, "id", salt="b").collect())
    overlap = len(a & b) / max(1, min(len(a), len(b)))
    assert 0.3 < overlap < 0.7  # independent halves overlap ~50%


def test_quota_per_group(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(100)], "id long, grp string"
    )
    out = quota_per_group(df, "grp", quota=5, key_col="id")
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    # winners are the 5 smallest md5 hashes per group — stable across runs
    again = quota_per_group(df.repartition(7), "grp", quota=5, key_col="id")
    assert set(map(tuple, out.collect())) == set(map(tuple, again.collect()))


def test_quota_smaller_groups_untouched(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, grp string")
    out = quota_per_group(df, "grp", quota=10, key_col="id")
    assert out.count() == 3


def test_sample_fraction_edges(spark):
    # fraction=1.0 used to render a 9-char threshold ("100000000") that broke
    # the 8-char lexicographic comparison and kept only ~6% of rows
    df = spark.range(500)
    assert deterministic_sample(df, 1.0, "id").count() == 500
    assert deterministic_sample(df, 0.0, "id").count() == 0


def _naive_quota(spark, df, group, quota, key):
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(F.md5(F.col(key).cast("string")))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= quota).drop("__rn"))


def test_quota_two_phase_equals_naive_window(spark):
    """The histogram+boundary selection must pick the exact same row set as
    ranking the whole group (the round-2 implementation), across skewed
    group sizes and quota edge cases."""
    rows = [(i, "big") for i in range(3000)] + \
           [(10_000 + i, "mid") for i in range(40)] + [(99_999, "one")]
    df = spark.createDataFrame(rows, "id long, grp string")
    for quota in (0, 1, 7, 40, 5000):
        got = set(map(tuple, quota_per_group(df, "grp", quota, "id").collect()))
        want = set(map(tuple, _naive_quota(spark, df, "grp", quota, "id").collect()))
        assert got == want, f"quota={quota}"


def test_quota_rank_window_is_bucket_partitioned(spark):
    """Scale evidence (r7 single-branch form): the rank window partitions by
    (group, hash-prefix bucket), so its per-task working set is
    ~group_size/16^prefix_len — never the whole group — and whole buckets
    past the quota are filtered out before ranking."""
    import re

    from go_data_publisher_spark.operators.sampling import _quota_split

    df = spark.createDataFrame([(i, "en") for i in range(20_000)],
                               "id long, grp string")
    kept = _quota_split(df, ["grp"], 50, "id", "", 2)
    assert kept.count() == 50
    # the window spec must include the prefix bucket in its partition keys
    opt = kept._jdf.queryExecution().optimizedPlan().toString()
    m = re.search(r"row_number\(\) windowspecdefinition\((.*?)__qh", opt)
    assert m is not None and "__qpfx" in m.group(1), opt
    # no prefix bucket is close to the group size, so no task ranks a group
    n_biggest = df.withColumn("__qh", F.md5(F.col("id").cast("string"))) \
        .withColumn("__qpfx", F.substring("__qh", 1, 2)) \
        .groupBy("__qpfx").count().agg(F.max("count")).first()[0]
    assert n_biggest < 20_000 / 64
    # and the composed result is still exactly the quota
    out = quota_per_group(df, "grp", 50, "id", prefix_len=2)
    assert out.count() == 50


def test_quota_keeps_null_keys_and_null_groups(spark):
    """Parity with the single-window form on nullable data: NULL keys hash
    first (the window's nulls-first order) and a NULL group is its own
    capped group — neither is silently dropped by the two-phase join."""
    rows = ([(None, "en")] * 3                     # null keys in a real group
            + [(f"d{i}", "en") for i in range(50)]
            + [(f"n{i}", None) for i in range(40)]  # a null group
            + [(None, None)] * 2)
    df = spark.createDataFrame(rows, "doc_id string, lang string")

    out = quota_per_group(df, "lang", quota=10, key_col="doc_id")
    by_group = {r["lang"]: r["n"] for r in
                out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_group == {"en": 10, None: 10}
    # null keys sort first (hash '' < any hex), so they occupy top slots —
    # exactly the old window's nulls-first behavior
    assert out.where("lang = 'en' AND doc_id IS NULL").count() == 3
    assert out.where("lang IS NULL AND doc_id IS NULL").count() == 2

    # full-set parity with the naive window on this nullable fixture
    want = set(map(tuple, _naive_quota(spark, df, "lang", 10, "doc_id").collect()))
    got = set(map(tuple, out.collect()))
    # ties among identical null keys are broken arbitrarily in BOTH forms;
    # compare group totals and the non-null winners instead
    assert {t for t in got if t[0] is not None} == {t for t in want if t[0] is not None}
