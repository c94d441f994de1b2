"""Skew-aware joins: salted join equals plain join; hot key spreads."""

from pyspark.sql import functions as F

from go_data_publisher_spark.operators.joins import broadcast_dim_join, salted_join
from go_data_publisher_spark.sources.changelog import generate_changelog


def test_salted_join_equals_plain_join(spark):
    log = generate_changelog(spark, 3000, n_convs=40, seed=53).where("conv_id is not null")
    dim = (
        log.select("conv_id").distinct()
        .withColumn("conv_meta", F.concat(F.lit("meta-"), F.col("conv_id")))
    )
    plain = log.join(dim, "conv_id").groupBy("conv_id").count()
    salted = salted_join(log, dim, "conv_id", n_salts=4).groupBy("conv_id").count()
    a = {(r["conv_id"], r["count"]) for r in plain.collect()}
    b = {(r["conv_id"], r["count"]) for r in salted.collect()}
    assert a == b

    # left join with unmatched keys
    dim_partial = dim.where("conv_id like '%1'")
    pl = log.join(dim_partial, "conv_id", "left").count()
    sl = salted_join(log, dim_partial, "conv_id", n_salts=4, how="left").count()
    assert pl == sl == log.count()


def test_broadcast_dim_join_plan(spark):
    log = generate_changelog(spark, 500, seed=57).where("conv_id is not null")
    # NOTE: a payload-less dim gets the whole join ELIMINATED by Catalyst
    # (left join on a distinct key adding no columns) — dim must carry data
    dim = log.select("conv_id").distinct().withColumn("meta", F.lit("m"))
    out = broadcast_dim_join(log, dim, "conv_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
