"""Salted-join equivalence + balance (SURVEY §7.11): same results as the
plain join on a hot-key dataset, with the hot key actually spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.functions.skew import SALT_COL, salted_join, with_salt


def _skewed(spark):
    # 10k rows of one hot key + 100 spread over 10 keys
    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select((F.col("id") % 10 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_join_matches_plain_join(spark):
    fact = _skewed(spark)
    dim = spark.range(12).select((F.col("id") + 1).alias("k"), F.concat(F.lit("dim"), "id").alias("name"))
    plain = fact.join(dim, ["k"]).groupBy("k", "name").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    salted = salted_join(fact, dim, ["k"], 8).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_left_join_nulls_preserved(spark):
    fact = _skewed(spark).filter(F.col("k") <= 5)
    dim = spark.range(2).select((F.col("id") + 4).alias("k"), F.lit("x").alias("name"))  # keys 4, 5 only
    plain = fact.join(dim, ["k"], "left")
    salted = salted_join(fact, dim, ["k"], 4, how="left")
    assert plain.count() == salted.count()
    assert plain.filter("name IS NULL").count() == salted.filter("name IS NULL").count()


def test_salt_spreads_hot_key(spark):
    fact = _skewed(spark)
    dist = (
        with_salt(fact.filter("k = 1"), 8)
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    assert len(dist) == 8  # every salt bucket hit
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)  # roughly uniform
