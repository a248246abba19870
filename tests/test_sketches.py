"""Mergeable HLL sketch gates: stored per-day sketches must union to an
estimate within HLL error of the true distinct count, for the full range
and for arbitrary sub-windows — the property that makes per-day sketch
state a valid substitute for rescanning raw events."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.operators import sketches
from wnba_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_ORACLE

TOL = 0.05  # lg_k=14 gives ~0.8% rsd; 5% is a >5-sigma bound


def test_unioned_sketches_match_exact_distinct(spark):
    daily = sketches.daily_user_sketches(spark, SF_ORACLE).cache()
    est = sketches.distinct_users_over(daily).collect()[0]["distinct_users_est"]
    ev = load_table(spark, SF_ORACLE, "events")
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) / exact < TOL, (est, exact)
    daily.unpersist()


def test_sub_window_union_matches_exact(spark):
    # the point of mergeable state: ANY day subset answers from sketches
    daily = sketches.daily_user_sketches(spark, SF_ORACLE).cache()
    days = sorted(r["day"] for r in daily.select("day").collect())
    cut = days[len(days) // 2]
    window = daily.filter(F.col("day") >= cut)
    est = sketches.distinct_users_over(window).collect()[0]["distinct_users_est"]
    ev = load_table(spark, SF_ORACLE, "events")
    exact = (
        ev.filter(F.col("ts").cast("date") >= F.lit(cut))
        .select("user_id")
        .distinct()
        .count()
    )
    assert exact > 0
    assert abs(est - exact) / exact < TOL, (est, exact, cut)
    daily.unpersist()
