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


def test_tumbling_daily_approx_shape_error_bound(spark, monkeypatch):
    # SPARK_GRAFT_APPROX_DISTINCT=1 swaps the exact-distinct subtree for a
    # per-group HLL estimate: identical groups and exact columns, n_users
    # within HLL error per group, and the plan carries neither an Expand
    # nor a distinct subtree (the ~8M-tuple shuffle is gone)
    from wnba_data_pipeline_spark.operators import relational

    exact = {
        (r["day"], r["event_type"]): r
        for r in relational.q_tumbling_daily(spark, SF_ORACLE).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_APPROX_DISTINCT", "1")
    approx_df = relational.q_tumbling_daily(spark, SF_ORACLE)
    plan = spark._jvm.PythonSQLUtils.explainString(approx_df._jdf.queryExecution(), "formatted")
    assert "Expand" not in plan, plan
    assert plan.count("HashAggregate") <= 4, plan  # one partial+final pair, no distinct subtree
    approx = {(r["day"], r["event_type"]): r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for key, r in approx.items():
        e = exact[key]
        assert r["n_events"] == e["n_events"]
        assert r["value_sum"] == e["value_sum"]
        assert abs(r["n_users"] - e["n_users"]) <= max(TOL * e["n_users"], 2), (key, r, e)


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
