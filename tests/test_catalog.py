"""Catalog-veneer tests: the layer warehouse must be reachable through the
Spark catalog (``spark.table``/SQL over db.table — SURVEY §1's mapping of
the reference's DuckDB schema.table namespaces) with partition pruning
intact on the partitioned raw tables."""

from __future__ import annotations

import re

from wnba_data_pipeline_spark.plans import catalog, layers
from wnba_data_pipeline_spark.sources.sinks import read_table

from .conftest import SF_SMOKE


def test_catalog_round_trip_and_pruning(spark, tmp_path):
    base = str(tmp_path / "wh")
    layers.run_all(spark, SF_SMOKE, base)
    registered = catalog.register_catalog(spark, base)
    assert "analytics.supplier_stats" in registered

    # catalog read ≡ path read
    via_catalog = spark.table("analytics.supplier_stats")
    via_path = read_table(spark, layers.layer_tables(base)["analytics.supplier_stats"])
    assert via_catalog.count() == via_path.count() > 0
    assert set(via_catalog.columns) == set(via_path.columns)

    # SQL over the catalog works (the reference's schema.table access path)
    n = spark.sql("SELECT count(*) AS n FROM dashboard.top_suppliers").collect()[0]["n"]
    assert n == 10

    # partition pruning through the CATALOG table, not just the path read:
    # a ship-month predicate must become a PartitionFilter at the scan
    df = spark.table("raw.lineitem_box").filter("ship_ym = '2001-03'")
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ship_ym" in m.group(1), plan
    assert df.count() > 0

    # re-registration is idempotent (IF NOT EXISTS semantics)
    catalog.register_catalog(spark, base)
    assert spark.table("analytics.supplier_stats").count() == via_path.count()


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """The co-located-join contract: two tables bucketed by the join key
    with matching bucket counts must join with ZERO Exchange in the plan —
    the layout that makes a repeated 100 TB join key shuffle-free."""
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    catalog.write_bucketed(
        li, "bucketed.li", bucket_by="l_orderkey", n_buckets=8,
        path=str(tmp_path / "li"), sort_by="l_orderkey",
    )
    catalog.write_bucketed(
        orders, "bucketed.ord", bucket_by="o_orderkey", n_buckets=8,
        path=str(tmp_path / "ord"), sort_by="o_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the merge path
    try:
        a, b = spark.table("bucketed.li"), spark.table("bucketed.ord")
        j = a.join(b, a.l_orderkey == b.o_orderkey).groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q"), F.max("o_totalprice").alias("p")
        )
        plan = spark._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "formatted")
        assert "SortMergeJoin" in plan, plan
        # no shuffle anywhere: join AND the follow-on groupBy ride the
        # bucket partitioning
        import re

        assert not re.search(r"\n\(\d+\) Exchange", plan), plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_layout_queries_same_rows_no_keyed_exchange(spark, tmp_path, monkeypatch):
    """Round-6 verdict item 1: the bucketed layout is a first-class path
    for the repeated-key family. Under SPARK_GRAFT_LAYOUT=bucketed the
    three o_custkey queries must return IDENTICAL rows to the plain scan,
    and the agg/window plans must lose their hashpartitioning Exchange."""
    from wnba_data_pipeline_spark.operators import relational

    from .conftest import SF_ORACLE

    plain = {
        name: relational.QUERIES[name](spark, SF_ORACLE).collect()
        for name in ("topk_revenue", "rank_partition_avg", "join_left_enrich")
    }
    catalog.ensure_bucketed_layout(
        spark, SF_ORACLE, n_buckets=8, base_path=str(tmp_path / "bucketed")
    )
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT", "bucketed")

    def rows_key(rows):
        return sorted(tuple(r) for r in rows)

    for name, before in plain.items():
        df = relational.QUERIES[name](spark, SF_ORACLE)
        assert rows_key(df.collect()) == rows_key(before), name

    # plan shape: the per-customer agg and the per-customer window ride the
    # bucket partitioning — no Exchange hashpartitioning(o_custkey) left
    topk = relational.q_topk_revenue(spark, SF_ORACLE)
    plan = spark._jvm.PythonSQLUtils.explainString(topk._jdf.queryExecution(), "formatted")
    assert "hashpartitioning(o_custkey" not in plan, plan
    rank = relational.q_rank_partition_avg(spark, SF_ORACLE)
    plan = spark._jvm.PythonSQLUtils.explainString(rank._jdf.queryExecution(), "formatted")
    assert "hashpartitioning(o_custkey" not in plan, plan
    assert not re.search(r"\n\(\d+\) Exchange", plan), plan  # window: zero exchanges
    # round 7: co-bucketed enrichment join runs as a bucket-local HASH
    # join (hinted — changes only the per-bucket algorithm), no Exchange
    join = relational.q_join_left_enrich(spark, SF_ORACLE)
    jplan = join._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in jplan, jplan
    assert "Exchange hashpartitioning" not in jplan, jplan

    # without the env the same session keeps reading the plain layout
    monkeypatch.delenv("SPARK_GRAFT_LAYOUT")
    plan = spark._jvm.PythonSQLUtils.explainString(
        relational.q_rank_partition_avg(spark, SF_ORACLE)._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning(o_custkey" in plan, plan


def test_bucketed_lineitem_elides_rolling_exchange_and_sort(spark, tmp_path, monkeypatch):
    """The lineitem bucket spec sorts by the FULL rolling-window ordering
    with one file per bucket, so on the bucketed layout the 60M-row window
    query keeps neither an Exchange nor a Sort — and returns identical
    rows (the layout changes physics, never semantics)."""
    from wnba_data_pipeline_spark.operators import relational

    from .conftest import SF_ORACLE

    def rows_key(df):
        return sorted(tuple(r) for r in df.collect())

    before = rows_key(relational.q_rolling_5_10(spark, SF_ORACLE))
    catalog.ensure_bucketed_layout(
        spark, SF_ORACLE, n_buckets=8, base_path=str(tmp_path / "bucketed_li")
    )
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT", "bucketed")
    df = relational.q_rolling_5_10(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Sort [" not in plan, plan
    assert rows_key(df) == before


def test_bucketed_events_elides_sessionize_exchange(spark, tmp_path, monkeypatch):
    """Events clustered by user: sessionize and agg_multi return identical
    rows on the bucketed layout with their keyed Exchange gone."""
    from wnba_data_pipeline_spark.operators import relational

    from .conftest import SF_ORACLE

    def rows_key(df):
        return sorted(tuple(r) for r in df.collect())

    before_s = rows_key(relational.q_sessionize_events(spark, SF_ORACLE))
    before_a = rows_key(relational.q_agg_multi(spark, SF_ORACLE))
    catalog.ensure_bucketed_layout(
        spark, SF_ORACLE, n_buckets=8, base_path=str(tmp_path / "bucketed_ev")
    )
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT", "bucketed")
    s = relational.q_sessionize_events(spark, SF_ORACLE)
    splan = s._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(user_id" not in splan
    # round 7: the bucketed shape is lag+cumsum over the advertised
    # (user_id, ts) scan order — zero Exchange AND zero Sort
    assert "Exchange hashpartitioning" not in splan, splan
    assert "+- Sort" not in splan, splan
    assert rows_key(s) == before_s
    a = relational.q_agg_multi(spark, SF_ORACLE)
    assert "hashpartitioning(l_suppkey" not in a._jdf.queryExecution().executedPlan().toString()
    assert rows_key(a) == before_a


def test_bucketed_events_makes_exact_tumbling_distinct_local(spark, tmp_path, monkeypatch):
    """With events bucketed by user_id, the exact tumbling shape's distinct
    subtree must not shuffle (day, type, user) tuples: no exchange keyed on
    user_id anywhere in the plan, identical rows."""
    from wnba_data_pipeline_spark.operators import relational

    from .conftest import SF_ORACLE

    monkeypatch.setenv("SPARK_GRAFT_SPLIT_DISTINCT", "1")  # force the split shape at sf0.01
    before = sorted(tuple(r) for r in relational.q_tumbling_daily(spark, SF_ORACLE).collect())
    catalog.ensure_bucketed_layout(
        spark, SF_ORACLE, n_buckets=8, base_path=str(tmp_path / "bucketed_tu")
    )
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT", "bucketed")
    df = relational.q_tumbling_daily(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for seg in plan.split("Exchange hashpartitioning(")[1:]:
        assert not seg.startswith("user_id"), plan
        assert "user_id" not in seg.split(")")[0], plan
    # round 8 fused shape: ONE scan (the split plan's second scan is gone)
    assert plan.count("Scan parquet") == 1, plan
    assert sorted(tuple(r) for r in df.collect()) == before


def test_bucketed_events_elide_temporal_join_exchange_and_sort(spark, tmp_path, monkeypatch):
    """Round 8 (VERDICT r7 item 2): on the user-bucketed, (user_id, ts)-
    sorted events layout the as-of attribution and the trailing-24h range
    aggregate both run with ZERO Exchange and ZERO Sort — the same
    treatment that took sessionize from 2.11x to 1.17x — with rows
    identical to the plain-layout shapes (which the sf0.01 driver oracle
    hash-checks)."""
    from wnba_data_pipeline_spark.operators import temporal

    from .conftest import SF_ORACLE

    def rows_key(df):
        return sorted(tuple(r) for r in df.collect())

    before_a = rows_key(temporal.q_asof_attribution(spark, SF_ORACLE))
    before_r = rows_key(temporal.q_range_join_bins(spark, SF_ORACLE))
    catalog.ensure_bucketed_layout(
        spark, SF_ORACLE, n_buckets=8, base_path=str(tmp_path / "bucketed_tj")
    )
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT", "bucketed")
    for q, before in ((temporal.q_asof_attribution, before_a), (temporal.q_range_join_bins, before_r)):
        df = q(spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "+- Sort" not in plan, plan
        assert rows_key(df) == before


def test_bucketed_layout_null_rows_match_plain_values(spark, tmp_path, monkeypatch):
    """Layout switches must never change VALUES — including on null-bearing
    data the driver's null-free tables cannot exercise (round-8 review):
    the bucketed as-of branch must not match NULL-user/NULL-ts rows the
    generic join filters out, and the fused tumbling shape must not count
    a NULL-user group as a user (count_distinct excludes NULLs)."""
    import datetime as dt

    from wnba_data_pipeline_spark.operators import relational, temporal

    import os

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # normal pair: click then purchase
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + s, 1, "purchase", 2.0, "{}"),
        # NULL-user click and purchase: neither matches anything
        (3, t0, None, "click", 3.0, "{}"),
        (4, t0 + s, None, "purchase", 4.0, "{}"),
        # NULL-ts click must not be visible to user 2's purchase
        (5, None, 2, "click", 5.0, "{}"),
        (6, t0 + s, 2, "purchase", 6.0, "{}"),
        (7, t0, 2, "view", 7.0, "{}"),
    ]
    sf_dir = str(tmp_path / "null_sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ev_stage"))
    part = next(f for f in os.listdir(str(tmp_path / "ev_stage")) if f.endswith(".parquet"))
    os.rename(os.path.join(str(tmp_path / "ev_stage"), part), os.path.join(sf_dir, "events.parquet"))

    def rows_key(df):
        # None-safe sort: the NULL-ts event yields a day=NULL group
        return sorted(
            (tuple(r) for r in df.collect()), key=lambda t: tuple(map(repr, t))
        )

    queries = (temporal.q_asof_attribution, relational.q_tumbling_daily)
    plain = [rows_key(q(spark, sf_dir)) for q in queries]
    # sanity on the plain semantics themselves: one match (user 1), and
    # no (day, type) group counts the NULL user
    assert len(plain[0]) == 1 and plain[0][0][0] == 2  # purchase_id 2
    assert all(r[-1] <= 2 for r in plain[1])  # n_users never counts NULL

    catalog.ensure_bucketed_layout(
        spark, sf_dir, n_buckets=4, base_path=str(tmp_path / "bucketed_null"),
        tables=("events",),
    )
    monkeypatch.setenv("SPARK_GRAFT_LAYOUT", "bucketed")
    for q, before in zip(queries, plain):
        assert rows_key(q(spark, sf_dir)) == before
