"""Layer jobs: the reference's five-DAG medallion pipeline
(raw → analytics → ml_features → dashboard) as composed Spark jobs.

Reference anchors: append raw ingest (``ingest_nba_daily.py:96-148``),
analytics transform (``transform_player_stats.py:175-199``), feature build
(``feature_engineering.py:256-286``), dashboard marts + exports
(``prepare_dashboard_data.py:250-319``). The reference moves eager pandas
frames between Airflow task processes via XCom; here each layer is ONE lazy
plan whose only jobs are the writes, and layers hand off through the
partitioned parquet warehouse exactly like the reference's DuckDB schemas.

Determinism (SURVEY G5): the reference stamps ``pd.Timestamp.now()`` audit
columns and seeds nothing; every layer here takes an injected ``as_of``
timestamp literal so reruns are byte-identical.

Scale posture: raw appends are partitioned by a derived month key, so the
reference's 30-day scan windows (B2) prune partitions instead of scanning
history; analytics aggregates shuffle once on the entity key; dashboard
marts are mart-sized (post-agg) before any global window runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.windows import avg_rank, rolling_avg
from ..sources.sinks import export_json, overwrite_table, read_table, upsert_partitions
from ..sources.tables import load_table

DEFAULT_AS_OF = "2001-09-01 00:00:00"


def _p(base: str, *parts: str) -> str:
    return os.path.join(base, *parts)


def run_raw_layer(spark: SparkSession, sf_dir: str, base: str, as_of: str = DEFAULT_AS_OF) -> None:
    """Append-only raw ingest with audit column (A6 + B8's ``created_at``
    DDL default, ``ingest_nba_daily.py:136``), partitioned by ship month so
    date-window scans prune."""
    li = load_table(spark, sf_dir, "lineitem").withColumns(
        {
            "created_at": F.lit(as_of).cast("timestamp_ntz"),
            "ship_ym": F.date_format(F.col("l_shipdate"), "yyyy-MM"),
        }
    )
    # upsert, not append (round-8 review fix): a re-run of run_all after a
    # mid-pipeline failure must replace the month partitions it carries,
    # not silently double every raw row under the layer's byte-identical-
    # rerun contract — the exact hazard upsert_partitions was written for
    upsert_partitions(li, _p(base, "raw", "lineitem_box"), partition_by=("ship_ym",))
    orders = load_table(spark, sf_dir, "orders").withColumns(
        {
            "created_at": F.lit(as_of).cast("timestamp_ntz"),
            "order_ym": F.date_format(F.col("o_orderdate"), "yyyy-MM"),
        }
    )
    upsert_partitions(orders, _p(base, "raw", "orders_box"), partition_by=("order_ym",))


def run_analytics_layer(spark: SparkSession, base: str, as_of: str = DEFAULT_AS_OF) -> None:
    """raw → analytics: entity aggregates + rolling windows (the
    ``transform_player_stats`` DAG), overwrite sinks (A7)."""
    li = read_table(spark, _p(base, "raw", "lineitem_box"))
    stats = (
        li.groupBy("l_suppkey")
        .agg(
            F.count_distinct("l_orderkey").alias("games"),
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 6).alias("qty_sum"),
            F.round(F.avg("l_quantity"), 6).alias("qty_mean"),
            F.round(F.avg("l_extendedprice"), 6).alias("price_mean"),
            F.round(F.avg("l_discount"), 6).alias("disc_mean"),
        )
        .withColumn("qty_per_game", F.round(F.col("qty_sum") / F.col("games"), 6))
        .withColumn("last_updated", F.lit(as_of).cast("timestamp_ntz"))
    )
    overwrite_table(stats, _p(base, "analytics", "supplier_stats"))

    # l_quantity tie-break: the testdata has duplicate (okey, lineno) pairs,
    # so without it rolling frames are run-order nondeterministic and the
    # "reruns are byte-identical" guarantee above would not hold
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
    rolling = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.round(rolling_avg("l_quantity", w, 5), 6).alias("qty_5"),
        F.round(rolling_avg("l_quantity", w, 10), 6).alias("qty_10"),
    )
    overwrite_table(rolling, _p(base, "analytics", "supplier_rolling"))


def run_features_layer(spark: SparkSession, base: str, as_of: str = DEFAULT_AS_OF) -> None:
    """analytics → ml_features: weighted linear scores (B6) over the stats
    table (the ``feature_engineering`` DAG)."""
    stats = read_table(spark, _p(base, "analytics", "supplier_stats"))
    feats = stats.select(
        "l_suppkey",
        "games",
        "qty_mean",
        "price_mean",
        "disc_mean",
        F.round(F.col("qty_mean") * 0.4 + F.col("games") * 0.3 + (1 - F.col("disc_mean")) * 0.3, 6).alias(
            "efficiency_score"
        ),
        F.round(F.col("qty_per_game") / (F.col("disc_mean") + F.lit(0.01)), 6).alias("usage_efficiency"),
        F.lit(as_of).cast("timestamp_ntz").alias("feature_date"),
    )
    overwrite_table(feats, _p(base, "ml_features", "supplier_features"))


def run_dashboard_layer(spark: SparkSession, base: str, as_of: str = DEFAULT_AS_OF) -> None:
    """analytics + ml_features → dashboard marts + JSON exports (the
    ``prepare_dashboard_data`` DAG): top-10, global avg-ranks over the
    mart (E4 — post-agg, mart-sized), league single-row stats (D6), KPI
    JSON row (A9/H10), per-table JSON export (A8)."""
    stats = read_table(spark, _p(base, "analytics", "supplier_stats"))
    feats = read_table(spark, _p(base, "ml_features", "supplier_features"))

    top = stats.orderBy(F.col("qty_sum").desc(), F.col("l_suppkey")).limit(10)
    overwrite_table(top, _p(base, "dashboard", "top_suppliers"))

    ranked = feats.select(
        "l_suppkey",
        "efficiency_score",
        avg_rank("efficiency_score").cast("double").alias("efficiency_rank"),
    )
    overwrite_table(ranked, _p(base, "dashboard", "supplier_ranks"))

    league = stats.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.avg("qty_mean"), 6).alias("league_qty_mean"),
        F.round(F.avg("price_mean"), 6).alias("league_price_mean"),
    ).withColumn("as_of", F.lit(as_of))
    overwrite_table(league, _p(base, "dashboard", "league_stats"))

    kpi = stats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qty_sum").alias("q"),
        # struct tie-break (round-8 review fix): bare max_by on a tied
        # qty_sum picks a partition-order-dependent leader, breaking the
        # G5 byte-identical-rerun contract; the (qty_sum, -l_suppkey)
        # struct makes ties deterministic (lowest suppkey wins)
        F.max_by(
            "l_suppkey", F.struct(F.col("qty_sum"), (-F.col("l_suppkey")).alias("_nk"))
        ).alias("leader"),
    ).select(
        F.concat(
            F.lit('{"n_suppliers":'),
            F.col("n").cast("string"),
            F.lit(',"total_qty":'),
            F.format_string("%.2f", "q"),
            F.lit(',"leader":'),
            F.col("leader").cast("string"),
            F.lit(',"as_of":"'),
            F.lit(as_of),
            F.lit('"}'),
        ).alias("kpi_data")
    )
    overwrite_table(kpi, _p(base, "dashboard", "kpi_summary"))

    for name in ("top_suppliers", "supplier_ranks", "league_stats", "kpi_summary"):
        export_json(read_table(spark, _p(base, "dashboard", name)), _p(base, "exports", name), single_file=True)


def run_all(spark: SparkSession, sf_dir: str, base: str, as_of: str = DEFAULT_AS_OF) -> None:
    """The full medallion pipeline, one layer at a time through the parquet
    warehouse (the reference's five cron DAGs collapse to this chain)."""
    run_raw_layer(spark, sf_dir, base, as_of)
    run_analytics_layer(spark, base, as_of)
    run_features_layer(spark, base, as_of)
    run_dashboard_layer(spark, base, as_of)


def layer_tables(base: str) -> dict[str, str]:
    return {
        "raw.lineitem_box": _p(base, "raw", "lineitem_box"),
        "raw.orders_box": _p(base, "raw", "orders_box"),
        "analytics.supplier_stats": _p(base, "analytics", "supplier_stats"),
        "analytics.supplier_rolling": _p(base, "analytics", "supplier_rolling"),
        "ml_features.supplier_features": _p(base, "ml_features", "supplier_features"),
        "dashboard.top_suppliers": _p(base, "dashboard", "top_suppliers"),
        "dashboard.supplier_ranks": _p(base, "dashboard", "supplier_ranks"),
        "dashboard.league_stats": _p(base, "dashboard", "league_stats"),
        "dashboard.kpi_summary": _p(base, "dashboard", "kpi_summary"),
    }
