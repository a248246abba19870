"""Empty-input robustness (SURVEY §5.2): the reference guards every stage
with ``if df.empty: return`` (e.g. ``transform_player_stats.py:38-39``);
lazy Spark plans must instead flow empty frames through every operator
without error — aggregates yield empty or single-row-of-nulls frames, never
exceptions."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.plans import layers
from wnba_data_pipeline_spark.sources.sinks import append_table, read_table
from wnba_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_layers_on_empty_raw(spark, tmp_path):
    """Analytics + features + dashboard layers over an EMPTY raw layer:
    every sink writes a valid (zero-row) table, no stage raises."""
    base = str(tmp_path / "wh_empty")
    li = load_table(spark, SF_SMOKE, "lineitem").filter(F.lit(False)).withColumns(
        {
            "created_at": F.lit(layers.DEFAULT_AS_OF).cast("timestamp_ntz"),
            "ship_ym": F.date_format(F.col("l_shipdate"), "yyyy-MM"),
        }
    )
    append_table(li, f"{base}/raw/lineitem_box")
    orders = load_table(spark, SF_SMOKE, "orders").filter(F.lit(False)).withColumns(
        {
            "created_at": F.lit(layers.DEFAULT_AS_OF).cast("timestamp_ntz"),
            "order_ym": F.date_format(F.col("o_orderdate"), "yyyy-MM"),
        }
    )
    append_table(orders, f"{base}/raw/orders_box")

    layers.run_analytics_layer(spark, base)
    layers.run_features_layer(spark, base)
    layers.run_dashboard_layer(spark, base)

    t = layers.layer_tables(base)
    assert read_table(spark, t["analytics.supplier_stats"]).count() == 0
    assert read_table(spark, t["dashboard.top_suppliers"]).count() == 0
    # global aggregates over nothing: one row, defined null/zero semantics
    kpi = read_table(spark, t["dashboard.kpi_summary"]).collect()
    assert len(kpi) == 1


def test_operator_expressions_on_empty_groups(spark):
    """Window + agg + ratio expressions over a zero-row frame: empty out,
    no divide-by-zero or null surprises."""
    li = load_table(spark, SF_SMOKE, "lineitem").filter(F.lit(False))
    agg = li.groupBy("l_suppkey").agg(
        F.sum("l_quantity").alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    out = agg.select(
        "l_suppkey",
        F.when(F.col("q") > 0, F.col("q") / F.col("n")).otherwise(F.lit(0.0)).alias("r"),
    )
    assert out.count() == 0
