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
