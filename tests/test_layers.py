"""End-to-end layer-job test (SURVEY §5.3): run the full medallion chain on
sf0.001 into a tmp warehouse, assert golden schemas + spot values checked
independently in DuckDB."""

from __future__ import annotations

import json

import duckdb

from wnba_data_pipeline_spark.plans import layers
from wnba_data_pipeline_spark.sources.sinks import json_export_files, read_table

from .conftest import SF_SMOKE


def test_full_pipeline(spark, tmp_path):
    base = str(tmp_path / "warehouse")
    layers.run_all(spark, SF_SMOKE, base)
    t = layers.layer_tables(base)

    # raw layer: appended, partitioned, audited
    raw = read_table(spark, t["raw.lineitem_box"])
    con = duckdb.connect()
    n_src = con.execute(f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/lineitem.parquet')").fetchone()[0]
    assert raw.count() == n_src
    assert "created_at" in raw.columns and "ship_ym" in raw.columns

    # re-running the raw layer is IDEMPOTENT (round-8: upsert_partitions
    # replaces the month partitions it carries — a re-run after a
    # mid-pipeline failure must not double the raw rows)
    layers.run_raw_layer(spark, SF_SMOKE, base)
    assert read_table(spark, t["raw.lineitem_box"]).count() == n_src

    # analytics layer: one row per supplier; spot-check a value in DuckDB
    stats = read_table(spark, t["analytics.supplier_stats"])
    golden = con.execute(
        f"""SELECT l_suppkey, count(*) n_lines, round(sum(l_quantity),6) qty_sum
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet')
            GROUP BY l_suppkey ORDER BY l_suppkey LIMIT 3"""
    ).fetchall()
    got = {r["l_suppkey"]: r for r in stats.collect()}
    for suppkey, n_lines, qty_sum in golden:
        assert got[suppkey]["n_lines"] == n_lines
        assert abs(got[suppkey]["qty_sum"] - qty_sum) < 1e-9

    # features layer: scores present, joinable 1:1 with stats
    feats = read_table(spark, t["ml_features.supplier_features"])
    assert feats.count() == stats.count()
    assert {"efficiency_score", "usage_efficiency"} <= set(feats.columns)

    # dashboard layer: top-10 mart, ranks cover all suppliers, KPI row parses
    top = read_table(spark, t["dashboard.top_suppliers"])
    assert top.count() == 10
    ranks = read_table(spark, t["dashboard.supplier_ranks"])
    assert ranks.count() == stats.count()
    kpi = read_table(spark, t["dashboard.kpi_summary"]).collect()
    assert len(kpi) == 1
    parsed = json.loads(kpi[0]["kpi_data"])
    assert parsed["n_suppliers"] == stats.count()
    assert parsed["as_of"] == layers.DEFAULT_AS_OF

    # JSON exports: single shard per mart, records parse and match counts
    files = json_export_files(str(tmp_path / "warehouse" / "exports" / "top_suppliers"))
    assert len(files) == 1
    with open(files[0]) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == 10


def test_rerun_overwrite_is_idempotent(spark, tmp_path):
    base = str(tmp_path / "wh2")
    layers.run_raw_layer(spark, SF_SMOKE, base)
    layers.run_analytics_layer(spark, base)
    before = read_table(spark, layers.layer_tables(base)["analytics.supplier_stats"]).count()
    layers.run_analytics_layer(spark, base)  # overwrite, not append
    after = read_table(spark, layers.layer_tables(base)["analytics.supplier_stats"]).count()
    assert before == after
