"""Catalog veneer over the parquet layer warehouse: register each layer as
a Spark catalog DATABASE and each layer table as an EXTERNAL parquet table,
so ``spark.table("raw.lineitem_box")`` and SQL-over-catalog
(``spark.sql("SELECT ... FROM analytics.supplier_stats")``) work.

This closes SURVEY §1's mapping row — the reference's DuckDB
``schema.table`` namespaces (``CREATE SCHEMA IF NOT EXISTS raw`` +
``CREATE TABLE IF NOT EXISTS raw.nba_player_box_daily``,
``ingest_nba_daily.py:104-107``) become catalog databases + tables. The
files stay exactly where ``plans.layers`` wrote them (external LOCATION —
registration moves no data and is idempotent, like the reference's
IF NOT EXISTS DDL).

Scale posture: partitioned raw tables register their partitions with
``ALTER TABLE ... RECOVER PARTITIONS`` so catalog reads get the same
partition pruning the path-based reads get (asserted in
tests/test_catalog.py). On a real deployment the in-memory catalog is a
Hive metastore / Unity-style catalog; the DDL is identical.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .layers import layer_tables

# layer tables whose directories are partitioned (see layers.run_raw_layer)
PARTITIONED = ("raw.lineitem_box", "raw.orders_box")


def write_bucketed(
    df,
    qualified: str,
    *,
    bucket_by: str,
    n_buckets: int,
    path: str,
    sort_by: str | None = None,
) -> None:
    """Write ``df`` as a BUCKETED (and optionally sorted) external catalog
    table — the co-located-join layout: two tables bucketed by the same key
    with the same bucket count join WITHOUT any shuffle (each bucket pair
    joins locally), and per-bucket ``sortBy`` lets the sort-merge join skip
    its sorts too. Asserted against the physical plan in
    tests/test_catalog.py.

    This is the 100 TB answer to a repeated join key: pay one clustered
    write, then every subsequent join on that key is exchange-free. Bucket
    metadata lives in the catalog, which is why this sits in the catalog
    veneer (``bucketBy`` requires ``saveAsTable``)."""
    db, tbl = qualified.split(".")
    spark = df.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP TABLE IF EXISTS {qualified}")
    w = df.write.mode("overwrite").format("parquet").option("path", path).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(qualified)


def register_catalog(spark: SparkSession, base: str) -> list[str]:
    """Register every layer table under its database; returns the qualified
    names registered. Re-registration points the catalog at the current
    warehouse (DROP/CREATE of the pointer only — external data untouched)."""
    registered = []
    for qualified, path in layer_tables(base).items():
        db, tbl = qualified.split(".")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        spark.sql(f"DROP TABLE IF EXISTS {db}.{tbl}")
        spark.sql(f"CREATE TABLE {db}.{tbl} USING parquet LOCATION '{path}'")
        if qualified in PARTITIONED:
            spark.sql(f"ALTER TABLE {db}.{tbl} RECOVER PARTITIONS")
        registered.append(qualified)
    return sorted(registered)
