"""Warehouse sinks (SURVEY §2 A6-A10).

The reference's sinks are DuckDB DDL + positional ``INSERT INTO … SELECT *``
(append, ``ingest_nba_daily.py:96-148``) and ``DROP TABLE`` + CTAS overwrite
(``transform_player_stats.py:175-199``), plus pandas ``to_json`` exports
(``prepare_dashboard_data.py:290-319``). Here every sink is a Spark
DataFrameWriter over a partitioned parquet layout:

- append is BY NAME, fixing the reference's positional-insert fragility
  (SURVEY G4): we select the target column order explicitly before writing.
- the raw layer partitions by a low-cardinality derived key so the 30-day
  scan predicates (B2) become partition pruning at 100 TB.
- JSON export writes distributed shards; ``single_file=True`` coalesces to
  one shard for byte-parity with the reference's one-file-per-table export
  (only sane for mart-sized frames — documented, not default).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def append_table(df: DataFrame, path: str, partition_by: tuple[str, ...] = (), column_order: tuple[str, ...] = ()) -> None:
    """A6 append sink. ``column_order`` pins the canonical schema by name —
    a frame with reordered columns lands correctly (unlike the reference's
    positional INSERT, ``ingest_nba_daily.py:141``)."""
    if column_order:
        df = df.select(*column_order)
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_table(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    """A7 overwrite sink (the reference's DROP + CTAS)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def export_json(df: DataFrame, path: str, *, single_file: bool = False) -> None:
    """A8 JSON-records export (``to_json(orient='records')``,
    ``prepare_dashboard_data.py:302-319``). Distributed shards by default;
    ``single_file`` coalesces mart-sized frames to one shard."""
    (df.coalesce(1) if single_file else df).write.mode("overwrite").json(path)


def json_export_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "part-*")))
