"""SparkSession factory.

The reference has no engine of its own (SURVEY.md §4) — pandas is eager and
single-threaded, DuckDB is only used for storage and quality SQL. Here the
whole pipeline is one lazy Catalyst plan, so the session config is where the
"optimizer" of the reference (which doesn't exist) is replaced wholesale.

Every conf below is chosen for the 100 TB posture first and the local[32]
test harness second; comments say which is which.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "wnba-pipeline-spark",
    *,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    At cluster scale the master/memory settings come from spark-submit; only
    the SQL confs below matter there. In tests we run ``local[N]``.
    ``extra_confs`` lets the bench harness apply local-scale tuning (e.g.
    small ``files.maxPartitionBytes`` so a 10 MB parquet file still fans out
    across cores) without changing the 100 TB-posture defaults here.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime re-planning — shuffle-partition coalescing, skew-join
        # splitting, and dynamic broadcast selection. Essential at 100 TB
        # where static stats lie; harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Static shuffle width: start at cores locally. On a real cluster
        # this would be ~2-3x total cores; AQE coalesces the excess.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Arrow for any pandas-UDF hop (similarity / multimodal operators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver's events.parquet stores TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as raw nanos (long) and convert
        # in sources.tables.load_events.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Deterministic timestamp rendering for oracle parity.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_confs(spark: SparkSession) -> SparkSession:
    """Set the dynamic confs this engine relies on, on a session we did not
    create (the correctness driver hands us its own SparkSession).

    Everything here is load-bearing for oracle parity, not just perf:
    UTC session timezone + NTZ parquet inference keep date/timestamp casts
    byte-identical to the tz-naive DuckDB oracle, and nanosAsLong is required
    to read the driver's TIMESTAMP(NANOS) events table at all.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
