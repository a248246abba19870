"""Structured Streaming twin of the tumbling-daily batch aggregation
(SURVEY §2.J).

The reference is batch-only — its "streaming" is daily cron re-runs over an
append-only raw layer (``ingest_nba_daily.py:172``, schedule at ``:13``).
Parity therefore needs no streaming at all; this module is the documented
idiomatic upgrade: the SAME tumbling-window aggregation as
``relational.q_tumbling_daily``, expressed over a file-source stream with a
watermark, so the two can be cross-checked (tests/test_streaming.py).

Semantics deltas vs the batch twin, by streaming necessity:
- ``count_distinct`` is unsupported in streaming aggregations →
  ``approx_count_distinct`` (the documented scale swap from SURVEY D2);
  the cross-check therefore compares n_events/value_sum only.
- the watermark bounds state at 100 TB/day scale: late events beyond 1 day
  are dropped instead of growing unbounded per-day state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import _dsum, _r6

# (schema, ts dtype) per sf_dir — the footer probe is a driver-side batch
# read (~75 ms, the dominant fixed cost sources/tables.py's handle cache
# exists to kill); attribution_pairs_stream builds TWO streams per query,
# so an uncached probe would pay it twice per plan build
_PROBES: dict[str, tuple] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over ``events.parquet``, normalized to a plain
    TIMESTAMP ``ts`` (event-time watermarks require it; the session
    timezone is pinned to UTC so values match the NTZ batch twin).

    SESSION MUTATION: building this plan sets
    ``spark.sql.session.timeZone=UTC`` (and ``nanosAsLong``) on the SHARED
    session — required for watermark correctness vs the NTZ batch twin. A
    caller who deliberately set a different timezone gets a warning (not a
    silent override) so other queries on the session aren't surprised
    (round-9 advice fix).

    The file source needs an explicit schema, and the physical ``ts`` type
    varies by data generation (TIMESTAMP(NANOS) → bigint under
    ``nanosAsLong``; TIMESTAMP(MICROS) → timestamp_ntz) — so probe the
    footer with a one-off batch read (schema only, no data scan) and
    branch the rebuild exactly like the batch loader
    (``sources.tables.load_table``)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the docstring's UTC pin must not silently depend on the caller having
    # run session.ensure_confs: on a non-UTC session the nanos rebuild and
    # the window/day casts below would shift buckets relative to the NTZ
    # batch twin (round-8 review fix — set defensively like nanosAsLong)
    # "Deliberately set" is only detectable at session BUILD time: the
    # runtime conf's get() falls back to the JVM default timezone for a key
    # nobody ever set, so warning on every non-UTC machine is noise, not
    # signal (round-10 advice fix). Warn only when the tz was explicitly
    # pinned via .config() at build; otherwise note the pin at debug level.
    prior_tz = spark.conf.get("spark.sql.session.timeZone", None)
    if prior_tz not in (None, "UTC", "Etc/UTC", "GMT"):
        built_tz = None
        try:  # sparkContext is absent under Spark Connect — treat as unset
            built_tz = spark.sparkContext.getConf().get("spark.sql.session.timeZone", None)
        except Exception:
            pass
        msg = (
            f"read_events_stream overrides spark.sql.session.timeZone "
            f"({prior_tz!r} -> 'UTC') for stream/batch window parity; other "
            f"queries on this session now run under UTC"
        )
        if built_tz not in (None, "UTC", "Etc/UTC", "GMT"):
            import warnings

            warnings.warn(msg, stacklevel=2)
        else:
            import logging

            logging.getLogger(__name__).debug(msg)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if sf_dir not in _PROBES:
        probe = spark.read.parquet(f"{sf_dir}/events.parquet")
        _PROBES[sf_dir] = (probe.schema, dict(probe.dtypes).get("ts"))
    schema, ts_type = _PROBES[sf_dir]
    # the file source wants a DIRECTORY; point it at the sf dir and glob the
    # single events file out of the other tables
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_type == "bigint":
        # nanos arrive as bigint and are rebuilt with exact integer
        # arithmetic (div, not float: ~1.7e18 exceeds double's mantissa)
        return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_daily_stream(spark: SparkSession, sf_dir: str, *, watermark: str = "1 day") -> DataFrame:
    """Streaming tumbling 1-day aggregation — same grouping as the batch
    twin; state per (day, event_type) is bounded by the watermark."""
    ev = read_events_stream(spark, sf_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # fixed-point _dsum, NOT round(sum(double)): micro-batch fold
            # order differs from the batch hash aggregate, and plain
            # double sums diverge in the 6th decimal at large groups —
            # the cross-check wants order-independent exactness
            # (round-8 review fix; same contract as the batch twin)
            _r6(_dsum("value")).alias("value_sum"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(F.col("w.start").cast("date").alias("day"), "event_type", "n_events", "value_sum", "n_users_approx")
    )


def hopping_6h_stream(spark: SparkSession, sf_dir: str, *, watermark: str = "1 day") -> DataFrame:
    """Sliding (hopping) window aggregation — 1-day windows every 6 hours,
    so each event lands in 4 overlapping windows. The windowing shape the
    reference's daily cron can't express at all, and the state-cost dial a
    100 TB stream tunes (state size ×(window/slide)); watermark bounds it
    exactly as for tumbling."""
    ev = read_events_stream(spark, sf_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r6(_dsum("value")).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def hopping_6h_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the hopping stream (same F.window call in batch mode)
    for the cross-check."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r6(_dsum("value")).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


# Driver row for the hopping-window family (round-10 ninth rotation,
# VERDICT r9 item 5 — the one window family that never had a CORRECTNESS
# row; tumbling and session windows both hold rows in
# operators/relational.py). The batch twin is the oracle-checkable form;
# stream≡batch equality is pinned separately in tests/test_streaming.py,
# so the driver hash transitively covers the stream too. The DuckDB twin
# expands each event into its 4 overlapping epoch-aligned windows
# (win_start = floor_6h(ts) - k·6h, k ∈ 0..3 — exactly F.window's
# assignment for windowDuration=1d, slideDuration=6h) via a range(4)
# cross join; make_timestamp keeps the arithmetic timezone-naive like the
# Spark session's UTC pin.
from ..operators.relational import _dsum_sql as _rel_dsum_sql

ORACLE_HOPPING_6H = f"""
SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS win_start, event_type,
       count(*) AS n_events, round({_rel_dsum_sql("value")}, 6) AS value_sum
FROM (
  SELECT make_timestamp((CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 - k * 21600) * 1000000) AS win_start,
         event_type, value
  FROM events, range(4) t(k)
  -- NULL-ts rows never enter any window: Spark's F.window drops them
  -- (verified empirically — ADVICE r10), while without this guard DuckDB
  -- would emit a NULL win_start group counting each null-ts event 4 times
  WHERE ts IS NOT NULL
)
GROUP BY win_start, event_type
"""

# hopping_6h_batch held the hopping-window family's driver row rounds
# 10-13; rotated OFF in the round-14 THIRTEENTH rotation (VERDICT r13
# item 6): its hopping physics is tumbling_daily's in-registry windowed
# agg plus the 1→N expansion chunk_docs carries, the stream≡batch twin
# stays pinned in tests/test_streaming.py, and the full hash-differential
# parity check (incl. the planted null-ts oracle row in
# tests/test_oracle_parity.py) moves to tests/test_offregistry_parity.py.
# Slot freed for group_tail_n returning (operators/relational.py — E5's
# only carrier, off-registry since round 10).
QUERIES: dict = {}
ORACLES: dict = {}


def run_to_memory(df: DataFrame, table_name: str) -> None:
    """Drain the (finite) file stream into an in-memory sink — availableNow
    processes everything then stops; complete mode emits final windows
    without waiting for the watermark to advance past them. (Shared body:
    ``sessions.drain_to_memory`` — one place to change drain mechanics.)"""
    from .sessions import drain_to_memory

    drain_to_memory(df, table_name, mode="complete")
