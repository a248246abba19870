"""Mergeable-sketch operators: pre-aggregated HLL state over the event
stream, unioned at query time — the incremental-analytics pattern that
answers "distinct users over ANY day window" from per-day state instead of
rescanning 100 TB of raw events.

``approx_count_distinct`` (the D2 scale swap) gives one estimate per query
over raw rows; the DataSketches functions here go further: the SKETCH
itself is stored per (day) — a few KB of mergeable state — and
``hll_union_agg`` combines arbitrary day subsets. That mergeability is the
whole point: daily jobs write sketch rows once, every later window query
is an aggregation over #days rows. The same pattern serves streaming
(sketches as ``applyInPandasWithState`` state) and cross-partition rollups
(region × day sketches union to region totals).

No DuckDB oracle by design (sketch binaries are engine-specific, same as
the HLL variant — SURVEY D2); the gates are exactness bounds against the
true distinct counts and union-vs-direct consistency
(tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

LG_K = 14  # sketch precision: ~0.8% rsd, ~16 KB max per sketch


def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day HLL sketch of user_id over events — the stored state a
    daily incremental job appends (one shuffle on day; sketch building is
    map-side partial like any aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("user_sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def distinct_users_over(sketches: DataFrame) -> DataFrame:
    """Union any subset of stored day sketches into one distinct-user
    estimate — #days rows aggregated, raw events never touched."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch", F.lit(True))).alias("distinct_users_est"),
        F.count(F.lit(1)).alias("n_days"),
    )
