"""Structured Streaming twin of the bounded range join
(``operators/temporal.range_join``) — a stream-stream interval join.

The batch operator turns the range predicate into a (key, time-bin)
equi-join because batch Spark has no bounded-state range operator; the
STREAMING engine does: a stream-stream inner join whose condition bounds
event-time distance lets the state store discard rows once the watermark
passes their join-window, which is exactly the 100 TB/day posture — state
is O(rate × window), not O(history). This module expresses the SAME
trailing-window pair semantics (`prior_ts ∈ [purchase_ts − W,
purchase_ts)`) both ways so the finite-file drain can be cross-checked
pair-for-pair against the batch operator (tests/test_streaming.py).

Semantics notes:
- inner join only: streaming outer interval joins emit null-padded rows
  only after watermark passage, which a finite availableNow drain may cut
  short; the batch twin's left-join path carries the nullability story.
- both sides carry a watermark so BOTH state stores are bounded; the join
  range condition gives the engine the per-side state-retention bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import ASOF_LEFT_TYPE, WINDOW_US, range_join
from .events import read_events_stream

# whole seconds only: a sub-second WINDOW_US would silently truncate here
# and drift the stream's join band off the batch range_join's exact
# microsecond bound (round-8 review fix — fail loudly instead)
assert WINDOW_US % 1_000_000 == 0, "streaming interval join needs whole-second WINDOW_US"
_WINDOW_SECONDS = WINDOW_US // 1_000_000


def attribution_pairs_stream(
    spark: SparkSession, sf_dir: str, *, watermark: str = "1 day"
) -> DataFrame:
    """(purchase_id, prior_id) pairs for every same-user event in the 24
    hours strictly before each purchase — the streaming interval-join form
    of ``q_range_join_bins``'s pair stage."""
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == ASOF_LEFT_TYPE)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    prior = (
        read_events_stream(spark, sf_dir)
        .select(
            F.col("event_id").alias("prior_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("prior_ts"),
        )
        .withWatermark("prior_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("prior_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {_WINDOW_SECONDS} SECONDS"))
        & (F.col("prior_ts") < F.col("purchase_ts"))
    )
    return purchases.join(prior, cond, "inner").select(
        "purchase_id", F.col("p_user").alias("user_id"), "prior_id"
    )


def attribution_pairs_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin for the cross-check: the same pair set via the bin-
    bucketed ``range_join``."""
    from ..sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == ASOF_LEFT_TYPE).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    prior = events.select(
        "user_id", F.col("event_id").alias("prior_id"), F.col("ts").alias("prior_ts")
    )
    return range_join(
        purchases, prior, on="user_id", left_ts="purchase_ts", right_ts="prior_ts"
    ).select("purchase_id", "user_id", "prior_id")


def run_pairs_to_memory(df: DataFrame, table_name: str) -> None:
    """Drain the append-mode pair stream (shared body:
    ``sessions.drain_to_memory``)."""
    from .sessions import drain_to_memory

    drain_to_memory(df, table_name, mode="append")
