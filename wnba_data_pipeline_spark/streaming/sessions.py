"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.J beyond-parity surface; the brief's prescribed tool for
operators Structured Streaming's built-ins can't express).

Demonstrated operator: per-user running totals — each micro-batch folds its
Arrow batches into (n_events, value_sum) group state and emits the updated
running row. The same pattern extends to custom sessionizers, dedup-within-
window, or trigger-evaluated feature freshness; the BUILT-IN path for plain
gap sessionization is ``session_window`` (see
``relational.q_sessionize_events``), so state here is deliberately the
simplest useful shape.

Correctness gate: after draining the finite file stream, the final state
per user must equal the batch groupBy totals (tests/test_streaming.py).
Scale posture: state is per-group (user), partitioned by the groupBy
shuffle; memory is O(groups), not O(events)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import read_events_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, value_sum double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "value_sum": [total]})


def running_user_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(df: DataFrame, table_name: str) -> None:
    """Drain the update-mode stateful totals (delegates to
    :func:`drain_to_memory`). NOTE the single-drain assumption: the memory
    sink in update mode appends every batch's updated rows, so consumers
    taking 'the final row per user' must aggregate (e.g. max n_events per
    user) if the source ever drains in more than one micro-batch."""
    return drain_to_memory(df, table_name, mode="update")





def sessionize_stream(
    spark: SparkSession, sf_dir: str, *, watermark: str = "31 days"
) -> DataFrame:
    """Streaming twin of ``relational.q_sessionize_events``: the SAME
    ``session_window`` gap aggregation run incrementally — merging session
    state per (user, window) bounded by the watermark. Late events beyond
    the watermark drop instead of reopening closed sessions (the property
    that bounds state at 100 TB/day; the batch twin has no such cutoff, so
    the finite-drain cross-check uses a watermark past the corpus span).

    Drain contract: session-window aggregations support append and
    complete output only (update would emit half-merged sessions). In
    APPEND mode a session emits only once the watermark passes its close,
    so a finite availableNow drain ends with every session still open —
    an empty result. The cross-check therefore drains in COMPLETE mode
    (total session state re-emitted at the single final batch); a
    production continuous run uses append, where the watermark finalizes
    sessions as the stream advances."""
    from pyspark.sql import functions as F

    from ..operators.relational import SESSION_GAP_S, _dsum, _r6

    ev = read_events_stream(spark, sf_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r6(_dsum("value")).alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "value_sum",
        )
    )


def drain_to_memory(df: DataFrame, table_name: str, *, mode: str = "complete") -> None:
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
