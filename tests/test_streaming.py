"""Cross-check: the Structured Streaming tumbling-daily query must produce
the same per-(day, event_type) counts and sums as its batch twin
(``relational.q_tumbling_daily``) once the finite file stream drains."""

from __future__ import annotations

import __spark_entry__ as entrymod
from wnba_data_pipeline_spark.streaming import events as se

from .conftest import SF_SMOKE


def test_stateful_running_totals_match_batch(spark):
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.sources.tables import load_table
    from wnba_data_pipeline_spark.streaming import sessions as ss

    stream_df = ss.running_user_totals_stream(spark, SF_SMOKE)
    ss.run_to_memory(stream_df, "user_totals")
    # final emitted row per user carries the complete running state
    final = {
        r["user_id"]: (r["n_events"], r["value_sum"])
        for r in spark.table("user_totals").collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    assert len(final) == len(batch)
    for r in batch:
        n, s = final[r["user_id"]]
        assert n == r["n"]
        assert abs(s - r["s"]) < 1e-6


def test_streaming_matches_batch_twin(spark):
    stream_df = se.tumbling_daily_stream(spark, SF_SMOKE)
    se.run_to_memory(stream_df, "stream_daily")
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.table("stream_daily").collect()
    }
    batch = entrymod.queries()["tumbling_daily"](spark, SF_SMOKE)
    want = {
        (r["day"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in batch.collect()
    }
    assert got == want
