"""Cross-check: the Structured Streaming tumbling-daily query must produce
the same per-(day, event_type) counts and sums as its batch twin
(``relational.q_tumbling_daily``) once the finite file stream drains."""

from __future__ import annotations

import __spark_entry__ as entrymod
from wnba_data_pipeline_spark.streaming import events as se

from .conftest import SF_SMOKE


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
