"""Differential gate for the contamination-check operator — it lives
outside the 50-slot driver registry, so its DuckDB twin runs here with the
same hash-differential rigor the driver applies to registered queries."""

from __future__ import annotations

from wnba_data_pipeline_spark.operators import text

from .conftest import SF_ORACLE
from .oracle_compare import compare


def test_contamination_matches_oracle(spark, duck):
    sdf = text.q_contamination_check(spark, SF_ORACLE)
    ddf = duck.sql(text.ORACLE_CONTAMINATION_CHECK).df()
    compare(sdf, ddf, "contamination_check")


def test_eval_docs_self_report_full_overlap(spark):
    # positive control: every eval doc is in the corpus, so its own row
    # must point at itself with max_shared == its distinct-gram count
    rows = {r["doc_id"]: r for r in text.q_contamination_check(spark, SF_ORACLE).collect()}
    eval_ids = [d for d in rows if d % text.EVAL_MOD == 0]
    assert eval_ids, "eval set unexpectedly empty"
    for d in eval_ids:
        assert rows[d]["top_eval_doc"] == d


def test_contamination_plan_broadcasts_eval_side(spark):
    df = text.q_contamination_check(spark, SF_ORACLE)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # the probe join must broadcast the (tiny) eval side — the corpus side
    # never shuffles before the match
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
