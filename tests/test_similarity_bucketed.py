"""Recall gate for the bucketed near-dup path: the banded-LSH candidate
join must recover EXACTLY the all-pairs exact result — the property that
makes it a valid 100 TB substitute for the cartesian baseline (the same
relationship ``dedup_minhash`` has to ``ngram_jaccard``).

The (planes, bands) = (8, 16) config was tuned on the actual corpus: the
planted pairs' cosines sit at 0.87-0.93, right at the 0.9 threshold, so
recall here is a real measurement, not a formality. Everything is
hash-derived (no RNG), so this is deterministic per dataset — the sf0.1
sweep runs via SPARK_GRAFT_TEST_SF_DIR.
"""

from __future__ import annotations

from wnba_data_pipeline_spark.operators import similarity

from .conftest import SF_ORACLE


def _pairs(df):
    return {(r["vec_a"], r["vec_b"]): r["cosine"] for r in df.collect()}


def test_bucketed_recovers_all_pairs_exactly(spark):
    exact = _pairs(similarity.q_emb_near_dup(spark, SF_ORACLE))
    bucketed = _pairs(similarity.q_emb_near_dup_bucketed(spark, SF_ORACLE))
    assert bucketed == exact  # same pairs AND same cosines (recall == 1)
    assert len(exact) > 0  # the planted pairs are actually present


def test_bucketed_plan_has_no_cartesian(spark):
    df = similarity.q_emb_near_dup_bucketed(spark, SF_ORACLE)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # the candidate step must be an equi-join on the band key, never a
    # nested-loop product (which is exactly what the all-pairs baseline is)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
