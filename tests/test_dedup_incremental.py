"""Differential + planted-control gates for the incremental (batch-vs-corpus)
dedup operator — the production ingestion shape: classify arriving docs as
exact_dup / near_dup / kept against an existing reference corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.operators import dedup

from .conftest import SF_ORACLE
from .oracle_compare import compare


def test_incremental_matches_oracle(spark, duck):
    compare(
        dedup.q_dedup_incremental(spark, SF_ORACLE),
        duck.sql(dedup.ORACLE_DEDUP_INCREMENTAL).df(),
        "dedup_incremental",
    )


def test_incremental_planted_controls(spark):
    out = dedup.q_dedup_incremental(spark, SF_ORACLE).cache()
    try:
        # every planted exact copy must be flagged exact_dup pointing at a
        # ref doc whose text hashes identically (min-id, so usually itself)
        exact = out.filter(F.col("doc_id") >= dedup.EXACT_COPY_OFFSET)
        n_exact = exact.count()
        assert n_exact > 0
        assert exact.filter(F.col("verdict") != "exact_dup").count() == 0
        assert exact.filter(F.col("best_jaccard") != 1.0).count() == 0
        # every planted near copy (drop-last-word of a long ref doc) must be
        # caught by the LSH path: near_dup OR exact_dup (if the truncation
        # collides with another ref text), never kept
        near = out.filter(
            (F.col("doc_id") >= dedup.NEAR_COPY_OFFSET)
            & (F.col("doc_id") < dedup.EXACT_COPY_OFFSET)
        )
        assert near.count() > 0
        assert near.filter(F.col("verdict") == "kept").count() == 0
        # kept docs carry the sentinel audit values
        kept = out.filter(F.col("verdict") == "kept")
        assert kept.filter((F.col("matched_ref") != -1) | (F.col("best_jaccard") != 0.0)).count() == 0
    finally:
        out.unpersist()


def test_incremental_no_crossjoin_plan(spark):
    """The near stage must be a banded bucket join — no CartesianProduct /
    BroadcastNestedLoopJoin anywhere in the physical plan."""
    plan = (
        dedup.q_dedup_incremental(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
