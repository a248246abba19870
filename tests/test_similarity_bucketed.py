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
from wnba_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_ORACLE
from .oracle_compare import compare


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


def test_hard_negatives_exact_matches_duckdb_twin(spark, duck):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    compare(
        similarity.hard_negatives_exact(emb),
        duck.sql(similarity.ORACLE_HARD_NEGATIVES_EXACT).df(),
        "hard_negatives_exact",
    )


def test_hard_negatives_bucketed_recall_and_subset(spark):
    # the banded path must (a) only ever report true different-label
    # pairs with exact cosines (verified per-row against the exact
    # ranking) and (b) recover >= 90% of the true top-1 hard negatives
    # (measured 92.8% at sf0.01 with 4-plane bands; deterministic —
    # planes are fixed hash-derived literals, so this is a property of
    # the corpus, not a flaky sample)
    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = {(r.a_vec_id, r.n_vec_id): r.cosine for r in similarity.hard_negatives_exact(emb, k=50).collect()}
    top1 = {r.a_vec_id: r.n_vec_id for r in similarity.hard_negatives_exact(emb).collect() if r.neg_rank == 1}
    got = similarity.hard_negatives_bucketed(emb).collect()
    for r in got:
        assert (r.a_vec_id, r.n_vec_id) in exact  # true pair, not fabricated
        assert exact[(r.a_vec_id, r.n_vec_id)] == r.cosine
    got1 = {r.a_vec_id: r.n_vec_id for r in got if r.neg_rank == 1}
    recall = sum(1 for a, n in top1.items() if got1.get(a) == n) / len(top1)
    assert recall >= 0.9


def test_hard_negatives_bucketed_shuffles_ids_only(spark):
    # round-8 sixth review pass: the band join and candidate distinct once
    # shipped both 64-dim embeddings through every shuffle (2.2x slower at
    # sf0.1 and OOM-prone on a default heap). Pin the id-then-fetch shape:
    # no shuffle Exchange may carry a vector column — embeddings reach the
    # verify stage only through id-keyed Broadcast fetches — and the
    # distinct must aggregate over the two id longs alone.
    df = similarity.q_hard_negatives_bucketed(spark, SF_ORACLE)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    vec_cols = ("_ae#", "_ne#", "embedding#")
    saw_shuffle = saw_distinct = False
    for block in plan.split("\n\n"):
        header = block.strip().split("\n", 1)[0]
        if ") Exchange" in header:  # shuffle, not BroadcastExchange
            saw_shuffle = True
            assert not any(c in block for c in vec_cols), block
        if ") HashAggregate" in header and "Functions: []" in block:
            saw_distinct = True
            assert not any(c in block for c in vec_cols), block
    assert saw_shuffle and saw_distinct  # the probes actually matched
