"""Differential gates for the LLM-pipeline operators that live OUTSIDE the
50-slot driver registry (contamination check, sequence packing) — their
DuckDB twins run here with the same hash-differential rigor the driver
applies to registered queries."""

from __future__ import annotations

from wnba_data_pipeline_spark.operators import text

from .conftest import SF_ORACLE
from .oracle_compare import compare


def test_contamination_matches_oracle(spark, duck):
    sdf = text.q_contamination_check(spark, SF_ORACLE)
    ddf = duck.sql(text.ORACLE_CONTAMINATION_CHECK).df()
    compare(sdf, ddf, "contamination_check")


def test_eval_docs_self_report_full_overlap(spark):
    # positive control: every eval doc is in the corpus, so its max overlap
    # is its own distinct-gram count. The argmax is itself UNLESS a
    # lower-id eval doc fully CONTAINS its gram set (a tie at full overlap
    # — the lowest-id tie-break then picks the container; observed at
    # sf0.1 where doc 4650's grams are a subset of eval doc 1600's).
    rows = {r["doc_id"]: r for r in text.q_contamination_check(spark, SF_ORACLE).collect()}
    eval_ids = [d for d in rows if d % text.EVAL_MOD == 0]
    assert eval_ids, "eval set unexpectedly empty"
    non_self = 0
    for d in eval_ids:
        top = rows[d]["top_eval_doc"]
        assert top <= d  # ties break to the lowest eval id, never higher
        if top != d:
            non_self += 1
    # containment ties are rare; the control holds for the vast majority
    assert non_self <= len(eval_ids) * 0.1, (non_self, len(eval_ids))


def test_sequence_packing_matches_oracle(spark, duck):
    sdf = text.q_sequence_packing(spark, SF_ORACLE)
    ddf = duck.sql(text.ORACLE_SEQUENCE_PACKING).df()
    compare(sdf, ddf, "sequence_packing")


def test_sequence_packing_invariants(spark):
    from wnba_data_pipeline_spark.sources.tables import load_table

    n_corpus = load_table(spark, SF_ORACLE, "documents").count()
    rows = text.q_sequence_packing(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= text.PACK_BUCKETS
    total_docs = sum(r["n_docs"] for r in rows)
    assert total_docs == n_corpus  # every document lands in exactly one pack
    for r in rows:
        assert 0 <= r["n_fit"] <= r["n_docs"]
        assert 0.0 <= r["fill_ratio"] <= 1.0
        assert r["used_tok"] <= text.PACK_BUDGET


def test_embedding_quantize_matches_oracle(spark, duck):
    from wnba_data_pipeline_spark.operators import similarity

    sdf = similarity.q_embedding_quantize_int8(spark, SF_ORACLE)
    ddf = duck.sql(similarity.ORACLE_EMBEDDING_QUANTIZE_INT8).df()
    compare(sdf, ddf, "embedding_quantize_int8")


def test_embedding_quantize_bounds(spark):
    from wnba_data_pipeline_spark.operators import similarity

    from wnba_data_pipeline_spark.sources.tables import load_table

    n_vecs = load_table(spark, SF_ORACLE, "embeddings").count()
    rows = similarity.q_embedding_quantize_int8(spark, SF_ORACLE).collect()
    assert len(rows) == n_vecs
    for r in rows:
        assert r["code_max"] <= 127  # symmetric int8 range by construction
        # half-step bound, with slack for the 6-dp rounding BOTH output
        # columns carry (scale can round down while the err rounds up)
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-6
        assert r["rel_l2_err"] < 0.05  # int8 keeps 64-dim vectors within 5%


def test_repetition_stats_match_oracle(spark, duck):
    sdf = text.q_repetition_stats(spark, SF_ORACLE)
    ddf = duck.sql(text.ORACLE_REPETITION_STATS).df()
    compare(sdf, ddf, "repetition_stats")


def test_repetition_flags_planted_degenerate_doc(spark):
    # a degenerate doc (one trigram looped) must stand out with a high
    # max-repeat share while organic text stays flat
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "the cat sat " * 40), (2, "a b c d e f g h i j k l m n o p q r s t u v w x y z")],
        "doc_id long, text string",
    ).select("doc_id", F.trim("text").alias("text"))
    rows = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    assert rows[1]["top_tri_share"] > 0.3  # looped text dominated by one trigram
    assert rows[2]["top_tri_share"] < 0.1  # organic text is flat


def test_embedding_spectrum_invariants(spark):
    from wnba_data_pipeline_spark.operators import similarity
    from wnba_data_pipeline_spark.sources.tables import load_table

    n_vecs = load_table(spark, SF_ORACLE, "embeddings").count()
    rows = {r["label"]: r for r in similarity.q_embedding_spectrum(spark, SF_ORACLE).collect()}
    assert sum(r["n_vecs"] for r in rows.values()) == n_vecs
    for r in rows.values():
        # the top eigenvalue is a positive share of the total variance,
        # and at least the per-dimension average (lambda_max >= trace/dim)
        assert 0 < r["top_eig"] <= r["total_var"] + 1e-9
        assert r["explained"] >= 1.0 / similarity.DIM - 1e-9
        assert 0 < r["explained"] <= 1.0


def test_embedding_spectrum_rerun_deterministic(spark):
    from wnba_data_pipeline_spark.operators import similarity

    r1 = sorted(tuple(r) for r in similarity.q_embedding_spectrum(spark, SF_ORACLE).collect())
    r2 = sorted(tuple(r) for r in similarity.q_embedding_spectrum(spark, SF_ORACLE).collect())
    assert r1 == r2  # sorted-input + fixed-start power iteration


def test_trend_stats_match_oracle(spark, duck):
    from wnba_data_pipeline_spark.operators import relational

    sdf = relational.q_trend_stats(spark, SF_ORACLE)
    ddf = duck.sql(relational.ORACLE_TREND_STATS).df()
    compare(sdf, ddf, "trend_stats")


def test_payload_resize_matches_oracle(spark, duck):
    from wnba_data_pipeline_spark.operators import multimodal

    sdf = multimodal.q_payload_resize(spark, SF_ORACLE)
    ddf = duck.sql(multimodal.ORACLE_PAYLOAD_RESIZE).df()
    compare(sdf, ddf, "payload_resize")


def test_payload_resize_geometry(spark):
    from wnba_data_pipeline_spark.operators import multimodal

    from wnba_data_pipeline_spark.sources.tables import load_table

    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    rows = multimodal.q_payload_resize(spark, SF_ORACLE).collect()
    assert len(rows) == n_docs
    for r in rows:
        expect = min(r["n_bytes"], multimodal.RESIZE_TARGET)
        assert r["n_resized"] == expect  # no-upscale policy
        assert 0 <= r["first_byte"] <= 255 and 0 <= r["last_byte"] <= 255


def test_contamination_plan_broadcasts_eval_side(spark):
    df = text.q_contamination_check(spark, SF_ORACLE)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # the probe join must broadcast the (tiny) eval side — the corpus side
    # never shuffles before the match
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
