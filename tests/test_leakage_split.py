"""Invariant gates for the leakage-safe cluster split
(operators/ml.leakage_safe_split): near-duplicate documents must NEVER
straddle the train/test boundary, assignment must be a pure function of
the cluster id (deterministic, layout-independent), and the achieved test
share must track the target at cluster granularity."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.operators import dedup, ml
from wnba_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _docs_and_pairs(spark):
    # the dedup_minhash registry query's corpus: documents with planted
    # near-copies (its pair machinery finds both planted and organic dups)
    docs = dedup.near_dup_corpus(spark, SF_ORACLE)
    pairs = dedup.minhash_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    return docs.select("doc_id"), pairs


def test_no_pair_crosses_the_split(spark):
    docs, pairs = _docs_and_pairs(spark)
    split = ml.leakage_safe_split(docs, pairs).select("doc_id", "split")
    crossings = (
        pairs.join(split.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
        .join(split.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossings == 0
    assert pairs.count() > 0  # the gate actually had pairs to respect


def test_split_is_deterministic_and_layout_independent(spark):
    docs, pairs = _docs_and_pairs(spark)
    a = {r["doc_id"]: r["split"] for r in ml.leakage_safe_split(docs, pairs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in ml.leakage_safe_split(docs.repartition(13), pairs.repartition(5)).collect()
    }
    assert a == b
    assert len(a) == docs.count()  # every doc assigned exactly once


def test_test_share_tracks_target(spark):
    docs, pairs = _docs_and_pairs(spark)
    for pct in (10, 25):
        split = ml.leakage_safe_split(docs, pairs, test_pct=pct)
        n = split.count()
        n_test = split.filter(F.col("split") == "test").count()
        # cluster-level binomial: ~500 clusters, allow a wide band
        assert abs(n_test / n - pct / 100) < 0.08, (pct, n_test, n)


def test_singletons_form_their_own_clusters(spark):
    docs, pairs = _docs_and_pairs(spark)
    split = ml.leakage_safe_split(docs, pairs)
    paired = {r[0] for r in pairs.select("doc_a").collect()} | {
        r[0] for r in pairs.select("doc_b").collect()
    }
    own = split.filter(~F.col("doc_id").isin(paired)).filter(
        F.col("comp") != F.col("doc_id")
    )
    assert own.count() == 0
