"""Count-min-sketch heavy-hitter gates (text.heavy_hitters_cms): the CMS
prefilter must be EXACT end-to-end (overestimate-only sketch ⇒ no false
negatives; the final exact count removes false positives), and the
candidate set it pays the exact shuffle for must be a small fraction of
the distinct-term space."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.operators import text
from wnba_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_ORACLE

MIN_COUNT = 40


def _exact_heavy(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    return (
        text._bigram_stream(docs)
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_COUNT)
    )


def test_cms_heavy_hitters_exact(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    got = {
        (r["bigram"], r["n"])
        for r in text.heavy_hitters_cms(docs, min_count=MIN_COUNT).collect()
    }
    want = {(r["bigram"], r["n"]) for r in _exact_heavy(spark).collect()}
    assert got == want
    assert len(want) > 0  # the threshold actually selects something


def test_cms_prefilter_is_selective(spark):
    """The candidate set (what pays the exact per-term shuffle) must be
    far smaller than the distinct-bigram space — the whole point of the
    sketch. With 32k cells and this corpus' ~100k occurrences, collisions
    admit some false positives; gate at <10% of distinct terms."""
    docs = load_table(spark, SF_ORACLE, "documents")
    occ = text._bigram_stream(docs)
    cms = text.cms_counts(occ)
    n_candidates = (
        occ.filter(text._cms_passes(F.col("bigram"), cms, MIN_COUNT))
        .select("bigram")
        .distinct()
        .count()
    )
    n_distinct = occ.select("bigram").distinct().count()
    assert n_candidates < 0.1 * n_distinct, (n_candidates, n_distinct)
