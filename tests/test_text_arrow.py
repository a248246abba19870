"""Round-15 optimization differentials: the text-family Arrow passes
(SPARK_GRAFT_TEXT_ARROW) must be byte-identical to the pure-expression
plans they replace — same posture as tests/test_dedup_arrow.py for the
shingle/signature passes. Each registry query that gained an Arrow branch
is compared across both flag settings on the smoke tables, and the helper
passes are pinned on planted edge rows (NULL/empty/short/multibyte texts,
repeated grams, double spaces — the places split/md5/distinct semantics
could diverge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wnba_data_pipeline_spark.operators import spans, text
from .conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _both(monkeypatch, build):
    monkeypatch.setenv("SPARK_GRAFT_TEXT_ARROW", "0")
    expr = _rows(build())
    monkeypatch.setenv("SPARK_GRAFT_TEXT_ARROW", "1")
    arrow = _rows(build())
    return expr, arrow


@pytest.mark.parametrize(
    "qname",
    [
        "contamination_check",
        "doc_winnow",
        "substring_spans",
        "heavy_hitters_cms",
        "hh_cms_vs_exact",
    ],
)
def test_query_arrow_branch_identical(qname, spark, monkeypatch):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[qname]
    expr, arrow = _both(monkeypatch, lambda: fn(spark, SF_SMOKE))
    assert expr == arrow
    # the smoke tables exercise every non-threshold query; the CMS rows
    # are threshold-gated (≥ HH_MIN_COUNT) and may be empty at sf0.001 —
    # their value coverage comes from the sf0.01 oracle sweep
    if not qname.startswith(("heavy_hitters", "hh_")):
        assert len(expr) > 0


EDGE_DOCS = [
    (1, None),
    (2, ""),
    (3, "one"),
    (4, "a b c d e"),  # exactly CONTAM_NGRAM words → one 5-gram
    (5, "x y x y x y x y x y x y"),  # repeated grams → distinct collapses
    (6, "päivää ääkkösiä ü ü ü ü ü ü ü ü ü"),  # multibyte tokens
    (7, "a  b   c d e f g h i"),  # double spaces → empty tokens kept
    (8, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
]


def _edge_frame(spark):
    return spark.createDataFrame(EDGE_DOCS, "doc_id long, text string").coalesce(1)


def test_word_gram_rows_edge_texts(spark, monkeypatch):
    docs = _edge_frame(spark)
    n = text.CONTAM_NGRAM
    words = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - F.lit(n)),
        lambda i: text.md5_long(
            F.concat_ws(" ", *[F.element_at(words, i + F.lit(k + 1)) for k in range(n)])
        ),
    )
    for distinct in (False, True):
        g = F.array_distinct(grams) if distinct else grams
        expr = _rows(
            docs.filter(F.size(words) >= n).select("doc_id", F.explode(g).alias("gh"))
        )
        arrow = _rows(
            text.word_gram_hash_rows(docs, n_words=n, distinct=distinct)
        )
        assert expr == arrow


def test_word_gram_rows_positions(spark):
    docs = _edge_frame(spark)
    w = spans.SPAN_W
    words = F.split(F.col("text"), " ")
    expr = _rows(
        docs.filter(F.size(words) >= w).select(
            "doc_id", F.posexplode(spans._gram_hashes(words)).alias("pos", "gh")
        )
    )
    arrow = _rows(text.word_gram_hash_rows(docs, n_words=w, with_pos=True))
    assert expr == arrow


def test_bigram_partial_counts_sum_to_exact(spark):
    docs = _edge_frame(spark)
    exact = _rows(text._bigram_stream(docs).groupBy("bigram").count())
    partial = _rows(
        text.bigram_count_rows(docs).groupBy("bigram").agg(F.sum("n").cast("long"))
    )
    assert exact == partial


def test_winnow_stats_edge_texts(spark, monkeypatch):
    # char-gram path: add texts around the length threshold k+w-1=11
    rows = EDGE_DOCS + [
        (9, "0123456789"),  # 10 chars → below threshold, emits nothing
        (10, "0123456789a"),  # exactly 11 → 4 grams, 1 window
        (11, "ääkkösiä ovat tässä pitkässä tekstissä mukana"),  # multibyte chars
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)

    def build():
        if text._text_arrow_enabled():
            s = text._winnow_stats_rows(docs, k=text.SHINGLE_CHARS, w=text.WINNOW_WINDOW)
        else:
            fps = text.winnow_fingerprints(docs)
            s = fps.select(
                "doc_id",
                "n_grams",
                "n_windows",
                F.size("fps").cast("long").alias("n_fingerprints"),
                F.array_min("fps").alias("fp_min"),
                F.array_max("fps").alias("fp_max"),
            )
        return s

    expr, arrow = _both(monkeypatch, build)
    assert expr == arrow
    assert any(r[0] == 10 for r in arrow) and not any(r[0] == 9 for r in arrow)


def test_dup_gram_hits_edge_texts(spark, monkeypatch):
    # two docs sharing an 8-gram + one unique doc + edge rows
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    rows = [
        (1, None),
        (2, "a b c"),
        (3, f"intro {shared} outro"),
        (4, f"{shared} tail words here now"),
        (5, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    expr, arrow = _both(monkeypatch, lambda: spans.dup_gram_hits(docs))
    assert expr == arrow
    assert {r[0] for r in arrow} == {3, 4}
