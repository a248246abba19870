"""Salted-join equivalence + balance (SURVEY §7.11): same results as the
plain join on a hot-key dataset, with the hot key actually spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.functions.skew import SALT_COL, salted_join, with_salt


def _skewed(spark):
    # 10k rows of one hot key + 100 spread over 10 keys
    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select((F.col("id") % 10 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_join_matches_plain_join(spark):
    fact = _skewed(spark)
    dim = spark.range(12).select((F.col("id") + 1).alias("k"), F.concat(F.lit("dim"), "id").alias("name"))
    plain = fact.join(dim, ["k"]).groupBy("k", "name").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    salted = salted_join(fact, dim, ["k"], 8).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_left_join_nulls_preserved(spark):
    fact = _skewed(spark).filter(F.col("k") <= 5)
    dim = spark.range(2).select((F.col("id") + 4).alias("k"), F.lit("x").alias("name"))  # keys 4, 5 only
    plain = fact.join(dim, ["k"], "left")
    salted = salted_join(fact, dim, ["k"], 4, how="left")
    assert plain.count() == salted.count()
    assert plain.filter("name IS NULL").count() == salted.filter("name IS NULL").count()


def test_salt_spreads_hot_key(spark):
    fact = _skewed(spark)
    dist = (
        with_salt(fact.filter("k = 1"), 8)
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    assert len(dist) == 8  # every salt bucket hit
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)  # roughly uniform


# ---------------------------------------------------------------------------
# Dedup hot-bucket gate (round 9, VERDICT r8 item 7): a boilerplate corpus
# collapsing onto one LSH band bucket must (a) produce IDENTICAL pairs
# through the salted path and (b) actually split the hot bucket's pair
# build across salt groups.
# ---------------------------------------------------------------------------


def _boilerplate_corpus(spark, n_docs=600):
    """n_docs sharing one 60-word template + a tiny unique suffix — most
    land in ONE band bucket per band (the adversarial shape: pairwise
    jaccard ~0.9, so candidates AND verified pairs are quadratic)."""
    template = " ".join(f"tmpl{i}" for i in range(60))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(template + " unique"), F.col("id").cast("string")).alias("text"),
    )


def test_dedup_hot_bucket_salted_pairs_identical(spark):
    from wnba_data_pipeline_spark.functions.hashing import md5_long
    from wnba_data_pipeline_spark.operators.dedup import (
        HB_SAMPLE_MOD,
        _minhash_band_keys,
        minhash_pairs,
        shingle_docs,
    )

    docs = _boilerplate_corpus(spark)
    # the sampled detector must actually fire on this corpus (otherwise the
    # equality below only exercises the cold branch): recompute the
    # estimate with the operator's own constants
    est = (
        shingle_docs(docs)
        .filter(
            F.pmod(
                md5_long(F.concat(F.lit("hb:"), F.col("doc_id").cast("string"))),
                F.lit(HB_SAMPLE_MOD),
            )
            == 0
        )
        .select(F.explode(F.array(*_minhash_band_keys(F.col("sh")))).alias("band_key"))
        .groupBy("band_key")
        .count()
        .filter(F.col("count") >= 2)
        .count()
    )
    assert est > 0, "sampled hot-bucket detection did not fire; grow the corpus"
    plain = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_pairs(docs, hot_bucket_min=32).collect()
    }
    salted = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_pairs(docs, hot_bucket_min=0).collect()
    }
    assert plain == salted
    assert len(plain) > 1000  # the quadratic shape is real


def test_dedup_hot_bucket_actually_splits(spark):
    from wnba_data_pipeline_spark.functions.skew import SALT_COL as SC
    from wnba_data_pipeline_spark.functions.skew import HOT_SALTS, with_salt
    from wnba_data_pipeline_spark.operators.dedup import (
        _minhash_band_keys,
        shingle_docs,
    )

    docs = _boilerplate_corpus(spark)
    shingled = shingle_docs(docs)
    banded = shingled.select(
        "doc_id",
        F.explode(F.array(*_minhash_band_keys(F.col("sh")))).alias("band_key"),
    )
    sizes = banded.groupBy("band_key").agg(F.count(F.lit(1)).alias("_n"))
    hot_max = sizes.agg(F.max("_n")).collect()[0][0]
    assert hot_max > 32  # the planted bucket exists
    # the salted probe side splits that bucket ~evenly across HOT_SALTS
    # groups, so no single task builds the whole |B|^2 pair block
    hot = banded.join(sizes.filter(F.col("_n") > 32), "band_key").select("doc_id", "band_key")
    dist = [
        r["c"]
        for r in with_salt(hot, HOT_SALTS)
        .groupBy("band_key", SC)
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert max(dist) <= 4 * (hot_max // HOT_SALTS + 1)


def test_disabled_gate_never_takes_grouped_path(spark):
    """Round 14 (VERDICT r13 item 5 / ADVICE r13): with the hot gate
    DISABLED (hot_bucket_min=0) nothing bounds bucket size, so the grouped
    collect_list + C(B,2) combinations path — which builds a bucket's whole
    pair array in ONE row — must not engage; the branch falls back to the
    band-key self-join, which streams a giant bucket's pairs across join
    tasks. Plan-asserted on the planted-giant-bucket corpus, and the pair
    sets stay identical to the gated default."""
    from wnba_data_pipeline_spark.operators.dedup import (
        minhash_candidates,
        minhash_pairs,
        shingle_docs,
    )

    docs = _boilerplate_corpus(spark, n_docs=120)
    shingled = shingle_docs(docs)
    plan = minhash_candidates(shingled, hot_bucket_min=0)._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan  # the grouped path's signature agg
    assert "Join" in plan  # self-join engaged (AQE picks the physical kind)
    gated = {
        (r["doc_a"], r["doc_b"]) for r in minhash_pairs(docs).collect()
    }
    disabled = {
        (r["doc_a"], r["doc_b"]) for r in minhash_pairs(docs, hot_bucket_min=0).collect()
    }
    assert gated == disabled
