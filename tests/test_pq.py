"""Gates for product quantization: cross-engine code/ADC parity (post-fit
codebooks as literals, like the semantic-dedup twin), physical-path
bit-equality, recall vs the exact search, and reconstruction sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wnba_data_pipeline_spark.operators import pq
from wnba_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_ORACLE
from .oracle_compare import compare


@pytest.fixture(scope="module")
def model(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    return pq.pq_fit(emb)


def _codes_str(df):
    return df.select(
        "vec_id", F.concat_ws("-", F.col("codes").cast("array<string>")).alias("codes_str")
    )


def test_pq_codes_match_oracle(spark, duck, model):
    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    sdf = _codes_str(pq.pq_encode(emb, model, path="expr"))
    ddf = duck.sql(
        f"SELECT vec_id, array_to_string(codes, '-') AS codes_str FROM ({pq.pq_encode_sql(model)})"
    ).df()
    compare(sdf, ddf, "pq_codes")


def test_pq_encode_paths_bit_identical(spark, model):
    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    expr = {r["vec_id"]: r["codes_str"] for r in _codes_str(pq.pq_encode(emb, model, path="expr")).collect()}
    pandas = {r["vec_id"]: r["codes_str"] for r in _codes_str(pq.pq_encode(emb, model, path="pandas")).collect()}
    assert expr == pandas


def test_pq_adc_topk_matches_oracle(spark, duck, model):
    compare(
        pq.q_pq_topk(spark, SF_ORACLE, model=model),
        duck.sql(pq.pq_adc_topk_sql(model)).df(),
        "pq_adc_topk",
    )


def test_pq_rerank_matches_oracle(spark, duck, model):
    compare(
        pq.q_pq_rerank(spark, SF_ORACLE, model=model),
        duck.sql(pq.pq_rerank_sql(model)).df(),
        "pq_rerank",
    )


def _exact_truth(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < pq.PQ_N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    exact_pairs = (
        F.broadcast(q)
        .join(emb, F.col("q_vec_id") != F.col("vec_id"))
        .withColumn("_d2", pq._sqdist_vec(F.col("q_emb"), F.col("embedding")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_vec_id").orderBy(F.col("_d2").asc(), F.col("vec_id").asc())
    exact = (
        exact_pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= pq.PQ_TOP_K)
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"))
        .collect()
    )
    truth = {}
    for r in exact:
        truth.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    return truth


def _recall(truth, rows):
    got = {}
    for r in rows:
        got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    hits = sum(len(truth[qid] & got.get(qid, set())) for qid in truth)
    return hits / sum(len(v) for v in truth.values())


def test_pq_recall_vs_exact_l2(spark, model):
    """Retrieval-quality gates against the exact-L2 top-3: raw 4-bit ADC is
    deliberately coarse (64× compression — measured 0.30 on this corpus;
    floor 0.2 guards collapse, not quality), while the production
    shortlist+rerank path must recover the exact neighbors almost
    entirely (measured 0.90 at R=50; see the PQ_RERANK comment for why
    this near-uniform corpus needs a thick shortlist)."""
    truth = _exact_truth(spark)
    raw = _recall(truth, pq.q_pq_topk(spark, SF_ORACLE, model=model).collect())
    assert raw >= 0.2, f"raw ADC recall@3 collapsed: {raw}"
    rr = _recall(truth, pq.q_pq_rerank(spark, SF_ORACLE, model=model).collect())
    assert rr >= 0.85, f"rerank recall@3 too low: {rr}"
    assert rr >= raw


def test_pq_reconstruction_beats_global_mean(spark, model):
    """Quantization sanity: per-vector reconstruction MSE from codes must be
    far below the MSE of predicting every vector by the global mean (i.e.
    the codebooks explain most of the variance)."""
    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    enc = pq.pq_encode(emb, model, path="expr").withColumn(
        "recon", pq.pq_decode_col(F.col("codes"), model)
    )
    err = enc.select(
        F.aggregate(
            F.zip_with("embedding", "recon", lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("se")
    ).agg(F.avg("se").alias("mse")).collect()[0]["mse"]

    mean_vec = emb.select(
        F.array(*[F.avg(F.element_at("embedding", i + 1)) for i in range(pq.DIM)]).alias("mu")
    ).collect()[0]["mu"]
    base = emb.select(
        F.aggregate(
            F.zip_with(
                "embedding",
                F.array(*[F.lit(float(x)) for x in mean_vec]),
                lambda a, b: (a.cast("double") - b) ** 2,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("se")
    ).agg(F.avg("se").alias("mse")).collect()[0]["mse"]
    # measured 0.56 vs 1.00 on the near-uniform driver corpus — 16 codewords
    # per 8-dim subspace can only carve so much of an isotropic cube; the
    # gate is "quantizer genuinely fitted" (well below baseline), not a
    # compression-ratio promise
    assert err < 0.7 * base, f"PQ mse {err} vs mean-baseline mse {base}"


def test_fit_reproduces_checked_in_codebooks(spark, model):
    # Guards the round-7 pq_rerank driver oracle: the static codebook
    # literals in _pq_codebooks.py must be EXACTLY what the runtime fit
    # recomputes on the same sf dir (bit-deterministic sub-fits; on
    # inequality re-run tools/gen_pq_oracle.py).
    import os

    from wnba_data_pipeline_spark.operators._pq_codebooks import CODEBOOKS_BY_SF

    sf_name = os.path.basename(SF_ORACLE.rstrip("/"))
    if sf_name not in CODEBOOKS_BY_SF:
        pytest.skip(f"no checked-in codebooks for {sf_name}")
    assert model.codebooks == CODEBOOKS_BY_SF[sf_name]


def test_separation_statistic_and_recall_advisory(spark, caplog):
    """Round 13 (VERDICT r12 item 1): ivfpq_fit records the coarse-fit
    separation statistic (inertia/total-SS) and warns — advisory only,
    never a dial change — when the geometry is near-isotropic AND the
    probed fraction is sub-linear (the measured recall-collapse regime:
    separation 0.77 → recall 0.35 at 1 M / 1.6% probed, while the
    fixture-scale 25%-probed index stays quiet at separation 0.94)."""
    import logging

    emb = load_table(spark, SF_ORACLE, "embeddings")
    # default fixture geometry: near-isotropic sample but 2/8 cells probed
    # → no advisory (coverage comes from volume)
    with caplog.at_level(logging.WARNING, logger="wnba_data_pipeline_spark.operators.pq"):
        idx = pq.ivfpq_fit(emb)
        assert idx.separation is not None and idx.separation > pq.IVFPQ_SEPARATION_ADVISORY
        assert not [r for r in caplog.records if "inertia/SS" in r.message]
        # force the sub-linear probed fraction on an isotropic geometry
        # whose cells still explain little variance (k=100 on the 2 000-row
        # sf0.1 corpus: measured separation 0.82, probed fraction 10%)
        # → the advisory must fire
        emb_big = load_table(spark, SF_ORACLE.replace("sf0.01", "sf0.1"), "embeddings")
        idx_big = pq.ivfpq_fit(emb_big, coarse_k=100)
        assert idx_big.separation > pq.IVFPQ_SEPARATION_ADVISORY
        assert [r for r in caplog.records if "inertia/SS" in r.message]


def test_pq_fit_fused_equals_per_subspace(spark, model, monkeypatch):
    """Round 13 (VERDICT r12 item 2): the fused sub-fit iteration — one
    Arrow pass per Lloyd iteration for all m subspaces, integer partial
    sums — must reproduce the r12 per-subspace fits EXACTLY: codebooks and
    every KMeansModel metadatum (n_iter, inertia history, sizes,
    converged). The module `model` fixture runs the fused default, so
    this also chains the fused path to the checked-in fixture literals."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    monkeypatch.setenv("SPARK_GRAFT_FIT_FUSED", "0")
    base = pq.pq_fit(emb)
    assert base.codebooks == model.codebooks
    meta = lambda mm: [  # noqa: E731
        (s.n_iter, s.inertia, s.sizes, s.converged) for s in mm.sub_models
    ]
    assert meta(base) == meta(model)
    # and with a sample gate engaged (the 100 TB shape)
    monkeypatch.setenv("SPARK_GRAFT_FIT_FUSED", "1")
    fused_s = pq.pq_fit(emb, sample_mod=2)
    monkeypatch.setenv("SPARK_GRAFT_FIT_FUSED", "0")
    base_s = pq.pq_fit(emb, sample_mod=2)
    assert fused_s.codebooks == base_s.codebooks
    assert meta(fused_s) == meta(base_s)


# ---------------------------------------------------------------------------
# IVF-PQ — the composed stack (round 9, VERDICT r8 item 4)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ivfpq_index(spark):
    # the DEFAULT index (round 10): by_residual=True, coarse_init="farthest"
    emb = load_table(spark, SF_ORACLE, "embeddings")
    return pq.ivfpq_fit(emb)


def test_ivfpq_fixture_current(ivfpq_index):
    # static-oracle validity: the checked-in coarse centroids, residual
    # sub-codebooks, AND fit-corpus size must be the exact default fit
    # this corpus produces (same contract as the PQ codebooks; on
    # inequality re-run tools/gen_pq_oracle.py)
    import os

    from wnba_data_pipeline_spark.operators._ivfpq_coarse import COARSE_BY_SF
    from wnba_data_pipeline_spark.operators._ivfpq_residual import (
        IVFPQ_N_BY_SF,
        RESIDUAL_CODEBOOKS_BY_SF,
    )

    sf_name = os.path.basename(SF_ORACLE.rstrip("/"))
    if sf_name not in COARSE_BY_SF:
        pytest.skip(f"no checked-in coarse centroids for {sf_name}")
    assert ivfpq_index.by_residual
    assert ivfpq_index.coarse == COARSE_BY_SF[sf_name]
    assert ivfpq_index.pq.codebooks == RESIDUAL_CODEBOOKS_BY_SF[sf_name]
    assert ivfpq_index.n_vectors == IVFPQ_N_BY_SF[sf_name]


def test_fused_qlut_matches_expression(spark, duck):
    """Round 15 (optimization): above the expression term budget
    (k×dim > 512 — e.g. the sf0.1 auto geometry, 31 cells × 64 dims) the
    ENTIRE query side of ``ivfpq_search`` (probe + residual + LUT) runs
    as one fused Arrow pass, and ``ivfpq_encode`` takes the fused
    single-pass branch on the same gate. Both claims pinned here at
    coarse_k=12 (the smallest >8-cell geometry on this corpus): (a) the
    end-to-end search matches the post-fit DuckDB twin EXACTLY — the
    twin renders the expression-side association contracts, so this is
    the fused-vs-expression equality, cross-engine; (b) the physical
    query side is MapInPandas with no ArrowEvalPython residual hop and
    no probe+residual double crossing."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    index = pq.ivfpq_fit(emb, coarse_k=12)
    from wnba_data_pipeline_spark.operators.clustering import _expr_path_ok

    assert not _expr_path_ok(index.coarse)  # the fused gate really engages
    out = pq.q_ivfpq_search(spark, SF_ORACLE, index=index)
    compare(out, duck.sql(pq.ivfpq_search_sql(index)).df(), "ivfpq_search_fused_qlut")
    ep = out._jdf.queryExecution().executedPlan().toString()
    # exactly two Python crossings: the fused corpus encode and the fused
    # query-side qlut — nothing else (no residual ArrowEvalPython, no
    # separate probe pass). Under AQE the plan string repeats the tree in
    # an "== Initial Plan ==" section — count the final section only.
    final = ep.split("== Initial Plan ==")[0]
    assert final.count("MapInPandas") == 2 and "ArrowEvalPython" not in final


def test_pq_encode_default_is_arrow_at_registry_constants(spark, model):
    """Round 15: ``pq_encode``'s default path switches on the unrolled
    term count (m×ksub×dsub = 1 024 > the 512 budget at the registry
    constants), so the default is the Arrow pass; the expr≡pandas value
    equality is pinned by test_encode_paths_agree above."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    ep = (
        pq.pq_encode(emb, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in ep


def test_ivfpq_matches_oracle(spark, duck, ivfpq_index):
    # default (residual) variant end-to-end vs the residual SQL twin
    compare(
        pq.q_ivfpq_search(spark, SF_ORACLE, index=ivfpq_index),
        duck.sql(pq.ivfpq_search_sql(ivfpq_index)).df(),
        "ivfpq_search",
    )


def test_ivfpq_raw_optout_matches_oracle(spark, duck, model):
    # the documented re-encode-friendly opt-out keeps its own full
    # cross-engine parity: raw codes + hash-init coarse vs the raw twin
    emb = load_table(spark, SF_ORACLE, "embeddings")
    index = pq.ivfpq_fit(emb, by_residual=False, coarse_init="hash")
    assert not index.by_residual
    assert index.pq.codebooks == model.codebooks  # raw PQ fit is the flat fit
    compare(
        pq.q_ivfpq_search(spark, SF_ORACLE, index=index),
        duck.sql(pq.ivfpq_search_sql(index)).df(),
        "ivfpq_search_raw",
    )


def test_ivfpq_never_scans_full_corpus_adc(spark, ivfpq_index):
    """The composition's whole point: ADC candidates = rows in PROBED cells
    only. Assert (a) the ADC join is an equi-join on cell, and (b) the
    candidate count equals the sum of probed-cell sizes — strictly below
    the full-corpus n_queries x (n-1) an IndexPQ flat scan would touch."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), ivfpq_index)
    q = emb.filter(F.col("vec_id") < pq.PQ_N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    out = pq.ivfpq_search(corpus, q, ivfpq_index)
    ep = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [cell" in ep or "BroadcastHashJoin [cast(cell" in ep

    from wnba_data_pipeline_spark.operators.clustering import probe_assignments

    cell_sizes = {
        r["cell"]: r["n"]
        for r in corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probes = probe_assignments(q, ivfpq_index.coarse, vec_col="q_emb", nprobe=pq.IVFPQ_NPROBE)
    q_cells = [(r["q_vec_id"], r["cell"]) for r in probes.collect()]
    own_cell = {
        r["vec_id"]: r["cell"]
        for r in corpus.filter(F.col("vec_id") < pq.PQ_N_QUERIES).collect()
    }
    expected = sum(
        cell_sizes.get(c, 0) - (1 if own_cell.get(qid) == c else 0) for qid, c in q_cells
    )
    qp = probes.select("q_vec_id", "cell")
    n_cand = (
        F.broadcast(qp)
        .join(corpus.select("vec_id", "cell"), ["cell"])
        .filter(F.col("q_vec_id") != F.col("vec_id"))
        .count()
    )
    n_total = emb.count()
    assert n_cand == expected
    assert n_cand < pq.PQ_N_QUERIES * (n_total - 1)


def test_ivfpq_recall_vs_exact_l2(spark, ivfpq_index):
    """Retrieval gate for the composed stack on the NEAR-UNIFORM driver
    corpus, where recall is ceilinged by the probed fraction by
    construction (nprobe 2 of 8 roughly-balanced cells ⇒ ~25-30% of the
    corpus visible; a true neighbor outside the probed cells is
    unreachable at any rerank). Measured 0.53 under the r9 raw/hash
    defaults and 0.47 under the round-10 residual/farthest defaults —
    same ceiling, different cell boundaries; the CLUSTERED corpus (where
    geometry matters) is gated at 0.8 below. Floor guards collapse."""
    truth = _exact_truth(spark)
    got = _recall(truth, pq.q_ivfpq_search(spark, SF_ORACLE, index=ivfpq_index).collect())
    assert got >= 0.4, f"ivfpq recall@3 collapsed: {got}"


# ---------------------------------------------------------------------------
# IVF-PQ residual encoding (round 9 — FAISS's by_residual=true variant)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """A planted 4-cluster corpus whose within-cluster margins sit below
    raw-PQ quantization error — the geometry the residual variant exists
    for (centers at scale 5, noise at scale 1, 64-dim)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    centers = rng.normal(0.0, 5.0, (4, 64))
    n = 2000
    x = centers[np.arange(n) % 4] + rng.normal(0.0, 1.0, (n, 64))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(x.astype(np.float64))}
    )
    df = spark.createDataFrame(pdf).persist()
    df.count()
    yield df
    df.unpersist()


def _np_ivfpq_search(index, X, q_ids, nprobe, rerank, k):
    """numpy replica of the composed residual search — same left-fold
    association, first-min / stable-sort tie-breaks, and (value, id)
    orderings as the Spark plan, so equality is exact, not approximate."""
    import numpy as np

    C = np.asarray(index.coarse, dtype=np.float64)
    m, dsub = index.pq.m, index.pq.dsub

    def sqd(A, B):
        # left-fold per-dimension accumulation (the repo association contract)
        D = np.zeros((A.shape[0], B.shape[0]))
        for d in range(A.shape[1]):
            diff = A[:, d, None] - B[None, :, d]
            D += diff * diff
        return D

    cells = sqd(X, C).argmin(axis=1)  # first-min ≡ array_position
    R = X - C[cells]
    codes = np.zeros((len(X), m), dtype=np.int64)
    for j, cb in enumerate(index.pq.codebooks):
        codes[:, j] = sqd(R[:, j * dsub : (j + 1) * dsub], np.asarray(cb)).argmin(axis=1)

    out = []
    for qid in q_ids:
        probe = np.argsort(sqd(X[qid : qid + 1], C)[0], kind="stable")[:nprobe]
        cand = []
        for cell in probe:
            qr = X[qid] - C[cell]
            luts = [
                sqd(qr[None, j * dsub : (j + 1) * dsub], np.asarray(cb))[0]
                for j, cb in enumerate(index.pq.codebooks)
            ]
            for i in np.where(cells == cell)[0]:
                if i == qid:
                    continue
                adist = 0.0
                for j in range(m):  # left-fold term order, same as the plan
                    adist += luts[j][codes[i, j]]
                cand.append((adist, int(i)))
        cand.sort()
        short = [i for _, i in cand[:rerank]]
        exact = sorted(
            (sqd(X[qid : qid + 1], X[i : i + 1])[0, 0], i) for i in short
        )
        out.extend((qid, i, rk + 1) for rk, (_, i) in enumerate(exact[:k]))
    return set(out)


@pytest.fixture(scope="module")
def clustered_residual_index(spark, clustered_emb):
    # plain defaults apart from coarse_k: residual + farthest seeding
    return pq.ivfpq_fit(clustered_emb, coarse_k=4)


def _clustered_truth10(clustered_emb, n_q):
    from pyspark.sql import Window

    q = clustered_emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("_d2").asc(), F.col("vec_id").asc())
    exact = (
        F.broadcast(q)
        .join(clustered_emb.select("vec_id", "embedding"), F.col("q_vec_id") != F.col("vec_id"))
        .withColumn("_d2", pq._sqdist_vec(F.col("q_emb"), F.col("embedding")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"))
        .collect()
    )
    truth = {}
    for r in exact:
        truth.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    return q, truth


def test_ivfpq_defaults_clustered_recall(spark, clustered_emb, clustered_residual_index):
    """VERDICT r9 item 1 done-criterion: on a clustered corpus the DEFAULT
    fit + DEFAULT search (residual codes, farthest-point seeding,
    auto-widened rerank) must deliver recall@10 >= 0.8 against exact L2 —
    the r8-defaults stack measured chance-level 0.061 here
    (BENCH_SCALE_r09 ivfpq_clustered; the 20k/8-cluster twin of this
    probe is re-measured in BENCH_SCALE_r10)."""
    q, truth = _clustered_truth10(clustered_emb, 20)
    index = clustered_residual_index
    # auto-rerank resolves from the fit statistics, not a magic constant
    assert pq.resolve_rerank(index, pq.IVFPQ_NPROBE, "auto") == 200
    corpus = pq.ivfpq_encode(clustered_emb.select("vec_id", "embedding"), index)
    rows = pq.ivfpq_search(corpus, q, index, k=10).collect()
    got = _recall(truth, rows)
    assert got >= 0.8, f"clustered recall@10 with defaults: {got}"


def test_ivfpq_residual_matches_numpy_differential(spark, clustered_emb, clustered_residual_index):
    """Bit-exact differential for the residual composition: fit on the
    planted corpus, then Spark's probe→residual-LUT→ADC→shortlist→rerank
    must reproduce the numpy replica EXACTLY (ids and ranks)."""
    import numpy as np

    index = clustered_residual_index
    assert index.by_residual
    X = np.array(
        [r["embedding"] for r in clustered_emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    corpus = pq.ivfpq_encode(clustered_emb.select("vec_id", "embedding"), index)
    n_q = 20
    q = clustered_emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    got = {
        (r["q_vec_id"], r["n_vec_id"], r["nn_rank"])
        for r in pq.ivfpq_search(corpus, q, index, k=5, nprobe=2, rerank=30).collect()
    }
    want = _np_ivfpq_search(index, X, range(n_q), nprobe=2, rerank=30, k=5)
    assert got == want


def test_ivfpq_residual_beats_raw_on_clustered_corpus(spark, clustered_emb, clustered_residual_index):
    """The measured failure this variant exists for (BENCH_SCALE_r09
    ivfpq_clustered): raw codebooks spend their codewords on cluster
    identity, so within-cell ADC margins are noise and the shortlist is
    chance-level; residual codes resolve the within-cell offsets."""
    q, truth = _clustered_truth10(clustered_emb, 20)

    recalls = {}
    for by_residual in (False, True):
        index = (
            clustered_residual_index
            if by_residual
            # the documented opt-out IS the old default stack — pin it
            # explicitly so this stays the measured r9 failure mode
            else pq.ivfpq_fit(clustered_emb, coarse_k=4, by_residual=False, coarse_init="hash")
        )
        corpus = pq.ivfpq_encode(clustered_emb.select("vec_id", "embedding"), index)
        rows = pq.ivfpq_search(corpus, q, index, k=10, nprobe=2, rerank=30).collect()
        recalls[by_residual] = _recall(truth, rows)
    # deterministic fits on a fixed corpus -> these are exact reruns of a
    # measured point (raw/hash ~0.23, residual/farthest ~0.66 at the
    # deliberately thin rerank=30), asserted with slack for
    # geometry-neutral refactors
    assert recalls[True] >= 0.30, f"residual recall collapsed: {recalls}"
    assert recalls[True] >= recalls[False] + 0.08, f"no residual advantage: {recalls}"


def test_residual_arrow_equals_expression(spark):
    """Round 11: the Arrow residual path (large cell counts, where the
    literal centroid table would explode the analyzer) must produce the
    same doubles as the expression path — one IEEE subtraction either
    way."""
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq
    from wnba_data_pipeline_spark.sources.tables import load_table

    from .conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings").limit(200)
    cents = [r["embedding"] for r in emb.limit(5).collect()]
    cents = [[float(x) for x in c] for c in cents]
    cell = (F.col("vec_id") % len(cents)).cast("int")
    expr = sorted(
        (r["vec_id"], tuple(r["r"]))
        for r in emb.select(
            "vec_id", pq._residual_col(F.col("embedding"), cents, cell).alias("r")
        ).collect()
    )
    arrow = sorted(
        (r["vec_id"], tuple(r["r"]))
        for r in emb.select(
            "vec_id", pq._residual_udf(cents)(F.col("embedding"), cell).alias("r")
        ).collect()
    )
    assert expr == arrow


def test_auto_geometry_resolves_fixture_values_at_driver_scales(spark):
    """The round-11 auto dials must resolve to the exact round-10 values at
    every fixture scale — the static-oracle validity argument."""
    from wnba_data_pipeline_spark.operators import pq

    for n, cells in ((500, 8), (2000, 31)):
        assert pq.ivfpq_cells_for(n) == cells
        assert pq.ivfpq_fit_sample_mod(n, cells) == 1
    assert pq.ivfpq_nprobe_for(8) == 2
    # and the large-n regime actually scales
    assert pq.ivfpq_cells_for(2_000_000) == 5656
    assert pq.ivfpq_nprobe_for(5656) == 75
    assert pq.ivfpq_fit_sample_mod(2_000_000, 5656) == 5


def test_ivfpq_search_large_geometry_equals_expression_path(spark, monkeypatch):
    """Round 11: above the expression-k bound the search's query residual
    goes through a materialized Arrow column (Python UDFs are illegal
    inside higher-order lambdas). Force a >64-cell fit on the small
    corpus and pin that the Arrow-path search returns exactly the rows
    the literal-expression path returns."""
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq
    from wnba_data_pipeline_spark.operators import clustering
    from wnba_data_pipeline_spark.sources.tables import load_table

    from .conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    index = pq.ivfpq_fit(emb, coarse_k=72, sample_mod=1, coarse_init="hash")
    assert len(index.coarse) == 72
    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
    corpus.count()
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    try:
        arrow = sorted(tuple(r) for r in pq.ivfpq_search(corpus, q, index).collect())
        monkeypatch.setattr(clustering, "KM_EXPR_MAX_K", 128)
        monkeypatch.setattr(clustering, "KM_EXPR_TERM_BUDGET", 128 * 64)
        expr = sorted(tuple(r) for r in pq.ivfpq_search(corpus, q, index).collect())
    finally:
        corpus.unpersist()
    assert arrow == expr
    assert len(arrow) > 0


def test_pq_fused_gemm_kernel_canary(spark, monkeypatch):
    """Round 14 (ADVICE r13): above the expression-k bound
    (ksub > KM_EXPR_MAX_K) `_pq_partials_fn` now honors the gemm dial the
    same way `_batch_partials_fn` does, so the fused path and the opt-out
    reference arm keep picking the SAME kernel at every ksub. Identity of
    the gemm arm vs the left-fold arm is measured, not structural (the
    expanded form associates differently) — this is its standing canary
    at scaled ksub, mirroring the k=256 coarse-fit canary."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    meta = lambda mm: [  # noqa: E731
        (s.n_iter, s.inertia, s.sizes, s.converged) for s in mm.sub_models
    ]
    monkeypatch.setenv("SPARK_GRAFT_FIT_MATMUL", "1")
    gemm = pq.pq_fit_fused(emb, ksub=96, max_iter=2)
    monkeypatch.setenv("SPARK_GRAFT_FIT_MATMUL", "0")
    fold = pq.pq_fit_fused(emb, ksub=96, max_iter=2)
    assert gemm.codebooks == fold.codebooks
    assert meta(gemm) == meta(fold)


def test_ivfpq_fused_encode_and_residual_bit_identical(spark, monkeypatch):
    """Round 14 (VERDICT r13 item 4): above the expression-k bound the
    encode defaults to ONE fused Arrow pass (cell + in-memory residual +
    codes) instead of three Python round-trips, and the fit's residual
    materialization fuses assign+subtract into one slim (id, residual)
    pass. Both reuse the pinned kernels verbatim, so cells, codes, AND
    fitted codebooks must be bit-identical to the three-stage opt-out —
    asserted here at coarse_k=96 (> KM_EXPR_MAX_K, the smallest corpus
    that exercises the fused branch) and fingerprint-compared at 1 M in
    BENCH_SCALE_r14."""
    emb = load_table(spark, SF_ORACLE, "embeddings")

    def _fit():
        return pq.ivfpq_fit(emb, coarse_k=96)

    def _enc(index):
        return {
            r["vec_id"]: (r["cell"], tuple(r["codes"]))
            for r in pq.ivfpq_encode(emb.select("vec_id", "embedding"), index)
            .select("vec_id", "cell", "codes")
            .collect()
        }

    monkeypatch.setenv("SPARK_GRAFT_ENCODE_FUSED", "1")
    idx_fused = _fit()
    enc_fused = _enc(idx_fused)
    monkeypatch.setenv("SPARK_GRAFT_ENCODE_FUSED", "0")
    idx_base = _fit()
    enc_base = _enc(idx_base)
    assert idx_fused.coarse == idx_base.coarse
    assert idx_fused.pq.codebooks == idx_base.pq.codebooks
    assert enc_fused == enc_base
    # the fused branch really engaged: the plan is ONE Arrow stage, not
    # an assign stage feeding a residual udf feeding an encode stage
    monkeypatch.setenv("SPARK_GRAFT_ENCODE_FUSED", "1")
    plan = (
        pq.ivfpq_encode(emb.select("vec_id", "embedding"), idx_fused)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1 and "ArrowEvalPython" not in plan


def test_auto_escalate_nprobe_resolution(ivfpq_index):
    """Round 14 (VERDICT r13 item 1): the OPT-IN escalation mode. At or
    past the advisory separation the resolved probe count is the measured
    escalation fraction of the cells (floored at the auto dial); below
    it — or with no recorded separation — it is exactly the auto dial.
    Plain None stays the auto dial regardless of separation (escalation
    is never a silent default)."""
    import dataclasses
    import math

    cells = len(ivfpq_index.coarse)
    auto = pq.ivfpq_nprobe_for(cells)
    hot = dataclasses.replace(ivfpq_index, separation=pq.IVFPQ_SEPARATION_ADVISORY)
    cold = dataclasses.replace(ivfpq_index, separation=0.1)
    unknown = dataclasses.replace(ivfpq_index, separation=None)
    esc = max(auto, math.ceil(pq.IVFPQ_ESCALATE_FRACTION * cells))
    assert pq.ivfpq_resolve_nprobe(hot, "auto-escalate") == esc
    assert pq.ivfpq_resolve_nprobe(cold, "auto-escalate") == auto
    assert pq.ivfpq_resolve_nprobe(unknown, "auto-escalate") == auto
    assert pq.ivfpq_resolve_nprobe(hot, None) == auto  # None never escalates
    assert pq.ivfpq_resolve_nprobe(hot, 7) == 7


def test_auto_escalate_engaged_branch_improves_recall(spark):
    """Round 15 (VERDICT r14 item 2): exercise the ENGAGED escalation
    branch end to end — not just the resolver. A planted collapse-regime
    corpus (cluster centers sigma 0.5 vs unit noise — the geometry whose
    1 M-vector point measured separation 0.77 / recall 0.35 in
    BENCH_SCALE_r14 ann_escalation_sweep) must (a) record a fit-time
    separation at or past the 0.7 advisory, (b) resolve
    ``nprobe="auto-escalate"`` to the measured 25%-of-cells dial (above
    the auto √cells probe), and (c) STRICTLY improve recall@10 over the
    default dial through a real ``ivfpq_search`` — the branch the r14
    suite left to the bench probe. Fully deterministic: seeded corpus,
    bit-deterministic fit."""
    import math

    import numpy as np
    from pyspark.sql import Window

    n, n_clusters, dim, n_queries, k_at = 3000, 100, 64, 40, 10
    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 0.5, (n_clusters, dim))
    rows = []
    for vid in range(n):
        r = np.random.default_rng(vid * 2654435761 % (2**63) + 17)
        v = centers[vid % n_clusters] + r.normal(0.0, 1.0, dim)
        rows.append((vid, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    index = pq.ivfpq_fit(emb, coarse_k=64)
    assert index.separation is not None
    assert index.separation >= pq.IVFPQ_SEPARATION_ADVISORY  # (a) engaged
    cells = len(index.coarse)
    auto = pq.ivfpq_nprobe_for(cells)
    esc = pq.ivfpq_resolve_nprobe(index, "auto-escalate")
    assert esc == max(auto, math.ceil(pq.IVFPQ_ESCALATE_FRACTION * cells))
    assert esc > auto  # (b) the resolved probe really is the 25% dial

    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("_d2").asc(), F.col("vec_id").asc())
    truth: dict = {}
    for r in (
        F.broadcast(q)
        .join(emb.select("vec_id", "embedding"), F.col("q_vec_id") != F.col("vec_id"))
        .withColumn("_d2", pq._sqdist_vec(F.col("q_emb"), F.col("embedding")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k_at)
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"))
        .collect()
    ):
        truth.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    denom = sum(len(v) for v in truth.values())

    def _recall(nprobe) -> float:
        got: dict = {}
        for r in pq.ivfpq_search(corpus, q, index, k=k_at, nprobe=nprobe).collect():
            got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        return sum(len(truth[qid] & got.get(qid, set())) for qid in truth) / denom

    recall_default = _recall(None)
    recall_escalated = _recall("auto-escalate")
    corpus.unpersist()
    assert recall_escalated > recall_default  # (c) escalation buys recall


def test_auto_escalate_search_matches_default_at_fixture_scale(spark, ivfpq_index):
    # at the 8-cell fixture geometry the escalated count equals the auto
    # floor, so the search (and its SQL twin render) must be unchanged —
    # the fixture/oracle-invariance half of the escalation contract
    import dataclasses

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.sources.tables import load_table

    hot = dataclasses.replace(ivfpq_index, separation=0.99)
    assert pq.ivfpq_resolve_nprobe(hot, "auto-escalate") == pq.ivfpq_resolve_nprobe(hot, None)
    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), hot)
    q = emb.filter(F.col("vec_id") < pq.PQ_N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    a = sorted(map(tuple, pq.ivfpq_search(corpus, q, hot).collect()))
    b = sorted(map(tuple, pq.ivfpq_search(corpus, q, hot, nprobe="auto-escalate").collect()))
    assert a == b
    assert pq.ivfpq_search_sql(hot) == pq.ivfpq_search_sql(hot, nprobe="auto-escalate")
