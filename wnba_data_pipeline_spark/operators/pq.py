"""Product quantization (PQ) for the embeddings corpus — codebook training,
vector encoding, reconstruction, and asymmetric-distance (ADC) top-k search.

Why this exists at 100 TB: a 64-dim float32 embedding is 256 bytes; its PQ
code at m=8 subspaces × 4 bits is 4 bytes — a 64× storage/scan compression.
The production posture is the FAISS/IVF-ADC one (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public method):
train sub-codebooks ONCE on a hash sample, encode the full corpus in a
single zero-shuffle map pass, store codes next to ids, and answer top-k
queries by scanning CODES (4 bytes/vector) with a per-query lookup table
instead of raw vectors (256 bytes/vector). The reference pipeline has no
embedding surface at all (its numeric feature work stops at scaling,
``ml_feature_prep.py``); this module extends the similarity family
(``similarity.py``) the brief's LLM-pipeline mandate adds.

Structure:
- ``pq_fit`` — m independent sub-quantizer k-means fits (reusing
  ``clustering.kmeans_fit`` on 8-dim slices with per-subspace seed tags);
  training cost is m × max_iter passes over the TRAINING SAMPLE (pass
  ``sample_mod`` — at 100 TB you train on ~1M hash-sampled rows, never the
  corpus), while the corpus itself is touched exactly once, by encode.
- ``pq_encode`` — codes column via unrolled JVM fold expressions (small
  ksub; zero Python) or an Arrow-batched numpy argmin (``path="pandas"``),
  bit-identical by the same association/tie-break contract as
  ``clustering.assign_clusters``.
- ``pq_decode_col`` — reconstruction expression (codebook row lookup +
  flatten), for reconstruction-error audits.
- ``pq_adc_topk`` — per-query m×ksub distance lookup table built as
  literal-free in-plan expressions, broadcast against the codes scan;
  approximate distance = sum of m table lookups; top-k via the same
  TakeOrdered/window shape as ``q_sim_topk``.

Cross-engine determinism: sub-distances are the same 0.0-seeded left folds
as ``clustering._sqdist`` (element order is the contract), argmin is
first-min (``array_position`` ≡ DuckDB ``list_position``), and the post-fit
SQL twins (``pq_encode_sql``, ``pq_adc_topk_sql``) embed the fitted
codebooks as literals — float repr round-trips exactly, so codes and ADC
ranks cannot diverge between engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .clustering import KMeansModel, _sqdist, _sqdist_sql, kmeans_fit
from .similarity import DIM

PQ_M = 8  # subspaces
PQ_DSUB = DIM // PQ_M  # dims per subspace
PQ_KSUB = 16  # codewords per subspace → 4-bit codes, 64× vs float32
PQ_ITERS = 4
PQ_TOP_K = 3
PQ_N_QUERIES = 10


@dataclass
class PQModel:
    codebooks: list[list[list[float]]]  # m × ksub × dsub
    sub_models: list[KMeansModel]  # per-subspace fit metadata

    @property
    def m(self) -> int:
        return len(self.codebooks)

    @property
    def dsub(self) -> int:
        return len(self.codebooks[0][0])


def _pq_partials_fn(codebooks: list, active: list[bool], vec_col: str, dsub: int):
    """mapInPandas generator for the FUSED sub-fit iteration: one pass over
    the (sampled) training frame computes, for every still-active subspace,
    the numpy assignment and the per-cluster INTEGER partial sums of the
    fixed-point quantized components/inertia. Integer addition is exactly
    associative, so the cross-batch decimal totals — and with them every
    centroid — are bit-identical to the r12 per-subspace fits
    (differential-tested in tests/test_pq.py).

    Kernel choice mirrors the opt-out reference arm (round 14, ADVICE
    r13): at ``ksub <= KM_EXPR_MAX_K`` (every fixture/oracle — the default
    ksub is 16) the left-fold association reproduces the expression path
    bit-for-bit BY CONSTRUCTION; above it the reference arm
    (``SPARK_GRAFT_FIT_FUSED=0`` → ``kmeans_fit``) would itself run the
    gemm kernel, so this path engages the same expanded-form BLAS kernel
    under the same ``_fit_matmul_enabled`` dial (identity there is
    MEASURED, canary-tested like ``_batch_partials_fn``'s, not
    structural)."""
    import numpy as np

    from .clustering import KM_EXPR_MAX_K, _fit_matmul_enabled

    # captured at plan build, driver-side — same discipline as
    # _batch_partials_fn; gemm only above the expression-k bound so the
    # small-ksub equality contract stays structural
    matmul = _fit_matmul_enabled() and len(codebooks[0]) > KM_EXPR_MAX_K

    def partials(batches):
        import pandas as pd

        from .clustering import COMP_SCALE, INERTIA_SCALE

        Cs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            frames = []
            for j, C in enumerate(Cs):
                if not active[j]:
                    continue
                S = np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub])
                ST = np.ascontiguousarray(S.T)
                CT = np.ascontiguousarray(C.T)
                if matmul:
                    # expanded form ||s−c||² = ||c||² − 2 s·c (+ ||s||²,
                    # added after the argmin) — same kernel as
                    # _batch_assign_fn/_batch_partials_fn's gemm arm
                    c2 = (C * C).sum(axis=1)
                    D = c2[None, :] - 2.0 * (S @ CT)
                else:
                    D = np.zeros((len(S), len(C)))
                    for d in range(dsub):  # left-fold association
                        diff = ST[d][:, None] - CT[d][None, :]
                        D += diff * diff
                cl = D.argmin(axis=1)  # first-min ≡ array_position
                mind = D[np.arange(len(S)), cl]
                if matmul:  # restore the true distance (clamp round-off)
                    mind = np.maximum(mind + (S * S).sum(axis=1), 0.0)
                SV = np.floor(S * COMP_SCALE + 0.5).astype(np.int64)
                SI = np.floor(mind * INERTIA_SCALE + 0.5).astype(np.int64)
                order = np.argsort(cl, kind="stable")
                cls = cl[order]
                uniq, starts = np.unique(cls, return_index=True)
                sums = np.add.reduceat(SV[order], starts, axis=0)
                inert = np.add.reduceat(SI[order], starts)
                counts = np.diff(np.append(starts, len(cls)))
                row = {
                    "_j": np.full(len(uniq), j, dtype=np.int32),
                    "_cl": uniq.astype(np.int32),
                    "_n": counts.astype(np.int64),
                    "_inert": inert,
                }
                for i in range(dsub):
                    row[f"_s{i}"] = sums[:, i]
                frames.append(pd.DataFrame(row))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return partials


def pq_fit_fused(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    max_iter: int = PQ_ITERS,
    sample_mod: int = 1,
    timings: dict | None = None,
) -> PQModel:
    """The fused twin of :func:`pq_fit` (round 13, VERDICT r12 item 2):
    the r12 path launches m×(seed + iterations) SEPARATE Spark jobs — at
    the 1 M-vector auto geometry the 8 sub-fits' 32 interpreted-expression
    iteration jobs over the ~333 k-row residual sample were a first-order
    term of the 532.8 s fit wall. This path keeps the m seed picks (tiny
    TakeOrdered jobs, exact same plan per subspace) but runs each Lloyd
    ITERATION for all still-active subspaces in ONE Arrow pass emitting
    per-cluster integer partial sums (``_pq_partials_fn``), so an
    iteration costs one scan of the sample instead of m.

    Bit-identity: seeds are the same per-subspace hash TakeOrdered; the
    numpy assignment shares the expression path's association/tie-break
    contract (pinned); fixed-point partials are integer-associative; empty
    clusters keep their previous centroid; per-subspace convergence
    deactivates that subspace exactly where its standalone fit would have
    stopped. Codebooks AND KMeansModel metadata (n_iter, inertia history,
    sizes, converged) are therefore equal by construction — asserted
    exactly in tests/test_pq.py and fingerprint-checked at 1 M vectors in
    BENCH_SCALE_r13 fit_opt_ab."""
    import time as _time

    from ..functions.hashing import md5_long
    from .clustering import COMP_SCALE, INERTIA_SCALE, KMeansModel

    dsub = DIM // m
    base = (
        df
        if sample_mod <= 1
        else df.filter(
            md5_long(F.concat(F.lit("kms:"), F.col(id_col).cast("string"))) % sample_mod == 0
        )
    )
    # same sampled-frame persist as kmeans_fit's (round 13): the m seed
    # picks + every fused iteration re-read it. Skipped when the caller —
    # ivfpq_fit — already persisted the residual sample upstream: a second
    # persist of the filtered copy duplicates the cache AND pays a fresh
    # materialization pass (measured as a 20 s sub_seed_sec term in the
    # shipped fit_attrib; the filter-over-cache reads are cheap).
    persisted_base = None
    if sample_mod > 1 and not df.is_cached:
        persisted_base = base.persist()
        base = persisted_base
    # released even when a seed pick or an iteration job raises
    # (ADVICE r13 — same contract as kmeans_fit's)
    try:

        _t0 = _time.perf_counter()

        def _mark(key: str) -> None:
            nonlocal _t0
            if timings is not None:
                timings[key] = round(timings.get(key, 0.0) + _time.perf_counter() - _t0, 3)
            _t0 = _time.perf_counter()

        # per-subspace seeds: the exact kmeans_fit seed plan on the slice frame
        centroids: list[list[list[float]]] = []
        for j in range(m):
            seed_rows = (
                base.select(
                    F.col(id_col).alias("_sid"),
                    F.slice(F.col(vec_col), j * dsub + 1, dsub)
                    .cast("array<double>")
                    .alias("_semb"),
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"pq{j}:"), F.col(id_col).cast("string"))), 1, 15
                        ),
                        16,
                        10,
                    )
                    .cast("long")
                    .alias("_h"),
                )
                .orderBy("_h", "_sid")
                .limit(ksub)
                .collect()
            )
            cb = [[float(x) for x in r["_semb"]] for r in seed_rows]
            if len(cb) < ksub:
                raise ValueError(f"corpus has only {len(cb)} rows; need k={ksub} seeds")
            centroids.append(cb)
        _mark("sub_seed_sec")

        active = [True] * m
        n_iter = [0] * m
        inertia: list[list[float]] = [[] for _ in range(m)]
        sizes: list[dict[int, int]] = [{} for _ in range(m)]
        converged = [False] * m
        schema = "_j int, _cl int, _n long, _inert long, " + ", ".join(
            f"_s{i} long" for i in range(dsub)
        )
        for _ in range(max_iter):
            if not any(active):
                break
            partial = base.select(F.col(vec_col).cast("array<double>").alias("_v")).mapInPandas(
                _pq_partials_fn(centroids, list(active), "_v", dsub), schema
            )
            rows_all: dict[int, dict[int, object]] = {}
            for r in (
                partial.groupBy("_j", "_cl")
                .agg(
                    F.sum("_n").alias("_n"),
                    F.sum(F.col("_inert").cast("decimal(38,0)")).alias("_inert"),
                    *[
                        F.sum(F.col(f"_s{i}").cast("decimal(38,0)")).alias(f"_s{i}")
                        for i in range(dsub)
                    ],
                )
                .collect()
            ):
                rows_all.setdefault(r["_j"], {})[r["_cl"]] = r
            _mark("sub_iter_sec")
            for j in range(m):
                if not active[j]:
                    continue
                rows = rows_all.get(j, {})
                n_iter[j] += 1
                sizes[j] = {c: int(rows[c]["_n"]) for c in rows}
                inertia[j].append(
                    sum(int(r["_inert"]) for r in rows.values()) / INERTIA_SCALE
                )
                new_cb = []
                for c, old in enumerate(centroids[j]):
                    r = rows.get(c)
                    if r is None:  # empty cluster: keep the previous centroid
                        new_cb.append(old)
                        continue
                    n = int(r["_n"])
                    new_cb.append(
                        [float(int(r[f"_s{i}"])) / (COMP_SCALE * n) for i in range(dsub)]
                    )
                if new_cb == centroids[j]:
                    converged[j] = True
                    active[j] = False
                else:
                    centroids[j] = new_cb

    finally:
        if persisted_base is not None:
            persisted_base.unpersist()
    subs = [
        KMeansModel(centroids[j], n_iter[j], inertia[j], sizes[j], converged[j])
        for j in range(m)
    ]
    return PQModel([s.centroids for s in subs], subs)


def _pq_fused_enabled() -> bool:
    """Shares SPARK_GRAFT_FIT_FUSED with the coarse fused iteration —
    one dial for the whole fit path (default ON; see
    ``clustering._fit_fused_enabled``)."""
    import os

    return os.environ.get("SPARK_GRAFT_FIT_FUSED", "1") != "0"


def pq_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    max_iter: int = PQ_ITERS,
    sample_mod: int = 1,
    timings: dict | None = None,
) -> PQModel:
    """Train the m sub-codebooks: subspace j is the Lloyd fit of
    ``vec[j·dsub : (j+1)·dsub]`` with seed tag ``pq{j}`` (so subspaces
    draw different seed rows). Each fit inherits ``kmeans_fit``'s
    determinism contract; ``sample_mod`` is the 100 TB knob — train on the
    hash sample, encode everything. Default path since round 13 is the
    FUSED iteration (one Arrow pass per iteration for all m subspaces —
    bit-identical, see :func:`pq_fit_fused`); ``SPARK_GRAFT_FIT_FUSED=0``
    opts back to the m independent ``kmeans_fit`` calls."""
    if _pq_fused_enabled() and m > 1:
        return pq_fit_fused(
            df,
            id_col=id_col,
            vec_col=vec_col,
            m=m,
            ksub=ksub,
            max_iter=max_iter,
            sample_mod=sample_mod,
            timings=timings,
        )
    dsub = DIM // m
    codebooks, subs = [], []
    for j in range(m):
        sub_t: dict = {}
        sub = df.select(
            F.col(id_col), F.slice(F.col(vec_col), j * dsub + 1, dsub).alias("_sub")
        )
        fitted = kmeans_fit(
            sub,
            id_col=id_col,
            vec_col="_sub",
            k=ksub,
            max_iter=max_iter,
            sample_mod=sample_mod,
            seed_tag=f"pq{j}",
            timings=sub_t,
        )
        codebooks.append(fitted.centroids)
        subs.append(fitted)
        if timings is not None:
            for key, v in sub_t.items():
                timings[f"sub_{key}"] = round(timings.get(f"sub_{key}", 0.0) + v, 3)
    return PQModel(codebooks, subs)


def _sqdist_vec(a: Column, b: Column) -> Column:
    """Exact squared L2 between two vector COLUMNS (vs ``clustering._sqdist``
    which takes a literal centroid) — the ground truth the recall gate
    scores ADC against."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _code_col(vec: Column, codebook: list[list[float]], j: int, dsub: int) -> Column:
    """Sub-code for subspace j: first-min argmin over the ksub codewords of
    the 0.0-seeded fold distance on the slice."""
    sub = F.slice(vec, j * dsub + 1, dsub)
    dists = F.array(*[_sqdist(sub, c) for c in codebook])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_encode(
    df: DataFrame,
    model: PQModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "codes",
    path: str | None = None,
) -> DataFrame:
    """Append the ``array<int>`` PQ code column — a zero-shuffle map either
    way. ``path="expr"`` unrolls m×ksub fold chains (right at ksub≤64,
    zero Python); ``path="pandas"`` is the Arrow-batched numpy argmin for
    production codebooks (ksub=256 bytes-codes and up), bit-identical by
    the shared association/tie-break contract; None switches on the
    UNROLLED TERM COUNT (m×ksub×dsub) against the same budget
    ``clustering.assign_clusters`` uses — round 15: the old ksub-only
    gate kept the m=8 × ksub=16 × dsub=8 = 1 024-term fold chain on the
    expression path, which costs ~0.9 ms/row interpreted (measured
    1.9 s vs 0.33 s for the Arrow pass on 2 000 sf0.1 rows, codes
    bit-identical — expr≡pandas equality pinned in tests/test_pq.py)."""
    if path is None:
        from .clustering import KM_EXPR_TERM_BUDGET

        ksub = len(model.codebooks[0])
        terms = len(model.codebooks) * ksub * model.dsub
        path = "expr" if (ksub <= 64 and terms <= KM_EXPR_TERM_BUDGET) else "pandas"
    if path == "expr":
        dsub = model.dsub
        codes = F.array(
            *[_code_col(F.col(vec_col), cb, j, dsub) for j, cb in enumerate(model.codebooks)]
        )
        return df.withColumn(out_col, codes)
    if path != "pandas":
        raise ValueError(f"unknown encode path: {path!r}")
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    codebooks, dsub = model.codebooks, model.dsub

    def encode(batches):
        C = [np.asarray(cb, dtype=np.float64) for cb in codebooks]  # m × ksub × dsub
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.zeros((len(X), len(C)), dtype=np.int32)
            for j, Cj in enumerate(C):
                S = X[:, j * dsub : (j + 1) * dsub]
                D = np.zeros((len(S), len(Cj)))
                for d in range(dsub):  # left-fold association (see module doc)
                    diff = S[:, d, None] - Cj[None, :, d]
                    D += diff * diff
                codes[:, j] = D.argmin(axis=1)  # first-min ≡ array_position
            out = pdf.copy()
            out[out_col] = list(codes)
            yield out

    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, ArrayType(IntegerType()))])
    return df.mapInPandas(encode, out_schema)


def pq_decode_col(codes: Column, model: PQModel) -> Column:
    """Reconstruction expression: codebook-row lookup per subspace, then
    flatten back to a DIM-length array<double> — the audit path for
    quantization error (never needed by search, which works on codes)."""
    rows = [
        F.element_at(
            F.array(*[F.array(*[F.lit(x) for x in word]) for word in cb]),
            F.element_at(codes, j + 1) + F.lit(1),
        )
        for j, cb in enumerate(model.codebooks)
    ]
    return F.flatten(F.array(*rows))


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    model: PQModel,
    *,
    id_col: str = "vec_id",
    q_id_col: str = "q_vec_id",
    q_vec_col: str = "q_emb",
    codes_col: str = "codes",
    k: int = PQ_TOP_K,
) -> DataFrame:
    """Asymmetric-distance top-k: each query row grows an in-plan m×ksub
    lookup table (exact fold distances from its sub-vectors to every
    codeword — computed ONCE per query, not per pair), the tiny query side
    broadcasts against the codes scan, and the approximate distance is m
    array lookups per corpus row. Scan cost is the CODES column only —
    at 100 TB that is the 64×-compressed table, the whole point.
    Ties break on neighbor id; output mirrors ``q_sim_topk``'s shape."""
    dsub = model.dsub
    lut = F.array(
        *[
            F.array(*[_sqdist(F.slice(F.col(q_vec_col), j * dsub + 1, dsub), w) for w in cb])
            for j, cb in enumerate(model.codebooks)
        ]
    )
    q = queries.select(F.col(q_id_col), lut.alias("_lut"))
    adist = None
    for j in range(model.m):
        term = F.element_at(
            F.element_at("_lut", j + 1), F.element_at(codes_col, j + 1) + F.lit(1)
        )
        adist = term if adist is None else adist + term
    pairs = (
        F.broadcast(q)
        .join(corpus_codes, F.col(q_id_col) != F.col(id_col))
        .withColumn("_adist", adist)
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("_adist").asc(), F.col(id_col).asc())
    return (
        pairs.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select(
            q_id_col,
            F.col(id_col).alias("n_vec_id"),
            F.round(F.col("_adist"), 6).alias("adist"),
            F.col("nn_rank").cast("long").alias("nn_rank"),
        )
    )


# ADC shortlist size feeding the exact re-rank. 50 of the 500-row driver
# corpus reads large (10%), deliberately: these synthetic embeddings are
# near-uniform, so L2 distances concentrate and a coarse-code shortlist
# needs a thick margin (measured recall@3: R=20 → 0.67, R=50 → 0.90).
# On clustered real-world embeddings the required R/N ratio falls with
# corpus size (the gap between true neighbors and the bulk widens), so the
# production knob stays small relative to N — R is a recall/IO dial, not a
# fixed fraction.
PQ_RERANK = 50


def pq_search_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    model: PQModel,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_vec_id",
    q_vec_col: str = "q_emb",
    codes_col: str = "codes",
    k: int = PQ_TOP_K,
    rerank: int = PQ_RERANK,
    corpus_raw: DataFrame | None = None,
) -> DataFrame:
    """The production PQ search: ADC over codes SHORTLISTS ``rerank``
    candidates per query (compressed-domain scan — the 100 TB pass), then
    only those queries×rerank rows fetch their raw vectors for an exact-L2
    re-rank to top-k. Raw vectors are touched for R rows per query instead
    of the whole corpus — the standard recall repair for coarse (4-bit)
    codes, and the shape FAISS calls IndexPQ + reconstruct re-rank.
    ``corpus`` must carry id, raw vector, and codes columns.

    ``corpus_raw`` (round 15, optimization): same contract as
    ``ivfpq_search`` — the fetch branch needs only (id, raw vector), and
    fetching from the encoded frame re-ran the whole encode subplan a
    second time (no cross-branch CSE). Values identical (encode passes
    input columns through untouched); defaults to ``corpus``."""
    shortlist = pq_adc_topk(
        corpus.select(id_col, codes_col),
        queries,
        model,
        id_col=id_col,
        q_id_col=q_id_col,
        q_vec_col=q_vec_col,
        codes_col=codes_col,
        k=rerank,
    ).select(q_id_col, "n_vec_id")
    fetch_side = corpus if corpus_raw is None else corpus_raw
    cand = shortlist.join(
        fetch_side.select(F.col(id_col).alias("n_vec_id"), F.col(vec_col).alias("_n_emb")),
        "n_vec_id",
    ).join(F.broadcast(queries.select(q_id_col, q_vec_col)), q_id_col)
    w = Window.partitionBy(q_id_col).orderBy(F.col("_d2").asc(), F.col("n_vec_id").asc())
    return (
        cand.withColumn("_d2", _sqdist_vec(F.col(q_vec_col), F.col("_n_emb")))
        .withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select(
            q_id_col,
            "n_vec_id",
            F.round(F.col("_d2"), 6).alias("d2"),
            F.col("nn_rank").cast("long").alias("nn_rank"),
        )
    )


def q_pq_rerank(spark, sf_dir: str, *, model: PQModel | None = None) -> DataFrame:
    """ADC-shortlist + exact-rerank search over the embeddings table (the
    recall-bearing variant of ``q_pq_topk``)."""
    from ..sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    if model is None:
        model = pq_fit(emb)
    corpus = pq_encode(emb.select("vec_id", "embedding"), model)
    q = emb.filter(F.col("vec_id") < PQ_N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    # re-rank fetch from the raw table — keeps the encode expression out
    # of the fetch branch (see pq_search_rerank's corpus_raw note)
    return pq_search_rerank(corpus, q, model, corpus_raw=emb.select("vec_id", "embedding"))


def q_pq_topk(spark, sf_dir: str, *, model: PQModel | None = None) -> DataFrame:
    """End-to-end PQ search over the embeddings table: fit (if no model is
    passed), encode the corpus, ADC top-3 for the first 10 vectors —
    the compressed-domain twin of ``q_sim_topk`` (whose exact ranks the
    recall test scores this against)."""
    from ..sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    if model is None:
        model = pq_fit(emb)
    codes = pq_encode(emb.select("vec_id", "embedding"), model).select("vec_id", "codes")
    q = emb.filter(F.col("vec_id") < PQ_N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    return pq_adc_topk(codes, q, model)


# ---------------------------------------------------------------------------
# post-fit DuckDB twins — fitted codebooks embedded as literals
# ---------------------------------------------------------------------------


def _sqdist_sql_slice(v: str, codeword: list[float], offset: int) -> str:
    """``_sqdist_sql`` against ``v[offset+1 : offset+dsub]`` without
    materializing the slice — unrolled, same association as the fold."""
    terms = [
        f"((CAST({v}[{offset + i + 1}] AS DOUBLE) - ({c!r})) * (CAST({v}[{offset + i + 1}] AS DOUBLE) - ({c!r})))"
        for i, c in enumerate(codeword)
    ]
    return "(" + " + ".join(terms) + ")"


def pq_encode_sql(model: PQModel) -> str:
    """codes for every row of the ``embeddings`` view, given the fitted
    codebooks (list_position ≡ first-min argmin, matching
    ``F.array_position``)."""
    dsub = model.dsub
    code_exprs = []
    for j, cb in enumerate(model.codebooks):
        dl = ", ".join(_sqdist_sql_slice("embedding", w, j * dsub) for w in cb)
        code_exprs.append(
            f"(list_position(dl{j}, list_min(dl{j})) - 1)"
        )
    dls = ", ".join(
        "list_value("
        + ", ".join(_sqdist_sql_slice("embedding", w, j * dsub) for w in cb)
        + f") AS dl{j}"
        for j, cb in enumerate(model.codebooks)
    )
    codes = ", ".join(code_exprs)
    return f"""
WITH dists AS (
  SELECT vec_id, {dls} FROM embeddings
)
SELECT vec_id, [{codes}] AS codes FROM dists
"""


def pq_adc_topk_sql(model: PQModel, *, k: int = PQ_TOP_K, n_queries: int = PQ_N_QUERIES) -> str:
    """ADC top-k twin: recompute codes (same SQL as ``pq_encode_sql``),
    build each query's lookup table, rank by the summed lookups."""
    dsub = model.dsub
    dls = ", ".join(
        "list_value("
        + ", ".join(_sqdist_sql_slice("embedding", w, j * dsub) for w in cb)
        + f") AS dl{j}"
        for j, cb in enumerate(model.codebooks)
    )
    luts = ", ".join(
        "list_value("
        + ", ".join(_sqdist_sql_slice("q_emb", w, j * dsub) for w in cb)
        + f") AS lut{j}"
        for j, cb in enumerate(model.codebooks)
    )
    adist = " + ".join(
        f"q.lut{j}[c.codes[{j + 1}] + 1]" for j in range(model.m)
    )
    return f"""
WITH dists AS (
  SELECT vec_id, {dls} FROM embeddings
), codes AS (
  SELECT vec_id, [{", ".join(f"(list_position(dl{j}, list_min(dl{j})) - 1)" for j in range(model.m))}] AS codes
  FROM dists
), q AS (
  SELECT vec_id AS q_vec_id, {luts}
  FROM (SELECT vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries})
), pairs AS (
  SELECT q.q_vec_id, c.vec_id AS n_vec_id, {adist} AS adist
  FROM q JOIN codes c ON q.q_vec_id <> c.vec_id
)
SELECT q_vec_id, n_vec_id, round(adist, 6) AS adist, CAST(nn_rank AS BIGINT) AS nn_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_vec_id ORDER BY adist ASC, n_vec_id ASC) AS nn_rank
  FROM pairs
) WHERE nn_rank <= {k}
"""


def _sqdist_vec_sql(a: str, b: str) -> str:
    """DuckDB twin of ``_sqdist_vec`` (fold over zipped components)."""
    return (
        f"list_sum(list_transform(range(len({a})), i -> "
        f"(CAST({a}[i+1] AS DOUBLE) - CAST({b}[i+1] AS DOUBLE)) * "
        f"(CAST({a}[i+1] AS DOUBLE) - CAST({b}[i+1] AS DOUBLE))))"
    )


def pq_rerank_sql(
    model: PQModel, *, k: int = PQ_TOP_K, rerank: int = PQ_RERANK, n_queries: int = PQ_N_QUERIES
) -> str:
    """Twin of ``pq_search_rerank``: ADC shortlist of ``rerank`` ids per
    query, exact-L2 re-rank to top-k. (list_sum of doubles can associate
    differently than the Spark fold, but the re-rank compares EXACT
    distances whose ordering is insensitive to sub-ulp association noise
    on this corpus — parity is still checked value-exactly because both
    engines round to 6dp after identical-magnitude sums.)"""
    dsub = model.dsub
    dls = ", ".join(
        "list_value("
        + ", ".join(_sqdist_sql_slice("embedding", w, j * dsub) for w in cb)
        + f") AS dl{j}"
        for j, cb in enumerate(model.codebooks)
    )
    luts = ", ".join(
        "list_value("
        + ", ".join(_sqdist_sql_slice("q_emb", w, j * dsub) for w in cb)
        + f") AS lut{j}"
        for j, cb in enumerate(model.codebooks)
    )
    adist = " + ".join(f"q.lut{j}[c.codes[{j + 1}] + 1]" for j in range(model.m))
    d2 = _sqdist_vec_sql("q.q_emb", "e.embedding")
    return f"""
WITH dists AS (
  SELECT vec_id, {dls} FROM embeddings
), codes AS (
  SELECT vec_id, [{", ".join(f"(list_position(dl{j}, list_min(dl{j})) - 1)" for j in range(model.m))}] AS codes
  FROM dists
), qraw AS (
  SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}
), q AS (
  SELECT q_vec_id, {luts} FROM qraw
), shortlist AS (
  SELECT q_vec_id, n_vec_id FROM (
    SELECT q.q_vec_id, c.vec_id AS n_vec_id,
           row_number() OVER (PARTITION BY q.q_vec_id
                              ORDER BY {adist} ASC, c.vec_id ASC) AS rk
    FROM q JOIN codes c ON q.q_vec_id <> c.vec_id
  ) WHERE rk <= {rerank}
)
SELECT q_vec_id, n_vec_id, round(d2, 6) AS d2, CAST(nn_rank AS BIGINT) AS nn_rank
FROM (
  SELECT s.q_vec_id, s.n_vec_id, {d2} AS d2,
         row_number() OVER (PARTITION BY s.q_vec_id ORDER BY {d2} ASC, s.n_vec_id ASC) AS nn_rank
  FROM shortlist s
  JOIN embeddings e ON s.n_vec_id = e.vec_id
  JOIN qraw q ON s.q_vec_id = q.q_vec_id
) WHERE nn_rank <= {k}
"""


def oracle_pq_rerank(sf_name: str = "sf0.01") -> str:
    """Static driver oracle for ``pq_rerank``: the post-fit DuckDB twin
    rendered from the checked-in fitted sub-codebooks for ``sf_name``
    (``_pq_codebooks.py``, generated by tools/gen_pq_oracle.py). Valid
    because each sub-quantizer fit is bit-deterministic on a fixed sf dir
    — exact-equality-guarded in tests/test_pq.py, so the literals can only
    go stale together with a failing test (same contract as
    ``clustering.oracle_semantic_dedup``)."""
    from ._pq_codebooks import CODEBOOKS_BY_SF

    return pq_rerank_sql(PQModel(CODEBOOKS_BY_SF[sf_name], []))


# ---------------------------------------------------------------------------
# IVF-PQ — coarse cells + within-cell ADC + exact rerank (the composed stack)
# ---------------------------------------------------------------------------

IVFPQ_COARSE_K = 8  # coarse-cell FLOOR (the fixed count through round 10)
IVFPQ_NPROBE = 2  # probe FLOOR per query (the fixed count through round 10)

# Geometry scaling (round 11 — the sf100 ANN measurement, BENCH_SCALE_r11
# ann100): a FIXED 8-cell coarse quantizer does not scale. At 2 M vectors
# each cell held ~250 k rows, nprobe=2 probed 25% OF THE CORPUS per query
# and recall@10 was still 0.505 — a pure COVERAGE loss (the auto-rerank
# shortlist exact-reranks 100 k rows, so ADC ranking noise is not the
# term): with 8 giant cells the true neighbors simply live outside the 2
# probed cells half the time. The standard cure (FAISS: nlist ≈ 4√n) is
# MORE, SMALLER cells — fine granularity puts a query's true neighbors
# into its nearest cells — with nprobe growing ~√cells so probed work per
# query scales ~n^(1/2+1/4), not ~n. Both dials resolve from the fit
# corpus size ONLY (deterministic; the static oracles render the same
# literals), floored at the round-10 constants so every corpus at or
# below the driver scales keeps its exact fixture geometry.
FARTHEST_INIT_MAX_K = 64  # Gonzalez is O(k²·n) — a structure claim for
# small-k clustered fits (the round-10 flip); beyond this, cells are a
# partition dial and hash seeding is the amortizable init (same split the
# semantic-cell fits use)


def ivfpq_cells_for(n: int) -> int:
    """Coarse cell count for an n-vector corpus: 4√n (FAISS's nlist rule)
    capped at n/64 (cells need enough rows to be worth a probe) and
    floored at the legacy constant (≤ ~3.7 k vectors resolve to exactly
    IVFPQ_COARSE_K, so the sf0.01 driver fixtures are untouched)."""
    import math

    return max(IVFPQ_COARSE_K, min(4 * math.isqrt(max(n, 1)), n // 64))


def ivfpq_nprobe_for(cells: int) -> int:
    """Probes per query: the legacy constant at the legacy cell count,
    √cells beyond it (probed fraction shrinks as the index grows while
    absolute coverage rises — the standard recall/cost balance)."""
    import math

    if cells <= IVFPQ_COARSE_K:
        return IVFPQ_NPROBE
    return max(4, math.isqrt(cells))


def ivfpq_fit_sample_mod(n: int, cells: int) -> int:
    """Auto training-sample gate: ~64 points per cell with a 10 k floor —
    resolves to 1 (full fit) at every fixture scale, and keeps the Lloyd
    cost ~O(cells × sample) instead of O(cells × n) at corpus scale."""
    target = max(10_000, 64 * cells)
    return max(1, n // target)
IVFPQ_RERANK = 50  # ADC-shortlist FLOOR per query feeding the exact re-rank
# rerank="auto" (the round-10 default): shortlist = max(IVFPQ_RERANK,
# ceil(FRACTION x expected probed candidates)). A 4-bit ADC distance
# carries noise on the order of the quantization error, so the number of
# true neighbors it misplaces grows with the CANDIDATE LIST, not with k —
# a constant-count shortlist that works at 200 probed rows is chance-level
# at 5000 (measured: recall@10 0.33 at rerank=50 vs 0.85 at rerank=500 on
# the 20k clustered probe, BENCH_SCALE_r09 ivfpq_clustered). 20% is the
# measured-sufficient fraction: on the tight 2000-doc/4-cluster pytest
# corpus the sweep reads 0.72 / 0.825 / 0.895 recall@10 at fractions
# 0.1 / 0.15 / 0.2 — the extra shortlist rows cost only exact-rerank
# fetches (rerank ≪ probed list), the right spend for an index whose job
# is recall. At the driver's sf0.01 the fraction resolves BELOW the
# floor, so the oracle literal stays 50.
IVFPQ_RERANK_FRACTION = 0.2


@dataclass
class IVFPQIndex:
    """A trained IVF-PQ index: coarse k-means centroids (the inverted-list
    partitioner) + the PQ sub-codebooks (the in-list compressor).
    ``by_residual`` records which variant the codebooks were TRAINED for —
    encode and search must agree with it, so it travels with the index."""

    coarse: list[list[float]]  # coarse_k × DIM
    pq: PQModel
    by_residual: bool = False
    # fit-corpus size — the statistic rerank="auto" scales the ADC
    # shortlist by (None on hand-built indexes → the constant floor)
    n_vectors: int | None = None
    # coarse-fit separation statistic: final pre-update inertia / total SS
    # of the fit sample about its global mean (round 13 — see
    # IVFPQ_SEPARATION_ADVISORY). →1 means the cells explain almost none
    # of the variance (isotropic-like geometry); →0 means widely separated
    # clusters. None on hand-built indexes.
    separation: float | None = None


# Recall-collapse advisory threshold (round 13, VERDICT r12 item 1 — the
# ann_overlap_sweep measurement at 1 M vectors, 4 000 cells, auto
# nprobe=63 ≈ 1.6% probed; σ ∈ {0.6, 0.65} added round 14, VERDICT r13
# item 2 — ann_overlap_knee2, closing the previously unmeasured
# 0.62→0.77 band):
#
#   sigma_c/sigma_noise   separation (inertia/SS)   recall@10
#   0.5                   0.77                      0.35   ← collapse
#   0.6                   0.71                      0.533  ← r14 point
#   0.65                  0.68                      0.671  ← r14 point
#   0.75                  0.62                      0.884  ← the knee
#   1.0                   0.48                      0.999
#   2.0                   0.19                      1.0
#   5.0                   0.04                      1.0
#   (r12 isotropic sf100: separation → 1.0, recall 0.479 at 25% probed)
#
# The 0.7 threshold is CONFIRMED by the r14 points: it sits exactly where
# recall crosses ~0.6 under pure auto dials — at or past it (0.71 →
# 0.533, 0.77 → 0.35) the index has entered the regime where √cells
# probing loses a third or more of the true neighbors; just below it
# (0.68 → 0.671, 0.62 → 0.884) recall climbs steeply toward the healthy
# plateau. Once the coarse cells stop explaining the corpus's variance, a
# query's true neighbors spread near-uniformly across cells and no
# sub-linear nprobe recovers recall — that is coverage physics, not a
# dial defect. The honest production behavior is therefore an ADVISORY,
# not a silent auto-escalation (the repo's committed posture:
# data-dependent switches never silently change values/cost): ivfpq_fit
# logs a warning naming the measured regime and the explicit dials
# (raise nprobe toward cells — linear cost in the probed fraction, curve
# measured in BENCH_SCALE_r14 ann_escalation_sweep and wired into the
# opt-in ``nprobe="auto-escalate"`` mode — or route this corpus to the
# exact / Hamming-rerank baselines, which do not depend on cluster
# structure).
IVFPQ_SEPARATION_ADVISORY = 0.7

# Opt-in escalation fraction for ``nprobe="auto-escalate"`` (round 14,
# VERDICT r13 item 1): the probed fraction the escalated mode resolves to
# when the index's recorded separation is at or past the advisory
# threshold. 0.25 is the measured cost/recall shoulder of the
# BENCH_SCALE_r14 ann_escalation_sweep curve at 1 M vectors / 4 000 cells
# on the collapse-regime corpus (σ_c=0.5, separation 0.77):
#
#   probed frac   recall@10   search wall
#   1.6% (auto)   0.35        ~13 s
#   6%            0.634       26 s
#   12%           0.787       81 s
#   25%           0.927       93 s      ← this dial
#   50%           0.989       203 s
#
# — the last point before the wall doubles for +0.06 recall. NEVER a
# silent default: plain ``nprobe=None`` keeps the auto √cells dial
# everywhere; the escalation engages only when a caller asks for it by
# name.
IVFPQ_ESCALATE_FRACTION = 0.25


def ivfpq_resolve_nprobe(index: "IVFPQIndex", nprobe: int | str | None) -> int:
    """Resolve the ``nprobe`` argument of ``ivfpq_search`` /
    ``ivfpq_search_sql``: an int passes through; ``None`` is the auto
    √cells dial; ``"auto-escalate"`` (round 14, VERDICT r13 item 1) is the
    OPT-IN collapse-regime mode — when the index's recorded fit-time
    separation statistic is ≥ ``IVFPQ_SEPARATION_ADVISORY`` it probes
    ``IVFPQ_ESCALATE_FRACTION`` of the cells instead of √cells, the dial
    the advisory names with the measured curve (BENCH_SCALE_r14
    ann_escalation_sweep); below the threshold — or on a hand-built index
    with no recorded separation — it is exactly the auto dial. Explicitly
    opt-in: cost grows linearly with the probed fraction, so the caller
    chooses it by name, never a data-dependent silent switch."""
    if nprobe is None:
        return ivfpq_nprobe_for(len(index.coarse))
    if nprobe == "auto-escalate":
        import math

        base = ivfpq_nprobe_for(len(index.coarse))
        if index.separation is not None and index.separation >= IVFPQ_SEPARATION_ADVISORY:
            esc = max(base, math.ceil(IVFPQ_ESCALATE_FRACTION * len(index.coarse)))
            import logging

            logging.getLogger(__name__).info(
                "nprobe='auto-escalate': recorded separation %.2f >= %.2f — "
                "probing %d of %d cells (%.0f%%) instead of the auto %d "
                "(measured curve: BENCH_SCALE_r14 ann_escalation_sweep)",
                index.separation,
                IVFPQ_SEPARATION_ADVISORY,
                esc,
                len(index.coarse),
                100.0 * esc / len(index.coarse),
                base,
            )
            return esc
        return base
    return int(nprobe)


def _residual_col(vec: Column, centroids: list[list[float]], cell: Column) -> Column:
    """``vec - centroids[cell]`` as an in-plan expression (centroid table as
    a literal array-of-arrays, one element_at lookup, one zip_with). IEEE
    double subtraction — bit-identical between the JVM and the numpy
    reference, so the residual variant keeps the fit/encode determinism
    contract.

    Scale bound: the literal table is cells × dim expression NODES, and a
    consumer like the search LUT duplicates it into every distance term —
    fine at the fixture scales (8–31 cells), catastrophic at the round-11
    auto geometry (5 656 cells → ~46 M analyzer nodes). Callers go through
    :func:`_residual_any` which switches to the Arrow path above
    ``clustering.KM_EXPR_MAX_K`` — identical doubles (same single IEEE
    subtraction in numpy), differential-tested in tests/test_pq.py."""
    table = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    cent = F.element_at(table, cell + F.lit(1))
    return F.zip_with(vec, cent, lambda a, b: a.cast("double") - b)


def _residual_udf(centroids: list[list[float]]):
    """Arrow twin of ``_residual_col`` for large cell counts: the centroid
    table lives in the worker closure (bytes, not expression nodes);
    ``X.astype(float64) - C[cells]`` is the same one IEEE subtraction."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)

    def _f(vec, cell):
        X = np.array(vec.tolist(), dtype=np.float64)
        return pd.Series(list(X - C[cell.to_numpy()]))

    return F.pandas_udf(_f, "array<double>")


def _residual_any(vec: Column, centroids: list[list[float]], cell: Column) -> Column:
    """Residual column via the expression path at fixture-scale cell
    counts (plan-identical to every checked-in oracle) or the Arrow path
    above ``KM_EXPR_MAX_K`` (where the literal table would explode the
    analyzer) — same doubles either way."""
    from .clustering import KM_EXPR_MAX_K

    if len(centroids) <= KM_EXPR_MAX_K:
        return _residual_col(vec, centroids, cell)
    return _residual_udf(centroids)(vec, cell)


def ivfpq_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_k: int | None = None,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    max_iter: int = PQ_ITERS,
    sample_mod: int | str = "auto",
    by_residual: bool = True,
    coarse_init: str = "auto",
    timings: dict | None = None,
) -> IVFPQIndex:
    """Train both quantizers (VERDICT r8 item 4 — the composed 100 TB ANN
    stack FAISS spells IVFx,PQy): the coarse Lloyd fit partitions the
    corpus into inverted lists; the PQ fit compresses vectors inside
    them. DEFAULTS (round 10, VERDICT r9 item 1) are FAISS's: residual
    encoding + farthest-point coarse seeding, because they are the only
    combination that serves a CLUSTERED corpus — the geometry an IVF
    index exists for. Raw codebooks spend their ksub codewords encoding
    cluster identity, leaving within-cell margins below quantization
    error (measured chance-level 0.061 recall@10 on the planted clustered
    corpus, BENCH_SCALE_r09 ``ivfpq_clustered``; residual+farthest
    measured 0.94 there); training and encoding on ``x - centroid[cell]``
    removes the macro scale so the codes resolve the within-cell offsets
    search actually ranks, and farthest-point seeding stops Lloyd's from
    merging two true clusters into one cell. On a near-isotropic corpus
    (the driver's synthetic embeddings) the defaults cost nothing —
    recall is statistically unchanged (tests/test_pq.py recall gates).

    The documented opt-out, ``by_residual=False, coarse_init="hash"``, is
    the RE-ENCODE-FRIENDLY variant: residual encoding couples every code
    to its cell's centroid, so a coarse refresh forces a 100 TB corpus
    re-encode, while raw codes survive coarse re-training. Choose it when
    centroid refreshes outpace corpus growth; both variants keep the full
    cross-engine parity contract (``ivfpq_search_sql`` renders either).
    Both fits inherit ``kmeans_fit``'s bit-determinism; ``sample_mod`` is
    the scale knob for both (train on a hash sample, encode everything).

    Round-11 auto geometry: ``coarse_k=None`` resolves to
    ``ivfpq_cells_for(n)``, ``sample_mod="auto"`` to
    ``ivfpq_fit_sample_mod(n, cells)``, and ``coarse_init="auto"`` to
    farthest-point at small k (the clustered-structure claim) or hash
    seeding beyond ``FARTHEST_INIT_MAX_K`` (Gonzalez is O(k²·n)). All
    three resolve to the exact round-10 values at the driver fixture
    scales (n ≤ ~3.7 k → 8 cells, full fit, farthest), so every
    checked-in oracle literal is unchanged by construction."""
    import time as _time

    from .clustering import assign_clusters

    _t0 = _time.perf_counter()

    def _mark(key: str) -> None:
        nonlocal _t0
        if timings is not None:
            timings[key] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()

    n_vectors = df.count()
    _mark("count_sec")
    if coarse_k is None:
        coarse_k = ivfpq_cells_for(n_vectors)
    if sample_mod == "auto":
        sample_mod = ivfpq_fit_sample_mod(n_vectors, coarse_k)
    if coarse_init == "auto":
        coarse_init = "farthest" if coarse_k <= FARTHEST_INIT_MAX_K else "hash"
    coarse_t: dict = {}
    coarse = kmeans_fit(
        df,
        id_col=id_col,
        vec_col=vec_col,
        k=coarse_k,
        max_iter=max_iter,
        sample_mod=sample_mod,
        seed_tag="ivfc",
        init=coarse_init,
        timings=coarse_t,
    )
    if timings is not None:
        timings["coarse_detail"] = coarse_t
        timings["coarse_n_iter"] = coarse.n_iter
        # last pre-update inertia over the fit sample — the separation
        # statistic the r13 overlap sweep records (inertia/total-SS → 1
        # means cells explain nothing, i.e. isotropic geometry)
        timings["coarse_final_inertia"] = coarse.inertia[-1] if coarse.inertia else None
    _mark("coarse_fit_sec")
    # PQ training source: at sample_mod > 1 pre-filter by the SAME kms:
    # hash gate pq_fit's sub-fits apply (idempotent — the inner filter is
    # then a no-op subset), so the residual assignment below runs over the
    # TRAINING SAMPLE, not the corpus. Without this, each of the m
    # subspace fits re-derives the full-corpus assignment + residual from
    # scratch (m × (seed + iters) stages × a 2 M-row pandas argmin at the
    # auto geometry — the stalled-fit shape the sf100 ann probe caught).
    pq_src = df
    if sample_mod > 1:
        from ..functions.hashing import md5_long

        pq_src = df.filter(
            md5_long(F.concat(F.lit("kms:"), F.col(id_col).cast("string"))) % sample_mod == 0
        )
    # separation statistic + recall-collapse advisory (round 13, VERDICT
    # r12 item 1): final coarse inertia / total SS of the same fit sample
    # about its global mean — one extra agg over the sample, advisory
    # only (never a silent dial change; see IVFPQ_SEPARATION_ADVISORY).
    separation = None
    if coarse.inertia:
        dim = len(coarse.centroids[0])
        vecd = F.col(vec_col).cast("array<double>")
        srow = pq_src.agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(
                F.aggregate(vecd, F.lit(0.0), lambda a, x: a + x * x)
            ).alias("_ssq"),
            *[F.sum(F.element_at(vecd, i + 1)).alias(f"_s{i}") for i in range(dim)],
        ).collect()[0]
        n_s = int(srow["_n"])
        if n_s > 0:
            total_ss = float(srow["_ssq"]) - sum(
                float(srow[f"_s{i}"]) ** 2 for i in range(dim)
            ) / n_s
            if total_ss > 0:
                separation = coarse.inertia[-1] / total_ss
                # advisory only where the physics bites: a fixture-scale
                # index probing ≥10% of its cells gets coverage from
                # volume alone (nprobe 2 of 8 = 25% measured ≥0.85
                # recall), so the warning is reserved for the sub-linear
                # probed fractions the auto geometry produces at scale
                probed_frac = ivfpq_nprobe_for(coarse_k) / max(coarse_k, 1)
                if separation >= IVFPQ_SEPARATION_ADVISORY and probed_frac <= 0.1:
                    import logging

                    logging.getLogger(__name__).warning(
                        "IVF-PQ coarse cells explain only %.0f%% of the fit "
                        "sample's variance (inertia/SS = %.2f ≥ %.2f) — on this "
                        "near-isotropic geometry the auto nprobe (%d of %d cells) "
                        "measured recall@10 ≈ 0.35-0.53 at 1 M vectors "
                        "(BENCH_SCALE_r13/r14 overlap sweeps). Measured "
                        "escalation curve at separation 0.77 (BENCH_SCALE_r14 "
                        "ann_escalation_sweep, 1 M vectors): probing 6%% of "
                        "cells → recall 0.634, 12%% → 0.787, 25%% → 0.927, "
                        "50%% → 0.989 — cost grows ~linearly with the probed "
                        "fraction (auto ~13 s → 93 s at 25%%). Explicit dials: "
                        "pass nprobe='auto-escalate' to ivfpq_search (opt-in; "
                        "probes 25%% of cells when the recorded separation is "
                        "past this threshold), set nprobe yourself from the "
                        "curve, or use the exact (sim_topk / emb_near_dup) or "
                        "Hamming-rerank paths, which do not rely on cluster "
                        "structure.",
                        100.0 * (1.0 - separation),
                        separation,
                        IVFPQ_SEPARATION_ADVISORY,
                        ivfpq_nprobe_for(coarse_k),
                        coarse_k,
                    )
    if timings is not None:
        timings["separation_inertia_over_ss"] = (
            round(separation, 4) if separation is not None else None
        )
    _mark("separation_sec")
    pq_train, pq_vec_col = pq_src, vec_col
    persisted = None
    if by_residual:
        from .clustering import KM_EXPR_MAX_K

        if len(coarse.centroids) > KM_EXPR_MAX_K and _encode_fused_enabled():
            # fused assign+residual (round 14, VERDICT r13 item 4): ONE
            # Arrow pass emitting just (id, residual) instead of the
            # two-pass assign-then-subtract chain — and the persist below
            # caches the slim (id, _res) frame rather than embedding +
            # cell + _res (same kernels verbatim, so the residual doubles
            # — and with them the codebooks — are bit-identical;
            # fingerprint-asserted in BENCH_SCALE_r14 fit_resfuse_ab).
            # Measured ~neutral on wall at 1 M (residual 13.2 → 12.5 s
            # best-vs-best, interleaved warm A/B — at the auto
            # sample_mod the pass covers only ~n/3 rows, so one fewer
            # Arrow hop buys little); kept default-ON for the identical
            # values, one fewer stage, and the halved cache footprint.
            from pyspark.sql.types import (
                ArrayType,
                DoubleType,
                StructField,
                StructType,
            )

            id_field = next(f for f in pq_src.schema.fields if f.name == id_col)
            schema = StructType(
                [id_field, StructField("_res", ArrayType(DoubleType()))]
            )
            pq_train = pq_src.select(id_col, vec_col).mapInPandas(
                _fused_residual_fn(coarse.centroids, vec_col, id_col), schema
            )
        else:
            asg = assign_clusters(
                pq_src, coarse.centroids, vec_col=vec_col, out_col="_ivfc"
            )
            pq_train = asg.withColumn(
                "_res", _residual_any(F.col(vec_col), coarse.centroids, F.col("_ivfc"))
            )
        pq_vec_col = "_res"
        if sample_mod > 1:
            # large-corpus regime: one residual materialization shared by
            # all m subspace fits (values unchanged — pure plan physics)
            persisted = pq_train.persist()
            persisted.count()
            pq_train = persisted
    _mark("residual_sec")
    try:
        model = pq_fit(
            pq_train,
            id_col=id_col,
            vec_col=pq_vec_col,
            m=m,
            ksub=ksub,
            max_iter=max_iter,
            sample_mod=sample_mod,
            timings=timings,
        )
        _mark("pq_fit_sec")
    finally:
        # the shared residual cache is released even when the PQ fit
        # raises (ADVICE r13 — same contract as kmeans_fit's)
        if persisted is not None:
            persisted.unpersist()
    # the full-frame count (taken once, up front — it also resolved the
    # auto geometry) — the corpus-size statistic the auto-rerank dial needs
    return IVFPQIndex(
        coarse.centroids, model, by_residual, n_vectors=n_vectors,
        separation=round(separation, 4) if separation is not None else None,
    )


def _encode_fused_enabled() -> bool:
    """Env gate for the single-pass fused encode (round 14, VERDICT r13
    item 4) — default ON: at the auto geometry (cells > KM_EXPR_MAX_K) the
    three-stage encode shipped in r13 paid THREE Python/Arrow round-trips
    of the full corpus (cell assignment mapInPandas → residual pandas_udf
    → codes mapInPandas), each serializing the 64-dim vectors both ways
    plus the residual column once materialized into the plan. The fused
    pass computes cell, residual (numpy-local, never crossing Arrow), and
    codes in ONE mapInPandas — same kernels verbatim (``_batch_assign_fn``'s
    blocked argmin incl. the gemm dial, ``_residual_udf``'s single IEEE
    subtraction, ``pq_encode``'s per-subspace left fold), so cells and
    codes are bit-identical (equality-pinned at coarse_k=96 in
    tests/test_pq.py; fingerprints identical in EVERY 1 M run of
    BENCH_SCALE_r14 encode_fuse_ab). Measured at 1 M / 4 000 cells
    (5-trial interleaved persist+count A/B): on a CLEAN JVM the arms are
    equal (~18.3 vs ~18.6 s — r13's 37.1 s encode claim was itself
    session-drift-inflated), and both degrade as the session ages
    (reused Python worker state), but the fused pass degrades far more
    slowly — medians 19.8 s fused vs 37.4 s three-stage in the same JVM
    (1.88×). The honest claim: values-identical, equal at best,
    markedly more drift-robust in long sessions — which is what a
    production build job actually runs in. ``SPARK_GRAFT_ENCODE_FUSED=0``
    opts back to the three-stage plan. Fixture scales
    (cells ≤ KM_EXPR_MAX_K) stay on the expression path untouched by
    construction."""
    import os

    return os.environ.get("SPARK_GRAFT_ENCODE_FUSED", "1") != "0"


def _fused_encode_fn(
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    dsub: int,
    by_residual: bool,
    vec_col: str,
    cell_col: str,
    codes_col: str,
):
    """mapInPandas generator for the fused encode: per Arrow batch — the
    blocked coarse argmin (verbatim ``_batch_assign_fn`` kernel: KBLK=512
    column blocks, left fold per column or the gemm expansion under
    ``_fit_matmul_enabled``, first-min ≡ array_position), the residual
    subtraction (one IEEE op, ≡ ``_residual_udf``), and the per-subspace
    left-fold code argmin (verbatim ``pq_encode`` pandas kernel)."""
    import numpy as np

    from .clustering import _fit_matmul_enabled

    KBLK = 512
    matmul = _fit_matmul_enabled()  # captured at plan build, driver-side

    def encode(batches):
        C = np.asarray(coarse, dtype=np.float64)  # k x dim
        k, dim = C.shape
        CT = np.ascontiguousarray(C.T)
        c2 = (C * C).sum(axis=1) if matmul else None
        CB = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            XT = np.ascontiguousarray(X.T)
            D = np.empty((len(X), k))
            for k0 in range(0, k, KBLK):
                k1 = min(k0 + KBLK, k)
                if matmul:
                    Db = c2[None, k0:k1] - 2.0 * (X @ CT[:, k0:k1])
                else:
                    Db = np.zeros((len(X), k1 - k0))
                    for d in range(dim):  # left-fold association
                        diff = XT[d][:, None] - CT[d][None, k0:k1]
                        Db += diff * diff
                D[:, k0:k1] = Db
            cl = D.argmin(axis=1)  # first-min ≡ array_position
            R = X - C[cl] if by_residual else X
            codes = np.zeros((len(R), len(CB)), dtype=np.int32)
            for j, Cj in enumerate(CB):
                S = R[:, j * dsub : (j + 1) * dsub]
                Dj = np.zeros((len(S), len(Cj)))
                for d in range(dsub):  # left-fold association (pq_encode kernel)
                    diff = S[:, d, None] - Cj[None, :, d]
                    Dj += diff * diff
                codes[:, j] = Dj.argmin(axis=1)
            out = pdf.copy()
            out[cell_col] = cl.astype(np.int32)
            out[codes_col] = list(codes)
            yield out

    return encode


def _fused_qlut_fn(
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    dsub: int,
    by_residual: bool,
    nprobe: int,
    q_id_col: str,
    q_vec_col: str,
    cell_col: str,
):
    """mapInPandas generator for the fused QUERY-side pass of
    ``ivfpq_search`` above the expression budget: probe expansion
    (verbatim ``_batch_probe_fn`` kernel — left-fold coarse distances,
    stable argsort so ties break on the lower cell index), the residual
    subtraction (one IEEE op, ≡ ``_residual_udf``), and the m×ksub LUT
    (0.0-seeded left fold per codeword, ≡ ``clustering._sqdist``) in ONE
    Python crossing. Round 15: the expression branch inlined the
    ``_residual_col`` lookup into every one of the m×ksub (=128) LUT
    folds — measured 2.28 s per warm force for FIFTY query rows at sf0.1;
    this pass runs the same arithmetic in 0.2 s, values bit-identical
    (pinned in tests/test_pq.py::test_fused_qlut_matches_expression)."""
    import numpy as np

    def qlut(batches):
        import pandas as pd

        C = np.asarray(coarse, dtype=np.float64)
        k, dim = C.shape
        # clamp to the cell count (ADVICE r15): an explicit nprobe > k
        # yields at most k argsort columns, and the expression branch's
        # F.slice degrades to "all k cells" — match it instead of crashing
        # on the ids/R repeat-length mismatch
        np_eff = min(nprobe, k)
        CB = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[q_vec_col].tolist(), dtype=np.float64)
            D = np.zeros((len(X), k))
            for d in range(dim):  # left-fold association (_batch_probe_fn)
                diff = X[:, d, None] - C[None, :, d]
                D += diff * diff
            order = np.argsort(D, axis=1, kind="stable")[:, :np_eff]
            ids = pdf[q_id_col].to_numpy().repeat(np_eff)
            cells = order.astype(np.int32).ravel()
            R = np.repeat(X, np_eff, axis=0)
            if by_residual:
                R = R - C[cells]  # single IEEE subtraction (≡ _residual_udf)
            n = len(R)
            lut = np.zeros((n, len(CB), len(CB[0])))
            for j, Cj in enumerate(CB):
                S = R[:, j * dsub : (j + 1) * dsub]
                acc = np.zeros((n, len(Cj)))
                for d in range(dsub):  # left-fold association (_sqdist)
                    diff = S[:, d, None] - Cj[None, :, d]
                    acc += diff * diff
                lut[:, j, :] = acc
            yield pd.DataFrame(
                {
                    q_id_col: ids,
                    cell_col: cells,
                    "_lut": [[list(r) for r in row] for row in lut],
                }
            )

    return qlut


def _fused_residual_fn(coarse: list[list[float]], vec_col: str, id_col: str):
    """mapInPandas generator for the fused fit-side residual pass: blocked
    coarse argmin (verbatim ``_batch_assign_fn`` kernel incl. the gemm
    dial) + the single-IEEE-op subtraction, emitting only (id, residual) —
    the slim frame the PQ sub-fits persist and read."""
    import numpy as np

    from .clustering import _fit_matmul_enabled

    KBLK = 512
    matmul = _fit_matmul_enabled()  # captured at plan build, driver-side

    def resid(batches):
        import pandas as pd

        C = np.asarray(coarse, dtype=np.float64)
        k, dim = C.shape
        CT = np.ascontiguousarray(C.T)
        c2 = (C * C).sum(axis=1) if matmul else None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            XT = np.ascontiguousarray(X.T)
            D = np.empty((len(X), k))
            for k0 in range(0, k, KBLK):
                k1 = min(k0 + KBLK, k)
                if matmul:
                    Db = c2[None, k0:k1] - 2.0 * (X @ CT[:, k0:k1])
                else:
                    Db = np.zeros((len(X), k1 - k0))
                    for d in range(dim):  # left-fold association
                        diff = XT[d][:, None] - CT[d][None, k0:k1]
                        Db += diff * diff
                D[:, k0:k1] = Db
            cl = D.argmin(axis=1)  # first-min ≡ array_position
            R = X - C[cl]
            yield pd.DataFrame({id_col: pdf[id_col], "_res": list(R)})

    return resid


def ivfpq_encode(
    df: DataFrame,
    index: IVFPQIndex,
    *,
    vec_col: str = "embedding",
    cell_col: str = "cell",
    codes_col: str = "codes",
) -> DataFrame:
    """cell id + PQ codes in ONE zero-shuffle map pass — the build side of
    the index. At 100 TB this output is written partitioned/bucketed by
    ``cell`` (the physical inverted lists) so the probe join prunes to
    nprobe/coarse_k of the files; locally the cell equi-join plays that
    role. A residual index encodes ``vec - centroid[cell]`` — still the
    same single map pass (the assignment provides the cell the residual
    needs). Whenever the assignment is off the expression path the default
    is the FUSED Arrow pass (one Python round-trip instead of three — see
    ``_encode_fused_enabled``)."""
    from .clustering import _expr_path_ok, assign_clusters

    # Round 15 (optimization): gate the fused pass on the SAME term budget
    # the assignment uses (``_expr_path_ok``: k ≤ 64 AND k×dim ≤ 512), not
    # on k alone. With k ≤ 64 but k×dim over the budget (e.g. the sf0.1
    # auto geometry: 31 cells × dim 64 = 1 984 terms) the old gate left a
    # MIXED plan — Arrow assignment + Arrow residual + the m×ksub×dsub
    # (= 1 024-term) codes EXPRESSION — i.e. two Python crossings AND the
    # interpreted fold chain. Measured at sf0.1 (2 000 rows, warm noop
    # forces): mixed 2.30 s vs fused 0.22 s, outputs bit-identical
    # (sym-diff 0 both directions; equality also pinned at coarse_k=31 in
    # tests/test_pq.py). Fixture scales (8 cells × 64 dims = 512 ≤ budget)
    # keep the expression plan untouched by construction.
    if not _expr_path_ok(index.coarse):
        if _encode_fused_enabled():
            from pyspark.sql.types import (
                ArrayType,
                IntegerType,
                StructField,
                StructType,
            )

            schema = StructType(
                list(df.schema.fields)
                + [
                    StructField(cell_col, IntegerType()),
                    StructField(codes_col, ArrayType(IntegerType())),
                ]
            )
            return df.mapInPandas(
                _fused_encode_fn(
                    index.coarse,
                    index.pq.codebooks,
                    index.pq.dsub,
                    index.by_residual,
                    vec_col,
                    cell_col,
                    codes_col,
                ),
                schema,
            )
        enc_path = "pandas"
    else:
        enc_path = None
    assigned = assign_clusters(df, index.coarse, vec_col=vec_col, out_col=cell_col)
    if not index.by_residual:
        return pq_encode(assigned, index.pq, vec_col=vec_col, out_col=codes_col, path=enc_path)
    res = assigned.withColumn(
        "_res", _residual_any(F.col(vec_col), index.coarse, F.col(cell_col))
    )
    return pq_encode(res, index.pq, vec_col="_res", out_col=codes_col, path=enc_path).drop("_res")


def resolve_rerank(index: IVFPQIndex, nprobe: int, rerank: int | str) -> int:
    """``rerank="auto"`` → max(IVFPQ_RERANK, ceil(IVFPQ_RERANK_FRACTION ×
    expected probed candidates)), where expected candidates =
    n_vectors × nprobe / coarse_k (cells are size-balanced by the
    farthest-init fit; a skewed hand-fit still gets the right order of
    magnitude). Deterministic in the fit statistics only — both engines
    and the static oracle resolve the same literal. An index without
    ``n_vectors`` (hand-built) resolves to the constant floor."""
    if rerank != "auto":
        return int(rerank)
    if index.n_vectors is None:
        return IVFPQ_RERANK
    import math

    expected = index.n_vectors * nprobe / len(index.coarse)
    return max(IVFPQ_RERANK, math.ceil(IVFPQ_RERANK_FRACTION * expected))


def ivfpq_search(
    corpus_enc: DataFrame,
    queries: DataFrame,
    index: IVFPQIndex,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_vec_id",
    q_vec_col: str = "q_emb",
    cell_col: str = "cell",
    codes_col: str = "codes",
    k: int = PQ_TOP_K,
    nprobe: int | str | None = None,
    rerank: int | str = "auto",
    corpus_raw: DataFrame | None = None,
) -> DataFrame:
    """The composed search: each query probes its ``nprobe`` nearest coarse
    cells (tiny query-side expansion), ADC runs ONLY on corpus rows inside
    probed cells (the equi-join on ``cell`` — never a full-corpus ADC
    scan; plan-asserted in tests/test_pq.py), the per-query shortlist of
    ``rerank`` ids fetches raw vectors by id, and exact L2 re-ranks to
    top-k. A corpus vector lives in exactly one cell, so (query, vector)
    pairs are join-unique — no distinct needed. ``corpus_enc`` must carry
    id, raw vector (for the re-rank fetch), cell, and codes.
    ``rerank="auto"`` (default) widens the shortlist with the probed
    candidate volume — see ``resolve_rerank``. ``nprobe`` may be an int,
    ``None`` (auto √cells), or ``"auto-escalate"`` (opt-in collapse-regime
    escalation — see ``ivfpq_resolve_nprobe``).

    ``corpus_raw`` (round 15, optimization): the re-rank fetch needs only
    (id, raw vector). When the caller still has the PRE-encode frame,
    passing it here keeps the encode pass out of the fetch branch —
    ``corpus_enc`` is a subplan of both the ADC join and the fetch join,
    and Spark performs no cross-branch CSE, so fetching from the encoded
    frame re-ran the whole encode (expression folds or the fused Arrow
    pass) a second time per execution. Values are identical by
    construction: the encode pass-through carries the input columns
    untouched. Defaults to ``corpus_enc`` (previous behavior) for callers
    that only hold the encoded table — e.g. a production deployment
    reading the written inverted lists, which pays a (cheap, pruned)
    column read, not a re-encode."""
    from .clustering import _expr_path_ok, probe_assignments

    nprobe = ivfpq_resolve_nprobe(index, nprobe)
    rerank = resolve_rerank(index, nprobe, rerank)

    model, dsub = index.pq, index.pq.dsub
    if _expr_path_ok(index.coarse):
        # Fixture-scale expression branch (k×dim within the term budget —
        # plan-identical to every checked-in oracle). A residual index
        # ranks ||(q - c) - code||² — the LUT is built from the query's
        # residual AGAINST EACH PROBED CELL, which is exactly one
        # expression here because qp is already one row per (query, cell).
        qp = probe_assignments(
            queries.select(q_id_col, q_vec_col), index.coarse, vec_col=q_vec_col,
            nprobe=nprobe, out_col=cell_col,
        )
        q_eff = (
            _residual_col(F.col(q_vec_col), index.coarse, F.col(cell_col))
            if index.by_residual
            else F.col(q_vec_col)
        )
        lut = F.array(
            *[
                F.array(*[_sqdist(F.slice(q_eff, j * dsub + 1, dsub), w) for w in cb])
                for j, cb in enumerate(model.codebooks)
            ]
        )
        q = qp.select(F.col(q_id_col), F.col(cell_col), lut.alias("_lut"))
    else:
        # Above the budget the whole query side (probe + residual + LUT)
        # runs as ONE Arrow pass — round 15: probe_assignments was already
        # Arrow here, the residual needed a second crossing
        # (_residual_udf; Spark forbids Python UDFs inside higher-order
        # lambdas so it cannot inline into the folds), and _residual_col's
        # inline-expression alternative duplicated the k×dim centroid
        # table into all m×ksub fold terms (measured 2.28 s per warm
        # force for 50 rows at sf0.1 — the whole query-side now runs in
        # ~0.2 s, values bit-identical, equality-pinned).
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        q_schema = StructType(
            [
                StructField(q_id_col, queries.schema[q_id_col].dataType),
                StructField(cell_col, IntegerType()),
                StructField("_lut", ArrayType(ArrayType(DoubleType()))),
            ]
        )
        q = queries.select(q_id_col, q_vec_col).mapInPandas(
            _fused_qlut_fn(
                index.coarse,
                model.codebooks,
                dsub,
                index.by_residual,
                nprobe,
                q_id_col,
                q_vec_col,
                cell_col,
            ),
            q_schema,
        )
    adist = None
    for j in range(model.m):
        term = F.element_at(
            F.element_at("_lut", j + 1), F.element_at(codes_col, j + 1) + F.lit(1)
        )
        adist = term if adist is None else adist + term
    pairs = (
        F.broadcast(q)
        .join(corpus_enc.select(id_col, cell_col, codes_col), [cell_col])
        .filter(F.col(q_id_col) != F.col(id_col))
        .withColumn("_adist", adist)
    )
    w_sl = Window.partitionBy(q_id_col).orderBy(F.col("_adist").asc(), F.col(id_col).asc())
    shortlist = (
        pairs.withColumn("_rk", F.row_number().over(w_sl))
        .filter(F.col("_rk") <= rerank)
        .select(q_id_col, F.col(id_col).alias("n_vec_id"))
    )
    fetch_side = corpus_enc if corpus_raw is None else corpus_raw
    cand = shortlist.join(
        fetch_side.select(F.col(id_col).alias("n_vec_id"), F.col(vec_col).alias("_n_emb")),
        "n_vec_id",
    ).join(F.broadcast(queries.select(q_id_col, q_vec_col)), q_id_col)
    w = Window.partitionBy(q_id_col).orderBy(F.col("_d2").asc(), F.col("n_vec_id").asc())
    return (
        cand.withColumn("_d2", _sqdist_vec(F.col(q_vec_col), F.col("_n_emb")))
        .withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select(
            q_id_col,
            "n_vec_id",
            F.round(F.col("_d2"), 6).alias("d2"),
            F.col("nn_rank").cast("long").alias("nn_rank"),
        )
    )


def q_ivfpq_search(spark, sf_dir: str, *, index: IVFPQIndex | None = None) -> DataFrame:
    """End-to-end IVF-PQ search over the embeddings table: fit both
    quantizers (if no index is passed), encode the corpus once, probe +
    ADC + exact-rerank top-3 for the first PQ_N_QUERIES vectors — the
    composed production twin of ``q_pq_rerank`` (which ADC-scans the WHOLE
    corpus) and ``q_sim_ivf`` (which probes cells but stores raw
    vectors)."""
    from ..sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    if index is None:
        index = ivfpq_fit(emb)
    corpus = ivfpq_encode(emb.select("vec_id", "embedding"), index)
    q = emb.filter(F.col("vec_id") < PQ_N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    # re-rank fetch from the raw table: keeps the encode out of the fetch
    # branch (see ivfpq_search's corpus_raw note) — values identical
    return ivfpq_search(corpus, q, index, corpus_raw=emb.select("vec_id", "embedding"))


def ivfpq_search_sql(
    index: IVFPQIndex,
    *,
    k: int = PQ_TOP_K,
    nprobe: int | str | None = None,
    rerank: int | str = "auto",
    n_queries: int = PQ_N_QUERIES,
) -> str:
    """Post-fit DuckDB twin of ``q_ivfpq_search``: coarse centroids AND
    sub-codebooks as literals; cell assignment via the same first-min
    argmin, probes via the same sorted (distance, index) structs as
    ``clustering.semantic_dedup_pairs_sql``, then in-cell ADC, shortlist,
    exact re-rank. Same association/tie-break contracts throughout, so
    cells, codes, shortlists, and ranks cannot diverge.

    Renders BOTH encodings (round 10 — the residual default needs a full
    SQL twin, not just the numpy differential): under ``by_residual`` the
    corpus codes come from ``embedding - coarse[cell]`` and each query
    builds its LUT from its residual AGAINST EACH PROBED CELL, so the LUT
    CTE is keyed (q_vec_id, cell) and the ADC join matches on cell. The
    residual element ``CAST(x AS DOUBLE) - centroid_literal`` is the same
    single IEEE subtraction as ``_residual_col``'s zip_with, so codes and
    ranks stay bit-aligned. The per-cell residual is an unrolled CASE
    over the coarse cells (literal-list indexing inside list_transform is
    pathological in DuckDB — see ``clustering._sqdist_sql``), wrapped in
    MATERIALIZED CTEs so the optimizer cannot inline the CASE into the
    ~m×ksub×dsub distance terms that reference it."""
    from .clustering import _sqdist_sql

    nprobe = ivfpq_resolve_nprobe(index, nprobe)
    rerank = resolve_rerank(index, nprobe, rerank)
    model = index.pq
    dsub = model.dsub
    dim = model.m * dsub
    cdists = ", ".join(_sqdist_sql("embedding", c) for c in index.coarse)
    qcdists = ", ".join(_sqdist_sql("q_emb", c) for c in index.coarse)

    def _res_case(cell: str, vec: str) -> str:
        branches = "".join(
            f" WHEN {ci} THEN list_value("
            + ", ".join(
                f"(CAST({vec}[{i + 1}] AS DOUBLE) - ({c[i]!r}))" for i in range(dim)
            )
            + ")"
            for ci, c in enumerate(index.coarse)
        )
        return f"CASE {cell}{branches} END"

    corpus_vec = "res" if index.by_residual else "embedding"
    dls = ", ".join(
        "list_value("
        + ", ".join(_sqdist_sql_slice(corpus_vec, w, j * dsub) for w in cb)
        + f") AS dl{j}"
        for j, cb in enumerate(model.codebooks)
    )
    q_vec = "res" if index.by_residual else "q_emb"
    luts = ", ".join(
        "list_value("
        + ", ".join(_sqdist_sql_slice(q_vec, w, j * dsub) for w in cb)
        + f") AS lut{j}"
        for j, cb in enumerate(model.codebooks)
    )
    adist = " + ".join(f"q.lut{j}[c.codes[{j + 1}] + 1]" for j in range(model.m))
    d2 = _sqdist_vec_sql("q.q_emb", "e.embedding")
    codes = ", ".join(
        f"(list_position(dl{j}, list_min(dl{j})) - 1)" for j in range(model.m)
    )
    if index.by_residual:
        encode_ctes = f"""resid AS MATERIALIZED (
  SELECT e.vec_id, cl.cell, {_res_case("cl.cell", "e.embedding")} AS res
  FROM embeddings e JOIN cells cl ON e.vec_id = cl.vec_id
), dists AS (
  SELECT vec_id, cell, {dls} FROM resid
), corpus AS (
  SELECT vec_id, cell, [{codes}] AS codes FROM dists
)"""
        lut_ctes = f"""qres AS MATERIALIZED (
  SELECT p.q_vec_id, p.cell, {_res_case("p.cell", "q.q_emb")} AS res
  FROM qprobe p JOIN qraw q ON p.q_vec_id = q.q_vec_id
), q AS (
  SELECT q_vec_id, cell, {luts} FROM qres
)"""
        shortlist_from = f"""FROM q
    JOIN corpus c ON q.cell = c.cell AND q.q_vec_id <> c.vec_id"""
    else:
        encode_ctes = f"""dists AS (
  SELECT vec_id, {dls} FROM embeddings
), corpus AS (
  SELECT d.vec_id, cl.cell, [{codes}] AS codes
  FROM dists d JOIN cells cl ON d.vec_id = cl.vec_id
)"""
        lut_ctes = f"""q AS (
  SELECT q_vec_id, {luts} FROM qraw
)"""
        shortlist_from = """FROM qprobe p
    JOIN corpus c ON p.cell = c.cell AND p.q_vec_id <> c.vec_id
    JOIN q ON q.q_vec_id = p.q_vec_id"""
    return f"""
WITH cells AS (
  SELECT vec_id, (list_position(cd, list_min(cd)) - 1) AS cell
  FROM (SELECT vec_id, list_value({cdists}) AS cd FROM embeddings)
), {encode_ctes}, qraw AS (
  SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}
), qprobe AS (
  SELECT q_vec_id, unnest(list_transform(rk[1:{nprobe}], s -> s.i)) AS cell
  FROM (
    SELECT q_vec_id,
           list_sort(list_transform(range({len(index.coarse)}),
                                    j -> {{'d': cd[j + 1], 'i': j}})) AS rk
    FROM (SELECT q_vec_id, list_value({qcdists}) AS cd FROM qraw)
  )
), {lut_ctes}, shortlist AS (
  SELECT q_vec_id, n_vec_id FROM (
    SELECT q.q_vec_id, c.vec_id AS n_vec_id,
           row_number() OVER (PARTITION BY q.q_vec_id
                              ORDER BY {adist} ASC, c.vec_id ASC) AS rk
    {shortlist_from}
  ) WHERE rk <= {rerank}
)
SELECT q_vec_id, n_vec_id, round(d2, 6) AS d2, CAST(nn_rank AS BIGINT) AS nn_rank
FROM (
  SELECT s.q_vec_id, s.n_vec_id, {d2} AS d2,
         row_number() OVER (PARTITION BY s.q_vec_id ORDER BY {d2} ASC, s.n_vec_id ASC) AS nn_rank
  FROM shortlist s
  JOIN embeddings e ON s.n_vec_id = e.vec_id
  JOIN qraw q ON s.q_vec_id = q.q_vec_id
) WHERE nn_rank <= {k}
"""


def oracle_ivfpq(sf_name: str = "sf0.01") -> str:
    """Static driver oracle for ``ivfpq_search``: the post-fit twin rendered
    from the checked-in DEFAULT-variant fit — farthest-init coarse
    centroids (``_ivfpq_coarse.py``) and RESIDUAL-trained PQ sub-codebooks
    (``_ivfpq_residual.py``), both generated by tools/gen_pq_oracle.py
    from one ``ivfpq_fit(emb)`` under the round-10 defaults. Valid on the
    same bit-determinism argument as ``oracle_pq_rerank`` — fit ==
    literals is exact-equality-guarded in tests/test_pq.py."""
    from ._ivfpq_coarse import COARSE_BY_SF
    from ._ivfpq_residual import IVFPQ_N_BY_SF, RESIDUAL_CODEBOOKS_BY_SF

    return ivfpq_search_sql(
        IVFPQIndex(
            COARSE_BY_SF[sf_name],
            PQModel(RESIDUAL_CODEBOOKS_BY_SF[sf_name], []),
            by_residual=True,
            n_vectors=IVFPQ_N_BY_SF[sf_name],
        )
    )


# pq_rerank rotated OFF / ivfpq_search IN (round-9 eighth rotation,
# VERDICT r8 items 4+6): the composed IVF-PQ stack subsumes pq_rerank's
# ADC-shortlist + exact-rerank inside the probed-cell path (the actual
# 100 TB shape), so the PQ family's hard driver row moves to the more
# complete operator; pq_rerank keeps the identical hash-differential
# parity row in tests/test_offregistry_parity.py.
# pq_rerank RETURNS to the registry (round-11 tenth rotation): the ADC +
# exact-rerank contract gets its own hard driver row again alongside the
# composed ivfpq_search (which subsumed it during rounds 9-10).
# Round 15 shipped as an OPTIMIZATION round: the registry is frozen at
# the r14 set (no declared query may disappear), so pq_rerank STAYS
# in-registry; the drafted fourteenth rotation (hll_vs_exact in,
# pq_rerank out) is parked in tests/test_offregistry_parity.py for a
# future build round.
QUERIES = {"ivfpq_search": q_ivfpq_search, "pq_rerank": q_pq_rerank}
ORACLE_PQ_RERANK = oracle_pq_rerank("sf0.01")
ORACLES = {"ivfpq_search": oracle_ivfpq("sf0.01"), "pq_rerank": ORACLE_PQ_RERANK}
