"""Round-13 scale probes — produces the raw sections of BENCH_SCALE_r13.json.

Subcommands (argv[1]):

  fit_attrib        VERDICT r12 item 2's measurement half: the 1 M-vector
                    IVF-PQ fit wall (532.8 s in BENCH_SCALE_r12) attributed
                    phase by phase through the new timing hooks — corpus
                    count, coarse seed pick, coarse Lloyd iterations
                    (k=4 000 numpy argmin + fixed-point agg), residual
                    materialization, and the m=8 PQ sub-fits (seed picks +
                    expression-path iterations). Runs the CURRENT code; the
                    optimization A/B (fit_opt_ab) cites this block.
  fit_opt_ab        the optimization half: fused-Arrow sub-fits + partial-
                    aggregate coarse iterations (SPARK_GRAFT_FIT_FUSED) vs
                    the round-12 per-subspace path, same 1 M corpus —
                    codebooks asserted BIT-IDENTICAL across arms (the fused
                    path is integer-associative partial sums, a physical
                    switch), walls compared. Done-gate: fit ≤ half of
                    fit_attrib's with identical codebooks.
  fit_matmul_ab     the gemm-kernel A/B (SPARK_GRAFT_FIT_MATMUL — was the
                    opt-in experiment when this was measured; shipped
                    default-ON since 2c34364): fit wall / coarse label
                    agreement / end recall vs the portable left-fold
                    kernel at 1 M — the decision input that, with
                    encode_matmul_ab and matmul_pin_overlap, led to the
                    late-round default flip.
  ann_overlap_sweep VERDICT r12 item 1: map the ANN recall curve BETWEEN
                    the two measured extremes (isotropic sf100 0.479 vs the
                    ~7×-separated planted corpus 1.0). Planted 1 M-vector
                    corpora at center scale sigma_c ∈ {0.5, 1, 2, 5} with
                    N(0,1) noise, pure auto dials; recall@10 + per-phase
                    walls per point, plus the fit-side separation statistic
                    (inertia / total SS) that a future auto-nprobe dial
                    would key on.
  inc_attrib100     VERDICT r12 item 3: per-batch STAGE attribution of the
                    sf100 incremental funnel (batch-local gates+dedup /
                    backfill+screen read / verify+verdict / index+corpus
                    write) — the 127/124/52/69/53 s oscillation gets an
                    attributed cause instead of a guess.
  stages100_spread  VERDICT r12 item 4: the sf100 near-dedup stage probes
                    re-run median-of-3 within one JVM (shipped defaults
                    arm) with min/median/max per stage — makes stage-level
                    regressions attributable vs single-shot noise, and
                    settles the 258→277 s / 13.9→45.1 s questions by data.
  cand_join_ab      VERDICT r12 item 6: the LSH candidate join (72.9 s,
                    19.14 M candidates at sf100) A/B — band-key self-join
                    (shipped) vs groupBy(band_key)+within-bucket pair
                    generation (one shuffle instead of two); candidate
                    sets hash-compared.
  funnel_guard      the ladder guard executed via pytest (SPARK_GRAFT_SLOW)
                    — the assembler refuses to emit without a passing block.
  connect_probe     standing: record grpcio/protobuf availability for the
                    opt-in Spark Connect end-to-end test.

Methodology matches bench_r09..r12: one JVM per subcommand, plans built
once, /dev/shm hygiene (probe dirs cleaned in finally blocks).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from bench_r09 import _session, _sf  # noqa: E402
from bench_r12 import ANN_DIR, _funnel_corpus, _gen_clustered  # noqa: E402

SF100 = "/root/repo/.benchdata/sf100"
OVERLAP_DIR = "/root/repo/.benchdata/ann_overlap"


# ---------------------------------------------------------------------------
# IVF-PQ fit wall
# ---------------------------------------------------------------------------


def _fit_corpus(spark):
    if not os.path.exists(os.path.join(ANN_DIR, "embeddings.parquet")):
        _gen_clustered(spark, 1_000_000, 1000, 64)
    return spark.read.parquet(os.path.join(ANN_DIR, "embeddings.parquet"))


def cmd_fit_attrib() -> dict:
    spark = _session(10.0)
    from wnba_data_pipeline_spark.operators import pq

    emb = _fit_corpus(spark)
    timings: dict = {}
    t0 = time.perf_counter()
    index = pq.ivfpq_fit(emb, timings=timings)
    total = round(time.perf_counter() - t0, 2)
    return {
        "n_corpus": index.n_vectors,
        "n_cells": len(index.coarse),
        "fit_total_sec": total,
        "timings": timings,
    }


def _codebook_fingerprint(index) -> str:
    """Order-sensitive exact fingerprint of coarse + PQ codebooks (floats
    repr'd exactly) — the bit-identity check across fit arms."""
    import hashlib

    payload = repr((index.coarse, index.pq.codebooks, index.by_residual)).encode()
    return hashlib.md5(payload).hexdigest()


def cmd_fit_matmul_ab() -> dict:
    """The remaining fit wall was the coarse blocked left-fold argmin
    (158.6 s of the 237.9 s fused fit at 1 M). This measured the gemm
    kernel (SPARK_GRAFT_FIT_MATMUL — expanded ||x||²-2x·c+||c||² form,
    not structurally bit-identical) against the portable left-fold, which
    was the default at measurement time (the kernel shipped default-ON in
    2c34364 on the strength of this block): fit wall, coarse-assignment
    label agreement on a 100 k sample (cells correspond 1:1 across arms —
    same seeds, same traversal), and end-to-end recall@10 against one
    shared exact truth. This block plus encode_matmul_ab and
    matmul_pin_overlap formed the dossier behind the late-round default
    flip (see clustering._fit_matmul_enabled)."""
    spark = _session(10.0)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq
    from wnba_data_pipeline_spark.operators.clustering import assign_clusters

    emb = _fit_corpus(spark)
    n_queries = 100
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
        .filter(F.col("rk") <= 10)
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"))
        .collect()
    ):
        truth.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    denom = sum(len(v) for v in truth.values())

    sample = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    out: dict = {"arms": {}}
    labels: dict = {}
    for arm, flag in (("exact", "0"), ("matmul", "1")):
        os.environ["SPARK_GRAFT_FIT_MATMUL"] = flag
        timings: dict = {}
        t0 = time.perf_counter()
        index = pq.ivfpq_fit(emb, timings=timings)
        fit_sec = round(time.perf_counter() - t0, 2)
        corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
        corpus.count()
        got: dict = {}
        t0 = time.perf_counter()
        for r in pq.ivfpq_search(corpus, q, index, k=10).collect():
            got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        search_sec = round(time.perf_counter() - t0, 2)
        labels[arm] = {
            r["vec_id"]: r["cluster"]
            for r in assign_clusters(sample, index.coarse).select("vec_id", "cluster").collect()
        }
        out["arms"][arm] = {
            "fit_sec": fit_sec,
            "coarse_iter_sec": timings.get("coarse_detail", {}).get("iter_sec"),
            "search_sec": search_sec,
            "recall_at_10": round(
                sum(len(truth[k] & got.get(k, set())) for k in truth) / denom, 4
            ),
            "fingerprint": _codebook_fingerprint(index),
        }
        corpus.unpersist()
    os.environ.pop("SPARK_GRAFT_FIT_MATMUL", None)
    a, b = labels["exact"], labels["matmul"]
    same = sum(1 for k in a if a[k] == b.get(k))
    out["label_agreement"] = round(same / len(a), 6)
    out["fit_speedup"] = round(
        out["arms"]["exact"]["fit_sec"] / max(out["arms"]["matmul"]["fit_sec"], 1e-9), 2
    )
    return out


def cmd_encode_matmul_ab() -> dict:
    """With the fused fit shipped, ENCODE is the ANN build wall (117-197 s
    per sweep point at 1 M — the same k=4 000 argmin over the full corpus).
    A/B the gemm dial on the encode pass: wall, cell/code identity across
    arms (cells must agree unless a sub-ulp Voronoi tie flips; codes are
    computed from identical residuals once cells agree)."""
    spark = _session(10.0)
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq

    emb = _fit_corpus(spark)
    # one fixed index (left-fold fit — the shipped default) shared by arms
    os.environ.pop("SPARK_GRAFT_FIT_MATMUL", None)
    index = pq.ivfpq_fit(emb)
    out: dict = {"n_cells": len(index.coarse), "arms": {}}
    fps = {}
    for arm, flag in (("exact", "0"), ("matmul", "1")):
        os.environ["SPARK_GRAFT_FIT_MATMUL"] = flag
        t0 = time.perf_counter()
        enc = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index)
        row = enc.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("vec_id", "cell", F.col("codes").cast("array<string>").cast("string"))
                % 1_000_003
            ).alias("h"),
        ).collect()[0]
        out["arms"][arm] = {
            "encode_sec": round(time.perf_counter() - t0, 2),
            "n": int(row["n"]),
            "fingerprint": int(row["h"] or 0),
        }
        fps[arm] = (int(row["n"]), int(row["h"] or 0))
    os.environ.pop("SPARK_GRAFT_FIT_MATMUL", None)
    out["cells_codes_identical"] = fps["exact"] == fps["matmul"]
    out["speedup"] = round(
        out["arms"]["exact"]["encode_sec"] / max(out["arms"]["matmul"]["encode_sec"], 1e-9), 2
    )
    return out


def cmd_matmul_pin_overlap() -> dict:
    """Stress pin for the gemm experiment on the WORST corpus for label
    flips — the sigma_c=0.5 overlapping-cluster geometry, where Voronoi
    boundaries carry the most density: fused-fit codebook fingerprints and
    full-corpus assignment labels compared matmul-vs-exact. Evidence input
    for the round-14 default decision (with fit_matmul_ab's clustered-
    corpus identity, two corpora at opposite separation extremes)."""
    spark = _session(10.0)
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq

    pdir = os.path.join(OVERLAP_DIR, "sigma0.5-pin")
    out: dict = {}
    try:
        _gen_overlap(spark, pdir, int(os.environ.get("SPARK_GRAFT_ANN_N", "1000000")), 1000, 64, 0.5)
        emb = spark.read.parquet(pdir)
        fps = {}
        for arm, flag in (("exact", "0"), ("matmul", "1")):
            os.environ["SPARK_GRAFT_FIT_MATMUL"] = flag
            t0 = time.perf_counter()
            index = pq.ivfpq_fit(emb)
            fit_sec = round(time.perf_counter() - t0, 2)
            from bench_r13 import _codebook_fingerprint  # self-import ok

            enc = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index)
            row = enc.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64("vec_id", "cell", F.col("codes").cast("array<string>").cast("string"))
                    % 1_000_003
                ).alias("h"),
            ).collect()[0]
            fps[arm] = {
                "fit_sec": fit_sec,
                "codebooks": _codebook_fingerprint(index),
                "enc_n": int(row["n"]),
                "enc_hash": int(row["h"] or 0),
            }
        os.environ.pop("SPARK_GRAFT_FIT_MATMUL", None)
        out["arms"] = fps
        out["codebooks_identical"] = fps["exact"]["codebooks"] == fps["matmul"]["codebooks"]
        out["cells_codes_identical"] = (fps["exact"]["enc_n"], fps["exact"]["enc_hash"]) == (
            fps["matmul"]["enc_n"], fps["matmul"]["enc_hash"]
        )
    finally:
        shutil.rmtree(pdir, ignore_errors=True)
    return out


def cmd_fit_opt_ab() -> dict:
    spark = _session(10.0)
    from wnba_data_pipeline_spark.operators import pq

    emb = _fit_corpus(spark)
    out: dict = {"arms": {}}
    for arm, flag in (("baseline", "0"), ("fused", "1")):
        os.environ["SPARK_GRAFT_FIT_FUSED"] = flag
        timings: dict = {}
        t0 = time.perf_counter()
        index = pq.ivfpq_fit(emb, timings=timings)
        out["arms"][arm] = {
            "fit_sec": round(time.perf_counter() - t0, 2),
            "timings": timings,
            "fingerprint": _codebook_fingerprint(index),
        }
    os.environ.pop("SPARK_GRAFT_FIT_FUSED", None)
    a, b = out["arms"]["baseline"], out["arms"]["fused"]
    out["codebooks_identical"] = a["fingerprint"] == b["fingerprint"]
    out["speedup"] = round(a["fit_sec"] / max(b["fit_sec"], 1e-9), 2)
    return out


# ---------------------------------------------------------------------------
# ANN overlap sweep
# ---------------------------------------------------------------------------


def _gen_overlap(spark, out_dir: str, n: int, n_clusters: int, dim: int, sigma_c: float) -> None:
    """_gen_clustered with a parameterized center scale (sigma_c) — same
    per-row counter-seeded noise, same reshuffle-proof contract. sigma_c=5
    reproduces the r12 ann_clustered_1m corpus distribution."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, sigma_c, (n_clusters, dim))

    def _batch(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            vecs = []
            for vid in ids:
                r = np.random.default_rng(int(vid) * 2654435761 % (2**63) + 17)
                vecs.append(centers[int(vid) % n_clusters] + r.normal(0.0, 1.0, dim))
            yield pd.DataFrame(
                {
                    "vec_id": ids.astype("int64"),
                    "embedding": [v.astype("float64") for v in vecs],
                }
            )

    df = spark.range(0, n, 1, 64).mapInPandas(_batch, "vec_id long, embedding array<double>")
    df.write.mode("overwrite").parquet(out_dir)


def _recall_point(spark, emb, n_queries: int = 100) -> dict:
    """fit → encode → exact truth → search under PURE defaults; returns
    walls + recall@10 + the separation statistic (coarse-fit inertia over
    total sum of squares — 1.0 means cells explain nothing/isotropic,
    → 0 means widely separated)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq

    out: dict = {}
    timings: dict = {}
    t0 = time.perf_counter()
    index = pq.ivfpq_fit(emb, timings=timings)
    out["fit_sec"] = round(time.perf_counter() - t0, 2)
    out["fit_timings"] = timings
    out["n_cells"] = len(index.coarse)
    out["auto_nprobe"] = pq.ivfpq_nprobe_for(len(index.coarse))

    # separation statistic from fit metadata: final-iteration inertia
    # (sample) / total SS of the sample about the global mean. Computed
    # from the same sample the fit used, one extra agg.
    from wnba_data_pipeline_spark.functions.hashing import md5_long

    sm = pq.ivfpq_fit_sample_mod(index.n_vectors, len(index.coarse))
    sample = emb if sm <= 1 else emb.filter(
        md5_long(F.concat(F.lit("kms:"), F.col("vec_id").cast("string"))) % sm == 0
    )
    dim = len(index.coarse[0])
    stats = sample.select(
        F.lit(1).alias("_one"),
        *[F.element_at("embedding", i + 1).alias(f"e{i}") for i in range(dim)],
    ).groupBy().agg(
        F.count("_one").alias("n"),
        *[F.sum(f"e{i}").alias(f"s{i}") for i in range(dim)],
        *[F.sum(F.col(f"e{i}") * F.col(f"e{i}")).alias(f"q{i}") for i in range(dim)],
    ).collect()[0]
    n_s = stats["n"]
    total_ss = sum(
        stats[f"q{i}"] - stats[f"s{i}"] * stats[f"s{i}"] / n_s for i in range(dim)
    )
    # fit's last pre-update inertia over the same sample (recorded by the
    # timing hook) / total SS about the global mean: →1 isotropic, →0
    # widely separated — the statistic an occupancy-aware nprobe dial
    # would key on
    inertia = timings.get("coarse_final_inertia")
    out["separation_inertia_over_ss"] = (
        round(inertia / total_ss, 4) if inertia and total_ss else None
    )
    out["sample_total_ss"] = round(total_ss, 1)

    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
    t0 = time.perf_counter()
    corpus.count()
    out["encode_sec"] = round(time.perf_counter() - t0, 2)

    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("_d2").asc(), F.col("vec_id").asc())
    truth: dict = {}
    t0 = time.perf_counter()
    for r in (
        F.broadcast(q)
        .join(emb.select("vec_id", "embedding"), F.col("q_vec_id") != F.col("vec_id"))
        .withColumn("_d2", pq._sqdist_vec(F.col("q_emb"), F.col("embedding")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"))
        .collect()
    ):
        truth.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    out["exact_truth_sec"] = round(time.perf_counter() - t0, 2)
    denom = sum(len(v) for v in truth.values())

    t0 = time.perf_counter()
    got: dict = {}
    for r in pq.ivfpq_search(corpus, q, index, k=10).collect():
        got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    out["search_sec"] = round(time.perf_counter() - t0, 2)
    out["recall_at_10"] = round(
        sum(len(truth[qid] & got.get(qid, set())) for qid in truth) / denom, 4
    )
    corpus.unpersist()
    return out


def cmd_ann_overlap_sweep() -> dict:
    n = int(os.environ.get("SPARK_GRAFT_ANN_N", "1000000"))
    n_clusters = 1000
    sigmas = [
        float(s)
        for s in os.environ.get("SPARK_GRAFT_ANN_SIGMAS", "0.5,1,2,5").split(",")
    ]
    spark = _session(10.0)
    out: dict = {"n_corpus": n, "n_clusters_true": n_clusters, "points": {}}
    for sigma in sigmas:
        pdir = os.path.join(OVERLAP_DIR, f"sigma{sigma}")
        try:
            t0 = time.perf_counter()
            _gen_overlap(spark, pdir, n, n_clusters, 64, sigma)
            gen_sec = round(time.perf_counter() - t0, 2)
            emb = spark.read.parquet(pdir)
            point = _recall_point(spark, emb)
            point["gen_sec"] = gen_sec
            out["points"][str(sigma)] = point
            print(json.dumps({f"sigma{sigma}": point}), file=sys.stderr, flush=True)
        finally:
            shutil.rmtree(pdir, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# sf100 funnel probes
# ---------------------------------------------------------------------------


def cmd_inc_attrib100() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    n_batches = int(os.environ.get("SPARK_GRAFT_INC_BATCHES", "5"))
    spark = _session(_sf(sf_dir))

    from wnba_data_pipeline_spark.plans import curation

    out: dict = {"sf_dir": sf_dir, "n_batches": n_batches}
    base = tempfile.mkdtemp(prefix="curation-incattr-", dir="/dev/shm")
    try:
        walls: list = []
        stage_walls: list = []
        t0 = time.perf_counter()
        curation.run_curation_incremental(
            spark, sf_dir, base, n_batches=n_batches,
            batch_walls=walls, batch_stage_walls=stage_walls,
        )
        out["incremental_total_sec"] = round(time.perf_counter() - t0, 2)
        out["batch_sec"] = walls
        out["batch_stage_sec"] = stage_walls
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def cmd_stages100_spread() -> dict:
    """Median-of-3 per-stage walls, shipped defaults (Arrow shingles ON,
    hh verify) — one JVM, fresh lineage per trial (unpersist between
    trials so trial 2/3 re-run real work, not cache reads)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    trials = int(os.environ.get("SPARK_GRAFT_STAGE_TRIALS", "3"))
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import dedup
    from wnba_data_pipeline_spark.operators.graph import cluster_survivors

    corpus = _funnel_corpus(spark, sf_dir).persist()
    n_docs = corpus.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "trials": trials, "stage": {}}
    runs: dict[str, list] = {}
    checks: dict[str, set] = {}

    for _ in range(trials):
        t0 = time.perf_counter()
        shingled = dedup.shingle_docs(corpus, hh_only=True).persist()
        n_sh = shingled.count()
        runs.setdefault("shingle_mat", []).append(time.perf_counter() - t0)
        checks.setdefault("n_shingled", set()).add(n_sh)

        t0 = time.perf_counter()
        cand = dedup.minhash_candidates(shingled).persist()
        n_cand = cand.count()
        runs.setdefault("candidates", []).append(time.perf_counter() - t0)
        checks.setdefault("n_candidates", set()).add(n_cand)

        hh_a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("hh").alias("hh_a"))
        hh_b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("hh").alias("hh_b"))
        ver = (
            cand.join(hh_a, "doc_a")
            .join(hh_b, "doc_b")
            .withColumn(
                "jaccard",
                F.round(
                    F.size(F.array_intersect("hh_a", "hh_b"))
                    / F.size(F.array_union("hh_a", "hh_b")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= 0.5)
            .select("doc_a", "doc_b", "jaccard")
        )
        t0 = time.perf_counter()
        n_p = ver.count()
        runs.setdefault("verify_hh", []).append(time.perf_counter() - t0)
        checks.setdefault("n_pairs", set()).add(n_p)

        # components_survivors SUB-attribution (VERDICT r12 item 6: is the
        # 88.7 s labeling or materialization?): (a) pair materialization
        # through the production plan, (b) component labeling + survivor
        # verdicts, (c) the corpus anti-join
        t0 = time.perf_counter()
        pairs = dedup.minhash_pairs(corpus, shingled=shingled, verify="hh").persist()
        pairs.count()
        runs.setdefault("cs_pairs_mat", []).append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        losers = (
            cluster_survivors(pairs)
            .filter(~F.col("is_survivor"))
            .select(F.col("id").alias("doc_id"))
            .persist()
        )
        n_losers = losers.count()
        runs.setdefault("cs_labeling", []).append(time.perf_counter() - t0)
        checks.setdefault("n_losers", set()).add(n_losers)

        t0 = time.perf_counter()
        n_surv = corpus.join(losers, "doc_id", "left_anti").count()
        runs.setdefault("cs_anti_join", []).append(time.perf_counter() - t0)
        checks.setdefault("n_survivors", set()).add(n_surv)

        losers.unpersist()
        pairs.unpersist()
        cand.unpersist()
        shingled.unpersist()

    for stage, ts in runs.items():
        ts = sorted(round(t, 2) for t in ts)
        out["stage"][stage] = {
            "min": ts[0], "median": ts[len(ts) // 2], "max": ts[-1], "all": ts,
        }
    out["counts_stable_across_trials"] = all(len(v) == 1 for v in checks.values())
    out["counts"] = {k: sorted(v) for k, v in checks.items()}
    corpus.unpersist()
    return out


def cmd_cand_join_ab() -> dict:
    """The LSH candidate step A/B: shipped band-key SELF-JOIN vs
    groupBy(band_key) + within-bucket pair generation (one shuffle of the
    band table instead of two join sides). Candidate sets hash-compared —
    a physical experiment, not a semantic change."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    trials = int(os.environ.get("SPARK_GRAFT_STAGE_TRIALS", "3"))
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import dedup

    corpus = _funnel_corpus(spark, sf_dir)
    shingled = dedup.shingle_docs(corpus, hh_only=True).persist()
    shingled.count()
    out: dict = {"sf_dir": sf_dir, "trials": trials, "arms": {}}

    def _fingerprint(cand):
        row = cand.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_a", "doc_b") % 1_000_003).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    for arm, flag in (("self_join", "0"), ("grouped", "1")):
        os.environ["SPARK_GRAFT_CAND_GROUPED"] = flag
        walls = []
        fp = None
        for _ in range(trials):
            t0 = time.perf_counter()
            fp = _fingerprint(dedup.minhash_candidates(shingled))
            walls.append(round(time.perf_counter() - t0, 2))
        walls.sort()
        out["arms"][arm] = {
            "walls": walls,
            "median_sec": walls[len(walls) // 2],
            "n_candidates": fp[0],
            "cand_hash": fp[1],
        }
    os.environ.pop("SPARK_GRAFT_CAND_GROUPED", None)
    a, b = out["arms"]["self_join"], out["arms"]["grouped"]
    out["candidates_identical"] = (a["n_candidates"], a["cand_hash"]) == (
        b["n_candidates"], b["cand_hash"]
    )
    out["speedup"] = round(a["median_sec"] / max(b["median_sec"], 1e-9), 2)
    shingled.unpersist()
    return out


def cmd_funnel_guard() -> dict:
    env = dict(os.environ, SPARK_GRAFT_SLOW="1")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_curation.py::test_funnel_ladder_stays_sublinear_per_doc",
            "-q",
            "--no-header",
        ],
        cwd=str(_REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = (proc.stdout or "").strip().splitlines()[-3:]
    return {
        "passed": proc.returncode == 0,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "tail": tail,
    }


def cmd_connect_probe() -> dict:
    out: dict = {}
    for mod in ("grpc", "google.protobuf", "grpc_status"):
        try:
            __import__(mod)
            out[mod] = True
        except ImportError:
            out[mod] = False
    out["connect_client_available"] = out["grpc"] and out["google.protobuf"]
    out["note"] = (
        "opt-in end-to-end test "
        "(tests/test_connect_guard.py::test_registry_executes_under_real_connect_session, "
        "SPARK_GRAFT_CONNECT=1) runs the moment connect_client_available is true"
    )
    return out


def main() -> None:
    # one BLAS thread per python worker: 32 workers already saturate the
    # cores, and nested OpenBLAS threading would oversubscribe (matters
    # for the gemm experiment; harmless for the element-wise kernels)
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    cmd = sys.argv[1] if len(sys.argv) > 1 else "connect_probe"
    fn = {
        "fit_attrib": cmd_fit_attrib,
        "fit_opt_ab": cmd_fit_opt_ab,
        "fit_matmul_ab": cmd_fit_matmul_ab,
        "encode_matmul_ab": cmd_encode_matmul_ab,
        "matmul_pin_overlap": cmd_matmul_pin_overlap,
        "ann_overlap_sweep": cmd_ann_overlap_sweep,
        "inc_attrib100": cmd_inc_attrib100,
        "stages100_spread": cmd_stages100_spread,
        "cand_join_ab": cmd_cand_join_ab,
        "funnel_guard": cmd_funnel_guard,
        "connect_probe": cmd_connect_probe,
    }[cmd]
    print(json.dumps({cmd: fn()}))


if __name__ == "__main__":
    main()
