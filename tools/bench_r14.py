"""Round-14 scale probes — produces the raw sections of BENCH_SCALE_r14.json.

Subcommands (argv[1]):

  ann_escalation_sweep  VERDICT r13 item 1: what nprobe ESCALATION buys in
                    the recall-collapse regime. At sigma_c ∈ {0.5, 0.75}
                    (separation ≈0.77 / ≈0.62 — the collapse point and the
                    knee) on the 1 M corpus: fit + encode + exact truth
                    ONCE per sigma, then search at probed fractions
                    ~1.6% (auto) / 6% / 12% / 25% / 50% of the 4 000
                    cells — recall@10 + search wall per point. The curve
                    the advisory cites and the opt-in escalation mode
                    resolves from.
  ann_overlap_knee2 VERDICT r13 item 2: sigma_c ∈ {0.6, 0.65} recall
                    points under pure defaults (same _recall_point harness
                    as r13's sweep) — pins which side of the measured
                    0.62→0.77 separation band the 0.7 advisory threshold
                    lands on.
  funnel_gap_attrib VERDICT r13 item 3: per-seam walls of the shipped
                    sf100 batch funnel's near-dedup stage through the NEW
                    seam hooks (shingle+advisory / pair materialization /
                    symmetrize / labeling / anti-join+write), after the
                    connected_components fix that stopped the symmetrize
                    union from executing the whole pair pipeline twice.
                    Emits the full funnel stage walls + survivor hash
                    (must equal r13's 2842712 / 1065605201).
  inc_shipped100    the sf100 incremental funnel at shipped defaults with
                    per-batch stage attribution — the CC fix halves the
                    batch-LOCAL dedup pass too (its cluster_survivors ran
                    the same doubled union).
  encode_fuse_ab    VERDICT r13 item 4, encode half: the fused single-pass
                    encode (SPARK_GRAFT_ENCODE_FUSED — cell + in-memory
                    residual + codes in ONE Arrow stage) vs the r13
                    three-stage chain at 1 M; cells+codes fingerprints
                    must be identical.
  fit_resfuse_ab    VERDICT r13 item 4, fit half: the fused (id, residual)
                    materialization vs the assign-then-subtract chain
                    inside ivfpq_fit at 1 M; codebook fingerprints must be
                    identical; per-phase timings attribute the win.
  funnel_guard      the ladder guard executed via pytest (SPARK_GRAFT_SLOW)
                    — the assembler refuses to emit without a passing block.
  connect_probe     standing: record grpcio/protobuf availability for the
                    opt-in Spark Connect end-to-end test.

Methodology matches bench_r09..r13: one JVM per subcommand, plans built
once, /dev/shm hygiene (probe dirs cleaned in finally blocks).
"""

from __future__ import annotations

import json
import os
import shutil
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
from bench_r13 import (  # noqa: E402
    OVERLAP_DIR,
    _codebook_fingerprint,
    _fit_corpus,
    _gen_overlap,
    _recall_point,
    cmd_connect_probe,
    cmd_funnel_guard,
)

SF100 = "/root/repo/.benchdata/sf100"

# r13 shipped-funnel identity anchors (BENCH_SCALE_r13 shipped100_r13)
R13_SURVIVORS = 2842712
R13_SURVIVOR_HASH = 1065605201


# ---------------------------------------------------------------------------
# ANN escalation + knee
# ---------------------------------------------------------------------------


def _escalation_point(spark, emb, sigma: float, probe_fracs: list[float]) -> dict:
    """fit + encode + exact truth once; search at each probed fraction."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq

    out: dict = {"sigma": sigma}
    timings: dict = {}
    t0 = time.perf_counter()
    index = pq.ivfpq_fit(emb, timings=timings)
    out["fit_sec"] = round(time.perf_counter() - t0, 2)
    out["n_cells"] = len(index.coarse)
    out["separation"] = index.separation
    out["auto_nprobe"] = pq.ivfpq_nprobe_for(len(index.coarse))

    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
    t0 = time.perf_counter()
    corpus.count()
    out["encode_sec"] = round(time.perf_counter() - t0, 2)

    n_queries = 100
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

    cells = len(index.coarse)
    points = []
    for frac in probe_fracs:
        nprobe = max(1, round(frac * cells))
        t0 = time.perf_counter()
        got: dict = {}
        for r in pq.ivfpq_search(corpus, q, index, k=10, nprobe=nprobe).collect():
            got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        wall = round(time.perf_counter() - t0, 2)
        points.append(
            {
                "nprobe": nprobe,
                "probed_frac": round(nprobe / cells, 4),
                "rerank_auto": pq.resolve_rerank(index, nprobe, "auto"),
                "search_sec": wall,
                "recall_at_10": round(
                    sum(len(truth[k] & got.get(k, set())) for k in truth) / denom, 4
                ),
            }
        )
        print(json.dumps({f"sigma{sigma}@{frac}": points[-1]}), file=sys.stderr, flush=True)
    out["escalation"] = points
    corpus.unpersist()
    return out


def cmd_ann_escalation_sweep() -> dict:
    n = int(os.environ.get("SPARK_GRAFT_ANN_N", "1000000"))
    sigmas = [
        float(s) for s in os.environ.get("SPARK_GRAFT_ESC_SIGMAS", "0.5,0.75").split(",")
    ]
    fracs = [
        float(f)
        for f in os.environ.get("SPARK_GRAFT_ESC_FRACS", "0.016,0.06,0.12,0.25,0.5").split(",")
    ]
    spark = _session(10.0)
    out: dict = {"n_corpus": n, "n_clusters_true": 1000, "points": {}}
    for sigma in sigmas:
        pdir = os.path.join(OVERLAP_DIR, f"sigma{sigma}-esc")
        try:
            t0 = time.perf_counter()
            _gen_overlap(spark, pdir, n, 1000, 64, sigma)
            gen_sec = round(time.perf_counter() - t0, 2)
            emb = spark.read.parquet(pdir)
            point = _escalation_point(spark, emb, sigma, fracs)
            point["gen_sec"] = gen_sec
            out["points"][str(sigma)] = point
        finally:
            shutil.rmtree(pdir, ignore_errors=True)
    return out


def cmd_ann_overlap_knee2() -> dict:
    n = int(os.environ.get("SPARK_GRAFT_ANN_N", "1000000"))
    sigmas = [
        float(s) for s in os.environ.get("SPARK_GRAFT_ANN_SIGMAS", "0.6,0.65").split(",")
    ]
    spark = _session(10.0)
    out: dict = {"n_corpus": n, "n_clusters_true": 1000, "points": {}}
    for sigma in sigmas:
        pdir = os.path.join(OVERLAP_DIR, f"sigma{sigma}-knee")
        try:
            t0 = time.perf_counter()
            _gen_overlap(spark, pdir, n, 1000, 64, sigma)
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


def cmd_funnel_gap_attrib() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.plans import curation
    from wnba_data_pipeline_spark.sources.sinks import read_table

    out: dict = {"sf_dir": sf_dir}
    base = tempfile.mkdtemp(prefix="curation-gap-", dir="/dev/shm")
    try:
        stages: dict = {}
        seams: dict = {}
        t0 = time.perf_counter()
        curation.run_curation(
            spark, sf_dir, base, stage_seconds=stages, near_dedup_seconds=seams
        )
        out["batch_total_sec"] = round(time.perf_counter() - t0, 2)
        out["batch_stage_sec"] = stages
        out["near_dedup_seam_sec"] = seams
        nd = read_table(spark, os.path.join(base, "curation", "near_deduped"))
        row = nd.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_id") % 1_000_003).alias("h"),
        ).collect()[0]
        out["survivors"] = int(row["n"])
        out["survivor_hash"] = int(row["h"] or 0)
        out["matches_r13"] = (
            out["survivors"] == R13_SURVIVORS
            and out["survivor_hash"] == R13_SURVIVOR_HASH
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def cmd_inc_shipped100() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    n_batches = int(os.environ.get("SPARK_GRAFT_INC_BATCHES", "5"))
    spark = _session(_sf(sf_dir))

    from wnba_data_pipeline_spark.plans import curation

    out: dict = {"sf_dir": sf_dir, "n_batches": n_batches}
    base = tempfile.mkdtemp(prefix="curation-incr14-", dir="/dev/shm")
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


# ---------------------------------------------------------------------------
# encode / fit-residual fusion A/Bs
# ---------------------------------------------------------------------------


def cmd_encode_fuse_ab() -> dict:
    spark = _session(10.0)
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq

    emb = _fit_corpus(spark)
    # one fixed index (shipped defaults) shared by both arms
    os.environ.pop("SPARK_GRAFT_ENCODE_FUSED", None)
    index = pq.ivfpq_fit(emb)
    out: dict = {"n_cells": len(index.coarse), "arms": {}}
    fps = {}
    trials = int(os.environ.get("SPARK_GRAFT_STAGE_TRIALS", "3"))
    walls: dict[str, list] = {"three_stage": [], "fused": []}
    # arms INTERLEAVED per trial (round-14 fix: sequential arms measured
    # monotonically growing walls — heap/page-cache drift, not the dial),
    # and the WALL is persist+count (the r13 fit_attrib/encode methodology)
    # with the identity fingerprint computed OFF the clock from the
    # persisted frame — the first cut timed the fingerprint agg itself,
    # whose codes→array<string>→string cast dominated both arms
    for _ in range(trials):
        for arm, flag in (("three_stage", "0"), ("fused", "1")):
            os.environ["SPARK_GRAFT_ENCODE_FUSED"] = flag
            enc = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
            t0 = time.perf_counter()
            n = enc.count()
            walls[arm].append(round(time.perf_counter() - t0, 2))
            row = enc.agg(
                F.sum(
                    F.xxhash64(
                        "vec_id", "cell", F.col("codes").cast("array<string>").cast("string")
                    )
                    % 1_000_003
                ).alias("h")
            ).collect()[0]
            fps[arm] = (int(n), int(row["h"] or 0))
            enc.unpersist()
    os.environ.pop("SPARK_GRAFT_ENCODE_FUSED", None)
    for arm in ("three_stage", "fused"):
        ws = sorted(walls[arm])
        out["arms"][arm] = {
            "walls": ws,
            "median_sec": ws[len(ws) // 2],
            "min_sec": ws[0],
            "n": fps[arm][0],
            "fingerprint": fps[arm][1],
        }
    out["cells_codes_identical"] = fps["three_stage"] == fps["fused"]
    out["speedup"] = round(
        out["arms"]["three_stage"]["median_sec"]
        / max(out["arms"]["fused"]["median_sec"], 1e-9),
        2,
    )
    out["speedup_min"] = round(
        out["arms"]["three_stage"]["min_sec"] / max(out["arms"]["fused"]["min_sec"], 1e-9), 2
    )
    return out


def cmd_fit_resfuse_ab() -> dict:
    """Warm-up + interleaved arms (round-14 fix over the first cut: the
    sequential chain-then-fused order measured JVM/page-cache warm-up, not
    the fusion — coarse-iteration walls of IDENTICAL code differed 2.9×
    between arms). One untimed warm-up fit, then chain/fused alternating
    twice; per-arm minima compared, per-phase timings kept per trial."""
    spark = _session(10.0)
    from wnba_data_pipeline_spark.operators import pq

    emb = _fit_corpus(spark)
    out: dict = {"arms": {}}
    os.environ.pop("SPARK_GRAFT_ENCODE_FUSED", None)
    t0 = time.perf_counter()
    pq.ivfpq_fit(emb)  # untimed warm-up
    out["warmup_sec"] = round(time.perf_counter() - t0, 2)
    trials: dict[str, list] = {"chain": [], "fused": []}
    fps: dict[str, str] = {}
    for _ in range(2):
        for arm, flag in (("chain", "0"), ("fused", "1")):
            os.environ["SPARK_GRAFT_ENCODE_FUSED"] = flag
            timings: dict = {}
            t0 = time.perf_counter()
            index = pq.ivfpq_fit(emb, timings=timings)
            trials[arm].append(
                {"fit_sec": round(time.perf_counter() - t0, 2), "timings": timings}
            )
            fps[arm] = _codebook_fingerprint(index)
    os.environ.pop("SPARK_GRAFT_ENCODE_FUSED", None)
    for arm in ("chain", "fused"):
        best = min(trials[arm], key=lambda t: t["fit_sec"])
        out["arms"][arm] = {
            "fit_sec_min": best["fit_sec"],
            "fit_sec_all": [t["fit_sec"] for t in trials[arm]],
            "residual_sec_all": [t["timings"].get("residual_sec") for t in trials[arm]],
            "best_timings": best["timings"],
            "fingerprint": fps[arm],
        }
    a, b = out["arms"]["chain"], out["arms"]["fused"]
    out["codebooks_identical"] = a["fingerprint"] == b["fingerprint"]
    out["residual_sec_min_chain"] = min(x for x in a["residual_sec_all"] if x is not None)
    out["residual_sec_min_fused"] = min(x for x in b["residual_sec_all"] if x is not None)
    out["speedup_total"] = round(a["fit_sec_min"] / max(b["fit_sec_min"], 1e-9), 2)
    return out


def cmd_sig_arrow_ab() -> dict:
    """The funnel's biggest remaining near-dedup term is the candidate
    step (~70-80 s at sf100), whose map side is the K=16 SIGNATURE pass —
    interpreted higher-order expressions at the default geometry (the
    Arrow numpy pass only engages at K ≥ 32, a round-11 decision measured
    when K=48 was the question). Re-ask at the DEFAULT geometry:
    ``SPARK_GRAFT_SIG_ARROW`` forced on/off, arms interleaved per trial,
    candidate fingerprints compared (identical by the tested byte-identity
    contract). Decision input for flipping the default at K=16."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    trials = int(os.environ.get("SPARK_GRAFT_STAGE_TRIALS", "3"))
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from bench_r12 import _funnel_corpus
    from wnba_data_pipeline_spark.operators import dedup

    corpus = _funnel_corpus(spark, sf_dir)
    shingled = dedup.shingle_docs(corpus, hh_only=True).persist()
    shingled.count()
    out: dict = {"sf_dir": sf_dir, "trials": trials, "arms": {}}
    walls: dict[str, list] = {"expr": [], "arrow": []}
    fps: dict = {}

    def _fingerprint(cand):
        row = cand.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_a", "doc_b") % 1_000_003).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    for _ in range(trials):
        for arm, flag in (("expr", "0"), ("arrow", "1")):
            os.environ["SPARK_GRAFT_SIG_ARROW"] = flag
            t0 = time.perf_counter()
            fps[arm] = _fingerprint(dedup.minhash_candidates(shingled))
            walls[arm].append(round(time.perf_counter() - t0, 2))
    os.environ.pop("SPARK_GRAFT_SIG_ARROW", None)
    for arm in ("expr", "arrow"):
        ws = sorted(walls[arm])
        out["arms"][arm] = {
            "walls": ws,
            "median_sec": ws[len(ws) // 2],
            "min_sec": ws[0],
            "n_candidates": fps[arm][0],
            "cand_hash": fps[arm][1],
        }
    out["candidates_identical"] = fps["expr"] == fps["arrow"]
    out["speedup_median"] = round(
        out["arms"]["expr"]["median_sec"] / max(out["arms"]["arrow"]["median_sec"], 1e-9), 2
    )
    out["speedup_min"] = round(
        out["arms"]["expr"]["min_sec"] / max(out["arms"]["arrow"]["min_sec"], 1e-9), 2
    )
    shingled.unpersist()
    return out


def main() -> None:
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    cmd = sys.argv[1] if len(sys.argv) > 1 else "connect_probe"
    fn = {
        "ann_escalation_sweep": cmd_ann_escalation_sweep,
        "ann_overlap_knee2": cmd_ann_overlap_knee2,
        "funnel_gap_attrib": cmd_funnel_gap_attrib,
        "inc_shipped100": cmd_inc_shipped100,
        "encode_fuse_ab": cmd_encode_fuse_ab,
        "fit_resfuse_ab": cmd_fit_resfuse_ab,
        "sig_arrow_ab": cmd_sig_arrow_ab,
        "funnel_guard": cmd_funnel_guard,
        "connect_probe": cmd_connect_probe,
    }[cmd]
    print(json.dumps({cmd: fn()}))


if __name__ == "__main__":
    main()
