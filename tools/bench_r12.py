"""Round-12 scale probes — produces the raw sections of BENCH_SCALE_r12.json.

Subcommands (argv[1]):

  funnel_ab100     VERDICT r11 item 1's done-gate: the sf100 batch curation
                   funnel A/B with the Arrow shingle twin OFF vs ON
                   (SPARK_GRAFT_SHINGLE_ARROW) — per-stage walls from
                   run_curation's own stage_seconds hook, survivor sets
                   hash-compared across arms (the twin is a physical
                   switch; identical values asserted, not assumed).
  stages100        VERDICT r11 item 4: per-stage attribution of the sf100
                   near-dedup wall (shingle materialization / signature+
                   band keys / LSH candidates / exact-Jaccard verify /
                   components+survivors), in BOTH shingle arms, plus the
                   r8 hashed-verify negative re-tested at the decade
                   (verify over the md5-int64 ``hh`` arrays vs the string
                   ``sh`` arrays — everything around it got 3-4x faster
                   since sf30).
  ann_clustered1m  VERDICT r11 item 3: the IVF-PQ auto dials
                   (ivfpq_cells_for / ivfpq_nprobe_for / auto-rerank)
                   recall-graded on a PLANTED-CLUSTER corpus at 1 M
                   vectors — the structured-data case the 20 k probe
                   measured 0.952 on, three decades up. Pure defaults;
                   done-gate >= 0.8 recall@10.
  headline_ab      VERDICT r11 item 5: same-session sf0.1 headline A/B of
                   the round-10 tree (commit 2e7efe2) vs HEAD — bench.py
                   run interleaved HEAD/r10 x3 from two checkouts in ONE
                   machine session, per-query minima compared, to retire
                   (or confirm) the +5.6% cross-session drift question.
  funnel_guard     the ladder guard (test_funnel_ladder_stays_sublinear_
                   per_doc) EXECUTED via pytest with SPARK_GRAFT_SLOW=1 —
                   the round-12 assembler REFUSES to emit BENCH_SCALE_r12
                   without a passing block (VERDICT r11 item 7).
  connect_probe    VERDICT r11 item 8: record whether this environment
                   gained the Spark Connect client deps (grpcio/protobuf)
                   so the opt-in end-to-end test can run the moment it
                   does.

Methodology matches bench_r09..r11: one JVM per subcommand, plans built
once, /dev/shm hygiene per the r9 RAM postmortem (probe dirs cleaned in
finally blocks).
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

SF100 = "/root/repo/.benchdata/sf100"
R10_COMMIT = "2e7efe2"  # round 10: verdict/advice/correctness/bench


def _funnel_corpus(spark, sf_dir):
    """The funnel's post-exact-dedup corpus (same prep as the r09-r11
    sf100 pair probes)."""
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import dedup
    from wnba_data_pipeline_spark.operators.text import quality_score_col, sample_gate
    from wnba_data_pipeline_spark.plans.curation import QUALITY_MIN
    from wnba_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.withColumn("quality_score", quality_score_col("text")).filter(
        F.col("quality_score") >= QUALITY_MIN
    )
    return (
        dedup.exact_survivors(sample_gate(kept))
        .select("doc_id")
        .join(docs.select("doc_id", "text"), "doc_id")
    )


def _pairs_hash(df) -> tuple[int, int]:
    """(count, xor-free order-insensitive value hash) over pair rows."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_a", "doc_b", "jaccard") % 1_000_003).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def _survivor_hash(spark, path: str) -> tuple[int, int]:
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.sources.sinks import read_table

    row = (
        read_table(spark, path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_id") % 1_000_003).alias("h"),
        )
        .collect()[0]
    )
    return int(row["n"]), int(row["h"] or 0)


def cmd_funnel_ab100() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    spark = _session(_sf(sf_dir))

    from wnba_data_pipeline_spark.plans import curation

    out: dict = {"sf_dir": sf_dir, "arms": {}}
    for arm, flag in (("expression", "0"), ("arrow", "1")):
        os.environ["SPARK_GRAFT_SHINGLE_ARROW"] = flag
        base = tempfile.mkdtemp(prefix=f"funnel-ab-{arm}-", dir="/dev/shm")
        try:
            stage_seconds: dict = {}
            t0 = time.perf_counter()
            curation.run_curation(spark, sf_dir, base, stage_seconds=stage_seconds)
            total = round(time.perf_counter() - t0, 2)
            n, h = _survivor_hash(spark, f"{base}/curation/near_deduped")
            out["arms"][arm] = {
                "total_sec": total,
                "stage_sec": stage_seconds,
                "n_survivors": n,
                "survivor_hash": h,
            }
        finally:
            shutil.rmtree(base, ignore_errors=True)
    os.environ.pop("SPARK_GRAFT_SHINGLE_ARROW", None)
    a, e = out["arms"]["arrow"], out["arms"]["expression"]
    out["survivors_identical"] = (
        a["n_survivors"] == e["n_survivors"] and a["survivor_hash"] == e["survivor_hash"]
    )
    out["near_dedup_speedup"] = round(
        e["stage_sec"]["near_dedup"] / max(a["stage_sec"]["near_dedup"], 1e-9), 2
    )
    return out


def cmd_stages100() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import dedup
    from wnba_data_pipeline_spark.operators.graph import cluster_survivors

    corpus = _funnel_corpus(spark, sf_dir).persist()
    n_docs = corpus.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "arms": {}}

    for arm, flag in (("expression", "0"), ("arrow", "1")):
        os.environ["SPARK_GRAFT_SHINGLE_ARROW"] = flag
        arm_out: dict = {}
        t0 = time.perf_counter()
        shingled = dedup.shingle_docs(corpus).persist()
        n_sh = shingled.count()
        arm_out["shingle_mat_sec"] = round(time.perf_counter() - t0, 2)
        arm_out["n_shingled"] = n_sh

        t0 = time.perf_counter()
        n_band = dedup.banded_keys(shingled).count()
        arm_out["band_keys_sec"] = round(time.perf_counter() - t0, 2)
        arm_out["n_band_rows"] = n_band

        t0 = time.perf_counter()
        cand = dedup.minhash_candidates(shingled).persist()
        n_cand = cand.count()
        arm_out["candidates_sec"] = round(time.perf_counter() - t0, 2)
        arm_out["n_candidates"] = n_cand

        # exact-Jaccard verify over the persisted candidates: string-array
        # form (production) vs md5-int64 hashed-array form (the r8
        # negative, re-tested at the decade). Values: identical unless two
        # distinct shingles of one pair collide in 60-bit md5 space —
        # recorded, not assumed.
        sh_a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        sh_b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        ver_sh = (
            cand.join(sh_a, "doc_a")
            .join(sh_b, "doc_b")
            .withColumn(
                "jaccard",
                F.round(
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= 0.5)
            .select("doc_a", "doc_b", "jaccard")
        )
        t0 = time.perf_counter()
        n_p, h_p = _pairs_hash(ver_sh)
        arm_out["verify_sh_sec"] = round(time.perf_counter() - t0, 2)
        arm_out["n_pairs"] = n_p
        arm_out["pairs_hash"] = h_p

        hh_a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("hh").alias("hh_a"))
        hh_b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("hh").alias("hh_b"))
        ver_hh = (
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
        n_ph, h_ph = _pairs_hash(ver_hh)
        arm_out["verify_hh_sec"] = round(time.perf_counter() - t0, 2)
        arm_out["n_pairs_hh"] = n_ph
        arm_out["pairs_hash_hh"] = h_ph
        arm_out["hh_values_identical"] = (n_ph, h_ph) == (n_p, h_p)

        # components + survivor anti-join (pairs re-derived through the
        # production plan so the persisted cand is released first)
        t0 = time.perf_counter()
        pairs = dedup.minhash_pairs(corpus, shingled=shingled)
        losers = (
            cluster_survivors(pairs)
            .filter(~F.col("is_survivor"))
            .select(F.col("id").alias("doc_id"))
        )
        n_surv = corpus.join(losers, "doc_id", "left_anti").count()
        arm_out["components_survivors_sec"] = round(time.perf_counter() - t0, 2)
        arm_out["n_survivors"] = n_surv

        cand.unpersist()
        shingled.unpersist()
        out["arms"][arm] = arm_out
    os.environ.pop("SPARK_GRAFT_SHINGLE_ARROW", None)
    a, e = out["arms"]["arrow"], out["arms"]["expression"]
    out["pairs_identical_across_arms"] = (
        a["n_pairs"] == e["n_pairs"] and a["pairs_hash"] == e["pairs_hash"]
    )
    corpus.unpersist()
    return out


ANN_DIR = "/root/repo/.benchdata/ann_clustered_1m"


def _gen_clustered(spark, n: int, n_clusters: int, dim: int) -> None:
    """Deterministic planted-cluster corpus, generated distributively:
    centers ~ N(0, 5) (driver, seeded), each vector = center[vec_id %
    n_clusters] + N(0, 1) noise from a per-row counter-seeded Generator —
    reshuffle-proof, no partition-index dependence."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 5.0, (n_clusters, dim))

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
                    "label": (ids % n_clusters).astype("int64"),
                }
            )

    df = spark.range(0, n, 1, 64).mapInPandas(
        _batch, "vec_id long, embedding array<double>, label long"
    )
    df.write.mode("overwrite").parquet(os.path.join(ANN_DIR, "embeddings.parquet"))


def cmd_ann_clustered1m() -> dict:
    n = int(os.environ.get("SPARK_GRAFT_ANN_N", "1000000"))
    n_clusters = int(os.environ.get("SPARK_GRAFT_ANN_CLUSTERS", "1000"))
    n_queries = 100
    spark = _session(10.0)  # big-scale session posture

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq

    if not os.path.exists(os.path.join(ANN_DIR, "embeddings.parquet")):
        t0 = time.perf_counter()
        _gen_clustered(spark, n, n_clusters, 64)
        gen_sec = round(time.perf_counter() - t0, 2)
    else:
        gen_sec = 0.0
    emb = spark.read.parquet(os.path.join(ANN_DIR, "embeddings.parquet"))
    n_corpus = emb.count()

    out: dict = {
        "n_corpus": n_corpus,
        "n_clusters_true": n_clusters,
        "n_queries": n_queries,
        "gen_sec": gen_sec,
    }
    t0 = time.perf_counter()
    index = pq.ivfpq_fit(emb)  # pure defaults — the dials under test
    out["fit_sec"] = round(time.perf_counter() - t0, 2)
    out["n_cells"] = len(index.coarse)
    out["auto_nprobe"] = pq.ivfpq_nprobe_for(len(index.coarse))
    out["probed_fraction"] = round(out["auto_nprobe"] / out["n_cells"], 4)

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
    for r in pq.ivfpq_search(corpus, q, index, k=10).collect():  # pure defaults
        got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    out["search_sec"] = round(time.perf_counter() - t0, 2)
    hits = sum(len(truth[qid] & got.get(qid, set())) for qid in truth)
    out["recall_at_10_defaults"] = round(hits / denom, 4)
    corpus.unpersist()
    return out


def cmd_headline_ab() -> dict:
    """Interleaved HEAD/r10 bench.py runs in one machine session; minima
    per query per tree. bench.py itself reports warm best-of-8 inside one
    JVM; interleaving the trees controls for machine state drift BETWEEN
    sessions — the question r11 left open."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))
    tree = Path("/root/repo/.benchdata/ab_r10_tree")
    if tree.exists():
        shutil.rmtree(tree)
    tree.mkdir(parents=True)
    subprocess.run(
        f"git archive {R10_COMMIT} | tar -x -C {tree}",
        shell=True,
        cwd=str(_REPO),
        check=True,
    )

    def _run(cwd: Path) -> dict:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        proc = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=str(cwd),
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        for line in reversed((proc.stdout or "").strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        raise RuntimeError(f"no JSON from bench.py in {cwd}: {proc.stderr[-500:]}")

    runs: dict = {"head": [], "r10": []}
    for _ in range(rounds):
        runs["head"].append(_run(_REPO))
        runs["r10"].append(_run(tree))
    out: dict = {"sf_dir": sf_dir, "rounds": rounds, "r10_commit": R10_COMMIT}
    for name, rr in runs.items():
        qmins = {
            qk: round(min(r["queries"][qk] for r in rr), 4) for qk in rr[0]["queries"]
        }
        out[name] = {
            "total_min": round(min(r["value"] for r in rr), 4),
            "total_of_query_mins": round(sum(qmins.values()), 4),
            "per_query_min": qmins,
            "totals": [round(r["value"], 4) for r in rr],
        }
    out["head_vs_r10"] = round(
        out["head"]["total_of_query_mins"] / out["r10"]["total_of_query_mins"], 4
    )
    shutil.rmtree(tree, ignore_errors=True)
    return out


def cmd_cc_distributed100() -> dict:
    """The distributed connected-components loop at the decade: the sf100
    organic pair graph (86.5 k edges) sits under DRIVER_CC_MAX_EDGES, so
    every funnel rung so far labeled components in driver-local
    union-find milliseconds — but a true 100 TB corpus's pair graph WILL
    exceed the gate and take the pointer-doubling loop, which until now
    was pytest-scale only. Force the distributed path on the real sf100
    pairs (driver_max_edges=0), measure its wall and round count, and
    assert label-for-label equality with the driver path."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import dedup
    from wnba_data_pipeline_spark.operators.graph import connected_components

    corpus = _funnel_corpus(spark, sf_dir)
    pairs = (
        dedup.minhash_pairs(corpus, verify="hh")
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .persist()
    )
    n_edges = pairs.count()
    out: dict = {"sf_dir": sf_dir, "n_edges": n_edges}

    t0 = time.perf_counter()
    driver_labels = {
        (r["id"], r["comp"]) for r in connected_components(pairs).collect()
    }
    out["driver_path_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    dist = connected_components(pairs, driver_max_edges=0)
    dist_labels = {(r["id"], r["comp"]) for r in dist.collect()}
    out["distributed_path_sec"] = round(time.perf_counter() - t0, 2)
    out["n_vertices"] = len(dist_labels)
    out["labels_identical"] = driver_labels == dist_labels
    pairs.unpersist()
    return out


# the funnel_ab100 arms' survivor fingerprint (n, order-insensitive hash):
# the shipped-defaults run must reproduce it — the adoption of Arrow
# shingles + hh verify is a physical change, so the survivors are asserted
# identical to the measured A/B, not assumed
AB_SURVIVORS = (2842712, 1065605201)


def cmd_shipped100() -> dict:
    """The SHIPPED configuration at sf100 (round 12: Arrow shingles
    default-ON + hh verify in the funnel) — batch funnel stage walls,
    incremental per-batch walls over the hh signature index, survivor
    sym-diff between the two, and the survivor fingerprint cross-checked
    against the funnel_ab100 arms'."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    n_batches = int(os.environ.get("SPARK_GRAFT_INC_BATCHES", "5"))
    spark = _session(_sf(sf_dir))

    from wnba_data_pipeline_spark.plans import curation
    from wnba_data_pipeline_spark.sources.sinks import read_table

    out: dict = {"sf_dir": sf_dir, "n_batches": n_batches}
    base = tempfile.mkdtemp(prefix="curation-shipped-", dir="/dev/shm")
    try:
        t0 = time.perf_counter()
        stage_seconds: dict = {}
        curation.run_curation(spark, sf_dir, base, stage_seconds=stage_seconds)
        out["batch_total_sec"] = round(time.perf_counter() - t0, 2)
        out["batch_stage_sec"] = stage_seconds
        n, h = _survivor_hash(spark, f"{base}/curation/near_deduped")
        out["batch_survivors"] = n
        out["batch_survivor_hash"] = h
        out["matches_funnel_ab100_arms"] = (n, h) == AB_SURVIVORS

        walls: list = []
        t0 = time.perf_counter()
        curation.run_curation_incremental(
            spark, sf_dir, base, n_batches=n_batches, batch_walls=walls
        )
        out["incremental_total_sec"] = round(time.perf_counter() - t0, 2)
        out["incremental_batch_sec"] = walls
        b = {
            r["doc_id"]
            for r in read_table(spark, f"{base}/curation/near_deduped")
            .select("doc_id")
            .collect()
        }
        i = {
            r["doc_id"]
            for r in read_table(spark, f"{base}/curation_inc/near_deduped")
            .select("doc_id")
            .collect()
        }
        out["survivors_incremental"] = len(i)
        out["survivor_sym_diff"] = len(b ^ i)
    finally:
        shutil.rmtree(base, ignore_errors=True)
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
    cmd = sys.argv[1] if len(sys.argv) > 1 else "connect_probe"
    fn = {
        "funnel_ab100": cmd_funnel_ab100,
        "stages100": cmd_stages100,
        "ann_clustered1m": cmd_ann_clustered1m,
        "headline_ab": cmd_headline_ab,
        "shipped100": cmd_shipped100,
        "cc_distributed100": cmd_cc_distributed100,
        "funnel_guard": cmd_funnel_guard,
        "connect_probe": cmd_connect_probe,
    }[cmd]
    print(json.dumps({cmd: fn()}))


if __name__ == "__main__":
    main()
