"""Round-9 scale probes — produces the raw sections of BENCH_SCALE_r09.json.

Subcommands (argv[1]):

  rangebins    per-stage attribution of the range_join_bins difference-of-
               cumulatives shape on the bucketed layout (VERDICT r8 item 2:
               the 1.41x @ sf10 -> 2.06x @ sf30 drift): scan -> one
               cumulative count frame -> both count frames -> full fused
               (2 counts + 2 fixed-point sums) -> registry query; plus the
               per-stage DuckDB twin so the drift attributes to a stage,
               not a total.
  minhash_probe candidate-generation anatomy for the MinHash funnel at
               $SPARK_GRAFT_SF_DIR (VERDICT r8 item 3): band-bucket size
               distribution, candidate count, estimated-Jaccard histogram
               of candidates (signature agreement), and survivor count —
               the measurement that picks geometry-tuning vs DF-pruning.
  hardneg_recall hard_negatives_bucketed recall vs the exact twin at
               $SPARK_GRAFT_SF_DIR (VERDICT r8 item 5).

Methodology matches bench.py: plans built once, warm best-of-N, noop sink,
min/median/max published.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spread(df) -> dict[str, float]:
    _force(df)
    for _ in range(WARMUPS):
        _force(df)
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _force(df)
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return {
        "min": round(runs[0], 4),
        "median": round(runs[len(runs) // 2], 4),
        "max": round(runs[-1], 4),
    }


def _spread_duck(con, sql: str) -> dict[str, float]:
    def run() -> None:
        con.execute(f"CREATE TEMP TABLE _bench_out AS {sql}")
        con.execute("DROP TABLE _bench_out")

    for _ in range(WARMUPS):
        run()
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return {
        "min": round(runs[0], 4),
        "median": round(runs[len(runs) // 2], 4),
        "max": round(runs[-1], 4),
    }


def _session(sf: float | None):
    from wnba_data_pipeline_spark.session import ensure_confs, get_spark

    big = sf is not None and sf >= 0.5
    spark = get_spark(
        "wnba-r09-probes",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "32" if big else "8")),
        extra_confs={
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.files.maxPartitionBytes": "48m" if (sf or 0) >= 5 else "4m",
            "spark.sql.files.openCostInBytes": "256k",
            "spark.local.dir": os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-bench-local"),
        },
    )
    ensure_confs(spark)
    return spark


def _sf(sf_dir: str) -> float | None:
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    return float(m.group(1)) if m else None


def cmd_rangebins() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf30")
    sf = _sf(sf_dir)
    spark = _session(sf)

    import duckdb
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import relational, temporal
    from wnba_data_pipeline_spark.plans.catalog import ensure_bucketed_layout

    out: dict = {"sf_dir": sf_dir, "sf": sf}
    # events only: this probe never touches the lineitem family, and the
    # sf100 lineitem clustered write is a 14 GB sort this box pays for
    # nothing (the full-matrix OOM lesson)
    ensure_bucketed_layout(
        spark, sf_dir, n_buckets=32 if (sf or 0) >= 0.5 else 8, tables=("events",)
    )
    os.environ["SPARK_GRAFT_LAYOUT"] = "bucketed"
    try:
        ev = relational._layout_table(spark, sf_dir, "events")
        fp = "cast(floor(value * 1000000 + 0.5d) as long)"
        lt_now = (
            "PARTITION BY user_id ORDER BY ts RANGE BETWEEN UNBOUNDED "
            "PRECEDING AND INTERVAL '0.000001' SECOND PRECEDING"
        )
        lt_cut = (
            "PARTITION BY user_id ORDER BY ts RANGE BETWEEN UNBOUNDED "
            "PRECEDING AND INTERVAL '86400.000001' SECOND PRECEDING"
        )
        scan = ev.select("event_id", "user_id", "ts", "event_type", "value")
        one_count = ev.select(
            "event_id", F.expr(f"count(1) OVER ({lt_now})").alias("_n")
        )
        two_counts = ev.select(
            "event_id",
            (F.expr(f"count(1) OVER ({lt_now})") - F.expr(f"count(1) OVER ({lt_cut})")).alias("_n"),
        )
        one_sum = ev.select(
            "event_id", F.expr(f"sum({fp}) OVER ({lt_now})").alias("_s")
        )
        full = temporal.q_range_join_bins(spark, sf_dir)
        out["bucketed_stages"] = {
            "scan_5col": _spread(scan),
            "one_cumulative_count": _spread(one_count),
            "two_count_frames": _spread(two_counts),
            "one_cumulative_sum_fp": _spread(one_sum),
            "full_query": _spread(full),
        }
        ep = full._jdf.queryExecution().executedPlan().toString()
        out["full_plan"] = {
            "n_parquet_scans": ep.count("Scan parquet"),
            "exchange": "Exchange" in ep,
            "sort": "Sort [" in ep,
        }
    finally:
        del os.environ["SPARK_GRAFT_LAYOUT"]

    # DuckDB per-stage twins (same cumulative-frame shapes) so the drift
    # attributes stage-by-stage, not total-vs-total
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    d_now = "PARTITION BY user_id ORDER BY ts RANGE BETWEEN UNBOUNDED PRECEDING AND INTERVAL 1 MICROSECOND PRECEDING"
    d_cut = "PARTITION BY user_id ORDER BY ts RANGE BETWEEN UNBOUNDED PRECEDING AND INTERVAL (86400000001) MICROSECOND PRECEDING"
    out["duckdb_stages"] = {
        "one_cumulative_count": _spread_duck(
            con, f"SELECT event_id, count(1) OVER ({d_now}) AS _n FROM events"
        ),
        "two_count_frames": _spread_duck(
            con,
            f"SELECT event_id, count(1) OVER ({d_now}) - count(1) OVER ({d_cut}) AS _n FROM events",
        ),
        "full_query": _spread_duck(con, temporal.ORACLES["range_join_bins"]),
    }
    return out


def cmd_minhash_probe() -> dict:
    """Anatomy of the funnel's near-dedup candidates on the post-exact-dedup
    corpus (the frame minhash_pairs actually sees inside run_curation)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf30")
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import dedup
    from wnba_data_pipeline_spark.operators.text import quality_score_col, sample_gate
    from wnba_data_pipeline_spark.plans.curation import QUALITY_MIN
    from wnba_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.withColumn("quality_score", quality_score_col("text")).filter(
        F.col("quality_score") >= QUALITY_MIN
    )
    sampled = sample_gate(kept)
    corpus = dedup.exact_survivors(sampled).select("doc_id").join(
        docs.select("doc_id", "text"), "doc_id"
    )
    shingled = dedup.shingle_docs(corpus).persist()
    n_docs = shingled.count()

    banded = shingled.select(
        "doc_id",
        F.explode(F.array(*dedup._minhash_band_keys(F.col("sh")))).alias("band_key"),
    )
    sizes = banded.groupBy("band_key").agg(F.count(F.lit(1)).alias("n")).persist()
    bucket_hist = {
        str(r["bucket"]): int(r["cnt"])
        for r in sizes.select(
            F.floor(F.log2("n")).alias("bucket")
        ).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    top = [
        {"band_key": r["band_key"][:40], "n": int(r["n"])}
        for r in sizes.orderBy(F.col("n").desc()).limit(10).collect()
    ]
    n_cand_pairs = int(
        sizes.agg(F.sum(F.col("n") * (F.col("n") - 1) / 2)).collect()[0][0]
    )
    sizes.unpersist()

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .persist()
    )
    n_cand = cand.count()

    # exact-Jaccard histogram of the candidates: how much verification work
    # lands below the 0.5 threshold (the S-curve's false-candidate mass)
    sh_a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("j")
        )
    )
    hist = {
        str(r["bin"]): int(r["cnt"])
        for r in jac.select(F.floor(F.col("j") * 10).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    cand.unpersist()
    shingled.unpersist()
    return {
        "sf_dir": sf_dir,
        "n_docs_into_near_dedup": n_docs,
        "n_candidate_pairs_distinct": n_cand,
        "n_candidate_pairs_from_buckets": n_cand_pairs,
        "band_bucket_log2_size_hist": bucket_hist,
        "top_buckets": top,
        "candidate_exact_jaccard_decile_hist": hist,
    }


def cmd_minhash_ab() -> dict:
    """A/B of the round-9 band geometry change (12 hashes / 4 bands x 3 rows
    -> 16 hashes / 4 bands x 4 rows) on the funnel's post-exact-dedup
    corpus: candidate volume, near-dedup stage wall, and the survivor-set
    delta (the quantified recall cost the sharper S-curve pays)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf30")
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.functions.hashing import minhash_coeffs
    from wnba_data_pipeline_spark.operators import dedup
    from wnba_data_pipeline_spark.operators.graph import cluster_survivors
    from wnba_data_pipeline_spark.operators.text import quality_score_col, sample_gate
    from wnba_data_pipeline_spark.plans.curation import QUALITY_MIN
    from wnba_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.withColumn("quality_score", quality_score_col("text")).filter(
        F.col("quality_score") >= QUALITY_MIN
    )
    corpus = (
        dedup.exact_survivors(sample_gate(kept))
        .select("doc_id")
        .join(docs.select("doc_id", "text"), "doc_id")
        .persist()
    )
    n_docs = corpus.count()
    shingled = dedup.shingle_docs(corpus).persist()
    shingled.count()

    out: dict = {"sf_dir": sf_dir, "n_docs_into_near_dedup": n_docs}
    losers: dict[str, set] = {}
    pairs_sets: dict[str, set] = {}
    for name, kw in (
        ("old_12x3", {"coeffs": minhash_coeffs(12), "band_rows": 3}),
        ("new_16x4", {}),
    ):
        t0 = time.perf_counter()
        pairs = dedup.minhash_pairs(corpus, shingled=shingled, **kw)
        surv = cluster_survivors(pairs)
        lose = {
            r["id"] for r in surv.filter(~F.col("is_survivor")).select("id").collect()
        }
        wall = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        pair_rows = {(r["doc_a"], r["doc_b"]) for r in pairs.select("doc_a", "doc_b").collect()}
        pairs_wall = round(time.perf_counter() - t0, 2)
        losers[name] = lose
        pairs_sets[name] = pair_rows
        out[name] = {
            "pairs_to_survivors_sec": wall,
            "pairs_only_sec": pairs_wall,
            "n_verified_pairs": len(pair_rows),
            "n_losers": len(lose),
        }
    out["survivor_delta"] = {
        "losers_only_old": len(losers["old_12x3"] - losers["new_16x4"]),
        "losers_only_new": len(losers["new_16x4"] - losers["old_12x3"]),
        "verified_pairs_only_old": len(pairs_sets["old_12x3"] - pairs_sets["new_16x4"]),
        "verified_pairs_only_new": len(pairs_sets["new_16x4"] - pairs_sets["old_12x3"]),
    }
    shingled.unpersist()
    corpus.unpersist()
    return out


def cmd_minhash_stages() -> dict:
    """Stage-level decomposition of the pair pipeline per geometry x gate:
    signature/band map wall, candidate count + wall (gate on/off), full
    verified-pairs wall — the measurement that explains (or convicts) the
    round-9 geometry change and the hot-bucket gate's overhead."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf30")
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.functions.hashing import minhash_coeffs
    from wnba_data_pipeline_spark.operators import dedup
    from wnba_data_pipeline_spark.operators.text import quality_score_col, sample_gate
    from wnba_data_pipeline_spark.plans.curation import QUALITY_MIN
    from wnba_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.withColumn("quality_score", quality_score_col("text")).filter(
        F.col("quality_score") >= QUALITY_MIN
    )
    corpus = (
        dedup.exact_survivors(sample_gate(kept))
        .select("doc_id")
        .join(docs.select("doc_id", "text"), "doc_id")
        .persist()
    )
    n_docs = corpus.count()
    shingled = dedup.shingle_docs(corpus).persist()
    shingled.count()

    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs}
    for name, kw in (
        ("old_12x3", {"coeffs": minhash_coeffs(12), "band_rows": 3}),
        ("new_16x4", {}),
    ):
        sec: dict = {}
        banded = shingled.select(
            "doc_id",
            F.explode(
                F.array(*dedup._minhash_band_keys(F.col("sh"), **kw))
            ).alias("band_key"),
        )
        t0 = time.perf_counter()
        n_banded = banded.count()
        sec["sig_bands_map"] = round(time.perf_counter() - t0, 2)

        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        t0 = time.perf_counter()
        n_cand = cand.count()
        sec["candidates_nogate"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        n_pairs_off = dedup.minhash_pairs(
            corpus, shingled=shingled, hot_bucket_min=0, **kw
        ).count()
        sec["full_pairs_gate_off"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_pairs_on = dedup.minhash_pairs(corpus, shingled=shingled, **kw).count()
        sec["full_pairs_gate_on"] = round(time.perf_counter() - t0, 2)
        out[name] = {
            "n_banded_rows": n_banded,
            "n_candidates": n_cand,
            "n_verified_pairs_gate_off": n_pairs_off,
            "n_verified_pairs_gate_on": n_pairs_on,
            "sec": sec,
        }
    shingled.unpersist()
    corpus.unpersist()
    return out


def cmd_hardneg_recall() -> dict:
    """Top-k recall of hard_negatives_bucketed vs EXACT mining, estimated
    over a deterministic anchor sample (full all-pairs at sf1 is 2.25e9
    cosines — the exact side here is anchors x corpus, the statistically
    equivalent estimate over ~1/mod of the anchors)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf1")
    mod = int(os.environ.get("SPARK_GRAFT_HN_ANCHOR_MOD", "100"))
    spark = _session(_sf(sf_dir))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.functions.hashing import md5_long
    from wnba_data_pipeline_spark.operators import similarity
    from wnba_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # deterministic hash sample of anchors (reshuffle-proof, like sample_gate)
    anchor_gate = F.pmod(md5_long(F.concat(F.lit("hnr:"), F.col("vec_id").cast("string"))), F.lit(mod)) == 0
    anchors = emb.filter(anchor_gate).select(
        F.col("vec_id").alias("a_vec_id"),
        F.col("embedding").alias("_ae"),
        F.col("label").alias("_al"),
    )
    n_anchors = anchors.count()
    corp = emb.select(
        F.col("vec_id").alias("n_vec_id"),
        F.col("embedding").alias("_ne"),
        F.col("label").alias("_nl"),
    )
    w = Window.partitionBy("a_vec_id").orderBy(F.col("_cos").desc(), F.col("n_vec_id"))
    t0 = time.perf_counter()
    exact = {
        (r["a_vec_id"], r["n_vec_id"])
        for r in (
            F.broadcast(anchors)
            .join(corp, (F.col("a_vec_id") != F.col("n_vec_id")) & (F.col("_al") != F.col("_nl")))
            .withColumn("_cos", similarity._cosine(F.col("_ae"), F.col("_ne")))
            .withColumn("neg_rank", F.row_number().over(w))
            .filter(F.col("neg_rank") <= similarity.HN_TOP_K)
            .select("a_vec_id", "n_vec_id")
            .collect()
        )
    }
    t_exact = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    approx_all = similarity.q_hard_negatives_bucketed(spark, sf_dir)
    approx = {
        (r["a_vec_id"], r["n_vec_id"])
        for r in approx_all.join(
            anchors.select("a_vec_id"), "a_vec_id"
        ).select("a_vec_id", "n_vec_id").collect()
    }
    t_approx_full = round(time.perf_counter() - t0, 2)
    inter = len(approx & exact)
    return {
        "sf_dir": sf_dir,
        "anchor_mod": mod,
        "n_anchors": n_anchors,
        "n_exact_pairs": len(exact),
        "n_approx_pairs_at_anchors": len(approx),
        "recall_vs_exact": round(inter / len(exact), 4) if exact else None,
        "exact_anchors_sec": t_exact,
        "approx_full_corpus_sec": t_approx_full,
    }


def cmd_ivfpq_recall() -> dict:
    """IVF-PQ retrieval quality/cost at scale (VERDICT r8 item 4): recall@3
    and recall@10 vs exact-L2 ground truth over 100 anchor queries, the
    probed-candidate fraction (the no-full-scan evidence), and walls."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_queries = int(os.environ.get("SPARK_GRAFT_IVFPQ_QUERIES", "100"))
    spark = _session(_sf(sf_dir))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq
    from wnba_data_pipeline_spark.operators.clustering import probe_assignments
    from wnba_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    t0 = time.perf_counter()
    index = pq.ivfpq_fit(emb)
    fit_sec = round(time.perf_counter() - t0, 2)
    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
    t0 = time.perf_counter()
    corpus.count()
    encode_sec = round(time.perf_counter() - t0, 2)

    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    # probed-candidate fraction: how much of the corpus the ADC pass touches
    cell_sizes = {
        r["cell"]: r["n"]
        for r in corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probes = probe_assignments(q, index.coarse, vec_col="q_emb", nprobe=pq.IVFPQ_NPROBE)
    probed = sum(cell_sizes.get(r["cell"], 0) for r in probes.collect())
    out: dict = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "fit_sec": fit_sec,
        "encode_sec": encode_sec,
        "probed_fraction": round(probed / (n_queries * n_corpus), 4),
        "cell_sizes": sorted(cell_sizes.values(), reverse=True),
    }
    w = Window.partitionBy("q_vec_id").orderBy(F.col("_d2").asc(), F.col("vec_id").asc())
    exact = (
        F.broadcast(q)
        .join(emb.select("vec_id", "embedding"), F.col("q_vec_id") != F.col("vec_id"))
        .withColumn("_d2", pq._sqdist_vec(F.col("q_emb"), F.col("embedding")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"), "rk")
    )
    t0 = time.perf_counter()
    truth3, truth10 = {}, {}
    for r in exact.collect():
        truth10.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        if r["rk"] <= 3:
            truth3.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    out["exact_scan_sec"] = round(time.perf_counter() - t0, 2)

    for k, truth in ((3, truth3), (10, truth10)):
        t0 = time.perf_counter()
        got = {}
        for r in pq.ivfpq_search(corpus, q, index, k=k).collect():
            got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        wall = round(time.perf_counter() - t0, 2)
        hits = sum(len(truth[qid] & got.get(qid, set())) for qid in truth)
        out[f"recall_at_{k}"] = round(hits / sum(len(v) for v in truth.values()), 4)
        out[f"search_at_{k}_sec"] = wall
    corpus.unpersist()
    return out


def cmd_ivfpq_clustered() -> dict:
    """IVF-PQ on a CLUSTERED corpus (8 gaussian clusters, 64-dim): the
    recall the index delivers when the data has the neighborhood structure
    IVF exploits — the counterpoint to the near-uniform driver embeddings,
    where probing 2/8 cells can only ever see ~25% of the corpus and
    recall measures chance level by construction."""
    n = int(os.environ.get("SPARK_GRAFT_IVFPQ_N", "20000"))
    n_queries = 100
    spark = _session(0.1)

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq

    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 5.0, (8, 64))
    x = centers[np.arange(n) % 8] + rng.normal(0.0, 1.0, (n, 64))
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(x.astype(np.float64))})
    emb = spark.createDataFrame(pdf).persist()
    emb.count()

    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("_d2").asc(), F.col("vec_id").asc())
    exact = (
        F.broadcast(q)
        .join(emb.select("vec_id", "embedding"), F.col("q_vec_id") != F.col("vec_id"))
        .withColumn("_d2", pq._sqdist_vec(F.col("q_emb"), F.col("embedding")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"), "rk")
    )
    truth3, truth10 = {}, {}
    for r in exact.collect():
        truth10.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        if r["rk"] <= 3:
            truth3.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    out: dict = {"n_corpus": n, "n_queries": n_queries, "n_true_clusters": 8}
    for variant, by_residual, coarse_init in (
        ("raw", False, "hash"),
        ("residual", True, "hash"),
        ("residual_farthest", True, "farthest"),
    ):
        index = pq.ivfpq_fit(emb, by_residual=by_residual, coarse_init=coarse_init)
        corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
        corpus.count()
        vout: dict = {}
        for k, truth in ((3, truth3), (10, truth10)):
            got = {}
            for r in pq.ivfpq_search(corpus, q, index, k=k).collect():
                got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
            hits = sum(len(truth[qid] & got.get(qid, set())) for qid in truth)
            vout[f"recall_at_{k}"] = round(hits / sum(len(v) for v in truth.values()), 4)
        got = {}
        for r in pq.ivfpq_search(corpus, q, index, k=10, rerank=500).collect():
            got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        hits = sum(len(truth10[qid] & got.get(qid, set())) for qid in truth10)
        vout["recall_at_10_rerank500"] = round(
            hits / sum(len(v) for v in truth10.values()), 4
        )
        vout["cell_sizes"] = sorted(
            (r["n"] for r in corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()),
            reverse=True,
        )
        corpus.unpersist()
        out[variant] = vout
    emb.unpersist()
    return out


def cmd_ivfpq_sweep() -> dict:
    """nprobe sweep on the driver embeddings: if the low sf0.1/sf1 recall
    really is the uniform-data ceiling (recall ~= probed fraction, not an
    implementation defect), recall@10 must track nprobe/coarse_k as nprobe
    sweeps 1..8 and reach ~1.0 at nprobe=8 with a wide rerank (the full
    corpus probed; remaining loss isolates the PQ-shortlist term). Recall
    numbers are CPU-contention-immune; walls here are not reported."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_queries = int(os.environ.get("SPARK_GRAFT_IVFPQ_QUERIES", "100"))
    spark = _session(_sf(sf_dir))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq
    from wnba_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    index = pq.ivfpq_fit(emb)
    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
    corpus.count()
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("_d2").asc(), F.col("vec_id").asc())
    exact = (
        F.broadcast(q)
        .join(emb.select("vec_id", "embedding"), F.col("q_vec_id") != F.col("vec_id"))
        .withColumn("_d2", pq._sqdist_vec(F.col("q_emb"), F.col("embedding")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"))
    )
    truth10: dict = {}
    for r in exact.collect():
        truth10.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
    denom = sum(len(v) for v in truth10.values())

    out: dict = {"sf_dir": sf_dir, "n_corpus": n_corpus, "n_queries": n_queries, "sweep": []}
    configs = [(1, pq.IVFPQ_RERANK), (2, pq.IVFPQ_RERANK), (4, pq.IVFPQ_RERANK),
               (8, pq.IVFPQ_RERANK), (8, 500)]
    for nprobe, rerank in configs:
        got: dict = {}
        for r in pq.ivfpq_search(corpus, q, index, k=10, nprobe=nprobe, rerank=rerank).collect():
            got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        hits = sum(len(truth10[qid] & got.get(qid, set())) for qid in truth10)
        out["sweep"].append(
            {
                "nprobe": nprobe,
                "rerank": rerank,
                "probed_fraction_nominal": round(nprobe / len(index.coarse), 4),
                "recall_at_10": round(hits / denom, 4),
            }
        )
    corpus.unpersist()
    return out


def cmd_band_skew() -> dict:
    """Adversarial boilerplate corpus (VERDICT r8 item 7): n docs sharing
    one template collapse onto one band bucket per band; measure the pair
    stage with the hot-bucket salted gate off vs on (identical outputs)."""
    n_docs = int(os.environ.get("SPARK_GRAFT_SKEW_DOCS", "3000"))
    spark = _session(0.1)

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators.dedup import HOT_BUCKET_MIN, minhash_pairs

    template = " ".join(f"tmpl{i}" for i in range(60))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(template + " unique"), F.col("id").cast("string")).alias("text"),
    ).persist()
    docs.count()
    out: dict = {"n_docs": n_docs, "hot_bucket_min": HOT_BUCKET_MIN}
    for name, kw in (("unsalted", {"hot_bucket_min": 0}), ("salted_default", {})):
        runs = []
        n_pairs = None
        for _ in range(3):
            t0 = time.perf_counter()
            n_pairs = minhash_pairs(docs, **kw).count()
            runs.append(round(time.perf_counter() - t0, 2))
        out[name] = {"n_pairs": n_pairs, "walls": sorted(runs)}
    docs.unpersist()
    out["pairs_match"] = out["unsalted"]["n_pairs"] == out["salted_default"]["n_pairs"]
    return out


def cmd_scale_bucketed() -> dict:
    """The sf100 rung (VERDICT r8 item 1), sized to the sandbox: BUCKETED
    layout + DuckDB only. The full r08 matrix died twice at sf100 — first
    with the tmpfs bucket/spill dirs racing the JVM heap for RAM, then on
    disk exhaustion from the PLAIN-layout queries (a 600 M-row global sort
    spills tens of GB per query) stacked on lingering shuffle files and an
    uncapped DuckDB CTAS. So: only lineitem+events get the clustered
    write (the five engine-bound queries plus both temporal joins touch
    nothing else), the plain layout is skipped at this rung (its trend is
    established at sf10/sf30 and its sort spill alone breaks the disk
    budget), and the SparkSession is STOPPED before the DuckDB side runs
    (shuffle/local dirs are deleted at stop, and the two engines never
    hold peak memory together — same-machine, back-to-back instead of
    same-session; both engines still run warm best-of-N)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf100")
    sf = _sf(sf_dir)
    spark = _session(sf)

    from wnba_data_pipeline_spark.operators import relational, temporal
    from wnba_data_pipeline_spark.plans.catalog import ensure_bucketed_layout

    names = (
        "tumbling_daily",
        "asof_attribution",
        "range_join_bins",
        "rolling_5",
        "rolling_5_10",
        "dispersion_stats",
        "agg_multi",
        "sessionize_events",
    )
    subset = os.environ.get("SPARK_GRAFT_R09_QUERIES")
    if subset:
        names = tuple(n for n in names if n in subset.split(","))
    oracles = {
        "tumbling_daily": relational.ORACLE_TUMBLING_DAILY,
        "asof_attribution": temporal.ORACLES["asof_attribution"],
        "range_join_bins": temporal.ORACLES["range_join_bins"],
        "rolling_5_10": relational.ORACLES["rolling_5_10"],
        "dispersion_stats": relational.ORACLES["dispersion_stats"],
        "agg_multi": relational.ORACLES["agg_multi"],
        "sessionize_events": relational.ORACLES["sessionize_events"],
    }

    def _q(name):
        qs = {**relational.QUERIES, **temporal.QUERIES}
        fn = qs.get(name) or getattr(relational, f"q_{name}")
        return fn(spark, sf_dir)

    out: dict = {"sf_dir": sf_dir, "sf": sf, "plain": "skipped (disk budget; see docstring)"}
    t0 = time.perf_counter()
    ensure_bucketed_layout(
        spark, sf_dir, n_buckets=32 if (sf or 0) >= 0.5 else 8, tables=("lineitem", "events")
    )
    out["bucketed_write_sec"] = round(time.perf_counter() - t0, 2)
    os.environ["SPARK_GRAFT_LAYOUT"] = "bucketed"
    try:
        buck = {}
        for n in names:
            df = _q(n)
            spread = _spread(df)
            ep = df._jdf.queryExecution().executedPlan().toString()
            spread["keyed_exchange"] = any(
                k in seg.split(")")[0]
                for seg in ep.split("Exchange hashpartitioning(")[1:]
                for k in ("l_suppkey", "user_id")
            )
            spread["sort_in_plan"] = "Sort [" in ep
            spread["n_parquet_scans"] = ep.count("Scan parquet")
            buck[n] = spread
        out["bucketed"] = buck
    finally:
        del os.environ["SPARK_GRAFT_LAYOUT"]
    spark.stop()
    # spark.stop() only stops the context — the py4j gateway JVM stays up
    # holding its whole unreclaimed heap (measured 44 GB RES at sf100)
    # while DuckDB runs next, which is exactly the both-engines-resident
    # OOM this probe exists to avoid. Kill the gateway outright; nothing
    # below touches Spark.
    try:
        from pyspark import SparkContext

        gw = SparkContext._gateway
        if gw is not None:
            gw.shutdown()
            proc = getattr(gw, "proc", None)
            if proc is not None:
                proc.kill()
            SparkContext._gateway = None
            SparkContext._jvm = None
    except Exception:
        pass

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '40GB')}'")
    tmp = os.environ.get("SPARK_GRAFT_DUCK_TMP", "/root/repo/.benchdata/duck-tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ("lineitem", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    out["duckdb_engine"] = {
        n: _spread_duck(con, sql) for n, sql in oracles.items() if n in names
    }
    out["ratio_bucketed_vs_duckdb_min"] = {
        n: round(out["bucketed"][n]["min"] / out["duckdb_engine"][n]["min"], 2)
        for n in out["duckdb_engine"]
    }
    return out


def cmd_tumbling100() -> dict:
    """Attribution for the one red sf100 row: exact tumbling_daily went
    superlinear (0.53 s at sf10 → 11.9 s at sf100 = 8.6x DuckDB) while
    every other bucketed row scaled linearly or better. Suspect: the
    bucket-local (day,type,user) hash agg — 8 M groups at sf10 fit the
    agg map, ~80 M at sf100 spill. Measure the fused exact shape, the
    (day,type,user) stage alone, and the HLL opt-in
    (SPARK_GRAFT_APPROX_DISTINCT=1) on the same events-only bucketed
    layout."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf100")
    sf = _sf(sf_dir)
    spark = _session(sf)

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import relational
    from wnba_data_pipeline_spark.operators.relational import _DSCALE
    from wnba_data_pipeline_spark.plans.catalog import ensure_bucketed_layout

    out: dict = {"sf_dir": sf_dir, "sf": sf}
    ensure_bucketed_layout(
        spark, sf_dir, n_buckets=32 if (sf or 0) >= 0.5 else 8, tables=("events",)
    )
    os.environ["SPARK_GRAFT_LAYOUT"] = "bucketed"
    try:
        ev = relational._layout_table(spark, sf_dir, "events")
        day = F.col("ts").cast("date").alias("day")
        lvl1 = ev.groupBy(day, "event_type", "user_id").agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.floor(F.col("value") * _DSCALE + F.lit(0.5)).cast("long")).alias("_s"),
        )
        out["n_lvl1_groups"] = lvl1.count()
        out["bucketed_stages"] = {
            "day_type_user_agg": _spread(lvl1),
            "full_fused_exact": _spread(relational.q_tumbling_daily(spark, sf_dir)),
        }
        os.environ["SPARK_GRAFT_APPROX_DISTINCT"] = "1"
        try:
            out["bucketed_stages"]["hll_opt_in"] = _spread(
                relational.q_tumbling_daily(spark, sf_dir)
            )
        finally:
            del os.environ["SPARK_GRAFT_APPROX_DISTINCT"]
    finally:
        del os.environ["SPARK_GRAFT_LAYOUT"]
    return out


def cmd_band_skew_regimes() -> dict:
    """The join-regime decomposition the plain band_skew probe missed: at
    probe scale the band table BROADCASTS, and a broadcast hash join never
    serializes a hot key (pair work spreads over probe-side input
    partitions) — salting there is pure overhead (measured ~2x). The
    at-scale regime is the SHUFFLE join (the sf30 organic band table is
    ~3.5M rows ≈ 150 MB, far past the broadcast threshold), where all |B|
    rows of a hot bucket land in ONE partition. Emulate it by disabling
    auto-broadcast on the planted corpus and measure unsalted vs salted,
    AQE on and off."""
    n_docs = int(os.environ.get("SPARK_GRAFT_SKEW_DOCS", "10000"))
    spark = _session(0.1)

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators.dedup import HOT_BUCKET_MIN, minhash_pairs

    template = " ".join(f"tmpl{i}" for i in range(60))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(template + " unique"), F.col("id").cast("string")).alias("text"),
    ).persist()
    docs.count()
    out: dict = {"n_docs": n_docs, "hot_bucket_min": HOT_BUCKET_MIN}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, kw, aqe in (
            ("shuffle_unsalted_aqe_off", {"hot_bucket_min": 0}, "false"),
            ("shuffle_unsalted_aqe_on", {"hot_bucket_min": 0}, "true"),
            ("shuffle_salted_aqe_on", {}, "true"),
        ):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            runs, n_pairs = [], None
            for _ in range(3):
                t0 = time.perf_counter()
                n_pairs = minhash_pairs(docs, **kw).count()
                runs.append(round(time.perf_counter() - t0, 2))
            out[name] = {"n_pairs": n_pairs, "walls": sorted(runs)}
        # emission isolation: minhash_pairs' wall is dominated by the
        # PARALLEL verification stage (candidates redistribute at the
        # distinct), which masks the serialized term the gate targets —
        # the |B|² candidate EMISSION inside the hot key's single SMJ
        # partition. Measure that term alone, at a |B| where it dominates.
        from wnba_data_pipeline_spark.functions.skew import HOT_SALTS, explode_salts, with_salt
        from wnba_data_pipeline_spark.operators.dedup import _minhash_band_keys, shingle_docs

        n_big = int(os.environ.get("SPARK_GRAFT_SKEW_EMIT_DOCS", "20000"))
        big = spark.range(n_big).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit(template + " unique"), F.col("id").cast("string")).alias("text"),
        )
        banded = shingle_docs(big).select(
            "doc_id", F.explode(F.array(*_minhash_band_keys(F.col("sh")))).alias("band_key")
        ).persist()
        banded.count()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        a, b = banded.alias("a"), banded.alias("b")
        t0 = time.perf_counter()
        n_unsalted = a.join(
            b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        ).count()
        unsalted_sec = round(time.perf_counter() - t0, 2)
        sa, sb = with_salt(banded, HOT_SALTS).alias("a"), explode_salts(banded, HOT_SALTS).alias("b")
        t0 = time.perf_counter()
        n_salted = sa.join(
            sb,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.__salt") == F.col("b.__salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).count()
        salted_sec = round(time.perf_counter() - t0, 2)
        banded.unpersist()
        out["emission_only"] = {
            "n_docs": n_big,
            "n_pairs_unsalted": n_unsalted,
            "n_pairs_salted": n_salted,
            "unsalted_sec": unsalted_sec,
            "salted_sec": salted_sec,
        }
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    docs.unpersist()
    out["pairs_match"] = (
        len({v["n_pairs"] for v in out.values() if isinstance(v, dict) and "n_pairs" in v}) == 1
    )
    return out


def cmd_incremental() -> dict:
    """Incremental-funnel walls (VERDICT r8 item 8): N doc_id-ordered
    batches through run_curation_incremental vs the one-shot batch funnel
    on the same corpus; survivor-set equality + per-batch walls."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf1")
    n_batches = int(os.environ.get("SPARK_GRAFT_INC_BATCHES", "5"))
    spark = _session(_sf(sf_dir))

    import shutil
    import tempfile

    from pyspark.sql import functions as F  # noqa: F401

    from wnba_data_pipeline_spark.plans import curation
    from wnba_data_pipeline_spark.sources.sinks import read_table

    out: dict = {"sf_dir": sf_dir, "n_batches": n_batches}
    base = tempfile.mkdtemp(prefix="curation-inc-", dir="/dev/shm")
    try:
        t0 = time.perf_counter()
        stage_seconds: dict = {}
        curation.run_curation(spark, sf_dir, base, stage_seconds=stage_seconds)
        out["batch_total_sec"] = round(time.perf_counter() - t0, 2)
        out["batch_stage_sec"] = stage_seconds
        walls: list = []
        t0 = time.perf_counter()
        curation.run_curation_incremental(
            spark, sf_dir, base, n_batches=n_batches, batch_walls=walls
        )
        out["incremental_total_sec"] = round(time.perf_counter() - t0, 2)
        out["incremental_batch_sec"] = walls
        b = {
            r["doc_id"]
            for r in read_table(spark, f"{base}/curation/near_deduped").select("doc_id").collect()
        }
        i = {
            r["doc_id"]
            for r in read_table(spark, f"{base}/curation_inc/near_deduped").select("doc_id").collect()
        }
        out["survivors_batch"] = len(b)
        out["survivors_incremental"] = len(i)
        out["survivor_sets_equal"] = b == i
        out["survivor_sym_diff"] = len(b ^ i)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "rangebins"
    fn = {
        "rangebins": cmd_rangebins,
        "scale_bucketed": cmd_scale_bucketed,
        "minhash_probe": cmd_minhash_probe,
        "minhash_ab": cmd_minhash_ab,
        "minhash_stages": cmd_minhash_stages,
        "hardneg_recall": cmd_hardneg_recall,
        "ivfpq_recall": cmd_ivfpq_recall,
        "ivfpq_clustered": cmd_ivfpq_clustered,
        "ivfpq_sweep": cmd_ivfpq_sweep,
        "band_skew": cmd_band_skew,
        "band_skew_regimes": cmd_band_skew_regimes,
        "tumbling100": cmd_tumbling100,
        "incremental": cmd_incremental,
    }[cmd]
    print(json.dumps({cmd: fn()}))


if __name__ == "__main__":
    main()
