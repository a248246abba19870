"""Round-11 scale probes — produces the raw sections of BENCH_SCALE_r11.json.

Subcommands (argv[1]):

  sharp_pairs100   VERDICT r10 item 1's done-gate: minhash_pairs at sf100
                   under GEOMETRY_LARGE_N with the Arrow signature pass
                   vs the expression path, and the default geometry for
                   reference — pair outputs hash-compared across branches
                   (the Arrow pass is a physical switch, so identical).
  incremental100   VERDICT r10 item 2: the sf100 incremental funnel with
                   the round-11 signature index — per-batch walls (the
                   flatness claim), per-stage attribution of the LAST
                   batch (screen / verdict write / corpus write / index
                   write), survivor equality vs the batch funnel.
  ann100           VERDICT r10 item 3: ivfpq_search recall+wall and
                   hard_negatives_bucketed recall at the sf100 embeddings
                   (~6 M vectors) — the r9 anchor-sample method one
                   decade up.
  funnel_guard     VERDICT r10 item 6: execute the ladder guard
                   (test_funnel_ladder_stays_sublinear_per_doc) via
                   pytest with SPARK_GRAFT_SLOW=1 and record the result —
                   the guard must RUN every round, not sit skipped.

Methodology matches bench_r09/r10: one JVM per subcommand, plans built
once, warm walls where applicable, /dev/shm hygiene per the r9 RAM
postmortem (probe dirs cleaned in finally blocks).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from bench_r09 import _session, _sf  # noqa: E402

SF100 = "/root/repo/.benchdata/sf100"


def _funnel_corpus(spark, sf_dir):
    """The funnel's post-exact-dedup corpus (same prep as r09
    cmd_minhash_stages / the r10 sharp-geometry probe)."""
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
    """(count, xor-of-row-hashes) — order-insensitive value identity."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_a", "doc_b", "jaccard") % 1_000_003).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def cmd_sharp_pairs100() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    spark = _session(_sf(sf_dir))

    from wnba_data_pipeline_spark.functions.hashing import minhash_coeffs
    from wnba_data_pipeline_spark.operators import dedup

    corpus = _funnel_corpus(spark, sf_dir).persist()
    n_docs = corpus.count()
    shingled = dedup.shingle_docs(corpus).persist()
    shingled.count()
    corpus.unpersist()

    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs}
    k, br = dedup.GEOMETRY_LARGE_N
    sharp = {"coeffs": minhash_coeffs(k), "band_rows": br}
    runs = [
        ("sharp_arrow", "1", sharp),
        ("sharp_expression", "0", sharp),
        ("default_arrow", "1", {}),
        ("default_expression", "0", {}),
    ]
    for name, flag, kw in runs:
        os.environ["SPARK_GRAFT_SIG_ARROW"] = flag
        pairs = dedup.minhash_pairs(corpus, shingled=shingled, **kw)
        t0 = time.perf_counter()
        n, h = _pairs_hash(pairs)
        out[name] = {
            "pairs_sec": round(time.perf_counter() - t0, 2),
            "n_pairs": n,
            "pairs_hash": h,
        }
    os.environ.pop("SPARK_GRAFT_SIG_ARROW", None)
    out["sharp_hash_identical"] = (
        out["sharp_arrow"]["pairs_hash"] == out["sharp_expression"]["pairs_hash"]
        and out["sharp_arrow"]["n_pairs"] == out["sharp_expression"]["n_pairs"]
    )
    out["default_hash_identical"] = (
        out["default_arrow"]["pairs_hash"] == out["default_expression"]["pairs_hash"]
    )
    shingled.unpersist()
    return out


def cmd_incremental100() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    n_batches = int(os.environ.get("SPARK_GRAFT_INC_BATCHES", "5"))
    spark = _session(_sf(sf_dir))

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators.text import quality_score_col, sample_gate
    from wnba_data_pipeline_spark.plans import curation
    from wnba_data_pipeline_spark.sources.sinks import read_table
    from wnba_data_pipeline_spark.sources.tables import load_table
    from wnba_data_pipeline_spark.streaming import dedup as sdedup

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

        # per-stage attribution of a LATE batch (the r10 growth term):
        # replay batch N-1 against the state as it stood before it (its own
        # slices excluded — exactly what process_batch reads on a replay)
        docs = load_table(spark, sf_dir, "documents")
        lo_hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        lo, hi = int(lo_hi[0]), int(lo_hi[1])
        span = (hi - lo) // n_batches + 1
        last = n_batches - 1
        arriving = docs.filter(
            (F.col("doc_id") >= lo + last * span) & (F.col("doc_id") < lo + (last + 1) * span)
        )
        gated = sample_gate(
            arriving.withColumn("quality_score", quality_score_col("text")).filter(
                F.col("quality_score") >= curation.QUALITY_MIN
            )
        ).select("doc_id", "text")
        from wnba_data_pipeline_spark.operators.dedup import minhash_pairs
        from wnba_data_pipeline_spark.operators.graph import cluster_survivors

        stages: dict = {}
        t0 = time.perf_counter()
        pairs = minhash_pairs(gated)
        losers = (
            cluster_survivors(pairs)
            .filter(~F.col("is_survivor"))
            .select(F.col("id").alias("doc_id"))
        )
        batch = gated.join(losers, "doc_id", "left_anti").persist()
        n_batch = batch.count()
        stages["within_batch_dedup_sec"] = round(time.perf_counter() - t0, 2)
        corpus_dir = f"{base}/curation_inc/corpus"
        index_dir = f"{base}/curation_inc/index"
        t0 = time.perf_counter()
        ref_index = sdedup.read_index(spark, index_dir, exclude_batch=last)
        ref = spark.createDataFrame([], sdedup.DOC_SCHEMA)
        _, v = sdedup.screen_batch(batch, ref, ref_index=ref_index)
        n_v = v.count()
        stages["screen_vs_index_sec"] = round(time.perf_counter() - t0, 2)
        stages["n_batch_docs"] = n_batch
        stages["n_verdicts"] = n_v
        t0 = time.perf_counter()
        sdedup.write_index(
            spark.read.schema(sdedup.DOC_SCHEMA).parquet(f"{corpus_dir}/batch={last}"),
            index_dir + "_attrib",  # scratch copy — don't disturb the real index
            last,
        )
        stages["index_write_sec"] = round(time.perf_counter() - t0, 2)
        batch.unpersist()
        out["late_batch_attribution"] = stages
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def cmd_ann100() -> dict:
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF100)
    # scaled anchor sample: keep the exact side ~100 anchors at 6 M vectors
    os.environ.setdefault("SPARK_GRAFT_HN_ANCHOR_MOD", "60000")
    os.environ.setdefault("SPARK_GRAFT_IVFPQ_QUERIES", "100")
    from bench_r09 import cmd_hardneg_recall, cmd_ivfpq_recall

    out: dict = {}
    out["ivfpq"] = cmd_ivfpq_recall()
    out["hardneg"] = cmd_hardneg_recall()
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


def cmd_ann100_sweep() -> dict:
    """nprobe sweep at the round-11 auto geometry (one fit+encode, three
    searches): the recall/cost dial on the near-isotropic sf100
    embeddings, where recall is COVERAGE-bounded (any IVF on unstructured
    vectors must probe more cells for more recall — the auto default
    buys the knee, this sweep shows the curve)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    spark = _session(_sf(sf_dir))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq
    from wnba_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    index = pq.ivfpq_fit(emb)
    fit_sec = round(time.perf_counter() - t0, 2)
    corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
    t0 = time.perf_counter()
    n_corpus = corpus.count()
    encode_sec = round(time.perf_counter() - t0, 2)
    q = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("_d2").asc(), F.col("vec_id").asc())
    truth = {}
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
    cells = len(index.coarse)
    out: dict = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_cells": cells,
        "fit_sec": fit_sec,
        "encode_sec": encode_sec,
        "auto_nprobe": pq.ivfpq_nprobe_for(cells),
        "sweep": [],
    }
    for nprobe in (75, 300, 700, 1400):
        t0 = time.perf_counter()
        got = {}
        for r in pq.ivfpq_search(corpus, q, index, k=10, nprobe=nprobe).collect():
            got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
        wall = round(time.perf_counter() - t0, 2)
        hits = sum(len(truth[qid] & got.get(qid, set())) for qid in truth)
        out["sweep"].append(
            {
                "nprobe": nprobe,
                "probed_fraction": round(nprobe / cells, 4),
                "recall_at_10": round(hits / sum(len(v) for v in truth.values()), 4),
                "search_sec": wall,
            }
        )
    corpus.unpersist()
    return out


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "funnel_guard"
    fn = {
        "ann100_sweep": cmd_ann100_sweep,
        "sharp_pairs100": cmd_sharp_pairs100,
        "incremental100": cmd_incremental100,
        "ann100": cmd_ann100,
        "funnel_guard": cmd_funnel_guard,
    }[cmd]
    print(json.dumps({cmd: fn()}))


if __name__ == "__main__":
    main()
