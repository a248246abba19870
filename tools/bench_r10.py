"""Round-10 scale probes — produces the raw sections of BENCH_SCALE_r10.json.

Subcommands (argv[1]):

  make_skew      build the planted-hot-key sf10 tables via DuckDB rewrite
                 (VERDICT r9 item 2): .benchdata/skew10 (one user takes
                 ~1% of events — the verdict's shape, measured as the
                 regime where the plain window still WINS on local[32])
                 and .benchdata/skew10_33 (one user/supplier takes ~33% —
                 a genuinely dominant key).
  skew_windows   sessionize / asof / range_join_bins on a planted-skew
                 events dir ($SPARK_GRAFT_SF_DIR, default skew10_33):
                 plain single-window vs chunked carry-merge
                 (SPARK_GRAFT_CHUNKED_WINDOWS=0/1), wall spreads +
                 value-hash equality + what the sampled detector decides.
  skew_rolling   rolling_5_10 on the planted-skew lineitem, same matrix.
  ivfpq_clustered the r9 20k/8-cluster probe re-run under the round-10
                 DEFAULTS (residual + farthest + auto-rerank) vs the
                 documented raw/hash opt-out — the verdict item-1 gate
                 (defaults recall@10 >= 0.8).
  curation100    the documents/embeddings ladder's fourth decade
                 (VERDICT r9 item 3): both funnel paths + the incremental
                 mode at sf100 (5 M docs), per-stage walls + survivor-set
                 equality. Requires .benchdata/sf100 documents/embeddings
                 (SPARK_GRAFT_SCALE_TABLES=documents,embeddings
                 python tools/make_scale_data.py 1000 with DST=sf100).

Methodology matches bench.py / bench_r09.py: plans built once, warm
best-of-N, noop sink, min/median/max published; tmpfs hygiene per the r9
postmortem (clean /dev/shm layouts between phases, one JVM per subcommand).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from bench_r09 import _session, _sf, _spread  # noqa: E402

SKEW_DIR = "/root/repo/.benchdata/skew10"          # ~1% hot user
SKEW33_DIR = "/root/repo/.benchdata/skew10_33"     # ~33% hot user/supplier
HOT_FRACTION = 100  # event_id % 100 == 0 → ~1% of rows onto the hot key


def cmd_make_skew() -> dict:
    import duckdb

    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='24GB'")
    out: dict = {}
    for label, d, mod in (("1pct", SKEW_DIR, HOT_FRACTION), ("33pct", SKEW33_DIR, 3)):
        os.makedirs(d, exist_ok=True)
        t0 = time.perf_counter()
        con.execute(
            f"COPY (SELECT * REPLACE ("
            f"CASE WHEN event_id % {mod} = 0 THEN 0 ELSE user_id END AS user_id) "
            f"FROM read_parquet('/root/repo/.benchdata/sf10/events.parquet')) "
            f"TO '{d}/events.parquet' (FORMAT parquet)"
        )
        out[f"events_{label}_sec"] = round(time.perf_counter() - t0, 1)
        out[f"hot_user_rows_{label}"] = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/events.parquet') WHERE user_id = 0"
        ).fetchone()[0]
    # rolling probe: only the dominant-key variant (the 1% negative is
    # established on the events family; lineitem rewrite is 14 GB)
    t0 = time.perf_counter()
    con.execute(
        f"COPY (SELECT * REPLACE ("
        f"CASE WHEN l_orderkey % 3 = 0 THEN 7 ELSE l_suppkey END AS l_suppkey) "
        f"FROM read_parquet('/root/repo/.benchdata/sf10/lineitem.parquet')) "
        f"TO '{SKEW33_DIR}/lineitem.parquet' (FORMAT parquet)"
    )
    out["lineitem_33pct_sec"] = round(time.perf_counter() - t0, 1)
    out["hot_supplier_rows_33pct"] = con.execute(
        f"SELECT count(*) FROM read_parquet('{SKEW33_DIR}/lineitem.parquet') WHERE l_suppkey = 7"
    ).fetchone()[0]
    return out


def _hash_check(df) -> dict:
    from pyspark.sql import functions as F

    r = df.select(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: 10M int64 hashes overflow an ANSI long sum
        F.sum(F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return {"rows": r["n"], "hash": str(r["h"])}


def cmd_skew_windows() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SKEW33_DIR)
    spark = _session(10.0)

    from wnba_data_pipeline_spark.operators import chunked, relational, temporal
    from wnba_data_pipeline_spark.sources.tables import load_table

    out: dict = {"sf_dir": sf_dir}
    ev = load_table(spark, sf_dir, "events")
    t0 = time.perf_counter()
    out["detector_engages"] = chunked.detect_hot_keys(ev, "user_id", "event_id")
    out["detector_sec"] = round(time.perf_counter() - t0, 2)

    queries = {
        "sessionize_events": relational.q_sessionize_events,
        "asof_attribution": temporal.q_asof_attribution,
        "range_join_bins": temporal.q_range_join_bins,
    }
    for name, q in queries.items():
        row: dict = {}
        os.environ["SPARK_GRAFT_CHUNKED_WINDOWS"] = "0"
        plain = q(spark, sf_dir)
        row["plain"] = _spread(plain)
        os.environ["SPARK_GRAFT_CHUNKED_WINDOWS"] = "1"
        ck = q(spark, sf_dir)
        row["chunked"] = _spread(ck)
        row["plain_hash"] = _hash_check(plain)
        row["chunked_hash"] = _hash_check(ck)
        row["identical"] = row["plain_hash"] == row["chunked_hash"]
        out[name] = row
    del os.environ["SPARK_GRAFT_CHUNKED_WINDOWS"]
    return out


def cmd_skew_rolling() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SKEW33_DIR)
    spark = _session(10.0)

    from wnba_data_pipeline_spark.operators import relational

    out: dict = {"sf_dir": sf_dir}
    os.environ["SPARK_GRAFT_CHUNKED_WINDOWS"] = "0"
    plain = relational.q_rolling_5_10(spark, sf_dir)
    out["plain"] = _spread(plain)
    os.environ["SPARK_GRAFT_CHUNKED_WINDOWS"] = "1"
    ck = relational.q_rolling_5_10(spark, sf_dir)
    out["chunked"] = _spread(ck)
    out["plain_hash"] = _hash_check(plain)
    out["chunked_hash"] = _hash_check(ck)
    out["identical"] = out["plain_hash"] == out["chunked_hash"]
    del os.environ["SPARK_GRAFT_CHUNKED_WINDOWS"]
    return out


def cmd_ivfpq_clustered() -> dict:
    """r9's clustered probe under the round-10 defaults (same corpus/seed:
    20k rows, 8 gaussian clusters, 100 queries)."""
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
    for variant, kwargs in (
        ("defaults_residual_farthest_autorerank", {}),
        ("optout_raw_hash", {"by_residual": False, "coarse_init": "hash"}),
    ):
        index = pq.ivfpq_fit(emb, **kwargs)
        corpus = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
        corpus.count()
        vout: dict = {
            "rerank_resolved": pq.resolve_rerank(index, pq.IVFPQ_NPROBE, "auto"),
            "cell_sizes": sorted(
                (r["n"] for r in corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()),
                reverse=True,
            ),
        }
        for k, truth in ((3, truth3), (10, truth10)):
            got = {}
            t0 = time.perf_counter()
            for r in pq.ivfpq_search(corpus, q, index, k=k).collect():
                got.setdefault(r["q_vec_id"], set()).add(r["n_vec_id"])
            vout[f"search_at_{k}_sec"] = round(time.perf_counter() - t0, 2)
            hits = sum(len(truth[qid] & got.get(qid, set())) for qid in truth)
            vout[f"recall_at_{k}"] = round(hits / sum(len(v) for v in truth.values()), 4)
        corpus.unpersist()
        out[variant] = vout
    emb.unpersist()
    return out


def cmd_curation100() -> dict:
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf100")
    from bench_r09 import cmd_incremental

    return cmd_incremental()


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "skew_windows"
    fn = {
        "make_skew": cmd_make_skew,
        "skew_windows": cmd_skew_windows,
        "skew_rolling": cmd_skew_rolling,
        "ivfpq_clustered": cmd_ivfpq_clustered,
        "curation100": cmd_curation100,
    }[cmd]
    print(json.dumps({cmd: fn()}))


if __name__ == "__main__":
    main()
