"""Round-8 scale probes — produces the raw sections of BENCH_SCALE_r08.json.

Subcommands (argv[1]):

  scale       (at $SPARK_GRAFT_SF_DIR) — plain vs bucketed spreads for the
              three round-8 plan changes (tumbling_daily fused exact,
              asof_attribution, range_join_bins) plus rolling_5 and
              dispersion_stats for trend continuity; DuckDB engine-only
              same-session twins (CREATE TEMP TABLE AS of the exact oracle
              SQL); executed-plan Exchange/Sort flags; bucketed write cost.
  tumbling    per-stage attribution of the exact tumbling shape on the
              bucketed layout (VERDICT r7 item 1): scan → bucket-local
              (day,type,user) agg → full fused, vs the old split shape and
              the plain layout.
  streaming   ingestion-dedup growth curve (VERDICT r7 item 8): N batches
              of sf0.1 documents with planted cross-batch dups through
              streaming/dedup.process_batch, per-batch wall time as the
              corpus grows.
  curation    run_curation at $SPARK_GRAFT_SF_DIR for both near-dedup
              paths with per-stage wall times (VERDICT r7 item 9).

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
        "wnba-r08-probes",
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


def cmd_scale() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf10")
    sf = _sf(sf_dir)
    spark = _session(sf)

    import duckdb

    from wnba_data_pipeline_spark.operators import relational, temporal
    from wnba_data_pipeline_spark.plans.catalog import ensure_bucketed_layout

    con = duckdb.connect()
    # cap DuckDB so the sf100 window/quantile spills instead of competing
    # with the resident JVM heap for the whole box (the round-9 OOM lesson)
    con.execute(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '40GB')}'")
    for t in ("lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    def _q(name):
        qs = {**relational.QUERIES, **temporal.QUERIES}
        fn = qs.get(name) or getattr(relational, f"q_{name}")
        return fn(spark, sf_dir)

    names = ("tumbling_daily", "asof_attribution", "range_join_bins", "rolling_5", "dispersion_stats")
    subset = os.environ.get("SPARK_GRAFT_R08_QUERIES")
    if subset:
        names = tuple(n for n in names if n in subset.split(","))
    oracles = {
        "tumbling_daily": relational.ORACLE_TUMBLING_DAILY,
        "asof_attribution": temporal.ORACLES["asof_attribution"],
        "range_join_bins": temporal.ORACLES["range_join_bins"],
        "dispersion_stats": relational.ORACLES.get("dispersion_stats"),
    }
    out: dict = {"sf_dir": sf_dir, "sf": sf}
    out["plain"] = {n: _spread(_q(n)) for n in names}
    t0 = time.perf_counter()
    ensure_bucketed_layout(spark, sf_dir, n_buckets=32 if (sf or 0) >= 0.5 else 8)
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
    out["duckdb_engine"] = {
        n: _spread_duck(con, sql) for n, sql in oracles.items() if sql and n in names
    }
    out["ratio_bucketed_vs_duckdb_min"] = {
        n: round(out["bucketed"][n]["min"] / out["duckdb_engine"][n]["min"], 2)
        for n in out["duckdb_engine"]
    }
    return out


def cmd_tumbling() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf10")
    sf = _sf(sf_dir)
    spark = _session(sf)

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import relational
    from wnba_data_pipeline_spark.operators.relational import _DSCALE, _dsum, _r6
    from wnba_data_pipeline_spark.plans.catalog import ensure_bucketed_layout

    out: dict = {"sf_dir": sf_dir, "sf": sf}
    out["plain_exact"] = _spread(relational.q_tumbling_daily(spark, sf_dir))
    ensure_bucketed_layout(spark, sf_dir, n_buckets=32 if (sf or 0) >= 0.5 else 8)
    os.environ["SPARK_GRAFT_LAYOUT"] = "bucketed"
    try:
        ev = relational._layout_table(spark, sf_dir, "events")
        day = F.col("ts").cast("date").alias("day")
        # stage 1: the 4-column scan
        scan = ev.select("ts", "event_type", "user_id", "value")
        # stage 2: bucket-local (day, type, user) agg — the fused pass 1
        lvl1 = ev.groupBy(day, "event_type", "user_id").agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.floor(F.col("value") * _DSCALE + F.lit(0.5)).cast("long")).alias("_s"),
        )
        # full fused = registry shape on the bucketed layout
        fused = relational.q_tumbling_daily(spark, sf_dir)
        # the round-7 split shape, reconstructed on the same bucketed scan
        base = ev.groupBy(day, "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            _r6(_dsum("value")).alias("value_sum"),
        )
        users = (
            ev.select(day, "event_type", "user_id")
            .distinct()
            .groupBy("day", "event_type")
            .agg(F.count(F.lit(1)).alias("n_users"))
        )
        split = base.join(users, ["day", "event_type"])
        out["bucketed_stages"] = {
            "scan_4col": _spread(scan),
            "bucket_local_day_type_user_agg": _spread(lvl1),
            "full_fused": _spread(fused),
            "old_split_shape": _spread(split),
        }
        out["fused_plan_scans"] = (
            fused._jdf.queryExecution().executedPlan().toString().count("Scan parquet")
        )
        # identity: fused == split, row for row
        out["rows_match_fused_vs_split"] = sorted(map(tuple, fused.collect())) == sorted(
            map(tuple, split.collect())
        )
    finally:
        del os.environ["SPARK_GRAFT_LAYOUT"]
    return out


def cmd_streaming() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_batches = int(os.environ.get("SPARK_GRAFT_DEDUP_BATCHES", "20"))
    spark = _session(_sf(sf_dir))

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.sources.tables import load_table
    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    per = n_docs // n_batches
    work = tempfile.mkdtemp(prefix="sdedup-bench-", dir="/dev/shm")
    corpus_dir = os.path.join(work, "corpus")
    verdicts_dir = os.path.join(work, "verdicts")
    batches = []
    for i in range(n_batches):
        b = docs.filter((F.col("doc_id") % n_batches) == i)
        if i % 4 == 3:
            # planted cross-batch exact dups: re-send some of batch i-1's docs
            b = b.unionByName(
                docs.filter((F.col("doc_id") % n_batches) == i - 1)
                .filter(F.col("doc_id") < per * 2)
                .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
            )
        batches.append(b.cache())
        batches[-1].count()
    walls = []
    try:
        for i, b in enumerate(batches):
            t0 = time.perf_counter()
            sdedup.process_batch(spark, b, i, corpus_dir, verdicts_dir)
            walls.append(round(time.perf_counter() - t0, 3))
        corpus_n = sdedup.read_corpus(spark, corpus_dir).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)
        for b in batches:
            b.unpersist()
    return {
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "docs_per_batch_approx": per,
        "per_batch_sec": walls,
        "first_batch_sec": walls[0],
        "last_batch_sec": walls[-1],
        "mean_batch_sec": round(sum(walls) / len(walls), 3),
        "batches_per_sec": round(len(walls) / sum(walls), 3),
        "final_corpus_docs": corpus_n,
    }


def cmd_curation() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf1")
    spark = _session(_sf(sf_dir))

    import shutil
    import tempfile

    from wnba_data_pipeline_spark.plans import curation

    out: dict = {"sf_dir": sf_dir}
    for path in ("minhash", "semantic"):
        base = tempfile.mkdtemp(prefix=f"curation-{path}-", dir="/dev/shm")
        try:
            t0 = time.perf_counter()
            stage_seconds: dict = {}
            report = curation.run_curation(
                spark, sf_dir, base, near_dedup=path, stage_seconds=stage_seconds
            )
            rows = {r["stage"]: int(r["n_docs"]) for r in report.collect()}
            out[path] = {
                "total_sec": round(time.perf_counter() - t0, 2),
                "stage_sec": stage_seconds,
                "funnel_docs": rows,
            }
        finally:
            shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "scale"
    fn = {
        "scale": cmd_scale,
        "tumbling": cmd_tumbling,
        "streaming": cmd_streaming,
        "curation": cmd_curation,
    }[cmd]
    print(json.dumps({cmd: fn()}))


if __name__ == "__main__":
    main()
