"""Join-strategy matrix for `join_left_enrich` (round-5 verdict item 1).

Round 4 removed the hard `F.broadcast(customer)` hint from the enrichment
join on the a-priori argument (customer grows with the dataset → broadcast
OOMs at scale) but committed no measurement. This harness produces the
measurement: the same orders⟕customer join timed under each physical
strategy at any sf directory, same methodology as bench.py (plans built
once, warm best-of-N, noop sink, nothing crosses to the driver).

Strategies:
  - nohint      — the registered query shape: Catalyst stats-based planning
                  (auto-broadcast below autoBroadcastJoinThreshold) + AQE
                  runtime re-plan above it. The shipped posture.
  - broadcast   — the round-3 shape: hard F.broadcast on customer (what the
                  hint removal is judged against).
  - shuffle_hash— forced shuffled hash join (.hint("shuffle_hash")).
  - merge       — forced sort-merge join (.hint("merge")).
  - bucketed    — both sides pre-bucketed by the join key via
                  plans.catalog.write_bucketed (the repeated-key production
                  layout); join time excludes the one-time clustered write,
                  which is reported separately as bucketed_write_sec.

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.benchdata/sf10 python tools/bench_join_matrix.py
Prints one JSON line. Raw results land in BENCH_SCALE_r05.json; prose in
the BASELINE.md round-5 addendum.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from pyspark.sql import functions as F  # noqa: E402

WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(df) -> float:
    t0 = time.perf_counter()
    _force(df)
    return time.perf_counter() - t0


def _enrich(orders, cust):
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "left").select(
        "o_orderkey",
        F.col("c_name").alias("cust_name"),
        (F.col("o_totalprice") * 0.3 + F.col("c_acctbal") * 0.1).alias("score"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from wnba_data_pipeline_spark.session import get_spark
    from wnba_data_pipeline_spark.sources.tables import load_table
    from wnba_data_pipeline_spark.plans.catalog import write_bucketed

    big = sf is not None and sf >= 0.5
    split = os.environ.get("SPARK_GRAFT_BENCH_SPLIT", "48m" if (sf or 0) >= 5 else "4m")
    spark = get_spark(
        "wnba-join-matrix",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "32" if big else "8")),
        extra_confs={
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.files.maxPartitionBytes": split,
            "spark.sql.files.openCostInBytes": "256k",
            "spark.local.dir": "/dev/shm/spark-bench-local",
        },
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    plans = {
        "nohint": _enrich(orders, cust),
        "broadcast": _enrich(orders, F.broadcast(cust)),
        "shuffle_hash": _enrich(orders, cust.hint("shuffle_hash")),
        "merge": _enrich(orders, cust.hint("merge")),
    }

    # bucketed layout: one-time clustered write of both sides on the join
    # key with matching bucket counts → the join runs exchange-free
    bucket_dir = f"/dev/shm/spark-bucketed-{os.getpid()}"
    n_buckets = 32 if big else 8
    t0 = time.perf_counter()
    write_bucketed(orders, "bench.orders_b", bucket_by="o_custkey", n_buckets=n_buckets,
                   path=f"{bucket_dir}/orders", sort_by="o_custkey")
    write_bucketed(cust, "bench.customer_b", bucket_by="c_custkey", n_buckets=n_buckets,
                   path=f"{bucket_dir}/customer", sort_by="c_custkey")
    bucketed_write = time.perf_counter() - t0
    ob, cb = spark.table("bench.orders_b"), spark.table("bench.customer_b")
    plans["bucketed"] = _enrich(ob, cb)

    timings: dict[str, dict[str, float]] = {}
    for name, df in plans.items():
        _force(df)
        for _ in range(WARMUPS):
            _force(df)
        runs = sorted(_timed(df) for _ in range(RUNS))
        timings[name] = {
            "min": round(runs[0], 4),
            "median": round(runs[len(runs) // 2], 4),
            "max": round(runs[-1], 4),
        }
        # physical strategy actually chosen (post-AQE final plan)
        plan_str = df._jdf.queryExecution().executedPlan().toString()
        for strat in ("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin"):
            if strat in plan_str:
                timings[name]["strategy"] = strat
                break

    shutil.rmtree(bucket_dir, ignore_errors=True)
    print(json.dumps({
        "query": "join_left_enrich",
        "sf_dir": sf_dir,
        "sf": sf,
        "aqe": True,
        "bucketed_write_sec": round(bucketed_write, 2),
        "n_buckets": n_buckets,
        "strategies": timings,
    }))


if __name__ == "__main__":
    main()
