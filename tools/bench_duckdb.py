"""DuckDB side of the engine-bound bench: times the six BASELINE.md
headline queries (reproduction SQL verbatim) on any sf directory, warm
best-of-5 after one warm-up — the same methodology the original BASELINE.md
numbers were measured with, so Spark/DuckDB ratios at the scaled sf are
apples-to-apples.

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.benchdata/sf1 python tools/bench_duckdb.py
Prints one JSON line {"queries": {...}, "value": total_sec, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import time

import duckdb

QUERIES = {
    "agg_multi": """
SELECT l_suppkey, count(*) cnt, sum(l_quantity) sq, avg(l_extendedprice) ae,
       max(l_discount) md, sum(l_extendedprice*(1-l_discount)) rev
FROM lineitem GROUP BY l_suppkey""",
    "rolling_5": """
SELECT l_orderkey, l_shipdate,
       avg(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) r5
FROM lineitem""",
    "join_left_enrich": """
SELECT o.o_orderkey, c.c_name, o.o_totalprice*0.3 + c.c_acctbal*0.1 score
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""",
    "topk_revenue": """
SELECT c_custkey, sum(o_totalprice) s
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey ORDER BY s DESC LIMIT 10""",
    "quality_probe": """
SELECT count(*) n, sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) nn,
       avg(l_extendedprice) a, stddev(l_extendedprice) s,
       max(l_extendedprice) mx, count(DISTINCT l_suppkey) ds
FROM lineitem""",
    "rank_partition_avg": """
SELECT o_custkey, o_orderkey,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) r
FROM orders""",
}

WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "1"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    queries = {k: QUERIES[k] for k in subset.split(",")} if subset else QUERIES
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    # .df() (Arrow/numpy columnar materialization) rather than fetchall():
    # Python tuple conversion of a 6M-row window result would swamp the
    # engine time; columnar handoff is the closest analog of the Spark
    # side's noop-sink forcing (all partitions materialize, no per-row
    # driver crossing)
    timings = {}
    for name, sql in queries.items():
        for _ in range(WARMUPS):
            con.execute(sql).df()
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).df()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(json.dumps({"queries": timings, "value": round(sum(timings.values()), 4), "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
