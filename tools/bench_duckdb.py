"""DuckDB side of the engine-bound bench: times the six BASELINE.md
headline queries (reproduction SQL verbatim) on any sf directory, warm
best-of-5 after one warm-up — the same methodology the original BASELINE.md
numbers were measured with, so Spark/DuckDB ratios at the scaled sf are
apples-to-apples.

Two result sinks, selected by SPARK_GRAFT_BENCH_SINK (the BENCH_SCALE
engine-only columns are reproducible with one env var):
  - "df" (default): `.df()` pandas/Arrow materialization — what a Python
    consumer of the result pays; the original BASELINE.md methodology.
  - "engine": `CREATE TEMP TABLE AS` — engine-only time, no host-language
    crossing; the closest analog of Spark's noop sink and the honest
    baseline for engine-vs-engine ratios (the `.df()` crossing costs up
    to 30x the engine time on large outputs — BASELINE.md round-3
    addendum).

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.benchdata/sf1 python tools/bench_duckdb.py
Prints one JSON line {"queries": {...}, "value": total_sec, "sf_dir": ..., "sink": ...}.
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
    # the stateful family (events replica-scaled by make_scale_data.py);
    # DuckDB has no session windows — lag + gap-flag + running sum is the
    # equivalent formulation (same one the oracle uses)
    "sessionize_events": """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN date_diff('second',
                             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                             ts) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, min(ts) session_start, count(*) n_events, sum(value) value_sum
FROM numbered GROUP BY user_id, session_seq""",
    "tumbling_daily": """
SELECT CAST(ts AS DATE) AS day, event_type, count(*) n_events,
       sum(value) value_sum, count(DISTINCT user_id) n_users
FROM events GROUP BY CAST(ts AS DATE), event_type""",
}

WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "1"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sink = os.environ.get("SPARK_GRAFT_BENCH_SINK", "df")
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    queries = {k: QUERIES[k] for k in subset.split(",")} if subset else QUERIES
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "events"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    # "df" sink: .df() (Arrow/numpy columnar materialization) rather than
    # fetchall() — Python tuple conversion of a 6M-row window result would
    # swamp the engine time. "engine" sink: CTAS into a temp table, dropped
    # between runs — all partitions materialize engine-side, nothing
    # crosses to the host language (the analog of Spark's noop sink).
    def run(sql: str) -> None:
        if sink == "engine":
            con.execute(f"CREATE TEMP TABLE _bench_out AS {sql}")
            con.execute("DROP TABLE _bench_out")
        else:
            con.execute(sql).df()

    timings = {}
    for name, sql in queries.items():
        for _ in range(WARMUPS):
            run(sql)
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            run(sql)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(json.dumps({"queries": timings, "value": round(sum(timings.values()), 4), "sf_dir": sf_dir, "sink": sink}))


if __name__ == "__main__":
    main()
