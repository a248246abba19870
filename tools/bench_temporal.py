"""Scale probe for the temporal joins (operators/temporal.py) — produces
the "temporal_joins" section of BENCH_SCALE_r06.json.

Times asof_attribution and range_join_bins on BOTH engines at a given
sf_dir: Spark via the bench.py methodology (plan built once, warm
best-of-N to the noop sink, min/median/max) and DuckDB engine-only
(CREATE TEMP TABLE AS of the exact oracle SQL — the same twin the
correctness gate hashes, so the two engines run semantically identical
queries). DuckDB's side is a strong baseline here: its ASOF JOIN and
IEJoin are native vectorized operators, not rewrites.

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.benchdata/sf10 python tools/bench_temporal.py
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

import duckdb  # noqa: E402

WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spread_spark(df) -> dict[str, float]:
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.benchdata/sf10")
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(m.group(1)) if m else None
    big = sf is not None and sf >= 0.5

    from wnba_data_pipeline_spark.operators import temporal
    from wnba_data_pipeline_spark.session import ensure_confs, get_spark

    spark = get_spark(
        "wnba-temporal-probe",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "32" if big else "8")),
        extra_confs={
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.files.maxPartitionBytes": "48m" if (sf or 0) >= 5 else "4m",
            "spark.sql.files.openCostInBytes": "256k",
            "spark.local.dir": "/dev/shm/spark-bench-local",
        },
    )
    ensure_confs(spark)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )

    out: dict = {"sf_dir": sf_dir, "sf": sf}
    probes = [
        ("asof_attribution", temporal.QUERIES["asof_attribution"], temporal.ORACLES["asof_attribution"]),
        ("range_join_bins", temporal.QUERIES["range_join_bins"], temporal.ORACLES["range_join_bins"]),
        # same rows via the bin-join shape — the measured alternative
        ("range_agg_binjoin", temporal.range_agg_binjoin, temporal.ORACLES["range_join_bins"]),
    ]
    for name, fn, oracle in probes:
        df = fn(spark, sf_dir)
        spark_spread = _spread_spark(df)
        duck_spread = _spread_duck(con, oracle)
        out[name] = {
            "spark": spark_spread,
            "duckdb_engine": duck_spread,
            "ratio_min": round(spark_spread["min"] / duck_spread["min"], 2),
            "rows": df.count(),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
