"""Round-15 optimization-round measurement harness.

Subcommands (argv[1]):

  plans [outdir] [suffix]   dump ``explain("formatted")`` for EVERY declared
                            query (plus the bench's rolling_5 variant) to
                            ``<outdir>/<name>_<suffix>.txt`` (defaults:
                            plans/r15, suffix "before"). The optimization
                            judge reads these files instead of running Spark.
  time_all                  per-query wall time for EVERY declared query at
                            $SPARK_GRAFT_SF_DIR (default sf0.1) under the
                            bench.py local posture (same session confs), one
                            warmup + best-of-N noop forces (guide §1.4), one
                            JSON line out.

Methodology notes: plans are built once (prepared-statement style, matching
bench.py); each timed force is labeled with setJobDescription (guide §1.5);
the noop sink materializes every column of every row without driver
collection. SPARK_GRAFT_OPTIM_QUERIES=a,b,c restricts either subcommand to a
subset. SPARK_GRAFT_OPTIM_RUNS sets N (default 3 — these are hotspot-ranking
numbers, not regression baselines; bench.py's best-of-8 stays the headline
methodology).
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


def _bench_session(sf_dir: str):
    """The exact bench.py local posture so timings are comparable."""
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    big = sf is not None and sf >= 0.5
    from wnba_data_pipeline_spark.session import ensure_confs, get_spark

    aqe_on = os.environ.get("SPARK_GRAFT_AQE", "1" if big else "0") == "1"
    shuffle = int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "32" if big else "8"))
    split = os.environ.get("SPARK_GRAFT_BENCH_SPLIT", "48m" if (sf or 0) >= 5 else "4m")
    spark = get_spark(
        "wnba-pipeline-optim-r15",
        shuffle_partitions=shuffle,
        extra_confs={
            "spark.sql.adaptive.enabled": "true" if aqe_on else "false",
            "spark.sql.files.maxPartitionBytes": split,
            "spark.sql.files.openCostInBytes": "256k",
            "spark.local.dir": "/dev/shm/spark-optim-local",
        },
    )
    ensure_confs(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "true" if aqe_on else "false")
    return spark, sf, aqe_on, shuffle


def _declared(spark, sf_dir: str):
    import __spark_entry__ as entrymod
    from wnba_data_pipeline_spark.operators import relational

    qs = entrymod.queries()
    subset = os.environ.get("SPARK_GRAFT_OPTIM_QUERIES")
    names = subset.split(",") if subset else list(qs) + ["rolling_5"]
    out = {}
    for name in names:
        fn = relational.q_rolling_5 if name == "rolling_5" else qs[name]
        out[name] = fn(spark, sf_dir)
    return out


def cmd_plans() -> None:
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else _REPO / "plans" / "r15")
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, *_ = _bench_session(sf_dir)
    for name, df in _declared(spark, sf_dir).items():
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan.splitlines())} lines)")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cmd_time_all() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_OPTIM_RUNS", "3"))
    spark, sf, aqe_on, shuffle = _bench_session(sf_dir)
    dfs = _declared(spark, sf_dir)
    timings, spread = {}, {}
    for name, df in dfs.items():
        spark.sparkContext.setJobDescription(f"optim_r15 warmup: {name}")
        t0 = time.perf_counter()
        _force(df)
        first = time.perf_counter() - t0  # cold-ish: includes codegen
        walls = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"optim_r15 timed: {name} #{i}")
            t0 = time.perf_counter()
            _force(df)
            walls.append(time.perf_counter() - t0)
        walls.sort()
        timings[name] = round(walls[0], 4)
        spread[name] = {
            "first": round(first, 4),
            "min": round(walls[0], 4),
            "max": round(walls[-1], 4),
        }
        print(f"  {name}: min {walls[0]:.3f}s (first {first:.3f}s)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "optim_r15_all_queries",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": sf,
                "aqe": aqe_on,
                "shuffle_partitions": shuffle,
            }
        )
    )


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time_all"
    {"plans": cmd_plans, "time_all": cmd_time_all}[cmd]()


if __name__ == "__main__":
    main()
