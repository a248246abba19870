"""Round-15 scale probes — produces the raw sections of BENCH_SCALE_r15.json.

Subcommands (argv[1]):

  inc_seam_attrib   VERDICT r14 item 1: ONE arm of the sf100 incremental
                    funnel (fresh JVM per arm — the runner invokes this
                    once per arm/trial) with the NEW per-seam walls wired
                    through the batch-local dedup pass (local_shingle /
                    local_pairs_cc / local_batch_mat + the cc seam keys)
                    and the survivor count + xxhash fingerprint of the
                    final near_deduped corpus. Arm selected by
                    SPARK_GRAFT_INC_PERSIST (0 = the r14 plan, 1 = the
                    round-15 per-batch persist); line key suffixed by
                    SPARK_GRAFT_TRIAL_TAG so the assembler keeps every
                    arm. The A/B contract: survivor fingerprints must be
                    IDENTICAL across arms (persist is physical, never
                    semantic).
  encode_trial      VERDICT r14 item 3: ONE encode trial of ONE arm under
                    a FRESH JVM (the runner alternates arms across
                    invocations) — fit the shipped IVF-PQ index, then
                    wall ivfpq_encode as persist+count with the identity
                    fingerprint computed off the clock. Replaces the
                    same-JVM 5-trial A/B whose 18-85 s drift buried the
                    effect (BENCH_SCALE_r14 encode_fuse_ab). Arm from
                    SPARK_GRAFT_ENCODE_FUSED; key suffixed by
                    SPARK_GRAFT_TRIAL_TAG.
  stages100_spread  the r13/r14 per-stage ladder probe re-run on the r15
                    tree — the assembler diffs every stage median against
                    the r14 post-flip baseline and FLAGS any stage past
                    its published max (VERDICT r14 item 6).
  funnel_guard      the ladder guard executed via pytest (SPARK_GRAFT_SLOW)
                    — the assembler refuses to emit without a passing block.
  connect_probe     standing: record grpcio/protobuf availability for the
                    opt-in Spark Connect end-to-end test.

Methodology matches bench_r09..r14: one JVM per subcommand (and for the
A/Bs this round, one JVM per ARM/TRIAL — the r14 lesson that same-JVM
walls degrade monotonically with trial index), plans built once, /dev/shm
hygiene (probe dirs cleaned in finally blocks).
"""

from __future__ import annotations

import json
import os
import shutil
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
from bench_r13 import (  # noqa: E402
    _fit_corpus,
    cmd_connect_probe,
    cmd_funnel_guard,
    cmd_stages100_spread,
)

SF100 = "/root/repo/.benchdata/sf100"


def _tag() -> str:
    return os.environ.get("SPARK_GRAFT_TRIAL_TAG", "t0")


def _host_meter() -> dict:
    """~1.5 s host-health microbenchmark stamped onto every probe line
    (round 15: identical fingerprinted workloads drifted 2-5x across the
    session while steal stayed ~1.4% — a memory-bandwidth figure beside
    each wall makes that attribution quantitative next time). Single
    threaded on purpose: per-core bandwidth is what the degraded Spark
    tasks actually saw."""
    import numpy as np

    a = np.ones(2**23, dtype=np.float64)  # 64 MiB — bounded even at the
    # 0.1 GB/s floor this round actually measured (1 GiB took 46 s there)
    t0 = time.perf_counter()
    b = a * 1.000001
    copy_s = time.perf_counter() - t0
    m = np.random.default_rng(0).random((1024, 1024))
    t0 = time.perf_counter()
    (m @ m).sum()
    mm_s = time.perf_counter() - t0
    del a, b
    return {
        # read 64 MiB + write 64 MiB
        "membw_gbps": round(0.125 / max(copy_s, 1e-9), 2),
        "matmul_1k_ms": round(mm_s * 1000, 1),
    }


def cmd_inc_seam_attrib() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF100)
    n_batches = int(os.environ.get("SPARK_GRAFT_INC_BATCHES", "5"))
    arm = "persist" if os.environ.get("SPARK_GRAFT_INC_PERSIST", "1") != "0" else "r14_plan"
    spark = _session(_sf(sf_dir))

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.plans import curation
    from wnba_data_pipeline_spark.sources.sinks import read_table

    out: dict = {"sf_dir": sf_dir, "n_batches": n_batches, "arm": arm}
    base = tempfile.mkdtemp(prefix="curation-incr15-", dir="/dev/shm")
    try:
        walls: list = []
        stage_walls: list = []
        t0 = time.perf_counter()
        curation.run_curation_incremental(
            spark, sf_dir, base, n_batches=n_batches,
            batch_walls=walls, batch_stage_walls=stage_walls,
        )
        out["incremental_total_sec"] = round(time.perf_counter() - t0, 2)
        out["batch_sec"] = walls
        out["batch_stage_sec"] = stage_walls
        nd = read_table(spark, os.path.join(base, "curation_inc", "near_deduped"))
        row = nd.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_id") % 1_000_003).alias("h"),
        ).collect()[0]
        out["survivors"] = int(row["n"])
        out["survivor_hash"] = int(row["h"] or 0)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def cmd_encode_trial() -> dict:
    arm = "fused" if os.environ.get("SPARK_GRAFT_ENCODE_FUSED", "1") != "0" else "three_stage"
    spark = _session(10.0)
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.operators import pq

    emb = _fit_corpus(spark)
    # the fit itself always runs unfused-default (identical index both
    # arms — fit determinism is fixture-pinned in tests/test_pq.py); only
    # the encode under test reads the arm flag
    fused_flag = os.environ.pop("SPARK_GRAFT_ENCODE_FUSED", None)
    t_fit = time.perf_counter()
    index = pq.ivfpq_fit(emb)
    fit_sec = round(time.perf_counter() - t_fit, 2)
    if fused_flag is not None:
        os.environ["SPARK_GRAFT_ENCODE_FUSED"] = fused_flag
    enc = pq.ivfpq_encode(emb.select("vec_id", "embedding"), index).persist()
    t0 = time.perf_counter()
    n = enc.count()
    wall = round(time.perf_counter() - t0, 2)
    row = enc.agg(
        F.sum(
            F.xxhash64(
                "vec_id", "cell", F.col("codes").cast("array<string>").cast("string")
            )
            % 1_000_003
        ).alias("h")
    ).collect()[0]
    enc.unpersist()
    return {
        "arm": arm,
        "fit_sec": fit_sec,
        "encode_wall_sec": wall,
        "n": int(n),
        "fingerprint": int(row["h"] or 0),
        "n_cells": len(index.coarse),
    }


def cmd_stage_trial() -> dict:
    """ONE trial of the per-stage ladder under a FRESH JVM (the runner
    invokes this once per trial) — the fresh-JVM-per-trial methodology the
    A/B probes adopted this round, applied to the stage ladder whose
    same-JVM trials 2-3 show the documented monotonic degradation (r15
    first run: verify_hh 11.8 → 64.7 → 103.1 s within one JVM). The
    same-JVM stages100_spread still runs for apples-to-apples regression
    diffing against the r14 baseline; this block is the forward-looking
    r16 baseline."""
    os.environ["SPARK_GRAFT_STAGE_TRIALS"] = "1"
    return cmd_stages100_spread()


COMMANDS = {
    "inc_seam_attrib": cmd_inc_seam_attrib,
    "encode_trial": cmd_encode_trial,
    "stages100_spread": cmd_stages100_spread,
    "stage_trial": cmd_stage_trial,
    "funnel_guard": cmd_funnel_guard,
    "connect_probe": cmd_connect_probe,
}

# subcommands that run once per arm/trial in a fresh JVM — their output
# key carries the trial tag so the jsonl assembler keeps every line
TAGGED = {"inc_seam_attrib", "encode_trial", "stage_trial"}


def main() -> None:
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    cmd = sys.argv[1] if len(sys.argv) > 1 else "connect_probe"
    meter_before = _host_meter()
    result = COMMANDS[cmd]()
    if isinstance(result, dict):
        result["host_meter_before"] = meter_before
        result["host_meter_after"] = _host_meter()
    key = f"{cmd}_{_tag()}" if cmd in TAGGED else cmd
    print(json.dumps({key: result}))


if __name__ == "__main__":
    main()
