"""Assemble BENCH_SCALE_r11.json from the raw probe lines in
.benchdata/r11_probes.jsonl (written by tools/run_r11_probes.sh — one
JSON object per bench_r11.py subcommand)."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
RAW = REPO / ".benchdata" / "r11_probes.jsonl"
OUT = REPO / "BENCH_SCALE_r11.json"


def main() -> None:
    doc: dict = {
        "round": 11,
        "methodology": (
            "plans built once; one JVM per probe subcommand; /dev/shm spark-local "
            "cleaned between phases (r9 RAM-pressure postmortem). sharp_pairs100 "
            "hash-compares full pair outputs across the Arrow/expression signature "
            "branches (physical switch — identical values asserted, not assumed). "
            "incremental100 runs the signature-INDEXED incremental funnel "
            "(round-11 fix for the r10 334->522s per-batch growth) and attributes "
            "a replayed LAST batch per stage. ann100 reuses the r9 anchor-sample "
            "recall method at the sf100 embeddings decade. funnel_guard EXECUTES "
            "the ladder guard test (VERDICT r10 item 6 — it must run every round, "
            "not sit skipped)."
        ),
        "connect_note": (
            "VERDICT r10 item 4 (execute under a real Spark Connect session) is "
            "environment-blocked: this container's pyspark ships without the "
            "Connect client deps (no grpcio/protobuf; installs forbidden). The "
            "contract is now an opt-in test "
            "(tests/test_connect_guard.py::test_registry_executes_under_real_connect_session, "
            "SPARK_GRAFT_CONNECT=1) that runs the full registry against "
            "builder.remote and asserts the documented maintenance RuntimeError "
            "the moment an environment provides the client."
        ),
    }
    for line in RAW.read_text().splitlines():
        line = line.strip()
        # the JVM's unified logging (gc,alloc warnings) shares stdout with
        # the probe's one JSON line — keep only parseable JSON objects
        if not line.startswith("{"):
            continue
        try:
            doc.update(json.loads(line))
        except json.JSONDecodeError:
            continue
    OUT.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
