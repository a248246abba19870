"""Assemble BENCH_SCALE_r14.json from the raw probe lines in
.benchdata/r14_probes.jsonl (written by tools/run_r14_probes.sh — one
JSON object per bench_r14.py subcommand).

Keeps the round-12 hard gate (VERDICT r11 item 7): the assembler REFUSES
to emit the bench file unless a PASSING funnel_guard block is present in
the raw lines. A missing or failing guard is a hard exit(1), not a
warning.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
RAW = REPO / ".benchdata" / "r14_probes.jsonl"
OUT = REPO / "BENCH_SCALE_r14.json"


def main() -> None:
    doc: dict = {
        "round": 14,
        "methodology": (
            "plans built once; one JVM per probe subcommand; /dev/shm spark-local "
            "cleaned between phases (r9 RAM-pressure postmortem). "
            "ann_escalation_sweep measures what nprobe escalation buys in the "
            "recall-collapse regime: sigma_c in {0.5, 0.75} (separation ~0.77 / "
            "~0.62) at 1M vectors, probed fractions ~1.6% (auto) / 6% / 12% / "
            "25% / 50%, fit+encode+exact-truth shared across the fractions of "
            "each sigma. ann_overlap_knee2 adds sigma_c in {0.6, 0.65} pure-"
            "default recall points to pin the 0.7 advisory threshold inside the "
            "previously unmeasured 0.62-0.77 band. funnel_gap_attrib runs the "
            "SHIPPED sf100 batch funnel with the new near-dedup seam hooks after "
            "the connected_components fix (one-sided edge checkpoint before "
            "symmetrize — the union used to execute the whole pair pipeline "
            "twice), survivor hash compared to r13. inc_shipped100 re-runs the "
            "sf100 incremental funnel (its batch-local dedup ran the same "
            "doubled union). encode_fuse_ab / fit_resfuse_ab A/B the fused "
            "single-Arrow-pass encode and fit-residual kernels "
            "(SPARK_GRAFT_ENCODE_FUSED) against the r13 three-stage chains with "
            "cells+codes / codebook fingerprints compared. funnel_guard EXECUTES "
            "the ladder guard test and GATES this file's emission."
        ),
    }
    if not RAW.exists():
        print(f"REFUSED: {RAW} missing — run tools/run_r14_probes.sh first", file=sys.stderr)
        sys.exit(1)
    for line in RAW.read_text().splitlines():
        line = line.strip()
        # the JVM's unified logging shares stdout with the probe's one JSON
        # line — keep only parseable JSON objects
        if not line.startswith("{"):
            continue
        try:
            doc.update(json.loads(line))
        except json.JSONDecodeError:
            continue
    guard = doc.get("funnel_guard")
    if not isinstance(guard, dict) or guard.get("passed") is not True:
        print(
            "REFUSED: no passing funnel_guard block in the probe lines "
            f"(got: {guard!r}) — the ladder guard must RUN and PASS every round "
            "(VERDICT r11 item 7). Run `python tools/bench_r14.py funnel_guard`.",
            file=sys.stderr,
        )
        sys.exit(1)
    OUT.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
