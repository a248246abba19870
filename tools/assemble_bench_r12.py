"""Assemble BENCH_SCALE_r12.json from the raw probe lines in
.benchdata/r12_probes.jsonl (written by tools/run_r12_probes.sh — one
JSON object per bench_r12.py subcommand).

VERDICT r11 item 7: the assembler REFUSES to emit the bench file unless a
PASSING funnel_guard block is present in the raw lines — the
four-rounds-running superlinear catcher can no longer be skipped by
omission. A missing or failing guard is a hard exit(1), not a warning.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
RAW = REPO / ".benchdata" / "r12_probes.jsonl"
OUT = REPO / "BENCH_SCALE_r12.json"


def main() -> None:
    doc: dict = {
        "round": 12,
        "methodology": (
            "plans built once; one JVM per probe subcommand; /dev/shm spark-local "
            "cleaned between phases (r9 RAM-pressure postmortem). funnel_ab100 "
            "A/Bs the env-gated Arrow shingle twin through the FULL sf100 batch "
            "curation funnel with survivor sets hash-compared across arms "
            "(physical switch — identical values asserted, not assumed); "
            "stages100 attributes the near-dedup wall per stage in both arms and "
            "re-tests the r8 hashed-verify negative at the decade. "
            "ann_clustered1m recall-grades the IVF-PQ auto dials on a "
            "planted-cluster 1M-vector corpus under pure defaults. headline_ab "
            "interleaves HEAD/r10 bench.py runs in ONE machine session to settle "
            "the +5.6% cross-session drift question. funnel_guard EXECUTES the "
            "ladder guard test and GATES this file's emission."
        ),
    }
    if not RAW.exists():
        print(f"REFUSED: {RAW} missing — run tools/run_r12_probes.sh first", file=sys.stderr)
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
            "(VERDICT r11 item 7). Run `python tools/bench_r12.py funnel_guard`.",
            file=sys.stderr,
        )
        sys.exit(1)
    OUT.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
