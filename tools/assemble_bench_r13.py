"""Assemble BENCH_SCALE_r13.json from the raw probe lines in
.benchdata/r13_probes.jsonl (written by tools/run_r13_probes.sh — one
JSON object per bench_r13.py subcommand).

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
RAW = REPO / ".benchdata" / "r13_probes.jsonl"
OUT = REPO / "BENCH_SCALE_r13.json"


def main() -> None:
    doc: dict = {
        "round": 13,
        "methodology": (
            "plans built once; one JVM per probe subcommand; /dev/shm spark-local "
            "cleaned between phases (r9 RAM-pressure postmortem). fit_opt_ab A/Bs "
            "the fused fit iteration (SPARK_GRAFT_FIT_FUSED) against the r12 "
            "per-row/per-subspace path on the 1M planted-cluster corpus with "
            "codebook fingerprints compared (physical switch — bit identity "
            "asserted, not assumed). ann_overlap_sweep maps recall@10 under pure "
            "auto dials across cluster-center scales sigma_c in {0.5,1,2,5} "
            "(noise N(0,1)) at 1M vectors — the regime between the r12 extremes "
            "(isotropic 0.479 / 7x-separated 1.0) — and records the fit-side "
            "separation statistic (inertia/total-SS). inc_attrib100 attributes "
            "the sf100 incremental funnel per batch per stage. stages100_spread "
            "re-runs the sf100 near-dedup stage walls median-of-3 in one JVM "
            "(fresh lineage per trial). cand_join_ab A/Bs the LSH candidate "
            "self-join against groupBy+within-bucket pair generation with "
            "candidate sets hash-compared. funnel_guard EXECUTES the ladder "
            "guard test and GATES this file's emission."
        ),
    }
    if not RAW.exists():
        print(f"REFUSED: {RAW} missing — run tools/run_r13_probes.sh first", file=sys.stderr)
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
            "(VERDICT r11 item 7). Run `python tools/bench_r13.py funnel_guard`.",
            file=sys.stderr,
        )
        sys.exit(1)
    OUT.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
