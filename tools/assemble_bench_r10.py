"""Assemble BENCH_SCALE_r10.json from the individual probe outputs
(tools/bench_r10.py subcommand runs saved under /tmp). One-shot round-10
artifact builder; re-run after re-running any probe."""

from __future__ import annotations

import json
from pathlib import Path

SECTIONS = {
    # VERDICT r9 item 2: planted hot-key window skew. skew10 = the
    # verdict's literal shape (1% hot user at sf10) — measured as the
    # regime where the PLAIN window wins and the relative detector
    # correctly stays off; skew10_33 / skew100_33 = dominant-key regimes.
    "skew_tables": "/tmp/r10_make_skew.json",
    "skew_windows_sf10_1pct": "/tmp/r10_skew_windows.json",
    "skew_windows_sf10_33pct": "/tmp/r10_skew_windows_33.json",
    "skew_windows_sf100_33pct": "/tmp/r10_skew_windows_100_33.json",
    "skew_rolling_sf10_33pct": "/tmp/r10_skew_rolling_33.json",
    # VERDICT r9 item 1: the clustered-corpus probe under the new defaults
    "ivfpq_clustered_r10_defaults": "/tmp/r10_ivfpq_clustered.json",
    # VERDICT r9 item 3: the funnel ladder's fourth decade (5 M docs).
    # The rung caught its quadratic, per the verdict's prediction: the
    # decomposition + candidate anatomy + the sharp-geometry cure run.
    "curation_sf100": "/tmp/r10_curation100.json",
    "neardedup_sf100_decomposition": "/tmp/r10_neardedup100.json",
    "candidates_sf100_default_geometry": "/tmp/r10_cand100.json",
    "pairs_sf100_sharp_geometry": "/tmp/r10_pairs_sharp.json",
}

out: dict = {
    "round": 10,
    "methodology": (
        "plans built once; warm best-of-N noop-sink walls (min/median/max); "
        "one JVM per probe subcommand; /dev/shm spark-local cleaned between "
        "phases (r9 RAM-pressure postmortem). Skew probes compare "
        "SPARK_GRAFT_CHUNKED_WINDOWS=0 vs 1 on the same session and "
        "hash-compare full outputs (count + decimal sum of per-row "
        "xxhash64) — 'identical: true' is a value equality check, not an "
        "assumption."
    ),
}
for key, path in SECTIONS.items():
    p = Path(path)
    if not p.exists():
        print(f"MISSING {key}: {path}")
        continue
    data = json.loads(p.read_text())
    out[key] = next(iter(data.values())) if len(data) == 1 else data

dst = Path(__file__).resolve().parents[1] / "BENCH_SCALE_r10.json"
dst.write_text(json.dumps(out, indent=1))
print(f"wrote {dst} ({dst.stat().st_size} bytes, {len(out) - 2} sections)")
