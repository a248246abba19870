"""Assemble BENCH_SCALE_r08.json from the individual probe outputs
(tools/bench_r08.py subcommand runs saved under /tmp). One-shot round-8
artifact builder; re-run after re-running any probe."""

from __future__ import annotations

import json
from pathlib import Path

SECTIONS = {
    "sf10_r08": "/tmp/r08_sf10_scale.json",
    "tumbling_attribution_r08": "/tmp/r08_sf10_tumbling.json",
    "sf30_trend": "/tmp/r08_sf30_scale.json",
    "streaming_dedup": "/tmp/r08_streaming.json",
    "curation_sf1": "/tmp/r08_curation.json",
    "curation_sf30": "/tmp/r08_curation_sf30.json",
}

out: dict = {
    "round": 8,
    "methodology": (
        "bench.py methodology: plans built once, one suite warm-up, per-query "
        "2 warm-ups then best-of-5 to the noop sink; DuckDB engine-only via "
        "CREATE TEMP TABLE AS of the exact oracle SQL, same session, same "
        "machine; bucketed layout via plans.catalog.ensure_bucketed_layout "
        "(write cost reported separately). Streaming dedup timed through "
        "streaming/dedup.process_batch (the same code the foreachBatch hook "
        "runs); curation stages are write-materialized walls."
    ),
}
for key, path in SECTIONS.items():
    p = Path(path)
    if p.exists() and p.stat().st_size > 0:
        data = json.loads(p.read_text())
        out[key] = next(iter(data.values())) if len(data) == 1 else data
    else:
        out[key] = None

Path("BENCH_SCALE_r08.json").write_text(json.dumps(out, indent=1) + "\n")
print("wrote BENCH_SCALE_r08.json:", {k: ("ok" if v else "MISSING") for k, v in out.items() if k not in ("round", "methodology")})
