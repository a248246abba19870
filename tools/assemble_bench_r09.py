"""Assemble BENCH_SCALE_r09.json from the individual probe outputs
(tools/bench_r09.py and tools/bench_r08.py subcommand runs saved under
/tmp). One-shot round-9 artifact builder; re-run after re-running any
probe."""

from __future__ import annotations

import json
from pathlib import Path

SECTIONS = {
    # VERDICT r8 item 1: the third decade of the ladder (bucketed-only —
    # the full-matrix probe died twice at sf100, see cmd_scale_bucketed)
    "sf100_matrix": "/tmp/r09_sf100_bucketed_v2.json",
    # the first completed sf100 matrix — kept as the measured negative: its
    # entire Spark phase ran with ~0 MB available RAM (21 GB of stale tmpfs
    # bucketed layouts from an earlier probe), inflating exact tumbling 3x;
    # v2 is the clean re-run after the leak fix + gateway-kill
    "sf100_matrix_rampressure_run": "/tmp/r09_sf100_bucketed.json",
    "tumbling_attribution_sf100": "/tmp/r09_tumbling100.json",
    # item 2: range_join_bins drift attribution
    "rangebins_attribution_sf30": "/tmp/r09_rangebins_sf30.json",
    "rangebins_attribution_sf100": "/tmp/r09_rangebins_sf100.json",
    # item 3: MinHash candidate anatomy + geometry A/B + post-change funnel.
    # stage decompositions: _window_gate ran with the first-cut window
    # hot-bucket counter (+38-52 s measured regression), _sampled_gate with
    # the shipped 1/64-sample detector; curation_sf30 sections mirror that
    # (window-gate funnel kept as the measured negative).
    "minhash_probe_sf30": "/tmp/minhash_probe_sf30.json",
    "minhash_geometry_ab_sf30": "/tmp/r09_minhash_ab_sf30.json",
    "minhash_stages_window_gate": "/tmp/r09_minhash_stages.json",
    "minhash_stages_sampled_gate": "/tmp/r09_minhash_stages2.json",
    "curation_sf30_window_gate": "/tmp/r09_curation_sf30.json",
    "curation_sf30_sampled_gate": "/tmp/r09_curation_sf30_v2.json",
    # item 4: composed IVF-PQ recall/cost (uniform synthetic embeddings),
    # plus the clustered-corpus probe (the honest recall counterpoint —
    # uniform random vectors bound IVF recall near the probed fraction)
    "ivfpq_recall_sf01": "/tmp/r09_ivfpq_sf01.json",
    "ivfpq_recall_sf1": "/tmp/r09_ivfpq_sf1.json",
    "ivfpq_clustered": "/tmp/r09_ivfpq_clustered.json",
    # nprobe sweep: falsifiable check that uniform-data recall tracks the
    # probed fraction, and nprobe=8 isolates the PQ-shortlist loss term
    "ivfpq_nprobe_sweep_sf01": "/tmp/r09_ivfpq_sweep.json",
    # item 5: hard-negative recall on the ladder (sf30 is the bonus decade
    # past the verdict ask)
    "hardneg_recall_sf1": "/tmp/r09_hardneg_sf1.json",
    "hardneg_recall_sf30": "/tmp/r09_hardneg_sf30.json",
    # item 7: adversarial band-skew gate (planted one-template corpus)
    "band_skew_3000": "/tmp/r09_band_skew_3000.json",
    "band_skew_10000": "/tmp/r09_band_skew_10000.json",
    # the join-regime decomposition: broadcast hash joins never serialize a
    # hot key (salting there is the measured ~2x overhead above); the gate
    # earns its keep only in the at-scale shuffle-join regime, emulated by
    # disabling auto-broadcast
    "band_skew_shuffle_regime": "/tmp/r09_band_skew_regimes.json",
    # item 8: incremental curation
    "incremental_curation_sf1": "/tmp/r09_incremental_sf1.json",
}

out: dict = {
    "round": 9,
    "methodology": (
        "Same bench.py methodology as round 8: plans built once, warm "
        "best-of-N to the noop sink; DuckDB engine-only via CREATE TEMP "
        "TABLE AS of the exact oracle SQL, same session, same machine; "
        "bucketed layout via plans.catalog.ensure_bucketed_layout (write "
        "cost separate). sf100 rows use best-of-3 after 1 warm-up (the "
        "queries are 10-100x the per-run cost of the sf10 rows). The "
        "minhash A/B and curation sections run AFTER the round-9 geometry "
        "change (16 hashes / 4x4 bands) and hot-bucket salting; survivor "
        "deltas vs the old 12/3x4 geometry are quantified in "
        "minhash_geometry_ab_sf30."
    ),
}
def _load(p: Path):
    """Parse the LAST JSON-object line — JVM GC warnings occasionally leak
    onto stdout ahead of the probe's single json.dumps line."""
    for line in reversed(p.read_text().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


for key, path in SECTIONS.items():
    p = Path(path)
    data = _load(p) if p.exists() and p.stat().st_size > 0 else None
    if data is None:
        out[key] = None
    else:
        out[key] = next(iter(data.values())) if len(data) == 1 else data

Path("BENCH_SCALE_r09.json").write_text(json.dumps(out, indent=1) + "\n")
print("wrote BENCH_SCALE_r09.json:", {k: ("ok" if v else "MISSING") for k, v in out.items() if k not in ("round", "methodology")})
