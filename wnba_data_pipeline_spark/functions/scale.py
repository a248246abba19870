"""The sf-from-path scale selector shared by every physical-shape switch
(split-distinct, footer stats, similarity modes). ONE implementation so
path parsing and the shared 0.5 threshold cannot silently diverge across
modules (round-8 review consolidation).

Plan selection only — NEVER semantics: every switch keyed on these values
changes plan physics with identical rows (the repo's scale-switch
contract, BASELINE.md round-7 addendum)."""

from __future__ import annotations

import os
import re

# the shared big-data threshold (matches the bench's AQE posture switch)
SCALE_SWITCH_SF = 0.5


def sf_of_path(sf_dir: str) -> float:
    """Scale factor parsed from the directory name; unparseable paths —
    no 'sf<digits>' token, or a degenerate 'sf.' segment — fall back to
    0.0 (the smallest-scale physical shape) instead of raising
    (round-5 ADVICE posture)."""
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    return float(m.group(1)) if m else 0.0


def use_scale_shape(sf_dir: str, env_var: str, *, threshold: float = SCALE_SWITCH_SF) -> bool:
    """True when the big-scale physical shape should be used: the env var
    ('0'/'1') forces either shape (the measurement override); otherwise
    the path's scale factor decides against ``threshold``."""
    forced = os.environ.get(env_var)
    if forced is not None:
        return forced == "1"
    return sf_of_path(sf_dir) >= threshold
