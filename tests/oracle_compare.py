"""Local mirror of the driver's t2 differential check: run a Spark query and
its DuckDB oracle SQL, normalize both results, and compare row-count, column
names and values order-insensitively (SURVEY §5 test strategy, G6)."""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            # DELIBERATE laxity: pandas surfaces SQL NULL doubles as NaN, so
            # NaN and NULL are indistinguishable after toPandas()/df() anyway;
            # queries therefore never OUTPUT literal NaN (guarded ratios map
            # 0/0 to 0 or NULL explicitly), keeping this conflation unexercised.
            return "<NULL>"
        # DRIVER-STRICT: a float NEVER normalizes to an int token, even when
        # integral. Round-6 postmortem: DuckDB SUM(BIGINT) → HUGEINT surfaces
        # as float64 7155.0 while Spark returns int64 7155; the old
        # `v == int(v) → i:<int>` coercion absorbed that skew locally while
        # the driver's hash flagged it (VERDICT r6 items 1-2). Oracles must
        # CAST integer-ish aggregates to BIGINT on both sides instead.
        return f"f:{v:.6f}"
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return f"t:{pd.Timestamp(v).strftime('%Y-%m-%d %H:%M:%S.%f')}"
    if isinstance(v, _dt.date):
        return f"t:{v.isoformat()} 00:00:00.000000"
    if isinstance(v, (int,)):
        return f"i:{v}"
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return f"i:{int(v)}"
        if isinstance(v, np.floating):
            return _norm_cell(float(v))
        if isinstance(v, np.datetime64):
            return _norm_cell(pd.Timestamp(v))
    except ImportError:
        pass
    return f"s:{v}"


def normalize(df: pd.DataFrame) -> list[tuple]:
    # lowercase BEFORE sorting so both engines' frames align columns in the
    # same order even when they return differing identifier case
    df = df.rename(columns=str.lower)
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(row[c]) for c in cols) for _, row in df[cols].iterrows()]
    return sorted(rows)


def compare(spark_df, duck_rel_df: pd.DataFrame, name: str) -> None:
    sp = spark_df.toPandas()
    du = duck_rel_df
    assert sorted(map(str.lower, sp.columns)) == sorted(map(str.lower, du.columns)), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    nsp, ndu = normalize(sp), normalize(du)
    if nsp != ndu:
        diffs = [(a, b) for a, b in zip(nsp, ndu) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
