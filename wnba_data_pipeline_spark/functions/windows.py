"""Window-expression library: the reference's rolling/rank semantics as
reusable Column builders.

These pin down the two semantics gotchas from SURVEY.md §2:

- G1: pandas ``rank(ascending=False)`` defaults to ``method='average'``
  (``prepare_dashboard_data.py:71-75``, ``feature_engineering.py:201``) while
  SQL ``rank()`` is min-rank. ``avg_rank`` emulates the pandas semantics as
  ``rank() + (tie_count - 1)/2`` — pure expressions, no UDF, stays inside
  whole-stage codegen.
- E1/E2: pandas ``rolling(n, min_periods=1).mean()``
  (``transform_player_stats.py:127-161``) is exactly a shrinking
  ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW`` frame.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def avg_rank(order_col: Column | str, *, partition_by: list[Column | str] | None = None, ascending: bool = False) -> Column:
    """pandas-``method='average'`` rank (SURVEY G1).

    average_rank = min_rank + (count_of_ties - 1) / 2

    Single global partitions (the reference ranks whole marts,
    ``prepare_dashboard_data.py:71-75``) funnel to one task; callers ranking
    large inputs should pre-aggregate (all reference uses rank post-agg
    marts) — documented 100 TB posture rather than a hidden repartition.
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    ordering = order.asc() if ascending else order.desc()
    part = [F.col(c) if isinstance(c, str) else c for c in (partition_by or [])]
    w_rank = Window.partitionBy(*part).orderBy(ordering)
    # Tie count = peers of the current row under the SAME (partition, order)
    # spec: RANGE BETWEEN CURRENT ROW AND CURRENT ROW is the ORDER-BY-peers
    # frame. Sharing the spec lets Catalyst evaluate rank and the tie count
    # in ONE Window pass over one sort; a partitionBy(part, order) count
    # would plan a second sort + second Window pass (same shuffle, 2× the
    # window passes — measured on the sf0.1 orders fact).
    w_peers = w_rank.rangeBetween(Window.currentRow, Window.currentRow)
    return F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_peers) - F.lit(1)) / F.lit(2.0)


def rolling_avg(col: Column | str, window: WindowSpec, n: int) -> Column:
    """Rolling n-row mean with pandas ``min_periods=1`` shrink-at-start
    semantics (``transform_player_stats.py:134-161``): a row-frame window
    naturally averages over however many rows exist at the partition head."""
    c = F.col(col) if isinstance(col, str) else col
    return F.avg(c).over(window.rowsBetween(-(n - 1), 0))


def rolling_avg_exact(col: Column | str, window: WindowSpec, n: int) -> Column:
    """Cross-engine-exact rolling mean: 6-decimal fixed-point frame sum
    (int64) / frame count. Engines implement sliding double aggregation
    differently (per-frame recompute vs running add/subtract), so plain
    ``avg`` drifts in the last ulp and can flip a 6-decimal rounding at
    scale; integer summation is association-independent. Use in
    oracle-compared queries; plain ``rolling_avg`` is fine for outputs
    that aren't hash-diffed."""
    c = F.col(col) if isinstance(col, str) else col
    frame = window.rowsBetween(-(n - 1), 0)
    fsum = F.sum(F.floor(c * 1_000_000 + F.lit(0.5)).cast("long")).over(frame) / 1_000_000
    # count(c), not count(1): SQL avg skips nulls in BOTH the sum and the
    # denominator — dividing the null-skipping sum by the raw frame row
    # count deflates the mean on nullable metrics (round-8 review fix;
    # measured: frame [2.0, NULL] gave 1.0 where avg gives 2.0)
    return fsum / F.count(c).over(frame)
