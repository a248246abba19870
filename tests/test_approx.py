"""Error bound for the HLL scale variant (SURVEY D2's documented swap):
approx_count_distinct must land within 5% of the exact counts — it has no
oracle entry (different sketches across engines), so this is its gate."""

from __future__ import annotations

from wnba_data_pipeline_spark.operators import relational

from .conftest import SF_ORACLE


def test_approx_within_bounds(spark):
    # the HLL variant is deliberately NOT in the driver registry (no_oracle
    # by construction; the 50-query cap is reserved for oracle-checkable
    # queries) — this bound is its correctness gate
    exact = {r["l_returnflag"]: r for r in relational.q_count_distinct_groups(spark, SF_ORACLE).collect()}
    approx = {r["l_returnflag"]: r for r in relational.q_count_distinct_approx(spark, SF_ORACLE).collect()}
    assert exact.keys() == approx.keys()
    for flag, e in exact.items():
        a = approx[flag]
        for col_e, col_a in (
            ("n_suppliers", "n_suppliers_approx"),
            ("n_parts", "n_parts_approx"),
            ("n_orders", "n_orders_approx"),
        ):
            rel_err = abs(a[col_a] - e[col_e]) / e[col_e]
            assert rel_err < 0.05, (flag, col_e, e[col_e], a[col_a])


def test_approx_median_within_bounds(spark, duck):
    """percentile_approx(0.5, accuracy=10000) vs the exact grouped median.
    Every sf0.01 group is far below the accuracy threshold, so the GK
    sketch holds every member and must return an actual middle order
    statistic: equal to the median for odd-count groups, one of the two
    middle members for even-count groups (the exact median interpolates
    them). Pin that contract per group via the true order statistics."""
    exact = {r["l_suppkey"]: r for r in relational.q_dispersion_stats(spark, SF_ORACLE).collect()}
    approx = {r["l_suppkey"]: r for r in relational.q_dispersion_approx(spark, SF_ORACLE).collect()}
    assert exact.keys() == approx.keys()
    mid = {
        (r[0], r[1]): (r[2], r[3])
        for r in duck.execute(
            """
            SELECT l_suppkey, col, min(v) AS lo, max(v) AS hi FROM (
              SELECT l_suppkey, col, v,
                     row_number() OVER (PARTITION BY l_suppkey, col ORDER BY v) AS rn,
                     count(*) OVER (PARTITION BY l_suppkey, col) AS n
              FROM (
                SELECT l_suppkey, 'qty' AS col, l_quantity AS v FROM lineitem
                UNION ALL
                SELECT l_suppkey, 'price', l_extendedprice FROM lineitem
              )
            ) WHERE rn IN ((n + 1) // 2, n // 2 + 1)
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    for k, a in approx.items():
        assert a["n_lines"] == exact[k]["n_lines"] < 10000  # exact-GK regime
        for col, out in (("qty", "qty_median_approx"), ("price", "price_median_approx")):
            lo, hi = mid[(k, col)]
            assert a[out] in (lo, hi), (k, col, a[out], lo, hi)
        # and for odd groups the two coincide with the exact median
        if a["n_lines"] % 2 == 1:
            assert a["qty_median_approx"] == exact[k]["qty_median"]
