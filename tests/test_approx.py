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
