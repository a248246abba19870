"""t2 differential gate, run locally: every queries() entry vs its
oracle_sql() twin on the sf0.01 tables — the same comparison the driver
records in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .conftest import SF_ORACLE
from .oracle_compare import compare

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_ORACLE)
    if name not in _ORACLES:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    ddf = duck.sql(_ORACLES[name]).df()
    compare(sdf, ddf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_registry_exactly_at_driver_cap():
    # the correctness driver checks at most 50 queries in insertion order
    # (round 2 registered 52 and the last two got no CORRECTNESS row);
    # every registered query must stay inside the checked set
    assert len(_QUERIES) == 50
    # and every oracle belongs to a registered query (no orphans)
    assert set(_ORACLES) <= set(_QUERIES)
