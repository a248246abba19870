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
