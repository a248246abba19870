"""t2 differential gate, run locally: every queries() entry vs its
oracle_sql() twin on the sf0.01 tables — the same comparison the driver
records in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

import os

import __spark_entry__ as entrymod
from wnba_data_pipeline_spark.operators import clustering, pq
from .conftest import SF_ORACLE
from .oracle_compare import compare

_QUERIES = entrymod.queries()
_ORACLES = dict(entrymod.oracle_sql())

# semantic_dedup's oracle embeds the fitted centroids for the DRIVER's sf
# (sf0.01); when the sweep runs at another scale, swap in that scale's
# checked-in centroid rendering so the comparison stays exact
_SF_NAME = os.path.basename(SF_ORACLE.rstrip("/"))
if _SF_NAME != "sf0.01":
    _ORACLES["semantic_dedup"] = clustering.oracle_semantic_dedup(_SF_NAME)
    _ORACLES["pq_rerank"] = pq.oracle_pq_rerank(_SF_NAME)


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
