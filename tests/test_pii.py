"""Differential + positive-control gates for the PII scrub operator
(detection counts, sequential redaction, audit hash) — cross-engine like
every text operator: Spark's Java regex and DuckDB's RE2 must count and
replace identically over the shared pattern subset."""

from __future__ import annotations

import duckdb

from wnba_data_pipeline_spark.operators import text

from .conftest import SF_ORACLE
from .oracle_compare import compare

PLANTED = [
    (1, "contact me at jane.doe+spam@example.co.uk or call 555-867-5309 now"),
    (2, "server 192.168.0.1 responded; backup at 10.0.0.255 did not"),
    (3, "ssn 123-45-6789 filed; phone 415.555.1234; mail bob@corp.io"),
    (4, "no pii here, just 3.14159 and a date 2024-01-02 and v1.2.3.4x"),
    (5, ""),
]


def test_pii_stats_match_oracle(spark, duck):
    compare(text.q_pii_stats(spark, SF_ORACLE), duck.sql(text.ORACLE_PII_STATS).df(), "pii_stats")


def _planted_spark(spark):
    docs = spark.createDataFrame(PLANTED, "doc_id long, text string")
    return {r["doc_id"]: r for r in text.pii_scrub(docs).collect()}


def test_pii_planted_positive_control(spark):
    rows = _planted_spark(spark)
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
    assert rows[2]["n_ip"] == 2
    assert rows[3]["n_ssn"] == 1 and rows[3]["n_phone"] == 1 and rows[3]["n_email"] == 1
    # doc 4 traps: a float is not an IP ("3.14159" has two segments),
    # "v1.2.3.4x" has no word boundary after 4... but \b sits between 4
    # and x? no: 4→x is digit→letter, NOT a boundary for \b (both word
    # chars), so it must NOT count; a date is not an SSN (2024 is 4 digits)
    assert rows[4]["pii_total"] == 0
    assert rows[5]["pii_total"] == 0 and rows[5]["redacted_len"] == 0
    # redaction replaced, not merely flagged: placeholder shortens/changes
    assert rows[3]["redacted_len"] != len(PLANTED[2][1])


def test_pii_planted_cross_engine(spark):
    srows = _planted_spark(spark)
    con = duckdb.connect()
    values = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in PLANTED
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {values}) AS v(doc_id, text)"
    )
    drows = {r[0]: r for r in con.execute(text.ORACLE_PII_STATS).fetchall()}
    con.close()
    assert set(srows) == set(drows)
    for vid, s in srows.items():
        d = drows[vid]
        got = (s["n_email"], s["n_ip"], s["n_ssn"], s["n_phone"], s["pii_total"], s["redacted_len"], s["redacted_md5"])
        assert got == tuple(d[1:]), (vid, got, d[1:])
