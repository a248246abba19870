"""Build an N×-scaled copy of the bench tables for the engine-bound bench.

The round-2 verdict's open question: the four sub-100 ms headline queries
exceed the 2× gate at sf0.1 only because Spark's ~0.15-0.2 s per-job floor
dwarfs DuckDB's sub-40 ms times — an argument, not a measurement. This
script produces the measurement's data: a 10× sf0.1 dataset (≈ sf1,
lineitem = 6M rows) where the floor amortizes to <10% and the
compute-bound ratios govern.

Scaling is ENTITY replication with offset keys (10 disjoint key ranges),
not row duplication under the same keys: group count ×10 with per-group
size/date distributions preserved — the same shape a 10× bigger tenant
would have, so per-supplier rolling windows, per-customer ranks, and join
fan-outs stay representative. /root/testdata is read-only, so the output
lives under the repo (.benchdata/ is gitignored).

Usage: python tools/make_scale_data.py [replicas] (default 10)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SCALE_DST", "/root/repo/.benchdata/sf1")

# key spans measured on sf0.1 (max key + 1): replica i shifts into its own
# disjoint range, so counts-distinct and join cardinalities scale ×N
SPANS = {
    "l_orderkey": 150_000,
    "l_suppkey": 1_000,
    "l_partkey": 20_000,
    "o_orderkey": 150_000,
    "o_custkey": 15_000,
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    # events: user count ×N with each replica keeping the original per-user
    # timeline — sessionization scales in GROUPS, the representative axis
    "event_id": 100_000,
    "user_id": 1_500,
}

# the six BASELINE.md headline queries' tables + the stateful family's
TABLES = ("lineitem", "orders", "customer", "supplier", "events")
# round 8: the LLM-pipeline tables too (curation funnel at sf1 needs them).
# Naive row replication would plant a 100% cross-replica dup rate, so the
# payloads are DECORRELATED per replica while preserving each replica's
# internal dup structure exactly:
#   documents: a replica-salt token every 4 words — no 8-gram shingle
#     survives unchanged, so cross-replica MinHash Jaccard ≈ 0, while
#     within-replica exact/near dup pairs transform identically;
#   embeddings: a per-replica deterministic sign-flip pattern — norms and
#     within-replica cosines are preserved EXACTLY, cross-replica cosines
#     decorrelate to ~0 (sum of ±x_j*y_j under independent sign patterns).
_DOC_TEXT = (
    "CASE WHEN i = 0 THEN text ELSE "
    "regexp_replace(text, '((\\S+ ){4})', '\\1zzr' || i || ' ', 'g') END"
)
_EMB = (
    "CASE WHEN i = 0 THEN embedding ELSE "
    "CAST(list_transform(range(len(embedding)), j -> embedding[j + 1] * "
    "(CASE WHEN hash(i * 131 + j) % 2 = 0 THEN 1.0 ELSE -1.0 END)) AS REAL[]) END"
)
SPECIAL_SEL = {
    # vec_id aligns with doc_id, so it shifts by the DOC span (5000)
    "documents": f"doc_id + i * 5000 AS doc_id, {_DOC_TEXT} AS text, lang, source, "
    f"length({_DOC_TEXT}) AS n_chars",
    "embeddings": f"vec_id + i * 5000 AS vec_id, {_EMB} AS embedding, label",
}


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # sf100-size COPYs (600M rows) must stream, not materialize: with
    # insertion-order preservation DuckDB buffers the whole cross-join
    # output (~30+ GB observed) before writing; row order inside the file
    # carries no semantics for any consumer, so trade it for streaming
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='24GB'")
    # SPARK_GRAFT_SCALE_TABLES narrows the build (e.g. the sf100 ladder rung
    # needs only the engine-bound tables; documents/embeddings evidence lives
    # at sf30 where the funnel runs)
    only = os.environ.get("SPARK_GRAFT_SCALE_TABLES")
    wanted = TABLES + tuple(SPECIAL_SEL) if not only else tuple(only.split(","))
    for t in wanted:
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
        sel = SPECIAL_SEL.get(t) or ", ".join(
            f"{c} + i * {SPANS[c]} AS {c}" if c in SPANS else c for c in cols
        )
        t0 = time.perf_counter()
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), range({replicas}) r(i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        mb = os.path.getsize(f"{DST}/{t}.parquet") / 1e6
        print(f"{t}: {n} rows, {mb:.1f} MB, {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
