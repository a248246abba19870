"""Non-ASCII cross-engine differentials (round 10, VERDICT r9 item 6).

The text family's cross-engine contract — Java regex ≡ DuckDB RE2,
``split(text, ' ')`` ≡ ``string_split``, ``length`` ≡ ``len``, md5 over the
same bytes — was only ever measured on the driver's ASCII synthetic corpus.
This module re-runs the SAME oracle hash-differentials over a planted
multibyte corpus: CJK (with and without spaces), Japanese, emoji (including
astral-plane and ZWJ family sequences), combining marks vs precomposed
accents, Arabic (RTL), Cyrillic/Greek, full-width forms, and PII embedded in
CJK context.

Where both engines agree BY CONSTRUCTION (and this suite now pins it):
- both regex engines match ``[^a-z0-9 ]``-style classes per Unicode CODE
  POINT over the decoded string (Java handles surrogate pairs as single
  code points; RE2 walks UTF-8 runes), so a 4-byte emoji is ONE token for
  TOKEN_REGEX on both sides;
- ``\\d`` / ``\\b`` are ASCII-only in BOTH Java (without
  UNICODE_CHARACTER_CLASS) and RE2, so full-width digits are not PII on
  either side;
- Spark ``length()`` counts code points (UTF8String.numChars) and DuckDB
  ``length()`` counts code points too — a ZWJ family emoji is 7 on both,
  a combining-mark "é" is 2 (vs 1 precomposed) on both;
- md5 hashes the UTF-8 BYTES on both engines, so the md5→int64 contract
  (shingles, minhash band keys, pack assignment) is byte-exact.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from wnba_data_pipeline_spark.operators import dedup, text
from wnba_data_pipeline_spark.sources.sinks import overwrite_table

from .oracle_compare import compare

# doc_id, text — every script family the contract must survive. Texts are
# space-tokenizable on the whole (the operators' token model) with
# deliberate degenerate members (no-space CJK → one giant "word").
_DOCS = [
    (0, "数据 管道 测试 数据 管道 质量 分数 测试 数据 去重 管道 测试"),
    (1, "数据管道测试没有空格的中文文本去重质量分数"),  # no spaces at all
    (2, "スパーク は データ を 処理 する 高速 高速 ストリーム 処理 データ"),
    (3, "I love 🍕 and 🍜 so much 🍕🍕 every single day 🍕"),
    (4, "👩‍👩‍👧‍👦 family emoji 👩‍👩‍👧‍👦 zwj sequence test with words around it"),
    (5, "café résumé naive test combining marks café again here"),
    (6, "café résumé naïve test precomposed marks café again here"),
    (7, "مرحبا بالعالم مرحبا بالعالم اختبار البيانات مرحبا اختبار"),
    (8, "привет мир тест данных δοκιμή κείμενο тест данных привет"),
    (9, "１２３ ４５６ fullwidth test ｔｅｓｔ！ mixed １２３ digits"),
    (10, "联系 test@example.com 电话 555-123-4567 微信 support@例え.jp end"),
    (11, "数据 管道 测试 数据 管道 质量 分数 测试 数据 去重 管道"),  # near-dup of 0 (last word dropped)
    (12, "the quick brown fox jumps over the lazy dog again and again and again"),
]


@pytest.fixture(scope="module")
def mb_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("multibyte"))
    rows = [(i, t, "mixed", f"src{i % 3}", len(t)) for i, t in _DOCS]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    overwrite_table(df, f"{base}/documents.parquet")
    return base


@pytest.fixture(scope="module")
def mb_duck(mb_dir):
    con = duckdb.connect()
    con.execute(
        # overwrite_table writes a DIRECTORY of part files — glob them
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{mb_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    ["text_stats", "pii_stats", "chunk_docs", "sequence_packing", "heavy_hitters_cms"],
)
def test_multibyte_text_family_matches_oracle(name, spark, mb_dir, mb_duck):
    compare(
        text.QUERIES[name](spark, mb_dir),
        mb_duck.sql(text.ORACLES[name]).df(),
        f"mb_{name}",
    )


def test_multibyte_dedup_minhash_matches_oracle(spark, mb_dir, mb_duck):
    # shingles → minhash band keys → candidate join → exact Jaccard verify,
    # all over multibyte word streams (md5 byte contract end-to-end)
    compare(
        dedup.QUERIES["dedup_minhash"](spark, mb_dir),
        mb_duck.sql(dedup.ORACLES["dedup_minhash"]).df(),
        "mb_dedup_minhash",
    )


def test_multibyte_dedup_exact_matches_oracle(spark, mb_dir, mb_duck):
    compare(
        dedup.QUERIES["dedup_exact"](spark, mb_dir),
        mb_duck.sql(dedup.ORACLES["dedup_exact"]).df(),
        "mb_dedup_exact",
    )


def test_multibyte_length_semantics_pinned(spark, mb_duck):
    """The load-bearing agreement the module docstring claims, asserted
    directly: code-point counting for ZWJ emoji and combining marks."""
    zwj = "👩‍👩‍👧‍👦"
    combining = "é"
    got = spark.range(1).select(
        F.length(F.lit(zwj)).alias("zwj_len"),
        F.length(F.lit(combining)).alias("comb_len"),
    ).collect()[0]
    duck = mb_duck.sql(
        f"SELECT length('{zwj}') AS zwj_len, length('{combining}') AS comb_len"
    ).df().iloc[0]
    assert got["zwj_len"] == int(duck["zwj_len"]) == 7  # 4 people + 3 ZWJ
    assert got["comb_len"] == int(duck["comb_len"]) == 2
