"""Streaming ingestion dedup — the 100 TB arrival shape of the dedup
family, run incrementally (SURVEY §2.J beyond-parity surface; completes
the batch ``operators/dedup.incremental_verdicts`` story, which screens
ONE batch: here every micro-batch of a document stream is screened
against the ACCUMULATED clean corpus, and its survivors join that corpus
before the next batch arrives).

Shape: ``foreachBatch`` over a file-source stream. Structured Streaming's
stateful built-ins cannot express "join each batch against a growing
multi-TB side" (stream-stream joins bound state by watermark; this state
is the corpus itself), so the corpus lives WHERE IT WOULD AT 100 TB — as
a parquet table the batch hook reads and appends to, exactly the
lakehouse ingestion pattern (the checkpoint dir gives exactly-once batch
replay; the append is idempotent per batch id via overwrite-by-batch
subdirs).

Per micro-batch:
1. exact WITHIN-batch collapse (two copies arriving together: keep the
   min doc_id — ``content_hash`` groupBy, the same md5→int64 contract as
   the batch operator);
2. ``incremental_verdicts`` vs the accumulated corpus (exact hash +
   MinHash-LSH near screen — band equi-joins, never batch × corpus);
3. verdicts append to an audit table; ``kept`` docs append to the corpus.

Near-dups WITHIN one micro-batch are not collapsed (two near-copies
arriving together both survive) — same bound a per-batch production
screen has; the periodic whole-corpus ``minhash_pairs`` sweep is the
documented repair, exactly like compaction repairs small files.

Correctness gate (tests/test_streaming.py): drain a finite 3-chunk
stream with planted cross-chunk exact and near copies, then (a) the
final corpus carries no duplicate content hash, (b) the verdict log
equals the SEQUENTIAL batch replay of ``incremental_verdicts`` over the
same chunks in order — the batch-twin cross-check precedent every
streaming operator here follows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..operators.dedup import incremental_verdicts

DOC_SCHEMA = "doc_id long, text string"


def _dedup_within_batch(batch: DataFrame) -> DataFrame:
    """Collapse exact duplicates INSIDE one arriving batch: keep the min
    doc_id per content hash (deterministic; same hash contract as
    ``operators/dedup.exact_survivors``)."""
    keep = (
        batch.select("doc_id", md5_long(F.col("text")).alias("_h"))
        .groupBy("_h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return batch.join(keep, "doc_id")


def read_corpus(
    spark: SparkSession, corpus_dir: str, *, exclude_batch: int | None = None
) -> DataFrame:
    """The accumulated clean corpus, empty-safe before the first batch.
    ``exclude_batch`` drops that batch's OWN ``batch=N`` subdir from the
    read — the replay-idempotence guard: a re-delivered batch must screen
    against the corpus as it stood BEFORE its first (possibly partially
    committed) delivery, never against its own prior output."""
    dirs = []
    if os.path.isdir(corpus_dir):
        for d in sorted(os.listdir(corpus_dir)):
            if exclude_batch is not None and d == f"batch={exclude_batch}":
                continue
            full = os.path.join(corpus_dir, d)
            if os.path.isdir(full) and any(
                f.endswith(".parquet") for f in os.listdir(full)
            ):
                dirs.append(full)
    if dirs:
        return spark.read.schema(DOC_SCHEMA).parquet(*dirs)
    return spark.createDataFrame([], DOC_SCHEMA)


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    verdicts_dir: str,
) -> None:
    """One micro-batch of the ingestion dedup: within-batch collapse →
    screen vs the accumulated corpus → overwrite this batch's verdict and
    corpus subdirs. IDEMPOTENT per batch id even against a crash BETWEEN
    the corpus append and the checkpoint commit (the foreachBatch
    at-least-once window): the reference corpus excludes ``batch=N``'s own
    subdir, so a re-delivered batch re-screens against exactly the
    pre-batch corpus and rewrites identical output — without the exclusion
    a replay would see its own kept docs in the corpus, flag everything
    exact_dup, and overwrite corpus/batch=N empty (permanent doc loss;
    crash-replay test in tests/test_streaming.py)."""
    batch = _dedup_within_batch(batch_df)
    ref = read_corpus(spark, corpus_dir, exclude_batch=batch_id)
    v = incremental_verdicts(batch, ref)
    v.write.mode("overwrite").parquet(os.path.join(verdicts_dir, f"batch={batch_id}"))
    kept = batch.join(
        spark.read.parquet(os.path.join(verdicts_dir, f"batch={batch_id}"))
        .filter(F.col("verdict") == "kept")
        .select("doc_id"),
        "doc_id",
    )
    kept.write.mode("overwrite").parquet(os.path.join(corpus_dir, f"batch={batch_id}"))


def dedup_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    verdicts_dir: str,
    checkpoint_dir: str,
):
    """Start the availableNow ingestion: one file per trigger (so chunk
    arrival order is honored), each batch screened then folded into the
    corpus. Returns the StreamingQuery; callers ``awaitTermination``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch_df, batch_id, corpus_dir, verdicts_dir)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
