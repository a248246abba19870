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

Per micro-batch (``screen_batch``):
1. exact WITHIN-batch collapse (two copies arriving together: keep the
   min doc_id — the same md5→int64 contract as the batch operator);
   collapsed rows still receive ``exact_dup`` verdict rows so the audit
   log accounts for EVERY arriving doc_id;
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

from pyspark.sql import Window

from ..functions.hashing import md5_long
from ..operators.dedup import incremental_verdicts

DOC_SCHEMA = "doc_id long, text string"


def screen_batch(
    batch: DataFrame, ref: DataFrame, *, threshold: float = 0.5
) -> tuple[DataFrame, DataFrame]:
    """(within-batch survivors, COMPLETE verdict frame) for one arriving
    batch vs the accumulated corpus.

    Within-batch exact duplicates (same content hash arriving together)
    collapse to the min doc_id, and — unlike the round-7 form — the
    collapsed rows DO get verdict rows (``exact_dup``, matched_ref = the
    surviving doc_id), so the verdict log accounts for every arriving
    doc_id (the audit contract). A pathological batch carrying the same
    doc_id twice with different texts keeps exactly one deterministic
    row (lowest content hash) instead of fanning out through the
    downstream doc_id joins."""
    base = batch.withColumn("_h", md5_long(F.col("text"))).withColumn(
        "_rid", F.row_number().over(Window.partitionBy("doc_id").orderBy("_h"))
    )
    one_per_id = base.filter(F.col("_rid") == 1).withColumn(
        "_keep_id", F.min("doc_id").over(Window.partitionBy("_h"))
    )
    survivors = one_per_id.filter(F.col("doc_id") == F.col("_keep_id")).select(
        *batch.columns
    )
    collapsed_v = one_per_id.filter(F.col("doc_id") != F.col("_keep_id")).select(
        "doc_id",
        F.lit("exact_dup").alias("verdict"),
        F.col("_keep_id").cast("bigint").alias("matched_ref"),
        F.lit(1.0).alias("best_jaccard"),
    )
    verdicts = incremental_verdicts(survivors, ref, threshold=threshold).unionByName(
        collapsed_v
    )
    return survivors, verdicts


def read_corpus(
    spark: SparkSession, corpus_dir: str, *, exclude_batch: int | None = None
) -> DataFrame:
    """The accumulated clean corpus, empty-safe before the first batch.
    ``exclude_batch`` drops that batch's OWN ``batch=N`` subdir from the
    read — the replay-idempotence guard: a re-delivered batch must screen
    against the corpus as it stood BEFORE its first (possibly partially
    committed) delivery, never against its own prior output.

    Listing goes through the Hadoop FS API resolved from the path's URI
    (round-8 review fix: driver-local ``os.listdir`` silently returned an
    EMPTY corpus on any non-local filesystem — every duplicate would then
    be verdicted ``kept`` with no error — while the module's own posture
    is object-store warehouses; same convention as
    ``sources/maintenance.py``). Under Spark Connect the same listing runs
    through pyarrow's FileSystem instead (round-10 Connect audit) — the
    batch-subdir semantics are identical."""
    from ..sources.maintenance import _fs

    dirs = []
    try:
        fs, P = _fs(spark, corpus_dir)
    except RuntimeError:
        from pyarrow import fs as pafs

        from ..sources.maintenance import pa_fs

        fsys, rel = pa_fs(corpus_dir)
        if fsys.get_file_info(rel).type != pafs.FileType.NotFound:
            base = rel.rstrip("/")
            for sub in fsys.get_file_info(pafs.FileSelector(base)):
                if sub.type != pafs.FileType.Directory:
                    continue
                name = sub.base_name
                if exclude_batch is not None and name == f"batch={exclude_batch}":
                    continue
                if any(
                    f.type == pafs.FileType.File and f.path.endswith(".parquet")
                    for f in fsys.get_file_info(pafs.FileSelector(sub.path))
                ):
                    dirs.append(sub.path)
    else:
        if fs.exists(P(corpus_dir)):
            for st in fs.listStatus(P(corpus_dir)):
                if not st.isDirectory():
                    continue
                name = st.getPath().getName()
                if exclude_batch is not None and name == f"batch={exclude_batch}":
                    continue
                if any(
                    f.getPath().getName().endswith(".parquet")
                    for f in fs.listStatus(st.getPath())
                ):
                    dirs.append(st.getPath().toString())
    if dirs:
        return spark.read.schema(DOC_SCHEMA).parquet(*sorted(dirs))
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
    ref = read_corpus(spark, corpus_dir, exclude_batch=batch_id)
    batch, v = screen_batch(batch_df, ref)
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
