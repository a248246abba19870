"""Cross-check: the Structured Streaming tumbling-daily query must produce
the same per-(day, event_type) counts and sums as its batch twin
(``relational.q_tumbling_daily``) once the finite file stream drains."""

from __future__ import annotations

import __spark_entry__ as entrymod
from wnba_data_pipeline_spark.streaming import events as se

from .conftest import SF_SMOKE


def test_stateful_running_totals_match_batch(spark):
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.sources.tables import load_table
    from wnba_data_pipeline_spark.streaming import sessions as ss

    stream_df = ss.running_user_totals_stream(spark, SF_SMOKE)
    ss.run_to_memory(stream_df, "user_totals")
    # final emitted row per user carries the complete running state
    final = {
        r["user_id"]: (r["n_events"], r["value_sum"])
        for r in spark.table("user_totals").collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    assert len(final) == len(batch)
    for r in batch:
        n, s = final[r["user_id"]]
        assert n == r["n"]
        assert abs(s - r["s"]) < 1e-6


def test_streaming_matches_batch_twin(spark):
    stream_df = se.tumbling_daily_stream(spark, SF_SMOKE)
    se.run_to_memory(stream_df, "stream_daily")
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.table("stream_daily").collect()
    }
    batch = entrymod.queries()["tumbling_daily"](spark, SF_SMOKE)
    want = {
        (r["day"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in batch.collect()
    }
    assert got == want


def test_hopping_stream_matches_batch_twin(spark):
    # each event lands in 4 overlapping 1-day/6-hour windows; the drained
    # stream must agree with the identical window call run in batch mode
    stream_df = se.hopping_6h_stream(spark, SF_SMOKE)
    se.run_to_memory(stream_df, "stream_hop")
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.table("stream_hop").collect()
    }
    want = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in se.hopping_6h_batch(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) > 0


def test_watermark_drops_late_events(spark, tmp_path):
    """The late-data contract, observed precisely: an event older than the
    checkpointed watermark is dropped by the stateful operator
    (numRowsDroppedByWatermark), not aggregated — the property that bounds
    state at 100 TB/day."""
    import time

    from pyspark.sql import Row, functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows):
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src)

    def drain():
        # parquet sink (not memory): the restart-from-checkpoint the
        # two-run shape needs is only supported by recoverable sinks
        stream = (
            spark.readStream.schema("ts timestamp, k string, v double")
            .parquet(src)
            .withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").cast("string").alias("win_start"), "k", "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = 0
        for p in q.recentProgress:
            for op in p["stateOperators"]:
                dropped += op.get("numRowsDroppedByWatermark", 0)
        return dropped

    ts = lambda s: Row(ts=__import__("datetime").datetime.fromisoformat(s), k="a", v=1.0)  # noqa: E731
    # batch 1: on-time events through Jan 5 -> watermark advances to Jan 4
    write_batch([ts("2001-01-01 12:00:00"), ts("2001-01-03 12:00:00"), ts("2001-01-05 12:00:00")])
    dropped1 = drain()
    assert dropped1 == 0
    time.sleep(0.2)
    # batch 2: one LATE event (Jan 1, far behind the Jan-4 watermark) and
    # one on-time event — the late row must be dropped by the operator
    write_batch([ts("2001-01-01 13:00:00"), ts("2001-01-07 12:00:00")])
    dropped2 = drain()
    assert dropped2 == 1, dropped2
    # and the finalized Jan-1 window kept its on-time count: exactly one
    # emitted row, n == 1 (the late row never re-opened the window)
    final = spark.read.parquet(out).collect()
    jan1 = [r["n"] for r in final if r["win_start"].startswith("2001-01-01")]
    assert jan1 == [1], final


def test_interval_join_stream_matches_batch_range_join(spark):
    """The stream-stream interval join must emit exactly the pair set the
    batch bin-bucketed range_join computes (inner form, trailing 24h)."""
    from wnba_data_pipeline_spark.streaming import joins as sj

    sj.run_pairs_to_memory(
        sj.attribution_pairs_stream(spark, SF_SMOKE), "stream_pairs"
    )
    got = {
        (r["purchase_id"], r["prior_id"])
        for r in spark.table("stream_pairs").collect()
    }
    want = {
        (r["purchase_id"], r["prior_id"])
        for r in sj.attribution_pairs_batch(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) > 0


def test_session_window_stream_matches_batch_twin(spark):
    """The streaming session_window aggregation, drained over the finite
    file source, must equal the batch sessionization row-for-row."""
    from wnba_data_pipeline_spark.operators import relational
    from wnba_data_pipeline_spark.streaming import sessions as ss

    ss.drain_to_memory(
        ss.sessionize_stream(spark, SF_SMOKE), "stream_sessions", mode="complete"
    )
    got = sorted(
        tuple(r) for r in spark.table("stream_sessions").collect()
    )
    want = sorted(
        tuple(r) for r in relational.q_sessionize_events(spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_dedup_matches_sequential_batch_replay(spark, tmp_path):
    # Drain a 3-chunk document stream with planted cross-chunk exact and
    # near copies through the foreachBatch ingestion dedup, then replay
    # the same chunks SEQUENTIALLY with the batch operator: the verdict
    # log and the final corpus must agree, and the corpus must hold no
    # duplicate content hash (streaming/dedup.py correctness gate).
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.functions.hashing import md5_long
    from wnba_data_pipeline_spark.operators.dedup import incremental_verdicts
    from wnba_data_pipeline_spark.sources.tables import load_table
    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 120)
    )
    chunk0 = docs.filter(F.col("doc_id") % 3 == 0)
    # chunk1: fresh docs + exact copies of chunk0 docs + one within-batch pair
    chunk1 = (
        docs.filter(F.col("doc_id") % 3 == 1)
        .unionByName(
            docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 30)).select(
                (F.col("doc_id") + 10_000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") == 1).select(
                (F.col("doc_id") + 20_000).alias("doc_id"), "text"
            )
        )
    )
    # chunk2: fresh docs + near-copies (last word dropped) of chunk1 docs
    chunk2 = docs.filter(F.col("doc_id") % 3 == 2).unionByName(
        docs.filter((F.col("doc_id") % 3 == 1) & (F.col("doc_id") < 40)).select(
            (F.col("doc_id") + 30_000).alias("doc_id"),
            F.regexp_replace(F.col("text"), " [^ ]+$", "").alias("text"),
        )
    )
    chunks = [chunk0, chunk1, chunk2]

    src = str(tmp_path / "arrivals")
    _os.makedirs(src)
    for i, ch in enumerate(chunks):
        ch.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"stage{i}"))
        part = next(
            f for f in _os.listdir(str(tmp_path / f"stage{i}")) if f.endswith(".parquet")
        )
        dst = _os.path.join(src, f"chunk{i}.parquet")
        _os.rename(_os.path.join(str(tmp_path / f"stage{i}"), part), dst)
        _os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))  # arrival order

    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    q = sdedup.dedup_ingest_stream(
        spark, src, corpus_dir, verdicts_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    # sequential batch replay (same within-batch collapse, same screen)
    ref = spark.createDataFrame([], sdedup.DOC_SCHEMA)
    replay_verdicts = []
    for ch in chunks:
        batch, v = sdedup.screen_batch(ch, ref)
        v = v.cache()
        replay_verdicts.append(v)
        ref = ref.unionByName(
            batch.join(v.filter(F.col("verdict") == "kept").select("doc_id"), "doc_id")
        ).cache()

    got_v = sorted(
        tuple(r) for r in spark.read.parquet(f"{verdicts_dir}/*/").collect()
    )
    want_v = sorted(
        tuple(r) for df in replay_verdicts for r in df.collect()
    )
    assert got_v == want_v

    corpus = sdedup.read_corpus(spark, corpus_dir)
    assert sorted(r.doc_id for r in corpus.collect()) == sorted(
        r.doc_id for r in ref.collect()
    )
    # no duplicate content hash survives in the corpus
    dupes = (
        corpus.select(md5_long(F.col("text")).alias("h"))
        .groupBy("h")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_streaming_dedup_batch_replay_is_idempotent(spark, tmp_path):
    # The at-least-once window of foreachBatch: a crash AFTER the corpus
    # append but BEFORE the checkpoint commit re-delivers the same batch
    # id. The re-run must re-screen against the corpus as it stood BEFORE
    # the batch (its own batch=N output excluded), reproducing identical
    # verdicts and an identical kept set — NOT flag its own survivors as
    # exact_dup and overwrite corpus/batch=N empty (ADVICE r7 high).
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")

    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")], sdedup.DOC_SCHEMA
    )
    b1 = spark.createDataFrame(
        [(3, "eta theta iota"), (4, "alpha beta gamma")], sdedup.DOC_SCHEMA
    )
    sdedup.process_batch(spark, b0, 0, corpus_dir, verdicts_dir)
    sdedup.process_batch(spark, b1, 1, corpus_dir, verdicts_dir)

    first_verdicts = sorted(
        tuple(r) for r in spark.read.parquet(f"{verdicts_dir}/batch=1").collect()
    )
    first_corpus = sorted(
        r.doc_id for r in sdedup.read_corpus(spark, corpus_dir).collect()
    )
    assert 3 in first_corpus and 4 not in first_corpus  # doc 4 is an exact dup of doc 1

    # simulated redelivery: corpus/batch=1 already on disk from the first run
    sdedup.process_batch(spark, b1, 1, corpus_dir, verdicts_dir)

    assert (
        sorted(tuple(r) for r in spark.read.parquet(f"{verdicts_dir}/batch=1").collect())
        == first_verdicts
    )
    assert (
        sorted(r.doc_id for r in sdedup.read_corpus(spark, corpus_dir).collect())
        == first_corpus
    )
    # and the kept doc is still physically present in its own batch subdir
    assert spark.read.parquet(f"{corpus_dir}/batch=1").filter(
        F.col("doc_id") == 3
    ).count() == 1


def test_screen_batch_audits_collapsed_rows_and_duplicate_ids(spark):
    """Round-8 review fixes: (a) within-batch exact copies collapsed by
    screen_batch still receive exact_dup verdict rows (the audit log
    accounts for every arriving doc_id); (b) a batch carrying the same
    doc_id twice with different texts keeps exactly one deterministic row
    instead of fanning out through the doc_id joins."""
    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    ref = spark.createDataFrame([], sdedup.DOC_SCHEMA)
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact copy of 1 → collapsed
            (3, "separate text entirely here"),
            (4, "first variant of this doc"),
            (4, "second variant of this doc"),  # duplicate doc_id
        ],
        sdedup.DOC_SCHEMA,
    )
    survivors, verdicts = sdedup.screen_batch(batch, ref)
    s_rows = survivors.collect()
    assert sorted(r["doc_id"] for r in s_rows) == [1, 3, 4]
    assert sum(1 for r in s_rows if r["doc_id"] == 4) == 1  # no fan-out
    v = {r["doc_id"]: r for r in verdicts.collect()}
    assert set(v) == {1, 2, 3, 4}  # every arriving doc_id has a verdict
    assert v[2]["verdict"] == "exact_dup" and v[2]["matched_ref"] == 1
    assert v[1]["verdict"] == "kept" and v[3]["verdict"] == "kept"


def test_signature_index_matches_textual_screen(spark, tmp_path):
    """Round 11 (VERDICT r10 item 2): the signature-index screen must be
    verdict- and corpus-identical to the textual screen — the index rows
    ARE the derivations incremental_verdicts recomputes. Batches carry
    exact dups, near dups (last word dropped), and fresh docs across
    batch boundaries."""
    from pyspark.sql import functions as F

    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    batches = [
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine")],
        [(3, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup of 1
         (4, "one two three four five six seven eight"),         # near dup of 2
         (5, "completely different words in this document here")],
        [(6, "completely different words in this document"),     # near dup of 5
         (7, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup of 1
         (8, "brand new content that matches nothing else at all")],
    ]
    runs = {}
    for label, idx in (("plain", None), ("indexed", str(tmp_path / "index"))):
        corpus_dir = str(tmp_path / f"corpus_{label}")
        verdicts_dir = str(tmp_path / f"verdicts_{label}")
        for i, rows in enumerate(batches):
            b = spark.createDataFrame(rows, sdedup.DOC_SCHEMA)
            sdedup.process_batch(spark, b, i, corpus_dir, verdicts_dir, index_dir=idx)
        runs[label] = (
            sorted(tuple(r) for r in spark.read.parquet(f"{verdicts_dir}/*/").collect()),
            sorted(tuple(r) for r in sdedup.read_corpus(spark, corpus_dir).collect()),
        )
    assert runs["plain"] == runs["indexed"]
    verdicts = dict((r[0], r[1]) for r in runs["indexed"][0])
    assert verdicts[3] == "exact_dup" and verdicts[7] == "exact_dup"
    assert verdicts[4] == "near_dup" and verdicts[6] == "near_dup"
    assert verdicts[8] == "kept"
    # the index itself accumulated one slice per batch and reads back clean
    index = sdedup.read_index(spark, str(tmp_path / "index"))
    assert index["hash"].count() == index["hh"].count()  # one row per kept doc
    n_kept = len(runs["indexed"][1])
    assert index["hash"].count() == n_kept
    assert index["bands"].count() == n_kept * sdedup_n_bands()


def sdedup_n_bands():
    from wnba_data_pipeline_spark.operators.dedup import N_BANDS

    return N_BANDS


def test_signature_index_replay_is_idempotent(spark, tmp_path):
    """The at-least-once replay contract extends to the index: a
    re-delivered batch screens against the index as it stood BEFORE the
    batch (own slice excluded) and rewrites identical output."""
    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    index_dir = str(tmp_path / "index")

    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta epsilon zeta eta")], sdedup.DOC_SCHEMA
    )
    b1 = spark.createDataFrame(
        [(3, "eta theta iota kappa"), (4, "alpha beta gamma delta")], sdedup.DOC_SCHEMA
    )
    sdedup.process_batch(spark, b0, 0, corpus_dir, verdicts_dir, index_dir=index_dir)
    sdedup.process_batch(spark, b1, 1, corpus_dir, verdicts_dir, index_dir=index_dir)

    first_verdicts = sorted(
        tuple(r) for r in spark.read.parquet(f"{verdicts_dir}/batch=1").collect()
    )
    first_corpus = sorted(r.doc_id for r in sdedup.read_corpus(spark, corpus_dir).collect())
    first_index_hash = sorted(
        tuple(r) for r in sdedup.read_index(spark, index_dir)["hash"].collect()
    )
    assert 3 in first_corpus and 4 not in first_corpus

    # simulated redelivery with batch=1 corpus AND index slices on disk
    sdedup.process_batch(spark, b1, 1, corpus_dir, verdicts_dir, index_dir=index_dir)

    assert (
        sorted(tuple(r) for r in spark.read.parquet(f"{verdicts_dir}/batch=1").collect())
        == first_verdicts
    )
    assert (
        sorted(r.doc_id for r in sdedup.read_corpus(spark, corpus_dir).collect())
        == first_corpus
    )
    assert (
        sorted(tuple(r) for r in sdedup.read_index(spark, index_dir)["hash"].collect())
        == first_index_hash
    )


def test_index_enablement_backfills_unindexed_corpus_batches(spark, tmp_path):
    """Round 12 (VERDICT r11 item 2): turning the signature index ON over
    a corpus with pre-index history must still catch duplicates of the
    unindexed docs. Before the guard, the screen read ONLY the indexed
    slices, so a dup of a pre-enablement doc was silently ``kept`` —
    permanent corpus pollution with no error. Batches 0-1 run without an
    index; batch 2 enables it and carries an exact dup of a batch-0 doc, a
    near dup of a batch-1 doc, and a fresh doc."""
    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    index_dir = str(tmp_path / "index")

    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")], sdedup.DOC_SCHEMA
    )
    b1 = spark.createDataFrame(
        [(2, "one two three four five six seven eight nine")], sdedup.DOC_SCHEMA
    )
    sdedup.process_batch(spark, b0, 0, corpus_dir, verdicts_dir)  # no index
    sdedup.process_batch(spark, b1, 1, corpus_dir, verdicts_dir)  # no index

    b2 = spark.createDataFrame(
        [
            (3, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
            (4, "one two three four five six seven eight"),        # near dup of 2
            (5, "brand new content that matches nothing else at all"),
        ],
        sdedup.DOC_SCHEMA,
    )
    sdedup.process_batch(spark, b2, 2, corpus_dir, verdicts_dir, index_dir=index_dir)

    v = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{verdicts_dir}/batch=2").collect()
    }
    assert v[3]["verdict"] == "exact_dup" and v[3]["matched_ref"] == 1
    assert v[4]["verdict"] == "near_dup" and v[4]["matched_ref"] == 2
    assert v[5]["verdict"] == "kept"
    kept = sorted(r.doc_id for r in sdedup.read_corpus(spark, corpus_dir).collect())
    assert kept == [1, 2, 5]

    # the backfilled index is value-identical to an always-on one (it
    # indexes exactly the KEPT corpus): the two pre-index batches gained
    # complete slices, and a second enablement pass finds nothing left to
    # backfill
    index = sdedup.read_index(spark, index_dir)
    assert sorted(r.doc_id for r in index["hash"].collect()) == [1, 2, 5]
    assert sorted(set(r.doc_id for r in index["hh"].collect())) == [1, 2, 5]
    assert sdedup.backfill_index(spark, corpus_dir, index_dir) == []


def test_backfill_covers_partial_index_slice(spark, tmp_path):
    """A crash between write_index's three subtree writes leaves a PARTIAL
    slice (hash present, bands/sh missing) — the guard must treat it as
    missing and rewrite it whole, or the LSH candidate join silently loses
    that batch's band keys."""
    import shutil

    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    index_dir = str(tmp_path / "index")

    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")], sdedup.DOC_SCHEMA
    )
    sdedup.process_batch(spark, b0, 0, corpus_dir, verdicts_dir, index_dir=index_dir)
    shutil.rmtree(f"{index_dir}/bands/batch=0")  # simulated partial write

    b1 = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon zeta eta"),  # near dup of 1
         (3, "unrelated text entirely different words here")],
        sdedup.DOC_SCHEMA,
    )
    sdedup.process_batch(spark, b1, 1, corpus_dir, verdicts_dir, index_dir=index_dir)
    v = {r["doc_id"]: r for r in spark.read.parquet(f"{verdicts_dir}/batch=1").collect()}
    assert v[2]["verdict"] == "near_dup" and v[2]["matched_ref"] == 1
    assert v[3]["verdict"] == "kept"


def test_read_index_refuses_legacy_sh_layout(spark, tmp_path):
    """ADVICE r12: a pre-round-12 on-disk index (legacy ``sh`` string
    subtree, no ``hh``) read via ``read_index`` OUTSIDE process_batch used
    to silently yield an empty hh frame — every near-dup candidate then
    dropped in the verify join and dups were verdicted kept. It must raise
    pointing at backfill_index instead; and backfill_index itself (which
    process_batch always runs first) must repair the layout in place."""
    import shutil

    import pytest

    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")], sdedup.DOC_SCHEMA
    )
    sdedup.process_batch(spark, b0, 0, corpus_dir, str(tmp_path / "v"), index_dir=index_dir)
    # forge the legacy layout: hh slices renamed to the pre-r12 'sh' tree
    shutil.move(f"{index_dir}/hh", f"{index_dir}/sh")

    with pytest.raises(ValueError, match="backfill_index"):
        sdedup.read_index(spark, index_dir)

    # the documented repair rebuilds the hh slices from corpus text
    assert sdedup.backfill_index(spark, corpus_dir, index_dir) == ["batch=0"]
    index = sdedup.read_index(spark, index_dir)
    assert sorted(r.doc_id for r in index["hh"].collect()) == [1]


def test_process_batch_sub_seam_attribution_contract(spark, tmp_path):
    """Round 15: the r14 judge flagged screen_verdicts (10-82 s) and
    index_write (5-38 s) as swinging sf100 stages with "no attribution
    below stage level". When a seam sink is passed, process_batch now
    splits each into its compute vs I/O sub-seams; this pins the key
    contract the BENCH_SCALE_r15 probe folds on, and that the sub-seams
    sum to (approximately) their parent stage wall. The no-sink shipped
    path stays seam-free (zero cost when unused)."""
    from wnba_data_pipeline_spark.streaming import dedup as sdedup

    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    index_dir = str(tmp_path / "index")
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta epsilon zeta eta")],
        sdedup.DOC_SCHEMA,
    )
    seams: dict = {}
    sdedup.process_batch(
        spark, b0, 0, corpus_dir, verdicts_dir, index_dir=index_dir,
        stage_seconds=seams,
    )
    assert {
        "screen_verdict_mat_sec",
        "screen_verdict_write_sec",
        "screen_verdicts",
        "index_shingle_mat_sec",
        "index_hash_write_sec",
        "index_bands_write_sec",
        "index_hh_write_sec",
        "index_write",
    } <= set(seams), sorted(seams)
    assert all(v >= 0 for v in seams.values())
    # sub-seams account for their parent stage (wall-clock, loose bound)
    assert (
        abs(
            seams["screen_verdict_mat_sec"]
            + seams["screen_verdict_write_sec"]
            - seams["screen_verdicts"]
        )
        < 0.75
    )
    index_subs = (
        seams["index_shingle_mat_sec"]
        + seams["index_hash_write_sec"]
        + seams["index_bands_write_sec"]
        + seams["index_hh_write_sec"]
    )
    assert index_subs <= seams["index_write"] + 0.75
