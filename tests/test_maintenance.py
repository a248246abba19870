"""Compaction gates (sources/maintenance.py): the rewrite must reduce file
counts to the computed target, preserve rows/schema exactly, respect the
Hive partition layout, and leave already-compact partitions untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wnba_data_pipeline_spark.sources import maintenance
from wnba_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _fragmented_table(spark, path: str):
    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "flag", F.col("l_returnflag")
    )
    # 3 appends x 8 shards per partition = heavily over-sharded
    for _ in range(3):
        li.repartition(8).write.mode("append").partitionBy("flag").parquet(path)


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented_table(spark, path)
    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("flag").collect()
    )
    plan = maintenance.compaction_plan(spark, path, target_bytes=1 << 30)
    assert all(p["compact"] for p in plan)  # every partition over-sharded
    stats = maintenance.compact_table(spark, path, target_bytes=1 << 30)
    assert stats["partitions_compacted"] == len(plan) == 3  # A/N/R flags
    assert stats["files_after"] == 3  # one 1GB-target shard per partition
    assert stats["files_before"] > stats["files_after"]
    after_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("flag").collect()
    )
    assert after_rows == before_rows
    # partition layout survived: the flag directories still exist and the
    # partition-column filter reads exactly the source's A-flag rows (x3
    # appends)
    assert sorted(d for d in os.listdir(path) if d.startswith("flag=")) == [
        "flag=A",
        "flag=N",
        "flag=R",
    ]
    want_a = 3 * load_table(spark, SF_SMOKE, "lineitem").filter(
        F.col("l_returnflag") == "A"
    ).count()
    assert spark.read.parquet(path).filter(F.col("flag") == "A").count() == want_a


def test_compaction_skips_already_compact_partitions(spark, tmp_path):
    path = str(tmp_path / "ok")
    load_table(spark, SF_SMOKE, "nation").coalesce(1).write.parquet(path)
    files_before = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    stats = maintenance.compact_table(spark, path, target_bytes=1 << 30)
    assert stats["partitions_compacted"] == 0
    assert {f for f in os.listdir(path) if f.endswith(".parquet")} == files_before


def test_compaction_recovers_interrupted_swap(spark, tmp_path):
    # Simulate a crash mid-swap: originals renamed aside to __compact_old,
    # a partial new file already moved in. The next compact_table run must
    # restore the originals (they are the only complete copy), drop the
    # partial output, and then compact normally — no rows lost (ADVICE r6
    # crash-safety item).
    path = str(tmp_path / "crash")
    _fragmented_table(spark, path)
    want_rows = sorted(tuple(r) for r in spark.read.parquet(path).drop("flag").collect())
    part = os.path.join(path, "flag=A")
    old = part + "__compact_old"
    os.makedirs(old)
    moved = [f for f in os.listdir(part) if f.endswith(".parquet")]
    for f in moved:
        os.rename(os.path.join(part, f), os.path.join(old, f))
    # a partial new file: wrong contents standing in for an incomplete move
    nation = load_table(spark, SF_SMOKE, "nation")
    tmpdir = str(tmp_path / "partial")
    nation.coalesce(1).write.parquet(tmpdir)
    partial = next(f for f in os.listdir(tmpdir) if f.endswith(".parquet"))
    os.rename(os.path.join(tmpdir, partial), os.path.join(part, partial))
    stats = maintenance.compact_table(spark, path, target_bytes=1 << 30)
    assert stats["partitions_compacted"] == 3
    got_rows = sorted(tuple(r) for r in spark.read.parquet(path).drop("flag").collect())
    assert got_rows == want_rows
    assert not os.path.isdir(old)


def test_compaction_recovery_keeps_committed_swap(spark, tmp_path):
    # A surviving __compact_trash dir means the swap COMMITTED: the
    # partition dir holds the complete new output and the trash holds the
    # superseded originals. Recovery must drop the trash and keep the new
    # output — never "restore" stale rows over a committed rewrite.
    path = str(tmp_path / "committed")
    _fragmented_table(spark, path)
    want_rows = sorted(tuple(r) for r in spark.read.parquet(path).drop("flag").collect())
    part = os.path.join(path, "flag=A")
    trash = part + "__compact_trash"
    os.makedirs(trash)
    # stale "originals" that must NOT come back
    load_table(spark, SF_SMOKE, "nation").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stale")
    )
    stale = next(f for f in os.listdir(str(tmp_path / "stale")) if f.endswith(".parquet"))
    os.rename(os.path.join(str(tmp_path / "stale"), stale), os.path.join(trash, stale))
    actions = maintenance.recover_interrupted(spark, path)
    assert actions["committed"] == 1 and actions["rolled_back"] == 0
    assert not os.path.isdir(trash)
    got_rows = sorted(tuple(r) for r in spark.read.parquet(path).drop("flag").collect())
    assert got_rows == want_rows


def test_compaction_recovery_drops_orphan_tmp(spark, tmp_path):
    # Crash BEFORE the aside: the partition dir was never touched and the
    # temp output is garbage — recovery deletes it and nothing else.
    path = str(tmp_path / "orphan")
    _fragmented_table(spark, path)
    want_rows = sorted(tuple(r) for r in spark.read.parquet(path).drop("flag").collect())
    part = os.path.join(path, "flag=R")
    tmp = part + "__compact_tmp"
    load_table(spark, SF_SMOKE, "nation").coalesce(1).write.parquet(tmp)
    actions = maintenance.recover_interrupted(spark, path)
    assert actions["tmp_dropped"] == 1 and actions["rolled_back"] == 0
    assert not os.path.isdir(tmp)
    got_rows = sorted(tuple(r) for r in spark.read.parquet(path).drop("flag").collect())
    assert got_rows == want_rows


def test_compaction_recovery_restores_vanished_partition_dir(spark, tmp_path):
    # Crash BETWEEN the whole-dir aside and the recreate: the partition dir
    # does not exist at all; the aside holds everything. Recovery renames
    # it back wholesale.
    path = str(tmp_path / "vanished")
    _fragmented_table(spark, path)
    want_rows = sorted(tuple(r) for r in spark.read.parquet(path).drop("flag").collect())
    part = os.path.join(path, "flag=N")
    os.rename(part, part + "__compact_old")
    actions = maintenance.recover_interrupted(spark, path)
    assert actions["rolled_back"] == 1
    assert os.path.isdir(part) and not os.path.isdir(part + "__compact_old")
    got_rows = sorted(tuple(r) for r in spark.read.parquet(path).drop("flag").collect())
    assert got_rows == want_rows


def _unpartitioned_table(spark, path: str):
    li = load_table(spark, SF_SMOKE, "lineitem")
    for _ in range(3):
        li.repartition(8).write.mode("append").parquet(path)


def test_unpartitioned_table_compacts_and_recovers(spark, tmp_path):
    """An unpartitioned table is its own rewrite unit (d == path), so the
    swap scratch lands as SIBLINGS of the root — compaction must still
    work, and recovery must find the sibling markers even when the root
    itself was renamed aside (the state where the table 'vanishes')."""
    path = str(tmp_path / "flat")
    _unpartitioned_table(spark, path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    stats = maintenance.compact_table(spark, path, target_bytes=1 << 30)
    assert stats["partitions_compacted"] == 1
    assert stats["files_after"] == 1
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before
    assert not os.path.exists(path + "__compact_old")
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_trash")

    # crash state A: aside rename done, root missing entirely
    os.rename(path, path + "__compact_old")
    got = maintenance.recover_interrupted(spark, path)
    assert got["rolled_back"] == 1
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before

    # crash state B: aside done, root holds partial new output
    os.rename(path, path + "__compact_old")
    os.makedirs(path)
    with open(os.path.join(path, "part-partial.parquet"), "wb") as fh:
        fh.write(b"garbage")
    got = maintenance.recover_interrupted(spark, path)
    assert got["rolled_back"] == 1
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before

    # crash state C: commit happened, sibling trash left behind
    os.makedirs(path + "__compact_trash")
    got = maintenance.recover_interrupted(spark, path)
    assert got["committed"] == 1
    assert not os.path.exists(path + "__compact_trash")
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == before
