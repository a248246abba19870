"""Warehouse maintenance: small-file compaction for the parquet layers.

The small-file problem is the dominant operational failure of long-lived
append-only tables at 100 TB: every ``upsert_partitions`` micro-batch
leaves shard-count × partition files, and once file count ≫ task count the
scan planner pays per-file open cost (footer read, dictionary decode) that
dwarfs the data read — `spark.sql.files.openCostInBytes` models exactly
this. Compaction rewrites a table directory to a target file size while
preserving rows, schema, and the Hive partition layout.

Design choices:
- Target size, not file count: the per-partition row volume varies, so the
  plan computes bytes-per-partition from the actual file inventory and
  coalesces each partition to ``ceil(bytes / target_bytes)`` shards.
- Partition-preserving: each Hive partition directory is rewritten
  independently, so a compaction can run per-partition (incremental
  maintenance behind the same idempotent contract as
  ``upsert_partitions``) and never touches cold partitions unless asked.
- Rewrite-then-swap: the new files land in a sibling temp directory and
  replace the old partition atomically-enough for a single-writer
  warehouse (a real lakehouse would use a table format's commit protocol;
  that boundary is documented, not hidden).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _partition_dirs(path: str) -> list[str]:
    """Leaf directories that directly contain parquet files — the unit of
    rewrite. An unpartitioned table yields [path] itself."""
    leaves = []
    for root, dirs, files in os.walk(path):
        # in-flight/interrupted compaction scratch dirs are not partitions
        dirs[:] = [x for x in dirs if not x.endswith(("__compact_old", "__compact_tmp"))]
        if any(f.endswith(".parquet") for f in files):
            leaves.append(root)
    return leaves or [path]


def _interrupted_dirs(path: str) -> list[str]:
    """Partition dirs with a surviving rename-aside from a crashed swap."""
    hits = []
    for root, dirs, _files in os.walk(path):
        for x in dirs:
            if x.endswith("__compact_old"):
                hits.append(os.path.join(root, x)[: -len("__compact_old")])
    return hits


def compaction_plan(path: str, *, target_bytes: int = DEFAULT_TARGET_BYTES) -> list[dict]:
    """Inventory pass (driver-side, O(files) metadata only): one row per
    leaf partition directory with file count, bytes, and the shard count a
    compaction would rewrite it to. Partitions already at ≤ that shard
    count are reported with ``compact=False`` so the rewrite can skip
    them."""
    plan = []
    for d in _partition_dirs(path):
        files = [
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        ]
        total = sum(os.path.getsize(f) for f in files)
        shards = max(1, math.ceil(total / target_bytes))
        plan.append(
            {
                "dir": d,
                "n_files": len(files),
                "bytes": total,
                "target_shards": shards,
                "compact": len(files) > shards,
            }
        )
    return plan


def _recover_interrupted(d: str) -> None:
    """Roll back a compaction interrupted mid-swap: a surviving
    ``__compact_old`` directory means the rename-aside originals are the
    authoritative copy — restore them over any partially-moved new files
    and drop the incomplete temp output."""
    old = d + "__compact_old"
    tmp = d + "__compact_tmp"
    if os.path.isdir(old):
        for f in os.listdir(d):
            if f.endswith(".parquet") or f.startswith("_"):
                os.remove(os.path.join(d, f))
        for f in os.listdir(old):
            os.rename(os.path.join(old, f), os.path.join(d, f))
        shutil.rmtree(old)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)


def compact_table(
    spark: SparkSession, path: str, *, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Rewrite every over-sharded leaf partition of ``path`` to its target
    shard count. Returns {partitions_compacted, files_before, files_after}.
    Rows and schema are preserved exactly (row-identity asserted in
    tests/test_maintenance.py); partition directories not over-sharded are
    left byte-identical."""
    for d in _interrupted_dirs(path):
        _recover_interrupted(d)
    plan = compaction_plan(path, target_bytes=target_bytes)
    before = sum(p["n_files"] for p in plan)
    done = 0
    for p in plan:
        if not p["compact"]:
            continue
        d = p["dir"]
        tmp = d + "__compact_tmp"
        old = d + "__compact_old"
        (
            spark.read.parquet(d)
            .coalesce(p["target_shards"])
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # Crash-safe swap (ADVICE r6): the originals are RENAMED aside —
        # never deleted while they are the only copy — so every
        # intermediate state is recoverable: a crash before the swap
        # completes leaves the full original set in `old`, and the
        # recovery sweep above restores it on the next run.
        os.makedirs(old, exist_ok=True)
        for f in os.listdir(d):
            if f.endswith(".parquet") or f.startswith("_"):
                os.rename(os.path.join(d, f), os.path.join(old, f))
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(tmp, f), os.path.join(d, f))
        shutil.rmtree(tmp)
        shutil.rmtree(old)
        done += 1
    after = sum(p["n_files"] for p in compaction_plan(path, target_bytes=target_bytes))
    return {"partitions_compacted": done, "files_before": before, "files_after": after}
