"""Table maintenance: small-file compaction (SURVEY.md §1.4 storage
posture). Append-heavy layers (manifest-gated bronze, gold history
appends) accumulate one file per micro-batch per partition; thousands
of tiny parquet files turn every downstream scan into a listing +
footer-read storm. Compaction rewrites fragmented partitions into
~target-sized files.

Scale notes:
- Work is proportional to the FRAGMENTED partitions only — the file
  index is consulted first and partitions already at target are left
  untouched (never a full-table rewrite).
- Each partition rewrite is read → repartition(ceil(bytes/target)) →
  write-to-sibling + atomic swap, so readers never observe a partial
  partition (the swap is a rename; on object stores you'd use a
  Delta/Iceberg OPTIMIZE with a commit protocol instead — this is the
  raw-parquet analog).
- Compaction is idempotent and safe to re-run: a compacted partition
  no longer qualifies as fragmented.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def partition_file_stats(root: str) -> dict[str, tuple[int, int]]:
    """{leaf partition dir → (n_data_files, total_bytes)} for a
    (possibly nested) partitioned parquet dataset."""
    stats: dict[str, tuple[int, int]] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        data = [
            f for f in filenames
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        if data:
            total = sum(os.path.getsize(os.path.join(dirpath, f)) for f in data)
            stats[dirpath] = (len(data), total)
    return stats


def compact_partitions(
    spark: SparkSession,
    root: str,
    target_bytes: int = 256 * 1024 * 1024,
    min_files: int = 4,
) -> int:
    """Rewrite every leaf partition holding ≥ ``min_files`` data files
    into ceil(bytes/target) files. Returns partitions rewritten."""
    rewritten = 0
    for part_dir, (n_files, total) in partition_file_stats(root).items():
        if n_files < min_files:
            continue
        n_out = max(1, math.ceil(total / target_bytes))
        if n_out >= n_files:
            continue
        df = spark.read.parquet(part_dir)
        tmp = part_dir + "__compacting"
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
        old = part_dir + "__old"
        os.rename(part_dir, old)
        os.rename(tmp, part_dir)
        shutil.rmtree(old)
        rewritten += 1
    return rewritten
