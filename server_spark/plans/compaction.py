"""Small-file compaction + schema-drift audit — the two table-health
chores every partitioned parquet lake needs at 100 TB.

Reference mapping: the reference's Bolt files are rewritten in place
per realm on every intake (`database_liveauctions.go` [M], mount
empty), so it never accumulates fragments; a parquet lake DOES — every
incremental intake appends files, and a year of hourly snapshots turns
a realm partition into thousands of KB-sized parquet files whose
footer reads dominate scan time (the classic small-files problem: a
100 TB scan at 128 MB/file needs ~800k tasks; at 1 MB/file it needs
100M and the driver dies scheduling them).

Design decisions:
- **Partition-at-a-time rewrite.** Compaction never touches the whole
  table: it lists leaf partitions, picks only those with more than
  ``max_files`` fragments, and rewrites each with a per-partition
  coalesce sized by BYTES (target_file_bytes), not a global file
  count. A crash mid-compaction loses only the aside of one
  partition (tmp -> swap, the maintenance-gold pattern).
- **Content-preserving by construction, verified by fold.** Each
  rewritten partition's row count is compared before/after; the
  caller can pass ``verify_hash=True`` to also compare an
  order-insensitive xxhash fold (costs one extra scan of the
  partition — cheap relative to the rewrite).
- **Schema drift is an AUDIT, not a failure.** ``schema_drift``
  reports columns added/removed/retyped across the table's file
  footers (the mergeSchema cost note in medallion.read_bronze says
  WHY footers can disagree); promotion gates decide what to do —
  the audit only has to see it.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _leaf_partitions(root: str) -> list[str]:
    """Relative paths of leaf partition dirs under a partitioned
    parquet root — any directory that directly holds parquet files
    (hive layouts only store files at the leaves)."""
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(os.path.relpath(dirpath, root))
    return sorted(leaves)


def _fragment_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def _content_hash(df: DataFrame) -> int:
    row = df.select(
        F.xxhash64(*sorted(df.columns)).alias("_h")
    ).agg(F.expr("bit_xor(_h)")).collect()[0]
    return row[0] if row[0] is not None else 0


def compact_partitions(
    spark: SparkSession,
    table_root: str,
    max_files: int = 4,
    target_file_bytes: int = 128 * 1024 * 1024,
    verify_hash: bool = False,
) -> list[dict]:
    """Rewrite every leaf partition holding more than ``max_files``
    parquet fragments into ceil(bytes / target_file_bytes) files.

    Returns one report dict per compacted partition:
    ``{partition, files_before, files_after, rows, bytes}``.
    Partitions at or under the threshold are left untouched (their
    report is not emitted — compaction must be cheap to re-run, and
    an idempotent second pass emits an empty list).
    """
    reports: list[dict] = []
    for rel in _leaf_partitions(table_root):
        part_dir = os.path.join(table_root, rel)
        frags = _fragment_files(part_dir)
        if len(frags) <= max_files:
            continue
        nbytes = sum(
            os.path.getsize(os.path.join(part_dir, f)) for f in frags
        )
        n_out = max(1, -(-nbytes // target_file_bytes))
        df = spark.read.parquet(part_dir)
        rows_before = df.count()
        hash_before = _content_hash(df) if verify_hash else None
        tmp = f"{part_dir}.compact.tmp"
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
        # verify BEFORE the swap — a bad rewrite must never replace
        # good data
        out = spark.read.parquet(tmp)
        rows_after = out.count()
        if rows_after != rows_before or (
            verify_hash and _content_hash(out) != hash_before
        ):
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"compaction verification failed for {rel}: "
                f"{rows_before} rows -> {rows_after}"
            )
        aside = f"{part_dir}.compact.old"
        os.rename(part_dir, aside)
        os.rename(tmp, part_dir)
        shutil.rmtree(aside)
        reports.append(
            {
                "partition": rel,
                "files_before": len(frags),
                "files_after": len(_fragment_files(part_dir)),
                "rows": rows_before,
                "bytes": nbytes,
            }
        )
    return reports


def schema_drift(spark: SparkSession, table_root: str) -> list[dict]:
    """Audit schema drift across the table's parquet file footers.

    Returns one dict per column that is NOT present with one
    consistent type in every file:
    ``{column, n_files_present, n_files_total, types}`` — added and
    removed columns show partial presence; retypes show >1 type.
    """
    import pyarrow.parquet as pq

    files = []
    for dirpath, _dirnames, filenames in os.walk(table_root):
        files.extend(
            os.path.join(dirpath, f)
            for f in filenames
            if f.endswith(".parquet")
        )
    seen: dict[str, dict] = {}
    for fp in files:
        schema = pq.read_schema(fp)
        for name, typ in zip(schema.names, schema.types):
            ent = seen.setdefault(name, {"n": 0, "types": set()})
            ent["n"] += 1
            ent["types"].add(str(typ))
    total = len(files)
    out = []
    for name in sorted(seen):
        ent = seen[name]
        if ent["n"] != total or len(ent["types"]) > 1:
            out.append(
                {
                    "column": name,
                    "n_files_present": ent["n"],
                    "n_files_total": total,
                    "types": sorted(ent["types"]),
                }
            )
    return out
