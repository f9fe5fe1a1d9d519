"""Partition-pruned MERGE (upsert) into partitioned parquet.

Plain parquet has no transaction log, so a naive upsert rewrites the
whole table. This primitive implements the pattern every lakehouse
engine (Delta/Iceberg/Hudi — public designs) reduces to for
partition-aligned updates:

1. project the DISTINCT partition values present in the updates (a
   driver collect bounded by the update batch's partition spread,
   never the table);
2. read ONLY those partitions of the target (the ``isin`` filter is a
   plan-time PartitionFilter — untouched directories are never even
   listed);
3. anti-join out the keys being replaced, union the updates;
4. dynamic-partition-overwrite exactly the affected partitions —
   untouched partition FILES are left byte-identical on disk
   (asserted by mtime in tests).

At 100 TB this means an upsert costs O(touched partitions), not
O(table). The merged frame is localCheckpoint'ed before the write
because the job both reads and overwrites the same location (with a
table format you would commit a new snapshot instead; the pruning and
merge plan are identical).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    *,
    max_touched_partitions: int = 10_000,
) -> int:
    """MERGE ``updates`` into the ``partition_col``-partitioned parquet
    table at ``target_path``: rows whose ``key_cols`` match are
    replaced, new keys are inserted, and only partitions present in
    the updates are read or rewritten. Returns the number of touched
    partitions.

    ``max_touched_partitions`` bounds the driver-side partition list
    (an update batch spraying the whole table should be a rewrite, not
    an upsert — fail fast instead of silently degrading).
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    parts_rows = (
        updates.select(partition_col)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    )
    if len(parts_rows) > max_touched_partitions:
        raise ValueError(
            f"updates touch more than max_touched_partitions="
            f"{max_touched_partitions} partitions; use a full rewrite"
        )
    parts = [r[0] for r in parts_rows]
    existing = spark.read.parquet(target_path).where(
        F.col(partition_col).isin(parts)
    )
    merged = (
        existing.join(
            updates.select(*keys).dropDuplicates(keys), keys, "left_anti"
        )
        .unionByName(updates.select(*existing.columns))
        # break the read-from lineage: the write overwrites the very
        # files this plan reads
        .localCheckpoint(eager=True)
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    return len(parts)
