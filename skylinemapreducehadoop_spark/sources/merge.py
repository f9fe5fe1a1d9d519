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
    check_key_moves: bool = False,
) -> int:
    """MERGE ``updates`` into the ``partition_col``-partitioned parquet
    table at ``target_path``: rows whose ``key_cols`` match (within the
    touched partitions — see the precondition below) are replaced, new
    keys are inserted, and only partitions present in the updates are
    read or rewritten. A first upsert into a not-yet-existing
    ``target_path`` creates the table (a plain partitioned write of the
    updates). Returns the number of touched partitions.

    PRECONDITION (the standard partition-aligned-merge caveat, same as
    a static `replaceWhere` in any lakehouse engine): ``partition_col``
    must be stable — functionally determined by ``key_cols``. If an
    update row carries an existing key with a NEW partition value, only
    the new partition is rewritten; the old row survives in its
    untouched partition and the key is duplicated. Pass
    ``check_key_moves=True`` to detect this and fail fast: it joins the
    updates' keys against the full table's (key -> partition) projection
    — one extra scan of the key/partition columns only (column-pruned),
    so it costs a pass over the table's key columns, not its data.

    ``max_touched_partitions`` bounds the driver-side partition list
    (an update batch spraying the whole table should be a rewrite, not
    an upsert — fail fast instead of silently degrading).
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    try:
        full = spark.read.parquet(target_path)
    except Exception as exc:  # AnalysisException: PATH_NOT_FOUND
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        # first write: no existing rows to merge against
        n_parts = updates.select(partition_col).distinct().count()
        if n_parts > max_touched_partitions:
            raise ValueError(
                f"updates touch more than max_touched_partitions="
                f"{max_touched_partitions} partitions; use a full rewrite"
            )
        updates.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        return n_parts
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
    if check_key_moves:
        moved = (
            full.select(*keys, F.col(partition_col).alias("__old_part"))
            .join(
                updates.select(*keys, F.col(partition_col).alias("__new_part"))
                .dropDuplicates(keys),
                keys,
            )
            .where(F.col("__old_part") != F.col("__new_part"))
            .limit(1)
            .collect()
        )
        if moved:
            r = moved[0]
            raise ValueError(
                f"upsert_partitioned: key {[r[k] for k in keys]} moves from "
                f"partition {r['__old_part']!r} to {r['__new_part']!r}; "
                f"partition_col must be functionally determined by key_cols "
                f"(delete-then-insert across partitions is not expressible as "
                f"a partition-pruned upsert)"
            )
    existing = full.where(F.col(partition_col).isin(parts))
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


def delete_partitioned(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    *,
    max_touched_partitions: int = 10_000,
) -> int:
    """Partition-pruned DELETE from partitioned parquet: remove every
    row whose ``key_cols`` match a row of ``keys``, rewriting ONLY the
    partitions that actually contain matching keys (the right-to-be-
    forgotten / retention-purge primitive). Returns the number of
    partitions rewritten.

    Unlike :func:`upsert_partitioned`, the touched-partition set is
    not knowable from the deletes alone — it comes from a column-
    pruned scan of the table's (key, partition) projection semi-joined
    against the keys (parquet reads just those columns; the data
    columns are never touched in the discovery pass). Partitions with
    no matches keep their files byte-identical; a matching partition is
    rewritten via anti-join and dynamic partition overwrite. A
    partition whose EVERY row is deleted gets its directory removed
    explicitly — dynamic overwrite only replaces partitions present in
    the written data, so an emptied partition would otherwise keep its
    stale files. An empty key set is a no-op returning 0.
    """
    kc = list(key_cols)
    if not kc:
        raise ValueError("key_cols must be non-empty")
    full = spark.read.parquet(target_path)
    touched_rows = (
        full.select(*kc, partition_col)
        .join(keys.select(*kc).dropDuplicates(kc), kc, "left_semi")
        .select(partition_col)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    )
    if len(touched_rows) > max_touched_partitions:
        raise ValueError(
            f"delete touches more than max_touched_partitions="
            f"{max_touched_partitions} partitions; use a full rewrite"
        )
    parts = [r[0] for r in touched_rows]
    if not parts:
        return 0
    remaining = (
        full.where(F.col(partition_col).isin(parts))
        .join(keys.select(*kc).dropDuplicates(kc), kc, "left_anti")
        # the write overwrites the very files this plan reads
        .localCheckpoint(eager=True)
    )
    (
        remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(target_path)
    )
    # fully-emptied partitions are absent from `remaining`, so dynamic
    # overwrite left their old files in place — drop those directories
    surviving = {r[0] for r in remaining.select(partition_col).distinct().collect()}
    emptied = [p for p in parts if p not in surviving]
    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for p in emptied:
            hp = jvm.org.apache.hadoop.fs.Path(
                f"{target_path}/{partition_col}={p}"
            )
            fs = hp.getFileSystem(conf)
            if fs.exists(hp):
                fs.delete(hp, True)
    return len(parts)
