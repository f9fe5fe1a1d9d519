"""Table reconciliation: key-level diff of two snapshots.

The lake-maintenance counterpart of ``sources/merge.py``'s upsert: given
two versions of a table, report what changed — the primitive behind
ingest validation ("did the backfill do what we think"), replication
checks, and CDC audits. One full-outer hash join on the key, column
comparisons as NULL-safe expressions, one aggregate; at 100 TB this is
two scans and one shuffle, with column pruning limited to key +
compared columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff: one row per key present in either side, with
    ``status`` in {'added', 'removed', 'changed', 'unchanged'}
    ('added' = only in ``right``, the newer snapshot). Comparison is
    NULL-safe per column (NULL == NULL); ``compare_cols`` defaults to
    every shared non-key column.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c in set(right.columns) and c not in keys
        ]
    cmp_cols = list(compare_cols)
    l = left.select(*keys, *[F.col(c).alias(f"__l_{c}") for c in cmp_cols]).withColumn(
        "__in_l", F.lit(True)
    )
    r = right.select(*keys, *[F.col(c).alias(f"__r_{c}") for c in cmp_cols]).withColumn(
        "__in_r", F.lit(True)
    )
    j = l.join(r, keys, "full_outer")
    differs = F.lit(False)
    for c in cmp_cols:
        differs = differs | ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
    status = (
        F.when(F.col("__in_l").isNull(), "added")
        .when(F.col("__in_r").isNull(), "removed")
        .when(differs, "changed")
        .otherwise("unchanged")
    )
    return j.select(*keys, status.alias("status"))


def table_diff_summary(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Aggregate of :func:`table_diff`: (status, n) — the four counts
    every reconciliation report starts with. The row-level frame never
    materializes anywhere; Catalyst fuses the join and the count."""
    return (
        table_diff(left, right, key_cols, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )
