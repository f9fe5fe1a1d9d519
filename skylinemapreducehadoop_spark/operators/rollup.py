"""Incremental materialized-rollup maintenance (hypertable-style).

A 100 TB fact table with a maintained daily rollup cannot re-aggregate
the world on every upsert batch. The correct shape: find the buckets
the batch touches (where updated keys USED to live plus where they now
land — an update can move a row across buckets), re-aggregate ONLY
those buckets from the merged table, and splice the result into the
previous rollup. The touched-bucket list is calendar-bounded (days),
so it is driver-collectable and becomes a partition-pruning predicate
on the bucket-partitioned base scan — the re-aggregation reads a few
partitions, not the table.

The maintenance law — ``incremental_rollup_update(prev, base, batch)
== rollup_table(upsert(base, batch))`` — is property-tested in
tests/test_rollup.py and driver-checked against a full-recompute SQL
oracle (`incremental_rollup_check`).

The reference engine has no maintained-view surface (it is a batch
skyline job); this extends the repo toward the lakehouse-maintenance
north star alongside sources/merge.py's partitioned upsert.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: refuse to drive partition pruning from an unbounded bucket list —
#: past this, the "touched set" is no longer calendar-shaped and the
#: incremental path has no advantage over a full recompute
MAX_TOUCHED_BUCKETS = 100_000


def rollup_table(
    df: DataFrame, bucket_col: str, sum_cols: Sequence[str]
) -> DataFrame:
    """The maintained aggregate: per bucket, row count + exact long
    sums. One map-side-combined hash aggregate."""
    return df.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).cast("long")).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def incremental_rollup_update(
    prev_rollup: DataFrame,
    base: DataFrame,
    batch: DataFrame,
    *,
    key_cols: Sequence[str],
    bucket_col: str,
    sum_cols: Sequence[str],
) -> DataFrame:
    """Maintain ``prev_rollup = rollup_table(base)`` under an upsert
    ``batch`` (last-writer-wins by ``key_cols``; batch rows replace
    base rows with the same key, new keys insert). Returns the rollup
    of the merged table WITHOUT re-aggregating untouched buckets.

    Touched = buckets of the batch rows UNION buckets where the batch
    keys currently live in ``base`` (covers cross-bucket moves: the
    old bucket loses the row, the new one gains it). The touched list
    is collected (guarded by MAX_TOUCHED_BUCKETS) so the base re-scan
    is an ``isin`` filter — on a bucket-partitioned table that is
    partition pruning, i.e. the incremental cost is proportional to
    the data in touched buckets, not to |base|. The batch-key anti-join
    inside the touched slice is the only other join, and the batch
    side of it is broadcast-sized by construction (an upsert batch).
    """
    keys = list(key_cols)
    old_buckets = (
        base.join(F.broadcast(batch.select(*keys).distinct()), keys)
        .select(bucket_col)
        .distinct()
    )
    touched_df = old_buckets.union(batch.select(bucket_col).distinct()).distinct()
    touched = [r[0] for r in touched_df.limit(MAX_TOUCHED_BUCKETS + 1).collect()]
    if len(touched) > MAX_TOUCHED_BUCKETS:
        raise ValueError(
            f"batch touches more than {MAX_TOUCHED_BUCKETS} buckets; "
            "incremental maintenance has no advantage here — run "
            "rollup_table() on the merged table instead"
        )

    # NULL-safe membership: isin() returns NULL for NULL buckets, which
    # where() would silently drop from BOTH sides — a NULL-bucket row
    # must count as touched iff the touched set contains NULL
    nonnull = [t for t in touched if t is not None]
    has_null = len(nonnull) != len(touched)
    isin_t = F.col(bucket_col).isin(nonnull) if nonnull else F.lit(False)
    if has_null:
        isin_t = isin_t | F.col(bucket_col).isNull()
    in_touched = F.coalesce(isin_t, F.lit(False))
    # merged slice: surviving base rows in touched buckets + the batch
    base_slice = base.where(in_touched).join(
        F.broadcast(batch.select(*keys).distinct()), keys, "left_anti"
    )
    cols = [*keys, bucket_col, *sum_cols]
    merged_slice = base_slice.select(*cols).unionByName(batch.select(*cols))
    recomputed = rollup_table(merged_slice, bucket_col, sum_cols)
    kept = prev_rollup.where(~in_touched)
    return kept.unionByName(recomputed)
