"""Bucketed tables: pre-shuffled storage for repeat co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Bucketing pays that shuffle ONCE at write time: rows are
hash-partitioned into ``n_buckets`` files per side on the join key, so
every later join/aggregation on that key is planned as a zero-exchange
sort-merge join (bucket i joins bucket i locally). This is Spark's
native analogue of the reference's "partition once, compute locally"
quadtree design — but for relational keys instead of data-space cells.

Rules encoded here:
- both sides must agree on bucket columns AND bucket count, or Spark
  silently falls back to shuffling the mismatched side;
- ``sortBy`` at write time lets the sort-merge join skip its sort step;
- bucketed tables must go through the catalog (``saveAsTable``) — a
  plain ``.parquet(path)`` write drops the bucket metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as a catalog table bucketed on ``bucket_cols``."""
    w = df.write.format(file_format).mode(mode).bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so joins on the bucket key skip their exchange)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the physical plan contains no ShuffleExchange on either
    side (verified in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
