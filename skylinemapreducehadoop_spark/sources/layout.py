"""Data-layout writers: sort-clustered and Z-ordered parquet.

At 100 TB the cheapest scan is the one that never reads the bytes:
parquet footers carry per-row-group min/max statistics, and Spark's
reader drops whole row groups whose stats can't match a pushed filter.
That only pays off when the layout CLUSTERS the filter columns — a
randomly ordered table has every row group spanning the full value
range, so nothing skips.

- ``write_sorted``: range-partition on the cluster keys + sort within
  partitions → every file/row-group covers a narrow, non-overlapping
  key range. Best for one dominant filter column (time, id).
- ``write_zordered``: interleave the bits of two rank-normalized
  dimensions into a Z-value (Morton order — the public technique
  behind Delta/Iceberg OPTIMIZE ZORDER) and sort by it: row groups
  become axis-aligned rectangles in (x, y) space, so 2-D box filters
  skip most of the table even though neither column alone is sorted.
  The rank normalization uses the per-column min/max from one 1-row
  aggregate (no global sort, no sampling pass); the bit interleave is
  a pure JVM column expression.

Both writers are metadata-only reorganizations: same rows, same
schema. ``tests/test_layout.py`` proves the skipping is real by
comparing the scan's ``numOutputRows`` metric (rows surviving
row-group pruning + pushed filters) between clustered and shuffled
layouts of the same data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z_BITS = 16


def write_sorted(
    df: DataFrame,
    path: str,
    by: Sequence[str],
    *,
    n_files: int | None = None,
    parquet_block_bytes: int | None = None,
) -> None:
    """Write ``df`` range-partitioned and sorted on ``by``.

    ``n_files`` controls output granularity (defaults to the session's
    shuffle parallelism); ``parquet_block_bytes`` shrinks row groups
    for finer skipping (leave None for the parquet default at real
    volume — 128 MB row groups are the right grain at 100 TB).
    """
    cols = [F.col(c) for c in by]
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    ).sortWithinPartitions(*cols)
    w = out.write.mode("overwrite")
    if parquet_block_bytes:
        w = w.option("parquet.block.size", str(parquet_block_bytes))
    w.parquet(path)


def zorder_value(x: Column, y: Column, ranges: dict[str, float]) -> Column:
    """Morton Z-value of two columns, each rank-normalized to
    ``_Z_BITS`` bits with the provided ``{x_min, x_max, y_min, y_max}``
    bounds — a pure JVM expression (no UDF, no sort).

    NULLs map to rank 0 (they cluster together at the low corner).
    """
    def _rank(c: Column, lo: float, hi: float) -> Column:
        span = (hi - lo) or 1.0
        r = F.floor(
            (c.cast("double") - F.lit(lo)) / F.lit(span) * F.lit((1 << _Z_BITS) - 1)
        )
        return F.coalesce(
            F.least(F.greatest(r, F.lit(0)), F.lit((1 << _Z_BITS) - 1)),
            F.lit(0),
        ).cast("long")

    rx = _rank(x, ranges["x_min"], ranges["x_max"])
    ry = _rank(y, ranges["y_min"], ranges["y_max"])
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(rx, i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(F.shiftright(ry, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    *,
    n_files: int | None = None,
    parquet_block_bytes: int | None = None,
) -> None:
    """Write ``df`` clustered by the Z-order of (x_col, y_col).

    Bounds come from one 1-row min/max aggregate over the input (a
    map-side-combined scan, not a sort); the Z-value is computed as a
    column expression, used only for placement, and not persisted.
    """
    b = df.agg(
        F.min(F.col(x_col).cast("double")).alias("x_min"),
        F.max(F.col(x_col).cast("double")).alias("x_max"),
        F.min(F.col(y_col).cast("double")).alias("y_min"),
        F.max(F.col(y_col).cast("double")).alias("y_max"),
    ).first()
    ranges = {k: float(b[k]) for k in ("x_min", "x_max", "y_min", "y_max")}
    z = zorder_value(F.col(x_col), F.col(y_col), ranges).alias("__z")
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(n_files, "__z")
        if n_files
        else out.repartitionByRange("__z")
    ).sortWithinPartitions("__z").drop("__z")
    w = out.write.mode("overwrite")
    if parquet_block_bytes:
        w = w.option("parquet.block.size", str(parquet_block_bytes))
    w.parquet(path)


def scan_output_rows(df: DataFrame) -> int:
    """Execute ``df`` and return the total ``numOutputRows`` of its
    file-scan leaves — the rows that SURVIVED row-group pruning and
    pushed filters, i.e. the bytes the layout failed to skip. Test/
    diagnostic helper."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    # AQE wraps the plan; the final physical tree is what executed
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        node = leaves.apply(i)
        m = node.metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return total


def compact(
    spark,
    src_path: str,
    dst_path: str,
    *,
    target_bytes: int = 128 << 20,
    preserve_sort: Sequence[str] | None = None,
) -> int:
    """Small-file compaction: rewrite ``src_path`` into files of
    roughly ``target_bytes`` each and return the file count written.

    Streaming sinks and fine-grained ingestion leave thousands of tiny
    files per partition; at scale the scan's task-launch overhead and
    the namenode listing dominate. Sizing uses the INPUT's on-disk
    bytes (a metadata probe — no data pass): n_files =
    ceil(input_bytes / target_bytes). With ``preserve_sort`` the
    rewrite range-partitions + re-sorts on those columns so row-group
    skipping (see :func:`write_sorted`) survives the compaction;
    otherwise it is a pure coalesce-style rewrite.
    """
    df = spark.read.parquet(src_path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, -(-int(total) // target_bytes))
    if preserve_sort:
        cols = [F.col(c) for c in preserve_sort]
        out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    dst = jvm.org.apache.hadoop.fs.Path(dst_path)
    written = [
        s
        for s in fs.listStatus(dst)
        if s.getPath().getName().endswith(".parquet")
    ]
    return len(written)
