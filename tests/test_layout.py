"""Layout writers: prove the row-group skipping is real by comparing
the scan's numOutputRows (rows surviving parquet row-group pruning +
pushed filters) between clustered and shuffled layouts of identical
data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.sources.layout import (
    scan_output_rows,
    write_sorted,
    write_zordered,
    zorder_value,
)

N = 40_000
BLOCK = 16_384  # tiny row groups so a 40k-row fixture has many


@pytest.fixture(scope="module")
def base(spark):
    # (x, y) uniform grid walk — value ranges are dense in [0, 1000)
    return spark.range(N).select(
        "id",
        ((F.col("id") * 7919) % 1000).cast("double").alias("x"),
        ((F.col("id") * 104729) % 1000).cast("double").alias("y"),
    )


def _write_shuffled(df, path):
    # adversarial baseline: every row group spans the full value range
    df.orderBy(F.md5(F.col("id").cast("string"))).coalesce(4).write.mode(
        "overwrite"
    ).option("parquet.block.size", str(BLOCK)).parquet(path)


def test_sorted_layout_skips_rowgroups(spark, base, tmp_path):
    sorted_p = str(tmp_path / "sorted")
    shuf_p = str(tmp_path / "shuffled")
    write_sorted(base, sorted_p, ["x"], n_files=4, parquet_block_bytes=BLOCK)
    _write_shuffled(base, shuf_p)

    pred = (F.col("x") >= 100.0) & (F.col("x") < 110.0)
    a = spark.read.parquet(sorted_p).where(pred)
    b = spark.read.parquet(shuf_p).where(pred)
    # same answer...
    assert a.count() == b.count() > 0
    # ...but the clustered layout reads a small fraction of the rows
    rows_sorted = scan_output_rows(a)
    rows_shuffled = scan_output_rows(b)
    assert rows_shuffled >= N * 0.9  # nothing skips on random layout
    assert rows_sorted < N * 0.2, (rows_sorted, rows_shuffled)


def test_zorder_layout_skips_on_both_dims(spark, base, tmp_path):
    z_p = str(tmp_path / "zorder")
    shuf_p = str(tmp_path / "shuffled2")
    write_zordered(base, z_p, "x", "y", n_files=8, parquet_block_bytes=BLOCK)
    _write_shuffled(base, shuf_p)

    # 2-D box: 10% of each axis -> ~1% of the data
    pred = (
        (F.col("x") >= 200.0)
        & (F.col("x") < 300.0)
        & (F.col("y") >= 200.0)
        & (F.col("y") < 300.0)
    )
    a = spark.read.parquet(z_p).where(pred)
    b = spark.read.parquet(shuf_p).where(pred)
    assert a.count() == b.count() > 0
    rows_z = scan_output_rows(a)
    rows_shuffled = scan_output_rows(b)
    assert rows_shuffled >= N * 0.9
    # Z-clustering must beat the random layout by a wide margin even
    # though NEITHER column is globally sorted
    assert rows_z < N * 0.5, (rows_z, rows_shuffled)

    # single-dim probes also benefit (Z preserves locality per axis)
    x_only = spark.read.parquet(z_p).where((F.col("x") >= 200.0) & (F.col("x") < 250.0))
    assert scan_output_rows(x_only) < N * 0.8


def test_zorder_value_is_morton_interleave(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0)], "x double, y double"
    )
    ranges = {"x_min": 0.0, "x_max": 3.0, "y_min": 0.0, "y_max": 3.0}
    vals = [
        r["z"]
        for r in df.select(zorder_value(F.col("x"), F.col("y"), ranges).alias("z"))
        .collect()
    ]
    # corners of the square: z(0,0)=0; z(max,max)=all bits set
    assert vals[0] == 0
    assert vals[3] == (1 << 32) - 1
    # x contributes even bits, y odd bits
    assert vals[1] == 0x55555555
    assert vals[2] == 0xAAAAAAAA


def test_layout_roundtrip_preserves_rows(spark, base, tmp_path):
    p = str(tmp_path / "rt")
    write_zordered(base, p, "x", "y", n_files=4)
    back = spark.read.parquet(p)
    assert back.count() == N
    assert sorted(back.columns) == sorted(base.columns)
    assert back.agg(F.sum("id")).first()[0] == base.agg(F.sum("id")).first()[0]


def test_compact_reduces_file_count_preserving_data(spark, base, tmp_path):
    import glob

    from skylinemapreducehadoop_spark.sources.layout import compact

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # 64 tiny files — the streaming-sink pathology
    base.repartition(64).write.mode("overwrite").parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 64

    n = compact(spark, src, dst, target_bytes=1 << 20)
    assert n == len(glob.glob(dst + "/*.parquet"))
    assert n < 64
    back = spark.read.parquet(dst)
    assert back.count() == N
    assert back.agg(F.sum("id")).first()[0] == base.agg(F.sum("id")).first()[0]


def test_compact_preserve_sort_keeps_skipping(spark, base, tmp_path):
    import glob

    from skylinemapreducehadoop_spark.sources.layout import compact, scan_output_rows, write_sorted

    src = str(tmp_path / "sorted_frag")
    dst = str(tmp_path / "sorted_compact")
    write_sorted(base, src, ["x"], n_files=64, parquet_block_bytes=BLOCK)
    # the 40k-row fixture is ~250 KB on disk; 64 KB targets ~4 files
    compact(spark, src, dst, target_bytes=64 << 10, preserve_sort=["x"])
    assert len(glob.glob(dst + "/*.parquet")) < 64
    pred = (F.col("x") >= 100.0) & (F.col("x") < 110.0)
    # skipping survives the rewrite: the compacted files are range-
    # partitioned, so a selective scan prunes whole files. With only a
    # couple of output files the skip granularity is 1/n_files — assert
    # at that granularity, not a fixed fraction.
    import glob as _g

    n_out = len(_g.glob(dst + "/*.parquet"))
    rows = scan_output_rows(spark.read.parquet(dst).where(pred))
    assert n_out >= 2 and rows <= N // n_out + N // 10, (rows, n_out)
