"""Write paths (S6/S7): parquet/CSV sinks and the multi-way skyline sink.

The reference wrote text part-files plus named side outputs
(``MultipleOutputs``, ``/root/reference/Skyline.java:412,419-420``,
``LSkyReducer.java:41-49``) that the user then concatenated by hand
(``Readme.md:39-40``). Spark-first: each logical output is one
``df.write`` action off a cached upstream — no file plumbing, and each
sink keeps Catalyst's column pruning (only the columns that sink needs
are materialized into it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` gives directory partition pruning
    to downstream readers; ``max_records_per_file`` bounds file size at
    scale (with AQE coalescing, prevents the tiny-files problem)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, *, mode: str = "error", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_skyline_outputs(
    df: DataFrame,
    dims: Sequence[tuple[str, str]],
    out_dir: str,
    *,
    mode: str = "error",
) -> dict[str, str]:
    """S7 analogue: one pass computes the skyline, then three sinks —
    ``skyline/`` (the Pareto rows), ``vpn/`` (component-wise extremes of
    the skyline — the reference's virtual point,
    ``LSkyReducer.java:26-31``), ``filter/`` (per-dim best rows — the
    reference's sky-filter points, ``LSkyReducer.java:32-49``).

    The skyline result is cached so the three writes share one
    computation, mirroring the reference's single-reduce multi-output
    without re-running the kernel.
    """
    from skylinemapreducehadoop_spark.operators.skyline import normalize_dims, skyline

    dim_signs = normalize_dims(dims)
    sky = skyline(df, dims).cache()
    try:
        paths = {
            "skyline": f"{out_dir}/skyline",
            "vpn": f"{out_dir}/vpn",
            "filter": f"{out_dir}/filter",
        }
        write_parquet(sky, paths["skyline"], mode=mode)

        # VPn: worst surviving coordinate per dimension (max of the
        # min-normalized value = max for 'min' dims, min for 'max' dims)
        vpn = sky.agg(
            *[
                (F.max(c) if s > 0 else F.min(c)).alias(c)
                for c, s in dim_signs
            ]
        )
        write_parquet(vpn, paths["vpn"], mode=mode)

        # filter points: for each dim, the single best skyline row
        best = None
        for c, s in dim_signs:
            row = sky.orderBy(F.col(c).asc() if s > 0 else F.col(c).desc()).limit(1)
            best = row if best is None else best.unionByName(row)
        write_parquet(best.dropDuplicates(), paths["filter"], mode=mode)
        return paths
    finally:
        sky.unpersist()


def write_jsonl(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """JSON-lines sink — the interchange format document corpora ship
    in. Spark's json writer IS jsonl (one object per line, splittable
    for re-reads when uncompressed)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """JSON-lines source. ALWAYS pass an explicit schema in production:
    without one Spark runs a full inference scan (an extra job over all
    100 TB) and silently widens conflicting types. Permissive mode keeps
    corrupt lines as NULL rows instead of failing the job; add
    ``columnNameOfCorruptRecord`` upstream if quarantining is needed."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.option("mode", "PERMISSIVE").json(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink — Spark's second native columnar format (built-in
    reader/writer, predicate pushdown and column pruning like parquet).
    Interchange surface for Hive/Trino-centric lakes."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    return spark.read.orc(path)
