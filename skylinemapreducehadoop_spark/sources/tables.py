"""Parquet table loaders for the engine's star schema.

The driver-generated test tables (TESTDATA.md) are plain parquet — the
engine reads them with ``spark.read.parquet`` so Catalyst gets predicate
pushdown and column pruning for free (the reference instead re-parsed
fixed-width text lines per record, ``/root/reference/Point.java:18-32``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nano_columns(path: str) -> set[str] | None:
    """Column names stored as TIMESTAMP(NANOS) in the parquet footer.

    Reads the Arrow schema of the file (or, for a directory dataset, its
    first fragment) — exact metadata, so no column-name convention is
    required. Returns ``None`` when the footer can't be inspected, in
    which case the caller falls back to the ``ts``/``*_ts`` heuristic.
    """
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return {
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        }
    except Exception:
        return None


def _normalize_nanos(df: DataFrame, nano_cols: set[str] | None = None) -> DataFrame:
    """Cast long-nanosecond columns (read via nanosAsLong) to timestamps.

    With ``spark.sql.legacy.parquet.nanosAsLong=true`` a parquet
    TIMESTAMP(NANOS) column arrives as a raw long; truncating to
    microseconds matches what microsecond-native readers (DuckDB — the
    correctness oracle — and Spark's own TimestampType) produce.
    ``nano_cols`` comes from the parquet footer when available; the
    fallback heuristic treats long columns named ``ts``/``*_ts`` as
    nano epochs.
    """
    for field in df.schema.fields:
        if field.dataType == T.LongType() and (
            field.name in nano_cols
            if nano_cols is not None
            else (field.name == "ts" or field.name.endswith("_ts"))
        ):
            # integer `div`, not `/`: float division loses ulps on
            # 19-digit nano epochs and rounds instead of truncating
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            # PySpark 4.1 infers parquet timestamp[us] (no tz) as
            # TIMESTAMP_NTZ by default; downstream unix_micros/window
            # logic expects TimestampType. The session timezone is
            # pinned UTC (session.py), so this cast is value-stable and
            # matches the DuckDB oracle's microsecond semantics.
            df = df.withColumn(
                field.name, F.col(field.name).cast(T.TimestampType())
            )
    return df


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """Allow TIMESTAMP(NANOS) parquet columns on ANY session.

    The engine can't assume the caller built its session through
    ``session.get_spark`` (the correctness driver, notebooks, and
    spark-submit jobs all hand us vanilla sessions), so the loader sets
    the runtime-settable legacy flag itself. Idempotent and cheap.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed in a future Spark → nanos read natively
    # PySpark 4.1 reads parquet timestamp[us]-without-timezone as
    # TIMESTAMP_NTZ by default; read it as TimestampType instead so the
    # whole engine sees ONE timestamp type regardless of how the driver
    # environment encoded the column. (_normalize_nanos still casts any
    # NTZ column that slips through, e.g. on sessions that read before
    # this conf was set.)
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass  # older Spark without the conf


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_nanos_readable(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    return _normalize_nanos(df, _nano_columns(path))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every standard table and register each as a temp view."""
    _ensure_nanos_readable(spark)
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = _normalize_nanos(spark.read.parquet(path), _nano_columns(path))
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
