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


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """Cast long-nanosecond columns (read via nanosAsLong) to timestamps.

    With ``spark.sql.legacy.parquet.nanosAsLong=true`` a parquet
    TIMESTAMP(NANOS) column arrives as a raw long; truncating to
    microseconds matches what microsecond-native readers (DuckDB — the
    correctness oracle — and Spark's own TimestampType) produce.
    Heuristic: long columns named ``ts`` or ``*_ts`` are nano epochs.
    """
    for field in df.schema.fields:
        if field.dataType == T.LongType() and (
            field.name == "ts" or field.name.endswith("_ts")
        ):
            # integer `div`, not `/`: float division loses ulps on
            # 19-digit nano epochs and rounds instead of truncating
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_nanos(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every standard table and register each as a temp view."""
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = _normalize_nanos(spark.read.parquet(path))
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
