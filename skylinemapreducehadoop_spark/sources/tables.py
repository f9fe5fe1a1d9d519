"""Parquet table loaders for the engine's star schema.

The driver-generated test tables (TESTDATA.md) are plain parquet — the
engine reads them with ``spark.read.parquet`` so Catalyst gets predicate
pushdown and column pruning for free (the reference instead re-parsed
fixed-width text lines per record, ``/root/reference/Point.java:18-32``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every standard table and register each as a temp view."""
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
