"""Dataset profiling: per-dimension min / max / counts in ONE pass.

Re-expresses the reference's Job 0 ("Range": ``/root/reference/Range.java``,
``Map.java``, ``Reduce.java``) — which shuffled one (key, value) pair per
dimension per row to compute per-dimension min/max and missing-value
counts — as a single Spark hash aggregate. Partial aggregation
(map-side combine, ``/root/reference/Range.java:62``) is automatic in
Spark's partial+final hash aggregate, and there is exactly one exchange
of one row.

Output is one row per dimension (long format) so it matches the
reference's per-dimension output records and is trivially
oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, dims: Sequence[str]) -> DataFrame:
    """One row per dim: (dim, min_val, max_val, n_total, n_present).

    ``n_present`` counts non-NULL values (the reference counted
    non-missing-sentinel values per dimension, ``Map.java:12-26`` —
    sentinel→NULL happens at ingest in this engine, so NULL-skipping
    ``count`` is the same statistic).
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_total")]
    for i, c in enumerate(dims):
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__min_{i}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{i}"),
            F.count(F.col(c)).alias(f"__cnt_{i}"),
        ]
    wide = df.agg(*aggs)

    # unpivot to long: one row per dimension (labels passed as literal
    # Columns, not interpolated into SQL text, so any dim name is safe)
    rows = [
        F.struct(
            F.lit(c).alias("dim"),
            F.col(f"__min_{i}").alias("min_val"),
            F.col(f"__max_{i}").alias("max_val"),
            F.col(f"__cnt_{i}").alias("n_present"),
        )
        for i, c in enumerate(dims)
    ]
    return (
        wide.select("n_total", F.explode(F.array(*rows)).alias("r"))
        .select("r.dim", "r.min_val", "r.max_val", "n_total", "r.n_present")
    )
