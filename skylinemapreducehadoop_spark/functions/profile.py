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


def histogram(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    nbins: int = 10,
) -> DataFrame:
    """Equi-width histogram: (bucket, cnt, min_v, max_v) per occupied
    bucket. bucket = clamp(floor((x - lo) / width), 0, nbins - 1) —
    out-of-range values land in the edge buckets, NULLs are dropped.

    One map-side-combined hash aggregate over ``nbins`` groups — the
    profiling shape that replaces a driver-side ``rdd.histogram`` at
    any scale. Pick lo/hi/nbins so ``width`` is exactly representable
    (e.g. 0..60000 in 12 bins) and bucket assignment is bit-identical
    across engines (pure IEEE arithmetic on the same doubles).
    """
    if not (hi > lo and nbins > 0):
        raise ValueError("need hi > lo and nbins > 0")
    x = F.col(col).cast("double")
    width = (hi - lo) / nbins
    b = F.floor((x - F.lit(float(lo))) / F.lit(width))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1)).cast("int")
    return (
        df.where(x.isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.min(x).alias("min_v"),
            F.max(x).alias("max_v"),
        )
    )


def equidepth_histogram(
    df: DataFrame,
    col: str,
    *,
    nbins: int = 10,
) -> DataFrame:
    """Equi-depth (quantile) histogram: (bucket, cnt, min_v, max_v) for
    ``nbins`` buckets holding ~equal row counts. NULLs are dropped.

    The naive plan — ``ntile(n)`` over a global ORDER BY — is a
    single-partition sort of the whole table; this one never sorts:
    bucket BOUNDARIES come from one exact interpolated-percentile
    aggregate (map-side combinable), broadcast as a 1-row frame, and
    assignment is ``sum(x > boundary_i)`` — a narrow expression feeding
    one hash aggregate. Boundary values use the same linear
    interpolation as DuckDB's quantile_cont (bit-identical doubles, cf.
    percentile_value_by_type), so the result is oracle-checkable.

    Rows equal to a boundary go to the LOWER bucket; duplicate-heavy
    distributions may leave some buckets empty (counts then concentrate
    in the bucket owning the repeated value) — the standard equi-depth
    tie semantics.
    """
    if nbins < 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    x = F.col(col).cast("double")
    d = df.where(x.isNotNull()).select(x.alias("__x"))
    bounds = d.agg(
        *[
            F.percentile("__x", i / nbins).alias(f"__b{i}")
            for i in range(1, nbins)
        ]
    )
    bucket = None
    for i in range(1, nbins):
        term = F.when(F.col("__x") > F.col(f"__b{i}"), 1).otherwise(0)
        bucket = term if bucket is None else bucket + term
    if bucket is None:
        bucket = F.lit(0)
    return (
        d.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.min("__x").alias("min_v"),
            F.max("__x").alias("max_v"),
        )
    )


def analyze_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    ndv: str = "exact",
    rsd: float = 0.01,
) -> DataFrame:
    """ANALYZE-style full-table column statistics in ONE aggregate
    pass: per column (any type) — ``n_total``, ``n_nulls``, ``ndv``
    (exact distinct count), ``min_str`` / ``max_str`` (the min/max
    rendered as strings so every type fits one output schema). The
    catalog-statistics primitive behind join-order and broadcast
    decisions, exposed as a queryable frame.

    Exact ``count_distinct`` over several columns plans as one
    expand+aggregate (rows replicate |cols| times pre-combine) — the
    standard exact-NDV cost. ``ndv='approx'`` is the 100-TB path: HLL
    sketches (``approx_count_distinct`` at the given ``rsd``) plan as
    ONE ordinary aggregate with NO Expand — rows are never replicated
    — at ±rsd accuracy (the exact variant is what an oracle can
    verify bit-for-bit; the sketch variant is verified against it by
    the ``analyze_approx_check`` driver entry). Min/max on strings
    use binary ordering — identical in any engine with C collation.
    """
    if ndv not in ("exact", "approx"):
        raise ValueError("ndv must be 'exact' or 'approx'")
    names = list(cols) if cols is not None else list(df.columns)
    if not names:
        raise ValueError("cols must be non-empty")
    plain = [F.count(F.lit(1)).alias("n_total")]
    ndvs = []
    for i, c in enumerate(names):
        col = F.col(c)
        ndv_agg = (
            F.count_distinct(col)
            if ndv == "exact"
            else F.approx_count_distinct(col, rsd)
        )
        plain += [
            F.sum(col.isNull().cast("long")).alias(f"__nn_{i}"),
            F.min(col).cast("string").alias(f"__mn_{i}"),
            F.max(col).cast("string").alias(f"__mx_{i}"),
        ]
        ndvs.append(ndv_agg.alias(f"__ndv_{i}"))
    if ndv == "exact":
        # SEPARATE aggregates, crossJoined at one row each: mixing the
        # exact NDVs with the plain aggs in one pass makes the
        # multi-distinct Expand replicate every row (|cols|+1)x AND
        # re-evaluate the 3|cols| plain aggregates over the expanded
        # stream (measured 3.2x slower on a 6-column table). The split
        # costs one extra scan; the Expand stays |cols|x but carries
        # only the distinct targets.
        #
        # STABLE-INPUT ASSUMPTION (ADVICE r16): the two passes scan df
        # independently, so a non-deterministic frame (sampling,
        # rand()-derived columns, a non-snapshot source) could yield
        # mutually inconsistent n_total/min/max vs ndv in one profile
        # row. Every caller in this engine profiles deterministic
        # snapshot tables; persist/localCheckpoint df first if that
        # ever stops holding.
        wide = df.agg(*plain).crossJoin(F.broadcast(df.agg(*ndvs)))
    else:
        # approx NDVs are ordinary aggregates (no Expand): one pass
        wide = df.agg(*(plain + ndvs))
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__nn_{i}").alias("n_nulls"),
            F.col(f"__ndv_{i}").alias("ndv"),
            F.col(f"__mn_{i}").alias("min_str"),
            F.col(f"__mx_{i}").alias("max_str"),
        )
        for i, c in enumerate(names)
    ]
    return wide.select("n_total", F.explode(F.array(*rows)).alias("r")).select(
        "r.col_name", "n_total", "r.n_nulls", "r.ndv", "r.min_str", "r.max_str"
    )
