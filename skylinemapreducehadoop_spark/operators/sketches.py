"""Distributed frequency sketches.

``heavy_hitters``: Misra-Gries summaries per partition + exact
recount of the candidate superset. The MG guarantee makes the final
output EXACT (not approximate): a per-partition summary with k
counters under-counts any item by at most n_p/(k+1), and summaries
are mergeable with the same total bound (Agarwal et al., "Mergeable
Summaries", PODS'12 — public), so every item with true frequency
>= n/(k+1) survives into the candidate set; the second pass recounts
candidates exactly. The result is therefore deterministic and
oracle-checkable against a plain GROUP BY ... HAVING — while the
shuffle never carries the vocabulary:

- pass 1 shuffles NOTHING (mapInPandas is a narrow map; candidate
  union is <= partitions * k rows);
- pass 2 shuffles only tokens that semi-join the broadcast candidate
  set (bounded by candidates * occurrences, with map-side combine).

A naive groupBy-count over a 100 TB corpus shuffles the full
vocabulary (billions of rare tokens); this shuffles the heavy tail
only. Per-batch work inside MG is vectorized pandas value_counts /
nlargest — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_candidates(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate values (narrow, no shuffle).

    Returns a frame with one ``value`` column: the union of every
    partition's k-counter summary — a superset of all values with
    global frequency > n/(k+1) regardless of how rows are partitioned.

    NULL values are excluded up front (see :func:`heavy_hitters`).
    """
    vals = (
        df.select(F.col(value_col).cast("string").alias("value"))
        .where(F.col("value").isNotNull())
    )
    schema = T.StructType(
        [
            T.StructField("value", T.StringType()),
            T.StructField("est", T.LongType()),
        ]
    )

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = pd.Series(dtype="int64")
        for pdf in batches:
            # vectorized: exact batch counts, then the standard MG
            # merge — add, subtract the (k+1)-th largest, drop <= 0
            run = run.add(pdf["value"].value_counts(), fill_value=0)
            if len(run) > k:
                cut = run.nlargest(k + 1).iloc[-1]
                run = run[run > cut] - cut
        if len(run):
            yield pd.DataFrame(
                {"value": run.index, "est": run.astype("int64").values}
            )

    return vals.mapInPandas(mg, schema).select("value").distinct()


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    threshold_ratio: float = 0.01,
    counters: int | None = None,
) -> DataFrame:
    """All values whose frequency is >= ceil(threshold_ratio * n),
    with their EXACT counts — output (value, cnt).

    ``counters`` defaults to ceil(2 / threshold_ratio), which makes
    the MG error bound n/(k+1) < threshold_ratio*n: no qualifying
    value can be missed. Larger ``counters`` shrinks the candidate
    superset (fewer recount keys) at the cost of executor memory
    (k counters per partition).

    NULL semantics: NULL values are dropped before sketching, and
    ``n`` is the count of NON-NULL rows — i.e. the contract is
    ``GROUP BY value HAVING cnt >= ceil(ratio * n_nonnull)`` over the
    non-null values only. (A NULL group cannot flow through the
    sketch: pandas value_counts silently drops NaN and an equi
    semi-join never matches NULL, so an implicit NULL group would be
    silently missed — excluding it explicitly keeps the contract
    honest.)
    """
    k = counters if counters is not None else int(2.0 / threshold_ratio) + 1
    if k + 1 <= 1.0 / threshold_ratio:
        raise ValueError(
            f"counters={k} cannot guarantee ratio {threshold_ratio}: "
            f"need counters + 1 > 1/ratio"
        )
    vals = (
        df.select(F.col(value_col).cast("string").alias("value"))
        .where(F.col("value").isNotNull())
    )
    cand = mg_candidates(df, value_col, k)

    # single lazy plan: total-row count rides along as a broadcast
    # 1-row frame instead of an eager driver-side count()
    totals = vals.agg(F.count("*").alias("n_total"))
    counts = (
        vals.join(F.broadcast(cand), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .where(F.col("cnt") >= F.ceil(F.lit(threshold_ratio) * F.col("n_total")))
        .select("value", "cnt")
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: "list[str]",
    value_col: str,
    *,
    k: int = 1024,
) -> DataFrame:
    """Per-group KMV (k-minimum-values) distinct sketch: the k smallest
    distinct ``xxhash64(value)`` as a sorted long array column ``kmv``
    (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 — the classic
    mergeable distinct-count summary). Unlike the engine's built-in
    HLL (``approx_count_distinct``), the sketch is a PLAIN COLUMN:
    persist it in a daily rollup table and :func:`kmv_merge` folds
    days into months/years without touching raw data — the mergeable-
    sketch-column pattern a maintained 100 TB rollup needs.

    Execution: one distinct on (group, hash) — 8-byte hashes shuffle,
    never values — then bottom-k in two levels: per shuffle-partition
    slices (state <= that partition's distinct share) merged by one
    per-group fold (state <= k x partials). Below k distinct values
    the sketch IS the distinct hash set and the estimator is exact
    (collision probability ~d^2/2^65); past k it is the classic
    (k-1)/u_k estimator with ~1/sqrt(k) relative error.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.xxhash64(value_col).alias("__h"))
        .distinct()
    )
    part = h.groupBy(*group_cols, F.spark_partition_id().alias("__p")).agg(
        F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("__partial")
    )
    return part.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__partial"))), 1, k
        ).alias("kmv")
    )


def kmv_merge(
    df: DataFrame,
    group_cols: "list[str]",
    *,
    sketch_col: str = "kmv",
    k: int = 1024,
) -> DataFrame:
    """Fold KMV sketches upward (day -> month -> total): union the
    hash sets, keep the k smallest. ``n_merged`` counts the input
    sketches. Pure JVM array algebra — merging a year of daily rollup
    rows never rescans the fact table."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list(sketch_col)))),
            1,
            k,
        ).alias(sketch_col),
    )


def kmv_estimate(sketch_col, *, k: int = 1024):
    """Distinct-count estimate column from a KMV sketch: exact size
    when the sketch holds fewer than k hashes (every distinct hash is
    present), else (k-1)/u_k with u_k the k-th smallest hash mapped to
    (0,1). Returns a double column."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    u_k = (F.element_at(c, k).cast("double") + F.lit(2.0**63)) / F.lit(2.0**64)
    return F.when(F.size(c) < k, F.size(c).cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )
