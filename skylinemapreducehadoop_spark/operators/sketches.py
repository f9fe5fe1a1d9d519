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


# ---------------------------------------------------------------------------
# count-min sketch columns (Cormode & Muthukrishnan, J. Algorithms 2005)


def _md5_bucket(col, salt: int, width: int):
    """Deterministic bucket in [0, width) from md5('{salt}|{value}') —
    the same cross-engine hash contract as sampling.hash_bucket
    (DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT % width``), so a
    sketch built here is reproducible byte-for-byte by the oracle."""
    s = F.concat_ws("|", F.lit(str(salt)), col.cast("string"))
    h = F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(width))


def _dense_cells(sparse: DataFrame, group_cols: "list[str]", n_cells: int, out_col: str) -> DataFrame:
    """Assemble per-group (pos, c) sparse cells into one dense long
    array column. The collect_list state is bounded by n_cells per
    group (depth*width / bins), never by data volume.

    Construction is O(n_cells) per group: entries sort by pos, each
    emits its zero-gap run + its own count (array element_at is O(1)),
    and the tail pads to n_cells — NOT the natural map_from_entries +
    per-index element_at, whose MapType lookups are linear scans and
    make assembly O(n_cells * entries)."""
    zero = F.lit(0).cast("long")
    agg = sparse.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("__e")
    )
    e = F.col("__e")
    runs = F.transform(
        e,
        lambda x, i: F.concat(
            F.array_repeat(
                zero,
                x["pos"]
                - F.when(i == 0, F.lit(-1)).otherwise(
                    F.element_at(e, i)["pos"]
                )
                - 1,
            ),
            F.array(x["c"].cast("long")),
        ),
    )
    tail = F.array_repeat(
        zero, F.lit(n_cells - 1) - F.element_at(e, -1)["pos"]
    )
    return agg.select(
        *group_cols, F.concat(F.flatten(runs), tail).alias(out_col)
    )


def cm_sketch(
    df: DataFrame,
    group_cols: "list[str]",
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Per-group count-min frequency sketch as a dense ``depth*width``
    long array column ``cm`` (row r occupies positions [r*width,
    (r+1)*width)). Like :func:`kmv_sketch`, the sketch is a PLAIN
    COLUMN: persist it per day, fold with :func:`cm_merge`
    (elementwise +, CM is linear), probe with :func:`cm_query` —
    frequency point-queries over a year of 100 TB facts without ever
    rescanning them. Estimates never undercount; overcount per row is
    < 2n/width w.p. 1 - (1/2)^depth.

    Execution keeps every stage bounded: (1) one (group, key) combine
    — the only shuffle that sees keys, with map-side partial counts;
    (2) keys explode into depth (row, bucket) cells and combine down
    to <= depth*width cells per group; (3) dense assembly per group
    (collect_list bounded by depth*width). Buckets are md5-derived
    (see :func:`_md5_bucket`) so an external system — or the DuckDB
    oracle — can reproduce the sketch exactly.
    """
    if width < 2 or depth < 1:
        raise ValueError("need width >= 2 and depth >= 1")
    keyed = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(*group_cols, F.col(key_col).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    cells = (
        keyed.select(
            *group_cols,
            F.explode(
                F.array(
                    *[
                        (F.lit(r * width) + _md5_bucket(F.col("__k"), r, width)).cast(
                            "int"
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("pos"),
            F.col("__cnt"),
        )
        .groupBy(*group_cols, "pos")
        .agg(F.sum("__cnt").alias("c"))
    )
    return _dense_cells(cells, group_cols, depth * width, "cm")


def cm_merge(
    df: DataFrame,
    group_cols: "list[str]",
    *,
    sketch_col: str = "cm",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Fold CM sketches upward (day -> month -> total): elementwise
    sum. Sketches explode to (pos, c) cells and combine — partial
    aggregation applies, and no executor ever holds more than one
    group's cell set (<= depth*width rows), unlike a collect_list-
    of-arrays fold whose state grows with the number of days."""
    cells = (
        # posexplode_OUTER: a plain posexplode makes Catalyst insert an
        # implicit `size(col) > 0 AND isnotnull(col)` Filter under the
        # Generate, and when the sketch column is itself a non-trivial
        # expression (the _dense_cells HOF build of an upstream level)
        # that expression is evaluated three times per group — twice in
        # the filter, once in the projection. outer + the cheap scalar
        # null filter below is behavior-identical (NULL sketches drop,
        # empty sketches cannot occur) and evaluates it once.
        df.select(
            *group_cols, F.posexplode_outer(F.col(sketch_col)).alias("pos0", "v")
        )
        .where(F.col("pos0").isNotNull())
        .groupBy(*group_cols, F.col("pos0").alias("pos"))
        .agg(F.sum("v").alias("c"))
    )
    return _dense_cells(cells, group_cols, depth * width, sketch_col)


def cm_query(sketch_col, key_col, *, width: int = 1024, depth: int = 4):
    """Frequency point-estimate column: min over the depth rows of the
    key's cell. Pure JVM expression — probing N keys against a joined
    sketch column is one codegen'd projection."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.least(
        *[
            F.element_at(
                c, (F.lit(r * width) + _md5_bucket(k, r, width) + 1).cast("int")
            )
            for r in range(depth)
        ]
    )


# ---------------------------------------------------------------------------
# mergeable fixed-bin histogram columns (quantile rollup without raw rescans)


def hist_sketch(
    df: DataFrame,
    group_cols: "list[str]",
    value_col: str,
    *,
    lo: int,
    bin_width: int,
    bins: int,
) -> DataFrame:
    """Per-group equi-width histogram of an integer-valued column as a
    dense long array ``hist`` (bucket = clamp((v - lo) div bin_width,
    0, bins-1); integer division, so the bucketing is bit-exact on any
    engine). Mergeable by elementwise + (:func:`hist_merge`);
    :func:`hist_quantile_edge` answers quantile queries from the
    merged column at bin granularity. The day->month->total fold is
    the maintained-rollup pattern: quantiles over a year of facts from
    365 array rows, never a raw rescan."""
    if bins < 1 or bin_width < 1:
        raise ValueError("need bins >= 1 and bin_width >= 1")
    v = F.col(value_col).cast("long")
    bucket = F.least(
        F.greatest(
            F.expr(f"({value_col} - {lo}) div {bin_width}").cast("int"), F.lit(0)
        ),
        F.lit(bins - 1),
    )
    cells = (
        df.where(v.isNotNull())
        .groupBy(*group_cols, bucket.alias("pos"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _dense_cells(cells, group_cols, bins, "hist")


def hist_merge(
    df: DataFrame,
    group_cols: "list[str]",
    *,
    sketch_col: str = "hist",
    bins: int = 128,
) -> DataFrame:
    """Elementwise-sum fold of histogram columns (same cell-explode
    shape as :func:`cm_merge`)."""
    cells = (
        # posexplode_outer + scalar null filter: see cm_merge — avoids
        # triple evaluation of an upstream dense-build expression via
        # the implicit non-outer Generate filter; behavior-identical
        df.select(*group_cols, F.posexplode_outer(F.col(sketch_col)).alias("pos0", "v"))
        .where(F.col("pos0").isNotNull())
        .groupBy(*group_cols, F.col("pos0").alias("pos"))
        .agg(F.sum("v").alias("c"))
    )
    return _dense_cells(cells, group_cols, bins, sketch_col)


def hist_quantile_edge(
    sketch_col, q_num: int, q_den: int, *, lo: int, bin_width: int
):
    """Lower edge of the bucket holding the q-quantile (q = q_num/q_den,
    rank = ceil(q * n) in integer arithmetic — no floating point
    anywhere, so engine-reproducible): the first bucket whose running
    count reaches the rank. One array fold, pure JVM."""
    h = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    total = F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a + x)
    # ceil(q*n) = (n*q_num + q_den-1) div q_den; the double quotient is
    # correctly rounded and q_den >= 2 keeps true quotients > 1/q_den
    # away from integer boundaries, so the truncating cast IS floor
    target = ((total * q_num + (q_den - 1)) / q_den).cast("long")
    # target rides in the fold's SEED, which is evaluated ONCE per row:
    # referencing it inside the lambda would re-run the full `total`
    # fold PER ARRAY ELEMENT (higher-order lambdas re-evaluate every
    # embedded subexpression each call — measured ~4s of a 5.3s query
    # on 80 x 600-bin rows; two linear folds per quantile after)
    found = F.aggregate(
        h,
        F.struct(
            F.lit(0).cast("long").alias("run"),
            F.lit(-1).alias("idx"),
            F.lit(0).alias("pos"),
            target.alias("tgt"),
        ),
        lambda s, x: F.struct(
            (s["run"] + x).alias("run"),
            F.when(s["idx"] >= 0, s["idx"])
            .when(s["run"] + x >= s["tgt"], s["pos"])
            .otherwise(F.lit(-1))
            .alias("idx"),
            (s["pos"] + 1).alias("pos"),
            s["tgt"].alias("tgt"),
        ),
    )["idx"]
    return (F.lit(lo) + found.cast("long") * F.lit(bin_width)).alias("edge")
