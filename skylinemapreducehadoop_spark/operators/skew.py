"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a single hot key (one viral document, one null-ish default
user id) can put an entire groupBy/join partition on one executor. AQE's
skew-join splitting (``spark.sql.adaptive.skewJoin``) handles *sort-merge
join* skew at runtime, but it cannot split a skewed *aggregation* key,
and it never helps when the skew is on the build side of a hash join.
These operators implement the classic salting remedies declaratively, so
Catalyst still plans ordinary hash shuffles:

- ``salted_agg``: two-stage aggregation. Stage 1 groups on
  (keys, salt) — the hot key fans out over ``n_salts`` reducers — then
  stage 2 re-aggregates the (tiny) per-salt partials on the keys alone.
  Only algebraic aggregates (partial+final decomposable) are accepted.
- ``salted_join``: equi-join where the *left* (large, skewed) side gets
  a random salt in [0, n_salts) and the *right* side is replicated once
  per salt value (explode of a literal range). The join key becomes
  (keys..., salt), so the hot key's rows spread over ``n_salts``
  partitions. Right-side amplification is n_salts×, so this is for
  moderate-size right tables that are too big to broadcast but far
  smaller than the left.

The reference engine never needed this (its quadtree partitioner *is* a
data-space anti-skew device for the skyline — cells are split until they
hold <= maxp sample points, /root/reference/QTNode.java:54-100); these
operators bring the same "no partition owns a hot spot" property to the
relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate name -> (stage-1 partial fn, stage-2 final fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column name -> (input column, agg name) with
    agg in {sum, count, min, max}. Result equals
    ``df.groupBy(keys).agg(...)`` exactly (these aggregates are
    associative-commutative), but no reducer ever sees more than
    ~1/n_salts of a hot key's rows in stage 1.
    """
    bad = [a for _, (_, a) in aggs.items() if a not in _ALGEBRAIC]
    if bad:
        raise ValueError(
            f"non-algebraic aggregate(s) {bad}; salted_agg supports {sorted(_ALGEBRAIC)}"
        )

    salt = (F.rand(seed) * n_salts).cast("int")
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(
            *[
                _ALGEBRAIC[a][0](F.col(c)).alias(out)
                for out, (c, a) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[_ALGEBRAIC[a][1](F.col(out)).alias(out) for out, (_, a) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-proof equi-join: salt the large left side, replicate the
    right side ``n_salts``×, join on (on..., salt), drop the salt.

    Supports 'inner' and 'left' joins (each left row carries exactly one
    salt value, so per-row match semantics are unchanged; right-side
    duplicates never meet the same left row twice because the right copy
    only matches its own salt).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salted_left = left.withColumn(_SALT, (F.rand(seed) * n_salts).cast("int"))
    replicated_right = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(replicated_right, [*on, _SALT], how).drop(_SALT)


def skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """One-row key-distribution diagnostic — the report you run BEFORE
    choosing a partitioning/salting strategy for a join or aggregate
    on ``key_col``: how many keys, how concentrated (max and top-k
    share of rows), how long the singleton tail, and the coefficient
    of variation of per-key counts (cv=0 is perfectly uniform; a big
    cv with a big max_share is the salting trigger). NULL keys count
    as a key of their own (they hash to one partition too — that is
    exactly the skew a report must not hide).

    Columns: n_rows, n_keys, max_count, max_share, topk_count,
    topk_share, singleton_keys, avg_count, count_cv. All counts are
    exact; each ratio is one double division (layout/engine-exact),
    rounded to 9.

    Scale shape: per-key counts are one map-side-combined aggregate;
    the count-of-counts moments reduce that frame to one row; top-k
    is a TakeOrdered (never a global sort or single-partition
    window). The two 1-row frames meet in a broadcast scalar join.
    """
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count("*").alias("__c")
    )
    moments = counts.agg(
        F.sum("__c").alias("__rows"),
        F.count("*").alias("__keys"),
        F.max("__c").alias("__mx"),
        F.sum((F.col("__c") * F.col("__c")).cast("decimal(38,0)")).alias(
            "__c2"
        ),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).alias("__single"),
    )
    top = (
        counts.orderBy(F.col("__c").desc(), F.col("__k"))
        .limit(top_k)
        .agg(F.sum("__c").alias("__topc"))
    )
    rows_d = F.col("__rows").cast("double")
    keys_d = F.col("__keys").cast("double")
    mean_c = rows_d / keys_d
    var_c = F.col("__c2").cast("double") / keys_d - (rows_d / keys_d) ** 2
    cv = F.sqrt(F.greatest(var_c, F.lit(0.0))) / (rows_d / keys_d)
    return moments.crossJoin(F.broadcast(top)).select(
        F.col("__rows").alias("n_rows"),
        F.col("__keys").alias("n_keys"),
        F.col("__mx").alias("max_count"),
        F.round(F.col("__mx").cast("double") / rows_d, 9).alias("max_share"),
        F.col("__topc").alias("topk_count"),
        F.round(F.col("__topc").cast("double") / rows_d, 9).alias(
            "topk_share"
        ),
        F.col("__single").alias("singleton_keys"),
        F.round(mean_c, 9).alias("avg_count"),
        F.round(cv, 9).alias("count_cv"),
    )
