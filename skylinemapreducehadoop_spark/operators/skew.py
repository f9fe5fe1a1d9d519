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
