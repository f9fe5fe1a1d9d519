"""Declarative data-quality expectations over a DataFrame.

The curation counterpart of Great-Expectations-style table checks
(public pattern), compiled to ONE single-pass hash aggregate so a
100 TB validation sweep costs exactly one scan with map-side partial
aggregation — never one job per rule.

Rules (each produces one result row: rule, metric value, pass/fail):

- ``not_null(col, max_null_ratio=0.0)`` — NULL ratio bound
- ``unique(col)`` — no duplicate values among non-null rows
- ``in_range(col, lo, hi)`` — every non-null value inside [lo, hi]
- ``accepted_values(col, values)`` — non-null values drawn from a set
- ``matches(col, regex)`` — non-null values match an RE2 pattern
- ``min_rows(n)`` — table has at least n rows

``expectations(df, rules)`` returns (rule string, metric double,
ok boolean) rows. Exact integer counts under the hood, so results are
deterministic and cross-engine hashable (ratios are int/int IEEE
divisions).

``count_distinct`` inside the single aggregate is exact (Spark plans
distinct aggregates via expand without extra passes over the source).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str, max_null_ratio: float = 0.0) -> dict:
    return {"kind": "not_null", "col": col, "max_null_ratio": max_null_ratio}


def unique(col: str) -> dict:
    return {"kind": "unique", "col": col}


def in_range(col: str, lo, hi) -> dict:
    return {"kind": "in_range", "col": col, "lo": lo, "hi": hi}


def accepted_values(col: str, values: Sequence) -> dict:
    return {"kind": "accepted_values", "col": col, "values": list(values)}


def matches(col: str, regex: str) -> dict:
    return {"kind": "matches", "col": col, "regex": regex}


def min_rows(n: int) -> dict:
    return {"kind": "min_rows", "n": n}


def _rule_name(r: dict) -> str:
    kind = r["kind"]
    if kind == "min_rows":
        return f"min_rows({r['n']})"
    if kind == "in_range":
        return f"in_range({r['col']},{r['lo']},{r['hi']})"
    if kind == "accepted_values":
        return f"accepted_values({r['col']})"
    if kind == "matches":
        return f"matches({r['col']})"
    if kind == "not_null" and r["max_null_ratio"]:
        return f"not_null({r['col']},{r['max_null_ratio']})"
    return f"{kind}({r['col']})"


def expectations(df: DataFrame, rules: Sequence[dict]) -> DataFrame:
    """Evaluate every rule in ONE aggregate pass; returns
    (rule string, metric double, ok boolean), one row per rule in the
    given order. ``metric`` is the rule's violation measure (null
    ratio, duplicate count, out-of-range count, ... ; row count for
    min_rows)."""
    if not rules:
        raise ValueError("expectations needs at least one rule")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        kind = r["kind"]
        if kind == "not_null":
            aggs.append(
                F.count(F.when(F.col(r["col"]).isNull(), 1)).alias(f"__m{i}")
            )
        elif kind == "unique":
            aggs.append(F.count(F.col(r["col"])).alias(f"__c{i}"))
            aggs.append(F.count_distinct(F.col(r["col"])).alias(f"__d{i}"))
        elif kind == "in_range":
            c = F.col(r["col"])
            aggs.append(
                F.count(
                    F.when(c.isNotNull() & ((c < r["lo"]) | (c > r["hi"])), 1)
                ).alias(f"__m{i}")
            )
        elif kind == "accepted_values":
            c = F.col(r["col"])
            aggs.append(
                F.count(
                    F.when(c.isNotNull() & ~c.isin(r["values"]), 1)
                ).alias(f"__m{i}")
            )
        elif kind == "matches":
            c = F.col(r["col"])
            aggs.append(
                F.count(
                    F.when(c.isNotNull() & ~c.rlike(r["regex"]), 1)
                ).alias(f"__m{i}")
            )
        elif kind == "min_rows":
            pass  # rides on __n
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
    one = df.agg(*aggs)

    results: list[Column] = []
    for i, r in enumerate(rules):
        kind = r["kind"]
        name = F.lit(_rule_name(r))
        if kind == "not_null":
            metric = F.when(F.col("__n") > 0, F.col(f"__m{i}") / F.col("__n")).otherwise(
                F.lit(0.0)
            )
            ok = metric <= F.lit(float(r["max_null_ratio"]))
        elif kind == "unique":
            metric = (F.col(f"__c{i}") - F.col(f"__d{i}")).cast("double")
            ok = metric == 0.0
        elif kind in ("in_range", "accepted_values", "matches"):
            metric = F.col(f"__m{i}").cast("double")
            ok = metric == 0.0
        elif kind == "min_rows":
            metric = F.col("__n").cast("double")
            ok = F.col("__n") >= F.lit(int(r["n"]))
        results.append(F.struct(name.alias("rule"), metric.alias("metric"), ok.alias("ok")))
    return one.select(
        F.explode(F.array(*results)).alias("__r")
    ).select("__r.rule", F.round("__r.metric", 9).alias("metric"), "__r.ok")


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key,
    parent_key,
    *,
    relation: str = "child->parent",
) -> DataFrame:
    """Foreign-key audit for one relation: how many child rows
    reference a missing parent — the cross-table half of the
    data-quality suite (the per-table expectations catch NULLs and
    ranges; orphans only show up against the other table).

    Returns one row: (relation, n_child, n_null_keys, n_orphans,
    n_distinct_orphan_keys). NULL child keys are counted separately
    (SQL semantics: a NULL FK is "no reference", not an orphan).

    Scale shape: the orphan check is a LEFT ANTI join on the key —
    Catalyst picks broadcast/shuffle-hash by size; counts are
    map-side combined aggregates. The parent side deduplicates to
    key-cardinality before the join.
    """
    ck = F.col(child_key)
    c = child.select(ck.alias("__k"))
    p = parent.select(F.col(parent_key).alias("__k")).distinct()
    orphans = c.where(F.col("__k").isNotNull()).join(p, "__k", "left_anti")
    base = c.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.col("__k").isNull().cast("long")).alias("n_null_keys"),
    )
    o = orphans.agg(
        F.count(F.lit(1)).alias("n_orphans"),
        F.countDistinct("__k").alias("n_distinct_orphan_keys"),
    )
    return (
        base.crossJoin(F.broadcast(o))
        .select(
            F.lit(relation).alias("relation"),
            "n_child",
            F.col("n_null_keys").cast("long").alias("n_null_keys"),
            "n_orphans",
            "n_distinct_orphan_keys",
        )
    )
