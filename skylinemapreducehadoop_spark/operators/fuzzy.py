"""Fuzzy string matching at scale: edit-distance joins without a
cartesian product.

``fuzzy_join_ed1`` finds all DISTINCT value pairs within Levenshtein
distance 1 via deletion neighborhoods (the FastSS / SymSpell family —
public technique): if ed(a, b) <= 1 then the key sets
D1(s) = {s} ∪ {one-character deletions of s} intersect —
equality shares s itself, an insertion/deletion makes one string a
member of the other's deletions, and a substitution shares the
deletion at the substituted position. Candidates therefore come from
a hash EQUI-join on exploded neighborhood keys; an exact
``levenshtein`` verify removes the rare false candidates (two
different strings can meet in a shared deletion while being distance
2). No cartesian, no per-row Python.

The pairwise machinery runs on DISTINCT values (one narrow distinct
first), so a 100 TB column with a bounded vocabulary costs its
vocabulary, not its row count — the same collapse-first rule as
``dedup.setsim_join``. Neighborhood size is |s| + 1 keys per value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one-character deletion variants, guarded for the empty string
#: (sequence(1, 0) would DESCEND); pure SQL higher-order function
_DELETIONS = (
    "CASE WHEN length(v) = 0 THEN array() "
    "ELSE transform(sequence(1, length(v)), "
    "i -> concat(substring(v, 1, i-1), substring(v, i+1, length(v)))) END"
)


def fuzzy_join_ed1(df: DataFrame, col: str) -> DataFrame:
    """All distinct value pairs (a < b) of ``col`` with Levenshtein
    distance exactly 1 or 0... strictly: <= 1 — equal values collapse
    in the distinct, so the emitted pairs all have distance 1.
    Output: (a, b, dist)."""
    vals = (
        df.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .distinct()
    )
    from skylinemapreducehadoop_spark.operators._cache import persist_tracked

    vals = persist_tracked(vals)
    keys = vals.select(
        "v",
        F.explode(
            F.array_union(F.array(F.col("v")), F.expr(_DELETIONS))
        ).alias("key"),
    )
    l, r = keys.alias("l"), keys.hint("shuffle_hash").alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.key") == F.col("r.key")) & (F.col("l.v") < F.col("r.v")),
        )
        .select(F.col("l.v").alias("a"), F.col("r.v").alias("b"))
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("a", "b"))
        .where(F.col("dist") <= 1)
        .select("a", "b", "dist")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    *,
    window: int = 3,
    max_edit_distance: int = 2,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernandez &
    Stolfo, SIGMOD'95): sort records by a blocking key, compare each
    record only against its ``window`` successors, keep pairs within
    ``max_edit_distance`` Levenshtein — the classic alternative to
    :func:`fuzzy_join_ed1`'s deletion-neighborhood blocking (which is
    exact for ed<=1 but cannot scale to larger radii; the
    neighborhood window trades guaranteed recall for an O(n·w) pair
    budget at ANY radius).

    Distributes without a single-partition sort: ranks come from the
    :func:`global_row_number <..operators.stats.global_row_number>`
    prefix sum, and the "next w ranks" join is an EQUI-join — each
    row emits its rank under keys rank, rank+1, ... rank+w (offset
    explode), so Catalyst hash-joins rank-to-rank with fan-out w, no
    band/theta join anywhere.

    Returns (id_a, id_b, key_a, key_b, rank_gap, edit_distance) with
    id_a < id_b ordering within the sorted order (a before b).
    """
    from ..operators.stats import global_row_number

    if window < 1:
        raise ValueError("window must be >= 1")
    if max_edit_distance < 0:
        raise ValueError("max_edit_distance must be >= 0")
    base = df.where(F.col(key_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(key_col).alias("__k")
    )
    ranked = global_row_number(
        base, [F.asc("__k"), F.asc("__id")], out_col="__r"
    )
    probes = ranked.select(
        F.col("__id").alias("id_a"),
        F.col("__k").alias("key_a"),
        F.col("__r").alias("__ra"),
        F.explode(
            F.sequence(F.col("__r") + 1, F.col("__r") + window)
        ).alias("__rb"),
    )
    targets = ranked.select(
        F.col("__id").alias("id_b"),
        F.col("__k").alias("key_b"),
        F.col("__r").alias("__rb"),
    )
    pairs = probes.join(targets.hint("shuffle_hash"), "__rb")
    ed = F.levenshtein("key_a", "key_b")
    return pairs.select(
        "id_a",
        "id_b",
        "key_a",
        "key_b",
        (F.col("__rb") - F.col("__ra")).cast("int").alias("rank_gap"),
        ed.alias("edit_distance"),
    ).where(ed <= max_edit_distance)
