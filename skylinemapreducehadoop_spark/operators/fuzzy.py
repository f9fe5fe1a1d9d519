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
        .cache()
    )
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
