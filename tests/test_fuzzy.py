from __future__ import annotations

from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.operators.fuzzy import fuzzy_join_ed1


def test_fuzzy_ed1_matches_bruteforce(spark):
    vals = [
        "kitten", "mitten", "kittens", "kitte",  # sub / insert / delete of kitten
        "sitting", "apple", "appl", "apples",
        "", "a", "b",                             # empty + single chars (ed 1 via sub/del)
        "kitten",                                 # duplicate collapses
    ]
    df = spark.createDataFrame([(v,) for v in vals], "name string")
    got = {(r["a"], r["b"]): r["dist"] for r in fuzzy_join_ed1(df, "name").collect()}
    distinct = sorted(set(vals))
    # brute force in python
    def ed1(x, y):
        if x == y:
            return False
        if abs(len(x) - len(y)) > 1:
            return False
        # levenshtein <= 1 check
        if len(x) == len(y):
            return sum(a != b for a, b in zip(x, y)) == 1
        s, t = (x, y) if len(x) < len(y) else (y, x)
        for i in range(len(t)):
            if t[:i] + t[i + 1:] == s:
                return True
        return False

    want = {
        (a, b): 1
        for i, a in enumerate(distinct)
        for b in distinct[i + 1:]
        if ed1(a, b)
    }
    assert got == want
    assert ("a", "b") in got and ("", "a") in got
    assert ("kitten", "mitten") in got and ("kitten", "kittens") in got


def test_fuzzy_ed1_plan_no_cartesian(spark):
    df = spark.createDataFrame([("x",), ("y",)], "name string")
    plan = fuzzy_join_ed1(df, "name")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sorted_neighborhood_finds_adjacent_typos(spark):
    import pytest
    from skylinemapreducehadoop_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "blue bolt"),
        (2, "blue bolts"),     # ed 1, adjacent after sort
        (3, "blue光 bolt"),    # unicode variant, ed 1 from "blue bolt"
        (4, "red widget"),
        (5, "zed widget"),     # ed 1 but far in sort order from 4? (r vs z)
        (6, "completely different thing"),
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    out = sorted_neighborhood_pairs(
        df, "p_name", "p_partkey", window=3, max_edit_distance=2
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs or (2, 1) in pairs
    for r in out:
        assert r["edit_distance"] <= 2
        assert 1 <= r["rank_gap"] <= 3
    # windowed blocking recall is bounded by sort locality: with
    # window=len(df) every <=2 pair is found, including (4, 5)
    allp = sorted_neighborhood_pairs(
        df, "p_name", "p_partkey", window=6, max_edit_distance=2
    ).collect()
    assert any({r["id_a"], r["id_b"]} == {4, 5} for r in allp)


def test_sorted_neighborhood_validation(spark):
    import pytest
    from skylinemapreducehadoop_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(1, "x")], "p_partkey long, p_name string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "p_name", "p_partkey", window=0)
