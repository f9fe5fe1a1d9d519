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
