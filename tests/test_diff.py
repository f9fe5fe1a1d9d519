"""Snapshot reconciliation (operators/diff.py)."""

from __future__ import annotations

from skylinemapreducehadoop_spark.operators.diff import table_diff, table_diff_summary


def test_table_diff_statuses(spark):
    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, None, 30.0), (4, "w", 40.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 21.0), (3, None, 30.0), (5, "new", 50.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["status"] for r in table_diff(a, b, ["k"]).collect()}
    # NULL-safe: row 3's NULL == NULL -> unchanged
    assert out == {1: "unchanged", 2: "changed", 3: "unchanged", 4: "removed", 5: "added"}

    summary = {r["status"]: r["n"] for r in table_diff_summary(a, b, ["k"]).collect()}
    assert summary == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}


def test_table_diff_compare_subset_and_guard(spark):
    import pytest

    a = spark.createDataFrame([(1, "x", 1.0)], "k long, s string, v double")
    b = spark.createDataFrame([(1, "x", 2.0)], "k long, s string, v double")
    # restricting the compared columns flips changed -> unchanged
    assert table_diff(a, b, ["k"], ["s"]).collect()[0]["status"] == "unchanged"
    assert table_diff(a, b, ["k"], ["v"]).collect()[0]["status"] == "changed"
    with pytest.raises(ValueError):
        table_diff(a, b, [])
