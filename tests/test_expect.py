"""Single-pass data-quality expectations (functions/expect.py)."""

from __future__ import annotations

import pytest

from skylinemapreducehadoop_spark.functions.expect import (
    accepted_values,
    expectations,
    in_range,
    matches,
    min_rows,
    not_null,
    unique,
)


def _table(spark):
    rows = [
        (1, "a", 10.0, "ok-1"),
        (2, "b", 20.0, "ok-2"),
        (2, "a", -5.0, "bad"),  # dup id, out-of-range, regex miss
        (4, None, 30.0, "ok-3"),  # null cat
        (5, "z", 999.0, None),  # unaccepted cat, out-of-range
    ]
    return spark.createDataFrame(rows, "id long, cat string, price double, tag string")


def test_expectations_metrics_and_verdicts(spark):
    df = _table(spark)
    out = {
        r["rule"]: (r["metric"], r["ok"])
        for r in expectations(
            df,
            [
                min_rows(3),
                unique("id"),
                not_null("cat", max_null_ratio=0.1),
                in_range("price", 0.0, 100.0),
                accepted_values("cat", ["a", "b"]),
                matches("tag", "^ok-"),
            ],
        ).collect()
    }
    assert out["min_rows(3)"] == (5.0, True)
    assert out["unique(id)"] == (1.0, False)  # one duplicate value
    assert out["not_null(cat,0.1)"] == (0.2, False)  # 1/5 null > 10%
    assert out["in_range(price,0.0,100.0)"] == (2.0, False)
    assert out["accepted_values(cat)"] == (1.0, False)  # 'z'
    assert out["matches(tag)"] == (1.0, False)  # 'bad'


def test_expectations_single_pass_plan(spark):
    # every rule rides ONE aggregate: exactly one scan of the source
    df = _table(spark)
    plan = (
        expectations(df, [unique("id"), not_null("cat"), min_rows(1)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
    assert n_scans == 1, plan


def test_expectations_clean_table_passes(spark):
    df = _table(spark).where("id = 1")
    out = expectations(
        df,
        [min_rows(1), unique("id"), not_null("cat"), in_range("price", 0, 100)],
    ).collect()
    assert all(r["ok"] for r in out)


def test_expectations_guards(spark):
    df = _table(spark)
    with pytest.raises(ValueError):
        expectations(df, [])
    with pytest.raises(ValueError):
        expectations(df, [{"kind": "nope"}])


def test_referential_integrity_counts(spark):
    from skylinemapreducehadoop_spark.functions.expect import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (98,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert row["n_child"] == 7
    assert row["n_null_keys"] == 1
    assert row["n_orphans"] == 3          # 99, 99, 98
    assert row["n_distinct_orphan_keys"] == 2
    assert row["relation"] == "child->parent"


def test_referential_integrity_clean_relation(spark):
    from skylinemapreducehadoop_spark.functions.expect import (
        referential_integrity,
    )

    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    row = referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert row["n_orphans"] == 0 and row["n_null_keys"] == 0
