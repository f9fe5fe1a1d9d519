"""Profiling + table-loader tests."""

from __future__ import annotations

import duckdb
import pytest

from skylinemapreducehadoop_spark.functions.profile import profile
from skylinemapreducehadoop_spark.sources.tables import TABLES, load_table, load_tables


def test_profile_matches_pandas(spark):
    rows = [(1.0, 10.0), (2.0, None), (3.0, 30.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = {r["dim"]: r for r in profile(df, ["x", "y"]).collect()}
    assert out["x"]["min_val"] == 1.0 and out["x"]["max_val"] == 3.0
    assert out["x"]["n_total"] == 3 and out["x"]["n_present"] == 3
    assert out["y"]["n_present"] == 2
    assert out["y"]["min_val"] == 10.0 and out["y"]["max_val"] == 30.0


def test_profile_empty_dims_raises(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        profile(df, [])


def test_load_all_tables(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    assert set(tables) == set(TABLES)
    for name, df in tables.items():
        assert df.count() > 0, name


def test_load_table_on_vanilla_session(spark, sf_dir):
    """Regression: the loader must not rely on session-build-time config.

    The correctness driver constructs its own vanilla SparkSession, so
    ``load_table`` itself has to make TIMESTAMP(NANOS) parquet readable
    (round-2 failure mode: 10 ERR rows from PARQUET_TYPE_ILLEGAL).
    """
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
    assert ev.count() > 0


def test_events_timestamps_match_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
    got = [str(r["ts"]) for r in ev.orderBy("event_id").limit(50).collect()]
    want = [
        str(r[0])
        for r in duckdb.sql(
            f"select ts from '{sf_dir}/events.parquet' order by event_id limit 50"
        ).fetchall()
    ]
    assert got == want


def test_histogram_counts_and_clamping(spark):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.functions.profile import histogram

    rows = [(-5.0,), (0.0,), (4.9,), (5.0,), (12.0,), (99.0,), (None,)]
    df = spark.createDataFrame(rows, "x double")
    out = {r["bucket"]: r for r in histogram(df, "x", lo=0.0, hi=10.0, nbins=2).collect()}
    # -5 clamps into bucket 0; 12 and 99 clamp into bucket 1; NULL dropped
    assert out[0]["cnt"] == 3 and out[0]["min_v"] == -5.0 and out[0]["max_v"] == 4.9
    assert out[1]["cnt"] == 3 and out[1]["max_v"] == 99.0
    assert sum(r["cnt"] for r in out.values()) == 6
    import pytest

    with pytest.raises(ValueError):
        histogram(df, "x", lo=1.0, hi=1.0, nbins=2)


def test_equidepth_histogram_balanced_and_no_global_sort(spark):
    from skylinemapreducehadoop_spark.functions.profile import equidepth_histogram

    df = spark.range(1000).selectExpr("cast(id as double) as x", "id")
    out = {r["bucket"]: r["cnt"] for r in equidepth_histogram(df, "x", nbins=4).collect()}
    # 0..999 uniform: 4 buckets of ~250 (boundary rows go low)
    assert sum(out.values()) == 1000
    assert set(out) == {0, 1, 2, 3}
    assert all(240 <= c <= 260 for c in out.values()), out
    # the plan must not contain a global Sort (the ntile shape)
    plan = equidepth_histogram(df, "x", nbins=4)._jdf.queryExecution().executedPlan().toString()
    assert "Sort " not in plan

    # duplicate-heavy input: all ties land in one bucket, counts exact
    dup = spark.range(100).selectExpr("cast(5.0 as double) as x")
    d = {r["bucket"]: r["cnt"] for r in equidepth_histogram(dup, "x", nbins=4).collect()}
    assert d == {0: 100}


def test_analyze_table_all_types_and_nulls(spark):
    import pytest

    from skylinemapreducehadoop_spark.functions.profile import analyze_table

    df = spark.createDataFrame(
        [
            (1, "a", 1.5),
            (2, "b", None),
            (2, None, 2.5),
            (None, "a", 2.5),
        ],
        "i long, s string, d double",
    )
    got = {r["col_name"]: r for r in analyze_table(df).collect()}
    assert set(got) == {"i", "s", "d"}
    assert all(r["n_total"] == 4 for r in got.values())
    assert got["i"]["n_nulls"] == 1 and got["i"]["ndv"] == 2
    assert got["i"]["min_str"] == "1" and got["i"]["max_str"] == "2"
    assert got["s"]["n_nulls"] == 1 and got["s"]["ndv"] == 2
    assert got["d"]["ndv"] == 2 and got["d"]["max_str"] == "2.5"
    with pytest.raises(ValueError):
        analyze_table(df, cols=[])
    with pytest.raises(ValueError):
        analyze_table(df, ndv="bogus")


def test_analyze_table_approx_no_expand_and_accurate_small(spark):
    """ndv='approx' is the 100-TB path: the plan must carry NO Expand
    (exact multi-column NDV replicates rows |cols| times; the sketch
    variant must not), and on small-cardinality data the HLL estimate
    equals the exact count."""
    from skylinemapreducehadoop_spark.functions.profile import analyze_table

    df = spark.createDataFrame(
        [(i % 7, f"s{i % 13}", i % 3) for i in range(400)], "a long, s string, b long"
    )
    exact_plan = analyze_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # the documented exact-NDV cost
    appr = analyze_table(df, ndv="approx", rsd=0.01)
    appr_plan = appr._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in appr_plan
    got = {r["col_name"]: r for r in appr.collect()}
    assert got["a"]["ndv"] == 7 and got["s"]["ndv"] == 13 and got["b"]["ndv"] == 3
    assert all(r["n_total"] == 400 and r["n_nulls"] == 0 for r in got.values())
