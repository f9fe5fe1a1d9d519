"""Salted aggregation / salted join: exact equality with the unsalted
plans on skewed synthetic data (one key holding ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" owns 9000 rows; 100 cold keys own 10 each
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 100)).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    return hot.unionAll(cold).cache()


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_agg_matches_plain(skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count("v").alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {
            "sum_v": ("v", "sum"),
            "n": ("v", "count"),
            "min_v": ("v", "min"),
            "max_v": ("v", "max"),
        },
        n_salts=8,
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(skewed, ["k"], {"a": ("v", "avg")})


def test_salted_join_inner_matches_plain(spark, skewed):
    dim = spark.range(101).select(
        F.when(F.col("id") == 100, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), F.col("id")))
        .alias("k"),
        (F.col("id") * 2).alias("attr"),
    )
    plain = skewed.join(dim, ["k"]).select("k", "v", "attr")
    salted = salted_join(skewed, dim, ["k"], n_salts=8).select("k", "v", "attr")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_left_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", 1)], "k string, attr int")
    plain = skewed.join(dim, ["k"], "left").select("k", "v", "attr")
    salted = salted_join(skewed, dim, ["k"], n_salts=4, how="left").select(
        "k", "v", "attr"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_agg_fans_out_hot_key(skewed):
    # stage-1 group count must exceed the number of distinct keys:
    # the hot key really is split across salts
    from skylinemapreducehadoop_spark.operators.skew import _ALGEBRAIC, _SALT  # noqa: F401

    salt = (F.rand(42) * 8).cast("int")
    stage1 = skewed.withColumn(_SALT, salt).groupBy("k", _SALT).count()
    n_groups = stage1.count()
    n_keys = skewed.select("k").distinct().count()
    assert n_groups > n_keys


def test_skew_report_exact(spark):
    from skylinemapreducehadoop_spark.operators.skew import skew_report

    rows = (
        [(i, "hot") for i in range(90)]
        + [(100 + i, "warm") for i in range(8)]
        + [(200, "c1"), (201, None)]
    )
    df = spark.createDataFrame(rows, "id long, k string")
    r = skew_report(df, "k", top_k=2).collect()[0]
    assert r["n_rows"] == 100 and r["n_keys"] == 4
    assert r["max_count"] == 90 and r["max_share"] == 0.9
    assert r["topk_count"] == 98 and r["topk_share"] == 0.98
    assert r["singleton_keys"] == 2  # c1 and the NULL key
    assert r["avg_count"] == 25.0
    import math

    ex_c2 = (90 * 90 + 64 + 1 + 1) / 4.0
    cv = math.sqrt(ex_c2 - 625.0) / 25.0
    assert abs(r["count_cv"] - cv) < 1e-8


def test_skew_report_uniform_cv_zero(spark):
    from skylinemapreducehadoop_spark.operators.skew import skew_report

    rows = [(i, "k%d" % (i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, k string")
    r = skew_report(df, "k").collect()[0]
    assert r["count_cv"] == 0.0 and r["max_share"] == 0.2
    assert r["topk_count"] == 50  # top_k=10 > n_keys sums everything
