"""Bucketed tables: result correctness + plan-level proof that the
co-located join runs without a single shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.sources.bucketing import (
    bucketed_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{loc}'")
    yield "bktest"
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_bucketed_join_no_exchange(spark, sf_dir, bucket_db):
    from skylinemapreducehadoop_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, f"{bucket_db}.orders_b", ["o_orderkey"], 8)
    write_bucketed(li, f"{bucket_db}.lineitem_b", ["o_orderkey"], 8)

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, f"{bucket_db}.orders_b", f"{bucket_db}.lineitem_b", ["o_orderkey"]
        )
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # correctness vs the plain (shuffling) join
        expect = orders.join(li, "o_orderkey").count()
        assert n == expect and n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_bucketed_agg_no_exchange(spark, sf_dir, bucket_db):
    # aggregation on the bucket key also skips its exchange
    agg = (
        read_bucketed(spark, f"{bucket_db}.lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    agg.count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_roundtrip_values(spark, sf_dir, bucket_db):
    from skylinemapreducehadoop_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    got = sorted(
        r["o_orderkey"]
        for r in read_bucketed(spark, f"{bucket_db}.orders_b").select("o_orderkey").collect()
    )
    expect = sorted(r["o_orderkey"] for r in orders.select("o_orderkey").collect())
    assert got == expect
