"""Sketch aggregates: approximate answers must land near exact ones."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    from skylinemapreducehadoop_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("a"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)
