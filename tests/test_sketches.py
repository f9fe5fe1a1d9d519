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


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    """The GK quantile sketch at accuracy 10000 guarantees rank error
    <= n/10000; assert the approximate p50/p90 land inside a generous
    +/-2% RANK band of the exact distribution (value tolerance is
    meaningless for arbitrary distributions, rank tolerance is the
    sketch's actual contract)."""
    from skylinemapreducehadoop_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    bands = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.48).alias("p50_lo"),
            F.percentile("value", 0.52).alias("p50_hi"),
            F.percentile("value", 0.88).alias("p90_lo"),
            F.percentile("value", 0.92).alias("p90_hi"),
        )
        .collect()
    }
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("ap50"),
            F.percentile_approx("value", F.lit(0.9), F.lit(10000)).alias("ap90"),
        )
        .collect()
    }
    assert set(bands) == set(approx)
    for k, b in bands.items():
        a = approx[k]
        assert b["p50_lo"] <= a["ap50"] <= b["p50_hi"], (k, a["ap50"])
        assert b["p90_lo"] <= a["ap90"] <= b["p90_hi"], (k, a["ap90"])
