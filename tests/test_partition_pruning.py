"""Directory-partitioned writes: prove the reader prunes partitions at
plan time (the scan's PartitionFilters carry the predicate, so at 100 TB
a filter on the partition key reads only its directories)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from skylinemapreducehadoop_spark.sources.sinks import write_parquet
    from skylinemapreducehadoop_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(ev, out, partition_by=["event_type"])

    back = spark.read.parquet(out)
    q = back.where(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    # values survive the round-trip
    assert q.count() == ev.where(F.col("event_type") == "click").count()
    # non-partition columns are intact
    s = q.agg(F.sum("value")).first()[0]
    s0 = ev.where(F.col("event_type") == "click").agg(F.sum("value")).first()[0]
    assert abs(s - s0) < 1e-6
