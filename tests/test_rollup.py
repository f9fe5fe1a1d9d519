"""Incremental rollup maintenance law: splice(prev, recompute(touched))
must equal a full recompute of the upserted table — including
cross-bucket moves, inserts, NULL buckets, and empty batches."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.operators.rollup import (
    incremental_rollup_update,
    rollup_table,
)

SCHEMA = "k long, day string, v long"


def _upsert_local(base_rows, batch_rows):
    keys = {r[0] for r in batch_rows}
    return [r for r in base_rows if r[0] not in keys] + list(batch_rows)


def _check(spark, base_rows, batch_rows):
    base = spark.createDataFrame(base_rows, SCHEMA)
    batch = spark.createDataFrame(batch_rows, SCHEMA) if batch_rows else (
        spark.createDataFrame([], SCHEMA)
    )
    prev = rollup_table(base, "day", ["v"])
    got = incremental_rollup_update(
        prev, base, batch, key_cols=["k"], bucket_col="day", sum_cols=["v"]
    )
    want = rollup_table(
        spark.createDataFrame(_upsert_local(base_rows, batch_rows) or [], SCHEMA),
        "day",
        ["v"],
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w, (g, w)


def test_incremental_rollup_random_batches(spark):
    rng = random.Random(5)
    days = [f"2024-01-{d:02d}" for d in range(1, 8)]
    base = [(k, rng.choice(days), rng.randint(0, 100)) for k in range(200)]
    # update some keys (possibly moving day), insert some new keys
    batch = [
        (rng.randrange(250), rng.choice(days), rng.randint(0, 100))
        for _ in range(40)
    ]
    # dedupe batch keys (upsert batches are keyed)
    batch = list({b[0]: b for b in batch}.values())
    _check(spark, base, batch)


def test_incremental_rollup_cross_bucket_move_and_empty_day(spark):
    base = [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30)]
    # key 1 moves d1 -> d3; d2 untouched; key 4 inserts into new day d4
    batch = [(1, "d3", 11), (4, "d4", 40)]
    _check(spark, base, batch)


def test_incremental_rollup_null_buckets(spark):
    base = [(1, None, 10), (2, "d1", 20)]
    batch = [(1, "d1", 15)]  # NULL-bucket row moves into d1
    _check(spark, base, batch)
    batch2 = [(2, None, 25)]  # row moves INTO the NULL bucket
    _check(spark, base, batch2)


def test_incremental_rollup_empty_batch_is_identity(spark):
    base = [(1, "d1", 10), (2, "d2", 20)]
    _check(spark, base, [])


def test_incremental_rollup_untouched_buckets_not_recomputed(spark):
    # the kept side must come from prev_rollup verbatim: poison prev on
    # an untouched day and confirm the poison survives (proof the
    # incremental path did NOT re-aggregate that bucket)
    base = spark.createDataFrame([(1, "d1", 10), (2, "d2", 20)], SCHEMA)
    batch = spark.createDataFrame([(1, "d1", 11)], SCHEMA)
    poisoned = rollup_table(base, "day", ["v"]).withColumn(
        "sum_v", F.when(F.col("day") == "d2", F.lit(999)).otherwise(F.col("sum_v"))
    )
    out = {
        r["day"]: r["sum_v"]
        for r in incremental_rollup_update(
            poisoned, base, batch, key_cols=["k"], bucket_col="day", sum_cols=["v"]
        ).collect()
    }
    assert out["d2"] == 999  # untouched bucket passed through
    assert out["d1"] == 11  # touched bucket recomputed


def test_incremental_rollup_touched_guard(monkeypatch, spark):
    import skylinemapreducehadoop_spark.operators.rollup as R

    monkeypatch.setattr(R, "MAX_TOUCHED_BUCKETS", 1)
    base = spark.createDataFrame([(1, "d1", 1), (2, "d2", 2)], SCHEMA)
    batch = spark.createDataFrame([(1, "d1", 3), (2, "d2", 4)], SCHEMA)
    prev = rollup_table(base, "day", ["v"])
    with pytest.raises(ValueError, match="touches more than"):
        R.incremental_rollup_update(
            prev, base, batch, key_cols=["k"], bucket_col="day", sum_cols=["v"]
        )
