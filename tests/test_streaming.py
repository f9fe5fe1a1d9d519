"""Structured Streaming tests: file source → incremental skyline /
windowed rollup, run with availableNow triggers."""

from __future__ import annotations

import numpy as np
import pandas as pd

from skylinemapreducehadoop_spark.operators._kernel import skyline_mask
from skylinemapreducehadoop_spark.streaming.incremental import (
    SkylineAccumulator,
    enrich_stream,
    hourly_rollup,
    incremental_skyline,
    incremental_skyline_foreachbatch,
    session_rollup,
)


def _write_batches(spark, base_dir):
    """Two parquet files acting as two stream arrivals."""
    rng = np.random.RandomState(0)
    all_rows = []
    for b in range(2):
        rows = [
            (b * 100 + i, "g1" if i % 2 == 0 else "g2", float(x), float(y))
            for i, (x, y) in enumerate(rng.rand(50, 2))
        ]
        all_rows += rows
        spark.createDataFrame(rows, "id long, g string, x double, y double").write.mode(
            "append"
        ).parquet(str(base_dir))
    return all_rows


def test_incremental_skyline_stateful(spark, tmp_path):
    src = tmp_path / "src"
    rows = _write_batches(spark, src)
    stream = spark.readStream.schema("id long, g string, x double, y double").parquet(str(src))
    out = incremental_skyline(stream, [("x", "min"), ("y", "min")], key_col="g")
    q = (
        out.writeStream.format("memory")
        .queryName("inc_sky")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {
        r["key"]: r
        for r in spark.sql(
            "select * from inc_sky where key is not null order by skyline_size"
        ).collect()
    }
    # oracle: batch skyline of all rows per group
    pdf = pd.DataFrame(rows, columns=["id", "g", "x", "y"])
    for g, grp in pdf.groupby("g"):
        vals = grp[["x", "y"]].to_numpy()
        expect = {tuple(np.round(v, 9)) for v in vals[skyline_mask(vals)]}
        got = {tuple(np.round(v, 9)) for v in final[g]["skyline"]}
        assert got == expect, g


def test_enrich_stream_static_broadcast_join(spark, tmp_path):
    src = tmp_path / "src"
    rows = _write_batches(spark, src)
    dim = spark.createDataFrame(
        [("g1", "group one"), ("g2", "group two")], "g string, label string"
    )
    stream = spark.readStream.schema("id long, g string, x double, y double").parquet(str(src))
    out = enrich_stream(stream, dim, on="g")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from enriched").collect()
    assert len(got) == len(rows)
    labels = {r["g"]: r["label"] for r in got}
    assert labels == {"g1": "group one", "g2": "group two"}


def test_incremental_skyline_foreachbatch(spark, tmp_path):
    src = tmp_path / "src"
    rows = _write_batches(spark, src)
    stream = spark.readStream.schema("id long, g string, x double, y double").parquet(str(src))
    dims = [("x", "min"), ("y", "min")]
    acc = SkylineAccumulator(dims)
    q = incremental_skyline_foreachbatch(
        stream, dims, acc, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    pdf = pd.DataFrame(rows, columns=["id", "g", "x", "y"])
    vals = pdf[["x", "y"]].to_numpy()
    expect = sorted(map(tuple, vals[skyline_mask(vals)]))
    got = sorted(map(tuple, acc.current[["x", "y"]].to_numpy()))
    assert got == expect


def test_session_rollup_stream(spark, tmp_path):
    import datetime

    src = tmp_path / "sess"
    base = datetime.datetime(2024, 1, 1)
    # user u1: two bursts separated by 2 hours -> 2 sessions (3+2 events);
    # user u2: one burst -> 1 session (2 events)
    rows = (
        [(base + datetime.timedelta(minutes=5 * i), "u1") for i in range(3)]
        + [(base + datetime.timedelta(hours=2, minutes=5 * i), "u1") for i in range(2)]
        + [(base + datetime.timedelta(minutes=7 * i), "u2") for i in range(2)]
    )
    spark.createDataFrame(rows, "ts timestamp, user_id string").write.parquet(str(src))
    stream = spark.readStream.schema("ts timestamp, user_id string").parquet(str(src))
    out = session_rollup(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    )
    assert got == [("u1", 2), ("u1", 3), ("u2", 2)]


def test_hourly_rollup_stream(spark, tmp_path):
    import datetime

    src = tmp_path / "ev"
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(minutes=10 * i), "click" if i % 2 else "view", float(i))
        for i in range(12)
    ]
    spark.createDataFrame(rows, "ts timestamp, event_type string, value double").write.parquet(
        str(src)
    )
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(
        str(src)
    )
    out = hourly_rollup(stream)
    # complete mode: append would hold back windows the watermark has
    # not passed, and this finite stream ends before that happens
    q = (
        out.writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from rollup").collect()
    # 12 events x 10min = 2 hours x 2 types = 4 groups
    assert {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"]) for r in got}
    total = sum(r["n_events"] for r in got)
    assert total == 12


def test_interval_join_streams_matches_batch_range_join(spark, tmp_path):
    """Stream-stream interval join == the batch range_join on the same
    data (the operator's declared batch twin)."""
    import datetime as dt

    from skylinemapreducehadoop_spark.operators.temporal import range_join
    from skylinemapreducehadoop_spark.streaming.joins import interval_join_streams

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=m), uid)
        for i, (m, uid) in enumerate(
            [(0, 1), (3, 1), (7, 1), (40, 1), (2, 2), (4, 2), (90, 2)]
        )
    ]
    schema = "event_id long, ts timestamp, user_id long"
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    df = spark.createDataFrame(rows, schema)
    df.write.parquet(str(ldir))
    df.write.parquet(str(rdir))

    lstream = spark.readStream.schema(schema).parquet(str(ldir))
    rstream = spark.readStream.schema(schema).parquet(str(rdir))
    out = interval_join_streams(
        lstream,
        rstream,
        on="user_id",
        lower_seconds=0,
        upper_seconds=600,
        watermark="2 hours",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["event_id_r"])
        for r in spark.sql("select event_id, event_id_r from ivj").collect()
    }
    want = {
        (r["event_id"], r["event_id_r"])
        for r in range_join(
            df,
            df,
            left_on="ts",
            right_on="ts",
            by="user_id",
            lower_seconds=0,
            upper_seconds=600,
        ).collect()
    }
    assert got == want and got  # non-empty and identical pair sets


def test_interval_join_streams_state_cleanup(spark, tmp_path):
    """The time bound is written as interval arithmetic on the
    watermarked timestamp columns so StreamingJoinHelper can derive
    state watermarks — this test proves rows are actually REMOVED from
    the join state store (the r5 unix_micros form joined correctly but
    leaked state forever: cleanup predicates were null, removed=0)."""
    import datetime as dt
    import time

    from skylinemapreducehadoop_spark.streaming.joins import interval_join_streams

    base = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long"
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    # three time-ordered file batches an hour apart: with a 1-minute
    # watermark and a 60s join upper bound, batch-1 state is far past
    # its eviction horizon once batch 2 lands
    for b in range(3):
        rows = [
            (b * 10 + i, base + dt.timedelta(hours=b, seconds=i), 1)
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, schema).coalesce(1)
        df.write.mode("append").parquet(str(ldir))
        df.write.mode("append").parquet(str(rdir))
        time.sleep(1.1)  # distinct mtimes -> deterministic file order

    lstream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ldir))
    )
    rstream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(rdir))
    )
    out = interval_join_streams(
        lstream,
        rstream,
        on="user_id",
        lower_seconds=0,
        upper_seconds=60,
        watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ivj_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    removed = sum(
        so.get("numRowsRemoved", 0)
        for p in q.recentProgress
        for so in p.get("stateOperators", [])
    )
    assert removed > 0, (
        "join state store never evicted rows — the time-range condition "
        "is not analyzable by StreamingJoinHelper"
    )


def test_interval_join_streams_rejects_bad_bounds(spark):
    import pytest

    from skylinemapreducehadoop_spark.streaming.joins import interval_join_streams

    df = spark.createDataFrame([], "ts timestamp, user_id long")
    with pytest.raises(ValueError):
        interval_join_streams(df, df, on="user_id", lower_seconds=10, upper_seconds=5)
    with pytest.raises(ValueError):
        interval_join_streams(df, df, on="user_id", lower_seconds=-1)


def test_streaming_group_moments_exact_and_batch_invariant(spark, tmp_path):
    """The final (n, Σq, Σq²) state is EXACTLY the batch aggregate and
    identical whether the data arrives as one file or three (integer
    folds are order/batching-invariant; a float running sum is not)."""
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.streaming.incremental import (
        streaming_group_moments,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "value", "event_id"
    )

    def run(n_files):
        src = tmp_path / f"src{n_files}"
        for b in range(n_files):
            ev.where(F.col("event_id") % n_files == b).select(
                "event_type", "value"
            ).write.mode("append").parquet(str(src))
        stream = (
            spark.readStream.schema("event_type string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            streaming_group_moments(stream)
            .writeStream.format("memory")
            .queryName(f"mom{n_files}")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ck{n_files}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.table(f"mom{n_files}").collect()
        final = {}
        for r in rows:
            if r["key"] not in final or r["n"] > final[r["key"]][0]:
                final[r["key"]] = (r["n"], int(r["s"]), int(r["sxx"]))
        return final

    one, three = run(1), run(3)
    assert one == three and len(one) > 0
    # exact batch twin computed in python
    import math

    want = {}
    for r in ev.collect():
        if r["value"] is None:
            continue
        q_ = int(math.floor(abs(r["value"]) * 1_000_000 + 0.5))
        q_ = q_ if r["value"] >= 0 else -q_
        n, s, sxx = want.get(r["event_type"], (0, 0, 0))
        want[r["event_type"]] = (n + 1, s + q_, sxx + q_ * q_)
    assert one == want


def test_windowed_histogram_stream_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.streaming.incremental import windowed_histogram

    rows = []
    for h in range(3):
        for i in range(40):
            rows.append((f"2024-01-01 0{h}:{i % 60:02d}:00", float((h * 37 + i * 13) % 120 - 10)))
    df = spark.createDataFrame(rows, "ts_s string, value double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
    out = windowed_histogram(stream, lo=0.0, hi=100.0, n_buckets=10)
    q = (
        out.writeStream.format("memory")
        .queryName("wh_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["bucket"]): r["n"]
        for r in spark.table("wh_test").collect()
    }
    b = F.least(F.lit(9), F.greatest(F.lit(0), F.floor(F.col("value") / F.lit(10.0)))).cast("int")
    want = {
        (r["w"], r["bucket"]): r["n"]
        for r in df.groupBy(
            F.date_trunc("hour", "ts").alias("w"), b.alias("bucket")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    # clamping: value -10 lands in bucket 0; value 110 would land in 9
    assert all(0 <= bkt <= 9 for _, bkt in got)


def test_windowed_histogram_rejects_bad_args(spark):
    import pytest

    from skylinemapreducehadoop_spark.streaming.incremental import windowed_histogram

    df = spark.readStream.format("rate").load().selectExpr("timestamp AS ts", "CAST(value AS DOUBLE) AS value")
    with pytest.raises(ValueError):
        windowed_histogram(df, lo=1.0, hi=1.0)
    with pytest.raises(ValueError):
        windowed_histogram(df, lo=0.0, hi=1.0, n_buckets=0)
