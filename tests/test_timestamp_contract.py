"""Timestamp-encoding contract for the parquet loader.

The correctness driver regenerates testdata with whatever parquet
timestamp encoding its pyarrow/PySpark versions default to; the r2 and
r4 rounds each lost queries to an encoding drift (nano-as-long, then
``timestamp[us]``→TIMESTAMP_NTZ under PySpark 4.1's ``inferTimestampNTZ``
default). The contract tested here: ``load_table`` yields a plain
``TimestampType`` column with identical UTC instants for EVERY encoding
a parquet writer can plausibly produce, and the timestamp-consuming
operators run on all of them.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from skylinemapreducehadoop_spark.operators.temporal import asof_join, range_join
from skylinemapreducehadoop_spark.sources.tables import _normalize_nanos, load_table

ENCODINGS = ("nanos", "micros_ntz", "micros_utc", "int96")

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
# (event_id, minutes-offset, user_id) — two users, gaps straddling the
# 30-minute sessionize threshold
ROWS = [
    (1, 0, 10),
    (2, 5, 10),
    (3, 90, 10),  # >30 min gap -> new session for user 10
    (4, 2, 20),
    (5, 3, 20),
    (6, 200, 20),  # new session for user 20
]


def _write_events(tmpdir: str, encoding: str) -> str:
    ts = [BASE + dt.timedelta(minutes=m) for _, m, _ in ROWS]
    write_kwargs = {}
    if encoding == "nanos":
        ts_type = pa.timestamp("ns")
    elif encoding == "micros_ntz":
        ts_type = pa.timestamp("us")
    elif encoding == "micros_utc":
        ts_type = pa.timestamp("us", tz="UTC")
    elif encoding == "int96":
        # the legacy Hive/Spark physical encoding still found in old
        # warehouse files
        ts_type = pa.timestamp("ns")
        write_kwargs["use_deprecated_int96_timestamps"] = True
    else:  # pragma: no cover
        raise AssertionError(encoding)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(ts, ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
        }
    )
    path = os.path.join(tmpdir, f"events.parquet")
    pq.write_table(tbl, path, **write_kwargs)
    return tmpdir


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_load_table_yields_timestamp_type(spark, tmp_path, encoding):
    sf_dir = _write_events(str(tmp_path), encoding)
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), encoding
    got = {
        r["event_id"]: r["ts"]
        for r in ev.select("event_id", "ts").collect()
    }
    want = {r[0]: BASE + dt.timedelta(minutes=r[1]) for r in ROWS}
    assert got == want, encoding


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_timestamp_operators_run_on_every_encoding(spark, tmp_path, encoding):
    """sessionize-style window math, asof_join, and range_join must all
    accept the loaded ``ts`` column (they use unix_micros, which rejects
    TIMESTAMP_NTZ — the exact r4 failure)."""
    from pyspark.sql import Window

    sf_dir = _write_events(str(tmp_path), encoding)
    ev = load_table(spark, sf_dir, "events")

    # sessionize (the __spark_entry__ logic in miniature)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    sess = (
        ev.withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .select("event_id", "session_id")
    )
    sids = {r["event_id"]: r["session_id"] for r in sess.collect()}
    assert sids == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1, 6: 2}, encoding

    # asof_join: each event matched to the latest event at-or-before it
    out = asof_join(ev, ev, on="ts", by="user_id", right_cols=["event_id"])
    assert out.count() == len(ROWS)

    # range_join: pairs within (0, 10 min]
    rj = range_join(
        ev.select("user_id", "ts", "event_id"),
        ev.select("user_id", "ts", "event_id"),
        left_on="ts",
        right_on="ts",
        by="user_id",
        lower_seconds=0,
        upper_seconds=600,
    )
    pairs = {(r["event_id"], r["event_id_r"]) for r in rj.collect()}
    assert pairs == {(1, 2), (4, 5)}, encoding


def test_normalize_nanos_casts_ntz_dataframe(spark):
    """The cast path must work even when a frame arrives NTZ-typed (a
    session that read parquet before the loader set its confs)."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 12, 0, 0))],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("ts", T.TimestampNTZType()),
            ]
        ),
    )
    out = _normalize_nanos(df, set())
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    row = out.collect()[0]
    assert row["ts"] == dt.datetime(2024, 6, 1, 12, 0, 0)
