"""GSOD fixed-width reader + sink tests (FIXTURES.md F1, SURVEY S1/S6/S7)."""

from __future__ import annotations

import os

import pytest

from skylinemapreducehadoop_spark.sources.gsod import (
    GSOD_FIELDS,
    GSOD_SKYLINE_DIMS,
    nullify_sentinels,
    read_gsod,
)
from skylinemapreducehadoop_spark.sources import sinks


def _gsod_line(stn, date, values: dict[str, float]) -> str:
    """Render one fixed-width line matching the reference offsets."""
    line = [" "] * 120
    def put(s, start, end):
        s = str(s)[: end - start].rjust(end - start)
        line[start:end] = list(s)

    put(stn, 0, 6)
    put(date, 14, 22)
    for name, start, end, sentinel, _ in GSOD_FIELDS[2:]:
        v = values.get(name, sentinel if sentinel is not None else 0.0)
        put(f"{v:.1f}", start, end)
    return "".join(line)


@pytest.fixture(scope="module")
def gsod_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("gsod") / "data.op"
    lines = [
        "STN--- WBAN   YEARMODA    TEMP       DEWP      SLP",  # header
        _gsod_line(10010, 20240101, {"temp": 55.2, "dewp": 40.1, "slp": 1013.2,
                                     "max_temp": 60.0, "stp": 990.1, "wdsp": 5.5,
                                     "mxspd": 9.9, "gust": 15.0, "min_temp": 50.0}),
        "",  # blank line must be dropped
        _gsod_line(10020, 20240102, {"temp": 33.0, "dewp": 20.5, "slp": 1020.0,
                                     "max_temp": 40.0, "stp": 995.0, "wdsp": 3.3,
                                     "mxspd": 7.7, "gust": 999.9, "min_temp": 28.0}),
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_gsod_parses_and_nullifies(spark, gsod_file):
    df = read_gsod(spark, gsod_file)
    rows = {r["stn"]: r for r in df.collect()}
    assert set(rows) == {10010, 10020}
    r1 = rows[10010]
    assert r1["obs_date"] == 20240101
    assert r1["temp"] == 55.2 and r1["slp"] == 1013.2 and r1["min_temp"] == 50.0
    # sentinel 999.9 for gust -> NULL
    assert rows[10020]["gust"] is None


def test_gsod_skyline_dims_shape():
    assert len(GSOD_SKYLINE_DIMS) == 9
    assert dict(GSOD_SKYLINE_DIMS)["temp"] == "max"
    assert dict(GSOD_SKYLINE_DIMS)["wdsp"] == "min"


def test_nullify_sentinels(spark):
    df = spark.createDataFrame([(1, 9999.9), (2, 3.0)], "id int, x double")
    out = {r["id"]: r["x"] for r in nullify_sentinels(df, {"x": 9999.9}).collect()}
    assert out[1] is None and out[2] == 3.0


def test_gsod_9dim_skyline_end_to_end(spark, tmp_path_factory):
    """The reference's native query: 9-dim mixed-direction skyline over
    GSOD records — all three strategies must agree, with sentinel rows
    excluded (they have NULL dims)."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.skyline import skyline

    rng = np.random.RandomState(0)
    p = tmp_path_factory.mktemp("gsod9") / "big.op"
    lines = []
    for i in range(1500):
        vals = {
            "temp": round(float(rng.uniform(-20, 110)), 1),
            "dewp": round(float(rng.uniform(-20, 80)), 1),
            "slp": round(float(rng.uniform(950, 1050)), 1),
            "max_temp": round(float(rng.uniform(-10, 120)), 1),
            "stp": round(float(rng.uniform(900, 1050)), 1),
            "wdsp": round(float(rng.uniform(0, 60)), 1),
            "mxspd": round(float(rng.uniform(0, 80)), 1),
            "gust": round(float(rng.uniform(0, 120)), 1),
            "min_temp": round(float(rng.uniform(-30, 90)), 1),
        }
        if i % 50 == 0:
            vals["gust"] = 999.9  # sentinel -> NULL -> excluded
        lines.append(_gsod_line(10000 + i, 20240101 + i % 28, vals))
    p.write_text("\n".join(lines) + "\n")

    df = read_gsod(spark, str(p))
    key = lambda res: sorted(r["stn"] for r in res.collect())
    a = key(skyline(df, GSOD_SKYLINE_DIMS, strategy="twophase"))
    b = key(skyline(df, GSOD_SKYLINE_DIMS, strategy="bruteforce"))
    c = key(skyline(df, GSOD_SKYLINE_DIMS, strategy="quadtree"))
    assert a == b == c
    assert len(a) > 0
    # sentinel rows cannot appear (NULL dim)
    sentinel_stns = {10000 + i for i in range(0, 1500, 50)}
    assert not (set(a) & sentinel_stns)


def test_parquet_and_csv_sinks(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "id int, g string, x double")
    pq = str(tmp_path / "pq")
    sinks.write_parquet(df, pq, partition_by=["g"])
    back = spark.read.parquet(pq)
    assert back.count() == 2
    assert any(n.startswith("g=") for n in os.listdir(pq))  # directory partitioning

    csv = str(tmp_path / "csv")
    sinks.write_csv(df, csv)
    assert spark.read.option("header", "true").csv(csv).count() == 2


def test_multiway_skyline_sink(spark, tmp_path):
    rows = [(1, 1.0, 5.0), (2, 2.0, 4.0), (3, 3.0, 3.0), (4, 9.0, 9.0)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    dims = [("x", "min"), ("y", "min")]
    paths = sinks.write_skyline_outputs(df, dims, str(tmp_path / "out"))
    sky = spark.read.parquet(paths["skyline"])
    assert sorted(r["id"] for r in sky.collect()) == [1, 2, 3]
    vpn = spark.read.parquet(paths["vpn"]).collect()[0]
    assert vpn["x"] == 3.0 and vpn["y"] == 5.0  # component-wise worst of skyline
    filt = spark.read.parquet(paths["filter"])
    assert sorted(r["id"] for r in filt.collect()) == [1, 3]  # per-dim argmin rows


def test_jsonl_roundtrip(spark, tmp_path):
    from skylinemapreducehadoop_spark.sources.sinks import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "alpha beta", 10), (2, "gamma", None)],
        "doc_id long, text string, score int",
    )
    path = str(tmp_path / "jl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema="doc_id long, text string, score int")
    got = sorted((r["doc_id"], r["text"], r["score"]) for r in back.collect())
    assert got == [(1, "alpha beta", 10), (2, "gamma", None)]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.sources.sinks import read_orc, write_orc

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    p = str(tmp_path / "orders_orc")
    write_orc(df, p, mode="overwrite")
    back = read_orc(spark, p)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    # values survive the roundtrip (decimal-exact money sum)
    a = df.agg(F.sum(F.col("o_totalprice").cast("decimal(20,2)"))).first()[0]
    b = back.agg(F.sum(F.col("o_totalprice").cast("decimal(20,2)"))).first()[0]
    assert a == b
    # filter pushdown reaches the ORC scan
    plan = (
        back.where(F.col("o_orderkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:120]
