"""Empty-input and degenerate-shape robustness across the operator surface.

A 100 TB pipeline hits empty partitions, empty filter results, and
all-NULL slices constantly; every operator must return an empty (or
well-defined) result with the right schema instead of throwing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.operators import dedup as D
from skylinemapreducehadoop_spark.operators import sampling as SA
from skylinemapreducehadoop_spark.operators import similarity as S
from skylinemapreducehadoop_spark.operators.skyline import (
    skyline,
    skyline_by,
    skyline_layers,
)
from skylinemapreducehadoop_spark.operators.temporal import asof_join, range_join
from skylinemapreducehadoop_spark.functions import text as TX


@pytest.fixture
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture
def empty_pts(spark):
    return spark.createDataFrame([], "id int, x double, y double")


DIMS = [("x", "min"), ("y", "min")]


def test_skyline_empty_all_strategies(spark, empty_pts):
    for strategy in ("twophase", "bruteforce", "quadtree"):
        out = skyline(empty_pts, DIMS, strategy=strategy)
        assert out.count() == 0
        assert set(out.columns) == {"id", "x", "y"}


def test_skyline_all_null_dims(spark):
    df = spark.createDataFrame(
        [(1, None, 1.0), (2, 2.0, None), (3, None, None)],
        "id int, x double, y double",
    )
    assert skyline(df, DIMS).count() == 0


def test_skyline_single_row(spark):
    df = spark.createDataFrame([(1, 1.0, 2.0)], "id int, x double, y double")
    assert [r["id"] for r in skyline(df, DIMS).collect()] == [1]


def test_skyline_by_and_layers_empty(spark, empty_pts):
    assert skyline_by(empty_pts, "id", DIMS).count() == 0
    out = skyline_layers(empty_pts, DIMS, n_layers=2)
    assert out.count() == 0
    assert "layer" in out.columns


def test_dedup_empty_corpus(spark, empty_docs):
    assert D.exact_dedup(empty_docs).count() == 0
    assert D.minhash_near_dup(empty_docs).count() == 0
    assert D.simhash_near_dup(empty_docs).count() == 0


def test_text_functions_empty_and_null(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    stats = TX.text_stats(df).collect()
    assert len(stats) == 2
    lang = {r["doc_id"]: r["lang_pred"] for r in TX.language_id(df).collect()}
    assert lang == {1: "en", 2: "en"}


def test_sampling_empty(spark, empty_docs):
    assert SA.hash_sample(empty_docs, ["text"], 0.5).count() == 0
    assert SA.reservoir_sample(empty_docs, 5, ["text"]).count() == 0


def test_similarity_empty_build_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert S.cosine_topk(empty, [1.0, 0.0], k=5).count() == 0
    with pytest.raises(ValueError):
        S.ivf_build(empty)


def test_asof_empty_right(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    ldf = spark.createDataFrame([(1, ts, 10)], "user_id int, ts timestamp, left_id int")
    rdf = spark.createDataFrame([], "user_id int, ts timestamp, right_id int, val double")
    out = asof_join(ldf, rdf, on="ts", by="user_id").collect()
    assert len(out) == 1
    assert out[0]["right_id_right"] is None and out[0]["val_right"] is None


def test_range_join_empty_sides(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    a = spark.createDataFrame([(1, ts, 1)], "user_id int, ts timestamp, event_id int")
    e = spark.createDataFrame([], "user_id int, ts timestamp, event_id int")
    assert range_join(a, e, left_on="ts", right_on="ts", by="user_id",
                      lower_seconds=0, upper_seconds=60).count() == 0
    assert range_join(e, a, left_on="ts", right_on="ts", by="user_id",
                      lower_seconds=0, upper_seconds=60).count() == 0
