"""JSON string column extraction + aggregation (functions/semistructured)."""

from skylinemapreducehadoop_spark.functions.semistructured import (
    json_field,
    json_field_stats,
)


def test_json_field_extraction(spark):
    rows = [
        (1, '{"k": 7, "s": "x"}'),
        (2, '{"k": 2.5}'),
        (3, 'not json'),
        (4, None),
        (5, '{"other": 1}'),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    got = {
        r["id"]: r["v"]
        for r in df.select(
            "id", json_field("props", "$.k", cast="double").alias("v")
        ).collect()
    }
    assert got[1] == 7.0 and got[2] == 2.5
    assert got[3] is None and got[4] is None and got[5] is None


def test_json_field_stats_grouped(spark):
    rows = [
        (1, "a", '{"k": 10}'),
        (2, "a", '{"k": 20}'),
        (3, "a", "bad"),
        (4, "b", '{"k": 5}'),
    ]
    df = spark.createDataFrame(rows, "id long, t string, props string")
    got = {
        r["t"]: r
        for r in json_field_stats(
            df, "props", "$.k", group_by=["t"]
        ).collect()
    }
    a = got["a"]
    assert a["n_rows"] == 3 and a["n_present"] == 2 and a["n_distinct"] == 2
    assert a["sum"] == 30.0 and a["mean"] == 15.0
    assert a["vmin"] == 10.0 and a["vmax"] == 20.0
    assert got["b"]["mean"] == 5.0


def test_json_field_stats_layout_independent(spark):
    rows = [(i, '{"k": %d.%d}' % (i % 7, i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, props string")
    a = json_field_stats(df, "props", "$.k").collect()[0].asDict()
    b = (
        json_field_stats(df.repartition(23), "props", "$.k")
        .collect()[0]
        .asDict()
    )
    assert a == b
