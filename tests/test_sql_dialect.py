"""SKYLINE OF SQL front-end (Börzsönyi et al. ICDE'01 syntax) — the
string rewrite must produce EXACTLY the function API's results."""

from __future__ import annotations

import pytest

from skylinemapreducehadoop_spark.operators.skyline import skyline, skyline_by
from skylinemapreducehadoop_spark.sql import parse_skyline_clause, skyline_sql


@pytest.fixture()
def li_view(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df.createOrReplaceTempView("lineitem")
    return df


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_parse_clause_variants():
    core, dims, diff, tail = parse_skyline_clause(
        "SELECT a, b FROM t WHERE a > 0 SKYLINE OF a MIN, b MAX"
    )
    assert core == "SELECT a, b FROM t WHERE a > 0"
    assert dims == [("a", "min"), ("b", "max")] and diff == [] and tail == ""
    # direction defaults to MIN (the paper's default); DIFF partitions
    _, dims, diff, tail = parse_skyline_clause(
        "select a,b,g from t skyline of a, b max, g diff order by a limit 5"
    )
    assert dims == [("a", "min"), ("b", "max")] and diff == ["g"]
    assert tail.lower().startswith("order by") and tail.lower().endswith("limit 5")
    with pytest.raises(ValueError):
        parse_skyline_clause("SELECT a FROM t")
    with pytest.raises(ValueError):
        parse_skyline_clause("SELECT a FROM t SKYLINE OF g DIFF")
    with pytest.raises(ValueError):
        parse_skyline_clause("SELECT a FROM t SKYLINE OF a MIN GROUP BY a")


def test_parse_clause_rejects_match_inside_string_literal():
    # the string-level rewrite must not split on SKYLINE OF inside a
    # quoted literal (quote-parity guard)
    with pytest.raises(ValueError, match="quoted literal"):
        parse_skyline_clause(
            "SELECT a FROM t WHERE note = 'use SKYLINE OF x here' SKYLINE"
        )
    with pytest.raises(ValueError, match="quoted literal"):
        parse_skyline_clause('SELECT a FROM t WHERE note = "SKYLINE OF x"')
    # a literal BEFORE the clause (balanced quotes) still parses
    core, dims, _, _ = parse_skyline_clause(
        "SELECT a FROM t WHERE note = 'hello' SKYLINE OF a MIN"
    )
    assert core == "SELECT a FROM t WHERE note = 'hello'"
    assert dims == [("a", "min")]


def test_skyline_sql_matches_function_api(spark, li_view):
    cols = ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"]
    got = skyline_sql(
        spark,
        "SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity "
        "FROM lineitem "
        "SKYLINE OF l_extendedprice MIN, l_discount MIN, l_quantity MAX",
    )
    want = skyline(
        li_view,
        [("l_extendedprice", "min"), ("l_discount", "min"), ("l_quantity", "max")],
    ).select(*cols)
    assert _rows(got.select(*cols), cols) == _rows(want, cols)


def test_skyline_sql_where_pushes_into_core(spark, li_view):
    # the WHERE belongs to the core statement and must run BEFORE the
    # skyline (paper clause order)
    cols = ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"]
    got = skyline_sql(
        spark,
        "SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity FROM lineitem "
        "WHERE l_quantity > 10 SKYLINE OF l_extendedprice MIN, l_quantity MAX",
    )
    want = skyline(
        li_view.where("l_quantity > 10"),
        [("l_extendedprice", "min"), ("l_quantity", "max")],
    ).select(*cols)
    assert _rows(got.select(*cols), cols) == _rows(want, cols)


def test_skyline_sql_diff_is_grouped_skyline(spark, li_view):
    # DIFF semantics: rows differing on the DIFF attribute are
    # incomparable == per-group skyline
    cols = ["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"]
    got = skyline_sql(
        spark,
        "SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, l_quantity "
        "FROM lineitem "
        "SKYLINE OF l_extendedprice MIN, l_quantity MAX, l_returnflag DIFF",
    )
    want = skyline_by(
        li_view,
        ["l_returnflag"],
        [("l_extendedprice", "min"), ("l_quantity", "max")],
    ).select(*cols)
    assert _rows(got.select(*cols), cols) == _rows(want, cols)


def test_skyline_sql_trailing_order_and_limit(spark, li_view):
    got = skyline_sql(
        spark,
        "SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity "
        "FROM lineitem "
        "SKYLINE OF l_extendedprice MIN, l_discount MIN, l_quantity MAX "
        "ORDER BY l_extendedprice LIMIT 3",
    ).collect()
    assert len(got) == 3
    prices = [r["l_extendedprice"] for r in got]
    assert prices == sorted(prices)
