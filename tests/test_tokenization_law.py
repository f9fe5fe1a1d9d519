"""Cross-engine whitespace-tokenization law (r11 verdict task 1).

The repo-wide rule: text tokenizes by splitting on runs of the PINNED
explicit class ``[ \\t\\n\\x0B\\f\\r]`` after a space-only trim, on
BOTH engines. History: the Spark side used Java's ``\\s`` and every
DuckDB oracle hand-embedded ``'\\s+'`` — but Java's \\s includes
vertical tab (\\x0B) while RE2's (DuckDB's) does not, so a corpus
containing \\x0B tokenized differently per engine (the r11 driver-red
pair vocab_growth_documents / strip_boilerplate_documents).

These tests plant exactly the exotic-whitespace fixtures the verdict
ordered (\\x0B, \\f, \\r\\n, NBSP U+00A0, IDEOGRAPHIC SPACE U+3000,
ZWSP U+200B) and assert the law holds:

- \\x0B, \\f, \\t, \\n, \\r (and \\r\\n) ARE separators on both engines;
- NBSP / U+3000 / U+200B are NOT separators on either engine (same as
  Java \\s today, so committed hashes are unchanged);
- Spark ``tokens()`` and the pinned DuckDB twin agree token-for-token;
- every registered oracle is actually routed through the pin (no bare
  ``\\s`` survives into executed SQL);
- the two formerly-red registry entries agree cross-engine ON a corpus
  that contains the divergence characters.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.functions import text as TX

# The planted fixture corpus: every string exercises a whitespace edge.
EXOTIC_DOCS = [
    (0, "plain words here"),
    (1, "vertical\x0btab splits"),          # Java-\s-only char (the bug)
    (2, "form\ffeed splits"),
    (3, "crlf\r\nsplits"),
    (4, "tab\tsplits"),
    (5, "nbsp stays"),                  # NOT a separator
    (6, "ideo　stays"),                  # NOT a separator
    (7, "zwsp​stays"),                  # NOT a separator
    (8, "  leading and trailing  "),
    (9, "multi   space\x0b\f\t\n runs"),
    (10, "mixed nbsp\x0band vtab"),
    (11, ""),
    (12, "\x0b\x0b"),                        # separators only
]

_ORACLE_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"


@pytest.fixture(scope="module")
def exotic_spark_tokens(spark):
    df = spark.createDataFrame(EXOTIC_DOCS, "doc_id long, text string")
    rows = (
        df.select("doc_id", TX.tokens("text").alias("t"))
        .orderBy("doc_id")
        .collect()
    )
    return {r["doc_id"]: r["t"] for r in rows}


@pytest.fixture(scope="module")
def exotic_duck_tokens():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", EXOTIC_DOCS
    )
    sql = TX.pin_ws_oracle(
        f"SELECT doc_id, {_ORACLE_TOKENS} AS t FROM documents ORDER BY doc_id"
    )
    out = {int(i): list(t) for i, t in con.execute(sql).fetchall()}
    con.close()
    return out


def test_engines_tokenize_identically(exotic_spark_tokens, exotic_duck_tokens):
    assert set(exotic_spark_tokens) == set(exotic_duck_tokens)
    for doc_id in exotic_spark_tokens:
        assert exotic_spark_tokens[doc_id] == exotic_duck_tokens[doc_id], (
            f"doc {doc_id}: spark={exotic_spark_tokens[doc_id]!r} "
            f"duckdb={exotic_duck_tokens[doc_id]!r}"
        )


def test_pinned_separators_split(exotic_spark_tokens):
    assert exotic_spark_tokens[1] == ["vertical", "tab", "splits"]
    assert exotic_spark_tokens[2] == ["form", "feed", "splits"]
    assert exotic_spark_tokens[3] == ["crlf", "splits"]
    assert exotic_spark_tokens[4] == ["tab", "splits"]
    assert exotic_spark_tokens[9] == ["multi", "space", "runs"]


def test_unicode_whitespace_is_not_a_separator(exotic_spark_tokens):
    # Deliberate (matches Java \s, keeps every committed hash stable):
    # NBSP / IDEOGRAPHIC SPACE / ZWSP stay inside tokens.
    assert exotic_spark_tokens[5] == ["nbsp stays"]
    assert exotic_spark_tokens[6] == ["ideo　stays"]
    assert exotic_spark_tokens[7] == ["zwsp​stays"]
    assert exotic_spark_tokens[10] == ["mixed nbsp", "and", "vtab"]


def test_duckdb_unpinned_regex_would_diverge():
    """The control: DuckDB's own \\s+ does NOT split \\x0B — proving the
    pin is load-bearing, not decorative."""
    con = duckdb.connect()
    (raw,) = con.execute(
        r"SELECT regexp_split_to_array('vertical' || chr(11) || 'tab', '\s+')"
    ).fetchone()
    con.close()
    assert list(raw) == ["vertical\x0btab"]  # RE2 \s misses \x0B


def test_pin_ws_oracle_rewrites_and_rejects():
    assert TX.pin_ws_oracle("x '\\s+' y") == f"x '{TX.PINNED_WS_RUN}' y"
    with pytest.raises(ValueError, match="bare"):
        TX.pin_ws_oracle(r"SELECT regexp_matches(t, '\sfoo')")


def test_every_registered_oracle_is_pinned():
    import __spark_entry__ as entrymod

    for name, sql in entrymod.oracle_sql().items():
        assert "\\s" not in sql, f"{name}: unpinned \\s reached executed SQL"


@pytest.mark.parametrize(
    "entry", ["vocab_growth_documents", "strip_boilerplate_documents"]
)
def test_red_pair_agrees_on_divergence_corpus(spark, tmp_path, entry):
    """Run the two formerly driver-red registry entries end-to-end
    against their REAL oracles over a corpus planted with the exact
    characters that caused the divergence (\\x0B et al.)."""
    import pandas as pd

    import __spark_entry__ as entrymod

    # A corpus shaped like documents.parquet (the columns these two
    # entries read: doc_id, text) with the exotic docs replicated so
    # vocab-growth buckets and boilerplate segments are non-trivial.
    docs = []
    for rep in range(10):
        for doc_id, text in EXOTIC_DOCS:
            docs.append(
                (
                    rep * 100 + doc_id,
                    f"{text} subscribe to our newsletter click here for more "
                    f"common tail tokens row{rep} "
                    + ("alpha beta\x0bgamma " * (doc_id % 3)),
                )
            )
    sf_dir = str(tmp_path / "sf_exotic")
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).repartition(2).write.parquet(
        f"{sf_dir}/documents.parquet"
    )

    spdf = entrymod.queries()[entry](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    opdf = con.execute(entrymod.oracle_sql()[entry]).fetchdf()
    con.close()

    assert sorted(spdf.columns) == sorted(opdf.columns)
    a = spdf[sorted(spdf.columns)].sort_values(list(sorted(spdf.columns)))
    b = opdf[sorted(opdf.columns)].sort_values(list(sorted(opdf.columns)))
    assert len(a) == len(b)
    av = [tuple(r) for r in a.itertuples(index=False, name=None)]
    bv = [tuple(r) for r in b.itertuples(index=False, name=None)]
    assert av == bv
