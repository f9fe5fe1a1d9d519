"""Cross-engine CASE-MAPPING, WORD-BOUNDARY and REVERSE laws (r12 —
pins three..five of the engine-divergent primitive registry; see
PLANS.md §24 and the sibling test_tokenization_law / test_script_law).

Measured divergences these laws close:

- **case**: Spark/Java and Python perform FULL Unicode case mapping
  (lower('İ') = 'i' + COMBINING DOT ABOVE, upper('ß') = 'SS',
  upper('ﬁ') = 'FI', Greek final sigma) while DuckDB's utf8proc does
  SIMPLE 1:1 mapping (lower('İ') = plain 'i' — which IS the English
  marker word 'it' when followed by 't'; upper('ß') = 'ẞ'). Pinned:
  ASCII-only translate on both sides wherever a cross-engine-compared
  value needs folding.
- **\\b**: Java's \\b is Unicode-aware (é/ﬁ/中 are word characters, so
  '中555-123-4567' escapes the PII patterns) while RE2's \\b is ASCII.
  Pinned: ASCII word boundary — RE2 keeps \\b, Java spells the same
  semantic with explicit lookarounds (zero-width, so counts AND
  replacements agree).
- **reverse**: Spark reverses CODEPOINTS, DuckDB reverses GRAPHEME
  CLUSTERS (combining sequences, ZWJ emoji, flags stay intact).
  Pinned: codepoint reverse — the oracle splits to codepoints first.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.functions import text as TX

CASE_EDGE = ["İstanbul", "STRAẞE ß", "ﬁne ŉot", "ΣΊΣΥΦΟΣ σοφός", "plain ASCII Text", "İT İS"]


def test_ascii_case_law_cross_engine(spark):
    """ascii_lower/ascii_upper agree char-for-char between Spark and
    DuckDB on the full-vs-simple divergence corpus."""
    df = spark.createDataFrame(list(enumerate(CASE_EDGE)), "id long, c string")
    got = {
        r["id"]: (r["lo"], r["up"])
        for r in df.select(
            "id",
            TX.ascii_lower("c").alias("lo"),
            TX.ascii_upper("c").alias("up"),
        ).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(CASE_EDGE):
        lo = con.execute(f"select {TX.ascii_lower_sql('?')}", [c]).fetchone()[0]
        up = con.execute(f"select {TX.ascii_upper_sql('?')}", [c]).fetchone()[0]
        assert got[i] == (lo, up), f"{c!r}"


def test_control_native_case_does_diverge(spark):
    """Non-vacuity: Spark's native upper() and DuckDB's really do
    disagree on 'ß' (full 'SS' vs simple 'ẞ'), and Python's full
    lower('İT') ('i̇t') differs from DuckDB's simple lower ('it' — a
    marker word)."""
    up_spark = (
        spark.createDataFrame([("ß",)], "c string")
        .select(F.upper("c").alias("u"))
        .collect()[0]["u"]
    )
    con = duckdb.connect()
    up_duck = con.execute("select upper('ß')").fetchone()[0]
    assert up_spark == "SS" and up_duck == "ẞ"
    assert "İT".lower() == "i̇t"
    assert con.execute("select lower('İT')").fetchone()[0] == "it"


def test_langid_marker_immune_to_case_and_nbsp_divergence():
    """The marker scorer must NOT see 'İT' as 'it' (ASCII-only fold)
    and must NOT treat NBSP as a token boundary (pinned whitespace
    law) — both matching the oracle's translate + pinned-split."""
    import pandas as pd

    table = TX._ASCII_LOWER_TABLE
    assert pd.Series(["İT"]).str.translate(table)[0] == "İt"
    assert pd.Series(["THE"]).str.translate(table)[0] == "the"
    # the compiled per-language patterns use pinned-ws lookarounds:
    # NBSP-adjacent markers must not count on either engine
    import re

    _not_ws = "[^ \\t\\n\\x0b\\f\\r]"
    pat = re.compile(f"(?<!{_not_ws})(?:the|and)(?!{_not_ws})")
    assert len(pat.findall("x the y")) == 1
    assert len(pat.findall("x the y")) == 0  # NBSP glues the token
    assert len(pat.findall("the y")) == 0
    assert len(pat.findall("the and")) == 2
    assert len(pat.findall("x\x0bthe y")) == 1  # vtab IS pinned whitespace


PII_EDGE = [
    (0, "call 555-123-4567 now"),        # plain: matches both
    (1, "é555-123-4567 x"),              # non-ASCII letter abuts: pinned law MATCHES
    (2, "ﬁ555-123-4567."),               # ligature abuts: pinned law MATCHES
    (3, "中555-123-4567 y"),              # CJK abuts: pinned law MATCHES
    (4, "x555-123-4567 z"),              # ASCII word char abuts: NO match
    (5, "555-123-4567"),                 # string edges are boundaries
    (6, "5555-123-4567"),                # digit abuts: NO match
    (7, "ip 10.0.0.1 10.0.0.2 done"),    # adjacent IPs, one space apart: both
    (8, "v1.2.3.4beta"),                 # trailing word char: NO match
]


def test_pii_boundary_law_cross_engine(spark):
    """The Java lookaround spelling and RE2's \\b produce identical
    counts AND identical redacted text on the ASCII-boundary edge
    corpus — including the cases where Java's own \\b would differ."""
    df = spark.createDataFrame(PII_EDGE, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_phone"], r["n_ipv4"], r["redacted"])
        for r in TX.redact_pii(df).collect()
    }
    con = duckdb.connect()
    pats = dict((n, p) for n, p, _ in TX.PII_PATTERNS_SQL)
    for doc_id, text in PII_EDGE:
        n_phone = con.execute(
            "select len(regexp_extract_all(?, ?))", [text, pats["phone"]]
        ).fetchone()[0]
        n_ipv4 = con.execute(
            "select len(regexp_extract_all(?, ?))", [text, pats["ipv4"]]
        ).fetchone()[0]
        red = con.execute(
            "select regexp_replace(regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g'), ?, '<IPV4>', 'g')",
            [text, TX.PII_PATTERNS_SQL[0][1], pats["phone"], pats["ipv4"]],
        ).fetchone()[0]
        assert got[doc_id][:2] == (n_phone, n_ipv4), f"{text!r}"
        assert got[doc_id][2] == red, f"{text!r}"
    # the law's content: non-ASCII neighbors do NOT block a match
    assert got[1][0] == 1 and got[2][0] == 1 and got[3][0] == 1
    assert got[4][0] == 0 and got[6][0] == 0
    assert got[7][1] == 2 and got[8][1] == 0


def test_control_java_native_b_does_diverge(spark):
    """Non-vacuity: Java's own \\b treats 'ﬁ' as a word character, so
    the OLD pattern misses 'ﬁ555-123-4567.' — the pinned lookaround
    spelling finds it (as RE2's \\b always did)."""
    df = spark.createDataFrame([("ﬁ555-123-4567.",)], "c string")
    old = df.select(
        F.regexp_count("c", F.lit(r"\b\d{3}[-.]\d{3}[-.]\d{4}\b")).alias("n")
    ).collect()[0]["n"]
    new = df.select(
        F.regexp_count("c", F.lit(TX.PII_PATTERNS[1][1])).alias("n")
    ).collect()[0]["n"]
    assert old == 0 and new == 1


REV_EDGE = ["éxyz", "ab‍cd", "🇩🇪de", "plain", "á̂b"]


def test_reverse_codepoint_law_cross_engine(spark):
    """Spark's codepoint reverse equals the oracle's split-to-
    codepoints reverse on combining sequences, ZWJ and flag pairs —
    and DuckDB's native grapheme reverse really differs (control)."""
    df = spark.createDataFrame(list(enumerate(REV_EDGE)), "id long, c string")
    got = {
        r["id"]: r["rev"]
        for r in df.select("id", F.reverse("c").alias("rev")).collect()
    }
    con = duckdb.connect()
    diverged = 0
    for i, c in enumerate(REV_EDGE):
        pinned = con.execute(
            "select array_to_string(list_reverse(regexp_extract_all(?, '(?s).')), '')",
            [c],
        ).fetchone()[0]
        native = con.execute("select reverse(?)", [c]).fetchone()[0]
        assert got[i] == pinned, f"{c!r}"
        diverged += int(native != pinned)
    assert diverged >= 2  # control: the native spelling is NOT the law


def test_oracle_lint_no_unpinned_divergent_primitives():
    """Mechanical pin enforcement for FUTURE oracles (the
    pin_ws_oracle bare-\\s guard generalized): no registered oracle
    may use an engine-native spelling of a primitive the divergence
    registry (PLANS.md §24) has pinned — native \\p{...} property
    classes (Unicode table versions differ), lower()/upper() case
    folding on data (full vs simple mapping), or native reverse()
    (grapheme vs codepoint). Allowlisted survivors are the provably
    safe or pinned-by-construction sites."""
    import re

    import __spark_entry__ as entry

    sqls = entry.oracle_sql()
    # upper() over hex() output is ASCII [0-9a-f] — case-safe
    CASE_SAFE = {"multimodal_stats"}
    # \b in oracle SQL IS the pinned ASCII boundary (RE2); the Spark
    # twin's lookaround spelling is law-tested in this file. The r13
    # canary_word_boundary entry probes exactly this law pair (its
    # Spark side uses the lookaround spelling, tests/test_canary.py).
    B_ALLOWED = {"redact_pii_documents", "canary_word_boundary"}
    for name, sql in sqls.items():
        assert "\\p{" not in sql, f"{name}: native Unicode property class"
        if name not in CASE_SAFE:
            assert not re.search(r"(?<![a-z_])(?:lower|upper)\(", sql), (
                f"{name}: native case folding — use TX.ascii_lower_sql/"
                "ascii_upper_sql (pinned case law)"
            )
        if name != "string_funcs_documents":
            assert not re.search(r"(?<![a-z_])reverse\(", sql), (
                f"{name}: native reverse() is grapheme-based — split to "
                "codepoints first (pinned reverse law)"
            )
        if name not in B_ALLOWED:
            assert "\\b" not in sql, (
                f"{name}: \\b outside the allowlisted PII oracle — confirm "
                "the Spark twin pins the ASCII boundary, then allowlist"
            )
