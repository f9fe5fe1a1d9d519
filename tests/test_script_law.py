"""Cross-engine Unicode-SCRIPT class law (r12 — the second pin after
the whitespace law of test_tokenization_law.py).

The repo-wide rule: script-composition counting (``script_mix``) uses
the PINNED explicit codepoint-range classes ``PINNED_LATIN_CLASS`` /
``PINNED_HAN_CLASS`` / ``PINNED_CYRILLIC_CLASS`` on BOTH engines.
History: the Spark side used Java's ``\\p{IsLatin}`` (JDK 17 =
Unicode 13.0 tables) and the DuckDB oracle used RE2's ``\\p{Latin}``
(Unicode 15+ tables) — the same script property NAME backed by
different table versions, so Unicode-14/15 additions (U+A7C0 LATIN
CAPITAL LETTER OLD POLISH O, U+9FFD..U+9FFF Han, U+1E030+ Cyrillic
Extended-D, ...) matched in the oracle but not in Spark: the \\x0B
bug class again, one layer up.

The pin freezes the JVM's current behavior (so every committed hash is
unchanged on the Spark side) and narrows the oracle to match. These
tests assert:

- the pinned class is EXACTLY Java's ``\\p{IsXxx}`` at every range
  boundary (endpoint and endpoint±1 — where transcription off-by-ones
  live), via Spark itself;
- Spark and DuckDB agree char-for-char under the pinned classes on a
  fixture corpus that CONTAINS the divergent codepoints;
- a control: DuckDB's native ``\\p{Latin}`` really does diverge on
  U+A7C0 (the law is non-vacuous);
- the registry entry the classes feed (`script_mix_documents`) agrees
  cross-engine on the divergent corpus.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.functions import text as TX

# Codepoints where JDK-17 and RE2 tables were MEASURED to disagree
# (tools/pin_scripts.py probe, 2026-08): all added after Unicode 13.
DIVERGENT = {
    "latin": [0xA7C0, 0xA7C1, 0xA7D0, 0xA7D1, 0xA7D5, 0xA7F2, 0x1DF00, 0x10780],
    "han": [0x9FFD, 0x9FFF, 0x31350, 0x323AF, 0x2A6DE],
    "cyrillic": [0x1E030, 0x1E08F],
}

CLASSES = {
    "latin": (TX.PINNED_LATIN_CLASS, r"\p{IsLatin}", r"\p{Latin}", TX._LATIN_RANGES),
    "han": (TX.PINNED_HAN_CLASS, r"\p{IsHan}", r"\p{Han}", TX._HAN_RANGES),
    "cyrillic": (
        TX.PINNED_CYRILLIC_CLASS,
        r"\p{IsCyrillic}",
        r"\p{Cyrillic}",
        TX._CYRILLIC_RANGES,
    ),
}


def _boundary_cps(ranges) -> list[int]:
    cps = set()
    for a, b in ranges:
        for c in (a - 1, a, a + 1, b - 1, b, b + 1):
            if 0 <= c <= 0x10FFFF and not 0xD800 <= c <= 0xDFFF:
                cps.add(c)
    return sorted(cps)


def test_pinned_equals_java_class_at_every_boundary(spark):
    """The pin IS the JVM's behavior: at every range endpoint ±1 the
    explicit class and Java's \\p{IsXxx} agree — so swapping
    script_mix to the pinned class provably changed nothing on the
    Spark side (every committed LOCALCHECK hash stands)."""
    for fam, (pinned, java_cls, _, ranges) in CLASSES.items():
        cps = _boundary_cps(ranges)
        df = spark.createDataFrame([(c, chr(c)) for c in cps], "cp long, c string")
        bad = (
            df.select(
                "cp",
                F.regexp_count("c", F.lit(pinned)).alias("p"),
                F.regexp_count("c", F.lit(java_cls)).alias("j"),
            )
            .where("p <> j")
            .collect()
        )
        assert bad == [], f"{fam}: pin != Java at {[hex(r['cp']) for r in bad]}"


def test_pinned_agrees_cross_engine_on_divergent_corpus(spark):
    """Char-for-char agreement between Spark and DuckDB under the
    pinned classes on strings CONTAINING the divergent codepoints —
    the exact corpus class where the engine-native spellings split."""
    rows = []
    i = 0
    for fam, cps in DIVERGENT.items():
        for cp in cps:
            rows.append((i, f"ab{chr(cp)}яз中c"))
            i += 1
    rows.append((i, "plain ascii only"))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["lat"], r["han"], r["cyr"])
        for r in df.select(
            "id",
            F.regexp_count("text", F.lit(TX.PINNED_LATIN_CLASS)).alias("lat"),
            F.regexp_count("text", F.lit(TX.PINNED_HAN_CLASS)).alias("han"),
            F.regexp_count("text", F.lit(TX.PINNED_CYRILLIC_CLASS)).alias("cyr"),
        ).collect()
    }
    con = duckdb.connect()
    for rid, text in rows:
        want = tuple(
            con.execute(
                "select len(regexp_extract_all(?, ?))", [text, cls]
            ).fetchone()[0]
            for cls in (
                TX.PINNED_LATIN_CLASS,
                TX.PINNED_HAN_CLASS,
                TX.PINNED_CYRILLIC_CLASS,
            )
        )
        assert got[rid] == want, f"id={rid} {text!r}: spark {got[rid]} duck {want}"


def test_control_native_classes_do_diverge():
    """Non-vacuity: DuckDB's own \\p{Latin} MATCHES U+A7C0 while the
    pinned (JDK-17) class does not — without the pin, a corpus
    containing it hash-mismatches. If this control ever fails, the
    engines' Unicode tables converged and the pin can be re-derived
    (tools/pin_scripts.py)."""
    con = duckdb.connect()
    ch = chr(0xA7C0)
    native = con.execute(
        "select regexp_matches(?, ?)", [ch, r"\p{Latin}"]
    ).fetchone()[0]
    pinned = con.execute(
        "select regexp_matches(?, ?)", [ch, TX.PINNED_LATIN_CLASS]
    ).fetchone()[0]
    assert native is True
    assert pinned is False


def test_script_mix_entry_agrees_on_divergent_corpus(spark, tmp_path):
    """The registry entry end-to-end on a corpus planted with the
    divergent codepoints: Spark script_mix vs the entry's actual
    oracle SQL over the same parquet."""
    import __spark_entry__ as entry

    rows = [
        (0, "en", "hello world " + chr(0xA7C0) + chr(0xA7C2)),
        (1, "zh", "中文" + chr(0x9FFD) + chr(0x9FFF) + " latin"),
        (2, "ru", "привет " + chr(0x1E030) + "abc"),
        (3, "en", "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["lang"]): (r["n_chars"], r["latin_share"], r["han_share"], r["cyrillic_share"])
        for r in TX.script_mix(df).collect()
    }
    pq = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"create view documents as select * from read_parquet('{pq}')")
    sql = entry.oracle_sql()["script_mix_documents"]
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(sql).fetchall()
    }
    assert out == want
