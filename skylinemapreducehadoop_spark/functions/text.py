"""Text-analysis functions for large-scale document pipelines.

All hot-path computations are JVM-side column expressions
(``pyspark.sql.functions``) so they stay inside whole-stage codegen and
never cross the Python boundary — at 100 TB a per-row Python UDF here
would dominate the job. The only Python-side piece is the language-ID
scorer, which is an Arrow-batched pandas UDF over small broadcast
profiles.

The reference engine has no text surface (it is a numeric skyline
engine); these operators extend it toward the training-data-pipeline
north star: token statistics, quality scoring, fingerprinting,
language ID.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# THE repo-wide whitespace-tokenization law, pinned to ONE explicit
# character class (r11 verdict task 1). History: tokens() used Java's
# `\s+` on the Spark side while every DuckDB oracle hand-embedded
# `'\s+'` — but the two engines disagree on the class: Java's \s is
# [ \t\n\x0B\f\r] while RE2 (DuckDB's regex engine) defines \s as
# [\t\n\f\r ] — NO vertical tab. A corpus containing \x0B therefore
# tokenizes differently per engine (the r11 driver-red pair
# vocab_growth_documents / strip_boilerplate_documents). The fix is to
# never trust an engine's \s again: both sides split on this explicit
# run, which Java regex, RE2, and Python `re` all parse identically.
# Unicode whitespace (NBSP U+00A0, IDEOGRAPHIC SPACE U+3000, ZWSP
# U+200B) is deliberately NOT a separator — same as Java \s today, so
# Spark-side behavior (and every committed LOCALCHECK hash) is
# bit-identical; only the oracle side changes on exotic corpora.
PINNED_WS_CHARS = " \\t\\n\\x0B\\f\\r"  # literal backslash escapes
PINNED_WS_RUN = f"[{PINNED_WS_CHARS}]+"

# Python-side twin (pandas UDF word splitting in bpe_encode): the SAME
# class, compiled — Python str.split() would additionally break on
# NBSP etc., violating the law.
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")

# ---------------------------------------------------------------------
# Pinned Unicode SCRIPT classes (the second engine-divergent regex
# class after \s): Java's \p{IsLatin}/\p{IsHan}/\p{IsCyrillic} follow
# the JDK's Unicode tables (JDK 17 = Unicode 13.0) while DuckDB's RE2
# ships newer tables (Unicode 15+), so codepoints added in Unicode
# 14/15 — e.g. U+A7C0 LATIN CAPITAL LETTER OLD POLISH O, U+9FFD-9FFF
# Han, U+1E030+ Cyrillic Extended-D — match in the oracle but not in
# Spark. Same fix as PINNED_WS_RUN: both engines get the EXPLICIT
# range class below, extracted from JDK 17's own behavior by
# tools/pin_scripts.py (a full 0..0x10FFFF enumeration through Spark's
# regexp_count), so the Spark side is bit-identical to the historical
# \p{IsXxx} and only the oracle side narrows to match. Range
# endpoints are law-tested against both engines in
# tests/test_script_law.py.
# ---------------------------------------------------------------------
_LATIN_RANGES: tuple = (
    (0x41, 0x5A), (0x61, 0x7A), (0xAA, 0xAA), (0xBA, 0xBA),
    (0xC0, 0xD6), (0xD8, 0xF6), (0xF8, 0x2B8), (0x2E0, 0x2E4),
    (0x1D00, 0x1D25), (0x1D2C, 0x1D5C), (0x1D62, 0x1D65),
    (0x1D6B, 0x1D77), (0x1D79, 0x1DBE), (0x1E00, 0x1EFF),
    (0x2071, 0x2071), (0x207F, 0x207F), (0x2090, 0x209C),
    (0x212A, 0x212B), (0x2132, 0x2132), (0x214E, 0x214E),
    (0x2160, 0x2188), (0x2C60, 0x2C7F), (0xA722, 0xA787),
    (0xA78B, 0xA7BF), (0xA7C2, 0xA7CA), (0xA7F5, 0xA7FF),
    (0xAB30, 0xAB5A), (0xAB5C, 0xAB64), (0xAB66, 0xAB69),
    (0xFB00, 0xFB06), (0xFF21, 0xFF3A), (0xFF41, 0xFF5A),
)
_HAN_RANGES: tuple = (
    (0x2E80, 0x2E99), (0x2E9B, 0x2EF3), (0x2F00, 0x2FD5),
    (0x3005, 0x3005), (0x3007, 0x3007), (0x3021, 0x3029),
    (0x3038, 0x303B), (0x3400, 0x4DBF), (0x4E00, 0x9FFC),
    (0xF900, 0xFA6D), (0xFA70, 0xFAD9), (0x16FF0, 0x16FF1),
    (0x20000, 0x2A6DD), (0x2A700, 0x2B734), (0x2B740, 0x2B81D),
    (0x2B820, 0x2CEA1), (0x2CEB0, 0x2EBE0), (0x2F800, 0x2FA1D),
    (0x30000, 0x3134A),
)
_CYRILLIC_RANGES: tuple = (
    (0x400, 0x484), (0x487, 0x52F), (0x1C80, 0x1C88),
    (0x1D2B, 0x1D2B), (0x1D78, 0x1D78), (0x2DE0, 0x2DFF),
    (0xA640, 0xA69F), (0xFE2E, 0xFE2F),
)


def _ranges_to_class(ranges) -> str:
    """Explicit regex character class from codepoint ranges, in the
    ``\\x{...}`` escape form Java regex and RE2 parse identically."""
    parts = []
    for a, b in ranges:
        parts.append(
            f"\\x{{{a:x}}}" if a == b else f"\\x{{{a:x}}}-\\x{{{b:x}}}"
        )
    return "[" + "".join(parts) + "]"


PINNED_LATIN_CLASS = _ranges_to_class(_LATIN_RANGES)
PINNED_HAN_CLASS = _ranges_to_class(_HAN_RANGES)
PINNED_CYRILLIC_CLASS = _ranges_to_class(_CYRILLIC_RANGES)

# ---------------------------------------------------------------------
# Pinned ASCII-only case mapping (the third engine-divergent primitive
# after \s and the script classes): Spark's lower()/upper() perform
# FULL Unicode case mapping (lower('İ') = 'i' + COMBINING DOT ABOVE,
# upper('ß') = 'SS', Greek final sigma) while DuckDB's utf8proc path
# does SIMPLE 1:1 mapping (lower('İ') = plain ASCII 'i', upper('ß') =
# 'ẞ') — so a corpus token like 'İT' lowercases to the English marker
# word 'it' in the oracle but not in Spark, and head_upper('ß...')
# differs outright. Where a cross-engine-compared value needs case
# folding, BOTH sides use the ASCII-only translate below: identical to
# both engines' native mapping on ASCII text (committed hashes stand),
# and a no-op on everything else. Law-tested in tests/test_case_law.py.
# ---------------------------------------------------------------------
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_LOWER_TABLE = str.maketrans(ASCII_UPPER, ASCII_LOWER)


def ascii_lower(col: Column | str) -> Column:
    """ASCII-only lowercase (pinned cross-engine case law)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_UPPER, ASCII_LOWER)


def ascii_upper(col: Column | str) -> Column:
    """ASCII-only uppercase (pinned cross-engine case law)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_LOWER, ASCII_UPPER)


def ascii_lower_sql(expr: str) -> str:
    """The DuckDB twin of :func:`ascii_lower` for oracle SQL."""
    return f"translate({expr}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


def ascii_upper_sql(expr: str) -> str:
    """The DuckDB twin of :func:`ascii_upper` for oracle SQL."""
    return f"translate({expr}, '{ASCII_LOWER}', '{ASCII_UPPER}')"


def pin_ws_oracle(sql: str) -> str:
    """Route a DuckDB oracle SQL string through the pinned whitespace
    law: every `'\\s+'` tokenizer literal is rewritten to the explicit
    PINNED_WS_RUN class, and any other bare `\\s` is rejected loudly.

    This is the single shared oracle-side tokenizer (the rounding
    law's ``oracle_round_div_sql`` pattern applied to whitespace):
    oracle authors keep writing the readable `'\\s+'`, and this helper
    guarantees what DuckDB actually executes is the same class Spark
    splits on, instead of RE2's \\s (which lacks \\x0B).
    """
    pinned = sql.replace(r"'\s+'", f"'{PINNED_WS_RUN}'")
    if r"\s" in pinned:
        raise ValueError(
            "oracle SQL contains a bare \\s outside the \"'\\s+'\" "
            "tokenizer literal — engine-divergent whitespace class; "
            f"use PINNED_WS_RUN explicitly: {pinned[:200]!r}"
        )
    return pinned

# Small multilingual stopword marker lists for the n-gram/marker
# language heuristic. Public common-word lists; intentionally tiny —
# the scorer is a cheap heuristic, not a model.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por", "con", "para"),
    "fr": ("le", "la", "les", "des", "une", "est", "dans", "pour", "que", "sur"),
}

# Default English stopword subset used by the quality scorer.
DEFAULT_STOPWORDS: tuple[str, ...] = ("the", "a", "an", "of", "to", "and", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization: split on runs of whitespace after trim.

    Splits on PINNED_WS_RUN — the explicit class identical to Java's
    \\s (so behavior is unchanged vs the historical `\\s+`), pinned so
    the DuckDB oracle twin (``pin_ws_oracle``) provably splits on the
    same characters.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), PINNED_WS_RUN)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def ngrams(col: Column | str, k: int = 2) -> Column:
    """Word k-grams (NON-distinct, in order) as an array<string> — pure
    JVM expression, no UDF. Fewer than k tokens yields an empty array.

    The token array is bound to a lambda variable (via a one-element
    ``transform``) before the per-position loop: higher-order functions
    are interpreted and re-evaluate their lambda body per element, so
    referencing the raw ``split`` expression inside the inner lambda
    would re-tokenize the document once per gram position (O(n^2) regex
    work per row)."""

    def _grams(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n >= F.lit(k),
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokens(col)), _grams), 1)


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits on whitespace AND at
    letter/digit/punctuation boundaries — a cheap deterministic stand-in
    for a BPE tokenizer's token count (regex, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    # whitespace alternatives use the pinned class, not the Java-only \s
    pieces = F.split(
        F.trim(c),
        PINNED_WS_RUN
        + r"|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])"
        + f"|(?=[^\\w{PINNED_WS_CHARS}])",
    )
    return F.size(F.filter(pieces, lambda p: p != F.lit("")))


def stopword_count(col: Column | str, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    """Count of tokens that are stopwords (JVM-side array filter)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic 60-bit content fingerprint as a BIGINT.

    First 15 hex chars of md5 over UTF-8 bytes — stable across engines
    (DuckDB: ``('0x' || substr(md5(text), 1, 15))::BIGINT``), so exact
    dedup / change detection can be cross-checked by any SQL engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


#: polynomial rolling-hash parameters (order-sensitive fingerprint)
_ROLL_B = 1_000_003
_ROLL_M = (1 << 31) - 1


def rolling_fingerprint(col: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``h = fold(tokens, 0, (acc, t) -> (acc*B + h60(t)) mod M)``.

    Pure JVM ``aggregate`` over the token array (no UDF) with md5-based
    60-bit token hashes, so the identical fold is expressible in ANSI
    SQL (DuckDB ``list_reduce``) for cross-engine verification. Unlike
    ``doc_fingerprint`` (whole-text md5), token *order* changes the
    value but intervening whitespace does not.
    """
    tok_hash = lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 15), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(_ROLL_B) + tok_hash(t)) % F.lit(_ROLL_M),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_cols: Sequence[str] = ("doc_id",)) -> DataFrame:
    """Per-document token statistics — one narrow projection, no shuffle.

    Integer-valued outputs only, so results are bit-exact reproducible
    on any engine (no float division).
    """
    t = F.col(text_col)
    return df.select(
        *id_cols,
        F.length(t).cast("long").alias("n_chars_calc"),
        token_count(t).cast("long").alias("n_tokens"),
        distinct_token_count(t).cast("long").alias("n_distinct_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_subword_tokens"),
        stopword_count(t).cast("long").alias("n_stopwords"),
        F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")).cast("long").alias("n_punct"),
        doc_fingerprint(t).alias("fingerprint"),
    )


def quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    *,
    min_tokens: int = 10,
    max_stopword_pct: int = 50,
    max_punct_pct: int = 20,
) -> DataFrame:
    """Gopher-style quality gates as integer-threshold booleans.

    All comparisons are integer arithmetic (``n * 100 >= pct * total``)
    — no float ratios, so the flags are engine-exact and cheap.
    """
    t = F.col(text_col)
    n_tok = token_count(t).cast("long")
    n_stop = stopword_count(t).cast("long")
    n_punct = F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")).cast("long")
    n_chars = F.length(t).cast("long")
    return df.select(
        *id_cols,
        n_tok.alias("n_tokens"),
        (n_tok >= F.lit(min_tokens)).alias("len_ok"),
        (n_stop * 100 <= F.lit(max_stopword_pct) * n_tok).alias("stopword_ok"),
        (n_punct * 100 <= F.lit(max_punct_pct) * n_chars).alias("punct_ok"),
        (
            (n_tok >= F.lit(min_tokens))
            & (n_stop * 100 <= F.lit(max_stopword_pct) * n_tok)
            & (n_punct * 100 <= F.lit(max_punct_pct) * n_chars)
        ).alias("quality_ok"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 2,
) -> DataFrame:
    """Per-document token-repetition metrics — the C4/Gopher-style
    "most common n-gram" quality signal for training-data curation.

    Output (one row per document with at least one k-gram; shorter
    documents have no gram distribution to measure):
    ``(doc_id, n_grams, n_distinct_grams, top_gram_count, top_gram)``.
    A high ``top_gram_count / n_grams`` ratio marks boilerplate or
    degenerate repetition. Ties on the top gram break deterministically
    (highest count, then lexicographically LAST gram — the struct-max
    order), so results are engine-exact.

    Plan shape: explode k-grams → (doc, gram) hash aggregate → per-doc
    hash aggregate. Both aggregates run partial+final (map-side
    combine), the shuffle key (doc, gram) bounds skew by document size,
    and nothing crosses the Python boundary.
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ngrams(text_col, k)).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("__top"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_distinct_grams").cast("long").alias("n_distinct_grams"),
            F.col("__top.cnt").cast("long").alias("top_gram_count"),
            F.col("__top.gram").alias("top_gram"),
        )
    )


#: (name, Java pattern, replacement). The pinned BOUNDARY LAW: a PII
#: occurrence is delimited by ASCII word boundaries — adjacency to
#: [0-9A-Za-z_] blocks the match, anything else (including non-ASCII
#: letters) does not. RE2's ``\b`` IS that ASCII boundary, so the
#: DuckDB oracle keeps the readable ``\b`` spelling; Java's ``\b`` is
#: Unicode-aware (it treats é/ﬁ/中 as word characters, so "中555-123-
#: 4567" silently escapes redaction), so the Spark side spells the
#: SAME semantic with explicit ASCII lookarounds — zero-width, hence
#: count- and replacement-identical to the oracle's ``\b``.
#: Law-tested in tests/test_case_law.py. Beyond the boundary, the
#: bodies avoid every construct the engines disagree on (no backrefs
#: in patterns, no engine \w/\s/\d surprises — all classes explicit).
_B = r"(?<![0-9A-Za-z_])"  # Java spelling of RE2's leading \b
_E = r"(?![0-9A-Za-z_])"  # Java spelling of RE2's trailing \b
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", _B + r"\d{3}[-.]\d{3}[-.]\d{4}" + _E, "<PHONE>"),
    ("ipv4", _B + r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}" + _E, "<IPV4>"),
)

#: The RE2/DuckDB spellings of the same pinned patterns (``\b`` is
#: ASCII-word-based in RE2, which is exactly the law).
PII_PATTERNS_SQL: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Scrub common PII shapes (emails, phone numbers, IPv4 addresses)
    from a text column — a standard pre-training curation pass.

    Chained JVM ``regexp_replace`` (whole-stage codegen, no UDF, no
    shuffle) with per-category match counts. Replacement order is
    email → phone → ipv4 so an address inside an email never
    double-matches. Patterns are deliberately RE2-compatible so any
    SQL engine can reproduce the output bit-for-bit.
    """
    t = F.col(text_col)
    redacted = t
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, rep)
    return df.select(*id_cols, *counts, redacted.alias("redacted"))


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: marker-word voting with a byte-ratio CJK
    check. Fully batch-vectorized — the non-ASCII gate is a JVM column
    expression (``octet_length`` vs ``char_length``: each non-ASCII char
    costs ≥1 extra UTF-8 byte, CJK costs 2), and the marker scorer is
    one vectorized ``Series.str.count`` per language inside an
    Arrow-batched pandas UDF (no per-row Python function).

    Returns ``df`` plus ``out_col``. Unknown/ambiguous → 'en' (ties are
    broken by marker-list order), non-ASCII-heavy → 'zh'.
    """
    # One whitespace-bounded alternation regex per language. The
    # boundaries use the PINNED whitespace class, not \S: Python's \s
    # is Unicode-aware (NBSP, U+3000 count as whitespace) while the
    # oracle tokenizes on the pinned ASCII run — so "x the" must
    # NOT count as a marker hit on either side. "(?<![^...])" reads
    # "preceded by pinned whitespace or start of string".
    _not_ws = "[^ \\t\\n\\x0b\\f\\r]"
    lang_patterns = {
        lang: f"(?<!{_not_ws})(?:" + "|".join(markers) + f")(?!{_not_ws})"
        for lang, markers in _LANG_MARKERS.items()
    }

    @F.pandas_udf(T.StringType())
    def marker_vote(texts: pd.Series) -> pd.Series:
        # ASCII-only lowercase (the pinned case law): Python's full
        # str.lower() maps 'İ' to 'i'+combining-dot while DuckDB's
        # simple lower() maps it to plain 'i' — which IS the marker
        # word 'it' when followed by 't'. ASCII translate is identical
        # on both engines and a no-op outside A-Z.
        sl = texts.fillna("").str.translate(_ASCII_LOWER_TABLE)
        hits = pd.DataFrame({lang: sl.str.count(pat) for lang, pat in lang_patterns.items()})
        # idxmax returns the FIRST max column → ties break by dict
        # (marker-list) order, 'en' first
        return hits.idxmax(axis=1)

    t = F.col(text_col)
    extra_bytes = F.octet_length(t) - F.char_length(t)  # ≈ 2×(CJK chars)
    non_ascii_heavy = extra_bytes * 3 > F.char_length(t) * 2
    return df.withColumn(
        out_col,
        F.when(t.isNull() | (F.char_length(t) == 0), F.lit("en"))
        .when(non_ascii_heavy, F.lit("zh"))
        .otherwise(marker_vote(t)),
    )


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window token chunking — the context-window packing step
    of a training/RAG pipeline. Emits one row per chunk: ``id_cols`` +
    ``chunk_id`` (0-based), ``chunk_text`` (space-joined), and
    ``n_chunk_tokens``.

    Chunks start every ``size - overlap`` tokens, so consecutive chunks
    share ``overlap`` tokens; the final chunk may be short. Pure JVM
    expression (sequence → transform → slice → posexplode) — no UDF, no
    shuffle, and the token array is lambda-bound once per row so the
    tokenizer never re-runs per chunk (the interpreted-HOF pitfall, see
    ``ngrams``).
    """
    if overlap < 0 or overlap >= size:
        raise ValueError(f"need 0 <= overlap < size, got overlap={overlap} size={size}")
    stride = size - overlap

    def _chunks(t: Column) -> Column:
        n = F.size(t)
        starts = F.sequence(
            F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride)
        )
        return F.transform(starts, lambda s: F.concat_ws(" ", F.slice(t, s + 1, size)))

    arr = F.element_at(F.transform(F.array(tokens(text_col)), _chunks), 1)
    exploded = df.select(
        *id_cols, F.posexplode(arr).alias("chunk_id", "chunk_text")
    )
    return exploded.select(
        *id_cols,
        "chunk_id",
        "chunk_text",
        F.size(F.split("chunk_text", PINNED_WS_RUN)).alias("n_chunk_tokens"),
    )


def token_entropy(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits) —
    the repetition/diversity quality signal (low entropy = boilerplate,
    keyword stuffing).

    Uses ``H = log2(n) − Σ c·log2(c) / n`` with the Σ computed as a
    sequential fold over the ASCENDING-sorted count list: floating-point
    addition is order-sensitive, and a ``SUM()`` over a shuffled group
    would make the result partitioning-dependent. The sorted fold makes
    the value bit-exact reproducible on any engine/layout (DuckDB:
    ``list_reduce`` over ``list_sort``).

    Shape: explode → two hash aggregations (both map-side combined);
    the collect_list is per-document distinct counts — bounded by
    vocabulary, not corpus.
    """
    ids = list(id_cols)
    tok = df.select(*ids, F.explode(tokens(text_col)).alias("__tok"))
    cnt = tok.groupBy(*ids, "__tok").agg(F.count("*").alias("__c"))
    per_doc = cnt.groupBy(*ids).agg(
        F.sum("__c").alias("__n"),
        F.count("*").alias("n_token_types"),
        F.sort_array(F.collect_list("__c")).alias("__cs"),
    )
    n_dbl = F.col("__n").cast("double")
    slogs = F.aggregate(
        "__cs",
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log2(c.cast("double")),
    )
    return per_doc.select(
        *ids,
        F.col("__n").alias("n_tokens"),
        "n_token_types",
        # rounded to 6 decimals: JVM and C libm log2 disagree by 1 ulp
        # on some inputs, so the raw double is not cross-engine
        # hashable; 1e-6 precision is far beyond what a quality signal
        # needs and a 1e-15 ulp gap cannot straddle a 1e-6 boundary
        F.round(F.log2(n_dbl) - slogs / n_dbl, 6).alias("token_entropy"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Assign documents to fixed-token-budget training packs — the
    sequence-packing step that turns a curated corpus into training
    shards (documents are concatenated in pack order and split at
    ``budget``-token boundaries downstream).

    Documents are first routed to ``n_shards`` deterministic
    content-hash shards (so packing parallelizes — one global ordering
    would serialize through a single window task at 100 TB), then
    packed within each shard in ``id_col`` order by cumulative token
    count: ``pack_id = shard * 2^40 + floor(tokens_before / budget)``.
    Everything is integer arithmetic over one window per shard —
    deterministic, engine-exact, partitioning-independent.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(text_col).cast("binary")), 1, 15), 16, 10
    ).cast("long")
    shard = F.pmod(h, F.lit(n_shards)).alias("shard")
    toks = token_count(text_col).cast("long").alias("n_tokens")
    base = df.select(F.col(id_col), shard, toks)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    # exact long floor-division: (n - n % b) / b — a double quotient's
    # floor can misround at bin boundaries for non-power-of-two budgets
    packs = ((before - F.pmod(before, F.lit(budget))) / F.lit(budget)).cast("long")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        (F.col("shard") * F.lit(1 << 40) + packs).alias("pack_id"),
    )


def unigram_logprob(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the language-model quality proxy (a cheap
    stand-in for the perplexity filters used in web-corpus curation):
    very negative = rare-token soup, near zero = repetitive boilerplate.

    ``avg lp = (Σ_w c_w · log2 g_w) / n − log2 N`` where ``g_w`` is the
    corpus count of token w and N the corpus token total. All log2
    arguments are INTEGERS (counts), never ratios, and the Σ is a
    sequential fold over the ascending-sorted term list — both choices
    make the float result bit-exact reproducible across engines and
    cluster layouts (see ``token_entropy``).

    Shape: two hash aggregations + one equi-join on token + a per-doc
    fold; the corpus-total is a 1-row broadcast.
    """
    ids = list(id_cols)
    tok = df.select(*ids, F.explode(tokens(text_col)).alias("__tok"))
    doc_cnt = tok.groupBy(*ids, "__tok").agg(F.count("*").alias("__c"))
    glob = doc_cnt.groupBy("__tok").agg(F.sum("__c").alias("__g"))
    total = glob.agg(F.sum("__g").alias("__N"))
    term = (
        F.col("__c").cast("double") * F.log2(F.col("__g").cast("double"))
    ).alias("__term")
    per_doc = (
        # shuffle_hash: glob is vocabulary-sized (see bigram_logprob)
        doc_cnt.join(glob.hint("shuffle_hash"), "__tok")
        .select(*ids, "__c", term)
        .groupBy(*ids)
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sort_array(F.collect_list("__term")).alias("__ts"),
        )
    )
    fold = F.aggregate("__ts", F.lit(0.0), lambda acc, t: acc + t)
    return per_doc.crossJoin(F.broadcast(total)).select(
        *ids,
        "n_tokens",
        # rounded for cross-engine hashability (see token_entropy)
        F.round(
            fold / F.col("n_tokens").cast("double")
            - F.log2(F.col("__N").cast("double")),
            6,
        ).alias("avg_token_logprob"),
    )


def bigram_logprob(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-document mean BIGRAM log-probability under the corpus's own
    add-one-smoothed bigram model — one step up from
    :func:`unigram_logprob` on the perplexity-filter ladder (CCNet-
    style quality filtering trains an n-gram LM on the corpus or a
    reference corpus and drops high-perplexity documents; public
    technique). Word-salad that passes a unigram filter (common words,
    random order) scores poorly here.

    ``avg lp = (Σ_b c_b · (log2(C_b + 1) − log2(C_ctx + V))) / n`` per
    document, where ``C_b`` is the corpus count of bigram b, ``C_ctx``
    the corpus count of its first word AS A CONTEXT (= Σ of bigram
    counts starting with it), ``V`` the distinct-unigram vocabulary
    size (add-one denominator), and ``c_b``/``n`` the document's
    bigram counts/total. Both log2 arguments are INTEGERS and the Σ is
    a sorted sequential fold — the same bit-exactness rules as
    ``unigram_logprob``/``token_entropy`` (round(6) at the libm edge).

    Shape: three hash aggregations (doc-bigram, corpus-bigram, context)
    + two equi-joins + a per-doc fold; V rides as a 1-row broadcast.
    Documents with fewer than 2 tokens have no bigrams and are absent
    from the output.
    """
    ids = list(id_cols)
    bg = df.select(*ids, F.explode(ngrams(text_col, 2)).alias("__bg"))
    doc_cnt = bg.groupBy(*ids, "__bg").agg(F.count("*").alias("__c"))
    glob = doc_cnt.groupBy("__bg").agg(F.sum("__c").alias("__c12"))
    ctx = glob.groupBy(
        F.split(F.col("__bg"), " ")[0].alias("__w1")
    ).agg(F.sum("__c12").alias("__c1"))
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("__tok"))
        .agg(F.count_distinct("__tok").alias("__v"))
    )
    term = (
        F.col("__c").cast("double")
        * (
            F.log2((F.col("__c12") + 1).cast("double"))
            - F.log2((F.col("__c1") + F.col("__v")).cast("double"))
        )
    ).alias("__term")
    # shuffle_hash pins: glob/ctx are VOCABULARY-sized aggregates — a
    # compile-time size misestimate must never auto-broadcast a corpus
    # vocabulary (the repo-wide r5 rule); AQE still broadcasts a side
    # it measures small at runtime
    per_doc = (
        doc_cnt.join(glob.hint("shuffle_hash"), "__bg")
        .withColumn("__w1", F.split(F.col("__bg"), " ")[0])
        .join(ctx.hint("shuffle_hash"), "__w1")
        .crossJoin(F.broadcast(vocab))
        .select(*ids, "__c", term)
        .groupBy(*ids)
        .agg(
            F.sum("__c").alias("n_bigrams"),
            F.sort_array(F.collect_list("__term")).alias("__ts"),
        )
    )
    fold = F.aggregate("__ts", F.lit(0.0), lambda acc, t: acc + t)
    return per_doc.select(
        *ids,
        "n_bigrams",
        F.round(fold / F.col("n_bigrams").cast("double"), 6).alias(
            "avg_bigram_logprob"
        ),
    )


def build_vocab(
    df: DataFrame,
    *,
    text_col: str = "text",
    max_size: int = 30_000,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: the ``max_size`` most frequent tokens as
    (token, token_id, count), ids 1..max_size in (count DESC, token
    ASC) order — id 0 is reserved for OOV/padding. Deterministic under
    any partitioning (total order with the token as tiebreak).

    Shape: one hash aggregate over the exploded tokens (map-side
    combined), then orderBy+limit — Spark executes that as TakeOrdered
    (per-partition top-k heaps), so the full vocabulary is never
    sorted or collected; the final row_number window runs on at most
    ``max_size`` rows (bounded by construction, not by data).
    """
    if max_size < 1:
        raise ValueError(f"max_size must be >= 1, got {max_size}")
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .where(F.col("count") >= min_count)
    )
    top = counts.orderBy(F.desc("count"), F.col("token")).limit(max_size)
    w = Window.orderBy(F.desc("count"), F.col("token"))
    return top.withColumn("token_id", F.row_number().over(w)).select(
        "token", "token_id", "count"
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    text_col: str = "text",
) -> DataFrame:
    """Encode documents to token-id sequences against a ``build_vocab``
    table — the final tokenize-and-numericalize step before training
    shards. OOV tokens map to id 0.

    Shape: posexplode → broadcast join on the (bounded) vocab →
    per-doc re-assembly via sorted collect_list; one shuffle on the
    doc id. Output: (id_cols..., n_tokens, n_oov, token_ids) with
    ``token_ids`` a '-'-joined string of ids in document order
    (string form keeps the row hashable across engines).
    """
    ids = list(id_cols)
    tok = df.select(
        *ids, F.posexplode(tokens(text_col)).alias("pos", "token")
    )
    joined = tok.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(*ids, "pos", F.coalesce("token_id", F.lit(0)).alias("tid"))
    return joined.groupBy(*ids).agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("long")).alias("n_oov"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"].cast("string"),
            ),
            "-",
        ).alias("token_ids"),
    )


#: large odd multiplier (Knuth's 2654435761) and a prime modulus — a
#: fixed pseudo-random projection standing in for trained weights with
#: the same compute shape (broadcast-free: the "model" is arithmetic)
_CLS_MULT = 2654435761
_CLS_MOD = 10007


def classifier_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Linear-model document scoring via the hashing trick — the
    fastText-style quality-classifier pass of an LLM data pipeline
    (score every document against a linear model over hashed token
    features; cf. the CCNet/GPT-3 quality filters — public technique),
    with a deterministic weight table so it is oracle-checkable.

    Feature bucket: 60-bit md5 token hash (reproducible in ANSI SQL)
    mod 10007. Weight per bucket: ((bucket * 2654435761) mod 10007) -
    5003 — INTEGER, so the per-document sum is exact and order-free
    (no float-summation nondeterminism across partitionings/engines).
    score = sum / (n_tokens * 5003) in [-1, 1]; prob = sigmoid(score)
    rounded to 6 decimals (libm rule — see token_entropy).

    Entirely JVM-side: one explode + one map-side-combined sum per
    doc. A real trained model drops in by replacing the arithmetic
    weight with a broadcast join on a (bucket, weight) table — the
    plan shape (and its 100 TB behavior) is identical.
    """
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(text_col)).alias("__tok"),
    )
    # 60-bit md5 hash, same construction as dedup.simhash's token hash
    h60 = F.conv(
        F.substring(F.md5(F.col("__tok").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    bucket = h60 % F.lit(_CLS_MOD)
    weight = (bucket * F.lit(_CLS_MULT)) % F.lit(_CLS_MOD) - F.lit(_CLS_MOD // 2)
    agg = tok.groupBy("__id").agg(
        F.sum(weight).alias("__sw"), F.count("*").alias("n_tokens")
    )
    score = F.col("__sw").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(float(_CLS_MOD // 2))
    )
    return agg.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        score.alias("score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6).alias("prob"),
    )


def pmi_collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` collocations (adjacent word pairs) by pointwise mutual
    information — the classic corpus-linguistics signal (Church &
    Hanks, CL 1990) for multiword expressions; in LLM-data work it
    surfaces boilerplate phrases and candidate merge pairs.

    ``pmi = log2 P(w1,w2) / (P(w1)·P(w2))`` with all probabilities
    estimated from the bigram stream itself (c1 = occurrences as first
    word, c2 = as second word, N = total bigrams). Rewritten as
    ``(log2 c12 + log2 N) − (log2 c1 + log2 c2)`` so every log2
    argument is an INTEGER count (the repo's LM-scorer exactness rule;
    the product form c12·N would overflow int64 at corpus scale), the
    grouping is explicit, and round(6) lands at the libm edge. Ties
    rank deterministically by (w1, w2). ``min_count`` suppresses the
    unstable low-frequency tail (standard practice — PMI is maximized
    by hapax pairs).

    Shape: one bigram explode + three hash aggregates (pair, first,
    second) + two vocabulary-sized equi-joins (shuffle_hash-pinned) +
    TakeOrdered — no window over the data, no driver loop.
    """
    bg = df.select(F.explode(ngrams(text_col, 2)).alias("__bg")).select(
        F.split(F.col("__bg"), " ")[0].alias("w1"),
        F.split(F.col("__bg"), " ")[1].alias("w2"),
    )
    pairs = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = pairs.groupBy("w2").agg(F.sum("c12").alias("c2"))
    total = pairs.agg(F.sum("c12").alias("n_bigrams"))
    pmi = F.round(
        (F.log2(F.col("c12").cast("double")) + F.log2(F.col("n_bigrams").cast("double")))
        - (F.log2(F.col("c1").cast("double")) + F.log2(F.col("c2").cast("double"))),
        6,
    )
    return (
        pairs.where(F.col("c12") >= min_count)
        .join(c1.hint("shuffle_hash"), "w1")
        .join(c2.hint("shuffle_hash"), "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "c12", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def tfidf_keywords(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the classic keyword-
    extraction / document-tagging primitive. Returns
    ``(id, token, rank, score)`` with rank 1..k per document.

    Engine-exactness (the repo's LM-scorer rules): score =
    ``round(tf * (log2(N + 1) - log2(df_t)), 6)`` with BOTH log2
    arguments integers (N = corpus size, df_t = containing-doc count),
    so any engine computes bit-identical doubles; ranking compares the
    ROUNDED score with ties by token ascending.

    Plan shape for 100 TB: one corpus explode + (doc, token) hash
    aggregate (map-side combined); document frequencies are a
    vocabulary-sized aggregate OVER that tf table (no second corpus
    pass), joined back shuffle_hash-pinned (vocabulary is data-sized —
    never broadcast); the per-document top-k is one window rank
    partitioned by document — no global sort anywhere.
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    tf = tok.groupBy("id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(id_col).distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("tf").cast("double")
        * (
            F.log2((F.col("n_docs") + F.lit(1)).cast("double"))
            - F.log2(F.col("df_t").cast("double"))
        ),
        6,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("score").desc(), "token")
    return (
        tf.join(dfreq.hint("shuffle_hash"), "token")
        .crossJoin(F.broadcast(n_docs))
        .select("id", "token", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "token", "rank", "score")
    )


def _bpe_train_local(
    vocab: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """In-process BPE merge loop over a collected word-frequency table —
    byte-for-byte the same semantics as the distributed loop (adjacent
    positions counted with overlap, argmax ties by (left, right)
    ascending, left-to-right non-overlapping merge).

    Pair counts update INCREMENTALLY: each merge touches only the words
    that actually contain the chosen pair (classic subword-nmt
    trainer), with a lazy-invalidation heap for the argmax, so a
    realistic 32k-merge budget runs in seconds instead of scheduling
    two Spark jobs per merge (~10^5 jobs of pure scheduler overhead).
    """
    import heapq
    from collections import Counter

    words: list[list[str]] = [list(syms) for syms, _ in vocab]
    freqs: list[int] = [int(f) for _, f in vocab]
    stats: Counter = Counter()
    index: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        f = freqs[i]
        for pair in zip(syms, syms[1:]):
            stats[pair] += f
            index.setdefault(pair, set()).add(i)
    # heap entries are (-count, pair); stale entries are discarded on
    # pop by checking the live count — ties break by pair ascending,
    # identical to the engine's orderBy(cnt desc, left, right)
    heap = [(-c, p) for p, c in stats.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, pair = heap[0]
            live = stats.get(pair, 0)
            if live <= 0 or -negc != live:
                heapq.heappop(heap)
                continue
            best = (pair, live)
            break
        if best is None:
            break
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        merged_sym = left + right
        for i in sorted(index.pop((left, right), ())):
            syms = words[i]
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged_sym
                else:
                    out.append(s)
            if out == syms:
                continue  # stale index entry — pair no longer present
            f = freqs[i]
            delta = Counter(zip(out, out[1:]))
            delta.subtract(Counter(zip(syms, syms[1:])))
            words[i] = out
            for pair, d in delta.items():
                if d == 0:
                    continue
                stats[pair] += d * f
                if stats[pair] <= 0:
                    del stats[pair]
                    continue
                index.setdefault(pair, set()).add(i)
                heapq.heappush(heap, (-stats[pair], pair))
        stats.pop((left, right), None)
    return merges


def bpe_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 20,
    end_of_word: str = "</w>",
    local_vocab_budget: int = 2_000_000,
) -> list[tuple[int, str, str, int]]:
    """Train byte-pair-encoding merges on a corpus (Sennrich, Haddow &
    Birch, "Neural Machine Translation of Rare Words with Subword
    Units", ACL 2016 — the classic tokenizer-training algorithm).
    Returns ``[(rank, left, right, pair_count), ...]`` — the merge
    table a tokenizer applies at encode time.

    Distributed shape: BPE trains on the WORD-FREQUENCY table, not the
    corpus — so after one corpus-sized explode + hash aggregate, every
    iteration runs on a vocabulary-sized frame. The vocabulary is
    ~10^6 rows at ANY corpus scale (word types, not tokens), so when it
    fits ``local_vocab_budget`` rows it is collected ONCE and the merge
    loop runs in-process with incremental pair counts
    (:func:`_bpe_train_local`) — a realistic 32k-merge budget is
    seconds of driver CPU, versus 2 scheduled Spark jobs per merge
    (~10^5 jobs) for the distributed loop. Both paths produce
    IDENTICAL merges (same counting, argmax and tie rules).

    Distributed overflow path (vocabulary above the budget): (1)
    adjacent symbol pairs exploded with the word's frequency as
    weight, ONE hash aggregate, (2) the argmax pair fetched via
    TakeOrdered-1 (ties broken by (left, right) — deterministic on any
    layout; the only driver state is one pair per round), (3) the pair
    merged inside every word's symbol array by a zero-UDF
    ``aggregate`` fold (left-to-right, non-overlapping — the reference
    semantics), localCheckpoint'ed so plan depth stays constant across
    rounds (the kmeans/pagerank iterative discipline). Words are
    char-split with a ``</w>`` terminator so merges never cross word
    boundaries.

    At 100 TB the corpus pass is the only data-sized stage either way;
    the local path then costs one vocabulary collect, the distributed
    path n_merges vocabulary shuffles.
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("__w"))
        .where(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count("*").alias("__f"))
        .select(
            F.concat(
                F.split(F.col("__w"), ""), F.array(F.lit(end_of_word))
            ).alias("syms"),
            "__f",
        )
    )
    words = words.localCheckpoint(eager=True)

    if words.count() <= local_vocab_budget:
        vocab = [(r["syms"], r["__f"]) for r in words.collect()]
        return _bpe_train_local(vocab, n_merges)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias(
                    "__p", "left"
                ),
                F.col("syms"),
                F.col("__f"),
            )
            .select(
                "left",
                F.element_at("syms", F.col("__p") + 2).alias("right"),
                "__f",
            )
            .groupBy("left", "right")
            .agg(F.sum("__f").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "left", "right").limit(1).collect()
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        merged_sym = left + right
        # left-to-right non-overlapping merge as a fold: state carries
        # the rebuilt array; when the incoming symbol completes the
        # pair with the array's last element, replace that element
        fold = F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (s == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged_sym))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        words = words.select(fold.alias("syms"), "__f").localCheckpoint(eager=True)
    return merges


def bpe_apply_word(
    syms: list[str], ranked: Sequence[tuple[str, str]]
) -> list[str]:
    """Apply a BPE merge table to one word's symbol list by repeatedly
    merging the LOWEST-ranked pair present (all its occurrences,
    left-to-right non-overlapping) until none remains — the reference
    tokenizer apply loop (subword-nmt / the common library shape),
    well-defined for ARBITRARY merge tables.

    For tables produced by BPE training — where every merged symbol is
    created by a lower rank than any merge consuming it — this equals
    replaying the table in rank order, i.e. exactly
    :func:`bpe_train`'s fold semantics, so encoding a training word
    reproduces the symbols the trainer ended with (property-tested
    against an independent rank-order replay in
    tests/test_bpe_encode.py). For a foreign table that violates that
    ordering (a low-ranked merge consuming a symbol only a higher rank
    creates), rank-order replay would silently no-op the early merge;
    lowest-rank-first applies it once its operands exist, matching the
    reference tokenizers. Per-word cost is independent of table size
    (~merges-applied x word length), where a full-table replay would
    scan all 32-50k ranks per word.
    """
    rank: dict[tuple[str, str], int] = {}
    for i, pair in enumerate(ranked):
        rank.setdefault((pair[0], pair[1]), i)
    syms = list(syms)
    while len(syms) > 1:
        best_r = None
        for a, b in zip(syms, syms[1:]):
            r = rank.get((a, b))
            if r is not None and (best_r is None or r < best_r):
                best_r = r
        if best_r is None:
            break
        left, right = ranked[best_r]
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Encode a corpus with a trained BPE merge table (the encode half
    of the Sennrich, Haddow & Birch ACL'16 tokenizer; :func:`bpe_train`
    produces the table). Adds ``out_col`` — ``array<string>`` of
    subword symbols per document, word boundaries marked by the
    ``end_of_word`` terminator symbol.

    Accepts merge rows in either ``(rank, left, right, pair_count)``
    form (bpe_train's output) or bare ``(left, right)`` pairs; per
    word the lowest-ranked present pair merges first
    (:func:`bpe_apply_word` — the reference tokenizer loop, equal to
    rank-order replay for any training-produced table).

    Distributed shape: the merge table is tokenizer-sized (32-50k
    entries at a realistic vocabulary) — it ships once per task inside
    the serialized UDF closure, never through a shuffle. Encoding is
    row-local, so the operator is map-only at ANY corpus scale: no
    exchange appears in the plan. The Python boundary is one
    Arrow-batched pandas UDF (tokenizer state machines are not
    expressible as JVM columns without materializing n_merges chained
    passes over the corpus); within each batch, words are memoized —
    under a Zipfian corpus a handful of word types dominates the token
    stream, so per-batch cost is ~distinct-words x merges-applied
    (independent of table size), not tokens x merges.
    """
    ranked: list[tuple[str, str]] = []
    for row in merges:
        t = tuple(row)
        if len(t) >= 3:
            ranked.append((int(t[0]), str(t[1]), str(t[2])))
        else:
            ranked.append((len(ranked), str(t[0]), str(t[1])))
    pairs = [(lft, r) for _, lft, r in sorted(ranked, key=lambda m: m[0])]
    eow = end_of_word

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            hit = memo.get(w)
            if hit is None:
                hit = memo[w] = bpe_apply_word(list(w) + [eow], pairs)
            return hit

        out = []
        for txt in texts:
            if txt is None:
                out.append(None)
                continue
            toks: list[str] = []
            # split with the SAME semantics as tokens() / bpe_train
            # (Java \s+ = ASCII whitespace only): Python str.split()
            # would additionally break on NBSP etc., producing word
            # boundaries at encode time that never existed at train
            # time and violating the train/encode round-trip
            for w in _ASCII_WS.split(txt):
                if w:
                    toks.extend(enc_word(w))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, _encode(F.col(text_col)))


def length_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    caps: Sequence[int] = (64, 128, 256, 512),
) -> DataFrame:
    """Sequence-length bucket planning for training batches: assign
    each document's token count to the smallest cap that holds it
    (documents longer than the largest cap go to that cap and are
    truncated) and report, per bucket, what a fixed-length batcher
    pays: (bucket_cap, n_docs, total_tokens, padding_tokens,
    truncated_tokens) where ``padding_tokens = cap - n`` summed over
    in-cap docs and ``truncated_tokens = n - cap`` summed over
    over-cap docs. The padding-waste readout is what decides bucket
    boundaries for throughput — the planning half of
    ``pack_sequences``.

    Scale shape: one whitespace-token count per row (JVM ``split``/
    ``size``, no UDF), a CASE ladder to the cap, one map-side-combined
    aggregate over |caps| groups. Zero joins, zero windows.
    """
    caps_sorted = sorted(set(int(c) for c in caps))
    if not caps_sorted or caps_sorted[0] < 1:
        raise ValueError("caps must be positive ints")
    n = F.size(tokens(F.col(text_col)))
    cap = F.lit(caps_sorted[-1])
    for c in reversed(caps_sorted[:-1]):
        cap = F.when(n <= F.lit(c), F.lit(c)).otherwise(cap)
    base = df.where(F.col(text_col).isNotNull()).select(
        cap.alias("bucket_cap"), n.alias("__n")
    )
    in_cap = F.col("__n") <= F.col("bucket_cap")
    return base.groupBy("bucket_cap").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n").alias("total_tokens"),
        F.sum(
            F.when(in_cap, F.col("bucket_cap") - F.col("__n")).otherwise(F.lit(0))
        ).alias("padding_tokens"),
        F.sum(
            F.when(~in_cap, F.col("__n") - F.col("bucket_cap")).otherwise(F.lit(0))
        ).alias("truncated_tokens"),
    )


def vocab_coverage(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-``vocab_size``
    corpus vocabulary (by token count, ties broken by token ascending
    — fully deterministic) and report per document how much of it
    falls OUT of vocabulary: (id, n_tokens, oov_tokens, oov_rate).
    The vocabulary-fit screen run before committing to a tokenizer:
    high OOV rate means character fallback and blown-up sequence
    lengths on exactly those documents.

    Scale shape: one token-count aggregate, a TakeOrdered top-k for
    the vocabulary (vocabulary-sized by contract — same shape as
    ``bpe_train``'s driver-local path), then one broadcast LEFT
    anti-style join back over the exploded tokens and a per-doc
    aggregate. Documents with no tokens report 0/0/0.0.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    ).where(F.col("__t") != "")
    counts = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    # top-k via TakeOrdered (per-partition heaps + driver merge of
    # k x partitions rows): deterministic under the (count desc,
    # token asc) total order
    vocab_rows = counts.orderBy(F.desc("__c"), F.asc("__t")).limit(vocab_size)
    vocab = vocab_rows.select(F.col("__t").alias("__v"), F.lit(True).alias("__in"))
    per_doc = (
        toks.join(F.broadcast(vocab), toks["__t"] == vocab["__v"], "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("oov_tokens"),
        )
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("oov_tokens", F.lit(0)).alias("oov_tokens"),
            F.round(
                F.coalesce("oov_tokens", F.lit(0))
                / F.greatest(F.coalesce("n_tokens", F.lit(0)), F.lit(1)).cast(
                    "double"
                ),
                9,
            ).alias("oov_rate"),
        )
    )


def vocab_growth(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoints: int = 10,
) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: at each of ``checkpoints``
    corpus prefixes — prefix k is all docs with ``id <= floor(max_id *
    k / checkpoints)`` — report how many docs/tokens the prefix holds
    and how many DISTINCT tokens have appeared. Plotting n_vocab vs
    n_tokens on log-log gives the Heaps exponent; a flattening curve
    is the standard "corpus is saturating / duplicated" diagnostic
    that complements zipf_fit.

    The trick that makes this one pass instead of ``checkpoints``
    scans: a token is in prefix k iff its FIRST occurrence (min doc
    id) is, so ``min(id) per token`` + mapping each first-seen id to
    its earliest checkpoint + a cumulative sum over the
    ``checkpoints``-row frame reproduces every prefix's distinct
    count without ever re-scanning the corpus. Same for doc/token
    totals via per-doc counts. The only wide ops are the token
    min-aggregate (tokens shuffle once, map-side combined) and two
    windows over <= ``checkpoints`` rows (bounded frames, the
    limit-frame exemption). Returns (k, cutoff_id, n_docs, n_tokens,
    n_vocab) sorted by k.
    """
    if checkpoints < 1:
        raise ValueError("need checkpoints >= 1")
    k_lit = F.lit(checkpoints).cast("long")
    mx = df.agg(F.max(id_col).alias("__mx"))

    # earliest checkpoint containing id: ceil(k*id / max) in pure
    # integer arithmetic ((a + b - 1) div b), clamped to 1 — exact on
    # any engine, no float boundary cases
    def _ck(idc):
        a = idc.cast("long") * k_lit + F.col("__mx") - F.lit(1)
        exact_div = (a - F.pmod(a, F.col("__mx"))) / F.col("__mx")
        return F.greatest(exact_div, F.lit(1)).cast("int")

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).where(F.col("__tok") != "")
    first_seen = toks.groupBy("__tok").agg(F.min("__id").alias("__fs"))
    vocab_by_k = (
        first_seen.crossJoin(F.broadcast(mx))
        .groupBy(_ck(F.col("__fs")).alias("k"))
        .agg(F.count("*").alias("__nv"))
    )
    docs_by_k = (
        toks.groupBy("__id")
        .agg(F.count("*").alias("__nt"))
        .crossJoin(F.broadcast(mx))
        .groupBy(_ck(F.col("__id")).alias("k"))
        .agg(F.count("*").alias("__nd"), F.sum("__nt").alias("__ntk"))
    )
    ks = mx.select(
        F.explode(F.sequence(F.lit(1), F.lit(checkpoints))).alias("k"), "__mx"
    )
    cut = F.col("__mx") * F.col("k")
    ks = ks.select(
        "k", ((cut - F.pmod(cut, k_lit)) / k_lit).cast("long").alias("cutoff_id")
    )
    from pyspark.sql import Window

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ks.join(vocab_by_k, "k", "left")
        .join(docs_by_k, "k", "left")
        .select(
            "k",
            "cutoff_id",
            F.sum(F.coalesce("__nd", F.lit(0))).over(w).alias("n_docs"),
            F.sum(F.coalesce("__ntk", F.lit(0))).over(w).alias("n_tokens"),
            F.sum(F.coalesce("__nv", F.lit(0))).over(w).alias("n_vocab"),
        )
        .orderBy("k")
    )


def winnow_fingerprints(col: Column | str, *, gram_k: int = 3, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word ``gram_k``-gram,
    slide a ``window`` over the hash sequence, keep each window's
    minimum, dedup. Guarantees any shared run of ``gram_k + window - 1``
    tokens yields a shared fingerprint, at ~2/(window+1) the density of
    keeping every gram — the robust sublinear fingerprint set for
    plagiarism / near-dup screens.

    Gram hashes are md5-derived 60-bit longs (the cross-engine
    hash_split contract, reproducible in SQL), and everything runs as
    nested JVM array expressions — map-only, no UDF, no explode until
    the caller chooses to. Fewer grams than ``window`` degrades to one
    fingerprint (the global min); no grams yields an empty array.
    """
    if gram_k < 1 or window < 1:
        raise ValueError("need gram_k >= 1 and window >= 1")

    def _winnow(h: Column) -> Column:
        n = F.size(h)
        full = F.transform(
            F.sequence(F.lit(1), n - F.lit(window - 1)),
            lambda p: F.array_min(F.slice(h, p, window)),
        )
        return F.array_distinct(
            F.when(n >= window, full)
            .when(n > 0, F.array(F.array_min(h)))
            .otherwise(F.array().cast("array<bigint>"))
        )

    hashes = F.transform(
        ngrams(col, gram_k),
        lambda g: F.conv(F.substring(F.md5(g.cast("binary")), 1, 15), 16, 10).cast(
            "long"
        ),
    )
    return F.element_at(F.transform(F.array(hashes), _winnow), 1)


def vocab_budget(
    df: DataFrame,
    text_col: str = "text",
    *,
    targets: Sequence[tuple[int, int]] = ((50, 100), (90, 100), (95, 100), (99, 100)),
) -> DataFrame:
    """Tokenizer vocabulary budgeting: the smallest frequency-ranked
    vocabulary whose tokens cover at least each target fraction of
    the corpus' token OCCURRENCES — the planning query behind "how
    big does the vocab need to be for 99% coverage?" (the complement
    of :func:`vocab_coverage`, which scores a GIVEN vocabulary).

    Targets are exact rationals (num, den); the coverage test
    ``cum * den >= num * total`` clears the division, so boundaries
    are exact. Ranking ties (equal counts) break by token text — the
    same deterministic order as ``build_vocab``.

    Output: one row per target — (target_num, target_den, vocab_size,
    covered_tokens, total_tokens), with ``vocab_size`` = the minimal
    rank reaching the target and ``covered_tokens`` its cumulative
    count.

    Scale shape: one explode + map-side-combined count to the
    vocabulary frame, then the distributed prefix sum of
    ``stats.global_prefix_sum`` (range partition on (desc count,
    token), no single-partition window — the vocabulary is large
    enough at corpus scale that the abc_classify lesson applies), a
    1-row total broadcast, and one tiny aggregate per target.
    """
    from ..operators.stats import global_prefix_sum

    counts = (
        df.select(F.explode(tokens(text_col)).alias("__tok"))
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    ranked = global_prefix_sum(
        counts,
        [F.desc("__c"), F.asc("__tok")],
        "__c",
        out_col="__cum",
        rank_col="__rank",
    )
    tot = ranked.groupBy().agg(F.max("__cum").alias("__total"))
    j = ranked.crossJoin(F.broadcast(tot))
    rows = []
    for num, den in targets:
        hit = j.where(
            F.col("__cum") * F.lit(den) >= F.lit(num) * F.col("__total")
        ).agg(
            F.lit(num).alias("target_num"),
            F.lit(den).alias("target_den"),
            F.min("__rank").alias("vocab_size"),
            F.min_by(F.col("__cum"), F.col("__rank")).cast("long").alias(
                "covered_tokens"
            ),
            F.max("__total").cast("long").alias("total_tokens"),
        )
        rows.append(hit)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def normalize_nfc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unicode NFC normalization pass — the canonicalization step a
    multilingual corpus runs before dedup/tokenization (the same
    grapheme can arrive precomposed U+00E9 or decomposed U+0065
    U+0301; hash-based dedup and vocab counting treat them as
    different documents/tokens unless normalized first).

    Returns (id, clean_text, changed) for EVERY input row; ``changed``
    marks rows whose bytes differed. NULL text passes through as NULL
    with changed = false.

    Implementation: Python's unicodedata.normalize('NFC') in an
    Arrow-batched pandas UDF — the JVM has no NFC expression, and NFC
    is a pure per-row byte map, so this is the documented acceptable
    UDF case (vectorized batch transfer, map-only plan, no shuffle).
    The normalization tables are fixed by the Unicode version; both
    CPython and DuckDB implement the same canonical composition, so
    the pass is oracle-checkable.
    """
    import unicodedata

    @F.pandas_udf(T.StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    out = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__t"),
    ).withColumn("clean_text", _nfc(F.col("__t")))
    return out.select(
        F.col("id").alias(id_col),
        "clean_text",
        F.coalesce(
            F.col("clean_text") != F.col("__t"), F.lit(False)
        ).alias("changed"),
    )


# Mojibake (encoding-damage) artifact classes. Each is a literal
# alternation, identical bytes in the engine regex and the DuckDB
# oracle regex, so both count the same occurrences:
# - LATIN1: UTF-8 accented Latin letters decoded as Latin-1/cp1252
#   ("é" C3 A9 -> "Ã©") — the most common double-encoding signature.
# - PUNCT: UTF-8 smart punctuation decoded as cp1252 ("’" E2 80 99 ->
#   "â€™"; guillemets C2 AB/BB -> "Â«"/"Â»"). Only artifacts whose
#   cp1252 rendering is fully printable are listed (no C1 controls in
#   the pattern).
# - REPL: U+FFFD, the decoder's own damage marker.
MOJIBAKE_LATIN1 = "Ã©|Ã¨|Ã¤|Ã¶|Ã¼|Ã±|Ã§|Ã¡|Ã³|Ãº"
MOJIBAKE_PUNCT = "â€™|â€œ|â€“|â€”|â€¦|Â«|Â»"
MOJIBAKE_REPL = "�"


def encoding_artifacts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    flag_min: int = 3,
) -> DataFrame:
    """Mojibake / encoding-damage screen — the ftfy-shaped corpus
    hygiene pass: count the classic UTF-8-decoded-as-Latin-1 artifact
    digraphs ("Ã©"), cp1252 smart-punctuation trigraphs ("â€™"), and
    U+FFFD replacement characters per document, and flag documents
    with at least ``flag_min`` artifacts as mojibake. Web-crawl
    corpora carry a measurable rate of double-encoded pages; training
    on them teaches the model the damage, so pipelines screen (or
    route to a repair pass) before tokenization.

    Returns one row per input row: (id, n_chars, n_latin1, n_punct,
    n_repl, n_artifacts, per_10k, is_mojibake), ``per_10k`` the
    artifact rate per 10k chars rounded to 9. Pure JVM plan — three
    ``regexp_count`` expressions over literal alternations, map-only,
    no shuffle, no UDF; at 100 TB this is a free rider on whatever
    scan already reads the text column.
    """
    n_chars = F.length(F.col(text_col))
    n_latin1 = F.regexp_count(F.col(text_col), F.lit(MOJIBAKE_LATIN1))
    n_punct = F.regexp_count(F.col(text_col), F.lit(MOJIBAKE_PUNCT))
    n_repl = F.regexp_count(F.col(text_col), F.lit(MOJIBAKE_REPL))
    total = (n_latin1 + n_punct + n_repl).alias("n_artifacts")
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_latin1.cast("long").alias("n_latin1"),
        n_punct.cast("long").alias("n_punct"),
        n_repl.cast("long").alias("n_repl"),
        (n_latin1 + n_punct + n_repl).cast("long").alias("n_artifacts"),
        F.round(
            F.lit(10000.0)
            * (n_latin1 + n_punct + n_repl).cast("double")
            / n_chars.cast("double"),
            9,
        ).alias("per_10k"),
        ((n_latin1 + n_punct + n_repl) >= F.lit(flag_min)).alias(
            "is_mojibake"
        ),
    )


def corpus_budget_stats(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language byte/char/token budget profile — the numbers a
    token-budget plan is built from (how many UTF-8 bytes buy a char,
    how many chars buy a whitespace token, in each language): n_docs,
    total chars, total UTF-8 bytes, total whitespace tokens, and the
    derived ratios bytes_per_char, chars_per_token, tokens_per_doc
    (each rounded to 9). CJK languages show bytes_per_char near 3 and
    very long "tokens"; Latin-script languages sit near 1 — the ratio
    table is what converts a byte-sized crawl into a token-sized
    training budget per language.

    Tokenization is the repo-wide whitespace rule (``tokens()``,
    Java ``\\s+`` after trim — the oracle mirrors it with
    ``regexp_split_to_array``). One hash aggregate over (lang); every
    per-row quantity (length, octet_length, size(split)) is a JVM
    expression, so the plan is scan -> partial agg -> one slim
    exchange of |langs| rows. No UDF, no window.
    """
    per = df.select(
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        F.octet_length(F.col(text_col)).cast("long").alias("__bytes"),
        token_count(F.col(text_col)).cast("long").alias("__toks"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__chars").alias("n_chars"),
        F.sum("__bytes").alias("n_bytes"),
        F.sum("__toks").alias("n_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_chars",
        "n_bytes",
        "n_tokens",
        F.round(
            F.col("n_bytes").cast("double") / F.col("n_chars").cast("double"),
            9,
        ).alias("bytes_per_char"),
        F.round(
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
            9,
        ).alias("chars_per_token"),
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_docs").cast("double"),
            9,
        ).alias("tokens_per_doc"),
    )


def fix_mojibake(col: Column | str) -> Column:
    """Repair UTF-8-decoded-as-Latin-1 damage (the artifact family
    :func:`encoding_artifacts` detects): re-encode the damaged string
    as Latin-1 — bijective char<=0xFF -> byte, recovering the original
    UTF-8 byte stream exactly — then decode it as UTF-8. Pure JVM
    ``decode(encode(c, 'ISO-8859-1'), 'UTF-8')``, zero UDF, map-only.

    ONLY apply to rows the detector flagged: mojibake text contains
    exclusively chars <= U+00FF (it was produced by a Latin-1 decode),
    so the repair is lossless there; applied to CLEAN text with real
    non-Latin-1 characters (CJK, emoji) the Latin-1 encode RAISES
    (Spark 4 ``MALFORMED_CHARACTER_CODING`` — fail-fast, never silent
    corruption) — gate on ``is_mojibake`` first, as the registry
    known-answer check does. The round-trip inverse law
    ``fix(damage(t)) == t`` for every t is the oracle-checked property
    (``fix_mojibake_check``) and holds for ALL text including CJK,
    because damage = bytes-as-Latin-1 is itself injective.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.decode(F.encode(c, "ISO-8859-1"), "UTF-8")


def script_mix(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Unicode-script composition per language tag — script is not
    language: a 'zh'-tagged shard full of Latin letters is a labeling
    or extraction bug, romanized/transliterated content surfaces here,
    and cross-shard boilerplate leakage shows up as off-script mass.
    Per language: total chars plus the share of Latin / Han / Cyrillic
    script characters and ASCII digits (each rounded to 9).

    Pure JVM ``regexp_count`` over the PINNED script classes (explicit
    codepoint ranges identical on Java regex and RE2 — engine-native
    ``\\p{IsLatin}`` vs ``\\p{Latin}`` disagree on Unicode-14/15
    additions; see the pin block above) plus one hash aggregate:
    map-only until the |langs|-row exchange.
    """
    c = F.col(text_col)
    per = df.select(
        F.col(lang_col).alias("lang"),
        F.length(c).cast("long").alias("__n"),
        F.regexp_count(c, F.lit(PINNED_LATIN_CLASS)).cast("long").alias("__lat"),
        F.regexp_count(c, F.lit(PINNED_HAN_CLASS)).cast("long").alias("__han"),
        F.regexp_count(c, F.lit(PINNED_CYRILLIC_CLASS))
        .cast("long")
        .alias("__cyr"),
        F.regexp_count(c, F.lit("[0-9]")).cast("long").alias("__dig"),
    )
    agg = per.groupBy("lang").agg(
        F.sum("__n").alias("n_chars"),
        F.sum("__lat").alias("__lat"),
        F.sum("__han").alias("__han"),
        F.sum("__cyr").alias("__cyr"),
        F.sum("__dig").alias("__dig"),
    )
    share = lambda col: F.round(  # noqa: E731
        F.col(col).cast("double") / F.col("n_chars").cast("double"), 9
    )
    return agg.select(
        "lang",
        "n_chars",
        share("__lat").alias("latin_share"),
        share("__han").alias("han_share"),
        share("__cyr").alias("cyrillic_share"),
        share("__dig").alias("digit_share"),
    )


def line_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher/C4-style LINE-level quality statistics — the rule family
    that operates on a document's line structure rather than its token
    stream (Rae et al. 2021 §A1.1: drop docs with too many bullet
    lines or ellipsis-terminated lines; C4: line-level boilerplate):
    per document, the number of lines plus the fraction of bullet
    lines (starting ``- ``, ``* `` or ``• ``), ellipsis-terminated
    lines (``...`` or ``…``), and short lines (< 10 chars), each
    rounded to 9.

    Pure JVM plan: one ``split`` on newline + three higher-order
    ``filter``/``size`` expressions — map-only, no UDF, no shuffle;
    the DuckDB oracle mirrors with ``regexp_split_to_array`` +
    ``list_filter`` + ``starts_with``/``ends_with`` (identical
    semantics on literal prefixes/suffixes).
    """
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)

    def frac(pred) -> Column:
        return F.round(
            F.size(F.filter(lines, pred)).cast("double")
            / n_lines.cast("double"),
            9,
        )

    bullet = lambda l: (  # noqa: E731
        F.startswith(l, F.lit("- "))
        | F.startswith(l, F.lit("* "))
        | F.startswith(l, F.lit("• "))
    )
    ellipsis = lambda l: F.endswith(l, F.lit("...")) | F.endswith(  # noqa: E731
        l, F.lit("…")
    )
    short = lambda l: F.length(l) < F.lit(10)  # noqa: E731
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        frac(bullet).alias("bullet_frac"),
        frac(ellipsis).alias("ellipsis_frac"),
        frac(short).alias("short_frac"),
    )
