"""Data-independent cross-engine CANARY entries (r13 — VERDICT task 1).

Two rounds of driver-red text queries could not be reproduced locally
(three committed scales green, the judge's independent re-run green),
so the r12 verdict ordered instrumentation instead of guesses: tiny
registry entries computing over PLANTED LITERALS — no corpus
dependence — one per engine primitive the oracle pairs rely on, each
with a constant known-answer oracle. The driver's green/red vector
across these entries then NAMES the primitive (or harness seam) that
diverges in the driver environment.

Root cause, found while building these (tools/dtype_audit.py): the
four r12 reds are exactly the four window entries whose oracle's
FINAL output columns are raw HUGEINT ``sum()``s — duckdb's fetchdf
materializes HUGEINT as float64, Spark returns int64, the local
comparator's Python ``==`` is int/float tolerant (600 == 600.0) but a
value-hash is not. The differential pair ``canary_sum_cast`` /
``canary_sum_raw`` proves or refutes that channel AT THE DRIVER:
identical values, one oracle casts the HUGEINT to BIGINT, one does
not. sum_cast green + sum_raw red confirms the dtype channel;
both green means the driver comparator tolerates the dtype and the
r12 reds had a different cause.

Design: every canary row carries BOTH directions —

- ``s_*`` columns are COMPUTED by Spark and embedded as LITERALS in
  the oracle SQL (probing the Spark engine against the pinned truth);
- ``o_*`` columns are literals on the Spark side and COMPUTED by
  DuckDB in the oracle (probing the oracle engine).

Truths are derived at import time from pure-Python models of each
pinned law (``re`` with explicit classes, ``unicodedata``,
``hashlib``) — deterministic, engine-free. A canary goes red the
moment EITHER engine in the driver environment stops agreeing with
the law the repo's oracle pairs assume.

Primitives covered (PLANS.md §24 registry + the aggregate-dtype seam
found this round): HUGEINT-sum materialization, pinned whitespace
split, pinned Unicode script ranges, ASCII-only case translate, ASCII
word boundary, codepoint reverse + NFC, length/octet_length, md5 +
hash-split arithmetic, the exact HALF-UP rounding law + native round,
integer div/pmod shapes, string group/distinct/sort collation, and
one deliberately data-dependent corpus digest (regex/case/split-free)
that distinguishes "driver corpus differs" from "driver engine
differs".
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import text as TX

__all__ = ["CANARIES", "canary_queries", "canary_oracles"]


# ---------------------------------------------------------------------
# shared truth helpers (pure Python models of the pinned laws)
# ---------------------------------------------------------------------

_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


def _sqlq(s: str) -> str:
    """DuckDB string literal: quote-double, keep raw UTF-8/controls.

    Control bytes inside a quoted literal are passed through verbatim
    by the parser, so planted \\x0B/\\f probes embed as raw bytes.
    """
    return "'" + s.replace("'", "''") + "'"


def _hash_bucket(s: str) -> int:
    """Python model of the repo's md5 hash-split BIGINT: first 15 hex
    digits of md5, mod 2^52 (the weighted_sample / hash_split law)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % 4503599627370496


def _tok_raw(s: str) -> list[str]:
    """Model of tokens() BEFORE the non-empty filter: trim spaces only
    (both engines' trim is space-only), then split on the pinned run.
    Java (limit -1), RE2 and Python all keep leading/trailing empty
    fields, so this is the shared raw-split law."""
    return _WS_RE.split(s.strip(" "))


def _tok(s: str) -> list[str]:
    return [t for t in _tok_raw(s) if t != ""]


# ---------------------------------------------------------------------
# C1/C2 — the HUGEINT-sum differential pair (the r12 root cause)
# ---------------------------------------------------------------------

_SUM_VALUES = [3, 1, 4, 1, 5, 9, 2, 6]  # fixed literals, sum 31


def _sum_spark(spark: SparkSession) -> DataFrame:
    arr = F.array(*[F.lit(v) for v in _SUM_VALUES])
    return (
        spark.range(1)
        .select(F.explode(arr).alias("x"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("x").cast("long").alias("total"),
        )
    )


def _sum_oracle(cast: bool) -> str:
    vals = ", ".join(f"({v})" for v in _SUM_VALUES)
    total = "CAST(sum(x) AS BIGINT)" if cast else "sum(x)"
    return (
        f"SELECT count(*) AS n_rows, {total} AS total "
        f"FROM (VALUES {vals}) t(x)"
    )


# ---------------------------------------------------------------------
# C3 — pinned whitespace split
# ---------------------------------------------------------------------

_WS_PROBES: list[tuple[str, str]] = [
    ("vt", "a\x0bb"),
    ("ff", "a\fb"),
    ("crlf", "a\r\nb"),
    ("tab_runs", "a \t  b\tc"),
    ("lead_tab", "\ta b"),
    ("trail_nl", "a b\n"),
    ("spaces_only", "   "),
    ("nbsp", "a\u00a0b"),
    ("ideographic", "a\u3000b"),
    ("zwsp", "a\u200bb"),
    ("nel", "a\u0085b"),
    ("fs", "a\u001cb"),
]


def _ws_truth() -> list[tuple[str, str, int, int, str]]:
    out = []
    for name, s in _WS_PROBES:
        raw = _tok_raw(s)
        toks = [t for t in raw if t != ""]
        out.append((name, s, len(raw), len(toks), "|".join(toks)))
    return out


def _ws_spark(spark: SparkSession) -> DataFrame:
    rows = _ws_truth()
    schema = T.StructType(
        [
            T.StructField("probe", T.StringType()),
            T.StructField("input", T.StringType()),
            T.StructField("o_n_raw", T.LongType()),
            T.StructField("o_n_tok", T.LongType()),
            T.StructField("o_toks", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    raw = TX.tokens(F.col("input"))
    toks = F.filter(raw, lambda t: t != "")
    return df.select(
        "probe",
        F.size(raw).cast("long").alias("s_n_raw"),
        F.size(toks).cast("long").alias("s_n_tok"),
        F.array_join(toks, "|").alias("s_toks"),
        "o_n_raw",
        "o_n_tok",
        "o_toks",
    ).orderBy("probe")


def _ws_oracle() -> str:
    vals = ",\n    ".join(
        f"({_sqlq(name)}, {_sqlq(s)}, {n_raw}, {n_tok}, {_sqlq(toks)})"
        for name, s, n_raw, n_tok, toks in _ws_truth()
    )
    run = TX.PINNED_WS_RUN
    return f"""
WITH p(probe, input, s_n_raw, s_n_tok, s_toks) AS (VALUES
    {vals}),
c AS (
  SELECT probe, s_n_raw, s_n_tok, s_toks,
         regexp_split_to_array(trim(input, ' '), '{run}') AS raw
  FROM p
)
SELECT probe, s_n_raw, s_n_tok, s_toks,
       CAST(len(raw) AS BIGINT) AS o_n_raw,
       CAST(len(list_filter(raw, t -> t <> '')) AS BIGINT) AS o_n_tok,
       -- coalesce: duckdb's array_to_string of an EMPTY list is NULL,
       -- Spark's array_join is '' (probed while building this canary)
       coalesce(array_to_string(list_filter(raw, t -> t <> ''), '|'), '') AS o_toks
FROM c ORDER BY probe
"""


# ---------------------------------------------------------------------
# C4 — pinned Unicode script ranges
# ---------------------------------------------------------------------

# One fixed codepoint sampler: in/out-of-range members of each pinned
# class, including Unicode-14/15 additions the pin EXCLUDES and astral
# members it INCLUDES.
_SCRIPT_SAMPLER = (
    # latin: A z U+00E9 (in); U+A7C0 (Unicode-14, OUT of pin); U+A7C5
    # (in); fullwidth J U+FF2A (in)
    "Az\u00e9\ua7c0\ua7c5\uff2a"
    # han: U+4E00 (in), U+9FFC (in, last pinned), U+9FFD (Unicode-14,
    # OUT), U+20000 astral (in)
    "\u4e00\u9ffc\u9ffd\U00020000"
    # cyrillic: U+0414 (in), U+1C80 (in), U+1E030 (Unicode-15, OUT)
    "\u0414\u1c80\U0001e030"
    # digits: ASCII 7 (in), arabic-indic U+0663 (OUT), fullwidth U+FF13 (OUT)
    "7\u0663\uff13"
    # noise: space, punct, ZWSP
    " .,\u200b"
)


def _in_ranges(cp: int, ranges) -> bool:
    return any(a <= cp <= b for a, b in ranges)


def _script_truth() -> tuple[int, int, int, int, int]:
    lat = sum(_in_ranges(ord(c), TX._LATIN_RANGES) for c in _SCRIPT_SAMPLER)
    han = sum(_in_ranges(ord(c), TX._HAN_RANGES) for c in _SCRIPT_SAMPLER)
    cyr = sum(_in_ranges(ord(c), TX._CYRILLIC_RANGES) for c in _SCRIPT_SAMPLER)
    dig = sum("0" <= c <= "9" for c in _SCRIPT_SAMPLER)
    return (len(_SCRIPT_SAMPLER), lat, han, cyr, dig)


def _script_spark(spark: SparkSession) -> DataFrame:
    n, lat, han, cyr, dig = _script_truth()
    c = F.lit(_SCRIPT_SAMPLER)
    return spark.range(1).select(
        F.lit("sampler").alias("probe"),
        F.length(c).cast("long").alias("s_n"),
        F.regexp_count(c, F.lit(TX.PINNED_LATIN_CLASS)).cast("long").alias("s_latin"),
        F.regexp_count(c, F.lit(TX.PINNED_HAN_CLASS)).cast("long").alias("s_han"),
        F.regexp_count(c, F.lit(TX.PINNED_CYRILLIC_CLASS)).cast("long").alias("s_cyrillic"),
        F.regexp_count(c, F.lit("[0-9]")).cast("long").alias("s_digit"),
        F.lit(n).cast("long").alias("o_n"),
        F.lit(lat).cast("long").alias("o_latin"),
        F.lit(han).cast("long").alias("o_han"),
        F.lit(cyr).cast("long").alias("o_cyrillic"),
        F.lit(dig).cast("long").alias("o_digit"),
    )


def _script_oracle() -> str:
    n, lat, han, cyr, dig = _script_truth()
    s = _sqlq(_SCRIPT_SAMPLER)
    return f"""
SELECT 'sampler' AS probe,
       {n} AS s_n, {lat} AS s_latin, {han} AS s_han,
       {cyr} AS s_cyrillic, {dig} AS s_digit,
       CAST(length({s}) AS BIGINT) AS o_n,
       CAST(len(regexp_extract_all({s}, '{TX.PINNED_LATIN_CLASS}')) AS BIGINT) AS o_latin,
       CAST(len(regexp_extract_all({s}, '{TX.PINNED_HAN_CLASS}')) AS BIGINT) AS o_han,
       CAST(len(regexp_extract_all({s}, '{TX.PINNED_CYRILLIC_CLASS}')) AS BIGINT) AS o_cyrillic,
       CAST(len(regexp_extract_all({s}, '[0-9]')) AS BIGINT) AS o_digit
"""


# ---------------------------------------------------------------------
# C5 — ASCII-only case translate
# ---------------------------------------------------------------------

_CASE_PROBES: list[tuple[str, str]] = [
    ("ascii", "Hello WORLD xyz"),
    ("turkish", "\u0130stanbul I\u0131"),
    ("eszett", "stra\u00dfe GROSS"),
    ("greek", "\u03a3\u03c3\u03c2 SIGMA"),
    ("mixed", "\u00c9cole \u00e9COLE"),
]

_ASCII_TR_LOWER = str.maketrans(TX.ASCII_UPPER, TX.ASCII_LOWER)
_ASCII_TR_UPPER = str.maketrans(TX.ASCII_LOWER, TX.ASCII_UPPER)


def _case_spark(spark: SparkSession) -> DataFrame:
    rows = [
        (name, s, s.translate(_ASCII_TR_LOWER), s.translate(_ASCII_TR_UPPER))
        for name, s in _CASE_PROBES
    ]
    schema = T.StructType(
        [
            T.StructField("probe", T.StringType()),
            T.StructField("input", T.StringType()),
            T.StructField("o_lower", T.StringType()),
            T.StructField("o_upper", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.select(
        "probe",
        TX.ascii_lower(F.col("input")).alias("s_lower"),
        TX.ascii_upper(F.col("input")).alias("s_upper"),
        "o_lower",
        "o_upper",
    ).orderBy("probe")


def _case_oracle() -> str:
    vals = ",\n    ".join(
        f"({_sqlq(name)}, {_sqlq(s)}, "
        f"{_sqlq(s.translate(_ASCII_TR_LOWER))}, "
        f"{_sqlq(s.translate(_ASCII_TR_UPPER))})"
        for name, s in _CASE_PROBES
    )
    return f"""
WITH p(probe, input, s_lower, s_upper) AS (VALUES
    {vals})
SELECT probe, s_lower, s_upper,
       {TX.ascii_lower_sql('input')} AS o_lower,
       {TX.ascii_upper_sql('input')} AS o_upper
FROM p ORDER BY probe
"""


# ---------------------------------------------------------------------
# C6 — ASCII word boundary (Java lookaround vs RE2 \b)
# ---------------------------------------------------------------------

_BOUNDARY_INPUT = "x123 é123 中123 _123 a123 123 1234 12x3"
_BOUNDARY_JAVA = TX._B + r"[0-9]{3}" + TX._E
_BOUNDARY_RE2 = r"\b[0-9]{3}\b"
# Python model of the ASCII-boundary law (lookarounds, like the Java
# spelling): matches after é, 中, space, start — not after/with ASCII
# word chars.
_BOUNDARY_TRUTH = len(
    re.findall(r"(?<![0-9A-Za-z_])[0-9]{3}(?![0-9A-Za-z_])", _BOUNDARY_INPUT)
)


def _boundary_spark(spark: SparkSession) -> DataFrame:
    return spark.range(1).select(
        F.lit("ascii_b").alias("probe"),
        F.regexp_count(F.lit(_BOUNDARY_INPUT), F.lit(_BOUNDARY_JAVA))
        .cast("long")
        .alias("s_n"),
        F.lit(_BOUNDARY_TRUTH).cast("long").alias("o_n"),
    )


def _boundary_oracle() -> str:
    return f"""
SELECT 'ascii_b' AS probe,
       {_BOUNDARY_TRUTH} AS s_n,
       CAST(len(regexp_extract_all({_sqlq(_BOUNDARY_INPUT)},
            '{_BOUNDARY_RE2}')) AS BIGINT) AS o_n
"""


# ---------------------------------------------------------------------
# C7 — codepoint reverse + NFC normalize
# ---------------------------------------------------------------------

_REV_PROBES: list[tuple[str, str]] = [
    ("plain", "abc"),
    ("decomposed", "e\u0301x"),
    ("astral", "a\U0001d11eb"),
    ("precomposed", "no\u00ebl"),
]

_NFC_PROBES: list[tuple[str, str]] = [
    ("compose", "e\u0301"),
    ("reorder", "q\u0307\u0323"),
    ("ligature", "\ufb01x"),
    ("stable", "\u00e9d\u00e9j\u00e0"),
]


def _rev_nfc_spark(spark: SparkSession) -> DataFrame:
    @F.pandas_udf(T.StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize("NFC", t))

    rows = [
        (name, "rev", s, s[::-1])
        for name, s in _REV_PROBES
    ] + [
        (name, "nfc", s, unicodedata.normalize("NFC", s))
        for name, s in _NFC_PROBES
    ]
    schema = T.StructType(
        [
            T.StructField("probe", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("input", T.StringType()),
            T.StructField("o_out", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.select(
        "probe",
        "op",
        F.when(F.col("op") == "rev", F.reverse(F.col("input")))
        .otherwise(_nfc(F.col("input")))
        .alias("s_out"),
        "o_out",
    ).orderBy("op", "probe")


def _rev_nfc_oracle() -> str:
    # codepoint reverse in DuckDB: str_split('') yields CODEPOINTS
    # (probed; DuckDB's native reverse() is grapheme-cluster based,
    # which is exactly the divergence the pin routes around)
    rows = [
        (name, "rev", s, s[::-1]) for name, s in _REV_PROBES
    ] + [
        (name, "nfc", s, unicodedata.normalize("NFC", s))
        for name, s in _NFC_PROBES
    ]
    vals = ",\n    ".join(
        f"({_sqlq(name)}, {_sqlq(op)}, {_sqlq(s)}, {_sqlq(out)})"
        for name, op, s, out in rows
    )
    return f"""
WITH p(probe, op, input, s_out) AS (VALUES
    {vals})
SELECT probe, op, s_out,
       CASE WHEN op = 'rev'
            THEN array_to_string(list_reverse(str_split(input, '')), '')
            ELSE nfc_normalize(input) END AS o_out
FROM p ORDER BY op, probe
"""


# ---------------------------------------------------------------------
# C8 — length / octet_length
# ---------------------------------------------------------------------

_LEN_PROBES: list[tuple[str, str]] = [
    ("ascii", "abc"),
    ("two_byte", "\u00e9"),
    ("three_byte", "\u4e2d"),
    ("four_byte", "\U0001d11e"),
    ("combining", "e\u0301"),
    ("zwj_family", "\U0001f468\u200d\U0001f469\u200d\U0001f467"),
    ("empty", ""),
]


def _len_spark(spark: SparkSession) -> DataFrame:
    rows = [
        (name, s, len(s), len(s.encode("utf-8"))) for name, s in _LEN_PROBES
    ]
    schema = T.StructType(
        [
            T.StructField("probe", T.StringType()),
            T.StructField("input", T.StringType()),
            T.StructField("o_chars", T.LongType()),
            T.StructField("o_bytes", T.LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.select(
        "probe",
        F.length("input").cast("long").alias("s_chars"),
        F.octet_length("input").cast("long").alias("s_bytes"),
        "o_chars",
        "o_bytes",
    ).orderBy("probe")


def _len_oracle() -> str:
    vals = ",\n    ".join(
        f"({_sqlq(name)}, {_sqlq(s)}, {len(s)}, {len(s.encode('utf-8'))})"
        for name, s in _LEN_PROBES
    )
    return f"""
WITH p(probe, input, s_chars, s_bytes) AS (VALUES
    {vals})
SELECT probe, s_chars, s_bytes,
       CAST(length(input) AS BIGINT) AS o_chars,
       CAST(strlen(input) AS BIGINT) AS o_bytes
FROM p ORDER BY probe
"""


# ---------------------------------------------------------------------
# C9 — md5 + hash-split arithmetic
# ---------------------------------------------------------------------

_MD5_PROBES: list[tuple[str, str]] = [
    ("empty", ""),
    ("ascii", "abc"),
    ("multibyte", "é中"),
    ("ws_mix", "a b\tc"),
]


def _md5_spark(spark: SparkSession) -> DataFrame:
    rows = [
        (name, s, hashlib.md5(s.encode("utf-8")).hexdigest(), _hash_bucket(s))
        for name, s in _MD5_PROBES
    ]
    schema = T.StructType(
        [
            T.StructField("probe", T.StringType()),
            T.StructField("input", T.StringType()),
            T.StructField("o_md5", T.StringType()),
            T.StructField("o_bucket", T.LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.select(
        "probe",
        F.md5(F.col("input")).alias("s_md5"),
        F.pmod(
            F.conv(F.substring(F.md5(F.col("input")), 1, 15), 16, 10).cast("long"),
            F.lit(4503599627370496),
        )
        .cast("long")
        .alias("s_bucket"),
        "o_md5",
        "o_bucket",
    ).orderBy("probe")


def _md5_oracle() -> str:
    vals = ",\n    ".join(
        f"({_sqlq(name)}, {_sqlq(s)}, "
        f"{_sqlq(hashlib.md5(s.encode('utf-8')).hexdigest())}, {_hash_bucket(s)})"
        for name, s in _MD5_PROBES
    )
    return f"""
WITH p(probe, input, s_md5, s_bucket) AS (VALUES
    {vals})
SELECT probe, s_md5, s_bucket,
       md5(input) AS o_md5,
       ('0x' || substr(md5(input), 1, 15))::BIGINT % 4503599627370496 AS o_bucket
FROM p ORDER BY probe
"""


# ---------------------------------------------------------------------
# C10 — rounding: the exact HALF-UP law + native round on doubles
# ---------------------------------------------------------------------

# (probe, num, den): exact rationals whose round-to-9 lands on a .5
# tie — the class where native double rounding is engine-divergent
# and the pinned law (operators/_rounding.py) is exact.
_TIE_PROBES: list[tuple[str, int, int]] = [
    ("tie_up", 3, 2_000_000_000),       # 1.5e-9 -> 2e-9 half-up
    ("tie_big", 24_691_358_025, 10_000_000_000),  # 2.4691358025: tie at digit 9
    ("plain", 1, 3),                     # non-tie: 0.333333333
    ("neg", -3, 2_000_000_000),          # -1.5e-9 -> -2e-9 half-up (away from zero)
]


def _round_truth(num: int, den: int, digits: int = 9) -> float:
    scale = 10 ** digits
    q = (2 * abs(num) * scale + den) // (2 * den)
    return (q if num >= 0 else -q) / scale


# native round probes on exact doubles (agreeing on both engines
# today; a driver engine change flips this canary). rd_negzero pins a
# probed SIGNED-ZERO divergence: Spark's round(-1e-10, 6) returns
# +0.0 while duckdb's returns -0.0 — equal under ==, DIFFERENT under
# any serializing value-hash, so each side carries its OWN truth here
# (the mirrored design allows it) and the repo-wide law is: never
# emit a round() of a possibly-tiny-negative without a signed-zero
# normalization (`+ 0.0` on both sides) — enforced by the repr pass
# of tools/dtype_audit.py.
_NATIVE_ROUND: list[tuple[str, float, int, float, float]] = [
    # (probe, x, digits, spark_truth, oracle_truth)
    ("rd_half", 2.5, 0, 3.0, 3.0),
    ("rd_neg", -2.5, 0, -3.0, -3.0),
    ("rd_exact", 0.125, 2, 0.13, 0.13),
    ("rd_negzero", -1e-10, 6, 0.0, -0.0),
]


def _round_spark(spark: SparkSession) -> DataFrame:
    from skylinemapreducehadoop_spark.operators._rounding import exact_round_div

    rows = [
        (name, num, den, _round_truth(num, den)) for name, num, den in _TIE_PROBES
    ]
    schema = T.StructType(
        [
            T.StructField("probe", T.StringType()),
            T.StructField("num", T.LongType()),
            T.StructField("den", T.LongType()),
            T.StructField("o_val", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    ties = exact_round_div(df, F.col("num"), F.col("den"), 9, "s_val").select(
        "probe", "s_val", "o_val"
    )
    native = [
        spark.range(1).select(
            F.lit(name).alias("probe"),
            F.round(F.lit(x), d).alias("s_val"),
            F.lit(o_truth).alias("o_val"),
        )
        for name, x, d, _s_truth, o_truth in _NATIVE_ROUND
    ]
    out = ties
    for n in native:
        out = out.unionByName(n)
    return out.orderBy("probe")


def _round_oracle() -> str:
    from skylinemapreducehadoop_spark.operators._rounding import oracle_round_div_sql

    tie_rows = ",\n    ".join(
        f"({_sqlq(name)}, {num}, {den}, CAST({_round_truth(num, den)!r} AS DOUBLE))"
        for name, num, den in _TIE_PROBES
    )
    native_rows = ",\n    ".join(
        f"({_sqlq(name)}, CAST({x!r} AS DOUBLE), {d}, CAST({s_truth!r} AS DOUBLE))"
        for name, x, d, s_truth, _o_truth in _NATIVE_ROUND
    )
    return f"""
WITH ties(probe, num, den, s_val) AS (VALUES
    {tie_rows}),
nat(probe, x, d, s_val) AS (VALUES
    {native_rows})
SELECT probe, s_val, {oracle_round_div_sql('num', 'den', 9)} AS o_val FROM ties
UNION ALL
SELECT probe, s_val, round(x, d::INTEGER) AS o_val FROM nat
ORDER BY probe
"""


# ---------------------------------------------------------------------
# C11 — integer division / pmod shapes (the vocab checkpoint math)
# ---------------------------------------------------------------------

# (probe, a, b): probes of `(a - pmod(a,b)) / b` (Spark) vs `a // b`
# (DuckDB) — the exact-floor-division idiom the registry's integer
# checkpoint math uses, on positives, negatives, and large magnitudes
# still inside the double-exact window the idiom requires.
_DIV_PROBES: list[tuple[str, int, int]] = [
    ("small", 7, 3),
    ("exact", 60, 10),
    ("neg_num", -7, 3),
    ("large", 4_000_000_000_000_000, 7),
    ("ckpt", 5999 * 10 + 6000 - 1, 6000),  # the vocab _ck shape at sf0.01 scale
]


def _trunc_div(a: int, b: int) -> int:
    """DuckDB's ``//`` TRUNCATES toward zero (probed: -7 // 3 = -2),
    unlike Python's / Spark's floor idiom (-3). The canary pins each
    engine to its OWN semantics — the law the repo's oracles rely on
    is that `//` is only ever applied to non-negative operands, where
    the two agree."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _div_spark(spark: SparkSession) -> DataFrame:
    # python // and % match Spark's floor-div idiom and pmod for b > 0
    rows = [(name, a, b, _trunc_div(a, b), a % b) for name, a, b in _DIV_PROBES]
    schema = T.StructType(
        [
            T.StructField("probe", T.StringType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("o_floordiv", T.LongType()),
            T.StructField("o_pmod", T.LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    a, b = F.col("a"), F.col("b")
    return df.select(
        "probe",
        ((a - F.pmod(a, b)) / b).cast("long").alias("s_floordiv"),
        F.pmod(a, b).cast("long").alias("s_pmod"),
        "o_floordiv",
        "o_pmod",
    ).orderBy("probe")


def _div_oracle() -> str:
    vals = ",\n    ".join(
        f"({_sqlq(name)}, {a}, {b}, {a // b}, {a % b})"
        for name, a, b in _DIV_PROBES
    )  # s_floordiv literal = Spark's FLOOR idiom (python //)
    # DuckDB % is truncating (sign of dividend); the repo's oracles
    # use the ((a % b) + b) % b twin where pmod semantics are needed.
    return f"""
WITH p(probe, a, b, s_floordiv, s_pmod) AS (VALUES
    {vals})
SELECT probe, s_floordiv, s_pmod,
       a // b AS o_floordiv,
       ((a % b) + b) % b AS o_pmod
FROM p ORDER BY probe
"""


# ---------------------------------------------------------------------
# C12 — string group / distinct / min / sort collation
# ---------------------------------------------------------------------

# token table probing binary string equality (precomposed vs
# decomposed é are DISTINCT), group-by + min, and codepoint-order
# sorting (incl. an astral-vs-U+FFFD pair where UTF-16 comparison
# would order differently from UTF-8/codepoint order).
_GROUP_ROWS: list[tuple[int, str]] = [
    (1, "b"),
    (2, "a"),
    (3, "a"),
    (4, "\u00e9"),
    (5, "e\u0301"),
    (6, "A"),
    (7, "z"),
    (8, "Z"),
    (9, "\u4e2d"),
    (10, "a"),
    (11, "\ufffd"),
    (12, "\U0001d11e"),
]


def _group_truth() -> tuple[int, str]:
    firsts: dict[str, int] = {}
    for i, tok in _GROUP_ROWS:
        firsts.setdefault(tok, i)
    # codepoint order == UTF-8 byte order (both engines' binary sort)
    parts = [f"{tok}:{firsts[tok]}" for tok in sorted(firsts)]
    return len(firsts), "|".join(parts)


def _group_spark(spark: SparkSession) -> DataFrame:
    n_distinct, concat = _group_truth()
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tok", T.StringType()),
        ]
    )
    df = spark.createDataFrame(_GROUP_ROWS, schema)
    g = df.groupBy("tok").agg(F.min("id").alias("first_id"))
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("s_n_distinct"),
        F.array_join(
            F.sort_array(F.collect_list(F.concat_ws(":", "tok", "first_id"))),
            "|",
        ).alias("s_concat"),
    ).select(
        F.lit("group").alias("probe"),
        "s_n_distinct",
        "s_concat",
        F.lit(n_distinct).cast("long").alias("o_n_distinct"),
        F.lit(concat).alias("o_concat"),
    )


def _group_oracle() -> str:
    n_distinct, concat = _group_truth()
    vals = ",\n    ".join(f"({i}, {_sqlq(tok)})" for i, tok in _GROUP_ROWS)
    return f"""
WITH p(id, tok) AS (VALUES
    {vals}),
g AS (SELECT tok, min(id) AS first_id FROM p GROUP BY tok),
s AS (SELECT tok || ':' || first_id AS kv FROM g)
SELECT 'group' AS probe,
       {n_distinct} AS s_n_distinct,
       {_sqlq(concat)} AS s_concat,
       (SELECT CAST(count(*) AS BIGINT) FROM g) AS o_n_distinct,
       (SELECT string_agg(kv, '|' ORDER BY kv) FROM s) AS o_concat
"""


# ---------------------------------------------------------------------
# C13 — corpus digest (deliberately data-dependent, primitive-free)
# ---------------------------------------------------------------------
# If every primitive canary above is green at the driver but the
# text-query entries stay red, the remaining hypotheses are (a) the
# driver corpus bytes differ from the committed testdata, or (b) a
# comparator seam. This digest isolates (a): no regex, no case
# mapping, no tokenization — just count / length / octet_length /
# md5-bucket sums over documents.text, all CAST to BIGINT.


def _digest_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skylinemapreducehadoop_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    # the bucket sum is folded mod 2^52 in exact DECIMAL: n_docs
    # buckets of < 2^52 each overflow a BIGINT beyond ~2k rows (caught
    # by the r13 sf0.1 sweep), and the digest only needs equality, not
    # magnitude
    bucket = F.pmod(
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        F.lit(4503599627370496),
    )
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length(t)).cast("long").alias("sum_chars"),
        F.sum(F.octet_length(t)).cast("long").alias("sum_bytes"),
        F.pmod(
            F.sum(bucket.cast("decimal(38,0)")),
            F.lit(4503599627370496).cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("bucket_digest"),
    )


_DIGEST_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS sum_chars,
       CAST(sum(strlen(coalesce(text, ''))) AS BIGINT) AS sum_bytes,
       CAST(sum(('0x' || substr(md5(coalesce(text, '')), 1, 15))::BIGINT
                % 4503599627370496)::HUGEINT
            % 4503599627370496 AS BIGINT) AS bucket_digest
FROM documents
"""


# ---------------------------------------------------------------------
# C14 — datetime conventions (below-window law canary, added late r13)
# ---------------------------------------------------------------------
# The repo's session pins spark.sql.session.timeZone=UTC and reads the
# nanos events timestamps via integer micros division, so every
# temporal oracle pair relies on: identical epoch-micros extraction,
# identical 'yyyy-MM-dd HH' formatting, the day-of-week convention
# bridge (Spark weekday() 0=Mon ... 6=Sun == DuckDB isodow - 1), and
# identical date_trunc + timestamp MATERIALIZATION (both sides
# isoformat to the same string through pandas). All probed on one
# planted literal (2024-03-10 01:30:45, a Sunday).

_DT_LIT = "2024-03-10 01:30:45"
_DT_EPOCH_US = 1710034245000000
_DT_HOUR_FMT = "2024-03-10 01"
_DT_WEEKDAY = 6  # Monday=0 convention; the probe date is a Sunday


def _dt_spark(spark: SparkSession) -> DataFrame:
    ts = F.to_timestamp(F.lit(_DT_LIT))
    return spark.range(1).select(
        F.lit("dt").alias("probe"),
        F.unix_micros(ts).alias("s_epoch_us"),
        F.date_format(ts, "yyyy-MM-dd HH").alias("s_hour_fmt"),
        F.weekday(ts).cast("long").alias("s_weekday"),
        F.date_trunc("hour", ts).alias("s_trunc_hour"),
        F.lit(_DT_EPOCH_US).alias("o_epoch_us"),
        F.lit(_DT_HOUR_FMT).alias("o_hour_fmt"),
        F.lit(_DT_WEEKDAY).cast("long").alias("o_weekday"),
        F.to_timestamp(F.lit("2024-03-10 01:00:00")).alias("o_trunc_hour"),
    )


_DT_ORACLE = f"""
SELECT 'dt' AS probe,
       {_DT_EPOCH_US} AS s_epoch_us,
       '{_DT_HOUR_FMT}' AS s_hour_fmt,
       CAST({_DT_WEEKDAY} AS BIGINT) AS s_weekday,
       TIMESTAMP '2024-03-10 01:00:00' AS s_trunc_hour,
       epoch_us(TIMESTAMP '{_DT_LIT}') AS o_epoch_us,
       strftime(TIMESTAMP '{_DT_LIT}', '%Y-%m-%d %H') AS o_hour_fmt,
       isodow(TIMESTAMP '{_DT_LIT}') - 1 AS o_weekday,
       date_trunc('hour', TIMESTAMP '{_DT_LIT}') AS o_trunc_hour
"""


# ---------------------------------------------------------------------
# C15 — DECIMAL materialization law (below-window, added late r13)
# ---------------------------------------------------------------------
# Raw DECIMAL output columns are FORBIDDEN by the repo's parity rules:
# Spark's toPandas materializes DecimalType as Python Decimal objects
# (normalized to scale-preserving strings, '3.75'), while duckdb 1.0's
# fetchdf materializes DECIMAL as float64 — a str-vs-float seam, the
# sibling of the HUGEINT one (PLANS.md section 26). Every oracle pair
# therefore ends a decimal-exact computation with ONE cast to DOUBLE
# (or BIGINT on a scaled-integer grid). This canary pins that closing
# step: an exact DECIMAL(38,2) sum, emitted through the mandated
# double/bigint casts on both sides.

_DEC_CENTS = [150, 225, 1000, 7]  # planted cents, sum 13.82


def _dec_spark(spark: SparkSession) -> DataFrame:
    arr = F.array(*[F.lit(c) for c in _DEC_CENTS])
    cents = (
        spark.range(1)
        .select(F.explode(arr).alias("c"))
        .select((F.col("c").cast("decimal(38,2)") / F.lit(100)).alias("v"))
    )
    total = sum(_DEC_CENTS)
    return cents.agg(
        F.lit("dec").alias("probe"),
        F.sum("v").cast("double").alias("s_total_dbl"),
        (F.sum("v") * F.lit(100)).cast("long").alias("s_total_cents"),
        F.lit(total / 100.0).alias("o_total_dbl"),
        F.lit(total).cast("long").alias("o_total_cents"),
    )


_DEC_ORACLE = f"""
SELECT 'dec' AS probe,
       CAST({sum(_DEC_CENTS) / 100.0!r} AS DOUBLE) AS s_total_dbl,
       CAST({sum(_DEC_CENTS)} AS BIGINT) AS s_total_cents,
       CAST(sum(v) AS DOUBLE) AS o_total_dbl,
       CAST(sum(v) * 100 AS BIGINT) AS o_total_cents
FROM (SELECT CAST(c AS DECIMAL(38,2)) / 100 AS v
      FROM (VALUES {", ".join(f"({c})" for c in _DEC_CENTS)}) t(c))
"""


# ---------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------

def _no_sf(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: ARG001
        return fn(spark)

    wrapped.__name__ = fn.__name__
    return wrapped


#: name -> (queries() callable, oracle SQL string)
CANARIES: dict = {
    "canary_sum_cast": (_no_sf(_sum_spark), _sum_oracle(cast=True)),
    "canary_sum_raw": (_no_sf(_sum_spark), _sum_oracle(cast=False)),
    "canary_ws_split": (_no_sf(_ws_spark), _ws_oracle()),
    "canary_script_ranges": (_no_sf(_script_spark), _script_oracle()),
    "canary_case_fold": (_no_sf(_case_spark), _case_oracle()),
    "canary_word_boundary": (_no_sf(_boundary_spark), _boundary_oracle()),
    "canary_reverse_nfc": (_no_sf(_rev_nfc_spark), _rev_nfc_oracle()),
    "canary_len_bytes": (_no_sf(_len_spark), _len_oracle()),
    "canary_md5_hash": (_no_sf(_md5_spark), _md5_oracle()),
    "canary_round_law": (_no_sf(_round_spark), _round_oracle()),
    "canary_int_arith": (_no_sf(_div_spark), _div_oracle()),
    "canary_group_sort": (_no_sf(_group_spark), _group_oracle()),
    "canary_corpus_digest": (_digest_spark, _DIGEST_ORACLE),
    # below-window law canaries (late r13): data-independent, so
    # scale-invariant — attested by LOCALCHECK, rotated into a window
    # only if a pinned law changes (rule 2)
    "canary_datetime": (_no_sf(_dt_spark), _DT_ORACLE),
    "canary_decimal": (_no_sf(_dec_spark), _DEC_ORACLE),
}


def canary_queries() -> dict:
    return {name: fn for name, (fn, _) in CANARIES.items()}


def canary_oracles() -> dict:
    return {name: sql for name, (_, sql) in CANARIES.items()}
