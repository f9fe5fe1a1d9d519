"""``SKYLINE OF`` SQL front-end.

The skyline literature's SQL surface (Börzsönyi, Kossmann & Stocker,
"The Skyline Operator", ICDE 2001) extends SELECT with

    SELECT ... FROM ... [WHERE ...]
    SKYLINE OF d1 [MIN|MAX|DIFF], d2 [MIN|MAX|DIFF], ...
    [ORDER BY ...] [LIMIT n]

The reference repo promises this query model (Readme.md:3-4) but only
ships fixed pipelines; SURVEY.md §4 rules out a Scala Catalyst
extension for this Python-native engine. This module closes the gap at
the STRING level instead: the ``SKYLINE OF`` clause is parsed out of
the statement, the remainder runs as plain ``spark.sql`` (so Catalyst
still owns scans, filters, pushdown for everything else), and the
clause becomes a call into the operator library — ``skyline`` for
MIN/MAX dims, ``skyline_by`` when DIFF dims partition the comparison
(the paper's semantics: rows differing on a DIFF attribute are
incomparable, i.e. a per-group skyline). Trailing ORDER BY / LIMIT
apply AFTER the skyline, matching the paper's clause order.

No new execution machinery: the rewrite is sugar over the same
physical plans the function API produces.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

from .operators.skyline import skyline, skyline_by

_SKYLINE_RE = re.compile(
    r"\bSKYLINE\s+OF\b(?P<dims>.*?)(?=\bORDER\s+BY\b|\bLIMIT\b|;|$)",
    re.IGNORECASE | re.DOTALL,
)
_DIM_RE = re.compile(
    r"^\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*(?P<dir>MIN|MAX|DIFF)?\s*$",
    re.IGNORECASE,
)
_ORDER_LIMIT_RE = re.compile(
    r"(?P<order>\bORDER\s+BY\b.*?)?\s*(?P<limit>\bLIMIT\s+\d+)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_skyline_clause(sql: str) -> tuple[str, list[tuple[str, str]], list[str], str]:
    """Split a statement into (core_sql, dims, diff_cols, tail_sql).

    ``core_sql`` is the statement with the SKYLINE OF clause and any
    trailing ORDER BY / LIMIT removed; ``dims`` are (column, min|max)
    pairs (MIN is the paper's default when the direction is omitted);
    ``diff_cols`` are the DIFF attributes; ``tail_sql`` is the
    trailing ORDER BY / LIMIT text ('' if absent).
    """
    m = _SKYLINE_RE.search(sql)
    if not m:
        raise ValueError("statement has no SKYLINE OF clause")
    # string-level rewrite guard: a match inside a quoted literal (e.g.
    # WHERE note = 'SKYLINE OF x') would silently mis-split the
    # statement — reject when the match point sits inside open quotes
    # (cheap parity scan; doubled '' / "" escapes cancel out)
    prefix = sql[: m.start()]
    if prefix.count("'") % 2 == 1 or prefix.count('"') % 2 == 1:
        raise ValueError(
            "SKYLINE OF appears inside a quoted literal; the string-level "
            "rewrite cannot split this statement"
        )
    dims: list[tuple[str, str]] = []
    diff_cols: list[str] = []
    for part in m.group("dims").split(","):
        dm = _DIM_RE.match(part)
        if not dm:
            raise ValueError(f"cannot parse skyline dimension {part!r}")
        direction = (dm.group("dir") or "MIN").upper()
        if direction == "DIFF":
            diff_cols.append(dm.group("col"))
        else:
            dims.append((dm.group("col"), direction.lower()))
    if not dims:
        raise ValueError("SKYLINE OF needs at least one MIN/MAX dimension")
    rest = sql[m.end() :]
    tail = ""
    tm = _ORDER_LIMIT_RE.match(rest.strip())
    if tm and (tm.group("order") or tm.group("limit")):
        tail = " ".join(p for p in (tm.group("order"), tm.group("limit")) if p)
    elif rest.strip().strip(";"):
        raise ValueError(
            f"unsupported text after SKYLINE OF clause: {rest.strip()!r}"
        )
    core = sql[: m.start()].rstrip()
    return core, dims, diff_cols, tail


def skyline_sql(
    spark: SparkSession, sql: str, *, strategy: str = "twophase"
) -> DataFrame:
    """Run a SELECT statement containing a ``SKYLINE OF`` clause.

    Everything except the skyline clause is executed by Spark SQL
    verbatim; the clause itself dispatches to :func:`skyline` (or
    :func:`skyline_by` when DIFF attributes are present), and any
    trailing ORDER BY / LIMIT is applied to the skyline result via a
    second (trivial) SQL statement so its semantics stay Spark's own.
    """
    core, dims, diff_cols, tail = parse_skyline_clause(sql)
    base = spark.sql(core)
    if diff_cols:
        out = skyline_by(base, diff_cols, dims)
    else:
        out = skyline(base, dims, strategy=strategy)
    if tail:
        # content-stable view name (md5, not Python's salted hash) so
        # the same statement maps to the same view across processes
        digest = hashlib.md5(sql.encode()).hexdigest()[:12]
        view = f"__skyline_sql_out_{digest}"
        out.createOrReplaceTempView(view)
        out = spark.sql(f"SELECT * FROM {view} {tail}")
    return out
