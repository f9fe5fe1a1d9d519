"""Engine-exact HALF-UP rounding of an exact rational num/den.

The cross-engine hazard this closes (found by the r11 sf0.1 sweep,
`embedding_dim_stats` and `ewma_orders`): when an EXACT RATIONAL
result lands precisely on a .5 tie at the rounding digit, rounding the
double quotient is engine-divergent — Spark's ``round(double, d)``
expands the nearest double via BigDecimal and HALF-UPs its full
decimal expansion, while DuckDB multiplies by ``10^d`` (one extra
float rounding) before breaking the tie, so the two engines can emit
values one ulp-of-digit-d apart (…21395 → .2140 vs .2139).

The fix is the repo's own exactness discipline taken one step
further: compute the half-up-rounded SCALED INTEGER in exact decimal
arithmetic —

    r = (2*|num|*10^d + den) div (2*den),   result = sign * r / 10^d

— via Spark's ``div`` operator (integral division, exact on DECIMAL
operands, BIGINT result), then perform the single float step as
``same-integer / 10^d``, which every IEEE-754 engine computes
identically. The DuckDB oracle twin is the same formula with HUGEINT
``//``. No tie survives because no float rounding ever happens.

Digit budget: ``|num| * 2 * 10^d + den`` must fit decimal(38,0) and
the rounded scaled integer must fit a BIGINT (|result| < 2^63/10^d).
Both are enforced IN-PLAN by a lazy ``assert_true`` guard (the gini_by
idiom): in non-ANSI Spark a decimal overflow would otherwise yield a
silent NULL, diverging from the repo's fail-loudly discipline
(ADVICE r11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def exact_round_div(
    df: DataFrame,
    num: Column,
    den: Column,
    digits: int,
    out_col: str,
    *,
    prefix: str = "__erd",
) -> DataFrame:
    """Append ``out_col`` = round(num/den, digits) with HALF-UP ties
    broken in exact integer arithmetic (see module docstring).

    ``num`` may be negative; ``den`` must be positive (NULL result
    when den is NULL or not > 0). Both must be decimal(38,0)-safe
    expressions. Implemented as withColumn staging because Spark's
    ``div`` is only reachable through SQL ``expr`` on named columns.
    """
    scale = 10 ** digits
    # Materialize num/den ONCE in a single projection: num/den may be
    # window expressions, and referencing them from several staged
    # columns would re-plan the Window per reference (3 Window passes
    # where the caller built 1 — caught by test_ewma_single_window_pass)
    nn, dd = F.col(f"{prefix}_n"), F.col(f"{prefix}_dn")
    staged = (
        df.select(
            "*",
            num.cast(_DEC).alias(f"{prefix}_n"),
            den.cast(_DEC).alias(f"{prefix}_dn"),
        )
        .withColumn(
            f"{prefix}_x",
            F.abs(nn) * F.lit(2 * scale).cast(_DEC) + dd,
        )
        .withColumn(f"{prefix}_d", dd * F.lit(2).cast(_DEC))
        .withColumn(
            f"{prefix}_q", F.expr(f"{prefix}_x div {prefix}_d")
        )
    )
    # Loud digit-budget guard (ADVICE r11): enforce the documented
    # contract in-plan instead of trusting callers. (1) the staged
    # 2*|num|*10^d + den fits decimal(38,0): |num| <= (10^37-1) div
    # (2*10^d) and den < 10^19 (sum then < 10^37 + 10^19 < 10^38-1);
    # (2) the rounded scaled integer fits `div`'s BIGINT result:
    # |num| <= den * ((2^62-1) div 10^d) implies q <= 2^62 + 1 < 2^63.
    # The caps are far above any real caller's magnitudes (money on a
    # cents grid, token counts), so the guard only ever fires on a
    # genuine contract break. NULL operands and den<=0 pass through to
    # the existing NULL-result path.
    # caps exceed a Java long, so they travel as strings into DECIMAL
    num_cap = F.lit(str((10**37 - 1) // (2 * scale))).cast(_DEC)
    den_cap = F.lit(str(10**19)).cast(_DEC)
    ratio_cap = F.lit(str((2**62 - 1) // scale)).cast(_DEC)
    guard = F.assert_true(
        nn.isNull()
        | dd.isNull()
        | ~(dd > 0)
        | (
            (F.abs(nn) <= num_cap)
            & (dd < den_cap)
            & (F.abs(nn) <= dd * ratio_cap)
        ),
        F.lit(
            "exact_round_div: operand magnitude breaks the decimal(38,0)"
            "/BIGINT digit budget (see _rounding.py docstring); rescale "
            "num/den upstream"
        ),
    )
    val = F.when(
        guard.isNull() & (dd > 0),
        (F.when(nn < 0, -1).otherwise(1) * F.col(f"{prefix}_q")).cast(
            "double"
        )
        / F.lit(float(scale)),
    )
    return staged.withColumn(out_col, val).drop(
        f"{prefix}_n", f"{prefix}_dn", f"{prefix}_x",
        f"{prefix}_d", f"{prefix}_q",
    )


def oracle_round_div_sql(num_sql: str, den_sql: str, digits: int) -> str:
    """The DuckDB twin of :func:`exact_round_div` as a SQL expression
    string: exact HUGEINT floor-division half-up, then one float step
    dividing the identical integer by 10^digits."""
    scale = 10 ** digits
    return (
        f"CASE WHEN ({den_sql}) > 0 THEN "
        f"CAST((CASE WHEN ({num_sql}) < 0 THEN -1 ELSE 1 END) * "
        f"((2 * abs(CAST(({num_sql}) AS HUGEINT)) * {scale} "
        f"+ CAST(({den_sql}) AS HUGEINT)) "
        f"// (2 * CAST(({den_sql}) AS HUGEINT))) AS DOUBLE) / {scale}.0 "
        f"END"
    )
