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
the rounded scaled integer must fit a BIGINT (|result| < 2^63/10^d) —
both asserted by the caller's value-magnitude contract.
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
    val = F.when(
        dd > 0,
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
