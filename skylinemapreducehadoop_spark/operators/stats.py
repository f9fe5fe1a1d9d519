"""Distributed descriptive statistics with ENGINE-EXACT results.

Float aggregation over a shuffled dataset is order-sensitive in the
last ulps, so a naive ``corr``/``regr_slope`` can never hash-match a
second engine. These operators instead quantize each input to an
integer grid once (`round(x * scale)` — one IEEE multiply + one
round, bit-identical across engines on identical doubles), accumulate
every moment as an EXACT decimal(38,0) sum (associative and
commutative, so any partitioning and any combine order give the same
value), and apply the closed-form float formula exactly once, on the
driver-visible 1-row aggregate. The only float ops are that final
handful on identical exact integers — deterministic everywhere, then
rounded for cross-engine hashability.

At 100 TB this is also the right execution shape: each statistic is
ONE map-side-combined hash aggregate over the scan (no window, no
join), the shuffle carries a single row of decimal partials per
group, and adding columns adds expressions, not passes.
"""

from __future__ import annotations

from collections.abc import Sequence
from decimal import Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: decimal wide enough for sums of pairwise products of ~1e12-scale
#: quantized values over ~1e9 rows
_DEC = "decimal(38,0)"


def _q(col: str, scale: int):
    """Quantize a double column to an integer grid: round(x * scale).
    One multiply + one round — both correctly rounded IEEE ops, so the
    result is bit-identical across engines; ties at .5 would need x to
    land exactly on the half-grid, which the scale is chosen to avoid."""
    return F.round(F.col(col) * F.lit(scale)).cast("long")


def linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """Simple least-squares fit ``y ~ a + b*x`` via the normal
    equations, one distributed pass. Returns a single row
    (n, slope, intercept, r2), each float rounded to 9 digits.

    All five moments (n, Σx, Σy, Σxx, Σxy, Σyy) are exact decimal sums
    of the quantized grid values; slope/intercept/r² are computed from
    them in the ORIGINAL units (the grid scales divide back out) with
    a fixed handful of float ops, so two engines computing from the
    same parquet agree bit-for-bit before the final rounding.
    """
    x, y = _q(x_col, x_scale), _q(y_col, y_scale)
    agg = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast(_DEC)).alias("sx"),
            F.sum(y.cast(_DEC)).alias("sy"),
            F.sum((x.cast(_DEC) * x).cast(_DEC)).alias("sxx"),
            F.sum((x.cast(_DEC) * y).cast(_DEC)).alias("sxy"),
            F.sum((y.cast(_DEC) * y).cast(_DEC)).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    # un-scale inside the closed forms: sx/x_scale etc.; the exact
    # decimal numerators/denominators are cast to double ONCE each
    xs, ys = F.lit(float(x_scale)), F.lit(float(y_scale))
    sx = F.col("sx").cast("double") / xs
    sy = F.col("sy").cast("double") / ys
    sxx = F.col("sxx").cast("double") / (xs * xs)
    sxy = F.col("sxy").cast("double") / (xs * ys)
    syy = F.col("syy").cast("double") / (ys * ys)
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = cov_n / varx_n
    intercept = (sy - slope * sx) / n
    r2 = (cov_n * cov_n) / (varx_n * vary_n)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 9).alias("intercept"),
        F.round(r2, 9).alias("r2"),
    )


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    *,
    scales: Sequence[int] | None = None,
) -> DataFrame:
    """Pearson correlation for every unordered column pair, one
    distributed pass for ALL moments. Returns (col_x, col_y, corr)
    rows, pairs in lexicographic column order, corr rounded to 9.

    Same exact-decimal-moments scheme as :func:`linear_fit`: k columns
    need k(k+3)/2 sums, all computed in the SAME single hash aggregate
    — a correlation matrix over 100 TB is one scan, one 1-row shuffle.
    """
    names = list(cols)
    if len(names) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    sc = list(scales) if scales is not None else [1] * len(names)
    if len(sc) != len(names):
        raise ValueError("scales must match cols")
    qs = {c: _q(c, s) for c, s in zip(names, sc)}
    cond = F.lit(True)
    for c in names:
        cond = cond & F.col(c).isNotNull()
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, c in enumerate(names):
        aggs.append(F.sum(qs[c].cast(_DEC)).alias(f"s{i}"))
        for j in range(i, len(names)):
            aggs.append(
                F.sum((qs[c].cast(_DEC) * qs[names[j]]).cast(_DEC)).alias(f"p{i}_{j}")
            )
    agg = df.where(cond).agg(*aggs)

    n = F.col("n").cast("double")
    pairs = []
    for i, ci in enumerate(names):
        for j in range(i + 1, len(names)):
            cj = names[j]
            si = F.col(f"s{i}").cast("double") / F.lit(float(sc[i]))
            sj = F.col(f"s{j}").cast("double") / F.lit(float(sc[j]))
            pii = F.col(f"p{i}_{i}").cast("double") / F.lit(float(sc[i]) * sc[i])
            pjj = F.col(f"p{j}_{j}").cast("double") / F.lit(float(sc[j]) * sc[j])
            pij = F.col(f"p{i}_{j}").cast("double") / F.lit(float(sc[i]) * sc[j])
            corr = (n * pij - si * sj) / F.sqrt(
                (n * pii - si * si) * (n * pjj - sj * sj)
            )
            pairs.append(
                F.struct(
                    F.lit(ci).alias("col_x"),
                    F.lit(cj).alias("col_y"),
                    F.round(corr, 9).alias("corr"),
                )
            )
    return (
        agg.select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.col_x", "p.col_y", "p.corr")
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    n_sigma: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group count of ``|x - mean| > n_sigma * stddev_pop``
    outliers, decided in EXACT integer arithmetic. Returns
    (group, n, n_outliers).

    The test is rearranged to clear every division:
    ``(n*x - S)^2 > n_sigma^2 * (n*Sxx - S^2)`` — all decimal-exact on
    the quantized grid, so the boundary decision can never flip with
    ulp noise (the reason a float z-score filter cannot be an oracle
    contract). Two hash aggregates on the group key: moments, then a
    broadcast-sized join back for the comparison — at scale the second
    pass re-reads the scan rather than shuffling the data twice.
    """
    x = _q(value_col, scale).cast(_DEC)
    moments = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("__n"),
            F.sum(x).alias("__s"),
            F.sum((x * x).cast(_DEC)).alias("__sxx"),
        )
    )
    joined = df.where(F.col(value_col).isNotNull()).join(
        F.broadcast(moments), group_col
    )
    lhs = F.col("__n") * x - F.col("__s")
    rhs = F.lit(n_sigma * n_sigma).cast(_DEC) * (
        F.col("__n") * F.col("__sxx") - F.col("__s") * F.col("__s")
    )
    # digit budget: |n*x - S| < n * max|x|; with group sizes ~1e9 and
    # grid values ~1e9 both sides stay under 10^38 — inside
    # decimal(38,0), where every op here is exact
    out = lhs * lhs > rhs
    return (
        joined.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out.cast("long")).alias("n_outliers"),
        )
        .select(group_col, "n", "n_outliers")
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 10,
    k: int = 50,
) -> DataFrame:
    """Market-basket frequent-pair mining with lift: the top-``k``
    unordered item pairs co-occurring in at least ``min_support``
    baskets, ranked by support (ties by pair). Returns
    (item_a, item_b, support, lift) — the association-rule primer
    (Agrawal & Srikant's Apriori at the pair level, the part that
    matters at scale: longer itemsets prune from these).

    Shape: distinct (basket, item) → self-equi-join on basket with
    item_a < item_b (never a cartesian — co-occurrence is bounded by
    basket size), one pair aggregate, per-item basket counts joined
    back (shuffle_hash — item counts are catalog-sized, not always
    broadcastable), basket total as a 1-row broadcast. Lift =
    (support·N) / (c_a·c_b) computed as one float division of exact
    integer products, rounded — engine-exact. Skewed mega-baskets are
    the known hazard: cap or salt upstream if a basket can exceed
    ~10^4 items (quadratic in basket size, the same bound as every
    pairwise miner).
    """
    bi = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_baskets = bi.select("b").distinct().agg(F.count(F.lit(1)).alias("n_baskets"))
    item_cnt = bi.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
    l, r = bi.alias("l"), bi.alias("r")
    pairs = (
        l.join(r.hint("shuffle_hash"), "b")
        .where(F.col("l.i") < F.col("r.i"))
        .groupBy(F.col("l.i").alias("item_a"), F.col("r.i").alias("item_b"))
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )
    ca = item_cnt.select(F.col("i").alias("item_a"), F.col("c").alias("__ca"))
    cb = item_cnt.select(F.col("i").alias("item_b"), F.col("c").alias("__cb"))
    lift = F.round(
        (F.col("support") * F.col("n_baskets")).cast("double")
        / (F.col("__ca") * F.col("__cb")).cast("double"),
        9,
    )
    return (
        pairs.join(ca.hint("shuffle_hash"), "item_a")
        .join(cb.hint("shuffle_hash"), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select("item_a", "item_b", "support", lift.alias("lift"))
        .orderBy(F.col("support").desc(), "item_a", "item_b")
        .limit(k)
    )


def check_bucket_args(lo: float, hi: float, n_buckets: int) -> None:
    """Shared argument guard for the equal-width bucketing family."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")


def bucket_expr(value_col: str, lo: float, hi: float, n_buckets: int):
    """Equal-width bucket id on [lo, hi): out-of-range values clamp
    into the edge buckets. ONE definition shared by the batch drift
    operator and the streaming windowed histogram, so their "batch
    twin" contract can never silently diverge."""
    width = (hi - lo) / n_buckets
    b = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
    return F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), b)).cast("int")


def psi_log_term(c1, t_other, c_other1, t_own):
    """The log part of a smoothed PSI term with every log2 argument a
    single integer — ``log2(c1) + log2(t_other) - log2(c_other1) -
    log2(t_own)`` — algebraically log2(c1*t_other / (c_other1*t_own))
    WITHOUT the product, which would overflow int64 once both factors
    pass ~3e9 (two ~4-billion-row snapshots: routine at 100 TB)."""
    return (
        F.log2(c1.cast("double"))
        + F.log2(t_other.cast("double"))
        - F.log2(c_other1.cast("double"))
        - F.log2(t_own.cast("double"))
    )


def distribution_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Population-stability-index (PSI) style distribution drift
    between two snapshots of a numeric column over FIXED equal-width
    buckets on [lo, hi) — the monitoring primitive that answers "did
    this feed's distribution move since the last snapshot" without
    sampling or sketches. Returns one row per bucket:
    ``(bucket, n_base, n_cur, psi_term)``; total PSI = sum of terms.

    Engine-exactness: per-bucket counts are exact integers; Laplace
    +1 smoothing keeps EVERY log argument a positive integer, and the
    log of the smoothed-proportion ratio is computed as a SUM of four
    single-integer-argument log2 terms (:func:`psi_log_term` — no
    count product, so no int64 overflow at any snapshot size) — a
    fixed sequence of IEEE ops on integer-valued doubles, rounded at
    6 digits (the repo's LM-scorer rules; PSI here is the log2
    variant, a constant ln(2) factor from the textbook natural-log
    form). Values outside [lo, hi) clamp into the edge buckets, so no
    non-NULL row is silently dropped; NULL values are excluded.

    Plan: one hash aggregate per side (map-side combined) over the
    bucket id — each snapshot is scanned once, column-pruned to
    ``value_col`` — then a B-row full-outer join and the closed-form
    term. At 100 TB the only data-sized work is the two scans.
    """
    check_bucket_args(lo, hi, n_buckets)

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        b = bucket_expr(value_col, lo, hi, n_buckets)
        return (
            df.where(F.col(value_col).isNotNull())
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    grid = base.sparkSession.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    joined = (
        grid.join(bucketed(base, "n_base"), "bucket", "left")
        .join(bucketed(current, "n_cur"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    totals = joined.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_cur").alias("__tc")
    )
    cb1 = F.col("n_base") + F.lit(1)
    cc1 = F.col("n_cur") + F.lit(1)
    tb1 = F.col("__tb") + F.lit(n_buckets)
    tc1 = F.col("__tc") + F.lit(n_buckets)
    p = cb1.cast("double") / tb1.cast("double")
    q = cc1.cast("double") / tc1.cast("double")
    term = (p - q) * psi_log_term(cb1, tc1, cc1, tb1)
    return (
        joined.crossJoin(F.broadcast(totals))
        .select("bucket", "n_base", "n_cur", F.round(term, 6).alias("psi_term"))
        .orderBy("bucket")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    z_num: int = 7,
    z_den: int = 2,
) -> DataFrame:
    """Per-group robust outlier counts via the median / MAD modified
    z-score (Iglewicz & Hoaglin 1993: ``M = 0.6745*(x-med)/MAD``,
    flag ``|M| > 3.5``). Returns
    (group, n, n_outliers, med_x2, mad_x4).

    ``value_col`` must already be on an integer grid (pass e.g.
    ``CAST(price*100 AS LONG)`` cents). Then the median is an exact
    half-integer (linear interpolation between two grid points) and
    the MAD an exact quarter-integer, so ``med_x2 = 2*median`` and
    ``mad_x4 = 4*MAD`` are exact longs and the outlier decision is
    rearranged to clear every division:

        0.6745 * |x-med| / MAD > z_num/z_den
        <=>  6745 * 2 * z_den * d2  >  z_num * 10000 * mad_x4

    with ``d2 = |2x - 2*med|`` — all long arithmetic, so the boundary
    can never flip with ulp noise (a float MAD filter cannot be an
    oracle contract; cf. ``zscore_outliers``).

    A degenerate group (``MAD == 0``: more than half the values equal
    the median) has an UNDEFINED modified z-score — the cleared
    inequality would flag every off-median row, which is a statement
    about the statistic breaking down, not about outliers. Such groups
    report ``n_outliers = NULL`` (with ``mad_x4 = 0`` visible so the
    caller can choose a meanAD fallback).

    Execution shape: exact percentiles are sort-based aggregates whose
    per-group state is the DISTINCT-value multiset — bounded for
    quantized business values (prices, counts), not for raw doubles;
    at true 100 TB cardinality swap ``percentile`` for
    ``approx_percentile`` and drop the oracle claim. Two passes over
    the scan (median, then deviation median), each a map-side-combined
    aggregate; the per-group med/MAD tables are broadcast back, so the
    data itself is shuffled zero times beyond aggregate partials.
    """
    x = F.col(value_col).cast("long")
    g = F.col(group_col)
    base = df.where(x.isNotNull()).select(g.alias("__g"), x.alias("__x"))
    med = base.groupBy("__g").agg(
        (F.percentile("__x", F.lit(0.5)) * 2).cast("long").alias("med_x2")
    )
    dev = base.join(F.broadcast(med), "__g").select(
        "__g",
        "med_x2",
        F.abs(2 * F.col("__x") - F.col("med_x2")).alias("__d2"),
    )
    mad = dev.groupBy("__g").agg(
        (F.percentile("__d2", F.lit(0.5)) * 2).cast("long").alias("mad_x4")
    )
    flag = (
        F.lit(6745 * 2 * z_den) * F.col("__d2")
        > F.lit(z_num * 10000) * F.col("mad_x4")
    )
    return (
        dev.join(F.broadcast(mad), "__g")
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(flag.cast("long")).alias("__flagged"),
            F.max("med_x2").alias("med_x2"),
            F.max("mad_x4").alias("mad_x4"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n",
            F.when(F.col("mad_x4") > 0, F.col("__flagged")).alias("n_outliers"),
            "med_x2",
            "mad_x4",
        )
    )


def autocorrelation(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    *,
    lags: Sequence[int] = (1, 2, 3),
) -> DataFrame:
    """Per-key autocorrelation of an integer-valued series at the given
    lags: Pearson r between ``(x_t, x_{t-L})`` over all t where BOTH
    exist (gap-aware — pairing is by ``t`` arithmetic via a self-join,
    not by row offset, so missing periods drop pairs instead of
    silently pairing across gaps). Returns (key, lag, n_pairs, acf).

    ``t_col`` must be an integer period index (e.g. days since epoch)
    and ``value_col`` integer-valued (counts, quantized grid) — all six
    moments accumulate as exact decimal(38,0), so the only float math
    is the one closed-form correlation per (key, lag), identical on any
    engine (the ``corr_matrix`` discipline). Zero-variance series
    yield NULL acf.

    Execution shape: the input is the already-aggregated series frame
    (keys x periods — series-sized, not corpus-sized). The lag fan-out
    is an explode (|lags| copies) followed by ONE equi-join on
    (key, t) and one hash aggregate on (key, lag); at 100 TB the raw
    data is reduced to this frame by the upstream groupBy, so the join
    never sees event-level rows.
    """
    if not lags or any(int(l) < 1 for l in lags):
        raise ValueError("lags must be a non-empty sequence of positive ints")
    k, t, x = F.col(key_col), F.col(t_col), F.col(value_col)
    a = df.select(k.alias("__k"), t.alias("__t"), x.cast("long").alias("__xa"))
    lag_arr = F.array([F.lit(int(l)) for l in lags])
    b = (
        df.select(k.alias("__k"), t.alias("__t0"), x.cast("long").alias("__xb"))
        .withColumn("lag", F.explode(lag_arr))
        .withColumn("__t", F.col("__t0") + F.col("lag"))
    )
    pairs = a.join(b, ["__k", "__t"])
    xa = F.col("__xa").cast(_DEC)
    xb = F.col("__xb").cast(_DEC)
    m = pairs.groupBy("__k", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(xa).alias("__sa"),
        F.sum(xb).alias("__sb"),
        F.sum((xa * xb).cast(_DEC)).alias("__sab"),
        F.sum((xa * xa).cast(_DEC)).alias("__saa"),
        F.sum((xb * xb).cast(_DEC)).alias("__sbb"),
    )
    num = (F.col("__n") * F.col("__sab") - F.col("__sa") * F.col("__sb")).cast(
        "double"
    )
    va = (F.col("__n") * F.col("__saa") - F.col("__sa") * F.col("__sa")).cast(
        "double"
    )
    vb = (F.col("__n") * F.col("__sbb") - F.col("__sb") * F.col("__sb")).cast(
        "double"
    )
    acf = F.when((va > 0) & (vb > 0), num / F.sqrt(va * vb))
    return m.select(
        F.col("__k").alias(key_col),
        "lag",
        "n_pairs",
        F.round(acf, 6).alias("acf"),
    )


def fd_check(
    df: DataFrame, deps: Sequence[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency conformance profiling: for each candidate
    ``lhs -> rhs``, does lhs determine rhs? Returns one row per
    dependency: ``n_groups`` (distinct lhs values, NULL its own group),
    ``n_violating`` (lhs groups with >1 distinct non-NULL rhs) and
    ``extra_values`` (Σ distinct-rhs-per-group − 1 — the repair
    distance: how many rhs values would have to change for the FD to
    hold). ``n_violating = 0`` ⇔ the dependency holds.

    Each dependency is ONE column-pruned map-side-combined aggregate
    over (lhs, rhs) followed by a lhs-group rollup — no joins, no
    windows; candidate sets over a wide table cost one pass per
    dependency on two columns each. The profiling workhorse behind
    key discovery and denormalization audits.
    """
    if not deps:
        raise ValueError("deps must be non-empty")
    outs = []
    for lhs, rhs in deps:
        per_group = df.groupBy(lhs).agg(
            F.count_distinct(F.col(rhs)).alias("__cd")
        )
        outs.append(
            per_group.agg(
                F.lit(f"{lhs}->{rhs}").alias("dependency"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum((F.col("__cd") > 1).cast("long")).alias("n_violating"),
                F.sum(
                    F.greatest(F.col("__cd") - 1, F.lit(0))
                ).alias("extra_values"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def mutual_information(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Exact mutual information (bits) between two CATEGORICAL columns:
    ``MI = Σ_xy (c_xy/N) · log2(c_xy·N / (c_x·c_y))`` over rows where
    both are non-NULL. Returns one row: (n_rows, n_cells, mi_bits).

    Engine-exactness discipline: every log2 argument is an INTEGER
    count (four separate logs, each double-exact below 2^53), and the
    Σ over cells is a sequential fold over the ascending-sorted term
    list (the ``unigram_logprob`` trick) — bit-identical on any engine
    and any layout, then rounded for hashability.

    Shape: one (a,b) hash aggregate over the scan, two marginal
    rollups OF THE CELL TABLE (no second scan), broadcast joins back,
    and one driver-sized sorted fold — the cell table is |a|x|b|,
    which for categorical profiling fits one task by definition; this
    is not an estimator for continuous columns.
    """
    base = df.where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    cells = base.groupBy(a_col, b_col).agg(F.count(F.lit(1)).alias("__cxy"))
    ca = cells.groupBy(a_col).agg(F.sum("__cxy").alias("__ca"))
    cb = cells.groupBy(b_col).agg(F.sum("__cxy").alias("__cb"))
    tot = cells.agg(
        F.sum("__cxy").alias("__N"), F.count(F.lit(1)).alias("n_cells")
    )
    term = (
        F.col("__cxy").cast("double")
        * (
            F.log2(F.col("__cxy").cast("double"))
            + F.log2(F.col("__N").cast("double"))
            - F.log2(F.col("__ca").cast("double"))
            - F.log2(F.col("__cb").cast("double"))
        )
    ).alias("__term")
    joined = (
        cells.join(F.broadcast(ca), a_col)
        .join(F.broadcast(cb), b_col)
        .crossJoin(F.broadcast(tot))
        .select("__N", "n_cells", term)
    )
    folded = joined.groupBy("__N", "n_cells").agg(
        F.sort_array(F.collect_list("__term")).alias("__ts")
    )
    fold = F.aggregate("__ts", F.lit(0.0), lambda acc, t: acc + t)
    return folded.select(
        F.col("__N").alias("n_rows"),
        "n_cells",
        F.round(fold / F.col("__N").cast("double"), 6).alias("mi_bits"),
    )


def _abc_local_frame(per_key: DataFrame, key_col: str, nparts: int) -> DataFrame:
    """Range-partition the key table on ``(desc total_q, asc key)`` and
    compute per-partition local rank / running sum. Range partitioning
    guarantees partition i's rows all precede partition j's (i < j) in
    the global order, so per-partition offsets compose into the exact
    global prefix sum. Every window here is partitioned by
    ``spark_partition_id`` — there is no single-partition window
    anywhere in the plan (asserted by ``test_abc_no_global_window``).
    """
    local_w = Window.partitionBy("__pid").orderBy(F.desc("total_q"), F.asc(key_col))
    return (
        per_key.repartitionByRange(nparts, F.desc("total_q"), F.asc(key_col))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrank", F.row_number().over(local_w))
        .withColumn(
            "__lcum",
            F.sum("total_q").over(
                local_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )


def abc_classify(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    scale: int = 100,
    a_pct: int = 80,
    b_pct: int = 95,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pareto / ABC inventory classification: aggregate ``value_col``
    per key on the integer grid, rank descending (ties broken by key
    ascending), and classify by cumulative share — 'A' while the
    running total is within ``a_pct``% of the grand total, 'B' within
    ``b_pct``%, else 'C'. Returns (key, total_q, cum_q, share_rank,
    abc_class).

    Both boundary decisions clear the division: ``cum*100 <=
    total*pct`` in exact decimal(38,0) — a float share comparison
    could flip the class of the key straddling 80% with ulp noise.

    Shape (distributed prefix sum — NO single-partition window): one
    map-side-combined aggregate reduces the fact table to the KEY
    table, which is then RANGE-partitioned on ``(desc total_q, asc
    key)``. Each range partition computes its local running sum /
    local rank under a ``partitionBy(partition_id)`` window; the
    per-partition (sum, count) pairs — a #partitions-row frame, bounded
    by config and not by data — are collected, prefix-summed on the
    driver in exact Decimal, and joined back as broadcast offsets.
    ``cum_q = local_cum + offset``; ``rank = local_rank + offset``.
    The key frame is ``localCheckpoint``-pinned so the collected
    offsets and the final pass read the same range boundaries. ABC
    over 10^8 keys therefore flows through every core instead of one
    task; no stage ever sees "Moving all data to a single partition".
    """
    q = _q(value_col, scale).cast(_DEC)
    per_key = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(F.sum(q).alias("total_q"))
    )
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Pinned: the offsets collect below must see the same range
    # boundaries as the final pass.
    local = _abc_local_frame(per_key, key_col, nparts).localCheckpoint()
    # #partitions-row collect (bounded by config, never by data — the
    # MAX_TOUCHED_BUCKETS-style contract): per-partition sum + count.
    pstats = sorted(
        local.groupBy("__pid")
        .agg(F.sum("total_q").alias("__s"), F.count(F.lit(1)).alias("__c"))
        .collect(),
        key=lambda r: r["__pid"],
    )
    offsets, cum, cnt = [], Decimal(0), 0
    for r in pstats:
        offsets.append((r["__pid"], str(cum), cnt))
        cum += r["__s"]
        cnt += int(r["__c"])
    grand_total = cum
    off_df = spark.createDataFrame(
        offsets or [(0, "0", 0)], "__pid int, __coff string, __roff long"
    ).select("__pid", F.col("__coff").cast(_DEC).alias("__coff"), "__roff")
    gt = F.lit(str(grand_total)).cast(_DEC)
    hundred = F.lit(100).cast(_DEC)
    ranked = local.join(F.broadcast(off_df), "__pid").select(
        F.col(key_col),
        "total_q",
        (F.col("__lcum") + F.col("__coff")).alias("cum_q"),
        (F.col("__lrank") + F.col("__roff")).cast("int").alias("share_rank"),
    )
    cls = F.when(
        F.col("cum_q") * hundred <= gt * F.lit(a_pct).cast(_DEC), "A"
    ).when(
        F.col("cum_q") * hundred <= gt * F.lit(b_pct).cast(_DEC), "B"
    ).otherwise("C")
    return ranked.select(
        key_col,
        F.col("total_q").cast("long").alias("total_q"),
        F.col("cum_q").cast("long").alias("cum_q"),
        "share_rank",
        cls.alias("abc_class"),
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: Sequence[str],
    *,
    k: int = 5,
) -> DataFrame:
    """k-anonymity profile over quasi-identifier columns — the
    compliance/privacy screen a curation pipeline runs before a table
    (or a metadata sidecar of a document corpus) ships: rows whose
    quasi-identifier combination is shared by fewer than ``k`` rows
    are re-identifiable. Returns one row per distinct EQUIVALENCE
    CLASS SIZE: (class_size, n_classes, n_rows, at_risk) with
    ``at_risk = class_size < k`` — the class-size histogram, from
    which min class size (the k the table actually satisfies), the
    at-risk row count and the suppression cost all read off directly.
    NULL is a value (SQL GROUP BY semantics): an all-NULL QI tuple is
    its own class.

    Scale shape: one map-side-combined aggregate to the class table
    (bounded by QI cardinality), one aggregate of THAT to the size
    histogram (bounded by the number of distinct sizes) — the fact
    table is scanned once and never shuffled wider than the QI key.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).alias("n_rows"),
            (F.col("class_size") < F.lit(k)).alias("at_risk"),
        )
    )


def percentile_ranks(
    df: DataFrame,
    value_col: str,
    *,
    scale: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global rank / percent_rank / cume_dist for EVERY row
    without a single-partition window — the general form of the
    distributed prefix sum that fixed ``abc_classify``: a plain
    ``Window.orderBy(value)`` funnels the whole table through one
    task, which at 100 TB is the canonical scale-killer for CDF
    transforms (feature scaling, score normalization, calibration).

    Returns (value_q, n_rows_at, n_smaller, percent_rank, cume_dist)
    per DISTINCT grid value — the CDF table; join it back on
    ``value_q`` for a per-row transform. Semantics match SQL:
    ``percent_rank = n_smaller / (N - 1)`` (min-rank ties),
    ``cume_dist = (n_smaller + n_rows_at) / N``, both rounded to 9.

    Shape: one map-side-combined aggregate to the DISTINCT-value
    table, a range partition over it, per-partition prefix sums under
    a ``partitionBy(partition_id)`` window, a #partitions-row offsets
    collect (config-bounded), broadcast-added back. No window in the
    plan has an empty partition spec (same assertion as
    ``test_abc_no_global_window``).
    """
    q = _q(value_col, scale)
    per_val = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(q.alias("value_q"))
        .agg(F.count(F.lit(1)).alias("n_rows_at"))
    )
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    local_w = Window.partitionBy("__pid").orderBy(F.asc("value_q"))
    local = (
        per_val.repartitionByRange(nparts, F.asc("value_q"))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lcum",
            F.sum("n_rows_at").over(
                local_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .localCheckpoint()
    )
    pstats = sorted(
        local.groupBy("__pid").agg(F.sum("n_rows_at").alias("__s")).collect(),
        key=lambda r: r["__pid"],
    )
    offsets, cum = [], 0
    for r in pstats:
        offsets.append((r["__pid"], cum))
        cum += int(r["__s"])
    n_total = cum
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    n_smaller = F.col("__lcum") + F.col("__off") - F.col("n_rows_at")
    denom = F.lit(max(n_total - 1, 1)).cast("double")
    return local.join(F.broadcast(off_df), "__pid").select(
        "value_q",
        "n_rows_at",
        n_smaller.alias("n_smaller"),
        F.round(n_smaller / denom, 9).alias("percent_rank"),
        F.round(
            (F.col("__lcum") + F.col("__off")) / F.lit(max(n_total, 1)).cast("double"),
            9,
        ).alias("cume_dist"),
    )


def target_encode(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    *,
    out_col: str = "loo_mean",
) -> DataFrame:
    """Leave-one-out target encoding: each row gets the mean of
    ``value_col`` over all OTHER rows sharing its key — the standard
    category-feature encoding that avoids self-leakage (a plain
    per-key mean leaks the row's own label into its feature).

    Contract: rows with a NULL value receive the plain per-key mean
    (they contribute nothing to leak); a non-null row whose key has no
    other non-null rows gets NULL (no peer evidence). Appends
    ``out_col`` to the input rows.

    Exactness: the per-key sum folds in decimal(20,4), so the
    subtraction (sum - own) is exact and the single final
    decimal->double cast + division is the only float step — the
    encoding is bit-identical on any layout/engine (plain double sums
    are fold-order-dependent; this is the q1/events_hourly decimal
    discipline).

    Scale shape: one map-side-combined aggregate to a key-table-sized
    frame + one broadcast-able join back. No window, no shuffle of the
    fact table beyond the aggregate.
    """
    keys = list(key_cols)
    vdec = F.col(value_col).cast("decimal(20,4)")
    g = df.groupBy(*keys).agg(
        F.sum(vdec).alias("__s"), F.count(value_col).alias("__n")
    )
    loo = (
        F.when(
            F.col(value_col).isNull(),
            F.col("__s").cast("double") / F.col("__n"),
        )
        .when(F.col("__n") == 1, F.lit(None).cast("double"))
        .otherwise(
            (F.col("__s") - vdec).cast("double") / (F.col("__n") - 1)
        )
    )
    return df.join(g, keys, "left").withColumn(out_col, loo).drop("__s", "__n")


def cusum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    out_col: str = "cusum_scaled",
) -> DataFrame:
    """One-sided CUSUM change-point statistic per group, in EXACT
    integer arithmetic (Page 1954 — the classic sequential drift
    detector, e.g. "did this event type's daily volume shift upward,
    and when?").

    The textbook recursion C_t = max(0, C_{t-1} + x_t - k) with drift
    reference k = mean(x) is not window-expressible, but its closed
    form is: C_t = S_t - min_{0<=i<=t} S_i with S_t = sum_{i<=t}
    (x_i - k) and S_0 = 0. Scaling by n (the group's row count) clears
    the division in k = total/n, so every term n*x_i - total is a
    long and the statistic ``out_col`` = n * C_t is exact — identical
    on any engine, no float fold anywhere.

    Requires an integer-valued ``value_col`` (counts). Appends
    ``out_col`` (and keeps all input columns); C_t in value units is
    out_col / n, and a standard alarm rule is out_col > h * total
    (i.e. C_t > h * mean) for a chosen h.

    Scale shape: two window passes over the same (group, order)
    partitioning — one Exchange + one Sort feed all four window
    expressions; no self-join, no collect. Group cardinality bounds
    per-task state at one partition's rows, as any ordered per-key
    scan must.
    """
    grp = Window.partitionBy(group_col)
    seq = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(value_col).cast("long")
    with_tot = df.withColumn("__tot", F.sum(x).over(grp)).withColumn(
        "__n", F.count(F.lit(1)).over(grp)
    )
    run = F.sum(F.col("__n") * x - F.col("__tot")).over(seq)
    stepped = with_tot.withColumn("__run", run)
    low = F.least(F.min("__run").over(seq), F.lit(0).cast("long"))
    return (
        stepped.withColumn(out_col, F.col("__run") - low)
        .withColumn("n_periods", F.col("__n"))
        .withColumn("total", F.col("__tot"))
        .drop("__tot", "__n", "__run")
    )


def global_row_number(
    df: DataFrame,
    order_cols: Sequence,
    *,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number()`` over a total order WITHOUT a
    single-partition window — the reusable form of the distributed
    prefix sum behind ``abc_classify`` / ``percentile_ranks``, for any
    transform that needs a global position (ntile-style scoring,
    deterministic id assignment, pagination cuts).

    ``order_cols`` must be a deterministic TOTAL order (include a
    unique tie-break column); pass Column expressions (``F.desc(c)`` /
    ``F.asc(c)``). Appends ``out_col`` (1-based long).

    Shape: range partition on the order, per-partition local
    ``row_number`` under a ``partitionBy(partition_id)`` window, a
    #partitions-row count collect (config-bounded, never data-bounded),
    broadcast-added offsets. The frame is ``localCheckpoint``-pinned so
    the offsets and the final pass see identical range boundaries.
    """
    cols = list(order_cols)
    if not cols:
        raise ValueError("order_cols must be non-empty")
    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    local_w = Window.partitionBy("__pid").orderBy(*cols)
    local = (
        df.repartitionByRange(nparts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(local_w))
        .localCheckpoint()
    )
    pstats = sorted(
        local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c")).collect(),
        key=lambda r: r["__pid"],
    )
    offsets, cum = [], 0
    for r in pstats:
        offsets.append((r["__pid"], cum))
        cum += int(r["__c"])
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def global_row_number_grouped(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence,
    *,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-GROUP exact global ``row_number()`` (rank restarts at 1 in
    each group) without a per-group single-partition window — the
    grouped form of :func:`global_row_number`, for computing SEVERAL
    independent global rankings of one table in ONE pass (melt the
    metrics to (group, sort_key) rows, rank here, pivot back) instead
    of chaining one prefix-sum machinery per ranking.

    Shape: ONE range partition on (group, order...), partition-local
    ``row_number`` keyed by (group, partition_id), one
    #groups x #partitions-row count collect (config/group-bounded,
    never data-bounded), broadcast-added per-(group, partition)
    offsets. ``order_cols`` must total-order rows WITHIN each group
    (include a tie-break column).
    """
    cols = list(order_cols)
    if not cols:
        raise ValueError("order_cols must be non-empty")
    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    g = F.col(group_col)
    local_w = Window.partitionBy(group_col, "__pid").orderBy(*cols)
    local = (
        df.repartitionByRange(nparts, g.asc(), *cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(local_w))
        .localCheckpoint()
    )
    pstats = sorted(
        local.groupBy(group_col, "__pid")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect(),
        key=lambda r: (r[group_col], r["__pid"]),
    )
    offsets: list[tuple] = []
    prev_g, cum = None, 0
    for r in pstats:
        if r[group_col] != prev_g:
            prev_g, cum = r[group_col], 0
        offsets.append((r[group_col], r["__pid"], cum))
        cum += int(r["__c"])
    schema = T.StructType(
        [
            T.StructField(group_col, df.schema[group_col].dataType, True),
            T.StructField("__pid", T.IntegerType()),
            T.StructField("__off", T.LongType()),
        ]
    )
    off_df = spark.createDataFrame(offsets or [(None, 0, 0)], schema)
    return (
        local.join(F.broadcast(off_df), [group_col, "__pid"])
        .withColumn(out_col, (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def cooccur_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 5,
    k: int = 50,
) -> DataFrame:
    """Item-item co-occurrence COSINE — the classic memory-based
    collaborative-filtering similarity ("customers who bought a also
    bought b"): sim(a,b) = c_ab / sqrt(c_a * c_b) over basket
    co-occurrence counts. Same exact-integer discipline as
    :func:`frequent_pairs` (one sqrt + one division of exact integer
    counts, rounded to 9 — engine-exact rank order); same scale shape
    (distinct basket-item pairs, basket-bounded self-equi-join with
    item_a < item_b, shuffle_hash count joins back, no cartesian).
    Returns top-``k`` (item_a, item_b, support, cosine).
    """
    bi = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    item_cnt = bi.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
    l, r = bi.alias("l"), bi.alias("r")
    pairs = (
        l.join(r.hint("shuffle_hash"), "b")
        .where(F.col("l.i") < F.col("r.i"))
        .groupBy(F.col("l.i").alias("item_a"), F.col("r.i").alias("item_b"))
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )
    ca = item_cnt.select(F.col("i").alias("item_a"), F.col("c").alias("__ca"))
    cb = item_cnt.select(F.col("i").alias("item_b"), F.col("c").alias("__cb"))
    cosine = F.round(
        F.col("support").cast("double")
        / F.sqrt((F.col("__ca") * F.col("__cb")).cast("double")),
        9,
    )
    return (
        pairs.join(ca.hint("shuffle_hash"), "item_a")
        .join(cb.hint("shuffle_hash"), "item_b")
        .select("item_a", "item_b", "support", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "item_a", "item_b")
        .limit(k)
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact LOWER weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total — the
    quantity-weighted "typical price" a plain median mis-states.
    Returns (group, w_median, total_weight).

    Both columns must be integer-valued (grid-quantize first), so the
    boundary test clears the division (cum*2 >= total in exact longs)
    and the answer is engine-reproducible — no interpolation, no
    floats.

    Shape: one map-side-combined (group, value) aggregate shrinks the
    data to the distinct-value table, then one ordered window over
    THAT (state bounded by per-group distinct values, not rows) and
    one min aggregate. The fact table is never sorted.
    """
    g, v = F.col(group_col), F.col(value_col).cast("long")
    # weights fold in decimal(38,0): a long weight sum (and the
    # boundary's cum*2 product) wraps silently past 2^63 in non-ANSI
    # Spark — the same overflow class the ks_test/roc_auc ADVICE fix
    # closed. The output total_weight stays a long (the oracle
    # contract); only the internal folds widen.
    w = F.col(weight_col).cast(_DEC)
    per_v = (
        df.where(v.isNotNull() & w.isNotNull())
        .groupBy(g.alias("__g"), v.alias("__v"))
        .agg(F.sum(w).alias("__w"))
    )
    seq = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = Window.partitionBy("__g")
    cum = per_v.withColumn("__cum", F.sum("__w").over(seq)).withColumn(
        "__tot", F.sum("__w").over(grp)
    )
    return (
        cum.where(F.col("__cum") * 2 >= F.col("__tot"))
        .groupBy(F.col("__g").alias(group_col))
        .agg(
            F.min("__v").alias("w_median"),
            F.max("__tot").cast("long").alias("total_weight"),
        )
    )


def linear_fit_by(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    *,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """Per-GROUP least-squares fit ``y ~ a + b*x`` — trend detection
    over many series in one pass (slope of daily volume per key, drift
    per segment). Returns (group..., n, slope, intercept, r2), floats
    rounded to 9.

    Same exactness contract as :func:`linear_fit` (exact decimal
    moments in ONE map-side-combined aggregate; a fixed handful of
    float ops per group row) with one deliberate difference: a
    degenerate group (all x equal, or n < 2) yields NULL
    slope/intercept/r2 instead of inf/NaN — grouped fits hit
    degenerate series routinely, and NULL is the hashable, joinable
    answer. Kept separate from ``linear_fit`` so that operator's code
    (and its rotation bookkeeping) stays untouched.

    Shape: the fact table reduces to one moments row per group
    (map-side combined); closed forms are a projection on the key
    table. Nothing else shuffles.
    """
    groups = list(group_cols)
    if not groups:
        raise ValueError("group_cols must be non-empty (use linear_fit)")
    x, y = _q(x_col, x_scale), _q(y_col, y_scale)
    agg = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast(_DEC)).alias("sx"),
            F.sum(y.cast(_DEC)).alias("sy"),
            F.sum((x.cast(_DEC) * x).cast(_DEC)).alias("sxx"),
            F.sum((x.cast(_DEC) * y).cast(_DEC)).alias("sxy"),
            F.sum((y.cast(_DEC) * y).cast(_DEC)).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    xs, ys = F.lit(float(x_scale)), F.lit(float(y_scale))
    sx = F.col("sx").cast("double") / xs
    sy = F.col("sy").cast("double") / ys
    sxx = F.col("sxx").cast("double") / (xs * xs)
    sxy = F.col("sxy").cast("double") / (xs * ys)
    syy = F.col("syy").cast("double") / (ys * ys)
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    ok = varx_n > 0
    slope = F.when(ok, cov_n / varx_n)
    intercept = F.when(ok, (sy - (cov_n / varx_n) * sx) / n)
    r2 = F.when(ok & (vary_n > 0), (cov_n * cov_n) / (varx_n * vary_n))
    return agg.select(
        *groups,
        F.col("n").cast("long").alias("n"),
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 9).alias("intercept"),
        F.round(r2, 9).alias("r2"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    quantiles: "Sequence[tuple[int, int]]",
) -> DataFrame:
    """Exact LOWER weighted quantiles per group for several q at once:
    for each q = q_num/q_den, the smallest value whose cumulative
    weight reaches q of the group total (``cum * q_den >= tot *
    q_num`` — division-free exact longs; q=1/2 reproduces
    :func:`weighted_median`). Returns (group, total_weight,
    wq_<num>_<den>...).

    Same shape as the median: one map-side-combined (group, value)
    aggregate to the distinct-value table, ONE ordered window over it,
    then one conditional-min aggregate per requested quantile — adding
    quantiles adds projection columns, not passes.
    """
    qs = list(quantiles)
    if not qs or any(n < 0 or d < 1 or n > d for n, d in qs):
        raise ValueError("quantiles must be (num, den) with 0 <= num <= den")
    g, v = F.col(group_col), F.col(value_col).cast("long")
    # decimal weight folds for the same overflow reason as
    # weighted_median: cum * q_den as longs wraps past 2^63
    w = F.col(weight_col).cast(_DEC)
    per_v = (
        df.where(v.isNotNull() & w.isNotNull())
        .groupBy(g.alias("__g"), v.alias("__v"))
        .agg(F.sum(w).alias("__w"))
    )
    seq = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = Window.partitionBy("__g")
    cum = per_v.withColumn("__cum", F.sum("__w").over(seq)).withColumn(
        "__tot", F.sum("__w").over(grp)
    )
    aggs = [F.max("__tot").cast("long").alias("total_weight")]
    for num, den in qs:
        hit = F.col("__cum") * den >= F.col("__tot") * num
        aggs.append(
            F.min(F.when(hit, F.col("__v"))).alias(f"wq_{num}_{den}")
        )
    return cum.groupBy(F.col("__g").alias(group_col)).agg(*aggs)


def gini_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Gini concentration coefficient in EXACT integer
    arithmetic — the classic inequality / concentration screen
    ("how concentrated is revenue across customers per nation?",
    "is one source dominating the training mix?").

    ``value_col`` must be a NON-NEGATIVE integer column (put money on
    the cents grid first) — ENFORCED: a negative value raises at
    execution time (lazy per-group ``assert_true`` guard) rather than
    silently producing a meaningless coefficient. Uses the sorted-rank
    closed form
    ``G = (2*sum_i(i*x_i) - (n+1)*sum(x)) / (n*sum(x))`` with rows
    sorted ascending — but evaluated on the VALUE-AGGREGATED frame:
    for a distinct value ``v`` with count ``c`` and cumulative count
    ``C`` the tie block contributes ``v * (C*(C+1) - (C-c)*(C-c+1))/2``
    to ``sum_i(i*x_i)`` regardless of how ties were ordered, so the
    statistic is deterministic with no per-row ranking at all.

    Exactness: every sum folds in decimal(38,0); the single float
    step is the final numerator/denominator division, rounded to 9 —
    bit-identical on any engine/layout.

    Scale shape: one map-side-combined aggregate to the (group,
    distinct value) frame, one window over THAT frame partitioned by
    group (value-cardinality sized, not row sized — the
    weighted_quantiles defense), one final per-group aggregate.
    Groups with total == 0 (all-zero values) emit NULL gini.
    """
    v = F.col("__v").cast("decimal(38,0)")
    per_val = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("long").alias("__v"),
        )
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__c"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy(F.asc("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NB: name the running sum with a case-DISTINCT identifier — Spark
    # resolves column names case-insensitively by default, so "__C"
    # next to "__c" silently aliases the same attribute
    cum = per_val.withColumn("__cum", F.sum("__c").over(w))
    lo = F.col("__cum") - F.col("__c")
    block = v * (
        F.col("__cum") * (F.col("__cum") + 1) - lo * (lo + 1)
    )
    agg = cum.groupBy("__g").agg(
        F.sum(block).alias("__twice_ranked"),
        F.sum(v * F.col("__c")).alias("__total"),
        F.sum("__c").alias("__n"),
        F.min("__v").alias("__minv"),
    )
    num = (
        F.col("__twice_ranked")
        - (F.col("__n") + 1) * F.col("__total")
    )
    den = F.col("__n") * F.col("__total")
    # Contract enforcement: the closed form assumes non-negative mass,
    # so a negative value must fail LOUDLY at execution time instead of
    # returning a plausible-looking coefficient. assert_true keeps the
    # check lazy and distributed (it evaluates per output row, NULL on
    # pass, throws on violation); folding it under F.when stops
    # Catalyst from pruning the unused guard column.
    guard = F.assert_true(
        F.col("__minv") >= 0,
        F.lit(
            "gini_by: value_col must be non-negative "
            "(negative value encountered; put money on the cents grid "
            "and clamp refunds upstream)"
        ),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("long").alias("n_rows"),
        F.col("__total").cast("long").alias("total"),
        F.when(
            guard.isNull() & (F.col("__total") > 0),
            F.round(num.cast("double") / den.cast("double"), 9),
        ).alias("gini"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    scale: int = 1000000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label WITHOUT a
    single-partition window — the evaluation step of every
    quality-classifier gate in a data pipeline ("does this heuristic
    score actually separate keep from drop?").

    AUC is the Mann-Whitney U statistic normalized: with the score
    quantized to an integer grid (``scale``), for each distinct score
    ``s`` holding ``p_s`` positives and ``n_s`` negatives,
    ``2U = sum_s p_s * (2 * N_below(s) + n_s)`` where ``N_below`` is
    the count of negatives at strictly smaller scores (ties get the
    conventional 1/2 credit — the ``+ n_s`` term). All counts are
    exact longs; the single float step is the final ``2U / (2*P*N)``
    division, rounded to 9.

    Scale shape: one map-side-combined aggregate to the distinct-score
    frame, then the distributed prefix sum of :func:`percentile_ranks`
    (range partition, per-partition running sums under a
    partition_id-keyed window, #partitions-row offsets collect,
    broadcast-add). No window in the plan has an empty partition spec.

    Returns one row: (n_pos, n_neg, n_scores, auc). NULL auc when
    either class is empty.
    """
    lab = F.col(label_col).cast("long")
    q = _q(score_col, scale)
    per_score = (
        df.where(F.col(score_col).isNotNull() & lab.isNotNull())
        .groupBy(q.alias("__s"))
        .agg(
            F.sum(lab).alias("__p"),
            (F.count(F.lit(1)) - F.sum(lab)).alias("__n"),
        )
    )
    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    local_w = Window.partitionBy("__pid").orderBy(F.asc("__s"))
    local = (
        per_score.repartitionByRange(nparts, F.asc("__s"))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lcum",
            F.sum("__n").over(
                local_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .localCheckpoint()
    )
    pstats = sorted(
        local.groupBy("__pid").agg(F.sum("__n").alias("__t")).collect(),
        key=lambda r: r["__pid"],
    )
    offsets, cum = [], 0
    for r in pstats:
        offsets.append((r["__pid"], cum))
        cum += int(r["__t"] or 0)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    # Fold the per-score product in decimal(38,0) BEFORE multiplying:
    # p_s * (2*below + n_s) as longs wraps silently past 2^63 (~3e9
    # rows per class); casting only the product's result to decimal
    # (the old shape) is too late. Same discipline as ks_test/gini_by.
    dec = "decimal(38,0)"
    below = (F.col("__lcum") + F.col("__off") - F.col("__n")).cast(dec)
    twice_u = F.sum(
        F.col("__p").cast(dec)
        * (F.lit(2).cast(dec) * below + F.col("__n").cast(dec))
    )
    out = local.join(F.broadcast(off_df), "__pid").agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        twice_u.alias("__2u"),
    )
    return out.select(
        "n_pos",
        "n_neg",
        "n_scores",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("__2u").cast("double")
                / (2.0 * F.col("n_pos") * F.col("n_neg")).cast("double"),
                9,
            ),
        ).alias("auc"),
    )


def chi2_independence(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Pearson chi-square contingency cells for two categorical
    columns — the dataset-bias screen ("is event type independent of
    weekday?", "is language independent of source?") that complements
    :func:`mutual_information` with the classical test statistic.

    Per cell (a, b): observed count ``O``, expected count
    ``E = R_a * C_b / N`` and the contribution
    ``(O - E)^2 / E = (N*O - R_a*C_b)^2 / (N * R_a * C_b)``. The
    right-hand form clears every subtraction into exact decimal(38,0)
    integer algebra; each cell's single division is pinned and rounded
    to 9, so the frame is engine-exact. The total statistic is the
    exact decimal SUM of the rounded per-cell contributions (rounding
    before the fold makes the sum order-free — the pinned-division
    discipline of class_scatter generalized to a reduction).

    Scale shape: one map-side-combined aggregate to the |A|x|B| cell
    frame; row/column marginals are cell-frame aggregates joined back
    (AQE broadcasts them — they are category-cardinality sized); the
    grand total is a 1-row broadcast join. No shuffle touches the
    fact table twice.

    Returns the per-cell frame (a, b, observed, expected, contrib)
    ordered by (a, b).
    """
    cells = (
        df.where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__o"))
    )
    ra = cells.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    cb = cells.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    nn = cells.agg(F.sum("__o").alias("__nn"))
    j = (
        cells.join(ra.hint("shuffle_hash"), "__a")
        .join(cb.hint("shuffle_hash"), "__b")
        .crossJoin(F.broadcast(nn))
    )
    dev = F.col("__nn") * F.col("__o") - F.col("__ra") * F.col("__cb")
    contrib = (dev * dev).cast("double") / (
        F.col("__nn") * F.col("__ra") * F.col("__cb")
    ).cast("double")
    return j.select(
        F.col("__a").alias(a_col),
        F.col("__b").alias(b_col),
        F.col("__o").cast("long").alias("observed"),
        F.round(
            (F.col("__ra") * F.col("__cb")).cast("double")
            / F.col("__nn").cast("double"),
            9,
        ).alias("expected"),
        F.round(contrib, 9).alias("contrib"),
    ).orderBy(a_col, b_col)


def survival_km(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate per group — the
    standard churn / time-to-conversion curve ("how long until a user
    purchases, accounting for users we stopped observing?").

    Input: one row per subject with an integer ``duration_col`` and
    ``event_col`` = 1 if the event was observed at that duration, 0 if
    the subject was censored there. Output: one row per (group,
    distinct EVENT time t): ``n_at_risk`` (subjects with duration >=
    t), ``n_events``, ``n_censored`` (censorings recorded at exactly
    t), and ``survival`` = prod_{s<=t} (1 - d_s/n_s) rounded to 6.

    Exactness discipline: the cumulative PRODUCT is a float fold, so
    it is rewritten as exp(sum(log)) with each step's log rounded to
    12 decimals and summed in decimal(38,12) — rounding BEFORE the
    fold makes the sum order-free (the chi2_independence trick), and
    the final exp + round(6) sits at the libm edge like token_entropy.

    Scale shape: one map-side-combined aggregate to the (group,
    distinct duration) frame; both windows (the at-risk suffix sum and
    the log prefix sum) run over THAT frame partitioned by group —
    value-cardinality sized, never row sized.
    """
    ev = F.col(event_col).cast("long")
    per_t = (
        df.where(F.col(duration_col).isNotNull() & ev.isNotNull())
        .groupBy(
            F.col(group_col).alias("__g"),
            F.col(duration_col).cast("long").alias("__t"),
        )
        .agg(
            F.sum(ev).alias("__d"),
            (F.count(F.lit(1)) - F.sum(ev)).alias("__c"),
        )
    )
    pre = (
        Window.partitionBy("__g")
        .orderBy(F.asc("__t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = Window.partitionBy("__g")
    at_risk = (
        F.sum(F.col("__d") + F.col("__c")).over(grp)
        - F.sum(F.col("__d") + F.col("__c")).over(pre)
        + F.col("__d")
        + F.col("__c")
    )
    stepped = per_t.withColumn("__n", at_risk)
    # a step where EVERYONE at risk experiences the event (d == n) has
    # factor 0 — ln(0) is not summable (Spark log(0) yields NULL and
    # would silently vanish from the fold), so carry an explicit
    # cumulative went-to-zero flag instead
    step_log = F.when(
        (F.col("__d") > 0) & (F.col("__n") > F.col("__d")),
        F.round(
            F.log(
                (F.col("__n") - F.col("__d")).cast("double")
                / F.col("__n").cast("double")
            ),
            12,
        ),
    ).otherwise(F.lit(0.0))
    cum_log = F.sum(step_log.cast("decimal(38,12)")).over(pre)
    hit_zero = F.max((F.col("__d") >= F.col("__n")).cast("int")).over(pre)
    return (
        stepped.withColumn("__slog", cum_log)
        .withColumn("__z", hit_zero)
        .where(F.col("__d") > 0)
        .select(
            F.col("__g").alias(group_col),
            F.col("__t").alias("t"),
            F.col("__n").cast("long").alias("n_at_risk"),
            F.col("__d").cast("long").alias("n_events"),
            F.col("__c").cast("long").alias("n_censored"),
            F.when(F.col("__z") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("__slog").cast("double")), 6))
            .alias("survival"),
        )
    )


def benford_digits(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law first-significant-digit screen over a POSITIVE
    integer column — the classic forensic data-quality check for
    fabricated or truncated numeric data (naturally-occurring
    multi-magnitude amounts follow P(d) = log10(1 + 1/d)).

    The leading digit is extracted from the integer's decimal string
    (``substr(cast(v as string), 1, 1)``) — pure integer/string ops,
    no float log10, so the bucketing is engine-exact. Output per digit
    1-9: observed count, observed frequency (one pinned division,
    round 9), Benford expectation (round 9), and the signed deviation.

    Scale shape: one map-side-combined aggregate to a 9-row frame and
    a 1-row total ridden along by a broadcast join.
    """
    import math

    v = F.col(value_col).cast("long")
    digits = (
        df.where(v.isNotNull() & (v > 0))
        .groupBy(F.substring(v.cast("string"), 1, 1).alias("digit"))
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    tot = digits.agg(F.sum("observed").alias("__n"))
    expected = F.element_at(
        F.array(
            *[F.lit(round(math.log10(1 + 1 / d), 9)) for d in range(1, 10)]
        ),
        F.col("digit").cast("int"),
    )
    freq = F.round(
        F.col("observed").cast("double") / F.col("__n").cast("double"), 9
    )
    return (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "observed",
            freq.alias("frequency"),
            expected.alias("benford_expected"),
            F.round(freq - expected, 9).alias("deviation"),
        )
        .orderBy("digit")
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    trim_num: int = 1,
    trim_den: int = 20,
    out_scale_den: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group symmetric trimmed mean in EXACT integer arithmetic —
    the robust central-tendency screen between the mean (outlier
    sensitive) and the median (throws away too much): drop the lowest
    and highest ``floor(n * trim_num/trim_den)`` values, average the
    rest.

    ``value_col`` must be integer (cents grid). The per-value overlap
    of the sorted-position interval [C_prev, C] with the kept band
    [k, n-k] is computed on the value-aggregated frame, so ties need
    no per-row ranking and the kept-sum folds in decimal(38,0). The
    single float step divides kept-sum by (kept-count *
    ``out_scale_den``) — pass out_scale_den=100 to emit dollars from
    cents and keep ``|mean| * 10^round_digits`` inside the exact
    double range (the ewma_smooth parity rule).

    Scale shape: one map-side-combined aggregate to the (group,
    distinct value) frame, one group-partitioned window over that
    frame, one final per-group aggregate.
    """
    if not (0 <= trim_num * 2 < trim_den):
        raise ValueError("need trim fraction in [0, 0.5)")
    per_val = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("long").alias("__v"),
        )
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__c"))
    )
    pre = (
        Window.partitionBy("__g")
        .orderBy(F.asc("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = Window.partitionBy("__g")
    cum = per_val.withColumn("__cumc", F.sum("__c").over(pre)).withColumn(
        "__n", F.sum("__c").over(grp)
    )
    k = F.floor(
        (F.col("__n") * F.lit(trim_num) / F.lit(trim_den)).cast("double")
    ).cast("decimal(38,0)")
    lo_pos = F.col("__cumc") - F.col("__c")  # values before this block
    kept_lo = F.greatest(lo_pos, k)
    kept_hi = F.least(F.col("__cumc"), F.col("__n") - k)
    kept_cnt = F.greatest(kept_hi - kept_lo, F.lit(0).cast("decimal(38,0)"))
    agg = cum.groupBy("__g").agg(
        F.sum(kept_cnt * F.col("__v").cast("decimal(38,0)")).alias("__s"),
        F.sum(kept_cnt).alias("__kept"),
        F.max("__n").alias("__nn"),
        F.max(k).alias("__k"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__nn").cast("long").alias("n_rows"),
        F.col("__k").cast("long").alias("n_trimmed_each_side"),
        F.when(
            F.col("__kept") > 0,
            F.round(
                F.col("__s").cast("double")
                / (F.col("__kept") * F.lit(out_scale_den)).cast("double"),
                round_digits,
            ),
        ).alias("trimmed_mean"),
    )


def l_diversity(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    *,
    l: int = 2,
) -> DataFrame:
    """l-diversity profile — :func:`k_anonymity`'s stronger sibling:
    an equivalence class can be large (k-anonymous) yet leak the
    sensitive attribute if every member shares one sensitive value.
    A class is l-diverse when it contains at least ``l`` DISTINCT
    sensitive values.

    Returns one row per distinct (class_size, n_sensitive) pair:
    (class_size, n_sensitive, n_classes, n_rows, at_risk) with
    ``at_risk = n_sensitive < l`` — the joint histogram, from which
    the l the table actually satisfies (min n_sensitive) and the
    leaking row count read off directly. NULL is a value on both
    sides (SQL GROUP BY semantics).

    Scale shape: one map-side-combined aggregate to the (QI class x
    sensitive value) frame, one to the class table, one to the
    histogram — each strictly smaller than the last; the fact table
    is scanned once and never shuffled wider than the QI+sensitive
    key.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if l < 1:
        raise ValueError("l must be >= 1")
    per_val = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("__sv")
    ).agg(F.count(F.lit(1)).alias("__c"))
    classes = per_val.groupBy(*qi_cols).agg(
        F.sum("__c").alias("class_size"),
        F.count(F.lit(1)).alias("n_sensitive"),
    )
    return (
        classes.groupBy("class_size", "n_sensitive")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .select(
            F.col("class_size").cast("long").alias("class_size"),
            F.col("n_sensitive").cast("long").alias("n_sensitive"),
            "n_classes",
            (F.col("class_size") * F.col("n_classes"))
            .cast("long")
            .alias("n_rows"),
            (F.col("n_sensitive") < l).alias("at_risk"),
        )
        .orderBy("class_size", "n_sensitive")
    )


def ntile_global(
    df: DataFrame,
    value_col: str,
    *,
    n_tiles: int = 10,
    scale: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global quantile binning WITHOUT the single-partition window
    that SQL ``NTILE(k) OVER (ORDER BY x)`` requires — the feature
    bucketizer / score-band transform at scale. VALUE-BASED: every
    row with the same value lands in the same bin (row-based NTILE
    splits ties arbitrarily across bins, which is layout-dependent
    and unreproducible); bin = floor(n_smaller * k / N) over the
    distinct-value CDF from the :func:`percentile_ranks` distributed
    prefix sum.

    Returns the bin summary (bin, n_rows, min_value_q, max_value_q)
    — join :func:`percentile_ranks` back on value_q for the per-row
    transform. Bins are 0..k-1; skew can leave some bins empty (a
    value holding more than N/k rows swallows its whole band), which
    is the honest value-based semantics.

    Scale shape: everything after the map-side-combined aggregate
    operates on the distinct-value frame; the only collect is the
    #partitions-row offsets frame.
    """
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    cdf = percentile_ranks(
        df, value_col, scale=scale, num_partitions=num_partitions
    )
    # n_total = n_smaller + n_rows_at on the LAST value; reconstruct
    # without another pass: every row carries the same total via
    # max over the frame? Avoid a window: total = sum(n_rows_at).
    tot = cdf.agg(F.sum("n_rows_at").alias("__N"))
    binned = cdf.crossJoin(F.broadcast(tot)).withColumn(
        "bin",
        F.floor(
            F.col("n_smaller") * F.lit(n_tiles) / F.col("__N")
        ).cast("int"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("n_rows_at").cast("long").alias("n_rows"),
            F.min("value_q").alias("min_value_q"),
            F.max("value_q").alias("max_value_q"),
        )
        .orderBy("bin")
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a probabilistic classifier — the
    calibration half of classifier evaluation (:func:`roc_auc` is the
    ranking half): bucket predictions by predicted probability and
    compare each bucket's mean prediction to its observed positive
    rate.

    ``prob_col`` is expected on a fixed decimal grid (e.g. the
    round(6) output of ``classifier_score``) so the per-bin mean is
    an exact decimal(38,6) sum with ONE pinned division; the bin
    index floor(p * n_bins) (clamped to n_bins-1) is an IEEE multiply
    of identical doubles on any engine. ``observed_rate`` and ``gap``
    (observed - predicted) are pinned divisions rounded to 9.

    Scale shape: one map-side-combined aggregate to an n_bins-row
    frame. Nothing else.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    lab = F.col(label_col).cast("long")
    p = F.col(prob_col).cast("double")
    bin_col = F.least(
        F.floor(p * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    agg = (
        df.where(p.isNotNull() & lab.isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lab).alias("n_pos"),
            F.sum(p.cast("decimal(38,6)")).alias("__sp"),
        )
    )
    mean_prob = F.round(
        F.col("__sp").cast("double") / F.col("n").cast("double"), 9
    )
    observed = F.round(
        F.col("n_pos").cast("double") / F.col("n").cast("double"), 9
    )
    return agg.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        mean_prob.alias("mean_prob"),
        observed.alias("observed_rate"),
        F.round(observed - mean_prob, 9).alias("gap"),
    ).orderBy("bin")


def global_prefix_sum(
    df: DataFrame,
    order_cols: Sequence,
    value_col: str,
    *,
    out_col: str = "cum",
    rank_col: str | None = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` over a total order,
    WITHOUT a single-partition window — the third reusable form of the
    distributed prefix sum (:func:`global_row_number` counts rows,
    :func:`percentile_ranks` builds a CDF; this one folds an arbitrary
    additive measure — token counts, bytes, revenue).

    ``order_cols`` must be a deterministic TOTAL order (include a
    tie-break). Appends ``out_col`` (decimal cumulative sum including
    the current row) and, when ``rank_col`` is set, the 1-based global
    position. Shape: range partition on the order, partition-local
    window sums keyed by partition id, one #partitions-row collect,
    broadcast-added offsets (localCheckpoint-pinned boundaries).
    """
    cols = list(order_cols)
    if not cols:
        raise ValueError("order_cols must be non-empty")
    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    v = F.col(value_col).cast("decimal(38,0)")
    local_w = Window.partitionBy("__pid").orderBy(*cols)
    local = (
        df.repartitionByRange(nparts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lcum",
            F.sum(v).over(
                local_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("__lrn", F.row_number().over(local_w))
        .localCheckpoint()
    )
    pstats = sorted(
        local.groupBy("__pid")
        .agg(F.sum(v).alias("__s"), F.count(F.lit(1)).alias("__c"))
        .collect(),
        key=lambda r: r["__pid"],
    )
    from decimal import Decimal

    offsets, cum, cnt = [], 0, 0
    for r in pstats:
        offsets.append((r["__pid"], Decimal(cum), cnt))
        cum += int(r["__s"] or 0)
        cnt += int(r["__c"])
    off_df = spark.createDataFrame(
        offsets or [(0, Decimal(0), 0)],
        "__pid int, __voff decimal(38,0), __roff long",
    )
    out = (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__lcum") + F.col("__voff")))
        .drop("__voff")
    )
    if rank_col is not None:
        out = out.withColumn(
            rank_col, (F.col("__lrn") + F.col("__roff")).cast("long")
        )
    return out.drop("__pid", "__lcum", "__lrn", "__roff")


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    scale: int = 1000000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — the
    distribution-shift screen that catches what bucketed PSI
    (:func:`distribution_drift`) smooths over: KS = max over the
    merged support of |F_a(v) - F_b(v)|.

    Cleared of division: with cumulative counts A(v), B(v) and totals
    n_a, n_b, the statistic's numerator ``max |A(v)*n_b - B(v)*n_a|``
    is exact integer algebra on the (distinct value, count_a,
    count_b) frame; the single float step divides by n_a*n_b at the
    end (rounded to 9). Values are quantized to the ``scale`` grid
    (the _q contract).

    Scale shape: one map-side-combined aggregate to the merged
    distinct-value frame carrying BOTH group counts, then ONE
    distributed prefix-sum pass (range partition, __pid-keyed local
    windows, a #partitions-row two-measure offsets collect,
    broadcast-add) — the percentile_ranks shape generalized to two
    simultaneous measures — and a final 1-row max aggregate.

    Returns one row: (n_a, n_b, n_values, ks_num, ks) — NULL ks when
    either sample is empty.
    """
    g = F.col(group_col)
    q = _q(value_col, scale)
    tagged = df.where(
        F.col(value_col).isNotNull() & g.isin(group_a, group_b)
    ).select(
        q.alias("__v"),
        (g == F.lit(group_a)).cast("long").alias("__ia"),
        (g == F.lit(group_b)).cast("long").alias("__ib"),
    )
    per_val = tagged.groupBy("__v").agg(
        F.sum("__ia").alias("__ca"), F.sum("__ib").alias("__cb")
    )
    spark = df.sparkSession
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(F.asc("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        per_val.repartitionByRange(nparts, F.asc("__v"))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__la", F.sum("__ca").over(local_w))
        .withColumn("__lb", F.sum("__cb").over(local_w))
        .localCheckpoint()
    )
    pstats = sorted(
        local.groupBy("__pid")
        .agg(F.sum("__ca").alias("__sa"), F.sum("__cb").alias("__sb"))
        .collect(),
        key=lambda r: r["__pid"],
    )
    offsets, ca, cb = [], 0, 0
    for r in pstats:
        offsets.append((r["__pid"], ca, cb))
        ca += int(r["__sa"] or 0)
        cb += int(r["__sb"] or 0)
    n_a, n_b = ca, cb
    off_df = spark.createDataFrame(
        offsets or [(0, 0, 0)], "__pid int, __oa long, __ob long"
    )
    # The products A(v)*n_b and B(v)*n_a must fold in decimal(38,0)
    # BEFORE the multiplication: in non-ANSI Spark a long*long overflow
    # wraps silently, so for n_a*n_b >= 2^63 (~3e9 rows per class) a
    # long-arithmetic numerator would be silently wrong. Casting only
    # the RESULT to decimal (the old shape) does not help — the wrap
    # has already happened. Same discipline as gini_by/trimmed_mean.
    dec = "decimal(38,0)"
    cum_a = (F.col("__la") + F.col("__oa")).cast(dec)
    cum_b = (F.col("__lb") + F.col("__ob")).cast(dec)
    dev = F.abs(
        cum_a * F.lit(n_b).cast(dec) - cum_b * F.lit(n_a).cast(dec)
    )
    out = local.join(F.broadcast(off_df), "__pid").agg(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.max(dev).alias("__ksd"),
    )
    # ks is computed from the exact decimal numerator with each factor
    # cast to double INDIVIDUALLY (n_a*n_b as longs would wrap at the
    # same 2^63 boundary); ks_num stays a long diagnostic column —
    # exact whenever it fits, while the ks ratio is correct regardless.
    return out.select(
        "n_a",
        "n_b",
        "n_values",
        F.col("__ksd").cast("long").alias("ks_num"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.col("__ksd").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                9,
            ),
        ).alias("ks"),
    )


def mutual_info_scan(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Mutual information of EVERY candidate feature column against a
    label, in ONE plan — the feature-relevance / target-leakage
    screen run before training ("which metadata columns predict the
    label suspiciously well?"). Same exact-fold discipline as
    :func:`mutual_information` (integer-count log2 terms, per-feature
    ascending sorted fold), generalized: features melt into
    (feature, value) rows via one explode, so adding a feature adds a
    projection column, not a pass.

    Feature values are compared as strings (categorical contract —
    bucket continuous columns first). Rows where the label or the
    feature value is NULL are excluded per feature.

    Returns one row per feature: (feature, n_rows, n_cells, mi_bits),
    ordered by descending mi_bits (most label-coupled first).

    Scale shape: one explode (|features| x rows, map-local) into an
    (feature, value, label) hash aggregate; marginals are rollups OF
    THE CELL TABLE joined back shuffle_hash; each feature's sorted
    fold is its own cell-table-sized list.
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    melt = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("f"),
                    F.col(c).cast("string").alias("v"),
                )
                for c in feature_cols
            ]
        )
    )
    base = (
        df.where(F.col(label_col).isNotNull())
        .select(F.col(label_col).cast("string").alias("__y"), melt.alias("__m"))
        .select("__y", F.col("__m.f").alias("__f"), F.col("__m.v").alias("__v"))
        .where(F.col("__v").isNotNull())
    )
    cells = base.groupBy("__f", "__v", "__y").agg(
        F.count(F.lit(1)).alias("__cxy")
    )
    ca = cells.groupBy(
        F.col("__f").alias("__fa"), F.col("__v").alias("__va")
    ).agg(F.sum("__cxy").alias("__ca"))
    cb = cells.groupBy(
        F.col("__f").alias("__fb"), F.col("__y").alias("__yb")
    ).agg(F.sum("__cxy").alias("__cb"))
    tot = cells.groupBy(F.col("__f").alias("__ft")).agg(
        F.sum("__cxy").alias("__N"), F.count(F.lit(1)).alias("n_cells")
    )
    term = (
        F.col("__cxy").cast("double")
        * (
            F.log2(F.col("__cxy").cast("double"))
            + F.log2(F.col("__N").cast("double"))
            - F.log2(F.col("__ca").cast("double"))
            - F.log2(F.col("__cb").cast("double"))
        )
    ).alias("__term")
    joined = (
        cells.join(
            ca.hint("shuffle_hash"),
            (F.col("__f") == F.col("__fa")) & (F.col("__v") == F.col("__va")),
        )
        .join(
            cb.hint("shuffle_hash"),
            (F.col("__f") == F.col("__fb")) & (F.col("__y") == F.col("__yb")),
        )
        .join(
            tot.hint("shuffle_hash"), F.col("__f") == F.col("__ft")
        )
        .select("__f", "__N", "n_cells", term)
    )
    folded = joined.groupBy("__f", "__N", "n_cells").agg(
        F.sort_array(F.collect_list("__term")).alias("__ts")
    )
    fold = F.aggregate("__ts", F.lit(0.0), lambda acc, t: acc + t)
    return folded.select(
        F.col("__f").alias("feature"),
        F.col("__N").cast("long").alias("n_rows"),
        "n_cells",
        F.round(fold / F.col("__N").cast("double"), 6).alias("mi_bits"),
    ).orderBy(F.desc("mi_bits"), "feature")


def winsorized_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    trim_num: int = 1,
    trim_den: int = 20,
    out_scale_den: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group winsorized mean — :func:`trimmed_mean`'s clamping
    sibling: instead of DROPPING the k lowest/highest values, they are
    REPLACED by the boundary values (the (k+1)-th from each end), so
    n stays the denominator and extreme rows still count once at a
    capped magnitude (the estimator of choice when row count carries
    meaning — revenue per account with a few whales).

    Same exact value-aggregated machinery: interior mass via the
    [k, n-k] band overlap, plus k copies of each boundary value found
    by cumulative-count threshold (min value with cum >= k+1 / max
    value whose block starts below n-k). decimal(38,0) sums, one
    pinned division, ``out_scale_den``/``round_digits`` follow the
    trimmed_mean parity rule.
    """
    if not (0 <= trim_num * 2 < trim_den):
        raise ValueError("need trim fraction in [0, 0.5)")
    per_val = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("long").alias("__v"),
        )
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__c"))
    )
    pre = (
        Window.partitionBy("__g")
        .orderBy(F.asc("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = Window.partitionBy("__g")
    cum = per_val.withColumn("__cumc", F.sum("__c").over(pre)).withColumn(
        "__n", F.sum("__c").over(grp)
    )
    k = F.floor(
        (F.col("__n") * F.lit(trim_num) / F.lit(trim_den)).cast("double")
    ).cast("decimal(38,0)")
    lo_pos = F.col("__cumc") - F.col("__c")
    kept_lo = F.greatest(lo_pos, k)
    kept_hi = F.least(F.col("__cumc"), F.col("__n") - k)
    kept_cnt = F.greatest(kept_hi - kept_lo, F.lit(0).cast("decimal(38,0)"))
    vdec = F.col("__v").cast("decimal(38,0)")
    agg = cum.groupBy("__g").agg(
        F.sum(kept_cnt * vdec).alias("__s"),
        F.max("__n").alias("__nn"),
        F.max(k).alias("__k"),
        F.min(F.when(F.col("__cumc") >= k + 1, F.col("__v"))).alias("__vlo"),
        F.max(F.when(lo_pos < F.col("__n") - k, F.col("__v"))).alias("__vhi"),
    )
    total = (
        F.col("__s")
        + F.col("__k") * F.col("__vlo").cast("decimal(38,0)")
        + F.col("__k") * F.col("__vhi").cast("decimal(38,0)")
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__nn").cast("long").alias("n_rows"),
        F.col("__k").cast("long").alias("n_clamped_each_side"),
        F.when(
            F.col("__nn") > 0,
            F.round(
                total.cast("double")
                / (F.col("__nn") * F.lit(out_scale_den)).cast("double"),
                round_digits,
            ),
        ).alias("winsorized_mean"),
    )


def wilson_ci(
    df: DataFrame,
    group_col: str,
    success_col: str,
    *,
    z_num: int = 196,
    z_den: int = 100,
) -> DataFrame:
    """Per-group binomial proportion with the Wilson score interval —
    the small-sample-safe confidence band for conversion/defect rates
    (the plain Wald interval collapses at p near 0/1; Wilson is the
    standard fix, e.g. for ranked "conversion by segment" tables
    where tiny segments must not look artificially certain).

    ``success_col`` is 0/1. z is passed as an exact rational
    (``z_num/z_den``, default 1.96); with n trials and k successes,
    center = (k + z^2/2) / (n + z^2) and halfwidth =
    z*sqrt(k(n-k)/n + z^2/4) / (n + z^2). Clearing z^2 = z_num^2 /
    z_den^2 turns every term into exact integer algebra over
    (k, n, z_num, z_den); the float steps are one sqrt and two pinned
    divisions, rounded to 9.

    Returns (group, n, k, rate, ci_low, ci_high), rate = k/n pinned.

    Scale shape: one map-side-combined aggregate to the group frame.
    """
    s = F.col(success_col).cast("long")
    agg = (
        df.where(s.isNotNull())
        .groupBy(F.col(group_col).alias("__g"))
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(s).alias("__k"))
    )
    # scale all terms by z_den^2: zz = z_num^2; N' = n*z_den^2 + z_num^2
    zz = z_num * z_num
    dd = z_den * z_den
    n = F.col("__n").cast("decimal(38,0)")
    k = F.col("__k").cast("decimal(38,0)")
    denom = (n * dd + zz).cast("double")
    center_num = (k * dd + F.lit(zz) / F.lit(2.0)).cast("double")
    # halfwidth numerator: z * sqrt(k(n-k)/n + z^2/4), scaled by dd:
    # z_num*z_den*sqrt( k(n-k)/n + zz/(4 dd) )
    inner = (
        (k * (n - k)).cast("double") / n.cast("double")
        + F.lit(zz) / F.lit(4.0 * dd)
    )
    half = F.lit(float(z_num) * z_den) * F.sqrt(inner)
    rate = F.round(k.cast("double") / n.cast("double"), 9)
    lo = F.round((center_num - half) / denom, 9)
    hi = F.round((center_num + half) / denom, 9)
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("long").alias("n"),
        F.col("__k").cast("long").alias("k"),
        rate.alias("rate"),
        F.greatest(lo, F.lit(0.0)).alias("ci_low"),
        F.least(hi, F.lit(1.0)).alias("ci_high"),
    ).orderBy(group_col)
