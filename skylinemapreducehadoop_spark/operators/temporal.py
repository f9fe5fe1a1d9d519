"""Temporal join operators: as-of join and range join.

Spark has no native ASOF JOIN; the naive formulation (inequality-only
theta join + row_number) degenerates to a broadcast nested-loop or
cartesian product. Both operators here are scale-safe by construction:

- ``asof_join``: the union-and-window technique — tag left/right rows,
  union them, sort within each ``by`` partition by (ts, side), and
  carry the latest right row forward with ``last(ignorenulls=True)``.
  One shuffle on ``by``, one window sort; no join node at all. This is
  the standard log-merge formulation of as-of semantics (each left row
  matches the greatest right ts <= its ts).
- ``range_join``: band-bucketing — bucket both sides by
  ``floor(ts / width)`` where width = the range upper bound, equi-join
  on (by, bucket) with the right side exploded to adjacent buckets,
  then apply the exact range predicate. Turns an inequality join into
  an equi-join with fan-out 2, which Catalyst executes as a hash join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str | Sequence[str],
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` value <= the left row's (within the same ``by`` group);
    right columns arrive suffixed, NULL when no match exists.

    Backward as-of semantics, ties on ``on`` match (right sorts before
    left at equal timestamps).
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    carry_cols = [*right_cols, on]

    # carry ONE struct of all right columns: last(ignorenulls) over the
    # struct is NULL only for "no right row yet", so a matched right
    # row's NULL *field* is attached as-is instead of being backfilled
    # from an older right row (per-column carry mixed fields across rows)
    right_types = {f.name: f.dataType for f in right.schema.fields}
    r_struct_type = T.StructType(
        [T.StructField(c, right_types[c], True) for c in carry_cols]
    )

    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(r_struct_type)
    )
    r_tag = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in carry_cols]).alias("__r"),
    )
    for c in left.columns:
        if c not in by and c != on:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)

    # right rows (side=0) sort before left rows at equal ts, so a
    # same-timestamp right row is visible to the left row
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    return carried.where(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col("__r").getField(c).alias(f"{c}{suffix}") for c in carry_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    by: str | Sequence[str],
    lower_seconds: float,
    upper_seconds: float,
) -> DataFrame:
    """Pairs where ``lower < right_on - left_on <= upper`` within the
    same ``by`` group, as a bucketed hash equi-join (no theta join).

    Returns left columns + right columns suffixed ``_r`` where names
    collide.
    """
    if upper_seconds <= 0:
        raise ValueError(f"upper_seconds must be > 0, got {upper_seconds}")
    if lower_seconds < 0:
        raise ValueError(
            "lower_seconds must be >= 0 (right-before-left pairs would "
            f"need a wider bucket explosion), got {lower_seconds}"
        )
    if lower_seconds >= upper_seconds:
        raise ValueError("lower_seconds must be < upper_seconds")
    by = [by] if isinstance(by, str) else list(by)
    width = int(upper_seconds * 1_000_000)  # microsecond buckets
    lo_us = int(lower_seconds * 1_000_000)
    up_us = int(upper_seconds * 1_000_000)

    l = left.withColumn("__b", (F.unix_micros(F.col(left_on)) / width).cast("long"))
    # right rows land in their own bucket and the previous one, so every
    # in-range (left, right) pair shares a bucket key exactly once after
    # the range filter
    r = right.withColumn(
        "__bs",
        F.array(
            (F.unix_micros(F.col(right_on)) / width).cast("long"),
            (F.unix_micros(F.col(right_on)) / width).cast("long") - 1,
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")

    rename = {
        c: f"{c}_r" for c in r.columns if c in set(l.columns) and c not in by and c != "__b"
    }
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    right_on_out = rename.get(right_on, right_on)

    # shuffle_hash: both sides are stream-sized fact tables — never
    # let a compile-time size misestimate broadcast one (AQE still
    # upgrades to broadcast when a side is measured small at runtime)
    joined = l.join(r.hint("shuffle_hash"), on=[*by, "__b"], how="inner")
    delta = F.unix_micros(F.col(right_on_out)) - F.unix_micros(F.col(left_on))
    return joined.where((delta > F.lit(lo_us)) & (delta <= F.lit(up_us))).drop("__b")


def gapfill_time_series(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    by: str | Sequence[str] = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Time-bucketed aggregation with GAP FILLING and forward fill —
    the timescale-style `time_bucket_gapfill` + `locf` shape: missing
    buckets inside each group's [min, max] span materialize with
    n_events = 0, and `sum_value_filled` carries the last non-empty
    bucket's sum forward.

    Scale shape: the grid is generated per group with
    ``sequence(min, max, interval)`` (one agg + one explode — grid
    size is span/bucket per group, never data-sized), joined back as
    a hash equi-join on (group, bucket), then a single per-group
    window pass for the forward fill. Aggregates fold in decimal and
    cast to double once at the edge (cross-engine exactness).
    """
    by = [by] if isinstance(by, str) else list(by)

    bucketed = df.groupBy(
        *by, F.window(ts_col, bucket).start.alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(20,4)")).alias("__sv"),
    )
    spans = bucketed.groupBy(*by).agg(
        F.min("bucket_start").alias("__mn"), F.max("bucket_start").alias("__mx")
    )
    grid = spans.select(
        *by,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket_start"),
    )
    full = grid.join(bucketed, [*by, "bucket_start"], "left")
    w = (
        Window.partitionBy(*by)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return full.select(
        *by,
        "bucket_start",
        F.coalesce("__n", F.lit(0)).alias("n_events"),
        F.last("__sv", ignorenulls=True).over(w).cast("double").alias("sum_value_filled"),
    )


def scd2_from_changelog(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a slowly-changing-dimension (SCD type 2) version history
    from a change log: collapse consecutive equal values per key and
    emit one row per version — (key, value, valid_from, valid_to,
    is_current), half-open intervals, ``valid_to`` NULL on the open
    version.

    ``order_cols`` breaks timestamp ties deterministically (pass a
    unique id) so the history is identical under any partitioning.
    One shuffle on the key; two window passes (lag to find change
    points, lead to close intervals) over the same sort — Spark reuses
    the sorted partition between them.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    marked = df.select(key_col, value_col, ts_col, *order_cols).withColumn(
        "__prev", F.lag(value_col).over(w)
    )
    changes = marked.where(
        F.col("__prev").isNull()
        | ~F.col(value_col).eqNullSafe(F.col("__prev"))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    out = changes.select(
        key_col,
        value_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def trailing_time_stats(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    by: str | Sequence[str] = "user_id",
    value_col: str = "value",
    duration: str = "1 hour",
) -> DataFrame:
    """Per-ROW trailing-window aggregates: for every event, the count
    and sum of ``value_col`` over [ts - duration, ts] within its
    ``by`` group (both bounds inclusive — the fraud/rate-limit
    feature shape, computed in one window pass rather than a
    self-join).

    The range frame orders on epoch MICROSECONDS (Spark's rangeBetween
    needs a numeric key; the microsecond frame is exact where a
    seconds frame would truncate). Sums fold in decimal so rows tied
    on the timestamp produce the same total under any partition
    storage order (float partial-sum order is nondeterministic).
    """
    by = [by] if isinstance(by, str) else list(by)
    span_us = -int(pd_timedelta(duration).total_seconds() * 1_000_000)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(span_us, 0)
    )
    return df.select(
        *by,
        ts_col,
        value_col,
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        F.sum(F.col(value_col).cast("decimal(20,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_sum"),
    )


def pd_timedelta(duration: str):
    """Parse '1 hour' / '15 minutes' style durations via pandas."""
    import pandas as pd

    return pd.Timedelta(duration)


def interval_concurrency(
    df: DataFrame,
    *,
    by: str | Sequence[str],
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Sweep-line maximum concurrency per ``by`` group: the largest
    number of intervals simultaneously open (end-EXCLUSIVE — an
    interval ending exactly when another starts does not overlap it).
    The capacity-planning / peak-load primitive. Returns
    ``(by..., max_concurrent)``.

    Start/end are NUMERIC columns (e.g. ``unix_micros`` of timestamps)
    so the sweep needs no timestamp arithmetic; empty and negative
    intervals (end <= start) are dropped.

    Plan: union (+1 at start, -1 at end) delta rows — 2n rows, no join
    — then ONE window running-sum per group ordered by (time, delta)
    (-1 first on ties = the end-exclusive rule) and a max aggregate.
    One shuffle on ``by``, one per-group sort: the sweep-line
    formulation every interval-scheduling engine reduces to, and the
    only all-built-in O(n log n) shape — an interval self-join would be
    O(n * max_concurrency) and skew-bound at 100 TB.
    """
    keys = [by] if isinstance(by, str) else list(by)
    base = df.where(F.col(end_col) > F.col(start_col))
    deltas = base.select(
        *keys, F.col(start_col).alias("__t"), F.lit(1).alias("__d")
    ).unionByName(
        base.select(*keys, F.col(end_col).alias("__t"), F.lit(-1).alias("__d"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        deltas.withColumn("__run", F.sum("__d").over(w))
        .groupBy(*keys)
        .agg(F.max("__run").alias("max_concurrent"))
    )


def event_transitions(
    df: DataFrame,
    *,
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = ...,  # ... = unset (distinct from explicit)
    prob_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition statistics over per-entity event
    sequences: for every ordered pair of consecutive event types within
    a ``by`` group, the global count and the conditional probability
    P(to | from). Returns (from_type, to_type, cnt, prob) — the
    session-modeling / next-event-prediction summary.

    Ordering inside a group is (ts, tiebreak) so simultaneous events
    sequence deterministically. One window shuffle on ``by`` (lead),
    then one hash aggregate on the (from, to) pair; the per-from totals
    ride on a window over the pair aggregate, which is tiny (|types|²),
    so no second pass over the data. ``prob`` is one float division on
    exact integer counts, rounded — engine-exact.

    The DEFAULT tiebreak column (``event_id``) is applied only when the
    frame actually has it — frames without one still work, with the
    caveat that simultaneous events (equal ``ts`` within a group)
    sequence in an unspecified order; pass an explicit ``tiebreak_col``
    for full determinism. An EXPLICITLY-passed column that is absent
    raises immediately with a clear message (the unset default is the
    ``...`` sentinel, so an explicit ``tiebreak_col="event_id"`` is a
    hard requirement, not a preference).
    """
    if tiebreak_col is ...:  # unset: use event_id when present
        tiebreak_col = "event_id" if "event_id" in df.columns else None
    elif tiebreak_col is not None and tiebreak_col not in df.columns:
        raise ValueError(
            f"tiebreak_col {tiebreak_col!r} is not a column of the input "
            f"frame (columns: {df.columns}); pass tiebreak_col=None to "
            f"order by ts only"
        )
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(by).orderBy(*order)
    steps = (
        df.select(by, ts_col, *( [tiebreak_col] if tiebreak_col else [] ), type_col)
        .withColumn("__next", F.lead(type_col).over(w))
        .where(F.col("__next").isNotNull())
    )
    pairs = steps.groupBy(
        F.col(type_col).alias("from_type"), F.col("__next").alias("to_type")
    ).agg(F.count("*").alias("cnt"))
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(
            F.col("cnt").cast("double") / F.sum("cnt").over(wf).cast("double"),
            prob_digits,
        ).alias("prob"),
    )


def time_weighted_avg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    by: str | Sequence[str] = "event_type",
    value_col: str = "value",
    value_scale: int = 1_000_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-group TIME-weighted average of an observation series (the
    timescale `time_weight('locf')` shape): each observation holds
    until the next one, so ``twap = Σ vᵢ·Δtᵢ / Σ Δtᵢ`` with Δt in
    exact epoch microseconds; the last observation carries no weight
    (the series has no close bound). A plain AVG over irregular
    samples over-weights bursts — this is the correct mean for
    sensor/price/state series. Returns (by..., n_obs, span_us, twap);
    single-observation groups have span 0 and NULL twap.

    Exactness: values quantize to the integer grid once
    (``round(v*scale)``), every vᵢ·Δtᵢ product accumulates as
    decimal(38,0), and the two closing double divisions are identical
    on any engine — the ``stats.py`` discipline. Ordering ties on the
    timestamp are broken by ``tiebreak_col`` when given (zero-width
    intervals make ties harmless for the SUM, but deterministic order
    keeps lead() reproducible).

    Shape: ONE per-group window (lead) + one hash aggregate; the sort
    is per-group (bounded by observations per key), never global.
    """
    by = [by] if isinstance(by, str) else list(by)
    us = F.unix_micros(F.col(ts_col))
    order = [us] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*by).orderBy(*order)
    vq = F.round(F.col(value_col) * F.lit(value_scale)).cast("long")
    delta = (F.lead(us).over(w) - us).alias("__dt")
    rows = df.where(F.col(value_col).isNotNull()).select(
        *by, vq.alias("__vq"), delta
    )
    dec = "decimal(38,0)"
    agg = rows.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("__dt").alias("span_us"),
        F.sum(
            (F.col("__vq").cast(dec) * F.col("__dt").cast(dec)).cast(dec)
        ).alias("__sw"),
    )
    twap = F.when(
        F.col("span_us") > 0,
        F.round(
            F.col("__sw").cast("double")
            / F.col("span_us").cast("double")
            / F.lit(float(value_scale)),
            6,
        ),
    )
    return agg.select(
        *by,
        "n_obs",
        F.coalesce("span_us", F.lit(0)).alias("span_us"),
        twap.alias("twap"),
    )


def seasonal_anomalies(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    hi_num: int = 2,
    hi_den: int = 1,
    lo_num: int = 1,
    lo_den: int = 2,
) -> DataFrame:
    """Weekday-seasonality anomaly screen over an event stream: daily
    counts per key are compared against the mean of the SAME weekday's
    days for that key, and a day is flagged ``high`` when its count
    exceeds ``hi_num/hi_den`` times the weekday mean, ``low`` below
    ``lo_num/lo_den`` times it. The traffic-monitoring staple that a
    plain global z-score gets wrong (Sundays are always "anomalous"
    against a weekday-dominated mean).

    Both comparisons clear the division into exact integer arithmetic
    — ``c * n_dow * hi_den > hi_num * sum_dow`` — so the boundary can
    never flip with ulp noise and the flags are oracle-verifiable.
    Returns (key, day, dow, n_events, dow_days, dow_total, anomaly)
    with ``anomaly`` in {'high','low',NULL}; only non-NULL rows are
    typically consumed, but all days are returned so the caller owns
    the filter.

    Scale shape: one map-side-combined aggregate to (key, day) —
    bounded by keys x days, not events — one rollup of THAT to
    (key, dow), and a broadcast join back. The event table is scanned
    once.
    """
    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("__k"),
            F.to_date(ts_col).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("dow", F.dayofweek(F.col("day")))
    )
    dowstats = daily.groupBy("__k", "dow").agg(
        F.count(F.lit(1)).alias("dow_days"),
        F.sum("n_events").alias("dow_total"),
    )
    j = daily.join(F.broadcast(dowstats), ["__k", "dow"])
    c = F.col("n_events") * F.col("dow_days")
    anomaly = (
        F.when(c * F.lit(hi_den) > F.lit(hi_num) * F.col("dow_total"), "high")
        .when(c * F.lit(lo_den) < F.lit(lo_num) * F.col("dow_total"), "low")
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        F.col("__k").alias(key_col),
        "day",
        "dow",
        "n_events",
        "dow_days",
        "dow_total",
        anomaly.alias("anomaly"),
    )


def last_touch_attribution(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    conversion: str = "purchase",
    touches: Sequence[str] = ("click", "view"),
    max_lag: str | None = None,
) -> DataFrame:
    """Last-touch marketing attribution: for every conversion event,
    the most recent touch event (by ``touches`` type) from the SAME
    user strictly before it — the standard "which interaction gets
    credit" join a funnel pipeline runs after sessionization. Returns
    (event_id, user_id, ts, touch_event_id, touch_ts, lag_seconds);
    conversions with no prior touch (or none within ``max_lag``, e.g.
    ``'7 days'``) keep NULL touch columns.

    Implemented as ONE pass over the per-user event stream: a running
    ``last(touch, ignorenulls)`` window over (user, ts, id) ordering —
    no self-join, no per-conversion scan. "Before" means precedes in
    the total (ts, event_id) order: a touch sharing the conversion's
    timestamp counts iff its event id is smaller (deterministic tie
    rule, lag 0), which keeps the one-window plan exact instead of
    dropping valid earlier touches behind an equal-ts neighbor.

    Scale shape: the single window shuffles each user's events to one
    task — the sessionize/funnel partitioning, reusable across all
    three. No UDF; the frame is rows-bounded so state is O(1).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col).isin(*touches),
        F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id")),
    )
    last_t = F.last(touch, ignorenulls=True).over(w)
    got = df.withColumn("__lt", last_t).where(F.col(type_col) == conversion)
    keep = F.col("__lt").isNotNull()
    # exact integer micros diff, then ONE division — a per-timestamp
    # double cast would round each epoch separately and can move the
    # 6th decimal of the difference on 2026-era epochs
    lag_s = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__lt.ts"))
    ) / F.lit(1_000_000.0)
    if max_lag is not None:
        keep = keep & (
            F.col("__lt.ts") >= F.col(ts_col) - F.expr(f"INTERVAL {max_lag}")
        )
    return got.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.when(keep, F.col("__lt.id")).alias("touch_event_id"),
        F.when(keep, F.col("__lt.ts")).alias("touch_ts"),
        F.when(keep, F.round(lag_s, 6)).alias("lag_seconds"),
    )


def ewma_smooth(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    decay_num: int = 7,
    decay_den: int = 10,
    lookback: int = 12,
    out_col: str = "ewma",
    round_digits: int = 9,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per group, in
    EXACT integer arithmetic — the standard trend smoother for period
    metrics (daily volumes, monthly revenue) whose textbook recursion
    ``s_t = a*x_t + (1-a)*s_{t-1}`` is not window-expressible.

    The truncation makes it both window-expressible AND exact: with
    decay ``d = decay_num/decay_den`` (i.e. alpha = 1 - d) and a
    ``lookback`` of L observations, the weight of the k-th lag is
    ``d^k`` — rational, so scaling every weight by ``decay_den^(L-1)``
    gives INTEGER weights ``w_k = decay_num^k * decay_den^(L-1-k)``
    and ``ewma_t = sum_k w_k*x_{t-k} / sum_k w_k`` over the lags that
    exist. Every product folds in decimal(38,0); the single float step
    is the final division, rounded to 9 — engine-exact, unlike the
    recursive form whose float error depends on series length. The
    dropped tail carries weight ``d^L`` (~1.4% at the defaults) of an
    untruncated EWMA — the standard "effective window" truncation.

    ``value_col`` must be integer-valued (put money on the cents
    grid); ``order_col`` must be a deterministic per-group order.
    Semantics are over the OBSERVATION sequence (lag k = k-th previous
    row); run :func:`gapfill_time_series` first for calendar lags.

    ``round_digits`` bounds the output grid. The rounding itself is
    ENGINE-EXACT (r11): the half-up-rounded scaled integer is computed
    in exact decimal arithmetic (``_rounding.exact_round_div``) and the
    single float step divides that identical integer by 10^d — the r11
    sf0.1 sweep caught the previous double-round shape emitting
    …2140 vs …2139 across engines when the exact rational landed on a
    .5 tie at digit 4. Budget: ``|ewma| * 10^round_digits`` must fit a
    BIGINT (~9.2e18), far above any cents-grid aggregate.

    Scale shape: ONE window pass (one Exchange on the group, one sort)
    evaluates all L lag expressions — static codegen, no self-join, no
    iteration. Per-task state is one partition's rows, as any ordered
    per-key scan must be.
    """
    if lookback < 1:
        raise ValueError("lookback must be >= 1")
    if not (0 < decay_num < decay_den):
        raise ValueError("need 0 < decay_num < decay_den (decay in (0,1))")
    w = Window.partitionBy(group_col).orderBy(order_col)
    x = F.col(value_col).cast("decimal(38,0)")
    weights = [
        decay_num**k * decay_den ** (lookback - 1 - k) for k in range(lookback)
    ]
    num = None
    den = None
    for k, wk in enumerate(weights):
        lagged = F.lag(x, k).over(w) if k else x
        wk_lit = F.lit(wk).cast("decimal(38,0)")
        term = F.coalesce(lagged, F.lit(0).cast("decimal(38,0)")) * wk_lit
        have = F.when(lagged.isNotNull(), wk_lit).otherwise(
            F.lit(0).cast("decimal(38,0)")
        )
        num = term if num is None else num + term
        den = have if den is None else den + have
    from skylinemapreducehadoop_spark.operators._rounding import (
        exact_round_div,
    )

    return exact_round_div(
        df, num, den, round_digits, out_col, prefix="__ewma"
    )


def position_attribution(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    conversion: str = "purchase",
    touches: Sequence[str] = ("click", "view"),
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the
    complement of :func:`last_touch_attribution`: every touch in the
    journey leading to a conversion gets credit, weighted 40% first /
    40% last / 20% split across the middle (the standard U-curve).
    A journey is the run of a user's touch events since their
    previous conversion (exclusive) up to the converting event.

    Credits are EXACT rationals — 1 (single touch), 1/2 each (two
    touches), else 2/5 for first and last and 1/(5*(k-2)) for each
    middle — emitted through one pinned integer division rounded to
    9, so the frame is engine-exact and each journey's credits sum to
    1 (up to the output rounding).

    Output: (user_id, conversion_event_id, touch_event_id,
    touch_type, position, n_touches, credit), touches ordered by the
    total (ts, event_id) order within the journey; conversions with
    no prior touch in their journey contribute no rows.

    Scale shape: ONE window partitioning (user, ordered by ts/id)
    computes the journey index as a running conversion count; the
    touch->conversion pairing is an equi-join on (user, journey) —
    both sides journey-bounded, no theta join; positions come from a
    (user, journey)-partitioned window, bounded by journey length.
    """
    is_conv = (F.col(type_col) == conversion).cast("long")
    pre = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = df.withColumn(
        "__j", F.coalesce(F.sum(is_conv).over(pre), F.lit(0))
    )
    convs = seq.where(F.col(type_col) == conversion).select(
        F.col(user_col).alias("__u"),
        F.col("__j").alias("__jid"),
        F.col(id_col).alias("conversion_event_id"),
    )
    tch = seq.where(F.col(type_col).isin(*touches)).select(
        F.col(user_col).alias("__u"),
        F.col("__j").alias("__jid"),
        F.col(id_col).alias("touch_event_id"),
        F.col(type_col).alias("touch_type"),
        F.col(ts_col).alias("__ts"),
    )
    jw = Window.partitionBy("__u", "__jid").orderBy(
        F.col("__ts"), F.col("touch_event_id")
    )
    pos = tch.withColumn("position", F.row_number().over(jw)).withColumn(
        "n_touches",
        F.count(F.lit(1)).over(Window.partitionBy("__u", "__jid")),
    )
    k = F.col("n_touches")
    p = F.col("position")
    # exact rational numerator/denominator, ONE pinned division
    num = (
        F.when(k == 1, F.lit(1))
        .when(k == 2, F.lit(1))
        .when((p == 1) | (p == k), F.lit(2))
        .otherwise(F.lit(1))
    )
    den = (
        F.when(k == 1, F.lit(1))
        .when(k == 2, F.lit(2))
        .when((p == 1) | (p == k), F.lit(5))
        .otherwise(F.lit(5) * (k - 2))
    )
    credit = F.round(num.cast("double") / den.cast("double"), 9)
    return (
        pos.join(convs.hint("shuffle_hash"), ["__u", "__jid"])
        .select(
            F.col("__u").alias("user_id"),
            "conversion_event_id",
            "touch_event_id",
            "touch_type",
            "position",
            "n_touches",
            credit.alias("credit"),
        )
    )


def leadlag_corr(
    df: DataFrame,
    time_col: str,
    a_col: str,
    b_col: str,
    *,
    max_lag: int = 3,
) -> DataFrame:
    """Lead-lag cross-correlation between two integer-valued period
    series — the "does A lead B?" diagnostic (marketing spend vs
    conversions, error volume vs churn): Pearson corr(A_t, B_{t+l})
    for every lag l in [-max_lag, max_lag], computed over the rows
    where both ends of the shifted pair exist.

    Input is ONE row per period (pre-aggregate first); the series
    frame is calendar-bounded (days/weeks/months — a true constant at
    any data scale, unlike key tables), so the single unpartitioned
    window over it is bounded by the calendar, not the data. All 2L+1
    shifted columns ride that one window; per lag, the five Pearson
    moments fold in decimal(38,0) over exact integers and the single
    float step is the final (n·Σab − ΣaΣb) / sqrt(...) with one sqrt,
    rounded to 9.

    Returns (lag, n_pairs, corr) for each lag; NULL corr when a side
    is constant over the overlap (zero variance).
    """
    if max_lag < 0:
        raise ValueError("max_lag must be >= 0")
    w = Window.orderBy(time_col)
    a = F.col(a_col).cast("decimal(38,0)")
    b = F.col(b_col).cast("decimal(38,0)")
    outs = []
    base = df.select(time_col, a.alias("__a"), b.alias("__b"))
    for lag in range(-max_lag, max_lag + 1):
        if lag == 0:
            bl = F.col("__b")
        elif lag > 0:
            bl = F.lead("__b", lag).over(w)
        else:
            bl = F.lag("__b", -lag).over(w)
        pair = base.withColumn("__bl", bl).where(F.col("__bl").isNotNull())
        # operands cast to decimal BEFORE the squares/cross products: a
        # single long*long product wraps past 2^63 for values >= ~3e9
        # on the cents grid (the ks_test/roc_auc overflow class)
        av = F.col("__a").cast("decimal(38,0)")
        bv = F.col("__bl").cast("decimal(38,0)")
        agg = pair.agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
            F.sum(av).alias("__sa"),
            F.sum(bv).alias("__sb"),
            F.sum(av * av).alias("__saa"),
            F.sum(bv * bv).alias("__sbb"),
            F.sum(av * bv).alias("__sab"),
        )
        num = F.col("__n") * F.col("__sab") - F.col("__sa") * F.col("__sb")
        da = F.col("__n") * F.col("__saa") - F.col("__sa") * F.col("__sa")
        db = F.col("__n") * F.col("__sbb") - F.col("__sb") * F.col("__sb")
        corr = F.when(
            (da > 0) & (db > 0),
            F.round(
                num.cast("double")
                / F.sqrt(da.cast("double") * db.cast("double")),
                9,
            ),
        )
        outs.append(
            agg.select(
                F.lit(lag).alias("lag"),
                F.col("__n").cast("long").alias("n_pairs"),
                corr.alias("corr"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("lag")


def seasonality_index(
    df: DataFrame,
    time_col: str,
    value_col: str,
    *,
    period: str = "month",
) -> DataFrame:
    """Classical seasonal index: each calendar position's share of the
    overall average — index > 1 means the month/weekday runs hot
    ("is December really 2x?"). Cleared of division: with per-position
    sums s_p over n_p periods and grand totals S over N periods, the
    index (s_p/n_p) / (S/N) = (s_p·N) / (n_p·S) is ONE pinned integer
    division, rounded to 6.

    ``period`` selects BOTH the position extractor AND the period
    bucket: 'month' positions by month-of-year (1-12) and counts
    n_p in distinct CALENDAR MONTHS ('yyyy-MM' buckets); 'dow'
    positions by day-of-week (1-7, Sunday=1 — the dayofweek
    convention) and counts n_p in distinct DAYS ('yyyy-MM-dd'
    buckets). The bucket must match the position's granularity or
    n_periods counts the wrong unit and the index normalizes by the
    wrong average. ``value_col`` must be integer-valued (cents grid).

    Scale shape: one aggregate to the (position, period) frame (at
    most 12 x calendar periods), one to the position frame, a 1-row
    grand-total broadcast. The fact table is scanned once.
    """
    if period == "month":
        pos = F.month(time_col)
        bucket = F.date_format(time_col, "yyyy-MM")
    elif period == "dow":
        pos = F.dayofweek(time_col)
        bucket = F.date_format(time_col, "yyyy-MM-dd")
    else:
        raise ValueError("period must be 'month' or 'dow'")
    per_period = (
        df.where(F.col(time_col).isNotNull())
        .groupBy(pos.alias("pos"), bucket.alias("__bkt"))
        .agg(F.sum(F.col(value_col).cast("decimal(38,0)")).alias("__s"))
    )
    per_pos = per_period.groupBy("pos").agg(
        F.sum("__s").alias("__sp"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__np"),
    )
    tot = per_pos.groupBy().agg(
        F.sum("__sp").alias("__S"), F.sum("__np").alias("__N")
    )
    return (
        per_pos.crossJoin(F.broadcast(tot))
        .select(
            F.col("pos").cast("int").alias("pos"),
            F.col("__np").cast("long").alias("n_periods"),
            F.col("__sp").cast("long").alias("total_value"),
            F.round(
                (F.col("__sp") * F.col("__N")).cast("double")
                / (F.col("__np") * F.col("__S")).cast("double"),
                6,
            ).alias("index"),
        )
        .orderBy("pos")
    )


def interarrival_stats(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Inter-arrival-time health profile per group — the burstiness
    screen for event streams (a Poisson-like stream has CV ~= 1;
    CV >> 1 means bursts, CV << 1 means a metronome — both change
    capacity planning and anomaly thresholds).

    Gaps are exact integer MICROSECONDS between consecutive events in
    the total (ts, id) order per group (the one-division timestamp
    discipline of last_touch_attribution). Outputs per group:
    n_gaps, mean_gap_us (one pinned division), cv2 = variance/mean^2
    as the division-cleared exact ratio (n*Sgg - Sg^2)/Sg^2 rounded
    to 9, and burstiness = (sigma - mu)/(sigma + mu) in [-1, 1]
    (Goh-Barabasi), one sqrt + one division, rounded to 9.

    Scale shape: one window pass per group partition for the lag (the
    sessionize partitioning), one map-side-combined aggregate to the
    group frame. Decimal(38,0) moment sums — exact on any layout.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(ts_col), F.col(id_col))
    us = F.unix_micros(F.col(ts_col))
    gap = (us - F.lag(us).over(w)).alias("__g")
    gaps = (
        df.where(F.col(ts_col).isNotNull())
        .select(F.col(group_col).alias("__grp"), gap)
        .where(F.col("__g").isNotNull())
    )
    g = F.col("__g").cast("decimal(38,0)")
    agg = gaps.groupBy("__grp").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(g).alias("__sg"),
        F.sum(g * g).alias("__sgg"),
    )
    n = F.col("__n")
    sg = F.col("__sg")
    var_num = n * F.col("__sgg") - sg * sg  # n^2 * variance
    mean_us = F.round(sg.cast("double") / n.cast("double"), 6)
    cv2 = F.when(
        sg > 0, F.round(var_num.cast("double") / (sg * sg).cast("double"), 9)
    )
    # sigma/mu = sqrt(var_num)/sg (both scaled by n), so burstiness
    # = (sqrt(var_num) - sg) / (sqrt(var_num) + sg)
    root = F.sqrt(var_num.cast("double"))
    burst = F.when(
        (sg > 0) & (var_num >= 0),
        F.round(
            (root - sg.cast("double")) / (root + sg.cast("double")), 9
        ),
    )
    return agg.select(
        F.col("__grp").alias(group_col),
        n.cast("long").alias("n_gaps"),
        mean_us.alias("mean_gap_us"),
        cv2.alias("cv2"),
        burst.alias("burstiness"),
    ).orderBy(group_col)


def theil_sen_trend(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Theil-Sen robust trend per group — the median of all pairwise
    slopes over a PERIOD series: immune to the outlier days that drag
    an OLS fit (:func:`trend detection <linear_fit>`'s robust
    sibling; up to ~29% contamination tolerated).

    Input is one row per (group, integer period index, integer
    value). The pair set is quadratic IN PERIODS — the textbook exact
    estimator — which distributes safely because the series frame is
    calendar-bounded (10 years of days = ~3.7k rows = ~7M pairs per
    group, trivially partitionable; never data-bounded). Slopes are
    IEEE doubles of exact integer differences (one division per
    pair); the median is the exact middle (or midpoint) over that
    deterministic multiset, rounded to 6.

    Returns (group, n_periods, n_pairs, slope_per_period).
    """
    base = df.where(
        F.col(time_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(time_col).cast("long").alias("__t"),
        F.col(value_col).cast("long").alias("__v"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b.hint("shuffle_hash"), "__g").where(
        F.col("a.__t") < F.col("b.__t")
    )
    slope = (
        (F.col("b.__v") - F.col("a.__v")).cast("double")
        / (F.col("b.__t") - F.col("a.__t")).cast("double")
    )
    per_pair = pairs.select(F.col("__g"), slope.alias("__s"))
    agg = per_pair.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile("__s", F.lit(0.5)), 6).alias("slope_per_period"),
    )
    counts = base.groupBy("__g").agg(F.count(F.lit(1)).alias("n_periods"))
    return (
        counts.join(agg, "__g", "left")
        .select(
            F.col("__g").alias(group_col),
            "n_periods",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            "slope_per_period",
        )
        .orderBy(group_col)
    )


def not_followed_by(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    trigger: str = "click",
    outcome: str = "purchase",
    within: str = "1 day",
) -> DataFrame:
    """Funnel-negative filter: trigger events NOT followed by an
    outcome event from the same user within ``within`` — the
    abandonment query ("clicks that never converted inside a day")
    that naive SQL writes as a correlated NOT EXISTS and executes as
    a per-row scan.

    ONE window pass, no join: each user's stream sorts once by
    (ts, id); every row carries the NEXT outcome's timestamp via a
    forward-looking ``first(outcome_ts, ignorenulls)`` over the
    following rows. A trigger survives when no outcome follows at all
    or the next one is later than ``within``. Strictly-after
    semantics: an outcome sharing the trigger's timestamp counts as
    following iff its event id is larger (the last_touch tie rule
    mirrored forward).

    Returns surviving triggers: (event_id, user_id, ts,
    next_outcome_id, next_outcome_ts, gap_seconds) with NULLs when no
    outcome ever follows.

    Scale shape: the sessionize partitioning (one shuffle on the
    user, one sort); window state is O(1) per row.
    """
    # forward-looking neighbor via a reversed-order RUNNING frame (see
    # interpolate_missing): "first outcome strictly after (ts, id) asc"
    # == "last outcome strictly before (ts, id) desc", and running
    # frames stream in O(rows) where (1, unboundedFollowing) rescans
    # the remaining partition per row
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = F.last(
        F.when(
            F.col(type_col) == outcome,
            F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id")),
        ),
        ignorenulls=True,
    ).over(w)
    got = df.withColumn("__nx", nxt).where(F.col(type_col) == trigger)
    within_expr = F.col(ts_col) + F.expr(f"INTERVAL {within}")
    converted = F.col("__nx").isNotNull() & (
        F.col("__nx.ts") <= within_expr
    )
    gap_s = (
        F.unix_micros(F.col("__nx.ts")) - F.unix_micros(F.col(ts_col))
    ) / F.lit(1_000_000.0)
    return got.where(~converted).select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col("__nx.id").alias("next_outcome_id"),
        F.col("__nx.ts").alias("next_outcome_ts"),
        F.when(F.col("__nx").isNotNull(), F.round(gap_s, 6)).alias(
            "gap_seconds"
        ),
    )


def rolling_active_users(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day active users per day (the WAU/MAU family):
    for each calendar day, how many DISTINCT users appeared in the
    trailing ``window_days`` window ending that day.

    Sliding DISTINCT does not decompose into partial aggregates, so
    the exact formulation is contribute-explode: each (user, day)
    distinct pair fans out to the ``window_days`` day-windows it
    feeds, then one count-distinct per day. The shuffle is
    (user, day)-distinct pairs x window length — the window length is
    the documented cost knob (7/30 are the standard products), and
    the fan-out happens AFTER the per-day dedup, so raw event volume
    never multiplies. For window lengths where the explode is too
    wide, the mergeable-sketch path (KMV per day + union over the
    window — operators/sketches.py) is the approximate alternative;
    this is the exact one.

    Returns (day, n_active) for every day that closes a window with
    at least one active user, including days with no NEW events but
    active trailing windows.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    per_day = (
        df.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(
            F.to_date(ts_col).alias("__d"), F.col(user_col).alias("__u")
        )
        .distinct()
    )
    fan = per_day.select(
        F.explode(
            F.sequence(
                F.col("__d"),
                F.date_add(F.col("__d"), window_days - 1),
            )
        ).alias("day"),
        "__u",
    )
    return (
        fan.groupBy("day")
        .agg(F.countDistinct("__u").alias("n_active"))
        .orderBy("day")
    )


def transition_entropy(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Conditional entropy H(next | current) of the per-user event-type
    Markov chain — the predictability score of a behavior stream
    (H -> 0: deterministic funnels; H -> log2|types|: memoryless
    noise). The information-theoretic summary on top of
    :func:`event_transitions`' transition matrix.

    ``H = -(1/N) * sum_xy c_xy * (log2 c_xy - log2 c_x)`` over
    consecutive (current=x, next=y) pairs in the total per-user
    (ts, id) order. Every log2 argument is an integer count and the
    sum folds ascending-sorted (the mutual_information discipline), so
    the result is engine-exact, rounded to 6.

    Returns one row: (n_transitions, n_states, n_pairs,
    entropy_bits).

    Scale shape: one sessionize-shaped window for the lag, one hash
    aggregate to the |types|^2 pair table, marginals as rollups of
    THAT, one driver-sized sorted fold.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.col(type_col).alias("__y"),
            F.lag(F.col(type_col)).over(w).alias("__x"),
        )
        .where(F.col("__x").isNotNull())
    )
    cells = pairs.groupBy("__x", "__y").agg(F.count(F.lit(1)).alias("__cxy"))
    cx = cells.groupBy(F.col("__x").alias("__xx")).agg(
        F.sum("__cxy").alias("__cx")
    )
    tot = cells.agg(
        F.sum("__cxy").alias("__N"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("__x").alias("n_states"),
    )
    term = (
        -F.col("__cxy").cast("double")
        * (
            F.log2(F.col("__cxy").cast("double"))
            - F.log2(F.col("__cx").cast("double"))
        )
    ).alias("__term")
    joined = (
        cells.join(
            F.broadcast(cx), F.col("__x") == F.col("__xx")
        )
        .crossJoin(F.broadcast(tot))
        .select("__N", "n_pairs", "n_states", term)
    )
    folded = joined.groupBy("__N", "n_pairs", "n_states").agg(
        F.sort_array(F.collect_list("__term")).alias("__ts")
    )
    fold = F.aggregate("__ts", F.lit(0.0), lambda acc, t: acc + t)
    return folded.select(
        F.col("__N").cast("long").alias("n_transitions"),
        F.col("n_states").cast("long").alias("n_states"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round(fold / F.col("__N").cast("double"), 6).alias("entropy_bits"),
    )


def interpolate_missing(
    df: DataFrame,
    group_col: str,
    t_col: str,
    value_col: str,
    *,
    out_col: str = "value_interp",
    round_digits: int = 6,
) -> DataFrame:
    """Linear interpolation of NULL values in a per-group period
    series — the gap-repair step between :func:`gapfill_time_series`'s
    LOCF (steps) and model-grade resampling: each missing point gets
    the straight line between its nearest non-NULL neighbors.

    ``t_col`` must be an integer period index, ``value_col`` integer
    on a grid. ONE window partitioning evaluates all four neighbor
    columns (previous/next non-NULL value and its t, via
    last/first ``ignorenulls`` over the backward/forward frames);
    the interpolation v0 + (v1-v0)·(t-t0)/(t1-t0) is exact integer
    algebra with ONE pinned division, rounded. Leading/trailing gaps
    (only one neighbor) take that neighbor's value (LOCF/NOCB);
    all-NULL groups stay NULL.

    Appends ``out_col``; non-NULL rows pass their own value through.
    """
    w = Window.partitionBy(group_col).orderBy(t_col)
    back = w.rowsBetween(Window.unboundedPreceding, -1)
    # the forward neighbor via a REVERSED-order running frame: Spark
    # evaluates an (1, unboundedFollowing) frame by rescanning the
    # remaining partition per row (O(rows^2) per group — measured as
    # ~90% of this operator's cost), while running
    # (unboundedPreceding, -1) frames stream in O(rows). "last non-NULL
    # strictly before current under t DESC" is exactly "first non-NULL
    # strictly after current under t ASC" (t is a unique period index
    # per group).
    rev = Window.partitionBy(group_col).orderBy(F.desc(t_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    v = F.col(value_col).cast("long")
    t = F.col(t_col).cast("long")
    point = F.when(v.isNotNull(), F.struct(t.alias("t"), v.alias("v")))
    prev = F.last(point, ignorenulls=True).over(back)
    nxt = F.last(point, ignorenulls=True).over(rev)
    stepped = df.withColumn("__p", prev).withColumn("__n", nxt)
    p_t, p_v = F.col("__p.t"), F.col("__p.v")
    n_t, n_v = F.col("__n.t"), F.col("__n.v")
    interp = F.round(
        (
            p_v * (n_t - t) + n_v * (t - p_t)
        ).cast("double")
        / (n_t - p_t).cast("double"),
        round_digits,
    )
    filled = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(
            F.col("__p").isNotNull() & F.col("__n").isNotNull(), interp
        )
        .when(F.col("__p").isNotNull(), p_v.cast("double"))
        .when(F.col("__n").isNotNull(), n_v.cast("double"))
    )
    return stepped.withColumn(out_col, filled).drop("__p", "__n")
