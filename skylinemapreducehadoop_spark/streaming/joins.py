"""Stream-stream joins with watermark-bounded state.

Completes the streaming surface next to the batch temporal joins
(``operators/temporal.py``): ``interval_join_streams`` is the streaming
twin of the batch ``range_join`` — same pair semantics
(``lower < right_ts - left_ts <= upper`` within a key), expressed the
Structured Streaming way: both sides carry watermarks and the join
condition includes the time interval, so the state store retains each
side only for ``watermark + upper`` and evicts the rest. Without BOTH
the watermarks and the time-range condition Spark must buffer the
streams forever; this operator makes the bounded-state form the only
way to use it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 600.0,
    watermark: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join two streams on ``on`` where
    ``lower < right_ts - left_ts <= upper``.

    Right-side columns arrive suffixed. State bound: each input row is
    retained at most ``watermark + upper_seconds`` past the stream's
    max event time, enforced by the engine's state-store eviction.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError(
            f"need lower_seconds < upper_seconds, got {lower_seconds} >= {upper_seconds}"
        )
    if lower_seconds < 0:
        raise ValueError(f"lower_seconds must be >= 0, got {lower_seconds}")

    r = right
    renames = {c: f"{c}{suffix}" for c in right.columns if c != on}
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    right_ts_out = renames.get(right_ts, right_ts)

    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = r.withWatermark(right_ts_out, watermark)

    lo_us = int(lower_seconds * 1_000_000)
    up_us = int(upper_seconds * 1_000_000)
    # The bound MUST be expressed directly on the watermarked timestamp
    # columns (ts_r > ts + INTERVAL, ts_r <= ts + INTERVAL): Spark's
    # StreamingJoinHelper derives per-side state watermarks only from
    # interval arithmetic it can analyze. The equivalent
    # unix_micros(r) - unix_micros(l) form is opaque to it — the join
    # still returns the right rows, but state cleanup predicates come
    # out null and the state store grows without bound.
    cond = (
        (l_wm[on] == r_wm[on])
        & (
            F.col(right_ts_out)
            > F.col(left_ts) + F.expr(f"INTERVAL {lo_us} MICROSECOND")
        )
        & (
            F.col(right_ts_out)
            <= F.col(left_ts) + F.expr(f"INTERVAL {up_us} MICROSECOND")
        )
    )
    return l_wm.join(r_wm, cond, "inner").drop(r_wm[on])
