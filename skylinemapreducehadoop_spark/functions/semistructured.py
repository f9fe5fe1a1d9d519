"""Semi-structured (JSON string) column functions.

The reference engine has no JSON surface; this module covers the
event-properties pattern every telemetry pipeline hits: a free-form
JSON string column whose fields must be extracted, typed, and
aggregated without a schema migration. Spark-first: extraction is
``get_json_object`` (JVM, codegen, pushdown-friendly — never a Python
json.loads UDF), so a field probe stays inside the scan stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_field(col: Column | str, path: str, cast: str | None = None) -> Column:
    """Extract ``path`` (e.g. ``$.k`` or ``$.a.b[0]``) from a JSON
    string column; malformed JSON and missing paths yield NULL. Pass
    ``cast`` (``'long'``, ``'double'``, ...) to type the result —
    non-numeric strings become NULL under the cast, same as the
    engine's lax JSON semantics."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.get_json_object(c, path)
    return out.cast(cast) if cast else out


def json_field_stats(
    df: DataFrame,
    json_col: str,
    path: str,
    *,
    group_by: Sequence[str] = (),
    quant: int = 10_000,
) -> DataFrame:
    """Typed profile of one numeric JSON field, optionally per group:
    (n_rows, n_present, n_distinct, sum, mean, vmin, vmax) where
    ``n_present`` counts rows whose field parsed to a number. The
    field quantizes to ``1/quant`` and every aggregate folds exact
    integers (mean is one final double division, rounded to 9), so
    the result is layout/engine-exact — the corr_lineitem discipline.

    Scale shape: extraction rides the scan (whole-stage codegen, no
    UDF); one map-side-combined aggregate per group. n_distinct is
    exact (count distinct of the quantized value) — swap in
    approx_count_distinct for a 100-TB interactive profile.
    """
    q = F.lit(quant).cast("double")
    v = json_field(json_col, path, cast="double")
    vq = F.round(v * q).cast("long")
    keys = list(group_by)
    g = df.select(*keys, vq.alias("__vq"))
    agg = g.groupBy(*keys) if keys else g.groupBy()
    out = agg.agg(
        F.count("*").alias("n_rows"),
        F.count("__vq").alias("n_present"),
        F.count_distinct("__vq").alias("n_distinct"),
        F.sum(F.col("__vq").cast("decimal(38,0)")).alias("__s"),
        F.min("__vq").alias("__mn"),
        F.max("__vq").alias("__mx"),
    )
    return out.select(
        *keys,
        "n_rows",
        "n_present",
        "n_distinct",
        (F.col("__s").cast("double") / q).alias("sum"),
        F.round(
            F.col("__s").cast("double") / q / F.col("n_present").cast("double"),
            9,
        ).alias("mean"),
        (F.col("__mn").cast("double") / q).alias("vmin"),
        (F.col("__mx").cast("double") / q).alias("vmax"),
    )
