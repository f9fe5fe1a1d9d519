"""Bloom-filter semi-join prefilter (operators/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.operators.bloom import bloom_semi_join


def _tables(spark):
    fact = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)] + [(None, "nullkey")],
        "k long, payload string",
    )
    dim = spark.createDataFrame(
        [(i * 7,) for i in range(100)] + [(None,)], "dk long"
    )
    return fact, dim


def test_bloom_semi_join_equals_plain_semi_at_any_geometry(spark):
    fact, dim = _tables(spark)
    want = sorted(
        r["k"]
        for r in fact.join(
            dim.where(F.col("dk").isNotNull()),
            fact["k"] == dim["dk"],
            "left_semi",
        ).collect()
    )
    # geometry affects only the shuffle fraction, never the answer —
    # including a 64-bit bitmap where nearly everything is a false
    # positive and the exact join does all the work
    for bits, hashes in ((64, 1), (1 << 10, 2), (1 << 20, 4)):
        got = sorted(
            r["k"]
            for r in bloom_semi_join(
                fact, dim, "k", "dk", num_bits=bits, num_hashes=hashes
            ).collect()
        )
        assert got == want, (bits, hashes)


def test_bloom_semi_join_no_udf_and_guards(spark):
    fact, dim = _tables(spark)
    out = bloom_semi_join(fact, dim, "k", "dk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the prefilter must be pure column expressions — no Python boundary
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    with pytest.raises(ValueError):
        bloom_semi_join(fact, dim, "k", "dk", num_bits=32)
    with pytest.raises(ValueError):
        bloom_semi_join(fact, dim, "k", "dk", num_hashes=0)


def test_bloom_prefilter_is_selective(spark):
    # the point of the operator: most non-matching fact rows die at the
    # bloom stage. Reproduce the prefilter predicate by construction
    # and count survivors — with 1M bits / 100 keys / 4 hashes the
    # false-positive rate is well under 5%.
    fact, dim = _tables(spark)
    from skylinemapreducehadoop_spark.operators import bloom as B

    keys = dim.where(F.col("dk").isNotNull()).select(F.col("dk").alias("__k"))
    pos = keys.select(
        F.explode(F.array(*B._positions(F.col("__k"), B.DEFAULT_NUM_BITS, 4))).alias("__p")
    )
    words = (
        pos.groupBy(F.expr("cast(__p div 64 as int)").alias("__w"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(__p % 64 as int)))").alias("__bits"))
        .collect()
    )
    bitmap = [0] * (B.DEFAULT_NUM_BITS // 64)
    for r in words:
        bitmap[r["__w"]] = r["__bits"]
    bf = spark.createDataFrame([(bitmap,)], "__bf array<bigint>")
    checks = []
    for i in range(4):
        p = f"pmod(xxhash64(`k`, {i}), {B.DEFAULT_NUM_BITS})"
        checks.append(
            f"(element_at(__bf, cast(({p}) div 64 as int) + 1)"
            f" & shiftleft(1L, cast(({p}) % 64 as int))) != 0"
        )
    survivors = (
        fact.crossJoin(F.broadcast(bf))
        .where(F.col("k").isNotNull() & F.expr(" AND ".join(checks)))
        .count()
    )
    n_match = 100  # keys 0,7,...,693 all < 2000
    assert survivors >= n_match
    assert survivors <= n_match + int(0.05 * 2000)
