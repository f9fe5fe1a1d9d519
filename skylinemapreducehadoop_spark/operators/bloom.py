"""Bloom-filter join pre-filtering — the manual form of runtime row
filtering for the cases Catalyst's ``InjectRuntimeFilter`` will not
infer on its own (a key set produced by an aggregate, a UDF-derived
dim, a multi-step pipeline).

At 100 TB the dominant cost of ``fact ⋈ dim`` on a selective dim is
shuffling fact rows that can never match. A Bloom filter built over
the dim keys lets the fact SCAN drop non-matching rows before the
exchange: membership admits every true match (no false negatives)
plus a bounded false-positive fraction, and the exact join that
follows removes the false positives — so the RESULT is bit-identical
to the plain semi join while the shuffle shrinks by roughly the
non-matching fraction.

Spark's ``bloom_filter_agg``/``might_contain`` expressions are
optimizer-internal (not in the function registry), so the sketch here
is built from PUBLIC primitives only, and stays almost entirely
JVM-side:

- k hash functions = ``xxhash64(key, seed_i)`` (seeding via the extra
  literal column) → bit position ``pmod(h, num_bits)``;
- build: explode the k positions over the dim keys, ``bit_or``
  aggregate into 64-bit words — the word table is AT MOST
  ``num_bits/64`` rows regardless of dim size, collected once (a
  constant-size, config-bounded collect — the MAX_TOUCHED_BUCKETS
  contract) and re-shipped as ONE broadcast row holding the
  ``array<long>`` bitmap;
- probe: pure column expressions — ``element_at(bitmap, word_idx)``
  + shift/AND per hash function. No UDF anywhere, so the pre-filter
  sits inside whole-stage codegen on the scan side of the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default sketch geometry: 2^20 bits = 16384 longs (~128 KiB
#: broadcast); with k=4 hashes this holds ~100k keys at ~1-2% false
#: positives — false positives cost only shuffle bytes, never
#: correctness
DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 4

#: hard cap on the bitmap words a build may collect (1 << 26 bits =
#: 8 MiB); raising it is an explicit caller decision
MAX_NUM_BITS = 1 << 26


def _positions(col, num_bits: int, num_hashes: int):
    """k bit positions for a key: pmod(xxhash64(key, seed_i), m)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` appears in ``dim``'s
    ``dim_key`` — semantically a LEFT SEMI join, executed as

    1. build the Bloom bitmap over the dim keys (one ``bit_or``
       aggregate to ≤ ``num_bits/64`` words, one bounded collect);
    2. broadcast the bitmap as a single ``array<long>`` row and
       pre-filter the fact scan with pure column expressions
       (map-side, before any exchange);
    3. the exact left-semi join, which removes the false positives.

    Result == plain ``fact.join(dim_keys, key, "left_semi")``
    row-for-row at ANY sketch geometry — ``num_bits``/``num_hashes``
    affect only the surviving-shuffle fraction, never the answer
    (asserted by the oracle-hashed ``bloom_semi_join_orders`` entry
    and the geometry-sweep pytest). NULL fact keys never match (semi
    join semantics).
    """
    dim_key = dim_key or fact_key
    if num_bits < 64 or num_bits > MAX_NUM_BITS:
        raise ValueError(f"num_bits must be in [64, {MAX_NUM_BITS}]")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    n_words = (num_bits + 63) // 64

    keys = dim.where(F.col(dim_key).isNotNull()).select(
        F.col(dim_key).alias("__k")
    )
    pos = keys.select(
        F.explode(F.array(*_positions(F.col("__k"), num_bits, num_hashes))).alias(
            "__p"
        )
    )
    words = (
        pos.groupBy(F.expr("cast(__p div 64 as int)").alias("__w"))
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(__p % 64 as int)))").alias("__bits")
        )
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["__w"]] = r["__bits"]
    spark = fact.sparkSession
    bf = spark.createDataFrame([(bitmap,)], "__bf array<bigint>")

    checks = []
    for i in range(num_hashes):
        p = f"pmod(xxhash64(`{fact_key}`, {i}), {num_bits})"
        checks.append(
            f"(element_at(__bf, cast(({p}) div 64 as int) + 1)"
            f" & shiftleft(1L, cast(({p}) % 64 as int))) != 0"
        )
    probe = F.expr(" AND ".join(checks))
    pre = (
        fact.crossJoin(F.broadcast(bf))
        .where(F.col(fact_key).isNotNull() & probe)
        .drop("__bf")
    )
    return pre.join(keys, F.col(fact_key) == F.col("__k"), "left_semi")
