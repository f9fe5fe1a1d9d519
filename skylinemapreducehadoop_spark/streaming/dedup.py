"""Streaming deduplication — the stream-side twin of operators/dedup.

Two scale-conscious designs:

- ``streaming_exact_dedup``: built-in ``dropDuplicatesWithinWatermark``
  keyed on the 60-bit content fingerprint. State = one fingerprint per
  distinct document inside the watermark horizon, evicted by the
  watermark — bounded, engine-managed (RocksDB-able), no Python state.
- ``streaming_seen_filter``: ``applyInPandasWithState`` variant for
  *unbounded* exactness per key-shard: state is the set of fingerprints
  seen so far, sharded by fingerprint prefix so no single state entry
  grows with the corpus. Emits only first-seen rows. Use when the dedup
  horizon must be "forever" and the fingerprint set fits the cluster's
  aggregate state store (8 bytes/doc — 100 TB of 10 KB docs is ~80 GB of
  state spread over shards, feasible; holding *texts* would not be).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from skylinemapreducehadoop_spark.functions.text import doc_fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each distinct content within the watermark
    horizon; late duplicates beyond the horizon are the accepted
    trade-off for bounded state."""
    return (
        stream.withColumn("fingerprint", doc_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_seen_filter(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
) -> DataFrame:
    """Unbounded-horizon streaming dedup: emit (shard, doc_id,
    fingerprint) for first-seen contents only.

    Rows are sharded by fingerprint modulus, so each state entry holds
    ~1/n_shards of the fingerprint set and the shuffle key is uniform by
    construction (hash sharding = no skew).
    """
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("fingerprint", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("seen", T.ArrayType(T.LongType()))]
    )

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        out_ids, out_fps = [], []
        for pdf in batches:
            for doc_id, fp in zip(pdf[id_col], pdf["fingerprint"]):
                if fp not in seen:
                    seen.add(fp)
                    out_ids.append(int(doc_id))
                    out_fps.append(int(fp))
        state.update((sorted(seen),))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(out_ids),
                id_col: out_ids,
                "fingerprint": out_fps,
            }
        )

    fp = doc_fingerprint(text_col)
    return (
        stream.select(
            F.pmod(fp, F.lit(n_shards)).cast("int").alias("shard"),
            F.col(id_col),
            fp.alias("fingerprint"),
        )
        .groupBy("shard")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
