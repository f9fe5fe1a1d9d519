"""Streaming deduplication — the stream-side twin of operators/dedup.

Two scale-conscious designs:

- ``streaming_exact_dedup``: built-in ``dropDuplicatesWithinWatermark``
  keyed on the FULL 128-bit md5 of the content. State = one digest per
  distinct document inside the watermark horizon, evicted by the
  watermark — bounded, engine-managed (RocksDB-able), no Python state.
- ``streaming_seen_filter``: ``applyInPandasWithState`` variant for
  *unbounded* exactness per key-shard: state is the set of content
  digests seen so far, sharded by digest prefix so no single state entry
  grows with the corpus. Emits only first-seen rows. Use when the dedup
  horizon must be "forever" and the digest set fits the cluster's
  aggregate state store (16 bytes/doc — 100 TB of 10 KB docs is ~160 GB
  of state spread over shards, feasible; holding *texts* would not be).

Both paths key on 128 bits (two 60-bit md5 halves for the stateful
variant): at ~10^10 documents a 60-bit key already expects birthday
collisions, which would silently drop distinct documents as
"duplicates".
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _md5_half(col, offset: int):
    """60-bit BIGINT from 15 hex chars of md5 starting at ``offset``."""
    md5c = F.md5(col.cast("binary"))
    return F.conv(F.substring(md5c, offset, 15), 16, 10).cast("long")


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each distinct content within the watermark
    horizon; late duplicates beyond the horizon are the accepted
    trade-off for bounded state. Dedup key = full 128-bit md5; the
    60-bit ``fingerprint`` column is kept for cross-engine checks."""
    md5c = F.md5(F.col(text_col).cast("binary"))
    return (
        stream.withColumn("__md5", md5c)
        .withColumn("fingerprint", F.conv(F.substring("__md5", 1, 15), 16, 10).cast("long"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__md5"])
        .drop("__md5")
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

    Rows are sharded by digest modulus, so each state entry holds
    ~1/n_shards of the digest set and the shuffle key is uniform by
    construction (hash sharding = no skew). Equality is on the
    (hi, lo) 120-bit digest pair; the emitted ``fingerprint`` is the
    hi half (display/compat).
    """
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("fingerprint", T.LongType()),
        ]
    )
    # two aligned arrays instead of an array of structs: pandas-state
    # round-trips flat long arrays cheaply
    state_schema = T.StructType(
        [
            T.StructField("seen_hi", T.ArrayType(T.LongType())),
            T.StructField("seen_lo", T.ArrayType(T.LongType())),
        ]
    )

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hi, lo = state.get
            seen = set(zip(hi, lo))
        else:
            seen = set()
        out_ids, out_fps = [], []
        for pdf in batches:
            for doc_id, fp_hi, fp_lo in zip(pdf[id_col], pdf["fp_hi"], pdf["fp_lo"]):
                pair = (int(fp_hi), int(fp_lo))
                if pair not in seen:
                    seen.add(pair)
                    out_ids.append(int(doc_id))
                    out_fps.append(pair[0])
        pairs = sorted(seen)
        state.update(([p[0] for p in pairs], [p[1] for p in pairs]))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(out_ids),
                id_col: out_ids,
                "fingerprint": out_fps,
            }
        )

    c = F.col(text_col)
    fp_hi, fp_lo = _md5_half(c, 1), _md5_half(c, 17)
    return (
        stream.select(
            F.pmod(fp_hi, F.lit(n_shards)).cast("int").alias("shard"),
            F.col(id_col),
            fp_hi.alias("fp_hi"),
            fp_lo.alias("fp_lo"),
        )
        .groupBy("shard")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def _require_batch_partitioned_store(spark, path: str) -> None:
    """Refuse to start against a v1-layout store (flat parquet files at
    the table root instead of ``__batch=N`` partition directories) —
    partition discovery would fail or batches would be silently
    overwritten. Probed through the Hadoop FS API so the store may live
    on any scheme (local in tests, HDFS/object store on a cluster)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            raise ValueError(
                f"store table {path!r} contains root-level parquet files "
                f"(pre-__batch-partitioned v1 layout); migrate it by "
                f"rewriting under a __batch=0 partition or point the "
                f"query at a fresh store directory"
            )


def streaming_near_dup(
    stream: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = 3,
    n_perm: int = 128,
    rows_per_band: int = 2,
    seed: int = 42,
):
    """Streaming NEAR-duplicate detection: an incremental MinHash-LSH
    index folded over micro-batches with ``foreachBatch``.

    Each batch: signatures + band keys for the batch only (the
    expensive shingling/hashing never reruns on history), candidates =
    batch-vs-store band equi-join  ∪  batch-vs-batch self-join, exact
    Jaccard verify on shingle sets, confirmed pairs appended to
    ``pairs_dir``, batch bands/sets appended to the store. The store
    is two parquet tables (bands: id/band/bh; sets: id/shingles) —
    state lives in the data lake, not executor memory, so the horizon
    is unbounded and the cost per batch is |batch| x (its bucket
    collisions), never |history|².

    Idempotent replay: every sink (pairs, bands, sets) is partitioned
    by the foreachBatch ``batch_id`` — stable across crash-replays
    because it comes from the checkpoint — and written with DYNAMIC
    partition overwrite, so re-running a batch overwrites exactly its
    own partition instead of appending duplicate store rows that would
    inflate every future candidate join (r6 ADVICE). Net delivery is
    effectively-once per batch. A ``doc_id`` recurring in a LATER
    batch (changed text) is by-design indexed twice: both versions'
    bands/shingles stay in the store and each matches its own
    near-duplicates. Returns the StreamingQuery.

    Store layout versioning: this (v2) layout partitions every table by
    ``__batch``. A v1 store (flat appended parquet files at the table
    root) is INCOMPATIBLE — mixing root-level files with partition
    directories breaks Spark partition discovery, and pointing a fresh
    checkpoint at an existing store would silently overwrite its
    batch-0.. partitions. Startup therefore refuses a store whose table
    roots contain bare ``*.parquet`` files; migrate by rewriting the old
    store under a ``__batch=0`` partition (one read + one partitioned
    write) or start a new store directory.
    """
    import os

    from ..operators.dedup import band_keys, minhash_signatures

    bands_path = os.path.join(store_dir, "bands")
    sets_path = os.path.join(store_dir, "sets")

    spark0 = stream.sparkSession
    for p in (bands_path, sets_path, pairs_dir):
        _require_batch_partitioned_store(spark0, p)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = minhash_signatures(
            batch_df, id_col, text_col, k=k, n_perm=n_perm, seed=seed
        ).cache()
        b_bands = band_keys(sigs, n_perm=n_perm, rows_per_band=rows_per_band).cache()
        b_sets = sigs.select("id", "shingles")

        def _verify(cand: DataFrame, left_sets: DataFrame, right_sets: DataFrame) -> DataFrame:
            return (
                cand.join(
                    left_sets.select(
                        F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")
                    ),
                    "id_a",
                )
                .join(
                    right_sets.select(
                        F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")
                    ),
                    "id_b",
                )
                .withColumn(
                    "jaccard",
                    F.try_divide(
                        F.size(F.array_intersect("sh_a", "sh_b")).cast("double"),
                        F.size(F.array_union("sh_a", "sh_b")),
                    ),
                )
                .where(F.col("jaccard") >= F.lit(threshold))
                .select("id_a", "id_b", "jaccard")
            )

        # within-batch pairs (id_a < id_b, same as the batch operator)
        l, r = b_bands.alias("l"), b_bands.hint("shuffle_hash").alias("r")
        intra = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bh") == F.col("r.bh"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct()
        )
        pairs = _verify(intra, b_sets, b_sets)

        # batch-vs-history pairs; pair order normalized (min, max).
        # Store existence is probed through the Hadoop FS API so the
        # store may live on any scheme (local in tests, HDFS/object
        # store on a cluster)
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(bands_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            h_bands = spark.read.parquet(bands_path).drop("__batch")
            h_sets = spark.read.parquet(sets_path).drop("__batch")
            cross = (
                b_bands.alias("n")
                .join(
                    h_bands.hint("shuffle_hash").alias("h"),
                    (F.col("n.band") == F.col("h.band"))
                    & (F.col("n.bh") == F.col("h.bh"))
                    & (F.col("n.id") != F.col("h.id")),
                )
                .select(
                    F.least("n.id", "h.id").alias("id_a"),
                    F.greatest("n.id", "h.id").alias("id_b"),
                    F.col("n.id").alias("__new"),
                )
            )
            hist_cand = cross.select("id_a", "id_b", "__new").distinct()
            # the new side's shingles come from the batch, the other
            # side's from the store (either may be id_a after ordering)
            all_sets = h_sets.union(b_sets)
            pairs = pairs.union(
                _verify(hist_cand.select("id_a", "id_b"), all_sets, all_sets)
            )

        def _idempotent_append(df: DataFrame, path: str) -> None:
            # overwrite THIS batch's partition only: replaying the
            # batch replaces its own rows instead of duplicating them
            (
                df.withColumn("__batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch")
                .parquet(path)
            )

        _idempotent_append(pairs.distinct(), pairs_dir)
        _idempotent_append(b_bands, bands_path)
        _idempotent_append(b_sets, sets_path)
        sigs.unpersist()
        b_bands.unpersist()

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
