"""Streaming dedup: file-source micro-batches, availableNow trigger,
checked against the batch exact-dedup oracle."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.streaming.dedup import (
    streaming_exact_dedup,
    streaming_seen_filter,
)


def _write_doc_batches(spark, base_dir):
    """Two arrivals; texts repeat within and across batches."""
    base = datetime.datetime(2024, 1, 1)
    texts = ["alpha beta", "gamma", "alpha beta", "delta", "gamma", "epsilon zeta"]
    rows = []
    for b in range(2):
        batch = [
            (
                b * 10 + i,
                texts[(b * 3 + i) % len(texts)],
                base + datetime.timedelta(minutes=b * 10 + i),
            )
            for i in range(3)
        ]
        rows += batch
        spark.createDataFrame(
            batch, "doc_id long, text string, ts timestamp"
        ).write.mode("append").parquet(str(base_dir))
    return rows


def test_streaming_exact_dedup(spark, tmp_path):
    src = tmp_path / "docs"
    rows = _write_doc_batches(spark, src)
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(
        str(src)
    )
    out = streaming_exact_dedup(stream, watermark="10 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select text from sdedup").collect()
    got_texts = sorted(r["text"] for r in got)
    expect = sorted({t for _, t, _ in rows})
    # every distinct content appears exactly once
    assert got_texts == expect


def test_streaming_seen_filter(spark, tmp_path):
    src = tmp_path / "docs2"
    rows = _write_doc_batches(spark, src)
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(
        str(src)
    )
    out = streaming_seen_filter(stream, n_shards=4)
    q = (
        out.writeStream.format("memory")
        .queryName("seenf")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from seenf").collect()
    # one emitted row per distinct content, ids are valid
    n_distinct = len({t for _, t, _ in rows})
    assert len(got) == n_distinct
    assert len({r["fingerprint"] for r in got}) == n_distinct
    valid_ids = {i for i, _, _ in rows}
    assert all(r["doc_id"] in valid_ids for r in got)
    # shard column really is fingerprint mod n_shards
    assert all(r["shard"] == r["fingerprint"] % 4 for r in got)


def test_streaming_near_dup_matches_batch_twin(spark, tmp_path):
    """Stream the corpus in micro-batches through the incremental LSH
    index; the accumulated pair set must equal the batch operator's
    pairs on the full corpus (pair-set equality, scores included)."""
    from skylinemapreducehadoop_spark.operators.dedup import minhash_near_dup
    from skylinemapreducehadoop_spark.streaming.dedup import streaming_near_dup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # 3 arrival waves as separate files (maxFilesPerTrigger=1 -> one
    # micro-batch each); near-dups span waves (doc_id mod 3 split)
    src = tmp_path / "docs"
    for b in range(3):
        docs.where(F.col("doc_id") % 3 == b).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_near_dup(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in minhash_near_dup(docs, threshold=0.5).collect()
    }
    assert got == want and len(want) > 0

    # Replay idempotency (r6 ADVICE): re-running the same batches —
    # fresh checkpoint, same batch ids, store already populated — must
    # NOT duplicate store rows (each batch overwrites its own
    # partition). Before the fix the store doubled on every replay,
    # inflating all future candidate joins.
    bands_before = spark.read.parquet(str(tmp_path / "store" / "bands")).count()
    sets_before = spark.read.parquet(str(tmp_path / "store" / "sets")).count()
    q2 = streaming_near_dup(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(str(tmp_path / "store" / "bands")).count() == bands_before
    assert spark.read.parquet(str(tmp_path / "store" / "sets")).count() == sets_before
    # the pair SET stays exactly the batch twin's (per-partition rows
    # may move between batch partitions on a from-scratch replay;
    # consumers key on the pair, as here)
    got2 = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert got2 == want


def test_streaming_near_dup_refuses_v1_store_layout(spark, tmp_path):
    """A pre-__batch-partitioned store (flat parquet files at the table
    root) must be refused at startup: partition discovery would break on
    the mixed layout, and a fresh checkpoint would silently overwrite
    batch-0.. partitions."""
    import pytest as _pytest

    from skylinemapreducehadoop_spark.streaming.dedup import streaming_near_dup

    # simulate a v1 store: flat (unpartitioned) parquet under bands/
    legacy = spark.createDataFrame([(1, 0, 7)], "id long, band int, bh long")
    legacy.write.parquet(str(tmp_path / "store" / "bands"))

    src = tmp_path / "docs"
    spark.createDataFrame([(1, "a b c")], "doc_id long, text string").write.parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(str(src))
    )
    with _pytest.raises(ValueError, match="v1 layout"):
        streaming_near_dup(
            stream,
            str(tmp_path / "store"),
            str(tmp_path / "pairs"),
            str(tmp_path / "ckpt"),
        )
