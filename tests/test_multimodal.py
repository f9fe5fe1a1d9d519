"""Multimodal plumbing tests — fake decoder, real Spark machinery."""

from __future__ import annotations

import pytest

from skylinemapreducehadoop_spark.operators import multimodal as M


def _media_df(spark):
    rows = [(i, f"payload-{i}-" + "x" * (i * 50)) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return M.attach_binary_payload(df, "text", kind="image")


def test_attach_payload_schema(spark):
    df = _media_df(spark)
    assert dict(df.dtypes)["media"] == "binary"
    meta = df.select("media_meta.kind").distinct().collect()
    assert [r["kind"] for r in meta] == ["image"]


def test_fake_decode_deterministic(spark):
    df = _media_df(spark)
    a = sorted(map(tuple, M.decode_media(df).collect()))
    b = sorted(map(tuple, M.decode_media(df).collect()))
    assert a == b
    for row in a:
        doc_id, width, height, features = row
        assert width > 0 and height > 0
        assert len(features) == 4


def test_real_decoder_gated(spark):
    df = _media_df(spark)
    with pytest.raises((NotImplementedError, Exception)):
        # Pillow absent in this environment -> NotImplementedError;
        # if present, the call is still a stub and must not silently pass
        M.decode_media(df, decoder="real").collect()


def test_unknown_decoder(spark):
    with pytest.raises(ValueError):
        M.decode_media(_media_df(spark), decoder="nope")


def test_frame_sampling_fans_out(spark):
    df = _media_df(spark)
    frames = M.sample_frames(df, every_n=2).collect()
    assert len(frames) > df.count()  # cardinality increases
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc_id, idxs in by_doc.items():
        assert idxs == sorted(idxs)
        assert all(i % 2 == 0 for i in idxs)  # every 2nd frame kept
