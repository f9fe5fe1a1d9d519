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
    a = sorted(map(tuple, M.decode_media(df, decoder="fake").collect()))
    b = sorted(map(tuple, M.decode_media(df, decoder="fake").collect()))
    assert a == b
    for row in a:
        doc_id, width, height, features = row
        assert width > 0 and height > 0
        assert len(features) == 4


@pytest.mark.skipif(
    M.pillow_available(), reason="Pillow installed — the gate is open"
)
def test_real_decoder_gated_without_pillow(spark):
    df = _media_df(spark)
    with pytest.raises(NotImplementedError):
        M.decode_media(df, decoder="real").collect()


@pytest.mark.skipif(
    M.pillow_available(), reason="Pillow installed — auto resolves to real"
)
def test_auto_falls_back_to_fake_without_pillow(spark):
    df = _media_df(spark)
    auto = sorted(map(tuple, M.decode_media(df).collect()))
    fake = sorted(map(tuple, M.decode_media(df, decoder="fake").collect()))
    assert auto == fake


@pytest.mark.skipif(
    not M.pillow_available(), reason="Pillow not bundled in this environment"
)
def test_real_decode_roundtrip_with_pillow(spark):
    """Decode a genuine PNG through the real codec: exact dimensions
    and grayscale stats come back; corrupt payloads degrade to the
    sentinel row instead of failing the task."""
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("L", (12, 7), color=200).save(buf, format="PNG")
    rows = [(1, buf.getvalue()), (2, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r for r in M.decode_media(df, decoder="real").collect()}
    assert (got[1]["width"], got[1]["height"]) == (12, 7)
    assert got[1]["features"][0] == 200.0  # mean of a constant image
    assert (got[2]["width"], got[2]["height"]) == (0, 0)
    # auto resolves to the real codec when Pillow is present
    auto = {r["doc_id"]: r for r in M.decode_media(df).collect()}
    assert (auto[1]["width"], auto[1]["height"]) == (12, 7)


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
