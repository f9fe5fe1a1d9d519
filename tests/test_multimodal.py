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


def _gif_bytes(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 20


def _bmp_bytes(w, h):
    import struct

    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 20


def _jpeg_bytes(w, h):
    import struct

    # SOI + APP0 stub + SOF0 frame header (public JFIF structure)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_image_header_meta_jvm_parses_real_formats(spark):
    """Zero-UDF JVM header parsing extracts TRUE dimensions from real
    PNG/GIF/BMP bytes (and classifies JPEG); garbage is NULL-kind."""
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_header_meta,
        make_png,
    )

    rows = [
        (0, make_png(640, 480)),
        (1, _gif_bytes(320, 200)),
        (2, _bmp_bytes(800, 600)),
        (3, _jpeg_bytes(1024, 768)),
        (4, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r["doc_id"]: r for r in image_header_meta(df).collect()}
    assert (out[0]["kind"], out[0]["width"], out[0]["height"]) == ("png", 640, 480)
    assert (out[1]["kind"], out[1]["width"], out[1]["height"]) == ("gif", 320, 200)
    assert (out[2]["kind"], out[2]["width"], out[2]["height"]) == ("bmp", 800, 600)
    # JPEG dims come from the unrolled zero-UDF SOF walk (r8)
    assert (out[3]["kind"], out[3]["width"], out[3]["height"]) == ("jpeg", 1024, 768)
    assert out[4]["kind"] is None and out[4]["width"] is None
    # the plan is pure expressions: no Python UDF stage
    plan = image_header_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_image_header_meta_jpeg_sof_walk_bounds(spark):
    """The SOF walk skips leading variable-length segments (APPn/DQT),
    agrees with the Python marker walk, and degrades to NULL dims —
    never garbage — when SOF sits past the unroll bound."""
    import struct

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _header_decode,
        image_header_meta,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    sof = seg(0xC2, b"\x08" + struct.pack(">HH", 333, 222) + b"\x03\x11\x00")
    deep = b"\xff\xd8" + b"".join(seg(0xE0 + i, b"x" * (5 + i)) for i in range(8)) + sof
    too_deep = b"\xff\xd8" + b"".join(seg(0xE1, b"y" * 9) for _ in range(15)) + sof
    df = spark.createDataFrame(
        [(0, deep), (1, too_deep)], "doc_id long, media binary"
    )
    out = {r["doc_id"]: r for r in image_header_meta(df).collect()}
    assert (out[0]["kind"], out[0]["width"], out[0]["height"]) == ("jpeg", 222, 333)
    w, h, _ = _header_decode(deep)
    assert (w, h) == (222, 333)
    assert out[1]["kind"] == "jpeg"
    assert out[1]["width"] is None and out[1]["height"] is None


def test_image_header_meta_topdown_bmp_signed_height(spark):
    """Real-world top-down BMPs store a NEGATIVE biHeight (signed LE
    i32); the JVM parse must sign-extend and report the magnitude —
    the same answer as the Python _header_decode path — instead of a
    ~4-billion garbage height from an unsigned read."""
    from skylinemapreducehadoop_spark.operators.multimodal import (
        _header_decode,
        image_header_meta,
    )

    payload = _bmp_bytes(800, -600)  # top-down: height stored as -600
    df = spark.createDataFrame([(0, payload)], "doc_id long, media binary")
    row = image_header_meta(df).collect()[0]
    assert (row["kind"], row["width"], row["height"]) == ("bmp", 800, 600)
    w, h, _ = _header_decode(payload)
    assert (w, h) == (row["width"], row["height"])


def test_header_decoder_all_formats_and_pillow_parity(spark):
    """decoder='header' walks genuine format structure (incl. the JPEG
    SOF marker scan) for true dimensions; corrupt payloads degrade to
    the sentinel row. If Pillow is present, dims must agree with the
    real codec on the PNG."""
    from skylinemapreducehadoop_spark.operators.multimodal import (
        decode_media,
        make_png,
        pillow_available,
    )

    rows = [
        (0, make_png(17, 9)),
        (1, _gif_bytes(33, 21)),
        (2, _bmp_bytes(5, 7)),
        (3, _jpeg_bytes(61, 43)),
        (4, b"\x89PNG truncated"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r["doc_id"]: r for r in decode_media(df, decoder="header").collect()}
    assert (out[0]["width"], out[0]["height"]) == (17, 9)
    assert (out[1]["width"], out[1]["height"]) == (33, 21)
    assert (out[2]["width"], out[2]["height"]) == (5, 7)
    assert (out[3]["width"], out[3]["height"]) == (61, 43)
    assert (out[4]["width"], out[4]["height"]) == (0, 0)
    assert (out[5]["width"], out[5]["height"]) == (0, 0)
    assert len(out[0]["features"]) == 4
    if pillow_available():
        real = {r["doc_id"]: r for r in decode_media(df, decoder="real").collect()}
        assert (real[0]["width"], real[0]["height"]) == (17, 9)


def test_synthesize_png_roundtrip(spark):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_header_meta,
        synthesize_png_column,
    )

    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        (1 + F.col("id") % 13).cast("int").alias("w"),
        (1 + F.col("id") % 7).cast("int").alias("h"),
    )
    out = image_header_meta(synthesize_png_column(df, "w", "h"))
    bad = out.where(
        (F.col("kind") != "png")
        | (F.col("width") != F.col("w"))
        | (F.col("height") != F.col("h"))
    ).count()
    assert bad == 0


def test_wav_header_and_mixed_synth(spark):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_header_meta,
        make_wav,
        synthesize_media_column,
    )

    df = spark.createDataFrame([(0, make_wav(44100)), (1, b"RIFFxxxx1234")],
                               "doc_id long, media binary")
    out = {r["doc_id"]: r for r in image_header_meta(df).collect()}
    assert (out[0]["kind"], out[0]["sample_rate"]) == ("wav", 44100)
    assert out[0]["width"] is None
    assert out[1]["kind"] is None  # RIFF but not WAVE/fmt -> unrecognized

    mixed = spark.range(16).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("png"), F.lit("gif"), F.lit("bmp"), F.lit("wav")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("k"),
        (3 + F.col("id") % 5).cast("int").alias("w"),
        (2 + F.col("id") % 3).cast("int").alias("h"),
    )
    parsed = image_header_meta(synthesize_media_column(mixed, "k", "w", "h"))
    bad = parsed.where(
        (F.col("kind") != F.col("k"))
        | (
            (F.col("k") != "wav")
            & ((F.col("width") != F.col("w")) | (F.col("height") != F.col("h")))
        )
        | ((F.col("k") == "wav") & (F.col("sample_rate") != F.col("w") * 100))
    ).count()
    assert bad == 0


def test_wav_stats_pure_decode_edges():
    import struct

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _wav_stats,
        make_wav,
    )

    # known waveform
    assert _wav_stats(make_wav(4400, samples=[100, -100, 50])) == (
        3, 4400, 100, 50 / 3, (22500 / 3) ** 0.5,
    )
    # zero-length data chunk
    assert _wav_stats(make_wav(8000, n_samples=0)) == (0, 8000, 0, 0.0, 0.0)
    # not RIFF / truncated / None
    assert _wav_stats(b"nope") == (None,) * 5
    assert _wav_stats(None) == (None,) * 5
    # stereo (n_channels=2) refused: rebuild fmt with 2 channels
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
    )
    stereo = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _wav_stats(stereo) == (None,) * 5
    # unknown chunk between fmt and data is skipped (generic RIFF walk)
    fmt1 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt1)) + fmt1
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd size -> pad byte
        + b"data" + struct.pack("<I", 2) + struct.pack("<h", -7)
    )
    weird = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _wav_stats(weird) == (1, 8000, 7, -7.0, 7.0)


def test_audio_features_spark_matches_closed_form_and_is_map_only(spark):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.multimodal import (
        audio_features,
        synthesize_pcm_wav_column,
    )

    df = spark.range(40).select(F.col("id").alias("doc_id"))
    out = audio_features(synthesize_pcm_wav_column(df, "doc_id"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for r in out.select("doc_id", "audio.*").collect():
        k = r["doc_id"]
        n = 16 + k % 17
        xs = [(k * 31 + i * 7) % 2001 - 1000 for i in range(n)]
        assert r["n_samples"] == n
        assert r["sample_rate"] == (1 + k % 32) * 100
        assert r["peak_abs"] == max(abs(x) for x in xs)
        assert r["mean_amp"] == sum(xs) / n
        assert r["rms"] == (sum(x * x for x in xs) / n) ** 0.5


def test_resize_images_stdlib_matches_numpy_reference(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _png_decode_gray8,
        image_pixel_stats,
        resize_images,
        synthesize_gray_png_column,
    )

    df = spark.range(30).select(F.col("id").alias("doc_id"))
    resized = resize_images(
        synthesize_gray_png_column(df, "doc_id"), 8, 6, decoder="stdlib"
    )
    rows = {r["doc_id"]: r for r in resized.collect()}
    for k in range(30):
        w, h = 1 + k % 16, 1 + k % 12
        y, x = np.mgrid[0:h, 0:w]
        src = ((k + 7 * x + 13 * y) % 256).astype(np.uint8)
        ys = (np.arange(6) * h) // 6
        xs = (np.arange(8) * w) // 8
        want = src[np.ix_(ys, xs)]
        got_w, got_h, got_px = _png_decode_gray8(rows[k]["media"])
        assert (got_w, got_h) == (8, 6)
        assert (got_px == want).all(), k
    # stats operator decodes the resized payloads back exactly
    st = {
        r["doc_id"]: r
        for r in image_pixel_stats(resized.select("doc_id", "media")).collect()
    }
    for k in range(30):
        w, h = 1 + k % 16, 1 + k % 12
        y, x = np.mgrid[0:h, 0:w]
        src = ((k + 7 * x + 13 * y) % 256).astype(np.uint8)
        want = src[np.ix_((np.arange(6) * h) // 6, (np.arange(8) * w) // 8)]
        assert st[k]["pixel_sum"] == int(want.sum())
        assert st[k]["pixel_min"] == int(want.min())
        assert st[k]["pixel_max"] == int(want.max())


def test_resize_images_undecodable_and_guards(spark):
    import pytest
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.multimodal import (
        make_gif,
        pillow_available,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, bytearray(make_gif(4, 4))), (3, None)],
        "doc_id long, media binary",
    )
    # without Pillow, only gray8 PNGs decode on the stdlib tier
    out = {r["doc_id"]: r for r in resize_images(df, 4, 4, decoder="stdlib").collect()}
    assert all(out[i]["media"] is None and out[i]["width"] is None for i in (1, 2, 3))
    with pytest.raises(ValueError):
        resize_images(df, 0, 4)
    with pytest.raises(ValueError):
        resize_images(df, 4, 4, decoder="bogus")
    if not pillow_available():
        with pytest.raises(NotImplementedError):
            resize_images(df, 4, 4, decoder="real")


def _encode_png_filtered(px, color_type, filter_types, palette=None):
    """Test-side PNG encoder that APPLIES a chosen RFC 2083 filter per
    scanline (make_png always writes filter 0), so the decoder's
    unfiltering of Sub/Up/Average/Paeth is driven for real at any
    bytes-per-pixel."""
    import struct
    import zlib

    import numpy as np

    if color_type == 2:
        h, w, _ = px.shape
        flat = px.reshape(h, w * 3).astype(np.int32)
        bpp = 3
    else:
        h, w = px.shape
        flat = px.astype(np.int32)
        bpp = 1
    n = w * bpp
    raw = b""
    prev = np.zeros(n, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        ft = filter_types[y % len(filter_types)]
        if ft == 0:
            enc = cur.copy()
        elif ft == 1:
            enc = np.array(
                [cur[x] - (cur[x - bpp] if x >= bpp else 0) for x in range(n)]
            )
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = np.array(
                [
                    cur[x] - ((cur[x - bpp] if x >= bpp else 0) + prev[x]) // 2
                    for x in range(n)
                ]
            )
        else:  # Paeth
            enc = np.zeros(n, dtype=np.int32)
            for x in range(n):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = cur[x] - pred
        raw += bytes([ft]) + bytes((enc & 0xFF).astype(np.uint8))
        prev = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    plte = chunk(b"PLTE", palette) if color_type == 3 else b""
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_gray_and_rgb():
    """Every RFC 2083 filter type, at bpp=1 (gray) AND bpp=3 (RGB):
    the decoder's unfiltering must recover the exact pixel array. Also
    a mixed-filter image (each scanline a different filter)."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import _png_decode

    rng = np.random.default_rng(42)
    gray = rng.integers(0, 256, size=(7, 11), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    for ft in (0, 1, 2, 3, 4):
        w, h, got = _png_decode(_encode_png_filtered(gray, 0, [ft]))
        assert (w, h) == (11, 7) and (got == gray).all(), f"gray filter {ft}"
        w, h, got = _png_decode(_encode_png_filtered(rgb, 2, [ft]))
        assert (w, h) == (11, 7) and got.shape == (7, 11, 3)
        assert (got == rgb).all(), f"rgb filter {ft}"
    # one image cycling through all five filters line by line
    for px, ct in ((gray, 0), (rgb, 2)):
        _, _, got = _png_decode(_encode_png_filtered(px, ct, [0, 1, 2, 3, 4]))
        assert (got == px).all(), f"mixed filters ct={ct}"


def test_png_decode_palette_and_luma():
    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _png_decode,
        _png_decode_gray8,
        _png_to_gray,
        make_png,
    )

    # 4-entry palette; indices exercise Sub/Paeth at bpp=1
    palette = bytes([10, 20, 30, 200, 100, 0, 0, 0, 255, 7, 7, 7])
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 3, 2]], dtype=np.uint8)
    for ft in (0, 1, 4):
        b = _encode_png_filtered(idx, 3, [ft], palette=palette)
        w, h, got = _png_decode(b)
        assert (w, h) == (4, 3) and got.shape == (3, 4, 3)
        want = np.frombuffer(palette, np.uint8).reshape(-1, 3)[idx]
        assert (got == want).all()
    # make_png can emit palette PNGs directly and they round-trip
    b = make_png(4, 3, idx.tobytes(), color_type=3, palette=palette)
    _, _, got = _png_decode(b)
    assert (got == np.frombuffer(palette, np.uint8).reshape(-1, 3)[idx]).all()
    # an index beyond the palette is an invalid stream -> None
    bad_idx = np.full((2, 2), 9, dtype=np.uint8)
    assert _png_decode(make_png(2, 2, bad_idx.tobytes(), color_type=3, palette=palette)) is None
    # the grayscale wrapper applies exact integer Rec.601 luma
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]]], dtype=np.uint8)
    g = _png_to_gray(rgb)
    assert g.tolist() == [[255 * 299 // 1000, 255 * 587 // 1000, 255 * 114 // 1000, 9]]
    b = make_png(4, 1, rgb.tobytes(), color_type=2)
    w, h, got = _png_decode_gray8(b)
    assert (w, h) == (4, 1) and (got == g).all()


def test_resize_images_stdlib_rgb_matches_reference(spark):
    """The bpp=3 path end-to-end: RGB fixtures -> stdlib decode ->
    integer luma -> nearest resize -> gray8 re-encode -> pixel stats,
    against a numpy reference of the same closed forms."""
    import numpy as np
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_pixel_stats,
        resize_images,
        synthesize_rgb_png_column,
    )

    df = spark.range(25).select(F.col("id").alias("doc_id"))
    resized = resize_images(
        synthesize_rgb_png_column(df, "doc_id"), 8, 6, decoder="stdlib"
    )
    st = {
        r["doc_id"]: r
        for r in image_pixel_stats(resized.select("doc_id", "media")).collect()
    }
    for k in range(25):
        w, h = 1 + k % 16, 1 + k % 12
        y, x = np.mgrid[0:h, 0:w]
        r_ = (k + 5 * x + 11 * y) % 256
        g_ = (3 * k + 7 * x + y) % 256
        b_ = (2 * k + x + 13 * y) % 256
        gray = (299 * r_ + 587 * g_ + 114 * b_) // 1000
        want = gray[np.ix_((np.arange(6) * h) // 6, (np.arange(8) * w) // 8)]
        assert st[k]["pixel_sum"] == int(want.sum()), k
        assert st[k]["pixel_min"] == int(want.min())
        assert st[k]["pixel_max"] == int(want.max())


def test_bmp_decode_roundtrip_topdown_and_malformed(spark):
    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _bmp_decode,
        _stdlib_decode_gray8,
        make_bmp_pixels,
    )

    rgb = (np.arange(4 * 6 * 3) * 7 % 256).astype(np.uint8).reshape(6, 4, 3)
    b = make_bmp_pixels(4, 6, rgb)
    w, h, px = _bmp_decode(b)
    assert (w, h) == (4, 6) and np.array_equal(px, rgb)
    # top-down variant: negate height in the info header
    import struct

    td = bytearray(b)
    struct.pack_into("<i", td, 22, -6)
    # rows must then be supplied top-down: rebuild payload unflipped
    stride = (4 * 3 + 3) & ~3
    pad = b"\x00" * (stride - 12)
    td = bytes(td[:54]) + b"".join(rgb[y, :, ::-1].tobytes() + pad for y in range(6))
    w2, h2, px2 = _bmp_decode(td)
    assert (w2, h2) == (4, 6) and np.array_equal(px2, rgb)
    # malformed: wrong magic, truncated, 8-bit
    assert _bmp_decode(b"XX" + b[2:]) is None
    assert _bmp_decode(b[:40]) is None
    bad = bytearray(b)
    struct.pack_into("<H", bad, 28, 8)
    assert _bmp_decode(bytes(bad)) is None
    # dispatcher: gray conversion matches the exact integer luma
    _, _, g = _stdlib_decode_gray8(b)
    xs = rgb.astype(np.int64)
    ref = (299 * xs[..., 0] + 587 * xs[..., 1] + 114 * xs[..., 2]) // 1000
    assert np.array_equal(g, ref.astype(np.uint8))


def test_resize_accepts_bmp_inputs(spark):
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_pixel_stats,
        resize_images,
        synthesize_rgb_bmp_column,
    )

    df = spark.createDataFrame([(17,), (40,)], "doc_id long")
    bmps = synthesize_rgb_bmp_column(df, "doc_id")
    out = image_pixel_stats(
        resize_images(bmps, 4, 3, decoder="stdlib").select("doc_id", "media")
    ).collect()
    got = {r["doc_id"]: (r["width"], r["height"]) for r in out}
    assert got == {17: (4, 3), 40: (4, 3)}
    assert all(r["pixel_sum"] is not None for r in out)


# ---------------------------------------------------------------------------
# image_dhash (round 10)


def test_image_dhash_container_invariant(spark):
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_dhash,
        synthesize_rgb_bmp_column,
        synthesize_rgb_png_column,
    )

    base = spark.createDataFrame([(k,) for k in (3, 7, 20, 41)], "doc_id long")
    png = image_dhash(synthesize_rgb_png_column(base, "doc_id")).collect()
    bmp = image_dhash(synthesize_rgb_bmp_column(base, "doc_id")).collect()
    hp = {r["doc_id"]: r["dhash_bits"] for r in png}
    hb = {r["doc_id"]: r["dhash_bits"] for r in bmp}
    assert hp == hb  # same pixels, different container -> same dhash
    for v in hp.values():
        assert len(v) == 64 and set(v) <= {"0", "1"}


def test_image_dhash_monotonic_remap_invariant(spark):
    import numpy as np
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_dhash,
        make_png,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 100, (10, 12)).astype(np.uint8)  # headroom: no wrap
    remapped = (px * 2 + 30).astype(np.uint8)  # strictly monotonic
    df = spark.createDataFrame(
        [
            (1, bytearray(make_png(12, 10, px.tobytes()))),
            (2, bytearray(make_png(12, 10, remapped.tobytes()))),
        ],
        "doc_id long, media binary",
    )
    out = {r["doc_id"]: r["dhash_bits"] for r in image_dhash(df).collect()}
    assert out[1] == out[2]


def test_image_dhash_undecodable_null(spark):
    from skylinemapreducehadoop_spark.operators.multimodal import image_dhash

    df = spark.createDataFrame(
        [(1, bytearray(b"not an image"))], "doc_id long, media binary"
    )
    row = image_dhash(df).collect()[0]
    assert row["dhash_bits"] is None and row["width"] is None


def test_image_dhash_matches_manual_bits(spark):
    import numpy as np
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_dhash,
        make_png,
        resize_nearest,
    )

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (20, 30)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(make_png(30, 20, px.tobytes())))],
        "doc_id long, media binary",
    )
    got = image_dhash(df).collect()[0]["dhash_bits"]
    g = resize_nearest(px.astype(np.int64), 9, 8)
    want = "".join(
        "1" if g[y, x] > g[y, x + 1] else "0" for y in range(8) for x in range(8)
    )
    assert got == want


def test_jpeg_pixel_boundary_contract(spark):
    """The JPEG pixel boundary, contract-tested (r10 verdict task 6,
    narrowed in r12): the pixel tier now decodes baseline
    single-component JPEGs with real scan data (see
    test_jpeg_roundtrip_* below), but a marker-only JPEG stub — valid
    structure, NO entropy-coded scan — must still yield NULL rows
    (undecodable media is data, not a job failure), the zero-UDF
    header tier must STILL extract the true SOF0 dimensions (metadata
    always flows), and the real-codec tier must raise the documented
    NotImplementedError while Pillow is absent — so the boundary is
    an asserted contract, not an implied gap."""
    import pytest
    from skylinemapreducehadoop_spark.operators.multimodal import (
        decode_media,
        image_dhash,
        image_header_meta,
        image_pixel_stats,
        make_jpeg,
        pillow_available,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(make_jpeg(12, 7)))], "doc_id long, media binary"
    )

    # header metadata flows: the SOFn walk finds the true dimensions
    meta = image_header_meta(df).collect()[0]
    assert meta["kind"] == "jpeg"
    assert meta["width"] == 12 and meta["height"] == 7

    # pixel tier: NULL, never an exception
    dh = image_dhash(df).collect()[0]
    assert dh["dhash_bits"] is None and dh["width"] is None
    ps = image_pixel_stats(df).collect()[0]
    assert ps["pixel_sum"] is None and ps["width"] is None
    rz = resize_images(df, 4, 4, decoder="stdlib").collect()[0]
    assert rz["media"] is None and rz["width"] is None

    # real-codec tier: the documented gate fires while Pillow is absent
    if pillow_available():
        pytest.skip("Pillow installed: the gate legitimately opens")
    with pytest.raises(NotImplementedError):
        decode_media(df, decoder="real")
    with pytest.raises(NotImplementedError):
        resize_images(df, 4, 4, decoder="real")


# ---------------------------------------------------------------------------
# Baseline JPEG pixel tier (r12): real entropy-coded DCT encode/decode
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_block_uniform_exact():
    """The tier's exactness LAW: an 8x8-block-uniform image encoded at
    quant=1 round-trips bit-exactly (every block is DC-only; the DC
    path 8*(v-128) -> /8 -> +128 is exact in IEEE double). This is
    what makes the JPEG container usable in the closed-form dHash /
    pixel-stat fixtures."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _jpeg_decode_gray8,
        _mosaic_gray,
        make_jpeg_pixels,
    )

    for k in (0, 1, 5, 37, 250, 255, 256, 511, 1000003):
        w, h, px = _mosaic_gray(k)
        dec = _jpeg_decode_gray8(make_jpeg_pixels(w, h, px))
        assert dec is not None
        dw, dh, got = dec
        assert (dw, dh) == (w, h)
        assert np.array_equal(got, px), f"k={k}"


def test_jpeg_roundtrip_general_within_one_and_stuffing():
    """General content at quant=1 round-trips within ±1 grey level
    (AC float rounding), including odd (non-multiple-of-8) dimensions
    cropped from the padded canvas; a high-entropy image is asserted
    to actually produce stuffed 0xFF00 bytes so the un-stuffing path
    is exercised, not assumed."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _jpeg_decode_gray8,
        make_jpeg_pixels,
    )

    y, x = np.mgrid[0:7, 0:13]
    grad = ((5 + 7 * x + 13 * y) % 256).astype(np.uint8)
    dw, dh, got = _jpeg_decode_gray8(make_jpeg_pixels(13, 7, grad))
    assert (dw, dh) == (13, 7)
    assert np.abs(got.astype(int) - grad.astype(int)).max() <= 1

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (40, 56)).astype(np.uint8)
    b = make_jpeg_pixels(56, 40, img)
    assert b.count(b"\xff\x00") > 0, "stuffing never fired: test is vacuous"
    dw, dh, got = _jpeg_decode_gray8(b)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 1

    cb = np.zeros((8, 8), np.uint8)
    cb[::2, ::2] = 255
    cb[1::2, 1::2] = 255  # the ±1024-coefficient adversarial case (clamped)
    dw, dh, got = _jpeg_decode_gray8(make_jpeg_pixels(8, 8, cb))
    assert np.abs(got.astype(int) - cb.astype(int)).max() <= 1


def test_jpeg_quant_table_zigzag_order():
    """DQT bytes are stored in ZIG-ZAG order (T.81 B.2.4.1): encode
    with a deliberately asymmetric natural-order table and assert the
    decode equals the reference FDCT->quant->dequant->IDCT pipeline
    computed directly — a transposed/raster DQT write or read would
    pair the wrong step sizes and fail loudly."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _dct8_matrix,
        _jpeg_decode_gray8,
        make_jpeg_pixels,
    )

    q = np.ones(64, dtype=np.int64)
    q[1] = 97  # natural index (0,1): horizontal first harmonic
    q[8] = 11  # natural index (1,0): vertical first harmonic
    y, x = np.mgrid[0:8, 0:8]
    img = ((31 * x + 3 * y) % 256).astype(np.uint8)

    c = _dct8_matrix()
    s = c @ (img.astype(np.float64) - 128.0) @ c.T
    ref = np.clip(
        np.rint(c.T @ (np.rint(s / q.reshape(8, 8)) * q.reshape(8, 8)) @ c) + 128,
        0,
        255,
    ).astype(np.uint8)

    dw, dh, got = _jpeg_decode_gray8(make_jpeg_pixels(8, 8, img, quant=list(q)))
    assert np.array_equal(got, ref)


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn resync structure: byte-aligned restart markers every N
    MCUs with DC predictor reset survive the round trip (exactly on a
    block-uniform mosaic, within ±1 on random content)."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _jpeg_decode_gray8,
        _mosaic_gray,
        make_jpeg_pixels,
    )

    w, h, mos = _mosaic_gray(300)
    b = make_jpeg_pixels(w, h, mos, restart_interval=1)
    assert b.count(b"\xff\xdd") == 1
    dec = _jpeg_decode_gray8(b)
    assert dec is not None and np.array_equal(dec[2], mos)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    dw, dh, got = _jpeg_decode_gray8(
        make_jpeg_pixels(40, 24, img, restart_interval=2)
    )
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_decoder_scope_gates():
    """Out-of-tier payloads return None (fall through to the Pillow
    tier) rather than mis-decoding: marker-only stubs (no scan),
    multi-component SOF0, progressive SOF2, truncated scans, and
    non-JPEG bytes."""
    import struct

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _jpeg_decode_gray8,
        _mosaic_gray,
        make_jpeg,
        make_jpeg_pixels,
    )

    assert _jpeg_decode_gray8(make_jpeg(12, 7)) is None
    assert _jpeg_decode_gray8(None) is None
    assert _jpeg_decode_gray8(b"\x89PNG\r\n\x1a\n") is None

    w, h, mos = _mosaic_gray(9)
    good = make_jpeg_pixels(w, h, mos)
    # flip the SOF0 marker to SOF2 (progressive): same bytes, gated
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert _jpeg_decode_gray8(prog) is None
    # truncate mid-scan: a malformed stream is data, not an exception
    assert _jpeg_decode_gray8(good[: len(good) - 8]) is None

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    # hand-built 3-component SOF0 header: multi-component is gated
    sof3 = seg(
        0xC0,
        b"\x08" + struct.pack(">HH", 8, 8) + b"\x03"
        + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    assert _jpeg_decode_gray8(b"\xff\xd8" + sof3 + b"\xff\xd9") is None


def test_jpeg_pixel_stats_and_dhash_flow(spark):
    """The Spark plumbing end-to-end on REAL JPEG payloads: exact
    pixel stats through image_pixel_stats, and the container law —
    the same mosaic as gray8 PNG and as baseline JPEG hashes to the
    IDENTICAL dHash while the bytes differ."""
    import numpy as np
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _mosaic_gray,
        image_dhash,
        image_pixel_stats,
        synthesize_mosaic_jpeg_column,
        synthesize_mosaic_png_column,
    )

    ks = [0, 7, 37, 250, 511]
    base = spark.createDataFrame([(k,) for k in ks], "k long")
    jpg = synthesize_mosaic_jpeg_column(
        base.select(F.col("k").alias("doc_id"), "k"), "k"
    ).select("doc_id", "media")

    got = {
        r["doc_id"]: r for r in image_pixel_stats(jpg).collect()
    }
    for k in ks:
        w, h, px = _mosaic_gray(k)
        r = got[k]
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_sum"] == int(px.sum(dtype=np.int64))
        assert r["pixel_min"] == int(px.min()) and r["pixel_max"] == int(px.max())

    png = synthesize_mosaic_png_column(
        base.select((F.col("k") + 1000).alias("doc_id"), "k"), "k"
    ).select("doc_id", "media")
    hashes = {
        r["doc_id"]: r["dhash_bits"]
        for r in image_dhash(jpg.unionByName(png)).collect()
    }
    for k in ks:
        assert hashes[k] is not None
        assert hashes[k] == hashes[k + 1000], f"container law broke at k={k}"


def test_decode_media_stdlib_tier_and_auto_hybrid(spark):
    """decode_media gains the no-codec REAL tier (r12): 'stdlib'
    returns genuine decoded stats for PNG/BMP/baseline-JPEG payloads
    and the (0,0,zeros) sentinel outside the tier; without Pillow,
    'auto' prefers the real stdlib decode per payload and only falls
    back to the deterministic fake for undecodable bytes."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _fake_decode,
        _mosaic_gray,
        decode_media,
        make_jpeg_pixels,
        make_png,
        pillow_available,
    )

    w, h, mos = _mosaic_gray(37)
    rows = [
        (1, bytearray(make_jpeg_pixels(w, h, mos))),
        (2, bytearray(make_png(4, 3, bytes(range(12))))),
        (3, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")

    got = {r["doc_id"]: r for r in decode_media(df, decoder="stdlib").collect()}
    a = mos.astype(np.float64)
    assert (got[1]["width"], got[1]["height"]) == (w, h)
    assert got[1]["features"] == [
        float(a.mean()), float(a.std()), float(a.min()), float(a.max())
    ]
    assert (got[2]["width"], got[2]["height"]) == (4, 3)
    assert got[3]["width"] == 0 and got[3]["features"] == [0.0] * 4

    if pillow_available():
        return  # 'auto' legitimately resolves to the Pillow tier
    auto = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert auto[1]["features"] == got[1]["features"]  # real, not fake
    fw, fh, ff = _fake_decode(b"not an image at all")
    assert (auto[3]["width"], auto[3]["height"], auto[3]["features"]) == (fw, fh, ff)


def test_jpeg_truncated_sof0_returns_none():
    """ADVICE r12: a crafted SOF0 with an 8-byte body (one byte short
    of the single-component frame's qid at body[8]) must fall through
    as malformed (None), not IndexError inside the UDF. Built from a
    valid stream by shrinking the SOF0 segment."""
    import struct

    import numpy as np

    from skylinemapreducehadoop_spark.operators.multimodal import (
        _jpeg_decode_gray8,
        make_jpeg_pixels,
    )

    good = make_jpeg_pixels(8, 8, np.zeros((8, 8), np.uint8))
    i = good.find(b"\xff\xc0")
    assert i >= 0
    (seg_len,) = struct.unpack(">H", good[i + 2 : i + 4])
    body = good[i + 4 : i + 2 + seg_len]
    assert len(body) >= 9
    # rebuild the stream with the SOF0 body truncated to 8 bytes
    crafted = (
        good[:i]
        + b"\xff\xc0"
        + struct.pack(">H", 2 + 8)
        + body[:8]
        + good[i + 2 + seg_len :]
    )
    assert _jpeg_decode_gray8(crafted) is None
