"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct alongside — the layout a 100 TB training-data pipeline needs:
payload bytes never pass through Python except inside the Arrow-batched
decode UDF, and metadata-only queries prune the binary column entirely
at the parquet scan.

The decode step itself needs codec libraries (Pillow/ffmpeg/...) that
are NOT in this environment, so the decoders are STUBS behind a clearly
marked gate: ``decoder="fake"`` produces a deterministic synthetic
decode (real Spark plumbing, fake pixels) for tests and plan work;
``decoder="real"`` raises ``NotImplementedError`` unless the optional
library imports.

Schema conventions:
- payload: ``media binary``
- metadata: ``media_meta struct<kind string, width int, height int,
  n_frames int, sample_rate int>`` (NULL fields where not applicable)
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, source_col: str, kind: str = "image") -> DataFrame:
    """Test/demo helper: wrap an existing column's bytes as a media
    payload with metadata. In production the binary comes straight from
    the parquet/lakehouse scan."""
    payload = F.col(source_col).cast("binary")
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _fake_decode(payload: bytes | None) -> tuple[int, int, list[float]]:
    """Deterministic synthetic decode: 'dimensions' and a tiny feature
    vector derived from the bytes — stands in for a real codec so the
    batch shape / schema / partitioning of the pipeline is testable."""
    if payload is None or len(payload) == 0:
        return 0, 0, [0.0] * 4
    b = np.frombuffer(payload, dtype=np.uint8)
    width = int(b[: len(b) // 2].sum() % 640) + 1
    height = int(b[len(b) // 2 :].sum() % 480) + 1
    feat = [
        float(b.mean()),
        float(b.std()),
        float(b.min()),
        float(b.max()),
    ]
    return width, height, feat


_DECODE_SCHEMA_SUFFIX = [
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
]


def pillow_available() -> bool:
    """Capability probe for the optional real image codec."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _real_decode(payload: bytes | None) -> tuple[int, int, list[float]]:
    """Actual image decode via Pillow: dimensions plus the same 4
    grayscale-intensity features the fake decoder fabricates
    (mean/std/min/max), so downstream schema and semantics line up.
    Undecodable payloads degrade to the (0, 0, zeros) sentinel row
    rather than failing the task — corrupt bytes are data, not bugs."""
    import io

    import PIL.Image

    if payload is None or len(payload) == 0:
        return 0, 0, [0.0] * 4
    try:
        img = PIL.Image.open(io.BytesIO(bytes(payload)))
        gray = img.convert("L")
    except Exception:
        return 0, 0, [0.0] * 4
    a = np.asarray(gray, dtype=np.float64)
    return (
        int(gray.width),
        int(gray.height),
        [float(a.mean()), float(a.std()), float(a.min()), float(a.max())],
    )


def _stdlib_feat_decode(payload) -> "tuple[int, int, list[float]] | None":
    """No-codec REAL decode for the feature schema: the stdlib pixel
    tier (8-bit PNG, 24-bit BMP, baseline gray JPEG — dispatch in
    :func:`_stdlib_decode_gray8`) with the same grayscale
    mean/std/min/max features as the Pillow tier; None when the
    payload is outside the tier."""
    dec = _stdlib_decode_gray8(payload)
    if dec is None:
        return None
    w, h, px = dec
    a = px.astype(np.float64)
    return w, h, [float(a.mean()), float(a.std()), float(a.min()), float(a.max())]


def decode_media(
    df: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    media_col: str = "media",
    decoder: str = "auto",
    batch_features: int = 4,
) -> DataFrame:
    """Decode payloads → (id_cols..., width, height, features).

    ``mapInPandas`` so each Arrow batch is decoded vectorized and the
    output cardinality may differ from the input (frame sampling).

    Decoder selection: ``'auto'`` (default) uses the REAL Pillow codec
    when the library is importable, else falls back to ``'hybrid'``;
    ``'hybrid'`` (an explicit value too) decodes each payload with the
    no-codec stdlib pixel tier (8-bit PNG, 24-bit BMP, baseline gray
    JPEG — genuine decoded stats) and the deterministic fake for
    out-of-tier payloads — NOTE the mixed-semantics contract: one
    output column can hold real decoded stats for in-tier payloads
    and synthetic stats for the rest (ADVICE r12 — explicit, by
    design, so no-Pillow environments still exercise the real tier);
    ``'real'`` requires Pillow and raises ``NotImplementedError``
    without it (fall back to ``'hybrid'``/``'auto'``/``'fake'``);
    ``'stdlib'`` forces the no-codec pixel tier (out-of-tier payloads
    get the (0, 0, zeros) sentinel); ``'header'`` parses genuine
    PNG/GIF/BMP/JPEG structure for true dimensions with byte-stat
    features — real format decoding with no codec dependency;
    ``'fake'`` forces the synthetic decode. The probe runs on the
    driver — workers are assumed to share the driver's environment
    (standard Spark deployment).
    """
    if decoder == "auto":
        decoder = "real" if pillow_available() else "hybrid"
    if decoder == "real":
        if not pillow_available():
            raise NotImplementedError(
                "real media decoding requires Pillow/ffmpeg, which are not "
                "installed in this environment; use decoder='hybrid' (the "
                "no-codec pixel tier + fake fallback), 'fake', or 'auto' "
                "for pipeline plumbing"
            )
        decode_one = _real_decode
    elif decoder == "header":
        decode_one = _header_decode
    elif decoder == "stdlib":
        decode_one = lambda p: _stdlib_feat_decode(p) or (0, 0, [0.0] * 4)  # noqa: E731
    elif decoder == "hybrid":
        decode_one = lambda p: _stdlib_feat_decode(p) or _fake_decode(p)  # noqa: E731
    elif decoder == "fake":
        decode_one = _fake_decode
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + _DECODE_SCHEMA_SUFFIX
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            decoded = [decode_one(p) for p in pdf[media_col]]
            out = pdf[list(id_cols)].copy()
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["features"] = [d[2] for d in decoded]
            yield out

    return df.select(*id_cols, media_col).mapInPandas(decode, out_schema)


def make_png(
    width: int,
    height: int,
    pixels: bytes | None = None,
    *,
    color_type: int = 0,
    palette: bytes | None = None,
) -> bytes:
    """Build a VALID minimal PNG (public format: RFC 2083) —
    signature, IHDR, one zlib IDAT of filter-0 scanlines, IEND, real
    CRCs. ``color_type`` 0 = gray8 (``pixels`` is width*height bytes,
    default all-zero), 2 = RGB8 (width*height*3 bytes), 3 = palette8
    (width*height index bytes + a ``palette`` of 3*n RGB bytes). Pure
    stdlib (struct + zlib), so the repo can exercise genuine
    image-format byte parsing without any codec library."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    if color_type not in (0, 2, 3):
        raise ValueError("color_type must be 0 (gray), 2 (RGB) or 3 (palette)")
    bpp = 3 if color_type == 2 else 1
    if pixels is None:
        pixels = b"\x00" * (width * height * bpp)
    if len(pixels) != width * height * bpp:
        raise ValueError(f"pixels must be width*height*{bpp} bytes")
    if color_type == 3:
        if palette is None or len(palette) % 3 or not palette:
            raise ValueError("palette color type needs 3*n RGB palette bytes")
    n = width * bpp
    raw = b"".join(b"\x00" + pixels[y * n : (y + 1) * n] for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    plte = chunk(b"PLTE", palette) if color_type == 3 else b""
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a header with a logical screen descriptor (public
    format) — enough real structure for header-level decoding."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


def make_bmp(width: int, height: int) -> bytes:
    """Minimal BMP: file header + BITMAPINFOHEADER (public format)."""
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    return head + info


def make_wav(
    sample_rate: int, n_samples: int = 8, samples: "Sequence[int] | None" = None
) -> bytes:
    """Minimal valid PCM WAV (RIFF/WAVE, public format): fmt chunk with
    the given sample rate + a 16-bit mono data chunk — silent by
    default, or the given int16 ``samples``."""
    import struct

    if samples is not None:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = b"\x00\x00" * n_samples
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_png_column(
    df: DataFrame,
    width_col: str,
    height_col: str,
    *,
    out_col: str = "media",
) -> DataFrame:
    """Attach a real PNG payload per row with the given dimensions
    (Arrow-batched construction). Test/fixture helper: at production
    scale the binary comes from the lake scan."""

    @F.pandas_udf(T.BinaryType())
    def synth(ws: pd.Series, hs: pd.Series) -> pd.Series:
        return pd.Series(
            [make_png(int(w), int(h)) for w, h in zip(ws, hs)]
        )

    return df.withColumn(out_col, synth(F.col(width_col), F.col(height_col)))


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal structurally-valid JPEG (public JFIF/ITU T.81 layout):
    SOI, an APP0 JFIF stub, a quantization table, a baseline SOF0 frame
    header carrying the dimensions, EOI — enough real marker structure
    to exercise a SOF walk that must skip variable-length segments."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(64))
    sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", height, width) + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def synthesize_media_column(
    df: DataFrame,
    kind_col: str,
    width_col: str,
    height_col: str,
    *,
    out_col: str = "media",
    wav_samples_col: str | None = None,
) -> DataFrame:
    """Mixed-format fixture: per row build a real PNG/GIF/BMP/JPEG
    (dims from width/height) or WAV (sample rate = width * 100)
    according to ``kind_col`` in {'png','gif','bmp','jpeg','wav'}.
    ``wav_samples_col`` optionally sets the WAV data-chunk length in
    16-bit samples per row (payload size = 44 + 2*n exactly — a
    closed-form size the frame-sampling oracle can model); default 8.
    """
    makers = {"png": make_png, "gif": make_gif, "bmp": make_bmp, "jpeg": make_jpeg}

    @F.pandas_udf(T.BinaryType())
    def synth(ks: pd.Series, ws: pd.Series, hs: pd.Series, ns: pd.Series) -> pd.Series:
        out = []
        for k, w, h, n in zip(ks, ws, hs, ns):
            if k == "wav":
                out.append(make_wav(int(w) * 100, n_samples=int(n)))
            else:
                out.append(makers[k](int(w), int(h)))
        return pd.Series(out)

    n_col = F.col(wav_samples_col) if wav_samples_col else F.lit(8)
    return df.withColumn(
        out_col,
        synth(F.col(kind_col), F.col(width_col), F.col(height_col), n_col.cast("int")),
    )


def _be_u32(col: str, pos: int):
    """Big-endian uint32 at 1-based byte offset ``pos`` of a binary
    column — pure JVM (substring → hex → conv)."""
    return F.conv(F.hex(F.expr(f"substring({col}, {pos}, 4)")), 16, 10).cast("int")


def _le_u16(col: str, pos: int):
    b = lambda p: F.conv(F.hex(F.expr(f"substring({col}, {p}, 1)")), 16, 10).cast("int")  # noqa: E731
    return b(pos) + b(pos + 1) * 256


def _le_u32(col: str, pos: int):
    # accumulate in LONG: the top byte's contribution (up to 255 * 2^24)
    # overflows int32, which throws under ANSI mode and silently wraps
    # otherwise; the final cast is safe for the fields this helper reads
    # (dims/sample rates < 2^31) — signed fields go through _le_i32
    b = lambda p: F.conv(F.hex(F.expr(f"substring({col}, {p}, 1)")), 16, 10).cast("long")  # noqa: E731
    return (b(pos) + b(pos + 1) * 256 + b(pos + 2) * 65536 + b(pos + 3) * 16777216).cast(
        "int"
    )


def _le_i32(col: str, pos: int):
    """Little-endian SIGNED int32 (two's complement) at 1-based byte
    offset ``pos`` — e.g. BMP biHeight, negative for top-down bitmaps."""
    b = lambda p: F.conv(F.hex(F.expr(f"substring({col}, {p}, 1)")), 16, 10).cast("long")  # noqa: E731
    u = b(pos) + b(pos + 1) * 256 + b(pos + 2) * 65536 + b(pos + 3) * 16777216
    return F.when(u >= F.lit(2**31), u - F.lit(2**32)).otherwise(u).cast("int")


def image_header_meta(
    df: DataFrame, *, media_col: str = "media", jpeg_max_segments: int = 12
) -> DataFrame:
    """REAL image-format header decoding with ZERO UDFs: magic-number
    dispatch plus fixed-offset dimension fields, all as JVM substring/
    hex/conv expressions, so a metadata backfill over 100 TB of
    payloads runs entirely inside whole-stage codegen with no Python
    worker in the loop.

    Formats with fixed-offset fields (all public specs):
    - PNG (RFC 2083): IHDR width/height, big-endian u32 at bytes 17/21
    - GIF (GIF87a/89a): logical screen w/h, little-endian u16 at 7/9
    - BMP (BITMAPINFOHEADER): little-endian u32 at bytes 19/23
    - WAV (RIFF/WAVE with a leading fmt chunk — the canonical layout):
      sample_rate, little-endian u32 at byte 25
    JPEG dimensions live in a variable-position SOFn marker; the walk
    is unrolled as ``jpeg_max_segments`` chained PROJECTIONS (each
    level reads the previous level's offset column, so the plan grows
    linearly, not exponentially) — still zero UDF. A SOF deeper than
    the bound (e.g. very EXIF-heavy files) leaves NULL dims; raise the
    bound or use ``decode_media(decoder='header')`` for those.

    Adds ``kind`` (string, NULL if unrecognized), ``width``,
    ``height``, ``sample_rate`` (int, NULL where unknown/n.a.).
    """
    magic8 = F.hex(F.expr(f"substring({media_col}, 1, 8)"))
    magic3 = F.hex(F.expr(f"substring({media_col}, 1, 3)"))
    magic2 = F.hex(F.expr(f"substring({media_col}, 1, 2)"))
    is_png = magic8 == "89504E470D0A1A0A"
    is_gif = magic3 == "474946"
    is_bmp = magic2 == "424D"
    is_jpeg = magic2 == "FFD8"
    is_wav = (F.hex(F.expr(f"substring({media_col}, 1, 4)")) == "52494646") & (
        F.hex(F.expr(f"substring({media_col}, 9, 8)")) == "57415645666D7420"
    )
    kind = (
        F.when(is_png, "png")
        .when(is_gif, "gif")
        .when(is_bmp, "bmp")
        .when(is_jpeg, "jpeg")
        .when(is_wav, "wav")
        .otherwise(F.lit(None).cast("string"))
    )
    # --- JPEG SOFn walk as ONE ArrayAggregate fold --------------------
    # Segment grammar (public JFIF/ITU T.81 structure): at offset o
    # (1-based), byte o = 0xFF, o+1 = marker, o+2..o+3 = BE u16 length
    # (length bytes included); next segment at o + 2 + length. SOFn =
    # 0xC0-0xCF minus DHT(0xC4)/JPG(0xC8)/DAC(0xCC); inside it height
    # is the BE u16 at o+5, width at o+7. The walk is a bounded fold
    # (``aggregate`` over a max_segments-long sequence) whose state is
    # (offset, w, h): a single Catalyst expression evaluated
    # ITERATIVELY at runtime — a chained-projection unroll would be
    # re-inlined by CollapseProject into an exponentially growing tree
    # (~10 offset references per level), which this avoids. The byte
    # prefix is materialized once per row and lambda-bound (the
    # ngrams() binding trick), so each byte is decoded exactly once.
    # The walk stops (NULL offset) at SOS/EOI, a non-FF byte, a found
    # SOF, or past the prefix (try_element_at -> NULL).
    prefix_bytes = F.transform(
        F.sequence(F.lit(1), F.lit(2048)),
        lambda i: F.conv(
            F.hex(F.substring(F.col(media_col), i, F.lit(1))), 16, 10
        ).cast("int"),
    )

    def _sof_walk(bs):
        def at(p):
            return F.try_element_at(bs, p)

        def step(acc, _i):
            o = acc["o"]
            marker = at(o + 1)
            seg_len = at(o + 2) * 256 + at(o + 3)
            ok = o.isNotNull() & (at(o) == 255) & marker.isNotNull()
            is_sof = ok & marker.between(192, 207) & ~marker.isin(196, 200, 204)
            return F.struct(
                F.when(
                    ok & ~is_sof & (marker != 218) & (marker != 217),
                    o + 2 + seg_len,
                )
                .cast("int")
                .alias("o"),
                F.coalesce(
                    acc["w"], F.when(is_sof, at(o + 7) * 256 + at(o + 8))
                ).alias("w"),
                F.coalesce(
                    acc["h"], F.when(is_sof, at(o + 5) * 256 + at(o + 6))
                ).alias("h"),
            )

        init = F.struct(
            F.lit(3).cast("int").alias("o"),
            F.lit(None).cast("int").alias("w"),
            F.lit(None).cast("int").alias("h"),
        )
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(jpeg_max_segments)), init, step
        )

    jpeg_dims = F.when(
        is_jpeg,
        F.element_at(F.transform(F.array(prefix_bytes), _sof_walk), 1),
    )
    out = df.withColumn("__jpeg", jpeg_dims)

    width = (
        F.when(is_png, _be_u32(media_col, 17))
        .when(is_gif, _le_u16(media_col, 7))
        .when(is_bmp, _le_u32(media_col, 19))
        .when(is_jpeg, F.col("__jpeg.w"))
        .otherwise(F.lit(None).cast("int"))
    )
    height = (
        F.when(is_png, _be_u32(media_col, 21))
        .when(is_gif, _le_u16(media_col, 9))
        # biHeight is SIGNED (negative = top-down row order); report the
        # magnitude, matching the Python _header_decode path
        .when(is_bmp, F.abs(_le_i32(media_col, 23)))
        .when(is_jpeg, F.col("__jpeg.h"))
        .otherwise(F.lit(None).cast("int"))
    )
    sample_rate = F.when(is_wav, _le_u32(media_col, 25)).otherwise(
        F.lit(None).cast("int")
    )
    return (
        out.withColumn("kind", kind)
        .withColumn("width", width)
        .withColumn("height", height)
        .withColumn("sample_rate", sample_rate)
        .drop("__jpeg")
    )


def _header_decode(payload: bytes | None) -> tuple[int, int, list[float]]:
    """Header-level real decode: true dimensions from PNG/GIF/BMP fixed
    offsets and the JPEG SOF marker walk (public JFIF structure), plus
    the byte-stat features of the payload (same schema as the other
    decoders). No codec library; undecodable bytes degrade to the
    (0, 0, zeros) sentinel."""
    import struct

    if payload is None or len(payload) == 0:
        return 0, 0, [0.0] * 4
    p = bytes(payload)
    b = np.frombuffer(p, dtype=np.uint8)
    feat = [float(b.mean()), float(b.std()), float(b.min()), float(b.max())]
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
            w, h = struct.unpack(">II", p[16:24])
            return int(w), int(h), feat
        if p[:3] == b"GIF" and len(p) >= 10:
            w, h = struct.unpack("<HH", p[6:10])
            return int(w), int(h), feat
        if p[:2] == b"BM" and len(p) >= 26:
            w, h = struct.unpack("<ii", p[18:26])
            return int(w), int(abs(h)), feat
        if p[:2] == b"\xff\xd8":
            # JPEG: walk the marker list to a SOFn frame header
            i = 2
            while i + 9 < len(p):
                if p[i] != 0xFF:
                    break
                marker = p[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", p[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                    return int(w), int(h), feat
                i += 2 + seg_len
    except Exception:
        pass
    return 0, 0, feat


def sample_frames(
    df: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    media_col: str = "media",
    every_n: int = 2,
) -> DataFrame:
    """Frame-sampling plumbing: fan each payload out to its 'frames'
    (one frame per 64-byte window, keep every n-th).

    Entirely JVM-side — explode a stride sequence of frame indices and
    slice the window with ``substring`` on the binary column, so the
    payload bytes never cross into Python and the fan-out stays inside
    whole-stage codegen. (A real codec path would swap the byte-window
    slice for an Arrow-batched decode UDF; the fan-out shape is the
    contract.)"""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    m = F.col(media_col)
    n_frames = F.ceil(F.octet_length(m) / F.lit(64)).cast("int")
    idxs = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        *id_cols, m.alias("__m"), F.explode(idxs).alias("frame_idx")
    ).select(
        *id_cols,
        "frame_idx",
        F.expr("substring(__m, frame_idx * 64 + 1, 64)").alias("frame_bytes"),
    )


def synthesize_pcm_wav_column(
    df: DataFrame,
    seed_col: str,
    *,
    out_col: str = "media",
) -> DataFrame:
    """Deterministic PCM fixture: per row build a real 16-bit mono WAV
    whose waveform is a closed-form function of ``seed_col`` (k):

    - ``n_samples  = 16 + k % 17``
    - ``sample_rate = (1 + k % 32) * 100``
    - ``sample[i]  = (k*31 + i*7) % 2001 - 1000``

    Every field :func:`audio_features` extracts (count, rate, peak,
    mean, RMS) is therefore analytically determined by k — an oracle
    can recompute them without ever seeing the bytes, so the
    writer+decoder pair is verified end-to-end (the audio twin of the
    image-header fixture)."""

    @F.pandas_udf(T.BinaryType())
    def synth(ks: pd.Series) -> pd.Series:
        out = []
        for k in ks:
            k = int(k)
            n = 16 + k % 17
            samples = [(k * 31 + i * 7) % 2001 - 1000 for i in range(n)]
            out.append(make_wav((1 + k % 32) * 100, samples=samples))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(seed_col)))


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("peak_abs", T.IntegerType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_features(
    df: DataFrame,
    *,
    media_col: str = "media",
    out_col: str = "audio",
) -> DataFrame:
    """Decode PCM WAV payloads and extract waveform statistics —
    the audio feature-extraction tier of the multimodal family (the
    image twin is ``decode_media``; headers-only lives in
    ``image_header_meta``). Adds a struct column ``out_col`` with
    ``n_samples / sample_rate / peak_abs / mean_amp / rms``.

    Decoding is a generic RIFF chunk walk (``fmt `` then ``data``,
    skipping unknown chunks) + a zero-copy ``np.frombuffer`` over the
    int16 payload, Arrow-batched — the bytes cross into Python once
    per batch, never per row, and the operator is map-only (no
    Exchange at any scale). Stats use exact integer accumulation
    (int64 sum / sum-of-squares over int16 samples cannot overflow
    below 2^21 samples per payload) with one double division at the
    end, so results are bit-identical to any engine computing the same
    closed form. Non-WAV / malformed / non-16-bit payloads yield a
    NULL struct rather than an error (corpus-scale contract: bad media
    must not kill the job)."""

    @F.pandas_udf(_AUDIO_SCHEMA)
    def _decode(media: pd.Series) -> pd.DataFrame:
        rows = []
        for buf in media:
            rows.append(_wav_stats(buf))
        return pd.DataFrame(
            rows, columns=["n_samples", "sample_rate", "peak_abs", "mean_amp", "rms"]
        )

    return df.withColumn(out_col, _decode(F.col(media_col)))


def _wav_stats(buf) -> tuple:
    """Pure-python single-payload decode (shared by the UDF and unit
    tests): returns (n_samples, sample_rate, peak_abs, mean_amp, rms)
    or all-None when the payload is not decodable 16-bit PCM."""
    import math
    import struct

    none = (None, None, None, None, None)
    if buf is None:
        return none
    b = bytes(buf)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return none
    pos, sample_rate, bits, n_channels, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        payload = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt " and sz >= 16:
            _, n_channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
        elif cid == b"data":
            data = payload
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if data is None or bits != 16 or n_channels != 1 or len(data) % 2:
        return none
    x = np.frombuffer(data, dtype="<i2")
    n = int(x.size)
    if n == 0:
        return (0, int(sample_rate), 0, 0.0, 0.0)
    xs = x.astype(np.int64)
    s = int(xs.sum())
    ss = int((xs * xs).sum())
    return (
        n,
        int(sample_rate),
        int(np.abs(xs).max()),
        s / n,
        math.sqrt(ss / n),
    )


def _png_decode(b) -> "tuple[int, int, np.ndarray] | None":
    """Stdlib decode of an 8-bit non-interlaced PNG (RFC 2083): chunk
    walk, concatenated-IDAT zlib inflate, full scanline unfiltering
    (None/Sub/Up/Average/Paeth) with the correct bytes-per-pixel left
    offset. Supports color type 0 (gray8 -> (h, w) uint8), 2 (RGB8 ->
    (h, w, 3) uint8) and 3 (palette8, expanded through PLTE to
    (h, w, 3)). Returns (w, h, pixels) or None when the payload is not
    such a PNG — the no-codec-library real decode tier (other
    formats/bit depths go through the Pillow tier)."""
    import struct
    import zlib

    if b is None:
        return None
    b = bytes(b)
    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, w, h, ctype, idat, plte = 8, None, None, None, b"", None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            if len(body) < 13:
                return None
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if depth != 8 or ctype not in (0, 2, 3) or interlace != 0:
                return None
        elif tag == b"PLTE":
            if ln % 3:
                return None
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if not w or not h or not idat:
        return None
    if ctype == 3 and (plte is None or len(plte) == 0):
        return None
    bpp = 3 if ctype == 2 else 1  # filter offset: bytes per pixel
    n = w * bpp  # filtered bytes per scanline
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    if len(raw) != (n + 1) * h:
        return None
    out = np.zeros((h, n), dtype=np.int32)
    prev = np.zeros(n, dtype=np.int32)
    stride = n + 1
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ft = line[0]
        cur = np.frombuffer(line, dtype=np.uint8, count=n, offset=1).astype(
            np.int32
        )
        if ft == 0:  # None
            pass
        elif ft == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            rec = np.zeros(n, dtype=np.int32)
            for x in range(n):
                left = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                if ft == 1:
                    val = cur[x] + left
                elif ft == 3:
                    val = cur[x] + (left + up) // 2
                else:
                    ul = int(prev[x - bpp]) if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    val = cur[x] + pred
                rec[x] = val & 0xFF
            cur = rec
        else:
            return None
        out[y] = cur
        prev = cur
    px = out.astype(np.uint8)
    if ctype == 2:
        return int(w), int(h), px.reshape(h, w, 3)
    if ctype == 3:
        if int(px.max(initial=0)) >= len(plte):
            return None  # index beyond the palette: invalid stream
        return int(w), int(h), plte[px]
    return int(w), int(h), px


def _png_to_gray(px: "np.ndarray") -> "np.ndarray":
    """Integer Rec.601 luma for (h, w, 3) RGB — exact arithmetic
    ``(299R + 587G + 114B) // 1000`` so any oracle reproduces the
    conversion bit-for-bit; (h, w) gray passes through."""
    if px.ndim == 2:
        return px
    xs = px.astype(np.int32)
    return (
        (299 * xs[..., 0] + 587 * xs[..., 1] + 114 * xs[..., 2]) // 1000
    ).astype(np.uint8)


def _png_decode_gray8(b) -> "tuple[int, int, np.ndarray] | None":
    """Decode any stdlib-tier PNG (gray/RGB/palette) and return it as
    GRAYSCALE (h, w) uint8 — RGB and palette payloads go through the
    exact integer Rec.601 luma of :func:`_png_to_gray`."""
    dec = _png_decode(b)
    if dec is None:
        return None
    w, h, px = dec
    return w, h, _png_to_gray(px)


def make_bmp_pixels(width: int, height: int, rgb: "np.ndarray") -> bytes:
    """Real 24-bit uncompressed BMP (BITMAPINFOHEADER, public format):
    pixel rows bottom-up, BGR byte order, stride padded to 4 bytes —
    the BMP twin of :func:`make_png` for driving an actual pixel
    decode with no codec library. ``rgb`` is (h, w, 3) uint8."""
    import struct

    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    head = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 2835, 2835, 0, 0
    )
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.shape != (height, width, 3):
        raise ValueError("rgb must be (height, width, 3)")
    pad = b"\x00" * (stride - width * 3)
    rows = [
        rgb[y, :, ::-1].tobytes() + pad for y in range(height - 1, -1, -1)
    ]
    return head + info + b"".join(rows)


def _bmp_decode(b) -> "tuple[int, int, np.ndarray] | None":
    """Decode a 24-bit uncompressed BITMAPINFOHEADER BMP to
    (w, h, (h, w, 3) RGB uint8) — pure byte walking, no library.
    Bottom-up (positive height) and top-down (negative) layouts both
    handled; anything else (other bpp, compression, truncation) -> None.
    """
    import struct

    if b is None:
        return None
    buf = bytes(b)
    if len(buf) < 54 or buf[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        return None
    w, h_raw = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if w <= 0 or h_raw == 0 or planes != 1 or bpp != 24 or compression != 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if len(buf) < data_off + stride * h:
        return None
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_raw > 0:
        px = px[::-1]  # bottom-up storage -> top-down array
    return w, h, np.ascontiguousarray(px)


# --------------------------------------------------------------------
# Baseline JPEG pixel tier (public format: ITU T.81 / ISO 10918-1).
#
# Scope of the no-codec tier: BASELINE sequential DCT (SOF0), 8-bit,
# SINGLE component (grayscale) — the deterministic subset where the
# repo can pin every arithmetic step (FDCT/quantize on encode, Huffman
# + dequantize + IDCT on decode) and therefore state an exactness law:
# an 8x8-block-UNIFORM image encoded with an all-ones quantization
# table round-trips bit-exactly (each block is DC-only, and the DC
# path 8*(v-128) -> /8 -> +128 is exact in IEEE double). General
# content round-trips within ±1 grey level at quant=1 (float rounding
# in the AC basis). Multi-component (color) and progressive (SOF2)
# payloads return None here and fall through to the Pillow tier —
# their chroma upsampling/IDCT variants are codec-defined, not
# pinnable. T.81 itself does not pin the IDCT; this tier's pinned
# definition is the orthonormal separable float IDCT with
# round-half-even (np.rint) then clip to [0, 255].
# --------------------------------------------------------------------

# T.81 Figure A.6 zig-zag index order (natural index of each scan pos)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Flat canonical Huffman tables embedded in DHT (the format carries
# its tables, so any conformant decoder reads these): DC categories
# 0..11 all at 4 bits, AC symbols (EOB, ZRL, every run/size) all at
# 8 bits. Valid canonical codes with the all-ones code unused;
# compression is untuned — fixtures optimize determinism, not size.
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_JPEG_AC_BITS = [0] * 7 + [len(_JPEG_AC_VALS)] + [0] * 8


def _dct8_matrix() -> "np.ndarray":
    """Orthonormal 8-point DCT-II matrix C (C @ C.T == I):
    C[u, x] = c(u)/2 * cos((2x+1) u pi / 16), c(0)=1/sqrt(2) else 1.
    Forward 2-D: S = C @ s @ C.T; inverse: s = C.T @ S @ C."""
    u = np.arange(8).reshape(-1, 1)
    x = np.arange(8).reshape(1, -1)
    c = np.full((8, 1), 0.5)
    c[0, 0] = 0.5 / np.sqrt(2.0)
    return c * np.cos((2 * x + 1) * u * np.pi / 16)


def _huffman_codes(bits: "Sequence[int]", vals: "Sequence[int]"):
    """Canonical Huffman assignment per T.81 Annex C: symbols in
    ``vals`` order get consecutive codes, shorter lengths first.
    Returns {symbol: (length, code)}."""
    out, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (ln, code)
            code += 1
            i += 1
        code <<= 1
    return out


def make_jpeg_pixels(
    width: int,
    height: int,
    gray: "np.ndarray",
    *,
    quant: "Sequence[int] | None" = None,
    restart_interval: int = 0,
) -> bytes:
    """Real baseline JPEG ENCODER (grayscale, public ITU T.81 layout):
    SOI, APP0/JFIF, DQT (zig-zag order), SOF0 (8-bit, 1 component),
    DHT (the flat canonical tables above), SOS, Huffman-coded scan
    with 0xFF byte stuffing, EOI — the JPEG twin of :func:`make_png` /
    :func:`make_bmp_pixels` for driving an actual entropy-coded DCT
    decode with no codec library.

    ``gray`` is (height, width) uint8; edges replicate to pad to 8x8
    blocks. ``quant`` is a 64-entry natural-order table, default
    all-ones (the exact-fixture table: block-uniform content
    round-trips bit-exactly; see the tier note above).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (byte-aligned, DC predictor reset) — the
    T.81 resync structure large scans carry in the wild."""
    import struct

    gray = np.asarray(gray, dtype=np.uint8)
    if gray.shape != (height, width):
        raise ValueError("gray must be (height, width)")
    q = np.ones(64, dtype=np.int64) if quant is None else np.asarray(
        list(quant), dtype=np.int64
    )
    if q.shape != (64,) or q.min() < 1 or q.max() > 255:
        raise ValueError("quant must be 64 values in 1..255")
    # pad to whole blocks by edge replication
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    img = np.pad(gray, ((0, ph - height), (0, pw - width)), mode="edge")
    c = _dct8_matrix()
    blocks = (
        img.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = np.rint(
        np.einsum("ux,nxy,vy->nuv", c, blocks, c) / q.reshape(8, 8)
    ).astype(np.int64)
    # Baseline AC categories stop at 10 (±1023); the one 8-bit input
    # that exceeds it (a perfect ±checkerboard hits exactly ±1024 at
    # u=v=4 with quant=1) is clamped by 1 LSB, as real encoders do.
    dc_saved = coefs[:, 0, 0].copy()
    np.clip(coefs, -1023, 1023, out=coefs)
    coefs[:, 0, 0] = dc_saved

    dc_code = _huffman_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_code = _huffman_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    out = bytearray()
    acc, nbits = 0, 0

    def put(ln: int, val: int) -> None:
        nonlocal acc, nbits
        acc = (acc << ln) | (val & ((1 << ln) - 1))
        nbits += ln
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # T.81 byte stuffing

    pred = 0
    zz = _JPEG_ZIGZAG
    for n_blk, blk in enumerate(coefs):
        if restart_interval and n_blk and n_blk % restart_interval == 0:
            if nbits:  # byte-align with 1-bits, per T.81
                put(8 - nbits, (1 << (8 - nbits)) - 1)
            out.append(0xFF)
            out.append(0xD0 + (n_blk // restart_interval - 1) % 8)
            pred = 0
        flat = blk.ravel()
        diff = int(flat[0]) - pred
        t = abs(diff).bit_length()
        ln, code = dc_code[t]
        put(ln, code)
        if t:
            put(t, diff if diff >= 0 else diff + (1 << t) - 1)
        pred = int(flat[0])
        run = 0
        for kpos in range(1, 64):
            v = int(flat[zz[kpos]])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_code[0xF0]
                put(ln, code)
                run -= 16
            t = abs(v).bit_length()
            ln, code = ac_code[(run << 4) | t]
            put(ln, code)
            put(t, v if v >= 0 else v + (1 << t) - 1)
            run = 0
        if run:
            ln, code = ac_code[0x00]
            put(ln, code)  # EOB
    if nbits:
        put(8 - nbits, (1 << (8 - nbits)) - 1)  # pad with 1s

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(int(q[zz[i]]) for i in range(64)))
    sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00")
    dht = seg(
        0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    ) + seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht + dri + sos + bytes(out) + b"\xff\xd9"
    )


class _JpegBitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at any
    other marker (exposes it for RST handling)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos, self.acc, self.nbits = buf, pos, 0, 0

    def _fill(self) -> bool:
        b = self.buf
        if self.pos >= len(b):
            return False
        v = b[self.pos]
        if v == 0xFF:
            if self.pos + 1 < len(b) and b[self.pos + 1] == 0x00:
                self.pos += 2  # stuffed data byte
            else:
                return False  # a real marker: entropy data ends
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | v
        self.nbits += 8
        return True

    def read(self, n: int) -> "int | None":
        while self.nbits < n:
            if not self._fill():
                return None
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1  # keep the int bounded
        return val

    def at_marker(self) -> "int | None":
        """The marker byte ahead of the cursor, if the next bytes are
        a marker (used for RSTn). Only valid at a byte boundary."""
        b = self.buf
        if self.pos + 1 < len(b) and b[self.pos] == 0xFF and b[self.pos + 1] != 0x00:
            return b[self.pos + 1]
        return None

    def skip_marker(self) -> None:
        self.pos += 2
        self.acc = self.nbits = 0


def _jpeg_decode_gray8(b) -> "tuple[int, int, np.ndarray] | None":
    """Baseline JPEG DECODER for the no-codec tier: marker walk (DQT
    zig-zag, DHT canonical build, SOF0, DRI, SOS), Huffman entropy
    decode with DC prediction + RSTn restarts, dequantize, pinned
    orthonormal float IDCT, +128 level shift, rint, clip, crop the
    block padding. 8-bit single-component SOF0 only — anything else
    (color, progressive, arithmetic coding) returns None and falls
    through to the Pillow tier. Malformed streams return None:
    corrupt bytes are data, not bugs."""
    import struct

    if b is None:
        return None
    buf = bytes(b)
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        return None
    pos, w, h, qid = 2, None, None, 0
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    dc_id = ac_id = 0
    restart = 0
    scan_pos = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        (ln,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        body = buf[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT: one or more tables, zig-zag order
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0 or len(body) < i + 65:
                    return None  # 16-bit tables: out of tier scope
                t = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    t[_JPEG_ZIGZAG[k]] = body[i + 1 + k]
                quant[tq] = t
                i += 65
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i + 17 <= len(body):
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) < n:
                    return None
                codes = _huffman_codes(bits, vals)
                huff[(cls, tid)] = {
                    (lc[0], lc[1]): sym for sym, lc in codes.items()
                }
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            # a single-component frame needs 9 bytes (precision,
            # h, w, ncomp, comp-id, sampling, qid): a crafted 8-byte
            # body would otherwise IndexError at body[8] instead of
            # falling through as malformed (ADVICE r12)
            if len(body) < 9 or body[0] != 8:
                return None
            h, w = struct.unpack(">HH", body[1:5])
            if body[5] != 1:
                return None  # multi-component: Pillow tier
            if (body[7] >> 4) != 1 or (body[7] & 15) != 1:
                return None
            qid = body[8]
            if h == 0 or w == 0:
                return None
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # non-baseline SOF / arithmetic coding
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if w is None or len(body) < 4 or body[0] != 1:
                return None
            dc_id, ac_id = body[2] >> 4, body[2] & 15
            scan_pos = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_pos is None or w is None:
        return None
    dct = huff.get((0, dc_id))
    act = huff.get((1, ac_id))
    q = quant.get(qid)
    if dct is None or act is None or q is None:
        return None

    rd = _JpegBitReader(buf, scan_pos)

    def decode_sym(table) -> "int | None":
        code = 0
        for ln2 in range(1, 17):
            bit = rd.read(1)
            if bit is None:
                return None
            code = (code << 1) | bit
            sym = table.get((ln2, code))
            if sym is not None:
                return sym
        return None

    def extend(v: int, t: int) -> int:
        return v if v >= (1 << (t - 1)) else v - (1 << t) + 1

    bx, by = -(-w // 8), -(-h // 8)
    # a block costs >= 12 entropy bits (DC category + EOB), so any
    # stream with more blocks than BYTES is structurally truncated —
    # reject before allocating a canvas a forged 65535x65535 SOF0
    # header would otherwise size (corrupt bytes are data, not OOM)
    if bx * by > len(buf):
        return None
    coefs = np.zeros((bx * by, 64), dtype=np.int64)
    pred = 0
    zz = _JPEG_ZIGZAG
    for n in range(bx * by):
        if restart and n and n % restart == 0:
            mk = rd.at_marker()
            if mk is not None and 0xD0 <= mk <= 0xD7:
                rd.skip_marker()
                pred = 0
        t = decode_sym(dct)
        if t is None or t > 11:
            return None
        if t:
            v = rd.read(t)
            if v is None:
                return None
            pred += extend(v, t)
        coefs[n, 0] = pred
        k = 1
        while k < 64:
            rs = decode_sym(act)
            if rs is None:
                return None
            r, s = rs >> 4, rs & 15
            if s == 0:
                if rs == 0xF0:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                return None
            v = rd.read(s)
            if v is None:
                return None
            coefs[n, zz[k]] = extend(v, s)
            k += 1
    c = _dct8_matrix()
    s = np.einsum(
        "xu,nuv,yv->nxy", c.T, (coefs * q).reshape(-1, 8, 8).astype(np.float64), c.T
    )
    px = np.clip(np.rint(s) + 128, 0, 255).astype(np.uint8)
    img = (
        px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    )
    return int(w), int(h), np.ascontiguousarray(img[:h, :w])


def _stdlib_decode_gray8(b) -> "tuple[int, int, np.ndarray] | None":
    """No-codec-library decode dispatcher: 8-bit PNG (gray/RGB/palette),
    24-bit uncompressed BMP, or baseline single-component JPEG
    (:func:`_jpeg_decode_gray8`), returned as exact-luma grayscale."""
    dec = _png_decode_gray8(b)
    if dec is not None:
        return dec
    bmp = _bmp_decode(b)
    if bmp is not None:
        w, h, px = bmp
        return w, h, _png_to_gray(px)
    return _jpeg_decode_gray8(b)


def resize_nearest(px: "np.ndarray", dst_w: int, dst_h: int) -> "np.ndarray":
    """Nearest-neighbor resize of an (h, w) array with the floor
    mapping ``src = (dst_index * src_extent) // dst_extent`` — integer
    arithmetic only, so an oracle can reproduce the sampled indices
    exactly."""
    sh, sw = px.shape
    ys = (np.arange(dst_h) * sh) // dst_h
    xs = (np.arange(dst_w) * sw) // dst_w
    return px[np.ix_(ys, xs)]


def resize_images(
    df: DataFrame,
    dst_w: int,
    dst_h: int,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    media_col: str = "media",
    decoder: str = "auto",
) -> DataFrame:
    """Resize image payloads to (dst_w, dst_h) — the resize step of
    the multimodal pipeline. Output: id_cols + ``media`` (the resized
    image re-encoded as gray8 PNG) + ``width``/``height``;
    undecodable payloads yield NULL media and dims (bad media is data,
    not a job failure).

    Decoder tiers mirror ``decode_media``: ``'stdlib'`` is a REAL
    no-codec path — non-interlaced 8-bit PNGs (gray, RGB and palette
    color types) are inflated with zlib, unfiltered (all five RFC 2083
    filters at the correct bytes-per-pixel offset), converted to exact
    integer Rec.601 luma, nearest-resized with the exact floor mapping
    and re-encoded as gray8; ``'real'`` uses Pillow for
    arbitrary formats (gated on the library); ``'auto'`` tries stdlib
    then Pillow. Arrow-batched ``mapInPandas``; map-only at any scale.
    """
    if dst_w < 1 or dst_h < 1:
        raise ValueError("target dimensions must be >= 1")
    if decoder not in ("auto", "stdlib", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "real" and not pillow_available():
        raise NotImplementedError(
            "resize_images(decoder='real') requires Pillow; use 'stdlib' "
            "for gray8 PNGs or 'auto'"
        )
    use_pillow = decoder in ("auto", "real") and pillow_available()
    ids = list(id_cols)
    out_schema = T.StructType(
        [df.schema[c] for c in ids]
        + [
            T.StructField("media", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize_one(payload):
        dec = None if decoder == "real" else _stdlib_decode_gray8(payload)
        if dec is not None:
            _, _, px = dec
        elif use_pillow and payload is not None:
            import io

            import PIL.Image

            try:
                img = PIL.Image.open(io.BytesIO(bytes(payload))).convert("L")
            except Exception:
                return None
            px = np.asarray(img, dtype=np.uint8)
        else:
            return None
        return make_png(dst_w, dst_h, resize_nearest(px, dst_w, dst_h).tobytes())

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[ids].copy()
            media = [_resize_one(p) for p in pdf[media_col]]
            out["media"] = media
            out["width"] = [dst_w if m is not None else None for m in media]
            out["height"] = [dst_h if m is not None else None for m in media]
            yield out

    return df.select(*ids, media_col).mapInPandas(_run, out_schema)


def image_pixel_stats(
    df: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    media_col: str = "media",
) -> DataFrame:
    """Decode 8-bit PNG payloads (stdlib tier: gray, RGB and palette
    color types), 24-bit uncompressed BMPs (byte-walk decode, no
    library) or baseline single-component JPEGs (entropy-coded DCT
    decode, :func:`_jpeg_decode_gray8`), RGB reduced by exact integer
    Rec.601 luma, and emit
    exact pixel statistics: width, height, pixel_sum, pixel_min,
    pixel_max —
    the image feature-extraction twin of ``audio_features``.
    Undecodable payloads yield NULL stats. Map-only, Arrow-batched."""
    ids = list(id_cols)
    out_schema = T.StructType(
        [df.schema[c] for c in ids]
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
            T.StructField("pixel_min", T.IntegerType()),
            T.StructField("pixel_max", T.IntegerType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for p in pdf[media_col]:
                dec = _stdlib_decode_gray8(p)
                if dec is None:
                    rows.append((None, None, None, None, None))
                else:
                    w, h, px = dec
                    rows.append(
                        (w, h, int(px.sum(dtype=np.int64)), int(px.min()), int(px.max()))
                    )
            out = pdf[ids].copy()
            stats = pd.DataFrame(
                rows, columns=["width", "height", "pixel_sum", "pixel_min", "pixel_max"]
            )
            for c in stats.columns:
                out[c] = stats[c].values
            yield out

    return df.select(*ids, media_col).mapInPandas(_run, out_schema)


def synthesize_gray_png_column(
    df: DataFrame, seed_col: str, *, out_col: str = "media"
) -> DataFrame:
    """Deterministic gray8 PNG fixture: per row k build a real PNG with

    - ``width  = 1 + k % 16``, ``height = 1 + k % 12``
    - ``pixel(x, y) = (k + 7*x + 13*y) % 256``

    so every pixel a resize samples is closed-form in k — the image
    twin of ``synthesize_pcm_wav_column``."""

    @F.pandas_udf(T.BinaryType())
    def synth(ks: pd.Series) -> pd.Series:
        out = []
        for k in ks:
            k = int(k)
            w, h = 1 + k % 16, 1 + k % 12
            y, x = np.mgrid[0:h, 0:w]
            px = ((k + 7 * x + 13 * y) % 256).astype(np.uint8)
            out.append(make_png(w, h, px.tobytes()))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(seed_col)))


def synthesize_rgb_png_column(
    df: DataFrame, seed_col: str, *, out_col: str = "media"
) -> DataFrame:
    """Deterministic RGB8 PNG fixture (color type 2): per row k a real
    color PNG with ``width = 1 + k % 16``, ``height = 1 + k % 12`` and

    - ``R(x, y) = (k + 5x + 11y) % 256``
    - ``G(x, y) = (3k + 7x + y) % 256``
    - ``B(x, y) = (2k + x + 13y) % 256``

    so the exact Rec.601 luma any grayscale pipeline step computes is
    closed-form in k — the color twin of
    :func:`synthesize_gray_png_column` for driving the bpp=3 decode
    path end-to-end with an arithmetic oracle."""

    @F.pandas_udf(T.BinaryType())
    def synth(ks: pd.Series) -> pd.Series:
        out = []
        for k in ks:
            k = int(k)
            w, h = 1 + k % 16, 1 + k % 12
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (k + 5 * x + 11 * y) % 256,
                    (3 * k + 7 * x + y) % 256,
                    (2 * k + x + 13 * y) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            out.append(make_png(w, h, px.tobytes(), color_type=2))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(seed_col)))


def synthesize_rgb_bmp_column(
    df: DataFrame, seed_col: str, *, out_col: str = "media"
) -> DataFrame:
    """Deterministic 24-bit BMP fixture: the same closed-form RGB
    planes as :func:`synthesize_rgb_png_column` (``width = 1 + k % 16``,
    ``height = 1 + k % 12``, R=(k+5x+11y)%256, G=(3k+7x+y)%256,
    B=(2k+x+13y)%256) in a real BMP container — drives the byte-walk
    BMP decode path with an arithmetic oracle."""

    @F.pandas_udf(T.BinaryType())
    def synth(ks: pd.Series) -> pd.Series:
        out = []
        for k in ks:
            k = int(k)
            w, h = 1 + k % 16, 1 + k % 12
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (k + 5 * x + 11 * y) % 256,
                    (3 * k + 7 * x + y) % 256,
                    (2 * k + x + 13 * y) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            out.append(make_bmp_pixels(w, h, px))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(seed_col)))


def _mosaic_gray(k: int) -> "tuple[int, int, np.ndarray]":
    """Closed-form 8x8-block-uniform grayscale mosaic for the exact
    JPEG tier: ``width = 8*(1 + k % 3)``, ``height = 8*(1 + k % 2)``,
    ``pixel(x, y) = (k + 11*(x//8) + 29*(y//8)) % 256``. Every block
    is uniform, so the baseline JPEG round-trip is bit-exact (DC-only
    blocks; see the tier note above) and an oracle recomputes any
    sampled pixel arithmetically from k."""
    w, h = 8 * (1 + k % 3), 8 * (1 + k % 2)
    y, x = np.mgrid[0:h, 0:w]
    px = ((k + 11 * (x // 8) + 29 * (y // 8)) % 256).astype(np.uint8)
    return w, h, px


def synthesize_mosaic_png_column(
    df: DataFrame, seed_col: str, *, out_col: str = "media"
) -> DataFrame:
    """The :func:`_mosaic_gray` planes in a gray8 PNG container."""

    @F.pandas_udf(T.BinaryType())
    def synth(ks: pd.Series) -> pd.Series:
        out = []
        for k in ks:
            w, h, px = _mosaic_gray(int(k))
            out.append(make_png(w, h, px.tobytes()))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(seed_col)))


def synthesize_mosaic_jpeg_column(
    df: DataFrame, seed_col: str, *, out_col: str = "media"
) -> DataFrame:
    """The SAME :func:`_mosaic_gray` planes as a real baseline JPEG
    (all-ones quantization: the exact-fixture table) — the container
    pair that drives the entropy-coded DCT decode path end-to-end
    with an arithmetic oracle: dHash(PNG twin) == dHash(JPEG twin)
    bit-for-bit because the block-uniform round-trip is exact."""

    @F.pandas_udf(T.BinaryType())
    def synth(ks: pd.Series) -> pd.Series:
        out = []
        for k in ks:
            w, h, px = _mosaic_gray(int(k))
            out.append(make_jpeg_pixels(w, h, px))
        return pd.Series(out)

    return df.withColumn(out_col, synth(F.col(seed_col)))


def image_dhash(
    df: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    media_col: str = "media",
) -> DataFrame:
    """Perceptual difference-hash (dHash) of image payloads — the
    image near-duplicate key: decode to exact-luma grayscale
    (:func:`_stdlib_decode_gray8`, PNG/BMP/baseline-JPEG tiers),
    nearest-resize to
    a 9x8 grid with the exact floor mapping (:func:`resize_nearest`),
    then emit the 64 horizontal-gradient bits ``g[y][x] > g[y][x+1]``
    row-major as a bit string.

    dHash keys on gradient STRUCTURE, not bytes: the same pixels in a
    different container (PNG vs BMP), or any strictly monotonic
    brightness remap, hash identically while exact byte/md5 dedup
    misses them — the multimodal sibling of SimHash for text. Exact
    integer arithmetic end to end, so an oracle can recompute every
    bit from a closed-form fixture.

    Output: (id columns, width, height, dhash_bits) with NULL fields
    for undecodable payloads. Map-only, Arrow-batched; group or
    band-join on ``dhash_bits`` downstream for near-dup clustering.
    """
    ids = list(id_cols)
    out_schema = T.StructType(
        [df.schema[c] for c in ids]
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("dhash_bits", T.StringType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for p in pdf[media_col]:
                dec = _stdlib_decode_gray8(p)
                if dec is None:
                    rows.append((None, None, None))
                else:
                    w, h, px = dec
                    g = resize_nearest(px.astype(np.int64), 9, 8)
                    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint8)
                    rows.append(
                        (w, h, "".join("1" if b else "0" for b in bits.ravel()))
                    )
            out = pdf[ids].copy()
            stats = pd.DataFrame(rows, columns=["width", "height", "dhash_bits"])
            for c in stats.columns:
                out[c] = stats[c].values
            yield out

    return df.select(*ids, media_col).mapInPandas(_run, out_schema)
