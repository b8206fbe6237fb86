"""Multimodal binary-column plumbing: metadata expressions, stub
decode kernels (real schemas/batching, deterministic fake outputs)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from legalchatbot_vectordb_exp_spark.multimodal.binary import (
    binary_metadata,
    decode_image_stub,
    frame_sample_stub,
)

PNG_MAGIC = bytes.fromhex("89504E470D0A1A0A") + b"fakepng"
JPEG_MAGIC = bytes.fromhex("FFD8FFE0") + b"fakejpg"


def make_binary_df(spark):
    return spark.createDataFrame(
        [("p1", bytearray(PNG_MAGIC)), ("j1", bytearray(JPEG_MAGIC)),
         ("t1", bytearray(b"plain text bytes"))],
        ["id", "content"],
    )


def test_binary_metadata_and_mime_sniff(spark):
    out = {r.id: r for r in binary_metadata(make_binary_df(spark)).collect()}
    assert out["p1"].mime == "image/png"
    assert out["j1"].mime == "image/jpeg"
    assert out["t1"].mime == "application/octet-stream"
    assert out["t1"].n_bytes == len(b"plain text bytes")
    assert out["t1"].sha256 == hashlib.sha256(b"plain text bytes").hexdigest()


def test_decode_image_stub_schema_and_determinism(spark):
    df = make_binary_df(spark)
    out = decode_image_stub(df)
    assert [f.name for f in out.schema] == [
        "id", "width", "height", "n_channels", "mean_intensity",
    ]
    rows1 = sorted(map(tuple, out.collect()))
    rows2 = sorted(map(tuple, decode_image_stub(df).collect()))
    assert rows1 == rows2
    for r in rows1:
        assert r[1] >= 1 and r[2] >= 1


def test_frame_sample_explodes_binary(spark):
    df = spark.createDataFrame(
        [("v1", bytearray(bytes(range(256)) * 10))], ["id", "content"]
    )
    out = frame_sample_stub(df, every_n_bytes=1024).collect()
    assert len(out) == 3  # 2560 bytes → 1024,1024,512
    assert [r.frame_index for r in sorted(out, key=lambda r: r.frame_index)] == [0, 1, 2]
    assert len(bytes(out[0].frame)) == 1024
    total = sum(len(bytes(r.frame)) for r in out)
    assert total == 2560


def test_resize_image_stub_binary_roundtrip(spark):
    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        resize_image_stub,
    )

    df = make_binary_df(spark)
    out = resize_image_stub(df, width=32, height=32)
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {"p1", "j1", "t1"}
    for r in rows.values():
        assert (r.width, r.height) == (32, 32)
        assert isinstance(r.content, (bytes, bytearray))
        assert r.n_bytes == len(r.content)
        # output size bounded by the target-dim budget, not input size
        assert 0 < r.n_bytes <= max(1, (32 * 32) // 256)
    # deterministic
    again = {r.id: bytes(r.content) for r in
             resize_image_stub(df, width=32, height=32).collect()}
    assert {k: bytes(v.content) for k, v in rows.items()} == again


# --------------------------------------------------------------- real codecs


def _bmp_bytes(px_rgb_rows):
    """Hand-assemble a 24-bit uncompressed BMP (bottom-up) from
    [[(r,g,b), ...], ...] rows, top row first."""
    h = len(px_rgb_rows)
    w = len(px_rgb_rows[0])
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(px_rgb_rows):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR
        body += line + b"\x00" * (stride - len(line))
    pix_off = 54
    header = (
        b"BM"
        + (pix_off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + pix_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


def _ppm_bytes(px_rgb_rows):
    h, w = len(px_rgb_rows), len(px_rgb_rows[0])
    body = b"".join(
        bytes(c) for row in px_rgb_rows for c in row
    )
    return b"P6\n%d %d\n255\n" % (w, h) + body


def _wav_bytes(samples, rate=8000, nch=1):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


PX = [
    [(255, 0, 0), (0, 255, 0)],
    [(0, 0, 255), (10, 20, 30)],
]  # 2x2, mean over all channel values = (255*3 + 10+20+30) / 12


def test_decode_image_real_pixels(spark):
    from legalchatbot_vectordb_exp_spark.multimodal.binary import decode_image

    df = spark.createDataFrame(
        [
            ("bmp", bytearray(_bmp_bytes(PX))),
            ("ppm", bytearray(_ppm_bytes(PX))),
            ("junk", bytearray(b"not an image")),
        ],
        ["id", "content"],
    )
    rows = {r.id: r for r in decode_image(df).collect()}
    expected_mean = (255 * 3 + 10 + 20 + 30) / 12
    for rid in ("bmp", "ppm"):
        r = rows[rid]
        assert r.decoded
        assert (r.width, r.height, r.n_channels) == (2, 2, 3)
        assert abs(r.mean_intensity - expected_mean) < 1e-12, rid
    assert rows["junk"].decoded is False
    assert rows["junk"].width is None


def test_bmp_and_ppm_decode_identical_pixels():
    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        decode_pixels,
    )

    a = decode_pixels(_bmp_bytes(PX))
    b = decode_pixels(_ppm_bytes(PX))
    assert a is not None and b is not None
    assert np.array_equal(a, b)
    assert a[0, 0].tolist() == [255, 0, 0]  # top-left pixel round-trips
    assert a[1, 1].tolist() == [10, 20, 30]


def test_resize_image_real_nearest_neighbor(spark):
    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        decode_pixels,
        resize_image,
    )

    df = spark.createDataFrame(
        [("im", bytearray(_ppm_bytes(PX)))], ["id", "content"]
    )
    rows = {r.id: r for r in resize_image(df, width=4, height=4).collect()}
    r = rows["im"]
    assert r.decoded and (r.width, r.height) == (4, 4)
    out = decode_pixels(bytes(r.content))
    assert out.shape == (4, 4, 3)
    # nearest-neighbor: each source pixel becomes a 2x2 block
    src = np.array(
        [[PX[0][0], PX[0][1]], [PX[1][0], PX[1][1]]], dtype=np.uint8
    )
    assert np.array_equal(out, src.repeat(2, axis=0).repeat(2, axis=1))


def test_decode_audio_real_samples(spark):
    import math

    from legalchatbot_vectordb_exp_spark.multimodal.binary import decode_audio

    samples = [0, 1000, -1000, 500, -500, 250]
    df = spark.createDataFrame(
        [
            ("w", bytearray(_wav_bytes(samples, rate=8000))),
            ("x", bytearray(b"RIFFnope")),
        ],
        ["id", "content"],
    )
    rows = {r.id: r for r in decode_audio(df).collect()}
    r = rows["w"]
    assert r.decoded
    assert r.sample_rate == 8000 and r.n_channels == 1
    assert r.n_samples == len(samples)
    assert abs(r.duration_s - len(samples) / 8000) < 1e-12
    expect_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert abs(r.rms - expect_rms) < 1e-9
    assert rows["x"].decoded is False


def test_decode_audio_stereo_wav(spark):
    from legalchatbot_vectordb_exp_spark.multimodal.binary import decode_audio

    # interleaved L/R: 4 frames of 2 channels
    inter = [100, -100, 200, -200, 300, -300, 400, -400]
    df = spark.createDataFrame(
        [("s", bytearray(_wav_bytes(inter, rate=4000, nch=2)))],
        ["id", "content"],
    )
    r = decode_audio(df).collect()[0]
    assert r.decoded and r.n_channels == 2
    assert r.n_samples == 4  # frames, not interleaved values
    assert abs(r.duration_s - 4 / 4000) < 1e-12


# ------------------------------------------------------------------ PNG


def test_png_roundtrip_all_filters_and_color_types():
    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        _decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for nch in (1, 2, 3, 4):
        for ft in (0, 1, 2, 3, 4):
            px = rng.randint(0, 256, (6, 5, nch), dtype=np.uint8)
            out = _decode_png(encode_png(px, row_filters=ft))
            assert out is not None, (nch, ft)
            assert out.shape == px.shape and (out == px).all(), (nch, ft)
    # mixed per-row filters in one image
    px = rng.randint(0, 256, (10, 7, 3), dtype=np.uint8)
    out = _decode_png(encode_png(px, row_filters=[y % 5 for y in range(10)]))
    assert (out == px).all()


def test_png_palette_expansion():
    import zlib

    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        _PNG_SIG,
        _decode_png,
        _png_chunk,
    )

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (4, 6), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(4))
    ihdr = (6).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes(
        [8, 3, 0, 0, 0]
    )
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = _decode_png(png)
    assert out is not None and (out == pal[idx]).all()


def test_png_rejects_corrupt_and_unsupported():
    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        _decode_png,
        decode_pixels,
        encode_png,
    )

    px = np.zeros((3, 3, 3), dtype=np.uint8)
    good = encode_png(px)
    # flipped byte inside IDAT → CRC mismatch → honest None
    bad = bytearray(good)
    bad[40] ^= 0xFF
    assert _decode_png(bytes(bad)) is None
    # truncated stream
    assert _decode_png(good[: len(good) // 2]) is None
    # not a PNG at all
    assert _decode_png(b"\x89PNG\r\n\x1a\njunkjunkjunk") is None
    # 16-bit depth unsupported → None (never fake pixels).  Rebuild
    # the IHDR chunk with depth=16 and a RECOMPUTED CRC — flipping the
    # byte in place would fail the CRC check first and never reach the
    # depth branch (round-3 review item).
    from legalchatbot_vectordb_exp_spark.multimodal.binary import _png_chunk

    ihdr_body = bytearray(good[16:29])  # 13-byte IHDR payload
    ihdr_body[8] = 16  # bit-depth field
    deep = good[:8] + _png_chunk(b"IHDR", bytes(ihdr_body)) + good[33:]
    assert _decode_png(bytes(deep)) is None
    # dispatch integration
    assert decode_pixels(good) is not None and decode_pixels(good).shape == (
        3,
        3,
        3,
    )


def test_png_through_decode_image_operator(spark):
    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        decode_image,
        encode_png,
    )

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (8, 4, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            ("p", bytearray(encode_png(px, row_filters=[4] * 8))),
            ("q", bytearray(b"\x89PNG\r\n\x1a\nbroken")),
        ],
        ["id", "content"],
    )
    rows = {r.id: r for r in decode_image(df).collect()}
    assert rows["p"].decoded
    assert (rows["p"].width, rows["p"].height, rows["p"].n_channels) == (
        4,
        8,
        3,
    )
    assert abs(rows["p"].mean_intensity - float(px.mean())) < 1e-9
    assert rows["q"].decoded is False


def test_codec_backend_tier_lossless_agreement():
    """Round-4 item 6: the codec-library tier (real Pillow when
    importable, the recorded stand-in otherwise) must agree with the
    pure decoders byte-for-byte on the lossless fixtures — PPM, PNG
    (all filter types), GIF — and on the DC-exact constant-gray JPEG."""
    import importlib.util

    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal import binary as B
    from legalchatbot_vectordb_exp_spark.multimodal.gif import encode_gif
    from legalchatbot_vectordb_exp_spark.multimodal.jpeg import (
        encode_gray_jpeg_dcexact,
    )

    have_pil = importlib.util.find_spec("PIL") is not None
    factory = B.PillowBackend if have_pil else B.RecordedPillowFixture
    backend = factory()

    px = (np.arange(4 * 4 * 3, dtype=np.uint8) * 5).reshape(4, 4, 3)
    fixtures = [
        B.encode_ppm(px),
        B.encode_png(px, row_filters=[0, 1, 2, 3]),
        encode_gif(px),
        encode_gray_jpeg_dcexact(137),
    ]
    for i, data in enumerate(fixtures):
        pure = B.decode_pixels(data)
        routed = B._resolve_pixels(data, backend)
        assert pure is not None, i
        np.testing.assert_array_equal(pure, routed, err_msg=f"fixture {i}")
    # undecodable bytes fall through the backend to the pure path → None
    assert B._resolve_pixels(b"not an image", backend) is None


def test_codec_backend_tier_operator_routing(spark):
    """The installed backend factory must reach executor workers and
    drive decode_image; unknown bytes stay decoded=false."""
    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal import binary as B

    px = np.full((3, 5, 3), 9, dtype=np.uint8)
    B.set_codec_backend_factory(B.RecordedPillowFixture)
    try:
        df = spark.createDataFrame(
            [("a", B.encode_ppm(px)), ("x", b"junk")],
            "id string, content binary",
        )
        rows = {r.id: r for r in B.decode_image(df).collect()}
        assert rows["a"].decoded and rows["a"].width == 5
        assert rows["a"].height == 3 and rows["a"].n_channels == 3
        assert not rows["x"].decoded
    finally:
        B.set_codec_backend_factory(None)


def test_video_backend_tier_contract():
    """PyAV tier contract: parse_frames output shape matches the pure
    parser's (codec, w, h, [frame bytes]); with the dep absent the
    default resolution must be the pure parser (backend None)."""
    import importlib.util

    from legalchatbot_vectordb_exp_spark.multimodal import binary as B

    if importlib.util.find_spec("av") is None:
        assert B._default_video_backend() is None
    else:
        import numpy as np

        from legalchatbot_vectordb_exp_spark.multimodal.jpeg import (
            encode_gray_jpeg_dcexact,
        )
        from legalchatbot_vectordb_exp_spark.multimodal.mp4 import (
            encode_mp4_mjpeg,
            parse_mp4_frames,
        )

        frames = [encode_gray_jpeg_dcexact(v) for v in (10, 200)]
        mp4 = encode_mp4_mjpeg(frames, 8, 8)
        got = B.PyAVFrameSampler().parse_frames(mp4)
        pure = parse_mp4_frames(mp4)
        assert got is not None and pure is not None
        assert got[0] == pure[0] and got[1:3] == pure[1:3]
        assert len(got[3]) == len(pure[3])


def _encode_bmp24(px) -> bytes:
    """Minimal bottom-up 24-bit BITMAPINFOHEADER BMP (the format
    _decode_bmp reads) — test-local so the parity corpus covers BMP
    without shipping an encoder the engine doesn't need."""
    import struct

    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        px[y, :, ::-1].tobytes() + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + info + body


def test_pillow_library_decode_pixel_parity():
    """Round-7 item 5: REAL Pillow (not the recorded stand-in) must
    reproduce the pure decoders pixel-for-pixel across the whole
    lossless fixture corpus — BMP, PPM, PNG (every filter type,
    RGB + grayscale), GIF palette, DC-exact JPEG.  Skips only when
    Pillow is absent; where it runs, the production decode path is
    the tested path."""
    import importlib.util

    import numpy as np

    from legalchatbot_vectordb_exp_spark.multimodal import binary as B
    from legalchatbot_vectordb_exp_spark.multimodal.gif import encode_gif
    from legalchatbot_vectordb_exp_spark.multimodal.jpeg import (
        encode_gray_jpeg_dcexact,
    )

    if importlib.util.find_spec("PIL") is None:
        import pytest

        pytest.skip("Pillow not installed — library tier unavailable")

    backend = B.PillowBackend()
    rgb = (np.arange(16 * 9 * 3, dtype=np.uint8) * 7 % 251).reshape(
        16, 9, 3
    )
    gray = (np.arange(8 * 11, dtype=np.uint8) * 13 % 256).reshape(
        8, 11, 1
    ).astype(np.uint8)
    fixtures = {
        "bmp24": _encode_bmp24(rgb),
        "ppm": B.encode_ppm(rgb),
        "png_rgb_filters": B.encode_png(rgb, row_filters=[0, 1, 2, 3, 4]),
        "png_gray": B.encode_png(gray),
        "gif": encode_gif(rgb),
        "jpeg_dcexact": encode_gray_jpeg_dcexact(64),
    }
    for name, data in fixtures.items():
        pure = B.decode_pixels(data)
        lib = backend.decode_pixels(data)
        assert pure is not None, name
        assert lib is not None, f"{name}: Pillow rejected fixture"
        np.testing.assert_array_equal(pure, lib, err_msg=name)


def test_pyav_library_frame_parity():
    """REAL PyAV frame sampling must agree with the pure ISO BMFF
    parser on the MJPEG-in-MP4 fixture: same codec label, geometry,
    frame count, and per-frame bitstream bytes.  Skips only when PyAV
    is absent."""
    import importlib.util

    from legalchatbot_vectordb_exp_spark.multimodal import binary as B
    from legalchatbot_vectordb_exp_spark.multimodal.mp4 import (
        encode_mp4_mjpeg,
        parse_mp4_frames,
    )

    if importlib.util.find_spec("av") is None:
        import pytest

        pytest.skip("PyAV not installed — library tier unavailable")

    from legalchatbot_vectordb_exp_spark.multimodal.jpeg import (
        encode_gray_jpeg_dcexact,
    )

    jpegs = [encode_gray_jpeg_dcexact(40 * (i + 1)) for i in range(3)]
    mp4 = encode_mp4_mjpeg(jpegs, width=8, height=8)
    pure = parse_mp4_frames(mp4)
    lib = B.PyAVFrameSampler().parse_frames(mp4)
    assert pure is not None and lib is not None
    assert pure[0] == lib[0]  # codec label
    assert (pure[1], pure[2]) == (lib[1], lib[2])  # geometry
    assert len(pure[3]) == len(lib[3])
    for i, (a, b) in enumerate(zip(pure[3], lib[3])):
        assert bytes(a) == bytes(b), f"frame {i} bitstream differs"
