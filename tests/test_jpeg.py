"""Baseline JPEG codec (multimodal/jpeg.py): exactness contract for
constant blocks, lossy tolerance for the general case, subsampling,
restart markers, honest rejection of everything non-baseline, and the
Spark decode_image integration."""

from __future__ import annotations

import numpy as np

from legalchatbot_vectordb_exp_spark.multimodal.jpeg import (
    Q_LUMA_DCEXACT,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 3 + xx * 2) % 200 + 20).astype(np.uint8)


def test_constant_gray_roundtrips_exactly():
    """The oracle contract: constant blocks + DC-exact quant table →
    bit-exact decode (quantize/huffman/dequant/IDCT all in the loop)."""
    for v in (0, 7, 128, 200, 255):
        out = decode_jpeg(
            encode_jpeg(np.full((8, 8), v, np.uint8), qtables=[Q_LUMA_DCEXACT])
        )
        assert out is not None and out.shape == (8, 8, 1)
        assert (out == v).all()
    # multi-block, non-8-multiple dims (edge-replication padding)
    out = decode_jpeg(
        encode_jpeg(np.full((19, 13), 99, np.uint8), qtables=[Q_LUMA_DCEXACT])
    )
    assert out.shape == (19, 13, 1) and (out == 99).all()


def test_gray_gradient_high_quality_close():
    px = _gradient(32, 24)
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert out is not None and out.shape == (32, 24, 1)
    d = np.abs(out[:, :, 0].astype(int) - px.astype(int))
    assert d.max() <= 4 and d.mean() < 1.0


def test_rgb_444_and_420_roundtrip_tolerance():
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (2, 2, 3))
    px = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    out444 = decode_jpeg(encode_jpeg(px, quality=95))
    assert out444.shape == (16, 16, 3)
    assert np.abs(out444.astype(int) - px.astype(int)).max() <= 2
    out420 = decode_jpeg(encode_jpeg(px, quality=95, subsample="420"))
    assert out420.shape == (16, 16, 3)
    # chroma subsampling loses detail at block boundaries only
    assert np.abs(out420.astype(int) - px.astype(int)).mean() < 3.0


def test_restart_markers_do_not_change_pixels():
    px = _gradient(24, 40)
    plain = decode_jpeg(encode_jpeg(px, quality=80))
    rst = decode_jpeg(encode_jpeg(px, quality=80, restart_interval=2))
    assert plain is not None and rst is not None
    assert (plain == rst).all()


def test_encoder_is_deterministic():
    px = _gradient(16, 16)
    assert encode_jpeg(px, quality=75) == encode_jpeg(px, quality=75)


def test_rejects_non_baseline_and_corrupt():
    px = _gradient(16, 16)
    good = encode_jpeg(px, quality=80)
    assert decode_jpeg(good[: len(good) // 2]) is None  # truncated
    assert decode_jpeg(b"\xff\xd8\xff\xe0junk") is None  # no frame
    assert decode_jpeg(b"not a jpeg") is None
    # progressive (SOF2) → honest None, never fake pixels
    assert decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None
    # 12-bit precision flag → None
    sof_at = good.find(b"\xff\xc0")
    mangled = bytearray(good)
    mangled[sof_at + 4] = 12  # precision byte
    assert decode_jpeg(bytes(mangled)) is None


def test_jpeg_through_decode_image_operator(spark):
    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        decode_image,
    )

    px = _gradient(8, 8)
    jpg = encode_jpeg(px, qtables=[Q_LUMA_DCEXACT])
    const = encode_jpeg(
        np.full((8, 8), 77, np.uint8), qtables=[Q_LUMA_DCEXACT]
    )
    df = spark.createDataFrame(
        [("grad", bytearray(jpg)), ("const", bytearray(const))],
        ["id", "content"],
    )
    rows = {r.id: r for r in decode_image(df).collect()}
    assert rows["const"].decoded
    assert (rows["const"].width, rows["const"].height) == (8, 8)
    assert rows["const"].n_channels == 1
    assert abs(rows["const"].mean_intensity - 77.0) < 1e-12
    assert rows["grad"].decoded


def test_mime_sniff_on_real_jpeg_bytes(spark):
    from legalchatbot_vectordb_exp_spark.multimodal.binary import sniff_mime

    jpg = encode_jpeg(np.zeros((8, 8), np.uint8))
    df = spark.createDataFrame([(bytearray(jpg),)], ["content"])
    assert df.select(sniff_mime("content").alias("m")).head().m == "image/jpeg"


def test_encoder_rejects_out_of_range_qtable():
    """ADVICE r4: DQT entries are 8-bit; a 300 would quantize with one
    table but embed 300 % 256 = 44 in the file — must raise."""
    import numpy as np
    import pytest

    px = np.full((8, 8), 128, np.uint8)
    bad = [300.0] + [16.0] * 63
    with pytest.raises(ValueError, match=r"\[1, 255\]"):
        encode_jpeg(px, qtables=[bad])
    zero = [0.0] + [16.0] * 63
    with pytest.raises(ValueError, match=r"\[1, 255\]"):
        encode_jpeg(px, qtables=[zero])
