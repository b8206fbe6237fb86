"""GIF codec (multimodal/gif.py): lossless LZW round-trips,
dictionary-growth stress, interlace, rejection, operator dispatch."""

from __future__ import annotations

import numpy as np

from legalchatbot_vectordb_exp_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
)


def test_roundtrip_exact_small_and_full_palette():
    rng = np.random.RandomState(0)
    pal16 = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    px = pal16[rng.randint(0, 16, (13, 9))]
    out = decode_gif(encode_gif(px))
    assert out is not None and (out == px).all()
    # 256 colors on a 64x64 image: exercises code-width growth to 9+
    # bits and real dictionary reuse
    pal256 = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    px = pal256[rng.randint(0, 256, (64, 64))]
    assert (decode_gif(encode_gif(px)) == px).all()


def test_interlaced_image_deinterlaces():
    """Hand-build an interlaced stream: rows stored in 4-pass order
    must come back in display order."""
    rng = np.random.RandomState(1)
    pal = rng.randint(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, (8, 5)).astype(np.uint8)
    plain = encode_gif(pal[idx])
    # rebuild: flip the interlace bit and reorder rows into pass order
    passes = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
              for y in range(s, 8, st)]
    from legalchatbot_vectordb_exp_spark.multimodal.gif import _lzw_encode

    reordered = idx[passes]
    # map pixel colors through the same palette the encoder built
    colors = np.unique(pal[idx].reshape(-1, 3), axis=0)
    lut = {tuple(c): i for i, c in enumerate(colors)}
    remapped = np.array(
        [[lut[tuple(pal[v])] for v in row] for row in reordered],
        dtype=np.uint8,
    )
    lzw = _lzw_encode(remapped.tobytes(), 2)
    head_end = plain.find(b"\x2c")
    desc = bytearray(plain[head_end : head_end + 10])
    desc[9] |= 0x40  # interlace flag
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    interlaced = (
        plain[:head_end] + bytes(desc) + bytes([2]) + bytes(blocks)
        + b"\x00\x3b"
    )
    out = decode_gif(interlaced)
    assert out is not None and (out == pal[idx]).all()


def test_rejects_malformed():
    px = np.zeros((4, 4, 3), np.uint8)
    g = encode_gif(px)
    assert decode_gif(g[:10]) is None  # truncated header
    assert decode_gif(g[: len(g) - 4]) is None or decode_gif(
        g[: len(g) - 4]
    ) is not None  # truncation mid-stream must not raise
    assert decode_gif(b"GIF89ajunkjunkjunkjunk") is None
    assert decode_gif(b"not a gif") is None


def test_encoder_limits_and_determinism():
    import pytest

    rng = np.random.RandomState(2)
    too_many = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    if np.unique(too_many.reshape(-1, 3), axis=0).shape[0] > 256:
        with pytest.raises(ValueError):
            encode_gif(too_many)
    px = rng.randint(0, 4, (6, 6, 3)).astype(np.uint8) * 60
    assert encode_gif(px) == encode_gif(px)


def test_gif_through_decode_image_operator(spark):
    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        decode_image,
        sniff_mime,
    )

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
    px = pal[rng.randint(0, 8, (5, 7))]
    g = encode_gif(px)
    df = spark.createDataFrame([("g", bytearray(g))], ["id", "content"])
    r = decode_image(df).collect()[0]
    assert r.decoded and (r.width, r.height, r.n_channels) == (7, 5, 3)
    assert abs(r.mean_intensity - float(px.mean())) < 1e-12
    assert df.select(sniff_mime("content").alias("m")).head().m == "image/gif"
