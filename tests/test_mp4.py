"""ISO BMFF frame sampling (multimodal/mp4.py): real box-walk parse,
MJPEG end-to-end pixels, honest rejection, Spark operator explode."""

from __future__ import annotations

import numpy as np

from legalchatbot_vectordb_exp_spark.multimodal.jpeg import (
    Q_LUMA_DCEXACT,
    decode_jpeg,
    encode_jpeg,
)
from legalchatbot_vectordb_exp_spark.multimodal.mp4 import (
    encode_mp4_mjpeg,
    parse_mp4_frames,
)


def _mjpeg(levels, w=8, h=8):
    frames = [
        encode_jpeg(np.full((h, w), v, np.uint8), qtables=[Q_LUMA_DCEXACT])
        for v in levels
    ]
    return encode_mp4_mjpeg(frames, w, h), frames


def test_roundtrip_frames_bytes_exact():
    mp4, frames = _mjpeg([10, 130, 250])
    parsed = parse_mp4_frames(mp4)
    assert parsed is not None
    codec, w, h, out = parsed
    assert codec == "jpeg" and (w, h) == (8, 8)
    assert out == frames  # exact sample byte ranges, not approximations


def test_mjpeg_decodes_to_pixels_end_to_end():
    mp4, _ = _mjpeg([10, 130, 250])
    _, _, _, frames = parse_mp4_frames(mp4)
    for f, v in zip(frames, (10, 130, 250)):
        px = decode_jpeg(f)
        assert px is not None and (px == v).all()


def test_rejects_malformed():
    mp4, _ = _mjpeg([42])
    assert parse_mp4_frames(b"junkjunkjunkjunk") is None
    assert parse_mp4_frames(mp4[:40]) is None  # no moov yet
    assert parse_mp4_frames(mp4[: len(mp4) - 10]) is None  # truncated moov
    # sample table pointing outside the file
    bad = bytearray(mp4)
    stco_at = mp4.find(b"stco")
    bad[stco_at + 8 + 4 : stco_at + 8 + 8] = (2**31).to_bytes(4, "big")
    assert parse_mp4_frames(bytes(bad)) is None


def test_every_n_sampling_and_operator(spark):
    from legalchatbot_vectordb_exp_spark.multimodal.binary import (
        sample_frames,
    )

    mp4, frames = _mjpeg([1, 2, 3, 4, 5])
    df = spark.createDataFrame(
        [("vid", bytearray(mp4)), ("bad", bytearray(b"not mp4"))],
        ["id", "content"],
    )
    rows = sample_frames(df, every=2).collect()
    # unparseable input emits zero rows; 5 frames sampled every 2 → 0,2,4
    assert sorted(r.frame_index for r in rows) == [0, 2, 4]
    for r in rows:
        assert r.id == "vid" and r.codec == "jpeg"
        assert (r.width, r.height) == (8, 8)
        assert bytes(r.frame) == frames[r.frame_index]


def test_crafted_stsz_count_rejected_not_fabricated():
    """ADVICE r4: a header-declared sample count larger than the box
    body must raise (→ None), not allocate huge lists or silently
    emit zero-size frames from out-of-range int.from_bytes reads."""
    mp4, _ = _mjpeg([10, 130, 250])
    i = mp4.find(b"stsz")
    # fullbox verflags(4) + const_size(4) → count at type_offset + 12
    corrupt = bytearray(mp4)
    corrupt[i + 12 : i + 16] = (0xFFFFFFFF).to_bytes(4, "big")
    assert parse_mp4_frames(bytes(corrupt)) is None


def test_truncated_stco_rejected():
    mp4, _ = _mjpeg([10, 130])
    i = mp4.find(b"stco")
    corrupt = bytearray(mp4)
    corrupt[i + 12 : i + 16] = (1000).to_bytes(4, "big")
    assert parse_mp4_frames(bytes(corrupt)) is None
