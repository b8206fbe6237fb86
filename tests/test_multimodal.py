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
