"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (extension E4 — SURVEY.md §2.9).

The PDF source (sources/pdf.py) is the first instance of the pattern;
this module generalizes it: a multimodal table is
``(id, modality STRING, content BINARY, meta STRUCT<...>)`` where
``content`` flows through the plan untouched (Tungsten treats it as
bytes; no serialization surprises) and modality-specific work happens
in Arrow-batched ``mapInPandas`` operators.

The decode/feature kernels themselves need codec libraries that are
not in this container, so they are STUBS with real Spark plumbing:
exact schemas, batch iteration, deterministic fake outputs (sized by
the real byte content) — swapping in PIL/ffmpeg later changes only the
kernel body, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# magic-byte prefixes → mime (pure expression; pushdown-friendly)
_MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("494433", "audio/mpeg"),
    ("1A45DFA3", "video/webm"),
]


def sniff_mime(content: Column | str) -> Column:
    """Magic-byte mime sniffing as a CASE expression over hex(prefix)."""
    content = F.col(content) if isinstance(content, str) else content
    prefix = F.upper(F.hex(F.substring(content, 1, 8)))
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        expr = F.when(prefix.startswith(magic), F.lit(mime)).otherwise(expr)
    return expr


def binary_metadata(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Adds (n_bytes, sha256, mime) — pure JVM expressions, no UDF."""
    return (
        df.withColumn("n_bytes", F.octet_length(F.col(content_col)))
        .withColumn("sha256", F.sha2(F.col(content_col), 256))
        .withColumn("mime", sniff_mime(content_col))
    )


IMAGE_FEATURES_SCHEMA = (
    "id string, width int, height int, n_channels int, mean_intensity double"
)


def decode_image_stub(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """Image decode → feature extraction, as mapInPandas.

    STUB KERNEL: no image codec is available in this container, so
    dimensions are derived deterministically from the byte content
    (length/checksum), not decoded pixels.  The Spark side — Arrow
    batches of binary, typed output schema, per-partition execution —
    is the real production shape; replace the kernel body with
    PIL.Image.open when the codec exists.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[content_col].map(
                lambda b: len(b) if b is not None else 0
            )
            checksum = pdf[content_col].map(
                lambda b: sum(b[:64]) if b else 0
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype(str),
                    "width": (n % 1920 + 1).astype("int32"),
                    "height": (checksum % 1080 + 1).astype("int32"),
                    "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "mean_intensity": (checksum % 256).astype("float64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "id string, width int, height int, content binary, n_bytes int"
)


def resize_image_stub(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Image resize shape: binary in → binary out with target dims.

    STUB KERNEL: the "resized" payload is the input bytes resampled by
    fixed-stride byte decimation to a deterministic size proportional
    to ``width × height`` (PIL absent) — preserving the production
    contract that output size is a function of the *target* dims, not
    the input.  Binary flows Arrow-batched both directions; swapping in
    ``PIL.Image.resize`` changes only the kernel body.
    """
    target = max(1, (width * height) // 256)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[bytes] = []
            for content in pdf[content_col]:
                data = bytes(content) if content is not None else b""
                if not data:
                    out.append(b"")
                    continue
                stride = max(1, len(data) // target)
                out.append(data[::stride][:target])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype(str),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "content": out,
                    "n_bytes": pd.Series(
                        [len(b) for b in out], dtype="int32"
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "id string, frame_index int, frame binary"


def frame_sample_stub(
    df: DataFrame,
    every_n_bytes: int = 1024,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame sampling shape: one input row → many frame rows.

    STUB KERNEL: "frames" are fixed-stride byte slices standing in for
    decoded frames (ffmpeg absent).  Demonstrates the 1→N multimodal
    explode with binary output through Arrow.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[str] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(str(rid))
                    idxs.append(i)
                    frames.append(data[off : off + every_n_bytes])
            yield pd.DataFrame(
                {"id": ids, "frame_index": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema=FRAME_SAMPLE_SCHEMA
    )
