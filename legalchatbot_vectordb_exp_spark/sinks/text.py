"""Formatted-text chunk dump sink.

Twin of the reference's golden-file writer (``Qdrant/main.py:48-52``):
``[Page p | Chunk i]\\n<text>\\n\\n`` blocks, one per chunk, written as
a text file.  Block order is made explicit (page, chunk_index) —
the reference's order fell out of its sequential loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chunk_block_col(
    page_col: str = "page",
    chunk_col: str = "chunk_index",
    text_col: str = "text",
):
    return F.concat(
        F.lit("[Page "),
        F.col(page_col),
        F.lit(" | Chunk "),
        F.col(chunk_col),
        F.lit("]\n"),
        F.col(text_col),
        F.lit("\n"),
    )


def write_chunk_dump(
    df: DataFrame,
    path: str,
    page_col: str = "page",
    chunk_col: str = "chunk_index",
    text_col: str = "text",
    single_file: bool = True,
) -> None:
    blocks = df.orderBy(page_col, chunk_col).select(
        chunk_block_col(page_col, chunk_col, text_col).alias("value")
    )
    out = blocks.coalesce(1) if single_file else blocks
    out.write.mode("overwrite").text(path)
