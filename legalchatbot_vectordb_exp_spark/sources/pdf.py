"""PDF page extraction over Spark's binaryFile source.

The reference opens a PDF with PyMuPDF and emits per-page text
(``Qdrant/main.py:21-56``).  The Spark-native shape: ``binaryFile``
scan → ``mapInPandas`` batch extractor → (path, page, text) rows.
The extractor parallelizes per *file*; page-level parallelism inside
one huge file would need a custom splitter (not needed at the
reference's 327-page scale, noted for completeness).

PyMuPDF (``fitz``) is not installed in this container, so extraction
is pluggable: with ``fitz`` importable it is used; otherwise a
deterministic fallback treats the binary payload as UTF-8 text with
form-feed (``\\f``) page breaks — which keeps the Spark plumbing
(binary scan, Arrow batching, schema) real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

PAGE_SCHEMA = "path string, page int, text string"


def _extract_pages(content: bytes) -> list[str]:
    """Per-file page texts; PyMuPDF when available, else the
    deterministic form-feed fallback (clearly a stand-in, not a PDF
    parser)."""
    try:
        import fitz  # PyMuPDF — absent in this container

        with fitz.open(stream=content, filetype="pdf") as doc:
            return [page.get_text() for page in doc]
    except ImportError:
        return content.decode("utf-8", errors="replace").split("\f")


def read_pdf_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → Arrow-batched page extraction.

    Returns (path, page, text) with 1-based page numbers, empty pages
    dropped after strip — matching ``Qdrant/main.py:29-33``.
    """
    binary = spark.read.format("binaryFile").load(path_glob)

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple[str, int, str]] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, text in enumerate(_extract_pages(bytes(content)), 1):
                    if text.strip():
                        rows.append((path, i, text))
            yield pd.DataFrame(rows, columns=["path", "page", "text"])

    return binary.select("path", "content").mapInPandas(
        extract, schema=PAGE_SCHEMA
    )
