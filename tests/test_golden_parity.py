"""Parity against the reference's only golden artifact: the committed
chunk dump ``Qdrant/Documents/Output/output.txt`` (327 blocks written by
``read_pdf_text``, ``Qdrant/main.py:48-52``).

The PDF codec isn't available in this container, so the strongest
end-to-end check of operators #1/#8–#11 is: parse the golden file into
(page, chunk_index, text) blocks, reconstruct each page's pre-chunking
text (dropped short paragraphs stand in as 1-char fillers so indexes
keep their positions), run the engine's chunking pipeline over those
pages, and require block-for-block equality — then re-render with the
formatted-text sink expression and require byte-for-byte equality with
the committed file.
"""

from __future__ import annotations

import os
import re
from collections import defaultdict

import pytest

from legalchatbot_vectordb_exp_spark.functions.text import paragraph_chunks
from legalchatbot_vectordb_exp_spark.sinks.text import chunk_block_col

GOLDEN = "/root/reference/Qdrant/Documents/Output/output.txt"

_HEADER = re.compile(r"\[Page (\d+) \| Chunk (\d+)\]\n")


def _parse_golden() -> tuple[str, list[tuple[int, int, str]]]:
    with open(GOLDEN, encoding="utf-8") as f:
        content = f.read()
    parts = _HEADER.split(content)
    assert parts[0] == "", "file must start with a block header"
    blocks = []
    for i in range(1, len(parts), 3):
        page, idx, body = int(parts[i]), int(parts[i + 1]), parts[i + 2]
        # chunk text was produced by splitting on \n\n, so the only
        # \n\n in a body is the block separator at its end
        assert body.endswith("\n\n") and body.count("\n\n") == 1, (page, idx)
        blocks.append((page, idx, body[:-2]))
    return content, blocks


@pytest.fixture(scope="module")
def golden():
    if not os.path.isfile(GOLDEN):
        pytest.skip("reference golden file not present")
    return _parse_golden()


def _reconstruct_pages(blocks) -> list[tuple[int, str]]:
    """Rebuild each page's text as the \\n\\n-join of its paragraphs.

    A missing chunk_index means the reference saw a non-empty paragraph
    shorter than min_len there (it claimed an index but was skipped,
    ``Qdrant/main.py:40-41``); a 1-char filler reproduces that."""
    pages: dict[int, dict[int, str]] = defaultdict(dict)
    for p, i, t in blocks:
        pages[p][i] = t
    out = []
    for p, idx_map in sorted(pages.items()):
        paras = [idx_map.get(i, "ฯ") for i in range(max(idx_map) + 1)]
        out.append((p, "\n\n".join(paras)))
    return out


def test_golden_block_inventory(golden):
    content, blocks = golden
    assert len(blocks) == 327  # SURVEY.md §5: the committed corpus size
    # every golden chunk respects the min_len=50 post-strip contract
    for p, i, t in blocks:
        assert len(t) >= 50, (p, i)
        assert t == t.strip(), (p, i)
        assert "\n\n" not in t, (p, i)


def test_chunking_reproduces_golden_blocks(spark, golden):
    _, blocks = golden
    pages = _reconstruct_pages(blocks)
    df = spark.createDataFrame(pages, "page int, text string")
    got = (
        paragraph_chunks(df, text_col="text", min_len=50)
        .select("page", "chunk_index", "chunk_text")
        .collect()
    )
    got_set = {(r.page, r.chunk_index, r.chunk_text) for r in got}
    assert got_set == set(blocks)
    assert len(got) == len(blocks)


def test_chunk_dump_bytes_match_reference_file(spark, golden):
    content, blocks = golden
    pages = _reconstruct_pages(blocks)
    df = spark.createDataFrame(pages, "page int, text string")
    chunks = paragraph_chunks(df, text_col="text", min_len=50)
    rows = (
        chunks.orderBy("page", "chunk_index")
        .select(
            chunk_block_col(
                page_col="page", chunk_col="chunk_index", text_col="chunk_text"
            ).alias("value")
        )
        .collect()
    )
    # the text sink writes each row followed by \n — emulate and compare
    rendered = "".join(r.value + "\n" for r in rows)
    assert rendered == content
