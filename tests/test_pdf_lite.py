"""Pure-Python PDF decode (sources/pdf_lite.py): exact text from a
hand-assembled PDF, and character-stream parity with the reference's
committed PyMuPDF golden dump on its own 327-page Thai PDF."""

from __future__ import annotations

import os
import re
import zlib
from collections import defaultdict

import pytest

from legalchatbot_vectordb_exp_spark.sources.pdf_lite import (
    extract_page_texts,
)

THAI_PDF = "/root/reference/Qdrant/Documents/ประมวลกฎหมายแพ่งและพาณิชย์.pdf"
GOLDEN = "/root/reference/Qdrant/Documents/Output/output.txt"


def _mini_pdf(page_streams: list[bytes], compress: bool) -> bytes:
    """Assemble a minimal multi-page PDF (one content stream per page,
    Helvetica, optional FlateDecode)."""
    objs: dict[int, bytes] = {}
    n_pages = len(page_streams)
    kid_refs = b" ".join(
        b"%d 0 R" % (3 + 2 * i) for i in range(n_pages)
    )
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kid_refs + b"] /Count %d >>" % n_pages
    )
    for i, stream in enumerate(page_streams):
        page_num = 3 + 2 * i
        cont_num = page_num + 1
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R "
            b"/Resources << /Font << /F1 %d 0 R >> >> >>"
            % (cont_num, 100)
        )
        body = zlib.compress(stream) if compress else stream
        filt = b"/Filter /FlateDecode " if compress else b""
        objs[cont_num] = (
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(body)
            + body
            + b"\nendstream"
        )
    objs[100] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    out = b"%PDF-1.4\n"
    for num in sorted(objs):
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF"
    return out


@pytest.mark.parametrize("compress", [False, True])
def test_mini_pdf_exact_text(compress):
    pdf = _mini_pdf(
        [
            b"BT /F1 12 Tf (Hello) Tj ( world) Tj T* (line two) Tj ET",
            b"BT /F1 12 Tf [(frag) (ments)] TJ ET",
        ],
        compress=compress,
    )
    pages = extract_page_texts(pdf)
    assert pages == ["Hello world\nline two", "fragments"]


def test_literal_string_escapes():
    pdf = _mini_pdf(
        [rb"BT /F1 9 Tf (par\(en\) \\ back \101 octal) Tj ET"], False
    )
    assert extract_page_texts(pdf) == ["par(en) \\ back A octal"]


@pytest.mark.skipif(
    not os.path.isfile(THAI_PDF), reason="reference PDF not present"
)
def test_reference_thai_pdf_matches_golden_character_stream():
    """Every one of the 327 pages with golden chunks must reproduce
    the committed PyMuPDF text exactly after whitespace normalization
    (layout spacing is out of scope; the character stream is not)."""
    pages = extract_page_texts(open(THAI_PDF, "rb").read())
    assert len(pages) == 327

    golden = open(GOLDEN, encoding="utf-8").read()
    parts = re.split(r"\[Page (\d+) \| Chunk (\d+)\]\n", golden)
    per_page: dict[int, str] = defaultdict(str)
    for i in range(1, len(parts), 3):
        per_page[int(parts[i])] += parts[i + 2]

    def ws(s: str) -> str:
        return re.sub(r"\s+", "", s)

    mismatches = [
        p for p, gold in per_page.items() if ws(gold) != ws(pages[p - 1])
    ]
    assert not mismatches, mismatches[:5]


def test_synth_roundtrip_both_font_modes():
    """pdf_synth writer → pdf_lite reader: literal-string Latin-1 and
    Type0+ToUnicode-CMap hex-string modes both recover exact text."""
    from legalchatbot_vectordb_exp_spark.sources.pdf_synth import (
        encode_pdf_pages,
    )

    pages = ["hello world 42", "spark (fast) \\ scan", "key agg row"]
    for mode in ("latin1", "cmap"):
        got = extract_page_texts(encode_pdf_pages(pages, mode=mode))
        assert got == pages, mode


def test_stream_length_preferred_over_eol_regex():
    """A Flate stream whose compressed bytes END with \\r must not be
    truncated by the \\r?\\n-before-endstream regex: /Length slices it
    exactly (ISO 32000-1 §7.3.8).  Regression for the 3 dropped pages
    found while oracle-checking pdf_roundtrip."""
    import zlib

    from legalchatbot_vectordb_exp_spark.sources.pdf_lite import _stream_of

    # find a payload whose deflate ends with 0x0d
    for i in range(100000):
        data = b"BT (x%d) Tj ET" % i
        z = zlib.compress(data)
        if z.endswith(b"\r"):
            break
    else:
        raise AssertionError("no trailing-CR deflate found")
    body = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z)
        + z
        + b"\nendstream"
    )
    assert _stream_of(body) == data
    # indirect /Length must still fall back to the regex path
    body2 = (
        b"<< /Length 9 0 R /Filter /FlateDecode >>\nstream\n"
        + zlib.compress(b"ok")
        + b"\nendstream"
    )
    assert _stream_of(body2) == b"ok"
