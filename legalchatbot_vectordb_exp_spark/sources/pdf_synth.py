"""Minimal spec-valid PDF WRITER (PDF 32000-1:2008 subset) — the
fixture side of the oracle-checked PDF scan (#1,
reference ``Qdrant/main.py:21-56``).

``extract_page_texts`` (``sources/pdf_lite.py``) previously had no
CORRECTNESS row anywhere: the testdata ships no PDFs, so the decode
path was pinned only by golden-file parity against the reference's own
document.  This writer closes that gap the same way the MP4/JPEG/WAV
fixtures did for E4: a pack kernel synthesizes real PDFs from table
rows, the real extractor decodes them back, and a DuckDB oracle
recomputes the expected (pdf, page, text) rows relationally.

What the writer emits (all of it consumed by the reader under test):

* a correct object graph — Catalog → Pages → Kids → per-page
  /Contents + /Resources/Font — plus a byte-accurate xref table and
  a trailer carrying ``/Root``;
* **FlateDecode** content streams (every page decode inflates real
  zlib data);
* two font modes, alternated by the caller so both reader paths stay
  covered:
  - ``latin1`` — a simple /Type1 font, text as escaped literal
    ``(…) Tj`` strings, decoded byte-per-byte;
  - ``cmap`` — a /Type0 composite font with a Flate-compressed
    /ToUnicode CMap using NON-IDENTITY 2-byte codes (code = rank of
    the character in the PDF's sorted alphabet), text as hex-string
    shows — the reader must actually walk codespacerange/bfchar to
    recover the text (the path Thai text takes in the reference's
    PDFs).
"""

from __future__ import annotations

import zlib

_ESCAPES = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\"}


def _literal(text: str) -> bytes:
    """() string with PDF escapes; text must be Latin-1 encodable."""
    raw = text.encode("latin-1")
    return b"(" + b"".join(_ESCAPES.get(c, bytes([c])) for c in raw) + b")"


def _cmap_stream(alphabet: list[str]) -> bytes:
    """ToUnicode CMap mapping code (1-based alphabet rank) → char,
    ≤100 bfchar entries per block per the CMap spec."""
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    for start in range(0, len(alphabet), 100):
        block = alphabet[start : start + 100]
        lines.append(b"%d beginbfchar" % len(block))
        for off, ch in enumerate(block):
            code = start + off + 1
            dst = ch.encode("utf-16-be").hex().upper().encode()
            lines.append(b"<%04X> <%s>" % (code, dst))
        lines.append(b"endbfchar")
    lines += [b"endcmap", b"end", b"end"]
    return b"\n".join(lines)


def encode_pdf_pages(pages: list[str], mode: str = "cmap") -> bytes:
    """page texts → complete PDF bytes (one /Page per text).

    ``mode``: ``"latin1"`` (simple font, literal strings) or
    ``"cmap"`` (Type0 font, ToUnicode CMap, hex strings).
    """
    if mode not in ("latin1", "cmap"):
        raise ValueError(f"unknown mode {mode!r}")

    objs: list[bytes] = []  # body of object i+1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    def add_stream(dict_extra: bytes, data: bytes) -> int:
        z = zlib.compress(data)
        return add(
            b"<< /Length %d /Filter /FlateDecode %s>>\nstream\n%s\nendstream"
            % (len(z), dict_extra, z)
        )

    n = len(pages)
    # object numbers are assigned in append order; reserve 1..2 for
    # Catalog/Pages by appending placeholders we fill at the end
    add(b"")  # 1: Catalog (filled below)
    add(b"")  # 2: Pages   (filled below)

    if mode == "cmap":
        alphabet = sorted({c for t in pages for c in t})
        code_of = {c: i + 1 for i, c in enumerate(alphabet)}
        cmap_ref = add_stream(b"", _cmap_stream(alphabet))
        font_ref = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/ToUnicode %d 0 R >>" % cmap_ref
        )
    else:
        font_ref = add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )

    page_refs: list[int] = []
    for text in pages:
        if mode == "cmap":
            hexs = "".join("%04X" % code_of[c] for c in text).encode()
            show = b"<" + hexs + b">"
        else:
            show = _literal(text)
        content = b"BT /F1 12 Tf " + show + b" Tj ET"
        c_ref = add_stream(b"", content)
        p_ref = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (font_ref, c_ref)
        )
        page_refs.append(p_ref)

    kids = b" ".join(b"%d 0 R" % r for r in page_refs)
    objs[1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n)
    objs[0] = b"<< /Type /Catalog /Pages 2 0 R >>"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, 1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        out += b"%010d 00000 n \n" % offsets[i]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
