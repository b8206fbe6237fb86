"""Minimal pure-Python PDF text extraction — a REAL decode path for
the PDF scan operator (#1, ``Qdrant/main.py:21-56``) in environments
without PyMuPDF.

Scope (deliberately small, standard-derived — PDF 32000-1:2008):

* objects located by scanning ``N G obj … endobj`` (no xref needed);
* ``FlateDecode`` streams inflated with stdlib zlib;
* page order from the Catalog → Pages → Kids tree;
* per-page content streams tokenized for text operators: ``Tf`` font
  selection, ``Tj``/``TJ``/``'``/``"`` show-text, ``Td``/``TD``/
  ``T*`` line moves (emitted as newlines);
* composite (Type0/CID) fonts decoded through their ToUnicode CMap
  (``bfchar``/``bfrange``, 1- or 2-byte codes inferred from the CMap
  itself); simple fonts fall back to Latin-1 byte decoding.

This recovers the actual Unicode text (including Thai via the
embedded CMaps) from the reference's own PDFs.  What it does NOT do:
positional layout reconstruction (PyMuPDF sorts glyphs spatially and
synthesizes spacing), encryption, non-Flate filters — so extracted
whitespace differs from ``page.get_text()`` even though the character
stream is real.  The chunking semantics are pinned separately against
the golden dump (tests/test_golden_parity.py).
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_REF_RE = re.compile(rb"/%s\s+(\d+)\s+\d+\s+R")


def _objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


_STREAM_START_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+\d+\s+R)?")


def _stream_of(body: bytes) -> bytes | None:
    # Prefer the dict's direct /Length to slice the stream exactly
    # (ISO 32000-1 §7.3.8): the EOL-delimited regex alone drops the
    # final byte whenever the (binary) stream data happens to END with
    # \r — its \r?\n-before-endstream group consumes it, silently
    # truncating the zlib payload.  Indirect /Length (N 0 R) falls
    # back to the regex, as before.
    raw = None
    sm = _STREAM_START_RE.search(body)
    if sm is not None:
        lm = _LENGTH_RE.search(body[: sm.start()])
        if lm is not None and lm.group(2) is None:
            n = int(lm.group(1))
            cand = body[sm.end() : sm.end() + n]
            if len(cand) == n and re.match(
                rb"\s*endstream", body[sm.end() + n :]
            ):
                raw = cand
    if raw is None:
        m = _STREAM_RE.search(body)
        if not m:
            return None
        raw = m.group(1)
    if b"/FlateDecode" in body.split(b"stream", 1)[0]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def _ref(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _refs(body: bytes, key: bytes) -> list[int]:
    """Value of /key as one ref or an array of refs."""
    m = re.search(
        rb"/" + key + rb"\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]", body
    )
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    one = _ref(body, key)
    return [one] if one is not None else []


def _balanced_dict(body: bytes, start: int) -> bytes:
    """The << … >> slice starting at ``start`` (nesting-aware)."""
    depth, i = 0, start
    while i < len(body) - 1:
        pair = body[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _parse_cmap(cmap: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap → (code→text, code byte width)."""
    out: dict[int, str] = {}
    width = 2

    def uni(hexs: bytes) -> str:
        # UTF-16BE code units (surrogate pairs included)
        return bytes.fromhex(hexs.decode()).decode(
            "utf-16-be", errors="ignore"
        )

    space = re.search(
        rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", cmap
    )
    if space:
        width = max(1, len(space.group(1)) // 2)

    for block in re.findall(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block
        ):
            out[int(src, 16)] = uni(dst)
    for block in re.findall(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        for lo, hi, rest in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(<[0-9A-Fa-f]+>|\[[^\]]*\])",
            block,
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if rest.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", rest)
                for off, dst in enumerate(dsts):
                    out[lo_i + off] = uni(dst)
            else:
                base_hex = rest[1:-1]
                base = int(base_hex, 16)
                for code in range(lo_i, hi_i + 1):
                    out[code] = uni(
                        b"%0*X" % (len(base_hex), base + code - lo_i)
                    )
    return out, width


class _Font:
    __slots__ = ("cmap", "width")

    def __init__(self, cmap: dict[int, str] | None, width: int):
        self.cmap = cmap
        self.width = width

    def decode(self, raw: bytes) -> str:
        if self.cmap is None:
            return raw.decode("latin-1", errors="ignore")
        w, out = self.width, []
        for i in range(0, len(raw) - w + 1, w):
            out.append(self.cmap.get(int.from_bytes(raw[i : i + w], "big"), ""))
        return "".join(out)


_LATIN1_FONT = _Font(None, 1)

_STR_TOKEN = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # literal string (1-level; escapes handled)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|/[^\s/<>\[\]()]+"  # name
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+"  # operator
    rb"|[-+.0-9]+",  # number
    re.S,
)

_ESC = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _literal_bytes(tok: bytes) -> bytes:
    """() string token → raw bytes with PDF escapes applied."""
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt.isdigit():  # octal \ddd
                j = i + 1
                while j < min(i + 4, len(body)) and body[j : j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out.extend(_ESC.get(nxt, nxt.decode("latin-1")).encode("latin-1"))
            i += 2
        else:
            out.extend(c)
            i += 1
    return bytes(out)


def _page_fonts(objs: dict[int, bytes], page_body: bytes) -> dict[bytes, _Font]:
    """Resolve the page's /Font resource dict → name → _Font."""
    res_body = page_body
    res_ref = _ref(page_body, b"Resources")
    if res_ref is not None and res_ref in objs:
        res_body = objs[res_ref]
    m = re.search(rb"/Font\s*<<", res_body)
    font_dict = b""
    if m:
        font_dict = _balanced_dict(res_body, m.end() - 2)
    elif (fr := _ref(res_body, b"Font")) is not None and fr in objs:
        font_dict = objs[fr]
    fonts: dict[bytes, _Font] = {}
    for name, ref in re.findall(
        rb"/([^\s/<>]+)\s+(\d+)\s+\d+\s+R", font_dict
    ):
        fbody = objs.get(int(ref), b"")
        tu = _ref(fbody, b"ToUnicode")
        if tu is not None and tu in objs:
            cmap_stream = _stream_of(objs[tu])
            if cmap_stream:
                cmap, width = _parse_cmap(cmap_stream)
                fonts[b"/" + name] = _Font(cmap, width)
                continue
        fonts[b"/" + name] = _LATIN1_FONT
    return fonts


def _page_order(objs: dict[int, bytes], data: bytes) -> list[int]:
    """Page object numbers in document order via the Pages tree."""
    root = None
    m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
    if m:
        root = int(m.group(1))
    else:
        for num, body in objs.items():
            if b"/Type" in body and b"/Catalog" in body:
                root = num
                break
    order: list[int] = []

    def walk(num: int, seen: set[int]) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = objs[num]
        if re.search(rb"/Type\s*/Page\b", body):
            order.append(num)
            return
        for kid in _refs(body, b"Kids"):
            walk(kid, seen)

    if root is not None and root in objs:
        pages_ref = _ref(objs[root], b"Pages")
        if pages_ref is not None:
            walk(pages_ref, set())
    if not order:  # degenerate fallback: object order
        order = [
            n for n, b in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b", b)
        ]
    return order


def _extract_text(content: bytes, fonts: dict[bytes, _Font]) -> str:
    """Tokenize one content stream; text ops → string."""
    out: list[str] = []
    font = _LATIN1_FONT
    stack: list[bytes] = []  # operand tokens since last operator
    for m in _STR_TOKEN.finditer(content):
        tok = m.group(0)
        first = tok[:1]
        if first in b"(<" and tok != b"<":
            stack.append(tok)
        elif first == b"/" or tok in (b"[", b"]") or first in b"-+.0123456789":
            stack.append(tok)
        else:  # operator
            if tok == b"Tf":
                names = [t for t in stack if t[:1] == b"/"]
                if names:
                    font = fonts.get(names[-1], _LATIN1_FONT)
            elif tok in (b"Tj", b"'", b'"'):
                for t in stack:
                    if t[:1] == b"(":
                        out.append(font.decode(_literal_bytes(t)))
                    elif t[:1] == b"<":
                        hexs = re.sub(rb"\s", b"", t[1:-1])
                        if len(hexs) % 2:
                            hexs += b"0"
                        out.append(font.decode(bytes.fromhex(hexs.decode())))
                if tok in (b"'", b'"'):
                    out.append("\n")
            elif tok == b"TJ":
                for t in stack:
                    if t[:1] == b"(":
                        out.append(font.decode(_literal_bytes(t)))
                    elif t[:1] == b"<":
                        hexs = re.sub(rb"\s", b"", t[1:-1])
                        if len(hexs) % 2:
                            hexs += b"0"
                        out.append(font.decode(bytes.fromhex(hexs.decode())))
            elif tok in (b"Td", b"TD", b"T*"):
                out.append("\n")
            stack = []
    return "".join(out)


def extract_page_texts(data: bytes) -> list[str]:
    """PDF bytes → per-page Unicode text (REAL decode; see module
    docstring for scope)."""
    objs = _objects(data)
    pages: list[str] = []
    for num in _page_order(objs, data):
        body = objs[num]
        fonts = _page_fonts(objs, body)
        parts: list[str] = []
        for cref in _refs(body, b"Contents"):
            if cref in objs:
                stream = _stream_of(objs[cref])
                if stream:
                    parts.append(_extract_text(stream, fonts))
        pages.append("".join(parts))
    return pages
