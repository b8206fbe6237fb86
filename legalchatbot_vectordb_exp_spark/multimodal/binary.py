"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (extension E4 — SURVEY.md §2.9).

The PDF source (sources/pdf.py) is the first instance of the pattern;
this module generalizes it: a multimodal table is
``(id, modality STRING, content BINARY, meta STRUCT<...>)`` where
``content`` flows through the plan untouched (Tungsten treats it as
bytes; no serialization surprises) and modality-specific work happens
in Arrow-batched ``mapInPandas`` operators.

Codec status is split honestly:

* **REAL decode** — BMP (24/32-bit uncompressed), PPM (binary P6) and
  WAV (PCM16) are parsed byte-for-byte in pure NumPy; PNG (8-bit
  depth, all five row filters, color types 0/2/3/4/6) is inflated with
  stdlib ``zlib`` and unfiltered in NumPy; baseline JPEG (SOF0,
  huffman + dequant + IDCT, 4:4:4/4:2:2/4:2:0, restart markers) is
  decoded in pure NumPy too (``multimodal/jpeg.py``) —
  ``decode_image`` / ``resize_image`` / ``decode_audio`` process
  actual pixels/samples end-to-end with no codec library.
* **REAL frame sampling** — MP4 sample tables are parsed for real
  (``multimodal/mp4.py``, ISO BMFF box walk + stsd/stsz/stsc/stco),
  so ``sample_frames`` emits each frame's exact bitstream bytes with
  codec fourcc and dims; Motion-JPEG frames then decode to pixels via
  the JPEG decoder — a full video→pixels path with no codec library.
  Frames of codecs we cannot decode (H.264…) stay bitstream bytes,
  honestly labeled.
* **Codec-library tier** — when Pillow / PyAV is importable (or an
  explicit backend is installed via ``set_codec_backend_factory`` /
  ``set_video_backend_factory``) the same kernels route through the
  native-code library, with the pure decoders as fallback and
  cross-check — the 100 TB throughput path, contract-tested either
  way (real dep or recorded stand-in).
* **STUB kernels** — the legacy ``*_stub`` variants survive as the
  documented pattern for codec-library integration (deterministic
  fake outputs, real Arrow plumbing); nothing routes through them in
  the oracle-checked paths anymore.
"""

from __future__ import annotations

import zlib
from collections import OrderedDict
from collections.abc import Iterator

import numpy as np
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
    ("424D", "image/bmp"),
    ("50360A", "image/x-portable-pixmap"),
    ("52494646", "audio/x-wav"),
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


# ---------------------------------------------------------------------
# REAL codecs: pure-NumPy decode of uncompressed formats.  No external
# codec library — the byte layouts below are published file-format
# specs (BMP BITMAPINFOHEADER, netpbm P6, RIFF/WAVE PCM).


def _decode_bmp(data: bytes):
    """Uncompressed 24/32-bit BMP → (H, W, 3) uint8 RGB, else None."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    pix_off = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3 if bpp == 24 else width * 4
    need = pix_off + stride * height
    if len(data) < need:
        return None
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * height, offset=pix_off
    ).reshape(height, stride)
    px = rows[:, : width * nch].reshape(height, width, nch)
    if not top_down:
        px = px[::-1]
    return px[:, :, [2, 1, 0]].copy()  # BGR(A) → RGB, alpha dropped


def _decode_ppm(data: bytes):
    """Binary netpbm P6 (maxval ≤ 255) → (H, W, 3) uint8 RGB, else None."""
    if not data.startswith(b"P6"):
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(data):
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # header comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if not data[start:pos].isdigit():
            return None
        fields.append(int(data[start:pos]))
    if len(fields) < 3 or pos >= len(data):
        return None
    width, height, maxval = fields
    if maxval > 255 or width <= 0 or height <= 0:
        return None
    pos += 1  # the single whitespace after maxval
    need = width * height * 3
    if len(data) - pos < need:
        return None
    return (
        np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
        .reshape(height, width, 3)
        .copy()
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (palette indexes count as 1 until
# PLTE expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4) for the scalar decode path."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(data: bytes):
    """REAL PNG decode: chunk walk + CRC verify, stdlib-zlib IDAT
    inflate, NumPy per-row unfilter → (H, W, C) uint8, else None.

    Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette,
    expanded via PLTE), 4 (gray+alpha), 6 (RGBA), non-interlaced, all
    five row filters (None/Sub/Up/Average/Paeth).  Sub rides a
    per-channel cumsum and Up a vectorized add; Average/Paeth have a
    true left-neighbor dependency chain, so they walk the row
    scalar-wise — correctness first, and rows are cache-resident.
    Anything else (16-bit, Adam7, bad CRC, truncated stream) returns
    None — no fake pixels.
    """
    if not data.startswith(_PNG_SIG):
        return None
    pos, ihdr, plte, idat = len(_PNG_SIG), None, None, []
    while pos + 12 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        cid = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            return None
        crc = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(cid + body) != crc:
            return None
        if cid == b"IHDR":
            ihdr = body
        elif cid == b"PLTE":
            plte = body
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
    if (
        depth != 8
        or interlace != 0
        or ctype not in _PNG_CHANNELS
        or width <= 0
        or height <= 0
    ):
        return None
    nch = _PNG_CHANNELS[ctype]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = width * nch
    if len(raw) != height * (stride + 1):
        return None
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    rpos = 0
    for y in range(height):
        ft = raw[rpos]
        row = np.frombuffer(raw, np.uint8, stride, rpos + 1).copy()
        rpos += stride + 1
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: cumsum per channel residue class, mod 256
            cur = row
            for c in range(nch):
                cur[c::nch] = np.cumsum(
                    cur[c::nch], dtype=np.uint64
                ).astype(np.uint8)
        elif ft == 2:  # Up: uint8 addition wraps mod 256
            cur = row + prev
        elif ft == 3:  # Average: sequential left dependency
            cur = row
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                cur[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth: sequential left/up-left dependency
            cur = row
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                ul = int(prev[x - nch]) if x >= nch else 0
                cur[x] = (
                    int(row[x]) + _png_paeth(left, int(prev[x]), ul)
                ) & 0xFF
        else:
            return None
        out[y] = cur
        prev = out[y]
    px = out.reshape(height, width, nch)
    if ctype == 3:
        if plte is None or len(plte) % 3 or not len(plte):
            return None
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            return None
        return pal[idx].copy()
    return px.copy()


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + cid
        + body
        + zlib.crc32(cid + body).to_bytes(4, "big")
    )


def encode_png(px: "np.ndarray", row_filters=None) -> bytes:
    """(H, W, C) uint8 → PNG bytes (the inverse of ``_decode_png``),
    C ∈ {1, 2, 3, 4} → color type 0/4/2/6.

    ``row_filters`` (int or per-row list, default 0) selects the PNG
    row filter actually APPLIED — the encoder computes true residuals,
    so a decoder round-trip exercises every unfilter path."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    if row_filters is None:
        row_filters = [0] * h
    elif isinstance(row_filters, int):
        row_filters = [row_filters] * h
    flat = px.reshape(h, w * nch).astype(np.int16)
    zero = np.zeros(w * nch, dtype=np.int16)
    parts = []
    for y in range(h):
        ft = int(row_filters[y])
        cur, up = flat[y], (flat[y - 1] if y else zero)
        left = np.concatenate([zero[:nch], cur[:-nch]]) if w * nch > nch \
            else zero[: w * nch]
        ul = np.concatenate([zero[:nch], up[:-nch]]) if w * nch > nch \
            else zero[: w * nch]
        if ft == 0:
            res = cur
        elif ft == 1:
            res = cur - left
        elif ft == 2:
            res = cur - up
        elif ft == 3:
            res = cur - (left + up) // 2
        elif ft == 4:
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
            res = cur - pred
        else:
            raise ValueError(f"bad PNG filter {ft}")
        parts.append(bytes([ft]) + (res & 0xFF).astype(np.uint8).tobytes())
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + _png_chunk(b"IEND", b"")
    )


# ------------------ pluggable codec-library tier (E4 100 TB path)
#
# Mirrors the PyMuPDF / sentence-transformers tiering: when Pillow
# (images) or PyAV (video containers) is importable the kernels route
# through it for native-code throughput; the pure-NumPy decoders stay
# as the always-present fallback AND the cross-check oracle
# (tests/test_multimodal.py pins backend agreement on the lossless
# fixtures, via a recorded stand-in when the optional dep is absent).

_CODEC_FACTORY = None
_VIDEO_FACTORY = None


def set_codec_backend_factory(factory) -> None:
    """Install an explicit pixel-decode backend factory
    (``() -> obj`` with ``.decode_pixels(bytes) -> ndarray | None``);
    ``None`` restores default resolution (Pillow when importable, else
    pure decoders only).  Captured when the operator is CALLED so it
    travels inside the UDF closure to executor workers."""
    global _CODEC_FACTORY
    _CODEC_FACTORY = factory


def set_video_backend_factory(factory) -> None:
    """Same contract for frame sampling: ``() -> obj`` with
    ``.parse_frames(bytes) -> (codec, w, h, [bytes]) | None``."""
    global _VIDEO_FACTORY
    _VIDEO_FACTORY = factory


class PillowBackend:
    """Pillow-routed pixel decode with the pure decoders' channel
    conventions: (H, W, C) uint8, grayscale as C=1, palette expanded
    to RGB.  Returns None for anything Pillow rejects (never raises),
    so the pure fallback gets a look."""

    def decode_pixels(self, data: bytes):
        import io

        from PIL import Image

        try:
            with Image.open(io.BytesIO(data)) as im:
                im.load()
                if im.mode not in ("L", "RGB"):
                    im = im.convert("RGB")
                arr = np.asarray(im, dtype=np.uint8)
        except Exception:
            return None
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr


class PyAVFrameSampler:
    """PyAV-routed sample extraction with ``parse_mp4_frames``'s
    output contract: demuxed packet bytes ARE the per-sample bitstream
    ranges for ISO BMFF input; codec names map back to the fourcc
    labels the pure parser emits (mjpeg → jpeg)."""

    _CODEC_LABEL = {"mjpeg": "jpeg"}

    def parse_frames(self, data: bytes):
        import io

        try:
            import av

            with av.open(io.BytesIO(data)) as container:
                vs = next(
                    (s for s in container.streams if s.type == "video"),
                    None,
                )
                if vs is None:
                    return None
                frames = [
                    bytes(p) for p in container.demux(vs) if p.size > 0
                ]
                name = vs.codec_context.name
                w = vs.codec_context.width
                h = vs.codec_context.height
        except Exception:
            return None
        return self._CODEC_LABEL.get(name, name), w, h, frames


class RecordedPillowFixture:
    """Recorded stand-in for the optional Pillow backend (the
    ``ml.embed.RecordedSTFixture`` pattern): reproduces the backend
    API surface and channel conventions so the ROUTING — backend
    preferred, pure fallback, lossless-fixture agreement — stays
    tested in containers without the dependency.  Backed by the pure
    decoders, which is exactly the agreement contract."""

    calls = 0

    def decode_pixels(self, data: bytes):
        type(self).calls += 1
        return decode_pixels(data)


def _default_codec_backend():
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        return PillowBackend()
    return None


def _default_video_backend():
    import importlib.util

    if importlib.util.find_spec("av") is not None:
        return PyAVFrameSampler()
    return None


# Per-Python-worker decode memo: corpora with repeated blobs (tiled
# fixtures, boilerplate logos, the MJPEG constant-gray frames — ≤256
# distinct across the whole suite) hit ~100%; genuinely unique 100 TB
# image corpora hit ~0% and pay only a dict probe per blob.  Strictly
# bounded: only small compressed blobs are keyed (the key stores the
# bytes themselves — exact, no digest-collision caveat), only small
# decoded arrays are retained, LRU-evicted at _PIXEL_MEMO_MAX entries.
# Worst case ≈ 512 × (64 KiB key + 256 KiB array) ≈ 160 MiB/worker.
_PIXEL_MEMO: "OrderedDict[tuple, object]" = OrderedDict()
_PIXEL_MEMO_MAX = 512
_PIXEL_MEMO_MAX_BLOB = 1 << 16  # don't key blobs > 64 KiB
_PIXEL_MEMO_MAX_PIXELS = 1 << 18  # don't retain arrays > 256 KiB
_MEMO_MISS = object()


def _resolve_pixels_uncached(data: bytes, backend):
    """Backend first (native-code throughput at scale), pure decoders
    for everything the backend is absent for or rejects."""
    if backend is not None:
        px = backend.decode_pixels(data)
        if px is not None:
            return px
    return decode_pixels(data)


def _resolve_pixels(data: bytes, backend):
    if len(data) > _PIXEL_MEMO_MAX_BLOB:
        return _resolve_pixels_uncached(data, backend)
    key = (type(backend).__name__ if backend is not None else None, data)
    hit = _PIXEL_MEMO.get(key, _MEMO_MISS)
    if hit is not _MEMO_MISS:
        _PIXEL_MEMO.move_to_end(key)
        return hit
    px = _resolve_pixels_uncached(data, backend)
    if px is not None and px.nbytes > _PIXEL_MEMO_MAX_PIXELS:
        return px
    if px is not None:
        px.setflags(write=False)  # shared across rows — freeze it
    _PIXEL_MEMO[key] = px
    if len(_PIXEL_MEMO) > _PIXEL_MEMO_MAX:
        _PIXEL_MEMO.popitem(last=False)
    return px


def decode_pixels(data: bytes):
    """Dispatch over the REAL decoders; None for unknown/corrupt bytes."""
    if not data:
        return None
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if data[:2] == b"P6":
        return _decode_ppm(data)
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(data)
    if data[:3] == b"\xff\xd8\xff":
        from legalchatbot_vectordb_exp_spark.multimodal.jpeg import (
            decode_jpeg,
        )

        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from legalchatbot_vectordb_exp_spark.multimodal.gif import (
            decode_gif,
        )

        return decode_gif(data)
    return None


def encode_ppm(px: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 → binary P6 bytes (the inverse of _decode_ppm)."""
    h, w = px.shape[0], px.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _decode_wav(data: bytes):
    """RIFF/WAVE PCM16 → (sample_rate, n_channels, int16 samples), else
    None.  Walks the chunk list, so extra chunks (LIST, fact) are fine."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, rate, nch, bits, frames = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = int.from_bytes(body[0:2], "little")
            nch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or bits != 16 or nch == 0:
                return None
        elif cid == b"data":
            frames = np.frombuffer(
                body, dtype="<i2", count=len(body) // 2
            )
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or frames is None:
        return None
    if nch > 1:
        frames = frames[: len(frames) - len(frames) % nch].reshape(-1, nch)
    return rate, nch, frames


IMAGE_FEATURES_SCHEMA = (
    "id string, width int, height int, n_channels int, mean_intensity double"
)

DECODED_IMAGE_SCHEMA = (
    "id string, decoded boolean, width int, height int, n_channels int, "
    "mean_intensity double"
)


def decode_image(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL image decode → features, as mapInPandas.

    BMP (24/32-bit uncompressed) and binary PPM bytes are decoded to
    actual pixels in pure NumPy; ``mean_intensity`` is the mean over
    every channel value.  Bytes the decoders don't recognize come back
    ``decoded=false`` with null features — no fake numbers.

    When Pillow is importable (or an explicit backend is installed via
    ``set_codec_backend_factory``) decode routes through it, with the
    pure decoders as fallback — the documented codec-library swap-in
    for 100 TB throughput, same kernel shape."""
    factory = _CODEC_FACTORY  # captured now; ships in the closure

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = factory() if factory else _default_codec_backend()
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                px = _resolve_pixels(data, backend)
                if px is None:
                    rows.append((str(rid), False, None, None, None, None))
                else:
                    rows.append(
                        (
                            str(rid),
                            True,
                            px.shape[1],
                            px.shape[0],
                            px.shape[2],
                            float(px.mean()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "decoded", "width", "height", "n_channels",
                    "mean_intensity",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema=DECODED_IMAGE_SCHEMA
    )


def resize_image(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """REAL image resize: decode (BMP/PPM) → nearest-neighbor resample
    in NumPy → re-encode as binary PPM.  Unrecognized bytes come back
    ``decoded=false`` with null content."""
    factory = _CODEC_FACTORY

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = factory() if factory else _default_codec_backend()
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                px = _resolve_pixels(data, backend)
                if px is None:
                    rows.append((str(rid), False, None, None, None))
                    continue
                h, w = px.shape[0], px.shape[1]
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                out = px[yi][:, xi]
                rows.append(
                    (str(rid), True, width, height, encode_ppm(out))
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "decoded", "width", "height", "content"],
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel,
        schema=(
            "id string, decoded boolean, width int, height int, "
            "content binary"
        ),
    )


AUDIO_FEATURES_SCHEMA = (
    "id string, decoded boolean, sample_rate int, n_channels int, "
    "n_samples int, duration_s double, rms double"
)


def decode_audio(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """REAL audio decode: RIFF/WAVE PCM16 bytes → actual samples in
    pure NumPy; rms is computed over the real waveform.  Non-WAV bytes
    come back ``decoded=false`` with null features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                wav = _decode_wav(data)
                if wav is None:
                    rows.append(
                        (str(rid), False, None, None, None, None, None)
                    )
                    continue
                rate, nch, frames = wav
                n = frames.shape[0]
                samples = frames.astype(np.float64)
                rms = float(np.sqrt((samples**2).mean())) if n else 0.0
                rows.append(
                    (str(rid), True, rate, nch, n, n / rate, rms)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "decoded", "sample_rate", "n_channels",
                    "n_samples", "duration_s", "rms",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA
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


FRAME_ROWS_SCHEMA = (
    "id string, frame_index int, codec string, width int, height int, "
    "frame binary"
)


def sample_frames(
    df: DataFrame,
    every: int = 1,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """REAL video frame sampling (1 row → N frame rows): parse the
    ISO BMFF sample tables (``multimodal/mp4.py``) and emit every
    ``every``-th sample's exact bitstream byte range, with the
    container-declared codec fourcc and dimensions.  Frames stay
    codec bytes (honest — no video codec library); Motion-JPEG frames
    are baseline JPEGs that ``decode_image`` then decodes to real
    pixels.  Unparseable inputs emit zero rows (flatMap semantics).

    Scale shape: a narrow Arrow-batched explode over the binary
    column — no shuffle; frame volume is bounded by ``1/every`` of
    the stored sample bytes."""
    from legalchatbot_vectordb_exp_spark.multimodal.mp4 import (
        parse_mp4_frames,
    )

    factory = _VIDEO_FACTORY  # PyAV tier when importable/installed

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = factory() if factory else _default_video_backend()
        for pdf in batches:
            ids, idxs, codecs, ws, hs, blobs = [], [], [], [], [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                parsed = (
                    backend.parse_frames(data)
                    if backend is not None
                    else None
                )
                if parsed is None:
                    parsed = parse_mp4_frames(data)
                if parsed is None:
                    continue
                codec, w, h, frames = parsed
                for i, f in enumerate(frames):
                    if i % every:
                        continue
                    ids.append(str(rid))
                    idxs.append(i)
                    codecs.append(codec)
                    ws.append(w)
                    hs.append(h)
                    blobs.append(f)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "codec": codecs,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "frame": blobs,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        kernel, schema=FRAME_ROWS_SCHEMA
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
