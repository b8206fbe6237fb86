"""REAL GIF decode (GIF87a/89a, LZW) in pure Python + NumPy —
another lossless codec for the E4 multimodal path, same honesty
contract as PNG/JPEG: spec-faithful parse (logical screen descriptor,
global/local color tables, full LZW dictionary decode with 12-bit
growth and clear codes, interlace passes, extension-block skipping)
or None — never fake pixels.

Decodes the FIRST image block (animations: frame 0) to (H, W, 3)
uint8 RGB via the active palette.  A matching encoder (real LZW
compression, global color table built from the image's unique colors,
≤256) produces spec-valid files for fixtures and the relational
oracle — GIF is lossless, so decoded pixels equal encoded pixels
exactly, the same property the PNG oracle rides.
"""

from __future__ import annotations

import numpy as np


class _GifError(Exception):
    pass


# ---------------------------------------------------------------- decode


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise _GifError("truncated sub-blocks")
        n = data[pos]
        pos += 1 + n
        if n == 0:
            return pos


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise _GifError("truncated sub-blocks")
        n = data[pos]
        if pos + 1 + n > len(data):
            raise _GifError("truncated sub-block body")
        out += data[pos + 1 : pos + 1 + n]
        pos += 1 + n
        if n == 0:
            return bytes(out), pos


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> bytearray:
    """GIF-variant LZW: little-endian bit packing, clear/end codes,
    dictionary grows to 12 bits."""
    if not 2 <= min_code <= 11:
        raise _GifError("bad LZW min code size")
    clear = 1 << min_code
    end = clear + 1

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code + 1

    table, width = reset()
    next_code = end + 1
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width = reset()
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise _GifError("bad first code")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise _GifError("code out of range")
            out += entry
            if len(out) >= n_pixels:
                return out
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes):
    """GIF bytes → (H, W, 3) uint8 RGB (first frame), else None."""
    try:
        return _decode_gif_inner(data)
    except (_GifError, IndexError, ValueError):
        return None


def _decode_gif_inner(data: bytes):
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos = _skip_subblocks(data, pos + 2)
        elif block == 0x2C:  # image descriptor
            w = int.from_bytes(data[pos + 5 : pos + 7], "little")
            h = int.from_bytes(data[pos + 7 : pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(
                    n, 3
                )
                pos += n * 3
            if pal is None or w == 0 or h == 0:
                return None
            min_code = data[pos]
            lzw, pos = _read_subblocks(data, pos + 1)
            idx = _lzw_decode(lzw, min_code, w * h)
            if len(idx) < w * h:
                return None
            flat = np.frombuffer(bytes(idx[: w * h]), np.uint8)
            if int(flat.max()) >= pal.shape[0]:
                return None
            rows = flat.reshape(h, w)
            if ipacked & 0x40:  # interlaced: 4-pass row shuffle
                out_rows = np.empty_like(rows)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, h, step):
                        out_rows[y] = rows[src]
                        src += 1
                rows = out_rows
            return pal[rows].copy()
        elif block == 0x3B:  # trailer before any image
            return None
        else:
            raise _GifError("unknown block")
    return None


# ---------------------------------------------------------------- encode


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, w: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset (keeps decoder in sync)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB (≤256 unique colors) → GIF89a bytes."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("need (H, W, 3) uint8 pixels")
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError("GIF palette limited to 256 colors")
    # palette size = power of two ≥ max(2, n_colors)
    bits = max(1, int(np.ceil(np.log2(max(2, colors.shape[0])))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    min_code = max(2, bits)
    lzw = _lzw_encode(idx.astype(np.uint8).tobytes(), min_code)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])  # GCT flag + size
    out += pal.tobytes()
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little")
    out += h.to_bytes(2, "little") + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
