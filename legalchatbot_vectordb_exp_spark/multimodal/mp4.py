"""REAL MP4 (ISO BMFF, ISO/IEC 14496-12) frame sampling in pure
stdlib — the last E4 modality to go from stub to real.

What "real" means without a video codec library: the CONTAINER layer
is parsed byte-for-byte — box walk (32-bit, 64-bit largesize and
to-EOF sizes), ``moov → trak → mdia → minf → stbl`` sample tables
(``stsd`` codec entry + dimensions, ``stsz`` sizes, ``stsc``
sample-to-chunk mapping, ``stco``/``co64`` chunk offsets) — and each
sample's exact byte range is materialized as a frame row.  Frames
come back as the codec bitstream they are (honest: H.264 frames stay
H.264 bytes), plus the codec fourcc so downstream can route them; for
Motion-JPEG tracks (fourcc ``jpeg``/``mjpa``) every frame is a
baseline JPEG that ``multimodal/jpeg.py`` decodes to pixels, so an
MJPEG MP4 decodes END-TO-END in this engine.

A minimal writer (``encode_mp4_mjpeg``) produces spec-valid MJPEG
files for fixtures and the relational oracle, mirroring how
``encode_png`` / ``encode_jpeg`` pin their decoders.

Anything malformed (truncated boxes, missing sample tables,
inconsistent stsc/stco) returns None / empty — no fake frames.
"""

from __future__ import annotations

import struct


class _Mp4Error(Exception):
    pass


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        cc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise _Mp4Error("truncated largesize")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
            if size < 16:
                raise _Mp4Error("bad largesize")
        elif size == 0:  # to end of enclosing box
            size = end - pos
        elif size < 8:
            raise _Mp4Error("bad box size")
        if pos + size > end:
            raise _Mp4Error("box overruns container")
        yield cc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for cc, b, e in _walk_boxes(data, start, end):
        if cc == fourcc:
            return b, e
    return None


def _full_box(data: bytes, b: int):
    """FullBox header → (version, flags, payload offset)."""
    return data[b], int.from_bytes(data[b + 1 : b + 4], "big"), b + 4


def _parse_stbl(data: bytes, b: int, e: int):
    """Sample table → (codec fourcc, width, height, [(offset, size)])."""
    stsd = _find(data, b, e, b"stsd")
    stsz = _find(data, b, e, b"stsz")
    stsc = _find(data, b, e, b"stsc")
    stco = _find(data, b, e, b"stco")
    co64 = _find(data, b, e, b"co64")
    if stsd is None or stsz is None or stsc is None or (
        stco is None and co64 is None
    ):
        raise _Mp4Error("incomplete sample table")

    # stsd: first sample entry carries codec fourcc + visual dims
    _, _, p = _full_box(data, stsd[0])
    n_entries = int.from_bytes(data[p : p + 4], "big")
    if n_entries < 1:
        raise _Mp4Error("empty stsd")
    entry = p + 4
    codec = data[entry + 4 : entry + 8]
    # VisualSampleEntry: 4 size + 4 cc + 6 reserved + 2 dataref +
    # 16 predefined/reserved → width(2) height(2)
    width = int.from_bytes(data[entry + 32 : entry + 34], "big")
    height = int.from_bytes(data[entry + 34 : entry + 36], "big")

    # stsz: per-sample sizes (or one constant size).  Header-declared
    # counts are untrusted 32-bit values: validate the box body really
    # holds n*item bytes BEFORE materializing lists — a crafted count
    # would otherwise allocate gigabytes, and int.from_bytes of an
    # out-of-range slice is silently 0 (b'' -> 0), turning a truncated
    # table into fabricated empty frames instead of the documented
    # malformed-input error.
    _, _, p = _full_box(data, stsz[0])
    const_size = int.from_bytes(data[p : p + 4], "big")
    n_samples = int.from_bytes(data[p + 4 : p + 8], "big")
    if n_samples > len(data):
        raise _Mp4Error("stsz sample count exceeds file size")
    if const_size:
        sizes = [const_size] * n_samples
    else:
        if p + 8 + 4 * n_samples > stsz[1]:
            raise _Mp4Error("truncated stsz")
        sizes = [
            int.from_bytes(data[p + 8 + 4 * i : p + 12 + 4 * i], "big")
            for i in range(n_samples)
        ]

    # chunk offsets
    box, item = (stco, 4) if stco is not None else (co64, 8)
    _, _, p = _full_box(data, box[0])
    n_chunks = int.from_bytes(data[p : p + 4], "big")
    if n_chunks > len(data) or p + 4 + item * n_chunks > box[1]:
        raise _Mp4Error("truncated stco/co64")
    offs = [
        int.from_bytes(
            data[p + 4 + item * i : p + 4 + item * (i + 1)], "big"
        )
        for i in range(n_chunks)
    ]

    # stsc: (first_chunk, samples_per_chunk) runs → per-chunk counts
    _, _, p = _full_box(data, stsc[0])
    n_runs = int.from_bytes(data[p : p + 4], "big")
    if n_runs > len(data) or p + 4 + 12 * n_runs > stsc[1]:
        raise _Mp4Error("truncated stsc")
    runs = [
        struct.unpack_from(">III", data, p + 4 + 12 * i)[:2]
        for i in range(n_runs)
    ]
    if not runs or runs[0][0] != 1:
        raise _Mp4Error("bad stsc")
    per_chunk = []
    for i, (first, spc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks:
        raise _Mp4Error("stsc/stco mismatch")

    frames, si = [], 0
    for ci, chunk_off in enumerate(offs):
        off = chunk_off
        for _ in range(per_chunk[ci]):
            if si >= n_samples:
                break
            frames.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise _Mp4Error("sample count mismatch")
    return codec, width, height, frames


def parse_mp4_frames(data: bytes):
    """MP4 bytes → (codec fourcc str, width, height,
    [frame bytes, ...]) for the first video track, else None."""
    try:
        if len(data) < 12:
            return None
        moov = _find(data, 0, len(data), b"moov")
        if moov is None:
            return None
        for cc, tb, te in _walk_boxes(data, moov[0], moov[1]):
            if cc != b"trak":
                continue
            mdia = _find(data, tb, te, b"mdia")
            if mdia is None:
                continue
            hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                _, _, p = _full_box(data, hdlr[0])
                if data[p + 4 : p + 8] != b"vide":
                    continue
            minf = _find(data, mdia[0], mdia[1], b"minf")
            if minf is None:
                continue
            stbl = _find(data, minf[0], minf[1], b"stbl")
            if stbl is None:
                continue
            codec, w, h, spans = _parse_stbl(data, stbl[0], stbl[1])
            frames = []
            for off, size in spans:
                if off + size > len(data):
                    raise _Mp4Error("sample outside file")
                frames.append(data[off : off + size])
            return codec.decode("latin1"), w, h, frames
        return None
    except (_Mp4Error, struct.error, IndexError):
        return None


# ---------------------------------------------------------------- writer


def _box(cc: bytes, *bodies: bytes) -> bytes:
    body = b"".join(bodies)
    return (len(body) + 8).to_bytes(4, "big") + cc + body


def _fbox(cc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(cc, bytes([version]) + flags.to_bytes(3, "big") + body)


def encode_mp4_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 1
) -> bytes:
    """JPEG frame bytes → minimal spec-valid MJPEG MP4.

    Layout is ftyp + mdat + moov (moov last, so stco offsets are
    independent of moov's own size — the standard faststart-less
    layout)."""
    if not frames:
        raise ValueError("need at least one frame")
    ftyp = _box(b"ftyp", b"isom", (0).to_bytes(4, "big"), b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    first_off = len(ftyp) + 8  # into mdat payload

    n = len(frames)
    timescale, dur = fps * 1000, 1000
    total = n * dur
    mvhd = _fbox(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, total)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _fbox(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, total)
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _fbox(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, total)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _fbox(
        b"hdlr", 0, 0,
        (0).to_bytes(4, "big") + b"vide" + b"\x00" * 12 + b"mjpeg\x00",
    )
    entry = (
        (86).to_bytes(4, "big") + b"jpeg"
        + b"\x00" * 6 + (1).to_bytes(2, "big")  # reserved + dataref
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + (0).to_bytes(4, "big")
        + (1).to_bytes(2, "big")  # frame count per sample
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, color table
    )
    stsd = _fbox(b"stsd", 0, 0, (1).to_bytes(4, "big") + entry)
    stts = _fbox(
        b"stts", 0, 0,
        (1).to_bytes(4, "big") + struct.pack(">II", n, dur),
    )
    stsc = _fbox(
        b"stsc", 0, 0,
        (1).to_bytes(4, "big") + struct.pack(">III", 1, n, 1),
    )
    stsz = _fbox(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(len(f).to_bytes(4, "big") for f in frames),
    )
    stco = _fbox(
        b"stco", 0, 0,
        (1).to_bytes(4, "big") + first_off.to_bytes(4, "big"),
    )
    dref = _fbox(
        b"dref", 0, 0,
        (1).to_bytes(4, "big") + _fbox(b"url ", 0, 1, b""),
    )
    stbl = _box(b"stbl", stsd, stts, stsc, stsz, stco)
    minf = _box(
        b"minf",
        _fbox(b"vmhd", 0, 1, b"\x00" * 8),
        _box(b"dinf", dref),
        stbl,
    )
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    trak = _box(b"trak", tkhd, mdia)
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov
