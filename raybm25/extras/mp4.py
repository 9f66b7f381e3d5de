"""MP4 / ISO-BMFF (ISO/IEC 14496-12, public spec) METADATA parser —
stdlib only.

Walks the box (atom) tree of an MP4/MOV container: ``ftyp`` brand,
``mvhd`` movie timescale + duration, and per-``trak`` handler type
(vide/soun/...), media duration, visual width/height and the sample
description's codec fourcc (avc1, hev1, mp4a, ...). No sample data is
touched — this is the corpus-triage signal (duration, resolution,
codec mix, track layout) a 100 TB crawl pipeline filters on before
paying for real decode, which genuinely needs codec libraries and
stays out of scope (see extras/multimodal.py's seam notes).
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(buf: memoryview, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        fourcc = bytes(buf[pos + 4 : pos + 8])
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed/truncated: stop cleanly
        yield fourcc, body, pos + size
        pos += size


def _find(buf: memoryview, start: int, end: int, fourcc: bytes):
    for fc, b, e in _boxes(buf, start, end):
        if fc == fourcc:
            return b, e
    return None


def _mvhd(buf: memoryview, b: int) -> tuple[int, int]:
    """(timescale, duration) from an mvhd body."""
    version = buf[b]
    if version == 1:
        return struct.unpack_from(">IQ", buf, b + 4 + 16)
    ts, dur = struct.unpack_from(">II", buf, b + 4 + 8)
    return ts, dur


def _mdhd(buf: memoryview, b: int) -> tuple[int, int]:
    version = buf[b]
    if version == 1:
        return struct.unpack_from(">IQ", buf, b + 4 + 16)
    ts, dur = struct.unpack_from(">II", buf, b + 4 + 8)
    return ts, dur


def _track_meta(buf: memoryview, b: int, e: int) -> dict:
    out: dict = {
        "handler": None,
        "codec": None,
        "duration_s": None,
        "width": None,
        "height": None,
    }
    tkhd = _find(buf, b, e, b"tkhd")
    if tkhd is not None:
        tb, _ = tkhd
        version = buf[tb]
        # width/height: last 8 bytes of the box body, 16.16 fixed point
        off = tb + 4 + (32 if version == 1 else 20) + 52
        w, h = struct.unpack_from(">II", buf, off)
        out["width"] = w >> 16
        out["height"] = h >> 16
    mdia = _find(buf, b, e, b"mdia")
    if mdia is None:
        return out
    mb, me = mdia
    mdhd = _find(buf, mb, me, b"mdhd")
    if mdhd is not None:
        ts, dur = _mdhd(buf, mdhd[0])
        out["duration_s"] = dur / ts if ts else None
    hdlr = _find(buf, mb, me, b"hdlr")
    if hdlr is not None:
        out["handler"] = bytes(buf[hdlr[0] + 8 : hdlr[0] + 12]).decode(
            "ascii", "replace"
        )
    minf = _find(buf, mb, me, b"minf")
    if minf is not None:
        stbl = _find(buf, minf[0], minf[1], b"stbl")
        if stbl is not None:
            stsd = _find(buf, stbl[0], stbl[1], b"stsd")
            if stsd is not None:
                sb = stsd[0]
                n_entries = struct.unpack_from(">I", buf, sb + 4)[0]
                if n_entries >= 1 and sb + 16 <= stsd[1]:
                    out["codec"] = bytes(buf[sb + 12 : sb + 16]).decode(
                        "ascii", "replace"
                    )
    return out


def mp4_meta(buf: bytes) -> dict:
    """{brand, duration_s, n_tracks, tracks: [{handler, codec,
    duration_s, width, height}, ...]}.  Raises ValueError when the
    payload is not an ISO-BMFF container (no ftyp/moov)."""
    mv = memoryview(buf)
    n = len(buf)
    brand = None
    moov = None
    for fc, b, e in _boxes(mv, 0, n):
        if fc == b"ftyp":
            brand = bytes(mv[b : b + 4]).decode("ascii", "replace")
        elif fc == b"moov":
            moov = (b, e)
    if moov is None:
        raise ValueError("not an ISO-BMFF container (no moov box)")
    b, e = moov
    duration_s = None
    mvhd = _find(mv, b, e, b"mvhd")
    if mvhd is not None:
        ts, dur = _mvhd(mv, mvhd[0])
        duration_s = dur / ts if ts else None
    tracks = [_track_meta(mv, tb, te) for fc, tb, te in _boxes(mv, b, e) if fc == b"trak"]
    return {
        "brand": brand,
        "duration_s": duration_s,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


# ---------------------------------------------------------------- fixture
def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def encode_fixture_mp4(
    duration_s: float = 12.0,
    timescale: int = 1000,
    video: tuple[int, int, str] | None = (640, 360, "avc1"),
    audio: str | None = "mp4a",
) -> bytes:
    """Fixture-grade MP4 builder for parser tests: structurally valid
    ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl/stsd boxes with
    empty sample tables and no mdat (the parser reads no samples)."""
    dur = int(duration_s * timescale)

    def track(handler: bytes, codec: bytes, w: int = 0, h: int = 0) -> bytes:
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">II", 0, 0)  # times
            + struct.pack(">I4x", 1)  # track id + reserved
            + struct.pack(">I", dur)
            + bytes(8)  # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)  # layer/group/volume/rsv
            + bytes(36)  # matrix
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _box(
            b"mdhd",
            struct.pack(">B3x", 0)
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _box(b"hdlr", bytes(8) + handler + bytes(12) + b"\x00")
        entry = _box(codec, bytes(70))  # opaque sample entry body
        stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + bytes(80),
    )
    traks = b""
    if video is not None:
        w, h, codec = video
        traks += track(b"vide", codec.encode(), w, h)
    if audio is not None:
        traks += track(b"soun", audio.encode())
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + _box(b"moov", mvhd + traks)
