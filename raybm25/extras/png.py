"""Real PNG decode/encode kernels — stdlib ``zlib`` + ``struct`` and
numpy only, no codec libraries.

Round-4 left compressed-image formats behind the PIL import seam
(``multimodal.ImageDecodeStage``); PNG needs nothing the container
lacks — DEFLATE is stdlib ``zlib`` and the five scanline filters are
pure arithmetic — so this module makes the most common lossless web
format a REAL kernel, like WAV/BMP before it.  Implemented from the
public PNG specification (RFC 2083 / W3C PNG): 8-bit greyscale,
truecolor, palette, and each with alpha; all five filter types; Adam7
interlace is rejected with a clear error rather than faked.

The encoder exists for test fixtures (round-trip: encode with a chosen
per-row filter, decode, compare arrays) and writes only non-interlaced
8-bit images.

Reference behavior being re-expressed: the loader treats attachments as
opaque payloads (see ``/root/reference/opensearch_loader/loader.py``
document handling); this engine's multimodal surface adds typed decode
stages on top, per the build brief.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(buf: bytes):
    """Yield (type, data) for each chunk, verifying lengths and CRCs."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    off = 8
    n = len(buf)
    while off + 8 <= n:
        (length,), ctype = struct.unpack_from(">I", buf, off), buf[off + 4 : off + 8]
        data_off = off + 8
        crc_off = data_off + length
        if crc_off + 4 > n:
            raise ValueError("truncated PNG chunk")
        data = buf[data_off:crc_off]
        (crc,) = struct.unpack_from(">I", buf, crc_off)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        off = crc_off + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering: raw is the decompressed IDAT
    stream reshaped to (h, 1+stride); returns (h, stride) uint8.

    Filters None/Sub/Up are vectorized whole-row (Sub is a mod-256
    prefix sum over bpp-strided lanes — uint8 cumsum wraps exactly);
    Average/Paeth depend on the left-reconstructed pixel so they walk x
    sequentially but stay vectorized across the bpp channel lanes.
    """
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    npx = stride // bpp
    for y in range(h):
        ftype = int(raw[y, 0])
        row = raw[y, 1:].copy()
        if ftype == 0:  # None
            rec = row
        elif ftype == 1:  # Sub: prefix sum along x per channel lane
            rec = np.cumsum(row.reshape(npx, bpp), axis=0, dtype=np.uint8).reshape(
                stride
            )
        elif ftype == 2:  # Up
            rec = row + prev
        elif ftype == 3:  # Average
            rec = row.reshape(npx, bpp)
            up = prev.reshape(npx, bpp).astype(np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(npx):
                rec[x] = (rec[x] + ((left + up[x]) >> 1)).astype(np.uint8)
                left = rec[x].astype(np.int32)
            rec = rec.reshape(stride)
        elif ftype == 4:  # Paeth
            rec = row.reshape(npx, bpp)
            up = prev.reshape(npx, bpp).astype(np.int32)
            a = np.zeros(bpp, dtype=np.int32)  # left
            c = np.zeros(bpp, dtype=np.int32)  # upper-left
            for x in range(npx):
                b = up[x]
                p = a + b - c
                pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c)
                )
                rec[x] = (rec[x] + pred).astype(np.uint8)
                a, c = rec[x].astype(np.int32), b
            rec = rec.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG payload to a (H, W, C) uint8 array.

    C is 1 (grey), 2 (grey+alpha), 3 (RGB — truecolor or palette), or
    4 (RGBA).  Supports bit depth 8 and non-interlaced streams; other
    layouts raise ``ValueError`` (honest errors, no fake path).
    """
    ihdr = None
    plte = None
    idat: list[bytes] = []
    for ctype, data in _chunks(buf):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported by this kernel")
    if depth != 8 or ctype_ not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG layout (bit depth {depth}, color type {ctype_}); "
            "this kernel decodes 8-bit types 0/2/3/4/6"
        )
    ch = _CHANNELS[ctype_]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    px = _unfilter(rows, h, stride, ch).reshape(h, w, ch)
    if ctype_ == 3:  # palette indices -> RGB
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        px = plte[px[..., 0]]
    return px


def png_meta(buf: bytes) -> tuple[int, int, float]:
    """(height, width, grayscale mean) — the ImageDecodeStage metadata
    contract, from a real decode (ITU-R 601 luma for color images)."""
    px = decode_png(buf)
    h, w, ch = px.shape
    f = px.astype(np.float64)
    if ch >= 3:
        gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    else:
        gray = f[..., 0]
    return h, w, float(gray.mean()) if gray.size else 0.0


def _encode_filtered(px: np.ndarray, filter_type: int, bpp: int) -> bytes:
    """Apply one filter type to every scanline (encoder side)."""
    h, stride = px.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        rec = px[y].astype(np.int32)
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), rec[:-bpp]])
        up = prev
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if filter_type == 0:
            filt = rec
        elif filter_type == 1:
            filt = rec - left
        elif filter_type == 2:
            filt = rec - up
        elif filter_type == 3:
            filt = rec - ((left + up) >> 1)
        elif filter_type == 4:
            p = left + up - upleft
            pa_, pb_, pc_ = (
                np.abs(p - left),
                np.abs(p - up),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, up, upleft)
            )
            filt = rec - pred
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        out.append(filter_type)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = rec
    return bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (H, W) or (H, W, C) uint8 array as a non-interlaced
    8-bit PNG, applying ``filter_type`` (0-4) to every scanline.

    Fixture-grade encoder: correctness (round-trips through
    ``decode_png`` bit-exactly) over compression ratio.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, ch = arr.shape
    ctype_ = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype_ is None:
        raise ValueError(f"cannot encode {ch}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_, 0, 0, 0)
    body = _encode_filtered(arr.reshape(h, w * ch), filter_type, ch)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body, 6))
        + _chunk(b"IEND", b"")
    )
