"""Real GIF decode/encode kernels — pure Python/numpy, no codec libs.

Like :mod:`raybm25.extras.png`, this closes a compressed-format gap in
the multimodal surface with stdlib-only code: GIF's only nontrivial
piece is LZW, which is ~40 lines of public-spec bit twiddling
(GIF87a/GIF89a specification).  Covers global/local color tables,
interlaced images, multi-frame (animation) streams, and GCE
transparency; the decoder returns the first frame as RGB(A) plus a
frame count — the metadata a training-data pipeline wants from an
animation without materializing every frame.

The encoder is fixture-grade for round-trip tests: it emits a valid
LZW stream using the public "emit literal codes + periodic Clear"
technique (code width never grows past min_code_size+1), trading
compression for simplicity — decoders, including this one, accept it
bit-exactly.

Reference behavior: the loader treats attachments as opaque payloads
(``/root/reference/opensearch_loader/loader.py``); typed decode stages
are this engine's multimodal extension per the build brief.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(mcs: int, data: bytes, n_expected: int) -> np.ndarray:
    """Decode a GIF LZW code stream (min-code-size ``mcs``, concatenated
    sub-block payloads) into ``n_expected`` palette indices."""
    clear = 1 << mcs
    end = clear + 1
    # dictionary as (prefix_code, last_byte); roots are (-1, value)
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    for i in range(clear):
        suffix[i] = i
    next_code = end + 1
    width = mcs + 1

    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    bitbuf = 0
    nbits = 0
    prev = -1
    # scratch for expanding one code (max chain 4096)
    chain = np.empty(4096, dtype=np.uint8)

    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                next_code = end + 1
                width = mcs + 1
                prev = -1
                continue
            if code == end:
                return out[:n_out]
            if prev < 0:
                if code >= clear:
                    raise ValueError("GIF LZW: first code not a literal")
                out[n_out] = code
                n_out += 1
                prev = code
                continue
            if code < next_code:
                # expand code: walk the prefix chain (reversed)
                c = code
            elif code == next_code:
                c = prev  # KwKwK case: emit prev + first(prev)
            else:
                raise ValueError("GIF LZW: code out of range")
            n = 0
            while c >= 0:
                chain[n] = suffix[c]
                c = prefix[c]
                n += 1
            first = chain[n - 1]
            take = n
            if code == next_code:
                take = n + 1
            if n_out + take > n_expected:
                # tolerate trailing codes past the pixel count (some
                # encoders pad); stop at the expected pixel total
                take = n_expected - n_out
                if take <= 0:
                    return out
            rev = chain[:n][::-1]
            if code == next_code:
                out[n_out : n_out + min(take, n)] = rev[:take]
                if take == n + 1:
                    out[n_out + n] = first
            else:
                out[n_out : n_out + take] = rev[:take]
            n_out += take
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                if next_code < 4096 and next_code == (1 << width):
                    width += 1
            prev = code
            if n_out >= n_expected:
                return out
    return out[:n_out]


def _subblocks(buf: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``off``; returns
    (payload, offset_after_terminator)."""
    parts = []
    n = len(buf)
    while True:
        if off >= n:
            raise ValueError("truncated GIF sub-blocks")
        size = buf[off]
        off += 1
        if size == 0:
            return b"".join(parts), off
        parts.append(buf[off : off + size])
        off += size


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a GIF payload.

    Returns ``(first_frame, n_frames)`` where first_frame is
    (H, W, 3) uint8 RGB — or (H, W, 4) RGBA when the first frame's
    GCE declares a transparent index.  Later frames are counted, not
    materialized (animation frame extraction belongs in a sampling
    stage, not the metadata kernel).
    """
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    if len(buf) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    off = 13
    gct = None
    if packed & 0x80:
        gct_len = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, gct_len * 3, off).reshape(-1, 3)
        off += gct_len * 3

    first: np.ndarray | None = None
    n_frames = 0
    transparent = -1
    while off < len(buf):
        block = buf[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[off]
            off += 1
            payload, off = _subblocks(buf, off)
            if label == 0xF9 and n_frames == 0 and len(payload) >= 4:
                flags, _delay, tindex = struct.unpack_from("<BHB", payload, 0)
                if flags & 0x01:
                    transparent = tindex
            continue
        if block != 0x2C:  # image descriptor
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        ix, iy, iw, ih, ipack = struct.unpack_from("<HHHHB", buf, off)
        off += 9
        lct = gct
        if ipack & 0x80:
            lct_len = 2 << (ipack & 0x07)
            lct = np.frombuffer(buf, np.uint8, lct_len * 3, off).reshape(-1, 3)
            off += lct_len * 3
        mcs = buf[off]
        off += 1
        data, off = _subblocks(buf, off)
        n_frames += 1
        if first is not None:
            continue  # count remaining frames without decoding
        if lct is None:
            raise ValueError("GIF frame has no color table")
        idx = _lzw_decode(mcs, data, iw * ih)
        if idx.size != iw * ih:
            raise ValueError("GIF pixel data length mismatch")
        idx = idx.reshape(ih, iw)
        if ipack & 0x40:  # interlaced: rows arrive in 4-pass order
            rows = np.empty(ih, dtype=np.int64)
            i = 0
            for start, step in _DEINTERLACE:
                for y in range(start, ih, step):
                    rows[y] = i
                    i += 1
            idx = idx[rows]
        if idx.max(initial=0) >= len(lct):
            raise ValueError("GIF palette index out of range")
        frame = np.zeros((h, w, 3), dtype=np.uint8)
        frame[iy : iy + ih, ix : ix + iw] = lct[idx]
        if transparent >= 0:
            alpha = np.zeros((h, w, 1), dtype=np.uint8)
            alpha[iy : iy + ih, ix : ix + iw, 0] = np.where(
                idx == transparent, 0, 255
            )
            frame = np.concatenate([frame, alpha], axis=-1)
        first = frame
    if first is None:
        raise ValueError("GIF stream contains no image")
    return first, n_frames


def gif_meta(buf: bytes) -> tuple[int, int, int, float]:
    """(height, width, n_frames, grayscale mean of the first frame) —
    the multimodal metadata contract extended with the frame count."""
    frame, n_frames = decode_gif(buf)
    f = frame.astype(np.float64)
    gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return frame.shape[0], frame.shape[1], n_frames, float(gray.mean())


def _lzw_encode_literal(mcs: int, indices: np.ndarray) -> bytes:
    """Fixture-grade LZW stream: literal codes with a Clear before the
    table would grow the code width (public 'uncompressed GIF'
    technique — valid LZW, no compression)."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    # decoder's next_code grows by 1 per emitted data code; reset with
    # Clear while next_code still fits in mcs+1 bits
    budget = (1 << width) - end - 2
    count = 0
    for v in indices:
        if count >= budget:
            emit(clear)
            count = 0
        emit(int(v))
        count += 1
    emit(end)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    transparent: int = -1,
) -> bytes:
    """Encode palette-index frame(s) as a GIF89a.

    ``frames``: one (H, W) uint8 index array or a list of them (equal
    shapes — written as an animation); ``palette``: (N, 3) uint8.
    Fixture-grade: literal-code LZW, global color table only.
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    size_field = max(1, int(np.ceil(np.log2(max(n, 2)))))
    table_len = 1 << size_field
    full = np.zeros((table_len, 3), dtype=np.uint8)
    full[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field - 1), 0, 0)
    out += full.tobytes()
    mcs = max(2, size_field)
    if transparent >= 0:
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 0, transparent) + b"\x00"
    for frame in frames:
        assert frame.shape == (h, w)
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = frame
        if interlace:
            order = [
                y for start, step in _DEINTERLACE for y in range(start, h, step)
            ]
            idx = frame[np.array(order, dtype=np.int64)]
        out.append(mcs)
        stream = _lzw_encode_literal(mcs, idx.reshape(-1))
        for i in range(0, len(stream), 255):
            part = stream[i : i + 255]
            out.append(len(part))
            out += part
        out.append(0)
    out.append(0x3B)
    return bytes(out)
