"""Real baseline-JPEG decode/encode kernels — pure Python/numpy, no
codec libraries.

The last compressed image format the multimodal surface stubbed
(PNG/GIF/BMP/WAV already have real kernels).  Implemented from the
public JPEG specification (ITU-T T.81, baseline sequential DCT):
marker parsing, DQT/DHT/SOF0/SOS/DRI, Huffman-coded MCUs with byte
stuffing and restart markers, dequantize + dezigzag, 8x8 IDCT as a
single einsum over all blocks (the orthonormal DCT-II basis matrix),
chroma upsampling (4:4:4 / 4:2:2 / 4:2:0 and any h/v factor pair),
YCbCr->RGB.  Progressive (SOF2) and arithmetic coding raise
``ValueError`` — honest errors, no fake path.

The encoder is fixture-grade: baseline sequential, the spec's Annex K
example quantization tables (scaled by a quality factor) and Annex K
typical Huffman tables, 4:4:4 sampling.  JPEG is lossy, so round-trip
tests assert bounded error (tight for smooth content, exact DC for
flat blocks), plus bit-exact re-decode stability.

Reference behavior: the loader treats attachments as opaque payloads
(``/root/reference/opensearch_loader/loader.py``); typed decode stages
are this engine's multimodal extension per the build brief.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zig-zag order: ZIGZAG[i] = (row, col) of the i-th coefficient
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZZ = np.argsort(_ZZ)  # natural index -> zigzag position

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HT_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: M[u, x] = c(u) cos((2x+1)u pi / 16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial samples
    (still centered on 0; caller adds the +128 level shift)."""
    # spatial = M^T @ coef @ M, batched
    return np.einsum("ux,nuv,vy->nxy", _DCT_M, coef, _DCT_M, optimize=True)


def _dct_blocks(spatial: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _DCT_M, spatial, _DCT_M, optimize=True)


# ---------------------------------------------------------------- huffman


class _HuffTable:
    """Canonical Huffman per T.81 C.2: code lengths 1..16 + values."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.maxlen = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
                self.maxlen = length
            code <<= 1
        # encode map: value -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        for (length, code), v in self.lookup.items():
            self.enc[v] = (code, length)


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte unstuffing; stops at any real marker (0xFF xx, xx != 0)."""

    def __init__(self, buf: bytes, off: int):
        self.buf = buf
        self.off = off
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.off >= len(self.buf):
            return False
        b = self.buf[self.off]
        if b == 0xFF:
            nxt = self.buf[self.off + 1] if self.off + 1 < len(self.buf) else 0xD9
            if nxt == 0x00:
                self.off += 2
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return True
            # real marker: entropy segment over
            self.marker = nxt
            return False
        self.off += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # spec: pad with (implicit) 1s/0s at segment end
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")

    def align(self) -> None:
        self.nbits = 0

    def skip_rst(self) -> None:
        """Consume an RSTn marker at the current byte position."""
        self.align()
        if (
            self.off + 1 < len(self.buf)
            and self.buf[self.off] == 0xFF
            and 0xD0 <= self.buf[self.off + 1] <= 0xD7
        ):
            self.off += 2
            self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (H, W, 3) uint8 RGB (or (H, W, 1)
    grayscale for single-component streams)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (bad SOI)")
    off = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (h, w, comps) comps: list of (cid, hs, vs, tq)
    restart_interval = 0

    while off < len(buf):
        if buf[off] != 0xFF:
            off += 1
            continue
        marker = buf[off + 1]
        off += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if off + 2 > len(buf):
            raise ValueError("truncated JPEG marker segment")
        (seglen,) = struct.unpack_from(">H", buf, off)
        seg = buf[off + 2 : off + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                nat = np.empty(64, dtype=np.int64)
                nat[_ZZ] = tbl  # zigzag order -> natural order
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                nv = sum(bits)
                vals = list(seg[p : p + nv])
                p += nv
                t = _HuffTable(bits, vals)
                (huff_ac if tc else huff_dc)[th] = t
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline/ext seq
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG supported (progressive/"
                "arithmetic/hierarchical stream)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS -> entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scomp.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                buf,
                off + seglen,
                frame,
                scomp,
                qt,
                huff_dc,
                huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skip
        off += seglen
    raise ValueError("JPEG stream has no scan")


def _decode_scan(buf, off, frame, scomp, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component block grids (np arrays of dequantized coefficients)
    by_id = {c[0]: c for c in comps}
    order = []  # (comp_idx, blocks-per-mcu, ...) in scan order
    blocks: list[list] = []
    for ci, (cs, td, ta) in enumerate(scomp):
        cid, hs, vs, tq = by_id[cs]
        order.append((ci, cid, hs, vs, tq, td, ta))
        blocks.append([])

    reader = _BitReader(buf, off)
    pred = [0] * len(scomp)
    nmcu = mcux * mcuy
    for m in range(nmcu):
        if dri and m and m % dri == 0:
            reader.skip_rst()
            pred = [0] * len(scomp)
        for si, (ci, cid, hs, vs, tq, td, ta) in enumerate(order):
            for _ in range(hs * vs):
                coef = np.zeros(64, dtype=np.int64)
                t = reader.decode(huff_dc[td])
                diff = _extend(reader.read_bits(t), t)
                pred[si] += diff
                coef[0] = pred[si]
                k = 1
                while k < 64:
                    rs = reader.decode(huff_ac[ta])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC index overflow")
                    coef[k] = _extend(reader.read_bits(s), s)
                    k += 1
                blocks[si].append(coef)

    # dequantize + IDCT per component, assemble planes
    planes = []
    for si, (ci, cid, hs, vs, tq, td, ta) in enumerate(order):
        bw = mcux * hs  # blocks across
        bh = mcuy * vs
        arr = np.stack(blocks[si]) if blocks[si] else np.zeros((0, 64), np.int64)
        nat = np.empty_like(arr)
        nat[:, _ZZ] = arr  # zigzag stream order -> natural order
        deq = nat.reshape(-1, 8, 8) * qt[tq].reshape(1, 8, 8)
        spat = _idct_blocks(deq.astype(np.float64)) + 128.0
        # blocks arrive MCU-major: for each MCU, vs rows x hs cols
        plane = np.zeros((bh * 8, bw * 8))
        bi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(vs):
                    for u in range(hs):
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = spat[bi]
                        bi += 1
        # upsample to full resolution
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, 0), hmax // hs, 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[..., None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_meta(buf: bytes) -> tuple[int, int, float]:
    """(height, width, grayscale mean) — the ImageDecodeStage metadata
    contract, from a real decode (ITU-R 601 luma)."""
    px = decode_jpeg(buf)
    f = px.astype(np.float64)
    if px.shape[-1] >= 3:
        gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    else:
        gray = f[..., 0]
    return px.shape[0], px.shape[1], float(gray.mean()) if gray.size else 0.0


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.bitbuf = (self.bitbuf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.bitbuf)
                if self.bitbuf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.bitbuf = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:  # pad with 1s per spec
            self.write(1, 1)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling of a base table (public formula)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * s + 50) // 100
    return np.clip(t, 1, 255)


def _mag_cat(v: int) -> int:
    """Magnitude category: smallest t with |v| < 2^t."""
    return int(abs(v)).bit_length()


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W, 3) RGB or (H, W)/(H, W, 1) grayscale uint8 as a
    baseline JPEG (Annex K tables scaled by ``quality``; ``"444"`` or
    ``"420"`` chroma subsampling; optional DRI restart markers every
    ``restart_interval`` MCUs).  Fixture-grade: correctness over
    compression."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray_in = arr.ndim == 2 or arr.shape[-1] == 1
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w = arr.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = subsampling == "420" and not gray_in

    if gray_in:
        planes = [arr[..., 0].astype(np.float64)]
    else:
        f = arr.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub:
            # 2x2 mean chroma downsample (pad odd dims by edge first)
            def down(p):
                ph = p if h % 2 == 0 else np.vstack([p, p[-1:]])
                ph = ph if w % 2 == 0 else np.hstack([ph, ph[:, -1:]])
                return (
                    ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )

            planes = [y, down(cb), down(cr)]
        else:
            planes = [y, cb, cr]

    ql = _quality_scale(_QL, quality).reshape(8, 8)
    qc = _quality_scale(_QC, quality).reshape(8, 8)
    qtabs = [ql] + ([qc, qc] if not gray_in else [])

    dc_tabs = [_HuffTable(*_HT_DC_L)] + (
        [_HuffTable(*_HT_DC_C)] * 2 if not gray_in else []
    )
    ac_tabs = [_HuffTable(*_HT_AC_L)] + (
        [_HuffTable(*_HT_AC_C)] * 2 if not gray_in else []
    )

    nc = 1 if gray_in else 3
    # sampling factors per component and MCU grid
    if sub:
        samp = [(2, 2), (1, 1), (1, 1)]
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    else:
        samp = [(1, 1)] * nc
        mcux, mcuy = (w + 7) // 8, (h + 7) // 8

    # per-plane quantized coefficient block GRIDS (bh, bw, 64 natural)
    plane_grids = []
    for (hs, vs), plane, q in zip(samp, planes, qtabs):
        gw, gh = mcux * hs, mcuy * vs  # blocks across / down
        ph, pw = plane.shape
        padded = np.empty((gh * 8, gw * 8))
        padded[:ph, :pw] = plane
        padded[ph:, :pw] = plane[-1:, :]  # edge-replicate padding
        padded[:, pw:] = padded[:, pw - 1 : pw]
        blocks = (
            padded.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coef = _dct_blocks(blocks - 128.0)
        quant = np.round(coef / q.reshape(1, 8, 8)).astype(np.int64)
        plane_grids.append(quant.reshape(gh, gw, 64))

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    # DQT — wire format is zigzag order: wire[i] = natural[_ZZ[i]]
    dqt = bytearray([0x00]) + bytes(ql.reshape(64)[_ZZ].astype(np.uint8))
    if not gray_in:
        dqt += bytes([0x01]) + bytes(qc.reshape(64)[_ZZ].astype(np.uint8))
    seg(0xDB, bytes(dqt))
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += struct.pack(">BBB", ci + 1, hs << 4 | vs, 0 if ci == 0 else 1)
    seg(0xC0, sof)
    # DHT
    def dht(tc: int, th: int, tbl: tuple) -> bytes:
        bits, vals = tbl
        return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)

    dht_all = dht(0, 0, _HT_DC_L) + dht(1, 0, _HT_AC_L)
    if not gray_in:
        dht_all += dht(0, 1, _HT_DC_C) + dht(1, 1, _HT_AC_C)
    seg(0xC4, dht_all)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    wtr = _BitWriter()
    pred = [0] * nc

    def emit_block(ci: int, coef_nat: np.ndarray) -> None:
        coef = coef_nat[_ZZ]  # natural -> zigzag order
        dct, act = dc_tabs[ci], ac_tabs[ci]
        diff = int(coef[0]) - pred[ci]
        pred[ci] = int(coef[0])
        t = _mag_cat(diff)
        code, ln = dct.enc[t]
        wtr.write(code, ln)
        if t:
            v = diff if diff >= 0 else diff + (1 << t) - 1
            wtr.write(v, t)
        run = 0
        nz = np.flatnonzero(coef[1:])
        last_nz = int(nz[-1]) + 1 if nz.size else 0
        for k in range(1, last_nz + 1):
            v = int(coef[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act.enc[0xF0]  # ZRL
                wtr.write(code, ln)
                run -= 16
            s = _mag_cat(v)
            code, ln = act.enc[(run << 4) | s]
            wtr.write(code, ln)
            vv = v if v >= 0 else v + (1 << s) - 1
            wtr.write(vv, s)
            run = 0
        if last_nz < 63:
            code, ln = act.enc[0x00]  # EOB
            wtr.write(code, ln)

    m = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and m and m % restart_interval == 0:
                wtr.flush()
                out.extend(wtr.out)
                wtr.out = bytearray()
                out.extend(bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]))
                for ci in range(nc):
                    pred[ci] = 0
            for ci in range(nc):
                hs, vs = samp[ci]
                for v in range(vs):
                    for u in range(hs):
                        emit_block(ci, plane_grids[ci][my * vs + v, mx * hs + u])
            m += 1
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
