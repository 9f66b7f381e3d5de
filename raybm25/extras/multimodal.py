"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. REAL decode kernels (no codec libraries needed): WAV/PCM
audio (stdlib ``wave``), uncompressed 24-bit BMP (``struct`` + numpy),
PNG (stdlib ``zlib`` DEFLATE + numpy unfiltering, full spec layout
coverage — :mod:`raybm25.extras.png`), GIF (pure-Python LZW,
interlace + animation + transparency — :mod:`raybm25.extras.gif`),
and baseline JPEG (pure Huffman + einsum IDCT, 4:2:0/4:2:2/4:4:4,
restart markers — :mod:`raybm25.extras.jpeg`);
``AnyImageDecodeStage`` sniffs magic bytes and routes a mixed corpus
to the right kernel.  Compressed audio/video METADATA is also real:
MPEG-audio frame walk (:mod:`raybm25.extras.mp3` — exact frame
count / duration / bitrate / VBR) and ISO-BMFF box walk
(:mod:`raybm25.extras.mp4` — brand / duration / per-track
handler / codec / resolution).  Only SAMPLE decode for those formats
(PCM synthesis, video frames) genuinely needs external codecs and
stays STUBBED behind an import-try (clearly marked); its Ray-side
plumbing — schema, actor signature, batch sizing, output layout —
is real and tested with a deterministic fake decoder.
"""

from __future__ import annotations

import zlib
from struct import error as struct_error

import numpy as np
import pyarrow as pa

PAYLOAD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)

META_TYPE = pa.struct(
    [("height", pa.int32()), ("width", pa.int32()), ("mean_byte", pa.float64())]
)


def _try_real_decoder():
    try:  # pragma: no cover - codec libs absent in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


class ImageDecodeStage:
    """Actor-pool stage: binary payload -> (height, width, mean_byte).

    The PIL-seam stage: with a codec library present (strict=True) it
    decodes through PIL; in this container it falls back to a
    DETERMINISTIC FAKE decode (first 4 bytes -> h/w, zlib.crc32-seeded
    mean) so the distributed plumbing stays exercised end-to-end.
    For PNG/GIF/JPEG/BMP payloads prefer :class:`AnyImageDecodeStage`
    below — its stdlib kernels need no codec library at all.  Small
    batches: payloads are large, so batch_size x concurrency must fit
    worker heaps."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.has_real = _try_real_decoder()
        if strict and not self.has_real:
            raise NotImplementedError(
                "real image decode requires an image codec library (not in container); "
                "run with strict=False for the deterministic fake decoder"
            )
        # strict=True selects the REAL kernel (payloads must be actual
        # images); strict=False keeps the deterministic fake so
        # codec-independent pipelines (and their oracles) are stable
        # even in a codec-equipped environment
        self.use_real = strict and self.has_real

    def _fake_decode(self, buf: bytes) -> tuple[int, int, float]:
        h = 1 + (buf[0] if buf else 0)
        w = 1 + (buf[1] if len(buf) > 1 else 0)
        mean = (zlib.crc32(buf) % 256_000) / 1000.0
        return h, w, mean

    def _real_decode(self, buf: bytes) -> tuple[int, int, float]:
        """PIL decode — reachable only when the codec lib imports
        (opt-in integration test test_image_decode_real_kernel; skips
        in this container). Zero code change needed the day codec libs
        exist: the branch below picks this automatically."""
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(buf))
        gray = img.convert("L")
        arr = np.asarray(gray, dtype=np.float64)
        return img.height, img.width, float(arr.mean()) if arr.size else 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        decode = self._real_decode if self.use_real else self._fake_decode
        metas = []
        for buf in payloads:
            buf = buf or b""
            h, w, m = decode(buf)
            metas.append({"height": h, "width": w, "mean_byte": m})
        out = batch.drop_columns([self.payload_col])
        return out.append_column("meta", pa.array(metas, META_TYPE))


class PayloadStats:
    """Actor-pool stage: byte length + crc32 per payload (cheap typed
    metadata that IS computable without codec libs)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        n_bytes = [len(b) if b is not None else 0 for b in payloads]
        crc = [zlib.crc32(b or b"") for b in payloads]
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("n_bytes", pa.array(n_bytes, pa.int64()))
        return out.append_column("crc32", pa.array(np.array(crc, dtype=np.int64), pa.int64()))


def documents_as_payloads(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adapter: treat document text bytes as an opaque media payload
    (the container has no real media; the plumbing is the product)."""
    texts = batch.column(text_col).to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "payload": pa.array(
                [t.encode("utf-8") if isinstance(t, str) else b"" for t in texts],
                pa.binary(),
            ),
            "media_type": pa.array(["text/plain"] * len(texts), pa.string()),
        }
    )


class ResizeStage:
    """Actor-pool stage: payload -> resized payload + updated meta.

    Real path would decode, resample to (target_h, target_w) and
    re-encode; the container has no codec libs, so the DETERMINISTIC
    FAKE keeps the plumbing honest: the "resized" payload is a strided
    byte sample whose length scales with the target area, and the meta
    struct carries the new dimensions. Large-payload guidance applies:
    keep batch_size small so batch x concurrency fits worker heaps."""

    def __init__(
        self,
        target_h: int = 64,
        target_w: int = 64,
        payload_col: str = "payload",
        strict: bool = False,
    ):
        self.target_h = target_h
        self.target_w = target_w
        self.payload_col = payload_col
        self.has_real = _try_real_decoder()
        if strict and not self.has_real:
            raise NotImplementedError(
                "real resize requires an image codec library (not in container); "
                "run with strict=False for the deterministic fake"
            )

    def _fake_resize(self, buf: bytes) -> bytes:
        want = max(1, self.target_h * self.target_w // 64)
        if not buf:
            return b"\0" * want
        stride = max(1, len(buf) // want)
        return bytes(buf[::stride][:want])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        resized = [self._fake_resize(b or b"") for b in payloads]
        metas = [
            {"height": self.target_h, "width": self.target_w,
             "mean_byte": (sum(r) / len(r)) if r else 0.0}
            for r in resized
        ]
        out = batch.drop_columns([self.payload_col])
        out = out.append_column(self.payload_col, pa.array(resized, pa.binary()))
        return out.append_column("meta", pa.array(metas, META_TYPE))


class FrameSampleStage:
    """Actor-pool stage: video payload -> every-Nth-frame payload rows
    (flat_map shape: one input row expands to ``max_frames`` rows).

    The fake treats the payload as fixed-size frame records
    (``frame_bytes`` each) and emits every ``step``-th record — the
    real decoder would seek keyframes. Output schema: (doc_id,
    frame_idx, payload, media_type)."""

    def __init__(
        self,
        step: int = 10,
        max_frames: int = 4,
        frame_bytes: int = 256,
        payload_col: str = "payload",
    ):
        self.step = step
        self.max_frames = max_frames
        self.frame_bytes = frame_bytes
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        out_doc, out_idx, out_payload = [], [], []
        for did, buf in zip(doc_ids, payloads):
            buf = buf or b""
            n_frames = max(1, len(buf) // self.frame_bytes)
            taken = 0
            for fi in range(0, n_frames, self.step):
                if taken >= self.max_frames:
                    break
                s = fi * self.frame_bytes
                out_doc.append(did)
                out_idx.append(fi)
                out_payload.append(bytes(buf[s : s + self.frame_bytes]))
                taken += 1
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "payload": pa.array(out_payload, pa.binary()),
                "media_type": pa.array(["video/frame"] * len(out_doc), pa.string()),
            }
        )


class FakeEmbedStage:
    """Actor-pool stage: batched "model inference" — text -> unit
    vector. A real model load belongs in __init__ (once per actor) and
    inference in __call__ (per batch); with no model libs in the
    container, a deterministic hash-seeded projection stands in, so the
    batched-inference plumbing (batch sizing, actor reuse, list<float>
    output schema) is real and feeds the similarity/ANN operators."""

    def __init__(self, dim: int = 16, text_col: str = "text", seed: int = 13):
        self.dim = dim
        self.text_col = text_col
        # "model load": the projection matrix, built once per actor
        rng = np.random.default_rng(seed)
        self.proj = rng.normal(size=(64, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..analysis import TOKEN_RE
        from ..hashing import hash64

        texts = batch.column(self.text_col).to_pylist()
        vecs = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = TOKEN_RE.findall(t.lower()) if isinstance(t, str) else []
            if not toks:
                continue
            h = hash64(np.array(sorted(set(toks)), dtype=object))
            feats = np.zeros(64)
            np.add.at(feats, (h % 64).astype(np.int64), 1.0)
            vecs[i] = feats @ self.proj
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        out = batch.drop_columns([self.text_col])
        dim = self.dim
        offsets = np.arange(0, (len(texts) + 1) * dim, dim, dtype=np.int64)
        return out.append_column(
            "embedding",
            pa.LargeListArray.from_arrays(offsets, pa.array(vecs.ravel(), pa.float64())),
        )


class WavDecodeStage:
    """Actor-pool stage with a REAL audio decode kernel: WAV/PCM parses
    with the stdlib ``wave`` module (no external codec libs needed), so
    unlike the image path this one is NOT stubbed. Per payload:
    (n_channels, sample_rate, n_frames, duration_s, rms) — rms over
    int16 PCM computed vectorized in numpy. Compressed audio (mp3/ogg)
    would still need codec libs; WAV is the honest real-kernel subset
    this container supports. Small batches: payloads are large."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def _decode(self, buf: bytes) -> tuple[int, int, int, float, float]:
        import io
        import wave

        with wave.open(io.BytesIO(buf), "rb") as w:
            nch = w.getnchannels()
            rate = w.getframerate()
            nfr = w.getnframes()
            width = w.getsampwidth()
            pcm = w.readframes(nfr)
        if width == 2:
            arr = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
        elif width == 1:
            arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0
        else:
            raise ValueError(f"unsupported WAV sample width {width}")
        rms = float(np.sqrt(np.mean(arr * arr))) if arr.size else 0.0
        return nch, rate, nfr, nfr / rate if rate else 0.0, rms

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._decode(b.as_py()) for b in batch.column(self.payload_col)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_channels": pa.array([r[0] for r in rows], pa.int32()),
                "sample_rate": pa.array([r[1] for r in rows], pa.int32()),
                "n_frames": pa.array([r[2] for r in rows], pa.int64()),
                "duration_s": pa.array([r[3] for r in rows], pa.float64()),
                "rms": pa.array([r[4] for r in rows], pa.float64()),
            }
        )


class BmpDecodeStage:
    """Actor-pool stage with a REAL image decode kernel for
    uncompressed 24-bit BMP (the format needs only ``struct`` header
    parsing + one numpy reshape — no codec library). Emits the same
    (height, width, mean_byte) metadata struct as ``ImageDecodeStage``
    so downstream stages are interchangeable; mean_byte is the
    grayscale mean (ITU-R 601 luma over the BGR pixel array).
    Compressed formats (PNG/JPEG) still require codec libs and stay
    behind the ImageDecodeStage seam."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def _decode(self, buf: bytes) -> tuple[int, int, float]:
        import struct

        if buf[:2] != b"BM":
            raise ValueError("not a BMP payload")
        off = struct.unpack_from("<I", buf, 10)[0]
        w, h = struct.unpack_from("<ii", buf, 18)
        planes, bpp = struct.unpack_from("<HH", buf, 26)
        comp = struct.unpack_from("<I", buf, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        raw = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
        px = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if flip:
            px = px[::-1]
        b, g, r = (px[..., i].astype(np.float64) for i in range(3))
        gray = 0.299 * r + 0.587 * g + 0.114 * b
        return h, w, float(gray.mean())

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._decode(b.as_py()) for b in batch.column(self.payload_col)]
        meta = pa.array(
            [{"height": h, "width": w, "mean_byte": m} for h, w, m in rows],
            META_TYPE,
        )
        return pa.table({"doc_id": batch.column("doc_id"), "meta": meta})

class PngDecodeStage:
    """Actor-pool stage with a REAL image decode kernel for PNG —
    stdlib ``zlib`` DEFLATE + numpy scanline unfiltering, no codec
    library (see :mod:`raybm25.extras.png`).  Covers 8-bit grey /
    RGB / palette / alpha, all five filter types; interlaced or
    16-bit streams raise instead of faking.  Emits the same
    (height, width, mean_byte) metadata struct as ``ImageDecodeStage``
    / ``BmpDecodeStage`` so downstream stages are interchangeable.
    Small batches: payloads are large."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .png import png_meta

        rows = [png_meta(b.as_py()) for b in batch.column(self.payload_col)]
        meta = pa.array(
            [{"height": h, "width": w, "mean_byte": m} for h, w, m in rows],
            META_TYPE,
        )
        return pa.table({"doc_id": batch.column("doc_id"), "meta": meta})


class GifDecodeStage:
    """Actor-pool stage with a REAL image decode kernel for GIF —
    pure-Python LZW + numpy palette resolve, no codec library (see
    :mod:`raybm25.extras.gif`).  Handles global/local color tables,
    interlace, GCE transparency, and multi-frame streams (first frame
    decoded, all frames counted).  Output adds ``n_frames`` next to the
    shared metadata struct.  Small batches: payloads are large."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .gif import gif_meta

        rows = [gif_meta(b.as_py()) for b in batch.column(self.payload_col)]
        meta = pa.array(
            [{"height": h, "width": w, "mean_byte": m} for h, w, _, m in rows],
            META_TYPE,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "meta": meta,
                "n_frames": pa.array([r[2] for r in rows], pa.int32()),
            }
        )


class JpegDecodeStage:
    """Actor-pool stage with a REAL image decode kernel for baseline
    JPEG — pure Python/numpy Huffman + einsum IDCT, no codec library
    (see :mod:`raybm25.extras.jpeg`).  Handles 4:4:4/4:2:2/4:2:0
    subsampling, restart markers, grayscale and YCbCr color;
    progressive streams raise instead of faking.  Emits the shared
    (height, width, mean_byte) metadata struct.  Small batches:
    payloads are large and entropy decode is the slow real work."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import jpeg_meta

        rows = [jpeg_meta(b.as_py()) for b in batch.column(self.payload_col)]
        meta = pa.array(
            [{"height": h, "width": w, "mean_byte": m} for h, w, m in rows],
            META_TYPE,
        )
        return pa.table({"doc_id": batch.column("doc_id"), "meta": meta})


def sniff_image_meta(buf: bytes) -> tuple[str, int, int, float]:
    """Route a payload to the right REAL kernel by magic bytes:
    (format, height, width, mean_byte).  Raises ValueError for
    formats with no kernel (the caller decides whether that is an
    error or a skip)."""
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import png_meta

        return ("png", *png_meta(buf))
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_meta

        h, w, _n, m = gif_meta(buf)
        return ("gif", h, w, m)
    if buf[:2] == b"\xff\xd8":
        from .jpeg import jpeg_meta

        return ("jpeg", *jpeg_meta(buf))
    if buf[:2] == b"BM":
        h, w, m = BmpDecodeStage()._decode(buf)
        return ("bmp", h, w, m)
    raise ValueError("unrecognized image payload (no real kernel)")


class AnyImageDecodeStage:
    """Actor-pool stage for a MIXED image corpus: sniffs each payload's
    magic bytes and dispatches to the matching real kernel
    (PNG/GIF/JPEG/BMP).  Unrecognized payloads either raise
    (``strict=True``) or pass through with format ``"unknown"`` and
    null metadata — the skip-don't-crash behavior a 100 TB crawl
    pipeline needs, with the skip visible in the output for auditing."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts: list[str] = []
        metas: list[dict | None] = []
        for b in batch.column(self.payload_col):
            buf = b.as_py() or b""
            try:
                fmt, h, w, m = sniff_image_meta(buf)
                fmts.append(fmt)
                metas.append({"height": h, "width": w, "mean_byte": m})
            except ValueError:
                if self.strict:
                    raise
                fmts.append("unknown")
                metas.append(None)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "format": pa.array(fmts, pa.string()),
                "meta": pa.array(metas, META_TYPE),
            }
        )


class ReencodeResizeStage:
    """Actor-pool stage with a REAL resize path: sniff-decode the
    payload with the stdlib kernels (PNG/GIF/JPEG/BMP), nearest-
    neighbor resample to (target_h, target_w) in numpy, re-encode as
    PNG (the lossless kernel — re-encoding resized thumbnails as JPEG
    would stack quantization loss).  Output: (doc_id, payload,
    media_type="image/png", meta).  Unrecognized payloads pass through
    unresized with format preserved unless ``strict``."""

    def __init__(
        self,
        target_h: int = 64,
        target_w: int = 64,
        payload_col: str = "payload",
        strict: bool = False,
    ):
        self.target_h = target_h
        self.target_w = target_w
        self.payload_col = payload_col
        self.strict = strict

    def _decode(self, buf: bytes) -> np.ndarray | None:
        if buf[:8] == b"\x89PNG\r\n\x1a\n":
            from .png import decode_png

            px = decode_png(buf)
            if px.dtype == np.uint16:
                px = (px // 257).astype(np.uint8)
            return px
        if buf[:6] in (b"GIF87a", b"GIF89a"):
            from .gif import decode_gif

            return decode_gif(buf)[0]
        if buf[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            return decode_jpeg(buf)
        if buf[:2] == b"BM":
            # BmpDecodeStage only extracts metadata; decode inline
            import struct as _s

            off = _s.unpack_from("<I", buf, 10)[0]
            w, h = _s.unpack_from("<ii", buf, 18)
            bpp = _s.unpack_from("<HH", buf, 26)[1]
            if bpp != 24:
                return None
            flip = h > 0
            h = abs(h)
            stride = (w * 3 + 3) & ~3
            raw = np.frombuffer(buf, np.uint8, h * stride, off)
            px = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            if flip:
                px = px[::-1]
            return px[..., ::-1]  # BGR -> RGB
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .png import encode_png

        th, tw = self.target_h, self.target_w
        payloads = []
        media = []
        metas = []
        for b in batch.column(self.payload_col):
            buf = b.as_py() or b""
            px = self._decode(buf)
            if px is None:
                if self.strict:
                    raise ValueError("unrecognized image payload (no real kernel)")
                payloads.append(buf)
                media.append("application/octet-stream")
                metas.append(None)
                continue
            h, w = px.shape[:2]
            ys = (np.arange(th) * h // th).clip(0, h - 1)
            xs = (np.arange(tw) * w // tw).clip(0, w - 1)
            small = px[ys][:, xs]
            f = small.astype(np.float64)
            gray = (
                0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
                if small.shape[-1] >= 3
                else f[..., 0]
            )
            payloads.append(encode_png(small, filter_type=1))
            media.append("image/png")
            metas.append(
                {"height": th, "width": tw, "mean_byte": float(gray.mean())}
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(media, pa.string()),
                "meta": pa.array(metas, META_TYPE),
            }
        )


class Mp3MetaStage:
    """Actor-pool stage with a REAL MPEG-audio METADATA kernel
    (:mod:`raybm25.extras.mp3`): exact frame walk -> version / layer /
    sample_rate / n_frames / duration / mean bitrate / VBR flag, no
    codec library and no PCM decode (which genuinely needs one and
    stays behind the seam). Unparseable payloads raise with
    ``strict=True``, else emit nulls with ``format="unknown"`` — the
    skip-don't-crash contract of ``AnyImageDecodeStage``."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .mp3 import mp3_meta

        rows: list[dict | None] = []
        for b in batch.column(self.payload_col):
            try:
                rows.append(mp3_meta(b.as_py() or b""))
            except ValueError:
                if self.strict:
                    raise
                rows.append(None)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "format": pa.array(
                    ["mp3" if r else "unknown" for r in rows], pa.string()
                ),
                "sample_rate": pa.array(
                    [r["sample_rate"] if r else None for r in rows], pa.int32()
                ),
                "n_frames": pa.array(
                    [r["n_frames"] if r else None for r in rows], pa.int64()
                ),
                "duration_s": pa.array(
                    [r["duration_s"] if r else None for r in rows], pa.float64()
                ),
                "avg_bitrate_kbps": pa.array(
                    [r["avg_bitrate_kbps"] if r else None for r in rows],
                    pa.float64(),
                ),
                "is_vbr": pa.array(
                    [r["is_vbr"] if r else None for r in rows], pa.bool_()
                ),
            }
        )


class Mp4MetaStage:
    """Actor-pool stage with a REAL ISO-BMFF METADATA kernel
    (:mod:`raybm25.extras.mp4`): box-tree walk -> brand, movie
    duration, track counts and the primary video/audio triage columns
    (codec fourcc, resolution). Output is flat scalar columns (Arrow-
    and pandas-friendly); callers needing the full per-track list use
    ``mp4.mp4_meta`` directly. Sample data is never touched — frame
    decode genuinely needs codec libraries and stays behind the seam.
    Same strict/skip contract as :class:`Mp3MetaStage`."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .mp4 import mp4_meta

        rows: list[dict | None] = []
        for b in batch.column(self.payload_col):
            try:
                rows.append(mp4_meta(b.as_py() or b""))
            except (ValueError, struct_error):
                if self.strict:
                    raise
                rows.append(None)

        def _primary(r: dict | None, handler: str) -> dict | None:
            if not r:
                return None
            for t in r["tracks"]:
                if t["handler"] == handler:
                    return t
            return None

        vids = [_primary(r, "vide") for r in rows]
        auds = [_primary(r, "soun") for r in rows]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "format": pa.array(
                    ["mp4" if r else "unknown" for r in rows], pa.string()
                ),
                "brand": pa.array(
                    [r["brand"] if r else None for r in rows], pa.string()
                ),
                "duration_s": pa.array(
                    [r["duration_s"] if r else None for r in rows], pa.float64()
                ),
                "n_tracks": pa.array(
                    [r["n_tracks"] if r else None for r in rows], pa.int32()
                ),
                "video_codec": pa.array(
                    [v["codec"] if v else None for v in vids], pa.string()
                ),
                "width": pa.array(
                    [v["width"] if v else None for v in vids], pa.int32()
                ),
                "height": pa.array(
                    [v["height"] if v else None for v in vids], pa.int32()
                ),
                "audio_codec": pa.array(
                    [a["codec"] if a else None for a in auds], pa.string()
                ),
            }
        )
