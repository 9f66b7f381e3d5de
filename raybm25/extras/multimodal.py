"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The decode / feature-extract kernels need codec libraries
that are NOT in this container, so the decode step is STUBBED behind
an import-try (clearly marked); the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested with a
deterministic fake decoder.
"""

from __future__ import annotations

import zlib

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

    With a real codec library present this would decode the image; in
    this container it falls back to a DETERMINISTIC FAKE decode (first
    4 bytes -> h/w, zlib.crc32-seeded mean) so the distributed plumbing
    stays exercised end-to-end. Small batches: payloads are large, so
    batch_size x concurrency must fit worker heaps."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.has_real = _try_real_decoder()
        if strict and not self.has_real:
            raise NotImplementedError(
                "real image decode requires an image codec library (not in container); "
                "run with strict=False for the deterministic fake decoder"
            )

    def _fake_decode(self, buf: bytes) -> tuple[int, int, float]:
        h = 1 + (buf[0] if buf else 0)
        w = 1 + (buf[1] if len(buf) > 1 else 0)
        mean = (zlib.crc32(buf) % 256_000) / 1000.0
        return h, w, mean

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        metas = []
        for buf in payloads:
            buf = buf or b""
            h, w, m = self._fake_decode(buf)  # real path would branch here
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
