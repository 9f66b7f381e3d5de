"""MP3 (MPEG audio) METADATA parser — stdlib only.

Walks the frame-header stream of an MPEG-1/2/2.5 Layer I/II/III file
(ISO/IEC 11172-3 / 13818-3 header layout, public spec): skips an
ID3v2 prefix, syncs on 0xFFE, reads per-frame version / layer /
bitrate / sample-rate / padding, computes each frame's byte length
and sample count, and steps frame to frame. This yields EXACT frame
counts and duration for CBR and VBR streams alike without decoding
any audio — the triage signal (duration, rate, bitrate profile) a
100 TB crawl pipeline filters on before paying for real decode.
PCM synthesis genuinely needs a codec library and stays out of scope
(see extras/multimodal.py's seam notes).

Parity note vs the reference: the reference delegates all media
handling; this module exists for the training-data surface, not
reference parity.
"""

from __future__ import annotations

# bitrate kbps tables, index 1-14 (0 = free, 15 = bad)
_BITRATES = {
    # (version_group, layer): [kbps...]
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_SAMPLE_RATES = {
    "1": [44100, 48000, 32000],  # MPEG-1
    "2": [22050, 24000, 16000],  # MPEG-2
    "2.5": [11025, 12000, 8000],  # MPEG-2.5
}

# samples per frame by (version_group, layer)
_SPF = {
    ("1", 1): 384,
    ("1", 2): 1152,
    ("1", 3): 1152,
    ("2", 1): 384,
    ("2", 2): 1152,
    ("2", 3): 576,
}


def _id3v2_size(buf: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if absent)."""
    if buf[:3] != b"ID3" or len(buf) < 10:
        return 0
    # syncsafe 28-bit size, exclusive of the 10-byte header
    sz = (
        ((buf[6] & 0x7F) << 21)
        | ((buf[7] & 0x7F) << 14)
        | ((buf[8] & 0x7F) << 7)
        | (buf[9] & 0x7F)
    )
    return 10 + sz


def parse_frame_header(b0: int, b1: int, b2: int) -> tuple | None:
    """(version, layer, bitrate_kbps, sample_rate, padding, frame_bytes,
    samples) for one 4-byte header, or None if not a valid frame."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    vbits = (b1 >> 3) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(vbits)
    if version is None:
        return None
    layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 0x3)
    if layer is None:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = "1" if version == "1" else "2"
    kbps = _BITRATES[(vgroup, layer)][br_idx - 1]
    rate = _SAMPLE_RATES[version][sr_idx]
    padding = (b2 >> 1) & 0x1
    if layer == 1:
        frame_bytes = (12 * kbps * 1000 // rate + padding) * 4
    else:
        spf = _SPF[(vgroup, layer)]
        frame_bytes = spf // 8 * kbps * 1000 // rate + padding
    return version, layer, kbps, rate, padding, frame_bytes, _SPF[(vgroup, layer)]


def mp3_meta(buf: bytes) -> dict:
    """Walk every frame: exact n_frames / duration / bitrate stats.

    Returns {version, layer, sample_rate, n_frames, duration_s,
    avg_bitrate_kbps, is_vbr, id3v2_bytes}. Raises ValueError when no
    valid frame is found (not an MPEG audio stream)."""
    pos = _id3v2_size(buf)
    n = len(buf)
    # resync: scan forward to the first valid header (crawl payloads
    # often carry junk between the tag and the first frame)
    first = None
    while pos + 4 <= n:
        hdr = parse_frame_header(buf[pos], buf[pos + 1], buf[pos + 2])
        if hdr is not None:
            first = hdr
            break
        pos += 1
    if first is None:
        raise ValueError("no MPEG audio frame found")
    version, layer, _, rate, _, _, _ = first
    n_frames = 0
    samples = 0
    kbps_sum = 0
    kbps_seen: set[int] = set()
    while pos + 4 <= n:
        hdr = parse_frame_header(buf[pos], buf[pos + 1], buf[pos + 2])
        if hdr is None or hdr[0] != version or hdr[1] != layer or hdr[3] != rate:
            break  # trailing tag: stop at stream end
        if pos + hdr[5] > n:
            break  # truncated final frame: only complete frames count
        n_frames += 1
        samples += hdr[6]
        kbps_sum += hdr[2]
        kbps_seen.add(hdr[2])
        pos += hdr[5]
    return {
        "version": version,
        "layer": layer,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_s": samples / rate,
        "avg_bitrate_kbps": kbps_sum / n_frames,
        "is_vbr": len(kbps_seen) > 1,
        "id3v2_bytes": _id3v2_size(buf),
    }


def encode_fixture_mp3(
    n_frames: int,
    kbps_pattern: list[int],
    sample_rate: int = 44100,
    id3_payload: bytes = b"",
) -> bytes:
    """Fixture-grade MPEG-1 Layer III stream builder for parser tests:
    structurally valid frame headers + zero-fill frame bodies (no real
    audio — the parser never reads past the header). ``kbps_pattern``
    cycles per frame, so len>1 produces a VBR stream."""
    sr_idx = _SAMPLE_RATES["1"].index(sample_rate)
    out = bytearray()
    if id3_payload:
        sz = len(id3_payload)
        out += b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        out += id3_payload
    for i in range(n_frames):
        kbps = kbps_pattern[i % len(kbps_pattern)]
        br_idx = _BITRATES[("1", 3)].index(kbps) + 1
        frame_bytes = 1152 // 8 * kbps * 1000 // sample_rate  # padding 0
        hdr = bytes(
            [
                0xFF,
                0xFB,  # MPEG-1, Layer III, no CRC
                (br_idx << 4) | (sr_idx << 2),  # padding 0, private 0
                0x00,
            ]
        )
        out += hdr + bytes(frame_bytes - 4)
    return bytes(out)
