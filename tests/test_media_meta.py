"""MP3 frame-walk and MP4 box-walk metadata kernels + their Ray
actor-pool stages (extras/mp3.py, extras/mp4.py, multimodal.py)."""

import pyarrow as pa
import pytest

from raybm25.extras.mp3 import encode_fixture_mp3, mp3_meta, parse_frame_header
from raybm25.extras.mp4 import encode_fixture_mp4, mp4_meta


# ------------------------------------------------------------------- mp3
def test_mp3_cbr_exact_frames_and_duration():
    buf = encode_fixture_mp3(n_frames=38, kbps_pattern=[128], sample_rate=44100)
    m = mp3_meta(buf)
    assert m["version"] == "1" and m["layer"] == 3
    assert m["sample_rate"] == 44100
    assert m["n_frames"] == 38
    assert m["duration_s"] == pytest.approx(38 * 1152 / 44100)
    assert m["avg_bitrate_kbps"] == 128.0
    assert m["is_vbr"] is False
    assert m["id3v2_bytes"] == 0


def test_mp3_vbr_and_id3_skip():
    buf = encode_fixture_mp3(
        n_frames=30,
        kbps_pattern=[64, 128, 192],
        sample_rate=32000,
        id3_payload=b"\x00" * 300,
    )
    m = mp3_meta(buf)
    assert m["id3v2_bytes"] == 310
    assert m["n_frames"] == 30
    assert m["is_vbr"] is True
    assert m["avg_bitrate_kbps"] == pytest.approx((64 + 128 + 192) / 3)
    assert m["duration_s"] == pytest.approx(30 * 1152 / 32000)


def test_mp3_resync_past_junk_and_truncation():
    clean = encode_fixture_mp3(n_frames=5, kbps_pattern=[96])
    junked = b"\x00garbage\xff\x00" + clean
    m = mp3_meta(junked)
    assert m["n_frames"] == 5
    # trailing partial frame is dropped, full frames still counted
    m2 = mp3_meta(clean[: len(clean) - 40])
    assert m2["n_frames"] == 4


def test_mp3_rejects_non_audio():
    with pytest.raises(ValueError):
        mp3_meta(b"not audio at all" * 10)
    assert parse_frame_header(0x12, 0x34, 0x56) is None
    # bad bitrate index (15) and bad sample-rate index (3) rejected
    assert parse_frame_header(0xFF, 0xFB, 0xF0) is None
    assert parse_frame_header(0xFF, 0xFB, 0x1C) is None


# ------------------------------------------------------------------- mp4
def test_mp4_video_audio_tracks():
    buf = encode_fixture_mp4(
        duration_s=12.5, video=(1280, 720, "avc1"), audio="mp4a"
    )
    m = mp4_meta(buf)
    assert m["brand"] == "isom"
    assert m["duration_s"] == pytest.approx(12.5)
    assert m["n_tracks"] == 2
    vid = next(t for t in m["tracks"] if t["handler"] == "vide")
    aud = next(t for t in m["tracks"] if t["handler"] == "soun")
    assert (vid["width"], vid["height"]) == (1280, 720)
    assert vid["codec"] == "avc1"
    assert aud["codec"] == "mp4a"
    assert vid["duration_s"] == pytest.approx(12.5)


def test_mp4_audio_only_and_rejects():
    m = mp4_meta(encode_fixture_mp4(duration_s=3.0, video=None, audio="mp4a"))
    assert m["n_tracks"] == 1 and m["tracks"][0]["handler"] == "soun"
    with pytest.raises(ValueError):
        mp4_meta(b"RIFF" + b"\x00" * 100)  # not ISO-BMFF
    with pytest.raises(ValueError):
        mp4_meta(b"")


def test_mp4_truncated_stops_cleanly():
    buf = encode_fixture_mp4()
    # cut inside moov: the box walker must stop, not crash; with the
    # moov box truncated there is no valid container left
    with pytest.raises(ValueError):
        mp4_meta(buf[: len(buf) // 2])


# ------------------------------------------------------------- ray stages
def test_mp3_stage_mixed_corpus(ray_session):
    import ray.data

    from raybm25.extras.multimodal import Mp3MetaStage

    good = encode_fixture_mp3(n_frames=10, kbps_pattern=[128])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "payload": pa.array([good, b"junk"], pa.binary()),
            }
        )
    )
    out = (
        ds.map_batches(Mp3MetaStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["format"].tolist() == ["mp3", "unknown"]
    assert out["n_frames"][0] == 10
    assert out["duration_s"][1] != out["duration_s"][1]  # NaN for the skip

    with pytest.raises(Exception):
        ds.map_batches(
            Mp3MetaStage,
            fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow",
            concurrency=1,
        ).to_pandas()


def test_mp4_stage(ray_session):
    import ray.data

    from raybm25.extras.multimodal import Mp4MetaStage

    buf = encode_fixture_mp4(duration_s=7.0, video=(320, 240, "hev1"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [5, 6],
                "payload": pa.array([buf, b"\x00\x00"], pa.binary()),
            }
        )
    )
    out = (
        ds.map_batches(Mp4MetaStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["format"].tolist() == ["mp4", "unknown"]
    assert out["duration_s"][0] == pytest.approx(7.0)
    assert out["video_codec"][0] == "hev1"
    assert out["width"][0] == 320 and out["height"][0] == 240
    import pandas as pd

    assert pd.isna(out["video_codec"][1])  # skipped row carries nulls
