"""WAV codec + audio feature kernels and the multimodal audio stage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from liken_ray.kernels.wav import audio_features, decode_wav, encode_wav


def _sine(freq: float, rate: int, secs: float, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(rate * secs)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_roundtrip_mono_16bit():
    x = _sine(440, 16000, 0.25)
    out, rate = decode_wav(encode_wav(x, 16000))
    assert rate == 16000
    assert out.shape == (4000, 1)
    assert np.max(np.abs(out[:, 0] - x)) < 1e-4  # 16-bit quantization


def test_roundtrip_stereo():
    left = _sine(440, 8000, 0.1)
    right = _sine(220, 8000, 0.1)
    x = np.stack([left, right], axis=1)
    out, rate = decode_wav(encode_wav(x, 8000))
    assert out.shape == (800, 2)
    assert np.max(np.abs(out - x)) < 1e-4


@pytest.mark.parametrize("width", [1, 2, 3, 4])
def test_decode_all_pcm_widths(width):
    """Hand-pack PCM frames at every width the decoder supports."""
    import io
    import wave

    rng = np.random.default_rng(width)
    x = rng.uniform(-0.9, 0.9, size=256)
    if width == 1:
        raw = (np.round(x * 127) + 128).astype(np.uint8).tobytes()
        tol = 1 / 100
    elif width == 2:
        raw = np.round(x * 32767).astype("<i2").tobytes()
        tol = 1e-4
    elif width == 3:
        v = np.round(x * ((1 << 23) - 1)).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
        b = np.empty((256, 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        raw = b.tobytes()
        tol = 1e-6
    else:
        raw = np.round(x * ((1 << 31) - 1)).astype("<i4").tobytes()
        tol = 1e-8
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(8000)
        w.writeframes(raw)
    out, rate = decode_wav(buf.getvalue())
    assert rate == 8000
    assert np.max(np.abs(out[:, 0] - x)) < tol + 1 / (1 << (8 * width - 1))


def test_garbage_raises():
    with pytest.raises(ValueError, match="PCM WAV"):
        decode_wav(b"\x00" * 64)


def test_features_sine():
    rate = 16000
    x = _sine(440, rate, 0.5, amp=0.5)
    f = audio_features(x[:, None], rate)
    assert abs(f["duration_s"] - 0.5) < 1e-9
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f["peak"] - 0.5) < 1e-3
    # a 440 Hz sine crosses zero 880 times/s; centroid sits on the tone
    assert abs(f["zero_crossing_rate"] - 880) < 10
    assert abs(f["spectral_centroid_hz"] - 440) < 15


def test_features_empty():
    f = audio_features(np.empty((0, 1)), 16000)
    assert f["duration_s"] == 0.0 and f["rms"] == 0.0


def test_audio_stage_ray(ray_session):
    """Actor-pool audio feature stage over a Dataset of WAV payloads."""
    import ray.data

    from liken_ray.extras.multimodal import audio_feature_extract

    rate = 8000
    rows = {
        "audio_id": [f"a{i}" for i in range(6)],
        "bytes": [
            encode_wav(_sine(220 * (i + 1), rate, 0.2, amp=0.3), rate)
            for i in range(6)
        ],
        "fmt": ["wav"] * 6,
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = audio_feature_extract(ds, concurrency=1, batch_size=3)
    got = {r["audio_id"]: r for r in out.take_all()}
    assert len(got) == 6
    for i in range(6):
        r = got[f"a{i}"]
        assert r["sample_rate"] == rate
        assert abs(r["duration_s"] - 0.2) < 1e-9
        assert abs(r["spectral_centroid_hz"] - 220 * (i + 1)) < 25


def test_audio_stage_rejects_unknown_fmt(ray_session):
    import ray.data

    from liken_ray.extras.multimodal import audio_feature_extract

    ds = ray.data.from_arrow(
        pa.table({"audio_id": ["x"], "bytes": [b"..."], "fmt": ["mp3"]})
    )
    with pytest.raises(Exception, match="no audio decoder"):
        audio_feature_extract(ds, concurrency=1).take_all()
