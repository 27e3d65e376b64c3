"""Pure-stdlib WAV (RIFF PCM) codec + audio feature kernels (numpy).

Gives the multimodal audio surface a REAL decode path the way
``kernels/png.py`` / ``kernels/jpeg.py`` did for images: the stdlib
``wave`` module parses the RIFF container, numpy vectorizes sample
unpacking and every feature. No external audio library.

- decode: PCM 8-bit (unsigned), 16/24/32-bit (signed), any channel
  count/rate → float64 ``(n_samples, channels)`` in [-1, 1] + rate.
  Compressed/float WAV raises ``ValueError`` loudly.
- encode: float array in [-1, 1] (or int16) → 16-bit PCM WAV bytes, so
  fixtures exist offline.
- features: duration, RMS, peak, zero-crossing rate, spectral centroid
  (rFFT magnitude over the mono mix) — all vectorized.

The reference delegates media decode to external libraries; this module
re-derives the (public, trivial) PCM layout so audio corpora run
end-to-end in this environment.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (``(n,)`` mono or ``(n, ch)``) or int16 →
    16-bit PCM WAV bytes."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected (n,) or (n, channels) samples, got {arr.shape}")
    if arr.dtype != np.int16:
        arr = np.clip(np.round(arr.astype(np.float64) * 32767.0), -32768, 32767)
        arr = arr.astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.ascontiguousarray(arr).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (float64 ``(n_samples, channels)`` in [-1, 1],
    sample_rate)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            ch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
    except wave.Error as e:  # compressed / malformed containers
        raise ValueError(f"not a decodable PCM WAV: {e}") from e
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 3:  # packed little-endian int24
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
        v = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)).astype(np.int32)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV sample width {width} bytes")
    if len(x) % ch:
        raise ValueError("WAV frame data not divisible by channel count")
    return x.reshape(-1, ch), rate


def audio_features(samples: np.ndarray, rate: int) -> dict[str, float]:
    """Vectorized scalar features of a decoded clip (mono mix for the
    spectral ones). Empty clips return zeros with duration 0."""
    if samples.size == 0:
        return {
            "duration_s": 0.0,
            "rms": 0.0,
            "peak": 0.0,
            "zero_crossing_rate": 0.0,
            "spectral_centroid_hz": 0.0,
        }
    mono = samples.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(samples)))
    # crossings per second of the mono signal
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    zcr = zc * rate / max(1, n - 1)
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = float(mag.sum())
    centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
    return {
        "duration_s": n / rate,
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
        "spectral_centroid_hz": centroid,
    }
