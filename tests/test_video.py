"""MJPG/AVI video path: container codec round-trip + the frame-sampling
actor-pool stage, composed into the image feature stage.

No reference analogue (the reference engine is text/record dedup); this
covers the BASELINE.json multimodal axis with a real offline decode path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from liken_ray.kernels.avi import (
    decode_avi_frames,
    encode_avi_mjpeg,
    iter_avi_frames,
    probe_avi,
)


def _frames(n: int, h: int = 48, w: int = 64, seed: int = 7) -> list[np.ndarray]:
    """Deterministic smooth gradient frames (JPEG-friendly: high PSNR at
    quality 95) with a per-frame brightness ramp so frames are distinct."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (yy * 255 / (h - 1)),
            (xx * 255 / (w - 1)),
            ((yy + xx) * 255 / (h + w - 2)),
        ],
        axis=2,
    )
    base = base + rng.normal(0, 2.0, size=base.shape)  # mild texture
    out = []
    for i in range(n):
        f = np.clip(base * (0.55 + 0.4 * i / max(n - 1, 1)), 0, 255)
        out.append(f.astype(np.uint8))
    return out


def test_avi_round_trip_and_probe():
    frames = _frames(6)
    data = encode_avi_mjpeg(frames, fps=12, quality=95)
    info = probe_avi(data)
    assert (info["w"], info["h"], info["n_frames"]) == (64, 48, 6)
    assert info["fps"] == pytest.approx(12, abs=0.01)
    assert info["codec"] == "MJPG"

    payloads = list(iter_avi_frames(data))
    assert len(payloads) == 6
    # each payload is a standalone baseline JPEG
    assert all(p[:2] == b"\xff\xd8" for p in payloads)

    decoded = list(decode_avi_frames(data))
    assert [i for i, _ in decoded] == list(range(6))
    for (_, got), want in zip(decoded, frames):
        assert got.shape == want.shape
        err = np.mean((got.astype(np.float64) - want.astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0**2 / max(err, 1e-12))
        assert psnr >= 35.0, f"lossy round-trip too lossy: {psnr:.1f} dB"


def test_avi_sampling_skips_without_decoding():
    frames = _frames(10)
    data = encode_avi_mjpeg(frames, fps=30, quality=90)
    sampled = list(decode_avi_frames(data, every_n=4))
    assert [i for i, _ in sampled] == [0, 4, 8]
    limited = list(decode_avi_frames(data, every_n=4, limit=2))
    assert [i for i, _ in limited] == [0, 4]


def test_avi_loud_failures():
    with pytest.raises(ValueError, match="RIFF"):
        probe_avi(b"not an avi at all")
    with pytest.raises(ValueError, match="empty frame list"):
        encode_avi_mjpeg([])
    f = _frames(2)
    with pytest.raises(ValueError, match="shape"):
        encode_avi_mjpeg([f[0], f[1][:32]])
    # non-MJPG codec is rejected loudly, not decoded as garbage
    data = bytearray(encode_avi_mjpeg(f, fps=10))
    pos = data.find(b"MJPG", 0)
    while pos != -1:  # both strh.fccHandler and strf.biCompression
        data[pos : pos + 4] = b"H264"
        pos = data.find(b"MJPG", pos)
    with pytest.raises(NotImplementedError, match="H264"):
        probe_avi(bytes(data))


def test_video_frame_sample_stage_composes_with_image_features(ray_session):
    import ray.data

    from liken_ray.extras.multimodal import image_features, video_frame_sample

    videos = []
    for vid, seed in ((100, 1), (200, 2), (300, 3)):
        videos.append(
            {
                "video_id": vid,
                "bytes": encode_avi_mjpeg(_frames(9, seed=seed), fps=9),
                "fmt": "avi",
            }
        )
    ds = ray.data.from_items(videos).repartition(2)
    frames = video_frame_sample(ds, every_n=3, concurrency=2, batch_size=2)
    rows = frames.take_all()
    # 3 videos x frames 0,3,6
    assert sorted((r["video_id"], r["frame_idx"]) for r in rows) == [
        (v, i) for v in (100, 200, 300) for i in (0, 3, 6)
    ]
    assert all(
        r["fmt"] == "raw"
        and r["w"] == 64
        and r["h"] == 48
        and len(r["bytes"]) == 64 * 48 * 3
        for r in rows
    )

    # sampled frames feed the image feature stage directly (training-prep
    # chain: video -> frames -> phash) after renaming the id column
    feat_in = ray.data.from_arrow(
        pa.table(
            {
                "image_id": [r["video_id"] * 1000 + r["frame_idx"] for r in rows],
                "bytes": [r["bytes"] for r in rows],
                "w": [r["w"] for r in rows],
                "h": [r["h"] for r in rows],
                "fmt": [r["fmt"] for r in rows],
            }
        )
    )
    feats = image_features(feat_in, concurrency=2, batch_size=8).take_all()
    assert len(feats) == 9
    by_id = {r["image_id"]: r["phash"] for r in feats}
    # frame 0 of two different-seed videos must not share a phash with
    # everything (sanity that features vary), while each id is present
    assert len(by_id) == 9
    assert len({v for v in by_id.values()}) > 1
