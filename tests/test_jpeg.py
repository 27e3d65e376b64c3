"""Baseline JPEG codec (kernels/jpeg.py): round-trips, entropy-layer
losslessness, marker handling, registry + synth + flagship integration.

The reference delegates image decode to PIL; this codec re-derives
baseline T.81 from the public spec so jpeg corpora run end-to-end in an
environment with no image library (VERDICT round-3 missing item #2).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from liken_ray.kernels.jpeg import decode_jpeg, encode_jpeg
from liken_ray.kernels.phash import psnr


def _smooth(w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (127 + 120 * np.sin(xx / 9.0)).astype(np.uint8),
            (127 + 120 * np.cos(yy / 7.0)).astype(np.uint8),
            ((xx + yy) % 256).astype(np.uint8),
        ],
        axis=2,
    )


def _rand(rng, w: int, h: int) -> np.ndarray:
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# --------------------------------------------------------------------------
# round trips


def test_roundtrip_444_smooth_high_quality():
    img = _smooth(80, 48)
    dec = decode_jpeg(encode_jpeg(img, quality=95), 80, 48)
    assert dec.shape == (48, 80, 3)
    assert psnr(img, dec) >= 42


def test_roundtrip_420_smooth():
    img = _smooth(64, 64)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsample="420"))
    assert dec.shape == (64, 64, 3)
    assert psnr(img, dec) >= 30  # chroma is half-resolution by design


def test_roundtrip_422_smooth():
    """4:2:2 exercises the decoder's asymmetric (2,1) sampling path."""
    img = _smooth(64, 48)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsample="422"))
    assert dec.shape == (48, 64, 3)
    assert psnr(img, dec) >= 30


def test_roundtrip_gray():
    g = np.outer(np.linspace(0, 255, 33), np.ones(29)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=92))
    assert dec.shape == (33, 29, 3)
    # grayscale replicated across the 3 output channels
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert psnr(np.repeat(g[:, :, None], 3, axis=2), dec) >= 45


def test_uniform_image_is_lossless():
    u = np.full((24, 24, 3), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(u, quality=90)), u)


def test_quality_100_noise_roundtrip_above_psnr_bar():
    """The synth jpeg corpora encode at quality 100; uniform-noise images
    (the synth's worst case) must round-trip well above the flagship's
    40 dB confirm bar."""
    rng = np.random.default_rng(11)
    img = _rand(rng, 32, 32)
    assert psnr(img, decode_jpeg(encode_jpeg(img, quality=100))) >= 46


@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (13, 9), (17, 31), (8, 8)])
@pytest.mark.parametrize("subsample", ["444", "422", "420"])
def test_odd_dimensions(w, h, subsample):
    rng = np.random.default_rng(w * 100 + h)
    img = _rand(rng, w, h)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=subsample))
    assert dec.shape == (h, w, 3)


def test_higher_quality_is_bigger():
    img = _smooth(64, 48)
    assert len(encode_jpeg(img, quality=95)) > len(encode_jpeg(img, quality=50))


def test_420_is_smaller_than_444():
    img = _smooth(64, 48)
    assert len(encode_jpeg(img, quality=85, subsample="420")) < len(
        encode_jpeg(img, quality=85, subsample="444")
    )


# --------------------------------------------------------------------------
# entropy layer


def test_restart_markers_are_entropy_lossless():
    """Same quantized coefficients with and without restart intervals →
    decoded pixels must be bit-identical (the entropy layer is lossless);
    exercises DRI emission + RSTn re-sync + DC-prediction reset."""
    img = _smooth(80, 48)
    e0 = encode_jpeg(img, quality=80, subsample="420", restart_interval=0)
    e2 = encode_jpeg(img, quality=80, subsample="420", restart_interval=2)
    assert e2 != e0  # RST markers present
    assert np.array_equal(decode_jpeg(e0), decode_jpeg(e2))


def test_byte_stuffing_roundtrip():
    """Images chosen to produce many 0xFF entropy bytes still round-trip
    (0xFF00 stuffing on encode, unstuffing on decode)."""
    rng = np.random.default_rng(99)
    for _ in range(3):
        img = _rand(rng, 24, 24)
        enc = encode_jpeg(img, quality=100)
        assert b"\xff\x00" in enc  # stuffing actually exercised
        assert psnr(img, decode_jpeg(enc)) >= 46


def test_sixteen_bit_dqt_decodes():
    """DQT with Pq=1 (16-bit entries) is spec-legal; rebuild an encoded
    file's 8-bit DQT segments as 16-bit and require an identical decode."""
    img = _smooth(32, 32)
    enc = encode_jpeg(img, quality=85)
    out = bytearray(enc[:2])
    pos = 2
    while pos + 4 <= len(enc):
        marker = enc[pos + 1]
        (length,) = struct.unpack(">H", enc[pos + 2 : pos + 4])
        payload = enc[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            tq = payload[0] & 0xF
            wide = bytes([0x10 | tq]) + b"".join(
                struct.pack(">H", v) for v in payload[1:65]
            )
            out += struct.pack(">BBH", 0xFF, 0xDB, len(wide) + 2) + wide
        else:
            out += enc[pos : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDA:
            out += enc[pos:]
            break
    assert np.array_equal(decode_jpeg(bytes(out)), decode_jpeg(enc))


# --------------------------------------------------------------------------
# error paths


def test_metadata_mismatch_raises():
    enc = encode_jpeg(_smooth(16, 16))
    with pytest.raises(ValueError, match="16x16"):
        decode_jpeg(enc, 32, 32)


def test_bad_soi_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_progressive_raises_loudly():
    enc = bytearray(encode_jpeg(_smooth(16, 16)))
    idx = enc.find(b"\xff\xc0")
    enc[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(enc))


def test_truncated_scan_raises():
    enc = encode_jpeg(_smooth(32, 32), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])


def test_bad_pixels_rejected_on_encode():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8, 3), np.float32))
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsample="411")
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg(np.zeros((0, 8, 3), np.uint8))


# --------------------------------------------------------------------------
# registry / synth / flagship integration


def test_decode_image_registry_routes_jpeg():
    from liken_ray.kernels.phash import decode_image

    img = _smooth(16, 16)
    out = decode_image(encode_jpeg(img, quality=100), 16, 16, "jpeg")
    assert psnr(img, out) >= 46


def test_synth_jpeg_corpus_phash_consistent():
    """img_fmt='jpeg' stores decodable payloads; the precomputed phash
    column is computed from the DECODED pixels (jpeg is lossy) so it must
    reproduce exactly from the payload."""
    from liken_ray.io.synth import generate_pairs_table
    from liken_ray.kernels.phash import decode_image, phash64

    pairs, _ = generate_pairs_table(40, seed=3, img_fmt="jpeg")
    assert pairs["fmt"][0].as_py() == "jpeg"
    for i in range(0, 40, 7):
        r = {c: pairs[c][i].as_py() for c in ("bytes", "w", "h", "fmt", "phash")}
        px = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        ph = phash64(px)
        ph_signed = ph - (1 << 64) if ph >= (1 << 63) else ph
        assert ph_signed == r["phash"]


def test_flagship_jpeg_corpus(ray_session, tmp_path):
    """The full 3-modality flagship over a LOSSY jpeg corpus: planted
    recall/precision hold (decoded variant pairs sit ~44 dB, above the
    40 dB PSNR confirm bar at quality 100), and rows whose clustering is
    caption/substring-driven match the raw corpus exactly (text payloads
    are identical; only pixels pass through the codec)."""
    import pyarrow.parquet as pq

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import run_flagship
    from tests.test_flagship import _predicted_pairs, _truth_pairs

    raw_dir = str(tmp_path / "raw")
    jpg_dir = str(tmp_path / "jpeg")
    write_pairs_dataset(raw_dir, n_rows=400, seed=19, shards=2)
    write_pairs_dataset(jpg_dir, n_rows=400, seed=19, shards=2, img_fmt="jpeg")
    res_raw = run_flagship(os.path.join(raw_dir, "pairs"), {"psnr_verify": True})
    res_jpg = run_flagship(os.path.join(jpg_dir, "pairs"), {"psnr_verify": True})

    truth = pq.read_table(os.path.join(jpg_dir, "truth.parquet")).to_pylist()
    assign = res_jpg["assignments"].take_all()
    tp = _truth_pairs(truth)
    pp = _predicted_pairs(assign)
    recall = len(tp & pp) / len(tp)
    precision = len(tp & pp) / max(1, len(pp))
    assert recall >= 0.98, f"recall {recall:.4f}"
    assert precision >= 0.95, f"precision {precision:.4f}"

    # caption/substring-planted rows must cluster identically to raw
    kind = {r["image_id"]: r["kind"] for r in truth}
    am = {r["image_id"]: r["cluster_id"] for r in res_raw["assignments"].take_all()}
    bm = {r["image_id"]: r["cluster_id"] for r in assign}
    for iid, k in kind.items():
        if k in ("caption", "substring"):
            # same-cluster sets must agree: compare by cluster partners
            a_peers = {j for j, c in am.items() if c == am[iid]}
            b_peers = {j for j, c in bm.items() if c == bm[iid]}
            assert a_peers == b_peers, (iid, k)
