"""Pure-stdlib PNG codec (kernels/png.py): round-trips, filter coverage,
error paths, decoder-registry integration, and flagship parity on a
png-encoded corpus (the real compressed decode path end to end)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from liken_ray.kernels.png import _SIG, _chunk, decode_png, encode_png


def _rand_img(rng, h, w, ch=3):
    return rng.integers(0, 256, size=(h, w, ch) if ch else (h, w), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_rgb_round_trip_every_filter(filter_type):
    rng = np.random.default_rng(5 + filter_type)
    for h, w in [(1, 1), (3, 7), (32, 32), (17, 5)]:
        img = _rand_img(rng, h, w)
        out = decode_png(encode_png(img, filter_type=filter_type))
        assert out.shape == (h, w, 3)
        np.testing.assert_array_equal(out, img)


def test_gray_round_trip_replicates_channels():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == (9, 13, 3)
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], img)


def test_rgba_decode_drops_alpha():
    rng = np.random.default_rng(17)
    h, w = 6, 4
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    body = np.empty((h, 1 + w * 4), dtype=np.uint8)
    body[:, 0] = 0
    body[:, 1:] = rgba.reshape(h, w * 4)
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(body.tobytes()))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data, w, h)
    np.testing.assert_array_equal(out, rgba[:, :, :3])


def test_decode_errors():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    with pytest.raises(ValueError, match="metadata"):
        decode_png(good, 5, 4)
    bad_depth = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad_depth)
    palette = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="color type"):
        decode_png(palette)
    with pytest.raises(ValueError, match="filter_type"):
        encode_png(img, filter_type=9)


def test_decode_image_registry_integration():
    from liken_ray.kernels.phash import decode_image

    rng = np.random.default_rng(23)
    img = _rand_img(rng, 8, 8)
    out = decode_image(encode_png(img), 8, 8, "png")
    np.testing.assert_array_equal(out, img)
    # jpeg is a REAL codec path since round 4 (tests/test_jpeg.py); formats
    # with no stdlib decoder still raise through the registry
    with pytest.raises(NotImplementedError):
        decode_image(b"x", 1, 1, "webp")


def test_synth_png_corpus_phash_consistent():
    """img_fmt='png' stores decodable payloads whose pixels reproduce the
    precomputed phash column exactly."""
    from liken_ray.io.synth import generate_pairs_table
    from liken_ray.kernels.phash import decode_image, phash64

    pairs, _ = generate_pairs_table(40, seed=3, img_fmt="png")
    assert pairs["fmt"][0].as_py() == "png"
    for i in range(0, 40, 7):
        r = {c: pairs[c][i].as_py() for c in ("bytes", "w", "h", "fmt", "phash")}
        px = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        ph = phash64(px)
        ph_signed = ph - (1 << 64) if ph >= (1 << 63) else ph
        assert ph_signed == r["phash"]


def test_flagship_png_corpus_matches_raw(ray_session, tmp_path):
    """Same seed, raw vs png payloads: pixels identical, so clusters must
    be identical — with psnr_verify=True the real PNG inflate+unfilter
    path runs inside the distributed confirm stage."""
    import os

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import run_flagship

    raw_dir = str(tmp_path / "raw")
    png_dir = str(tmp_path / "png")
    write_pairs_dataset(raw_dir, n_rows=400, seed=19, shards=2)
    write_pairs_dataset(png_dir, n_rows=400, seed=19, shards=2, img_fmt="png")
    res_raw = run_flagship(os.path.join(raw_dir, "pairs"), {"psnr_verify": True})
    res_png = run_flagship(os.path.join(png_dir, "pairs"), {"psnr_verify": True})
    am = {r["image_id"]: r["cluster_id"] for r in res_raw["assignments"].take_all()}
    bm = {r["image_id"]: r["cluster_id"] for r in res_png["assignments"].take_all()}
    assert am == bm