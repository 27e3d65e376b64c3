"""Unit tests for the image/substring kernels and the synthetic generator."""

from __future__ import annotations

import numpy as np
import pytest

from liken_ray.kernels import phash as ph
from liken_ray.kernels import suffix as sx
from liken_ray.io.synth import generate_pairs_table


def test_phash_deterministic_and_noise_invariant():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    h1 = ph.phash64(img)
    assert h1 == ph.phash64(img.copy())
    noisy = np.clip(img.astype(np.int16) + rng.integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    d = bin(h1 ^ ph.phash64(noisy)).count("1")
    assert d <= 6
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert bin(h1 ^ ph.phash64(other)).count("1") > 10


def test_phash_band_keys_blocking_guarantee():
    rng = np.random.default_rng(1)
    a = np.uint64(rng.integers(0, 2**63))
    # flip 3 bits -> hamming 3 < 4 bands -> must share >= 1 band
    b = a ^ np.uint64((1 << 3) | (1 << 20) | (1 << 60))
    ka = ph.phash_band_keys(np.array([a]), 4)[0]
    kb = ph.phash_band_keys(np.array([b]), 4)[0]
    assert any(x == y for x, y in zip(ka, kb))


def test_psnr():
    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    assert ph.psnr(img, img) == float("inf")
    noisy = img.copy()
    noisy[0, 0, 0] += 10
    assert 40 < ph.psnr(img, noisy) < 100


def test_decode_raw_roundtrip_and_unknown_fmt():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    out = ph.decode_image(img.tobytes(), 6, 4, "raw")
    assert np.array_equal(out, img)
    # png (round 3) and jpeg (round 4) are REAL stdlib-codec paths — see
    # tests/test_png.py / tests/test_jpeg.py; formats with no stdlib
    # decoder still raise through the registry
    with pytest.raises(NotImplementedError):
        ph.decode_image(b"\xff\xd8\xff...", 6, 4, "webp")


def test_suffix_array_matches_naive():
    rng = np.random.default_rng(3)
    for _ in range(5):
        data = rng.integers(0, 5, size=int(rng.integers(2, 200))).astype(np.uint8)
        sa = sx.suffix_array(data)
        naive = sorted(range(len(data)), key=lambda i: data[i:].tobytes())
        assert sa.tolist() == naive


def test_duplicate_substring_pairs():
    shared = b"the quick brown fox jumps over the lazy dog again and again"
    docs = [
        b"AAAA " + shared + b" BBBB",
        b"CCCC DDDD completely different content here with nothing shared",
        b"EEEE " + shared + b" FFFF",
    ]
    pairs = sx.duplicate_substring_pairs(docs, min_len=40)
    assert (0, 2) in pairs
    assert all(1 not in p for p in pairs)


def test_longest_common_substring_len():
    a = b"xxxHELLO WORLD THIS IS SHAREDyyy"
    b = b"zzzHELLO WORLD THIS IS SHAREDqqq"
    got = sx.longest_common_substring_len(a, b)
    assert got == len(b"HELLO WORLD THIS IS SHARED")
    assert sx.longest_common_substring_len(b"abc", b"xyz") == 0


def test_winnowing_guarantee():
    rng = np.random.default_rng(4)
    shared = bytes(rng.integers(65, 91, size=120, dtype=np.uint8))
    a = bytes(rng.integers(97, 123, size=300, dtype=np.uint8)) + shared
    b = shared + bytes(rng.integers(97, 123, size=300, dtype=np.uint8))
    fa = set(sx.gram_fingerprints(a, 50, 16).tolist())
    fb = set(sx.gram_fingerprints(b, 50, 16).tolist())
    # shared 120 >= gram+window-1=65 -> guaranteed intersection
    assert fa & fb


def test_synth_generator_deterministic_and_invariants():
    t1, truth1 = generate_pairs_table(300, seed=42)
    t2, _ = generate_pairs_table(300, seed=42)
    assert t1.equals(t2)
    assert t1.num_rows == 300
    assert t1.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

    # PSNR invariant within image clusters
    from collections import defaultdict

    by_cluster = defaultdict(list)
    kinds = truth1["kind"].to_pylist()
    clusters = truth1["true_cluster_id"].to_pylist()
    for i in range(t1.num_rows):
        if kinds[i] in ("image", "both"):
            by_cluster[clusters[i]].append(i)
    checked = 0
    for members in by_cluster.values():
        if len(members) < 2:
            continue
        imgs = [
            ph.decode_image(
                t1["bytes"][m].as_py(), t1["w"][m].as_py(), t1["h"][m].as_py(), "raw"
            )
            for m in members
        ]
        for k in range(1, len(imgs)):
            assert ph.psnr(imgs[0], imgs[k]) >= 40.0
            checked += 1
    assert checked > 0
