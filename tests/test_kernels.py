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


# ---------------------------------------------------------------------------
# batch_gram_fingerprints (batched winnowing)
# ---------------------------------------------------------------------------


def test_batch_gram_fingerprints_parity_per_row():
    from liken_ray.kernels import suffix as sx

    rng = np.random.default_rng(23)
    texts = [
        bytes(rng.integers(97, 103, size=int(n)).astype(np.uint8))
        for n in rng.integers(0, 400, size=300)
    ]
    # boundary lengths around gram_len L=32 and L+window-1
    texts += [b"", b"a" * 31, b"a" * 32, b"a" * 38, b"a" * 39, b"a" * 40,
              bytes(range(256)) * 3]
    L, W = 32, 8
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in texts], out=offsets[1:])
    fps, row_off = sx.batch_gram_fingerprints(buf, offsets, L, W)
    for r, t in enumerate(texts):
        ref = sx.gram_fingerprints(t, L, W)
        got = fps[row_off[r]:row_off[r + 1]]
        assert np.array_equal(got, ref), (r, len(t))


def test_batch_gram_fingerprints_empty_and_all_short():
    from liken_ray.kernels import suffix as sx

    fps, ro = sx.batch_gram_fingerprints(
        np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64), 32, 8
    )
    assert len(fps) == 0 and list(ro) == [0]
    texts = [b"ab", b"c"]
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    off = np.array([0, 2, 3], dtype=np.int64)
    fps, ro = sx.batch_gram_fingerprints(buf, off, 32, 8)
    assert len(fps) == 0 and list(ro) == [0, 0, 0]


def test_batch_gram_fingerprints_short_long_interleaved():
    """Short (<= window grams) and long rows alternate — the reduceat
    segment pairs must not swallow the long rows sitting between."""
    from liken_ray.kernels import suffix as sx

    rng = np.random.default_rng(7)
    texts = []
    for i in range(40):
        n = 36 if i % 2 == 0 else 300  # L=32,W=8: 5 grams vs 269 grams
        texts.append(bytes(rng.integers(0, 256, size=n).astype(np.uint8)))
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    off = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in texts], out=off[1:])
    fps, ro = sx.batch_gram_fingerprints(buf, off, 32, 8)
    for r, t in enumerate(texts):
        assert np.array_equal(fps[ro[r]:ro[r + 1]], sx.gram_fingerprints(t, 32, 8)), r


# ---------------------------------------------------------------------------
# ahash64 / dhash64
# ---------------------------------------------------------------------------


def _checker(h, w, cell=8):
    yy, xx = np.mgrid[0:h, 0:w]
    g = (((yy // cell) + (xx // cell)) % 2 * 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def test_ahash_dhash_basics():
    img = _checker(64, 64)
    a = sx_np = ph.ahash64(img)
    d = ph.dhash64(img)
    assert 0 <= a < 2**64 and 0 <= d < 2**64
    # deterministic
    assert ph.ahash64(img) == a and ph.dhash64(img) == d
    # near-identical images agree, unrelated images differ widely
    noisy = img.copy()
    noisy[0, 0] = 0
    assert ph.hamming64(
        np.array([a], dtype=np.uint64), np.array([ph.ahash64(noisy)], dtype=np.uint64)
    )[0] <= 2
    rng = np.random.default_rng(0)
    rand = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    assert ph.hamming64(
        np.array([d], dtype=np.uint64), np.array([ph.dhash64(rand)], dtype=np.uint64)
    )[0] >= 10


def test_dhash_brightness_invariance_vs_ahash():
    """A global brightness shift flips ahash bits (mean moves with the
    image) less gracefully than dhash (gradient signs are unchanged)."""
    rng = np.random.default_rng(4)
    base = rng.integers(40, 180, size=(32, 32)).astype(np.float64)
    img = np.stack([base, base, base], axis=-1).astype(np.uint8)
    brighter = np.clip(base + 60, 0, 255)
    img2 = np.stack([brighter, brighter, brighter], axis=-1).astype(np.uint8)
    dh = ph.hamming64(
        np.array([ph.dhash64(img)], dtype=np.uint64),
        np.array([ph.dhash64(img2)], dtype=np.uint64),
    )[0]
    assert dh == 0  # uniform shift preserves every horizontal gradient sign


def test_image_feature_stage_hash_kinds(ray_session):
    import pyarrow as pa

    from liken_ray.extras.multimodal import ImageFeatureStage
    from liken_ray.kernels.phash import ahash64, dhash64

    img = _checker(16, 16)
    batch = pa.table(
        {
            "image_id": pa.array(["x"]),
            "bytes": pa.array([img.tobytes()], pa.binary()),
            "w": pa.array([16], pa.int64()),
            "h": pa.array([16], pa.int64()),
            "fmt": pa.array(["raw"]),
        }
    )
    for kind, fn in (("ahash", ahash64), ("dhash", dhash64)):
        out = ImageFeatureStage(hash_kind=kind)(batch)
        assert out[kind][0].as_py() == np.uint64(fn(img)).view(np.int64)
    import pytest

    with pytest.raises(ValueError, match="hash_kind"):
        ImageFeatureStage(hash_kind="nope")
