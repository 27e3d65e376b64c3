"""Perceptual image hashing + pixel-level verification kernels.

Implements the classic pHash construction (grayscale → 32×32 area-resample →
2-D DCT-II → top-left 8×8 low-frequency block → median threshold → 64-bit
hash), SimHash-style band keys over the hash bits for blocking, Hamming
verification and PSNR. All numpy; the DCT is a cached basis-matrix matmul
(no scipy).

Decoding: ``fmt="raw"`` = w*h*3 interleaved uint8 RGB; ``fmt="png"`` and
``fmt="jpeg"`` are REAL decodes via the pure-stdlib codecs in
``kernels/png.py`` (zlib inflate + numpy unfilter) and ``kernels/jpeg.py``
(baseline T.81 Huffman + vectorized IDCT) — both lazily registered.
Anything else raises ``NotImplementedError`` through the pluggable decoder
registry so the Ray-side plumbing stays format-agnostic.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import numpy as np

HASH_SIZE = 8
RESAMPLE = 32

# fmt -> decoder(bytes, w, h) -> (h, w, 3) uint8
DECODERS: dict[str, Callable[[bytes, int, int], np.ndarray]] = {}


def register_decoder(fmt: str, fn: Callable[[bytes, int, int], np.ndarray]) -> None:
    DECODERS[fmt] = fn


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size != w * h * 3:
        raise ValueError(f"raw payload has {arr.size} bytes, expected {w * h * 3}")
    return arr.reshape(h, w, 3)


register_decoder("raw", decode_raw)


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    try:
        decoder = DECODERS[fmt]
    except KeyError:
        if fmt == "png":
            # pure-stdlib codec (zlib + numpy) — registers itself on import
            import liken_ray.kernels.png  # noqa: F401

            return DECODERS["png"](data, w, h)
        if fmt == "jpeg":
            # pure-stdlib baseline T.81 codec — registers itself on import
            import liken_ray.kernels.jpeg  # noqa: F401

            return DECODERS["jpeg"](data, w, h)
        raise NotImplementedError(
            f"no decoder for fmt={fmt!r} in this environment; register one via "
            "liken_ray.kernels.phash.register_decoder (e.g. a PIL-backed "
            "decoder where Pillow is installed)"
        )
    return decoder(data, w, h)


@lru_cache(maxsize=8)
def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n, n): X = B @ x."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    b = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    b *= np.sqrt(2.0 / n)
    b[0] *= np.sqrt(0.5)
    return b


def _area_resample(gray: np.ndarray, size: int) -> np.ndarray:
    """Box/area downsample to (size, size) — deterministic, no interpolation
    library needed. Handles non-divisible shapes by edge-padding."""
    h, w = gray.shape
    if h == size and w == size:
        return gray.astype(np.float64)
    ph = (-h) % size
    pw = (-w) % size
    if ph or pw:
        gray = np.pad(gray, ((0, ph), (0, pw)), mode="edge")
        h, w = gray.shape
    fh, fw = h // size, w // size
    return gray.reshape(size, fh, size, fw).mean(axis=(1, 3))


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w, 3) uint8 RGB image."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _area_resample(gray, RESAMPLE)
    b = _dct_basis(RESAMPLE)
    dct = b @ small @ b.T
    low = dct[:HASH_SIZE, :HASH_SIZE]
    med = np.median(low)
    bits = (low > med).reshape(-1)
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out


def _area_resample_rect(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Rectangular box/area downsample to (out_h, out_w) — the square
    ``_area_resample`` generalized for dHash's (8, 9) grid."""
    h, w = gray.shape
    ph_, pw_ = (-h) % out_h, (-w) % out_w
    if ph_ or pw_:
        gray = np.pad(gray, ((0, ph_), (0, pw_)), mode="edge")
        h, w = gray.shape
    return gray.reshape(out_h, h // out_h, out_w, w // out_w).mean(axis=(1, 3))


def _bits_to_u64(bits: np.ndarray) -> int:
    out = 0
    for bit in bits.reshape(-1):
        out = (out << 1) | int(bit)
    return out


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash: 8x8 area downsample, bit = cell > global mean.
    The cheapest member of the perceptual-hash family — no DCT — useful as
    a prefilter band key where phash's transform cost dominates."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _area_resample(gray, HASH_SIZE)
    return _bits_to_u64(small > small.mean())


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: 8x9 area downsample, bit = cell brighter
    than its right neighbour (horizontal gradient sign). Robust to global
    brightness/contrast shifts that flip ahash bits."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _area_resample_rect(gray, HASH_SIZE, HASH_SIZE + 1)
    return _bits_to_u64(small[:, 1:] > small[:, :-1])


def phash_batch(datas: list[bytes], ws, hs, fmts) -> np.ndarray:
    out = np.empty(len(datas), dtype=np.uint64)
    for i, (d, w, h, f) in enumerate(zip(datas, ws, hs, fmts)):
        out[i] = np.uint64(phash64(decode_image(d, int(w), int(h), f)))
    return out


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (no per-element Python)."""
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & m1)
        x = (x & m2) + ((x >> np.uint64(2)) & m2)
        x = (x + (x >> np.uint64(4))) & m4
        return ((x * h01) >> np.uint64(56)).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 hash arrays."""
    return popcount64(np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64)))


def phash_band_keys(phashes: np.ndarray, bands: int = 4) -> np.ndarray:
    """(n, bands) band keys: the 64-bit hash split into ``bands`` contiguous
    bit-slices (SimHash-style blocking: two images within Hamming distance
    < bands must share at least one band exactly)."""
    ph = phashes.astype(np.uint64)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(ph), bands), dtype=np.uint64)
    for b in range(bands):
        out[:, b] = (ph >> np.uint64(b * width)) & mask
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images; inf for
    identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
