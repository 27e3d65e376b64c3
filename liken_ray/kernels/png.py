"""Pure-stdlib PNG codec (zlib + numpy) — makes ``fmt="png"`` a REAL
decode path for the image pipeline instead of an environment stub.

Scope (deliberately the subset a thumbnail/near-dup pipeline needs, per
the PNG 1.2 spec, public):

- decode: 8-bit depth, color types 0 (grayscale), 2 (RGB) and 6 (RGBA —
  alpha dropped), non-interlaced, all five scanline filters. Returns
  ``(h, w, 3)`` uint8 RGB (grayscale replicated across channels).
- encode: ``(h, w, 3)`` or ``(h, w)`` uint8 → color type 2/0, any single
  scanline filter type (default 0); filtering is fully vectorized.

Filters 0 (None), 1 (Sub) and 2 (Up) unfilter vectorized (Sub is a
per-channel cumulative sum); 3 (Average) and 4 (Paeth) depend on the
*reconstructed* left neighbor so they unfilter with an O(width) python
loop per row — fine for the thumbnail sizes this pipeline decodes, and
our own encoder defaults to filter 0 so round-trips stay vectorized.

Not supported (raise ``ValueError``): 16-bit depth, palette (type 3),
gray+alpha (type 4), interlacing. JPEG has its own baseline codec since
round 4 — see ``kernels/jpeg.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over int32 inputs."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 ``(h, w, 3)`` (RGB) or ``(h, w)`` (gray) → PNG bytes with one
    scanline filter type applied to every row (vectorized)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {arr.dtype}")
    if arr.ndim == 2:
        ctype, ch = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype, ch = 2, 3
        flat = arr
    else:
        raise ValueError(f"expected (h,w,3) or (h,w) array, got {arr.shape}")
    if filter_type not in range(5):
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    h, w = flat.shape[:2]
    cur = flat.reshape(h, w * ch).astype(np.int32)
    up = np.zeros_like(cur)
    up[1:] = cur[:-1]
    left = np.zeros_like(cur)
    left[:, ch:] = cur[:, :-ch]
    upleft = np.zeros_like(cur)
    upleft[1:, ch:] = cur[:-1, :-ch]
    if filter_type == 0:
        filt = cur
    elif filter_type == 1:
        filt = cur - left
    elif filter_type == 2:
        filt = cur - up
    elif filter_type == 3:
        filt = cur - (left + up) // 2
    else:
        filt = cur - _paeth(left, up, upleft)
    body = np.empty((h, 1 + w * ch), dtype=np.uint8)
    body[:, 0] = filter_type
    body[:, 1:] = (filt & 0xFF).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    """PNG bytes → ``(h, w, 3)`` uint8 RGB. ``w``/``h``, when given (the
    pairs-table metadata columns), are validated against the header."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = ctype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 len + 4 tag + payload + 4 crc
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
            if ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG color type {ctype} (only 0/2/6)"
                )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if (w is not None and w != width) or (h is not None and h != height):
        raise ValueError(
            f"PNG header {width}x{height} != metadata {w}x{h}"
        )
    ch = _CHANNELS[ctype]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (1 + stride):
        raise ValueError(
            f"PNG payload {raw.size} bytes != expected {height * (1 + stride)}"
        )
    raw = raw.reshape(height, 1 + stride)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    out = np.empty((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        t = int(ftypes[y])
        row = rows[y]
        if t == 0:
            cur = row
        elif t == 1:  # Sub: per-channel cumulative sum along the row
            cur = np.cumsum(row.reshape(width, ch), axis=0).reshape(stride) & 0xFF
        elif t == 2:  # Up
            cur = (row + prev) & 0xFF
        elif t == 3:  # Average — needs the reconstructed left neighbor
            cur = np.empty(stride, dtype=np.int32)
            cur[:ch] = (row[:ch] + prev[:ch] // 2) & 0xFF
            for x in range(ch, stride, ch):
                cur[x : x + ch] = (
                    row[x : x + ch]
                    + (cur[x - ch : x] + prev[x : x + ch]) // 2
                ) & 0xFF
        elif t == 4:  # Paeth — needs the reconstructed left neighbor
            cur = np.empty(stride, dtype=np.int32)
            zero = np.zeros(ch, dtype=np.int32)
            cur[:ch] = (row[:ch] + _paeth(zero, prev[:ch], zero)) & 0xFF
            for x in range(ch, stride, ch):
                cur[x : x + ch] = (
                    row[x : x + ch]
                    + _paeth(
                        cur[x - ch : x], prev[x : x + ch], prev[x - ch : x]
                    )
                ) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {t} on row {y}")
        out[y] = cur
        prev = out[y]
    px = out.astype(np.uint8).reshape(height, width, ch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])  # drop alpha
    return px


def _register() -> None:
    from liken_ray.kernels.phash import register_decoder

    register_decoder("png", lambda data, w, h: decode_png(data, w, h))


_register()
