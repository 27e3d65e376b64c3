"""Pure-stdlib RIFF/AVI container codec for Motion-JPEG video.

Gives the video modality a REAL decode path in this offline sandbox (no
ffmpeg): an AVI is a RIFF file whose ``movi`` list carries one compressed
chunk per frame; with the ``MJPG`` codec each chunk is a standalone
baseline JPEG, which ``kernels/jpeg.py`` decodes. The encoder exists so
deterministic fixtures can be synthesized offline (same pattern as the
png/jpeg/wav kernels).

Format layout (public spec: Microsoft AVI RIFF / OpenDML):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader, 56 bytes>)
        LIST('strl' strh(<AVIStreamHeader, 56 bytes>) strf(<BITMAPINFOHEADER>)))
      LIST('movi' 00dc(<jpeg bytes>) ...)
      idx1(<AVIINDEXENTRY> ...))

Every chunk is ``fourcc + u32le size + payload`` padded to even length.
Only what the engine needs is implemented: one ``vids`` stream, ``MJPG``
frames. Other codecs and audio streams raise loudly.

Reference parity note: the reference engine has no video support at all
(VictorAut/liken is text/record dedup); this module serves the
BASELINE.json multimodal axis. No reference file corresponds to it.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from liken_ray.kernels.jpeg import decode_jpeg, encode_jpeg

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray] | np.ndarray,
    fps: int = 30,
    quality: int = 95,
    subsample: str = "444",
) -> bytes:
    """uint8 ``(h, w, 3)`` RGB frames (or one ``(n, h, w, 3)`` stack) →
    MJPG-in-AVI bytes. All frames must share one shape."""
    if isinstance(frames, np.ndarray) and frames.ndim == 4:
        frames = list(frames)
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape[:2]
    for i, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise ValueError(
                f"frame {i} shape {f.shape[:2]} != frame 0 shape {(h, w)}"
            )
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")

    payloads = [
        encode_jpeg(f, quality=quality, subsample=subsample) for f in frames
    ]
    max_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        len(payloads),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate (rate/scale = fps)
        0,  # dwStart
        len(payloads),  # dwLength (frames)
        max_bytes,  # dwSuggestedBufferSize
        0,  # dwQuality
        0,  # dwSampleSize (0: variable-size samples)
        0,
        0,
        w,
        h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage
        0,
        0,
        0,
        0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    # movi list + idx1 (offsets are relative to the 'movi' fourcc)
    movi_body = b""
    idx = b""
    for p in payloads:
        offset = 4 + len(movi_body)  # past the 'movi' list-type fourcc
        movi_body += _chunk(b"00dc", p)
        idx += struct.pack(
            "<4sIII", b"00dc", _AVIIF_KEYFRAME, offset, len(p)
        )
    riff_body = b"AVI " + hdrl + _list(b"movi", movi_body) + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _iter_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield ``(fourcc, payload_start, payload_size)`` for each chunk in
    ``data[pos:end]``; LIST chunks are yielded whole (fourcc ``LIST``)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        start = pos + 8
        if start + size > end:
            raise ValueError(
                f"chunk {fourcc!r} at offset {pos} overruns its parent "
                f"({start + size} > {end})"
            )
        yield fourcc, start, size
        pos = start + size + (size & 1)


def probe_avi(data: bytes) -> dict:
    """Header info without decoding frames: ``{w, h, fps, n_frames,
    codec}``. Validates the container is a single-video-stream MJPG AVI."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_size, len(data))
    info: dict = {}
    for fourcc, start, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST" or data[start : start + 4] != b"hdrl":
            continue
        for f2, s2, z2 in _iter_chunks(data, start + 4, start + size):
            if f2 == b"avih" and z2 >= 40:
                (usec_pf, _, _, _, total, _, streams, _, w, h) = struct.unpack(
                    "<10I", data[s2 : s2 + 40]
                )
                info.update(w=w, h=h, n_frames=total)
                if streams != 1:
                    raise NotImplementedError(
                        f"only single-stream AVIs supported, got {streams}"
                    )
                if usec_pf:
                    info["fps"] = round(1_000_000 / usec_pf, 3)
            elif f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                for f3, s3, z3 in _iter_chunks(data, s2 + 4, s2 + z2):
                    if f3 != b"strh" or z3 < 32:
                        continue
                    fcc_type = data[s3 : s3 + 4]
                    handler = data[s3 + 4 : s3 + 8]
                    scale, rate = struct.unpack("<II", data[s3 + 20 : s3 + 28])
                    if fcc_type != b"vids":
                        raise NotImplementedError(
                            f"only 'vids' streams supported, got {fcc_type!r}"
                        )
                    info["codec"] = handler.decode("ascii", "replace").strip()
                    if scale:
                        info["fps"] = round(rate / scale, 3)
        break
    if "w" not in info:
        raise ValueError("no 'hdrl' list / avih header found")
    codec = info.get("codec", "").upper()
    if codec not in ("MJPG", "MJPEG"):
        raise NotImplementedError(
            f"only MJPG AVIs are decodable offline, got codec {codec!r}"
        )
    return info


def iter_avi_frames(data: bytes) -> Iterator[bytes]:
    """Yield the raw JPEG payload of each video frame, in stream order.
    Walks the ``movi`` list directly (``00dc``/``00db`` chunks), so a
    missing/damaged ``idx1`` index does not matter."""
    probe_avi(data)  # validates container + codec
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_size, len(data))
    for fourcc, start, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST" or data[start : start + 4] != b"movi":
            continue
        for f2, s2, z2 in _iter_chunks(data, start + 4, start + size):
            tag = f2[2:4]
            if tag in (b"dc", b"db"):
                yield bytes(data[s2 : s2 + z2])


def decode_avi_frames(
    data: bytes, every_n: int = 1, limit: int | None = None
) -> Iterator[tuple[int, np.ndarray]]:
    """Decode every ``every_n``-th frame → ``(frame_idx, (h, w, 3) uint8)``.
    Non-sampled frames are skipped WITHOUT entropy-decoding them (each
    MJPG frame is standalone — the 100-TB reason to sample at the
    container layer, not after a full decode)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    emitted = 0
    for idx, payload in enumerate(iter_avi_frames(data)):
        if idx % every_n:
            continue
        yield idx, decode_jpeg(payload)
        emitted += 1
        if limit is not None and emitted >= limit:
            return
