"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata (the
input_hint pattern: ``bytes, w, h, fmt``). Heavy decode / feature work runs
in actor-pool ``map_batches`` stages — setup (decoder tables, model
weights) once per actor, small ``batch_size`` because rows are megabytes.

Image decode is REAL for ``fmt="raw"``, ``"png"`` and ``"jpeg"`` (pure
stdlib codecs, ``kernels/png.py`` / ``kernels/jpeg.py``); audio decode is
REAL for PCM ``"wav"`` (stdlib ``wave`` + numpy, ``kernels/wav.py``);
video decode is REAL for MJPG ``"avi"`` (stdlib RIFF walker feeding the
jpeg codec, ``kernels/avi.py``). Other formats raise
``NotImplementedError`` unless a decoder is registered via
``liken_ray.kernels.phash.register_decoder`` (images) — there is no
ffmpeg in this sandbox. The Ray-side plumbing — schemas, actor
signatures, batch sizing, output layout — is real and tested.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from liken_ray.kernels import phash as ph


class ImageFeatureStage:
    """Actor-pool stage: decode → (perceptual hash, mean RGB, dims).
    Decoder lookup and DCT basis are actor state. ``hash_kind`` selects the
    hash family: ``"phash"`` (DCT, default), ``"ahash"`` (mean threshold —
    cheapest, a good band-key prefilter) or ``"dhash"`` (horizontal
    gradient sign — robust to brightness/contrast shifts); the output
    column is named after the kind."""

    _HASHES = {"phash": "phash64", "ahash": "ahash64", "dhash": "dhash64"}

    def __init__(self, bytes_col: str = "bytes", hash_kind: str = "phash"):
        if hash_kind not in self._HASHES:
            raise ValueError(
                f"hash_kind must be one of {sorted(self._HASHES)}, got {hash_kind!r}"
            )
        self.bytes_col = bytes_col
        self.hash_kind = hash_kind
        self._hash_fn = getattr(ph, self._HASHES[hash_kind])
        if hash_kind == "phash":
            ph._dct_basis(ph.RESAMPLE)  # build once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hashes = np.zeros(n, dtype=np.uint64)
        means = np.zeros((n, 3), dtype=np.float64)
        for i in range(n):
            img = ph.decode_image(
                batch[self.bytes_col][i].as_py(),
                batch["w"][i].as_py(),
                batch["h"][i].as_py(),
                batch["fmt"][i].as_py(),
            )
            hashes[i] = np.uint64(self._hash_fn(img))
            means[i] = img.reshape(-1, 3).mean(axis=0)
        return pa.table(
            {
                "image_id": batch["image_id"],
                self.hash_kind: hashes.view(np.int64),
                "mean_r": means[:, 0],
                "mean_g": means[:, 1],
                "mean_b": means[:, 2],
            }
        )


class ImageResizeStage:
    """Actor-pool stage: area-resample decoded images to (size, size) and
    re-emit as raw bytes (training-prep layout)."""

    def __init__(self, size: int = 16, bytes_col: str = "bytes"):
        self.size = size
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes = []
        for i in range(batch.num_rows):
            img = ph.decode_image(
                batch[self.bytes_col][i].as_py(),
                batch["w"][i].as_py(),
                batch["h"][i].as_py(),
                batch["fmt"][i].as_py(),
            )
            resized = np.stack(
                [ph._area_resample(img[:, :, c].astype(np.float64), self.size) for c in range(3)],
                axis=2,
            )
            out_bytes.append(np.clip(resized, 0, 255).astype(np.uint8).tobytes())
        n = batch.num_rows
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array([self.size] * n, pa.int32()),
                "h": pa.array([self.size] * n, pa.int32()),
                "fmt": pa.array(["raw"] * n, pa.string()),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: PCM WAV decode → scalar features. Schema contract:
    in = (audio_id, bytes, fmt="wav"); out = (audio_id, sample_rate,
    duration_s, rms, peak, zero_crossing_rate, spectral_centroid_hz).
    Decode is REAL (stdlib ``wave`` + numpy, ``kernels/wav.py``); non-wav
    formats raise loudly."""

    def __init__(self, bytes_col: str = "bytes"):
        from liken_ray.kernels import wav

        self.bytes_col = bytes_col
        self._wav = wav  # import once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist() if "fmt" in batch.column_names else ["wav"] * n
        cols: dict[str, list] = {
            k: []
            for k in (
                "sample_rate",
                "duration_s",
                "rms",
                "peak",
                "zero_crossing_rate",
                "spectral_centroid_hz",
            )
        }
        for i in range(n):
            if fmts[i] != "wav":
                raise NotImplementedError(
                    f"no audio decoder for fmt={fmts[i]!r} (only PCM 'wav' in "
                    "this environment)"
                )
            samples, rate = self._wav.decode_wav(batch[self.bytes_col][i].as_py())
            f = self._wav.audio_features(samples, rate)
            cols["sample_rate"].append(rate)
            for k in cols:
                if k != "sample_rate":
                    cols[k].append(f[k])
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "sample_rate": pa.array(cols["sample_rate"], pa.int32()),
                **{
                    k: pa.array(cols[k], pa.float64())
                    for k in cols
                    if k != "sample_rate"
                },
            }
        )


class VideoFrameSampleStage:
    """Actor-pool stage: sample every ``every_n``-th frame of an MJPG AVI
    and emit decoded frames as raw RGB rows. Schema contract: in =
    (video_id, bytes, fmt); out = (video_id, frame_idx, bytes, w, h,
    fmt='raw') — one output row per sampled frame, directly consumable by
    ``ImageFeatureStage``/``ImageResizeStage`` after renaming video_id.

    Decode is REAL for ``fmt="avi"`` (stdlib RIFF walker +
    ``kernels/jpeg.py`` per-frame decode, ``kernels/avi.py``); skipped
    frames are never entropy-decoded — sampling happens at the container
    layer, the property that matters when the payload column is hours of
    video. Other container formats raise loudly (no ffmpeg here)."""

    def __init__(
        self,
        every_n: int = 30,
        max_frames: int | None = None,
        bytes_col: str = "bytes",
    ):
        from liken_ray.kernels import avi

        if every_n < 1:
            raise ValueError(f"every_n must be >= 1, got {every_n}")
        self.every_n = every_n
        self.max_frames = max_frames
        self.bytes_col = bytes_col
        self._avi = avi  # import once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist() if "fmt" in batch.column_names else ["avi"] * n
        vids, idxs, frames, ws, hs = [], [], [], [], []
        for i in range(n):
            if fmts[i] != "avi":
                raise NotImplementedError(
                    f"no video decoder for fmt={fmts[i]!r} (only MJPG 'avi' "
                    "in this environment; an ffmpeg-backed decoder would "
                    "slot in here)"
                )
            vid = batch["video_id"][i].as_py()
            for frame_idx, arr in self._avi.decode_avi_frames(
                batch[self.bytes_col][i].as_py(),
                every_n=self.every_n,
                limit=self.max_frames,
            ):
                vids.append(vid)
                idxs.append(frame_idx)
                frames.append(arr.tobytes())
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
        return pa.table(
            {
                "video_id": pa.array(vids, batch["video_id"].type),
                "frame_idx": pa.array(idxs, pa.int32()),
                "bytes": pa.array(frames, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(["raw"] * len(vids), pa.string()),
            }
        )


def image_features(ds, concurrency: Any = (1, 8), batch_size: int = 64):
    """Dataset-level helper: the feature stage as an actor pool with a small
    batch size (binary payload rows are large)."""
    return ds.map_batches(
        ImageFeatureStage,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def audio_feature_extract(ds, concurrency: Any = (1, 8), batch_size: int = 64):
    """Dataset-level helper: WAV decode + features as an actor pool."""
    return ds.map_batches(
        AudioFeatureStage,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def video_frame_sample(
    ds,
    every_n: int = 30,
    max_frames: int | None = None,
    concurrency: Any = (1, 8),
    batch_size: int = 8,
):
    """Dataset-level helper: container-layer frame sampling as an actor
    pool. ``batch_size`` defaults tiny — a video row is typically tens of
    MB, and the stage fans out (rows multiply by frames sampled)."""
    return ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"every_n": every_n, "max_frames": max_frames},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def image_resize(ds, size: int = 16, concurrency: Any = (1, 8), batch_size: int = 64):
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"size": size},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
