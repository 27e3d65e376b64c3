"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata (the
input_hint pattern: ``bytes, w, h, fmt``). Heavy decode / feature work runs
in actor-pool ``map_batches`` stages — setup (decoder tables, model
weights) once per actor, small ``batch_size`` because rows are megabytes.

Image decode is REAL for ``fmt="raw"``, ``"png"`` and ``"jpeg"`` (pure
stdlib codecs, ``kernels/png.py`` / ``kernels/jpeg.py``); audio decode is
REAL for PCM ``"wav"`` (stdlib ``wave`` + numpy, ``kernels/wav.py``).
Other image formats raise ``NotImplementedError`` unless a decoder is
registered via ``liken_ray.kernels.phash.register_decoder``; video stays
a loud stub (no ffmpeg in this sandbox). The Ray-side plumbing —
schemas, actor signatures, batch sizing, output layout — is real and
tested.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from liken_ray.kernels import phash as ph


class ImageFeatureStage:
    """Actor-pool stage: decode → (phash, mean RGB, dims). Decoder lookup
    and DCT basis are actor state."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col
        ph._dct_basis(ph.RESAMPLE)  # build once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        phashes = np.zeros(n, dtype=np.uint64)
        means = np.zeros((n, 3), dtype=np.float64)
        for i in range(n):
            img = ph.decode_image(
                batch[self.bytes_col][i].as_py(),
                batch["w"][i].as_py(),
                batch["h"][i].as_py(),
                batch["fmt"][i].as_py(),
            )
            phashes[i] = np.uint64(ph.phash64(img))
            means[i] = img.reshape(-1, 3).mean(axis=0)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "phash": phashes.view(np.int64),
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


def frame_sample_stub(batch: pa.Table, every_n: int = 30) -> pa.Table:
    """Video frame-sampling stage signature (STUB: video decode needs
    ffmpeg, absent here). Raises so pipelines fail loudly, not silently."""
    del every_n
    raise NotImplementedError(
        "video frame sampling requires an ffmpeg-backed decoder; register "
        "one and replace this stub (schema contract: in = (video_id, bytes, "
        "fmt), out = (video_id, frame_idx, bytes, w, h, fmt='raw'))"
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


def image_resize(ds, size: int = 16, concurrency: Any = (1, 8), batch_size: int = 64):
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"size": size},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
