"""Deterministic synthetic image+caption ``pairs`` table
(BASELINE.json input_hint schema; FIXTURES.md §1).

Schema: (image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
caption: string, phash: int64). Planted near-duplicate clusters with a
ground-truth assignment table; all randomness from one seeded generator —
same (n_rows, seed, …) → byte-identical output.

Cluster kinds planted (each exercises one pipeline modality):
- ``caption``: captions exact/near-dup (1–3 char edits — above the MinHash
  threshold), images independent;
- ``image``: pixels base+bounded-noise (PSNR ≥ 40 dB) or exact copies,
  captions independent;
- ``both``: caption near-dups AND image near-dups;
- ``substring``: long captions (>1 kB) sharing a ≥64-byte substring.
~2% of singleton captions are null (exercises the "na" placeholder rule).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from liken_ray.kernels.phash import phash64

_BASE_WORDS = (
    "sunset beach mountain forest river city skyline portrait macro flower "
    "bridge ocean cloud vintage abstract street market festival lantern "
    "harbor desert canyon glacier meadow valley temple castle garden mural "
    "reflection silhouette aurora harvest monsoon blossom lighthouse dune"
).split()

# expand to a ~1300-word deterministic vocabulary so *distinct* captions are
# realistically dissimilar (a tiny vocab makes unrelated captions share most
# of their character shingles, which no web corpus does)
_SYLLABLES = ["ka", "ri", "to", "me", "lu", "san", "ver", "dol", "nix", "tra",
              "bel", "mor", "zan", "qui", "fen", "gar", "hol", "pex", "rud", "sil"]
_WORDS = list(_BASE_WORDS)
for _a in _SYLLABLES:
    for _b in _SYLLABLES:
        for _c in ("", "a", "or"):
            _WORDS.append(_a + _b + _c)

_TEMPLATES = [
    "a photo of {} and {} near the {}",
    "{} with {} in the background at {}",
    "close-up of {} beside {} during {}",
    "an image showing {} under {} by the {}",
    "scenic {} framed by {} above the {}",
]


def _caption(rng: np.random.Generator) -> str:
    t = _TEMPLATES[rng.integers(len(_TEMPLATES))]
    words = [_WORDS[rng.integers(len(_WORDS))] for _ in range(3)]
    base = t.format(*words)
    # pad to 60-200 chars with extra descriptors (>=60 keeps the shingle
    # Jaccard of 1-3-edit near-dups comfortably above the LSH threshold)
    while len(base) < int(rng.integers(60, 200)):
        base += " " + _WORDS[rng.integers(len(_WORDS))]
    return base


def _near_dup_caption(rng: np.random.Generator, caption: str) -> str:
    """1-3 small edits: char substitution, token swap, punctuation noise."""
    s = list(caption)
    for _ in range(int(rng.integers(1, 4))):
        op = rng.integers(3)
        if op == 0 and len(s) > 4:  # substitute one char
            i = int(rng.integers(1, len(s) - 1))
            s[i] = chr(ord("a") + int(rng.integers(26)))
        elif op == 1:  # append punctuation
            s.append(".")
        else:  # duplicate a char
            i = int(rng.integers(len(s)))
            s.insert(i, s[i])
    return "".join(s)


def _gibberish_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(6, 11))
    return "".join(chr(ord("a") + int(rng.integers(26))) for _ in range(n))


def _long_caption(rng: np.random.Generator, shared: str) -> str:
    """Long caption = gibberish filler around an explicit shared run.

    The filler MUST be gibberish, not vocab words: char-ngram set Jaccard
    saturates with document length (two long texts over a ~1k-word vocab
    measure J≈0.52 on 3-grams — genuinely above the 0.5 verify bar), so
    vocab-word filler makes unrelated long captions real near-dups and the
    planted truth table a lie at large n_rows. Gibberish filler keeps
    random long-pair Jaccard ≈ 0.02 while the planted ``shared`` run stays
    detectable by both the caption sketch and the substring stage."""
    pre = " ".join(_gibberish_word(rng) for _ in range(int(rng.integers(40, 120))))
    post = " ".join(_gibberish_word(rng) for _ in range(int(rng.integers(40, 120))))
    return f"{pre} {shared} {post}"


def _image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _noisy_copy(rng: np.random.Generator, base: np.ndarray) -> np.ndarray:
    """Bounded ±2 noise: MSE <= 4 -> PSNR >= 42 dB (> the 40 dB invariant)."""
    noise = rng.integers(-2, 3, size=base.shape).astype(np.int16)
    return np.clip(base.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def generate_pairs_table(
    n_rows: int,
    seed: int = 42,
    dup_fraction: float = 0.3,
    w: int = 32,
    h: int = 32,
    long_caption_fraction: float = 0.01,
    null_caption_fraction: float = 0.02,
    img_fmt: str = "raw",
) -> tuple[pa.Table, pa.Table]:
    """Returns (pairs_table, truth_table).

    truth_table: (image_id: string, true_cluster_id: int64, kind: string);
    singletons carry their own unique cluster id. ``img_fmt``: "raw"
    (w*h*3 bytes) or "png" (stdlib-codec compressed payloads — exercises
    the real decode path end to end).
    """
    if img_fmt == "png":
        from liken_ray.kernels.png import encode_png

        _enc = encode_png
    elif img_fmt == "raw":
        _enc = None
    else:
        raise ValueError(f"img_fmt must be 'raw' or 'png', got {img_fmt!r}")
    rng = np.random.default_rng(seed)

    image_ids: list[str] = []
    blobs: list[bytes] = []
    captions: list[str | None] = []
    phashes: list[int] = []
    truth_cluster: list[int] = []
    truth_kind: list[str] = []

    target_dup_rows = int(n_rows * dup_fraction)
    kinds = ["caption", "image", "both", "substring"]
    kind_weights = [0.35, 0.3, 0.25, 0.1]

    row = 0
    cluster_id = 0

    def emit(img: np.ndarray, caption: str | None, kind: str, cid: int):
        nonlocal row
        image_ids.append(f"img{row:010d}")
        blobs.append(img.tobytes() if _enc is None else _enc(img))
        captions.append(caption)
        ph = phash64(img)
        # store as signed int64 (parquet-friendly)
        phashes.append(ph - (1 << 64) if ph >= (1 << 63) else ph)
        truth_cluster.append(cid)
        truth_kind.append(kind)
        row += 1

    # planted clusters
    while row < target_dup_rows and row < n_rows - 1:
        size = int(rng.integers(2, 6))
        size = min(size, n_rows - row)
        if size < 2:
            break
        kind = kinds[int(rng.choice(len(kinds), p=kind_weights))]
        base_img = _image(rng, w, h)
        base_cap = _caption(rng)
        if kind == "substring":
            shared = " ".join(
                _WORDS[rng.integers(len(_WORDS))] for _ in range(14)
            )  # ~>= 80 bytes shared run
            for _ in range(size):
                emit(_image(rng, w, h), _long_caption(rng, shared), kind, cluster_id)
        else:
            for k in range(size):
                if kind == "caption":
                    img = _image(rng, w, h)
                    cap = base_cap if k == 0 or rng.random() < 0.5 else _near_dup_caption(rng, base_cap)
                elif kind == "image":
                    img = base_img if k == 0 else (
                        base_img.copy() if rng.random() < 0.3 else _noisy_copy(rng, base_img)
                    )
                    cap = _caption(rng)
                else:  # both
                    img = base_img if k == 0 else _noisy_copy(rng, base_img)
                    cap = base_cap if k == 0 else _near_dup_caption(rng, base_cap)
                emit(img, cap, kind, cluster_id)
        cluster_id += 1

    # singletons
    singleton_cluster = cluster_id
    while row < n_rows:
        if rng.random() < long_caption_fraction:
            cap: str | None = _long_caption(
                rng, " ".join(_WORDS[rng.integers(len(_WORDS))] for _ in range(6))
            )
        elif rng.random() < null_caption_fraction:
            cap = None
        else:
            cap = _caption(rng)
        emit(_image(rng, w, h), cap, "singleton", singleton_cluster)
        singleton_cluster += 1

    pairs = pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([w] * n_rows, pa.int32()),
            "h": pa.array([h] * n_rows, pa.int32()),
            "fmt": pa.array([img_fmt] * n_rows, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )
    truth = pa.table(
        {
            "image_id": pa.array(image_ids, pa.string()),
            "true_cluster_id": pa.array(truth_cluster, pa.int64()),
            "kind": pa.array(truth_kind, pa.string()),
        }
    )
    return pairs, truth


def _generate_shard(args) -> tuple[str, str]:
    out_dir, s, rows, seed, base_row, base_cluster, kwargs = args
    pairs, truth = generate_pairs_table(rows, seed=seed, **kwargs)
    # offset ids so shards compose into one coherent table
    ids = [f"img{base_row + i:010d}" for i in range(pairs.num_rows)]
    pairs = pairs.set_column(0, "image_id", pa.array(ids, pa.string()))
    truth = truth.set_column(0, "image_id", pa.array(ids, pa.string()))
    shifted = pa.array(
        [c + base_cluster for c in truth["true_cluster_id"].to_pylist()], pa.int64()
    )
    truth = truth.set_column(1, "true_cluster_id", shifted)
    data_dir = os.path.join(out_dir, "pairs")
    ppath = os.path.join(data_dir, f"part-{s:05d}.parquet")
    tpath = os.path.join(out_dir, f"truth-{s:05d}.parquet")
    pq.write_table(pairs, ppath)
    pq.write_table(truth, tpath)
    return ppath, tpath


def write_pairs_dataset(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    shards: int = 4,
    parallel: bool = True,
    **kwargs,
) -> dict[str, str]:
    """Write the pairs table as ``shards`` parquet files (one per shard —
    resumable, partition-aligned input) plus truth.parquet.

    Shards are generated independently (seed+shard, disjoint id/cluster
    ranges — planted clusters never span shards) so generation
    parallelizes across processes; still fully deterministic for a given
    (n_rows, seed, shards).
    """
    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "pairs")
    os.makedirs(data_dir, exist_ok=True)
    per = (n_rows + shards - 1) // shards
    jobs = []
    base = 0
    for s in range(shards):
        rows = min(per, n_rows - base)
        if rows <= 0:
            break
        jobs.append((out_dir, s, rows, seed + s, base, base, kwargs))
        base += rows

    if parallel and len(jobs) > 1:
        from concurrent.futures import ProcessPoolExecutor

        workers = min(len(jobs), max(2, (os.cpu_count() or 4) // 2))
        with ProcessPoolExecutor(workers) as ex:
            results = list(ex.map(_generate_shard, jobs))
    else:
        results = [_generate_shard(j) for j in jobs]

    truth_tables = [pq.read_table(t) for _, t in results]
    truth_path = os.path.join(out_dir, "truth.parquet")
    pq.write_table(pa.concat_tables(truth_tables), truth_path)
    for _, t in results:
        os.remove(t)
    return {"pairs": data_dir, "truth": truth_path}
