"""Document-dedup pipelines for training-data curation, each expressed as
Dataset transforms over the ``documents`` table:

- exact (hash/groupby) dedup and canonical labelling;
- MinHash-LSH near-dup clustering (datasketch-parity kernel);
- SimHash Hamming-band near-dup clustering;
- n-gram Jaccard verified dedup (LSH-blocked, exact-Jaccard verify);
- embedding cosine near-dup over ``embeddings`` (brute-force within random
  hyperplane LSH buckets).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from liken_ray.engine.components import KeyedUnionFind
from liken_ray.kernels import minhash as mh
from liken_ray.extras import text as tx


def canonical_exact(ds, key_col: str = "text", id_col: str = "doc_id"):
    """(id, canonical_id) where canonical = min id per exact key value.

    ONE shuffle: sentinel-encode the key (``'v'+key`` / ``'n'`` for null,
    so the null group rides the same path as everyone else — no split /
    re-union and no hash join, which never matches null keys), global
    ``sort`` on the encoded key, then a vectorized segmented min-scan per
    sorted block. Runs that straddle block boundaries are stitched through
    O(blocks) per-block summary rows and a tiny broadcast correction map —
    driver work independent of table size (the ``bucket_edges`` pattern)."""
    import pyarrow.compute as pc

    import ray

    from liken_ray.engine.blocking import _key_hash
    from liken_ray.engine.components import apply_label_arrays

    def project(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        k = pc.if_else(
            pc.is_valid(col),
            pc.binary_join_element_wise(pa.scalar("v"), col, pa.scalar("")),
            pa.scalar("n"),
        )
        return pa.table({id_col: batch[id_col], "_k": k})

    def scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "canonical_id": pa.array([], pa.int64()),
                             "_bkey": pa.array([], pa.uint64())})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch["_k"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        change = np.ones(n, dtype=bool)
        if n > 1:
            change[1:] = pc.not_equal(k.slice(1), k.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, n))
        run_min = np.minimum.reduceat(ids, starts)
        canon = np.repeat(run_min, lens)
        # first/last run may continue into neighbouring blocks: tag their
        # rows with a key hash and emit one summary row per boundary run
        bkey = np.zeros(n, dtype=np.uint64)
        srows_id, srows_canon, srows_bkey = [], [], []
        for ri in {0, len(starts) - 1}:
            s = int(starts[ri])
            h = _key_hash((k[s].as_py(),))
            bkey[s : s + int(lens[ri])] = h
            srows_id.append(-1)
            srows_canon.append(int(run_min[ri]))
            srows_bkey.append(h)
        out = pa.table({id_col: ids, "canonical_id": canon, "_bkey": bkey})
        summ = pa.table({id_col: pa.array(srows_id, pa.int64()),
                         "canonical_id": pa.array(srows_canon, pa.int64()),
                         "_bkey": pa.array(srows_bkey, pa.uint64())})
        return pa.concat_tables([out, summ])

    scanned = (
        ds.map_batches(project, batch_format="pyarrow")
        .sort("_k")
        .map_batches(scan, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    summaries = scanned.map_batches(
        lambda t: t.filter(pc.equal(t[id_col], -1)), batch_format="pyarrow"
    ).take_all()
    fix: dict[int, int] = {}
    for r in summaries:
        h = r["_bkey"]
        m = fix.get(h)
        fix[h] = r["canonical_id"] if m is None else min(m, r["canonical_id"])
    fkeys = np.array(sorted(fix), dtype=np.uint64)
    fvals = np.array([fix[h] for h in fkeys.tolist()], dtype=np.int64)
    ref = ray.put((fkeys, fvals))

    def fixup(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch[id_col], -1))
        bk = t["_bkey"].to_numpy(zero_copy_only=False)
        canon = t["canonical_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        boundary = bk != 0
        if boundary.any():
            keys, vals = ray.get(ref)
            canon = canon.copy()
            canon[boundary] = vals[np.searchsorted(keys, bk[boundary])]
        return pa.table({id_col: t[id_col], "canonical_id": canon})

    return scanned.map_batches(fixup, batch_format="pyarrow")


def _edges_to_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    uf = KeyedUnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.labels()


def _labelled(ds, labels: dict[int, int], id_col: str = "doc_id"):
    from liken_ray.engine.components import labelled_dataset

    return labelled_dataset(ds, labels, id_col)


def _minhash_band_rows(
    batch: pa.Table,
    *,
    text_col: str,
    id_col: str,
    ngram: int,
    num_perm: int,
    b: int,
    r: int,
    with_payload: bool,
) -> pa.Table:
    """(id, band, key[, text]) band rows for one batch. ``with_payload``
    replicates the text onto its band rows so candidate pairs can be
    verified inside the sorted blocks (flagship pattern)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # vectorized null/too-short filter (no python row loop before the
    # signature kernel): utf8_length is codepoint-exact like len(str)
    m = pc.fill_null(pc.greater_equal(pc.utf8_length(col), ngram), False)
    keep = np.flatnonzero(m.to_numpy(zero_copy_only=False))
    if not len(keep):
        cols = {id_col: pa.array([], pa.int64()), "band": pa.array([], pa.int32()),
                "key": pa.array([], pa.uint64())}
        if with_payload:
            cols[text_col] = pa.array([], batch.schema.field(text_col).type)
        return pa.table(cols)
    kept = col.filter(m)
    kept_texts = kept.to_pylist()
    ids = ids[keep]
    sigs = mh.batch_signatures(kept_texts, ngram, num_perm)
    keys = mh.band_keys(sigs, b, r)
    n = len(ids)
    cols = {
        id_col: np.repeat(ids, b),
        "band": np.tile(np.arange(b, dtype=np.int32), n),
        "key": keys.reshape(-1),
    }
    if with_payload:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[text_col] = col.take(pa.array(np.repeat(keep, b), pa.int64()))
    return pa.table(cols)


def minhash_labels(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_perm: int = 128,
    threshold: float = 0.8,
) -> dict[int, int]:
    """MinHash-LSH near-dup label map {id: canonical} (dup-sized — only
    clustered rows appear; everything else is implicitly its own
    canonical). The driver-side object is edge/dup-sized, never
    table-sized."""
    b, r = mh.optimal_param(threshold, num_perm)

    from liken_ray.engine.blocking import bucket_edges, collect_edges

    banded = ds.map_batches(
        _minhash_band_rows,
        fn_kwargs=dict(
            text_col=text_col, id_col=id_col, ngram=ngram, num_perm=num_perm,
            b=b, r=r, with_payload=False,
        ),
        batch_format="pyarrow",
    )
    return _edges_to_labels(collect_edges(bucket_edges(banded, ["band", "key"], id_col)))


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_perm: int = 128,
    threshold: float = 0.8,
):
    """MinHash-LSH near-dup labels: (doc_id, canonical_id)."""
    labels = minhash_labels(ds, text_col, id_col, ngram, num_perm, threshold)
    return _labelled(ds, labels, id_col)


def simhash_verify_kernel(batch: pa.Table, sp: np.ndarray, dp: np.ndarray, *, maxh: int):
    """Vectorized SWAR Hamming <= maxh over candidate pair positions."""
    from liken_ray.kernels.phash import popcount64

    sh = batch["sh"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    return popcount64(np.bitwise_xor(sh[sp], sh[dp])) <= maxh


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    bands: int = 4,
    max_hamming: int = 3,
    bucket_pair_cap: int = 64,
):
    """SimHash band-blocked near-dup labels (Hamming <= max_hamming),
    verified inside the sorted blocks: band rows carry the 64-bit simhash
    as payload, ``bucket_edges`` runs the SWAR-popcount kernel per block —
    no per-bucket ``map_groups``, no per-row Python popcount."""
    import functools

    from liken_ray.engine.blocking import bucket_edges
    from liken_ray.kernels.phash import phash_band_keys

    def band_stage(batch: pa.Table) -> pa.Table:
        sims = tx.simhash64(batch, text_col, ngram)
        sh = sims["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        ids = sims[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = phash_band_keys(sh, bands)
        return pa.table(
            {
                id_col: np.repeat(ids, bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), len(ids)),
                "key": keys.reshape(-1),
                "sh": np.repeat(sh, bands).view(np.int64),
            }
        )

    banded = ds.map_batches(band_stage, batch_format="pyarrow")
    edges = bucket_edges(
        banded,
        ["band", "key"],
        id_col,
        pair_cap=bucket_pair_cap,
        payload_cols=["sh"],
        verify_fn=functools.partial(simhash_verify_kernel, maxh=max_hamming),
    )
    return _labelled(ds, _edges_to_labels(edges), id_col)


def jaccard_verify_kernel(
    batch: pa.Table, sp: np.ndarray, dp: np.ndarray, *, text_col: str, ngram: int, tmin: float
):
    """Exact char-ngram Jaccard > tmin over candidate pair positions —
    sorted rolling-hash gram arrays (over code points, matching Python
    ``set(text[i:i+n])`` shingling) cached per involved row."""
    from liken_ray.kernels import suffix as sx

    texts = batch[text_col].to_pylist()
    grams: dict[int, np.ndarray] = {}

    def g_of(pos: int) -> np.ndarray:
        g = grams.get(pos)
        if g is None:
            g = np.unique(sx.rolling_char_gram_hashes(texts[pos], ngram))
            grams[pos] = g
        return g

    mask = np.zeros(len(sp), dtype=bool)
    for i, (a, b) in enumerate(zip(sp.tolist(), dp.tolist())):
        ga, gb = g_of(a), g_of(b)
        if not len(ga) and not len(gb):
            mask[i] = True
            continue
        inter = len(np.intersect1d(ga, gb, assume_unique=True))
        union = len(ga) + len(gb) - inter
        mask[i] = bool(union) and inter / union > tmin
    return mask


def ngram_jaccard_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.7,
    num_perm: int = 128,
    bucket_pair_cap: int = 64,
):
    """LSH-blocked candidates verified by exact n-gram Jaccard > threshold.

    The verification happens inside the sorted band blocks on the actual
    band-collision pairs (text travels as verify payload) — nothing but
    verified edges reaches the driver, and transitive chains only form
    through pairs that individually pass the exact-Jaccard check."""
    import functools

    from liken_ray.engine.blocking import bucket_edges

    b, r = mh.optimal_param(threshold, num_perm)
    banded = ds.map_batches(
        _minhash_band_rows,
        fn_kwargs=dict(
            text_col=text_col, id_col=id_col, ngram=ngram, num_perm=num_perm,
            b=b, r=r, with_payload=True,
        ),
        batch_format="pyarrow",
    )
    edges = bucket_edges(
        banded,
        ["band", "key"],
        id_col,
        pair_cap=bucket_pair_cap,
        payload_cols=[text_col],
        verify_fn=functools.partial(
            jaccard_verify_kernel, text_col=text_col, ngram=ngram, tmin=threshold
        ),
    )
    return _labelled(ds, _edges_to_labels(edges), id_col)


def _vec_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy when the
    lists are equal-length (the embedding-table case)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and col.null_count == 0:
        offsets = np.asarray(col.offsets)
        lens = np.diff(offsets)
        if len(lens) and (lens == lens[0]).all() and lens[0] > 0:
            flat = np.asarray(col.flatten(), dtype=np.float64)
            return flat.reshape(len(lens), int(lens[0]))
    return np.array(col.to_pylist(), dtype=np.float64)


def cosine_verify_kernel(
    batch: pa.Table, sp: np.ndarray, dp: np.ndarray, *, vec_col: str, threshold: float
):
    """Vectorized cosine > threshold over candidate pair positions — one
    row-normalization plus a per-pair einsum dot; never an all-pairs
    ``nv @ nv.T`` (the pair list is already capped by ``bucket_edges``)."""
    nv = _vec_matrix(batch[vec_col])
    norms = np.linalg.norm(nv, axis=1)
    norms[norms == 0] = 1.0
    nv = nv / norms[:, None]
    return np.einsum("ij,ij->i", nv[sp], nv[dp]) > threshold


def embedding_cosine_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    bucket_pair_cap: int = 64,
):
    """Near-dup vectors: random-hyperplane LSH buckets with in-block cosine
    verification via ``bucket_edges`` (strict ``> threshold``).

    Skew-safe: buckets up to ``bucket_pair_cap`` rows verify all pairs;
    larger (skewed) buckets fall back to star+chain candidates, so a bucket
    of k identical vectors costs O(k) verified pairs, never an O(k^2)
    matmul in one task."""
    import functools

    from liken_ray.engine.blocking import bucket_edges

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = _vec_matrix(batch[vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if vecs.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "bucket": pa.array([], pa.uint64()),
                             "v": pa.array([], pa.list_(pa.float64()))})
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], n_planes))
        bits = (vecs @ planes) > 0
        bucket = np.zeros(len(ids), dtype=np.uint64)
        for i in range(n_planes):
            bucket |= bits[:, i].astype(np.uint64) << np.uint64(i)
        flat = pa.array(vecs.reshape(-1), pa.float64())
        v = pa.ListArray.from_arrays(
            pa.array(np.arange(len(ids) + 1, dtype=np.int32) * vecs.shape[1]), flat
        )
        return pa.table({id_col: ids, "bucket": bucket, "v": v})

    banded = ds.map_batches(bucketize, batch_format="pyarrow")
    edges = bucket_edges(
        banded,
        ["bucket"],
        id_col,
        pair_cap=bucket_pair_cap,
        payload_cols=["v"],
        verify_fn=functools.partial(
            cosine_verify_kernel, vec_col="v", threshold=threshold
        ),
    )
    return _labelled(ds, _edges_to_labels(edges), id_col)
