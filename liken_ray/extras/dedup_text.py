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

import ray
import ray.data

from liken_ray.engine.components import KeyedUnionFind
from liken_ray.kernels import minhash as mh
from liken_ray.extras import text as tx


def canonical_exact(ds, key_col: str = "text", id_col: str = "doc_id"):
    """(id, canonical_id) where canonical = min id per exact key value —
    one groupby shuffle, labels emitted per group (no pair
    materialization)."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch[id_col], key_col: batch[key_col]})

    keyed = ds.map_batches(project, batch_format="pyarrow")

    def per_group(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: ids,
                "canonical_id": np.full(len(ids), ids.min(), dtype=np.int64),
            }
        )

    return keyed.groupby(key_col).map_groups(per_group, batch_format="pyarrow")


def _edges_to_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    uf = KeyedUnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.labels()


def _labelled(ds, labels: dict[int, int], id_col: str = "doc_id"):
    ref = ray.put(labels)

    def assign(batch: pa.Table) -> pa.Table:
        lab = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        canon = np.array([lab.get(int(i), int(i)) for i in ids], dtype=np.int64)
        return pa.table({id_col: ids, "canonical_id": canon})

    return ds.map_batches(assign, batch_format="pyarrow")


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_perm: int = 128,
    threshold: float = 0.8,
):
    """MinHash-LSH near-dup labels: (doc_id, canonical_id)."""
    b, r = mh.optimal_param(threshold, num_perm)

    def bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = [i for i, t in enumerate(texts) if t is not None and len(t) >= ngram]
        texts = [texts[i] for i in keep]
        ids = ids[keep]
        if not len(ids):
            return pa.table(
                {id_col: pa.array([], pa.int64()), "band": pa.array([], pa.int32()),
                 "key": pa.array([], pa.uint64())}
            )
        sigs = mh.batch_signatures(texts, ngram, num_perm)
        keys = mh.band_keys(sigs, b, r)
        return pa.table(
            {
                id_col: np.repeat(ids, b),
                "band": np.tile(np.arange(b, dtype=np.int32), len(ids)),
                "key": keys.reshape(-1),
            }
        )

    from liken_ray.engine.blocking import bucket_edges, collect_edges

    banded = ds.map_batches(bands, batch_format="pyarrow")
    labels = _edges_to_labels(collect_edges(bucket_edges(banded, ["band", "key"], id_col)))
    return _labelled(ds, labels, id_col)


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    bands: int = 4,
    max_hamming: int = 3,
):
    """SimHash band-blocked near-dup labels (Hamming <= max_hamming)."""
    from liken_ray.kernels.phash import phash_band_keys

    def sim(batch: pa.Table) -> pa.Table:
        return tx.simhash64(batch, text_col, ngram)

    sims = ds.map_batches(sim, batch_format="pyarrow").materialize()

    def band_stage(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = phash_band_keys(sh, bands)
        return pa.table(
            {
                id_col: np.repeat(ids, bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), len(ids)),
                "key": keys.reshape(-1),
                "sh": np.repeat(sh, bands).view(np.int64),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        sh = group["sh"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        _, first = np.unique(ids, return_index=True)
        ids, sh = ids[first], sh[first]
        k = len(ids)
        if k < 2:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        src, dst = [], []
        for i in range(k):
            x = np.bitwise_xor(sh[i], sh[i + 1 :])
            ham = np.array([bin(int(v)).count("1") for v in x])
            for off in np.flatnonzero(ham <= max_hamming):
                src.append(int(ids[i]))
                dst.append(int(ids[i + 1 + off]))
        return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})

    edge_rows = (
        sims.map_batches(band_stage, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pyarrow")
        .take_all()
    )
    labels = _edges_to_labels([(r_["src"], r_["dst"]) for r_ in edge_rows])
    return _labelled(ds, labels, id_col)


def ngram_jaccard_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.7,
    num_perm: int = 128,
):
    """LSH-blocked candidates verified by exact n-gram Jaccard > threshold."""
    b, r = mh.optimal_param(threshold, num_perm)

    cand_ds = minhash_dedup(ds, text_col, id_col, ngram, num_perm, threshold)
    # minhash_dedup gives transitive labels; recover candidate pairs as
    # (member, canonical) and verify each against exact jaccard
    cand_rows = [r_ for r_ in cand_ds.take_all() if r_[id_col] != r_["canonical_id"]]
    need = {r_[id_col] for r_ in cand_rows} | {r_["canonical_id"] for r_ in cand_rows}
    ref = ray.put(need)

    def fetch(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(i) in want for i in ids), dtype=bool, count=len(ids))
        return pa.table({id_col: ids[mask], "t": batch[text_col].filter(pa.array(mask))})

    texts = {r_[id_col]: r_["t"] for r_ in ds.map_batches(fetch, batch_format="pyarrow").take_all()}

    def shingles(t):
        return {t[i : i + ngram] for i in range(len(t) - ngram + 1)}

    edges = []
    cache: dict[int, set] = {}
    for r_ in cand_rows:
        a, c = int(r_[id_col]), int(r_["canonical_id"])
        ta, tc = texts.get(a), texts.get(c)
        if ta is None or tc is None:
            continue
        sa = cache.setdefault(a, shingles(ta))
        sc = cache.setdefault(c, shingles(tc))
        inter = len(sa & sc)
        union = len(sa) + len(sc) - inter
        if union and inter / union > threshold:
            edges.append((a, c))
    labels = _edges_to_labels(edges)
    return _labelled(ds, labels, id_col)


def embedding_cosine_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
):
    """Near-dup vectors: random-hyperplane LSH buckets, brute-force cosine
    within buckets, strict ``> threshold``."""
    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
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
        return pa.table(
            {id_col: ids, "bucket": bucket, "v": pa.array(vecs.tolist(), pa.list_(pa.float64()))}
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        _, first = np.unique(ids, return_index=True)
        vecs = np.array(group["v"].to_pylist(), dtype=np.float64)[first]
        ids = ids[first]
        k = len(ids)
        if k < 2:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        nv = vecs / norms[:, None]
        sims = nv @ nv.T
        iu, ju = np.triu_indices(k, 1)
        hit = sims[iu, ju] > threshold
        return pa.table(
            {
                "src": ids[iu[hit]].astype(np.int64),
                "dst": ids[ju[hit]].astype(np.int64),
            }
        )

    edge_rows = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .take_all()
    )
    labels = _edges_to_labels([(r_["src"], r_["dst"]) for r_ in edge_rows])
    return _labelled(ds, labels, id_col)
