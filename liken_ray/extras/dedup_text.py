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
    one aggregate shuffle (no per-group Python; key cardinality is
    table-sized) + one distributed hash join of the labels back onto the
    rows."""
    import pyarrow.compute as pc

    import ray.data
    from ray.data.aggregate import Min

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch[id_col], key_col: batch[key_col]})

    keyed = ds.map_batches(project, batch_format="pyarrow").materialize()
    # hash joins never match null keys — handle the null-key group (one
    # cluster, like groupby's null bucket) separately
    nn = keyed.map_batches(
        lambda t: t.filter(pc.is_valid(t[key_col])), batch_format="pyarrow"
    )
    null_ids = keyed.map_batches(
        lambda t: t.filter(pc.is_null(t[key_col])).select([id_col]),
        batch_format="pyarrow",
    )
    mins = nn.groupby(key_col).aggregate(Min(id_col, alias_name="canonical_id"))
    # size the join to the data: each partition is a join actor, and actor
    # spin-up dominates for small tables
    n_rows = keyed.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    num_partitions = max(2, min(cpus, n_rows // 50_000 + 2))
    joined = nn.join(
        mins, "inner", num_partitions=num_partitions, on=(key_col,)
    ).map_batches(
        lambda t: t.select([id_col, "canonical_id"]), batch_format="pyarrow"
    )
    null_agg = null_ids.aggregate(Min(id_col, alias_name="m"))
    null_min = null_agg["m"] if null_agg else None
    if null_min is None:
        return joined
    null_labelled = null_ids.map_batches(
        lambda t: t.append_column(
            "canonical_id", pa.array(np.full(t.num_rows, null_min, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    return joined.union(null_labelled)


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
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.array(
        [i for i, t in enumerate(texts) if t is not None and len(t) >= ngram],
        dtype=np.int64,
    )
    if not len(keep):
        cols = {id_col: pa.array([], pa.int64()), "band": pa.array([], pa.int32()),
                "key": pa.array([], pa.uint64())}
        if with_payload:
            cols[text_col] = pa.array([], batch.schema.field(text_col).type)
        return pa.table(cols)
    kept_texts = [texts[i] for i in keep]
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
