"""Similarity search over an embedding column (``list<float>``).

- ``topk_cosine_bruteforce``: exact top-k — the query matrix is broadcast
  once (``ray.put``), every batch does one numpy matmul and emits its local
  top-k candidates, a final tiny reduce keeps the global top-k. Scales as
  one streaming pass over the corpus; no shuffle.
- ``topk_cosine_ivf``: IVF-style scale path — corpus bucketed by nearest
  of ``n_cells`` sampled centroid vectors (one ``groupby``), queries probe
  only their ``n_probe`` nearest cells.
- ``kmeans_fit``: distributed spherical k-means (Lloyd) for centroid
  refinement — each iteration is one streaming pass emitting per-block
  partial sums (sort + ``reduceat``); the driver reduces O(blocks x k x
  dim). Plugs into both IVF entry points via ``refine_iters``.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray


def _vecs(col) -> np.ndarray:
    """Embedding column -> (n, dim) float64 matrix, zero-copy from the
    Arrow child buffer (``to_pylist`` paid a python object per element).
    Slice-safe via ``flatten()``; ragged rows raise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # flatten() drops null slots, so a silent reshape would misalign
        # rows — reject loudly (a null embedding has no similarity anyway)
        raise ValueError("embedding column contains nulls; drop or fill them first")
    n = len(col)
    if pa.types.is_fixed_size_list(col.type):
        # flatten() honors the array's slice offset; .values is the FULL
        # child buffer and would reshape-fail (or worse) on sliced batches
        vals = col.flatten().to_numpy(zero_copy_only=False)
        return vals.reshape(n, col.type.list_size).astype(np.float64, copy=False)
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(off)
    if len(lens) and (lens != lens[0]).any():
        raise ValueError("ragged embedding column")
    vals = col.flatten().to_numpy(zero_copy_only=False)
    dim = int(lens[0]) if len(lens) else 0
    return vals.reshape(n, dim).astype(np.float64, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def topk_cosine_bruteforce(
    ds,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, similarity), rank 0-based by
    descending similarity with neighbor_id as the deterministic tie-break.
    """
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qm, list(query_ids)))

    def local_topk(batch: pa.Table) -> pa.Table:
        qmat, qids = ray.get(q_ref)
        vecs = _vecs(batch[vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if vecs.size == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "similarity": pa.array([], pa.float64())}
            )
        nv = _normalize(vecs)
        sims = qmat @ nv.T  # (nq, nb)
        nq, nb = sims.shape
        kk = min(k + (1 if exclude_self else 0), nb)
        out_q, out_n, out_s = [], [], []
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        for qi in range(nq):
            for j in part[qi]:
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "similarity": pa.array(out_s, pa.float64()),
            }
        )

    candidates = ds.map_batches(local_topk, batch_format="pyarrow").take_all()

    best: dict[int, list] = {}
    for r in candidates:
        q = r["query_id"]
        if exclude_self and r["neighbor_id"] == q:
            continue
        # heap key: (similarity, -neighbor_id) so ties prefer smaller id
        heapq.heappush(best.setdefault(q, []), (r["similarity"], -r["neighbor_id"]))
        if len(best[q]) > k:
            heapq.heappop(best[q])

    rows_q, rows_n, rows_r, rows_s = [], [], [], []
    for q in sorted(best):
        ranked = sorted(best[q], key=lambda t: (-t[0], -t[1]))
        for rank, (sim, neg_id) in enumerate(ranked):
            rows_q.append(q)
            rows_n.append(-neg_id)
            rows_r.append(rank)
            rows_s.append(sim)
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "rank": pa.array(rows_r, pa.int64()),
            "similarity": pa.array(rows_s, pa.float64()),
        }
    )


def topk_cosine_ivf(
    ds,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
    refine_iters: int = 0,
) -> pa.Table:
    """IVF-bucketed approximate top-k: centroids from a seeded sample of the
    corpus (optionally Lloyd-refined with ``refine_iters`` spherical
    k-means passes, see ``kmeans_fit``); each query scans only its
    ``n_probe`` nearest cells."""
    centroids = _init_centroids(ds, n_cells, vec_col, seed)
    if centroids is None:
        return topk_cosine_bruteforce(ds, queries, query_ids, k, vec_col, id_col)
    if refine_iters > 0:
        centroids, _ = kmeans_fit(
            ds, n_cells, vec_col, iters=refine_iters, seed=seed, init=centroids
        )
    c_ref = ray.put(centroids)

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probe_cells = np.argsort(-(qm @ centroids.T), axis=1)[:, :n_probe]
    wanted = np.unique(probe_cells.reshape(-1))
    w_ref = ray.put(wanted)

    def cell_filter(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        want = ray.get(w_ref)
        vecs = _vecs(batch[vec_col])
        if vecs.size == 0:
            return batch.slice(0, 0)
        cells = np.argmax(_normalize(vecs) @ cents.T, axis=1)
        return batch.filter(pa.array(np.isin(cells, want)))

    probed = ds.map_batches(cell_filter, batch_format="pyarrow")
    return topk_cosine_bruteforce(probed, queries, query_ids, k, vec_col, id_col)


def _init_centroids(
    ds, n_cells: int, vec_col: str, seed: int, sample_factor: int = 20
) -> np.ndarray | None:
    """Seeded-sample centroid init shared by every IVF entry point.
    Returns None when the corpus is too small to fill ``n_cells``."""
    sample = ds.random_sample(
        min(1.0, (n_cells * sample_factor) / max(1, ds.count())), seed=seed
    )
    sample_vecs = np.array(
        [r[vec_col] for r in sample.take(n_cells * sample_factor)],
        dtype=np.float64,
    )
    if len(sample_vecs) < n_cells:
        return None
    rng = np.random.default_rng(seed)
    return _normalize(sample_vecs[rng.choice(len(sample_vecs), n_cells, replace=False)])


def kmeans_fit(
    ds,
    n_cells: int,
    vec_col: str = "embedding",
    iters: int = 5,
    seed: int = 11,
    tol: float = 1e-4,
    init: np.ndarray | None = None,
) -> tuple[np.ndarray, dict]:
    """Distributed spherical k-means over an embedding column.

    Lloyd iterations as streaming passes: centroids broadcast once per
    round (``ray.put``), every block emits per-cell partial sums/counts/
    similarity (sort + ``reduceat``, no python loop), the driver reduces
    O(blocks x k x dim) partials into k new centroids — the dataset is
    never materialized and nothing shuffles. Assignments maximize cosine
    similarity (vectors and centroids unit-normalized), so the objective
    (mean member-to-centroid cosine) is monotone non-decreasing; empty
    cells keep their previous centroid (deterministic).

    Returns ``(centroids, info)`` with ``info["objective_history"]`` one
    mean-similarity entry per completed iteration.
    """
    # caller-supplied inits must be unit rows too: spherical assignment
    # argmaxes the dot product, so an unnormalized centroid with a large
    # norm would capture nearly every vector
    centroids = (
        _normalize(np.asarray(init, dtype=np.float64))
        if init is not None
        else _init_centroids(ds, n_cells, vec_col, seed)
    )
    if centroids is None:
        raise ValueError(f"corpus too small to fit {n_cells} cells")
    dim = centroids.shape[1]
    history: list[float] = []
    # the Lloyd loop re-reads ds once per iteration: cache it, and
    # normalize tiny block counts so the passes parallelize (CLAUDE.md:
    # normalize block counts before iterative Dataset loops)
    ds = ds.materialize()
    try:
        nb = ds.num_blocks()
    except Exception:
        nb = None
    if nb is not None and nb < 8:
        ds = ds.repartition(8).materialize()

    def partials_fn(c_ref):
        def partials(batch: pa.Table) -> pa.Table:
            cents = ray.get(c_ref)
            vecs = _vecs(batch[vec_col])
            if vecs.size == 0:
                return pa.table(
                    {
                        "cell": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            nv = _normalize(vecs)
            sims = nv @ cents.T
            cells = np.argmax(sims, axis=1).astype(np.int64)
            best = sims[np.arange(len(cells)), cells]
            order = np.argsort(cells, kind="stable")
            sc = cells[order]
            starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
            csum = np.zeros(len(sc) + 1)
            np.cumsum(best[order], out=csum[1:])
            ends = np.r_[starts[1:], len(sc)]
            return pa.table(
                {
                    "cell": pa.array(sc[starts], pa.int64()),
                    "cnt": pa.array(ends - starts, pa.int64()),
                    "sim": pa.array(csum[ends] - csum[starts], pa.float64()),
                    "vsum": pa.array(
                        list(np.add.reduceat(nv[order], starts, axis=0)),
                        pa.list_(pa.float64()),
                    ),
                }
            )

        return partials

    info: dict = {"n_cells": n_cells, "iters_run": 0, "converged": False}
    for _ in range(iters):
        c_ref = ray.put(centroids)
        sums = np.zeros((n_cells, dim))
        counts = np.zeros(n_cells, dtype=np.int64)
        sim_total = 0.0
        for r in ds.map_batches(partials_fn(c_ref), batch_format="pyarrow").take_all():
            c = r["cell"]
            counts[c] += r["cnt"]
            sums[c] += np.asarray(r["vsum"])
            sim_total += r["sim"]
        n_total = int(counts.sum())
        history.append(sim_total / max(n_total, 1))
        info["iters_run"] += 1
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = _normalize(sums[nonempty])
        if len(history) >= 2 and history[-1] - history[-2] <= tol:
            info["converged"] = True
            break
    info["objective_history"] = history
    return centroids, info


# ---------------------------------------------------------------------------
# persisted IVF index: probe-time IO pruning, not just compute pruning
# ---------------------------------------------------------------------------


def build_ivf_index(
    ds,
    out_dir: str,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
    refine_iters: int = 0,
) -> dict:
    """Materialize a real inverted-file index: the corpus is written as
    cell-partitioned parquet (``out_dir/cell=<i>/``) plus a centroids
    sidecar. Unlike ``topk_cosine_ivf`` (which filters *compute* but still
    scans every block), a query against the persisted index READS only its
    probed cells — IO pruning, the property that matters at 100 TB.
    ``refine_iters`` > 0 Lloyd-refines the sampled centroids first
    (``kmeans_fit``) for tighter, better-balanced cells.

    One shuffle (repartition by cell via groupby-free partitioned write);
    returns {"dir", "n_cells", "dim"}.
    """
    import json
    import os

    centroids = _init_centroids(ds, n_cells, vec_col, seed)
    if centroids is None:
        raise ValueError(f"corpus too small to build {n_cells} cells")
    if refine_iters > 0:
        centroids, _ = kmeans_fit(
            ds, n_cells, vec_col, iters=refine_iters, seed=seed, init=centroids
        )
    c_ref = ray.put(centroids)

    def assign_cell(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        vecs = _vecs(batch[vec_col])
        if vecs.size == 0:
            return batch.append_column("cell", pa.array([], pa.int64()))
        cells = np.argmax(_normalize(vecs) @ cents.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cells))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign_cell, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    meta = {"n_cells": int(n_cells), "dim": int(centroids.shape[1])}
    with open(os.path.join(out_dir, "ivf_meta.json"), "w") as f:
        json.dump(meta, f)
    return {"dir": out_dir, **meta}


def topk_cosine_ivf_indexed(
    index_dir: str,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Query a persisted IVF index: reads ONLY the probed cell partitions
    (``cell=<i>`` directories) — the unprobed corpus never leaves storage."""
    import os

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probe_cells = np.argsort(-(qm @ centroids.T), axis=1)[:, :n_probe]
    wanted = sorted(set(probe_cells.reshape(-1).tolist()))

    import glob

    from liken_ray.io.read import safe_read_parquet

    paths = [
        f
        for c in wanted
        for f in sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    ]
    if not paths:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "similarity": pa.array([], pa.float64()),
            }
        )
    probed = safe_read_parquet(paths, columns=[id_col, vec_col])
    return topk_cosine_bruteforce(probed, queries, query_ids, k, vec_col, id_col)
