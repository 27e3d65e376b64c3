"""SemDeDup-style semantic deduplication over an embedding column.

The pattern (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): k-means-cluster the embedding
space, then look for near-duplicate pairs ONLY within a cluster — the
cluster assignment replaces an all-pairs O(n^2) scan with k independent
O(m_c^2) scans, and k is chosen so every cell fits one worker.

Dedup rule (deterministic, order- and partition-independent): a row is a
duplicate iff SOME other row in the same cell with a smaller id has
cosine similarity strictly above ``eps``. This "dominance by any smaller
id" rule (rather than greedy keep-one-per-neighborhood) is exactly
SQL-expressible (a correlated EXISTS self-join), which is what lets the
driver hash-check the whole pipeline — assignment argmax AND the intra-cell
scan — against DuckDB (`__ray_entry__.oracle_sql()["semdedup_embeddings"]`).

Scale notes (the 100-TB contract):
- Cell assignment is one streaming ``map_batches`` pass with the centroid
  matrix broadcast once via ``ray.put`` — no shuffle, no driver loop.
- The intra-cell scan is ``groupby("cell").map_groups`` — ONE hash shuffle
  on a key whose cardinality the caller controls (``n_cells``). Per-task
  memory is O(cell_rows x dim) and compute O(cell_rows^2) *by design*:
  that is SemDeDup's own cost model, and ``n_cells`` must scale with the
  corpus so cells stay ~constant-sized (the paper used 50k cells for 100M
  embeddings). The matmul is tiled (``tile`` rows at a time) so transient
  memory is O(tile x cell_rows), not O(cell_rows^2).
- Centroids come from the repo's distributed spherical k-means
  (`liken_ray/extras/ann.kmeans_fit`) unless the caller passes a fixed
  matrix (the oracle query does, for determinism).

No analogue in the reference repo (/root/reference); this extends the
reference's embedding-free dedupers (dedupers/core.py) to the
embedding-table modality the BASELINE target needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from liken_ray.extras.ann import _normalize, _vecs, kmeans_fit
from liken_ray.extras.dedup_text import _vec_matrix

__all__ = ["semdedup"]


def semdedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 0.3,
    n_cells: int = 8,
    centroids: np.ndarray | None = None,
    kmeans_iters: int = 3,
    seed: int = 11,
    tile: int = 1024,
):
    """Semantic dedup: k-means cells + exact intra-cell cosine scan.

    Returns a Dataset with one row per input row: ``(id_col, cell int64,
    is_dup bool)``. ``is_dup`` is True iff another same-cell row with a
    smaller id has cosine similarity > ``eps``; the smallest id of every
    duplicate neighborhood therefore always survives. Ids must be unique
    (ties would make "smaller id" ill-defined).

    ``centroids`` (optional, (k, dim)) pins the cell structure — rows are
    assigned to ``argmax_j cos(v, centroids[j])`` with the FIRST maximal
    index winning ties; when omitted, centroids are fitted with the
    distributed spherical k-means in this repo.
    """
    if centroids is None:
        centroids, _ = kmeans_fit(
            ds, n_cells, vec_col=vec_col, iters=max(1, kmeans_iters), seed=seed
        )
    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    if cents.ndim != 2:
        raise ValueError(f"centroids must be 2-D, got shape {cents.shape}")
    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        vecs = _vecs(batch[vec_col])
        if vecs.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "v": pa.array([], pa.list_(pa.float64())),
                }
            )
        cm = ray.get(c_ref)
        nv = _normalize(vecs)
        # argmax of the dot against unit centroids == argmax cosine;
        # np.argmax takes the FIRST maximal index (the documented tiebreak)
        cells = np.argmax(nv @ cm.T, axis=1).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pa.array(nv.reshape(-1), pa.float64())
        v = pa.ListArray.from_arrays(
            pa.array(np.arange(len(ids) + 1, dtype=np.int32) * nv.shape[1]), flat
        )
        return pa.table({id_col: ids, "cell": cells, "v": v})

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def cell_scan(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "is_dup": pa.array([], pa.bool_()),
                }
            )
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = _vec_matrix(group["v"])[order]  # already unit rows
        dup = np.zeros(m, dtype=bool)
        # tiled upper-triangle scan: row i is a dup iff any j<i (smaller
        # id, ids are sorted) has dot > eps. Transient memory O(tile x m).
        for a in range(1, m, tile):
            b = min(a + tile, m)
            sims = mat[a:b] @ mat[:b].T
            mask = np.arange(b)[None, :] < np.arange(a, b)[:, None]
            dup[a:b] = ((sims > eps) & mask).any(axis=1)
        cell = group["cell"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "is_dup": pa.array(dup),
            }
        )

    return assigned.groupby("cell").map_groups(cell_scan, batch_format="pyarrow")
