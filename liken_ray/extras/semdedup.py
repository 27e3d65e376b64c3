"""SemDeDup-style semantic deduplication over an embedding column.

The pattern (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): k-means-cluster the embedding
space, then look for near-duplicate pairs ONLY within a cluster — the
cluster assignment replaces an all-pairs O(n^2) scan with k independent
O(m_c^2) scans.

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
- The intra-cell scan is HOT-CELL SAFE: instead of handing each cell to
  one task (``groupby().map_groups`` — a skewed cell would pin O(m x dim)
  memory and O(m^2) compute in a single worker), rows are range-sorted by
  ``(cell, id)`` — the only shuffle — and each sorted BLOCK is scanned by
  its own task: an in-block per-cell-segment upper-triangle pass plus, for
  the block's first cell only, a streamed scan against the earlier blocks
  that end in that same cell (fetched ONE AT A TIME via nested ObjectRefs,
  never materialized together). Per-task memory is O(block_rows x dim +
  tile^2) regardless of cell skew; a cell spanning B blocks costs its
  O(m_c^2) dot products (SemDeDup's own cost model) spread across B tasks
  instead of concentrated in one. The driver holds only O(blocks) (first,
  last)-cell scalars.
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
import ray.data
from ray.data.block import BlockAccessor

from liken_ray.extras.ann import _normalize, _vecs, kmeans_fit
from liken_ray.extras.curation import _exact_ids
from liken_ray.extras.dedup_text import _vec_matrix

__all__ = ["semdedup"]


def _dominates_tiled(
    seg: np.ndarray,
    others: np.ndarray,
    eps: float,
    tile: int,
    col_lo: np.ndarray | None = None,
    col_hi: np.ndarray | None = None,
) -> np.ndarray:
    """``any(seg @ others.T > eps)`` per seg row, tiled on BOTH axes so the
    transient sims buffer is at most ``tile x tile`` floats. ``col_lo`` /
    ``col_hi`` (optional, per seg row) restrict row i to columns in
    ``[col_lo[i], col_hi[i])`` — the in-block case, where a row may only
    see EARLIER rows of ITS OWN cell run; omitted means every column
    counts (the cross-block prefix case, where all others are same-cell
    smaller-id rows by sort order)."""
    n = len(seg)
    dup = np.zeros(n, dtype=bool)
    m = len(others)
    if n == 0 or m == 0:
        return dup
    for a in range(0, n, tile):
        b = min(a + tile, n)
        hi = int(col_hi[a:b].max()) if col_hi is not None else m
        for c in range(0, hi, tile):
            d = min(c + tile, hi)
            if not (~dup[a:b]).any():
                break
            sims = seg[a:b] @ others[c:d].T
            hit = sims > eps
            cols = np.arange(c, d)[None, :]
            if col_hi is not None:
                hit &= cols < col_hi[a:b, None]
            if col_lo is not None:
                hit &= cols >= col_lo[a:b, None]
            dup[a:b] |= hit.any(axis=1)
    return dup


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
        ids = _exact_ids(batch[id_col], id_col)
        flat = pa.array(nv.reshape(-1), pa.float64())
        v = pa.ListArray.from_arrays(
            pa.array(np.arange(len(ids) + 1, dtype=np.int32) * nv.shape[1]), flat
        )
        return pa.table({id_col: ids, "cell": cells, "v": v})

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    # ONE range sort by (cell, id) — the only shuffle. Cells land
    # contiguous; ids ascend within a cell, so "some smaller id" is
    # exactly "some earlier row in the same cell".
    srt = assigned.sort(["cell", id_col]).materialize()
    pairs = [
        (ref, meta)
        for bundle in srt.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows  # Ray's sort emits an empty-SCHEMA block on empty input
    ]
    empty = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("cell", pa.int64()),
         pa.field("is_dup", pa.bool_())]
    ).empty_table()
    if not pairs:
        return ray.data.from_arrow(empty)
    refs = [r for r, _ in pairs]

    @ray.remote
    def cell_span(block) -> tuple[int, int]:
        t = BlockAccessor.for_block(block).to_arrow()
        return int(t["cell"][0].as_py()), int(t["cell"][-1].as_py())

    spans = ray.get([cell_span.remote(r) for r in refs])

    @ray.remote
    def block_scan(block, first_cell: int, prefix_refs: list):
        t = BlockAccessor.for_block(block).to_arrow()
        m = t.num_rows
        ids = _exact_ids(t[id_col], id_col)
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _vec_matrix(t["v"])  # already unit rows
        # per-cell run starts -> col_hi[i] = my index, col_lo = run start
        new = np.ones(m, dtype=bool)
        new[1:] = cell[1:] != cell[:-1]
        run_start = np.flatnonzero(new)[np.cumsum(new) - 1]
        dup = np.zeros(m, dtype=bool)
        # in-block upper triangle, restricted per row to EARLIER rows of
        # its OWN cell run: columns [run_start[i], i)
        for a in range(0, m, tile):
            b = min(a + tile, m)
            lo = int(run_start[a])  # earliest column any row in the tile sees
            dup[a:b] |= _dominates_tiled(
                mat[a:b],
                mat[lo:b],
                eps,
                tile,
                col_lo=run_start[a:b] - lo,
                col_hi=np.arange(a, b) - lo,
            )
        # cross-block: only the FIRST cell segment can have earlier rows in
        # earlier blocks (sort order); stream those blocks one at a time
        p = int(np.searchsorted(cell, first_cell, side="right"))
        if p and prefix_refs:
            seg = mat[:p]
            for pref in prefix_refs:
                if dup[:p].all():
                    break  # every first-segment row already dominated
                pt = BlockAccessor.for_block(ray.get(pref)).to_arrow()
                pcell = pt["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
                s = int(np.searchsorted(pcell, first_cell, side="left"))
                if s == len(pcell):
                    continue
                pmat = _vec_matrix(pt["v"].slice(s))
                dup[:p] |= _dominates_tiled(seg, pmat, eps, tile)
                del pt, pmat
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "is_dup": pa.array(dup),
            }
        )

    out_refs = []
    for i, r in enumerate(refs):
        first = spans[i][0]
        # earlier blocks whose LAST cell is my FIRST cell hold my cell's
        # smaller-id rows (a contiguous run just before me); a plain list
        # of ObjectRefs is NOT auto-dereferenced, so the task streams them
        prefix = [refs[j] for j in range(i) if spans[j][1] == first]
        out_refs.append(block_scan.remote(r, first, prefix))
    return ray.data.from_arrow_refs(out_refs)
