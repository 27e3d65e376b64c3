"""Distributed spherical k-means (extras.ann.kmeans_fit) and its IVF
refinement hook."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from liken_ray.extras.ann import kmeans_fit, topk_cosine_bruteforce, topk_cosine_ivf


def _blob_table(seed: int = 3, per_blob: int = 120, dim: int = 12):
    """Three well-separated direction blobs on the unit sphere."""
    rng = np.random.default_rng(seed)
    dirs = np.zeros((3, dim))
    dirs[0, 0] = 1.0
    dirs[1, 1] = 1.0
    dirs[2, 2] = 1.0
    vecs, labels = [], []
    for b in range(3):
        pts = dirs[b] + rng.normal(0, 0.05, size=(per_blob, dim))
        vecs.extend(pts.tolist())
        labels.extend([b] * per_blob)
    return (
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float64())),
            }
        ),
        np.array([d / np.linalg.norm(d) for d in dirs]),
        np.array(labels),
    )


def test_kmeans_recovers_blob_directions(ray_session):
    import ray.data

    table, true_dirs, _ = _blob_table()
    ds = ray.data.from_arrow(table).repartition(4)
    centroids, info = kmeans_fit(ds, n_cells=3, iters=8, seed=5)
    assert centroids.shape == (3, 12)
    # every true blob direction is matched by some centroid at cos > 0.98
    sims = true_dirs @ centroids.T
    assert (sims.max(axis=1) > 0.98).all(), sims.max(axis=1)
    # objective (mean member cosine) is monotone non-decreasing
    hist = info["objective_history"]
    assert len(hist) == info["iters_run"]
    assert all(b >= a - 1e-12 for a, b in zip(hist, hist[1:])), hist
    assert hist[-1] > 0.97


def test_kmeans_deterministic_and_converges(ray_session):
    import ray.data

    table, _, _ = _blob_table(seed=9)
    ds = ray.data.from_arrow(table).repartition(3)
    c1, i1 = kmeans_fit(ds, n_cells=3, iters=10, seed=7)
    c2, i2 = kmeans_fit(ds, n_cells=3, iters=10, seed=7)
    np.testing.assert_array_equal(c1, c2)
    assert i1["converged"] and i1["iters_run"] < 10
    with pytest.raises(ValueError, match="too small"):
        kmeans_fit(ray.data.from_arrow(table.slice(0, 2)), n_cells=64)


def test_ivf_refined_matches_bruteforce_at_full_probe(ray_session):
    import ray.data

    table, _, _ = _blob_table(seed=1)
    ds = ray.data.from_arrow(table).repartition(4)
    q = np.array(table["embedding"].to_pylist()[:3], dtype=np.float64)
    qids = [0, 1, 2]
    exact = topk_cosine_bruteforce(ds, q, qids, k=5).to_pandas()
    # refined centroids + full probe width is still provably exact
    refined = topk_cosine_ivf(
        ds, q, qids, k=5, n_cells=4, n_probe=4, refine_iters=3
    ).to_pandas()
    cols = ["query_id", "neighbor_id"]
    assert (
        exact[cols].sort_values(cols).values.tolist()
        == refined[cols].sort_values(cols).values.tolist()
    )


def test_ivf_refined_recall_on_pruned_probe(ray_session):
    """On blob data, refined centroids at n_probe=1 keep high recall —
    each query's neighbors live in its own blob cell."""
    import ray.data

    table, _, labels = _blob_table(seed=4)
    ds = ray.data.from_arrow(table).repartition(4)
    q_idx = [0, 120, 240]  # one query per blob
    q = np.array([table["embedding"].to_pylist()[i] for i in q_idx], dtype=np.float64)
    exact = topk_cosine_bruteforce(ds, q, q_idx, k=10).to_pandas()
    approx = topk_cosine_ivf(
        ds, q, q_idx, k=10, n_cells=3, n_probe=1, refine_iters=5
    ).to_pandas()
    want = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    got = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall
