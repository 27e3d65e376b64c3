"""Connected-components correctness: driver DSU and distributed label
propagation vs networkx on random graphs."""

from __future__ import annotations

import numpy as np
import pytest

from liken_ray.engine.components import (
    KeyedUnionFind,
    UnionFind,
    connected_components_distributed,
)


def _random_edges(rng, n_nodes, n_edges):
    return [
        (int(rng.integers(0, n_nodes)), int(rng.integers(0, n_nodes)))
        for _ in range(n_edges)
    ]


def _nx_labels(edges):
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(edges)
    labels = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for node in comp:
            labels[node] = root
    return labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_keyed_union_find_matches_networkx(seed):
    rng = np.random.default_rng(seed)
    edges = _random_edges(rng, 200, 300)
    uf = KeyedUnionFind()
    for a, b in edges:
        uf.union(a, b)
    assert uf.labels() == _nx_labels(edges)


def test_union_find_components_cover_all_rows():
    uf = UnionFind(6)
    uf.union(0, 3)
    uf.union(3, 5)
    comps = uf.components()
    members = sorted(m for ms in comps.values() for m in ms)
    assert members == [0, 1, 2, 3, 4, 5]
    assert sorted(next(ms for ms in comps.values() if 0 in ms)) == [0, 3, 5]


@pytest.mark.parametrize("seed", [7, 8])
def test_distributed_label_propagation_matches_networkx(ray_session, seed):
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(seed)
    edges = _random_edges(rng, 500, 600)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    edges_ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)

    labels_ds = connected_components_distributed(edges_ds)
    got = {r["node"]: r["label"] for r in labels_ds.take_all()}
    assert got == _nx_labels(edges)


def test_distributed_long_chain_converges_logarithmically(ray_session):
    """A 400-node path graph has diameter 399: one-hop propagation needs
    ~400 rounds (and would silently under-merge at max_rounds=50); the
    alternating large-star/small-star contraction must converge in
    O(log n) alternations with every node labelled 0."""
    import pyarrow as pa
    import ray.data

    n = 400
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    edges_ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)

    stats: dict = {}
    labels_ds = connected_components_distributed(edges_ds, stats=stats)
    got = {r["node"]: r["label"] for r in labels_ds.take_all()}
    assert got == {i: 0 for i in range(n)}
    assert stats["cc_converged"]
    assert stats["cc_rounds"] <= 14  # ~log2(400) + seeding slack, not ~400


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_numpy_components_match_networkx(seed):
    from liken_ray.engine.components import connected_components_edges_numpy

    rng = np.random.default_rng(seed)
    edges = _random_edges(rng, 300, 450)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    assert connected_components_edges_numpy(src, dst) == _nx_labels(edges)


def test_distributed_hot_pair_fills_blocks(ray_session):
    """A single hot (m, v) pair duplicated enough to fill whole sorted
    blocks: several blocks then share the same FIRST pair, and the
    convergence signature must still count each distinct pair exactly once
    regardless of block order (set-based dedupe — the former prev-last
    chain walk depended on a stable block order)."""
    import pyarrow as pa
    import ray.data

    hot = np.zeros(5000, dtype=np.int64)  # 5000 copies of (0, 1)
    src = np.concatenate([hot, np.array([1, 3, 7], dtype=np.int64)])
    dst = np.concatenate([hot + 1, np.array([2, 4, 9], dtype=np.int64)])
    edges_ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(8)

    stats: dict = {}
    labels_ds = connected_components_distributed(edges_ds, stats=stats)
    got = {r["node"]: r["label"] for r in labels_ds.take_all()}
    edges = list(zip(src.tolist(), dst.tolist()))
    assert got == _nx_labels(edges)
    assert stats["cc_converged"]
    assert stats["cc_unique_edges"] == 4


def test_cc_max_rounds_exhaustion_reports_unconverged(ray_session):
    """A large-star-only fixpoint reached at the iteration bound must NOT
    be reported converged: {(1,5),(2,5)} is stable under large-star but
    small-star would merge 1 and 2 — the closing check must apply a
    small-star before declaring a fixpoint (previously it compared only
    the large output and shipped under-merged labels as 'converged')."""
    import warnings

    import pyarrow as pa
    import ray.data

    from liken_ray.engine.components import connected_components_distributed

    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([5, 5], pa.int64())})
    )
    stats: dict = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components_distributed(edges, max_rounds=0, stats=stats)
    assert stats["cc_converged"] is False
    assert any("under-merged" in str(x.message) for x in w)

    # a TRUE star fixpoint at the same bound stays converged (no warning)
    stars = ray.data.from_arrow(
        pa.table({"src": pa.array([1, 1], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    )
    stats2: dict = {}
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        out = connected_components_distributed(stars, max_rounds=0, stats=stats2)
    assert stats2["cc_converged"] is True
    assert not any("under-merged" in str(x.message) for x in w2)
    labels = {r["node"]: r["label"] for r in out.take_all()}
    assert labels == {1: 1, 2: 1, 3: 1}
