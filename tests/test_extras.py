"""Training-data extras: text analysis, ANN, document dedup, multimodal
plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from liken_ray.extras import text as tx


def _doc_batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_counts():
    out = tx.token_counts(_doc_batch(["a b  c", "", None, "single"]))
    assert out["word_count"].to_pylist() == [3, 0, 0, 1]
    assert out["bpe_count"].to_pylist()[0] >= 3


def test_quality_metrics():
    out = tx.quality_metrics(_doc_batch(["Hello, world 42!", None]))
    row = {c: out[c][0].as_py() for c in out.column_names}
    assert row["char_count"] == 16
    assert row["word_count"] == 3
    assert row["digit_count"] == 2
    assert row["punct_count"] == 2  # ',' and '!'
    assert out["char_count"][1].as_py() == 0


def test_lang_id():
    out = tx.lang_id(
        _doc_batch(
            [
                "the cat and the dog went to the park of dreams",
                "el perro de la casa que canta la canción",
                None,
            ]
        )
    )
    assert out["lang_pred"].to_pylist()[:2] == ["en", "es"]


def test_fingerprint_whitespace_normalized():
    a = tx.fingerprint(_doc_batch(["Hello   World"]))["fingerprint"][0].as_py()
    b = tx.fingerprint(_doc_batch(["hello world"]))["fingerprint"][0].as_py()
    c = tx.fingerprint(_doc_batch(["hello worlds"]))["fingerprint"][0].as_py()
    assert a == b != c


def test_simhash_near_dup_property():
    base = "the quick brown fox jumps over the lazy dog many many times today"
    near = base.replace("quick", "quack")
    far = "completely unrelated content with different words entirely here"
    out = tx.simhash64(_doc_batch([base, near, far]))
    h = [v & 0xFFFFFFFFFFFFFFFF for v in out["simhash"].to_pylist()]
    d_near = bin(h[0] ^ h[1]).count("1")
    d_far = bin(h[0] ^ h[2]).count("1")
    assert d_near < d_far
    assert d_near <= 12


def test_ann_bruteforce_matches_numpy(ray_session):
    import ray.data

    from liken_ray.extras.ann import topk_cosine_bruteforce

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((300, 16))
    ds = ray.data.from_arrow(
        pa.table(
            {"vec_id": np.arange(300, dtype=np.int64), "embedding": vecs.tolist()}
        )
    ).repartition(4)

    queries = vecs[:3]
    out = topk_cosine_bruteforce(ds, queries, [0, 1, 2], k=5)

    nv = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = nv[:3] @ nv.T
    got = {}
    for r in out.to_pylist():
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for q in range(3):
        order = np.argsort(-sims[q])
        expected = [int(i) for i in order if i != q][:5]
        assert got[q] == expected, q


def test_ann_ivf_high_recall(ray_session):
    import ray.data

    from liken_ray.extras.ann import topk_cosine_bruteforce, topk_cosine_ivf

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((500, 16))
    ds = ray.data.from_arrow(
        pa.table(
            {"vec_id": np.arange(500, dtype=np.int64), "embedding": vecs.tolist()}
        )
    ).repartition(4)
    queries = vecs[:5]
    exact = topk_cosine_bruteforce(ds, queries, list(range(5)), k=10).to_pylist()
    approx = topk_cosine_ivf(
        ds, queries, list(range(5)), k=10, n_cells=8, n_probe=4
    ).to_pylist()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # probing half the cells


def test_embedding_cosine_dedup(ray_session):
    import ray.data

    from liken_ray.extras.dedup_text import embedding_cosine_dedup

    rng = np.random.default_rng(2)
    base = rng.standard_normal(16)
    vecs = [base, base * 2.0, rng.standard_normal(16), base + rng.normal(0, 0.01, 16)]
    ds = ray.data.from_arrow(
        pa.table({"vec_id": [10, 20, 30, 40], "embedding": [v.tolist() for v in vecs]})
    )
    out = {r["vec_id"]: r["canonical_id"] for r in embedding_cosine_dedup(ds).take_all()}
    assert out[10] == out[20] == out[40] == 10
    assert out[30] == 30


def test_multimodal_feature_and_resize_stages(ray_session):
    import ray.data

    from liken_ray.extras.multimodal import (
        VideoFrameSampleStage,
        image_features,
        image_resize,
    )
    from liken_ray.io.synth import generate_pairs_table

    pairs, _ = generate_pairs_table(50, seed=9)
    ds = ray.data.from_arrow(pairs).repartition(2)
    feats = image_features(ds, concurrency=2, batch_size=16).take_all()
    assert len(feats) == 50
    # the stage recomputes phash from pixels — must match the stored column
    stored = {r["image_id"]: r["phash"] for r in ds.select_columns(["image_id", "phash"]).take_all()}
    for r in feats[:10]:
        assert r["phash"] == stored[r["image_id"]]

    small = image_resize(ds, size=8, concurrency=2, batch_size=16).take_all()
    assert all(r["w"] == 8 and r["h"] == 8 and len(r["bytes"]) == 8 * 8 * 3 for r in small)

    # video stage raises loudly for container formats without a decoder
    vids = pa.table(
        {"video_id": [1], "bytes": [b"\x00" * 16], "fmt": ["mp4"]}
    )
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(every_n=2)(vids)


def test_ivf_persisted_index_reads_only_probed_cells(ray_session, tmp_path):
    """build_ivf_index writes cell-partitioned parquet; the indexed query
    reads only probed cell directories and still reaches good recall."""
    import os

    import ray.data

    from liken_ray.extras.ann import (
        build_ivf_index,
        topk_cosine_bruteforce,
        topk_cosine_ivf_indexed,
    )

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((600, 16))
    ds = ray.data.from_arrow(
        pa.table({"vec_id": np.arange(600, dtype=np.int64), "embedding": vecs.tolist()})
    ).repartition(4)

    idx_dir = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx_dir, n_cells=8)
    assert meta["n_cells"] == 8
    cell_dirs = [d for d in os.listdir(idx_dir) if d.startswith("cell=")]
    assert len(cell_dirs) >= 2  # corpus actually partitioned on disk

    queries = vecs[:5]
    exact = topk_cosine_bruteforce(ds, queries, list(range(5)), k=10).to_pylist()
    approx = topk_cosine_ivf_indexed(idx_dir, queries, list(range(5)), k=10, n_probe=4).to_pylist()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(exact_set & approx_set) / len(exact_set) >= 0.5
