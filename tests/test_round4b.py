"""Round-4 continuation operators: semdedup, asof_join, cross_corpus_dedup.

Each is checked against an independent reference implementation (numpy
brute force, pandas.merge_asof, python sets) on randomized inputs with
many blocks, so the distributed carry/stitch paths are exercised."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from liken_ray.extras.curation import bloom_build, cross_corpus_dedup
from liken_ray.extras.joins import asof_join
from liken_ray.extras.semdedup import semdedup


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------


def _semdedup_reference(vecs: np.ndarray, ids: np.ndarray, cents: np.ndarray, eps):
    """Brute-force reference: argmax-cosine assignment + any-smaller-id
    dominance rule."""
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    nc = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cells = np.argmax(nv @ nc.T, axis=1)
    order = np.argsort(ids)
    out = {}
    for c in np.unique(cells):
        members = order[cells[order] == c]
        for pos, i in enumerate(members):
            sims = nv[members[:pos]] @ nv[i]
            out[int(ids[i])] = (int(c), bool((sims > eps).any()))
    return out


def _vec_table(vecs: np.ndarray, ids: np.ndarray) -> pa.Table:
    flat = pa.array(vecs.reshape(-1).astype(np.float32), pa.float32())
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(len(ids) + 1, dtype=np.int32) * vecs.shape[1]), flat
    )
    return pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": emb})


def test_semdedup_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    # 3 blobs + planted near-dup pairs inside blobs
    cents = rng.standard_normal((3, 16))
    base = np.repeat(cents, 40, axis=0) + 0.15 * rng.standard_normal((120, 16))
    dups = base[::10] + 1e-3 * rng.standard_normal((12, 16))
    vecs = np.vstack([base, dups])
    ids = rng.permutation(len(vecs)).astype(np.int64)
    ds = ray.data.from_arrow(_vec_table(vecs, ids)).repartition(7)
    got = {
        r["vec_id"]: (r["cell"], r["is_dup"])
        for r in semdedup(ds, eps=0.9, centroids=cents, tile=13).take_all()
    }
    want = _semdedup_reference(
        vecs.astype(np.float32).astype(np.float64), ids, cents, 0.9
    )
    assert got == want
    # planted near-dups actually produce positives
    assert sum(d for _, d in got.values()) >= 12


def test_semdedup_min_id_always_survives(ray_session):
    rng = np.random.default_rng(6)
    cents = rng.standard_normal((2, 8))
    vecs = np.repeat(cents, 5, axis=0) + 1e-4 * rng.standard_normal((10, 8))
    ds = ray.data.from_arrow(_vec_table(vecs, np.arange(10, dtype=np.int64)))
    rows = semdedup(ds, eps=0.5, centroids=cents).take_all()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for members in by_cell.values():
        keeper = min(members, key=lambda r: r["vec_id"])
        assert not keeper["is_dup"]
        assert all(r["is_dup"] for r in members if r is not keeper)


def test_semdedup_kmeans_path_runs(ray_session):
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((4, 8)) * 3
    vecs = np.repeat(cents, 30, axis=0) + 0.05 * rng.standard_normal((120, 8))
    ds = ray.data.from_arrow(_vec_table(vecs, np.arange(120, dtype=np.int64)))
    rows = semdedup(ds, n_cells=4, eps=0.999, kmeans_iters=3).take_all()
    assert len(rows) == 120
    # tight blobs at eps=0.999: most rows in each recovered cell are dups
    assert sum(r["is_dup"] for r in rows) > 60


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def _asof_reference(left: pd.DataFrame, right: pd.DataFrame, strict: bool):
    return pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=not strict,
    )


def _rand_events(rng, n, keys, payload_name):
    ts = rng.choice(np.arange(n * 4), size=n, replace=False).astype(np.int64)
    return pd.DataFrame(
        {
            "k": rng.integers(0, keys, n),
            "ts": ts,
            payload_name: np.arange(n, dtype=np.int64),
        }
    )


@pytest.mark.parametrize("strict", [True, False])
def test_asof_join_matches_pandas(ray_session, strict):
    rng = np.random.default_rng(11)
    left = _rand_events(rng, 400, 7, "lid")
    right = _rand_events(rng, 90, 7, "rid")
    lds = ray.data.from_pandas(left).repartition(9)
    rds = ray.data.from_pandas(right).repartition(4)
    out = (
        asof_join(lds, rds, on="ts", by="k", right_cols=["rid"], strict=strict)
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = (
        _asof_reference(left, right, strict)
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(out) == len(left)
    pd.testing.assert_series_equal(
        out["rid"].astype("Int64"), want["rid"].astype("Int64"), check_names=False
    )


def test_asof_join_dense_single_key_many_blocks(ray_session):
    """One key across MANY blocks stresses the O(blocks) carry chain: every
    left row's match may live in an earlier block."""
    left = pd.DataFrame({"k": 0, "ts": np.arange(0, 1000, 2), "lid": np.arange(500)})
    right = pd.DataFrame({"k": 0, "ts": np.arange(0, 1000, 97), "rid": np.arange(11)})
    lds = ray.data.from_pandas(left).repartition(16)
    rds = ray.data.from_pandas(right)
    out = (
        asof_join(lds, rds, on="ts", by="k", right_cols=["rid"], strict=False)
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = _asof_reference(left, right, strict=False).sort_values("lid")
    assert (out["rid"].values == want["rid"].values).all()


def test_asof_join_unmatched_and_collision(ray_session):
    left = pd.DataFrame({"k": [1, 1, 2], "ts": [5, 10, 7], "v": [10, 20, 30]})
    right = pd.DataFrame({"k": [1, 9], "ts": [6, 1], "v": [100, 900]})
    out = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="ts",
            by="k",
            right_cols=["v"],
            strict=False,
        )
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # collision: right's v lands as v_r
    assert list(out.columns) == ["k", "ts", "v", "v_r"]
    assert pd.isna(out[out["ts"] == 5]["v_r"]).all()  # no click yet
    assert out[out["ts"] == 10]["v_r"].iloc[0] == 100
    assert pd.isna(out[out["k"] == 2]["v_r"]).all()  # key 2 has no right rows


# ---------------------------------------------------------------------------
# cross_corpus_dedup
# ---------------------------------------------------------------------------


def _docs_table(ids, texts) -> pa.Table:
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def test_cross_corpus_dedup_exact_semantics(ray_session):
    """Tiny m_bits floods the prefilter with false positives; the exact
    confirm must reject every one of them (reference: python sets)."""
    rng = np.random.default_rng(3)
    ref_texts = [f"ref document {i}" for i in range(60)]
    # 500 rows: ~1/4 planted dups of ref texts, a hot text repeated 40x
    texts = []
    for i in range(460):
        if i % 4 == 0:
            texts.append(ref_texts[int(rng.integers(0, 60))])
        else:
            texts.append(f"novel text {i}")
    texts += ["ref document 7"] * 40
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_arrow(_docs_table(ids, texts)).repartition(8)
    ref = ray.data.from_arrow(
        _docs_table(np.arange(60, dtype=np.int64), ref_texts)
    ).repartition(3)
    kept = cross_corpus_dedup(ds, ref, m_bits=64, k_hashes=2)
    got = sorted(r["doc_id"] for r in kept.take_all())
    ref_set = set(ref_texts)
    want = sorted(int(i) for i, t in zip(ids, texts) if t not in ref_set)
    assert got == want
    # the tiny bloom really did fire false positives (every probe hits
    # almost surely at 64 bits over 120 set positions)
    bloom = bloom_build(ref, m_bits=64, k_hashes=2)
    assert int(bloom.sum()) != 0


def test_cross_corpus_dedup_null_text_equals_empty(ray_session):
    ds = ray.data.from_arrow(_docs_table([1, 2, 3], [None, "", "x"]))
    ref = ray.data.from_arrow(_docs_table([10], [""]))
    kept = sorted(r["doc_id"] for r in cross_corpus_dedup(ds, ref).take_all())
    assert kept == [3]


def test_cross_corpus_dedup_no_hits_short_circuits(ray_session):
    ds = ray.data.from_arrow(_docs_table([1, 2], ["a", "b"]))
    ref = ray.data.from_arrow(_docs_table([9], ["zzz"]))
    kept = cross_corpus_dedup(ds, ref, m_bits=1 << 16)
    rows = kept.take_all()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]
    assert set(kept.schema().names) == {"doc_id", "text"}


# ---------------------------------------------------------------------------
# corpus_ngram_counts
# ---------------------------------------------------------------------------


def _ngram_reference(texts, n, min_count):
    import re

    agg: dict[str, list] = {}
    for doc, t in enumerate(texts):
        toks = re.sub(r"\s+", " ", (t or "").strip()).split(" ")
        if toks == [""] or len(toks) < n:
            continue
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            cur = agg.setdefault(g, [0, set()])
            cur[0] += 1
            cur[1].add(doc)
    return {
        g: (c, len(d)) for g, (c, d) in agg.items() if c >= min_count
    }


def test_corpus_ngram_counts_matches_reference(ray_session):
    from liken_ray.extras.curation import corpus_ngram_counts

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 9))))
        for _ in range(300)
    ] + [None, "", "   ", "solo"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(9)
    got = {
        r["gram"]: (r["cnt"], r["df"])
        for r in corpus_ngram_counts(ds, n=2, min_count=3).take_all()
    }
    assert got == _ngram_reference(texts, 2, 3)
    # df < cnt must occur somewhere (a doc repeating a gram)
    assert any(c > d for c, d in got.values())


def test_corpus_ngram_counts_min_count_one_keeps_singletons(ray_session):
    from liken_ray.extras.curation import corpus_ngram_counts

    texts = ["a b c", "b c d"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    got = {
        r["gram"]: (r["cnt"], r["df"])
        for r in corpus_ngram_counts(ds, n=2, min_count=1).take_all()
    }
    assert got == {"a b": (1, 1), "b c": (2, 2), "c d": (1, 1)}


# ---------------------------------------------------------------------------
# fsspec http import settling (threaded write_parquet race)
# ---------------------------------------------------------------------------


def test_fsspec_http_import_is_settled(ray_session, tmp_path):
    """Ray's path resolution re-imports fsspec.implementations.http on
    every write; offline that import always fails and concurrent threaded
    stages can race the partial module into a bare ImportError. Importing
    liken_ray.io.read must leave a permanent sys.modules entry so the
    import is a race-free dict hit, and concurrent safe_write_parquet
    calls from threads must not crash."""
    import sys
    from concurrent.futures import ThreadPoolExecutor

    import liken_ray.io.read as lio

    assert "fsspec.implementations.http" in sys.modules
    from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

    def write(i: int) -> int:
        ds = ray.data.from_arrow(
            pa.table({"x": pa.array(range(10), pa.int64())})
        )
        out = str(tmp_path / f"w{i}")
        lio.safe_write_parquet(ds, out)
        return lio.safe_read_parquet(out).count()

    with ThreadPoolExecutor(max_workers=4) as pool:
        assert list(pool.map(write, range(8))) == [10] * 8


def test_corpus_ngram_counts_hot_gram_spans_many_blocks(ray_session):
    """ONE gram dominating the corpus: after the sort its run fills many
    blocks, so most blocks contribute only edge rows — the driver stitch
    must sum them all (and df partials across batches) without loss."""
    from liken_ray.extras.curation import corpus_ngram_counts

    texts = ["hot gram " * 40] * 400 + ["cold pair unique%d x" % i for i in range(20)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(13)
    got = {r["gram"]: (r["cnt"], r["df"]) for r in
           corpus_ngram_counts(ds, n=2, min_count=2).take_all()}
    # "hot gram" appears 40x per doc ("hot gram hot gram ..." -> 40 "hot
    # gram" + 39 "gram hot"), 400 docs
    assert got["hot gram"] == (40 * 400, 400)
    assert got["gram hot"] == (39 * 400, 400)
