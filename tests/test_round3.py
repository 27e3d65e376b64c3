"""Round-3 regression tests: the VERDICT r2 work items.

- embedding_cosine_dedup rebuilt on ``bucket_edges`` (capped, in-block
  cosine verify) — parity vs the exact within-bucket all-pairs golden and
  a skew guard (thousands of identical vectors in one bucket).
- canonical_exact rebuilt as ONE sort + segmented min-scan with boundary
  stitching — cross-block runs, non-string keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _hyperplane_allpairs_labels(vecs, ids, threshold=0.95, n_planes=12, seed=7):
    """The pre-round-3 semantics: exact all-pairs cosine within each
    random-hyperplane bucket (reference model for parity)."""
    from liken_ray.extras.dedup_text import _edges_to_labels

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((vecs.shape[1], n_planes))
    bits = (vecs @ planes) > 0
    bucket = np.zeros(len(ids), dtype=np.uint64)
    for i in range(n_planes):
        bucket |= bits[:, i].astype(np.uint64) << np.uint64(i)
    edges = []
    for b in np.unique(bucket):
        m = bucket == b
        bi, bv = ids[m], vecs[m]
        k = len(bi)
        if k < 2:
            continue
        n = np.linalg.norm(bv, axis=1)
        n[n == 0] = 1.0
        nv = bv / n[:, None]
        sims = nv @ nv.T
        iu, ju = np.triu_indices(k, 1)
        hit = sims[iu, ju] > threshold
        edges += list(zip(bi[iu[hit]].tolist(), bi[ju[hit]].tolist()))
    g = _edges_to_labels(edges)
    return {int(i): g.get(int(i), int(i)) for i in ids}


def test_embedding_cosine_dedup_parity_with_allpairs_golden(ray_session):
    import ray.data

    from liken_ray.extras.dedup_text import embedding_cosine_dedup

    rng = np.random.default_rng(42)
    base = rng.standard_normal((120, 16))
    near = base + rng.standard_normal((120, 16)) * 0.01
    vecs = np.vstack([base, near, rng.standard_normal((160, 16))])
    ids = np.arange(len(vecs), dtype=np.int64)
    expected = _hyperplane_allpairs_labels(vecs, ids)
    assert any(expected[i] != i for i in ids)  # planted dups actually cluster

    tbl = pa.table(
        {"vec_id": ids, "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))}
    )
    out = embedding_cosine_dedup(
        ray.data.from_arrow(tbl).repartition(6), threshold=0.95
    )
    got = {r["vec_id"]: r["canonical_id"] for r in out.take_all()}
    assert got == expected


def test_embedding_cosine_dedup_skewed_bucket(ray_session):
    """Thousands of identical vectors land in ONE hyperplane bucket: the
    capped star+chain path must label them as one cluster without an
    O(k^2) within-bucket matmul."""
    import ray.data

    from liken_ray.extras.dedup_text import embedding_cosine_dedup

    rng = np.random.default_rng(3)
    sk = np.tile(rng.standard_normal(16), (4000, 1))
    ids = np.arange(4000, dtype=np.int64)
    tbl = pa.table(
        {"vec_id": ids, "embedding": pa.array(sk.tolist(), pa.list_(pa.float64()))}
    )
    out = embedding_cosine_dedup(
        ray.data.from_arrow(tbl).repartition(8), threshold=0.95
    )
    labels = {r["canonical_id"] for r in out.take_all()}
    assert labels == {0}


def test_embedding_cosine_dedup_zero_and_mixed_vectors(ray_session):
    """Zero vectors (norm clamped) and anti-parallel vectors must not
    cluster; parallel positive multiples must."""
    import ray.data

    from liken_ray.extras.dedup_text import embedding_cosine_dedup

    base = np.ones(8)
    vecs = [base, base * 3.0, -base, np.zeros(8)]
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    got = {
        r["vec_id"]: r["canonical_id"]
        for r in embedding_cosine_dedup(ray.data.from_arrow(tbl)).take_all()
    }
    assert got[1] == got[2] == 1
    assert got[3] == 3
    assert got[4] == 4


def test_canonical_exact_run_spanning_many_blocks(ray_session):
    """A single hot key spread over many input blocks must still collapse
    to one canonical id through the boundary-summary stitch."""
    import ray.data

    from liken_ray.extras.dedup_text import canonical_exact

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    texts = ["hot"] * (n // 2) + [f"t{i}" for i in range(n // 2)]
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    tbl = pa.table({"doc_id": ids[perm], "text": [texts[i] for i in perm]})
    out = canonical_exact(ray.data.from_arrow(tbl).repartition(16))
    got = {r["doc_id"]: r["canonical_id"] for r in out.take_all()}
    assert len(got) == n
    hot_ids = [int(i) for i in ids if texts[i] == "hot"]
    assert {got[i] for i in hot_ids} == {min(hot_ids)}
    for i in ids:
        if texts[i] != "hot":
            assert got[int(i)] == int(i)


def test_canonical_exact_non_string_key(ray_session):
    import ray.data

    from liken_ray.extras.dedup_text import canonical_exact

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "k": pa.array([7, None, 7, None, 9], pa.int64()),
        }
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in canonical_exact(ray.data.from_arrow(tbl), key_col="k").take_all()
    }
    assert got == {0: 0, 1: 1, 2: 0, 3: 1, 4: 4}


def test_canonical_exact_empty_vs_null_distinct(ray_session):
    """Sentinel encoding must keep the empty string distinct from null."""
    import ray.data

    from liken_ray.extras.dedup_text import canonical_exact

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["", None, "", None],
        }
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in canonical_exact(ray.data.from_arrow(tbl)).take_all()
    }
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_flagship_psnr_dataset_scope_matches_driver(ray_session, tmp_path):
    """psnr_verify=True must work in edges_scope='dataset' (distributed
    decode + per-pair PSNR via semi-join pruned byte re-reads) and produce
    the same clusters as the driver-scope PSNR path — no warning metric."""
    import os

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "pairs")
    write_pairs_dataset(out, n_rows=600, seed=31, shards=3)
    src = os.path.join(out, "pairs")
    res_a = run_flagship(src, {"psnr_verify": True})
    res_b = run_flagship(
        src, {"psnr_verify": True, "edges_scope": "dataset", "edge_uf_limit": 0}
    )
    am = {r["image_id"]: r["cluster_id"] for r in res_a["assignments"].take_all()}
    bm = {r["image_id"]: r["cluster_id"] for r in res_b["assignments"].take_all()}
    assert am == bm
    img_stage = res_b["metrics"]["stages"]["image_edges"]
    assert "warning" not in img_stage
    assert "psnr_confirmed" in img_stage
    assert img_stage["psnr_confirmed"] <= img_stage["hamming_verified"]


def test_tag_encode_vectorized_injective():
    """Vectorized key encoding: nulls hit the sentinel, values stay
    distinct within and across types, and the string length prefix keeps
    compound-join separators unambiguous."""
    from liken_ray.engine.executor import _tag_encode

    ints = _tag_encode(pa.array([1, 2, None], pa.int64())).to_pylist()
    assert ints[2] == "\x00" and ints[0] != ints[1]
    floats = _tag_encode(pa.array([1.0, 1.5, None], pa.float64())).to_pylist()
    assert floats[2] == "\x00" and floats[0] != floats[1]
    assert ints[0] != floats[0]  # int 1 vs float 1.0 keep distinct tags
    bools = _tag_encode(pa.array([True, False], pa.bool_())).to_pylist()
    assert len(set(bools)) == 2
    strs = _tag_encode(pa.array(["a", "", None, "x\x02y", "x"])).to_pylist()
    assert strs[2] == "\x00" and len({strs[0], strs[1], strs[3], strs[4]}) == 4
    # exotic types still take the python fallback
    import datetime

    dates = _tag_encode(pa.array([datetime.date(2020, 1, 1), None])).to_pylist()
    assert dates[1] == "\x00" and dates[0].startswith("date\x01")


def test_exact_compound_non_string_key_ray_matches_local(ray_session):
    """Compound (int, float, string) exact keys through the vectorized
    encoder: the Ray path must agree with the local executor."""
    import pandas as pd

    import liken_ray as lk
    import ray.data

    df = pd.DataFrame(
        {
            "a": [1, 1, 2, None, None, 1],
            "b": [0.5, 0.5, 0.5, 1.5, 1.5, 0.5],
            "s": ["x", "x", "x", "y", "y", "z"],
            "rid": [0, 1, 2, 3, 4, 5],
        }
    )
    local = (
        lk.dedupe(df)
        .apply(lk.exact())
        .canonicalize(["a", "b", "s"], id="rid")
        .collect()
    )
    ds = ray.data.from_pandas(df)
    ray_out = (
        lk.dedupe(ds)
        .apply(lk.exact())
        .canonicalize(["a", "b", "s"], id="rid")
        .collect()
    )
    got = {r["rid"]: r["canonical_id"] for r in ray_out.take_all()}
    exp = dict(zip(local["rid"], local["canonical_id"]))
    assert got == exp


def test_lang_id_vectorized_parity():
    """Vectorized lang_id (utf8_lower + count_substring) matches the
    per-row python scan it replaced, including null/empty handling,
    tie-breaking by _LANG_MARKERS order, and non-overlapping counts."""
    from liken_ray.extras.text import _LANG_MARKERS, lang_id

    def reference(t):
        if not t:
            return (None, 0.0)
        tl = f" {t.lower()} "
        best, best_score = "unknown", 0
        for lang, markers in _LANG_MARKERS.items():
            s = sum(tl.count(m) for m in markers)
            if s > best_score:
                best, best_score = lang, s
        return (best if best_score else "unknown", float(best_score))

    texts = [
        "the cat and the dog went to the store",
        "la casa de la playa que bonita",
        "der hund und die katze sind ein team",
        "le chat et le chien dans les bois une fois",
        None,
        "",
        "zzzz qqqq xxxx",  # no markers -> unknown
        "de de de de",  # es/fr/pt tie on ' de ' -> first in dict order wins
        "THE AND OF TO ING",  # uppercase folds
        "não ção uma que de",  # pt diacritics
        "a di che il la zione text",  # it
        " the  and  of ",  # marker-adjacent whitespace
        "the" * 40,  # no spaces: 'ing '/' the ' boundaries absent
    ]
    out = lang_id(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    for i, t in enumerate(texts):
        exp_lang, exp_score = reference(t)
        got_lang = out["lang_pred"][i].as_py()
        got_score = out["lang_score"][i].as_py()
        assert got_lang == exp_lang, (i, repr(t), got_lang, exp_lang)
        assert got_score == exp_score, (i, repr(t), got_score, exp_score)


def test_classify_codepoints_lowering_cache():
    """Per-codepoint lowering: ASCII table, non-ASCII single-codepoint
    lowerings resolved via the cache (U+212A KELVIN -> 'k'), and
    multi-codepoint lowerings (U+0130) keep the original codepoint."""
    from liken_ray.extras.text import _classify_codepoints

    cp = np.array([ord("A"), ord("z"), 0x212A, ord("Á"), 0x0130], dtype=np.uint32)
    _, _, _, lowered = _classify_codepoints(cp)
    assert lowered.tolist() == [ord("a"), ord("z"), ord("k"), ord("á"), 0x0130]


def test_quality_metrics_kelvin_sign_stopword(monkeypatch):
    """A token containing U+212A (KELVIN SIGN, .lower() == 'k') must hash
    identically to its ASCII lowercase form. The shipped stopword list has
    no 'k' words, so extend the hash table with 'kelvin' for the test and
    check the Kelvin-spelled token now matches it."""
    import pytest

    import liken_ray.extras.text as tx

    kelvin_hash = tx._word_hash(
        np.frombuffer("kelvin".encode("utf-32-le"), dtype=np.uint32)
    )
    monkeypatch.setattr(
        tx,
        "_STOP_HASHES",
        np.sort(np.append(tx._STOP_HASHES, np.uint64(kelvin_hash))),
    )
    t_kelvin = "the \u212aelvin word"
    t_ascii = "the kelvin word"
    out = tx.quality_metrics(
        pa.table({"doc_id": [0, 1], "text": [t_kelvin, t_ascii]})
    )
    assert out["stopword_ratio"][0].as_py() == out["stopword_ratio"][1].as_py()
    assert out["stopword_ratio"][1].as_py() == pytest.approx(2 / 3)
    assert out["word_count"][0].as_py() == 3


def test_flagship_streaming_no_barrier_parity(ray_session, tmp_path):
    """stage_barriers=False (the cluster-scale path: no materialize of the
    ingested table or the banded payloads before their sorts) must produce
    identical clusters to the default barriered run."""
    import os

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "pairs")
    write_pairs_dataset(out, n_rows=600, seed=33, shards=3)
    src = os.path.join(out, "pairs")
    res_a = run_flagship(src, {})
    res_b = run_flagship(src, {"stage_barriers": False})
    am = {r["image_id"]: r["cluster_id"] for r in res_a["assignments"].take_all()}
    bm = {r["image_id"]: r["cluster_id"] for r in res_b["assignments"].take_all()}
    assert am == bm


def test_bucket_edges_no_barrier_env(ray_session, monkeypatch):
    """GRAFT_SORT_BARRIER=0 flips the module default; edges unchanged."""
    import ray.data

    from liken_ray.engine.blocking import (
        _sort_barrier_default,
        bucket_edges,
        collect_edges,
    )

    monkeypatch.setenv("GRAFT_SORT_BARRIER", "0")
    assert _sort_barrier_default() is False
    ds = ray.data.from_items(
        [{"k": i % 5, "rid": i} for i in range(40)]
    )
    edges = sorted(collect_edges(bucket_edges(ds, ["k"], "rid", pair_cap=1)))
    monkeypatch.setenv("GRAFT_SORT_BARRIER", "1")
    edges_b = sorted(collect_edges(bucket_edges(ds, ["k"], "rid", pair_cap=1)))
    assert edges == edges_b and len(edges) == 35


def test_row_id_positional_deterministic(ray_session):
    """ROW_ID must equal the global row position on a multi-block dataset.

    Regression: the old ``Dataset.zip(range)`` implementation paired blocks
    in streaming completion order, nondeterministically permuting ids vs
    row order (observed misalignments on 1M rows x 8 blocks). Several
    trials because the failure was racy."""
    import ray.data
    from liken_ray.constants import ROW_ID
    from liken_ray.engine.executor import ensure_row_id

    n = 400_000
    for _ in range(3):
        ds = ray.data.range(n).map_batches(
            lambda b: pa.table({"rid0": b["id"].astype(np.int64)}),
            batch_format="numpy",
        )
        out = ensure_row_id(ds)
        for batch in out.iter_batches(batch_format="pyarrow", batch_size=None):
            r = batch[ROW_ID].to_numpy(zero_copy_only=False)
            v = batch["rid0"].to_numpy(zero_copy_only=False)
            assert (r == v).all()


def test_flagship_rid_positional(ray_session):
    """The flagship ingest rid must be the global row position (stable
    cluster representatives = min-rid semantics)."""
    import ray.data
    from liken_ray.pipelines.flagship import DEFAULT_CONFIG, _ingest

    n = 50_000
    src = ray.data.range(n).map_batches(
        lambda b: pa.table(
            {
                "image_id": np.char.add("img", b["id"].astype(str)),
                "caption": np.char.add("caption text ", b["id"].astype(str)),
                "phash": b["id"].astype(np.int64),
            }
        ),
        batch_format="numpy",
    )
    ds = _ingest(src, dict(DEFAULT_CONFIG))
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        rid = batch["rid"].to_numpy(zero_copy_only=False)
        ids = np.asarray(
            [int(s[3:]) for s in batch["image_id"].to_pylist()], dtype=np.int64
        )
        assert (rid == ids).all()


def test_flagship_rid_stable_across_runs(ray_session, tmp_path):
    """rid→row binding must be identical across repeated ingests of the
    same parquet path (preserve_order during the attach materialize;
    without it Ray freezes a completion-order shard permutation and the
    cluster representatives differ run to run)."""
    import os

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import DEFAULT_CONFIG, _ingest

    out = str(tmp_path / "pairs")
    write_pairs_dataset(out, n_rows=600, seed=33, shards=3)
    src = os.path.join(out, "pairs")

    def rid_map(cfg):
        ds = _ingest(src, cfg)
        m = {}
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            m.update(zip(b["image_id"].to_pylist(), b["rid"].to_pylist()))
        return m

    a = rid_map(dict(DEFAULT_CONFIG))
    b = rid_map(dict(DEFAULT_CONFIG))
    c = rid_map({**DEFAULT_CONFIG, "stage_barriers": False})
    assert a == b == c


def test_dedupe_edges_dataset_exact_with_boundary_duplicates(ray_session):
    """Sort-scan edge dedupe must be EXACT when copies of a pair straddle
    block boundaries: many duplicates of a few hot pairs spread over many
    small blocks, plus unique pairs, equals the set-dedupe of the whole."""
    import ray.data

    from liken_ray.engine.blocking import dedupe_edges_dataset

    rng = np.random.default_rng(12)
    hot = [(1, 2), (3, 9), (5, 7)]
    src = np.concatenate(
        [np.repeat([a for a, _ in hot], 400), rng.integers(10, 5000, 300)]
    ).astype(np.int64)
    dst = np.concatenate(
        [np.repeat([b for _, b in hot], 400), rng.integers(5000, 9000, 300)]
    ).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(24)

    got = sorted(
        (r["src"], r["dst"]) for r in dedupe_edges_dataset(ds).take_all()
    )
    want = sorted(set(zip(src.tolist(), dst.tolist())))
    assert got == want  # exactly one copy of every pair, none lost


def test_sorted_min_by_key_matches_groupby(ray_session):
    """_sorted_min_by_key must equal groupby().min() exactly, including
    keys whose runs span many blocks."""
    import ray.data

    from liken_ray.engine.components import _sorted_min_by_key

    rng = np.random.default_rng(5)
    keys = np.concatenate([np.repeat(7, 2000), rng.integers(0, 500, 3000)]).astype(
        np.int64
    )
    vals = rng.integers(-1000, 1000, len(keys)).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(16)

    got = {r["k"]: r["v"] for r in _sorted_min_by_key(ds, "k", "v").take_all()}
    want: dict[int, int] = {}
    for k, v in zip(keys.tolist(), vals.tolist()):
        want[k] = min(want.get(k, v), v)
    assert got == want
