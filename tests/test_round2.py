"""Round-2 hardening: in-block verification parity, distributed predicate
path, sketch-verify semantics, vectorized sessionize, tfidf kwargs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# ngram_jaccard_dedup: cluster parity vs a local exact-Jaccard oracle
# ---------------------------------------------------------------------------


def _jaccard_oracle_labels(texts, ngram, threshold):
    """Driver-side oracle: LSH band candidates + exact python-set char-ngram
    Jaccard verify + union-find — the semantics ngram_jaccard_dedup claims."""
    from liken_ray.engine.components import KeyedUnionFind
    from liken_ray.kernels import minhash as mh

    b, r = mh.optimal_param(threshold, 128)
    valid = [(i, t) for i, t in enumerate(texts) if t is not None and len(t) >= ngram]
    sigs = mh.batch_signatures([t for _, t in valid], ngram, 128)
    keys = mh.band_keys(sigs, b, r)
    buckets: dict[tuple, list[int]] = {}
    for row, (i, _) in enumerate(valid):
        for band in range(b):
            buckets.setdefault((band, int(keys[row, band])), []).append(i)

    def sh(t):
        return {t[k : k + ngram] for k in range(len(t) - ngram + 1)}

    shingles = {i: sh(t) for i, t in valid}
    uf = KeyedUnionFind()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, c = members[x], members[y]
                sa, sc = shingles[a], shingles[c]
                union = len(sa | sc)
                if union and len(sa & sc) / union > threshold:
                    uf.union(a, c)
    labels = uf.labels()
    return {i: labels.get(i, i) for i in range(len(texts))}


def test_ngram_jaccard_matches_exact_oracle(ray_session):
    import ray.data

    from liken_ray.extras.dedup_text import ngram_jaccard_dedup

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    texts = []
    for i in range(60):
        base = " ".join(rng.choice(words, size=8))
        texts.append(base)
        if i % 3 == 0:  # plant a near-dup (small edit)
            texts.append(base + " x")
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ).repartition(4)

    got = {
        r["doc_id"]: r["canonical_id"]
        for r in ngram_jaccard_dedup(ds, threshold=0.7).take_all()
    }
    want = _jaccard_oracle_labels(texts, 3, 0.7)
    # compare cluster partitions (canonical representative may differ only
    # if the partitions differ — they must not)
    assert got == want


def test_ngram_jaccard_chain_needs_each_link_verified(ray_session):
    """A-B similar, B-C similar, A-C not: all three cluster (transitive),
    but a fourth doc D colliding in a band with A while failing Jaccard
    against every member must stay out."""
    import ray.data

    from liken_ray.extras.dedup_text import ngram_jaccard_dedup

    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a.replace("today", "tonight")
    c = b.replace("quick", "quiet")
    d = "completely different content that shares nothing with the others!!"
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [0, 1, 2, 3], "text": [a, b, c, d]})
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in ngram_jaccard_dedup(ds, threshold=0.5).take_all()
    }
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == 3


# ---------------------------------------------------------------------------
# simhash_dedup: bucket_edges path reproduces all-pairs-in-bucket semantics
# ---------------------------------------------------------------------------


def test_simhash_dedup_clusters_near_dups(ray_session):
    import ray.data

    from liken_ray.extras.dedup_text import simhash_dedup

    base = "the quick brown fox jumps over the lazy dog many many times today"
    near = base.replace("quick", "quack")
    far = "completely unrelated content with different words entirely here now"
    texts = [base, near, far] + [f"unique filler document number {i} nothing alike" for i in range(20)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ).repartition(3)
    # base/near simhash Hamming distance is 5 → 8 bands guarantee a band
    # collision (pigeonhole: <= bands-1 = 7) and verification accepts at 5
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in simhash_dedup(ds, bands=8, max_hamming=7).take_all()
    }
    assert got[0] == got[1] == 0
    assert got[2] != 0


# ---------------------------------------------------------------------------
# distributed predicate path: dense predicate, bounded driver objects
# ---------------------------------------------------------------------------


def test_dense_predicate_on_1m_rows(ray_session):
    """str_len(min_len=0) matches every row of a 1M-row Dataset: the
    sequential predicate path must cluster them all without ever
    collecting the matched-id list (per-block min/max/count summaries
    only)."""
    import liken_ray as lk
    import ray.data

    n = 1_000_000
    ds = ray.data.range(n).map_batches(
        lambda b: pa.table(
            {
                "rid0": b["id"].astype(np.int64),
                "txt": np.char.add("row", b["id"].astype(str)),
            }
        ),
        batch_format="numpy",
    )
    out = lk.dedupe(ds).apply(lk.str_len(min_len=0)).canonicalize("txt", id="rid0").collect()
    # every row's canonical must be the min rid0 (= 0)
    import pyarrow.compute as pc

    mx = 0
    for batch in out.iter_batches(batch_format="pyarrow", batch_size=None):
        mx = max(mx, pc.max(batch["canonical_id"]).as_py())
    assert mx == 0


def test_predicate_cluster_keep_last(ray_session):
    import liken_ray as lk
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"k": [10, 20, 30], "t": ["ax", "bx", "c"]})
    )
    out = (
        lk.dedupe(ds)
        .apply(lk.str_contains(pattern="x"))
        .canonicalize("t", keep="last", id="k")
        .collect()
        .to_pandas()
        .sort_values("k")
    )
    assert out["canonical_id"].tolist() == [20, 20, 30]


# ---------------------------------------------------------------------------
# sketch verify kernel: exact small-set decisions, borderline band
# ---------------------------------------------------------------------------


def _sketch_batch(caps, k, ngram=3):
    """Build the adaptive verify payload exactly like caption_band_stage:
    byte-packed caption when it fits k*8 bytes, else header + bottom-k
    gram-hash sketch."""
    from liken_ray.kernels import suffix as sx

    entries = []
    for c in caps:
        if c is None:
            entries.append(None)
            continue
        raw = c.encode("utf8")
        if len(raw) <= k * 8:
            nw = (len(raw) + 7) // 8
            w = np.empty(nw + 1, dtype=np.uint64)
            w[0] = len(raw)
            w[1:] = np.frombuffer(raw.ljust(nw * 8, b"\0"), dtype=np.uint64)
        else:
            g = np.unique(sx.rolling_gram_hashes(raw, ngram))
            w = np.empty(min(len(g), k) + 1, dtype=np.uint64)
            w[0] = np.uint64(1 << 63) | np.uint64(len(g))
            w[1:] = g[:k]
        entries.append(w.tolist())
    return pa.table({"csk": pa.array(entries, pa.list_(pa.uint64()))})


def test_sketch_kernel_exact_for_short_captions():
    from liken_ray.pipelines.flagship import caption_sketch_verify_kernel

    caps = ["abcdefgh", "abcdefgh", "zzzzyyyy", None, None]
    batch = _sketch_batch(caps, k=64)
    sp = np.array([0, 0, 3])
    dp = np.array([1, 2, 4])
    accept, borderline = caption_sketch_verify_kernel(
        batch, sp, dp, k=64, ngram=3, tmin=0.5, eps=0.19, cluster_nulls=True
    )
    assert accept.tolist() == [True, False, True]  # identical / disjoint / both-null
    assert not borderline.any()  # packed captions decide exactly — no borderline


def test_sketch_kernel_long_captions_estimate_with_borderline_band():
    from liken_ray.pipelines.flagship import caption_sketch_verify_kernel

    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(200)]
    a = " ".join(rng.choice(words, 80))
    b_mid = " ".join(a.split()[:48] + list(rng.choice(words, 32)))  # J ~ 0.45-0.6
    far = " ".join(rng.choice(words, 80))
    batch = _sketch_batch([a, b_mid, far], k=16)  # >128B -> sketched
    accept, borderline = caption_sketch_verify_kernel(
        batch, np.array([0, 0]), np.array([1, 2]), k=16, ngram=3,
        tmin=0.5, eps=0.3, cluster_nulls=False,
    )
    assert borderline[0] or accept[0]  # midrange pair never hard-rejected with wide eps


def test_sketch_kernel_length_prune_rejects_exactly():
    """A short caption vs a long one: J <= min/max gram totals; when that
    bound cannot reach tmin the pair is rejected with no borderline."""
    from liken_ray.pipelines.flagship import caption_sketch_verify_kernel

    short = "tiny text here padded a bit more"  # packed
    long_ = " ".join(f"word{i:04d}" for i in range(120))  # sketched at k=16
    batch = _sketch_batch([short, long_], k=16)
    accept, borderline = caption_sketch_verify_kernel(
        batch, np.array([0]), np.array([1]), k=16, ngram=3,
        tmin=0.5, eps=0.3, cluster_nulls=False,
    )
    assert not accept[0] and not borderline[0]


def test_flagship_sketch_matches_exact_payload(ray_session, tmp_path):
    """Default sketch+confirm pipeline must produce the same edge set as
    exact caption-payload verification."""
    import os

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "pairs")
    write_pairs_dataset(out, n_rows=800, seed=23, shards=3)
    src = os.path.join(out, "pairs")
    a = run_flagship(src, {"verify_payload": "sketch"})["assignments"].take_all()
    b = run_flagship(src, {"verify_payload": "caption"})["assignments"].take_all()
    am = {r["image_id"]: r["cluster_id"] for r in a}
    bm = {r["image_id"]: r["cluster_id"] for r in b}
    assert am == bm


# ---------------------------------------------------------------------------
# blocking: over-cap star+chain with verification; telemetry
# ---------------------------------------------------------------------------


def test_bucket_edges_overcap_chain_survives_failing_anchor(ray_session):
    """Bucket of [A, B, C] over cap where the anchor A verifies with
    nobody but B-C verify: chain pairs must still connect B-C."""
    import ray.data

    from liken_ray.engine.blocking import bucket_edges

    tbl = pa.table(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "key": pa.array([7, 7, 7], pa.int64()),
            "v": pa.array([100, 5, 5], pa.int64()),
        }
    )

    def verify(batch, sp, dp):
        v = batch["v"].to_numpy(zero_copy_only=False)
        return v[sp] == v[dp]

    edges = bucket_edges(
        ray.data.from_arrow(tbl), ["key"], "rid",
        pair_cap=2,  # bucket of 3 exceeds the cap -> star(+chain) mode
        payload_cols=["v"], verify_fn=verify,
    )
    assert (1, 2) in edges
    assert (0, 1) not in edges and (0, 2) not in edges


def test_bucket_edges_truncation_telemetry(ray_session):
    import ray.data

    from liken_ray.engine import blocking
    from liken_ray.engine.blocking import bucket_edges

    n = blocking._SUMMARY_CAP * 3
    tbl = pa.table(
        {"rid": pa.array(range(n), pa.int64()), "key": pa.array([1] * n, pa.int64())}
    )
    stats: dict = {}
    edges = bucket_edges(ray.data.from_arrow(tbl).repartition(1), ["key"], "rid", stats=stats)
    assert stats["summary_truncated"] >= 1
    assert len(edges) == n - 1  # star edges still connect the whole run


# ---------------------------------------------------------------------------
# sessionize: vectorized path matches a python oracle incl. cross-block
# ---------------------------------------------------------------------------


def test_sessionize_matches_python_oracle(ray_session):
    import ray.data

    from liken_ray.extras.windows import sessionize

    rng = np.random.default_rng(9)
    rows = []
    for uid in range(25):
        t = rng.integers(0, 10**6)
        for _ in range(rng.integers(1, 40)):
            t += int(rng.integers(1, 4000))  # seconds; gap 1800s splits
            rows.append((uid, t))
    rng.shuffle(rows)
    ts_us = pa.array([r[1] * 1_000_000 for r in rows], pa.int64()).cast(pa.timestamp("us"))
    tbl = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()), "ts": ts_us})
    ds = ray.data.from_arrow(tbl).repartition(7)

    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(ds, gap_s=1800).take_all()
    )

    # oracle
    from collections import defaultdict
    import datetime as dt

    by_user = defaultdict(list)
    for uid, t in rows:
        by_user[uid].append(t)
    want = []
    for uid, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        cnt = 1
        for t in ts[1:]:
            if t - prev > 1800:
                want.append((uid, start, prev, cnt))
                start, cnt = t, 0
            prev = t
            cnt += 1
        want.append((uid, start, prev, cnt))
    want = sorted(
        (u, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None),
         dt.datetime.fromtimestamp(e, dt.timezone.utc).replace(tzinfo=None), c)
        for u, s, e, c in want
    )
    assert got == want


# ---------------------------------------------------------------------------
# tfidf kwargs
# ---------------------------------------------------------------------------


def test_tfidf_min_df_prunes_vocabulary():
    """min_df=2 drops every gram that appears in only one document; docs
    sharing no surviving grams cannot pair (standard vectorizer
    semantics)."""
    from liken_ray.kernels.tfidf import tfidf_matrix

    texts = ["abcd", "abce", "zzzz"]
    full = tfidf_matrix(texts, 3)
    pruned = tfidf_matrix(texts, 3, min_df=2)
    assert full.shape[1] > pruned.shape[1]
    # only "abc" appears twice -> single surviving term
    assert pruned.shape[1] == 1
    # doc 2 has no surviving grams -> zero vector
    assert np.allclose(pruned[2], 0.0)


def test_tfidf_min_df_all_pruned_raises():
    from liken_ray.kernels.tfidf import tfidf_matrix

    with pytest.raises(ValueError, match="no terms remain"):
        tfidf_matrix(["abcd", "efgh"], 3, min_df=2)


def test_tfidf_unsupported_kwarg_rejected():
    import liken_ray as lk

    with pytest.raises(ValueError, match="unsupported vectorizer kwarg"):
        lk.tfidf(sublinear_tf=True)


def test_tfidf_lowercase_false_distinguishes_case():
    from liken_ray.kernels.tfidf import topn_similarity_pairs

    pairs_ci = topn_similarity_pairs(["ABCDEF", "abcdef"], 3, 0.99, 2)
    pairs_cs = topn_similarity_pairs(["ABCDEF", "abcdef"], 3, 0.99, 2, lowercase=False)
    assert (0, 1) in pairs_ci
    assert (0, 1) not in pairs_cs


# ---------------------------------------------------------------------------
# backend rejection + synthesize NaN
# ---------------------------------------------------------------------------


def test_unsupported_backend_clear_error():
    import liken_ray as lk

    class Fake:
        pass

    Fake.__module__ = "pyspark.sql.dataframe"
    with pytest.raises(TypeError, match="ray.data"):
        lk.dedupe(Fake())


def test_synthesize_ray_skips_float_nan(ray_session):
    import liken_ray as lk
    import ray.data

    tbl = pa.table(
        {
            "k": ["a", "a", "b"],
            "x": pa.array([float("nan"), 2.5, 1.0], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = (
        lk.dedupe(ds).apply(lk.exact()).canonicalize("k").synthesize().to_pandas()
    )
    row_a = out[out["k"] == "a"].iloc[0]
    assert row_a["x"] == 2.5  # NaN skipped, like the local executor


# ---------------------------------------------------------------------------
# vectorized quality_metrics: parity vs the straightforward python reference
# ---------------------------------------------------------------------------


def test_quality_metrics_vectorized_parity():
    import re

    from liken_ray.extras.text import quality_metrics
    from liken_ray.kernels.preprocess import ENGLISH_STOPWORDS

    ws = re.compile(r"\s+")
    stop = set(ENGLISH_STOPWORDS)

    def reference(t):
        if not t:
            return (0, 0, 0, 0, 0.0, 0.0)
        words = [w for w in ws.split(t.strip()) if w]
        d = sum(c.isdigit() for c in t)
        p = sum(not c.isalnum() and not c.isspace() for c in t)
        sr = sum(w.lower() in stop for w in words) / len(words) if words else 0.0
        mwl = sum(len(w) for w in words) / len(words) if words else 0.0
        return (len(t), len(words), d, p, sr, mwl)

    rng = np.random.default_rng(11)
    texts = [
        "the quick brown fox 42!",
        "",
        None,
        "   ",
        "¡Hola señor! ¿Qué tal? 123",
        "中文文本 with mixed 字符 and the words",
        "a " * 50,
        "UPPER lower The THE tHe",
        "tabs\tand\nnewlines  multiple   spaces",
        "digits ٣٤٥ unicode",  # arabic-indic digits: isdigit() true
    ] + ["".join(chr(rng.integers(32, 400)) for _ in range(rng.integers(0, 80))) for _ in range(30)]

    out = quality_metrics(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    for i, t in enumerate(texts):
        exp = reference(t)
        got = (
            out["char_count"][i].as_py(), out["word_count"][i].as_py(),
            out["digit_count"][i].as_py(), out["punct_count"][i].as_py(),
            out["stopword_ratio"][i].as_py(), out["mean_word_len"][i].as_py(),
        )
        assert got[:4] == exp[:4], (i, repr(t), got, exp)
        assert abs(got[4] - exp[4]) < 1e-12, (i, repr(t))
        assert abs(got[5] - exp[5]) < 1e-12, (i, repr(t))


def test_fingerprint_and_simhash_vectorized_relations():
    from liken_ray.extras.text import fingerprint, simhash64

    tbl = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": ["Hello   World", "hello world", "hello worlds", None, ""],
        }
    )
    fp = fingerprint(tbl)["fingerprint"].to_pylist()
    assert fp[0] == fp[1] != fp[2]
    assert fp[3] == 0 and fp[4] not in (0, fp[0])

    base = "the quick brown fox jumps over the lazy dog many many times today"
    sh = simhash64(
        pa.table({"doc_id": [0, 1, 2], "text": [base, base.replace("quick", "quack"), None]})
    )["simhash"].to_pylist()
    h = [v & 0xFFFFFFFFFFFFFFFF for v in sh]
    assert bin(h[0] ^ h[1]).count("1") <= 12
    assert h[2] == 0


def test_flagship_dataset_edges_scope_matches_driver(ray_session, tmp_path):
    """edges_scope='dataset' keeps edges distributed end to end (driver
    sees only boundary summaries) and, with the distributed components
    path forced, must produce the same clusters as the driver path."""
    import os

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "pairs")
    write_pairs_dataset(out, n_rows=600, seed=31, shards=3)
    src = os.path.join(out, "pairs")
    a = run_flagship(src)["assignments"].take_all()
    res_b = run_flagship(src, {"edges_scope": "dataset", "edge_uf_limit": 0})
    b = res_b["assignments"].take_all()
    am = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"]) for r in a}
    bm = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"]) for r in b}
    assert am == bm
    assert res_b["metrics"]["stages"]["caption_edges"].get("scope") == "dataset"


# ---------------------------------------------------------------------------
# review regressions: join type limits, null keys, batch-independent hashes
# ---------------------------------------------------------------------------


def test_drop_duplicates_with_list_column(ray_session):
    """Arrow hash joins reject nested non-key columns; drop_duplicates must
    fall back rather than crash on a table with a list column."""
    import liken_ray as lk
    import ray.data

    tbl = pa.table(
        {
            "k": ["a", "a", "b"],
            "vec": pa.array([[1.0, 2.0], [3.0], [4.0, 5.0]], pa.list_(pa.float64())),
        }
    )
    out = (
        lk.dedupe(ray.data.from_arrow(tbl))
        .apply(lk.exact())
        .drop_duplicates("k")
        .to_pandas()
    )
    assert len(out) == 2
    assert sorted(out["k"]) == ["a", "b"]


def test_canonical_exact_keeps_null_key_rows(ray_session):
    import ray.data

    from liken_ray.extras.dedup_text import canonical_exact

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": ["x", None, "x", None, "y"],
        }
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in canonical_exact(ray.data.from_arrow(tbl)).take_all()
    }
    # no rows vanish; null-key rows form one group labelled by their min id
    assert got == {0: 0, 1: 1, 2: 0, 3: 1, 4: 4}


def test_fingerprint_batch_composition_independent():
    from liken_ray.extras.text import fingerprint

    mixed = fingerprint(
        pa.table({"doc_id": [0, 1], "text": ["", "hello"]})
    )["fingerprint"].to_pylist()
    alone = fingerprint(
        pa.table({"doc_id": [0, 1], "text": ["", "   "]})
    )["fingerprint"].to_pylist()
    # empty-after-normalization strings hash identically in every batch,
    # and never collide with null (0)
    assert mixed[0] == alone[0] == alone[1] != 0


def test_bucket_edges_star_cap1_chain_with_verify(ray_session):
    """pair_cap=1 (default star mode) with a verify kernel must still emit
    chain pairs so (B, C) survives an anchor that verifies with nobody."""
    import ray.data

    from liken_ray.engine.blocking import bucket_edges

    tbl = pa.table(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "key": pa.array([7, 7, 7], pa.int64()),
            "v": pa.array([100, 5, 5], pa.int64()),
        }
    )

    def verify(batch, sp, dp):
        v = batch["v"].to_numpy(zero_copy_only=False)
        return v[sp] == v[dp]

    edges = bucket_edges(
        ray.data.from_arrow(tbl), ["key"], "rid",
        pair_cap=1, payload_cols=["v"], verify_fn=verify,
    )
    assert (1, 2) in edges


def test_simhash_long_documents_chunked(ray_session):
    """Long texts must not blow up the bit-matrix memory (chunked path) and
    must produce identical hashes to short-batch processing."""
    from liken_ray.extras.text import simhash64

    rng = np.random.default_rng(6)
    words = [f"tok{i}" for i in range(500)]
    long_docs = [" ".join(rng.choice(words, 3000)) for _ in range(8)]
    one = simhash64(pa.table({"doc_id": list(range(8)), "text": long_docs}))
    per = [
        simhash64(pa.table({"doc_id": [i], "text": [long_docs[i]]}))["simhash"][0].as_py()
        for i in range(8)
    ]
    assert one["simhash"].to_pylist() == per
