"""Curation operators: deterministic hash split + n-gram decontamination.

The oracle parity of `hash_split_documents` / `decontaminate_documents`
is covered by test_entry_contract's derived sweep; these tests pin kernel
semantics and the Ray plumbing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from liken_ray.extras.curation import (
    contamination_index,
    decontaminate,
    gram_hashes,
    hash_split,
    split_thresholds,
    splitmix64,
)


def test_splitmix64_matches_scalar_reference():
    def ref(x: int) -> int:
        m = (1 << 64) - 1
        z = (x + 0x9E3779B97F4A7C15) & m
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & m
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & m
        return z ^ (z >> 31)

    xs = np.array([0, 1, 2, 12345, 2**63, 2**64 - 1], dtype=np.uint64)
    assert [int(v) for v in splitmix64(xs)] == [ref(int(v)) for v in xs]


def test_split_thresholds_integer_boundaries():
    assert split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05}) == [
        ("train", 9000),
        ("val", 9500),
        ("test", 10000),
    ]
    # un-normalized weights normalize; last split absorbs rounding
    assert split_thresholds({"a": 2, "b": 1, "c": 1}) == [
        ("a", 5000),
        ("b", 7500),
        ("c", 10000),
    ]
    with pytest.raises(ValueError):
        split_thresholds({})
    with pytest.raises(ValueError):
        split_thresholds({"a": -1.0, "b": 2.0})


def test_gram_hashes_position_and_row_independence():
    texts = [
        "the quick brown fox",
        "slow  the quick brown cat",  # double space normalizes away
        None,
        "",
        "a b",  # fewer than n tokens
        "the quick brown fox jumps",
    ]
    h, off = gram_hashes(texts, 3)
    rows = [h[off[i] : off[i + 1]] for i in range(len(texts))]
    assert [len(r) for r in rows] == [2, 3, 0, 0, 0, 3]
    assert rows[0][0] == rows[1][1]  # "the quick brown" at different offsets
    assert rows[0][1] == rows[5][1]  # "quick brown fox" across rows
    assert rows[1][2] != rows[0][1]  # "quick brown cat" != "quick brown fox"

    # batch-composition independence: same row alone or with neighbors
    h_solo, _ = gram_hashes([texts[0]], 3)
    assert list(h_solo) == list(rows[0])


def test_gram_hashes_no_spurious_collisions():
    big = [" ".join(f"w{i + j}" for j in range(50)) for i in range(200)]
    h, _ = gram_hashes(big, 3)
    want = set()
    for t in big:
        tk = t.split()
        want.update(" ".join(tk[i : i + 3]) for i in range(len(tk) - 2))
    assert len(np.unique(h)) == len(want)


def test_hash_split_deterministic_and_proportional(ray_session):
    import ray.data

    n = 20_000
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ).repartition(4)
    out = hash_split(ds).take_all()
    by_split: dict[str, int] = {}
    seen: dict[int, str] = {}
    for r in out:
        by_split[r["split"]] = by_split.get(r["split"], 0) + 1
        seen[r["doc_id"]] = r["split"]
    assert len(seen) == n
    # proportions near the weights (hash uniformity at n=20k: ±2% absolute)
    assert abs(by_split["train"] / n - 0.90) < 0.02
    assert abs(by_split["val"] / n - 0.05) < 0.01
    assert abs(by_split["test"] / n - 0.05) < 0.01

    # deterministic across runs and partitionings
    again = {
        r["doc_id"]: r["split"]
        for r in hash_split(ds.repartition(7)).take_all()
    }
    assert again == seen

    # re-salting yields a different (but deterministic) assignment
    resalt = {r["doc_id"]: r["split"] for r in hash_split(ds, salt=99).take_all()}
    assert resalt != seen


def test_decontaminate_flags_planted_overlap(ray_session):
    import ray.data

    holdout = ray.data.from_items(
        [
            {"doc_id": 0, "text": "the secret benchmark answer is forty two"},
            {"doc_id": 1, "text": "unrelated holdout content here"},
        ]
    )
    train = ray.data.from_items(
        [
            # shares "secret benchmark answer" and more
            {"doc_id": 10, "text": "leaked: the secret benchmark answer is hidden"},
            {"doc_id": 11, "text": "completely clean document about cooking pasta"},
            {"doc_id": 12, "text": None},
            {"doc_id": 13, "text": "unrelated holdout content appears again"},
            {"doc_id": 14, "text": "ab"},
        ]
    ).repartition(2)
    idx = contamination_index(holdout, n=3)
    got = {r["doc_id"]: (r["contaminated"], r["n_hits"]) for r in decontaminate(train, idx, n=3).take_all()}
    assert got[10][0] and got[10][1] >= 3  # "the secret benchmark", "secret benchmark answer", "benchmark answer is"
    assert got[11] == (False, 0)
    assert got[12] == (False, 0)
    assert got[13] == (True, 1)  # only "unrelated holdout content" overlaps
    assert got[14] == (False, 0)


def test_decontaminate_drop_mode(ray_session):
    import ray.data

    holdout = ray.data.from_items([{"doc_id": 0, "text": "x y z"}])
    train = ray.data.from_items(
        [
            {"doc_id": 1, "text": "a b x y z c"},
            {"doc_id": 2, "text": "a b c d"},
        ]
    )
    idx = contamination_index(holdout, n=3)
    kept = decontaminate(train, idx, n=3, mode="drop").take_all()
    assert [r["doc_id"] for r in kept] == [2]
    with pytest.raises(ValueError):
        decontaminate(train, idx, mode="purge")


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_pii_scrub_kernel_and_ray(ray_session):
    """Email / ipv4 / phone patterns scrub and count correctly through the
    Ray op; clean rows pass untouched. Oracle parity (pyarrow RE2 vs DuckDB
    RE2) is covered by the `pii_scrub_documents` gate query."""
    import ray.data

    from liken_ray.extras.curation import pii_scrub

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "mail a@b.co or x.y+z@ex.org, ip 10.0.0.1 tel +14155550100",
                    "clean text, version 1.2 is not an ip",
                    "edge 255.255.255.255 and +1234567",
                ]
            ),
        }
    )
    out = {
        r["doc_id"]: r
        for r in pii_scrub(ray.data.from_arrow(t).repartition(2)).take_all()
    }
    assert out[0]["text"] == "mail <EMAIL> or <EMAIL>, ip <IP> tel <PHONE>"
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 1, 1)
    assert out[1]["text"] == "clean text, version 1.2 is not an ip"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (0, 0, 0)
    assert out[2]["text"] == "edge <IP> and <PHONE>"


# ---------------------------------------------------------------------------
# repetition stats
# ---------------------------------------------------------------------------


def test_repetition_stats_matches_python_reference(ray_session):
    """Duplicate-line counts/bytes match a per-row Counter reference over
    tricky rows: dups, empty text, nulls, unicode, empty lines, slices."""
    from collections import Counter

    import ray.data

    from liken_ray.extras.curation import repetition_stats

    texts = ["a\nb\na", "", None, "x\nx\nx\nyy", "é\né", "single", "\n\n"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = {
        r["doc_id"]: r
        for r in repetition_stats(ray.data.from_arrow(t).repartition(3)).take_all()
    }
    for i, txt in enumerate(texts):
        lines = (txt or "").split("\n")
        c = Counter(lines)
        dup = sum(len(k.encode()) * (v - 1) for k, v in c.items())
        tot = sum(len(k.encode()) * v for k, v in c.items())
        r = got[i]
        assert (
            r["n_lines"],
            r["n_distinct_lines"],
            r["dup_line_bytes"],
            r["total_line_bytes"],
        ) == (len(lines), len(c), dup, tot), i


def test_top_ngram_stats_matches_python_reference(ray_session):
    """Most-frequent-bigram counts/coverage match a per-row Counter
    reference, incl. tie-break (max count, then max count*bytes), short
    rows, nulls, and whitespace normalization."""
    import re
    from collections import Counter

    import ray.data

    from liken_ray.extras.curation import top_ngram_stats

    texts = [
        "a b a b a",
        "one two",
        "x",
        None,
        "",
        "  spaced   out  words here spaced   out  ",
        "t t t t",
        "aa bb aa bb cc dd cc dd",  # count tie, different byte lengths
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = {
        r["doc_id"]: r
        for r in top_ngram_stats(
            ray.data.from_arrow(t).repartition(3), n=2
        ).take_all()
    }

    def ref(txt, n=2):
        if txt is None:
            return (0, 0, 0)
        toks = re.sub(r"\s+", " ", txt.strip()).split(" ")
        if toks == [""] or len(toks) < n:
            return (0, 0, 0)
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        topc = max(c.values())
        cover = max(v * len(k.encode()) for k, v in c.items() if v == topc)
        return (len(grams), topc, cover)

    for i, txt in enumerate(texts):
        r = got[i]
        assert (
            r["n_grams"],
            r["top_gram_count"],
            r["top_gram_cover_bytes"],
        ) == ref(txt), i


def test_pack_offsets_matches_sequential_reference(ray_session):
    """Global exclusive running sum + window assignment must be exact and
    block-count independent (the only shuffle is the order sort; offsets
    stitch across blocks)."""
    import ray.data

    from liken_ray.extras.curation import pack_offsets

    rng = np.random.default_rng(11)
    n = 500
    sizes = rng.integers(0, 300, n).astype("int64")
    sizes[17] = 0
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n)[::-1].copy(), pa.int64()),  # unsorted
            "n_chars": pa.array(sizes[::-1].copy(), pa.int64()),
        }
    )
    expect_start = np.zeros(n, dtype=np.int64)
    expect_start[1:] = np.cumsum(sizes[:-1])
    for nblocks in (1, 7):
        out = pack_offsets(
            ray.data.from_arrow(t).repartition(nblocks), capacity=512
        ).take_all()
        got = {r["doc_id"]: (r["start_offset"], r["bin"]) for r in out}
        for i in range(n):
            assert got[i] == (expect_start[i], expect_start[i] // 512), (nblocks, i)


def test_pack_offsets_nulls_and_empty(ray_session):
    import ray.data

    from liken_ray.extras.curation import pack_offsets

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "n_chars": pa.array([5, None, 3], pa.int64()),
        }
    )
    out = {r["doc_id"]: r["start_offset"]
           for r in pack_offsets(ray.data.from_arrow(t), capacity=4).take_all()}
    assert out == {0: 0, 1: 5, 2: 5}
    empty = pack_offsets(
        ray.data.from_arrow(t.slice(0, 0)), capacity=4
    ).take_all()
    assert empty == []
    with pytest.raises(ValueError):
        pack_offsets(ray.data.from_arrow(t), capacity=0)


def test_hash_sample_deterministic_and_partition_independent(ray_session):
    """The k winners are the k smallest splitmix64 priorities — identical
    across block counts and reruns; k >= n returns everything."""
    import ray.data

    from liken_ray.extras.curation import hash_sample, splitmix64

    n = 300
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(np.arange(n) * 2, pa.int64())})
    pr = splitmix64(np.arange(n, dtype=np.uint64))
    expect = set(np.argsort(pr)[:25].tolist())
    for nblocks in (1, 6):
        got = {
            r["doc_id"]
            for r in hash_sample(
                ray.data.from_arrow(t).repartition(nblocks), k=25
            ).take_all()
        }
        assert got == expect, nblocks
    assert len(hash_sample(ray.data.from_arrow(t), k=1000).take_all()) == n
    with pytest.raises(ValueError):
        hash_sample(ray.data.from_arrow(t), k=0)


def test_stratified_sample_per_key_counts(ray_session):
    """k winners per stratum (fewer when the stratum is smaller); null
    keys are dropped; identical across block counts."""
    import ray.data

    from liken_ray.extras.curation import splitmix64, stratified_sample

    n = 200
    keys = ["a", "b", "c", None] * (n // 4)
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "lang": pa.array(keys, pa.string())})
    pr = splitmix64(np.arange(n, dtype=np.uint64))
    expect = set()
    for key in ("a", "b", "c"):
        members = [i for i in range(n) if keys[i] == key]
        expect |= set(sorted(members, key=lambda i: pr[i])[:7])
    for nblocks in (1, 5):
        rows = stratified_sample(
            ray.data.from_arrow(t).repartition(nblocks), key_col="lang", k=7
        ).take_all()
        assert {r["doc_id"] for r in rows} == expect, nblocks
        assert all(r["lang"] is not None for r in rows)
    # small stratum: returns all of it
    small = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "lang": pa.array(["x", "x", "y"], pa.string())})
    rows = stratified_sample(ray.data.from_arrow(small), key_col="lang", k=5).take_all()
    assert len(rows) == 3


def test_hash_split_respects_buckets_param(ray_session):
    """Thresholds must scale to the caller's bucket count (previously they
    were always scaled to 10,000, so buckets=100 put every row in the
    first split)."""
    import ray.data

    from liken_ray.extras.curation import hash_split

    t = pa.table({"doc_id": pa.array(np.arange(2000), pa.int64())})
    rows = hash_split(
        ray.data.from_arrow(t), {"a": 0.5, "b": 0.5}, buckets=100
    ).take_all()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"a", "b"}, counts
    assert abs(counts["a"] - 1000) < 150, counts


def test_repetition_stats_large_string(ray_session):
    """large_string text columns (int64 offsets) must hash lines correctly
    — previously the offsets buffer was misread as int32 and identical
    lines got different hashes."""
    import ray.data

    from liken_ray.extras.curation import repetition_stats

    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["dup\ndup\nuniq"], pa.large_string()),
        }
    )
    (r,) = repetition_stats(ray.data.from_arrow(t)).take_all()
    assert r["n_lines"] == 3 and r["n_distinct_lines"] == 2
    assert r["dup_line_bytes"] == 3 and r["total_line_bytes"] == 10


def test_decontaminate_n_mismatch_raises(ray_session):
    import ray.data

    from liken_ray.extras.curation import contamination_index, decontaminate

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["one two three four", "five six seven eight"]),
        }
    )
    ds = ray.data.from_arrow(t)
    idx = contamination_index(ds, n=4)
    with pytest.raises(Exception, match="n=3.*n=4|n=4"):
        decontaminate(ds, idx, n=3).take_all()


def test_negative_salt_and_null_pii_counts(ray_session):
    import ray.data

    from liken_ray.extras.curation import hash_sample, hash_split, pii_scrub

    t = pa.table({"doc_id": pa.array(np.arange(50), pa.int64()),
                  "text": pa.array(["a@b.co"] * 49 + [None])})
    # negative salts must not overflow
    assert len(hash_split(ray.data.from_arrow(t), salt=-7).take_all()) == 50
    assert len(hash_sample(ray.data.from_arrow(t), k=5, salt=-1).take_all()) == 5
    # null text scrubs to null but counts zero
    rows = {r["doc_id"]: r for r in pii_scrub(ray.data.from_arrow(t)).take_all()}
    assert rows[49]["text"] is None and rows[49]["n_email"] == 0
    assert rows[0]["n_email"] == 1


# ---------------------------------------------------------------------------
# shuffle_positions
# ---------------------------------------------------------------------------


def test_shuffle_positions_is_a_permutation_and_deterministic(ray_session):
    import ray.data

    from liken_ray.extras.curation import shuffle_positions

    ids = np.arange(1000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    got = {r["doc_id"]: r["pos"] for r in
           shuffle_positions(ds, "doc_id").take_all()}
    assert sorted(got.values()) == list(range(1000))  # a permutation
    # rank parity with a direct argsort of the hash
    h = splitmix64(ids.view(np.uint64))
    want = {int(i): int(p) for p, i in enumerate(ids[np.argsort(h)])}
    assert got == want
    # partitioning-independence
    got7 = {r["doc_id"]: r["pos"] for r in
            shuffle_positions(ds.repartition(7), "doc_id").take_all()}
    assert got7 == got
    # salt changes the order
    salted = {r["doc_id"]: r["pos"] for r in
              shuffle_positions(ds, "doc_id", salt=1).take_all()}
    assert salted != got and sorted(salted.values()) == list(range(1000))


def test_shuffle_positions_empty(ray_session):
    import ray.data

    from liken_ray.extras.curation import shuffle_positions

    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    assert shuffle_positions(ds, "doc_id").take_all() == []


# ---------------------------------------------------------------------------
# common_gram_coverage
# ---------------------------------------------------------------------------


def test_common_gram_coverage_matches_reference(ray_session):
    import collections
    import re

    import ray.data

    from liken_ray.extras.curation import common_gram_coverage

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(15)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 12))))
        for _ in range(400)
    ] + [None, "", "solo"]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(7)
    K = 10
    got = {r["doc_id"]: (r["n_grams"], r["common_grams"])
           for r in common_gram_coverage(ds, n=2, top_k=K).take_all()}

    def grams(t):
        toks = re.sub(r"\s+", " ", (t or "").strip()).split(" ")
        if toks == [""] or len(toks) < 2:
            return []
        return [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]

    cnt = collections.Counter(g for t in texts for g in grams(t))
    top = set(g for g, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:K])
    want = {
        i: (len(grams(t)), sum(1 for g in grams(t) if g in top))
        for i, t in zip(ids, texts)
    }
    assert got == want
    assert any(c > 0 for _, c in got.values())  # signal actually fires


def test_common_gram_coverage_validates(ray_session):
    import ray.data

    from liken_ray.extras.curation import common_gram_coverage

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["a b"], pa.string())})
    )
    with pytest.raises(ValueError):
        common_gram_coverage(ds, top_k=0)


def test_shuffle_positions_rejects_null_ids(ray_session):
    import ray.data

    from liken_ray.extras.curation import shuffle_positions

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, None, 3], pa.int64())})
    )
    with pytest.raises(Exception, match="nulls"):
        shuffle_positions(ds, "doc_id").take_all()
