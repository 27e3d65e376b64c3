"""Property-based tests (hypothesis) for the local engine's invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

import liken_ray as lk
from liken_ray.constants import CANONICAL_ID
from liken_ray.kernels import minhash as mh
from liken_ray.kernels import suffix as sx

small_text = st.text(alphabet="abcdef ", min_size=0, max_size=20)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.none(), small_text), min_size=1, max_size=30))
def test_exact_dedup_matches_pandas_groupby(values):
    df = pd.DataFrame({"v": values})
    out = lk.dedupe(df).apply(lk.exact()).canonicalize("v").collect()
    canon = list(out[CANONICAL_ID])
    # property 1: canonical of each row = first row index with the same
    # value (nulls all equal under the "na" placeholder, and a literal "na"
    # value collides with null by the documented placeholder caveat)
    keyed = ["na" if v is None else v for v in values]
    first_idx = {}
    for i, v in enumerate(keyed):
        first_idx.setdefault(v, i)
    assert canon == [first_idx[v] for v in keyed]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(small_text, min_size=1, max_size=25),
    st.sampled_from(["first", "last"]),
)
def test_drop_duplicates_keeps_one_per_group(values, keep):
    df = pd.DataFrame({"v": values})
    out = lk.dedupe(df).apply(lk.exact()).drop_duplicates("v", keep=keep)
    expected = df.drop_duplicates(subset="v", keep=keep)
    assert list(out["v"]) == list(expected["v"])


@settings(max_examples=20, deadline=None)
@given(
    st.text(alphabet="abcdefgh", min_size=10, max_size=60),
    st.text(alphabet="abcdefgh", min_size=10, max_size=60),
)
def test_minhash_estimates_jaccard(a, b):
    """Fraction of equal signature slots ≈ true shingle Jaccard (within the
    standard error for 256 permutations)."""
    ngram = 2
    sa = {a[i : i + ngram] for i in range(len(a) - ngram + 1)}
    sb = {b[i : i + ngram] for i in range(len(b) - ngram + 1)}
    true_j = len(sa & sb) / max(1, len(sa | sb))
    sigs = mh.batch_signatures([a, b], ngram, 256)
    est = float(np.mean(sigs[0] == sigs[1]))
    assert abs(est - true_j) < 4 * np.sqrt(0.25 / 256) + 0.05


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=120))
def test_suffix_array_is_a_valid_sorted_permutation(data):
    arr = np.frombuffer(data, dtype=np.uint8)
    sa = sx.suffix_array(arr)
    assert sorted(sa.tolist()) == list(range(len(arr)))
    suffixes = [data[i:] for i in sa.tolist()]
    assert suffixes == sorted(suffixes)


@settings(max_examples=20, deadline=None)
@given(
    st.binary(min_size=60, max_size=200),
    st.binary(min_size=0, max_size=80),
    st.binary(min_size=0, max_size=80),
)
def test_winnowing_shared_substring_guarantee(shared, pre, post):
    """Any two docs sharing >= gram+window-1 bytes share a fingerprint."""
    gram, window = 20, 8
    a = pre + shared
    b = shared + post
    fa = set(sx.gram_fingerprints(a, gram, window).tolist())
    fb = set(sx.gram_fingerprints(b, gram, window).tolist())
    if len(shared) >= gram + window - 1:
        assert fa & fb


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="xyz ", min_size=0, max_size=15), min_size=2, max_size=15))
def test_sequential_chaining_refines_transitively(values):
    """Applying exact twice == applying exact once (idempotent labels)."""
    df = pd.DataFrame({"v": values})
    once = lk.dedupe(df).apply(lk.exact()).canonicalize("v").collect()
    twice = (
        lk.dedupe(df).apply(lk.exact()).apply(lk.exact()).canonicalize("v").collect()
    )
    assert list(once[CANONICAL_ID]) == list(twice[CANONICAL_ID])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=25),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=20),
)
def test_batch_gram_fingerprints_equals_per_row(texts, gram_len, window):
    buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in texts], out=offsets[1:])
    fps, row_off = sx.batch_gram_fingerprints(buf, offsets, gram_len, window)
    assert row_off[0] == 0 and row_off[-1] == len(fps)
    for r, t in enumerate(texts):
        got = fps[row_off[r]:row_off[r + 1]]
        want = sx.gram_fingerprints(t, gram_len, window)
        assert np.array_equal(got, want), (r, t, gram_len, window)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**64 - 1), min_size=1, max_size=50))
def test_floor_log2_u64_exact(values):
    from liken_ray.extras.sketches import _floor_log2_u64

    arr = np.array(values, dtype=np.uint64)
    got = _floor_log2_u64(arr)
    assert got.tolist() == [v.bit_length() - 1 for v in values]
