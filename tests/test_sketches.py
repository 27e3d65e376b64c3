"""HyperLogLog distinct-count sketch."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from liken_ray.extras.curation import splitmix64
from liken_ray.extras.sketches import _rho, hll_estimate, hll_registers


def _reference_registers(values, p):
    h = splitmix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    q = 64 - p
    regs = {}
    for hv in h:
        b = int(hv) >> q
        rem = int(hv) & ((1 << q) - 1)
        r = (q + 1) if rem == 0 else q - (rem.bit_length() - 1)
        regs[b] = max(regs.get(b, 0), r)
    return regs


def test_hll_registers_match_reference_and_partitioning(ray_session):
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 5000, size=20_000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    got = {r["bucket"]: r["rho"] for r in hll_registers(ds, "x", p=10).take_all()}
    assert got == _reference_registers(vals, 10)
    got9 = {
        r["bucket"]: r["rho"]
        for r in hll_registers(ds.repartition(9), "x", p=10).take_all()
    }
    assert got9 == got  # combiner + sort-scan merge is partition-independent


def test_hll_estimate_accuracy(ray_session):
    rng = np.random.default_rng(7)
    for true_n in (200, 5_000, 60_000):
        vals = rng.choice(10**12, size=true_n, replace=False).astype(np.int64)
        # duplicate heavily: cardinality must not care
        dup = np.concatenate([vals, vals[: true_n // 2], vals[: true_n // 4]])
        ds = ray.data.from_arrow(pa.table({"x": pa.array(dup, pa.int64())})).repartition(5)
        est = hll_estimate(hll_registers(ds, "x", p=12), p=12)
        rel = abs(est - true_n) / true_n
        assert rel < 0.05, (true_n, est, rel)


def test_hll_nulls_empty_and_validation(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array([1, None, 1, None, 2], pa.int64())})
    )
    regs = hll_registers(ds, "x", p=8).take_all()
    assert regs == sorted(regs, key=lambda r: r["bucket"])
    assert {r["bucket"]: r["rho"] for r in regs} == _reference_registers([1, 2], 8)
    empty = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert hll_registers(empty, "x").take_all() == []
    assert hll_estimate(pa.table(
        {"bucket": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
    )) == 0.0  # linear counting of all-zero registers -> 0
    assert hll_estimate(hll_registers(empty, "x")) == 0.0  # empty Dataset
    with pytest.raises(ValueError):
        hll_registers(ds, "x", p=3)


def test_hll_merge_by_max_is_union():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 10**9, size=3000).astype(np.int64)
    b = rng.integers(0, 10**9, size=3000).astype(np.int64)
    ra = _reference_registers(a, 12)
    rb = _reference_registers(b, 12)
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == _reference_registers(np.concatenate([a, b]), 12)
    bk = np.array(sorted(merged), dtype=np.int64)
    rh = np.array([merged[k] for k in sorted(merged)], dtype=np.int64)
    est = hll_estimate((bk, rh), p=12)
    true_n = len(np.unique(np.concatenate([a, b])))
    assert abs(est - true_n) / true_n < 0.06


# ---------------------------------------------------------------------------
# frequent_items (exact heavy hitters)
# ---------------------------------------------------------------------------


def test_frequent_items_matches_reference(ray_session):
    rng = np.random.default_rng(9)
    # zipf-ish skew so heavy hitters exist; include nulls
    vals = (rng.zipf(1.5, size=30_000) % 500).astype(np.int64)
    arr = pa.array(vals, pa.int64())
    with_nulls = pa.concat_arrays([arr, pa.array([None] * 100, pa.int64())])
    ds = ray.data.from_arrow(pa.table({"x": with_nulls})).repartition(11)
    from liken_ray.extras.sketches import frequent_items

    got = frequent_items(ds, "x", k=12)
    import collections

    cnt = collections.Counter(vals.tolist())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    assert list(zip(got["value"].to_pylist(), got["cnt"].to_pylist())) == want


def test_frequent_items_string_col_and_small_k(ray_session):
    from liken_ray.extras.sketches import frequent_items

    ds = ray.data.from_arrow(
        pa.table({"s": pa.array(["b", "a", "b", "c", "a", "b", None])})
    ).repartition(3)
    got = frequent_items(ds, "s", k=2)
    assert list(zip(got["value"].to_pylist(), got["cnt"].to_pylist())) == [
        ("b", 3),
        ("a", 2),
    ]
    with pytest.raises(ValueError):
        frequent_items(ds, "s", k=0)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_counters_partition_independent_and_reference(ray_session):
    from liken_ray.extras.sketches import _cms_buckets, cms_counters

    rng = np.random.default_rng(3)
    vals = (rng.zipf(1.4, size=15_000) % 1000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    got = {(r["row"], r["bucket"]): r["cnt"]
           for r in cms_counters(ds, "x", d=3, w=512).take_all()}
    got7 = {(r["row"], r["bucket"]): r["cnt"]
            for r in cms_counters(ds.repartition(7), "x", d=3, w=512).take_all()}
    assert got7 == got
    # reference: count buckets directly
    b = _cms_buckets(vals, 3, 512, 0)
    ref = {}
    for r in range(3):
        for bucket in b[r]:
            ref[(r, int(bucket))] = ref.get((r, int(bucket)), 0) + 1
    assert got == ref


def test_cms_query_upper_bound_and_accuracy(ray_session):
    import collections

    from liken_ray.extras.sketches import cms_counters, cms_query

    rng = np.random.default_rng(5)
    vals = (rng.zipf(1.3, size=40_000) % 5000).astype(np.int64)
    true = collections.Counter(vals.tolist())
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(5)
    counters = cms_counters(ds, "x", d=4, w=4096)
    qs = np.array(sorted(true, key=true.get, reverse=True)[:50], dtype=np.int64)
    est = cms_query(counters, qs, d=4, w=4096)
    tr = np.array([true[int(q)] for q in qs])
    assert (est >= tr).all()  # CMS never underestimates
    # with w=4096 >> distinct/heavy mass, heavy hitters are near-exact
    assert (est - tr <= 0.01 * len(vals)).all()
    rel_heavy = (est[:10] - tr[:10]) / tr[:10]
    assert (rel_heavy < 0.05).all()


def test_cms_validation_and_merge_by_sum(ray_session):
    from liken_ray.extras.sketches import _cms_buckets, cms_counters

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError):
        cms_counters(ds, "x", w=1000)  # not a power of two
    # additivity: counters(a ++ b) == counters(a) + counters(b)
    a = np.array([1, 2, 3, 1], dtype=np.int64)
    b = np.array([1, 5], dtype=np.int64)
    def counts(vals):
        bk = _cms_buckets(vals, 2, 64, 0)
        out = {}
        for r in range(2):
            for x in bk[r]:
                out[(r, int(x))] = out.get((r, int(x)), 0) + 1
        return out
    ca, cb, cab = counts(a), counts(b), counts(np.concatenate([a, b]))
    merged = dict(ca)
    for k, v in cb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cab


# ---------------------------------------------------------------------------
# regression: int64 values above 2^53 must not round through float64
# ---------------------------------------------------------------------------


def test_hll_exact_for_huge_ints_with_nulls(ray_session):
    vals = [2**63 - 1, 2**53 + 1, 2**53 + 3, None]
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    got = {r["bucket"]: r["rho"] for r in hll_registers(ds, "x", p=12).take_all()}
    assert got == _reference_registers([v for v in vals if v is not None], 12)


def test_cms_exact_for_huge_ints_with_nulls(ray_session):
    from liken_ray.extras.sketches import _cms_buckets, cms_counters, cms_query

    vals = [2**63 - 1, 2**63 - 1, 2**53 + 1, None]
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    counters = cms_counters(ds, "x", d=2, w=64)
    est = cms_query(counters, np.array([2**63 - 1, 2**53 + 1], dtype=np.int64),
                    d=2, w=64)
    assert est[0] >= 2 and est[1] >= 1
    # exact reference registers
    ref = {}
    b = _cms_buckets(np.array([v for v in vals if v is not None], dtype=np.int64), 2, 64, 0)
    for r in range(2):
        for bucket in b[r]:
            ref[(r, int(bucket))] = ref.get((r, int(bucket)), 0) + 1
    got = {(r["row"], r["bucket"]): r["cnt"] for r in counters.take_all()}
    assert got == ref


def test_cms_query_sums_duplicate_cells():
    """A concatenation of two counter tables (the documented merge) must
    SUM duplicated cells, not last-write-wins."""
    from liken_ray.extras.sketches import _cms_buckets, cms_query

    v = np.array([42], dtype=np.int64)
    b = _cms_buckets(v, 2, 64, 0)
    t = pa.table(
        {
            "row": pa.array([0, 1, 0, 1], pa.int64()),
            "bucket": pa.array([int(b[0][0]), int(b[1][0])] * 2, pa.int64()),
            "cnt": pa.array([3, 3, 4, 4], pa.int64()),
        }
    )
    assert cms_query(t, v, d=2, w=64)[0] == 7
