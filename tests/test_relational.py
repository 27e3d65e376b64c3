"""group_topk / quantiles — distributed sort-scan relational operators."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from liken_ray.extras.relational import group_topk, quantiles


def _topk_reference(df: pd.DataFrame, key, score, k, tie):
    out = []
    for kv, g in df.groupby(key, dropna=False):
        g = g.sort_values([score, tie], ascending=[False, True])
        for rank, (_, row) in enumerate(g.head(k).iterrows(), start=1):
            out.append((*row.tolist(), rank))
    return sorted(out)


def test_group_topk_matches_reference(ray_session):
    rng = np.random.default_rng(5)
    n = 2000
    df = pd.DataFrame(
        {
            "lang": rng.choice(["en", "de", "fr", "zz"], size=n),
            "score": rng.integers(0, 50, size=n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = sorted(
        (r["lang"], r["score"], r["id"], r["rank"])
        for r in group_topk(ds, "lang", "score", 5, tie_col="id").take_all()
    )
    assert got == _topk_reference(df, "lang", "score", 5, "id")


def test_group_topk_run_straddles_many_blocks(ray_session):
    # ONE hot key spanning every block: carries must chain, not reset
    n = 500
    df = pd.DataFrame(
        {"k": ["hot"] * n, "s": np.arange(n)[::-1], "id": np.arange(n)}
    )
    ds = ray.data.from_pandas(df).repartition(11)
    rows = group_topk(ds, "k", "s", 3, tie_col="id").take_all()
    got = sorted((r["s"], r["rank"]) for r in rows)
    assert got == [(497, 3), (498, 2), (499, 1)]


def test_group_topk_k_larger_than_group_and_nulls(ray_session):
    df = pd.DataFrame(
        {
            "k": ["a", "a", None, None, "b"],
            "s": [1, 2, 9, 8, 5],
            "id": [0, 1, 2, 3, 4],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    rows = group_topk(ds, "k", "s", 10, tie_col="id").take_all()
    assert len(rows) == 5  # k past group size keeps everything
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append((r["rank"], r["s"]))
    assert sorted(by_key[None]) == [(1, 9), (2, 8)]  # nulls are one group
    assert sorted(by_key["a"]) == [(1, 2), (2, 1)]


def test_group_topk_validates(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "s": [1], "id": [1]}))
    with pytest.raises(ValueError):
        group_topk(ds, "k", "s", 0, tie_col="id")
    with pytest.raises(KeyError):
        group_topk(ds, "nope", "s", 1, tie_col="id")


def test_quantiles_match_duckdb_disc(ray_session):
    import duckdb

    rng = np.random.default_rng(11)
    vals = rng.integers(-1000, 1000, size=3001).astype(np.int64)
    qs = [0.01, 0.1, 0.25, 0.5, 0.7, 0.75, 0.9, 0.99, 1.0]
    df = pd.DataFrame({"x": vals})
    ds = ray.data.from_pandas(df).repartition(9)
    got = {r["q"]: r["value"] for r in quantiles(ds, "x", qs).take_all()}
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        f"SELECT unnest(CAST({qs} AS DOUBLE[])) AS q, "
        f"unnest(quantile_disc(x, {qs})) AS value FROM t"
    ).fetchall()
    assert got == {q: v for q, v in want}


def test_quantiles_skip_nulls_and_float_col(ray_session):
    df = pd.DataFrame({"x": [3.5, None, 1.5, 2.5, None]})
    ds = ray.data.from_pandas(df)
    got = {r["q"]: r["value"] for r in quantiles(ds, "x", [0.5, 1.0]).take_all()}
    # 3 non-null values: median idx ceil(0.5*3)-1 = 1 -> 2.5
    assert got == {0.5: 2.5, 1.0: 3.5}


def test_quantiles_validate_and_empty(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"x": [1.0]}))
    with pytest.raises(ValueError):
        quantiles(ds, "x", [])
    with pytest.raises(ValueError):
        quantiles(ds, "x", [0.0, 0.5])
    empty = ray.data.from_pandas(pd.DataFrame({"x": pd.array([None], dtype="Float64")}))
    assert quantiles(empty, "x", [0.5]).take_all() == []


# ---------------------------------------------------------------------------
# broadcast_join
# ---------------------------------------------------------------------------


def test_broadcast_join_inner_and_left(ray_session):
    from liken_ray.extras.joins import broadcast_join

    fact = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 3, 2, None], "v": [10, 20, 30, 21, 99]})
    ).repartition(3)
    dim = pa.table({"k": pa.array([1, 2], pa.int64()),
                    "name": pa.array(["one", "two"])})
    inner = sorted(
        (r["v"], r["name"]) for r in broadcast_join(fact, dim, on="k").take_all()
    )
    assert inner == [(10, "one"), (20, "two"), (21, "two")]
    left = sorted(
        (r["v"], r["name"])
        for r in broadcast_join(fact, dim, on="k", how="left").take_all()
    )
    assert left == [(10, "one"), (20, "two"), (21, "two"), (30, None), (99, None)]


def test_broadcast_join_renames_collisions_and_validates(ray_session):
    from liken_ray.extras.joins import broadcast_join

    fact = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [5]}))
    dim = pa.table({"kk": pa.array([1], pa.int64()), "v": pa.array([7], pa.int64())})
    out = broadcast_join(fact, dim, on="k", right_on="kk").take_all()
    assert out == [{"k": 1, "v": 5, "v_r": 7}]

    dup = pa.table({"k": pa.array([1, 1], pa.int64()), "x": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="not unique"):
        broadcast_join(fact, dup, on="k")
    withnull = pa.table({"k": pa.array([1, None], pa.int64()), "x": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="nulls"):
        broadcast_join(fact, withnull, on="k")


def test_broadcast_join_dim_as_dataset_and_chain(ray_session):
    from liken_ray.extras.joins import broadcast_join

    fact = ray.data.from_pandas(pd.DataFrame({"a": [1, 2, 2], "x": [1.0, 2.0, 3.0]}))
    d1 = ray.data.from_pandas(pd.DataFrame({"a": [1, 2], "b": [10, 20]}))
    d2 = pa.table({"b": pa.array([10, 20], pa.int64()),
                   "label": pa.array(["ten", "twenty"])})
    out = broadcast_join(broadcast_join(fact, d1, on="a"), d2, on="b")
    rows = sorted((r["x"], r["label"]) for r in out.take_all())
    assert rows == [(1.0, "ten"), (2.0, "twenty"), (3.0, "twenty")]


# ---------------------------------------------------------------------------
# group_quantiles
# ---------------------------------------------------------------------------


def _gq_reference(df, key, val, qs):
    out = {}
    for kv, g in df.groupby(key, dropna=False):
        kv = None if pd.isna(kv) else kv
        vv = np.sort(g[val].dropna().to_numpy())
        if len(vv) == 0:
            continue
        for q in qs:
            idx = max(0, math.ceil(q * len(vv) - 1e-9) - 1)
            out[(kv, q)] = vv[idx]
    return out


def test_group_quantiles_matches_reference_and_duckdb(ray_session):
    import duckdb

    from liken_ray.extras.relational import group_quantiles

    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame(
        {
            "lang": rng.choice(["en", "de", "fr", "pt", "zz"], size=n),
            "x": rng.integers(0, 10_000, size=n),
        }
    )
    qs = [0.25, 0.5, 0.9]
    ds = ray.data.from_pandas(df).repartition(9)
    got = {
        (r["lang"], r["q"]): r["value"]
        for r in group_quantiles(ds, "lang", "x", qs).take_all()
    }
    assert got == _gq_reference(df, "lang", "x", qs)
    con = duckdb.connect()
    con.register("t", df)
    want = {
        (k, q): v
        for k, q, v in con.execute(
            f"SELECT lang, unnest(CAST({qs} AS DOUBLE[])) AS q, "
            f"unnest(quantile_disc(x, {qs})) AS value FROM t GROUP BY lang"
        ).fetchall()
    }
    assert got == want


def test_group_quantiles_hot_key_spans_blocks_and_nulls(ray_session):
    from liken_ray.extras.relational import group_quantiles

    # one key whose run fills many blocks + null keys + null values
    df = pd.DataFrame(
        {
            "k": ["hot"] * 3000 + ["cold"] * 5 + [None] * 4,
            "v": list(range(3000)) + [10, 30, 20, 50, 40] + [7, None, 5, 6],
        }
    )
    ds = ray.data.from_pandas(df.sample(frac=1, random_state=0)).repartition(12)
    got = {
        (r["k"], r["q"]): r["value"]
        for r in group_quantiles(ds, "k", "v", [0.5, 1.0]).take_all()
    }
    assert got == _gq_reference(df, "k", "v", [0.5, 1.0])
    assert got[("hot", 0.5)] == 1499 and got[("hot", 1.0)] == 2999
    assert got[(None, 1.0)] == 7


def test_group_quantiles_empty_and_validation(ray_session):
    from liken_ray.extras.relational import group_quantiles

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [1]}))
    with pytest.raises(ValueError):
        group_quantiles(ds, "k", "v", [])
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    assert group_quantiles(empty, "k", "v", [0.5]).take_all() == []


# ---------------------------------------------------------------------------
# table_profile
# ---------------------------------------------------------------------------


def test_table_profile_matches_pandas(ray_session):
    from liken_ray.extras.relational import table_profile

    df = pd.DataFrame(
        {
            "i": [3, None, 1, 7, None],
            "s": ["b", "a", None, "z", "a"],
        }
    ).astype({"i": "Int64"})
    ds = ray.data.from_arrow(
        pa.table({"i": pa.array([3, None, 1, 7, None], pa.int64()),
                  "s": pa.array(["b", "a", None, "z", "a"])})
    ).repartition(3)
    out = table_profile(ds)
    rows = {r["column"]: r for r in out.to_pylist()}
    assert rows["i"] == {"column": "i", "n": 3, "nulls": 2, "min": "1",
                         "max": "7", "sum": 11}
    assert rows["s"] == {"column": "s", "n": 4, "nulls": 1, "min": "a",
                         "max": "z", "sum": None}
    with pytest.raises(KeyError):
        table_profile(ds, ["nope"])


def test_group_topk_huge_int_keys_with_nulls(ray_session):
    """Distinct int64 keys above 2^53 in a null-bearing column must stay
    distinct (raw to_numpy would round them through float64)."""
    from liken_ray.extras.relational import group_topk

    a, b = 2**63 - 2, 2**63 - 1
    df = pa.table(
        {
            "k": pa.array([a] * 3 + [b] * 3 + [None], pa.int64()),
            "s": pa.array([1, 2, 3, 4, 5, 6, 9], pa.int64()),
            "id": pa.array(list(range(7)), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(df).repartition(4)
    rows = group_topk(ds, "k", "s", 1, tie_col="id").take_all()
    got = {r["k"]: r["s"] for r in rows}
    assert got == {a: 3, b: 6, None: 9}


def test_group_quantiles_huge_int_keys_with_nulls(ray_session):
    from liken_ray.extras.relational import group_quantiles

    a, b = 2**63 - 2, 2**63 - 1
    df = pa.table(
        {
            "k": pa.array([a] * 3 + [b] * 3 + [None], pa.int64()),
            "v": pa.array([1, 2, 3, 40, 50, 60, 9], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(df).repartition(4)
    got = {
        (r["k"], r["q"]): r["value"]
        for r in group_quantiles(ds, "k", "v", [1.0]).take_all()
    }
    assert got == {(a, 1.0): 3, (b, 1.0): 60, (None, 1.0): 9}
