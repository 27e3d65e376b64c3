"""group_cumsum: per-key running totals (SQL SUM OVER PARTITION ... ROWS
UNBOUNDED PRECEDING) via one range sort + per-block prefix sums + an
O(blocks) (sum, count) carry chain."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from liken_ray.extras.relational import group_cumsum


def _run(df: pd.DataFrame, key, order, vals, parts=9) -> pd.DataFrame:
    import ray

    ds = ray.data.from_pandas(df).repartition(parts)
    return group_cumsum(ds, key, order, vals).to_pandas()


def test_group_cumsum_matches_duckdb(ray_session):
    rng = np.random.RandomState(5)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 300, n).astype(np.int64),
            "o": np.arange(n, dtype=np.int64),
            "v": rng.randint(-50, 50, n).astype(np.int64),
        }
    )
    got = _run(df, "k", ["o"], ["v"]).sort_values("o").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT k, o, v, SUM(v) OVER (PARTITION BY k ORDER BY o) AS v_cumsum "
        "FROM df ORDER BY o"
    ).df()
    assert got["v_cumsum"].astype(np.int64).tolist() == want["v_cumsum"].astype(np.int64).tolist()


def test_group_cumsum_hot_key_spans_blocks(ray_session):
    n = 60_000
    df = pd.DataFrame(
        {
            "k": np.zeros(n, dtype=np.int64),
            "o": np.arange(n, dtype=np.int64),
            "v": np.ones(n, dtype=np.int64),
        }
    )
    got = _run(df, "k", ["o"], ["v"], parts=16).sort_values("o")
    assert got["v_cumsum"].tolist() == list(range(1, n + 1))


def test_group_cumsum_sql_null_semantics(ray_session):
    df = pd.DataFrame(
        {
            "k": [1] * 5 + [2] * 2,
            "o": list(range(5)) + [0, 1],
            "v": pd.array([None, 3, None, 4, None, None, None], dtype="Int64"),
        }
    )
    got = _run(df, "k", ["o"], ["v"], parts=3).sort_values(["k", "o"])
    # leading nulls -> NULL; null rows after a value carry the running sum;
    # an all-null partition stays NULL throughout
    vals = got["v_cumsum"].tolist()
    def norm(x):
        return None if pd.isna(x) else int(x)
    assert [norm(x) for x in vals] == [None, 3, 3, 7, 7, None, None]


def test_group_cumsum_null_keys_one_partition(ray_session):
    df = pd.DataFrame(
        {
            "k": pd.array([None, None, 1], dtype="Int64"),
            "o": [0, 1, 0],
            "v": [10, 5, 1],
        }
    )
    got = _run(df, "k", ["o"], ["v"], parts=2)
    nullp = got[got["k"].isna()].sort_values("o")
    assert nullp["v_cumsum"].tolist() == [10, 15]


def test_group_cumsum_large_int64_exact(ray_session):
    big = 2**53 + 7  # above float64's exact-integer range, sum-safe in int64
    df = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "o": [0, 1, 2],
            "v": pd.array([big, None, big], dtype="Int64"),
        }
    )
    got = _run(df, "k", ["o"], ["v"], parts=2).sort_values("o")
    assert got["v_cumsum"].tolist() == [big, big, 2 * big]


def test_group_cumsum_float_and_multi_value(ray_session):
    rng = np.random.RandomState(9)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 40, n).astype(np.int64),
            "o": np.arange(n, dtype=np.int64),
            "a": rng.rand(n),
            "b": rng.randint(0, 9, n).astype(np.int64),
        }
    )
    got = _run(df, "k", ["o"], ["a", "b"]).sort_values("o").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT SUM(a) OVER w AS a_c, SUM(b) OVER w AS b_c, o FROM df "
        "WINDOW w AS (PARTITION BY k ORDER BY o) ORDER BY o"
    ).df()
    np.testing.assert_allclose(got["a_cumsum"].to_numpy(), want["a_c"].to_numpy(), rtol=1e-9)
    assert got["b_cumsum"].astype(np.int64).tolist() == want["b_c"].astype(np.int64).tolist()


def test_group_cumsum_rejects_bad_inputs(ray_session):
    import ray

    df = pd.DataFrame({"k": [1], "o": pd.array([None], dtype="Int64"), "v": [1]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="order column"):
        group_cumsum(ds, "k", ["o"], ["v"]).materialize()
    df2 = pd.DataFrame({"k": [1], "o": [1], "v": ["x"]})
    with pytest.raises(TypeError, match="numeric"):
        group_cumsum(ray.data.from_pandas(df2), "k", ["o"], ["v"])
