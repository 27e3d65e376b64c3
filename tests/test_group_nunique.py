"""group_nunique: exact per-key COUNT(DISTINCT val) via local pair-distinct
+ one range sort + per-block segmented count + O(blocks) boundary dedupe."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from liken_ray.extras.relational import group_nunique


def _run(df: pd.DataFrame, keys, val, parts=9) -> pd.DataFrame:
    import ray

    ds = ray.data.from_pandas(df).repartition(parts)
    return group_nunique(ds, keys, val).to_pandas()


def _want(df: pd.DataFrame, keys, val) -> pd.DataFrame:
    g = df.groupby(keys, dropna=False)[val].nunique(dropna=True)
    return g.reset_index().rename(columns={val: "nunique"})


def _check(got: pd.DataFrame, want: pd.DataFrame, keys):
    got = got.sort_values(keys, na_position="last").reset_index(drop=True)
    want = want.sort_values(keys, na_position="last").reset_index(drop=True)
    assert len(got) == len(want)
    assert got["nunique"].astype(int).tolist() == want["nunique"].astype(int).tolist()


def test_group_nunique_matches_pandas(ray_session):
    rng = np.random.RandomState(3)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 500, n).astype(np.int64),
            "v": rng.randint(0, 40, n).astype(np.int64),
        }
    )
    _check(_run(df, ["k"], "v"), _want(df, ["k"], "v"), ["k"])


def test_group_nunique_null_vals_and_all_null_group(ray_session):
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3, 3],
            "v": pd.array([5, 5, None, None, None, 7, 8], dtype="Int64"),
        }
    )
    got = _run(df, ["k"], "v", parts=3).set_index("k")["nunique"]
    # SQL COUNT(DISTINCT) ignores nulls; all-null group still emits 0
    assert got.to_dict() == {1: 1, 2: 0, 3: 2}


def test_group_nunique_null_keys_group_together(ray_session):
    df = pd.DataFrame(
        {
            "k": pd.array([None, None, 1, 1], dtype="Int64"),
            "v": ["a", "b", "a", "a"],
        }
    )
    got = _run(df, ["k"], "v", parts=2)
    nullrow = got[got["k"].isna()]
    assert len(nullrow) == 1 and int(nullrow["nunique"].iloc[0]) == 2
    assert int(got[got["k"] == 1]["nunique"].iloc[0]) == 1


def test_group_nunique_pair_spans_many_blocks(ray_session):
    """One hot (key, val) pair duplicated across every input block must
    count exactly once; a second val confirms the sum path."""
    df = pd.DataFrame(
        {
            "k": np.zeros(50_000, dtype=np.int64),
            "v": np.r_[np.zeros(49_999, dtype=np.int64), [1]],
        }
    )
    got = _run(df, ["k"], "v", parts=16)
    assert got["nunique"].tolist() == [2]


def test_group_nunique_multi_key_and_strings(ray_session):
    rng = np.random.RandomState(11)
    n = 5000
    df = pd.DataFrame(
        {
            "a": rng.randint(0, 20, n).astype(np.int64),
            "b": [f"s{i % 7}" for i in rng.randint(0, 1000, n)],
            "v": [f"v{i % 13}" for i in rng.randint(0, 10_000, n)],
        }
    )
    _check(_run(df, ["a", "b"], "v"), _want(df, ["a", "b"], "v"), ["a", "b"])


def test_group_nunique_large_int64_exact(ray_session):
    """Distinct vals above 2^53 must not collapse through float64."""
    big = 2**63 - 10
    df = pd.DataFrame(
        {
            "k": [1] * 6,
            "v": pd.array([big, big + 1, big + 2, big, None, big + 2], dtype="Int64"),
        }
    )
    got = _run(df, ["k"], "v", parts=3)
    assert got["nunique"].tolist() == [3]


def test_group_nunique_rejects_float_val(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1.5]}))
    with pytest.raises(TypeError, match="NaN"):
        group_nunique(ds, ["k"], "v")


def test_group_nunique_empty(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({"k": pd.array([], dtype="Int64"),
                                            "v": pd.array([], dtype="Int64")}))
    got = group_nunique(ds, ["k"], "v")
    # Ray's empty-table to_pandas drops columns — assert on the schema
    assert got.count() == 0
    assert got.schema().names == ["k", "nunique"]
