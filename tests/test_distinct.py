"""distinct: exact SELECT DISTINCT via local per-batch distinct + one
range sort + run-start keep + O(blocks) boundary drop."""

import numpy as np
import pandas as pd
import pytest

from liken_ray.extras.relational import distinct


def _run(df: pd.DataFrame, cols, parts=9) -> pd.DataFrame:
    import ray

    ds = ray.data.from_pandas(df).repartition(parts)
    return distinct(ds, cols).to_pandas()


def test_distinct_matches_pandas(ray_session):
    rng = np.random.RandomState(2)
    n = 20_000
    df = pd.DataFrame(
        {
            "a": rng.randint(0, 40, n).astype(np.int64),
            "b": [f"s{i % 13}" for i in rng.randint(0, 200, n)],
        }
    )
    got = _run(df, ["a", "b"])
    want = df.drop_duplicates(["a", "b"])
    assert len(got) == len(want)
    assert set(map(tuple, got.itertuples(index=False))) == set(
        map(tuple, want.itertuples(index=False))
    )


def test_distinct_value_spans_blocks(ray_session):
    """One value duplicated across every input block must survive once."""
    df = pd.DataFrame({"a": np.r_[np.zeros(50_000, dtype=np.int64), [1]]})
    got = _run(df, ["a"], parts=16)
    assert sorted(got["a"].tolist()) == [0, 1]


def test_distinct_nulls_group(ray_session):
    df = pd.DataFrame(
        {
            "a": pd.array([None, None, 1, 1, None], dtype="Int64"),
            "b": ["x", "x", "x", "y", None],
        }
    )
    got = _run(df, ["a", "b"], parts=3)
    rows = set(
        (None if pd.isna(r.a) else int(r.a), r.b if isinstance(r.b, str) else None)
        for r in got.itertuples(index=False)
    )
    assert rows == {(None, "x"), (1, "x"), (1, "y"), (None, None)}


def test_distinct_large_int64_exact(ray_session):
    big = 2**63 - 11
    df = pd.DataFrame({"a": pd.array([big, big, big - 1], dtype="Int64")})
    import ray
    import pyarrow as pa

    ds = ray.data.from_pandas(df).repartition(2)
    out = pa.concat_tables(
        [ray.get(r) for r in distinct(ds, ["a"]).to_arrow_refs()]
    )
    assert sorted(out["a"].to_pylist()) == [big - 1, big]


def test_distinct_rejects_floats_and_empty(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({"a": [1.5]}))
    with pytest.raises(TypeError, match="NaN"):
        distinct(ds, ["a"])
    empty = ray.data.from_pandas(pd.DataFrame({"a": pd.array([], dtype="Int64")}))
    got = distinct(empty, ["a"])
    assert got.count() == 0 and got.schema().names == ["a"]
