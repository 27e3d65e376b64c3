"""merge_join: distributed sort-merge equi-join (large x large, unique
right key). Oracle = pandas merge; skew and >2^53 null-key trap covered."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from liken_ray.extras.joins import broadcast_join, merge_join


def _pandas_oracle(left: pd.DataFrame, right: pd.DataFrame, on, right_on, how):
    out = left.merge(
        right, how=how, left_on=on, right_on=right_on, suffixes=("", "_r")
    )
    if right_on != on and right_on in out.columns and right_on not in left.columns:
        out = out.drop(columns=[right_on])
    return out


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols].sort_values(cols).reset_index(drop=True).astype(object)
    )


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    got, want = _sorted(got), _sorted(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        gm = pd.isna(g.astype(object))
        wm = pd.isna(w.astype(object))
        assert (gm == wm).all(), c
        assert (g[~gm] == w[~wm]).all(), c


@pytest.mark.parametrize("how", ["inner", "left"])
def test_merge_join_matches_pandas(ray_session, how):
    import ray

    rng = np.random.RandomState(7)
    n_left, n_right = 5000, 800
    # ~20% of left keys miss the right side; some left keys are null
    lkey = rng.randint(0, 1000, n_left).astype(np.int64)
    lkey_null = rng.rand(n_left) < 0.05
    left = pd.DataFrame(
        {
            "k": pd.array(
                np.where(lkey_null, 0, lkey), dtype="Int64"
            ),
            "lval": rng.randint(0, 10**6, n_left).astype(np.int64),
            "ltxt": [f"l{i % 37}" for i in range(n_left)],
        }
    )
    left.loc[lkey_null, "k"] = pd.NA
    rkeys = rng.permutation(1000)[:n_right].astype(np.int64)
    right = pd.DataFrame(
        {
            "rk": rkeys,
            "rval": rng.randint(0, 10**6, n_right).astype(np.int64),
            "rtxt": [f"r{k % 11}" for k in rkeys],
        }
    )
    lds = ray.data.from_pandas(left).repartition(13)
    rds = ray.data.from_pandas(right).repartition(5)
    got = merge_join(
        lds, rds, on="k", right_on="rk", right_cols=["rval", "rtxt"], how=how
    ).to_pandas()
    want = _pandas_oracle(left, right, "k", "rk", how)
    _assert_frames_equal(got, want)


def test_merge_join_hot_key_spans_blocks(ray_session):
    """One key holds 80% of the left rows — the run spans many sorted
    blocks and every match past the first block comes from the carry
    chain; per-task work stays one block."""
    import ray

    n = 40000
    k = np.where(np.arange(n) % 5 == 0, np.arange(n) % 97 + 1000, 7).astype(
        np.int64
    )
    left = pd.DataFrame({"k": k, "lval": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame(
        {
            "k": np.unique(k),
            "rval": np.unique(k) * 10,
        }
    )
    lds = ray.data.from_pandas(left).repartition(32)
    rds = ray.data.from_pandas(right).repartition(3)
    got = merge_join(lds, rds, on="k", right_cols=["rval"], how="inner").to_pandas()
    want = _pandas_oracle(left, right, "k", "k", "inner")
    _assert_frames_equal(got, want)
    # the hot-key run really does span multiple sorted blocks
    assert (left["k"] == 7).sum() > n // 2


def test_merge_join_parity_with_broadcast_join(ray_session):
    import ray

    rng = np.random.RandomState(3)
    fact = pd.DataFrame(
        {
            "nk": rng.randint(0, 25, 2000).astype(np.int64),
            "amount": rng.randint(0, 100, 2000).astype(np.int64),
        }
    )
    dim = pd.DataFrame(
        {
            "nk": np.arange(25, dtype=np.int64),
            "name": [f"nation{i}" for i in range(25)],
        }
    )
    fds = ray.data.from_pandas(fact).repartition(8)
    a = merge_join(
        fds, ray.data.from_pandas(dim), on="nk", right_cols=["name"], how="inner"
    ).to_pandas()
    b = broadcast_join(
        fds, pa.Table.from_pandas(dim), on="nk", right_cols=["name"], how="inner"
    ).to_pandas()
    _assert_frames_equal(a, b)


def test_merge_join_duplicate_right_key_raises(ray_session):
    import ray

    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    right = pd.DataFrame(
        {"k": np.array([5] * 2 + list(range(50)), dtype=np.int64), "v": 1}
    )
    with pytest.raises(Exception, match="not unique"):
        merge_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right).repartition(4),
            on="k",
            right_cols=["v"],
        ).materialize()


def test_merge_join_duplicate_right_key_across_blocks_raises(ray_session):
    """Duplicates that land in DIFFERENT sorted blocks are caught by the
    carry chain, not the in-block count."""
    import ray

    left = pd.DataFrame({"k": np.full(20000, 7, dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([7, 7], dtype=np.int64), "v": [1, 2]})
    with pytest.raises(Exception, match="not unique"):
        merge_join(
            ray.data.from_pandas(left).repartition(16),
            ray.data.from_pandas(right),
            on="k",
            right_cols=["v"],
        ).materialize()


def test_merge_join_string_keys_and_collision_suffix(ray_session):
    import ray

    left = pd.DataFrame(
        {"k": ["a", "b", "c", "a", None], "v": [1, 2, 3, 4, 5]}
    )
    right = pd.DataFrame({"k": ["a", "c", "d"], "v": [10, 30, 40]})
    got = merge_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on="k",
        right_cols=["v"],
        how="left",
    ).to_pandas()
    want = _pandas_oracle(left, right, "k", "k", "left")
    _assert_frames_equal(got, want)


def test_merge_join_large_int64_null_keys_exact(ray_session):
    """Null-bearing int64 keys above 2^53 must join exactly (the
    float64-conversion trap garbles them; the sentinel-encoded sort and
    arrow-side compares must not)."""
    import ray

    big = (1 << 62) + np.arange(6, dtype=np.int64)
    left = pd.DataFrame(
        {"k": pd.array(list(big) + [pd.NA, pd.NA], dtype="Int64"),
         "lv": np.arange(8, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": big[::2], "rv": np.arange(3, dtype=np.int64)}
    )
    out_ds = merge_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right).repartition(2),
        on="k",
        right_cols=["rv"],
        how="left",
    )
    # read back ARROW-side: to_pandas on a null-bearing int64 column goes
    # through float64 and garbles >2^53 values — the very trap under test
    got = pa.concat_tables(ray.get(out_ds.to_arrow_refs()))
    assert got.num_rows == 8
    import pyarrow.compute as pc

    hit = got.filter(pc.is_valid(got["rv"]))
    assert sorted(hit["k"].to_pylist()) == sorted(big[::2])
    lookup = {int(k): i for i, k in enumerate(big[::2])}
    for k, rv in zip(hit["k"].to_pylist(), hit["rv"].to_pylist()):
        assert rv == lookup[int(k)]


def test_merge_join_empty_sides(ray_session):
    import ray

    left = pd.DataFrame({"k": pd.array([], dtype="Int64"),
                         "lv": pd.array([], dtype="Int64")})
    right = pd.DataFrame({"k": np.array([1], dtype=np.int64),
                          "rv": np.array([2], dtype=np.int64)})
    out_ds = merge_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on="k",
        right_cols=["rv"],
    )
    # Dataset.to_pandas drops columns on an empty result — check arrow-side
    out = pa.concat_tables(ray.get(out_ds.to_arrow_refs()))
    assert out.num_rows == 0
    assert sorted(out.schema.names) == ["k", "lv", "rv"]

    out2 = merge_join(
        ray.data.from_pandas(right),
        ray.data.from_pandas(left),
        on="k",
        right_cols=["lv"],
        how="left",
    ).to_pandas()
    assert len(out2) == 1 and pd.isna(out2["lv"][0])


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_merge_join_semi_anti_matches_pandas(ray_session, how):
    """semi/anti = EXISTS / NOT EXISTS: duplicate right keys are fine,
    null-key left rows drop for semi and survive for anti."""
    import ray

    rng = np.random.RandomState(11)
    n_left, n_right = 4000, 2500
    lkey = rng.randint(0, 600, n_left).astype(np.int64)
    lkey_null = rng.rand(n_left) < 0.05
    left = pd.DataFrame(
        {
            "k": pd.array(np.where(lkey_null, 0, lkey), dtype="Int64"),
            "lval": rng.randint(0, 10**6, n_left).astype(np.int64),
        }
    )
    left.loc[lkey_null, "k"] = pd.NA
    # heavily duplicated membership list (~300 distinct keys, many repeats)
    right = pd.DataFrame(
        {"rk": rng.randint(0, 300, n_right).astype(np.int64)}
    )
    lds = ray.data.from_pandas(left).repartition(11)
    rds = ray.data.from_pandas(right).repartition(7)
    got = merge_join(lds, rds, on="k", right_on="rk", how=how).to_pandas()
    member = set(right["rk"].tolist())
    in_set = left["k"].map(lambda v: v in member if pd.notna(v) else False)
    want = left[in_set] if how == "semi" else left[~in_set]
    _assert_frames_equal(got, want.reset_index(drop=True))
    if how == "anti":
        # null-key left rows must survive NOT EXISTS
        assert got["k"].isna().sum() == int(lkey_null.sum())


def test_merge_join_semi_hot_key_spans_blocks(ray_session):
    """A membership key repeated enough to span many sorted blocks on the
    RIGHT side (legal for semi/anti) still yields each left row once."""
    import ray

    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64) % 5})
    right = pd.DataFrame(
        {"rk": np.full(50_000, 3, dtype=np.int64)}
    )
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(16)
    semi = merge_join(lds, rds, on="k", right_on="rk", how="semi").to_pandas()
    anti = merge_join(lds, rds, on="k", right_on="rk", how="anti").to_pandas()
    assert len(semi) == 20 and (semi["k"] == 3).all()
    assert len(anti) == 80 and (anti["k"] != 3).all()


def test_merge_join_semi_anti_reject_right_cols(ray_session):
    import ray

    lds = ray.data.from_pandas(pd.DataFrame({"k": [1]}))
    rds = ray.data.from_pandas(pd.DataFrame({"rk": [1], "v": [2]}))
    with pytest.raises(ValueError, match="right_cols"):
        merge_join(lds, rds, on="k", right_on="rk", right_cols=["v"], how="semi")


def test_merge_join_semi_anti_large_int64_exact(ray_session):
    """Keys above 2^53 stay exact through the existence path."""
    import ray

    big = 2**63 - 7
    left = pd.DataFrame({"k": pd.array([big, big - 1, None, 5], dtype="Int64")})
    right = pd.DataFrame({"rk": pd.array([big, 5, 5], dtype="Int64")})
    lds = ray.data.from_pandas(left).repartition(2)
    rds = ray.data.from_pandas(right).repartition(2)
    # compare arrow-side: pandas would route null-bearing int64 through
    # float64 (the documented >2^53 garble) in the TEST itself
    def _arrow(ds):
        return pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])

    semi = _arrow(merge_join(lds, rds, on="k", right_on="rk", how="semi"))
    anti = _arrow(merge_join(lds, rds, on="k", right_on="rk", how="anti"))
    assert sorted(semi["k"].drop_null().to_pylist()) == [5, big]
    got_anti = anti["k"].to_pylist()
    assert len(got_anti) == 2 and big - 1 in got_anti and None in got_anti


def test_merge_join_outer_matches_pandas(ray_session):
    """FULL OUTER JOIN: left-only, matched, and right-only rows; null-key
    rows on both sides surface exactly once."""
    import ray

    rng = np.random.RandomState(21)
    n_left, n_right = 3000, 700
    lkey = rng.randint(0, 900, n_left).astype(np.int64)
    lnull = rng.rand(n_left) < 0.04
    left = pd.DataFrame(
        {
            "k": pd.array(np.where(lnull, 0, lkey), dtype="Int64"),
            "lval": rng.randint(0, 10**6, n_left).astype(np.int64),
        }
    )
    left.loc[lnull, "k"] = pd.NA
    rkeys = rng.permutation(1200)[:n_right].astype(np.int64)  # some unmatched
    right = pd.DataFrame(
        {
            "rk": pd.array(rkeys, dtype="Int64"),
            "rval": rng.randint(0, 10**6, n_right).astype(np.int64),
        }
    )
    right.loc[0, "rk"] = pd.NA  # a null-key right row -> right-only output
    lds = ray.data.from_pandas(left).repartition(9)
    rds = ray.data.from_pandas(right).repartition(4)
    got = merge_join(
        lds, rds, on="k", right_on="rk", right_cols=["rval"], how="outer"
    ).to_pandas()
    # pandas outer-merge matches NA keys together; SQL does not — build
    # the expectation as left join + unmatched right (incl. the null-key row)
    lj = left.merge(
        right.dropna(subset=["rk"]), how="left", left_on="k", right_on="rk"
    ).drop(columns=["rk"])
    matched = set(right.dropna(subset=["rk"])["rk"].astype(int)) & set(
        left["k"].dropna().astype(int)
    )
    ronly = right[~right["rk"].isin(matched)].copy()
    rexp = pd.DataFrame(
        {"k": pd.array([pd.NA] * len(ronly), dtype="Int64"),
         "lval": pd.array([pd.NA] * len(ronly), dtype="Int64"),
         "rval": ronly["rval"].to_numpy()}
    )
    want = pd.concat([lj, rexp], ignore_index=True)
    _assert_frames_equal(got, want)


def test_merge_join_outer_all_matched_equals_left(ray_session):
    import ray

    left = pd.DataFrame({"k": np.arange(50, dtype=np.int64) % 10,
                         "lv": np.arange(50, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(10, dtype=np.int64),
                          "rv": np.arange(10, dtype=np.int64) * 7})
    lds = ray.data.from_pandas(left).repartition(3)
    rds = ray.data.from_pandas(right).repartition(2)
    outer = merge_join(lds, rds, on="k", right_on="rk",
                       right_cols=["rv"], how="outer").to_pandas()
    lj = merge_join(lds, rds, on="k", right_on="rk",
                    right_cols=["rv"], how="left").to_pandas()
    _assert_frames_equal(outer, lj)


def test_merge_join_outer_surfaces_right_key_via_right_cols(ray_session):
    import ray

    left = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64)})
    right = pd.DataFrame({"rk": np.array([2, 9], dtype=np.int64),
                          "rv": np.array([20, 90], dtype=np.int64)})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    got = merge_join(lds, rds, on="k", right_on="rk",
                     right_cols=["rk", "rv"], how="outer").to_pandas()
    ronly = got[got["k"].isna()]
    assert ronly["rk"].astype(int).tolist() == [9]
    assert ronly["rv"].astype(int).tolist() == [90]
