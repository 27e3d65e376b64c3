"""Round-5 fixes: semdedup hot-cell block partitioning, broadcast_join
null-int64 key exactness, asof_join null sort-key enforcement, _vecs
slice-safety, window aggregates off groupby().aggregate.

Each fix is pinned against an independent reference (numpy brute force,
pandas) on inputs shaped to hit the failure mode the round-4 verdict /
advice described."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from liken_ray.extras.ann import _vecs
from liken_ray.extras.joins import asof_join, broadcast_join
from liken_ray.extras.semdedup import semdedup
from liken_ray.extras.windows import sliding_window_counts, tumbling_window_counts
from tests.test_round4b import _semdedup_reference, _vec_table


# ---------------------------------------------------------------------------
# semdedup: hot cell spanning many sorted blocks (the round-4 verdict's
# "weak at 100 TB" item — one task per cell is gone; every block scans its
# own rows plus a streamed prefix)
# ---------------------------------------------------------------------------


def test_semdedup_hot_cell_spans_blocks(ray_session):
    rng = np.random.default_rng(50)
    # ONE dominant cell: every vector near centroid 0, far from centroid 1
    cents = np.vstack([np.ones(12), -np.ones(12)])
    base = np.ones((240, 12)) + 0.3 * rng.standard_normal((240, 12))
    # plant near-dup pairs whose ids are FAR apart, so after the (cell, id)
    # sort the pair members land in different blocks and only the
    # cross-block prefix scan can see them
    dups = base[:20] + 1e-4 * rng.standard_normal((20, 12))
    vecs = np.vstack([base, dups])
    ids = np.arange(len(vecs), dtype=np.int64)
    ds = ray.data.from_arrow(_vec_table(vecs, ids)).repartition(9)
    got = {
        r["vec_id"]: (r["cell"], r["is_dup"])
        for r in semdedup(ds, eps=0.999, centroids=cents, tile=17).take_all()
    }
    want = _semdedup_reference(
        vecs.astype(np.float32).astype(np.float64), ids, cents, 0.999
    )
    assert got == want
    # the whole corpus really did land in one cell (the hot-cell shape)
    assert {c for c, _ in got.values()} == {0}
    assert sum(d for _, d in got.values()) >= 20


def test_semdedup_multi_cell_tile_boundaries(ray_session):
    # cells + tile sizes chosen so a tile straddles a cell boundary: a row
    # must only see EARLIER rows of ITS OWN cell run (per-row col_lo/col_hi)
    rng = np.random.default_rng(51)
    cents = rng.standard_normal((5, 8)) * 2
    vecs = np.repeat(cents, 13, axis=0) + 0.05 * rng.standard_normal((65, 8))
    ids = rng.permutation(65).astype(np.int64)
    ds = ray.data.from_arrow(_vec_table(vecs, ids)).repartition(4)
    got = {
        r["vec_id"]: (r["cell"], r["is_dup"])
        for r in semdedup(ds, eps=0.98, centroids=cents, tile=7).take_all()
    }
    want = _semdedup_reference(
        vecs.astype(np.float32).astype(np.float64), ids, cents, 0.98
    )
    assert got == want


def test_semdedup_null_ids_raise(ray_session):
    vecs = np.ones((3, 4))
    flat = pa.array(vecs.reshape(-1), pa.float64())
    emb = pa.ListArray.from_arrays(pa.array([0, 4, 8, 12], pa.int32()), flat)
    t = pa.table({"vec_id": pa.array([1, None, 3], pa.int64()), "embedding": emb})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="nulls"):
        semdedup(ds, eps=0.5, centroids=np.ones((1, 4))).take_all()


# ---------------------------------------------------------------------------
# broadcast_join: null-bearing int64 fact keys above 2^53 must stay exact
# (the float64 to_numpy garble — ADVICE round 4)
# ---------------------------------------------------------------------------


def test_broadcast_join_null_int64_keys_above_2_53(ray_session):
    big = 1 << 61
    # adjacent huge keys collapse to the same float64; nulls force the
    # old code down the float64 conversion path
    fact = pa.table(
        {
            "k": pa.array([big + 1, big + 2, None, big + 3], pa.int64()),
            "x": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    dim = pa.table(
        {
            "k": pa.array([big + 1, big + 3], pa.int64()),
            "name": pa.array(["a", "c"]),
        }
    )
    out = broadcast_join(ray.data.from_arrow(fact), dim, on="k", how="left")
    rows = {r["x"]: r["name"] for r in out.take_all()}
    assert rows == {0: "a", 1: None, 2: None, 3: "c"}
    inner = broadcast_join(ray.data.from_arrow(fact), dim, on="k", how="inner")
    assert {r["x"] for r in inner.take_all()} == {0, 3}


def test_broadcast_join_all_null_fact_keys(ray_session):
    fact = pa.table(
        {"k": pa.array([None, None], pa.int64()), "x": pa.array([0, 1], pa.int64())}
    )
    dim = pa.table({"k": pa.array([7], pa.int64()), "name": pa.array(["a"])})
    out = broadcast_join(ray.data.from_arrow(fact), dim, on="k", how="left")
    assert [r["name"] for r in out.take_all()] == [None, None]


# ---------------------------------------------------------------------------
# asof_join: null by/on is a loud error (Ray's range sort crashes on null
# sort keys; silent nulls had no defined match semantics)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("col", ["k", "ts"])
def test_asof_join_null_sort_keys_raise(ray_session, side, col):
    good = pd.DataFrame({"k": [1, 2], "ts": [10, 20], "p": [0, 1]})
    bad = good.copy()
    bad[col] = bad[col].astype("Int64")
    bad.loc[0, col] = pd.NA
    left = ray.data.from_pandas(bad if side == "left" else good)
    right = ray.data.from_pandas(good if side == "left" else bad)
    with pytest.raises(Exception, match="non-null"):
        asof_join(left, right, on="ts", by="k", right_cols=["p"]).take_all()


# ---------------------------------------------------------------------------
# _vecs: sliced fixed-size-list batches (ADVICE: .values ignores the slice
# offset)
# ---------------------------------------------------------------------------


def test_vecs_sliced_fixed_size_list():
    a = pa.FixedSizeListArray.from_arrays(
        pa.array(np.arange(12, dtype=np.float64)), 3
    )
    out = _vecs(a.slice(2, 2))
    assert out.shape == (2, 3)
    np.testing.assert_array_equal(out, np.arange(6, 12, dtype=np.float64).reshape(2, 3))


def test_vecs_sliced_var_list():
    flat = pa.array(np.arange(12, dtype=np.float64))
    a = pa.ListArray.from_arrays(pa.array([0, 3, 6, 9, 12], pa.int32()), flat)
    out = _vecs(a.slice(1, 2))
    np.testing.assert_array_equal(out, np.arange(3, 9, dtype=np.float64).reshape(2, 3))


# ---------------------------------------------------------------------------
# windows: sort + segmented sum (no groupby().aggregate) must match pandas,
# including null keys / null timestamps and the sum_value path
# ---------------------------------------------------------------------------


def _events_frame(rng, n, null_keys=False, null_ts=False):
    ts = rng.integers(0, 10 * 3600, n) * 1_000_000  # epoch-us over 10 hours
    key = rng.choice(["a", "b", "c"], n).astype(object)
    if null_keys:
        key[rng.random(n) < 0.1] = None
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts, unit="us"),
            "event_type": key,
            "value": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    if null_ts:
        df.loc[df.sample(frac=0.05, random_state=1).index, "ts"] = pd.NaT
    return df


def _tumbling_reference(df, window_s, with_value):
    epoch = df["ts"].astype("int64") // 1000  # ns -> us; NaT masked below
    start = (epoch // (window_s * 1_000_000)) * (window_s * 1_000_000)
    start = start.where(df["ts"].notna(), pd.NA)
    g = df.assign(ws=start).groupby(["ws", "event_type"], dropna=False)
    out = g.size().rename("cnt").reset_index()
    if with_value:
        out = out.merge(
            g["value"].sum().rename("sum_value").reset_index(),
            on=["ws", "event_type"],
            how="left",
        )
    return {
        (None if pd.isna(r.ws) else int(r.ws),
         None if pd.isna(r.event_type) else r.event_type): (
            (int(r.cnt), int(r.sum_value)) if with_value else int(r.cnt)
        )
        for r in out.itertuples()
    }


@pytest.mark.parametrize("with_value", [False, True])
def test_tumbling_window_matches_pandas(ray_session, with_value):
    rng = np.random.default_rng(52)
    df = _events_frame(rng, 700, null_keys=True, null_ts=True)
    ds = ray.data.from_pandas(df).repartition(5)
    out = tumbling_window_counts(
        ds, window_s=3600, value_col="value" if with_value else None
    ).take_all()
    got = {}
    for r in out:
        ws = r["window_start"]
        wkey = None if ws is None else int(pd.Timestamp(ws).value // 1000)
        got[(wkey, r["event_type"])] = (
            (r["cnt"], r["sum_value"]) if with_value else r["cnt"]
        )
    assert got == _tumbling_reference(df, 3600, with_value)


def test_tumbling_window_float_values(ray_session):
    rng = np.random.default_rng(53)
    df = _events_frame(rng, 100)
    df["value"] = df["value"].astype(np.float64) / 7.0
    ds = ray.data.from_pandas(df)
    out = tumbling_window_counts(ds, window_s=3600).take_all()
    assert all(isinstance(r["sum_value"], float) for r in out)
    assert sum(r["cnt"] for r in out) == 100
    np.testing.assert_allclose(
        sum(r["sum_value"] for r in out), df["value"].sum(), rtol=1e-9
    )


def test_sliding_window_matches_pandas(ray_session):
    rng = np.random.default_rng(54)
    df = _events_frame(rng, 600, null_keys=True)
    ds = ray.data.from_pandas(df).repartition(4)
    out = sliding_window_counts(ds, window_s=3600, slide_s=900).take_all()
    got = {
        (int(pd.Timestamp(r["window_start"]).value // 1000), r["event_type"]): r["cnt"]
        for r in out
    }
    # reference: each event lands in the k sliding windows covering it
    want: dict = {}
    slide_us, win_us = 900 * 1_000_000, 3600 * 1_000_000
    for _, row in df.iterrows():
        e = int(row["ts"].value // 1000)
        last = (e // slide_us) * slide_us
        s = last
        while s + win_us > e and s >= last - 3 * slide_us:
            k = (s, row["event_type"])
            want[k] = want.get(k, 0) + 1
            s -= slide_us
    assert got == want


def test_windows_no_ray_aggregate(ray_session):
    """The window ops must not route through Ray's groupby().aggregate()
    (the repo's measured 2x-vs-sort law at high key cardinality)."""
    import inspect

    import liken_ray.extras.windows as w

    src = inspect.getsource(w)
    # pyarrow's LOCAL Table.group_by is fine; Ray's Dataset.groupby is not
    assert ".groupby(" not in src
    assert "ray.data.aggregate" not in src


# ---------------------------------------------------------------------------
# review fixes: null value groups, pre-1970 floor, exotic key types,
# narrow fact key types, null embeddings
# ---------------------------------------------------------------------------


def test_tumbling_all_null_value_group_is_null_sum(ray_session):
    # one window/key group with ONLY null values: SQL SUM semantics (NULL),
    # and the null partial must not poison neighbouring groups' sums
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime([10, 20, 4000, 4001], unit="s"),
            "event_type": ["a", "a", "b", "b"],
            "value": pd.array([None, None, 5, 7], dtype="Int64"),
        }
    )
    out = tumbling_window_counts(ray.data.from_pandas(df), window_s=3600).take_all()
    by_key = {r["event_type"]: r for r in out}
    assert by_key["a"]["cnt"] == 2 and by_key["a"]["sum_value"] is None
    assert by_key["b"]["cnt"] == 2 and by_key["b"]["sum_value"] == 12


def test_tumbling_mixed_null_values_sum_skips_nulls(ray_session):
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime([10, 20, 30], unit="s"),
            "event_type": ["a", "a", "a"],
            "value": pd.array([None, 3, 4], dtype="Int64"),
        }
    )
    (row,) = tumbling_window_counts(ray.data.from_pandas(df), window_s=3600).take_all()
    assert row["cnt"] == 3 and row["sum_value"] == 7


def test_tumbling_pre_1970_floor_matches_sliding(ray_session):
    # -1s epoch must land in the window STARTING 1969-12-31 23:00 (floor),
    # not 1970-01-01 00:00 (truncation toward zero)
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime([-1_000_000, 1_000_000], unit="us"),
            "event_type": ["a", "a"],
            "value": [1, 2],
        }
    )
    ds = ray.data.from_pandas(df)
    tumb = {
        int(pd.Timestamp(r["window_start"]).value // 1000): r["cnt"]
        for r in tumbling_window_counts(ds, window_s=3600).take_all()
    }
    assert tumb == {-3600_000_000: 1, 0: 1}
    slid = sliding_window_counts(ds, window_s=3600, slide_s=3600).take_all()
    assert {
        int(pd.Timestamp(r["window_start"]).value // 1000): r["cnt"] for r in slid
    } == tumb


def test_tumbling_date32_key_column(ray_session):
    import datetime

    t = pa.table(
        {
            "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
            "day": pa.array(
                [datetime.date(2020, 1, 1), None], pa.date32()
            ),
        }
    )
    out = tumbling_window_counts(
        ray.data.from_arrow(t), window_s=3600, value_col=None, key_col="day"
    ).take_all()
    got = {r["day"]: r["cnt"] for r in out}
    assert got == {datetime.date(2020, 1, 1): 1, None: 1}


def test_broadcast_join_narrow_fact_key_with_nulls(ray_session):
    # int32 fact keys + an int64 dim key that overflows int32: the null
    # fill must come from the FACT key's type, not the dim's smallest key
    fact = pa.table(
        {"k": pa.array([7, None], pa.int32()), "x": pa.array([0, 1], pa.int64())}
    )
    dim = pa.table(
        {"k": pa.array([1 << 40, 7], pa.int64()), "name": pa.array(["big", "seven"])}
    )
    out = broadcast_join(ray.data.from_arrow(fact), dim, on="k", how="left")
    assert {r["x"]: r["name"] for r in out.take_all()} == {0: "seven", 1: None}


def test_vecs_null_embeddings_raise():
    flat = pa.array(np.arange(4, dtype=np.float64))
    a = pa.ListArray.from_arrays(
        pa.array([0, 2, 2, 4], pa.int32()), flat, mask=pa.array([False, True, False])
    )
    with pytest.raises(ValueError, match="nulls"):
        _vecs(a)


# ---------------------------------------------------------------------------
# review fixes (round-5 code review of the merge_join/facade/verify diff):
# suffix collision with an EXISTING left column must raise (it used to
# silently overwrite the left column's data), NaN float keys must match
# each other like the pandas/DuckDB oracles, and interleaved flagship runs
# must not wipe each other's pair memo
# ---------------------------------------------------------------------------


def test_join_suffix_collision_with_left_column_raises(ray_session):
    from liken_ray.extras.joins import merge_join

    # left already HAS v_r; right's v suffixes to v_r -> must be loud, not
    # a silent overwrite of the left v_r data
    left = ray.data.from_arrow(
        pa.table({"k": [1, 2, 3], "v": [1, 2, 3], "v_r": [111, 222, 333]})
    )
    right = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": [7, 8, 9]}))
    with pytest.raises(ValueError, match="collide"):
        merge_join(left, right, on="k", right_cols=["v"])
    with pytest.raises(ValueError, match="collide"):
        broadcast_join(
            left,
            pa.table({"k": [1, 2, 3], "v": [7, 8, 9]}),
            on="k",
            right_cols=["v"],
        )
    aleft = ray.data.from_arrow(
        pa.table(
            {"k": [1, 1], "t": [5, 9], "v": [0, 0], "v_r": [111, 222]}
        )
    )
    aright = ray.data.from_arrow(
        pa.table({"k": [1, 1], "t": [4, 8], "v": [10, 20]})
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(aleft, aright, on="t", by="k", right_cols=["v"])


@pytest.mark.parametrize("how", ["inner", "left"])
def test_merge_join_nan_float_keys_match(ray_session, how):
    from liken_ray.extras.joins import merge_join

    # arrow NaN (NOT null): pandas merge and DuckDB both treat NaN = NaN
    # as a match in equi-joins; dropping them silently diverged
    left = pa.table(
        {
            "k": pa.array([1.0, float("nan"), 2.0, float("nan"), 5.0]),
            "lv": [10, 20, 30, 40, 50],
        }
    )
    right = pa.table(
        {"k": pa.array([1.0, float("nan"), 3.0]), "rv": [100, 200, 300]}
    )
    got = (
        merge_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="k",
            how=how,
        )
        .to_pandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), on="k", how=how)
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    assert list(got["lv"]) == list(want["lv"])
    gm, wm = got["rv"].isna(), want["rv"].isna()
    assert list(gm) == list(wm)
    assert list(got["rv"][~gm]) == list(want["rv"][~wm])


def test_merge_join_nan_run_spans_blocks(ray_session):
    from liken_ray.extras.joins import merge_join

    n = 4000
    keys = [float("nan")] * n + [1.0, 2.0]
    left = pa.table({"k": pa.array(keys), "lv": list(range(n + 2))})
    right = pa.table({"k": pa.array([float("nan"), 1.0]), "rv": [7, 8]})
    got = merge_join(
        ray.data.from_arrow(left).repartition(16),
        ray.data.from_arrow(right),
        on="k",
        how="left",
    ).to_pandas()
    assert len(got) == n + 2
    by_lv = got.set_index("lv")["rv"].sort_index()
    assert (by_lv.loc[: n - 1] == 7).all()  # every NaN row matched
    assert by_lv.loc[n] == 8
    assert pd.isna(by_lv.loc[n + 1])


def test_merge_join_duplicate_nan_right_key_raises(ray_session):
    from liken_ray.extras.joins import merge_join

    left = pa.table({"k": pa.array([float("nan")]), "lv": [1]})
    right = pa.table(
        {"k": pa.array([float("nan"), float("nan")]), "rv": [1, 2]}
    )
    with pytest.raises(Exception, match="not unique"):
        merge_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right), on="k"
        ).materialize()


def test_merge_join_nan_distinct_from_null_and_zero(ray_session):
    from liken_ray.extras.joins import merge_join

    # NaN keys fill to the type's zero internally — a REAL 0.0 key and a
    # NULL key must stay distinct runs from the NaN run
    left = pa.table(
        {"k": pa.array([0.0, float("nan"), None]), "lv": [1, 2, 3]}
    )
    right = pa.table({"k": pa.array([0.0, float("nan")]), "rv": [10, 20]})
    got = (
        merge_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="k",
            how="left",
        )
        .to_pandas()
        .set_index("lv")["rv"]
    )
    assert got.loc[1] == 10
    assert got.loc[2] == 20
    assert pd.isna(got.loc[3])  # null never matches


def test_pair_memo_interleaved_runs_coexist():
    from liken_ray.pipelines import flagship

    flagship._PAIR_DECISIONS.clear()
    a = flagship._pair_memo("run-a")
    a[(1, 2)] = 1
    b = flagship._pair_memo("run-b")
    b[(3, 4)] = 2
    # interleaving run-a again must NOT have wiped its entries
    assert flagship._pair_memo("run-a") is a
    assert a[(1, 2)] == 1
    assert flagship._pair_memo("run-b")[(3, 4)] == 2
    # beyond the run cap the OLDEST run is evicted, bounding memory
    for tok in ("c", "d", "e", "f"):
        flagship._pair_memo(tok)
    assert len(flagship._PAIR_DECISIONS) <= flagship._PAIR_RUNS_MAX
    assert "run-a" not in flagship._PAIR_DECISIONS
    flagship._PAIR_DECISIONS.clear()
