"""Round-5 additions: group_shift (LAG/LEAD), range_join, line_dedup.

Each operator is pinned against an independent pandas/python reference on
inputs shaped to hit its distributed failure modes: key runs straddling
many blocks, carry buffers longer than a block, gapped intervals, null
keys/texts, and min_len exemptions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from liken_ray.extras.curation import line_dedup
from liken_ray.extras.joins import range_join
from liken_ray.extras.relational import group_shift


# ---------------------------------------------------------------------------
# group_shift
# ---------------------------------------------------------------------------


def _shift_reference(df: pd.DataFrame, key, order, vals, periods):
    out = df.copy()
    g = df.sort_values(order).groupby(key, dropna=False)
    for v in vals:
        out[f"{v}_s"] = g[v].shift(periods)
    return out


def _sortkey(row):
    return tuple((v is None, "" if v is None else str(v)) for v in row)


def _rows(ds, cols):
    return sorted(
        (tuple(None if pd.isna(r[c]) else r[c] for c in cols) for r in ds.take_all()),
        key=_sortkey,
    )


def _pd_rows(df, cols):
    return sorted(
        (
            tuple(None if pd.isna(v) else v for v in row)
            for row in df[cols].itertuples(index=False, name=None)
        ),
        key=_sortkey,
    )


def test_group_shift_matches_pandas_lag_and_lead(ray_session):
    rng = np.random.default_rng(51)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, size=n),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 100, size=n),
            "w": rng.standard_normal(n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(11)
    for periods in (1, -1, 3):
        got = group_shift(
            ds, "k", ["o"], ["v", "w"], periods=periods, out_names=["v_s", "w_s"]
        )
        want = _shift_reference(df, "k", ["o"], ["v", "w"], periods)
        cols = ["k", "o", "v", "w", "v_s", "w_s"]
        assert _rows(got, cols) == _pd_rows(want, cols), periods


def test_group_shift_run_straddles_blocks_and_carry_longer_than_block(ray_session):
    # ONE key across many tiny blocks with periods > block size: the carry
    # buffer must chain values across 3+ blocks.
    n = 40
    df = pd.DataFrame(
        {"k": np.zeros(n, dtype=np.int64), "o": np.arange(n), "v": np.arange(n) * 10}
    )
    ds = ray.data.from_pandas(df).repartition(13)
    got = group_shift(ds, "k", ["o"], ["v"], periods=7, out_names=["v_s"])
    want = _shift_reference(df, "k", ["o"], ["v"], 7)
    assert _rows(got, ["o", "v", "v_s"]) == _pd_rows(want, ["o", "v", "v_s"])


def test_group_shift_null_keys_one_partition_and_string_key(ray_session):
    df = pd.DataFrame(
        {
            "k": pd.array(["a", None, "a", None, "b", None], dtype="object"),
            "o": np.arange(6, dtype=np.int64),
            "v": np.arange(6, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    got = group_shift(ds, "k", ["o"], ["v"], periods=1, out_names=["v_s"])
    want = _shift_reference(df, "k", ["o"], ["v"], 1)
    assert _rows(got, ["k", "o", "v", "v_s"]) == _pd_rows(want, ["k", "o", "v", "v_s"])


def test_group_shift_validates(ray_session):
    df = pd.DataFrame({"k": [1], "o": [1], "v": [1]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="nonzero"):
        group_shift(ds, "k", ["o"], ["v"], periods=0)
    with pytest.raises(KeyError):
        group_shift(ds, "k", ["missing"], ["v"])
    with pytest.raises(ValueError, match="collide"):
        group_shift(ds, "k", ["o"], ["v"], out_names=["o"])
    null_o = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 1], "o": pd.array([1, None], dtype="Int64"), "v": [1, 2]})
    )
    with pytest.raises(Exception, match="nulls"):
        group_shift(null_o, "k", ["o"], ["v"]).materialize()


def test_group_shift_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "o": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    )
    out = group_shift(ds, "k", ["o"], ["v"], out_names=["v_s"])
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "o", "v", "v_s"}


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------


def _range_join_reference(pts, ivs, closed, how):
    out = []
    for _, p in pts.iterrows():
        hit = None
        for _, iv in ivs.iterrows():
            if iv["k"] != p["k"] or p["t"] < iv["s"]:
                continue
            if pd.isna(iv["e"]) or (
                p["t"] < iv["e"] if closed == "left" else p["t"] <= iv["e"]
            ):
                if hit is None or iv["s"] > hit["s"]:
                    hit = iv
        if hit is not None:
            out.append((p["k"], p["t"], p["pid"], hit["tag"]))
        elif how == "left":
            out.append((p["k"], p["t"], p["pid"], None))
    return sorted(out, key=lambda r: (r[0], r[1], r[2]))


@pytest.mark.parametrize("closed", ["left", "both"])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_range_join_gapped_intervals(ray_session, closed, how):
    rng = np.random.default_rng(52)
    n = 1500
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 5, size=n),
            "t": rng.integers(0, 1000, size=n),
            "pid": np.arange(n, dtype=np.int64),
        }
    )
    # gapped, non-overlapping intervals per key: [s, s+width)
    ivs = []
    for k in range(5):
        s = 0
        tag = 0
        while s < 1000:
            width = int(rng.integers(20, 60))
            ivs.append({"k": k, "s": s, "e": s + width, "tag": k * 1000 + tag})
            s += width + int(rng.integers(10, 50))  # gap => real misses
            tag += 1
    ivs = pd.DataFrame(ivs)
    # one open-ended interval per key at the top
    open_end = pd.DataFrame(
        {"k": np.arange(5), "s": 2000, "e": [pd.NA] * 5, "tag": 9999}
    )
    ivs = pd.concat([ivs, open_end], ignore_index=True)
    ivs["e"] = ivs["e"].astype("Int64")
    extra = pd.DataFrame({"k": [3], "t": [2500], "pid": [n]})  # hits open-ended
    pts = pd.concat([pts, extra], ignore_index=True)

    got = range_join(
        ray.data.from_pandas(pts).repartition(9),
        ray.data.from_pandas(ivs).repartition(4),
        on="t", by="k", start_col="s", end_col="e",
        right_cols=["tag"], how=how, closed=closed,
    )
    rows = sorted(
        (
            (r["k"], r["t"], r["pid"], None if pd.isna(r["tag"]) else r["tag"])
            for r in got.take_all()
        ),
        key=lambda r: (r[0], r[1], r[2]),
    )
    assert rows == _range_join_reference(pts, ivs, closed, how)


def test_range_join_boundary_semantics(ray_session):
    pts = pd.DataFrame({"k": [0, 0, 0], "t": [10, 20, 15], "pid": [0, 1, 2]})
    ivs = pd.DataFrame({"k": [0], "s": [10], "e": [20], "tag": [7]})
    left = ray.data.from_pandas(pts)
    right = ray.data.from_pandas(ivs)
    got_l = {
        r["pid"]: (None if pd.isna(r["tag"]) else r["tag"])
        for r in range_join(
            left, right, on="t", by="k", start_col="s", end_col="e",
            right_cols=["tag"], closed="left",
        ).take_all()
    }
    assert got_l == {0: 7, 1: None, 2: 7}
    got_b = {
        r["pid"]: (None if pd.isna(r["tag"]) else r["tag"])
        for r in range_join(
            left, right, on="t", by="k", start_col="s", end_col="e",
            right_cols=["tag"], closed="both",
        ).take_all()
    }
    assert got_b == {0: 7, 1: 7, 2: 7}


def test_range_join_validates(ray_session):
    pts = ray.data.from_pandas(pd.DataFrame({"k": [0], "t": [1]}))
    ivs = ray.data.from_pandas(pd.DataFrame({"k": [0], "s": [0], "e": [2], "tag": [1]}))
    with pytest.raises(ValueError, match="how"):
        range_join(pts, ivs, on="t", by="k", start_col="s", end_col="e", how="outer")
    with pytest.raises(ValueError, match="closed"):
        range_join(pts, ivs, on="t", by="k", start_col="s", end_col="e", closed="right")
    with pytest.raises(ValueError, match="lacks"):
        range_join(pts, ivs, on="missing", by="k", start_col="s", end_col="e")


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------


def _line_dedup_reference(df, delim, min_len):
    seen = set()
    out = {}
    for _, row in df.sort_values("doc_id").iterrows():
        if row["text"] is None or (isinstance(row["text"], float) and pd.isna(row["text"])):
            out[row["doc_id"]] = None
            continue
        kept = []
        for seg in row["text"].split(delim):
            if len(seg) < min_len:
                kept.append(seg)
            elif seg not in seen:
                seen.add(seg)
                kept.append(seg)
        out[row["doc_id"]] = delim.join(kept)
    return out


def test_line_dedup_matches_reference_multiblock(ray_session):
    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(300):
        segs = rng.choice(vocab, size=rng.integers(1, 12))
        docs.append({"doc_id": i, "text": " ".join(segs)})
    docs[17]["text"] = None
    docs[23]["text"] = ""  # one empty segment
    df = pd.DataFrame(docs)
    ds = ray.data.from_pandas(df).repartition(8)
    got = {r["doc_id"]: r["text"] for r in line_dedup(ds, delim=" ").take_all()}
    assert got == _line_dedup_reference(df, " ", 0)


def test_line_dedup_min_len_exempts_short_segments(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["aa b longline", "aa b longline", "b aa"],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    got = {
        r["doc_id"]: r["text"]
        for r in line_dedup(ds, delim=" ", min_len=3).take_all()
    }
    # segments shorter than 3 codepoints are always kept; 'longline' dedupes
    assert got == {0: "aa b longline", 1: "aa b", 2: "b aa"}


def test_line_dedup_doc_spans_blocks(ray_session):
    # one giant doc whose segments straddle multiple sorted blocks in the
    # reassembly sort — the driver boundary stitch must rebuild it intact
    big = " ".join(f"u{i}" for i in range(500))
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [big, big, "u0 u1 fresh"]}
    )
    ds = ray.data.from_pandas(df).repartition(3)
    got = {r["doc_id"]: r["text"] for r in line_dedup(ds, delim=" ").take_all()}
    assert got == {0: big, 1: "", 2: "fresh"}


def test_line_dedup_validates_and_empty(ray_session):
    df = pd.DataFrame({"doc_id": [0], "text": ["x"]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="delim"):
        line_dedup(ds, delim="")
    with pytest.raises(ValueError, match="min_len"):
        line_dedup(ds, min_len=-1)
    with pytest.raises(KeyError):
        line_dedup(ds, text_col="missing")
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = line_dedup(empty, delim=" ")
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "text"}


# ---------------------------------------------------------------------------
# group_agg
# ---------------------------------------------------------------------------


def test_group_agg_matches_pandas_all_ops(ray_session):
    from liken_ray.extras.relational import group_agg

    rng = np.random.default_rng(54)
    n = 6000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 400, n),
            "k2": rng.choice(["a", "b", None], n),
            "v": rng.integers(0, 100, n).astype(float),
        }
    )
    df.loc[rng.choice(n, 300, replace=False), "v"] = np.nan
    ds = ray.data.from_pandas(df).repartition(11)
    got = group_agg(
        ds,
        ["k", "k2"],
        {
            "cnt": ("count_rows", None),
            "nv": ("count", "v"),
            "sv": ("sum", "v"),
            "mn": ("min", "v"),
            "mx": ("max", "v"),
            "avg": ("mean", "v"),
        },
    ).to_pandas()
    want = (
        df.groupby(["k", "k2"], dropna=False)
        .agg(
            cnt=("v", "size"), nv=("v", "count"), sv=("v", "sum"),
            mn=("v", "min"), mx=("v", "max"), avg=("v", "mean"),
        )
        .reset_index()
    )
    want.loc[want["nv"] == 0, "sv"] = np.nan  # SQL: SUM of all-null = NULL
    cols = ["k", "k2", "cnt", "nv", "sv", "mn", "mx", "avg"]
    g = got[cols].sort_values(["k", "k2"]).reset_index(drop=True)
    w = want[cols].sort_values(["k", "k2"]).reset_index(drop=True)
    assert len(g) == len(w)
    for c in cols:
        a, b = g[c].values, w[c].values
        both_na = pd.isna(a) & pd.isna(b)
        close = np.isclose(
            pd.to_numeric(g[c], errors="coerce").values,
            pd.to_numeric(w[c], errors="coerce").values,
            equal_nan=False,
        )
        assert (both_na | close | (a == b)).all(), c


def test_group_agg_hot_key_spans_blocks_and_big_ints(ray_session):
    from liken_ray.extras.relational import group_agg

    # one dominant key across 16 tiny blocks; int values above 2^53 to
    # catch any float64 round-trip in the partial/stitch path
    base = np.int64(2**61)
    n = 4000
    k = np.zeros(n, dtype=np.int64)
    k[::97] = 1
    v = base + np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(k), "v": pa.array(v)})
    ).repartition(16)
    got = {
        r["k"]: (r["mn"], r["mx"], r["cnt"])
        for r in group_agg(
            ds, ["k"], {"mn": ("min", "v"), "mx": ("max", "v"), "cnt": ("count_rows", None)}
        ).take_all()
    }
    for key in (0, 1):
        sel = v[k == key]
        assert got[key] == (int(sel.min()), int(sel.max()), len(sel)), key


def test_group_agg_temporal_min_max_and_string_key(ray_session):
    from liken_ray.extras.relational import group_agg

    ts = pd.to_datetime(
        ["2020-01-01", "2021-06-01", "1960-03-01", "2020-05-05", None]
    )
    df = pd.DataFrame({"k": ["x", "x", "y", "y", "y"], "t": ts})
    ds = ray.data.from_pandas(df).repartition(3)
    got = {
        r["k"]: (r["first_t"], r["last_t"], r["nt"])
        for r in group_agg(
            ds, ["k"], {"first_t": ("min", "t"), "last_t": ("max", "t"), "nt": ("count", "t")}
        ).take_all()
    }
    assert got["x"] == (pd.Timestamp("2020-01-01"), pd.Timestamp("2021-06-01"), 2)
    assert got["y"] == (pd.Timestamp("1960-03-01"), pd.Timestamp("2020-05-05"), 2)


def test_group_agg_validates_and_empty(ray_session):
    from liken_ray.extras.relational import group_agg

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1.0], "s": ["x"]}))
    with pytest.raises(ValueError, match="key_cols"):
        group_agg(ds, [], {"c": ("count_rows", None)})
    with pytest.raises(ValueError, match="aggs"):
        group_agg(ds, ["k"], {})
    with pytest.raises(ValueError, match="unknown op"):
        group_agg(ds, ["k"], {"c": ("median", "v")})
    with pytest.raises(KeyError):
        group_agg(ds, ["k"], {"c": ("sum", "missing")})
    with pytest.raises(TypeError, match="numeric"):
        group_agg(ds, ["k"], {"c": ("sum", "s")})
    with pytest.raises(ValueError, match="collide"):
        group_agg(ds, ["k"], {"k": ("count_rows", None)})
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.float64())})
    )
    out = group_agg(empty, ["k"], {"s": ("sum", "v"), "c": ("count_rows", None)})
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "s", "c"}
