"""Windowed aggregates over event streams (batch semantics: the window key
is computed per row, then one ``groupby`` shuffle aggregates — the standard
tumbling/sliding pattern for Dataset pipelines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_counts(
    ds,
    ts_col: str = "ts",
    window_s: int = 3600,
    value_col: str | None = "value",
    key_col: str | None = "event_type",
):
    """Tumbling windows: rows bucketed by ``floor(epoch/window)``.

    Returns (window_start [timestamp-us], key?, cnt, sum_value?).
    """
    from ray.data.aggregate import Count, Sum

    def keyize(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        epoch_us = ts.cast(pa.int64())
        win_us = window_s * 1_000_000
        start = pc.multiply(pc.floor(pc.divide(epoch_us, win_us)).cast(pa.int64()), win_us)
        out = {"window_start": start.cast(pa.timestamp("us"))}
        if key_col:
            out[key_col] = batch[key_col]
        if value_col:
            out[value_col] = batch[value_col]
        return pa.table(out)

    keys = ["window_start"] + ([key_col] if key_col else [])
    aggs = [Count(alias_name="cnt")]
    if value_col:
        aggs.append(Sum(value_col, alias_name="sum_value"))
    return ds.map_batches(keyize, batch_format="pyarrow").groupby(keys).aggregate(*aggs)


def sliding_window_counts(
    ds,
    ts_col: str = "ts",
    window_s: int = 3600,
    slide_s: int = 900,
    key_col: str | None = "event_type",
):
    """Sliding windows via row replication: each row lands in
    ``window_s/slide_s`` windows (flat-map explode then one groupby)."""
    from ray.data.aggregate import Count

    k = max(1, window_s // slide_s)

    def explode(batch: pa.Table) -> pa.Table:
        epoch_us = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        slide_us = slide_s * 1_000_000
        win_us = window_s * 1_000_000
        last_start = (epoch_us // slide_us) * slide_us
        n = len(epoch_us)
        starts = last_start[:, None] - np.arange(k)[None, :] * slide_us
        valid = starts + win_us > epoch_us[:, None]
        out = {"window_start": pa.array(starts[valid], pa.int64()).cast(pa.timestamp("us"))}
        if key_col:
            keys_rep = np.repeat(
                np.array(batch[key_col].to_pylist(), dtype=object), valid.sum(axis=1)
            )
            out[key_col] = pa.array(keys_rep, pa.string())
        return pa.table(out)

    keys = ["window_start"] + ([key_col] if key_col else [])
    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Count(alias_name="cnt"))
    )


def sessionize(
    ds,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_s: int = 1800,
):
    """Session windows per user: a new session starts after a gap > gap_s.
    Returns per-session rows (user_id, session_start, session_end,
    n_events).

    Fully vectorized: ONE global sort by (user, ts) (the only shuffle),
    then a segmented diff/cumsum scan per sorted block — no per-user or
    per-session Python. Sessions that may straddle block boundaries (the
    first/last session of each block — at most 2 per block, O(blocks)
    total) are stitched on the driver; every inner session is final where
    it was computed."""
    gap_us = gap_s * 1_000_000

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({user_col: batch[user_col], "_ts": batch[ts_col].cast(pa.int64())})

    sorted_ds = ds.map_batches(project, batch_format="pyarrow").sort([user_col, "_ts"])
    sch = ds.schema()
    user_type = getattr(sch, "base_schema", sch).field(user_col).type

    def block_sessions(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    user_col: pa.array([], user_type),
                    "_start": pa.array([], pa.int64()),
                    "_end": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "_edge": pa.array([], pa.bool_()),
                }
            )
        users = batch[user_col]
        if isinstance(users, pa.ChunkedArray):
            users = users.combine_chunks()
        u = users.to_numpy(zero_copy_only=False)
        ts = batch["_ts"].to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, n))
        nsess = len(starts)
        edge = np.zeros(nsess, dtype=bool)
        edge[0] = True
        edge[-1] = True
        return pa.table(
            {
                user_col: users.take(pa.array(starts, pa.int64())),
                "_start": ts[starts],
                "_end": ts[starts + lens - 1],
                "n_events": lens.astype(np.int64),
                "_edge": edge,
            }
        )

    blocks = sorted_ds.map_batches(
        block_sessions, batch_format="pyarrow", batch_size=None
    ).materialize()

    inner = blocks.map_batches(
        lambda t: t.filter(pc.invert(t["_edge"])).drop_columns(["_edge"]),
        batch_format="pyarrow",
    )

    edge_rows = (
        blocks.map_batches(lambda t: t.filter(t["_edge"]), batch_format="pyarrow")
        .take_all()
    )
    edge_rows.sort(key=lambda r: (r[user_col], r["_start"]))
    merged: list[dict] = []
    for r in edge_rows:
        if (
            merged
            and merged[-1][user_col] == r[user_col]
            and r["_start"] - merged[-1]["_end"] <= gap_us
        ):
            merged[-1]["_end"] = max(merged[-1]["_end"], r["_end"])
            merged[-1]["n_events"] += r["n_events"]
        else:
            merged.append(dict(r))
    stitched = pa.table(
        {
            user_col: pa.array([m[user_col] for m in merged], user_type),
            "_start": pa.array([m["_start"] for m in merged], pa.int64()),
            "_end": pa.array([m["_end"] for m in merged], pa.int64()),
            "n_events": pa.array([m["n_events"] for m in merged], pa.int64()),
        }
    )

    import ray.data

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch[user_col],
                "session_start": batch["_start"].cast(pa.timestamp("us")),
                "session_end": batch["_end"].cast(pa.timestamp("us")),
                "n_events": batch["n_events"],
            }
        )

    return inner.union(ray.data.from_arrow(stitched)).map_batches(
        finalize, batch_format="pyarrow"
    )
