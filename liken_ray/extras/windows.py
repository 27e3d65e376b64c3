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
    """Session windows per user: events sorted within user groups, a new
    session starts after a gap > gap_s. Returns per-session rows
    (user_id, session_start, session_end, n_events)."""

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False))
        gaps = np.diff(ts) > gap_s * 1_000_000
        session_id = np.concatenate([[0], np.cumsum(gaps)])
        starts, ends, counts = [], [], []
        for sid in range(session_id.max() + 1):
            members = ts[session_id == sid]
            starts.append(int(members.min()))
            ends.append(int(members.max()))
            counts.append(len(members))
        uid = group[user_col][0].as_py()
        n = len(starts)
        return pa.table(
            {
                user_col: pa.array([uid] * n, group.schema.field(user_col).type),
                "session_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
                "session_end": pa.array(ends, pa.int64()).cast(pa.timestamp("us")),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")
