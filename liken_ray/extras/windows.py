"""Windowed aggregates over event streams.

Tumbling/sliding avoid Ray's ``groupby().aggregate()`` (measured at ~2x a
sort at high key cardinality — CLAUDE.md): each batch PARTIAL-COMBINES
locally (one vectorized ``pyarrow.Table.group_by``), so only (windows x
keys)-sized partials enter the single range sort, then a per-block
segmented sum with an O(blocks) edge stitch finalizes — the same
sort+``reduceat``+stitch idiom as ``extras/sketches._sorted_seg_reduce``,
generalized to composite keys. At a 100-TB event span the sort input is
the partial count (bounded by batches x windows-per-batch x keys), never
the event count. Null window/key values are sentinel-encoded as
(is_null, filled) pairs before the sort — Ray's range sort crashes on
null key boundaries (CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _fill_zero(arr: pa.Array) -> pa.Array:
    from liken_ray.extras.relational import _zero_scalar

    return pc.fill_null(arr, _zero_scalar(arr.type))


def _sentinel_pair(arr, prefix: str) -> dict[str, pa.Array]:
    """(is_null uint8, filled) sort-safe encoding of a possibly-null
    column (uint8 flag — the repo's range-sort-safe sentinel shape)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return {
        prefix + "n": pc.cast(pc.is_null(arr), pa.uint8()),
        prefix + "f": _fill_zero(arr),
    }


def _sorted_multi_sum(parts, key_cols: list[str], val_cols: list[str], psch: pa.Schema):
    """Sort ``parts`` by ``key_cols`` (all non-null — sentinel pairs), then
    finalize per-key SUMs of ``val_cols`` — the all-sum case of the shared
    ``relational._sorted_multi_reduce`` (one remote ``num_returns=2`` task
    per sorted block; interior runs stay in the object store, ≤2 edge rows
    per block stitch on the driver)."""
    from liken_ray.extras.relational import _sorted_multi_reduce

    return _sorted_multi_reduce(
        parts, key_cols, [(c, "sum") for c in val_cols], psch
    )


def _chunkless(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _epoch_us(ts) -> pa.Array:
    """Timestamp (any unit — from_pandas yields ns, parquet us) or integer
    epoch column -> epoch MICROSECONDS int64."""
    if pa.types.is_temporal(ts.type):
        ts = ts.cast(pa.timestamp("us"))
    return _chunkless(ts.cast(pa.int64()))


def _window_pipeline(
    ds, build_partials, key_col, key_type, out_extra: list[str], extra_types=()
):
    """Shared tumbling/sliding tail: partial-combine per batch, one sort,
    segmented sum, sentinel decode."""
    key_cols = ["_wsn", "_wsf"] + (["_kn", "_kf"] if key_col else [])
    fields = [pa.field("_wsn", pa.uint8()), pa.field("_wsf", pa.int64())]
    if key_col:
        fields += [pa.field("_kn", pa.uint8()), pa.field("_kf", key_type)]
    fields.append(pa.field("cnt", pa.int64()))
    fields += [pa.field(c, t) for c, t in zip(out_extra, extra_types)]
    parts = ds.map_batches(build_partials, batch_format="pyarrow")
    out = _sorted_multi_sum(parts, key_cols, ["cnt"] + out_extra, pa.schema(fields))

    def finalize(t: pa.Table) -> pa.Table:
        wsn = pc.cast(t["_wsn"], pa.bool_())
        ws = pc.if_else(wsn, pa.scalar(None, pa.int64()), t["_wsf"])
        cols = {"window_start": ws.cast(pa.timestamp("us"))}
        if key_col:
            cols[key_col] = pc.if_else(
                pc.cast(t["_kn"], pa.bool_()),
                pa.scalar(None, type=key_type),
                t["_kf"],
            )
        cols["cnt"] = t["cnt"]
        for c in out_extra:
            if c == "_nn":
                continue
            arr = t[c]
            if "_nn" in out_extra:
                arr = pc.if_else(
                    pc.greater(t["_nn"], 0),
                    arr,
                    pa.scalar(None, type=arr.type),
                )
            cols[c] = arr
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")


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
    from liken_ray.extras.joins import _to_arrow_blocks

    ds = _to_arrow_blocks(ds)
    win_us = window_s * 1_000_000
    sch = getattr(ds.schema(), "base_schema", ds.schema())
    key_type = sch.field(key_col).type if key_col else None
    sum_type = None
    if value_col:
        vt = sch.field(value_col).type
        sum_type = pa.float64() if pa.types.is_floating(vt) else pa.int64()

    def build(batch: pa.Table) -> pa.Table:
        epoch_us = _epoch_us(batch[ts_col])
        # FLOOR window start: pc.divide truncates toward zero, which would
        # bin a pre-1970 event into a window STARTING AFTER it (and
        # disagree with the sliding path's numpy floor division)
        prod = pc.multiply(pc.divide(epoch_us, win_us), win_us)
        rem = pc.subtract(epoch_us, prod)
        start = pc.if_else(pc.less(rem, 0), pc.subtract(prod, win_us), prod)
        cols = _sentinel_pair(start, "_ws")
        if key_col:
            cols.update(_sentinel_pair(batch[key_col], "_k"))
        cols["cnt"] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        aggs = [("cnt", "sum")]
        if value_col:
            vcol = _chunkless(batch[value_col])
            # zero-fill nulls and carry a non-null count so the segmented
            # reduce never sees a null partial (pyarrow group_by "sum"
            # emits null for an all-null group, which would poison the
            # numpy reduce via the null->float64 trap); finalize restores
            # SQL semantics (sum over all-null group = NULL)
            cols["sum_value"] = pc.fill_null(vcol, pa.scalar(0, sum_type)).cast(
                sum_type
            )
            cols["_nn"] = pc.cast(pc.is_valid(vcol), pa.int64())
            aggs.append(("sum_value", "sum"))
            aggs.append(("_nn", "sum"))
        t = pa.table(cols)
        g = t.group_by(list(cols)[: len(cols) - len(aggs)]).aggregate(aggs)
        ren = {f"{c}_sum": c for c, _ in aggs}
        return g.rename_columns([ren.get(c, c) for c in g.schema.names])

    return _window_pipeline(
        ds,
        build,
        key_col,
        key_type,
        ["sum_value", "_nn"] if value_col else [],
        (sum_type, pa.int64()) if value_col else (),
    )


def sliding_window_counts(
    ds,
    ts_col: str = "ts",
    window_s: int = 3600,
    slide_s: int = 900,
    key_col: str | None = "event_type",
):
    """Sliding windows via row replication: each row lands in
    ``window_s/slide_s`` windows (vectorized explode — arrow ``take`` for
    the key, never ``to_pylist`` — then partial-combine + one sort)."""
    from liken_ray.extras.joins import _to_arrow_blocks

    ds = _to_arrow_blocks(ds)
    k = max(1, window_s // slide_s)
    slide_us = slide_s * 1_000_000
    win_us = window_s * 1_000_000
    sch = getattr(ds.schema(), "base_schema", ds.schema())
    key_type = sch.field(key_col).type if key_col else None

    def build(batch: pa.Table) -> pa.Table:
        ts = _chunkless(_epoch_us(batch[ts_col]))
        # null ts: explode from a zero epoch, then restore nullness on the
        # replicated window starts (sentinel decode keeps them grouped)
        ts_null = pc.is_null(ts).to_numpy(zero_copy_only=False)
        epoch_us = _fill_zero(ts).to_numpy(zero_copy_only=False)
        last_start = (epoch_us // slide_us) * slide_us
        n = len(epoch_us)
        starts = last_start[:, None] - np.arange(k)[None, :] * slide_us
        valid = starts + win_us > epoch_us[:, None]
        valid[ts_null] = False
        valid[ts_null, 0] = True  # one carrier row per null ts
        reps = valid.sum(axis=1)
        src = np.repeat(np.arange(n, dtype=np.int64), reps)
        rep_null = np.repeat(ts_null, reps)
        cols = {
            "_wsn": pa.array(rep_null.astype(np.uint8), pa.uint8()),
            "_wsf": pa.array(np.where(rep_null, 0, starts[valid]), pa.int64()),
        }
        if key_col:
            key = _chunkless(batch[key_col]).take(pa.array(src, pa.int64()))
            cols.update(_sentinel_pair(key, "_k"))
        cols["cnt"] = pa.array(np.ones(len(src), dtype=np.int64))
        t = pa.table(cols)
        g = t.group_by(list(cols)[:-1]).aggregate([("cnt", "sum")])
        return g.rename_columns(
            [("cnt" if c == "cnt_sum" else c) for c in g.schema.names]
        )

    return _window_pipeline(ds, build, key_col, key_type, [])


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
