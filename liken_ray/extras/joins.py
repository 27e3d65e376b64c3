"""Distributed as-of join (nearest-earlier-event join) for Ray Datasets.

Ray Data has no as-of/range join; a generic ``Dataset.join`` can't express
"latest right row with ts <= left.ts per key" without an explosion. This
module implements it with the repo's established sort-scan shape (see
``engine/executor.synthesize_ray`` / ``extras/curation.pack_offsets``):

  1. ONE union + sort by ``(by, on, side)`` — the only shuffle. Left rows
     carry their payload through the sort (the standard sort-merge-join
     cost); right rows carry only the joined columns.
  2. A per-block summary pass: O(blocks) scalars to the driver — each
     block reports its first/last key and the last-seen right payload of
     its final key run.
  3. The driver chains carries across blocks in sorted order (O(blocks)),
     then one independent Ray task per block finalizes every left row via
     a vectorized segmented last-observation-carried-forward scan.

Nothing but O(blocks) summaries ever reaches the driver, and the carried
payload per block boundary is ONE row — the idiom scales to any number of
rows per key.

Semantics notes:
- ``strict=True`` joins each left row to the latest right row with
  ``right.on <  left.on`` (the "previous event" form);
  ``strict=False`` uses ``<=`` (DuckDB's default ASOF inequality).
- Right rows must be unique per ``(by, on)``: the distributed sort has no
  defined order for ties, so duplicate right timestamps would make the
  match partition-dependent (same uniqueness contract as
  ``pack_offsets``). Pre-aggregate the right side if needed.
- Left rows with no earlier right row get nulls in the joined columns
  (LEFT-join semantics).

No analogue in the reference repo (/root/reference) — this is part of the
BASELINE gap list (SURVEY.md §2.7 "custom operators Ray Data lacks").
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.block import BlockAccessor

__all__ = ["asof_join", "broadcast_join", "merge_join", "range_join"]


def _key_change(vals: np.ndarray, nullm: np.ndarray) -> np.ndarray:
    """Boolean run-starts mask for a sorted key column (nulls contiguous)."""
    n = len(vals)
    change = np.ones(n, dtype=bool)
    if n > 1:
        with np.errstate(invalid="ignore"):
            change[1:] = (vals[1:] != vals[:-1]) & ~(nullm[1:] & nullm[:-1])
    return change


def _right_out_map(
    left_names: list[str], right_cols: list[str], suffix: str
) -> dict[str, str]:
    """Output name for each carried right column: ``name+suffix`` iff it
    collides with a left column. Raises if any FINAL name still collides —
    with another carried column OR with a left column (a suffixed name
    landing on an existing left column would silently overwrite that left
    column's data in the tag/finalize stages, so it must be loud here)."""
    out_map = {c: (c + suffix if c in left_names else c) for c in right_cols}
    final = list(out_map.values())
    clash = sorted(
        (set(final) & set(left_names))
        | {n for n in final if final.count(n) > 1}
    )
    if clash:
        raise ValueError(
            f"carried column names collide after suffixing: {clash!r} "
            f"(map {out_map!r} vs left columns; rename or change suffix)"
        )
    return out_map


def asof_join(
    left,
    right,
    on: str,
    by: str,
    right_cols: list[str],
    strict: bool = False,
    suffix: str = "_r",
):
    """As-of join ``left`` against ``right`` on time column ``on`` within
    key column ``by``; carries ``right_cols`` from the matched right row.

    Returns a Dataset with every left row plus the ``right_cols`` of the
    latest right row satisfying ``right.on < left.on`` (``strict``) or
    ``<= left.on``; null where no right row qualifies. A carried column
    whose name collides with a left column is emitted as ``name+suffix``.

    ``by`` and ``on`` must be non-null on BOTH sides (checked per batch,
    loud ValueError): they are the distributed sort keys — Ray's range
    sort crashes on null key boundaries (CLAUDE.md) — and DuckDB's ASOF
    equality never matches NULL anyway, so a null key has no defined
    match. Carried payload columns may of course be null.
    """
    left = _to_arrow_blocks(left)
    right = _to_arrow_blocks(right)
    left_names = list(left.schema().names)
    for c in (on, by):
        if c not in left_names:
            raise ValueError(f"left side lacks column {c!r}")
    right_schema = _schema(right)
    for c in [on, by, *right_cols]:
        if c not in right_schema.names:
            raise ValueError(f"right side lacks column {c!r}")
    out_map = _right_out_map(left_names, right_cols, suffix)

    left_schema = _schema(left)
    carry_types = {out_map[c]: right_schema.field(c).type for c in right_cols}
    left_only = [c for c in left_names if c not in (by, on)]
    # left rows sort BEFORE right rows at equal `on` for strict (the right
    # row at the same instant must stay invisible), AFTER for inclusive
    l_tag, r_tag = (0, 1) if strict else (1, 0)

    def _require_nonnull(batch: pa.Table, side: str) -> None:
        for c in (by, on):
            if batch[c].null_count:
                raise ValueError(
                    f"asof_join: {side} column {c!r} contains nulls; sort "
                    "keys must be non-null (null keys have no defined as-of "
                    "match; drop or fill them first)"
                )

    def tag_left(batch: pa.Table) -> pa.Table:
        _require_nonnull(batch, "left")
        n = batch.num_rows
        cols: dict[str, Any] = {
            by: batch[by],
            on: batch[on],
            "_aj_tag": pa.array(np.full(n, l_tag, dtype=np.int8)),
            "_aj_left": pa.array(np.ones(n, dtype=bool)),
        }
        for c in left_only:
            cols[c] = batch[c]
        for oc, typ in carry_types.items():
            cols[oc] = pa.nulls(n, typ)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        _require_nonnull(batch, "right")
        n = batch.num_rows
        cols = {
            by: batch[by].cast(left_schema.field(by).type),
            on: batch[on].cast(left_schema.field(on).type),
            "_aj_tag": pa.array(np.full(n, r_tag, dtype=np.int8)),
            "_aj_left": pa.array(np.zeros(n, dtype=bool)),
        }
        for c in left_only:
            cols[c] = pa.nulls(n, left_schema.field(c).type)
        for c in right_cols:
            cols[out_map[c]] = batch[c]
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    srt = unioned.sort([by, on, "_aj_tag"]).materialize()

    # Ray's sort emits one EMPTY-schema block for empty input — skip
    # zero-row blocks before the per-block kernels (CLAUDE.md)
    refs = [
        ref
        for bundle in srt.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    out_names = left_names + list(out_map.values())
    if not refs:
        empty = pa.schema(
            [left_schema.field(c) for c in left_names]
            + [pa.field(oc, t) for oc, t in carry_types.items()]
        )
        return ray.data.from_arrow(empty.empty_table())

    carry_cols = list(out_map.values())

    @ray.remote
    def summarize(block) -> dict:
        t = BlockAccessor.for_block(block).to_arrow()
        key = t[by].combine_chunks() if isinstance(t[by], pa.ChunkedArray) else t[by]
        vals = key.to_numpy(zero_copy_only=False)
        nullm = pc.is_null(key).to_numpy(zero_copy_only=False)
        change = _key_change(vals, nullm)
        starts = np.flatnonzero(change)
        last_start = int(starts[-1])
        is_right = np.flatnonzero(
            ~t["_aj_left"].to_numpy(zero_copy_only=False)[last_start:]
        )
        tail = None
        if len(is_right):
            pos = last_start + int(is_right[-1])
            tail = {c: t[c][pos].as_py() for c in carry_cols}
        return {
            "first_key": key[0].as_py(),
            "last_key": key[-1].as_py(),
            "tail": tail,
        }

    summaries = ray.get([summarize.remote(r) for r in refs])
    # chain carries in sorted block order: carry_in[i] = the last right
    # payload seen for the key block i STARTS with, from earlier blocks
    carry_in: list[dict | None] = []
    cur_key: Any = object()  # sentinel unequal to every real key
    cur_payload: dict | None = None
    for s in summaries:
        same_start = s["first_key"] == cur_key or (
            s["first_key"] is None and cur_key is None
        )
        carry_in.append(cur_payload if same_start else None)
        same_end = same_start and s["first_key"] == s["last_key"] or (
            same_start and s["first_key"] is None and s["last_key"] is None
        )
        if same_end:
            if s["tail"] is not None:
                cur_payload = s["tail"]
        else:
            cur_key = s["last_key"]
            cur_payload = s["tail"]

    @ray.remote
    def finalize(block, carry: dict | None):
        t = BlockAccessor.for_block(block).to_arrow()
        n = t.num_rows
        key = t[by].combine_chunks() if isinstance(t[by], pa.ChunkedArray) else t[by]
        vals = key.to_numpy(zero_copy_only=False)
        nullm = pc.is_null(key).to_numpy(zero_copy_only=False)
        change = _key_change(vals, nullm)
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        run_start = starts[seg]
        is_left = t["_aj_left"].to_numpy(zero_copy_only=False)
        pos = np.arange(n, dtype=np.int64)
        lastr = np.maximum.accumulate(np.where(~is_left, pos, -1))
        match = np.where(lastr >= run_start, lastr, -1)
        sel = np.flatnonzero(is_left)
        m = match[sel]
        has = m >= 0
        from_carry = ~has & (seg[sel] == 0) if carry is not None else np.zeros(
            len(sel), dtype=bool
        )
        cols: dict[str, Any] = {}
        for c in left_names:
            col = t[c]
            cols[c] = col.take(pa.array(sel, pa.int64()))
        take_idx = pa.array(np.where(has, m, 0), pa.int64())
        for oc in carry_cols:
            col = t[oc]
            arr = col.take(take_idx)
            if not has.all():
                arr = pc.if_else(
                    pa.array(has), arr, pa.scalar(None, type=carry_types[oc])
                )
            if from_carry.any():
                arr = pc.if_else(
                    pa.array(from_carry),
                    pa.scalar(carry[oc], type=carry_types[oc]),
                    arr,
                )
            cols[oc] = arr
        return pa.table({c: cols[c] for c in out_names})

    return ray.data.from_arrow_refs(
        [finalize.remote(r, ci) for r, ci in zip(refs, carry_in)]
    )


def _schema(ds) -> pa.Schema:
    sch = ds.schema()
    return getattr(sch, "base_schema", sch)


def _to_arrow_blocks(ds):
    """Coerce a pandas-block Dataset (e.g. ``from_pandas``) to arrow blocks
    so schema introspection yields a ``pyarrow.Schema``."""
    if isinstance(_schema(ds), pa.Schema):
        return ds
    mapped = ds.map_batches(lambda t: t, batch_format="pyarrow")
    if _schema(mapped) is None:
        # an EMPTY pandas-block dataset: mapping can't infer a schema (no
        # batches ever reach the fn) and Dataset.to_pandas drops the
        # columns on the empty round-trip — pull the underlying pandas
        # blocks (dtypes intact) and convert directly; free by construction
        import pandas as pd

        dfs = ray.get(ds.to_pandas_refs())
        df = pd.concat(dfs) if dfs else pd.DataFrame()
        return ray.data.from_arrow(pa.Table.from_pandas(df))
    return mapped


def broadcast_join(
    ds,
    dim,
    on: str,
    right_on: str | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
):
    """Hash join against a SMALL dimension table, broadcast once.

    The 100-TB shape for star-schema joins: the dimension (``dim`` — a
    small Dataset or pyarrow Table, e.g. TPC-H ``nation``/``customer``) is
    materialized to ONE arrow table, sorted by its key, and placed in the
    object store with a single ``ray.put``; every ``map_batches`` task
    resolves fact keys with a zero-copy searchsorted lookup. No shuffle of
    the fact side ever happens — contrast with ``Dataset.join``, whose
    aggregator actor pools the repo bans from concurrent paths (see
    CLAUDE.md). ``how`` is ``"inner"`` (drop misses) or ``"left"``
    (null-fill misses). Dimension keys must be unique and non-null.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    right_on = right_on or on
    if not isinstance(dim, pa.Table):
        dim = pa.concat_tables(
            b for b in _to_arrow_blocks(dim).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    if right_cols is None:
        right_cols = [c for c in dim.schema.names if c != right_on]
    keys = dim[right_on]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if pc.any(pc.is_null(keys)).as_py():
        raise ValueError(f"dimension key {right_on!r} contains nulls")
    kv = keys.to_numpy(zero_copy_only=False)
    order = np.argsort(kv, kind="stable")
    kv_sorted = kv[order]
    if len(kv_sorted) > 1 and (kv_sorted[1:] == kv_sorted[:-1]).any():
        raise ValueError(f"dimension key {right_on!r} is not unique")
    ds = _to_arrow_blocks(ds)
    left_names = list(_schema(ds).names)
    if on not in left_names:
        raise ValueError(f"fact side lacks column {on!r}")
    out_map = _right_out_map(left_names, right_cols, suffix)
    payload = dim.select(right_cols).take(pa.array(order, pa.int64()))
    dim_ref = ray.put((kv_sorted, payload))
    dim_types = {out_map[c]: dim.schema.field(c).type for c in right_cols}
    # fill value for null fact keys: any constant REPRESENTABLE IN THE FACT
    # KEY TYPE works (hits are invalidated by the null mask afterwards) — a
    # dim key could overflow a narrower fact column (e.g. int32 facts vs an
    # int64 dim key), so use the type's zero, not kvs[0]
    from liken_ray.extras.relational import _zero_scalar

    fact_fill = _zero_scalar(_schema(ds).field(on).type)

    def lookup(batch: pa.Table) -> pa.Table:
        kvs, pay = ray.get(dim_ref)
        key = batch[on]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        nullm = pc.is_null(key).to_numpy(zero_copy_only=False)
        if len(kvs):
            # fill nulls ARROW-side, then invalidate: converting a
            # null-bearing int64 array via to_numpy goes through float64
            # and garbles keys above 2^53 (CLAUDE.md trap); the FILLED
            # array converts on the exact integer path
            key_filled = pc.fill_null(key, fact_fill) if key.null_count else key
            probe = key_filled.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(kvs, probe)
            pos_c = np.clip(pos, 0, len(kvs) - 1)
            hit = (kvs[pos_c] == probe) & ~nullm
        else:
            pos_c = np.zeros(len(key), dtype=np.int64)
            hit = np.zeros(len(key), dtype=bool)
        if how == "inner":
            sel = np.flatnonzero(hit)
            out = batch.take(pa.array(sel, pa.int64()))
            idx = pa.array(pos_c[sel], pa.int64())
            for c in right_cols:
                out = out.append_column(out_map[c], pay[c].take(idx))
            return out
        out = batch
        take_idx = pa.array(pos_c, pa.int64())
        hits = pa.array(hit)
        for c in right_cols:
            arr = pay[c].take(take_idx)
            if not hit.all():
                arr = pc.if_else(hits, arr, pa.scalar(None, type=dim_types[out_map[c]]))
            out = out.append_column(out_map[c], arr)
        return out

    return ds.map_batches(lookup, batch_format="pyarrow")


def merge_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
):
    """Distributed sort-merge equi-join for two LARGE Datasets.

    The relational gap ``broadcast_join`` can't cover: when the build side
    is itself too big to ``ray.put`` (fact x fact, e.g. TPC-H
    lineitem x orders), the only scale-safe shape is the repo's standard
    union + ONE range sort + per-block segmented scan + O(blocks) carry
    chain — NOT ``Dataset.join``, whose aggregator actor pools deadlock on
    concurrent paths (CLAUDE.md). Cost model: both payloads ride through
    one all-to-all sort shuffle (the classic sort-merge-join price), then
    every block finalizes independently; the driver sees only O(blocks)
    scalars plus ONE carried right row per block boundary, so a hot key
    whose run spans many blocks stays bounded per task.

    Contract for ``how="inner"``/``"left"``: the right key must be
    UNIQUE — enforced distributively, in-block via a segmented right-row
    count and across block boundaries via the carry chain (a right row
    for a run that already carried one is a duplicate). Many-to-many
    joins must pre-aggregate one side first (the per-key cross product is
    unbounded under skew by definition). Null keys never match (SQL
    equality): null-key right rows are dropped at tag time; null-key left
    rows are dropped for ``how="inner"`` and pass through null-filled for
    ``how="left"``. Float NaN keys DO match each other — pandas ``merge``
    and DuckDB both treat NaN = NaN as true in equi-joins, so silently
    dropping them would diverge from the oracle. Both ride the sort
    sentinel-encoded as a (variant, filled-key) pair — variant 0 = real
    key, 1 = NaN (one matchable run), 2 = null (never matches) — because
    Ray's range sort crashes on null sort keys and NaN boundaries /
    NaN != NaN comparisons would otherwise split runs (CLAUDE.md).

    ``how="outer"`` is SQL FULL OUTER JOIN, composed from two pinned
    paths: the ``"left"`` leg plus a second pass that anti-joins the
    right side against the (per-batch collapsed) left keys and emits the
    survivors with null left columns — strict SQL shape: a right-only
    row surfaces its key only through ``right_cols`` (include
    ``right_on`` there to see it). Two sorts instead of one is the
    honest price of reusing the existence machinery; both legs stream
    and neither broadcasts. Null-key rows follow SQL: left ones pass
    through null-filled (from the left leg), right ones emit as
    unmatched (null never matches anything).

    ``how="semi"`` / ``how="anti"`` are EXISTS / NOT EXISTS filters: the
    output is exactly the left columns for left rows whose key does
    (semi) / does not (anti) appear on the right. No right payload rides
    the shuffle (the right side contributes key columns only), duplicate
    right keys are fine (existence is idempotent — the uniqueness check
    is skipped), and null-key left rows follow SQL EXISTS semantics:
    dropped for semi (a null key matches nothing), KEPT for anti (NOT
    EXISTS of an empty match set is true). This is the scale path for
    fact x fact decontamination-style filters where the membership side
    is too big for the Bloom/broadcast ops in ``extras/curation``.

    No analogue in the reference repo (/root/reference) — part of the
    SURVEY.md §2.7 "custom operators Ray Data lacks" surface.
    """
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(
            f"how must be 'inner', 'left', 'outer', 'semi' or 'anti', "
            f"got {how!r}"
        )
    if how == "outer":
        return _outer_join(left, right, on, right_on, right_cols, suffix)
    existence = how in ("semi", "anti")
    if existence:
        if right_cols:
            raise ValueError(f"right_cols make no sense for how={how!r}")
        right_cols = []
    right_on = right_on or on
    left = _to_arrow_blocks(left)
    right = _to_arrow_blocks(right)
    left_schema = _schema(left)
    right_schema = _schema(right)
    left_names = list(left_schema.names)
    if on not in left_names:
        raise ValueError(f"left side lacks column {on!r}")
    if right_on not in right_schema.names:
        raise ValueError(f"right side lacks column {right_on!r}")
    if right_cols is None:
        right_cols = [c for c in right_schema.names if c != right_on]
    for c in right_cols:
        if c not in right_schema.names:
            raise ValueError(f"right side lacks column {c!r}")
    out_map = _right_out_map(left_names, right_cols, suffix)
    carry_cols = list(out_map.values())
    carry_types = {out_map[c]: right_schema.field(c).type for c in right_cols}
    key_type = left_schema.field(on).type
    from liken_ray.extras.relational import (
        _nonempty_block_refs,
        _sentinel_ident,
        _sentinel_key_change,
        _zero_scalar,
    )

    fill = _zero_scalar(key_type)
    nan_keys = pa.types.is_floating(key_type)
    out_names = left_names + carry_cols

    def _variant_and_filled(key) -> tuple[pa.Array, Any]:
        """(variant uint8 array, filled key) for a possibly-null,
        possibly-NaN key column: 0 = real, 1 = NaN, 2 = null."""
        filled = pc.fill_null(key, fill) if key.null_count else key
        isnull = pc.is_null(key).to_numpy(zero_copy_only=False)
        if nan_keys:
            nan_mask = pc.fill_null(pc.is_nan(key), False)
            isnan = nan_mask.to_numpy(zero_copy_only=False)
            if isnan.any():
                filled = pc.if_else(nan_mask, fill, filled)
        else:
            isnan = np.zeros(len(isnull), dtype=bool)
        variant = isnull.astype(np.uint8) * 2 + isnan.astype(np.uint8)
        return pa.array(variant), filled

    def tag_left(batch: pa.Table) -> pa.Table:
        key = batch[on]
        if how in ("inner", "semi") and key.null_count:
            # null keys can never match — prune BEFORE the shuffle
            batch = batch.filter(pc.is_valid(key))
            key = batch[on]
        n = batch.num_rows
        variant, filled = _variant_and_filled(key)
        cols: dict[str, Any] = {
            "_mj_knull": variant,
            "_mj_key": filled,
            "_mj_tag": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in left_names:
            cols[c] = batch[c]
        for oc, typ in carry_types.items():
            cols[oc] = pa.nulls(n, typ)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        key = batch[right_on]
        if key.null_count:
            batch = batch.filter(pc.is_valid(key))
            key = batch[right_on]
        variant, filled = _variant_and_filled(key.cast(key_type))
        if existence:
            # existence is idempotent — collapse duplicate keys locally
            # BEFORE the shuffle (a membership list is often key-heavy)
            pairs = pa.table({"_mj_knull": variant, "_mj_key": filled})
            pairs = pairs.group_by(["_mj_knull", "_mj_key"]).aggregate([])
            variant = pairs["_mj_knull"].combine_chunks()
            filled = pairs["_mj_key"].combine_chunks()
        n = len(variant)
        cols: dict[str, Any] = {
            "_mj_knull": variant,
            "_mj_key": filled,
            "_mj_tag": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c in left_names:
            cols[c] = pa.nulls(n, left_schema.field(c).type)
        for c in right_cols:
            cols[out_map[c]] = batch[c]
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    srt = unioned.sort(["_mj_knull", "_mj_key", "_mj_tag"]).materialize()
    refs = _nonempty_block_refs(srt)
    if not refs:
        empty = pa.schema(
            [left_schema.field(c) for c in left_names]
            + [pa.field(oc, t) for oc, t in carry_types.items()]
        )
        return ray.data.from_arrow(empty.empty_table())

    @ray.remote
    def summarize(block) -> dict:
        t = BlockAccessor.for_block(block).to_arrow()
        first = _sentinel_ident(t, "_mj_knull", "_mj_key", 0)
        last = _sentinel_ident(t, "_mj_knull", "_mj_key", t.num_rows - 1)
        change = _sentinel_key_change(t, "_mj_knull", "_mj_key")
        last_start = int(np.flatnonzero(change)[-1])
        tag = t["_mj_tag"].to_numpy(zero_copy_only=False)
        tail = None
        # the (unique) right row of a run sorts FIRST in the run, so if
        # this block holds the last run's right row it sits at last_start;
        # null runs (variant 2) never carry (right null keys were dropped
        # at tag time) — the NaN run (variant 1) carries like a real key
        if last[0] != 2 and tag[last_start] == 0:
            tail = {c: t[c][last_start].as_py() for c in carry_cols}
        return {"first": first, "last": last, "tail": tail}

    summaries = ray.get([summarize.remote(r) for r in refs])
    carry_in: list[dict | None] = []
    cur: tuple | None = None
    have = False
    cur_payload: dict | None = None
    for s in summaries:
        same_start = have and s["first"] == cur
        carry_in.append(cur_payload if same_start else None)
        if same_start and s["first"] == s["last"]:
            # block lies entirely inside the current run
            if s["tail"] is not None:
                if cur_payload is not None and not existence:
                    badk = float("nan") if s["first"][0] == 1 else s["first"][1]
                    raise ValueError(
                        f"merge_join: right key {right_on!r} is not unique "
                        f"(duplicate at key {badk!r})"
                    )
                cur_payload = s["tail"]
        else:
            cur, have = s["last"], True
            cur_payload = s["tail"]

    @ray.remote
    def finalize(block, carry: dict | None):
        t = BlockAccessor.for_block(block).to_arrow()
        change = _sentinel_key_change(t, "_mj_knull", "_mj_key")
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        tag = t["_mj_tag"].to_numpy(zero_copy_only=False)
        is_right = tag == 0
        counts = np.add.reduceat(is_right.astype(np.int64), starts)
        if carry is not None:
            counts[0] += 1
        if not existence and (counts > 1).any():
            bad = int(starts[np.argmax(counts > 1)])
            badk = (
                float("nan")
                if t["_mj_knull"][bad].as_py() == 1
                else t["_mj_key"][bad].as_py()
            )
            raise ValueError(
                f"merge_join: right key {right_on!r} is not unique "
                f"(duplicate at key {badk!r})"
            )
        run_start = starts[seg]
        sel_left = np.flatnonzero(~is_right)
        hit_in = is_right[run_start[sel_left]]
        from_carry = (
            (seg[sel_left] == 0) & ~hit_in
            if carry is not None
            else np.zeros(len(sel_left), dtype=bool)
        )
        if how != "left":
            matched = hit_in | from_carry
            keep = ~matched if how == "anti" else matched
            sel_left = sel_left[keep]
            hit_in = hit_in[keep]
            from_carry = from_carry[keep]
        m = run_start[sel_left]
        cols: dict[str, Any] = {}
        take_left = pa.array(sel_left, pa.int64())
        for c in left_names:
            cols[c] = t[c].take(take_left)
        take_idx = pa.array(np.where(hit_in, m, 0), pa.int64())
        hits = pa.array(hit_in)
        for oc in carry_cols:
            arr = t[oc].take(take_idx)
            if not hit_in.all():
                arr = pc.if_else(hits, arr, pa.scalar(None, type=carry_types[oc]))
            if from_carry.any():
                arr = pc.if_else(
                    pa.array(from_carry),
                    pa.scalar(carry[oc], type=carry_types[oc]),
                    arr,
                )
            cols[oc] = arr
        return pa.table({c: cols[c] for c in out_names})

    return ray.data.from_arrow_refs(
        [finalize.remote(r, ci) for r, ci in zip(refs, carry_in)]
    )


def _outer_join(left, right, on, right_on, right_cols, suffix):
    """FULL OUTER JOIN = the ``"left"`` leg UNION the right rows whose key
    matches no left key, null-filled on the left columns. See merge_join's
    docstring for the contract."""
    right_on = right_on or on
    left = _to_arrow_blocks(left)
    right = _to_arrow_blocks(right)
    left_schema = _schema(left)
    right_schema = _schema(right)
    left_names = list(left_schema.names)
    if right_cols is None:
        right_cols = [c for c in right_schema.names if c != right_on]
    out_map = _right_out_map(left_names, right_cols, suffix)

    left_leg = merge_join(
        left, right, on=on, right_on=right_on, right_cols=right_cols, how="left",
        suffix=suffix,
    )

    def keys_only(batch: pa.Table) -> pa.Table:
        return batch.select([on])

    lk = left.map_batches(keys_only, batch_format="pyarrow")
    unmatched = merge_join(right, lk, on=right_on, right_on=on, how="anti")

    def shape(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols: dict[str, Any] = {}
        for c in left_names:
            cols[c] = pa.nulls(n, left_schema.field(c).type)
        for c in right_cols:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[out_map[c]] = col
        return pa.table(cols)

    return left_leg.union(unmatched.map_batches(shape, batch_format="pyarrow"))


def range_join(
    left,
    right,
    on: str,
    by: str,
    start_col: str,
    end_col: str,
    right_cols: list[str] | None = None,
    how: str = "left",
    closed: str = "left",
    suffix: str = "_r",
):
    """Point-in-interval join: each left row (point ``on``, key ``by``) is
    joined to the right interval ``[start_col, end_col)`` (``closed="left"``)
    or ``[start_col, end_col]`` (``closed="both"``) of the same key that
    contains it; a null ``end_col`` means an open-ended interval.

    Built on :func:`asof_join` — one union + range sort + LOCF carry chain,
    no ``Dataset.join`` — plus a vectorized end-bound trim: the as-of match
    (latest interval with ``start <= point``) is the ONLY candidate when
    intervals of a key do not overlap, so the trim merely invalidates
    matches whose interval ended before the point.

    Contract: intervals must be non-overlapping per key with unique, non-
    null ``(by, start_col)`` (inherited from ``asof_join``'s right-side
    uniqueness — an overlapping interval set makes the match multiplicity
    per point unbounded under skew and is a different operator). ``how`` is
    ``"left"`` (null-fill points in no interval) or ``"inner"`` (drop
    them). Carried columns colliding with left names get ``suffix``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    left = _to_arrow_blocks(left)
    right = _to_arrow_blocks(right)
    left_schema = _schema(left)
    right_schema = _schema(right)
    left_names = list(left_schema.names)
    for c in (on, by):
        if c not in left_names:
            raise ValueError(f"left side lacks column {c!r}")
    for c in (by, start_col, end_col):
        if c not in right_schema.names:
            raise ValueError(f"right side lacks column {c!r}")
    if right_cols is None:
        right_cols = [
            c for c in right_schema.names if c not in (by, start_col, end_col)
        ]
    for c in right_cols:
        if c not in right_schema.names:
            raise ValueError(f"right side lacks column {c!r}")
    reserved = {"_rj_m", "_rj_end", on}
    bad = sorted(reserved & set(right_cols)) + (
        sorted({"_rj_m", "_rj_end"} & set(left_names))
    )
    if bad:
        raise ValueError(f"reserved/conflicting column names: {bad!r}")
    on_type = left_schema.field(on).type
    out_map = _right_out_map(left_names, right_cols, suffix)

    def intervals(batch: pa.Table) -> pa.Table:
        cols: dict[str, Any] = {
            by: batch[by],
            on: batch[start_col].cast(on_type),
            "_rj_m": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            "_rj_end": batch[end_col].cast(on_type),
        }
        for c in right_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    j = asof_join(
        left,
        right.map_batches(intervals, batch_format="pyarrow"),
        on=on,
        by=by,
        right_cols=["_rj_m", "_rj_end", *right_cols],
        strict=False,
        suffix=suffix,
    )
    carried_types = {
        out_map[c]: right_schema.field(c).type for c in right_cols
    }
    cmp = pc.less if closed == "left" else pc.less_equal

    def trim(batch: pa.Table) -> pa.Table:
        matched = pc.fill_null(pc.equal(batch["_rj_m"], 1), False)
        # or_kleene: True | null must stay True (open-ended interval with a
        # null end bound); plain or_ would propagate the null and the
        # fill_null below would drop a genuine match
        in_range = pc.fill_null(
            pc.or_kleene(
                pc.is_null(batch["_rj_end"]), cmp(batch[on], batch["_rj_end"])
            ),
            False,
        )
        valid = pc.and_(matched, in_range)
        batch = batch.drop_columns(["_rj_m", "_rj_end"])
        if how == "inner":
            return batch.filter(valid)
        for c in right_cols:
            oc = out_map[c]
            idx = batch.schema.get_field_index(oc)
            arr = pc.if_else(
                valid, batch[oc], pa.scalar(None, type=carried_types[oc])
            )
            batch = batch.set_column(idx, oc, arr)
        return batch

    return j.map_batches(trim, batch_format="pyarrow")
