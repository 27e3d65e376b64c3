"""Distributed relational operators Ray Data lacks: per-key top-k and
exact quantiles.

Both follow the repo's established sort-scan shape (see
``extras/joins.asof_join``, ``engine/executor.synthesize_ray``): ONE global
sort is the only shuffle, per-block kernels do vectorized segmented scans,
and only O(blocks) scalars ever reach the driver. No ``groupby`` operator
appears anywhere (the repo's perf law: Ray's Aggregate costs ~2x a sort at
high key cardinality).

Reference parity: the reference engine exposes no top-k/quantile surface;
these are the LLM-curation extensions (per-language best documents,
length-percentile filters) the 100-TB pipeline needs.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.block import BlockAccessor

from liken_ray.extras.joins import _schema, _to_arrow_blocks


def _zero_scalar(t: pa.DataType):
    """A fixed, type-appropriate fill value for sentinel-encoding null sort
    keys. The value itself never surfaces: nulls sort into their own group
    via the companion flag column, so any constant works — it only has to
    be identical across blocks."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", type=t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", type=t)
    if pa.types.is_boolean(t):
        return pa.scalar(False, type=t)
    if pa.types.is_temporal(t):
        # 32-bit temporals (date32/time32) reject an int64 cast — match widths
        src = pa.int32() if t.bit_width == 32 else pa.int64()
        return pa.scalar(0, type=src).cast(t)
    return pa.scalar(0, type=t)


def _sentinel_key_change(t: pa.Table, null_col: str, key_col: str) -> np.ndarray:
    """Run-starts mask from the sentinel (is_null flag, filled key) pair —
    arrow-side comparison, so null-bearing int64 keys never round-trip
    through float64 (raw ``to_numpy`` on such a column garbles values
    above 2^53 and collapses distinct keys)."""
    n = t.num_rows
    change = np.ones(n, dtype=bool)
    if n > 1:
        key = t[key_col]
        nul = t[null_col]
        neq = pc.or_(
            pc.not_equal(key.slice(1), key.slice(0, n - 1)),
            pc.not_equal(nul.slice(1), nul.slice(0, n - 1)),
        )
        change[1:] = neq.to_numpy(zero_copy_only=False)
    return change


def _sentinel_ident(t: pa.Table, null_col: str, key_col: str, i: int) -> tuple:
    """Cross-block key identity at row ``i``: the exact (flag, filled key)
    pair as plain Python values. The flag is kept as its raw INT so callers
    may encode more than two variants (merge_join uses 0=real, 1=NaN,
    2=null); int 0/1 still compare equal to False/True for the binary
    users. Comparing the filled pair instead of the raw key also keeps
    float NaN out of the ident (NaN != NaN would break driver-side run
    chaining)."""
    return (int(t[null_col][i].as_py()), t[key_col][i].as_py())


def _unified_schema(ds) -> tuple[pa.Schema, Any]:
    """Dataset schema with null-typed fields resolved. Ray infers the
    schema from one sampled block, so a column whose SAMPLED block is
    entirely null comes back as arrow ``null`` even when other blocks hold
    real values. In that degenerate case (never hit on parquet reads —
    file metadata carries true types) materialize and unify the per-block
    schemas remotely (only schemas travel to the driver). Returns
    ``(schema, ds)`` where ds is the materialized dataset when the
    fallback ran, so callers don't re-execute the pipeline."""
    from liken_ray.extras.joins import _schema

    sch = _schema(ds)
    if isinstance(sch, pa.Schema) and any(pa.types.is_null(f.type) for f in sch):
        mat = ds.materialize()

        @ray.remote
        def _sch(block) -> pa.Schema:
            return BlockAccessor.for_block(block).to_arrow().schema

        refs = _nonempty_block_refs(mat)
        schemas = ray.get([_sch.remote(r) for r in refs])
        if schemas:
            sch = pa.unify_schemas(schemas, promote_options="permissive")
        return sch, mat
    return sch, ds


def _typed(col, want: pa.DataType):
    """Restore a column's dataset-schema type: Ray's repartition/union
    builders degrade an all-null block slice to arrow ``null`` type, which
    breaks typed fills and sentinel encoding downstream."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(want) if col.type != want else col


def _nonempty_block_refs(srt):
    """Sorted-order non-empty block refs (Ray's sort emits one EMPTY-schema
    block for empty input — skip zero-row blocks per CLAUDE.md)."""
    return [
        ref
        for bundle in srt.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]


def group_topk(
    ds,
    key_col: str,
    score_col: str,
    k: int,
    tie_col: str,
    descending: bool = True,
):
    """Top-``k`` rows per ``key_col``, ranked by ``score_col`` (descending
    by default) with ``tie_col`` as the deterministic tie-break (ascending).
    Returns the input columns plus a 1-based ``rank`` (= SQL
    ``row_number() OVER (PARTITION BY key ORDER BY score DESC, tie)``).

    Plan: ONE sort by (key, score, tie) — the only shuffle — then a
    per-block segmented rank scan. A key run can straddle block boundaries,
    so each block first reports O(1) scalars (first/last key, run lengths);
    the driver chains rank offsets across blocks in sorted order (O(blocks))
    and each block then finalizes independently with its carry-in. Rows
    ranked past ``k`` in an earlier block can never resurface later — ranks
    only grow along the chain — so every block prunes locally.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ds = _to_arrow_blocks(ds)
    schema = _schema(ds)
    names = list(schema.names)
    for c in (key_col, score_col, tie_col):
        if c not in names:
            raise KeyError(f"column {c!r} not in dataset ({names})")

    # Ray's range-partitioned sort cannot place NULL key boundaries
    # (searchsorted over None); sentinel-encode nulls as (flag, filled)
    # like the engine's exact-dedup sort — null keys become one trailing
    # group and the ORIGINAL key column rides through untouched
    key_type = schema.field(key_col).type

    def encode(t: pa.Table) -> pa.Table:
        key = t[key_col]
        nullm = pc.is_null(key)
        t = t.append_column("_gk_null", pc.cast(nullm, pa.uint8()))
        return t.append_column("_gk_key", pc.fill_null(key, _zero_scalar(key_type)))

    srt = (
        ds.map_batches(encode, batch_format="pyarrow")
        .sort(
            ["_gk_null", "_gk_key", score_col, tie_col],
            descending=[False, False, descending, False],
        )
        .materialize()
    )
    refs = _nonempty_block_refs(srt)
    if not refs:
        out_schema = pa.schema(
            [schema.field(c) for c in names] + [pa.field("rank", pa.int64())]
        )
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def summarize(block) -> dict:
        t = BlockAccessor.for_block(block).to_arrow()
        change = _sentinel_key_change(t, "_gk_null", "_gk_key")
        starts = np.flatnonzero(change)
        return {
            "first_key": _sentinel_ident(t, "_gk_null", "_gk_key", 0),
            "last_key": _sentinel_ident(t, "_gk_null", "_gk_key", t.num_rows - 1),
            "n_rows": t.num_rows,
            "last_run": t.num_rows - int(starts[-1]),
        }

    summaries = ray.get([summarize.remote(r) for r in refs])
    # chain rank offsets across blocks: carry[i] = rows of block i's first
    # key already seen in earlier blocks. Key identity is the sentinel
    # (is_null, filled) tuple — exact for every type incl. null-bearing
    # int64 columns (raw to_numpy would round values above 2^53 through
    # float64 and collapse distinct keys)
    carries: list[int] = []
    cur_key: Any = object()  # sentinel unequal to every real key
    cur_count = 0
    for s in summaries:
        carry = cur_count if s["first_key"] == cur_key else 0
        carries.append(carry)
        cur_key = s["last_key"]
        if s["first_key"] == s["last_key"]:
            cur_count = carry + s["n_rows"]
        else:
            cur_count = s["last_run"]

    @ray.remote
    def finalize(block, carry: int):
        t = BlockAccessor.for_block(block).to_arrow()
        n = t.num_rows
        change = _sentinel_key_change(t, "_gk_null", "_gk_key")
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        rank[seg == 0] += carry
        keep = np.flatnonzero(rank < k)
        out = t.drop_columns(["_gk_null", "_gk_key"]).take(
            pa.array(keep, pa.int64())
        )
        return out.append_column("rank", pa.array(rank[keep] + 1, pa.int64()))

    return ray.data.from_arrow_refs(
        [finalize.remote(r, c) for r, c in zip(refs, carries)]
    )


def quantiles(ds, col: str, qs: Sequence[float]):
    """Exact discrete quantiles of ``col`` (nulls excluded), as a tiny
    ``(q, value)`` table matching SQL ``quantile_disc`` / PERCENTILE_DISC:
    the smallest value whose cumulative distribution reaches ``q`` —
    element ``ceil(q*n) - 1`` of the sorted column.

    Plan: project to the single column, ONE global sort (the only
    shuffle). Per-block row counts come free from block METADATA — no scan
    — so the driver locates each target's (block, offset) with one
    searchsorted over the O(blocks) cumulative counts and fetches only
    ``len(qs)`` scalars, each via an O(1) remote take on one block. The
    full column is never materialized anywhere.
    """
    qs = list(qs)
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    ds = _to_arrow_blocks(ds)
    val_type = _schema(ds).field(col).type

    proj = ds.map_batches(
        lambda t: t.select([col]).filter(pc.is_valid(t[col])),
        batch_format="pyarrow",
    )
    srt = proj.sort(col).materialize()

    pairs = [
        (ref, meta.num_rows)
        for bundle in srt.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    n = sum(c for _, c in pairs)
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"q": pa.array([], pa.float64()), "value": pa.array([], val_type)})
        )
    cum = np.cumsum([c for _, c in pairs])
    # PERCENTILE_DISC index: ceil(q*n)-1, with an epsilon so float products
    # that land a hair ABOVE an integer (0.7*10 = 7.000…001) don't drift up
    # a rank — verified element-exact against DuckDB quantile_disc
    import math

    targets = [max(0, math.ceil(q * n - 1e-9) - 1) for q in qs]

    @ray.remote
    def fetch(block, offsets: list[int]):
        t = BlockAccessor.for_block(block).to_arrow()
        return t[col].take(pa.array(offsets, pa.int64())).combine_chunks()

    per_block: dict[int, list[int]] = {}
    placement: list[tuple[int, int]] = []  # (block_idx, slot within its fetch)
    for tgt in targets:
        b = int(np.searchsorted(cum, tgt, side="right"))
        off = tgt - (int(cum[b - 1]) if b else 0)
        slots = per_block.setdefault(b, [])
        placement.append((b, len(slots)))
        slots.append(off)

    fetched = dict(
        zip(
            per_block,
            ray.get([fetch.remote(pairs[b][0], offs) for b, offs in per_block.items()]),
        )
    )
    values = pa.concat_arrays(
        [fetched[b].slice(slot, 1) for b, slot in placement]
    )
    return ray.data.from_arrow(
        pa.table({"q": pa.array(qs, pa.float64()), "value": values})
    )


def group_quantiles(ds, key_col: str, val_col: str, qs: Sequence[float]):
    """Exact discrete quantiles of ``val_col`` PER ``key_col`` group
    (``(key, q, value)`` rows; null values excluded, null keys form their
    own group) — SQL ``quantile_disc(val, qs) ... GROUP BY key`` parity,
    element index ``ceil(q*n_k) - 1`` per group.

    ONE sort by (key, val) — the only shuffle. Every key run that is
    INTERIOR to a block resolves its quantiles locally in that block;
    only the first/last run of each block (the only runs that can
    straddle a boundary) goes through the driver, which chains their
    (start, count) in sorted order — O(blocks) state — and fetches the
    O(straddling-keys x qs) target values by block-offset lookup, the
    ``quantiles`` fetch pattern. Driver work is O(blocks x qs), never
    O(keys)."""
    qs = list(qs)
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    ds = _to_arrow_blocks(ds)
    schema = _schema(ds)
    key_type = schema.field(key_col).type
    val_type = schema.field(val_col).type

    def encode(t: pa.Table) -> pa.Table:
        t = t.select([key_col, val_col]).filter(pc.is_valid(t[val_col]))
        key = t[key_col]
        return pa.table(
            {
                "_gq_null": pc.cast(pc.is_null(key), pa.uint8()),
                "_gq_key": pc.fill_null(key, _zero_scalar(key_type)),
                key_col: key,
                val_col: t[val_col],
            }
        )

    srt = (
        ds.map_batches(encode, batch_format="pyarrow")
        .sort(["_gq_null", "_gq_key", val_col])
        .materialize()
    )
    pairs = [
        (ref, meta.num_rows)
        for bundle in srt.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    empty = pa.table(
        {
            key_col: pa.array([], key_type),
            "q": pa.array([], pa.float64()),
            "value": pa.array([], val_type),
        }
    )
    if not pairs:
        return ray.data.from_arrow(empty)
    bases = np.concatenate([[0], np.cumsum([c for _, c in pairs])])

    qarr = np.asarray(qs, dtype=np.float64)

    def _targets(n: int) -> np.ndarray:
        return np.maximum(0, np.ceil(qarr * n - 1e-9).astype(np.int64) - 1)

    @ray.remote(num_returns=2)
    def block_pass(block) -> tuple:
        """Two returns: the interior-quantile table (stays in the object
        store — O(interior keys x qs) rows must NEVER route through the
        driver) and the O(1) boundary summary."""
        t = BlockAccessor.for_block(block).to_arrow()
        key = t[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        # run detection + identity via the sentinel pair: exact for
        # null-bearing int64 keys (raw to_numpy would go through float64)
        change = _sentinel_key_change(t, "_gq_null", "_gq_key")
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], t.num_rows]
        nq = len(qarr)
        # interior runs: all but the first and last
        if len(starts) > 2:
            s, e = starts[1:-1], ends[1:-1]
            n = e - s
            idx = (
                s[:, None]
                + np.maximum(
                    0, np.ceil(qarr[None, :] * n[:, None] - 1e-9).astype(np.int64) - 1
                )
            ).ravel()
            inner = pa.table(
                {
                    key_col: key.take(pa.array(np.repeat(s, nq), pa.int64())),
                    "q": pa.array(np.tile(qarr, len(s)), pa.float64()),
                    "value": t[val_col].take(pa.array(idx, pa.int64())),
                }
            )
        else:
            inner = empty
        first_run = int(starts[1]) if len(starts) > 1 else t.num_rows
        summary = (
            _sentinel_ident(t, "_gq_null", "_gq_key", 0),
            _sentinel_ident(t, "_gq_null", "_gq_key", t.num_rows - 1),
            t.num_rows,
            first_run,
            t.num_rows - int(starts[-1]),
        )
        return inner, summary

    out_refs = [block_pass.remote(r) for r, _ in pairs]
    inner_refs = [a for a, _ in out_refs]
    results = [(None, *s) for s in ray.get([b for _, b in out_refs])]

    # chain boundary runs: (key identity, global_start, total_count),
    # merged across adjacent blocks when the key continues. Identities are
    # the (is_null, filled) tuples, so plain == is exact for every type
    boundary: list[tuple[Any, int, int]] = []  # finalized (ident, start, n)
    cur: tuple[Any, int, int] | None = None  # open run

    def _same(a, b) -> bool:
        return a == b

    for i, (_, fk, lk, n_rows, first_run, last_run) in enumerate(results):
        base = int(bases[i])
        single = _same(fk, lk)
        if cur is not None and _same(cur[0], fk):
            if single:
                cur = (cur[0], cur[1], cur[2] + n_rows)
                continue
            boundary.append((cur[0], cur[1], cur[2] + first_run))
            cur = (lk, base + int(n_rows - last_run), last_run)
            continue
        if cur is not None:
            boundary.append(cur)
        if single:
            cur = (fk, base, n_rows)
            continue
        boundary.append((fk, base, first_run))
        cur = (lk, base + int(n_rows - last_run), last_run)
    if cur is not None:
        boundary.append(cur)

    # fetch boundary keys' quantile values by global position
    cum = bases[1:]
    per_block: dict[int, list[int]] = {}
    placement: list[tuple[Any, float, int, int]] = []  # key, q, block, slot
    for bkey, bstart, bn in boundary:
        tg = bstart + _targets(bn)
        for q, pos in zip(qs, tg):
            blk = int(np.searchsorted(cum, pos, side="right"))
            off = int(pos - bases[blk])
            slots = per_block.setdefault(blk, [])
            placement.append((bkey, q, blk, len(slots)))
            slots.append(off)

    @ray.remote
    def fetch(block, offsets: list[int]):
        t = BlockAccessor.for_block(block).to_arrow()
        col = t[val_col].take(pa.array(offsets, pa.int64()))
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    fetched = dict(
        zip(
            per_block,
            ray.get(
                [fetch.remote(pairs[b][0], offs) for b, offs in per_block.items()]
            ),
        )
    )
    if placement:
        bvals = pa.concat_arrays(
            [fetched[b].slice(slot, 1) for _, _, b, slot in placement]
        )
        btable = pa.table(
            {
                # identity tuple back to the original key value: the
                # filled value IS the original unless the null flag is set
                key_col: pa.array(
                    [None if k[0] else k[1] for k, _, _, _ in placement], key_type
                ),
                "q": pa.array([q for _, q, _, _ in placement], pa.float64()),
                "value": bvals,
            }
        )
        inner_refs.append(ray.put(btable))
    return ray.data.from_arrow_refs(inner_refs)


def table_profile(ds, columns: Sequence[str] | None = None):
    """Data-quality profile: one row per column with ``n`` (non-null
    count), ``nulls``, ``min``, ``max`` (as strings — a mixed-type profile
    table needs one type) and ``sum`` (int64, numeric columns only; money/
    mean stay integer-exact — divide driver-side if a float mean is
    wanted).

    One streaming pass: each batch emits an O(columns) partial, the
    driver merges O(blocks x columns) scalars. No shuffle at all."""
    ds = _to_arrow_blocks(ds)
    schema = _schema(ds)
    cols = list(columns) if columns is not None else list(schema.names)
    for c in cols:
        if c not in schema.names:
            raise KeyError(f"column {c!r} not in dataset ({list(schema.names)})")
    numeric = {
        c for c in cols if pa.types.is_integer(schema.field(c).type)
    }

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c in cols:
            col = batch[c]
            n_null = col.null_count
            n = len(col) - n_null
            names.append(c)
            ns.append(n)
            nulls.append(n_null)
            if n:
                mn = pc.min(col).as_py()
                mx = pc.max(col).as_py()
                mins.append(str(mn))
                maxs.append(str(mx))
            else:
                mins.append(None)
                maxs.append(None)
            sums.append(
                int(pc.sum(col).as_py() or 0) if (c in numeric and n) else None
            )
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "min": pa.array(mins, pa.string()),
                "max": pa.array(maxs, pa.string()),
                "sum": pa.array(sums, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[str, dict] = {
        c: {"n": 0, "nulls": 0, "min": None, "max": None, "sum": 0} for c in cols
    }
    types = {c: schema.field(c).type for c in cols}

    def _cast(c, s):
        # the per-block partial stringifies min/max (one schema for a
        # mixed-type profile); merging must compare in the NATIVE domain
        # or "10.2" < "9.5" lexicographically. Strings compare as-is
        # (UTF-8 byte order == code-point order) and ISO-formatted
        # temporals compare correctly as strings; numeric/decimal/bool
        # round-trip exactly through their parsers.
        t = types[c]
        if s is None:
            return None
        if pa.types.is_integer(t):
            return int(s)
        if pa.types.is_floating(t):
            return float(s)
        if pa.types.is_decimal(t):
            import decimal

            return decimal.Decimal(s)
        if pa.types.is_boolean(t):
            return s == "True"
        return s

    for r in partials:
        a = agg[r["column"]]
        a["n"] += r["n"]
        a["nulls"] += r["nulls"]
        for k, op in (("min", min), ("max", max)):
            v = _cast(r["column"], r[k])
            if v is not None:
                a[k] = v if a[k] is None else op(a[k], v)
        if r["sum"] is not None:
            a["sum"] += r["sum"]
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "n": pa.array([agg[c]["n"] for c in cols], pa.int64()),
            "nulls": pa.array([agg[c]["nulls"] for c in cols], pa.int64()),
            "min": pa.array(
                [None if agg[c]["min"] is None else str(agg[c]["min"]) for c in cols],
                pa.string(),
            ),
            "max": pa.array(
                [None if agg[c]["max"] is None else str(agg[c]["max"]) for c in cols],
                pa.string(),
            ),
            "sum": pa.array(
                [agg[c]["sum"] if c in numeric else None for c in cols], pa.int64()
            ),
        }
    )


def group_shift(
    ds,
    key_col: str,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    periods: int = 1,
    out_names: Sequence[str] | None = None,
):
    """Per-key LAG/LEAD: for every row, the values of ``value_cols`` from
    the row ``periods`` positions earlier (``periods > 0``, SQL ``LAG``) or
    later (``periods < 0``, SQL ``LEAD``) within its ``key_col`` partition,
    ordered by ``order_cols`` ascending; null where no such row exists.
    Matches ``LAG(v, p) OVER (PARTITION BY key ORDER BY order_cols)``.

    Plan: ONE range sort by the sentinel-encoded key plus ``order_cols``
    (descending for LEAD, so the same lag kernel computes both directions)
    — the only shuffle — then a per-block vectorized shift. A key run can
    straddle block boundaries, so each block first reports its last
    ``|periods|`` rows (key ident + shifted payload, O(periods) scalars);
    the driver chains a rolling O(periods) carry buffer across blocks in
    sorted order and each block finalizes independently, patching at most
    its first ``|periods|`` rows from the carry.

    Contract: ``(key_col, *order_cols)`` should be unique (ties make the
    shifted neighbor partition-dependent, exactly as SQL LAG with a
    non-deterministic ORDER BY). ``order_cols`` must be non-null (they are
    range-sort keys; Ray's sort crashes on null boundaries — CLAUDE.md).
    Null keys form one partition, like SQL PARTITION BY.
    """
    if periods == 0:
        raise ValueError("periods must be nonzero (positive = LAG, negative = LEAD)")
    order_cols = list(order_cols)
    value_cols = list(value_cols)
    if not order_cols or not value_cols:
        raise ValueError("order_cols and value_cols must be non-empty")
    p = abs(periods)
    ds = _to_arrow_blocks(ds)
    schema = _schema(ds)
    names = list(schema.names)
    for c in [key_col, *order_cols, *value_cols]:
        if c not in names:
            raise KeyError(f"column {c!r} not in dataset ({names})")
    if out_names is None:
        tag = f"_lag{p}" if periods > 0 else f"_lead{p}"
        out_names = [f"{c}{tag}" for c in value_cols]
    out_names = list(out_names)
    if len(out_names) != len(value_cols):
        raise ValueError("out_names must match value_cols length")
    clash = sorted(set(out_names) & set(names))
    if clash:
        raise ValueError(f"out_names collide with input columns: {clash!r}")
    key_type = schema.field(key_col).type
    val_types = {oc: schema.field(c).type for oc, c in zip(out_names, value_cols)}

    def encode(t: pa.Table) -> pa.Table:
        for c in order_cols:
            if t[c].null_count:
                raise ValueError(
                    f"group_shift: order column {c!r} contains nulls; order "
                    "columns are range-sort keys and a null position has no "
                    "defined LAG/LEAD neighbor — drop or fill them first"
                )
        key = t[key_col]
        t = t.append_column("_gs_null", pc.cast(pc.is_null(key), pa.uint8()))
        return t.append_column("_gs_key", pc.fill_null(key, _zero_scalar(key_type)))

    srt = (
        ds.map_batches(encode, batch_format="pyarrow")
        .sort(
            ["_gs_null", "_gs_key", *order_cols],
            descending=[False, False] + [periods < 0] * len(order_cols),
        )
        .materialize()
    )
    refs = _nonempty_block_refs(srt)
    if not refs:
        out_schema = pa.schema(
            [schema.field(c) for c in names]
            + [pa.field(oc, val_types[oc]) for oc in out_names]
        )
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def summarize(block) -> list:
        """Last min(p, n) rows of the block, in order: (key ident, payload)."""
        t = BlockAccessor.for_block(block).to_arrow()
        n = t.num_rows
        lo = max(0, n - p)
        return [
            (
                _sentinel_ident(t, "_gs_null", "_gs_key", i),
                {c: t[c][i].as_py() for c in value_cols},
            )
            for i in range(lo, n)
        ]

    tails = ray.get([summarize.remote(r) for r in refs])
    carry_in: list[list] = []
    buf: list = []
    for tail in tails:
        carry_in.append(list(buf))
        buf = (buf + tail)[-p:]

    @ray.remote
    def finalize(block, carry: list):
        t = BlockAccessor.for_block(block).to_arrow()
        n = t.num_rows
        change = _sentinel_key_change(t, "_gs_null", "_gs_key")
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        run_start = starts[seg]
        idx = np.arange(n, dtype=np.int64) - p
        in_block = idx >= run_start  # implies idx >= 0
        first_ident = _sentinel_ident(t, "_gs_null", "_gs_key", 0)
        k = min(p, n)  # rows that may need the carry patch
        m = len(carry)
        take_idx = pa.array(np.clip(idx, 0, n - 1), pa.int64())
        mask = pa.array(in_block)
        out = t.drop_columns(["_gs_null", "_gs_key"])
        for vc, oc in zip(value_cols, out_names):
            col = t[vc]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            arr = pc.if_else(mask, col.take(take_idx), pa.scalar(None, type=val_types[oc]))
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # first k rows: idx < 0 — the neighbor (if any) lives in the
            # carry buffer; valid only for rows of the block's FIRST run,
            # matched by exact key ident
            patch = []
            for i in range(k):
                val = None
                j = m + i - p
                if seg[i] == 0 and 0 <= j < m and carry[j][0] == first_ident:
                    val = carry[j][1][vc]
                patch.append(val)
            if patch:
                arr = pa.concat_arrays(
                    [pa.array(patch, type=val_types[oc]), arr.slice(k)]
                )
            out = out.append_column(oc, arr)
        return out

    return ray.data.from_arrow_refs(
        [finalize.remote(r, ci) for r, ci in zip(refs, carry_in)]
    )


def _sorted_multi_reduce(parts, key_cols: list[str], val_specs, psch: pa.Schema):
    """Generalized sorted segmented reduce: sort ``parts`` by ``key_cols``
    (all non-null — sentinel pairs), then finalize each key run with a
    per-column merge op. ``val_specs`` is ``[(col, op)]`` with op in
    ``{"sum", "min", "max"}``. Interior key runs cannot straddle a block
    boundary after a global sort, so each block resolves its inner runs
    locally (``num_returns=2`` — interior runs stay in the object store)
    and only the first/last run of each block (O(blocks) rows total) is
    driver-merged with the same ops. ``psch`` is the partials schema,
    passed EXPLICITLY — ``parts.schema()`` would execute the upstream
    pipeline once just to infer it.

    This is ``extras/windows._sorted_multi_sum`` generalized to non-sum
    merges (windows delegates here); the repo's answer to Ray's
    ``groupby().aggregate()`` costing ~2x a sort at high key cardinality.
    """
    import ray.data

    val_cols = [c for c, _ in val_specs]
    ops = dict(val_specs)
    _np_red = {"sum": np.add, "min": np.minimum, "max": np.maximum}
    out_schema = pa.schema([psch.field(c) for c in key_cols + val_cols])
    srt = parts.sort(key_cols).materialize()
    refs = _nonempty_block_refs(srt)
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    def _chunkless(col):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    @ray.remote(num_returns=2)
    def seg(block):
        t = BlockAccessor.for_block(block).to_arrow()
        n = t.num_rows
        change = np.ones(n, dtype=bool)
        if n > 1:
            neq = None
            for kc in key_cols:
                col = _chunkless(t[kc])
                d = pc.not_equal(col.slice(1), col.slice(0, n - 1))
                neq = d if neq is None else pc.or_(neq, d)
            change[1:] = neq.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(change)
        take = pa.array(starts, pa.int64())
        cols = {kc: _chunkless(t[kc]).take(take) for kc in key_cols}
        for vc in val_cols:
            # partials are non-null by construction (builders fill nulls
            # with the op's identity plus a companion valid-count), so the
            # numpy conversion is exact even for int64 above 2^53;
            # reduceat also avoids the prefix-sum cancellation error a
            # cumsum-diff has on float sums
            v = _chunkless(t[vc]).to_numpy(zero_copy_only=False)
            red = _np_red[ops[vc]].reduceat(v, starts)
            cols[vc] = pa.array(red, type=psch.field(vc).type)
        red_t = pa.table(cols)
        m = red_t.num_rows
        edge_idx = [0] if m == 1 else [0, m - 1]
        inner = red_t.slice(1, max(0, m - 2))
        return inner, red_t.take(pa.array(edge_idx, pa.int64()))

    outs = [seg.remote(r) for r in refs]
    inner_refs = [o[0] for o in outs]
    edge_tables = ray.get([o[1] for o in outs])

    _py_red = {"sum": lambda a, b: a + b, "min": min, "max": max}
    merged: dict[tuple, dict] = {}
    order: list[tuple] = []
    for et in edge_tables:
        for r in et.to_pylist():
            k = tuple(r[kc] for kc in key_cols)
            if k in merged:
                for vc in val_cols:
                    merged[k][vc] = _py_red[ops[vc]](merged[k][vc], r[vc])
            else:
                merged[k] = r
                order.append(k)
    stitched = pa.table(
        {
            c: pa.array([merged[k][c] for k in order], psch.field(c).type)
            for c in key_cols + val_cols
        }
    )
    return ray.data.from_arrow_refs(inner_refs + [ray.put(stitched)])


# ops supported by group_agg and the partial/merge machinery behind each
_GA_OPS = ("count", "count_rows", "sum", "min", "max", "mean")


def group_agg(ds, key_cols: Sequence[str], aggs: dict[str, tuple[str, Any]]):
    """General per-key aggregation at HIGH key cardinality: one row per
    distinct ``key_cols`` combination (null keys group together, like SQL
    ``GROUP BY``), with aggregate columns named by ``aggs``'s keys.

    ``aggs`` maps ``out_name -> (op, col)`` with op one of:

    - ``"count_rows"`` — COUNT(*); ``col`` is ignored (pass ``None``)
    - ``"count"``      — COUNT(col), non-null rows only
    - ``"sum"``        — SUM(col); NULL for an all-null group (SQL);
      int64 for integer/boolean inputs, float64 for floats
    - ``"min"`` / ``"max"`` — numeric or temporal ``col``; NULL for an
      all-null group; output keeps the input type
    - ``"mean"``       — AVG(col) as float64; NULL for an all-null group

    Plan (the repo's Aggregate-free idiom — Ray's ``groupby().aggregate``
    measured ~2x a sort at high key cardinality): each input batch
    PARTIAL-COMBINES locally with one vectorized ``pyarrow.Table.group_by``
    (so only (batches x keys-per-batch) partial rows enter the shuffle),
    the partials take ONE range sort by the sentinel-encoded keys (Ray's
    range sort crashes on null boundaries), and a per-block segmented
    ``reduceat`` with an O(blocks) first/last-run driver stitch finalizes.
    Nulls never reach the numpy reduce: every partial is null-filled with
    the op's identity plus a companion valid-count, and the finalize
    restores SQL null semantics from the count — which also keeps
    null-bearing int64 columns off the float64 ``to_numpy`` trap.

    Float caveat: ``sum``/``mean`` over floats depend on summation order
    like any parallel float sum; NaN propagates through ``min``/``max``
    (IEEE semantics via numpy) whereas SQL engines usually sort NaN last.
    Reference: no aggregation surface in /root/reference — this is the
    SURVEY §2 relational family's general rollup.
    """
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not aggs:
        raise ValueError("aggs must be non-empty")
    ds = _to_arrow_blocks(ds)
    schema, ds = _unified_schema(ds)
    names = list(schema.names)
    for c in key_cols:
        if c not in names:
            raise KeyError(f"key column {c!r} not in dataset ({names})")
    clash = sorted(set(aggs) & set(key_cols))
    if clash:
        raise ValueError(f"agg output names collide with key columns: {clash!r}")
    for out, (op, col) in aggs.items():
        if op not in _GA_OPS:
            raise ValueError(f"unknown op {op!r} for {out!r}; one of {_GA_OPS}")
        if op != "count_rows":
            if col not in names:
                raise KeyError(f"agg column {col!r} not in dataset ({names})")
            ftype = schema.field(col).type
            if op in ("sum", "mean", "min", "max") and not (
                pa.types.is_integer(ftype)
                or pa.types.is_floating(ftype)
                or pa.types.is_boolean(ftype)
                or (op in ("min", "max") and pa.types.is_temporal(ftype))
            ):
                raise TypeError(
                    f"{out!r}: op {op!r} needs a numeric"
                    f"{'/temporal' if op in ('min', 'max') else ''} column, "
                    f"got {col!r}: {ftype}"
                )

    # --- plan the partial columns -----------------------------------------
    # each agg contributes 1-2 partial columns: (name, merge_op, arrow type)
    skey_cols: list[str] = []
    key_fields: list[pa.Field] = []
    for i, kc in enumerate(key_cols):
        skey_cols += [f"_ga{i}n", f"_ga{i}f"]
        key_fields += [
            pa.field(f"_ga{i}n", pa.uint8()),
            pa.field(f"_ga{i}f", schema.field(kc).type),
        ]

    def _acc_type(t: pa.DataType) -> pa.DataType:
        if pa.types.is_floating(t):
            return pa.float64()
        return pa.int64()

    part_specs: list[tuple[str, str]] = []  # (partial col, merge op)
    part_fields: list[pa.Field] = []
    plans: list[tuple] = []  # (out, op, col, partial names..., out type)
    for out, (op, col) in aggs.items():
        if op == "count_rows":
            part_specs.append((out, "sum"))
            part_fields.append(pa.field(out, pa.int64()))
            plans.append((out, op, None, (out,), pa.int64()))
        elif op == "count":
            part_specs.append((out, "sum"))
            part_fields.append(pa.field(out, pa.int64()))
            plans.append((out, op, col, (out,), pa.int64()))
        elif op == "sum":
            at = _acc_type(schema.field(col).type)
            nn = f"{out}__nn"
            part_specs += [(out, "sum"), (nn, "sum")]
            part_fields += [pa.field(out, at), pa.field(nn, pa.int64())]
            plans.append((out, op, col, (out, nn), at))
        elif op == "mean":
            s, nn = f"{out}__s", f"{out}__nn"
            part_specs += [(s, "sum"), (nn, "sum")]
            part_fields += [pa.field(s, pa.float64()), pa.field(nn, pa.int64())]
            plans.append((out, op, col, (s, nn), pa.float64()))
        else:  # min / max
            ftype = schema.field(col).type
            acc = (
                pa.float64()
                if pa.types.is_floating(ftype)
                else (pa.int32() if getattr(ftype, "bit_width", 64) == 32 else pa.int64())
            )
            nn = f"{out}__nn"
            part_specs += [(out, op), (nn, "sum")]
            part_fields += [pa.field(out, acc), pa.field(nn, pa.int64())]
            plans.append((out, op, col, (out, nn), ftype))
    pnames = [c for c, _ in part_specs]
    bad = sorted(set(pnames) & set(skey_cols))
    if bad:
        raise ValueError(f"reserved column collision: {bad!r}")
    psch = pa.schema(key_fields + part_fields)

    def _identity_scalar(acc: pa.DataType, op: str):
        if pa.types.is_floating(acc):
            return pa.scalar(float("inf") if op == "min" else float("-inf"), acc)
        info = np.iinfo(np.int32 if acc == pa.int32() else np.int64)
        return pa.scalar(info.max if op == "min" else info.min, acc)

    from liken_ray.extras.windows import _sentinel_pair

    def build(batch: pa.Table) -> pa.Table:
        cols: dict[str, Any] = {}
        for i, kc in enumerate(key_cols):
            cols.update(
                _sentinel_pair(_typed(batch[kc], schema.field(kc).type), f"_ga{i}")
            )
        local_aggs: list[tuple[str, str]] = []
        for out, op, col, parts_of, _ in plans:
            if op == "count_rows":
                cols[out] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
                local_aggs.append((out, "sum"))
                continue
            v = _typed(batch[col], schema.field(col).type)
            if op == "count":
                cols[out] = pc.cast(pc.is_valid(v), pa.int64())
                local_aggs.append((out, "sum"))
                continue
            nn = parts_of[-1]
            cols[nn] = pc.cast(pc.is_valid(v), pa.int64())
            local_aggs.append((nn, "sum"))
            if op == "sum":
                at = psch.field(out).type
                cols[out] = pc.fill_null(v, _zero_scalar(at)).cast(at)
                local_aggs.append((out, "sum"))
            elif op == "mean":
                s = parts_of[0]
                cols[s] = pc.fill_null(v, pa.scalar(0.0, pa.float64())).cast(
                    pa.float64()
                )
                local_aggs.append((s, "sum"))
            else:
                acc = psch.field(out).type
                if pa.types.is_temporal(v.type):
                    v = v.cast(acc)
                cols[out] = pc.fill_null(v.cast(acc), _identity_scalar(acc, op))
                local_aggs.append((out, op))
        t = pa.table(cols)
        g = t.group_by(skey_cols).aggregate(local_aggs)
        ren = {f"{c}_{op}": c for c, op in local_aggs}
        g = g.rename_columns([ren.get(c, c) for c in g.schema.names])
        return g.select(skey_cols + pnames)

    parts = ds.map_batches(build, batch_format="pyarrow")
    red = _sorted_multi_reduce(parts, skey_cols, part_specs, psch)

    key_types = {kc: schema.field(kc).type for kc in key_cols}
    out_fields = [pa.field(kc, key_types[kc]) for kc in key_cols] + [
        pa.field(out, out_type) for out, _op, _c, _p, out_type in plans
    ]
    # union a typed zero-row table so the output schema is defined even on
    # empty input (map_batches never runs finalize over zero blocks and
    # would leave schema() None) — costs nothing on the non-empty path
    typed_empty = ray.data.from_arrow(pa.schema(out_fields).empty_table())

    def finalize(t: pa.Table) -> pa.Table:
        cols: dict[str, Any] = {}
        for i, kc in enumerate(key_cols):
            cols[kc] = pc.if_else(
                pc.cast(t[f"_ga{i}n"], pa.bool_()),
                pa.scalar(None, type=key_types[kc]),
                t[f"_ga{i}f"],
            )
        for out, op, _col, parts_of, out_type in plans:
            if op in ("count", "count_rows"):
                cols[out] = t[out]
                continue
            nn = parts_of[-1]
            has = pc.greater(t[nn], 0)
            if op == "mean":
                s = t[parts_of[0]]
                cols[out] = pc.if_else(
                    has,
                    pc.divide(s, pc.cast(t[nn], pa.float64())),
                    pa.scalar(None, pa.float64()),
                )
            else:
                v = t[out]
                if v.type != out_type:
                    v = v.cast(out_type)
                cols[out] = pc.if_else(has, v, pa.scalar(None, type=out_type))
        return pa.table(cols)

    return red.map_batches(finalize, batch_format="pyarrow").union(typed_empty)


def group_nunique(ds, key_cols: Sequence[str], val_col: str, out_name: str = "nunique"):
    """COUNT(DISTINCT ``val_col``) per ``key_cols`` combination — exact, at
    HIGH key cardinality, without Ray's Aggregate operator.

    Plan: each batch locally DISTINCTs its (key, val) pairs with one
    vectorized ``pyarrow.Table.group_by`` (so only the batch's distinct
    pairs enter the shuffle), the pairs take ONE range sort by the
    sentinel-encoded (keys..., val), and each sorted block counts, per key
    run, the pair-run starts whose val is non-null (SQL COUNT DISTINCT
    ignores nulls; a key whose vals are ALL null still emits a row with
    0, because the null-val pairs ride the sort as sentinel pairs).
    Interior key runs can't straddle blocks after a global sort, so each
    block resolves locally (``num_returns=2``) and the driver stitches
    O(blocks) edge rows — plus one extra correction ``_sorted_multi_reduce``
    doesn't need: the SAME (key, val) pair duplicated across a block
    boundary must count once, so each block whose first pair equals its
    predecessor's last pair decrements its first run by 1.

    ``val_col`` must not be floating-point: NaN != NaN would split what
    SQL DISTINCT treats as one value (DuckDB groups NaNs together), and
    Ray's range sort is only pinned safe for non-float boundaries here.
    Keys may be any type, nulls group together (SQL GROUP BY).

    Reference: no aggregation surface in /root/reference — SURVEY §2
    relational family.
    """
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    ds = _to_arrow_blocks(ds)
    schema, ds = _unified_schema(ds)
    names = list(schema.names)
    for c in key_cols + [val_col]:
        if c not in names:
            raise KeyError(f"column {c!r} not in dataset ({names})")
    if out_name in key_cols:
        raise ValueError(f"out_name {out_name!r} collides with a key column")
    vt = schema.field(val_col).type
    if pa.types.is_floating(vt):
        raise TypeError(
            f"group_nunique: {val_col!r} is {vt} — float DISTINCT is "
            "NaN-ambiguous (NaN != NaN would split one SQL-distinct value); "
            "cast to a fixed-point/integer representation first"
        )

    from liken_ray.extras.windows import _sentinel_pair

    skey_cols: list[str] = []
    key_fields: list[pa.Field] = []
    for i, kc in enumerate(key_cols):
        skey_cols += [f"_gn{i}n", f"_gn{i}f"]
        key_fields += [
            pa.field(f"_gn{i}n", pa.uint8()),
            pa.field(f"_gn{i}f", schema.field(kc).type),
        ]
    sval_cols = ["_gnvn", "_gnvf"]
    sort_cols = skey_cols + sval_cols
    psch = pa.schema(
        key_fields + [pa.field("_gnvn", pa.uint8()), pa.field("_gnvf", vt)]
    )

    def build(batch: pa.Table) -> pa.Table:
        cols: dict[str, Any] = {}
        for i, kc in enumerate(key_cols):
            cols.update(
                _sentinel_pair(_typed(batch[kc], schema.field(kc).type), f"_gn{i}")
            )
        cols.update(_sentinel_pair(_typed(batch[val_col], vt), "_gnv"))
        t = pa.table(cols)
        return t.group_by(sort_cols).aggregate([]).select(sort_cols)

    key_types = {kc: schema.field(kc).type for kc in key_cols}
    out_fields = [pa.field(kc, key_types[kc]) for kc in key_cols] + [
        pa.field(out_name, pa.int64())
    ]
    typed_empty = ray.data.from_arrow(pa.schema(out_fields).empty_table())

    parts = ds.map_batches(build, batch_format="pyarrow")
    srt = parts.sort(sort_cols).materialize()
    refs = _nonempty_block_refs(srt)
    if not refs:
        return typed_empty

    def _chunkless(col):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    def _multi_change(t: pa.Table, cols: list[str]) -> np.ndarray:
        n = t.num_rows
        change = np.ones(n, dtype=bool)
        if n > 1:
            neq = None
            for c in cols:
                col = _chunkless(t[c])
                d = pc.not_equal(col.slice(1), col.slice(0, n - 1))
                neq = d if neq is None else pc.or_(neq, d)
            change[1:] = neq.to_numpy(zero_copy_only=False)
        return change

    def _ident(t: pa.Table, i: int) -> tuple:
        return tuple(t[c][i].as_py() for c in sort_cols)

    @ray.remote(num_returns=2)
    def seg(block):
        t = BlockAccessor.for_block(block).to_arrow()
        n = t.num_rows
        key_change = _multi_change(t, skey_cols)
        pair_change = _multi_change(t, sort_cols)
        # the sorted partials can still repeat a pair (each input batch
        # DISTINCTed independently) — only pair-run STARTS with a non-null
        # val contribute
        valid = pc.equal(
            _chunkless(t["_gnvn"]), pa.scalar(0, pa.uint8())
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(key_change)
        contrib = (pair_change & valid).astype(np.int64)
        cnt = np.add.reduceat(contrib, starts)
        take = pa.array(starts, pa.int64())
        red_cols = {kc: _chunkless(t[kc]).take(take) for kc in skey_cols}
        red_cols[out_name] = pa.array(cnt, pa.int64())
        red = pa.table(red_cols)
        m = red.num_rows
        edge_idx = [0] if m == 1 else [0, m - 1]
        inner = red.slice(1, max(0, m - 2))
        meta = {
            "edges": red.take(pa.array(edge_idx, pa.int64())),
            "first_pair": _ident(t, 0),
            "last_pair": _ident(t, n - 1),
        }
        return inner, meta

    outs = [seg.remote(r) for r in refs]
    inner_refs = [o[0] for o in outs]
    metas = ray.get([o[1] for o in outs])

    merged: dict[tuple, dict] = {}
    order: list[tuple] = []
    prev_last: tuple | None = None
    for mt in metas:
        rows = mt["edges"].to_pylist()
        # boundary dedupe: this block's first pair already counted in the
        # predecessor — and only non-null vals ever counted
        if (
            prev_last is not None
            and mt["first_pair"] == prev_last
            and mt["first_pair"][len(skey_cols)] == 0
        ):
            rows[0][out_name] -= 1
        prev_last = mt["last_pair"]
        for r in rows:
            k = tuple(r[kc] for kc in skey_cols)
            if k in merged:
                merged[k][out_name] += r[out_name]
            else:
                merged[k] = r
                order.append(k)
    stitched = pa.table(
        {
            c: pa.array(
                [merged[k][c] for k in order],
                psch.field(c).type if c != out_name else pa.int64(),
            )
            for c in skey_cols + [out_name]
        }
    )
    red = ray.data.from_arrow_refs(inner_refs + [ray.put(stitched)])

    def finalize(t: pa.Table) -> pa.Table:
        cols: dict[str, Any] = {}
        for i, kc in enumerate(key_cols):
            cols[kc] = pc.if_else(
                pc.cast(t[f"_gn{i}n"], pa.bool_()),
                pa.scalar(None, type=key_types[kc]),
                t[f"_gn{i}f"],
            )
        cols[out_name] = t[out_name]
        return pa.table(cols)

    return red.map_batches(finalize, batch_format="pyarrow").union(typed_empty)


def group_cumsum(
    ds,
    key_col: str,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    out_names: Sequence[str] | None = None,
):
    """Per-key running totals: SQL ``SUM(v) OVER (PARTITION BY key ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)`` for each value column.

    ONE range sort by the sentinel-encoded key + order columns (the only
    shuffle), then each block computes vectorized within-run prefix sums
    and the driver chains ONE (sum, non-null count) scalar pair per block
    boundary (O(blocks)) for key runs that straddle blocks. SQL null
    semantics: null values don't advance the sum, and rows before the
    first non-null value in their partition emit NULL (SUM of an all-null
    frame). Integer/boolean inputs accumulate in int64 (null-bearing
    int64 stays exact — identity fill + a valid-count companion keeps the
    numpy path off the float64 trap); floats accumulate in float64, where
    the block-boundary carry re-associates the sum (same caveat as any
    parallel float sum). Order columns must be non-null (range-sort keys)
    and should be unique per key for a deterministic result — exactly the
    determinism SQL itself requires of a window ORDER BY.

    Reference: no window surface in /root/reference — SURVEY §2
    relational family (the packing/position ops' running-total sibling).
    """
    p_order = list(order_cols)
    value_cols = list(value_cols)
    if not p_order:
        raise ValueError("order_cols must be non-empty")
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    ds = _to_arrow_blocks(ds)
    schema, ds = _unified_schema(ds)
    names = list(schema.names)
    for c in [key_col, *p_order, *value_cols]:
        if c not in names:
            raise KeyError(f"column {c!r} not in dataset ({names})")
    if out_names is None:
        out_names = [f"{c}_cumsum" for c in value_cols]
    out_names = list(out_names)
    if len(out_names) != len(value_cols):
        raise ValueError("out_names must match value_cols length")
    clash = sorted(set(out_names) & set(names))
    if clash:
        raise ValueError(f"out_names collide with input columns: {clash!r}")
    key_type = schema.field(key_col).type

    def _acc(t: pa.DataType) -> pa.DataType:
        if pa.types.is_floating(t):
            return pa.float64()
        if pa.types.is_integer(t) or pa.types.is_boolean(t):
            return pa.int64()
        raise TypeError(f"group_cumsum needs numeric value columns, got {t}")

    acc_types = {oc: _acc(schema.field(c).type) for oc, c in zip(out_names, value_cols)}

    def encode(t: pa.Table) -> pa.Table:
        for c in p_order:
            if _typed(t[c], schema.field(c).type).null_count:
                raise ValueError(
                    f"group_cumsum: order column {c!r} contains nulls; order "
                    "columns are range-sort keys — drop or fill them first"
                )
        key = _typed(t[key_col], key_type)
        t = t.set_column(
            t.schema.get_field_index(key_col), key_col, key
        )
        t = t.append_column("_cs_null", pc.cast(pc.is_null(key), pa.uint8()))
        return t.append_column("_cs_key", pc.fill_null(key, _zero_scalar(key_type)))

    srt = (
        ds.map_batches(encode, batch_format="pyarrow")
        .sort(["_cs_null", "_cs_key", *p_order])
        .materialize()
    )
    refs = _nonempty_block_refs(srt)
    if not refs:
        out_schema = pa.schema(
            [schema.field(c) for c in names]
            + [pa.field(oc, acc_types[oc]) for oc in out_names]
        )
        return ray.data.from_arrow(out_schema.empty_table())

    def _filled_valid(t: pa.Table, vc: str, acc: pa.DataType):
        col = _typed(t[vc], schema.field(vc).type)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        filled = pc.fill_null(col, _zero_scalar(col.type)).cast(acc)
        return filled.to_numpy(zero_copy_only=False), valid

    @ray.remote
    def summarize(block) -> dict:
        """(first/last key ident, last-run per-column (sum, count))."""
        t = BlockAccessor.for_block(block).to_arrow()
        n = t.num_rows
        change = _sentinel_key_change(t, "_cs_null", "_cs_key")
        last_start = int(np.flatnonzero(change)[-1])
        tail: dict[str, tuple] = {}
        for vc, oc in zip(value_cols, out_names):
            v, valid = _filled_valid(t, vc, acc_types[oc])
            seg = v[last_start:]
            tail[oc] = (seg.sum().item(), int(valid[last_start:].sum()))
        return {
            "first": _sentinel_ident(t, "_cs_null", "_cs_key", 0),
            "last": _sentinel_ident(t, "_cs_null", "_cs_key", n - 1),
            "tail": tail,
        }

    summaries = ray.get([summarize.remote(r) for r in refs])
    zero = {oc: (0, 0) for oc in out_names}
    carry_in: list[dict | None] = []
    cur: tuple | None = None
    have = False
    acc_run = dict(zero)
    for s in summaries:
        same_start = have and s["first"] == cur
        carry_in.append({k: v for k, v in acc_run.items()} if same_start else None)
        entering = acc_run if same_start and s["first"] == s["last"] else zero
        acc_run = {
            oc: (
                entering[oc][0] + s["tail"][oc][0],
                entering[oc][1] + s["tail"][oc][1],
            )
            for oc in out_names
        }
        cur, have = s["last"], True

    @ray.remote
    def finalize(block, carry: dict | None):
        t = BlockAccessor.for_block(block).to_arrow()
        n = t.num_rows
        change = _sentinel_key_change(t, "_cs_null", "_cs_key")
        starts = np.flatnonzero(change)
        seg = np.cumsum(change) - 1
        run_start = starts[seg]
        first_run = seg == 0
        out = t.drop_columns(["_cs_null", "_cs_key"])
        for vc, oc in zip(value_cols, out_names):
            acc = acc_types[oc]
            v, valid = _filled_valid(t, vc, acc)
            total = np.cumsum(v)
            cnt_total = np.cumsum(valid.astype(np.int64))
            # within-run prefix: subtract the prefix just BEFORE the run
            base = total[run_start] - v[run_start]
            cnt_base = cnt_total[run_start] - valid[run_start]
            cum = total - base
            cnt = cnt_total - cnt_base
            if carry is not None:
                csum, ccnt = carry[oc]
                cum = np.where(first_run, cum + csum, cum)
                cnt = np.where(first_run, cnt + ccnt, cnt)
            arr = pa.array(cum, type=acc)
            has = pa.array(cnt > 0)
            arr = pc.if_else(has, arr, pa.scalar(None, type=acc))
            out = out.append_column(oc, arr)
        return out

    return ray.data.from_arrow_refs(
        [finalize.remote(r, ci) for r, ci in zip(refs, carry_in)]
    )


def distinct(ds, cols: Sequence[str]):
    """``SELECT DISTINCT cols...`` — exact global distinct at HIGH
    cardinality, without Ray's Aggregate/unique operators.

    Each batch locally DISTINCTs its rows with one vectorized
    ``pyarrow.Table.group_by`` (so only per-batch-distinct rows enter the
    shuffle), the survivors take ONE range sort by the sentinel-encoded
    columns, and each sorted block keeps its run starts. The only
    cross-block state is O(blocks) row identities: a block whose first
    row equals its predecessor's last row drops its first kept row.
    Null values group together (SQL DISTINCT). Float columns are
    rejected — NaN != NaN would split what SQL DISTINCT treats as one
    value, and Ray's range sort is only pinned safe for non-float
    boundaries in this family.

    Reference: no relational surface in /root/reference — SURVEY §2
    relational family.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    ds = _to_arrow_blocks(ds)
    schema, ds = _unified_schema(ds)
    names = list(schema.names)
    for c in cols:
        if c not in names:
            raise KeyError(f"column {c!r} not in dataset ({names})")
        t = schema.field(c).type
        if pa.types.is_floating(t):
            raise TypeError(
                f"distinct: {c!r} is {t} — float DISTINCT is NaN-ambiguous; "
                "cast to a fixed-point/integer representation first"
            )

    from liken_ray.extras.windows import _sentinel_pair

    scol_names: list[str] = []
    sfields: list[pa.Field] = []
    for i, c in enumerate(cols):
        scol_names += [f"_dt{i}n", f"_dt{i}f"]
        sfields += [
            pa.field(f"_dt{i}n", pa.uint8()),
            pa.field(f"_dt{i}f", schema.field(c).type),
        ]
    psch = pa.schema(sfields)
    out_schema = pa.schema([schema.field(c) for c in cols])
    typed_empty = ray.data.from_arrow(out_schema.empty_table())

    def build(batch: pa.Table) -> pa.Table:
        enc: dict[str, Any] = {}
        for i, c in enumerate(cols):
            enc.update(
                _sentinel_pair(_typed(batch[c], schema.field(c).type), f"_dt{i}")
            )
        t = pa.table(enc)
        return t.group_by(scol_names).aggregate([]).select(scol_names)

    parts = ds.map_batches(build, batch_format="pyarrow")
    srt = parts.sort(scol_names).materialize()
    refs = _nonempty_block_refs(srt)
    if not refs:
        return typed_empty

    def _ident(t: pa.Table, i: int) -> tuple:
        return tuple(t[c][i].as_py() for c in scol_names)

    def _multi_change(t: pa.Table, cc: list[str]) -> np.ndarray:
        n = t.num_rows
        change = np.ones(n, dtype=bool)
        if n > 1:
            neq = None
            for c in cc:
                col = t[c]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                d = pc.not_equal(col.slice(1), col.slice(0, n - 1))
                neq = d if neq is None else pc.or_(neq, d)
            change[1:] = neq.to_numpy(zero_copy_only=False)
        return change

    @ray.remote(num_returns=2)
    def seg(block):
        t = BlockAccessor.for_block(block).to_arrow()
        starts = np.flatnonzero(_multi_change(t, scol_names))
        red = t.select(scol_names).take(pa.array(starts, pa.int64()))
        return red, (_ident(t, 0), _ident(t, t.num_rows - 1))

    outs = [seg.remote(r) for r in refs]
    idents = ray.get([o[1] for o in outs])
    prev_last: tuple | None = None
    drops: list[bool] = []
    for first, last in idents:
        drops.append(prev_last is not None and first == prev_last)
        prev_last = last

    @ray.remote
    def trim(red_block, drop_first: bool):
        t = BlockAccessor.for_block(red_block).to_arrow()
        return t.slice(1) if drop_first else t

    kept = [
        trim.remote(o[0], d) if d else o[0] for o, d in zip(outs, drops)
    ]

    def finalize(t: pa.Table) -> pa.Table:
        dec: dict[str, Any] = {}
        for i, c in enumerate(cols):
            dec[c] = pc.if_else(
                pc.cast(t[f"_dt{i}n"], pa.bool_()),
                pa.scalar(None, type=schema.field(c).type),
                t[f"_dt{i}f"],
            )
        return pa.table(dec)

    return (
        ray.data.from_arrow_refs(kept)
        .map_batches(finalize, batch_format="pyarrow")
        .union(typed_empty)
    )
