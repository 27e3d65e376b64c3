"""Distributed execution of a dedupe plan over ``ray.data.Dataset``.

Design (Ray-Data-first, not a port):

- A global ``ROW_ID`` is attached once (positional — per-block offsets from
  block metadata, each block tagged by a Ray task; the reference's
  driver-collect renumbering at ``backends/ray/wrapper.py:70-94`` is
  replaced by a metadata-only pass. NOT ``Dataset.zip`` with a ``range``:
  the zip operator pairs streaming blocks in completion order, which
  nondeterministically scrambles ids vs row order).
- Every operator runs its data-heavy part as Dataset transforms:
  * ``exact``   → key-column ``map_batches`` + ``groupby(keys)`` shuffle,
    star edges emitted per duplicate group;
  * ``lsh``     → MinHash signatures in an actor-pool ``map_batches`` (the
    permutation matrix lives in actor state) → band-key explode →
    ``groupby(band, key)`` blocking shuffle → star edges;
  * predicates  → vectorized Arrow masks in ``map_batches`` → matched row
    ids;
  * pairwise ops (fuzzy/jaccard/cosine/tfidf/custom) → inherently O(n²)
    *global* semantics: the named column(s) are gathered and the local
    kernel runs over them (guarded by ``max_pairwise_rows``; use lsh/exact
    blocking for scale — same caveat the reference documents for these).
- Edges/matched-ids (≈ duplicate rows, ≪ table rows) reduce to driver-side
  union-find; the resulting per-row relabel map is broadcast via
  ``ray.put`` and applied in one ``map_batches`` — the broadcast-small-side
  join pattern. The web-scale flagship pipeline (``liken_ray.pipelines``)
  keeps labels distributed end-to-end instead.
- ``scope="partition"`` reproduces the reference Ray backend's
  batch-local clustering (``backends/ray/executor.py:33-70``): the whole
  local plan runs per batch, zero shuffles.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from liken_ray.constants import CANONICAL_ID, NA_PLACEHOLDER, ROW_ID, SEQUENTIAL_API_DEFAULT_KEY
from liken_ray.dedupers.core import (
    Columns,
    Deduper,
    Exact,
    LSH,
    PredicateDeduper,
)
from liken_ray.engine.components import KeyedUnionFind
from liken_ray.kernels import minhash as mh
from liken_ray.kernels.preprocess import Preprocessor, apply_preprocessors
from liken_ray.plan import DeduplicationDict, Pipeline

DEFAULT_MAX_PAIRWISE_ROWS = 200_000


# ---------------------------------------------------------------------------
# row ids + canonical id creation
# ---------------------------------------------------------------------------


def _arrow_schema(ds) -> pa.Schema:
    """The underlying pyarrow schema of a Dataset (Ray wraps it)."""
    sch = ds.schema()
    return getattr(sch, "base_schema", sch)


def attach_positional_column(ds, col_name: str):
    """Attach a positional int64 column = global row order.

    Deterministic by construction: the dataset is materialized, per-block
    row counts come from block METADATA (no data moves to the driver),
    offsets are the prefix sum in logical block order, and one Ray task per
    block appends ``offset + local_index``. ``Dataset.zip`` with a ``range``
    dataset is NOT safe here — the zip operator pairs blocks of the two
    inputs in streaming completion order, which nondeterministically
    permutes ids relative to row order (observed on 1M rows x 8 blocks).

    ``preserve_order`` is forced ON for the materialize: Ray Data's
    streaming executor otherwise emits (and the snapshot then freezes)
    blocks in COMPLETION order, so "positional" would mean a different
    permutation on every run (observed: parquet shard order permuting
    across two ``_ingest`` calls on the same path)."""
    # NB: a Dataset captures its DataContext at creation — the flag must be
    # set on ds.context (mutating the global context after creation is a
    # no-op for this dataset)
    ctx = ds.context
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        ds = ds.materialize()
    finally:
        ctx.execution_options.preserve_order = prev

    block_refs: list = []
    counts: list[int] = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            block_refs.append(ref)
            counts.append(meta.num_rows)

    @ray.remote
    def tag(block, offset: int):
        from ray.data.block import BlockAccessor

        t = BlockAccessor.for_block(block).to_arrow()
        return t.append_column(
            col_name, pa.array(np.arange(offset, offset + t.num_rows, dtype=np.int64))
        )

    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(np.asarray(counts, dtype=np.int64), out=offsets[1:])
    new_refs = [tag.remote(r, int(o)) for r, o in zip(block_refs, offsets[:-1])]
    out = ray.data.from_arrow_refs(new_refs)
    if not block_refs:  # empty dataset: preserve schema + new column
        empty = pa.schema(list(_arrow_schema(ds)) + [pa.field(col_name, pa.int64())])
        out = ray.data.from_arrow(empty.empty_table())
    return out


def ensure_row_id(ds):
    """Attach the positional int64 ``ROW_ID`` column (see
    ``attach_positional_column``; no data is collected to the driver)."""
    if ROW_ID in ds.schema().names:
        return ds
    return attach_positional_column(ds, ROW_ID)


def add_canonical_id(ds, id: str | None):
    """The canonical-id creation decision tree (reference
    ``core/wrapper.py:137-153``) as Dataset ops."""
    names = ds.schema().names
    has_canonical = CANONICAL_ID in names

    def overwrite(batch: pa.Table, src: str) -> pa.Table:
        i = batch.column_names.index(CANONICAL_ID)
        return batch.set_column(i, CANONICAL_ID, batch[src])

    if has_canonical:
        if id and id != CANONICAL_ID:
            return ds.map_batches(
                lambda t: overwrite(t, id), batch_format="pyarrow", zero_copy_batch=True
            )
        return ds
    if id:
        return ds.map_batches(
            lambda t: t.append_column(CANONICAL_ID, t[id]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # auto-increment = the positional row id
    return ds.map_batches(
        lambda t: t.append_column(CANONICAL_ID, t[ROW_ID]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# per-operator distributed stages → edges / matched row ids
# ---------------------------------------------------------------------------


def _prep_single(batch: pa.Table, column: str, with_na: bool, preprocessors) -> pa.Array:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if with_na and pa.types.is_null(col.type):  # all-null column
        col = col.cast(pa.string())
    if with_na and (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        col = pc.coalesce(col, NA_PLACEHOLDER)
    if preprocessors:
        col = apply_preprocessors(col, preprocessors)
    return col


def _tag_encode(col: pa.Array) -> pa.Array:
    """Null-safe, type-tagged string encoding of arbitrary scalar values so
    heterogeneous / nullable keys survive a ``groupby`` shuffle.

    Vectorized (Arrow casts + ``binary_join_element_wise``) for the common
    bool/int/float/string key types; the per-row Python fallback survives
    only for exotic types (dates, decimals, binary, nested). Injectivity:
    the type tag separates types, Arrow's shortest-round-trip numeric
    printing separates values, and string values carry a length prefix so
    control characters cannot alias a compound-join separator. The encoding
    is type-driven, so every batch of a column takes the same path."""
    t = col.type
    n = len(col)
    if pa.types.is_null(t):
        return pa.array(["\x00"] * n, pa.string())
    tag = None
    if pa.types.is_boolean(t):
        tag = "bool"
    elif pa.types.is_integer(t):
        tag = "int"
    elif pa.types.is_floating(t):
        tag = "float"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        tag = "str"
    if tag is None:
        return pa.array(
            [
                "\x00" if v is None else f"{type(v).__name__}\x01{v!r}"
                for v in col.to_pylist()
            ],
            type=pa.string(),
        )
    s = pc.cast(col, pa.string())
    if tag == "str":
        ln = pc.cast(pc.utf8_length(col), pa.string())
        enc = pc.binary_join_element_wise(pa.scalar("str"), ln, s, "\x01")
    else:
        enc = pc.binary_join_element_wise(pa.scalar(tag), s, "\x01")
    return pc.coalesce(enc, pa.scalar("\x00"))


def _filter_candidates(ds, candidate_ref):
    """Subset the dataset to candidate row ids (broadcast sorted array,
    vectorized searchsorted membership; no shuffle)."""
    if candidate_ref is None:
        return ds

    def fil(batch: pa.Table) -> pa.Table:
        from liken_ray.engine.components import sorted_membership_mask

        cand = ray.get(candidate_ref)
        if not isinstance(cand, np.ndarray):
            cand = np.sort(np.fromiter(cand, dtype=np.int64, count=len(cand)))
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(sorted_membership_mask(rid, cand)))

    return ds.map_batches(fil, batch_format="pyarrow")


def edges_exact(ds, columns: Columns, preprocessors, candidate_ref) -> list[tuple[int, int]]:
    """groupby(value keys) shuffle; star edges per duplicate bucket."""
    single = isinstance(columns, str)
    cols = [columns] if single else list(columns)

    def keyize(batch: pa.Table) -> pa.Table:
        out: dict[str, Any] = {ROW_ID: batch[ROW_ID]}
        if single:
            key = _prep_single(batch, columns, True, preprocessors)
            if not (pa.types.is_string(key.type) or pa.types.is_large_string(key.type)):
                key = _tag_encode(key)
            elif key.null_count:
                key = pc.coalesce(key, NA_PLACEHOLDER)
            out["k0"] = key
        else:
            parts = [_tag_encode(
                batch[c].combine_chunks() if isinstance(batch[c], pa.ChunkedArray) else batch[c]
            ) for c in cols]
            out["k0"] = pc.binary_join_element_wise(*parts, "\x02")
        return pa.table(out)

    keyed = _filter_candidates(ds, candidate_ref).map_batches(keyize, batch_format="pyarrow")
    from liken_ray.engine.blocking import bucket_edges, collect_edges

    return collect_edges(bucket_edges(keyed, ["k0"], ROW_ID, pair_cap=1))


def minhash_band_stage(
    batch: pa.Table, *, column: str, ngram: int, num_perm: int, b: int, r: int, preprocessors
) -> pa.Table:
    """Signature + band-key explode for one batch. The permutation matrix is
    cached module-wide (``mh.permutations`` is lru-cached), so it is built
    once per worker process — the same amortization an actor would give,
    without per-query actor-pool startup."""
    col = _prep_single(batch, column, True, preprocessors)
    texts = col.to_pylist()
    sigs = mh.batch_signatures(texts, ngram, num_perm)
    keys = mh.band_keys(sigs, b, r)  # (n, b)
    rid = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(rid)
    return pa.table(
        {
            ROW_ID: np.repeat(rid, b),
            "band": np.tile(np.arange(b, dtype=np.int32), n),
            "key": keys.reshape(-1),
        }
    )


def edges_lsh(
    ds, column: str, deduper: LSH, preprocessors, candidate_ref, concurrency=None
) -> list[tuple[int, int]]:
    sub = _filter_candidates(ds, candidate_ref)
    b, r = deduper.band_params()
    banded = sub.map_batches(
        minhash_band_stage,
        fn_kwargs=dict(
            column=column,
            ngram=deduper.ngram,
            num_perm=deduper.num_perm,
            b=b,
            r=r,
            preprocessors=preprocessors,
        ),
        batch_format="pyarrow",
    )

    from liken_ray.engine.blocking import bucket_edges, collect_edges

    return collect_edges(bucket_edges(banded, ["band", "key"], ROW_ID, pair_cap=1))


def matched_predicate(ds, column: str, deduper: PredicateDeduper, preprocessors, candidate_ref) -> list[int]:
    """Matched row ids collected to the driver — ONLY for the
    rule-predication pipeline path, whose subset semantics need the id set.
    The sequential path uses ``apply_predicate_cluster`` (below), which
    never collects ids."""
    def stage(batch: pa.Table) -> pa.Table:
        col = _prep_single(batch, column, deduper.with_na_placeholder, preprocessors)
        m = deduper.mask(col)
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False)
        return pa.table({ROW_ID: rid[m].astype(np.int64)})

    sub = _filter_candidates(ds, candidate_ref)
    out = sub.map_batches(stage, batch_format="pyarrow")
    return [r[ROW_ID] for r in out.take_all()]


def apply_predicate_cluster(ds, column: str, deduper: PredicateDeduper, preprocessors, keep: str):
    """Distributed predicate clustering: ALL matched rows form one cluster
    whose canonical value is the current canonical at the min (keep=first)
    / max (keep=last) matched row — computed with a per-batch min/max/count
    partial aggregate (driver sees O(blocks) summaries, never the matched
    id list, even for predicates matching nearly every row) and applied by
    re-evaluating the vectorized mask per batch."""

    def summarize(batch: pa.Table) -> pa.Table:
        col = _prep_single(batch, column, deduper.with_na_placeholder, preprocessors)
        m = deduper.mask(col)
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False)
        hit = rid[m]
        if not len(hit):
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"mn": [int(hit.min())], "mx": [int(hit.max())],
                         "cnt": [len(hit)]})

    parts = ds.map_batches(summarize, batch_format="pyarrow").take_all()
    total = sum(p["cnt"] for p in parts)
    if total < 2:
        return ds
    rep_rid = min(p["mn"] for p in parts) if keep == "first" else max(p["mx"] for p in parts)

    # fetch the canonical value at the representative row (single-row pull)
    rep_rows = ds.map_batches(
        lambda t: t.filter(pc.equal(t[ROW_ID], rep_rid)).select([CANONICAL_ID]),
        batch_format="pyarrow",
    ).take_all()
    rep_value = rep_rows[0][CANONICAL_ID]

    def relabel(batch: pa.Table) -> pa.Table:
        col = _prep_single(batch, column, deduper.with_na_placeholder, preprocessors)
        m = deduper.mask(col)
        canon = batch[CANONICAL_ID]
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        out = pc.if_else(
            pa.array(m), pa.scalar(rep_value, type=canon.type), canon
        )
        i = batch.column_names.index(CANONICAL_ID)
        return batch.set_column(i, CANONICAL_ID, out)

    return ds.map_batches(relabel, batch_format="pyarrow").materialize()


def edges_pairwise(
    ds, columns: Columns, deduper: Deduper, preprocessors, candidate_ref, max_rows: int
) -> list[tuple[int, int]]:
    """Gather (row_id, needed columns) and run the local pairwise kernel.
    Guarded: these operators are globally quadratic by definition."""
    single = isinstance(columns, str)
    cols = [columns] if single else list(columns)

    def project(batch: pa.Table) -> pa.Table:
        out: dict[str, Any] = {ROW_ID: batch[ROW_ID]}
        if single:
            out[columns] = _prep_single(
                batch, columns, deduper.with_na_placeholder, preprocessors
            )
        else:
            for c in cols:
                out[c] = batch[c]
        return pa.table(out)

    sub = _filter_candidates(ds, candidate_ref).map_batches(project, batch_format="pyarrow")
    rows = sub.take_all()
    if len(rows) > max_rows:
        raise ValueError(
            f"{deduper.name} is an all-pairs operator; {len(rows)} rows exceed "
            f"max_pairwise_rows={max_rows}. Block first (lsh/exact) or raise the limit."
        )
    rows.sort(key=lambda r: r[ROW_ID])
    rids = [r[ROW_ID] for r in rows]
    if single:
        data: pa.Array | pa.Table = pa.array([r[columns] for r in rows])
    else:
        data = pa.table({c: [r[c] for r in rows] for c in cols})
    return [(rids[i], rids[j]) for i, j in deduper.pairs(data)]


# ---------------------------------------------------------------------------
# composition + canonicalization
# ---------------------------------------------------------------------------


def _op_edges(ds, columns, deduper, preprocessors, candidate_ref, cfg) -> list[tuple[int, int]]:
    deduper.validate(columns)
    if isinstance(deduper, LSH):
        return edges_lsh(ds, columns, deduper, preprocessors, candidate_ref, cfg.get("concurrency"))
    if isinstance(deduper, Exact):
        return edges_exact(ds, columns, preprocessors, candidate_ref)
    return edges_pairwise(
        ds, columns, deduper, preprocessors, candidate_ref,
        cfg.get("max_pairwise_rows", DEFAULT_MAX_PAIRWISE_ROWS),
    )


def _clusters_from_edges(edges) -> dict[int, list[int]]:
    uf = KeyedUnionFind()
    for a, b in edges:
        uf.union(a, b)
    comps: dict[int, list[int]] = {}
    labels = uf.labels()
    for node, root in labels.items():
        comps.setdefault(root, []).append(node)
    for members in comps.values():
        members.sort()
    return comps


def _apply_components(ds, components: dict[Any, list[int]], keep: str):
    """Relabel: new canonical(rid) = current canonical at the component's
    min/max member row (the transitive-chaining rule,
    reference ``core/deduper.py:127-155``)."""
    rep_of: dict[int, int] = {}
    for members in components.values():
        if len(members) < 2:
            continue
        rep = members[0] if keep == "first" else members[-1]
        for m in members:
            rep_of[m] = rep
    if not rep_of:
        return ds

    reps = np.sort(np.fromiter(set(rep_of.values()), dtype=np.int64))
    reps_ref = ray.put(reps)

    def collect_rep_values(batch: pa.Table) -> pa.Table:
        from liken_ray.engine.components import sorted_membership_mask

        r = ray.get(reps_ref)
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = sorted_membership_mask(rid, r)
        return pa.table({ROW_ID: rid[mask], "v": batch[CANONICAL_ID].filter(pa.array(mask))})

    rep_rows = ds.map_batches(collect_rep_values, batch_format="pyarrow").take_all()
    rep_value = {r[ROW_ID]: r["v"] for r in rep_rows}

    # relabel map as sorted parallel arrays (rid keys + an Arrow value array
    # indexed by position) — broadcast once, applied with searchsorted +
    # Arrow take/if_else per batch; no per-row dict lookups
    keys_sorted = np.sort(np.fromiter(rep_of.keys(), dtype=np.int64, count=len(rep_of)))
    canon_type = _arrow_schema(ds).field(CANONICAL_ID).type
    vals_arr = pa.array(
        [rep_value[rep_of[int(k)]] for k in keys_sorted], type=canon_type
    )
    map_ref = ray.put((keys_sorted, vals_arr))

    def relabel(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(map_ref)
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = batch[CANONICAL_ID]
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        pos = np.clip(np.searchsorted(keys, rid), 0, max(0, len(keys) - 1))
        hit = keys[pos] == rid
        repl = vals.take(pa.array(np.where(hit, pos, 0), type=pa.int64()))
        out = pc.if_else(pa.array(hit), repl, canon)
        i = batch.column_names.index(CANONICAL_ID)
        return batch.set_column(i, CANONICAL_ID, out)

    return ds.map_batches(relabel, batch_format="pyarrow").materialize()


def execute_plan_ray(
    ds,
    dedupers: DeduplicationDict | Pipeline,
    *,
    columns: Columns | None,
    keep: str,
    drop_duplicates: bool,
    drop_canonical_id: bool,
    id: str | None,
    scope: str = "global",
    **cfg: Any,
):
    if scope == "partition":
        return _execute_partition_scope(
            ds, dedupers, columns, keep, drop_duplicates, drop_canonical_id, id
        )

    ds = ensure_row_id(ds)
    ds = add_canonical_id(ds, id).materialize()

    if isinstance(dedupers, DeduplicationDict):
        if not columns:
            items = [(c, d) for c, dd in dedupers.items() for d in dd]
        else:
            items = [(columns, d) for d in dedupers[SEQUENTIAL_API_DEFAULT_KEY]]
        for col_key, deduper in items:
            if isinstance(deduper, PredicateDeduper):
                # distributed: no matched-id collection even for dense
                # predicates (e.g. str_len(min_len=0) matching every row)
                ds = apply_predicate_cluster(ds, col_key, deduper, [], keep)
            else:
                edges = _op_edges(ds, col_key, deduper, [], None, cfg)
                comps = _clusters_from_edges(edges)
                ds = _apply_components(ds, comps, keep)

    elif isinstance(dedupers, Pipeline):
        for step in dedupers.steps:
            comps = _step_components(ds, step, cfg)
            ds = _apply_components(ds, comps, keep)
    else:
        raise TypeError(type(dedupers).__name__)

    if drop_duplicates:
        ds = drop_duplicates_ray(ds, keep)
    if drop_canonical_id:
        ds = ds.drop_columns([CANONICAL_ID])
    return ds


def _step_components(ds, step, cfg) -> dict[Any, list[int]]:
    """One pipeline step → components over row ids, reproducing AND
    (tuple-of-roots) and rule-predication subset semantics
    (reference ``core/executor.py:103-135``)."""
    if Pipeline.has_any_predicate(step):
        indices: set[int] | None = None  # None = full table
        comps: dict[Any, list[int]] = {}
        for unit in step:
            cand_ref = (
                ray.put(np.sort(np.fromiter(indices, dtype=np.int64, count=len(indices))))
                if indices
                else None
            )
            if isinstance(unit.deduper, PredicateDeduper):
                matched = matched_predicate(
                    ds, unit.columns, unit.deduper, unit.preprocessors, cand_ref
                )
                comps = {0: sorted(matched)} if len(matched) > 1 else {}
                if comps:
                    new = set(comps[0])
                    indices = new if indices is None else indices | new
                elif indices is None:
                    indices = set()
            else:
                edges = _op_edges(ds, unit.columns, unit.deduper, unit.preprocessors, cand_ref, cfg)
                comps = _clusters_from_edges(edges)
        return comps

    # AND: tuple-of-roots signatures. Rows can only co-cluster if they are
    # non-singleton in EVERY unit, so the intersection of per-unit label
    # keys bounds the work (see module docstring).
    unit_labels: list[dict[int, int]] = []
    for unit in step:
        if isinstance(unit.deduper, PredicateDeduper):
            matched = matched_predicate(ds, unit.columns, unit.deduper, unit.preprocessors, None)
            labels = {m: matched[0] for m in matched} if len(matched) > 1 else {}
        else:
            edges = _op_edges(ds, unit.columns, unit.deduper, unit.preprocessors, None, cfg)
            uf = KeyedUnionFind()
            for a, b in edges:
                uf.union(a, b)
            labels = uf.labels()
        unit_labels.append(labels)

    if not unit_labels:
        return {}
    candidates = set(unit_labels[0])
    for labels in unit_labels[1:]:
        candidates &= set(labels)
    comps: dict[Any, list[int]] = {}
    for rid in candidates:
        sig = tuple(labels[rid] for labels in unit_labels)
        comps.setdefault(sig, []).append(rid)
    return {sig: sorted(m) for sig, m in comps.items() if len(m) > 1}


def _execute_partition_scope(ds, dedupers, columns, keep, drop_duplicates, drop_canonical_id, id):
    """Reference Ray-backend compatibility: the full local plan per batch."""
    from liken_ray.local.executor import LocalFrame, execute_plan

    def per_batch(batch: pa.Table) -> pa.Table:
        frame = LocalFrame(batch, id)
        frame = execute_plan(
            frame,
            dedupers,
            columns=columns,
            keep=keep,
            drop_duplicates=drop_duplicates,
            drop_canonical_id=drop_canonical_id,
        )
        return frame.table

    return ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# terminals
# ---------------------------------------------------------------------------


def _canon_np(canon) -> np.ndarray:
    """Numpy view of the canonical-id column for sort-scan run detection.

    Non-null integer columns take the zero-copy numpy fast path; every
    other reference-supported canonical id type — string ids
    (``core/wrapper.py``: the canonical id "can also be a string field",
    exercised by ``tests/integration/test_matrix_id.py``), floats, bools,
    nullable or null-typed columns — falls back to a python-object array:
    equality-exact (no int() coercion / float truncation) and hashable for
    the O(blocks) driver-side boundary maps. ``None != None`` is False for
    object arrays, so null runs stay contiguous."""
    if isinstance(canon, pa.ChunkedArray):
        canon = canon.combine_chunks()
    if pa.types.is_integer(canon.type) and canon.null_count == 0:
        return canon.to_numpy(zero_copy_only=False)
    return np.asarray(canon.to_pylist(), dtype=object)


def drop_duplicates_ray(ds, keep: str):
    """Keep first/last row per canonical_id in row order — fully
    distributed, map_groups-free, join-free and Aggregate-free: ONE sort
    by ``(canonical_id, row_id)`` puts each group's keeper at its run's
    first (keep="first") or last (keep="last") row; a per-block segmented
    scan emits interior-run keepers directly, and the O(blocks) runs that
    straddle block boundaries are resolved via driver-side summaries and
    a broadcast ``{canonical: keeper_rid}`` map (the ``bucket_edges``
    pattern). Replaces the former Min/Max-aggregate + left-semi-join
    formulation: Ray's Aggregate operator costs ~2x a sort at
    table-cardinality keys, the join placed an aggregator actor pool, and
    Arrow's hash join rejected nested / dictionary / null-typed payload
    columns (a sort carries any schema). Canonical ids may be any scalar
    type (see ``_canon_np``) — boundary keys travel as native arrow values
    and hash into a plain dict. A final sort restores the reference's
    original-row-order output contract."""
    first = keep == "first"
    srt = ds.sort([CANONICAL_ID, ROW_ID]).materialize()
    canon_type = _arrow_schema(srt).field(CANONICAL_ID).type

    def summarize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"bc": pa.array([], canon_type), "br": pa.array([], pa.int64())}
            )
        canon = batch[CANONICAL_ID]
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        cid = _canon_np(canon)
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False)
        # rid sorted within a run: block-local keeper candidate for the
        # first run is its first row (keep=first) / last row (keep=last),
        # symmetrically for the last run
        n = batch.num_rows
        if cid[0] != cid[-1]:
            first_end = int(np.flatnonzero(cid != cid[0]).min() - 1)
            last_start = int(np.flatnonzero(cid != cid[-1]).max() + 1)
        else:
            first_end = n - 1
            last_start = 0
        return pa.table(
            {
                "bc": canon.take(pa.array([0, n - 1], pa.int64())),
                "br": pa.array(
                    [
                        int(rid[0 if first else first_end]),
                        int(rid[last_start if first else -1]),
                    ],
                    pa.int64(),
                ),
            }
        )

    pick = min if first else max
    boundary: dict[Any, int] = {}
    for r in srt.map_batches(
        summarize, batch_format="pyarrow", batch_size=None
    ).take_all():
        bc, br = r["bc"], int(r["br"])
        boundary[bc] = pick(boundary.get(bc, br), br)
    b_ref = ray.put(boundary)

    def keep_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        cid = _canon_np(batch[CANONICAL_ID])
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        starts = np.concatenate([[0], np.flatnonzero(cid[1:] != cid[:-1]) + 1])
        ends = np.concatenate([starts[1:] - 1, [n - 1]])
        keepers = starts if first else ends
        bdict = ray.get(b_ref)
        if bdict:
            # globally sorted input ⇒ a canonical spanning blocks is the
            # first or last run of every block it touches, so only the
            # first and last keeper can be a boundary canonical: keep a
            # boundary keeper only where it holds the global keeper rid
            # (which exists in exactly one block)
            mask = np.ones(len(keepers), dtype=bool)
            for j in {0, len(keepers) - 1}:
                kpos = int(keepers[j])
                c = cid[kpos]
                win = bdict.get(c.item() if isinstance(c, np.generic) else c)
                if win is not None and int(rid[kpos]) != win:
                    mask[j] = False
            keepers = keepers[mask]
        return batch.take(pa.array(keepers, pa.int64()))

    return srt.map_batches(
        keep_rows, batch_format="pyarrow", batch_size=None
    ).sort(ROW_ID)


def strip_internal(ds):
    schema = ds.schema(fetch_if_missing=True)
    if schema is None:  # empty dataset
        return ds
    return ds.drop_columns([ROW_ID]) if ROW_ID in schema.names else ds


def canonicals_counts_ray(ds, n: int = 2) -> dict[Any, int]:
    """Per-canonical group sizes, ≥n only. Sort-scan, not a groupby —
    Ray's Aggregate operator costs ~2x a sort at table-cardinality keys.
    Each block emits (canonical, run_length) for its runs; the two runs
    that can straddle block boundaries are summed driver-side from the
    same rows (a canonical spanning blocks is a first/last run in every
    block it touches, so its partial counts all arrive). The driver pull
    is O(distinct canonicals in qualifying clusters + blocks), and the
    n-filter for interior runs happens in the workers. Canonical ids may
    be any scalar type (see ``_canon_np``): run keys are emitted as native
    arrow values and keep their type in the returned dict."""
    import ray as _ray

    srt = ds.select_columns([CANONICAL_ID]).sort(CANONICAL_ID).materialize()
    canon_type = _arrow_schema(srt).field(CANONICAL_ID).type

    def run_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "cid": pa.array([], canon_type),
                    "cnt": pa.array([], pa.int64()),
                    "edge": pa.array([], pa.bool_()),
                }
            )
        canon = batch[CANONICAL_ID]
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        cid = _canon_np(canon)
        m = batch.num_rows
        starts = np.concatenate([[0], np.flatnonzero(cid[1:] != cid[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [m]]))
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = True
        edge[-1] = True
        keep = edge | (lens >= n)  # interior runs filter distributed
        return pa.table(
            {
                "cid": canon.take(pa.array(starts[keep], pa.int64())),
                "cnt": pa.array(lens[keep], pa.int64()),
                "edge": pa.array(edge[keep], pa.bool_()),
            }
        )

    counts: dict[Any, int] = {}
    edge_counts: dict[Any, int] = {}
    for r in srt.map_batches(
        run_counts, batch_format="pyarrow", batch_size=None
    ).take_all():
        cid, cnt = r["cid"], int(r["cnt"])
        if r["edge"]:
            edge_counts[cid] = edge_counts.get(cid, 0) + cnt
        else:
            counts[cid] = cnt
    for cid, cnt in edge_counts.items():
        counts[cid] = counts.get(cid, 0) + cnt
    return {cid: cnt for cid, cnt in counts.items() if cnt >= n}


def synthesize_ray(ds):
    """Golden record per canonical id: first non-null (and non-NaN, like
    the local executor) per column in row order — fixes the reference Ray
    backend's per-batch-only synthesize (``backends/ray/wrapper.py:130-137``).

    Vectorized: ONE global sort by (canonical, row id), then a segmented
    first-valid scan per sorted block (no per-group Python — canonical
    cardinality is table-sized). Runs that may straddle block boundaries
    (first/last run of each block, O(blocks) total) are merged on the
    driver in row order; inner runs are final where computed."""
    has_rid = ROW_ID in ds.schema().names
    if not has_rid:
        return _synthesize_map_groups(ds)

    out_names = [c for c in ds.schema().names if c != ROW_ID]
    out_schema = _arrow_schema(ds)
    sorted_ds = ds.sort([CANONICAL_ID, ROW_ID])

    def block_synth(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            cols = {c: pa.array([], out_schema.field(c).type) for c in out_names}
            cols["_edge"] = pa.array([], pa.bool_())
            cols["_ord"] = pa.array([], pa.int64())
            return pa.table(cols)
        canon = batch[CANONICAL_ID]
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        vals = canon.to_numpy(zero_copy_only=False)
        nullm = pc.fill_null(pc.is_null(canon, nan_is_null=True), True).to_numpy(
            zero_copy_only=False
        )
        change = np.ones(n, dtype=bool)
        # sorted input keeps nulls contiguous; vals-level != would split
        # them (null → NaN in numpy, NaN != NaN)
        change[1:] = (vals[1:] != vals[:-1]) & ~(nullm[1:] & nullm[:-1])
        starts = np.flatnonzero(change)
        nruns = len(starts)
        rid = batch[ROW_ID].to_numpy(zero_copy_only=False).astype(np.int64)
        row_idx = np.arange(n, dtype=np.int64)
        cols: dict[str, Any] = {}
        for name in out_names:
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if name == CANONICAL_ID:
                cols[name] = canon.take(pa.array(starts, pa.int64()))
                continue
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            if pa.types.is_floating(col.type):
                nan_mask = pc.fill_null(pc.is_nan(col), False).to_numpy(
                    zero_copy_only=False
                )
                valid = valid & ~nan_mask
            idxs = np.where(valid, row_idx, n)
            first = np.minimum.reduceat(idxs, starts)
            has = first < n
            take_idx = np.where(has, first, 0)
            arr = col.take(pa.array(take_idx, pa.int64()))
            if not has.all():
                arr = pc.if_else(pa.array(has), arr, pa.scalar(None, type=col.type))
            cols[name] = arr
        edge = np.zeros(nruns, dtype=bool)
        edge[0] = True
        edge[-1] = True
        cols["_edge"] = pa.array(edge)
        cols["_ord"] = pa.array(rid[starts], pa.int64())
        return pa.table(cols)

    blocks = sorted_ds.map_batches(
        block_synth, batch_format="pyarrow", batch_size=None
    ).materialize()

    inner = blocks.map_batches(
        lambda t: t.filter(pc.invert(t["_edge"])).drop_columns(["_edge", "_ord"]),
        batch_format="pyarrow",
    )
    edge_rows = blocks.map_batches(
        lambda t: t.filter(t["_edge"]), batch_format="pyarrow"
    ).take_all()
    edge_rows.sort(key=lambda r: r["_ord"])
    merged: dict[Any, dict] = {}
    order: list[Any] = []
    for r in edge_rows:
        key = r[CANONICAL_ID]
        cur = merged.get(key)
        if cur is None:
            merged[key] = {c: r[c] for c in out_names}
            order.append(key)
        else:
            for c in out_names:
                if cur[c] is None and r[c] is not None:
                    cur[c] = r[c]
    def stitched_col(c: str) -> pa.Array:
        vals_list = [merged[k][c] for k in order]
        try:
            return pa.array(vals_list, type=out_schema.field(c).type)
        except pa.ArrowInvalid:
            # block schemas can be heterogeneous (an all-null column is
            # null-typed in some blocks): infer from the merged values
            return pa.array(vals_list)

    stitched = pa.table({c: stitched_col(c) for c in out_names})
    import ray.data

    return inner.union(ray.data.from_arrow(stitched))


def _synthesize_map_groups(ds):
    """Fallback synthesize for inputs without a row id (order undefined)."""

    def first_non_null(group: pa.Table) -> pa.Table:
        out = {}
        for name in group.column_names:
            col = group[name]
            valid = col.drop_null()
            if pa.types.is_floating(valid.type) and len(valid):
                valid = valid.filter(pc.invert(pc.is_nan(valid)))
            out[name] = [valid[0].as_py()] if len(valid) else [None]
        return pa.table(
            {n: pa.array(v, type=group.schema.field(n).type) for n, v in out.items()}
        )

    return ds.groupby(CANONICAL_ID).map_groups(first_non_null, batch_format="pyarrow")
