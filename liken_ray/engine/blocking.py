"""High-throughput key-bucket edge generation with in-block verification.

``bucket_edges(ds, key_cols, rid_col)`` turns a keyed Dataset into candidate
(or verified) edges ``(src, dst)``. The naïve ``groupby(keys).map_groups``
pays one Python UDF call per distinct key — millions of mostly-singleton
buckets in LSH blocking — and collecting raw bucket rows to the driver
serializes the pipeline. Instead:

1. one global ``sort(key_cols)`` (the only shuffle);
2. ONE vectorized segmented scan per sorted block (lexsort already done by
   the sort; boundary diff + repeat) emitting edges with zero per-bucket
   Python — optionally verifying candidate pairs right in the block via a
   user kernel over payload columns, so only *verified* edges (≈ duplicate
   rows, not band rows) leave the workers;
3. runs that straddle block boundaries are resolved through tiny per-block
   *summary rows* (first/last run of each block, capped): the driver builds
   the few cross-block pairs and verifies them with the same kernel —
   O(num_blocks) driver work, independent of dataset size.

``verify_fn(table, src_pos, dst_pos) -> bool mask`` sees the block-local
table (with payload columns) and positional pair indices.
"""

from __future__ import annotations

import hashlib
import os
from functools import lru_cache
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VerifyFn = Callable[[pa.Table, np.ndarray, np.ndarray], np.ndarray]

_SUMMARY_CAP = 64  # max boundary rows carried per block edge


def _key_hash(values: tuple) -> int:
    h = hashlib.blake2b(repr(values).encode("utf8"), digest_size=8).digest()
    v = int.from_bytes(h, "little")
    # 0 marks a verified edge row, 1 a borderline-pair row — keep key
    # hashes out of both sentinels
    return v if v >= 2 else v + 2


def _run_boundaries(keys: list[np.ndarray], n: int) -> np.ndarray:
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    return change


@lru_cache(maxsize=256)
def _triu_cached(ln: int):
    """All-pairs index template for run length ln (<= pair_cap, so the
    cache is tiny); np.triu_indices re-built a boolean matrix per run."""
    iu, ju = np.triu_indices(ln, 1)
    return iu.astype(np.int64), ju.astype(np.int64)


def _emit_pairs(sr: np.ndarray, starts, lens, cap: int, chain: bool = False):
    """Candidate pair positions for runs (vectorized star; python only over
    runs with >=2 members for capped all-pairs).

    ``chain=True`` (set when a verify kernel will filter the pairs) adds
    consecutive (i, i+1) pairs to the star for over-cap runs: star edges
    alone make component connectivity depend on the anchor row verifying,
    so a genuine pair (B, C) in an oversized bucket would be lost whenever
    the anchor A fails verification against both. Star+chain keeps recall
    for locally-similar runs at the same O(k) cost."""
    src_parts, dst_parts = [], []
    if cap <= 1:
        change = np.zeros(len(sr), dtype=bool)
        change[starts] = True
        firsts = np.repeat(starts, lens)
        nonfirst = ~change
        if nonfirst.any():
            src_parts.append(firsts[nonfirst])
            dst_parts.append(np.flatnonzero(nonfirst))
            if chain:
                # consecutive pairs too: with a verify kernel, star-only
                # connectivity hinges on the anchor row verifying
                pos = np.arange(len(sr), dtype=np.int64)
                prev_same = np.zeros(len(sr), dtype=bool)
                prev_same[1:] = ~change[1:]
                chain_dst = pos[prev_same & nonfirst]
                chain_src = chain_dst - 1
                keep = chain_src != firsts[chain_dst]  # star already has it
                if keep.any():
                    src_parts.append(chain_src[keep])
                    dst_parts.append(chain_dst[keep])
    else:
        for ri in np.flatnonzero(lens >= 2):
            s = int(starts[ri])
            ln = int(lens[ri])
            if ln <= cap:
                iu, ju = _triu_cached(ln)
                src_parts.append(iu + s)
                dst_parts.append(ju + s)
            else:
                src_parts.append(np.full(ln - 1, s, dtype=np.int64))
                dst_parts.append(np.arange(s + 1, s + ln, dtype=np.int64))
                if chain:
                    src_parts.append(np.arange(s + 1, s + ln - 1, dtype=np.int64))
                    dst_parts.append(np.arange(s + 2, s + ln, dtype=np.int64))
    if not src_parts:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return np.concatenate(src_parts), np.concatenate(dst_parts)


def _scan_block(
    batch: pa.Table,
    key_cols: list[str],
    rid_col: str,
    cap: int,
    payload_cols: list[str],
    verify_fn: VerifyFn | None,
) -> pa.Table:
    """Emit (src, dst, keyh) rows: keyh == 0 → a (verified) edge;
    keyh != 0 → a boundary-summary row (dst = rid) plus payload columns."""
    n = batch.num_rows
    payload_schema = {c: batch.schema.field(c).type for c in payload_cols}

    def build(src, dst, keyh, summary_idx=None):
        cols: dict[str, Any] = {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "keyh": pa.array(keyh, pa.uint64()),
        }
        for c, typ in payload_schema.items():
            if summary_idx is None:
                cols[c] = pa.nulls(len(src), typ)
            else:
                cols[c] = batch[c].take(pa.array(summary_idx, pa.int64()))
        return pa.table(cols)

    if n == 0:
        return build([], [], [])

    rid = batch[rid_col].to_numpy(zero_copy_only=False).astype(np.int64)
    keys = [batch[c].to_numpy(zero_copy_only=False) for c in key_cols]
    # blocks arrive sorted by key from the upstream sort; sort rid within
    # runs for deterministic min-representatives
    change = _run_boundaries(keys, n)
    run_ids = np.cumsum(change) - 1
    order = np.lexsort((rid, run_ids))
    batch = batch.take(pa.array(order, pa.int64()))
    rid = rid[order]
    keys = [k[order] for k in keys]
    # `change` is still valid: the lexsort's primary key is run_ids, so
    # rows only move WITHIN runs and boundary positions are unchanged

    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, n))

    src_pos, dst_pos = _emit_pairs(rid, starts, lens, cap, chain=verify_fn is not None)
    bl_src = bl_dst = np.empty(0, dtype=np.int64)
    if verify_fn is not None and len(src_pos):
        res = verify_fn(batch, src_pos, dst_pos)
        if isinstance(res, tuple):
            # (accept, borderline): borderline pairs travel to the driver
            # tagged keyh=1 for an exact confirmation pass the caller runs
            mask, borderline = res
            bl_src, bl_dst = rid[src_pos[borderline]], rid[dst_pos[borderline]]
        else:
            mask = res
        src_pos, dst_pos = src_pos[mask], dst_pos[mask]

    edges = build(rid[src_pos], rid[dst_pos], np.zeros(len(src_pos), dtype=np.uint64))
    if len(bl_src):
        edges = pa.concat_tables(
            [edges, build(bl_src, bl_dst, np.ones(len(bl_src), dtype=np.uint64))],
            promote_options="default",
        )

    # boundary summaries: first and last run of the block (they may continue
    # into neighbouring blocks)
    summary_tables = []
    boundary_runs = {0, len(starts) - 1}
    truncated = 0
    # block tag rides in src (<= -3; -1/-2 stay free as sentinels): rids
    # are globally unique and blocks partition rows, so the first rid
    # identifies the block — the driver skips keyh groups whose rows all
    # carry one tag (the run was confined to this block and its pairs
    # were already emitted in-block)
    block_tag = -3 - int(rid[0])
    for ri in boundary_runs:
        s = int(starts[ri])
        ln = min(int(lens[ri]), _SUMMARY_CAP)
        if int(lens[ri]) > _SUMMARY_CAP:
            truncated += 1
        keyh = _key_hash(tuple(k[s] for k in keys))
        idx = np.arange(s, s + ln)
        summary_tables.append(
            build(
                np.full(ln, block_tag, dtype=np.int64),
                rid[idx],
                np.full(ln, keyh, dtype=np.uint64),
                summary_idx=idx,
            )
        )
    if truncated:
        # telemetry row (src=-2): boundary runs longer than _SUMMARY_CAP —
        # cross-block recall for these giant buckets rests on the in-block
        # star edges; the driver surfaces the count via ``stats``
        summary_tables.append(build([-2], [truncated], [0]))
    return pa.concat_tables([edges] + summary_tables, promote_options="default")


def _sort_barrier_default() -> bool:
    """Default for ``materialize_before_sort``: on single-node runs the
    streaming executor reserves a large resource share for the downstream
    all-to-all, starving the (CPU-heavy) keying stage of cores — so a
    materialize barrier before the sort is strictly faster (measured
    ~1.7× on the caption path at 8 CPUs). At cluster scale the barrier
    pins the full banded payload (bands × rows × payload bytes) in the
    object store and relies on spill; set ``GRAFT_SORT_BARRIER=0`` (or
    pass ``materialize_before_sort=False``) to stream straight into the
    sort instead."""
    return os.environ.get("GRAFT_SORT_BARRIER", "1") != "0"


def bucket_edges(
    ds,
    key_cols: list[str],
    rid_col: str,
    pair_cap: int = 1,
    payload_cols: list[str] | None = None,
    verify_fn: VerifyFn | None = None,
    stats: dict | None = None,
    materialize_before_sort: bool | None = None,
):
    """Edges from key collisions, optionally verified in-block.

    Returns the deduped (src, dst) edge list (size ≈ duplicate rows — the
    only data that reaches the driver). ``pair_cap<=1`` → star edges
    (sufficient for connected components); ``pair_cap=k`` → all pairs for
    buckets up to k rows, star+chain beyond (skew guard; chain keeps
    verified connectivity independent of the anchor row). ``stats`` (if a
    dict is passed) receives telemetry: ``summary_truncated`` counts
    boundary runs longer than the per-block summary cap.
    ``materialize_before_sort`` — see ``_sort_barrier_default``.
    """
    payload_cols = payload_cols or []
    keyed = ds.select_columns(list(key_cols) + [rid_col] + payload_cols)
    if materialize_before_sort is None:
        materialize_before_sort = _sort_barrier_default()
    if materialize_before_sort:
        keyed = keyed.materialize()
    sorted_ds = keyed.sort(list(key_cols))
    scanned = sorted_ds.map_batches(
        _scan_block,
        fn_kwargs={
            "key_cols": list(key_cols),
            "rid_col": rid_col,
            "cap": pair_cap,
            "payload_cols": payload_cols,
            "verify_fn": verify_fn,
        },
        batch_format="pyarrow",
        batch_size=None,  # one scan per sorted block
    )

    # the scan output is already compact (verified edges + O(blocks)
    # boundary summaries) — ONE execution, one driver pull (numpy batches,
    # not per-row dicts)
    edge_srcs: list[np.ndarray] = []
    edge_dsts: list[np.ndarray] = []
    summaries: list[dict] = []
    borderline_pairs: list[tuple[int, int]] = []
    payload_types: dict[str, pa.DataType] = {}
    truncated_total = 0
    for batch in scanned.iter_batches(batch_format="pyarrow", batch_size=None):
        if batch.num_rows == 0:
            continue
        if not payload_types:
            payload_types = {c: batch.schema.field(c).type for c in payload_cols}
        keyh = batch["keyh"].to_numpy(zero_copy_only=False)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        is_telemetry = src == -2
        if is_telemetry.any():
            truncated_total += int(dst[is_telemetry].sum())
        is_borderline = keyh == 1
        if is_borderline.any():
            borderline_pairs.extend(zip(src[is_borderline].tolist(), dst[is_borderline].tolist()))
        is_edge = (keyh == 0) & ~is_telemetry
        edge_srcs.append(src[is_edge])
        edge_dsts.append(dst[is_edge])
        is_summary = ~is_edge & ~is_telemetry & ~is_borderline
        if is_summary.any():
            summaries.extend(batch.filter(pa.array(is_summary)).to_pylist())
    if edge_srcs:
        all_src = np.concatenate(edge_srcs)
        all_dst = np.concatenate(edge_dsts)
        lo = np.minimum(all_src, all_dst)
        hi = np.maximum(all_src, all_dst)
    else:
        lo = hi = np.empty(0, dtype=np.int64)

    extra_src, extra_dst = _resolve_summaries(
        summaries, pair_cap, payload_cols, payload_types, verify_fn, borderline_pairs
    )
    if stats is not None:
        # after _resolve_summaries: it appends driver-resolved borderline
        # pairs to the same list (correct by aliasing before, fragile)
        stats["summary_truncated"] = truncated_total
        stats["borderline_pairs"] = borderline_pairs
    if extra_src:
        es = np.asarray(extra_src, dtype=np.int64)
        ed = np.asarray(extra_dst, dtype=np.int64)
        lo = np.concatenate([lo, np.minimum(es, ed)])
        hi = np.concatenate([hi, np.maximum(es, ed)])
    return dedupe_pairs(lo, hi)


def dedupe_pairs(lo: np.ndarray, hi: np.ndarray) -> list[tuple[int, int]]:
    """Distinct (lo, hi) pairs — vectorized (pack lo<<32|hi, np.unique)
    when rids fit 32 bits so the driver's per-edge cost is numpy-bound;
    python set only as the >2^32-rid fallback. Shared by bucket_edges and
    flagship.collect_edges."""
    if not lo.size:
        return []
    if int(lo.min()) >= 0 and int(hi.max()) < 1 << 32:
        packed = (lo.astype(np.uint64) << np.uint64(32)) | hi.astype(np.uint64)
        uniq = np.unique(packed)
        u_lo = (uniq >> np.uint64(32)).astype(np.int64)
        u_hi = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return list(zip(u_lo.tolist(), u_hi.tolist()))
    return list({(int(a), int(b)) for a, b in zip(lo.tolist(), hi.tolist())})


def _resolve_summaries(
    summaries: list[dict],
    pair_cap: int,
    payload_cols: list[str],
    payload_types: dict,
    verify_fn,
    borderline_pairs: list,
) -> tuple[list[int], list[int]]:
    """Cross-block candidate pairs from the per-block boundary summaries —
    O(blocks) driver work, shared by the list and Dataset edge paths."""
    extra_src: list[int] = []
    extra_dst: list[int] = []
    if not summaries:
        return extra_src, extra_dst
    by_key: dict[int, list[dict]] = {}
    for row in summaries:
        by_key.setdefault(row["keyh"], []).append(row)
    for rows in by_key.values():
        if len({r["src"] for r in rows}) < 2:
            # all rows from ONE block: the run did not straddle a block
            # boundary, its pairs were already emitted (and verified)
            # in-block — re-resolving would duplicate driver work and
            # apply the <=pair_cap all-pairs policy to runs the in-block
            # scan intentionally handled as star+chain
            continue
        rids_here = sorted({r["dst"] for r in rows})
        if len(rids_here) < 2:
            continue
        rows = sorted(rows, key=lambda r: r["dst"])
        seen = set()
        uniq_rows = []
        for r in rows:
            if r["dst"] not in seen:
                seen.add(r["dst"])
                uniq_rows.append(r)
        k = len(uniq_rows)
        if 1 < pair_cap and k <= pair_cap:
            cand = [(i, j) for i in range(k) for j in range(i + 1, k)]
        else:
            cand = [(0, j) for j in range(1, k)]
            if verify_fn is not None:
                # star+chain, mirroring the in-block over-cap policy
                cand.extend((j, j + 1) for j in range(1, k - 1))
        if verify_fn is None:
            for i, j in cand:
                extra_src.append(uniq_rows[i]["dst"])
                extra_dst.append(uniq_rows[j]["dst"])
        else:
            # verify kernels consume only payload columns by position;
            # explicit types (uint64 hashes overflow int64 inference)
            tbl = pa.table(
                {
                    c: pa.array([r[c] for r in uniq_rows], type=payload_types[c])
                    for c in payload_cols
                }
            )
            sp = np.array([c[0] for c in cand], dtype=np.int64)
            dp = np.array([c[1] for c in cand], dtype=np.int64)
            res = verify_fn(tbl, sp, dp)
            if isinstance(res, tuple):
                mask, borderline = res
                for (i, j), bl in zip(cand, borderline):
                    if bl:
                        borderline_pairs.append(
                            (uniq_rows[i]["dst"], uniq_rows[j]["dst"])
                        )
            else:
                mask = res
            for (i, j), ok in zip(cand, mask):
                if ok:
                    extra_src.append(uniq_rows[i]["dst"])
                    extra_dst.append(uniq_rows[j]["dst"])
    return extra_src, extra_dst


def dedupe_edges_dataset(edges_ds):
    """Global (src, dst) dedupe of an edge Dataset: one SORT shuffle over
    edge-sized data plus streaming scans. Not a groupby — Ray's Aggregate
    operator costs ~2x a sort at high key cardinality (measured ~10 s vs
    ~5 s on a 548k-pair table at 32 CPUs; per-group overhead). After the
    sort all copies of a pair are globally adjacent: each block emits its
    adjacent-unique rows except pairs that are some block's FIRST pair
    (only those can straddle block boundaries); the driver emits the
    distinct first pairs exactly once from an O(blocks) table."""
    import ray
    import ray.data

    srt = edges_ds.sort(["src", "dst"]).materialize()

    def first_pair(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "src": pa.array([batch["src"][0].as_py()], pa.int64()),
                "dst": pa.array([batch["dst"][0].as_py()], pa.int64()),
            }
        )

    firsts = {
        (int(r["src"]), int(r["dst"]))
        for r in srt.map_batches(
            first_pair, batch_format="pyarrow", batch_size=None
        ).take_all()
    }
    if not firsts:
        return srt
    f_arr = np.array(sorted(firsts), dtype=np.int64).reshape(-1, 2)
    f_ref = ray.put(f_arr)

    def interior(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        uniq = np.ones(len(src), dtype=bool)
        uniq[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src, dst = src[uniq], dst[uniq]
        fa = ray.get(f_ref)
        # drop rows matching any block-first pair (driver re-adds them
        # once): O(blocks) boundary pairs, binary search each against the
        # block's sorted rows
        keep = np.ones(len(src), dtype=bool)
        for s, d in fa:
            lo = int(np.searchsorted(src, s, "left"))
            hi = int(np.searchsorted(src, s, "right"))
            if lo < hi:
                j = lo + int(np.searchsorted(dst[lo:hi], d))
                if j < hi and dst[j] == d:
                    keep[j] = False
        return pa.table({"src": src[keep], "dst": dst[keep]})

    drv = pa.table({"src": f_arr[:, 0], "dst": f_arr[:, 1]})
    return srt.map_batches(
        interior, batch_format="pyarrow", batch_size=None
    ).union(ray.data.from_arrow(drv))


def bucket_edges_dataset(
    ds,
    key_cols: list[str],
    rid_col: str,
    pair_cap: int = 1,
    payload_cols: list[str] | None = None,
    verify_fn: VerifyFn | None = None,
    stats: dict | None = None,
    dedupe: bool = True,
    materialize_before_sort: bool | None = None,
):
    """``bucket_edges`` with edges kept DISTRIBUTED: returns a Dataset of
    deduplicated, canonically-oriented ``(src, dst)`` edges. The driver
    pulls only the O(blocks) boundary summaries, telemetry and borderline
    pairs — never the edge set — so the path stays memory-bounded when
    edges outgrow the driver (the 10^12-row regime). Costs one extra
    aggregate shuffle (the global cross-band edge dedupe) over the list
    path. ``dedupe=False`` returns the raw (canonically-oriented but
    possibly duplicated) edge rows so a caller can union extra edges —
    e.g. borderline confirms — BEFORE paying the one dedupe shuffle via
    ``dedupe_edges_dataset``."""
    import ray.data

    payload_cols = payload_cols or []
    keyed = ds.select_columns(list(key_cols) + [rid_col] + payload_cols)
    if materialize_before_sort is None:
        materialize_before_sort = _sort_barrier_default()
    if materialize_before_sort:
        keyed = keyed.materialize()  # see _sort_barrier_default
    # NOTE: the post-scan materialize below is NOT barrier-gated — the scan
    # output is compact (verified edges + O(blocks) summaries) and is
    # consumed twice (small-row pull + edge rows), so it must persist.
    scanned = keyed.sort(list(key_cols)).map_batches(
        _scan_block,
        fn_kwargs={
            "key_cols": list(key_cols),
            "rid_col": rid_col,
            "cap": pair_cap,
            "payload_cols": payload_cols,
            "verify_fn": verify_fn,
        },
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    # driver-side: ONLY the non-edge rows (summaries, telemetry, borderline)
    small_rows = scanned.map_batches(
        lambda t: t.filter(
            pc.or_(pc.not_equal(t["keyh"], pa.scalar(0, pa.uint64())),
                   pc.equal(t["src"], -2))
        ),
        batch_format="pyarrow",
    ).take_all()
    summaries: list[dict] = []
    borderline_pairs: list[tuple[int, int]] = []
    truncated_total = 0
    _sch = scanned.schema()
    _arrow_sch = getattr(_sch, "base_schema", _sch)
    payload_types = {c: _arrow_sch.field(c).type for c in payload_cols}
    for r in small_rows:
        if r["src"] == -2:
            truncated_total += int(r["dst"])
        elif r["keyh"] == 1:
            borderline_pairs.append((r["src"], r["dst"]))
        else:
            summaries.append(r)
    extra_src, extra_dst = _resolve_summaries(
        summaries, pair_cap, payload_cols, payload_types, verify_fn, borderline_pairs
    )
    if stats is not None:
        stats["summary_truncated"] = truncated_total
        stats["borderline_pairs"] = borderline_pairs

    def edge_rows(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["keyh"], pa.scalar(0, pa.uint64())),
                       pc.not_equal(t["src"], -2))
        t = t.filter(keep)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": np.minimum(src, dst), "dst": np.maximum(src, dst)}
        )

    edges_ds = scanned.map_batches(edge_rows, batch_format="pyarrow")
    if extra_src:
        lo = np.minimum(np.array(extra_src, dtype=np.int64), np.array(extra_dst, dtype=np.int64))
        hi = np.maximum(np.array(extra_src, dtype=np.int64), np.array(extra_dst, dtype=np.int64))
        edges_ds = edges_ds.union(
            ray.data.from_arrow(pa.table({"src": lo, "dst": hi}))
        )
    if not dedupe:
        return edges_ds
    # global dedupe of cross-band/cross-block duplicates: one aggregate
    # shuffle over edge-sized data
    return dedupe_edges_dataset(edges_ds)


def collect_edges(edges) -> list[tuple[int, int]]:
    """Edges (list or Dataset) -> deduped python pairs. The cross-batch
    dedupe is vectorized when rids fit 32 bits (pack lo<<32|hi into one
    uint64 array, ``np.unique`` once at the end) — the python tuple-set is
    only the >2^32-rid fallback, so the driver's serial fraction stays
    numpy-bound on realistic edge volumes."""
    if isinstance(edges, list):
        return edges
    packed: list[np.ndarray] = []
    seen: set[tuple[int, int]] = set()
    use_set = False
    for batch in edges.iter_batches(batch_format="pyarrow", batch_size=None):
        if batch.num_rows == 0:
            continue
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        if not use_set and (
            lo.size and (int(lo.min()) < 0 or int(hi.max()) >= 1 << 32)
        ):
            use_set = True  # fall back; drain packed batches into the set
            for p in packed:
                seen.update(
                    zip((p >> np.uint64(32)).tolist(),
                        (p & np.uint64(0xFFFFFFFF)).tolist())
                )
            packed = []
        if use_set:
            seen.update(zip(lo.tolist(), hi.tolist()))
        else:
            packed.append(
                (lo.astype(np.uint64) << np.uint64(32)) | hi.astype(np.uint64)
            )
    if use_set:
        return list(seen)
    if not packed:
        return []
    uniq = np.unique(np.concatenate(packed))
    lo = (uniq >> np.uint64(32)).astype(np.int64)
    hi = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
    return list(zip(lo.tolist(), hi.tolist()))
