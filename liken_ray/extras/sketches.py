"""Distributed cardinality sketches (HyperLogLog).

``COUNT(DISTINCT x)`` at 100 TB is either a full shuffle (exact) or a
sketch; HyperLogLog (Flajolet et al. 2007) gets ~1.6%/sqrt(m/1024) error
from ``m = 2^p`` one-byte registers that merge by element-wise max — the
canonical pre-aggregatable distributed aggregate.

Everything here is DETERMINISTIC (splitmix64 value hashing, no sampling):
the register table for a given input is a pure function, so the DuckDB
oracle replicates it bit-for-bit in integer SQL (splitmix UHUGEINT chain +
binary-string rho extraction) — see ``__ray_entry__._hll_registers_sql``.
The float estimator is deliberately kept OUT of the oracle surface
(cross-engine float summation order differs); pytest pins its accuracy
against true cardinalities instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liken_ray.extras.curation import _salt64, splitmix64


def _exact_int64_values(col) -> np.ndarray:
    """Non-null values of an int64 column as an EXACT int64 numpy array.
    ``to_numpy(zero_copy_only=False)`` on a null-bearing int64 arrow array
    goes through float64 and silently garbles values above 2^53 — so drop
    nulls FIRST (the resulting array converts on the integer path)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)


def _collect_table(obj, schema: pa.Schema) -> pa.Table:
    """A Dataset or pyarrow Table as ONE table; an empty Dataset (zero
    batches) yields the empty table of ``schema`` instead of crashing
    pa.concat_tables."""
    if isinstance(obj, pa.Table):
        return obj
    batches = list(obj.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(batches) if batches else schema.empty_table()


def _sorted_seg_reduce(parts, key_col: str, val_col: str, op: str, key_type):
    """The repo's sorted merge idiom, shared by every sketch in this
    module: sort the (key, value) partials by ``key_col`` — the only
    shuffle — then reduce each key run per block (``op``: "sum" or
    "max") with the first/last runs marked as edges. Returns
    ``(inner, edge_rows)``: ``inner`` is a Dataset whose rows carry FINAL
    per-key values (interior runs cannot straddle a block boundary after
    a global sort), ``edge_rows`` is the O(blocks) list the caller must
    driver-merge with the same ``op``. Keys compare arrow-side, so any
    key type works and null-bearing int64 never round-trips float64."""
    srt = parts.sort(key_col).materialize()

    def seg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], key_type),
                    val_col: pa.array([], pa.int64()),
                    "_edge": pa.array([], pa.bool_()),
                }
            )
        kcol = t[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        v = t[val_col].to_numpy(zero_copy_only=False)
        n = len(kcol)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = pc.not_equal(
                kcol.slice(1), kcol.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(new)
        if op == "sum":
            ends = np.r_[starts[1:], n]
            cs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(v, out=cs[1:])
            red = cs[ends] - cs[starts]
        else:
            seg_ids = np.cumsum(new) - 1
            red = np.zeros(len(starts), dtype=np.int64)
            np.maximum.at(red, seg_ids, v)
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = True
        edge[-1] = True
        return pa.table(
            {
                key_col: kcol.take(pa.array(starts, pa.int64())),
                val_col: pa.array(red, pa.int64()),
                "_edge": pa.array(edge),
            }
        )

    blocks = srt.map_batches(seg, batch_format="pyarrow", batch_size=None)
    blocks = blocks.materialize()
    inner = blocks.map_batches(
        lambda t: t.filter(pc.invert(t["_edge"])).drop_columns(["_edge"]),
        batch_format="pyarrow",
    )
    edge_rows = blocks.map_batches(
        lambda t: t.filter(t["_edge"]).drop_columns(["_edge"]),
        batch_format="pyarrow",
    ).take_all()
    return inner, edge_rows


def _floor_log2_u64(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for uint64 x > 0 — branchless doubling, no
    float round-trip (float64 is wrong above 2^53)."""
    out = np.zeros(len(x), dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >> np.uint64(shift) > 0
        out[m] += shift
        v[m] >>= np.uint64(shift)
    return out


def _rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per hash: bucket = top ``p`` bits; rho = leading-zero
    count of the remaining ``q = 64 - p`` bits + 1 (q + 1 when they are
    all zero)."""
    q = 64 - p
    bucket = (h >> np.uint64(q)).astype(np.int64)
    rem = h & np.uint64((1 << q) - 1)
    rho = np.full(len(h), q + 1, dtype=np.int64)
    nz = rem > 0
    rho[nz] = q - _floor_log2_u64(rem[nz])
    return bucket, rho


def hll_registers(ds, col: str, p: int = 12, salt: int = 0):
    """The HyperLogLog register table of ``col`` (int64 values hashed with
    ``splitmix64(value + salt)``; nulls ignored): a Dataset of
    ``(bucket, rho)`` rows for every NON-ZERO register — pure integers,
    deterministic, mergeable with another sketch by per-bucket max.

    Each batch pre-aggregates to its own <= 2^p register rows (the
    combiner), then ONE sort by bucket + per-block segmented max with the
    O(blocks) boundary stitch merges globally — registers never gather on
    the driver beyond the O(blocks) edge rows. Feed the result to
    ``hll_estimate`` for the cardinality."""
    if not (4 <= p <= 18):
        raise ValueError(f"p must be in [4, 18], got {p}")
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        # drop_null BEFORE to_numpy: a null-bearing int64 arrow array
        # converts via float64, silently garbling values above 2^53
        v = _exact_int64_values(batch[col])
        if len(v) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
            )
        h = splitmix64(v.view(np.uint64) + _salt64(salt))
        bucket, rho = _rho(h, p)
        regs = np.zeros(1 << p, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "rho": pa.array(regs[nz], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    inner, edge_rows = _sorted_seg_reduce(parts, "bucket", "rho", "max", pa.int64())
    merged: dict[int, int] = {}
    for row in edge_rows:
        k = row["bucket"]
        if k not in merged or row["rho"] > merged[k]:
            merged[k] = row["rho"]
    ks = sorted(merged)
    stitched = pa.table(
        {
            "bucket": pa.array(ks, pa.int64()),
            "rho": pa.array([merged[k] for k in ks], pa.int64()),
        }
    )
    return inner.union(ray.data.from_arrow(stitched))


def hll_estimate(registers, p: int = 12) -> float:
    """Cardinality estimate from a ``(bucket, rho)`` register table (a
    Dataset, pyarrow Table, or (bucket, rho) numpy pair) — the standard
    HLL estimator with small-range linear counting (Flajolet et al. '07)."""
    m = 1 << p
    if isinstance(registers, tuple):
        bucket, rho = registers
    else:
        tbl = _collect_table(
            registers,
            pa.schema([("bucket", pa.int64()), ("rho", pa.int64())]),
        )
        bucket = tbl["bucket"].to_numpy(zero_copy_only=False)
        rho = tbl["rho"].to_numpy(zero_copy_only=False)
    regs = np.zeros(m, dtype=np.int64)
    if len(bucket):
        np.maximum.at(regs, np.asarray(bucket, dtype=np.int64), np.asarray(rho))
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -regs)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))  # linear counting
    return float(est)


# ---------------------------------------------------------------------------
# exact heavy hitters (global top-k most frequent values)
# ---------------------------------------------------------------------------


def frequent_items(ds, col: str, k: int = 10):
    """The ``k`` globally most frequent values of ``col`` (nulls ignored)
    as a small ``(value, cnt)`` arrow table, ties broken by smaller value
    (deterministic, = SQL ``ORDER BY cnt DESC, value``).

    Exact, not a sketch: per-batch ``pyarrow.compute.value_counts``
    combine → ONE sort by value + per-block segmented sums with the
    O(blocks) edge stitch (global counts) → per-block LOCAL top-k (a
    global top-k element is necessarily in its block's top-k) → driver
    merge of O(blocks × k) candidates. The value space never gathers
    anywhere."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import ray.data

    sch = ds.schema()
    val_type = getattr(sch, "base_schema", sch).field(col).type

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = vals.drop_null()
        if len(vals) == 0:
            return pa.table(
                {"value": pa.array([], val_type), "cnt": pa.array([], pa.int64())}
            )
        vc = vals.value_counts()
        return pa.table(
            {"value": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    inner, edge_rows = _sorted_seg_reduce(parts, "value", "cnt", "sum", val_type)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("value", "ascending")]
        )
        return t.take(idx.slice(0, k))

    candidates = inner.map_batches(local_topk, batch_format="pyarrow").take_all()
    merged: dict = {}
    for row in edge_rows:
        merged[row["value"]] = merged.get(row["value"], 0) + row["cnt"]
    pool = [(r["value"], r["cnt"]) for r in candidates] + list(merged.items())
    pool.sort(key=lambda x: (-x[1], x[0]))
    top = pool[:k]
    return pa.table(
        {
            "value": pa.array([v for v, _ in top], val_type),
            "cnt": pa.array([c for _, c in top], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (approximate frequencies under a fixed memory bound)
# ---------------------------------------------------------------------------

# fixed per-row salts: row r rehashes the value hash with salt r+1 (salt 0
# would make row 0 the identity rehash of the value hash). Two chained
# splitmix64 applications keep the d rows decorrelated AND SQL-replicable
# (each is the same UHUGEINT chain the other oracles already use).


def _cms_buckets(v: np.ndarray, d: int, w: int, salt: int) -> np.ndarray:
    """(d, len(v)) bucket indices: row r = splitmix64(splitmix64(v + salt)
    + r + 1) & (w - 1)."""
    h0 = splitmix64(v.view(np.uint64) + _salt64(salt))
    out = np.empty((d, len(v)), dtype=np.int64)
    for r in range(d):
        out[r] = (splitmix64(h0 + _salt64(r + 1)) & np.uint64(w - 1)).astype(
            np.int64
        )
    return out


def cms_counters(ds, col: str, d: int = 4, w: int = 2048, salt: int = 0):
    """Count-Min sketch of ``col`` (int64 values; nulls ignored): a Dataset
    of ``(row, bucket, cnt)`` for every NON-ZERO counter of the d x w
    matrix — pure integers, deterministic, mergeable with another sketch
    by per-cell SUM (counts are additive, the property that makes CMS the
    canonical distributed frequency sketch).

    Per-batch counter combine (bincount per row) → ONE sort by the packed
    (row, bucket) cell id + per-block segmented sums + O(blocks) stitch —
    the HLL merge shape with sum instead of max. Query with
    ``cms_query`` (min over the d counters — an upper bound on the true
    count, within eps*N with probability 1-delta for w=e/eps, d=ln(1/delta))."""
    if d < 1 or w < 2 or (w & (w - 1)) != 0:
        raise ValueError(f"need d >= 1 and w a power of two >= 2, got d={d} w={w}")
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        # see _exact_int64_values: nulls must drop before to_numpy or
        # int64 values above 2^53 garble through float64
        v = _exact_int64_values(batch[col])
        if len(v) == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        b = _cms_buckets(v, d, w, salt)
        cells = (np.arange(d, dtype=np.int64)[:, None] * w + b).ravel()
        counts = np.bincount(cells, minlength=d * w)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64), pa.int64()),
                "cnt": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    inner, edge_rows = _sorted_seg_reduce(parts, "cell", "cnt", "sum", pa.int64())
    merged: dict[int, int] = {}
    for rrow in edge_rows:
        merged[rrow["cell"]] = merged.get(rrow["cell"], 0) + rrow["cnt"]
    ks = sorted(merged)
    stitched = pa.table(
        {
            "cell": pa.array(ks, pa.int64()),
            "cnt": pa.array([merged[kk] for kk in ks], pa.int64()),
        }
    )
    out = inner.union(ray.data.from_arrow(stitched))

    def unpack(t: pa.Table) -> pa.Table:
        cl = t["cell"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "row": pa.array(cl // w, pa.int64()),
                "bucket": pa.array(cl % w, pa.int64()),
                "cnt": t["cnt"],
            }
        )

    return out.map_batches(unpack, batch_format="pyarrow")


def cms_query(
    counters, values, d: int = 4, w: int = 2048, salt: int = 0
) -> np.ndarray:
    """Frequency upper-bound estimates for ``values`` from a
    ``(row, bucket, cnt)`` counter table (Dataset or pyarrow Table):
    min over the d rows' counters."""
    tbl = _collect_table(
        counters,
        pa.schema(
            [("row", pa.int64()), ("bucket", pa.int64()), ("cnt", pa.int64())]
        ),
    )
    mat = np.zeros((d, w), dtype=np.int64)
    rows = tbl["row"].to_numpy(zero_copy_only=False)
    buckets = tbl["bucket"].to_numpy(zero_copy_only=False)
    cnts = tbl["cnt"].to_numpy(zero_copy_only=False)
    # add, not assign: a merged (concatenated) counter table legitimately
    # repeats cells — CMS merge is per-cell SUM, and last-write-wins would
    # break the never-underestimate guarantee
    np.add.at(mat, (np.asarray(rows, dtype=np.int64),
                    np.asarray(buckets, dtype=np.int64)), cnts)
    v = np.asarray(values, dtype=np.int64)
    b = _cms_buckets(v, d, w, salt)
    ests = mat[np.arange(d)[:, None], b]
    return ests.min(axis=0)
