"""The flagship web-scale pipeline: near-duplicate detection + clustering
over an image+caption table (BASELINE.json input_hint schema).

Modalities (each an independent blocking → verify → edges stage, OR-merged
into one connected-components pass):

1. captions  — MinHash-LSH band blocking (datasketch-parity kernel) with
   exact-shingle-Jaccard verification of in-bucket candidates;
2. images    — pHash band blocking (4 × 16-bit SimHash-style slices) with
   Hamming-distance verification, optional decoded-pixel PSNR >= 40 dB
   confirmation;
3. substrings — winnowing fingerprints over long captions, suffix-array
   longest-common-substring verification (Lee et al. 2021-style).

Scale notes (designed for 10^12 rows / multi-node, tested single-node):
- the read prunes to (image_id, caption, phash) — image ``bytes`` never
  enter a shuffle; PSNR verification re-reads only candidate rows;
- band stages shuffle compact rows (rid, band, key, verify payload);
  candidate pairs are verified inside the sorted blocks, so only verified
  edges leave the workers;
- buckets above ``bucket_pair_cap`` fall back to linear star pairing (skew
  guard: a degenerate constant-key bucket costs O(k), not O(k²));
- components: driver union-find below ``edge_uf_limit`` edges, distributed
  min-label propagation above;
- every stage checkpoints parquet + manifest keyed by a config hash —
  re-running with the same run_dir skips completed stages (resume).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from liken_ray.engine.blocking import bucket_edges, collect_edges
from liken_ray.engine.components import KeyedUnionFind, connected_components_distributed
from liken_ray.kernels import minhash as mh
from liken_ray.kernels import phash as ph
from liken_ray.kernels import suffix as sx
from liken_ray.pipelines.checkpoint import Checkpointer

RID = "rid"

DEFAULT_CONFIG: dict[str, Any] = {
    # caption LSH (reference-parity knobs: shingle size / num_perm /
    # threshold -> derived (b, r) bands)
    "ngram": 3,
    "num_perm": 128,
    "lsh_threshold": 0.7,
    "caption_verify": True,
    "verify_jaccard": 0.5,  # drop band false-positives; planted near-dups sit >= ~0.7
    # verify payload: "sketch" ships a fixed-width KMV bottom-k gram-hash
    # sketch (k*8 bytes) through the band shuffle instead of the full
    # caption ×b bands — bounded shuffle bytes at web scale. Jaccard is
    # EXACT when a pair's gram union fits in k, else a KMV estimate with
    # stderr ~ sqrt(t(1-t)/k) (k=64 → ±0.06; decision margin vs the 0.5
    # cut is > 3σ for real dups at >= 0.7). "caption" = exact verify.
    "verify_payload": "sketch",
    # 2 KB packing budget: typical web captions ship verbatim (exact
    # in-block verification, zero borderline); only documents longer than
    # k*8 bytes fall back to the bottom-k sketch + borderline confirm
    "sketch_k": 256,
    "sketch_eps": 0.10,  # ≈3σ at k=256, t=0.5: the exact-confirm band
    # verify scope. "bucket" (default): pairs are verified inside their
    # band bucket, payload travels with every band row (xb duplication;
    # a pair colliding in c bands is verified up to c times, softened by
    # the per-worker pair memo). "pair": band rows carry NO payload; raw
    # candidate pairs are globally deduped first and each DISTINCT pair is
    # verified exactly once against sketch payloads fetched from
    # range-packed objects (the _psnr_confirm_dataset pattern) — the
    # scale-out choice when bands x payload dominates the shuffle; the
    # extra cost is one (src,dst) pair-dedupe sort.
    "caption_verify_scope": "bucket",
    "sketch_pack_rows": 16384,
    "null_captions": "skip",  # "skip" | "cluster" (reference "na" semantics)
    # image path. Recall contract (pigeonhole): band blocking GUARANTEES a
    # collision only for pairs with Hamming <= phash_bands - 1, so
    # max_hamming must stay <= phash_bands - 1 (pairs beyond that would
    # pass verification but may never meet in a bucket — silent recall
    # loss). Larger radii need more bands (key width 64/bands shrinks —
    # mind bucket skew at scale) plus PSNR confirmation for precision.
    "phash_bands": 4,
    "max_hamming": 3,
    "psnr_verify": False,
    "psnr_min_db": 40.0,
    # substring path. gram_len == substring_min_len keeps blocking and
    # acceptance consistent: a winnowing fingerprint collision IS a shared
    # >= gram_len-byte substring (w.h.p.), so every cross-partition edge
    # meets the configured minimum. Winnowing guarantees a collision for
    # shared runs >= gram_len + gram_window - 1 bytes; runs in
    # [substring_min_len, that bound) are still caught exactly within each
    # partition by the suffix-array pass.
    "long_caption_min": 512,
    "substring_min_len": 64,
    "gram_len": 64,
    "gram_window": 16,
    # execution. batch_size None = one task per block: the ingest
    # repartition (≈4 blocks/CPU) then sets every stage's parallelism;
    # bundling blocks up to a row target would halve the task count
    "bucket_pair_cap": 64,
    # dataset-scope PSNR: candidate pixels are packed into one object per
    # ~psnr_pack_rows candidates (range-partitioned by rid) — bounds the
    # largest single object-store allocation; confirm tasks fetch only the
    # ranges their edge batch touches
    "psnr_pack_rows": 4096,
    "edge_uf_limit": 5_000_000,
    "batch_size": None,
    # stage_barriers True (single-node default): materialize the ingested
    # table and each banded payload before its sort so the CPU-heavy map
    # runs at full width (measured ~1.7x; see blocking._sort_barrier_default).
    # False (cluster scale): stream straight into each sort — nothing pins
    # the full banded payload in the object store; the ingest is re-read
    # per modality stage (IO-pruned parquet re-reads, no pinned copy).
    "stage_barriers": True,
    # edges_scope "driver": edge lists reduce to the driver (fast locally;
    # bounded by dup-pair count). "dataset": edges stay a Dataset end to
    # end — the driver sees only O(blocks) summaries, the global edge
    # dedupe is an aggregate shuffle, and components run distributed; use
    # at cluster scale where edges outgrow driver memory.
    "edges_scope": "driver",
}


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


def _ingest(source, cfg) -> ray.data.Dataset:
    """(rid, image_id, caption, phash) with a global positional rid.

    The ingested table is repartitioned to ~4 blocks per CPU: downstream
    map stages get one task per block, so leaving the input at its shard
    count (often ≪ cores on a big node / cluster) would cap every stage's
    parallelism at the shard count."""
    from liken_ray.engine.executor import attach_positional_column

    if isinstance(source, str):
        from liken_ray.io.read import safe_read_parquet

        ds = safe_read_parquet(source, columns=["image_id", "caption", "phash"])
    else:
        # no pre-materialize: attach_positional_column materializes with
        # preserve_order, and a plain materialize here would freeze a
        # completion-order block permutation first
        ds = source.select_columns(["image_id", "caption", "phash"])
    # rid = deterministic global row position (block-offset tagging; a
    # zip-with-range here pairs blocks in completion order and scrambles
    # rid vs row order nondeterministically)
    ds = attach_positional_column(ds, RID)
    n = ds.count()
    num_blocks = cfg.get("num_blocks")
    if not num_blocks:
        # ~4 blocks per core: block structure tracks the cluster size (the
        # per-partition suffix-array pass may emit a few more or fewer
        # bonus edges at different partitionings; winnowing/caption/image
        # recall is partition-invariant)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_blocks = max(32, min(4096, cpus * 4))
    num_blocks = min(num_blocks, max(1, n // 500))  # keep blocks non-trivial
    out = ds.repartition(num_blocks)
    # barrier (default): downstream modality stages each consume this
    # table, so pinning one copy avoids re-running read+zip+repartition
    # per stage. At cluster scale (stage_barriers=False) the re-reads
    # are IO-pruned and nothing holds the full table in the store.
    return out.materialize() if cfg.get("stage_barriers", True) else out


def _ranges_to_indices(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated ``[starts[i], starts[i]+lens[i])`` ranges as one index
    array (the vectorized gather/scatter helper for batch-level packing)."""
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rel = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
    )
    return np.repeat(starts, lens) + rel


def _pack_caption_sketches(cap_arr, ngram: int, k: int) -> pa.Array:
    """Batch-level verify-payload packing — ZERO per-row python. Captions
    whose utf8 bytes fit the ``k*8``-byte budget are byte-packed verbatim
    as ``[byte_len, padded uint64 words...]``; longer captions carry
    ``[2^63 | unique_gram_count, bottom-k unique gram hashes...]``.

    Short rows: one fancy-index scatter of the arrow data buffer into a
    zero-padded byte plane viewed as uint64. Long rows: ONE rolling-hash
    call over their concatenated bytes (the polynomial hash is
    position-normalized, so in-segment windows equal per-caption hashes;
    cross-boundary windows are masked out), then per-segment unique +
    bottom-k via a single lexsort + segmented scans — chunked at ~4 MB of
    text per hash call. Word-for-word identical to the former per-caption
    loop (pinned by the round-4 parity test)."""
    budget = k * 8
    if isinstance(cap_arr, pa.ChunkedArray):
        cap_arr = cap_arr.combine_chunks()
    n = len(cap_arr)
    valid = pc.is_valid(cap_arr).to_numpy(zero_copy_only=False)
    off_dtype = np.int64 if pa.types.is_large_string(cap_arr.type) else np.int32
    offs = np.frombuffer(cap_arr.buffers()[1], dtype=off_dtype)[
        cap_arr.offset : cap_arr.offset + n + 1
    ].astype(np.int64)
    data_buf = cap_arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    lens = np.where(valid, np.diff(offs), 0)
    short = valid & (lens <= budget)
    long_ = valid & ~short

    g_counts = np.zeros(n, dtype=np.int64)  # total unique grams per long row
    g_k_counts = np.zeros(n, dtype=np.int64)  # emitted bottom-k widths
    g_vals: list[np.ndarray] = []  # bottom-k values, row order
    li = np.flatnonzero(long_)
    CHUNK = 4 << 20
    s = 0
    while s < len(li):
        e = s
        tot = 0
        while e < len(li) and (e == s or tot + lens[li[e]] <= CHUNK):
            tot += int(lens[li[e]])
            e += 1
        rows = li[s:e]
        cat = np.concatenate([data[offs[r] : offs[r + 1]] for r in rows])
        seg_starts = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(lens[rows], out=seg_starts[1:])
        grams = sx._rolling_hashes_arr(cat.astype(np.uint64) + np.uint64(1), ngram)
        pos = np.arange(len(grams), dtype=np.int64)
        seg = np.searchsorted(seg_starts, pos, side="right") - 1
        ok = pos + ngram <= seg_starts[seg + 1]  # window inside its segment
        gs, sg = grams[ok], seg[ok]
        order = np.lexsort((gs, sg))
        gs, sg = gs[order], sg[order]
        uq = np.ones(len(gs), dtype=bool)
        uq[1:] = (sg[1:] != sg[:-1]) | (gs[1:] != gs[:-1])
        gs_u, sg_u = gs[uq], sg[uq]
        seg_first = np.ones(len(gs_u), dtype=bool)
        seg_first[1:] = sg_u[1:] != sg_u[:-1]
        first_idx = np.flatnonzero(seg_first)
        rank = np.arange(len(gs_u), dtype=np.int64) - np.repeat(
            first_idx, np.diff(np.append(first_idx, len(gs_u)))
        )
        g_counts[rows] = np.bincount(sg_u, minlength=len(rows))
        keepk = rank < k
        g_vals.append(gs_u[keepk])  # sg ascending == row order within chunk
        g_k_counts[rows] = np.bincount(sg_u[keepk], minlength=len(rows))
        s = e

    nw = (lens + 7) // 8
    wc = np.zeros(n, dtype=np.int64)
    wc[short] = nw[short] + 1
    wc[long_] = g_k_counts[long_] + 1
    word_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wc, out=word_offsets[1:])
    values = np.zeros(int(word_offsets[-1]), dtype=np.uint64)
    hdr = word_offsets[:-1]
    values[hdr[short]] = lens[short].astype(np.uint64)
    values[hdr[long_]] = np.uint64(1 << 63) | g_counts[long_].astype(np.uint64)

    si = np.flatnonzero(short)
    if len(si):
        pb_lens = nw[si] * 8
        pb_starts = np.concatenate([[0], np.cumsum(pb_lens)[:-1]])
        padded = np.zeros(int(pb_lens.sum()), dtype=np.uint8)
        padded[_ranges_to_indices(pb_starts, lens[si])] = data[
            _ranges_to_indices(offs[si], lens[si])
        ]
        values[_ranges_to_indices(word_offsets[si] + 1, nw[si])] = padded.view(
            np.uint64
        )
    if g_vals:
        values[_ranges_to_indices(word_offsets[li] + 1, g_k_counts[li])] = (
            np.concatenate(g_vals)
        )
    sk = pa.ListArray.from_arrays(
        pa.array(word_offsets.astype(np.int32), pa.int32()),
        pa.array(values, pa.uint64()),
    )
    if not valid.all():
        sk = pc.if_else(pa.array(~valid), pa.nulls(n, sk.type), sk)
    return sk


def caption_band_stage(batch: pa.Table, *, cfg: dict[str, Any]) -> pa.Table:
    """MinHash signatures + band keys for captions. Runs as a task-pool
    ``map_batches`` stage: the permutation matrix is lru-cached per worker
    process (``mh.permutations``), giving actor-style setup amortization
    with full task-slot parallelism and no pool ramp-up."""
    ngram = cfg["ngram"]
    num_perm = cfg["num_perm"]
    b, r = mh.optimal_param(cfg["lsh_threshold"], num_perm)
    cap_in = batch["caption"]
    if isinstance(cap_in, pa.ChunkedArray):
        cap_in = cap_in.combine_chunks()
    rid = batch[RID].to_numpy(zero_copy_only=False).astype(np.int64)
    if cfg["null_captions"] == "skip":
        # vectorized null/too-short filter (utf8_length is codepoint-exact
        # like len(str)) — no python row loop before the signature kernel
        m = pc.fill_null(pc.greater_equal(pc.utf8_length(cap_in), ngram), False)
        keep = np.flatnonzero(m.to_numpy(zero_copy_only=False))
        caps = cap_in.filter(m).to_pylist()
        rid = rid[keep]
    else:
        keep = np.arange(len(cap_in), dtype=np.int64)
        caps = cap_in.to_pylist()
    sketch_mode = cfg["caption_verify"] and cfg["verify_payload"] == "sketch"
    payload_col = "csk" if sketch_mode else "caption"
    payload_type = pa.list_(pa.uint64()) if sketch_mode else batch.schema.field("caption").type
    if not len(rid):
        cols = {RID: pa.array([], pa.int64()), "band": pa.array([], pa.int32()),
                "key": pa.array([], pa.uint64())}
        if cfg["caption_verify"]:
            cols[payload_col] = pa.array([], payload_type)
        return pa.table(cols)
    sigs = mh.batch_signatures(caps, ngram, num_perm, na_placeholder="na")
    keys = mh.band_keys(sigs, b, r)
    n = len(rid)
    cols = {
        RID: np.repeat(rid, b),
        "band": np.tile(np.arange(b, dtype=np.int32), n),
        "key": keys.reshape(-1),
    }
    if cfg["caption_verify"]:
        if sketch_mode:
            # bounded-width verify payload (≤ (k+1)*8 bytes per band row,
            # never the unbounded caption): captions that FIT the budget are
            # byte-packed verbatim (exact verification downstream); longer
            # captions carry a KMV bottom-k gram-hash sketch. Header word:
            # byte length (packed) or 2^63 | total-unique-grams (sketch).
            # Packing is batch-level (_pack_caption_sketches) — no per-row
            # python in this hottest map of the caption critical path.
            cap_col = batch["caption"]
            if isinstance(cap_col, pa.ChunkedArray):
                cap_col = cap_col.combine_chunks()
            sk = _pack_caption_sketches(
                cap_col.take(pa.array(keep, pa.int64())), ngram, cfg["sketch_k"]
            )
            cols["csk"] = sk.take(pa.array(np.repeat(np.arange(n), b), pa.int64()))
        else:
            # exact-verify mode: the full caption travels with its band rows
            # (arrow-native take — no python-object string churn)
            cap_col = batch["caption"]
            if isinstance(cap_col, pa.ChunkedArray):
                cap_col = cap_col.combine_chunks()
            cols["caption"] = cap_col.take(pa.array(np.repeat(keep, b), pa.int64()))
    return pa.table(cols)


def caption_verify_kernel(batch: pa.Table, sp: np.ndarray, dp: np.ndarray, *, ngram, tmin, cluster_nulls):
    """Exact byte-ngram Jaccard > tmin over candidate pair positions —
    sorted rolling-hash arrays, cached per involved row."""
    caps = batch["caption"].to_pylist()
    grams: dict[int, np.ndarray] = {}

    def g_of(pos: int) -> np.ndarray:
        g = grams.get(pos)
        if g is None:
            g = np.unique(sx.rolling_gram_hashes(caps[pos].encode("utf8"), ngram))
            grams[pos] = g
        return g

    mask = np.zeros(len(sp), dtype=bool)
    for i, (a, b) in enumerate(zip(sp.tolist(), dp.tolist())):
        ca, cb = caps[a], caps[b]
        if ca is None or cb is None:
            mask[i] = ca is None and cb is None and cluster_nulls
            continue
        ga, gb = g_of(a), g_of(b)
        if not len(ga) and not len(gb):
            mask[i] = True
            continue
        inter = len(np.intersect1d(ga, gb, assume_unique=True))
        union = len(ga) + len(gb) - inter
        mask[i] = bool(union) and inter / union > tmin
    return mask


# process-global memos for the sketch kernel: long-lived Ray workers see
# the same candidate pair in every band it collides in (up to b times,
# scattered across blocks) and the same ROW against different partners in
# different bands. Pair decisions and per-row gram entries are memoized
# keyed by (run_token, rid...) — rids are only stable within a run — and
# both tables are size-capped.
# (A per-ROW gram-set memo was tried and REVERTED: at 1M rows x 32 workers
# the dict churn + cap-clear thrash cost ~2x the whole caption stage;
# rebuilding gram sets vectorized per block is cheaper than caching them.)
_PAIR_DECISIONS: dict = {}
_PAIR_DECISIONS_MAX = 4_000_000
_PAIR_RUNS_MAX = 4


def _pair_memo(run_token: str) -> dict:
    """Per-run pair-decision memo (process-global across blocks — workers
    are long-lived). Up to ``_PAIR_RUNS_MAX`` runs coexist — concurrent
    pipelines sharing a cluster's workers interleave batches, and wiping
    the table on every token switch would zero BOTH runs' hit rates.
    Beyond the cap the OLDEST run's entries drop wholesale (dict insertion
    order), so stale runs can't pin memory and keys stay token-free."""
    memo = _PAIR_DECISIONS.get(run_token)
    if memo is None:
        while len(_PAIR_DECISIONS) >= _PAIR_RUNS_MAX:
            _PAIR_DECISIONS.pop(next(iter(_PAIR_DECISIONS)))
        memo = _PAIR_DECISIONS[run_token] = {}
    return memo


def _sorted_inter_count(ga: np.ndarray, gb: np.ndarray) -> int:
    """|A ∩ B| for sorted unique arrays via one searchsorted probe of the
    smaller into the larger — no concatenation re-sort per pair."""
    if len(ga) > len(gb):
        ga, gb = gb, ga
    if not len(ga) or not len(gb):
        return 0
    pos = np.searchsorted(gb, ga)
    np.minimum(pos, len(gb) - 1, out=pos)
    return int(np.count_nonzero(gb[pos] == ga))


def _sorted_member(g: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Boolean membership of ``probe`` in sorted unique array ``g``."""
    if not len(g):
        return np.zeros(len(probe), dtype=bool)
    pos = np.searchsorted(g, probe)
    np.minimum(pos, len(g) - 1, out=pos)
    return g[pos] == probe


def _sketch_entries(col, idxs: np.ndarray, ngram: int):
    """Verify metadata for the sketch payload column over the involved
    positions, built in ONE vectorized pass (the former per-pair lazy
    reconstruction paid a python ``rolling_gram_hashes`` call — with its
    errstate/powers setup — per candidate ROW, which dominated the whole
    caption stage).

    Returns ``(kind, cnt, grams)``: per-position arrays where kind is
    0 = byte-packed/exact, 1 = bottom-k sketch, 2 = null (uninvolved
    positions are 3 and must not be read); cnt is the total unique gram
    count; and ``grams`` maps position → sorted unique gram-hash array.
    Byte-packed payloads are gathered into one concatenated byte buffer,
    hashed with a single segmented rolling-hash call (cross-boundary
    windows masked), and uniqued per segment via one lexsort; sketched
    payloads are zero-copy views."""
    n = len(col)
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False)
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    HIGH = np.uint64(1 << 63)

    kind = np.full(n, 3, dtype=np.int8)
    cnt = np.zeros(n, dtype=np.int64)
    grams: dict[int, np.ndarray] = {}
    kind[idxs[~valid[idxs]]] = 2
    live = idxs[valid[idxs]]
    if not len(live):
        return kind, cnt, grams
    heads = vals[off[live]]
    is_long = (heads & HIGH) != 0
    longs = live[is_long]
    kind[longs] = 1
    cnt[longs] = (heads[is_long] & ~HIGH).astype(np.int64)
    for p in longs.tolist():
        grams[p] = vals[off[p] + 1 : off[p + 1]]  # bottom-k, sorted unique

    shorts = live[~is_long]
    kind[shorts] = 0
    if not len(shorts):
        return kind, cnt, grams
    blens = heads[~is_long].astype(np.int64)
    word_starts = off[shorts] + 1
    word_lens = off[shorts + 1] - word_starts
    packed = vals[_ranges_to_indices(word_starts, word_lens)]
    raw = packed.view(np.uint8)  # contiguous gather copy — safe to view
    byte_starts = np.concatenate([[0], np.cumsum(word_lens * 8)[:-1]])
    content = raw[_ranges_to_indices(byte_starts, blens)]
    seg_starts = np.zeros(len(shorts) + 1, dtype=np.int64)
    np.cumsum(blens, out=seg_starts[1:])
    ghash = sx._rolling_hashes_arr(content.astype(np.uint64) + np.uint64(1), ngram)
    if len(ghash):
        gpos = np.arange(len(ghash), dtype=np.int64)
        seg = np.searchsorted(seg_starts, gpos, side="right") - 1
        ok = gpos + ngram <= seg_starts[seg + 1]
        gs, sg = ghash[ok], seg[ok]
        order = np.lexsort((gs, sg))
        gs, sg = gs[order], sg[order]
        uq = np.ones(len(gs), dtype=bool)
        uq[1:] = (sg[1:] != sg[:-1]) | (gs[1:] != gs[:-1])
        gs_u, sg_u = gs[uq], sg[uq]
        counts = np.bincount(sg_u, minlength=len(shorts))
        parts = np.split(gs_u, np.cumsum(counts)[:-1])
    else:
        counts = np.zeros(len(shorts), dtype=np.int64)
        parts = [np.empty(0, dtype=np.uint64)] * len(shorts)
    cnt[shorts] = counts
    for p, g in zip(shorts.tolist(), parts):
        grams[p] = g
    return kind, cnt, grams


def caption_sketch_verify_kernel(
    batch: pa.Table, sp: np.ndarray, dp: np.ndarray, *, k, ngram, tmin, eps,
    cluster_nulls, run_token: str = ""
):
    """Adaptive-payload Jaccard verification, three-way decision:

    - both rows byte-packed (caption fit the k*8-byte budget) → EXACT
      char-ngram Jaccard, decided here;
    - any row sketched (long caption): first the exact length prune
      J <= min(|A|,|B|)/max(|A|,|B|) (unique-gram totals ride in the
      header), then the KMV estimate |bottom-k(A ∪ B) ∩ A ∩ B| / k —
      est > tmin+eps accepts, est <= tmin-eps rejects, the band between is
      *borderline* and returned separately for an exact confirmation pass
      (stderr ≈ sqrt(t(1-t)/k); eps ≈ 3σ keeps wrong direct decisions
      below ~0.1%).

    Returns (accept_mask, borderline_mask).

    A candidate pair recurs in every band it collides in (up to b times,
    scattered across blocks) — pair DECISIONS are memoized process-globally
    (workers are long-lived across blocks), keyed by row-id pair. Gram sets
    for every involved row are reconstructed UP FRONT in one vectorized
    pass (``_sketch_entries``) — per-pair lazy reconstruction paid a python
    rolling-hash call per row and dominated the caption stage."""
    col = batch["csk"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if RID in batch.column_names:
        rid_col = batch[RID].to_numpy(zero_copy_only=False)
        decided = _pair_memo(run_token)
    else:  # driver cross-block summary table: positions are already unique
        rid_col = np.arange(batch.num_rows, dtype=np.int64)
        decided = None
    P = len(sp)
    accept = np.zeros(P, dtype=bool)
    borderline = np.zeros(P, dtype=bool)
    if P == 0:
        return accept, borderline

    # 1) pair-decision memo first: a pair recurs in up to b bands, and a
    # memo hit skips that pair's gram reconstruction entirely. RID-less
    # callers (driver summary tables, pair-scope verify) guarantee
    # distinct pairs — a memo can never hit, so skip the python key loop.
    # Keys are canonical (lo, hi) rid pairs PACKED into one uint64 when
    # rids fit 32 bits (python-int hashing is ~3x a 3-tuple's; the tuple
    # path is the >2^32-rid fallback) — run_token no longer rides in the
    # key, the memo dict itself is per-run (_pair_memo).
    keys: list = []
    if decided is not None:
        ra = rid_col[sp]
        rb = rid_col[dp]
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        if int(lo.min()) >= 0 and int(hi.max()) < (1 << 32):
            packed = (lo.astype(np.uint64) << np.uint64(32)) | hi.astype(
                np.uint64
            )
            key_list = packed.tolist()
        else:
            key_list = list(zip(lo.tolist(), hi.tolist()))
        miss_idx: list[int] = []
        get = decided.get
        for i, key in enumerate(key_list):
            prev = get(key)
            if prev is None:
                keys.append(key)
                miss_idx.append(i)
            elif prev == 1:
                accept[i] = True
            elif prev == 2:
                borderline[i] = True
        if not miss_idx:
            return accept, borderline
        miss = np.asarray(miss_idx, dtype=np.int64)
    else:
        miss = np.arange(P, dtype=np.int64)
    msp, mdp = sp[miss], dp[miss]

    # 2) gram entries only for rows of unmemoized pairs
    kind, cnt, grams = _sketch_entries(
        col, np.unique(np.concatenate([msp, mdp])), ngram
    )

    # 3) vectorized decisions — most candidate pairs never reach python:
    # null pairs, both-empty-gram pairs, and the exact set-size bound
    # J <= min/max <= tmin (valid for exact AND sketched rows: inter <= min,
    # union >= max, so the rejection is identical to the per-pair branch)
    macc = np.zeros(len(miss), dtype=bool)
    mbrd = np.zeros(len(miss), dtype=bool)
    anull, bnull = kind[msp] == 2, kind[mdp] == 2
    has_null = anull | bnull
    if has_null.any():
        macc[has_null] = cluster_nulls & (anull & bnull)[has_null]
    na, nb = cnt[msp], cnt[mdp]
    both_empty = ~has_null & (na == 0) & (nb == 0)
    macc[both_empty] = True
    mn = np.minimum(na, nb)
    mx = np.maximum(na, nb)
    undecided = ~has_null & ~both_empty & (mn > tmin * mx)

    # 4) python loop only over pairs the bound could not decide. Gram
    # arrays are SORTED UNIQUE (see _sketch_entries), so intersections
    # and the KMV bottom-k come from searchsorted merges — identical
    # integer-exact decisions, ~2-3x cheaper than the former
    # intersect1d/union1d calls that re-sorted the concatenation per pair
    for j in np.flatnonzero(undecided).tolist():
        a, b = int(msp[j]), int(mdp[j])
        ga, gb = grams[a], grams[b]
        if kind[a] == 0 and kind[b] == 0:
            inter = _sorted_inter_count(ga, gb)
            union = int(na[j]) + int(nb[j]) - inter
            macc[j] = bool(union) and inter / union > tmin
        else:
            # bottom-k of the union needs only each side's k smallest
            # (both already sorted); the estimate counts bottom elements
            # present in BOTH sides — provably equal to the old
            # |bottom-k(A ∪ B) ∩ A ∩ B| on full arrays
            u = np.concatenate([ga[:k], gb[:k]])
            u.sort()
            if len(u):
                keep = np.empty(len(u), dtype=bool)
                keep[0] = True
                np.not_equal(u[1:], u[:-1], out=keep[1:])
                u = u[keep]
            kk = min(k, len(u))
            bottom = u[:kk]
            hits = int(
                np.count_nonzero(
                    _sorted_member(ga, bottom) & _sorted_member(gb, bottom)
                )
            )
            est = hits / kk
            if est > tmin + eps:
                macc[j] = True
            elif est > tmin - eps:
                mbrd[j] = True

    # 5) memo-write every miss decision (incl. vector-decided ones: a later
    # band hit then skips the pair AND its rows' gram reconstruction)
    if decided is not None:
        if len(decided) > _PAIR_DECISIONS_MAX:
            decided.clear()
        for key, av, bv in zip(keys, macc.tolist(), mbrd.tolist()):
            decided[key] = 1 if av else (2 if bv else 0)
    accept[miss] = macc
    borderline[miss] = mbrd
    return accept, borderline


def phash_verify_kernel(batch: pa.Table, sp: np.ndarray, dp: np.ndarray, *, maxh):
    """Vectorized Hamming <= maxh over candidate pair positions."""
    ph64 = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    return _popcount64(np.bitwise_xor(ph64[sp], ph64[dp])) <= maxh


# shared SWAR popcount kernel (also used by extras.dedup_text.simhash_dedup)
_popcount64 = ph.popcount64


def _broadcast_column(ds, rids: set[int], column: str) -> dict[int, Any]:
    """Fetch {rid: value} for a candidate rid set via a broadcast-filter
    map_batches (no shuffle; only matching rows leave the workers). The
    rid set is broadcast as a sorted array and applied with vectorized
    searchsorted membership."""
    want_arr = np.fromiter(rids, dtype=np.int64, count=len(rids))
    want_arr.sort()
    ref = ray.put(want_arr)

    def fil(batch: pa.Table) -> pa.Table:
        from liken_ray.engine.components import sorted_membership_mask

        want = ray.get(ref)
        rid = batch[RID].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = sorted_membership_mask(rid, want)
        return pa.table({RID: rid[mask], "v": batch[column].filter(pa.array(mask))})

    rows = ds.map_batches(fil, batch_format="pyarrow").take_all()
    return {r[RID]: r["v"] for r in rows}


def _confirm_borderline(ds, cfg, stats, exclude=None):
    """Exact char-ngram Jaccard decision over the sketch kernel's
    borderline pairs: fetch captions for ONLY the involved rows
    (O(borderline), not O(rows)), cache gram arrays per row, return the
    accepted pairs as a (src, dst) table (or None). ``exclude`` may be a
    set or a list of already-verified pairs; it is only materialized into
    a set when borderline pairs actually exist (the common zero-borderline
    case pays no O(edges) driver work)."""
    borderline = {(min(a, b), max(a, b)) for a, b in stats.get("borderline_pairs", [])}
    if not borderline:
        return None
    if exclude:
        borderline -= exclude if isinstance(exclude, set) else set(exclude)
    if not borderline:
        return None
    need = {r for p in borderline for r in p}
    caps = _broadcast_column(ds, need, "caption")
    grams: dict[int, np.ndarray | None] = {}

    def g_of(rid: int) -> np.ndarray | None:
        g = grams.get(rid, False)
        if g is False:
            c = caps.get(rid)
            g = None if c is None else np.unique(
                sx.rolling_gram_hashes(c.encode("utf8"), cfg["ngram"])
            )
            grams[rid] = g
        return g

    srcs: list[int] = []
    dsts: list[int] = []
    for a, b in borderline:
        ga, gb = g_of(a), g_of(b)
        if ga is None or gb is None:
            ok = ga is None and gb is None and cfg["null_captions"] == "cluster"
        elif not len(ga) and not len(gb):
            ok = True
        else:
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            union = len(ga) + len(gb) - inter
            ok = bool(union) and inter / union > cfg["verify_jaccard"]
        if ok:
            srcs.append(a)
            dsts.append(b)
    if not srcs:
        return None
    return pa.table(
        {"src": pa.array(srcs, pa.int64()), "dst": pa.array(dsts, pa.int64())}
    )


def _caption_edges_pair_verify(ds, cfg, ckpt: Checkpointer):
    """Caption edges with ``caption_verify_scope='pair'``: each DISTINCT
    candidate pair is verified exactly once.

    1. band keys shuffle WITHOUT payload (rid/band/key only — the sort
       moves ~20 B per band row instead of payload x b);
    2. raw candidate pairs are globally deduplicated (one (src,dst) sort —
       a pair colliding in c of b bands collapses from c verifications to
       one);
    3. sketch payloads are built ONCE per distinct endpoint rid and
       range-packed into object-store chunks (the ``_psnr_confirm_dataset``
       pattern: bounded object size, tasks fetch only touched ranges);
    4. a verify map over the distinct-pair Dataset reuses
       ``caption_sketch_verify_kernel`` (memo-free path), emitting accepted
       rows and a small borderline stream for the exact-confirm pass.

    Only meaningful for ``verify_payload='sketch'`` (exact mode would pack
    unbounded captions); the caller routes accordingly."""
    from ray.data.block import BlockAccessor

    from liken_ray.engine.blocking import bucket_edges_dataset, dedupe_edges_dataset

    bcfg = dict(cfg)
    bcfg["caption_verify"] = False  # band keys only, no payload column
    banded = ds.map_batches(
        caption_band_stage,
        fn_kwargs={"cfg": bcfg},
        batch_format="pyarrow",
        batch_size=cfg["batch_size"],
    )
    cand_ds = bucket_edges_dataset(
        banded,
        ["band", "key"],
        RID,
        pair_cap=cfg["bucket_pair_cap"],
        dedupe=False,
        materialize_before_sort=cfg.get("stage_barriers", True),
    )
    cand_ds = dedupe_edges_dataset(cand_ds).materialize()
    n_cand = cand_ds.count()

    def _finish(edges_ds, borderline_pairs, confirmed):
        ckpt.record(
            "caption_edges",
            verified_edges=edges_ds.count(),
            payload="sketch",
            verify_scope="pair",
            candidate_pairs=n_cand,
            borderline_pairs=borderline_pairs,
            borderline_confirmed=confirmed,
            payload_row_bytes=0,  # band rows carry no payload in pair scope
            summary_truncated=0,
            scope=cfg["edges_scope"],
        )
        if cfg["edges_scope"] == "dataset":
            return edges_ds
        out: list[tuple[int, int]] = []
        for b in edges_ds.iter_batches(batch_format="pyarrow", batch_size=None):
            out.extend(
                zip(
                    b["src"].to_numpy(zero_copy_only=False).tolist(),
                    b["dst"].to_numpy(zero_copy_only=False).tolist(),
                )
            )
        return out

    endpoints = _distinct_endpoints(cand_ds)
    if not len(endpoints):
        empty = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        ckpt.record("caption_pack", sketch_pack_chunks=0, sketch_pack_max_bytes=0)
        return _finish(empty, 0, 0)

    # --- pack sketch payloads for candidate endpoints only ---------------
    want_ref = ray.put(endpoints)
    ngram, k = cfg["ngram"], cfg["sketch_k"]

    def sketch_rows(batch: pa.Table) -> pa.Table:
        from liken_ray.engine.components import sorted_membership_mask

        want = ray.get(want_ref)
        rid = batch[RID].to_numpy(zero_copy_only=False).astype(np.int64)
        m = sorted_membership_mask(rid, want)
        if not m.any():
            return pa.table(
                {"rid_": pa.array([], pa.int64()),
                 "csk": pa.array([], pa.list_(pa.uint64()))}
            )
        caps = batch["caption"].filter(pa.array(m))
        if isinstance(caps, pa.ChunkedArray):
            caps = caps.combine_chunks()
        return pa.table({"rid_": rid[m], "csk": _pack_caption_sketches(caps, ngram, k)})

    n_chunks = max(1, -(-len(endpoints) // int(cfg.get("sketch_pack_rows", 16384))))
    sk_sorted = (
        ds.map_batches(sketch_rows, batch_format="pyarrow")
        .repartition(n_chunks)
        .sort("rid_")
        .materialize()
    )

    @ray.remote(num_returns=2)
    def _pack(block):
        t = BlockAccessor.for_block(block).to_arrow()
        rid = t["rid_"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(rid)
        rid = rid[o]
        col = t["csk"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)[o]
        starts, lens = off[:-1][o], (off[1:] - off[:-1])[o]
        buf = vals[_ranges_to_indices(starts, lens)] if len(o) else np.empty(0, np.uint64)
        offs = np.zeros(len(o) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        meta = (int(rid[0]), int(rid[-1]), int(offs[-1]) * 8) if len(rid) else None
        return meta, (rid, offs, buf, valid)

    payload_refs: list = []
    metas: list = []
    for bundle in sk_sorted.iter_internal_ref_bundles():
        for ref, bmeta in zip(bundle.block_refs, bundle.metadata):
            if bmeta.num_rows == 0:
                continue
            m_ref, p_ref = _pack.remote(ref)
            metas.append(m_ref)
            payload_refs.append(p_ref)
    metas = [m for m in ray.get(metas) if m is not None]
    if not metas:  # unreachable today (endpoints nonempty); keep verify safe
        empty = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        ckpt.record("caption_pack", sketch_pack_chunks=0, sketch_pack_max_bytes=0)
        return _finish(empty, 0, 0)
    ckpt_stats = {
        "sketch_pack_chunks": len(payload_refs),
        "sketch_pack_max_bytes": max((m[2] for m in metas), default=0),
    }
    lo = np.array([m[0] for m in metas], dtype=np.int64)
    hi = np.array([m[1] for m in metas], dtype=np.int64)
    bounds_ref = ray.put((lo, hi))

    vkwargs = dict(
        k=k,
        ngram=ngram,
        tmin=cfg["verify_jaccard"],
        eps=cfg["sketch_eps"],
        cluster_nulls=cfg["null_captions"] == "cluster",
    )

    def verify(t: pa.Table, refs=tuple(payload_refs)) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "bl": pa.array([], pa.int8())}
            )
        lo_, hi_ = ray.get(bounds_ref)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.concatenate([src, dst]))
        c = np.searchsorted(lo_, uniq, side="right") - 1
        ok = (c >= 0) & (uniq <= hi_[np.clip(c, 0, len(hi_) - 1)])
        need = np.unique(c[ok])
        packed = dict(zip(need.tolist(), ray.get([refs[int(i)] for i in need])))
        # rebuild a csk ListArray over the uniq endpoints (missing rids —
        # impossible by construction — become nulls and reject their pairs)
        word_lens = np.zeros(len(uniq), dtype=np.int64)
        validity = np.zeros(len(uniq), dtype=bool)
        pos_in_chunk = np.full(len(uniq), -1, dtype=np.int64)
        for ci in need.tolist():
            rid_s, offs_s, buf_s, valid_s = packed[ci]
            sel = np.flatnonzero((c == ci) & ok)
            p = np.clip(np.searchsorted(rid_s, uniq[sel]), 0, len(rid_s) - 1)
            hit = rid_s[p] == uniq[sel]
            sel, p = sel[hit], p[hit]
            pos_in_chunk[sel] = p
            word_lens[sel] = offs_s[p + 1] - offs_s[p]
            validity[sel] = valid_s[p]
        # gather words in uniq order (chunk locality: group by chunk)
        out_off = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(word_lens, out=out_off[1:])
        words = np.zeros(int(out_off[-1]), dtype=np.uint64)
        for ci in need.tolist():
            rid_s, offs_s, buf_s, _ = packed[ci]
            sel = np.flatnonzero((c == ci) & ok & (pos_in_chunk >= 0))
            if not len(sel):
                continue
            p = pos_in_chunk[sel]
            lens = offs_s[p + 1] - offs_s[p]
            words[_ranges_to_indices(out_off[sel], lens)] = buf_s[
                _ranges_to_indices(offs_s[p], lens)
            ]
        arr = pa.ListArray.from_arrays(
            pa.array(out_off.astype(np.int32), pa.int32()),
            pa.array(words, pa.uint64()),
        )
        if not validity.all():
            arr = pc.if_else(pa.array(~validity), pa.nulls(len(uniq), arr.type), arr)
        sp = np.searchsorted(uniq, src)
        dp = np.searchsorted(uniq, dst)
        acc, brd = caption_sketch_verify_kernel(
            pa.table({"csk": arr}), sp, dp, run_token="", **vkwargs
        )
        keep = acc | brd
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
                "bl": pa.array(brd[keep].astype(np.int8), pa.int8()),
            }
        )

    res = cand_ds.map_batches(verify, batch_format="pyarrow").materialize()

    # borderline pairs are a small stream (0 on typical corpora): collect
    # them for the exact-confirm pass, as the bucket-scope path does
    def _bl_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["bl"], pa.scalar(1, pa.int8()))).select(
            ["src", "dst"]
        )

    def _acc_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["bl"], pa.scalar(0, pa.int8()))).select(
            ["src", "dst"]
        )

    bl_rows = res.map_batches(_bl_only, batch_format="pyarrow").take_all()
    stats = {"borderline_pairs": [(r["src"], r["dst"]) for r in bl_rows]}
    confirmed_tbl = _confirm_borderline(ds, cfg, stats)
    verified = res.map_batches(_acc_only, batch_format="pyarrow")
    confirmed = 0
    if confirmed_tbl is not None:
        confirmed = confirmed_tbl.num_rows
        verified = verified.union(ray.data.from_arrow(confirmed_tbl))
    verified = verified.materialize()
    ckpt.record("caption_pack", **ckpt_stats)
    return _finish(verified, len(stats["borderline_pairs"]), confirmed)


def _caption_edges(ds, cfg, ckpt: Checkpointer) -> list[tuple[int, int]]:
    import functools

    if (
        cfg["caption_verify"]
        and cfg["verify_payload"] == "sketch"
        and cfg.get("caption_verify_scope", "bucket") == "pair"
    ):
        return _caption_edges_pair_verify(ds, cfg, ckpt)

    banded = ds.map_batches(
        caption_band_stage,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg["batch_size"],
    )
    verify_fn = None
    payload: list[str] = []
    if cfg["caption_verify"]:
        if cfg["verify_payload"] == "sketch":
            payload = ["csk"]
            verify_fn = functools.partial(
                caption_sketch_verify_kernel,
                k=cfg["sketch_k"],
                ngram=cfg["ngram"],
                tmin=cfg["verify_jaccard"],
                eps=cfg["sketch_eps"],
                cluster_nulls=cfg["null_captions"] == "cluster",
                run_token=cfg.get("_run_token", ""),
            )
        else:
            payload = ["caption"]
            verify_fn = functools.partial(
                caption_verify_kernel,
                ngram=cfg["ngram"],
                tmin=cfg["verify_jaccard"],
                cluster_nulls=cfg["null_captions"] == "cluster",
            )
    stats: dict[str, Any] = {}
    if cfg["edges_scope"] == "dataset":
        from liken_ray.engine.blocking import bucket_edges_dataset

        from liken_ray.engine.blocking import dedupe_edges_dataset

        # raw (un-deduped) edges so the borderline confirms union in BEFORE
        # the single global dedupe shuffle — a pair that is a verified edge
        # in one band and borderline in another would otherwise appear
        # twice (the driver path's exclude=set(out) equivalent)
        edges_ds = bucket_edges_dataset(
            banded,
            ["band", "key"],
            RID,
            pair_cap=cfg["bucket_pair_cap"],
            payload_cols=payload,
            verify_fn=verify_fn,
            stats=stats,
            dedupe=False,
            materialize_before_sort=cfg.get("stage_barriers", True),
        )
        confirmed_tbl = _confirm_borderline(ds, cfg, stats)
        if confirmed_tbl is not None:
            edges_ds = edges_ds.union(ray.data.from_arrow(confirmed_tbl))
        edges_ds = dedupe_edges_dataset(edges_ds).materialize()
        ckpt.record(
            "caption_edges",
            verified_edges=edges_ds.count(),
            payload=cfg["verify_payload"] if cfg["caption_verify"] else "none",
            summary_truncated=stats.get("summary_truncated", 0),
            borderline_pairs=len(stats.get("borderline_pairs", [])),
            scope="dataset",
        )
        return edges_ds
    edges = bucket_edges(
        banded,
        ["band", "key"],
        RID,
        pair_cap=cfg["bucket_pair_cap"],
        payload_cols=payload,
        verify_fn=verify_fn,
        stats=stats,
        materialize_before_sort=cfg.get("stage_barriers", True),
    )
    out = collect_edges(edges)

    # exact confirmation of the sketch uncertainty band (see
    # _confirm_borderline); pairs collide in up to b bands — dedupe first
    confirmed_tbl = _confirm_borderline(ds, cfg, stats, exclude=out)
    confirmed = 0
    if confirmed_tbl is not None:
        confirmed = confirmed_tbl.num_rows
        out.extend(
            zip(
                confirmed_tbl["src"].to_pylist(),
                confirmed_tbl["dst"].to_pylist(),
            )
        )

    ckpt.record(
        "caption_edges",
        verified_edges=len(out),
        payload=cfg["verify_payload"] if cfg["caption_verify"] else "none",
        # shuffle payload width per band row: bounded (k*8 B) in sketch
        # mode vs the unbounded caption string in exact mode
        payload_row_bytes=(
            cfg["sketch_k"] * 8
            if cfg["caption_verify"] and cfg["verify_payload"] == "sketch"
            else None
        ),
        summary_truncated=stats.get("summary_truncated", 0),
        borderline_pairs=len(stats.get("borderline_pairs", [])),
        borderline_confirmed=confirmed,
    )
    return out


def _image_band_stage(batch: pa.Table, *, bands: int) -> pa.Table:
    phv = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    keys = ph.phash_band_keys(phv, bands)
    rid = batch[RID].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(rid)
    return pa.table(
        {
            RID: np.repeat(rid, bands),
            "band": np.tile(np.arange(bands, dtype=np.int32), n),
            "key": keys.reshape(-1),
            "phash": np.repeat(phv.view(np.int64), bands),
        }
    )


def _distinct_endpoints(edges_ds) -> np.ndarray:
    """Distinct endpoint rids of an edge Dataset, deduplicated DISTRIBUTED
    (one sort shuffle + per-block adjacent-unique scans, the
    ``dedupe_edges_dataset`` pattern on one column) so the driver's peak is
    O(distinct candidates) — never O(edge endpoints): copies of a rid are
    globally adjacent after the sort; each block keeps its unique values
    except its FIRST (the only value that can continue from the previous
    block), and the O(blocks) distinct first values are added once."""

    def endpoints(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"r": np.unique(np.concatenate([src, dst]).astype(np.int64))})

    srt = edges_ds.map_batches(endpoints, batch_format="pyarrow").sort("r").materialize()

    def interior(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"r": pa.array([], pa.int64()), "f": pa.array([], pa.bool_())})
        r = t["r"].to_numpy(zero_copy_only=False)
        uniq = np.ones(len(r), dtype=bool)
        uniq[1:] = r[1:] != r[:-1]
        r = r[uniq]
        f = np.zeros(len(r), dtype=bool)
        f[0] = True
        return pa.table({"r": r, "f": f})

    parts: list[np.ndarray] = []
    firsts: set[int] = set()
    for b in srt.map_batches(
        interior, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        r = b["r"].to_numpy(zero_copy_only=False)
        f = b["f"].to_numpy(zero_copy_only=False)
        firsts.update(r[f].tolist())
        parts.append(r[~f])
    if firsts:
        parts.append(np.fromiter(firsts, dtype=np.int64, count=len(firsts)))
    if not parts:
        return np.empty(0, dtype=np.int64)
    # np.unique, not just sort: a rid run straddling a block boundary is
    # interior in one block AND first in the next, so it appears twice
    return np.unique(np.concatenate(parts))


def _psnr_confirm_dataset(edges_ds, ds, cfg, source, stats: dict | None = None):
    """Decoded-pixel PSNR confirmation for ``edges_scope='dataset'``.

    Deliberately NO ``Dataset.join``: Ray 2.49's hash join places an actor
    pool per join operator, and the 5-join formulation of this step
    deadlocked when run concurrently with the other modality stages on a
    small CPU budget (observed: stalls at 4 CPUs — aggregator actors and
    pending tasks starve each other). Instead everything is the repo's
    broadcast-semi-join idiom:

    1. distinct candidate endpoint rids deduped DISTRIBUTED (the driver
       peak is O(candidates), never O(edge endpoints) — see
       ``_distinct_endpoints``);
    2. candidate bytes re-read from the source with a broadcast
       membership filter (non-candidate bytes never leave storage) and
       decoded in the workers — pixels never touch the driver;
    3. decoded pixels are range-partitioned by rid (``psnr_pack_rows``
       candidates per range) and packed into ONE object-store buffer PER
       RANGE — no single whole-candidate-set allocation, so the largest
       object stays bounded however many candidates a corpus produces;
    4. a vectorized searchsorted kernel over the edge Dataset confirms
       each pair, fetching only the packed ranges its batch touches.

    Mirrors the driver path's semantics: missing or shape-mismatched
    pixels drop the pair; PSNR >= psnr_min_db keeps it."""
    from liken_ray.io.read import safe_read_parquet

    cand = _distinct_endpoints(edges_ds)
    if not len(cand):
        return edges_ds

    # rid -> image_id for candidates only (the byte re-read is keyed by
    # image_id; the pairs table carries no rid). O(candidates) ids on the
    # driver — ids, not pixels; the memory hog stays distributed.
    id_map = _broadcast_column(ds, cand, "image_id")
    ids_arr = np.array([id_map[int(r)] for r in cand if int(r) in id_map])
    rids_arr = np.array([r for r in cand if int(r) in id_map], dtype=np.int64)
    order = np.argsort(ids_arr)
    ids_sorted, rids_by_id = ids_arr[order], rids_arr[order]
    lookup_ref = ray.put((ids_sorted, rids_by_id))

    def decode(batch: pa.Table) -> pa.Table:
        ids_s, rids_s = ray.get(lookup_ref)
        ids = np.asarray(batch["image_id"].to_pylist())
        pos = np.clip(np.searchsorted(ids_s, ids), 0, len(ids_s) - 1)
        hit = ids_s[pos] == ids
        rids, pxs, hs, ws, cs = [], [], [], [], []
        sub = batch.filter(pa.array(hit))
        for r, rid_v in zip(sub.to_pylist(), rids_s[pos[hit]]):
            px = ph.decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
            pxs.append(px.astype(np.uint8, copy=False).tobytes())
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            cs.append(px.shape[2] if px.ndim == 3 else 0)
            rids.append(int(rid_v))
        return pa.table(
            {
                "rid_": pa.array(rids, pa.int64()),
                "px": pa.array(pxs, pa.binary()),
                "sh": pa.array(hs, pa.int32()),
                "sw": pa.array(ws, pa.int32()),
                "sc": pa.array(cs, pa.int32()),
            }
        )

    # range-partition by rid: repartition to the chunk count, then ONE sort
    # puts each chunk on a contiguous rid range (blocks of a sorted Dataset
    # are range partitions) — the shuffle moves candidate pixels only
    n_chunks = max(1, -(-len(cand) // int(cfg.get("psnr_pack_rows", 4096))))
    px_sorted = (
        safe_read_parquet(source, columns=["image_id", "bytes", "w", "h", "fmt"])
        .map_batches(decode, batch_format="pyarrow")
        .repartition(n_chunks)
        .sort("rid_")
        .materialize()
    )

    @ray.remote(num_returns=2)
    def _pack(block):
        from ray.data.block import BlockAccessor

        t = BlockAccessor.for_block(block).to_arrow()
        rid = t["rid_"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(rid)
        rid = rid[o]
        px_list = t["px"].to_pylist()
        lens = np.array([len(px_list[int(i)]) for i in o], dtype=np.int64)
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        buf = (
            np.frombuffer(b"".join(px_list[int(i)] for i in o), dtype=np.uint8)
            if len(lens)
            else np.empty(0, dtype=np.uint8)
        )
        shp = np.stack(
            [t[c].to_numpy(zero_copy_only=False).astype(np.int64)[o] for c in ("sh", "sw", "sc")],
            axis=1,
        ) if len(lens) else np.empty((0, 3), dtype=np.int64)
        meta = (int(rid[0]), int(rid[-1]), int(offs[-1])) if len(rid) else None
        return meta, (rid, offs, buf, shp)

    payload_refs: list = []
    metas: list = []
    for bundle in px_sorted.iter_internal_ref_bundles():
        for ref, bmeta in zip(bundle.block_refs, bundle.metadata):
            if bmeta.num_rows == 0:
                continue
            m_ref, p_ref = _pack.remote(ref)
            metas.append(m_ref)
            payload_refs.append(p_ref)
    metas = [m for m in ray.get(metas) if m is not None]
    if stats is not None:
        stats["psnr_pack_chunks"] = len(payload_refs)
        stats["psnr_pack_max_bytes"] = max((m[2] for m in metas), default=0)
    if not metas:
        return edges_ds.map_batches(
            lambda t: t.select(["src", "dst"]).slice(0, 0), batch_format="pyarrow"
        )
    lo = np.array([m[0] for m in metas], dtype=np.int64)
    hi = np.array([m[1] for m in metas], dtype=np.int64)
    bounds_ref = ray.put((lo, hi))

    # payload refs travel inside the task closure (borrowed-ref counting
    # keeps the packed objects alive); workers ray.get ONLY the ranges
    # their edge batch touches
    def confirm(t: pa.Table, refs=tuple(payload_refs)) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.select(["src", "dst"]).slice(0, 0)
        lo_, hi_ = ray.get(bounds_ref)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)

        def chunk_of(x: np.ndarray) -> np.ndarray:
            c = np.searchsorted(lo_, x, side="right") - 1
            ok = (c >= 0) & (x <= hi_[np.clip(c, 0, len(hi_) - 1)])
            return np.where(ok, c, -1)

        ca, cb = chunk_of(src), chunk_of(dst)
        need = np.unique(np.concatenate([ca[ca >= 0], cb[cb >= 0]]))
        packed = dict(zip(need.tolist(), ray.get([refs[int(i)] for i in need])))

        def find(x: np.ndarray, c: np.ndarray):
            pos = np.full(len(x), -1, dtype=np.int64)
            hit = np.zeros(len(x), dtype=bool)
            for ci in need:
                rid_s = packed[int(ci)][0]
                sel = c == ci
                p = np.clip(np.searchsorted(rid_s, x[sel]), 0, len(rid_s) - 1)
                h = rid_s[p] == x[sel]
                pos[sel] = p
                hit[sel] = h
            return pos, hit

        pa_pos, a_hit = find(src, ca)
        pb_pos, b_hit = find(dst, cb)
        keep = np.zeros(n, dtype=bool)
        both = a_hit & b_hit
        for i in np.flatnonzero(both):
            rid_a, offs_a, buf_a, shp_a = packed[int(ca[i])]
            rid_b, offs_b, buf_b, shp_b = packed[int(cb[i])]
            ai, bi = int(pa_pos[i]), int(pb_pos[i])
            if not (shp_a[ai] == shp_b[bi]).all():
                continue
            a = buf_a[offs_a[ai] : offs_a[ai + 1]]
            b = buf_b[offs_b[bi] : offs_b[bi + 1]]
            keep[i] = ph.psnr(a, b) >= cfg["psnr_min_db"]
        return t.select(["src", "dst"]).filter(pa.array(keep))

    return edges_ds.map_batches(confirm, batch_format="pyarrow")


def _image_edges(ds, cfg, ckpt: Checkpointer, source) -> list[tuple[int, int]]:
    import functools

    banded = ds.map_batches(
        _image_band_stage,
        fn_kwargs={"bands": cfg["phash_bands"]},
        batch_format="pyarrow",
        batch_size=cfg["batch_size"],
    )
    stats: dict[str, Any] = {}
    if cfg["edges_scope"] == "dataset":
        from liken_ray.engine.blocking import bucket_edges_dataset

        edges_ds = bucket_edges_dataset(
            banded,
            ["band", "key"],
            RID,
            pair_cap=cfg["bucket_pair_cap"],
            payload_cols=["phash"],
            verify_fn=functools.partial(phash_verify_kernel, maxh=cfg["max_hamming"]),
            stats=stats,
            materialize_before_sort=cfg.get("stage_barriers", True),
        ).materialize()
        record_kwargs: dict[str, Any] = {}
        hamming_verified = edges_ds.count()
        if cfg["psnr_verify"]:
            if isinstance(source, str):
                psnr_stats: dict[str, Any] = {}
                edges_ds = _psnr_confirm_dataset(
                    edges_ds, ds, cfg, source, stats=psnr_stats
                ).materialize()
                record_kwargs["psnr_confirmed"] = edges_ds.count()
                record_kwargs.update(psnr_stats)
            else:
                # bytes can only be re-read from a path source (the
                # ingested table is pruned to (rid, image_id, caption,
                # phash)); surface the conflict, don't silently skip
                record_kwargs["warning"] = (
                    "psnr_verify requires a parquet path source to re-read "
                    "image bytes; image edges are Hamming-verified only"
                )
        ckpt.record(
            "image_edges",
            hamming_verified=hamming_verified,
            summary_truncated=stats.get("summary_truncated", 0),
            scope="dataset",
            **record_kwargs,
        )
        return edges_ds
    edges = bucket_edges(
        banded,
        ["band", "key"],
        RID,
        pair_cap=cfg["bucket_pair_cap"],
        payload_cols=["phash"],
        verify_fn=functools.partial(phash_verify_kernel, maxh=cfg["max_hamming"]),
        stats=stats,
        materialize_before_sort=cfg.get("stage_barriers", True),
    )
    verified = collect_edges(edges)
    ckpt.record(
        "image_edges",
        hamming_verified=len(verified),
        summary_truncated=stats.get("summary_truncated", 0),
    )

    if not cfg["psnr_verify"] or not verified or source is None or not isinstance(source, str):
        return verified

    # decoded-pixel PSNR confirmation: re-read only candidate rows' bytes
    need = {r for p in verified for r in p}
    id_map = _broadcast_column(ds, need, "image_id")
    wanted_ids = set(id_map.values())
    ref = ray.put(wanted_ids)

    def fetch(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        ids = batch["image_id"].to_pylist()
        mask = pa.array([i in want for i in ids])
        return batch.filter(mask)

    from liken_ray.io.read import safe_read_parquet

    raw = (
        safe_read_parquet(source, columns=["image_id", "bytes", "w", "h", "fmt"])
        .map_batches(fetch, batch_format="pyarrow")
        .take_all()
    )
    px = {
        r["image_id"]: ph.decode_image(r["bytes"], r["w"], r["h"], r["fmt"]) for r in raw
    }
    confirmed = []
    for a, b in verified:
        pa_, pb_ = px.get(id_map[a]), px.get(id_map[b])
        if pa_ is None or pb_ is None:
            continue
        if pa_.shape == pb_.shape and ph.psnr(pa_, pb_) >= cfg["psnr_min_db"]:
            confirmed.append((a, b))
    ckpt.record("image_edges", psnr_confirmed=len(confirmed))
    return confirmed


def _substring_edges(ds, cfg, ckpt: Checkpointer) -> list[tuple[int, int]]:
    min_cap = cfg["long_caption_min"]
    gram_len, window = cfg["gram_len"], cfg["gram_window"]

    def fingerprints(batch: pa.Table) -> pa.Table:
        # batch-level winnowing: eligible captions are filtered with arrow
        # kernels, their utf8 bytes sliced zero-copy from the column
        # buffer, and ONE position-normalized rolling-hash + sliding-min
        # pass fingerprints the whole batch — no per-row Python, no
        # .tolist() list assembly (was the map's dominant cost)
        caps = batch["caption"]
        if isinstance(caps, pa.ChunkedArray):
            caps = caps.combine_chunks()
        eligible = pc.and_(
            pc.is_valid(caps), pc.greater_equal(pc.utf8_length(caps), min_cap)
        ).to_numpy(zero_copy_only=False)
        rid = batch[RID].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.flatnonzero(eligible)
        if len(sel) == 0:
            return pa.table(
                {RID: pa.array([], pa.int64()), "fp": pa.array([], pa.uint64())}
            )
        kept = caps.take(pa.array(sel, pa.int64()))
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        off_dtype = np.int64 if pa.types.is_large_string(kept.type) else np.int32
        raw_off = np.frombuffer(kept.buffers()[1], dtype=off_dtype)
        arrow_off = raw_off[kept.offset : kept.offset + len(kept) + 1].astype(np.int64)
        buf = np.frombuffer(kept.buffers()[2], dtype=np.uint8)[
            arrow_off[0] : arrow_off[-1]
        ]
        fps, row_off = sx.batch_gram_fingerprints(
            buf, arrow_off - arrow_off[0], gram_len, window
        )
        return pa.table(
            {
                RID: pa.array(
                    np.repeat(rid[sel], np.diff(row_off)), pa.int64()
                ),
                "fp": pa.array(fps, pa.uint64()),
            }
        )

    fp_ds = ds.map_batches(fingerprints, batch_format="pyarrow", batch_size=cfg["batch_size"])

    # per-partition suffix-array pass (Lee et al. 2021-style): exact
    # duplicate-substring detection at the tighter ``substring_min_len``
    # within each partition; the winnowing stage is the cross-partition
    # blocking for this stage
    sub_min = cfg["substring_min_len"]

    def sa_block(batch: pa.Table) -> pa.Table:
        caps = batch["caption"].to_pylist()
        rid = batch[RID].to_numpy(zero_copy_only=False)
        docs = [(int(r), c) for r, c in zip(rid, caps) if c is not None and len(c) >= min_cap]
        if len(docs) < 2:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        pairs = sx.duplicate_substring_pairs([c.encode("utf8") for _, c in docs], sub_min)
        return pa.table(
            {
                "src": pa.array([docs[i][0] for i, _ in pairs], pa.int64()),
                "dst": pa.array([docs[j][0] for _, j in pairs], pa.int64()),
            }
        )

    # a shared winnowing fingerprint IS a shared >= gram_len-byte substring
    # (the fingerprint is the rolling hash of an actual L-gram present in
    # both documents; collision risk ~2^-64 per gram pair — switch to a
    # 128-bit gram hash beyond ~10^10 docs). Star edges, no payload carry.
    # Winnowing guarantees recall for shared runs >= gram_len + window - 1
    # bytes — including ACROSS partitions.
    if cfg["edges_scope"] == "dataset":
        from liken_ray.engine.blocking import bucket_edges_dataset

        fp_edges = bucket_edges_dataset(
            fp_ds, ["fp"], RID, pair_cap=1,
            materialize_before_sort=cfg.get("stage_barriers", True),
        )
        sa_edges_ds = ds.map_batches(sa_block, batch_format="pyarrow", batch_size=None)

        def orient(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            return pa.table({"src": np.minimum(src, dst), "dst": np.maximum(src, dst)})

        out_ds = fp_edges.union(
            sa_edges_ds.map_batches(orient, batch_format="pyarrow")
        ).materialize()
        ckpt.record("substring_edges", substring_edges=out_ds.count(), scope="dataset")
        return out_ds

    edges = set(collect_edges(bucket_edges(
        fp_ds, ["fp"], RID, pair_cap=1,
        materialize_before_sort=cfg.get("stage_barriers", True),
    )))
    sa_edges = ds.map_batches(sa_block, batch_format="pyarrow", batch_size=None)
    edges.update(collect_edges(sa_edges))
    out = [(min(a, b), max(a, b)) for a, b in edges]
    ckpt.record("substring_edges", substring_edges=len(out))
    return out


def _assign_dataset_scope(ds, labels_ds):
    """Distributed endgame for the cluster-scale path: relabel every row and
    resolve cluster-representative image ids WITHOUT materializing the label
    array or a rep-id dict on the driver. Labels are bounded by dup volume —
    at the 10^12-row design point with a high dup fraction the label array
    IS the dataset, so the former broadcast (``ray.put`` of every clustered
    node's label + a python rep dict) was the one remaining scale-killer.

    Two sort-merge passes, each the repo's sort + segmented scan + O(blocks)
    boundary stitch — no ``Dataset.join`` (join aggregator actor pools
    deadlock under stage concurrency, see CLAUDE.md) and no Aggregate
    operator:

    1. **label attach**: union (k=node, tag=0, label) rows with (k=rid,
       tag=1, image_id) rows, ONE sort by (k, tag). Node ids are rids and
       both sides are unique, so every k-run is <=2 rows with the label row
       first; the only cross-block case — a label row ending block i with
       its data row opening block i+1 — is resolved from O(blocks) last-row
       summaries broadcast as a small dict.
    2. **rep resolve**: sort (rid, image_id, cluster_id) by (cluster_id,
       rid). A cluster's representative row (rid == cluster_id: labels are
       component-min rids and singletons label themselves) is its run's
       globally FIRST row, so inner runs fill ``cluster_image_id`` from
       their first row; only a block's first run can be a continuation
       (global sort contiguity) and fills from an O(blocks) driver map
       built from first/last-run summaries.
    """
    import ray.data

    # ---- pass 1: attach cluster labels to rows ----
    def data_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "k": batch[RID].cast(pa.int64()),
                "tag": pa.array(np.ones(n, dtype=np.int8)),
                "image_id": batch["image_id"],
                "label": pa.nulls(n, pa.int64()),
            }
        )

    def label_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "k": batch["node"].cast(pa.int64()),
                "tag": pa.array(np.zeros(n, dtype=np.int8)),
                "image_id": pa.nulls(n, pa.string()),
                "label": batch["label"].cast(pa.int64()),
            }
        )

    srt1 = (
        ds.map_batches(data_rows, batch_format="pyarrow")
        .union(labels_ds.map_batches(label_rows, batch_format="pyarrow"))
        .sort(["k", "tag"])
        .materialize()
    )

    def last_row(batch: pa.Table) -> pa.Table:
        sub = batch.select(["k", "tag", "label"])
        return sub.slice(max(0, batch.num_rows - 1))

    bmap: dict[int, int] = {}
    for r in srt1.map_batches(
        last_row, batch_format="pyarrow", batch_size=None
    ).take_all():
        if r["tag"] == 0:  # label row ends the block: its data row opens the next
            bmap[int(r["k"])] = int(r["label"])
    b_ref = ray.put(bmap)

    def emit_labelled(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    RID: pa.array([], pa.int64()),
                    "image_id": pa.array([], pa.string()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        k = batch["k"].to_numpy(zero_copy_only=False)
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        lab = pc.fill_null(batch["label"], -1).to_numpy(zero_copy_only=False)
        is_data = tag == 1
        cluster = k.copy()
        prev_is_label = np.zeros(len(k), dtype=bool)
        prev_is_label[1:] = (tag[:-1] == 0) & (k[:-1] == k[1:])
        take = is_data & prev_is_label
        idx = np.flatnonzero(take)
        cluster[idx] = lab[idx - 1]
        if is_data[0]:  # label row (if any) ended the previous block
            v = ray.get(b_ref).get(int(k[0]))
            if v is not None:
                cluster[0] = v
        m = pa.array(is_data)
        return pa.table(
            {
                RID: pa.array(k[is_data], pa.int64()),
                "image_id": batch["image_id"].filter(m),
                "cluster_id": pa.array(cluster[is_data], pa.int64()),
            }
        )

    labelled = srt1.map_batches(emit_labelled, batch_format="pyarrow", batch_size=None)

    # ---- pass 2: resolve cluster representative image ids ----
    srt2 = labelled.sort(["cluster_id", RID]).materialize()

    def summarize_reps(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "cid": pa.array([], pa.int64()),
                    "rrid": pa.array([], pa.int64()),
                    "img": pa.array([], pa.string()),
                }
            )
        cid = batch["cluster_id"].to_numpy(zero_copy_only=False)
        rid = batch[RID].to_numpy(zero_copy_only=False)
        last_start = (
            int(np.flatnonzero(cid != cid[-1]).max() + 1) if cid[0] != cid[-1] else 0
        )
        idx = pa.array([0, last_start], pa.int64())
        return pa.table(
            {
                "cid": pa.array(cid[[0, last_start]], pa.int64()),
                "rrid": pa.array(rid[[0, last_start]], pa.int64()),
                "img": batch["image_id"].take(idx),
            }
        )

    rep_map: dict[int, str] = {}
    for r in srt2.map_batches(
        summarize_reps, batch_format="pyarrow", batch_size=None
    ).take_all():
        if r["rrid"] == r["cid"]:  # this block holds the cluster's rep row
            rep_map[int(r["cid"])] = r["img"]
    rep_ref = ray.put(rep_map)

    def emit_assignments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "cluster_id": pa.array([], pa.int64()),
                    "cluster_image_id": pa.array([], pa.string()),
                }
            )
        cid = batch["cluster_id"].to_numpy(zero_copy_only=False)
        rid = batch[RID].to_numpy(zero_copy_only=False)
        img = batch["image_id"]
        if isinstance(img, pa.ChunkedArray):
            img = img.combine_chunks()
        starts = np.concatenate([[0], np.flatnonzero(cid[1:] != cid[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [len(cid)]]))
        rep_img = img.take(pa.array(np.repeat(starts, lens), pa.int64()))
        # only the block's FIRST run can lack its rep row (continuation of
        # a cluster whose rep lives in an earlier block)
        if rid[0] != cid[0]:
            fix = ray.get(rep_ref)[int(cid[0])]
            head = int(lens[0])
            mask = np.zeros(len(cid), dtype=bool)
            mask[:head] = True
            rep_img = pc.if_else(pa.array(mask), pa.scalar(fix, pa.string()), rep_img)
        return pa.table(
            {"image_id": img, "cluster_id": cid, "cluster_image_id": rep_img}
        )

    return srt2.map_batches(emit_assignments, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def run_flagship(
    source,
    config: dict[str, Any] | None = None,
    run_dir: str | None = None,
) -> dict[str, Any]:
    """Run the full pipeline. ``source`` = parquet path/dir or a Dataset.

    Returns {"assignments": Dataset(image_id, cluster_id, cluster_image_id),
    "metrics": {...}}. ``cluster_id`` is the rid of the cluster
    representative (min rid); singletons point at themselves.
    """
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)
    # the INPUT is part of a checkpoint's identity: resuming a run_dir
    # against a different source must invalidate, not silently return the
    # old corpus's results. Datasets (no stable path) hash to a sentinel
    # that still distinguishes them from any path string.
    hash_cfg = dict(cfg)
    hash_cfg["_source"] = source if isinstance(source, str) else "<dataset>"
    ckpt = Checkpointer(run_dir, hash_cfg)
    # scope for the workers' process-global pair-decision memo. A per-run
    # uuid is REQUIRED for correctness: rids are positional, path contents
    # can be rewritten between runs, and a recycled Dataset id() could
    # alias a previous run — so decisions are reused only within one run
    # (where the cross-band redundancy lives anyway)
    import uuid

    cfg["_run_token"] = f"{ckpt.cfg_hash}|{uuid.uuid4().hex}"
    if cfg["max_hamming"] > cfg["phash_bands"] - 1:
        # pigeonhole: banding only guarantees a bucket collision for pairs
        # within Hamming <= phash_bands-1; beyond that, recall is
        # probabilistic. Surfaced as a metric, not an error (a user may
        # accept probabilistic recall for the wider radius).
        ckpt.record(
            "config",
            warning=(
                f"max_hamming={cfg['max_hamming']} exceeds the banding recall "
                f"guarantee (phash_bands-1={cfg['phash_bands'] - 1}); image "
                "pairs beyond the guarantee collide only probabilistically"
            ),
        )

    t0 = time.perf_counter()
    ds = _ingest(source, cfg)
    n_rows = ds.count()
    ckpt.record("ingest", rows=n_rows, wall_s=round(time.perf_counter() - t0, 3))

    def edges_stage(name, fn, *args):
        def compute(stage_dir):
            edges = fn(*args)
            if isinstance(edges, list):
                edges_ds = ray.data.from_arrow(
                    pa.table(
                        {
                            "src": pa.array([e[0] for e in edges], pa.int64()),
                            "dst": pa.array([e[1] for e in edges], pa.int64()),
                        }
                    )
                )
            else:  # dataset scope: edges never touched the driver
                edges_ds = edges
            if stage_dir is not None:
                import os

                data_dir = os.path.join(stage_dir, "data")
                os.makedirs(data_dir, exist_ok=True)
                from liken_ray.io.read import safe_write_parquet

                safe_write_parquet(edges_ds, data_dir)
                if not os.listdir(data_dir):  # empty edge set wrote no files
                    import pyarrow.parquet as pq

                    pq.write_table(
                        pa.table({"src": pa.array([], pa.int64()),
                                  "dst": pa.array([], pa.int64())}),
                        os.path.join(data_dir, "edges.parquet"),
                    )
                from liken_ray.io.read import safe_read_parquet

                return safe_read_parquet(data_dir)
            return edges_ds

        return ckpt.stage(name, compute, inputs=["ingest"])

    # the three modality stages are independent Ray jobs — run them from
    # threads so their driver-side barriers (sort coordination, take_all)
    # overlap instead of serializing
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_cap = pool.submit(edges_stage, "caption_edges", _caption_edges, ds, cfg, ckpt)
        f_img = pool.submit(edges_stage, "image_edges", _image_edges, ds, cfg, ckpt, source)
        f_sub = pool.submit(edges_stage, "substring_edges", _substring_edges, ds, cfg, ckpt)
        cap_edges = f_cap.result()
        img_edges = f_img.result()
        sub_edges = f_sub.result()

    all_edges = cap_edges.union(img_edges).union(sub_edges).materialize()
    n_edges = all_edges.count()
    ckpt.record("components", edges=n_edges)

    t0 = time.perf_counter()
    cc_stats: dict = {}
    if n_edges <= cfg["edge_uf_limit"]:
        from liken_ray.engine.components import connected_components_edges_arrays

        srcs, dsts = [], []
        for batch in all_edges.iter_batches(batch_format="pyarrow", batch_size=None):
            if batch.num_rows:
                srcs.append(batch["src"].to_numpy(zero_copy_only=False))
                dsts.append(batch["dst"].to_numpy(zero_copy_only=False))
        if srcs:
            lab_keys, lab_vals = connected_components_edges_arrays(
                np.concatenate(srcs), np.concatenate(dsts)
            )
        else:
            lab_keys = lab_vals = np.empty(0, dtype=np.int64)
        ckpt.record(
            "components",
            wall_s=round(time.perf_counter() - t0, 3),
            labeled=len(lab_keys),
            **cc_stats,
        )

        # rep image ids for user-facing cluster labels; the relabel map is
        # broadcast as sorted parallel arrays and applied via searchsorted
        # (vectorized — no per-row dict lookups or python dict of V labels
        # anywhere on the driver)
        reps = set(np.unique(lab_vals).tolist())
        rep_ids = _broadcast_column(ds, reps, "image_id")
        lab_ref = ray.put((lab_keys, lab_vals))
        rep_ref = ray.put(rep_ids)

        def assign(batch: pa.Table) -> pa.Table:
            keys, vals = ray.get(lab_ref)
            rep = ray.get(rep_ref)
            rid = batch[RID].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = batch["image_id"].to_pylist()
            cluster = rid.copy()
            if len(keys):
                pos = np.searchsorted(keys, rid)
                pos_c = np.clip(pos, 0, len(keys) - 1)
                hit = keys[pos_c] == rid
                cluster[hit] = vals[pos_c[hit]]
            cluster_img = [rep.get(int(c), i) for c, i in zip(cluster, ids)]
            return pa.table(
                {
                    "image_id": pa.array(ids, pa.string()),
                    "cluster_id": cluster,
                    "cluster_image_id": pa.array(cluster_img, pa.string()),
                }
            )

        assignments = ds.map_batches(assign, batch_format="pyarrow")
    else:
        # cluster-scale endgame: labels NEVER reach the driver — relabel +
        # rep resolution run as two distributed sort-merges (see
        # _assign_dataset_scope); the driver holds only O(blocks) summaries
        labels_ds = connected_components_distributed(all_edges, stats=cc_stats)
        ckpt.record(
            "components",
            wall_s=round(time.perf_counter() - t0, 3),
            labeled=labels_ds.count(),
            **cc_stats,
        )
        assignments = _assign_dataset_scope(ds, labels_ds)

    def write_assignments(stage_dir):
        if stage_dir is not None:
            import os

            from liken_ray.io.read import safe_read_parquet, safe_write_parquet

            out = os.path.join(stage_dir, "data")
            safe_write_parquet(assignments, out)
            return safe_read_parquet(out)
        return assignments.materialize()

    result = ckpt.stage("assign", write_assignments, inputs=["components"])
    return {"assignments": result, "metrics": ckpt.summary(), "rows": n_rows, "edges": n_edges}
