"""Training-data curation operators: deterministic dataset splits and
holdout decontamination.

- ``hash_split``: assign every row to a named split (train/val/test/...)
  by an avalanche hash of its id — deterministic, order-independent,
  cluster-size-independent (no shuffle, no sampling state), so the same
  row lands in the same split on every machine and every rerun. The hash
  is splitmix64 (public-domain finalizer, Steele et al. 2014), replicated
  verbatim in DuckDB SQL by ``__ray_entry__`` for the oracle gate.
- ``contamination_index`` / ``decontaminate``: flag (or drop) documents
  that share any whitespace-token n-gram with a holdout corpus — the
  benchmark-decontamination step of large LM data pipelines (the GPT-3
  appendix-C / Llama style n-gram overlap rule). The holdout side is the
  SMALL side: its distinct gram hashes are collected once and broadcast
  (``ray.put``), membership is a vectorized ``searchsorted`` per batch —
  no shuffle touches the big table.

No reference analogue (VictorAut/liken has no split/decontamination
surface); these serve the BASELINE.json training-pipeline axis.

Gram hashing is a windowed polynomial hash over the whitespace-normalized
byte buffer: per-row prefix sums of ``(byte+1) * BASE^pos`` wrap mod 2^64,
a window ``[s, e)`` hashes to ``(P[e] - P[s]) * BASE^-s`` (BASE is odd so
its inverse exists mod 2^64), then a 2-step multiply/xor avalanche. Two
n-grams collide with probability ~2^-64; the DuckDB oracle compares gram
STRINGS, so the hash path is checked end-to-end against exact semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from liken_ray.extras.text import _WS_RE

_BASE = np.uint64(0x100000001B3)  # shared with the stopword/fingerprint kernels
_BASE_INV = np.uint64(pow(int(_BASE), -1, 1 << 64))
_GOLDEN = 0x9E3779B97F4A7C15
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB

_POW_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _exact_ids(col, name: str) -> np.ndarray:
    """An id column as an EXACT int64 numpy array. Null-bearing int64
    arrow columns convert via float64 (garbling ids above 2^53), so null
    ids are rejected loudly — every op taking ``id_col`` keys its
    semantics on the id, and a null id has none."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(f"{name!r} contains nulls; row ids must be set")
    return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)


def _salt64(salt: int) -> np.uint64:
    """Any python int (incl. negative) as a wrapped uint64 — np.uint64(-1)
    is an OverflowError on numpy >= 2."""
    return np.uint64(salt & 0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 in, uint64 out."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(_GOLDEN)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_MIX1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_MIX2)
        return z ^ (z >> np.uint64(31))


def split_thresholds(
    weights: dict[str, float], buckets: int = 10_000
) -> list[tuple[str, int]]:
    """``{"train": .9, "val": .05, "test": .05}`` → cumulative integer
    bucket thresholds ``[("train", 9000), ("val", 9500), ("test", 10000)]``.
    Integer arithmetic so the Ray kernel and the SQL replica share EXACT
    boundaries."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"weights must sum to a positive value, got {total}")
    out: list[tuple[str, int]] = []
    acc = 0.0
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for split {name!r}: {w}")
        acc += w / total
        out.append((name, min(buckets, round(acc * buckets))))
    out[-1] = (out[-1][0], buckets)  # float-sum safety: last split absorbs
    return out


def hash_split(
    ds,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: int = 0,
    buckets: int = 10_000,
):
    """Add a ``split`` column chosen by ``splitmix64(id + salt) % buckets``
    against the cumulative thresholds of ``weights``. One streaming
    ``map_batches`` — no shuffle, no state; re-salting yields an
    independent re-split."""
    thresholds = split_thresholds(
        weights or {"train": 0.9, "val": 0.05, "test": 0.05}, buckets
    )
    names = [n for n, _ in thresholds]
    bounds = np.array([b for _, b in thresholds], dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        ids = _exact_ids(batch[id_col], id_col)
        with np.errstate(over="ignore"):
            h = splitmix64(ids.view(np.uint64) + _salt64(salt))
        bucket = (h % np.uint64(buckets)).astype(np.int64)
        idx = np.searchsorted(bounds, bucket, side="right")
        split = pa.DictionaryArray.from_arrays(
            pa.array(idx, pa.int32()), pa.array(names, pa.string())
        ).cast(pa.string())
        return batch.append_column("split", split)

    return ds.map_batches(assign, batch_format="pyarrow")


def _normalize_texts(texts: list) -> list[bytes]:
    return [
        b"" if t is None else _WS_RE.sub(" ", t.strip()).encode("utf8")
        for t in texts
    ]


_POW_CACHE_MAX = 1 << 22  # ~67 MB for the pair of tables


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(BASE^i, BASE^-i) for i in [0, n] — cached, grown geometrically.
    Tables above ``_POW_CACHE_MAX`` (one pathological multi-MB document
    would otherwise pin ~32 B per byte in every worker forever) are
    computed fresh and NOT cached."""
    key = 1 << max(int(n).bit_length(), 10)
    if key in _POW_CACHE:
        return _POW_CACHE[key]
    with np.errstate(over="ignore"):
        fwd = np.ones(key + 1, dtype=np.uint64)
        inv = np.ones(key + 1, dtype=np.uint64)
        np.multiply.accumulate(np.full(key, _BASE), out=fwd[1:])
        np.multiply.accumulate(np.full(key, _BASE_INV), out=inv[1:])
    if key <= _POW_CACHE_MAX:
        _POW_CACHE[key] = (fwd, inv)
    return fwd, inv


def gram_hashes(
    texts: list, n: int, return_lengths: bool = False, return_spans: bool = False
):
    """Whitespace-token ``n``-gram hashes for every row, fully vectorized
    after normalization. Returns ``(hashes, row_offsets)``: row ``r``'s
    grams are ``hashes[row_offsets[r]:row_offsets[r+1]]``. Rows with fewer
    than ``n`` tokens (incl. null/empty) contribute zero grams. With
    ``return_lengths`` a third array gives each gram's byte length (tokens
    plus the joining spaces — exactly ``strlen(gram)`` of the SQL replica).
    With ``return_spans`` the return is ``(hashes, row_offsets, s, e,
    buf)``: gram ``i``'s bytes are ``buf[s[i]:e[i]]`` (global coordinates
    into the concatenated normalized buffer) — what a caller needs to
    materialize gram STRINGS without per-gram Python.

    A gram IS a substring of the normalized text (tokens joined by single
    spaces), so gram hashes are windowed polynomial hashes over one
    concatenated byte buffer — no per-gram Python."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if return_lengths and return_spans:
        raise ValueError("return_lengths and return_spans are exclusive")
    nrows = len(texts)
    encs = _normalize_texts(texts)
    lens = np.fromiter((len(e) for e in encs), dtype=np.int64, count=nrows)
    offsets = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    row_off = np.zeros(nrows + 1, dtype=np.int64)
    zi = np.empty(0, dtype=np.int64)
    empty = (np.empty(0, dtype=np.uint64), row_off, zi)
    if return_spans:
        empty = (*empty[:2], zi, zi, np.empty(0, dtype=np.uint8))
    if total == 0:
        return empty if (return_lengths or return_spans) else empty[:2]

    buf = np.frombuffer(b"".join(encs), dtype=np.uint8)
    space = np.flatnonzero(buf == 0x20)
    space_row = np.searchsorted(offsets[1:], space, side="right")
    # token starts/ends per row, in global byte coordinates. Normalized
    # rows have single spaces and no edge spaces, so starts = row start +
    # each space+1; ends = each space + row end.
    starts_all = np.sort(np.concatenate([offsets[:-1][lens > 0], space + 1]))
    ends_all = np.sort(np.concatenate([space, offsets[1:][lens > 0]]))
    tok_counts = np.bincount(space_row, minlength=nrows) + (lens > 0)
    tok_off = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(tok_counts, out=tok_off[1:])

    gram_counts = np.maximum(tok_counts - (n - 1), 0) * (tok_counts >= n)
    np.cumsum(gram_counts, out=row_off[1:])
    ngrams = int(row_off[-1])
    if ngrams == 0:
        return empty if (return_lengths or return_spans) else empty[:2]

    # per-row-position weighted prefix sums (the fingerprint kernel's
    # pattern), then window extraction at token boundaries
    fwd, inv = _powers(int(lens.max()))
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
    with np.errstate(over="ignore"):
        weighted = (buf.astype(np.uint64) + np.uint64(1)) * fwd[pos]
        prefix = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(weighted, out=prefix[1:])

        row_rep = np.repeat(np.arange(nrows), gram_counts)
        within = np.arange(ngrams, dtype=np.int64) - np.repeat(
            row_off[:-1], gram_counts
        )
        s_idx = tok_off[row_rep] + within
        s = starts_all[s_idx]
        e = ends_all[s_idx + (n - 1)]
        h = (prefix[e] - prefix[s]) * inv[s - offsets[:-1][row_rep]]
        # avalanche so short grams spread over the full 64-bit space
        h = h * np.uint64(_MIX1)
        h ^= h >> np.uint64(31)
        h = h * np.uint64(_MIX2)
        h ^= h >> np.uint64(29)
    if return_lengths:
        return h, row_off, e - s
    if return_spans:
        return h, row_off, s, e, buf
    return h, row_off


def contamination_index(holdout_ds, text_col: str = "text", n: int = 3):
    """Distinct n-gram hashes of the holdout corpus as a broadcast-ready
    sorted uint64 array: per-block distinct sets stream back as small
    arrays; the driver unions them once. The holdout (benchmark/test
    suite) is the small side by construction — this is the broadcast
    semi-join pattern, not a shuffle."""

    def block_grams(batch: pa.Table) -> pa.Table:
        h, _ = gram_hashes(batch[text_col].to_pylist(), n)
        return pa.table({"g": np.unique(h)})

    parts = holdout_ds.map_batches(block_grams, batch_format="pyarrow").take_all()
    if parts:
        grams = np.unique(np.array([r["g"] for r in parts], dtype=np.uint64))
    else:
        grams = np.empty(0, dtype=np.uint64)
    # ship n with the grams: checking 3-gram hashes against a 13-gram
    # index would silently report zero contamination
    return ray.put((int(n), grams))


def decontaminate(
    ds,
    index_ref,
    text_col: str = "text",
    n: int = 3,
    id_col: str = "doc_id",
    mode: str = "flag",
):
    """Check every document's n-grams against a ``contamination_index``.

    ``mode="flag"`` emits ``(id_col, contaminated, n_hits)``;
    ``mode="drop"`` returns the input rows with contaminated ones removed
    (the pipeline form). One streaming pass; the index is fetched from the
    object store once per task."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")

    def check(batch: pa.Table) -> pa.Table:
        idx_n, grams = ray.get(index_ref)
        if idx_n != n:
            raise ValueError(
                f"decontaminate(n={n}) against an index built with "
                f"n={idx_n}: gram hashes would never match"
            )
        h, row_off = gram_hashes(batch[text_col].to_pylist(), n)
        if len(h) and len(grams):
            pos = np.searchsorted(grams, h)
            pos[pos == len(grams)] = 0
            hit = grams[pos] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        hits_per_row = _seg_counts(hit, row_off)
        if mode == "drop":
            return batch.filter(pa.array(hits_per_row == 0))
        return pa.table(
            {
                id_col: batch[id_col],
                "contaminated": pa.array(hits_per_row > 0),
                "n_hits": pa.array(hits_per_row, pa.int64()),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


def _seg_counts(hit: np.ndarray, row_off: np.ndarray) -> np.ndarray:
    """Per-row hit counts from a flat hit mask + row offsets (handles
    empty segments, which ``reduceat`` cannot)."""
    csum = np.zeros(len(hit) + 1, dtype=np.int64)
    np.cumsum(hit, out=csum[1:])
    return csum[row_off[1:]] - csum[row_off[:-1]]


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# (name, RE2 pattern, replacement token), applied IN ORDER. RE2 on both
# sides of the oracle gate: pyarrow.compute's replace_substring_regex and
# DuckDB's regexp_replace share the RE2 dialect, so the same pattern string
# scrubs identically in the engine and in SQL. Patterns are deliberately
# conservative (no lookaround — RE2 has none); email precedes ipv4/phone so
# a dotted domain is consumed as an email before the ip pattern sees it.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def pii_scrub(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str, str]] | None = None,
):
    """Redact PII-looking spans; one streaming vectorized pass, no shuffle.

    Emits ``(id_col, text_col scrubbed, n_<name> int64 per pattern)``.
    Counts are per-category matches against the ORIGINAL text (independent
    of scrub order); the scrub itself applies the patterns sequentially in
    list order. Everything is ``pyarrow.compute`` RE2 kernels — no Python
    touches a row."""
    pats = PII_PATTERNS if patterns is None else patterns

    def scrub(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        cols: dict = {id_col: batch[id_col]}
        out = col
        for name, pat, token in pats:
            # null text scrubs to null but COUNTS as zero matches (the
            # module's null convention: gram_hashes/repetition_stats also
            # treat null as empty)
            cols[f"n_{name}"] = pc.fill_null(
                pc.cast(pc.count_substring_regex(col, pat), pa.int64()), 0
            )
            out = pc.replace_substring_regex(out, pat, token)
        cols[text_col] = out
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style duplicate-line fractions)
# ---------------------------------------------------------------------------


def _line_hashes(flat: pa.Array) -> np.ndarray:
    """64-bit polynomial hash of every string in a flat StringArray —
    one prefix-sum over the gathered byte buffer, zero per-line Python.
    Length is mixed in so short prefixes don't collide with their
    extensions; equality-by-hash stands in for equality-by-value (the
    DuckDB oracle compares the strings themselves, so a collision would
    fail the gate — probability ~2^-64 per pair). Slice-safe: offsets are
    read relative to the array's own offset."""
    n = len(flat)
    off_dtype = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    raw_off = np.frombuffer(flat.buffers()[1], dtype=off_dtype)
    off = raw_off[flat.offset : flat.offset + n + 1].astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    starts, lens = off[:-1], np.diff(off)
    total = int(lens.sum())
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    if total == 0:
        h = np.zeros(n, dtype=np.uint64)
        return splitmix64(h ^ lens.astype(np.uint64))
    pos = np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], lens)
    buf = data[np.repeat(starts, lens) + pos]
    fwd, _ = _powers(int(lens.max()))
    with np.errstate(over="ignore"):
        weighted = (buf.astype(np.uint64) + np.uint64(1)) * fwd[pos]
        prefix = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(weighted, out=prefix[1:])
        h = prefix[out_off[1:]] - prefix[out_off[:-1]]
    return splitmix64(h ^ lens.astype(np.uint64))


def repetition_stats(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
):
    """Per-document duplicate-line statistics (the Gopher repetition
    filters' building block, Rae et al. 2021 §A1.1): emits
    ``(id_col, n_lines, n_distinct_lines, dup_line_bytes,
    total_line_bytes)`` as int64 — integer numerators/denominators so the
    oracle gate compares exact values, not float formatting. A line
    occurrence beyond the first identical one in the SAME document is a
    duplicate; ``dup_line_bytes`` sums those occurrences' byte lengths.

    One streaming pass: ``pc.split_pattern`` explodes lines (Arrow list),
    the flat child array is hashed in one prefix-sum, and per-document
    aggregation is a lexsort + segmented scans. No shuffle — repetition is
    an intra-document property."""
    def stats(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = pc.split_pattern(pc.coalesce(col, ""), line_sep)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        loff = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        loff = loff - loff[0]
        flat = lst.flatten()
        lens = pc.binary_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(flat)
        row = np.repeat(np.arange(n, dtype=np.int64), np.diff(loff))
        if m:
            h = _line_hashes(flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat)
            order = np.lexsort((h, row))
            hs, rs, ls = h[order], row[order], lens[order]
            first = np.ones(m, dtype=bool)
            first[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
            n_lines = np.bincount(rs, minlength=n)
            n_distinct = np.bincount(rs[first], minlength=n)
            dup_chars = np.bincount(rs[~first], weights=ls[~first], minlength=n).astype(np.int64)
            tot_chars = np.bincount(rs, weights=ls, minlength=n).astype(np.int64)
        else:
            n_lines = n_distinct = np.zeros(n, dtype=np.int64)
            dup_chars = tot_chars = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_distinct_lines": pa.array(n_distinct, pa.int64()),
                "dup_line_bytes": pa.array(dup_chars, pa.int64()),
                "total_line_bytes": pa.array(tot_chars, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def top_ngram_stats(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
):
    """Most-frequent word n-gram coverage (the remaining Gopher repetition
    filter, Rae et al. 2021 §A1.1): per document emits ``n_grams`` (total
    n-gram occurrences), ``top_gram_count`` (occurrences of the most
    frequent n-gram) and ``top_gram_cover_bytes`` (that count times the
    gram's byte length; count ties resolve to the larger product, making
    the output independent of gram ordering) — exact int64s, fractions
    left to the caller. Rows with fewer than ``n`` tokens emit zeros.

    One streaming pass; per-document aggregation is a lexsort + segmented
    scans over the flat gram-hash buffer (equality-by-hash stands in for
    equality-by-value; the SQL oracle groups the gram STRINGS, so a
    collision would fail the gate — probability ~2^-64 per pair)."""

    def stats(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        h, row_off, gl = gram_hashes(
            batch[text_col].to_pylist(), n, return_lengths=True
        )
        n_grams = np.diff(row_off)
        top_c = np.zeros(nrows, dtype=np.int64)
        cover = np.zeros(nrows, dtype=np.int64)
        m = len(h)
        if m:
            row = np.repeat(np.arange(nrows, dtype=np.int64), n_grams)
            order = np.lexsort((h, row))
            hs, rs, ls = h[order], row[order], gl[order]
            first = np.ones(m, dtype=bool)
            first[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
            gidx = np.cumsum(first) - 1  # group id per occurrence
            g_row = rs[first]
            g_len = ls[first]
            g_cnt = np.bincount(gidx)
            # segmented max over each row's contiguous group run
            g_first_of_row = np.ones(len(g_row), dtype=bool)
            g_first_of_row[1:] = g_row[1:] != g_row[:-1]
            rstarts = np.flatnonzero(g_first_of_row)
            top_c[g_row[rstarts]] = np.maximum.reduceat(g_cnt, rstarts)
            prod = np.where(g_cnt == top_c[g_row], g_cnt * g_len, 0)
            cover[g_row[rstarts]] = np.maximum.reduceat(prod, rstarts)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_grams": pa.array(n_grams, pa.int64()),
                "top_gram_count": pa.array(top_c, pa.int64()),
                "top_gram_cover_bytes": pa.array(cover, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def pack_offsets(
    ds,
    size_col: str = "n_chars",
    capacity: int = 4096,
    id_col: str = "doc_id",
    order_col: str | None = None,
):
    """Concat-and-chunk sequence-packing assignment (the LM-training
    pattern: documents are concatenated in a deterministic order and the
    stream is cut into fixed ``capacity``-sized windows). Emits
    ``(id_col, start_offset, bin)`` where ``start_offset`` is the global
    EXCLUSIVE running sum of ``size_col`` in ``order_col`` order (nulls
    count 0) and ``bin = start_offset // capacity`` — the window where the
    document STARTS, which is what a packer needs to route documents to
    shards/workers.

    ``order_col`` values must be UNIQUE (an id): the distributed sort has
    no defined secondary order for ties, so duplicate keys would make the
    packing order partition-dependent.

    A running sum is inherently sequential; distributed form: ONE sort by
    ``order_col`` (the only shuffle), a tiny per-block size-sum pass
    (O(blocks) scalars to the driver), then each block tags its rows with
    ``block offset + local exclusive cumsum`` independently. Same
    O(blocks)-stitch shape as ``ensure_row_id`` / ``sessionize``."""
    import ray
    import ray.data
    from ray.data.block import BlockAccessor

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    order_col = order_col or id_col
    srt = ds.sort(order_col).materialize()

    @ray.remote
    def block_sum(block) -> int:
        t = BlockAccessor.for_block(block).to_arrow()
        s = pc.sum(pc.fill_null(t[size_col].cast(pa.int64()), 0)).as_py()
        return int(s or 0)

    @ray.remote
    def tag(block, offset: int):
        t = BlockAccessor.for_block(block).to_arrow()
        sz = (
            pc.fill_null(t[size_col].cast(pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        start = np.full(len(sz), offset, dtype=np.int64)
        if len(sz) > 1:
            start[1:] += np.cumsum(sz[:-1])
        return pa.table(
            {
                id_col: t[id_col],
                "start_offset": pa.array(start, pa.int64()),
                "bin": pa.array(start // capacity, pa.int64()),
            }
        )

    # skip zero-row blocks: Ray's sort emits an empty block with an EMPTY
    # schema for empty input, which would KeyError in block_sum
    refs = [
        ref
        for bundle in srt.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    if not refs:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "start_offset": pa.array([], pa.int64()),
                "bin": pa.array([], pa.int64()),
            }
        )
        return ray.data.from_arrow(empty)
    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.zeros(len(sums) + 1, dtype=np.int64)
    np.cumsum(np.asarray(sums, dtype=np.int64), out=offsets[1:])
    return ray.data.from_arrow_refs(
        [tag.remote(r, int(o)) for r, o in zip(refs, offsets[:-1])]
    )


def _topk_per_run(code: np.ndarray, pr: np.ndarray, k: int) -> np.ndarray:
    """Positions of the k smallest priorities within each code run
    (negative codes excluded) — one lexsort + rank-within-run, no per-key
    Python. Returns indices into the input arrays."""
    order = np.lexsort((pr, code))
    cs = code[order]
    rank = np.arange(len(cs), dtype=np.int64)
    starts = np.zeros(len(cs), dtype=bool)
    if len(cs):
        starts[0] = True
        starts[1:] = cs[1:] != cs[:-1]
    run_start = np.maximum.accumulate(np.where(starts, rank, 0))
    return order[(rank - run_start < k) & (cs >= 0)]


def _broadcast_keep(ds, win_ref, id_col: str):
    """Filter a Dataset to rows whose id is in the broadcast sorted winner
    array (the decontaminate semi-join shape)."""

    def keep_rows(batch: pa.Table) -> pa.Table:
        from liken_ray.engine.components import sorted_membership_mask

        want = ray.get(win_ref)
        rid = _exact_ids(batch[id_col], id_col)
        return batch.filter(pa.array(sorted_membership_mask(rid, want)))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


def _sample_priorities(ids: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(ids.view(np.uint64) + _salt64(salt))


def hash_sample(
    ds,
    k: int,
    id_col: str = "doc_id",
    salt: int = 0,
):
    """Deterministic uniform sample WITHOUT a shuffle: every row gets the
    priority ``splitmix64(id + salt)`` and the k smallest priorities win —
    order-, partitioning- and rerun-independent (splitmix64 is a bijection
    on uint64, so priorities are unique per id and there are no ties).
    Distributed as a top-k combiner: each block streams back only its k
    smallest (id, priority) pairs, the driver merges O(blocks x k), and
    the winning ids filter the stream by a broadcast sorted-membership
    mask — the same semi-join shape as decontaminate. Re-salting draws an
    independent sample."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = _exact_ids(batch[id_col], id_col)
        pr = _sample_priorities(ids, salt)
        if len(pr) > k:
            keep = np.argpartition(pr, k)[:k]
            ids, pr = ids[keep], pr[keep]
        return pa.table(
            {"i": pa.array(ids, pa.int64()), "p": pa.array(pr, pa.uint64())}
        )

    parts = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    if not parts:
        return ds.filter(lambda row: False)
    ids = np.array([r["i"] for r in parts], dtype=np.int64)
    pr = np.array([r["p"] for r in parts], dtype=np.uint64)
    win = np.sort(ids[np.argsort(pr)[:k]])
    return _broadcast_keep(ds, ray.put(win), id_col)


def stratified_sample(
    ds,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: int = 0,
):
    """Deterministic per-key sample: the k smallest
    ``splitmix64(id + salt)`` priorities WITHIN each ``key_col`` value win
    (k per stratum, fewer if the stratum is smaller). Same combiner shape
    as ``hash_sample``, with the partial top-k computed per key inside
    each block (lexsort + rank-within-run — no per-key Python), so the
    driver merge is O(keys x blocks x k). Intended for low-cardinality
    strata (languages, sources, splits); for high-cardinality keys use a
    threshold on the priority instead (``hash_split`` semantics)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = _exact_ids(batch[id_col], id_col)
        pr = _sample_priorities(ids, salt)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        code = np.asarray(enc.indices.to_numpy(zero_copy_only=False))
        valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
        # null keys: indices come back as float NaN — coerce to -1 (dropped)
        code = np.where(valid, np.nan_to_num(code, nan=-1), -1).astype(np.int64)
        keep = _topk_per_run(code, pr, k)
        return pa.table(
            {
                "i": pa.array(ids[keep], pa.int64()),
                "p": pa.array(pr[keep], pa.uint64()),
                "key_": keys.take(pa.array(keep, pa.int64())),
            }
        )

    parts = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    if not parts:
        return ds.filter(lambda row: False)
    pr = np.array([r["p"] for r in parts], dtype=np.uint64)
    ids = np.array([r["i"] for r in parts], dtype=np.int64)
    keys = pa.array([r["key_"] for r in parts])
    code = np.asarray(
        keys.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    win = np.sort(ids[_topk_per_run(code, pr, k)])
    return _broadcast_keep(ds, ray.put(win), id_col)


# ---------------------------------------------------------------------------
# cross-corpus exact dedup with a Bloom prefilter
# ---------------------------------------------------------------------------


def _bloom_positions(h: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(k_hashes, n) bit positions for 64-bit keys — k independent
    splitmix64 draws, masked to the power-of-two table (no division)."""
    out = np.empty((k_hashes, len(h)), dtype=np.uint64)
    mask = np.uint64(m_bits - 1)
    with np.errstate(over="ignore"):
        for j in range(k_hashes):
            out[j] = splitmix64(h ^ _salt64(101 + j)) & mask
    return out


def _text_hashes(col) -> np.ndarray:
    """64-bit hash of every string in a column; null hashes like ''
    (the module's null convention — SQL twin: ``coalesce(text, '')``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return _line_hashes(pc.fill_null(col, ""))


def bloom_build(
    ref_ds, text_col: str = "text", m_bits: int = 1 << 20, k_hashes: int = 2
) -> np.ndarray:
    """Bloom filter over a corpus's (hashed) texts as a packed uint64
    bitmap. Per-block bitmaps stream back and the driver ORs them —
    O(m_bits/8) driver memory, O(blocks x m_bits/8) network. On a real
    cluster with many blocks, swap the driver OR for a tree reduce of
    ``ray.remote`` OR tasks; the per-block kernel is unchanged."""
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    words = m_bits // 64

    def block_bloom(batch: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        h = _text_hashes(batch[text_col])
        idx = _bloom_positions(h, m_bits, k_hashes).reshape(-1)
        np.bitwise_or.at(
            bm, (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63))
        )
        return pa.table({"bm": pa.array([bm], pa.list_(pa.uint64()))})

    bloom = np.zeros(words, dtype=np.uint64)
    parts = ref_ds.map_batches(block_bloom, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        col = b["bm"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.uint64).reshape(-1, words)
        bloom |= np.bitwise_or.reduce(flat, axis=0)
    return bloom


def cross_corpus_dedup(
    ds,
    ref_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_hashes: int = 2,
):
    """Drop rows of ``ds`` whose ``text_col`` appears (exactly) in
    ``ref_ds`` — the "have we already trained on this?" operator, EXACT
    anti-join semantics at Bloom cost.

    Why not ``decontaminate``-style broadcast: the reference corpus at
    100 TB does not fit a broadcast. Why not a plain distributed
    anti-join: it would shuffle |ds| + |ref| rows. The Bloom filter
    prunes the shuffle to |ref| + |bloom hits| hashes:

      1. Build a bitmap over ref's text hashes (``bloom_build``),
         broadcast it once via ``ray.put``.
      2. One streaming pass over ``ds``: bloom MISSES are definitely
         novel and never shuffle (at a sane ``m_bits`` that is almost
         every unique row). Hits — true dups plus the filter's false
         positives — are CANDIDATES.
      3. Exact confirm of the candidates: union (ref hashes, candidate
         hashes) sorted by (hash, side) — ref rows sort first within a
         run, so a candidate is a true dup iff a ref row appears earlier
         in its hash run. Per-block segmented check; runs straddling
         block boundaries are resolved by an O(blocks) has-ref carry
         chain on the driver (the sort-scan stitch idiom).
      4. Confirmed dup ids broadcast as a sorted array; one filter pass
         keeps misses and unconfirmed candidates. (Dup volume bounds the
         broadcast; for extreme dup fractions swap step 4 for the
         flagship's distributed sort-merge relabel.)

    Equality is by 64-bit text hash (collision ~2^-64 per pair, same
    convention as ``repetition_stats``; the DuckDB oracle compares the
    strings themselves so a collision would fail the gate). Null text
    equals the empty string on both sides.
    """
    bloom = bloom_build(ref_ds, text_col, m_bits=m_bits, k_hashes=k_hashes)
    bloom_ref = ray.put(bloom)

    def probe(batch: pa.Table) -> pa.Table:
        h = _text_hashes(batch[text_col])
        bm = ray.get(bloom_ref)
        idx = _bloom_positions(h, m_bits, k_hashes)
        hit = np.ones(len(h), dtype=bool)
        for j in range(k_hashes):
            w = bm[(idx[j] >> np.uint64(6)).astype(np.int64)]
            hit &= (w >> (idx[j] & np.uint64(63))) & np.uint64(1) != 0
        return batch.append_column("_xc_h", pa.array(h, pa.uint64())).append_column(
            "_xc_hit", pa.array(hit)
        )

    tagged = ds.map_batches(probe, batch_format="pyarrow").materialize()
    cand = tagged.map_batches(
        lambda t: t.filter(t["_xc_hit"]), batch_format="pyarrow"
    )
    if cand.count() == 0:
        return tagged.drop_columns(["_xc_h", "_xc_hit"])

    def ref_part(batch: pa.Table) -> pa.Table:
        h = np.unique(_text_hashes(batch[text_col]))
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "side": pa.array(np.zeros(len(h), dtype=np.int8)),
                "cid": pa.array(np.full(len(h), -1, dtype=np.int64)),
            }
        )

    def cand_part(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": batch["_xc_h"],
                "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
                "cid": batch[id_col].cast(pa.int64()),
            }
        )

    unioned = ref_ds.map_batches(ref_part, batch_format="pyarrow").union(
        cand.map_batches(cand_part, batch_format="pyarrow")
    )
    srt = unioned.sort(["h", "side"]).materialize()
    refs = [
        ref
        for bundle in srt.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]

    @ray.remote
    def confirm(block, prev_h: int | None, prev_carry: bool):
        """Confirmed-dup candidate ids in this block, plus the chain state
        for the next block: (last h, does the last run contain a ref row).
        A carry from the previous block applies only if its last hash run
        continues into this block (``h[0] == prev_h``)."""
        from ray.data.block import BlockAccessor

        t = BlockAccessor.for_block(block).to_arrow()
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = t["side"].to_numpy(zero_copy_only=False)
        n = len(h)
        change = np.ones(n, dtype=bool)
        change[1:] = h[1:] != h[:-1]
        seg = np.cumsum(change) - 1
        pos = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(change, pos, 0))
        # ref rows sort first in a run: candidate confirmed iff a ref row
        # exists EARLIER in its run (or carried in from the previous block)
        last_ref = np.maximum.accumulate(np.where(side == 0, pos, -1))
        seen_ref = last_ref >= run_start
        if prev_carry and prev_h is not None and int(h[0]) == prev_h:
            seen_ref |= seg == 0
        dup_ids = t["cid"].to_numpy(zero_copy_only=False)[(side == 1) & seen_ref]
        # seen_ref[-1] includes the last row itself when it IS a ref row
        return np.asarray(dup_ids, dtype=np.int64), int(h[-1]), bool(seen_ref[-1])

    # chain pass: blocks are globally sorted by hash, so the has-ref carry
    # for a run spanning blocks flows strictly left to right — O(blocks)
    # sequential ray.get, each task O(block)
    dup_parts: list[np.ndarray] = []
    prev_h: int | None = None
    prev_carry = False
    for r in refs:
        dups, prev_h, prev_carry = ray.get(confirm.remote(r, prev_h, prev_carry))
        dup_parts.append(dups)
    dup_ids = (
        np.unique(np.concatenate(dup_parts)) if dup_parts else np.empty(0, np.int64)
    )

    win_ref = ray.put(dup_ids)

    def keep_rows(batch: pa.Table) -> pa.Table:
        from liken_ray.engine.components import sorted_membership_mask

        rid = _exact_ids(batch[id_col], id_col)
        drop = sorted_membership_mask(rid, ray.get(win_ref))
        return batch.filter(pa.array(~drop)).drop_columns(["_xc_h", "_xc_hit"])

    return tagged.map_batches(keep_rows, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-level n-gram statistics (vocabulary / document-frequency table)
# ---------------------------------------------------------------------------


def _gram_strings(buf: np.ndarray, s: np.ndarray, e: np.ndarray) -> pa.Array:
    """Materialize gram byte spans as ONE pyarrow string array: a single
    fancy-index gather + from_buffers — no per-gram Python. Spans are
    token-aligned in the normalized utf8 buffer, so slicing is
    codepoint-safe."""
    lens = (e - s).astype(np.int64)
    out_off = np.zeros(len(s) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    take = np.repeat(s, lens) + (
        np.arange(int(out_off[-1]), dtype=np.int64) - np.repeat(out_off[:-1], lens)
    )
    data = buf[take] if len(take) else np.empty(0, dtype=np.uint8)
    return pa.Array.from_buffers(
        pa.large_utf8(),
        len(s),
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(data.tobytes())],
    )


def corpus_ngram_counts(
    ds,
    n: int = 2,
    min_count: int = 2,
    text_col: str = "text",
):
    """Corpus-wide n-gram vocabulary table: ``(gram, cnt, df)`` for every
    whitespace-token n-gram with total occurrence count >= ``min_count``
    (``df`` = number of documents containing it — the IDF/CCNet building
    block).

    Gram cardinality is corpus-sized, so this is exactly the shape the
    repo's perf law forbids ``groupby().aggregate()`` for. Instead:

      1. Per-batch partial combine (lexsort + run scans): each batch emits
         one row per DISTINCT gram — (hash, cnt, df, gram string) — so the
         shuffle carries combiner output, not raw grams. df partials sum
         cleanly because a document lives in exactly one batch.
      2. ONE global sort by hash (the only shuffle).
      3. Per-block segmented sums; a block's interior runs are final,
         its first/last runs (the only ones that can straddle a block
         boundary) go to the driver — O(blocks) rows — and are merged
         there (the ``synthesize_ray`` stitch shape).

    Equality is by the 64-bit gram hash (collision ~2^-64 per pair; the
    DuckDB oracle groups by the gram STRINGS, so a collision would fail
    the gate). Gram strings ride along as ONE representative per distinct
    hash per batch."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    import ray.data

    def partials(batch: pa.Table) -> pa.Table:
        h, row_off, s, e, buf = gram_hashes(
            batch[text_col].to_pylist(), n, return_spans=True
        )
        nrows = batch.num_rows
        if len(h) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "cnt": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.large_utf8()),
                }
            )
        row_rep = np.repeat(
            np.arange(nrows, dtype=np.int64), np.diff(row_off).astype(np.int64)
        )
        order = np.lexsort((row_rep, h))
        hs, rs = h[order], row_rep[order]
        new_h = np.ones(len(hs), dtype=bool)
        new_h[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(new_h)
        ends = np.r_[starts[1:], len(hs)]
        cnt = ends - starts
        new_doc = new_h.copy()
        new_doc[1:] |= rs[1:] != rs[:-1]
        csum = np.zeros(len(hs) + 1, dtype=np.int64)
        np.cumsum(new_doc, out=csum[1:])
        df = csum[ends] - csum[starts]
        first = order[starts]
        return pa.table(
            {
                "h": pa.array(hs[starts], pa.uint64()),
                "cnt": pa.array(cnt, pa.int64()),
                "df": pa.array(df, pa.int64()),
                "gram": _gram_strings(buf, s[first], e[first]),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow")
    srt = parts.sort("h").materialize()

    def seg_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.large_utf8()),
                    "cnt": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "_edge": pa.array([], pa.bool_()),
                    "_h": pa.array([], pa.uint64()),
                }
            )
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        new_h = np.ones(len(h), dtype=bool)
        new_h[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new_h)
        ends = np.r_[starts[1:], len(h)]
        ccs = np.zeros(len(h) + 1, dtype=np.int64)
        np.cumsum(cnt, out=ccs[1:])
        dcs = np.zeros(len(h) + 1, dtype=np.int64)
        np.cumsum(df, out=dcs[1:])
        gram = t["gram"]
        if isinstance(gram, pa.ChunkedArray):
            gram = gram.combine_chunks()
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = True
        edge[-1] = True
        return pa.table(
            {
                "gram": gram.take(pa.array(starts, pa.int64())),
                "cnt": pa.array(ccs[ends] - ccs[starts], pa.int64()),
                "df": pa.array(dcs[ends] - dcs[starts], pa.int64()),
                "_edge": pa.array(edge),
                "_h": pa.array(h[starts], pa.uint64()),
            }
        )

    blocks = srt.map_batches(seg_sum, batch_format="pyarrow", batch_size=None)
    blocks = blocks.materialize()
    inner = blocks.map_batches(
        lambda t: t.filter(
            pc.and_(pc.invert(t["_edge"]), pc.greater_equal(t["cnt"], min_count))
        ).drop_columns(["_edge", "_h"]),
        batch_format="pyarrow",
    )
    edge_rows = blocks.map_batches(
        lambda t: t.filter(t["_edge"]), batch_format="pyarrow"
    ).take_all()
    merged: dict[int, dict] = {}
    for r in sorted(edge_rows, key=lambda r: r["_h"]):
        cur = merged.setdefault(r["_h"], {"gram": r["gram"], "cnt": 0, "df": 0})
        cur["cnt"] += r["cnt"]
        cur["df"] += r["df"]
    keep = [v for v in merged.values() if v["cnt"] >= min_count]
    stitched = pa.table(
        {
            "gram": pa.array([v["gram"] for v in keep], pa.large_utf8()),
            "cnt": pa.array([v["cnt"] for v in keep], pa.int64()),
            "df": pa.array([v["df"] for v in keep], pa.int64()),
        }
    )
    return inner.union(ray.data.from_arrow(stitched))


# ---------------------------------------------------------------------------
# deterministic global shuffle order
# ---------------------------------------------------------------------------


def shuffle_positions(ds, id_col: str = "doc_id", salt: int = 0):
    """Deterministic global shuffle for training-data serving: each row's
    ``pos`` is the rank of ``splitmix64(id + salt)`` over the WHOLE
    dataset — a reproducible random permutation that is independent of
    partitioning, block order and reruns (splitmix64 is a uint64
    bijection, so ids are totally ordered with no ties; change ``salt``
    for a fresh epoch order).

    ONE sort by the hash is the only shuffle; per-block base offsets come
    from block METADATA (no scan, no driver materialization — the
    ``pack_offsets`` running-sum idiom), and each block then tags its rows
    independently. Returns ``(id_col, pos)``."""
    import ray
    import ray.data
    from ray.data.block import BlockAccessor

    def keyize(batch: pa.Table) -> pa.Table:
        ids = _exact_ids(batch[id_col], id_col)
        h = splitmix64(ids.view(np.uint64) + _salt64(salt))
        return pa.table(
            {id_col: batch[id_col], "_sh": pa.array(h, pa.uint64())}
        )

    srt = ds.map_batches(keyize, batch_format="pyarrow").sort("_sh").materialize()
    pairs = [
        (ref, meta.num_rows)
        for bundle in srt.iter_internal_ref_bundles()
        for ref, meta in zip(bundle.block_refs, bundle.metadata)
        if meta.num_rows
    ]
    if not pairs:
        sch = ds.schema()
        id_type = getattr(sch, "base_schema", sch).field(id_col).type
        return ray.data.from_arrow(
            pa.table({id_col: pa.array([], id_type), "pos": pa.array([], pa.int64())})
        )
    bases = np.concatenate([[0], np.cumsum([c for _, c in pairs])[:-1]])

    @ray.remote
    def tag(block, base: int):
        t = BlockAccessor.for_block(block).to_arrow()
        return pa.table(
            {
                id_col: t[id_col],
                "pos": pa.array(
                    base + np.arange(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    return ray.data.from_arrow_refs(
        [tag.remote(ref, int(b)) for (ref, _), b in zip(pairs, bases)]
    )


# ---------------------------------------------------------------------------
# common-gram coverage (CCNet-style corpus-frequency quality signal)
# ---------------------------------------------------------------------------


def common_gram_coverage(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    top_k: int = 100,
):
    """Per-document coverage by the corpus's ``top_k`` most frequent
    word n-grams — the CCNet-flavored signal that separates natural
    running text (high common-gram share) from boilerplate/gibberish.
    Returns ``(id, n_grams, common_grams)``; divide driver-side for the
    float fraction.

    Two composed passes of existing machinery: (1) ``corpus_ngram_counts``
    builds the global vocabulary (partial combine -> one sort -> stitch);
    its top-``k`` rows by (cnt desc, gram asc) are selected by per-block
    LOCAL top-k + an O(blocks x k) driver merge (a global top-k element is
    in its block's top-k). (2) The winners' polynomial hashes (rehashed
    with the SAME gram hash the vocabulary used) broadcast via ``ray.put``
    once, and a second streaming pass counts per-document membership by
    searchsorted — no second shuffle, no join."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    import ray
    import ray.data

    counts = corpus_ngram_counts(ds, n=n, min_count=1, text_col=text_col)

    def local_topk(t: pa.Table) -> pa.Table:
        t = t.select(["gram", "cnt"])
        if t.num_rows <= top_k:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("gram", "ascending")]
        )
        return t.take(idx.slice(0, top_k))

    pool = counts.map_batches(local_topk, batch_format="pyarrow").take_all()
    pool.sort(key=lambda r: (-r["cnt"], r["gram"]))
    top_grams = [r["gram"] for r in pool[:top_k]]
    # rehash the winning gram STRINGS with the vocabulary's own hash: each
    # gram is exactly n tokens, so it contributes exactly one hash
    th, _ = gram_hashes(top_grams, n)
    top_ref = ray.put(np.sort(th))

    def coverage(batch: pa.Table) -> pa.Table:
        top = ray.get(top_ref)
        h, row_off = gram_hashes(batch[text_col].to_pylist(), n)
        nrows = batch.num_rows
        totals = np.diff(row_off).astype(np.int64)
        if len(h) and len(top):
            pos = np.searchsorted(top, h)
            pos_c = np.clip(pos, 0, len(top) - 1)
            hit = (top[pos_c] == h).astype(np.int64)
            row_rep = np.repeat(np.arange(nrows, dtype=np.int64), totals)
            common = np.bincount(row_rep, weights=hit, minlength=nrows).astype(
                np.int64
            )
        else:
            common = np.zeros(nrows, dtype=np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_grams": pa.array(totals, pa.int64()),
                "common_grams": pa.array(common, pa.int64()),
            }
        )

    return ds.map_batches(coverage, batch_format="pyarrow")


def line_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    min_len: int = 0,
):
    """C4-style corpus-wide exact segment dedup: split every document on
    ``delim``, keep only the globally FIRST occurrence of each distinct
    segment (ordered by ``(id, position)``), and reassemble each document
    from its surviving segments in original order. Returns a Dataset of
    ``(id_col, text_col)`` with one row per input document — a document
    whose every segment was dropped comes back as ``""``; a null input
    text stays null. Segments shorter than ``min_len`` codepoints are
    exempt (always kept, never dedupe others) — the C4 rule only targets
    boilerplate-length lines.

    Plan (all established idioms — no groupby, no Dataset.join):
      1. vectorized explode in ``map_batches``: ``split_pattern`` +
         ``list_flatten``, positions from offsets arithmetic;
      2. ONE range sort by ``(variant, segment, id, pos)`` — the global
         first of each segment run is its block-local run start, corrected
         across block boundaries by an O(blocks) ident chain (variant 0 =
         dedupable, 1 = short-exempt, 2 = null-doc placeholder);
      3. a second range sort by ``(id, pos)`` and a per-block vectorized
         reassembly (``binary_join`` over offsets), ``num_returns=2``:
         interior documents stay in the object store; only the two
         boundary fragments per block reach the driver, which stitches
         documents spanning blocks (O(blocks) fragments, each bounded by
         one document's text).

    At 100 TB the only payload shuffled is the segment text itself (twice
    — the classic price of exact corpus-level dedup); driver state is
    O(blocks x max-doc-bytes) from the boundary fragments.

    Reference: the C4 dataset's three-sentence/line dedup (Raffel et al.,
    "Exploring the Limits of Transfer Learning", JMLR 2020, §2.2) — no
    analogue in /root/reference; part of the SURVEY §2.7 LLM-curation
    surface.
    """
    if not delim:
        raise ValueError("delim must be a non-empty string")
    if min_len < 0:
        raise ValueError(f"min_len must be >= 0, got {min_len}")
    from ray.data.block import BlockAccessor

    from liken_ray.extras.joins import _schema, _to_arrow_blocks
    from liken_ray.extras.relational import (
        _nonempty_block_refs,
        _sentinel_ident,
        _sentinel_key_change,
    )

    ds = _to_arrow_blocks(ds)
    schema = _schema(ds)
    for c in (text_col, id_col):
        if c not in schema.names:
            raise KeyError(f"column {c!r} not in dataset ({list(schema.names)})")
    txt_type = schema.field(text_col).type

    def explode(batch: pa.Table) -> pa.Table:
        ids = _exact_ids(batch[id_col], id_col)
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        nullm = pc.is_null(txt).to_numpy(zero_copy_only=False)
        segs = pc.split_pattern(pc.fill_null(txt, ""), delim)
        lens = pc.list_value_length(segs).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(segs)
        total = int(lens.sum())
        rep_ids = np.repeat(ids, lens)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:] if len(lens) > 1 else starts[:0])
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        variant = np.repeat(nullm.astype(np.uint8) * 2, lens)
        if min_len > 0:
            short = (
                pc.utf8_length(flat).to_numpy(zero_copy_only=False) < min_len
            )
            variant = np.where((variant == 0) & short, 1, variant).astype(np.uint8)
        return pa.table(
            {
                "_ld_id": pa.array(rep_ids, pa.int64()),
                "_ld_pos": pa.array(pos, pa.int64()),
                "_ld_seg": flat,
                "_ld_v": pa.array(variant),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    srt1 = exploded.sort(["_ld_v", "_ld_seg", "_ld_id", "_ld_pos"]).materialize()
    refs1 = _nonempty_block_refs(srt1)
    if not refs1:
        out_schema = pa.schema(
            [pa.field(id_col, pa.int64()), pa.field(text_col, txt_type)]
        )
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def seg_summary(block) -> tuple:
        t = BlockAccessor.for_block(block).to_arrow()
        return (
            _sentinel_ident(t, "_ld_v", "_ld_seg", 0),
            _sentinel_ident(t, "_ld_v", "_ld_seg", t.num_rows - 1),
        )

    idents = ray.get([seg_summary.remote(r) for r in refs1])
    dup_first = [False]
    for i in range(1, len(idents)):
        dup_first.append(idents[i][0] == idents[i - 1][1])
    # a run spanning 3+ blocks: middle blocks' first ident equals the
    # PREVIOUS block's last ident transitively — the pairwise check above
    # already covers it (each middle block starts with the same ident)

    @ray.remote
    def mark_keep(block, dup0: bool):
        t = BlockAccessor.for_block(block).to_arrow()
        change = _sentinel_key_change(t, "_ld_v", "_ld_seg")
        keep = change.copy()
        if dup0:
            keep[0] = False
        v = t["_ld_v"].to_numpy(zero_copy_only=False)
        keep[v == 1] = True
        keep[v == 2] = False
        return t.append_column("_ld_keep", pa.array(keep))

    flagged = ray.data.from_arrow_refs(
        [mark_keep.remote(r, d) for r, d in zip(refs1, dup_first)]
    )
    srt2 = flagged.sort(["_ld_id", "_ld_pos"]).materialize()
    refs2 = _nonempty_block_refs(srt2)

    @ray.remote(num_returns=2)
    def reassemble(block):
        t = BlockAccessor.for_block(block).to_arrow()
        ids = t["_ld_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        change = np.ones(n, dtype=bool)
        if n > 1:
            change[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(change)
        keep = t["_ld_keep"].to_numpy(zero_copy_only=False)
        v = t["_ld_v"].to_numpy(zero_copy_only=False)
        kept_per_run = np.add.reduceat(keep.astype(np.int64), starts)
        null_run = np.add.reduceat((v == 2).astype(np.int64), starts) > 0
        seg = t["_ld_seg"]
        if isinstance(seg, pa.ChunkedArray):
            seg = seg.combine_chunks()
        flat_kept = seg.filter(pa.array(keep))
        offsets = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(kept_per_run, out=offsets[1:])
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), flat_kept.cast(pa.large_string())
            ),
            pa.scalar(delim, pa.large_string()),
        )
        joined = pc.fill_null(joined, "")
        texts = pc.if_else(
            pa.array(null_run), pa.scalar(None, pa.large_string()), joined
        ).cast(txt_type)
        run_ids = ids[starts]
        nruns = len(starts)
        frag_idx = [0] if nruns == 1 else [0, nruns - 1]
        frags = [
            {
                "id": int(run_ids[i]),
                "text": texts[i].as_py(),
                "nkept": int(kept_per_run[i]),
                "isnull": bool(null_run[i]),
            }
            for i in frag_idx
        ]
        interior = pa.table(
            {
                id_col: pa.array(run_ids[1 : nruns - 1], pa.int64()),
                text_col: texts.slice(1, max(0, nruns - 2)),
            }
        )
        return interior, frags

    interior_refs = []
    frag_refs = []
    for r in refs2:
        ib, fb = reassemble.remote(r)
        interior_refs.append(ib)
        frag_refs.append(fb)
    frag_lists = ray.get(frag_refs)
    merged: list[dict] = []
    for frags in frag_lists:
        for f in frags:
            if merged and merged[-1]["id"] == f["id"]:
                a = merged[-1]
                if a["isnull"] or f["isnull"]:
                    a["isnull"] = True
                    a["text"] = None
                elif a["nkept"] and f["nkept"]:
                    a["text"] = a["text"] + delim + f["text"]
                elif f["nkept"]:
                    a["text"] = f["text"]
                a["nkept"] += f["nkept"]
            else:
                merged.append(dict(f))
    boundary = pa.table(
        {
            id_col: pa.array([f["id"] for f in merged], pa.int64()),
            text_col: pa.array(
                [None if f["isnull"] else f["text"] for f in merged], pa.string()
            ).cast(txt_type),
        }
    )
    return ray.data.from_arrow_refs(interior_refs).union(
        ray.data.from_arrow(boundary)
    )
