"""Suffix-array substring-duplication kernels (Lee et al. 2021-style
substring dedup for long documents).

- ``suffix_array``: prefix-doubling construction, O(n log² n), pure numpy.
- ``duplicate_substring_pairs``: given a list of documents, build the
  suffix array over their separator-joined concatenation and emit document
  pairs that share a common substring of at least ``min_len`` bytes
  (adjacent-suffix LCP scan — two docs share an ≥L substring iff some pair
  of their suffixes, adjacent in suffix order, has LCP ≥ L).
- ``gram_fingerprints``: stride-sampled rolling-hash L-gram fingerprints for
  cross-partition blocking: any two docs sharing an ≥(2L)-byte substring
  share at least one sampled L-gram, so a ``groupby(fingerprint)`` shuffle
  co-locates cross-partition candidates which are then verified with the
  suffix-array kernel.
"""

from __future__ import annotations

import numpy as np

_SEP = 0  # document separator byte value sentinel (never matches content+1)


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 (or small-int) sequence via prefix doubling."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = data.astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        # sort by (rank[i], rank[i+k]) — argsort on composite via lexsort
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        # recompute ranks
        prev_r = rank[order]
        prev_r2 = rank2[order]
        change = np.ones(n, dtype=bool)
        change[1:] = (prev_r[1:] != prev_r[:-1]) | (prev_r2[1:] != prev_r2[:-1])
        tmp[order] = np.cumsum(change) - 1
        rank, tmp = tmp.copy(), rank
        sa = order
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa.astype(np.int64)


def _lcp_at_least(data: np.ndarray, i: int, j: int, min_len: int) -> bool:
    """True if suffixes at i and j share a common prefix of >= min_len bytes
    (bounded comparison — no full LCP needed)."""
    n = len(data)
    end = min(min_len, n - i, n - j)
    if end < min_len:
        return False
    return bool(np.array_equal(data[i : i + min_len], data[j : j + min_len]))


def duplicate_substring_pairs(
    docs: list[bytes], min_len: int = 50
) -> set[tuple[int, int]]:
    """Pairs (i < j) of documents sharing a common substring >= min_len."""
    if len(docs) < 2:
        return set()
    # concat with unique separator (shift content bytes by +1 so 0 is free)
    parts = []
    doc_of = []
    for di, d in enumerate(docs):
        arr = np.frombuffer(d, dtype=np.uint8).astype(np.int64) + 1
        parts.append(arr)
        parts.append(np.array([_SEP], dtype=np.int64))
        doc_of.append(np.full(len(arr) + 1, di, dtype=np.int64))
    data = np.concatenate(parts)
    owner = np.concatenate(doc_of)

    sa = suffix_array(data)
    n = len(data)
    # adjacent suffixes in SA order with LCP >= min_len and different
    # owners. Because LCP of non-adjacent suffixes is the min over the
    # interval, cross-doc repeats >= min_len always produce a run of
    # adjacent suffixes sharing the min_len-prefix. Prefix equality is
    # tested with O(n) per-document rolling hashes of the min_len-gram at
    # each offset (w.h.p. exact; ~2^-64 per adjacent pair) — positions
    # whose suffix is shorter than min_len, and separator positions, get a
    # unique sentinel so they never match.
    grams_global = np.empty(n, dtype=np.uint64)
    # unique never-matching sentinels: high bit + global position
    grams_global[:] = np.arange(n, dtype=np.uint64) | np.uint64(1 << 63)
    pos = 0
    for d in docs:
        g = rolling_gram_hashes(d, min_len)
        # clear the high bit so real grams never collide with sentinels
        grams_global[pos : pos + len(g)] = g & ~np.uint64(1 << 63)
        pos += len(d) + 1  # +1 for the separator
    g_sorted = grams_global[sa]
    eq = g_sorted[1:] == g_sorted[:-1]

    pairs: set[tuple[int, int]] = set()
    if not eq.any():
        return pairs
    # cross-owner ADJACENCIES within eq runs are enough: any run containing
    # k distinct owners yields adjacent cross-owner links that connect all
    # of them transitively (downstream union-find closes the components)
    o_prev = owner[sa[:-1]]
    o_next = owner[sa[1:]]
    cross = eq & (o_prev != o_next)
    if cross.any():
        a = o_prev[cross]
        b = o_next[cross]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        pairs.update(zip(lo.tolist(), hi.tolist()))
    return pairs


_GRAM_BASE = np.uint64(0x100000001B3)  # odd -> invertible mod 2^64


def _pow_mod64(base: np.uint64, n: int) -> np.ndarray:
    arr = np.full(n, base, dtype=np.uint64)
    arr[0] = 1
    with np.errstate(over="ignore"):
        return np.cumprod(arr, dtype=np.uint64)


def _inv_mod64(x: np.uint64) -> np.uint64:
    """Multiplicative inverse of an odd uint64 modulo 2^64 (Newton lift)."""
    with np.errstate(over="ignore"):
        inv = x  # correct mod 2^3
        for _ in range(5):
            inv = inv * (np.uint64(2) - x * inv)
    return inv


def rolling_gram_hashes(text: bytes, gram_len: int) -> np.ndarray:
    """Vectorized 64-bit polynomial rolling hashes of every ``gram_len``-byte
    window (wraparound arithmetic; base odd → invertible mod 2^64)."""
    arr = np.frombuffer(text, dtype=np.uint8).astype(np.uint64) + np.uint64(1)
    return _rolling_hashes_arr(arr, gram_len)


def rolling_char_gram_hashes(text: str, gram_len: int) -> np.ndarray:
    """Rolling hashes over UNICODE CODE POINTS (char n-grams, not byte
    n-grams) — parity with Python ``set(text[i:i+n])`` shingling for
    multibyte scripts."""
    arr = (
        np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        + np.uint64(1)
    )
    return _rolling_hashes_arr(arr, gram_len)


def _rolling_hashes_arr(arr: np.ndarray, gram_len: int) -> np.ndarray:
    n = len(arr)
    if n < gram_len:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers = _pow_mod64(_GRAM_BASE, n)
        weighted = arr * powers
        prefix = np.concatenate([[np.uint64(0)], np.cumsum(weighted, dtype=np.uint64)])
        inv = _inv_mod64(_GRAM_BASE)
        inv_powers = _pow_mod64(inv, n - gram_len + 1)
        grams = (prefix[gram_len:] - prefix[: n - gram_len + 1]) * inv_powers
        # avalanche so min-selection / bit-sampling is unbiased
        grams = grams * np.uint64(0x9E3779B97F4A7C15)
        grams ^= grams >> np.uint64(31)
        grams = grams * np.uint64(0xBF58476D1CE4E5B9)
        grams ^= grams >> np.uint64(27)
    return grams


def gram_fingerprints(text: bytes, gram_len: int = 50, window: int = 16) -> np.ndarray:
    """Winnowing fingerprints: rolling polynomial hashes of every
    ``gram_len``-byte gram, one minimum selected per ``window`` consecutive
    grams. Content-defined, so any two documents sharing a substring of at
    least ``gram_len + window - 1`` bytes share at least one fingerprint —
    the guarantee cross-partition blocking relies on."""
    grams = rolling_gram_hashes(text, gram_len)
    if len(grams) == 0:
        return grams
    if len(grams) <= window:
        return np.unique(grams.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(grams, window).min(axis=1)
    return np.unique(mins)


def longest_common_substring_len(a: bytes, b: bytes) -> int:
    """Exact longest common substring length of two byte strings via the
    suffix array of their concatenation."""
    pairs_len = 0
    arr_a = np.frombuffer(a, dtype=np.uint8).astype(np.int64) + 1
    arr_b = np.frombuffer(b, dtype=np.uint8).astype(np.int64) + 1
    data = np.concatenate([arr_a, np.array([_SEP], dtype=np.int64), arr_b])
    owner = np.concatenate(
        [np.zeros(len(arr_a) + 1, dtype=np.int64), np.ones(len(arr_b), dtype=np.int64)]
    )
    sa = suffix_array(data)
    n = len(data)
    for idx in range(1, len(sa)):
        i, j = int(sa[idx - 1]), int(sa[idx])
        if owner[i] == owner[j]:
            continue
        # direct LCP of the adjacent cross-owner suffixes
        limit = min(n - i, n - j)
        a_sl = data[i : i + limit]
        b_sl = data[j : j + limit]
        neq = np.nonzero(a_sl != b_sl)[0]
        lcp = int(neq[0]) if len(neq) else limit
        # do not count across the separator
        if _SEP in set(data[i : i + lcp].tolist()):
            sep_pos = np.nonzero(data[i : i + lcp] == _SEP)[0]
            lcp = int(sep_pos[0])
        pairs_len = max(pairs_len, lcp)
    return pairs_len


def batch_gram_fingerprints(
    buf: np.ndarray, offsets: np.ndarray, gram_len: int, window: int
):
    """Winnowing fingerprints for a whole BATCH of byte strings in one
    vectorized pass — per-row output identical to ``gram_fingerprints``
    (same hashes, ascending order).

    ``buf`` is the concatenated utf8/byte payload (uint8; an arrow string
    column's data buffer verbatim), ``offsets`` the (nrows+1) row bounds.
    Returns ``(fps, row_off)``: row ``r``'s fingerprints are
    ``fps[row_off[r]:row_off[r+1]]``.

    The polynomial gram hash at global position ``p`` is
    ``(prefix[p+L] - prefix[p]) * base^-p`` — position-normalized, so ONE
    weighted prefix sum over the concatenated buffer yields exactly the
    per-row hashes (the caption sketch stage's trick). Winnowing then runs
    as one strided sliding-min over a row-padded gram array (pads are
    uint64 max, and window STARTS are confined to each row's valid range,
    so no window ever reads another row), and per-row dedup+sort is one
    global lexsort + adjacent-equal mask — no per-row numpy, no Python
    loop anywhere.
    """
    nrows = len(offsets) - 1
    row_off = np.zeros(nrows + 1, dtype=np.int64)
    if len(buf) == 0 or nrows == 0:
        return np.empty(0, dtype=np.uint64), row_off
    arr = buf.astype(np.uint64) + np.uint64(1)
    n = len(arr)
    lens = np.diff(offsets)
    with np.errstate(over="ignore"):
        powers = _pow_mod64(_GRAM_BASE, n)
        prefix = np.concatenate(
            [[np.uint64(0)], np.cumsum(arr * powers, dtype=np.uint64)]
        )
        inv_powers = _pow_mod64(_inv_mod64(_GRAM_BASE), max(n - gram_len + 1, 1))

    # valid gram starts per row: offsets[r] .. offsets[r] + lens[r] - L
    gcounts = np.maximum(lens - gram_len + 1, 0)
    goff = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(gcounts, out=goff[1:])
    ngrams = int(goff[-1])
    if ngrams == 0:
        return np.empty(0, dtype=np.uint64), row_off
    local = np.arange(ngrams, dtype=np.int64) - np.repeat(goff[:-1], gcounts)
    starts = local + np.repeat(offsets[:-1], gcounts)
    with np.errstate(over="ignore"):
        grams = (prefix[starts + gram_len] - prefix[starts]) * inv_powers[starts]
        grams = grams * np.uint64(0x9E3779B97F4A7C15)
        grams ^= grams >> np.uint64(31)
        grams = grams * np.uint64(0xBF58476D1CE4E5B9)
        grams ^= grams >> np.uint64(27)

    # winnowing mins. Rows with 1..window grams emit ONE min (reduceat);
    # longer rows emit a sliding-window min per in-row window start.
    short = (gcounts > 0) & (gcounts <= window)
    long = gcounts > window
    mins_rows_parts = []
    mins_vals_parts = []
    if short.any():
        # reduceat over explicit (start, end) pairs — start-only indices
        # would swallow any LONG row's grams sitting between two short rows
        seg_starts = goff[:-1][short]
        seg_ends = seg_starts + gcounts[short]
        idx = np.empty(2 * len(seg_starts), dtype=np.int64)
        idx[0::2] = seg_starts
        idx[1::2] = seg_ends
        if idx[-1] == ngrams:  # reduceat rejects an index == len(grams)
            short_mins = np.minimum.reduceat(grams, idx[:-1])[0::2]
        else:
            short_mins = np.minimum.reduceat(grams, idx)[0::2]
        mins_rows_parts.append(np.flatnonzero(short).astype(np.int64))
        mins_vals_parts.append(short_mins)
    if long.any():
        # pad (window-1) MAX sentinels after each long row's gram run so
        # every window START inside a row stays inside it
        lcounts = np.where(long, gcounts, 0)
        pcounts = lcounts + np.where(long, window - 1, 0)
        poff = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(pcounts, out=poff[1:])
        padded = np.full(int(poff[-1]), np.uint64(0xFFFFFFFFFFFFFFFF))
        lrows = np.flatnonzero(long)
        rel = np.arange(int(lcounts.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lcounts[lrows])[:-1]]), lcounts[lrows]
        )
        padded[np.repeat(poff[:-1][lrows], lcounts[lrows]) + rel] = grams[
            np.repeat(goff[:-1][lrows], lcounts[lrows]) + rel
        ]
        # window min by doubling (log2(window) vectorized passes — ~2.5x
        # faster than a stride-view .min(axis=1) at this window size)
        np_len = len(padded)
        x = padded
        span = 1
        while span < window:
            step = min(span, window - span)
            np.minimum(x[: np_len - step], x[step:], out=x[: np_len - step])
            span += step
        win_mins = x
        wcounts = lcounts[lrows] - window + 1
        wrel = np.arange(int(wcounts.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(wcounts)[:-1]]), wcounts
        )
        sel = np.repeat(poff[:-1][lrows], wcounts) + wrel
        wvals = win_mins[sel]
        wrows = np.repeat(lrows, wcounts)
        # adjacent windows usually share their minimum — collapse equal
        # neighbours (within a row) BEFORE the global sort, cutting the
        # sort input by ~window x. Non-adjacent repeats fall to the final
        # unique mask, so the per-row fingerprint SET is unchanged.
        if len(wvals):
            adj = np.ones(len(wvals), dtype=bool)
            adj[1:] = (wvals[1:] != wvals[:-1]) | (wrows[1:] != wrows[:-1])
            wvals, wrows = wvals[adj], wrows[adj]
        mins_rows_parts.append(wrows)
        mins_vals_parts.append(wvals)
    rows_all = np.concatenate(mins_rows_parts)
    vals_all = np.concatenate(mins_vals_parts)
    # per-row unique + ascending order in one global lexsort
    order = np.lexsort((vals_all, rows_all))
    r_s, v_s = rows_all[order], vals_all[order]
    keep = np.ones(len(r_s), dtype=bool)
    keep[1:] = (r_s[1:] != r_s[:-1]) | (v_s[1:] != v_s[:-1])
    r_k, v_k = r_s[keep], v_s[keep]
    np.cumsum(np.bincount(r_k, minlength=nrows).astype(np.int64), out=row_off[1:])
    return v_k, row_off
