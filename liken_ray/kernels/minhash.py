"""MinHash + LSH band parameter kernels, bit-compatible with the public
``datasketch`` scheme (the library the reference uses:
``/root/reference/src/liken/dedupers/lsh.py:48-66`` builds
``datasketch.MinHash(num_perm)`` / ``MinHashLSH(threshold, num_perm)``).

Everything here is re-derived from the published datasketch algorithm
description (Broder's MinHash with universal hashing ``(a*h+b) mod p`` over
the Mersenne prime ``2^61-1`` truncated to 32 bits, permutations drawn from
``numpy.random.RandomState(seed=1)``, token hash = first 4 LE bytes of SHA1)
so that the same (ngram, num_perm, threshold) config produces the same band
buckets — the reference's golden cluster vectors
(``tests/integration/test_matrix_dedupers.py:107-122``) pin this.

All kernels are vectorized numpy — no per-row Python in the signature path
beyond SHA1 of unique tokens (cached per batch).
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache

import numpy as np

_MERSENNE_PRIME = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)

# numpy intentionally wraps uint64 arithmetic; silence the warning locally.
_ERR = {"over": "ignore"}


def sha1_hash32(data: bytes) -> int:
    """32-bit token hash: first 4 bytes (little-endian) of SHA1."""
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def _mod_mersenne(x: np.ndarray) -> np.ndarray:
    """Exact ``x % (2^61-1)`` for uint64 via two Mersenne folds — no 64-bit
    integer division (numpy's uint64 ``%`` is a per-element C divide and
    dominates signature time otherwise)."""
    p = _MERSENNE_PRIME
    s61 = np.uint64(61)
    x = (x & p) + (x >> s61)
    x = (x & p) + (x >> s61)
    return np.where(x >= p, x - p, x)


@lru_cache(maxsize=32)
def permutations(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) permutation coefficients, drawn in the canonical order:
    for each permutation, one draw for ``a`` in [1, p) then one for ``b`` in
    [0, p), from ``RandomState(seed)``.
    """
    gen = np.random.RandomState(seed)
    pairs = [
        (
            gen.randint(1, int(_MERSENNE_PRIME), dtype=np.uint64),
            gen.randint(0, int(_MERSENNE_PRIME), dtype=np.uint64),
        )
        for _ in range(num_perm)
    ]
    arr = np.array(pairs, dtype=np.uint64).T
    a, b = arr[0], arr[1]
    a.setflags(write=False)
    b.setflags(write=False)
    return a, b


def empty_signature(num_perm: int) -> np.ndarray:
    return np.full(num_perm, _MAX_HASH, dtype=np.uint64)


# process-global token-hash cache: shingle vocabularies repeat heavily
# across batches within a worker; bounded to keep worker heap sane
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 4_000_000

# process-global signature cache: duplicate-heavy corpora sign the same
# text many times (exact copies are the common near-dup case); ~1KB per
# entry at num_perm=128, so the cap keeps it ~50MB per worker
_SIG_CACHE: dict = {}
_SIG_CACHE_MAX = 50_000


def signature_from_token_hashes(
    token_hashes: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature for one value given its (unique) 32-bit token hashes.

    Matches per-token ``min((a*h + b) mod p & max_hash)`` with uint64
    wraparound multiplication (the canonical behaviour of the numpy-based
    scheme — ``a*h`` wraps mod 2^64 before the Mersenne reduction).
    """
    if token_hashes.size == 0:
        return empty_signature(a.shape[0])
    th = token_hashes.astype(np.uint64)
    with np.errstate(**_ERR):
        phv = _mod_mersenne(th[:, None] * a[None, :] + b[None, :])
    phv &= _MAX_HASH
    return phv.min(axis=0)


def _token_hash_lists(texts: list[str], ngram: int) -> list[np.ndarray]:
    """Per-text 32-bit shingle-hash arrays, batch-vectorized.

    For ngram <= 3 every shingle's codepoints pack into one uint64
    (21 bits/codepoint covers all of Unicode), so the whole batch's windows
    are built with three shifted gathers over ONE concatenated utf-32
    buffer, deduplicated with a single ``np.unique``, and SHA1 runs only
    for vocabulary the worker has never seen (the process-global cache
    converges after the first few batches). Duplicate shingles within a
    text are kept — they cannot change a min. Larger ngrams take the
    per-text set path (same hashes, just not batch-vectorized)."""
    cache = _TOKEN_HASH_CACHE
    if ngram * 21 > 64:
        out = []
        for text in texts:
            toks = {text[j : j + ngram] for j in range(len(text) - ngram + 1)}
            out.append(
                np.fromiter(
                    (
                        cache[t]
                        if t in cache
                        else cache.setdefault(t, sha1_hash32(t.encode("utf8")))
                        for t in toks
                    ),
                    dtype=np.uint64,
                    count=len(toks),
                )
            )
        return out

    cps = np.frombuffer(
        b"".join(t.encode("utf-32-le") for t in texts), dtype=np.uint32
    ).astype(np.uint64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    seg = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens, out=seg[1:])
    nwin = int(seg[-1]) - ngram + 1
    packed = np.zeros(nwin, dtype=np.uint64)
    for j in range(ngram):
        packed |= cps[j : j + nwin] << np.uint64(21 * (ngram - 1 - j))
    pos = np.arange(nwin, dtype=np.int64)
    sidx = np.searchsorted(seg, pos, side="right") - 1
    ok = pos + ngram <= seg[sidx + 1]  # window inside its text
    pk = packed[ok]
    owner = sidx[ok]
    u, inv = np.unique(pk, return_inverse=True)
    vals = np.empty(len(u), dtype=np.uint64)
    mask = (1 << 21) - 1
    for idx, p in enumerate(u.tolist()):
        key = (ngram, p)
        v = cache.get(key)
        if v is None:
            shingle = "".join(
                chr((p >> (21 * (ngram - 1 - j))) & mask) for j in range(ngram)
            )
            v = sha1_hash32(shingle.encode("utf8"))
            cache[key] = v
        vals[idx] = v
    hashes = vals[inv]
    cnts = np.bincount(owner, minlength=len(texts))
    bounds = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(cnts, out=bounds[1:])
    return [hashes[bounds[i] : bounds[i + 1]] for i in range(len(texts))]


def batch_signatures(
    texts: list[str | None],
    ngram: int,
    num_perm: int,
    na_placeholder: str | None = None,
    seed: int = 1,
    chunk_elems: int = 500_000,
) -> np.ndarray:
    """Vectorized signatures for a batch of strings → (n, num_perm) uint64.

    Tokenization parity: character shingles ``text[i:i+ngram]`` over the
    Python string, UTF-8 encoded (reference ``dedupers/lsh.py:44-46,52-54``);
    a text shorter than ``ngram`` yields no tokens → the empty (all-max)
    signature.

    The permutation arithmetic runs on the chunk's UNIQUE token hashes only
    (shingle vocabularies overlap heavily across texts — measured ~1.5%
    unique on a web-caption corpus, so the (tokens, num_perm) product
    shrinks ~60x), and the per-row reduction is a fused gather+``min`` per
    row in uint32 (post-Mersenne values fit 32 bits; ``np.minimum.reduceat``
    measured ~9x slower than this dispatch loop on the same data).
    ``chunk_elems`` bounds per-chunk temporaries, which are
    O(unique_tokens × num_perm) — larger chunks only improve dedup.
    Token SHA1s are cached across the batch (shingles repeat heavily).
    """
    a, b = permutations(num_perm, seed)
    n = len(texts)
    out = np.empty((n, num_perm), dtype=np.uint64)

    cache = _TOKEN_HASH_CACHE
    sig_key = (ngram, num_perm, seed)
    sig_cache = _SIG_CACHE

    p61 = _MERSENNE_PRIME
    s61 = np.uint64(61)

    def flush(rows: list[int], hash_lists: list[np.ndarray], row_texts: list[str]) -> None:
        if not rows:
            return
        h = np.concatenate(hash_lists)
        u, inv = np.unique(h, return_inverse=True)
        with np.errstate(**_ERR):
            # identical math to _mod_mersenne, fused in place, over the
            # unique hashes only
            phv = np.multiply(u[:, None], a[None, :])
            phv += b[None, :]
            tmp = phv >> s61
            phv &= p61
            phv += tmp
            np.right_shift(phv, s61, out=tmp)
            phv &= p61
            phv += tmp
            phv[phv >= p61] -= p61
        phv &= _MAX_HASH
        phv32 = phv.astype(np.uint32)
        if len(sig_cache) > _SIG_CACHE_MAX:
            sig_cache.clear()
        s = 0
        for ri, hl, t in zip(rows, hash_lists, row_texts):
            e = s + len(hl)
            out[ri] = phv32[inv[s:e]].min(axis=0)  # upcasts back to uint64
            s = e
            # copy: a view would pin the whole (n, num_perm) batch array
            sig_cache[(sig_key, t)] = out[ri].copy()

    # per-chunk temporaries are bounded by UNIQUE tokens, so the budget can
    # sit well above the old cache-blocking sweet spot — bigger chunks
    # dedupe better
    max_tokens = max(1, 16 * chunk_elems // num_perm)

    todo_rows: list[int] = []
    todo_texts: list[str] = []
    for i, text in enumerate(texts):
        if text is None:
            if na_placeholder is None:
                out[i] = _MAX_HASH
                continue
            text = na_placeholder
        hit = sig_cache.get((sig_key, text))
        if hit is not None:
            out[i] = hit
            continue
        if len(text) - ngram + 1 <= 0:
            out[i] = _MAX_HASH
            continue
        todo_rows.append(i)
        todo_texts.append(text)

    if todo_rows:
        hash_lists = _token_hash_lists(todo_texts, ngram)
        s = 0
        while s < len(todo_rows):
            e = s
            tok = 0
            while e < len(todo_rows) and (e == s or tok + len(hash_lists[e]) <= max_tokens):
                tok += len(hash_lists[e])
                e += 1
            flush(todo_rows[s:e], hash_lists[s:e], todo_texts[s:e])
            s = e
    if len(cache) > _TOKEN_HASH_CACHE_MAX:
        cache.clear()
    return out


# ---------------------------------------------------------------------------
# band/row parameter optimization (the (b, r) the bucketing scheme derives
# from (threshold, num_perm) with equal false-positive/negative weights)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=4)
def _leggauss(nodes: int) -> tuple[np.ndarray, np.ndarray]:
    return np.polynomial.legendre.leggauss(nodes)


def _gauss_integral(f, lo: float, hi: float, nodes: int = 160) -> float:
    """Gauss-Legendre quadrature; exact for polynomials of degree < 2*nodes,
    which covers ``(1-s^r)^b`` for any r*b <= num_perm <= 256 — i.e. this
    reproduces an adaptive quadrature of the same smooth integrand to machine
    precision.
    """
    x, w = _leggauss(nodes)
    xm = 0.5 * (hi - lo) * x + 0.5 * (hi + lo)
    return float(0.5 * (hi - lo) * np.sum(w * f(xm)))


def _false_positive_area(threshold: float, b: int, r: int) -> float:
    return _gauss_integral(lambda s: 1.0 - (1.0 - s ** float(r)) ** float(b), 0.0, threshold)


def _false_negative_area(threshold: float, b: int, r: int) -> float:
    return _gauss_integral(lambda s: (1.0 - s ** float(r)) ** float(b), threshold, 1.0)


@lru_cache(maxsize=256)
def optimal_param(
    threshold: float,
    num_perm: int,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> tuple[int, int]:
    """Pick (bands, rows) minimizing weighted FP/FN integral areas — the
    canonical S-curve optimization for MinHash-LSH bucketing.
    """
    min_error = float("inf")
    opt = (0, 0)
    for b in range(1, num_perm + 1):
        max_r = num_perm // b
        for r in range(1, max_r + 1):
            fp = _false_positive_area(threshold, b, r)
            fn = _false_negative_area(threshold, b, r)
            error = fp * fp_weight + fn * fn_weight
            if error < min_error:
                min_error = error
                opt = (b, r)
    return opt


def band_keys(signatures: np.ndarray, b: int, r: int) -> np.ndarray:
    """(n, b) array of uint64 band-bucket keys: each band's r signature values
    hashed to one 64-bit key. Rows colliding in any band are LSH candidates.

    The per-band key is a hash of the r values' bytes — bucket *equality* is
    all that matters, not the exact byte layout.
    """
    n = signatures.shape[0]
    out = np.empty((n, b), dtype=np.uint64)
    sig_bytes = np.ascontiguousarray(signatures[:, : b * r]).reshape(n, b, r)
    for band in range(b):
        # FNV-1a over the band's r uint64s, vectorized
        h = np.full(n, np.uint64(0xCBF29CE484222325))
        with np.errstate(**_ERR):
            for col in range(r):
                v = sig_bytes[:, band, col]
                for shift in (0, 32):
                    h ^= (v >> np.uint64(shift)) & _MAX_HASH
                    h *= np.uint64(0x100000001B3)
        out[:, band] = h
    return out


def lsh_candidate_pairs(
    signatures: np.ndarray, threshold: float, num_perm: int
) -> set[tuple[int, int]]:
    """Local (in-memory) LSH: all (i<j) pairs sharing at least one band
    bucket. No similarity verification — matching the bucketing-only query
    semantics the reference inherits (``dedupers/lsh.py:68-77``).
    """
    b, r = optimal_param(threshold, num_perm)
    pairs: set[tuple[int, int]] = set()
    n = signatures.shape[0]
    for band in range(b):
        start, end = band * r, (band + 1) * r
        buckets: dict[bytes, list[int]] = {}
        for i in range(n):
            buckets.setdefault(signatures[i, start:end].tobytes(), []).append(i)
        for members in buckets.values():
            if len(members) > 1:
                root = members[0]
                for j in members[1:]:
                    pairs.add((root, j))
                    # star edges suffice for connected components, but the
                    # reference yields all in-bucket pairs; components are
                    # identical either way.
    return pairs
