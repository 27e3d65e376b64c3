"""Text-analysis stages for large-scale training-data pipelines.

Every op is a vectorized batch transform over the ``documents``-shaped table
(``doc_id, text, lang, source, n_chars``), exposed both as a plain
``pa.Table -> pa.Table`` kernel (composable into ``map_batches``) and as a
Dataset-level helper.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liken_ray.kernels.preprocess import ENGLISH_STOPWORDS

_WS_RE = re.compile(r"\s+")

# GPT-2-style pre-tokenizer pattern (the published BPE splitting regex),
# simplified to the stdlib-re subset.
_BPE_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

_STOP = set(ENGLISH_STOPWORDS)


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + whitespace token count + BPE-ish piece count."""
    texts = batch[text_col].to_pylist()
    ws = np.fromiter(
        (0 if t is None else len(_WS_RE.split(t.strip())) if t and t.strip() else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    bpe = np.fromiter(
        (0 if t is None else len(_BPE_RE.findall(t)) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "word_count": ws,
            "bpe_count": bpe,
        }
    )


# codepoint class tables: ASCII fast path precomputed; higher codepoints
# classified once per DISTINCT codepoint (cached) — the per-char python
# loop this replaces is the hot path of corpus-quality filtering
def _mk_ascii_tables() -> dict[str, np.ndarray]:
    digit = np.zeros(128, dtype=bool)
    punct = np.zeros(128, dtype=bool)
    space = np.zeros(128, dtype=bool)
    lower = np.arange(128, dtype=np.uint32)
    for i in range(128):
        c = chr(i)
        digit[i] = c.isdigit()
        space[i] = bool(_WS_RE.match(c))
        punct[i] = not c.isalnum() and not c.isspace()
        lower[i] = ord(c.lower())
    return {"digit": digit, "punct": punct, "space": space, "lower": lower}


_ASCII = _mk_ascii_tables()
_HI_CLASS_CACHE: dict[int, tuple[bool, bool, bool, int]] = {}


def _classify_codepoints(
    cp: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(is_digit, is_punct, is_space, lowered) for a uint32 codepoint
    array — table lookup under 128, per-unique-codepoint python
    classification (cached process-wide) above. ``lowered`` carries
    ``ord(c.lower())`` for every codepoint whose lowering is a single
    codepoint (e.g. U+212A KELVIN SIGN -> 'k'); the rare multi-codepoint
    lowerings keep the original codepoint."""
    lo = cp < 128
    is_digit = np.zeros(len(cp), dtype=bool)
    is_punct = np.zeros(len(cp), dtype=bool)
    is_space = np.zeros(len(cp), dtype=bool)
    lowered = cp.copy()
    lo_cp = cp[lo]
    is_digit[lo] = _ASCII["digit"][lo_cp]
    is_punct[lo] = _ASCII["punct"][lo_cp]
    is_space[lo] = _ASCII["space"][lo_cp]
    lowered[lo] = _ASCII["lower"][lo_cp]
    hi_idx = np.flatnonzero(~lo)
    if len(hi_idx):
        uniq, inv = np.unique(cp[hi_idx], return_inverse=True)
        classes = np.empty((len(uniq), 3), dtype=bool)
        lowers = np.empty(len(uniq), dtype=np.uint32)
        for k, u in enumerate(uniq.tolist()):
            ent = _HI_CLASS_CACHE.get(u)
            if ent is None:
                c = chr(u)
                cl = c.lower()
                ent = (
                    c.isdigit(),
                    not c.isalnum() and not c.isspace(),
                    bool(_WS_RE.match(c)),
                    ord(cl) if len(cl) == 1 else u,
                )
                _HI_CLASS_CACHE[u] = ent
            classes[k] = ent[:3]
            lowers[k] = ent[3]
        is_digit[hi_idx] = classes[inv, 0]
        is_punct[hi_idx] = classes[inv, 1]
        is_space[hi_idx] = classes[inv, 2]
        lowered[hi_idx] = lowers[inv]
    return is_digit, is_punct, is_space, lowered


def _seg_sums(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a bool/int array under row offsets (robust for
    zero-length rows, unlike reduceat)."""
    cs = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=cs[1:])
    return cs[offsets[1:]] - cs[offsets[:-1]]


_STOP_BASE = np.uint64(0x100000001B3)


def _hash_powers(n: int) -> np.ndarray:
    arr = np.full(n, _STOP_BASE, dtype=np.uint64)
    if n:
        arr[0] = 1
    with np.errstate(over="ignore"):
        return np.cumprod(arr, dtype=np.uint64)


def _word_hash(cp: np.ndarray) -> np.uint64:
    with np.errstate(over="ignore"):
        return np.uint64((cp.astype(np.uint64) + np.uint64(1)) @ _hash_powers(len(cp)))


_STOP_HASHES = np.sort(
    np.array(
        [_word_hash(np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32)) for w in _STOP],
        dtype=np.uint64,
    )
)


def quality_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality metrics (char/word/digit/punct counts) plus float
    ratios (stopword ratio, mean word length) used for corpus filtering.

    Fully vectorized: texts become one codepoint buffer; character classes
    are table lookups, per-row counts are cumsum differences, words are
    nonspace runs, and the stopword test matches segmented polynomial
    hashes of lowercased words against the precomputed stopword hash set
    (w.h.p. exact — 64-bit hashes over ~170 stopwords)."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    encs = [t.encode("utf-32-le") if t else b"" for t in texts]
    lens = np.fromiter((len(e) >> 2 for e in encs), dtype=np.int64, count=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0:
        z = np.zeros(n, dtype=np.int64)
        zf = np.zeros(n, dtype=np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "char_count": z, "word_count": z, "digit_count": z,
                "punct_count": z, "stopword_ratio": zf, "mean_word_len": zf,
            }
        )
    cp = np.frombuffer(b"".join(encs), dtype=np.uint32)
    is_digit, is_punct, is_space, lowered = _classify_codepoints(cp)

    digit_count = _seg_sums(is_digit, offsets)
    punct_count = _seg_sums(is_punct, offsets)
    nonspace = ~is_space
    nonspace_count = _seg_sums(nonspace, offsets)

    # word starts: nonspace preceded by space or row start
    prev_space = np.ones(total, dtype=bool)
    prev_space[1:] = is_space[:-1]
    row_starts = offsets[:-1][lens > 0]
    prev_space[row_starts] = True
    word_start = nonspace & prev_space
    word_count = _seg_sums(word_start, offsets)

    with np.errstate(invalid="ignore", divide="ignore"):
        mean_word_len = np.where(
            word_count > 0, nonspace_count / np.maximum(word_count, 1), 0.0
        )

    # stopword ratio: hash each word (lowercased codepoints, polynomial)
    starts = np.flatnonzero(word_start)
    stop_ratio = np.zeros(n, dtype=np.float64)
    if len(starts):
        # word end = next space/row-end; compute run lengths via the next
        # word-or-gap boundary: scan of nonspace runs
        run_id = np.cumsum(word_start) - 1
        # full per-codepoint lowering (cached in _classify_codepoints), so
        # codepoints whose .lower() lands in ASCII (e.g. U+212A -> 'k')
        # still match the ASCII stopword hashes
        lc = lowered
        with np.errstate(over="ignore"):
            w_lens_all = np.bincount(run_id[nonspace], minlength=len(starts))
            powers = _hash_powers(int(w_lens_all.max()))
            ns_idx = np.flatnonzero(nonspace)
            word_of = run_id[ns_idx]
            pos_in_word = ns_idx - starts[word_of]
            weighted = (lc[ns_idx].astype(np.uint64) + np.uint64(1)) * powers[pos_in_word]
            whash = np.zeros(len(starts), dtype=np.uint64)
            np.add.at(whash, word_of, weighted)
        pos = np.clip(np.searchsorted(_STOP_HASHES, whash), 0, len(_STOP_HASHES) - 1)
        is_stop = (_STOP_HASHES[pos] == whash).astype(np.float64)
        row_of_word = np.searchsorted(offsets, starts, side="right") - 1
        stop_per_row = np.bincount(row_of_word, weights=is_stop, minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            stop_ratio = np.where(
                word_count > 0, stop_per_row / np.maximum(word_count, 1), 0.0
            )

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "char_count": lens,
            "word_count": word_count,
            "digit_count": digit_count,
            "punct_count": punct_count,
            "stopword_ratio": stop_ratio,
            "mean_word_len": mean_word_len,
        }
    )


# character-frequency profiles for a tiny n-gram language-ID heuristic
# (top characteristic letter patterns per language; heuristic, offline)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", "ing ", " to "],
    "es": [" de ", " la ", " el ", "ción", " que "],
    "de": [" der ", " und ", " die ", "sch", " ein "],
    "fr": [" le ", " de ", " et ", " les ", " une "],
    "it": [" di ", " che ", " il ", " la ", "zione"],
    "pt": [" de ", " que ", " não ", "ção", " uma "],
}


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """N-gram-marker language guess with a confidence score.

    Vectorized: one ``utf8_lower`` + space-padding pass, then one
    ``pc.count_substring`` per marker (30 Arrow kernel calls per batch,
    no per-row python). Tie-breaking matches the per-row scan it
    replaced: first language in ``_LANG_MARKERS`` order wins on equal
    score; zero total marker hits -> ``unknown``; null/empty text ->
    null prediction with score 0."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    padded = pc.binary_join_element_wise(" ", pc.utf8_lower(col), " ", "")
    langs = list(_LANG_MARKERS)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    for j, markers in enumerate(_LANG_MARKERS.values()):
        for m in markers:
            cnt = pc.fill_null(pc.count_substring(padded, m), 0)
            scores[:, j] += cnt.to_numpy(zero_copy_only=False).astype(np.int64)
    best_j = np.argmax(scores, axis=1)
    best_s = scores[np.arange(n), best_j]
    names = np.array(langs + ["unknown"], dtype=object)
    pred = names[np.where(best_s > 0, best_j, len(langs))]
    empty = ~col.is_valid().to_numpy(zero_copy_only=False) | (
        pc.fill_null(pc.utf8_length(col), 0).to_numpy(zero_copy_only=False) == 0
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(pred, pa.string(), mask=empty),
            "lang_score": np.where(empty, 0.0, best_s.astype(np.float64)),
        }
    )


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint of the whitespace-normalized lowercase
    text — the cheap exact-dedup key for documents. Vectorized: one
    polynomial hash over the concatenated normalized byte buffer (per-row
    values via weighted prefix sums), avalanche-mixed; no per-byte
    Python."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    encs = [
        b"" if t is None else _WS_RE.sub(" ", t.strip().lower()).encode("utf8")
        for t in texts
    ]
    lens = np.fromiter((len(e) for e in encs), dtype=np.int64, count=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    if total:
        buf = np.frombuffer(b"".join(encs), dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            powers = _hash_powers(int(lens.max()))
            pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
            weighted = (buf + np.uint64(1)) * powers[pos]
            prefix = np.zeros(total + 1, dtype=np.uint64)
            np.cumsum(weighted, out=prefix[1:])
            h = prefix[offsets[1:]] - prefix[offsets[:-1]]
            # avalanche (splitmix64 finalizer) so equal-prefix rows diverge
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
            h = h * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
        nonempty = lens > 0
        out[nonempty] = h[nonempty]
    # null texts keep fingerprint 0; empty-after-normalization strings get
    # a fixed nonzero tag — OUTSIDE the total>0 guard so the value is
    # batch-composition-independent (an exact-dedup key must not depend on
    # which rows share the batch)
    empty_str = np.array(
        [t is not None and len(e) == 0 for t, e in zip(texts, encs)], dtype=bool
    )
    if empty_str.any():
        out[empty_str] = np.uint64(0x9E3779B97F4A7C15)
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": out.view(np.int64)})


def simhash64(batch: pa.Table, text_col: str = "text", ngram: int = 3) -> pa.Table:
    """64-bit SimHash over byte n-grams (near-dup signature: small Hamming
    distance ⇔ high shingle overlap). Gram hashes are deterministic
    vectorized rolling hashes (process-salt-free); the per-row bit
    majorities are computed over ONE concatenated gram buffer (segmented
    sums — no per-row numpy dispatch in the bit stage)."""
    from liken_ray.kernels.suffix import rolling_gram_hashes

    texts = batch[text_col].to_pylist()
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    gram_parts: list[np.ndarray] = []
    lens = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        if not t or len(t) < ngram:
            continue
        g = np.unique(rolling_gram_hashes(t.encode("utf8"), ngram))
        gram_parts.append(g)
        lens[i] = len(g)
    total = int(lens.sum())
    if total:
        grams = np.concatenate(gram_parts)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        shifts = np.arange(64, dtype=np.uint64)
        per_row = np.zeros((n, 64), dtype=np.int64)
        # chunk over ROWS so the (chunk_grams, 64) bit matrix and its
        # per-chunk cumsum stay a few MB (long documents would otherwise
        # allocate GBs at once)
        max_chunk_grams = 65_536
        row_lo = 0
        while row_lo < n:
            row_hi = row_lo + 1
            while (
                row_hi < n
                and offsets[row_hi + 1] - offsets[row_lo] <= max_chunk_grams
            ):
                row_hi += 1
            g = grams[offsets[row_lo] : offsets[row_hi]]
            if len(g):
                bits = ((g[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int8)
                cs = np.zeros((len(g) + 1, 64), dtype=np.int32)
                np.cumsum(bits, axis=0, out=cs[1:])
                local = offsets[row_lo : row_hi + 1] - offsets[row_lo]
                per_row[row_lo:row_hi] = cs[local[1:]] - cs[local[:-1]]
            row_lo = row_hi
        acc = 2 * per_row - lens[:, None]
        vals = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1)
        out[lens > 0] = vals[lens > 0]
    return pa.table({"doc_id": batch["doc_id"], "simhash": out.view(np.int64)})
