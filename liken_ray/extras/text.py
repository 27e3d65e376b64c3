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


def quality_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality metrics (char/word/digit/punct counts) plus float
    ratios (stopword ratio, mean word length) used for corpus filtering."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    char_count = np.zeros(n, dtype=np.int64)
    word_count = np.zeros(n, dtype=np.int64)
    digit_count = np.zeros(n, dtype=np.int64)
    punct_count = np.zeros(n, dtype=np.int64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    mean_word_len = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        char_count[i] = len(t)
        words = _WS_RE.split(t.strip())
        words = [w for w in words if w]
        word_count[i] = len(words)
        digit_count[i] = sum(c.isdigit() for c in t)
        punct_count[i] = sum(not c.isalnum() and not c.isspace() for c in t)
        if words:
            stop_ratio[i] = sum(w.lower() in _STOP for w in words) / len(words)
            mean_word_len[i] = sum(len(w) for w in words) / len(words)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "char_count": char_count,
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
    """N-gram-marker language guess with a confidence score."""
    texts = batch[text_col].to_pylist()
    langs = []
    scores = []
    for t in texts:
        if not t:
            langs.append(None)
            scores.append(0.0)
            continue
        tl = f" {t.lower()} "
        best, best_score = "unknown", 0
        for lang, markers in _LANG_MARKERS.items():
            s = sum(tl.count(m) for m in markers)
            if s > best_score:
                best, best_score = lang, s
        langs.append(best if best_score else "unknown")
        scores.append(float(best_score))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(langs, pa.string()),
            "lang_score": pa.array(scores, pa.float64()),
        }
    )


_FNV = np.uint64(0x100000001B3)


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint of the whitespace-normalized lowercase
    text (rolling FNV-1a) — the cheap exact-dedup key for documents."""
    texts = batch[text_col].to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            if t is None:
                continue
            data = _WS_RE.sub(" ", t.strip().lower()).encode("utf8")
            h = np.uint64(0xCBF29CE484222325)
            for b in np.frombuffer(data, dtype=np.uint8).astype(np.uint64):
                h = (h ^ b) * _FNV
            out[i] = h
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": out.view(np.int64)})


def simhash64(batch: pa.Table, text_col: str = "text", ngram: int = 3) -> pa.Table:
    """64-bit SimHash over byte n-grams (near-dup signature: small Hamming
    distance ⇔ high shingle overlap). Gram hashes are deterministic
    vectorized rolling hashes (process-salt-free)."""
    from liken_ray.kernels.suffix import rolling_gram_hashes

    texts = batch[text_col].to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t or len(t) < ngram:
            continue
        grams = np.unique(rolling_gram_hashes(t.encode("utf8"), ngram))
        bits = ((grams[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = 2 * bits.sum(axis=0) - len(grams)
        out[i] = np.sum((acc > 0).astype(np.uint64) << shifts)
    return pa.table({"doc_id": batch["doc_id"], "simhash": out.view(np.int64)})
