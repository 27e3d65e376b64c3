"""Char n-gram TF-IDF similarity kernel.

Reproduces the scoring of the reference's ``tfidf`` deduper
(``/root/reference/src/liken/dedupers/tfidf.py:52-88``), which composes the
standard TF-IDF vectorizer (char analyzer, smooth idf, l2 norm, lowercase,
whitespace collapsing) with a sparse top-n self-similarity product: every
(row, col) cell of the top-n-per-row cosine matrix with value >= threshold
becomes a pair (self/symmetric cells included — harmless to union-find).
"""

from __future__ import annotations

import re

import numpy as np

_WS = re.compile(r"\s\s+")


def char_ngrams(text: str, lo: int, hi: int, lowercase: bool = True) -> list[str]:
    """Char n-grams with standard vectorizer preprocessing: lowercase
    (unless disabled) and collapse repeated whitespace to one space.
    """
    if lowercase:
        text = text.lower()
    text = _WS.sub(" ", text)
    n_len = len(text)
    grams: list[str] = []
    lo_eff = lo
    if lo_eff == 1:
        grams.extend(text)
        lo_eff += 1
    for n in range(lo_eff, min(hi + 1, n_len + 1)):
        for i in range(n_len - n + 1):
            grams.append(text[i : i + n])
    return grams


def tfidf_matrix(
    texts: list[str],
    ngram: int | tuple[int, int],
    *,
    lowercase: bool = True,
    min_df: int | float = 1,
    max_df: int | float = 1.0,
) -> np.ndarray:
    """Dense (n_docs, n_terms) L2-normalized TF-IDF matrix.

    tf = raw counts; idf = ln((1+n)/(1+df)) + 1 (smooth); rows l2-normalized.
    ``min_df`` / ``max_df`` follow the standard vectorizer semantics: an int
    is an absolute document count, a float a proportion of documents; terms
    outside [min_df, max_df] are dropped from the vocabulary BEFORE idf.
    Dense is fine here: this kernel runs within blocking buckets, not on the
    full corpus.
    """
    n = len(texts)
    vocab: dict[str, int] = {}
    doc_grams: list[dict[int, int]] = []
    for text in texts:
        counts: dict[int, int] = {}
        for g in char_ngrams(
            text,
            *(ngram if isinstance(ngram, tuple) else (ngram, ngram)),
            lowercase=lowercase,
        ):
            idx = vocab.setdefault(g, len(vocab))
            counts[idx] = counts.get(idx, 0) + 1
        doc_grams.append(counts)
    nv = len(vocab)
    if nv == 0:
        return np.zeros((n, 0))
    tf = np.zeros((n, nv))
    for i, counts in enumerate(doc_grams):
        for j, c in counts.items():
            tf[i, j] = c
    df = (tf > 0).sum(axis=0)
    lo = min_df if isinstance(min_df, (int, np.integer)) else np.ceil(min_df * n)
    hi = max_df if isinstance(max_df, (int, np.integer)) else np.floor(max_df * n)
    keep = (df >= lo) & (df <= hi)
    if not keep.all():
        if not keep.any():
            raise ValueError(
                "After pruning, no terms remain. Try a lower min_df or a higher max_df."
            )
        tf = tf[:, keep]
        df = df[keep]
    x = tf * (np.log((1.0 + n) / (1.0 + df)) + 1.0)[None, :]
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    return x / norms[:, None]


def topn_similarity_pairs(
    texts: list[str],
    ngram: int | tuple[int, int],
    threshold: float,
    topn: int,
    **vectorizer_kwargs,
) -> list[tuple[int, int]]:
    """All (i, j) cells of the per-row top-n cosine-similarity matrix with
    value >= threshold. Includes i==j and both orientations, exactly like the
    sparse top-n product the reference consumes.
    """
    x = tfidf_matrix(texts, ngram, **vectorizer_kwargs)
    if x.shape[1] == 0:
        return []
    sims = x @ x.T
    n = sims.shape[0]
    pairs: list[tuple[int, int]] = []
    for i in range(n):
        row = sims[i]
        order = np.argsort(-row, kind="stable")[:topn]
        for j in order:
            if row[j] >= threshold:
                pairs.append((i, int(j)))
    return pairs
