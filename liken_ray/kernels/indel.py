"""Fuzzy string-similarity kernels (Indel-ratio family).

Re-implements the public scoring definitions used by the reference's
``fuzzy`` deduper (``/root/reference/src/liken/dedupers/fuzzy.py:31-38``):

- ``ratio``: normalized Indel similarity, ``100 * 2*LCS(a,b) / (|a|+|b|)``.
- ``partial_ratio``: best ``ratio`` over alignments of the shorter string
  against substrings of the longer (including partial edge overlaps).
- ``token_sort_ratio`` / ``token_set_ratio`` / ``WRatio`` / ``QRatio``:
  standard fuzzywuzzy-style token variants built on ``ratio``.

LCS length uses the Allison–Dix bit-parallel algorithm over Python big ints
— O(len(a) * len(b) / 64), no per-cell Python DP.
"""

from __future__ import annotations

import re
from functools import lru_cache


def _char_masks(s: str) -> dict[str, int]:
    masks: dict[str, int] = {}
    bit = 1
    for ch in s:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks


def lcs_length(a: str, b: str) -> int:
    """Length of the longest common subsequence (bit-parallel)."""
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    masks = _char_masks(a)
    m = len(a)
    full = (1 << m) - 1
    s = full
    for ch in b:
        mch = masks.get(ch, 0)
        u = s & mch
        s = ((s + u) | (s - u)) & full
    # zero bits of s = LCS length
    return m - bin(s).count("1")


def ratio(a: str, b: str) -> float:
    """Normalized Indel similarity in [0, 100]."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 100.0
    if la == 0 or lb == 0:
        return 0.0
    return 200.0 * lcs_length(a, b) / (la + lb)


def partial_ratio(a: str, b: str) -> float:
    """Best ratio of the shorter string against an aligned window of the
    longer, allowing the window to overhang either end.
    """
    if len(a) > len(b):
        a, b = b, a
    la, lb = len(a), len(b)
    if la == 0:
        return 100.0 if lb == 0 else 0.0
    best = 0.0
    # fast path: exact containment
    if a in b:
        return 100.0
    achars = set(a)
    # prefix overhangs: a vs b[:i]
    for i in range(1, la):
        if b[i - 1] in achars:
            best = max(best, ratio(a, b[:i]))
    # full windows
    for i in range(0, lb - la + 1):
        win = b[i : i + la]
        best = max(best, ratio(a, win))
        if best == 100.0:
            return best
    # suffix overhangs: a vs b[i:]
    for i in range(max(lb - la + 1, 1), lb):
        if b[i] in achars:
            best = max(best, ratio(a, b[i:]))
    return best


_TOKEN_RE = re.compile(r"\S+")


def _tokens(s: str) -> list[str]:
    return _TOKEN_RE.findall(s.lower())


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(" ".join(sorted(_tokens(a))), " ".join(sorted(_tokens(b))))


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(_tokens(a)), set(_tokens(b))
    inter = sorted(ta & tb)
    diff_ab = sorted(ta - tb)
    diff_ba = sorted(tb - ta)
    s_inter = " ".join(inter)
    s_a = (s_inter + " " + " ".join(diff_ab)).strip()
    s_b = (s_inter + " " + " ".join(diff_ba)).strip()
    return max(ratio(s_inter, s_a), ratio(s_inter, s_b), ratio(s_a, s_b))


def quick_ratio(a: str, b: str) -> float:
    return ratio(a.lower(), b.lower())


def weighted_ratio(a: str, b: str) -> float:
    """Standard WRatio blend: full ratio vs scaled partial ratios depending
    on the length disparity of the inputs.
    """
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 100.0 if la == lb else 0.0
    unbase_scale = 0.95
    base = ratio(a, b)
    len_ratio = max(la, lb) / min(la, lb)
    if len_ratio < 1.5:
        return max(
            base,
            token_sort_ratio(a, b) * unbase_scale,
            token_set_ratio(a, b) * unbase_scale,
        )
    partial_scale = 0.9 if len_ratio < 8.0 else 0.6
    return max(
        base,
        partial_ratio(a, b) * partial_scale,
        token_sort_ratio(a, b) * unbase_scale * partial_scale,
        token_set_ratio(a, b) * unbase_scale * partial_scale,
    )


SCORERS = {
    "simple_ratio": ratio,
    "partial_ratio": partial_ratio,
    "token_sort_ratio": token_sort_ratio,
    "token_set_ratio": token_set_ratio,
    "weighted_ratio": weighted_ratio,
    "quick_ratio": quick_ratio,
}


@lru_cache(maxsize=1)
def _noop():  # pragma: no cover
    return None
