"""Deduper operator definitions.

Each deduper is a small, picklable *plan object* carrying its config plus the
batch-level kernel (pair generation over an Arrow column / table, or a
vectorized boolean mask for predicates). Two consumers:

- the local Arrow executor (``liken_ray.local.executor``) — runs the kernel
  on a whole in-memory table (golden-parity path, and the per-bucket verify
  kernel inside distributed groups);
- the Ray compiler (``liken_ray.engine``) — maps the same operators onto
  ``map_batches`` signature extraction + ``groupby`` blocking shuffles.

Operator semantics follow the reference inventory (SURVEY.md §2; reference
``src/liken/dedupers/*.py``): strict ``>`` thresholds, nulls coalesced to
``"na"`` for single-column inputs, predicate dedupers collapsing every
matching row into one cluster.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable, Iterable, Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liken_ray.kernels import indel
from liken_ray.kernels import minhash as mh
from liken_ray.kernels import tfidf as tfidf_kernel

Pair = tuple[int, int]
Columns = str | tuple[str, ...]

# registry: name -> factory; used by the Pipeline API's `lk.col("x").<name>()`
DEDUPER_REGISTRY: dict[str, Callable[..., "Deduper"]] = {}


def _register(name: str):
    def deco(factory):
        DEDUPER_REGISTRY[name] = factory
        return factory

    return deco


class Deduper:
    """Base plan object."""

    name: str = "deduper"
    with_na_placeholder: bool = True
    is_predicate: bool = False
    # "single" | "compound" | "any"
    arity: str = "single"

    def __init__(self, **params: Any):
        self._params = params

    def validate(self, columns: Columns) -> None:
        if self.arity == "single" and not isinstance(columns, str):
            raise ValueError("For single column dedupers, `columns` must be defined as a string")
        if self.arity == "compound" and not isinstance(columns, tuple):
            raise ValueError("For compound columns dedupers, `columns` must be defined as a tuple")

    # threshold-style kernel
    def pairs(self, data: pa.Array | pa.Table) -> Iterable[Pair]:
        raise NotImplementedError

    # predicate-style kernel
    def mask(self, array: pa.Array) -> np.ndarray:
        raise NotImplementedError

    def __repr__(self) -> str:
        inner = ", ".join(f"{k}={v!r}" for k, v in self._params.items())
        return f"{self.name}({inner})"

    __str__ = __repr__


class ThresholdDeduper(Deduper):
    def __init__(self, threshold: float = 0.95, **params: Any):
        super().__init__(threshold=threshold, **params)
        if not (0 <= threshold < 1):
            raise ValueError("The threshold value must be greater or equal to 0 and less than 1")
        self.threshold = threshold


class PredicateDeduper(Deduper):
    is_predicate = True

    def pairs(self, data: pa.Array | pa.Table) -> Iterable[Pair]:
        """All matching rows collapse into one cluster: star edges to the
        first matching row.
        """
        m = self.mask(data)
        idx = np.flatnonzero(m)
        if idx.size > 1:
            root = int(idx[0])
            for j in idx[1:]:
                yield root, int(j)

    def __invert__(self) -> "Deduper":
        return NegatedPredicate(self)


class NegatedPredicate(PredicateDeduper):
    def __init__(self, inner: PredicateDeduper):
        super().__init__()
        self._inner = inner
        self.with_na_placeholder = inner.with_na_placeholder

    @property
    def name(self):  # type: ignore[override]
        return f"~{self._inner.name}"

    def validate(self, columns: Columns) -> None:
        self._inner.validate(columns)

    def mask(self, array: pa.Array) -> np.ndarray:
        return ~self._inner.mask(array)

    def __repr__(self) -> str:
        return f"~{self._inner!r}"

    __str__ = __repr__


def _mask_to_numpy(mask: pa.Array) -> np.ndarray:
    """Boolean Arrow array -> numpy bool, nulls treated as no-match."""
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return pc.fill_null(mask, False).to_numpy(zero_copy_only=False).astype(bool)


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


class Exact(Deduper):
    """Hash-bucket equality; single or compound columns (reference
    ``dedupers/exact.py:31-52``). In the distributed engine this compiles to
    a pure ``groupby`` — no pair materialization.
    """

    name = "exact"
    arity = "any"

    def group_keys(self, data: pa.Array | pa.Table) -> list:
        """Hashable per-row bucket key (nulls already coalesced for single
        columns by the caller; compound tuples keep ``None``)."""
        if isinstance(data, (pa.Array, pa.ChunkedArray)):
            return data.to_pylist()
        cols = [data[c].to_pylist() for c in data.column_names]
        return list(zip(*cols)) if cols else [() for _ in range(data.num_rows)]

    def pairs(self, data: pa.Array | pa.Table) -> Iterator[Pair]:
        buckets: dict[Any, list[int]] = defaultdict(list)
        for i, key in enumerate(self.group_keys(data)):
            buckets[key].append(i)
        for members in buckets.values():
            root = members[0]
            for j in members[1:]:
                yield root, j


@_register("exact")
def exact() -> Deduper:
    """Exact deduplication on one or more columns (default deduper when none
    is applied)."""
    return Exact()


# ---------------------------------------------------------------------------
# fuzzy
# ---------------------------------------------------------------------------


class Fuzzy(ThresholdDeduper):
    """All-pairs fuzzy string similarity, strict ``score > 100*threshold``
    (reference ``dedupers/fuzzy.py:62-82``). O(n²): in the distributed engine
    this only ever runs inside blocking buckets.
    """

    name = "fuzzy"

    def __init__(self, threshold: float = 0.95, scorer: str = "simple_ratio"):
        super().__init__(threshold=threshold, scorer=scorer)
        self.scorer = scorer

    def pairs(self, data: pa.Array) -> Iterator[Pair]:
        values: list[str] = data.to_pylist()
        scorer = indel.SCORERS.get(self.scorer, indel.ratio)
        cutoff = 100.0 * self.threshold
        n = len(values)
        for i in range(n):
            s1 = values[i]
            for j in range(i + 1, n):
                if scorer(s1, values[j]) > cutoff:
                    yield i, j


@_register("fuzzy")
def fuzzy(threshold: float = 0.95, scorer: str = "simple_ratio") -> Deduper:
    return Fuzzy(threshold=threshold, scorer=scorer)


# ---------------------------------------------------------------------------
# lsh
# ---------------------------------------------------------------------------


class LSH(ThresholdDeduper):
    """MinHash-LSH near-string dedup (the flagship; reference
    ``dedupers/lsh.py:44-77``). Pairs = rows colliding in >=1 band bucket at
    the (b, r) derived from (threshold, num_perm) — no post-verification,
    matching the reference's bucketing-only query semantics.
    """

    name = "lsh"

    def __init__(self, threshold: float = 0.95, ngram: int = 3, num_perm: int = 128):
        super().__init__(threshold=threshold, ngram=ngram, num_perm=num_perm)
        self.ngram = ngram
        self.num_perm = num_perm

    def signatures(self, values: list[str | None]) -> np.ndarray:
        return mh.batch_signatures(values, self.ngram, self.num_perm)

    def band_params(self) -> tuple[int, int]:
        return mh.optimal_param(self.threshold, self.num_perm)

    def pairs(self, data: pa.Array) -> Iterable[Pair]:
        values = data.to_pylist()
        sigs = self.signatures(values)
        return mh.lsh_candidate_pairs(sigs, self.threshold, self.num_perm)


@_register("lsh")
def lsh(threshold: float = 0.95, ngram: int = 3, num_perm: int = 128) -> Deduper:
    return LSH(threshold=threshold, ngram=ngram, num_perm=num_perm)


# ---------------------------------------------------------------------------
# tfidf
# ---------------------------------------------------------------------------


class TfIdf(ThresholdDeduper):
    """Char n-gram TF-IDF top-n cosine pairs (reference
    ``dedupers/tfidf.py:52-88``). Global IDF semantics: valid on a whole
    table; approximate when run per-bucket (documented).

    Vectorizer kwargs: the reference forwards arbitrary sklearn
    ``TfidfVectorizer`` kwargs. This engine implements the common ones
    (``lowercase``, ``min_df``, ``max_df``) with sklearn's documented
    semantics and REJECTS anything else — silently ignoring a kwarg like
    ``sublinear_tf`` would return different clusters than the user asked
    for.
    """

    name = "tfidf"
    _SUPPORTED_KWARGS = ("lowercase", "min_df", "max_df")

    def __init__(
        self,
        threshold: float = 0.95,
        ngram: int | tuple[int, int] = 3,
        topn: int = 2,
        **kwargs: Any,
    ):
        unsupported = sorted(set(kwargs) - set(self._SUPPORTED_KWARGS))
        if unsupported:
            raise ValueError(
                f"tfidf: unsupported vectorizer kwarg(s) {unsupported}; "
                f"this engine implements {list(self._SUPPORTED_KWARGS)}"
            )
        super().__init__(threshold=threshold, ngram=ngram, topn=topn, **kwargs)
        self.ngram = ngram
        self.topn = topn
        self.vectorizer_kwargs = kwargs

    def pairs(self, data: pa.Array) -> list[Pair]:
        values = data.to_pylist()
        return tfidf_kernel.topn_similarity_pairs(
            values, self.ngram, self.threshold, self.topn, **self.vectorizer_kwargs
        )


@_register("tfidf")
def tfidf(
    threshold: float = 0.95, ngram: int | tuple[int, int] = 3, topn: int = 2, **kwargs: Any
) -> Deduper:
    return TfIdf(threshold=threshold, ngram=ngram, topn=topn, **kwargs)


# ---------------------------------------------------------------------------
# jaccard (compound, categorical row-sets)
# ---------------------------------------------------------------------------


class Jaccard(ThresholdDeduper):
    """Row-set Jaccard over compound columns, nulls dropped from sets,
    strict ``>`` (reference ``dedupers/jaccard.py:27-47``)."""

    name = "jaccard"
    arity = "compound"

    def row_sets(self, data: pa.Table) -> list[frozenset]:
        cols = [data[c].to_pylist() for c in data.column_names]
        n = data.num_rows
        return [frozenset(c[i] for c in cols if c[i] is not None) for i in range(n)]

    def pairs(self, data: pa.Table) -> Iterator[Pair]:
        sets = self.row_sets(data)
        n = len(sets)
        for i in range(n):
            si = sets[i]
            for j in range(i + 1, n):
                inter = si & sets[j]
                if not inter:
                    continue
                union = si | sets[j]
                if not union:
                    continue
                if len(inter) / len(union) > self.threshold:
                    yield i, j


@_register("jaccard")
def jaccard(threshold: float = 0.95) -> Deduper:
    return Jaccard(threshold=threshold)


# ---------------------------------------------------------------------------
# cosine (compound, numeric)
# ---------------------------------------------------------------------------


class Cosine(ThresholdDeduper):
    """Row-vector cosine over compound numeric columns; NaN -> 0, zero norms
    -> 1, strict ``>`` (reference ``dedupers/cosine.py:29-49``)."""

    name = "cosine"
    arity = "compound"

    def matrix(self, data: pa.Table) -> np.ndarray:
        cols = [
            data[c].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            if isinstance(data[c], pa.ChunkedArray)
            else data[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in data.column_names
        ]
        matrix = np.column_stack(cols) if cols else np.zeros((data.num_rows, 0))
        matrix = np.nan_to_num(matrix, nan=0.0)
        norms = np.linalg.norm(matrix, axis=1)
        norms[norms == 0] = 1.0
        return matrix / norms[:, None]

    def pairs(self, data: pa.Table) -> Iterator[Pair]:
        normalized = self.matrix(data)
        n = normalized.shape[0]
        for i in range(n):
            if i + 1 >= n:
                break
            sims = normalized[i] @ normalized[i + 1 :].T
            hits = np.flatnonzero(sims > self.threshold)
            for off in hits:
                yield i, i + 1 + int(off)


@_register("cosine")
def cosine(threshold: float = 0.95) -> Deduper:
    return Cosine(threshold=threshold)


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------


class IsNA(PredicateDeduper):
    """Nulls (None or NaN) collapse into one cluster; sees raw nulls
    (reference ``dedupers/isna.py:33-48``)."""

    name = "isna"
    with_na_placeholder = False

    def mask(self, array: pa.Array) -> np.ndarray:
        m = pc.is_null(array, nan_is_null=True)
        return _mask_to_numpy(m)

    def __invert__(self) -> "Deduper":
        return NotNA()


class NotNA(PredicateDeduper):
    name = "~isna"
    with_na_placeholder = False

    def mask(self, array: pa.Array) -> np.ndarray:
        return ~_mask_to_numpy(pc.is_null(array, nan_is_null=True))


@_register("isna")
def isna() -> Deduper:
    return IsNA()


class IsIn(PredicateDeduper):
    name = "isin"

    def __init__(self, values: Iterable):
        super().__init__(values=values)
        self.values = values

    def mask(self, array: pa.Array) -> np.ndarray:
        # membership via the python `in` operator, matching the reference's
        # non-vectorized semantics (``dedupers/isin.py:31-34``) — notably
        # `"a" in "cat"` is substring membership when values is a string.
        vals = array.to_pylist()
        return np.array([v in self.values for v in vals], dtype=bool)


@_register("isin")
def isin(values: Iterable) -> Deduper:
    return IsIn(values=values)


class StrContains(PredicateDeduper):
    name = "str_contains"

    def __init__(self, pattern: str, case: bool = True, regex: bool = False):
        super().__init__(pattern=pattern, case=case, regex=regex)
        self.pattern = pattern
        self.case = case
        self.regex = regex

    def mask(self, array: pa.Array) -> np.ndarray:
        if self.regex:
            m = pc.match_substring_regex(array, self.pattern, ignore_case=not self.case)
        elif self.case:
            m = pc.match_substring(array, self.pattern)
        else:
            m = pc.match_substring(pc.utf8_lower(array), self.pattern.lower())
        return _mask_to_numpy(m)


@_register("str_contains")
def str_contains(pattern: str, case: bool = True, regex: bool = False) -> Deduper:
    return StrContains(pattern=pattern, case=case, regex=regex)


class StrStartswith(PredicateDeduper):
    name = "str_startswith"

    def __init__(self, pattern: str, case: bool = True):
        super().__init__(pattern=pattern, case=case)
        self.pattern = pattern
        self.case = case

    def mask(self, array: pa.Array) -> np.ndarray:
        if self.case:
            m = pc.starts_with(array, self.pattern)
        else:
            m = pc.starts_with(pc.utf8_lower(array), self.pattern.lower())
        return _mask_to_numpy(m)


@_register("str_startswith")
def str_startswith(pattern: str, case: bool = True) -> Deduper:
    return StrStartswith(pattern=pattern, case=case)


class StrEndswith(PredicateDeduper):
    name = "str_endswith"

    def __init__(self, pattern: str, case: bool = True):
        super().__init__(pattern=pattern, case=case)
        self.pattern = pattern
        self.case = case

    def mask(self, array: pa.Array) -> np.ndarray:
        if self.case:
            m = pc.ends_with(array, self.pattern)
        else:
            m = pc.ends_with(pc.utf8_lower(array), self.pattern.lower())
        return _mask_to_numpy(m)


@_register("str_endswith")
def str_endswith(pattern: str, case: bool = True) -> Deduper:
    return StrEndswith(pattern=pattern, case=case)


class StrLen(PredicateDeduper):
    """length > min_len AND (length <= max_len if set) AND not-null AND
    not-empty (reference ``dedupers/str_len.py:33-51``)."""

    name = "str_len"

    def __init__(self, min_len: int = 0, max_len: int | None = None):
        super().__init__(min_len=min_len, max_len=max_len)
        self.min_len = min_len
        self.max_len = max_len

    def mask(self, array: pa.Array) -> np.ndarray:
        lengths = pc.utf8_length(array)
        m = pc.greater(lengths, self.min_len)
        if self.max_len is not None:
            m = pc.and_(m, pc.less_equal(lengths, self.max_len))
        m = pc.and_(m, pc.invert(pc.is_null(array)))
        m = pc.and_(m, pc.greater(lengths, 0))
        return _mask_to_numpy(m)


@_register("str_len")
def str_len(min_len: int = 0, max_len: int | None = None) -> Deduper:
    return StrLen(min_len=min_len, max_len=max_len)


# ---------------------------------------------------------------------------
# custom user pair generators
# ---------------------------------------------------------------------------


class CustomDeduper(ThresholdDeduper):
    """User pair-generation over the listified column (reference
    ``src/liken/custom.py:26-67``). In distributed global scope, the pair fn
    sees partition-local indices within each group/bucket — documented
    extension contract.
    """

    arity = "any"

    def __init__(self, pair_fn: Callable, fn_name: str, **kwargs: Any):
        Deduper.__init__(self, **kwargs)  # skip threshold validation
        self.pair_fn = pair_fn
        self.name = fn_name
        self.kwargs = kwargs

    def validate(self, columns: Columns) -> None:
        pass

    def pairs(self, data: pa.Array | pa.Table) -> Iterator[Pair]:
        values = data.to_pylist()
        yield from self.pair_fn(values, **self.kwargs)


class _CustomNamespace:
    """`lk.custom.register` decorator namespace."""

    @staticmethod
    def register(f: Callable) -> Callable:
        def factory(*args, **kwargs):
            if args:
                raise TypeError(f"{f.__name__} must be called with keyword arguments only")
            return CustomDeduper(f, f.__name__, **kwargs)

        factory.__name__ = f.__name__
        DEDUPER_REGISTRY[f.__name__] = factory
        return factory


custom = _CustomNamespace()
