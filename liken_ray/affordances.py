"""Pandas accessor sugar ("affordances") — parity with the reference's
pandas extension API (``src/liken/backends/pandas/affordances.py:46-59``):

    import liken_ray.affordances  # registers accessors

    df.fuzzy.drop_duplicates("address", threshold=0.8)
    df.lsh.canonicalize("address", ngram=2).collect()

One accessor per similarity deduper (fuzzy / tfidf / lsh / cosine /
jaccard / exact), exposing ``drop_duplicates`` and ``canonicalize``.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from liken_ray import api
from liken_ray.dedupers.core import DEDUPER_REGISTRY


class _DeduperAccessor:
    _name: str = ""

    def __init__(self, df: pd.DataFrame):
        self._df = df

    def _apply(self, columns, deduper_kwargs: dict[str, Any]):
        factory = DEDUPER_REGISTRY[self._name]
        return api.dedupe(self._df).apply(factory(**deduper_kwargs))

    def drop_duplicates(self, columns, *, keep: str = "first", **deduper_kwargs):
        return self._apply(columns, deduper_kwargs).drop_duplicates(columns, keep=keep)

    def canonicalize(self, columns, *, keep: str = "first", id: str | None = None, **deduper_kwargs):
        return self._apply(columns, deduper_kwargs).canonicalize(columns, keep=keep, id=id)


def _register_all() -> None:
    for name in ("exact", "fuzzy", "tfidf", "lsh", "cosine", "jaccard"):
        accessor = type(f"_{name.title()}Accessor", (_DeduperAccessor,), {"_name": name})
        try:
            pd.api.extensions.register_dataframe_accessor(name)(accessor)
        except Exception:  # pragma: no cover - re-registration in same session
            pass


_register_all()
