"""Public liken-compatible API over the Ray-Data-native engine.

``lk.dedupe(df)`` accepts a pandas DataFrame, a pyarrow Table, or a
``ray.data.Dataset``:

- pandas / Arrow → the local Arrow executor (exact reference semantics,
  in-process);
- ``ray.data.Dataset`` → the distributed engine (``liken_ray.engine``),
  global scope by default (clusters span blocks — the reference's *local*
  semantics at any scale), or ``scope="partition"`` for the reference Ray
  backend's partition-local compatibility behaviour
  (``/root/reference/backends/ray/executor.py:33-70``).
"""

from __future__ import annotations

from typing import Any, Hashable

import pyarrow as pa

from liken_ray.constants import CANONICAL_ID
from liken_ray.dedupers.core import exact as _exact_factory
from liken_ray.local.executor import (
    LocalFrame,
    canonicals_counts,
    execute_plan,
    synthesize_table,
)
from liken_ray.plan import (
    CollectionsManager,
    validate_columns_arg,
    validate_keep_arg,
)


def _is_ray_dataset(df: Any) -> bool:
    mod = type(df).__module__
    return mod.startswith("ray.data")


def _validate_local_input(df: Any) -> None:
    """Type-check a non-Ray input WITHOUT converting it (conversion happens
    lazily at execution); raises the same errors as ``_to_arrow``."""
    if isinstance(df, pa.Table):
        return
    mod = type(df).__module__.partition(".")[0]
    if mod in ("pandas", "polars"):
        return
    if mod in ("dask", "dask_expr", "modin", "pyspark"):
        raise TypeError(
            f"{type(df).__module__}.{type(df).__name__} is not supported: "
            "liken_ray replaces the reference's dask/modin/pyspark backends "
            "with ray.data. Convert with ray.data.from_pandas / from_arrow / "
            "read_parquet and pass the Dataset."
        )
    raise TypeError(
        f"Invalid arg: df must be a pandas/polars DataFrame, pyarrow Table or "
        f"ray.data.Dataset, got {type(df).__name__}"
    )


def _to_arrow(df: Any) -> tuple[pa.Table, str]:
    """Return (table, original_kind)."""
    if isinstance(df, pa.Table):
        return df, "arrow"
    try:
        import pandas as pd

        if isinstance(df, pd.DataFrame):
            return pa.Table.from_pandas(df, preserve_index=False), "pandas"
    except ImportError:  # pragma: no cover
        pass
    try:
        import polars as pl

        if isinstance(df, pl.DataFrame):
            return df.to_arrow(), "polars"
    except ImportError:  # pragma: no cover
        pass
    mod = type(df).__module__
    if mod.partition(".")[0] in ("dask", "dask_expr", "modin", "pyspark"):
        # the reference's dask/modin/pyspark backends are not carried over:
        # this engine distributes through Ray Datasets. Fail loudly with the
        # migration path instead of treating the frame as an invalid type.
        raise TypeError(
            f"{type(df).__module__}.{type(df).__name__} is not supported: "
            "liken_ray replaces the reference's dask/modin/pyspark backends "
            "with ray.data. Convert with ray.data.from_pandas / from_arrow / "
            "read_parquet and pass the Dataset."
        )
    raise TypeError(
        f"Invalid arg: df must be a pandas/polars DataFrame, pyarrow Table or "
        f"ray.data.Dataset, got {type(df).__name__}"
    )


def _from_arrow(table: pa.Table, kind: str) -> Any:
    if kind == "arrow":
        return table
    if kind == "pandas":
        return table.to_pandas()
    if kind == "polars":
        import polars as pl

        return pl.from_arrow(table)
    raise ValueError(kind)


class Dedupe:
    """Deduplicate a dataframe given a collection of dedupers.

    Mirrors the reference's public surface (``src/liken/liken.py:34-349``):
    ``apply`` (sequential / dict / pipeline) then a terminal
    ``drop_duplicates`` / ``canonicalize`` / ``canonicals`` / ``synthesize``.
    """

    def __init__(self, df: Any, /, *, scope: str = "global", **engine_kwargs: Any):
        self._df = df
        self._collection = CollectionsManager()
        self._is_ray = _is_ray_dataset(df)
        if not self._is_ray:
            _validate_local_input(df)  # eager, conversion-free type check
        self._scope = scope
        self._engine_kwargs = engine_kwargs
        self.has_been_canonicalized = False

    def apply(self, deduper) -> "Dedupe":
        self._collection.apply(deduper)
        return self

    def _execute(self, columns, keep, drop_duplicates, drop_canonical_id, id):
        if not self._collection.has_applies:
            self._collection.apply(_exact_factory())
        dedupers = self._collection.get()

        # ``id`` given at construction (``lk.dedupe(ds, id="rid")``) is the
        # default for every terminal verb; an ``id=`` on the verb itself
        # (reference surface: ``canonicalize(id=...)``) wins. Without the
        # merge the two collide into a duplicate-kwarg TypeError.
        engine_kwargs = dict(self._engine_kwargs)
        if id is None:
            id = engine_kwargs.pop("id", None)
        else:
            engine_kwargs.pop("id", None)

        if self._is_ray:
            from liken_ray.engine.executor import execute_plan_ray

            self._df = execute_plan_ray(
                self._df,
                dedupers,
                columns=columns,
                keep=keep,
                drop_duplicates=drop_duplicates,
                drop_canonical_id=drop_canonical_id,
                id=id,
                scope=self._scope,
                **engine_kwargs,
            )
        else:
            table, kind = _to_arrow(self._df)
            frame = LocalFrame(table, id)
            frame = execute_plan(
                frame,
                dedupers,
                columns=columns,
                keep=keep,
                drop_duplicates=drop_duplicates,
                drop_canonical_id=drop_canonical_id,
            )
            self._df = _from_arrow(frame.table, kind)
        self._collection.reset()

    def drop_duplicates(self, columns=None, *, keep: str = "first") -> Any:
        keep = validate_keep_arg(keep)
        columns = validate_columns_arg(columns, self._collection.is_sequential_applied)
        self._execute(columns, keep, drop_duplicates=True, drop_canonical_id=True, id=None)
        return self._df

    def canonicalize(
        self,
        columns=None,
        *,
        keep: str = "first",
        drop_duplicates: bool = False,
        id: str | None = None,
    ) -> "Dedupe":
        keep = validate_keep_arg(keep)
        columns = validate_columns_arg(columns, self._collection.is_sequential_applied)
        self._execute(
            columns, keep, drop_duplicates=drop_duplicates, drop_canonical_id=False, id=id
        )
        self.has_been_canonicalized = True
        return self

    def canonicals(self, n: int = 2) -> dict[Hashable, int]:
        if n < 2:
            raise ValueError("n must be >= 2")
        if not self.has_been_canonicalized:
            raise RuntimeError("No canonical_id counts found. Run `.canonicalize()` first.")
        if self._is_ray:
            from liken_ray.engine.executor import canonicals_counts_ray

            return canonicals_counts_ray(self._df, n)
        table, _ = _to_arrow(self._df)
        return canonicals_counts(table, n)

    def synthesize(self) -> Any:
        if self._is_ray:
            from liken_ray.engine.executor import synthesize_ray

            return synthesize_ray(self._df)
        table, kind = _to_arrow(self._df)
        return _from_arrow(synthesize_table(table), kind)

    def collect(self) -> Any:
        if self._is_ray:
            from liken_ray.engine.executor import strip_internal

            return strip_internal(self._df)
        return self._df

    def explain(self) -> str | None:
        return self._collection.pretty_get()


def dedupe(df: Any, /, *, scope: str = "global", spark_session: Any = None, **kw: Any) -> Dedupe:
    """Entry point. ``spark_session`` accepted for signature compatibility
    and ignored (no JVM in this engine — Ray Datasets replace Spark)."""
    del spark_session
    return Dedupe(df, scope=scope, **kw)
