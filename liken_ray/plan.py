"""Composition plan objects: Col / Pipeline / DeduplicationDict / manager.

These mirror the reference's three apply-APIs and their validation rules
(``src/liken/collections/{base,dict,pipelines}.py``), but are pure plan data
— compiled by the local executor or the Ray engine, never self-executing.

Semantics pinned by goldens:
- sequential applies accumulate under a default key; mixing with dict raises;
- pipeline steps: list-of-cols = AND (tuple-of-roots signature), predicates
  sorted to the front for rule predication;
- preprocessor precedence: col-level > step-level > pipeline-level.
"""

from __future__ import annotations

import warnings
from copy import deepcopy
from typing import NamedTuple

from liken_ray.constants import SEQUENTIAL_API_DEFAULT_KEY
from liken_ray.dedupers.core import (
    DEDUPER_REGISTRY,
    Columns,
    Deduper,
    PredicateDeduper,
)
from liken_ray.kernels.preprocess import Preprocessor


class InvalidDeduperError(Exception):
    pass


class PipelineUnit(NamedTuple):
    columns: Columns
    deduper: Deduper
    preprocessors: list[Preprocessor]


def _resolve_preprocessors(preprocessors) -> list[Preprocessor]:
    if not isinstance(preprocessors, list):
        preprocessors = [preprocessors]
    for p in preprocessors:
        if not isinstance(p, Preprocessor):
            raise TypeError(
                f"Invalid arg: preprocessor must be instance of Preprocessor, got {type(p).__name__}"
            )
    return list(preprocessors)


def col(columns: Columns, /, *, preprocessors=[]) -> "Col":
    """Convenience constructor for a pipeline unit."""
    return Col(columns, preprocessors=preprocessors)


def pipeline(preprocessors=[]) -> "Pipeline":
    """Convenience constructor for a Pipeline."""
    return Pipeline(preprocessors)


class Col:
    """One (columns, deduper, preprocessors) unit in the Pipeline API.
    Deduper factories resolve from the registry so custom-registered
    dedupers appear as methods automatically.
    """

    def __init__(self, columns: Columns, /, *, preprocessors=[]):
        self._columns = columns
        self._preprocessors = _resolve_preprocessors(preprocessors)
        self._unit: PipelineUnit | None = None

    def __getattr__(self, attr: str):
        if attr.startswith("__") or attr.startswith("_"):
            raise AttributeError(attr)
        try:
            factory = DEDUPER_REGISTRY[attr]
        except KeyError:
            raise AttributeError(f"unknown deduper {attr!r}")

        def wrapper(*args, **kwargs):
            deduper = factory(*args, **kwargs)
            self._unit = PipelineUnit(self._columns, deduper, self._preprocessors)
            return self

        return wrapper

    def __invert__(self) -> "Col":
        if self._unit is None:
            raise TypeError("cannot invert a Col without a deduper")
        columns, deduper, preprocessors = self._unit
        if not isinstance(deduper, PredicateDeduper):
            raise TypeError("Only predicate dedupers support inversion")
        new = Col(columns)
        new._unit = PipelineUnit(columns, ~deduper, preprocessors)
        return new

    @property
    def unit(self) -> PipelineUnit:
        if self._unit is None:
            raise ValueError("Col has no deduper attached — call e.g. lk.col('x').exact()")
        return self._unit

    def __str__(self) -> str:
        columns, deduper, _ = self.unit
        rep = str(deduper)
        prefix = "lk.col"
        if rep.startswith("~"):
            rep = rep[1:]
            prefix = "~lk.col"
        return f"{prefix}({columns!r}).{rep}"


class Pipeline:
    def __init__(self, preprocessors=[]):
        self._preprocessors = _resolve_preprocessors(preprocessors)
        self._steps: list[list[PipelineUnit]] = []

    def step(self, cols, /, *, preprocessors=[]) -> "Pipeline":
        step_pre = _resolve_preprocessors(preprocessors)
        if not step_pre:
            step_pre = self._preprocessors

        if isinstance(cols, Col):
            cols_list = [cols]
        elif isinstance(cols, list):
            cols_list = cols
        else:
            raise TypeError(
                "Must be an instance of Col, used as `lk.col(...)` or a list of the same."
            )

        units = [c.unit for c in cols_list]
        # preprocessor precedence: col-level wins, else step/pipeline level
        units = [
            u._replace(preprocessors=step_pre) if not u.preprocessors else u for u in units
        ]
        # predicates first for rule predication
        units = sorted(units, key=lambda u: not isinstance(u.deduper, PredicateDeduper))
        self._steps.append(units)
        return self

    @property
    def steps(self) -> list[list[PipelineUnit]]:
        return self._steps

    @staticmethod
    def has_any_predicate(step: list[PipelineUnit]) -> bool:
        return any(isinstance(u.deduper, PredicateDeduper) for u in step)

    def __str__(self) -> str:
        inner = ""
        for step in self._steps:
            inner += "\n\t.step(["
            for u in step:
                inner += f"\n\t\t({u.columns!r}, {u.deduper}),"
            inner += "\n\t])"
        return f"(\n\tlk.pipeline(){inner}\n)"


class DeduplicationDict(dict):
    """column(s) -> tuple of dedupers; validates member types on set."""

    def __init__(self, data=None):
        super().__init__()
        for k, v in (data or {}).items():
            self[k] = v

    def __setitem__(self, key, value):
        if not isinstance(key, (str, tuple)):
            raise InvalidDeduperError(
                f"Invalid type for dict key type: expected str or tuple, got '{type(key).__name__}'"
            )
        if isinstance(value, Deduper):
            value = (value,)
        elif isinstance(value, (list, tuple)):
            for i, member in enumerate(value):
                if not isinstance(member, Deduper):
                    raise InvalidDeduperError(
                        f"Invalid type for dict value member: at index {i} for key '{key}': "
                        f"expected Deduper, got '{type(member).__name__}'"
                    )
            value = tuple(value)
        else:
            raise InvalidDeduperError(
                f"Invalid type for dict value: expected list, tuple or Deduper, got '{type(value).__name__}'"
            )
        super().__setitem__(key, value)


class CollectionsManager:
    def __init__(self):
        self._dedupers: DeduplicationDict | Pipeline = DeduplicationDict(
            {SEQUENTIAL_API_DEFAULT_KEY: ()}
        )
        self.has_applies = False

    @property
    def is_sequential_applied(self) -> bool:
        if isinstance(self._dedupers, Pipeline):
            return False
        return set(self._dedupers) == {SEQUENTIAL_API_DEFAULT_KEY}

    def apply(self, deduper) -> None:
        self.has_applies = True

        if isinstance(deduper, Deduper):
            if not self.is_sequential_applied:
                raise InvalidDeduperError(
                    "Cannot apply a Deduper after a deduper mapping (dict) has been set."
                )
            current = self._dedupers[SEQUENTIAL_API_DEFAULT_KEY]
            self._dedupers[SEQUENTIAL_API_DEFAULT_KEY] = tuple(current) + (deduper,)
            return

        if isinstance(deduper, dict):
            if self._dedupers.get(SEQUENTIAL_API_DEFAULT_KEY):
                warnings.warn("Replacing previously added sequence deduper with a dict deduper")
            self._dedupers = DeduplicationDict(deduper)
            return

        if isinstance(deduper, Col):
            deduper = Pipeline().step(deduper)

        if isinstance(deduper, Pipeline):
            if isinstance(self._dedupers, Pipeline):
                warnings.warn("Replacing previously added Pipeline deduper with a new Pipeline")
            self._dedupers = deepcopy(deduper)
            return

        raise InvalidDeduperError(
            f"Invalid deduper: Expected a Deduper, a dict or Pipeline, got '{type(deduper).__name__}'"
        )

    def get(self) -> DeduplicationDict | Pipeline:
        return self._dedupers

    def pretty_get(self) -> str | None:
        d = self._dedupers
        if isinstance(d, DeduplicationDict):
            if self.is_sequential_applied:
                seq = d[SEQUENTIAL_API_DEFAULT_KEY]
                if not seq:
                    return None
                return ", ".join(str(s) for s in seq)
            return str(dict(d))
        return str(d)

    def reset(self) -> None:
        self._dedupers = DeduplicationDict({SEQUENTIAL_API_DEFAULT_KEY: ()})
        self.has_applies = False


def validate_keep_arg(keep: str) -> str:
    if keep not in ("first", "last"):
        raise ValueError(f"Invalid arg: keep arg must be one of 'first' or 'last', got {keep}")
    return keep


def validate_columns_arg(columns, is_sequential_applied: bool):
    if is_sequential_applied:
        if not columns:
            raise ValueError(
                "Invalid arg: columns cannot be None when using sequential API."
            )
        if isinstance(columns, tuple):
            seen = set()
            for label in columns:
                if label in seen:
                    raise ValueError(
                        f"Invalid arg: columns labels cannot be repeated. Repeated labels: '{label}'"
                    )
                seen.add(label)
    if not is_sequential_applied and columns:
        raise ValueError(
            "Invalid arg: columns must be None when using the dict API."
        )
    return columns
