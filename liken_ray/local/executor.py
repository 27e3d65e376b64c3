"""Local (single-table, in-memory Arrow) execution of a dedupe plan.

This is the semantic core: it reproduces the reference's clustering /
canonicalization behaviour exactly (conformance goldens in
``tests/test_golden_*.py`` pin it) and doubles as the per-bucket verify
kernel the distributed engine calls inside ``map_groups``.

Composition semantics reproduced (reference ``src/liken/core/executor.py:54-139``):
- sequential/dict applies: one union-find per deduper, re-canonicalizing on
  top of previous labels (transitive OR chaining);
- pipeline steps without predicates: AND via tuple-of-roots signatures;
- pipeline steps with >=1 predicate: rule predication — predicates run first,
  their matched rows subset the arrays of subsequent units, final unit's
  components canonicalize;
- canonicalizer: representative = min (keep="first") / max ("last") member;
  the new canonical value is the *previous* canonical value at the
  representative row (``core/deduper.py:127-155``) — what makes steps chain.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liken_ray.constants import CANONICAL_ID, NA_PLACEHOLDER, SEQUENTIAL_API_DEFAULT_KEY
from liken_ray.dedupers.core import Columns, Deduper, PredicateDeduper
from liken_ray.engine.components import UnionFind
from liken_ray.kernels.preprocess import Preprocessor, apply_preprocessors
from liken_ray.plan import DeduplicationDict, Pipeline, PipelineUnit


class LocalFrame:
    """A pyarrow Table plus canonical-id management."""

    def __init__(self, table: pa.Table, id: str | None = None):
        self.table = self._add_canonical_id(table, id)

    # canonical-id creation decision tree (reference
    # ``core/wrapper.py:137-153``; goldens ``test_matrix_id.py``)
    @staticmethod
    def _add_canonical_id(table: pa.Table, id: str | None) -> pa.Table:
        has_canonical = CANONICAL_ID in table.column_names
        if has_canonical:
            if id and id != CANONICAL_ID:
                return table.set_column(
                    table.column_names.index(CANONICAL_ID),
                    CANONICAL_ID,
                    table[id],
                )
            return table
        if id:
            return table.append_column(CANONICAL_ID, table[id])
        return table.append_column(
            CANONICAL_ID, pa.array(np.arange(table.num_rows, dtype=np.int64))
        )

    def get_array(self, columns: Columns, with_na: bool = False) -> pa.Array | pa.Table:
        if isinstance(columns, str):
            col = self.table[columns]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if with_na:
                if pa.types.is_null(col.type):  # all-null column
                    col = col.cast(pa.string())
                return pc.coalesce(col, NA_PLACEHOLDER)
            return col
        return self.table.select(list(columns))

    def get_canonical(self) -> pa.Array:
        return self.get_array(CANONICAL_ID)

    def put_canonical(self, values: list) -> None:
        arr = pa.array(values)
        self.table = self.table.set_column(
            self.table.column_names.index(CANONICAL_ID), CANONICAL_ID, arr
        )

    def drop_canonical(self) -> None:
        self.table = self.table.drop_columns([CANONICAL_ID])

    def drop_duplicates(self, keep: str) -> None:
        """Keep the first/last row per canonical_id in row order."""
        canon = self.get_canonical().to_pylist()
        seen: dict[Any, int] = {}
        if keep == "first":
            order = range(len(canon))
        else:
            order = range(len(canon) - 1, -1, -1)
        for i in order:
            seen.setdefault(canon[i], i)
        kept = sorted(seen.values())
        self.table = self.table.take(pa.array(kept, type=pa.int64()))


# ---------------------------------------------------------------------------
# plan execution
# ---------------------------------------------------------------------------


def _build_components(
    frame: LocalFrame,
    unit_columns: Columns,
    deduper: Deduper,
    preprocessors: list[Preprocessor],
    predicate: set[int],
) -> tuple[UnionFind, int]:
    deduper.validate(unit_columns)
    data = frame.get_array(unit_columns, with_na=deduper.with_na_placeholder)
    if isinstance(data, pa.Array) and preprocessors:
        data = apply_preprocessors(data, preprocessors)
    if predicate:
        data = data.take(pa.array(sorted(predicate), type=pa.int64()))
    n = len(data)
    uf = UnionFind(n)
    for i, j in deduper.pairs(data):
        uf.union(i, j)
    return uf, n


def _canonicalize(
    frame: LocalFrame,
    components: dict[Any, list[int]],
    keep: str,
) -> None:
    canonicals = frame.get_canonical().to_pylist()
    n = len(canonicals)
    rep_index: dict[int, int] = {}
    for members in components.values():
        rep = min(members) if keep == "first" else max(members)
        for member in members:
            rep_index[member] = rep
    frame.put_canonical([canonicals[rep_index.get(i, i)] for i in range(n)])


def execute_plan(
    frame: LocalFrame,
    dedupers: DeduplicationDict | Pipeline,
    columns: Columns | None,
    keep: str,
    drop_duplicates: bool,
    drop_canonical_id: bool,
) -> LocalFrame:
    if isinstance(dedupers, DeduplicationDict):
        if not columns:
            items = [
                (col, d) for col, ds in dedupers.items() for d in ds
            ]
        else:
            items = [(columns, d) for d in dedupers[SEQUENTIAL_API_DEFAULT_KEY]]
        for col, deduper in items:
            uf, n = _build_components(frame, col, deduper, [], set())
            _canonicalize(frame, uf.components(n), keep)

    elif isinstance(dedupers, Pipeline):
        for step in dedupers.steps:
            if Pipeline.has_any_predicate(step):
                indices: set[int] = set()
                components: dict[Any, list[int]] = {}
                for unit in step:
                    uf, n = _build_components(
                        frame, unit.columns, unit.deduper, unit.preprocessors, indices
                    )
                    components = defaultdict(list)
                    idx = sorted(indices)
                    for i in range(n):
                        if not indices:
                            components[uf.find(i)].append(i)
                        else:
                            components[idx[uf.find(i)]].append(idx[i])
                    if isinstance(unit.deduper, PredicateDeduper):
                        for members in components.values():
                            if len(members) > 1:
                                indices = indices.union(members)
            else:
                ufs: list[UnionFind] = []
                n = 0
                for unit in step:
                    uf, n = _build_components(
                        frame, unit.columns, unit.deduper, unit.preprocessors, set()
                    )
                    ufs.append(uf)
                components = defaultdict(list)
                for i in range(n):
                    components[tuple(uf.find(i) for uf in ufs)].append(i)
            _canonicalize(frame, components, keep)
    else:
        raise TypeError(f"unknown plan type {type(dedupers).__name__}")

    if drop_duplicates:
        frame.drop_duplicates(keep)
    if drop_canonical_id:
        frame.drop_canonical()
    return frame


# ---------------------------------------------------------------------------
# terminal helpers (synthesize / canonicals)
# ---------------------------------------------------------------------------


def synthesize_table(table: pa.Table) -> pa.Table:
    """Golden record per canonical_id: first non-null value per column in row
    order; groups ordered by canonical_id ascending (reference
    ``backends/pandas/wrapper.py:89-94``)."""
    canon = table[CANONICAL_ID].to_pylist()
    groups: dict[Any, list[int]] = defaultdict(list)
    for i, c in enumerate(canon):
        groups[c].append(i)
    try:
        keys = sorted(groups)
    except TypeError:
        keys = list(groups)
    cols: dict[str, list] = {name: [] for name in table.column_names}
    pydata = {name: table[name].to_pylist() for name in table.column_names}
    for key in keys:
        members = groups[key]
        for name in table.column_names:
            if name == CANONICAL_ID:
                cols[name].append(key)
                continue
            value = None
            for m in members:
                v = pydata[name][m]
                if v is not None and v == v:
                    value = v
                    break
            cols[name].append(value)
    # canonical_id leads, mirroring a groupby-as-index reset
    names = [CANONICAL_ID] + [n for n in table.column_names if n != CANONICAL_ID]
    return pa.table({n: pa.array(cols[n], type=table.schema.field(n).type) for n in names})


def canonicals_counts(table: pa.Table, n: int = 2) -> dict[Any, int]:
    counts: dict[Any, int] = {}
    for cid in table[CANONICAL_ID].to_pylist():
        counts[cid] = counts.get(cid, 0) + 1
    return {cid: c for cid, c in counts.items() if c >= n}
