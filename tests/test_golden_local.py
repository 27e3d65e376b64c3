"""Conformance goldens (local executor): deduper matrix, keep, drop, AND
steps, negation, canonical-id decision tree, synthesize, nulls,
preprocessors. Each matrix is ported from the reference integration suite
(citations in tests/goldens.py).
"""

from __future__ import annotations

import pandas as pd
import pytest

import liken_ray as lk
from liken_ray.constants import CANONICAL_ID
from tests import goldens as G


def _col(df, name):
    return [None if v is pd.NA or (isinstance(v, float) and v != v) else v for v in list(df[name])]


def simple_api(df, columns, factory, kwargs, drop_kwargs=None):
    return (
        lk.dedupe(df)
        .apply(factory(**kwargs))
        .canonicalize(columns, **(drop_kwargs or {}))
        .collect()
    )


def dict_api(df, columns, factory, kwargs, drop_kwargs=None):
    return (
        lk.dedupe(df)
        .apply({columns: [factory(**kwargs)]})
        .canonicalize(**(drop_kwargs or {}))
        .collect()
    )


def pipeline_api(df, columns, factory, kwargs, drop_kwargs=None):
    p = lk.pipeline().step(getattr(lk.col(columns), factory.__name__)(**kwargs))
    return lk.dedupe(df).apply(p).canonicalize(**(drop_kwargs or {})).collect()


API_BUILDERS = [simple_api, dict_api, pipeline_api]


@pytest.mark.parametrize("api_builder", API_BUILDERS)
@pytest.mark.parametrize("factory, columns, kwargs, expected", G.DEDUPER_MATRIX)
def test_matrix_dedupers(api_builder, factory, columns, kwargs, expected, dataframe10):
    df = api_builder(dataframe10, columns, factory, kwargs)
    assert _col(df, CANONICAL_ID) == expected


@pytest.mark.parametrize("api_builder", API_BUILDERS)
@pytest.mark.parametrize("factory, keep, columns, kwargs, expected", G.KEEP_MATRIX)
def test_matrix_keep(api_builder, factory, keep, columns, kwargs, expected, dataframe10):
    df = api_builder(dataframe10, columns, factory, kwargs, {"keep": keep})
    assert _col(df, CANONICAL_ID) == expected


@pytest.mark.parametrize("api_builder", API_BUILDERS)
@pytest.mark.parametrize("factory, columns, drop_kwargs, kwargs, expected", G.DROP_MATRIX)
def test_matrix_drop(api_builder, factory, columns, drop_kwargs, kwargs, expected, dataframe10):
    df = api_builder(dataframe10, columns, factory, kwargs, drop_kwargs)
    assert _col(df, CANONICAL_ID) == expected


@pytest.mark.parametrize("step_builder, expected", G.AND_MATRIX)
def test_matrix_and(step_builder, expected, dataframe10):
    df = (
        lk.dedupe(dataframe10)
        .apply(lk.pipeline().step(step_builder()))
        .canonicalize()
        .collect()
    )
    assert _col(df, CANONICAL_ID) == expected


@pytest.mark.parametrize("col_builder, expected", G.NEGATE_MATRIX)
def test_matrix_negates(col_builder, expected, dataframe10):
    df = (
        lk.dedupe(dataframe10)
        .apply(lk.pipeline().step(col_builder()))
        .canonicalize()
        .collect()
    )
    assert _col(df, CANONICAL_ID) == expected


@pytest.mark.parametrize("id, schema, data, expected", G.ID_MATRIX)
def test_matrix_id(id, schema, data, expected):
    df = pd.DataFrame(columns=schema, data=data)
    out = lk.dedupe(df).apply(lk.exact()).canonicalize("address", id=id).collect()
    assert _col(out, CANONICAL_ID) == expected


def test_matrix_synthesize():
    df = pd.DataFrame(columns=G.SYNTH_SCHEMA, data=G.SYNTH_DATA)
    result = lk.dedupe(df).apply(lk.exact()).canonicalize("address")
    out = result.collect()
    assert _col(out, CANONICAL_ID) == G.SYNTH_EXPECTED_CANONICAL
    synthesized = result.synthesize()
    for name, expected in G.SYNTH_EXPECTED.items():
        assert _col(synthesized, name) == expected, name
    assert result.canonicals() == G.SYNTH_EXPECTED_CANONICALS


@pytest.mark.parametrize("variant", ["none_none", "none_na", "na_na"])
@pytest.mark.parametrize("deduper_key", ["exact", "isna", "notna"])
def test_matrix_nulls(variant, deduper_key):
    na2 = {"none_none": None, "none_na": pd.NA, "na_na": pd.NA}[variant]
    na1 = pd.NA if variant == "na_na" else None
    df = pd.DataFrame(columns=["id", "address"], data=[[1, na1], [2, na2], [3, "random"]])
    deduper = {"exact": lk.exact(), "isna": lk.isna(), "notna": ~lk.isna()}[deduper_key]
    out = lk.dedupe(df).apply(deduper).canonicalize("address", id="id").collect()
    assert _col(out, CANONICAL_ID) == G.NULLS_EXPECTED[deduper_key]


@pytest.mark.parametrize("style", ["global", "step", "both"])
@pytest.mark.parametrize("pre_builder, data, expected", G.PREPROCESS_MATRIX)
def test_matrix_preprocessors(style, pre_builder, data, expected):
    pre = pre_builder()
    if style == "global":
        p = lk.pipeline(preprocessors=pre).step(lk.col("address").exact())
    elif style == "step":
        p = lk.pipeline().step(lk.col("address").exact(), preprocessors=pre)
    else:
        p = lk.pipeline(preprocessors=pre).step(
            lk.col("address", preprocessors=pre).exact()
        )
    df = pd.DataFrame(columns=["uid", "address"], data=data)
    out = lk.dedupe(df).apply(p).canonicalize().collect()
    assert _col(out, CANONICAL_ID) == expected


def test_default_exact_when_no_apply(dataframe10):
    out = lk.dedupe(dataframe10).drop_duplicates("address")
    assert len(out) == 8  # 10 rows, address dups (1,8) + null pair (5,9)
    assert CANONICAL_ID not in out.columns


def test_sequential_chaining_is_transitive(dataframe10):
    # two sequential dedupers accumulate labels (OR semantics)
    out = (
        lk.dedupe(dataframe10)
        .apply(lk.exact())
        .apply(lk.fuzzy(threshold=0.65))
        .canonicalize("address")
        .collect()
    )
    assert _col(out, CANONICAL_ID) == [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]
