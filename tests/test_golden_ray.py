"""Conformance goldens for the distributed Ray engine (global scope) plus
the partition-scope compatibility mode.

Global scope must reproduce the reference's *local* clustering semantics at
any block count (that is what dup-pair recall vs the reference means);
partition scope reproduces the reference Ray backend's batch-local
clustering (reference ``tests/integration/test_matrix_partitioned.py``).
"""

from __future__ import annotations

import pandas as pd
import pytest

import liken_ray as lk
from liken_ray.constants import CANONICAL_ID
from tests import goldens as G


def _mk_ds(df: pd.DataFrame, nblocks: int):
    import ray.data

    return ray.data.from_pandas(df).repartition(nblocks)


def _ids(ds, key="id"):
    rows = sorted(ds.take_all(), key=lambda r: r[key])
    return [r[CANONICAL_ID] for r in rows]


# representative slice of the deduper matrix: every operator family,
# including the shuffle paths (exact groupby, lsh band shuffle) and the
# guarded pairwise path
RAY_MATRIX = [
    (lk.exact, G.SINGLE_COL, {}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.exact, G.CATEGORICAL_COMPOUND_COL, {}, [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.fuzzy, G.SINGLE_COL, {"threshold": 0.65}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.cosine, G.NUMERICAL_COMPOUND_COL, {"threshold": 0.99}, [0, 0, 0, 0, 0, 0, 6, 7, 0, 0]),
    (lk.jaccard, G.CATEGORICAL_COMPOUND_COL, {"threshold": 0.35}, [0, 0, 2, 3, 0, 0, 3, 7, 0, 9]),
    (lk.lsh, G.SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 128}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    (lk.lsh, G.SINGLE_COL, {"ngram": 2, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, G.SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 32}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.tfidf, G.SINGLE_COL, {"ngram": 1, "threshold": 0.80, "topn": 2}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 1]),
    (lk.str_contains, G.SINGLE_COL, {"pattern": r"05\d{3}", "case": False, "regex": True}, [0, 1, 2, 2, 4, 2, 6, 7, 8, 9]),
    (lk.str_len, "email", {"min_len": 15, "max_len": 22}, [0, 1, 2, 0, 4, 5, 0, 0, 8, 9]),
    (lk.isna, G.SINGLE_COL, {}, [0, 1, 2, 3, 4, 5, 6, 7, 4, 9]),
    (G.strings_same_len, "email", {"min_len": 3}, [0, 1, 2, 3, 2, 2, 6, 3, 8, 9]),
]


@pytest.mark.parametrize("nblocks", [1, 4])
@pytest.mark.parametrize("factory, columns, kwargs, expected", RAY_MATRIX)
def test_ray_matrix(ray_session, dataframe10, nblocks, factory, columns, kwargs, expected):
    ds = _mk_ds(dataframe10, nblocks)
    out = lk.dedupe(ds).apply(factory(**kwargs)).canonicalize(columns, id="id").collect()
    # with id="id", canonical values come from the 1-based id column
    expected_ids = [dataframe10["id"].iloc[e] for e in expected]
    assert _ids(out) == expected_ids


def test_ray_autoincrement_canonical(ray_session, dataframe10):
    # no id -> positional auto-increment labels, exact golden vector
    ds = _mk_ds(dataframe10, 3)
    out = lk.dedupe(ds).apply(lk.exact()).canonicalize("address").collect()
    assert _ids(out) == [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]


def test_ray_keep_last(ray_session, dataframe10):
    ds = _mk_ds(dataframe10, 4)
    out = (
        lk.dedupe(ds)
        .apply(lk.exact())
        .canonicalize("address", keep="last")
        .collect()
    )
    assert _ids(out) == [7, 1, 2, 3, 8, 5, 6, 7, 8, 9]


def test_ray_drop_duplicates(ray_session, dataframe10):
    ds = _mk_ds(dataframe10, 4)
    out = lk.dedupe(ds).apply(lk.exact()).drop_duplicates("address")
    rows = out.take_all()
    assert len(rows) == 8
    assert CANONICAL_ID not in out.schema().names
    # original row order preserved
    assert [r["id"] for r in rows] == [1, 2, 3, 4, 5, 6, 7, 10]


def test_ray_and_step_with_predication(ray_session, dataframe10):
    ds = _mk_ds(dataframe10, 2)
    p = lk.pipeline().step([lk.col("property_height").isna(), lk.col("account").exact()])
    out = lk.dedupe(ds).apply(p).canonicalize().collect()
    assert _ids(out) == [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]


def test_ray_and_step_two_thresholds(ray_session, dataframe10):
    ds = _mk_ds(dataframe10, 4)
    p = lk.pipeline().step(
        [lk.col("birth_country").exact(), lk.col("marital_status").exact()]
    )
    out = lk.dedupe(ds).apply(p).canonicalize().collect()
    assert _ids(out) == [0, 0, 2, 3, 4, 3, 6, 7, 6, 9]


def test_ray_negation(ray_session, dataframe10):
    ds = _mk_ds(dataframe10, 2)
    out = (
        lk.dedupe(ds)
        .apply(lk.pipeline().step(~lk.col("address").isna()))
        .canonicalize()
        .collect()
    )
    assert _ids(out) == [0, 0, 0, 0, 4, 0, 0, 0, 8, 0]


def test_ray_sequential_chaining(ray_session, dataframe10):
    ds = _mk_ds(dataframe10, 4)
    out = (
        lk.dedupe(ds)
        .apply(lk.exact())
        .apply(lk.fuzzy(threshold=0.65))
        .canonicalize("address")
        .collect()
    )
    assert _ids(out) == [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]


def test_ray_synthesize_and_canonicals(ray_session):
    df = pd.DataFrame(columns=G.SYNTH_SCHEMA, data=G.SYNTH_DATA)
    ds = _mk_ds(df, 2)
    res = lk.dedupe(ds).apply(lk.exact()).canonicalize("address")
    assert res.canonicals() == G.SYNTH_EXPECTED_CANONICALS
    synth = res.synthesize()
    rows = sorted(synth.take_all(), key=lambda r: r[CANONICAL_ID])
    for name, expected in G.SYNTH_EXPECTED.items():
        assert [r[name] for r in rows] == expected, name


def test_ray_preprocessors(ray_session):
    df = pd.DataFrame(columns=["uid", "address"], data=[[0, "123AB, OL5"], [1, "123ab, OL5"]])
    ds = _mk_ds(df, 2)
    p = lk.pipeline(preprocessors=[lk.preprocessors.lower()]).step(lk.col("address").exact())
    out = lk.dedupe(ds).apply(p).canonicalize().collect()
    assert _ids(out, key="uid") == [0, 0]


# partition-scope compatibility (reference test_matrix_partitioned.py:13-14):
# split on blocking_key -> no cross-partition dedup


def test_partition_scope(ray_session, dataframe10):
    import ray.data

    df = dataframe10.assign(blocking_key=["key_2"] * 5 + ["key_1"] * 5)
    dedupers = {"address": (lk.exact(),), "email": (lk.exact(),)}

    ds1 = ray.data.from_pandas(df).repartition(1)
    out1 = lk.dedupe(ds1, scope="partition").apply(dedupers).canonicalize(id="id").collect()
    assert _ids(out1) == [1, 2, 3, 4, 5, 5, 7, 1, 5, 10]

    # one block per blocking key (explicit key split; `repartition(keys=...)`
    # needs the hash-shuffle strategy which is not the default here)
    ds2 = ray.data.from_pandas(
        [df[df.blocking_key == k].reset_index(drop=True) for k in ("key_2", "key_1")]
    )
    out2 = lk.dedupe(ds2, scope="partition").apply(dedupers).canonicalize(id="id").collect()
    assert sorted(_ids(out2)) == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
