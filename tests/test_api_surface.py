"""API-surface completeness: datasets module, pandas affordances, polars
backend, CLI entrypoint, explain()."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

import liken_ray as lk
from liken_ray import datasets
from liken_ray.constants import CANONICAL_ID


def test_fake_10_matches_golden_table():
    df = datasets.fake_10()
    assert list(df.columns)[:2] == ["id", "address"]
    assert len(df) == 10
    assert df["address"][0] == df["address"][7]  # the planted exact dup
    out = lk.dedupe(df).apply(lk.exact()).canonicalize("address").collect()
    assert list(out[CANONICAL_ID]) == [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]


def test_fake_1k_deterministic_with_trailing_dup():
    a = datasets.fake_1K()
    b = datasets.fake_1K()
    assert a.equals(b)
    assert len(a) == 1000
    assert tuple(a.iloc[-1]) == tuple(a.iloc[-2])


def test_fake_10_backends():
    import polars as pl
    import pyarrow as pa

    assert isinstance(datasets.fake_10("polars"), pl.DataFrame)
    assert isinstance(datasets.fake_10("arrow"), pa.Table)
    with pytest.raises(ValueError):
        datasets.fake_10("spark")


def test_pandas_affordances():
    import liken_ray.affordances  # noqa: F401  (registers accessors)

    df = datasets.fake_10()
    out = df.fuzzy.drop_duplicates("address", threshold=0.65)
    assert len(out) == 6  # golden: fuzzy 0.65 drop keeps 6 rows
    res = df.lsh.canonicalize("address", ngram=1, threshold=0.55, num_perm=128)
    assert list(res.collect()[CANONICAL_ID]) == [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]


def test_polars_roundtrip():
    import polars as pl

    df = pl.from_pandas(datasets.fake_10())
    out = lk.dedupe(df).apply(lk.exact()).canonicalize("address").collect()
    assert isinstance(out, pl.DataFrame)
    assert out[CANONICAL_ID].to_list() == [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]


def test_explain():
    d = lk.dedupe(datasets.fake_10()).apply(
        lk.pipeline().step(lk.col("address").lsh(threshold=0.8))
    )
    assert "lsh" in d.explain()


def test_cli_entrypoint(ray_session, tmp_path):
    from liken_ray.io.synth import write_pairs_dataset

    src = str(tmp_path / "src")
    write_pairs_dataset(src, n_rows=200, seed=5, shards=2)
    out_dir = str(tmp_path / "out")
    run_dir = str(tmp_path / "run")
    # in-process call (Ray already initialised by the session fixture)
    from liken_ray.pipelines import run as run_mod

    rc = run_mod.main(
        [
            "--input", os.path.join(src, "pairs"),
            "--output", out_dir,
            "--run-dir", run_dir,
        ]
    )
    assert rc == 0
    with open(os.path.join(run_dir, "summary.json")) as f:
        summary = json.load(f)
    assert summary["rows"] == 200
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(os.path.join(out_dir, "*.parquet"))
    assert files
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == 200


def test_extras_facade_exports():
    """Every documented LLM-pipeline operator is importable from the
    liken_ray.extras facade, and __all__ is exact (no dead names)."""
    import liken_ray.extras as ex

    assert len(ex.__all__) == len(set(ex.__all__))
    for name in ex.__all__:
        assert callable(getattr(ex, name)), name
    # one spot-check per family
    from liken_ray.extras import (  # noqa: F401
        asof_join,
        group_topk,
        hll_registers,
        merge_join,
        minhash_dedup,
        quality_metrics,
        semdedup,
        sessionize,
        topk_cosine_bruteforce,
    )
