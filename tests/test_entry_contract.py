"""Driver-contract smoke: entry() runs; oracle-backed queries match DuckDB
on sf0.001 (the full sweep runs in the driver at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _to_pandas(x):
    import pyarrow as pa

    if isinstance(x, pa.Table):
        return x.to_pandas()
    if isinstance(x, pd.DataFrame):
        return x
    return x.to_pandas()


def test_entry_runs(ray_session):
    out = _to_pandas(entry_mod.entry())
    assert len(out) > 0
    assert "canonical_id" in out.columns


# every oracle-backed query is checked — the list is derived from
# oracle_sql() itself so a new entry can't silently skip the gate
@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(ray_session, con, name):
    got = _to_pandas(entry_mod.queries()[name](SF))
    want = con.execute(entry_mod.oracle_sql()[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w)
    for c in cols:
        assert (g[c].astype(str).values == w[c].astype(str).values).all(), c


def test_rows_only_queries_run(ray_session):
    # every query now carries an oracle (full-probe IVF is provably exact)
    rows_only = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))
    assert rows_only == []


def test_every_oracle_key_has_a_query():
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs, name
