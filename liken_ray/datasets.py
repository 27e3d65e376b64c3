"""Synthetic datasets (API parity with the reference's ``lk.datasets``:
``fake_10 / fake_1K / fake_100K / fake_1M`` — reference
``src/liken/datasets.py:122-228``).

The 10-row table is the exact golden fixture (2 null addresses, one
repeated address, near-dup addresses — the corpus all conformance goldens
run against). The larger tables are deterministic numpy-seeded people
records (no third-party faker; same shape: 14 columns, ~2% nulls, last row
duplicated), so results are reproducible across processes.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

_SCHEMA10 = [
    "id", "address", "email", "account",
    "birth_country", "marital_status", "number_children", "property_type",
    "property_height", "property_area_sq_ft", "property_sea_level_elevation_m",
    "property_num_rooms",
]

_DATA10 = [
    (1, "123ab, OL5 9PL, UK", "bbab@example.com", "reddit", "spain", "married", 1, "rental", None, 545, 5, 3),
    (2, "99 Ambleside avenue park Road, ED3 3RT, Edinburgh, United Kingdom", "awesome_surfer_77@yahoo.com", "reddit", "spain", "married", 1, "rental", None, 452, 6, 3),
    (3, "Calle Ancho, 12, 05688, Rioja, Navarra, Espana", "a@example.com", "facebook", "germany", "single", 2, "rental", 2.5, 623, 5, 3),
    (4, "Calle Sueco, 56, 05688, Rioja, Navarra", "hellothere@example.com", "pinterest", "japan", "married", 0, "owner", 4.0, 2077, 305, 6),
    (5, None, "b@example.com", "linkedin", "france", "married", 1, "rental", 2.7, 1045, 42, 4),
    (6, "C. Ancho 49, 05687, Navarra", "b@example.com", "reddit", "japan", "married", 1, "rental", 2.5, 1323, 132, 4),
    (7, "Ambleside avenue Park Road ED3, UK", "hellthere@example.com", "reddit", "germany", "married", 0, "owner", 2.5, 509, 200, 2),
    (8, "123ab, OL5 9PL, UK", "hellathere@example.com", "facebook", "japan", "single", 3, "owner", 2.5, 500, 300, 3),
    (9, None, "yet.another.email@msn.com", "flickr", "germany", "married", 1, "rental", 2.5, 345, 22, 3),
    (10, "66b Porters street, OL5 9PL, Newark, United Kingdom", "bab@example.com", "flickr", "malaysia", "single", 0, "owner", 2.5, 4000, 25, 8),
]

_FIRST = ["ana", "liu", "omar", "kai", "maria", "tomas", "aiko", "lena", "ravi", "nina",
          "jon", "sara", "pavel", "ines", "yuki", "dmitri", "elena", "marco", "wei", "tara"]
_LAST = ["silva", "chen", "haddad", "tanaka", "novak", "rossi", "kim", "berg", "patel",
         "olsen", "mora", "sato", "koch", "lima", "das", "ek", "roy", "bauer", "nagy", "vidal"]
_CITY = ["lisbon", "osaka", "tartu", "quito", "leeds", "graz", "pune", "malmo", "turin", "busan"]
_COUNTRY = ["portugal", "japan", "estonia", "ecuador", "uk", "austria", "india", "sweden", "italy", "korea"]
_COMPANY = ["Vertex Labs", "Bluegrain Ltd", "Northway LLC", "Quanta Co", "Hollis Group",
            "Ferrostat AG", "Midline Inc", "Oakbeam Pty", "Sunward BV", "Crestpoint SA"]
_JOB = ["engineer", "analyst", "designer", "teacher", "nurse", "chef", "pilot", "editor",
        "surveyor", "clerk"]


def _maybe_null(rng: np.random.Generator, value: Any, p: float = 0.02) -> Any:
    return None if rng.random() < p else value


def _fake_people(n: int, seed: int = 123) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n - 1):
        first = _FIRST[rng.integers(len(_FIRST))]
        last = _LAST[rng.integers(len(_LAST))]
        city = _CITY[rng.integers(len(_CITY))]
        rows.append(
            (
                f"{i:08x}-{int(rng.integers(1 << 32)):08x}",
                _maybe_null(rng, first.title()),
                _maybe_null(rng, last.title()),
                _maybe_null(rng, f"{first}.{last}{int(rng.integers(100))}@example.com"),
                _maybe_null(rng, f"+{int(rng.integers(1, 99))} {int(rng.integers(100, 999))} {int(rng.integers(1000, 9999))}"),
                _maybe_null(rng, f"{int(rng.integers(1, 999))} {last.title()} street, {city.title()}"),
                _maybe_null(rng, city.title()),
                _maybe_null(rng, _COUNTRY[rng.integers(len(_COUNTRY))].title()),
                _maybe_null(rng, _COMPANY[rng.integers(len(_COMPANY))]),
                _maybe_null(rng, _JOB[rng.integers(len(_JOB))]),
                _maybe_null(rng, f"19{int(rng.integers(50, 99)):02d}-{int(rng.integers(1, 12)):02d}-{int(rng.integers(1, 28)):02d}"),
                _maybe_null(rng, f"202{int(rng.integers(0, 6))}-{int(rng.integers(1, 12)):02d}-{int(rng.integers(1, 28)):02d}"),
                _maybe_null(rng, round(float(rng.uniform(30000, 150000)), 2)),
                bool(rng.integers(2)),
            )
        )
    rows.append(rows[-1])  # duplicate the last row for quick-glance dedup
    schema = [
        "id", "first_name", "last_name", "email", "phone", "address", "city",
        "country", "company", "job", "date_of_birth", "signup_date", "salary",
        "is_active",
    ]
    return pd.DataFrame(rows, columns=schema)


def _as_backend(df: pd.DataFrame, backend: str):
    if backend == "pandas":
        return df
    if backend == "polars":
        import polars as pl

        return pl.from_pandas(df)
    if backend == "ray":
        import ray.data

        return ray.data.from_pandas(df)
    if backend == "arrow":
        import pyarrow as pa

        return pa.Table.from_pandas(df, preserve_index=False)
    raise ValueError(f"Unsupported backend: {backend}")


def fake_10(backend: str = "pandas", spark_session: Any = None):
    """The 10-row golden table."""
    del spark_session
    return _as_backend(pd.DataFrame(_DATA10, columns=_SCHEMA10), backend)


def fake_1K(backend: str = "pandas", spark_session: Any = None):
    del spark_session
    return _as_backend(_fake_people(1_000), backend)


def fake_100K(backend: str = "pandas", spark_session: Any = None):
    del spark_session
    return _as_backend(_fake_people(100_000), backend)


def fake_1M(backend: str = "pandas", spark_session: Any = None):
    del spark_session
    return _as_backend(_fake_people(1_000_000), backend)
