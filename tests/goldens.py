"""Conformance fixtures ported from the reference test corpus.

These are executable goldens encoding the reference's exact clustering
semantics (reference files cited per block). Data + expected vectors only —
no reference code. If an engine result mismatches a golden, the engine is
wrong: fix the kernel, never the golden.
"""

from __future__ import annotations

import unicodedata

import liken_ray as lk

# ---------------------------------------------------------------------------
# the 10-row golden table (reference src/liken/datasets.py:27-44)
# ---------------------------------------------------------------------------

SCHEMA10 = [
    "id", "address", "email", "account",
    "birth_country", "marital_status", "number_children", "property_type",
    "property_height", "property_area_sq_ft", "property_sea_level_elevation_m",
    "property_num_rooms",
]

DATA10 = [
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

SINGLE_COL = "address"
CATEGORICAL_COMPOUND_COL = (
    "account", "birth_country", "marital_status", "number_children", "property_type",
)
NUMERICAL_COMPOUND_COL = (
    "property_height", "property_area_sq_ft",
    "property_sea_level_elevation_m", "property_num_rooms",
)


# custom pair-gen used across the reference matrices
@lk.custom.register
def strings_same_len(array, min_len: int = 3):
    n = len(array)
    for i in range(n):
        for j in range(i + 1, n):
            if len(array[i]) >= min_len and len(array[j]) >= min_len and len(array[i]) == len(array[j]):
                yield i, j


# ---------------------------------------------------------------------------
# deduper matrix (reference tests/integration/test_matrix_dedupers.py:77-180)
# each: (factory, columns, kwargs, expected canonical_id)
# ---------------------------------------------------------------------------

DEDUPER_MATRIX = [
    # CUSTOM
    (strings_same_len, "email", {"min_len": 3}, [0, 1, 2, 3, 2, 2, 6, 3, 8, 9]),
    (strings_same_len, "email", {"min_len": 15}, [0, 1, 2, 3, 4, 5, 6, 3, 8, 9]),
    # EXACT
    (lk.exact, SINGLE_COL, {}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.exact, CATEGORICAL_COMPOUND_COL, {}, [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    # FUZZY
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.95}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.95, "scorer": "partial_ratio"}, [0, 1, 2, 3, 2, 5, 6, 0, 2, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.85}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.75}, [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.65}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.55}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.45}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 1]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.35}, [0, 0, 2, 2, 4, 2, 0, 0, 4, 0]),
    (lk.fuzzy, SINGLE_COL, {"threshold": 0.25}, [0, 0, 0, 0, 4, 0, 0, 0, 4, 0]),
    # COSINE
    (lk.cosine, NUMERICAL_COMPOUND_COL, {"threshold": 0.999}, [0, 0, 0, 3, 0, 0, 6, 7, 0, 0]),
    (lk.cosine, NUMERICAL_COMPOUND_COL, {"threshold": 0.99}, [0, 0, 0, 0, 0, 0, 6, 7, 0, 0]),
    (lk.cosine, NUMERICAL_COMPOUND_COL, {"threshold": 0.98}, [0, 0, 0, 0, 0, 0, 6, 6, 0, 0]),
    # JACCARD
    (lk.jaccard, CATEGORICAL_COMPOUND_COL, {"threshold": 0.65}, [0, 0, 2, 3, 4, 0, 6, 7, 8, 9]),
    (lk.jaccard, CATEGORICAL_COMPOUND_COL, {"threshold": 0.35}, [0, 0, 2, 3, 0, 0, 3, 7, 0, 9]),
    # LSH (pin MinHash/band parity)
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.95, "num_perm": 128}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.85, "num_perm": 128}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.75, "num_perm": 128}, [0, 1, 2, 3, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.65, "num_perm": 128}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 128}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.35, "num_perm": 128}, [0, 1, 1, 1, 4, 1, 1, 0, 4, 0]),
    (lk.lsh, SINGLE_COL, {"ngram": 2, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 3, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 32}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 64}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"ngram": 1, "threshold": 0.55, "num_perm": 128}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 9]),
    # STR STARTSWITH
    (lk.str_startswith, SINGLE_COL, {"pattern": "zzzzz", "case": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, SINGLE_COL, {"pattern": "zzzzz", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, SINGLE_COL, {"pattern": "calle", "case": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, SINGLE_COL, {"pattern": "calle", "case": False}, [0, 1, 2, 2, 4, 5, 6, 7, 8, 9]),
    # STR ENDSWITH
    (lk.str_endswith, SINGLE_COL, {"pattern": "zzzzz", "case": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, SINGLE_COL, {"pattern": "zzzzz", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, SINGLE_COL, {"pattern": "kingdom", "case": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, SINGLE_COL, {"pattern": "kingdom", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 1]),
    # STR LEN
    (lk.str_len, "email", {"min_len": 10, "max_len": 9}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_len, "email", {"min_len": 101, "max_len": 201}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_len, "email", {}, [0, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
    (lk.str_len, "email", {"min_len": 15, "max_len": 22}, [0, 1, 2, 0, 4, 5, 0, 0, 8, 9]),
    # STR CONTAINS
    (lk.str_contains, SINGLE_COL, {"pattern": "zzzzz", "case": True, "regex": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "zzzzz", "case": False, "regex": True}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "zzzzz", "case": True, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "zzzzz", "case": False, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "ol5 9pl", "case": True, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": "ol5 9pl", "case": False, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 0, 8, 0]),
    (lk.str_contains, SINGLE_COL, {"pattern": r"05\d{3}", "case": True, "regex": True}, [0, 1, 2, 2, 4, 2, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"pattern": r"05\d{3}", "case": False, "regex": True}, [0, 1, 2, 2, 4, 2, 6, 7, 8, 9]),
    # TFIDF
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.95, "topn": 2}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.80, "topn": 2}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 1]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.65, "topn": 2}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 1]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.50, "topn": 2}, [0, 1, 2, 2, 4, 2, 1, 0, 4, 1]),
    (lk.tfidf, SINGLE_COL, {"ngram": (1, 2), "threshold": 0.80, "topn": 2}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": (1, 3), "threshold": 0.80, "topn": 2}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": (2, 3), "threshold": 0.80, "topn": 2}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.80, "topn": 1}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.tfidf, SINGLE_COL, {"ngram": 1, "threshold": 0.80, "topn": 3}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 1]),
    # ISNA
    (lk.isna, SINGLE_COL, {}, [0, 1, 2, 3, 4, 5, 6, 7, 4, 9]),
]


# ---------------------------------------------------------------------------
# keep matrix (reference tests/integration/test_matrix_keep.py:88-129)
# each: (factory, keep, columns, kwargs, expected)
# ---------------------------------------------------------------------------

KEEP_MATRIX = [
    (strings_same_len, "first", "email", {"min_len": 3}, [0, 1, 2, 3, 2, 2, 6, 3, 8, 9]),
    (strings_same_len, "last", "email", {"min_len": 3}, [0, 1, 5, 7, 5, 5, 6, 7, 8, 9]),
    (lk.exact, "first", SINGLE_COL, {}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.exact, "last", SINGLE_COL, {}, [7, 1, 2, 3, 8, 5, 6, 7, 8, 9]),
    (lk.exact, "first", CATEGORICAL_COMPOUND_COL, {}, [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.exact, "last", CATEGORICAL_COMPOUND_COL, {}, [1, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.fuzzy, "first", SINGLE_COL, {"threshold": 0.65}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.fuzzy, "last", SINGLE_COL, {"threshold": 0.65}, [7, 6, 3, 3, 8, 5, 6, 7, 8, 9]),
    (lk.cosine, "first", NUMERICAL_COMPOUND_COL, {"threshold": 0.99}, [0, 0, 0, 0, 0, 0, 6, 7, 0, 0]),
    (lk.cosine, "last", NUMERICAL_COMPOUND_COL, {"threshold": 0.99}, [9, 9, 9, 9, 9, 9, 6, 7, 9, 9]),
    (lk.jaccard, "first", CATEGORICAL_COMPOUND_COL, {"threshold": 0.65}, [0, 0, 2, 3, 4, 0, 6, 7, 8, 9]),
    (lk.jaccard, "last", CATEGORICAL_COMPOUND_COL, {"threshold": 0.65}, [5, 5, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.lsh, "first", SINGLE_COL, {"ngram": 2, "threshold": 0.45, "num_perm": 128}, [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    (lk.lsh, "last", SINGLE_COL, {"ngram": 2, "threshold": 0.45, "num_perm": 128}, [7, 1, 3, 3, 8, 5, 6, 7, 8, 9]),
    (lk.str_startswith, "first", SINGLE_COL, {"pattern": "calle", "case": False}, [0, 1, 2, 2, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, "last", SINGLE_COL, {"pattern": "calle", "case": False}, [0, 1, 3, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, "first", SINGLE_COL, {"pattern": "kingdom", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 1]),
    (lk.str_endswith, "last", SINGLE_COL, {"pattern": "kingdom", "case": False}, [0, 9, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.str_contains, "first", SINGLE_COL, {"pattern": "ol5 9pl", "case": False, "regex": False}, [0, 1, 2, 3, 4, 5, 6, 0, 8, 0]),
    (lk.str_contains, "last", SINGLE_COL, {"pattern": "ol5 9pl", "case": False, "regex": False}, [9, 1, 2, 3, 4, 5, 6, 9, 8, 9]),
    (lk.tfidf, "first", SINGLE_COL, {"ngram": (1, 2), "threshold": 0.80, "topn": 2}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.tfidf, "last", SINGLE_COL, {"ngram": (1, 2), "threshold": 0.80, "topn": 2}, [7, 6, 3, 3, 8, 5, 6, 7, 8, 9]),
]


# ---------------------------------------------------------------------------
# drop matrix (reference tests/integration/test_matrix_drop.py:84-128)
# each: (factory, columns, drop_kwargs, deduper_kwargs, expected)
# ---------------------------------------------------------------------------

DROP_MATRIX = [
    (strings_same_len, "email", {"drop_duplicates": False}, {"min_len": 3}, [0, 1, 2, 3, 2, 2, 6, 3, 8, 9]),
    (strings_same_len, "email", {"drop_duplicates": True}, {"min_len": 3}, [0, 1, 2, 3, 6, 8, 9]),
    (lk.exact, SINGLE_COL, {"drop_duplicates": False}, {}, [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lk.exact, SINGLE_COL, {"drop_duplicates": True}, {}, [0, 1, 2, 3, 4, 5, 6, 9]),
    (lk.exact, CATEGORICAL_COMPOUND_COL, {"drop_duplicates": False}, {}, [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.exact, CATEGORICAL_COMPOUND_COL, {"drop_duplicates": True}, {}, [0, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lk.fuzzy, SINGLE_COL, {"drop_duplicates": False}, {"threshold": 0.65}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.fuzzy, SINGLE_COL, {"drop_duplicates": True}, {"threshold": 0.65}, [0, 1, 2, 4, 5, 9]),
    (lk.cosine, NUMERICAL_COMPOUND_COL, {"drop_duplicates": False}, {"threshold": 0.99}, [0, 0, 0, 0, 0, 0, 6, 7, 0, 0]),
    (lk.cosine, NUMERICAL_COMPOUND_COL, {"drop_duplicates": True}, {"threshold": 0.99}, [0, 6, 7]),
    (lk.jaccard, CATEGORICAL_COMPOUND_COL, {"drop_duplicates": False}, {"threshold": 0.35}, [0, 0, 2, 3, 0, 0, 3, 7, 0, 9]),
    (lk.jaccard, CATEGORICAL_COMPOUND_COL, {"drop_duplicates": True}, {"threshold": 0.35}, [0, 2, 3, 7, 9]),
    (lk.lsh, SINGLE_COL, {"drop_duplicates": False}, {"ngram": 1, "threshold": 0.65, "num_perm": 128}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 9]),
    (lk.lsh, SINGLE_COL, {"drop_duplicates": True}, {"ngram": 1, "threshold": 0.65, "num_perm": 128}, [0, 1, 2, 4, 5, 9]),
    (lk.str_startswith, SINGLE_COL, {"drop_duplicates": False}, {"pattern": "calle", "case": False}, [0, 1, 2, 2, 4, 5, 6, 7, 8, 9]),
    (lk.str_startswith, SINGLE_COL, {"drop_duplicates": True}, {"pattern": "calle", "case": False}, [0, 1, 2, 4, 5, 6, 7, 8, 9]),
    (lk.str_endswith, SINGLE_COL, {"drop_duplicates": False}, {"pattern": "kingdom", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8, 1]),
    (lk.str_endswith, SINGLE_COL, {"drop_duplicates": True}, {"pattern": "kingdom", "case": False}, [0, 1, 2, 3, 4, 5, 6, 7, 8]),
    (lk.str_contains, SINGLE_COL, {"drop_duplicates": False}, {"pattern": r"05\d{3}", "case": False, "regex": True}, [0, 1, 2, 2, 4, 2, 6, 7, 8, 9]),
    (lk.str_contains, SINGLE_COL, {"drop_duplicates": True}, {"pattern": r"05\d{3}", "case": False, "regex": True}, [0, 1, 2, 4, 6, 7, 8, 9]),
    (lk.tfidf, SINGLE_COL, {"drop_duplicates": False}, {"ngram": 1, "threshold": 0.80, "topn": 2}, [0, 1, 2, 2, 4, 5, 1, 0, 4, 1]),
    (lk.tfidf, SINGLE_COL, {"drop_duplicates": True}, {"ngram": 1, "threshold": 0.80, "topn": 2}, [0, 1, 2, 4, 5]),
]


# ---------------------------------------------------------------------------
# AND-step matrix (reference tests/integration/test_matrix_and.py:47-62)
# each: (step builder -> list[Col], expected)
# ---------------------------------------------------------------------------


@lk.custom.register
def str_same_len(array):
    n = len(array)
    for i in range(n):
        for j in range(i + 1, n):
            if len(array[i]) == len(array[j]):
                yield i, j


AND_MATRIX = [
    (lambda: [lk.col("email").fuzzy(0.95)], [0, 1, 2, 3, 4, 4, 3, 3, 8, 0]),
    (lambda: [lk.col("email").fuzzy(0.95), lk.col("email").str_same_len()], [0, 1, 2, 3, 4, 4, 6, 3, 8, 9]),
    (lambda: [lk.col("address").fuzzy(0.70)], [0, 1, 2, 2, 4, 5, 6, 0, 4, 9]),
    (lambda: [lk.col("address").fuzzy(0.70), lk.col("address").str_same_len()], [0, 1, 2, 3, 4, 5, 6, 0, 4, 9]),
    (lambda: [lk.col("address").fuzzy(0.70), ~lk.col("address").isna()], [0, 1, 2, 2, 4, 5, 6, 0, 8, 9]),
    (lambda: [lk.col("account").exact()], [0, 0, 2, 3, 4, 0, 0, 2, 8, 8]),
    (lambda: [lk.col("property_height").isna(), lk.col("account").exact()], [0, 0, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lambda: [lk.col("birth_country").exact(), lk.col("marital_status").exact()], [0, 0, 2, 3, 4, 3, 6, 7, 6, 9]),
]


# ---------------------------------------------------------------------------
# negation matrix (reference tests/integration/test_matrix_negates.py:13-29)
# ---------------------------------------------------------------------------

NEGATE_MATRIX = [
    (lambda: lk.col("email").str_len(min_len=15, max_len=22), [0, 1, 2, 0, 4, 5, 0, 0, 8, 9]),
    (lambda: ~lk.col("email").str_len(min_len=15, max_len=22), [0, 1, 1, 3, 1, 1, 6, 7, 1, 1]),
    (lambda: lk.col("email").str_startswith(pattern="a"), [0, 1, 1, 3, 4, 5, 6, 7, 8, 9]),
    (lambda: ~lk.col("email").str_startswith(pattern="a"), [0, 1, 2, 0, 0, 0, 0, 0, 0, 0]),
    (lambda: lk.col("email").str_endswith(pattern=".com"), [0, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
    (lambda: ~lk.col("email").str_endswith(pattern=".com"), [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    (lambda: lk.col("email").str_contains(pattern="@example"), [0, 1, 0, 0, 0, 0, 0, 0, 8, 0]),
    (lambda: ~lk.col("email").str_contains(pattern="@example"), [0, 1, 2, 3, 4, 5, 6, 7, 1, 9]),
    (lambda: lk.col("address").isna(), [0, 1, 2, 3, 4, 5, 6, 7, 4, 9]),
    (lambda: ~lk.col("address").isna(), [0, 0, 0, 0, 4, 0, 0, 0, 8, 0]),
]


# ---------------------------------------------------------------------------
# canonical-id decision tree (reference tests/integration/test_matrix_id.py:19-152)
# each: (id, schema, data, expected)
# ---------------------------------------------------------------------------

ID_MATRIX = [
    (None, ["uid", "address"], [[1, "123ab, OL5"], [2, "Westside Avenue"], [3, "123ab, OL5"]], [0, 1, 0]),
    ("uid", ["uid", "address"], [[1, "123ab, OL5"], [2, "Westside Avenue"], [3, "123ab, OL5"]], [1, 2, 1]),
    ("uid", ["uid", "address"], [["a001", "123ab, OL5"], ["a002", "Westside Avenue"], ["a003", "123ab, OL5"]], ["a001", "a002", "a001"]),
    (None, ["uid", "address", "canonical_id"], [[1, "123ab, OL5", 10], [2, "Westside Avenue", 12], [3, "123ab, OL5", 10]], [10, 12, 10]),
    (None, ["uid", "address", "canonical_id"], [[1, "123ab, OL5", 10], [2, "Westside Avenue", 12], [3, "123ab, OL5", 13]], [10, 12, 10]),
    ("canonical_id", ["uid", "address", "canonical_id"], [[1, "123ab, OL5", 10], [2, "Westside Avenue", 12], [3, "123ab, OL5", 10]], [10, 12, 10]),
    ("canonical_id", ["uid", "address", "canonical_id"], [[1, "123ab, OL5", 10], [2, "Westside Avenue", 12], [3, "123ab, OL5", 13]], [10, 12, 10]),
    ("uid", ["uid", "address", "canonical_id"], [[1, "123ab, OL5", 10], [2, "Westside Avenue", 12], [3, "123ab, OL5", 10]], [1, 2, 1]),
    ("uid", ["uid", "address", "canonical_id"], [["e00005", "123ab, OL5", 10], ["e00006", "Westside Avenue", 12], ["e00009", "123ab, OL5", 10]], ["e00005", "e00006", "e00005"]),
    ("uid", ["uid", "address", "canonical_id"], [[10, "123ab, OL5", "e00005"], [12, "Westside Avenue", "e00006"], [13, "123ab, OL5", "e00009"]], [10, 12, 10]),
    ("uid", ["uid", "address", "canonical_id"], [["e00005", "123ab, OL5", "10"], ["e00006", "Westside Avenue", "12"], ["e00009", "123ab, OL5", "10"]], ["e00005", "e00006", "e00005"]),
]


# ---------------------------------------------------------------------------
# synthesize golden (reference tests/integration/test_matrix_synthesize.py:17-73)
# ---------------------------------------------------------------------------

SYNTH_SCHEMA = ["address", "email", "state", "random", "country"]
SYNTH_DATA = [
    ["123ab, OL5", "hello@example.com", None, "A", None],
    ["123ab, OL5", None, None, "B", "Germany"],
    ["Completely random address", None, None, "C", "Spain"],
    ["55 bling blong road", None, None, "D", "Ireland"],
    ["55 bling blong road", "byebye@aol.ir", "Texas", "E", None],
]
SYNTH_EXPECTED_CANONICAL = [0, 0, 2, 3, 3]
SYNTH_EXPECTED = {
    "address": ["123ab, OL5", "Completely random address", "55 bling blong road"],
    "email": ["hello@example.com", None, "byebye@aol.ir"],
    "state": [None, None, "Texas"],
    "random": ["A", "C", "D"],
    "country": ["Germany", "Spain", "Ireland"],
}
SYNTH_EXPECTED_CANONICALS = {0: 2, 3: 2}


# ---------------------------------------------------------------------------
# null variants (reference tests/integration/test_matrix_pd_nulls.py:19-57)
# ---------------------------------------------------------------------------

NULLS_DATA_VARIANTS = ["none_none", "none_na", "na_na"]
NULLS_EXPECTED = {
    "exact": [1, 1, 3],
    "isna": [1, 1, 3],
    "notna": [1, 2, 3],
}


# ---------------------------------------------------------------------------
# preprocessor before/after pairs
# (reference tests/integration/test_matrix_preprocessors.py:35-63)
# each: (preprocessors builder, data, expected)
# ---------------------------------------------------------------------------

PREPROCESS_MATRIX = [
    (lambda: [], [[0, "   123ab, OL5 "], [1, "123ab, OL5"]], [0, 1]),
    (lambda: [lk.preprocessors.strip()], [[0, "   123ab, OL5 "], [1, "123ab, OL5"]], [0, 0]),
    (lambda: [], [[0, "123AB, OL5"], [1, "123ab, OL5"]], [0, 1]),
    (lambda: [lk.preprocessors.lower()], [[0, "123AB, OL5"], [1, "123ab, OL5"]], [0, 0]),
    (lambda: [], [[0, "123ab, OL5"], [1, "123ab, OL5!!!"]], [0, 1]),
    (lambda: [lk.preprocessors.alnum()], [[0, "123ab, OL5"], [1, "123ab, OL5!!!"]], [0, 0]),
    (lambda: [], [[0, "123ab, OL5, UK"], [1, "123ab OL5 UK"]], [0, 1]),
    (lambda: [lk.preprocessors.remove_punctuation()], [[0, "123ab, OL5, UK"], [1, "123ab OL5 UK"]], [0, 0]),
    # composed (NFC) vs decomposed (NFD) spellings of the same street
    (lambda: [], [[0, "Râñdòm Stréèt"], [1, "Râñdòm Stréèt"]], [0, 1]),
    (lambda: [lk.preprocessors.normalize_unicode()], [[0, unicodedata.normalize("NFC", "R\u00e2\u00f1d\u00f2m Str\u00e9\u00e8t")], [1, unicodedata.normalize("NFD", "R\u00e2\u00f1d\u00f2m Str\u00e9\u00e8t")]], [0, 0]),
    (lambda: [], [[0, "Râñdòm Stréèt"], [1, "Random Street"]], [0, 1]),
    (lambda: [lk.preprocessors.ascii_fold()], [[0, "Râñdòm Stréèt"], [1, "Random Street"]], [0, 0]),
    (lambda: [], [[0, "this is a Random Street"], [1, "   Random Street"]], [0, 1]),
    (lambda: [lk.preprocessors.remove_stopwords()], [[0, "this is a Random Street"], [1, "   Random Street"]], [0, 0]),
    (lambda: [], [[0, "Mr. John H Doe (Da Legend)"], [1, "John H Doe"]], [0, 1]),
    (lambda: [lk.preprocessors.normalize_names()], [[0, "Mr. John H Doe (Da Legend)"], [1, "John H Doe"]], [0, 0]),
    (lambda: [], [[0, "Random Services LLC."], [1, "Random Services"]], [0, 1]),
    (lambda: [lk.preprocessors.normalize_company()], [[0, "Random Services LLC."], [1, "Random Services"]], [0, 0]),
]
