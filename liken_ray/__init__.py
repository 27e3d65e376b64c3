"""liken_ray — a Ray-Data-native near-duplicate detection & record-linkage
engine with the query surface of ``liken`` (reference: VictorAut/liken),
rebuilt from scratch on ``ray.data.Dataset`` pipelines.

Usage (mirrors the reference's three APIs):

    import liken_ray as lk

    lk.dedupe(df).apply(lk.exact()).drop_duplicates("address")
    lk.dedupe(df).apply({"address": (lk.lsh(threshold=0.8),)}).canonicalize()
    lk.dedupe(ds).apply(
        lk.pipeline().step([lk.col("caption").lsh(), ~lk.col("caption").isna()])
    ).canonicalize(id="image_id")

where ``df`` is pandas/polars/pyarrow (local execution) or a
``ray.data.Dataset`` (distributed, streaming execution).
"""

from liken_ray.api import Dedupe, dedupe
from liken_ray.constants import CANONICAL_ID, NA_PLACEHOLDER
from liken_ray.dedupers.core import (
    cosine,
    custom,
    exact,
    fuzzy,
    isin,
    isna,
    jaccard,
    lsh,
    str_contains,
    str_endswith,
    str_len,
    str_startswith,
    tfidf,
)
from liken_ray.plan import Col, Pipeline, col, pipeline  # noqa: F401
from liken_ray.kernels import preprocess as preprocessors

__all__ = [
    "Dedupe",
    "dedupe",
    "CANONICAL_ID",
    "NA_PLACEHOLDER",
    "exact",
    "fuzzy",
    "tfidf",
    "lsh",
    "jaccard",
    "cosine",
    "isna",
    "isin",
    "str_contains",
    "str_startswith",
    "str_endswith",
    "str_len",
    "custom",
    "col",
    "pipeline",
    "preprocessors",
]

__version__ = "0.1.0"
