"""Public facade for the LLM-data-pipeline operator families.

Every export below is an oracle- or pytest-checked Ray-Data-native
operator (see README.md "Beyond the reference" table and
``__ray_entry__.queries()`` for runnable examples against the TPC-H-ish
testdata). Grouped by family:

- dedup_text — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding-cosine document dedup
- ann — brute-force + IVF cosine top-k, distributed k-means, persisted
  IVF index
- semdedup — SemDeDup semantic dedup (k-means cells, bounded cell scan)
- text — language-ID, quality metrics, token counts, fingerprints
  (per-batch kernels for ``map_batches``)
- curation — hash split/sample, decontamination, PII scrub, repetition
  stats, packing offsets, Bloom cross-corpus dedup, corpus vocabulary,
  deterministic shuffle
- relational — per-key top-k, exact quantiles (global + per-key),
  streaming table profile
- joins — as-of join, broadcast star-schema join, sort-merge
  large x large equi-join
- sketches — HyperLogLog, Count-Min, exact heavy hitters
- windows — tumbling / sliding / session windows
- multimodal — actor-pool image/audio/video decode + feature stages
"""

from liken_ray.extras.ann import (
    build_ivf_index,
    kmeans_fit,
    topk_cosine_bruteforce,
    topk_cosine_ivf,
    topk_cosine_ivf_indexed,
)
from liken_ray.extras.curation import (
    contamination_index,
    line_dedup,
    corpus_ngram_counts,
    cross_corpus_dedup,
    decontaminate,
    hash_sample,
    hash_split,
    pack_offsets,
    pii_scrub,
    repetition_stats,
    stratified_sample,
    top_ngram_stats,
)
from liken_ray.extras.dedup_text import (
    canonical_exact,
    embedding_cosine_dedup,
    minhash_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from liken_ray.extras.joins import asof_join, broadcast_join, merge_join, range_join
from liken_ray.extras.multimodal import (
    audio_feature_extract,
    image_features,
    image_resize,
    video_frame_sample,
)
from liken_ray.extras.relational import (
    group_agg,
    group_cumsum,
    group_nunique,
    group_quantiles,
    group_shift,
    distinct,
    group_topk,
    quantiles,
    table_profile,
)
from liken_ray.extras.semdedup import semdedup
from liken_ray.extras.sketches import (
    cms_counters,
    cms_query,
    frequent_items,
    hll_estimate,
    hll_registers,
)
from liken_ray.extras.text import (
    fingerprint,
    lang_id,
    quality_metrics,
    simhash64,
    token_counts,
)
from liken_ray.extras.windows import (
    sessionize,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    # dedup_text
    "canonical_exact",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "embedding_cosine_dedup",
    # ann
    "topk_cosine_bruteforce",
    "topk_cosine_ivf",
    "topk_cosine_ivf_indexed",
    "build_ivf_index",
    "kmeans_fit",
    # semdedup
    "semdedup",
    # text
    "token_counts",
    "quality_metrics",
    "lang_id",
    "fingerprint",
    "simhash64",
    # curation
    "hash_split",
    "hash_sample",
    "stratified_sample",
    "decontaminate",
    "contamination_index",
    "pii_scrub",
    "repetition_stats",
    "top_ngram_stats",
    "pack_offsets",
    "cross_corpus_dedup",
    "corpus_ngram_counts",
    "line_dedup",
    # relational
    "group_agg",
    "group_cumsum",
    "group_nunique",
    "group_topk",
    "group_shift",
    "distinct",
    "quantiles",
    "group_quantiles",
    "table_profile",
    # joins
    "asof_join",
    "broadcast_join",
    "merge_join",
    "range_join",
    # sketches
    "hll_registers",
    "hll_estimate",
    "cms_counters",
    "cms_query",
    "frequent_items",
    # windows
    "tumbling_window_counts",
    "sliding_window_counts",
    "sessionize",
    # multimodal
    "image_features",
    "image_resize",
    "audio_feature_extract",
    "video_frame_sample",
]
