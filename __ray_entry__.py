"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` maps operator names (SURVEY.md §2 + training-data extras) to
callables over ``sf_dir``; ``oracle_sql()`` holds the DuckDB-equivalent SQL
for the SQL-expressible ones (same column names — the driver's comparison
is by sorted column name + value hash). Every query is oracled: the
clustering queries via derived-determinism configs, the IVF ANN queries by
running at full probe width (provably exact, same oracle as brute force —
the pruned approximate configs are pinned by pytest recall tests), and
even ``fingerprint_documents`` — the polynomial byte hash is replicated in
SQL via UHUGEINT mod-2^64 arithmetic.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, table + ".parquet"), columns=columns)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship-style near-dup pipeline over sf0.001 documents: MinHash-LSH
    clustering joined with per-doc quality metrics."""
    sf_dir = "/root/testdata/sf0.001"
    from liken_ray.extras import dedup_text, text as tx

    ds = _docs(sf_dir)
    metrics = ds.map_batches(tx.quality_metrics, batch_format="pyarrow")
    # dup-sized label map from the LSH edges (never a full-table pull):
    # broadcast once as sorted parallel arrays, applied per batch via
    # searchsorted — no per-row dict lookups
    lab = dedup_text.minhash_labels(ds, threshold=0.8)

    import ray

    from liken_ray.engine.components import apply_label_arrays, label_arrays

    ref = ray.put(label_arrays(lab))

    def join(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = apply_label_arrays(ids, keys, vals)
        return batch.append_column("canonical_id", pa.array(canon))

    return metrics.map_batches(join, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _exact_dedup_documents(sf_dir: str):
    from liken_ray.extras.dedup_text import canonical_exact

    return canonical_exact(_docs(sf_dir))


def _drop_duplicates_documents(sf_dir: str):
    """Keep the min-doc_id row per text via the engine's ONE-sort-scan
    terminal (``drop_duplicates_ray``): no Aggregate operator (the repo
    measured it at ~2x a sort at table cardinality) and no keeper-id
    ``take_all`` — the driver sees only O(blocks) boundary summaries. The
    text column itself is the canonical key (string canonical ids are
    first-class in the sort-scan terminals)."""
    from liken_ray.constants import CANONICAL_ID, ROW_ID
    from liken_ray.engine.executor import drop_duplicates_ray

    keyed = _docs(sf_dir).map_batches(
        lambda t: t.append_column(CANONICAL_ID, t["text"]).append_column(
            ROW_ID, t["doc_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = drop_duplicates_ray(keyed, "first")
    return out.select_columns(["doc_id", "text", "lang", "source", "n_chars"])


def _canonicals_documents(sf_dir: str):
    """(min doc_id, cluster size) per exact-text group, incl. singletons
    (n>=1: the n>=2 liken default yields an empty table on dup-free inputs
    and empty Datasets lose their schema through the driver conversion; the
    >=2 semantics is covered by the pytest goldens). ONE sort + segmented
    run scan + O(blocks) boundary stitch — no Aggregate operator (the repo
    measured it at ~2x a sort at table cardinality): inner runs are final
    in the workers; the two runs per block that can straddle boundaries
    merge driver-side (sum counts, min doc_id) keyed by the text itself."""
    import pyarrow.compute as pc
    import ray.data

    srt = (
        _docs(sf_dir)
        .select_columns(["text", "doc_id"])
        .sort(["text", "doc_id"])
        .materialize()
    )

    def run_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "canonical_id": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "edge": pa.array([], pa.bool_()),
                    "key": pa.array([], pa.string()),
                }
            )
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = np.asarray(txt.to_pylist(), dtype=object)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(t[1:] != t[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [len(t)]]))
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = True
        edge[-1] = True
        return pa.table(
            {
                # doc_id ascending within a run -> first row is the min
                "canonical_id": pa.array(did[starts], pa.int64()),
                "cnt": pa.array(lens, pa.int64()),
                "edge": pa.array(edge),
                "key": txt.take(pa.array(starts, pa.int64())),
            }
        )

    blocks = srt.map_batches(
        run_counts, batch_format="pyarrow", batch_size=None
    ).materialize()
    inner = blocks.map_batches(
        lambda tb: tb.filter(pc.invert(tb["edge"])).drop_columns(["edge", "key"]),
        batch_format="pyarrow",
    )
    merged: dict[str, list[int]] = {}
    for r in blocks.map_batches(
        lambda tb: tb.filter(tb["edge"]), batch_format="pyarrow"
    ).take_all():
        m = merged.get(r["key"])
        if m is None:
            merged[r["key"]] = [int(r["canonical_id"]), int(r["cnt"])]
        else:
            m[0] = min(m[0], int(r["canonical_id"]))
            m[1] += int(r["cnt"])
    drv = pa.table(
        {
            "canonical_id": pa.array([v[0] for v in merged.values()], pa.int64()),
            "cnt": pa.array([v[1] for v in merged.values()], pa.int64()),
        }
    )
    return inner.union(ray.data.from_arrow(drv))


def _synthesize_documents(sf_dir: str):
    """Golden record per exact-text group through the engine's vectorized
    ``synthesize_ray`` (sort + segmented first-valid scan — no per-group
    Python at table cardinality): exact labels via the Min aggregate, then
    first-valid-per-column in row order, which equals the oracle's
    ``arg_min(col, doc_id)`` because doc_id is monotone in row order."""
    import liken_ray as lk

    out = (
        lk.dedupe(_docs(sf_dir))
        .apply(lk.exact())
        .canonicalize("text", id="doc_id")
        .synthesize()
    )
    return out.select_columns(["canonical_id", "text", "lang", "source", "n_chars"])


def _predicate_query(sf_dir: str, deduper) -> Any:
    """Run a liken predicate through the compat engine; canonical values are
    doc ids (id='doc_id')."""
    import liken_ray as lk

    ds = _docs(sf_dir)
    out = lk.dedupe(ds).apply(deduper).canonicalize("text", id="doc_id").collect()
    return out.select_columns(["doc_id", "canonical_id"])


def _str_contains_documents(sf_dir: str):
    import liken_ray as lk

    return _predicate_query(sf_dir, lk.str_contains(pattern="spark"))


def _str_len_documents(sf_dir: str):
    import liken_ray as lk

    return _predicate_query(sf_dir, lk.str_len(min_len=100))


def _str_startswith_documents(sf_dir: str):
    import liken_ray as lk

    return _predicate_query(sf_dir, lk.str_startswith(pattern="the "))


def _str_endswith_documents(sf_dir: str):
    import liken_ray as lk

    return _predicate_query(sf_dir, lk.str_endswith(pattern="ing"))


def _isna_documents(sf_dir: str):
    import liken_ray as lk

    return _predicate_query(sf_dir, lk.isna())


def _notna_documents(sf_dir: str):
    """Dense predicate (~isna matches every non-null row) — exercises the
    distributed predicate-cluster path: no matched-id collection, just a
    min-rid aggregate + broadcast-mask relabel."""
    import liken_ray as lk

    return _predicate_query(sf_dir, ~lk.isna())


def _isin_documents(sf_dir: str):
    import liken_ray as lk

    ds = _docs(sf_dir)
    out = (
        lk.dedupe(ds)
        .apply({"lang": lk.isin(values=["de", "fr"])})
        .canonicalize(id="doc_id")
        .collect()
    )
    return out.select_columns(["doc_id", "canonical_id"])


def _fuzzy_dedup_documents(sf_dir: str):
    """fuzzy (Indel ratio, strict > 95) over the 20-value ``source``
    column: every cross-value score is <= 89, so the expected clusters are
    exactly the identical-value groups — SQL-checkable while still running
    the real all-pairs fuzzy kernel end-to-end."""
    import liken_ray as lk

    ds = _docs(sf_dir)
    out = (
        lk.dedupe(ds)
        .apply({"source": (lk.fuzzy(threshold=0.95),)})
        .canonicalize(id="doc_id")
        .collect()
    )
    return out.select_columns(["doc_id", "canonical_id"])


def _jaccard_dedup_documents(sf_dir: str):
    """Row-set jaccard (strict > 0.99) over the compound (lang, source)
    columns: 2-element sets match only when identical, so clusters are the
    (lang, source) groups."""
    import liken_ray as lk

    ds = _docs(sf_dir)
    out = (
        lk.dedupe(ds)
        .apply({("lang", "source"): (lk.jaccard(threshold=0.99),)})
        .canonicalize(id="doc_id")
        .collect()
    )
    return out.select_columns(["doc_id", "canonical_id"])


def _cosine_dedup_documents(sf_dir: str):
    """Row-vector cosine (strict > 0.95) over derived orthogonal indicator
    columns (is_en, 1-is_en): cosine is 1 within a group and 0 across, so
    the clusters are exactly {en} vs {rest}."""
    import liken_ray as lk

    def derive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_en = pc.equal(batch["lang"], "en").cast(pa.float64())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "x": is_en,
                "y": pc.subtract(pa.scalar(1.0), is_en),
            }
        )

    ds = _docs(sf_dir).map_batches(derive, batch_format="pyarrow")
    out = (
        lk.dedupe(ds)
        .apply({("x", "y"): (lk.cosine(threshold=0.95),)})
        .canonicalize(id="doc_id")
        .collect()
    )
    return out.select_columns(["doc_id", "canonical_id"])


def _canonicals_n2_documents(sf_dir: str):
    """Cluster sizes with the reference's n>=2 default (real duplicate
    groups only; clustered on ``lang`` — the documents table has no exact
    text dups at any SF, and an always-empty oracle would prove nothing).
    The filter runs distributed; concatenating onto a typed empty table
    keeps the schema stable even when no group reaches n."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    agg = (
        _docs(sf_dir)
        .groupby("lang")
        .aggregate(Min("doc_id", alias_name="canonical_id"), Count(alias_name="cnt"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["cnt"], 2)).select(
                ["canonical_id", "cnt"]
            ),
            batch_format="pyarrow",
        )
    )
    empty = pa.table(
        {"canonical_id": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )
    parts = [empty] + [
        b for b in agg.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    return pa.concat_tables(parts, promote_options="default")


def _token_count_documents(sf_dir: str):
    from liken_ray.extras.text import token_counts

    out = _docs(sf_dir).map_batches(token_counts, batch_format="pyarrow")
    return out.select_columns(["doc_id", "word_count"])


def _quality_documents(sf_dir: str):
    from liken_ray.extras.text import quality_metrics

    out = _docs(sf_dir).map_batches(quality_metrics, batch_format="pyarrow")
    return out.select_columns(
        ["doc_id", "char_count", "word_count", "digit_count", "punct_count"]
    )


def _lang_id_documents(sf_dir: str):
    from liken_ray.extras.text import lang_id

    return _docs(sf_dir).map_batches(lang_id, batch_format="pyarrow")


def _fingerprint_documents(sf_dir: str):
    from liken_ray.extras.text import fingerprint

    return _docs(sf_dir).map_batches(fingerprint, batch_format="pyarrow")


def _source_fp(batch: pa.Table) -> pa.Table:
    """(doc_id, fp) with fp = md5 hex of ``source`` — 20 distinct 32-char
    strings whose char-3-gram sets are pairwise near-disjoint. Identical
    sources share signatures/sketches exactly; distinct ones never meet a
    band/verify threshold, so every sketch-dedup clustering over ``fp``
    provably equals the exact source partition (derived-determinism oracle,
    the fuzzy/jaccard/cosine trick). Verified deterministic: the source
    vocabulary is identical at every SF."""
    import hashlib

    src = batch["source"].to_pylist()
    memo: dict[Any, Any] = {}
    fps = []
    for s in src:
        f = memo.get(s)
        if f is None and s is not None:
            f = hashlib.md5(s.encode()).hexdigest()
            memo[s] = f
        fps.append(f)
    return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())})


def _minhash_dedup_documents(sf_dir: str):
    """MinHash-LSH banding end-to-end over the md5(source) fingerprint
    column; clusters = source groups (see ``_source_fp``). The real-corpus
    threshold-0.8 config stays exercised by pytest goldens and bench.py."""
    from liken_ray.extras.dedup_text import minhash_dedup

    ds = _docs(sf_dir).map_batches(_source_fp, batch_format="pyarrow")
    return minhash_dedup(ds, text_col="fp", threshold=0.8)


def _simhash_dedup_documents(sf_dir: str):
    """SimHash band-blocking + SWAR Hamming verify over md5(source)
    fingerprints; clusters = source groups (see ``_source_fp``)."""
    from liken_ray.extras.dedup_text import simhash_dedup

    ds = _docs(sf_dir).map_batches(_source_fp, batch_format="pyarrow")
    return simhash_dedup(ds, text_col="fp")


def _ngram_jaccard_dedup_documents(sf_dir: str):
    """LSH-blocked exact-Jaccard verify over md5(source) fingerprints;
    distinct fingerprints sit far below the 0.7 cut, so clusters = source
    groups (see ``_source_fp``)."""
    from liken_ray.extras.dedup_text import ngram_jaccard_dedup

    ds = _docs(sf_dir).map_batches(_source_fp, batch_format="pyarrow")
    return ngram_jaccard_dedup(ds, text_col="fp", threshold=0.7)


def _lsh_dedup_documents_compat(sf_dir: str):
    """The liken-compat lsh operator (datasketch-parity MinHash + band
    optimizer) end to end on Ray, over the md5(source) fingerprint column:
    identical fps share signatures exactly, and no band collision occurs
    between any of the 20 distinct fps (verified at sf0.001/sf0.01 — the
    fp vocabulary is the same at every SF), so clusters = source groups
    (derived-determinism oracle). Real-text LSH parity stays pinned by the
    13 golden bit-parity configs in tests/test_golden_*."""
    import liken_ray as lk

    ds = _docs(sf_dir).map_batches(_source_fp, batch_format="pyarrow")
    out = (
        lk.dedupe(ds)
        .apply(lk.lsh(threshold=0.8, ngram=3, num_perm=128))
        .canonicalize("fp", id="doc_id")
        .collect()
    )
    return out.select_columns(["doc_id", "canonical_id"])


def _embedding_cosine_dedup(sf_dir: str):
    """Hyperplane-LSH + in-block cosine verify over the embeddings table.
    The testdata vectors are i.i.d. gaussian — every pairwise cosine sits
    far below 0.95 (verified against the exact all-pairs golden), so the
    identity oracle pins ZERO false positives through the whole bucketed
    verify path; dup-positive recall is covered by the planted-corpus
    parity tests in tests/test_round3.py."""
    from liken_ray.extras.dedup_text import embedding_cosine_dedup

    return embedding_cosine_dedup(_read(sf_dir, "embeddings"), threshold=0.95)


def _ann_topk_embeddings(sf_dir: str):
    from liken_ray.extras.ann import topk_cosine_bruteforce

    ds = _read(sf_dir, "embeddings")
    qrows = sorted(
        (r for r in ds.take(200) if r["vec_id"] < 5), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]
    out = topk_cosine_bruteforce(ds, queries, qids, k=10)
    return out.select(["query_id", "neighbor_id"])


def _ann_topk_embeddings_ivf(sf_dir: str):
    """IVF cell assignment + probe at full probe width (n_probe = n_cells):
    every cell is scanned, so the result is provably the exact top-k (the
    same oracle as the brute-force query) while still exercising the whole
    IVF path — centroid sampling, cell assignment, probe filter. The
    *pruned* n_probe < n_cells config (approximate by design) is covered
    by the recall test in tests/test_extras.py."""
    from liken_ray.extras.ann import topk_cosine_ivf

    ds = _read(sf_dir, "embeddings")
    qrows = sorted(
        (r for r in ds.take(200) if r["vec_id"] < 5), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]
    out = topk_cosine_ivf(ds, queries, qids, k=10, n_cells=8, n_probe=8)
    return out.select(["query_id", "neighbor_id"])


def _ann_topk_embeddings_ivf_indexed(sf_dir: str):
    """Persisted IVF index (cell-partitioned parquet under /tmp, cached per
    sf_dir): queries read only their probed cell partitions. Run at full
    probe width (n_probe = n_cells) so every cell directory is read and the
    result is provably the exact top-k — same oracle as the brute-force
    query — while still exercising the whole persisted-index path (build,
    cell-partitioned write, centroid sidecar, per-cell file globbing). The
    *pruned* n_probe < n_cells config (the 100-TB IO-pruning property) is
    asserted by tests/test_extras.py::
    test_ivf_persisted_index_reads_only_probed_cells."""
    import hashlib
    import os

    from liken_ray.extras.ann import build_ivf_index, topk_cosine_ivf_indexed

    ds = _read(sf_dir, "embeddings")
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    idx_dir = f"/tmp/liken_ray_ivf/{tag}"
    if not os.path.exists(os.path.join(idx_dir, "ivf_meta.json")):
        build_ivf_index(ds, idx_dir, n_cells=8)
    qrows = sorted(
        (r for r in ds.take(200) if r["vec_id"] < 5), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]
    out = topk_cosine_ivf_indexed(idx_dir, queries, qids, k=10, n_probe=8)
    return out.select(["query_id", "neighbor_id"])


def _tumbling_window_events(sf_dir: str):
    from liken_ray.extras.windows import tumbling_window_counts

    return tumbling_window_counts(
        _read(sf_dir, "events", columns=["ts", "event_type"]),
        window_s=3600,
        value_col=None,
        key_col="event_type",
    )


def _sliding_window_events(sf_dir: str):
    from liken_ray.extras.windows import sliding_window_counts

    return sliding_window_counts(
        _read(sf_dir, "events", columns=["ts", "event_type"]),
        window_s=3600,
        slide_s=900,
        key_col="event_type",
    )


def _sessionize_events(sf_dir: str):
    from liken_ray.extras.windows import sessionize

    return sessionize(_read(sf_dir, "events", columns=["ts", "user_id"]), gap_s=1800)


def _events_by_type(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "events", columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="cnt"))
    )


def _orders_per_customer(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "orders", columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="order_cnt"))
    )


def _hash_split_documents(sf_dir: str):
    from liken_ray.extras.curation import hash_split

    return hash_split(_read(sf_dir, "documents", columns=["doc_id"]))


def _holdout_filter(batch: pa.Table, keep_holdout: bool) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = (ids % 20) == 0
    return batch.filter(pa.array(m if keep_holdout else ~m))


def _decontaminate_documents(sf_dir: str):
    """Benchmark decontamination: docs sharing any whitespace-token 3-gram
    with the holdout slice (doc_id % 20 == 0) are flagged. Holdout gram
    hashes broadcast once; membership is searchsorted per batch."""
    from liken_ray.extras.curation import contamination_index, decontaminate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    holdout = docs.map_batches(
        lambda b: _holdout_filter(b, True), batch_format="pyarrow"
    )
    train = docs.map_batches(
        lambda b: _holdout_filter(b, False), batch_format="pyarrow"
    )
    idx = contamination_index(holdout, n=3)
    return decontaminate(train, idx, n=3)




# PII enrichment expression shared (verbatim semantics) by the Ray query
# and the SQL oracle: documents carry no PII-shaped content, so both sides
# derive it deterministically from doc_id before scrubbing — the gate then
# hash-checks the scrub kernels (RE2 in pyarrow.compute vs RE2 in DuckDB)
# on text where every row has guaranteed matches.
def _pii_enrich(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    txt = pc.fill_null(batch["text"], "")
    enriched = pc.binary_join_element_wise(
        txt,
        " contact user",
        pa.array([str(i) for i in ids.tolist()]),
        "@example.com from 10.0.",
        pa.array([str(i % 256) for i in ids.tolist()]),
        ".7 tel +14155550",
        pa.array([str(100 + i % 900) for i in ids.tolist()]),
        "",
    )
    return pa.table({"doc_id": batch["doc_id"], "text": enriched})


def _pii_scrub_documents(sf_dir: str):
    from liken_ray.extras.curation import pii_scrub

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pii_scrub(docs.map_batches(_pii_enrich, batch_format="pyarrow"))


def _repetition_stats_documents(sf_dir: str):
    """Gopher-style duplicate-line stats. Documents are single-line, so
    both sides turn spaces into newlines first — real word repetition then
    yields nontrivial duplicate-line structure on every row."""
    from liken_ray.extras.curation import repetition_stats

    def to_lines(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pc.replace_substring(
                    pc.fill_null(batch["text"], ""), " ", "\n"
                ),
            }
        )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return repetition_stats(docs.map_batches(to_lines, batch_format="pyarrow"))




def _top_ngram_documents(sf_dir: str):
    """Most-frequent word-bigram coverage per document (Gopher repetition
    filter family; raw text — real word repetition makes every doc
    nontrivial)."""
    from liken_ray.extras.curation import top_ngram_stats

    return top_ngram_stats(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), n=2
    )




def _pack_offsets_documents(sf_dir: str):
    """Concat-and-chunk packing assignment over n_chars: global exclusive
    running sum in doc_id order (one sort + O(blocks) stitch), window =
    start // capacity."""
    from liken_ray.extras.curation import pack_offsets

    return pack_offsets(
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        size_col="n_chars",
        capacity=4096,
    )




def _hash_sample_documents(sf_dir: str):
    """Deterministic 50-row uniform sample: k smallest splitmix64(doc_id)
    priorities win; per-block top-k combine + broadcast membership filter,
    no shuffle."""
    from liken_ray.extras.curation import hash_sample

    return hash_sample(_read(sf_dir, "documents"), k=50)


def _stratified_sample_documents(sf_dir: str):
    """Deterministic 20-per-language sample (k smallest priorities within
    each lang); per-key block top-k combine, no shuffle."""
    from liken_ray.extras.curation import stratified_sample

    return stratified_sample(_read(sf_dir, "documents"), key_col="lang", k=20)


def _corpus_ngram_counts_documents(sf_dir: str):
    """Corpus-wide bigram vocabulary (cnt >= 3 with document frequency):
    per-batch partial combine -> ONE sort by gram hash -> per-block
    segmented sums with the O(blocks) edge-run stitch. The oracle groups
    the exploded gram STRINGS, checking the hash path against exact
    semantics."""
    from liken_ray.extras.curation import corpus_ngram_counts

    return corpus_ngram_counts(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), n=2, min_count=3
    )


def _top_docs_per_lang(sf_dir: str):
    """Per-language top-3 documents by length (rank = SQL row_number with
    doc_id tie-break): ONE sort + per-block segmented rank scan with
    O(blocks) carry chaining — no groupby operator, no per-group Python."""
    from liken_ray.extras.relational import group_topk

    return group_topk(
        _read(sf_dir, "documents"), "lang", "n_chars", 3, tie_col="doc_id"
    )


def _length_quantiles_documents(sf_dir: str):
    """Exact PERCENTILE_DISC over document lengths: ONE sort, per-block
    counts from block metadata (no scan), len(qs) scalar fetches. The full
    column never materializes anywhere."""
    from liken_ray.extras.relational import quantiles

    return quantiles(
        _read(sf_dir, "documents", columns=["n_chars"]),
        "n_chars",
        [0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
    )


def _revenue_per_nation(sf_dir: str):
    """Star-schema rollup (TPC-H-Q5 shape): orders joined through customer
    to nation via two broadcast hash joins (dims ray.put once, searchsorted
    per batch — the fact table is never shuffled), then per-batch partial
    sums merged on the driver (25 nations x O(blocks) scalars). Money sums
    in integer cents so the result is associative and hash-stable."""
    from liken_ray.extras.joins import broadcast_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    joined = broadcast_join(
        broadcast_join(orders, customer, on="o_custkey", right_on="c_custkey"),
        nation,
        on="c_nationkey",
        right_on="n_nationkey",
    )

    def partial(batch: pa.Table) -> pa.Table:
        names = batch["n_name"]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        cents = np.rint(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uniq, inv = np.unique(np.asarray(names.to_pylist(), dtype=object), return_inverse=True)
        return pa.table(
            {
                "n_name": pa.array(list(uniq), pa.string()),
                "revenue_cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64), pa.int64()
                ),
                "n_orders": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            }
        )

    partials = joined.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[str, list[int]] = {}
    for r in partials:
        cur = agg.setdefault(r["n_name"], [0, 0])
        cur[0] += r["revenue_cents"]
        cur[1] += r["n_orders"]
    keys = sorted(agg)
    return pa.table(
        {
            "n_name": pa.array(keys, pa.string()),
            "revenue_cents": pa.array([agg[k][0] for k in keys], pa.int64()),
            "n_orders": pa.array([agg[k][1] for k in keys], pa.int64()),
        }
    )


def _shuffle_positions_documents(sf_dir: str):
    """Deterministic global shuffle order (epoch permutation): pos = rank
    of splitmix64(doc_id) — partitioning/rerun-independent. One sort;
    per-block base offsets from metadata, rows tagged per block."""
    from liken_ray.extras.curation import shuffle_positions

    return shuffle_positions(
        _read(sf_dir, "documents", columns=["doc_id"]), id_col="doc_id", salt=0
    )


def _hll_registers_documents(sf_dir: str):
    """HyperLogLog register table (p=12) of n_chars — the distributed
    COUNT(DISTINCT) sketch. Per-batch register combine -> one sort by
    bucket + segmented max + O(blocks) stitch. The register table is pure
    integers and deterministic, so SQL replicates it bit-for-bit; the
    float estimator stays out of the oracle (pytest pins its accuracy)."""
    from liken_ray.extras.sketches import hll_registers

    return hll_registers(
        _read(sf_dir, "documents", columns=["n_chars"]), "n_chars", p=12
    )


def _length_quantiles_per_lang(sf_dir: str):
    """Per-language exact PERCENTILE_DISC of document length: one sort by
    (lang, n_chars); interior key runs resolve their quantiles inside
    their block, only the O(blocks) boundary runs chain through the
    driver."""
    from liken_ray.extras.relational import group_quantiles

    return group_quantiles(
        _read(sf_dir, "documents", columns=["lang", "n_chars"]),
        "lang",
        "n_chars",
        [0.25, 0.5, 0.9],
    )


def _common_gram_coverage_documents(sf_dir: str):
    """CCNet-style common-gram coverage: corpus top-50 bigrams (from the
    vocabulary pass) broadcast once, per-doc membership by searchsorted
    over gram hashes — a composition of corpus_ngram_counts + the
    broadcast-semi-join idiom; the oracle joins gram STRINGS."""
    from liken_ray.extras.curation import common_gram_coverage

    return common_gram_coverage(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), n=2, top_k=50
    )


def _profile_documents(sf_dir: str):
    """Per-column data-quality profile (n / nulls / min / max / integer
    sum): one streaming pass of O(columns) partials, O(blocks x columns)
    driver merge — no shuffle."""
    from liken_ray.extras.relational import table_profile

    return table_profile(
        _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    )


def _cms_counters_documents(sf_dir: str):
    """Count-Min counter table (d=4, w=2048) of n_chars — the additive
    frequency sketch. Per-batch counter combine -> one sort by packed cell
    + segmented sums + O(blocks) stitch; the integer counter table is
    deterministic so SQL replicates it bit-for-bit (double splitmix
    UHUGEINT chain per row salt)."""
    from liken_ray.extras.sketches import cms_counters

    return cms_counters(
        _read(sf_dir, "documents", columns=["n_chars"]), "n_chars", d=4, w=2048
    )


def _frequent_lengths_documents(sf_dir: str):
    """Exact global heavy hitters: the 10 most common document lengths.
    Per-batch value_counts combine -> one sort + segmented sums ->
    per-block local top-k -> O(blocks x k) driver merge; ties broken by
    smaller value (= the oracle's ORDER BY cnt DESC, value)."""
    from liken_ray.extras.sketches import frequent_items

    return frequent_items(
        _read(sf_dir, "documents", columns=["n_chars"]), "n_chars", k=10
    )


def _semdedup_embeddings(sf_dir: str):
    """SemDeDup (k-means cells + exact intra-cell cosine scan) with a
    fully SQL-replicable config: centroids pinned to the embeddings of
    the 8 smallest vec_ids, cell = argmax cosine (first index wins ties),
    dup = some same-cell row with smaller vec_id and cosine > 0.3. The
    testdata blobs put ~1% of pairs above 0.3, so the oracle checks real
    positives through the assignment AND the tiled scan. The production
    path (centroids from the distributed k-means) is covered by pytest."""
    from liken_ray.extras.semdedup import semdedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    crows = sorted(
        (r for r in ds.take(200) if r["vec_id"] < 8), key=lambda r: r["vec_id"]
    )
    cents = np.array([r["embedding"] for r in crows], dtype=np.float64)
    return semdedup(ds, eps=0.3, centroids=cents)


def _asof_join_events(sf_dir: str):
    """Previous-click as-of join: every event joined to the latest
    strictly-earlier click of the same user (sort-merge LOCF with the
    O(blocks) carry chain). Oracle: DuckDB's native ASOF LEFT JOIN."""
    from liken_ray.extras.joins import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def clicks(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], "click"))
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "click_ts": t["ts"],
                "click_id": t["event_id"],
            }
        )

    right = ev.map_batches(clicks, batch_format="pyarrow")
    return asof_join(
        ev, right, on="ts", by="user_id",
        right_cols=["click_id", "click_ts"], strict=True,
    )


def _merge_join_lineitem_orders(sf_dir: str):
    """Fact x fact sort-merge equi-join: lineitem LEFT JOIN the open
    orders (o_orderstatus = 'O') on orderkey. Neither side is broadcast —
    this is the large x large shape broadcast_join can't cover, built as
    the repo's union + ONE range sort + per-block segmented scan +
    O(blocks) carry chain (never Dataset.join, per the concurrent-join
    deadlock rule). Closed/pending orders are filtered out so LEFT-join
    null-fill is exercised on real misses."""
    from liken_ray.extras.joins import merge_join

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderstatus"]
    )

    def open_orders(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["o_orderstatus"], "O"))
        return t.select(["o_orderkey", "o_custkey"])

    right = orders.map_batches(open_orders, batch_format="pyarrow")
    return merge_join(
        li,
        right,
        on="l_orderkey",
        right_on="o_orderkey",
        right_cols=["o_custkey"],
        how="left",
    )


def _open_orders_keys(sf_dir: str):
    """Order keys with o_orderstatus = 'O' — the membership side shared by
    the semi/anti join queries."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])

    def open_orders(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["o_orderstatus"], "O"))
        return t.select(["o_orderkey"])

    return orders.map_batches(open_orders, batch_format="pyarrow")


def _semi_join_lineitem_orders(sf_dir: str):
    """Fact x fact EXISTS filter: lineitem rows whose order is open. The
    existence path of merge_join — no right payload rides the shuffle,
    duplicate membership keys collapse per-batch before the sort."""
    from liken_ray.extras.joins import merge_join

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    return merge_join(
        li, _open_orders_keys(sf_dir), on="l_orderkey", right_on="o_orderkey",
        how="semi",
    )


def _anti_join_lineitem_orders(sf_dir: str):
    """Fact x fact NOT EXISTS filter: lineitem rows with no open order —
    the decontamination shape at large-membership scale (Bloom/broadcast
    paths in extras/curation assume the membership side fits in one
    object)."""
    from liken_ray.extras.joins import merge_join

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    return merge_join(
        li, _open_orders_keys(sf_dir), on="l_orderkey", right_on="o_orderkey",
        how="anti",
    )


def _outer_join_lineitem_orders(sf_dir: str):
    """FULL OUTER JOIN: heavy lineitems (qty >= 25) x open orders. Open
    orders whose lineitems are all light become right-only rows (null
    left columns), exercising the anti-join leg; right_on rides in
    right_cols so those rows stay identifiable."""
    from liken_ray.extras.joins import merge_join

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )

    def heavy(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["l_quantity"], 25.0))

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderstatus"]
    )

    def open_orders(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["o_orderstatus"], "O"))
        return t.select(["o_orderkey", "o_custkey"])

    return merge_join(
        li.map_batches(heavy, batch_format="pyarrow"),
        orders.map_batches(open_orders, batch_format="pyarrow"),
        on="l_orderkey",
        right_on="o_orderkey",
        right_cols=["o_orderkey", "o_custkey"],
        how="outer",
    )


def _group_shift_events(sf_dir: str):
    """Per-user LAG(value): each event's previous value in (ts, event_id)
    order — ONE range sort + per-block shift with an O(periods) rolling
    carry buffer chained across blocks. Oracle: SQL LAG window."""
    from liken_ray.extras.relational import group_shift

    ev = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    return group_shift(
        ev, "user_id", ["ts", "event_id"], ["value"], periods=1,
        out_names=["value_lag"],
    )


def _range_join_click_windows(sf_dir: str):
    """Point-in-interval join, intervals derived by the engine itself:
    every click opens a window [click_ts, min(next_click_ts, +1h)) per
    user (next_click via group_shift LEAD — dogfooding), then every event
    is range-joined to the window containing it. Exercises the end-bound
    trim (gapped intervals → real null misses between windows), unlike
    asof_join which always matches once a key has any earlier row."""
    from liken_ray.extras.joins import range_join
    from liken_ray.extras.relational import group_shift

    ev = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def clicks(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], "click"))
        return pa.table(
            {"user_id": t["user_id"], "cs": t["ts"], "click_id": t["event_id"]}
        )

    cl = ev.map_batches(clicks, batch_format="pyarrow")
    iv = group_shift(cl, "user_id", ["cs"], ["cs"], periods=-1, out_names=["next_cs"])

    def cap(batch: pa.Table) -> pa.Table:
        one_h = pc.add(batch["cs"], pa.scalar(3_600_000_000, pa.duration("us")))
        ce = pc.min_element_wise(pc.fill_null(batch["next_cs"], one_h), one_h)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "cs": batch["cs"],
                "ce": ce,
                "click_id": batch["click_id"],
            }
        )

    windows = iv.map_batches(cap, batch_format="pyarrow")
    return range_join(
        ev, windows, on="ts", by="user_id", start_col="cs", end_col="ce",
        right_cols=["click_id"], how="left", closed="left",
    )


def _line_dedup_documents(sf_dir: str):
    """C4-style corpus-wide exact segment dedup (delimiter ' ' on the
    synthetic word-soup corpus): keep only the globally first occurrence
    of each segment, reassemble every document in original order. Two
    range sorts + O(blocks) boundary stitching; oracle is the SQL
    unnest → ROW_NUMBER() = 1 → string_agg round trip."""
    from liken_ray.extras.curation import line_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return line_dedup(docs, delim=" ")


def _lineitem_agg_by_partkey(sf_dir: str):
    """General high-cardinality rollup (SQL GROUP BY with COUNT/SUM/MIN/
    MAX) via group_agg: per-batch partial combine, ONE range sort of the
    partials, per-block segmented reduceat + O(blocks) stitch — never
    Ray's Aggregate operator (~2x a sort at high key cardinality).
    Quantity is cast to int64 up front (whole-valued in the data) so the
    SUM stays integer-exact; MIN/MAX on doubles are arithmetic-free and
    hash-stable."""
    from liken_ray.extras.relational import group_agg

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def to_int_qty(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("l_quantity"),
            "l_quantity",
            batch["l_quantity"].cast(pa.int64()),
        )

    return group_agg(
        li.map_batches(to_int_qty, batch_format="pyarrow"),
        ["l_partkey"],
        {
            "cnt": ("count_rows", None),
            "sum_qty": ("sum", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
    )


def _running_value_per_user(sf_dir: str):
    """Per-user running value in (ts, event_id) order — SQL SUM OVER
    (PARTITION BY ... ORDER BY ...) as ONE range sort + per-block prefix
    sums + an O(blocks) (sum, count) carry chain. event_id makes the
    order globally unique (lineitem's (orderkey, linenumber) ties in the
    synthetic data, where SQL's default RANGE frame sums all peers);
    values ride as FLOOR(value*100) integer cents — floor is bit-identical
    in arrow and DuckDB, unlike half-even vs half-away rounding — so the
    running sum is associativity-free and hash-stable."""
    from liken_ray.extras.relational import group_cumsum

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.multiply(batch["value"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "user_id": batch["user_id"],
                "value_cents": c,
            }
        )

    return group_cumsum(
        ev.map_batches(cents, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        ["value_cents"],
        out_names=["cents_running"],
    )


def _distinct_lang_source(sf_dir: str):
    """Exact SELECT DISTINCT (lang, source): local per-batch distinct, one
    range sort of the survivors, run-start keep with an O(blocks)
    boundary drop."""
    from liken_ray.extras.relational import distinct

    docs = _read(sf_dir, "documents", columns=["lang", "source"])
    return distinct(docs, ["lang", "source"])


def _suppliers_per_part(sf_dir: str):
    """Exact per-key COUNT(DISTINCT): distinct suppliers per part over
    lineitem (2000 keys at sf0.01). Local pair-distinct per batch, ONE
    range sort of the pairs, per-block segmented count with the O(blocks)
    boundary-pair dedupe — never Ray's Aggregate."""
    from liken_ray.extras.relational import group_nunique

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    return group_nunique(li, ["l_partkey"], "l_suppkey", out_name="n_supp")


def _cross_corpus_dedup_documents(sf_dir: str):
    """Cross-corpus exact dedup: drop documents whose text appears in the
    reference slice (doc_id % 5 == 0). m_bits is deliberately small so the
    Bloom prefilter produces real false positives that the exact-confirm
    sort-merge must reject — the oracle is the exact NOT EXISTS anti-join,
    so any surviving FP (or missed dup) fails the hash gate."""
    from liken_ray.extras.curation import cross_corpus_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ref_slice(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(ids % 5 == 0))

    ref = docs.map_batches(ref_slice, batch_format="pyarrow")
    return cross_corpus_dedup(docs, ref, m_bits=2048, k_hashes=2)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "exact_dedup_documents": _exact_dedup_documents,
        "drop_duplicates_documents": _drop_duplicates_documents,
        "canonicals_documents": _canonicals_documents,
        "synthesize_documents": _synthesize_documents,
        "str_contains_documents": _str_contains_documents,
        "str_len_documents": _str_len_documents,
        "str_startswith_documents": _str_startswith_documents,
        "str_endswith_documents": _str_endswith_documents,
        "isna_documents": _isna_documents,
        "notna_documents": _notna_documents,
        "isin_documents": _isin_documents,
        "fuzzy_dedup_documents": _fuzzy_dedup_documents,
        "jaccard_dedup_documents": _jaccard_dedup_documents,
        "cosine_dedup_documents": _cosine_dedup_documents,
        "canonicals_n2_documents": _canonicals_n2_documents,
        "token_count_documents": _token_count_documents,
        "quality_documents": _quality_documents,
        "lang_id_documents": _lang_id_documents,
        "fingerprint_documents": _fingerprint_documents,
        "minhash_dedup_documents": _minhash_dedup_documents,
        "simhash_dedup_documents": _simhash_dedup_documents,
        "ngram_jaccard_dedup_documents": _ngram_jaccard_dedup_documents,
        "lsh_dedup_documents_compat": _lsh_dedup_documents_compat,
        "embedding_cosine_dedup": _embedding_cosine_dedup,
        "ann_topk_embeddings": _ann_topk_embeddings,
        "ann_topk_embeddings_ivf": _ann_topk_embeddings_ivf,
        "ann_topk_embeddings_ivf_indexed": _ann_topk_embeddings_ivf_indexed,
        "tumbling_window_events": _tumbling_window_events,
        "sliding_window_events": _sliding_window_events,
        "sessionize_events": _sessionize_events,
        "events_by_type": _events_by_type,
        "orders_per_customer": _orders_per_customer,
        "hash_split_documents": _hash_split_documents,
        "decontaminate_documents": _decontaminate_documents,
        "pii_scrub_documents": _pii_scrub_documents,
        "repetition_stats_documents": _repetition_stats_documents,
        "top_ngram_documents": _top_ngram_documents,
        "pack_offsets_documents": _pack_offsets_documents,
        "hash_sample_documents": _hash_sample_documents,
        "stratified_sample_documents": _stratified_sample_documents,
        "semdedup_embeddings": _semdedup_embeddings,
        "asof_join_events": _asof_join_events,
        "merge_join_lineitem_orders": _merge_join_lineitem_orders,
        "semi_join_lineitem_orders": _semi_join_lineitem_orders,
        "anti_join_lineitem_orders": _anti_join_lineitem_orders,
        "outer_join_lineitem_orders": _outer_join_lineitem_orders,
        "group_shift_events": _group_shift_events,
        "range_join_click_windows": _range_join_click_windows,
        "line_dedup_documents": _line_dedup_documents,
        "lineitem_agg_by_partkey": _lineitem_agg_by_partkey,
        "suppliers_per_part": _suppliers_per_part,
        "running_value_per_user": _running_value_per_user,
        "distinct_lang_source": _distinct_lang_source,
        "cross_corpus_dedup_documents": _cross_corpus_dedup_documents,
        "corpus_ngram_counts_documents": _corpus_ngram_counts_documents,
        "top_docs_per_lang": _top_docs_per_lang,
        "length_quantiles_documents": _length_quantiles_documents,
        "revenue_per_nation": _revenue_per_nation,
        "shuffle_positions_documents": _shuffle_positions_documents,
        "hll_registers_documents": _hll_registers_documents,
        "frequent_lengths_documents": _frequent_lengths_documents,
        "cms_counters_documents": _cms_counters_documents,
        "length_quantiles_per_lang": _length_quantiles_per_lang,
        "profile_documents": _profile_documents,
        "common_gram_coverage_documents": _common_gram_coverage_documents,
    }


def _lang_id_sql() -> str:
    """DuckDB replica of ``extras.text.lang_id``, generated from the same
    ``_LANG_MARKERS`` table (no drift): per-marker occurrence counts via
    length-of-replace, summed per language, argmax with first-language-
    in-table-order tie-break, 'unknown' on zero hits, NULL/0.0 on
    null/empty text."""
    from liken_ray.extras.text import _LANG_MARKERS

    def cnt(mk: str) -> str:
        esc = mk.replace("'", "''")
        return f"(length(p) - length(replace(p, '{esc}', ''))) // {len(mk)}"

    langs = list(_LANG_MARKERS)
    sc_cols = ", ".join(
        "(" + " + ".join(cnt(mk) for mk in mks) + f") AS s_{lang}"
        for lang, mks in _LANG_MARKERS.items()
    )
    best = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    pred = "CASE WHEN best = 0 THEN 'unknown' " + " ".join(
        f"WHEN s_{l} = best THEN '{l}'" for l in langs
    ) + " END"
    return (
        "WITH p0 AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p "
        "FROM documents), "
        f"sc AS (SELECT doc_id, text, {sc_cols} FROM p0), "
        f"b AS (SELECT *, {best} AS best FROM sc) "
        "SELECT doc_id, "
        "CASE WHEN text IS NULL OR length(text) = 0 THEN NULL "
        f"ELSE {pred} END AS lang_pred, "
        "CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0 "
        "ELSE CAST(best AS DOUBLE) END AS lang_score FROM b"
    )


def _fingerprint_sql() -> str:
    """DuckDB replica of ``extras.text.fingerprint`` (64-bit polynomial
    byte hash + splitmix64 avalanche), generated from the engine's own
    constants (``_STOP_BASE``) so the two cannot drift. Per row:
    whitespace-normalize (strip + lower + ``\\s+``→' '), UTF-8-encode the
    code points in SQL (1–4 byte CASE), Horner-reduce ``(byte+1)`` terms
    over the reversed byte list in UHUGEINT mod 2^64, then the two
    multiply/xor-shift avalanche steps; finally reinterpret as signed
    int64. Null text → 0, empty-after-normalization → the fixed tag —
    byte-exact vs the numpy kernel (verified at sf0.001/sf0.01)."""
    from liken_ray.extras.text import _STOP_BASE

    b = int(_STOP_BASE)
    m = 1 << 64
    mix1 = 0x9E3779B97F4A7C15
    mix2 = 0xBF58476D1CE4E5B9
    empty_tag = mix1 - m  # int64 view of the empty-string sentinel
    # strip set = python str.strip default whitespace (ASCII subset; the
    # corpus is ASCII-whitespace only, verified at both SFs)
    # NB: duckdb plain string literals don't interpret backslash escapes
    strip_chars = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
    return (
        "WITH p0 AS (SELECT doc_id, text, "
        f"regexp_replace(trim(lower(text), {strip_chars}), '\\s+', ' ', 'g') "
        "AS norm FROM documents), "
        "bytes AS (SELECT doc_id, flatten(list_transform("
        "string_split_regex(norm, ''), c -> CASE "
        "WHEN ord(c) < 128 THEN [ord(c)] "
        "WHEN ord(c) < 2048 THEN [192 + ord(c) // 64, 128 + ord(c) % 64] "
        "WHEN ord(c) < 65536 THEN [224 + ord(c) // 4096, "
        "128 + (ord(c) // 64) % 64, 128 + ord(c) % 64] "
        "ELSE [240 + ord(c) // 262144, 128 + (ord(c) // 4096) % 64, "
        "128 + (ord(c) // 64) % 64, 128 + ord(c) % 64] END)) AS bs FROM p0), "
        "horner AS (SELECT doc_id, list_reduce(list_transform("
        "list_reverse(bs), x -> CAST(x + 1 AS UHUGEINT)), "
        f"(a, x) -> (a * {b}::UHUGEINT + x) % {m}::UHUGEINT) AS h0 "
        "FROM bytes WHERE length(bs) > 0), "
        "m1 AS (SELECT doc_id, "
        f"CAST((h0 * {mix1}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS h1 "
        "FROM horner), "
        "m2 AS (SELECT doc_id, xor(h1, h1 >> 31) AS h2 FROM m1), "
        "m3 AS (SELECT doc_id, CAST((CAST(h2 AS UHUGEINT) * "
        f"{mix2}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS h3 FROM m2), "
        "fp AS (SELECT doc_id, xor(h3, h3 >> 27) AS h4 FROM m3) "
        "SELECT d.doc_id, CASE WHEN d.text IS NULL THEN 0 "
        f"WHEN f.h4 IS NULL THEN {empty_tag} "
        "WHEN f.h4 >= 9223372036854775808::UBIGINT THEN "
        f"CAST(CAST(f.h4 AS HUGEINT) - {m}::HUGEINT AS BIGINT) "
        "ELSE CAST(f.h4 AS BIGINT) END AS fingerprint "
        "FROM documents d LEFT JOIN fp f ON d.doc_id = f.doc_id"
    )


_ANN_TOPK_SQL = (
    "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings "
    "WHERE vec_id < 5), "
    "s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
    "list_cosine_similarity(q.qe, e.embedding) AS sim "
    "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid) "
    "SELECT query_id, neighbor_id FROM s "
    "QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id "
    "ORDER BY sim DESC, neighbor_id ASC) <= 10"
)


def _hash_split_sql() -> str:
    """DuckDB replica of ``extras.curation.hash_split`` (splitmix64 mod
    2^64 via UHUGEINT, bucket thresholds from the same
    ``split_thresholds`` call — no drift)."""
    from liken_ray.extras.curation import _GOLDEN, _MIX1, _MIX2, split_thresholds

    th = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    m = 1 << 64
    case = (
        "CASE "
        + " ".join(f"WHEN bucket < {b} THEN '{n}'" for n, b in th[:-1])
        + f" ELSE '{th[-1][0]}' END AS split"
    )
    return (
        "WITH z0 AS (SELECT doc_id, CAST((CAST(doc_id AS UHUGEINT) + "
        f"{_GOLDEN}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS a FROM documents), "
        "z1 AS (SELECT doc_id, CAST((CAST(xor(a, a >> 30) AS UHUGEINT) * "
        f"{_MIX1}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS b FROM z0), "
        "z2 AS (SELECT doc_id, CAST((CAST(xor(b, b >> 27) AS UHUGEINT) * "
        f"{_MIX2}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS c FROM z1), "
        "h AS (SELECT doc_id, xor(c, c >> 31) % 10000 AS bucket FROM z2) "
        f"SELECT doc_id, {case} FROM h"
    )


def _shuffle_positions_sql() -> str:
    """DuckDB replica of ``extras.curation.shuffle_positions`` (salt 0):
    the splitmix64 UHUGEINT chain of ``_hash_split_sql``, then
    pos = row_number() ordered by the final hash (splitmix64 is a
    bijection over the unique doc_ids — no ties, total order)."""
    from liken_ray.extras.curation import _GOLDEN, _MIX1, _MIX2

    m = 1 << 64
    return (
        "WITH z0 AS (SELECT doc_id, CAST((CAST(doc_id AS UHUGEINT) + "
        f"{_GOLDEN}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS a FROM documents), "
        "z1 AS (SELECT doc_id, CAST((CAST(xor(a, a >> 30) AS UHUGEINT) * "
        f"{_MIX1}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS b FROM z0), "
        "z2 AS (SELECT doc_id, CAST((CAST(xor(b, b >> 27) AS UHUGEINT) * "
        f"{_MIX2}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS c FROM z1) "
        "SELECT doc_id, CAST(row_number() OVER (ORDER BY xor(c, c >> 31)) "
        "AS BIGINT) - 1 AS pos FROM z2"
    )


def _splitmix_chain_sql(inp: str, out: str) -> str:
    """One splitmix64 application as chained SQL expressions: ``out`` =
    splitmix64(``inp``) via the same UHUGEINT mod-2^64 steps as the other
    oracles (nested so it composes — no CTE name collisions)."""
    from liken_ray.extras.curation import _GOLDEN, _MIX1, _MIX2

    m = 1 << 64
    a = f"CAST((CAST({inp} AS UHUGEINT) + {_GOLDEN}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT)"
    b = f"CAST((CAST(xor({a}, {a} >> 30) AS UHUGEINT) * {_MIX1}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT)"
    c = f"CAST((CAST(xor({b}, {b} >> 27) AS UHUGEINT) * {_MIX2}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT)"
    return f"xor({c}, {c} >> 31) AS {out}"


def _profile_sql() -> str:
    """DuckDB replica of ``table_profile`` over (doc_id, lang, n_chars):
    one UNION ALL arm per column; min/max as VARCHAR so a mixed-type
    profile fits one schema; sum only for integer columns."""
    def arm(col: str, numeric: bool) -> str:
        total = "CAST(count(*) - count({c}) AS BIGINT)".format(c=col)
        sm = (
            f"CAST(sum({col}) AS BIGINT)" if numeric else "CAST(NULL AS BIGINT)"
        )
        return (
            f"SELECT '{col}' AS \"column\", CAST(count({col}) AS BIGINT) AS n, "
            f"{total} AS nulls, CAST(min({col}) AS VARCHAR) AS min, "
            f"CAST(max({col}) AS VARCHAR) AS max, {sm} AS sum FROM documents"
        )

    return " UNION ALL ".join(
        [arm("doc_id", True), arm("lang", False), arm("n_chars", True)]
    )


def _cms_counters_sql(d: int = 4, w: int = 2048) -> str:
    """DuckDB replica of ``extras.sketches.cms_counters`` at d=4, w=2048:
    h0 = splitmix64(n_chars); row r's bucket = splitmix64(h0 + r + 1) % w
    (w is a power of two, so UBIGINT %w == the kernel's & (w-1))."""
    return (
        f"WITH h0t AS (SELECT {_splitmix_chain_sql('n_chars', 'h0')} "
        "FROM documents WHERE n_chars IS NOT NULL), "
        f"salted AS (SELECT h0, unnest(range(1, {d + 1})) AS r FROM h0t), "
        # the salted input is summed in UHUGEINT: h0 + r in UBIGINT would
        # ERROR (not wrap) for h0 within d of 2^64, while the kernel wraps
        f"hashed AS (SELECT CAST(r - 1 AS BIGINT) AS row, "
        f"{_splitmix_chain_sql('CAST(h0 AS UHUGEINT) + CAST(r AS UHUGEINT)', 'h1')} "
        "FROM salted) "
        f"SELECT row, CAST(h1 % {w} AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS cnt FROM hashed GROUP BY row, bucket"
    )


def _hll_registers_sql() -> str:
    """DuckDB replica of ``extras.sketches.hll_registers`` over n_chars at
    p=12: the splitmix64 UHUGEINT chain, bucket = top 12 bits, rho =
    leading zeros of the low 52 bits + 1 via length(bin(rem)) (bin() is a
    minimal binary string, so length-1 is an EXACT floor(log2)), register
    = per-bucket max."""
    from liken_ray.extras.curation import _GOLDEN, _MIX1, _MIX2

    m = 1 << 64
    q = 52  # 64 - p
    return (
        "WITH z0 AS (SELECT CAST((CAST(n_chars AS UHUGEINT) + "
        f"{_GOLDEN}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS a "
        "FROM documents WHERE n_chars IS NOT NULL), "
        "z1 AS (SELECT CAST((CAST(xor(a, a >> 30) AS UHUGEINT) * "
        f"{_MIX1}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS b FROM z0), "
        "z2 AS (SELECT CAST((CAST(xor(b, b >> 27) AS UHUGEINT) * "
        f"{_MIX2}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS c FROM z1), "
        "h AS (SELECT xor(c, c >> 31) AS h FROM z2), "
        f"parts AS (SELECT CAST(h >> {q} AS BIGINT) AS bucket, "
        f"h % {1 << q}::UBIGINT AS rem FROM h) "
        "SELECT bucket, CAST(MAX(CASE WHEN rem = 0 THEN "
        f"{q + 1} ELSE {q} - (length(bin(rem)) - 1) END) AS BIGINT) AS rho "
        "FROM parts GROUP BY bucket"
    )


# whitespace-token 3-gram decontamination vs the doc_id % 20 == 0 holdout
# slice; gram semantics mirror extras.curation.gram_hashes (trim + \s+ ->
# ' ' normalization, single-space joins). The SQL compares gram STRINGS,
# so the engine's hash path is checked against exact-match semantics.
_DECONTAMINATE_SQL = (
    "WITH norm AS (SELECT doc_id, string_split(regexp_replace("
    "trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), "
    "'\\s+', ' ', 'g'), ' ') AS toks FROM documents WHERE text IS NOT NULL), "
    "grams AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS gram "
    "FROM norm WHERE len(toks) >= 3 AND toks[1] <> ''), "
    "hold AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0), "
    "hits AS (SELECT g.doc_id, COUNT(*) AS nh FROM grams g "
    "JOIN hold h USING (gram) WHERE g.doc_id % 20 <> 0 GROUP BY g.doc_id) "
    "SELECT d.doc_id, COALESCE(h.nh, 0) > 0 AS contaminated, "
    "COALESCE(h.nh, 0) AS n_hits FROM documents d "
    "LEFT JOIN hits h ON d.doc_id = h.doc_id WHERE d.doc_id % 20 <> 0"
)




_PII_ENRICH_SQL = (
    "coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || "
    "'.7 tel +14155550' || CAST(100 + doc_id % 900 AS VARCHAR)"
)


def _pii_scrub_sql() -> str:
    """DuckDB replica of ``extras.curation.pii_scrub`` over the same
    enrichment expression: both engines run RE2, so the identical pattern
    strings scrub and count identically. Counts are per-category against
    the original text; the scrub chains the patterns in list order."""
    from liken_ray.extras.curation import PII_PATTERNS

    counts = ", ".join(
        f"CAST(length(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrub = "t"
    for _, pat, token in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return (
        f"WITH e AS (SELECT doc_id, {_PII_ENRICH_SQL} AS t FROM documents) "
        f"SELECT doc_id, {counts}, {scrub} AS text FROM e"
    )


_REPETITION_STATS_SQL = (
    "WITH d AS (SELECT doc_id, replace(coalesce(text, ''), ' ', chr(10)) AS t "
    "FROM documents), "
    "l AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM d), "
    "g AS (SELECT doc_id, line, count(*) AS c, strlen(line) AS len "
    "FROM l GROUP BY doc_id, line) "
    "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines, "
    "CAST(count(*) AS BIGINT) AS n_distinct_lines, "
    "CAST(sum((c - 1) * len) AS BIGINT) AS dup_line_bytes, "
    "CAST(sum(c * len) AS BIGINT) AS total_line_bytes "
    "FROM g GROUP BY doc_id"
)




# most-frequent word-bigram coverage; gram construction mirrors
# _DECONTAMINATE_SQL's norm CTE (trim + \s+ -> ' ', single-space joins);
# docs with <2 tokens (incl. null/empty text) emit zeros via the LEFT JOIN
_TOP_NGRAM_SQL = (
    "WITH norm AS (SELECT doc_id, string_split(regexp_replace("
    "trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), "
    "'\\s+', ' ', 'g'), ' ') AS toks FROM documents WHERE text IS NOT NULL), "
    "grams AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
    "i -> toks[i] || ' ' || toks[i + 1])) AS gram "
    "FROM norm WHERE len(toks) >= 2 AND toks[1] <> ''), "
    "g AS (SELECT doc_id, gram, count(*) AS c, strlen(gram) AS len "
    "FROM grams GROUP BY doc_id, gram), "
    "a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams, "
    "CAST(max(c) AS BIGINT) AS top_gram_count FROM g GROUP BY doc_id), "
    "b AS (SELECT g.doc_id, CAST(max(g.c * g.len) AS BIGINT) AS cover "
    "FROM g JOIN a USING (doc_id) WHERE g.c = a.top_gram_count "
    "GROUP BY g.doc_id) "
    "SELECT d.doc_id, COALESCE(a.n_grams, 0) AS n_grams, "
    "COALESCE(a.top_gram_count, 0) AS top_gram_count, "
    "COALESCE(b.cover, 0) AS top_gram_cover_bytes "
    "FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id "
    "LEFT JOIN b ON d.doc_id = b.doc_id"
)




_PACK_OFFSETS_SQL = (
    "SELECT doc_id, CAST(COALESCE(sum(COALESCE(n_chars, 0)) OVER ("
    "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "AS BIGINT) AS start_offset, "
    "CAST(COALESCE(sum(COALESCE(n_chars, 0)) OVER ("
    "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "// 4096 AS BIGINT) AS bin FROM documents"
)




def _splitmix_h_cte(cols: str) -> str:
    """CTE chain computing h = splitmix64(doc_id) in DuckDB (UHUGEINT
    mod-2^64 arithmetic; shared constants with extras.curation) alongside
    the carried columns."""
    from liken_ray.extras.curation import _GOLDEN, _MIX1, _MIX2

    m = 1 << 64
    return (
        f"WITH z0 AS (SELECT {cols}, CAST((CAST(doc_id AS UHUGEINT) + "
        f"{_GOLDEN}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS a FROM documents), "
        f"z1 AS (SELECT {cols}, CAST((CAST(xor(a, a >> 30) AS UHUGEINT) * "
        f"{_MIX1}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS b FROM z0), "
        f"z2 AS (SELECT {cols}, CAST((CAST(xor(b, b >> 27) AS UHUGEINT) * "
        f"{_MIX2}::UHUGEINT) % {m}::UHUGEINT AS UBIGINT) AS c FROM z1), "
        f"h AS (SELECT {cols}, xor(c, c >> 31) AS h FROM z2) "
    )


def _hash_sample_sql() -> str:
    # splitmix64 is a bijection -> priorities are unique, no tie-break needed
    cols = "doc_id, text, lang, source, n_chars"
    return (
        _splitmix_h_cte(cols)
        + f"SELECT {cols} FROM h QUALIFY row_number() OVER (ORDER BY h) <= 50"
    )


def _stratified_sample_sql() -> str:
    cols = "doc_id, text, lang, source, n_chars"
    return (
        _splitmix_h_cte(cols)
        + f"SELECT {cols} FROM h WHERE lang IS NOT NULL "
        "QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h) <= 20"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup_documents": (
            "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS canonical_id "
            "FROM documents"
        ),
        "drop_duplicates_documents": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1"
        ),
        "canonicals_documents": (
            "SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS cnt FROM documents "
            "GROUP BY text"
        ),
        "synthesize_documents": (
            "SELECT MIN(doc_id) AS canonical_id, arg_min(text, doc_id) AS text, "
            "arg_min(lang, doc_id) AS lang, arg_min(source, doc_id) AS source, "
            "arg_min(n_chars, doc_id) AS n_chars FROM documents GROUP BY text"
        ),
        "str_contains_documents": (
            "SELECT doc_id, CASE WHEN text LIKE '%spark%' THEN "
            "(SELECT MIN(doc_id) FROM documents WHERE text LIKE '%spark%') "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "str_len_documents": (
            "SELECT doc_id, CASE WHEN LENGTH(text) > 100 THEN "
            "(SELECT MIN(doc_id) FROM documents WHERE LENGTH(text) > 100) "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "str_startswith_documents": (
            "SELECT doc_id, CASE WHEN text LIKE 'the %' THEN "
            "(SELECT MIN(doc_id) FROM documents WHERE text LIKE 'the %') "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "str_endswith_documents": (
            "SELECT doc_id, CASE WHEN text LIKE '%ing' THEN "
            "(SELECT MIN(doc_id) FROM documents WHERE text LIKE '%ing') "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "isna_documents": (
            "SELECT doc_id, CASE WHEN text IS NULL THEN "
            "COALESCE((SELECT MIN(doc_id) FROM documents WHERE text IS NULL), doc_id) "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "notna_documents": (
            "SELECT doc_id, CASE WHEN text IS NOT NULL THEN "
            "(SELECT MIN(doc_id) FROM documents WHERE text IS NOT NULL) "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "isin_documents": (
            "SELECT doc_id, CASE WHEN lang IN ('de', 'fr') THEN "
            "(SELECT MIN(doc_id) FROM documents WHERE lang IN ('de', 'fr')) "
            "ELSE doc_id END AS canonical_id FROM documents"
        ),
        "canonicals_n2_documents": (
            "SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS cnt FROM documents "
            "GROUP BY lang HAVING COUNT(*) >= 2"
        ),
        "fuzzy_dedup_documents": (
            "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY source) AS canonical_id "
            "FROM documents"
        ),
        "jaccard_dedup_documents": (
            "SELECT doc_id, MIN(doc_id) OVER ("
            "PARTITION BY LEAST(lang, source), GREATEST(lang, source)"
            ") AS canonical_id FROM documents"
        ),
        "cosine_dedup_documents": (
            "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY (lang = 'en')) "
            "AS canonical_id FROM documents"
        ),
        "minhash_dedup_documents": (
            "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY source) AS canonical_id "
            "FROM documents"
        ),
        "simhash_dedup_documents": (
            "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY source) AS canonical_id "
            "FROM documents"
        ),
        "ngram_jaccard_dedup_documents": (
            "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY source) AS canonical_id "
            "FROM documents"
        ),
        "embedding_cosine_dedup": (
            "SELECT vec_id, vec_id AS canonical_id FROM embeddings"
        ),
        "token_count_documents": (
            "SELECT doc_id, CASE WHEN TRIM(text) = '' THEN 0 ELSE "
            "len(string_split_regex(TRIM(text), '\\s+')) END AS word_count "
            "FROM documents"
        ),
        "quality_documents": (
            "SELECT doc_id, LENGTH(text) AS char_count, "
            "CASE WHEN TRIM(text) = '' THEN 0 ELSE "
            "len(string_split_regex(TRIM(text), '\\s+')) END AS word_count, "
            "LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_count, "
            "LENGTH(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct_count "
            "FROM documents"
        ),
        "lsh_dedup_documents_compat": (
            "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY source) AS canonical_id "
            "FROM documents"
        ),
        "lang_id_documents": _lang_id_sql(),
        "fingerprint_documents": _fingerprint_sql(),
        "ann_topk_embeddings": _ANN_TOPK_SQL,
        # full probe width (n_probe = n_cells) makes the IVF paths exact —
        # same oracle as the brute-force query; see _ann_topk_embeddings_ivf
        "ann_topk_embeddings_ivf": _ANN_TOPK_SQL,
        "ann_topk_embeddings_ivf_indexed": _ANN_TOPK_SQL,
        "tumbling_window_events": (
            "SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) "
            "AS window_start, event_type, COUNT(*) AS cnt "
            "FROM events GROUP BY 1, 2"
        ),
        "sliding_window_events": (
            # row replication via a generate_series lateral join mirrors the
            # engine's explode: each event lands in window_s/slide_s sliding
            # windows ending at-or-after it
            "SELECT make_timestamp(((epoch_us(ts) // 900000000) - j) * 900000000) "
            "AS window_start, event_type, COUNT(*) AS cnt "
            "FROM events, generate_series(0, 3) AS t(j) "
            "WHERE ((epoch_us(ts) // 900000000) - j) * 900000000 + 3600000000 "
            "> epoch_us(ts) "
            "GROUP BY 1, 2"
        ),
        "sessionize_events": (
            "WITH o AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE THEN 1 "
            "ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
            "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
            "COUNT(*) AS n_events FROM s GROUP BY user_id, sid"
        ),
        "events_by_type": (
            "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type"
        ),
        "orders_per_customer": (
            "SELECT o_custkey, COUNT(*) AS order_cnt FROM orders GROUP BY o_custkey"
        ),
        "hash_split_documents": _hash_split_sql(),
        "decontaminate_documents": _DECONTAMINATE_SQL,
        "pii_scrub_documents": _pii_scrub_sql(),
        "repetition_stats_documents": _REPETITION_STATS_SQL,
        "top_ngram_documents": _TOP_NGRAM_SQL,
        "pack_offsets_documents": _PACK_OFFSETS_SQL,
        "hash_sample_documents": _hash_sample_sql(),
        "stratified_sample_documents": _stratified_sample_sql(),
        # SemDeDup with pinned centroids (embeddings of the 8 smallest
        # vec_ids). CASTs to DOUBLE[] keep the SQL cosine in float64 like
        # the engine (embedding is FLOAT[]; a float32 cosine could flip a
        # borderline > 0.3 decision). Ties in the argmax break to the
        # smaller cell index (engine: np.argmax takes the first maximum).
        "semdedup_embeddings": (
            "WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, "
            "CAST(embedding AS DOUBLE[]) AS cv FROM embeddings "
            "ORDER BY vec_id LIMIT 8), "
            "a AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, "
            "(SELECT c.cell FROM c "
            "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) "
            "DESC, c.cell LIMIT 1) AS cell FROM embeddings e) "
            "SELECT a.vec_id, a.cell, EXISTS (SELECT 1 FROM a b "
            "WHERE b.cell = a.cell AND b.vec_id < a.vec_id "
            "AND list_cosine_similarity(a.v, b.v) > 0.3) AS is_dup FROM a"
        ),
        "asof_join_events": (
            "SELECT l.event_id, l.ts, l.user_id, l.event_type, "
            "r.click_id, r.click_ts FROM events l ASOF LEFT JOIN "
            "(SELECT user_id, ts AS click_ts, event_id AS click_id "
            "FROM events WHERE event_type = 'click') r "
            "ON l.user_id = r.user_id AND l.ts > r.click_ts"
        ),
        "merge_join_lineitem_orders": (
            "SELECT l_orderkey, l_linenumber, l_quantity, o_custkey "
            "FROM lineitem LEFT JOIN (SELECT o_orderkey, o_custkey "
            "FROM orders WHERE o_orderstatus = 'O') o "
            "ON l_orderkey = o_orderkey"
        ),
        "semi_join_lineitem_orders": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l "
            "WHERE EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'O')"
        ),
        "anti_join_lineitem_orders": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'O')"
        ),
        "outer_join_lineitem_orders": (
            "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, "
            "o.o_orderkey, o.o_custkey "
            "FROM (SELECT * FROM lineitem WHERE l_quantity >= 25) l "
            "FULL JOIN (SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_orderstatus = 'O') o ON l.l_orderkey = o.o_orderkey"
        ),
        "group_shift_events": (
            "SELECT event_id, ts, user_id, event_type, value, "
            "LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS value_lag FROM events"
        ),
        "range_join_click_windows": (
            "WITH cl AS (SELECT user_id, ts AS cs, event_id AS cid "
            "FROM events WHERE event_type = 'click'), "
            "iv AS (SELECT user_id, cs, cid, "
            "LEAST(COALESCE(LEAD(cs) OVER (PARTITION BY user_id ORDER BY cs), "
            "cs + INTERVAL 1 HOUR), cs + INTERVAL 1 HOUR) AS ce FROM cl) "
            "SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, "
            "iv.cid AS click_id FROM events e LEFT JOIN iv "
            "ON e.user_id = iv.user_id AND e.ts >= iv.cs AND e.ts < iv.ce"
        ),
        "line_dedup_documents": (
            "WITH lines AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS line, "
            "generate_subscripts(string_split(text, ' '), 1) AS ord "
            "FROM documents WHERE text IS NOT NULL), "
            "firsts AS (SELECT doc_id, ord, line, ROW_NUMBER() OVER ("
            "PARTITION BY line ORDER BY doc_id, ord) AS rn FROM lines), "
            "agg AS (SELECT doc_id, string_agg(line, ' ' ORDER BY ord) AS kept "
            "FROM firsts WHERE rn = 1 GROUP BY doc_id) "
            "SELECT d.doc_id, CASE WHEN d.text IS NULL THEN NULL "
            "ELSE COALESCE(a.kept, '') END AS text "
            "FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "lineitem_agg_by_partkey": (
            "SELECT l_partkey, COUNT(*) AS cnt, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "MIN(l_extendedprice) AS min_price, "
            "MAX(l_extendedprice) AS max_price "
            "FROM lineitem GROUP BY l_partkey"
        ),
        "suppliers_per_part": (
            "SELECT l_partkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) "
            "AS n_supp FROM lineitem GROUP BY l_partkey"
        ),
        "distinct_lang_source": (
            "SELECT DISTINCT lang, source FROM documents"
        ),
        "running_value_per_user": (
            "SELECT event_id, ts, user_id, "
            "CAST(FLOOR(value * 100) AS BIGINT) AS value_cents, "
            "CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS cents_running FROM events"
        ),
        "cross_corpus_dedup_documents": (
            "SELECT d.doc_id, d.text FROM documents d WHERE NOT EXISTS ("
            "SELECT 1 FROM documents r WHERE r.doc_id % 5 = 0 "
            "AND coalesce(r.text, '') = coalesce(d.text, ''))"
        ),
        # corpus bigram vocabulary over gram STRINGS (the engine groups by
        # the 64-bit gram hash; a collision would fail this gate). norm CTE
        # is the shared whitespace normalization of the top_ngram oracle.
        "corpus_ngram_counts_documents": (
            "WITH norm AS (SELECT doc_id, string_split(regexp_replace("
            "trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), "
            "'\\s+', ' ', 'g'), ' ') AS toks FROM documents WHERE text IS NOT NULL), "
            "grams AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
            "i -> toks[i] || ' ' || toks[i + 1])) AS gram "
            "FROM norm WHERE len(toks) >= 2 AND toks[1] <> '') "
            "SELECT gram, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
            "FROM grams GROUP BY gram HAVING count(*) >= 3"
        ),
        "top_docs_per_lang": (
            "SELECT *, CAST(row_number() OVER ("
            "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank "
            "FROM documents QUALIFY rank <= 3"
        ),
        "length_quantiles_documents": (
            "SELECT unnest(CAST([0.1, 0.25, 0.5, 0.75, 0.9, 0.99] AS DOUBLE[])) AS q, "
            "unnest(quantile_disc(n_chars, [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])) AS value "
            "FROM documents"
        ),
        "revenue_per_nation": (
            "SELECT n_name, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_cents, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "shuffle_positions_documents": _shuffle_positions_sql(),
        "hll_registers_documents": _hll_registers_sql(),
        "frequent_lengths_documents": (
            "SELECT n_chars AS value, CAST(count(*) AS BIGINT) AS cnt "
            "FROM documents WHERE n_chars IS NOT NULL GROUP BY n_chars "
            "QUALIFY row_number() OVER (ORDER BY cnt DESC, value) <= 10"
        ),
        "cms_counters_documents": _cms_counters_sql(),
        "length_quantiles_per_lang": (
            "SELECT lang, unnest(CAST([0.25, 0.5, 0.9] AS DOUBLE[])) AS q, "
            "unnest(quantile_disc(n_chars, [0.25, 0.5, 0.9])) AS value "
            "FROM documents WHERE n_chars IS NOT NULL GROUP BY lang"
        ),
        "profile_documents": _profile_sql(),
        # corpus top-50 bigram coverage per doc; norm/grams CTEs shared
        # with the corpus_ngram oracle. The engine selects top grams by
        # 64-bit hash equality and ties (cnt desc, gram asc) — the SQL
        # replica uses the STRINGS, so a collision or tie drift fails here
        "common_gram_coverage_documents": (
            "WITH norm AS (SELECT doc_id, string_split(regexp_replace("
            "trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), "
            "'\\s+', ' ', 'g'), ' ') AS toks FROM documents WHERE text IS NOT NULL), "
            "grams AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
            "i -> toks[i] || ' ' || toks[i + 1])) AS gram "
            "FROM norm WHERE len(toks) >= 2 AND toks[1] <> ''), "
            "vocab AS (SELECT gram, count(*) AS c FROM grams GROUP BY gram "
            "QUALIFY row_number() OVER (ORDER BY c DESC, gram) <= 50), "
            "per AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(sum(CASE WHEN v.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
            "AS common_grams FROM grams g LEFT JOIN vocab v USING (gram) "
            "GROUP BY g.doc_id) "
            "SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams, "
            "COALESCE(p.common_grams, 0) AS common_grams "
            "FROM documents d LEFT JOIN per p USING (doc_id)"
        ),
    }
