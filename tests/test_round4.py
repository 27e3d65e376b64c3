"""Round-4 regression tests.

Covers the round-3 ADVICE items: type-generic canonical ids on the
sort-scan terminals (string ids are a reference-documented capability —
``core/wrapper.py``: the canonical id "can also be a string field",
``tests/integration/test_matrix_id.py`` copy-string-id case), the
order-independent convergence signature in distributed CC, plus the
round-4 scale work (distributed dataset-scope endgame, chunked PSNR pack).
"""

from __future__ import annotations

import pandas as pd
import pytest

import liken_ray as lk
from liken_ray.constants import CANONICAL_ID


def _mk_ds(df: pd.DataFrame, nblocks: int):
    import ray.data

    return ray.data.from_pandas(df).repartition(nblocks)


# ---------------------------------------------------------------------------
# string canonical ids through the sort-scan terminals
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nblocks", [1, 4])
@pytest.mark.parametrize("keep", ["first", "last"])
def test_ray_string_id_drop_duplicates(ray_session, dataframe10, nblocks, keep):
    # dataframe10 exact-address clusters: rows {0,7} and {4,8}
    df = dataframe10.assign(sid=[f"s{i:02d}" for i in range(10)])
    out = (
        lk.dedupe(_mk_ds(df, nblocks))
        .apply(lk.exact())
        .canonicalize("address", keep=keep, id="sid", drop_duplicates=True)
        .collect()
    )
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    expect = {
        "first": ["s00", "s01", "s02", "s03", "s04", "s05", "s06", "s09"],
        "last": ["s01", "s02", "s03", "s05", "s06", "s07", "s08", "s09"],
    }[keep]
    assert [r["sid"] for r in rows] == expect
    assert all(r[CANONICAL_ID] == r["sid"] for r in rows)


def test_ray_string_id_canonicals_counts(ray_session, dataframe10):
    df = dataframe10.assign(sid=[f"s{i:02d}" for i in range(10)])
    d = (
        lk.dedupe(_mk_ds(df, 4))
        .apply(lk.exact())
        .canonicalize("address", id="sid")
    )
    assert d.canonicals(2) == {"s00": 2, "s04": 2}


def test_ray_nullable_int_id_drop_duplicates(ray_session):
    # a nullable integer canonical column takes the object fallback path
    df = pd.DataFrame(
        {
            "k": ["a", "b", "a", "c", "b"],
            "nid": pd.array([10, None, 12, 13, 14], dtype="Int64"),
        }
    )
    out = (
        lk.dedupe(_mk_ds(df, 3))
        .apply(lk.exact())
        .canonicalize("k", id="nid", drop_duplicates=True)
        .collect()
    )
    rows = sorted(out.take_all(), key=lambda r: (r["nid"] is None, r["nid"]))
    assert [r["k"] for r in rows] == ["a", "c", "b"]


# ---------------------------------------------------------------------------
# chunked PSNR pixel pack (dataset scope)
# ---------------------------------------------------------------------------


def test_flagship_psnr_pack_is_chunked(ray_session, tmp_path):
    """With a small psnr_pack_rows, a many-candidate corpus must split the
    packed pixel buffers into multiple bounded objects (never one
    whole-candidate-set allocation) while matching the driver-scope PSNR
    clusters exactly."""
    import os

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "pairs")
    write_pairs_dataset(out, n_rows=600, seed=31, shards=3)
    src = os.path.join(out, "pairs")
    res_a = run_flagship(src, {"psnr_verify": True})
    res_b = run_flagship(
        src,
        {
            "psnr_verify": True,
            "edges_scope": "dataset",
            "edge_uf_limit": 0,
            "psnr_pack_rows": 16,
        },
    )
    am = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"])
          for r in res_a["assignments"].take_all()}
    bm = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"])
          for r in res_b["assignments"].take_all()}
    assert am == bm
    img_stage = res_b["metrics"]["stages"]["image_edges"]
    assert img_stage["psnr_pack_chunks"] > 1
    # 16 candidates/chunk x 32x32x3 B — ragged partitioning slack allowed
    assert img_stage["psnr_pack_max_bytes"] <= 3 * 16 * 32 * 32 * 3


# ---------------------------------------------------------------------------
# vectorized caption sketch packing
# ---------------------------------------------------------------------------


def _pack_reference(caps, ngram, k):
    """The former per-caption packing loop, kept verbatim as the parity
    reference for the batch-level implementation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from liken_ray.kernels import suffix as sx

    budget = k * 8
    n = len(caps)
    parts, offsets, null_mask = [], np.zeros(n + 1, dtype=np.int32), np.zeros(n, dtype=bool)
    for i, c in enumerate(caps):
        if c is None:
            null_mask[i] = True
            offsets[i + 1] = offsets[i]
            continue
        raw = c.encode("utf8")
        if len(raw) <= budget:
            nw = (len(raw) + 7) // 8
            w = np.empty(nw + 1, dtype=np.uint64)
            w[0] = len(raw)
            w[1:] = np.frombuffer(raw.ljust(nw * 8, b"\0"), dtype=np.uint64)
        else:
            g = np.unique(sx.rolling_gram_hashes(raw, ngram))
            w = np.empty(min(len(g), k) + 1, dtype=np.uint64)
            w[0] = np.uint64(1 << 63) | np.uint64(len(g))
            w[1:] = g[:k]
        parts.append(w)
        offsets[i + 1] = offsets[i] + len(w)
    values = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    sk = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(values, pa.uint64()))
    if null_mask.any():
        sk = pc.if_else(pa.array(null_mask), pa.nulls(n, sk.type), sk)
    return sk


@pytest.mark.parametrize("k", [8, 64])
def test_sketch_packing_vectorized_parity(k):
    import random

    import pyarrow as pa

    from liken_ray.pipelines.flagship import _pack_caption_sketches

    rng = random.Random(17)
    words = ["alpha", "beta", "gamma", "δοκιμή", "試験", "naïve", "x"]
    caps = [
        "",
        None,
        "short one",
        "exactly-eight!!!"[: k * 8],
        "a" * (k * 8),          # exactly at budget -> packed verbatim
        "b" * (k * 8 + 1),      # one past budget -> sketched
        " ".join(rng.choice(words) for _ in range(400)),  # long unicode
        None,
        "ünïcödé çhärs " * 200,
    ] + [" ".join(rng.choice(words) for _ in range(rng.randint(0, 300))) for _ in range(40)]
    arr = pa.array(caps, pa.string())
    got = _pack_caption_sketches(arr, ngram=3, k=k)
    want = _pack_reference(caps, ngram=3, k=k)
    assert got.to_pylist() == want.to_pylist()


def test_sketch_packing_sliced_array_offsets():
    """A sliced arrow array (nonzero .offset) must pack identically —
    the buffer arithmetic honours the slice."""
    import pyarrow as pa

    from liken_ray.pipelines.flagship import _pack_caption_sketches

    caps = ["drop me", "keep one", None, "keep two", "k" * 600]
    arr = pa.array(caps, pa.string()).slice(1)
    got = _pack_caption_sketches(arr, ngram=3, k=8)
    want = _pack_reference(caps[1:], ngram=3, k=8)
    assert got.to_pylist() == want.to_pylist()


def test_assign_dataset_scope_megacluster_many_blocks(ray_session):
    """A single cluster spanning MANY blocks in the pass-2 sort stresses
    the O(blocks) rep continuation map (`rep_map`): every block but the
    first lacks the cluster's rep row and must resolve `cluster_image_id`
    from the boundary summaries. Also covers the pass-1 case of label
    runs straddling block gaps."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from liken_ray.pipelines.flagship import _assign_dataset_scope

    n = 400
    rids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "rid": rids,
                "image_id": pa.array([f"img_{i}" for i in range(n)]),
            }
        )
    ).repartition(16)
    # one mega-cluster: rids 0..299 all labelled 0; 300..399 singletons
    labels = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(300, dtype=np.int64)),
                "label": pa.array(np.zeros(300, dtype=np.int64)),
            }
        )
    ).repartition(8)
    out = _assign_dataset_scope(ds, labels).take_all()
    assert len(out) == n
    got = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"]) for r in out}
    for i in range(300):
        assert got[f"img_{i}"] == (0, "img_0"), i
    for i in range(300, n):
        assert got[f"img_{i}"] == (i, f"img_{i}"), i


# ---------------------------------------------------------------------------
# caption pair-scope verify (caption_verify_scope="pair")
# ---------------------------------------------------------------------------


def test_caption_pair_scope_parity_and_bounded_pack(ray_session, tmp_path):
    """``caption_verify_scope='pair'`` (band rows carry no payload; every
    DISTINCT candidate pair verified exactly once against range-packed
    sketch objects) must produce the same clusters as the default bucket
    scope, in both edge scopes, and must split the sketch pack into
    multiple bounded objects when ``sketch_pack_rows`` is small."""
    import os

    from liken_ray.io.synth import write_pairs_dataset
    from liken_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "pairs")
    write_pairs_dataset(out, n_rows=600, seed=33, shards=3)
    src = os.path.join(out, "pairs")
    res_a = run_flagship(src, {})
    am = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"])
          for r in res_a["assignments"].take_all()}
    for edges_scope in ("driver", "dataset"):
        cfg = {
            "caption_verify_scope": "pair",
            "sketch_pack_rows": 32,
            "edges_scope": edges_scope,
        }
        if edges_scope == "dataset":
            cfg["edge_uf_limit"] = 0
        res_b = run_flagship(src, cfg)
        bm = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"])
              for r in res_b["assignments"].take_all()}
        assert bm == am, edges_scope
        cap_stage = res_b["metrics"]["stages"]["caption_edges"]
        assert cap_stage["verify_scope"] == "pair"
        assert cap_stage["payload_row_bytes"] == 0
        pack = res_b["metrics"]["stages"]["caption_pack"]
        assert pack["sketch_pack_chunks"] > 1
        # 32 endpoints/chunk x (k+1) words x 8 B, ragged slack allowed
        assert pack["sketch_pack_max_bytes"] <= 3 * 32 * 257 * 8


def test_constructor_level_id_kwarg(ray_session):
    """``lk.dedupe(ds, id="rid")`` must treat the constructor-level id as
    the default for every terminal verb (previously it collided with the
    verb's own ``id=`` into a duplicate-kwarg TypeError), and an explicit
    ``canonicalize(id=...)`` must still win."""
    import pandas as pd
    import ray.data

    import liken_ray as lk

    df = pd.DataFrame(
        {"name": ["a", "a", "b", "c"], "rid": [10, 11, 12, 13]}
    )
    ds = ray.data.from_pandas(df)
    out = lk.dedupe(ds, id="rid").apply(lk.exact()).drop_duplicates(columns="name")
    assert sorted(r["rid"] for r in out.take_all()) == [10, 12, 13]
    # constructor id as canonicalize default
    lab = (
        lk.dedupe(ray.data.from_pandas(df), id="rid")
        .apply(lk.exact())
        .canonicalize(columns="name")
        .collect()
    )
    got = {r["rid"]: r["canonical_id"] for r in lab.take_all()}
    assert got == {10: 10, 11: 10, 12: 12, 13: 13}
    # verb-level id wins over the constructor default
    df2 = df.assign(other=[20, 21, 22, 23])
    lab2 = (
        lk.dedupe(ray.data.from_pandas(df2), id="rid")
        .apply(lk.exact())
        .canonicalize(columns="name", id="other")
        .collect()
    )
    got2 = {r["rid"]: r["canonical_id"] for r in lab2.take_all()}
    assert got2 == {10: 20, 11: 20, 12: 22, 13: 23}
