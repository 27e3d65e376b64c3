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
