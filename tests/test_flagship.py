"""Flagship pipeline: planted-cluster recall, invariants, resume."""

from __future__ import annotations

import itertools
import json
import os
import shutil

import pytest

from liken_ray.io.synth import write_pairs_dataset
from liken_ray.pipelines.flagship import run_flagship


def _truth_pairs(truth_rows):
    from collections import defaultdict

    by_cluster = defaultdict(list)
    for r in truth_rows:
        if r["kind"] != "singleton":
            by_cluster[r["true_cluster_id"]].append(r["image_id"])
    pairs = set()
    for members in by_cluster.values():
        for a, b in itertools.combinations(sorted(members), 2):
            pairs.add((a, b))
    return pairs


def _predicted_pairs(assign_rows):
    from collections import defaultdict

    by_cluster = defaultdict(list)
    for r in assign_rows:
        by_cluster[r["cluster_id"]].append(r["image_id"])
    pairs = set()
    for members in by_cluster.values():
        if len(members) < 2:
            continue
        for a, b in itertools.combinations(sorted(members), 2):
            pairs.add((a, b))
    return pairs


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pairs1k"))
    write_pairs_dataset(out, n_rows=1000, seed=42, shards=4)
    return out


def test_flagship_recall_and_precision(ray_session, synth_dir):
    import pyarrow.parquet as pq

    result = run_flagship(os.path.join(synth_dir, "pairs"), {"psnr_verify": True})
    assign = result["assignments"].take_all()
    truth = pq.read_table(os.path.join(synth_dir, "truth.parquet")).to_pylist()

    tp = _truth_pairs(truth)
    pp = _predicted_pairs(assign)
    recall = len(tp & pp) / len(tp)
    precision = len(tp & pp) / max(1, len(pp))
    assert recall >= 0.99, f"recall {recall:.4f} ({len(tp - pp)} missed of {len(tp)})"
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert result["rows"] == 1000
    # metrics present for every stage
    stages = result["metrics"]["stages"]
    for name in ("ingest", "caption_edges", "image_edges", "substring_edges", "components"):
        assert name in stages, name


def test_flagship_resume(ray_session, synth_dir, tmp_path):
    run_dir = str(tmp_path / "run")
    r1 = run_flagship(os.path.join(synth_dir, "pairs"), run_dir=run_dir)
    a1 = sorted(
        (r["image_id"], r["cluster_id"]) for r in r1["assignments"].take_all()
    )
    # simulate a crash after the edge stages: kill the downstream stage
    shutil.rmtree(os.path.join(run_dir, "assign"))
    r2 = run_flagship(os.path.join(synth_dir, "pairs"), run_dir=run_dir)
    a2 = sorted(
        (r["image_id"], r["cluster_id"]) for r in r2["assignments"].take_all()
    )
    assert a1 == a2
    # the edge stages were resumed, not recomputed
    assert r2["metrics"]["stages"]["caption_edges"]["resumed"] is True
    assert r2["metrics"]["stages"]["image_edges"]["resumed"] is True
    # manifests exist and carry the config hash
    with open(os.path.join(run_dir, "caption_edges", "manifest.json")) as f:
        m = json.load(f)
    assert m["config_hash"] == r2["metrics"]["config_hash"]


def test_flagship_config_change_invalidates_checkpoints(ray_session, synth_dir, tmp_path):
    import json

    run_dir = str(tmp_path / "run2")
    r1 = run_flagship(os.path.join(synth_dir, "pairs"), run_dir=run_dir)
    r2 = run_flagship(
        os.path.join(synth_dir, "pairs"), {"max_hamming": 4}, run_dir=run_dir
    )
    # diagnostic payload for the (rare, unreproduced) flake where this
    # resumed despite the config change: show both runs' config hashes and
    # the on-disk manifest
    with open(os.path.join(run_dir, "image_edges", "manifest.json")) as f:
        manifest = json.load(f)
    assert r2["metrics"]["stages"]["image_edges"].get("resumed") is not True, (
        r1["metrics"]["config_hash"],
        r2["metrics"]["config_hash"],
        manifest,
    )


def test_flagship_distributed_components(ray_session, synth_dir):
    """Force the distributed label-propagation path (edge_uf_limit=0) and
    check assignments match the driver union-find path."""
    import os

    src = os.path.join(synth_dir, "pairs")
    a = run_flagship(src)["assignments"].take_all()
    b = run_flagship(src, {"edge_uf_limit": 0})["assignments"].take_all()
    am = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"]) for r in a}
    bm = {r["image_id"]: (r["cluster_id"], r["cluster_image_id"]) for r in b}
    assert am == bm


def test_resume_invalidation_replaces_stale_stage_data(ray_session, synth_dir, tmp_path):
    """Recomputing a stage after a config change must REPLACE its persisted
    parquet, not union with it (Ray writes uniquely-named files per
    execution), and a truncated manifest must mean 'recompute', not crash."""
    import glob
    import json

    run_dir = str(tmp_path / "run")
    src = os.path.join(synth_dir, "pairs")
    r1 = run_flagship(src, {"lsh_threshold": 0.7}, run_dir=run_dir)
    n1 = len(glob.glob(os.path.join(run_dir, "caption_edges", "data", "*.parquet")))
    assert n1 > 0
    rows1 = r1["assignments"].count()

    # config change invalidates: stage data files are replaced, row counts
    # match a fresh run in a clean dir
    r2 = run_flagship(src, {"lsh_threshold": 0.9}, run_dir=run_dir)
    clean = run_flagship(src, {"lsh_threshold": 0.9}, run_dir=str(tmp_path / "clean"))
    a2 = sorted((r["image_id"], r["cluster_id"]) for r in r2["assignments"].take_all())
    ac = sorted((r["image_id"], r["cluster_id"]) for r in clean["assignments"].take_all())
    assert a2 == ac
    assert rows1 == r2["assignments"].count()

    # truncated manifest: resume recomputes instead of crashing
    mpath = os.path.join(run_dir, "caption_edges", "manifest.json")
    with open(mpath, "w") as f:
        f.write('{"stage": "caption_edges", "config_')  # crash mid-write
    r3 = run_flagship(src, {"lsh_threshold": 0.9}, run_dir=run_dir)
    assert not r3["metrics"]["stages"]["caption_edges"].get("resumed", False)
    with open(mpath) as f:
        assert json.load(f)["config_hash"]  # rewritten atomically


def test_resume_keyed_on_input_path(ray_session, tmp_path):
    """Resuming a run_dir against a DIFFERENT input must invalidate every
    stage — previously the source was not part of the checkpoint identity
    and the old corpus's results were returned silently."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_pairs_dataset(a, n_rows=300, seed=1, shards=2)
    write_pairs_dataset(b, n_rows=500, seed=2, shards=2)
    run_dir = str(tmp_path / "run")
    ra = run_flagship(os.path.join(a, "pairs"), run_dir=run_dir)
    assert ra["rows"] == 300
    rb = run_flagship(os.path.join(b, "pairs"), run_dir=run_dir)
    assert rb["rows"] == 500
    assert rb["assignments"].count() == 500
    assert not rb["metrics"]["stages"]["caption_edges"].get("resumed", False)


def test_write_pairs_dataset_clears_stale_shards(tmp_path):
    import pyarrow.parquet as pq

    out = str(tmp_path / "c")
    write_pairs_dataset(out, n_rows=400, seed=3, shards=8)
    write_pairs_dataset(out, n_rows=400, seed=3, shards=2)
    total = pq.read_table(os.path.join(out, "pairs")).num_rows
    assert total == 400
