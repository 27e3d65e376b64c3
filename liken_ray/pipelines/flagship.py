"""The flagship web-scale pipeline: near-duplicate detection + clustering
over an image+caption table (BASELINE.json input_hint schema).

Modalities (each an independent blocking → verify → edges stage, OR-merged
into one connected-components pass):

1. captions  — MinHash-LSH band blocking (datasketch-parity kernel) with
   exact-shingle-Jaccard verification of in-bucket candidates;
2. images    — pHash band blocking (4 × 16-bit SimHash-style slices) with
   Hamming-distance verification, optional decoded-pixel PSNR >= 40 dB
   confirmation;
3. substrings — winnowing fingerprints over long captions, suffix-array
   longest-common-substring verification (Lee et al. 2021-style).

Scale notes (designed for 10^12 rows / multi-node, tested single-node):
- the read prunes to (image_id, caption, phash) — image ``bytes`` never
  enter a shuffle; PSNR verification re-reads only candidate rows;
- band stages shuffle ~24-byte rows (rid, band, key); captions/bytes are
  joined back only for candidate pairs (broadcast when the candidate set is
  small — the common case; the ``broadcast_limit`` config documents the
  cutoff where a shuffle join should replace it);
- buckets above ``bucket_pair_cap`` fall back to linear star pairing (skew
  guard: a degenerate constant-key bucket costs O(k), not O(k²));
- components: driver union-find below ``edge_uf_limit`` edges, distributed
  min-label propagation above;
- every stage checkpoints parquet + manifest keyed by a config hash —
  re-running with the same run_dir skips completed stages (resume).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from liken_ray.engine.components import KeyedUnionFind, connected_components_distributed
from liken_ray.kernels import minhash as mh
from liken_ray.kernels import phash as ph
from liken_ray.kernels import suffix as sx
from liken_ray.pipelines.checkpoint import Checkpointer

RID = "rid"

DEFAULT_CONFIG: dict[str, Any] = {
    # caption LSH (reference-parity knobs: shingle size / num_perm /
    # threshold -> derived (b, r) bands)
    "ngram": 3,
    "num_perm": 128,
    "lsh_threshold": 0.7,
    "caption_verify": True,
    "verify_jaccard": 0.5,  # drop band false-positives; planted near-dups sit >= ~0.7
    "null_captions": "skip",  # "skip" | "cluster" (reference "na" semantics)
    # image path
    "phash_bands": 4,
    "max_hamming": 8,
    "psnr_verify": False,
    "psnr_min_db": 40.0,
    # substring path
    "long_caption_min": 512,
    "substring_min_len": 64,
    "gram_len": 50,
    "gram_window": 16,
    # execution
    "bucket_pair_cap": 64,
    "edge_uf_limit": 5_000_000,
    "broadcast_limit": 20_000_000,
    "concurrency": None,  # actor-pool size for the signature stage
    "batch_size": 4096,
}


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


def _ingest(source, cfg) -> ray.data.Dataset:
    """(rid, image_id, caption, phash) with a global positional rid."""
    if isinstance(source, str):
        ds = ray.data.read_parquet(source, columns=["image_id", "caption", "phash"])
    else:
        ds = source.select_columns(["image_id", "caption", "phash"])
    ds = ds.materialize()
    n = ds.count()
    idx = ray.data.range(n).map_batches(
        lambda b: {RID: b["id"].astype(np.int64)}, batch_format="numpy"
    )
    return ds.zip(idx).materialize()


class CaptionBandStage:
    """Actor-pool stage: MinHash signatures + band keys for captions.
    Permutations and band params are actor state (built once)."""

    def __init__(self, cfg: dict[str, Any]):
        self.ngram = cfg["ngram"]
        self.num_perm = cfg["num_perm"]
        self.b, self.r = mh.optimal_param(cfg["lsh_threshold"], cfg["num_perm"])
        self.skip_nulls = cfg["null_captions"] == "skip"
        mh.permutations(self.num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        caps = batch["caption"].to_pylist()
        rid = batch[RID].to_numpy(zero_copy_only=False).astype(np.int64)
        if self.skip_nulls:
            keep = [i for i, c in enumerate(caps) if c is not None and len(c) >= self.ngram]
            caps = [caps[i] for i in keep]
            rid = rid[keep]
        if not len(rid):
            return pa.table(
                {RID: pa.array([], pa.int64()), "band": pa.array([], pa.int32()),
                 "key": pa.array([], pa.uint64())}
            )
        sigs = mh.batch_signatures(caps, self.ngram, self.num_perm, na_placeholder="na")
        keys = mh.band_keys(sigs, self.b, self.r)
        n = len(rid)
        return pa.table(
            {
                RID: np.repeat(rid, self.b),
                "band": np.tile(np.arange(self.b, dtype=np.int32), n),
                "key": keys.reshape(-1),
            }
        )


def _bucket_pairs(cfg):
    cap = cfg["bucket_pair_cap"]

    def pairs(group: pa.Table) -> pa.Table:
        rid = np.unique(group[RID].to_numpy(zero_copy_only=False)).astype(np.int64)
        k = len(rid)
        if k < 2:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        if k <= cap:
            src = np.repeat(rid, k)
            dst = np.tile(rid, k)
            m = src < dst
            return pa.table({"src": src[m], "dst": dst[m]})
        # skew guard: linear star pairing for giant buckets
        root = rid[0]
        return pa.table({"src": np.full(k - 1, root, dtype=np.int64), "dst": rid[1:]})

    return pairs


def _dedupe_pairs(edges_ds) -> ray.data.Dataset:
    def canon(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        return pa.table({"src": lo, "dst": hi})

    return edges_ds.map_batches(canon, batch_format="pyarrow")


def _broadcast_column(ds, rids: set[int], column: str) -> dict[int, Any]:
    """Fetch {rid: value} for a candidate rid set via a broadcast-filter
    map_batches (no shuffle; only matching rows leave the workers)."""
    ref = ray.put(rids)

    def fil(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        rid = batch[RID].to_numpy(zero_copy_only=False)
        mask = np.fromiter((r in want for r in rid), dtype=bool, count=len(rid))
        return pa.table({RID: rid[mask], "v": batch[column].filter(pa.array(mask))})

    rows = ds.map_batches(fil, batch_format="pyarrow").take_all()
    return {r[RID]: r["v"] for r in rows}


def _shingle_set(text: str, ngram: int) -> set[str]:
    return {text[i : i + ngram] for i in range(len(text) - ngram + 1)}


def _caption_edges(ds, cfg, ckpt: Checkpointer) -> list[tuple[int, int]]:
    stage_kwargs: dict[str, Any] = {"batch_format": "pyarrow", "batch_size": cfg["batch_size"]}
    conc = cfg["concurrency"]
    banded = ds.map_batches(
        CaptionBandStage,
        fn_constructor_args=(cfg,),
        concurrency=conc if conc else (1, 8),
        **stage_kwargs,
    )
    cand = (
        banded.groupby(["band", "key"])
        .map_groups(_bucket_pairs(cfg), batch_format="pyarrow")
    )
    cand_pairs = {(r["src"], r["dst"]) for r in _dedupe_pairs(cand).take_all()}
    ckpt.record("caption_edges", candidates=len(cand_pairs))
    if not cfg["caption_verify"] or not cand_pairs:
        return list(cand_pairs)

    rids = {r for p in cand_pairs for r in p}
    caps = _broadcast_column(ds, rids, "caption")
    ngram = cfg["ngram"]
    tmin = cfg["verify_jaccard"]
    shingles: dict[int, set[str]] = {}
    out = []
    for a, b in cand_pairs:
        ca, cb = caps.get(a), caps.get(b)
        if ca is None or cb is None:
            if ca is None and cb is None and cfg["null_captions"] == "cluster":
                out.append((a, b))
            continue
        sa = shingles.get(a)
        if sa is None:
            sa = shingles[a] = _shingle_set(ca, ngram)
        sb = shingles.get(b)
        if sb is None:
            sb = shingles[b] = _shingle_set(cb, ngram)
        if not sa and not sb:
            out.append((a, b))
            continue
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and inter / union > tmin:
            out.append((a, b))
    return out


def _image_edges(ds, cfg, ckpt: Checkpointer, source) -> list[tuple[int, int]]:
    bands = cfg["phash_bands"]

    def band_stage(batch: pa.Table) -> pa.Table:
        phv = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        keys = ph.phash_band_keys(phv, bands)
        rid = batch[RID].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(rid)
        return pa.table(
            {
                RID: np.repeat(rid, bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), n),
                "key": keys.reshape(-1),
            }
        )

    banded = ds.map_batches(band_stage, batch_format="pyarrow", batch_size=cfg["batch_size"])
    cand = banded.groupby(["band", "key"]).map_groups(_bucket_pairs(cfg), batch_format="pyarrow")
    cand_pairs = {(r["src"], r["dst"]) for r in _dedupe_pairs(cand).take_all()}
    ckpt.record("image_edges", candidates=len(cand_pairs))
    if not cand_pairs:
        return []

    rids = {r for p in cand_pairs for r in p}
    hashes = _broadcast_column(ds, rids, "phash")
    maxh = cfg["max_hamming"]
    verified = []
    mask64 = (1 << 64) - 1
    for a, b in cand_pairs:
        # phash is stored signed in parquet; recover the uint64 bit pattern
        ha = int(hashes[a]) & mask64
        hb = int(hashes[b]) & mask64
        d = bin(ha ^ hb).count("1")
        if d <= maxh:
            verified.append((a, b))
    ckpt.record("image_edges", hamming_verified=len(verified))

    if not cfg["psnr_verify"] or not verified or source is None or not isinstance(source, str):
        return verified

    # decoded-pixel PSNR confirmation: re-read only candidate rows' bytes
    need = {r for p in verified for r in p}
    id_map = _broadcast_column(ds, need, "image_id")
    wanted_ids = set(id_map.values())
    ref = ray.put(wanted_ids)

    def fetch(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        ids = batch["image_id"].to_pylist()
        mask = pa.array([i in want for i in ids])
        return batch.filter(mask)

    raw = (
        ray.data.read_parquet(source, columns=["image_id", "bytes", "w", "h", "fmt"])
        .map_batches(fetch, batch_format="pyarrow")
        .take_all()
    )
    px = {
        r["image_id"]: ph.decode_image(r["bytes"], r["w"], r["h"], r["fmt"]) for r in raw
    }
    confirmed = []
    for a, b in verified:
        pa_, pb_ = px.get(id_map[a]), px.get(id_map[b])
        if pa_ is None or pb_ is None:
            continue
        if pa_.shape == pb_.shape and ph.psnr(pa_, pb_) >= cfg["psnr_min_db"]:
            confirmed.append((a, b))
    ckpt.record("image_edges", psnr_confirmed=len(confirmed))
    return confirmed


def _substring_edges(ds, cfg, ckpt: Checkpointer) -> list[tuple[int, int]]:
    min_cap = cfg["long_caption_min"]
    gram_len, window = cfg["gram_len"], cfg["gram_window"]

    def fingerprints(batch: pa.Table) -> pa.Table:
        rids_out = []
        fps_out = []
        caps = batch["caption"].to_pylist()
        rid = batch[RID].to_numpy(zero_copy_only=False)
        for r, c in zip(rid, caps):
            if c is None or len(c) < min_cap:
                continue
            fps = sx.gram_fingerprints(c.encode("utf8"), gram_len, window)
            rids_out.extend([int(r)] * len(fps))
            fps_out.extend(fps.tolist())
        return pa.table(
            {RID: pa.array(rids_out, pa.int64()), "fp": pa.array(fps_out, pa.uint64())}
        )

    fp_ds = ds.map_batches(fingerprints, batch_format="pyarrow", batch_size=cfg["batch_size"])

    def fp_pairs(group: pa.Table) -> pa.Table:
        rid = np.unique(group[RID].to_numpy(zero_copy_only=False)).astype(np.int64)
        k = len(rid)
        if k < 2:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        src = np.repeat(rid, k)
        dst = np.tile(rid, k)
        m = src < dst
        return pa.table({"src": src[m], "dst": dst[m]})

    cand = fp_ds.groupby("fp").map_groups(fp_pairs, batch_format="pyarrow")
    cand_pairs = {(r["src"], r["dst"]) for r in _dedupe_pairs(cand).take_all()}
    ckpt.record("substring_edges", candidates=len(cand_pairs))
    if not cand_pairs:
        return []

    rids = {r for p in cand_pairs for r in p}
    caps = _broadcast_column(ds, rids, "caption")
    min_len = cfg["substring_min_len"]
    out = []
    for a, b in cand_pairs:
        ca, cb = caps.get(a), caps.get(b)
        if ca is None or cb is None:
            continue
        if sx.longest_common_substring_len(ca.encode("utf8"), cb.encode("utf8")) >= min_len:
            out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def run_flagship(
    source,
    config: dict[str, Any] | None = None,
    run_dir: str | None = None,
) -> dict[str, Any]:
    """Run the full pipeline. ``source`` = parquet path/dir or a Dataset.

    Returns {"assignments": Dataset(image_id, cluster_id, cluster_image_id),
    "metrics": {...}}. ``cluster_id`` is the rid of the cluster
    representative (min rid); singletons point at themselves.
    """
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)
    ckpt = Checkpointer(run_dir, cfg)

    t0 = time.perf_counter()
    ds = _ingest(source, cfg)
    n_rows = ds.count()
    ckpt.record("ingest", rows=n_rows, wall_s=round(time.perf_counter() - t0, 3))

    def edges_stage(name, fn, *args):
        def compute(stage_dir):
            edges = fn(*args)
            table = pa.table(
                {
                    "src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
            if stage_dir is not None:
                import os

                import pyarrow.parquet as pq

                data_dir = os.path.join(stage_dir, "data")
                os.makedirs(data_dir, exist_ok=True)
                pq.write_table(table, os.path.join(data_dir, "edges.parquet"))
            return ray.data.from_arrow(table)

        return ckpt.stage(name, compute, inputs=["ingest"])

    cap_edges = edges_stage("caption_edges", _caption_edges, ds, cfg, ckpt)
    img_edges = edges_stage("image_edges", _image_edges, ds, cfg, ckpt, source)
    sub_edges = edges_stage("substring_edges", _substring_edges, ds, cfg, ckpt)

    all_edges = cap_edges.union(img_edges).union(sub_edges).materialize()
    n_edges = all_edges.count()
    ckpt.record("components", edges=n_edges)

    t0 = time.perf_counter()
    if n_edges <= cfg["edge_uf_limit"]:
        uf = KeyedUnionFind()
        for r in all_edges.take_all():
            uf.union(r["src"], r["dst"])
        labels = uf.labels()  # rid -> min-member rid
    else:
        labels_ds = connected_components_distributed(all_edges)
        labels = {r["node"]: r["label"] for r in labels_ds.take_all()}
    ckpt.record("components", wall_s=round(time.perf_counter() - t0, 3), labeled=len(labels))

    # rep image ids for user-facing cluster labels
    reps = set(labels.values())
    rep_ids = _broadcast_column(ds, reps, "image_id")
    lab_ref = ray.put(labels)
    rep_ref = ray.put(rep_ids)

    def assign(batch: pa.Table) -> pa.Table:
        lab = ray.get(lab_ref)
        rep = ray.get(rep_ref)
        rid = batch[RID].to_numpy(zero_copy_only=False)
        ids = batch["image_id"].to_pylist()
        cluster = np.array([lab.get(int(r), int(r)) for r in rid], dtype=np.int64)
        cluster_img = [rep.get(int(c), i) for c, i in zip(cluster, ids)]
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "cluster_id": cluster,
                "cluster_image_id": pa.array(cluster_img, pa.string()),
            }
        )

    assignments = ds.map_batches(assign, batch_format="pyarrow")

    def write_assignments(stage_dir):
        if stage_dir is not None:
            import os

            out = os.path.join(stage_dir, "data")
            assignments.write_parquet(out)
            return ray.data.read_parquet(out)
        return assignments.materialize()

    result = ckpt.stage("assign", write_assignments, inputs=["components"])
    return {"assignments": result, "metrics": ckpt.summary(), "rows": n_rows, "edges": n_edges}
