"""``ray job submit``-shaped entrypoint for the flagship pipeline.

Usage (cluster):

    ray job submit --working-dir . -- \
        python -m liken_ray.pipelines.run \
        --input s3://bucket/pairs/ --output /mnt/shared/clusters/ \
        --run-dir /mnt/shared/runs/run1 --lsh-threshold 0.7

``--input`` may be any Ray-readable URI; ``--output`` and ``--run-dir``
must be filesystem paths visible to the driver (checkpoint manifests use
local-fs semantics — an object-store URI would be silently created as a
literal local directory, so it is rejected loudly).

Usage (local sandbox):

    python -m liken_ray.pipelines.run --input /tmp/pairs --output /tmp/out

Owns a Ray session (guarded init); writes the assignment table partitioned
under --output and the per-stage metrics manifest under --run-dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="liken_ray flagship near-dup pipeline")
    p.add_argument("--input", required=True, help="parquet dir of the pairs table")
    p.add_argument("--output", required=True, help="output dir for cluster assignments")
    p.add_argument("--run-dir", default=None, help="checkpoint/metrics dir (resumable)")
    p.add_argument("--lsh-threshold", type=float, default=None)
    p.add_argument("--ngram", type=int, default=None)
    p.add_argument("--num-perm", type=int, default=None)
    p.add_argument("--max-hamming", type=int, default=None)
    p.add_argument("--psnr-verify", action="store_true")
    p.add_argument("--null-captions", choices=["skip", "cluster"], default=None)
    p.add_argument(
        "--edges-scope", choices=["driver", "dataset"], default=None,
        help="'dataset' keeps edge sets distributed end to end (use when "
        "edges outgrow driver memory); default 'driver'",
    )
    p.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU count")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        init_kwargs = dict(include_dashboard=False, ignore_reinit_error=True)
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from liken_ray.pipelines.flagship import run_flagship

        overrides = {
            k: v
            for k, v in {
                "lsh_threshold": args.lsh_threshold,
                "ngram": args.ngram,
                "num_perm": args.num_perm,
                "max_hamming": args.max_hamming,
                "null_captions": args.null_captions,
                "edges_scope": args.edges_scope,
            }.items()
            if v is not None
        }
        if args.psnr_verify:
            overrides["psnr_verify"] = True

        for name, path in (("--output", args.output), ("--run-dir", args.run_dir)):
            if path and "://" in path:
                raise SystemExit(
                    f"{name} must be a filesystem path, got {path!r}: "
                    "checkpoint manifests and the assignment writer use "
                    "local-fs semantics (a URI would be created as a "
                    "literal local directory named after the scheme)"
                )
        # Ray's write_parquet emits uniquely-named files per execution, so
        # writing into a non-empty dir would UNION this run's rows with a
        # previous run's — refuse BEFORE the (potentially hours-long)
        # pipeline runs, not after
        if os.path.isdir(args.output) and os.listdir(args.output):
            raise SystemExit(
                f"--output {args.output!r} is not empty; refusing to mix "
                "assignment files across runs — point --output at a fresh "
                "directory or clear it first"
            )
        result = run_flagship(args.input, overrides or None, run_dir=args.run_dir)
        # re-check at write time: a concurrent run could have passed the
        # same pre-check and written here while this pipeline ran
        if os.path.isdir(args.output) and os.listdir(args.output):
            raise SystemExit(
                f"--output {args.output!r} became non-empty while the "
                "pipeline ran; refusing to mix assignment files across runs"
            )
        os.makedirs(args.output, exist_ok=True)
        result["assignments"].write_parquet(args.output)

        summary = {
            "rows": result["rows"],
            "edges": result["edges"],
            "metrics": result["metrics"],
            "output": args.output,
        }
        if args.run_dir:
            with open(os.path.join(args.run_dir, "summary.json"), "w") as f:
                json.dump(summary, f, indent=2)
        print(json.dumps(summary))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
