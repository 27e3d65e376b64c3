"""Per-stage checkpointing with manifests (the north rule's resumability).

A run directory holds one subdirectory per stage. A stage is DONE when its
``manifest.json`` exists and its config hash matches; a resumed run then
reads the stage's parquet output instead of recomputing. Manifests also
carry per-stage metrics (rows, wall time, lineage = input stage names +
config hash), giving the run a replayable audit trail.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Any, Callable


def config_hash(cfg: dict[str, Any]) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True, default=str).encode()).hexdigest()[:16]


class Checkpointer:
    def __init__(self, run_dir: str | None, config: dict[str, Any]):
        self.run_dir = run_dir
        self.cfg_hash = config_hash(config)
        self.metrics: dict[str, dict[str, Any]] = {}
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump({"config": config, "hash": self.cfg_hash}, f, indent=2, default=str)

    def _stage_dir(self, name: str) -> str:
        assert self.run_dir is not None
        return os.path.join(self.run_dir, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "manifest.json")

    def is_done(self, name: str) -> bool:
        if not self.run_dir:
            return False
        path = self._manifest_path(name)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                manifest = json.load(f)
        except (json.JSONDecodeError, OSError):
            # a crash mid-write leaves a truncated manifest: treat as
            # not-done (recompute) instead of poisoning every resume
            return False
        if manifest.get("config_hash") != self.cfg_hash:
            return False
        # the manifest may have survived a later crash that removed the
        # data; never return a reader over a missing directory
        return os.path.isdir(os.path.join(self._stage_dir(name), "data"))

    def stage(self, name: str, compute: Callable[[str | None], Any], inputs: list[str] = []):
        """Run (or resume) a stage.

        ``compute(out_dir)`` produces the stage result; if ``out_dir`` is not
        None the callable must also persist its output there (parquet) and
        return a reader-compatible handle. On resume the persisted output is
        returned via ``read(out_dir)`` recorded in the manifest — stages here
        standardize on parquet directories read with ray.data.read_parquet.
        """
        if not self.run_dir:
            t0 = time.perf_counter()
            result = compute(None)
            self.record(name, wall_s=round(time.perf_counter() - t0, 3), resumed=False)
            return result

        stage_dir = self._stage_dir(name)
        if self.is_done(name):
            from liken_ray.io.read import safe_read_parquet

            self.record(name, resumed=True)
            return safe_read_parquet(os.path.join(stage_dir, "data"))

        os.makedirs(stage_dir, exist_ok=True)
        # recomputing (config changed / prior crash): clear stale output
        # FIRST — Ray's write_parquet emits uniquely-named files per
        # execution, so writing into a dirty dir would UNION old and new
        # rows — and drop the stale manifest so a crash mid-recompute
        # cannot resurrect it
        mpath = self._manifest_path(name)
        if os.path.exists(mpath):
            os.remove(mpath)
        data_dir = os.path.join(stage_dir, "data")
        if os.path.isdir(data_dir):
            shutil.rmtree(data_dir)
        t0 = time.perf_counter()
        result = compute(stage_dir)
        wall = round(time.perf_counter() - t0, 3)
        manifest = {
            "stage": name,
            "config_hash": self.cfg_hash,
            "inputs": inputs,
            "wall_s": wall,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, mpath)  # atomic: no truncated manifests
        self.record(name, wall_s=wall, resumed=False)
        return result

    def record(self, name: str, **extra: Any) -> None:
        self.metrics.setdefault(name, {}).update(extra)

    def summary(self) -> dict[str, Any]:
        return {"config_hash": self.cfg_hash, "stages": self.metrics}
