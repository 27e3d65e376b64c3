"""I/O helpers.

``safe_read_parquet`` serializes the *creation* of read_parquet datasets
across threads: Ray's path resolution conditionally imports
``fsspec.implementations.http``, which fails (no aiohttp offline) — a benign
failure single-threaded, but two threads importing it concurrently can race
into a partially-initialized module and surface as
``ImportError: cannot import name 'HTTPFileSystem'``. Execution of the
returned Dataset is unaffected.
"""

from __future__ import annotations

import threading

_read_lock = threading.Lock()


def safe_read_parquet(path, **kwargs):
    import ray.data

    with _read_lock:
        return ray.data.read_parquet(path, **kwargs)
