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


def _settle_fsspec_http() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem``
    deterministic under concurrency.

    Offline (no aiohttp) that import ALWAYS fails, so it is retried by
    every Ray path resolution — including ``write_parquet`` with an
    explicit filesystem, whose ``_is_http_filesystem`` check re-imports it
    per call. A failed import is removed from ``sys.modules``, so two
    threads can race the partial module and crash with a bare
    ``ImportError`` that Ray's ``except ModuleNotFoundError`` does not
    catch (observed ~1-in-5 full-module flagship runs). Seeding a stub
    module once makes every later import a cheap, race-free dict hit; the
    stub class is never instantiated, so Ray's isinstance checks simply
    stay False for every real filesystem."""
    import sys

    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        import types

        import fsspec.implementations  # the parent package does import

        stub = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - placeholder, never built
            def __init__(self, *a, **k):
                raise ModuleNotFoundError("No module named 'aiohttp'")

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub
        fsspec.implementations.http = stub


_settle_fsspec_http()


def safe_read_parquet(path, **kwargs):
    import ray.data

    with _read_lock:
        return ray.data.read_parquet(path, **kwargs)


def safe_write_parquet(ds, path: str, **kwargs) -> None:
    """``ds.write_parquet`` for concurrent (threaded-stage) callers.

    The same fsspec path-resolution race as reads fires inside
    ``write_parquet``, but a write BLOCKS until the data is flushed, so
    holding ``_read_lock`` for the whole call would serialize overlapping
    stage writes. Instead, local paths pass an explicit pyarrow
    ``LocalFileSystem`` so Ray skips fsspec resolution entirely; URI paths
    (which do need resolution) fall back to creating under the lock.
    """
    if "://" not in str(path) and "filesystem" not in kwargs:
        from pyarrow.fs import LocalFileSystem

        ds.write_parquet(path, filesystem=LocalFileSystem(), **kwargs)
        return
    with _read_lock:
        ds.write_parquet(path, **kwargs)


def read_pairs(path: str, columns=None):
    """Read the image+caption pairs table (BASELINE input_hint).

    The production format is Lance (``ray.data.read_lance``); this sandbox
    has no ``lance`` package, so `.lance` datasets require it while plain
    directories/files fall back to Parquet with the identical schema.
    """
    if path.rstrip("/").endswith(".lance"):
        import ray.data

        try:
            with _read_lock:
                return ray.data.read_lance(path, columns=columns)
        except ImportError as exc:  # pragma: no cover - lance absent offline
            raise ImportError(
                "reading .lance datasets requires the `lance` package; "
                "convert to parquet or install pylance"
            ) from exc
    return safe_read_parquet(path, columns=columns)
