"""Cache lifecycle for query-returning persists.

Registry queries return LAZY DataFrames (the driver collects later),
so a multi-consumer intermediate persisted inside a query function
must stay persisted when the function returns — it cannot be
unpersisted at the site that created it. In a long session those
storage blocks accumulate until heavy queries pay eviction/GC instead
of their own plan (measured: the CDC headliner ran 15.4 s inside an
uncleared sf1.0 session vs 5.0 s isolated — BASELINE.md round-8).

``bench.py`` compensates with ``spark.catalog.clearCache()`` between
queries. Library callers get the same control explicitly:

- query-layer persists go through :func:`persist_tracked`, which
  keeps the handle;
- :func:`release_tracked` unpersists everything tracked — call it
  (or ``spark.catalog.clearCache()``) after consuming each query's
  result in a long-lived session.

The registry holds STRONG references deliberately: the JVM cache
entry exists whether or not the Python wrapper survives, so a weak
reference would lose the only handle that can free it. Growth is
bounded by the caller's release cadence — one ``release_tracked()``
per consumed query keeps the registry at O(persists per query)."""

from __future__ import annotations

import contextlib
import threading
from collections.abc import Iterator

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
# _LIVE is process-global: concurrent queries registering persists
# while another caller releases must not corrupt the list or release
# a frame the mutating thread is about to return. The lock covers the
# registry only — unpersist() itself is JVM-side and thread-safe.
_LOCK = threading.Lock()


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register for :func:`release_tracked`."""
    df.persist(level)
    with _LOCK:
        _LIVE.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released.
    Safe to call repeatedly (the registry empties each call).

    Global by design (the bench/session-reset hammer): one caller's
    release drops EVERY tracked persist, including another in-flight
    query's — in multi-threaded sessions prefer :func:`caching_scope`,
    which releases only its own persists."""
    with _LOCK:
        live = list(_LIVE)
        _LIVE.clear()
    released = 0
    for df in live:
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return released


@contextlib.contextmanager
def caching_scope(
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> Iterator:
    """Scoped alternative to the global registry for concurrent
    callers: ``with caching_scope() as persist:`` yields a
    ``persist(df)`` function; every frame persisted through it is
    unpersisted when the scope exits — and ONLY those frames, so one
    query's cleanup can never drop a concurrent query's cache."""
    scoped: list[DataFrame] = []

    def persist(df: DataFrame) -> DataFrame:
        df.persist(level)
        scoped.append(df)
        return df

    try:
        yield persist
    finally:
        for df in scoped:
            try:
                df.unpersist()
            except Exception:
                pass
