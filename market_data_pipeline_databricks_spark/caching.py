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

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register for :func:`release_tracked`."""
    df.persist(level)
    _LIVE.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released.
    Safe to call repeatedly (the registry empties each call)."""
    released = 0
    for df in _LIVE:
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _LIVE.clear()
    return released
