"""Conditional input spread for under-partitioned scans.

The driver test corpora are SINGLE parquet files, so a scan yields one
input split and every downstream operator's first stage — normalize/
tokenize projections, partial aggregates of a distinct — runs on ONE
core until the first shuffle (BASELINE.md round-9 observation, made
load-bearing in round 10: the six heavy doc headliners measured
28.9 s → 23.2 s spread, content-defined chunking alone 3×).

:func:`spread_to_parallelism` repartitions a frame to the session
default parallelism ONLY when its scan is under-partitioned, so a real
multi-file table pays nothing (the condition is false — no corpus-wide
shuffle is ever added). The partition probe (``df.rdd`` forces a
separate physical-planning pass + file listing) is memoized per corpus
path, and the whole optimization degrades to a NO-OP on Spark Connect
sessions, where ``sparkContext``/``DataFrame.rdd`` are unavailable —
Connect clusters read real multi-file tables, exactly the case the
spread is unnecessary for.

Values are partitioning-invariant everywhere this is used (content-
addressed hashes and buckets; pinned by the sampling-invariance
pytests), so the spread can never change a result, only its layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# corpus path -> measured scan partition count (files are immutable
# for a session; the probe costs a planning+listing pass per call)
_PROBED: dict[str, int] = {}


def spread_to_parallelism(df: DataFrame, cache_key: str | None = None) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff its
    current plan yields fewer partitions. ``cache_key`` (normally the
    backing parquet path) memoizes the partition probe."""
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
        if cache_key is not None and cache_key in _PROBED:
            n = _PROBED[cache_key]
        else:
            n = df.rdd.getNumPartitions()
            if cache_key is not None:
                _PROBED[cache_key] = n
    except Exception:
        # Spark Connect: no sparkContext / RDD API — skip the spread
        return df
    return df.repartition(target) if n < target else df
