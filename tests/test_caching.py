"""Cache lifecycle API (market_data_pipeline_databricks_spark/caching.py): query-layer persists
are tracked and releasable by library callers (round-8 advisor item —
persisted intermediates outlive their query call by contract, so a
long session needs an explicit release)."""

from __future__ import annotations

from pyspark import StorageLevel

from market_data_pipeline_databricks_spark import caching


def test_persist_tracked_and_release(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    out = caching.persist_tracked(df)
    assert out is df
    assert df.storageLevel != StorageLevel.NONE
    n = caching.release_tracked()
    assert n >= 1
    assert df.storageLevel == StorageLevel.NONE
    # idempotent: nothing left to release
    assert caching.release_tracked() == 0


def test_release_tracked_outlives_local_wrapper(spark):
    """The JVM cache entry outlives the Python wrapper (a query
    function's local persists go out of scope when it returns), so the
    registry must hold the handle strongly and still free it."""
    caching.release_tracked()  # clean slate
    caching.persist_tracked(spark.range(10))
    import gc

    gc.collect()
    assert caching.release_tracked() == 1


def test_query_layer_persists_are_released(spark):
    """Drive a query that persists a multi-consumer intermediate
    (BM25's posting table) and confirm release_tracked frees it."""
    import __spark_entry__ as entrymod

    caching.release_tracked()  # clean slate
    df = entrymod.queries()["text_bm25_topk"](spark, "/root/testdata/sf0.001")
    df.count()
    assert caching.release_tracked() >= 1


def test_caching_scope_releases_only_its_own(spark):
    """A scope exit must not drop persists from the global registry or
    a sibling scope (the advisor's concurrent-release hazard)."""
    from market_data_pipeline_databricks_spark import caching

    outer = caching.persist_tracked(spark.range(5))
    with caching.caching_scope() as persist:
        inner = persist(spark.range(7))
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory  # scope released its own
    assert outer.storageLevel.useMemory      # global persist untouched
    assert caching.release_tracked() == 1


def test_release_tracked_is_thread_safe(spark):
    """Concurrent persist/release must neither corrupt the registry
    nor double-release (lock contract)."""
    import threading

    from market_data_pipeline_databricks_spark import caching

    caching.release_tracked()
    errors = []

    def worker(i):
        try:
            for _ in range(10):
                caching.persist_tracked(spark.range(i + 1))
                caching.release_tracked()
        except Exception as e:  # pragma: no cover - failure reporter
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    caching.release_tracked()
