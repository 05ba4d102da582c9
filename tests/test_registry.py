"""Registry ordering invariants.

The correctness driver hash-checks only the FIRST 50 entries of
``queries()`` against ``oracle_sql()``, so dict order is load-bearing:
every window slot must be oracle-backed, and rows-only queries must
never displace a checkable one. Rounds 1–2 lost 29 oracle-backed
queries to this (they sat past position 50); these tests pin the fix.
"""

from __future__ import annotations

from market_data_pipeline_databricks_spark.plans import registry

WINDOW = 50

# The round-6 rotation: 50 oracle-backed queries that had never held
# a driver correctness row when the window was pinned (the r5 window's
# 50 names are all green in CORRECTNESS_r05.json). Kept in lockstep
# with registry.DRIVER_WINDOW — the assertion below is the guard that
# a registry reorder cannot silently push one past position 50.
PREVIOUSLY_UNCHECKED = list(registry.DRIVER_WINDOW)


def test_driver_window_fully_oracle_backed():
    names = list(registry.all_queries())
    oracle = registry.all_oracle_sql()
    window = names[:WINDOW]
    assert all(n in oracle for n in window), [
        n for n in window if n not in oracle
    ]


def test_previously_unchecked_families_in_window():
    window = list(registry.all_queries())[:WINDOW]
    missing = [n for n in PREVIOUSLY_UNCHECKED if n not in window]
    assert not missing, missing


def test_rows_only_queries_sort_last():
    names = list(registry.all_queries())
    oracle = registry.all_oracle_sql()
    flags = [n in oracle for n in names]
    # Once the first rows-only query appears, no oracle-backed query may
    # follow it.
    if False in flags:
        first_rows_only = flags.index(False)
        assert True not in flags[first_rows_only:], names[first_rows_only:]


def test_window_names_exist_and_exact():
    q = registry.all_queries()
    assert len(registry.DRIVER_WINDOW) == WINDOW
    unknown = [n for n in registry.DRIVER_WINDOW if n not in q]
    assert not unknown, unknown


def test_every_query_runnable_signature():
    # Each registry value is a (spark, sf_dir) callable; catch accidental
    # registration of partials/strings at import time.
    for name, fn in registry.all_queries().items():
        assert callable(fn), name
