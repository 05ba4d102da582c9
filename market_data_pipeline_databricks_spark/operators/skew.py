"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; these operators are the *declarative* tools for the
cases AQE can't fix — aggregation skew (one key = 30% of rows melts a
single reducer) and broadcast-ineligible joins with a known hot-key
set.

- :func:`salted_agg` — two-stage aggregation: partial agg on
  (keys + salt) spreads a hot key over ``n_salt`` reducers, final agg
  on keys merges the partials. Exact for decomposable aggregates
  (SUM/COUNT/MIN/MAX — AVG via SUM+COUNT).
- :func:`salted_join` — replicate the build side ``n_salt``× for the
  listed hot keys; the probe side salts those keys by row hash so the
  hot key's rows spread across ``n_salt`` reducer partitions.

Both produce results identical to the unsalted plan (oracle-checked in
plans/relational_ext) — salting changes the shuffle layout, never the
answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"

# Decomposable aggregates: (partial fn, merge fn).
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _row_salt(df: DataFrame, n_salt: int) -> Column:
    """Deterministic-per-row salt in [0, n_salt): hash of all columns.
    Any value works for correctness (the final merge re-groups on the
    true keys); hashing rows spreads uniformly without an id column."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column → (agg_name, input column), e.g.
    ``{"revenue": ("sum", "amount"), "n": ("count", "*")}``.
    """
    partials, finals = [], []
    for out, (fn_name, col) in aggs.items():
        if fn_name not in _DECOMPOSABLE:
            raise ValueError(f"{fn_name} is not decomposable; use plain groupBy")
        partial_fn, merge_fn = _DECOMPOSABLE[fn_name]
        src = F.lit(1) if col == "*" else F.col(col)
        partials.append(partial_fn(src).alias(out))
        finals.append(merge_fn(out).alias(out))
    salted = df.withColumn(_SALT, _row_salt(df, n_salt))
    partial = salted.groupBy(*keys, _SALT).agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    hot_keys: list,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting.

    Hot keys on the probe side get a per-row salt; the build side is
    exploded ``n_salt``× for those keys (cold keys keep salt 0 on both
    sides) — identical join result, ``n_salt``-way parallel hot keys.
    """
    hot = F.col(key).isin(hot_keys)
    p = probe.withColumn(
        _SALT, F.when(hot, _row_salt(probe, n_salt)).otherwise(F.lit(0))
    )
    b = build.withColumn(
        "__salts__",
        F.when(hot, F.sequence(F.lit(0), F.lit(n_salt - 1))).otherwise(
            F.array(F.lit(0))
        ),
    ).withColumn(_SALT, F.explode("__salts__")).drop("__salts__")
    out = p.join(b, [key, _SALT], how)
    return out.drop(_SALT)
