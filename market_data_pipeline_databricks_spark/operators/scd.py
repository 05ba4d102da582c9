"""Slowly-Changing-Dimension Type 2 maintenance: apply a batch of
updates to a versioned dimension, closing out changed rows and opening
new current versions with validity intervals.

The warehouse counterpart of ``sources/writers.py:upsert_by_key``
(which is SCD Type 1 — overwrite in place): Type 2 keeps full history,
which is what lets the as-of joins in ``operators/asof.py`` and the
point-in-time analyst queries reconstruct "the dimension as it was"
for any past date (reference analogue: the latest-snapshot discipline
of sql/example_queries.sql:7-15, extended to retain the superseded
snapshots instead of discarding them).

Contract:
- ``dim`` rows carry ``valid_from``, ``valid_to`` (NULL = open) and
  ``is_current``; exactly one current row per key.
- ``updates`` carries the natural key + tracked attributes + an
  effective-date column, one row per key per batch (dedupe upstream
  with latest-wins if not).
- A key whose tracked attributes are UNCHANGED is ignored (no
  spurious versioning); a changed key's current row is closed at the
  update's effective date and a new open row is appended; a brand-new
  key inserts an open row. Attribute comparison is null-safe
  (``eqNullSafe``): NULL→value and value→NULL both count as changes.

Scale shape: one shuffle on the natural key (the updates ⋈ current
full-outer join); history rows (is_current = false) are passed through
untouched — at 100 TB, store current and closed rows in separate
partitions so the rewrite is bounded by |current| + |updates|, never
by history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Enrich each fact row with the dimension version that was valid
    AT THE FACT'S OWN TIMESTAMP: key equality + interval containment
    (valid_from <= ts < valid_to, NULL valid_to = still open). This is
    what the history kept by :func:`scd2_apply` is FOR — an as-of
    lookup that reproduces "the dimension as the business saw it",
    where joining the current version would silently rewrite history.

    Scale: dimensions are bounded, so Spark broadcasts the versioned
    dim and the interval predicate evaluates at the probe — no range
    shuffle. Versions tile without overlap (the scd2_apply invariant,
    property-tested), so at most ONE version matches per fact row and
    the join cannot fan out."""
    ts = F.col(f"f.{ts_col}")
    cond = None
    for k in key_cols:
        eq = F.col(f"f.{k}") == F.col(f"d.{k}")
        cond = eq if cond is None else (cond & eq)
    cond = (
        cond
        & (ts >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (ts < F.col("d.valid_to")))
    )
    dim_cols = [
        F.col(f"d.{c}").alias(c)
        for c in dim.columns
        if c not in set(key_cols)
    ]
    return facts.alias("f").join(dim.alias("d"), cond, how).select(
        "f.*", *dim_cols
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_col: str = "effective_date",
) -> DataFrame:
    """Return the post-merge dimension (history + untouched current +
    closed-out rows + newly opened rows). Pure function over
    DataFrames — the caller owns the write.

    Batch presence is tracked by an explicit marker column (the
    cdc.snapshot_diff convention), NOT by ``effective_col IS NOT
    NULL``: with the nullable-column probe, an update row carrying a
    NULL effective date would silently classify as "key absent from
    batch" and its attribute changes would be dropped (round-4
    advice). NULL effective dates are invalid input — they would
    corrupt the version tiling — so they fail fast at execution time
    via a lazy raise_error instead of being reinterpreted."""
    out_cols = [*key_cols, *tracked_cols, "valid_from", "valid_to", "is_current"]
    history = dim.filter(~F.col("is_current")).select(*out_cols)
    current = dim.filter(F.col("is_current"))

    changed = None
    for c in tracked_cols:
        ne = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
        changed = ne if changed is None else (changed | ne)

    joined = current.alias("cur").join(
        updates.withColumn("_u_present", F.lit(True)).alias("upd"),
        on=key_cols,
        how="full_outer",
    )
    has_update = F.col("upd._u_present").isNotNull()
    has_current = F.col("cur.is_current").isNotNull()
    eff_raw = F.col(f"upd.{effective_col}")
    eff = F.when(eff_raw.isNotNull(), eff_raw).otherwise(
        F.raise_error(
            F.lit(
                f"scd2_apply: NULL {effective_col} in updates batch — an "
                "effective date is required to open/close versions"
            )
        ).cast(updates.schema[effective_col].dataType)
    )

    # Emit each joined row's 1-2 output versions from ONE pass via
    # explode, instead of a union of three filtered re-selects of the
    # join: Catalyst does not share the join subtree across union
    # branches (it re-plans it per branch — 3 scans of current at
    # 100 TB); the array/explode form keeps exactly one Join in the
    # plan and one scan per input.
    vt_type = dim.schema["valid_to"].dataType

    def _version(side: str, vfrom, vto, is_cur) -> F.Column:
        return F.struct(
            *[F.col(f"{side}.{c}").alias(c) for c in tracked_cols],
            vfrom.alias("valid_from"),
            vto.cast(vt_type).alias("valid_to"),
            is_cur.alias("is_current"),
        )

    kept = _version(
        "cur",
        F.col("cur.valid_from"),
        F.col("cur.valid_to"),
        F.col("cur.is_current"),
    )
    closed = _version(
        "cur",
        F.col("cur.valid_from"),
        eff,
        F.lit(False),
    )
    opened = _version(
        "upd",
        eff,
        F.lit(None),
        F.lit(True),
    )
    versions = (
        F.when(has_current & has_update & changed, F.array(closed, opened))
        .when(has_current, F.array(kept))  # unchanged or absent from batch
        .otherwise(F.array(opened))  # brand-new key
    )
    merged = joined.select(
        *key_cols, F.explode(versions).alias("_v")
    ).select(*key_cols, "_v.*")
    return history.unionByName(merged.select(*out_cols))
