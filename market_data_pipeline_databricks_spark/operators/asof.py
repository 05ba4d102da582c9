"""As-of join: for each left row, the latest right row at-or-before
its timestamp, per key.

The canonical market-data join (trade → prevailing quote) that Spark
has no native operator for. Built as a composition of existing
DataFrame ops — the union + carry-forward-window trick:

1. tag both sides and union them on (key, time);
2. one window per key ordered by (time, side) — right rows sort
   before left rows at equal time, so "at-or-before" includes
   same-instant quotes;
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding frame
   carries the latest right values forward;
4. keep only left rows.

Scale: ONE shuffle on the key (both inputs), one sort — same cost
envelope as a sort-merge join, with none of the per-key
``merge_asof`` pandas-UDF serialization. This is the plan a dedicated
range-join engine builds internally.

Verified against DuckDB's native ``ASOF JOIN`` (plans/asof_ops.py) —
our composition must hash-match a purpose-built implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of left join.

    Right-side ``value_cols`` (and ``right_time``) appear on each left
    row as ``{prefix}{col}`` — NULL when no right row at-or-before the
    left time exists. (key, right_time) should be unique for
    deterministic results; pre-dedup the right side otherwise.
    """
    lcols = left.columns
    l = left.withColumn(_SIDE, F.lit(1)).withColumn("__t__", F.col(left_time))
    r = right.select(
        F.col(key),
        F.col(right_time).alias("__t__"),
        *[F.col(c) for c in value_cols],
    ).withColumn(_SIDE, F.lit(0))

    # Carry ONE struct of all right columns, not per-column last():
    # independent per-column carries would mix values from different right
    # rows whenever the latest right row has a NULL in one value column,
    # diverging from native ASOF JOIN semantics (which returns the latest
    # row wholesale, NULLs included). The struct itself is non-null for
    # every right row, so last(ignorenulls=True) always picks whole rows.
    carried = [right_time] + value_cols
    r = r.withColumn(
        "__v__",
        F.struct(
            F.col("__t__").alias(right_time),
            *[F.col(c).alias(c) for c in value_cols],
        ),
    ).drop(*value_cols)

    unioned = l.unionByName(r, allowMissingColumns=True)

    # right rows (side 0) sort before left rows (side 1) at equal time:
    # an exactly-simultaneous quote is visible to the trade.
    w = Window.partitionBy(key).orderBy("__t__", _SIDE).rowsBetween(
        Window.unboundedPreceding, 0
    )
    unioned = unioned.withColumn("__v__", F.last("__v__", ignorenulls=True).over(w))
    return unioned.filter(F.col(_SIDE) == 1).select(
        *lcols,
        *[F.col(f"__v__.{c}").alias(f"{prefix}{c}") for c in carried],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Forward as-of left join: the EARLIEST right row at-or-after each
    left row's time (settlement/next-delivery direction; the mirror of
    ``asof_join``).

    Same union + one-window plan, reflected: left rows sort BEFORE
    right rows at equal time (so an exactly-simultaneous right row is
    inside the following frame), and ``first(ignorenulls=True)`` over
    a current-row→unbounded-following frame pulls the next right
    struct backward. One shuffle on the key, one sort — identical cost
    envelope to the backward form.
    """
    lcols = left.columns
    l = left.withColumn(_SIDE, F.lit(0)).withColumn("__t__", F.col(left_time))
    r = right.select(
        F.col(key),
        F.col(right_time).alias("__t__"),
        *[F.col(c) for c in value_cols],
    ).withColumn(_SIDE, F.lit(1))

    carried = [right_time] + value_cols
    r = r.withColumn(
        "__v__",
        F.struct(
            F.col("__t__").alias(right_time),
            *[F.col(c).alias(c) for c in value_cols],
        ),
    ).drop(*value_cols)

    unioned = l.unionByName(r, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy("__t__", _SIDE).rowsBetween(
        0, Window.unboundedFollowing
    )
    unioned = unioned.withColumn(
        "__v__", F.first("__v__", ignorenulls=True).over(w)
    )
    return unioned.filter(F.col(_SIDE) == 0).select(
        *lcols,
        *[F.col(f"__v__.{c}").alias(f"{prefix}{c}") for c in carried],
    )
