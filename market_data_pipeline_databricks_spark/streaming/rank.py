"""Streaming incremental per-key rank maintenance — the foreachBatch
twin of the two-pass rank (VERDICT r11 task 7).

The maintained table assigns every event its per-key sequence number
(``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts, id)``). A naive
streaming implementation recomputes the window over all history each
micro-batch — O(history) per batch, the streaming analogue of the
recompute-everything gold job. This maintenance is INCREMENTAL:

- precondition (STRICT, the classic streaming-rank premise): the
  stream is event-time ordered ACROSS micro-batches and equal-``ts``
  rows never split across a batch boundary — every row of batch N+1
  has ``ts`` strictly greater than every row of batch N, OR shares no
  ``ts`` value with batch N (value-cut file drops satisfy this; a
  boundary TIE would let the strict ``ts < batch-min`` offset miss the
  already-ranked tied rows and mint a duplicate rank). The sink GUARDS
  the precondition: foreign rows at ``ts >=`` the batch min that the
  batch does not contain raise instead of corrupting the table — late
  rows go through :func:`repair_ranks` (the batch two-pass rank over
  the affected keys).
- per batch: the per-key OFFSET is the count of already-ranked rows
  with ``ts`` strictly below the batch's min ts — counted from the
  maintained table itself, so a REPLAYED batch (failure before the
  checkpoint commit) excludes its own landed rows and recomputes the
  same offsets: exactly-once in effect, with no side counter to drift.
- within the batch, ranks come from the shared two-pass operator
  (operators/ranking.py) — batch-scaled work, skew-safe;
- rows land through the idempotent keyed upsert (replays rewrite the
  same values).

Scale shape: the RANKING work is O(batch); the offsets count and the
precondition guard are column-pruned scans of the maintained table
(``partition_by_month=True`` partitions the table by a ts-derived
month so both prune to recent partitions AND the keyed upsert rewrites
only the touched months — without it the parquet upsert rewrites the
whole table each batch, fine for drives, wrong for production). The
offset frame itself is |batch keys| rows, broadcast back. State is the
checkpointed file log — never row-scaled driver state.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RankOrderViolation(ValueError):
    """The micro-batch overlaps already-ranked event time: either a
    late arrival or an equal-``ts`` split across a batch boundary. The
    maintained table was NOT modified; route the offending rows through
    :func:`repair_ranks`."""


def stream_rank_maintenance(
    events_stream: DataFrame,
    warehouse_dir: str,
    table: str = "events_ranked",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    rank_col: str = "user_seq",
    checkpoint_dir: str | None = None,
    partition_by_month: bool = False,
    partition_fmt: str = "yyyy-MM",
) -> None:
    """Drain ``events_stream`` (availableNow) into ``warehouse_dir/
    table``, assigning each row its per-``key_col`` rank by
    (``ts_col``, ``id_col``) incrementally (module docstring). The
    final table equals the batch window over the full input whenever
    the stream respects the strict cross-batch event-time order — a
    violating batch raises :class:`RankOrderViolation` before any
    write. ``partition_by_month=True`` is the production layout: the
    table partitions on a ts-derived bucket (functionally determined by
    ``id_col`` — an event's ts never changes — so the upsert skips the
    prior-partition scan) and each batch rewrites only touched buckets.
    ``partition_fmt`` sets the bucket grain (a ``date_format`` pattern;
    the default ``yyyy-MM`` is calendar months — pick the grain that
    puts a micro-batch's span across a handful of partitions). The
    partition column is named ``__p_month`` at every grain.
    """
    from market_data_pipeline_databricks_spark.operators.ranking import (
        two_pass_key_rank,
    )
    from market_data_pipeline_databricks_spark.sources.tables import (
        read_table,
    )
    from market_data_pipeline_databricks_spark.sources.writers import (
        upsert_by_key,
    )

    auto_checkpoint = checkpoint_dir is None
    if auto_checkpoint:
        checkpoint_dir = tempfile.mkdtemp(prefix=f"ckpt_rank_{table}_")
    pcols = ["__p_month"] if partition_by_month else None

    def _p(df: DataFrame) -> DataFrame:
        return (
            df.withColumn(
                "__p_month", F.date_format(F.col(ts_col), partition_fmt)
            )
            if partition_by_month
            else df
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint()  # cut per-batch lineage
        # NON-NULL event time is a hard precondition, guarded here in
        # the sink's fail-loud style: F.min skips NULLs and both the
        # foreign probe (ts >= bmin) and the offset count (ts < bmin)
        # exclude NULL-ts rows, so a NULL-ts event would bypass the
        # order guard AND the offsets and silently mint a duplicate
        # per-key rank (NULLS FIRST in the asc window).
        if batch.filter(F.col(ts_col).isNull()).take(1):
            raise RankOrderViolation(
                f"micro-batch {batch_id} contains NULL {ts_col} rows — "
                "event time must be non-null for incremental rank "
                "maintenance (NULL-ts rows bypass the order guard and "
                "the offset count); filter or impute upstream"
            )
        bmin = batch.agg(F.min(ts_col).alias("m")).first()["m"]
        # explicit existence probe, not try/except around the scan: a
        # missing first-batch table is the normal case, and letting the
        # AnalysisException fly inside foreachBatch makes the streaming
        # engine log a scary (but handled) ERROR every cold start
        from pathlib import Path

        existing = (
            read_table(spark, warehouse_dir, table)
            if (Path(warehouse_dir) / table).exists()
            else None
        )
        ranked = two_pass_key_rank(
            batch,
            [key_col],
            [F.asc(ts_col), F.asc(id_col)],
            rank_col,
        )
        if existing is not None:
            # PRECONDITION GUARD (strict order, module docstring): an
            # already-ranked row at ts >= batch-min that the batch does
            # NOT itself contain is a late-arrival overlap or an
            # equal-ts boundary split — ranking NEW rows under it would
            # mint duplicates / leave stale ranks. Replay-safe twice
            # over: a replayed batch's own landed rows match by id (not
            # foreign), and a full RE-DRAIN (fresh checkpoint, later
            # batches already landed) carries no NEW rows at all, so
            # the second check lets it rewrite identical values. Both
            # probes run only in the rare foreign case; the first is
            # ts-bounded (partition-pruned under partition_by_month).
            foreign = (
                existing.filter(F.col(ts_col) >= F.lit(bmin))
                .join(batch.select(id_col), id_col, "anti")
                .take(1)
            )
            if foreign and batch.join(
                existing.select(id_col), id_col, "anti"
            ).take(1):
                raise RankOrderViolation(
                    f"micro-batch {batch_id} brings NEW rows while "
                    f"already-ranked rows exist at or after its min "
                    f"{ts_col} ({bmin!r}) — strict cross-batch order "
                    "violated (late rows or an equal-ts boundary "
                    "split); use repair_ranks for the offending rows"
                )
            # offsets from the maintained table, NOT a side counter:
            # strict ts < batch-min excludes a replayed batch's own
            # landed rows, so replays recompute identical ranks.
            # NULL-safe key join: a NULL key is a normal window
            # partition and must pick up its offset too.
            offsets = (
                existing.filter(F.col(ts_col) < F.lit(bmin))
                .groupBy(key_col)
                .agg(F.count(F.lit(1)).alias("__base"))
                .withColumnRenamed(key_col, "__k")
            )
            ranked = (
                ranked.join(
                    F.broadcast(offsets),
                    F.col(key_col).eqNullSafe(F.col("__k")),
                    "left",
                )
                .withColumn(
                    rank_col,
                    (
                        F.coalesce(F.col("__base"), F.lit(0))
                        + F.col(rank_col)
                    ).cast("long"),
                )
                .drop("__base", "__k")
            )
        upsert_by_key(
            spark,
            _p(ranked),
            warehouse_dir,
            table,
            [id_col],
            pcols,
            stable_partitions=partition_by_month,
        )

    q = (
        events_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if auto_checkpoint:
            shutil.rmtree(checkpoint_dir, ignore_errors=True)


def repair_ranks(
    spark,
    late_rows: DataFrame,
    warehouse_dir: str,
    table: str = "events_ranked",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    rank_col: str = "user_seq",
    partition_by_month: bool = False,
    partition_fmt: str = "yyyy-MM",
) -> None:
    """Late-arrival repair for the maintained rank table: when rows
    violate the stream's event-time-order precondition (a late event
    whose ``ts`` precedes already-ranked rows of its key), insert them
    and RE-RANK only the affected keys — the batch two-pass rank over
    ``O(affected keys' rows)``, never the whole table's ranking.

    Idempotent: re-running with the same late rows recomputes and
    rewrites identical ranks. Scale shape: the affected-key subset is
    located with one broadcast semi-join on the key column (NULL-safe:
    a NULL-keyed late row repairs the NULL-key partition); the rerank
    tracks the hot keys' row counts. The WRITE is bounded only under
    ``partition_by_month=True`` (matching the maintenance layout —
    touched months rewrite); the unpartitioned parquet upsert rewrites
    the whole table, acceptable for drives, not for production."""
    from market_data_pipeline_databricks_spark.operators.ranking import (
        two_pass_key_rank,
    )
    from market_data_pipeline_databricks_spark.sources.tables import (
        read_table,
    )
    from market_data_pipeline_databricks_spark.sources.writers import (
        _null_safe_semi,
        upsert_by_key,
    )

    existing = read_table(spark, warehouse_dir, table)
    if partition_by_month:
        existing = existing.drop("__p_month")
    # same non-null event-time precondition as the streaming sink: a
    # NULL-ts row landed here would poison every later batch's offset
    # count and order guard (both ts-bounded filters skip NULLs).
    if late_rows.filter(F.col(ts_col).isNull()).take(1):
        raise RankOrderViolation(
            f"late rows contain NULL {ts_col} — event time must be "
            "non-null for rank maintenance; filter or impute upstream"
        )
    keys = late_rows.select(key_col).distinct()
    affected = _null_safe_semi(existing, keys, [key_col]).drop(rank_col)
    # union late rows (dedup by id against rows already present — a
    # replayed repair re-delivers the same late rows)
    merged = affected.unionByName(
        late_rows.select(*affected.columns)
    ).dropDuplicates([id_col])
    reranked = two_pass_key_rank(
        merged, [key_col], [F.asc(ts_col), F.asc(id_col)], rank_col
    )
    if partition_by_month:
        reranked = reranked.withColumn(
            "__p_month", F.date_format(F.col(ts_col), partition_fmt)
        )
    upsert_by_key(
        spark,
        reranked,
        warehouse_dir,
        table,
        [id_col],
        ["__p_month"] if partition_by_month else None,
        stable_partitions=partition_by_month,
    )
