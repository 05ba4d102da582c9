"""Streaming incremental per-key rank maintenance — the foreachBatch
twin of the two-pass rank (VERDICT r11 task 7).

The maintained table assigns every event its per-key sequence number
(``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts, id)``). A naive
streaming implementation recomputes the window over all history each
micro-batch — O(history) per batch, the streaming analogue of the
recompute-everything gold job. This maintenance is INCREMENTAL:

- precondition (documented, the classic streaming-rank premise): the
  stream is event-time ordered ACROSS micro-batches — every row of
  batch N+1 has ``ts`` >= every row of batch N. File drops cut on time
  boundaries satisfy this; a late row would need the batch-rank repair
  job instead (the batch two-pass rank over the affected keys).
- per batch: the per-key OFFSET is the count of already-ranked rows
  with ``ts`` strictly below the batch's min ts — counted from the
  maintained table itself, so a REPLAYED batch (failure before the
  checkpoint commit) excludes its own landed rows and recomputes the
  same offsets: exactly-once in effect, with no side counter to drift.
- within the batch, ranks come from the shared two-pass operator
  (operators/ranking.py) — batch-scaled work, skew-safe;
- rows land through the idempotent keyed upsert (replays rewrite the
  same values).

Scale shape: per-batch cost is O(batch) for ranking + one
column-pruned aggregate over the maintained table for offsets (at
production scale the table is ts-partitioned so the ``ts <
batch_min`` count prunes to recent partitions; the offset frame itself
is |batch keys| rows, broadcast back). State is the checkpointed file
log — never row-scaled driver state.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_rank_maintenance(
    events_stream: DataFrame,
    warehouse_dir: str,
    table: str = "events_ranked",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    rank_col: str = "user_seq",
    checkpoint_dir: str | None = None,
) -> None:
    """Drain ``events_stream`` (availableNow) into ``warehouse_dir/
    table``, assigning each row its per-``key_col`` rank by
    (``ts_col``, ``id_col``) incrementally (module docstring). The
    final table equals the batch window over the full input whenever
    the stream respects cross-batch event-time order."""
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

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint()  # cut per-batch lineage
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
            # offsets from the maintained table, NOT a side counter:
            # strict ts < batch-min excludes a replayed batch's own
            # landed rows, so replays recompute identical ranks
            offsets = (
                existing.filter(F.col(ts_col) < F.lit(bmin))
                .groupBy(key_col)
                .agg(F.count(F.lit(1)).alias("__base"))
            )
            ranked = (
                ranked.join(F.broadcast(offsets), key_col, "left")
                .withColumn(
                    rank_col,
                    (
                        F.coalesce(F.col("__base"), F.lit(0))
                        + F.col(rank_col)
                    ).cast("long"),
                )
                .drop("__base")
            )
        upsert_by_key(spark, ranked, warehouse_dir, table, [id_col])

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
) -> None:
    """Late-arrival repair for the maintained rank table: when rows
    violate the stream's event-time-order precondition (a late event
    whose ``ts`` precedes already-ranked rows of its key), insert them
    and RE-RANK only the affected keys — the batch two-pass rank over
    ``O(affected keys' rows)``, never the whole table. All other keys'
    rows are untouched (the keyed upsert rewrites only the partitions
    the repaired rows live in).

    Idempotent: re-running with the same late rows recomputes and
    rewrites identical ranks. Scale shape: the affected-key subset is
    located with one broadcast semi-join on the key column; repair cost
    tracks the hot keys' row counts, not table size."""
    from market_data_pipeline_databricks_spark.operators.ranking import (
        two_pass_key_rank,
    )
    from market_data_pipeline_databricks_spark.sources.tables import (
        read_table,
    )
    from market_data_pipeline_databricks_spark.sources.writers import (
        upsert_by_key,
    )

    existing = read_table(spark, warehouse_dir, table)
    keys = late_rows.select(key_col).distinct()
    affected = existing.join(F.broadcast(keys), key_col, "semi").drop(
        rank_col
    )
    # union late rows (dedup by id against rows already present — a
    # replayed repair re-delivers the same late rows)
    merged = affected.unionByName(
        late_rows.select(*affected.columns)
    ).dropDuplicates([id_col])
    reranked = two_pass_key_rank(
        merged, [key_col], [F.asc(ts_col), F.asc(id_col)], rank_col
    )
    upsert_by_key(spark, reranked, warehouse_dir, table, [id_col])
