"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over the headline set; per-query
timings are in ``queries``. Each query is forced with a count() so the
full plan executes without collecting results to the driver.

Protocol (round 3+, adaptive since round 11): each query is timed at
least 3 and up to REPS times (stopping early once the minimum stops
improving) and the MINIMUM is reported — the minimum of repeated runs
isolates plan cost from scheduler/GC jitter and from the box's noisy
neighbors (3-4x run-to-run swings under load spikes per BASELINE.md
r11), so round-over-round deltas reflect plan changes, not noise.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from market_data_pipeline_databricks_spark.plans import relational
from market_data_pipeline_databricks_spark.session import get_spark

# Headline set: one per operator family, weighted toward the shapes
# that stress shuffle/window/join machinery at scale.
HEADLINE = [
    "agg_pricing_summary",
    "filter_project_revenue",
    "join_revenue_by_nation",
    "join_range_volatility_expansion",
    "window_supplier_daily_gold",
    "window_latest_snapshot_per_supplier",
    "window_latest_snapshot_pruned",
    "window_sessionization",
    "window_rolling_range_avg",
    "funcs_feature_panel",
    "sort_topk_orders",
    # Heavy extension paths (round 4+): the expensive dedup/curation
    # plans were previously timed only by the self-reported sweep, so a
    # plan regression like round 3's 84 s minhash bug would not show in
    # the driver's BENCH. Timing them here makes the driver catch it.
    "dedup_minhash_near",
    "dedup_components",
    "curate_training_corpus",
    "vector_ann_near_dup_lsh",
    # round-4 continuation: the iterative PageRank and the
    # centrality-survivor chain both depend on multi-consumer
    # checkpoints (trans matrix / pair list) — timing them here makes
    # the driver catch a lost checkpoint (28 s / 25 s regressions)
    "graph_part_pagerank",
    "dedup_representative_survivors",
    # round-5: the LSH curation capstones are the advertised 100-TB
    # paths (the exact variants above are their labeled baselines) —
    # un-benched, a plan regression in the banded-join path would be
    # invisible to the driver. Baselines in BASELINE.md.
    "curate_chunk_corpus_lsh",
    "curate_multimodal_corpus_lsh",
    # round-6: the widest TPC-H join trees — the headline set was all
    # market-window + curation ops, so a plan regression in a 6-way
    # join (q9: part⋈supplier⋈lineitem⋈partsupp-shaped⋈orders⋈nation)
    # or the multi-semi/anti q21 would be driver-invisible. Baselines
    # in BASELINE.md (round-6 pins).
    "join_q9_product_type_profit",
    "join_q21_waiting_suppliers",
    # round-7: the content-defined-chunking family is a new heavy text
    # path (k-gram explode + per-doc LEAD window + fingerprint groupBy);
    # un-benched, a boundary-rule or window regression would be
    # driver-invisible. Baseline 3.9-4.8 s at sf0.1 (BASELINE.md r7).
    "dedup_cdc_repeated_chunks",
    # round-8: grouped perceptual image dedup — the binary-decode
    # mapInPandas path plus the distinct-hash banded join; un-benched,
    # a decode-batching or band-join regression would be
    # driver-invisible. Baseline 1.7 s at sf0.1 (BASELINE.md r8).
    "multimodal_image_dedup_groups",
    # round-8 batch 3+: the inverted-index retrieval path (tokenize →
    # filtered posting groupBy → broadcast-joined scoring → windowed
    # top-k with map-side group limit), the cross-source shingle-hash
    # contamination matrix, and the real-decode audio fingerprint —
    # three new heavy shapes (posting join, hash self-join, Arrow
    # decode) the driver bench would otherwise not cover. Baselines
    # 1.5 / 0.9 / 1.1 s at sf0.1 (BASELINE.md r8).
    "text_bm25_topk",
    "text_cross_source_contamination",
    "multimodal_audio_near_dup",
    # round-9: the Ed-Join blocked edit-distance path (q-gram prefix
    # candidates + threshold-banded levenshtein verify) is the newest
    # heavy similarity shape — un-benched, a candidate-explosion or
    # banded-verify regression (69 s unbanded) would be
    # driver-invisible. Baseline 5.7 s warm at sf0.1 (BASELINE.md r9).
    "dedup_edit_distance_qgram",
    # round-10: the pairwise-correlation matrix adds the day-keyed
    # self-join + decimal component-sum shape (a return-aligned pair
    # fan-out the other headliners don't exercise); a universe-filter
    # or join-order regression would otherwise be driver-invisible.
    "funcs_pairwise_correlation",
    # round-11: the two new scale paths. The per-key two-pass rank
    # (range partition → local window → offset broadcast) and the
    # quantile-bucketed z-order governance rewrite (approxQuantile
    # sketch + binary-search bucket codegen + range-partitioned write)
    # — un-benched, a window-repartition or bucket-expression
    # regression (the r11 interpreted-HOF bug cost 4.3x) would be
    # driver-invisible. Baselines 1.5 s / 5.1 s at sf0.1 (BASELINE.md
    # r11).
    "scale_salted_window_rank",
    "scale_layout_zorder_pruning",
    # round-12: the two new warehouse/stream maintenance drives. The
    # partition-evolution commit path (spec-aware range-clustered
    # commits + manifest-pruned read) and the incremental streaming
    # rank (3 micro-batches through foreachBatch + two-pass rank +
    # keyed upsert) — un-benched, a clustering/stats regression or a
    # per-batch O(history) recompute slip would be driver-invisible.
    "warehouse_partition_evolution",
    "stream_rank_maintenance",
    # round-13: the two new drives. Hidden partitioning (transform
    # spec keys: month()/bucket() clustering + predicate mapping at
    # the manifest) and the late-arrival rank repair (order-guard
    # refusal + affected-key rerank + untouched-partition stability)
    # — un-benched, a transform-stats regression or an
    # O(whole-table) repair slip would be driver-invisible. The
    # maintenance drive also switched to the day-partitioned
    # production layout this round (same band as flat, measured).
    "warehouse_hidden_partitioning",
    "stream_rank_repair",
    # round-14: the two debut drives. The incremental materialized-
    # aggregate maintenance (watermark-merged groupBy state, bucket-
    # pruned upserts) and the composite-spec conjunctive manifest
    # pruning — un-benched, a watermark-merge recompute slip or a
    # pruning regression would be driver-invisible, the same class of
    # gap every prior round's additions closed. Baselines at sf0.1:
    # ~7.4 s / ~3.7 s (OPTIMIZATION_r14.md).
    "stream_agg_maintenance",
    "warehouse_composite_spec_pruning",
]


def _wait_for_quiet_box() -> float:
    """Bounded pre-flight: delay the run until the 1-min load average
    drops below a threshold, so the one driver-visible record lands in
    a quiet window when one exists within the wait budget.

    The box has noisy neighbors (load swings 0.3-11; BASELINE.md r11);
    BENCH_r11 was budget-degraded purely by starting inside a spike.
    Waiting is bounded — a record under documented load still beats a
    DNF — and the seconds waited are reported in the JSON so the
    reader can tell a gated start from a lucky one.
    """
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "3.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_WAIT_SEC", "300"))
    return _wait_below(threshold, max_wait)


def _own_tree_pids() -> set[int]:
    """This process and every descendant (the Spark JVM and its Python
    workers are children of this interpreter), from /proc."""
    me = os.getpid()
    ppid: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid[int(d)] = int(parts[1])
        except (OSError, IndexError, ValueError):
            continue
    pids = {me}
    changed = True
    while changed:
        changed = False
        for p, pp in ppid.items():
            if pp in pids and p not in pids:
                pids.add(p)
                changed = True
    return pids


def _jiffies() -> tuple[int, int]:
    """(total busy jiffies across all CPUs, own-process-tree jiffies)."""
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    busy = sum(v) - v[3] - v[4]  # minus idle + iowait
    own = 0
    for p in _own_tree_pids():
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            own += int(parts[11]) + int(parts[12])  # utime + stime
        except (OSError, IndexError, ValueError):
            continue
    return busy, own


def _others_busy_cores(interval: float = 1.0) -> float:
    """CPU cores currently busy in OTHER processes, sampled over
    ``interval`` seconds. The 1-min load average cannot tell a genuine
    neighbor spike from the decay tail of this bench's own just-finished
    stages (every r14 record exhausted the mid-run gate on self-load —
    r14 verdict item 4); instantaneous other-process CPU can."""
    try:
        hz = os.sysconf("SC_CLK_TCK")
        b0, o0 = _jiffies()
        time.sleep(interval)
        b1, o1 = _jiffies()
        others = max(0, (b1 - b0) - (o1 - o0))
        return others / hz / interval
    except (OSError, ValueError):
        # /proc unavailable: report the conservative loadavg so the
        # gate degrades to its old behavior rather than disabling
        return os.getloadavg()[0]


def _box_busy(threshold: float) -> bool:
    """Quiet-box test for the gates. Fast path: a sub-threshold 1-min
    loadavg is quiet with no sampling cost. Elevated loadavg triggers
    the 1-second other-process CPU sample: only CPU burned OUTSIDE this
    bench's process tree counts, so the decay tail of our own finished
    stages no longer spends the wait budget. Timing methodology is
    unchanged — the gates still only decide when draws START; waited
    seconds never enter per-query numbers."""
    if os.getloadavg()[0] < threshold:
        return False
    return _others_busy_cores() >= threshold


def _wait_below(threshold: float, max_wait: float) -> float:
    t0 = time.perf_counter()
    while True:
        waited = time.perf_counter() - t0
        if waited >= max_wait or not _box_busy(threshold):
            return round(waited, 1)
        time.sleep(min(15.0, max_wait - waited))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    gate_waited = _wait_for_quiet_box()
    others_start = round(_others_busy_cores(), 2)
    spark = get_spark(app_name="bench")

    # Warm the JVM + parquet footers + codegen paths (scan, hash-agg,
    # exchange, window) once so timings measure the queries, not
    # session bootstrap or first-use JIT.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()
    li.limit(10000).groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(27,2)")),
        F.count(F.lit(1)),
    ).count()
    li.limit(10000).withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("l_suppkey").orderBy("l_shipdate")
        ),
    ).count()

    from market_data_pipeline_databricks_spark.plans.registry import all_queries

    queries = all_queries()
    # Adaptive reps since round 11: the box acquired noisy neighbors
    # (1-min load swings 0.3-11 independent of our work; 32-thread
    # Spark stages run 2-3x slower during spikes while the
    # single-thread calibration constant is unaffected — BASELINE.md
    # r11). Each query runs at least 3 reps and stops once the min is
    # CONFIRMED — the two fastest draws agree within 15% — else it gets
    # up to 5 draws to land in a quiet scheduling window. (A pure
    # min-improving rule would stop early under a spike spanning the
    # first draws; agreement-of-two measures confirmation, and when a
    # spike outlasts all 5 draws no local rule can help — the load_avg
    # fields record that for the reader.) Quiet box: the old min-of-3
    # wall.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    reps_min = min(3, reps)
    # Completion guard: under a sustained neighbor spike every draw
    # inflates ~3x, and 30 queries x 5 draws can outlast whatever wall
    # the caller allows — a complete (flagged) record beats a DNF. Past
    # the budget, remaining queries run a single draw and the JSON says
    # so via "degraded_after".
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "900"))
    # Per-query quiet gate (round 12): two of three r12 runs degraded
    # from spikes arriving MID-RUN, which the start gate cannot see. A
    # bounded wait before each query's draws (45 s/query, 240 s total
    # across the run) lets the min land in the next lull instead of
    # recording a 10-30x inflated draw set; waited seconds do not
    # consume the wall budget (the deadline shifts by the wait) and
    # are reported in the JSON alongside the start-gate wait.
    q_gate = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "3.0"))
    q_wait_cap = float(os.environ.get("SPARK_GRAFT_BENCH_QWAIT_SEC", "45"))
    q_wait_total_cap = float(
        os.environ.get("SPARK_GRAFT_BENCH_QWAIT_TOTAL_SEC", "240")
    )
    midrun_waited = 0.0
    bench_t0 = time.perf_counter()
    degraded_after: str | None = None
    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        if os.getloadavg()[0] >= q_gate and midrun_waited < q_wait_total_cap:
            midrun_waited += _wait_below(
                q_gate, min(q_wait_cap, q_wait_total_cap - midrun_waited)
            )
        over_budget = (
            time.perf_counter() - bench_t0 - midrun_waited > budget
        )
        if over_budget and degraded_after is None:
            degraded_after = name
        draws: list[float] = []
        while len(draws) < (1 if over_budget else reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            draws.append(time.perf_counter() - t0)
            if len(draws) >= max(2, reps_min):
                fastest, second = sorted(draws)[:2]
                if second <= fastest * 1.15:
                    break
        timings[name] = round(min(draws), 3)
        # Queries persist multi-consumer frames that must outlive the
        # call (the driver contract returns lazy DataFrames), so a
        # 26-query session accumulates storage blocks until later heavy
        # queries pay eviction/GC instead of their plan (measured: the
        # CDC headliner ran 15.4 s inside an uncleared sf1.0 session vs
        # 5.0 s isolated). Clearing between queries measures each PLAN,
        # matching the per-query rehearsal protocol in BASELINE.md.
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "protocol": "min_of_adaptive_reps_3_to_5",
                # calibration stays pinned at min-of-3: the constant
                # normalizes against rounds 3-10, which all recorded it
                # at 3 reps — changing its protocol would bias the
                # cross-round drift ratio it exists to provide
                "calibration_sec": _calibration(3),
                "load_avg_start": [round(x, 2) for x in load_start],
                # other-process CPU cores at the run boundaries: the
                # gates' actual quiet measure since r15 (1-min loadavg
                # cannot tell a neighbor spike from our own stages'
                # decay tail, which exhausted every r14 mid-run gate)
                "others_cpu_cores_start": others_start,
                "others_cpu_cores_end": round(_others_busy_cores(), 2),
                "quiet_gate_waited_sec": gate_waited,
                "midrun_gate_waited_sec": round(midrun_waited, 1),
                # a spent mid-run gate means later queries ran WITHOUT
                # spike protection — the record may be spike-priced
                # even when no draw breached the wall budget
                # ("degraded_after" stays null in that case). Flagged
                # explicitly so such a record self-identifies (r13
                # verdict: 240.0 s waited + degraded_after null read
                # as undegraded).
                "midrun_gate_exhausted": midrun_waited
                >= q_wait_total_cap - 1.0,
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
                "degraded_after": degraded_after,
            }
        )
    )


def _calibration(reps: int) -> float:
    """Fixed-work DuckDB aggregation, min-of-reps — a box-speed
    constant independent of Spark (round-6 verdict task 8). The r5→r6
    relational headliners drifted ~1.4× uniformly from box load, which
    made round-over-round comparison noisy; dividing a round's timings
    by (calibration_r{N} / calibration_r{M}) normalizes that drift.
    Threads pinned to 8 so the constant measures single-box CPU+memory
    speed under a stable parallelism, not scheduler contention."""
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=8")
    q = (
        "SELECT sum(x * x), count(*) FROM "
        "(SELECT (range * 2654435761) % 1000000007 AS x FROM range(50000000))"
    )
    best = float("inf")
    for _ in range(max(reps, 2)):
        t0 = time.perf_counter()
        con.execute(q).fetchall()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


if __name__ == "__main__":
    main()
