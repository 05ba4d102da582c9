"""PageRank operator: mass conservation, teleport floor, and exact
agreement with an independent single-threaded Python replay of the
same recurrence on the same graph."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators.graph import (
    DAMPING,
    TELEPORT,
    cooccurrence_edges,
    pagerank,
)

from tests.conftest import SF_SMALL


def _replay(nodes, edges, iters):
    """Reference PageRank in plain Python (float accumulation; the
    Spark side's decimal protection only changes bits far below the
    comparison tolerance)."""
    out_w = defaultdict(int)
    for s, d, w in edges:
        out_w[s] += w
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        in_sum = defaultdict(float)
        for s, d, w in edges:
            in_sum[d] += rank[s] * (w / out_w[s])
        d_mass = sum(rank[v] for v in nodes if v not in out_w)
        rank = {
            v: TELEPORT / n + DAMPING * (in_sum[v] + d_mass / n)
            for v in nodes
        }
    return rank


def test_pagerank_matches_python_replay_and_conserves_mass(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_SMALL}/part.parquet")
    edges_df = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    nodes_df = part.select(F.col("p_partkey").alias("node"))
    got = {
        r.node: r.rank
        for r in pagerank(nodes_df, edges_df, iterations=3).collect()
    }
    edges = [(r.src, r.dst, r.w) for r in edges_df.collect()]
    nodes = [r.node for r in nodes_df.collect()]
    want = _replay(nodes, edges, 3)
    assert set(got) == set(want)
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-9, v
    # rank is a probability distribution after every round
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # every node keeps at least the teleport floor
    n = len(nodes)
    assert min(got.values()) >= TELEPORT / n - 1e-12


def test_cooccurrence_edges_symmetric_and_bounded(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    edges = {
        (r.src, r.dst): r.w
        for r in cooccurrence_edges(li, "l_orderkey", "l_partkey").collect()
    }
    for (s, d), w in edges.items():
        assert s != d
        assert edges[(d, s)] == w  # symmetric with equal weight
    # weight can never exceed the number of orders either part is in
    orders_per_part = {
        r.l_partkey: r.n
        for r in li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for (s, d), w in edges.items():
        assert w <= min(orders_per_part[s], orders_per_part[d])


def test_pagerank_directed_graph_with_dangling_sink(spark):
    """Asymmetric edges + a pure sink: the sink accumulates rank it
    can only return through the dangling redistribution."""
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (1, 3, 1), (4, 1, 1)],
        "src long, dst long, w long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    got = {r.node: r.rank for r in pagerank(nodes, edges, iterations=4).collect()}
    want = _replay(
        [1, 2, 3, 4, 5], [(1, 2, 1), (2, 3, 2), (1, 3, 1), (4, 1, 1)], 4
    )
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # node 3 is the sink of all paths: it must outrank every other node
    assert got[3] == max(got.values())
    # isolated node 5 holds more than the bare teleport floor (it gets
    # a share of the dangling mass from 3 and 5 themselves)
    assert got[5] > TELEPORT / 5


def test_bfs_hops_matches_python_bfs_on_handmade_graph(spark):
    from market_data_pipeline_databricks_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5, a triangle 10-11-12 reachable from 3, and an
    # isolated node 99 that must never appear
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 10), (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.hop for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 10: 3}
    # exhausted ball: extra rounds are no-ops, not errors
    got5 = {r.node: r.hop for r in bfs_hops(edges, seeds, max_hops=6).collect()}
    assert got5 == {1: 0, 2: 1, 3: 2, 4: 3, 10: 3, 5: 4, 11: 4, 12: 4}
    assert 99 not in got5


def test_bfs_hops_min_distance_with_multiple_seeds(spark):
    from market_data_pipeline_databricks_spark.operators.graph import bfs_hops

    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,), (5,)], ["node"])
    got = {r.node: r.hop for r in bfs_hops(edges, seeds, max_hops=4).collect()}
    # node 3 is 2 hops from both ends; 2 and 4 are 1 hop from a seed
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}
