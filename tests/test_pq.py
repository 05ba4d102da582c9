"""Product quantization: code validity/determinism, self-retrieval
through the quantizer (every query must find its own compressed self),
ADC distance correctness against a numpy replay, and recall vs exact
L2 search on the synthetic corpus (bounded: random vectors quantize
hard — the structural properties, not the recall number, are the
contract here)."""

from __future__ import annotations

import pytest

from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators import pq as PQ

SF = "/root/testdata/sf0.001"


def _fit(spark, m=16, k=16):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    books = PQ.pq_train(emb, m=m, k=k, iters=4)
    codes = PQ.pq_encode(emb, books).persist()
    return emb, books, codes


def test_codes_valid_and_partitioning_invariant(spark):
    emb, books, codes = _fit(spark)
    m, k, dsub = books.shape
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == m
        assert all(0 <= c < k for c in r.codes)
    again = {
        r.id: tuple(r.codes)
        for r in PQ.pq_encode(emb.repartition(7), books).collect()
    }
    assert again == {r.id: tuple(r.codes) for r in rows}


def test_adc_matches_numpy_replay_and_self_retrieval(spark):
    emb, books, codes = _fit(spark)
    m, k, dsub = books.shape
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    out = PQ.pq_adc_topk(codes, books, queries, topk=5).collect()

    X = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in emb.collect()}
    C = {r.id: np.asarray(r.codes) for r in codes.collect()}

    def adc(qid, nid):
        q = X[qid]
        total = 0.0
        for j in range(m):
            sub = q[j * dsub : (j + 1) * dsub]
            cw = books[j][C[nid][j]]
            total += ((sub - cw) ** 2).sum()
        return total

    got = defaultdict(list)
    for r in out:
        got[r.qid].append(r)
        assert abs(r.adc_dist - round(adc(r.qid, r.neighbor_id), 6)) < 1e-6
    # every query retrieves its own quantized self
    for qid, rows in got.items():
        assert len(rows) == 5
        assert qid in {r.neighbor_id for r in rows}, qid


def test_recall_floor_vs_exact_l2(spark):
    emb, books, codes = _fit(spark)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    out = PQ.pq_adc_topk(codes, books, queries, topk=5).collect()
    X = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in emb.collect()}
    got = defaultdict(set)
    for r in out:
        got[r.qid].add(r.neighbor_id)
    recalls = []
    for qid, neigh in got.items():
        q = X[qid]
        exact = sorted(X, key=lambda i: ((X[i] - q) ** 2).sum())[:5]
        recalls.append(len(set(exact) & neigh) / 5)
    # uniform synthetic vectors are the hard case; measured ~0.44 at
    # m=16,k=16 — floor set with margin, the regression signal is a
    # COLLAPSE (e.g. codes all zero), not a small drift
    assert sum(recalls) / len(recalls) >= 0.3
    # 32x compression: 16 uint8 codes vs 64 float32 dims
    assert 64 * 4 / 16 == 16.0


def test_ivfpq_prunes_and_keeps_recall_vs_plain_pq(spark):
    """The IVF stage must PRUNE (fewer candidate rows than full ADC)
    while the returned neighbors stay consistent with plain-PQ ADC for
    the probed fraction: every IVF-PQ neighbor's (qid, dist) must
    appear in the full ADC ranking with the same distance."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    out = PQ.ann_topk_ivfpq(
        emb, queries, topk=5, n_cells=8, nprobe=3, m=16, k_code=16
    ).collect()
    assert out, "ivfpq returned nothing"
    by_q = defaultdict(list)
    for r in out:
        by_q[r.qid].append(r)
    # full (unpruned) ADC with the same codebooks is rebuilt here
    books = PQ.pq_train(emb, m=16, k=16, iters=4)
    codes = PQ.pq_encode(emb, books)
    full = PQ.pq_adc_topk(codes, books, queries, topk=50)
    full_dist = {(r.qid, r.neighbor_id): r.adc_dist for r in full.collect()}
    for qid, rows in by_q.items():
        assert 1 <= len(rows) <= 5
        # ranks are contiguous from 1 and distances non-decreasing
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ds = [r.adc_dist for r in sorted(rows, key=lambda r: r.rank)]
        assert ds == sorted(ds)
        for r in rows:
            key = (r.qid, r.neighbor_id)
            if key in full_dist:  # same codebooks -> identical distance
                assert abs(full_dist[key] - r.adc_dist) < 1e-6
        # the query's own cell is always probed -> self-retrieval holds
        assert qid in {r.neighbor_id for r in rows}


def test_pq_train_empty_input_raises_clearly(spark):
    import pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no rows"):
        PQ.pq_train(empty, m=4, k=4)


def test_pq_train_explicit_dim_skips_probe(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = PQ.pq_train(emb, m=16, k=8, iters=2, dim=64)
    assert books.shape == (16, 8, 4)


@pytest.mark.slow
def test_ivfpq_one_metric_l2_cells_on_varying_norms(spark):
    """IVF-PQ must use ONE metric end to end (round-4 advice): a
    cosine coarse stage assigns a small-norm vector to the cell of its
    DIRECTION (here the far cluster on the +x axis), pruning its true
    L2 neighbors near the origin. Corpus: FAR cluster at (100, 0, ...),
    NEAR cluster at (1, 1, ...), probes at (0.5, 0, ...) — +x direction
    like FAR, L2-nearest to NEAR. Under metric="l2" the probes must
    share a cell with NEAR, and end-to-end IVF-PQ top-1 must come from
    NEAR (cosine cells would return FAR ids)."""
    import numpy as np

    from market_data_pipeline_databricks_spark.operators.similarity import (
        assign_ivf_cells,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(11)
    dim = 8
    rows = []
    for i in range(30):  # FAR: ids 0-29
        v = np.zeros(dim); v[0] = 100.0
        rows.append((i, [float(x) for x in v + rng.randn(dim) * 0.5]))
    for i in range(30, 60):  # NEAR: ids 30-59
        v = np.zeros(dim); v[0] = 1.0; v[1] = 1.0
        rows.append((i, [float(x) for x in v + rng.randn(dim) * 0.1]))
    for i in range(60, 64):  # probes: ids 60-63, +x direction, tiny norm
        v = np.zeros(dim); v[0] = 0.5
        rows.append((i, [float(x) for x in v + rng.randn(dim) * 0.01]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = train_ivf_centroids(emb, n_cells=2, metric="l2")
    celled = {
        r.vec_id: r.cells[0]
        for r in assign_ivf_cells(emb, cents, nprobe=1, metric="l2").select(
            "vec_id", "cells"
        ).collect()
    }
    near_cell = {celled[i] for i in range(30, 60)}
    far_cell = {celled[i] for i in range(30)}
    assert len(near_cell) == 1 and len(far_cell) == 1 and near_cell != far_cell
    # the +x-direction, tiny-norm probes belong with NEAR under L2
    # (a cosine coarse stage puts them in FAR's direction cell)
    assert {celled[i] for i in range(60, 64)} == near_cell

    queries = emb.filter(F.col("vec_id") >= 60)
    got = PQ.ann_topk_ivfpq(
        emb, queries, topk=3, n_cells=2, nprobe=1, m=2, k_code=16
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.rank, r.neighbor_id))
    for qid, pairs in by_q.items():
        top1 = min(pairs)[1]
        assert 30 <= top1 < 64, (qid, pairs)  # NEAR or a fellow probe
