"""Product quantization (PQ): compressed vector codes + asymmetric
distance computation (ADC) — the memory side of the ANN toolbox
(public technique: Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011; FAISS's IndexPQ — reimplemented from the
published idea on the repo's own distributed k-means).

Where it fits: ``similarity.py`` covers the RECALL side (LSH buckets,
IVF cells prune the candidate set); PQ covers the FOOTPRINT side — a
64-dim float32 vector (256 B) compresses to ``m`` uint8 codes (8 B at
m=8, 32x), so the whole corpus's codes fit in memory where raw vectors
cannot. Production composes both (IVF-PQ): IVF prunes, ADC scores the
survivors from codes alone. Composition is a join of this module's
codes with ``assign_ivf_cells``.

Scale shape:
- Training runs the fully distributed ``kmeans_lloyd`` once per
  subspace over SLICED vectors (m small, each run's driver state is
  k×dsub floats).
- Encoding is one Arrow-batched pass (argmin against an m×k×dsub
  closure broadcast of KBs).
- ADC search broadcasts per-query lookup tables (n_queries × m × k
  doubles — bounded) and scores each code row with m table lookups, no
  vector arithmetic; top-k per query is a window over the scored rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType



def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    sample_size: int = 20000,
) -> np.ndarray:
    """Train per-subspace codebooks on a bounded, deterministic
    driver-side sample (FAISS convention — at 100 TB you still train
    the quantizer on O(100k) vectors; only ENCODING must distribute,
    and it does, in pq_encode's Arrow pass). One Spark job collects
    the id-ordered sample; all ``m`` subspace k-means runs are then
    driver-local numpy with lowest-id initialization — deterministic
    on any cluster or partitioning, and ~10× faster than the previous
    per-subspace distributed loops (m × iters Spark jobs) without
    changing the scale contract. Same centralized-training precedent
    as ``train_ivf_centroids``.

    Returns codebooks of shape (m, k, dim/m). An empty input raises a
    clear ValueError; ``dim`` is validated against the sample."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError(
            f"pq_train: input has no rows — cannot train {vec_col!r} "
            "codebooks on an empty corpus"
        )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    if dim is None:
        dim = X.shape[1]
    assert dim == X.shape[1], f"dim {dim} != data width {X.shape[1]}"
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    books = []
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        cent = sub[: min(k, len(sub))].copy()  # lowest-id init
        for _ in range(iters):
            d = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2 * (sub @ cent.T)
                + (cent * cent).sum(axis=1)
            )
            assign = np.argmin(d, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent)
    return np.stack(books)  # (m, k, dsub)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` codeword indices (the PQ code)."""
    m, k, dsub = codebooks.shape
    books = codebooks  # closure broadcast

    @pandas_udf(ArrayType(IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * dsub : (j + 1) * dsub]
            c = books[j]
            d = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2 * (sub @ c.T)
                + (c * c).sum(axis=1)
            )
            out[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return df.select(
        F.col(id_col).alias("id"), encode(F.col(vec_col)).alias("codes")
    )


def _adc_scores(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
):
    """Shared ADC scoring stage: per-query lookup tables (built on the
    driver from the bounded query set), then one Arrow pass over the
    codes emitting (id, q_idx, adc_dist). Returns (scored_df, qids)."""
    m, k, dsub = codebooks.shape
    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()  # bounded query set by contract (same as cosine_topk)
    # pin the contract: the LUT build and the probe-pair collect are
    # O(|queries|) driver state — fail loudly if a caller hands the
    # corpus as the query set instead of silently OOMing the driver.
    # A runtime contract, not a debug assert: must survive `python -O`.
    if len(q_rows) > 100_000:
        raise ValueError(
            f"PQ query set has {len(q_rows)} rows — the ADC LUT stage is "
            "driver-built and contracted to bounded query sets (≤100k)"
        )
    luts = []
    qids = []
    for r in q_rows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        lut = np.empty((m, k))
        for j in range(m):
            sub = qv[j * dsub : (j + 1) * dsub]
            diff = codebooks[j] - sub
            lut[j] = (diff * diff).sum(axis=1)
        luts.append(lut)
        qids.append(int(r["qid"]))
    luts_arr = np.stack(luts)  # (nq, m, k)
    nq = len(qids)

    @pandas_udf(ArrayType(DoubleType()))
    def adc(code_col: pd.Series) -> pd.Series:
        C = np.stack([np.asarray(c, dtype=np.int64) for c in code_col])
        dists = np.zeros((len(C), nq))
        for j in range(m):
            # luts_arr[:, j, C[:, j]] -> (nq, n); accumulate transposed
            dists += luts_arr[:, j, C[:, j]].T
        return pd.Series(list(dists))

    scored = codes.select(
        "id", F.posexplode(adc(F.col("codes"))).alias("q_idx", "adc_dist")
    )
    return scored, qids


def _topk_per_query(scored: DataFrame, qids: list[int], topk: int) -> DataFrame:
    from pyspark.sql import Window

    qmap = F.array(*[F.lit(q) for q in qids])
    w = Window.partitionBy("q_idx").orderBy(F.asc("adc_dist"), F.asc("id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select(
            F.element_at(qmap, F.col("q_idx") + 1).alias("qid"),
            F.col("id").alias("neighbor_id"),
            F.round("adc_dist", 6).alias("adc_dist"),
            F.col("rn").cast("long").alias("rank"),
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate L2 top-k per query from CODES ALONE (asymmetric
    distance: exact query subvector vs quantized database subvector,
    summed from per-subspace lookup tables)."""
    scored, qids = _adc_scores(codes, codebooks, queries, id_col, vec_col)
    return _topk_per_query(scored, qids, topk)


def ann_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    n_cells: int = 8,
    nprobe: int = 3,
    m: int = 16,
    k_code: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ composition — the production ANN shape: the coarse
    quantizer PRUNES (each query probes ``nprobe`` cells), the PQ codes
    SCORE the survivors from memory-resident bytes (ADC), and raw
    vectors are never touched at query time.

    One metric end to end (the FAISS IVF-PQ convention): the coarse
    quantizer is trained and probed under L2 on RAW vectors, matching
    the L2 ADC ranking — a cosine coarse stage over normalized vectors
    would systematically prune true L2 neighbors whenever corpus norms
    are heterogeneous (round-4 advice; recall on varying-norm vectors
    is pytest-pinned in tests/test_pq.py).

    Scale: cell assignment and code scoring are the existing bounded
    passes; the only new piece is the (query, cell) probe list — an
    n_queries × nprobe broadcast — semi-joined against the scored rows
    BEFORE the per-query top-k window, so the window input is the
    probed fraction of the corpus, not all of it."""
    from market_data_pipeline_databricks_spark.operators.similarity import (
        assign_ivf_cells,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(
        corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col, metric="l2"
    )
    celled = assign_ivf_cells(
        corpus, cents, vec_col=vec_col, nprobe=1, out_col="cells", metric="l2"
    ).select(
        F.col(id_col).alias("cid"), F.element_at("cells", 1).alias("cell")
    )
    books = pq_train(corpus, m=m, k=k_code, id_col=id_col, vec_col=vec_col)
    codes = (
        pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
        .join(celled, F.col("id") == F.col("cid"))
        .select("id", "codes", "cell")
    )
    scored, qids = _adc_scores(
        codes.select("id", "codes"), books, queries, id_col, vec_col
    )
    # (q_idx, cell) probe pairs from the bounded query set
    q_pos = {q: i for i, q in enumerate(qids)}
    probe_rows = assign_ivf_cells(
        queries, cents, vec_col=vec_col, nprobe=nprobe, out_col="cells",
        metric="l2",
    ).select(F.col(id_col).alias("qid"), "cells").collect()
    probes = [
        (q_pos[int(r["qid"])], int(c))
        for r in probe_rows
        for c in r["cells"]
    ]
    spark = corpus.sparkSession
    probes_df = spark.createDataFrame(probes, "q_idx int, cell int")
    pruned = scored.join(
        codes.select(F.col("id"), "cell"), "id"
    ).join(F.broadcast(probes_df), ["q_idx", "cell"], "left_semi")
    return _topk_per_query(pruned, qids, topk)
