"""Similarity search over embedding columns (array<float>).

Two paths, both shuffle-disciplined:

- **brute-force cosine top-k** — the exactness baseline: query set ×
  corpus equi-free join, dot products as built-in higher-order
  functions (``zip_with`` + ``aggregate``: sequential double fold, so
  results are bit-reproducible across engines), top-k per query via
  ROW_NUMBER window. Scale shape: broadcast the (small) query set,
  stream the corpus — no corpus shuffle at any size; per-partition
  cost is |queries| × dim per row.
- **LSH-bucketed ANN** — the 100 TB path: random-hyperplane signature
  buckets (deterministic seeded planes), candidates only within the
  same bucket (+ optional multi-probe by flipping one bit), exact
  re-rank of candidates. Recall/cost tradeoff via n_planes.

- **IVF ANN** — k-means coarse quantizer trained on a driver sample,
  distributed cell assignment via Arrow-batched pandas UDF, probe
  ``nprobe`` cells per query, exact re-rank within. Same
  candidate-generation seam as LSH with a tunable recall knob.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double fold — deterministic bits."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two non-zero vectors. CONTRACT: inputs must
    have non-zero norm — a zero vector has no defined direction, and
    under ANSI mode the division raises DIVIDE_BY_ZERO rather than
    silently returning NaN. The embeddings source guarantees non-zero
    vectors; screen any external corpus with ``norm(v) > 0`` first.
    Left unguarded deliberately so the DuckDB oracle twins (which
    divide identically) stay bit-for-bit equivalent."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, cosine_sim, rank); self-matches
    excluded; rank ties broken by neighbor id (deterministic).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )


def random_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit_i = 1 iff dot(vec, plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(
            dot(vec, p) > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact re-rank within the query's LSH bucket.

    2^n_planes buckets; corpus is hashed once (one narrow projection),
    candidates come from an equi-join on bucket — at 100 TB this is a
    shuffle on a small int key instead of a cross join.
    """
    first = corpus.select(vec_col).first()
    dim = len(first[0])
    planes = random_planes(dim, n_planes, seed)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cvec")
    ).withColumn("bucket", lsh_bucket(F.col("cvec"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("bucket", lsh_bucket(F.col("qvec"), planes))

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )


def cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos ≥ threshold),
    LSH-bucketed: high-cosine pairs almost surely share a sign bucket
    (each plane splits them with probability θ/π ≈ 0.1 at cos=0.95)."""
    first = df.select(vec_col).first()
    dim = len(first[0])
    planes = random_planes(dim, n_planes, seed)
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("bucket", lsh_bucket(F.col("vec"), planes))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_near_duplicates_multitable(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 3,
    n_tables: int = 24,
    seed: int = 42,
) -> DataFrame:
    """Multi-table sign-LSH candidates + EXACT cosine verification.

    Standard multi-probe structure: ``n_tables`` independent
    hyperplane sets; a pair is a candidate if it shares a bucket in ANY
    table (recall 1 − (1 − p₁ⁿ)ᵀ with p₁ = 1 − θ/π), and every
    candidate is then verified with the exact cosine, so precision is
    1 by construction — the output differs from the brute-force form
    only on banding misses.

    Recall economics are threshold-dependent and worth stating
    honestly: at production near-dup thresholds (cos ≥ 0.9, p₁ ≈ 0.86)
    a few tables of 8+ planes give recall ≈ 1 while pruning candidate
    volume by the bucket count. At thresholds near the bulk of the
    pair-similarity distribution (like this testdata's 0.45, where
    p₁ ≈ 0.65) NO hyperplane scheme prunes much — the LSH exponent
    ρ → 1 — so the defaults here are sized for recall on that regime
    (3 planes × 24 tables → per-pair miss < 5e-4 at cos 0.45), and the
    value of the structure is that bucket joins replace the all-pairs
    cross join, which is the part that cannot ship at 100 TB.
    """
    first = df.select(vec_col).first()
    dim = len(first[0])
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )
    # One projection computes every table's bucket; the banded stream
    # carries only (id, table, bucket) through the explode + self-join
    # (same narrowing discipline as MinHash banding in operators/dedup).
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                lsh_bucket(
                    F.col("vec"), random_planes(dim, n_planes, seed + t)
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    banded = v.select("id", F.explode(buckets).alias("b")).select(
        "id", F.col("b.table_id").alias("table_id"), F.col("b.bucket").alias("bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = v.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    vb = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def brute_force_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-dups — the oracle-checkable baseline
    (O(n²); for corpora small enough to verify against)."""
    v = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 20000,
    iters: int = 10,
    seed: int = 42,
    metric: str = "cosine",
) -> np.ndarray:
    """K-means coarse quantizer on a deterministic driver-side sample —
    spherical (cosine) by default, or plain L2 Lloyd's with
    ``metric="l2"`` (unnormalized vectors, mean centroids: the FAISS
    IVF convention — one metric must serve BOTH the coarse prune and
    the fine ranking, so IVF-PQ's L2 ADC pairs with L2 cells).

    IVF training is centralized by design everywhere (FAISS trains the
    coarse quantizer on a sample too) — at 100 TB you still sample
    O(100k) vectors to the driver; only *assignment* must distribute.
    Sample is ordered by id → reproducible across runs/partitionings.
    """
    rows = (
        df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy("id")
        .limit(sample_size)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    if metric == "cosine":
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)].copy()
    for _ in range(iters):
        if metric == "cosine":
            assign = np.argmax(X @ cent.T, axis=1)
        else:
            assign = np.argmax(
                X @ cent.T - 0.5 * (cent * cent).sum(axis=1), axis=1
            )
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                if metric == "cosine":
                    cent[c] = m / max(np.linalg.norm(m), 1e-12)
                else:
                    cent[c] = m / len(members)
    return cent


def assign_ivf_cells(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_col: str = "cells",
    metric: str = "cosine",
) -> DataFrame:
    """Attach the ``nprobe`` nearest centroid ids as an array column —
    by cosine on normalized vectors (default) or by L2 on raw vectors
    (``metric="l2"``; the argsort key x·c − ½‖c‖² orders identically
    to −‖x−c‖², the ‖x‖² term being constant per row). The metric
    MUST match the one the centroids were trained under.

    Arrow-batched pandas UDF: one matrix multiply per batch (the
    vectorized scale path — per-row Python would be 100× slower).
    Centroids ride along as a closure broadcast (KBs).
    """
    cent = np.asarray(centroids, dtype=np.float64)

    @pandas_udf(ArrayType(IntegerType()))
    def cells(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        if metric == "cosine":
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            sims = X @ cent.T
        else:
            sims = X @ cent.T - 0.5 * (cent * cent).sum(axis=1)
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return df.withColumn(out_col, cells(F.col(vec_col)))


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF top-k: corpus vectors live in their 1 nearest cell; queries
    probe their ``nprobe`` nearest cells and re-rank exactly within.

    Scale: candidate generation is an equi-join on a small int cell id
    (shuffle ∝ corpus + nprobe×queries, not corpus×queries); recall is
    tunable via nprobe — cross-validated against brute force in tests.
    """
    cent = train_ivf_centroids(
        corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col, seed=seed
    )
    c = assign_ivf_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("cvec"),
        ),
        cent,
        vec_col="cvec",
        nprobe=1,
    ).select("neighbor_id", "cvec", F.col("cells")[0].alias("cell"))
    q = assign_ivf_cells(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
        ),
        cent,
        vec_col="qvec",
        nprobe=nprobe,
    ).select("query_id", "qvec", F.explode("cells").alias("cell"))

    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def label_centroid_components(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Per-(label, dimension) centroid components → (label, dim,
    centroid, n_vecs), dim 0-based.

    posexplode fans each vector into dim (pos, val) rows — a constant
    dim× blowup that stays linear in corpus size — then one shuffle on
    the (label, dim) pair with full map-side partial aggregation.
    Component means run through a DECIMAL(27,12)-exact sum (addition is
    associative, so the mean is bit-identical on any partitioning and
    any engine — the repo-wide cross-engine discipline) and are rounded
    to ``round_dp`` decimals so downstream dot products fold identical
    bits everywhere. A raw double AVG would be accumulation-order
    dependent, and ROUND cannot mask an ulp that sits on a rounding
    boundary.
    """
    d = df.select(
        F.col(label_col).alias("label"), F.posexplode(vec_col).alias("dim", "val")
    )
    n = F.count(F.lit(1))
    exact_sum = F.sum(
        F.col("val").cast("double").cast("decimal(27,12)")
    ).cast("double")
    return d.groupBy("label", "dim").agg(
        F.round(exact_sum / n, round_dp).alias("centroid"),
        F.count(F.lit(1)).alias("n_vecs"),
    ).select(
        "label", F.col("dim").cast("long").alias("dim"), "centroid", "n_vecs"
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid as an assembled array<double> → (label,
    centroid, n_vecs). Second aggregation is |labels| × dim rows
    regardless of corpus size — negligible."""
    comp = label_centroid_components(df, label_col=label_col, vec_col=vec_col)
    return (
        comp.groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "centroid"))).alias("pairs"),
            F.max("n_vecs").alias("n_vecs"),
        )
        .select(
            "label",
            F.transform("pairs", lambda p: p["centroid"]).alias("centroid"),
            "n_vecs",
        )
    )


def label_noise_screen(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Label-noise screen: cosine of every vector against its own
    label's centroid vs the best other-label centroid; rows where the
    other label wins (on round-6 cosines, both engines) are mislabel
    suspects — confident-learning-style screening reduced to Column
    algebra.

    Scale shape: the centroid set is |labels| rows, packed into ONE
    broadcast row of (label, centroid) structs; the corpus never
    shuffles and the comparison is a zero-shuffle per-row array fold —
    |labels| × dim multiply-adds per vector, pipelined with the scan.
    """
    cents = label_centroids(df, label_col=label_col, vec_col=vec_col)
    packed = cents.agg(
        F.collect_list(F.struct("label", "centroid")).alias("__cents__")
    )
    e = df.select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        _as_double(F.col(vec_col)).alias("__v__"),
    )
    sims = e.crossJoin(F.broadcast(packed)).select(
        id_col,
        "label",
        F.transform(
            "__cents__",
            lambda s: F.struct(
                s["label"].alias("c_label"),
                F.round(cosine(F.col("__v__"), s["centroid"]), 6).alias("cos"),
            ),
        ).alias("__sims__"),
    )
    own = F.element_at(
        F.filter("__sims__", lambda s: s["c_label"] == F.col("label")), 1
    )["cos"]
    other = F.array_max(
        F.transform(
            F.filter("__sims__", lambda s: s["c_label"] != F.col("label")),
            lambda s: s["cos"],
        )
    )
    # Single-label corpora have no other-label centroid: best_other_cos
    # is NULL (documented — "no competing label existed"), and is_suspect
    # coalesces to false so a three-valued NULL can't silently drop rows
    # from `is_suspect = false` consumers (round-3 advice).
    return sims.select(
        id_col,
        "label",
        own.alias("own_cos"),
        other.alias("best_other_cos"),
        F.coalesce(other > own, F.lit(False)).alias("is_suspect"),
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray, list[float]]:
    """Fully DISTRIBUTED Lloyd's k-means over the whole corpus — the
    complement of train_ivf_centroids (which samples to the driver,
    FAISS-style). Here only the k×dim centroid matrix ever sits on the
    driver; both halves of every iteration are corpus-scale Spark jobs:

    - E-step: Arrow-batched pandas UDF assigns each vector to its
      nearest centroid (one matrix multiply per batch; centroids ride
      along as a closure broadcast of KBs).
    - M-step: posexplode → (cluster, dim) partial-aggregated sums — a
      single shuffle whose reduce side is k×dim rows, independent of
      corpus size — collected and normalized on the driver.

    Initialization is deterministic (the k lowest-id vectors), so
    results are reproducible across runs and partitionings. Returns
    (assignments DataFrame [id, cluster, sq_dist], final centroids,
    per-iteration inertia) — inertia is monotonically non-increasing,
    which the tests assert.

    Scale note: ``iters`` Spark jobs re-scan the input; callers persist
    ``df`` (the queries() wrapper does) so iterations hit cached
    vectors, the standard MLlib-style loop shape.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    init = (
        df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    cent = np.array([r["v"] for r in init], dtype=np.float64)
    inertia: list[float] = []

    def assigner(c: np.ndarray):
        sq = (c * c).sum(axis=1)

        @pandas_udf(
            StructType(
                [
                    StructField("cluster", IntegerType()),
                    StructField("sq_dist", DoubleType()),
                ]
            )
        )
        def assign(vecs: pd.Series) -> pd.DataFrame:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d = (X * X).sum(axis=1, keepdims=True) - 2 * (X @ c.T) + sq
            best = np.argmin(d, axis=1)
            return pd.DataFrame(
                {
                    "cluster": best.astype("int32"),
                    "sq_dist": np.maximum(d[np.arange(len(X)), best], 0.0),
                }
            )

        return assign

    for _ in range(iters):
        assigned = df.select(
            F.col(id_col).alias("id"),
            _as_double(F.col(vec_col)).alias("v"),
            assigner(cent)(F.col(vec_col)).alias("a"),
        ).select("id", "v", F.col("a.cluster").alias("cluster"), F.col("a.sq_dist").alias("sq_dist"))
        stats = (
            assigned.select(
                "cluster", "sq_dist", F.posexplode("v").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(
                # decimal-exact sums: the M-step is order-independent
                # bit-for-bit, so the whole loop is deterministic
                # across partitionings and runs
                F.sum(F.col("val").cast("decimal(38,12)"))
                .cast("double")
                .alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("sq_dist").cast("decimal(38,12)"))
                .cast("double")
                .alias("sd"),
            )
            .collect()
        )
        n_per = {}
        sums = np.zeros_like(cent)
        total_sd = 0.0
        for r in stats:
            sums[r["cluster"], r["dim"]] = r["s"]
            n_per[r["cluster"]] = r["n"]
            if r["dim"] == 0:
                total_sd += r["sd"]
        inertia.append(total_sd)
        for c in range(len(cent)):
            if n_per.get(c):
                cent[c] = sums[c] / n_per[c]
    final = df.select(
        F.col(id_col).alias("id"),
        assigner(cent)(F.col(vec_col)).alias("a"),
    ).select(
        "id",
        F.col("a.cluster").cast("long").alias("cluster"),
        F.col("a.sq_dist").alias("sq_dist"),
    )
    return final, cent, inertia
