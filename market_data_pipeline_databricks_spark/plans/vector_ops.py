"""Similarity-search queries over the ``embeddings`` table.

Cosine math on both engines is a sequential left-to-right double fold
(Spark ``aggregate``/``zip_with``; DuckDB ``list_dot_product`` on
DOUBLE[] — verified bit-identical), mirrored expression order:
dot(q,c) / (sqrt(dot(q,q)) * sqrt(dot(c,c))). LSH variants use seeded
random hyperplanes with no SQL twin → rows-only checks, recall
cross-validated against the brute-force baseline in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators import similarity as SIM


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries_subset(df: DataFrame) -> DataFrame:
    # Every 40th vector is a query — small fixed query set at any sf.
    return df.filter(F.col("vec_id") % 40 == 0)


def vector_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 per query vector (the ANN
    correctness baseline)."""
    emb = _emb(spark, sf_dir)
    return SIM.cosine_topk(emb, _queries_subset(emb), k=10)


def vector_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs embedding near-dups at cosine ≥ 0.4 (the corpus
    max pairwise cosine is ~0.51, so this returns the true tail)."""
    return SIM.brute_force_near_duplicates(_emb(spark, sf_dir), threshold=0.4)


def vector_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 (random-hyperplane signatures,
    8 planes). Rows-only driver check; recall vs brute force is
    asserted in tests/test_similarity.py."""
    emb = _emb(spark, sf_dir)
    return SIM.ann_topk_lsh(emb, _queries_subset(emb), k=10, n_planes=6)


def vector_ann_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs (cosine ≥ 0.4 within sign buckets).
    Rows-only driver check."""
    return SIM.cosine_near_duplicates(
        _emb(spark, sf_dir), threshold=0.4, n_planes=4
    )


QUERIES = {
    "vector_cosine_topk": vector_cosine_topk,
    "vector_near_dup_pairs": vector_near_dup_pairs,
    "vector_ann_lsh_topk": vector_ann_lsh_topk,
    "vector_ann_near_dup_lsh": vector_ann_near_dup_lsh,
}

_V = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
)
"""

ORACLE_SQL = {
    "vector_cosine_topk": _V + """,
        q AS (SELECT * FROM v WHERE vec_id % 40 = 0),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ROUND(list_dot_product(q.vec, c.vec)
                       / (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(c.vec, c.vec))), 6) AS cosine_sim
          FROM q JOIN v c ON q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= 10
    """,
    "vector_near_dup_pairs": _V + """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_dot_product(a.vec, b.vec)
                     / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine_sim
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE ROUND(list_dot_product(a.vec, b.vec)
              / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6) >= 0.4
    """,
}
