"""Entity resolution: blocked fuzzy matching + transitive identity.

The missing record-linkage family beside document dedup: documents
dedup on CONTENT similarity (shingles/minhash), entity resolution
links RECORDS of the same real-world entity across noisy attribute
variants — the master-data step every warehouse runs before joining
"customers" from two source systems.

Substrate: the supplier table, with two deterministic dirty variants
per supplier (the classic ER benchmark construction — corrupt a clean
registry, then measure recovery):

- record 2k:   name lowercased, balance as recorded
- record 2k+1: one letter dropped from the name at a key-dependent
  position (inside the constant word, never the digits — TPC-H names
  differ only in digits, so digit corruption would alias DIFFERENT
  suppliers a single edit apart), balance off by 0.01

Match rule (conjunctive, the Fellegi-Sunter deterministic special
case): same nation, name Levenshtein <= 2, |balance gap| <= 0.02.

Scale shape — the part that must survive 100 TB:
- Blocking is an EQUI-JOIN on (nationkey, balance band): each record's
  balance is banded at the match tolerance on exact integer cents
  (band = floor((bal*100 as cents) / 2))
  and the probe side explodes to {band-1, band, band+1}, so every
  within-tolerance pair co-locates in exactly one band probe — the
  same banded-range-join trick as join_range_binned_volatility. No
  cross join anywhere; per-block candidate volume is bounded by block
  occupancy, and the blocking key can be refined (band width, extra
  attributes) without touching the shape.
- Levenshtein runs JVM-side (built-in expression) only on blocked
  candidates.
- Identity closure reuses the large-star/small-star contraction
  (operators/dedup.connected_components, O(log n) rounds) — ER merges
  are transitive by definition (A~B, B~C => same entity), which
  pairwise output alone cannot express.

Balance arithmetic is DECIMAL(12,2) end to end so the tolerance
comparison folds identical bits on both engines (repo decimal
discipline); the oracle replays the closure with a recursive CTE
(same pattern as dedup_representative_survivors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dirty_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rec_id, name, nationkey, bal DECIMAL(12,2), band) — two noisy
    variants per supplier, deterministic on both engines."""
    s = _t(spark, sf_dir, "supplier")
    base = s.select(
        F.col("s_suppkey").alias("suppkey"),
        F.lower("s_name").alias("clean_name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").cast("decimal(12,2)").alias("clean_bal"),
    )
    pos = (F.lit(4) + F.col("suppkey") % 5).cast("int")
    dropped = F.concat(
        F.substring(F.col("clean_name"), F.lit(1), pos - 1),
        F.substring(
            F.col("clean_name"), pos + 1, F.length("clean_name")
        ),
    )
    v1 = base.select(
        (F.col("suppkey") * 2).alias("rec_id"),
        F.col("clean_name").alias("name"),
        "nationkey",
        F.col("clean_bal").alias("bal"),
    )
    v2 = base.select(
        (F.col("suppkey") * 2 + 1).alias("rec_id"),
        dropped.alias("name"),
        "nationkey",
        (F.col("clean_bal") + F.lit(0.01).cast("decimal(12,2)"))
        .cast("decimal(12,2)")
        .alias("bal"),
    )
    recs = v1.unionByName(v2)
    # Band on EXACT integer cents (decimal(12,2)·100 is exact in the
    # decimal domain): band = floor(cents / 2). Banding through DOUBLE
    # put some exactly-within-tolerance pairs (gap = 0.02) two bands
    # apart (e.g. -655.32 vs -655.30), silently dropping them from the
    # ±1-band probe; integer cents make the blocking guarantee exact:
    # |cents_a - cents_b| ≤ 2 ⇒ |band_a - band_b| ≤ 1.
    cents = (F.col("bal") * 100).cast("long")
    return recs.withColumn(
        "band", F.floor(cents / 2).cast("long")
    )


def er_blocked_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs surviving the full match rule: (rec_id_a,
    rec_id_b, name_lev, bal_gap). One equi-join on the composite
    (nationkey, band) blocking key; the 3-band probe explode makes the
    numeric tolerance exact across band edges."""
    recs = _dirty_records(spark, sf_dir)
    probe = recs.select(
        F.col("rec_id").alias("rec_id_a"),
        F.col("name").alias("name_a"),
        F.col("nationkey").alias("nk_a"),
        F.col("bal").alias("bal_a"),
        F.explode(
            F.array(
                F.col("band") - 1, F.col("band"), F.col("band") + 1
            )
        ).alias("probe_band"),
    )
    build = recs.select(
        F.col("rec_id").alias("rec_id_b"),
        F.col("name").alias("name_b"),
        F.col("nationkey").alias("nk_b"),
        F.col("bal").alias("bal_b"),
        F.col("band").alias("band_b"),
    )
    pairs = probe.join(
        build,
        (F.col("nk_a") == F.col("nk_b"))
        & (F.col("probe_band") == F.col("band_b"))
        & (F.col("rec_id_a") < F.col("rec_id_b")),
    )
    lev = F.levenshtein("name_a", "name_b")
    gap = F.abs(F.col("bal_a") - F.col("bal_b"))
    return pairs.filter(
        (lev <= 2) & (gap <= F.lit(0.02).cast("decimal(12,2)"))
    ).select(
        "rec_id_a",
        "rec_id_b",
        lev.cast("long").alias("name_lev"),
        gap.cast("double").alias("bal_gap"),
    )


def er_resolved_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every dirty record with its resolved entity id (= min rec_id of
    its transitive match component; unmatched records resolve to
    themselves) plus the entity's member count — the master-data
    output an MDM pipeline persists. Match graph -> large-star/
    small-star contraction -> left join back to the full record set."""
    from market_data_pipeline_databricks_spark.operators.dedup import (
        connected_components,
    )

    recs = _dirty_records(spark, sf_dir)
    pairs = er_blocked_match_pairs(spark, sf_dir).select(
        F.col("rec_id_a").alias("id_a"), F.col("rec_id_b").alias("id_b")
    )
    comp = connected_components(pairs)
    resolved = (
        recs.select("rec_id", "nationkey")
        .join(comp.withColumnRenamed("node", "rec_id"), "rec_id", "left")
        .select(
            "rec_id",
            "nationkey",
            F.coalesce("component", "rec_id").alias("entity_id"),
        )
    )
    sizes = resolved.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return resolved.join(sizes, "entity_id").select(
        "rec_id", "nationkey", "entity_id", "n_members"
    )


QUERIES = {
    "er_blocked_match_pairs": er_blocked_match_pairs,
    "er_resolved_entities": er_resolved_entities,
}

_RECS_CTE = """
WITH base AS (
  SELECT s_suppkey AS suppkey,
         lower(s_name) AS clean_name,
         s_nationkey AS nationkey,
         CAST(s_acctbal AS DECIMAL(12,2)) AS clean_bal,
         CAST(4 + s_suppkey % 5 AS INT) AS pos
  FROM supplier
),
recs AS (
  SELECT suppkey * 2 AS rec_id, clean_name AS name, nationkey,
         clean_bal AS bal
  FROM base
  UNION ALL
  SELECT suppkey * 2 + 1,
         concat(substring(clean_name, 1, pos - 1),
                substring(clean_name, pos + 1, length(clean_name))),
         nationkey,
         CAST(clean_bal + CAST(0.01 AS DECIMAL(12,2)) AS DECIMAL(12,2))
  FROM base
),
banded AS (
  SELECT *, CAST(FLOOR(CAST(bal * 100 AS BIGINT) / 2) AS BIGINT) AS band
  FROM recs
),
pairs AS (
  SELECT a.rec_id AS rec_id_a, b.rec_id AS rec_id_b,
         CAST(levenshtein(a.name, b.name) AS BIGINT) AS name_lev,
         CAST(ABS(a.bal - b.bal) AS DOUBLE) AS bal_gap
  FROM (SELECT r.*, r.band + d.d AS probe_band
        FROM banded r, (SELECT UNNEST([-1, 0, 1]) AS d) d) a
  JOIN banded b
    ON a.nationkey = b.nationkey
   AND a.probe_band = b.band
   AND a.rec_id < b.rec_id
  WHERE levenshtein(a.name, b.name) <= 2
    AND ABS(a.bal - b.bal) <= CAST(0.02 AS DECIMAL(12,2))
)
"""

ORACLE_SQL = {
    "er_blocked_match_pairs": _RECS_CTE
    + "SELECT rec_id_a, rec_id_b, name_lev, bal_gap FROM pairs",
    "er_resolved_entities": _RECS_CTE.replace("WITH base", "WITH RECURSIVE base", 1)
    + """,
    sym AS (SELECT rec_id_a AS u, rec_id_b AS v FROM pairs
            UNION SELECT rec_id_b, rec_id_a FROM pairs),
    reach AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    ),
    comp AS (
      SELECT u AS rec_id, LEAST(u, MIN(v)) AS component
      FROM reach GROUP BY u
    ),
    resolved AS (
      SELECT r.rec_id, r.nationkey,
             COALESCE(c.component, r.rec_id) AS entity_id
      FROM recs r LEFT JOIN comp c ON r.rec_id = c.rec_id
    ),
    sizes AS (
      SELECT entity_id, COUNT(*) AS n_members
      FROM resolved GROUP BY entity_id
    )
    SELECT r.rec_id, r.nationkey, r.entity_id, s.n_members
    FROM resolved r JOIN sizes s ON r.entity_id = s.entity_id
    """,
}
