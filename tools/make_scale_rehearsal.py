"""Synthesize an sf1.0 rehearsal corpus (10x sf0.1) for the heavy-path
scale checks recorded in BASELINE.md ("Round 5: sf1.0 rehearsal").

Usage: python tools/make_scale_rehearsal.py [src_sf_dir] [out_dir]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf1.0)

Design: naive 10x concatenation would make every document/vector an
exact duplicate of 9 others, turning near-dup workloads quadratic in
the copy count — a pathological corpus that measures the artifact, not
the scaling. Instead each copy is transformed so WITHIN-copy
similarity structure is preserved exactly while ACROSS-copy similarity
collapses:

- documents: every token of >= 4 chars gets a copy-unique suffix
  (`c<k>`). Shingle structure is isomorphic within a copy (identical
  near-dup density), the 10 content vocabularies are disjoint
  (cross-copy Jaccard ~ 0), and the short stopwords that drive lang-ID
  and quality scoring pass through unchanged so the curation screens
  keep their sf0.1 pass rates.
- embeddings: per-copy dimension permutation (i -> i*(2k+3) mod 64,
  odd multiplier = bijection) composed with a per-copy pseudo-random
  sign-flip pattern. Both are orthogonal transforms: within-copy
  cosines are preserved EXACTLY; cross-copy cosines collapse to the
  random-tail distribution. (At a low pair threshold like 0.4 the
  random tail itself yields pair counts ~ n^2/buckets — that is a
  property of thresholded similarity on any honestly-grown corpus, not
  of this synthesis; see the BASELINE.md analysis.)
- supplier: re-keyed by copy offset, names suffixed with 5 copy-unique
  chars (keeps ER matches strictly within-copy at lev <= 2)
- orders/lineitem: o_orderkey/l_orderkey re-keyed by copy offset
  (facts grow 10x over the same dimension tables — the realistic
  shape); other tables pass through.

Deterministic end to end — no RNG, so the corpus is reproducible.
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.session import get_spark

COPIES = 10


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    spark = get_spark(app_name="make_scale_rehearsal")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    big = None
    for k in range(COPIES):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
            F.regexp_replace("text", r"(\S{4,})", r"$1c%d" % k).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        big = c if big is None else big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n_emb = emb.agg(F.max("vec_id")).first()[0] + 1

    def make_gather(mult: int, mask: int):
        def gather(i):
            x = F.element_at(F.col("embedding"), (i * mult) % 64 + 1)
            return F.when(
                ((i * 1103 + 7).bitwiseAND(F.lit(mask))) != 0, -x
            ).otherwise(x)

        return gather

    big = None
    for k in range(COPIES):
        c = emb.select(
            (F.col("vec_id") + F.lit(k * n_emb)).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                make_gather(2 * k + 3, 1 << k),
            ).alias("embedding"),
            "label",
        )
        big = c if big is None else big.unionByName(c)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    orders = spark.read.parquet(f"{src}/orders.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    big_o, big_l = orders, li
    for k in range(1, COPIES):
        big_o = big_o.unionByName(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * n_ord)
            )
        )
        big_l = big_l.unionByName(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(k * n_ord)
            )
        )
    big_o.repartition(32).write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    big_l.repartition(32).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )

    # supplier grows 10x for the ER rehearsal: suppkey re-keyed by copy
    # offset; each copy's names get a 5-char copy-unique suffix so
    # cross-copy name pairs sit Levenshtein-5 apart (the ER match rule
    # is lev <= 2, so matches stay strictly within-copy and the true
    # match density per copy is preserved exactly); balances pass
    # through (equal cross-copy balances are blocked by the name term
    # of the conjunctive rule).
    sup = spark.read.parquet(f"{src}/supplier.parquet")
    n_sup = sup.agg(F.max("s_suppkey")).first()[0] + 1
    big_s = None
    for k in range(COPIES):
        c = sup.withColumn(
            "s_suppkey", F.col("s_suppkey") + F.lit(k * n_sup)
        ).withColumn("s_name", F.concat("s_name", F.lit(str(k) * 5)))
        big_s = c if big_s is None else big_s.unionByName(c)
    big_s.repartition(8).write.mode("overwrite").parquet(
        f"{out}/supplier.parquet"
    )

    for t in ("region", "nation", "customer", "part", "events"):
        dst = f"{out}/{t}.parquet"
        if os.path.exists(dst):
            (shutil.rmtree if os.path.isdir(dst) else os.remove)(dst)
        shutil.copy(f"{src}/{t}.parquet", dst)
    print(f"rehearsal corpus written to {out}")


if __name__ == "__main__":
    main()
