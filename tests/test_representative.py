"""Representative-survivor selection: per cluster the kept doc has
maximum degree (ties to min id), exactly one survivor per cluster, and
singletons pass through — verified against a Python re-derivation from
the same pair list."""

from __future__ import annotations

from collections import Counter, defaultdict

from market_data_pipeline_databricks_spark.operators import dedup as DD
from market_data_pipeline_databricks_spark.plans import text_ops as TXO

from tests.conftest import SF_ORACLE


def test_representative_is_max_degree_min_id(spark):
    docs = TXO._docs(spark, SF_ORACLE)
    pairs = [
        (r.id_a, r.id_b)
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.35).collect()
    ]
    assert pairs, "premise: the corpus has near-dup clusters"
    # python re-derivation: union-find components + degree
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    clusters = defaultdict(set)
    for n in parent:
        clusters[find(n)].add(n)
    want_removed = set()
    for members in clusters.values():
        rep = min(members, key=lambda n: (-deg[n], n))
        want_removed |= members - {rep}

    survivors = {
        r.doc_id
        for r in TXO.dedup_representative_survivors(
            spark, SF_ORACLE
        ).collect()
    }
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert survivors == all_ids - want_removed
    # the rule genuinely differs from min-id survivorship somewhere
    minid_removed = {
        n for ms in clusters.values() for n in ms if n != min(ms)
    }
    if any(
        min(ms, key=lambda n: (-deg[n], n)) != min(ms)
        for ms in clusters.values()
    ):
        assert want_removed != minid_removed
