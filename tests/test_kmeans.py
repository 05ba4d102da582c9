"""Distributed Lloyd's k-means: semantic properties no oracle covers
(iterative op, rows-only driver check).
"""

from __future__ import annotations

import numpy as np

from market_data_pipeline_databricks_spark.operators import similarity as SIM
from market_data_pipeline_databricks_spark.plans import vector_ops

SF = "/root/testdata/sf0.001"


def test_kmeans_inertia_monotone_and_assignment_consistent(spark):
    emb = vector_ops._emb(spark, SF).persist()
    assigned, cent, inertia = SIM.kmeans_lloyd(emb, k=8, iters=5)
    # Lloyd's iterations never increase inertia
    assert all(
        b <= a + 1e-6 for a, b in zip(inertia, inertia[1:])
    ), inertia
    # every vector sits with its nearest final centroid, and sq_dist
    # is the true squared distance to it
    rows = assigned.collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    for r in rows[:200]:
        x = vecs[r["id"]]
        d = ((cent - x) ** 2).sum(axis=1)
        assert r["cluster"] == int(np.argmin(d))
        assert abs(r["sq_dist"] - d[r["cluster"]]) < 1e-6
    emb.unpersist()


def test_kmeans_partitioning_invariance(spark):
    emb = vector_ops._emb(spark, SF)
    a, _, ia = SIM.kmeans_lloyd(emb.repartition(3).persist(), k=4, iters=3)
    b, _, ib = SIM.kmeans_lloyd(emb.repartition(17).persist(), k=4, iters=3)
    assert ia == ib  # decimal-exact M-step: bit-identical inertia
    ra = {r["id"]: (r["cluster"], round(r["sq_dist"], 9)) for r in a.collect()}
    rb = {r["id"]: (r["cluster"], round(r["sq_dist"], 9)) for r in b.collect()}
    assert ra == rb


def test_kmeans_clusters_query_shape(spark):
    out = vector_ops.vector_kmeans_clusters(spark, SF).toPandas()
    n = vector_ops._emb(spark, SF).count()
    assert out["n_vecs"].sum() == n
    assert len(out) <= 8
    assert (out["mean_sq_dist"] >= 0).all()


# -------------------------------------------------- image resize kernel


def test_nearest_neighbor_resize_closed_form(spark):
    """Crafted 4x2 PPM resized to 2x2: nearest-neighbor must pick
    pixels (0,0),(0,2),(1,0),(1,2) — verified against hand arithmetic."""
    import numpy as np

    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    # pixel (x, y) value = y*4 + x (gray)
    px = bytes(
        b for y in range(2) for x in range(4) for b in (y * 4 + x,) * 3
    )
    ppm = b"P6\n4 2\n255\n" + px
    img = MM.decode_ppm(ppm)
    rows = (np.arange(2) * 2) // 2   # [0, 1]
    cols = (np.arange(2) * 4) // 2   # [0, 2]
    resized = img[rows][:, cols]
    assert resized[:, :, 0].tolist() == [[0, 2], [4, 6]]


def test_image_resize_stats_matches_direct_decode(spark):
    from market_data_pipeline_databricks_spark.operators import multimodal as MM
    from market_data_pipeline_databricks_spark.plans.vector_ops import (
        multimodal_image_resize,
    )

    out = multimodal_image_resize(spark, SF).toPandas().set_index("doc_id")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars")
        .limit(20)
        .collect()
    )
    import numpy as np

    for r in docs:
        did, n_chars = r["doc_id"], r["n_chars"]
        w, h = 8 + (did % 5) * 4, 8 + (n_chars % 7) * 4
        y, x = np.mgrid[0:h, 0:w]
        gray = (did * 31 + y * w + x) % 256
        rows = (np.arange(16) * h) // 16
        cols = (np.arange(16) * w) // 16
        want = int(gray[rows][:, cols].sum())
        got = out.loc[did]
        assert (got["orig_w"], got["orig_h"]) == (w, h)
        assert got["resized_sum"] == want
