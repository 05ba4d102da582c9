"""Registry-wide plan lint — the scale guards as executable assertions.

For every registered batch query, build the physical plan (no
execution) and assert the invariants the 100 TB design relies on:

- no CartesianProduct anywhere (scalar broadcasts compile to
  BroadcastNestedLoopJoin with a 1-row build side, which is allowed);
- no BatchEvalPython (row-at-a-time Python UDF) anywhere;
- Arrow-based Python nodes (pandas UDF / grouped map / mapInPandas)
  only in the queries that declare them.

Queries that execute work at construction time (availableNow streams,
iterative components, IVF centroid training) are skipped here — their
plan discipline is asserted by their own tests.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# construction runs jobs (streams, iterative fixpoints, centroid
# training) — linted in their own tests instead
EAGER = {
    "dedup_components",
    "dedup_components_lsh",
    "vector_kmeans_clusters",
    "dedup_component_survivors",
    "dedup_representative_survivors",
    "graph_part_pagerank",
    "dedup_component_size_histogram",
    "vector_ann_ivf_topk",
    "vector_ann_ivfpq_topk",
    "curate_semdedup",  # k-means training at construction
    "text_bpe_train_merges",  # N merge iterations at construction
    "text_bpe_encode_stats",  # trains merges at construction
    "text_curation_distill_report",  # MLlib fit at construction
    "vector_ann_quality_report",  # IVF training at construction
    "graph_frequent_itemsets",  # basket-stats action (n, max width) at construction
    "source_orc_roundtrip",  # writes the roundtrip files at construction
    "source_json_roundtrip",  # writes the roundtrip files at construction
    "scale_zorder_clustering",  # writes the clustered copy at construction
    "scale_layout_zorder_pruning",  # quantile sketch + governed copy at construction
    "warehouse_erase_rtbf",  # writes + erases the warehouse at construction
    "source_schema_evolution",  # writes the evolving table at construction
    "warehouse_time_travel",  # snapshot commits at construction
    "warehouse_snapshot_cdc",  # snapshot commits at construction
    "warehouse_vacuum_audit",  # commits + vacuums at construction
    "warehouse_write_audit_publish",  # stages + publishes at construction
    "scale_bucketed_join",  # saveAsTable + plan check at construction
    "warehouse_compact_small_files",  # writes + compacts at construction
    "scale_dynamic_partition_pruning",  # writes the partitioned warehouse at construction
}

# Arrow-batched Python is the sanctioned slow path for exactly these
PANDAS_OK = {
    "funcs_ewma_close",
    "funcs_macd",
    "funcs_cusum_drift",  # clamped recursion — grouped-map by design
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    "multimodal_wav_roundtrip",
    "multimodal_audio_near_dup",  # same WAV-decode mapInPandas stage
    "multimodal_image_resize",
    "multimodal_image_near_dup",
    "multimodal_image_dedup_groups",  # same PPM-decode mapInPandas stage
    "multimodal_image_dedup_incremental",  # same PPM-decode mapInPandas stage
    # r6 scale-adaptive similarity: matmul bucket hashing
    # (ArrowEvalPython) on the banded path, block-pair GEMM
    # (FlatMapCoGroupsInPandas) on the bulk-threshold exact path
    "vector_ann_lsh_topk",
    "vector_ann_near_dup_lsh",
    "curate_multimodal_corpus_lsh",
    # exact all-pairs baselines, evaluated through the blocked GEMM
    # (bit-identical to the naive fold form, pytest-pinned)
    "vector_near_dup_pairs",
    "curate_multimodal_corpus",
    # reuses vector_near_dup_pairs' blocked cogroup-GEMM stage
    "dedup_method_agreement",
}

# Round 6 removed the last deliberate cartesian (the multimodal
# capstone's near-dup stage now runs the blocked cogroup-GEMM, exact
# and cartesian-free), so NO query may produce a CartesianProduct.
CARTESIAN_OK: set[str] = set()

SF = "/root/testdata/sf0.001"


def _batch_queries():
    return [
        (name, fn)
        for name, fn in entrymod.queries().items()
        if not name.startswith("stream_") and name not in EAGER
    ]


@pytest.mark.parametrize("name,fn", _batch_queries(), ids=lambda p: p if isinstance(p, str) else "")
def test_plan_invariants(spark, name, fn):
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in PANDAS_OK:
        for node in (
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
            "FlatMapCoGroupsInPandas",
            "MapInPandas",
        ):
            assert node not in plan, f"{name}: unexpected Python node {node}"
