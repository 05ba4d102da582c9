"""Similarity-search queries over the ``embeddings`` table.

Cosine math on both engines is a sequential left-to-right double fold
(Spark ``aggregate``/``zip_with``; DuckDB ``list_dot_product`` on
DOUBLE[] — verified bit-identical), mirrored expression order:
dot(q,c) / (sqrt(dot(q,q)) * sqrt(dot(c,c))). Banded LSH/IVF variants
use seeded hyperplanes/centroids with no SQL twin → rows-only checks
with recall cross-validated against the brute-force baseline in tests;
the structure="auto" near-dup variants route to the exact blocked GEMM
at bulk thresholds and are fully oracle-backed (see the ORACLE_SQL
aliases at the bottom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators import similarity as SIM


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _emb_rows(spark: SparkSession, sf_dir: str) -> int:
    """Corpus row count for LSH auto-tuning — a count() on the bare
    parquet scan (zero-column projection: row-group metadata, no data
    pages), so the plan-build cost is O(files) not O(rows)."""
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()


def _queries_subset(df: DataFrame) -> DataFrame:
    # Every 40th vector is a query — small fixed query set at any sf.
    return df.filter(F.col("vec_id") % 40 == 0)


def vector_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 per query vector (the ANN
    correctness baseline)."""
    emb = _emb(spark, sf_dir)
    return SIM.cosine_topk(emb, _queries_subset(emb), k=10)


def vector_sign_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary sign-quantized ANN: top-10 per query by Hamming distance
    on 1-bit/dim sign signatures (two 32-bit words — pure functions of
    the stored floats, no hash family), exact cosine attached, ties by
    neighbor id. The one ANN variant whose entire candidate ranking a
    SQL oracle reproduces bit-for-bit — the compressed-linear-scan
    baseline the hashed sublinear paths (sign-LSH, IVF) are graded
    against."""
    emb = _emb(spark, sf_dir)
    return SIM.sign_hamming_topk(emb, _queries_subset(emb), k=10)


def vector_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs embedding near-dups at cosine ≥ 0.4 (the corpus
    max pairwise cosine is ~0.51, so this returns the true tail).
    Evaluated through the blocked cogroup-GEMM (bit-identical to the
    naive fold form, which stays the pytest ground truth): same exact
    answer, quadratic paid at matmul rate — 77 s → ~2 s at sf0.1."""
    return SIM.cosine_near_duplicates_blocked(
        _emb(spark, sf_dir), threshold=0.4, n_rows=_emb_rows(spark, sf_dir)
    )


def vector_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10, scale-adaptive tuning: plane /
    table counts derive from the corpus row count at plan-build
    (operators/similarity.py:lsh_auto_tuning — planes grow with log₂ of
    corpus growth so per-query candidate volume stays flat, tables hold
    the miss budget). Rows-only driver check; recall vs brute force is
    asserted in tests/test_training_ops.py."""
    emb = _emb(spark, sf_dir)
    return SIM.ann_topk_lsh(
        emb, _queries_subset(emb), k=10, n_rows=_emb_rows(spark, sf_dir)
    )


def vector_ann_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH near-dup pairs (cosine ≥ 0.4) with exact
    verification, scale-adaptive tuning from the corpus count — the
    r5 sf1.0 rehearsal measured the fixed-tuning form super-linear
    (output grew 102× at 10× rows), so this now shares the banding-law
    auto-tuning with the multimodal capstone. At this bulk threshold
    the structure selector routes to the exact blocked GEMM path, so
    the query is fully oracle-backed (brute-force twin's SQL); keep-set
    equality is additionally pytest-pinned."""
    return SIM.cosine_near_duplicates_multitable(
        _emb(spark, sf_dir), threshold=0.4, n_rows=_emb_rows(spark, sf_dir)
    )


def vector_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10, scale-adaptive: cell count grows ∝ √n
    with the corpus (operators/similarity.py:ivf_auto_tuning) so
    per-query probe work stays O(√n) — fixed 16 cells measured 8.8×
    wall for 10× rows at the sf1.0 rehearsal. Rows-only driver check;
    recall vs brute force asserted in tests."""
    emb = _emb(spark, sf_dir)
    return SIM.ann_topk_ivf(
        emb,
        _queries_subset(emb),
        k=10,
        n_cells=None,
        nprobe=None,
        n_rows=_emb_rows(spark, sf_dir),
    )


def vector_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-5 (operators/pq.py:ann_topk_ivfpq): the
    coarse quantizer prunes to nprobe cells, PQ codes score the
    survivors from bytes alone — the production memory/recall
    composition. Rows-only driver check (k-means codebooks have no SQL
    twin); distance identity with unpruned ADC and self-retrieval are
    asserted in tests/test_pq.py."""
    from market_data_pipeline_databricks_spark.operators import pq as PQ

    emb = _emb(spark, sf_dir).persist()
    return PQ.ann_topk_ivfpq(
        emb,
        _queries_subset(emb),
        topk=5,
        n_cells=8,
        nprobe=3,
        m=16,
        k_code=16,
    )


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → Arrow-batched mapInPandas feature extract
    (deterministic fake decoder — real codecs absent here; plumbing,
    schema and batch shape are the real thing). Rows-only check."""
    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = MM.documents_as_media(docs)
    feats = MM.extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "mime",
        "n_bytes",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6).alias(
            "feature_sum"
        ),
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only frame-sampling plan (every 10th frame) — decode
    touches only sampled frames downstream. SQL-expressible, full
    oracle."""
    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = MM.documents_as_media(docs)
    plan = MM.frame_sample_plan(media, every_n=10)
    return plan.select("media_id", F.col("frame_idx").cast("long").alias("frame_idx"))


def curate_multimodal_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality curation capstone: text filters (language +
    quality) on ``documents`` joined 1:1 with ``embeddings``, then
    embedding-cosine near-dup removal (drop the higher id of any
    surviving pair with cos ≥ 0.45). The text capstone
    (curate_training_corpus) dedups by CONTENT; this one dedups by
    REPRESENTATION — production pipelines run both.

    Scale: the doc↔vector join is a plain equi-join on the id (co-
    partitionable/bucketable); the near-dup pass is EXACT all-pairs so
    DuckDB can verify the whole chain, evaluated through the blocked
    cogroup-GEMM (bit-identical to the naive fold form, which stays
    the pytest ground truth — 59 s → ~3 s at sf0.1). The _lsh twin's
    remaining distinction is the auto structure selector, which would
    switch to banded LSH at production thresholds."""
    from market_data_pipeline_databricks_spark.operators import text as TX

    docs = TX.with_text_stats(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "lang_pred", "quality", "n_tokens")
    kept = docs.filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
    emb = _emb(spark, sf_dir)
    enriched = kept.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding", "label"),
        "doc_id",
    ).persist()  # feeds the pair stage (4 consumers inside blocked) +
    # the final anti-join
    pairs = SIM.cosine_near_duplicates_blocked(
        enriched.select(F.col("doc_id").alias("vec_id"), "embedding"),
        threshold=0.45,
        n_rows=_emb_rows(spark, sf_dir),
    )
    removed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return enriched.join(removed, "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "quality", F.col("label").cast("long").alias("label")
    )


def curate_multimodal_corpus_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-modality capstone with the near-dup stage swapped to
    the scale-adaptive structure
    (operators/similarity.py:cosine_near_duplicates_multitable,
    structure="auto"): plane/table counts derive from the corpus count
    via the sf1.0-validated banding law, and the same model detects
    when banding cannot prune at all — at this testdata's bulk
    threshold (0.45, where the r5 rehearsal measured 76% of ALL pairs
    surviving (6,96) banding) it selects the exact block-GEMM path
    (cosine_near_duplicates_blocked: quadratic paid at BLAS rate,
    bit-identical to brute force; measured 295 s → 15 s on the 10×
    rehearsal). At production thresholds (≥ 0.9) the same call keeps
    auto-tuned multitable LSH, which prunes exponentially there.
    Fully oracle-backed (the exact twin's SQL — the blocked path is
    bit-identical to brute force); keep-set equality with the
    brute-force form is additionally asserted in
    tests/test_training_ops.py."""
    from market_data_pipeline_databricks_spark.operators import text as TX

    docs = TX.with_text_stats(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "lang_pred", "quality", "n_tokens")
    kept = docs.filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
    emb = _emb(spark, sf_dir)
    enriched = kept.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding", "label"),
        "doc_id",
    ).persist()  # two consumers (pair stage + final anti-join);
    # measured 30.6 s -> 20.8 s at sf0.1 — the 48-table LSH stage
    # re-derived the text-stats/join chain per table group without it.
    # Lazy persist, not localCheckpoint: building the plan must stay
    # free of jobs (the house rule from operators/dedup.py). The
    # brute-force twin stays persist-free: its O(n^2) stage dominates
    # (A/B measured 52.2 vs 50.4 s — noise).
    pairs = SIM.cosine_near_duplicates_multitable(
        enriched.select(F.col("doc_id").alias("vec_id"), "embedding"),
        threshold=0.45,
        # corpus size for the auto tuner / structure selector: the
        # unfiltered embeddings footer count is a cheap upper bound
        # (the filtered corpus is strictly smaller, which only makes
        # the chosen structure safer).
        n_rows=_emb_rows(spark, sf_dir),
    )
    removed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return enriched.join(removed, "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "quality", F.col("label").cast("long").alias("label")
    )


def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, oracle-checked: synthesize a genuine RIFF/PCM
    WAV per document (tone length n_chars × 8 samples), then parse it
    back with the real chunk-walking PCM decoder — both sides
    Arrow-batched mapInPandas (operators/multimodal.py). The decoded
    sample count, byte size (44-byte header + 2 bytes/sample) and
    duration are exact integer arithmetic, so DuckDB can verify that
    the decoder recovered precisely what the container holds."""
    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = MM.synthesize_wav_media(docs)
    stats = MM.wav_sample_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "n_bytes",
        "n_samples",
        F.round(F.col("n_samples") / F.col("sample_rate"), 6).alias("duration_s"),
    )


def multimodal_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup by signal fingerprint, REAL decode: each document's
    synthetic WAV is parsed back (RIFF chunk walk + PCM) and
    fingerprinted by its zero-crossing rate — the classic cheap pitch
    estimator — then clips collapse into frequency-bin duplicate
    groups (clips of the same tone are re-recordings of the same
    content at different lengths). The estimated frequency bin is
    recovered from the crossing count by exact ceil-division: the ZC
    estimate underestimates f by < rate/(2(n−1)), which is below the
    25 Hz grid spacing only for n_samples > 161 — i.e. docs with
    n_chars ≥ 20 under the synthesizer's length mapping. Within that
    precondition the unique grid point at or above the estimate IS the
    source tone; for shorter clips the recovered bin can sit below the
    true tone (both engines share the formula, so the oracle stays
    green, but the dedup grouping is then nominal rather than
    acoustic — the shipped documents corpus satisfies the bound).
    Either way the whole pipeline — decode included — is replayable by
    the DuckDB oracle's analytic crossing count. Output: one row per
    frequency bin with the duplicate-group facts.

    Scale shape: decode is one Arrow mapInPandas pass (bytes never
    shuffle); the group-by carries 3 integers per clip."""
    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = MM.wav_zero_crossing_stats(MM.synthesize_wav_media(docs))
    # k = ceil((zc·rate − 400(n−1)) / 50(n−1)); +200·den shift keeps the
    # numerator positive so trunc-div == floor-div == ceil after the
    # +den−1 adjustment, identically on both engines
    k = F.expr(
        "(zc*8000 - 400*(n_samples-1) + 200*(50*(n_samples-1))"
        " + 50*(n_samples-1) - 1) div (50*(n_samples-1)) - 200"
    )
    binned = st.select(
        "media_id", "n_samples", (F.lit(200) + F.lit(25) * k).alias("freq_hz")
    )
    return binned.groupBy(F.col("freq_hz").cast("long").alias("freq_hz")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clips"),
        F.min("media_id").alias("rep_id"),
        F.expr("count(1) * (count(1) - 1) div 2").cast("long").alias(
            "n_dup_pairs"
        ),
        F.sum("n_samples").cast("long").alias("sum_samples"),
    )


def vector_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, dimension) centroid components of the embedding
    corpus — the k-means E-step statistic / class-prototype builder,
    long format so every component is oracle-checked
    (operators/similarity.py:label_centroid_components)."""
    return SIM.label_centroid_components(_emb(spark, sf_dir))


def vector_label_noise_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel screen: each vector's cosine to its own label centroid
    vs the best other-label centroid; is_suspect where the other label
    wins. Centroids broadcast as one packed row — the corpus never
    shuffles (operators/similarity.py:label_noise_screen)."""
    return SIM.label_noise_screen(_emb(spark, sf_dir))


def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding corpus: per-dimension
    min/max codebook (exact aggregates — bit-identical on any engine),
    then code = floor((val - lo) / (hi - lo) * 255) clamped to [0,255]
    — the memory-4x-compression step before ANN serving. The codebook
    is |dims| rows and broadcasts; row-level oracle over every
    (vec_id, dim) code. Constant-dimension guard (hi == lo → 0) keeps
    NaN out of both engines' clamp semantics."""
    d = _emb(spark, sf_dir).select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "val"
        ),
    )
    rng = d.groupBy("dim").agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    code = F.floor((F.col("val") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255)
    return (
        d.join(F.broadcast(rng), "dim")
        .select(
            "vec_id",
            F.col("dim").cast("long").alias("dim"),
            F.when(
                F.col("hi") > F.col("lo"),
                F.least(F.lit(255), F.greatest(F.lit(0), code)),
            )
            .otherwise(0)
            .cast("long")
            .alias("code"),
        )
    )


def vector_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension health report of the embedding corpus: mean,
    sample stddev, min/max and a collapsed-dimension flag — the QA pass
    that catches dead or saturated dimensions before they poison
    cosine similarity (a near-constant dimension contributes pure bias
    to every dot product).

    Scale: posexplode is linear, the aggregation shuffles once on the
    dim key (cardinality = embedding width, so the reduce side is
    trivially small however large the corpus); mean AND stddev both run
    through decimal-exact sums (sum x, sum x² — addition associative →
    bit-identical on any partitioning and engine), with one final
    double expression sqrt((Σx² − (Σx)²/n)/(n−1)) folded identically by
    IEEE arithmetic on both sides. A raw double STDDEV_SAMP would be
    accumulation-order dependent and could flake the 6-dp ROUND."""
    d = _emb(spark, sf_dir).select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "val"
        ),
    )
    n = F.count(F.lit(1))
    sum_d = F.sum(F.col("val").cast("decimal(27,12)")).cast("double")
    sum2_d = F.sum(
        (F.col("val") * F.col("val")).cast("decimal(27,12)")
    ).cast("double")
    sd = F.when(
        n > 1,
        F.sqrt(F.greatest((sum2_d - sum_d * sum_d / n) / (n - 1), F.lit(0.0))),
    )
    return (
        d.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vals"),
            F.round(sum_d / n, 6).alias("mean_val"),
            F.round(sd, 6).alias("sd_val"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
            (F.coalesce(sd, F.lit(0.0)) < 1e-6).alias("near_constant"),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n_vals",
            "mean_val",
            "sd_val",
            "min_val",
            "max_val",
            "near_constant",
        )
    )


def vector_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-centroid cosine matrix (upper triangle incl. diagonal):
    how separable the label clusters are in embedding space — the
    companion diagnostic to vector_label_noise_screen (that query asks
    "is this VECTOR near the wrong centroid"; this one asks "are these
    LABELS near each other at all" — a pair of high-cosine centroids
    means the noise screen between them is structurally blind).

    Scale: centroids reduce the corpus to n_labels×dim rows (one
    (label, dim) shuffle — label_centroid_components); the matrix
    itself is n_labels² rows of array arithmetic on a frame small
    enough to cross-join outright. Centroid components are rounded to
    6 dp BEFORE the cosine (same pinning as the noise screen), so both
    engines fold identical bits."""
    cents = SIM.label_centroid_components(_emb(spark, sf_dir))
    vecs = (
        cents.groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "centroid"))).alias("s")
        )
        .select(
            "label", F.transform("s", lambda x: x["centroid"]).alias("cv")
        )
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    # n_labels rows — a provably bounded broadcast (same argument as
    # the packed-centroid broadcast in label_noise_screen), which also
    # keeps the pair build a BroadcastNestedLoopJoin, never a cartesian
    pair = a.crossJoin(F.broadcast(b)).filter(
        F.col("a.label") <= F.col("b.label")
    )
    return pair.select(
        F.col("a.label").alias("label_a"),
        F.col("b.label").alias("label_b"),
        F.round(
            SIM.cosine(F.col("a.cv"), F.col("b.cv")), 6
        ).alias("centroid_cosine"),
    )


def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + nearest-neighbor resize, oracle-checked:
    synthesize a genuine binary PPM per document (deterministic pixel
    arithmetic), parse it back with the real P6 decoder and downsample
    to 16×16 (operators/multimodal.py:image_resize_stats). The resized
    pixel sum is pure integer arithmetic from the synthesis
    parameters, so DuckDB recomputes the identical grid — verifying
    the decode→resize kernel end-to-end, the image twin of
    multimodal_wav_roundtrip."""
    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = MM.synthesize_ppm_media(docs)
    return MM.image_resize_stats(media, size=16).select(
        F.col("media_id").alias("doc_id"), "orig_w", "orig_h", "resized_sum"
    )


def multimodal_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over the binary media column: REAL PPM
    decode → 8×8 average-hash (integer mean threshold, no float math)
    → banded Hamming pairs ≤ 3 — the pHash-family near-dup every
    image-corpus pipeline runs before training. Banding recall is
    exactly 1 by pigeonhole (4 disjoint 16-bit bands), so the DuckDB
    oracle checks all-pairs Hamming computed from the synthesis
    parameters — the decode→downsample→threshold kernel is what the
    hash equality verifies."""
    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = MM.synthesize_ppm_media(docs)
    return (
        MM.image_ahash_near_duplicates(media, max_hamming=3)
        .select("id_a", "id_b", "hamming")
    )


def multimodal_image_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe image dedup (round-8): exact-hash groups collapse
    first (linear groupBy), the banded Hamming join then runs over
    DISTINCT hashes only, carrying group sizes as pair multiplicities.
    The pair-list twin (`multimodal_image_near_dup`) measured its own
    output quadratic on the rehearsal corpus (6.5k pairs at sf0.01 →
    641k at sf0.1 — the corpus's pair count, since the synthetic image
    universe is finite); this form's output is O(distinct hashes +
    near-dup hash pairs) and is what an image pipeline ships at 100 TB.
    Oracle replays the synthesis → aHash → grouping → banded pairs."""
    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = MM.synthesize_ppm_media(docs)
    return MM.image_ahash_dedup_groups(media, max_hamming=3).select(
        "rep_a", "rep_b", "hamming", "n_image_pairs"
    )


def multimodal_image_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental image dedup, batch form: the new crawl drop
    (doc_id % 10 == 0) probes the static corpus aHash band index
    (doc_id % 10 != 0) — one row per batch image with its corpus match
    count and closest Hamming distance. The image analogue of the
    text/CDC batch-probes-index incremental family; the streaming twin
    (`stream_image_dedup_incremental`) must equal this exactly and
    shares the oracle. Filters run BEFORE synthesis/decode, so only
    needed images are decoded."""
    from market_data_pipeline_databricks_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_sigs = MM.image_ahash_words(
        MM.synthesize_ppm_media(docs.filter(F.col("doc_id") % 10 != 0))
    )
    batch_sigs = MM.image_ahash_words(
        MM.synthesize_ppm_media(docs.filter(F.col("doc_id") % 10 == 0))
    )
    return MM.image_ahash_probe(corpus_sigs, batch_sigs, max_hamming=3)


def vector_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 5 iterations) over the full
    embedding corpus, rolled up per cluster — the whole-corpus
    clustering op beside the sampled IVF trainer
    (operators/similarity.py:kmeans_lloyd: Arrow-batched E-step,
    (cluster, dim)-shuffled decimal-exact M-step; only the k×dim
    centroid matrix touches the driver). Deterministic init (k lowest
    ids) + order-independent sums → reproducible on any partitioning.
    Rows-only driver check (iterative, no SQL twin); inertia
    monotonicity and nearest-centroid consistency are pytest-asserted
    (tests/test_kmeans.py)."""
    from pyspark import StorageLevel

    emb = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    assigned, _cent, _inertia = SIM.kmeans_lloyd(emb, k=8, iters=5)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("sq_dist").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_sq_dist"),
        )
        .orderBy("cluster")
    )


def _fixed_centroids(emb: DataFrame, k: int = 8) -> list[tuple[int, list[float]]]:
    """The k lowest-id vectors as deterministic centroids (the same
    init kmeans_lloyd uses) — bounded collect (.limit(k))."""
    return [
        (int(r["vec_id"]), [float(x) for x in r["vec"]])
        for r in emb.select(
            F.col("vec_id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "vec"
            ),
        )
        .orderBy("vec_id")
        .limit(k)
        .collect()
    ]


def _centroid_dist_structs(vd, cents):
    """One (rounded decimal-quantized squared distance, centroid id)
    struct per centroid — F.least over them is the argmin with the
    deterministic (distance, id) tie-break; array_sort + slice gives
    the nprobe nearest cells. Centroids ride as literal arrays, so the
    evaluation is scan-local row math: zero shuffles."""
    choices = []
    for cid, cvec in cents:
        carr = F.array(*[F.lit(v) for v in cvec])
        dist = F.aggregate(
            F.zip_with(vd, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("decimal(38,12)"),
            lambda acc, t: (acc + t.cast("decimal(27,12)")).cast(
                "decimal(38,12)"
            ),
        )
        choices.append(
            F.struct(
                F.round(dist.cast("double"), 6).alias("d"),
                F.lit(cid).cast("long").alias("c"),
            )
        )
    return choices


def vector_ann_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN in fully ORACLE-REPLAYABLE form — the fixed-centroid
    companion to the trained ``vector_ann_ivf_topk`` (rows-only: k-means
    training is float-associative; COVERAGE.md): cells are the k = 8
    lowest-id vectors, every assignment and every query↔candidate
    distance is the per-element decimal(27,12)-quantized sum, the probe
    is the nprobe = 3 nearest cells per query (array_sort over the
    same distance structs), and the in-cell search is exact top-5 with
    the (distance, id) tie-break — so DuckDB replays index build,
    probe routing, AND ranking bit-for-bit. Queries are the
    vec_id % 97 == 0 corpus vectors (self-match excluded).

    Scale shape: assignment and probe routing are scan-local literal-
    array math (zero shuffles); the only join ships corpus rows to
    their probed queries via a BROADCAST of the (query, cell) fan-out
    (queries are a fixed small panel by construction); top-k rides the
    map-side WindowGroupLimit. Cell-local candidate counts scale as
    n·nprobe/k — the IVF contract. nprobe = 3 of 8 measures recall@5 of
    0.77 vs brute force at sf0.01 (pytest floor 0.5) — these synthetic
    embeddings have weak cluster structure, so untrained lowest-id
    centroids partition arbitrarily; on clustered production vectors
    the same plan probes fewer cells for more recall."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    cents = _fixed_centroids(emb, k=8)
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("vd"),
    )
    choices = _centroid_dist_structs(F.col("vd"), cents)
    corpus = base.select(
        "vec_id", "vd", F.least(*choices)["c"].alias("cell")
    )
    qcells = (
        base.filter(F.col("vec_id") % 97 == 0)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("vd").alias("qvd"),
            F.explode(
                F.slice(F.array_sort(F.array(*choices)), 1, 3)
            ).alias("pc"),
        )
        .select("qid", "qvd", F.col("pc.c").alias("cell"))
    )
    cand = corpus.join(F.broadcast(qcells), "cell").filter(
        F.col("vec_id") != F.col("qid")
    )
    dist = F.aggregate(
        F.zip_with(F.col("vd"), F.col("qvd"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, t: (acc + t.cast("decimal(27,12)")).cast("decimal(38,12)"),
    )
    scored = cand.select(
        F.col("qid").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.round(dist.cast("double"), 6).alias("dist2"),
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


def vector_ann_pq_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN in fully ORACLE-REPLAYABLE form — the
    fixed-codebook companion to the trained PQ (operators/pq.py,
    rows-only: per-subspace k-means training is float-associative).
    Codebooks are the per-subspace slices of the 16 lowest-id vectors
    (m = 8 subspaces × 8 dims, 16 codes each); ENCODING is the
    per-subspace argmin over decimal-quantized slice distances
    (F.least over (rounded distance, code) structs — scan-local
    literal math, zero shuffles); ADC search builds the per-query
    lookup table engine-side in long format (query × subspace × code
    distances, broadcast), scores every corpus code row with one join
    + a decimal sum over its 8 subspace entries, and ranks exact top-5
    per query (self excluded, (distance, id) tie-break). DuckDB
    replays codebook construction, every code assignment, the LUT,
    and the ADC ranking bit-for-bit.

    This is the CORRECTNESS twin: quantization QUALITY belongs to the
    trained PQ (whose own floor is recall ≥ 0.3 on these deliberately
    hard near-uniform synthetic vectors, tests/test_pq.py). With
    untrained lowest-id codebooks the fixed form measures recall@5
    ≈ 0.17/0.23 (sf0.01/sf0.001) vs ≈ 0.01 random, and its selected
    neighbors average ~0.8× the mean corpus distance — floored in
    pytest; the oracle-hashed machinery, not the recall number, is
    the contract here.

    Scale shape: encoding touches each vector once against a
    broadcast codebook (the 32× footprint win PQ exists for); the ADC
    join ships 8 small integers per corpus vector and broadcasts a
    |queries|·m·k-row LUT — the FAISS IndexPQ search shape as
    DataFrame ops.

    Plan note (round-9 verdict task 4): the original encode evaluated
    m·k = 128 interpreted decimal HOF folds per vector (Spark runs
    ``aggregate``/``zip_with`` lambdas outside codegen — 10.5 s at
    sf0.1 for 2k vectors, the slowest per-row query in the registry).
    Because decimal addition is EXACT, the fold is associative, so the
    same distances are now computed by exploding each vector to its 8
    subspace slices, broadcast-joining the 128-row (s, code, y0..y7)
    codebook, and summing the 8 per-dim terms as one chained codegen
    expression — no dim-level fan-out, one argmin groupBy over
    n·m·k rows, bit-identical results (pinned by the unchanged
    oracle), measured ~5× faster.

    Round-10 (verdict task 6, measured 5.4 s → 2.63 s same-session at
    sf0.1, bit-identical): (a) the ADC no longer fans codes out n·m
    long and re-aggregates — the per-vector codes and the per-query
    LUT each pre-aggregate into ONE position-indexed ARRAY column
    (arrays, not maps: Spark's map element_at linear-scans the keys,
    an array index is O(1) — the map variant measured 2.95/18.1 s at
    sf0.1/sf1.0 vs the array's 2.63/12.8 s), the pairing is a
    broadcast nested-loop over n·|q| rows, and the 8 subspace terms
    sum as one chained array-lookup expression; (b) the corpus
    repartitions to the session parallelism before the decimal explode
    — the driver corpus is a single parquet file, so the encode arm
    otherwise runs on ONE core until its first shuffle. Full measured
    matrix (sf0.1/sf1.0): old join form 5.43/13.9, join+repartition
    3.46/10.3, map 2.95/18.1, array 2.63/12.8 — the twin's cost is
    O(n·|q|) = O(n²/97) BY DESIGN (the query set samples the corpus),
    so every form is quadratic per 10×; the sf0.1 target and the
    trained IVF-PQ (the pruned scale path) govern the choice."""
    from pyspark.sql import Window

    m, dsub, kcodes = 8, 8, 16
    emb = _emb(spark, sf_dir)
    # collect the raw float vectors and widen driver-side: Python
    # float(float32) is the same exact widening as the engine's
    # float→double cast, and skipping the interpreted transform-HOF
    # projection saves >1 s of the old collect
    cb_rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(kcodes).collect()
    )
    # cbs[s][c] = 8-dim codeword: subspace-s slice of the c-th
    # lowest-id vector (code ids follow lowest-id order)
    cbs = [
        [
            [float(x) for x in r["embedding"][s * dsub : (s + 1) * dsub]]
            for r in cb_rows
        ]
        for s in range(m)
    ]
    from market_data_pipeline_databricks_spark.plans._spread import (
        spread_to_parallelism,
    )

    base = spread_to_parallelism(
        emb.select("vec_id", "embedding"),
        cache_key=f"{sf_dir}/embeddings.parquet",
    )
    # codebook wide-long: one row per (subspace, code) with the 8
    # codeword dims as columns — m·k = 128 rows, broadcast
    cb_long = spark.createDataFrame(
        [
            (s, c, *cbs[s][c])
            for s in range(m)
            for c in range(kcodes)
        ],
        "s int, code int, "
        + ", ".join(f"y{j} double" for j in range(dsub)),
    )

    def _term_dists(df, id_col):
        """(id, s, code, dist): per-subspace decimal distance of every
        row's slice to every codeword. Slice elements are indexed
        straight off the float array and widened (exact — no
        interpreted transform-HOF in the hot path); each term is the
        double (x−y)² cast decimal(27,12) — identical to the fold's
        per-element cast — and the 8 terms sum as one chained (exact)
        decimal add inside codegen; rows fan out only m·k per
        vector."""
        sub = df.select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).cast("int").alias("s"),
                            *[
                                F.col("embedding")[s * dsub + j]
                                .cast("double")
                                .alias(f"x{j}")
                                for j in range(dsub)
                            ],
                        )
                        for s in range(m)
                    ]
                )
            ).alias("e"),
        ).select(id_col, "e.*")
        term = lambda j: (
            (F.col(f"x{j}") - F.col(f"y{j}"))
            * (F.col(f"x{j}") - F.col(f"y{j}"))
        ).cast("decimal(27,12)")
        dist = term(0)
        for j in range(1, dsub):
            dist = dist + term(j)
        return sub.join(F.broadcast(cb_long), ["s"]).select(
            id_col, "s", "code", dist.alias("dist")
        )

    # per-vector code ARRAY indexed by subspace (array_sort on the
    # (s, code) structs orders by s): the argmin stays a groupBy over
    # n·m·k rows; the array pre-aggregation replaces the n·m long form
    codes_arr = (
        _term_dists(base, "vec_id")
        .groupBy("vec_id", "s")
        .agg(
            F.min(
                F.struct(
                    F.round(F.col("dist").cast("double"), 6).alias("d"),
                    F.col("code").alias("c"),
                )
            )["c"].alias("code")
        )
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda x: x["code"],
            ).alias("carr")
        )
    )
    # per-query LUT as ONE array column positioned by s·k + code
    # (m·k = 128 entries per query), broadcast whole; array index
    # lookups are O(1) where map element_at linear-scans the keys
    lut_arr = (
        _term_dists(
            base.filter(F.col("vec_id") % 97 == 0).withColumnRenamed(
                "vec_id", "qid"
            ),
            "qid",
        )
        .groupBy("qid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (F.col("s") * kcodes + F.col("code")).alias("k"),
                            F.col("dist").alias("v"),
                        )
                    )
                ),
                lambda x: x["v"],
            ).alias("qarr")
        )
    )
    # ADC: broadcast nested-loop pairing (n × |q| rows — the IndexPQ
    # linear scan) + one chained decimal expression of 8 array lookups
    # (1-based element_at); decimal addition is exact, so regrouping
    # the sum is bit-identical to the former join-then-aggregate form
    # (pinned by the oracle). The transform/array_sort HOFs run once
    # per AGGREGATED row (n + |q| rows), not in the n·|q| hot loop —
    # the interpreted-HOF tax the encode rewrite avoids does not apply
    paired = codes_arr.crossJoin(F.broadcast(lut_arr)).filter(
        F.col("vec_id") != F.col("qid")
    )
    acc = F.element_at("qarr", F.element_at("carr", 1) + F.lit(1))
    for s in range(1, m):
        acc = acc + F.element_at(
            "qarr", F.element_at("carr", s + 1) + F.lit(s * kcodes + 1)
        )
    adc = paired.select(
        "qid",
        "vec_id",
        F.round(acc.cast("double"), 6).alias("adc_dist2"),
    )
    w = Window.partitionBy("qid").orderBy("adc_dist2", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            "adc_dist2",
            "rank",
        )
    )


def vector_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means ASSIGNMENT step in oracle-replayable form (round-7
    verdict task 4: fixed-centroid variant where iteration was the only
    blocker). Centroids are the k = 8 lowest-id vectors — the same
    deterministic init :func:`kmeans_lloyd` uses — and every squared
    distance is a per-element decimal(27,12)-quantized sum, so the
    argmin compares IDENTICAL decimals on both engines (the trainer's
    BLAS E-step argmin, by contrast, is float-associative and genuinely
    un-replayable — documented in COVERAGE.md).

    Plan shape: centroids ride as literal arrays (k×dim doubles, a
    broadcast-closure analogue), so assignment is scan-local per-row
    array math — ZERO shuffles, linear in corpus, the exact shape a
    100-TB E-step wants. Ties (equal rounded distance) break by
    centroid id ascending on both engines."""
    emb = _emb(spark, sf_dir)
    cents = _fixed_centroids(emb, k=8)
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("vd"),
    )
    choices = _centroid_dist_structs(F.col("vd"), cents)
    best = F.least(*choices)
    return base.select(
        "vec_id",
        best["c"].alias("cluster_id"),
        best["d"].alias("dist2"),
    )


def vector_truncation_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation: how much pairwise cosine
    structure survives keeping only the first half of each embedding —
    the measurement behind "can we store 32 of the 64 dims and halve
    the ANN index". Pairs are deterministic id-adjacent (vec_id,
    vec_id+1); per label: mean full-dim cosine, mean half-dim cosine,
    and the mean absolute fidelity gap.

    Parity: arrays cast to double BEFORE any arithmetic (float
    accumulation differs between engines); dot/norm are sequential
    array folds — the same element order DuckDB's list_inner_product
    walks — and the per-pair doubles go through decimal before the
    per-label mean. Zero-norm vectors are excluded by contract.

    Scale: the pairing is a self-equi-join on vec_id+1 (one shuffle,
    no candidate explosion); everything after is per-row array math."""
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    )
    a = e.select(F.col("vec_id").alias("pid"), F.col("v").alias("va"), "label")
    b = e.select((F.col("vec_id") - 1).alias("pid"), F.col("v").alias("vb"))
    pairs = a.join(b, "pid")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )

    def cos(x, y):
        return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))

    half = lambda c: F.slice(c, 1, 32)
    scored = pairs.select(
        "label",
        cos(F.col("va"), F.col("vb")).alias("cf"),
        cos(half(F.col("va")), half(F.col("vb"))).alias("ch"),
    )

    def dmean(c):
        return F.round(
            F.sum(c.cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        )

    return scored.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        dmean(F.col("cf")).alias("mean_cos_full"),
        dmean(F.col("ch")).alias("mean_cos_half"),
        dmean(F.abs(F.col("cf") - F.col("ch"))).alias("mean_abs_gap"),
    )


QUERIES = {
    "vector_truncation_fidelity": vector_truncation_fidelity,
    "vector_ann_ivfpq_topk": vector_ann_ivfpq_topk,
    "vector_cosine_topk": vector_cosine_topk,
    "vector_sign_ann_topk": vector_sign_ann_topk,
    "vector_dim_stats": vector_dim_stats,
    "vector_label_cohesion": vector_label_cohesion,
    "vector_kmeans_clusters": vector_kmeans_clusters,
    "vector_kmeans_assign": vector_kmeans_assign,
    "vector_ann_ivf_fixed_topk": vector_ann_ivf_fixed_topk,
    "vector_ann_pq_fixed_topk": vector_ann_pq_fixed_topk,
    "multimodal_image_resize": multimodal_image_resize,
    "multimodal_image_near_dup": multimodal_image_near_dup,
    "multimodal_image_dedup_groups": multimodal_image_dedup_groups,
    "multimodal_image_dedup_incremental": multimodal_image_dedup_incremental,
    "curate_multimodal_corpus": curate_multimodal_corpus,
    "curate_multimodal_corpus_lsh": curate_multimodal_corpus_lsh,
    "multimodal_wav_roundtrip": multimodal_wav_roundtrip,
    "multimodal_audio_near_dup": multimodal_audio_near_dup,
    "vector_near_dup_pairs": vector_near_dup_pairs,
    "vector_ann_lsh_topk": vector_ann_lsh_topk,
    "vector_ann_near_dup_lsh": vector_ann_near_dup_lsh,
    "vector_ann_ivf_topk": vector_ann_ivf_topk,
    "multimodal_feature_extract": multimodal_feature_extract,
    "multimodal_frame_sample": multimodal_frame_sample,
    "vector_label_centroids": vector_label_centroids,
    "vector_label_noise_screen": vector_label_noise_screen,
    "vector_quantize_int8": vector_quantize_int8,
}

_V = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
)
"""

ORACLE_SQL = {
    "vector_truncation_fidelity": """
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
        ), pairs AS (
          SELECT a.label, a.v AS va, b.v AS vb
          FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
        ), scored AS (
          SELECT label,
                 list_inner_product(va, vb)
                   / (SQRT(list_inner_product(va, va))
                      * SQRT(list_inner_product(vb, vb))) AS cf,
                 list_inner_product(va[1:32], vb[1:32])
                   / (SQRT(list_inner_product(va[1:32], va[1:32]))
                      * SQRT(list_inner_product(vb[1:32], vb[1:32]))) AS ch
          FROM pairs
        )
        SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_pairs,
               ROUND(CAST(SUM(CAST(cf AS DECIMAL(27,12))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_cos_full,
               ROUND(CAST(SUM(CAST(ch AS DECIMAL(27,12))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_cos_half,
               ROUND(CAST(SUM(CAST(ABS(cf - ch) AS DECIMAL(27,12))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_abs_gap
        FROM scored GROUP BY 1
    """,
    "vector_dim_stats": """
        WITH x AS (
          SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
                 generate_subscripts(embedding, 1) AS gs
          FROM embeddings
        )
        SELECT CAST(gs - 1 AS BIGINT) AS dim,
               COUNT(*) AS n_vals,
               ROUND(CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_val,
               ROUND(CASE WHEN COUNT(*) > 1 THEN SQRT(GREATEST(
                 (CAST(SUM(CAST(val * val AS DECIMAL(27,12))) AS DOUBLE)
                  - CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                    * CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                    / COUNT(*))
                 / (COUNT(*) - 1), 0.0)) END, 6) AS sd_val,
               ROUND(MIN(val), 6) AS min_val,
               ROUND(MAX(val), 6) AS max_val,
               COALESCE(CASE WHEN COUNT(*) > 1 THEN SQRT(GREATEST(
                 (CAST(SUM(CAST(val * val AS DECIMAL(27,12))) AS DOUBLE)
                  - CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                    * CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                    / COUNT(*))
                 / (COUNT(*) - 1), 0.0)) END, 0.0) < 1e-6 AS near_constant
        FROM x GROUP BY gs
    """,
    "vector_label_cohesion": """
        WITH x AS (
          SELECT label, unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) AS gs
          FROM embeddings
        ), cent AS (
          SELECT label, gs,
                 ROUND(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(27,12)))
                            AS DOUBLE) / COUNT(*), 6) AS c
          FROM x GROUP BY label, gs
        ), cvec AS (
          SELECT label, list(c ORDER BY gs) AS cv FROM cent GROUP BY label
        )
        SELECT a.label AS label_a, b.label AS label_b,
               ROUND(list_dot_product(a.cv, b.cv)
                     / (sqrt(list_dot_product(a.cv, a.cv))
                        * sqrt(list_dot_product(b.cv, b.cv))), 6) AS centroid_cosine
        FROM cvec a JOIN cvec b ON a.label <= b.label
    """,
    # recompute the decode→nearest-neighbor-resize kernel from the
    # synthesis parameters: pixel(x, y) = (doc_id·31 + y·w + x) mod 256,
    # resized cell (i, j) reads pixel (⌊i·h/16⌋, ⌊j·w/16⌋) — all
    # integer arithmetic, so equality proves the binary decode path
    "multimodal_image_resize": """
        WITH dims AS (
          SELECT doc_id,
                 8 + (doc_id % 5) * 4 AS w,
                 8 + (n_chars % 7) * 4 AS h
          FROM documents
        ),
        grid AS (
          SELECT i.range AS i, j.range AS j
          FROM range(16) i, range(16) j
        )
        SELECT doc_id,
               CAST(w AS BIGINT) AS orig_w,
               CAST(h AS BIGINT) AS orig_h,
               CAST(SUM((doc_id * 31 + ((i * h) // 16) * w + ((j * w) // 16)) % 256)
                    AS BIGINT) AS resized_sum
        FROM dims CROSS JOIN grid
        GROUP BY doc_id, w, h
    """,
    # same deterministic centroids (8 lowest ids), same per-element
    # decimal(27,12) quantization of each squared term, decimal sum
    # (order-independent), argmin on the ROUNDED distance with
    # centroid-id tiebreak — replays the Spark assignment bit-for-bit
    "vector_kmeans_assign": _V + """,
        c AS (
          SELECT vec_id AS cid, vec AS cvec FROM v ORDER BY vec_id LIMIT 8
        ),
        pairs AS (
          SELECT vv.vec_id, cc.cid,
                 ROUND(CAST(SUM(CAST(
                       (vv.vec[d.i] - cc.cvec[d.i])
                     * (vv.vec[d.i] - cc.cvec[d.i]) AS DECIMAL(27,12)))
                   AS DOUBLE), 6) AS dist2
          FROM v vv
          CROSS JOIN c cc
          CROSS JOIN (SELECT UNNEST(range(1, 65)) AS i) d
          GROUP BY vv.vec_id, cc.cid
        )
        SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, dist2
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
          FROM pairs
        ) WHERE rn = 1
    """,
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
    "curate_multimodal_corpus": r"""
        WITH norm AS (
          SELECT doc_id, text,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[.,!?;:''"()\[\]{}\-]', '', 'g'), '\s+', ' ', 'g')) AS ntext
          FROM documents
        ), tok AS (
          SELECT doc_id, text, string_split(ntext, ' ') AS toks FROM norm
        ),
        scored AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 ROUND(GREATEST(LEAST(
                   (CASE WHEN len(toks) >= 5 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END)
                   * (0.5 + 0.5 * (CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
                      - (CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}\-]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE))),
                   1.0), 0.0), 6) AS quality,
                 CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es) AND s_en >= 1 THEN 'en'
                      WHEN s_de >= GREATEST(s_fr, s_es) AND s_de >= 1 THEN 'de'
                      WHEN s_fr >= s_es AND s_fr >= 1 THEN 'fr'
                      WHEN s_es >= 1 THEN 'es'
                      ELSE 'und' END AS lang_pred
          FROM (
            SELECT *,
                   len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS s_en,
                   len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein'))) AS s_de,
                   len(list_filter(toks, t -> t IN ('le','la','les','et','est','un'))) AS s_fr,
                   len(list_filter(toks, t -> t IN ('el','la','los','y','es','un'))) AS s_es
            FROM tok
          )
        ),
        kv AS (
          SELECT s.doc_id, s.n_tokens, s.quality,
                 CAST(e.embedding AS DOUBLE[]) AS vec,
                 CAST(e.label AS BIGINT) AS label
          FROM scored s JOIN embeddings e ON e.vec_id = s.doc_id
          WHERE s.lang_pred = 'en' AND s.quality >= 0.5
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM kv a JOIN kv b ON a.doc_id < b.doc_id
          WHERE ROUND(list_dot_product(a.vec, b.vec)
                / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6) >= 0.45
        )
        SELECT doc_id, n_tokens, quality, label FROM kv
        WHERE doc_id NOT IN (SELECT id_b FROM pairs)
    """,
    "multimodal_wav_roundtrip": """
        SELECT doc_id,
               CAST(44 + 2 * (n_chars * 8) AS BIGINT) AS n_bytes,
               CAST(n_chars * 8 AS BIGINT) AS n_samples,
               ROUND((n_chars * 8) / 8000.0, 6) AS duration_s
        FROM documents
    """,
    "multimodal_frame_sample": """
        WITH media AS (
          SELECT doc_id AS media_id,
                 GREATEST(CAST(FLOOR(octet_length(encode(text)) / 1024) AS INT), 1) AS n_frames
          FROM documents
        )
        SELECT media_id, CAST(unnest(generate_series(0, n_frames - 1, 10)) AS BIGINT) AS frame_idx
        FROM media
    """,
    "vector_quantize_int8": """
        WITH x AS (
          SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val,
                 generate_subscripts(embedding, 1) AS gs
          FROM embeddings
        ), rng AS (
          SELECT gs, MIN(val) AS lo, MAX(val) AS hi FROM x GROUP BY gs
        )
        SELECT vec_id, CAST(x.gs - 1 AS BIGINT) AS dim,
               CAST(CASE WHEN hi > lo
                    THEN LEAST(255, GREATEST(0, FLOOR((val - lo) / (hi - lo) * 255)))
                    ELSE 0 END AS BIGINT) AS code
        FROM x JOIN rng USING (gs)
    """,
    "vector_label_centroids": """
        WITH x AS (
          SELECT label, unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) AS gs
          FROM embeddings
        )
        SELECT label, CAST(gs - 1 AS BIGINT) AS dim,
               ROUND(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(27,12)))
                          AS DOUBLE) / COUNT(*), 6) AS centroid,
               COUNT(*) AS n_vecs
        FROM x GROUP BY label, gs
    """,
    "vector_label_noise_screen": """
        WITH x AS (
          SELECT label, unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) AS gs
          FROM embeddings
        ), cent AS (
          SELECT label AS c_label, gs,
                 ROUND(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(27,12)))
                            AS DOUBLE) / COUNT(*), 6) AS c
          FROM x GROUP BY label, gs
        ), cvec AS (
          SELECT c_label, list(c ORDER BY gs) AS cv FROM cent GROUP BY c_label
        ), e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), cos AS (
          SELECT e.vec_id, e.label, c.c_label,
                 ROUND(list_dot_product(e.v, c.cv)
                       / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos
          FROM e CROSS JOIN cvec c
        )
        SELECT vec_id, label,
               MAX(CASE WHEN c_label = label THEN cos END) AS own_cos,
               MAX(CASE WHEN c_label <> label THEN cos END) AS best_other_cos,
               COALESCE(MAX(CASE WHEN c_label <> label THEN cos END)
                 > MAX(CASE WHEN c_label = label THEN cos END), FALSE) AS is_suspect
        FROM cos GROUP BY vec_id, label
    """,
}

# The structure="auto" near-dup variants route to the exact blocked
# GEMM path at these bulk thresholds (the tuner's candidate-fraction
# model puts banding at ~all-pairs there — asserted by
# tests/test_training_ops.py::test_multitable_structure_auto_selects_
# blocked_at_bulk_threshold), so their outputs are BIT-IDENTICAL to
# the brute-force twins and the same DuckDB oracles apply — upgrading
# both from rows-only to full hash-checked driver rows.
ORACLE_SQL["vector_ann_near_dup_lsh"] = ORACLE_SQL["vector_near_dup_pairs"]
ORACLE_SQL["curate_multimodal_corpus_lsh"] = ORACLE_SQL["curate_multimodal_corpus"]


def curate_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus with distributed
    k-means, then remove near-duplicates WITHIN each cluster only —
    the literature's answer to quadratic semantic dedup at corpus
    scale (the cluster id plays the IVF cell: candidate pairs are an
    equi-join on it, per-cluster work is (n/k)² instead of n²).

    Exactness split: every removed pair is verified with the exact
    sequential-fold cosine (precision 1 — nothing is dropped on a
    cluster assignment alone); recall is bounded by clustering (a true
    near-dup pair split across clusters survives — the SemDeDup trade,
    pytest-pinned against the exact all-pairs twin). Rows-only driver
    check (k-means has no SQL twin); deterministic end to end
    (lowest-id init, decimal M-step).

    Emits survivors: (vec_id, cluster, label) with the higher id of
    every within-cluster pair at cosine ≥ 0.45 removed."""
    emb = _emb(spark, sf_dir).persist()
    assigned, _cent, _inertia = SIM.kmeans_lloyd(emb, k=16, iters=5)
    v = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
        F.col("label").cast("long").alias("label"),
    ).join(
        assigned.select(F.col("id").alias("vec_id"), "cluster"), "vec_id"
    )
    a = v.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("cluster").alias("cl"),
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("cluster").alias("cl"),
    )
    pairs = (
        a.join(b, ["cl"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(SIM.cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cs"),
        )
        .filter(F.col("cs") >= 0.45)
    )
    removed = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return v.join(removed, "vec_id", "left_anti").select(
        "vec_id", F.col("cluster").cast("long").alias("cluster"), "label"
    )


QUERIES.update({"curate_semdedup": curate_semdedup})


def vector_ann_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality introspection — the recall dashboard a retrieval
    deployment ships beside its index: for each approximate method
    (auto-tuned multi-table LSH, auto-tuned IVF), per-query top-10
    compared against the exact brute-force top-10; emits one row per
    method with mean recall@10 and the top-1 hit rate. Rows-only
    driver check (the approximate sides are seeded); the exact twin is
    itself oracle-backed (vector_cosine_topk), and recall floors are
    pinned in tests. Scale: the compare is an equi-join on
    (query_id, neighbor_id) — O(k·queries) rows."""
    emb = _emb(spark, sf_dir).persist()
    qs = _queries_subset(emb)
    n_rows = _emb_rows(spark, sf_dir)
    exact = SIM.cosine_topk(emb, qs, k=10).select(
        "query_id", "neighbor_id", F.col("rank").alias("exact_rank")
    ).persist()
    methods = {
        "lsh_auto": SIM.ann_topk_lsh(emb, qs, k=10, n_rows=n_rows),
        "ivf_auto": SIM.ann_topk_ivf(
            emb, qs, k=10, n_cells=None, nprobe=None, n_rows=n_rows
        ),
    }
    reports = []
    for name, approx in methods.items():
        hits = exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        per_q = (
            exact.select("query_id").distinct()
            .join(
                hits.groupBy("query_id").agg(
                    F.count(F.lit(1)).alias("n_hit"),
                    F.sum(
                        (F.col("exact_rank") == 1).cast("long")
                    ).alias("top1_hit"),
                ),
                "query_id",
                "left",
            )
            .select(
                F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
                F.coalesce("top1_hit", F.lit(0)).alias("top1_hit"),
            )
        )
        reports.append(
            per_q.agg(
                F.lit(name).alias("method"),
                F.count(F.lit(1)).alias("n_queries"),
                F.round(F.avg(F.col("n_hit") / F.lit(10.0)), 6).alias(
                    "recall_at_10"
                ),
                F.round(F.avg(F.col("top1_hit").cast("double")), 6).alias(
                    "top1_hit_rate"
                ),
            )
        )
    out = reports[0].unionByName(reports[1])
    return out


QUERIES.update({"vector_ann_quality_report": vector_ann_quality_report})


# sign-bit words replayed straight off the stored floats; Hamming via
# xor + bit_count; rank ties on neighbor id only (never float cosine)
def _sign_word_sql(alias: str, word: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN {alias}.embedding[{word * 32 + b + 1}] > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(32)
    )
    return f"({terms})"


ORACLE_SQL["vector_sign_ann_topk"] = f"""
WITH e AS (
  SELECT vec_id, embedding, embedding::DOUBLE[] AS v FROM embeddings
),
sigs AS (
  SELECT vec_id, v,
         {_sign_word_sql('e', 0)} AS w0,
         {_sign_word_sql('e', 1)} AS w1
  FROM e
),
q AS (SELECT * FROM sigs WHERE vec_id % 40 = 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(c.w0, q.w0)) + bit_count(xor(c.w1, q.w1)) AS BIGINT)
           AS hamming,
         ROUND(list_inner_product(q.v, c.v)
               / (SQRT(list_inner_product(q.v, q.v))
                  * SQRT(list_inner_product(c.v, c.v))), 6) AS cosine_sim
  FROM sigs c, q
  WHERE q.vec_id <> c.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY hamming ASC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, hamming, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-vs-embedding near-dup RECONCILIATION: production pipelines
    run both content dedup (shingle Jaccard) and representation dedup
    (embedding cosine); this report full-outer-joins the two pair sets
    over the common id domain and aggregates per detection category
    (both / text_only / embedding_only) with each side's mean score —
    the diagnostic that tells a curator whether the two screens agree
    and which pairs only one modality can see. Fully oracle-composed
    from the two already-replayed pair generations."""
    from market_data_pipeline_databricks_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb_ids = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"))
    t = (
        DD.ngram_jaccard_pairs(docs, threshold=0.35)
        .select("id_a", "id_b", "jaccard")
        # the embeddings table can cover a prefix of the documents ids
        # (it does at sf0.1); compare only where both modalities exist
        .join(emb_ids.select(F.col("id").alias("id_a")), "id_a", "left_semi")
        .join(emb_ids.select(F.col("id").alias("id_b")), "id_b", "left_semi")
    )
    e = vector_near_dup_pairs(spark, sf_dir).select(
        "id_a", "id_b", "cosine_sim"
    )
    joined = t.join(e, ["id_a", "id_b"], "full_outer")
    cat = (
        F.when(
            F.col("jaccard").isNotNull() & F.col("cosine_sim").isNotNull(),
            "both",
        )
        .when(F.col("jaccard").isNotNull(), "text_only")
        .otherwise("embedding_only")
    )
    return (
        joined.select(cat.alias("category"), "jaccard", "cosine_sim")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(F.col("jaccard").cast("decimal(27,12)")).cast("double")
                / F.count("jaccard"),
                6,
            ).alias("avg_jaccard"),
            F.round(
                F.sum(F.col("cosine_sim").cast("decimal(27,12)")).cast("double")
                / F.count("cosine_sim"),
                6,
            ).alias("avg_cosine"),
        )
    )


QUERIES.update({"dedup_method_agreement": dedup_method_agreement})

ORACLE_SQL["dedup_method_agreement"] = r"""
WITH norm AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text),
              '[.,!?;:''"()\[\]{}\-]', '', 'g'), '\s+', ' ', 'g')) AS ntext
  FROM documents
), tok AS (
  SELECT doc_id, string_split(ntext, ' ') AS toks FROM norm
),
docs AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks)-2, 1) + 1),
           i -> array_to_string(toks[i:least(i+2, len(toks))], ' ')
         )) AS shingleset
  FROM tok
), sh AS (
  SELECT doc_id, unnest(shingleset) AS shingle FROM docs
),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.shingle IN (SELECT shingle FROM rare)
),
tpairs AS (
  SELECT id_a, id_b,
         ROUND(len(list_intersect(da.shingleset, db.shingleset))
               / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) AS jaccard
  FROM cand
  JOIN docs da ON da.doc_id = id_a
  JOIN docs db ON db.doc_id = id_b
  WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
        / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.35
    AND id_a IN (SELECT vec_id FROM embeddings)
    AND id_b IN (SELECT vec_id FROM embeddings)
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
epairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_dot_product(a.vec, b.vec)
               / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.vec, b.vec)
        / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 6) >= 0.4
),
joined AS (
  SELECT COALESCE(t.id_a, e.id_a) AS id_a, COALESCE(t.id_b, e.id_b) AS id_b,
         t.jaccard, e.cosine_sim
  FROM tpairs t FULL OUTER JOIN epairs e
    ON t.id_a = e.id_a AND t.id_b = e.id_b
)
SELECT CASE WHEN jaccard IS NOT NULL AND cosine_sim IS NOT NULL THEN 'both'
            WHEN jaccard IS NOT NULL THEN 'text_only'
            ELSE 'embedding_only' END AS category,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(jaccard AS DECIMAL(27,12))) AS DOUBLE)
             / COUNT(jaccard), 6) AS avg_jaccard,
       ROUND(CAST(SUM(CAST(cosine_sim AS DECIMAL(27,12))) AS DOUBLE)
             / COUNT(cosine_sim), 6) AS avg_cosine
FROM joined
GROUP BY 1
"""


# ONE definition of the aHash synthesis replay (dims -> grid -> cells
# -> tot -> sigs): three oracles build on it; a synthesis tweak edited
# in one copy but not another would make an oracle silently wrong.
_AHASH_SIGS = """
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         8 + (n_chars % 7) * 4 AS h
  FROM documents
),
grid AS (
  SELECT i.range AS i, j.range AS j FROM range(8) i, range(8) j
),
cells AS (
  SELECT doc_id, (i * 8 + j) AS k,
         (doc_id * 31 + ((i * h) // 8) * w + ((j * w) // 8)) % 256 AS px
  FROM dims CROSS JOIN grid
),
tot AS (SELECT doc_id, SUM(px) AS total FROM cells GROUP BY doc_id),
sigs AS (
  SELECT c.doc_id,
         CAST(SUM(CASE WHEN k < 32 AND px * 64 > total
                       THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS w0,
         CAST(SUM(CASE WHEN k >= 32 AND px * 64 > total
                       THEN (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS w1
  FROM cells c JOIN tot USING (doc_id)
  GROUP BY c.doc_id
)"""

ORACLE_SQL["multimodal_image_near_dup"] = _AHASH_SIGS + """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) AS BIGINT)
         AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 3
"""

ORACLE_SQL["multimodal_image_dedup_groups"] = _AHASH_SIGS + """,
groups AS (
  SELECT w0, w1, MIN(doc_id) AS id, COUNT(*) AS gsize
  FROM sigs GROUP BY w0, w1
),
cross_pairs AS (
  SELECT a.id AS rep_a, b.id AS rep_b,
         CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) AS BIGINT)
           AS hamming,
         CAST(a.gsize * b.gsize AS BIGINT) AS n_image_pairs
  FROM groups a JOIN groups b ON a.id < b.id
  WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 3
)
SELECT CAST(id AS BIGINT) AS rep_a, CAST(id AS BIGINT) AS rep_b,
       CAST(0 AS BIGINT) AS hamming,
       CAST(gsize * (gsize - 1) // 2 AS BIGINT) AS n_image_pairs
FROM groups WHERE gsize >= 2
UNION ALL
SELECT rep_a, rep_b, hamming, n_image_pairs FROM cross_pairs
"""

ORACLE_SQL["multimodal_image_dedup_incremental"] = _AHASH_SIGS + """,
pairs AS (
  SELECT b.doc_id AS bid,
         CAST(bit_count(xor(b.w0, c.w0)) + bit_count(xor(b.w1, c.w1)) AS BIGINT)
           AS h
  FROM sigs b JOIN sigs c
    ON b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
  WHERE bit_count(xor(b.w0, c.w0)) + bit_count(xor(b.w1, c.w1)) <= 3
),
agg AS (
  SELECT bid, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(h) AS BIGINT) AS mh
  FROM pairs GROUP BY bid
)
SELECT s.doc_id AS batch_id,
       COALESCE(a.n, 0) AS n_corpus_matches,
       a.mh AS min_hamming
FROM sigs s LEFT JOIN agg a ON s.doc_id = a.bid
WHERE s.doc_id % 10 = 0
"""

ORACLE_SQL["multimodal_audio_near_dup"] = """
WITH st AS (
  SELECT doc_id,
         CAST(n_chars * 8 AS BIGINT) AS n_samples,
         ((n_chars * 8 - 1) * 2 * (200 + (doc_id % 20) * 25)) // 8000 AS zc
  FROM documents
),
binned AS (
  SELECT doc_id, n_samples,
         200 + 25 * ((zc*8000 - 400*(n_samples-1) + 200*(50*(n_samples-1))
                      + 50*(n_samples-1) - 1) // (50*(n_samples-1)) - 200)
           AS freq_hz
  FROM st
)
SELECT CAST(freq_hz AS BIGINT) AS freq_hz,
       CAST(COUNT(*) AS BIGINT) AS n_clips,
       MIN(doc_id) AS rep_id,
       CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS n_dup_pairs,
       CAST(SUM(n_samples) AS BIGINT) AS sum_samples
FROM binned GROUP BY freq_hz
"""

ORACLE_SQL["vector_ann_ivf_fixed_topk"] = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
c AS (SELECT vec_id AS cid, vec AS cvec FROM v ORDER BY vec_id LIMIT 8),
d AS (SELECT UNNEST(range(1, 65)) AS i),
apairs AS (
  SELECT vv.vec_id, cc.cid,
         ROUND(CAST(SUM(CAST(
               (vv.vec[d.i] - cc.cvec[d.i])
             * (vv.vec[d.i] - cc.cvec[d.i]) AS DECIMAL(27,12)))
           AS DOUBLE), 6) AS dist2
  FROM v vv CROSS JOIN c cc CROSS JOIN d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY dist2, cid) AS rn
    FROM apairs
  ) WHERE rn = 1
),
qcells AS (
  SELECT vec_id AS qid, cid AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY dist2, cid) AS rn
    FROM apairs WHERE vec_id % 97 = 0
  ) WHERE rn <= 3
),
cand AS (
  SELECT q.qid, a.vec_id AS nid
  FROM qcells q JOIN assign a USING (cell)
  WHERE a.vec_id <> q.qid
),
dist AS (
  SELECT cand.qid, cand.nid,
         ROUND(CAST(SUM(CAST(
               (qv.vec[d.i] - nv.vec[d.i])
             * (qv.vec[d.i] - nv.vec[d.i]) AS DECIMAL(27,12)))
           AS DOUBLE), 6) AS dist2
  FROM cand
  JOIN v qv ON qv.vec_id = cand.qid
  JOIN v nv ON nv.vec_id = cand.nid
  CROSS JOIN d
  GROUP BY 1, 2
)
SELECT qid AS query_id, nid AS neighbor_id, dist2,
       CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY dist2, nid) AS rn
  FROM dist
) WHERE rn <= 5
"""

ORACLE_SQL["vector_ann_pq_fixed_topk"] = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
cb AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, vec
  FROM (SELECT vec_id, vec FROM v ORDER BY vec_id LIMIT 16)
),
sub AS (SELECT UNNEST(range(0, 8)) AS s),
dim AS (SELECT UNNEST(range(1, 9)) AS i),
encdist AS (
  SELECT vv.vec_id, sub.s, cb.cid,
         CAST(SUM(CAST(
               (vv.vec[sub.s * 8 + dim.i] - cb.vec[sub.s * 8 + dim.i])
             * (vv.vec[sub.s * 8 + dim.i] - cb.vec[sub.s * 8 + dim.i])
           AS DECIMAL(27,12))) AS DECIMAL(38,12)) AS dd
  FROM v vv CROSS JOIN sub CROSS JOIN cb CROSS JOIN dim
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, s, cid AS code FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id, s
      ORDER BY ROUND(CAST(dd AS DOUBLE), 6), cid) AS rn
    FROM encdist
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS qid, s, cid AS code, dd AS dq
  FROM encdist WHERE vec_id % 97 = 0
),
adc AS (
  SELECT l.qid, c.vec_id AS nid,
         ROUND(CAST(SUM(l.dq) AS DOUBLE), 6) AS adc_dist2
  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
  WHERE c.vec_id <> l.qid
  GROUP BY 1, 2
)
SELECT qid AS query_id, nid AS neighbor_id, adc_dist2,
       CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY adc_dist2, nid) AS rn
  FROM adc
) WHERE rn <= 5
"""
