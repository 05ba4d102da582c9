"""Text-analysis and dedup queries over the ``documents`` table.

The SQL-expressible ops carry DuckDB oracle twins built on the exact
same normalization (lower → strip punct → collapse whitespace → trim)
so md5 fingerprints, token counts and Jaccard values hash-match across
engines. MinHash/SimHash use engine-side 64-bit hashing with no
portable SQL equivalent → rows-only checks (no ORACLE_SQL entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from market_data_pipeline_databricks_spark.operators import dedup as DD
from market_data_pipeline_databricks_spark.operators import text as TX


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # conditional spread: single-file corpora otherwise run every text
    # op's first stage on ONE core (measured r10: six heavy doc
    # headliners 28.9 s -> 23.2 s; chunking 3x) — see plans/_spread.py
    from market_data_pipeline_databricks_spark.plans._spread import (
        spread_to_parallelism,
    )

    path = f"{sf_dir}/documents.parquet"
    return spread_to_parallelism(spark.read.parquet(path), cache_key=path)


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats block: chars, tokens, punctuation, stopwords,
    quality score — via the bulk projection that normalizes/tokenizes
    once (operators/text.py:with_text_stats)."""
    return TX.with_text_stats(_docs(spark, sf_dir)).select(
        "doc_id", "n_chars_computed", "n_tokens", "n_punct", "n_stopwords", "quality"
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword-vote language ID per document."""
    return TX.with_text_stats(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: md5 fingerprint of normalized text → keeper
    id + group size (covers every doc, so the hash compare exercises
    normalization + md5 parity on all rows)."""
    return DD.exact_duplicates(_docs(spark, sf_dir))


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor set after exact dedup (min doc_id per fingerprint)."""
    return DD.exact_dedup(_docs(spark, sf_dir)).select("doc_id", "n_chars")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs with rare-shingle
    blocking — the oracle-checkable dedup path."""
    return DD.ngram_jaccard_pairs(_docs(spark, sf_dir))


def dedup_minhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (64 hashes, 16 bands × 4 rows) in the
    oracle-replayable portable-hash form: the DuckDB oracle recomputes
    every min-hash, band bucket, skew-guard drop and estimate — the
    driver hash check pins the LSH algorithm itself (upgraded from a
    rows-only xxhash64 form in round 7; the xxhash64 form remains as
    DD.minhash_near_duplicates for engine-internal use and stays
    cross-validated against dedup_ngram_jaccard in
    tests/test_training_ops.py)."""
    return DD.minhash_near_duplicates_portable(_docs(spark, sf_dir), threshold=0.35)


def dedup_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3, in the
    oracle-replayable 60-bit portable-hash form (md5-derived token
    hashes the DuckDB oracle reproduces bit-for-bit; banding recall is
    exactly 1 by pigeonhole — 4 disjoint bands, ≤3 differing bits —
    so the oracle's all-pairs Hamming filter is structurally equal to
    the banded plan). Note: these synthetic docs have 6-31 distinct
    tokens, so SimHash is inherently noisier here than on web-scale
    text — the tight radius compensates."""
    return DD.simhash_near_duplicates_portable(_docs(spark, sf_dir), max_hamming=3)


def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-token counting (GPT-2 regex classes) — the standard
    cheap LLM-token proxy; JVM-side regexp_extract_all."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_ws_tokens"),
        TX.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def sample_perplexity_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity-bucketed corpus sampling (Wenzek et al.
    2020): score every document with the Kneser-Ney bigram LM, split
    the corpus into head/middle/tail terciles by EXACT interpolated
    quantile boundaries (broadcast 1-row — the scale-safe global
    NTILE, same pattern as the LTV deciles), and keep buckets at
    decreasing rates (head 100%, middle 50%, tail 10%) via the
    portable-hash deterministic sampler — so the DuckDB oracle replays
    the scoring, the cut points AND every keep/drop decision.
    Boundary determinism: interpolated cut points either equal a data
    value exactly or lie strictly between two rounded-6 scores, so the
    strict ``>`` bucketing cannot flip on last-ulp differences."""
    from pyspark import StorageLevel

    scored = (
        text_kneser_ney_bigram(spark, sf_dir)
        .select("doc_id", "avg_neg_logprob_kn")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bounds = scored.agg(
        F.expr(
            "percentile(avg_neg_logprob_kn, array(0.3333D, 0.6667D))"
        ).alias("b")
    )
    score = F.col("avg_neg_logprob_kn")
    b1 = F.element_at(F.col("b"), 1)
    b2 = F.element_at(F.col("b"), 2)
    bucket = (
        F.when(score > b2, "tail")
        .when(score > b1, "middle")
        .otherwise("head")
    )
    rate = F.when(score > b2, 100).when(score > b1, 500).otherwise(1000)
    keep = (
        TX.portable_hash60(
            F.concat(F.lit("ppl:"), F.col("doc_id").cast("string"))
        )
        % 1000
        < rate
    )
    return (
        scored.crossJoin(F.broadcast(bounds))
        .filter(keep)
        .select("doc_id", bucket.alias("ppl_bucket"), "avg_neg_logprob_kn")
    )


def sample_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture token-budget allocator: split a global token
    budget (50% of corpus tokens) across sources by sqrt-smoothed
    share (the standard multilingual temperature T=2 reweighting),
    with a 2-epoch per-source cap — the planning step that turns
    per-source token counts into an actual sampling plan.

    Everything after the per-source token count is INTEGER arithmetic:
    weights are floor(sqrt(tokens)·1e6) (IEEE sqrt is correctly
    rounded, so both engines floor the same double), base allocations
    are floor(B·w/W) in BIGINT, and the leftover L = B − Σbase tokens
    (< n_sources) goes to the L largest remainders (B·w mod W), ties
    by source id — the largest-remainder method, so Σ alloc == B
    EXACTLY before capping and the oracle hash-matches bit-for-bit.

    Scale: one groupBy(source) over the corpus; everything downstream
    operates on the per-source aggregate (20 rows here; thousands of
    domains at 100 TB — still driver-trivial, and the windows below
    sit on that aggregate)."""
    docs = _docs(spark, sf_dir)
    per_source = (
        docs.select("source", TX.token_count(F.col("text")).alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    # single-partition window: bounded — one row per source
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1e6).cast("long")
    weighted = per_source.select(
        "source",
        "n_tokens",
        w.alias("w"),
        F.sum(w).over(wall).alias("w_total"),
        F.sum("n_tokens").over(wall).cast("long").alias("total_tokens"),
    ).withColumn("budget", F.expr("total_tokens div 2"))
    # budget·w through decimal(38,0): the BIGINT product overflows at
    # ~1e9 corpus tokens (budget ~5e8 × w ~3.2e10 > 2^63) — far below
    # the advertised scale. The oracle mirrors with HUGEINT. div/% on
    # the wide product land back in BIGINT (base_alloc ≤ budget).
    alloc = weighted.withColumn(
        "prod", F.col("budget").cast("decimal(38,0)") * F.col("w")
    ).select(
        "source",
        "n_tokens",
        "w",
        "budget",
        F.expr("CAST(prod div w_total AS BIGINT)").alias("base_alloc"),
        F.expr("CAST(prod % w_total AS BIGINT)").alias("rem"),
    )
    # single-partition window: bounded — one row per source
    wrem = Window.orderBy(F.desc("rem"), F.asc("source"))
    # single-partition window: bounded — one row per source
    wsum = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    topped = alloc.withColumn("rem_rank", F.row_number().over(wrem)).withColumn(
        "leftover", F.col("budget") - F.sum("base_alloc").over(wsum)
    )
    final = topped.select(
        "source",
        "n_tokens",
        (
            F.col("base_alloc")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        ).alias("uncapped_alloc"),
    ).select(
        "source",
        "n_tokens",
        "uncapped_alloc",
        F.least(F.col("uncapped_alloc"), F.col("n_tokens") * 2).alias(
            "alloc_tokens"
        ),
        (F.col("uncapped_alloc") > F.col("n_tokens") * 2).alias("capped"),
    )
    return final.select(
        "source",
        "n_tokens",
        "alloc_tokens",
        "capped",
        F.round(
            F.col("alloc_tokens").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("epochs"),
    )


def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride sliding-window chunking (window 200 chars, stride
    150 → 50-char overlap) over normalized text — the RAG/pretraining
    windowing primitive and the fixed-grid complement of the
    content-defined (CDC) chunker: same normalized stream, but
    boundaries at arithmetic positions instead of content-defined
    hash cuts, so insertions SHIFT downstream windows (exactly the
    failure mode CDC exists to avoid — shipping both makes the
    trade-off measurable). Emits (doc_id, chunk_idx, chunk_start,
    chunk_len, chunk_fp md5) — every column a pure function of the
    stored text, replayed by the oracle.

    Scale: zero shuffles — sequence + posexplode + substr pipelined
    with the scan; output rows ≈ chars/stride."""
    docs = _docs(spark, sf_dir)
    window, stride = 200, 150
    norm = docs.select(
        "doc_id", TX.normalize_text(F.col("text")).alias("__nt__")
    )
    t = F.col("__nt__")
    starts = F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1)), F.lit(stride))
    g = norm.select("doc_id", t.alias("nt"), F.posexplode(starts).alias("idx", "s"))
    chunk = F.col("nt").substr(F.col("s"), F.lit(window))
    return g.select(
        "doc_id",
        F.col("idx").cast("long").alias("chunk_idx"),
        F.col("s").cast("long").alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_fp"),
    )


def text_cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair that
    shares at least one word 5-gram, the count of shared DISTINCT
    shingles and both directional containments (shared/|a|, shared/|b|)
    — the train/test-leakage dashboard generalized to all source pairs
    (the per-document decontamination screens flag individual docs;
    this reports WHICH corpora leak into which, the first question a
    data-mixture owner asks).

    Scale: per-source shingle sets collapse FIRST (distinct on
    (source, shingle) — one shuffle, linear in corpus), so the
    self-join on the shingle key fans out at most C(n_sources, 2) rows
    per distinct shingle — bounded per shingle, linear overall; totals
    are a tiny aggregate broadcast back onto the pair rows."""
    docs = _docs(spark, sf_dir)
    # join on the portable 60-bit shingle hash, not the string: the
    # shuffle/join payload drops to 8-byte keys (measured 3.7x -> 1.3x
    # per 10x at the sf1.0 rehearsal; md5 adds ~1.4 s constant at sf0.1) and the DuckDB oracle replays
    # the exact same md5-derived hash, so counts stay bit-identical
    # (60-bit collisions would hit both engines identically)
    sh = docs.select(
        "source",
        F.explode(F.array_distinct(TX.shingles(F.col("text"), k=5))).alias(
            "shingle"
        ),
    ).select("source", TX.portable_hash60(F.col("shingle")).alias("h")).distinct()
    from market_data_pipeline_databricks_spark.caching import persist_tracked

    # three consumers (totals + both self-join sides) — persist so the
    # shingle explode + md5 run once (plan audit: 8 scans → 2);
    # tracked: outlives the call, caching.release_tracked() frees it
    sh = persist_tracked(sh)
    totals = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_shingles"))
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n_shingles").alias("n_a")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("n_shingles").alias("n_b")
    )
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_shingles",
            F.round(
                F.col("n_shared_shingles") / F.col("n_a").cast("double"), 6
            ).alias("containment_in_a"),
            F.round(
                F.col("n_shared_shingles") / F.col("n_b").cast("double"), 6
            ).alias("containment_in_b"),
        )
    )


def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by predicted language: mean chars-per-BPE-
    token and BPE-tokens-per-word — the standard report for how
    efficiently a (BPE-ish) tokenizer encodes each language slice of a
    corpus (high fertility = wasted context window for that language).
    One narrow projection per doc + one aggregate; decimal-exact means
    so the DuckDB oracle reproduces the doubles bit-for-bit."""
    docs = _docs(spark, sf_dir)
    per_doc = docs.select(
        TX.lang_id(F.col("text")).alias("lang_pred"),
        F.length(F.col("text")).cast("long").alias("n_chars_raw"),
        TX.token_count(F.col("text")).alias("n_ws_tokens"),
        TX.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    ).filter(F.col("n_bpe_tokens") > 0)
    return per_doc.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.round(
            F.sum(F.col("n_chars_raw").cast("decimal(27,12)")).cast("double")
            / F.sum("n_bpe_tokens").cast("double"),
            6,
        ).alias("chars_per_bpe_token"),
        F.round(
            F.sum(F.col("n_bpe_tokens").cast("decimal(27,12)")).cast("double")
            / F.sum("n_ws_tokens").cast("double"),
            6,
        ).alias("bpe_tokens_per_word"),
    )


def dedup_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprint overlap: pairs of documents
    sharing ≥ 5 selected k-gram window minima — catches substring-level
    plagiarism/copy that whole-doc hashing misses. Portable-hash form
    (round 7): the DuckDB oracle replays the k-gram hashing and the
    window-minimum selection itself, so the driver hash check pins the
    winnowing algorithm; behavior additionally verified in tests
    against controlled mutations."""
    from pyspark import StorageLevel

    docs = _docs(spark, sf_dir)
    # three consumers (per-doc counts + both sides of the self-join)
    # — persisted so the normalize→k-gram-explode→hash→window chain
    # runs once, not three times (the multi-consumer persist pattern;
    # the distinct (id, fp) frame is tiny next to the exploded stream)
    fp = TX.winnow_fingerprints(
        docs, id_col="doc_id", text_col="text", k=12, window=25, portable=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts = fp.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ca = counts.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_a"))
    cb = counts.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_b"))
    return (
        shared.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .withColumn(
            "overlap", F.col("n_shared") / F.least("n_a", "n_b")
        )
        # fractional overlap for robustness + absolute floor so 2-
        # fingerprint docs can't qualify on a single generic collision
        .filter((F.col("overlap") >= 0.5) & (F.col("n_shared") >= 3))
        .select("id_a", "id_b", "n_shared")
    )


def _curated_survivors(
    spark: SparkSession, sf_dir: str, near_dup: str = "exact"
) -> DataFrame:
    """Shared curation chain: language filter (en) → quality filter
    (score ≥ 0.5) → exact dedup (min doc_id per fingerprint) →
    near-dup removal (3-gram Jaccard ≥ 0.5, keep the lower id).
    Returns the surviving documents with text attached so downstream
    capstones (chunking) can keep composing.

    ``near_dup`` picks the pair-generation stage:
    - "exact": rare-shingle-blocked exact Jaccard — oracle-checkable
      (DuckDB replays it), used by the driver-checked capstones.
    - "lsh": banded MinHash candidates + exact-Jaccard verification
      (operators/dedup.py:minhash_verified_near_duplicates) — the
      100-TB path; no shingle-DF pass, candidates from band-key
      equi-joins. Keep-set equality with "exact" is asserted in
      tests/test_training_ops.py (pairs here are J ≥ 0.95, where the
      16×4 banding miss probability is < 1e-10 per pair)."""
    from pyspark.sql import Window

    enr = TX.with_text_stats(_docs(spark, sf_dir)).select(
        "doc_id",
        "text",
        "lang_pred",
        "quality",
        F.col("fingerprint").alias("fp"),
        "n_tokens",
    )
    kept = enr.filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
    w = Window.partitionBy("fp").orderBy("doc_id")
    # persisted at the fan-out: `exact` feeds BOTH the near-dup pair
    # generation (whose own persisted shingle/signature frame builds on
    # it) and the final anti-join — without persistence the
    # stats-block+window chain re-executes per consumer (same
    # multi-consumer pattern as the dedup operators; see PLANS.md)
    from pyspark import StorageLevel

    exact = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if near_dup == "lsh":
        # portable affine family: the DuckDB curate-LSH oracle replays
        # the banding itself (round-7 rows-only→oracle upgrade)
        pairs = DD.minhash_verified_near_duplicates(
            exact, threshold=0.5, portable=True
        )
    else:
        pairs = DD.ngram_jaccard_pairs(exact, threshold=0.5)
    removed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return exact.join(removed, "doc_id", "left_anti")


def curate_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation, the capstone composition:
    language filter (en) → quality filter (score ≥ 0.5) → exact dedup
    (min doc_id per fingerprint) → near-dup removal (exact 3-gram
    Jaccard ≥ 0.5, keep the lower id) → surviving corpus. Every stage
    is an operator from this package; the whole chain has a full
    DuckDB oracle."""
    return _curated_survivors(spark, sf_dir).select("doc_id", "n_tokens", "quality")


def curate_chunk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone #3 — the full document-prep path a pretraining run
    executes: curation survivors (language → quality → exact dedup →
    near-dup removal) cut into overlapping 32-token context windows.
    Row-level oracle over every produced chunk; the chunking stage
    adds zero shuffle on top of the curation chain."""
    surv = _curated_survivors(spark, sf_dir).select("doc_id", "text")
    return TX.chunk_tokens(surv, chunk_size=32, stride=24)


def curate_chunk_corpus_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curate→chunk capstone with the near-dup stage swapped to
    banded MinHash + exact-Jaccard verification — the runnable 100-TB
    curation path (no rare-shingle document-frequency pass; candidate
    pairs from band-key equi-joins). Oracle-backed since round 7: the
    portable affine MinHash family lets the DuckDB oracle replay the
    banding, skew guard and verification stages of the whole curation
    chain; keep-set equality with ``curate_chunk_corpus`` additionally
    asserted in tests/test_training_ops.py."""
    surv = _curated_survivors(spark, sf_dir, near_dup="lsh").select("doc_id", "text")
    return TX.chunk_tokens(surv, chunk_size=32, stride=24)


def dedup_cdc_repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated passages via content-defined chunking
    (the alignment-free complement to whole-doc and shingle dedup):
    chunks whose md5 fingerprint appears in ≥2 documents, with
    occurrence counts — the Lee-et-al-style "repeated span" report
    that catches copied boilerplate at arbitrary offsets. Chunk
    boundaries are portable_hash60-defined, so the DuckDB oracle
    replays boundary selection, chunk assembly and fingerprints.
    Chunks shorter than 20 chars are excluded from the report (their
    duplication is not evidence of copying)."""
    ch = TX.cdc_chunks(_docs(spark, sf_dir), k=12, divisor=64)
    return (
        ch.filter(F.length("chunk_text") >= 20)
        .groupBy("chunk_fp")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.length("chunk_text")).cast("long").alias("chunk_len"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def dedup_cdc_duplicate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-passage coverage: the fraction of a
    document's normalized chars that sit inside CDC chunks duplicated
    in OTHER documents — the per-doc curation signal built on
    dedup_cdc_repeated_chunks (a doc that is 80% shared passages is a
    near-dup even if no single whole-doc fingerprint matches). Only
    docs with ≥1 duplicated chunk are emitted (the interesting rows;
    clean docs would add |corpus| zero rows)."""
    ch = TX.cdc_chunks(_docs(spark, sf_dir), k=12, divisor=64).select(
        "id", "chunk_fp", F.length("chunk_text").alias("clen")
    )
    dup_fps = (
        ch.groupBy("chunk_fp")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chunk_fp")
    )
    flagged = ch.join(dup_fps, "chunk_fp", "left_semi")
    per_doc = ch.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("clen").cast("long").alias("n_chars_norm"),
    )
    dup_doc = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_dup_chunks"),
        F.sum("clen").cast("long").alias("n_dup_chars"),
    )
    return (
        per_doc.join(dup_doc, "id")
        .select(
            F.col("id").alias("doc_id"),
            "n_chunks",
            "n_dup_chunks",
            F.round(
                F.col("n_dup_chars") / F.col("n_chars_norm").cast("double"), 6
            ).alias("dup_char_coverage"),
        )
    )


def dedup_cdc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL duplicated passages: adjacent corpus-duplicated CDC
    chunks merged into contiguous spans per document (the classic
    gaps-and-islands shape: chunk_idx − ROW_NUMBER() is constant
    within a run), emitting char offsets — the actionable form of the
    repeated-passage signal (what you would actually cut out of a
    training document, à la Lee et al.'s span removal). Spans shorter
    than 40 chars are dropped. Fully oracle-replayed, islands and all."""
    ch = TX.cdc_chunks(_docs(spark, sf_dir), k=12, divisor=64).select(
        "id", "chunk_idx", "chunk_start", "chunk_fp",
        F.length("chunk_text").alias("clen"),
    )
    dup_fps = (
        ch.groupBy("chunk_fp")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chunk_fp")
    )
    flagged = ch.join(dup_fps, "chunk_fp", "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("chunk_idx")
    runs = flagged.withColumn(
        "island", F.col("chunk_idx") - F.row_number().over(w)
    )
    return (
        runs.groupBy("id", "island")
        .agg(
            F.min("chunk_start").alias("span_start"),
            (F.max(F.col("chunk_start") + F.col("clen")) - F.min("chunk_start"))
            .cast("long")
            .alias("span_len"),
            F.count(F.lit(1)).alias("n_chunks_in_span"),
        )
        .filter(F.col("span_len") >= 40)
        .select(
            F.col("id").alias("doc_id"),
            F.col("span_start").cast("long").alias("span_start"),
            "span_len",
            "n_chunks_in_span",
        )
    )


def dedup_cdc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDC dedup — the daily-crawl shape for passage-level
    duplication: the new batch's (doc_id % 5 == 0) chunk fingerprints
    probe the existing corpus's chunk index (doc_id % 5 != 0); emitted
    per batch doc: how much of it already exists in the corpus as
    copied passages. Corpus cost is the one-time chunk index (in
    production maintained incrementally); the per-batch cost is
    O(batch chunks) + one semi-join on the 16-byte fingerprint — no
    batch×batch or corpus×corpus term. Fully oracle-replayed."""
    ch = TX.cdc_chunks(_docs(spark, sf_dir), k=12, divisor=64).select(
        "id", "chunk_fp", F.length("chunk_text").alias("clen")
    )
    batch = ch.filter(F.col("id") % 5 == 0)
    corpus_fps = ch.filter(F.col("id") % 5 != 0).select("chunk_fp").distinct()
    hit = batch.join(corpus_fps, "chunk_fp", "left_semi")
    per_doc = batch.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("clen").cast("long").alias("n_chars_norm"),
    )
    hit_doc = hit.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_corpus_dup_chunks"),
        F.sum("clen").cast("long").alias("n_dup_chars"),
    )
    return per_doc.join(hit_doc, "id").select(
        F.col("id").alias("batch_id"),
        "n_chunks",
        "n_corpus_dup_chunks",
        F.round(
            F.col("n_dup_chars") / F.col("n_chars_norm").cast("double"), 6
        ).alias("corpus_dup_coverage"),
    )


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact-Jaccard near-dup graph
    (threshold 0.35): (doc_id, component) with component = min id in
    the cluster — the transitive-closure dedup decision. Oracle: DuckDB
    recursive-CTE reachability computes the same components."""
    pairs = DD.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.35)
    return DD.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").cast("long").alias("component")
    )


def dedup_components_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering on the 100-TB path: banded-MinHash
    candidates (portable affine family) → exact-Jaccard verification
    (threshold 0.35) → large-star/small-star connected components —
    the composition a web-scale dedup actually runs (no rare-shingle
    document-frequency pass anywhere). Fully oracle-replayed: DuckDB
    reproduces the banding, the skew guard, the exact verification and
    the transitive closure (recursive CTE). The exact-blocking sibling
    is ``dedup_components``; on this corpus both blockings have recall
    1 so the cluster sets coincide, but neither result is defined in
    terms of the other — each oracle replays its own pair generation."""
    pairs = DD.minhash_verified_near_duplicates(
        _docs(spark, sf_dir), threshold=0.35, portable=True
    ).select("id_a", "id_b")
    return DD.connected_components(pairs).select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


def dedup_component_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION the component pass exists for: one survivor
    (the min id) per near-dup cluster, everything else dropped — pairs
    → connected components → anti-join. Chain-safe where per-pair
    keep-lower-id is not (A~B~C must yield exactly one survivor even
    though A~C may be below threshold). Completes the pairs →
    components → survivors story as a single runnable query."""
    pairs = DD.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.35)
    comp = DD.connected_components(pairs)
    removed = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return (
        _docs(spark, sf_dir)
        .join(removed, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
    )


def dedup_representative_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality-based survivor selection: per near-dup cluster keep
    the doc with the most within-threshold neighbors (degree
    centrality; ties → min id) instead of the arbitrary min id — the
    curation rule that keeps the most CANONICAL variant of a
    duplicated document (the hub the others are near-copies of),
    which matters when near-dup variants differ in truncation or
    boilerplate. Singleton docs survive untouched.

    Scale: degree is one count-aggregate over the symmetric pair list
    (O(pairs)); the per-component argmax is a size-2 window over
    O(duplicated docs) rows. Nothing touches the full corpus except
    the final survivor anti-join. PageRank (operators/graph.py) is the
    richer centrality when clusters are large enough for degree ties —
    swap it in for the window's ordering key; degree keeps this query
    recursive-CTE-oracle-checkable end-to-end."""
    # three consumers (both sym directions + the components loop) —
    # checkpoint the pair list once or the blocked jaccard join runs
    # three times (measured 25 s → 12 s at sf0.1)
    pairs = DD.ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.35
        # lazy (r15): the components loop's first count materializes it
    ).localCheckpoint(eager=False)
    sym = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    degree = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    comp = DD.connected_components(pairs)
    w = Window.partitionBy("component").orderBy(
        F.desc("deg"), F.asc("node")
    )
    rep = (
        comp.join(degree, comp.node == degree.u)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    removed = comp.join(
        rep.select(F.col("node").alias("rep_node"), "component"),
        "component",
    ).filter(F.col("node") != F.col("rep_node")).select(
        F.col("node").alias("doc_id")
    )
    return (
        _docs(spark, sf_dir)
        .join(removed, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
    )


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word 5-gram with the held-out eval set (GPT-3-style n-gram overlap
    filtering, scaled to these short synthetic docs — production uses
    8-13-grams). Eval membership is content-deterministic
    (doc_id % 10 == 7) so both engines agree on the split.

    Scale shape: the eval/benchmark set is small by construction, so its
    distinct shingles BROADCAST to every executor — the 100-TB training
    side is filtered by a broadcast hash join with no shuffle; the only
    exchange is the final per-doc aggregation of matches. At 100 TB this
    is the canonical decontamination plan (eval n-gram set ≪ memory)."""
    docs = _docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.shingles(F.col("text"), k=5))).alias(
            "shingle"
        ),
    )
    is_eval = F.col("doc_id") % 10 == 7
    ev = sh.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "shingle")
    hits = sh.filter(~is_eval).join(F.broadcast(ev), "shingle")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_shared_shingles"),
        F.countDistinct("eval_id").alias("n_eval_docs"),
    )


def text_exact_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination, the strict companion to the
    5-gram-overlap screen: flag training documents whose normalized
    text CONTAINS an eval document's leading 8-token phrase verbatim
    (the "did the benchmark leak in whole?" check; n-gram overlap
    additionally catches paraphrase-level leaks). Same deterministic
    eval split (doc_id % 10 == 7).

    Scale: the phrase set is |eval docs| rows and broadcasts; the
    contains() probe compiles to a BroadcastNestedLoopJoin — O(train ×
    eval_phrases) substring tests with NO shuffle of the training
    side, acceptable exactly because the eval set is small and the
    probe is a cheap JVM substring search. (A shuffle-free broadcast
    scan beats building a suffix index until the phrase set stops
    fitting in memory.)"""
    base = _docs(spark, sf_dir).select(
        "doc_id", TX.normalize_text(F.col("text")).alias("ntext")
    )
    is_eval = F.col("doc_id") % 10 == 7
    toks = F.split(F.col("ntext"), " ")
    ev = (
        base.filter(is_eval)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.concat_ws(" ", F.slice(toks, 1, 8)).alias("phrase"),
            F.size(toks).alias("n_toks"),
        )
        .filter(F.col("n_toks") >= 8)
        .drop("n_toks")
    )
    hits = base.filter(~is_eval).join(
        F.broadcast(ev), F.expr("contains(ntext, phrase)")
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_eval_phrases"),
        F.min("eval_id").alias("first_eval_id"),
    )


def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals: distinct-token
    ratio and the fraction held by the single most frequent token.

    Computed with higher-order Column functions over the token array —
    O(distinct × tokens) per row, zero shuffle, pipelines with the scan.
    (The explode→groupBy formulation is exact too but shuffles one row
    per TOKEN — at 100 TB that is a ~200× row blowup through the
    exchange; the per-row HOF form never leaves the scan stage.)"""
    c = F.col("text")
    toks = TX.tokens(c)
    n = F.size(toks).cast("double")
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda t: t == d)),
        )
    ).cast("double")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n, 6).alias("distinct_ratio"),
        F.round(top_cnt / n, 6).alias("top_token_frac"),
    )


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM quality proxy (CCNet-style filtering, unigram
    stand-in for the KenLM score): mean negative log-probability of each
    document's tokens under the corpus's own unigram distribution —
    high values mark outlier/gibberish documents.

    Two-pass plan: (1) one shuffle builds the unigram vocab with counts;
    (2) the vocab (≪ corpus, ~10M rows at web scale) broadcasts back
    onto the exploded token stream, then one shuffle aggregates per doc.
    The corpus total is an unpartitioned window over the VOCAB — bounded
    by vocab size, not corpus size, and it keeps the plan to a single
    scan of the exploded tokens (a separate total aggregate would
    re-scan and re-aggregate the whole token stream)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # single-partition window: bounded — token vocab rows (Heaps-law
    # sublinear in corpus; a broadcast global agg is the rewrite if the
    # vocab ever outgrows one task)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    logp = vocab.select(
        "token",
        F.log(F.col("cnt") / F.sum(F.col("cnt").cast("double")).over(wall)).alias(
            "logp"
        ),
    )
    return (
        tok.join(F.broadcast(logp), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum((-F.col("logp")).cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


def text_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus dashboard: doc count, token volume, mean
    quality, English share — the rollup a mixture designer reads before
    setting domain weights (see sample_domain_mixture). One scan +
    one aggregation on the source key."""
    enr = TX.with_text_stats(_docs(spark, sf_dir))
    return enr.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.sum(F.col("quality").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_quality"),
        F.sum((F.col("lang_pred") == "en").cast("long")).alias("n_en"),
    )


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing at a 128-token budget, sharded
    by source (see operators/sampling.py:pack_sequences for the scale
    rationale — per-shard cumsum, never a global sort)."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        pack_sequences,
    )

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", TX.token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(
        docs, id_col="doc_id", token_col="n_tokens", budget=128, shard_col="source"
    )


def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture downsampling: each source keeps a deterministic
    fraction (1 / 0.5 / 0.25 / 0.125 by source index mod 4 — the shape
    of an upweight-code/downweight-web mixture recipe). One pass, no
    filter-then-recount: per-source totals and kept counts in a single
    aggregation."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        weighted_sample_flag,
    )

    docs = _docs(spark, sf_dir)
    idx = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(idx % 4 == 0, 1.0)
        .when(idx % 4 == 1, 0.5)
        .when(idx % 4 == 2, 0.25)
        .otherwise(0.125)
    )
    kept = weighted_sample_flag(F.col("doc_id"), rate, seed="mix")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept.cast("long")).alias("n_sampled"),
    )


def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture resampling (T=2, √-scaling — the
    standard multilingual/domain rebalancing recipe: target share of
    source s ∝ n_s^(1/T), which upweights small sources relative to
    their natural share without letting any source dominate).

    Per-source keep rates derive from the O(sources) count table
    (weights decimal-cast before the window sum so the normalizing
    total is order-exact; max-rate normalization keeps the largest
    rate at 1.0 so no source oversamples), then one content-addressed
    hash filter over the corpus — same md5 discipline as every sampler
    here, so the whole chain is engine-portable and oracle-checked."""
    from pyspark.sql import Window

    from market_data_pipeline_databricks_spark.operators.sampling import (
        weighted_sample_flag,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    # single-partition window: bounded — one row per document source
    wg = Window.partitionBy()
    shares = counts.withColumn(
        "w_dec", F.sqrt(F.col("n_total").cast("double")).cast("decimal(27,12)")
    ).withColumn(
        "target_share",
        F.col("w_dec").cast("double") / F.sum("w_dec").over(wg).cast("double"),
    )
    ratio = F.col("target_share") / F.col("n_total")
    rates = shares.withColumn(
        "rate", ratio / F.max(ratio).over(wg)
    ).select("source", "n_total", "target_share", "rate")
    flag = weighted_sample_flag(F.col("doc_id"), F.col("rate"), seed="temp")
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.max("n_total").alias("n_total"),
            F.round(F.max("target_share"), 6).alias("target_share"),
            F.sum(flag.cast("long")).alias("n_sampled"),
        )
    )


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of the doc's distinct 3-gram
    shingles that appear in NO other document (corpus df = 1) — high
    novelty marks original content, low novelty marks boilerplate /
    template text; curation pipelines use it as the inverse of a
    boilerplate detector. One shingle explode + one df aggregation,
    then a per-doc ratio — the same shuffle skeleton as TF-IDF. The
    exploded shingle stream has two consumers (the df aggregate and
    the per-doc join), so it persists to avoid re-running the shingle
    HOF chain (same fix class as the dedup persists)."""
    from pyspark import StorageLevel

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_distinct(TX.shingles(F.col("text"), 3)).alias("shingleset"),
    )
    sh = docs.select(
        "doc_id", F.explode("shingleset").alias("shingle")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_count"))
    return (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("df_count") == 1).cast("long")).alias("n_unique"),
            F.round(
                F.sum((F.col("df_count") == 1).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def events_power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto view of user activity: the TOP-100 users by event count
    with each rank's cumulative share of ALL events — the "do the top
    users produce most of the volume" diagnostic run before trusting
    any per-user sampling strategy.

    Scale discipline: the top-k lands via orderBy+limit — a distributed
    TakeOrderedAndProject with per-partition truncation, NOT a global
    window over the per-user aggregate (|users| is unbounded at 100 TB,
    so an unpartitioned rank window would serialize every user through
    one partition — the same class of mistake as hint-broadcasting a
    per-user table). Only the 100 surviving rows ride the rank/cumsum
    window (bounded by construction), and the global denominator is a
    1-row scalar aggregate broadcast by the cross join."""
    from pyspark.sql import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = ev.groupBy().agg(F.count(F.lit(1)).alias("total_events"))
    topk = per_user.orderBy(F.desc("n_events"), F.asc("user_id")).limit(100)
    # single-partition window: bounded — runs over topk (limit(100)),
    # not the per-user aggregate
    wo = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    return (
        topk.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            F.row_number().over(wo).cast("long").alias("rank"),
            F.round(
                F.sum("n_events").over(wc) / F.col("total_events").cast("double"),
                6,
            ).alias("cum_event_share"),
        )
    )


def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: events whose trailing 6-hour window (per
    user, event-time RANGE frame on epoch seconds) holds ≥ 3 events —
    the rate-limit/fraud primitive. A RANGE frame sized in TIME, not
    rows: per-row state is bounded by the rate ceiling itself, and one
    user_id exchange serves the whole pass. Ties at the same second
    are all inside each other's frames (RANGE semantics), which is
    what makes the count deterministic."""
    from pyspark.sql import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.unix_timestamp(F.col("ts")).alias("epoch_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-21600, 0)
    )
    return (
        ev.withColumn("n_burst", F.count(F.lit(1)).over(w).cast("long"))
        .filter(F.col("n_burst") >= 3)
        .select("event_id", "user_id", "ts", "n_burst")
    )


def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands shape: consecutive days share a constant
    (day − row_number) anchor, so one date_sub turns runs into group
    keys with no self-join. Two aggregations over the collapsed
    (user, day) grain; at 100 TB only the grain collapse touches the
    event volume (cf. events_rolling_active_users)."""
    from pyspark.sql import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    ud = (
        _events(spark, sf_dir)
        .select(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = ud.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_days").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-deterministic train/test assignment per document (salted
    md5 bucket): same row → same split on any engine, partitioning, or
    cluster. Full row-level oracle."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        split_column,
    )

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", split_column(F.col("doc_id"), 0.2, seed="r1").alias("split")
    )


def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of events, counted per type — the
    content-addressed sampling path (no sampleBy partitioning
    dependence)."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        stratified_sample,
    )

    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    s = stratified_sample(ev, "event_id", 0.10, seed="ev")
    return s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_sampled"))


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token chunks every 24
    tokens): the context-length cutter for long documents. Zero-shuffle
    explode + slice (operators/text.py:chunk_tokens)."""
    return TX.chunk_tokens(_docs(spark, sf_dir), chunk_size=32, stride=24)


def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-vocabulary induction over the corpus (8 merges):
    word-frequency rollup → iterative best-pair merge on the
    vocabulary-sized word table (operators/text.bpe_train_merges,
    Sennrich et al. 2016). Emits the merge table — the artifact a
    tokenizer ships — and the DuckDB oracle REPLAYS the identical
    8-level merge chain with generated chained CTEs (the PageRank
    oracle's device), so every rank, pair and weighted pair count is
    hash-checked."""
    words = (
        _docs(spark, sf_dir)
        .select(F.explode(TX.tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = TX.bpe_train_merges(words, n_merges=8)
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_freq long"
    )


def text_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE half of the BPE pair: train 8 merges on the corpus,
    apply them to the distinct-word table (8 chained array folds on a
    vocabulary-sized frame), then tokenize the corpus by broadcast-
    joining the word→symbols map onto the token stream — per document:
    word count and BPE token count after the merges. The oracle reuses
    the replayed merge chain's final symbol table (w8), so the whole
    train→encode path is hash-checked end to end."""
    docs_words = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
    )
    words = docs_words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    merges = TX.bpe_train_merges(words, n_merges=8)
    encoded = TX.bpe_apply_merges(words.select("word"), merges).select(
        "word", F.size("syms").alias("n_bpe")
    )
    return (
        docs_words.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
        )
    )


def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram score per document — the
    literature-standard smoothing one up from the 0.9/0.1 back-off of
    text_bigram_logprob (Kneser & Ney 1995; Chen & Goodman 1999):

        P_KN(w2|w1) = max(c(w1w2) − d, 0) / c(w1·)
                    + d · N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··),  d = 0.75

    — the continuation probability N1+(·w2)/types ranks words by how
    many distinct contexts they FOLLOW, the fix for high-frequency but
    context-bound words ("francisco"). All five count tables are
    vocabulary-sized; the totals come from windows over the VOCAB (the
    same trick as the unigram model), never a corpus-wide pass. Score:
    mean −ln P per document, decimal-summed (order-independent) and
    rounded to 6 — identical expression shape on both engines."""
    from pyspark.sql.window import Window
    from pyspark import StorageLevel

    docs = _docs(spark, sf_dir)
    pairs = (
        docs.select("doc_id", F.explode(TX.bigram_structs(F.col("text"))).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bigc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ctx = bigc.groupBy("w1").agg(
        F.sum("cb").alias("cw1"), F.count(F.lit(1)).alias("n1f")
    )
    # single-partition window: bounded — w1 context rows (vocab-bounded)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cont = bigc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    cont = cont.select(
        "w2",
        (F.col("n1b").cast("double") / F.sum("n1b").over(wall).cast("double")).alias(
            "p_cont"
        ),
    )
    d = F.lit(0.75)
    p_kn = (
        F.greatest(F.col("cb").cast("double") - d, F.lit(0.0))
        / F.col("cw1").cast("double")
        + (d * F.col("n1f").cast("double") / F.col("cw1").cast("double"))
        * F.col("p_cont")
    )
    return (
        pairs.join(bigc, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .select("doc_id", (-F.log(p_kn)).alias("neg_logp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("neg_logp").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_neg_logprob_kn"),
        )
    )


def text_curation_distill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier DISTILLATION of the curation pipeline — the
    production pattern where the full (expensive) curation chain runs
    on a sample and a cheap model imitates its keep/drop decision at
    scale (the fastText-quality-filter recipe): label = "survived
    curate_training_corpus" (language + quality screens + exact dedup
    + near-dup removal), features = cheap per-row stats only (quality
    score, punctuation ratio, per-language stopword ratios, log token
    count — no dedup signal, so the model must approximate that part
    from content statistics). Spark MLlib logistic regression (the
    platform's distributed trainer; treeAggregate gradient passes,
    coefficient broadcast for scoring); 80/20 split on doc_id%5;
    emits one row per split with label/correct counts.

    Rows-only driver check (LBFGS aggregation is not bit-reproducible
    and DuckDB has no trainer); the test-split accuracy floor is
    pytest-pinned."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    kept = curate_training_corpus(spark, sf_dir).select("doc_id").withColumn(
        "label", F.lit(1.0)
    )
    stats = TX.with_text_stats(_docs(spark, sf_dir))
    scores = TX.lang_scores(F.col("text"))
    n_tok = F.greatest(F.col("n_tokens").cast("double"), F.lit(1.0))
    feat = (
        stats.select(
            "doc_id",
            F.col("quality").alias("f_quality"),
            F.log(n_tok).alias("f_log_tokens"),
            (
                F.col("n_punct").cast("double")
                / F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
            ).alias("f_punct_ratio"),
            *[
                (scores[lang].cast("double") / n_tok).alias(f"f_stop_{lang}")
                for lang in ("en", "de", "fr", "es")
            ],
        )
        .join(kept, "doc_id", "left")
        .withColumn("label", F.coalesce("label", F.lit(0.0)))
    )

    # three downstream evaluations (the LBFGS fit + scoring both
    # splits) each re-ran the full curation chain (~5 s of dedup
    # pipeline) without this persist — measured 16→2.7 s warm at
    # sf0.1; the frame is one row per doc with 8 doubles
    from market_data_pipeline_databricks_spark.caching import persist_tracked

    feat = persist_tracked(feat)
    va = VectorAssembler(
        inputCols=[
            "f_quality",
            "f_log_tokens",
            "f_punct_ratio",
            "f_stop_en",
            "f_stop_de",
            "f_stop_fr",
            "f_stop_es",
        ],
        outputCol="features",
    )
    train = va.transform(feat.filter(F.col("doc_id") % 5 != 0))
    test = va.transform(feat.filter(F.col("doc_id") % 5 == 0))
    model = LogisticRegression(maxIter=25, regParam=0.001).fit(train)
    out = []
    for split, df_ in (("train", train), ("test", test)):
        out.append(
            model.transform(df_)
            .select(
                F.lit(split).alias("split"),
                F.col("label"),
                (F.col("prediction") == F.col("label")).cast("long").alias("ok"),
            )
            .groupBy("split")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("label").cast("long").alias("n_kept_label"),
                F.sum("ok").alias("n_correct"),
            )
        )
    return out[0].unionByName(out[1])



def dedup_incremental_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental FUZZY dedup (the near-dup companion to the md5
    exact form below): docs with doc_id % 5 == 0 arrive as the new
    batch and are blocked-Jaccard-matched against the existing corpus
    only (operators/dedup.ngram_jaccard_cross_pairs) — no
    corpus×corpus work, so the daily cost is O(batch × block
    occupancy) however large history grows. Deterministic rare-shingle
    blocking + exact verification ⇒ fully oracle-backed."""
    docs = _docs(spark, sf_dir)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return DD.ngram_jaccard_cross_pairs(batch, corpus)


def dedup_incremental_fuzzy_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB twin of dedup_incremental_fuzzy: the batch's MinHash
    band keys probe the corpus's band index — no corpus-global
    shingle-DF pass, no corpus×corpus term; exact-Jaccard verification
    makes precision 1 (operators/dedup.minhash_cross_verified_near_
    duplicates). Oracle-backed since round 7 via the portable affine
    MinHash family (the DuckDB oracle replays the cross-banding probe,
    the corpus-side skew guard and the exact verification); keep-set
    equality with the exact cross form at the 0.5 threshold is
    pytest-pinned."""
    docs = _docs(spark, sf_dir)
    return DD.minhash_cross_verified_near_duplicates(
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 5 != 0),
        threshold=0.5,
        portable=True,
    )


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: docs with doc_id % 5 == 0 arrive as
    a new batch; the rest are the already-ingested corpus. Survivors =
    min-id per fingerprint within the batch, anti-joined against the
    corpus's fingerprint set — the daily-crawl-vs-historical-corpus
    shape. One shuffle on the 16-byte md5 key for the batch-side group,
    then a key-colocated left-anti join (both sides hash-partition on
    fp; no broadcast needed, so the corpus side can be arbitrarily
    large)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", TX.fingerprint(F.col("text")).alias("fp")
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return (
        batch.groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_batch_dups"),
        )
        .join(corpus.select("fp").distinct(), "fp", "left_anti")
        .select("doc_id", "fp", "n_batch_dups")
    )


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword extractor.

    Shuffle discipline: tokens explode linearly off the scan; one
    shuffle builds (doc, term) tf; document frequency comes from a
    window COUNT over the same tf table (tf rows are distinct per
    (doc, term), so the partition count IS df — no second scan of the
    text); the corpus size joins in as a 1-row broadcast scalar; the
    final top-3 is a ROW_NUMBER over doc_id. Scores round to 6 dp
    BEFORE ranking so tie order (score desc, term asc) is identical on
    every engine."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = scored.crossJoin(F.broadcast(n_docs)).withColumn(
        "tfidf",
        F.round(
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
        ),
    )
    wtop = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(wtop))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id", "term", "tf", "df", "tfidf", F.col("rank").cast("long").alias("rank")
        )
    )


def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-recall evaluation: for every exact near-dup pair at or
    above the MinHash threshold (truth = the rare-shingle-blocked
    exact Jaccard path), did the 16×4 banded MinHash surface it? Per
    exact-Jaccard decile: true pairs, found pairs, recall — the
    dashboard a dedup owner reads before trusting LSH at 100 TB
    (banding recall is 1−(1−s⁴)¹⁶ in theory; this measures it on the
    actual corpus, estimate noise and skew-guard drops included).
    Precision is deliberately NOT reported: the exact path only covers
    rare-shingle-blocked pairs, so LSH extras can't be fairly judged
    against it. Both constituent paths are oracle-replayable
    (portable md5-derived hashes), so the DuckDB oracle replays the
    ENTIRE evaluation — truth set, candidate set, join, buckets."""
    exact = dedup_ngram_jaccard(spark, sf_dir).filter(
        F.col("jaccard") >= F.lit(0.35)
    )
    found = (
        dedup_minhash_near(spark, sf_dir)
        .select("id_a", "id_b")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    j = exact.join(found, ["id_a", "id_b"], "left")
    out = j.groupBy(
        F.floor(F.col("jaccard") * 10).cast("long").alias("j_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_true_pairs"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_found"),
    )
    return out.withColumn(
        "recall",
        F.round(
            F.col("n_found").cast("double") / F.col("n_true_pairs"), 6
        ),
    )


# fixed retrieval workload for text_bm25_topk — vocabulary words the
# synthetic corpus actually contains, distinct terms per query
_BM25_QUERIES: list[tuple[int, str]] = [
    (1, "fast hash join"),
    (2, "stream window agg"),
    (3, "slow table scan merge"),
]


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per keyword query (Okapi, Lucene idf) — the
    inverted-index retrieval workload. Query-term filter runs before
    the posting groupBy; df and corpus stats broadcast; top-k is ONE
    row_number window per query riding Spark's map-side
    WindowGroupLimit partial (no single-task sort of a query's full
    posting list — see operators/text.py:bm25_topk for the plan
    audit). Scores sum through decimal(27,12) so the DuckDB oracle
    replays every contribution bit-for-bit."""
    return TX.bm25_topk(_docs(spark, sf_dir), _BM25_QUERIES, k=10)


def sample_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware sampling mass per source (soft dedup): instead
    of dropping exact duplicates, each doc gets weight 1/g where g is
    its GLOBAL fingerprint-group size, and the report shows every
    source's raw vs effective (duplication-discounted) token mass plus
    the inflation ratio — the first table a mixture owner reads before
    setting per-source sampling rates (a duplicated source's raw token
    count overstates its real contribution).

    Scale shape: one projection computes fp + token count off the
    scan; group size is a COUNT window over the fp partition (one
    shuffle, no self-join); the per-source rollup is a second shuffle
    on ~|sources| keys. Weights sum through decimal(27,12) so the
    aggregate is partial-sum-order independent and the DuckDB oracle
    replays it exactly."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id",
        "source",
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.token_count(F.col("text")).alias("ntok"),
    )
    g = F.count(F.lit(1)).over(Window.partitionBy("fp"))
    weighted = base.withColumn(
        "eff", (F.col("ntok").cast("double") / g).cast("decimal(27,12)")
    )
    out = weighted.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("fp").cast("long").alias("n_unique"),
        F.sum("ntok").cast("long").alias("raw_tokens"),
        F.round(F.sum("eff").cast("double"), 6).alias("effective_tokens"),
    )
    return out.withColumn(
        "dup_inflation",
        F.round(
            F.col("raw_tokens").cast("double") / F.col("effective_tokens"), 6
        ),
    )


def sample_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source document cap (keep ≤ 20 docs/source):
    the domain-balancing primitive that stops one crawl source from
    dominating the mixture. Order inside a source is content-addressed
    (md5 of the doc id, then id) so the kept set is identical on any
    engine, partitioning, or cluster — one shuffle on source."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source", F.col("rn").cast("long").alias("rn"))
    )


def sample_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-hygiene check: near-duplicate pairs (exact 3-gram Jaccard,
    rare-shingle blocking) that STRADDLE the train/test boundary —
    contaminated evaluation data, the thing dedup-before-split exists
    to prevent. The pair generation is the blocked equi-join from
    dedup_ngram_jaccard; the split tag is the content-addressed md5
    bucket, so the verdict is identical on any engine/partitioning."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        split_column,
    )

    pairs = DD.ngram_jaccard_pairs(_docs(spark, sf_dir))
    sa = split_column(F.col("id_a"), 0.2, seed="r1")
    sb = split_column(F.col("id_b"), 0.2, seed="r1")
    return pairs.select(
        "id_a",
        "id_b",
        "jaccard",
        sa.alias("split_a"),
        sb.alias("split_b"),
    ).filter(F.col("split_a") != F.col("split_b"))


def events_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion: survival curve of "still has
    not purchased" over days since first view, with users who never
    purchase right-censored at the corpus end — the estimator product
    S(t) = Π (1 − k_u/r_u) that a naive conversion-rate-by-day gets
    WRONG whenever censoring exists (it silently treats not-yet as
    never).

    Parity: counts are exact integers; the estimator runs as a
    cumulative sum of ln(1 − k/r) over the ordered day grid — a
    sequential fold both engines execute in the same order — then one
    exp, rounded at 6 dp. A day that converts every remaining user
    drives the factor to 0; survival is pinned to 0.0 from there on
    (ln would be −inf).

    Scale: one events scan, ONE user_id shuffle serving both stacked
    conditional-MIN windows and the per-user collapse (the funnel
    discipline); the KM recursion itself runs on the O(distinct
    durations) day grid — a bounded global window, same pattern as
    window_rolling_range_avg."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id")
    tv = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(wu)
    ev = ev.withColumn("tv", tv)
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("tv")),
            F.col("ts"),
        )
    ).over(wu)
    per_user = (
        ev.withColumn("tp", tp)
        .groupBy("user_id")
        .agg(F.min("tv").alias("tv"), F.min("tp").alias("tp"))
        .filter(F.col("tv").isNotNull())
    )
    mx = per_user.agg(
        F.max(F.coalesce(F.col("tp"), F.col("tv"))).alias("mx")
    )
    # duration in whole days; event=1 converted, 0 censored at corpus end
    durs = per_user.crossJoin(F.broadcast(mx)).select(
        F.coalesce(
            F.datediff(F.col("tp").cast("date"), F.col("tv").cast("date")),
            F.datediff(F.col("mx").cast("date"), F.col("tv").cast("date")),
        ).alias("t"),
        F.col("tp").isNotNull().cast("int").alias("event"),
    )
    grid = durs.groupBy("t").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("event").cast("long").alias("k"),
    )
    # single-partition window: bounded — the grid frame is one row per
    # distinct duration t (aggregate-collapsed survival grid)
    wall = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    # single-partition window: bounded — same per-t grid as above
    wcur = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    risk = F.sum("m").over(total) - F.coalesce(
        F.sum("m").over(wall), F.lit(0)
    )
    factor = 1 - F.col("k").cast("double") / F.col("risk").cast("double")
    out = grid.withColumn("risk", risk).withColumn("factor", factor)
    dead = F.max((F.col("factor") == 0).cast("int")).over(wcur)
    log_s = F.sum(
        F.when(F.col("factor") > 0, F.log("factor"))
    ).over(wcur)
    return out.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("risk").cast("long").alias("n_at_risk"),
        F.col("k").alias("n_converted"),
        F.round(
            F.when(dead == 1, F.lit(0.0)).otherwise(F.exp(log_s)), 6
        ).alias("survival"),
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time funnel view → click → purchase per user: first view,
    first click at-or-after it, first purchase at-or-after that, and
    the stage reached.

    Single-scan formulation: one FileScan of ``events`` and ONE shuffle
    on ``user_id`` serve three stacked per-user window passes (same
    partitioning, so WindowExec 2/3 reuse pass 1's exchange and sort)
    plus the final per-user collapse, which also reuses the hash
    partitioning. Each stage's "first event at-or-after the previous
    stage" is a conditional MIN over the user's partition; a user with
    no qualifying event yields NULL through the ``when`` guard, which
    matches the old left-join semantics exactly. At 100 TB this reads
    the fact table once instead of the previous formulation's four
    pushed-down scans — the dominant cost at scan-bound scale."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    w = Window.partitionBy("user_id")
    ev = (
        _events(spark, sf_dir)
        .select("user_id", "event_type", "ts")
        .withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.min("t_view").alias("t_view"),
            F.min("t_click").alias("t_click"),
            F.min("t_purchase").alias("t_purchase"),
        )
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            stage.cast("long").alias("stage_reached"),
        )
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: cohort = each user's first-event week;
    a (cohort_week, week_offset) cell counts distinct users from that
    cohort active offset weeks later. Two aggregations — first-week per
    user (partial-agg'd), then distinct users per cell.

    The cohort table is deliberately NOT hint-broadcast: it has one row
    per distinct user, an unbounded cardinality at 100 TB of events — a
    forced ``F.broadcast`` would bypass AQE's size check and fail on
    the broadcast limit (or OOM executors) instead of degrading. Left
    unhinted, both sides of the join shuffle on ``user_id`` (the cohort
    side is already partitioned that way by its groupBy, so it adds no
    exchange), and AQE still picks a broadcast join at small scale when
    the cohort table measures under the threshold."""
    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            ((F.datediff(F.col("week"), F.col("cohort_week")) / 7))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU: distinct users per day and per trailing 7-day window —
    the product-analytics rollup every event pipeline serves.

    Rolling DISTINCT cannot ride a window frame (distinct is not
    decomposable), so the standard exact formulation: dedupe to
    (user, day) grain first — THE volume-collapsing step, |users|×|days|
    rows max — then expand each active day to the ≤7 windows it counts
    toward (bounded 7× fan-out of the already-collapsed grain, linear).

    ONE scan of events, two shuffles: both counts come from a single
    groupBy over the expanded grain — dau is the conditional distinct
    of offset-0 rows, wau the distinct over all offsets — and
    "window day is an actual active day" falls out as ``dau > 0``
    (a day with no offset-0 row had no events), replacing the
    semi-join against a third branch of the lineage that would
    re-execute the scan. The sketch alternative
    (approx_count_distinct per frame) trades exactness for one
    shuffle; both belong in the engine and the exact one is the
    oracle-checkable form."""
    from market_data_pipeline_databricks_spark.plans.relational import _events

    ud = (
        _events(spark, sf_dir)
        .select(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .distinct()
    )
    expanded = ud.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_day"),
    )
    return (
        expanded.groupBy("win_day")
        .agg(
            F.countDistinct(
                F.when(F.col("win_day") == F.col("day"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .filter(F.col("dau") > 0)
        .select(F.col("win_day").alias("day"), "dau", "wau")
    )


def events_rolling_active_users_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch twin of events_rolling_active_users: HyperLogLog++
    (approx_count_distinct, rsd 2%) over the same expanded grain — the
    one-pass form a 100-TB deployment runs when ±2% on WAU is
    acceptable. Engine-specific sketch → rows-only driver check; the
    error bound vs the exact form is asserted in pytest."""
    from market_data_pipeline_databricks_spark.plans.relational import _events

    ud = (
        _events(spark, sf_dir)
        .select(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .distinct()
    )
    expanded = ud.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_day"),
    )
    return (
        expanded.groupBy("win_day")
        .agg(
            F.approx_count_distinct(
                F.when(F.col("win_day") == F.col("day"), F.col("user_id")), 0.02
            ).alias("dau_approx"),
            F.approx_count_distinct("user_id", 0.02).alias("wau_approx"),
        )
        .filter(F.col("dau_approx") > 0)
        .select(F.col("win_day").alias("day"), "dau_approx", "wau_approx")
    )


def dedup_editdistance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup verification: Levenshtein distance on
    the normalized text of rare-shingle-blocked candidate pairs,
    keeping pairs whose relative edit distance is ≤ 20% of the longer
    text. Catches small in-place edits (typo fixes, token swaps) that
    set-based Jaccard treats the same as larger rewrites; the O(len²)
    dynamic program runs ONLY on the blocked candidate set, never
    all-pairs — the standard place edit distance is affordable at
    scale. JVM levenshtein == DuckDB levenshtein, so fully
    oracle-checked."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", TX.normalize_text(F.col("text")).alias("ntext")
    )
    pairs = DD.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.1).select(
        "id_a", "id_b"
    )
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("ntext").alias("t_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("ntext").alias("t_b"))
    scored = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("edit_dist", F.levenshtein("t_a", "t_b").cast("long"))
        .withColumn(
            "rel_dist",
            F.round(
                F.col("edit_dist")
                / F.greatest(F.length("t_a"), F.length("t_b")).cast("double"),
                6,
            ),
        )
    )
    return scored.filter(F.col("rel_dist") <= 0.2).select(
        "id_a", "id_b", "edit_dist", "rel_dist"
    )


def text_bigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-200 adjacent token bigrams — the merge-candidate
    inventory a BPE/WordPiece vocab induction starts from. Bigrams
    build as a per-row array transform (no self-join), explode
    linearly, and aggregate with map-side partial counts; the final
    top-k is a TakeOrderedAndProject, not a global sort. Deterministic
    tie-break on the bigram string."""
    # bound-once bigram builder (operators/text.bigrams): the naive
    # inner-lambda form re-ran the tokenize chain per element — O(n²)
    # per document, measured 9.9 → 1.4 s for this query at sf0.1
    return (
        _docs(spark, sf_dir)
        .select(F.explode(TX.bigrams(F.col("text"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("bigram"))
        .limit(200)
    )


def sample_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle (8 shards): shard =
    content-hash of doc_id, position = rank of a second salted hash
    within the shard — reproducible pseudorandom order with ONE
    shuffle and per-shard local sorts, never a global ORDER BY
    (operators/sampling.py:training_shuffle)."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        training_shuffle,
    )

    # 64 shards at test scale; in production the shard count scales
    # with the corpus (shard ≈ one output file / data-loader stream,
    # sized so each shard's local sort fits a task — with only a
    # handful of shards the per-shard sorts would cap parallelism at
    # the shard count).
    return training_shuffle(
        _docs(spark, sf_dir).select("doc_id"), "doc_id", n_shards=64
    ).select("doc_id", "shard", "pos")


def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-100 weighted sample of documents, weight = n_chars
    (operators/sampling.py:weighted_reservoir, A-ES): the fixed-budget
    curation pick ("best k by weight, stochastically") as a runnable
    query. Content-addressed uniforms make the draw reproducible on
    any engine — the oracle recomputes the identical ln(u)/w keys in
    DuckDB and must select the same 100 ids. Selection is a
    TakeOrdered, no global sort."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        weighted_reservoir,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return weighted_reservoir(docs, "doc_id", "n_chars", 100, seed="res")


def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram in power-of-2 bins + cumulative document
    share — the packing-efficiency / context-budget planning view a
    pretraining run consults before choosing sequence length.

    bin = floor(log2(n_tokens)) computed integer-exactly as
    len(bin(n)) - 1 (no float log that could straddle a power of 2);
    the corpus aggregates to O(bins) rows, and the cumulative share is
    a window over that bounded series (same bounded-global-window
    pattern as window_rolling_range_avg)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        TX.token_count(F.col("text")).alias("n_tokens")
    )
    binned = docs.select(
        (F.length(F.bin(F.col("n_tokens"))) - 1).cast("long").alias("len_bin"),
        "n_tokens",
    )
    hist = binned.groupBy("len_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )
    # single-partition window: bounded — hist is one row per length
    # bin (fixed bin count), not per document
    w = Window.orderBy("len_bin").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()
    return hist.select(
        "len_bin",
        "n_docs",
        "sum_tokens",
        F.round(
            F.sum("n_docs").over(w) / F.sum("n_docs").over(total), 6
        ).alias("cum_doc_share"),
    )


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style multi-rule quality screen (Rae et al. 2021,
    Appendix A — public paper): each document is scored against six
    independent heuristic rules (length bounds, mean word length,
    stopword presence, symbol ratio, single-token repetition); any
    firing rule rejects the document and ALL firing rule names are
    routed to ``reject_reasons`` — the reference's silver
    reject-routing discipline (notebooks/silver/02_transform_silver.py
    reject_reason precedence) applied to the documents corpus instead
    of OHLC rows, except that Gopher screens report every violated
    rule, not just the first.

    Scale: every rule is a single-pass Column expression over one
    shared normalization projection — zero shuffles, zero UDFs, fully
    codegen'd. ``top_unigram_share`` is O(u·n) per row in the
    distinct-token count u (array_distinct × filter), bounded by
    document length; for book-length documents swap in an
    explode→count→max formulation (one shuffle on doc_id) instead.
    Rule thresholds compare the ROUNDED diagnostics so the boolean
    flags are reproducible on any engine (no 1-ulp boundary flakes).
    """
    t = F.col("text")
    ntext = TX.normalize_text(t)
    toks = TX.tokens(t)
    n_tok = F.size(toks).cast("long")
    n_tok_d = n_tok.cast("double")
    mean_wl = (
        F.length(F.regexp_replace(ntext, " ", "")).cast("double") / n_tok_d
    )
    # ANSI mode raises DIVIDE_BY_ZERO even for doubles: guard the
    # zero-length document (symbol_frac NULL, rule coalesces to false —
    # such a doc is rejected by the length rule regardless)
    n_chars = TX.char_count(t)
    symbol_frac = F.when(
        n_chars > 0, TX.punct_count(t).cast("double") / n_chars.cast("double")
    )
    top_share = (
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda u: F.size(F.filter(toks, lambda x: x == u)),
            )
        ).cast("double")
        / n_tok_d
    )
    base = _docs(spark, sf_dir).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        TX.stopword_count(t).alias("n_stopwords"),
        F.round(symbol_frac, 6).alias("symbol_frac"),
        F.round(top_share, 6).alias("top_unigram_share"),
    )
    r_short = F.col("n_tokens") < 15
    r_long = F.col("n_tokens") > 100000
    r_wl = (F.col("mean_word_len") < 2.0) | (F.col("mean_word_len") > 10.0)
    r_stop = F.col("n_stopwords") < 2
    r_sym = F.coalesce(F.col("symbol_frac") > 0.1, F.lit(False))
    r_rep = F.col("top_unigram_share") > 0.2
    reasons = F.concat_ws(
        ",",
        F.when(r_short, F.lit("too_short")),
        F.when(r_long, F.lit("too_long")),
        F.when(r_wl, F.lit("word_len")),
        F.when(r_stop, F.lit("low_stopword")),
        F.when(r_sym, F.lit("symbol_ratio")),
        F.when(r_rep, F.lit("repetition")),
    )
    return base.select(
        "*",
        (~(r_short | r_long | r_wl | r_stop | r_sym | r_rep)).alias("keep"),
        reasons.alias("reject_reasons"),
    )


def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction as an oracle-backed query. The corpus
    carries no real PII (by construction), so the query synthesizes a
    deterministic contact blob per document from doc_id arithmetic —
    an email, an IPv4 and a phone number — appends it to a text
    prefix, then runs the REAL ``operators/text.py`` pii_counts /
    redact_pii chain (ordered JVM regex passes: email → ipv4 → phone,
    each kind counted on text with the more specific kinds already
    redacted). The DuckDB twin re-derives the same blob and chain, so
    the gate proves regex-semantics parity (Java vs RE2) for every
    pattern on every row, not just the crafted unit-test strings.

    Scale: pure per-row Column expressions — zero shuffles, zero UDFs;
    regex passes are JVM-side and pipeline into one codegen span."""
    did = F.col("doc_id").cast("string")
    blob = F.concat(
        F.substring("text", 1, 40),
        F.lit(" reach u"), did,
        F.lit("@mail-"), did, F.lit(".example.org or 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" tel +1 555 000 "),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    base = _docs(spark, sf_dir).select("doc_id", blob.alias("blob"))
    counts = TX.pii_counts(F.col("blob"))
    return base.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
        TX.redact_pii(F.col("blob")).alias("redacted"),
    )


def text_gopher_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule screen composed into the dedup decision: keep
    documents passing all six rules, then one survivor per exact
    fingerprint (min doc_id) — the screen-then-dedup head of a
    curation pipeline, with the rule screen standing in for the
    quality-score filter the main capstone uses.

    Scale: the screen is zero-shuffle (see text_gopher_rules); the
    fingerprint dedup adds the one md5-key exchange."""
    from pyspark.sql.window import Window

    rules = text_gopher_rules(spark, sf_dir).select("doc_id", "n_tokens", "keep")
    docs = _docs(spark, sf_dir).select(
        "doc_id", TX.fingerprint(F.col("text")).alias("fp")
    )
    kept = rules.filter(F.col("keep")).join(docs, "doc_id")
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_tokens")
    )


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's ordered
    event stream: P(next event type | current event type) — the
    behavioral-model substrate (and a drift detector when compared
    week over week).

    Scale: consecutive pairs come from ONE user_id window (LEAD), the
    transition counts partial-aggregate map-side onto an O(types²)
    grid, and the row-normalizing denominator is a window over that
    tiny aggregate — never over the fact table. Probabilities are
    exact-integer-derived doubles, floor-truncated (half-way rounding
    is engine-divergent)."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        _events(spark, sf_dir)
        .select("user_id", "event_id", "ts", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    trans = pairs.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wrow = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        (
            F.floor(
                F.col("n").cast("double")
                / F.sum("n").over(wrow).cast("double")
                * 1e6
            )
            / 1e6
        ).alias("p"),
    )


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step behavioral paths (event-type trigrams over
    each user's time-ordered stream) — the sequence-mining staple
    behind "how do users actually reach purchase".

    Scale: two LEADs on one user_id window (no collect_list, no
    per-user array materialization), then a count on O(types³)
    distinct paths with map-side partial aggregation; top-k via
    TakeOrderedAndProject with the path string as tiebreak."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        _events(spark, sf_dir)
        .select("user_id", "event_id", "ts", "event_type")
        .withColumn("t1", F.lead("event_type", 1).over(w))
        .withColumn("t2", F.lead("event_type", 2).over(w))
        .filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    )
    return (
        ev.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(20)
    )


def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    value band (fixed thresholds, not quantiles — deterministic by
    construction): observed vs expected contingency counts and the
    per-cell chi-square contribution, plus the total statistic on
    every row — the screening test a feature-store runs before
    trusting a categorical feature.

    Scale: ONE aggregation pass builds the O(types × bands) observed
    grid; marginals and the total are windows over that tiny grid
    (never the fact table). Expected counts are exact-integer-derived
    doubles; contributions are floor-truncated (engine-stable)."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    band = (
        F.when(F.col("value") < 10, "lo")
        .when(F.col("value") < 100, "mid")
        .otherwise("hi")
    )
    obs = (
        _events(spark, sf_dir)
        .select("event_type", band.alias("value_band"))
        .groupBy("event_type", "value_band")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("value_band")
    # single-partition window: bounded — event_type x value_band cells
    w_all = Window.partitionBy()
    expected = (
        F.sum("n_obs").over(w_row).cast("double")
        * F.sum("n_obs").over(w_col).cast("double")
        / F.sum("n_obs").over(w_all).cast("double")
    )
    cell = obs.select(
        "event_type",
        "value_band",
        "n_obs",
        (F.floor(expected * 1e6) / 1e6).alias("n_expected"),
        (
            F.floor(
                (F.col("n_obs").cast("double") - expected)
                * (F.col("n_obs").cast("double") - expected)
                / expected
                * 1e6
            )
            / 1e6
        ).alias("chi2_cell"),
    )
    # the 6-dp truncated cells are exactly representable in
    # decimal(27,6), so summing through decimal keeps the total
    # order-independent (a double window sum would re-introduce
    # accumulation-order noise in the last bits)
    return cell.withColumn(
        "chi2_total",
        F.sum(F.col("chi2_cell").cast("decimal(27,6)"))
        # single-partition window: bounded — contingency cells
        .over(Window.partitionBy())
        .cast("double"),
    )


def scalar_props_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured map surface: parse the ``props`` JSON into a
    typed ``map<string,bigint>`` and explode it to (key, value) rows —
    the schema-on-read path for property bags whose keys are NOT known
    at query-author time (get_json_object, by contrast, needs the
    path literal). Aggregates per (event_type, key): count and
    decimal-exact value sum/min/max.

    Scale: from_json + explode are per-row generators (no shuffle);
    the aggregate is one map-side-combined exchange on a tiny
    (event_type, key) grid."""
    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    m = F.from_json("props", "map<string,bigint>")
    e = ev.select("event_type", F.explode(m).alias("key", "val"))
    return e.groupBy("event_type", "key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").cast("long").alias("sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-grain analytics on top of the 30-minute-idle
    sessionization: per (user, session) duration, event count, total
    value and whether the session converted (contains a purchase) —
    the rollup every product-analytics layer builds right after
    assigning session ids (window_sessionization stops at per-user
    counts; this materializes the session grain itself).

    Scale: the session-id assignment (LAG gap + running SUM) and the
    session rollup all partition by user_id, so ONE exchange serves
    both windows and the final aggregate. Duration is an exact
    integer-microsecond difference — no float time math."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast(
            "long"
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor((F.max(us) - F.min(us)) / F.lit(1_000_000.0))
        .cast("long")
        .alias("duration_s"),
        F.round(
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double"), 6
        ).alias("total_value"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).cast("boolean").alias("converted"),
    )


def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout: adjust each
    user's experiment-period value by their PRE-period value
    (Y' = Y − θ·(X − mean(X)), θ = cov(X,Y)/var(X)) — the standard
    trick that shrinks metric variance without biasing the treatment
    difference, because θ is estimated POOLED across arms. Periods
    split at the corpus midpoint (Jan 16); variant is the same
    portable md5 bucket as events_ab_test_lift. Output per variant:
    n, raw mean, adjusted mean, plus the pooled θ and the variance
    reduction share (1 − var(Y')/var(Y)) repeated on both rows.

    Parity: θ and the variances derive from decimal-cast component
    sums (Σx, Σy, Σxy, Σx², Σy'²... — the funcs_market_beta
    discipline), so every derived double is identical bits on both
    engines; outputs floor-truncate at 6 dp.

    On THIS synthetic corpus pre/post values are nearly independent
    (θ ≈ −0.15, variance reduction ≈ 3%) — the machinery is the
    deliverable; real user metrics correlate strongly across periods
    and routinely cut variance 30-50%."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.operators.sampling import (
        hash_bucket,
    )
    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("x"),
            F.sum(
                F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("y"),
        )
        .withColumn(
            "variant",
            F.when(hash_bucket(F.col("user_id"), "ab") < 5000, "A").otherwise(
                "B"
            ),
        )
    )

    def dsum(c):
        return F.sum(c.cast("decimal(38,12)")).cast("double")

    comp = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    theta = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    mean_x = F.col("sx") / n
    pooled = comp.select(
        theta.alias("theta"), mean_x.alias("mean_x")
    )
    adj = per_user.crossJoin(F.broadcast(pooled)).withColumn(
        "y_adj",
        F.col("y") - F.col("theta") * (F.col("x") - F.col("mean_x")),
    )
    per_variant = adj.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        (dsum(F.col("y")) / F.count(F.lit(1))).alias("_raw"),
        (dsum(F.col("y_adj")) / F.count(F.lit(1))).alias("_adj"),
    )
    # pooled variance reduction share, computed once over all users
    var_comp = adj.agg(
        F.count(F.lit(1)).alias("vn"),
        dsum(F.col("y")).alias("vsy"),
        dsum(F.col("y") * F.col("y")).alias("vsyy"),
        dsum(F.col("y_adj")).alias("vsa"),
        dsum(F.col("y_adj") * F.col("y_adj")).alias("vsaa"),
    )
    vn = F.col("vn").cast("double")
    var_y = (vn * F.col("vsyy") - F.col("vsy") * F.col("vsy"))
    var_a = (vn * F.col("vsaa") - F.col("vsa") * F.col("vsa"))
    reduction = var_comp.select(
        (1 - var_a / var_y).alias("var_reduction"),
    )
    trunc = lambda c: F.floor(c * 1e6) / 1e6
    return (
        per_variant.crossJoin(F.broadcast(pooled.select("theta")))
        .crossJoin(F.broadcast(reduction))
        .select(
            "variant",
            "n_users",
            trunc(F.col("_raw")).alias("raw_mean"),
            trunc(F.col("_adj")).alias("adjusted_mean"),
            trunc(F.col("theta")).alias("theta"),
            trunc(F.col("var_reduction")).alias("var_reduction"),
        )
    )


def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split 50/50 by the same portable
    content-addressed md5 bucket the train/test splitter uses
    (operators/sampling.py — identical assignment on any engine, any
    partitioning), exposure = has a view event, conversion = has a
    purchase event; per-variant conversion rates, the B−A lift, and
    the pooled two-proportion z statistic.

    Scale: one per-user conditional aggregate (single user_id
    shuffle), then a 2-row variant aggregate; the cross-variant terms
    (lift, z) are conditional window maxes over those 2 rows. All
    statistics derive from exact integer counts — identical doubles on
    both engines — and floor-truncate at 6 dp."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.operators.sampling import (
        hash_bucket,
    )
    from market_data_pipeline_databricks_spark.plans.relational import _events

    per_user = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("exposed"),
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14
            )
            .cast("int")
            .alias("converted"),
        )
        .filter(F.col("exposed") == 1)
        .withColumn(
            "variant",
            F.when(hash_bucket(F.col("user_id"), "ab") < 5000, "A").otherwise(
                "B"
            ),
        )
    )
    g = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    # single-partition window: bounded — one row per experiment variant
    w = Window.partitionBy()

    def across(var: str, col: str):
        return F.max(F.when(F.col("variant") == var, F.col(col))).over(w)

    na, ca = across("A", "n_users").cast("double"), across(
        "A", "n_converted"
    ).cast("double")
    nb, cb = across("B", "n_users").cast("double"), across(
        "B", "n_converted"
    ).cast("double")
    pa, pb = ca / na, cb / nb
    pooled = (ca + cb) / (na + nb)
    # zero pooled variance (all or none converted) has no defined z;
    # ANSI mode would otherwise raise DIVIDE_BY_ZERO
    var_term = pooled * (1 - pooled) * (1 / na + 1 / nb)
    z = F.when(var_term > 0, (pb - pa) / F.sqrt(var_term))

    def trunc6(c):
        return F.floor(c * 1e6) / 1e6

    return g.select(
        "variant",
        "n_users",
        "n_converted",
        trunc6(F.col("n_converted").cast("double") / F.col("n_users")).alias(
            "conv_rate"
        ),
        trunc6(pb - pa).alias("lift_b_minus_a"),
        trunc6(z).alias("z_stat"),
    )


def events_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV decile report: per-user lifetime value (decimal-exact event
    value sum), bucketed into deciles by EXACT interpolated quantile
    boundaries, then per-decile breadth and value stats — the
    customer-value segmentation every growth team builds.

    The scale-safe NTILE: a global ``NTILE(10)`` would sort the entire
    per-user table in ONE partition (|users| can be 10⁹ at 100 TB).
    Instead the 9 exact decile boundaries come from one distributed
    percentile aggregate, broadcast as a single row, and each user's
    decile is a branch-free comparison count — per-user grain never
    leaves its user_id partitioning. Boundary determinism: interpolated
    cut points either equal a data value exactly (bit-identical on
    both engines) or lie strictly between two totals, so the strict
    ``>`` bucketing cannot flip on last-ulp differences."""
    from pyspark import StorageLevel

    from market_data_pipeline_databricks_spark.plans.relational import _events

    # the collapsed per-user grain feeds BOTH the boundary aggregate
    # and the bucketing join — persisted so the events fact table is
    # scanned/aggregated ONCE, not once per consumer (the
    # multi-consumer persist pattern, docs/PLANS.md)
    pu = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bounds = pu.agg(
        F.expr(
            "percentile(total_value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("bounds")
    )
    return (
        pu.crossJoin(F.broadcast(bounds))
        .select(
            "total_value",
            (
                1
                + F.size(
                    F.filter(
                        F.col("bounds"), lambda b: F.col("total_value") > b
                    )
                )
            )
            .cast("long")
            .alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum(F.col("total_value").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_ltv"),
            F.round(F.min("total_value"), 6).alias("min_ltv"),
            F.round(F.max("total_value"), 6).alias("max_ltv"),
        )
    )


def events_interarrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: p50/p90/p99 and
    mean of the gap between consecutive events of the same type for the
    same user — the latency-shape diagnostic behind session-timeout and
    burst-threshold choices (the 30-minute idle rule in
    events_session_stats and the 6-hour frame in events_burst_detection
    are read off exactly this distribution).

    Gaps are exact integer microseconds (unix_micros − LAG, tie-broken
    on event_id); the percentile interpolation runs on those integers
    and divides by 1e6 once at the end — identical doubles on both
    engines. One (user_id, event_type) exchange serves the LAG; the
    final rollup is |event types| rows."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = ev.withColumn("gap_us", F.col("us") - F.lag("us").over(w)).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap_us, 0.5)") / 1e6, 6).alias("p50_s"),
        F.round(F.expr("percentile(gap_us, 0.9)") / 1e6, 6).alias("p90_s"),
        F.round(F.expr("percentile(gap_us, 0.99)") / 1e6, 6).alias("p99_s"),
        F.round(
            F.sum(F.col("gap_us").cast("decimal(27,0)")).cast("double")
            / F.count(F.lit(1))
            / 1e6,
            6,
        ).alias("mean_s"),
    )


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM score per document — the KenLM-shaped
    quality signal one order up from text_unigram_logprob: mean
    negative log of P(w₂|w₁) = 0.9·c(w₁w₂)/c(w₁·) + 0.1·c(w₂)/N over
    each document's adjacent token pairs (context counts c(w₁·) are
    bigram-start counts, so the conditional rows sum to 1; the 0.1
    unigram back-off floors unseen continuations without smoothing
    hyperparameters).

    Scale: bigrams build as a per-row array transform (no self-join)
    and explode linearly; the three count tables are vocab-sized
    (≪ corpus) and join back onto the pair stream — left to AQE, which
    broadcasts them at test scale and degrades to shuffle joins when a
    web-scale bigram vocab outgrows the limit. The corpus total is a
    window over the VOCAB, not the corpus (text_unigram_logprob's
    trick). Documents with fewer than 2 tokens have no bigrams and are
    absent by contract."""
    from pyspark.sql.window import Window

    toks = TX.tokens(F.col("text"))
    # bound-once (w1, w2) builder — see operators/text.bigram_structs
    big = TX.bigram_structs(F.col("text"))
    from pyspark import StorageLevel

    docs = _docs(spark, sf_dir)
    # three consumers (context counts, bigram counts, the scoring
    # join) — persisted so the normalize→tokenize→pair HOF chain runs
    # once, not three times (the multi-consumer persist pattern)
    pairs = (
        docs.select("doc_id", F.explode(big).alias("bg"))
        .select(
            "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    uni = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("ucnt"))
    )
    # single-partition window: bounded — unigram vocab rows (Heaps-law)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    uni = uni.select(
        "token",
        (F.col("ucnt").cast("double") / F.sum(F.col("ucnt").cast("double")).over(wall)).alias(
            "p_uni"
        ),
    )
    ctx = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("cw1"))
    bigc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    p = (
        0.9 * (F.col("cb").cast("double") / F.col("cw1").cast("double"))
        + 0.1 * F.col("p_uni")
    )
    return (
        pairs.join(bigc, ["w1", "w2"])
        .join(ctx, "w1")
        .join(uni.withColumnRenamed("token", "w2"), "w2")
        .select("doc_id", (-F.log(p)).alias("neg_logp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("neg_logp").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


QUERIES = {
    "text_stats": text_stats,
    "text_gopher_rules": text_gopher_rules,
    "text_pii_redaction": text_pii_redaction,
    "events_markov_transitions": events_markov_transitions,
    "events_top_paths": events_top_paths,
    "events_chi2_independence": events_chi2_independence,
    "text_exact_decontaminate": text_exact_decontaminate,
    "text_gopher_survivors": text_gopher_survivors,
    "scalar_props_map_entries": scalar_props_map_entries,
    "events_session_stats": events_session_stats,
    "events_ab_test_lift": events_ab_test_lift,
    "events_user_value_deciles": events_user_value_deciles,
    "events_interarrival_quantiles": events_interarrival_quantiles,
    "text_bigram_logprob": text_bigram_logprob,
    "text_lang_id": text_lang_id,
    "text_fingerprint_groups": text_fingerprint_groups,
    "text_bpe_token_count": text_bpe_token_count,
    "text_tokenizer_fertility": text_tokenizer_fertility,
    "dedup_exact_survivors": dedup_exact_survivors,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_cdc_repeated_chunks": dedup_cdc_repeated_chunks,
    "dedup_cdc_duplicate_coverage": dedup_cdc_duplicate_coverage,
    "dedup_cdc_duplicate_spans": dedup_cdc_duplicate_spans,
    "dedup_cdc_incremental": dedup_cdc_incremental,
    "dedup_minhash_near": dedup_minhash_near,
    "dedup_simhash_near": dedup_simhash_near,
    "dedup_winnow_overlap": dedup_winnow_overlap,
    "curate_training_corpus": curate_training_corpus,
    "dedup_components": dedup_components,
    "dedup_components_lsh": dedup_components_lsh,
    "dedup_component_survivors": dedup_component_survivors,
    "dedup_representative_survivors": dedup_representative_survivors,
    "text_decontaminate": text_decontaminate,
    "text_repetition_score": text_repetition_score,
    "text_unigram_logprob": text_unigram_logprob,
    "pack_training_sequences": pack_training_sequences,
    "sample_domain_mixture": sample_domain_mixture,
    "text_corpus_report": text_corpus_report,
    "sample_train_test_split": sample_train_test_split,
    "sample_stratified_events": sample_stratified_events,
    "text_chunk_overlap": text_chunk_overlap,
    "dedup_incremental_batch": dedup_incremental_batch,
    "dedup_incremental_fuzzy": dedup_incremental_fuzzy,
    "text_bpe_train_merges": text_bpe_train_merges,
    "text_bpe_encode_stats": text_bpe_encode_stats,
    "text_kneser_ney_bigram": text_kneser_ney_bigram,
    "sample_perplexity_mixture": sample_perplexity_mixture,
    "sample_token_budget_mixture": sample_token_budget_mixture,
    "text_chunk_sliding": text_chunk_sliding,
    "text_cross_source_contamination": text_cross_source_contamination,
    "text_curation_distill_report": text_curation_distill_report,
    "dedup_incremental_fuzzy_lsh": dedup_incremental_fuzzy_lsh,
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "text_bm25_topk": text_bm25_topk,
    "sample_soft_dedup_weights": sample_soft_dedup_weights,
    "dedup_lsh_recall_report": dedup_lsh_recall_report,
    "sample_source_cap": sample_source_cap,
    "curate_chunk_corpus": curate_chunk_corpus,
    "curate_chunk_corpus_lsh": curate_chunk_corpus_lsh,
    "sample_split_leakage": sample_split_leakage,
    "events_funnel": events_funnel,
    "events_conversion_survival": events_conversion_survival,
    "events_cuped_adjustment": events_cuped_adjustment,
    "events_retention_cohorts": events_retention_cohorts,
    "text_bigram_vocab": text_bigram_vocab,
    "sample_training_shuffle": sample_training_shuffle,
    "sample_weighted_reservoir": sample_weighted_reservoir,
    "text_length_histogram": text_length_histogram,
    "events_rolling_active_users": events_rolling_active_users,
    "events_rolling_active_users_approx": events_rolling_active_users_approx,
    "dedup_editdistance_verify": dedup_editdistance_verify,
    "sample_temperature_mixture": sample_temperature_mixture,
    "text_ngram_novelty": text_ngram_novelty,
    "events_power_users_pareto": events_power_users_pareto,
    "events_longest_streak": events_longest_streak,
    "events_burst_detection": events_burst_detection,
}

# Shared DuckDB normalization CTEs — mirrors operators.text.normalize_text.
_NORM = r"""
WITH norm AS (
  SELECT doc_id, text, n_chars,
         trim(regexp_replace(regexp_replace(lower(text),
              '[.,!?;:''"()\[\]{}\-]', '', 'g'), '\s+', ' ', 'g')) AS ntext
  FROM documents
), tok AS (
  SELECT doc_id, text, n_chars, ntext, string_split(ntext, ' ') AS toks FROM norm
)
"""

_STOP_EN = "('the','a','of','and','in','to','is')"

_SHINGLE_DOCS = _NORM + r""",
docs AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks)-2, 1) + 1),
           i -> array_to_string(toks[i:least(i+2, len(toks))], ' ')
         )) AS shingleset
  FROM tok
), sh AS (
  SELECT doc_id, unnest(shingleset) AS shingle FROM docs
)
"""

# Shared curation CTE chain (through the near-dup pair set) — reused by
# the curate_* capstone oracles.
_CURATE_CTES = _NORM + f""",
        enr AS (
          SELECT doc_id, ntext, toks,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 md5(ntext) AS fp,
                 ROUND(GREATEST(LEAST(
                   (CASE WHEN len(toks) >= 5 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END)
                   * (0.5 + 0.5 * (CAST(len(list_filter(toks, t -> t IN {_STOP_EN})) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
                      - (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\\[\\]{{}}\\-]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END)),
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
        kept AS (SELECT * FROM enr WHERE lang_pred = 'en' AND quality >= 0.5),
        exact AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM kept
          ) WHERE rn = 1
        ),
        sdocs AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(toks)-2, 1) + 1),
                   i -> array_to_string(toks[i:least(i+2, len(toks))], ' ')
                 )) AS shingleset
          FROM exact
        ),
        sh2 AS (SELECT doc_id, unnest(shingleset) AS shingle FROM sdocs),
        rare2 AS (SELECT shingle FROM sh2 GROUP BY shingle HAVING COUNT(*) <= 10),
        cand2 AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare2)
        ),
        pairs AS (
          SELECT id_a, id_b FROM cand2
          JOIN sdocs da ON da.doc_id = id_a
          JOIN sdocs db ON db.doc_id = id_b
          WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
                / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.5
        )
"""

_GOPHER_ORACLE = _NORM + r""",
base AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         ROUND(CAST(length(replace(ntext, ' ', '')) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
         CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS BIGINT) AS n_stopwords,
         CASE WHEN length(text) > 0 THEN
           ROUND(CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}\-]', '', 'g')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE), 6) END AS symbol_frac,
         ROUND(CAST(list_max(list_transform(list_distinct(toks),
                 u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) AS top_unigram_share
  FROM tok
)
SELECT doc_id, n_tokens, mean_word_len, n_stopwords, symbol_frac,
       top_unigram_share,
       NOT (n_tokens < 15 OR n_tokens > 100000
            OR mean_word_len < 2.0 OR mean_word_len > 10.0
            OR n_stopwords < 2 OR COALESCE(symbol_frac > 0.1, FALSE)
            OR top_unigram_share > 0.2) AS keep,
       concat_ws(',',
         CASE WHEN n_tokens < 15 THEN 'too_short' END,
         CASE WHEN n_tokens > 100000 THEN 'too_long' END,
         CASE WHEN mean_word_len < 2.0 OR mean_word_len > 10.0 THEN 'word_len' END,
         CASE WHEN n_stopwords < 2 THEN 'low_stopword' END,
         CASE WHEN symbol_frac > 0.1 THEN 'symbol_ratio' END,
         CASE WHEN top_unigram_share > 0.2 THEN 'repetition' END
       ) AS reject_reasons
FROM base
"""

_PII_ORACLE = r"""
WITH blob AS (
  SELECT doc_id,
         concat(substr(text, 1, 40),
                ' reach u', CAST(doc_id AS VARCHAR),
                '@mail-', CAST(doc_id AS VARCHAR), '.example.org or 10.0.',
                CAST(doc_id % 256 AS VARCHAR), '.',
                CAST((doc_id * 7) % 256 AS VARCHAR),
                ' tel +1 555 000 ',
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS t0
  FROM documents
), s1 AS (
  SELECT doc_id, t0,
         CAST(len(regexp_extract_all(t0,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         regexp_replace(t0,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
  FROM blob
), s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t1,
           '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ipv4,
         regexp_replace(t1,
           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IPV4]', 'g') AS t2
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         CAST(len(regexp_extract_all(t2,
           '\+?\d[\d\s().-]{7,}\d')) AS BIGINT) AS n_phone,
         regexp_replace(t2,
           '\+?\d[\d\s().-]{7,}\d', '[PHONE]', 'g') AS t3
  FROM s2
)
SELECT doc_id, n_email, n_ipv4, n_phone, t3 AS redacted FROM s3
"""

ORACLE_SQL = {
    "text_gopher_rules": _GOPHER_ORACLE,
    "text_pii_redaction": _PII_ORACLE,
    "events_markov_transitions": """
        WITH pairs AS (
          SELECT event_type AS from_type,
                 LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          FROM events
        ),
        trans AS (
          SELECT from_type, to_type, COUNT(*) AS n
          FROM pairs WHERE to_type IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               FLOOR(CAST(n AS DOUBLE)
                     / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
                     * 1e6) / 1e6 AS p
        FROM trans
    """,
    "text_gopher_survivors": _NORM + r""",
base AS (
  SELECT doc_id, ntext,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         ROUND(CAST(length(replace(ntext, ' ', '')) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
         CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS BIGINT) AS n_stopwords,
         CASE WHEN length(text) > 0 THEN
           ROUND(CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}\-]', '', 'g')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE), 6) END AS symbol_frac,
         ROUND(CAST(list_max(list_transform(list_distinct(toks),
                 u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) AS top_unigram_share
  FROM tok
),
kept AS (
  SELECT doc_id, n_tokens, md5(ntext) AS fp
  FROM base
  WHERE NOT (n_tokens < 15 OR n_tokens > 100000
             OR mean_word_len < 2.0 OR mean_word_len > 10.0
             OR n_stopwords < 2 OR COALESCE(symbol_frac > 0.1, FALSE)
             OR top_unigram_share > 0.2)
)
SELECT doc_id, n_tokens FROM (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM kept
) WHERE rn = 1
""",
    "text_exact_decontaminate": _NORM + """,
        ev AS (
          SELECT doc_id AS eval_id,
                 array_to_string((string_split(ntext, ' '))[1:8], ' ') AS phrase
          FROM tok
          WHERE doc_id % 10 = 7 AND len(string_split(ntext, ' ')) >= 8
        )
        SELECT t.doc_id AS doc_id,
               COUNT(*) AS n_eval_phrases,
               MIN(ev.eval_id) AS first_eval_id
        FROM tok t, ev
        WHERE t.doc_id % 10 <> 7 AND strpos(t.ntext, ev.phrase) > 0
        GROUP BY t.doc_id
    """,
    "scalar_props_map_entries": """
        SELECT event_type, k AS key,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS BIGINT) AS sum_val,
               MIN(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS min_val,
               MAX(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS max_val
        FROM (SELECT *, unnest(json_keys(props)) AS k FROM events)
        GROUP BY 1, 2
    """,
    "events_user_value_deciles": """
        WITH pu AS (
          SELECT user_id,
                 CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
          FROM events GROUP BY user_id
        ), b AS (
          SELECT quantile_cont(total_value,
                   [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds
          FROM pu
        ), d AS (
          SELECT total_value,
                 CAST(1 + len(list_filter(b.bounds, x -> pu.total_value > x)) AS BIGINT) AS decile
          FROM pu CROSS JOIN b
        )
        SELECT decile, COUNT(*) AS n_users,
               ROUND(CAST(SUM(CAST(total_value AS DECIMAL(27,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_ltv,
               ROUND(MIN(total_value), 6) AS min_ltv,
               ROUND(MAX(total_value), 6) AS max_ltv
        FROM d GROUP BY decile
    """,
    "events_interarrival_quantiles": """
        WITH e AS (
          SELECT user_id, event_type, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events
        ), g AS (
          SELECT event_type,
                 us - LAG(us) OVER (PARTITION BY user_id, event_type
                                    ORDER BY us, event_id) AS gap_us
          FROM e
        ), gg AS (SELECT * FROM g WHERE gap_us IS NOT NULL)
        SELECT event_type, COUNT(*) AS n_gaps,
               ROUND(quantile_cont(gap_us, 0.5) / 1e6, 6) AS p50_s,
               ROUND(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_s,
               ROUND(quantile_cont(gap_us, 0.99) / 1e6, 6) AS p99_s,
               ROUND(CAST(SUM(CAST(gap_us AS DECIMAL(27,0))) AS DOUBLE)
                     / COUNT(*) / 1e6, 6) AS mean_s
        FROM gg GROUP BY event_type
    """,
    "text_bigram_logprob": _NORM + """,
        ts AS (
          SELECT doc_id, unnest(toks) AS tokn,
                 generate_subscripts(toks, 1) AS pos
          FROM tok
        ),
        pairs AS (
          SELECT a.doc_id, a.tokn AS w1, b.tokn AS w2
          FROM ts a JOIN ts b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        uni AS (
          SELECT tokn, CAST(COUNT(*) AS DOUBLE)
                       / SUM(CAST(COUNT(*) AS DOUBLE)) OVER () AS p_uni
          FROM ts GROUP BY tokn
        ),
        ctx AS (SELECT w1, COUNT(*) AS cw1 FROM pairs GROUP BY w1),
        bigc AS (SELECT w1, w2, COUNT(*) AS cb FROM pairs GROUP BY w1, w2)
        SELECT doc_id, COUNT(*) AS n_bigrams,
               ROUND(CAST(SUM(CAST(
                 -LN(0.9 * (CAST(cb AS DOUBLE) / CAST(cw1 AS DOUBLE))
                     + 0.1 * p_uni) AS DECIMAL(27,12))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_neg_logprob
        FROM pairs
        JOIN bigc USING (w1, w2)
        JOIN ctx USING (w1)
        JOIN uni ON uni.tokn = pairs.w2
        GROUP BY doc_id
    """,
    "events_session_stats": """
        WITH tagged AS (
          SELECT user_id, event_id, event_type, value,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                           - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                           > 1800 * 1000000
                       OR LAG(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT *,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM tagged
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               CAST(FLOOR((MAX(us) - MIN(us)) / 1000000.0) AS BIGINT) AS duration_s,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE), 6) AS total_value,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS converted
        FROM sess
        GROUP BY user_id, session_id
    """,
    "events_ab_test_lift": """
        WITH per_user AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposed,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14 AS INT) AS converted
          FROM events GROUP BY user_id
        ),
        tagged AS (
          SELECT *,
                 CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 8)) AS UBIGINT) % 10000 < 5000
                      THEN 'A' ELSE 'B' END AS variant
          FROM per_user WHERE exposed = 1
        ),
        g AS (
          SELECT variant, COUNT(*) AS n_users,
                 CAST(SUM(converted) AS BIGINT) AS n_converted
          FROM tagged GROUP BY variant
        ),
        x AS (
          SELECT variant, n_users, n_converted,
                 CAST(MAX(CASE WHEN variant = 'A' THEN n_users END) OVER () AS DOUBLE) AS na,
                 CAST(MAX(CASE WHEN variant = 'A' THEN n_converted END) OVER () AS DOUBLE) AS ca,
                 CAST(MAX(CASE WHEN variant = 'B' THEN n_users END) OVER () AS DOUBLE) AS nb,
                 CAST(MAX(CASE WHEN variant = 'B' THEN n_converted END) OVER () AS DOUBLE) AS cb
          FROM g
        )
        SELECT variant, n_users, n_converted,
               FLOOR(CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) * 1e6) / 1e6 AS conv_rate,
               FLOOR((cb / nb - ca / na) * 1e6) / 1e6 AS lift_b_minus_a,
               CASE WHEN ((ca + cb) / (na + nb)) * (1 - (ca + cb) / (na + nb))
                         * (1 / na + 1 / nb) > 0
                    THEN FLOOR((cb / nb - ca / na)
                         / SQRT(((ca + cb) / (na + nb)) * (1 - (ca + cb) / (na + nb))
                                * (1 / na + 1 / nb)) * 1e6) / 1e6
               END AS z_stat
        FROM x
    """,
    "events_chi2_independence": """
        WITH obs AS (
          SELECT event_type,
                 CASE WHEN value < 10 THEN 'lo'
                      WHEN value < 100 THEN 'mid'
                      ELSE 'hi' END AS value_band,
                 COUNT(*) AS n_obs
          FROM events
          GROUP BY 1, 2
        ),
        cell AS (
          SELECT event_type, value_band, n_obs,
                 FLOOR(CAST(SUM(n_obs) OVER (PARTITION BY event_type) AS DOUBLE)
                       * CAST(SUM(n_obs) OVER (PARTITION BY value_band) AS DOUBLE)
                       / CAST(SUM(n_obs) OVER () AS DOUBLE) * 1e6) / 1e6 AS n_expected,
                 FLOOR(
                   (CAST(n_obs AS DOUBLE)
                    - CAST(SUM(n_obs) OVER (PARTITION BY event_type) AS DOUBLE)
                      * CAST(SUM(n_obs) OVER (PARTITION BY value_band) AS DOUBLE)
                      / CAST(SUM(n_obs) OVER () AS DOUBLE))
                   * (CAST(n_obs AS DOUBLE)
                    - CAST(SUM(n_obs) OVER (PARTITION BY event_type) AS DOUBLE)
                      * CAST(SUM(n_obs) OVER (PARTITION BY value_band) AS DOUBLE)
                      / CAST(SUM(n_obs) OVER () AS DOUBLE))
                   / (CAST(SUM(n_obs) OVER (PARTITION BY event_type) AS DOUBLE)
                      * CAST(SUM(n_obs) OVER (PARTITION BY value_band) AS DOUBLE)
                      / CAST(SUM(n_obs) OVER () AS DOUBLE))
                   * 1e6) / 1e6 AS chi2_cell
          FROM obs
        )
        SELECT event_type, value_band, n_obs, n_expected, chi2_cell,
               CAST(SUM(CAST(chi2_cell AS DECIMAL(27,6))) OVER () AS DOUBLE) AS chi2_total
        FROM cell
    """,
    "events_top_paths": """
        WITH seq AS (
          SELECT event_type,
                 LEAD(event_type, 1) OVER w AS t1,
                 LEAD(event_type, 2) OVER w AS t2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT concat_ws('>', event_type, t1, t2) AS path,
               COUNT(*) AS n_paths
        FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        GROUP BY 1
        ORDER BY n_paths DESC, path ASC
        LIMIT 20
    """,
    "text_decontaminate": _NORM + r""",
        docs5 AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(toks)-4, 1) + 1),
                   i -> array_to_string(toks[i:least(i+4, len(toks))], ' ')
                 )) AS shingleset
          FROM tok
        ),
        sh5 AS (SELECT doc_id, unnest(shingleset) AS shingle FROM docs5),
        ev AS (SELECT doc_id AS eval_id, shingle FROM sh5 WHERE doc_id % 10 = 7),
        tr AS (SELECT doc_id, shingle FROM sh5 WHERE doc_id % 10 <> 7)
        SELECT tr.doc_id,
               COUNT(DISTINCT tr.shingle) AS n_shared_shingles,
               COUNT(DISTINCT ev.eval_id) AS n_eval_docs
        FROM tr JOIN ev ON tr.shingle = ev.shingle
        GROUP BY tr.doc_id
    """,
    "text_repetition_score": _NORM + r"""
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_ratio,
               ROUND(CAST(list_max(list_transform(list_distinct(toks),
                     d -> len(list_filter(toks, t -> t = d)))) AS DOUBLE)
                     / len(toks), 6) AS top_token_frac
        FROM tok
    """,
    "text_unigram_logprob": _NORM + r""",
        tk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
        vocab AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY token),
        tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab)
        SELECT doc_id, COUNT(*) AS n_tokens,
               ROUND(CAST(SUM(CAST(-ln(cnt / total) AS DECIMAL(27,12)))
                          AS DOUBLE) / COUNT(*), 6) AS avg_neg_logprob
        FROM tk JOIN vocab USING (token) CROSS JOIN tot
        GROUP BY doc_id
    """,
    "text_corpus_report": r"""
        WITH tok AS (
          SELECT doc_id, source, text,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                      '[.,!?;:''"()\[\]{}\-]', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks
          FROM documents
        ),
        scored AS (
          SELECT source,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 ROUND(GREATEST(LEAST(
                   (CASE WHEN len(toks) >= 5 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END)
                   * (0.5 + 0.5 * (CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
                      - (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}\-]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END)),
                   1.0), 0.0), 6) AS quality,
                 CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es) AND s_en >= 1 THEN 1 ELSE 0 END AS is_en
          FROM (
            SELECT *,
                   len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS s_en,
                   len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein'))) AS s_de,
                   len(list_filter(toks, t -> t IN ('le','la','les','et','est','un'))) AS s_fr,
                   len(list_filter(toks, t -> t IN ('el','la','los','y','es','un'))) AS s_es
            FROM tok
          )
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(CAST(SUM(CAST(quality AS DECIMAL(27,12))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_quality,
               CAST(SUM(is_en) AS BIGINT) AS n_en
        FROM scored GROUP BY source
    """,
    "pack_training_sequences": _NORM + r"""
        SELECT doc_id, source,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST((cum - len(toks)) // 128 AS BIGINT) AS start_chunk,
               CAST((cum - 1) // 128 AS BIGINT) AS end_chunk
        FROM (
          SELECT t.doc_id, d.source, t.toks,
                 SUM(len(t.toks)) OVER (
                   PARTITION BY d.source ORDER BY t.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum
          FROM tok t JOIN documents d ON d.doc_id = t.doc_id
        )
    """,
    "sample_domain_mixture": """
        SELECT source, COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN
                 CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8)) AS UBIGINT) % 10000
                 < (CASE CAST(substring(source, 4) AS INT) % 4
                      WHEN 0 THEN 10000 WHEN 1 THEN 5000
                      WHEN 2 THEN 2500 ELSE 1250 END)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM documents GROUP BY source
    """,
    "sample_temperature_mixture": """
        WITH counts AS (
          SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
        ),
        sh AS (
          SELECT source, n_total,
                 CAST(CAST(sqrt(CAST(n_total AS DOUBLE)) AS DECIMAL(27,12)) AS DOUBLE)
                 / CAST(SUM(CAST(sqrt(CAST(n_total AS DOUBLE)) AS DECIMAL(27,12))) OVER () AS DOUBLE)
                 AS target_share
          FROM counts
        ),
        rt AS (
          SELECT source, n_total, target_share,
                 (target_share / n_total) / MAX(target_share / n_total) OVER () AS rate
          FROM sh
        )
        SELECT d.source,
               MAX(r.n_total) AS n_total,
               ROUND(MAX(r.target_share), 6) AS target_share,
               CAST(SUM(CASE WHEN
                 CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8)) AS UBIGINT) % 10000
                 < CAST(ROUND(r.rate * 10000) AS INT)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM documents d JOIN rt r ON d.source = r.source
        GROUP BY d.source
    """,
    "text_ngram_novelty": _SHINGLE_DOCS + """,
        dfc AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY shingle)
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN d.df_count = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
               ROUND(SUM(CASE WHEN d.df_count = 1 THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
        FROM sh s JOIN dfc d ON s.shingle = d.shingle
        GROUP BY s.doc_id
    """,
    "events_power_users_pareto": """
        WITH per_user AS (
          SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
        )
        , total AS (SELECT COUNT(*) AS total_events FROM events),
        topk AS (
          SELECT user_id, n_events FROM per_user
          ORDER BY n_events DESC, user_id ASC LIMIT 100
        )
        SELECT user_id, n_events,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
               ROUND(SUM(n_events) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / CAST((SELECT total_events FROM total) AS DOUBLE), 6) AS cum_event_share
        FROM topk
        WINDOW w AS (ORDER BY n_events DESC, user_id ASC)
    """,
    "events_burst_detection": """
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(n_burst AS BIGINT) AS n_burst
        FROM (
          SELECT event_id, user_id, ts,
                 COUNT(*) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(epoch(CAST(ts AS TIMESTAMP)) AS BIGINT)
                   RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW
                 ) AS n_burst
          FROM events
        )
        WHERE n_burst >= 3
    """,
    "events_longest_streak": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
          FROM events
        ),
        islands AS (
          SELECT user_id, day,
                 day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
          FROM ud
        ),
        streaks AS (
          SELECT user_id, anchor, COUNT(*) AS streak_days
          FROM islands GROUP BY user_id, anchor
        )
        SELECT user_id,
               CAST(MAX(streak_days) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks
        FROM streaks GROUP BY user_id
    """,
    "sample_train_test_split": """
        SELECT doc_id,
               CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':r1'), 1, 8)) AS UBIGINT) % 10000 < 2000
                    THEN 'test' ELSE 'train' END AS split
        FROM documents
    """,
    "sample_split_leakage": _SHINGLE_DOCS + """,
        rare AS (
          SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a
          JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        ),
        pairs AS (
          SELECT id_a, id_b,
                 ROUND(len(list_intersect(da.shingleset, db.shingleset))
                       / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) AS jaccard
          FROM cand
          JOIN docs da ON da.doc_id = id_a
          JOIN docs db ON db.doc_id = id_b
          WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
                / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.1
        ),
        tagged AS (
          SELECT id_a, id_b, jaccard,
                 CASE WHEN CAST(('0x' || substring(md5(CAST(id_a AS VARCHAR) || ':r1'), 1, 8)) AS UBIGINT) % 10000 < 2000
                      THEN 'test' ELSE 'train' END AS split_a,
                 CASE WHEN CAST(('0x' || substring(md5(CAST(id_b AS VARCHAR) || ':r1'), 1, 8)) AS UBIGINT) % 10000 < 2000
                      THEN 'test' ELSE 'train' END AS split_b
          FROM pairs
        )
        SELECT id_a, id_b, jaccard, split_a, split_b
        FROM tagged WHERE split_a <> split_b
    """,
    "text_bigram_vocab": _NORM + r""",
        bg AS (
          SELECT unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i + 1]
                 )) AS bigram
          FROM tok
        )
        SELECT bigram, COUNT(*) AS n_occurrences
        FROM bg GROUP BY bigram
        ORDER BY n_occurrences DESC, bigram ASC LIMIT 200
    """,
    "events_retention_cohorts": """
        WITH e AS (
          SELECT user_id,
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
          FROM events
        ),
        cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id)
        SELECT c.cohort_week,
               CAST((e.week - c.cohort_week) / 7 AS BIGINT) AS week_offset,
               COUNT(DISTINCT e.user_id) AS n_active_users
        FROM e JOIN cohort c ON e.user_id = c.user_id
        GROUP BY 1, 2
    """,
    "dedup_editdistance_verify": _SHINGLE_DOCS + """,
        rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        ),
        jpairs AS (
          SELECT id_a, id_b FROM cand
          JOIN docs da ON da.doc_id = id_a
          JOIN docs db ON db.doc_id = id_b
          WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
                / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.1
        )
        SELECT p.id_a, p.id_b,
               CAST(levenshtein(na.ntext, nb.ntext) AS BIGINT) AS edit_dist,
               ROUND(levenshtein(na.ntext, nb.ntext)
                     / CAST(GREATEST(length(na.ntext), length(nb.ntext)) AS DOUBLE), 6) AS rel_dist
        FROM jpairs p
        JOIN norm na ON na.doc_id = p.id_a
        JOIN norm nb ON nb.doc_id = p.id_b
        WHERE ROUND(levenshtein(na.ntext, nb.ntext)
                    / CAST(GREATEST(length(na.ntext), length(nb.ntext)) AS DOUBLE), 6) <= 0.2
    """,
    "events_rolling_active_users": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
          FROM events
        ),
        dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
        win AS (
          SELECT user_id, day + CAST(x AS INTEGER) AS win_day
          FROM ud, (SELECT unnest(range(0, 7)) AS x)
        ),
        wau AS (
          SELECT win_day, COUNT(DISTINCT user_id) AS wau
          FROM win WHERE win_day IN (SELECT day FROM ud)
          GROUP BY win_day
        )
        SELECT d.day AS day, d.dau AS dau, w.wau AS wau
        FROM dau d JOIN wau w ON d.day = w.win_day
    """,
    "events_cuped_adjustment": """
        WITH pu AS (
          SELECT user_id,
                 CAST(SUM(CAST(CASE WHEN CAST(ts AS TIMESTAMP)
                                         < TIMESTAMP '2024-01-16'
                                    THEN value ELSE 0.0 END
                               AS DECIMAL(27,6))) AS DOUBLE) AS x,
                 CAST(SUM(CAST(CASE WHEN CAST(ts AS TIMESTAMP)
                                         >= TIMESTAMP '2024-01-16'
                                    THEN value ELSE 0.0 END
                               AS DECIMAL(27,6))) AS DOUBLE) AS y
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1
        ), pv AS (
          SELECT *,
                 CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 8)) AS UBIGINT) % 10000 < 5000
                      THEN 'A' ELSE 'B' END AS variant
          FROM pu
        ), comp AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx
          FROM pv
        ), pooled AS (
          SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
                 sx / n AS mean_x
          FROM comp
        ), adj AS (
          SELECT pv.*, y - theta * (x - mean_x) AS y_adj
          FROM pv, pooled
        ), per_variant AS (
          SELECT variant, COUNT(*) AS n_users,
                 CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                   / COUNT(*) AS raw_m,
                 CAST(SUM(CAST(y_adj AS DECIMAL(38,12))) AS DOUBLE)
                   / COUNT(*) AS adj_m
          FROM adj GROUP BY 1
        ), var_comp AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS vn,
                 CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS vsy,
                 CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS vsyy,
                 CAST(SUM(CAST(y_adj AS DECIMAL(38,12))) AS DOUBLE) AS vsa,
                 CAST(SUM(CAST(y_adj * y_adj AS DECIMAL(38,12))) AS DOUBLE) AS vsaa
          FROM adj
        ), reduction AS (
          SELECT 1 - (vn * vsaa - vsa * vsa) / (vn * vsyy - vsy * vsy)
                   AS var_reduction
          FROM var_comp
        )
        SELECT variant, n_users,
               FLOOR(raw_m * 1e6) / 1e6 AS raw_mean,
               FLOOR(adj_m * 1e6) / 1e6 AS adjusted_mean,
               FLOOR((SELECT theta FROM pooled) * 1e6) / 1e6 AS theta,
               FLOOR((SELECT var_reduction FROM reduction) * 1e6) / 1e6
                 AS var_reduction
        FROM per_variant
    """,
    "events_conversion_survival": """
        WITH e AS (
          SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        ), pu AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv
          FROM e GROUP BY 1
        ), pu2 AS (
          SELECT p.user_id, p.tv,
                 MIN(CASE WHEN e.event_type = 'purchase'
                           AND e.ts >= p.tv THEN e.ts END) AS tp
          FROM pu p JOIN e ON e.user_id = p.user_id
          WHERE p.tv IS NOT NULL
          GROUP BY 1, 2
        ), mx AS (
          SELECT MAX(COALESCE(tp, tv)) AS mx FROM pu2
        ), durs AS (
          SELECT COALESCE(date_diff('day', CAST(tv AS DATE), CAST(tp AS DATE)),
                          date_diff('day', CAST(tv AS DATE),
                                    CAST((SELECT mx FROM mx) AS DATE))) AS t,
                 CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event
          FROM pu2
        ), grid AS (
          SELECT t, COUNT(*) AS m, CAST(SUM(event) AS BIGINT) AS k
          FROM durs GROUP BY 1
        ), km AS (
          SELECT t, m, k,
                 (SELECT SUM(m) FROM grid) -
                 COALESCE(SUM(m) OVER (ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS risk
          FROM grid
        ), km2 AS (
          SELECT t, risk, k,
                 1 - CAST(k AS DOUBLE) / CAST(risk AS DOUBLE) AS factor
          FROM km
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(risk AS BIGINT) AS n_at_risk,
               k AS n_converted,
               ROUND(CASE WHEN MAX(CASE WHEN factor = 0 THEN 1 ELSE 0 END)
                            OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                          THEN 0.0
                          ELSE EXP(SUM(CASE WHEN factor > 0 THEN LN(factor) END)
                               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
                     END, 6) AS survival
        FROM km2
    """,
    "events_funnel": """
        WITH u AS (SELECT DISTINCT user_id FROM events),
        v AS (
          SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
          FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.t_view
          GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t_click
          GROUP BY e.user_id
        )
        SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
               CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
                         WHEN c.t_click IS NOT NULL THEN 2
                         WHEN v.t_view IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS stage_reached
        FROM u
        LEFT JOIN v ON u.user_id = v.user_id
        LEFT JOIN c ON u.user_id = c.user_id
        LEFT JOIN p ON u.user_id = p.user_id
    """,
    "sample_stratified_events": """
        SELECT event_type, COUNT(*) AS n_sampled
        FROM events
        WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':ev'), 1, 8)) AS UBIGINT) % 10000 < 1000
        GROUP BY event_type
    """,
    "dedup_components": _SHINGLE_DOCS.replace("WITH norm", "WITH RECURSIVE norm", 1) + """,
        rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        ),
        pairs AS (
          SELECT id_a, id_b FROM cand
          JOIN docs da ON da.doc_id = id_a
          JOIN docs db ON db.doc_id = id_b
          WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
                / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.35
        ),
        sym AS (SELECT id_a AS u, id_b AS v FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u, v FROM sym
          UNION
          SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
        )
        SELECT u AS doc_id,
               CAST(LEAST(u, MIN(v)) AS BIGINT) AS component
        FROM reach GROUP BY u
    """,
    "dedup_component_survivors": _SHINGLE_DOCS.replace(
        "WITH norm", "WITH RECURSIVE norm", 1
    ) + """,
        rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        ),
        pairs AS (
          SELECT id_a, id_b FROM cand
          JOIN docs da ON da.doc_id = id_a
          JOIN docs db ON db.doc_id = id_b
          WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
                / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.35
        ),
        sym AS (SELECT id_a AS u, id_b AS v FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u, v FROM sym
          UNION
          SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
        ),
        comp AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
          FROM reach GROUP BY u
        )
        SELECT d.doc_id, d.n_chars
        FROM documents d
        WHERE d.doc_id NOT IN (
          SELECT doc_id FROM comp WHERE doc_id <> component
        )
    """,
    "dedup_representative_survivors": _SHINGLE_DOCS.replace(
        "WITH norm", "WITH RECURSIVE norm", 1
    ) + """,
        rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        ),
        pairs AS (
          SELECT id_a, id_b FROM cand
          JOIN docs da ON da.doc_id = id_a
          JOIN docs db ON db.doc_id = id_b
          WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
                / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.35
        ),
        sym AS (SELECT id_a AS u, id_b AS v FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
        reach AS (
          SELECT u, v FROM sym
          UNION
          SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
        ),
        comp AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
          FROM reach GROUP BY u
        ),
        deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
        rep AS (
          SELECT component, c.doc_id AS rep_node,
                 ROW_NUMBER() OVER (PARTITION BY component
                                    ORDER BY deg DESC, c.doc_id ASC) AS rn
          FROM comp c JOIN deg ON c.doc_id = deg.u
        )
        SELECT d.doc_id, d.n_chars
        FROM documents d
        WHERE d.doc_id NOT IN (
          SELECT c.doc_id
          FROM comp c
          JOIN rep r ON c.component = r.component AND r.rn = 1
          WHERE c.doc_id <> r.rep_node
        )
    """,
    "curate_training_corpus": _CURATE_CTES + """
        SELECT doc_id, n_tokens, quality FROM exact
        WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs)
    """,
    "curate_chunk_corpus": _CURATE_CTES + """,
        surv AS (
          SELECT doc_id, toks FROM exact
          WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs)
        ),
        cst AS (
          SELECT doc_id, toks,
                 unnest(range(1, greatest(len(toks), 1) + 1, 24)) AS start
          FROM surv
        )
        SELECT doc_id,
               CAST((start - 1) / 24 AS BIGINT) AS chunk_id,
               array_to_string(toks[start:least(start + 31, len(toks))], ' ') AS chunk_text,
               CAST(least(32, len(toks) - start + 1) AS BIGINT) AS n_chunk_tokens
        FROM cst
        WHERE start = 1 OR start - 24 + 31 < len(toks)
    """,
    "text_bpe_token_count": _NORM + r"""
        SELECT doc_id,
               CAST(len(string_split(ntext, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(list_filter(
                   regexp_extract_all(ntext,
                     '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9'']+|\s+'),
                   t -> trim(t) != '')) AS BIGINT) AS n_bpe_tokens
        FROM tok
    """,
    "text_stats": _NORM + f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_computed,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\\[\\]{{}}\\-]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(len(list_filter(toks, t -> t IN {_STOP_EN})) AS BIGINT) AS n_stopwords,
               ROUND(GREATEST(LEAST(
                 (CASE WHEN len(toks) >= 5 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END)
                 * (0.5 + 0.5 * (CAST(len(list_filter(toks, t -> t IN {_STOP_EN})) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
                    - (CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\\[\\]{{}}\\-]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END)),
                 1.0), 0.0), 6) AS quality
        FROM tok
    """,
    "text_lang_id": _NORM + """
        SELECT doc_id,
               CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es) AND s_en >= 1 THEN 'en'
                    WHEN s_de >= GREATEST(s_fr, s_es) AND s_de >= 1 THEN 'de'
                    WHEN s_fr >= s_es AND s_fr >= 1 THEN 'fr'
                    WHEN s_es >= 1 THEN 'es'
                    ELSE 'und' END AS lang_pred
        FROM (
          SELECT doc_id,
                 len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS s_en,
                 len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein'))) AS s_de,
                 len(list_filter(toks, t -> t IN ('le','la','les','et','est','un'))) AS s_fr,
                 len(list_filter(toks, t -> t IN ('el','la','los','y','es','un'))) AS s_es
          FROM tok
        )
    """,
    "text_fingerprint_groups": _NORM + """
        SELECT md5(ntext) AS fingerprint,
               MIN(doc_id) AS keeper_id,
               COUNT(*) AS n_docs
        FROM norm GROUP BY md5(ntext)
    """,
    "dedup_exact_survivors": _NORM + """
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id IN (
          SELECT MIN(doc_id) FROM norm GROUP BY md5(ntext)
        )
    """,
    "dedup_ngram_jaccard": _SHINGLE_DOCS + """,
        rare AS (
          SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a
          JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        )
        SELECT id_a, id_b,
               ROUND(len(list_intersect(da.shingleset, db.shingleset))
                     / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) AS jaccard
        FROM cand
        JOIN docs da ON da.doc_id = id_a
        JOIN docs db ON db.doc_id = id_b
        WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
              / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.1
    """,
    "text_chunk_overlap": _NORM + r""",
        st AS (
          SELECT doc_id, toks,
                 unnest(range(1, greatest(len(toks), 1) + 1, 24)) AS start
          FROM tok WHERE ntext <> ''
        )
        SELECT doc_id,
               CAST((start - 1) / 24 AS BIGINT) AS chunk_id,
               array_to_string(toks[start:least(start + 31, len(toks))], ' ') AS chunk_text,
               CAST(least(32, len(toks) - start + 1) AS BIGINT) AS n_chunk_tokens
        FROM st
        WHERE start = 1 OR start - 24 + 31 < len(toks)
    """,
    "dedup_incremental_fuzzy": _SHINGLE_DOCS + """,
        rare AS (
          SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
          FROM sh a
          JOIN sh b ON a.shingle = b.shingle
          WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
            AND a.shingle IN (SELECT shingle FROM rare)
        )
        SELECT batch_id, corpus_id,
               ROUND(len(list_intersect(da.shingleset, db.shingleset))
                     / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) AS jaccard
        FROM cand
        JOIN docs da ON da.doc_id = batch_id
        JOIN docs db ON db.doc_id = corpus_id
        WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
              / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.1
    """,
    "dedup_incremental_batch": _NORM + r""",
        fp AS (SELECT doc_id, md5(ntext) AS fp FROM norm),
        batch AS (
          SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_batch_dups
          FROM fp WHERE doc_id % 5 = 0 GROUP BY fp
        )
        SELECT b.doc_id, b.fp, b.n_batch_dups
        FROM batch b
        WHERE NOT EXISTS (
          SELECT 1 FROM fp c WHERE c.doc_id % 5 <> 0 AND c.fp = b.fp
        )
    """,
    "text_tfidf_top_terms": _NORM + r""",
        t AS (SELECT doc_id, unnest(toks) AS term FROM tok),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM t WHERE term <> '' GROUP BY doc_id, term
        ),
        d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, d.df,
                 ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
          FROM tf JOIN d USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS BIGINT) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term
          ) AS rnk FROM scored
        )
        WHERE rnk <= 3
    """,
    "sample_source_cap": """
        SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
        FROM (
          SELECT doc_id, source, ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
          ) AS rn
          FROM documents
        )
        WHERE rn <= 20
    """,
    "sample_weighted_reservoir": """
        WITH t AS (
          SELECT doc_id, n_chars,
                 LN((CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':res'), 1, 13)) AS UBIGINT)
                          AS DOUBLE) + 0.5) / 4503599627370496.0)
                 / CAST(n_chars AS DOUBLE) AS k
          FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, n_chars FROM t
        ORDER BY k DESC, doc_id ASC
        LIMIT 100
    """,
    "sample_training_shuffle": """
        WITH t AS (
          SELECT doc_id,
                 CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':shuffle'), 1, 8)) AS UBIGINT)
                      % 10000 % 64 AS INTEGER) AS shard,
                 md5(CAST(doc_id AS VARCHAR) || ':shuffle:k') AS k
          FROM documents
        )
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
        FROM t
    """,
    "text_length_histogram": _NORM + """
        , lens AS (SELECT len(toks) AS n_tokens FROM tok),
        hist AS (
          SELECT CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS len_bin,
                 COUNT(*) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
          FROM lens GROUP BY 1
        )
        SELECT len_bin, n_docs, sum_tokens,
               ROUND(CAST(SUM(n_docs) OVER (ORDER BY len_bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / SUM(n_docs) OVER (), 6) AS cum_doc_share
        FROM hist
    """,
}




def dedup_component_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster diagnostics over the near-dup graph: how many
    components of each size — the first thing to look at before
    trusting a dedup pass (a giant component means the blocking
    threshold is too loose; all-size-2 means near-dups are pairwise
    only and transitive closure was unnecessary).

    Scale: piggybacks on the O(log n) contraction output; both
    follow-on aggregations are on |components| rows."""
    comp = dedup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components")
    )


QUERIES["dedup_component_size_histogram"] = dedup_component_size_histogram
ORACLE_SQL["dedup_component_size_histogram"] = f"""
    SELECT size, COUNT(*) AS n_components
    FROM (
      SELECT component, COUNT(*) AS size
      FROM ({ORACLE_SQL["dedup_components"]})
      GROUP BY component
    )
    GROUP BY size
"""


def text_lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-predicted language confusion matrix — the accuracy
    readout for the heuristic lang-ID against the corpus's own labels,
    with per-declared-language recall share. Single scan, one
    aggregate over an O(langs²) grid, a bounded window for the share
    denominator."""
    from pyspark.sql import Window

    enr = TX.with_text_stats(_docs(spark, sf_dir)).select("lang", "lang_pred")
    grid = enr.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return grid.select(
        "lang",
        "lang_pred",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("share_of_declared"),
    )


def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, hours from first view
    to first purchase at-or-after it, rolled up per first-touch cohort
    day — the latency companion to events_funnel (that query counts
    WHO converts; this one measures HOW LONG conversion takes).

    Deltas are integer microseconds (exact on both engines); the
    percentile interpolates over those integers (sort-based, engine-
    deterministic) and only the final division to hours rounds. One
    user_id shuffle serves both window passes and the collapse; the
    cohort rollup aggregates O(users) rows."""
    from pyspark.sql import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    w = Window.partitionBy("user_id")
    ev = (
        _events(spark, sf_dir)
        .select("user_id", "event_type", "ts")
        .withColumn("t_first", F.min("ts").over(w))
        .withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
    )
    ev = ev.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min("t_first").alias("t_first"),
            F.min("t_view").alias("t_view"),
            F.min("t_purchase").alias("t_purchase"),
        )
        .filter(F.col("t_view").isNotNull() & F.col("t_purchase").isNotNull())
        .select(
            F.date_trunc("day", "t_first").cast("date").alias("cohort_day"),
            (
                F.unix_micros("t_purchase") - F.unix_micros("t_view")
            ).alias("us_to_convert"),
        )
    )
    return per_user.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.round(
            F.expr("percentile(us_to_convert, 0.5)") / 3.6e9, 6
        ).alias("p50_hours"),
        F.round(
            F.expr("percentile(us_to_convert, 0.9)") / 3.6e9, 6
        ).alias("p90_hours"),
    )


def sample_stratified_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-20 weighted sample PER SOURCE (weight = n_chars) — the
    per-stratum curation budget, via
    operators/sampling.py:stratified_weighted_reservoir (A-ES key,
    ROW_NUMBER over the stratum). One shuffle on the stratum key; the
    oracle recomputes the identical 52-bit keys and must select the
    same rows."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        stratified_weighted_reservoir,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    return stratified_weighted_reservoir(
        docs, "doc_id", "n_chars", "source", 20, seed="res"
    )


QUERIES.update(
    {
        "text_lang_confusion_matrix": text_lang_confusion_matrix,
        "events_funnel_time_to_convert": events_funnel_time_to_convert,
        "sample_stratified_reservoir": sample_stratified_reservoir,
    }
)

ORACLE_SQL.update(
    {
        "text_lang_confusion_matrix": _NORM + """
        , enr AS (
          SELECT d.lang,
                 CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es) AND s_en >= 1 THEN 'en'
                      WHEN s_de >= GREATEST(s_fr, s_es) AND s_de >= 1 THEN 'de'
                      WHEN s_fr >= s_es AND s_fr >= 1 THEN 'fr'
                      WHEN s_es >= 1 THEN 'es'
                      ELSE 'und' END AS lang_pred
          FROM (
            SELECT doc_id,
                   len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS s_en,
                   len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein'))) AS s_de,
                   len(list_filter(toks, t -> t IN ('le','la','les','et','est','un'))) AS s_fr,
                   len(list_filter(toks, t -> t IN ('el','la','los','y','es','un'))) AS s_es
            FROM tok
          ) s JOIN documents d ON d.doc_id = s.doc_id
        ),
        grid AS (
          SELECT lang, lang_pred, COUNT(*) AS n_docs
          FROM enr GROUP BY 1, 2
        )
        SELECT lang, lang_pred, n_docs,
               ROUND(CAST(n_docs AS DOUBLE)
                     / SUM(n_docs) OVER (PARTITION BY lang), 6)
                 AS share_of_declared
        FROM grid
    """,
        "events_funnel_time_to_convert": """
        WITH ev AS (
          SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                 MIN(CAST(ts AS TIMESTAMP)) OVER w AS t_first,
                 MIN(CASE WHEN event_type = 'view'
                          THEN CAST(ts AS TIMESTAMP) END) OVER w AS t_view
          FROM events
          WINDOW w AS (PARTITION BY user_id)
        ),
        ev2 AS (
          SELECT *,
                 MIN(CASE WHEN event_type = 'purchase' AND ts >= t_view
                          THEN ts END)
                   OVER (PARTITION BY user_id) AS t_purchase
          FROM ev
        ),
        per_user AS (
          SELECT CAST(date_trunc('day', MIN(t_first)) AS DATE) AS cohort_day,
                 epoch_us(MIN(t_purchase)) - epoch_us(MIN(t_view)) AS us_to_convert
          FROM ev2
          GROUP BY user_id
          HAVING MIN(t_view) IS NOT NULL AND MIN(t_purchase) IS NOT NULL
        )
        SELECT cohort_day,
               COUNT(*) AS n_converters,
               ROUND(quantile_cont(us_to_convert, 0.5) / 3.6e9, 6) AS p50_hours,
               ROUND(quantile_cont(us_to_convert, 0.9) / 3.6e9, 6) AS p90_hours
        FROM per_user GROUP BY cohort_day
    """,
        "sample_stratified_reservoir": """
        WITH t AS (
          SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY
                     LN((CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':res'), 1, 13)) AS UBIGINT)
                              AS DOUBLE) + 0.5) / 4503599627370496.0)
                     / CAST(n_chars AS DOUBLE) DESC,
                     doc_id ASC
                 ) AS rn
          FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, source, n_chars FROM t WHERE rn <= 20
    """,
    }
)


def events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new users and cumulative reach — running DISTINCT users
    without a distinct-over-window (which Spark rightly refuses):
    collapse each user to their first-seen day (one user_id shuffle),
    count per day, then a window cumsum over the O(days) series — the
    same bounded-global-window pattern as window_rolling_range_avg."""
    from pyspark.sql import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    first_seen = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("first_day"))
    )
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    # single-partition window: bounded — daily is one row per calendar
    # day (first-seen counts), not per event
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cumulative_reach"),
    )


QUERIES.update({"events_cumulative_reach": events_cumulative_reach})

ORACLE_SQL.update(
    {
        "events_cumulative_reach": """
        WITH first_seen AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
          FROM events GROUP BY user_id
        ),
        daily AS (
          SELECT first_day AS day, COUNT(*) AS n_new_users
          FROM first_seen GROUP BY first_day
        )
        SELECT day, n_new_users,
               CAST(SUM(n_new_users) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cumulative_reach
        FROM daily
    """,
    }
)


def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: near-duplicate pairs (exact
    3-gram Jaccard, rare-shingle blocking — the dedup_ngram_jaccard
    machinery) rolled up by unordered SOURCE pair, with the mean
    Jaccard per cell — the data-governance view that tells a curation
    owner WHICH feeds duplicate each other (same-source cells measure
    internal redundancy; off-diagonal cells measure cross-feed
    copying, the thing source-weighted mixtures silently double-count).
    Pair generation is the blocked equi-join (scales); the rollup is
    O(source-pairs). Mean runs through a decimal sum."""
    pairs = DD.ngram_jaccard_pairs(_docs(spark, sf_dir))
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    enriched = (
        pairs.join(
            docs.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")
            ),
            "id_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")
            ),
            "id_b",
        )
        .select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
            "jaccard",
        )
    )
    return enriched.groupBy("source_lo", "source_hi").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.col("jaccard").cast("decimal(27,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_jaccard"),
    )


QUERIES.update({"dedup_cross_source_matrix": dedup_cross_source_matrix})

ORACLE_SQL.update(
    {
        "dedup_cross_source_matrix": _SHINGLE_DOCS + """,
        rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        ),
        pairs AS (
          SELECT id_a, id_b,
                 ROUND(len(list_intersect(da.shingleset, db.shingleset))
                   / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) AS jaccard
          FROM cand
          JOIN docs da ON da.doc_id = id_a
          JOIN docs db ON db.doc_id = id_b
          WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
                / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.35
        ),
        tagged AS (
          SELECT LEAST(xa.source, xb.source) AS source_lo,
                 GREATEST(xa.source, xb.source) AS source_hi,
                 jaccard
          FROM pairs
          JOIN documents xa ON xa.doc_id = id_a
          JOIN documents xb ON xb.doc_id = id_b
        )
        SELECT source_lo, source_hi, COUNT(*) AS n_pairs,
               ROUND(CAST(SUM(CAST(jaccard AS DECIMAL(27,12))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_jaccard
        FROM tagged GROUP BY source_lo, source_hi
    """,
    }
)


def dedup_containment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-containment near-dup pairs (|∩| / |smaller shingle set|,
    3-gram shingles, rare-shingle blocking, threshold 0.5) — the
    decontamination metric Jaccard cannot provide: a short document
    embedded verbatim in a long one scores containment ≈ 1 while its
    Jaccard stays near |short|/|long|. See
    ``operators/dedup.py:ngram_containment_pairs``."""
    return DD.ngram_containment_pairs(_docs(spark, sf_dir), threshold=0.5)


QUERIES.update({"dedup_containment_screen": dedup_containment_screen})

ORACLE_SQL.update(
    {
        "dedup_containment_screen": _SHINGLE_DOCS + """,
        rare AS (
          SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a
          JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (SELECT shingle FROM rare)
        )
        SELECT id_a, id_b,
               ROUND(len(list_intersect(da.shingleset, db.shingleset))
                     / CAST(LEAST(len(da.shingleset), len(db.shingleset)) AS DOUBLE), 6) AS containment
        FROM cand
        JOIN docs da ON da.doc_id = id_a
        JOIN docs db ON db.doc_id = id_b
        WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
              / CAST(LEAST(len(da.shingleset), len(db.shingleset)) AS DOUBLE), 6) >= 0.5
    """,
    }
)


def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch last-touch marketing attribution: every purchase is
    credited to the user's most recent PRECEDING touch (view or click)
    within a 7-day lookback, else to 'direct'; revenue and purchase
    counts roll up by day × attributed channel (the testdata spans one
    month, so the finer grain is what exercises the group-by). The batch twin of
    ``stream_stream_left_outer_attribution`` — same business question,
    answered over the full history with ZERO joins: one window pass
    carries the last non-null touch forward (``last(..., ignorenulls)``
    over ROWS UNBOUNDED PRECEDING..1 PRECEDING), so the 100 TB plan is
    one scan + one user_id exchange + one month×channel aggregation —
    no self-join of the fact table against itself, which is the naive
    attribution plan and quadratic in events-per-user. (One scan + one
    exchange feeds both the window and, via AQE re-use of the user_id
    partitioning, the aggregate's partial phase.)

    Ties: ordering is (ts, event_id), so a touch sharing a purchase's
    timestamp is NOT credited (strictly-preceding rows frame) — pinned
    deterministic on both engines. Revenue sums decimal-exact."""
    from pyspark.sql.window import Window

    from market_data_pipeline_databricks_spark.plans.relational import _events

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    ev = (
        _events(spark, sf_dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn(
            "lt_type",
            F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w),
        )
        .withColumn(
            "lt_ts",
            F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w),
        )
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("ts").cast("date").alias("day"),
            F.coalesce(
                F.when(
                    F.col("lt_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"),
                    F.col("lt_type"),
                ),
                F.lit("direct"),
            ).alias("channel"),
            "value",
        )
        .groupBy("day", "channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(27,12)"))
            .cast("double")
            .alias("revenue"),
        )
    )


QUERIES.update({"events_last_touch_attribution": events_last_touch_attribution})

ORACLE_SQL.update(
    {
        "events_last_touch_attribution": """
        WITH w AS (
          SELECT event_type, ts, value,
                 last_value(CASE WHEN event_type IN ('view','click')
                                 THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS lt_type,
                 last_value(CASE WHEN event_type IN ('view','click')
                                 THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS lt_ts
          FROM events
        )
        SELECT CAST(ts AS DATE) AS day,
               COALESCE(CASE WHEN lt_ts >= ts - INTERVAL 7 DAY
                             THEN lt_type END, 'direct') AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(27,12))) AS DOUBLE) AS revenue
        FROM w
        WHERE event_type = 'purchase'
        GROUP BY 1, 2
    """,
    }
)


_BPE_CHAIN = _NORM + r""",
words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(toks) AS word FROM tok)
  WHERE word <> '' GROUP BY word
),
w0 AS (
  SELECT word, freq,
         list_concat(regexp_split_to_array(word, ''), ['</w>']) AS syms
  FROM words
),
p0 AS (
  SELECT syms[x] AS w1, syms[x+1] AS w2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w0, unnest(range(1, len(syms))) t(x)
  GROUP BY 1, 2
),
b0 AS (
  SELECT w1 AS bw1, w2 AS bw2, cnt FROM p0
  ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1
),
w1 AS (
  SELECT word, freq,
    list_reduce(
      list_transform(syms, s -> [s]),
      (acc, x) -> CASE
        WHEN acc[-1] = bw1 AND x[1] = bw2
        THEN list_concat(list_slice(acc, 1, len(acc) - 1), [bw1 || bw2])
        ELSE list_concat(acc, x) END
    ) AS syms
  FROM w0, b0
),
p1 AS (
  SELECT syms[x] AS w1, syms[x+1] AS w2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w1, unnest(range(1, len(syms))) t(x)
  GROUP BY 1, 2
),
b1 AS (
  SELECT w1 AS bw1, w2 AS bw2, cnt FROM p1
  ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1
),
w2 AS (
  SELECT word, freq,
    list_reduce(
      list_transform(syms, s -> [s]),
      (acc, x) -> CASE
        WHEN acc[-1] = bw1 AND x[1] = bw2
        THEN list_concat(list_slice(acc, 1, len(acc) - 1), [bw1 || bw2])
        ELSE list_concat(acc, x) END
    ) AS syms
  FROM w1, b1
),
p2 AS (
  SELECT syms[x] AS w1, syms[x+1] AS w2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w2, unnest(range(1, len(syms))) t(x)
  GROUP BY 1, 2
),
b2 AS (
  SELECT w1 AS bw1, w2 AS bw2, cnt FROM p2
  ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1
),
w3 AS (
  SELECT word, freq,
    list_reduce(
      list_transform(syms, s -> [s]),
      (acc, x) -> CASE
        WHEN acc[-1] = bw1 AND x[1] = bw2
        THEN list_concat(list_slice(acc, 1, len(acc) - 1), [bw1 || bw2])
        ELSE list_concat(acc, x) END
    ) AS syms
  FROM w2, b2
),
p3 AS (
  SELECT syms[x] AS w1, syms[x+1] AS w2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w3, unnest(range(1, len(syms))) t(x)
  GROUP BY 1, 2
),
b3 AS (
  SELECT w1 AS bw1, w2 AS bw2, cnt FROM p3
  ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1
),
w4 AS (
  SELECT word, freq,
    list_reduce(
      list_transform(syms, s -> [s]),
      (acc, x) -> CASE
        WHEN acc[-1] = bw1 AND x[1] = bw2
        THEN list_concat(list_slice(acc, 1, len(acc) - 1), [bw1 || bw2])
        ELSE list_concat(acc, x) END
    ) AS syms
  FROM w3, b3
),
p4 AS (
  SELECT syms[x] AS w1, syms[x+1] AS w2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w4, unnest(range(1, len(syms))) t(x)
  GROUP BY 1, 2
),
b4 AS (
  SELECT w1 AS bw1, w2 AS bw2, cnt FROM p4
  ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1
),
w5 AS (
  SELECT word, freq,
    list_reduce(
      list_transform(syms, s -> [s]),
      (acc, x) -> CASE
        WHEN acc[-1] = bw1 AND x[1] = bw2
        THEN list_concat(list_slice(acc, 1, len(acc) - 1), [bw1 || bw2])
        ELSE list_concat(acc, x) END
    ) AS syms
  FROM w4, b4
),
p5 AS (
  SELECT syms[x] AS w1, syms[x+1] AS w2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w5, unnest(range(1, len(syms))) t(x)
  GROUP BY 1, 2
),
b5 AS (
  SELECT w1 AS bw1, w2 AS bw2, cnt FROM p5
  ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1
),
w6 AS (
  SELECT word, freq,
    list_reduce(
      list_transform(syms, s -> [s]),
      (acc, x) -> CASE
        WHEN acc[-1] = bw1 AND x[1] = bw2
        THEN list_concat(list_slice(acc, 1, len(acc) - 1), [bw1 || bw2])
        ELSE list_concat(acc, x) END
    ) AS syms
  FROM w5, b5
),
p6 AS (
  SELECT syms[x] AS w1, syms[x+1] AS w2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w6, unnest(range(1, len(syms))) t(x)
  GROUP BY 1, 2
),
b6 AS (
  SELECT w1 AS bw1, w2 AS bw2, cnt FROM p6
  ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1
),
w7 AS (
  SELECT word, freq,
    list_reduce(
      list_transform(syms, s -> [s]),
      (acc, x) -> CASE
        WHEN acc[-1] = bw1 AND x[1] = bw2
        THEN list_concat(list_slice(acc, 1, len(acc) - 1), [bw1 || bw2])
        ELSE list_concat(acc, x) END
    ) AS syms
  FROM w6, b6
),
p7 AS (
  SELECT syms[x] AS w1, syms[x+1] AS w2, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM w7, unnest(range(1, len(syms))) t(x)
  GROUP BY 1, 2
),
b7 AS (
  SELECT w1 AS bw1, w2 AS bw2, cnt FROM p7
  ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 1
),
w8 AS (
  SELECT word, freq,
    list_reduce(
      list_transform(syms, s -> [s]),
      (acc, x) -> CASE
        WHEN acc[-1] = bw1 AND x[1] = bw2
        THEN list_concat(list_slice(acc, 1, len(acc) - 1), [bw1 || bw2])
        ELSE list_concat(acc, x) END
    ) AS syms
  FROM w7, b7
)"""

ORACLE_SQL["text_bpe_train_merges"] = _BPE_CHAIN + """
SELECT merge_rank, left_ AS "left", right_ AS "right", pair_freq FROM (
SELECT CAST(0 AS BIGINT) AS merge_rank, bw1 AS left_, bw2 AS right_, cnt AS pair_freq FROM b0
UNION ALL
SELECT CAST(1 AS BIGINT) AS merge_rank, bw1 AS left_, bw2 AS right_, cnt AS pair_freq FROM b1
UNION ALL
SELECT CAST(2 AS BIGINT) AS merge_rank, bw1 AS left_, bw2 AS right_, cnt AS pair_freq FROM b2
UNION ALL
SELECT CAST(3 AS BIGINT) AS merge_rank, bw1 AS left_, bw2 AS right_, cnt AS pair_freq FROM b3
UNION ALL
SELECT CAST(4 AS BIGINT) AS merge_rank, bw1 AS left_, bw2 AS right_, cnt AS pair_freq FROM b4
UNION ALL
SELECT CAST(5 AS BIGINT) AS merge_rank, bw1 AS left_, bw2 AS right_, cnt AS pair_freq FROM b5
UNION ALL
SELECT CAST(6 AS BIGINT) AS merge_rank, bw1 AS left_, bw2 AS right_, cnt AS pair_freq FROM b6
UNION ALL
SELECT CAST(7 AS BIGINT) AS merge_rank, bw1 AS left_, bw2 AS right_, cnt AS pair_freq FROM b7
) ORDER BY merge_rank
"""


ORACLE_SQL["text_bpe_encode_stats"] = _BPE_CHAIN + """
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(w.syms)) AS BIGINT) AS n_bpe_tokens
FROM (SELECT doc_id, unnest(toks) AS word FROM tok) d
JOIN w8 w USING (word)
WHERE word <> ''
GROUP BY doc_id
"""


ORACLE_SQL["text_kneser_ney_bigram"] = _NORM + """,
ts AS (
  SELECT doc_id, unnest(toks) AS tokn,
         generate_subscripts(toks, 1) AS pos
  FROM tok
),
pairs AS (
  SELECT a.doc_id, a.tokn AS w1, b.tokn AS w2
  FROM ts a JOIN ts b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bigc AS (SELECT w1, w2, COUNT(*) AS cb FROM pairs GROUP BY w1, w2),
ctx AS (
  SELECT w1, CAST(SUM(cb) AS BIGINT) AS cw1, COUNT(*) AS n1f
  FROM bigc GROUP BY w1
),
cont AS (
  SELECT w2, CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS p_cont
  FROM bigc GROUP BY w2
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(CAST(
         -LN(GREATEST(CAST(cb AS DOUBLE) - 0.75, 0.0) / CAST(cw1 AS DOUBLE)
             + (0.75 * CAST(n1f AS DOUBLE) / CAST(cw1 AS DOUBLE)) * p_cont)
         AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6) AS avg_neg_logprob_kn
FROM pairs
JOIN bigc USING (w1, w2)
JOIN ctx USING (w1)
JOIN cont ON cont.w2 = pairs.w2
GROUP BY doc_id
"""


# --- round-7 rows-only→oracle upgrades: the DuckDB oracles REPLAY the
# hashing algorithms (md5-derived portable_hash60 in both engines), so
# the driver hash check pins MinHash banding, SimHash signatures and
# winnowing selection themselves — not just a downstream verification.
# Engine parity of the hash: Spark conv(substr(md5(s),1,15),16,10) ==
# DuckDB ('0x' || substr(md5(s),1,15))::BIGINT (60 bits, no sign
# overflow on either side).

_H60 = "('0x' || substr(md5({arg}), 1, 15))::BIGINT"

# the affine MinHash family constants — same (a, b) pairs the Spark
# side derives (operators/dedup.py:minhash_affine_params), embedded as
# a VALUES list so DuckDB replays identical signatures
_MINHASH_PARAMS_VALUES = ", ".join(
    f"({i}, {a}, {b})"
    for i, (a, b) in enumerate(DD.minhash_affine_params(64))
)

ORACLE_SQL["dedup_minhash_near"] = _SHINGLE_DOCS + f""",
params AS (
  SELECT * FROM (VALUES {_MINHASH_PARAMS_VALUES}) AS t(seed, a, b)
),
hb AS (
  SELECT doc_id, shingle,
         ({_H60.format(arg="shingle")}) % 1073741789 AS hbase
  FROM sh
),
hs AS (
  SELECT doc_id, seed, MIN((a * hbase + b) % 2147483647) AS minh
  FROM hb CROSS JOIN params
  GROUP BY doc_id, seed
),
sigs AS (
  SELECT doc_id, list(minh ORDER BY seed) AS sig FROM hs GROUP BY doc_id
),
bands AS (
  SELECT doc_id, (seed // 4) AS band_id,
         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM hs GROUP BY doc_id, (seed // 4)
),
ok AS (
  SELECT band_id, band_key FROM bands
  GROUP BY band_id, band_key HAVING COUNT(*) <= 200
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok USING (band_id, band_key)
  JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       ROUND(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0, 6)
         AS est_jaccard
FROM cand
JOIN sigs sa ON sa.doc_id = id_a
JOIN sigs sb ON sb.doc_id = id_b
WHERE ROUND(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0, 6)
      >= 0.35
"""

# 60 per-bit sign votes over distinct-token hashes, then the signature
# as a sum of set-bit powers; all-pairs Hamming ≤ 3 is structurally
# equal to the Spark plan's banded candidates (pigeonhole: 4 disjoint
# 15-bit bands, at most 3 differing bits → ≥1 identical band).
_SIMHASH_VOTES = ",\n       ".join(
    f"SUM((((h >> {b}) & 1) * 2 - 1)) AS v{b}" for b in range(60)
)
_SIMHASH_SIG = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
    for b in range(60)
)

ORACLE_SQL["dedup_simhash_near"] = _NORM + f""",
th AS (
  SELECT doc_id, {_H60.format(arg="tok")} AS h
  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM tok)
),
votes AS (
  SELECT doc_id,
       {_SIMHASH_VOTES}
  FROM th GROUP BY doc_id
),
sigs AS (
  SELECT doc_id, ({_SIMHASH_SIG}) AS simhash FROM votes
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""

ORACLE_SQL["dedup_winnow_overlap"] = _NORM + f""",
g AS (
  SELECT doc_id, i AS pos,
         {_H60.format(arg="substr(ntext, CAST(i AS INTEGER), 12)")} AS h
  FROM norm, unnest(range(1, greatest(length(ntext) - 11, 0) + 1)) t(i)
),
w AS (
  SELECT doc_id,
         MIN(h) OVER fw AS fp,
         COUNT(*) OVER fw AS n_in_frame
  FROM g
  WINDOW fw AS (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING)
),
fps AS (SELECT DISTINCT doc_id, fp FROM w WHERE n_in_frame = 25),
counts AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_shared
FROM shared
JOIN counts ca ON ca.doc_id = id_a
JOIN counts cb ON cb.doc_id = id_b
WHERE CAST(n_shared AS DOUBLE) / LEAST(ca.n_fp, cb.n_fp) >= 0.5
  AND n_shared >= 3
"""


# --- round-7 batch 2: the two banded-LSH capstones become
# oracle-backed via the portable affine family (the oracle replays
# banding, skew guard and exact verification — no recall assumption).

_LSH_PAIR_CTES = f""",
        params2 AS (
          SELECT * FROM (VALUES {_MINHASH_PARAMS_VALUES}) AS t(seed, a, b)
        ),
        hb2 AS (
          SELECT doc_id, ({_H60.format(arg="shingle")}) % 1073741789 AS hbase
          FROM sh2
        ),
        hs2 AS (
          SELECT doc_id, seed, MIN((a * hbase + b) % 2147483647) AS minh
          FROM hb2 CROSS JOIN params2 GROUP BY doc_id, seed
        ),
        bands2 AS (
          SELECT doc_id, (seed // 4) AS band_id,
                 string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS band_key
          FROM hs2 GROUP BY doc_id, (seed // 4)
        ),
        okb2 AS (
          SELECT band_id, band_key FROM bands2
          GROUP BY band_id, band_key HAVING COUNT(*) <= 200
        ),
        cand2 AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands2 a
          JOIN okb2 USING (band_id, band_key)
          JOIN bands2 b ON a.band_id = b.band_id AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id
        ),
        pairs AS (
          SELECT id_a, id_b FROM cand2
          JOIN sdocs da ON da.doc_id = id_a
          JOIN sdocs db ON db.doc_id = id_b
          WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
                / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.5
        )
"""

# everything in _CURATE_CTES up through sh2 (enr → kept → exact →
# sdocs shinglesets → exploded shingles), then the LSH pair stage in
# place of the rare-shingle exact stage
_CURATE_PREFIX_TO_SH2 = _CURATE_CTES[: _CURATE_CTES.index(",\n        rare2 AS")]
assert _CURATE_PREFIX_TO_SH2.rstrip().endswith("FROM sdocs)"), (
    "curate CTE surgery anchor moved — update _CURATE_PREFIX_TO_SH2"
)
_CURATE_CTES_LSH = _CURATE_PREFIX_TO_SH2 + _LSH_PAIR_CTES

ORACLE_SQL["curate_chunk_corpus_lsh"] = _CURATE_CTES_LSH + """,
        surv AS (
          SELECT doc_id, toks FROM exact
          WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs)
        ),
        cst AS (
          SELECT doc_id, toks,
                 unnest(range(1, greatest(len(toks), 1) + 1, 24)) AS start
          FROM surv
        )
        SELECT doc_id,
               CAST((start - 1) / 24 AS BIGINT) AS chunk_id,
               array_to_string(toks[start:least(start + 31, len(toks))], ' ') AS chunk_text,
               CAST(least(32, len(toks) - start + 1) AS BIGINT) AS n_chunk_tokens
        FROM cst
        WHERE start = 1 OR start - 24 + 31 < len(toks)
"""

ORACLE_SQL["dedup_incremental_fuzzy_lsh"] = _SHINGLE_DOCS + f""",
params AS (
  SELECT * FROM (VALUES {_MINHASH_PARAMS_VALUES}) AS t(seed, a, b)
),
hb AS (
  SELECT doc_id, ({_H60.format(arg="shingle")}) % 1073741789 AS hbase FROM sh
),
hs AS (
  SELECT doc_id, seed, MIN((a * hbase + b) % 2147483647) AS minh
  FROM hb CROSS JOIN params GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, (seed // 4) AS band_id,
         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM hs GROUP BY doc_id, (seed // 4)
),
bb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
bc AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
-- skew guard on the CORPUS side only (mirrors the Spark probe shape)
okc AS (
  SELECT band_id, band_key FROM bc
  GROUP BY band_id, band_key HAVING COUNT(*) <= 200
),
cand AS (
  SELECT DISTINCT bb.doc_id AS batch_id, bc.doc_id AS corpus_id
  FROM bb
  JOIN okc USING (band_id, band_key)
  JOIN bc USING (band_id, band_key)
)
SELECT batch_id, corpus_id,
       ROUND(len(list_intersect(da.shingleset, db.shingleset))
             / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) AS jaccard
FROM cand
JOIN docs da ON da.doc_id = batch_id
JOIN docs db ON db.doc_id = corpus_id
WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
      / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.5
"""


# --- round-7 batch 3: content-defined chunking dedup. The oracle
# replays boundary selection (portable_hash60(k-gram) % divisor == 0
# at each 1-based gram start i → cut at i + k - 1), chunk assembly
# (LEAD over cuts per doc) and md5 chunk fingerprints.

_CDC_CTES = _NORM + f""",
cuts AS (
  SELECT doc_id, i + 11 AS cut
  FROM norm, unnest(range(1, greatest(length(ntext) - 11, 0) + 1)) t(i)
  WHERE ({_H60.format(arg="substr(ntext, CAST(i AS INTEGER), 12)")}) % 64 = 0
),
starts AS (
  SELECT DISTINCT doc_id, cut FROM (
    SELECT doc_id, 1 AS cut FROM norm
    UNION ALL
    SELECT doc_id, cut FROM cuts
  )
),
spans AS (
  SELECT doc_id, cut,
         LEAD(cut) OVER (PARTITION BY doc_id ORDER BY cut) AS next_cut,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cut) AS rn
  FROM starts
),
chunks AS (
  SELECT s.doc_id,
         CAST(rn - 1 AS BIGINT) AS chunk_idx,
         CAST(cut AS BIGINT) AS chunk_start,
         CASE WHEN next_cut IS NOT NULL
              THEN substr(n.ntext, CAST(cut AS INTEGER), CAST(next_cut - cut AS INTEGER))
              ELSE substr(n.ntext, CAST(cut AS INTEGER),
                          CAST(length(n.ntext) - cut + 1 AS INTEGER))
         END AS chunk_text
  FROM spans s JOIN norm n ON n.doc_id = s.doc_id
),
ch AS (
  SELECT doc_id, chunk_idx, chunk_start, chunk_text,
         md5(chunk_text) AS chunk_fp, length(chunk_text) AS clen
  FROM chunks WHERE length(chunk_text) > 0
)
"""

ORACLE_SQL["dedup_cdc_repeated_chunks"] = _CDC_CTES + """
SELECT chunk_fp,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(clen) AS BIGINT) AS chunk_len
FROM ch
WHERE clen >= 20
GROUP BY chunk_fp
HAVING COUNT(DISTINCT doc_id) >= 2
"""

ORACLE_SQL["dedup_cdc_duplicate_coverage"] = _CDC_CTES + """,
dupfps AS (
  SELECT chunk_fp FROM ch GROUP BY chunk_fp
  HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(clen) AS BIGINT) AS n_chars_norm
  FROM ch GROUP BY doc_id
),
dup_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_chunks,
         CAST(SUM(clen) AS BIGINT) AS n_dup_chars
  FROM ch WHERE chunk_fp IN (SELECT chunk_fp FROM dupfps)
  GROUP BY doc_id
)
SELECT p.doc_id, p.n_chunks, d.n_dup_chunks,
       ROUND(CAST(d.n_dup_chars AS DOUBLE) / CAST(p.n_chars_norm AS DOUBLE), 6)
         AS dup_char_coverage
FROM per_doc p JOIN dup_doc d ON p.doc_id = d.doc_id
"""


ORACLE_SQL["dedup_cdc_incremental"] = _CDC_CTES + """,
batch AS (SELECT * FROM ch WHERE doc_id % 5 = 0),
cfps AS (SELECT DISTINCT chunk_fp FROM ch WHERE doc_id % 5 <> 0),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(clen) AS BIGINT) AS n_chars_norm
  FROM batch GROUP BY doc_id
),
hit_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_corpus_dup_chunks,
         CAST(SUM(clen) AS BIGINT) AS n_dup_chars
  FROM batch WHERE chunk_fp IN (SELECT chunk_fp FROM cfps)
  GROUP BY doc_id
)
SELECT p.doc_id AS batch_id, p.n_chunks, h.n_corpus_dup_chunks,
       ROUND(CAST(h.n_dup_chars AS DOUBLE) / CAST(p.n_chars_norm AS DOUBLE), 6)
         AS corpus_dup_coverage
FROM per_doc p JOIN hit_doc h ON p.doc_id = h.doc_id
"""


ORACLE_SQL["dedup_components_lsh"] = (
    _SHINGLE_DOCS.replace("WITH norm", "WITH RECURSIVE norm", 1)
    + f""",
params AS (
  SELECT * FROM (VALUES {_MINHASH_PARAMS_VALUES}) AS t(seed, a, b)
),
hb AS (
  SELECT doc_id, ({_H60.format(arg="shingle")}) % 1073741789 AS hbase FROM sh
),
hs AS (
  SELECT doc_id, seed, MIN((a * hbase + b) % 2147483647) AS minh
  FROM hb CROSS JOIN params GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, (seed // 4) AS band_id,
         string_agg(CAST(minh AS VARCHAR), ',' ORDER BY seed) AS band_key
  FROM hs GROUP BY doc_id, (seed // 4)
),
okb AS (
  SELECT band_id, band_key FROM bands
  GROUP BY band_id, band_key HAVING COUNT(*) <= 200
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN okb USING (band_id, band_key)
  JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM cand
  JOIN docs da ON da.doc_id = id_a
  JOIN docs db ON db.doc_id = id_b
  WHERE ROUND(len(list_intersect(da.shingleset, db.shingleset))
        / CAST(len(list_distinct(list_concat(da.shingleset, db.shingleset))) AS DOUBLE), 6) >= 0.35
),
sym AS (SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
)
SELECT u AS doc_id,
       CAST(LEAST(u, MIN(v)) AS BIGINT) AS component
FROM reach GROUP BY u
"""
)


ORACLE_SQL["dedup_cdc_duplicate_spans"] = _CDC_CTES + """,
dupfps2 AS (
  SELECT chunk_fp FROM ch GROUP BY chunk_fp
  HAVING COUNT(DISTINCT doc_id) >= 2
),
flagged AS (
  SELECT doc_id, chunk_idx, chunk_start, clen FROM ch
  WHERE chunk_fp IN (SELECT chunk_fp FROM dupfps2)
),
runs AS (
  SELECT doc_id, chunk_idx, chunk_start, clen,
         chunk_idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY chunk_idx)
           AS island
  FROM flagged
)
SELECT doc_id,
       CAST(MIN(chunk_start) AS BIGINT) AS span_start,
       CAST(MAX(chunk_start + clen) - MIN(chunk_start) AS BIGINT) AS span_len,
       CAST(COUNT(*) AS BIGINT) AS n_chunks_in_span
FROM runs
GROUP BY doc_id, island
HAVING MAX(chunk_start + clen) - MIN(chunk_start) >= 40
"""


ORACLE_SQL["text_tokenizer_fertility"] = _NORM + r""",
per_doc AS (
  SELECT CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es) AND s_en >= 1 THEN 'en'
              WHEN s_de >= GREATEST(s_fr, s_es) AND s_de >= 1 THEN 'de'
              WHEN s_fr >= s_es AND s_fr >= 1 THEN 'fr'
              WHEN s_es >= 1 THEN 'es'
              ELSE 'und' END AS lang_pred,
         CAST(length(text) AS BIGINT) AS n_chars_raw,
         CAST(len(toks) AS BIGINT) AS n_ws_tokens,
         CAST(len(list_filter(
             regexp_extract_all(ntext,
               '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9'']+|\s+'),
             t -> trim(t) != '')) AS BIGINT) AS n_bpe_tokens
  FROM (
    SELECT *,
           len(list_filter(toks, t -> t IN ('the','a','of','and','in','to','is'))) AS s_en,
           len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein'))) AS s_de,
           len(list_filter(toks, t -> t IN ('le','la','les','et','est','un'))) AS s_fr,
           len(list_filter(toks, t -> t IN ('el','la','los','y','es','un'))) AS s_es
    FROM tok
  )
)
SELECT lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       ROUND(CAST(SUM(CAST(n_chars_raw AS DECIMAL(27,12))) AS DOUBLE)
             / CAST(SUM(n_bpe_tokens) AS DOUBLE), 6) AS chars_per_bpe_token,
       ROUND(CAST(SUM(CAST(n_bpe_tokens AS DECIMAL(27,12))) AS DOUBLE)
             / CAST(SUM(n_ws_tokens) AS DOUBLE), 6) AS bpe_tokens_per_word
FROM per_doc
WHERE n_bpe_tokens > 0
GROUP BY lang_pred
"""


ORACLE_SQL["text_cross_source_contamination"] = _NORM + r""",
    docs5 AS (
      SELECT t.doc_id, d.source,
             list_distinct(list_transform(
               range(1, greatest(len(toks)-4, 1) + 1),
               i -> array_to_string(toks[i:least(i+4, len(toks))], ' ')
             )) AS shingleset
      FROM tok t JOIN documents d USING (doc_id)
    ),
    shs AS (
      SELECT DISTINCT source, unnest(shingleset) AS shingle FROM docs5
    ),
    sh AS (
      SELECT DISTINCT source,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
      FROM shs
    ),
    totals AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
      FROM sh a JOIN sh b
        ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared_shingles,
           ROUND(CAST(n_shared_shingles AS DOUBLE) / ta.n, 6)
             AS containment_in_a,
           ROUND(CAST(n_shared_shingles AS DOUBLE) / tb.n, 6)
             AS containment_in_b
    FROM shared
    JOIN totals ta ON ta.source = shared.source_a
    JOIN totals tb ON tb.source = shared.source_b
"""

ORACLE_SQL["sample_token_budget_mixture"] = _NORM + """,
    per_source AS (
      SELECT d.source, CAST(SUM(len(t.toks)) AS BIGINT) AS n_tokens
      FROM tok t JOIN documents d USING (doc_id)
      GROUP BY d.source
    ),
    -- sqrt-smoothed weights in integer millionths; BIGINT floor
    -- division + largest-remainder so the allocation sums to the
    -- budget exactly (same arithmetic as the Spark side)
    weighted AS (
      SELECT source, n_tokens,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS w,
             SUM(CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)) OVER () AS w_total,
             (SUM(n_tokens) OVER ()) // 2 AS budget
      FROM per_source
    ),
    alloc AS (
      -- HUGEINT product: BIGINT budget*w overflows at ~1e9 corpus
      -- tokens (mirrors the Spark side's decimal(38,0))
      SELECT source, n_tokens, budget,
             CAST((CAST(budget AS HUGEINT) * w) // w_total AS BIGINT)
               AS base_alloc,
             CAST((CAST(budget AS HUGEINT) * w) % w_total AS BIGINT) AS rem
      FROM weighted
    ),
    topped AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rem_rank,
             budget - SUM(base_alloc) OVER () AS leftover
      FROM alloc
    ),
    final AS (
      SELECT source, n_tokens,
             base_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
               AS uncapped_alloc
      FROM topped
    )
    SELECT source, n_tokens,
           CAST(LEAST(uncapped_alloc, n_tokens * 2) AS BIGINT) AS alloc_tokens,
           uncapped_alloc > n_tokens * 2 AS capped,
           ROUND(CAST(LEAST(uncapped_alloc, n_tokens * 2) AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE), 6) AS epochs
    FROM final
"""

ORACLE_SQL["text_chunk_sliding"] = _NORM + """,
    starts AS (
      SELECT doc_id, ntext,
             unnest(range(1, GREATEST(length(ntext), 1) + 1, 150)) AS s
      FROM norm
    )
    SELECT doc_id,
           CAST((s - 1) // 150 AS BIGINT) AS chunk_idx,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(length(substr(ntext, CAST(s AS INTEGER), 200)) AS BIGINT) AS chunk_len,
           md5(substr(ntext, CAST(s AS INTEGER), 200)) AS chunk_fp
    FROM starts
"""

ORACLE_SQL["sample_perplexity_mixture"] = f"""
WITH scored AS (
  SELECT doc_id, avg_neg_logprob_kn
  FROM ({ORACLE_SQL["text_kneser_ney_bigram"]})
),
b AS (
  SELECT quantile_cont(avg_neg_logprob_kn, 0.3333) AS b1,
         quantile_cont(avg_neg_logprob_kn, 0.6667) AS b2
  FROM scored
)
SELECT doc_id,
       CASE WHEN avg_neg_logprob_kn > b2 THEN 'tail'
            WHEN avg_neg_logprob_kn > b1 THEN 'middle'
            ELSE 'head' END AS ppl_bucket,
       avg_neg_logprob_kn
FROM scored CROSS JOIN b
WHERE (('0x' || substr(md5('ppl:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 1000
      < CASE WHEN avg_neg_logprob_kn > b2 THEN 100
             WHEN avg_neg_logprob_kn > b1 THEN 500
             ELSE 1000 END
"""

# Float-parity notes: k1=1.25, b=0.75, k1+1=2.25 are exact binary
# fractions (DuckDB's DECIMAL literals cast to the identical doubles
# Spark's float literals produce); every division/multiplication sits
# in the same expression tree as the Spark side, so the doubles match
# bit-for-bit before the decimal(27,12) quantization.
ORACLE_SQL["text_bm25_topk"] = _NORM + r""",
    lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tok),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM lens),
    tf AS (
      SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, dl, unnest(toks) AS term FROM lens)
      WHERE term IN ('fast','hash','join','stream','window','agg',
                     'slow','table','scan','merge')
      GROUP BY doc_id, dl, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    q(query_id, term) AS (
      VALUES (1,'fast'),(1,'hash'),(1,'join'),
             (2,'agg'),(2,'stream'),(2,'window'),
             (3,'merge'),(3,'scan'),(3,'slow'),(3,'table')
    ),
    contrib AS (
      SELECT q.query_id, tf.doc_id,
             CAST(
               ln(1.0 + (CAST(n_docs - df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
               * (CAST(tf AS DOUBLE) * CAST(2.25 AS DOUBLE))
               / (CAST(tf AS DOUBLE)
                  + CAST(1.25 AS DOUBLE)
                    * (CAST(0.25 AS DOUBLE)
                       + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE) / n_docs)))
               AS DECIMAL(27,12)) AS c
      FROM tf JOIN q USING (term) JOIN dfreq USING (term) CROSS JOIN stats
    ),
    scored AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
             ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score
      FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, rnk AS rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= 10
"""

ORACLE_SQL["sample_soft_dedup_weights"] = _NORM + r""",
    base AS (
      SELECT t.doc_id, d.source, md5(t.ntext) AS fp,
             CAST(len(t.toks) AS BIGINT) AS ntok
      FROM tok t JOIN documents d USING (doc_id)
    ),
    weighted AS (
      SELECT source, fp, ntok,
             CAST(CAST(ntok AS DOUBLE)
                  / (COUNT(*) OVER (PARTITION BY fp))
               AS DECIMAL(27,12)) AS eff
      FROM base
    ),
    agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
             CAST(SUM(ntok) AS BIGINT) AS raw_tokens,
             ROUND(CAST(SUM(eff) AS DOUBLE), 6) AS effective_tokens
      FROM weighted GROUP BY source
    )
    SELECT *, ROUND(CAST(raw_tokens AS DOUBLE) / effective_tokens, 6)
             AS dup_inflation
    FROM agg
"""

# the recall evaluation composes the two already-portable oracles as
# nested CTE subqueries — DuckDB replays truth set, candidate set,
# join, and buckets
ORACLE_SQL["dedup_lsh_recall_report"] = f"""
WITH ex AS ({ORACLE_SQL["dedup_ngram_jaccard"]}),
mh AS (SELECT DISTINCT id_a, id_b FROM ({ORACLE_SQL["dedup_minhash_near"]})),
truth AS (SELECT * FROM ex WHERE jaccard >= CAST(0.35 AS DOUBLE)),
joined AS (
  SELECT t.jaccard, CASE WHEN m.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM truth t LEFT JOIN mh m ON t.id_a = m.id_a AND t.id_b = m.id_b
),
agg AS (
  SELECT CAST(FLOOR(jaccard * 10) AS BIGINT) AS j_bucket,
         CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
         CAST(SUM(hit) AS BIGINT) AS n_found
  FROM joined GROUP BY 1
)
SELECT *, ROUND(CAST(n_found AS DOUBLE) / n_true_pairs, 6) AS recall
FROM agg
"""


def dedup_edit_distance_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy dedup, Ed-Join shape (Xiao et al., VLDB'08):
    find every document pair whose 64-char key prefix is within
    Levenshtein distance K=4, WITHOUT the all-pairs join. Chain:

    1. q-gram elements: positional 10-grams, with an occurrence index
       per (doc, gram) so duplicate grams become distinct SET elements
       (multiset intersection == set intersection on (gram, occ));
    2. count-filter bound: ed(a,b) ≤ K ⇒ the keys share ≥
       max(|Ga|,|Gb|) − q·K elements, so each doc's first
       q·K + 1 = 41 elements in a GLOBAL rarest-first order must
       overlap in ≥ 1 element for any qualifying pair (prefix filter —
       sound, never drops a true pair, PROVIDED the bound is
       positive: max(len_a, len_b) ≥ q·(K+1) = 50 (then ed ≤ K also
       forces min_len ≥ 46 ≥ q, so both sides have grams). Pairs
       where both keys are shorter get no q-gram guarantee at all, so
       keys of length ≤ 49 are ALSO routed to an exhaustive
       short-bucket branch, and the pair space partitions on
       greatest(len): pairs with greatest ≥ 50 come from the prefix
       branch (bound holds with margin), pairs with greatest ≤ 49
       have both members in the short bucket. The union is exactly
       the brute-force result for any corpus, not just long-doc ones;
       the short bucket is all-pairs only over genuinely short docs —
       a bounded, usually tiny population at scale);
    3. candidates: self-join of the 41-element prefixes on (gram, occ)
       with id_a < id_b, distinct;
    4. exact verify: length filter |la−lb| ≤ K, then one
       THRESHOLD-BANDED ``levenshtein(a, b, K)`` per candidate —
       Spark's bounded form runs the O(K·n) diagonal band with early
       exit (returns −1 beyond K) instead of the full O(n²) matrix, a
       ~26× verify cheapening at K=4, n=64.

    q is a MEASURED choice (round 10): this corpus' tiny word
    vocabulary makes short grams collide, so candidate counts at
    (sf0.1, sf1.0) were 2.92M/127M for q=4 (×43.7 per ×10 docs — the
    round-9 3.4× per-10× runtime flag) but 0.82M/14.2M for q=10
    (×17), giving 2.3× less sf0.1 wall time and a 1.69× per-10×
    runtime ratio — back inside the ≤3× banded budget. The true
    output itself grows ×12.2 per ×10 docs here (dup families scale
    with the corpus), a floor no lossless join can beat.

    The DuckDB oracle runs the BRUTE-FORCE all-pairs form — hash
    equality proves the entire filter chain lossless, the strongest
    statement a blocked similarity join can make (same bar as the
    MinHash/banded-GEMM twins).

    Scale shape: the quadratic is paid only on prefix-element posting
    lists (rare elements first), never on the corpus; everything else
    is linear explode + window. Edit distance runs once per surviving
    candidate, JVM-side (codegen StringUtils), never per pair of the
    corpus. The 100-TB upgrade is unchanged plumbing with longer keys:
    the prefix length stays q·K + 1 regardless of corpus size."""
    from pyspark.sql.window import Window

    L, Q, K = 64, 10, 4
    prefix_len = Q * K + 1
    short_max = Q * (K + 1) - 1  # greatest(len) <= 49 -> short bucket
    keys = _docs(spark, sf_dir).select(
        "doc_id", F.substring("text", 1, L).alias("key")
    )
    el = (
        # len >= Q guard: shorter keys have no q-grams (and
        # F.sequence would count DOWNWARD, emitting bogus positions);
        # every pair involving them lands in the short bucket anyway
        keys.filter(F.length("key") >= Q)
        .select(
            "doc_id",
            "key",
            F.explode(
                F.sequence(F.lit(1), F.length("key") - F.lit(Q - 1))
            ).alias("p"),
        )
        .select("doc_id", F.expr(f"substring(key, p, {Q})").alias("gram"), "p")
        .withColumn(
            "occ",
            F.row_number().over(
                Window.partitionBy("doc_id", "gram").orderBy("p")
            ),
        )
    )
    gfreq = el.groupBy("gram", "occ").agg(
        F.count(F.lit(1)).alias("freq")
    )
    # NOT force-broadcast: at q=10 the distinct-gram table scales with
    # the corpus (long grams are near-unique), so a forced broadcast
    # would be the 100-TB bug; AQE still converts the join when the
    # table is actually small. Measured at sf0.1: the shuffle join
    # costs ~0.4 s over a broadcast — noise against the candidate cut.
    prefix = (
        el.join(gfreq, ["gram", "occ"])
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("freq", "gram", "occ")
            ),
        )
        .filter(F.col("rn") <= prefix_len)
        .select("doc_id", "gram", "occ")
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.occ") == F.col("b.occ"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    ka = keys.select(
        F.col("doc_id").alias("id_a"), F.col("key").alias("key_a")
    )
    kb = keys.select(
        F.col("doc_id").alias("id_b"), F.col("key").alias("key_b")
    )
    long_pairs = (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .filter(
            F.greatest(F.length("key_a"), F.length("key_b"))
            > F.lit(short_max)
        )
    )
    # short bucket: exhaustive over keys <= short_max chars — the only
    # branch where the q-gram bound gives no guarantee. Blocked on
    # LENGTH BANDS of width K+1 (ed <= K forces |Δlen| <= K, so a true
    # pair's bands differ by at most 1; the probe side emits band-1,
    # band, band+1 and the join is a plain hash equi-join): no forced
    # broadcast (no 8 GB wall on a short-heavy corpus), and the
    # within-band quadratic is confined to same-length-class short
    # keys — the documented price of exactness below the q-gram
    # bound, never a corpus cartesian. Because there are only ~10
    # distinct bands, the join key is SALTED (build side: one salt
    # from the doc id; probe side: replicated across all salts) so a
    # short-heavy corpus spreads each band's quadratic across
    # band×salt reducers instead of one task.
    n_salt = 8
    shortk = keys.filter(F.length("key") <= short_max).withColumn(
        "band", F.expr(f"length(key) div {K + 1}")
    )
    probe = shortk.select(
        F.col("doc_id").alias("id_a"),
        F.col("key").alias("key_a"),
        F.explode(
            F.array(
                F.col("band") - 1, F.col("band"), F.col("band") + 1
            )
        ).alias("band"),
    ).select(
        "*",
        F.explode(
            F.array(*[F.lit(i).cast("int") for i in range(n_salt)])
        ).alias("salt"),
    )
    short_pairs = probe.join(
        shortk.select(
            F.col("doc_id").alias("id_b"),
            F.col("key").alias("key_b"),
            "band",
            F.pmod(F.xxhash64("doc_id"), F.lit(n_salt))
            .cast("int")
            .alias("salt"),
        ),
        ["band", "salt"],
    ).filter(F.col("id_a") < F.col("id_b")).drop("band", "salt")
    return (
        long_pairs.unionByName(short_pairs)
        .filter(
            F.abs(F.length("key_a") - F.length("key_b")) <= F.lit(K)
        )
        .withColumn(
            "edit_dist", F.levenshtein("key_a", "key_b", K).cast("long")
        )
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "edit_dist")
    )


QUERIES["dedup_edit_distance_qgram"] = dedup_edit_distance_qgram
ORACLE_SQL["dedup_edit_distance_qgram"] = """
WITH k AS (
  SELECT doc_id, substr(text, 1, 64) AS key FROM documents
)
SELECT a.doc_id AS id_a,
       b.doc_id AS id_b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS edit_dist
FROM k a JOIN k b ON a.doc_id < b.doc_id
WHERE levenshtein(a.key, b.key) <= 4
"""
