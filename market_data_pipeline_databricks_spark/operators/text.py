"""Text analysis for large-scale training-data pipelines.

All of these are pure Column expressions (JVM-side, codegen'd — no
Python in the hot path), designed for the ``documents`` table shape
(doc_id BIGINT, text STRING, ...) at 100 TB: every operator is a
narrow per-row projection that pipelines with the scan, no shuffle.

Operators: normalization, fingerprinting, token/char stats, quality
scoring, stopword-based language ID heuristic, shingling (the substrate
for MinHash / Jaccard dedup in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Punctuation class kept explicit (not [[:punct:]]) so the regex means
# the same thing in every engine this is compared against.
_PUNCT_CLASS = r"""[.,!?;:'"()\[\]{}\-]"""

# Small per-language stopword lists for the heuristic language ID.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
}


def normalize_text(col: Column) -> Column:
    """Lowercase, strip punctuation, collapse whitespace — the canonical
    form used by fingerprinting and shingling."""
    c = F.lower(col)
    c = F.regexp_replace(c, _PUNCT_CLASS, "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def fingerprint(col: Column) -> Column:
    """Deterministic 128-bit document fingerprint: md5 of the normalized
    text. Identical normalization+hash on any engine → portable dedup key."""
    return F.md5(normalize_text(col))


def portable_hash60(col: Column) -> Column:
    """60-bit integer hash any SQL engine can replay bit-for-bit: the
    first 15 hex chars of md5, parsed base-16. Unlike xxhash64 (engine-
    specific seed/implementation), md5 is md5 everywhere, so a DuckDB
    oracle can reproduce the exact value:
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``. 60 bits < 2^63 — no
    sign-overflow on either engine. Used by the oracle-replayable
    MinHash / SimHash / winnowing forms; the xxhash64 forms remain the
    faster engine-internal default."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count(col: Column) -> Column:
    return F.length(col).cast("long")


def punct_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, _PUNCT_CLASS, ""))).cast(
        "long"
    )


def stopword_count(col: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*words))).cast("long")


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: rewards stopword density and moderate
    token length, penalizes punctuation soup. Deterministic double
    arithmetic (same bits on any engine given the same counts)."""
    n_tok = token_count(col).cast("double")
    n_chr = char_count(col).cast("double")
    n_punct = punct_count(col).cast("double")
    n_stop = stopword_count(col).cast("double")
    stop_ratio = n_stop / n_tok
    # ANSI mode raises DIVIDE_BY_ZERO even on doubles: a zero-length
    # text gets punct_ratio 0 (its quality is already 0 via len_ok)
    punct_ratio = F.when(n_chr > 0, n_punct / n_chr).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(0.0)
    score = len_ok * (0.5 + 0.5 * stop_ratio - punct_ratio)
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 6)


def _membership(words: list[str]):
    # Factory, not a default-arg lambda: PySpark reads a 2-arg lambda as
    # (element, index) and would bind the word list to the index column.
    def pred(t: Column) -> Column:
        return t.isin(*words)

    return pred


def lang_scores(col: Column) -> dict[str, Column]:
    """Stopword-hit count per language over the token stream."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _membership(words))).cast("long")
        for lang, words in STOPWORDS.items()
    }


def lang_id(col: Column) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when no
    list scores ≥1. First-match CASE with fixed priority en>de>fr>es on
    ties — deterministic and trivially expressible on any SQL engine."""
    s = lang_scores(col)
    return (
        F.when((s["en"] >= F.greatest(s["de"], s["fr"], s["es"])) & (s["en"] >= 1), "en")
        .when((s["de"] >= F.greatest(s["fr"], s["es"])) & (s["de"] >= 1), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] >= 1), "fr")
        .when(s["es"] >= 1, "es")
        .otherwise("und")
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-gram shingles of the normalized text (MinHash substrate).
    Documents shorter than k tokens yield their full token join as one
    shingle so no document silently disappears from dedup.

    The token array is BOUND ONCE via a single-element outer
    ``transform`` before the per-shingle lambda consumes it: a lambda
    body that references a complex expression (normalize+split here)
    re-evaluates it per element — interpreted HOFs get no
    subexpression elimination (the round-3/4 MinHash/winnowing lesson)
    — so inlining ``tokens(col)`` into the slice lambda costs
    O(n_tokens) normalizations per document instead of one. The outer
    ``transform(array(toks), t -> ...)`` evaluates ``toks`` exactly
    once; the inner lambda sees ``t``, a cheap bound variable. Works
    as a pure Column function, so every call site (MinHash, blocked
    Jaccard, novelty, curation) gets the fix without staging its own
    projection."""
    toks = tokens(col)

    def per_doc(t: Column) -> Column:
        n = F.size(t)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(t, i, k)),
        )

    return F.element_at(F.transform(F.array(toks), per_doc), 1)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats block — two narrow projections, no shuffle.

    The normalized text and token array are materialized behind their
    own projection before the stats expressions consume them: the
    stopword/language counters are higher-order ``filter`` calls, which
    run interpreted (outside whole-stage codegen's subexpression
    elimination), so inlining ``tokens(text)`` into each would
    re-normalize and re-split the string once per counter (~1.4×
    composite scan cost, measured). Same trap as MinHash signatures
    (operators/dedup.py), smaller constant."""
    c = F.col(text_col)
    pre = df.withColumn("__ntext__", normalize_text(c)).withColumn(
        "__toks__", F.split(F.col("__ntext__"), " ")
    )
    toks = F.col("__toks__")
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, _membership(STOPWORDS["en"]))).cast("long")
    n_chr = char_count(c)
    n_punct = punct_count(c)
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    # zero-length guard: see quality_score
    punct_ratio = F.when(
        n_chr > 0, n_punct.cast("double") / n_chr.cast("double")
    ).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(0.0)
    quality = F.round(
        F.greatest(
            F.least(len_ok * (0.5 + 0.5 * stop_ratio - punct_ratio), F.lit(1.0)),
            F.lit(0.0),
        ),
        6,
    )
    s = {
        lang: F.size(F.filter(toks, _membership(words))).cast("long")
        for lang, words in STOPWORDS.items()
    }
    lang_pred = (
        F.when((s["en"] >= F.greatest(s["de"], s["fr"], s["es"])) & (s["en"] >= 1), "en")
        .when((s["de"] >= F.greatest(s["fr"], s["es"])) & (s["de"] >= 1), "de")
        .when((s["fr"] >= s["es"]) & (s["fr"] >= 1), "fr")
        .when(s["es"] >= 1, "es")
        .otherwise("und")
    )
    return (
        pre.withColumn("n_chars_computed", n_chr)
        .withColumn("n_tokens", n_tok)
        .withColumn("n_punct", n_punct)
        .withColumn("n_stopwords", n_stop)
        .withColumn("quality", quality)
        .withColumn("lang_pred", lang_pred)
        .withColumn("fingerprint", F.md5(F.col("__ntext__")))
        .drop("__ntext__", "__toks__")
    )


# GPT-2-style pre-tokenizer classes: contractions, letter runs, digit
# runs, punctuation runs, whitespace runs — the regex BPE vocabularies
# split on before merges. Counting these is the standard cheap proxy
# for "LLM tokens" without a vocab file.
_BPE_SPLIT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9']+|\s+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization of normalized text (regex classes, no
    merges). Pure Column op: regexp_extract_all is JVM-side."""
    return F.regexp_extract_all(normalize_text(col), F.lit(_BPE_SPLIT), 0)


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens, excluding pure-whitespace runs."""
    toks = F.filter(bpe_tokens(col), lambda t: F.trim(t) != "")
    return F.size(toks).cast("long")


# PII patterns kept deliberately explicit and conservative (emails,
# international-ish phone numbers, IPv4) — JVM-side regexp_replace, no
# Python in the path. Production pipelines extend this table; the
# operator shape (ordered redaction passes + per-kind counts) is the
# contract.
PII_PATTERNS = {
    # Order is load-bearing: the broad phone pattern (digits with
    # separators) would swallow emails' digit runs and whole IPv4
    # addresses, so the more specific kinds redact first and phone only
    # sees what remains.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII occurrence counts (regexp_count, JVM-side). Each
    kind is counted on text with the MORE specific kinds already
    redacted, matching what redact_pii would actually replace."""
    out: dict[str, Column] = {}
    cur = col
    for kind, pat in PII_PATTERNS.items():
        out[kind] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, f"[{kind.upper()}]")
    return out


def redact_pii(col: Column) -> Column:
    """Replace each PII kind with a typed placeholder ``[KIND]``,
    in PII_PATTERNS order (specific → broad)."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def winnow_fingerprints(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 7,
    window: int = 4,
    portable: bool = False,
) -> "DataFrame":
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every char k-gram, keep the min hash of each sliding window of
    ``window`` k-gram hashes, dedup → (id, fp) rows. Near-identical
    documents share most fingerprints, so a join on fp finds local
    (substring-level) overlap that whole-doc md5 cannot.

    Expressed relationally on purpose: posexplode the k-gram hashes and
    take a forward ROWS frame min — O(len) per document with one
    shuffle on the doc id. (The tempting pure-Column form —
    ``transform(sequence, i -> array_min(slice(hashes, i, w)))`` —
    re-evaluates the hash array per window element because higher-order
    lambdas defeat subexpression elimination: O(len²) hashing. Measured
    >100× slower; don't go back.)
    """
    # Materialize the normalized text BEFORE the higher-order lambda:
    # a lambda that references a complex expression re-evaluates it per
    # element (no CSE inside interpreted HOFs — the round-3 MinHash
    # lesson, dedup.py), which here meant the lower→regex→regex→trim
    # normalization ran once per k-gram: ~500× per doc, 20.8 s → 1.7 s
    # for the whole chain at sf0.1. A plain column reference inside
    # the lambda just reads the row value.
    norm = df.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__nt__")
    )
    t = F.col("__nt__")
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
    grams = F.transform(F.sequence(F.lit(1), n_grams), lambda i: t.substr(i, F.lit(k)))
    g = norm.select("id", F.posexplode(grams).alias("pos", "gram"))
    # portable=True swaps the k-gram hash for the md5-derived 60-bit
    # hash so a DuckDB oracle can replay the winnowing selection
    # exactly (which windows pick which minima depends on the hash
    # values); xxhash64 stays the engine-internal default — it is
    # ~3× cheaper and fingerprint semantics don't need cross-engine
    # parity unless an oracle is watching.
    hash_fn = portable_hash60(F.col("gram")) if portable else F.xxhash64("gram")
    g = g.withColumn("h", hash_fn)
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    full = (
        g.withColumn("fp", F.min("h").over(w))
        .withColumn("n_in_frame", F.count(F.lit(1)).over(w))
        .filter(F.col("n_in_frame") == window)  # full windows only
    )
    return full.select("id", "fp").distinct()


def chunk_tokens(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 32,
    stride: int = 24,
) -> "DataFrame":
    """Overlapping token-window chunking: split each document's
    normalized whitespace tokens into chunks of ``chunk_size`` tokens
    starting every ``stride`` tokens (overlap = chunk_size - stride) —
    the standard way to cut long documents into context-length-bounded
    training examples without losing cross-boundary n-grams.

    Pure Column algebra: the token array materializes once per row, the
    chunk starts explode from a ``sequence``, and each chunk is an
    O(chunk_size) ``slice`` — no UDF, no shuffle; the op pipelines with
    the scan at any scale and output size is n_tokens/stride rows per
    doc. A tail window that adds no tokens beyond the previous chunk
    (start - stride + chunk_size - 1 >= n_tokens) is suppressed, so
    chunk sets are minimal and deterministic.

    Blank/whitespace-only documents yield ZERO chunks: splitting a
    normalized empty string would give [''] (one phantom token), so
    such rows are filtered before chunking rather than emitting a
    chunk with an overstated n_chunk_tokens=1 (round-3 advice).
    """
    base = df.select(
        F.col(id_col),
        normalize_text(F.col(text_col)).alias("__ntext__"),
    ).filter(F.col("__ntext__") != "")
    base = base.select(
        F.col(id_col),
        F.split(F.col("__ntext__"), " ").alias("__toks__"),
    )
    n = F.size("__toks__")
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    exploded = base.select(F.col(id_col), F.col("__toks__"), F.explode(starts).alias("start"))
    keep = (F.col("start") == 1) | (
        F.col("start") - stride + chunk_size - 1 < F.size("__toks__")
    )
    chunk = F.slice("__toks__", F.col("start"), F.lit(chunk_size))
    return exploded.filter(keep).select(
        F.col(id_col),
        ((F.col("start") - F.lit(1)) / F.lit(stride)).cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.least(
            F.lit(chunk_size), F.size("__toks__") - F.col("start") + F.lit(1)
        ).cast("long").alias("n_chunk_tokens"),
    )


def bigrams(col: Column) -> Column:
    """Adjacent-token bigram strings ("w1 w2") of the normalized text,
    with the token array BOUND ONCE (same outer-transform device as
    :func:`shingles` — an inner lambda referencing ``tokens(col)``
    directly re-evaluates the whole normalize+split chain per element,
    O(n²) per document; measured 9.9 → 1.4 s on the corpus bigram
    vocabulary at sf0.1). Documents with fewer than 2 tokens yield an
    empty array."""
    toks = tokens(col)

    def per_doc(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), per_doc), 1)


def bigram_structs(col: Column) -> Column:
    """Adjacent-token bigrams as (w1, w2) structs — same bound-once
    evaluation as :func:`bigrams`."""
    toks = tokens(col)

    def per_doc(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    return F.element_at(F.transform(F.array(toks), per_doc), 1)


def bpe_train_merges(
    words: "DataFrame",
    n_merges: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Byte-pair-encoding vocabulary induction over a word-frequency
    table (Sennrich et al. 2016, arXiv:1508.07909) — the iterative
    tokenizer-training step of a training-data pipeline, run
    distributed.

    ``words`` is (word, freq) — the DISTINCT-word table, which is the
    classic formulation's working set and is vocabulary-sized (≪
    corpus; at 100 TB the word-frequency rollup is one shuffle and the
    N merge iterations then touch only the vocab table). Each
    iteration:

    1. adjacent symbol pairs, weighted by word freq, one groupBy —
       fully distributed;
    2. argmax pair to the driver (one row; deterministic tie-break
       count DESC, pair ASC);
    3. merge applied with a greedy left-to-right fold
       (``F.aggregate``): occurrences merge non-overlapping from the
       left, exactly the reference implementation's semantics
       ("a a a" + merge(a,a) → ["aa", "a"]);
    4. ``localCheckpoint`` truncates the N-deep lineage.

    Returns the merge table [(rank, left, right, pair_freq)] — the
    artifact a tokenizer ships. The DuckDB oracle twin replays the
    identical chain (plans/text_ops.py builds it level by level, the
    same generated-CTE device as the PageRank oracle).
    """
    vocab = words.select(
        "word",
        "freq",
        F.concat(
            # trailing-empty guard: Spark's split keeps the empty match
            # at end-of-string (DuckDB's char split does not)
            F.filter(F.split(F.col("word"), "(?!^)"), lambda s: s != ""),
            F.array(F.lit("</w>")),
        ).alias("syms"),
        # lazy (r15): the first merge round's argmax materializes it —
        # eager was one extra job per call
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pair_structs = F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("w1"),
                F.element_at(F.col("syms"), F.lit(1) + i).alias("w2"),
            ),
        )
        best = (
            vocab.select("freq", F.explode(pair_structs).alias("p"))
            .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
            .first()
        )
        if best is None:
            break
        a, b, cnt = best["w1"], best["w2"], int(best["cnt"])
        merges.append((rank, a, b, cnt))
        merged = F.aggregate(
            F.slice("syms", 2, F.size("syms") - 1),
            F.slice("syms", 1, 1),
            lambda acc, s: F.when(
                (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        # lazy: next round's argmax (or the caller's first action)
        # materializes — eager was one extra job per merge round
        vocab = vocab.withColumn("syms", merged).localCheckpoint(eager=False)
    return merges


def bpe_apply_merges(
    words: "DataFrame",
    merges: list[tuple[int, str, str, int]],
) -> "DataFrame":
    """Apply a learned BPE merge list to a word table: returns
    (word, freq?, syms) with every merge folded in rank order — the
    ENCODE half of the tokenizer (train half: :func:`bpe_train_merges`).
    Runs on the vocabulary-sized distinct-word table; corpus-scale
    tokenization is then a broadcast join of this map onto the token
    stream, never a per-document re-derivation."""
    vocab = words.withColumn(
        "syms",
        F.concat(
            F.filter(F.split(F.col("word"), "(?!^)"), lambda s: s != ""),
            F.array(F.lit("</w>")),
        ),
    )
    def merge_step(a: str, b: str):
        # factory, not default-arg lambda: PySpark reads extra lambda
        # params as HOF arguments and rejects the arity
        def fold(acc: Column, s: Column) -> Column:
            return F.when(
                (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(s)))

        return fold

    for _, a, b, _cnt in merges:
        vocab = vocab.withColumn(
            "syms",
            F.aggregate(
                F.slice("syms", 2, F.size("syms") - 1),
                F.slice("syms", 1, 1),
                merge_step(a, b),
            ),
        )
    return vocab


def cdc_chunks(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    divisor: int = 64,
) -> "DataFrame":
    """Content-defined chunking (the storage-dedup/rsync primitive,
    FastCDC-style): cut each document where the rolling k-gram hash
    satisfies ``h % divisor == 0``, yielding chunks of EXPECTED size
    ``divisor`` chars whose boundaries depend only on local content.
    Because boundaries are content-defined, a span duplicated across
    documents at DIFFERENT offsets still produces identical chunks —
    the alignment-free property fixed-stride shingling lacks, and the
    reason CDC is the standard primitive for detecting copied passages
    / boilerplate inside otherwise-distinct documents.

    Returns (id, chunk_idx, chunk_start, chunk_text, chunk_fp) with
    1-based chunk_start, md5 chunk fingerprints, and chunk_idx ordinal
    per document. Fully deterministic and oracle-replayable: boundary
    hashes use ``portable_hash60`` and fingerprints are md5, so a plain
    SQL engine reproduces every boundary and every fingerprint.

    Scale shape: one k-gram explode (O(total chars), pipelined off the
    scan), a per-doc LEAD window for boundary pairing (one shuffle on
    the doc id), and a substring projection — no joins, no driver
    state. Documents shorter than k become one whole-doc chunk.
    """
    norm = df.select(
        F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__nt__")
    )
    t = F.col("__nt__")
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
    # boundary candidates: gram END positions i+k-1 where the gram
    # hash divides; sequence bound once (HOF-CSE lesson)
    grams = F.transform(F.sequence(F.lit(1), n_grams), lambda i: t.substr(i, F.lit(k)))
    g = norm.select("id", "__nt__", F.posexplode(grams).alias("pos0", "gram"))
    bounds = g.filter(
        (portable_hash60(F.col("gram")) % F.lit(divisor)) == 0
        # cut lands ON the gram's LAST character (1-based pos0 + k): that
        # char begins the NEXT chunk — matches the DuckDB oracle's i + 11
    ).select("id", (F.col("pos0") + F.lit(k)).alias("cut"))
    # synthetic start-of-doc cut at 1; end-of-doc handled by LEAD default
    starts = (
        norm.select("id", F.lit(1).alias("cut"))
        .unionByName(bounds.select("id", "cut"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("cut")
    spans = (
        starts.withColumn("next_cut", F.lead("cut").over(w))
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        spans.join(norm, "id")
        .select(
            "id",
            (F.col("rn") - 1).cast("long").alias("chunk_idx"),
            F.col("cut").cast("long").alias("chunk_start"),
            F.when(
                F.col("next_cut").isNotNull(),
                F.col("__nt__").substr(
                    F.col("cut"), F.col("next_cut") - F.col("cut")
                ),
            )
            .otherwise(
                F.col("__nt__").substr(
                    F.col("cut"), F.length("__nt__") - F.col("cut") + 1
                )
            )
            .alias("chunk_text"),
        )
        .filter(F.length("chunk_text") > 0)  # empty docs yield no chunks
        .withColumn("chunk_fp", F.md5("chunk_text"))
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.25,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k retrieval over the corpus for a fixed set of
    keyword queries — the inverted-index workload (Robertson & Zaragoza
    2009, Lucene's idf form ln(1 + (N − df + ½)/(df + ½)) so scores
    stay positive). No reference analog; LLM-pipeline extension (the
    standard quality probe for "is this corpus searchable / which docs
    dominate a term").

    Scale shape: one tokenize+explode off the scan with the query-term
    IN filter applied BEFORE the (doc, term) groupBy, so the posting
    shuffle carries only matching terms; the posting table persists
    because document frequency is a second consumer (a groupBy over
    the already-distinct posting rows, ≤ |query vocab| result rows,
    broadcast back) — without the persist Catalyst re-runs the corpus
    tokenize for a 10-row aggregate. Corpus stats (N, Σdl) are a
    1-row broadcast off a separate explode-free pass (size(split),
    no shuffle). Per-term contributions round through decimal(27,12)
    before the (query, doc) sum so the score is independent of
    partial-sum order on any engine. Top-k is a single row_number
    window per query: Spark's WindowGroupLimit rewrite runs a partial
    top-k on the map side BEFORE the exchange, so the final per-query
    task sorts ≤ k·n_input_partitions rows, never a whole posting
    list (plan-audited; the hand-salted two-phase form costs one more
    exchange for the same bound).

    Float parity contract with the DuckDB oracle: k1 and b must be
    exact binary fractions (defaults 1.25/0.75) so every constant
    folds to the identical double on both engines; all arithmetic is
    then IEEE ops over identical expression trees.
    """
    from pyspark.sql import Window

    import re as _re

    spark = df.sparkSession
    # query text goes through the SAME normalization as the corpus
    # (lowercase → strip punct → collapse whitespace): a raw split
    # would leave "Fast hash-join" matching nothing while the postings
    # hold {fast, hashjoin} — a silent zero-result query
    def _norm_terms(qtext: str) -> list[str]:
        t = _re.sub(r"\s+", " ", _re.sub(_PUNCT_CLASS, "", qtext.lower()))
        return [w for w in t.strip().split(" ") if w]

    q_rows = sorted(
        {(int(qid), t) for qid, qtext in queries for t in _norm_terms(qtext)}
    )
    qterms = spark.createDataFrame(q_rows, "query_id long, term string")
    all_terms = sorted({t for _, t in q_rows})

    lens = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    ).select("doc_id", F.size("toks").cast("long").alias("dl"), "toks")
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    from market_data_pipeline_databricks_spark.caching import persist_tracked

    # two consumers (scoring join + document frequency) — persist the
    # small posting table (≤ |docs|·|qvocab| rows) so the corpus
    # tokenize/explode runs once; tracked: it must outlive the call
    # (lazy return), callers release via caching.release_tracked()
    tf = persist_tracked(
        lens.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(all_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    denom = tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dld / avgdl)
    contrib = (idf * (tfd * F.lit(k1 + 1.0)) / denom).cast("decimal(27,12)")

    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("c", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("c").cast("double"), 6).alias("score"))
    )
    # |queries| partitions, but WindowGroupLimit's map-side partial
    # keeps ≤ k rows per (query, input partition) before the exchange
    wglob = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wglob).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
