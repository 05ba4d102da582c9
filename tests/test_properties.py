"""Property-based invariants (hypothesis) over the core operators.

Each property runs few examples (Spark round-trips are costly) but
explores adversarial shapes a hand fixture won't: empty frames,
all-duplicate keys, NULL-heavy columns, single-row groups.
"""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_symbols = st.sampled_from(["AAA", "BBB", "CCC"])
_dates = st.dates(dt.date(2025, 1, 1), dt.date(2025, 2, 28))
_prices = st.one_of(
    st.none(), st.floats(-10, 1000, allow_nan=False, width=32).map(float)
)

_rows = st.lists(
    st.tuples(_symbols, _dates, _prices, _prices, _prices, _prices),
    min_size=0,
    max_size=40,
)


def _silver_input(spark, rows):
    data = [
        (s, d, o, h, l, c, 100, "t", dt.datetime(2025, 3, 1), "f.csv")
        for (s, d, o, h, l, c) in rows
    ]
    return spark.createDataFrame(
        data,
        "symbol string, date date, open double, high double, low double, "
        "close double, volume long, source string, ingested_at timestamp, "
        "input_file string",
    )


@given(rows=_rows)
@settings(**SETTINGS)
@pytest.mark.slow
def test_silver_partitions_every_row(spark, rows):
    """valid ∪ rejected == deduped input, disjointly — no row is lost
    or double-routed whatever the data looks like."""
    from market_data_pipeline_databricks_spark.operators.silver import (
        dedup_latest,
        split_silver,
    )

    df = _silver_input(spark, rows)
    deduped = dedup_latest(df)
    valid, rejected = split_silver(deduped)
    n, nv, nr = deduped.count(), valid.count(), rejected.count()
    assert n == nv + nr
    # rejected rows always carry a reason; valid rows never would
    assert rejected.filter(F.col("reject_reason").isNull()).count() == 0


@given(rows=_rows)
@settings(**SETTINGS)
def test_dedup_latest_is_idempotent_and_keyed(spark, rows):
    from market_data_pipeline_databricks_spark.operators.silver import dedup_latest

    df = _silver_input(spark, rows)
    once = dedup_latest(df)
    # unique (symbol, date) grain
    assert once.groupBy("symbol", "date").count().filter("count > 1").count() == 0
    # idempotent
    assert dedup_latest(once).count() == once.count()


@given(
    batch=st.lists(
        st.tuples(_symbols, _dates, st.floats(1, 100, allow_nan=False)),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_upsert_idempotent(spark, tmp_path_factory, batch):
    """Re-applying the same batch is a no-op on final state (S6)."""
    from market_data_pipeline_databricks_spark.sources.writers import upsert_by_key

    wh = str(tmp_path_factory.mktemp("wh"))
    df = spark.createDataFrame(
        [(s, d, float(c)) for (s, d, c) in batch],
        "symbol string, date date, close double",
    ).dropDuplicates(["symbol", "date"])
    upsert_by_key(spark, df, wh, "t", ["symbol", "date"])
    first = sorted(map(tuple, spark.read.parquet(f"{wh}/t").collect()))
    upsert_by_key(spark, df, wh, "t", ["symbol", "date"])
    second = sorted(map(tuple, spark.read.parquet(f"{wh}/t").collect()))
    assert first == second


@given(
    texts=st.lists(
        # ASCII only: unicode case-folding is not round-trippable
        # (ß→SS, dotless-ı) and normalize_text promises only
        # ASCII-case + whitespace invariance
        st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=80),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_fingerprint_invariant_to_whitespace(spark, texts):
    """Normalized fingerprints ignore ASCII case and whitespace runs."""
    from market_data_pipeline_databricks_spark.operators.text import fingerprint

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = [r[0] for r in df.select(fingerprint(F.col("text"))).collect()]
    mangled = df.select(
        F.concat(F.lit("  "), F.upper("text"), F.lit("\t")).alias("text")
    )
    b = [r[0] for r in mangled.select(fingerprint(F.col("text"))).collect()]
    assert a == b


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=30),
    budget=st.integers(min_value=16, max_value=512),
)
@settings(**SETTINGS)
def test_pack_sequences_invariants(spark, tokens, budget):
    """Concat-and-chunk packing: chunk ranges are contiguous across the
    shard (each doc starts in the chunk the previous doc ended in, or
    the next one) and the final chunk index equals the total token
    count's chunk."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate(tokens)],
        "doc_id long, source string, n_tokens long",
    )
    rows = sorted(
        pack_sequences(df, "doc_id", "n_tokens", budget, "source").collect(),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    for r in rows:
        assert r["start_chunk"] == cum // budget
        cum += r["n_tokens"]
        assert r["end_chunk"] == (cum - 1) // budget
        assert r["start_chunk"] <= r["end_chunk"]
    assert rows[-1]["end_chunk"] == (sum(tokens) - 1) // budget


@given(
    r1=st.floats(min_value=0.0, max_value=1.0),
    r2=st.floats(min_value=0.0, max_value=1.0),
)
@settings(**SETTINGS)
def test_weighted_sample_monotone_nested(spark, r1, r2):
    """Keep-sets nest: every id kept at the lower rate is kept at the
    higher rate (the property that makes mixture re-weighting stable
    across runs — raising a domain's weight only ADDS documents)."""
    from market_data_pipeline_databricks_spark.operators.sampling import (
        weighted_sample_flag,
    )

    lo, hi = sorted([r1, r2])
    df = spark.range(300).withColumnRenamed("id", "doc_id")
    kept_lo = {r[0] for r in df.filter(weighted_sample_flag(F.col("doc_id"), F.lit(lo))).collect()}
    kept_hi = {r[0] for r in df.filter(weighted_sample_flag(F.col("doc_id"), F.lit(hi))).collect()}
    assert kept_lo <= kept_hi


_words = st.sampled_from(
    ["the", "a", "of", "and", "fox", "table", "internationalization",
     "x", "!!", "data,", "query.", "spark;"]
)
_doc_texts = st.lists(
    st.lists(_words, min_size=0, max_size=60).map(" ".join),
    min_size=1,
    max_size=25,
)


@given(texts=_doc_texts)
@settings(**SETTINGS)
def test_gopher_rules_match_python_reference(spark, texts):
    """The six Gopher rules re-implemented in plain Python over the
    same normalization must agree with the Spark column algebra on
    arbitrary word-soup documents (including empty and repetitive)."""
    import math
    import re

    from market_data_pipeline_databricks_spark.plans.text_ops import (
        text_gopher_rules,
    )

    import os
    import tempfile

    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id: r for r in text_gopher_rules(spark, d).collect()}

    punct = r"[.,!?;:'\"()\[\]{}\-]"
    stop = {"the", "a", "of", "and", "in", "to", "is"}
    for i, t in enumerate(texts):
        ntext = re.sub(r"\s+", " ", re.sub(punct, "", t.lower())).strip()
        toks = ntext.split(" ")
        n_tok = len(toks)
        mean_wl = round(len(ntext.replace(" ", "")) / n_tok, 6)
        n_stop = sum(1 for x in toks if x in stop)
        n_punct = len(re.findall(punct, t))
        symbol_frac = (
            round(n_punct / len(t), 6) if len(t) else float("nan")
        )
        top_share = round(
            max(toks.count(u) for u in set(toks)) / n_tok, 6
        )
        r = got[i]
        assert r.n_tokens == n_tok
        assert math.isclose(r.mean_word_len, mean_wl, abs_tol=5e-7)
        assert r.n_stopwords == n_stop
        assert r.top_unigram_share == pytest_approx(top_share)
        fired = (
            n_tok < 15
            or n_tok > 100000
            or r.mean_word_len < 2.0
            or r.mean_word_len > 10.0
            or n_stop < 2
            or (not math.isnan(symbol_frac) and r.symbol_frac > 0.1)
            or r.top_unigram_share > 0.2
        )
        assert r.keep == (not fired), (i, t, r)


def pytest_approx(x):
    import pytest

    return pytest.approx(x, abs=5e-7)


def test_text_stats_handles_empty_and_whitespace_docs(spark):
    """Zero-length and whitespace-only texts must flow through the
    stats block without ANSI division errors, scoring quality 0."""
    from market_data_pipeline_databricks_spark.operators.text import (
        with_text_stats,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "!!!"), (4, "the fox and the dog in a den")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in with_text_stats(df).collect()}
    assert rows[1].quality == 0.0 and rows[1].lang_pred == "und"
    assert rows[2].quality == 0.0
    assert rows[3].quality == 0.0  # punctuation soup, no tokens survive
    assert rows[4].quality > 0.0


_streams = st.lists(
    st.tuples(
        st.integers(1, 4),                      # user_id
        st.integers(0, 100000),                 # seconds offset
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=2,
    max_size=60,
)


@given(events=_streams)
@settings(**SETTINGS)
def test_markov_transitions_match_python_reference(spark, events):
    """Transition counts over arbitrary event streams (including
    duplicate timestamps, where event_id breaks the tie) must equal a
    plain-Python walk over the same ordering."""
    import os
    import tempfile

    import pandas as pd

    from market_data_pipeline_databricks_spark.plans.text_ops import (
        events_markov_transitions,
    )

    t0 = dt.datetime(2025, 6, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=sec), uid, et, 1.0, "{}")
        for i, (uid, sec, et) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "events.parquet"))
        got = {
            (r.from_type, r.to_type): r.n
            for r in events_markov_transitions(spark, d).collect()
        }
    expect: dict = {}
    bykey = sorted(rows, key=lambda r: (r[2], r[1], r[0]))
    for a, b in zip(bykey, bykey[1:]):
        if a[2] == b[2]:
            expect[(a[3], b[3])] = expect.get((a[3], b[3]), 0) + 1
    assert got == expect


@given(events=_streams)
@settings(**SETTINGS)
def test_chi2_observed_grid_matches_python_reference(spark, events):
    """Observed contingency counts and the decimal-summed total over
    arbitrary event streams must match a plain-Python tabulation."""
    import os
    import tempfile

    import pandas as pd

    from market_data_pipeline_databricks_spark.plans.text_ops import (
        events_chi2_independence,
    )

    t0 = dt.datetime(2025, 6, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=sec), uid, et, float((i * 37) % 150), "{}")
        for i, (uid, sec, et) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "events.parquet"))
        got = {
            (r.event_type, r.value_band): r
            for r in events_chi2_independence(spark, d).collect()
        }
    expect: dict = {}
    for _, _, _, et, v, _ in rows:
        band = "lo" if v < 10 else ("mid" if v < 100 else "hi")
        expect[(et, band)] = expect.get((et, band), 0) + 1
    assert {k: r.n_obs for k, r in got.items()} == expect
    total = round(sum(r.chi2_cell for r in got.values()), 6)
    assert all(abs(r.chi2_total - total) < 1e-6 for r in got.values())


@given(events=_streams)
@settings(**SETTINGS)
def test_top_paths_match_python_reference_on_random_streams(spark, events):
    """Trigram path counts over arbitrary streams (duplicate
    timestamps included) equal the Python walk; the top-20 cut obeys
    (count desc, path asc)."""
    import os
    import tempfile

    import pandas as pd

    from market_data_pipeline_databricks_spark.plans.text_ops import (
        events_top_paths,
    )

    t0 = dt.datetime(2025, 6, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=sec), uid, et, 1.0, "{}")
        for i, (uid, sec, et) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "events.parquet"))
        got = {
            (r.path, r.n_paths)
            for r in events_top_paths(spark, d).collect()
        }
    counts: dict = {}
    bykey = sorted(rows, key=lambda r: (r[2], r[1], r[0]))
    for a, b, c in zip(bykey, bykey[1:], bykey[2:]):
        if a[2] == b[2] == c[2]:
            p = f"{a[3]}>{b[3]}>{c[3]}"
            counts[p] = counts.get(p, 0) + 1
    expect = set(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    )
    assert got == expect


@given(events=_streams)
@settings(**SETTINGS)
def test_session_stats_match_python_reference(spark, events):
    """Session assignment, duration, and conversion over random
    streams equal a Python replay of the 30-minute-idle rule."""
    import os
    import tempfile

    import pandas as pd

    from market_data_pipeline_databricks_spark.plans.text_ops import (
        events_session_stats,
    )

    t0 = dt.datetime(2025, 6, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=sec), uid, et, 1.0, "{}")
        for i, (uid, sec, et) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "events.parquet"))
        got = {
            (r.user_id, r.session_id): (r.n_events, r.duration_s, r.converted)
            for r in events_session_stats(spark, d).collect()
        }
    expect: dict = {}
    bykey = sorted(rows, key=lambda r: (r[2], r[1], r[0]))
    prev_user, prev_ts, sid = None, None, 0
    cur: list = []

    def flush():
        if cur:
            us = [int(x[1].timestamp() * 1_000_000) for x in cur]
            expect[(cur[0][2], sid)] = (
                len(cur),
                (max(us) - min(us)) // 1_000_000,
                any(x[3] == "purchase" for x in cur),
            )

    for r in bykey:
        if r[2] != prev_user:
            flush()
            prev_user, sid, cur = r[2], 1, [r]
        elif (r[1] - prev_ts).total_seconds() > 1800:
            flush()
            sid += 1
            cur = [r]
        else:
            cur.append(r)
        prev_ts = r[1]
    flush()
    assert got == expect


# ---------------------------------------------------------------------------
# Round 6: tuning-law invariants (pure functions, no Spark)
# ---------------------------------------------------------------------------


@given(
    n=st.integers(min_value=1, max_value=10**9),
    threshold=st.floats(min_value=0.05, max_value=0.99),
)
@settings(max_examples=200, deadline=None)
def test_lsh_auto_tuning_honors_miss_budget(n, threshold):
    import math

    from market_data_pipeline_databricks_spark.operators.similarity import (
        lsh_auto_tuning,
    )

    p, t = lsh_auto_tuning(n, threshold)
    assert p >= 3 and t >= 1
    p1 = 1.0 - math.acos(threshold) / math.pi
    miss = (1.0 - p1**p) ** t
    # the solved table count must satisfy the 2e-7 per-pair miss budget
    # (tiny numeric slack for the float pow chain)
    assert miss <= 2e-7 * (1 + 1e-9)


@given(
    threshold=st.floats(min_value=0.05, max_value=0.99),
    n1=st.integers(min_value=1, max_value=10**6),
    n2=st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=100, deadline=None)
def test_lsh_auto_tuning_planes_monotone_in_corpus(threshold, n1, n2):
    from market_data_pipeline_databricks_spark.operators.similarity import (
        lsh_auto_tuning,
    )

    lo, hi = sorted((n1, n2))
    p_lo, _ = lsh_auto_tuning(lo, threshold)
    p_hi, _ = lsh_auto_tuning(hi, threshold)
    # a bigger corpus never gets FEWER planes (candidate volume would
    # silently go quadratic again)
    assert p_hi >= p_lo


@given(n=st.integers(min_value=1, max_value=10**9))
@settings(max_examples=200, deadline=None)
def test_ivf_auto_tuning_sublinear_probe_work(n):
    from market_data_pipeline_databricks_spark.operators.similarity import (
        ivf_auto_tuning,
    )

    cells, nprobe = ivf_auto_tuning(n)
    assert cells >= 16 and nprobe >= 3
    assert nprobe <= cells
    # probe work per query is O(sqrt n * log n): catch any
    # constant-fraction (linear-class) or sqrt-cells (n^0.75-class)
    # regression
    work = n * nprobe / cells + cells
    import math

    assert work <= 10 * math.sqrt(n) * max(math.log2(n + 1), 1) + 200


@given(
    p=st.integers(min_value=1, max_value=24),
    t=st.integers(min_value=1, max_value=5000),
)
@settings(max_examples=200, deadline=None)
def test_lsh_candidate_fraction_bounds(p, t):
    from market_data_pipeline_databricks_spark.operators.similarity import (
        lsh_candidate_fraction,
    )

    f = lsh_candidate_fraction(p, t)
    assert 0.0 <= f <= 1.0
    # one more table never reduces the candidate fraction
    assert lsh_candidate_fraction(p, t + 1) >= f
    # one more plane never increases it
    assert lsh_candidate_fraction(p + 1, t) <= f
