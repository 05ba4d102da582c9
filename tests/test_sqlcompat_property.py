"""Property tests for the sqlcompat keyword scanner — the QUALIFY
rewrite is only as trustworthy as the literal/comment/paren tracking
underneath it, so generate adversarial statements with a KNOWN
ground-truth keyword position and check the scanner agrees.

No Spark session needed: these exercise the pure-string machinery.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from market_data_pipeline_databricks_spark.sqlcompat import (
    _find_deepest_qualify,
    _matching_paren,
    _rewrite_nested_qualify,
    _scan_top_level,
)

# Decoy fragments that CONTAIN the keyword but must never match: inside
# single/double/backtick literals (incl. doubled-quote escapes), line
# comments, block comments, hints.
DECOYS = st.sampled_from(
    [
        "'QUALIFY'",
        "'it''s QUALIFY here'",
        '"QUALIFY"',
        '"say ""QUALIFY"" twice"',
        "`QUALIFY`",
        "-- QUALIFY trailing comment\n",
        "/* QUALIFY in block */",
        "/*+ QUALIFY_HINT(x) */",
        "colqualify",
        "qualifycol",
        "x_QUALIFY_y",
    ]
)

FILLER = st.sampled_from(
    [
        "SELECT a, b FROM t WHERE x > 1 ",
        "JOIN u ON t.id = u.id ",
        "GROUP BY a ",
        "AND y IN (1, 2, 3) ",
        "OR name = 'O''Brien (the (second))' ",
        "" ,
    ]
)


@given(st.lists(st.one_of(DECOYS, FILLER), min_size=0, max_size=8))
@settings(max_examples=300, deadline=None)
def test_scanner_ignores_all_decoys(parts):
    text = " ".join(parts)
    assert _scan_top_level(text, "QUALIFY") == -1


@given(
    st.lists(st.one_of(DECOYS, FILLER), min_size=0, max_size=5),
    st.lists(st.one_of(DECOYS, FILLER), min_size=0, max_size=5),
)
@settings(max_examples=300, deadline=None)
def test_scanner_finds_real_keyword_after_decoys(before, after):
    prefix = " ".join(before)
    text = prefix + " QUALIFY rn = 1 " + " ".join(after)
    idx = _scan_top_level(text, "QUALIFY")
    # the real keyword is the FIRST top-level occurrence; everything in
    # `before` is a decoy, so the hit must be exactly where we put it
    assert idx == len(prefix) + 1, (idx, text)


@given(
    st.lists(st.one_of(DECOYS, FILLER), min_size=0, max_size=4),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=300, deadline=None)
def test_parenthesized_keyword_is_not_top_level(parts, depth):
    inner = " ".join(parts) + " QUALIFY rn = 1 "
    text = "SELECT * FROM " + "(" * depth + inner + ")" * depth
    assert _scan_top_level(text, "QUALIFY") == -1
    hit = _find_deepest_qualify(text)
    assert hit is not None
    qidx, open_idx = hit
    assert text[open_idx] == "("
    close = _matching_paren(text, open_idx)
    assert open_idx < qidx < close
    assert text[close] == ")"


@given(st.lists(st.one_of(DECOYS, FILLER), min_size=1, max_size=6))
@settings(max_examples=300, deadline=None)
def test_nested_rewrite_noop_without_real_qualify(parts):
    text = "SELECT * FROM (" + " ".join(parts) + " SELECT 1 )"
    assert _rewrite_nested_qualify(text) == text


def test_nested_rewrite_eliminates_every_nested_qualify():
    text = (
        "SELECT * FROM ("
        "  SELECT a FROM ("
        "    SELECT a, b FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY b) = 1"
        "  ) QUALIFY RANK() OVER (ORDER BY a) = 1"
        ") WHERE a > 0"
    )
    out = _rewrite_nested_qualify(text)
    assert _find_deepest_qualify(out) is None
    assert _scan_top_level(out, "QUALIFY") == -1
    # both rewrites landed, innermost first
    assert "__qualify_1__" in out and "__qualify_2__" in out


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@settings(max_examples=30, deadline=None)
def test_portable_hash60_parity_on_random_strings(strings):
    """portable_hash60 must agree with the DuckDB expression on
    arbitrary (incl. non-ASCII) strings — the bit-for-bit contract the
    oracle-replayed LSH family rests on. Hash math is checked here in
    pure Python (md5 is md5) against DuckDB; the Spark expression is
    pinned separately in test_training_ops (needs a session)."""
    import duckdb
    import hashlib

    con = duckdb.connect()
    for s in strings:
        want = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        got = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got == want, (s, got, want)
