"""Property-based SCD2: for ANY update batch against ANY current
dimension state, scd2_apply matches a plain-Python model, keeps exactly
one current row per key, and tiles validity intervals."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from market_data_pipeline_databricks_spark.operators.scd import scd2_apply

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.integers(1, 8)
_names = st.sampled_from(["a", "b", "c", None])
_scores = st.one_of(st.none(), st.sampled_from([1.0, 2.5, 7.0]))

# current dimension: unique keys (one current row each)
_dim_rows = st.lists(
    st.tuples(_keys, _names, _scores), max_size=8, unique_by=lambda t: t[0]
)
# update batch: unique keys per batch (the documented contract)
_upd_rows = st.lists(
    st.tuples(_keys, _names, _scores), max_size=8, unique_by=lambda t: t[0]
)

EFF = dt.date(2025, 8, 1)
FROM = dt.date(2025, 1, 1)


def _model(dim_rows, upd_rows):
    """Python reference: returns {key: [(name, score, vfrom, vto, cur)]}."""
    cur = {k: (n, s) for k, n, s in dim_rows}
    out = {}
    for k, (n, s) in cur.items():
        out[k] = [(n, s, FROM, None, True)]
    for k, n, s in upd_rows:
        if k in cur:
            cn, cs = cur[k]
            if (cn, cs) == (n, s):
                continue  # unchanged — ignored
            out[k] = [
                (cn, cs, FROM, EFF, False),
                (n, s, EFF, None, True),
            ]
        else:
            out[k] = [(n, s, EFF, None, True)]
    return out


@given(dim_rows=_dim_rows, upd_rows=_upd_rows)
@settings(**SETTINGS)
def test_scd2_matches_python_model(spark, dim_rows, upd_rows):
    dim = spark.createDataFrame(
        [(k, n, s, FROM, None, True) for k, n, s in dim_rows],
        "k int, name string, score double, valid_from date, "
        "valid_to date, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(k, n, s, EFF) for k, n, s in upd_rows],
        "k int, name string, score double, effective_date date",
    )
    got = {}
    for r in scd2_apply(dim, upd, ["k"], ["name", "score"]).collect():
        got.setdefault(r.k, []).append(
            (r.name, r.score, r.valid_from, r.valid_to, r.is_current)
        )
    want = _model(dim_rows, upd_rows)
    assert {k: sorted(v, key=str) for k, v in got.items()} == {
        k: sorted(v, key=str) for k, v in want.items()
    }
    # structural invariants on the output itself
    for k, rows in got.items():
        assert sum(1 for r in rows if r[4]) == 1  # one current row
        ordered = sorted(rows, key=lambda r: r[2])
        for a, b in zip(ordered, ordered[1:]):
            assert a[3] == b[2]  # intervals tile
