"""Round-4 extension ops: technical indicators (Bollinger, RSI,
cross-sectional momentum, MACD), events value analytics (LTV deciles,
inter-arrival quantiles), bigram LM scoring, RFM segmentation and the
embedding-health queries.

Each test checks SEMANTICS independently of the DuckDB oracle gate —
pandas replays for the recursive/windowed math, closed-form invariants
for the rest — so a bug that slipped into both the Spark query and its
oracle SQL would still be caught.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from market_data_pipeline_databricks_spark.plans import (
    feature_ops,
    relational_ext,
    text_ops,
    vector_ops,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- feature


def _daily_pd(spark):
    return (
        feature_ops._daily(spark, SF)
        .toPandas()
        .sort_values(["suppkey", "day"])
        .reset_index(drop=True)
    )


def test_bollinger_matches_pandas_replay(spark):
    out = feature_ops.funcs_bollinger_bands(spark, SF).toPandas()
    daily = _daily_pd(spark)
    sup = daily["suppkey"].iloc[0]
    g = daily[daily["suppkey"] == sup]
    got = (
        out[out["suppkey"] == sup].sort_values("day").reset_index(drop=True)
    )
    ma = g["close"].rolling(20, min_periods=1).mean().reset_index(drop=True)
    sd = g["close"].rolling(20, min_periods=1).std(ddof=1).reset_index(drop=True)
    for i in range(len(g)):
        assert abs(got["ma_20d"][i] - ma[i]) < 1e-4
        if pd.isna(sd[i]) or sd[i] == 0:
            assert pd.isna(got["bandwidth"][i]) and pd.isna(got["pct_b"][i])
        else:
            assert abs(got["bandwidth"][i] - 4 * sd[i] / ma[i]) < 1e-4
            close = g["close"].iloc[i]
            want = (close - (ma[i] - 2 * sd[i])) / (4 * sd[i])
            assert abs(got["pct_b"][i] - want) < 1e-4


def test_rsi_bounds_and_warmup(spark):
    out = feature_ops.funcs_rsi(spark, SF).toPandas()
    filled = out[out["rsi_14"].notna()]
    assert len(filled) > 0
    assert (filled["rsi_14"] >= 0).all() and (filled["rsi_14"] <= 100).all()
    # warmup: the first 13 change-rows of every key carry NULL RSI
    first = out.sort_values(["suppkey", "day"]).groupby("suppkey").head(13)
    assert first["rsi_14"].isna().all()


def test_rsi_matches_pandas_replay(spark):
    out = feature_ops.funcs_rsi(spark, SF).toPandas()
    daily = _daily_pd(spark)
    sup = daily["suppkey"].iloc[0]
    g = daily[daily["suppkey"] == sup].reset_index(drop=True)
    chg = g["close"].diff().dropna().reset_index(drop=True)
    gain = chg.clip(lower=0).rolling(14).mean()
    loss = (-chg).clip(lower=0).rolling(14).mean()
    got = (
        out[out["suppkey"] == sup].sort_values("day").reset_index(drop=True)
    )
    for i in range(len(chg)):
        if pd.isna(gain[i]):
            assert pd.isna(got["rsi_14"][i])
        elif loss[i] == 0:
            assert got["rsi_14"][i] == 100.0
        else:
            want = 100 - 100 / (1 + gain[i] / loss[i])
            assert abs(got["rsi_14"][i] - want) < 1e-4


def test_cross_sectional_momentum_ntile_shape(spark):
    out = feature_ops.funcs_cross_sectional_momentum(spark, SF).toPandas()
    assert out["decile"].between(1, 10).all()
    # NTILE balance: per day, bucket sizes differ by at most 1
    for _, g in out.groupby("day"):
        sizes = g["n_suppliers"]
        assert sizes.max() - sizes.min() <= 1
    # decile 1 holds the best momentum: means decrease with decile
    # on days with a full spread
    wide = out[out.groupby("day")["decile"].transform("size") == 10]
    for _, g in wide.groupby("day"):
        g = g.sort_values("decile")
        assert (g["mean_mom"].diff().dropna() <= 1e-9).all()


def test_macd_matches_pandas_replay(spark):
    out = feature_ops.funcs_macd(spark, SF).toPandas()
    daily = _daily_pd(spark)
    sup = daily["suppkey"].iloc[0]
    x = daily[daily["suppkey"] == sup]["close"].reset_index(drop=True)
    e12 = x.ewm(alpha=2 / 13, adjust=False).mean()
    e26 = x.ewm(alpha=2 / 27, adjust=False).mean()
    macd = e12 - e26
    sig = macd.ewm(alpha=2 / 10, adjust=False).mean()
    got = (
        out[out["suppkey"] == sup].sort_values("day").reset_index(drop=True)
    )
    for i in range(len(x)):
        assert abs(got["macd"][i] - macd[i]) < 1e-6
        assert abs(got["macd_signal"][i] - sig[i]) < 1e-6
        assert abs(got["macd_hist"][i] - (macd[i] - sig[i])) < 1e-4


# ----------------------------------------------------------------- events


def test_ltv_deciles_partition_users(spark):
    from market_data_pipeline_databricks_spark.plans.relational import _events

    out = text_ops.events_user_value_deciles(spark, SF).toPandas()
    n_users = _events(spark, SF).select("user_id").distinct().count()
    assert out["n_users"].sum() == n_users
    assert out["decile"].between(1, 10).all()
    # deciles order by value: min of decile k+1 >= max of decile k... the
    # strict-> bucketing makes ranges non-overlapping in this direction
    g = out.sort_values("decile")
    assert (g["min_ltv"] <= g["max_ltv"]).all()
    assert (
        g["max_ltv"].iloc[:-1].values <= g["min_ltv"].iloc[1:].values + 1e-9
    ).all()


def test_interarrival_quantiles_ordered(spark):
    out = text_ops.events_interarrival_quantiles(spark, SF).toPandas()
    assert len(out) > 0
    assert (out["p50_s"] <= out["p90_s"]).all()
    assert (out["p90_s"] <= out["p99_s"]).all()
    assert (out["p50_s"] > 0).all()


# ------------------------------------------------------------------- text


def test_bigram_logprob_positive_and_complete(spark):
    out = text_ops.text_bigram_logprob(spark, SF).toPandas()
    docs = text_ops._docs(spark, SF).count()
    # every doc with >= 2 tokens appears; the corpus has no sub-2-token
    # docs, so coverage is total
    assert len(out) == docs
    assert (out["avg_neg_logprob"] > 0).all()
    assert (out["n_bigrams"] >= 1).all()


def test_bigram_logprob_bounded_by_backoff_floor(spark):
    # P >= 0.1 * p_uni(w2) > 0 and P <= 1, so 0 < -log P <= -log(0.1 * min p_uni)
    out = text_ops.text_bigram_logprob(spark, SF).toPandas()
    assert (out["avg_neg_logprob"] <= -math.log(0.1 * 1e-9)).all()


# -------------------------------------------------------------- warehouse


def test_rfm_segments_partition_customers(spark):
    from market_data_pipeline_databricks_spark.plans.relational import _t

    out = relational_ext.agg_customer_rfm_segments(spark, SF).toPandas()
    n_cust = _t(spark, SF, "orders").select("o_custkey").distinct().count()
    assert out["n_customers"].sum() == n_cust
    assert set(out["segment"]).issubset(
        {"champion", "recent", "loyal_lapsing", "warm", "hibernating"}
    )
    assert (out["avg_recency_d"] >= 0).all()
    assert (out["avg_frequency"] >= 1).all()


# ---------------------------------------------------------------- vectors


def test_dim_stats_shape_and_flags(spark):
    out = vector_ops.vector_dim_stats(spark, SF).toPandas()
    n_vecs = vector_ops._emb(spark, SF).count()
    assert (out["n_vals"] == n_vecs).all()
    assert (out["min_val"] <= out["mean_val"]).all()
    assert (out["mean_val"] <= out["max_val"]).all()
    # real embeddings: no collapsed dimensions in the testdata
    assert (~out["near_constant"]).all()


def test_label_cohesion_diagonal_is_one(spark):
    out = vector_ops.vector_label_cohesion(spark, SF).toPandas()
    diag = out[out["label_a"] == out["label_b"]]
    labels = vector_ops._emb(spark, SF).select("label").distinct().count()
    assert len(diag) == labels
    assert (diag["centroid_cosine"] - 1.0).abs().max() < 1e-6
    off = out[out["label_a"] != out["label_b"]]
    assert len(out) == labels * (labels + 1) // 2
    # distinct labels are separable: off-diagonal strictly below 1
    assert (off["centroid_cosine"] < 1.0).all()


# ------------------------------------------------------------ as-of nearest


def test_asof_nearest_picks_closer_side(spark):
    from market_data_pipeline_databricks_spark.plans import asof_ops

    near = asof_ops.join_asof_nearest_quotes(spark, SF).toPandas()
    back = (
        asof_ops.join_asof_orders_quotes(spark, SF)
        .toPandas()
        .set_index("o_orderkey")
    )
    fwd = (
        asof_ops.join_asof_forward_quotes(spark, SF)
        .toPandas()
        .set_index("o_orderkey")
    )
    assert len(near) == len(back) == len(fwd)
    for _, r in near.head(300).iterrows():
        b_day = back.loc[r["o_orderkey"], "quote_day"]
        f_day = fwd.loc[r["o_orderkey"], "quote_day"]
        if pd.isna(b_day) and pd.isna(f_day):
            assert pd.isna(r["quote_day"]) and r["direction"] is None
        elif pd.isna(f_day):
            assert r["direction"] == "backward" and r["quote_day"] == b_day
        elif pd.isna(b_day):
            assert r["direction"] == "forward" and r["quote_day"] == f_day
        else:
            db = (r["odate"] - b_day).days
            df_ = (f_day - r["odate"]).days
            want = "backward" if db <= df_ else "forward"
            assert r["direction"] == want
            assert r["quote_day"] == (b_day if want == "backward" else f_day)


def test_sharpe_sortino_replay(spark):
    import numpy as np

    out = feature_ops.funcs_sharpe_sortino(spark, SF).toPandas()
    daily = _daily_pd(spark)
    sup = daily["suppkey"].iloc[0]
    x = daily[daily["suppkey"] == sup]["close"].reset_index(drop=True)
    lr = np.log(x / x.shift(1)).dropna()
    mean, sd = lr.mean(), lr.std(ddof=1)
    downside = float(np.sqrt((np.minimum(lr, 0) ** 2).mean()))
    got = out[out["suppkey"] == sup].iloc[0]
    assert abs(got["sharpe"] - mean / sd * math.sqrt(252)) < 1e-4
    assert abs(got["sortino"] - mean / downside * math.sqrt(252)) < 1e-4


def test_dow_seasonality_shape(spark):
    out = feature_ops.funcs_dow_seasonality(spark, SF).toPandas()
    assert sorted(out["dow"]) == list(range(7))
    assert (out["pos_share"] >= 0).all() and (out["pos_share"] <= 1).all()
    daily = _daily_pd(spark)
    n_rets = len(daily) - daily["suppkey"].nunique()
    assert out["n_obs"].sum() == n_rets


def test_benford_screen_consistency(spark):
    from market_data_pipeline_databricks_spark.plans import analyst

    out = analyst.quality_benford_screen(spark, SF).toPandas()
    assert sorted(out["digit"]) == list(range(1, 10))
    assert abs(out["obs_share"].sum() - 1.0) < 1e-4
    assert abs(out["benford_share"].sum() - 1.0) < 1e-4
    assert out["chi2_stat"].nunique() == 1 and (out["chi2_stat"] >= 0).all()


def test_zipf_fit_slope_negative(spark):
    from market_data_pipeline_databricks_spark.plans import analyst

    out = analyst.text_zipf_fit(spark, SF).toPandas()
    assert len(out) == 1
    # the synthetic corpus vocab is ~31 tokens at sf0.001; the query
    # caps at 200 so n_terms = min(vocab, 200)
    assert out["n_terms"][0] > 20
    assert out["zipf_slope"][0] < 0          # frequency falls with rank
    assert out["zipf_intercept"][0] > 0      # top-rank frequency > 1


def test_atr_parkinson_matches_pandas_replay(spark):
    """ATR/Parkinson vs a pandas walk on one supplier's bars: TR
    first-row fallback (high-low), gap extension over prior close, and
    the 4ln2 normalization; flat bars contribute 0 to Parkinson."""
    out = feature_ops.funcs_atr_parkinson(spark, SF).toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    li["day"] = li["l_shipdate"].dt.date
    one = li[li["l_suppkey"] == li["l_suppkey"].iloc[0]]
    key = one["l_suppkey"].iloc[0]
    bars = (
        one.groupby("day")["l_extendedprice"]
        .agg(high="max", low="min", close="mean")
        .reset_index()
        .sort_values("day")
    )
    bars["close"] = bars["close"].round(6)
    prev = bars["close"].shift(1)
    tr = pd.concat(
        [
            bars["high"] - bars["low"],
            (bars["high"] - prev).abs(),
            (bars["low"] - prev).abs(),
        ],
        axis=1,
    ).max(axis=1, skipna=True)
    atr = tr.rolling(14, min_periods=1).mean()
    park = (
        ((bars["high"] / bars["low"]).apply(math.log) ** 2)
        .rolling(20, min_periods=1)
        .mean()
        / (4 * math.log(2))
    ) ** 0.5
    got = out[out["suppkey"] == key].sort_values("day")
    assert len(got) == len(bars)
    # tolerance is one truncation quantum: pandas' rolling-mean
    # accumulation order differs from Spark's window sum at the ulp
    # level, and floor() amplifies an ulp into a full 1e-6 step when
    # the true value sits on a boundary
    for g_atr, w_atr, g_pk, w_pk in zip(
        got["atr_14"], atr, got["parkinson_20"], park
    ):
        assert abs(g_atr - math.floor(w_atr * 1e6) / 1e6) <= 1.0001e-6
        assert abs(g_pk - math.floor(w_pk * 1e6) / 1e6) <= 1.0001e-6


def test_km_survival_matches_python_replay(spark):
    """Kaplan-Meier replay: derive per-user durations independently,
    walk the estimator in Python, and compare the curve exactly;
    survival must be monotone non-increasing from <= 1."""
    from market_data_pipeline_databricks_spark.plans import text_ops as TXO

    out = sorted(
        (r.t_days, r.n_at_risk, r.n_converted, r.survival)
        for r in TXO.events_conversion_survival(spark, SF).collect()
    )
    # independent duration derivation in pandas
    from market_data_pipeline_databricks_spark.sources.tables import read_events

    ev = read_events(spark, SF).toPandas()
    durs = []
    mx = None
    per = {}
    for uid, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"].ts
        if views.empty:
            continue
        tv = views.min()
        purch = g[(g.event_type == "purchase") & (g.ts >= tv)].ts
        tp = purch.min() if not purch.empty else None
        per[uid] = (tv, tp)
        cand = tp if tp is not None else tv
        mx = cand if mx is None or cand > mx else mx
    for tv, tp in per.values():
        if tp is not None:
            durs.append(((tp.date() - tv.date()).days, 1))
        else:
            durs.append(((mx.date() - tv.date()).days, 0))
    from collections import Counter

    m = Counter(t for t, _ in durs)
    k = Counter(t for t, e in durs if e == 1)
    total = len(durs)
    want = []
    s = 1.0
    before = 0
    for t in sorted(m):
        risk = total - before
        factor = 1 - k.get(t, 0) / risk
        s = 0.0 if factor == 0 or s == 0.0 else s * factor
        want.append((t, risk, k.get(t, 0), round(s, 6)))
        before += m[t]
    assert [w[:3] for w in want] == [o[:3] for o in out]
    for (t, _, _, ws), (_, _, _, os_) in zip(want, out):
        assert abs(ws - os_) < 1e-6, t
    # curve sanity
    surv = [o[3] for o in out]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert surv[0] <= 1.0
