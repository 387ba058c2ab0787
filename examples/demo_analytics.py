"""Product-analytics demo over a synthetic event log: the round-7 wave as
one session — sessionization metrics, path mining, funnels, growth counts,
experimentation, and monitoring. Everything prints in < a minute on
local[*]:

    python examples/demo_analytics.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark import get_spark
from ml_feature_store_pipeline_spark.generator import generate_events
from ml_feature_store_pipeline_spark.operators import drift, sampling, windows
from ml_feature_store_pipeline_spark.quality import benford_profile, k_anonymity_profile


def main() -> None:
    spark = get_spark("demo_analytics")
    ev = generate_events(spark, n_events=50_000, n_users=500, seed=7).withColumn(
        "event_id", F.xxhash64("user_id", "timestamp", "event_type", "amount")
    )

    print("== session metrics (30-min gap) ==")
    s = windows.session_stats(ev, "user_id", "timestamp", 1800).collect()[0]
    print(
        f"  sessions={s['n_sessions']}  bounce_rate={s['bounce_rate']}  "
        f"avg_events={s['avg_session_events']}  median_dur_s={s['median_duration_s']}"
    )

    print("== top in-session paths ==")
    for r in windows.session_ngram_topk(
        ev, "user_id", "timestamp", "event_type", 1800, n=3, top_k=5,
        tie_col="event_id",
    ).collect():
        print(f"  {r['ngram']}: {r['n']}")

    print("== view → click → purchase funnel ==")
    for r in windows.funnel_summary(
        ev, "user_id", "timestamp", "event_type", ["view", "click", "purchase"]
    ).collect():
        print(
            f"  {r['stage_idx']}. {r['stage']}: {r['n_keys']} users "
            f"(from prev {r['conv_from_prev']})"
        )

    print("== time-to-convert (view → purchase) ==")
    c = windows.conversion_latency_stats(
        ev, "user_id", "timestamp", "event_type", "view", "purchase"
    ).collect()[0]
    print(
        f"  conv_rate={c['conv_rate']}  median={c['median_latency_s']}s  "
        f"p90={c['p90_latency_s']}s"
    )

    print("== behavioral diversity (5 most/least diverse users) ==")
    ent = drift.categorical_entropy(ev, "user_id", "event_type")
    for r in ent.orderBy(F.desc("norm_entropy"), "user_id").limit(2).collect():
        print(f"  user {r['user_id']}: norm_entropy={r['norm_entropy']}")

    print("== A/B assignment + SRM ==")
    arms = {"control": 0.5, "treatment": 0.5}
    assigned = sampling.experiment_assignment(
        ev.select("user_id").distinct(), "user_id", salt="demo_exp", arms=arms
    )
    for r in sampling.srm_check(assigned, "arm", arms).collect():
        print(f"  {r['arm']}: n={r['n']} observed={r['observed_frac']} chi2={r['chi2_contrib']}")

    print("== daily anomaly watch ==")
    anomalies = drift.daily_anomaly_profile(ev, "timestamp", "amount").filter(
        "is_anomaly"
    )
    print(f"  anomalous days: {anomalies.count()}")

    print("== governance: k-anonymity of (type, day) ==")
    q = ev.select(
        "event_type", F.date_trunc("day", F.col("timestamp")).alias("d")
    )
    k = k_anonymity_profile(q, ["event_type", "d"], k=5).collect()[0]
    print(f"  rows at risk: {k['n_rows_at_risk']} ({k['rows_at_risk_frac']})")

    print("== Benford audit of amounts ==")
    chi2 = benford_profile(ev.filter("amount > 0"), "amount").agg(
        F.round(F.sum("chi2_contrib"), 2).alias("chi2")
    ).collect()[0]["chi2"]
    print(f"  chi-square vs Benford: {chi2} (synthetic uniform amounts SHOULD flunk)")

    print("== nonparametric A/B: Mann-Whitney U (view vs purchase amounts) ==")
    mw = drift.mann_whitney_u(ev, "event_type", "amount", "view", "purchase").collect()[0]
    print(f"  n=({mw['n_a']}, {mw['n_b']})  z={mw['z']}")

    print("== seasonality screen: daily ACF lags 1..7 ==")
    acf_rows = drift.daily_acf(ev, "timestamp", "amount", max_lag=7).orderBy("lag").collect()
    for r in acf_rows:
        print(f"  lag {r['lag']}: acf={r['acf']}")
    if not acf_rows:
        print("  (series shorter than 2 days — no lag pairs)")

    print("== trend/weekday/residual split (first decomposed day) ==")
    dec = (
        drift.seasonal_decompose_daily(ev, "timestamp", "amount")
        .filter("trend IS NOT NULL").orderBy("day").limit(1).collect()
    )
    if dec:
        d = dec[0]
        print(
            f"  {d['day']}: value={d['value']} trend={d['trend']} "
            f"seasonal={d['seasonal']} residual={d['residual']}"
        )
    else:
        print("  (no day has a complete 7-day neighborhood — series too short)")

    print("== churn: Kaplan-Meier user-lifetime survival (first 3 rows) ==")
    for r in windows.survival_curve(ev, "user_id", "timestamp", censor_days=7).orderBy(
        "t_days"
    ).limit(3).collect():
        print(
            f"  t={r['t_days']}d: risk={r['n_risk']} events={r['n_events']} "
            f"S(t)={r['survival']}"
        )

    # the time-series wave needs a multi-week span: exponential arrival
    # gaps with a 96 h mean spread the same distribution over ~a month
    # (decaying daily volume — a real trend for the smoother to chase)
    ts_ev = generate_events(
        spark, n_events=50_000, n_users=500, seed=11, gap_mean_hours=96.0
    )

    print("== where is the level heading: Holt forecast (last in-sample + 3 of 7 ahead) ==")
    hf = drift.holt_forecast_daily(ts_ev, "timestamp", "amount").orderBy("day").collect()
    for r in [x for x in hf if not x["is_forecast"]][-1:] + [x for x in hf if x["is_forecast"]][:3]:
        tag = "forecast" if r["is_forecast"] else "fitted"
        print(f"  {r['day']}: value={r['value']} level={r['level']} {tag}={r['fitted']}")

    print("== does the smoother earn its keep: MAE/MASE vs the 7-day naive ==")
    bt = drift.forecast_backtest_daily(ts_ev, "timestamp", "amount").collect()
    if bt:
        b = bt[0]
        print(
            f"  n={b['n_days']}  mae_holt={b['mae_holt']}  mae_naive={b['mae_naive']}  "
            f"mase={b['mase']}  ({'ship the naive lag' if b['mase'] and b['mase'] >= 1 else 'Holt wins'})"
        )

    print("== single best changepoint by variance reduction ==")
    for r in drift.best_split_daily(ts_ev, "timestamp", "amount").collect():
        print(
            f"  split after {r['split_day']}: mean {r['mean_left']} -> {r['mean_right']} "
            f"(gain={r['gain']} of sse_total={r['sse_total']})"
        )

    print("== privacy: t-closeness of each day's event mix vs the corpus ==")
    from ml_feature_store_pipeline_spark.quality import t_closeness_profile

    tdf = ts_ev.select(F.to_date("timestamp").alias("day"), "event_type")
    worst = (
        t_closeness_profile(tdf, ["day"], "event_type", t=0.2)
        .orderBy(F.desc("tvd")).limit(2).collect()
    )
    for r in worst:
        print(f"  {r['day']}: tvd={r['tvd']} meets_t={r['meets_t']} (n={r['n_rows']})")


if __name__ == "__main__":
    main()
