"""Gap-fill/interpolate + rolling z-score: hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

from robosystems_spark.operators.timeseries import (
    gap_fill_interpolate,
    rolling_zscore,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )


def test_gap_fill_linear_interpolation(spark):
    # Observations at hours 0 and 3 (values 10 and 40); hours 1-2 are
    # gaps -> interp 20, 30; locf stays 10.
    rows = [
        (1, datetime(2024, 1, 1, 0, 15), "a", 10.0),
        (2, datetime(2024, 1, 1, 3, 45), "a", 40.0),
    ]
    out = {
        r["bucket_ts"].hour: r
        for r in gap_fill_interpolate(_ev(spark, rows)).collect()
    }
    assert len(out) == 4
    assert out[0]["observed_avg"] == 10.0 and not out[0]["gap_filled"]
    assert out[1]["gap_filled"] and out[1]["n_events"] == 0
    assert out[1]["interp_value"] == 20.0 and out[1]["locf_value"] == 10.0
    assert out[2]["interp_value"] == 30.0 and out[2]["locf_value"] == 10.0
    assert out[3]["observed_avg"] == 40.0


def test_gap_fill_multi_bucket_average(spark):
    # Two events in the same bucket -> observed_avg is their mean.
    rows = [
        (1, datetime(2024, 1, 1, 5, 0), "b", 1.0),
        (2, datetime(2024, 1, 1, 5, 30), "b", 3.0),
    ]
    (row,) = gap_fill_interpolate(_ev(spark, rows)).collect()
    assert row["observed_avg"] == 2.0 and row["n_events"] == 2


def test_gap_fill_series_isolated(spark):
    # Gaps are per-series: series 'a' spans 2 hours, 'b' only 1.
    rows = [
        (1, datetime(2024, 1, 1, 0, 0), "a", 1.0),
        (2, datetime(2024, 1, 1, 2, 0), "a", 5.0),
        (3, datetime(2024, 1, 1, 9, 0), "b", 7.0),
    ]
    out = gap_fill_interpolate(_ev(spark, rows)).collect()
    by_series = {}
    for r in out:
        by_series.setdefault(r["event_type"], []).append(r)
    assert len(by_series["a"]) == 3 and len(by_series["b"]) == 1
    mid = [r for r in by_series["a"] if r["gap_filled"]][0]
    assert mid["interp_value"] == 3.0


def test_rolling_zscore_flags_spike(spark):
    # 10 calm hourly buckets at ~5.0 then a spike at 50 -> |z| > 2.
    rows = [
        (i, datetime(2024, 1, 1, i, 0), "a", 5.0 + (i % 3) * 0.1)
        for i in range(10)
    ] + [(99, datetime(2024, 1, 1, 10, 0), "a", 50.0)]
    out = {r["bucket_ts"].hour: r for r in rolling_zscore(_ev(spark, rows)).collect()}
    assert out[10]["is_anomaly"]
    # Once the trailing window has seen a full period of the baseline
    # wiggle, calm buckets stay unflagged (early buckets with a 2-row
    # trailing window can legitimately flag — cold-start behavior).
    assert not any(out[h]["is_anomaly"] for h in range(3, 10))
    # First two buckets lack >=2 trailing observations -> z NULL.
    assert out[0]["zscore"] is None and out[1]["zscore"] is None


def test_rolling_zscore_zero_variance_guard(spark):
    # Constant series -> variance 0 -> z NULL everywhere, no anomaly.
    rows = [
        (i, datetime(2024, 1, 1, i, 0), "c", 2.5) for i in range(6)
    ]
    out = rolling_zscore(_ev(spark, rows)).collect()
    assert all(r["zscore"] is None and not r["is_anomaly"] for r in out)


def test_twap_weights_by_holding_time(spark):
    from datetime import datetime

    from robosystems_spark.operators.timeseries import time_weighted_average

    # Value 100 held for 1 hour, then value 0 held for the remaining
    # 22h55m of the day: TWAP is dominated by the long zero period,
    # while the plain average is 50.
    rows = [
        (1, datetime(2024, 1, 1, 0, 5), "a", 100.0),
        (2, datetime(2024, 1, 1, 1, 5), "a", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )
    (row,) = time_weighted_average(ev).collect()
    assert row["plain_avg"] == 50.0
    # weight(100) = 3600s; weight(0) = 82500s -> twap = 100*3600/86100
    assert abs(row["twap"] - 100.0 * 3600 / 86100) < 1e-6
    assert row["n_events"] == 2


def test_cusum_flags_sustained_shift_not_point_spike(spark):
    from robosystems_spark.operators.timeseries import cusum_drift

    # 24 calm hours alternating 10/12, then 20 hours at a persistently
    # higher level (16) -> CUSUM accumulates and flags the drift.
    rows = [
        (i, datetime(2024, 1, 1 + i // 24, i % 24, 0), "a",
         10.0 + 2.0 * (i % 2))
        for i in range(24)
    ] + [
        (100 + i, datetime(2024, 1, 2, i, 0), "a", 16.0)
        for i in range(20)
    ]
    out = sorted(
        cusum_drift(_ev(spark, rows), threshold_h=5.0).collect(),
        key=lambda r: r["bucket_ts"],
    )
    assert not any(r["drift_flag"] for r in out[:24])
    assert any(r["drift_flag"] for r in out[24:])
    # CUSUM is a running statistic: once drifted, it stays elevated.
    flagged = [r["drift_flag"] for r in out]
    assert flagged[-1]
    # The recursion invariant: cusum >= 0 everywhere.
    assert all(r["cusum"] >= 0 for r in out)


def test_cusum_closed_form_equals_recursion(spark):
    from robosystems_spark.operators.timeseries import cusum_drift

    rows = [
        (i, datetime(2024, 1, 1, i, 0), "a", float(v))
        for i, v in enumerate([5, 9, 2, 8, 8, 1, 9, 9, 9, 3])
    ]
    out = sorted(
        cusum_drift(_ev(spark, rows), slack_k=0.5).collect(),
        key=lambda r: r["bucket_ts"],
    )
    vals = [5, 9, 2, 8, 8, 1, 9, 9, 9, 3]
    m = sum(vals) / len(vals)
    var = sum(v * v for v in vals) / len(vals) - m * m
    s, want = 0.0, []
    for v in vals:
        z = (v - m) / var**0.5
        s = max(0.0, s + z - 0.5)
        want.append(round(s, 6))
    assert [r["cusum"] for r in out] == want


def test_ewma_matches_pandas_adjust_false(spark):
    """The fold must equal pandas' ewm(adjust=False) recursion."""
    import pandas as pd
    from pyspark.sql import functions as F

    from robosystems_spark.operators.timeseries import ewma_daily

    rows = [
        (1, f"2024-01-0{d} 00:00:00", float(v))
        for d, v in zip(range(1, 8), [10, 20, 5, 40, 40, 1, 13])
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        str(r["day"]): r["ewma"]
        for r in ewma_daily(df, alpha=0.3).collect()
    }
    want = (
        pd.Series([10.0, 20, 5, 40, 40, 1, 13])
        .ewm(alpha=0.3, adjust=False)
        .mean()
        .round(6)
        .tolist()
    )
    assert list(got.values()) == want


def test_holt_linear_matches_reference_recursion(spark):
    """The array fold must equal the textbook Holt recursion
    (l_1 = x_1, b_1 = 0) computed in plain Python, and the one-step
    forecast must be level + trend of the final day."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators.timeseries import holt_linear

    vals = [10.0, 20, 5, 40, 40, 1, 13]
    rows = [
        (1, f"2024-01-0{d} 00:00:00", float(v))
        for d, v in zip(range(1, 8), vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts"))
    a, b = 0.5, 0.3
    lvl, tr = vals[0], 0.0
    for x in vals[1:]:
        new_l = a * x + (1 - a) * (lvl + tr)
        tr = b * (new_l - lvl) + (1 - b) * tr
        lvl = new_l
    out = holt_linear(df, alpha=a, beta=b).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 7
    assert r["level"] == round(lvl, 6)
    assert r["trend"] == round(tr, 6)
    assert r["forecast_1"] == round(lvl + tr, 6)

    # a perfectly linear series converges toward trend = slope
    lin = [
        (2, f"2024-01-{d:02d} 00:00:00", 100.0 + 5 * d)
        for d in range(1, 21)
    ]
    df2 = spark.createDataFrame(
        lin, "user_id LONG, ts STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts"))
    r2 = holt_linear(df2, alpha=0.5, beta=0.3).collect()[0]
    assert abs(r2["trend"] - 5.0) < 0.5
    assert abs(r2["forecast_1"] - (100.0 + 5 * 21)) < 2.0


def test_holt_winters_matches_textbook_recursion(spark):
    """The fold reproduces the scalar Holt-Winters recursion exactly,
    including seasonal-queue rotation; under-seeded keys are
    dropped."""
    from robosystems_spark.operators.timeseries import holt_winters_additive
    import datetime

    m, a, b, g = 3, 0.5, 0.3, 0.4
    vals = [10.0, 14.0, 9.0, 12.0, 16.0, 10.5, 13.0, 17.5]
    base = datetime.datetime(2024, 1, 1)
    rows = [("k", base + datetime.timedelta(days=i), v)
            for i, v in enumerate(vals)]
    rows += [("short", base, 1.0), ("short", base + datetime.timedelta(days=1), 2.0)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = holt_winters_additive(
        df, period=m, alpha=a, beta=b, gamma=g
    ).collect()
    assert [r["event_type"] for r in out] == ["k"]

    l = sum(vals[:m]) / m
    tr = 0.0
    season = [v - l for v in vals[:m]]
    for x in vals[m:]:
        s_head = season.pop(0)
        new_l = a * (x - s_head) + (1 - a) * (l + tr)
        tr = b * (new_l - l) + (1 - b) * tr
        season.append(g * (x - new_l) + (1 - g) * s_head)
        l = new_l
    r = out[0]
    assert r["level"] == round(l, 6)
    assert r["trend"] == round(tr, 6)
    assert r["season_next"] == round(season[0], 6)
    assert r["forecast_1"] == round(l + tr + season[0], 6)


def test_theil_sen_recovers_planted_trend_through_outliers(spark):
    """A clean linear series recovers its exact slope; 25% wild
    outliers barely move the Theil-Sen estimate (least squares would
    be dragged far off)."""
    import datetime

    from robosystems_spark.operators.timeseries import theil_sen_trend

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        rows.append(("clean", base + datetime.timedelta(days=i),
                     5.0 + 2.0 * i))
        v = 5.0 + 2.0 * i + (1000.0 if i % 4 == 0 else 0.0)
        rows.append(("dirty", base + datetime.timedelta(days=i), v))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r["event_type"]: r for r in theil_sen_trend(df).collect()}
    assert out["clean"]["slope_per_day"] == 2.0
    assert abs(out["dirty"]["slope_per_day"] - 2.0) < 0.75
