"""Event-time windowing inventory over the ``events`` table.

The reference has no stream processing (its "streaming" is chunked
transport — SURVEY §2.9), so these are the Structured-Streaming
extension mandated by the north star, exercised here in batch mode:
``F.window`` / ``F.session_window`` produce identical results on a
bounded DataFrame and on a stream, so the same logic is reused by
``robosystems_spark.streaming`` with ``readStream`` + watermarks.

Oracles express the window algebra in plain SQL (date_trunc grids,
gaps-and-islands sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.inventory import register
from robosystems_spark.io import read_table
from robosystems_spark.operators import timeseries as TS


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h event-time window aggregation (Structured Streaming extension, batch-equivalent).",
    tags=("window", "events"),
    bench=True,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


@register(
    "events_sliding_1h_30m",
    oracle="""
    WITH grid AS (
      SELECT ts, value,
             CAST(TO_TIMESTAMP((CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 1800) * 1800) AS TIMESTAMP) AS s1
      FROM events
    ), assigned AS (
      SELECT s1 AS window_start, value FROM grid
      UNION ALL
      SELECT s1 - INTERVAL 30 MINUTE AS window_start, value FROM grid
    )
    SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM assigned
    GROUP BY window_start
    """,
    doc="Sliding window (1h length, 30m slide): each event lands in 2 overlapping windows.",
    tags=("window", "events"),
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "events_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM islands
    GROUP BY user_id, session_no
    """,
    doc="Session windows (30m gap) per user: F.session_window in Spark, gaps-and-islands oracle.",
    tags=("window", "events", "session"),
    bench=True,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )


@register(
    "events_type_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="Value-bucket histogram per event type (numeric binning).",
    tags=("events", "agg"),
)
def events_type_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        "event_type", F.floor(F.col("value") / 10.0).cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "events_asof_join_purchase_view",
    oracle="""
    SELECT p.event_id,
           p.ts,
           p.user_id,
           ROUND(p.value, 2) AS purchase_value,
           v.ts AS ts_right,
           ROUND(v.value, 2) AS view_value_right
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="Backward as-of join: each purchase aligned to the user's most recent prior view "
    "(union+window technique, one shuffle; DuckDB ASOF JOIN oracle). Training-pipeline extension.",
    tags=("asof", "events"),
    bench=True,
)
def events_asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", F.round("value", 2).alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.round("value", 2).alias("view_value")
    )
    # column order pinned to the oracle's projection: the operator
    # emits (..., view_value_right, ts_right) but the oracle SELECTs
    # ts_right before view_value_right — the only registry entry whose
    # output column ORDER diverged from its oracle (caught by an
    # r12 positional full-registry sweep; values were identical)
    return asof_join(
        purchases, views, on="user_id", right_cols=["view_value"]
    ).select(
        "event_id",
        "ts",
        "user_id",
        "purchase_value",
        "ts_right",
        "view_value_right",
    )


@register(
    "events_interval_join_view_purchase",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           CAST(v.ts AS TIMESTAMP) AS view_ts,
           p.event_id AS purchase_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           ROUND(p.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) < CAST(v.ts AS TIMESTAMP) + INTERVAL 6 HOUR
    """,
    doc=(
        "Event-time interval join: every (view, purchase) pair by the "
        "same user within 6 hours — the batch twin of the stream-stream "
        "join (streaming/joins.py), whose watermark-bounded state "
        "depends on exactly this time-bound condition; both timestamps "
        "truncate to microseconds so the boundary is engine-identical. "
        "One shuffle on user_id co-partitions both sides."
    ),
    tags=("events", "interval-join", "streaming-twin"),
)
def events_interval_join_view_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from robosystems_spark.streaming.joins import view_purchase_interval_join

    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return view_purchase_interval_join(views, purchases, within="6 hours").select(
        "user_id",
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


@register(
    "date_function_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)      AS yr,
           CAST(QUARTER(o_orderdate) AS INT)   AS qtr,
           CAST(MONTH(o_orderdate) AS INT)     AS mon,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow, -- DuckDB 0-based, Spark 1-based
           CAST(o_orderdate AS DATE)           AS order_date,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders
    WHERE o_orderkey <= 100
    """,
    doc="Date/time scalar battery: year/quarter/month/dow extraction, datediff, interval arithmetic (SURVEY §2.8 F3).",
    tags=("scalar", "date"),
)
def date_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        F.dayofweek(d).alias("dow"),
        d.cast("date").alias("order_date"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("bigint").alias(
            "days_since_epoch_start"
        ),
        F.date_add(d.cast("date"), 30).alias("due_date"),
    )


@register(
    "events_user_profile",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value,
           MAX(ts) AS last_seen
    FROM events
    GROUP BY user_id
    """,
    doc="Per-user running profile — same function backs the applyInPandasWithState "
    "stateful streaming operator (streaming/stateful.py); batch twin oracled here.",
    tags=("events", "stateful"),
)
def events_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.streaming.stateful import running_user_profile

    return running_user_profile(_events(spark, sf_dir))


@register(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts > v.t0 AND e.ts <= v.t0 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t1 AND e.ts <= c.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    steps AS (
      SELECT 'view' AS step, 1 AS step_order, COUNT(*) AS n_users FROM v
      UNION ALL
      SELECT 'click', 2, COUNT(*) FROM c
      UNION ALL
      SELECT 'purchase', 3, COUNT(*) FROM p
    )
    SELECT step, step_order, n_users,
           ROUND(CAST(n_users AS DOUBLE)
                 / (SELECT n_users FROM steps WHERE step_order = 1), 4)
             AS conversion
    FROM steps
    """,
    doc="Ordered funnel conversion (view -> click -> purchase, 24h step gap): "
    "each stage is the min event time after the previous stage per user — "
    "three keyed aggregations + user-keyed joins, entry count broadcast "
    "for the conversion ratio.",
    tags=("window", "events", "funnel"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    gap = F.expr("INTERVAL 24 HOURS")

    def stage(prev: DataFrame, prev_ts: str, etype: str, out_ts: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(
                (F.col("ts") > F.col(prev_ts))
                & (F.col("ts") <= F.col(prev_ts) + gap)
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = stage(v, "t0", "click", "t1")
    p = stage(c, "t1", "purchase", "t2")
    steps = (
        v.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view").alias("step"), F.lit(1).alias("step_order"), "n_users"
        )
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("click").alias("step"),
                F.lit(2).alias("step_order"),
                "n_users",
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("purchase").alias("step"),
                F.lit(3).alias("step_order"),
                "n_users",
            )
        )
    )
    entry = (
        v.agg(F.count(F.lit(1)).alias("_n0"))
    )
    return steps.crossJoin(F.broadcast(entry)).select(
        "step",
        "step_order",
        "n_users",
        F.round(F.col("n_users").cast("double") / F.col("_n0"), 4).alias(
            "conversion"
        ),
    )


# ---------------------------------------------------------------------------
# Hypertable-style continuous aggregates: gap-fill + anomaly scoring.
# ---------------------------------------------------------------------------
@register(
    "events_gap_fill_interpolate",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["gap_fill_oracle_sql"],
    ).gap_fill_oracle_sql(),
    doc="Hourly gap-filled continuous aggregate per event_type with LOCF "
    "and linear interpolation (TimescaleDB time_bucket_gapfill/locf/"
    "interpolate analog): one aggregation over raw events, sequence() "
    "spine per series, IGNORE-NULLS windows over the bucket grid — all "
    "post-aggregation stages shuffle only the O(buckets) grid.",
    tags=("window", "events", "timeseries"),
    bench=True,
)
def events_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import gap_fill_interpolate

    return gap_fill_interpolate(_events(spark, sf_dir))


@register(
    "events_rolling_zscore",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["rolling_zscore_oracle_sql"],
    ).rolling_zscore_oracle_sql(),
    doc="Rolling anomaly detection: per (event_type, hourly bucket) "
    "z-score of the bucket average against the trailing 24-bucket "
    "mean/stddev, |z|>2 flagged — the standard streaming-friendly "
    "outlier shape; single ROWS window over the bucket grid.",
    tags=("window", "events", "timeseries"),
    bench=True,
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import rolling_zscore

    return rolling_zscore(_events(spark, sf_dir))


@register(
    "events_daily_twap",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["time_weighted_average_oracle_sql"],
    ).time_weighted_average_oracle_sql(),
    doc="Daily time-weighted average per series (LOCF step weighting, "
    "day-boundary carry): each observation weighs by its holding time "
    "until the next event — the financial TWAP/time_weight shape; one "
    "lead window + one groupBy, plain_avg alongside to expose burst-"
    "sampling bias.",
    tags=("window", "events", "timeseries"),
    bench=True,
)
def events_daily_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import time_weighted_average

    return time_weighted_average(_events(spark, sf_dir))


@register(
    "events_ewma_smoothing",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["ewma_daily_oracle_sql"],
    ).ewma_daily_oracle_sql(),
    doc="Per-user daily EWMA (pandas adjust=False recursion, "
    "alpha=0.3): a linear recurrence folded declaratively — running-"
    "frame collect_list + F.aggregate seeded from the first element; "
    "DuckDB mirrors with list window + list_reduce. Pure IEEE "
    "multiply/add over identical inputs = bit-identical cross-engine; "
    "per-key state is O(days), cap the frame to truncate the "
    "recursion with (1-a)^N tail error at unbounded scale.",
    tags=("window", "events", "timeseries"),
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import ewma_daily

    return ewma_daily(_events(spark, sf_dir))


@register(
    "events_holt_linear_forecast",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["holt_linear_oracle_sql"],
    ).holt_linear_oracle_sql(),
    doc="Holt's linear-trend (double exponential) smoothing per user "
    "(alpha=0.5, beta=0.3, b_1=0): final level/trend + one-step "
    "forecast. The 2-component recursion folds as a 2-element DOUBLE "
    "ARRAY in F.aggregate / DuckDB list_reduce — an array and NOT a "
    "struct because list_reduce mutates struct accumulators field-by-"
    "field in place (second field sees the first already updated); "
    "arrays read-all-then-write, so both engines run the textbook "
    "recursion bit-identically. Same O(days)-per-key shape as EWMA.",
    tags=("window", "events", "timeseries"),
)
def events_holt_linear_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from robosystems_spark.operators.timeseries import holt_linear

    return holt_linear(_events(spark, sf_dir))


@register(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per series (Spark percentile() "
    "vs DuckDB quantile_cont — both type-7 linear interpolation, "
    "verified value-identical): the latency/value SLO summary shape; "
    "single groupBy, percentile state is per-group sorted buffers (use "
    "approx_percentile at unbounded-group scale).",
    tags=("window", "events"),
    bench=True,
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_cusum_drift",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["cusum_drift_oracle_sql"],
    ).cusum_drift_oracle_sql(),
    doc="One-sided CUSUM drift detection per series: flags sustained "
    "level shifts the per-bucket z-score misses; the clamped "
    "recursion computed via its closed form (prefix-sum minus "
    "running min) — two windows, no recursion, no Python.",
    tags=("window", "events", "timeseries"),
    bench=True,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import cusum_drift

    return cusum_drift(_events(spark, sf_dir))


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS MATERIALIZED (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, SUM(n) AS t FROM c GROUP BY event_type)
    SELECT c.event_type, c.next_type, c.n AS n_transitions,
           ROUND(c.n / tot.t, 6) AS p_next
    FROM c JOIN tot USING (event_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next event type | current), lead window + grouped "
    "counts + row-normalize — the behavioral-model summary behind "
    "session simulation and anomaly priors; ties in event time broken "
    "by event_id for engine-identical sequencing.",
    tags=("window", "events"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    c = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = c.groupBy("event_type").agg(
        F.sum("n_transitions").alias("_t")
    )
    return (
        c.join(tot, "event_type")
        .select(
            "event_type",
            "next_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("_t"), 6).alias("p_next"),
        )
    )


@register(
    "events_decayed_engagement",
    oracle="""
    WITH ref AS (SELECT MAX(ts) AS t_ref FROM events),
    d AS (
      SELECT user_id, event_type,
             EXP(-(EPOCH(ref.t_ref) - EPOCH(ts)) * 0.0000011460387850
                 ) AS wgt,
             value
      FROM events, ref
    )
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(wgt), 6) AS decayed_count,
           ROUND(SUM(wgt * value), 6) AS decayed_value
    FROM d GROUP BY user_id, event_type
    """,
    doc="Exponentially time-decayed engagement (half-life 7 days, "
    "reference = max event time): the recency-weighted feature shape "
    "recommender/effort models consume — one scan + one aggregation, "
    "decay weights computed map-side; identical lambda literal both "
    "engines, round-6 absorbing libm exp drift.",
    tags=("window", "events"),
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # lambda = ln(2) / (7 days in seconds), as the same literal the
    # oracle embeds (precomputed so both engines use one constant).
    lam = 0.0000011460387850
    t_ref = ev.agg(F.max("ts").alias("t")).collect()[0]["t"]
    wgt = F.exp(
        -(
            F.unix_micros(F.lit(t_ref).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).cast("double")
        / 1e6
        * lam
    )
    return (
        ev.select("user_id", "event_type", wgt.alias("_w"), "value")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("_w"), 6).alias("decayed_count"),
            F.round(F.sum(F.col("_w") * F.col("value")), 6).alias(
                "decayed_value"
            ),
        )
    )


@register(
    "events_mad_outliers",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["mad_outliers_oracle_sql"],
    ).mad_outliers_oracle_sql(),
    doc="Robust per-series anomaly counting via Median Absolute "
    "Deviation (med/MAD are insensitive to the outliers being hunted, "
    "unlike the mean/stddev z-score): exact sort-based percentile "
    "aggregations, per-series scalars broadcast back, |x-med| > 3*MAD "
    "flags summed — one row per series out; hash-exact vs DuckDB "
    "MEDIAN (both interpolate even counts identically).",
    tags=("timeseries", "events", "anomaly"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import mad_outliers

    return mad_outliers(_events(spark, sf_dir))


@register(
    "events_retention_cohorts",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_day, COUNT(*) AS n_cohort
      FROM first_seen GROUP BY cohort_day
    )
    SELECT f.cohort_day,
           DATEDIFF('day', f.cohort_day, a.d) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_active,
           ANY_VALUE(s.n_cohort) AS n_cohort,
           ROUND(CAST(COUNT(DISTINCT a.user_id) AS DOUBLE)
                 / ANY_VALUE(s.n_cohort), 6) AS retention
    FROM act a
    JOIN first_seen f ON f.user_id = a.user_id
    JOIN sizes s ON s.cohort_day = f.cohort_day
    GROUP BY f.cohort_day, DATEDIFF('day', f.cohort_day, a.d)
    ORDER BY f.cohort_day, day_offset
    """,
    doc="Retention cohort matrix: users grouped by first-active day, "
    "per-(cohort, day-offset) distinct active users and retention "
    "rate — the canonical product-analytics rollup.  Scale shape: "
    "activity dedups to (user, day) FIRST (the only fact-sized "
    "shuffle), first-seen is a per-user MIN, cohort sizes are a tiny "
    "frame joined back; output is O(days^2) regardless of event "
    "volume.",
    tags=("window", "events", "analytics"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    act = (
        _events(spark, sf_dir)
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        act.join(first, "user_id")
        .join(F.broadcast(sizes), "cohort_day")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.first("n_cohort").alias("n_cohort"),
            F.round(
                F.countDistinct("user_id").cast("double")
                / F.first("n_cohort"),
                6,
            ).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_touch_attribution",
    oracle=TS.touch_attribution_oracle_sql(),
    doc="First-touch / last-touch conversion attribution: each purchase is "
    "credited to the first (resp. most recent) strictly-preceding click/view "
    "of the same user via two IGNORE-NULLS window carries over one scan "
    "(frame = unbounded preceding .. 1 preceding, tiebreak (ts, event_id) "
    "both engines); conversions without a prior touch land in the 'none' "
    "bucket. One user-keyed shuffle; carried state is two values per row.",
    tags=("window", "events"),
)
def events_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.touch_attribution(_events(spark, sf_dir))


@register(
    "events_rolling_wau",
    oracle="""
    WITH active AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM active),
    expanded AS (
      SELECT a.d + CAST(o.off AS INTEGER) AS obs_day, a.user_id
      FROM active a, range(7) o(off)
    )
    SELECT e.obs_day AS day,
           COUNT(DISTINCT e.user_id) AS wau
    FROM expanded e
    JOIN days dy ON dy.d = e.obs_day
    GROUP BY e.obs_day
    """,
    doc="Rolling 7-day active users (WAU) per observed day: COUNT(DISTINCT) "
    "over a trailing window isn't a window function in either engine, so "
    "each (day, user) activity row is expanded to the 7 observation days it "
    "contributes to (a bounded explode — x7, not xN), then one distinct "
    "count per day restricted to observed days. Scale shape: the expansion "
    "runs over the DEDUPED (day, user) grid, orders of magnitude smaller "
    "than raw events; one shuffle keyed by day.",
    tags=("window", "events"),
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    active = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = active.select("d").distinct()
    expanded = active.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("obs_day"),
        "user_id",
    )
    return (
        expanded.join(
            F.broadcast(days.withColumnRenamed("d", "obs_day")), "obs_day"
        )
        .groupBy(F.col("obs_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "events_retention_cohorts_weekly",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["retention_cohorts_oracle_sql"],
    ).retention_cohorts_oracle_sql(max_offset_weeks=8),
    doc=(
        "WEEKLY cohort retention triangle (the day-level sibling is "
        "events_retention_cohorts): users cohorted by first-activity "
        "week (Monday-truncated), per (cohort_week, offset_weeks) the "
        "active-member count and retention rate, offsets capped at 8. "
        "One (user, week) distinct + per-user min + user-keyed join + "
        "grid aggregation — no windows, no driver state; exact integer "
        "counts with a single rounded division."
    ),
    tags=("analytics", "timeseries"),
    bench=True,
)
def events_retention_cohorts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import retention_cohorts

    return retention_cohorts(_events(spark, sf_dir), max_offset_weeks=8)


@register(
    "events_value_quantile_sketch",
    oracle=__import__(
        "robosystems_spark.operators.sketches",
        fromlist=["log2_histogram_oracle_sql"],
    ).log2_histogram_oracle_sql("events", "value"),
    doc=(
        "Mergeable quantile SKETCH (the DDSketch idea with an "
        "integer-exact bucket function): values scale to ints and "
        "bucket by (bit length, top-3 mantissa bits) — a log2 "
        "histogram guaranteeing <=~9% relative error at any quantile. "
        "One hash aggregation into a bounded register frame that "
        "merges by addition across partitions/shards/days; extraction "
        "is a window over the tiny bucket frame. The bucketing is "
        "pure integer arithmetic (no libm), so the whole approximate "
        "structure hash-matches the DuckDB twin — unlike "
        "percentile_disc, no per-group sort of the data ever happens."
    ),
    tags=("sketch", "timeseries"),
    bench=True,
)
def events_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.sketches import log2_histogram_quantiles

    return log2_histogram_quantiles(_events(spark, sf_dir), "value")


@register(
    "events_holt_winters_seasonal",
    oracle=__import__(
        "robosystems_spark.operators.timeseries",
        fromlist=["holt_winters_oracle_sql"],
    ).holt_winters_oracle_sql(),
    doc="Holt-Winters additive seasonal smoothing (triple exponential, "
    "period 7) per event-type daily series — completes the ewma -> "
    "Holt -> Holt-Winters classical family. State is a rotating "
    "[level, trend, season-queue] DOUBLE ARRAY folded per key "
    "(F.aggregate / list_reduce with every observation packed as a "
    "1-element list, since list_reduce has no separate init); "
    "textbook seeding (mean of first m, zero trend, x_i - mean "
    "seasons). Emits level/trend/next-season/one-step forecast.",
    tags=("window", "events", "timeseries"),
)
def events_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import holt_winters_additive

    return holt_winters_additive(_events(spark, sf_dir))


@register(
    "events_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 4) AS x
      FROM events GROUP BY 1, 2),
    d AS (
      SELECT event_type,
             DATEDIFF('day', DATE '2000-01-01', day) AS di, x
      FROM daily),
    n AS (SELECT event_type, COUNT(*) AS n_days FROM d
          GROUP BY 1 HAVING COUNT(*) >= 2),
    pairs AS (
      SELECT a.event_type,
             (b.x - a.x) / CAST(b.di - a.di AS DOUBLE) AS s
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND b.di > a.di),
    ms AS (SELECT event_type, QUANTILE_CONT(s, 0.5) AS slope
           FROM pairs GROUP BY 1),
    r AS (
      SELECT d.event_type, ms.slope,
             d.x - ms.slope * CAST(d.di AS DOUBLE) AS resid
      FROM d JOIN ms USING (event_type))
    SELECT r.event_type,
           CAST(n.n_days AS INTEGER) AS n_days,
           ROUND(MAX(r.slope), 6) AS slope_per_day,
           ROUND(QUANTILE_CONT(r.resid, 0.5), 6) AS intercept
    FROM r JOIN n USING (event_type)
    GROUP BY 1, n.n_days
    ORDER BY 1
    """,
    doc="Theil-Sen robust trend per event-type daily series (Sen "
    "1968): slope = median of all pairwise slopes, intercept = "
    "median residual — tolerates ~29% outliers where least squares "
    "breaks on one; the trend companion of the MAD profile. Pairs "
    "are O(days^2) on the DAILY series (calendar-bounded, generated "
    "map-side from packed arrays); exact percentiles match "
    "quantile_cont bit-for-bit.",
    tags=("window", "events", "timeseries"),
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.timeseries import theil_sen_trend

    return theil_sen_trend(_events(spark, sf_dir))
