"""Hypertable-style time-series operators over event tables.

Gap-filling with LOCF + linear interpolation, and rolling-window
anomaly scoring — the continuous-aggregate operations a timeseries
store (TimescaleDB `time_bucket_gapfill`/`locf`/`interpolate`) exposes,
re-expressed as Spark window/sequence work.

Spark-first shape: the raw event scan aggregates once per
(series, bucket); the spine is `sequence()` per series (O(buckets) rows,
never touching raw events again); fill/interpolation are
IGNORE-NULLS window functions over the bucket grid partitioned by
series key.  At 100 TB the bucket grid is corpus-size / bucket-width —
orders of magnitude smaller than the events — and every stage after
the first aggregation shuffles only the grid, keyed by series.

PORTABILITY CONTRACT: bucket timestamps are hour-truncated (exact
integer epoch seconds in both engines); interpolation arithmetic has
the same expression shape both sides and outputs ROUND to 6, which
absorbs the ~1e-15 aggregation-order drift of the bucket averages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.checkpointing import materialize


def hourly_buckets(
    events: DataFrame, series_col: str, ts_col: str, **aggs
) -> DataFrame:
    """(series, hour bucket) aggregation over raw events — the ONE
    fact-sized pass both gap-fill and CUSUM start from, factored out
    un-checkpointed so plan gates can verify its scan pushdown (the
    callers checkpoint the result before fanning it out, which hides
    the parquet scan behind an RDD scan in the final plan)."""
    return events.groupBy(
        F.col(series_col).alias("series"),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
    ).agg(*aggs.values())


def gap_fill_interpolate(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    decimals: int = 6,
) -> DataFrame:
    """Hourly bucket aggregation per series with gap-filled buckets:
    (series, bucket_ts, n_events, observed_avg, locf_value,
    interp_value, gap_filled).

    Missing buckets inside each series' observed [min, max] range get
    n_events=0, LOCF (last observation carried forward) and linear
    interpolation between the surrounding observed bucket averages.
    """
    # bucket-count-sized; consumed by the span aggregate AND the spine
    # join — materialize once instead of re-scanning events per consumer
    agg = hourly_buckets(
        events,
        series_col,
        ts_col,
        n_events=F.count(F.lit(1)).alias("n_events"),
        observed_avg=F.avg(val_col).alias("observed_avg"),
    ).transform(materialize)
    spans = agg.groupBy("series").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    spine = spans.select(
        "series",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias(
            "bucket_ts"
        ),
    )
    j = spine.join(agg, ["series", "bucket_ts"], "left")

    w = Window.partitionBy("series").orderBy("bucket_ts")
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)
    obs_ts = F.when(
        F.col("observed_avg").isNotNull(), F.col("bucket_ts")
    )
    prev_v = F.last("observed_avg", ignorenulls=True).over(w_prev)
    prev_t = F.last(obs_ts, ignorenulls=True).over(w_prev)
    next_v = F.first("observed_avg", ignorenulls=True).over(w_next)
    next_t = F.first(obs_ts, ignorenulls=True).over(w_next)
    frac = (
        F.unix_timestamp(F.col("bucket_ts")) - F.unix_timestamp(prev_t)
    ) / (F.unix_timestamp(next_t) - F.unix_timestamp(prev_t))
    interp = (
        F.when(F.col("observed_avg").isNotNull(), F.col("observed_avg"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
        .otherwise(prev_v)
    )
    return j.select(
        F.col("series").alias(series_col),
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.round("observed_avg", decimals).alias("observed_avg"),
        F.round(prev_v, decimals).alias("locf_value"),
        F.round(interp, decimals).alias("interp_value"),
        F.col("observed_avg").isNull().alias("gap_filled"),
    )


def gap_fill_oracle_sql(
    table: str = "events",
    series_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical gap-filled grid."""
    return f"""
    WITH agg AS MATERIALIZED (
      SELECT {series_col} AS series, DATE_TRUNC('hour', {ts_col}) AS bucket_ts,
             COUNT(*) AS n_events, AVG({val_col}) AS observed_avg
      FROM {table} GROUP BY 1, 2
    ),
    spans AS (
      SELECT series, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
      FROM agg GROUP BY series
    ),
    spine AS (
      SELECT series, UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
      FROM spans
    ),
    j AS (
      SELECT s.series, s.bucket_ts, a.n_events, a.observed_avg
      FROM spine s LEFT JOIN agg a USING (series, bucket_ts)
    ),
    f AS (
      SELECT *,
        LAST_VALUE(observed_avg IGNORE NULLS) OVER (
          PARTITION BY series ORDER BY bucket_ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        LAST_VALUE(CASE WHEN observed_avg IS NOT NULL THEN bucket_ts END
                   IGNORE NULLS) OVER (
          PARTITION BY series ORDER BY bucket_ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        FIRST_VALUE(observed_avg IGNORE NULLS) OVER (
          PARTITION BY series ORDER BY bucket_ts
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        FIRST_VALUE(CASE WHEN observed_avg IS NOT NULL THEN bucket_ts END
                    IGNORE NULLS) OVER (
          PARTITION BY series ORDER BY bucket_ts
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
      FROM j
    )
    SELECT series AS {series_col}, bucket_ts,
           CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
           ROUND(observed_avg, {decimals}) AS observed_avg,
           ROUND(prev_v, {decimals}) AS locf_value,
           ROUND(CASE
             WHEN observed_avg IS NOT NULL THEN observed_avg
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v)
               * (EPOCH(bucket_ts) - EPOCH(prev_t))
               / (EPOCH(next_t) - EPOCH(prev_t))
             ELSE prev_v END, {decimals}) AS interp_value,
           observed_avg IS NULL AS gap_filled
    FROM f
    """


def rolling_zscore(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    trailing_buckets: int = 24,
    z_threshold: float = 2.0,
    decimals: int = 6,
) -> DataFrame:
    """Rolling anomaly score per (series, hourly bucket): z-score of
    the bucket average against the trailing ``trailing_buckets``-bucket
    mean/stddev (population), flagging |z| > threshold.  Buckets with
    fewer than 2 trailing observations or zero variance get z NULL.

    One aggregation over raw events, then a single ROWS window over
    the bucket grid — the standard streaming-friendly anomaly shape.
    """
    agg = events.groupBy(
        F.col(series_col).alias("series"),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
    ).agg(F.avg(val_col).alias("bucket_avg"))
    w = (
        Window.partitionBy("series")
        .orderBy("bucket_ts")
        .rowsBetween(-trailing_buckets, -1)
    )
    mean = F.avg("bucket_avg").over(w)
    # Population stddev computed from the sums (portable formula —
    # avoids engine-specific stddev_pop NULL/0 edge behavior).
    m2 = F.avg(F.col("bucket_avg") * F.col("bucket_avg")).over(w)
    n_tr = F.count("bucket_avg").over(w)
    var = m2 - mean * mean
    z = F.when(
        (n_tr >= 2) & (var > 1e-12),
        (F.col("bucket_avg") - mean) / F.sqrt(var),
    )
    return agg.select(
        F.col("series").alias(series_col),
        "bucket_ts",
        F.round("bucket_avg", decimals).alias("bucket_avg"),
        F.round(z, decimals).alias("zscore"),
        F.coalesce(
            F.abs(z) > F.lit(z_threshold), F.lit(False)
        ).alias("is_anomaly"),
    )


def rolling_zscore_oracle_sql(
    table: str = "events",
    series_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    trailing_buckets: int = 24,
    z_threshold: float = 2.0,
    decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical rolling z-score grid."""
    return f"""
    WITH agg AS MATERIALIZED (
      SELECT {series_col} AS series, DATE_TRUNC('hour', {ts_col}) AS bucket_ts,
             AVG({val_col}) AS bucket_avg
      FROM {table} GROUP BY 1, 2
    ),
    f AS (
      SELECT *,
        AVG(bucket_avg) OVER tw AS m,
        AVG(bucket_avg * bucket_avg) OVER tw AS m2,
        COUNT(bucket_avg) OVER tw AS n_tr
      FROM agg
      WINDOW tw AS (PARTITION BY series ORDER BY bucket_ts
                    ROWS BETWEEN {trailing_buckets} PRECEDING AND 1 PRECEDING)
    )
    SELECT series AS {series_col}, bucket_ts,
           ROUND(bucket_avg, {decimals}) AS bucket_avg,
           ROUND(CASE WHEN n_tr >= 2 AND m2 - m * m > 1e-12
                      THEN (bucket_avg - m) / SQRT(m2 - m * m) END,
                 {decimals}) AS zscore,
           COALESCE(CASE WHEN n_tr >= 2 AND m2 - m * m > 1e-12
                         THEN ABS((bucket_avg - m) / SQRT(m2 - m * m))
                              > {z_threshold} END,
                    FALSE) AS is_anomaly
    FROM f
    """


def time_weighted_average(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    decimals: int = 6,
) -> DataFrame:
    """Daily TWAP per series: each observation holds until the next
    one (step interpolation), so its weight is the seconds until the
    next event in the same series; the last observation of a day
    carries to the day boundary (or to its next event, capped at
    midnight).  The financial time-weighted-average shape
    (TimescaleDB `time_weight('LOCF', ...)`).

    One lead window per series + one groupBy — the weights derive
    from event times only, no spine needed.  Returns
    (series, day, n_events, twap, plain_avg) so the time-weighting
    bias against burst sampling is visible next to the naive mean.
    """
    w = Window.partitionBy("series").orderBy(ts_col)
    day = F.date_trunc("day", F.col(ts_col))
    nxt = F.lead(ts_col).over(w)
    day_end = F.date_trunc("day", F.col(ts_col)) + F.expr("INTERVAL 1 DAY")
    hold_until = F.least(F.coalesce(nxt, day_end), day_end)
    # Microsecond-exact weights (unix_timestamp truncates to whole
    # seconds; DuckDB's EPOCH is fractional; ANSI mode forbids a
    # direct timestamp->double cast).
    # (cast ntz->ltz: session TZ is UTC, and the offset cancels in
    # the difference regardless)
    weight = (
        F.unix_micros(hold_until.cast("timestamp"))
        - F.unix_micros(F.col(ts_col).cast("timestamp"))
    ).cast("double") / 1e6
    base = events.select(
        F.col(series_col).alias("series"),
        F.col(ts_col),
        F.col(val_col).cast("double").alias("v"),
    ).withColumn("_w", weight).withColumn("_day", day)
    return (
        base.groupBy("series", "_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("v") * F.col("_w")) / F.sum("_w"), decimals
            ).alias("twap"),
            F.round(F.avg("v"), decimals).alias("plain_avg"),
        )
        .select(
            F.col("series").alias(series_col),
            F.col("_day").alias("day"),
            "n_events",
            "twap",
            "plain_avg",
        )
    )


def time_weighted_average_oracle_sql(
    table: str = "events",
    series_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical daily TWAP grid."""
    return f"""
    WITH base AS (
      SELECT {series_col} AS series, {ts_col} AS ts,
             CAST({val_col} AS DOUBLE) AS v,
             CAST(DATE_TRUNC('day', {ts_col}) AS TIMESTAMP) AS day,
             LEAST(
               COALESCE(LEAD({ts_col}) OVER (PARTITION BY {series_col}
                                             ORDER BY {ts_col}),
                        DATE_TRUNC('day', {ts_col}) + INTERVAL 1 DAY),
               DATE_TRUNC('day', {ts_col}) + INTERVAL 1 DAY
             ) AS hold_until
      FROM {table}
    )
    SELECT series AS {series_col}, day,
           COUNT(*) AS n_events,
           ROUND(SUM(v * (EPOCH(hold_until) - EPOCH(ts)))
                 / SUM(EPOCH(hold_until) - EPOCH(ts)), {decimals}) AS twap,
           ROUND(AVG(v), {decimals}) AS plain_avg
    FROM base
    GROUP BY series, day
    """


def cusum_drift(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    decimals: int = 6,
) -> DataFrame:
    """One-sided CUSUM drift detection over the hourly bucket grid:
    S_t = max(0, S_{t-1} + (z_t - k)) flags sustained upward LEVEL
    SHIFTS that per-bucket z-scores miss (each bucket only slightly
    high, but persistently).  z_t standardizes the bucket average
    against the SERIES-WIDE mean/std so the statistic is scale-free.

    The clamped recursion has a window-expressible closed form:
    S_t = P_t - min_{j<=t} P_j  with  P = prefix-sum of (z - k) —
    one prefix-sum window + one running-min window, no recursion, no
    Python; this is what makes CUSUM feasible as a plan instead of a
    per-key loop at 100 TB.
    """
    # bucket-count-sized; consumed by the series-stats aggregate AND
    # the z-score join — materialize once, not two event scans
    agg = hourly_buckets(
        events,
        series_col,
        ts_col,
        bucket_avg=F.avg(val_col).alias("bucket_avg"),
    ).transform(materialize)
    stats = agg.groupBy("series").agg(
        F.avg("bucket_avg").alias("_m"),
        F.avg(F.col("bucket_avg") * F.col("bucket_avg")).alias("_m2"),
    )
    j = agg.join(F.broadcast(stats), "series").withColumn(
        "_z",
        (F.col("bucket_avg") - F.col("_m"))
        / F.sqrt(F.col("_m2") - F.col("_m") * F.col("_m")),
    )
    w = Window.partitionBy("series").orderBy("bucket_ts")
    w_all = w.rowsBetween(Window.unboundedPreceding, 0)
    p = F.sum(F.col("_z") - F.lit(slack_k)).over(w_all)
    j = j.withColumn("_p", p)
    run_min = F.min(F.least(F.col("_p"), F.lit(0.0))).over(w_all)
    s = F.col("_p") - run_min
    return j.select(
        F.col("series").alias(series_col),
        "bucket_ts",
        F.round("bucket_avg", decimals).alias("bucket_avg"),
        F.round(s, decimals).alias("cusum"),
        (F.round(s, decimals) > threshold_h).alias("drift_flag"),
    )


def cusum_drift_oracle_sql(
    table: str = "events",
    series_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical CUSUM grid."""
    return f"""
    WITH agg AS MATERIALIZED (
      SELECT {series_col} AS series, DATE_TRUNC('hour', {ts_col}) AS bucket_ts,
             AVG({val_col}) AS bucket_avg
      FROM {table} GROUP BY 1, 2
    ),
    st AS (
      SELECT series, AVG(bucket_avg) AS m,
             AVG(bucket_avg * bucket_avg) AS m2
      FROM agg GROUP BY series
    ),
    z AS (
      SELECT a.series, a.bucket_ts, a.bucket_avg,
             (a.bucket_avg - st.m) / SQRT(st.m2 - st.m * st.m) AS zv
      FROM agg a JOIN st USING (series)
    ),
    p AS (
      SELECT *,
        SUM(zv - {slack_k}) OVER (PARTITION BY series ORDER BY bucket_ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
      FROM z
    ),
    s AS (
      SELECT *,
        pp - MIN(LEAST(pp, 0.0)) OVER (PARTITION BY series ORDER BY bucket_ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cus
      FROM p
    )
    SELECT series AS {series_col}, bucket_ts,
           ROUND(bucket_avg, {decimals}) AS bucket_avg,
           ROUND(cus, {decimals}) AS cusum,
           ROUND(cus, {decimals}) > {threshold_h} AS drift_flag
    FROM s
    """


def ewma_daily(
    df: DataFrame,
    alpha: float = 0.3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially-weighted moving average over each key's daily
    series: ``s_1 = x_1; s_t = alpha*x_t + (1-alpha)*s_{t-1}`` (the
    pandas ``adjust=False`` recursion).

    A linear recurrence can't be a plain window sum, but it CAN stay
    in one declarative plan: collect each row's day-ordered prefix
    with a running-frame ``collect_list`` window, then fold it with
    ``F.aggregate`` seeded from the first element — pure IEEE
    multiply/add over identical inputs, so the result is
    bit-identical in any engine (DuckDB mirrors it with
    ``list_reduce``).  No libm, no Python.

    Scale shape: the daily pre-aggregation bounds each key's series
    to its day count, and the prefix lists live inside one window
    pass per key — state is O(days) per key, the same contract as any
    running-frame window.  For unbounded series, cap the frame (a
    rowsBetween(-N, 0) frame truncates the recursion to an N-step
    approximation with (1-alpha)^N tail error)."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = (
        df.groupBy(F.col(key_col), day)
        .agg(F.round(F.sum(value_col), 4).alias("x"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = daily.withColumn("xs", F.collect_list("x").over(w))
    seed = F.element_at("xs", 1)
    rest = F.slice(F.col("xs"), F.lit(2), F.greatest(F.size("xs") - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        seed,
        lambda acc, v: F.lit(alpha) * v + F.lit(1.0 - alpha) * acc,
    )
    return pre.select(
        key_col,
        "day",
        "x",
        F.round(ewma, 6).alias("ewma"),
    ).orderBy(key_col, "day")


def ewma_daily_oracle_sql(
    table: str = "events",
    alpha: float = 0.3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> str:
    """DuckDB SQL for the identical EWMA fold (list window +
    ``list_reduce`` — the first element seeds the accumulator exactly
    like the Spark ``F.aggregate`` seed)."""
    return f"""
    WITH daily AS (
      SELECT {key_col}, CAST({ts_col} AS DATE) AS day,
             ROUND(SUM({value_col}), 4) AS x
      FROM {table} GROUP BY 1, 2
    ),
    pre AS (
      SELECT {key_col}, day, x,
             list(x) OVER (PARTITION BY {key_col} ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS xs
      FROM daily
    )
    SELECT {key_col}, day, x,
           ROUND(list_reduce(xs, (acc, v) -> {alpha} * v + {1.0 - alpha} * acc), 6)
             AS ewma
    FROM pre ORDER BY {key_col}, day
    """


def holt_linear(
    df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing over each
    key's daily series — the trend-aware sibling of
    :func:`ewma_daily`:

    ``l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})``
    ``b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}``

    seeded ``l_1 = x_1, b_1 = 0``; emits the final level/trend and
    the one-step forecast ``l + b`` per key.

    The recursion carries a 2-component state, so the accumulator is
    a 2-element DOUBLE ARRAY folded with ``F.aggregate`` (DuckDB:
    ``list_reduce``).  Deliberately an array and NOT a struct:
    DuckDB's ``list_reduce`` updates struct accumulators field-by-
    field in place (the second field's lambda sees the first field
    already overwritten), while array construction reads all inputs
    before writing — arrays give the textbook semantics in BOTH
    engines, bit-identically (same IEEE expression tree, sequential
    fold).

    Scale shape: identical to :func:`ewma_daily` — daily
    pre-aggregation bounds the per-key list, one window pass, fold in
    codegen; state O(days) per key.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(F.col(key_col), day).agg(
        F.round(F.sum(value_col), 4).alias("x")
    )
    xs = daily.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("day"), F.col("x")))
        ).alias("_sx")
    ).select(
        key_col,
        F.transform(
            F.col("_sx"), lambda s: F.array(s["x"], F.lit(0.0))
        ).alias("xs"),
        F.size("_sx").alias("n_days"),
    )
    a, b = float(alpha), float(beta)
    seed = F.element_at("xs", 1)
    rest = F.slice(
        F.col("xs"), F.lit(2), F.greatest(F.size("xs") - 1, F.lit(0))
    )

    def step(acc, v):
        lvl = F.lit(a) * v[0] + F.lit(1.0 - a) * (acc[0] + acc[1])
        new_b = (
            F.lit(b)
            * (
                F.lit(a) * v[0]
                + F.lit(1.0 - a) * (acc[0] + acc[1])
                - acc[0]
            )
            + F.lit(1.0 - b) * acc[1]
        )
        return F.array(lvl, new_b)

    st = F.aggregate(rest, seed, step)
    return xs.select(
        key_col,
        "n_days",
        F.round(st[0], 6).alias("level"),
        F.round(st[1], 6).alias("trend"),
        F.round(st[0] + st[1], 6).alias("forecast_1"),
    ).orderBy(key_col)


def holt_linear_oracle_sql(
    table: str = "events",
    alpha: float = 0.5,
    beta: float = 0.3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> str:
    """DuckDB SQL for the identical Holt fold (array accumulator in
    ``list_reduce`` — see :func:`holt_linear` for why an array, not a
    struct)."""
    a, b = float(alpha), float(beta)
    lvl = f"{a}e0 * v[1] + {1.0 - a}e0 * (acc[1] + acc[2])"
    return f"""
    WITH daily AS (
      SELECT {key_col}, CAST({ts_col} AS DATE) AS day,
             ROUND(SUM({value_col}), 4) AS x
      FROM {table} GROUP BY 1, 2
    ),
    packed AS (
      SELECT {key_col},
             list([CAST(x AS DOUBLE), CAST(0 AS DOUBLE)]
                  ORDER BY day) AS xs,
             COUNT(*) AS n_days
      FROM daily GROUP BY {key_col}
    ),
    folded AS (
      SELECT {key_col}, n_days,
             list_reduce(xs, (acc, v) ->
               [ {lvl},
                 {b}e0 * (({lvl}) - acc[1]) + {1.0 - b}e0 * acc[2] ]
             ) AS st
      FROM packed
    )
    SELECT {key_col}, CAST(n_days AS INTEGER) AS n_days,
           ROUND(st[1], 6) AS level,
           ROUND(st[2], 6) AS trend,
           ROUND(st[1] + st[2], 6) AS forecast_1
    FROM folded ORDER BY {key_col}
    """


def mad_outliers(
    events: DataFrame,
    series_col: str = "event_type",
    val_col: str = "value",
    k: float = 3.0,
    decimals: int = 6,
) -> DataFrame:
    """Robust anomaly counting per series via Median Absolute
    Deviation: med = median(x), mad = median(|x - med|), outlier when
    |x - med| > k * mad — the standard robust alternative to z-scores
    (median/MAD are insensitive to the very outliers being hunted,
    unlike mean/stddev).

    Plan: exact ``percentile`` aggregations (sort-based within each
    series group); the per-series medians and MADs are tiny one-row-
    per-series frames broadcast back for the deviation/flag passes —
    three grouped aggregations total over the fact stream, output one
    row per series.  Exact double arithmetic end-to-end (interpolated
    medians compute identically in DuckDB), so the approximate-free
    result hash-matches the oracle."""
    med = events.groupBy(F.col(series_col).alias("_s")).agg(
        F.expr(f"percentile({val_col}, 0.5)").alias("_med")
    )
    dev = events.join(
        F.broadcast(med), F.col(series_col) == F.col("_s")
    ).withColumn("_adev", F.abs(F.col(val_col) - F.col("_med")))
    mad = dev.groupBy(F.col(series_col).alias("_s2")).agg(
        F.expr("percentile(_adev, 0.5)").alias("_mad")
    )
    flagged = dev.join(F.broadcast(mad), F.col(series_col) == F.col("_s2"))
    return (
        flagged.groupBy(series_col)
        .agg(
            F.first("_med").alias("_m"),
            F.first("_mad").alias("_d"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("_adev") > F.lit(k) * F.col("_mad")).cast("long")
            ).alias("n_outliers"),
        )
        .select(
            series_col,
            F.round("_m", decimals).alias("med"),
            F.round("_d", decimals).alias("mad"),
            "n",
            "n_outliers",
        )
        .orderBy(series_col)
    )


def mad_outliers_oracle_sql(
    table: str = "events",
    series_col: str = "event_type",
    val_col: str = "value",
    k: float = 3.0,
    decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical MAD outlier counts (DuckDB
    MEDIAN interpolates even counts exactly like Spark percentile)."""
    return f"""
    WITH med AS MATERIALIZED (
      SELECT {series_col} AS s, MEDIAN({val_col}) AS m
      FROM {table} GROUP BY 1
    ),
    dev AS MATERIALIZED (
      SELECT t.{series_col}, med.m, ABS(t.{val_col} - med.m) AS adev
      FROM {table} t JOIN med ON med.s = t.{series_col}
    ),
    mad AS (
      SELECT {series_col} AS s2, MEDIAN(adev) AS d FROM dev GROUP BY 1
    )
    SELECT dev.{series_col},
           ROUND(ANY_VALUE(dev.m), {decimals}) AS med,
           ROUND(ANY_VALUE(mad.d), {decimals}) AS mad,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN dev.adev > {k} * mad.d THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON mad.s2 = dev.{series_col}
    GROUP BY dev.{series_col}
    ORDER BY dev.{series_col}
    """


def touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    touch_types: tuple[str, ...] = ("click", "view"),
    conversion_type: str = "purchase",
    decimals: int = 6,
) -> DataFrame:
    """First-touch / last-touch conversion attribution: every
    conversion event is credited to the first (resp. most recent)
    strictly-preceding touch event of the same user; conversions with
    no prior touch land in the ``'none'`` bucket.

    Output: (model, touch_type, conversions, attributed_value) with
    model in {'first_touch', 'last_touch'} — the marketing-analytics
    rollup shape.

    Spark-first: ONE scan, two IGNORE-NULLS window carries over
    (user, ts, id) ordering (frame = unbounded preceding .. 1
    preceding, so a touch never credits itself or later conversions),
    then a single grouped aggregation per model, unioned.  The window
    shuffles once on user_id; at 100 TB per-user event streams are
    the natural partition and the carried state is two values.
    Total order within a user is (ts, event_id) — the same tiebreak
    both engines.  attributed_value is ROUND(...,{decimals}) to absorb
    double summation-order drift.
    """
    is_touch = F.col(type_col).isin(*touch_types)
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_expr = F.when(is_touch, F.col(type_col))
    carried = events.select(
        F.col(type_col).alias("_etype"),
        F.col(val_col).alias("_val"),
        F.first(touch_expr, ignorenulls=True).over(w).alias("_first"),
        F.last(touch_expr, ignorenulls=True).over(w).alias("_last"),
    ).filter(F.col("_etype") == conversion_type)

    def rollup(model: str, col: str) -> DataFrame:
        return (
            carried.select(
                F.lit(model).alias("model"),
                F.coalesce(F.col(col), F.lit("none")).alias("touch_type"),
                "_val",
            )
            .groupBy("model", "touch_type")
            .agg(
                F.count(F.lit(1)).alias("conversions"),
                F.round(F.sum("_val"), decimals).alias("attributed_value"),
            )
        )

    return rollup("first_touch", "_first").unionAll(rollup("last_touch", "_last"))


def touch_attribution_oracle_sql(
    table: str = "events",
    touch_types: tuple[str, ...] = ("click", "view"),
    conversion_type: str = "purchase",
    decimals: int = 6,
) -> str:
    """DuckDB oracle: identical IGNORE-NULLS window carries (verified
    frame-semantics parity with Spark) and the same rollup shape."""
    touches = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
    WITH carried AS (
      SELECT event_type, value,
             FIRST_VALUE(CASE WHEN event_type IN ({touches}) THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
             LAST_VALUE(CASE WHEN event_type IN ({touches}) THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
      FROM {table}
    ),
    conv AS (SELECT * FROM carried WHERE event_type = '{conversion_type}')
    SELECT 'first_touch' AS model, COALESCE(ft, 'none') AS touch_type,
           COUNT(*) AS conversions, ROUND(SUM(value), {decimals}) AS attributed_value
    FROM conv GROUP BY COALESCE(ft, 'none')
    UNION ALL
    SELECT 'last_touch' AS model, COALESCE(lt, 'none') AS touch_type,
           COUNT(*) AS conversions, ROUND(SUM(value), {decimals}) AS attributed_value
    FROM conv GROUP BY COALESCE(lt, 'none')
    """


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_weeks: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """Cohort retention analysis: users cohorted by first-activity week
    (Monday-truncated), then for every (cohort_week, offset_weeks) the
    count of cohort members active that week and the retention rate —
    the standard product-analytics retention triangle, and the
    engagement read a training-data pipeline runs on its own usage
    telemetry.

    Scale shape: one (user, week) distinct shuffle, one per-user min,
    one cohort join keyed by user, one grid aggregation — no windows,
    no driver state.  All counts are exact integers; the single
    division is rounded at output.

    Returns (cohort_week, offset_weeks, cohort_size, n_active,
    retention) ordered by (cohort_week, offset_weeks).
    """
    weeks = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
        )
        .distinct()
        .transform(materialize)  # feeds cohort min AND activity join
    )
    first = (
        weeks.groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
        .transform(materialize)  # feeds cohort sizes AND the join
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    grid = (
        weeks.join(first, "user_id")
        .withColumn(
            "offset_weeks",
            (F.datediff("week", "cohort_week") / 7).cast("int"),
        )
        .filter(F.col("offset_weeks") <= max_offset_weeks)
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        grid.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "offset_weeks",
            "cohort_size",
            "n_active",
            F.round(
                F.col("n_active") / F.col("cohort_size"), decimals
            ).alias("retention"),
        )
        .orderBy("cohort_week", "offset_weeks")
    )


def retention_cohorts_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_weeks: int = 8,
    decimals: int = 6,
) -> str:
    """DuckDB twin: same Monday week truncation, exact-integer counts,
    one rounded division."""
    return f"""
    WITH weeks AS (
      SELECT DISTINCT {user_col} AS user_id,
             CAST(DATE_TRUNC('week', {ts_col}) AS DATE) AS week
      FROM {table}
    ),
    first AS (
      SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM first GROUP BY 1
    ),
    grid AS (
      SELECT f.cohort_week,
             CAST(DATE_DIFF('day', f.cohort_week, w.week) / 7 AS INTEGER)
               AS offset_weeks,
             COUNT(*) AS n_active
      FROM weeks w JOIN first f USING (user_id)
      WHERE DATE_DIFF('day', f.cohort_week, w.week) / 7 <= {max_offset_weeks}
      GROUP BY 1, 2
    )
    SELECT g.cohort_week, g.offset_weeks, s.cohort_size, g.n_active,
           ROUND(CAST(g.n_active AS DOUBLE) / s.cohort_size, {decimals})
             AS retention
    FROM grid g JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, offset_weeks
    """


def holt_winters_additive(
    df: DataFrame,
    period: int = 7,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.4,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Holt-Winters additive seasonal smoothing (the triple-exponential
    member completing the ewma -> Holt family) over each key's daily
    series with season length ``period``:

    ``l_t = a*(x_t - s_{t-m}) + (1-a)*(l_{t-1} + b_{t-1})``
    ``b_t = b*(l_t - l_{t-1}) + (1-b)*b_{t-1}``
    ``s_t = g*(x_t - l_t) + (1-g)*s_{t-m}``

    Textbook seeding: ``l_m`` = mean of the first m observations,
    ``b = 0``, ``s_i = x_i - l_m``; the recursion folds over
    observations m+1..n.  Emits the final level/trend, the NEXT
    step's seasonal, and the one-step forecast ``l + b + s_next``.
    Keys with fewer than m+1 days are dropped (under-seeded).

    State is an (m+2)-element DOUBLE ARRAY ``[l, b, s_queue...]``
    where the queue's HEAD is always the current step's season — each
    step shifts the queue and appends the refreshed season (array,
    not struct: the :func:`holt_linear` list_reduce rationale).  One
    daily pre-aggregation + one fold per key, state O(days)."""
    m = int(period)
    if m < 2:
        raise ValueError("period must be >= 2")
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(F.col(key_col), day).agg(
        F.round(F.sum(value_col), 4).alias("x")
    )
    xs = (
        daily.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("day"), F.col("x")))
            ).alias("_sx")
        )
        .select(
            key_col,
            F.transform(F.col("_sx"), lambda s: s["x"]).alias("xs"),
            F.size("_sx").alias("n_days"),
        )
        .filter(F.col("n_days") >= m + 1)
    )
    a, b, g = float(alpha), float(beta), float(gamma)
    first_m = F.slice(F.col("xs"), 1, m)
    l0 = (
        F.aggregate(first_m, F.lit(0.0), lambda acc, x: acc + x)
        / F.lit(float(m))
    )
    staged = xs.select(
        key_col,
        "n_days",
        F.concat(
            F.array(l0, F.lit(0.0)),
            F.transform(first_m, lambda x: x - l0),
        ).alias("_seed"),
        F.slice(
            F.col("xs"), m + 1, F.greatest(F.size("xs") - m, F.lit(0))
        ).alias("_rest"),
    )

    def step(acc, x):
        s_head = F.element_at(acc, 3)
        # the identical expression tree is inlined wherever the NEW
        # level is consumed, mirroring the oracle's repeated string
        lvl = F.lit(a) * (x - s_head) + F.lit(1.0 - a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        nb = F.lit(b) * (lvl - F.element_at(acc, 1)) + F.lit(
            1.0 - b
        ) * F.element_at(acc, 2)
        ns = F.lit(g) * (x - lvl) + F.lit(1.0 - g) * s_head
        return F.concat(
            F.array(lvl, nb), F.slice(acc, 4, m - 1), F.array(ns)
        )

    st = F.aggregate(F.col("_rest"), F.col("_seed"), step)
    return staged.select(
        key_col,
        "n_days",
        F.round(F.element_at(st, 1), 6).alias("level"),
        F.round(F.element_at(st, 2), 6).alias("trend"),
        F.round(F.element_at(st, 3), 6).alias("season_next"),
        F.round(
            F.element_at(st, 1)
            + F.element_at(st, 2)
            + F.element_at(st, 3),
            6,
        ).alias("forecast_1"),
    ).orderBy(key_col)


def holt_winters_oracle_sql(
    table: str = "events",
    period: int = 7,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.4,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB twin of :func:`holt_winters_additive` (list_reduce over
    the same rotating [l, b, s_queue...] array)."""
    m = int(period)
    a, b, g = float(alpha), float(beta), float(gamma)
    # list_reduce has no separate init, so the seed array is prepended
    # and every observation is packed as a 1-element list (uniform
    # LIST(DOUBLE) type); x[1] is the observation
    lvl = (
        f"{a}e0 * (x[1] - acc[3]) + {1.0 - a}e0 * (acc[1] + acc[2])"
    )
    return f"""
    WITH daily AS (
      SELECT {key_col}, CAST({ts_col} AS DATE) AS day,
             ROUND(SUM({value_col}), 4) AS x
      FROM {table} GROUP BY 1, 2
    ),
    packed AS (
      SELECT {key_col},
             list(CAST(x AS DOUBLE) ORDER BY day) AS xs,
             COUNT(*) AS n_days
      FROM daily GROUP BY {key_col}
      HAVING COUNT(*) >= {m + 1}
    ),
    seeded AS (
      SELECT {key_col}, n_days,
             [list_aggregate(xs[1:{m}], 'sum') / {m}.0e0, 0.0e0]
               || list_transform(xs[1:{m}],
                    x -> x - list_aggregate(xs[1:{m}], 'sum') / {m}.0e0)
               AS seed,
             list_transform(xs[{m + 1}:LEN(xs)], x -> [x]) AS rest
      FROM packed
    ),
    folded AS (
      SELECT {key_col}, n_days,
             list_reduce(list_prepend(seed, rest), (acc, x) ->
               [ {lvl},
                 {b}e0 * (({lvl}) - acc[1]) + {1.0 - b}e0 * acc[2] ]
               || acc[4:{m + 2}]
               || [ {g}e0 * (x[1] - ({lvl})) + {1.0 - g}e0 * acc[3] ]
             ) AS st
      FROM seeded
    )
    SELECT {key_col}, CAST(n_days AS INTEGER) AS n_days,
           ROUND(st[1], 6) AS level,
           ROUND(st[2], 6) AS trend,
           ROUND(st[3], 6) AS season_next,
           ROUND(st[1] + st[2] + st[3], 6) AS forecast_1
    FROM folded ORDER BY {key_col}
    """


def theil_sen_trend(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    decimals: int = 6,
) -> DataFrame:
    """Theil-Sen robust trend per key's daily series: slope = median
    of all pairwise slopes (x_j - x_i)/(j - i), intercept = median of
    (x_i - slope*i) — the classical robust regression (Sen 1968) that
    tolerates ~29% outliers where least squares breaks on one.  The
    trend companion of the MAD outlier profile.

    Per-key pairwise slopes are O(days^2) on the DAILY-aggregated
    series — bounded by the calendar, not the event volume (a year is
    ~66k pairs/key); generated map-side from the packed day array, so
    the only shuffles are the daily pre-aggregation and the per-key
    percentile.  Exact continuous percentiles match DuckDB's
    quantile_cont bit-for-bit (the mad_outliers argument)."""
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.groupBy(F.col(key_col), day).agg(
        F.round(F.sum(value_col), 4).alias("x")
    )
    packed = daily.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("day"), F.col("x")))
        ).alias("_sx")
    ).select(
        key_col,
        F.transform(F.col("_sx"), lambda s: s["x"]).alias("_xs"),
        F.transform(
            F.col("_sx"),
            lambda s: F.datediff(s["day"], F.lit("2000-01-01")),
        ).alias("_ds"),
        F.size("_sx").alias("n_days"),
    ).filter(F.col("n_days") >= 2).transform(materialize)
    # all i<j pairwise slopes, generated map-side from the arrays
    pair_idx = F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size("_xs") - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size("_xs")),
                    lambda j: F.struct(i.alias("i"), j.alias("j")),
                ),
            )
        ),
        lambda p: p["i"] < p["j"],
    )
    slopes = packed.select(
        key_col, F.explode(pair_idx).alias("_p"), "_xs", "_ds"
    ).select(
        key_col,
        (
            (
                F.element_at("_xs", F.col("_p.j"))
                - F.element_at("_xs", F.col("_p.i"))
            )
            / (
                F.element_at("_ds", F.col("_p.j"))
                - F.element_at("_ds", F.col("_p.i"))
            ).cast("double")
        ).alias("_s"),
    )
    med_slope = slopes.groupBy(key_col).agg(
        F.percentile("_s", 0.5).alias("_slope")
    )
    resid = (
        packed.join(med_slope, key_col)
        .select(
            key_col,
            "n_days",
            "_slope",
            F.explode(F.arrays_zip("_xs", "_ds")).alias("_z"),
        )
        .select(
            key_col,
            "n_days",
            "_slope",
            (
                F.col("_z._xs")
                - F.col("_slope") * F.col("_z._ds").cast("double")
            ).alias("_r"),
        )
    )
    return (
        resid.groupBy(key_col)
        .agg(
            F.first("n_days").alias("n_days"),
            F.round(F.first("_slope"), decimals).alias("slope_per_day"),
            F.round(F.percentile("_r", 0.5), decimals).alias("intercept"),
        )
        .orderBy(key_col)
    )
