"""Stream-stream joins with watermark-bounded state.

The one Structured Streaming operator family the module did not yet
cover: joining two live streams (here: ``view`` events to subsequent
``purchase`` events per user) with an event-time interval condition.
Spark buffers each side's rows in the state store and the watermark +
time-bound condition tell it when a buffered row can never match
again and may be evicted — without BOTH, stream-stream join state
grows forever (the inner-join case requires the interval condition;
outer joins additionally require watermarks on both sides to emit
their null-padded rows).

The same builder works in batch mode (the condition is an ordinary
range predicate), so the batch twin doubles as the DuckDB oracle for
the streaming path — identical semantics, two execution modes
(tests/test_streaming_joins.py exploits this, like events.py's aggs).

Reference analog: the reference has no stream processing (SURVEY §1.1
"Streams: none in the data model" — its 'streaming' is chunked result
delivery, routers/graphs/query/streaming.py); this module is part of
the mandated Structured Streaming extension (SURVEY §7 step 8).

Scale notes: the join shuffles both streams on ``user_id`` once; state
per key is bounded by (watermark + interval) so a hot user holds at
most that window of views/purchases. At 100 TB/day the sources are
Kafka topics partitioned by user_id so the stateful join is
co-partitioned end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_interval_join(
    views: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    view_watermark: str = "2 hours",
    purchase_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join each purchase to every view by the same user within the
    preceding ``within`` interval.

    ``views`` / ``purchases`` are event frames (streaming or batch)
    carrying at least (user_id, ts, event_id, value).  The interval
    condition ``view.ts <= purchase.ts < view.ts + within`` is what
    lets Spark evict view-side state once the purchase watermark
    passes ``view.ts + within``.

    ``how='left_outer'`` emits views that never converted (purchase
    columns null) once the watermark proves no match can arrive —
    the streaming form of the conversion-funnel anti-join.
    """
    secs = _interval_seconds(within)
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", view_watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", purchase_watermark)
    cond = (
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") < F.col("view_ts") + F.expr(f"INTERVAL {secs} SECOND"))
    )
    joined = v.join(p, cond, how)
    return joined.select(
        F.col("v_user_id").alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


_INTERVAL_UNITS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                   "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}


def _interval_seconds(spec: str) -> int:
    """'1 hour' / '30 minutes' / '90 seconds' -> seconds (no eval).

    Raises a descriptive ValueError for malformed specs ('1 hr',
    '1.5 hours', '90min') instead of a bare KeyError/ValueError."""
    parts = spec.split()
    if len(parts) != 2 or not parts[0].lstrip("-").isdigit():
        raise ValueError(
            f"invalid interval {spec!r}: expected '<integer> <unit>' "
            f"with unit one of {sorted(set(_INTERVAL_UNITS))}"
        )
    n, unit = parts
    if unit not in _INTERVAL_UNITS:
        raise ValueError(
            f"invalid interval unit {unit!r} in {spec!r}: expected one "
            f"of {sorted(set(_INTERVAL_UNITS))}"
        )
    if int(n) < 0:
        raise ValueError(f"invalid interval {spec!r}: must be non-negative")
    return int(n) * _INTERVAL_UNITS[unit]
