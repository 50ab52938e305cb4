"""Custom stateful streaming via ``transformWithStateInPandas``.

Spark 4's successor to ``applyInPandasWithState`` (stateful.py): typed
state variables (ValueState/ListState/MapState), timers, and TTL
instead of a single opaque state tuple.  This module implements the
per-user recent-activity monitor as the canonical example: a
ValueState accumulator (event count, value sum) plus a bounded
ListState window of the latest values — the 'running stats + short
memory' shape fraud/ops monitors use.

Scale notes: state is keyed by user_id in the state store (RocksDB
provider in production) — O(active keys), with the ListState bounded
at ``RECENT_K`` values per key; each micro-batch touches only the
keys present in that batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RECENT_K = 3

ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("recent_avg", T.DoubleType()),
    ]
)


class RecentActivityProcessor(StatefulProcessor):
    """ValueState (count, total) + ListState (last RECENT_K values,
    oldest first) folded per micro-batch in event-time order."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n BIGINT, total DOUBLE"
        )
        self._recent = handle.getListState("recent", "v DOUBLE")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = self._totals.get()
        n, total = (int(prev[0]), float(prev[1])) if prev else (0, 0.0)
        recent = [float(v[0]) for v in self._recent.get()]
        batch = pd.concat(list(rows)).sort_values("ts")
        vals = batch["value"].astype(float).tolist()
        n += len(vals)
        total = round(total + float(sum(vals)), 6)
        recent = (recent + vals)[-RECENT_K:]
        self._totals.update((n, total))
        self._recent.put([(v,) for v in recent])
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "recent_avg": [round(sum(recent) / len(recent), 6)],
            }
        )

    def close(self) -> None:
        pass


def recent_user_activity(events: DataFrame) -> DataFrame:
    """Per-user running stats + recent-window average, updated every
    micro-batch.  On a batch frame, falls back to the equivalent
    aggregation (count/sum + mean of the latest RECENT_K by ts) so the
    same call is testable both ways."""
    if not events.isStreaming:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy(F.desc("ts"))
        latest = (
            events.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= RECENT_K)
            .groupBy("user_id")
            .agg(F.round(F.avg("value"), 6).alias("recent_avg"))
        )
        totals = events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        return totals.join(latest, "user_id").select(
            "user_id", "n_events", "total_value", "recent_avg"
        )
    try:  # the typed-state client speaks protobuf to the JVM
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark[connect] dependency); install it or use "
            "streaming/stateful.py running_user_profile, which has no "
            "such dependency"
        ) from exc
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RecentActivityProcessor(),
            outputStructType=ACTIVITY_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
