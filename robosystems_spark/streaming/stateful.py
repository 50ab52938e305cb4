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


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy-hitter monitor.
# ---------------------------------------------------------------------------

FREQ_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("value", T.StringType()),
        T.StructField("est_count", T.LongType()),
    ]
)

_FREQ_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vals", T.ArrayType(T.StringType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
    ]
)


def _mg_fold(counters: dict, pdf: pd.DataFrame, k: int) -> dict:
    for v, c in pdf["value"].value_counts().items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {v: c - cut for v, c in counters.items() if c > cut}
    return counters


def streaming_frequent_items(
    events: DataFrame,
    value_col: str = "user_id",
    k: int = 32,
    n_shards: int = 8,
) -> DataFrame:
    """Streaming heavy-hitter monitor: each shard (md5 of the value
    mod ``n_shards``) keeps a Misra-Gries summary of at most ``k``
    counters in grouped state, folding every micro-batch in with the
    same mergeable subtract-and-truncate rule as the batch operator
    (``operators/sketches.py``) — so state per shard is O(k) FOREVER,
    no matter the stream's key cardinality, and any value with shard
    frequency > n_shard/(k+1) is guaranteed present.

    Emits the shard's current candidate set (shard, value, est_count)
    each batch; a downstream exact recount (the batch two-pass) turns
    candidates into exact phi-frequent items on demand.
    """
    from pyspark.sql import functions as F

    def update(key, pdfs, state: GroupState):
        (shard,) = key
        if state.exists:
            vals, cnts = state.get
            counters = dict(zip(vals, cnts))
        else:
            counters = {}
        for pdf in pdfs:
            counters = _mg_fold(counters, pdf, k)
        state.update((list(counters.keys()), [int(c) for c in counters.values()]))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "value": list(counters.keys()),
                "est_count": [int(c) for c in counters.values()],
            }
        )

    keyed = events.select(
        (
            F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
            .cast("long")
            % n_shards
        )
        .cast("int")
        .alias("shard"),
        F.col(value_col).cast("string").alias("value"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=FREQ_SCHEMA,
        stateStructType=_FREQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
