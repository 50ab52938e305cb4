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


QUANT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("quantile", T.DoubleType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("estimate", T.DoubleType()),
    ]
)

_QUANT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
    ]
)


def _log2_bucket(x: float, sub_bits: int, scale: int) -> int:
    """The SAME integer-exact bucket function as the batch sketch
    (operators/sketches.log2_histogram_quantiles) — bit length + top
    mantissa bits, no libm, so streaming state merges with (and can be
    audited against) batch histograms bucket-for-bucket."""
    v = max(int(round(float(x) * scale)), 0)
    if v <= 0:
        return 0
    bits = v.bit_length()
    m = 1 << sub_bits
    if bits <= sub_bits:
        return v
    return (bits - 1) * m + (v >> (bits - sub_bits - 1)) - m + 1


def _bucket_lower(b: int, sub_bits: int, scale: int) -> float:
    m = 1 << sub_bits
    if b == 0:
        return 0.0
    if b <= m:
        return b / scale
    b0 = b - 1
    return (2.0 ** (b0 // m)) * (1.0 + (b0 % m) / m) / scale


def streaming_quantile_monitor(
    events: DataFrame,
    series_col: str = "event_type",
    value_col: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Streaming quantile monitor: per series, grouped state holds the
    mergeable log2-histogram registers (<= 64 * 2^sub_bits counters —
    O(1) FOREVER regardless of stream volume); every micro-batch folds
    its values in by bucket-count addition, and the current p50/p90/
    p99 estimates are emitted per batch with the batch sketch's
    <=~9% relative-error guarantee (sub_bits=3).

    The latency/size percentile dashboard over an infinite stream —
    the streaming twin of ``events_value_quantile_sketch``, sharing
    its exact bucket function so a batch backfill and the streaming
    state reconcile bucket-for-bucket.
    """
    import numpy as np
    from pyspark.sql import functions as F

    def update(key, pdfs, state: GroupState):
        (series,) = key
        if state.exists:
            bks, cns = state.get
            hist = dict(zip(bks, cns))
        else:
            hist = {}
        for pdf in pdfs:
            for x in pdf[value_col].to_numpy():
                b = _log2_bucket(x, sub_bits, scale)
                hist[b] = hist.get(b, 0) + 1
        state.update((list(hist.keys()), [int(c) for c in hist.values()]))
        order = sorted(hist)
        cum = np.cumsum([hist[b] for b in order])
        n = int(cum[-1]) if len(cum) else 0
        rows = []
        for q in quantiles:
            target = int(round(q * 1_000_000))
            idx = int(np.searchsorted(cum * 1_000_000, target * n))
            idx = min(idx, len(order) - 1)
            rows.append(
                {
                    "series": series,
                    "quantile": q,
                    "n_values": n,
                    "estimate": round(
                        _bucket_lower(order[idx], sub_bits, scale), 9
                    ),
                }
            )
        yield pd.DataFrame(rows)

    keyed = events.select(
        F.col(series_col).cast("string").alias("series"),
        F.col(value_col).cast("double").alias(value_col),
    )
    return keyed.groupBy("series").applyInPandasWithState(
        update,
        outputStructType=QUANT_SCHEMA,
        stateStructType=_QUANT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_MONITOR_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("approx_distinct", T.DoubleType()),
    ]
)

_HLL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("ranks", T.ArrayType(T.LongType())),
        T.StructField("n_events", T.LongType()),
    ]
)


def streaming_distinct_monitor(
    events: DataFrame,
    series_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 9,
) -> DataFrame:
    """Streaming approximate-distinct monitor: per series, grouped
    state holds HLL registers (<= 2^p (bucket, max-rank) pairs — O(1)
    FOREVER regardless of stream volume); each micro-batch folds its
    values in by register max, and the running distinct estimate is
    emitted per batch.

    Shares the batch sketch's EXACT hash (md5 hex -> 60-bit int,
    bucket = h mod 2^p, rank = leading zeros of the top bits + 1) and
    bias-corrected estimator with
    ``operators.sketches.portable_hll_distinct`` — so a batch
    backfill over the same rows reconciles REGISTER-FOR-REGISTER with
    the streaming state, and the emitted estimates match to the
    4-decimal output rounding.  The "distinct users per event type"
    dashboard over an infinite stream.
    """
    import hashlib
    import math

    from pyspark.sql import functions as F

    from robosystems_spark.operators.sketches import _HASH_BITS, _alpha

    m = 1 << p
    width = _HASH_BITS - p
    alpha = _alpha(m)

    def update(key, pdfs, state: GroupState):
        (series,) = key
        if state.exists:
            bks, rks, n_events = state.get
            regs = dict(zip(bks, rks))
        else:
            regs, n_events = {}, 0
        for pdf in pdfs:
            for v in pdf[value_col]:
                n_events += 1
                h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                b = h % m
                w = h >> p
                rank = (width + 1) if w == 0 else (width - w.bit_length() + 1)
                if rank > regs.get(b, 0):
                    regs[b] = rank
        state.update(
            (list(regs.keys()), [int(r) for r in regs.values()], n_events)
        )
        # estimator identical to sketches._hll_estimate, summed in
        # sorted-bucket order for determinism
        s = sum(2.0 ** -regs[b] for b in sorted(regs))
        nb = len(regs)
        zeros = m - nb
        raw = (alpha * m * m) / (s + zeros)
        if raw <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        else:
            est = raw
        yield pd.DataFrame(
            [
                {
                    "series": series,
                    "n_events": n_events,
                    "approx_distinct": round(est, 4),
                }
            ]
        )

    keyed = events.select(
        F.col(series_col).cast("string").alias("series"),
        F.col(value_col).cast("string").alias(value_col),
    )
    return keyed.groupBy("series").applyInPandasWithState(
        update,
        outputStructType=HLL_MONITOR_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


NEARDUP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("matched_doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("est_matches", T.IntegerType()),
        T.StructField("est_jaccard", T.DoubleType()),
    ]
)

_NEARDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.ArrayType(T.LongType()))),
    ]
)


def python_minhash_signature(
    text: str, num_hashes: int = 64, shingle_k: int = 5
) -> list[int]:
    """The batch MinHash signature (operators/dedup.py
    ``minhash_signatures``) recomputed in plain Python, POSITION FOR
    POSITION: same md5 token hash (first 15 hex digits mod 2^31-1),
    same Horner shingle fold with 0 for out-of-range tokens, same
    Carter-Wegman permutations.  A unit test pins exact equality with
    the Spark column pipeline, so the streaming monitor below and the
    batch LSH see identical signatures — stream flags reconcile with
    batch candidate pairs with no correction pass."""
    import hashlib
    import re

    from robosystems_spark.operators.dedup import (
        MINHASH_P,
        SHINGLE_B,
        minhash_perm_consts,
    )

    toks = re.split(r"\s+", text.strip().lower())
    th = [
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16) % MINHASH_P
        for t in toks
    ]
    n = max(len(th) - (shingle_k - 1), 1)
    shingles = set()
    for i in range(n):
        h = 0
        for j in range(shingle_k):
            v = th[i + j] if i + j < len(th) else 0
            h = (h * SHINGLE_B + v) % MINHASH_P
        shingles.add(h)
    sig = []
    for seed in range(num_hashes):
        a, b = minhash_perm_consts(seed)
        sig.append(min((a * h + b) % MINHASH_P for h in shingles))
    return sig


def streaming_neardup_monitor(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    est_threshold: float = 0.5,
    bucket_cap: int = 8,
) -> DataFrame:
    """Streaming near-duplicate detection: as documents arrive, flag
    any that MinHash-LSH-collide with an EARLIER document — the
    dedup-at-ingest primitive a continuously-fed training corpus
    needs (don't store the duplicate, don't re-embed it).

    Two stages, both bounded:

    1. stateless ``mapInPandas``: per doc, the batch-identical MinHash
       signature (:func:`python_minhash_signature`) exploded into
       ``bands`` band keys — same banding as the batch operator, so a
       pair the batch pipeline would candidate is exactly a pair that
       shares a band bucket here;
    2. ``applyInPandasWithState`` grouped by (band, band_value): state
       is at most ``bucket_cap`` (id, signature) pairs per bucket
       FOREVER (the batch bucket-cap discipline); each incoming doc is
       scored against the bucket's residents by signature-estimated
       Jaccard (matching positions / num_hashes, the
       ``minhash_estimate_error`` estimator) and emitted when >=
       ``est_threshold``.

    Emits (doc_id, matched_doc_id, band, est_matches, est_jaccard) —
    a pair colliding in several bands appears once per band
    (downstream dedup is one ``dropDuplicates``).  State store:
    RocksDB at production scale; per-bucket state is O(bucket_cap *
    num_hashes) longs.
    """
    rows = num_hashes // bands

    def sig_bands(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "band": [], "val": [], "sig": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                sig = python_minhash_signature(
                    str(text), num_hashes, shingle_k=5
                )
                for b in range(bands):
                    out["doc_id"].append(int(did))
                    out["band"].append(b)
                    out["val"].append(
                        ",".join(
                            str(x) for x in sig[b * rows : (b + 1) * rows]
                        )
                    )
                    out["sig"].append(sig)
            yield pd.DataFrame(out)

    banded_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("val", T.StringType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    banded = docs.select("doc_id", "text").mapInPandas(
        sig_bands, banded_schema
    )

    def update(key, pdfs, state: GroupState):
        band, _val = key
        if state.exists:
            ids, sigs = state.get
            ids = list(ids)
            sigs = [list(s) for s in sigs]
        else:
            ids, sigs = [], []
        out = {
            "doc_id": [], "matched_doc_id": [], "band": [],
            "est_matches": [], "est_jaccard": [],
        }
        for pdf in pdfs:
            # doc_id order within the batch for determinism
            for _, row in pdf.sort_values("doc_id").iterrows():
                did = int(row["doc_id"])
                sig = [int(x) for x in row["sig"]]
                for known_id, known_sig in zip(ids, sigs):
                    if known_id == did:
                        continue
                    est = sum(
                        1 for a, b in zip(sig, known_sig) if a == b
                    )
                    if est >= est_threshold * num_hashes:
                        out["doc_id"].append(did)
                        out["matched_doc_id"].append(known_id)
                        out["band"].append(int(band))
                        out["est_matches"].append(est)
                        out["est_jaccard"].append(
                            round(est / num_hashes, 6)
                        )
                if len(ids) < bucket_cap:
                    ids.append(did)
                    sigs.append(sig)
        state.update((ids, sigs))
        yield pd.DataFrame(out)

    return banded.groupBy("band", "val").applyInPandasWithState(
        update,
        outputStructType=NEARDUP_SCHEMA,
        stateStructType=_NEARDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
