"""Structured Streaming tests: the batch inventory result is the
oracle for the streaming path (identical window semantics), plus a
genuine watermark late-data drop across micro-batches."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.streaming.events import (
    events_stream,
    run_to_memory,
    session_agg,
    sliding_agg,
    tumbling_agg,
)


@pytest.fixture(scope="module")
def events_src(spark, sf_dir, tmp_path_factory):
    """Events parquet re-written (ns->us normalized) as a stream source dir."""
    out = str(tmp_path_factory.mktemp("events_src"))
    read_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _wait_done(query, timeout=60):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout)


def test_tumbling_stream_matches_batch(spark, sf_dir, events_src):
    batch = tumbling_agg(read_table(spark, sf_dir, "events"))
    stream = tumbling_agg(events_stream(spark, events_src))
    q = run_to_memory(stream, "tumbling_t", output_mode="complete")
    _wait_done(q)
    got = spark.sql("SELECT * FROM tumbling_t")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert b == s and len(b) > 0


def test_sliding_stream_matches_batch(spark, sf_dir, events_src):
    batch = sliding_agg(read_table(spark, sf_dir, "events"))
    q = run_to_memory(sliding_agg(events_stream(spark, events_src)), "sliding_t", "complete")
    _wait_done(q)
    s = {tuple(r) for r in spark.sql("SELECT * FROM sliding_t").collect()}
    assert {tuple(r) for r in batch.collect()} == s


def test_session_stream_matches_batch(spark, sf_dir, events_src):
    batch = session_agg(read_table(spark, sf_dir, "events"))
    q = run_to_memory(session_agg(events_stream(spark, events_src)), "session_t", "complete")
    _wait_done(q)
    s = {tuple(r) for r in spark.sql("SELECT * FROM session_t").collect()}
    assert {tuple(r) for r in batch.collect()} == s


def test_watermark_drops_late_data(spark, tmp_path):
    """Two micro-batches: after the watermark advances past a window,
    a late event for that window is discarded (append mode)."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)

    from datetime import datetime as dt

    def write_batch(rows):
        spark.createDataFrame(
            [(i, dt.fromisoformat(t), u, e, v, p) for i, t, u, e, v, p in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: events up to 10:00; watermark (10 min) will pass 09:00-window end
    write_batch(
        [
            (1, "2024-01-01 08:30:00", 1, "a", 1.0, "{}"),
            (2, "2024-01-01 10:00:00", 1, "a", 1.0, "{}"),
        ]
    )
    agg = tumbling_agg(events_stream(spark, src, max_files_per_trigger=1), "1 hour", "10 minutes")
    q = run_to_memory(agg, "late_t", output_mode="append")
    q.processAllAvailable()
    # batch 2: a LATE event for the 08:00 window (already below watermark)
    write_batch([(3, "2024-01-01 08:45:00", 1, "a", 100.0, "{}")])
    q.processAllAvailable()
    # batch 3: advance watermark far so closed windows emit
    write_batch([(4, "2024-01-01 12:00:00", 1, "a", 1.0, "{}")])
    q.processAllAvailable()
    q.stop()

    rows = {r["window_start"].isoformat(): r["n_events"] for r in spark.sql(
        "SELECT * FROM late_t").collect()}
    # the late event (value=100) must NOT have been added to the 08:00 window
    assert rows.get("2024-01-01T08:00:00") == 1


def test_stateful_profile_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState: state persists across micro-batches —
    the second batch's output includes the first batch's counts."""
    from robosystems_spark.streaming.stateful import running_user_profile

    src = str(tmp_path / "stateful_src")
    os.makedirs(src)
    from datetime import datetime as dt

    def write(rows):
        spark.createDataFrame(
            [(i, dt.fromisoformat(t), u, "a", v, "{}") for i, t, u, v in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    write([(1, "2024-01-01 10:00:00", 7, 10.0), (2, "2024-01-01 10:05:00", 7, 5.0)])
    stream = events_stream(spark, src, max_files_per_trigger=1)
    q = (
        running_user_profile(stream)
        .writeStream.format("memory")
        .queryName("profile_t")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    first = spark.sql("SELECT * FROM profile_t WHERE user_id = 7").collect()[-1]
    assert first["n_events"] == 2 and first["total_value"] == 15.0

    write([(3, "2024-01-01 11:00:00", 7, 1.0)])
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM profile_t WHERE user_id = 7 ORDER BY n_events").collect()
    assert rows[-1]["n_events"] == 3
    assert rows[-1]["total_value"] == 16.0
    assert rows[-1]["last_seen"].hour == 11


def test_stateful_profile_batch_equivalent(spark, sf_dir):
    from robosystems_spark.io import read_table
    from robosystems_spark.streaming.stateful import running_user_profile

    ev = read_table(spark, sf_dir, "events")
    out = running_user_profile(ev)
    assert out.count() == ev.select("user_id").distinct().count()


def test_stream_dedup_matches_batch(spark, tmp_path):
    """Streaming dropDuplicatesWithinWatermark keeps one row per key
    and matches the batch dedup on in-watermark duplicates."""
    import datetime as dt

    from robosystems_spark.streaming.events import EVENT_SCHEMA, stream_dedup

    src = str(tmp_path / "dup_events")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, base, 100, "click", 1.0, None),
        (1, base + dt.timedelta(minutes=1), 100, "click", 1.0, None),  # dup id
        (2, base + dt.timedelta(minutes=2), 101, "view", 2.0, None),
        (2, base + dt.timedelta(minutes=3), 101, "view", 2.0, None),  # dup id
        (3, base + dt.timedelta(minutes=4), 102, "purchase", 3.0, None),
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    deduped = stream_dedup(stream, keys=["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.sql("select * from dedup_out").collect())
    assert got == [1, 2, 3]

    # batch twin agrees
    batch = stream_dedup(spark.read.schema(EVENT_SCHEMA).parquet(src), keys=["event_id"])
    assert sorted(r["event_id"] for r in batch.collect()) == [1, 2, 3]


# -- streaming ingestion into GraphStore ------------------------------------


def _mk_store(spark, tmp_path):
    from robosystems_spark.sources.materialize import GraphStore

    return GraphStore(spark, str(tmp_path / "graphs"), "kgstreamingest000", n_buckets=8)


def _file_stream(spark, src_dir):
    static = spark.read.parquet(str(src_dir))
    return spark.readStream.schema(static.schema).parquet(str(src_dir))


def test_stream_copy_into_loads_and_is_idempotent(spark, tmp_path):
    from robosystems_spark.streaming.ingest import stream_copy_into

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(50)], "identifier long, name string"
    ).write.parquet(str(src))

    store = _mk_store(spark, tmp_path)
    q = stream_copy_into(
        store, "Entity", _file_stream(spark, src), ["identifier"],
        str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    assert store.read("Entity").count() == 50

    # replay from a FRESH checkpoint (simulated duplicate delivery):
    # PK-idempotent append loads nothing new
    q2 = stream_copy_into(
        store, "Entity", _file_stream(spark, src), ["identifier"],
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert store.read("Entity").count() == 50
    # every micro-batch is a logged commit on the table
    assert all(h["op"] == "copy_into" for h in store.history("Entity"))


def test_stream_upsert_replaces_by_key(spark, tmp_path):
    from robosystems_spark.streaming.ingest import stream_upsert

    store = _mk_store(spark, tmp_path)
    store.copy_into(
        "Entity",
        spark.createDataFrame(
            [(1, "old"), (2, "keep")], "identifier long, name string"
        ),
        primary_keys=["identifier"],
    )
    src = tmp_path / "cdc"
    spark.createDataFrame(
        [(1, "new"), (3, "ins")], "identifier long, name string"
    ).write.parquet(str(src))

    q = stream_upsert(
        store, "Entity", _file_stream(spark, src), ["identifier"],
        str(tmp_path / "ckpt3"),
    )
    q.awaitTermination(120)
    rows = {r["identifier"]: r["name"] for r in store.read("Entity").collect()}
    assert rows == {1: "new", 2: "keep", 3: "ins"}


def test_stream_upsert_order_col_picks_latest(spark, tmp_path):
    from robosystems_spark.streaming.ingest import stream_upsert

    store = _mk_store(spark, tmp_path)
    src = tmp_path / "cdc2"
    # two updates for key 1 in one batch; offset decides the winner
    spark.createDataFrame(
        [(1, "stale", 10), (1, "latest", 20), (2, "only", 5)],
        "identifier long, name string, offset long",
    ).write.parquet(str(src))
    q = stream_upsert(
        store, "Entity", _file_stream(spark, src), ["identifier"],
        str(tmp_path / "ckpt4"), order_col="offset",
    )
    q.awaitTermination(120)
    rows = {r["identifier"]: r["name"] for r in store.read("Entity").collect()}
    assert rows == {1: "latest", 2: "only"}


def test_stream_apply_changes_honors_deletes_and_sequence(spark, tmp_path):
    """The streaming APPLY CHANGES loop: one micro-batch with
    out-of-order upserts and deletes lands atomically — net-deleted
    keys gone, latest-sequence values in place, unmatched deletes
    ignored."""
    from robosystems_spark.streaming.ingest import stream_apply_changes

    store = _mk_store(spark, tmp_path)
    store.copy_into(
        "Entity",
        spark.createDataFrame(
            [(1, "old"), (2, "gone"), (3, "keep")],
            "identifier long, name string",
        ),
        primary_keys=["identifier"],
    )
    src = tmp_path / "cdc_ops"
    spark.createDataFrame(
        [
            (1, "stale", "upsert", 10),
            (1, "latest", "upsert", 20),
            (2, "", "delete", 5),
            (4, "new", "upsert", 1),
            (9, "", "delete", 1),  # no such key: no-op
        ],
        "identifier long, name string, op string, seq long",
    ).write.parquet(str(src))

    v0 = store.version("Entity")
    q = stream_apply_changes(
        store, "Entity", _file_stream(spark, src), ["identifier"], "seq",
        str(tmp_path / "ckpt_ac"),
    )
    q.awaitTermination(120)
    rows = {r["identifier"]: r["name"] for r in store.read("Entity").collect()}
    assert rows == {1: "latest", 3: "keep", 4: "new"}
    assert store.version("Entity") == v0 + 1  # one commit per batch


def test_transform_with_state_accumulates(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API): ValueState
    totals + bounded ListState recent window survive micro-batches."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's typed-state client needs protobuf "
        "(not in this sandbox); the processor logic is covered by the "
        "batch-equivalent test below",
    )
    from robosystems_spark.streaming.stateful_v2 import recent_user_activity

    src = str(tmp_path / "twsp_src")
    os.makedirs(src)
    from datetime import datetime as dt

    def write(rows):
        spark.createDataFrame(
            [(i, dt.fromisoformat(t), u, "a", v, "{}") for i, t, u, v in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    write([
        (1, "2024-01-01 10:00:00", 7, 10.0),
        (2, "2024-01-01 10:05:00", 7, 20.0),
    ])
    stream = events_stream(spark, src, max_files_per_trigger=1)
    q = (
        recent_user_activity(stream)
        .writeStream.format("memory")
        .queryName("twsp_t")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    first = spark.sql("SELECT * FROM twsp_t WHERE user_id = 7").collect()[-1]
    assert first["n_events"] == 2 and first["total_value"] == 30.0
    assert first["recent_avg"] == 15.0

    # Second batch: list state caps at the latest 3 values (20, 1, 2).
    write([(3, "2024-01-01 11:00:00", 7, 1.0), (4, "2024-01-01 11:05:00", 7, 2.0)])
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT * FROM twsp_t WHERE user_id = 7 ORDER BY n_events"
    ).collect()
    last = rows[-1]
    assert last["n_events"] == 4 and last["total_value"] == 33.0
    assert last["recent_avg"] == round((20.0 + 1.0 + 2.0) / 3, 6)


def test_transform_with_state_batch_equivalent(spark, sf_dir):
    from robosystems_spark.io import read_table
    from robosystems_spark.streaming.stateful_v2 import recent_user_activity

    ev = read_table(spark, sf_dir, "events")
    out = recent_user_activity(ev)
    assert out.count() == ev.select("user_id").distinct().count()
    row = out.orderBy("user_id").first()
    assert row["recent_avg"] is not None and row["n_events"] > 0


def test_transform_with_state_protobuf_seam(spark):
    """Without protobuf the streaming path fails FAST with a clear
    remedy instead of crashing the streaming runner mid-query."""
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present; seam not reachable")
    except ImportError:
        pass
    from robosystems_spark.streaming.stateful_v2 import recent_user_activity

    rate = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "timestamp AS ts", "CAST(value AS DOUBLE) AS value"
    )
    with pytest.raises(RuntimeError, match="protobuf"):
        recent_user_activity(rate)


def test_streaming_frequent_items_state_bounded_and_superset(spark, tmp_path):
    """Streaming MG monitor: state folds across micro-batches (the
    heavy key's estimate grows batch over batch), per-shard output
    stays <= k rows, and the true heavy hitter is always present."""
    import datetime as _dt

    from robosystems_spark.streaming.events import events_stream
    from robosystems_spark.streaming.stateful import streaming_frequent_items

    src = str(tmp_path / "freq_src")
    os.makedirs(src)
    base = _dt.datetime(2024, 1, 1, 10, 0, 0)

    def write(batch_users):
        rows = [
            (i, base + _dt.timedelta(seconds=i), u, "a", 1.0, "{}")
            for i, u in enumerate(batch_users)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: user 7 heavy (30x), tail users once each
    write([7] * 30 + list(range(100, 120)))
    stream = events_stream(spark, src, max_files_per_trigger=1)
    q = (
        streaming_frequent_items(stream, "user_id", k=8, n_shards=4)
        .writeStream.format("memory")
        .queryName("freq_t")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    est1 = {
        r["value"]: r["est_count"]
        for r in spark.sql("SELECT * FROM freq_t").collect()
    }
    assert "7" in est1 and est1["7"] >= 30 - (20 // 9)  # MG undercount bound

    # batch 2: 20 more events for user 7 -> estimate must grow
    write([7] * 20 + list(range(200, 210)))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM freq_t WHERE value = '7'").collect()
    assert max(r["est_count"] for r in rows) >= est1["7"] + 20 - (10 // 9)
    # bounded state: every (batch, shard) emission is <= k rows
    import collections

    per_shard = collections.Counter()
    for r in spark.sql("SELECT * FROM freq_t").collect():
        per_shard[(r["shard"], r["est_count"], r["value"])] += 1
    # total distinct candidates per shard in the final state <= k
    final = collections.Counter(
        r["shard"] for r in rows
    )
    for shard, n in final.items():
        assert n <= 2 * 8  # two emissions (one per batch) x k bound


def test_streaming_quantile_monitor_matches_batch_sketch(spark, tmp_path):
    """Streaming quantile monitor: state folds across micro-batches and
    after all batches the per-series estimates EQUAL the batch log2
    sketch over the union of the data (same integer bucket function),
    with bounded register state."""
    import datetime as _dt

    from robosystems_spark.operators.sketches import log2_histogram_quantiles
    from robosystems_spark.streaming.events import events_stream
    from robosystems_spark.streaming.stateful import streaming_quantile_monitor

    src = str(tmp_path / "quant_src")
    os.makedirs(src)
    base = _dt.datetime(2024, 1, 1, 10, 0, 0)

    def write(values, offset):
        rows = [
            (offset + i, base + _dt.timedelta(seconds=offset + i), 1, "a", v, "{}")
            for i, v in enumerate(values)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    batch1 = [float(x) for x in range(1, 201)]
    batch2 = [float(x * 7 % 500) for x in range(1, 151)]
    write(batch1, 0)
    stream = events_stream(spark, src, max_files_per_trigger=1)
    q = (
        streaming_quantile_monitor(stream, "event_type", "value")
        .writeStream.format("memory")
        .queryName("quant_t")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    write(batch2, 10_000)
    q.processAllAvailable()
    q.stop()

    # latest emission (largest n_values) per quantile
    rows = spark.sql(
        "SELECT * FROM quant_t WHERE n_values = "
        "(SELECT MAX(n_values) FROM quant_t)"
    ).collect()
    got = {r["quantile"]: (r["n_values"], r["estimate"]) for r in rows}
    assert all(n == len(batch1) + len(batch2) for n, _ in got.values())

    both = spark.createDataFrame(
        [(v,) for v in batch1 + batch2], "value double"
    )
    want = {
        r["quantile"]: r["estimate"]
        for r in log2_histogram_quantiles(both, "value").collect()
    }
    for qq in (0.5, 0.9, 0.99):
        assert got[qq][1] == want[qq], (qq, got[qq], want[qq])


def test_streaming_distinct_monitor_matches_batch_hll(spark, tmp_path):
    """Streaming HLL distinct monitor: registers fold across
    micro-batches; after all batches the per-series estimate EQUALS
    the batch portable HLL over the union (same md5 hash, same
    bias-corrected estimator, 4-decimal rounding), with <= 2^p
    register state forever."""
    import datetime as _dt

    from robosystems_spark.operators.sketches import portable_hll_distinct
    from robosystems_spark.streaming.events import events_stream
    from robosystems_spark.streaming.stateful import streaming_distinct_monitor

    src = str(tmp_path / "hll_src")
    os.makedirs(src)
    base = _dt.datetime(2024, 1, 1, 10, 0, 0)

    def write(users, offset):
        rows = [
            (offset + i, base + _dt.timedelta(seconds=offset + i), u,
             "a" if u % 2 == 0 else "b", 1.0, "{}")
            for i, u in enumerate(users)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    batch1 = [u % 400 for u in range(0, 600)]       # heavy repeats
    batch2 = [u * 3 % 1000 for u in range(0, 500)]  # overlap + new
    write(batch1, 0)
    stream = events_stream(spark, src, max_files_per_trigger=1)
    q = (
        streaming_distinct_monitor(stream, "event_type", "user_id")
        .writeStream.format("memory")
        .queryName("hll_t")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    write(batch2, 10_000)
    q.processAllAvailable()
    q.stop()

    rows = spark.sql(
        "SELECT series, approx_distinct, n_events FROM hll_t t "
        "WHERE n_events = (SELECT MAX(n_events) FROM hll_t u "
        "                  WHERE u.series = t.series)"
    ).collect()
    got = {r["series"]: r["approx_distinct"] for r in rows}
    n_by_series = {r["series"]: r["n_events"] for r in rows}

    both = spark.createDataFrame(
        [(("a" if u % 2 == 0 else "b"), str(u)) for u in batch1 + batch2],
        "event_type string, user_id string",
    )
    want = {
        r["event_type"]: r["approx_distinct"]
        for r in portable_hll_distinct(both, "event_type", "user_id").collect()
    }
    assert set(got) == {"a", "b"}
    assert sum(n_by_series.values()) == len(batch1) + len(batch2)
    for s in ("a", "b"):
        assert got[s] == want[s], (s, got[s], want[s])
    # sanity: estimate within the ~4.6% HLL error of the truth
    truth = {
        "a": len({u for u in batch1 + batch2 if u % 2 == 0}),
        "b": len({u for u in batch1 + batch2 if u % 2 == 1}),
    }
    for s in ("a", "b"):
        assert abs(got[s] - truth[s]) / truth[s] < 0.15


def test_python_minhash_signature_equals_batch(spark):
    """The streaming monitor's Python signature must equal the batch
    column pipeline POSITION FOR POSITION, or stream flags would not
    reconcile with batch LSH candidates."""
    from robosystems_spark.operators.dedup import minhash_signatures
    from robosystems_spark.streaming.stateful import (
        python_minhash_signature,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the party",
        "short text",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    batch = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(docs, num_hashes=64).collect()
    }
    for i, t in enumerate(texts):
        assert python_minhash_signature(t, 64) == batch[i], i


def test_streaming_neardup_monitor(spark, tmp_path):
    """Near-dup at ingest: a batch-2 document that near-duplicates a
    batch-1 document is flagged against the EARLIER doc_id; an
    unrelated document is not flagged; the flagged pair is also a
    batch-LSH candidate (stream/batch reconciliation)."""
    import os

    from robosystems_spark.operators.dedup import minhash_near_duplicates
    from robosystems_spark.streaming.stateful import (
        streaming_neardup_monitor,
    )

    base = (
        "large scale training data pipelines deduplicate documents "
        "with minhash signatures banded into buckets for locality "
        "sensitive hashing at ingest time every single day"
    )
    near = base.replace("every single day", "every other day")
    other = (
        "completely different content about graph algorithms and "
        "shortest path computation over distributed edge partitions "
        "with no overlap whatsoever in any shingle window"
    )
    src = str(tmp_path / "docs_src")
    os.makedirs(src)

    def write(rows):
        spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(
            1
        ).write.mode("append").parquet(src)

    write([(1, base), (2, other)])
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_neardup_monitor(stream, est_threshold=0.5)
        .writeStream.format("memory")
        .queryName("neardup_t")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM neardup_t").count() == 0

    write([(3, near)])
    q.processAllAvailable()
    q.stop()
    flagged = {
        (r["doc_id"], r["matched_doc_id"])
        for r in spark.sql("SELECT * FROM neardup_t").collect()
    }
    assert flagged == {(3, 1)}  # later doc flagged against earlier

    # reconciliation: the batch pipeline finds the same pair
    docs = spark.createDataFrame(
        [(1, base), (2, other), (3, near)], "doc_id LONG, text STRING"
    )
    batch_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(docs, threshold=0.5).collect()
    }
    assert (1, 3) in batch_pairs and len(batch_pairs) == 1


def test_corpus_quality_monitor_stream_matches_batch(spark, sf_dir, tmp_path):
    """The windowed quality monitor computes IDENTICAL rows on a
    stream and on the same data as a batch frame (the house
    batch-twin contract), with keep bits matching the batch flag
    operators row-for-row."""
    from robosystems_spark.operators.text import (
        gopher_quality_flags,
        gopher_repetition_flags,
    )
    from robosystems_spark.streaming.events import corpus_quality_monitor

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("doc_id") % 6) * 1800
        ).alias("ts"),
    )
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)
    batch = corpus_quality_monitor(docs)
    stream = corpus_quality_monitor(
        spark.readStream.schema(docs.schema).parquet(src)
    )
    q = run_to_memory(stream, "quality_mon_t", output_mode="complete")
    _wait_done(q)
    got = spark.sql("SELECT * FROM quality_mon_t")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert b == s and len(b) == 3  # 6 half-hour offsets -> 3 hour windows
    # keep bits agree with the batch flag operators
    n_all = sum(r[4] for r in b)
    q_ok = gopher_quality_flags(docs).filter("passes_gopher")
    r_ok = gopher_repetition_flags(docs).filter("passes_repetition")
    assert n_all == q_ok.join(r_ok, "doc_id").count()
