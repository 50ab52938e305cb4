"""Stream-stream join tests: the batch twin is the oracle for the
streaming path (identical interval-join semantics), plus the genuine
outer-join behavior — an unmatched view emits its null-padded row only
after the watermark proves no purchase can still arrive."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.streaming.events import events_stream
from robosystems_spark.streaming.joins import view_purchase_interval_join


def test_interval_seconds_parses_and_rejects_descriptively():
    import pytest

    from robosystems_spark.streaming.joins import _interval_seconds

    assert _interval_seconds("1 hour") == 3600
    assert _interval_seconds("30 minutes") == 1800
    assert _interval_seconds("90 seconds") == 90
    assert _interval_seconds("2 days") == 172800
    for bad in ("1 hr", "1.5 hours", "90min", "hours", "-1 hours"):
        with pytest.raises(ValueError, match="interval"):
            _interval_seconds(bad)


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    batch = view_purchase_interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        within="6 hours",
    )
    expected = {tuple(r) for r in batch.collect()}
    assert len(expected) > 0

    src = str(tmp_path / "events_src")
    ev.write.mode("overwrite").parquet(src)
    s_ev = events_stream(spark, src)
    stream = view_purchase_interval_join(
        s_ev.filter(F.col("event_type") == "view"),
        s_ev.filter(F.col("event_type") == "purchase"),
        within="6 hours",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ssj_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM ssj_t").collect()}
    assert got == expected


def test_outer_join_emits_unmatched_after_watermark(spark, tmp_path):
    """left_outer stream-stream join: a view with no purchase inside
    the interval is held in state until the watermark passes
    view_ts + interval, then emits with null purchase columns."""
    src = str(tmp_path / "outer_src")
    os.makedirs(src)
    from datetime import datetime as dt

    def write(rows):
        spark.createDataFrame(
            [(i, dt.fromisoformat(t), u, e, v, "{}") for i, t, u, e, v in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    # user 1: view at 08:00 converts at 08:30; user 2: view never converts
    write(
        [
            (1, "2024-01-01 08:00:00", 1, "view", 1.0),
            (2, "2024-01-01 08:30:00", 1, "purchase", 9.0),
            (3, "2024-01-01 08:00:00", 2, "view", 1.0),
        ]
    )
    s_ev = events_stream(spark, src, max_files_per_trigger=1)
    joined = view_purchase_interval_join(
        s_ev.filter(F.col("event_type") == "view"),
        s_ev.filter(F.col("event_type") == "purchase"),
        within="1 hour",
        view_watermark="10 minutes",
        purchase_watermark="10 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("outer_t")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    matched = {r["user_id"]: r for r in spark.sql("SELECT * FROM outer_t").collect()}
    # the null-padded row for user 2 cannot have emitted yet — a
    # purchase could still arrive inside (view_ts + 1h + watermark)
    assert 2 not in matched or matched[2]["purchase_id"] is not None

    # advance event time far past view_ts + interval + watermark
    write([(4, "2024-01-01 12:00:00", 3, "view", 1.0)])
    q.processAllAvailable()
    write([(5, "2024-01-01 13:30:00", 3, "purchase", 2.0)])
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM outer_t").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1 matched within the interval
    assert by_user[1][0]["purchase_id"] == 2
    # user 2's view emitted null-padded once the watermark closed it
    assert len(by_user[2]) == 1 and by_user[2][0]["purchase_id"] is None
