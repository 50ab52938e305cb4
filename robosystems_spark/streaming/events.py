"""Event-stream processing: windowed aggregations with watermarks.

Each aggregation is the streaming twin of a batch inventory entry
(inventory/windows.py) — ``F.window`` / ``F.session_window`` semantics
are identical in both modes, so batch results double as the oracle for
the streaming path (tests/test_streaming.py exploits this).

Scale notes: stateful aggregation state is keyed by (window, key) and
pruned by the watermark; at 100 TB/day the source would be Kafka with
partition-count >= executor cores, and the state store RocksDB-backed
(``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(
    spark: SparkSession,
    source_dir: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream (swap for Kafka in production)."""
    reader = spark.readStream.format(fmt).schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def tumbling_agg(
    events: DataFrame, window_size: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts/sums per event type."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_size, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (state pruned by watermark)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )


def run_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "append"
) -> "StreamingQuery":  # noqa: F821
    """Start the aggregation into an in-memory sink (testing harness)."""
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact deduplication on event keys.

    The streaming twin of the ingest-dedup idiom (W1 row_number dedup /
    staging ``_dedup``): keeps the first occurrence of each key.  With
    ``within_watermark`` (Spark 3.5+ ``dropDuplicatesWithinWatermark``)
    the dedup state for a key is dropped once the watermark passes it —
    bounded state at any volume, the only formulation that survives an
    unbounded stream.  Plain ``dropDuplicates`` state grows forever and
    is kept only for the batch twin (where it is exact).
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    src = events.withWatermark("ts", watermark)
    if within_watermark:
        return src.dropDuplicatesWithinWatermark(keys)
    return src.dropDuplicates(keys)


def corpus_quality_monitor(
    docs: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Windowed corpus-quality monitor for a continuously-ingested
    document stream: per event-time window, how many documents arrive
    and how many pass the Gopher quality (A1.1) and repetition (A1.2)
    gates — the drift dashboard a training-data ingest pipeline
    watches (a crawl source going spammy shows up as a keep-rate drop
    in its window, not as a surprise at the next full-corpus audit).

    The keep bits are the SAME column expressions the batch operators
    use (``gopher_quality_passes`` / ``gopher_repetition_passes``), so
    batch and stream agree row-for-row — pytest pins the equality.
    Works on both a streaming frame (watermarked windowed agg, state
    pruned) and a batch frame (same plan minus the watermark).
    """
    from robosystems_spark.operators.text import (
        gopher_quality_passes,
        gopher_repetition_passes,
    )

    src = docs.withWatermark(ts_col, watermark) if docs.isStreaming else docs
    flagged = src.select(
        F.col(ts_col),
        gopher_quality_passes(text_col).alias("_pq"),
        gopher_repetition_passes(text_col).alias("_pr"),
    )
    return (
        flagged.groupBy(F.window(ts_col, window_size).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("_pq").cast("long")).alias("n_pass_quality"),
            F.sum(F.col("_pr").cast("long")).alias("n_pass_repetition"),
            F.sum((F.col("_pq") & F.col("_pr")).cast("long")).alias(
                "n_pass_all"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_docs",
            "n_pass_quality",
            "n_pass_repetition",
            "n_pass_all",
            F.round(
                F.col("n_pass_all").cast("double") / F.col("n_docs"), 6
            ).alias("keep_rate"),
        )
    )
