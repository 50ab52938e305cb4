"""Structured Streaming extension (no reference equivalent).

The reference's "streaming" is chunked transport of finished results
(SURVEY §2.9); genuine stream processing is the north-star extension.
The same windowed aggregations as the batch inventory
(robosystems_spark.inventory.windows) run on unbounded sources with
watermarks for late data.
"""

from robosystems_spark.streaming.events import (  # noqa: F401
    events_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)
