"""Server-Sent Events framing for query delivery.

Re-expresses the reference's SSE layer:
- event wire format ``event: <type>\\ndata: <json>\\n\\n`` with
  operation_id/timestamp/sequence_number envelope
  (/root/reference/robosystems/middleware/sse/event_storage.py:21-85)
- operation lifecycle events started → progress* → completed/error
  (event_storage.py:24-34, middleware/sse/operation_manager.py)
- keepalive events between slow chunks so proxies don't drop the
  connection (routers/graphs/query/execute.py:135 "30-second
  keepalive"; middleware/sse/streaming.py:411-413)

The generator wraps the same chunk iterator NDJSON uses — SSE is a
framing, not a different execution path.  Time is injected via
``clock`` so keepalive behavior is deterministic under test.
"""

from __future__ import annotations

import json
import time as _time
from collections.abc import Iterator
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame

from robosystems_spark.serving.chunking import _json_default, iter_chunks

KEEPALIVE_INTERVAL_S = 30.0


class EventType(str, Enum):
    OPERATION_STARTED = "operation_started"
    OPERATION_PROGRESS = "operation_progress"
    OPERATION_COMPLETED = "operation_completed"
    OPERATION_ERROR = "operation_error"
    OPERATION_CANCELLED = "operation_cancelled"
    DATA_CHUNK = "data_chunk"
    KEEPALIVE = "keepalive"


@dataclass
class SSEEvent:
    """One wire event (event_storage.py:47-85)."""

    event_type: EventType
    operation_id: str
    timestamp: str
    data: dict = field(default_factory=dict)
    sequence_number: int = 0

    def to_sse_format(self) -> str:
        payload = json.dumps(
            {
                "operation_id": self.operation_id,
                "timestamp": self.timestamp,
                "sequence_number": self.sequence_number,
                **self.data,
            },
            separators=(",", ":"),
            ensure_ascii=False,
            default=_json_default,
        )
        # double newline terminates an SSE event
        return f"event: {self.event_type.value}\ndata: {payload}\n\n"


def _iso_now(clock) -> str:
    from datetime import datetime, timezone

    return datetime.fromtimestamp(clock(), tz=timezone.utc).isoformat()


def _events_over_batches(
    operation_id: str,
    columns: list[str],
    batches,
    keepalive_interval_s: float,
    clock,
    wall_clock,
) -> Iterator[SSEEvent]:
    seq = 0

    def ev(etype: EventType, data: dict) -> SSEEvent:
        nonlocal seq
        e = SSEEvent(
            event_type=etype,
            operation_id=operation_id,
            timestamp=_iso_now(wall_clock),
            data=data,
            sequence_number=seq,
        )
        seq += 1
        return e

    yield ev(EventType.OPERATION_STARTED, {"status": "running", "columns": columns})
    total_rows = 0
    chunk_index = 0
    last_emit = clock()
    try:
        for batch in batches:
            now = clock()
            if now - last_emit > keepalive_interval_s:
                yield ev(EventType.KEEPALIVE, {"status": "running"})
            yield ev(
                EventType.DATA_CHUNK,
                {
                    "chunk_index": chunk_index,
                    "rows": batch,
                    "row_count": len(batch),
                    "total_rows_sent": total_rows + len(batch),
                },
            )
            total_rows += len(batch)
            chunk_index += 1
            last_emit = clock()
    except Exception as e:  # surface as an error event, then re-raise
        yield ev(
            EventType.OPERATION_ERROR,
            {"status": "failed", "error": str(e)},
        )
        raise
    yield ev(
        EventType.OPERATION_COMPLETED,
        {"status": "completed", "total_rows": total_rows, "total_chunks": chunk_index},
    )


def sse_events(
    df: DataFrame,
    operation_id: str,
    chunk_size: int | None = None,
    keepalive_interval_s: float = KEEPALIVE_INTERVAL_S,
    clock=_time.monotonic,
    wall_clock=_time.time,
) -> Iterator[SSEEvent]:
    """Lifecycle + data events for one query result.

    started(columns) → [keepalive*] data_chunk(rows, progress)* →
    completed(total_rows, total_chunks).  A keepalive is emitted
    before a chunk whenever producing it took longer than
    ``keepalive_interval_s`` (the synchronous twin of the reference's
    background keepalive task).  Errors surface as OPERATION_ERROR
    then re-raise, so a transport can close the stream cleanly.
    """
    yield from _events_over_batches(
        operation_id,
        df.columns,
        iter_chunks(df, chunk_size),
        keepalive_interval_s,
        clock,
        wall_clock,
    )


def sse_stream(
    df: DataFrame,
    operation_id: str,
    chunk_size: int | None = None,
    **kwargs,
) -> Iterator[str]:
    """Wire-format strings for an SSE response body."""
    for event in sse_events(df, operation_id, chunk_size, **kwargs):
        yield event.to_sse_format()


def sse_stream_from_chunks(
    operation_id: str,
    columns: list[str],
    chunks: list[list[dict]],
    keepalive_interval_s: float = KEEPALIVE_INTERVAL_S,
    clock=_time.monotonic,
    wall_clock=_time.time,
) -> Iterator[str]:
    """Wire-format SSE over already-materialized chunk batches (the
    QueryService path, where the timeout cascade collected chunks
    before delivery)."""
    for event in _events_over_batches(
        operation_id, columns, iter(chunks), keepalive_interval_s, clock, wall_clock
    ):
        yield event.to_sse_format()


def progress_events(
    operation_id: str,
    updates: Iterator[dict],
    clock=_time.monotonic,
    wall_clock=_time.time,
) -> Iterator[SSEEvent]:
    """Progress-only SSE feed (SSE_PROGRESS / queue-monitoring
    strategies): wraps any progress-dict iterator — e.g.
    serving/tasks.py background-ingest progress — in the standard
    envelope (operation_manager.py progress emission)."""
    seq = 0
    for u in updates:
        yield SSEEvent(
            event_type=EventType.OPERATION_PROGRESS,
            operation_id=operation_id,
            timestamp=_iso_now(wall_clock),
            data=u,
            sequence_number=seq,
        )
        seq += 1
