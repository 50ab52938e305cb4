"""Chunked result delivery.

The reference's "streaming" is transport: a finished/iterating result
set delivered in configurable chunks of 10-10,000 rows
(/root/reference/robosystems/graph_api/core/duckdb/manager.py:374-461
fetchmany loop; graph_api/core/ladybug/service.py:261-445; chunk
bounds routers/graphs/query/execute.py:217-219).

Spark shape: ``toLocalIterator()`` pulls one partition at a time to
the driver — memory stays O(partition), not O(result) — and a Python
generator re-batches rows into chunks.  NDJSON framing mirrors the
reference's streaming response mode.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from datetime import date, datetime

from pyspark.sql import DataFrame

MIN_CHUNK_SIZE = 10
MAX_CHUNK_SIZE = 10_000
DEFAULT_CHUNK_SIZE = 1_000


def clamp_chunk_size(requested: int | None) -> int:
    if requested is None:
        return DEFAULT_CHUNK_SIZE
    return max(MIN_CHUNK_SIZE, min(MAX_CHUNK_SIZE, int(requested)))


def iter_chunks(df: DataFrame, chunk_size: int | None = None) -> Iterator[list[dict]]:
    """Yield result rows as lists of dicts, ``chunk_size`` rows per
    chunk (row-orientation happens only here, at the API edge —
    mirroring engine.py:390-422)."""
    size = clamp_chunk_size(chunk_size)
    batch: list[dict] = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        batch.append(row.asDict(recursive=True))
        if len(batch) >= size:
            yield batch
            batch = []
    if batch:
        yield batch


def _json_default(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def ndjson_chunks(df: DataFrame, chunk_size: int | None = None) -> Iterator[str]:
    """NDJSON framing: one JSON object per row, newline-delimited,
    flushed per chunk (streaming.py:74-150 response mode)."""
    for batch in iter_chunks(df, chunk_size):
        yield "".join(json.dumps(r, default=_json_default) + "\n" for r in batch)
