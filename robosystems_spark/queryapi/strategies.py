"""Execution-strategy selection + timeout-mode mapping.

Re-expresses /root/reference/robosystems/routers/graphs/query/
strategies.py:24-41,164-285: pick a delivery strategy from the query's
estimated result size and the client's declared capabilities, and map
it onto a timeout mode for the cascade (strategies.py:288-334).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from robosystems_spark.queryapi.analyzer import QueryAnalysis, analyze_query_features


class Strategy(str, Enum):
    JSON_IMMEDIATE = "json_immediate"    # small result, sync JSON
    JSON_COMPLETE = "json_complete"      # medium result, buffered JSON
    NDJSON_STREAMING = "ndjson_streaming"  # large result, chunked NDJSON
    SSE_STREAMING = "sse_streaming"      # large result, SSE-capable client
    QUEUED = "queued"                    # expensive query -> background queue


@dataclass
class ClientCapabilities:
    accepts_ndjson: bool = False
    accepts_sse: bool = False
    is_test_client: bool = False


@dataclass
class ExecutionPlan:
    strategy: Strategy
    timeout_mode: str  # testing | streaming | queued
    chunk_size: int
    analysis: QueryAnalysis


def select_strategy(
    query: str, client: ClientCapabilities | None = None
) -> ExecutionPlan:
    client = client or ClientCapabilities()
    analysis = analyze_query_features(query)

    if analysis.expensive_patterns:
        strategy = Strategy.QUEUED
    elif analysis.estimated_size == "small":
        strategy = Strategy.JSON_IMMEDIATE
    elif analysis.estimated_size == "medium":
        strategy = Strategy.JSON_COMPLETE
    elif client.accepts_sse:
        strategy = Strategy.SSE_STREAMING
    elif client.accepts_ndjson:
        strategy = Strategy.NDJSON_STREAMING
    else:
        strategy = Strategy.JSON_COMPLETE

    if client.is_test_client:
        timeout_mode = "testing"
    elif strategy is Strategy.QUEUED:
        timeout_mode = "queued"
    else:
        timeout_mode = "streaming"
    return ExecutionPlan(
        strategy=strategy,
        timeout_mode=timeout_mode,
        chunk_size=analysis.recommended_chunk_size,
        analysis=analysis,
    )
