"""Execution-strategy selection, client detection, timeout-mode mapping.

Re-expresses /root/reference/robosystems/routers/graphs/query/
strategies.py:24-41 (the 11-strategy enum), 113-161 (client detection
from headers incl. Prefer parsing), 164-285 (the full selection
matrix: mode overrides → interactive clients → system load → write
ops → size tiers), and middleware/graph/execution_strategies.py:
204-253 (capability detection from Accept/User-Agent).

The reference selects a strategy per HTTP request; here the inputs
are plain dicts/dataclasses so the same matrix drives any transport.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum

from robosystems_spark.queryapi.analyzer import QueryAnalysis, analyze_query_features


class Strategy(str, Enum):
    # Base strategies (strategies.py:24-41)
    JSON_IMMEDIATE = "json_immediate"       # small result, sync JSON
    JSON_COMPLETE = "json_complete"         # medium result, buffered JSON
    NDJSON_STREAMING = "ndjson_streaming"   # large result, chunked NDJSON
    SSE_STREAMING = "sse_streaming"         # large result, SSE framing
    SSE_PROGRESS = "sse_progress"           # SSE with progress events only
    QUEUE_WITH_MONITORING = "queue_monitoring"  # queued + SSE monitor
    QUEUE_SIMPLE = "queue_simple"           # queued, poll for result
    CACHED = "cached"                       # served from result cache
    # Query-specific strategies
    SSE_QUEUE_STREAM = "sse_queue_stream"   # queue first, stream via SSE
    TRADITIONAL_QUEUE = "traditional_queue"  # 202 + polling URLs
    SYNC_TESTING = "sync_testing"           # synchronous for testing tools

    # Back-compat alias used by earlier rounds
    QUEUED = "traditional_queue"


# Size tier bounds (execution_strategies.py:150-161)
SMALL_RESULT = 100
MEDIUM_RESULT = 1000

_TESTING_TOOLS = ("postman", "insomnia", "swagger", "openapi", "curl", "httpie")
_BROWSERS = ("mozilla", "chrome", "safari", "firefox", "edge")


@dataclass
class ClientCapabilities:
    accepts_ndjson: bool = False
    accepts_sse: bool = False
    is_test_client: bool = False
    is_browser: bool = False
    prefers_stream: bool = False
    prefers_async: bool = False
    prefers_wait: bool = False
    wait_time: int | None = None
    user_agent: str = ""

    @property
    def is_interactive(self) -> bool:
        return self.is_test_client


def detect_client(headers: dict[str, str]) -> ClientCapabilities:
    """Client detection from request headers (strategies.py:113-161 +
    execution_strategies.py:204-253): Accept content negotiation,
    User-Agent tool/browser sniffing, RFC-7240 Prefer parsing."""
    h = {k.lower(): v for k, v in (headers or {}).items()}
    user_agent = h.get("user-agent", "").lower()
    accept = h.get("accept", "").lower()
    prefer = h.get("prefer", "").lower()

    supports_sse = (
        "text/event-stream" in accept or "eventstream" in accept or "sse" in accept
    )
    supports_ndjson = (
        "application/x-ndjson" in accept
        or "ndjson" in accept
        or "application/stream+json" in accept
    )
    is_testing_tool = any(t in user_agent for t in _TESTING_TOOLS)
    is_browser = any(b in user_agent for b in _BROWSERS)
    is_interactive = is_testing_tool or (
        is_browser and "swagger" in h.get("referer", "").lower()
    )

    wait_time = None
    m = re.search(r"wait=(\d+)", prefer)
    if m:
        wait_time = int(m.group(1))

    return ClientCapabilities(
        accepts_ndjson=supports_ndjson,
        accepts_sse=supports_sse,
        is_test_client=is_interactive,
        is_browser=is_browser,
        prefers_stream="stream" in prefer,
        prefers_async="respond-async" in prefer,
        prefers_wait="wait" in prefer,
        wait_time=wait_time,
        user_agent=user_agent,
    )


@dataclass
class SystemState:
    queue_size: int = 0
    running_queries: int = 0
    max_concurrent: int = 5

    @property
    def needs_queue(self) -> bool:
        return self.queue_size > 0 or self.running_queries >= self.max_concurrent


@dataclass
class ExecutionPlan:
    strategy: Strategy
    timeout_mode: str  # testing | streaming | queued
    chunk_size: int
    analysis: QueryAnalysis
    metadata: dict = field(default_factory=dict)


def _rows_estimate(analysis: QueryAnalysis) -> int:
    """Map the analyzer's size class onto the reference's row bounds."""
    return {"small": SMALL_RESULT, "medium": MEDIUM_RESULT}.get(
        analysis.estimated_size, MEDIUM_RESULT + 1
    )


def select_strategy(
    query: str,
    client: ClientCapabilities | None = None,
    system: SystemState | None = None,
    mode_override: str | None = None,  # sync | async | stream | None (auto)
    is_write: bool = False,
) -> ExecutionPlan:
    """The full selection matrix (strategies.py:168-285), in order:
    mode overrides, interactive clients, system load, write ops, then
    size tiers with capability-based streaming fallbacks."""
    client = client or ClientCapabilities()
    system = system or SystemState()
    analysis = analyze_query_features(query)
    estimated_rows = _rows_estimate(analysis)
    meta = {
        "estimated_rows": estimated_rows,
        "mode_override": mode_override,
        "is_write": is_write,
        "needs_queue": system.needs_queue,
    }

    def plan(strategy: Strategy) -> ExecutionPlan:
        if client.is_test_client:
            timeout_mode = "testing"
        elif strategy in (
            Strategy.TRADITIONAL_QUEUE,
            Strategy.QUEUE_SIMPLE,
            Strategy.QUEUE_WITH_MONITORING,
            Strategy.SSE_QUEUE_STREAM,
        ):
            timeout_mode = "queued"
        else:
            timeout_mode = "streaming"
        return ExecutionPlan(
            strategy=strategy,
            timeout_mode=timeout_mode,
            chunk_size=analysis.recommended_chunk_size,
            analysis=analysis,
            metadata=meta,
        )

    # 1. Mode overrides (strategies.py:197-213)
    if mode_override == "sync":
        return plan(Strategy.SYNC_TESTING)
    if mode_override == "async":
        return plan(Strategy.TRADITIONAL_QUEUE)
    if mode_override == "stream":
        if client.accepts_sse:
            return plan(Strategy.SSE_STREAMING)
        return plan(Strategy.NDJSON_STREAMING)

    # 2. Interactive tools get synchronous responses (strategies.py:217-228)
    if client.is_interactive:
        return plan(Strategy.SYNC_TESTING)

    # 3. Expensive analysis patterns queue regardless of size (this
    # engine's addition: unbounded var-length paths etc. — kept from
    # the earlier matrix so the queue admission still sees them)
    if analysis.expensive_patterns:
        if client.accepts_sse and not client.prefers_async:
            return plan(Strategy.SSE_QUEUE_STREAM)
        return plan(Strategy.TRADITIONAL_QUEUE)

    # 4. Write operations can't stream (strategies.py:235-239)
    if is_write:
        if system.needs_queue:
            return plan(Strategy.TRADITIONAL_QUEUE)
        return plan(Strategy.JSON_COMPLETE)

    # 5. System under load (strategies.py:241-248)
    if system.needs_queue:
        if client.accepts_sse and not client.prefers_async:
            return plan(Strategy.SSE_QUEUE_STREAM)
        return plan(Strategy.TRADITIONAL_QUEUE)

    # 6. Size tiers (strategies.py:250-285)
    if estimated_rows <= SMALL_RESULT:
        return plan(Strategy.JSON_IMMEDIATE)
    if estimated_rows <= MEDIUM_RESULT:
        if client.prefers_stream:
            if client.accepts_sse:
                return plan(Strategy.SSE_STREAMING)
            if client.accepts_ndjson:
                return plan(Strategy.NDJSON_STREAMING)
        return plan(Strategy.JSON_COMPLETE)
    # large
    if client.accepts_sse:
        return plan(Strategy.SSE_STREAMING)
    if client.accepts_ndjson:
        return plan(Strategy.NDJSON_STREAMING)
    if analysis.limit is not None and analysis.limit <= MEDIUM_RESULT:
        return plan(Strategy.JSON_COMPLETE)
    return plan(Strategy.NDJSON_STREAMING)
