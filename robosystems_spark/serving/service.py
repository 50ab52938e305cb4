"""QueryService: the end-to-end query lifecycle (SURVEY §3.1).

Composes the serving pieces in the reference's order
(/root/reference/robosystems/routers/graphs/query/execute.py:208-252):

  1. admission check (load shedding)
  2. classification + gating (CypherGate)
  3. static analysis -> strategy + timeout mode
  4. queue admission (tier priority, per-user caps)
  5. execution under the timeout cascade (cancelJobGroup)
  6. chunked delivery (NDJSON-ready row batches)

Synchronous single-process composition here; the reference splits 1-3
and 4-6 across two services — the seams are the same.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from robosystems_spark.queryapi.cypher_gate import CypherGate, CypherGateError
from robosystems_spark.queryapi.strategies import (
    ClientCapabilities,
    SystemState,
    detect_client,
    select_strategy,
)
from robosystems_spark.serving.admission import AdmissionController
from robosystems_spark.serving.chunking import iter_chunks
from robosystems_spark.serving.queue import QueryQueue
from robosystems_spark.serving.timeouts import TimeoutCascade


class ServiceRejected(RuntimeError):
    pass


@dataclass
class QueryResult:
    strategy: str
    chunks: Iterator[list[dict]]
    columns: list[str]
    # SSE wire frames when the selected strategy is SSE-framed
    # (sse_streaming / sse_queue_stream); None otherwise
    sse: Iterator[str] | None = None
    operation_id: str = ""


class QueryService:
    def __init__(
        self,
        gate: CypherGate,
        queue: QueryQueue | None = None,
        admission: AdmissionController | None = None,
        timeouts: TimeoutCascade | None = None,
        endpoint_timeout_s: float = 300.0,
        cache=None,
        rate_limiter=None,
        circuit_breaker=None,
    ):
        from robosystems_spark.serving.cache import QueryCache
        from robosystems_spark.serving.robustness import (
            CircuitBreaker,
            SlidingWindowRateLimiter,
        )

        self.gate = gate
        self.queue = queue or QueryQueue()
        self.admission = admission or AdmissionController()
        self.timeouts = timeouts or TimeoutCascade()
        self.endpoint_timeout_s = endpoint_timeout_s
        self.rate_limiter = rate_limiter or SlidingWindowRateLimiter()
        self.circuit_breaker = circuit_breaker or CircuitBreaker()
        # result cache engages only where the graph's routing enables
        # it (shared repositories: types.py:153-160)
        routing = gate.identity.get_routing_info()
        self.cache_enabled = bool(routing.get("cache_enabled"))
        ttl = float(routing.get("ttl_seconds", 3600))
        self.cache = cache if cache is not None else QueryCache(ttl_s=ttl)

    def execute(
        self,
        cypher: str,
        params: dict | None = None,
        user_id: str = "anonymous",
        tier: str = "standard",
        client: ClientCapabilities | None = None,
        headers: dict | None = None,
        chunk_size: int | None = None,
        mode_override: str | None = None,
    ) -> QueryResult:
        from robosystems_spark.serving.robustness import (
            CircuitOpenError,
            RateLimitExceeded,
        )

        # reference lifecycle order (execute.py:208-252): rate limit,
        # circuit breaker, admission, then the cache/strategy path
        try:
            self.rate_limiter.check(user_id, tier=tier)
            self.circuit_breaker.check(self.gate.graph_id)
        except (RateLimitExceeded, CircuitOpenError) as e:
            raise ServiceRejected(str(e)) from e

        decision = self.admission.check()
        if not decision.admitted:
            raise ServiceRejected(f"Load shed: {decision.reason}")

        if self.cache_enabled:
            from robosystems_spark.serving.cache import cache_key

            key = cache_key(self.gate.graph_id, cypher, params)
            hit = self.cache.get(key)
            if hit is not None:
                return QueryResult(
                    strategy="cached",
                    chunks=iter(hit.chunks),
                    columns=hit.columns,
                )

        if client is None and headers is not None:
            client = detect_client(headers)
        system = SystemState(
            queue_size=getattr(self.admission, "queue_depth", 0) or 0,
            running_queries=0,
        )
        plan = select_strategy(
            cypher, client, system=system, mode_override=mode_override
        )
        self.queue.submit(cypher, user_id=user_id, tier=tier)
        item = self.queue.acquire()
        if item is None:
            # queued behind concurrency cap: the async layer would wait;
            # synchronously this surfaces as back-pressure
            raise ServiceRejected("Concurrency limit reached; retry")
        try:
            budget = self.timeouts.budget(self.endpoint_timeout_s, plan.timeout_mode)
            try:
                df = self.gate.query(cypher, params)
                spark = df.sparkSession
                group = f"query-{uuid.uuid4().hex[:8]}"
                operation_id = f"op-{uuid.uuid4().hex[:12]}"
                with self.timeouts.enforce(spark, group, budget.execution_s):
                    chunks = list(iter_chunks(df, chunk_size or plan.chunk_size))
            except CypherGateError:
                # gate rejections are caller errors, raised BEFORE the
                # engine boundary in the reference (execute.py:97-101) —
                # they say nothing about route health
                raise
            except Exception:
                # compilation/execution failures signal an unhealthy
                # route and count toward the breaker
                self.circuit_breaker.record_failure(self.gate.graph_id)
                raise
            self.circuit_breaker.record_success(self.gate.graph_id)
            if self.cache_enabled:
                self.cache.put(key, df.columns, chunks)
            sse = None
            if plan.strategy.value in ("sse_streaming", "sse_queue_stream", "sse_progress"):
                from robosystems_spark.serving.sse import sse_stream_from_chunks

                sse = sse_stream_from_chunks(
                    operation_id, df.columns, chunks
                )
            return QueryResult(
                strategy=plan.strategy.value,
                chunks=iter(chunks),
                columns=df.columns,
                sse=sse,
                operation_id=operation_id,
            )
        finally:
            self.queue.release()


def health_status(service: QueryService) -> dict:
    """Deep health snapshot across the serving stack — queue depth /
    capacity, admission posture, cache stats, open circuits
    (middleware/graph/query_queue.py:545-560 get_stats +
    get_deep_health_status).  The /health endpoint payload."""
    q = service.queue
    with q._lock:
        queue_size = len(q._heap)
        running = q._running
    open_circuits = [
        key
        for key, state in service.circuit_breaker._circuits.items()
        if state.is_open
    ]
    status = "healthy"
    if open_circuits or queue_size >= q.max_queued:
        status = "degraded"
    return {
        "status": status,
        "queue": {
            "queue_size": queue_size,
            "running_queries": running,
            "max_queued": q.max_queued,
            "max_concurrent": q.max_concurrent,
            "capacity_used": queue_size / q.max_queued if q.max_queued else 0.0,
        },
        "admission": {"queue_depth": service.admission.queue_depth},
        "cache": service.cache.stats() if service.cache_enabled else {"enabled": False},
        "circuits": {"open": open_circuits},
        "graph": {
            "graph_id": service.gate.graph_id,
            "category": service.gate.identity.category.value,
            "writable": service.gate.identity.writable,
        },
    }
