"""Queue, system procedures, extension-schema composition, UPDATE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.queryapi.procedures import ProcedureError, execute_call, is_call
from robosystems_spark.schema.extensions import EXTENSIONS, load_schema
from robosystems_spark.serving.queue import (
    QueryQueue,
    QueueFullError,
    UserQuotaError,
)
from robosystems_spark.sources.materialize import GraphStore


def test_queue_priority_and_quota():
    q = QueryQueue(max_queued=5, max_concurrent=2, max_per_user=2)
    q.submit("free-job", "u1", tier="free")
    q.submit("ent-job", "u2", tier="enterprise")
    q.submit("std-job", "u3", tier="standard")
    assert q.acquire() == "ent-job"  # highest tier first
    assert q.acquire() == "std-job"
    assert q.acquire() is None  # concurrency cap (2) reached
    q.release()
    assert q.acquire() == "free-job"
    # per-user quota
    q2 = QueryQueue(max_per_user=1)
    q2.submit("a", "u1")
    with pytest.raises(UserQuotaError):
        q2.submit("b", "u1")
    # queue bound
    q3 = QueryQueue(max_queued=1)
    q3.submit("a", "u1")
    with pytest.raises(QueueFullError):
        q3.submit("b", "u2")


def test_queue_fifo_within_tier():
    q = QueryQueue()
    q.submit("first", "u1", tier="standard")
    q.submit("second", "u2", tier="standard")
    assert q.acquire() == "first"
    assert q.acquire() == "second"


def test_procedures(spark):
    spark.createDataFrame([(1,)], ["x"]).createOrReplaceTempView("proc_test_table")
    assert is_call("CALL show_tables()")
    assert is_call("CALL timeout=5000")
    assert not is_call("MATCH (n) RETURN n")

    tables = [r["name"] for r in execute_call(spark, "CALL show_tables()").collect()]
    assert "proc_test_table" in tables

    info = execute_call(spark, "CALL table_info('proc_test_table')").collect()
    assert info[0]["name"] == "x" and info[0]["type"] == "bigint"

    ver = execute_call(spark, "CALL db_version()").first()["version"]
    assert ver.startswith("4.")

    out = execute_call(spark, "CALL timeout=2500").first()
    assert out["timeout_ms"] == 2500
    assert spark.conf.get("robosystems.query.timeout_ms") == "2500"

    with pytest.raises(ProcedureError):
        execute_call(spark, "CALL drop_everything()")


def test_extension_schemas_compose():
    for name in EXTENSIONS:
        schema = load_schema([name])
        assert "Entity" in schema.node_names()  # base present
        # every non-wildcard endpoint resolves
        for rel in schema.relationships:
            for end in (rel.from_node, rel.to_node):
                assert end == "*" or end in schema.node_names(), (
                    f"{name}.{rel.name} endpoint {end}"
                )
    combo = load_schema(["roboledger", "roboinvestor"])
    assert {"Fact", "Portfolio"} <= combo.node_names()
    with pytest.raises(KeyError):
        load_schema(["nope"])


def test_update_where(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"), "kg")
    store.copy_into(
        "T", spark.createDataFrame([("a", 1, "old"), ("b", 2, "old")], ["identifier", "v", "s"])
    )
    n = store.update_where("T", F.col("identifier") == "a", {"s": "new", "v": F.col("v") + 10})
    assert n == 1
    rows = {r["identifier"]: (r["v"], r["s"]) for r in store.read("T").collect()}
    assert rows == {"a": (11, "new"), "b": (2, "old")}


def test_background_task_progress_and_result(spark):
    from robosystems_spark.serving.tasks import BackgroundTaskRunner, TaskState

    runner = BackgroundTaskRunner()

    def ingest(progress):
        progress(0.2, "staging")
        n = spark.range(0, 1000).count()
        progress(0.8, "materializing")
        return n

    tid = runner.submit(ingest)
    info = runner.wait(tid, timeout_s=60)
    assert info.state == TaskState.COMPLETED
    assert info.result == 1000
    assert info.progress == 1.0
    msgs = [e.get("message") for e in info.events if e["type"] == "progress"]
    assert msgs == ["staging", "materializing"]


def test_background_task_failure_surfaces():
    from robosystems_spark.serving.tasks import BackgroundTaskRunner, TaskState

    runner = BackgroundTaskRunner()

    def boom(progress):
        raise RuntimeError("ingest exploded")

    info = runner.wait(runner.submit(boom), timeout_s=30)
    assert info.state == TaskState.FAILED
    assert "ingest exploded" in info.error


def test_strategy_selection():
    from robosystems_spark.queryapi.strategies import (
        ClientCapabilities,
        Strategy,
        select_strategy,
    )

    assert select_strategy("MATCH (n) RETURN n LIMIT 10").strategy == Strategy.JSON_IMMEDIATE
    assert select_strategy("MATCH (n) RETURN n LIMIT 500").strategy == Strategy.JSON_COMPLETE
    big = "MATCH (n) RETURN n"
    # unbounded result + no streaming capability: NDJSON anyway
    # (reference strategies.py:279-285)
    assert select_strategy(big).strategy == Strategy.NDJSON_STREAMING
    assert (
        select_strategy(big, ClientCapabilities(accepts_ndjson=True)).strategy
        == Strategy.NDJSON_STREAMING
    )
    assert (
        select_strategy(big, ClientCapabilities(accepts_sse=True)).strategy
        == Strategy.SSE_STREAMING
    )
    plan = select_strategy("MATCH (a)-[*1..3]->(b) RETURN a")
    assert plan.strategy == Strategy.QUEUED and plan.timeout_mode == "queued"
    assert select_strategy(big, ClientCapabilities(is_test_client=True)).timeout_mode == "testing"


def test_strategy_matrix_overrides_and_load():
    from robosystems_spark.queryapi.strategies import (
        ClientCapabilities,
        Strategy,
        SystemState,
        select_strategy,
    )

    q = "MATCH (n) RETURN n LIMIT 500"
    # mode overrides win over everything (strategies.py:197-213)
    assert select_strategy(q, mode_override="sync").strategy == Strategy.SYNC_TESTING
    assert (
        select_strategy(q, mode_override="async").strategy
        == Strategy.TRADITIONAL_QUEUE
    )
    assert (
        select_strategy(
            q, ClientCapabilities(accepts_sse=True), mode_override="stream"
        ).strategy
        == Strategy.SSE_STREAMING
    )
    assert (
        select_strategy(q, mode_override="stream").strategy
        == Strategy.NDJSON_STREAMING
    )
    # interactive clients get sync regardless of size (217-228)
    assert (
        select_strategy(
            "MATCH (n) RETURN n", ClientCapabilities(is_test_client=True)
        ).strategy
        == Strategy.SYNC_TESTING
    )
    # loaded system queues; SSE-capable clients get queue+stream (241-248)
    loaded = SystemState(queue_size=3)
    assert (
        select_strategy(q, ClientCapabilities(accepts_sse=True), system=loaded).strategy
        == Strategy.SSE_QUEUE_STREAM
    )
    assert (
        select_strategy(q, system=loaded).strategy == Strategy.TRADITIONAL_QUEUE
    )
    # async-preferring clients skip the SSE queue-stream
    assert (
        select_strategy(
            q,
            ClientCapabilities(accepts_sse=True, prefers_async=True),
            system=loaded,
        ).strategy
        == Strategy.TRADITIONAL_QUEUE
    )
    # writes never stream (235-239)
    assert (
        select_strategy(q, ClientCapabilities(accepts_sse=True), is_write=True).strategy
        == Strategy.JSON_COMPLETE
    )
    assert (
        select_strategy(q, system=loaded, is_write=True).strategy
        == Strategy.TRADITIONAL_QUEUE
    )
    # medium + stream preference honors capability (257-265)
    assert (
        select_strategy(
            q, ClientCapabilities(accepts_ndjson=True, prefers_stream=True)
        ).strategy
        == Strategy.NDJSON_STREAMING
    )


def test_client_detection_headers():
    from robosystems_spark.queryapi.strategies import detect_client

    c = detect_client(
        {
            "Accept": "text/event-stream",
            "User-Agent": "Mozilla/5.0 Chrome/120",
            "Prefer": "respond-async, wait=30",
        }
    )
    assert c.accepts_sse and not c.accepts_ndjson
    assert c.is_browser and not c.is_test_client
    assert c.prefers_async and c.prefers_wait and c.wait_time == 30

    tool = detect_client({"user-agent": "PostmanRuntime/7.36", "accept": "*/*"})
    assert tool.is_test_client
    nd = detect_client({"accept": "application/x-ndjson"})
    assert nd.accepts_ndjson and not nd.accepts_sse
    # swagger-referred browser is interactive
    sw = detect_client(
        {
            "user-agent": "Mozilla/5.0 Firefox",
            "referer": "https://host/swagger/index.html",
        }
    )
    assert sw.is_test_client


def test_sse_event_framing(spark):
    from robosystems_spark.serving.sse import EventType, sse_events

    df = spark.createDataFrame([(i, f"n{i}") for i in range(25)], ["id", "name"])
    events = list(sse_events(df.orderBy("id"), "op-1", chunk_size=10))
    kinds = [e.event_type for e in events]
    assert kinds[0] == EventType.OPERATION_STARTED
    assert kinds[-1] == EventType.OPERATION_COMPLETED
    data_chunks = [e for e in events if e.event_type == EventType.DATA_CHUNK]
    assert [e.data["row_count"] for e in data_chunks] == [10, 10, 5]
    assert data_chunks[-1].data["total_rows_sent"] == 25
    assert events[-1].data == {
        "status": "completed",
        "total_rows": 25,
        "total_chunks": 3,
    }
    # sequence numbers are contiguous; wire format is SSE-correct
    assert [e.sequence_number for e in events] == list(range(len(events)))
    wire = events[0].to_sse_format()
    assert wire.startswith("event: operation_started\ndata: {")
    assert wire.endswith("\n\n")
    import json as _json

    payload = _json.loads(wire.split("data: ", 1)[1])
    assert payload["operation_id"] == "op-1" and payload["columns"] == ["id", "name"]


def test_sse_keepalive_between_slow_chunks(spark):
    from robosystems_spark.serving.sse import EventType, sse_events

    df = spark.createDataFrame([(i,) for i in range(30)], ["id"])
    # fake clock: every chunk appears to take 31 simulated seconds
    t = {"now": 0.0}

    def clock():
        t["now"] += 31.0
        return t["now"]

    events = list(
        sse_events(df, "op-2", chunk_size=10, keepalive_interval_s=30.0, clock=clock)
    )
    kinds = [e.event_type for e in events]
    assert EventType.KEEPALIVE in kinds
    # a keepalive precedes every data chunk under the slow clock
    for i, k in enumerate(kinds):
        if k == EventType.DATA_CHUNK:
            assert kinds[i - 1] == EventType.KEEPALIVE


def test_service_sse_strategy_end_to_end(spark):
    from robosystems_spark.cypher import CypherEngine
    from robosystems_spark.queryapi.cypher_gate import CypherGate
    from robosystems_spark.queryapi.strategies import ClientCapabilities
    from robosystems_spark.serving.service import QueryService

    engine = CypherEngine(
        {
            "Person": spark.createDataFrame(
                [(f"p{i}", f"name{i}") for i in range(25)], ["identifier", "name"]
            )
        }
    )
    svc = QueryService(CypherGate(engine), endpoint_timeout_s=120)
    res = svc.execute(
        "MATCH (p:Person) RETURN p.name AS name",  # unbounded -> large
        client=ClientCapabilities(accepts_sse=True),
        chunk_size=10,  # MIN_CHUNK_SIZE clamp floor
    )
    assert res.strategy == "sse_streaming"
    frames = list(res.sse)
    assert frames[0].startswith("event: operation_started\n")
    assert frames[-1].startswith("event: operation_completed\n")
    assert sum(1 for f in frames if f.startswith("event: data_chunk\n")) == 3
    # headers drive detection the same way
    res2 = svc.execute(
        "MATCH (p:Person) RETURN p.name AS name",
        headers={"accept": "application/x-ndjson"},
    )
    assert res2.strategy == "ndjson_streaming" and res2.sse is None


def test_query_cache_ttl_and_lru():
    from robosystems_spark.serving.cache import QueryCache, cache_key

    t = {"now": 0.0}
    c = QueryCache(max_entries=2, ttl_s=10.0, clock=lambda: t["now"])
    k1 = cache_key("sec", "MATCH (n) RETURN n", None)
    k2 = cache_key("sec", "MATCH (n) RETURN n", {"x": 1})
    assert k1 != k2  # params are part of the key
    c.put(k1, ["a"], [[{"a": 1}]])
    assert c.get(k1).chunks == [[{"a": 1}]]
    # TTL expiry
    t["now"] = 11.0
    assert c.get(k1) is None
    # LRU eviction at capacity
    t["now"] = 0.0
    c.put(k1, ["a"], [[{"a": 1}]])
    c.put(k2, ["a"], [[{"a": 2}]])
    c.get(k1)  # touch k1 so k2 is LRU
    c.put(cache_key("sec", "q3", None), ["a"], [[{"a": 3}]])
    assert c.get(k2) is None and c.get(k1) is not None
    assert c.stats()["entries"] == 2


def test_service_caches_shared_repository_results(spark):
    from robosystems_spark.cypher import CypherEngine
    from robosystems_spark.queryapi.cypher_gate import CypherGate
    from robosystems_spark.serving.service import QueryService

    engine = CypherEngine(
        {"Person": spark.createDataFrame([("p1", "a")], ["identifier", "name"])}
    )
    # shared repo graph id -> routing enables caching
    svc = QueryService(CypherGate(engine, graph_id="sec"), endpoint_timeout_s=120)
    assert svc.cache_enabled
    q = "MATCH (p:Person) RETURN p.name AS n ORDER BY p.name LIMIT 10"
    first = svc.execute(q)
    assert first.strategy != "cached"
    chunks1 = list(first.chunks)
    second = svc.execute(q)
    assert second.strategy == "cached"
    assert list(second.chunks) == chunks1
    # different params / query miss
    third = svc.execute("MATCH (p:Person) RETURN p.identifier AS i LIMIT 10")
    assert third.strategy != "cached"

    # user graphs do not cache
    user_svc = QueryService(
        CypherGate(engine, graph_id="kg0123456789abcdef"), endpoint_timeout_s=120
    )
    assert not user_svc.cache_enabled
    user_svc.execute(q)
    assert user_svc.execute(q).strategy != "cached"


def test_circuit_breaker_lifecycle():
    from robosystems_spark.serving.robustness import CircuitBreaker, CircuitOpenError

    t = {"now": 0.0}
    cb = CircuitBreaker(failure_threshold=3, recovery_timeout=60.0, clock=lambda: t["now"])
    cb.check("kg1")  # closed: fine
    for _ in range(3):
        cb.record_failure("kg1")
    assert cb.is_open("kg1")
    with pytest.raises(CircuitOpenError):
        cb.check("kg1")
    # other graphs unaffected
    cb.check("kg2")
    # recovery timeout -> half-open probe allowed
    t["now"] = 61.0
    cb.check("kg1")
    # probe fails -> re-opens immediately (threshold-1 + 1)
    cb.record_failure("kg1")
    assert cb.is_open("kg1")
    # next probe succeeds -> closed
    t["now"] = 122.0
    cb.check("kg1")
    cb.record_success("kg1")
    assert not cb.is_open("kg1")
    cb.check("kg1")


def test_sliding_window_rate_limiter():
    from robosystems_spark.serving.robustness import (
        RateLimitExceeded,
        SlidingWindowRateLimiter,
    )

    t = {"now": 0.0}
    rl = SlidingWindowRateLimiter(
        tier_limits={"free": 2, "premium": 5}, window_s=60.0, clock=lambda: t["now"]
    )
    assert rl.check("u1", tier="free")["remaining"] == 1
    assert rl.check("u1", tier="free")["remaining"] == 0
    with pytest.raises(RateLimitExceeded):
        rl.check("u1", tier="free")
    # another user unaffected; higher tier has its own limit
    assert rl.check("u2", tier="premium")["limit"] == 5
    # window slides: old requests expire
    t["now"] = 61.0
    assert rl.check("u1", tier="free")["allowed"]


def test_service_rate_limit_and_breaker_reject(spark):
    from robosystems_spark.cypher import CypherEngine
    from robosystems_spark.queryapi.cypher_gate import CypherGate
    from robosystems_spark.serving.robustness import (
        CircuitBreaker,
        SlidingWindowRateLimiter,
    )
    from robosystems_spark.serving.service import QueryService, ServiceRejected

    engine = CypherEngine(
        {"Person": spark.createDataFrame([("p1", "a")], ["identifier", "name"])}
    )
    svc = QueryService(
        CypherGate(engine),
        endpoint_timeout_s=120,
        rate_limiter=SlidingWindowRateLimiter(tier_limits={"standard": 1}),
        circuit_breaker=CircuitBreaker(failure_threshold=1),
    )
    q = "MATCH (p:Person) RETURN p.name AS n"
    svc.execute(q, user_id="u9")
    with pytest.raises(ServiceRejected, match="Rate limit"):
        svc.execute(q, user_id="u9")
    # breaker: one failure opens (threshold=1); next call rejected
    with pytest.raises(Exception):
        svc.execute("MATCH (p:Nope) RETURN p.x AS x", user_id="u10")
    with pytest.raises(ServiceRejected, match="Circuit open"):
        svc.execute(q, user_id="u11")


def test_with_retry_backoff_and_give_up():
    from robosystems_spark.serving.robustness import with_retry

    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise TimeoutError("transient")
        return "ok"

    out = with_retry(flaky, max_attempts=5, base_delay=1.0, seed=1, sleep=delays.append)
    assert out == "ok" and calls["n"] == 3
    assert len(delays) == 2 and delays[1] > delays[0] * 1.2  # exponential

    def always():
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        with_retry(always, max_attempts=2, sleep=delays.append)
    # non-retryable errors pass straight through
    with pytest.raises(KeyError):
        with_retry(lambda: (_ for _ in ()).throw(KeyError("x")), retry_on=(TimeoutError,), sleep=delays.append)


def test_graph_metrics_collection(spark, tmp_path):
    """GraphMetricsService analog: counts by label/type, EXACT on-disk
    bytes (not the reference's node*100 estimate), health verdict."""
    from robosystems_spark.serving.metrics import collect_metrics, usage_summary
    from robosystems_spark.sources.materialize import GraphStore

    store = GraphStore(spark, str(tmp_path / "m"), "kg0123456789abcdef")
    store.copy_into(
        "Entity",
        spark.createDataFrame([("e1", "A"), ("e2", "B")], ["identifier", "name"]),
        primary_keys=["identifier"],
    )
    store.copy_into(
        "HAS_USER",
        spark.createDataFrame([("e1", "u1")], ["src", "dst"]),
        primary_keys=["src", "dst"],
    )
    m = collect_metrics(store)
    assert m["node_counts_by_label"] == {"Entity": 2}
    assert m["relationship_counts_by_type"] == {"HAS_USER": 1}
    assert m["total_nodes"] == 2 and m["total_relationships"] == 1
    assert m["size"]["size_bytes"] > 0 and m["size"]["method"] == "filesystem"
    assert m["health"]["status"] == "healthy"

    s = usage_summary([store])
    assert s["graph_count"] == 1 and s["total_nodes"] == 2
    assert s["unhealthy_graphs"] == []
