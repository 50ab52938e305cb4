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
    assert select_strategy(big).strategy == Strategy.JSON_COMPLETE
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
