"""Query-gate / analyzer / serving tests, mirroring the reference's
classifier test semantics (tests/graph_api/test_duckdb_manager.py
injection-rejection style + execution_strategies size classes)."""

from __future__ import annotations

import pytest

from robosystems_spark.queryapi import (
    OperationType,
    SQLGate,
    SQLGateError,
    analyze_query_features,
    classify_operation,
)
from robosystems_spark.serving import AdmissionController, TimeoutCascade, iter_chunks
from robosystems_spark.serving.chunking import clamp_chunk_size, ndjson_chunks


@pytest.mark.parametrize(
    "query, expected",
    [
        ("MATCH (n:Entity) RETURN n LIMIT 5", OperationType.READ),
        ("SELECT * FROM lineitem WHERE l_quantity > 5", OperationType.READ),
        ("CREATE (n:Entity {id: 1})", OperationType.WRITE),
        ("MERGE (n:Entity {id: 1}) SET n.x = 2", OperationType.WRITE),
        ("MATCH (n) DETACH DELETE n", OperationType.WRITE),
        ("COPY Entity FROM 'file.parquet'", OperationType.BULK),
        ("ATTACH 'staging.duckdb' AS duck", OperationType.ADMIN),
        ("INSTALL httpfs", OperationType.ADMIN),
        ("CREATE NODE TABLE Entity(id STRING, PRIMARY KEY(id))", OperationType.DDL),
        ("ALTER TABLE Entity ADD COLUMN x STRING", OperationType.DDL),
        # keywords inside strings/comments must NOT change classification
        ("MATCH (n) WHERE n.name = 'DROP TABLE' RETURN n", OperationType.READ),
        ("/* DELETE */ MATCH (n) RETURN n", OperationType.READ),
        ("MATCH (n) // CREATE\nRETURN n", OperationType.READ),
    ],
)
def test_classification(query, expected):
    assert classify_operation(query) == expected


def test_classification_rejects_bad_input():
    with pytest.raises(ValueError):
        classify_operation("")
    with pytest.raises(ValueError, match="maximum length"):
        classify_operation("MATCH (n) RETURN n" + " " * 100_001)


@pytest.mark.parametrize(
    "query, size, expensive",
    [
        ("MATCH (n) RETURN n LIMIT 50", "small", []),
        ("MATCH (n) RETURN n LIMIT 500", "medium", []),
        ("MATCH (n) RETURN n LIMIT 50000", "large", []),
        ("MATCH (n) RETURN count(n)", "small", []),
        ("MATCH (n) RETURN n", "large", []),
        ("MATCH (a)-[*]->(b) RETURN a", "large", ["unbounded_varlength_path"]),
        ("MATCH (a)-[*1..3]->(b) RETURN a", "large", ["bounded_varlength_path"]),
        ("MATCH p=shortestPath((a)-[]->(b)) RETURN p", "large", ["shortest_path"]),
    ],
)
def test_analysis_features(query, size, expensive):
    a = analyze_query_features(query)
    assert a.estimated_size == size
    assert a.expensive_patterns == expensive


def test_sql_gate_read_only(spark):
    gate = SQLGate(spark)
    gate.register("t", spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    assert gate.query("SELECT count(*) AS n FROM t").first()["n"] == 2
    for bad in ("DROP TABLE t", "INSERT INTO t VALUES (3, 'c')", "CREATE TABLE x (i INT)"):
        with pytest.raises(SQLGateError):
            gate.query(bad)


def test_sql_gate_parameter_binding(spark):
    gate = SQLGate(spark)
    gate.register("t", spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    out = gate.query("SELECT v FROM t WHERE id = :id", args={"id": 2}).collect()
    assert [r["v"] for r in out] == ["b"]


def test_chunked_iteration(spark):
    df = spark.range(0, 25).toDF("i")
    chunks = list(iter_chunks(df, chunk_size=10))
    assert [len(c) for c in chunks] == [10, 10, 5]
    assert sorted(r["i"] for c in chunks for r in c) == list(range(25))
    # chunk-size clamping: 10 <= size <= 10000 (execute.py:217-219)
    assert clamp_chunk_size(1) == 10
    assert clamp_chunk_size(999_999) == 10_000
    assert clamp_chunk_size(None) == 1000


def test_ndjson_framing(spark):
    import json

    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    frames = list(ndjson_chunks(df))
    assert len(frames) == 1
    assert json.loads(frames[0].strip()) == {"id": 1, "v": "a"}


def test_admission_controller_sheds_on_queue_pressure():
    ac = AdmissionController(seed=7, max_queue=10)
    assert ac.check().admitted  # idle
    ac.queue_depth = 10  # 100% full -> shed probability 1
    decision = ac.check()
    assert not decision.admitted
    assert decision.reason == "queue_pressure"


def test_timeout_cascade_budgets():
    tc = TimeoutCascade()
    b = tc.budget(600, mode="queued")
    assert (b.endpoint_s, b.queue_s, b.execution_s) == (600, 570, 540)
    b = tc.budget(9999, mode="testing")
    assert b.endpoint_s == 30


def test_timeout_enforcement_cancels_jobs(spark):
    import time

    from pyspark.sql import functions as F

    tc = TimeoutCascade()
    df = spark.range(0, 10_000_000).toDF("i")
    slow = df.select(F.sum(F.expr("sha2(cast(i as string), 256)")).alias("s"))
    t0 = time.time()
    with pytest.raises(Exception):
        with tc.enforce(spark, "timeout-test", 2.0):
            slow.collect()
    assert time.time() - t0 < 60


# ---------------------------------------------------------------------------
# Graph-id semantics: main vs _dev subgraph routing, invalid-id rejection
# (reference middleware/graph/types.py:178-428)
# ---------------------------------------------------------------------------
class TestGraphIdentity:
    def test_parse_and_construct(self):
        from robosystems_spark.queryapi.graph_identity import (
            construct_subgraph_id,
            is_subgraph_id,
            parse_graph_id,
        )

        assert parse_graph_id("kg0123456789abcdef_dev") == ("kg0123456789abcdef", "dev")
        assert parse_graph_id("kg0123456789abcdef") == ("kg0123456789abcdef", None)
        assert parse_graph_id("sec") == ("sec", None)
        assert is_subgraph_id("kg0123456789abcdef_dev")
        assert not is_subgraph_id("kg0123456789abcdef")
        assert not is_subgraph_id("sec")
        assert not is_subgraph_id("tenant1_entity")
        assert not is_subgraph_id("_")
        assert not is_subgraph_id("kg0123456789abcdef_this-has-hyphens")
        assert not is_subgraph_id("kg0123456789abcdef_" + "x" * 21)
        assert (
            construct_subgraph_id("kg0123456789abcdef", "dev")
            == "kg0123456789abcdef_dev"
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            construct_subgraph_id("notakg", "dev")
        with _pytest.raises(ValueError):
            construct_subgraph_id("kg0123456789abcdef", "bad-name!")

    def test_identify_categories(self):
        from robosystems_spark.queryapi.graph_identity import (
            AccessPattern,
            GraphCategory,
            identify_graph,
        )

        main = identify_graph("kg0123456789abcdef")
        assert main.category is GraphCategory.USER and not main.is_subgraph
        assert not main.writable

        dev = identify_graph("kg0123456789abcdef_dev")
        assert dev.is_subgraph and dev.subgraph_name == "dev"
        assert dev.writable

        shared = identify_graph("sec")
        assert shared.category is GraphCategory.SHARED
        assert shared.get_access_pattern() is AccessPattern.READ_ONLY
        assert not shared.writable
        assert shared.get_routing_info()["cluster_type"] == "shared_writer"

        system = identify_graph("metadata")
        assert system.category is GraphCategory.SYSTEM and not system.writable

        import pytest as _pytest

        with _pytest.raises(ValueError, match="Invalid graph id"):
            identify_graph("kg_tooshort")
        with _pytest.raises(ValueError, match="Invalid graph id"):
            identify_graph("KG0123456789ABCDEF")  # uppercase hex rejected

    def test_metadata_overrides_pattern(self):
        from robosystems_spark.queryapi.graph_identity import (
            GraphCategory,
            identify_graph,
        )

        # IAM-lookup seam: a repository flag wins over the kg pattern
        repo = identify_graph(
            "kg0123456789abcdef", {"is_repository": True, "repository_type": "sec"}
        )
        assert repo.category is GraphCategory.SHARED and not repo.writable

    def test_gate_write_routing_matrix(self, spark):
        from robosystems_spark.cypher import CypherEngine
        from robosystems_spark.queryapi.cypher_gate import CypherGate, CypherGateError

        engine = CypherEngine(
            {"Person": spark.createDataFrame([("p1", "a")], ["identifier", "name"])}
        )
        read_q = "MATCH (p:Person) RETURN p.name AS n"
        write_q = "CREATE (p:Person {identifier: 'x'})"

        main = CypherGate(engine, graph_id="kg0123456789abcdef")
        assert main.query(read_q).count() == 1
        import pytest as _pytest

        with _pytest.raises(CypherGateError, match="main graphs"):
            main.query(write_q)

        dev = CypherGate(engine, graph_id="kg0123456789abcdef_dev")
        assert dev.is_subgraph  # write admission derives from the id
        # (the engine executes reads; write compilation is exercised in
        # test_mutations — here we only assert the gate admits/queries)
        assert dev.query(read_q).count() == 1

        shared = CypherGate(engine, graph_id="sec")
        with _pytest.raises(CypherGateError, match="read-only"):
            shared.query(write_q)

        with _pytest.raises(CypherGateError, match="Invalid graph id"):
            CypherGate(engine, graph_id="bogus id!")


def test_call_show_tables_with_return_projection(spark):
    """The MCP client's verbatim table listing
    (middleware/mcp/client.py:376): CALL SHOW_TABLES() RETURN
    id, name, type, comment."""
    from robosystems_spark.queryapi.procedures import execute_call, is_call

    spark.createDataFrame([(1,)], ["x"]).createOrReplaceTempView("mcp_probe_tbl")
    q = "CALL SHOW_TABLES() RETURN id, name, type, comment"
    assert is_call(q)
    out = execute_call(spark, q)
    assert out.columns == ["id", "name", "type", "comment"]
    names = [r["name"] for r in out.collect()]
    assert "mcp_probe_tbl" in names
    # aliased projection
    aliased = execute_call(spark, "CALL show_tables() RETURN name AS table_name")
    assert aliased.columns == ["table_name"]
    spark.catalog.dropTempView("mcp_probe_tbl")


def test_call_table_version_and_history(spark, tmp_path):
    from robosystems_spark.queryapi.procedures import ProcedureError, execute_call
    from robosystems_spark.sources.materialize import GraphStore

    store = GraphStore(spark, str(tmp_path), "kgprochistory000")
    store.copy_into(
        "T",
        spark.createDataFrame([(1, "a")], "identifier long, name string"),
        primary_keys=["identifier"],
    )
    from pyspark.sql import functions as F

    store.delete_where("T", F.col("identifier") == 1)

    v = execute_call(spark, "CALL table_version('T')", store=store).collect()[0]
    assert (v["table"], v["version"]) == ("T", 2)
    hist = execute_call(spark, "CALL table_history('T') RETURN v, op", store=store).collect()
    assert [(h["v"], h["op"]) for h in hist] == [(1, "copy_into"), (2, "delete_where")]

    import pytest as _pytest

    with _pytest.raises(ProcedureError):
        execute_call(spark, "CALL table_version('T')")  # no store bound


def test_call_table_profile(spark):
    from robosystems_spark.queryapi.procedures import ProcedureError, execute_call

    import pytest as _pytest

    spark.createDataFrame(
        [(1, "a"), (2, None)], "k LONG, s STRING"
    ).createOrReplaceTempView("profile_probe_tbl")
    out = execute_call(spark, "CALL table_profile('profile_probe_tbl')")
    rows = {r["column"]: r for r in out.collect()}
    assert rows["s"]["n_null"] == 1 and rows["k"]["n_distinct"] == 2
    # RETURN projection composes like the other procedures.
    proj = execute_call(
        spark,
        "CALL table_profile('profile_probe_tbl') RETURN column AS col, n_null",
    )
    assert proj.columns == ["col", "n_null"]
    with _pytest.raises(ProcedureError, match="table name"):
        execute_call(spark, "CALL table_profile()")
    spark.catalog.dropTempView("profile_probe_tbl")
