"""Cypher gate, param validation, MCP toolkit, backup restore."""

from __future__ import annotations

import pytest

from robosystems_spark.cypher import CypherEngine
from robosystems_spark.queryapi.cypher_gate import CypherGate, CypherGateError
from robosystems_spark.queryapi.params import ParamValidationError, validate_params
from robosystems_spark.queryapi.tools import GraphToolkit
from robosystems_spark.schema.custom import parse_schema
from robosystems_spark.sources.materialize import GraphStore


@pytest.fixture(scope="module")
def gate(spark):
    mk = spark.createDataFrame
    engine = CypherEngine(
        {
            "Person": mk([("p1", "Ada", 35)], ["identifier", "name", "age"]),
            "Company": mk([("c1", "Initech")], ["identifier", "name"]),
            "WORKS_FOR": mk([("p1", "c1")], ["src", "dst"]),
        }
    )
    return CypherGate(engine)


def test_gate_allows_reads_and_calls(gate, spark):
    out = gate.query("MATCH (p:Person) RETURN p.name AS name")
    assert [r["name"] for r in out.collect()] == ["Ada"]
    ver = gate.query("CALL db_version()")
    assert ver.first()["version"].startswith("4.")


def test_gate_blocks_writes_bulk_admin(gate):
    for bad, msg in [
        ("CREATE (n:Person {id: 'x'})", "subgraph"),
        ("COPY Person FROM 'x.parquet'", "staging"),
        ("ATTACH 'other.db' AS o", "Administrative"),
        ("", "non-empty"),
    ]:
        with pytest.raises(CypherGateError, match=msg):
            gate.query(bad)
    with pytest.raises(CypherGateError, match="length"):
        gate.query("MATCH (n:Person) RETURN n //" + "x" * 10_000)


def test_param_validation():
    ok = {"s": "x", "n": 5, "f": 1.5, "b": True, "lst": [1, 2], "obj": {"a": 1}}
    assert validate_params(ok) == ok
    assert validate_params(None) == {}
    with pytest.raises(ParamValidationError, match="string exceeds"):
        validate_params({"s": "x" * 10_001})
    with pytest.raises(ParamValidationError, match="array exceeds"):
        validate_params({"l": list(range(1001))})
    with pytest.raises(ParamValidationError, match="nesting"):
        validate_params({"d": {"a": {"b": {"c": 1}}}})
    with pytest.raises(ParamValidationError, match="object exceeds"):
        validate_params({"o": {str(i): i for i in range(101)}})
    with pytest.raises(ParamValidationError, match="unsupported type"):
        validate_params({"x": object()})


def test_toolkit_describe_and_examples(gate):
    schema = parse_schema(
        {
            "name": "demo",
            "nodes": [
                {"name": "Person", "properties": [
                    {"name": "identifier", "type": "STRING", "is_primary_key": True}]},
                {"name": "Company", "properties": [
                    {"name": "identifier", "type": "STRING", "is_primary_key": True}]},
            ],
            "relationships": [
                {"name": "WORKS_FOR", "from_node": "Person", "to_node": "Company"}
            ],
        }
    )
    tk = GraphToolkit(gate, schema)
    desc = tk.describe_schema()
    assert set(desc["nodes"]) == {"Person", "Company"}
    assert desc["relationships"]["WORKS_FOR"]["from_node"] == "Person"
    assert desc["nodes"]["Person"]["columns"]["age"] == "bigint"

    examples = {e["name"]: e["cypher"] for e in tk.example_queries()}
    assert "label_counts" in examples
    assert "traverse_works_for" in examples
    # generated examples must actually run through the gate
    assert tk.read_cypher(examples["label_counts"])


def test_toolkit_read_cypher_and_discovery(gate):
    rows = tk_rows = GraphToolkit(gate).read_cypher(
        "MATCH (p:Person)-[:WORKS_FOR]->(c:Company) "
        "RETURN p.name AS person, c.name AS company"
    )
    assert tk_rows == [{"person": "Ada", "company": "Initech"}]
    vals = GraphToolkit(gate).distinct_values("Person", "name")
    assert vals == ["Ada"]
    with pytest.raises(KeyError):
        GraphToolkit(gate).distinct_values("Ghost", "name")


def test_backup_restore_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    store = GraphStore(spark, str(tmp_path / "g"), "kg")
    store.copy_into("T", spark.createDataFrame([("a", 1), ("b", 2)], ["identifier", "v"]))
    store.export(str(tmp_path / "backup"))
    store.delete_where("T", F.lit(True))
    assert store.read("T").count() == 0
    restored = store.restore(str(tmp_path / "backup"))
    assert restored == ["T"]
    assert store.read("T").count() == 2


@pytest.fixture(scope="module")
def xbrl_gate(spark):
    """A roboledger-shaped graph for the element/fact discovery tools."""
    mk = spark.createDataFrame
    engine = CypherEngine(
        {
            "Element": mk(
                [("el1", "Revenues", "revenue"), ("el2", "Assets", "asset")],
                ["identifier", "name", "classification"],
            ),
            "Fact": mk(
                [("f1", "100", 100.0), ("f2", "50", 50.0), ("f3", "7", 7.0)],
                ["identifier", "value", "numeric_value"],
            ),
            "Period": mk(
                [("pd1", "2023-01-01", "2023-12-31", None),
                 ("pd2", "2024-01-01", "2024-12-31", None)],
                "identifier string, start_date string, end_date string, instant string",
            ),
            "FACT_HAS_ELEMENT": mk(
                [("f1", "el1"), ("f2", "el1"), ("f3", "el2")], ["src", "dst"]
            ),
            "FACT_HAS_PERIOD": mk(
                [("f1", "pd1"), ("f2", "pd2"), ("f3", "pd1")], ["src", "dst"]
            ),
        }
    )
    return CypherGate(engine)


def test_toolkit_describe_structure(xbrl_gate):
    text = GraphToolkit(xbrl_gate).describe_structure()
    assert "2 Element nodes" in text
    assert "3 Fact nodes" in text
    assert "3 FACT_HAS_ELEMENT relationships" in text
    assert "financial reporting" in text


def test_toolkit_discover_properties(gate):
    props = GraphToolkit(gate).discover_properties("Person")
    by_name = {p["name"]: p for p in props}
    assert by_name["age"]["type"] == "bigint"
    assert by_name["name"]["examples"] == ["Ada"]
    with pytest.raises(KeyError):
        GraphToolkit(gate).discover_properties("Nope")


def test_toolkit_discover_common_elements(xbrl_gate):
    tk = GraphToolkit(xbrl_gate)
    ranked = tk.discover_common_elements()
    # Revenues referenced by 2 facts, Assets by 1
    assert [(e["name"], e["n_facts"]) for e in ranked] == [
        ("Revenues", 2), ("Assets", 1)
    ]
    assert [e["name"] for e in tk.discover_common_elements(pattern="rev")] == [
        "Revenues"
    ]


def test_toolkit_discover_facts_and_grid(xbrl_gate):
    tk = GraphToolkit(xbrl_gate)
    facts = tk.discover_facts(element_name="Revenues")
    assert len(facts) == 2
    assert {f["period_end_date"] for f in facts} == {"2023-12-31", "2024-12-31"}

    grid = tk.fact_grid()
    by_elem = {g["element_name"]: g for g in grid}
    assert by_elem["Revenues"]["2023-12-31"] == 100.0
    assert by_elem["Revenues"]["2024-12-31"] == 50.0
    assert by_elem["Assets"]["2023-12-31"] == 7.0


def test_data_toolkit_ingest_query_materialize(spark, tmp_path):
    """The data_tools suite end-to-end: ingest-file -> query-staging ->
    materialize-graph -> list-workspaces/map-elements."""
    import json

    from robosystems_spark.queryapi.tools import DataToolkit
    from robosystems_spark.sources.subgraphs import SubgraphService

    src = tmp_path / "accounts.csv"
    src.write_text("identifier,name,balance\na1,Cash,100.5\na2,AR,20.0\n")

    store = GraphStore(spark, str(tmp_path / "g"), "kg0123456789abcdef")
    engine = CypherEngine(
        {"Entity": spark.createDataFrame([("e1",)], ["identifier"])}
    )
    tk = DataToolkit(
        CypherGate(engine),
        store=store,
        staging_root=str(tmp_path / "staging"),
        subgraphs=SubgraphService(spark, str(tmp_path / "g")),
    )

    staged = tk.ingest_file(str(src), "Account")
    assert staged["status"] == "staged" and not staged["is_relationship"]

    rows = tk.query_staging("SELECT name, balance FROM Account ORDER BY name")
    assert [(r["name"], r["balance"]) for r in rows] == [("AR", 20.0), ("Cash", 100.5)]

    out = tk.materialize_graph("Account")
    assert out["rows_loaded"] == 2
    assert store.read("Account").count() == 2

    mapping = tk.map_elements(["uri:cash", "uri:ar"], "us-gaap:Assets")
    assert len(mapping.associations) == 2
    assert mapping.associations[0].target_element == "us-gaap:Assets"
    assert json.dumps([a.__dict__ for a in mapping.associations])  # serializable

    assert tk.list_workspaces("kg0123456789abcdef") == []

    # ingest straight to graph
    src2 = tmp_path / "more.csv"
    src2.write_text("identifier,name,balance\na3,AP,-5.0\n")
    out2 = tk.ingest_file(str(src2), "Account2", ingest_to_graph=True)
    assert out2["status"] == "materialized" and out2["rows_loaded"] == 1


def test_toolkit_profile_table(gate):
    tk = GraphToolkit(gate)
    rows = tk.profile_table("Person")
    by_col = {r["column"]: r for r in rows}
    assert set(by_col) == set(gate.engine.tables["Person"].columns)
    assert all(r["n_rows"] == rows[0]["n_rows"] for r in rows)
    assert all(r["n_null"] >= 0 and r["n_distinct"] >= 1 for r in rows)
    with pytest.raises(KeyError):
        tk.profile_table("NoSuchTable")


def test_workspace_tools_create_switch_query_delete(spark, tmp_path):
    """MCP workspace tool parity (reference middleware/mcp/tools/
    workspace.py): create-workspace -> switch-workspace -> query in
    the workspace (read-write by subgraph identity) -> materialize
    into the workspace only -> delete-workspace (data guard + active-
    workspace switch-back)."""
    from robosystems_spark.queryapi.tools import DataToolkit
    from robosystems_spark.sources.subgraphs import SubgraphError, SubgraphService

    root = str(tmp_path / "g")
    parent_id = "kg0123456789abcdef"
    store = GraphStore(spark, root, parent_id)
    store.copy_into(
        "Account",
        spark.createDataFrame(
            [("a1", "Cash", 100.5), ("a2", "AR", 20.0)],
            ["identifier", "name", "balance"],
        ),
        primary_keys=["identifier"],
    )
    engine = CypherEngine({"Account": store.read("Account")})
    tk = DataToolkit(
        CypherGate(engine, graph_id=parent_id),
        store=store,
        staging_root=str(tmp_path / "staging"),
        subgraphs=SubgraphService(spark, root),
    )
    assert tk.active_workspace == "primary"

    # name gate (reference: alnum, 1-20 chars)
    with pytest.raises(SubgraphError):
        tk.create_workspace("bad-name")

    out = tk.create_workspace("dev", fork_parent=True)
    assert out["success"] and out["workspace_id"] == f"{parent_id}_dev"
    assert [w["subgraph_id"] for w in tk.list_workspaces()] == [f"{parent_id}_dev"]

    # switch: gate + store rebind to the workspace
    sw = tk.switch_workspace(f"{parent_id}_dev")
    assert sw["active_workspace"] == f"{parent_id}_dev"
    assert tk.active_workspace == f"{parent_id}_dev"
    rows = tk.read_cypher(
        "MATCH (a:Account) RETURN a.name AS name ORDER BY name"
    )
    assert [r["name"] for r in rows] == ["AR", "Cash"]

    # ingest lands in the WORKSPACE store, not the parent
    src = tmp_path / "ws.csv"
    src.write_text("identifier,name,balance\na3,AP,-5.0\n")
    tk.ingest_file(str(src), "Account2", ingest_to_graph=True)
    ws_store = GraphStore(spark, root, f"{parent_id}_dev")
    assert ws_store.read("Account2").count() == 1
    assert "Account2" not in store.tables()

    # switch to a workspace of ANOTHER graph is refused
    with pytest.raises(SubgraphError):
        tk.switch_workspace("kg000000000000dead_dev")

    # delete guard: forked workspace has data -> force required
    with pytest.raises(SubgraphError):
        tk.delete_workspace(f"{parent_id}_dev")
    # deleting the ACTIVE workspace switches back to primary first
    out = tk.delete_workspace(f"{parent_id}_dev", force=True)
    assert out["success"] and out["deleted"] == f"{parent_id}_dev"
    assert tk.active_workspace == "primary"
    assert tk.gate.graph_id == parent_id
    assert tk.list_workspaces() == []
    # parent data untouched
    assert store.read("Account").count() == 2

    # switch back to primary is idempotent
    assert tk.switch_workspace("primary")["active_workspace"] == "primary"


def test_workspace_unforked_create_then_match(spark, tmp_path):
    """A FRESH workspace (fork_parent=False, the create default) has
    zero tables: switching in must not die deriving a SparkSession
    from a nonexistent table (ADVICE r7: bare StopIteration at
    cypher_gate), the first CREATE must populate it, and MATCH on the
    same gate must see the write immediately (post-write refresh)."""
    from robosystems_spark.queryapi.tools import DataToolkit
    from robosystems_spark.sources.subgraphs import SubgraphService

    root = str(tmp_path / "g")
    parent_id = "kg0123456789abcdef"
    store = GraphStore(spark, root, parent_id)
    store.copy_into(
        "Account",
        spark.createDataFrame([("a1", "Cash", 100.5)], ["identifier", "name", "balance"]),
        primary_keys=["identifier"],
    )
    engine = CypherEngine({"Account": store.read("Account")})
    tk = DataToolkit(
        CypherGate(engine, graph_id=parent_id),
        store=store,
        staging_root=str(tmp_path / "staging"),
        subgraphs=SubgraphService(spark, root),
    )

    tk.create_workspace("scratch")  # fork_parent defaults to False
    ws_id = f"{parent_id}_scratch"
    assert tk.switch_workspace(ws_id)["active_workspace"] == ws_id
    assert tk.gate.engine.tables == {}

    # write-then-read round trip on the empty workspace
    tk.gate.query("CREATE (n:Note {identifier: 'n1', body: 'hello'})")
    rows = tk.read_cypher("MATCH (n:Note) RETURN n.body AS body")
    assert [r["body"] for r in rows] == ["hello"]

    tk.delete_workspace(ws_id, force=True)
    assert tk.active_workspace == "primary"
