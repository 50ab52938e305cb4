"""Inbound graph DDL (SURVEY §2.11 M5, both directions).

The reference parses CREATE NODE/REL TABLE statements into schema
objects (schemas/parser.py:22-128) and bootstraps databases with
them (graph_api/core/ladybug/manager.py:605-618).  These tests run
the reference's VERBATIM bootstrap statements through our parser and
apply them to a GraphStore, then verify the declared schema survives
the first real COPY (typed empty table -> bucketed layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from robosystems_spark.schema.ddl import (
    DDLError,
    apply_graph_ddl,
    parse_graph_ddl,
    parse_statement,
)
from robosystems_spark.schema.models import Node, Relationship
from robosystems_spark.sources.materialize import GraphStore

# graph_api/core/ladybug/manager.py:605-618, verbatim
FALLBACK_DDL = [
    """CREATE NODE TABLE IF NOT EXISTS Entity(
          identifier STRING,
          name STRING,
          PRIMARY KEY (identifier)
      )""",
    """CREATE NODE TABLE IF NOT EXISTS User(
          identifier STRING,
          name STRING,
          PRIMARY KEY (identifier)
      )""",
    "CREATE REL TABLE IF NOT EXISTS HAS_USER(FROM Entity TO User)",
]


def test_parse_verbatim_fallback_schema():
    schema = parse_graph_ddl(";\n".join(FALLBACK_DDL))
    assert {n.name for n in schema.nodes} == {"Entity", "User"}
    assert schema.node("Entity").primary_keys() == ["identifier"]
    (rel,) = schema.relationships
    assert (rel.name, rel.from_node, rel.to_node) == ("HAS_USER", "Entity", "User")


def test_parse_statement_shapes():
    # schemas/parser.py:25-26 doc shapes
    node = parse_statement(
        "CREATE NODE TABLE Customer(name STRING, sector STRING, PRIMARY KEY(name))"
    )
    assert isinstance(node, Node)
    assert [p.name for p in node.properties] == ["name", "sector"]
    assert node.primary_keys() == ["name"]

    order = parse_statement(
        "CREATE NODE TABLE Order(id INT64, amount DOUBLE, PRIMARY KEY(id))"
    )
    assert order.to_struct_type()["id"].dataType == T.LongType()
    assert order.to_struct_type()["amount"].dataType == T.DoubleType()

    rel = parse_statement(
        "CREATE REL TABLE HAS_ORDER(FROM Customer TO Order, since DATE)"
    )
    assert isinstance(rel, Relationship)
    assert rel.properties[0].type == "DATE"

    assert parse_statement("CREATE DATABASE kg123") is None
    assert parse_statement("DROP TABLE IF EXISTS Customer") == {"drop": "Customer"}


def test_parse_nested_types_and_errors():
    node = parse_statement(
        "CREATE NODE TABLE Doc(identifier STRING, tags LIST(STRING), "
        "meta MAP(STRING, STRING), PRIMARY KEY(identifier))"
    )
    st = node.to_struct_type()
    assert isinstance(st["tags"].dataType, T.ArrayType)
    assert isinstance(st["meta"].dataType, T.MapType)

    with pytest.raises(DDLError, match="PRIMARY KEY"):
        parse_statement("CREATE NODE TABLE Bad(name STRING)")
    with pytest.raises(DDLError, match="not declared"):
        parse_statement("CREATE NODE TABLE Bad(name STRING, PRIMARY KEY(nope))")
    with pytest.raises(DDLError, match="FROM"):
        parse_statement("CREATE REL TABLE Bad(name STRING)")
    with pytest.raises(DDLError, match="Unknown type"):
        parse_statement("CREATE NODE TABLE Bad(x WIDGET, PRIMARY KEY(x))")


def test_apply_ddl_then_copy_keeps_types_and_buckets(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"), "kg0123456789abcdef")
    stats = apply_graph_ddl(
        store,
        "CREATE NODE TABLE Account(identifier STRING, balance DOUBLE, "
        "opened DATE, PRIMARY KEY(identifier));\n"
        "CREATE REL TABLE OWNS(FROM Entity TO Account)",
    )
    assert stats["tables_created"] == 2
    # declared schema visible before any data lands
    schema = store.read("Account").schema
    assert schema["balance"].dataType == T.DoubleType()
    assert store.read("Account").count() == 0

    # IF NOT EXISTS: re-apply is a no-op, not data loss
    again = apply_graph_ddl(
        store,
        "CREATE NODE TABLE Account(identifier STRING, PRIMARY KEY(identifier))",
    )
    assert again["skipped_existing"] == 1

    # first COPY adopts the declared bucket keys AND declared types
    # (balance arrives as int, stored as the declared DOUBLE)
    df = spark.createDataFrame(
        [("a1", 10, "2024-01-01"), ("a2", 20, "2024-01-02")],
        ["identifier", "balance", "opened"],
    )
    store.copy_into("Account", df)
    out = store.read("Account")
    assert out.schema["balance"].dataType == T.DoubleType()
    assert out.count() == 2
    assert store._is_bucketed("Account")

    # second COPY appends into the bucketed layout
    store.copy_into(
        "Account",
        spark.createDataFrame([("a3", 30.0, "2024-01-03")], df.columns),
    )
    assert store.read("Account").count() == 3

    # DROP removes the table
    dropped = apply_graph_ddl(store, "DROP TABLE Account")
    assert dropped["tables_dropped"] == 1
    assert not store.exists("Account")


def test_ddl_roundtrip_from_schema_objects():
    """Our Schema.to_ddl emits Spark SQL; the graph-dialect DDL of the
    same tables parses back to equivalent structures."""
    ddl = (
        "CREATE NODE TABLE IF NOT EXISTS Part(identifier STRING, retail DOUBLE, "
        "PRIMARY KEY(identifier));"
        "CREATE REL TABLE IF NOT EXISTS SUPPLIES(FROM Supplier TO Part, qty INT64)"
    )
    schema = parse_graph_ddl(ddl)
    assert schema.node("Part").primary_keys() == ["identifier"]
    rel = schema.relationship("SUPPLIES")
    assert rel.to_struct_type().fieldNames() == ["src", "dst", "qty"]


def test_gate_routes_ddl_to_store(spark, tmp_path):
    """A writable (subgraph) gate executes DDL against its GraphStore;
    read-only gates refuse — same admission matrix as Cypher writes."""
    from robosystems_spark.cypher import CypherEngine
    from robosystems_spark.queryapi.cypher_gate import CypherGate, CypherGateError

    store = GraphStore(spark, str(tmp_path / "g"), "kg0123456789abcdef_dev")
    engine = CypherEngine(
        {"Entity": spark.createDataFrame([("e1",)], ["identifier"])}
    )
    gate = CypherGate(engine, graph_id="kg0123456789abcdef_dev", store=store)
    out = gate.query(
        "CREATE NODE TABLE IF NOT EXISTS Widget("
        "identifier STRING, weight DOUBLE, PRIMARY KEY(identifier))"
    ).first()
    assert out["tables_created"] == 1
    assert store.exists("Widget")

    read_only = CypherGate(engine, graph_id="kg0123456789abcdef")
    with pytest.raises(CypherGateError, match="not allowed"):
        read_only.query(
            "CREATE NODE TABLE X(identifier STRING, PRIMARY KEY(identifier))"
        )


def test_create_tables_from_schema(spark, tmp_path):
    """TableService.create_tables_from_schema analog: a declared Schema
    materializes as typed empty tables, nodes then relationships."""
    from robosystems_spark.schema.ddl import create_tables_from_schema
    from robosystems_spark.schema.roboledger import full_schema

    store = GraphStore(spark, str(tmp_path / "s"), "kg0123456789abcdef")
    schema = full_schema()
    stats = create_tables_from_schema(store, schema)
    n_tables = len(schema.nodes) + len(schema.relationships)
    assert stats["tables_created"] == n_tables
    assert set(store.tables()) == (
        {n.name for n in schema.nodes} | {r.name for r in schema.relationships}
    )
    # typed and empty
    fact = store.read("Fact")
    assert fact.count() == 0 and "identifier" in fact.columns
    # idempotent
    again = create_tables_from_schema(store, schema)
    assert again["tables_created"] == 0 and again["skipped_existing"] == n_tables
