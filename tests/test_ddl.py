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


# -- ALTER TABLE ADD/DROP COLUMN (reference DDL surface,
#    security/cypher_analyzer.py:62-72) --------------------------------------


def _alter_store(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "a"), "kg0123456789abcdef")
    apply_graph_ddl(
        store,
        "CREATE NODE TABLE Acct(id INT64, name STRING, PRIMARY KEY(id))",
    )
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, name string"
    )
    store.copy_into("Acct", df)
    return store


def test_alter_add_column_metadata_only(spark, tmp_path):
    store = _alter_store(spark, tmp_path)
    pre_version = store.version("Acct")
    stats = apply_graph_ddl(store, "ALTER TABLE Acct ADD COLUMN balance DOUBLE")
    assert stats["columns_added"] == 1
    out = store.read("Acct")
    assert out.schema["balance"].dataType == T.DoubleType()
    # existing rows read NULL for the new column — no data rewrite happened
    rows = {r["id"]: r["balance"] for r in out.collect()}
    assert rows == {1: None, 2: None, 3: None}
    # time travel to the pre-alter version shows the pre-alter schema
    old = store.read("Acct", version=pre_version)
    assert "balance" not in old.columns
    # subsequent appends can supply the column; old files still read NULL
    store.copy_into(
        "Acct",
        spark.createDataFrame([(4, "delta", 9.5)], "id long, name string, balance double"),
    )
    rows = {r["id"]: r["balance"] for r in store.read("Acct").collect()}
    assert rows == {1: None, 2: None, 3: None, 4: 9.5}
    # SET on the new column goes through update_where
    from pyspark.sql import functions as F

    n = store.update_where("Acct", F.col("id") == 2, {"balance": F.lit(1.25)})
    assert n == 1
    rows = {r["id"]: r["balance"] for r in store.read("Acct").collect()}
    assert rows[2] == 1.25 and rows[1] is None and rows[4] == 9.5


def test_alter_drop_column_and_guards(spark, tmp_path):
    store = _alter_store(spark, tmp_path)
    apply_graph_ddl(store, "ALTER TABLE Acct DROP COLUMN name")
    out = store.read("Acct")
    assert set(out.columns) == {"id"}
    assert out.count() == 3
    # bucket/primary key cannot be dropped
    with pytest.raises(ValueError, match="bucket/primary key"):
        store.alter_drop_column("Acct", "id")
    # duplicate add rejected; unknown drop rejected
    with pytest.raises(ValueError, match="already exists"):
        store.alter_add_column("Acct", "id", "INT64")
    with pytest.raises(ValueError, match="does not exist"):
        store.alter_drop_column("Acct", "nope")
    # DEFAULT is explicitly unsupported (metadata-only add)
    with pytest.raises(DDLError, match="DEFAULT"):
        apply_graph_ddl(store, "ALTER TABLE Acct ADD COLUMN x INT64 DEFAULT 5")


def test_alter_drop_then_readd_purges_old_bytes(spark, tmp_path):
    """Re-adding a previously dropped name must NOT resurrect the old
    column's bytes (files are purged first, as their own commit)."""
    store = _alter_store(spark, tmp_path)
    store.alter_drop_column("Acct", "name")
    store.alter_add_column("Acct", "name", "INT64")  # different type too
    rows = {r["id"]: r["name"] for r in store.read("Acct").collect()}
    assert rows == {1: None, 2: None, 3: None}
    ops = [rec["op"] for rec in store.history("Acct")]
    assert "purge_dropped_column" in ops and "alter_add_column" in ops


def test_alter_on_unbucketed_table(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "u"), "kg0123456789abcdef")
    store.copy_into(
        "Plain", spark.createDataFrame([(1,), (2,)], "v long")
    )  # no primary keys -> unbucketed
    store.alter_add_column("Plain", "tag", "STRING")
    assert {r["tag"] for r in store.read("Plain").collect()} == {None}
    store.alter_drop_column("Plain", "tag")
    assert set(store.read("Plain").columns) == {"v"}
