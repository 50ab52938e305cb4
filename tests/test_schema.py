"""Schema subsystem tests: type mapping, DDL, custom-schema validation.

Models the reference's schema-parser test semantics (SURVEY §5):
valid-type enforcement, reserved names, PK requirement, endpoint
existence with ``*`` wildcard, base+extension composition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from robosystems_spark.schema import Node, Property, Relationship, Schema, spark_type
from robosystems_spark.schema.base import base_schema
from robosystems_spark.schema.custom import (
    SchemaValidationError,
    parse_and_merge_with_base,
    parse_schema,
)
from robosystems_spark.schema.roboledger import full_schema, roboledger_schema


def test_type_mapping():
    assert spark_type("STRING") == T.StringType()
    assert spark_type("INT32") == T.IntegerType()
    assert spark_type("INT128") == T.DecimalType(38, 0)
    assert spark_type("UINT64") == T.DecimalType(20, 0)
    assert spark_type("LIST(INT64)") == T.ArrayType(T.LongType())
    assert spark_type("MAP(STRING, DOUBLE)") == T.MapType(T.StringType(), T.DoubleType())
    with pytest.raises(ValueError):
        spark_type("VARCHAR")


def test_node_struct_and_ddl():
    n = Node(
        "Company",
        [
            Property("identifier", "STRING", is_primary_key=True),
            Property("founded_year", "INT64"),
        ],
    )
    st = n.to_struct_type()
    assert st.fieldNames() == ["identifier", "founded_year"]
    assert not st["identifier"].nullable
    ddl = n.to_ddl(database="kg1")
    assert "CREATE TABLE IF NOT EXISTS kg1.Company" in ddl
    assert "`identifier` string" in ddl


def test_relationship_src_dst():
    r = Relationship("WORKS_FOR", "Person", "Company", [Property("role", "STRING")])
    assert r.to_struct_type().fieldNames() == ["src", "dst", "role"]


def test_custom_schema_happy_path():
    schema = parse_schema(
        {
            "name": "demo",
            "nodes": [
                {
                    "name": "Company",
                    "properties": [
                        {"name": "identifier", "type": "STRING", "is_primary_key": True},
                        {"name": "industry", "type": "STRING"},
                    ],
                },
                {
                    "name": "Person",
                    "properties": [
                        {"name": "identifier", "type": "STRING", "is_primary_key": True}
                    ],
                },
            ],
            "relationships": [
                {"name": "WORKS_FOR", "from_node": "Person", "to_node": "Company"}
            ],
        }
    )
    assert schema.node_names() == {"Company", "Person"}
    assert schema.relationship("WORKS_FOR").to_node == "Company"


@pytest.mark.parametrize(
    "mutation, message",
    [
        (lambda d: d["nodes"][0]["properties"][0].pop("is_primary_key"), "primary key"),
        (lambda d: d["nodes"][0].update(name="AuditLog"), "reserved"),
        (
            lambda d: d["nodes"][0]["properties"].append({"name": "x", "type": "VARCHAR"}),
            "Invalid type",
        ),
        (
            lambda d: d["relationships"].append(
                {"name": "R2", "from_node": "Ghost", "to_node": "Company"}
            ),
            "unknown from_node",
        ),
        (
            lambda d: d["relationships"].append(
                {"name": "SYSTEM_OWNS", "from_node": "Company", "to_node": "Company"}
            ),
            "reserved",
        ),
        (lambda d: d["nodes"].append(dict(d["nodes"][0])), "Duplicate node"),
    ],
)
def test_custom_schema_validation_errors(mutation, message):
    base = {
        "name": "demo",
        "nodes": [
            {
                "name": "Company",
                "properties": [
                    {"name": "identifier", "type": "STRING", "is_primary_key": True}
                ],
            }
        ],
        "relationships": [
            {"name": "SELF", "from_node": "Company", "to_node": "Company"}
        ],
    }
    mutation(base)
    with pytest.raises(SchemaValidationError, match=message):
        parse_schema(base)


def test_wildcard_endpoint_allowed():
    schema = parse_schema(
        {
            "name": "w",
            "nodes": [
                {
                    "name": "Doc",
                    "properties": [
                        {"name": "identifier", "type": "STRING", "is_primary_key": True}
                    ],
                }
            ],
            "relationships": [{"name": "TAGS", "from_node": "Doc", "to_node": "*"}],
        }
    )
    assert schema.relationship("TAGS").to_node == "*"


def test_base_schema_composition():
    base = base_schema()
    assert {"Entity", "Period", "Unit", "Element", "Label", "Reference", "Taxonomy"} <= (
        base.node_names()
    )
    full = full_schema()
    # roboledger adds its 9 nodes and 19 relationships on top of base
    assert {"Report", "Fact", "Transaction", "LineItem"} <= full.node_names()
    assert len(full.relationships) == 7 + 19
    # base wins on name collisions
    led = roboledger_schema()
    merged = base.merge(led)
    assert merged.node("Entity").primary_keys() == ["identifier"]


def test_merge_with_base_via_parser():
    merged = parse_and_merge_with_base(
        {
            "name": "custom1",
            "nodes": [
                {
                    "name": "Widget",
                    "properties": [
                        {"name": "identifier", "type": "STRING", "is_primary_key": True}
                    ],
                }
            ],
            "relationships": [
                {"name": "ENTITY_HAS_WIDGET", "from_node": "Entity", "to_node": "Widget"}
            ],
        }
    )
    assert "Widget" in merged.node_names()
    assert "Entity" in merged.node_names()


def test_schema_ddl_nodes_before_rels():
    ddl = full_schema().to_ddl(database="kg")
    assert ddl.index("Entity") < ddl.index("ENTITY_HAS_REPORT")
