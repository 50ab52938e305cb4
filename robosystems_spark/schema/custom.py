"""Custom-schema parser: JSON / YAML / dict → validated Schema.

Validation semantics match the reference parser
(/root/reference/robosystems/schemas/custom.py:106-327):

- every node needs ``name`` + ``properties`` and >=1 primary key
- every property needs ``name`` + a valid declared type
- relationships need ``name``/``from_node``/``to_node``; endpoints
  must exist in the schema or be the ``*`` wildcard
- reserved system node/relationship names are rejected
- duplicate node/relationship names are rejected
- optionally merged with the base schema (base definitions win)
"""

from __future__ import annotations

import json
from typing import Any

from robosystems_spark.schema.models import Node, Property, Relationship, Schema
from robosystems_spark.schema.types import VALID_TYPES

RESERVED_NODE_NAMES = frozenset(
    {
        "SystemConfig",
        "SchemaVersion",
        "AuditLog",
        "Permission",
        "Role",
        "Session",
        "Lock",
        "Migration",
        "SystemUser",
    }
)

RESERVED_RELATIONSHIP_NAMES = frozenset(
    {
        "SYSTEM_OWNS",
        "SYSTEM_MANAGES",
        "SYSTEM_LOGS",
        "SYSTEM_GRANTS",
        "SYSTEM_DENIES",
        "SYSTEM_MIGRATES",
        "SYSTEM_LOCKS",
    }
)


class SchemaValidationError(ValueError):
    pass


def _parse_property(d: dict[str, Any]) -> Property:
    if "name" not in d:
        raise SchemaValidationError("Property must have a 'name' field")
    if "type" not in d:
        raise SchemaValidationError(f"Property {d['name']!r} must have a 'type' field")
    ptype = str(d["type"]).upper()
    if ptype.split("(")[0] not in VALID_TYPES:
        raise SchemaValidationError(
            f"Invalid type {ptype!r} for property {d['name']!r}; valid: {sorted(VALID_TYPES)}"
        )
    return Property(
        name=d["name"],
        type=ptype,
        is_primary_key=bool(d.get("is_primary_key", False)),
        nullable=bool(d.get("nullable", True)),
    )


def _parse_node(d: dict[str, Any]) -> Node:
    if "name" not in d:
        raise SchemaValidationError("Node must have a 'name' field")
    if d["name"] in RESERVED_NODE_NAMES:
        raise SchemaValidationError(f"Node name {d['name']!r} is reserved for system use")
    if "properties" not in d:
        raise SchemaValidationError(f"Node {d['name']!r} must have 'properties'")
    props = [_parse_property(p) for p in d["properties"]]
    if not any(p.is_primary_key for p in props):
        raise SchemaValidationError(f"Node {d['name']!r} must have at least one primary key")
    return Node(name=d["name"], properties=props, description=d.get("description", ""))


def _parse_relationship(d: dict[str, Any]) -> Relationship:
    for req in ("name", "from_node", "to_node"):
        if req not in d:
            raise SchemaValidationError(f"Relationship must have a {req!r} field")
    if d["name"] in RESERVED_RELATIONSHIP_NAMES:
        raise SchemaValidationError(f"Relationship name {d['name']!r} is reserved for system use")
    props = [_parse_property(p) for p in d.get("properties", [])]
    return Relationship(
        name=d["name"],
        from_node=d["from_node"],
        to_node=d["to_node"],
        properties=props,
        description=d.get("description", ""),
    )


def parse_schema(
    schema_input: str | dict[str, Any], fmt: str = "dict", validate_endpoints: bool = True
) -> Schema:
    """Parse and validate a custom schema from a dict, JSON or YAML string.

    ``validate_endpoints=False`` defers relationship-endpoint checks —
    used when the schema will be composed over the base schema whose
    node types it may reference.
    """
    if fmt == "dict":
        if not isinstance(schema_input, dict):
            raise SchemaValidationError("dict format requires dictionary input")
        data = schema_input
    elif fmt == "json":
        data = json.loads(schema_input)  # type: ignore[arg-type]
    elif fmt == "yaml":
        try:
            import yaml
        except ImportError as e:  # pragma: no cover
            raise SchemaValidationError("YAML support requires pyyaml") from e
        data = yaml.safe_load(schema_input)
    else:
        raise SchemaValidationError(f"Unknown schema format: {fmt!r}")

    schema = Schema(
        name=data.get("name", "custom"),
        version=str(data.get("version", "1.0.0")),
        description=data.get("description", ""),
        nodes=[_parse_node(n) for n in data.get("nodes", [])],
        relationships=[_parse_relationship(r) for r in data.get("relationships", [])],
    )
    validate_schema(schema, check_endpoints=validate_endpoints)
    return schema


def validate_schema(schema: Schema, check_endpoints: bool = True) -> None:
    """Whole-schema consistency checks (duplicates, endpoint existence)."""
    node_names = [n.name for n in schema.nodes]
    dupes = {x for x in node_names if node_names.count(x) > 1}
    if dupes:
        raise SchemaValidationError(f"Duplicate node names: {dupes}")
    rel_names = [r.name for r in schema.relationships]
    dupes = {x for x in rel_names if rel_names.count(x) > 1}
    if dupes:
        raise SchemaValidationError(f"Duplicate relationship names: {dupes}")
    if not check_endpoints:
        return
    names = set(node_names)
    for rel in schema.relationships:
        if rel.from_node != "*" and rel.from_node not in names:
            raise SchemaValidationError(
                f"Relationship {rel.name!r} references unknown from_node {rel.from_node!r}"
            )
        if rel.to_node != "*" and rel.to_node not in names:
            raise SchemaValidationError(
                f"Relationship {rel.name!r} references unknown to_node {rel.to_node!r}"
            )


def parse_and_merge_with_base(schema_input: str | dict[str, Any], fmt: str = "dict") -> Schema:
    """Parse a custom schema and compose it over the base schema
    (custom extensions of built-in node types keep base definitions)."""
    from robosystems_spark.schema.base import base_schema

    custom = parse_schema(schema_input, fmt, validate_endpoints=False)
    merged = base_schema().merge(custom)
    merged.name = custom.name
    validate_schema(merged)
    return merged
