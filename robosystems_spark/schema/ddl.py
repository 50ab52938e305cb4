"""Inbound graph DDL: ``CREATE NODE TABLE`` / ``CREATE REL TABLE``.

The reference accepts its graph engine's DDL dialect both as schema
declarations (/root/reference/robosystems/schemas/parser.py:22-128)
and as live statements against a database
(graph_api/core/ladybug/manager.py table bootstrap).  This module is
the Spark-side analog: parse the dialect into our
:class:`~robosystems_spark.schema.models.Schema` dataclasses, and
apply it to a :class:`GraphStore` by materializing empty, correctly
typed tables (zero-row parquet keeps the schema readable before the
first COPY).

Statement shapes::

    CREATE NODE TABLE [IF NOT EXISTS] Name(col TYPE, ..., PRIMARY KEY (col[, ...]));
    CREATE REL TABLE  [IF NOT EXISTS] Name(FROM A TO B[, prop TYPE ...]);
    CREATE DATABASE name;   -- no-op here: a GraphStore IS a database
    DROP TABLE [IF EXISTS] Name;
"""

from __future__ import annotations

import re

from robosystems_spark.schema.models import Node, Property, Relationship, Schema
from robosystems_spark.schema.types import is_valid_type


class DDLError(ValueError):
    pass


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(NODE|REL)\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*$",
    re.IGNORECASE,
)
_DATABASE_RE = re.compile(
    r"^\s*(CREATE|DROP)\s+DATABASE\b.*$", re.IGNORECASE | re.DOTALL
)
_INDEX_RE = re.compile(
    r"^\s*CREATE\s+INDEX\s+([A-Za-z_][A-Za-z0-9_]*)\s+"
    r"(?:ON\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\)"
    r"|FOR\s*\(\s*\w+\s*:\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*ON\s*\(([^)]*)\))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+"
    r"(?:ADD\s+(?:COLUMN\s+)?([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)(?:\s+DEFAULT\s+(.+))?"
    r"|DROP\s+(?:COLUMN\s+)?([A-Za-z_][A-Za-z0-9_]*))\s*$",
    re.IGNORECASE | re.DOTALL,
)
_FROM_TO_RE = re.compile(
    r"^FROM\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)$",
    re.IGNORECASE,
)
_PK_RE = re.compile(r"^PRIMARY\s+KEY\s*\((.*)\)$", re.IGNORECASE | re.DOTALL)


def split_statements(script: str) -> list[str]:
    """Split a DDL script on top-level semicolons (none appear inside
    the dialect's parens-free string positions)."""
    return [s.strip() for s in script.split(";") if s.strip()]


def _split_top_level(body: str) -> list[str]:
    """Split a table body on commas outside parentheses — PRIMARY
    KEY(a, b) and LIST(INT64) keep their internal commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _parse_column(entry: str) -> Property:
    m = re.match(
        r"^([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)(?:\s+DEFAULT\s+.+)?$",
        entry,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise DDLError(f"Cannot parse column definition: {entry!r}")
    name, type_name = m.group(1), m.group(2).strip()
    # inline constraints (the API-doc dialect: ``cik STRING PRIMARY
    # KEY``, ``name STRING NOT NULL``)
    is_pk, nullable = False, True
    while True:
        lowered = type_name.upper()
        if lowered.endswith("PRIMARY KEY"):
            type_name = type_name[: -len("PRIMARY KEY")].strip()
            is_pk = True
        elif lowered.endswith("NOT NULL"):
            type_name = type_name[: -len("NOT NULL")].strip()
            nullable = False
        elif lowered.endswith("UNIQUE"):
            type_name = type_name[: -len("UNIQUE")].strip()
        else:
            break
    if not is_valid_type(type_name):
        raise DDLError(f"Unknown type {type_name!r} for column {name!r}")
    return Property(
        name=name, type=type_name.upper(), is_primary_key=is_pk, nullable=nullable
    )


def parse_statement(stmt: str) -> "Node | Relationship | dict | None":
    """One statement → Node, Relationship, a ``{'drop': name}`` action,
    or None for database-level statements we subsume."""
    if _DATABASE_RE.match(stmt):
        return None
    drop = _DROP_RE.match(stmt)
    if drop:
        return {"drop": drop.group(1)}
    alter = _ALTER_RE.match(stmt)
    if alter:
        table = alter.group(1)
        if alter.group(5):
            return {"alter_drop": table, "column": alter.group(5)}
        col, type_name = alter.group(2), alter.group(3).strip()
        if alter.group(4) is not None:
            raise DDLError(
                "ALTER TABLE ADD COLUMN ... DEFAULT is not supported: the "
                "add is metadata-only (no rewrite), so existing rows read "
                "NULL; backfill with an UPDATE if a default is needed"
            )
        if not is_valid_type(type_name):
            raise DDLError(f"Unknown type {type_name!r} in ALTER TABLE {table}")
        return {"alter_add": table, "column": col, "type": type_name.upper()}
    idx = _INDEX_RE.match(stmt)
    if idx:
        # advisory: Spark has no secondary indexes — the PK-hash bucket
        # layout (materialize.py) is the physical lookup structure.
        # Both dialects accepted: ON Table(col) and FOR (n:Label) ON (n.prop)
        table = idx.group(2) or idx.group(4)
        cols = [
            c.strip().split(".")[-1]
            for c in (idx.group(3) or idx.group(5)).split(",")
        ]
        return {"index": idx.group(1), "table": table, "columns": cols}
    m = _CREATE_RE.match(stmt)
    if not m:
        raise DDLError(f"Unrecognized DDL statement: {stmt[:80]!r}")
    kind, name, body = m.group(1).upper(), m.group(2), m.group(3)
    entries = _split_top_level(body)

    if kind == "NODE":
        props: list[Property] = []
        pks: list[str] = []
        for entry in entries:
            pk = _PK_RE.match(entry)
            if pk:
                pks.extend(c.strip() for c in pk.group(1).split(","))
                continue
            props.append(_parse_column(entry))
        declared = {p.name for p in props}
        for k in pks:
            if k not in declared:
                raise DDLError(f"PRIMARY KEY column {k!r} not declared in {name}")
        for p in props:
            p.is_primary_key = p.is_primary_key or p.name in pks
        if not any(p.is_primary_key for p in props):
            raise DDLError(f"Node table {name} needs a PRIMARY KEY")
        return Node(name=name, properties=props)

    if not entries:
        raise DDLError(f"Rel table {name} needs FROM ... TO ...")
    ft = _FROM_TO_RE.match(entries[0])
    if not ft:
        raise DDLError(f"Rel table {name} must start with FROM ... TO ...")
    props = [_parse_column(e) for e in entries[1:]]
    return Relationship(
        name=name, from_node=ft.group(1), to_node=ft.group(2), properties=props
    )


def parse_graph_ddl(script: str, name: str = "parsed") -> Schema:
    """A full DDL script → Schema (DROPs are rejected here; use
    :func:`apply_graph_ddl` for imperative scripts)."""
    schema = Schema(name=name)
    for stmt in split_statements(script):
        parsed = parse_statement(stmt)
        if parsed is None:
            continue
        if isinstance(parsed, dict):
            if "index" in parsed:
                continue  # advisory; no schema content
            raise DDLError(
                "DROP/ALTER TABLE is not part of a schema declaration"
            )
        if isinstance(parsed, Node):
            schema.nodes.append(parsed)
        else:
            schema.relationships.append(parsed)
    return schema


def create_tables_from_schema(store, schema: Schema) -> dict:
    """Materialize every node/relationship table of a declared Schema
    as typed empty tables (the reference's TableService.
    create_tables_from_schema, operations/graph/table_service.py:41-139
    — nodes first, relationships after, IF-NOT-EXISTS semantics)."""
    stats = {"tables_created": 0, "skipped_existing": 0}
    for node in schema.nodes:
        if store.exists(node.name):
            stats["skipped_existing"] += 1
            continue
        store.create_table(
            node.name, node.to_struct_type(), primary_keys=node.primary_keys()
        )
        stats["tables_created"] += 1
    for rel in schema.relationships:
        if store.exists(rel.name):
            stats["skipped_existing"] += 1
            continue
        store.create_table(
            rel.name, rel.to_struct_type(), primary_keys=["src", "dst"]
        )
        stats["tables_created"] += 1
    return stats


def apply_graph_ddl(store, script: str) -> dict:
    """Execute a DDL script against a GraphStore.

    CREATE materializes a zero-row parquet table with the declared
    StructType (IF NOT EXISTS semantics: existing tables are left
    alone — the reference uses the same guard to prevent data loss,
    schemas/models.py:87).  DROP removes the table directory.
    ALTER TABLE ADD/DROP COLUMN applies metadata-only schema evolution
    (the reference's DDL surface, security/cypher_analyzer.py:62-72)."""
    stats = {
        "tables_created": 0,
        "tables_dropped": 0,
        "skipped_existing": 0,
        "indexes_declared": 0,
        "columns_added": 0,
        "columns_dropped": 0,
    }
    for stmt in split_statements(script):
        parsed = parse_statement(stmt)
        if parsed is None:
            continue
        if isinstance(parsed, dict):
            if "index" in parsed:
                stats["indexes_declared"] += 1
            elif "alter_add" in parsed:
                store.alter_add_column(
                    parsed["alter_add"], parsed["column"], parsed["type"]
                )
                stats["columns_added"] += 1
            elif "alter_drop" in parsed:
                store.alter_drop_column(parsed["alter_drop"], parsed["column"])
                stats["columns_dropped"] += 1
            elif store.exists(parsed["drop"]):
                store.drop_table(parsed["drop"])
                stats["tables_dropped"] += 1
            continue
        if store.exists(parsed.name):
            stats["skipped_existing"] += 1
            continue
        if isinstance(parsed, Node):
            keys = parsed.primary_keys()
        else:
            keys = ["src", "dst"]
        store.create_table(parsed.name, parsed.to_struct_type(), primary_keys=keys)
        stats["tables_created"] += 1
    return stats
