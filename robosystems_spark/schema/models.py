"""Node / Relationship / Schema dataclasses.

Semantics match the reference dataclasses
(/root/reference/robosystems/schemas/models.py:25-127): a Node is a
named entity type with typed properties and >=1 primary key; a
Relationship is a named edge type with fixed FROM/TO node types and
optional properties; a Schema is a named, versioned collection.

Instead of Cypher DDL, these emit Spark artifacts:
- ``to_struct_type()`` — the StructType for the table
- ``to_ddl()``        — ``CREATE TABLE IF NOT EXISTS`` Spark SQL
Relationship tables store ``(src, dst, ...props)`` exactly as the
reference's staging layer renames ``from``/``to``
(/root/reference/robosystems/graph_api/core/duckdb/manager.py:124-135).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from robosystems_spark.schema.types import spark_type


@dataclass
class Property:
    name: str
    type: str = "STRING"
    is_primary_key: bool = False
    nullable: bool = True

    def to_struct_field(self) -> T.StructField:
        return T.StructField(
            self.name, spark_type(self.type), nullable=self.nullable and not self.is_primary_key
        )


@dataclass
class Node:
    name: str
    properties: list[Property] = field(default_factory=list)
    description: str = ""

    def primary_keys(self) -> list[str]:
        return [p.name for p in self.properties if p.is_primary_key]

    def to_struct_type(self) -> T.StructType:
        return T.StructType([p.to_struct_field() for p in self.properties])

    def to_ddl(self, database: str | None = None, location: str | None = None) -> str:
        qualified = f"{database}.{self.name}" if database else self.name
        cols = ", ".join(
            f"`{p.name}` {p.to_struct_field().dataType.simpleString()}" for p in self.properties
        )
        loc = f" LOCATION '{location}'" if location else ""
        return f"CREATE TABLE IF NOT EXISTS {qualified} ({cols}) USING PARQUET{loc}"


@dataclass
class Relationship:
    name: str
    from_node: str
    to_node: str
    properties: list[Property] = field(default_factory=list)
    description: str = ""

    def to_struct_type(self) -> T.StructType:
        fields = [
            T.StructField("src", T.StringType(), nullable=False),
            T.StructField("dst", T.StringType(), nullable=False),
        ]
        fields.extend(p.to_struct_field() for p in self.properties)
        return T.StructType(fields)

    def to_ddl(self, database: str | None = None, location: str | None = None) -> str:
        qualified = f"{database}.{self.name}" if database else self.name
        cols = ["`src` string", "`dst` string"]
        cols.extend(
            f"`{p.name}` {p.to_struct_field().dataType.simpleString()}" for p in self.properties
        )
        loc = f" LOCATION '{location}'" if location else ""
        return f"CREATE TABLE IF NOT EXISTS {qualified} ({', '.join(cols)}) USING PARQUET{loc}"


@dataclass
class Schema:
    """Named, versioned collection of node + relationship tables."""

    name: str
    version: str = "1.0.0"
    description: str = ""
    nodes: list[Node] = field(default_factory=list)
    relationships: list[Relationship] = field(default_factory=list)

    def node(self, name: str) -> Node:
        for n in self.nodes:
            if n.name == name:
                return n
        raise KeyError(name)

    def relationship(self, name: str) -> Relationship:
        for r in self.relationships:
            if r.name == name:
                return r
        raise KeyError(name)

    def node_names(self) -> set[str]:
        return {n.name for n in self.nodes}

    def to_ddl(self, database: str | None = None) -> str:
        """Full DDL script, nodes before relationships (the reference's
        load-ordering rule, materialize.py:334-343)."""
        stmts = [n.to_ddl(database) for n in self.nodes]
        stmts += [r.to_ddl(database) for r in self.relationships]
        return ";\n".join(stmts)

    def merge(self, other: "Schema") -> "Schema":
        """Compose with an extension; same-name tables keep the first
        definition (base wins), matching loader composition semantics
        (/root/reference/robosystems/schemas/loader.py:22-108)."""
        have_n = self.node_names()
        have_r = {r.name for r in self.relationships}
        return Schema(
            name=self.name,
            version=self.version,
            description=self.description,
            nodes=self.nodes + [n for n in other.nodes if n.name not in have_n],
            relationships=self.relationships
            + [r for r in other.relationships if r.name not in have_r],
        )


def conform_to_schema(df, struct_type: T.StructType):
    """Project a frame onto a schema table's column set: missing
    properties become typed NULLs, present ones are cast — the
    XBRLSchemaAdapter's ``process_dataframe_for_schema`` role
    (/root/reference/robosystems/adapters/sec/processors/schema.py)
    as one column projection."""
    from pyspark.sql import functions as F

    cols = []
    for f in struct_type.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
