"""MCP-style tool surface: the discovery/query tools exposed to agents.

Re-expresses the reference's MCP toolkit
(/root/reference/robosystems/middleware/mcp/tools/manager.py:53-64):
describe-schema, example-queries, read-only cypher, plus the
fact/element discovery helpers — each returning plain Python
structures an agent/LLM layer can serialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from robosystems_spark.queryapi.cypher_gate import CypherGate


class GraphToolkit:
    """Tools over one graph (a tables dict + optional declared Schema)."""

    def __init__(self, gate: CypherGate, schema=None):
        self.gate = gate
        self.schema = schema

    # -- describe-schema ---------------------------------------------------
    def describe_schema(self) -> dict:
        """Table inventory with columns/types; node vs relationship
        detected by shape (identifier vs src/dst)."""
        out: dict[str, dict] = {"nodes": {}, "relationships": {}}
        for name, df in self.gate.engine.tables.items():
            cols = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            if {"src", "dst"} <= set(cols):
                rel_info: dict = {"columns": cols}
                if self.schema is not None:
                    try:
                        rel = self.schema.relationship(name)
                        rel_info["from_node"] = rel.from_node
                        rel_info["to_node"] = rel.to_node
                    except KeyError:
                        pass
                out["relationships"][name] = rel_info
            else:
                out["nodes"][name] = {"columns": cols}
        return out

    # -- example-queries ---------------------------------------------------
    def example_queries(self) -> list[dict]:
        """Generated example queries over the registered tables (the
        example_queries_tool.py pattern: label counts, sampling,
        relationship traversals)."""
        nodes = [n for n, df in self.gate.engine.tables.items()
                 if not {"src", "dst"} <= set(df.columns)]
        rels = [n for n in self.gate.engine.tables if n not in nodes]
        examples: list[dict] = []
        if nodes:
            union = " UNION ALL ".join(
                f"MATCH (n:{label}) RETURN '{label}' AS label, count(n) AS cnt"
                for label in nodes[:5]
            )
            examples.append({"name": "label_counts", "cypher": union})
            examples.append(
                {
                    "name": f"sample_{nodes[0].lower()}",
                    "cypher": f"MATCH (n:{nodes[0]}) RETURN n LIMIT 10",
                }
            )
        if self.schema is not None:
            for rel_name in rels[:3]:
                try:
                    rel = self.schema.relationship(rel_name)
                except KeyError:
                    continue
                if rel.from_node == "*" or rel.to_node == "*":
                    continue
                examples.append(
                    {
                        "name": f"traverse_{rel_name.lower()}",
                        "cypher": (
                            f"MATCH (a:{rel.from_node})-[:{rel_name}]->(b:{rel.to_node}) "
                            "RETURN a, b LIMIT 10"
                        ),
                    }
                )
        return examples

    # -- read-only cypher --------------------------------------------------
    def read_cypher(self, cypher: str, params: dict | None = None, limit: int = 100) -> list[dict]:
        """Execute read-only Cypher, returning row dicts (the MCP
        read-cypher tool contract)."""
        df: DataFrame = self.gate.query(cypher, params)
        return [r.asDict(recursive=True) for r in df.limit(limit).collect()]

    # -- discovery helpers -------------------------------------------------
    def distinct_values(self, label: str, column: str, limit: int = 50) -> list:
        """Element/fact discovery: distinct values of a property
        (elements_tool.py-style discovery)."""
        if label not in self.gate.engine.tables:
            raise KeyError(f"Unknown table {label!r}")
        df = self.gate.engine.tables[label]
        if column not in df.columns:
            raise KeyError(f"Unknown column {column!r} on {label!r}")
        return [
            r[column]
            for r in df.select(column).distinct().orderBy(column).limit(limit).collect()
        ]
