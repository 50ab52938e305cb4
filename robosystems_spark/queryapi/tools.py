"""MCP-style tool surface: the discovery/query tools exposed to agents.

Re-expresses the reference's MCP toolkit
(/root/reference/robosystems/middleware/mcp/tools/manager.py:53-64):
describe-schema, example-queries, read-only cypher, plus the
fact/element discovery helpers — each returning plain Python
structures an agent/LLM layer can serialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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

    # -- profile-table ------------------------------------------------------
    def profile_table(self, label: str) -> list[dict]:
        """Per-column profile of a graph table (null count, exact
        distinct, min/max) — the SUMMARIZE-style data-quality tool an
        agent calls before trusting a column; one aggregation pass
        (operators/profile.py)."""
        from robosystems_spark.operators.profile import table_profile

        if label not in self.gate.engine.tables:
            raise KeyError(f"Unknown table {label!r}")
        return [
            r.asDict()
            for r in table_profile(self.gate.engine.tables[label]).collect()
        ]

    # -- describe-graph-structure ------------------------------------------
    def describe_structure(self) -> str:
        """Natural-language structure summary (the reference's
        describe-graph-structure tool, structure_tool.py:20-50): node
        and relationship counts with a capability line.  One count job
        per table — counts are metadata-cheap on parquet."""
        tables = self.gate.engine.tables
        node_counts, rel_counts = {}, {}
        for name, df in tables.items():
            n = df.count()
            if {"src", "dst"} <= set(df.columns):
                rel_counts[name] = n
            else:
                node_counts[name] = n
        lines = ["This graph database contains:"]
        for name in sorted(node_counts):
            lines.append(f"- {node_counts[name]:,} {name} nodes")
        for name in sorted(rel_counts):
            lines.append(f"- {rel_counts[name]:,} {name} relationships")
        domain = (
            "financial reporting (XBRL elements/facts)"
            if "Element" in node_counts or "Fact" in node_counts
            else "general graph"
        )
        lines.append(f"Domain: {domain}.")
        lines.append(
            "Supports: Cypher pattern queries, aggregation rollups, "
            "path traversal, and the discovery tools in this toolkit."
        )
        return "\n".join(lines)

    # -- discover-properties -----------------------------------------------
    def discover_properties(self, label: str, sample: int = 3) -> list[dict]:
        """Column inventory with sampled values for one label
        (properties_tool.py contract: name, type, examples)."""
        if label not in self.gate.engine.tables:
            raise KeyError(f"Unknown table {label!r}")
        df = self.gate.engine.tables[label]
        head = df.limit(sample).collect()
        out = []
        for f in df.schema.fields:
            out.append(
                {
                    "name": f.name,
                    "type": f.dataType.simpleString(),
                    "examples": [r[f.name] for r in head],
                }
            )
        return out

    # -- discover-common-elements ------------------------------------------
    def discover_common_elements(
        self, pattern: str | None = None, limit: int = 20
    ) -> list[dict]:
        """Most-used elements (elements_tool.py: discover-common-
        elements): Element rows ranked by referencing-fact count when
        FACT_HAS_ELEMENT is present, alphabetical otherwise."""
        tables = self.gate.engine.tables
        if "Element" not in tables:
            raise KeyError("No Element table in this graph")
        elems = tables["Element"]
        if pattern:
            elems = elems.filter(F.lower(F.col("name")).contains(pattern.lower()))
        if "FACT_HAS_ELEMENT" in tables:
            usage = (
                tables["FACT_HAS_ELEMENT"]
                .groupBy(F.col("dst").alias("identifier"))
                .agg(F.count(F.lit(1)).alias("n_facts"))
            )
            ranked = (
                elems.join(usage, "identifier", "left")
                .withColumn("n_facts", F.coalesce("n_facts", F.lit(0)))
                .orderBy(F.desc("n_facts"), F.asc("name"))
            )
        else:
            ranked = elems.withColumn("n_facts", F.lit(0)).orderBy("name")
        return [r.asDict() for r in ranked.limit(limit).collect()]

    # -- discover-facts ----------------------------------------------------
    def _fact_frame(self, element_name: str | None = None) -> DataFrame:
        """Facts joined to element (+ period when present) — the
        DISTRIBUTED frame behind discover-facts and build-fact-grid;
        nothing is collected here."""
        tables = self.gate.engine.tables
        for required in ("Fact", "Element", "FACT_HAS_ELEMENT"):
            if required not in tables:
                raise KeyError(f"No {required} table in this graph")
        facts = tables["Fact"].alias("f")
        fhe = tables["FACT_HAS_ELEMENT"].alias("fe")
        elems = tables["Element"]
        if element_name:
            elems = elems.filter(F.col("name") == element_name)
        elems = elems.alias("e")
        value_cols = [
            F.col(f"f.{c}").alias(c)
            for c in ("value", "numeric_value")
            if c in tables["Fact"].columns
        ]
        out = (
            facts.join(fhe, F.col("f.identifier") == F.col("fe.src"))
            .join(elems, F.col("fe.dst") == F.col("e.identifier"))
            .select(
                F.col("f.identifier").alias("fact_id"),
                F.col("e.name").alias("element_name"),
                *value_cols,
            )
        )
        tables_have_periods = "FACT_HAS_PERIOD" in tables and "Period" in tables
        if tables_have_periods:
            fhp = tables["FACT_HAS_PERIOD"].alias("fp")
            periods = tables["Period"].alias("p")
            period_cols = [
                F.col(f"p.{c}").alias(f"period_{c}")
                for c in ("start_date", "end_date", "instant")
                if c in tables["Period"].columns
            ]
            out = (
                out.alias("o")
                .join(fhp, F.col("o.fact_id") == F.col("fp.src"), "left")
                .join(periods, F.col("fp.dst") == F.col("p.identifier"), "left")
                .select("o.*", *period_cols)
            )
        return out

    def discover_facts(
        self, element_name: str | None = None, limit: int = 50
    ) -> list[dict]:
        """Facts joined to their element (facts_tool.py: discover-facts
        'Time Series for Element' shape); periods joined in when those
        tables exist."""
        out = self._fact_frame(element_name).orderBy("element_name", "fact_id")
        return [r.asDict() for r in out.limit(limit).collect()]

    # -- build-fact-grid ---------------------------------------------------
    def fact_grid(
        self,
        column_col: str = "period_end_date",
        value_col: str = "numeric_value",
        agg: str = "sum",
        limit: int = 100,
    ) -> list[dict]:
        """Pivoted element x period matrix (data_tools.py:
        build-fact-grid) via views/fact_grid — the pivot runs on the
        distributed fact frame; only the final grid is collected."""
        from robosystems_spark.views.fact_grid import build_fact_grid

        facts = self._fact_frame()
        for needed in (column_col, value_col):
            if needed not in facts.columns:
                raise KeyError(f"Fact frame has no column {needed!r}")
        grid = build_fact_grid(
            facts.withColumn(value_col, F.col(value_col).cast("double")),
            index_col="element_name",
            column_col=column_col,
            value_col=value_col,
            agg=agg,
        )
        return [r.asDict() for r in grid.limit(limit).collect()]


class DataToolkit(GraphToolkit):
    """GraphToolkit + the staging/materialization tools
    (middleware/mcp/tools/data_tools.py: ingest-file, query-staging,
    materialize-graph, map-elements, workspace.py: list-workspaces).

    Wired over the same components the serving layer uses — staging
    parquet tables (sources/staging), the bucket-partitioned
    GraphStore (sources/materialize), the element-mapping views, and
    the SubgraphService."""

    def __init__(
        self,
        gate: CypherGate,
        store=None,
        staging_root: str | None = None,
        subgraphs=None,
        schema=None,
    ):
        super().__init__(gate, schema=schema)
        self.store = store
        self.staging_root = staging_root
        self.subgraphs = subgraphs

    def _require(self, attr: str):
        v = getattr(self, attr)
        if v is None:
            raise RuntimeError(f"This toolkit was built without {attr!r}")
        return v

    # -- ingest-file -------------------------------------------------------
    def ingest_file(
        self, file_path: str, table_name: str, ingest_to_graph: bool = False
    ) -> dict:
        """Stage a file for querying; optionally materialize to the
        graph immediately (data_tools.py ingest-file contract)."""
        from robosystems_spark.sources.staging import stage_files

        staging_root = self._require("staging_root")
        spark = next(iter(self.gate.engine.tables.values())).sparkSession
        staged = stage_files(spark, [file_path], table_name, staging_root)
        out = {
            "table_name": staged.name,
            "is_relationship": staged.is_relationship,
            "columns": staged.columns,
            "status": "staged",
        }
        if ingest_to_graph:
            out.update(self.materialize_graph(table_name))
        return out

    # -- query-staging -----------------------------------------------------
    def query_staging(self, sql: str, limit: int = 100) -> list[dict]:
        """Read-only SQL over staged tables (data_tools.py
        query-staging): every staged table registers as a temp view,
        then the gated SQL endpoint runs the query."""
        import os

        from robosystems_spark.queryapi.sql_gate import SQLGate
        from robosystems_spark.sources.staging import read_staged

        staging_root = self._require("staging_root")
        spark = next(iter(self.gate.engine.tables.values())).sparkSession
        sql_gate = SQLGate(spark)
        if os.path.isdir(staging_root):
            for name in sorted(os.listdir(staging_root)):
                if not name.startswith(("_", ".")):
                    sql_gate.register(name, read_staged(spark, staging_root, name))
        df = sql_gate.query(sql)
        return [r.asDict(recursive=True) for r in df.limit(limit).collect()]

    # -- materialize-graph -------------------------------------------------
    def materialize_graph(self, table_name: str, file_id: str | None = None) -> dict:
        """COPY a staged table into the GraphStore (data_tools.py
        materialize-graph); ``file_id`` restricts to one upload batch
        (a partition-pruned read, not a table scan)."""
        from pyspark.sql import functions as _F

        from robosystems_spark.sources.staging import read_staged

        store = self._require("store")
        staging_root = self._require("staging_root")
        spark = store.spark
        df = read_staged(spark, staging_root, table_name)
        if file_id is not None:
            df = df.filter(_F.col("file_id") == file_id)
        keys = (
            ["src", "dst"]
            if {"src", "dst"} <= set(df.columns)
            else [c for c in ("identifier",) if c in df.columns]
        )
        n = store.copy_into(table_name, df, primary_keys=keys, ignore_errors=True)
        return {"status": "materialized", "table_name": table_name, "rows_loaded": n}

    # -- map-elements ------------------------------------------------------
    def map_elements(
        self,
        source_elements: list[str],
        target_element: str,
        method: str = "sum",
        name: str = "mapping",
    ):
        """Create a mapping structure associating source element URIs
        (chart of accounts) to a target taxonomy element
        (data_tools.py map-elements, creation path).  Returns the
        MappingStructure that apply_element_mapping consumes."""
        from robosystems_spark.views.element_mapping import (
            ElementAssociation,
            MappingStructure,
        )

        return MappingStructure(
            name=name,
            associations=[
                ElementAssociation(
                    target_element=target_element,
                    source_element=src,
                    weight=1.0,
                    aggregation_method=method,
                )
                for src in source_elements
            ],
        )

    # -- list-workspaces ---------------------------------------------------
    def list_workspaces(self, parent_graph_id: str | None = None) -> list[dict]:
        """Subgraph workspaces of a parent graph (workspace.py
        list-workspaces) via the SubgraphService.  Defaults to the
        toolkit's bound graph (the reference lists the client's
        current graph's workspaces)."""
        svc = self._require("subgraphs")
        parent = parent_graph_id or self._primary_graph_id()
        return [
            svc.get_subgraph_info(sid) for sid in svc.list_subgraphs(parent)
        ]

    # -- create-workspace --------------------------------------------------
    def _primary_graph_id(self) -> str:
        """The parent graph this toolkit was built over — switching
        workspaces never changes it (workspace ops always authorize
        against the PRIMARY graph, reference workspace.py:203-214)."""
        return (getattr(self, "_primary_gate", None) or self.gate).graph_id

    @property
    def active_workspace(self) -> str:
        """'primary', or the workspace_id the toolkit is switched to."""
        return (
            self.gate.graph_id
            if getattr(self, "_primary_gate", None) is not None
            else "primary"
        )

    def create_workspace(
        self,
        name: str,
        description: str | None = None,
        fork_parent: bool = False,
        schema_extensions: list[str] | None = None,
    ) -> dict:
        """Create a subgraph workspace under the toolkit's bound graph
        (workspace.py:16-139 create-workspace): alphanumeric 1-20 char
        name, optional parent-data fork.  Returns the workspace_id;
        the workspace is NOT activated — call ``switch_workspace``."""
        from robosystems_spark.sources.subgraphs import SubgraphError

        svc = self._require("subgraphs")
        if not name or not name.isalnum() or len(name) > 20:
            raise SubgraphError(
                "Workspace name must be alphanumeric only, 1-20 characters "
                "(no hyphens, underscores, or special chars)"
            )
        parent = self._primary_graph_id()
        meta = svc.create_subgraph(
            parent,
            name,
            description=description or f"MCP workspace: {name}",
            schema_extensions=schema_extensions,
            fork_parent=fork_parent,
        )
        return {
            "success": True,
            "workspace_id": meta["subgraph_id"],
            "name": name,
            "parent_graph_id": parent,
            "forked_from_parent": bool(fork_parent),
            "message": (
                f"Created workspace {name!r}. "
                "Use switch-workspace to activate it."
            ),
        }

    # -- switch-workspace --------------------------------------------------
    def switch_workspace(self, workspace_id: str) -> dict:
        """Activate a workspace (workspace.py:380-416 switch-workspace
        — client-side in the reference because its client owns the
        connection; HERE the toolkit IS the client, so switching
        rebinds the Cypher gate and the materialization store to the
        workspace): queries run against the workspace's tables under
        the workspace's graph identity (subgraphs are read-WRITE by
        identity), and ingest/materialize land in the workspace.
        ``'primary'`` restores the parent graph binding."""
        from robosystems_spark.queryapi.cypher_gate import CypherGate
        from robosystems_spark.sources.materialize import GraphStore
        from robosystems_spark.sources.subgraphs import SubgraphError

        svc = self._require("subgraphs")
        if workspace_id == "primary":
            if getattr(self, "_primary_gate", None) is not None:
                self.gate = self._primary_gate
                self.store = self._primary_store
                self._primary_gate = None
                self._primary_store = None
            return {"success": True, "active_workspace": "primary"}

        from robosystems_spark.queryapi.graph_identity import parse_graph_id

        parent, sub = parse_graph_id(workspace_id)
        if sub is None or parent != self._primary_graph_id():
            raise SubgraphError(
                f"Workspace {workspace_id} does not belong to graph "
                f"{self._primary_graph_id()}"
            )
        svc.get_subgraph_info(workspace_id)  # existence check (raises)
        ws_store = GraphStore(svc.spark, svc.root, workspace_id)
        engine = type(self.gate.engine)(
            {t: ws_store.read(t) for t in ws_store.tables()}
        )
        if getattr(self, "_primary_gate", None) is None:
            self._primary_gate = self.gate
            self._primary_store = self.store
        self.gate = CypherGate(engine, graph_id=workspace_id, store=ws_store)
        self.store = ws_store
        return {"success": True, "active_workspace": workspace_id}

    # -- delete-workspace --------------------------------------------------
    def delete_workspace(self, workspace_id: str, force: bool = False) -> dict:
        """Drop a workspace (workspace.py:141-295 delete-workspace):
        must belong to the toolkit's bound graph; a workspace that
        still holds data requires ``force=True`` (the reference's
        guard).  Deleting the ACTIVE workspace switches back to
        primary first."""
        from robosystems_spark.queryapi.graph_identity import parse_graph_id
        from robosystems_spark.sources.subgraphs import SubgraphError

        svc = self._require("subgraphs")
        parent, sub = parse_graph_id(workspace_id)
        if sub is None or parent != self._primary_graph_id():
            raise SubgraphError(
                f"Workspace {workspace_id} does not belong to graph "
                f"{self._primary_graph_id()}"
            )
        info = svc.get_subgraph_info(workspace_id)
        if info.get("has_data") and not force:
            raise SubgraphError(
                f"Workspace {workspace_id} contains data; pass force=True "
                "to delete it"
            )
        if self.active_workspace == workspace_id:
            self.switch_workspace("primary")
        out = svc.delete_subgraph(workspace_id)
        return {"success": True, **out}
