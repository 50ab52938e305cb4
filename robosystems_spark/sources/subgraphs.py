"""Subgraph lifecycle: create / fork / list / inspect / delete.

Re-expresses /root/reference/robosystems/operations/graph/
subgraph_service.py:37-896 minus its IAM/Postgres bookkeeping: a
subgraph is a full database named ``{parent_id}_{name}`` living next
to its parent, carrying the parent's schema extensions, optionally
forked from the parent's data (fork_parent), inspectable
(table/row stats, :744-785) and deletable as a unit (:418-525).

Metadata the reference keeps in Postgres (type, description,
created_at, extensions) lives in a ``.subgraph.json`` file in the
subgraph's directory — same role, no external store.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

from robosystems_spark.queryapi.graph_identity import (
    construct_subgraph_id,
    identify_graph,
    parse_graph_id,
)
from robosystems_spark.sources.materialize import GraphStore


class SubgraphError(ValueError):
    pass


class SubgraphService:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _meta_path(self, subgraph_id: str) -> str:
        return os.path.join(self.root, subgraph_id, ".subgraph.json")

    def create_subgraph(
        self,
        parent_graph_id: str,
        name: str,
        description: str | None = None,
        subgraph_type: str = "static",
        schema_extensions: list[str] | None = None,
        fork_parent: bool = False,
        fork_tables: list[str] | None = None,
        metadata: dict | None = None,
    ) -> dict:
        """Create ``{parent}_{name}`` (subgraph_service.py:248-417):
        validate both halves of the id, refuse duplicates, record
        schema extensions + metadata, optionally fork parent tables
        (nodes before relationships — GraphStore.fork preserves that
        ordering by copying the caller-given table list)."""
        subgraph_id = construct_subgraph_id(parent_graph_id, name)
        if os.path.exists(os.path.join(self.root, subgraph_id)):
            raise SubgraphError(f"Subgraph {subgraph_id} already exists")
        parent = GraphStore(self.spark, self.root, parent_graph_id)

        if fork_parent:
            parent.fork(subgraph_id, tables=fork_tables)
        store = GraphStore(self.spark, self.root, subgraph_id)

        from datetime import datetime, timezone

        meta = {
            "subgraph_id": subgraph_id,
            "parent_graph_id": parent_graph_id,
            "name": name,
            "description": description,
            "subgraph_type": subgraph_type,
            "schema_extensions": list(schema_extensions or []),
            "forked_from_parent": bool(fork_parent),
            "created_at": datetime.now(timezone.utc).isoformat(),
            **({"metadata": metadata} if metadata else {}),
        }
        with open(self._meta_path(subgraph_id), "w") as fh:
            json.dump(meta, fh)
        return {**meta, "tables": store.tables()}

    def list_subgraphs(self, parent_graph_id: str) -> list[str]:
        """All subgraph ids under a parent (subgraph_service.py:526-585)."""
        if not os.path.isdir(self.root):
            return []
        out = []
        for d in sorted(os.listdir(self.root)):
            parent, sub = parse_graph_id(d)
            if sub is not None and parent == parent_graph_id:
                out.append(d)
        return out

    def get_subgraph_info(self, subgraph_id: str) -> dict:
        """Metadata + per-table row counts (subgraph_service.py:
        586-648, _get_database_stats :744-785)."""
        if not identify_graph(subgraph_id).is_subgraph:
            raise SubgraphError(f"{subgraph_id!r} is not a subgraph id")
        path = os.path.join(self.root, subgraph_id)
        if not os.path.exists(path):
            raise SubgraphError(f"Subgraph {subgraph_id} does not exist")
        try:
            with open(self._meta_path(subgraph_id)) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            meta = {"subgraph_id": subgraph_id}
        store = GraphStore(self.spark, self.root, subgraph_id)
        tables = store.tables()
        meta["tables"] = {t: store.read(t).count() for t in tables}
        meta["has_data"] = any(n > 0 for n in meta["tables"].values())
        return meta

    def delete_subgraph(self, subgraph_id: str) -> dict:
        """Drop the whole subgraph database (subgraph_service.py:
        418-525).  Refuses non-subgraph ids — a parent graph can never
        be deleted through this path (the reference's guard)."""
        if not identify_graph(subgraph_id).is_subgraph:
            raise SubgraphError(
                f"{subgraph_id!r} is not a subgraph id; refusing to delete"
            )
        path = os.path.join(self.root, subgraph_id)
        if not os.path.exists(path):
            raise SubgraphError(f"Subgraph {subgraph_id} does not exist")
        n_tables = len(GraphStore(self.spark, self.root, subgraph_id).tables())
        shutil.rmtree(path)
        return {"deleted": subgraph_id, "tables_dropped": n_tables}
