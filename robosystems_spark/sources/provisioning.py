"""Entity-graph provisioning: create an entity with its own new graph.

Re-expresses the reference's EntityGraphService flow
(/root/reference/robosystems/operations/graph/entity_graph_service.py:63-793):

1. generate a time-ordered graph id with entity-name entropy
   (`_generate_graph_id`, :410-430 — ULID-style hex + sha256 slice,
   matching the ``kg[a-f0-9]{16,}`` API grammar),
2. install the base + selected extension schema as typed tables
   (`_install_entity_schema`, :431-480 → ``create_tables_from_schema``),
3. write the initial Entity node row with the reference's field
   semantics (`_generate_entity_data_for_upload`, :498-541), and
4. on any failure, tear the half-provisioned graph down
   (`_cleanup_failed_database`, :767-793).

All storage work goes through GraphStore, so provisioning inherits the
per-table writer locks + commit log.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import secrets
import shutil
import time

from pyspark.sql import SparkSession

from robosystems_spark.queryapi.graph_identity import identify_graph
from robosystems_spark.schema.ddl import create_tables_from_schema
from robosystems_spark.schema.extensions import load_schema
from robosystems_spark.sources.materialize import GraphStore


def generate_graph_id(
    entity_name: str,
    now_ms: int | None = None,
    entropy: str | None = None,
) -> str:
    """Time-ordered graph id: ``kg`` + 12 hex chars of the millisecond
    timestamp (lexicographically time-sortable, the ULID property the
    reference wants for B-tree locality) + 10 hex chars (40 bits) of
    randomness + 4 hex chars of sha256(entity_name) for traceability —
    26 hex chars after the prefix, satisfying ``^kg[a-f0-9]{16,}$``.
    40 bits of entropy per millisecond keeps same-name same-ms
    collisions out of reach (the reference's ULID carries 80)."""
    ms = int(time.time() * 1000) if now_ms is None else now_ms
    rand = secrets.token_hex(5) if entropy is None else entropy
    name_hash = hashlib.sha256(entity_name.encode()).hexdigest()[:4]
    return f"kg{ms:012x}{rand}{name_hash}"


def entity_row(graph_id: str, entity: dict) -> dict:
    """The initial Entity node row (reference field semantics:
    identifier derived from the graph id, default URI, active status,
    parent flag, ISO-UTC timestamps)."""
    now = datetime.datetime.now(datetime.timezone.utc).isoformat()
    name = entity.get("name")
    uri = entity.get("uri") or f"https://example.com/entities#{graph_id}"
    return {
        "identifier": f"entity_{graph_id}",
        "uri": uri,
        "scheme": None,
        "cik": entity.get("cik"),
        "ticker": None,
        "exchange": None,
        "name": name,
        "legal_name": name,
        "industry": None,
        "entity_type": None,
        "sic": entity.get("sic"),
        "sic_description": entity.get("sic_description"),
        "category": entity.get("category"),
        "state_of_incorporation": entity.get("state_of_incorporation"),
        "fiscal_year_end": entity.get("fiscal_year_end"),
        "ein": entity.get("ein"),
        "tax_id": None,
        "lei": None,
        "phone": None,
        "website": entity.get("uri"),
        "status": "active",
        "is_parent": True,
        "parent_entity_id": None,
        "created_at": now,
        "updated_at": now,
    }


class ProvisioningError(RuntimeError):
    """Provisioning failed; the half-built graph has been removed."""


class EntityGraphProvisioner:
    """Create-entity-with-new-graph orchestration over GraphStore."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def provision(
        self,
        entity: dict,
        extensions: list[str] | None = None,
        graph_id: str | None = None,
    ) -> dict:
        if not entity.get("name"):
            raise ValueError("entity['name'] is required")
        gid = graph_id or generate_graph_id(entity["name"])
        identity = identify_graph(gid)  # validates the id grammar
        # Refuse to provision onto an existing graph: proceeding would
        # append a duplicate Entity row on success and — worse — the
        # failure cleanup would rmtree data this call never created.
        # The claim is the atomic exclusive mkdir itself (no
        # exists-then-create window for a racing provisioner).
        try:
            os.makedirs(os.path.join(self.root, gid), exist_ok=False)
        except FileExistsError:
            raise ValueError(f"graph {gid!r} already exists") from None
        store = GraphStore(self.spark, self.root, gid)
        try:
            schema = load_schema(extensions)
            stats = create_tables_from_schema(store, schema)
            struct = schema.node("Entity").to_struct_type()
            row = entity_row(gid, entity)
            df = self.spark.createDataFrame(
                [tuple(row.get(f.name) for f in struct.fields)], struct
            )
            store.copy_into("Entity", df, primary_keys=["identifier"])
        except Exception as e:
            self._cleanup_failed(store)
            raise ProvisioningError(
                f"provisioning graph {gid!r} failed: {e}"
            ) from e
        return {
            "graph_id": gid,
            "entity_id": row["identifier"],
            "is_subgraph": identity.is_subgraph,
            "extensions": list(extensions or []),
            "tables_created": stats["tables_created"],
        }

    def _cleanup_failed(self, store: GraphStore) -> None:
        """Best-effort teardown of a half-provisioned graph (the
        reference's _cleanup_failed_database)."""
        try:
            shutil.rmtree(store.graph_path)
        except OSError:
            pass
