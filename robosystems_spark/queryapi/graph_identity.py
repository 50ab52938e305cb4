"""Graph-id semantics: categories, subgraph parsing, access routing.

Re-expresses /root/reference/robosystems/middleware/graph/types.py:
51-147 (category/type/access enums + identity), 178-346 (registry,
id patterns), 353-445 (subgraph parse/construct helpers).  The
reference resolves identity via an IAM database lookup with a
pattern-based fallback; this engine has no IAM store, so the pattern
path IS the resolution (the lookup seam is the optional
``metadata`` argument to :func:`identify_graph`).

ID grammar (types.py:8-17):
- parent graphs:  ``kg`` + >=16 lowercase-hex chars
- subgraphs:      ``{parent_id}_{name}``, name 1-20 alphanumerics
- shared repos:   fixed names (sec, industry, ...), read-only
- system graphs:  system / metadata / config, restricted
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum


class GraphCategory(str, Enum):
    USER = "user"
    SHARED = "shared"
    SYSTEM = "system"


class AccessPattern(str, Enum):
    READ_WRITE = "read_write"
    READ_ONLY = "read_only"
    RESTRICTED = "restricted"


# Shared repository names (types.py:182-191)
SHARED_REPOSITORIES = (
    "sec", "industry", "economic", "regulatory", "market", "esg",
    "stock", "reference",
)

SYSTEM_GRAPHS = ("system", "metadata", "config")

_PARENT_RE = re.compile(r"^kg[a-f0-9]{16,}$")
_SUBGRAPH_NAME_RE = re.compile(r"^[a-zA-Z0-9]{1,20}$")

# API-endpoint validation patterns (types.py:194-208, 336-350)
GRAPH_ID_PATTERN = rf"^(kg[a-f0-9]{{16,}}|{'|'.join(SHARED_REPOSITORIES)})$"
GRAPH_OR_SUBGRAPH_ID_PATTERN = (
    rf"^(kg[a-f0-9]{{16,}}(?:_[a-zA-Z0-9]{{1,20}})?|{'|'.join(SHARED_REPOSITORIES)})$"
)
SUBGRAPH_NAME_PATTERN = r"^[a-zA-Z0-9]{1,20}$"


@dataclass(frozen=True)
class GraphIdentity:
    """Resolved identity of a graph id (types.py:111-147)."""

    graph_id: str
    category: GraphCategory
    graph_type: str | None = None
    access_pattern: AccessPattern | None = None
    subgraph_name: str | None = None

    @property
    def is_user_graph(self) -> bool:
        return self.category is GraphCategory.USER

    @property
    def is_shared_repository(self) -> bool:
        return self.category is GraphCategory.SHARED

    @property
    def is_system_graph(self) -> bool:
        return self.category is GraphCategory.SYSTEM

    @property
    def is_subgraph(self) -> bool:
        return self.subgraph_name is not None

    def get_access_pattern(self) -> AccessPattern:
        if self.access_pattern:
            return self.access_pattern
        if self.is_shared_repository:
            return AccessPattern.READ_ONLY
        if self.is_user_graph:
            return AccessPattern.READ_WRITE
        return AccessPattern.RESTRICTED

    @property
    def writable(self) -> bool:
        """Cypher-level write admission: only subgraphs accept writes
        (routers/graphs/query/execute.py:91-162 — writes rejected on
        main graphs, allowed on subgraphs; shared/system never)."""
        return self.is_subgraph and self.get_access_pattern() is AccessPattern.READ_WRITE

    def get_routing_info(self) -> dict:
        """Cluster routing (types.py:149-175) minus the proprietary
        tiering: shared repos route to a cached shared writer, user
        graphs to an allocated per-tenant writer."""
        access = self.get_access_pattern()
        if self.is_shared_repository:
            return {
                "cluster_type": "shared_writer",
                "access_mode": access.value,
                "cache_enabled": True,
                "ttl_seconds": 3600,
            }
        if self.is_user_graph:
            return {
                "cluster_type": "user_writer",
                "access_mode": access.value,
                "cache_enabled": False,
                "requires_allocation": True,
            }
        return {
            "cluster_type": "system",
            "access_mode": access.value,
            "cache_enabled": False,
        }


def is_valid_parent_id(graph_id: str) -> bool:
    return bool(_PARENT_RE.match(graph_id or ""))


def is_subgraph_id(graph_id: str) -> bool:
    """types.py:353-398 semantics, including all the rejections."""
    if not graph_id or graph_id in SHARED_REPOSITORIES:
        return False
    if "_" not in graph_id:
        return False
    parent, _, name = graph_id.partition("_")
    return bool(_PARENT_RE.match(parent)) and bool(_SUBGRAPH_NAME_RE.match(name))


def parse_graph_id(graph_id: str) -> tuple[str, str | None]:
    """(parent_id, subgraph_name|None) — types.py:401-425."""
    if is_subgraph_id(graph_id):
        parent, _, name = graph_id.partition("_")
        return parent, name
    return graph_id, None


def construct_subgraph_id(parent_graph_id: str, subgraph_name: str) -> str:
    """types.py:428-445: validate both halves, join with '_'."""
    if not is_valid_parent_id(parent_graph_id):
        raise ValueError(f"Invalid parent graph id: {parent_graph_id!r}")
    if not _SUBGRAPH_NAME_RE.match(subgraph_name or ""):
        raise ValueError(
            f"Invalid subgraph name {subgraph_name!r}: 1-20 alphanumerics"
        )
    return f"{parent_graph_id}_{subgraph_name}"


def identify_graph(graph_id: str, metadata: dict | None = None) -> GraphIdentity:
    """Resolve a graph id to its identity (types.py:218-317).

    ``metadata`` plays the reference's IAM-lookup role: when provided
    with ``{"is_repository": True}`` / ``{"graph_type": ...}`` it
    overrides the pattern fallback, mirroring the database-first path.
    Raises ValueError for ids matching no grammar (invalid-id
    rejection the reference does at the routing pattern layer).
    """
    if metadata:
        if metadata.get("is_repository"):
            return GraphIdentity(
                graph_id=graph_id,
                category=GraphCategory.SHARED,
                graph_type=str(metadata.get("repository_type") or "repository"),
                access_pattern=AccessPattern.READ_ONLY,
            )
        if metadata.get("graph_type"):
            parent, name = parse_graph_id(graph_id)
            return GraphIdentity(
                graph_id=graph_id,
                category=GraphCategory.USER,
                graph_type=str(metadata["graph_type"]),
                access_pattern=AccessPattern.READ_WRITE,
                subgraph_name=name,
            )

    if graph_id in SHARED_REPOSITORIES:
        return GraphIdentity(
            graph_id=graph_id,
            category=GraphCategory.SHARED,
            graph_type=graph_id,
            access_pattern=AccessPattern.READ_ONLY,
        )
    if graph_id in SYSTEM_GRAPHS:
        return GraphIdentity(
            graph_id=graph_id,
            category=GraphCategory.SYSTEM,
            graph_type="internal",
            access_pattern=AccessPattern.RESTRICTED,
        )
    if is_subgraph_id(graph_id):
        parent, name = parse_graph_id(graph_id)
        return GraphIdentity(
            graph_id=graph_id,
            category=GraphCategory.USER,
            graph_type="custom",
            access_pattern=AccessPattern.READ_WRITE,
            subgraph_name=name,
        )
    if is_valid_parent_id(graph_id):
        return GraphIdentity(
            graph_id=graph_id,
            category=GraphCategory.USER,
            graph_type="custom",
            access_pattern=AccessPattern.READ_WRITE,
        )
    raise ValueError(
        f"Invalid graph id {graph_id!r}: expected kg[hex16+], "
        f"kg[hex16+]_name, a shared repository {SHARED_REPOSITORIES}, "
        f"or a system graph {SYSTEM_GRAPHS}"
    )
