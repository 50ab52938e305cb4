"""Query classification + static analysis.

Re-expresses the reference's security classifier and size-estimating
analyzer (/root/reference/robosystems/security/cypher_analyzer.py:33-150
and robosystems/middleware/graph/execution_strategies.py:49-197) over
our SQL/Cypher-subset surface:

- strip comments / string literals / backtick identifiers first so
  keywords inside them never misclassify
- classify READ / WRITE / BULK / ADMIN / DDL by keyword sets
- estimate result size from LIMIT and aggregation shape
  (small <=100, medium <=1000, large >=10000)
- flag expensive patterns (unbounded var-length paths, shortest-path,
  cartesian products) for routing decisions, not rewriting
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum


class OperationType(str, Enum):
    READ = "read"
    WRITE = "write"
    BULK = "bulk"
    ADMIN = "admin"
    DDL = "ddl"


WRITE_KEYWORDS = frozenset(
    "CREATE MERGE SET DELETE REMOVE DETACH DROP ALTER INSERT UPDATE".split()
)
BULK_KEYWORDS = frozenset("COPY LOAD IMPORT".split())
ADMIN_KEYWORDS = frozenset("EXPORT INSTALL ATTACH USE".split())
DDL_PHRASES = (
    "CREATE NODE TABLE",
    "CREATE REL TABLE",
    "DROP NODE TABLE",
    "DROP REL TABLE",
    "CREATE TABLE",
    "ALTER TABLE",
    "ADD COLUMN",
    "DROP COLUMN",
    "RENAME TABLE",
    "RENAME COLUMN",
    "DROP TABLE",
    "CREATE INDEX",
    "CREATE DATABASE",
    "DROP DATABASE",
)

MAX_QUERY_LENGTH = 100_000  # hard cap (service.py:183-189 tier caps below)

_COMMENT = re.compile(r"(/\*.*?\*/|//[^\n]*$|--[^\n]*$)", re.DOTALL | re.MULTILINE)
_STRING = re.compile(r"""("(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')""", re.DOTALL)
_BACKTICK = re.compile(r"`(?:[^`\\]|\\.)*`", re.DOTALL)
_LIMIT = re.compile(r"\bLIMIT\s+(\d+)", re.IGNORECASE)
_AGGREGATE = re.compile(r"\b(count|sum|avg|min|max|collect)\s*\(", re.IGNORECASE)
_VARLENGTH_UNBOUNDED = re.compile(r"\[\s*\*\s*\]")
_VARLENGTH_BOUNDED = re.compile(r"\[\s*\*\s*\d*\.\.\d+\s*\]")
_SHORTEST_PATH = re.compile(r"\b(shortestPath|allShortestPaths)\b", re.IGNORECASE)


def strip_literals(query: str) -> str:
    """Remove comments, strings and quoted identifiers so keyword scans
    can't be spoofed from inside literals."""
    q = _COMMENT.sub(" ", query)
    q = _STRING.sub("''", q)
    q = _BACKTICK.sub("`x`", q)
    return q


def classify_operation(query: str) -> OperationType:
    if not query or not isinstance(query, str):
        raise ValueError("Query must be a non-empty string")
    if len(query) > MAX_QUERY_LENGTH:
        raise ValueError(f"Query exceeds maximum length of {MAX_QUERY_LENGTH} characters")
    cleaned = strip_literals(query)
    upper = cleaned.upper()
    for phrase in DDL_PHRASES:
        if phrase in upper:
            return OperationType.DDL
    words = set(re.findall(r"\b[A-Z]+\b", upper))
    if words & ADMIN_KEYWORDS:
        return OperationType.ADMIN
    if words & BULK_KEYWORDS:
        return OperationType.BULK
    if words & WRITE_KEYWORDS:
        return OperationType.WRITE
    return OperationType.READ


@dataclass
class QueryAnalysis:
    operation: OperationType
    estimated_size: str  # small | medium | large | unknown
    limit: int | None
    has_aggregation: bool
    expensive_patterns: list[str] = field(default_factory=list)
    recommended_chunk_size: int = 1000


def analyze_query_features(query: str) -> QueryAnalysis:
    """Static size/cost analysis used for strategy selection
    (execution_strategies.py:49-51 size classes)."""
    op = classify_operation(query)
    cleaned = strip_literals(query)
    m = _LIMIT.search(cleaned)
    limit = int(m.group(1)) if m else None
    has_agg = bool(_AGGREGATE.search(cleaned))

    expensive = []
    if _VARLENGTH_UNBOUNDED.search(cleaned):
        expensive.append("unbounded_varlength_path")
    if _SHORTEST_PATH.search(cleaned):
        expensive.append("shortest_path")
    if _VARLENGTH_BOUNDED.search(cleaned):
        expensive.append("bounded_varlength_path")
    if re.search(r"MATCH\s*\([^)]*\)\s*,\s*\(", cleaned, re.IGNORECASE):
        expensive.append("cartesian_product")

    if limit is not None:
        size = "small" if limit <= 100 else ("medium" if limit <= 1000 else "large")
    elif has_agg:
        size = "small"
    else:
        size = "large"

    chunk = {"small": 100, "medium": 1000, "large": 2500}.get(size, 1000)
    return QueryAnalysis(
        operation=op,
        estimated_size=size,
        limit=limit,
        has_aggregation=has_agg,
        expensive_patterns=expensive,
        recommended_chunk_size=chunk,
    )
