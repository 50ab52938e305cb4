"""Graph metrics collection.

The reference's GraphMetricsService (/root/reference/robosystems/
operations/graph/metrics_service.py:26-360) collects per-graph node
counts by label, relationship counts by type, a storage-size estimate
and a health verdict.  Its engine has no storage introspection, so it
ESTIMATES size as ``node_count * 100`` bytes; a GraphStore is parquet
on a filesystem, so we report the EXACT on-disk byte size instead and
keep the reference's estimation as the documented fallback shape.

Counts run as one Spark count job per table — parquet row counts come
from footer metadata, so this is a metadata scan, not a data scan.
"""

from __future__ import annotations

import os
import time

from robosystems_spark.sources.materialize import GraphStore


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def collect_metrics(store: GraphStore) -> dict:
    """Node/relationship counts, exact storage bytes, health — the
    collect_metrics_for_graph contract (metrics_service.py:26-75)."""
    t0 = time.time()
    node_counts: dict[str, int] = {}
    rel_counts: dict[str, int] = {}
    unreadable: list[str] = []
    for table in store.tables():
        try:
            df = store.read(table)
            n = df.count()
        except Exception:  # noqa: BLE001 — a broken table is a health signal
            unreadable.append(table)
            continue
        if {"src", "dst"} <= set(df.columns):
            rel_counts[table] = n
        else:
            node_counts[table] = n

    size_bytes = _dir_bytes(store.graph_path)
    total_nodes = sum(node_counts.values())
    total_rels = sum(rel_counts.values())
    return {
        "graph_id": store.graph_id,
        "node_counts_by_label": node_counts,
        "relationship_counts_by_type": rel_counts,
        "total_nodes": total_nodes,
        "total_relationships": total_rels,
        "size": {
            "size_bytes": size_bytes,
            "size_mb": round(size_bytes / (1024 * 1024), 3),
            "method": "filesystem",  # exact, not the reference's
            # node_count*100 estimation fallback
        },
        "health": {
            "status": "healthy" if not unreadable else "unhealthy",
            "unreadable_tables": unreadable,
        },
        "collected_in_ms": int((time.time() - t0) * 1000),
    }


def usage_summary(stores: list[GraphStore]) -> dict:
    """Aggregate across graphs (get_usage_summary,
    metrics_service.py:132-190)."""
    per_graph = [collect_metrics(s) for s in stores]
    return {
        "graph_count": len(per_graph),
        "total_nodes": sum(m["total_nodes"] for m in per_graph),
        "total_relationships": sum(m["total_relationships"] for m in per_graph),
        "total_size_bytes": sum(m["size"]["size_bytes"] for m in per_graph),
        "unhealthy_graphs": [
            m["graph_id"] for m in per_graph if m["health"]["status"] != "healthy"
        ],
        "graphs": per_graph,
    }
