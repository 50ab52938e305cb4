"""Query-result cache (the CACHED execution strategy).

The reference enables result caching per graph category — shared
repositories route with ``cache_enabled: True, ttl_seconds: 3600``
(/root/reference/robosystems/middleware/graph/types.py:153-160) and
the queue keeps an LRU of completed queries
(middleware/graph/query_queue.py:528-531).  Here: one TTL+LRU map
keyed by (graph_id, query, params), storing the materialized chunk
batches.  Only read results are cacheable (writes invalidate by
construction — the gate rejects them on cacheable graphs anyway).

Time is injected for deterministic TTL tests.  On a multi-node
deployment this object is the interface seam for a Valkey/Redis
backend; the keying and TTL semantics stay identical.
"""

from __future__ import annotations

import hashlib
import json
import time as _time
from collections import OrderedDict
from dataclasses import dataclass


def cache_key(graph_id: str, query: str, params: dict | None = None) -> str:
    payload = json.dumps(
        {"g": graph_id, "q": query, "p": params or {}}, sort_keys=True, default=str
    )
    return hashlib.sha256(payload.encode()).hexdigest()


@dataclass
class CacheEntry:
    columns: list[str]
    chunks: list[list[dict]]
    stored_at: float


class QueryCache:
    """LRU + TTL result cache."""

    def __init__(self, max_entries: int = 256, ttl_s: float = 3600.0, clock=_time.monotonic):
        self.max_entries = max_entries
        self.ttl_s = ttl_s
        self._clock = clock
        self._entries: OrderedDict[str, CacheEntry] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> CacheEntry | None:
        entry = self._entries.get(key)
        if entry is None:
            self.misses += 1
            return None
        if self._clock() - entry.stored_at > self.ttl_s:
            del self._entries[key]
            self.misses += 1
            return None
        self._entries.move_to_end(key)  # LRU touch
        self.hits += 1
        return entry

    def put(self, key: str, columns: list[str], chunks: list[list[dict]]) -> None:
        self._entries[key] = CacheEntry(
            columns=list(columns), chunks=chunks, stored_at=self._clock()
        )
        self._entries.move_to_end(key)
        while len(self._entries) > self.max_entries:
            self._entries.popitem(last=False)

    def invalidate(self, key: str | None = None) -> None:
        if key is None:
            self._entries.clear()
        else:
            self._entries.pop(key, None)

    def stats(self) -> dict:
        return {
            "entries": len(self._entries),
            "hits": self.hits,
            "misses": self.misses,
        }
