"""Agent context enrichment: lightweight RAG over the tool surface.

Re-expresses the reference's ContextEnricher stack
(/root/reference/robosystems/operations/agents/context.py:21-675):
RAGConfig, a deterministic local embedding (length + domain-keyword +
hashed bag-of-words features — the reference's no-external-deps
provider), an in-memory vector store, regex entity extraction, and
the enrich() pipeline that attaches semantic matches + entities to
the routing context (cached per query).  A real embedding model plugs
in through ``RAGConfig.embed_fn`` exactly like the agents' LLM seam;
the corpus-scale vector path lives in operators/similarity.py — this
store holds agent memory (a few thousand snippets), not the corpus.
"""

from __future__ import annotations

import hashlib
import math
import re
import time
from dataclasses import dataclass, field
from typing import Any, Callable

_DIM = 32
_KEYWORDS = (
    "revenue", "income", "asset", "liability", "equity", "cash",
    "filing", "fact", "element", "graph", "query", "count",
    "customer", "order", "supplier", "document", "embedding",
)


def local_embedding(text: str) -> list[float]:
    """Deterministic feature embedding (context.py:180-270 semantics):
    length features, domain-keyword indicators, and md5-hashed
    bag-of-words buckets — L2-normalized."""
    words = text.lower().strip().split()
    feats = [
        min(len(text) / 1000.0, 1.0),
        min(len(words) / 100.0, 1.0),
        math.log1p(len(words)) / 10.0,
    ]
    feats.extend(
        1.0 if any(k in w for w in words) else 0.0 for k in _KEYWORDS[:13]
    )
    buckets = [0.0] * (_DIM - len(feats))
    for w in words:
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        buckets[h % len(buckets)] += 1.0
    feats.extend(buckets)
    norm = math.sqrt(sum(x * x for x in feats)) or 1.0
    return [x / norm for x in feats]


@dataclass
class RAGConfig:
    """Enrichment knobs (context.py:31-46)."""

    enable_semantic_search: bool = True
    enable_entity_linking: bool = True
    similarity_threshold: float = 0.3
    max_results: int = 5
    enable_caching: bool = False
    cache_ttl: int = 3600
    embed_fn: Callable[[str], list[float]] = local_embedding


@dataclass
class DocumentChunk:
    """A stored snippet of agent memory (context.py:49-71)."""

    content: str
    metadata: dict = field(default_factory=dict)
    embedding: list[float] | None = None
    chunk_id: str = ""


class MemoryVectorStore:
    """In-memory cosine store (context.py:100-153) — the default until
    a persisted subgraph store backs agent memory."""

    def __init__(self, embed_fn: Callable[[str], list[float]] = local_embedding):
        self._chunks: dict[str, DocumentChunk] = {}
        self._embed = embed_fn

    def add_documents(self, chunks: list[DocumentChunk]) -> list[str]:
        ids = []
        for c in chunks:
            if c.embedding is None:
                c.embedding = self._embed(c.content)
            if not c.chunk_id:
                c.chunk_id = hashlib.md5(c.content.encode()).hexdigest()[:16]
            self._chunks[c.chunk_id] = c
            ids.append(c.chunk_id)
        return ids

    def delete_documents(self, chunk_ids: list[str]) -> None:
        for cid in chunk_ids:
            self._chunks.pop(cid, None)

    @staticmethod
    def _cosine(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1e-300
        nb = math.sqrt(sum(x * x for x in b)) or 1e-300
        return dot / (na * nb)

    def search(
        self, query: str, k: int = 5, threshold: float = 0.0
    ) -> list[tuple[DocumentChunk, float]]:
        qv = self._embed(query)
        scored = [
            (c, self._cosine(qv, c.embedding)) for c in self._chunks.values()
        ]
        scored = [s for s in scored if s[1] >= threshold]
        scored.sort(key=lambda s: (-s[1], s[0].chunk_id))
        return scored[:k]


_ENTITY_PATTERNS = {
    "graph_id": re.compile(r"\bkg[a-f0-9]{16,}\b"),
    "money": re.compile(r"\$\s?\d[\d,]*(?:\.\d+)?(?:\s?(?:million|billion|[mbk]))?", re.I),
    "date": re.compile(r"\b\d{4}-\d{2}-\d{2}\b"),
    "percentage": re.compile(r"\b\d+(?:\.\d+)?\s?%"),
    "ticker": re.compile(r"\b[A-Z]{2,5}\b(?=\s+(?:stock|shares|ticker))"),
}


class EntityExtractor:
    """Regex entity extraction (context.py:271-322 patterns)."""

    def extract(self, text: str) -> list[dict[str, Any]]:
        out = []
        for etype, pattern in _ENTITY_PATTERNS.items():
            for m in pattern.finditer(text):
                out.append({"type": etype, "value": m.group(0), "span": m.span()})
        return sorted(out, key=lambda e: e["span"])


class ContextEnricher:
    """enrich(): semantic memory matches + extracted entities attached
    to the routing context (context.py:359-520), with optional TTL
    caching."""

    def __init__(self, config: RAGConfig | None = None):
        self.config = config or RAGConfig()
        self.vector_store = MemoryVectorStore(self.config.embed_fn)
        self.entity_extractor = EntityExtractor()
        self._cache: dict[str, tuple[float, dict]] = {}

    def remember(self, content: str, metadata: dict | None = None) -> str:
        """Add a snippet to agent memory."""
        return self.vector_store.add_documents(
            [DocumentChunk(content=content, metadata=metadata or {})]
        )[0]

    def enrich(self, query: str, context: dict | None = None) -> dict:
        enriched = dict(context or {})
        key = hashlib.md5(query.encode()).hexdigest()
        if self.config.enable_caching and key in self._cache:
            ts, cached = self._cache[key]
            if time.time() - ts < self.config.cache_ttl:
                out = dict(cached)
                out.update(enriched)
                out["from_cache"] = True
                return out
        added: dict = {}
        if self.config.enable_semantic_search:
            hits = self.vector_store.search(
                query,
                k=self.config.max_results,
                threshold=self.config.similarity_threshold,
            )
            added["semantic_matches"] = [
                {
                    "content": c.content,
                    "score": round(score, 4),
                    "metadata": c.metadata,
                }
                for c, score in hits
            ]
        if self.config.enable_entity_linking:
            added["entities"] = self.entity_extractor.extract(query)
        if self.config.enable_caching:
            self._cache[key] = (time.time(), dict(added))
        enriched.update(added)
        enriched["context_enriched"] = True
        return enriched
