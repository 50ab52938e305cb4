"""Deterministic natural-language → Cypher generation.

The reference's CypherAgent hands this job to Claude
(/root/reference/robosystems/operations/agents/cypher_agent.py:
_generate_cypher prompts the model with the graph schema).  This
module is the in-sandbox deterministic counterpart: a small grammar of
analytical question shapes resolved against the live schema, used as
the agent's fallback whenever no LLM ``complete_fn`` is injected —
and as the validator's repair baseline when one is.

Supported question shapes (each resolves labels/properties fuzzily —
case-insensitive, plural-stripped — against the toolkit schema):

- "how many <Label>[s]" / "count [the] <Label>[s]"
- "how many <Label>s per/by <prop>" (grouped counts)
- "average/total/min/max/sum <prop> of/for <Label>[s]"
- "list/show [top/first N] <Label>[s] [by <prop>]"
- "which <LabelA> <REL> <LabelB>" (one-hop traversal counts)

Everything emitted is read-only Cypher that the CypherGate accepts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class GeneratedQuery:
    cypher: str
    explanation: str


class GenerationError(ValueError):
    """The question doesn't match any supported shape."""


_AGG_WORDS = {
    "average": "avg",
    "avg": "avg",
    "mean": "avg",
    "total": "sum",
    "sum": "sum",
    "minimum": "min",
    "min": "min",
    "smallest": "min",
    "maximum": "max",
    "max": "max",
    "largest": "max",
}

_STOP = {
    "the", "a", "an", "of", "for", "in", "on", "all", "are", "is",
    "there", "do", "we", "have", "what", "whats", "each",
}


def _norm(word: str) -> str:
    return re.sub(r"[^a-z0-9_]", "", word.lower())


_IRREGULAR = {"people": "person", "children": "child", "indices": "index"}


def _singular(word: str) -> str:
    if word in _IRREGULAR:
        return _IRREGULAR[word]
    if word.endswith("ies"):
        return word[:-3] + "y"
    if word.endswith("ses"):
        return word[:-2]
    if word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


class SchemaResolver:
    """Fuzzy label/property lookup over GraphToolkit.describe_schema()."""

    def __init__(self, schema: dict):
        self.nodes: dict[str, dict] = schema.get("nodes", {})
        self.rels: dict[str, dict] = schema.get("relationships", {})
        self._label_index = {
            _singular(label.lower()): label for label in self.nodes
        }
        self._rel_index = {
            _singular(rel.lower().replace("_", "")): rel for rel in self.rels
        }

    def label(self, word: str) -> str | None:
        return self._label_index.get(_singular(_norm(word)))

    def relationship(self, word: str) -> str | None:
        return self._rel_index.get(_singular(_norm(word)))

    def property(self, label: str, word: str) -> str | None:
        cols = self.nodes.get(label, {}).get("columns", {})
        w = _norm(word)
        for cand in (w, _singular(w)):
            for col in cols:
                if col.lower() == cand:
                    return col
        # substring fallback: "revenue" matches "total_revenue"
        for col in cols:
            if _norm(word) and _norm(word) in col.lower():
                return col
        return None

    def display_columns(self, label: str, limit: int = 4) -> list[str]:
        """Identifier + the first few scalar columns — the projection
        for "show me" questions (bare-node RETURN is not a shape the
        compiler guarantees)."""
        cols = list(self.nodes.get(label, {}).get("columns", {}))
        ordered = [c for c in cols if c == "identifier"] + [
            c for c in cols if c != "identifier"
        ]
        return ordered[:limit]


def generate_cypher(question: str, schema: dict) -> GeneratedQuery:
    """Resolve ``question`` to a read-only Cypher statement against
    ``schema`` (a ``GraphToolkit.describe_schema()`` dict).  Raises
    GenerationError for unsupported shapes."""
    resolver = SchemaResolver(schema)
    q = question.strip().rstrip("?.!").lower()
    words = [w for w in re.split(r"[\s,]+", q) if w]

    # -- grouped count: "how many X per/by Y" ------------------------------
    m = re.search(r"(?:how many|count)\s+(?:the\s+)?(\w+)\s+(?:per|by)\s+(\w+)", q)
    if m:
        label = resolver.label(m.group(1))
        if label:
            prop = resolver.property(label, m.group(2))
            if prop:
                return GeneratedQuery(
                    cypher=(
                        f"MATCH (n:{label}) RETURN n.{prop} AS {prop}, "
                        f"count(n) AS count ORDER BY count DESC, {prop}"
                    ),
                    explanation=f"count of {label} nodes grouped by {prop}",
                )

    # -- plain count: "how many X" / "count X" ------------------------------
    m = re.search(r"(?:how many|count(?:\s+the)?(?:\s+number\s+of)?)\s+(\w+)", q)
    if m:
        label = resolver.label(m.group(1))
        if label:
            return GeneratedQuery(
                cypher=f"MATCH (n:{label}) RETURN count(n) AS count",
                explanation=f"count of {label} nodes",
            )

    # -- aggregate: "average X of Y" ----------------------------------------
    for word, fn in _AGG_WORDS.items():
        m = re.search(rf"\b{word}\s+(\w+)\s+(?:of|for|per|across)\s+(?:the\s+|all\s+)?(\w+)", q)
        if m:
            label = resolver.label(m.group(2))
            if label:
                prop = resolver.property(label, m.group(1))
                if prop:
                    alias = f"{fn}_{prop}"
                    return GeneratedQuery(
                        cypher=(
                            f"MATCH (n:{label}) RETURN "
                            f"{fn}(n.{prop}) AS {alias}"
                        ),
                        explanation=f"{fn} of {label}.{prop}",
                    )

    # -- traversal count: "which/how many A <rel> B" ------------------------
    labels_hit = [
        (i, resolver.label(w))
        for i, w in enumerate(words)
        if resolver.label(w) and _norm(w) not in _STOP
    ]
    if len(labels_hit) >= 2:
        (ia, la), (ib, lb) = labels_hit[0], labels_hit[1]
        rel = None
        for w in words[ia + 1 : ib]:
            rel = resolver.relationship(w)
            if rel:
                break
        if rel is None:
            # unique relationship connecting the two labels, if declared
            cands = [
                name
                for name, info in resolver.rels.items()
                if {info.get("from_node"), info.get("to_node")} == {la, lb}
                or (info.get("from_node") is None)
            ]
            declared = [
                c for c in cands if resolver.rels[c].get("from_node") is not None
            ]
            if len(declared) == 1:
                rel = declared[0]
        if rel:
            a_cols = resolver.display_columns(la, 1)
            a_col = a_cols[0] if a_cols else "identifier"
            return GeneratedQuery(
                cypher=(
                    f"MATCH (a:{la})-[:{rel}]-(b:{lb}) RETURN "
                    f"a.{a_col} AS {la.lower()}_{a_col}, count(b) AS count "
                    f"ORDER BY count DESC, {la.lower()}_{a_col}"
                ),
                explanation=f"{la}-{rel}-{lb} traversal with per-{la} counts",
            )

    # -- listing: "list/show [top N] X [by Y]" ------------------------------
    m = re.search(
        r"(?:list|show|give me|get)\s+(?:the\s+)?(?:top|first)?\s*(\d+)?\s*(\w+)"
        r"(?:\s+(?:by|ordered by|sorted by)\s+(\w+))?",
        q,
    )
    if m:
        label = resolver.label(m.group(2))
        if label:
            limit = int(m.group(1)) if m.group(1) else 25
            cols = resolver.display_columns(label)
            proj = ", ".join(f"n.{c} AS {c}" for c in cols)
            order = cols[0] if cols else "identifier"
            desc = ""
            if m.group(3):
                by = resolver.property(label, m.group(3))
                if by:
                    order, desc = by, " DESC"
            return GeneratedQuery(
                cypher=(
                    f"MATCH (n:{label}) RETURN {proj} "
                    f"ORDER BY {order}{desc} LIMIT {limit}"
                ),
                explanation=f"first {limit} {label} rows ordered by {order}",
            )

    raise GenerationError(
        f"cannot resolve question to a supported Cypher shape: {question!r}"
    )
