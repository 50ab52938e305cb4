"""Cypher agent: natural language → Cypher → execution → summary.

Re-expresses the reference's CypherAgent
(/root/reference/robosystems/operations/agents/cypher_agent.py:24-417):
the same analyze() stage pipeline — fetch schema, generate Cypher,
execute through the gated read-only tool, format results — with
progress callbacks at the same stages.  Generation goes through the
LLM seam when a ``complete_fn`` is injected (the prompt carries the
schema exactly like the reference's _generate_cypher) and falls back
to the deterministic grammar in nl2cypher.py otherwise; a failed
execution is retried with the error fed back (the reference's
model-repair loop), bounded by the mode's tool budget.
"""

from __future__ import annotations

import json
import re
from typing import Callable

from robosystems_spark.agents.base import (
    AgentCapability,
    AgentError,
    AgentMetadata,
    AgentMode,
    AgentResponse,
    BaseAgent,
)
from robosystems_spark.agents.nl2cypher import GenerationError, generate_cypher

_SYSTEM_PROMPT = (
    "You translate analytical questions about a property graph into "
    "read-only Cypher. Reply with a single Cypher statement inside a "
    "```cypher fenced block; alias every returned expression."
)


def _extract_cypher(text: str) -> str:
    """Pull the Cypher statement out of a model reply (fenced block
    first, bare statement otherwise) — cypher_agent.py strips the same
    markdown fences."""
    m = re.search(r"```(?:cypher)?\s*(.+?)```", text, re.S | re.I)
    stmt = (m.group(1) if m else text).strip()
    if not stmt.upper().startswith(("MATCH", "CALL", "RETURN", "WITH", "UNWIND")):
        raise AgentError(f"model reply is not a Cypher statement: {stmt[:80]!r}")
    return stmt


class CypherAgent(BaseAgent):
    """NL→Cypher conversion and execution (the console-agent path)."""

    agent_type = "cypher"

    @property
    def metadata(self) -> AgentMetadata:
        return AgentMetadata(
            name="Cypher Agent",
            description=(
                "Converts natural language to Cypher queries and executes them"
            ),
            capabilities=[
                AgentCapability.RAG_SEARCH,
                AgentCapability.ENTITY_ANALYSIS,
                AgentCapability.CUSTOM,
            ],
            tags=["cypher", "query", "graph", "nlp"],
        )

    # confidence keywords mirror cypher_agent.py can_handle scoring
    _STRONG = ("cypher", "query", "match", "graph")
    _SHAPES = ("how many", "count", "list", "show", "average", "total",
               "which", "top", "per", "by")

    def can_handle(self, query: str, context: dict | None = None) -> float:
        q = query.lower()
        if any(w in q for w in self._STRONG):
            return 0.9
        if any(w in q for w in self._SHAPES):
            return 0.7
        return 0.3  # generic fallback agent for graph questions

    def analyze(
        self,
        query: str,
        mode: AgentMode = AgentMode.STANDARD,
        history: list[dict] | None = None,
        context: dict | None = None,
        callback: Callable[[str, int, str], None] | None = None,
    ) -> AgentResponse:
        self.validate_mode(mode)
        self._tools_called = []
        notify = callback or (lambda *_: None)

        notify("initialization", 10, "Getting graph schema...")
        schema = self._call_tool(
            "get-graph-schema", self.toolkit.describe_schema, mode
        )

        notify("analysis", 30, "Converting natural language to Cypher...")
        cypher, generator = self._generate(query, schema, history)

        notify("execution", 60, "Executing Cypher query...")
        rows, cypher = self._execute_with_repair(query, cypher, schema, mode)

        notify("formatting", 90, "Formatting results...")
        content = self._format_results(query, cypher, rows)
        notify("completion", 100, "Complete")

        return AgentResponse(
            content=content,
            agent_name=self.metadata.name,
            mode_used=mode,
            metadata={
                "cypher_query": cypher,
                "generator": generator,
                "row_count": len(rows),
            },
            tokens_used=dict(self.total_tokens_used),
            tools_called=list(self._tools_called),
            confidence_score=self.can_handle(query, context),
        )

    # -- stages -------------------------------------------------------------

    def _generate(
        self, query: str, schema: dict, history: list[dict] | None
    ) -> tuple[str, str]:
        reply = self._complete(
            _SYSTEM_PROMPT,
            list(history or [])
            + [
                {
                    "role": "user",
                    "content": (
                        f"Graph schema:\n{json.dumps(schema, sort_keys=True)}\n\n"
                        f"Question: {query}"
                    ),
                }
            ],
        )
        if reply is not None:
            return _extract_cypher(reply), "llm"
        return generate_cypher(query, schema).cypher, "rules"

    def _execute_with_repair(
        self, query: str, cypher: str, schema: dict, mode: AgentMode
    ) -> tuple[list[dict], str]:
        """Run the statement; on failure, ask the seam to repair it
        with the error attached (one round per remaining tool budget).
        The rule-based generator has no repair move — its output either
        runs or the question is out of grammar."""
        last_err: Exception | None = None
        while True:
            try:
                rows = self._call_tool(
                    "read-graph-cypher",
                    lambda: self.toolkit.read_cypher(cypher),
                    mode,
                )
                return rows, cypher
            except AgentError:
                raise  # budget exhausted
            except Exception as exc:  # gate/compile/runtime error
                last_err = exc
                reply = self._complete(
                    _SYSTEM_PROMPT,
                    [
                        {
                            "role": "user",
                            "content": (
                                f"Schema:\n{json.dumps(schema, sort_keys=True)}\n"
                                f"Question: {query}\nYour query:\n{cypher}\n"
                                f"failed with: {exc}\nReply with a corrected "
                                "read-only Cypher statement."
                            ),
                        }
                    ],
                )
                if reply is None:
                    raise AgentError(
                        f"Cypher execution failed: {last_err}"
                    ) from last_err
                cypher = _extract_cypher(reply)

    @staticmethod
    def _format_results(query: str, cypher: str, rows: list[dict]) -> str:
        """Deterministic result summary (the reference renders via a
        second model call; the envelope also carries the raw metadata
        so callers can re-render)."""
        if not rows:
            return f"No rows matched.\n\nCypher:\n{cypher}"
        cols = list(rows[0].keys())
        lines = [" | ".join(cols)]
        for r in rows[:20]:
            lines.append(" | ".join(str(r.get(c)) for c in cols))
        more = f"\n… {len(rows) - 20} more rows" if len(rows) > 20 else ""
        return (
            f"{len(rows)} row(s) for: {query}\n\n"
            + "\n".join(lines)
            + more
            + f"\n\nCypher:\n{cypher}"
        )


class GenerationUnsupported(GenerationError):
    """Re-export seam for callers that want to catch grammar misses."""
