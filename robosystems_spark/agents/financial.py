"""Financial agent: element/fact discovery and mode-scaled analysis.

Re-expresses the reference's FinancialAgent
(/root/reference/robosystems/operations/agents/financial.py:24-560):
the same mode split — QUICK runs one bounded discovery call, STANDARD
fetches the schema then a small battery of financial queries, EXTENDED
runs the comprehensive battery with progress callbacks — over this
repo's fact/element MCP tools (queryapi/tools.py discover_common_
elements / discover_facts / fact_grid) instead of raw model-generated
Cypher, with keyword-scored routing confidence
(financial.py:552 _calculate_confidence).
"""

from __future__ import annotations

import json
from typing import Callable

from robosystems_spark.agents.base import (
    AgentCapability,
    AgentMetadata,
    AgentMode,
    AgentResponse,
    BaseAgent,
)

_FINANCIAL_TERMS = (
    "revenue", "income", "asset", "liability", "equity", "cash",
    "balance", "filing", "sec", "fact", "element", "fiscal",
    "quarter", "earnings", "expense", "financial", "report",
    "accounting", "ledger", "trial balance",
)


class FinancialAgent(BaseAgent):
    """Financial analysis over the XBRL-shaped graph (facts/elements)."""

    agent_type = "financial"

    @property
    def metadata(self) -> AgentMetadata:
        return AgentMetadata(
            name="Financial Agent",
            description=(
                "Specialized in financial analysis, SEC filings, and "
                "accounting data"
            ),
            capabilities=[
                AgentCapability.FINANCIAL_ANALYSIS,
                AgentCapability.ENTITY_ANALYSIS,
                AgentCapability.TREND_ANALYSIS,
            ],
            version="2.0.0",
            tags=["finance", "sec", "analysis"],
        )

    def can_handle(self, query: str, context: dict | None = None) -> float:
        q = query.lower()
        hits = sum(1 for t in _FINANCIAL_TERMS if t in q)
        if hits >= 3:
            return 0.95
        if hits == 2:
            return 0.8
        if hits == 1:
            return 0.6
        return 0.1

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
        enhanced = self.prepare_context(query, context)

        if mode == AgentMode.QUICK:
            content = self._quick(query, mode, notify)
        elif mode == AgentMode.EXTENDED:
            content = self._extended(query, mode, notify)
        else:
            content = self._standard(query, mode, notify)

        return AgentResponse(
            content=content,
            agent_name=self.metadata.name,
            mode_used=mode,
            metadata=enhanced,
            tokens_used=dict(self.total_tokens_used),
            tools_called=list(self._tools_called),
            confidence_score=self.can_handle(query, context),
        )

    # -- mode bodies (financial.py:228-343) ---------------------------------

    def _element_filter(self, query: str) -> str | None:
        """A bare capitalized/known financial term to narrow element
        discovery — the reference embeds the user query in its prompt;
        here the narrowing is lexical."""
        for term in _FINANCIAL_TERMS:
            if term in query.lower() and term not in ("financial", "report"):
                return term
        return None

    def _quick(self, query: str, mode: AgentMode, notify) -> str:
        notify("analysis", 50, "Discovering top financial elements...")
        elements = self._call_tool(
            "discover-common-elements",
            lambda: self.toolkit.discover_common_elements(limit=10),
            mode,
        )
        return self._render("Top financial elements", query, elements)

    def _standard(self, query: str, mode: AgentMode, notify) -> str:
        notify("initialization", 20, "Getting graph schema...")
        schema = self._call_tool(
            "get-graph-schema", self.toolkit.describe_schema, mode
        )
        notify("analysis", 50, "Discovering elements and facts...")
        elements = self._call_tool(
            "discover-common-elements",
            lambda: self.toolkit.discover_common_elements(limit=10),
            mode,
        )
        name = self._element_filter(query)
        facts = self._call_tool(
            "discover-facts",
            lambda: self.toolkit.discover_facts(element_name=name, limit=15),
            mode,
        )
        parts = [
            self._render("Top financial elements", query, elements),
            self._render(
                f"Facts{f' matching {name!r}' if name else ''}", query, facts
            ),
            f"Graph labels: {sorted(schema.get('nodes', {}))}",
        ]
        return "\n\n".join(parts)

    def _extended(self, query: str, mode: AgentMode, notify) -> str:
        notify("initialization", 10, "Getting graph schema...")
        self._call_tool("get-graph-schema", self.toolkit.describe_schema, mode)
        notify("analysis", 30, "Comprehensive element discovery...")
        elements = self._call_tool(
            "discover-common-elements",
            lambda: self.toolkit.discover_common_elements(limit=25),
            mode,
        )
        name = self._element_filter(query)
        notify("analysis", 55, "Fact discovery...")
        facts = self._call_tool(
            "discover-facts",
            lambda: self.toolkit.discover_facts(element_name=name, limit=50),
            mode,
        )
        notify("analysis", 80, "Building element × period fact grid...")
        try:
            grid = self._call_tool(
                "build-fact-grid", lambda: self.toolkit.fact_grid(), mode
            )
        except Exception as exc:  # graph without facts: report, don't fail
            grid = [{"error": str(exc)}]
        parts = [
            self._render("All common elements", query, elements),
            self._render("Facts", query, facts),
            self._render("Fact grid (element × period)", query, grid[:20]),
        ]
        return "\n\n".join(parts)

    @staticmethod
    def _render(title: str, query: str, rows: list) -> str:
        body = json.dumps(rows[:25], default=str, indent=1)
        return f"## {title}\n(for: {query})\n{body}"
