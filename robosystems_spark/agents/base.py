"""Agent framework core: modes, capabilities, metadata, responses.

Re-expresses the reference's multi-agent foundation
(/root/reference/robosystems/operations/agents/base.py:17-332): the
same capability/mode taxonomy, metadata contract, response envelope,
token accounting and mode-limit validation — synchronous (the serving
layer here is sync) and with the LLM behind an injectable seam.

The LLM seam: the reference calls Bedrock Claude through an
``AIClient`` (operations/agents/ai_client.py).  No model endpoint
exists in this environment, so agents take a ``complete_fn`` callable
(``(system, messages) -> str``) exactly like multimodal's ``decode_fn``
codec seam — production injects a real client, tests inject fakes, and
every agent also carries a deterministic non-LLM fallback so the layer
is fully exercisable without one.
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable

# (system_prompt, messages) -> completion text.  Messages are
# [{"role": "user"|"assistant", "content": str}, ...].
CompleteFn = Callable[[str, list[dict]], str]


class AgentCapability(Enum):
    """Routing/discovery capabilities (base.py:17-26)."""

    FINANCIAL_ANALYSIS = "financial_analysis"
    DEEP_RESEARCH = "deep_research"
    COMPLIANCE = "compliance"
    RAG_SEARCH = "rag_search"
    CUSTOM = "custom"
    ENTITY_ANALYSIS = "entity_analysis"
    TREND_ANALYSIS = "trend_analysis"


class AgentMode(Enum):
    """Execution modes with different tool-call budgets (base.py:29-35)."""

    QUICK = "quick"
    STANDARD = "standard"
    EXTENDED = "extended"
    STREAMING = "streaming"


# Tool-call budget per mode (base.py:69-81 execution profiles: quick
# 1-2 calls, standard 3-5, extended 6+).
MODE_TOOL_LIMITS: dict[AgentMode, int] = {
    AgentMode.QUICK: 2,
    AgentMode.STANDARD: 5,
    AgentMode.EXTENDED: 20,
    AgentMode.STREAMING: 5,
}


@dataclass
class AgentMetadata:
    """Describes an agent's capabilities and configuration (base.py:49-81)."""

    name: str
    description: str
    capabilities: list[AgentCapability]
    version: str = "1.0.0"
    supported_modes: list[AgentMode] = field(
        default_factory=lambda: [
            AgentMode.QUICK,
            AgentMode.STANDARD,
            AgentMode.EXTENDED,
        ]
    )
    author: str | None = None
    tags: list[str] = field(default_factory=list)


@dataclass
class AgentResponse:
    """Standard envelope returned by every analyze() (base.py:84-98)."""

    content: str
    agent_name: str
    mode_used: AgentMode
    metadata: dict[str, Any] = field(default_factory=dict)
    tokens_used: dict[str, int] = field(default_factory=dict)
    tools_called: list[str] = field(default_factory=list)
    confidence_score: float | None = None
    requires_followup: bool = False
    error_details: dict[str, Any] | None = None
    execution_time: float | None = None
    created_ts: float = field(default_factory=time.time)


class AgentError(RuntimeError):
    """An agent failed to produce an answer (bad mode, exhausted
    retries, unanswerable question)."""


class BaseAgent(ABC):
    """Abstract agent over the MCP tool surface (base.py:101-332).

    Concrete agents receive a ``GraphToolkit`` (queryapi/tools.py) —
    the same tools the reference's agents reach through their MCP
    client — plus the optional LLM ``complete_fn`` seam.
    """

    def __init__(self, toolkit, complete_fn: CompleteFn | None = None):
        self.toolkit = toolkit
        self.complete_fn = complete_fn
        self.total_tokens_used = {"input": 0, "output": 0}
        self._tools_called: list[str] = []

    @property
    @abstractmethod
    def metadata(self) -> AgentMetadata:
        """Agent self-description."""

    @abstractmethod
    def analyze(
        self,
        query: str,
        mode: AgentMode = AgentMode.STANDARD,
        history: list[dict] | None = None,
        context: dict | None = None,
        callback: Callable[[str, int, str], None] | None = None,
    ) -> AgentResponse:
        """Answer ``query``; ``callback(stage, pct, message)`` reports
        progress (the SSE hook, routers/graphs/agent/execute.py)."""

    @abstractmethod
    def can_handle(self, query: str, context: dict | None = None) -> float:
        """Routing confidence in [0, 1] for this query (base.py:161-172)."""

    # -- shared plumbing ----------------------------------------------------

    def supports_mode(self, mode: AgentMode) -> bool:
        return mode in self.metadata.supported_modes

    def has_capability(self, capability: AgentCapability) -> bool:
        return capability in self.metadata.capabilities

    def validate_mode(self, mode: AgentMode) -> None:
        if not self.supports_mode(mode):
            supported = ", ".join(m.value for m in self.metadata.supported_modes)
            raise AgentError(
                f"Agent {self.metadata.name!r} does not support mode "
                f"{mode.value!r}. Supported modes: {supported}"
            )

    def tool_limit(self, mode: AgentMode) -> int:
        return MODE_TOOL_LIMITS[mode]

    def _call_tool(self, name: str, fn: Callable[[], Any], mode: AgentMode):
        """Invoke a toolkit method with per-mode budget accounting."""
        if len(self._tools_called) >= self.tool_limit(mode):
            raise AgentError(
                f"tool-call budget exhausted for mode {mode.value!r} "
                f"({self.tool_limit(mode)} calls)"
            )
        self._tools_called.append(name)
        return fn()

    def track_tokens(self, input_tokens: int, output_tokens: int) -> None:
        self.total_tokens_used["input"] += input_tokens
        self.total_tokens_used["output"] += output_tokens

    def _complete(self, system: str, messages: list[dict]) -> str | None:
        """Run the LLM seam if injected; None signals 'no LLM — use the
        deterministic fallback'.  Token accounting approximates by
        whitespace tokens (the reference reads usage off the API)."""
        if self.complete_fn is None:
            return None
        text = self.complete_fn(system, messages)
        n_in = len(system.split()) + sum(len(m["content"].split()) for m in messages)
        self.track_tokens(n_in, len(text.split()))
        return text

    def prepare_context(self, query: str, context: dict | None = None) -> dict:
        enhanced = dict(context or {})
        enhanced.update(
            {
                "agent_name": self.metadata.name,
                "capabilities": [c.value for c in self.metadata.capabilities],
            }
        )
        return enhanced

    def __repr__(self) -> str:
        return f"<{type(self).__name__} name={self.metadata.name!r}>"
