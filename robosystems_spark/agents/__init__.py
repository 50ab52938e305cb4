"""Agent layer: NL-driven analysis atop the MCP tool surface (X4).

Re-expresses /root/reference/robosystems/operations/agents/ — base
contracts, the cypher + financial agents, registry and orchestrator —
with the Bedrock LLM behind an injectable ``complete_fn`` seam and a
deterministic NL→Cypher grammar as the sandbox-real fallback.
"""

from robosystems_spark.agents.base import (
    AgentCapability,
    AgentError,
    AgentMetadata,
    AgentMode,
    AgentResponse,
    BaseAgent,
)
from robosystems_spark.agents.cypher_agent import CypherAgent
from robosystems_spark.agents.financial import FinancialAgent
from robosystems_spark.agents.nl2cypher import (
    GenerationError,
    generate_cypher,
)
from robosystems_spark.agents.orchestrator import (
    AgentOrchestrator,
    OrchestratorConfig,
    RoutingStrategy,
    SelectionCriteria,
)
from robosystems_spark.agents.registry import (
    AgentNotFoundError,
    AgentRegistry,
    register_builtin_agents,
)

__all__ = [
    "AgentCapability",
    "AgentError",
    "AgentMetadata",
    "AgentMode",
    "AgentNotFoundError",
    "AgentOrchestrator",
    "AgentRegistry",
    "AgentResponse",
    "BaseAgent",
    "CypherAgent",
    "FinancialAgent",
    "GenerationError",
    "OrchestratorConfig",
    "RoutingStrategy",
    "SelectionCriteria",
    "generate_cypher",
    "register_builtin_agents",
]
