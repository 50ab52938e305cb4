"""Agent registry: registration, discovery, capability lookup.

Re-expresses the reference's AgentRegistry
(/root/reference/robosystems/operations/agents/registry.py:37-516):
decorator registration, alias support, capability/mode filtering,
keyword discovery and health checks — as a plain class-level registry
(no singleton dance; instantiation is explicit because agents here
take a toolkit, not global graph ids).
"""

from __future__ import annotations

from typing import Iterable

from robosystems_spark.agents.base import (
    AgentCapability,
    AgentMode,
    BaseAgent,
)


class AgentNotFoundError(KeyError):
    """No agent registered under that type/alias."""


class DuplicateAgentError(ValueError):
    """An agent type was registered twice without replace=True."""


class AgentRegistry:
    """Class-level registry of agent types (registry.py:37-113)."""

    _agents: dict[str, type[BaseAgent]] = {}
    _aliases: dict[str, str] = {}

    @classmethod
    def register(cls, agent_type: str, replace: bool = False):
        """Decorator: ``@AgentRegistry.register("cypher")``."""

        def decorator(agent_class: type[BaseAgent]):
            if agent_type in cls._agents and not replace:
                raise DuplicateAgentError(
                    f"agent type {agent_type!r} is already registered"
                )
            cls._agents[agent_type] = agent_class
            return agent_class

        return decorator

    @classmethod
    def add_alias(cls, alias: str, agent_type: str) -> None:
        if agent_type not in cls._agents:
            raise AgentNotFoundError(agent_type)
        cls._aliases[alias] = agent_type

    @classmethod
    def resolve(cls, agent_type: str) -> type[BaseAgent]:
        name = cls._aliases.get(agent_type, agent_type)
        try:
            return cls._agents[name]
        except KeyError:
            raise AgentNotFoundError(
                f"no agent registered as {agent_type!r} "
                f"(known: {sorted(cls._agents)})"
            ) from None

    @classmethod
    def create(cls, agent_type: str, toolkit, complete_fn=None) -> BaseAgent:
        """Instantiate a registered agent over a toolkit (registry.py:163)."""
        return cls.resolve(agent_type)(toolkit, complete_fn=complete_fn)

    @classmethod
    def is_registered(cls, agent_type: str) -> bool:
        return agent_type in cls._agents or agent_type in cls._aliases

    @classmethod
    def types(cls) -> list[str]:
        return sorted(cls._agents)

    @classmethod
    def list_agents(cls) -> dict[str, dict]:
        """Metadata summary per registered type (registry.py:243-274)."""
        out = {}
        for agent_type, agent_class in cls._agents.items():
            meta = agent_class(toolkit=None).metadata
            out[agent_type] = {
                "name": meta.name,
                "description": meta.description,
                "capabilities": [c.value for c in meta.capabilities],
                "modes": [m.value for m in meta.supported_modes],
                "version": meta.version,
                "tags": list(meta.tags),
            }
        return out

    @classmethod
    def by_capability(
        cls, capability: AgentCapability
    ) -> dict[str, type[BaseAgent]]:
        return {
            t: c
            for t, c in cls._agents.items()
            if capability in c(toolkit=None).metadata.capabilities
        }

    @classmethod
    def by_mode(cls, mode: AgentMode) -> dict[str, type[BaseAgent]]:
        return {
            t: c
            for t, c in cls._agents.items()
            if mode in c(toolkit=None).metadata.supported_modes
        }

    @classmethod
    def discover(cls, keywords: Iterable[str]) -> list[str]:
        """Types whose name/description/tags mention any keyword
        (registry.py:327 discover_agent)."""
        kws = [k.lower() for k in keywords]
        hits = []
        for agent_type, agent_class in cls._agents.items():
            meta = agent_class(toolkit=None).metadata
            haystack = " ".join(
                [meta.name, meta.description, *meta.tags]
            ).lower()
            if any(k in haystack for k in kws):
                hits.append(agent_type)
        return sorted(hits)

    @classmethod
    def check_health(cls, agent_type: str) -> dict:
        """Instantiation + metadata smoke check (registry.py:439-484)."""
        try:
            agent = cls.resolve(agent_type)(toolkit=None)
            meta = agent.metadata
            return {
                "agent_type": agent_type,
                "healthy": bool(meta.name and meta.capabilities),
                "name": meta.name,
            }
        except Exception as exc:
            return {"agent_type": agent_type, "healthy": False, "error": str(exc)}

    @classmethod
    def clear(cls) -> None:
        cls._agents.clear()
        cls._aliases.clear()


def register_builtin_agents() -> None:
    """Idempotently register the stock agents (the reference registers
    at import via decorators; explicit here so tests can clear/reload)."""
    from robosystems_spark.agents.cypher_agent import CypherAgent
    from robosystems_spark.agents.financial import FinancialAgent

    for agent_type, agent_class in (
        ("cypher", CypherAgent),
        ("financial", FinancialAgent),
    ):
        if not AgentRegistry.is_registered(agent_type):
            AgentRegistry.register(agent_type)(agent_class)
    if not AgentRegistry.is_registered("default"):
        AgentRegistry.add_alias("default", "cypher")
