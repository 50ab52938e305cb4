"""Agent orchestrator: routing strategies, coordination, metrics.

Re-expresses the reference's AgentOrchestrator
(/root/reference/robosystems/operations/agents/orchestrator.py:26-867):
the same routing strategies (explicit, best-match over can_handle
scores, capability-based, ensemble, round-robin), sequential/parallel
multi-agent coordination, a bounded response cache, per-agent usage
metrics and a fallback agent on routing failure — synchronous, over
registry-instantiated agents sharing one toolkit.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable

from robosystems_spark.agents.base import (
    AgentCapability,
    AgentMode,
    AgentResponse,
    BaseAgent,
)
from robosystems_spark.agents.registry import AgentRegistry, register_builtin_agents


class RoutingStrategy(Enum):
    """Agent selection strategies (orchestrator.py:26-34)."""

    BEST_MATCH = "best_match"
    CAPABILITY_BASED = "capability_based"
    ENSEMBLE = "ensemble"
    ROUND_ROBIN = "round_robin"


@dataclass
class SelectionCriteria:
    """Constraints for agent selection (orchestrator.py:37-45)."""

    required_capabilities: list[AgentCapability] = field(default_factory=list)
    min_confidence: float = 0.0
    exclude_agents: list[str] = field(default_factory=list)


@dataclass
class OrchestratorConfig:
    routing_strategy: RoutingStrategy = RoutingStrategy.BEST_MATCH
    enable_cache: bool = True
    cache_max_entries: int = 256
    ensemble_size: int = 2
    fallback_agent: str = "cypher"
    enable_rag: bool = False  # context enrichment before routing


class AgentOrchestrator:
    """Routes queries to agents and coordinates multi-agent runs."""

    def __init__(
        self,
        toolkit,
        complete_fn=None,
        config: OrchestratorConfig | None = None,
        context_enricher=None,
    ):
        register_builtin_agents()
        self.toolkit = toolkit
        self.complete_fn = complete_fn
        self.config = config or OrchestratorConfig()
        if context_enricher is None and self.config.enable_rag:
            from robosystems_spark.agents.context import ContextEnricher

            context_enricher = ContextEnricher()
        self.context_enricher = context_enricher
        self._cache: dict[str, AgentResponse] = {}
        self._rr_index = 0
        self._metrics: dict = {
            "total_queries": 0,
            "cache_hits": 0,
            "cache_misses": 0,
            "errors": 0,
            "total_response_time": 0.0,
            "agent_usage": {},
        }

    # -- public API ---------------------------------------------------------

    def route_query(
        self,
        query: str,
        agent_type: str | None = None,
        mode: AgentMode = AgentMode.STANDARD,
        history: list[dict] | None = None,
        context: dict | None = None,
        criteria: SelectionCriteria | None = None,
        callback: Callable[[str, int, str], None] | None = None,
        ensemble_size: int | None = None,
    ) -> AgentResponse:
        """Select an agent (or several) and run it (orchestrator.py:117-253)."""
        start = time.time()
        self._metrics["total_queries"] += 1
        cache_key = self._cache_key(query, agent_type, mode)
        if self.config.enable_cache and cache_key in self._cache:
            self._metrics["cache_hits"] += 1
            cached = self._cache[cache_key]
            cached.metadata["from_cache"] = True
            return cached
        self._metrics["cache_misses"] += 1
        if self.context_enricher is not None:
            context = self.context_enricher.enrich(query, context)

        try:
            if agent_type is not None:
                response = self._run(agent_type, query, mode, history, context, callback)
                strategy = "explicit"
            elif self.config.routing_strategy == RoutingStrategy.ENSEMBLE:
                response = self._ensemble(
                    query, mode, history, context,
                    ensemble_size or self.config.ensemble_size,
                )
                strategy = "ensemble"
            elif self.config.routing_strategy == RoutingStrategy.CAPABILITY_BASED:
                response = self._capability_based(
                    query, mode, history, context, criteria
                )
                strategy = "capability_based"
            elif self.config.routing_strategy == RoutingStrategy.ROUND_ROBIN:
                response = self._round_robin(query, mode, history, context)
                strategy = "round_robin"
            else:
                response = self._best_match(
                    query, mode, history, context, criteria, callback
                )
                strategy = "best_match"
            response.metadata["routing_strategy"] = strategy
        except Exception as exc:
            self._metrics["errors"] += 1
            response = AgentResponse(
                content=f"Failed to process query: {exc}",
                agent_name="orchestrator",
                mode_used=mode,
                error_details={"code": "ROUTING_ERROR", "message": str(exc)},
            )

        response.execution_time = time.time() - start
        self._metrics["total_response_time"] += response.execution_time
        usage = self._metrics["agent_usage"].setdefault(
            response.agent_name, {"calls": 0, "total_time": 0.0}
        )
        usage["calls"] += 1
        usage["total_time"] += response.execution_time
        if self.config.enable_cache and response.error_details is None:
            if len(self._cache) >= self.config.cache_max_entries:
                self._cache.pop(next(iter(self._cache)))
            self._cache[cache_key] = response
        return response

    def coordinate_agents(
        self,
        query: str,
        agent_types: list[str],
        mode: AgentMode = AgentMode.STANDARD,
        parallel: bool = False,
        context: dict | None = None,
    ) -> list[AgentResponse]:
        """Run several agents on one query (orchestrator.py:593-718).
        Sequential mode threads each agent's content into the next
        agent's context (the reference's coordination chain);
        parallel mode fans out via threads."""
        if not parallel:
            responses: list[AgentResponse] = []
            ctx = dict(context or {})
            for agent_type in agent_types:
                resp = self.route_query(
                    query, agent_type=agent_type, mode=mode, context=ctx
                )
                ctx["previous_analysis"] = resp.content
                responses.append(resp)
            return responses
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(len(agent_types), 1)) as pool:
            futures = [
                pool.submit(
                    self.route_query, query, agent_type=t, mode=mode,
                    context=dict(context or {}),
                )
                for t in agent_types
            ]
            return [f.result() for f in futures]

    def recommendations(self, query: str, top_n: int = 3) -> list[dict]:
        """Ranked (agent, confidence) suggestions (orchestrator.py:719-749)."""
        scored = [
            {"agent_type": t, "confidence": a.can_handle(query)}
            for t, a in self._instantiate_all().items()
        ]
        scored.sort(key=lambda d: (-d["confidence"], d["agent_type"]))
        return scored[:top_n]

    def get_metrics(self) -> dict:
        m = dict(self._metrics)
        n = max(m["total_queries"], 1)
        m["avg_response_time"] = m["total_response_time"] / n
        return m

    # -- strategies ---------------------------------------------------------

    def _instantiate_all(self) -> dict[str, BaseAgent]:
        return {
            t: AgentRegistry.create(t, self.toolkit, complete_fn=self.complete_fn)
            for t in AgentRegistry.types()
        }

    def _eligible(
        self, criteria: SelectionCriteria | None
    ) -> dict[str, BaseAgent]:
        agents = self._instantiate_all()
        if criteria is None:
            return agents
        out = {}
        for t, a in agents.items():
            if t in criteria.exclude_agents:
                continue
            if any(
                not a.has_capability(c) for c in criteria.required_capabilities
            ):
                continue
            out[t] = a
        return out

    def _run(
        self, agent_type, query, mode, history, context, callback=None
    ) -> AgentResponse:
        agent = AgentRegistry.create(
            agent_type, self.toolkit, complete_fn=self.complete_fn
        )
        return agent.analyze(
            query, mode=mode, history=history, context=context, callback=callback
        )

    def _best_match(
        self, query, mode, history, context, criteria, callback=None
    ) -> AgentResponse:
        agents = self._eligible(criteria)
        min_conf = criteria.min_confidence if criteria else 0.0
        scored = sorted(
            (
                (a.can_handle(query, context), t)
                for t, a in agents.items()
            ),
            reverse=True,
        )
        if not scored or scored[0][0] < min_conf:
            return self._run(
                self.config.fallback_agent, query, mode, history, context,
                callback,
            )
        best_score, best_type = scored[0]
        resp = agents[best_type].analyze(
            query, mode=mode, history=history, context=context,
            callback=callback,
        )
        resp.confidence_score = best_score
        return resp

    def _capability_based(
        self, query, mode, history, context, criteria
    ) -> AgentResponse:
        agents = self._eligible(criteria or SelectionCriteria())
        if not agents:
            return self._run(
                self.config.fallback_agent, query, mode, history, context
            )
        best_type = max(
            agents, key=lambda t: (agents[t].can_handle(query, context), t)
        )
        return agents[best_type].analyze(
            query, mode=mode, history=history, context=context
        )

    def _ensemble(
        self, query, mode, history, context, size
    ) -> AgentResponse:
        """Run the top-N scoring agents and merge (orchestrator.py:374-428)."""
        agents = self._instantiate_all()
        ranked = sorted(
            agents, key=lambda t: (-agents[t].can_handle(query, context), t)
        )[: max(size, 1)]
        responses = [
            agents[t].analyze(query, mode=mode, history=history, context=context)
            for t in ranked
        ]
        merged = "\n\n---\n\n".join(
            f"[{r.agent_name}]\n{r.content}" for r in responses
        )
        return AgentResponse(
            content=merged,
            agent_name="ensemble(" + "+".join(ranked) + ")",
            mode_used=mode,
            metadata={"ensemble_members": ranked},
            tools_called=[c for r in responses for c in r.tools_called],
            tokens_used={
                "input": sum(r.tokens_used.get("input", 0) for r in responses),
                "output": sum(r.tokens_used.get("output", 0) for r in responses),
            },
        )

    def _round_robin(self, query, mode, history, context) -> AgentResponse:
        types = AgentRegistry.types()
        agent_type = types[self._rr_index % len(types)]
        self._rr_index += 1
        return self._run(agent_type, query, mode, history, context)

    @staticmethod
    def _cache_key(query: str, agent_type: str | None, mode: AgentMode) -> str:
        raw = f"{query}|{agent_type}|{mode.value}"
        return hashlib.sha256(raw.encode()).hexdigest()[:32]
