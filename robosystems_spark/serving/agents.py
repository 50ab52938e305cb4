"""Agent serving surface: the /agent endpoint semantics.

Re-expresses the reference's agent router
(/root/reference/robosystems/routers/graphs/agent/execute.py:117-675):
list/describe agents with capability filtering, auto-select or
explicit-agent analyze, recommendations, and the three execution
strategies — sync for quick modes, background task + progress polling
for extended runs, and an SSE progress feed bridged from the agent's
stage callbacks (the same init/analysis/execution/formatting stages
the reference streams).
"""

from __future__ import annotations

from typing import Iterator

from robosystems_spark.agents import (
    AgentMode,
    AgentOrchestrator,
    AgentRegistry,
    AgentResponse,
    OrchestratorConfig,
    register_builtin_agents,
)
from robosystems_spark.serving.sse import SSEEvent, progress_events
from robosystems_spark.serving.tasks import BackgroundTaskRunner, TaskInfo


class AgentService:
    """The agent endpoint: discovery + mode-strategized execution."""

    # modes that answer inline vs. go to the background queue
    _SYNC_MODES = {AgentMode.QUICK, AgentMode.STANDARD, AgentMode.STREAMING}

    def __init__(
        self,
        toolkit,
        complete_fn=None,
        config: OrchestratorConfig | None = None,
        runner: BackgroundTaskRunner | None = None,
    ):
        register_builtin_agents()
        self.orchestrator = AgentOrchestrator(toolkit, complete_fn, config)
        self.runner = runner or BackgroundTaskRunner()

    # -- discovery (execute.py list_agents) ---------------------------------

    def list_agents(self, capability: str | None = None) -> dict:
        agents = AgentRegistry.list_agents()
        if capability:
            agents = {
                k: v
                for k, v in agents.items()
                if capability in v.get("capabilities", [])
            }
        return {"agents": agents, "total": len(agents)}

    def recommendations(self, query: str, top_n: int = 3) -> list[dict]:
        return self.orchestrator.recommendations(query, top_n)

    # -- execution strategies (execute.py POST /agent) ----------------------

    def analyze(
        self,
        query: str,
        agent_type: str | None = None,
        mode: AgentMode = AgentMode.STANDARD,
        history: list[dict] | None = None,
        context: dict | None = None,
        response_mode: str = "auto",
    ) -> AgentResponse | str:
        """Auto strategy: quick/standard answer synchronously, extended
        goes to the background queue (returns the task id).  Override
        with ``response_mode='sync'|'async'``."""
        go_async = (
            response_mode == "async"
            or (response_mode == "auto" and mode not in self._SYNC_MODES)
        )
        if not go_async:
            return self.orchestrator.route_query(
                query, agent_type=agent_type, mode=mode,
                history=history, context=context,
            )
        return self.runner.submit(
            self._run_with_progress, query, agent_type, mode, history, context
        )

    def _run_with_progress(
        self, progress, query, agent_type, mode, history, context
    ) -> AgentResponse:
        def callback(stage: str, pct: int, message: str) -> None:
            progress(pct / 100.0, f"{stage}: {message}")

        return self.orchestrator.route_query(
            query, agent_type=agent_type, mode=mode,
            history=history, context=context, callback=callback,
        )

    def task_status(self, task_id: str) -> TaskInfo:
        return self.runner.status(task_id)

    def sse_progress(self, task_id: str) -> Iterator[SSEEvent]:
        """The task's progress feed in the standard SSE envelope —
        replay of events so far plus terminal state (clients poll-resume
        with Last-Event-ID in the reference; same sequence numbers)."""
        info = self.runner.status(task_id)
        return progress_events(task_id, iter(list(info.events)))
