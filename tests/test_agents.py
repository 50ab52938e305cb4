"""Agent layer (X4): NL→Cypher, registry, orchestrator routing.

Mirrors the reference's agent semantics
(/root/reference/robosystems/operations/agents/): mode budgets,
can_handle routing, the LLM seam (exercised with fakes — the real
client is injected in production), and the deterministic grammar that
makes the layer fully testable without a model.
"""

from __future__ import annotations

import pytest

from robosystems_spark.agents import (
    AgentError,
    AgentMode,
    AgentOrchestrator,
    AgentRegistry,
    CypherAgent,
    FinancialAgent,
    GenerationError,
    OrchestratorConfig,
    RoutingStrategy,
    SelectionCriteria,
    generate_cypher,
    register_builtin_agents,
)
from robosystems_spark.agents.base import AgentCapability
from robosystems_spark.cypher import CypherEngine
from robosystems_spark.queryapi.cypher_gate import CypherGate
from robosystems_spark.queryapi.tools import GraphToolkit


@pytest.fixture(scope="module")
def toolkit(spark):
    mk = spark.createDataFrame
    engine = CypherEngine(
        {
            "Person": mk(
                [("p1", "Ada", 35, "eng"), ("p2", "Bo", 28, "eng"),
                 ("p3", "Cy", 41, "sales")],
                ["identifier", "name", "age", "dept"],
            ),
            "Company": mk([("c1", "Initech"), ("c2", "Globex")],
                          ["identifier", "name"]),
            "WORKS_FOR": mk([("p1", "c1"), ("p2", "c1"), ("p3", "c2")],
                            ["src", "dst"]),
        }
    )
    return GraphToolkit(CypherGate(engine))


@pytest.fixture(scope="module")
def fin_toolkit(spark):
    mk = spark.createDataFrame
    engine = CypherEngine(
        {
            "Element": mk(
                [("el1", "Revenues", "revenue"), ("el2", "Assets", "asset")],
                ["identifier", "name", "classification"],
            ),
            "Fact": mk(
                [("f1", "100", 100.0), ("f2", "50", 50.0), ("f3", "7", 7.0)],
                ["identifier", "value", "numeric_value"],
            ),
            "FACT_HAS_ELEMENT": mk(
                [("f1", "el1"), ("f2", "el1"), ("f3", "el2")], ["src", "dst"]
            ),
        }
    )
    return GraphToolkit(CypherGate(engine))


SCHEMA = {
    "nodes": {
        "Person": {"columns": {"identifier": "string", "name": "string",
                               "age": "bigint", "dept": "string"}},
        "Company": {"columns": {"identifier": "string", "name": "string"}},
    },
    "relationships": {
        "WORKS_FOR": {"columns": {"src": "string", "dst": "string"},
                      "from_node": "Person", "to_node": "Company"},
    },
}


class TestNL2Cypher:
    def test_plain_count(self):
        for phrasing in ("How many people are there?", "How many persons?"):
            g = generate_cypher(phrasing, SCHEMA)
            assert g.cypher == "MATCH (n:Person) RETURN count(n) AS count"

    def test_plain_count_label_word(self):
        g = generate_cypher("count the companies", SCHEMA)
        assert g.cypher == "MATCH (n:Company) RETURN count(n) AS count"

    def test_grouped_count(self):
        g = generate_cypher("how many persons per dept", SCHEMA)
        assert "n.dept AS dept" in g.cypher and "count(n) AS count" in g.cypher

    def test_aggregate(self):
        g = generate_cypher("what is the average age of persons?", SCHEMA)
        assert g.cypher == "MATCH (n:Person) RETURN avg(n.age) AS avg_age"

    def test_listing_with_order(self):
        g = generate_cypher("show top 2 persons by age", SCHEMA)
        assert "LIMIT 2" in g.cypher and "ORDER BY age DESC" in g.cypher

    def test_traversal(self):
        g = generate_cypher("which persons work for companies?", SCHEMA)
        assert "-[:WORKS_FOR]-" in g.cypher

    def test_unsupported_raises(self):
        with pytest.raises(GenerationError):
            generate_cypher("tell me a joke", SCHEMA)


class TestCypherAgent:
    def test_rule_based_end_to_end(self, toolkit):
        agent = CypherAgent(toolkit)
        stages = []
        resp = agent.analyze(
            "How many persons are there?",
            mode=AgentMode.QUICK,
            callback=lambda stage, pct, msg: stages.append((stage, pct)),
        )
        assert "3" in resp.content
        assert resp.metadata["generator"] == "rules"
        assert resp.metadata["row_count"] == 1
        assert resp.tools_called == ["get-graph-schema", "read-graph-cypher"]
        assert stages[0] == ("initialization", 10)
        assert stages[-1] == ("completion", 100)

    def test_grouped_count_values(self, toolkit):
        resp = CypherAgent(toolkit).analyze("how many persons per dept")
        assert resp.metadata["row_count"] == 2
        assert "eng | 2" in resp.content

    def test_llm_seam_used_when_injected(self, toolkit):
        def fake_llm(system, messages):
            assert "Cypher" in system
            assert "Graph schema" in messages[-1]["content"]
            return "```cypher\nMATCH (c:Company) RETURN c.name AS name " \
                   "ORDER BY name\n```"

        agent = CypherAgent(toolkit, complete_fn=fake_llm)
        resp = agent.analyze("list companies")
        assert resp.metadata["generator"] == "llm"
        assert "Globex" in resp.content and "Initech" in resp.content
        assert agent.total_tokens_used["output"] > 0

    def test_llm_repair_loop(self, toolkit):
        calls = []

        def flaky_llm(system, messages):
            calls.append(messages[-1]["content"])
            if len(calls) == 1:
                return "MATCH (x:Nope) RETURN x.name AS name"
            assert "failed with" in messages[-1]["content"]
            return "MATCH (p:Person) RETURN count(p) AS n"

        resp = CypherAgent(toolkit, complete_fn=flaky_llm).analyze("count persons")
        assert resp.metadata["row_count"] == 1
        assert len(calls) == 2

    def test_quick_mode_budget_bounds_repair(self, toolkit):
        def always_bad(system, messages):
            return "MATCH (x:Nope) RETURN x.name AS name"

        with pytest.raises(AgentError, match="budget exhausted"):
            CypherAgent(toolkit, complete_fn=always_bad).analyze(
                "count persons", mode=AgentMode.QUICK
            )

    def test_unsupported_mode(self, toolkit):
        with pytest.raises(AgentError, match="does not support"):
            CypherAgent(toolkit).analyze("count persons", mode=AgentMode.STREAMING)


class TestFinancialAgent:
    def test_quick(self, fin_toolkit):
        resp = FinancialAgent(fin_toolkit).analyze(
            "top revenue elements", mode=AgentMode.QUICK
        )
        assert "Revenues" in resp.content
        assert resp.tools_called == ["discover-common-elements"]

    def test_standard_narrows_by_term(self, fin_toolkit):
        resp = FinancialAgent(fin_toolkit).analyze("show revenue facts")
        assert "discover-facts" in resp.tools_called
        assert "Revenues" in resp.content

    def test_extended_runs_grid(self, fin_toolkit):
        resp = FinancialAgent(fin_toolkit).analyze(
            "full financial report of assets and revenue",
            mode=AgentMode.EXTENDED,
        )
        assert "build-fact-grid" in resp.tools_called

    def test_confidence_scoring(self, fin_toolkit):
        a = FinancialAgent(fin_toolkit)
        assert a.can_handle("revenue and assets on the balance sheet") >= 0.9
        assert a.can_handle("how many persons are there") <= 0.2


class TestRegistryAndOrchestrator:
    def test_registry_contents(self):
        register_builtin_agents()
        assert set(AgentRegistry.types()) >= {"cypher", "financial"}
        listed = AgentRegistry.list_agents()
        assert listed["financial"]["capabilities"][0] == "financial_analysis"
        assert AgentRegistry.is_registered("default")  # alias
        by_cap = AgentRegistry.by_capability(AgentCapability.FINANCIAL_ANALYSIS)
        assert list(by_cap) == ["financial"]
        assert "financial" in AgentRegistry.discover(["sec"])
        assert AgentRegistry.check_health("cypher")["healthy"]

    def test_best_match_routes_financial(self, fin_toolkit):
        orch = AgentOrchestrator(fin_toolkit)
        resp = orch.route_query(
            "show revenue facts from the filing", mode=AgentMode.QUICK
        )
        assert resp.agent_name == "Financial Agent"
        assert resp.metadata["routing_strategy"] == "best_match"

    def test_best_match_routes_cypher(self, toolkit):
        orch = AgentOrchestrator(toolkit)
        resp = orch.route_query("how many persons per dept")
        assert resp.agent_name == "Cypher Agent"
        assert resp.metadata["row_count"] == 2

    def test_explicit_and_cache(self, toolkit):
        orch = AgentOrchestrator(toolkit)
        r1 = orch.route_query("count persons", agent_type="cypher")
        r2 = orch.route_query("count persons", agent_type="cypher")
        assert r1.metadata["routing_strategy"] == "explicit"
        assert r2.metadata.get("from_cache") is True
        m = orch.get_metrics()
        assert m["cache_hits"] == 1 and m["total_queries"] == 2

    def test_criteria_excludes(self, fin_toolkit):
        orch = AgentOrchestrator(fin_toolkit)
        resp = orch.route_query(
            "show revenue facts",
            mode=AgentMode.QUICK,
            criteria=SelectionCriteria(exclude_agents=["financial"]),
        )
        assert resp.agent_name != "Financial Agent"

    def test_ensemble(self, fin_toolkit):
        orch = AgentOrchestrator(
            fin_toolkit,
            config=OrchestratorConfig(routing_strategy=RoutingStrategy.ENSEMBLE),
        )
        resp = orch.route_query("count the elements with revenue", mode=AgentMode.QUICK)
        assert resp.agent_name.startswith("ensemble(")
        assert len(resp.metadata["ensemble_members"]) == 2

    def test_routing_error_envelope(self, toolkit):
        orch = AgentOrchestrator(toolkit)
        resp = orch.route_query("count persons", agent_type="nope")
        assert resp.error_details["code"] == "ROUTING_ERROR"
        assert "nope" in resp.error_details["message"]

    def test_coordinate_sequential_threads_context(self, fin_toolkit):
        orch = AgentOrchestrator(fin_toolkit)
        out = orch.coordinate_agents(
            "count the elements", ["cypher", "financial"], mode=AgentMode.QUICK
        )
        assert [r.agent_name for r in out] == ["Cypher Agent", "Financial Agent"]

    def test_coordinate_parallel(self, fin_toolkit):
        orch = AgentOrchestrator(fin_toolkit)
        out = orch.coordinate_agents(
            "count the facts", ["cypher", "financial"],
            mode=AgentMode.QUICK, parallel=True,
        )
        assert len(out) == 2

    def test_recommendations(self, fin_toolkit):
        orch = AgentOrchestrator(fin_toolkit)
        recs = orch.recommendations("revenue on the balance sheet")
        assert recs[0]["agent_type"] == "financial"
        assert recs[0]["confidence"] > recs[-1]["confidence"]


class TestAgentService:
    """Serving surface (reference agent router semantics)."""

    def test_list_and_filter(self, toolkit):
        from robosystems_spark.serving.agents import AgentService

        svc = AgentService(toolkit)
        out = svc.list_agents()
        assert out["total"] >= 2
        fin = svc.list_agents(capability="financial_analysis")
        assert list(fin["agents"]) == ["financial"]

    def test_sync_strategy_for_standard(self, toolkit):
        from robosystems_spark.serving.agents import AgentService

        svc = AgentService(toolkit)
        resp = svc.analyze("count persons")
        assert resp.agent_name == "Cypher Agent"

    def test_extended_goes_async_with_progress(self, fin_toolkit):
        from robosystems_spark.agents import AgentMode
        from robosystems_spark.serving.agents import AgentService
        from robosystems_spark.serving.tasks import TaskState

        svc = AgentService(fin_toolkit)
        task_id = svc.analyze(
            "full revenue report", agent_type="financial",
            mode=AgentMode.EXTENDED,
        )
        assert isinstance(task_id, str)
        info = svc.runner.wait(task_id, timeout_s=120)
        assert info.state == TaskState.COMPLETED
        assert info.result.agent_name == "Financial Agent"
        assert any("analysis" in e.get("message", "") for e in info.events)
        events = list(svc.sse_progress(task_id))
        assert events and events[0].operation_id == task_id

    def test_sync_override(self, fin_toolkit):
        from robosystems_spark.agents import AgentMode
        from robosystems_spark.serving.agents import AgentService

        svc = AgentService(fin_toolkit)
        resp = svc.analyze(
            "full revenue report", agent_type="financial",
            mode=AgentMode.EXTENDED, response_mode="sync",
        )
        assert resp.agent_name == "Financial Agent"


class TestContextEnricher:
    def test_semantic_memory_and_entities(self):
        from robosystems_spark.agents.context import ContextEnricher, RAGConfig

        enr = ContextEnricher(RAGConfig(similarity_threshold=0.1))
        enr.remember("Quarterly revenue grew 12% for Initech",
                     {"source": "q3-report"})
        enr.remember("The cafeteria menu changed on Tuesday")
        ctx = enr.enrich(
            "What was the revenue growth in the 2024-03-31 filing? $5 million"
        )
        assert ctx["context_enriched"] is True
        matches = ctx["semantic_matches"]
        assert matches and "revenue" in matches[0]["content"].lower()
        etypes = {e["type"] for e in ctx["entities"]}
        assert {"date", "money"} <= etypes

    def test_cache_and_passthrough_context(self):
        from robosystems_spark.agents.context import ContextEnricher, RAGConfig

        enr = ContextEnricher(RAGConfig(enable_caching=True))
        first = enr.enrich("count the orders", {"user": "u1"})
        assert "from_cache" not in first and first["user"] == "u1"
        second = enr.enrich("count the orders", {"user": "u2"})
        assert second["from_cache"] is True and second["user"] == "u2"

    def test_orchestrator_rag_wiring(self, toolkit):
        from robosystems_spark.agents.context import ContextEnricher, RAGConfig

        enr = ContextEnricher(RAGConfig(similarity_threshold=0.0))
        enr.remember("Persons are employees of companies")
        orch = AgentOrchestrator(toolkit, context_enricher=enr)
        resp = orch.route_query("how many persons per dept")
        assert resp.metadata["row_count"] == 2  # enrichment didn't break routing

    def test_vector_store_roundtrip(self):
        from robosystems_spark.agents.context import (
            DocumentChunk,
            MemoryVectorStore,
        )

        store = MemoryVectorStore()
        ids = store.add_documents(
            [DocumentChunk(content="alpha beta"), DocumentChunk(content="gamma")]
        )
        assert len(ids) == 2
        hits = store.search("alpha beta", k=1)
        assert hits[0][0].content == "alpha beta"
        store.delete_documents(ids)
        assert store.search("alpha", k=5) == []
