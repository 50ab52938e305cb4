"""Cypher-subset compiler tests against the reference's query corpus:
trial balance (trial_balance.py:36-57), label counts UNION ALL,
OPTIONAL MATCH rollups, colleague self-join
(custom_graph_demo/05_query_graph.py:45-128), fd-IS-NULL anti-join
(fact_query.py:78-82), CASE aggregation
(accounting_demo/05_query_graph.py:129-140), parameters, CONTAINS.
"""

from __future__ import annotations

import pytest

from robosystems_spark.cypher import CypherEngine


@pytest.fixture(scope="module")
def graph(spark):
    """Custom-graph-demo fixture: people, companies, projects."""
    mk = spark.createDataFrame
    tables = {
        "Person": mk(
            [
                ("p1", "Ada", 35, "Engineer"),
                ("p2", "Bo", 28, "Analyst"),
                ("p3", "Cy", 41, "Manager"),
                ("p4", "Di", 22, "Intern"),
            ],
            ["identifier", "name", "age", "title"],
        ),
        "Company": mk(
            [("c1", "Initech", "Software"), ("c2", "Globex", "Energy")],
            ["identifier", "name", "industry"],
        ),
        "Project": mk(
            [("j1", "Apollo", 120000.0), ("j2", "Zephyr", 40000.0)],
            ["identifier", "name", "budget"],
        ),
        "WORKS_FOR": mk(
            [("p1", "c1", "dev"), ("p2", "c1", "data"), ("p3", "c2", "mgmt")],
            ["src", "dst", "role"],
        ),
        "WORKS_ON": mk(
            [("p1", "j1", 20), ("p2", "j1", 10), ("p3", "j2", 30)],
            ["src", "dst", "hours_per_week"],
        ),
        "SPONSORS": mk([("c1", "j1", 100000.0)], ["src", "dst", "committed"]),
    }
    return CypherEngine(tables)


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_basic_match_project_order(graph):
    out = graph.query(
        "MATCH (p:Person) WHERE p.age >= 28 "
        "RETURN p.name AS name, p.age AS age ORDER BY p.age DESC"
    )
    assert rows(out) == [("Cy", 41), ("Ada", 35), ("Bo", 28)]


def test_hop_join_and_edge_props(graph):
    out = graph.query(
        "MATCH (p:Person)-[w:WORKS_FOR]->(c:Company) "
        "RETURN p.name AS person, w.role AS role, c.name AS company ORDER BY p.name"
    )
    assert rows(out) == [
        ("Ada", "dev", "Initech"),
        ("Bo", "data", "Initech"),
        ("Cy", "mgmt", "Globex"),
    ]


def test_reverse_direction(graph):
    out = graph.query(
        "MATCH (c:Company)<-[:WORKS_FOR]-(p:Person) WHERE c.name = 'Initech' "
        "RETURN p.name AS name ORDER BY p.name"
    )
    assert rows(out) == [("Ada",), ("Bo",)]


def test_undirected(graph):
    out = graph.query(
        "MATCH (a:Person)-[:WORKS_FOR]-(b:Company) RETURN count(*) AS n"
    )
    assert rows(out) == [(3,)]


def test_implicit_grouping_with_sum(graph):
    """The trial-balance shape: WITH carries a node + aggregates."""
    out = graph.query(
        "MATCH (p:Person)-[w:WORKS_ON]->(j:Project) "
        "WITH j, sum(w.hours_per_week) AS total_hours, count(p) AS people "
        "RETURN j.name AS project, total_hours, people, "
        "total_hours / people AS avg_hours ORDER BY j.name"
    )
    assert rows(out) == [("Apollo", 30, 2, 15.0), ("Zephyr", 30, 1, 30.0)]


def test_optional_match_rollup(graph):
    out = graph.query(
        "MATCH (c:Company) OPTIONAL MATCH (p:Person)-[:WORKS_FOR]->(c) "
        "WITH c, count(DISTINCT p) AS employees "
        "RETURN c.name AS company, employees ORDER BY c.name"
    )
    assert rows(out) == [("Globex", 1), ("Initech", 2)]


def test_optional_match_preserves_unmatched(graph):
    out = graph.query(
        "MATCH (j:Project) OPTIONAL MATCH (c:Company)-[:SPONSORS]->(j) "
        "RETURN j.name AS project, c.name AS sponsor ORDER BY j.name"
    )
    assert rows(out) == [("Apollo", "Initech"), ("Zephyr", None)]


def test_fd_is_null_anti_join_idiom(graph):
    """OPTIONAL MATCH ... WHERE x IS NULL -> anti-join (fact_query.py:78-79)."""
    out = graph.query(
        "MATCH (j:Project) OPTIONAL MATCH (c:Company)-[:SPONSORS]->(j) "
        "WHERE c IS NULL RETURN j.name AS project"
    )
    assert rows(out) == [("Zephyr",)]


def test_comma_pattern_colleague_self_join(graph):
    out = graph.query(
        "MATCH (p1:Person)-[:WORKS_FOR]->(c1:Company), "
        "(p2:Person)-[:WORKS_FOR]->(c1) WHERE p1 < p2 "
        "RETURN p1.name AS a, p2.name AS b, c1.name AS company"
    )
    assert rows(out) == [("Ada", "Bo", "Initech")]


def test_union_all_label_counts(graph):
    out = graph.query(
        "MATCH (n:Person) RETURN 'Person' AS label, count(n) AS cnt "
        "UNION ALL MATCH (n:Company) RETURN 'Company' AS label, count(n) AS cnt "
        "UNION ALL MATCH (n:Project) RETURN 'Project' AS label, count(n) AS cnt"
    )
    assert sorted(rows(out)) == [("Company", 2), ("Person", 4), ("Project", 2)]


def test_case_when_conditional_agg(graph):
    out = graph.query(
        "MATCH (p:Person) RETURN "
        "sum(CASE WHEN p.age >= 30 THEN 1 ELSE 0 END) AS senior, "
        "sum(CASE WHEN p.age < 30 THEN 1 ELSE 0 END) AS junior"
    )
    assert rows(out) == [(2, 2)]


def test_parameters_and_in_list(graph):
    out = graph.query(
        "MATCH (p:Person) WHERE p.title IN $titles AND p.age > $min_age "
        "RETURN p.name AS name ORDER BY p.name",
        params={"titles": ["Engineer", "Manager", "Intern"], "min_age": 30},
    )
    assert rows(out) == [("Ada",), ("Cy",)]


def test_contains_and_string_ops(graph):
    out = graph.query(
        "MATCH (c:Company) WHERE c.industry CONTAINS 'ware' "
        "RETURN c.name AS name, toInteger('42') AS answer"
    )
    assert rows(out) == [("Initech", 42)]


def test_distinct_skip_limit(graph):
    out = graph.query(
        "MATCH (p:Person)-[:WORKS_FOR]->(c:Company) "
        "RETURN DISTINCT c.name AS name ORDER BY c.name SKIP 1 LIMIT 1"
    )
    assert rows(out) == [("Initech",)]


def test_collect_and_size(graph):
    out = graph.query(
        "MATCH (p:Person)-[:WORKS_FOR]->(c:Company) "
        "WITH c, collect(p.name) AS names "
        "RETURN c.name AS company, size(names) AS n ORDER BY c.name"
    )
    assert rows(out) == [("Globex", 1), ("Initech", 2)]


def test_return_node_as_struct(graph):
    out = graph.query("MATCH (c:Company) RETURN c ORDER BY c.name LIMIT 1")
    row = out.collect()[0]["c"]
    assert row["name"] == "Globex" and row["industry"] == "Energy"


def test_node_property_inline_filter(graph):
    out = graph.query(
        "MATCH (p:Person {title: 'Engineer'})-[:WORKS_FOR]->(c:Company) "
        "RETURN c.name AS company"
    )
    assert rows(out) == [("Initech",)]


def test_with_where_having(graph):
    out = graph.query(
        "MATCH (p:Person)-[w:WORKS_ON]->(j:Project) "
        "WITH j, sum(w.hours_per_week) AS hours WHERE hours > 25 "
        "RETURN j.name AS project, hours ORDER BY j.name"
    )
    assert rows(out) == [("Apollo", 30), ("Zephyr", 30)]


def test_unwind(graph):
    out = graph.query(
        "UNWIND [1, 2, 3] AS x RETURN x, x * 2 AS doubled ORDER BY x"
    )
    assert rows(out) == [(1, 2), (2, 4), (3, 6)]


def test_arithmetic_and_aliases(graph):
    out = graph.query(
        "MATCH (j:Project) RETURN j.name AS name, j.budget / 1000 AS budget_k "
        "ORDER BY j.budget DESC"
    )
    assert rows(out) == [("Apollo", 120.0), ("Zephyr", 40.0)]


def test_error_on_unknown_label(graph):
    from robosystems_spark.cypher.compiler import CypherCompileError

    with pytest.raises(CypherCompileError, match="Unknown node label"):
        graph.query("MATCH (x:Ghost) RETURN x")


def test_error_on_unbound_variable(graph):
    from robosystems_spark.cypher.compiler import CypherCompileError

    with pytest.raises(CypherCompileError, match="Unbound variable"):
        graph.query("MATCH (p:Person) RETURN q.name AS n")


def test_syntax_error(graph):
    from robosystems_spark.cypher.parser import CypherSyntaxError

    with pytest.raises(CypherSyntaxError):
        graph.query("MATCH (p:Person RETURN p")


@pytest.fixture(scope="module")
def chain_graph(spark):
    """Linear management chain for var-length path tests: e1->e2->e3->e4."""
    mk = spark.createDataFrame
    return CypherEngine(
        {
            "Emp": mk(
                [("e1", "A"), ("e2", "B"), ("e3", "C"), ("e4", "D")],
                ["identifier", "name"],
            ),
            "MANAGES": mk([("e1", "e2"), ("e2", "e3"), ("e3", "e4")], ["src", "dst"]),
        }
    )


def test_varlength_bounded(chain_graph):
    out = chain_graph.query(
        "MATCH (a:Emp)-[:MANAGES*1..2]->(b:Emp) WHERE a.name = 'A' "
        "RETURN b.name AS name ORDER BY b.name"
    )
    assert rows(out) == [("B",), ("C",)]


def test_varlength_exact_and_depth_var(chain_graph):
    out = chain_graph.query(
        "MATCH (a:Emp)-[r:MANAGES*2..3]->(b:Emp) "
        "RETURN a.name AS a, b.name AS b, r.depth AS depth ORDER BY a.name, b.name"
    )
    assert rows(out) == [("A", "C", 2), ("A", "D", 3), ("B", "D", 2)]


def test_varlength_unbounded_rejected(chain_graph):
    from robosystems_spark.cypher.compiler import CypherCompileError

    with pytest.raises(CypherCompileError, match="Unbounded"):
        chain_graph.query("MATCH (a:Emp)-[:MANAGES*]->(b:Emp) RETURN a.name AS n")


def test_varlength_undirected(chain_graph):
    out = chain_graph.query(
        "MATCH (a:Emp)-[:MANAGES*1..1]-(b:Emp) WHERE a.name = 'B' "
        "RETURN b.name AS name ORDER BY b.name"
    )
    assert rows(out) == [("A",), ("C",)]


def test_shortest_path_surface(chain_graph):
    """MATCH p = shortestPath((a)-[:R*..N]->(b)) RETURN length(p):
    the Neo4j surface the reference's analyzer cost-flags
    (execution_strategies.py:86-88), compiled to the bounded-BFS
    min-depth pair frame."""
    out = chain_graph.query(
        "MATCH p = shortestPath((a:Emp)-[:MANAGES*1..3]->(b:Emp)) "
        "WHERE a.name = 'A' "
        "RETURN b.name AS name, length(p) AS hops ORDER BY hops"
    )
    assert rows(out) == [("B", 1), ("C", 2), ("D", 3)]


def test_all_shortest_paths_surface(chain_graph):
    """allShortestPaths at endpoint granularity: same minimal-depth
    pairs (path enumeration is out of scope, like the reference)."""
    out = chain_graph.query(
        "MATCH p = allShortestPaths((a:Emp)-[:MANAGES*1..2]->(b:Emp)) "
        "RETURN count(*) AS n, max(length(p)) AS longest"
    )
    assert rows(out) == [(5, 2)]


def test_shortest_path_single_hop_form(chain_graph):
    out = chain_graph.query(
        "MATCH p = shortestPath((a:Emp)-[:MANAGES]->(b:Emp)) "
        "RETURN count(*) AS n, max(length(p)) AS d"
    )
    assert rows(out) == [(3, 1)]


def test_bare_path_variable_rejected(chain_graph):
    from robosystems_spark.cypher.compiler import CypherCompileError

    with pytest.raises(CypherCompileError, match="shortestPath"):
        chain_graph.query(
            "MATCH p = (a:Emp)-[:MANAGES]->(b:Emp) RETURN length(p) AS n"
        )


def test_shortest_path_is_cost_flagged_by_analyzer():
    from robosystems_spark.queryapi.analyzer import analyze_query_features

    info = analyze_query_features(
        "MATCH p = shortestPath((a:Emp)-[:MANAGES*1..3]->(b:Emp)) "
        "RETURN length(p) AS n"
    )
    assert "shortest_path" in info.expensive_patterns


def test_reference_trial_balance_cypher_verbatim(spark):
    """The reference's literal trial-balance query text
    (trial_balance.py:36-57) compiled by our engine must equal the
    hand-built DataFrame view on the same tables."""
    from robosystems_spark.views import trial_balance

    mk = spark.createDataFrame
    tables = {
        "Entity": mk([("e1", "Acme")], ["identifier", "name"]),
        "Element": mk(
            [
                ("cash", "uri:cash", "Cash", "asset", "debit", "instant"),
                ("rev", "uri:rev", "Revenue", "revenue", "credit", "duration"),
            ],
            ["identifier", "uri", "name", "classification", "balance", "period_type"],
        ),
        "Transaction": mk(
            [("t1", 100.0, "2024-01-10"), ("t2", 40.0, "2024-03-01")],
            ["identifier", "amount", "date"],
        ),
        "LineItem": mk(
            [("l1", 100.0, 0.0), ("l2", 0.0, 100.0), ("l3", 40.0, 0.0), ("l4", 0.0, 40.0)],
            ["identifier", "debit_amount", "credit_amount"],
        ),
        "ENTITY_HAS_TRANSACTION": mk([("e1", "t1"), ("e1", "t2")], ["src", "dst"]),
        "TRANSACTION_HAS_LINE_ITEM": mk(
            [("t1", "l1"), ("t1", "l2"), ("t2", "l3"), ("t2", "l4")], ["src", "dst"]
        ),
        "LINE_ITEM_RELATES_TO_ELEMENT": mk(
            [("l1", "cash"), ("l2", "rev"), ("l3", "rev"), ("l4", "cash")], ["src", "dst"]
        ),
    }
    query = """
    MATCH (e:Entity)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction)
          -[:TRANSACTION_HAS_LINE_ITEM]->(li:LineItem)
          -[:LINE_ITEM_RELATES_TO_ELEMENT]->(elem:Element)
    WHERE t.date >= $period_start
      AND t.date <= $period_end

    WITH elem,
         sum(li.debit_amount) AS total_debits,
         sum(li.credit_amount) AS total_credits

    RETURN elem.identifier AS element_id,
           elem.uri AS element_uri,
           elem.name AS element_name,
           elem.classification AS element_classification,
           elem.balance AS element_balance,
           elem.period_type AS element_period_type,
           total_debits,
           total_credits,
           total_debits - total_credits AS net_balance
    ORDER BY elem.name
    """
    params = {"period_start": "2024-01-01", "period_end": "2024-12-31"}
    compiled = CypherEngine(tables).query(query, params)
    view = trial_balance(tables, period_start="2024-01-01", period_end="2024-12-31")
    assert compiled.columns == view.columns
    assert [tuple(r) for r in compiled.collect()] == [tuple(r) for r in view.collect()]


def test_graph_introspection_functions(graph):
    out = graph.query(
        "MATCH (p:Person)-[w:WORKS_FOR]->(c:Company) WHERE p.name = 'Ada' "
        "RETURN labels(p) AS lbls, type(w) AS rel, id(p) AS pid, "
        "keys(c) AS ck, exists(p.title) AS has_title"
    )
    r = out.collect()[0]
    assert r["lbls"] == ["Person"]
    assert r["rel"] == "WORKS_FOR"
    assert r["pid"] == "p1"
    assert set(r["ck"]) == {"identifier", "name", "industry"}
    assert r["has_title"] is True


def test_aggregated_return_order_by_alias_and_key(graph):
    out = graph.query(
        "MATCH (p:Person)-[:WORKS_FOR]->(c:Company) "
        "RETURN c.name AS company, count(p) AS headcount "
        "ORDER BY headcount DESC, company"
    )
    assert rows(out) == [("Initech", 2), ("Globex", 1)]
    out2 = graph.query(
        "MATCH (p:Person)-[:WORKS_FOR]->(c:Company) "
        "RETURN c.name AS company, count(p) AS headcount ORDER BY company DESC"
    )
    assert rows(out2) == [("Initech", 2), ("Globex", 1)]


def test_reference_element_mapping_cypher_verbatim(spark):
    """The reference's literal structure-association query
    (operations/views/element_mapping.py:36-51) — OPTIONAL MATCH
    chains + collect({map literal}) of joined properties."""
    mk = spark.createDataFrame
    engine = CypherEngine(
        {
            "Structure": mk(
                [("s1", "ElementMapping"), ("s2", "Presentation")],
                ["identifier", "type"],
            ),
            "Association": mk(
                [("a1", "sum", 1.0, 1.0), ("a2", "weighted_average", 2.0, 2.0)],
                ["identifier", "preferred_label", "weight", "order_value"],
            ),
            "Element": mk(
                [("e1", "uri:cash"), ("e2", "uri:assets")], ["identifier", "uri"]
            ),
            "STRUCTURE_HAS_ASSOCIATION": mk([("s1", "a1"), ("s1", "a2")], ["src", "dst"]),
            "ASSOCIATION_HAS_FROM_ELEMENT": mk([("a1", "e2"), ("a2", "e2")], ["src", "dst"]),
            "ASSOCIATION_HAS_TO_ELEMENT": mk([("a1", "e1"), ("a2", "e1")], ["src", "dst"]),
        }
    )
    rows = engine.query(
        """
        MATCH (s:Structure)
        WHERE s.identifier = $structure_id AND s.type = 'ElementMapping'
        OPTIONAL MATCH (s)-[:STRUCTURE_HAS_ASSOCIATION]->(a:Association)
        OPTIONAL MATCH (a)-[:ASSOCIATION_HAS_FROM_ELEMENT]->(from_el:Element)
        OPTIONAL MATCH (a)-[:ASSOCIATION_HAS_TO_ELEMENT]->(to_el:Element)
        RETURN s,
               collect({
                 identifier: a.identifier,
                 source_element: from_el.uri,
                 target_element: to_el.uri,
                 aggregation_method: a.preferred_label,
                 weight: a.weight,
                 order_value: a.order_value
               }) as associations
        """,
        {"structure_id": "s1"},
    ).collect()
    assert len(rows) == 1
    assocs = sorted(rows[0]["associations"], key=lambda d: d["order_value"])
    assert [a["identifier"] for a in assocs] == ["a1", "a2"]
    assert assocs[0]["source_element"] == "uri:assets"
    assert assocs[0]["target_element"] == "uri:cash"
    assert assocs[1]["aggregation_method"] == "weighted_average"
    assert assocs[1]["weight"] == 2.0


def test_map_literal_plain_projection(graph):
    rows = graph.query(
        "MATCH (p:Person) RETURN p.name AS name, "
        "{name: p.name, double_age: p.age * 2} AS info "
        "ORDER BY p.name LIMIT 1"
    ).collect()
    info = rows[0]["info"]
    assert set(info.asDict()) == {"name", "double_age"}
    assert info["name"] == rows[0]["name"]
    assert isinstance(info["double_age"], (int, float))


def test_labelless_match_introspection_shapes(graph):
    """The MCP stats corpus (middleware/mcp tools): label-less node and
    type-less relationship counts compile as unions over the
    registered tables."""
    total_nodes = graph.query("MATCH (n) RETURN count(n) AS count").first()["count"]
    assert total_nodes > 0
    by_label = {
        tuple(r["l"]): r["c"]
        for r in graph.query(
            "MATCH (n) RETURN labels(n) AS l, count(n) AS c"
        ).collect()
    }
    assert sum(by_label.values()) == total_nodes
    rels = graph.query("MATCH ()-[r]->() RETURN count(r) AS count").first()["count"]
    by_type = {
        r["t"]: r["c"]
        for r in graph.query(
            "MATCH ()-[r]->() RETURN type(r) AS t, count(r) AS c"
        ).collect()
    }
    assert sum(by_type.values()) == rels


def test_subscript_labels_first(graph):
    """Verbatim node-type census from accounting_demo/05_query_graph.py:44-46:
    ``labels(n)[0]`` list indexing in a grouped projection."""
    out = graph.query(
        "MATCH (n)\n"
        "RETURN labels(n)[0] AS type, count(n) AS count\n"
        "ORDER BY count DESC, type"
    )
    got = {r["type"]: r["count"] for r in out.collect()}
    assert got == {"Person": 4, "Company": 2, "Project": 2}


def test_subscript_literal_negative_and_dynamic(graph):
    out = graph.query(
        "MATCH (p:Person) WHERE p.name = 'Ada' "
        "RETURN ['a','b','c'][0] AS first, ['a','b','c'][-1] AS last, "
        "['a','b','c'][p.age - 34] AS dyn"
    ).first()
    assert (out["first"], out["last"], out["dyn"]) == ("a", "c", "b")


def test_limit_skip_parameters_and_trailing_semicolon(graph):
    """The MCP/API corpus binds LIMIT as a parameter
    (models/api/graphs/query.py: ``RETURN n LIMIT $limit``) and
    clients send trailing semicolons (middleware/mcp tests)."""
    out = graph.query(
        "MATCH (p:Person) RETURN p.name AS name ORDER BY p.age DESC "
        "SKIP $off LIMIT $limit;",
        {"off": 1, "limit": 2},
    )
    assert [r["name"] for r in out.collect()] == ["Ada", "Bo"]
    with pytest.raises(Exception, match="non-negative integer"):
        graph.query(
            "MATCH (p:Person) RETURN p.name AS n LIMIT $limit", {"limit": "5"}
        )


def test_union_distinct(graph):
    """Plain UNION dedupes across branches (middleware/mcp
    test_client.py: TypeA/TypeB name union)."""
    dup = graph.query(
        "MATCH (p:Person) WHERE p.age > 30 RETURN p.name AS name "
        "UNION MATCH (q:Person) WHERE q.title = 'Manager' RETURN q.name AS name"
    )
    names = sorted(r["name"] for r in dup.collect())
    assert names == ["Ada", "Cy"]  # Cy matches both branches, appears once
    both = graph.query(
        "MATCH (p:Person) WHERE p.age > 30 RETURN p.name AS name "
        "UNION ALL MATCH (q:Person) WHERE q.title = 'Manager' RETURN q.name AS name"
    )
    assert both.count() == 3
    with pytest.raises(Exception, match="mix UNION"):
        graph.query(
            "MATCH (p:Person) RETURN p.name AS n UNION MATCH (q:Person) "
            "RETURN q.name AS n UNION ALL MATCH (r:Person) RETURN r.name AS n"
        )
