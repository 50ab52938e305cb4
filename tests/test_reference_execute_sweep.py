"""EXECUTE sweep over the reference's demo-query corpora.

test_reference_parse_sweep.py proves every reference query parses;
this module proves the three non-SEC demo corpora (custom graph,
accounting, element mapping — 45 queries) also COMPILE AND RUN
verbatim against engines whose tables carry the demo schemas.
(sec_demo's 15 queries run end-to-end on pipeline output in
test_reference_demo_corpus.py.)

Fixtures are one-row synthetic tables with every label/relationship/
property the corpus references; parameters bind a benign integer
(the corpora use them only in comparisons and LIMIT).
"""

from __future__ import annotations

import ast
import pathlib
import re

import pytest

from robosystems_spark.cypher import CypherEngine

EXAMPLES_ROOT = pathlib.Path("/root/reference/examples")

CORPORA: dict[str, list[str]] = {
    "custom": [
        "custom_graph_demo/05_query_graph.py",
        "custom_graph_demo/04_upload_ingest.py",
    ],
    "accounting": [
        "accounting_demo/05_query_graph.py",
        "accounting_demo/04_upload_ingest.py",
    ],
    "mapping": [
        "element_mapping_demo/05_query_graph.py",
        "element_mapping_demo/06_create_subgraph.py",
        "element_mapping_demo/07_test_views.py",
        "element_mapping_demo/04_upload_ingest.py",
    ],
}


def _extract(rel: str) -> list[str]:
    tree = ast.parse((EXAMPLES_ROOT / rel).read_text())
    fragments = {
        id(v)
        for n in ast.walk(tree)
        if isinstance(n, ast.JoinedStr)
        for v in n.values
    }
    out = []
    for n in ast.walk(tree):
        if isinstance(n, ast.Constant) and isinstance(n.value, str) and id(n) not in fragments:
            s = n.value.strip()
            if (
                re.match(r"^(MATCH|OPTIONAL|UNWIND|MERGE|CREATE|WITH)\b", s.lstrip())
                and "(" in s
                and re.search(r"\b(RETURN|SET|DELETE|CREATE|MERGE)\b", s)
            ):
                out.append(s)
    return out


def _queries(corpus: str) -> list[str]:
    qs: list[str] = []
    for rel in CORPORA[corpus]:
        qs.extend(_extract(rel))
    return qs


@pytest.fixture(scope="module")
def engines(spark) -> dict[str, CypherEngine]:
    mk = spark.createDataFrame
    custom = {
        "Person": mk(
            [("p1", "Ada", "Engineer", "SF", "ai", "active")],
            ["identifier", "name", "title", "location", "interests", "status"],
        ),
        "Company": mk(
            [("c1", "Initech", "Software", "SF")],
            ["identifier", "name", "industry", "location"],
        ),
        "Project": mk(
            [("j1", "Apollo", 10.0, "active")],
            ["identifier", "name", "budget", "status"],
        ),
        "PERSON_WORKS_FOR_COMPANY": mk([("p1", "c1", "dev")], ["src", "dst", "role"]),
        "PERSON_WORKS_ON_PROJECT": mk([("p1", "j1", 5)], ["src", "dst", "hours"]),
        "COMPANY_SPONSORS_PROJECT": mk([("c1", "j1", 1.0)], ["src", "dst", "committed"]),
    }
    accounting = {
        "Entity": mk([("e1", "Acme")], ["identifier", "name"]),
        "Report": mk(
            [("r1", "10-K Acme", "10-K", "2024-02-01", "acc-1")],
            ["identifier", "name", "form", "report_date", "accession_number"],
        ),
        "Element": mk(
            [("el1", "Cash", "Asset", "debit", "uri:cash")],
            ["identifier", "name", "classification", "balance", "uri"],
        ),
        "Fact": mk([("f1", "1000", "1000.0")], ["identifier", "value", "numeric_value"]),
        "Period": mk(
            [("pd1", "2023-01-01", "2023-12-31", "2023-12-31")],
            ["identifier", "start_date", "end_date", "instant"],
        ),
        "Unit": mk([("u1", "USD")], ["identifier", "value"]),
        "Transaction": mk(
            [("t1", "2024-01-05", "Office rent", "expense")],
            ["identifier", "date", "description", "type"],
        ),
        "LineItem": mk([("li1", 100.0, 0.0)], ["identifier", "debit_amount", "credit_amount"]),
        "ENTITY_HAS_REPORT": mk([("e1", "r1")], ["src", "dst"]),
        "REPORT_HAS_FACT": mk([("r1", "f1")], ["src", "dst"]),
        "FACT_HAS_ELEMENT": mk([("f1", "el1")], ["src", "dst"]),
        "FACT_HAS_PERIOD": mk([("f1", "pd1")], ["src", "dst"]),
        "FACT_HAS_UNIT": mk([("f1", "u1")], ["src", "dst"]),
        "TRANSACTION_HAS_LINE_ITEM": mk([("t1", "li1")], ["src", "dst"]),
        "LINE_ITEM_RELATES_TO_ELEMENT": mk([("li1", "el1")], ["src", "dst"]),
    }
    mapping = {
        "Element": mk(
            [("el1", "Cash", "asset", "debit", "uri:cash", "Monetary")],
            ["identifier", "name", "classification", "balance", "uri", "type"],
        ),
        "Transaction": mk(
            [("t1", "2024-01-05", "Office rent", "expense")],
            ["identifier", "date", "description", "type"],
        ),
        "LineItem": mk([("li1", 100.0, 0.0)], ["identifier", "debit_amount", "credit_amount"]),
        "Structure": mk(
            [("s1", "uri:s1", "BS", "Statement")], ["identifier", "uri", "name", "type"]
        ),
        "Association": mk(
            [("a1", "presentation", 1.0, "root")],
            ["identifier", "association_type", "order_value", "arc_role"],
        ),
        "TRANSACTION_HAS_LINE_ITEM": mk([("t1", "li1")], ["src", "dst"]),
        "LINE_ITEM_RELATES_TO_ELEMENT": mk([("li1", "el1")], ["src", "dst"]),
    }
    return {
        "custom": CypherEngine(custom),
        "accounting": CypherEngine(accounting),
        "mapping": CypherEngine(mapping),
    }


CASES = [(corpus, i, q) for corpus in CORPORA for i, q in enumerate(_queries(corpus))]


def test_corpora_extracted():
    by = {}
    for corpus, _, _ in CASES:
        by[corpus] = by.get(corpus, 0) + 1
    assert by.get("custom", 0) >= 6
    assert by.get("accounting", 0) >= 15
    assert by.get("mapping", 0) >= 15


@pytest.mark.parametrize(
    "corpus,idx,query", CASES, ids=[f"{c}:{i}" for c, i, _ in CASES]
)
def test_reference_demo_query_executes(engines, corpus, idx, query):
    params = {m: 10 for m in re.findall(r"\$(\w+)", query)}
    engines[corpus].query(query, params).collect()
