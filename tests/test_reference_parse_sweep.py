"""Parse sweep over the reference's ENTIRE example-query surface.

Extracts every Cypher string literal from the reference demo scripts
(accounting_demo, custom_graph_demo, element_mapping_demo, sec_demo —
preset corpora, upload-ingest verification queries, subgraph/view
tests) and asserts our parser accepts each one verbatim.  This is the
breadth counterpart to test_reference_demo_corpus.py (which executes
the sec_demo corpus end-to-end): any new construct the reference
examples rely on shows up here as a parse failure first.

No SparkSession needed — parsing is pure Python.
"""

from __future__ import annotations

import ast
import pathlib
import re

import pytest

from robosystems_spark.cypher.parser import parse_cypher

EXAMPLE_FILES = [
    "accounting_demo/04_upload_ingest.py",
    "accounting_demo/05_query_graph.py",
    "custom_graph_demo/04_upload_ingest.py",
    "custom_graph_demo/05_query_graph.py",
    "element_mapping_demo/04_upload_ingest.py",
    "element_mapping_demo/05_query_graph.py",
    "element_mapping_demo/06_create_subgraph.py",
    "element_mapping_demo/07_test_views.py",
    "sec_demo/query_examples.py",
]
EXAMPLES_ROOT = pathlib.Path("/root/reference/examples")


def _looks_like_cypher(s: str) -> bool:
    """A string literal that IS a query, not prose mentioning one.

    Docstrings/usage banners contain 'MATCH (n) RETURN count(n)'
    inside shell-quoted flags; real queries start with a clause
    keyword."""
    head = s.lstrip()
    if not re.match(r"(?i)^(MATCH|OPTIONAL|UNWIND|MERGE|CREATE|WITH)\b", head):
        return False
    return bool(re.search(r"\b(RETURN|SET|DELETE|CREATE|MERGE)\b", s))


def _corpus() -> list[tuple[str, str]]:
    out, seen = [], set()
    for rel in EXAMPLE_FILES:
        path = EXAMPLES_ROOT / rel
        if not path.exists():
            continue
        for node in ast.walk(ast.parse(path.read_text())):
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                s = node.value.strip()
                if _looks_like_cypher(s):
                    key = re.sub(r"\s+", " ", s)
                    if key not in seen:
                        seen.add(key)
                        out.append((rel, s))
    return out


CORPUS = _corpus()


def test_corpus_extracted():
    # the nine demo scripts carry a substantial query surface; if the
    # extraction regresses (or the reference moves) we want a loud fail
    assert len(CORPUS) >= 40, f"only {len(CORPUS)} queries extracted"


@pytest.mark.parametrize(
    "rel,query", CORPUS, ids=[f"{r}:{i}" for i, (r, _) in enumerate(CORPUS)]
)
def test_reference_example_query_parses(rel, query):
    parse_cypher(query)
