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
    # case-sensitive: prose says "Create an external table", queries
    # say CREATE; MERGE/CREATE alone (keyword lists) carry no pattern
    if not re.match(r"^(MATCH|OPTIONAL|UNWIND|MERGE|CREATE|WITH)\b", head):
        return False
    if _looks_like_ddl(s) or _is_regex_source(s):
        return False
    if "(" not in s:
        return False
    return bool(re.search(r"\b(RETURN|SET|DELETE|CREATE|MERGE)\b", s))


def _is_regex_source(s: str) -> bool:
    """Constants that are regex PATTERNS over Cypher, not Cypher
    (the reference's own parsers/guards embed e.g. CREATE\\s+NODE)."""
    return "\\s" in s or "(?:" in s or "\\b" in s


def _looks_like_ddl(s: str) -> bool:
    head = s.lstrip()
    if _is_regex_source(s):
        return False
    if re.match(r"^(CREATE|DROP)\s+DATABASE\b", head):
        return True
    # table/index DDL must carry a body — bare "CREATE NODE TABLE"
    # keyword-list constants (security analyzers, test prefixes) don't
    return bool(
        re.match(
            r"^(CREATE\s+(NODE|REL)\s+TABLE|CREATE\s+INDEX|DROP\s+TABLE)\b", head
        )
    ) and "(" in s


def _extract(path: pathlib.Path) -> list[str]:
    """Whole string constants that look like Cypher.  Constants that
    are pieces of an f-string (ast.JoinedStr) are excluded — those are
    fragments around interpolated labels/limits, not statements."""
    try:
        tree = ast.parse(path.read_text())
    except (SyntaxError, UnicodeDecodeError):
        return []
    fragment_ids = {
        id(v)
        for node in ast.walk(tree)
        if isinstance(node, ast.JoinedStr)
        for v in node.values
    }
    return [
        node.value.strip()
        for node in ast.walk(tree)
        if isinstance(node, ast.Constant)
        and isinstance(node.value, str)
        and id(node) not in fragment_ids
        and _looks_like_cypher(node.value.strip())
    ]


def _corpus(paths) -> list[tuple[str, str]]:
    out, seen = [], set()
    for path, rel in paths:
        for s in _extract(path):
            key = re.sub(r"\s+", " ", s)
            if key not in seen:
                seen.add(key)
                out.append((rel, s))
    return out


CORPUS = _corpus(
    [(EXAMPLES_ROOT / rel, rel) for rel in EXAMPLE_FILES if (EXAMPLES_ROOT / rel).exists()]
)

REFERENCE_ROOT = pathlib.Path("/root/reference")
TREE_CORPUS = _corpus(
    sorted(
        ((p, str(p.relative_to(REFERENCE_ROOT))) for p in REFERENCE_ROOT.rglob("*.py")),
        key=lambda t: t[1],
    )
)


def test_corpus_extracted():
    # the nine demo scripts carry a substantial query surface; if the
    # extraction regresses (or the reference moves) we want a loud fail
    assert len(CORPUS) >= 40, f"only {len(CORPUS)} queries extracted"
    assert len(TREE_CORPUS) >= 200, f"only {len(TREE_CORPUS)} tree queries"


@pytest.mark.parametrize(
    "rel,query", CORPUS, ids=[f"{r}:{i}" for i, (r, _) in enumerate(CORPUS)]
)
def test_reference_example_query_parses(rel, query):
    parse_cypher(query)


def test_entire_reference_tree_parses():
    """Every complete Cypher statement anywhere in the reference —
    source, routers, MCP models, backends, tests — parses."""
    fails = []
    for rel, q in TREE_CORPUS:
        try:
            parse_cypher(q)
        except Exception as e:  # noqa: BLE001 — collecting a report
            fails.append(f"{rel}: {type(e).__name__}: {e}\n  {q[:120]}")
    assert not fails, "\n".join(fails)


def _ddl_corpus() -> list[tuple[str, str]]:
    """Non-test source only: the reference's own test suite contains
    DELIBERATELY invalid DDL (injection probes, missing PKs) that a
    correct parser must reject — those are negative cases, not parse
    targets."""
    out, seen = [], set()
    for p in sorted((REFERENCE_ROOT / "robosystems").rglob("*.py")):
        rel = str(p.relative_to(REFERENCE_ROOT))
        try:
            tree = ast.parse(p.read_text())
        except (SyntaxError, UnicodeDecodeError):
            continue
        fragment_ids = {
            id(v)
            for node in ast.walk(tree)
            if isinstance(node, ast.JoinedStr)
            for v in node.values
        }
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
                and id(node) not in fragment_ids
            ):
                s = node.value.strip()
                if _looks_like_ddl(s):
                    key = re.sub(r"\s+", " ", s)
                    if key not in seen:
                        seen.add(key)
                        out.append((rel, s))
    return out


def test_reference_tree_ddl_parses():
    """Every whole CREATE NODE/REL TABLE statement in the reference
    (ladybug manager bootstrap, schema-parser doc corpus) parses
    through our DDL dialect parser."""
    from robosystems_spark.schema.ddl import parse_statement, split_statements

    corpus = _ddl_corpus()
    assert len(corpus) >= 3, f"only {len(corpus)} DDL statements found"
    fails = []
    for rel, script in corpus:
        for stmt in split_statements(script):
            try:
                parse_statement(stmt)
            except Exception as e:  # noqa: BLE001 — collecting a report
                fails.append(f"{rel}: {type(e).__name__}: {e}\n  {stmt[:120]}")
    assert not fails, "\n".join(fails)
