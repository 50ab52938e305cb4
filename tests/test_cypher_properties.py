"""Property-based robustness tests for the Cypher parser/compiler.

Invariants:
- arbitrary input NEVER crashes with anything but CypherSyntaxError /
  CypherCompileError (no IndexError/AttributeError leaks from the
  tokenizer or recursive descent)
- generated well-formed queries parse, compile, and execute
- literal values round-trip through parse -> compile -> collect
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from robosystems_spark.cypher import CypherEngine, parse_cypher
from robosystems_spark.cypher.compiler import CypherCompileError
from robosystems_spark.cypher.parser import CypherSyntaxError

ALLOWED_ERRORS = (CypherSyntaxError, CypherCompileError)


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_on_garbage(text):
    try:
        parse_cypher(text)
    except ALLOWED_ERRORS:
        pass  # rejection is the expected behavior


@given(
    st.text(
        alphabet="MATCH RETURN WHERE WITH ()[]{}<>-=.,:'\"$*\n abc123",
        max_size=120,
    )
)
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_on_near_cypher(text):
    try:
        parse_cypher(text)
    except ALLOWED_ERRORS:
        pass


_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s.upper()
    not in {
        "MATCH", "OPTIONAL", "WHERE", "WITH", "RETURN", "ORDER", "BY", "SKIP",
        "LIMIT", "DISTINCT", "UNION", "ALL", "AND", "OR", "NOT", "IN", "CONTAINS",
        "STARTS", "ENDS", "IS", "NULL", "AS", "CASE", "WHEN", "THEN", "ELSE",
        "END", "ASC", "DESC", "TRUE", "FALSE", "UNWIND",
    }
)


@pytest.fixture(scope="module")
def engine(spark):
    return CypherEngine(
        {
            "N": spark.createDataFrame(
                [("n1", 1, "a"), ("n2", 2, "b"), ("n3", 3, None)],
                ["identifier", "num", "cat"],
            ),
            "E": spark.createDataFrame([("n1", "n2"), ("n2", "n3")], ["src", "dst"]),
        }
    )


@given(
    alias=_ident,
    int_lit=st.integers(min_value=-(10**6), max_value=10**6),
    str_lit=st.from_regex(r"[a-zA-Z0-9 _.-]{0,12}", fullmatch=True),
    threshold=st.integers(min_value=0, max_value=4),
    desc=st.booleans(),
    limit=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_generated_queries_execute(engine, alias, int_lit, str_lit, threshold, desc, limit):
    order = "DESC" if desc else "ASC"
    q = (
        f"MATCH (n:N) WHERE n.num >= {threshold} "
        f"RETURN n.identifier AS id, n.num + {int_lit} AS {alias}, '{str_lit}' AS lit "
        f"ORDER BY n.num {order} LIMIT {limit}"
    )
    rows = engine.query(q).collect()
    assert len(rows) <= limit
    for r in rows:
        assert r["lit"] == str_lit
        # arithmetic round-trips
        base = int(r["id"][1])
        assert r[alias] == base + int_lit


@given(values=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=8))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_unwind_literal_roundtrip(engine, values):
    lits = ", ".join(str(v) for v in values)
    out = engine.query(f"UNWIND [{lits}] AS x RETURN sum(x) AS total")
    assert out.first()["total"] == sum(values)
