"""Cypher-subset → DataFrame compiler.

The reference executes Cypher in an embedded engine; its platform
surface uses a well-bounded subset (SURVEY §2): MATCH join chains
(directed, reverse, undirected), multi-pattern comma joins, OPTIONAL
MATCH, WHERE predicates, WITH implicit grouping, aggregate functions,
CASE, ORDER BY/SKIP/LIMIT, DISTINCT, UNION ALL, parameters.

This package compiles that subset onto DataFrames: node labels and
relationship types resolve to tables via a bindings dict, pattern
hops become equi-joins, OPTIONAL MATCH becomes a left join, WITH and
RETURN with aggregates become groupBy().agg() (Cypher's implicit
grouping: non-aggregated items are the keys).
"""

from robosystems_spark.cypher.compiler import CypherEngine  # noqa: F401
from robosystems_spark.cypher.parser import parse_cypher  # noqa: F401
