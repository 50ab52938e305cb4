"""Gated Cypher endpoint: the primary query path (SURVEY §3.1).

Composes the pieces the reference applies in sequence
(/root/reference/robosystems/routers/graphs/query/execute.py:91-162):
operation classification (writes rejected on main graphs, allowed on
subgraphs), length caps, parameter validation, CALL procedure
dispatch, then compilation/execution through the Cypher engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from robosystems_spark.cypher import CypherEngine
from robosystems_spark.queryapi.analyzer import OperationType, classify_operation
from robosystems_spark.queryapi.params import validate_params
from robosystems_spark.queryapi.procedures import execute_call, is_call


class CypherGateError(ValueError):
    pass


class CypherGate:
    """Read-only (main graph) or read-write (subgraph) Cypher endpoint."""

    def __init__(
        self,
        engine: CypherEngine,
        is_subgraph: bool = False,
        max_query_length: int = 10_000,
    ):
        self.engine = engine
        self.is_subgraph = is_subgraph
        self.max_query_length = max_query_length

    def query(self, cypher: str, params: dict | None = None) -> DataFrame:
        if not cypher or not cypher.strip():
            raise CypherGateError("Query must be a non-empty string")
        if len(cypher) > self.max_query_length:
            raise CypherGateError(
                f"Query length {len(cypher)} exceeds limit {self.max_query_length}"
            )
        spark = next(iter(self.engine.tables.values())).sparkSession
        if is_call(cypher):
            return execute_call(spark, cypher)
        op = classify_operation(cypher)
        if op is OperationType.ADMIN:
            raise CypherGateError("Administrative operations are not allowed")
        if op is OperationType.BULK:
            raise CypherGateError(
                "Bulk operations must use the staging/materialization pipeline"
            )
        if op in (OperationType.WRITE, OperationType.DDL) and not self.is_subgraph:
            raise CypherGateError(
                "Write operations are not allowed on main graphs; use a subgraph"
            )
        params = validate_params(params)
        return self.engine.query(cypher, params)
