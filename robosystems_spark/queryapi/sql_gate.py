"""Gated SQL passthrough over staging/graph tables.

The reference grants arbitrary read-only SQL on staging tables
(/root/reference/robosystems/routers/graphs/tables/query.py:1-290 →
DuckDBTableManager.query_table) with forbidden-keyword and length
validation (graph_api/core/ladybug/service.py:141-189).  Here the
execution engine is ``spark.sql`` over registered temp views; the
gate enforces the same read-only contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from robosystems_spark.queryapi.analyzer import (
    MAX_QUERY_LENGTH,
    OperationType,
    classify_operation,
)


class SQLGateError(ValueError):
    pass


class SQLGate:
    """Read-only SQL endpoint over a set of registered tables."""

    def __init__(
        self,
        spark: SparkSession,
        max_query_length: int = MAX_QUERY_LENGTH,
        allow_writes: bool = False,
    ):
        self.spark = spark
        self.max_query_length = max_query_length
        self.allow_writes = allow_writes

    def register(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def validate(self, sql: str) -> OperationType:
        if not sql or not sql.strip():
            raise SQLGateError("Query must be a non-empty string")
        if len(sql) > self.max_query_length:
            raise SQLGateError(
                f"Query length {len(sql)} exceeds limit {self.max_query_length}"
            )
        op = classify_operation(sql)
        if op is not OperationType.READ and not self.allow_writes:
            raise SQLGateError(f"Only read queries are allowed (detected: {op.value})")
        return op

    def query(self, sql: str, args: dict | None = None) -> DataFrame:
        """Validate then execute; named parameters bind via Spark's
        parameterized SQL (the reference's typed param binding,
        engine.py:151-159)."""
        self.validate(sql)
        return self.spark.sql(sql, args=args) if args else self.spark.sql(sql)
