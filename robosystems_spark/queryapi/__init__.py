"""Query API layer: classification, analysis, gated SQL passthrough."""

from robosystems_spark.queryapi.analyzer import (  # noqa: F401
    OperationType,
    QueryAnalysis,
    analyze_query_features,
    classify_operation,
)
from robosystems_spark.queryapi.sql_gate import SQLGate, SQLGateError  # noqa: F401
