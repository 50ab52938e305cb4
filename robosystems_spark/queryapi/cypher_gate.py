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
    """Read-only (main graph) or read-write (subgraph) Cypher endpoint.

    Writability is derived from the graph id's identity (subgraphs
    like ``kg..._dev`` are read-write; main graphs, shared repos and
    system graphs reject writes) — the reference's graph-id routing
    (middleware/graph/types.py:178-428) rather than a caller-supplied
    flag.  ``graph_metadata`` plays the IAM-lookup role when the
    caller knows more than the pattern (e.g. a repository flag).
    """

    def __init__(
        self,
        engine: CypherEngine,
        graph_id: str = "kg0000000000000000",
        max_query_length: int = 10_000,
        graph_metadata: dict | None = None,
        store=None,
    ):
        from robosystems_spark.queryapi.graph_identity import identify_graph

        self.engine = engine
        try:
            self.identity = identify_graph(graph_id, graph_metadata)
        except ValueError as e:
            raise CypherGateError(str(e)) from e
        self.graph_id = graph_id
        self.max_query_length = max_query_length
        # GraphStore backing writable subgraphs: admitted WRITE
        # statements execute against it (cypher/writes.py)
        self.store = store
        self._store_tables: set[str] = (
            set(store.tables()) if store is not None else set()
        )

    @property
    def is_subgraph(self) -> bool:
        return self.identity.is_subgraph

    def _spark(self):
        """The gate's SparkSession, resolvable even when the engine has
        ZERO tables — a fresh un-forked workspace starts empty, and its
        first CREATE (which populates it) must not die deriving a
        session from a table that doesn't exist yet."""
        if self.store is not None:
            return self.store.spark
        for df in self.engine.tables.values():
            return df.sparkSession
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is None:
            raise CypherGateError(
                "Gate has no tables, no store, and no active SparkSession"
            )
        return active

    def query(self, cypher: str, params: dict | None = None) -> DataFrame:
        if not cypher or not cypher.strip():
            raise CypherGateError("Query must be a non-empty string")
        if len(cypher) > self.max_query_length:
            raise CypherGateError(
                f"Query length {len(cypher)} exceeds limit {self.max_query_length}"
            )
        spark = self._spark()
        if is_call(cypher):
            return execute_call(spark, cypher, store=self.store)
        op = classify_operation(cypher)
        if op is OperationType.ADMIN:
            raise CypherGateError("Administrative operations are not allowed")
        if op is OperationType.BULK:
            raise CypherGateError(
                "Bulk operations must use the staging/materialization pipeline"
            )
        if op in (OperationType.WRITE, OperationType.DDL) and not self.identity.writable:
            if self.identity.is_shared_repository:
                raise CypherGateError(
                    "Shared repositories are read-only. Write operations are "
                    "not allowed."
                )
            raise CypherGateError(
                "Write operations are not allowed on main graphs; use a subgraph"
            )
        params = validate_params(params)
        if op is OperationType.DDL:
            if self.store is None:
                raise CypherGateError(
                    "DDL needs a GraphStore backing on this gate"
                )
            from robosystems_spark.schema.ddl import apply_graph_ddl

            stats = apply_graph_ddl(self.store, cypher)
            self._refresh_from_store()
            return spark.createDataFrame(
                [tuple(stats.values())], list(stats.keys())
            )
        if op is OperationType.WRITE:
            if self.store is None:
                raise CypherGateError(
                    "This subgraph gate has no GraphStore backing; writes "
                    "need a store"
                )
            from robosystems_spark.cypher.writes import CypherWriteExecutor

            stats = CypherWriteExecutor(self.store).execute(cypher, params)
            self._refresh_from_store()
            return spark.createDataFrame(
                [tuple(stats.values())], list(stats.keys())
            )
        return self.engine.query(cypher, params)

    def _refresh_from_store(self) -> None:
        """Re-register store-backed tables in the engine after a
        WRITE/DDL, so a CREATE on a fresh (empty, un-forked) workspace
        is immediately visible to MATCH on the same gate.  Only names
        the store owns are touched — externally-registered frames on a
        mixed gate keep their bindings."""
        if self.store is None:
            return
        current = set(self.store.tables())
        for name in self._store_tables - current:  # DDL drops
            self.engine.tables.pop(name, None)
        for name in current:
            self.engine.tables[name] = self.store.read(name)
        self._store_tables = current
