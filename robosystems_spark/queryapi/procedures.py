"""System procedures: the CALL surface.

The reference exposes ``CALL show_tables() / table_info() /
db_version() / timeout=`` (/root/reference/robosystems/security/
cypher_analyzer.py:75-83; graph_api/core/ladybug/engine.py:94-112).
Spark equivalents are catalog calls and session confs.
"""

from __future__ import annotations

import re

from pyspark import __version__ as spark_version
from pyspark.sql import DataFrame, SparkSession

_CALL_RE = re.compile(
    r"^\s*CALL\s+(\w+)\s*(?:\(\s*(.*?)\s*\))?"
    r"(?:\s+RETURN\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TIMEOUT_RE = re.compile(r"^\s*CALL\s+timeout\s*=\s*(\d+)\s*;?\s*$", re.IGNORECASE)


class ProcedureError(ValueError):
    pass


def is_call(query: str) -> bool:
    return bool(_CALL_RE.match(query) or _TIMEOUT_RE.match(query))


def execute_call(spark: SparkSession, query: str, store=None) -> DataFrame:
    """Execute a CALL procedure, returning a DataFrame result.

    ``store`` (a GraphStore, optional) enables the store-backed
    procedures ``table_version`` / ``table_history`` over the
    mutation commit log."""
    m = _TIMEOUT_RE.match(query)
    if m:
        # per-query timeout: surfaced as a session conf the serving
        # layer's TimeoutCascade enforces via cancelJobGroup
        ms = int(m.group(1))
        spark.conf.set("robosystems.query.timeout_ms", str(ms))
        return spark.createDataFrame([(ms,)], "timeout_ms bigint")

    m = _CALL_RE.match(query)
    if not m:
        raise ProcedureError(f"Not a CALL statement: {query!r}")
    proc = m.group(1).lower()
    arg = (m.group(2) or "").strip().strip("'\"")
    returns = (m.group(3) or "").strip()

    out = _dispatch(spark, proc, arg, store)
    if returns:
        # CALL ... RETURN id, name AS n — the reference's MCP issues
        # this projection form verbatim (middleware/mcp/client.py:376)
        cols = []
        for item in returns.split(","):
            mm = re.match(r"^\s*(\w+)(?:\s+AS\s+(\w+))?\s*$", item, re.IGNORECASE)
            if not mm:
                raise ProcedureError(f"Unsupported RETURN item {item.strip()!r}")
            name, alias = mm.group(1), mm.group(2)
            if name not in out.columns:
                raise ProcedureError(f"Procedure has no column {name!r}")
            c = out[name]
            cols.append(c.alias(alias) if alias else c)
        out = out.select(*cols)
    return out


def _dispatch(spark: SparkSession, proc: str, arg: str, store=None) -> DataFrame:
    if proc == "show_tables":
        # (id, name, type, comment) — the engine's table listing shape
        # (graph_api/core/ladybug/engine.py SHOW_TABLES); ids are the
        # position in name order, stable for a given catalog state
        names = sorted(
            (t.name, t.tableType or "TEMPORARY") for t in spark.catalog.listTables()
        )
        rows = [(i, n, ty, None) for i, (n, ty) in enumerate(names)]
        return spark.createDataFrame(
            rows or [(0, "", "", None)],
            "id bigint, name string, type string, comment string",
        ).filter("name <> ''")
    if proc == "table_info":
        if not arg:
            raise ProcedureError("table_info requires a table name argument")
        cols = spark.catalog.listColumns(arg)
        rows = [(c.name, c.dataType, bool(c.nullable)) for c in cols]
        return spark.createDataFrame(rows, "name string, type string, nullable boolean")
    if proc == "db_version":
        return spark.createDataFrame([(spark_version,)], "version string")
    if proc == "table_profile":
        if not arg:
            raise ProcedureError("table_profile requires a table name argument")
        from robosystems_spark.operators.profile import table_profile

        return table_profile(spark.table(arg))
    if proc == "table_version":
        if store is None:
            raise ProcedureError("table_version requires a graph store")
        if not arg:
            raise ProcedureError("table_version requires a table name argument")
        return spark.createDataFrame(
            [(arg, store.version(arg))], "table string, version bigint"
        )
    if proc == "table_at_version":
        # time travel: CALL table_at_version('T', 3) returns table T's
        # rows exactly as committed at version 3 (snapshot manifest
        # pinned from the commit log; raises if vacuumed away)
        if store is None:
            raise ProcedureError("table_at_version requires a graph store")
        parts = [p.strip().strip("'\"") for p in arg.split(",")] if arg else []
        if len(parts) != 2 or not parts[1].lstrip("-").isdigit():
            raise ProcedureError(
                "table_at_version requires (table_name, version) arguments"
            )
        try:
            return store.read(parts[0], version=int(parts[1]))
        except ValueError as exc:
            raise ProcedureError(str(exc)) from exc
    if proc == "table_changes":
        # change data feed: CALL table_changes('T', v_from[, v_to])
        # returns row-level inserts/deletes between the two committed
        # versions (updates appear as delete+insert pairs), computed
        # from the commit log's file manifests — Delta CDF semantics
        if store is None:
            raise ProcedureError("table_changes requires a graph store")
        parts = [p.strip().strip("'\"") for p in arg.split(",")] if arg else []
        if len(parts) not in (2, 3) or not all(
            p.lstrip("-").isdigit() for p in parts[1:]
        ):
            raise ProcedureError(
                "table_changes requires (table_name, from_version[, to_version])"
            )
        try:
            return store.changes(
                parts[0],
                int(parts[1]),
                int(parts[2]) if len(parts) == 3 else None,
            )
        except ValueError as exc:
            raise ProcedureError(str(exc)) from exc
    if proc == "table_history":
        if store is None:
            raise ProcedureError("table_history requires a graph store")
        if not arg:
            raise ProcedureError("table_history requires a table name argument")
        import json as _json

        rows = [
            (h["v"], h["op"], float(h["ts"]), _json.dumps(h.get("detail") or {}))
            for h in store.history(arg)
        ]
        return spark.createDataFrame(
            rows or [(0, "", 0.0, "")],
            "v bigint, op string, ts double, detail string",
        ).filter("op <> ''")
    if proc == "table_compact":
        # maintenance: CALL table_compact('T') bin-packs small files
        # (Delta OPTIMIZE analog, GraphStore.compact) and reports how
        # many were replaced; 0 means the layout was already packed
        if store is None:
            raise ProcedureError("table_compact requires a graph store")
        if not arg:
            raise ProcedureError("table_compact requires a table name argument")
        name = arg.strip().strip("'\"")
        replaced = store.compact(name)
        return spark.createDataFrame(
            [(name, replaced, store.version(name))],
            "table string, files_replaced bigint, version bigint",
        )
    if proc == "matview_refresh":
        # CALL matview_refresh('V') advances an incremental
        # materialized view to its source's latest version via the
        # change feed (sources/matview.py) and reports what it did
        if store is None:
            raise ProcedureError("matview_refresh requires a graph store")
        if not arg:
            raise ProcedureError("matview_refresh requires a view name argument")
        from robosystems_spark.sources.matview import refresh_materialized_view

        name = arg.strip().strip("'\"")
        try:
            r = refresh_materialized_view(store, name)
        except ValueError as exc:
            raise ProcedureError(str(exc)) from exc
        return spark.createDataFrame(
            [(name, r["mode"], r["from_v"], r["to_v"], r["groups_touched"])],
            "view string, mode string, from_v bigint, to_v bigint, "
            "groups_touched bigint",
        )
    if proc == "current_setting":
        if not arg:
            raise ProcedureError("current_setting requires a setting name")
        return spark.createDataFrame(
            [(arg, spark.conf.get(arg, None))], "name string, value string"
        )
    raise ProcedureError(f"Unknown procedure {proc!r}")
