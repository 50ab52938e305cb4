"""Cypher write executor: CREATE / MERGE / SET / DELETE → GraphStore.

Executes the write subset the reference's subgraph path accepts —
the exact statement shapes of operations/views/save_view.py:
node CREATE with property maps (:154-168, 230-239), relationship
CREATE between bound variables (:240-242), MATCH + SET property
updates (:185-196), MATCH + DETACH DELETE (:109-128), and MERGE
upserts (the M1-M4 mutation family, SURVEY §2.11).

Semantics & scale posture:
- The MATCH part compiles through the regular read compiler
  (distributed); only the bound node IDENTIFIERS are collected, and
  the collect is capped (these are point writes — the reference's
  write path is row-wise Cypher; bulk loads go through staging/COPY,
  which the gate already enforces by rejecting BULK operations).
- Mutations delegate to GraphStore, so they inherit PK-hash-bucket
  partition pruning: a point write rewrites 1/n_buckets of a table.
- Property values must be literals or ``$params`` (the only forms in
  the reference corpus); expressions on the RHS of SET are rejected.
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import functions as F

from robosystems_spark.cypher import parser as P
from robosystems_spark.cypher.compiler import CypherEngine
from robosystems_spark.sources.materialize import GraphStore

PK = "identifier"
MAX_MATCHED_WRITE_ROWS = 10_000


class CypherWriteError(ValueError):
    pass


def _value(expr, params: dict):
    if isinstance(expr, P.Literal):
        return expr.value
    if isinstance(expr, P.Param):
        if expr.name not in params:
            raise CypherWriteError(f"Missing parameter ${expr.name}")
        return params[expr.name]
    if isinstance(expr, P.UnaryOp) and expr.op == "-":
        return -_value(expr.operand, params)
    raise CypherWriteError(
        "Write property values must be literals or $params "
        f"(got {type(expr).__name__})"
    )


class CypherWriteExecutor:
    def __init__(self, store: GraphStore, node_tables: set[str] | None = None):
        self.store = store
        # node tables have an ``identifier`` PK; everything else with
        # (src, dst) is a relationship table
        self.node_tables = node_tables

    def _is_rel_table(self, table: str) -> bool:
        df = self.store.read(table)
        return "src" in df.columns and "dst" in df.columns

    def execute(self, cypher: str, params: dict | None = None) -> dict:
        params = params or {}
        ast = P.Parser(P.tokenize(cypher)).parse()
        if len(ast.queries) != 1:
            raise CypherWriteError("UNION is not valid in a write statement")
        q = ast.queries[0]
        matches = [c for c in q.clauses if isinstance(c, P.MatchClause)]
        writes = [
            c
            for c in q.clauses
            if isinstance(c, (P.CreateClause, P.MergeClause, P.SetClause, P.DeleteClause))
        ]
        if not writes:
            raise CypherWriteError("Not a write statement")

        batch = self._try_batch_upsert(q, params)
        if batch is not None:
            return batch

        # variable -> label from MATCH and CREATE node patterns
        var_label: dict[str, str] = {}
        for m in matches:
            for path in m.patterns:
                for el in path.elements:
                    if isinstance(el, P.NodePattern) and el.var and el.label:
                        var_label[el.var] = el.label

        # bind matched variables: one distributed read, ids collected
        bound: dict[str, list] = {}
        if matches:
            bound = self._bind(matches, var_label, params)

        stats = {"nodes_created": 0, "relationships_created": 0,
                 "properties_set": 0, "nodes_deleted": 0}
        created_ids: dict[str, object] = {}

        for clause in q.clauses:
            if isinstance(clause, P.CreateClause):
                self._create(clause, params, var_label, bound, created_ids, stats)
            elif isinstance(clause, P.MergeClause):
                self._merge(clause, params, var_label, bound, created_ids, stats)
            elif isinstance(clause, P.SetClause):
                self._set(clause, params, var_label, bound, created_ids, stats)
            elif isinstance(clause, P.DeleteClause):
                self._delete(clause, var_label, bound, stats)
        return stats

    # -- batch upsert (UNWIND $batch AS row MERGE ... SET n += row) -------

    def _try_batch_upsert(self, q, params: dict) -> dict | None:
        """The reference's bulk-load idiom (graph_api/backends/
        neo4j.py:338-341)::

            UNWIND $batch AS row
            MERGE (n:Table {identifier: row.identifier})
            SET n += row

        Executed as ONE distributed upsert — the batch becomes a
        DataFrame and ``GraphStore.upsert`` merges it with bucket
        partition pruning — never a per-row loop.  Returns stats, or
        None when the statement isn't this shape."""
        clauses = [c for c in q.clauses]
        if len(clauses) < 2 or not isinstance(clauses[0], P.UnwindClause):
            return None
        unwind = clauses[0]
        if not isinstance(unwind.expr, P.Param):
            return None
        if not isinstance(clauses[1], P.MergeClause):
            return None
        els = clauses[1].pattern.elements
        if len(els) != 1:
            return None
        node = els[0]
        if node.label is None or not node.props:
            return None
        set_clauses = clauses[2:]
        merge_all = False
        for c in set_clauses:
            if not isinstance(c, P.SetClause):
                return None
            for target, value in c.assignments:
                if not (
                    isinstance(target, P.VarRef)
                    and target.name == node.var
                    and isinstance(value, P.VarRef)
                    and value.name == unwind.alias
                ):
                    return None
                merge_all = True

        rows = params.get(unwind.expr.name)
        if rows is None:
            raise CypherWriteError(f"Missing parameter ${unwind.expr.name}")
        if not isinstance(rows, list) or not all(isinstance(r, dict) for r in rows):
            raise CypherWriteError(
                f"${unwind.expr.name} must be a list of property maps"
            )
        # merge keys: props of the form {k: row.f} — k taken from row[f]
        keys: list[str] = []
        for k, v in node.props.items():
            if not (isinstance(v, P.PropRef) and v.var == unwind.alias):
                return None
            if k != v.prop:
                raise CypherWriteError(
                    "Batch MERGE key must reference the same field name "
                    f"({k} vs row.{v.prop})"
                )
            keys.append(k)
        if not rows:
            return {"nodes_created": 0, "relationships_created": 0,
                    "properties_set": 0, "nodes_deleted": 0}
        for r in rows:
            for k in keys:
                if k not in r:
                    raise CypherWriteError(f"Batch row missing merge key {k!r}")

        # stable schema across heterogeneous rows: union of keys
        all_cols = list(dict.fromkeys(c for r in rows for c in r))
        cols = all_cols if merge_all else keys
        spark = self.store.spark
        df = spark.createDataFrame(
            [tuple(r.get(c) for c in cols) for r in rows], cols
        )
        incoming = df.select(*keys).distinct()
        if self.store.exists(node.label):
            # one pre-write scan, broadcast-sized right side — not the
            # two full-table counts a before/after diff would need
            existing = (
                self.store.read(node.label)
                .select(*keys)
                .join(F.broadcast(incoming), keys, "left_semi")
                .count()
            )
        else:
            existing = 0
        created = incoming.count() - existing
        if merge_all:
            self.store.upsert(node.label, df, primary_keys=keys)
        else:
            self.store.copy_into(
                node.label, df, primary_keys=keys, ignore_errors=True
            )
        return {
            "nodes_created": created,
            "relationships_created": 0,
            "properties_set": (len(rows) * len(cols)) if merge_all else 0,
            "nodes_deleted": 0,
        }

    # -- binding ----------------------------------------------------------

    def _bind(self, matches, var_label, params) -> dict[str, list]:
        tables = {t: self.store.read(t) for t in self.store.tables()}
        engine = CypherEngine(tables)
        # compile via the AST directly: reuse the engine's compiler on a
        # synthetic SingleQuery returning each bound var's identifier
        ret_items = [
            P.ProjectionItem(P.PropRef(v, PK), f"__{v}")
            for v in var_label
        ]
        if not ret_items:
            return {}
        sq = P.SingleQuery(list(matches), P.ReturnClause(ret_items), [], None, None)
        df = engine._compile_single(sq, params)
        rows = df.limit(MAX_MATCHED_WRITE_ROWS + 1).collect()
        if len(rows) > MAX_MATCHED_WRITE_ROWS:
            raise CypherWriteError(
                f"Write MATCH bound more than {MAX_MATCHED_WRITE_ROWS} rows; "
                "use the staging/bulk pipeline for bulk mutations"
            )
        out: dict[str, list] = {v: [] for v in var_label}
        for r in rows:
            for v in var_label:
                val = r[f"__{v}"]
                if val is not None and val not in out[v]:
                    out[v].append(val)
        return out

    # -- write clause executors -------------------------------------------

    def _ids_for(self, var, bound, created_ids):
        if var in created_ids:
            return [created_ids[var]]
        if var in bound:
            return bound[var]
        raise CypherWriteError(f"Unbound variable {var!r} in write clause")

    def _create(self, clause, params, var_label, bound, created_ids, stats):
        spark = self.store.spark
        for path in clause.patterns:
            els = path.elements
            if len(els) == 1:
                node = els[0]
                if node.label is None:
                    raise CypherWriteError("CREATE node needs a label")
                props = {k: _value(v, params) for k, v in node.props.items()}
                props.setdefault(PK, str(_uuid.uuid4()))
                df = spark.createDataFrame([tuple(props.values())], list(props.keys()))
                self.store.copy_into(node.label, df, primary_keys=[PK])
                stats["nodes_created"] += 1
                if node.var:
                    var_label[node.var] = node.label
                    created_ids[node.var] = props[PK]
            elif len(els) == 3 and isinstance(els[1], P.EdgePattern):
                a, e, b = els
                if e.rel_type is None:
                    raise CypherWriteError("CREATE relationship needs a type")
                if e.direction == "in":
                    a, b = b, a
                src_ids = self._ids_for(a.var, bound, created_ids)
                dst_ids = self._ids_for(b.var, bound, created_ids)
                pairs = [(s, d) for s in src_ids for d in dst_ids]
                df = spark.createDataFrame(pairs, ["src", "dst"])
                self.store.copy_into(e.rel_type, df, primary_keys=["src", "dst"])
                stats["relationships_created"] += len(pairs)
            else:
                raise CypherWriteError(
                    "CREATE supports single nodes and single-hop relationships"
                )

    def _merge(self, clause, params, var_label, bound, created_ids, stats):
        els = clause.pattern.elements
        if len(els) == 3 and isinstance(els[1], P.EdgePattern):
            # MERGE (a)-[:R]->(b) between bound/created variables:
            # idempotent edge upsert — copy_into's PK anti-join skips
            # pairs that already exist (connection_service.py idiom)
            a, e, b = els
            if e.rel_type is None:
                raise CypherWriteError("MERGE relationship needs a type")
            if e.direction == "in":
                a, b = b, a
            src_ids = self._ids_for(a.var, bound, created_ids)
            dst_ids = self._ids_for(b.var, bound, created_ids)
            pairs = [(s, d) for s in src_ids for d in dst_ids]
            if not pairs:
                return
            df = self.store.spark.createDataFrame(pairs, ["src", "dst"])
            n = self.store.copy_into(
                e.rel_type, df, primary_keys=["src", "dst"], ignore_errors=True
            )
            stats["relationships_created"] += n
            return
        node = els[0]
        if node.label is None or not node.props:
            raise CypherWriteError("MERGE needs a label and a property map")
        props = {k: _value(v, params) for k, v in node.props.items()}
        if PK not in props:
            raise CypherWriteError(f"MERGE property map must include {PK!r}")
        exists = (
            self.store.exists(node.label)
            and self.store.read(node.label)
            .filter(F.col(PK) == props[PK])
            .limit(1)
            .count()
            > 0
        )
        if not exists:
            df = self.store.spark.createDataFrame(
                [tuple(props.values())], list(props.keys())
            )
            self.store.copy_into(node.label, df, primary_keys=[PK])
            stats["nodes_created"] += 1
        if node.var:
            var_label[node.var] = node.label
            created_ids[node.var] = props[PK]

    def _set(self, clause, params, var_label, bound, created_ids, stats):
        by_var: dict[str, dict] = {}
        for target, value in clause.assignments:
            if isinstance(target, P.VarRef):
                # SET n += map — merge every key of the map value
                props = _value(value, params)
                if not isinstance(props, dict):
                    raise CypherWriteError("SET += requires a map value")
                by_var.setdefault(target.name, {}).update(props)
                continue
            by_var.setdefault(target.var, {})[target.prop] = _value(value, params)
        for var, assignments in by_var.items():
            label = var_label.get(var)
            if label is None:
                raise CypherWriteError(f"SET on unbound variable {var!r}")
            ids = self._ids_for(var, bound, created_ids)
            n = self.store.update_where(
                label, F.col(PK).isin(ids), assignments
            )
            stats["properties_set"] += n * len(assignments)

    def _delete(self, clause, var_label, bound, stats):
        for var in clause.variables:
            label = var_label.get(var)
            if label is None:
                raise CypherWriteError(f"DELETE on unbound variable {var!r}")
            ids = bound.get(var, [])
            if not ids:
                continue
            if clause.detach:
                for t in self.store.tables():
                    if t != label and self._is_rel_table(t):
                        self.store.delete_where(
                            t, F.col("src").isin(ids) | F.col("dst").isin(ids)
                        )
            stats["nodes_deleted"] += self.store.delete_where(
                label, F.col(PK).isin(ids)
            )
