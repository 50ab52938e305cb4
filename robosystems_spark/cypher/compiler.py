"""Cypher-subset → DataFrame compilation.

Mapping (SURVEY §2.3/§2.4 operator tables):

- node pattern ``(v:Label)``        → table scan, columns renamed ``v__prop``
- ``-[:REL]->`` hop                 → equi-join through the edge table (src/dst)
- ``<-[:REL]-`` / ``--``            → swapped keys / union of both directions
- multi-pattern comma               → chained joins (shared vars = join keys,
                                      none shared = cross join)
- OPTIONAL MATCH                    → left join on the shared variables'
                                      identifier columns
- ``WHERE x IS NULL`` after an
  OPTIONAL MATCH                    → null-filter AFTER the left join (the
                                      anti-join idiom of fact_query.py:78-79;
                                      deliberately post-join, see SURVEY §7
                                      hard-part #1)
- WITH / RETURN with aggregates     → groupBy(non-aggregated items).agg(...)
                                      (Cypher's implicit grouping)
- collect(...)                      → collect_list / collect_list(struct)
- ORDER BY / SKIP / LIMIT / DISTINCT→ orderBy / offset / limit / distinct
- UNION ALL                         → unionByName
- ``$param``                        → literal substitution at compile time

Node variables are carried as prefixed column bundles (``v__*``);
row-level comparisons between node variables (``p1 < p2``) compare
primary keys.  RETURNed node variables materialize as structs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from robosystems_spark.cypher import parser as P

ID = "identifier"  # node primary-key column (schemas/base.py:18-21)

AGG_FUNCS = {"count", "sum", "avg", "min", "max", "collect"}

SCALAR_FUNCS = {
    "abs": F.abs,
    "lower": F.lower,
    "tolower": F.lower,
    "upper": F.upper,
    "toupper": F.upper,
    "trim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "round": F.round,
    "ceil": F.ceil,
    "floor": F.floor,
    "coalesce": F.coalesce,
    "sqrt": F.sqrt,
    "reverse": F.reverse,
}

CAST_FUNCS = {
    "tointeger": "long",
    "tofloat": "double",
    "tostring": "string",
    "toboolean": "boolean",
}


class CypherCompileError(ValueError):
    pass


@dataclass
class Scope:
    """Variable bindings visible at a point in the pipeline."""

    nodes: dict[str, str] = field(default_factory=dict)  # var -> label (prefixed cols)
    edges: dict[str, str] = field(default_factory=dict)  # var -> rel type
    values: dict[str, str] = field(default_factory=dict)  # name -> column name
    paths: dict[str, str] = field(default_factory=dict)  # path var -> depth col

    def copy(self) -> "Scope":
        return Scope(
            dict(self.nodes), dict(self.edges), dict(self.values),
            dict(self.paths),
        )


class CypherEngine:
    """Compile+run Cypher-subset queries over a table dict.

    ``tables`` maps node labels and relationship type names to
    DataFrames (GraphStore layout: nodes keyed by ``identifier``,
    edges ``(src, dst, ...props)``).
    """

    def __init__(self, tables: dict[str, DataFrame]):
        self.tables = tables
        self._anon = 0
        self._df: DataFrame | None = None  # current frame, for type probes

    # ------------------------------------------------------------------ api
    def query(self, cypher: str, params: dict | None = None) -> DataFrame:
        ast = P.parse_cypher(cypher)
        parts = [self._compile_single(q, params or {}) for q in ast.queries]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if len(parts) > 1 and not ast.union_all:
            # plain UNION: distinct over the combined rows (Neo4j
            # semantics); one extra shuffle, only when asked for
            out = out.distinct()
        return out

    explain = query  # alias: engine.explain(q).explain() shows the plan

    # ---------------------------------------------------------- single query
    def _compile_single(self, q: P.SingleQuery, params: dict) -> DataFrame:
        df: DataFrame | None = None
        scope = Scope()
        for clause in q.clauses:
            self._df = df
            if isinstance(clause, P.MatchClause):
                df = self._compile_match(df, scope, clause, params)
            elif isinstance(clause, P.WithClause):
                df, scope = self._project(
                    df, scope, clause.items, params,
                    distinct=clause.distinct, keep_node_bundles=True,
                )
                self._df = df
                if clause.where is not None:
                    df = df.filter(self._expr(clause.where, scope, params)[0])
            elif isinstance(clause, P.UnwindClause):
                col, _ = self._expr(clause.expr, scope, params)
                if df is None:
                    df = self._spark().range(1).select(F.explode(col).alias(clause.alias))
                else:
                    df = df.withColumn(clause.alias, F.explode(col))
                scope.values[clause.alias] = clause.alias
            else:
                raise CypherCompileError(f"Unsupported clause {clause!r}")

        self._df = df
        return self._finalize(df, scope, q, params)

    def _spark(self):
        for df in self.tables.values():
            return df.sparkSession
        # zero registered tables (e.g. a fresh un-forked workspace):
        # fall back to the active session rather than StopIteration
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is None:
            raise CypherCompileError(
                "No tables registered and no active SparkSession"
            )
        return active

    # -------------------------------------------------------------- patterns
    def _is_rel_table(self, name: str) -> bool:
        cols = set(self.tables[name].columns)
        return {"src", "dst"} <= cols

    def _node_df(self, var: str, label: str, props: dict, scope: Scope, params: dict) -> DataFrame:
        if label == "*":
            # label-less MATCH (n): union of every node table's identity
            # + a label column — the MCP/stats introspection shape
            # (`MATCH (n) RETURN count(n)`, mcp tools corpus)
            parts = [
                self.tables[name]
                .select(F.col(ID).alias(f"{var}__{ID}"))
                .withColumn(f"{var}__label", F.lit(name))
                for name in self.tables
                if ID in self.tables[name].columns and not self._is_rel_table(name)
            ]
            if not parts:
                raise CypherCompileError("No node tables registered")
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            for key, expr in props.items():
                if key != ID:
                    raise CypherCompileError(
                        "Label-less node patterns only filter on identifier"
                    )
                out = out.filter(
                    F.col(f"{var}__{ID}") == self._expr(expr, scope, params)[0]
                )
            return out
        if label not in self.tables:
            raise CypherCompileError(f"Unknown node label {label!r}")
        t = self.tables[label]
        for key, expr in props.items():
            t = t.filter(F.col(key) == self._expr(expr, scope, params)[0])
        return t.select([F.col(c).alias(f"{var}__{c}") for c in t.columns])

    def _edge_df(self, var: str | None, rel: str | None, direction: str):
        if rel is None:
            # type-less -[r]-> : union of every relationship table with
            # a type column (`MATCH ()-[r]->() RETURN count(r)`)
            parts = [
                self.tables[name].select(
                    "src", "dst", F.lit(name).alias("type")
                )
                for name in self.tables
                if self._is_rel_table(name)
            ]
            if not parts:
                raise CypherCompileError("No relationship tables registered")
            e = parts[0]
            for p in parts[1:]:
                e = e.unionByName(p)
            rel = "*"
        elif rel not in self.tables:
            raise CypherCompileError(f"Unknown relationship type {rel!r}")
        else:
            e = self.tables[rel]
        swap = direction == "in"
        if direction == "undirected":
            fwd = e.select(F.col("src"), F.col("dst"), *[c for c in e.columns if c not in ("src", "dst")])
            rev = e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                *[c for c in e.columns if c not in ("src", "dst")],
            )
            e = fwd.unionByName(rev)
        self._anon += 1
        src_col = f"__src{self._anon}"
        dst_col = f"__dst{self._anon}"
        sel = [
            F.col("dst" if swap else "src").alias(src_col),
            F.col("src" if swap else "dst").alias(dst_col),
        ]
        if var:
            sel += [
                F.col(c).alias(f"{var}__{c}") for c in e.columns if c not in ("src", "dst")
            ]
            # edge identity columns so the var works in scalar positions
            # (count(r), r comparisons)
            sel += [
                F.col("dst" if swap else "src").alias(f"{var}__src"),
                F.col("src" if swap else "dst").alias(f"{var}__dst"),
            ]
        return e.select(*sel), src_col, dst_col

    def _varlength_pairs(self, edge: P.EdgePattern):
        """Bounded var-length hop ``[*min..max]`` → reachable-pair frame
        from the iterative BFS join loop (SURVEY §2.3 J9; the one
        operator family with no relational builtin).  Unbounded ``[*]``
        is rejected, matching the reference validator's warning
        (query_validator.py:33-43)."""
        if edge.max_hops is None:
            raise CypherCompileError(
                "Unbounded var-length [*] is not supported; bound it, e.g. [*1..3]"
            )
        if edge.max_hops < edge.min_hops:
            raise CypherCompileError(
                f"Invalid hop range [*{edge.min_hops}..{edge.max_hops}]"
            )
        from robosystems_spark.operators.graph import bounded_paths, undirected

        e = self.tables.get(edge.rel_type)
        if e is None:
            raise CypherCompileError(f"Unknown relationship type {edge.rel_type!r}")
        e = e.select("src", "dst")
        if edge.direction == "in":
            e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        elif edge.direction == "undirected":
            e = undirected(e)
        pairs = bounded_paths(e, max_depth=edge.max_hops).filter(
            (F.col("depth") >= edge.min_hops) & (F.col("depth") <= edge.max_hops)
        )
        self._anon += 1
        src_col, dst_col = f"__src{self._anon}", f"__dst{self._anon}"
        sel = [F.col("src").alias(src_col), F.col("dst").alias(dst_col)]
        if edge.var:
            sel.append(F.col("depth").alias(f"{edge.var}__depth"))
        return pairs.select(*sel), src_col, dst_col

    def _compile_pattern_into(
        self,
        df: DataFrame | None,
        scope: Scope,
        path: P.PathPattern,
        params: dict,
        label_hints: dict[str, str] | None = None,
    ) -> DataFrame:
        """Join one path pattern into df, binding new variables.

        ``label_hints`` supplies labels for variables bound in an outer
        scope (OPTIONAL MATCH sub-patterns reference them label-less).
        """
        elements = path.elements
        if path.shortest is not None:
            # shortestPath()/allShortestPaths(): compile to the bounded
            # BFS pair frame, whose depth IS the minimum hop count per
            # endpoint pair (bounded_paths keeps first-discovery level
            # only) — exactly shortest-path-length semantics.  At
            # endpoint granularity the two forms coincide: one row per
            # (a, b) at minimal depth; path ENUMERATION (nodes(p) /
            # relationships(p)) is not supported, matching the
            # reference, which cost-flags but never enumerates either
            # (execution_strategies.py:86-88).
            if len(elements) != 3 or not isinstance(elements[1], P.EdgePattern):
                raise CypherCompileError(
                    "shortestPath()/allShortestPaths() takes a single "
                    "(a)-[...]->(b) relationship pattern"
                )
            edge = elements[1]
            if edge.min_hops is None:
                edge.min_hops = edge.max_hops = 1  # single-hop form
            if edge.var is None:
                edge.var = self._fresh()
        elif path.path_var is not None:
            raise CypherCompileError(
                "path variables are only supported with "
                "shortestPath()/allShortestPaths()"
            )
        node = elements[0]
        var = node.var or self._fresh()
        if var not in scope.nodes:
            label = self._require_label(node, label_hints)
            ndf = self._node_df(var, label, node.props, scope, params)
            df = ndf if df is None else df.crossJoin(ndf)
            scope.nodes[var] = label
        prev = var
        i = 1
        while i < len(elements):
            edge: P.EdgePattern = elements[i]
            node: P.NodePattern = elements[i + 1]
            nvar = node.var or self._fresh()
            if edge.min_hops is not None:
                edf, src_col, dst_col = self._varlength_pairs(edge)
            else:
                edf, src_col, dst_col = self._edge_df(edge.var, edge.rel_type, edge.direction)
            df = df.join(edf, F.col(f"{prev}__{ID}") == F.col(src_col))
            if edge.var:
                scope.edges[edge.var] = edge.rel_type or "*"
            if nvar in scope.nodes:
                # variable already bound: the hop closes a cycle -> filter
                df = df.filter(F.col(dst_col) == F.col(f"{nvar}__{ID}"))
            else:
                label = self._require_label(node, label_hints)
                ndf = self._node_df(nvar, label, node.props, scope, params)
                df = df.join(ndf, F.col(dst_col) == F.col(f"{nvar}__{ID}"))
                scope.nodes[nvar] = label
            df = df.drop(src_col, dst_col)
            prev = nvar
            i += 2
        if path.path_var is not None:
            scope.paths[path.path_var] = f"{elements[1].var}__depth"
        return df

    def _require_label(
        self, node: P.NodePattern, label_hints: dict[str, str] | None = None
    ) -> str:
        if node.label is None:
            if label_hints and node.var in label_hints:
                return label_hints[node.var]
            # label-less pattern: Cypher semantics = all nodes (compiled
            # as a union over node tables)
            return "*"
        return node.label

    def _fresh(self) -> str:
        self._anon += 1
        return f"_anon{self._anon}"

    def _compile_match(
        self, df: DataFrame | None, scope: Scope, clause: P.MatchClause, params: dict
    ) -> DataFrame:
        if not clause.optional:
            for path in clause.patterns:
                df = self._compile_pattern_into(df, scope, path, params)
            if clause.where is not None:
                df = df.filter(self._expr(clause.where, scope, params)[0])
            return df

        # OPTIONAL MATCH: compile the pattern standalone (re-joining the
        # tables of outer-bound variables, labels inferred from the outer
        # scope), then left-join onto the query on the shared variables'
        # identifier columns.
        if df is None:
            raise CypherCompileError("OPTIONAL MATCH cannot be the first clause")
        sub_scope = Scope()
        sub = None
        for path in clause.patterns:
            sub = self._compile_pattern_into(
                sub, sub_scope, path, params, label_hints=scope.nodes
            )
        new_nodes = {v: l for v, l in sub_scope.nodes.items() if v not in scope.nodes}
        new_edges = {v: t for v, t in sub_scope.edges.items() if v not in scope.edges}
        shared = [v for v in sub_scope.nodes if v in scope.nodes]
        # keep only join keys for shared vars + all new-var columns
        keep = [f"{v}__{ID}" for v in shared]
        keep += [
            c for c in sub.columns
            if any(c.startswith(f"{v}__") for v in list(new_nodes) + list(new_edges))
        ]
        sub = sub.select(*dict.fromkeys(keep))
        # rename shared keys to avoid collision, join, drop
        join_cond = None
        renames = {}
        for v in shared:
            tmp = f"__join_{v}"
            renames[tmp] = f"{v}__{ID}"
            sub = sub.withColumnRenamed(f"{v}__{ID}", tmp)
            cond = F.col(f"{v}__{ID}") == F.col(tmp)
            join_cond = cond if join_cond is None else (join_cond & cond)
        if join_cond is None:
            raise CypherCompileError("OPTIONAL MATCH shares no variables with the query")
        out = df.join(sub, join_cond, "left").drop(*renames.keys())
        scope.nodes.update(new_nodes)
        scope.edges.update(new_edges)
        # post-join WHERE: the fd-IS-NULL anti-join idiom (see module doc)
        if clause.where is not None:
            out = out.filter(self._expr(clause.where, scope, params)[0])
        return out

    # ------------------------------------------------------------ projection
    def _item_name(self, item: P.ProjectionItem) -> str:
        if item.alias:
            return item.alias
        e = item.expr
        if isinstance(e, P.VarRef):
            return e.name
        if isinstance(e, P.PropRef):
            return f"{e.var}.{e.prop}"
        raise CypherCompileError("Complex projection items need an AS alias")

    def _project(
        self,
        df: DataFrame,
        scope: Scope,
        items: list[P.ProjectionItem],
        params: dict,
        distinct: bool = False,
        keep_node_bundles: bool = False,
    ) -> tuple[DataFrame, Scope]:
        """Shared WITH/RETURN projection with implicit grouping."""
        new_scope = Scope()
        key_cols: list[Column] = []
        agg_cols: list[Column] = []
        carried_nodes: list[str] = []
        has_agg = any(self._is_aggregate(i.expr) for i in items)

        for item in items:
            name = self._item_name(item)
            e = item.expr
            if isinstance(e, P.VarRef) and e.name in scope.nodes and keep_node_bundles:
                # carry the whole node bundle (WITH elem, ...)
                carried_nodes.append(e.name)
                new_scope.nodes[e.name] = scope.nodes[e.name]
                continue
            col, is_agg = self._expr(e, scope, params)
            if isinstance(e, P.VarRef) and e.name in scope.nodes:
                # RETURN n -> struct of properties
                col = self._node_struct(df, e.name)
            (agg_cols if is_agg else key_cols).append(col.alias(name))
            new_scope.values[name] = name

        if has_agg:
            group_exprs = []
            for v in carried_nodes:
                group_exprs += [F.col(c) for c in df.columns if c.startswith(f"{v}__")]
            group_exprs += key_cols
            out = df.groupBy(*group_exprs).agg(*agg_cols) if (group_exprs or agg_cols) else df
            if not group_exprs and not agg_cols:
                raise CypherCompileError("Empty projection")
        else:
            sel = []
            for v in carried_nodes:
                sel += [F.col(c) for c in df.columns if c.startswith(f"{v}__")]
            sel += key_cols
            out = df.select(*sel)
        if distinct:
            out = out.distinct()
        return out, new_scope

    def _node_struct(self, df: DataFrame, var: str) -> Column:
        fields = [
            F.col(c).alias(c[len(var) + 2:]) for c in df.columns if c.startswith(f"{var}__")
        ]
        return F.struct(*fields)

    def _finalize(self, df: DataFrame, scope: Scope, q: P.SingleQuery, params: dict) -> DataFrame:
        items = q.returns.items
        names = [self._item_name(i) for i in items]

        # Pre-compute ORDER BY expressions in the INPUT scope when
        # possible (ORDER BY elem.name after RETURN ... AS element_name),
        # falling back to the output scope (ORDER BY alias).
        order_specs: list[tuple[str, bool, Column | None]] = []
        pre_cols: dict[str, Column] = {}
        for idx, o in enumerate(q.order_by):
            try:
                col, is_agg = self._expr(o.expr, scope, params)
                if is_agg:
                    raise CypherCompileError("aggregate in ORDER BY needs an alias")
                pre_cols[f"__ord{idx}"] = col
                order_specs.append((f"__ord{idx}", o.desc, None))
            except CypherCompileError:
                order_specs.append((None, o.desc, o.expr))  # resolve post-projection

        has_agg = any(self._is_aggregate(i.expr) for i in items)
        out_scope = Scope(values={n: n for n in names})
        if pre_cols and not has_agg:
            # project items + temp sort columns in one select
            sel = [self._projection_column(i, scope, params, df) for i in items]
            out = df.select(*sel, *[c.alias(n) for n, c in pre_cols.items()])
            if q.returns.distinct:
                out = out.dropDuplicates(names)
        else:
            out, out_scope = self._project(df, scope, items, params, q.returns.distinct)
            if pre_cols and has_agg:
                raise CypherCompileError(
                    "ORDER BY over non-returned expressions is unsupported "
                    "with aggregation; alias the expression in RETURN"
                )

        sort_cols = []
        for tmp_name, desc, late_expr in order_specs:
            if tmp_name is not None and tmp_name in out.columns:
                # backtick-quote: unaliased RETURN t.date yields a column
                # literally named "t.date" — bare F.col would parse the
                # dot as struct access
                c = F.col(f"`{tmp_name}`")
            elif late_expr is not None:
                c, _ = self._expr(late_expr, out_scope, params)
            else:  # pre-computed but projection dropped temps (agg path)
                raise CypherCompileError("ORDER BY expression not resolvable")
            sort_cols.append(c.desc() if desc else c.asc())
        if sort_cols:
            out = out.orderBy(*sort_cols)
        out = out.drop(*[n for n, _, _ in order_specs if n])
        skip = self._resolve_count(q.skip, params)
        limit = self._resolve_count(q.limit, params)
        if skip:
            out = out.offset(skip)
        if limit is not None:
            out = out.limit(limit)
        return out.select(*[F.col(f"`{n}`") for n in names])

    @staticmethod
    def _resolve_count(v, params: dict) -> "int | None":
        """LIMIT/SKIP operand → plan-time constant.  Spark limits are
        literals in the plan, so ``LIMIT $limit`` binds at compile
        time from the parameter map."""
        if v is None or isinstance(v, int):
            return v
        if v.name not in params:
            raise CypherCompileError(f"Missing parameter ${v.name}")
        n = params[v.name]
        if not isinstance(n, int) or isinstance(n, bool) or n < 0:
            raise CypherCompileError(
                f"LIMIT/SKIP parameter ${v.name} must be a non-negative integer"
            )
        return n

    def _projection_column(
        self, item: P.ProjectionItem, scope: Scope, params: dict, df: DataFrame
    ) -> Column:
        name = self._item_name(item)
        e = item.expr
        if isinstance(e, P.VarRef) and e.name in scope.nodes:
            return self._node_struct(df, e.name).alias(name)
        col, _ = self._expr(e, scope, params)
        return col.alias(name)

    # ----------------------------------------------------------- expressions
    def _is_aggregate(self, e) -> bool:
        if isinstance(e, P.FuncCall):
            if e.name in AGG_FUNCS:
                return True
            return any(self._is_aggregate(a) for a in e.args)
        if isinstance(e, P.BinaryOp):
            return self._is_aggregate(e.left) or self._is_aggregate(e.right)
        if isinstance(e, P.UnaryOp):
            return self._is_aggregate(e.operand)
        if isinstance(e, P.Subscript):
            return self._is_aggregate(e.target) or self._is_aggregate(e.index)
        if isinstance(e, P.CaseExpr):
            return any(
                self._is_aggregate(c) or self._is_aggregate(v) for c, v in e.whens
            ) or (e.default is not None and self._is_aggregate(e.default))
        return False

    def _expr(self, e, scope: Scope, params: dict) -> tuple[Column, bool]:
        if isinstance(e, P.Literal):
            return F.lit(e.value), False
        if isinstance(e, P.Param):
            if e.name not in params:
                raise CypherCompileError(f"Missing parameter ${e.name}")
            v = params[e.name]
            if isinstance(v, (list, tuple)):
                return F.array(*[F.lit(x) for x in v]), False
            return F.lit(v), False
        if isinstance(e, P.ListLiteral):
            return F.array(*[self._expr(x, scope, params)[0] for x in e.items]), False
        if isinstance(e, P.MapLiteral):
            # {k: v, ...} -> named struct; aggregate iff any value
            # aggregates (collect({...}) wraps the struct per row)
            cols, aggs = [], []
            for k, v in e.entries:
                c, is_agg = self._expr(v, scope, params)
                cols.append(c.alias(k))
                aggs.append(is_agg)
            return F.struct(*cols), any(aggs)
        if isinstance(e, P.VarRef):
            if e.name in scope.nodes or e.name in scope.edges:
                # bare node/edge var in scalar position: its identity
                key = f"{e.name}__{ID}" if e.name in scope.nodes else f"{e.name}__src"
                return F.col(key), False
            if e.name in scope.values:
                return F.col(scope.values[e.name]), False
            raise CypherCompileError(f"Unbound variable {e.name!r}")
        if isinstance(e, P.PropRef):
            if e.var in scope.nodes or e.var in scope.edges:
                return F.col(f"{e.var}__{e.prop}"), False
            if e.var in scope.values:
                # struct column (returned node) property access
                return F.col(scope.values[e.var])[e.prop], False
            raise CypherCompileError(f"Unbound variable {e.var!r}")
        if isinstance(e, P.Subscript):
            col, agg = self._expr(e.target, scope, params)
            # Cypher lists are 0-indexed with negative-from-end;
            # element_at is 1-indexed with the same negative semantics
            if isinstance(e.index, P.Literal) and isinstance(e.index.value, int):
                i = e.index.value
                return F.element_at(col, i + 1 if i >= 0 else i), agg
            if isinstance(e.index, P.Literal) and isinstance(e.index.value, str):
                return col[e.index.value], agg
            ix, agg2 = self._expr(e.index, scope, params)
            ix = ix.cast("int")
            return (
                F.element_at(col, F.when(ix >= 0, ix + 1).otherwise(ix)),
                agg or agg2,
            )
        if isinstance(e, P.IsNull):
            col, agg = self._expr(e.operand, scope, params)
            return (col.isNotNull() if e.negated else col.isNull()), agg
        if isinstance(e, P.UnaryOp):
            col, agg = self._expr(e.operand, scope, params)
            return (~col if e.op == "NOT" else -col), agg
        if isinstance(e, P.BinaryOp):
            return self._binary(e, scope, params)
        if isinstance(e, P.CaseExpr):
            out = None
            agg = False
            for cond, val in e.whens:
                c, a1 = self._expr(cond, scope, params)
                v, a2 = self._expr(val, scope, params)
                agg = agg or a1 or a2
                out = F.when(c, v) if out is None else out.when(c, v)
            if e.default is not None:
                d, a3 = self._expr(e.default, scope, params)
                agg = agg or a3
                out = out.otherwise(d)
            return out, agg
        if isinstance(e, P.FuncCall):
            return self._func(e, scope, params)
        raise CypherCompileError(f"Unsupported expression {e!r}")

    def _binary(self, e: P.BinaryOp, scope: Scope, params: dict) -> tuple[Column, bool]:
        left, a1 = self._expr(e.left, scope, params)
        right, a2 = self._expr(e.right, scope, params)
        agg = a1 or a2
        ops = {
            "=": left == right,
            "<>": left != right,
            "<": left < right,
            "<=": left <= right,
            ">": left > right,
            ">=": left >= right,
            "+": left + right,
            "-": left - right,
            "*": left * right,
            "/": left / right,
            "%": left % right,
            "AND": left & right,
            "OR": left | right,
            "CONTAINS": left.contains(right),
            "STARTS WITH": left.startswith(right),
            "ENDS WITH": left.endswith(right),
        }
        if e.op == "IN":
            if isinstance(e.right, P.ListLiteral):
                vals = [self._expr(x, scope, params)[0] for x in e.right.items]
                return left.isin(*[v for v in vals]), agg
            if isinstance(e.right, P.Param):
                v = params.get(e.right.name)
                if isinstance(v, (list, tuple)):
                    return left.isin(*list(v)), agg
            return F.array_contains(right, left), agg
        if e.op not in ops:
            raise CypherCompileError(f"Unsupported operator {e.op!r}")
        return ops[e.op], agg

    def _func(self, e: P.FuncCall, scope: Scope, params: dict) -> tuple[Column, bool]:
        name = e.name
        if name in AGG_FUNCS:
            if name == "count":
                arg = e.args[0] if e.args else P.VarRef("*")
                if isinstance(arg, P.VarRef) and arg.name == "*":
                    return F.count(F.lit(1)), True
                col, _ = self._expr(arg, scope, params)
                return (F.countDistinct(col) if e.distinct else F.count(col)), True
            if name == "collect":
                arg = e.args[0]
                if isinstance(arg, P.VarRef) and arg.name in scope.nodes:
                    raise CypherCompileError(
                        "collect(node) unsupported; collect a property or a map"
                    )
                col, _ = self._expr(arg, scope, params)
                return (F.collect_set(col) if e.distinct else F.collect_list(col)), True
            col, _ = self._expr(e.args[0], scope, params)
            fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[name]
            return fn(col), True
        if name in ("labels", "type", "id", "keys", "properties", "exists"):
            # graph introspection (SURVEY §2.8 F5): labels/type resolve
            # statically from the binding scope — tables ARE the labels
            arg = e.args[0] if e.args else None
            if name == "exists":
                col, agg = self._expr(arg, scope, params)
                return col.isNotNull(), agg
            if not isinstance(arg, P.VarRef):
                raise CypherCompileError(f"{name}() takes a bound variable")
            v = arg.name
            if name == "labels":
                if v not in scope.nodes:
                    raise CypherCompileError(f"labels() needs a node variable, got {v!r}")
                if scope.nodes[v] == "*":
                    return F.array(F.col(f"{v}__label")), False
                return F.array(F.lit(scope.nodes[v])), False
            if name == "type":
                if v not in scope.edges:
                    raise CypherCompileError(f"type() needs a relationship variable, got {v!r}")
                if scope.edges[v] == "*":
                    return F.col(f"{v}__type"), False
                return F.lit(scope.edges[v]), False
            if name == "id":
                if v not in scope.nodes:
                    raise CypherCompileError(f"id() needs a node variable, got {v!r}")
                return F.col(f"{v}__{ID}"), False
            # keys / properties need the live frame for the column set
            if v not in scope.nodes or self._df is None:
                raise CypherCompileError(f"{name}() needs a bound node variable")
            prop_cols = [c for c in self._df.columns if c.startswith(f"{v}__")]
            if name == "keys":
                return F.array(*[F.lit(c[len(v) + 2:]) for c in prop_cols]), False
            return self._node_struct(self._df, v), False
        if name in CAST_FUNCS:
            col, agg = self._expr(e.args[0], scope, params)
            return col.try_cast(CAST_FUNCS[name]), agg
        if name in ("size", "len", "length"):
            # length(p) on a shortestPath-bound path variable = the
            # BFS depth (minimum hop count) of the pair's row
            arg0 = e.args[0]
            if isinstance(arg0, P.VarRef) and arg0.name in scope.paths:
                return F.col(scope.paths[arg0.name]), False
            # `len` covers both strings and lists in the dialect map
            # (query_validator.py:63-64); pick by static argument shape
            col, agg = self._expr(e.args[0], scope, params)
            arg = e.args[0]
            is_list = isinstance(arg, P.ListLiteral) or (
                isinstance(arg, P.FuncCall) and arg.name == "collect"
            )
            if (
                not is_list
                and isinstance(arg, P.VarRef)
                and arg.name in scope.values
                and self._df is not None
            ):
                dtype = dict(self._df.dtypes).get(scope.values[arg.name], "")
                is_list = dtype.startswith("array")
            return (F.size(col) if is_list else F.length(col.cast("string"))), agg
        if name == "substring":
            # 1-based SQL-style start, like the reference engine's
            # dialect (accounting_demo/05_query_graph.py:93-99 uses
            # substring(t.date, 1, 7) to mean the YYYY-MM prefix)
            col, agg = self._expr(e.args[0], scope, params)
            start, a2 = self._expr(e.args[1], scope, params)
            if len(e.args) >= 3:
                length, a3 = self._expr(e.args[2], scope, params)
            else:
                length, a3 = F.lit(2_147_483_647), False
            return col.cast("string").substr(start, length), agg or a2 or a3
        if name in ("replace", "split"):
            cols = [self._expr(a, scope, params)[0] for a in e.args]
            agg = any(self._expr(a, scope, params)[1] for a in e.args)
            fn = F.replace if name == "replace" else F.split
            return fn(*cols), agg
        if name in SCALAR_FUNCS:
            cols = [self._expr(a, scope, params)[0] for a in e.args]
            aggs = any(self._expr(a, scope, params)[1] for a in e.args)
            return SCALAR_FUNCS[name](*cols), aggs
        raise CypherCompileError(f"Unsupported function {name!r}")
