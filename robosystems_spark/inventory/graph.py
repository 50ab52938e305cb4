"""Cypher-compiler inventory: graph-pattern queries over TPC-H tables.

These entries run THROUGH the Cypher-subset compiler
(robosystems_spark.cypher) against node/edge views derived from the
synthetic tables, with plain-SQL DuckDB oracles — so the compiler
itself sits inside the driver's hash-match correctness gate.

Graph view: Customer/Order/Supplier/Nation nodes (keyed by
``identifier``), HAS_ORDER and IN_NATION edges — the GraphStore layout
(FIXTURES.md: nodes carry ``identifier``, edges ``src``/``dst``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from robosystems_spark.cypher import CypherEngine
from robosystems_spark.inventory import register
from robosystems_spark.io import read_table


def _graph_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Graph view of the TPC-H tables with NATIVE-TYPE identity keys.

    The compiler is key-type-agnostic, so natural bigint keys stay
    bigint: long-keyed hash joins beat string joins (smaller hashes,
    smaller broadcast tables) — reserve string identities for true
    URI/UUID keys (the GraphStore convention)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    return {
        "Customer": cust.select(
            F.col("c_custkey").alias("identifier"),
            "c_name", "c_mktsegment", "c_acctbal",
        ),
        "Order": orders.select(
            F.col("o_orderkey").alias("identifier"),
            "o_totalprice", "o_orderstatus", "o_orderpriority",
        ),
        "Supplier": supp.select(
            F.col("s_suppkey").alias("identifier"), "s_name", "s_acctbal"
        ),
        "Nation": nation.select(
            F.col("n_nationkey").alias("identifier"), "n_name"
        ),
        "HAS_ORDER": orders.select(
            F.col("o_custkey").alias("src"),
            F.col("o_orderkey").alias("dst"),
        ),
        "IN_NATION": supp.select(
            F.col("s_suppkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        ),
    }


def _sp_edges(li: DataFrame) -> DataFrame:
    """Supplier->part bipartite edges with LONG-encoded node ids:
    supplier k -> 2k (even), part k -> 2k+1 (odd).  Long-keyed
    shuffles/joins/distincts beat string keys ('s123'/'p456') by
    ~35% measured at sf0.1, and the decode back to the display
    string is a pure expression (:func:`_sp_decode`) — no extra
    join.  Safe for any order-INsensitive algorithm (pagerank,
    HITS: node ids only group, never order); order-sensitive ones
    (LPA min-label tie-break) must encode their ORACLE the same way.
    """
    return li.select(
        (F.col("l_suppkey").cast("long") * 2).alias("src"),
        (F.col("l_partkey").cast("long") * 2 + 1).alias("dst"),
    )


def _sp_edges_np(li: DataFrame, doubled: bool = False):
    """Resident twin of ``_sp_edges(li).dropDuplicates()``: the same
    DISTINCT long-encoded supplier->part edge set built in numpy from
    one bounded Arrow collect of (l_suppkey, l_partkey) — returns the
    ``(ids, si, di)`` triple for the graph operators' ``precollected``
    hooks, or None when any measured gate fails (row budget, nulls,
    non-integral keys), in which case callers fall back to the
    unchanged Spark construction.  ``doubled=True`` returns the
    undirected union (the LPA setup shape) — the two directions are
    parity-disjoint (even->odd vs odd->even), so the union of two
    internally-distinct sets needs no re-dedup.  Mirrors
    :func:`_copurchase_pairs_np` (same gates, same parity pinning in
    tests/test_resident_tiers.py)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    sel = li.select("l_suppkey", "l_partkey")
    if not all(
        isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType))
        for f in sel.schema.fields
    ):
        return None
    if sel.count() > _COPURCHASE_ITEM_ROWS_MAX:
        return None
    tbl = sel.toArrow().combine_chunks()
    if any(tbl.column(i).null_count for i in range(2)):
        return None
    s = tbl.column(0).to_numpy().astype(np.int64, copy=False)
    p = tbl.column(1).to_numpy().astype(np.int64, copy=False)
    if len(s) and (
        min(int(s.min()), int(p.min())) < 0
        or max(int(s.max()), int(p.max())) >= (1 << 30)
    ):
        return None  # encoded ids must pack into src*2^32+dst
    src = s * 2
    dst = p * 2 + 1
    codes = np.unique(src * (1 << 32) + dst)
    src = (codes >> 32).astype(np.int64)
    dst = (codes & 0xFFFFFFFF).astype(np.int64)
    if doubled:
        src, dst = (
            np.concatenate([src, dst]),
            np.concatenate([dst, src]),
        )
    ids = np.sort(pd.unique(np.concatenate([src, dst])))
    if len(ids) == 0:
        return ids, src, dst
    base, hi = int(ids[0]), int(ids[-1])
    if hi - base + 1 <= max(4 * len(ids), 1 << 20):
        # dense id range: O(E) table lookup (the _collect_edges_np
        # guard — sparse huge key spaces take searchsorted instead)
        lut = np.empty(hi - base + 1, dtype=np.int64)
        lut[ids - base] = np.arange(len(ids), dtype=np.int64)
        return ids, lut[src - base], lut[dst - base]
    return ids, np.searchsorted(ids, src), np.searchsorted(ids, dst)


def _copurchase_pairs(li: DataFrame) -> DataFrame:
    """DISTINCT part co-purchase pairs (src < dst, parts sharing an
    order) in TWO exchanges: one groupBy(order) whose map-side partial
    ``collect_set`` dedups (order, part) for free, pair generation as
    a posexplode + slice-explode over the sorted per-order array (no
    shuffle), then one global distinct.  Replaces the
    distinct -> o-keyed self-join -> distinct formulation, which paid
    FOUR exchanges for the same rows (distinct, both self-join sides,
    final dedup) — measured 3.3s -> 1.3s for the construction at
    sf0.1 (guide §2.4: remove shuffles outright).  Skew parity: an
    order with k parts emits C(k,2) pairs inside one task, exactly the
    colocation the o-keyed self-join had."""
    parts = li.groupBy(F.col("l_orderkey").alias("_o")).agg(
        F.sort_array(F.collect_set("l_partkey")).alias("_ps")
    )
    return (
        parts.select(F.col("_ps"), F.posexplode("_ps").alias("_i", "src"))
        .select(
            "src",
            F.explode(F.expr("slice(_ps, _i + 2, size(_ps))")).alias("dst"),
        )
        .distinct()
    )


#: Measured gates for the fused resident co-purchase construction
#: (r13).  ITEM_ROWS bounds the one Arrow collect (two int64 columns:
#: 8M rows = 128 MB, the driver-resident class); RAW_PAIRS bounds the
#: transient per-order pair expansion BEFORE dedup (computed exactly
#: from the group sizes, never materialized above the cap).  The
#: DISTINCT pair count is re-gated by the consumer against
#: RESIDENT_EDGES_MAX, so the fused path engages only where the
#: operator's own resident tier would have run anyway — it just skips
#: the Spark pair build + checkpoint + re-collect round trip
#: (measured 1.34 s -> 0.47 s for the construction at sf0.1; the
#: distributed plan above any gate is byte-identical).
_COPURCHASE_ITEM_ROWS_MAX = 8_000_000
_COPURCHASE_RAW_PAIRS_MAX = 16_000_000


def _copurchase_pairs_np(li: DataFrame):
    """Resident twin of :func:`_copurchase_pairs`: the same DISTINCT
    src<dst co-purchase pair set built in numpy from one bounded Arrow
    collect of (l_orderkey, l_partkey) — returns the
    ``(ids, si, di)`` triple of ``_collect_edges_np`` form, or None
    when any measured gate fails (nulls, non-integral keys, row / raw
    pair budgets), in which case the caller falls back to the
    unchanged Spark construction.  Pair-set parity with the Spark
    build is pinned in tests/test_resident_tiers.py."""
    import numpy as np
    import pandas as pd
    import pyarrow.types as pat

    sel = li.select("l_orderkey", "l_partkey")
    from pyspark.sql import types as T

    if not all(
        isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType))
        for f in sel.schema.fields
    ):
        return None
    if sel.count() > _COPURCHASE_ITEM_ROWS_MAX:
        return None
    tbl = sel.toArrow().combine_chunks()
    if any(tbl.column(i).null_count for i in range(2)):
        return None
    o = tbl.column(0).to_numpy().astype(np.int64, copy=False)
    p = tbl.column(1).to_numpy().astype(np.int64, copy=False)
    if len(p) == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty
    if p.min() < 0 or p.max() >= (1 << 31):
        return None  # keys must pack into lo*2^32+hi without overflow
    # dedup (order, part) — the map-side collect_set dedup's twin
    order = np.lexsort((p, o))
    o, p = o[order], p[order]
    keep = np.ones(len(o), dtype=bool)
    keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
    o, p = o[keep], p[keep]
    # group extents per order over the sorted runs
    starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
    lens = np.diff(np.r_[starts, len(o)])
    if int(np.sum(lens * (lens - 1) // 2)) > _COPURCHASE_RAW_PAIRS_MAX:
        return None
    grp = np.cumsum(np.r_[False, o[1:] != o[:-1]])
    rem = starts[grp] + lens[grp] - np.arange(len(o)) - 1
    # diagonal-offset pair expansion (the _resident_triangle_counts
    # wedge idiom): iteration d pairs each element with the one d
    # slots later in its order's sorted run — every within-order pair
    # exactly once, no np.repeat blow-up
    pa, pb = [], []
    valid = np.arange(len(o))
    d = 1
    while True:
        valid = valid[rem[valid] >= d]
        if len(valid) == 0:
            break
        pa.append(p[valid])
        pb.append(p[valid + d])
        d += 1
    if not pa:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty
    a = np.concatenate(pa)
    b = np.concatenate(pb)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    m = lo != hi  # within-run equal keys impossible post-dedup; keep exact
    codes = np.unique(lo[m] * (1 << 32) + hi[m])
    src = (codes >> 32).astype(np.int64)
    dst = (codes & 0xFFFFFFFF).astype(np.int64)
    ids = np.sort(pd.unique(np.concatenate([src, dst])))
    if len(ids) == 0:
        return ids, src, dst
    base, hi = int(ids[0]), int(ids[-1])
    if hi - base + 1 <= max(4 * len(ids), 1 << 20):
        # dense id range: O(E) lookup; sparse huge key spaces would
        # otherwise allocate a (hi-lo)-sized table (the
        # _collect_edges_np guard)
        lut = np.empty(hi - base + 1, dtype=np.int64)
        lut[ids - base] = np.arange(len(ids), dtype=np.int64)
        return ids, lut[src - base], lut[dst - base]
    return ids, np.searchsorted(ids, src), np.searchsorted(ids, dst)


def _sp_decode(col: str) -> F.Column:
    """Inverse of :func:`_sp_edges`' encoding: even -> 's<k>',
    odd -> 'p<k>' — byte-identical to the oracle's
    ``'s' || CAST(l_suppkey AS VARCHAR)`` construction."""
    half = F.expr(f"CAST(({col} div 2) AS STRING)")
    return F.when(
        F.col(col) % 2 == 0, F.concat(F.lit("s"), half)
    ).otherwise(F.concat(F.lit("p"), half))


@register(
    "cypher_customer_order_rollup",
    oracle="""
    SELECT c_name AS name,
           COUNT(*) AS big_orders,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM customer JOIN orders ON o_custkey = c_custkey
    WHERE o_totalprice > 150000
    GROUP BY c_name
    """,
    doc="Cypher MATCH + WHERE + WITH implicit grouping compiled to DataFrame joins (SURVEY §4 custom #1).",
    tags=("cypher",),
    bench=True,
)
def cypher_customer_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = CypherEngine(_graph_tables(spark, sf_dir))
    return eng.query(
        "MATCH (c:Customer)-[:HAS_ORDER]->(o:Order) "
        "WHERE o.o_totalprice > 150000 "
        "WITH c, count(o) AS big_orders, sum(o.o_totalprice) AS raw_total "
        "RETURN c.c_name AS name, big_orders, round(raw_total, 2) AS total_value"
    )


@register(
    "cypher_optional_match_anti",
    oracle="""
    SELECT c_name AS name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Cypher OPTIONAL MATCH ... WHERE x IS NULL anti-join idiom through the compiler (fact_query.py:78-79 semantics).",
    tags=("cypher",),
)
def cypher_optional_match_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = CypherEngine(_graph_tables(spark, sf_dir))
    return eng.query(
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:HAS_ORDER]->(o:Order) "
        "WHERE o IS NULL RETURN c.c_name AS name"
    )


@register(
    "cypher_union_label_counts",
    oracle="""
    SELECT 'Customer' AS label, COUNT(*) AS cnt FROM customer
    UNION ALL SELECT 'Order' AS label, COUNT(*) AS cnt FROM orders
    UNION ALL SELECT 'Supplier' AS label, COUNT(*) AS cnt FROM supplier
    """,
    doc="Cypher UNION ALL label counts through the compiler (example_queries_tool.py:82 idiom).",
    tags=("cypher",),
)
def cypher_union_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = CypherEngine(_graph_tables(spark, sf_dir))
    return eng.query(
        "MATCH (n:Customer) RETURN 'Customer' AS label, count(n) AS cnt "
        "UNION ALL MATCH (n:Order) RETURN 'Order' AS label, count(n) AS cnt "
        "UNION ALL MATCH (n:Supplier) RETURN 'Supplier' AS label, count(n) AS cnt"
    )


@register(
    "cypher_colleague_pairs",
    oracle="""
    SELECT n_name AS nation, COUNT(*) AS pairs
    FROM supplier s1
    JOIN supplier s2 ON s1.s_nationkey = s2.s_nationkey
                    AND CAST(s1.s_suppkey AS VARCHAR) < CAST(s2.s_suppkey AS VARCHAR)
    JOIN nation ON s1.s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Cypher comma-pattern self-join (colleague query, custom_graph_demo/05_query_graph.py:99-104) through the compiler.",
    tags=("cypher",),
)
def cypher_colleague_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = CypherEngine(_graph_tables(spark, sf_dir))
    return eng.query(
        "MATCH (s1:Supplier)-[:IN_NATION]->(n:Nation), "
        "(s2:Supplier)-[:IN_NATION]->(n) WHERE s1 < s2 "
        "WITH n, count(*) AS pairs RETURN n.n_name AS nation, pairs"
    )


@register(
    "cypher_case_and_contains",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS rich,
           CAST(SUM(CASE WHEN c_acctbal <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS modest
    FROM customer
    WHERE CONTAINS(c_mktsegment, 'U')
    GROUP BY c_mktsegment
    """,
    doc="Cypher CASE WHEN conditional aggregation + CONTAINS through the compiler (accounting demo idiom).",
    tags=("cypher",),
)
def cypher_case_and_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = CypherEngine(_graph_tables(spark, sf_dir))
    return eng.query(
        "MATCH (c:Customer) WHERE c.c_mktsegment CONTAINS 'U' "
        "RETURN c.c_mktsegment AS segment, "
        "sum(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END) AS rich, "
        "sum(CASE WHEN c.c_acctbal <= 5000 THEN 1 ELSE 0 END) AS modest"
    )


@register(
    "cypher_varlength_reachability",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT CAST(a.n_nationkey AS VARCHAR) AS src, CAST(b.n_nationkey AS VARCHAR) AS dst
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND b.n_nationkey = a.n_nationkey + 5
    ), paths AS (
      SELECT src AS start_node, dst AS end_node, 1 AS depth FROM edges
      UNION ALL
      SELECT p.start_node, e.dst, p.depth + 1
      FROM paths p JOIN edges e ON p.end_node = e.src
      WHERE p.depth < 3
    )
    SELECT start_node, end_node, CAST(MIN(depth) AS INT) AS depth
    FROM paths GROUP BY start_node, end_node
    """,
    doc="Var-length [*1..3] through the CYPHER COMPILER (BFS join loop) vs recursive-CTE oracle (SURVEY §2.3 J9).",
    tags=("cypher", "graph"),
)
def cypher_varlength_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("b.n_nationkey") == F.col("a.n_nationkey") + 5),
    ).select(
        F.col("a.n_nationkey").cast("string").alias("src"),
        F.col("b.n_nationkey").cast("string").alias("dst"),
    )
    nodes = nation.select(F.col("n_nationkey").cast("string").alias("identifier"))
    eng = CypherEngine({"Nation": nodes, "NEXT": edges})
    return eng.query(
        "MATCH (a:Nation)-[r:NEXT*1..3]->(b:Nation) "
        "RETURN a.identifier AS start_node, b.identifier AS end_node, "
        "toInteger(r.depth) AS depth"
    )


@register(
    "cypher_shortest_path_surface",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT CAST(a.n_nationkey AS VARCHAR) AS src, CAST(b.n_nationkey AS VARCHAR) AS dst
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND b.n_nationkey = a.n_nationkey + 5
    ), paths AS (
      SELECT src AS start_node, dst AS end_node, 1 AS depth FROM edges
      UNION ALL
      SELECT p.start_node, e.dst, p.depth + 1
      FROM paths p JOIN edges e ON p.end_node = e.src
      WHERE p.depth < 4
    )
    SELECT start_node, end_node, CAST(MIN(depth) AS BIGINT) AS path_len
    FROM paths GROUP BY start_node, end_node
    """,
    doc="Neo4j shortestPath() SURFACE through the Cypher compiler: "
    "MATCH p = shortestPath((a)-[:NEXT*1..4]->(b)) RETURN length(p) — "
    "compiled to the bounded-BFS pair frame whose first-discovery depth "
    "IS the minimum hop count, vs a recursive-CTE MIN(depth) oracle "
    "(reference cost-flags the same syntax, execution_strategies.py:86-88).",
    tags=("cypher", "graph"),
)
def cypher_shortest_path_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("b.n_nationkey") == F.col("a.n_nationkey") + 5),
    ).select(
        F.col("a.n_nationkey").cast("string").alias("src"),
        F.col("b.n_nationkey").cast("string").alias("dst"),
    )
    nodes = nation.select(F.col("n_nationkey").cast("string").alias("identifier"))
    eng = CypherEngine({"Nation": nodes, "NEXT": edges})
    return eng.query(
        "MATCH p = shortestPath((a:Nation)-[:NEXT*1..4]->(b:Nation)) "
        "RETURN a.identifier AS start_node, b.identifier AS end_node, "
        "toInteger(length(p)) AS path_len"
    )


@register(
    "graph_weighted_shortest_paths",
    oracle=r"""
    WITH RECURSIVE e AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst,
             CAST((a.n_nationkey * 7 + b.n_nationkey * 13) % 10 + 1 AS DOUBLE) AS w
      FROM nation a
      JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
    ),
    p AS (
      SELECT src, dst, w, 1 AS d FROM e
      UNION ALL
      SELECT p.src, e.dst, p.w + e.w, p.d + 1
      FROM p JOIN e ON p.dst = e.src
      WHERE p.d < 4
    )
    SELECT src, dst, ROUND(MIN(w), 6) AS min_cost
    FROM p GROUP BY src, dst
    """,
    doc="Weighted shortest paths (<=4 hops) over the same-region nation digraph "
    "with deterministic non-metric weights — distributed Bellman-Ford relax "
    "loop vs a depth-bounded recursive-CTE min. State is |pairs|, never |paths|.",
    tags=("graph",),
)
def graph_weighted_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import weighted_shortest_paths

    nation = read_table(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") != F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
        ((F.col("a.n_nationkey") * 7 + F.col("b.n_nationkey") * 13) % 10 + 1).alias(
            "weight"
        ),
    )
    out = weighted_shortest_paths(edges, max_iter=4)
    return out.select("src", "dst", F.round("w", 6).alias("min_cost"))


# ---------------------------------------------------------------------------
# PageRank over the supplier->part bipartite graph from lineitem, with
# an exact UNROLLED-CTE oracle: fixed iterations + per-iteration
# rounding make the distributed loop bit-comparable to DuckDB (the
# same contract the k-means oracle uses).  Parts have no out-edges, so
# every part is a dangling node — the redistribution path is load-
# bearing, not decorative.
# ---------------------------------------------------------------------------
_PR_ITER = 4
_PR_DAMP = 0.85


def _pagerank_oracle(num_iter: int, damping: float) -> str:
    head = """
    WITH e AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'p' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (
      SELECT node, ROUND(1.0 / nn.n, 10) AS rank FROM nodes, nn
    )"""
    step = """,
    r{k} AS (
      SELECT n.node,
             ROUND((1 - {d}) / nn.n
                   + {d} * (COALESCE(c.s, 0) + dang.m / nn.n), 10) AS rank
      FROM nodes n
      CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank / deg.d) AS s
        FROM e JOIN r{p} r ON r.node = e.src JOIN deg ON deg.src = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
      CROSS JOIN (
        SELECT COALESCE(SUM(r.rank), 0) AS m
        FROM r{p} r LEFT JOIN deg ON deg.src = r.node
        WHERE deg.src IS NULL
      ) dang
    )"""
    sql = head
    for k in range(1, num_iter + 1):
        sql += step.format(k=k, p=k - 1, d=damping)
    sql += f"""
    SELECT node, ROUND(rank, 8) AS rank FROM r{num_iter}
    """
    return sql


@register(
    "graph_pagerank_supplier_part",
    oracle=_pagerank_oracle(_PR_ITER, _PR_DAMP),
    doc=(
        "Distributed PageRank (4 damped iterations, dangling-mass "
        "redistribution) over the supplier->part bipartite digraph from "
        "lineitem — Pregel-style joins + grouped sums vs an unrolled-CTE "
        "oracle; per-iteration rounding is the cross-engine determinism "
        "contract. State is one row per node; no driver-side node state."
    ),
    tags=("graph",),
    bench=True,
)
def graph_pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import pagerank

    li = read_table(spark, sf_dir, "lineitem")
    # long-encoded node ids (see _sp_edges): rank values are identical
    # to the string-keyed run — node ids only ever GROUP here, and
    # grouping is preserved by any injective encoding
    # broadcast_state stays "auto": the operator measures the node
    # count and hints map-side state joins only while it fits the
    # broadcast budget — at 100 TB the same query degrades to shuffles
    # r13: fused resident edge construction under the measured gates
    # (skips the Spark distinct + checkpoint + re-collect round trip;
    # None above the gates = the r12 plan unchanged)
    out = pagerank(
        _sp_edges(li), num_iter=_PR_ITER, damping=_PR_DAMP,
        precollected=_sp_edges_np(li),
    )
    return out.select(
        _sp_decode("node").alias("node"), F.round("rank", 8).alias("rank")
    )


@register(
    "graph_triangle_counts",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tris AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.u = e1.v
      JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, COUNT(*) AS n_triangles
    FROM (
      SELECT a AS node FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    GROUP BY node
    ORDER BY node
    """,
    doc=(
        "Exact per-node triangle counts over the part co-purchase graph "
        "(parts sharing an order) — degree-oriented compact-forward "
        "enumeration (operators/graph.triangle_count): wedge generation "
        "is bounded by Σ C(outdeg,2) with outdeg ≤ O(√m), so a hub node "
        "cannot go quadratic; the oracle is the naive id-ordered triple "
        "join (orientation changes the plan, never the triangle set)."
    ),
    tags=("graph", "triangles"),
    bench=True,
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import triangle_counts_per_node

    li = read_table(spark, sf_dir, "lineitem")
    # _copurchase_pairs output is DISTINCT src<dst by construction, so
    # the operator's canonicalize+distinct pass is a provable no-op —
    # canonical=True skips that exchange (r12; values unchanged).
    # r13: under the measured gates the pair set is built resident and
    # handed straight to the operator's resident tier — the Spark pair
    # build + checkpoint + re-collect round trip disappears (entry
    # 3.4 -> 2.0 s at sf0.1); precollected=None above the gates keeps
    # the r12 plan unchanged.
    return triangle_counts_per_node(
        _copurchase_pairs(li),
        canonical=True,
        precollected=_copurchase_pairs_np(li),
    ).orderBy("node")


_KCORE_K = 60
_KCORE_ROUNDS = 4


@register(
    "graph_kcore_parts",
    oracle=__import__(
        "robosystems_spark.operators.graph", fromlist=["kcore_oracle_ctes"]
    ).kcore_oracle_ctes(
        _KCORE_K,
        _KCORE_ROUNDS,
        """p0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e0 AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM p0 UNION ALL SELECT v, u FROM p0
)""",
    ),
    doc="k-core extraction (k=60, 4 fixed peel rounds) over the part "
    "co-occurrence graph: per round one degree groupBy + two node-keyed "
    "semi-joins, O(edges) each, no driver state; fixed rounds make the "
    "result identical-by-construction across engines (= the true "
    "k-core once rounds cover the peel depth).",
    tags=("graph",),
    bench=True,
)
def graph_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import kcore

    li = read_table(spark, sf_dir, "lineitem")
    # _copurchase_pairs is distinct with src<dst: doubling is
    # dup/loop-free, so canonical=True stays valid.  r13: fused
    # resident pair construction under the measured gates (entry
    # 2.1 -> 0.6 s at sf0.1; None above the gates = r12 plan).
    return kcore(
        _copurchase_pairs(li), k=_KCORE_K, rounds=_KCORE_ROUNDS,
        canonical=True, broadcast_keep=True,  # k=60 keeps the set small
        precollected=_copurchase_pairs_np(li),
    )


_LPA_ROUNDS = 3

# Long-encoded node ids (supplier k -> 2k, part k -> 2k+1, the
# _sp_edges convention).  LPA's min-label tie-break is ORDER-sensitive,
# so the oracle must rank labels in the same (numeric) domain as the
# Spark side — communities are therefore keyed by the encoded long on
# both sides, and _sp_decode renders them as 's<k>'/'p<k>' display
# strings identically in both engines.
_LPA_EDGES_CTE = """sp AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) * 2 AS u,
                  CAST(l_partkey AS BIGINT) * 2 + 1 AS v
  FROM lineitem
),
e0 AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM sp UNION
  SELECT v, u FROM sp
)"""


@register(
    "graph_label_propagation",
    oracle=__import__(
        "robosystems_spark.operators.graph", fromlist=["lpa_oracle_ctes"]
    ).lpa_oracle_ctes(_LPA_ROUNDS, _LPA_EDGES_CTE),
    doc="Deterministic synchronous label propagation (Raghavan et al. "
    "2007) over the supplier-part bipartite graph, 3 fixed rounds: "
    "plurality neighbor label, min-label tie-break — the two "
    "nondeterminism sources of textbook LPA (visit order, random "
    "ties) replaced by a total order, so communities are identical-"
    "by-construction cross-engine. Per round one node-keyed join + "
    "one count aggregation + one argmax window, all O(edges); label "
    "state is one row per node. Returns community sizes.",
    tags=("graph",),
    bench=True,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import label_propagation

    li = read_table(spark, sf_dir, "lineitem")
    # long-encoded node ids; the tie-break ranks labels numerically on
    # BOTH sides (_LPA_EDGES_CTE uses the same encoding), so community
    # ids are the encoded longs in the output of both engines
    # bipartite distinct edges (even->odd ids): doubling is simple
    # r13: fused resident edge construction — the doubled triple is
    # the LPA setup shape (see pagerank entry)
    return label_propagation(
        _sp_edges(li).dropDuplicates(), rounds=_LPA_ROUNDS, canonical=True,
        precollected=_sp_edges_np(li, doubled=True),
    )


@register(
    "graph_adamic_adar_suppliers",
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_suppkey AS u, l_partkey AS z FROM lineitem
    ),
    deg AS (SELECT z, COUNT(*) AS d FROM e GROUP BY z),
    w AS (
      SELECT z, CAST(ROUND(1000000000.0 / LN(d)) AS BIGINT) AS wv
      FROM deg WHERE d BETWEEN 2 AND 40
    ),
    wedges AS (
      SELECT a.u AS u1, b.u AS u2, w.wv
      FROM e a JOIN e b ON b.z = a.z AND a.u < b.u
      JOIN w ON w.z = a.z
    )
    SELECT u1, u2,
           ROUND(CAST(SUM(wv) AS DOUBLE) / 1000000000.0, 6) AS aa_score
    FROM wedges
    GROUP BY u1, u2
    ORDER BY aa_score DESC, u1, u2
    LIMIT 50
    """,
    doc="Adamic-Adar link prediction (Adamic & Adar 2003) over the "
    "supplier-part bipartite graph: suppliers scored similar by their "
    "shared parts, weighted 1/ln(part degree).  Wedge generation is "
    "the part-keyed self-join with a degree cap (hub parts carry ~zero "
    "AA weight and are dropped — the PPMI hot-context pattern), so the "
    "worst join key is bounded at 100 TB; integer-scaled weights make "
    "the per-pair sums exact and hash-identical to the oracle.",
    tags=("graph", "similarity"),
)
def graph_adamic_adar_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import adamic_adar_bipartite

    edges = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
        )
        .distinct()
    )
    return adamic_adar_bipartite(edges, max_right_degree=40, topk=50)


_PPR_SEEDS = ["s1", "s2", "s3"]


def _ppr_oracle(num_iter: int, damping: float, seeds: list[str]) -> str:
    """Unrolled-CTE personalized-PageRank oracle: identical teleport
    vector, dangling-to-seed restart, and per-iteration rounding."""
    seed_list = ", ".join(f"'{s}'" for s in seeds)
    inv = 1.0 / len(seeds)
    head = f"""
    WITH e AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'p' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem
    ),
    nodes AS (
      SELECT node,
             CASE WHEN node IN ({seed_list}) THEN {inv!r} ELSE 0.0 END AS s
      FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT node, ROUND(s, 10) AS rank FROM nodes)"""
    step = """,
    r{k} AS (
      SELECT n.node,
             ROUND((1 - {d}) * n.s
                   + {d} * (COALESCE(c.cs, 0) + dang.m * n.s), 10) AS rank
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank / deg.d) AS cs
        FROM e JOIN r{p} r ON r.node = e.src JOIN deg ON deg.src = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
      CROSS JOIN (
        SELECT COALESCE(SUM(r.rank), 0) AS m
        FROM r{p} r LEFT JOIN deg ON deg.src = r.node
        WHERE deg.src IS NULL
      ) dang
    )"""
    sql = head
    for k in range(1, num_iter + 1):
        sql += step.format(k=k, p=k - 1, d=damping)
    sql += f"""
    SELECT node, ROUND(rank, 8) AS rank FROM r{num_iter}
    WHERE rank > 0
    """
    return sql


@register(
    "graph_personalized_pagerank",
    oracle=_ppr_oracle(_PR_ITER, _PR_DAMP, _PPR_SEEDS),
    doc=(
        "Personalized PageRank from a 3-supplier seed set over the "
        "supplier->part bipartite digraph: teleport and dangling mass "
        "restart to the seeds (uniform over the set), so ranks measure "
        "proximity to the seeds — the related-entity / recommendation "
        "primitive. Same Pregel-as-joins shape and per-iteration rounding "
        "contract as the global PageRank entry; zero-rank nodes are "
        "dropped (unreachable from the seeds)."
    ),
    tags=("graph", "similarity"),
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import personalized_pagerank

    li = read_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    out = personalized_pagerank(
        edges, _PPR_SEEDS, num_iter=_PR_ITER, damping=_PR_DAMP
    )
    return out.select("node", F.round("rank", 8).alias("rank")).filter(
        F.col("rank") > 0
    )


@register(
    "graph_clustering_coefficient",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs
      ) GROUP BY node
    ),
    tris AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.u = e1.v
      JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pernode AS (
      SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           COALESCE(p.n_triangles, 0) AS n_triangles,
           ROUND(2.0 * COALESCE(p.n_triangles, 0)
                 / (d.degree * (d.degree - 1)), 6) AS coefficient
    FROM deg d LEFT JOIN pernode p USING (node)
    WHERE d.degree >= 2
    """,
    doc="Local clustering coefficient per node (2T/(d(d-1)) over the "
    "part co-occurrence graph): how close each node's neighborhood is "
    "to a clique — the community-structure / collusion-ring signal. "
    "Reuses the degree-oriented exact triangle enumeration plus one "
    "degree aggregation; exact integer ratio, rounded at output.",
    tags=("graph",),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import clustering_coefficient

    li = read_table(spark, sf_dir, "lineitem")
    return clustering_coefficient(_copurchase_pairs(li))


def _hits_oracle(num_iter: int) -> str:
    """Unrolled-CTE HITS twin: L1-normalized authority/hub updates with
    the same per-iteration ROUND(…, 10) contract as `_pagerank_oracle`."""
    head = """
    WITH e AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'p' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    h0 AS (SELECT node, ROUND(1.0 / nn.n, 10) AS hub FROM nodes, nn)"""
    step = """,
    a{k}_raw AS (
      SELECT e.dst AS node, SUM(h.hub) AS r
      FROM e JOIN h{p} h ON h.node = e.src GROUP BY e.dst
    ),
    a{k} AS (
      SELECT n.node, ROUND(COALESCE(ar.r, 0) / t.t, 10) AS authority
      FROM nodes n
      LEFT JOIN a{k}_raw ar ON ar.node = n.node
      CROSS JOIN (SELECT SUM(r) AS t FROM a{k}_raw) t
    ),
    h{k}_raw AS (
      SELECT e.src AS node, SUM(a.authority) AS r
      FROM e JOIN a{k} a ON a.node = e.dst GROUP BY e.src
    ),
    h{k} AS (
      SELECT n.node, ROUND(COALESCE(hr.r, 0) / t.t, 10) AS hub
      FROM nodes n
      LEFT JOIN h{k}_raw hr ON hr.node = n.node
      CROSS JOIN (SELECT SUM(r) AS t FROM h{k}_raw) t
    )"""
    sql = head
    for k in range(1, num_iter + 1):
        sql += step.format(k=k, p=k - 1)
    # NO second rounding on output: re-rounding the 10-digit iteration
    # values to fewer digits creates fresh ..50 ties that the two
    # engines' doubles break differently (seen once in 2100 rows at
    # sf0.01); the round-10 values ARE the contract.
    return (
        sql
        + f"""
    SELECT h.node, h.hub, a.authority
    FROM h{num_iter} h JOIN a{num_iter} a USING (node)
    """
    )


_HITS_ITER = 3


@register(
    "graph_hits_supplier_part",
    oracle=_hits_oracle(_HITS_ITER),
    doc=(
        "HITS hubs-and-authorities (Kleinberg 1999; 3 L1-normalized "
        "mutually-recursive updates) over the supplier->part digraph: "
        "hub suppliers stock many authoritative parts, authoritative "
        "parts are stocked by hub suppliers. Pregel-as-joins with two "
        "1-row normalization broadcasts per iteration; per-iteration "
        "rounding is the cross-engine contract, oracle is the "
        "unrolled-CTE twin. State is one row per node."
    ),
    tags=("graph",),
    bench=True,
)
def graph_hits_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import hits

    li = read_table(spark, sf_dir, "lineitem")
    # long-encoded node ids (see _sp_edges): hub/authority values are
    # identical — ids only group, never order
    # r13: fused resident edge construction (see pagerank entry)
    out = hits(
        _sp_edges(li), num_iter=_HITS_ITER,  # auto broadcast_state
        precollected=_sp_edges_np(li),
    )
    # emit the per-iteration round-10 values directly — a second
    # rounding would introduce new tie boundaries (see oracle note)
    return out.select(
        _sp_decode("node").alias("node"), "hub", "authority"
    )


@register(
    "graph_link_prediction_jaccard",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS a,
                      'p' || CAST(l_partkey AS VARCHAR) AS b
      FROM lineitem
    ),
    adj AS (
      SELECT a AS node, b AS nbr FROM e
      UNION
      SELECT b AS node, a AS nbr FROM e
    ),
    deg AS (SELECT node, COUNT(*) AS degree FROM adj GROUP BY node),
    capped AS (
      SELECT adj.node, adj.nbr FROM adj
      JOIN deg d ON d.node = adj.nbr AND d.degree <= 40
    ),
    common AS (
      SELECT x.node AS u1, y.node AS u2, COUNT(*) AS common_neighbors
      FROM capped x JOIN capped y
        ON x.nbr = y.nbr AND x.node < y.node
      GROUP BY 1, 2
    )
    SELECT c.u1, c.u2, c.common_neighbors,
           d1.degree AS degree_u1, d2.degree AS degree_u2,
           ROUND(CAST(c.common_neighbors AS DOUBLE)
                 / (d1.degree + d2.degree - c.common_neighbors), 6)
             AS jaccard
    FROM common c
    JOIN deg d1 ON d1.node = c.u1
    JOIN deg d2 ON d2.node = c.u2
    ORDER BY jaccard DESC, u1 ASC, u2 ASC
    LIMIT 50
    """,
    doc=(
        "Common-neighbor link prediction: top-50 node pairs by Jaccard "
        "neighborhood overlap over the undirected supplier-part graph "
        "(s-s pairs share parts, p-p pairs share suppliers). Wedge "
        "generation is the shared-neighbor self-join with the worst key "
        "capped at degree 40 (hubs connect everyone and carry no "
        "signal — the Adamic-Adar cap); full degrees still count "
        "capped hubs. Exact integer counts, one rounded division, "
        "total-ordered top-k."
    ),
    tags=("graph",),
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import link_prediction_jaccard

    li = read_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    return link_prediction_jaccard(
        edges, max_neighbor_degree=40, topk=50
    )


_SCC_EDGES_CTE = """e0 AS (
  SELECT CAST(a.n_nationkey AS BIGINT) AS src,
         CAST(COALESCE(
           (SELECT MIN(b.n_nationkey) FROM nation b
             WHERE b.n_regionkey = a.n_regionkey
               AND b.n_nationkey > a.n_nationkey),
           (SELECT MIN(b.n_nationkey) FROM nation b
             WHERE b.n_regionkey = a.n_regionkey)) AS BIGINT) AS dst
  FROM nation a
  UNION ALL
  SELECT CAST(x.m AS BIGINT), CAST(y.m AS BIGINT)
  FROM (SELECT n_regionkey, MIN(n_nationkey) AS m FROM nation GROUP BY n_regionkey) x
  JOIN (SELECT n_regionkey, MIN(n_nationkey) AS m FROM nation GROUP BY n_regionkey) y
    ON y.n_regionkey = x.n_regionkey + 1
  UNION ALL
  SELECT CAST(m AS BIGINT), CAST(m + 100 AS BIGINT)
  FROM (SELECT n_regionkey, MIN(n_nationkey) AS m FROM nation GROUP BY n_regionkey)
)"""


@register(
    "graph_scc_components",
    oracle=__import__(
        "robosystems_spark.operators.graph", fromlist=["scc_oracle_sql"]
    ).scc_oracle_sql(_SCC_EDGES_CTE),
    doc="Strongly-connected components (directed) by forward-backward "
    "min-label peeling over a nation-derived digraph: per-region "
    "cyclic rings (5 nontrivial SCCs), one-directional bridges "
    "between region minima (condensation DAG edges that must NOT "
    "merge components), and dangling leaf nodes (singleton SCCs). "
    "Oracle = mutual-reachability closure (DISTINCT-fixpoint "
    "recursive CTE) with component = min of the mutual set.",
    tags=("graph",),
)
def graph_scc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from robosystems_spark.operators.graph import strongly_connected_components

    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("n"),
        F.col("n_regionkey").alias("r"),
    )
    win = Window.partitionBy("r").orderBy("n")
    ring = nation.select(
        F.col("n").alias("src"),
        F.coalesce(
            F.lead("n").over(win), F.min("n").over(Window.partitionBy("r"))
        ).alias("dst"),
    )
    mins = nation.groupBy("r").agg(F.min("n").alias("m"))
    bridge = (
        mins.alias("x")
        .join(mins.alias("y"), F.col("y.r") == F.col("x.r") + 1)
        .select(F.col("x.m").alias("src"), F.col("y.m").alias("dst"))
    )
    leaf = mins.select(
        F.col("m").alias("src"), (F.col("m") + 100).alias("dst")
    )
    edges = ring.unionByName(bridge).unionByName(leaf)
    return strongly_connected_components(edges).orderBy("node")


_HARMONIC_DEPTH = 3

_HARMONIC_EDGES_CTE = """e0 AS (
  SELECT CAST(c_custkey AS BIGINT) AS src,
         CAST((c_custkey * 31 + 7) % (SELECT COUNT(*) FROM customer)
              AS BIGINT) AS dst
  FROM customer
)"""


@register(
    "graph_harmonic_centrality",
    oracle=__import__(
        "robosystems_spark.operators.graph", fromlist=["harmonic_oracle_sql"]
    ).harmonic_oracle_sql(_HARMONIC_EDGES_CTE, _HARMONIC_DEPTH),
    doc="Bounded harmonic centrality (sum of 1/d over nodes within "
    "depth 3) on the customer 'referral' functional digraph "
    "(c -> (31c+7) mod N): multi-source BFS via the bounded_paths "
    "frontier machinery, then counts-per-depth folded in a FIXED "
    "order (c1/1 + c2/2 + c3/3) so Spark and the unrolled-BFS DuckDB "
    "oracle compute bit-identical doubles before ROUND — the "
    "distance-based centrality complementing PageRank/HITS.",
    tags=("graph",),
    bench=True,
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import harmonic_centrality

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("src")
    )
    n = cust.agg(F.count("*").alias("_n"))
    edges = cust.crossJoin(F.broadcast(n)).select(
        "src", ((F.col("src") * 31 + 7) % F.col("_n")).alias("dst")
    )
    return harmonic_centrality(edges, max_depth=_HARMONIC_DEPTH).orderBy("node")


@register(
    "graph_modularity_lpa",
    oracle=__import__(
        "robosystems_spark.operators.graph",
        fromlist=["modularity_oracle_sql"],
    ).modularity_oracle_sql(_LPA_ROUNDS, _LPA_EDGES_CTE),
    doc="Newman modularity (Newman & Girvan 2004) of the "
    "deterministic-LPA communities over the supplier-part bipartite "
    "graph: per community Q_c = e_c/m - (d_c/2m)^2 — the standard "
    "quality score that tells whether LPA's communities are real "
    "structure or noise. All counting stays integer and doubled "
    "(2e_c, 2m) until one fixed IEEE expression (explicit multiply, "
    "no POWER) rounds once, so the doubles are bit-identical to the "
    "unrolled-CTE oracle. Two label joins + two hash aggregates on "
    "top of the LPA assignment.",
    tags=("graph",),
)
def graph_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import (
        label_propagation_assignments,
        modularity,
    )

    li = read_table(spark, sf_dir, "lineitem")
    # same long encoding as graph_label_propagation — the shared
    # _LPA_EDGES_CTE keeps the oracle's tie-break in the same domain
    edges = _sp_edges(li).dropDuplicates()
    assign = label_propagation_assignments(
        edges, rounds=_LPA_ROUNDS, canonical=True
    )
    return modularity(edges, assign, canonical=True)


_TRUSS_K = 10
_TRUSS_ROUNDS = 3
_TRUSS_EDGES_CTE = """e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""


@register(
    "graph_ktruss_edges",
    oracle=__import__(
        "robosystems_spark.operators.graph", fromlist=["ktruss_oracle_sql"]
    ).ktruss_oracle_sql(_TRUSS_K, _TRUSS_ROUNDS, _TRUSS_EDGES_CTE),
    doc=f"{_TRUSS_K}-truss of the part co-purchase graph (Cohen "
    "2008): fixed-round edge peeling on triangle support — the "
    "cohesive-core sibling of k-core (degree bound -> triangle "
    "bound). Support reuses the adjacency-array array_intersect "
    "closure of triangle_count (codegen, no wedge shuffle); the "
    "edge frame shrinks monotonically per round and the oracle "
    "unrolls the identical peel. Returns surviving edges with "
    "final support.",
    tags=("graph", "triangles"),
)
def graph_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import ktruss

    li = read_table(spark, sf_dir, "lineitem")
    return ktruss(_copurchase_pairs(li), k=_TRUSS_K, rounds=_TRUSS_ROUNDS)


_STRESS_DEPTH = 3
_STRESS_EDGES_CTE = """nn AS (SELECT COUNT(*) AS n FROM customer),
d0 AS (
  SELECT CAST(c_custkey AS BIGINT) AS src,
         CAST((c_custkey * 31 + 7) % nn.n AS BIGINT) AS dst
  FROM customer, nn
),
e0 AS MATERIALIZED (
  SELECT src, dst FROM d0 WHERE src <> dst
  UNION
  SELECT dst, src FROM d0 WHERE src <> dst
)"""
_STRESS_SOURCES_CTE = (
    "src0 AS (SELECT CAST(c_custkey AS BIGINT) AS s FROM customer "
    "WHERE c_custkey % 50 = 3)"
)


@register(
    "graph_stress_centrality",
    oracle=__import__(
        "robosystems_spark.operators.graph", fromlist=["stress_oracle_sql"]
    ).stress_oracle_sql(_STRESS_EDGES_CTE, _STRESS_SOURCES_CTE, _STRESS_DEPTH),
    doc="Bounded stress centrality (Shimbel 1953; Brandes 2001 "
    "two-pass, Brandes & Pich 2007 source sampling) on the "
    "undirected customer referral graph: shortest-path counts "
    "through each node from a 2%-sampled source set, depth <= 3. "
    "The integer-exact sibling of betweenness — sigma and suffix "
    "counts stay BIGINT through both passes, so the result is "
    "hash-checkable with zero float-order risk. Forward pass: "
    "per-depth edge join + anti-join + integer sum; backward pass: "
    "per-depth DAG-successor join; state one row per (source, "
    "reached node).",
    tags=("graph",),
)
def graph_stress_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import stress_centrality

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("src")
    )
    n = cust.agg(F.count("*").alias("_n"))
    d = cust.crossJoin(F.broadcast(n)).select(
        "src", ((F.col("src") * 31 + 7) % F.col("_n")).alias("dst")
    )
    sources = cust.filter(F.col("src") % 50 == 3).select(
        F.col("src").alias("s")
    )
    return stress_centrality(d, sources, max_depth=_STRESS_DEPTH)


@register(
    "graph_betweenness_sample",
    oracle=__import__(
        "robosystems_spark.operators.graph",
        fromlist=["betweenness_oracle_sql"],
    ).betweenness_oracle_sql(
        _STRESS_EDGES_CTE, _STRESS_SOURCES_CTE, _STRESS_DEPTH
    ),
    doc="Bounded betweenness centrality (Brandes 2001, Brandes & "
    "Pich 2007 sampling) on the same customer referral graph and "
    "source sample as the stress entry.  The float backward pass "
    "runs on the INTEGER LATTICE — dint(v) = sum over successors of "
    "((1e9 + dint(w)) * sigma(v)) div sigma(w), every term a BIGINT, "
    "one float division at the end — so the grouped sums are order-"
    "independent and the result hash-checks cross-engine like its "
    "integer-exact stress sibling.",
    tags=("graph",),
)
def graph_betweenness_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import betweenness_centrality

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("src")
    )
    n = cust.agg(F.count("*").alias("_n"))
    d = cust.crossJoin(F.broadcast(n)).select(
        "src", ((F.col("src") * 31 + 7) % F.col("_n")).alias("dst")
    )
    sources = cust.filter(F.col("src") % 50 == 3).select(
        F.col("src").alias("s")
    )
    return betweenness_centrality(d, sources, max_depth=_STRESS_DEPTH)


_SUMMARY_EDGES_CTE = """canon AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e0 AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM canon
  UNION ALL SELECT b, a FROM canon
)"""


@register(
    "graph_summary_stats",
    oracle=__import__(
        "robosystems_spark.operators.graph",
        fromlist=["graph_summary_oracle_sql"],
    ).graph_summary_oracle_sql(_SUMMARY_EDGES_CTE),
    doc="One-row structural profile of the part co-purchase graph: "
    "node/edge counts, average degree, density, and Newman degree "
    "assortativity (Newman 2002) — the SUMMARIZE analog for graphs. "
    "Assortativity is computed from INTEGER sums over the doubled "
    "edge list (M*Sxy - Sx^2 over M*Sxx - Sx^2) with one float "
    "division at the end, so the Pearson correlation hash-matches "
    "with zero float-accumulation risk. One degree agg + one degree "
    "join + one global aggregate.",
    tags=("graph", "profile"),
)
def graph_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import graph_summary

    li = read_table(spark, sf_dir, "lineitem")
    return graph_summary(_copurchase_pairs(li))


_ECC_DEPTH = 4


@register(
    "graph_eccentricity_sample",
    oracle=__import__(
        "robosystems_spark.operators.graph",
        fromlist=["eccentricity_oracle_sql"],
    ).eccentricity_oracle_sql(
        _STRESS_EDGES_CTE, _STRESS_SOURCES_CTE, _ECC_DEPTH
    ),
    doc="Bounded eccentricity per sampled source (depth <= 4) on the "
    "undirected customer referral graph, plus reach counts — the "
    "sampled distance profile behind diameter/radius estimation "
    "(BFS-bound technique, Magnien et al. 2009). Pure integer "
    "frontier counting: per depth one edge join + anti-join + "
    "count; shares the stress-centrality edge/source construction.",
    tags=("graph",),
)
def graph_eccentricity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import eccentricity_sample

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("src")
    )
    n = cust.agg(F.count("*").alias("_n"))
    d = cust.crossJoin(F.broadcast(n)).select(
        "src", ((F.col("src") * 31 + 7) % F.col("_n")).alias("dst")
    )
    sources = cust.filter(F.col("src") % 50 == 3).select(
        F.col("src").alias("s")
    )
    return eccentricity_sample(d, sources, max_depth=_ECC_DEPTH)


def _pagerank_weighted_oracle(num_iter: int, damping: float) -> str:
    head = """
    WITH e AS MATERIALIZED (
      SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
             'p' || CAST(l_partkey AS VARCHAR) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
    ws AS MATERIALIZED (SELECT src, SUM(w) AS wt FROM e GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (
      SELECT node, ROUND(1.0 / nn.n, 10) AS rank FROM nodes, nn
    )"""
    step = """,
    r{k} AS MATERIALIZED (
      SELECT n.node,
             ROUND((1 - {d}) / nn.n
                   + {d} * (COALESCE(c.s, 0) + dang.m / nn.n), 10) AS rank
      FROM nodes n
      CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank * e.w / ws.wt) AS s
        FROM e JOIN r{p} r ON r.node = e.src JOIN ws ON ws.src = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
      CROSS JOIN (
        SELECT COALESCE(SUM(r.rank), 0) AS m
        FROM r{p} r LEFT JOIN ws ON ws.src = r.node
        WHERE ws.src IS NULL
      ) dang
    )"""
    sql = head
    for k in range(1, num_iter + 1):
        sql += step.format(k=k, p=k - 1, d=damping)
    sql += f"""
    SELECT node, ROUND(rank, 8) AS rank FROM r{num_iter}
    """
    return sql


@register(
    "graph_pagerank_weighted",
    oracle=_pagerank_weighted_oracle(_PR_ITER, _PR_DAMP),
    doc="Weighted PageRank (Xing & Ghorbani 2004) over the "
    "supplier->part graph with lineitem MULTIPLICITY as the edge "
    "weight: rank splits across out-edges proportionally to "
    "interaction strength (rank*w/W) instead of uniformly. Same "
    "discipline as the unweighted entry: damping, dangling "
    "redistribution, per-iteration ROUND(...,10), hoisted "
    "loop-invariant edge-weight join. Integer weights keep the "
    "per-edge float shape to one division.",
    tags=("graph",),
)
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import pagerank_weighted

    li = read_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        F.lit(1).alias("w"),
    )
    out = pagerank_weighted(edges, num_iter=_PR_ITER, damping=_PR_DAMP)
    return out.select("node", F.round("rank", 8).alias("rank"))


_RW_EDGES_CTE = """e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
  SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
  UNION ALL
  SELECT l_partkey * 2 + 1 AS src, l_suppkey * 2 AS dst FROM lineitem))"""
_RW_SOURCES_CTE = (
    "src0 AS (SELECT CAST(s_suppkey * 2 AS BIGINT) AS s"
    " FROM supplier WHERE s_suppkey <= 8)"
)
_RW_LEN = 3
_RW_WALKS = 2
_RW_SEED = 42


@register(
    "graph_random_walks",
    oracle=__import__(
        "robosystems_spark.operators.graph",
        fromlist=["random_walks_oracle_sql"],
    ).random_walks_oracle_sql(
        _RW_EDGES_CTE, _RW_SOURCES_CTE, _RW_LEN, _RW_WALKS, _RW_SEED
    ),
    doc="Hash-deterministic DeepWalk/node2vec sampling (Perozzi et "
    "al. 2014) over the undirected supplier-part graph: the hop into "
    "step t picks md5(seed:start:walk:t:node) mod degree over the "
    "SORTED neighbor list, so the walk corpus is reproducible and "
    "hash-identical across engines — graph-embedding training data "
    "under the full value oracle (unrolled-CTE twin), not a "
    "rows-only check. One adjacency groupBy + one join per step over "
    "|sources| x walks_per_node rows of state.",
    tags=("graph", "ml"),
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import random_walks

    li = read_table(spark, sf_dir, "lineitem")
    sp = li.select(
        (F.col("l_suppkey").cast("long") * 2).alias("src"),
        (F.col("l_partkey").cast("long") * 2 + 1).alias("dst"),
    )
    edges = sp.unionAll(
        sp.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    sources = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 8)
        .select((F.col("s_suppkey").cast("long") * 2).alias("s"))
    )
    return random_walks(
        edges,
        sources,
        walk_len=_RW_LEN,
        walks_per_node=_RW_WALKS,
        seed=_RW_SEED,
    ).orderBy("start_node", "walk_id", "step")


@register(
    "graph_skipgram_pairs",
    oracle=__import__(
        "robosystems_spark.operators.graph",
        fromlist=["skipgram_oracle_sql"],
    ).skipgram_oracle_sql(
        _RW_EDGES_CTE, _RW_SOURCES_CTE, _RW_LEN, _RW_WALKS, _RW_SEED, 2
    ),
    doc="Skip-gram (center, context) pair counts within a 2-step "
    "window over the deterministic walk corpus — the training pairs "
    "word2vec-style graph embeddings consume (Perozzi et al. 2014 "
    "feeds exactly these to SkipGram). Composes the random_walks "
    "operator: one self-join keyed by (start, walk) whose groups are "
    "walk_len+1 rows, then one count shuffle on the pair key.",
    tags=("graph", "ml"),
)
def graph_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import random_walks, skipgram_pairs

    li = read_table(spark, sf_dir, "lineitem")
    sp = li.select(
        (F.col("l_suppkey").cast("long") * 2).alias("src"),
        (F.col("l_partkey").cast("long") * 2 + 1).alias("dst"),
    )
    edges = sp.unionAll(
        sp.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    sources = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 8)
        .select((F.col("s_suppkey").cast("long") * 2).alias("s"))
    )
    walks = random_walks(
        edges,
        sources,
        walk_len=_RW_LEN,
        walks_per_node=_RW_WALKS,
        seed=_RW_SEED,
    )
    return skipgram_pairs(walks, window=2).orderBy("center", "context")


@register(
    "graph_skipgram_negatives",
    oracle=__import__(
        "robosystems_spark.operators.graph",
        fromlist=["skipgram_negatives_oracle_sql"],
    ).skipgram_negatives_oracle_sql(
        _RW_EDGES_CTE, _RW_SOURCES_CTE, _RW_LEN, _RW_WALKS, _RW_SEED, 2, 3
    ),
    doc="Hash-deterministic negative sampling (Mikolov et al. 2013) "
    "for the skip-gram pairs: negative j for pair (a,b) is the node "
    "owning cumulative position md5(seed:a:b:j) mod W on the walk-"
    "corpus unigram count line. Spark side resolves probes against "
    "cumulative intervals with a BUCKETED interval join (intervals "
    "explode into fixed-width buckets, probes equi-join on bucket, "
    "range filter) — no broadcast nested loop; the oracle uses a "
    "plain range join. Raw counts, not count^0.75 (float pow is "
    "last-ulp engine-divergent — stated deviation).",
    tags=("graph", "ml"),
)
def graph_skipgram_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import (
        random_walks,
        skipgram_negatives,
        skipgram_pairs,
    )

    li = read_table(spark, sf_dir, "lineitem")
    sp = li.select(
        (F.col("l_suppkey").cast("long") * 2).alias("src"),
        (F.col("l_partkey").cast("long") * 2 + 1).alias("dst"),
    )
    edges = sp.unionAll(
        sp.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    sources = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 8)
        .select((F.col("s_suppkey").cast("long") * 2).alias("s"))
    )
    walks = random_walks(
        edges,
        sources,
        walk_len=_RW_LEN,
        walks_per_node=_RW_WALKS,
        seed=_RW_SEED,
    )
    freq = walks.groupBy(F.col("node")).agg(F.count(F.lit(1)).alias("c"))
    pairs = skipgram_pairs(walks, window=2)
    return skipgram_negatives(pairs, freq, k=3, seed=_RW_SEED).orderBy(
        "center", "context", "neg_rank"
    )
