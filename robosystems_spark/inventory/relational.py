"""Relational operator inventory over the TPC-H-ish synthetic tables.

Each entry re-expresses one operator family from SURVEY.md §2
(citations are to /root/reference) as an idiomatic DataFrame plan plus
a DuckDB oracle.  Aggregated doubles are rounded on BOTH sides so the
driver's value-hash compares are stable across engines' summation
order.

Scale notes: every query here is shuffle-minimal by construction —
dimension tables (region/nation/supplier/part/customer at TPC-H
ratios) are broadcast below the 64 MB threshold, aggregations are
partial-agg friendly (no high-cardinality exploded keys), and filters
are pushed to the parquet scan (verified via .explain in
tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.inventory import register
from robosystems_spark.operators import sketches as SK


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from robosystems_spark.io import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A1/A4/A5/F7/O1 — grouped aggregation battery (TPC-H Q1 shape).
# Reference analog: trial-balance per-element sums
# (robosystems/operations/views/trial_balance.py:36-57).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Full-scan grouped agg: sum/avg/count over derived arithmetic columns (SURVEY §2.4 A1,A4; §2.8 F7).",
    tags=("agg", "scan"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# J1/O2 — join chain + grouped agg + top-k (TPC-H Q3 shape).
# Reference analog: multi-hop MATCH chains (trial_balance.py:37-39).
# ---------------------------------------------------------------------------
@register(
    "q3_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="3-table equi-join chain, grouped agg, deterministic top-k (SURVEY §2.3 J1, §2.6 O2).",
    tags=("join", "topk"),
    bench=True,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # No broadcast hint: customer scales with the data (1.5M rows/TB);
        # AQE converts to broadcast at small SF and shuffles at scale.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J1 (5-hop star) — local supplier volume (TPC-H Q5 shape).
# ---------------------------------------------------------------------------
@register(
    "q5_region_nation_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="6-table join chain with compound join condition + broadcast dims (SURVEY §2.3 J1).",
    tags=("join",),
    bench=True,
)
def q5_region_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with the data — no broadcast hint (AQE
        # decides); nation/region are fixed-cardinality dims, hint them.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# P1-P7 — predicate battery: alias projection, range, IN, contains,
# null-check, inequality (SURVEY §2.2).
# ---------------------------------------------------------------------------
@register(
    "predicate_battery",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_totalprice AS total_price,
           o_orderpriority AS priority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate <= TIMESTAMP '1997-12-31'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus <> 'P'
      AND o_totalprice IS NOT NULL
      AND CONTAINS(o_orderpriority, 'H')
    ORDER BY o_orderkey
    """,
    doc="Projection w/ alias + range + IN + inequality + IS NOT NULL + CONTAINS (SURVEY §2.2 P1-P7).",
    tags=("filter",),
)
def predicate_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") != "P")
            & F.col("o_totalprice").isNotNull()
            & F.col("o_orderpriority").contains("H")
        )
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("total_price"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy("order_id")
    )


# ---------------------------------------------------------------------------
# J2 — left outer join (OPTIONAL MATCH analog, fact_query.py:53-55).
# ---------------------------------------------------------------------------
@register(
    "left_join_customer_orders",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey)                    AS order_count,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="Left outer join preserving unmatched left rows; COUNT(col) ignores nulls (SURVEY §2.3 J2).",
    tags=("join",),
)
def left_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# J6 — anti join (the OPTIONAL MATCH ... WHERE x IS NULL idiom,
# fact_query.py:78-79) and semi join.
# ---------------------------------------------------------------------------
@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join: rows with no match on the right (SURVEY §2.3 J6 anti).",
    tags=("join",),
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "semi_join_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT' AND o_totalprice > 100000
    )
    """,
    doc="Left-semi join: existence check without multiplying rows (SURVEY §2.3 J6 semi).",
    tags=("join",),
)
def semi_join_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 100000)
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# J5 — self-join / comma-pattern cartesian-with-filter (colleague query,
# custom_graph_demo/05_query_graph.py:99-104).
# ---------------------------------------------------------------------------
@register(
    "self_join_supplier_pairs",
    oracle="""
    SELECT n_name, COUNT(*) AS pair_count
    FROM supplier s1
    JOIN supplier s2 ON s1.s_nationkey = s2.s_nationkey AND s1.s_suppkey < s2.s_suppkey
    JOIN nation ON s1.s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Self-join on shared key with ordering filter to dedup pairs (SURVEY §2.3 J5).",
    tags=("join",),
)
def self_join_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1 = _t(spark, sf_dir, "supplier").alias("s1")
    s2 = _t(spark, sf_dir, "supplier").alias("s2")
    nation = _t(spark, sf_dir, "nation")
    return (
        s1.join(
            s2,
            (F.col("s1.s_nationkey") == F.col("s2.s_nationkey"))
            & (F.col("s1.s_suppkey") < F.col("s2.s_suppkey")),
        )
        .join(F.broadcast(nation), F.col("s1.s_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


# ---------------------------------------------------------------------------
# J3 — undirected / either-direction relationship traversal
# (MATCH (a)--(b), save_view.py:42-45): union both edge directions, join.
# ---------------------------------------------------------------------------
@register(
    "undirected_nation_coloc",
    oracle="""
    WITH edges AS (
      SELECT s_suppkey AS src, s_nationkey AS nkey FROM supplier
    ), undirected AS (
      SELECT src, nkey FROM edges
      UNION ALL
      SELECT -src AS src, nkey FROM edges
    )
    SELECT n_name, COUNT(*) AS endpoint_count
    FROM undirected JOIN nation ON nkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Either-direction traversal: union of both edge directions before the join (SURVEY §2.3 J3).",
    tags=("join", "graph"),
)
def undirected_nation_coloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = supp.select(F.col("s_suppkey").alias("src"), F.col("s_nationkey").alias("nkey"))
    undirected = edges.unionByName(
        edges.select((-F.col("src")).alias("src"), F.col("nkey"))
    )
    return (
        undirected.join(F.broadcast(nation), F.col("nkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("endpoint_count"))
    )


# ---------------------------------------------------------------------------
# A3/U3 — distinct projection + count(DISTINCT).
# ---------------------------------------------------------------------------
@register(
    "distinct_counts_per_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS nations,
           COUNT(DISTINCT c_custkey)   AS customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="count(DISTINCT x) per group (SURVEY §2.4 A3).",
    tags=("agg",),
)
def distinct_counts_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("nations"),
        F.countDistinct("c_custkey").alias("customers"),
    )


# ---------------------------------------------------------------------------
# A5/F6 — conditional aggregation with CASE WHEN
# (facts_tool.py:138-142; accounting_demo/05_query_graph.py:129-140).
# ---------------------------------------------------------------------------
@register(
    "conditional_agg_returns",
    oracle="""
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS returned_value,
           ROUND(SUM(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0 END), 2) AS kept_value,
           COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS high_discount_lines
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="sum(CASE WHEN ...) / count(CASE WHEN ...) conditional aggregation (SURVEY §2.4 A5, §2.8 F6).",
    tags=("agg",),
)
def conditional_agg_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)), 2
        ).alias("returned_value"),
        F.round(
            F.sum(F.when(F.col("l_returnflag") != "R", F.col("l_extendedprice")).otherwise(0.0)), 2
        ).alias("kept_value"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("high_discount_lines"),
    )


# ---------------------------------------------------------------------------
# A6 — collect -> list of struct (element_mapping.py:42-50).  Lists are
# serialized to a sorted comma-joined string so the value-hash is
# order-insensitive on both engines.
# ---------------------------------------------------------------------------
@register(
    "collect_list_priorities_per_status",
    oracle="""
    SELECT o_orderstatus,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), ',') AS priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="collect_list/collect_set into deterministic serialized list (SURVEY §2.4 A6).",
    tags=("agg",),
)
def collect_list_priorities_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias("priorities")
    )


# ---------------------------------------------------------------------------
# A7/F3 — grouping over derived date keys (month roll-up,
# accounting_demo/05_query_graph.py:107-123).
# ---------------------------------------------------------------------------
@register(
    "monthly_order_stats",
    oracle="""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
           COUNT(*) AS order_count,
           ROUND(SUM(o_totalprice), 2) AS month_value,
           ROUND(AVG(o_totalprice), 6) AS avg_value
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY CAST(DATE_TRUNC('month', o_orderdate) AS DATE)
    """,
    doc="Group-by over derived month key (SURVEY §2.4 A7, §2.8 F3).",
    tags=("agg", "date"),
    bench=True,
)
def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("month_value"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# A8 — pivot-table aggregation (fact_grid_builder.py:174-295).
# SQL oracle uses conditional aggregation with identical column names.
# ---------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "pivot_value_by_status_priority",
    oracle="""
    SELECT o_orderstatus,
           ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 0), 2)        AS "1-URGENT",
           ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 0), 2)          AS "2-HIGH",
           ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 0), 2)        AS "3-MEDIUM",
           ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 0), 2) AS "4-NOT SPECIFIED",
           ROUND(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 0), 2)           AS "5-LOW"
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="groupBy().pivot().sum() fact grid (SURVEY §2.4 A8). Explicit pivot values avoid an extra distinct scan.",
    tags=("agg", "pivot"),
)
def pivot_value_by_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .sum("o_totalprice")
    )
    return piv.select(
        "o_orderstatus",
        *[F.round(F.coalesce(F.col(f"`{p}`"), F.lit(0.0)), 2).alias(p) for p in _PRIORITIES],
    )


# ---------------------------------------------------------------------------
# P9/W1 — window dedup: row_number over partition, keep rn=1
# (duckdb/manager.py:112-135 staging dedup).
# ---------------------------------------------------------------------------
@register(
    "window_dedup_first_line",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    doc="ROW_NUMBER() OVER (PARTITION BY ...) dedup, the staging-ingest idiom (SURVEY §2.2 P9, §2.5 W1).",
    tags=("window", "dedup"),
    bench=True,
)
def window_dedup_first_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # r13 (guide §2.3): the row_number-window formulation shuffled and
    # SORTED every lineitem row just to keep rank 1; the same "first
    # row in the (l_linenumber, l_partkey, l_suppkey, l_quantity)
    # total order per order" is MIN over the lexicographically-ordered
    # struct — a hash aggregate with map-side partial min, so the
    # exchange carries ~|orders| partial structs instead of |lineitem|
    # rows and the per-partition sort disappears.  Identical rows: the
    # ORDER BY was a total order, so rank 1 IS the struct minimum
    # (oracle unchanged; equivalence pinned in test_relational_extra).
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.min(
                F.struct(
                    "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
                )
            ).alias("_m")
        )
        .select(
            "l_orderkey",
            F.col("_m.l_linenumber").alias("l_linenumber"),
            F.col("_m.l_partkey").alias("l_partkey"),
            F.col("_m.l_quantity").alias("l_quantity"),
        )
    )


# ---------------------------------------------------------------------------
# W2 — analytic windows: lag + running frame sum (free in Spark; listed
# as available-free in SURVEY §2.5 W2).
# ---------------------------------------------------------------------------
@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           ROUND(COALESCE(LAG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0), 2) AS prev_price
    FROM orders
    """,
    doc="Running-total frame + LAG analytic window (SURVEY §2.5 W2).",
    tags=("window",),
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_spend"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
    )


# ---------------------------------------------------------------------------
# U1 — UNION ALL multi-branch counts (example_queries_tool.py:82 label
# counts; duckdb/manager.py:199-228 per-file union).
# ---------------------------------------------------------------------------
@register(
    "union_all_label_counts",
    oracle="""
    SELECT 'region' AS label, COUNT(*) AS cnt FROM region
    UNION ALL SELECT 'nation' AS label, COUNT(*) AS cnt FROM nation
    UNION ALL SELECT 'customer' AS label, COUNT(*) AS cnt FROM customer
    UNION ALL SELECT 'supplier' AS label, COUNT(*) AS cnt FROM supplier
    UNION ALL SELECT 'part' AS label, COUNT(*) AS cnt FROM part
    """,
    doc="UNION ALL of per-label counts (SURVEY §2.7 U1; graph label-count idiom).",
    tags=("setop",),
)
def union_all_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name in ("region", "nation", "customer", "supplier", "part"):
        parts.append(
            _t(spark, sf_dir, name).agg(
                F.lit(name).alias("label"), F.count(F.lit(1)).alias("cnt")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# U2 — INTERSECT / EXCEPT.
# ---------------------------------------------------------------------------
@register(
    "intersect_customer_supplier_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT set operation (SURVEY §2.7 U2).",
    tags=("setop",),
)
def intersect_customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "except_nations_without_suppliers",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT set operation (SURVEY §2.7 U2).",
    tags=("setop",),
)
def except_nations_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return nation.exceptAll(supp).distinct()


# ---------------------------------------------------------------------------
# O2/O3 — deterministic top-k and LIMIT/SKIP pagination.
# ---------------------------------------------------------------------------
@register(
    "topk_parts_by_price",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 15
    """,
    doc="Top-k: ORDER BY DESC + LIMIT with unique tiebreak (SURVEY §2.6 O2 — TakeOrderedAndProject).",
    tags=("topk",),
)
def topk_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), "p_partkey")
        .limit(15)
    )


@register(
    "limit_skip_pagination",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    ORDER BY p_partkey
    LIMIT 20 OFFSET 40
    """,
    doc="LIMIT + SKIP/OFFSET pagination (SURVEY §2.6 O3).",
    tags=("topk",),
)
def limit_skip_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select("p_partkey", "p_name").orderBy("p_partkey").offset(40).limit(20)


# ---------------------------------------------------------------------------
# A11 — rollup/grouping-sets (available-free extension, SURVEY §2.4 A11).
# ---------------------------------------------------------------------------
@register(
    "rollup_region_nation_customers",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(c_custkey) AS customers,
           ROUND(COALESCE(SUM(c_acctbal), 0), 2) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchy aggregation (SURVEY §2.4 A11).",
    tags=("agg",),
)
def rollup_region_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_balance"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "customers",
            "total_balance",
        )
    )


# ---------------------------------------------------------------------------
# F1-F9 — scalar function battery on a small dim table: casts, string,
# date, hash, arithmetic (SURVEY §2.8).
# ---------------------------------------------------------------------------
@register(
    "scalar_function_battery",
    oracle="""
    SELECT n_nationkey,
           CAST(n_nationkey AS VARCHAR)            AS key_str,
           CAST(n_nationkey AS DOUBLE)             AS key_dbl,
           LOWER(n_name)                           AS name_lower,
           UPPER(n_name)                           AS name_upper,
           LENGTH(n_name)                          AS name_len,
           SUBSTRING(n_name, 1, 3)                 AS name_prefix,
           CONCAT(n_name, '#', CAST(n_regionkey AS VARCHAR)) AS name_tag,
           MD5(n_name)                             AS name_md5,
           n_nationkey * 2 + 1                     AS key_arith,
           ROUND(POW(CAST(n_regionkey AS DOUBLE), 2.0), 2) AS region_sq,
           CASE WHEN n_regionkey < 2 THEN 'west' ELSE 'east' END AS hemisphere
    FROM nation
    """,
    doc="Scalar battery: casts, string fns, md5 hashing, arithmetic, CASE (SURVEY §2.8 F1-F9).",
    tags=("scalar",),
)
def scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.col("n_nationkey").cast("string").alias("key_str"),
        F.col("n_nationkey").cast("double").alias("key_dbl"),
        F.lower("n_name").alias("name_lower"),
        F.upper("n_name").alias("name_upper"),
        F.length("n_name").alias("name_len"),
        F.substring("n_name", 1, 3).alias("name_prefix"),
        F.concat(F.col("n_name"), F.lit("#"), F.col("n_regionkey").cast("string")).alias(
            "name_tag"
        ),
        F.md5(F.col("n_name").cast("binary")).alias("name_md5"),
        (F.col("n_nationkey") * 2 + 1).alias("key_arith"),
        F.round(F.pow(F.col("n_regionkey").cast("double"), F.lit(2.0)), 2).alias("region_sq"),
        F.when(F.col("n_regionkey") < 2, "west").otherwise("east").alias("hemisphere"),
    )


# ---------------------------------------------------------------------------
# F8 — JSON extraction from the events.props column.
# ---------------------------------------------------------------------------
@register(
    "json_extract_event_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(*) AS events
    FROM events
    GROUP BY event_type
    """,
    doc="JSON field extraction + cast + aggregate (SURVEY §2.8 F8).",
    tags=("scalar", "json"),
)
def json_extract_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_total"),
        F.count(F.lit(1)).alias("events"),
    )


# ---------------------------------------------------------------------------
# J9 — bounded var-length path: BFS over an edge DataFrame via an
# iterative join loop (query_validator.py:33-43 flags these patterns;
# no single Spark builtin — SURVEY §4 custom work #2).  Oracle is a
# recursive CTE.  Edges: nations in the same region, nationkey ascending.
# ---------------------------------------------------------------------------
@register(
    "varlength_path_bfs",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND b.n_nationkey = a.n_nationkey + 5
    ), paths AS (
      SELECT src AS start_node, dst AS end_node, 1 AS depth FROM edges
      UNION ALL
      SELECT p.start_node, e.dst, p.depth + 1
      FROM paths p JOIN edges e ON p.end_node = e.src
      WHERE p.depth < 3
    )
    SELECT start_node, end_node, MIN(depth) AS depth
    FROM paths GROUP BY start_node, end_node
    """,
    doc="Bounded var-length path [*1..3]: iterative BFS join loop over the edge table (SURVEY §2.3 J9).",
    tags=("graph",),
)
def varlength_path_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import bounded_paths

    nation = _t(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("b.n_nationkey") == F.col("a.n_nationkey") + 5),
    ).select(F.col("a.n_nationkey").alias("src"), F.col("b.n_nationkey").alias("dst"))
    return bounded_paths(edges, max_depth=3).select(
        F.col("src").alias("start_node"), F.col("dst").alias("end_node"), F.col("depth")
    )


# ---------------------------------------------------------------------------
# A12 — approximate distinct (no exact oracle: rows-only check).
# ---------------------------------------------------------------------------
@register(
    "approx_distinct_parts_per_brand",
    oracle=None,
    doc="approx_count_distinct HLL sketch per group (SURVEY §2.4 A12) — approximate, rows-only check.",
    tags=("agg", "approx"),
)
def approx_distinct_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.approx_count_distinct("p_partkey", rsd=0.01).alias("approx_parts"),
        F.count(F.lit(1)).alias("rows"),
    )


@register(
    "approx_distinct_portable_hll",
    oracle=SK.portable_hll_oracle_sql("part", "p_brand", "p_partkey", p=9),
    doc="HyperLogLog from portable column expressions (md5 hash, integer "
    "bucket/rank extraction, bias-corrected estimator): the same sketch "
    "computes bit-identically in Spark and DuckDB, so the APPROXIMATE "
    "estimate itself is hash-checked — the oracle-able counterpart of the "
    "native approx_count_distinct entry above.",
    tags=("agg", "approx", "sketch"),
)
def approx_distinct_portable_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SK.portable_hll_distinct(
        _t(spark, sf_dir, "part"), "p_brand", "p_partkey", p=9
    )


@register(
    "hll_cohort_set_algebra",
    oracle=SK.portable_hll_set_algebra_oracle_sql(
        "events", "event_type", "user_id", "click", "view", p=9
    ),
    doc="HLL sketch SET ALGEBRA over audience cohorts: distinct clickers, "
    "distinct viewers, their UNION by per-bucket register MAX (merging "
    "sketches, never re-reading data — the mergeability that makes sketches "
    "a 100 TB primitive), and the intersection via inclusion-exclusion. "
    "Portable md5/rank/estimator arithmetic means even the merged estimates "
    "are hash-checked against DuckDB.",
    tags=("agg", "approx", "sketch", "events"),
)
def hll_cohort_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SK.portable_hll_set_algebra(
        _t(spark, sf_dir, "events"), "event_type", "user_id", "click", "view", p=9
    )


# ---------------------------------------------------------------------------
# P2 — column exclusion (SELECT * EXCLUDE, duckdb/manager.py:114,128).
# ---------------------------------------------------------------------------
@register(
    "column_exclusion",
    oracle="""
    SELECT * EXCLUDE (n_comment_placeholder)
    FROM (SELECT n_nationkey, n_name, n_regionkey,
                 'x' AS n_comment_placeholder FROM nation)
    ORDER BY n_nationkey
    """,
    doc="SELECT * EXCLUDE projection — df.drop (SURVEY §2.2 P2, the file_id-stripping idiom).",
    tags=("filter",),
)
def column_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").withColumn(
        "n_comment_placeholder", F.lit("x")
    )
    return nation.drop("n_comment_placeholder").orderBy("n_nationkey")


# ---------------------------------------------------------------------------
# F4 — collection function battery (size, element_at, contains, sort,
# slice) against DuckDB list functions.
# ---------------------------------------------------------------------------
@register(
    "collection_function_battery",
    oracle="""
    WITH t AS (
      SELECT n_nationkey, STRING_SPLIT(n_name, '_') AS parts FROM nation
    )
    SELECT n_nationkey,
           LEN(parts)                                   AS n_parts,
           parts[1]                                     AS first_part,
           parts[-1]                                    AS last_part,
           LIST_CONTAINS(parts, 'NATION')               AS has_nation,
           ARRAY_TO_STRING(LIST_SORT(parts), '|')       AS sorted_joined,
           ARRAY_TO_STRING(parts[1:2], '|')             AS first_two
    FROM t
    """,
    doc="Collection functions: size/element_at/array_contains/sort_array/slice (SURVEY §2.8 F4).",
    tags=("scalar", "collection"),
)
def collection_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    parts = F.split("n_name", "_")
    return nation.select(
        "n_nationkey",
        F.size(parts).alias("n_parts"),
        F.element_at(parts, 1).alias("first_part"),
        F.element_at(parts, -1).alias("last_part"),
        F.array_contains(parts, "NATION").alias("has_nation"),
        F.concat_ws("|", F.sort_array(parts)).alias("sorted_joined"),
        F.concat_ws("|", F.slice(parts, 1, 2)).alias("first_two"),
    )


# ---------------------------------------------------------------------------
# A2 — count(*) vs count(col) null semantics.
# ---------------------------------------------------------------------------
@register(
    "null_aware_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS all_rows,
           COUNT(NULLIF(o_orderpriority, '5-LOW')) AS non_low_priority,
           COUNT(DISTINCT NULLIF(o_orderpriority, '5-LOW')) AS distinct_non_low
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="count(*) vs count(col): NULLs excluded from column counts (SURVEY §2.4 A2).",
    tags=("agg",),
)
def null_aware_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    nn = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("all_rows"),
        F.count(nn).alias("non_low_priority"),
        F.countDistinct(nn).alias("distinct_non_low"),
    )


# ---------------------------------------------------------------------------
# A11 — CUBE over two dimensions (grouping-set coverage beyond rollup).
# ---------------------------------------------------------------------------
@register(
    "cube_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS orders,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets: all dimension combinations in one pass (SURVEY §2.4 A11).",
    tags=("agg",),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "orders",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# A4 extension — statistical aggregates: stddev/variance/median/p90.
# Spark `percentile` (exact, linear interpolation) matches DuckDB
# quantile_cont.
# ---------------------------------------------------------------------------
@register(
    "statistical_aggregates",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS price_stddev,
           ROUND(VAR_SAMP(l_extendedprice), 2)    AS price_var,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS price_median,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS price_p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: sample stddev/variance, exact interpolated median/p90.",
    tags=("agg", "stats"),
)
def statistical_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("price_median"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("price_p90"),
    )


# ---------------------------------------------------------------------------
# F2 extension — string function battery: regexp, padding, trim/translate.
# ---------------------------------------------------------------------------
@register(
    "string_function_battery",
    oracle="""
    SELECT n_nationkey,
           REGEXP_EXTRACT(n_name, '([0-9]+)', 1)        AS name_digits,
           LPAD(CAST(n_nationkey AS VARCHAR), 4, '0')   AS padded_key,
           RPAD(SUBSTRING(n_name, 1, 3), 6, '.')        AS padded_name,
           REPLACE(n_name, '_', '-')                    AS dashed,
           TRANSLATE(n_name, 'AEIOU', 'aeiou')          AS lowered_vowels,
           SPLIT_PART(n_name, '_', 1)                   AS first_token,
           REVERSE(n_name)                              AS reversed,
           CONTAINS(n_name, '1')                        AS has_one
    FROM nation
    """,
    doc="String battery: regexp_extract, lpad/rpad, replace, translate, split_part, reverse (SURVEY §2.8 F2).",
    tags=("scalar", "string"),
)
def string_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.regexp_extract("n_name", r"([0-9]+)", 1).alias("name_digits"),
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("padded_key"),
        F.rpad(F.substring("n_name", 1, 3), 6, ".").alias("padded_name"),
        F.replace(F.col("n_name"), F.lit("_"), F.lit("-")).alias("dashed"),
        F.translate("n_name", "AEIOU", "aeiou").alias("lowered_vowels"),
        F.split_part(F.col("n_name"), F.lit("_"), F.lit(1)).alias("first_token"),
        F.reverse("n_name").alias("reversed"),
        F.col("n_name").contains("1").alias("has_one"),
    )


# ---------------------------------------------------------------------------
# W2 extension — ranking/distribution windows: ntile, percent_rank,
# dense_rank, first/last frame values.
# ---------------------------------------------------------------------------
@register(
    "window_ranking_battery",
    oracle="""
    SELECT s_suppkey,
           s_nationkey,
           CAST(DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS bal_rank,
           CAST(NTILE(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS bal_quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS bal_pct_rank,
           ROUND(FIRST_VALUE(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS nation_top_bal,
           ROUND(LAST_VALUE(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS nation_low_bal
    FROM supplier
    """,
    doc="Ranking/distribution windows: dense_rank, ntile, percent_rank, first/last_value frames (SURVEY §2.5 W2).",
    tags=("window",),
)
def window_ranking_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    by_nation = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    full_frame = by_nation.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    global_desc = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    global_asc = Window.orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        F.dense_rank().over(by_nation).alias("bal_rank"),
        F.ntile(4).over(global_desc).alias("bal_quartile"),
        F.round(F.percent_rank().over(global_asc), 6).alias("bal_pct_rank"),
        F.round(F.first("s_acctbal").over(full_frame), 2).alias("nation_top_bal"),
        F.round(F.last("s_acctbal").over(full_frame), 2).alias("nation_low_bal"),
    )


# ---------------------------------------------------------------------------
# J1+A5 — conditional share of a joined aggregate (TPC-H Q14 shape).
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%%'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    doc="Promo revenue share: equi-join + conditional-aggregate ratio (TPC-H Q14 shape).",
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part scales with the data — leave join strategy to AQE.
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# J6 extension — semi join against an AGGREGATED subquery (customers
# whose lifetime spend clears a threshold).
# ---------------------------------------------------------------------------
@register(
    "semi_join_on_aggregate",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders
      GROUP BY o_custkey
      HAVING SUM(o_totalprice) > 1500000
    )
    """,
    doc="Semi join against an aggregated subquery (HAVING-filtered key set) — SURVEY §2.3 J6 + §2.2 P7.",
    tags=("join", "agg"),
)
def semi_join_on_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big_spenders = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .filter(F.col("spend") > 1_500_000)
    )
    return cust.join(
        big_spenders, cust.c_custkey == big_spenders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# A12+ — portable count-min heavy hitters: a deterministic approximate
# frequency sketch (same md5 row-hashes both engines), so the estimate
# itself is hash-checked like the portable HLL above.
# ---------------------------------------------------------------------------
@register(
    "countmin_heavy_hitter_priorities",
    oracle=SK.countmin_heavy_hitters_oracle_sql(
        "orders", "o_orderpriority", width=64, depth=4, min_estimate=1
    ),
    doc="Count-min sketch heavy hitters over order priorities: depth x width "
    "md5 counter matrix built in one explode + hash-aggregate, estimates = "
    "min over depth counters (one-sided). Deterministic hashing makes the "
    "approximate structure itself oracle-checkable; sketch state is "
    "depth*width counters regardless of input size.",
    tags=("agg", "approx", "sketch"),
)
def countmin_heavy_hitter_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SK.countmin_heavy_hitters(
        _t(spark, sf_dir, "orders"), "o_orderpriority", width=64, depth=4,
        min_estimate=1,
    )


# ---------------------------------------------------------------------------
# A12++ — EXACT phi-frequent items via Misra-Gries candidates + recount.
# The bounded-memory alternative to the count-min path above: no
# distinct-value enumeration anywhere — candidate state is k counters
# per partition, and the exact recount touches only candidate rows.
# ---------------------------------------------------------------------------
@register(
    "events_frequent_users_exact",
    oracle=SK.frequent_items_oracle_sql("events", "user_id", k=119),
    doc="Exact phi-frequent items (phi=1/120) over event user_ids: "
    "per-partition Misra-Gries summaries (<=k counters, mergeable "
    "subtract-and-truncate fold over Arrow batches) produce a provable "
    "candidate superset; one broadcast semi-join + recount with the "
    "integer predicate cnt*(k+1) > N yields the EXACT answer — the "
    "output is partitioning-independent, so the approximate first pass "
    "still carries a hard oracle. Unlike the count-min entry, key "
    "cardinality never appears in any shuffle.",
    tags=("agg", "sketch", "events"),
)
def events_frequent_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SK.frequent_items_exact(_t(spark, sf_dir, "events"), "user_id", k=119)


# ---------------------------------------------------------------------------
# Runtime Bloom join filter: build a portable Bloom filter over the
# filtered build side, broadcast it, and audit its pruning decisions
# (incl. false positives) against exact membership — deterministic
# md5 positions make the approximate filter itself hash-checkable.
# ---------------------------------------------------------------------------
@register(
    "bloom_join_filter_audit",
    oracle=SK.bloom_join_audit_oracle_sql(
        build_table="customer",
        probe_table="orders",
        build_key="c_custkey",
        probe_key="o_custkey",
        group_col="o_orderpriority",
        build_where="c_mktsegment = 'BUILDING'",
        m_bits=4096,
        k_hashes=3,
    ),
    doc=(
        "Bloom runtime join filter (Bloom 1970): a 4096-bit/3-hash filter "
        "built over BUILDING-segment customer keys, broadcast to tag every "
        "order with a membership verdict, audited per priority against the "
        "exact key set (rows, bloom passes, true matches, false positives). "
        "The 100 TB shape: the filter is <= m_bits rows regardless of build "
        "cardinality, the probe side is pre-filtered BEFORE its shuffle "
        "(rows failing membership never enter the exchange), and a member "
        "can never be dropped (one-sided error). Deterministic portable "
        "hashing means even the false-positive count carries a hard oracle."
    ),
    tags=("join", "approx", "sketch", "scale"),
    bench=True,
)
def bloom_join_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    return SK.bloom_join_audit(
        cust,
        orders,
        build_key="c_custkey",
        probe_key="o_custkey",
        group_col="o_orderpriority",
        m_bits=4096,
        k_hashes=3,
    )


# ---------------------------------------------------------------------------
# Cohort retention: month-of-first-order cohorts x months-since activity
# matrix — the classic product-analytics rollup (double aggregation with
# a per-entity anchor join).
# ---------------------------------------------------------------------------
@register(
    "cohort_retention_matrix",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)) AS cohort_ym
      FROM orders GROUP BY o_custkey
    )
    SELECT f.cohort_ym,
           (YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate)) - f.cohort_ym
             AS months_since,
           COUNT(DISTINCT o.o_custkey) AS n_customers
    FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc=(
        "Cohort retention matrix: customers bucketed by first-order "
        "month, activity counted per months-since-cohort — a per-entity "
        "anchor aggregate joined back to the fact (SURVEY §2.4 A1/A3 + "
        "§2.3 J1); both aggregations shuffle on o_custkey then on the "
        "(cohort, offset) pair, and the month key is integer "
        "year*12+month arithmetic so the bucket boundary is "
        "engine-identical (no interval/timezone semantics)."
    ),
    tags=("agg", "join", "analytics"),
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    firsts = orders.groupBy("o_custkey").agg(F.min(ym).alias("cohort_ym"))
    return (
        orders.join(firsts, "o_custkey")
        .groupBy(
            "cohort_ym", (ym - F.col("cohort_ym")).alias("months_since")
        )
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("cohort_ym", "months_since")
    )


# ---------------------------------------------------------------------------
# A11 — arbitrary GROUPING SETS + grouping() flags (beyond rollup/cube:
# a non-hierarchical set list, with grouping flags so subtotal rows are
# distinguishable from genuine NULL dimension values).
# ---------------------------------------------------------------------------
@register(
    "grouping_sets_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS orders,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority))
    """,
    doc="Arbitrary GROUPING SETS (not a rollup/cube prefix chain) with grouping() "
    "flags — one Expand+aggregate pass, subtotal rows tagged (SURVEY §2.4 A11).",
    tags=("agg",),
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "orders",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Data profiling: ANALYZE/SUMMARIZE surface.
# ---------------------------------------------------------------------------
_ORDERS_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp_ntz"),
    ("o_orderpriority", "string"),
]


@register(
    "profile_orders_table",
    oracle=__import__(
        "robosystems_spark.operators.profile",
        fromlist=["table_profile_oracle_sql"],
    ).table_profile_oracle_sql("orders", _ORDERS_PROFILE_COLS),
    doc="Per-column table profile (null count, exact distinct, "
    "min/max) — the SUMMARIZE/ANALYZE surface ingest pipelines gate "
    "on; ONE aggregation pass (count-distincts expand via Catalyst), "
    "long-format output built from a single collected row.",
    tags=("profile", "relational"),
)
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.profile import table_profile

    return table_profile(_t(spark, sf_dir, "orders"))


@register(
    "dq_rule_audit",
    oracle=__import__(
        "robosystems_spark.operators.profile",
        fromlist=["dq_rule_audit_oracle_sql"],
    ).dq_rule_audit_oracle_sql(),
    doc="Data-quality rule audit over the warehouse: referential-integrity "
    "orphans (anti-joins), date-ordering and domain rules (filters), one "
    "row per rule with its violation count — zero counts included, so a "
    "green audit is explicit. Each rule is an independent pruned scan; "
    "the ingest-gate surface a production pipeline runs before promote.",
    tags=("profile", "relational", "quality"),
)
def dq_rule_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.profile import dq_rule_audit, tpch_dq_rules

    tables = {
        t: _t(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "nation")
    }
    return dq_rule_audit(tpch_dq_rules(tables))


@register(
    "histogram_order_totalprice",
    oracle=__import__(
        "robosystems_spark.operators.profile",
        fromlist=["numeric_histogram_oracle_sql"],
    ).numeric_histogram_oracle_sql("orders", "o_totalprice", n_bins=20),
    doc="Equi-width 20-bin histogram of o_totalprice: two passes "
    "(min/max aggregate, then map-side bin + groupBy) — the value-"
    "distribution profile behind range-drift checks and bucket "
    "pruning decisions; identical double bin arithmetic both engines.",
    tags=("profile", "relational"),
)
def histogram_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.profile import numeric_histogram

    return numeric_histogram(_t(spark, sf_dir, "orders"), "o_totalprice", 20)


# ---------------------------------------------------------------------------
# RFM segmentation: the classic customer-value rollup — recency /
# frequency / monetary quartiles composed into segment labels.  The
# global anchor date is a one-row broadcast (q15's scalar pattern, no
# single-partition window); quartiles are ntile(4) over TOTAL orders
# (value, key) so tie placement is engine-identical.
# ---------------------------------------------------------------------------
@register(
    "recsys_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    per_cust AS (
      SELECT o_custkey,
             DATEDIFF('day', MAX(o_orderdate), (SELECT maxd FROM anchor))
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY recency_days ASC,  o_custkey) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC,    o_custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary  DESC,    o_custkey) AS m,
             monetary
      FROM per_cust
    )
    SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
             AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary) AS DECIMAL(18,2)) AS total_monetary
    FROM scored
    GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "RFM customer segmentation: per-customer recency (days since "
        "last order vs the global max date), frequency, and exact "
        "DECIMAL monetary, each quartiled by ntile(4) over a TOTAL "
        "order (metric, custkey) so tie placement is deterministic and "
        "engine-identical; quartile digits compose 64 possible segment "
        "labels. The anchor date is a one-row broadcast join (never a "
        "single-partition global window). The ntile pass is the one "
        "global sort — at 100 TB swap it for approx percentile "
        "boundaries + a map-side bucket join; the segment rollup "
        "itself stays one hash aggregation."
    ),
    tags=("analytics", "window", "agg"),
    bench=True,
)
def recsys_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("maxd"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("lastd"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        .join(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("maxd", "lastd"))
    )
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey"))
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
    w_m = Window.orderBy(F.col("monetary").desc(), F.col("o_custkey"))
    scored = per_cust.select(
        "o_custkey",
        "monetary",
        F.ntile(4).over(w_r).alias("r"),
        F.ntile(4).over(w_f).alias("f"),
        F.ntile(4).over(w_m).alias("m"),
    )
    return (
        scored.groupBy(
            F.concat(
                F.col("r").cast("string"),
                F.col("f").cast("string"),
                F.col("m").cast("string"),
            ).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # Pin the output decimal to (18,2) on BOTH sides: Spark's
            # SUM(decimal(18,2)) widens to decimal(28,2) while DuckDB's
            # widens to HUGEINT-backed decimal128(38,2) — a type-sensitive
            # hash sees different Arrow types for identical values.
            F.sum("monetary").cast("decimal(18,2)").alias("total_monetary"),
        )
        .orderBy("segment")
    )
