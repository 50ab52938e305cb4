"""TPC-H completion battery: the remaining canonical TPC-H query
shapes (Q2/Q6/Q7/Q8/Q9/Q11/Q13/Q15/Q19/Q20/Q21), adapted to the
driver's reduced star schema (no ``partsupp``, no ship-mode /
commit-date columns) while preserving each query's *plan shape* —
that is what the reference's analyzer cares about
(/root/reference/robosystems/middleware/graph/execution_strategies.py
classifies queries by join/aggregate/subquery shape, not by the
TPC-H text).

Shapes covered here and nowhere else in the inventory:

- Q6  — pure scan-side conjunctive pushdown into one ungrouped agg
- Q7  — symmetric nation-pair disjunction across two dim branches
- Q8  — market share: conditional numerator over a grouped total
- Q9  — multi-fact profit expression grouped by (nation, year)
- Q11 — group value filtered against a global-total scalar subquery
- Q13 — distribution-of-counts (double aggregation over a left join)
- Q15 — scalar MAX subquery re-joined by equality (top supplier)
- Q19 — OR-of-ANDs disjunctive predicate spanning join inputs
- Q20 — aggregate-threshold semi-join chain (supplier shortlist)
- Q21 — EXISTS(other) AND NOT EXISTS(other-with-flag) double
        correlated existence test, fully count-exact
- Q2  — correlated per-group MIN re-joined by equality

Scale notes: every scalar subquery is a broadcast one-row cross
join; every EXISTS/NOT EXISTS is a left_semi/left_anti join keyed on
the correlation column (one shuffle each, partial aggs map-side);
the Q19 disjunction stays inside the lineitem scan filter so parquet
row-group stats can prune; Q13's second aggregation runs on the
already-tiny (customer, count) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from robosystems_spark.inventory import register
from robosystems_spark.inventory.relational import _t


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: conjunctive range pushdown, one agg.
# ---------------------------------------------------------------------------
@register(
    "q6_forecast_revenue_change",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6: all predicates are scan-side conjuncts (date range, "
        "discount band, quantity cap) feeding a single ungrouped agg — "
        "SURVEY §2.2 P3; the whole filter reaches the parquet scan as "
        "PushedFilters, so row-group stats prune before I/O."
    ),
    tags=("scan", "pushdown", "agg"),
    bench=True,
)
def q6_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by direction and year.
# ---------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           YEAR(l.l_shipdate) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7: the same nation dim joins twice (supplier side and "
        "customer side) with a symmetric pair disjunction — SURVEY §2.3 "
        "J1/J8; both nation branches broadcast, and restricting each "
        "branch to the two named nations up front lets the semi-joins "
        "shrink the fact flow before the orders⋈lineitem shuffle."
    ),
    tags=("join", "agg", "disjunction"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select(F.col("n_nationkey"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nat.select(F.col("n_nationkey"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation inside a region's customers.
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 3) AS mkt_share
    FROM (
      SELECT YEAR(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc=(
        "TPC-H Q8: conditional numerator over a grouped denominator "
        "(market share) across an 8-table star — SURVEY §2.4 A5 + §2.3 "
        "J1/J8; fixed dims (nation/region) broadcast by hint, the grown "
        "dims by AQE while they fit, so the only guaranteed shuffles are "
        "lineitem⋈orders and the final year rollup."
    ),
    tags=("join", "agg", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_nations = n2.join(
        F.broadcast(region), n2.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(euro_nations), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    # exact 4-decimal volume: decimal sums make the share division
    # independent of summation order (see q9's rationale)
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            supp.join(F.broadcast(n1), supp.s_nationkey == F.col("sn_key")).select(
                "s_suppkey", "supp_nation"
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                3,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and year (p_retailprice
# stands in for ps_supplycost — the schema has no partsupp table).
# ---------------------------------------------------------------------------
@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - 0.05 * p.p_retailprice * l.l_quantity
                     AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE CONTAINS(p.p_name, 'gear')
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc=(
        "TPC-H Q9: profit expression spanning lineitem and part columns "
        "grouped by (supplier nation, order year) — SURVEY §2.4 A7 + "
        "§2.8 F2 (substring match); nation broadcasts by hint, part and "
        "supplier by AQE while they fit, and the "
        "cost term uses p_retailprice as the supply-cost stand-in (the "
        "reduced schema has no partsupp — shape preserved)."
    ),
    tags=("join", "agg", "derived-key"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # the per-line profit is a true 4-decimal number (2-decimal price x
    # 2-decimal discount factor, 2-decimal cost x 0.05 x whole quantity),
    # so casting to DECIMAL(18,4) recovers the exact decimal in BOTH
    # engines; the sum is then exact integer arithmetic and the final
    # 2-decimal round cannot sit on a summation-order-dependent boundary
    # (a raw double sum here flips the last cent between engines)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.05) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(part.select("p_partkey", "p_retailprice"), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: per-part value vs a global-total scalar
# threshold (lineitem value stands in for partsupp stock value).
# ---------------------------------------------------------------------------
@register(
    "q11_important_part_value",
    oracle="""
    WITH nation_lines AS (
      SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5'
    )
    SELECT l_partkey, CAST(ROUND(SUM(price), 2) AS DOUBLE) AS part_value
    FROM nation_lines
    GROUP BY l_partkey
    HAVING SUM(price) * 500 > (
      SELECT SUM(price) FROM nation_lines
    )
    ORDER BY part_value DESC, l_partkey
    """,
    doc=(
        "TPC-H Q11: per-group value gated by a fraction-of-global-total "
        "scalar subquery — SURVEY §2.4 A1 + the broadcast one-row cross "
        "join idiom; the nation-filtered line set is computed once and "
        "feeds both the per-part aggregate and the global total."
    ),
    tags=("subquery", "agg", "having"),
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    # Money routed through DECIMAL(18,2) like Q7/Q8/Q9/Q15: double SUMs
    # are order-dependent, so a part within a few ulps of the threshold
    # could flip the HAVING gate between engines.  The 0.002 fraction
    # becomes an exact integer comparison (value * 500 > total).
    lines = (
        _t(spark, sf_dir, "lineitem")
        .join(supp.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("l_partkey", F.col("l_extendedprice").cast("decimal(18,2)").alias("price"))
    )
    total = lines.agg(F.sum("price").alias("total"))
    return (
        lines.groupBy("l_partkey")
        .agg(F.sum("price").alias("_value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("_value") * 500 > F.col("total"))
        .select(
            "l_partkey", F.round("_value", 2).cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q13 — customer distribution: how many customers have N orders.
# ---------------------------------------------------------------------------
@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc=(
        "TPC-H Q13: distribution-of-counts — a left outer join with an "
        "ON-clause filter (kept OUT of the WHERE so zero-order customers "
        "survive), COUNT(col) null-awareness, then a second aggregation "
        "over the counts — SURVEY §2.3 J2 + §2.4 A2; the second agg runs "
        "on one row per customer, tiny at any scale."
    ),
    tags=("join", "agg", "distribution"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: scalar MAX subquery re-joined by equality.
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    doc=(
        "TPC-H Q15: a derived revenue view consumed twice — once for the "
        "scalar MAX and once re-joined by equality on that max — SURVEY "
        "§2.4 A4 + the broadcast scalar idiom; the view is one shuffle on "
        "l_suppkey, the MAX is a one-row broadcast, equality selects the "
        "winner(s) without a sort."
    ),
    tags=("subquery", "agg", "scalar-max"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("total_revenue")
    )
    # the revenue view feeds both branches of the plan; materialize
    # is unnecessary at this size — Catalyst reuses the exchange
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive OR-of-ANDs predicate (brand × size × quantity).
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    doc=(
        "TPC-H Q19: OR-of-ANDs spanning both join inputs — SURVEY §2.2 "
        "P3/P4; the part-only disjuncts (brand ∪ size ranges) are "
        "pre-applied to the broadcast side so the dim shrinks before the "
        "join, and the mixed predicate evaluates post-join inside "
        "whole-stage codegen."
    ),
    tags=("pushdown", "disjunction", "join"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # part-side union of the three brand/size envelopes — a superset
    # filter that shrinks the broadcast dim (the exact per-branch
    # quantity conjuncts apply after the join)
    part = _t(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: aggregate-threshold semi-join chain.
# ---------------------------------------------------------------------------
@register(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 100
      )
    ORDER BY s.s_name, s.s_acctbal
    """,
    doc=(
        "TPC-H Q20: a HAVING-gated aggregate over a filtered fact join "
        "drives a supplier shortlist consumed as a semi-join — SURVEY "
        "§2.3 J6 + §2.4 A1; the inner aggregate shuffles once on "
        "l_suppkey and its (small) result broadcasts into the semi-join, "
        "so the supplier table never shuffles."
    ),
    tags=("subquery", "semi-join", "having"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    heavy = (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    return (
        supp.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS(other supplier) AND
# NOT EXISTS(other supplier who also flagged) — fully count-exact.
# ---------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc=(
        "TPC-H Q21: double correlated existence — EXISTS(another "
        "supplier in the order) AND NOT EXISTS(another supplier who also "
        "returned) — as left_semi + left_anti joins with compound "
        "(equi + inequality) conditions — SURVEY §2.3 J5/J6; the result "
        "is count-only, so the gate is float-free and exact. The "
        "returnflag stands in for the receipt>commit lateness predicate "
        "(the reduced schema carries no commit/receipt dates)."
    ),
    tags=("subquery", "semi-join", "anti-join"),
    bench=True,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders_f = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")

    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders_f.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey")
    )
    # r12 (guide §2.3/§3): the correlated EXISTS / NOT EXISTS pair used
    # to semi- and anti-join l1 against two full-lineitem projections —
    # two lineitem-sized hash builds (broadcast locally; at fact scale,
    # two lineitem shuffles).  For an R-flagged row they reduce to
    # per-ORDER supplier statistics:  EXISTS(other supplier, any flag)
    # <=> #distinct suppliers in the order >= 2 (the row's own supplier
    # is one of them);  NOT EXISTS(other R supplier) <=> #distinct
    # R-suppliers == 1 (the row itself is R, so its supplier is that
    # one).  Both counts come from one dedup aggregate over
    # (orderkey, suppkey) — map-side partial agg, ~|orders| rows out —
    # and one semi-join against the qualifying order keys.  Exact
    # count-preserving rewrite: the kept l1 multiset is identical, so
    # the oracle (unchanged correlated-subquery SQL) still hash-matches.
    pair_stats = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).alias("_r")
    )
    ok_orders = (
        pair_stats.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("_ns"),
            F.sum("_r").alias("_nr"),
        )
        .filter((F.col("_ns") >= 2) & (F.col("_nr") == 1))
        .select("l_orderkey")
    )
    waiting = l1.join(ok_orders, "l_orderkey", "left_semi")
    return (
        waiting.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated per-group MIN re-joined by
# equality (l_extendedprice stands in for ps_supplycost).
# ---------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH euro_lines AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_name, s.s_name, e.l_extendedprice AS best_price
    FROM euro_lines e
    JOIN part p     ON p.p_partkey = e.l_partkey
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    WHERE p.p_size = 15
      AND e.l_extendedprice = (
        SELECT MIN(e2.l_extendedprice) FROM euro_lines e2
        WHERE e2.l_partkey = e.l_partkey
      )
    ORDER BY p.p_partkey, s.s_name, best_price
    """,
    doc=(
        "TPC-H Q2: correlated per-group MIN decorrelated into an "
        "aggregate on the correlation key joined back by equality — "
        "SURVEY §2.4 A4 + §2.3 J1; the equality compares a stored "
        "parquet double against MIN of the same stored doubles (no "
        "arithmetic), so the match is bit-exact across engines. The "
        "per-part min shuffles once on l_partkey; region gating is a "
        "broadcast semi-join chain."
    ),
    tags=("subquery", "correlated-min", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    euro = (
        _t(spark, sf_dir, "lineitem")
        .join(supp.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
    )
    per_part_min = euro.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("l_extendedprice").alias("m_price")
    )
    part15 = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        euro.join(
            per_part_min,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("l_extendedprice") == F.col("m_price")),
        )
        .join(part15, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("l_extendedprice").alias("best_price"),
        )
        .orderBy("p_partkey", "s_name", "best_price")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping modes / order priority (adapted): fact⋈fact join with
# two conditional counts.  The reduced schema has no l_shipmode /
# l_commitdate / l_receiptdate, so the grouping key is l_linestatus
# and the date window is on l_shipdate — the Q12 plan shape (big join
# + CASE-bucketed priority counts) is intact.
# ---------------------------------------------------------------------------
@register(
    "q12_priority_line_counts",
    oracle="""
    SELECT l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc=(
        "TPC-H Q12 (adapted to the reduced schema): orders⋈lineitem "
        "with CASE-bucketed priority counts per line status — SURVEY "
        "§2.4 A5; the date window pushes into the lineitem scan, the "
        "join shuffles once on orderkey, both counts come from one "
        "pass (no double scan)."
    ),
    tags=("join", "agg", "conditional"),
)
def q12_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01"))
        & (F.col("l_shipdate") < _ts("1996-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (adapted): NOT-IN dim predicates +
# anti-joined supplier blocklist + COUNT(DISTINCT) rollup.  No
# partsupp table in the reduced schema — the distinct
# (l_partkey, l_suppkey) pairs from lineitem ARE the part-supplier
# relation; no s_comment — suppliers with negative account balance
# stand in for the complaints blocklist.  Plan shape preserved:
# blocklist anti-join, dim exclusions, count-distinct per group,
# count-desc ordering.
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_part_counts",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ok AS (
      SELECT ps.l_partkey, ps.l_suppkey
      FROM ps
      ANTI JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) b
        ON ps.l_suppkey = b.s_suppkey
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ok.l_suppkey) AS supplier_cnt
    FROM ok JOIN part p ON p.p_partkey = ok.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT IN ('PROMO', 'LARGE')
      AND p.p_size IN (2, 5, 11, 17, 23, 28, 37, 41)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 100
    """,
    doc=(
        "TPC-H Q16 (adapted): distinct (part, supplier) pairs from "
        "lineitem stand in for partsupp, negative-balance suppliers "
        "for the complaints blocklist — SURVEY §2.3 J6 + §2.4 A3; the "
        "blocklist is a broadcast anti-join BEFORE the part join, the "
        "dim exclusions push into the part scan, and the "
        "count-distinct groups on the already-reduced pair set."
    ),
    tags=("join", "anti", "distinct", "agg"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    blocklist = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").isin("PROMO", "LARGE"))
        & (F.col("p_size").isin(2, 5, 11, 17, 23, 28, 37, 41))
    )
    return (
        # no broadcast hint: the blocklist is a supplier subset and
        # grows with the data — AQE broadcasts it while it fits
        ps.join(
            blocklist,
            ps["l_suppkey"] == blocklist["s_suppkey"],
            "left_anti",
        )
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
            F.asc("p_size"),
        )
        .limit(100)
    )
