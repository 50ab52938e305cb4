"""Subquery-shape battery: correlated scalar subqueries, EXISTS/NOT
EXISTS idioms, global scalar thresholds, and HAVING-gated top-k —
the classic TPC-H Q4/Q10/Q17/Q18/Q22 shapes re-expressed as
decorrelated DataFrame plans.

The reference's Cypher surface reaches these shapes through
``WITH ... WHERE`` post-aggregation gates and OPTIONAL-MATCH
anti-joins (/root/reference/robosystems/operations/views/
save_view.py:55-56, fact_query.py:78-79); SQL engines decorrelate
them into joins — exactly what these plans declare directly, so
Catalyst sees the join form with no subquery rewrite needed.

Scale notes: every correlated subquery is expressed as an aggregate
on the correlation key joined back (one shuffle each side, partial
aggs map-side); scalar subqueries become broadcast one-row cross
joins; EXISTS/NOT EXISTS are left_semi/left_anti (never a count);
top-k goes through TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from robosystems_spark.inventory import register
from robosystems_spark.inventory.relational import _t


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery on the correlation key —
# lineitems below 20% of their part's average quantity.
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
    doc=(
        "Correlated scalar subquery (per-part average) decorrelated into "
        "an aggregate-join — SURVEY §2.4 A1 + §2.3 J1; the Cypher analog "
        "is a WITH-aggregated threshold re-joined to the detail rows."
    ),
    tags=("subquery", "agg", "join"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # decorrelated: the per-part average is ONE aggregate over lineitem,
    # joined back on the correlation key (Spark shuffles each side once
    # on l_partkey; the filtered part dim is broadcast)
    per_part = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING-gated key set driving a detail join (large-
# volume orders), top-k by total quantity.
# ---------------------------------------------------------------------------
@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 20
    """,
    doc=(
        "IN-subquery over a HAVING-filtered aggregate as a semi-join, "
        "then detail re-aggregation and top-k — SURVEY §2.3 J6 + §2.6 O2."
    ),
    tags=("subquery", "join", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(
            big_orders, orders.o_orderkey == big_orders.l_orderkey, "left_semi"
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .withColumn("o_totalprice", F.round("o_totalprice", 2))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer, top 20.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_item_reporting",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc=(
        "Multi-join revenue rollup filtered on the fact side with top-k "
        "output — SURVEY §2.3 J1 + §2.4 A1 + §2.6 O2 (nation broadcast; "
        "the returnflag filter is pushed to the lineitem scan)."
    ),
    tags=("join", "agg", "topk"),
    bench=True,
)
def q10_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: global scalar-subquery threshold + NOT EXISTS.
# ---------------------------------------------------------------------------
@register(
    "q22_global_balance_anti",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc=(
        "Global scalar subquery (broadcast one-row cross join) combined "
        "with NOT EXISTS as a left_anti join — SURVEY §2.3 J6 + §2.2 P6."
    ),
    tags=("subquery", "anti-join", "agg"),
)
def q22_global_balance_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS(correlated) -> left_semi, counted by category.
# ---------------------------------------------------------------------------
@register(
    "q4_priority_with_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Correlated EXISTS as a left_semi join (never a count-and-filter) "
        "feeding a categorical rollup — SURVEY §2.3 J6 + §2.4 A2."
    ),
    tags=("subquery", "semi-join", "agg"),
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# W2 extension: lead/lag inter-event gap analysis over the events table.
# ---------------------------------------------------------------------------
@register(
    "window_event_gaps",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_gaps,
           ROUND(AVG(gap_s), 3) AS avg_gap_s,
           ROUND(MAX(gap_s), 3) AS max_gap_s
    FROM (
      SELECT event_type,
             DATE_DIFF('second',
               LAG(DATE_TRUNC('second', ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id),
               DATE_TRUNC('second', ts)) AS gap_s
      FROM events
    )
    WHERE gap_s IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc=(
        "lag() over a per-user time-ordered window (inter-event gaps) "
        "rolled up per event type — SURVEY §2.5 W2; one shuffle on "
        "user_id for the window, one on event_type for the rollup."
    ),
    tags=("window", "agg"),
)
def window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    # truncate BOTH operands to whole seconds before differencing, so
    # engine-specific sub-second handling can't skew the gap; the diff
    # itself is timezone-free timestamp arithmetic (ts is NTZ)
    ts_s = F.date_trunc("second", F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn("_prev", F.lag(ts_s).over(w)).withColumn(
        "gap_s",
        (ts_s.cast("long") - F.col("_prev").cast("long")),
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_s"), 3).alias("avg_gap_s"),
            F.round(F.max("gap_s").cast("double"), 3).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Batch sessionization: lag-gap flags + running sum as session ids —
# the classic batch twin of the streaming session window
# (streaming/events.py), over the same events table.
# ---------------------------------------------------------------------------
@register(
    "events_batch_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, value,
             DATE_TRUNC('second', ts) AS ts_s,
             CASE WHEN DATE_DIFF('second',
                    LAG(DATE_TRUNC('second', ts))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    DATE_TRUNC('second', ts)) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, value, ts_s,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_s
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    )
    SELECT user_id, session_no,
           MIN(ts_s) AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
    doc=(
        "Batch sessionization (30-min inactivity gap): lag-gap flag + "
        "running-sum session ids + per-session rollup — SURVEY §2.5 W2 "
        "batch twin of the streaming session window; one shuffle on "
        "user_id serves both window passes."
    ),
    tags=("window", "events"),
)
def events_batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    ts_s = F.date_trunc("second", F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(ts_s).over(w)
    new_session = F.when(
        prev.isNull()
        | ((ts_s.cast("long") - prev.cast("long")) > 1800),
        F.lit(1),
    ).otherwise(F.lit(0))
    marked = ev.select(
        "user_id",
        "value",
        ts_s.alias("ts_s"),
        new_session.alias("new_session"),
        "ts",
        "event_id",
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn("session_no", F.sum("new_session").over(w2))
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.min("ts_s").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id", "session_no")
    )
