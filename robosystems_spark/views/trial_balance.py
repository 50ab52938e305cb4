"""Trial-balance view.

Semantics of /root/reference/robosystems/operations/views/
trial_balance.py:36-57 — the 4-hop GL pattern

  (Entity)-[:ENTITY_HAS_TRANSACTION]->(Transaction)
          -[:TRANSACTION_HAS_LINE_ITEM]->(LineItem)
          -[:LINE_ITEM_RELATES_TO_ELEMENT]->(Element)

filtered to a date range, grouped per element with debit/credit sums
and ``net_balance = debits - credits``, ordered by element name.

Spark shape: chained equi-joins through the edge tables; Element and
the edges are dimension-scale → broadcast; the single shuffle is the
final groupBy(element).  At 100 TB, LineItem is the fact table — the
join order keeps it streaming (never builds a hash table on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trial_balance(
    tables: dict[str, DataFrame],
    period_start: str | None = None,
    period_end: str | None = None,
    entity_id: str | None = None,
) -> DataFrame:
    """Compute the per-element trial balance.

    ``tables`` must contain: Entity, Transaction, LineItem, Element,
    ENTITY_HAS_TRANSACTION, TRANSACTION_HAS_LINE_ITEM,
    LINE_ITEM_RELATES_TO_ELEMENT (GraphStore naming).
    """
    ent = tables["Entity"].alias("e")
    txn = tables["Transaction"].alias("t")
    li = tables["LineItem"].alias("li")
    elem = tables["Element"].alias("elem")
    e_t = tables["ENTITY_HAS_TRANSACTION"].alias("et")
    t_li = tables["TRANSACTION_HAS_LINE_ITEM"].alias("tl")
    li_el = tables["LINE_ITEM_RELATES_TO_ELEMENT"].alias("le")

    if period_start:
        txn = txn.filter(F.col("t.date") >= F.lit(period_start))
    if period_end:
        txn = txn.filter(F.col("t.date") <= F.lit(period_end))
    if entity_id:
        ent = ent.filter(F.col("e.identifier") == entity_id)

    joined = (
        li.join(F.broadcast(t_li), F.col("li.identifier") == F.col("tl.dst"))
        .join(F.broadcast(txn), F.col("tl.src") == F.col("t.identifier"))
        .join(F.broadcast(e_t), F.col("t.identifier") == F.col("et.dst"))
        .join(F.broadcast(ent), F.col("et.src") == F.col("e.identifier"))
        .join(F.broadcast(li_el), F.col("li.identifier") == F.col("le.src"))
        .join(F.broadcast(elem), F.col("le.dst") == F.col("elem.identifier"))
    )
    return (
        joined.groupBy(
            F.col("elem.identifier").alias("element_id"),
            F.col("elem.uri").alias("element_uri"),
            F.col("elem.name").alias("element_name"),
            F.col("elem.classification").alias("element_classification"),
            F.col("elem.balance").alias("element_balance"),
            F.col("elem.period_type").alias("element_period_type"),
        )
        .agg(
            F.sum("li.debit_amount").alias("total_debits"),
            F.sum("li.credit_amount").alias("total_credits"),
        )
        .withColumn("net_balance", F.col("total_debits") - F.col("total_credits"))
        .orderBy("element_name")
    )
