"""Trial-balance view.

Semantics of /root/reference/robosystems/operations/views/
trial_balance.py:36-57 — the 4-hop GL pattern

  (Entity)-[:ENTITY_HAS_TRANSACTION]->(Transaction)
          -[:TRANSACTION_HAS_LINE_ITEM]->(LineItem)
          -[:LINE_ITEM_RELATES_TO_ELEMENT]->(Element)

filtered to a date range, grouped per element with debit/credit sums
and ``net_balance = debits - credits``, ordered by element name.

Spark shape: chained equi-joins through the edge tables.  Element and
Entity are TRUE dimensions → explicit broadcast.  The GL linkage
edges (TRANSACTION_HAS_LINE_ITEM, ENTITY_HAS_TRANSACTION,
LINE_ITEM_RELATES_TO_ELEMENT) and the Transaction table itself scale
WITH the ledger — one row per line item / per transaction — so they
carry NO broadcast hint: AQE broadcasts them when runtime stats say
they're small, and at 100 TB the joins degrade to shuffles (or
exchange-free bucketed joins) instead of OOMing the driver.  LineItem
is the fact table — the join order keeps it streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# per-element group columns of the trial-balance aggregate (attribute
# columns are functionally dependent on element_id)
TB_GROUP_COLS = [
    "element_id",
    "element_uri",
    "element_name",
    "element_classification",
    "element_balance",
    "element_period_type",
]


def tb_joined(
    tables: dict[str, DataFrame],
    period_start: str | None = None,
    period_end: str | None = None,
    entity_id: str | None = None,
    line_items: DataFrame | None = None,
) -> DataFrame:
    """The ROW-LEVEL 4-hop GL join (one row per qualifying line item)
    with the element group columns projected — shared by the full
    aggregate below and the matview's incremental delta (which passes
    the LineItem CHANGE FEED as ``line_items``)."""
    ent = tables["Entity"].alias("e")
    txn = tables["Transaction"].alias("t")
    li = (tables["LineItem"] if line_items is None else line_items).alias("li")
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

    # ledger-scale inputs (edges + Transaction) unhinted; dims broadcast
    joined = (
        li.join(t_li, F.col("li.identifier") == F.col("tl.dst"))
        .join(txn, F.col("tl.src") == F.col("t.identifier"))
        .join(e_t, F.col("t.identifier") == F.col("et.dst"))
        .join(F.broadcast(ent), F.col("et.src") == F.col("e.identifier"))
        .join(li_el, F.col("li.identifier") == F.col("le.src"))
        .join(F.broadcast(elem), F.col("le.dst") == F.col("elem.identifier"))
    )
    extra = [c for c in ("li._change_type",) if line_items is not None]
    return joined.select(
        F.col("elem.identifier").alias("element_id"),
        F.col("elem.uri").alias("element_uri"),
        F.col("elem.name").alias("element_name"),
        F.col("elem.classification").alias("element_classification"),
        F.col("elem.balance").alias("element_balance"),
        F.col("elem.period_type").alias("element_period_type"),
        F.col("li.debit_amount").alias("debit_amount"),
        F.col("li.credit_amount").alias("credit_amount"),
        *[F.col(c).alias(c.split(".", 1)[1]) for c in extra],
    )


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
    rows = tb_joined(tables, period_start, period_end, entity_id)
    # NULL amount means "unused side of the entry" = 0 — coalesced in
    # ALL THREE computation paths (request view, matview full
    # recompute, additive delta) so they agree on the same data.
    return (
        rows.groupBy(*TB_GROUP_COLS)
        .agg(
            F.sum(F.coalesce("debit_amount", F.lit(0.0))).alias("total_debits"),
            F.sum(F.coalesce("credit_amount", F.lit(0.0))).alias("total_credits"),
        )
        .withColumn("net_balance", F.col("total_debits") - F.col("total_credits"))
        .orderBy("element_name")
    )


# ---------------------------------------------------------------------------
# Incremental trial-balance matview.
#
# The reference recomputes the trial balance per request
# (operations/views/trial_balance.py:36-57); at 100 TB the 4-hop
# aggregate over the LineItem fact table is not a per-request query.
# Here the aggregate is materialized as a GraphStore table and
# maintained from the commit log's row-level change feed:
#
# - LineItem changes (the fact table — the overwhelmingly common GL
#   mutation) refresh ADDITIVELY: the feed alone, joined through the
#   dimension/edge tables, yields signed per-element deltas; the fact
#   table is never rescanned.  O(changed line items) per refresh.
# - any delete/update in a dimension or edge table (element rename,
#   re-dated transaction) falls back to a full recompute-and-merge —
#   rare by construction in a ledger.
#
# CONTRACT (documented, matching the reference's ingest): GL linkage
# edges are written together with their line items — an edge insert
# never re-links an already-aggregated line item to a new element.
# ---------------------------------------------------------------------------

TB_TABLES = (
    "Entity",
    "Transaction",
    "LineItem",
    "Element",
    "ENTITY_HAS_TRANSACTION",
    "TRANSACTION_HAS_LINE_ITEM",
    "LINE_ITEM_RELATES_TO_ELEMENT",
)
TB_AGG_COLS = ["total_debits", "total_credits", "net_balance"]


def _tb_full_with_rowcount(
    store, filters: dict, versions: dict[str, int] | None = None
) -> DataFrame:
    from robosystems_spark.sources.matview import ROWCOUNT_COL

    # version-pinned reads: the refresh path snapshots base-table
    # versions BEFORE recomputing; reading latest instead would let a
    # commit landing mid-refresh into the recomputed view while
    # last_v stays stale — the next additive refresh then re-applies
    # that commit's change feed and double-counts it.
    tables = {
        t: store.read(t, version=None if versions is None else versions[t])
        for t in TB_TABLES
    }
    rows = tb_joined(tables, **filters)
    # coalesced amounts — must match trial_balance() and the additive
    # delta formula exactly (a NULL-side entry otherwise makes the
    # three paths disagree: SUM(d - c) drops the whole row)
    d = F.coalesce("debit_amount", F.lit(0.0))
    c = F.coalesce("credit_amount", F.lit(0.0))
    return (
        rows.groupBy(*TB_GROUP_COLS)
        .agg(
            F.sum(d).alias("total_debits"),
            F.sum(c).alias("total_credits"),
            F.sum(d - c).alias("net_balance"),
            F.count(F.lit(1)).alias(ROWCOUNT_COL),
        )
    )


def create_trial_balance_matview(
    store,
    view: str = "TrialBalanceMV",
    period_start: str | None = None,
    period_end: str | None = None,
    entity_id: str | None = None,
) -> dict:
    """Materialize the trial balance as table ``view`` (grouped by the
    element attribute columns, carrying the rs_rows maintenance count)
    and register it for incremental refresh.  Optional period/entity
    filters are stored with the view and applied on every refresh."""
    if store.exists(view):
        raise ValueError(f"view table {view!r} already exists")
    filters = {
        "period_start": period_start,
        "period_end": period_end,
        "entity_id": entity_id,
    }
    base_v = {t: store.version(t) for t in TB_TABLES}
    full = _tb_full_with_rowcount(store, filters, versions=base_v)
    store.copy_into(view, full, primary_keys=list(TB_GROUP_COLS))
    meta = store._load_meta(view)
    meta["tb_matview"] = {"filters": filters, "last_v": base_v}
    store._save_meta(view, meta)
    return meta["tb_matview"]


def refresh_trial_balance_matview(store, view: str = "TrialBalanceMV") -> dict:
    """Advance ``view`` to the GL tables' latest committed versions.
    Returns {"mode": "noop" | "additive" | "recompute",
    "groups_touched": n}."""
    from robosystems_spark.sources.matview import (
        ROWCOUNT_COL,
        apply_additive_delta,
    )

    meta = store._load_meta(view)
    mv = meta.get("tb_matview")
    if not mv:
        raise ValueError(f"table {view!r} is not a trial-balance matview")
    filters, last_v = mv["filters"], mv["last_v"]
    now_v = {t: store.version(t) for t in TB_TABLES}
    changed = [t for t in TB_TABLES if now_v[t] > last_v[t]]
    if not changed:
        return {"mode": "noop", "groups_touched": 0}

    # dimension/edge deletes or updates (delete+insert pairs in the
    # feed) invalidate already-aggregated rows -> recompute
    needs_recompute = False
    for t in changed:
        if t == "LineItem":
            continue
        feed = store.changes(t, last_v[t], now_v[t])
        if not feed.filter(F.col("_change_type") == "delete").isEmpty():
            needs_recompute = True
            break

    if needs_recompute:
        full = _tb_full_with_rowcount(store, filters, versions=now_v).cache()
        touched = full.count()
        store.upsert(view, full, primary_keys=list(TB_GROUP_COLS))
        vanished = (
            store.read(view)
            .select(*TB_GROUP_COLS)
            .join(full.select(*TB_GROUP_COLS), TB_GROUP_COLS, "left_anti")
        )
        if not vanished.isEmpty():
            store.delete_where_in(view, list(TB_GROUP_COLS), vanished)
        full.unpersist()
        mode, touched_n = "recompute", touched
    elif "LineItem" in changed:
        feed = store.changes("LineItem", last_v["LineItem"], now_v["LineItem"])
        tables = {t: store.read(t, version=now_v[t]) for t in TB_TABLES}
        rows = tb_joined(tables, **filters, line_items=feed)
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = rows.groupBy(*TB_GROUP_COLS).agg(
            F.sum(sign * F.coalesce("debit_amount", F.lit(0.0))).alias(
                "total_debits"
            ),
            F.sum(sign * F.coalesce("credit_amount", F.lit(0.0))).alias(
                "total_credits"
            ),
            F.sum(
                sign
                * (
                    F.coalesce("debit_amount", F.lit(0.0))
                    - F.coalesce("credit_amount", F.lit(0.0))
                )
            ).alias("net_balance"),
            F.sum(sign).alias(ROWCOUNT_COL),
        )
        mode = "additive"
        touched_n = apply_additive_delta(
            store, view, list(TB_GROUP_COLS), TB_AGG_COLS, delta
        )
    else:
        # insert-only dimension/edge changes with no new line items
        # cannot move any aggregate under the co-insertion contract
        mode, touched_n = "noop", 0

    mv["last_v"] = now_v
    meta = store._load_meta(view)  # re-load: upserts rewrote table meta
    meta["tb_matview"] = mv
    store._save_meta(view, meta)
    return {"mode": mode, "groups_touched": touched_n}
