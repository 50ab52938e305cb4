"""Incremental materialized views maintained from the change feed.

Ground truth for every assertion is a fresh full aggregate over the
current source state — the view must equal it after each refresh while
having read only the change feed (additive) or the affected groups
(recompute).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.sources.materialize import GraphStore
from robosystems_spark.sources.matview import (
    ROWCOUNT_COL,
    create_materialized_view,
    refresh_materialized_view,
)


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(spark, str(tmp_path), "kgmatview0000000", n_buckets=8)


def _seed(spark, store):
    store.copy_into(
        "orders",
        spark.createDataFrame(
            [(i, f"g{i % 3}", float(i)) for i in range(30)],
            "oid long, grp string, amount double",
        ),
        primary_keys=["oid"],
    )


def _truth(store, aggs_sql):
    return {
        tuple(r)
        for r in store.read("orders")
        .groupBy("grp")
        .agg(*aggs_sql)
        .collect()
    }


def _view_rows(store, cols):
    return {tuple(r) for r in store.read("V").select(*cols).collect()}


def test_additive_view_tracks_inserts_updates_deletes(spark, store):
    _seed(spark, store)
    meta = create_materialized_view(
        store,
        "V",
        "orders",
        ["grp"],
        {"total": ("sum", "amount"), "n": ("count", "*")},
    )
    assert meta["mode"] == "additive"
    truth_exprs = [
        F.sum("amount").alias("total"),
        F.count(F.lit(1)).alias("n"),
    ]
    assert _view_rows(store, ["grp", "total", "n"]) == _truth(store, truth_exprs)

    # insert rows into an existing and a brand-new group
    store.copy_into(
        "orders",
        spark.createDataFrame(
            [(100, "g0", 5.0), (101, "gNEW", 7.0)],
            "oid long, grp string, amount double",
        ),
        primary_keys=["oid"],
    )
    r = refresh_materialized_view(store, "V")
    assert r["mode"] == "additive" and r["groups_touched"] == 2
    assert _view_rows(store, ["grp", "total", "n"]) == _truth(store, truth_exprs)

    # update (delete+insert in the feed) and a merge-on-read delete
    store.update_where("orders", F.col("oid") == 3, {"amount": F.lit(99.0)})
    store.delete_where("orders", F.col("oid") == 6, merge_on_read=True)
    refresh_materialized_view(store, "V")
    assert _view_rows(store, ["grp", "total", "n"]) == _truth(store, truth_exprs)

    # no-op refresh
    assert refresh_materialized_view(store, "V")["groups_touched"] == 0


def test_additive_view_removes_emptied_group(spark, store):
    _seed(spark, store)
    create_materialized_view(
        store, "V", "orders", ["grp"], {"n": ("count", "*")}
    )
    store.delete_where("orders", F.col("grp") == "g1")
    refresh_materialized_view(store, "V")
    assert _view_rows(store, ["grp"]) == {("g0",), ("g2",)}
    assert store.read("V").filter(F.col(ROWCOUNT_COL) <= 0).count() == 0


def test_recompute_view_handles_min_max_under_deletes(spark, store):
    """min/max are not invertible — deleting the current max must
    surface the runner-up, which only the recompute path gets right."""
    _seed(spark, store)
    meta = create_materialized_view(
        store,
        "V",
        "orders",
        ["grp"],
        {"hi": ("max", "amount"), "lo": ("min", "amount"), "mean": ("avg", "amount")},
    )
    assert meta["mode"] == "recompute"
    # delete each group's current maximum
    store.delete_where("orders", F.col("oid").isin([27, 28, 29]))
    r = refresh_materialized_view(store, "V")
    assert r["mode"] == "recompute" and r["groups_touched"] == 3
    truth = _truth(
        store,
        [
            F.max("amount").alias("hi"),
            F.min("amount").alias("lo"),
            F.avg("amount").alias("mean"),
        ],
    )
    assert _view_rows(store, ["grp", "hi", "lo", "mean"]) == truth


def test_recompute_view_removes_vanished_group(spark, store):
    _seed(spark, store)
    create_materialized_view(
        store, "V", "orders", ["grp"], {"hi": ("max", "amount")}
    )
    store.delete_where("orders", F.col("grp") == "g2")
    refresh_materialized_view(store, "V")
    assert _view_rows(store, ["grp"]) == {("g0",), ("g1",)}


def test_matview_validation(spark, store):
    _seed(spark, store)
    with pytest.raises(ValueError, match="unsupported fn"):
        create_materialized_view(
            store, "V", "orders", ["grp"], {"x": ("median", "amount")}
        )
    with pytest.raises(ValueError, match="only valid for count"):
        create_materialized_view(
            store, "V", "orders", ["grp"], {"x": ("sum", "*")}
        )
    with pytest.raises(ValueError, match="reserved"):
        create_materialized_view(
            store, "V", "orders", ["grp"], {ROWCOUNT_COL: ("count", "*")}
        )
    create_materialized_view(store, "V", "orders", ["grp"], {"n": ("count", "*")})
    with pytest.raises(ValueError, match="already exists"):
        create_materialized_view(
            store, "V", "orders", ["grp"], {"n": ("count", "*")}
        )
    with pytest.raises(ValueError, match="not a materialized view"):
        refresh_materialized_view(store, "orders")


def test_matview_survives_process_restart(spark, store, tmp_path):
    """Maintenance state lives in table meta — a fresh GraphStore
    instance picks up where the old one stopped."""
    _seed(spark, store)
    create_materialized_view(
        store, "V", "orders", ["grp"], {"total": ("sum", "amount")}
    )
    store.copy_into(
        "orders",
        spark.createDataFrame([(200, "g0", 11.0)], "oid long, grp string, amount double"),
        primary_keys=["oid"],
    )
    fresh = GraphStore(spark, str(tmp_path), "kgmatview0000000", n_buckets=8)
    r = refresh_materialized_view(fresh, "V")
    assert r["groups_touched"] == 1
    truth = _truth(fresh, [F.sum("amount").alias("total")])
    assert {
        tuple(r) for r in fresh.read("V").select("grp", "total").collect()
    } == truth


def test_call_matview_refresh_procedure(spark, store):
    from robosystems_spark.queryapi.procedures import execute_call

    _seed(spark, store)
    create_materialized_view(
        store, "V", "orders", ["grp"], {"n": ("count", "*")}
    )
    store.delete_where("orders", F.col("oid") == 0)
    out = execute_call(spark, "CALL matview_refresh('V')", store=store).collect()
    assert out[0]["view"] == "V" and out[0]["groups_touched"] == 1


# -- incremental trial-balance matview (views/trial_balance.py) --------------


def _seed_gl(spark, store):
    mk = spark.createDataFrame
    store.copy_into("Entity", mk(
        [("e1", "Acme")], "identifier string, name string"),
        primary_keys=["identifier"])
    store.copy_into("Element", mk(
        [("cash", "uri:cash", "Cash", "asset", "debit", "instant"),
         ("rev", "uri:rev", "Revenue", "revenue", "credit", "duration"),
         ("exp", "uri:exp", "Expenses", "expense", "debit", "duration")],
        "identifier string, uri string, name string, classification string, "
        "balance string, period_type string"), primary_keys=["identifier"])
    store.copy_into("Transaction", mk(
        [("t1", "2024-01-10"), ("t2", "2024-02-10")],
        "identifier string, date string"), primary_keys=["identifier"])
    store.copy_into("LineItem", mk(
        [("l1", 100.0, 0.0), ("l2", 0.0, 100.0),
         ("l3", 50.0, 0.0), ("l4", 0.0, 50.0)],
        "identifier string, debit_amount double, credit_amount double"),
        primary_keys=["identifier"])
    store.copy_into("ENTITY_HAS_TRANSACTION", mk(
        [("e1", "t1"), ("e1", "t2")], "src string, dst string"),
        primary_keys=["src", "dst"])
    store.copy_into("TRANSACTION_HAS_LINE_ITEM", mk(
        [("t1", "l1"), ("t1", "l2"), ("t2", "l3"), ("t2", "l4")],
        "src string, dst string"), primary_keys=["src", "dst"])
    store.copy_into("LINE_ITEM_RELATES_TO_ELEMENT", mk(
        [("l1", "cash"), ("l2", "rev"), ("l3", "exp"), ("l4", "cash")],
        "src string, dst string"), primary_keys=["src", "dst"])


def _tb_golden(store):
    """Fresh full recompute via the request-path trial_balance()."""
    from robosystems_spark.views.trial_balance import TB_TABLES, trial_balance

    tables = {t: store.read(t) for t in TB_TABLES}
    return {
        r["element_id"]: (
            r["total_debits"], r["total_credits"], r["net_balance"]
        )
        for r in trial_balance(tables).collect()
    }


def _tb_view(store, view):
    return {
        r["element_id"]: (
            r["total_debits"], r["total_credits"], r["net_balance"]
        )
        for r in store.read(view).collect()
    }


def test_trial_balance_matview_incremental_matches_recompute(spark, store):
    """Mutating transactions + matview refresh == full recompute; the
    common append path must take the ADDITIVE (change-feed-only)
    route."""
    from robosystems_spark.views.trial_balance import (
        create_trial_balance_matview,
        refresh_trial_balance_matview,
    )

    _seed_gl(spark, store)
    create_trial_balance_matview(store, "TB")
    assert _tb_view(store, "TB") == _tb_golden(store)

    # post a new transaction: t3 debits expenses 70, credits cash 70
    mk = spark.createDataFrame
    store.upsert("Transaction", mk(
        [("t3", "2024-03-15")], "identifier string, date string"),
        primary_keys=["identifier"])
    store.upsert("LineItem", mk(
        [("l5", 70.0, 0.0), ("l6", 0.0, 70.0)],
        "identifier string, debit_amount double, credit_amount double"),
        primary_keys=["identifier"])
    store.upsert("ENTITY_HAS_TRANSACTION", mk(
        [("e1", "t3")], "src string, dst string"), primary_keys=["src", "dst"])
    store.upsert("TRANSACTION_HAS_LINE_ITEM", mk(
        [("t3", "l5"), ("t3", "l6")], "src string, dst string"),
        primary_keys=["src", "dst"])
    store.upsert("LINE_ITEM_RELATES_TO_ELEMENT", mk(
        [("l5", "exp"), ("l6", "cash")], "src string, dst string"),
        primary_keys=["src", "dst"])

    r = refresh_trial_balance_matview(store, "TB")
    assert r["mode"] == "additive" and r["groups_touched"] == 2
    golden = _tb_golden(store)
    assert _tb_view(store, "TB") == golden
    assert golden["exp"] == (120.0, 0.0, 120.0)
    assert golden["cash"] == (100.0, 120.0, -20.0)

    # idempotent no-op when nothing changed
    assert refresh_trial_balance_matview(store, "TB")["mode"] == "noop"


def test_trial_balance_matview_line_item_update_and_delete(spark, store):
    """Updates (delete+insert pairs in the feed) and deletes of line
    items stay on the additive path and still match the recompute."""
    from robosystems_spark.views.trial_balance import (
        create_trial_balance_matview,
        refresh_trial_balance_matview,
    )

    _seed_gl(spark, store)
    create_trial_balance_matview(store, "TB")
    mk = spark.createDataFrame
    # re-state l3: 50 -> 80 debit
    store.upsert("LineItem", mk(
        [("l3", 80.0, 0.0)],
        "identifier string, debit_amount double, credit_amount double"),
        primary_keys=["identifier"])
    r = refresh_trial_balance_matview(store, "TB")
    assert r["mode"] == "additive"
    assert _tb_view(store, "TB") == _tb_golden(store)
    assert _tb_view(store, "TB")["exp"] == (80.0, 0.0, 80.0)


def test_trial_balance_matview_dimension_change_recomputes(spark, store):
    """An element rename (dimension update) must fall back to the
    recompute path and still converge to the golden values."""
    from robosystems_spark.views.trial_balance import (
        create_trial_balance_matview,
        refresh_trial_balance_matview,
    )

    _seed_gl(spark, store)
    create_trial_balance_matview(store, "TB")
    mk = spark.createDataFrame
    store.upsert("Element", mk(
        [("rev", "uri:rev", "Revenue (renamed)", "revenue", "credit",
          "duration")],
        "identifier string, uri string, name string, classification string, "
        "balance string, period_type string"), primary_keys=["identifier"])
    r = refresh_trial_balance_matview(store, "TB")
    assert r["mode"] == "recompute"
    assert _tb_view(store, "TB") == _tb_golden(store)
    names = {r["element_name"] for r in store.read("TB").collect()}
    assert "Revenue (renamed)" in names and "Revenue" not in names


def test_trial_balance_matview_via_call_procedure(spark, store):
    """CALL matview_refresh('TB') routes join-shaped trial-balance
    views through the same dispatcher as single-table matviews."""
    from robosystems_spark.views.trial_balance import (
        create_trial_balance_matview,
    )

    _seed_gl(spark, store)
    create_trial_balance_matview(store, "TB")
    mk = spark.createDataFrame
    store.upsert("LineItem", mk(
        [("l9", 5.0, 0.0)],
        "identifier string, debit_amount double, credit_amount double"),
        primary_keys=["identifier"])
    store.upsert("TRANSACTION_HAS_LINE_ITEM", mk(
        [("t1", "l9")], "src string, dst string"), primary_keys=["src", "dst"])
    store.upsert("LINE_ITEM_RELATES_TO_ELEMENT", mk(
        [("l9", "cash")], "src string, dst string"),
        primary_keys=["src", "dst"])
    out = refresh_materialized_view(store, "TB")
    assert out["mode"] == "additive" and out["groups_touched"] == 1
    assert _tb_view(store, "TB") == _tb_golden(store)


def test_trial_balance_null_amounts_three_paths_agree(spark, store):
    """GL data may use NULL for the unused side of an entry.  The
    request-path view, the matview full recompute, and the additive
    refresh must all coalesce NULL->0 identically — SUM(d - c) drops
    NULL-side rows entirely and diverges (the r5-cycle advice bug)."""
    from robosystems_spark.views.trial_balance import (
        create_trial_balance_matview,
        refresh_trial_balance_matview,
    )

    _seed_gl(spark, store)
    mk = spark.createDataFrame
    # NULL-side entry, present at matview creation (exercises the full
    # recompute path in _tb_full_with_rowcount)
    store.upsert("Transaction", mk(
        [("t3", "2024-03-01")], "identifier string, date string"),
        primary_keys=["identifier"])
    store.upsert("LineItem", mk(
        [("l5", 30.0, None), ("l6", None, 30.0)],
        "identifier string, debit_amount double, credit_amount double"),
        primary_keys=["identifier"])
    store.upsert("ENTITY_HAS_TRANSACTION", mk(
        [("e1", "t3")], "src string, dst string"), primary_keys=["src", "dst"])
    store.upsert("TRANSACTION_HAS_LINE_ITEM", mk(
        [("t3", "l5"), ("t3", "l6")], "src string, dst string"),
        primary_keys=["src", "dst"])
    store.upsert("LINE_ITEM_RELATES_TO_ELEMENT", mk(
        [("l5", "exp"), ("l6", "cash")], "src string, dst string"),
        primary_keys=["src", "dst"])

    create_trial_balance_matview(store, "TBN")
    golden = _tb_golden(store)
    assert _tb_view(store, "TBN") == golden
    assert golden["exp"] == (80.0, 0.0, 80.0)       # 50 + 30(NULL credit)
    assert golden["cash"] == (100.0, 80.0, 20.0)    # credit 50 + 30(NULL debit)

    # another NULL-side entry through the ADDITIVE path
    store.upsert("Transaction", mk(
        [("t4", "2024-04-01")], "identifier string, date string"),
        primary_keys=["identifier"])
    store.upsert("LineItem", mk(
        [("l7", 5.0, None), ("l8", None, 5.0)],
        "identifier string, debit_amount double, credit_amount double"),
        primary_keys=["identifier"])
    store.upsert("ENTITY_HAS_TRANSACTION", mk(
        [("e1", "t4")], "src string, dst string"), primary_keys=["src", "dst"])
    store.upsert("TRANSACTION_HAS_LINE_ITEM", mk(
        [("t4", "l7"), ("t4", "l8")], "src string, dst string"),
        primary_keys=["src", "dst"])
    store.upsert("LINE_ITEM_RELATES_TO_ELEMENT", mk(
        [("l7", "exp"), ("l8", "cash")], "src string, dst string"),
        primary_keys=["src", "dst"])

    r = refresh_trial_balance_matview(store, "TBN")
    assert r["mode"] == "additive"
    golden = _tb_golden(store)
    assert _tb_view(store, "TBN") == golden
    assert golden["exp"] == (85.0, 0.0, 85.0)

    # element rename forces the RECOMPUTE path over the same NULL data
    store.update_where("Element", F.col("identifier") == "cash",
                       {"name": F.lit("Cash2")})
    r = refresh_trial_balance_matview(store, "TBN")
    assert r["mode"] == "recompute"
    assert _tb_view(store, "TBN") == _tb_golden(store)
