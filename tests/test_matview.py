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
