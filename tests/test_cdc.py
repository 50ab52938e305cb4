"""Change-feed followers: commit-log CDC driving downstream state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.sources.materialize import GraphStore
from robosystems_spark.streaming.cdc import follow_changes, sync_mirror


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(spark, str(tmp_path), "kgcdcsource00000", n_buckets=8)


@pytest.fixture()
def mirror(spark, tmp_path):
    return GraphStore(spark, str(tmp_path), "kgcdcmirror00000", n_buckets=8)


def _seed(spark, store, n=12):
    store.copy_into(
        "T",
        spark.createDataFrame([(i, 0) for i in range(n)], "identifier long, v long"),
        primary_keys=["identifier"],
    )


def _rows(store, table="T"):
    return sorted((r["identifier"], r["v"]) for r in store.read(table).collect())


def test_follow_changes_delivers_each_window_once(spark, store):
    _seed(spark, store)
    seen = []

    def apply_fn(feed, v_from, v_to):
        seen.append((v_from, v_to, feed.count()))

    base = store.version("T")
    store.update_where("T", F.col("identifier") == 1, {"v": F.lit(5)})
    store.delete_where("T", F.col("identifier") == 2, merge_on_read=True)
    last = follow_changes(
        store, "T", apply_fn, from_version=base, stop_when_caught_up=True,
        poll_interval_s=0.01,
    )
    assert last == store.version("T")
    # one window covering both commits: 2 (update pair) + 1 (delete)
    assert seen == [(base, last, 3)]
    # caught up: nothing new delivered
    assert follow_changes(
        store, "T", apply_fn, from_version=last, stop_when_caught_up=True,
        poll_interval_s=0.01,
    ) == last
    assert len(seen) == 1


def test_sync_mirror_tracks_source_through_mutations(spark, store, mirror):
    _seed(spark, store)
    v = sync_mirror(store, "T", mirror, "M", ["identifier"])  # hydration
    assert _rows(mirror, "M") == _rows(store)
    assert v == store.version("T")

    store.copy_into(
        "T",
        spark.createDataFrame([(100, 7)], "identifier long, v long"),
        primary_keys=["identifier"],
    )
    store.update_where("T", F.col("identifier") == 3, {"v": F.lit(9)})
    store.delete_where("T", F.col("identifier") == 5, merge_on_read=True)
    sync_mirror(store, "T", mirror, "M", ["identifier"])
    assert _rows(mirror, "M") == _rows(store)

    # idempotent when caught up
    wm = sync_mirror(store, "T", mirror, "M", ["identifier"])
    assert wm == store.version("T")
    assert _rows(mirror, "M") == _rows(store)


def test_sync_mirror_watermark_survives_new_store_instance(
    spark, store, mirror, tmp_path
):
    _seed(spark, store, n=6)
    sync_mirror(store, "T", mirror, "M", ["identifier"])
    store.delete_where("T", F.col("identifier") == 0)
    fresh = GraphStore(spark, str(tmp_path), "kgcdcmirror00000", n_buckets=8)
    sync_mirror(store, "T", fresh, "M", ["identifier"])
    assert _rows(fresh, "M") == _rows(store)


def test_register_views_are_snapshot_pinned(spark, store):
    """SQL views over store tables pin the version at registration:
    a concurrent mutation doesn't change a running query's world."""
    _seed(spark, store, n=8)
    store.register_views(prefix="g_")
    assert spark.sql("SELECT COUNT(*) AS n FROM g_T").collect()[0]["n"] == 8
    store.delete_where("T", F.col("identifier") < 4)
    # pinned view still serves the registration-time snapshot
    assert spark.sql("SELECT COUNT(*) AS n FROM g_T").collect()[0]["n"] == 8
    # re-registration advances to the latest committed version
    store.register_views(prefix="g_")
    assert spark.sql("SELECT COUNT(*) AS n FROM g_T").collect()[0]["n"] == 4
