"""Dependency-ordered asset orchestration (pipelines/assets.py) — the
plain-jobs half of the reference's Dagster seam (ref: robosystems/
dagster/assets/sec.py:288-907: deps, partitions, retry policy,
MaterializeResult)."""

from __future__ import annotations

import threading

import pytest

from robosystems_spark.pipelines.assets import AssetGraph


def test_diamond_runs_in_dependency_order_and_passes_values():
    g = AssetGraph(max_concurrent=2)
    seen = []
    lock = threading.Lock()

    def note(n):
        with lock:
            seen.append(n)

    @g.asset()
    def source(ctx):
        note("source")
        return 10

    @g.asset(deps=[source])
    def left(ctx):
        note("left")
        return ctx.upstream["source"] + 1

    @g.asset(deps=["source"])  # string deps work too
    def right(ctx):
        note("right")
        return ctx.upstream["source"] * 2

    @g.asset(deps=[left, right])
    def sink(ctx):
        note("sink")
        return ctx.upstream["left"] + ctx.upstream["right"]

    res = g.materialize()
    assert all(r.status == "ok" for r in res.values())
    assert res["sink"].value == 31
    assert seen[0] == "source" and seen[-1] == "sink"
    assert set(seen[1:3]) == {"left", "right"}


def test_selection_pulls_transitive_deps_only():
    g = AssetGraph()
    ran = []

    @g.asset()
    def a(ctx):
        ran.append("a")

    @g.asset(deps=["a"])
    def b(ctx):
        ran.append("b")

    @g.asset()
    def unrelated(ctx):
        ran.append("unrelated")

    res = g.materialize(select=["b"])
    assert set(res) == {"a", "b"} and ran == ["a", "b"]
    with pytest.raises(KeyError):
        g.materialize(select=["nope"])


def test_retry_policy_and_failure_skips_downstream_only():
    g = AssetGraph()
    attempts = {"flaky": 0}

    @g.asset(retries=1)
    def flaky(ctx):
        attempts["flaky"] += 1
        if attempts["flaky"] == 1:
            raise RuntimeError("transient")
        return "ok"

    @g.asset(retries=0)
    def doomed(ctx):
        raise RuntimeError("permanent")

    @g.asset(deps=["doomed"])
    def dependent(ctx):
        return "never"

    @g.asset(deps=["dependent"])
    def grand(ctx):
        return "never"

    @g.asset(deps=["flaky"])
    def healthy_branch(ctx):
        return ctx.upstream["flaky"] + "!"

    res = g.materialize()
    assert res["flaky"].status == "ok" and res["flaky"].attempts == 2
    assert res["doomed"].status == "failed"
    assert "permanent" in res["doomed"].error
    assert res["dependent"].status == "upstream_failed"
    assert res["grand"].status == "upstream_failed"
    # the independent branch still ran
    assert res["healthy_branch"].value == "ok!"


def test_cycle_and_duplicate_detection():
    g = AssetGraph()

    @g.asset(deps=["b"])
    def a(ctx):
        pass

    @g.asset(deps=["a"])
    def b(ctx):
        pass

    with pytest.raises(ValueError, match="cycle"):
        g.materialize()

    g2 = AssetGraph()

    @g2.asset(name="x")
    def x1(ctx):
        pass

    with pytest.raises(ValueError, match="duplicate"):

        @g2.asset(name="x")
        def x2(ctx):
            pass


def test_ledger_freshness_and_partitions(tmp_path):
    ledger = str(tmp_path / "ledger.json")
    runs = []

    def build():
        g = AssetGraph(ledger_path=ledger)

        @g.asset()
        def ingest(ctx):
            runs.append(("ingest", ctx.partition_key))
            return f"data-{ctx.partition_key}"

        return g

    g = build()
    r1 = g.materialize(partition_key="2023")
    assert r1["ingest"].status == "ok"
    # same partition: fresh (skipped); other partition: runs
    g = build()
    assert g.materialize(partition_key="2023")["ingest"].status == "fresh"
    g = build()
    assert g.materialize(partition_key="2024")["ingest"].status == "ok"
    # force re-runs regardless of the ledger
    g = build()
    assert g.materialize(partition_key="2023", force=True)["ingest"].status == "ok"
    assert runs == [("ingest", "2023"), ("ingest", "2024"), ("ingest", "2023")]


def test_assets_with_spark_end_to_end(spark, tmp_path):
    """A miniature download->process->stage->materialize chain (the
    sec.py shape) where assets exchange durable PATHS and each stage
    is a real Spark plan."""
    from pyspark.sql import functions as F

    g = AssetGraph(spark=spark, max_concurrent=2)
    base = str(tmp_path)

    @g.asset()
    def raw_filings(ctx):
        p = f"{base}/raw"
        ctx.spark.range(100).withColumn(
            "v", F.col("id") * 2
        ).write.mode("overwrite").parquet(p)
        return p

    @g.asset(deps=[raw_filings])
    def processed(ctx):
        p = f"{base}/processed"
        df = ctx.spark.read.parquet(ctx.upstream["raw_filings"])
        df.filter(F.col("v") >= 100).write.mode("overwrite").parquet(p)
        return p

    @g.asset(deps=[processed])
    def materialized(ctx):
        df = ctx.spark.read.parquet(ctx.upstream["processed"])
        return df.count()

    res = g.materialize(select=["materialized"])
    assert res["materialized"].value == 50
