"""Staging + materialization tests, modeled on the reference's
fixture semantics (FIXTURES.md §5): overlapping-file dedup, rel
rename, file_id provenance + per-file delete, ignore-errors load,
nodes-before-rels materialization, fork, export.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from robosystems_spark.sources.materialize import GraphStore
from robosystems_spark.sources.staging import (
    delete_file_rows,
    probe_table_kind,
    read_staged,
    stage_files,
)


@pytest.fixture
def node_files(spark, tmp_path):
    """Two parquet files with overlapping identifiers."""
    f1 = str(tmp_path / "f1.parquet")
    f2 = str(tmp_path / "f2.parquet")
    spark.createDataFrame(
        [("a", "Alpha"), ("b", "Beta")], ["identifier", "name"]
    ).write.parquet(f1)
    spark.createDataFrame(
        [("b", "Beta-dup"), ("c", "Gamma")], ["identifier", "name"]
    ).write.parquet(f2)
    return [f1, f2]


def test_probe_kind(spark):
    node = spark.createDataFrame([("a",)], ["identifier"])
    rel = spark.createDataFrame([("a", "b")], ["from", "to"])
    other = spark.createDataFrame([(1,)], ["x"])
    assert probe_table_kind(node) == "node"
    assert probe_table_kind(rel) == "relationship"
    assert probe_table_kind(other) == "generic"


def test_stage_node_dedup(spark, tmp_path, node_files):
    staged = stage_files(spark, node_files, "Company", str(tmp_path / "staging"))
    df = read_staged(spark, str(tmp_path / "staging"), "Company")
    assert df.count() == 3  # a, b (deduped), c
    assert df.filter(F.col("identifier") == "b").count() == 1
    assert "file_id" in df.columns
    assert not staged.is_relationship


def test_stage_relationship_rename_and_dedup(spark, tmp_path):
    f1 = str(tmp_path / "r1.parquet")
    spark.createDataFrame(
        [("a", "b", 1.0), ("a", "b", 2.0), ("b", "c", 3.0)], ["from", "to", "w"]
    ).write.parquet(f1)
    staged = stage_files(spark, [f1], "EDGES", str(tmp_path / "staging"))
    df = read_staged(spark, str(tmp_path / "staging"), "EDGES")
    assert staged.is_relationship
    assert {"src", "dst"} <= set(df.columns)
    assert df.count() == 2  # (a,b) deduped on (src,dst)
    # deterministic survivor: lowest w wins (total-order dedup)
    assert df.filter((F.col("src") == "a") & (F.col("dst") == "b")).first()["w"] == 1.0


def test_file_id_delete(spark, tmp_path, node_files):
    root = str(tmp_path / "staging")
    stage_files(spark, [(node_files[0], "fileA"), (node_files[1], "fileB")], "T", root)
    removed = delete_file_rows(spark, root, "T", "fileB")
    df = read_staged(spark, root, "T")
    # fileB contributed c and the losing duplicate of b; only c was kept
    assert removed == 1
    assert sorted(r["identifier"] for r in df.collect()) == ["a", "b"]


def test_csv_and_json_staging(spark, tmp_path):
    csv = tmp_path / "x.csv"
    csv.write_text("identifier,name\na,Alpha\nb,Beta\n")
    staged = stage_files(spark, [str(csv)], "C", str(tmp_path / "s1"), fmt="csv")
    assert read_staged(spark, str(tmp_path / "s1"), "C").count() == 2

    js = tmp_path / "x.json"
    js.write_text('{"identifier": "a"}\n{"identifier": "b"}\n')
    stage_files(spark, [str(js)], "J", str(tmp_path / "s2"), fmt="json")
    assert read_staged(spark, str(tmp_path / "s2"), "J").count() == 2


def test_copy_into_ignore_errors(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "graphs"), "kg1")
    first = spark.createDataFrame([("a", 1), ("b", 2)], ["identifier", "v"])
    n1 = store.copy_into("T", first, primary_keys=["identifier"], ignore_errors=True)
    again = spark.createDataFrame([("b", 99), ("c", 3)], ["identifier", "v"])
    n2 = store.copy_into("T", again, primary_keys=["identifier"], ignore_errors=True)
    assert (n1, n2) == (2, 1)  # duplicate b skipped
    rows = {r["identifier"]: r["v"] for r in store.read("T").collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}  # original b kept


def test_materialize_order_and_file_id_strip(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "graphs"), "kg2")
    nodes = spark.createDataFrame([("a", "x", "f1")], ["identifier", "name", "file_id"])
    rels = spark.createDataFrame([("a", "a", "f1")], ["src", "dst", "file_id"])
    loaded = store.materialize(
        {"Entity": nodes, "ENTITY_OWNS_ENTITY": rels},
        node_tables=["Entity"],
        rel_tables=["ENTITY_OWNS_ENTITY"],
    )
    assert loaded == {"Entity": 1, "ENTITY_OWNS_ENTITY": 1}
    assert "file_id" not in store.read("Entity").columns


def test_upsert_point_write(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "graphs"), "kg3")
    store.copy_into("T", spark.createDataFrame([("a", 1)], ["identifier", "v"]))
    store.upsert("T", spark.createDataFrame([("a", 10), ("b", 2)], ["identifier", "v"]), ["identifier"])
    rows = {r["identifier"]: r["v"] for r in store.read("T").collect()}
    assert rows == {"a": 10, "b": 2}


def test_delete_where(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "graphs"), "kg4")
    store.copy_into("T", spark.createDataFrame([("a", 1), ("b", 2)], ["identifier", "v"]))
    removed = store.delete_where("T", F.col("identifier") == "a")
    assert removed == 1
    assert [r["identifier"] for r in store.read("T").collect()] == ["b"]


def test_fork_and_export(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "graphs"), "parent")
    store.copy_into("T", spark.createDataFrame([("a", 1)], ["identifier", "v"]))
    child = store.fork("parent_dev")
    assert child.read("T").count() == 1
    exported = store.export(str(tmp_path / "backup"), fmt="csv")
    assert os.path.exists(exported["T"])


def test_subgraph_service_lifecycle(spark, tmp_path):
    from robosystems_spark.sources.materialize import GraphStore
    from robosystems_spark.sources.subgraphs import SubgraphError, SubgraphService

    root = str(tmp_path / "graphs")
    parent_id = "kg0123456789abcdef"
    parent = GraphStore(spark, root, parent_id)
    parent.copy_into(
        "Person",
        spark.createDataFrame([("p1", "a"), ("p2", "b")], ["identifier", "name"]),
        primary_keys=["identifier"],
    )
    svc = SubgraphService(spark, root)

    # create forked dev subgraph
    info = svc.create_subgraph(
        parent_id, "dev", description="dev sandbox",
        schema_extensions=["roboledger"], fork_parent=True,
    )
    assert info["subgraph_id"] == f"{parent_id}_dev"
    assert info["tables"] == ["Person"]
    # duplicate refused
    with pytest.raises(SubgraphError, match="already exists"):
        svc.create_subgraph(parent_id, "dev")
    # invalid name refused (graph-id grammar)
    with pytest.raises(ValueError):
        svc.create_subgraph(parent_id, "bad-name!")

    # empty (non-forked) sibling
    svc.create_subgraph(parent_id, "staging")
    assert svc.list_subgraphs(parent_id) == [f"{parent_id}_dev", f"{parent_id}_staging"]

    # info: forked subgraph has the parent's rows; empty one doesn't
    dev = svc.get_subgraph_info(f"{parent_id}_dev")
    assert dev["tables"] == {"Person": 2} and dev["has_data"]
    assert dev["schema_extensions"] == ["roboledger"]
    stg = svc.get_subgraph_info(f"{parent_id}_staging")
    assert not stg["has_data"]

    # subgraph data is isolated from the parent
    child = GraphStore(spark, root, f"{parent_id}_dev")
    child.copy_into(
        "Person",
        spark.createDataFrame([("p3", "c")], ["identifier", "name"]),
        primary_keys=["identifier"],
    )
    assert parent.read("Person").count() == 2
    assert child.read("Person").count() == 3

    # delete: subgraphs only, parents never
    out = svc.delete_subgraph(f"{parent_id}_staging")
    assert out["deleted"].endswith("_staging")
    with pytest.raises(SubgraphError, match="not a subgraph"):
        svc.delete_subgraph(parent_id)
    assert svc.list_subgraphs(parent_id) == [f"{parent_id}_dev"]
