"""Partition-pruned mutation tests: the 100 TB discipline for writes.

A point upsert/update/delete on a bucketed table must rewrite only the
bucket partitions that contain affected rows — never the whole table —
and partition promotion must never leave an unrecoverable window
(rename-aside, not rmtree-then-rename).  Mirrors the reference's
per-file pruned DELETE (graph_api/core/duckdb/manager.py:626-730) and
Delta MERGE/UPDATE/DELETE semantics from SURVEY §1.1.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from robosystems_spark.sources.materialize import BUCKET_COL, GraphStore
from robosystems_spark.sources.staging import delete_file_rows, read_staged, stage_files


def _part_mtimes(store: GraphStore, table: str) -> dict[str, float]:
    """mtime per bucket-partition dir — a rewritten partition changes."""
    root = store.table_path(table)
    out = {}
    for d in os.listdir(root):
        if d.startswith(f"{BUCKET_COL}="):
            p = os.path.join(root, d)
            out[d] = max(
                os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
            )
    return out


@pytest.fixture
def big_store(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"), "kg", n_buckets=8)
    df = spark.range(0, 400).select(
        F.concat(F.lit("id"), F.col("id")).alias("identifier"),
        F.col("id").cast("int").alias("v"),
        F.lit("orig").alias("s"),
    )
    store.copy_into("T", df, primary_keys=["identifier"])
    return store


def test_copy_into_creates_bucketed_layout(big_store):
    parts = [
        d for d in os.listdir(big_store.table_path("T"))
        if d.startswith(f"{BUCKET_COL}=")
    ]
    assert len(parts) > 1  # rows spread over bucket partitions
    df = big_store.read("T")
    assert BUCKET_COL not in df.columns  # internal column hidden
    assert df.count() == 400


def test_point_update_rewrites_only_affected_partitions(big_store):
    before = _part_mtimes(big_store, "T")
    n = big_store.update_where(
        "T", F.col("identifier") == "id7", {"s": "patched"}
    )
    assert n == 1
    after = _part_mtimes(big_store, "T")
    changed = [p for p in after if after[p] != before.get(p)]
    assert len(changed) == 1, f"1-row update rewrote {len(changed)} partitions"
    rows = {r["identifier"]: r["s"] for r in big_store.read("T").collect()}
    assert rows["id7"] == "patched"
    assert rows["id8"] == "orig"
    assert len(rows) == 400


def test_point_delete_rewrites_only_affected_partitions(big_store):
    before = _part_mtimes(big_store, "T")
    removed = big_store.delete_where("T", F.col("identifier").isin("id3", "id11"))
    assert removed == 2
    after = _part_mtimes(big_store, "T")
    changed = [p for p in after if after[p] != before.get(p)]
    assert 1 <= len(changed) <= 2
    assert big_store.read("T").count() == 398


def test_pruned_upsert_updates_and_inserts(big_store):
    spark = big_store.spark
    before = _part_mtimes(big_store, "T")
    incoming = spark.createDataFrame(
        [("id7", 777, "upserted"), ("idNEW", -1, "inserted")],
        ["identifier", "v", "s"],
    )
    big_store.upsert("T", incoming, ["identifier"])
    after = _part_mtimes(big_store, "T")
    changed = [p for p in after if after[p] != before.get(p)]
    assert 1 <= len(changed) <= 2, f"2-row upsert rewrote {len(changed)} partitions"
    rows = {r["identifier"]: (r["v"], r["s"]) for r in big_store.read("T").collect()}
    assert rows["id7"] == (777, "upserted")
    assert rows["idNEW"] == (-1, "inserted")
    assert rows["id8"] == (8, "orig")
    assert len(rows) == 401


def test_update_set_sees_pre_update_values(spark, tmp_path):
    """SQL UPDATE semantics: every SET clause evaluates against the
    pre-update row even when the condition references an assigned
    column (ADVICE round 1)."""
    store = GraphStore(spark, str(tmp_path / "g"), "kg")
    store.copy_into(
        "T",
        spark.createDataFrame([(1, 0), (5, 0)], ["a", "b"]),
        primary_keys=["a"],
    )
    n = store.update_where("T", F.col("a") == 1, {"a": F.lit(2), "b": F.lit(9)})
    assert n == 1
    rows = sorted((r["a"], r["b"]) for r in store.read("T").collect())
    assert rows == [(2, 9), (5, 0)]  # both SETs applied


def test_delete_where_keeps_null_condition_rows(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"), "kg")
    store.copy_into(
        "T",
        spark.createDataFrame(
            [("a", 1), ("b", None), ("c", 3)], ["identifier", "v"]
        ),
        primary_keys=["identifier"],
    )
    removed = store.delete_where("T", F.col("v") > 2)  # NULL > 2 => NULL
    assert removed == 1
    assert sorted(r["identifier"] for r in store.read("T").collect()) == ["a", "b"]


def test_delete_all_leaves_readable_empty_table(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "g"), "kg")
    store.copy_into(
        "T",
        spark.createDataFrame([("a", 1), ("b", 2)], ["identifier", "v"]),
        primary_keys=["identifier"],
    )
    removed = store.delete_where("T", F.lit(True))
    assert removed == 2
    assert store.read("T").count() == 0
    # and the table accepts appends again (consistent unpartitioned layout)
    store.copy_into("T", spark.createDataFrame([("c", 3)], ["identifier", "v"]))
    assert store.read("T").count() == 1


def test_no_scratch_dirs_left_behind(big_store):
    big_store.update_where("T", F.col("identifier") == "id1", {"s": "x"})
    big_store.delete_where("T", F.col("identifier") == "id2")
    big_store.upsert(
        "T",
        big_store.spark.createDataFrame([("id3", 0, "y")], ["identifier", "v", "s"]),
        ["identifier"],
    )
    residue = [
        d for d in os.listdir(big_store.graph_path)
        if d.startswith((".tmp", ".trash")) or d.endswith("__rewrite")
    ]
    assert residue == []


def test_fork_preserves_bucketed_layout(big_store):
    child = big_store.fork("kg_dev")
    assert child.read("T").count() == 400
    assert child._is_bucketed("T")
    # pruned mutation works on the fork too
    n = child.update_where("T", F.col("identifier") == "id5", {"s": "forked"})
    assert n == 1
    # parent untouched
    assert big_store.read("T").filter(F.col("s") == "forked").count() == 0


def test_restore_rebuckets_from_meta(big_store, tmp_path):
    backup = str(tmp_path / "backup")
    big_store.export(backup, fmt="parquet")
    big_store.delete_where("T", F.lit(True))
    restored = big_store.restore(backup)
    assert restored == ["T"]
    assert big_store.read("T").count() == 400
    assert big_store._is_bucketed("T")


def test_staging_file_delete_is_partition_drop(spark, tmp_path):
    f1, f2 = str(tmp_path / "f1.parquet"), str(tmp_path / "f2.parquet")
    spark.createDataFrame([("a", 1), ("b", 2)], ["identifier", "v"]).write.parquet(f1)
    spark.createDataFrame([("c", 3)], ["identifier", "v"]).write.parquet(f2)
    root = str(tmp_path / "staging")
    stage_files(spark, [(f1, "fileA"), (f2, "fileB")], "T", root)
    table = os.path.join(root, "T")
    assert any(d.startswith("file_id=") for d in os.listdir(table))

    other_parts = {
        d: os.path.getmtime(os.path.join(table, d))
        for d in os.listdir(table)
        if d.startswith("file_id=") and "fileB" not in d
    }
    removed = delete_file_rows(spark, root, "T", "fileB")
    assert removed == 1
    # untouched partitions were not rewritten
    for d, mt in other_parts.items():
        assert os.path.getmtime(os.path.join(table, d)) == mt
    assert sorted(
        r["identifier"] for r in read_staged(spark, root, "T").collect()
    ) == ["a", "b"]
    # deleting the last file leaves a readable empty table
    assert delete_file_rows(spark, root, "T", "fileA") == 2
    assert read_staged(spark, root, "T").count() == 0


def test_backup_manifest_verifies_and_rejects_tamper(big_store, tmp_path):
    """Exports carry a checksum manifest and restore verifies it before
    promoting anything (backup_manager.py:577-760 compressed/checksummed
    backups): a bit-flipped file refuses to restore."""
    import glob

    backup = str(tmp_path / "b2")
    big_store.export(backup)
    man = big_store.verify_backup(backup)
    assert man["tables"]["T"]["rows"] == 400
    assert man["compression"] == "zstd"
    assert all(
        len(e["sha256"]) == 64 for e in man["tables"]["T"]["files"]
    ) and man["tables"]["T"]["files"]

    f = sorted(
        glob.glob(os.path.join(backup, "T", "**", "*.parquet"), recursive=True)
    )[0]
    blob = bytearray(open(f, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(f, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        big_store.restore(backup)
    # live table untouched by the refused restore
    assert big_store.read("T").count() == 400

    # a dir without a manifest is not a verifiable backup...
    bare = str(tmp_path / "bare")
    os.makedirs(os.path.join(bare, "T"), exist_ok=True)
    with pytest.raises(ValueError, match="not a verifiable backup"):
        big_store.restore(bare)
