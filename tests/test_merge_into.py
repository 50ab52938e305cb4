"""MERGE INTO: the declarative upsert primitive (Delta MERGE analog).

The reference reaches upsert through per-row MERGE Cypher
(/root/reference/robosystems/graph_api — bulk paths split it into
COPY + UPDATE); ``GraphStore.merge_into`` is the single-statement
equivalent: matched rows update or delete, unmatched source rows
insert, all join-shaped (semi/anti/left on the merge keys) so the
only shuffles are the two key joins at any scale.

Both physical strategies are covered: copy-on-write (only buckets
holding matches rewrite; inserts are blind file appends) and
merge-on-read (matched rows masked by a deletion-vector sidecar,
updated images + inserts appended — O(rows changed) I/O).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from robosystems_spark.sources.materialize import BUCKET_COL, GraphStore


@pytest.fixture
def store(spark, tmp_path):
    s = GraphStore(spark, str(tmp_path / "g"), "kg", n_buckets=8)
    df = spark.range(0, 200).select(
        F.concat(F.lit("id"), F.col("id")).alias("identifier"),
        F.col("id").cast("int").alias("v"),
        F.lit("orig").alias("s"),
    )
    s.copy_into("T", df, primary_keys=["identifier"])
    return s


def _src(spark, rows):
    return spark.createDataFrame(rows, "identifier string, v int, s string")


def _part_mtimes(store, table):
    root = store.table_path(table)
    out = {}
    for d in os.listdir(root):
        if d.startswith(f"{BUCKET_COL}="):
            p = os.path.join(root, d)
            out[d] = {f for f in os.listdir(p) if f.endswith(".parquet")}
    return out


@pytest.mark.parametrize("mor", [False, True])
def test_merge_update_and_insert(spark, store, mor):
    src = _src(spark, [("id5", 500, "upd"), ("id7", 700, "upd"), ("idNEW", 1, "new")])
    out = store.merge_into("T", src, on=["identifier"], merge_on_read=mor)
    assert out == {"matched": 2, "updated": 2, "deleted": 0, "inserted": 1}
    df = store.read("T")
    assert df.count() == 201
    got = {r["identifier"]: (r["v"], r["s"]) for r in df.filter(
        F.col("identifier").isin("id5", "id7", "idNEW", "id9")).collect()}
    assert got == {
        "id5": (500, "upd"), "id7": (700, "upd"),
        "idNEW": (1, "new"), "id9": (9, "orig"),
    }


@pytest.mark.parametrize("mor", [False, True])
def test_merge_delete_matched(spark, store, mor):
    src = _src(spark, [("id3", 0, "x"), ("idGONE", 0, "x")])
    out = store.merge_into(
        "T", src, on=["identifier"],
        when_matched="delete", when_not_matched="skip", merge_on_read=mor,
    )
    assert out == {"matched": 1, "updated": 0, "deleted": 1, "inserted": 0}
    df = store.read("T")
    assert df.count() == 199
    assert df.filter(F.col("identifier").isin("id3", "idGONE")).count() == 0


def test_merge_custom_assignments_additive(spark, store):
    """update_assignments sees target columns by name and source
    columns as _src_<name> — an additive merge."""
    src = _src(spark, [("id10", 5, "z")])
    store.merge_into(
        "T", src, on=["identifier"],
        update_assignments={"v": F.col("v") + F.col("_src_v")},
    )
    row = store.read("T").filter(F.col("identifier") == "id10").first()
    assert row["v"] == 15 and row["s"] == "orig"  # s untouched


def test_merge_partial_source_null_fills_inserts(spark, store):
    """Source missing table columns: updates leave them alone, inserts
    NULL-fill them."""
    src = spark.createDataFrame([("id2", 99), ("idN", 42)], "identifier string, v int")
    store.merge_into("T", src, on=["identifier"])
    rows = {r["identifier"]: r for r in store.read("T").filter(
        F.col("identifier").isin("id2", "idN")).collect()}
    assert rows["id2"]["v"] == 99 and rows["id2"]["s"] == "orig"
    assert rows["idN"]["v"] == 42 and rows["idN"]["s"] is None


def test_merge_pure_insert_is_blind_append(spark, store):
    """A no-match merge must not rewrite any existing bucket file —
    inserts land as new files only (the 100 TB contract: a pure-insert
    merge costs the same as a blind append)."""
    before = _part_mtimes(store, "T")
    src = _src(spark, [("idA", 1, "n"), ("idB", 2, "n")])
    out = store.merge_into("T", src, on=["identifier"])
    assert out["inserted"] == 2 and out["matched"] == 0
    after = _part_mtimes(store, "T")
    for part, files in before.items():
        assert files <= after.get(part, set()), f"bucket {part} lost files"
    assert store.read("T").count() == 202


def test_merge_cow_rewrites_only_matched_buckets(spark, store):
    """Copy-on-write touches only buckets containing matched keys."""
    before = _part_mtimes(store, "T")
    src = _src(spark, [("id5", 1, "u")])
    store.merge_into("T", src, on=["identifier"], when_not_matched="skip")
    after = _part_mtimes(store, "T")
    changed = [p for p in before if before[p] != after.get(p, set())]
    assert len(changed) == 1  # exactly the bucket holding id5


def test_merge_mor_appends_dv_not_rewrites(spark, store):
    """Merge-on-read must not remove any pre-existing data file — the
    old rows are masked by a DV sidecar, the new images appended."""
    before = _part_mtimes(store, "T")
    src = _src(spark, [("id5", 1, "u"), ("id100", 2, "u")])
    store.merge_into("T", src, on=["identifier"], merge_on_read=True)
    after = _part_mtimes(store, "T")
    for part, files in before.items():
        assert files <= after.get(part, set()), f"MOR rewrote bucket {part}"
    assert os.path.isdir(os.path.join(store.table_path("T"), "_dv"))
    df = store.read("T")
    assert df.count() == 200
    assert df.filter("identifier = 'id5'").first()["s"] == "u"


def test_merge_rejects_unknown_assignment_target(spark, store):
    """An update_assignments key that names a nonexistent (or key)
    column must raise up front — previously it was computed as
    __merge_<col> and silently dropped by the final select, so the
    merge 'succeeded' without applying the intended update."""
    src = _src(spark, [("id5", 500, "upd")])
    with pytest.raises(ValueError, match="vv"):
        store.merge_into(
            "T", src, on=["identifier"], update_assignments={"vv": F.lit(1)}
        )
    # assigning to a merge key is equally unapplyable
    with pytest.raises(ValueError, match="identifier"):
        store.merge_into(
            "T", src, on=["identifier"],
            update_assignments={"identifier": F.lit("x")},
        )


def test_merge_rejects_ambiguous_source(spark, store):
    src = _src(spark, [("id5", 1, "a"), ("id5", 2, "b")])
    with pytest.raises(ValueError, match="ambiguous"):
        store.merge_into("T", src, on=["identifier"])


def test_merge_rejects_unknown_source_column(spark, store):
    src = spark.createDataFrame([("id5", 1)], "identifier string, extra int")
    with pytest.raises(ValueError, match="evolve"):
        store.merge_into("T", src, on=["identifier"])


def test_merge_commit_logged_and_time_travels(spark, store):
    v0 = store.version("T")
    src = _src(spark, [("id5", 500, "u"), ("idN", 1, "n")])
    store.merge_into("T", src, on=["identifier"])
    v1 = store.version("T")
    assert v1 == v0 + 1
    rec = store.history("T")[-1]
    assert rec["op"] == "merge_into"
    assert rec["detail"]["updated"] == 1 and rec["detail"]["inserted"] == 1
    # time travel: the pre-merge version still reads the old rows
    old = store.read("T", version=v0)
    assert old.count() == 200
    assert old.filter("identifier = 'id5'").first()["v"] == 5


def test_merge_snapshot_reader_unaffected(spark, store):
    pinned = store.read("T")
    store.merge_into(
        "T", _src(spark, [("id5", 1, "u"), ("idN", 2, "n")]), on=["identifier"]
    )
    assert pinned.count() == 200  # planned pre-merge: no inserts visible
    assert pinned.filter("identifier = 'id5'").first()["s"] == "orig"


def test_merge_flat_table(spark, tmp_path):
    """Unbucketed (flat) tables merge too — full-rewrite CoW path."""
    s = GraphStore(spark, str(tmp_path / "f"), "kg", n_buckets=8)
    s.copy_into("F", _src(spark, [("a", 1, "x"), ("b", 2, "y")]))
    out = s.merge_into(
        "F", _src(spark, [("b", 20, "y2"), ("c", 3, "z")]), on=["identifier"]
    )
    assert out == {"matched": 1, "updated": 1, "deleted": 0, "inserted": 1}
    got = {r["identifier"]: r["v"] for r in s.read("F").collect()}
    assert got == {"a": 1, "b": 20, "c": 3}


# -- atomic delete_source + CDC apply_changes ---------------------------------


@pytest.mark.parametrize("mor", [False, True])
def test_merge_with_delete_source_single_commit(spark, store, mor):
    """Updates, inserts, and deletes land in ONE commit — the
    multi-clause MERGE shape CDC apply needs atomically."""
    v0 = store.version("T")
    src = _src(spark, [("id5", 500, "u"), ("idN", 1, "n")])
    dels = spark.createDataFrame([("id7",), ("idGONE",)], "identifier string")
    out = store.merge_into(
        "T", src, on=["identifier"], delete_source=dels, merge_on_read=mor
    )
    assert out == {"matched": 2, "updated": 1, "deleted": 1, "inserted": 1}
    assert store.version("T") == v0 + 1  # one commit for all three clauses
    df = store.read("T")
    assert df.count() == 200  # 200 - 1 del + 1 ins
    assert df.filter("identifier = 'id7'").count() == 0
    assert df.filter("identifier = 'id5'").first()["v"] == 500
    assert df.filter("identifier = 'idN'").count() == 1


def test_merge_rejects_key_in_both_clauses(spark, store):
    src = _src(spark, [("id5", 1, "u")])
    dels = spark.createDataFrame([("id5",)], "identifier string")
    with pytest.raises(ValueError, match="both source and delete_source"):
        store.merge_into("T", src, on=["identifier"], delete_source=dels)


@pytest.mark.parametrize("mor", [False, True])
def test_apply_changes_sequence_collapse(spark, store, mor):
    """Out-of-order CDC ops collapse to the highest sequence per key
    before touching the table; one atomic commit applies the batch."""
    from robosystems_spark.streaming.cdc import apply_changes

    feed = spark.createDataFrame(
        [
            # id5: upsert then a LATER delete — net delete
            ("id5", 111, "x", "upsert", 10),
            ("id5", 222, "y", "delete", 20),
            # id7: delete then a LATER upsert — net update
            ("id7", 0, "", "delete", 5),
            ("id7", 777, "w", "upsert", 6),
            # idNEW: two upserts — highest sequence wins
            ("idNEW", 1, "a", "upsert", 1),
            ("idNEW", 2, "b", "upsert", 2),
            # idGHOST: delete of a key the table never had — no-op
            ("idGHOST", 0, "", "delete", 1),
        ],
        "identifier string, v int, s string, op string, seq long",
    )
    v0 = store.version("T")
    out = apply_changes(
        store, "T", feed, keys=["identifier"], sequence_col="seq",
        merge_on_read=mor,
    )
    assert out["ops"] == 7 and out["winners"] == 4
    assert out["updated"] == 1 and out["deleted"] == 1 and out["inserted"] == 1
    assert store.version("T") == v0 + 1
    df = store.read("T")
    assert df.count() == 200
    assert df.filter("identifier = 'id5'").count() == 0
    assert df.filter("identifier = 'id7'").first()["v"] == 777
    assert df.filter("identifier = 'idNEW'").first()["s"] == "b"


def test_apply_changes_replay_is_idempotent(spark, store):
    """Replaying the same micro-batch lands the same state — the
    exactly-once contract for restarted CDC consumers."""
    from robosystems_spark.streaming.cdc import apply_changes

    feed = spark.createDataFrame(
        [("id3", 33, "r", "upsert", 1), ("id4", 0, "", "delete", 1)],
        "identifier string, v int, s string, op string, seq long",
    )
    apply_changes(store, "T", feed, keys=["identifier"], sequence_col="seq")
    before = sorted(map(tuple, store.read("T").collect()))
    apply_changes(store, "T", feed, keys=["identifier"], sequence_col="seq")
    assert sorted(map(tuple, store.read("T").collect())) == before


def test_apply_changes_delete_wins_sequence_tie(spark, store):
    from robosystems_spark.streaming.cdc import apply_changes

    feed = spark.createDataFrame(
        [("id9", 999, "z", "upsert", 7), ("id9", 0, "", "delete", 7)],
        "identifier string, v int, s string, op string, seq long",
    )
    apply_changes(store, "T", feed, keys=["identifier"], sequence_col="seq")
    assert store.read("T").filter("identifier = 'id9'").count() == 0


def test_apply_changes_null_shift_tie_is_deterministic(spark, store):
    """Two same-key same-sequence upserts whose value columns differ
    only in WHERE the null sits — (NULL,'a') vs ('a',NULL) — must
    resolve the same way on every replay.  concat_ws silently skips
    nulls, so before the null-explicit hash both rows concatenated to
    the same tiebreak digest and the winner was partition-order luck."""
    from robosystems_spark.streaming.cdc import apply_changes

    feed = spark.createDataFrame(
        [("idT", None, "a", "upsert", 3), ("idT", 97, None, "upsert", 3)],
        "identifier string, v int, s string, op string, seq long",
    )
    apply_changes(store, "T", feed, keys=["identifier"], sequence_col="seq")
    first = store.read("T").filter("identifier = 'idT'").collect()
    assert len(first) == 1
    winner = (first[0]["v"], first[0]["s"])
    # replay from scratch several times with shuffled input order: the
    # deterministic hash must pick the SAME row every time
    for _ in range(3):
        reordered = feed.orderBy(F.rand(seed=None)).repartition(4)
        apply_changes(
            store, "T", reordered, keys=["identifier"], sequence_col="seq"
        )
        row = store.read("T").filter("identifier = 'idT'").collect()[0]
        assert (row["v"], row["s"]) == winner
