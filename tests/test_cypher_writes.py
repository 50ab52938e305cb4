"""Cypher write executor: the reference's verbatim save_view write
statements (CREATE report/fact + relationship wiring, SET metadata
update, DETACH DELETE cascade, MERGE upsert) executed against a
PK-bucket-partitioned GraphStore (SURVEY §2.11 M1-M4 via Cypher)."""

from __future__ import annotations

import pytest

from robosystems_spark.cypher.writes import CypherWriteError, CypherWriteExecutor
from robosystems_spark.sources.materialize import GraphStore


@pytest.fixture()
def store(spark, tmp_path):
    s = GraphStore(spark, str(tmp_path / "g"), "kg0123456789abcdef_dev")
    s.copy_into(
        "Element",
        spark.createDataFrame([("e1", "uri:rev")], ["identifier", "uri"]),
        primary_keys=["identifier"],
    )
    s.copy_into(
        "Entity",
        spark.createDataFrame([("ent1", "Acme")], ["identifier", "name"]),
        primary_keys=["identifier"],
    )
    return s


def test_create_report_verbatim(spark, store):
    """save_view.py:154-168 shape."""
    wx = CypherWriteExecutor(store)
    stats = wx.execute(
        """
        CREATE (r:Report {
            identifier: $report_id,
            name: $name,
            uri: $uri,
            report_date: $report_date,
            period_end_date: $period_end_date,
            updated_at: $updated_at,
            processed: true,
            failed: false
        })
        RETURN r.identifier as report_id
        """,
        {
            "report_id": "rep-1", "name": "10-K - Acme", "uri": "uri:rep1",
            "report_date": "2023-12-31", "period_end_date": "2023-12-31",
            "updated_at": "t0",
        },
    )
    assert stats["nodes_created"] == 1
    row = store.read("Report").first()
    assert row["identifier"] == "rep-1" and row["processed"] is True


def test_create_fact_with_edges_verbatim(spark, store):
    """save_view.py:225-243 shape: MATCH-bound vars + 3 edge CREATEs."""
    wx = CypherWriteExecutor(store)
    wx.execute(
        "CREATE (r:Report {identifier: $id, name: $n})", {"id": "rep-1", "n": "x"}
    )
    stats = wx.execute(
        """
        MATCH (r:Report {identifier: $report_id})
        MATCH (e:Element {uri: $element_uri})
        MATCH (ent:Entity {identifier: $entity_id})
        CREATE (f:Fact {
            identifier: $fact_id,
            uri: $uri,
            value: $value,
            numeric_value: $numeric_value,
            fact_type: $fact_type,
            decimals: '2'
        })
        CREATE (r)-[:REPORT_HAS_FACT]->(f)
        CREATE (f)-[:FACT_HAS_ELEMENT]->(e)
        CREATE (f)-[:FACT_HAS_ENTITY]->(ent)
        RETURN f.identifier as fact_id
        """,
        {
            "report_id": "rep-1", "element_uri": "uri:rev", "entity_id": "ent1",
            "fact_id": "fact-1", "uri": "uri:f1", "value": "100",
            "numeric_value": 100.0, "fact_type": "Numeric",
        },
    )
    assert stats == {
        "nodes_created": 1, "relationships_created": 3,
        "properties_set": 0, "nodes_deleted": 0,
    }
    assert store.read("REPORT_HAS_FACT").first().asDict() == {
        "src": "rep-1", "dst": "fact-1"
    }
    assert store.read("FACT_HAS_ELEMENT").first()["dst"] == "e1"


def test_set_update_verbatim_and_new_property(spark, store):
    """save_view.py:190-196 shape; SET may add a new property."""
    wx = CypherWriteExecutor(store)
    wx.execute("CREATE (r:Report {identifier: $id, name: $n})", {"id": "rep-1", "n": "old"})
    stats = wx.execute(
        """
        MATCH (r:Report {identifier: $report_id})
        SET r.name = $name,
            r.updated_at = $updated_at
        RETURN r.identifier as report_id
        """,
        {"report_id": "rep-1", "name": "new", "updated_at": "t2"},
    )
    assert stats["properties_set"] == 2
    row = store.read("Report").filter("identifier='rep-1'").first()
    assert row["name"] == "new" and row["updated_at"] == "t2"


def test_detach_delete_cascades_edges(spark, store):
    """save_view.py:121-128 shape."""
    wx = CypherWriteExecutor(store)
    wx.execute("CREATE (r:Report {identifier: $id, name: $n})", {"id": "rep-1", "n": "x"})
    wx.execute(
        """
        MATCH (r:Report {identifier: $rid})
        MATCH (e:Element {uri: $uri})
        CREATE (f:Fact {identifier: $fid, value: $v})
        CREATE (r)-[:REPORT_HAS_FACT]->(f)
        CREATE (f)-[:FACT_HAS_ELEMENT]->(e)
        """,
        {"rid": "rep-1", "uri": "uri:rev", "fid": "fact-1", "v": "100"},
    )
    stats = wx.execute(
        """
        MATCH (r:Report {identifier: $report_id})-[:REPORT_HAS_FACT]->(f:Fact)
        DETACH DELETE f
        """,
        {"report_id": "rep-1"},
    )
    assert stats["nodes_deleted"] == 1
    assert store.read("Fact").count() == 0
    assert store.read("REPORT_HAS_FACT").count() == 0
    assert store.read("FACT_HAS_ELEMENT").count() == 0
    # the report itself survives
    assert store.read("Report").count() == 1


def test_merge_upserts_once(spark, store):
    wx = CypherWriteExecutor(store)
    s1 = wx.execute("MERGE (r:Report {identifier: $id, name: $n})", {"id": "r1", "n": "a"})
    s2 = wx.execute("MERGE (r:Report {identifier: $id, name: $n})", {"id": "r1", "n": "a"})
    s3 = wx.execute("MERGE (r:Report {identifier: $id, name: $n})", {"id": "r2", "n": "b"})
    assert (s1["nodes_created"], s2["nodes_created"], s3["nodes_created"]) == (1, 0, 1)
    assert store.read("Report").count() == 2


def test_write_guards(spark, store):
    wx = CypherWriteExecutor(store)
    with pytest.raises(CypherWriteError, match="Not a write"):
        wx.execute("MATCH (e:Element) RETURN e.uri AS u")
    with pytest.raises(CypherWriteError, match="literals or \\$params"):
        wx.execute("CREATE (r:Report {identifier: $id, name: upper($id)})", {"id": "x"})
    with pytest.raises(CypherWriteError, match="Unbound"):
        wx.execute("CREATE (a)-[:REL]->(b)")


def test_gate_dispatches_writes_on_subgraph(spark, store):
    from robosystems_spark.cypher import CypherEngine
    from robosystems_spark.queryapi.cypher_gate import CypherGate, CypherGateError

    engine = CypherEngine({"Element": store.read("Element")})
    dev = CypherGate(
        engine, graph_id="kg0123456789abcdef_dev", store=store
    )
    out = dev.query(
        "CREATE (r:Report {identifier: $id, name: $n})", {"id": "rep-9", "n": "x"}
    ).first()
    assert out["nodes_created"] == 1
    assert store.read("Report").filter("identifier='rep-9'").count() == 1

    # a writable gate WITHOUT a store refuses cleanly
    no_store = CypherGate(engine, graph_id="kg0123456789abcdef_dev")
    with pytest.raises(CypherGateError, match="no GraphStore"):
        no_store.query("CREATE (r:Report {identifier: 'z'})")


def test_merge_then_set_plaid_upsert_shape(spark, store):
    """The Plaid transaction upsert (adapters/plaid/processors/
    transactions.py:205-215): MERGE on identifier, then SET props."""
    wx = CypherWriteExecutor(store)
    q = """
        MERGE (t:Transaction {identifier: $identifier})
        SET t.plaid_transaction_id = $transaction_id,
            t.amount = $amount,
            t.name = $name,
            t.pending = $pending
        RETURN t
        """
    p1 = {"identifier": "u1", "transaction_id": "pt-1", "amount": 12.5,
          "name": "Coffee", "pending": False}
    s1 = wx.execute(q, p1)
    assert s1["nodes_created"] == 1 and s1["properties_set"] == 4
    # re-run with updated amount: upsert updates, does not duplicate
    s2 = wx.execute(q, {**p1, "amount": 14.0})
    assert s2["nodes_created"] == 0
    rows = store.read("Transaction").collect()
    assert len(rows) == 1 and rows[0]["amount"] == 14.0


def test_merge_relationship_between_bound_nodes(spark, store):
    """Verbatim connection-link idiom (operations/
    connection_service.py): MATCH two nodes, MERGE an edge between
    them — idempotent on re-run."""
    store.copy_into(
        "Connection",
        spark.createDataFrame(
            [("conn-1", "plaid")], ["identifier", "provider"]
        ),
        primary_keys=["identifier"],
    )
    wx = CypherWriteExecutor(store)
    q = """
        MATCH (c:Entity {identifier: $entity_id})
        MATCH (conn:Connection {identifier: $connection_id})
        MERGE (c)-[:HAS_CONNECTION]->(conn)
        """
    p = {"entity_id": "ent1", "connection_id": "conn-1"}
    s1 = wx.execute(q, p)
    assert s1["relationships_created"] == 1
    s2 = wx.execute(q, p)  # MERGE again: no duplicate edge
    assert s2["relationships_created"] == 0
    edges = store.read("HAS_CONNECTION").collect()
    assert len(edges) == 1
    assert (edges[0]["src"], edges[0]["dst"]) == ("ent1", "conn-1")


def test_unwind_batch_merge_set_plus_equals(spark, store):
    """Verbatim bulk-load idiom (graph_api/backends/neo4j.py:338-341):
    UNWIND a parameter batch, MERGE on identifier, SET n += row —
    executed as ONE distributed upsert, not a per-row loop."""
    wx = CypherWriteExecutor(store)
    q = """
        UNWIND $batch as row
        MERGE (n:Account {identifier: row.identifier})
        SET n += row
        RETURN count(n) as count
        """
    batch1 = [
        {"identifier": "a1", "name": "Cash", "balance": 100.0},
        {"identifier": "a2", "name": "AR", "balance": 50.0},
    ]
    s1 = wx.execute(q, {"batch": batch1})
    assert s1["nodes_created"] == 2
    # second batch: one update (a2 balance), one insert (a3)
    batch2 = [
        {"identifier": "a2", "name": "AR", "balance": 75.0},
        {"identifier": "a3", "name": "AP", "balance": -20.0},
    ]
    s2 = wx.execute(q, {"batch": batch2})
    assert s2["nodes_created"] == 1
    rows = {r["identifier"]: r for r in store.read("Account").collect()}
    assert set(rows) == {"a1", "a2", "a3"}
    assert rows["a2"]["balance"] == 75.0 and rows["a1"]["balance"] == 100.0


def test_set_plus_equals_map_param(spark, store):
    """Standalone SET n += $props merges map keys onto matched nodes."""
    wx = CypherWriteExecutor(store)
    wx.execute(
        "MATCH (e:Entity {identifier: 'ent1'}) SET e += $props",
        {"props": {"name": "Acme Corp", "ticker": "ACME"}},
    )
    row = store.read("Entity").filter("identifier='ent1'").first()
    assert row["name"] == "Acme Corp" and row["ticker"] == "ACME"
