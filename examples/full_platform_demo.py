#!/usr/bin/env python3
"""End-to-end platform demo (the reference's living-demo style,
SURVEY §5): synthesize a small ledger → custom schema → staged files →
materialized graph → Cypher queries → trial balance → saved report.

Run: python examples/full_platform_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robosystems_spark import CypherEngine, CypherGate, GraphStore, QueryService, get_spark
from robosystems_spark.pipelines import build_gl_frames
from robosystems_spark.pipelines.gl import GL_NODE_TABLES, GL_REL_TABLES
from robosystems_spark.schema.extensions import load_schema
from robosystems_spark.views import trial_balance
from robosystems_spark.views.save_view import save_report


def main() -> None:
    spark = get_spark(app_name="full-platform-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="robosystems_demo_")

    # 1. schema: base + roboledger composition
    schema = load_schema(["roboledger"])
    print(f"schema: {len(schema.nodes)} node tables, {len(schema.relationships)} rel tables")

    # 2. raw journal → graph frames (ETL pipeline)
    journal = spark.createDataFrame(
        [
            ("t-1", "2024-01-10", "Invoice #1001", "USD", "acme",
             [("Cash", "asset", 1200.0, 0.0), ("Revenue", "revenue", 0.0, 1200.0)]),
            ("t-2", "2024-02-02", "Office rent", "USD", "acme",
             [("Rent expense", "expense", 800.0, 0.0), ("Cash", "asset", 0.0, 800.0)]),
            ("t-3", "2024-02-20", "Invoice #1002", "USD", "acme",
             [("Cash", "asset", 500.0, 0.0), ("Revenue", "revenue", 0.0, 500.0)]),
        ],
        "txn_number string, date string, description string, currency string, "
        "entity_id string, entries array<struct<account string, account_class string, "
        "debit double, credit double>>",
    )
    frames = build_gl_frames(journal)

    # 3. materialize (nodes before relationships, anti-join dedup)
    store = GraphStore(spark, work, "acme_kg")
    loaded = store.materialize(frames, GL_NODE_TABLES, GL_REL_TABLES)
    store.copy_into(
        "Entity",
        spark.createDataFrame([("acme", "Acme Corp")], ["identifier", "name"]),
        ["identifier"],
    )
    print("materialized:", loaded)

    # 4. Cypher through the full serving path
    tables = {t: store.read(t) for t in store.tables()}
    service = QueryService(CypherGate(CypherEngine(tables)))
    result = service.execute(
        "MATCH (e:Entity)-[:ENTITY_HAS_TRANSACTION]->(t:Transaction) "
        "WHERE t.date >= $start "
        "WITH e, count(t) AS txns, sum(t.amount) AS volume "
        "RETURN e.name AS entity, txns, volume",
        params={"start": "2024-01-01"},
    )
    for chunk in result.chunks:
        print("cypher result:", chunk)

    # 5. analytics view + report writeback
    tb = trial_balance(tables)
    print("trial balance:")
    for row in tb.collect():
        print(f"  {row['element_name']:<14} debits={row['total_debits']:>8.2f} "
              f"credits={row['total_credits']:>8.2f} net={row['net_balance']:>8.2f}")
    counts = save_report(store, tb, "rep-fy24", "Trial Balance FY24")
    print("saved report:", counts)

    # 6. provision a brand-new entity graph (id grammar + schema install
    #    + initial Entity row), then audit its mutation history through
    #    the gated CALL surface
    from robosystems_spark.queryapi.procedures import execute_call
    from robosystems_spark.sources.provisioning import EntityGraphProvisioner

    info = EntityGraphProvisioner(spark, work).provision(
        {"name": "Acme Subsidiary LLC"}, extensions=["roboledger"]
    )
    print(f"provisioned {info['graph_id']}: {info['tables_created']} tables, "
          f"entity {info['entity_id']}")
    sub_store = GraphStore(spark, work, info["graph_id"])
    hist = execute_call(
        spark, "CALL table_history('Entity') RETURN v, op", store=sub_store
    )
    print("Entity commit log:", [(r["v"], r["op"]) for r in hist.collect()])
    spark.stop()


if __name__ == "__main__":
    main()
