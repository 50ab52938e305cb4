#!/usr/bin/env python3
"""SEC-shaped ingestion demo: raw XBRL instance BYTES through the
dependency-ordered asset graph to queryable fact frames — the
reference's Dagster pipeline (download -> process -> stage ->
materialize, ref dagster/assets/sec.py) re-expressed with
pipelines.assets + the stdlib XBRL parser, no Arelle, no scheduler.

Run: python examples/xbrl_assets_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robosystems_spark import GraphStore, get_spark
from robosystems_spark.pipelines import (
    AssetGraph,
    build_xbrl_graph_frames,
    raw_facts_from_filings,
)
from robosystems_spark.pipelines.xbrl import NODE_TABLES, REL_TABLES
from robosystems_spark.views.fact_query import fact_query

_INSTANCE = b"""<?xml version="1.0" encoding="utf-8"?>
<xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance"
            xmlns:dei="http://xbrl.sec.gov/dei/2023"
            xmlns:us-gaap="http://fasb.org/us-gaap/2023">
  <xbrli:context id="d2023">
    <xbrli:entity>
      <xbrli:identifier scheme="http://www.sec.gov/CIK">0000777001</xbrli:identifier>
    </xbrli:entity>
    <xbrli:period>
      <xbrli:startDate>2023-01-01</xbrli:startDate>
      <xbrli:endDate>2023-12-31</xbrli:endDate>
    </xbrli:period>
  </xbrli:context>
  <xbrli:unit id="usd"><xbrli:measure>iso4217:USD</xbrli:measure></xbrli:unit>
  <dei:EntityRegistrantName contextRef="d2023">Demo Filer Inc</dei:EntityRegistrantName>
  <dei:DocumentType contextRef="d2023">10-K</dei:DocumentType>
  <us-gaap:Revenues contextRef="d2023" unitRef="usd" decimals="-3">4200000</us-gaap:Revenues>
  <us-gaap:CostOfRevenue contextRef="d2023" unitRef="usd" decimals="-3">2500000</us-gaap:CostOfRevenue>
</xbrli:xbrl>
"""


def main() -> None:
    spark = get_spark(app_name="xbrl-assets-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="xbrl_assets_demo_")
    g = AssetGraph(spark=spark, max_concurrent=2)

    @g.asset(retries=1)
    def raw_filings(ctx):
        """The download stage — here a literal byte payload; in
        production an EDGAR fetch writing to object storage."""
        filings = ctx.spark.createDataFrame(
            [("acc-0000777001-24-000001", "2024-02-15", bytearray(_INSTANCE))],
            "accession string, filing_date string, content binary",
        )
        path = f"{work}/raw_filings"
        filings.write.mode("overwrite").parquet(path)
        return path

    @g.asset(deps=[raw_filings])
    def parsed_facts(ctx):
        """Distributed parse: bytes -> RAW_FACT_SCHEMA rows inside
        mapInPandas (poison-row error contract)."""
        filings = ctx.spark.read.parquet(ctx.upstream["raw_filings"])
        path = f"{work}/raw_facts"
        raw_facts_from_filings(filings).write.mode("overwrite").parquet(path)
        return path

    @g.asset(deps=[parsed_facts])
    def graph_materialized(ctx):
        """Fact rows -> roboledger node/relationship frames ->
        GraphStore (the sec_graph_materialized stage)."""
        raw = ctx.spark.read.parquet(ctx.upstream["parsed_facts"])
        frames = build_xbrl_graph_frames(raw)
        store = GraphStore(ctx.spark, f"{work}/graphs", "sec_demo")
        store.materialize(frames, node_tables=NODE_TABLES, rel_tables=REL_TABLES)
        return f"{work}/graphs"

    results = g.materialize(select=["graph_materialized"])
    for name in ("raw_filings", "parsed_facts", "graph_materialized"):
        r = results[name]
        print(f"asset {name}: {r.status} ({r.seconds}s, {r.attempts} attempt)")

    store = GraphStore(spark, results["graph_materialized"].value, "sec_demo")
    tables = {t: store.read(t) for t in store.tables()}
    print("\nfact query (dimensionless default):")
    for row in fact_query(tables).collect():
        print(
            f"  {row['element_name']:>15}: {row['numeric_value']:>12,.0f} "
            f"{row['unit_value']} [{row['period_start']}..{row['period_end']}]"
        )
    spark.stop()


if __name__ == "__main__":
    main()
