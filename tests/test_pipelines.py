"""ETL pipeline tests: raw facts/transactions → graph frames →
GraphStore → views — the full ingestion-to-analytics slice
(SURVEY §3.3 upload→stage→materialize→query, §7.7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.pipelines import build_gl_frames, build_xbrl_graph_frames
from robosystems_spark.pipelines.gl import GL_NODE_TABLES, GL_REL_TABLES
from robosystems_spark.pipelines.xbrl import NODE_TABLES, REL_TABLES
from robosystems_spark.sources.materialize import GraphStore
from robosystems_spark.views import fact_query, trial_balance


@pytest.fixture(scope="module")
def raw_facts(spark):
    rows = [
        # (cik, name, accession, form, filing_date, qname, uri, value,
        #  decimals, unit, p_start, p_end, p_instant, dims)
        ("0001", "Acme", "acc-1", "10-K", "2024-02-01", "us-gaap:Revenues",
         "uri:rev", "1000000", "0", "USD", "2023-01-01", "2023-12-31", None, None),
        ("0001", "Acme", "acc-1", "10-K", "2024-02-01", "us-gaap:Assets",
         "uri:assets", "5000000", "0", "USD", None, None, "2023-12-31", None),
        ("0001", "Acme", "acc-1", "10-K", "2024-02-01", "us-gaap:Revenues",
         "uri:rev", "600000", "0", "USD", "2023-01-01", "2023-12-31", None,
         {"uri:segment": "uri:us"}),
        ("0001", "Acme", "acc-1", "10-K", "2024-02-01", "us-gaap:Description",
         "uri:desc", "Z" * 3000, None, None, "2023-01-01", "2023-12-31", None, None),
    ]
    schema = (
        "entity_cik string, entity_name string, accession string, form string, "
        "filing_date string, concept_qname string, concept_uri string, value string, "
        "decimals string, unit string, period_start string, period_end string, "
        "period_instant string, dimensions map<string,string>"
    )
    return spark.createDataFrame(rows, schema)


def test_xbrl_frames_shapes_and_ids(spark, raw_facts):
    frames = build_xbrl_graph_frames(raw_facts)
    assert set(frames) == set(NODE_TABLES + REL_TABLES)
    assert frames["Entity"].count() == 1
    assert frames["Report"].count() == 1
    assert frames["Element"].count() == 5  # 3 concepts + axis + member elements
    assert frames["Fact"].count() == 4
    assert frames["FactDimension"].count() == 1
    # deterministic: rebuilding produces identical fact IDs
    again = build_xbrl_graph_frames(raw_facts)
    ids1 = sorted(r["identifier"] for r in frames["Fact"].collect())
    ids2 = sorted(r["identifier"] for r in again["Fact"].collect())
    assert ids1 == ids2
    # numeric scaling: values parse to numeric_value, text stays null
    facts = {r["value"]: r for r in frames["Fact"].collect() if r["value"] is not None}
    assert facts["1000000"]["numeric_value"] == 1000000.0
    assert facts["1000000"]["fact_type"] == "Numeric"
    assert facts["Z" * 3000]["fact_type"] == "Nonnumeric"


def test_xbrl_externalization(spark, raw_facts, tmp_path):
    frames = build_xbrl_graph_frames(raw_facts, externalize_store=str(tmp_path / "store"))
    vals = [r["value"] for r in frames["Fact"].collect()]
    assert any(v and v.startswith("external://") for v in vals)
    assert all(v is None or len(v) < 2048 for v in vals)


def test_xbrl_to_fact_query_end_to_end(spark, raw_facts, tmp_path):
    frames = build_xbrl_graph_frames(raw_facts)
    store = GraphStore(spark, str(tmp_path / "graphs"), "sec_kg")
    store.materialize(frames, node_tables=NODE_TABLES, rel_tables=REL_TABLES)
    tables = {t: store.read(t) for t in store.tables()}
    # dimensionless default: the segmented revenue fact is excluded;
    # the unit-less text fact also drops (FACT_HAS_UNIT is an inner
    # MATCH in the reference query too)
    out = fact_query(tables).collect()
    assert len(out) == 2
    vals = {r["element_name"]: r["numeric_value"] for r in out if r["numeric_value"]}
    assert vals == {"Revenues": 1000000.0, "Assets": 5000000.0}
    # requesting the axis flips the filter: only the segmented fact
    dim_out = fact_query(tables, requested_dimensions=["segment"]).collect()
    assert len(dim_out) == 1
    assert dim_out[0]["numeric_value"] == 600000.0
    assert dim_out[0]["dimension_axis"] == "segment"
    assert dim_out[0]["dimension_member"] == "us"


@pytest.fixture(scope="module")
def gl_rows(spark):
    rows = [
        ("t-1", "2024-01-10", "Invoice", "USD", "e1",
         [("Cash", "asset", 100.0, 0.0), ("Revenue", "revenue", 0.0, 100.0)]),
        ("t-2", "2024-02-10", "Rent", "USD", "e1",
         [("Rent expense", "expense", 50.0, 0.0), ("Cash", "asset", 0.0, 50.0)]),
    ]
    schema = (
        "txn_number string, date string, description string, currency string, "
        "entity_id string, entries array<struct<account string, account_class string, "
        "debit double, credit double>>"
    )
    return spark.createDataFrame(rows, schema)


def test_gl_frames_to_trial_balance(spark, gl_rows, tmp_path):
    frames = build_gl_frames(gl_rows)
    store = GraphStore(spark, str(tmp_path / "graphs"), "gl_kg")
    store.materialize(frames, node_tables=GL_NODE_TABLES, rel_tables=GL_REL_TABLES)
    tables = {t: store.read(t) for t in store.tables()}
    tables["Entity"] = spark.createDataFrame([("e1", "Acme")], ["identifier", "name"])
    tb = {r["element_name"]: r for r in trial_balance(tables).collect()}
    assert tb["Cash"]["net_balance"] == 50.0
    assert tb["Revenue"]["net_balance"] == -100.0
    assert tb["Rent expense"]["net_balance"] == 50.0
    # classification derived from account_class
    assert tb["Cash"]["element_balance"] == "debit"
    assert tb["Revenue"]["element_balance"] == "credit"


def test_gl_unbalanced_rejected(spark):
    bad = spark.createDataFrame(
        [("t-x", "2024-01-01", "Oops", "USD", "e1",
          [("Cash", "asset", 100.0, 0.0), ("Revenue", "revenue", 0.0, 99.0)])],
        "txn_number string, date string, description string, currency string, "
        "entity_id string, entries array<struct<account string, account_class string, "
        "debit double, credit double>>",
    )
    with pytest.raises(ValueError, match="Unbalanced"):
        build_gl_frames(bad)
