"""The reference's OWN demo query corpus, verbatim.

Every query string in /root/reference/examples/sec_demo/
query_examples.py (15 queries: label-less stats, entity/report/fact
multi-hop chains, dimension/period rollups, taxonomy structure
traversals), executed against tables built by OUR pipelines
(build_xbrl_graph_frames + build_xbrl_taxonomy_frames) conformed to
the roboledger schema — the brief's "runs the reference's own test
queries" check, end-to-end from pipeline output.
"""

from __future__ import annotations

import re

import pytest

from robosystems_spark.cypher import CypherEngine
from robosystems_spark.pipelines import (
    build_xbrl_graph_frames,
    build_xbrl_taxonomy_frames,
)
from robosystems_spark.schema.models import conform_to_schema
from robosystems_spark.schema.roboledger import full_schema

DEMO_PATH = "/root/reference/examples/sec_demo/query_examples.py"


def _demo_queries() -> list[str]:
    src = open(DEMO_PATH).read()
    return [q.strip() for q in re.findall(r'"""(\s*MATCH.*?)"""', src, re.S)]


@pytest.fixture(scope="module")
def demo_engine(spark):
    facts = spark.createDataFrame(
        [
            ("0001", "Acme", "acc-1", "10-K", "2024-02-01", "us-gaap:Revenues",
             "uri:rev", "1000000", "0", "USD", "2023-01-01", "2023-12-31", None, None),
            ("0001", "Acme", "acc-1", "10-K", "2024-02-01", "us-gaap:Assets",
             "uri:assets", "5000000", "0", "USD", None, None, "2023-12-31", None),
            ("0001", "Acme", "acc-1", "10-K", "2024-02-01", "us-gaap:Revenues",
             "uri:rev", "600000", "0", "USD", "2023-01-01", "2023-12-31", None,
             {"uri:segment": "uri:us"}),
        ],
        "entity_cik string, entity_name string, accession string, form string, "
        "filing_date string, concept_qname string, concept_uri string, value string, "
        "decimals string, unit string, period_start string, period_end string, "
        "period_instant string, dimensions map<string,string>",
    )
    arcs = spark.createDataFrame(
        [
            ("acc-1", "http://acme.com/20231231", "http://acme.com/role/BS",
             None, "1001 - Statement - Balance Sheet",
             "http://www.xbrl.org/2003/arcrole/summation-item",
             "uri:assets", "uri:rev", 1.0, 1.0, None),
        ],
        "accession string, taxonomy_uri string, role_uri string, role_id string, "
        "role_definition string, arcrole string, parent_uri string, child_uri string, "
        "order_value double, weight double, preferred_label string",
    )
    frames = {**build_xbrl_graph_frames(facts)}
    tax = build_xbrl_taxonomy_frames(arcs)
    # merge Element frames; taxonomy frames otherwise new tables
    frames["Element"] = frames["Element"].unionByName(
        tax.pop("Element"), allowMissingColumns=True
    ).dropDuplicates(["identifier"])
    frames.update(tax)

    schema = full_schema()
    tables = {}
    for name, df in frames.items():
        try:
            node = schema.node(name)
            tables[name] = conform_to_schema(df, node.to_struct_type())
        except KeyError:
            tables[name] = df  # relationship frames keep (src, dst, ...)
    return CypherEngine(tables)


@pytest.mark.parametrize("idx", range(15))
def test_sec_demo_query_verbatim(demo_engine, idx):
    queries = _demo_queries()
    assert len(queries) == 15, "demo corpus changed size"
    df = demo_engine.query(queries[idx])
    rows = df.collect()  # must execute, schema resolvable, rows >= 0
    assert rows is not None
    # spot-verify the data-bearing ones
    q = queries[idx]
    if q.startswith("MATCH (n)\nWITH labels(n)"):
        counts = {tuple(r["label"]): r["count"] for r in rows}
        assert counts[("Fact",)] == 3
    if "ENTITY_HAS_REPORT" in q and "count(r)" in q:
        assert rows[0]["report_count"] == 1
    if "STRUCTURE_HAS_ASSOCIATION" in q and "calculation_weight" in q:
        assert rows and rows[0]["calculation_weight"] == 1.0
