"""View-layer numeric-correctness tests, modeled on the reference's
test_element_mapping.py / test_fact_grid_builder.py golden assertions
and the FIXTURES.md accounting + SEC fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.views import (
    ElementAssociation,
    MappingStructure,
    apply_element_mapping,
    build_fact_grid,
    fact_query,
    trial_balance,
)


@pytest.fixture(scope="module")
def gl_tables(spark):
    """Accounting fixture: 1 entity, 2 transactions, 4 line items, 3 elements."""
    mk = spark.createDataFrame
    return {
        "Entity": mk([("e1", "Acme", "company", "active")],
                     ["identifier", "name", "entity_type", "status"]),
        "Element": mk(
            [
                ("cash", "uri:cash", "Cash", "asset", "debit", "instant"),
                ("rev", "uri:rev", "Revenue", "revenue", "credit", "duration"),
                ("exp", "uri:exp", "Expenses", "expense", "debit", "duration"),
            ],
            ["identifier", "uri", "name", "classification", "balance", "period_type"],
        ),
        "Transaction": mk(
            [
                ("t1", 100.0, "2024-01-10"),
                ("t2", 50.0, "2024-02-10"),
            ],
            ["identifier", "amount", "date"],
        ),
        "LineItem": mk(
            [
                ("l1", 100.0, 0.0),   # t1: debit cash
                ("l2", 0.0, 100.0),   # t1: credit revenue
                ("l3", 50.0, 0.0),    # t2: debit expenses
                ("l4", 0.0, 50.0),    # t2: credit cash
            ],
            ["identifier", "debit_amount", "credit_amount"],
        ),
        "ENTITY_HAS_TRANSACTION": mk([("e1", "t1"), ("e1", "t2")], ["src", "dst"]),
        "TRANSACTION_HAS_LINE_ITEM": mk(
            [("t1", "l1"), ("t1", "l2"), ("t2", "l3"), ("t2", "l4")], ["src", "dst"]
        ),
        "LINE_ITEM_RELATES_TO_ELEMENT": mk(
            [("l1", "cash"), ("l2", "rev"), ("l3", "exp"), ("l4", "cash")], ["src", "dst"]
        ),
    }


def test_trial_balance_golden(spark, gl_tables):
    tb = trial_balance(gl_tables).collect()
    rows = {r["element_id"]: r for r in tb}
    assert rows["cash"]["total_debits"] == 100.0
    assert rows["cash"]["total_credits"] == 50.0
    assert rows["cash"]["net_balance"] == 50.0
    assert rows["rev"]["net_balance"] == -100.0
    assert rows["exp"]["net_balance"] == 50.0
    # double-entry invariant: global debits == credits
    assert sum(r["total_debits"] for r in tb) == sum(r["total_credits"] for r in tb)
    # ordered by element name
    assert [r["element_name"] for r in tb] == ["Cash", "Expenses", "Revenue"]


def test_trial_balance_date_filter(spark, gl_tables):
    tb = trial_balance(gl_tables, period_start="2024-02-01", period_end="2024-12-31")
    rows = {r["element_id"]: r for r in tb.collect()}
    assert set(rows) == {"cash", "exp"}  # only t2 in range
    assert rows["cash"]["net_balance"] == -50.0


@pytest.fixture(scope="module")
def fact_tables(spark):
    """SEC fixture: 3 facts — f1 dimensionless, f2 with a Segment axis,
    f3 dimensionless with a different period."""
    mk = spark.createDataFrame
    elem_cols = ["identifier", "uri", "name", "classification", "period_type"]
    return {
        "Fact": mk(
            [("f1", 100.0), ("f2", 40.0), ("f3", 7.0)],
            ["identifier", "numeric_value"],
        ),
        "Element": mk(
            [
                ("rev", "uri:rev", "Revenue", "revenue", "duration"),
                ("seg_axis", "uri:seg", "Segment", "axis", "duration"),
                ("seg_us", "uri:us", "US", "member", "duration"),
            ],
            elem_cols,
        ),
        "Period": mk(
            [
                ("p1", "2024-01-01", "2024-12-31", 2024),
                ("p2", "2023-01-01", "2023-12-31", 2023),
            ],
            ["identifier", "start_date", "end_date", "fiscal_year"],
        ),
        "Unit": mk([("usd", "USD")], ["identifier", "value"]),
        "Entity": mk([("e1", "Acme")], ["identifier", "name"]),
        "FactDimension": mk(
            [("fd1", "uri:seg", "uri:us", True)],
            ["identifier", "axis_uri", "member_uri", "is_explicit"],
        ),
        "FACT_HAS_ELEMENT": mk([("f1", "rev"), ("f2", "rev"), ("f3", "rev")], ["src", "dst"]),
        "FACT_HAS_PERIOD": mk([("f1", "p1"), ("f2", "p1"), ("f3", "p2")], ["src", "dst"]),
        "FACT_HAS_UNIT": mk([("f1", "usd"), ("f2", "usd"), ("f3", "usd")], ["src", "dst"]),
        "FACT_HAS_ENTITY": mk([("f1", "e1"), ("f2", "e1"), ("f3", "e1")], ["src", "dst"]),
        "FACT_HAS_DIMENSION": mk([("f2", "fd1")], ["src", "dst"]),
        "FACT_DIMENSION_AXIS_ELEMENT": mk([("fd1", "seg_axis")], ["src", "dst"]),
        "FACT_DIMENSION_MEMBER_ELEMENT": mk([("fd1", "seg_us")], ["src", "dst"]),
    }


def test_fact_query_excludes_dimensional_by_default(spark, fact_tables):
    out = fact_query(fact_tables).collect()
    # f2 (dimensional) must be excluded; f1, f3 kept with NULL dims
    assert sorted(r["fact_id"] for r in out) == ["f1", "f3"]
    assert all(r["dimension_axis"] is None for r in out)


def test_fact_query_requested_dimensions_only(spark, fact_tables):
    out = fact_query(fact_tables, requested_dimensions=["Segment"]).collect()
    assert [r["fact_id"] for r in out] == ["f2"]
    assert out[0]["dimension_axis"] == "Segment"
    assert out[0]["dimension_member"] == "US"


def test_fact_query_period_and_entity_filters(spark, fact_tables):
    out = fact_query(fact_tables, period_start="2024-01-01", entity_id="e1").collect()
    assert sorted(r["fact_id"] for r in out) == ["f1"]
    assert fact_query(fact_tables, entity_id="nope").count() == 0


@pytest.fixture(scope="module")
def mapping_facts(spark):
    """Fact frame for roll-up tests: two source elements over two periods."""
    return spark.createDataFrame(
        [
            ("elA", "uri:A", 10.0, "2024-03-31", "2024-01-01", "e1"),
            ("elB", "uri:B", 30.0, "2024-03-31", "2024-01-01", "e1"),
            ("elA", "uri:A", 20.0, "2024-06-30", "2024-04-01", "e1"),
            ("elB", "uri:B", 40.0, "2024-06-30", "2024-04-01", "e1"),
        ],
        ["element_id", "element_uri", "numeric_value", "period_end", "period_start", "entity_id"],
    )


def _mapping(method, wa=1.0, wb=1.0):
    return MappingStructure(
        associations=[
            ElementAssociation("tgt:Total", "uri:A", wa, method),
            ElementAssociation("tgt:Total", "uri:B", wb, method),
        ]
    )


@pytest.mark.parametrize(
    "method, kwargs, expected",
    [
        ("sum", {}, {"2024-03-31": 40.0, "2024-06-30": 60.0}),
        ("calculated", {}, {"2024-03-31": 40.0, "2024-06-30": 60.0}),
        ("average", {}, {"2024-03-31": 20.0, "2024-06-30": 30.0}),
        # weighted: (10*2 + 30*1)/3 and (20*2 + 40*1)/3
        ("weighted_average", {"wa": 2.0, "wb": 1.0},
         {"2024-03-31": 50.0 / 3.0, "2024-06-30": 80.0 / 3.0}),
        ("first", {}, {"2024-03-31": 10.0, "2024-06-30": 20.0}),  # elA sorts first
        ("last", {}, {"2024-03-31": 30.0, "2024-06-30": 40.0}),
    ],
)
def test_element_mapping_methods(spark, mapping_facts, method, kwargs, expected):
    out = apply_element_mapping(mapping_facts, _mapping(method, **kwargs)).collect()
    got = {r["period_end"]: r["numeric_value"] for r in out}
    assert got.keys() == expected.keys()
    for k in expected:
        assert got[k] == pytest.approx(expected[k])
    assert all(r["element_id"] == "tgt:Total" for r in out)
    assert all(r["element_name"] == "Total" for r in out)


def test_element_mapping_zero_weight_returns_zero(spark, mapping_facts):
    out = apply_element_mapping(
        mapping_facts, _mapping("weighted_average", wa=0.0, wb=0.0)
    ).collect()
    assert all(r["numeric_value"] == 0.0 for r in out)


def test_element_mapping_unknown_method_raises(spark, mapping_facts):
    with pytest.raises(ValueError, match="Unknown aggregation method"):
        apply_element_mapping(mapping_facts, _mapping("median"))


def test_fact_grid_pivot(spark, mapping_facts):
    grid = build_fact_grid(
        mapping_facts.withColumnRenamed("element_id", "element_name_src").withColumn(
            "element_name", F.col("element_name_src")
        ),
        index_col="element_name",
        column_col="period_end",
        value_col="numeric_value",
        column_values=["2024-03-31", "2024-06-30"],
        fill_value=0.0,
    )
    rows = {r["element_name"]: r for r in grid.collect()}
    assert rows["elA"]["2024-03-31"] == 10.0
    assert rows["elB"]["2024-06-30"] == 40.0
    assert list(grid.columns) == ["element_name", "2024-03-31", "2024-06-30"]


def test_save_view_roundtrip(spark, gl_tables, tmp_path):
    """Report writeback: save a trial balance as Report+Facts, update
    metadata, cascade-delete (save_view.py M1-M4 semantics)."""
    from robosystems_spark.sources.materialize import GraphStore
    from robosystems_spark.views.save_view import (
        delete_report,
        save_report,
        update_report_metadata,
    )

    tb = trial_balance(gl_tables)
    store = GraphStore(spark, str(tmp_path / "graphs"), "views_kg")
    counts = save_report(store, tb, "rep-1", "Trial Balance FY24",
                         period_end="2024-12-31")
    assert counts["Fact"] == 3 and counts["Report"] == 1
    assert store.read("REPORT_HAS_FACT").count() == 3
    rep = store.read("Report").first()
    # reference saved-view Report shape (save_view.py:156-174)
    assert rep["name"] == "Trial Balance FY24"
    assert rep["uri"] == "internal:rep-1"
    assert rep["period_end_date"] == "2024-12-31"
    assert rep["form"] == "saved_view"

    # re-save replaces fact data (delete_report_data → create flow)
    counts2 = save_report(store, tb, "rep-1", "Trial Balance FY24")
    assert counts2["Fact"] == 3 and counts2["replaced_facts"] == 3
    assert store.read("Fact").count() == 3  # no duplicates, no orphans

    # metadata update (SET)
    from pyspark.sql import functions as F
    assert update_report_metadata(store, "rep-1", {"failed": F.lit(True)}) == 1
    assert store.read("Report").first()["failed"] is True

    # cascade delete (DETACH DELETE): edges then nodes
    removed = delete_report(store, "rep-1")
    assert removed == {
        "FACT_HAS_ELEMENT": 3, "REPORT_HAS_FACT": 3, "Fact": 3, "Report": 1,
    }
    assert store.read("Report").count() == 0


def test_save_view_resave_changed_values(spark, gl_tables, tmp_path):
    """A re-save with CHANGED values must land them, and elements
    dropped from the view must not leave orphaned Facts/edges
    (round-1 ADVICE: the old ignore_errors anti-join silently kept
    stale facts)."""
    from pyspark.sql import functions as F

    from robosystems_spark.sources.materialize import GraphStore
    from robosystems_spark.views.save_view import save_report

    tb = trial_balance(gl_tables)
    store = GraphStore(spark, str(tmp_path / "graphs"), "views_kg")
    save_report(store, tb, "rep-1", "TB v1")

    # change one value, drop one element
    elements = [r["element_id"] for r in tb.select("element_id").collect()]
    keep = sorted(elements)[:-1]
    tb2 = (
        tb.filter(F.col("element_id").isin(keep))
        .withColumn("net_balance", F.col("net_balance") + 1000.0)
    )
    counts = save_report(store, tb2, "rep-1", "TB v2")
    assert counts["Fact"] == len(keep)
    assert counts["replaced_facts"] == 3

    facts = store.read("Fact").collect()
    assert len(facts) == len(keep)  # dropped element's fact is gone
    edges = store.read("FACT_HAS_ELEMENT")
    assert edges.count() == len(keep)
    assert {r["dst"] for r in edges.collect()} == set(keep)
    # changed values landed
    originals = {
        r["element_id"]: r["net_balance"] for r in tb.collect()
    }
    for r in store.read("Fact").collect():
        assert r["numeric_value"] not in originals.values()
    assert store.read("Report").first()["name"] == "TB v2"
