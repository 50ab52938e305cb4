"""Offline DTS resolution + calculation-linkbase validation (r12):
resolver walk (schemaRef -> import -> linkbaseRef), dir_loader
fixture-mirror semantics, unresolved fail-soft, and golden weight
algebra for the DataFrame consistency check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.inventory.xbrl import _filing_store
from robosystems_spark.pipelines.xbrl import calculation_validation
from robosystems_spark.pipelines.xbrl_parse import (
    dir_loader,
    parse_instance,
    resolve_dts,
)


def test_resolver_walks_full_dts_in_memory():
    instance, store = _filing_store(5)
    dts = resolve_dts(instance, store.get, accession="a5")
    assert dts["unresolved"] == []
    # entry schema + imported base schema + both linkbases
    assert set(dts["documents"]) == {
        "ex-5.xsd", "base.xsd", "cal-5.xml", "pres-5.xml",
    }
    arcs = dts["arcs"]
    assert len(arcs) == 6
    calc = [a for a in arcs if a["arcrole"].endswith("summation-item")]
    pres = [a for a in arcs if a["arcrole"].endswith("parent-child")]
    assert len(calc) == 4 and len(pres) == 2
    weights = sorted(a["weight"] for a in calc)
    assert weights == [-1.0, 1.0, 1.0, 1.0]
    assert sorted(a["preferred_label"] or "" for a in pres) == [
        "", "http://www.xbrl.org/2003/role/terseLabel",
    ]
    # locator hrefs resolved against the linkbase's own location
    assert all(a["parent_uri"].startswith("base.xsd#ex_") for a in arcs)
    assert all(a["accession"] == "a5" for a in arcs)


def test_resolver_dir_loader_and_unresolved(tmp_path):
    instance, store = _filing_store(9)
    # a PARTIAL mirror: drop the calculation linkbase
    for name, data in store.items():
        if not name.startswith("cal-"):
            (tmp_path / name).write_bytes(data)
    dts = resolve_dts(instance, dir_loader(str(tmp_path)), accession="a9")
    assert dts["unresolved"] == ["cal-9.xml"]
    # fail-soft: only the presentation arcs (whose linkbase resolved)
    assert all(
        a["arcrole"].endswith("parent-child") for a in dts["arcs"]
    )
    # the FULL mirror resolves identically to the in-memory store
    (tmp_path / "cal-9.xml").write_bytes(store["cal-9.xml"])
    full = resolve_dts(instance, dir_loader(str(tmp_path)), accession="a9")
    assert full["unresolved"] == []
    assert len(full["arcs"]) == 6


def test_dir_loader_maps_remote_urls_to_basenames(tmp_path):
    (tmp_path / "base.xsd").write_bytes(b"<x/>")
    load = dir_loader(str(tmp_path))
    assert load("http://example.com/some/deep/path/base.xsd") == b"<x/>"
    assert load("missing.xsd") is None


_FACT_DDL = (
    "accession string, concept_qname string, value string, "
    "decimals string, period_start string, period_end string, "
    "period_instant string, unit string"
)
_ARC_DDL = (
    "accession string, role_uri string, arcrole string, "
    "parent_uri string, child_uri string, weight double"
)


def _validate(spark, did: int):
    instance, store = _filing_store(did)
    cols = (
        "accession", "concept_qname", "value", "decimals",
        "period_start", "period_end", "period_instant", "unit",
    )
    facts = spark.createDataFrame(
        [
            tuple(f.get(k) for k in cols)
            for f in parse_instance(instance, f"a{did}")
        ],
        _FACT_DDL,
    )
    dts = resolve_dts(instance, store.get, accession=f"a{did}")
    arcs = spark.createDataFrame(
        [
            tuple(
                a.get(k)
                for k in (
                    "accession", "role_uri", "arcrole",
                    "parent_uri", "child_uri", "weight",
                )
            )
            for a in dts["arcs"]
        ],
        _ARC_DDL,
    )
    return {
        r["parent_concept"]: r
        for r in calculation_validation(facts, arcs).collect()
    }


def test_weight_algebra_golden(spark):
    """did=2 is consistent: Assets(1006) = Liab(604) + Equity(402);
    NetDebt(400) = Debt(502) - Cash(102) via weight -1."""
    out = _validate(spark, 2)
    a = out["Assets"]
    assert (a["reported"], a["computed"], a["consistent"]) == (
        1006.0, 1006.0, True,
    )
    nd = out["NetDebt"]
    assert (nd["reported"], nd["computed"], nd["consistent"]) == (
        400.0, 400.0, True,
    )
    assert nd["n_children"] == 2 and nd["tolerance"] == 0.5


def test_planted_inconsistency_detected(spark):
    """did=10 (10 % 7 == 3): Equity is shifted by 10 % 5 + 1 = 1, so
    the computed sum exceeds reported Assets past the 0.5 tolerance;
    the NetDebt role stays consistent."""
    out = _validate(spark, 10)
    a = out["Assets"]
    assert a["reported"] == 1030.0 and a["computed"] == 1031.0
    assert a["consistent"] is False
    assert out["NetDebt"]["consistent"] is True


def test_inf_decimals_mean_exact(spark):
    """decimals=INF (or absent) removes the rounding allowance: a
    0.4-off sum that decimals=0 would accept must be flagged."""
    facts = spark.createDataFrame(
        [
            ("a", "ex:P", "10.0", dec, None, None, "2024-12-31", "USD")
            for dec in (("0",))
        ]
        + [
            ("a", "ex:C1", "9.6", "0", None, None, "2024-12-31", "USD"),
        ],
        "accession string, concept_qname string, value string, "
        "decimals string, period_start string, period_end string, "
        "period_instant string, unit string",
    )
    arcs = spark.createDataFrame(
        [("a", "r", "http://www.xbrl.org/2003/arcrole/summation-item",
          "t.xsd#ex_P", "t.xsd#ex_C1", 1.0)],
        "accession string, role_uri string, arcrole string, "
        "parent_uri string, child_uri string, weight double",
    )
    tolerant = calculation_validation(facts, arcs).collect()[0]
    assert tolerant["consistent"] is True  # |10 - 9.6| <= 0.5
    facts_inf = facts.withColumn("decimals", F.lit("INF"))
    strict = calculation_validation(facts_inf, arcs).collect()[0]
    assert strict["tolerance"] == 0.0
    assert strict["consistent"] is False


def test_context_isolation(spark):
    """Facts in a different context/unit must not bind into the sum."""
    rows = [
        ("a", "ex:P", "10", "0", None, None, "2024-12-31", "USD"),
        ("a", "ex:C1", "10", "0", None, None, "2024-12-31", "USD"),
        # same concepts, other instant — would break the sum if bound
        ("a", "ex:C1", "999", "0", None, None, "2023-12-31", "USD"),
    ]
    facts = spark.createDataFrame(
        rows,
        "accession string, concept_qname string, value string, "
        "decimals string, period_start string, period_end string, "
        "period_instant string, unit string",
    )
    arcs = spark.createDataFrame(
        [("a", "r", "http://www.xbrl.org/2003/arcrole/summation-item",
          "t.xsd#ex_P", "t.xsd#ex_C1", 1.0)],
        "accession string, role_uri string, arcrole string, "
        "parent_uri string, child_uri string, weight double",
    )
    out = calculation_validation(facts, arcs).collect()
    by_ctx = {r["context_key"]: r for r in out}
    assert by_ctx["||2024-12-31|USD"]["consistent"] is True
    # the 2023 context has no reported parent -> no row
    assert len(out) == 1


@pytest.mark.parametrize("did", [0, 3, 17, 45])
def test_registry_entry_matches_closed_form(spark, did):
    out = _validate(spark, did)
    delta = (did % 5) + 1 if did % 7 == 3 else 0
    assert out["Assets"]["consistent"] is (delta == 0)
    assert out["NetDebt"]["consistent"] is True


def test_duplicate_arcs_bind_once(spark):
    """The same summation arc appearing in two linkbase documents is
    ONE relationship (XBRL 2.1 base-set equivalence) — the child must
    not double-count into the sum."""
    facts = spark.createDataFrame(
        [
            ("a", "ex:P", "10", "0", None, None, "2024-12-31", "USD"),
            ("a", "ex:C1", "10", "0", None, None, "2024-12-31", "USD"),
        ],
        _FACT_DDL,
    )
    arc = ("a", "r", "http://www.xbrl.org/2003/arcrole/summation-item",
           "t.xsd#ex_P", "t.xsd#ex_C1", 1.0)
    arcs = spark.createDataFrame([arc, arc], _ARC_DDL)
    out = calculation_validation(facts, arcs).collect()
    assert len(out) == 1
    assert out[0]["computed"] == 10.0 and out[0]["n_children"] == 1
    assert out[0]["consistent"] is True
