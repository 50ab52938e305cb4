"""Entity-graph provisioning flow (reference EntityGraphService:
create_entity_with_new_graph)."""

from __future__ import annotations

import os
import re

import pytest

from robosystems_spark.sources.provisioning import (
    EntityGraphProvisioner,
    ProvisioningError,
    generate_graph_id,
)


def test_graph_id_grammar_and_time_order():
    a = generate_graph_id("Acme Corp", now_ms=1_000_000, entropy="abcdef0123")
    b = generate_graph_id("Acme Corp", now_ms=2_000_000, entropy="abcdef0123")
    assert re.fullmatch(r"kg[a-f0-9]{26}", a)
    assert a < b  # millisecond prefix makes ids lexicographically time-ordered
    # deterministic with pinned inputs; name entropy differs by name
    assert a == generate_graph_id("Acme Corp", now_ms=1_000_000, entropy="abcdef0123")
    assert a[-4:] != generate_graph_id("Other Inc", now_ms=1_000_000, entropy="abcdef0123")[-4:]


def test_provision_base_schema(spark, tmp_path):
    prov = EntityGraphProvisioner(spark, str(tmp_path))
    info = prov.provision({"name": "Acme Corp", "cik": "0000123456"})
    assert re.fullmatch(r"kg[a-f0-9]{26}", info["graph_id"])
    assert info["tables_created"] > 0 and not info["is_subgraph"]

    from robosystems_spark.sources.materialize import GraphStore

    store = GraphStore(spark, str(tmp_path), info["graph_id"])
    rows = store.read("Entity").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["identifier"] == info["entity_id"] == f"entity_{info['graph_id']}"
    assert r["name"] == r["legal_name"] == "Acme Corp"
    assert r["status"] == "active" and r["is_parent"] is True
    assert r["cik"] == "0000123456"
    # provisioning went through the locked write path -> commit log
    assert [h["op"] for h in store.history("Entity")] == ["create_table", "copy_into"]


def test_provision_with_extension_tables(spark, tmp_path):
    prov = EntityGraphProvisioner(spark, str(tmp_path))
    info = prov.provision({"name": "Fund LP"}, extensions=["roboinvestor"])
    from robosystems_spark.sources.materialize import GraphStore

    store = GraphStore(spark, str(tmp_path), info["graph_id"])
    tables = set(store.tables())
    assert "Entity" in tables
    # extension added tables beyond the base set
    base_info = EntityGraphProvisioner(spark, str(tmp_path)).provision(
        {"name": "Base Co"}
    )
    base_tables = set(
        GraphStore(spark, str(tmp_path), base_info["graph_id"]).tables()
    )
    assert tables > base_tables


def test_failed_provision_cleans_up(spark, tmp_path, monkeypatch):
    from robosystems_spark.sources import materialize

    def boom(self, *a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(materialize.GraphStore, "copy_into", boom)
    prov = EntityGraphProvisioner(spark, str(tmp_path))
    gid = generate_graph_id("Doomed Inc")
    with pytest.raises(ProvisioningError):
        prov.provision({"name": "Doomed Inc"}, graph_id=gid)
    assert not os.path.exists(os.path.join(str(tmp_path), gid))


def test_invalid_graph_id_rejected(spark, tmp_path):
    prov = EntityGraphProvisioner(spark, str(tmp_path))
    with pytest.raises(Exception):
        prov.provision({"name": "X"}, graph_id="not-a-graph-id")
    with pytest.raises(ValueError):
        prov.provision({})


def test_provision_refuses_existing_graph(spark, tmp_path):
    """Provisioning onto an existing graph id must refuse up front —
    never append a duplicate Entity nor rmtree data it didn't create."""
    prov = EntityGraphProvisioner(spark, str(tmp_path))
    gid = generate_graph_id("Solo Co")
    prov.provision({"name": "Solo Co"}, graph_id=gid)
    with pytest.raises(ValueError, match="already exists"):
        prov.provision({"name": "Imposter"}, graph_id=gid)
    # original graph untouched
    from robosystems_spark.sources.materialize import GraphStore

    store = GraphStore(spark, str(tmp_path), gid)
    assert store.read("Entity").count() == 1
