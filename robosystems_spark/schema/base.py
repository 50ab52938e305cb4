"""Base schema: the always-present node/relationship tables.

Mirrors the semantic content of the reference base schema
(/root/reference/robosystems/schemas/base.py:13-232): Entity, Period,
Unit, Element, Label, Reference, Taxonomy nodes and the seven base
relationships.  Property lists are declared compactly as
(name, type[, pk]) tuples; every node keys on ``identifier`` (UUIDv7
strings in the reference, schemas/base.py:18-21).
"""

from __future__ import annotations

from robosystems_spark.schema.models import Node, Property, Relationship, Schema


def _props(*specs: tuple) -> list[Property]:
    out = []
    for spec in specs:
        name, ptype = spec[0], spec[1]
        pk = len(spec) > 2 and spec[2]
        out.append(Property(name=name, type=ptype, is_primary_key=bool(pk)))
    return out


def base_schema() -> Schema:
    nodes = [
        Node(
            "Entity",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("scheme", "STRING"),
                ("cik", "STRING"),
                ("ticker", "STRING"),
                ("exchange", "STRING"),
                ("name", "STRING"),
                ("legal_name", "STRING"),
                ("industry", "STRING"),
                ("entity_type", "STRING"),
                ("sic", "STRING"),
                ("sic_description", "STRING"),
                ("category", "STRING"),
                ("state_of_incorporation", "STRING"),
                ("fiscal_year_end", "STRING"),
                ("ein", "STRING"),
                ("tax_id", "STRING"),
                ("lei", "STRING"),
                ("phone", "STRING"),
                ("website", "STRING"),
                ("status", "STRING"),
                ("is_parent", "BOOLEAN"),
                ("parent_entity_id", "STRING"),
                ("created_at", "STRING"),
                ("updated_at", "STRING"),
            ),
            description="Legal/reporting entity (company, subsidiary, fund)",
        ),
        Node(
            "Period",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("instant_date", "STRING"),
                ("start_date", "STRING"),
                ("end_date", "STRING"),
                ("forever_date", "BOOLEAN"),
                ("fiscal_year", "INT32"),
                ("fiscal_quarter", "STRING"),
                ("is_annual", "BOOLEAN"),
                ("is_quarterly", "BOOLEAN"),
                ("days_in_period", "INT32"),
            ),
            description="Reporting period (instant or duration)",
        ),
        Node(
            "Unit",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("measure", "STRING"),
                ("value", "STRING"),
                ("numerator_uri", "STRING"),
                ("denominator_uri", "STRING"),
            ),
            description="Measurement unit (USD, shares, ratios)",
        ),
        Node(
            "Element",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("qname", "STRING"),
                ("name", "STRING"),
                ("classification", "STRING"),
                ("period_type", "STRING"),
                ("type", "STRING"),
                ("balance", "STRING"),
                ("is_abstract", "BOOLEAN"),
                ("is_dimension_item", "BOOLEAN"),
                ("is_domain_member", "BOOLEAN"),
                ("is_hypercube_item", "BOOLEAN"),
                ("is_integer", "BOOLEAN"),
                ("is_numeric", "BOOLEAN"),
                ("is_shares", "BOOLEAN"),
                ("is_fraction", "BOOLEAN"),
                ("is_textblock", "BOOLEAN"),
            ),
            description="Taxonomy element / chart-of-accounts concept",
        ),
        Node(
            "Label",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("language", "STRING"),
                ("role", "STRING"),
                ("value", "STRING"),
                ("type", "STRING"),
            ),
            description="Human-readable label for elements/taxonomies",
        ),
        Node(
            "Reference",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("role", "STRING"),
                ("type", "STRING"),
                ("value", "STRING"),
            ),
            description="Authoritative reference (e.g. ASC paragraph)",
        ),
        Node(
            "Taxonomy",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("name", "STRING"),
                ("version", "STRING"),
                ("namespace", "STRING"),
            ),
            description="Reporting taxonomy (us-gaap, ifrs, custom)",
        ),
    ]
    rels = [
        Relationship("ENTITY_EVOLVED_FROM", "Entity", "Entity"),
        Relationship("ENTITY_OWNS_ENTITY", "Entity", "Entity"),
        Relationship("ELEMENT_HAS_LABEL", "Element", "Label"),
        Relationship("ELEMENT_HAS_REFERENCE", "Element", "Reference"),
        Relationship("ELEMENT_IN_TAXONOMY", "Element", "Taxonomy"),
        Relationship("TAXONOMY_HAS_LABEL", "Taxonomy", "Label"),
        Relationship("TAXONOMY_HAS_REFERENCE", "Taxonomy", "Reference"),
    ]
    return Schema(name="base", version="1.0.0", description="Base graph schema", nodes=nodes, relationships=rels)
