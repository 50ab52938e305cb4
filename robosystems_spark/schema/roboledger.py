"""roboledger extension schema: financial reporting + general ledger.

Node/relationship surface per the reference extension
(/root/reference/robosystems/schemas/extensions/roboledger.py:43-416):
nodes Report, Fact, Structure, FactDimension, Association, FactSet,
Transaction, LineItem, Process; 19 relationships wiring facts to
elements/entities/periods/units/dimensions and the GL chain
Entity→Transaction→LineItem→Element.
"""

from __future__ import annotations

from robosystems_spark.schema.base import _props
from robosystems_spark.schema.models import Node, Relationship, Schema


def roboledger_schema() -> Schema:
    nodes = [
        Node(
            "Report",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("form", "STRING"),
                ("filing_date", "STRING"),
                ("report_date", "STRING"),
                ("acceptance_date", "STRING"),
                ("accession_number", "STRING"),
                ("period_end_date", "STRING"),
                ("is_inline_xbrl", "BOOLEAN"),
                ("processed", "BOOLEAN"),
                ("failed", "BOOLEAN"),
            ),
            description="Filed financial report (10-K, 10-Q, ...)",
        ),
        Node(
            "Fact",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("value", "STRING"),
                ("numeric_value", "DOUBLE"),
                ("fact_type", "STRING"),
                ("decimals", "STRING"),
                ("content_type", "STRING"),
            ),
            description="XBRL fact (numeric or text)",
        ),
        Node(
            "Structure",
            _props(
                ("identifier", "STRING", True),
                ("uri", "STRING"),
                ("name", "STRING"),
                ("type", "STRING"),
                ("definition", "STRING"),
                ("network_uri", "STRING"),
            ),
            description="Presentation/calculation/mapping structure",
        ),
        Node(
            "FactDimension",
            _props(
                ("identifier", "STRING", True),
                ("axis_uri", "STRING"),
                ("member_uri", "STRING"),
                ("type", "STRING"),
                ("is_explicit", "BOOLEAN"),
                ("is_typed", "BOOLEAN"),
            ),
            description="Dimensional qualifier on a fact",
        ),
        Node(
            "Association",
            _props(
                ("identifier", "STRING", True),
                ("arcrole", "STRING"),
                ("order_value", "DOUBLE"),
                ("association_type", "STRING"),
                ("weight", "DOUBLE"),
                ("preferred_label", "STRING"),
                ("root", "BOOLEAN"),
            ),
            description="Structure edge: element-to-element arc with weight/order",
        ),
        Node(
            "FactSet",
            _props(
                ("identifier", "STRING", True),
                ("name", "STRING"),
                ("description", "STRING"),
            ),
            description="Named group of facts",
        ),
        Node(
            "Transaction",
            _props(
                ("identifier", "STRING", True),
                ("transaction_number", "STRING"),
                ("amount", "DOUBLE"),
                ("description", "STRING"),
                ("date", "DATE"),
                ("transaction_date", "STRING"),
                ("transaction_type", "STRING"),
                ("currency", "STRING"),
                ("reference_number", "STRING"),
                ("status", "STRING"),
                ("plaid_category", "STRING"),
                ("plaid_merchant_name", "STRING"),
                ("plaid_pending", "BOOLEAN"),
                ("sync_hash", "STRING"),
            ),
            description="General-ledger transaction",
        ),
        Node(
            "LineItem",
            _props(
                ("identifier", "STRING", True),
                ("number", "STRING"),
                ("description", "STRING"),
                ("debit_amount", "DOUBLE"),
                ("credit_amount", "DOUBLE"),
            ),
            description="Transaction line (double-entry leg)",
        ),
        Node(
            "Process",
            _props(
                ("identifier", "STRING", True),
                ("name", "STRING"),
                ("process_type", "STRING"),
                ("status", "STRING"),
            ),
            description="Processing run metadata",
        ),
    ]
    rels = [
        Relationship("ENTITY_HAS_REPORT", "Entity", "Report"),
        Relationship("REPORT_HAS_FACT", "Report", "Fact"),
        Relationship("FACT_HAS_ELEMENT", "Fact", "Element"),
        Relationship("FACT_HAS_ENTITY", "Fact", "Entity"),
        Relationship("FACT_HAS_PERIOD", "Fact", "Period"),
        Relationship("FACT_HAS_UNIT", "Fact", "Unit"),
        Relationship("STRUCTURE_HAS_TAXONOMY", "Structure", "Taxonomy"),
        Relationship("FACT_HAS_DIMENSION", "Fact", "FactDimension"),
        Relationship("FACT_DIMENSION_AXIS_ELEMENT", "FactDimension", "Element"),
        Relationship("FACT_DIMENSION_MEMBER_ELEMENT", "FactDimension", "Element"),
        Relationship("FACT_SET_CONTAINS_FACT", "FactSet", "Fact"),
        Relationship("REPORT_HAS_FACT_SET", "Report", "FactSet"),
        Relationship("REPORT_USES_TAXONOMY", "Report", "Taxonomy"),
        Relationship("STRUCTURE_HAS_ASSOCIATION", "Structure", "Association"),
        Relationship("ASSOCIATION_HAS_FROM_ELEMENT", "Association", "Element"),
        Relationship("ASSOCIATION_HAS_TO_ELEMENT", "Association", "Element"),
        Relationship("ENTITY_HAS_TRANSACTION", "Entity", "Transaction"),
        Relationship("TRANSACTION_HAS_LINE_ITEM", "Transaction", "LineItem"),
        Relationship("LINE_ITEM_RELATES_TO_ELEMENT", "LineItem", "Element"),
    ]
    return Schema(
        name="roboledger",
        version="1.0.0",
        description="Financial reporting + general ledger extension",
        nodes=nodes,
        relationships=rels,
    )


def full_schema() -> Schema:
    """Base + roboledger composed (the default loader configuration)."""
    from robosystems_spark.schema.base import base_schema

    return base_schema().merge(roboledger_schema())
