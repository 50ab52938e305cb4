"""Remaining extension schemas: roboinvestor, robofo, robohrm,
roboepm, roboscm, roboreport.

Node/relationship surface per /root/reference/robosystems/schemas/
extensions/{roboinvestor,robofo,robohrm,roboepm,roboscm,roboreport}.py.
Each node carries the common core (identifier PK, name, status,
created_at/updated_at) plus domain value columns; the full per-node
property lists in the reference are mostly STRING metadata and can be
extended without migration (schema-on-read parquet).  Relationship
endpoint sets match the reference exactly — they drive the Cypher
compiler's join planning, which is the part that must be precise.
"""

from __future__ import annotations

from robosystems_spark.schema.base import _props
from robosystems_spark.schema.models import Node, Relationship, Schema

_CORE = (("identifier", "STRING", True), ("name", "STRING"), ("status", "STRING"),
         ("created_at", "STRING"), ("updated_at", "STRING"))


def _node(name: str, *extra: tuple, desc: str = "") -> Node:
    return Node(name, _props(*_CORE, *extra), description=desc)


def roboinvestor_schema() -> Schema:
    nodes = [
        _node("Portfolio", ("currency", "STRING"), ("inception_date", "STRING"),
              ("total_value", "DOUBLE"), desc="Investment portfolio"),
        _node("Security", ("ticker", "STRING"), ("cusip", "STRING"), ("isin", "STRING"),
              ("security_type", "STRING"), ("exchange", "STRING"), desc="Tradable security"),
        _node("Position", ("quantity", "DOUBLE"), ("cost_basis", "DOUBLE"),
              ("market_value", "DOUBLE"), ("as_of_date", "STRING"), desc="Holding"),
        _node("Trade", ("trade_date", "STRING"), ("settle_date", "STRING"),
              ("side", "STRING"), ("quantity", "DOUBLE"), ("price", "DOUBLE"),
              ("commission", "DOUBLE"), desc="Executed trade"),
        _node("Benchmark", ("index_name", "STRING"), desc="Benchmark index"),
        _node("MarketData", ("price_date", "STRING"), ("open", "DOUBLE"),
              ("high", "DOUBLE"), ("low", "DOUBLE"), ("close", "DOUBLE"),
              ("volume", "DOUBLE"), desc="OHLCV bar"),
        _node("Dividend", ("ex_date", "STRING"), ("pay_date", "STRING"),
              ("amount", "DOUBLE"), desc="Dividend payment"),
        _node("Risk", ("risk_type", "STRING"), ("value", "DOUBLE"),
              ("as_of_date", "STRING"), desc="Risk metric"),
    ]
    rels = [
        Relationship("ENTITY_HAS_PORTFOLIO", "Entity", "Portfolio"),
        Relationship("ENTITY_ISSUES_SECURITY", "Entity", "Security"),
        Relationship("PORTFOLIO_HAS_POSITION", "Portfolio", "Position"),
        Relationship("PORTFOLIO_HAS_TRADE", "Portfolio", "Trade"),
        Relationship("PORTFOLIO_HAS_RISK", "Portfolio", "Risk"),
        Relationship("PORTFOLIO_BENCHMARKED_AGAINST", "Portfolio", "Benchmark"),
        Relationship("POSITION_IN_SECURITY", "Position", "Security"),
        Relationship("TRADE_INVOLVES_SECURITY", "Trade", "Security"),
        Relationship("TRADE_CREATES_POSITION", "Trade", "Position"),
        Relationship("SECURITY_HAS_MARKET_DATA", "Security", "MarketData"),
        Relationship("SECURITY_PAYS_DIVIDEND", "Security", "Dividend"),
        Relationship("SECURITY_HAS_RISK", "Security", "Risk"),
        Relationship("USER_MANAGES_PORTFOLIO", "*", "Portfolio"),
    ]
    return Schema("roboinvestor", nodes=nodes, relationships=rels,
                  description="Portfolios, securities, trades")


def robofo_schema() -> Schema:
    names = ["Customer", "Contact", "Lead", "Opportunity", "Deal", "Quote",
             "Campaign", "Pipeline", "Activity", "Address", "Document", "Event"]
    nodes = [_node(n) for n in names]
    rels = [
        Relationship("CUSTOMER_HAS_CONTACT", "Customer", "Contact"),
        Relationship("CUSTOMER_BECOMES_ENTITY", "Customer", "Entity"),
        Relationship("LEAD_HAS_CONTACT", "Lead", "Contact"),
        Relationship("LEAD_CONVERTS_TO_OPPORTUNITY", "Lead", "Opportunity"),
        Relationship("OPPORTUNITY_FOR_CUSTOMER", "Opportunity", "Customer"),
        Relationship("OPPORTUNITY_HAS_CONTACT", "Opportunity", "Contact"),
        Relationship("OPPORTUNITY_HAS_QUOTE", "Opportunity", "Quote"),
        Relationship("OPPORTUNITY_IN_PIPELINE", "Opportunity", "Pipeline"),
        Relationship("OPPORTUNITY_BECOMES_DEAL", "Opportunity", "Deal"),
        Relationship("QUOTE_FOR_CUSTOMER", "Quote", "Customer"),
        Relationship("CAMPAIGN_GENERATES_LEAD", "Campaign", "Lead"),
        Relationship("ACTIVITY_FOR_CUSTOMER", "Activity", "Customer"),
        Relationship("ACTIVITY_FOR_LEAD", "Activity", "Lead"),
        Relationship("ACTIVITY_FOR_OPPORTUNITY", "Activity", "Opportunity"),
        Relationship("CONTACT_HAS_ADDRESS", "Contact", "Address"),
        Relationship("CONTACT_HAS_DOCUMENT", "Contact", "Document"),
        Relationship("CONTACT_HAS_EVENT", "Contact", "Event"),
        Relationship("ENTITY_HAS_ADDRESS", "Entity", "Address"),
        Relationship("ENTITY_HAS_DOCUMENT", "Entity", "Document"),
        Relationship("ENTITY_HAS_EVENT", "Entity", "Event"),
        Relationship("DOCUMENT_DERIVED_FROM", "Document", "Document"),
        Relationship("USER_MANAGES_CUSTOMER", "*", "Customer"),
        Relationship("USER_OWNS_LEAD", "*", "Lead"),
        Relationship("USER_OWNS_OPPORTUNITY", "*", "Opportunity"),
        Relationship("USER_HAS_DOCUMENT", "*", "Document"),
        Relationship("USER_HAS_EVENT", "*", "Event"),
    ]
    return Schema("robofo", nodes=nodes, relationships=rels, description="CRM front office")


def robohrm_schema() -> Schema:
    nodes = [
        _node("Employee", ("email", "STRING"), ("hire_date", "STRING")),
        _node("Department", ("cost_center", "STRING")),
        _node("Position", ("title", "STRING"), ("level", "STRING")),
        _node("Payroll", ("pay_date", "STRING"), ("gross", "DOUBLE"), ("net", "DOUBLE")),
        _node("Benefit", ("benefit_type", "STRING")),
        _node("Performance", ("review_date", "STRING"), ("rating", "DOUBLE")),
        _node("TimeOff", ("start_date", "STRING"), ("end_date", "STRING"), ("days", "DOUBLE")),
        _node("Training", ("completed_date", "STRING")),
        _node("Address", ("city", "STRING"), ("country", "STRING")),
        _node("Contact", ("email", "STRING"), ("phone", "STRING")),
    ]
    rels = [
        Relationship("ENTITY_HAS_EMPLOYEE", "Entity", "Employee"),
        Relationship("ENTITY_HAS_DEPARTMENT", "Entity", "Department"),
        Relationship("ENTITY_OFFERS_BENEFIT", "Entity", "Benefit"),
        Relationship("ENTITY_PROVIDES_TRAINING", "Entity", "Training"),
        Relationship("EMPLOYEE_IN_DEPARTMENT", "Employee", "Department"),
        Relationship("EMPLOYEE_HAS_POSITION", "Employee", "Position"),
        Relationship("EMPLOYEE_HAS_PAYROLL", "Employee", "Payroll"),
        Relationship("EMPLOYEE_ENROLLED_IN_BENEFIT", "Employee", "Benefit"),
        Relationship("EMPLOYEE_HAS_PERFORMANCE", "Employee", "Performance"),
        Relationship("EMPLOYEE_HAS_TIME_OFF", "Employee", "TimeOff"),
        Relationship("EMPLOYEE_COMPLETED_TRAINING", "Employee", "Training"),
        Relationship("EMPLOYEE_REPORTS_TO_EMPLOYEE", "Employee", "Employee"),
        Relationship("EMPLOYEE_HAS_ADDRESS", "Employee", "Address"),
        Relationship("EMPLOYEE_HAS_CONTACT", "Employee", "Contact"),
        Relationship("EMPLOYEE_IS_USER", "Employee", "*"),
        Relationship("DEPARTMENT_HAS_POSITION", "Department", "Position"),
        Relationship("DEPARTMENT_HAS_ADDRESS", "Department", "Address"),
    ]
    return Schema("robohrm", nodes=nodes, relationships=rels, description="HR management")


def roboepm_schema() -> Schema:
    nodes = [
        _node("KPI", ("unit", "STRING"), ("direction", "STRING")),
        _node("Metric", ("value", "DOUBLE"), ("as_of_date", "STRING")),
        _node("Target", ("value", "DOUBLE"), ("target_date", "STRING")),
        _node("Goal", ("description", "STRING")),
        _node("Budget", ("fiscal_year", "INT32"), ("amount", "DOUBLE")),
        _node("Forecast", ("as_of_date", "STRING"), ("amount", "DOUBLE")),
        _node("Scorecard"),
        _node("Dashboard"),
    ]
    rels = [
        Relationship("ENTITY_HAS_KPI", "Entity", "KPI"),
        Relationship("ENTITY_HAS_GOAL", "Entity", "Goal"),
        Relationship("ENTITY_HAS_BUDGET", "Entity", "Budget"),
        Relationship("KPI_HAS_METRIC", "KPI", "Metric"),
        Relationship("KPI_HAS_TARGET", "KPI", "Target"),
        Relationship("GOAL_HAS_TARGET", "Goal", "Target"),
        Relationship("GOAL_SUPPORTS_KPI", "Goal", "KPI"),
        Relationship("BUDGET_HAS_FORECAST", "Budget", "Forecast"),
        Relationship("PERIOD_FOR_BUDGET", "Period", "Budget"),
        Relationship("PERIOD_FOR_FORECAST", "Period", "Forecast"),
        Relationship("PERIOD_FOR_METRIC", "Period", "Metric"),
        Relationship("SCORECARD_INCLUDES_KPI", "Scorecard", "KPI"),
        Relationship("SCORECARD_TRACKS_GOAL", "Scorecard", "Goal"),
        Relationship("DASHBOARD_DISPLAYS_KPI", "Dashboard", "KPI"),
        Relationship("USER_OWNS_DASHBOARD", "*", "Dashboard"),
        Relationship("USER_OWNS_KPI", "*", "KPI"),
    ]
    return Schema("roboepm", nodes=nodes, relationships=rels, description="KPIs and budgets")


def roboscm_schema() -> Schema:
    nodes = [
        _node("Supplier", ("rating", "DOUBLE")),
        _node("Product", ("sku", "STRING"), ("unit_cost", "DOUBLE")),
        _node("PurchaseOrder", ("order_date", "STRING"), ("total", "DOUBLE")),
        _node("Shipment", ("ship_date", "STRING"), ("carrier", "STRING")),
        _node("Warehouse", ("location", "STRING")),
        _node("Inventory", ("quantity", "DOUBLE"), ("as_of_date", "STRING")),
        _node("Contract", ("start_date", "STRING"), ("end_date", "STRING")),
        _node("Demand", ("forecast_qty", "DOUBLE"), ("period", "STRING")),
        _node("Address", ("city", "STRING"), ("country", "STRING")),
        _node("Contact", ("email", "STRING")),
    ]
    rels = [
        Relationship("ENTITY_HAS_SUPPLIER", "Entity", "Supplier"),
        Relationship("ENTITY_HAS_PURCHASE_ORDER", "Entity", "PurchaseOrder"),
        Relationship("ENTITY_HAS_WAREHOUSE", "Entity", "Warehouse"),
        Relationship("ENTITY_HAS_CONTRACT", "Entity", "Contract"),
        Relationship("SUPPLIER_PROVIDES_PRODUCT", "Supplier", "Product"),
        Relationship("SUPPLIER_HAS_ADDRESS", "Supplier", "Address"),
        Relationship("SUPPLIER_HAS_CONTACT", "Supplier", "Contact"),
        Relationship("PURCHASE_ORDER_TO_SUPPLIER", "PurchaseOrder", "Supplier"),
        Relationship("PURCHASE_ORDER_CONTAINS_PRODUCT", "PurchaseOrder", "Product"),
        Relationship("SHIPMENT_FOR_PURCHASE_ORDER", "Shipment", "PurchaseOrder"),
        Relationship("SHIPMENT_CONTAINS_PRODUCT", "Shipment", "Product"),
        Relationship("WAREHOUSE_HAS_INVENTORY", "Warehouse", "Inventory"),
        Relationship("WAREHOUSE_HAS_ADDRESS", "Warehouse", "Address"),
        Relationship("INVENTORY_OF_PRODUCT", "Inventory", "Product"),
        Relationship("PRODUCT_HAS_DEMAND", "Product", "Demand"),
        Relationship("CONTRACT_WITH_SUPPLIER", "Contract", "Supplier"),
    ]
    return Schema("roboscm", nodes=nodes, relationships=rels, description="Supply chain")


def roboreport_schema() -> Schema:
    nodes = [
        _node("Regulation", ("jurisdiction", "STRING")),
        _node("Filing", ("filing_type", "STRING"), ("due_date", "STRING")),
        _node("Compliance", ("state", "STRING")),
        _node("Deadline", ("due_date", "STRING")),
        _node("Submission", ("submitted_at", "STRING")),
        _node("Review", ("reviewed_at", "STRING")),
        _node("Approval", ("approved_at", "STRING")),
        _node("RegulatoryContact", ("agency", "STRING")),
        _node("Document", ("doc_type", "STRING")),
    ]
    rels = [
        Relationship("ENTITY_SUBJECT_TO_REGULATION", "Entity", "Regulation"),
        Relationship("ENTITY_HAS_COMPLIANCE", "Entity", "Compliance"),
        Relationship("REGULATION_REQUIRES_FILING", "Regulation", "Filing"),
        Relationship("COMPLIANCE_BASED_ON_REGULATION", "Compliance", "Regulation"),
        Relationship("DEADLINE_FOR_COMPLIANCE", "Deadline", "Compliance"),
        Relationship("FILING_HAS_DEADLINE", "Filing", "Deadline"),
        Relationship("FILING_HAS_SUBMISSION", "Filing", "Submission"),
        Relationship("FILING_REQUIRES_REVIEW", "Filing", "Review"),
        Relationship("FILING_COMMUNICATES_WITH_CONTACT", "Filing", "RegulatoryContact"),
        Relationship("DOCUMENT_SUPPORTS_FILING", "Document", "Filing"),
        Relationship("SUBMISSION_RECEIVES_REVIEW", "Submission", "Review"),
        Relationship("REVIEW_REQUIRES_APPROVAL", "Review", "Approval"),
        Relationship("CONTACT_IS_REGULATORY_CONTACT", "RegulatoryContact", "*"),
        Relationship("USER_REVIEWS_FILING", "*", "Filing"),
    ]
    return Schema("roboreport", nodes=nodes, relationships=rels,
                  description="Regulatory reporting")


EXTENSIONS = {
    "roboinvestor": roboinvestor_schema,
    "robofo": robofo_schema,
    "robohrm": robohrm_schema,
    "roboepm": roboepm_schema,
    "roboscm": roboscm_schema,
    "roboreport": roboreport_schema,
}


def load_schema(extensions: list[str] | None = None) -> Schema:
    """Compose base + named extensions (the LadybugSchemaLoader
    semantics, /root/reference/robosystems/schemas/loader.py:22-108).
    roboledger lives in its own module but loads by name here too."""
    from robosystems_spark.schema.base import base_schema
    from robosystems_spark.schema.roboledger import roboledger_schema

    all_exts = {"roboledger": roboledger_schema, **EXTENSIONS}
    schema = base_schema()
    for name in extensions or []:
        if name not in all_exts:
            raise KeyError(f"Unknown schema extension {name!r}; have {sorted(all_exts)}")
        schema = schema.merge(all_exts[name]())
    return schema
