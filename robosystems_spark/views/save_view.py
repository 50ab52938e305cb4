"""Saved views: report writeback onto the graph.

Semantics of /root/reference/robosystems/operations/views/
save_view.py:121-242 — a computed view (e.g. a mapped trial balance)
is persisted as a Report node plus one Fact node per value, wired
with REPORT_HAS_FACT / FACT_HAS_ELEMENT edges; metadata updates are
point writes; deletion cascades report→facts (DETACH DELETE).

Mutation mapping (SURVEY §2.11): CREATE→copy_into, SET→update_where,
DETACH DELETE→delete_where edges-then-nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.functions.ids import content_hash_id
from robosystems_spark.sources.materialize import GraphStore


def save_report(
    store: GraphStore,
    view_df: DataFrame,
    report_id: str,
    report_name: str,
    value_col: str = "net_balance",
    element_col: str = "element_id",
) -> dict[str, int]:
    """Persist a computed view as Report + Facts (+ edges)."""
    spark = view_df.sparkSession
    report = spark.createDataFrame(
        [(report_id, report_name, "saved_view", False, False)],
        "identifier string, form string, filing_date string, processed boolean, failed boolean",
    ).withColumn("processed", F.lit(True))

    facts = view_df.select(
        content_hash_id(F.lit(report_id), F.col(element_col), prefix="fact_").alias(
            "identifier"
        ),
        F.col(value_col).cast("double").alias("numeric_value"),
        F.col(value_col).cast("string").alias("value"),
        F.lit("Numeric").alias("fact_type"),
        F.col(element_col).alias("_element_id"),
    )
    report_fact = facts.select(
        F.lit(report_id).alias("src"), F.col("identifier").alias("dst")
    )
    fact_element = facts.select(
        F.col("identifier").alias("src"), F.col("_element_id").alias("dst")
    )
    facts = facts.drop("_element_id")

    counts = {
        "Report": store.copy_into("Report", report, ["identifier"], ignore_errors=True),
        "Fact": store.copy_into("Fact", facts, ["identifier"], ignore_errors=True),
        "REPORT_HAS_FACT": store.copy_into(
            "REPORT_HAS_FACT", report_fact, ["src", "dst"], ignore_errors=True
        ),
        "FACT_HAS_ELEMENT": store.copy_into(
            "FACT_HAS_ELEMENT", fact_element, ["src", "dst"], ignore_errors=True
        ),
    }
    return counts


def update_report_metadata(store: GraphStore, report_id: str, updates: dict) -> int:
    """Point update of report properties (SET analog)."""
    return store.update_where(
        "Report", F.col("identifier") == report_id, updates
    )


def delete_report(store: GraphStore, report_id: str) -> dict[str, int]:
    """Cascade delete: facts' edges first, then facts, then the report
    (the two-phase DETACH DELETE, save_view.py:121-143)."""
    fact_ids = [
        r["dst"]
        for r in store.read("REPORT_HAS_FACT")
        .filter(F.col("src") == report_id)
        .collect()
    ]
    removed = {}
    removed["FACT_HAS_ELEMENT"] = store.delete_where(
        "FACT_HAS_ELEMENT", F.col("src").isin(fact_ids) if fact_ids else F.lit(False)
    )
    removed["REPORT_HAS_FACT"] = store.delete_where(
        "REPORT_HAS_FACT", F.col("src") == report_id
    )
    removed["Fact"] = store.delete_where(
        "Fact", F.col("identifier").isin(fact_ids) if fact_ids else F.lit(False)
    )
    removed["Report"] = store.delete_where("Report", F.col("identifier") == report_id)
    return removed
