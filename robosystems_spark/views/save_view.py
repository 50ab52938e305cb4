"""Saved views: report writeback onto the graph.

Semantics of /root/reference/robosystems/operations/views/
save_view.py:107-242 — a computed view (e.g. a mapped trial balance)
is persisted as a Report node plus one Fact node per value, wired
with REPORT_HAS_FACT / FACT_HAS_ELEMENT edges; metadata updates are
point writes; deletion cascades report→facts (DETACH DELETE).

Re-save follows the reference flow (check_report_exists →
delete_report_data → create_report_node): an existing report's facts
and edges are deleted BEFORE the new view is written, so changed
values land and elements dropped from the view leave no orphans.
The Report node carries the reference's saved-view shape
(save_view.py:156-174): name, uri, report_date, period_end_date,
updated_at, with ``form='saved_view'`` as the view-report tag.

Mutation mapping (SURVEY §2.11): CREATE→copy_into, MERGE→upsert,
SET→update_where, DETACH DELETE→delete_where edges-then-nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.functions.ids import content_hash_id
from robosystems_spark.sources.materialize import GraphStore


def report_exists(store: GraphStore, report_id: str) -> bool:
    """check_report_exists (save_view.py:107-118): MATCH ... LIMIT 1."""
    if not store.exists("Report"):
        return False
    return (
        store.read("Report")
        .filter(F.col("identifier") == report_id)
        .limit(1)
        .count()
        > 0
    )


def delete_report_data(store: GraphStore, report_id: str) -> dict[str, int]:
    """Delete a report's facts and their edges, keeping the Report
    node (delete_report_data, save_view.py:121-141): the two-phase
    DETACH DELETE — edges first, then fact nodes.

    The fact-id set stays a DataFrame the whole way (a SEC-scale
    report runs to 10^5-10^6 facts): ``delete_where_in`` semi/anti-
    joins it against each table, so nothing is collected to the driver
    and no giant In-expression is compiled.  The snapshot read pins
    REPORT_HAS_FACT's manifest up front, so the id set stays valid
    while the edge rows themselves are deleted mid-sequence."""
    if not store.exists("REPORT_HAS_FACT"):
        return {"FACT_HAS_ELEMENT": 0, "REPORT_HAS_FACT": 0, "Fact": 0}
    fact_ids = (
        store.read("REPORT_HAS_FACT")
        .filter(F.col("src") == report_id)
        .select("dst")
    )
    removed = {}
    removed["FACT_HAS_ELEMENT"] = store.delete_where_in(
        "FACT_HAS_ELEMENT", ["src"], fact_ids.select(F.col("dst").alias("src"))
    )
    removed["REPORT_HAS_FACT"] = store.delete_where(
        "REPORT_HAS_FACT", F.col("src") == report_id
    )
    removed["Fact"] = store.delete_where_in(
        "Fact", ["identifier"], fact_ids.select(F.col("dst").alias("identifier"))
    )
    return removed


def save_report(
    store: GraphStore,
    view_df: DataFrame,
    report_id: str,
    report_name: str,
    value_col: str = "net_balance",
    element_col: str = "element_id",
    period_end: str | None = None,
    updated_at: str | None = None,
) -> dict[str, int]:
    """Persist a computed view as Report + Facts (+ edges).

    If the report already exists its fact data is deleted first
    (reference delete_report_data → create_report_node flow), then the
    Report node is upserted (MERGE ... SET) and fresh facts appended —
    a re-save with changed values therefore replaces them rather than
    silently no-oping on the PK anti-join."""
    spark = view_df.sparkSession

    existed = report_exists(store, report_id)
    replaced = delete_report_data(store, report_id) if existed else {}

    report = spark.createDataFrame(
        [
            (
                report_id,
                report_name,
                f"internal:{report_id}",
                period_end,
                period_end,
                updated_at,
                "saved_view",
                True,
                False,
            )
        ],
        "identifier string, name string, uri string, report_date string, "
        "period_end_date string, updated_at string, form string, "
        "processed boolean, failed boolean",
    )

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

    store.upsert("Report", report, ["identifier"])
    counts = {
        "Report": 1,
        "Fact": store.copy_into("Fact", facts, ["identifier"], ignore_errors=True),
        "REPORT_HAS_FACT": store.copy_into(
            "REPORT_HAS_FACT", report_fact, ["src", "dst"], ignore_errors=True
        ),
        "FACT_HAS_ELEMENT": store.copy_into(
            "FACT_HAS_ELEMENT", fact_element, ["src", "dst"], ignore_errors=True
        ),
        "replaced_facts": replaced.get("Fact", 0),
    }
    return counts


def update_report_metadata(store: GraphStore, report_id: str, updates: dict) -> int:
    """Point update of report properties (SET analog,
    save_view.py:180-199 update_report_node)."""
    return store.update_where(
        "Report", F.col("identifier") == report_id, updates
    )


def delete_report(store: GraphStore, report_id: str) -> dict[str, int]:
    """Cascade delete: facts' edges first, then facts, then the report
    (the two-phase DETACH DELETE, save_view.py:121-143)."""
    removed = delete_report_data(store, report_id)
    removed["Report"] = store.delete_where("Report", F.col("identifier") == report_id)
    return removed
