"""XBRL filing facts → graph frames.

The reference's XBRLGraphProcessor (/root/reference/robosystems/
adapters/sec/processors/xbrl_graph.py:43-1734) iterates parsed-filing
facts in a Python loop appending to ~30 pandas frames.  Here the input
is a DataFrame of raw facts (one row per fact as produced by any XBRL
parser — Arelle in the reference; parsing itself is outside the
engine) and every output table is a column-level transformation:

- deterministic IDs via content hashes (ids.py semantics: same fact →
  same ID on re-ingestion, no driver-side counters)
- node tables deduplicated on their natural key
- decimal scaling for numeric values (xbrl_graph.py:573-587)
- oversized text-block values externalized, URL kept in the column
  (textblock.py:19-46)

Expected input columns (all STRING unless noted):
  entity_cik, entity_name, accession, form, filing_date,
  concept_qname, concept_uri, value, decimals, unit,
  period_start (nullable), period_end (nullable), period_instant
  (nullable), dimensions MAP<STRING,STRING> (nullable)

Scale notes: one pass over the fact table per output frame, each a
narrow projection + dropDuplicates on a hashed key (uniform shuffle);
no driver-side loops, no UDFs except the externalization seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.functions.ids import content_hash_id
from robosystems_spark.functions.xbrl import apply_decimal_scaling

TEXTBLOCK_THRESHOLD = 1024


def build_xbrl_graph_frames(
    raw_facts: DataFrame,
    externalize_store: str | None = None,
) -> dict[str, DataFrame]:
    """Build roboledger node/relationship frames from raw XBRL facts."""
    rf = raw_facts

    # deterministic identifiers (adapters/sec/processors/ids.py behavior)
    rf = rf.withColumns(
        {
            "_entity_id": content_hash_id("entity_cik", prefix="ent_"),
            "_report_id": content_hash_id("accession", prefix="rep_"),
            "_element_id": content_hash_id("concept_uri", prefix="elem_"),
            "_unit_id": content_hash_id("unit", prefix="unit_"),
            "_period_id": content_hash_id(
                "period_start", "period_end", "period_instant", prefix="per_"
            ),
            "_fact_id": content_hash_id(
                "accession", "concept_uri", "period_start", "period_end",
                "period_instant", "unit", "dimensions", prefix="fact_",
            ),
        }
    )
    rf = rf.withColumn(
        "_numeric_value",
        apply_decimal_scaling(F.col("value"), F.col("decimals")),
    ).withColumn(
        "_is_numeric", F.col("value").try_cast("double").isNotNull()
    )
    rf = rf.cache()

    entity = rf.select(
        F.col("_entity_id").alias("identifier"),
        F.col("entity_cik").alias("cik"),
        F.col("entity_name").alias("name"),
    ).dropDuplicates(["identifier"])

    report = rf.select(
        F.col("_report_id").alias("identifier"),
        F.col("form"),
        F.col("filing_date"),
        F.col("accession").alias("accession_number"),
    ).dropDuplicates(["identifier"])

    # concept elements + axis/member elements referenced by dimensions
    _null = F.lit(None).cast("string")
    concept_elems = rf.select(
        F.col("_element_id").alias("identifier"),
        F.col("concept_uri").alias("uri"),
        F.col("concept_qname").alias("qname"),
        F.element_at(F.split("concept_qname", ":"), -1).alias("name"),
        _null.alias("classification"),
        _null.alias("period_type"),
    )
    dim_uris = rf.filter(F.col("dimensions").isNotNull()).select(
        F.explode("dimensions").alias("axis_uri", "member_uri")
    )
    dim_elems = (
        dim_uris.select(F.col("axis_uri").alias("uri"))
        .unionByName(dim_uris.select(F.col("member_uri").alias("uri")))
        .select(
            content_hash_id("uri", prefix="elem_").alias("identifier"),
            "uri",
            F.col("uri").alias("qname"),
            F.element_at(F.split("uri", ":"), -1).alias("name"),
            _null.alias("classification"),
            _null.alias("period_type"),
        )
    )
    element = concept_elems.unionByName(dim_elems).dropDuplicates(["identifier"])

    period = rf.select(
        F.col("_period_id").alias("identifier"),
        F.col("period_start").alias("start_date"),
        F.coalesce("period_end", "period_instant").alias("end_date"),
        F.year(F.coalesce("period_end", "period_instant").cast("date")).alias("fiscal_year"),
    ).dropDuplicates(["identifier"])

    unit = rf.filter(F.col("unit").isNotNull()).select(
        F.col("_unit_id").alias("identifier"),
        F.col("unit").alias("measure"),
        F.col("unit").alias("value"),
    ).dropDuplicates(["identifier"])

    fact = rf.select(
        F.col("_fact_id").alias("identifier"),
        F.col("value"),
        F.when(F.col("_is_numeric"), F.col("_numeric_value")).alias("numeric_value"),
        F.when(F.col("_is_numeric"), "Numeric").otherwise("Nonnumeric").alias("fact_type"),
        F.col("decimals"),
    ).dropDuplicates(["identifier"])
    if externalize_store is not None:
        from robosystems_spark.functions.external import externalize_large_values

        fact = externalize_large_values(
            fact, "value", externalize_store, TEXTBLOCK_THRESHOLD
        )

    dims = rf.filter(F.col("dimensions").isNotNull()).select(
        "_fact_id", F.explode("dimensions").alias("axis_uri", "member_uri")
    ).withColumn(
        "identifier", content_hash_id("_fact_id", "axis_uri", "member_uri", prefix="fd_")
    )
    fact_dimension = dims.select(
        "identifier", "axis_uri", "member_uri", F.lit(True).alias("is_explicit"),
        F.lit(False).alias("is_typed"),
    ).dropDuplicates(["identifier"])

    def edge(src: str, dst: str) -> DataFrame:
        return rf.select(F.col(src).alias("src"), F.col(dst).alias("dst")).dropDuplicates()

    frames = {
        "Entity": entity,
        "Report": report,
        "Element": element,
        "Period": period,
        "Unit": unit,
        "Fact": fact,
        "FactDimension": fact_dimension,
        "ENTITY_HAS_REPORT": edge("_entity_id", "_report_id"),
        "REPORT_HAS_FACT": edge("_report_id", "_fact_id"),
        "FACT_HAS_ELEMENT": edge("_fact_id", "_element_id"),
        "FACT_HAS_ENTITY": edge("_fact_id", "_entity_id"),
        "FACT_HAS_PERIOD": edge("_fact_id", "_period_id"),
        "FACT_HAS_UNIT": rf.filter(F.col("unit").isNotNull())
        .select(F.col("_fact_id").alias("src"), F.col("_unit_id").alias("dst"))
        .dropDuplicates(),
        "FACT_HAS_DIMENSION": dims.select(
            F.col("_fact_id").alias("src"), F.col("identifier").alias("dst")
        ).dropDuplicates(),
        "FACT_DIMENSION_AXIS_ELEMENT": dims.select(
            F.col("identifier").alias("src"),
            content_hash_id("axis_uri", prefix="elem_").alias("dst"),
        ).dropDuplicates(),
        "FACT_DIMENSION_MEMBER_ELEMENT": dims.select(
            F.col("identifier").alias("src"),
            content_hash_id("member_uri", prefix="elem_").alias("dst"),
        ).dropDuplicates(),
    }
    return frames


NODE_TABLES = ["Entity", "Report", "Element", "Period", "Unit", "Fact", "FactDimension"]
REL_TABLES = [
    "ENTITY_HAS_REPORT", "REPORT_HAS_FACT", "FACT_HAS_ELEMENT", "FACT_HAS_ENTITY",
    "FACT_HAS_PERIOD", "FACT_HAS_UNIT", "FACT_HAS_DIMENSION",
    "FACT_DIMENSION_AXIS_ELEMENT", "FACT_DIMENSION_MEMBER_ELEMENT",
]
