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
from pyspark.sql import types as T

from robosystems_spark.functions.ids import content_hash_id
from robosystems_spark.functions.xbrl import apply_decimal_scaling

TEXTBLOCK_THRESHOLD = 1024

# The PARSE SEAM — this module's input contract (the analog of
# multimodal.py's decode_fn seam: parsing is pluggable, the engine
# side is fixed).  One row per reported fact.  An Arelle front-end
# fills each field from the parsed model as follows
# (xbrl_graph.py:43-1734 consumes the same objects imperatively):
#
#   entity_cik      ModelXbrl entity identifier (context.entityIdentifier[1])
#   entity_name     dei:EntityRegistrantName fact / filer metadata
#   accession       filing accession number (filing metadata)
#   form            form type, e.g. 10-K (filing metadata)
#   filing_date     filing date, ISO string (filing metadata)
#   concept_qname   fact.qname (prefixed name, e.g. us-gaap:Assets)
#   concept_uri     fact.concept.qname.namespaceURI + '#' + localName
#   value           fact.value / fact.xValue, stringified
#   decimals        fact.decimals ('INF', '-6', ... — stays a string)
#   unit            fact.unit measures joined (e.g. iso4217:USD,
#                   or numerator/denominator pairs), NULL for non-numeric
#   period_start    context.startDatetime for duration contexts, else NULL
#   period_end      context.endDatetime for duration contexts, else NULL
#   period_instant  context.instantDatetime for instant contexts, else NULL
#   dimensions      context segment/scenario explicit dimensions as
#                   MAP<dimension qname, member qname>, NULL when none
#
# Every STRING may be NULL except the identity spine
# (entity_cik, accession, concept_qname, concept_uri).
RAW_FACT_SCHEMA = T.StructType(
    [
        T.StructField("entity_cik", T.StringType(), False),
        T.StructField("entity_name", T.StringType(), True),
        T.StructField("accession", T.StringType(), False),
        T.StructField("form", T.StringType(), True),
        T.StructField("filing_date", T.StringType(), True),
        T.StructField("concept_qname", T.StringType(), False),
        T.StructField("concept_uri", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("decimals", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("period_start", T.StringType(), True),
        T.StructField("period_end", T.StringType(), True),
        T.StructField("period_instant", T.StringType(), True),
        T.StructField(
            "dimensions", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)


class RawFactSchemaError(ValueError):
    """The input DataFrame does not satisfy RAW_FACT_SCHEMA."""


def validate_raw_facts(df: DataFrame) -> DataFrame:
    """Validate a raw-facts DataFrame against :data:`RAW_FACT_SCHEMA`
    and coerce column types to it (extra columns are allowed and
    preserved).  Raises :class:`RawFactSchemaError` naming every
    missing column and its Arelle-side source, so a front-end author
    sees exactly what to supply."""
    have = set(df.columns)
    missing = [f.name for f in RAW_FACT_SCHEMA.fields if f.name not in have]
    if missing:
        raise RawFactSchemaError(
            "raw XBRL facts are missing required column(s) "
            f"{missing} — see pipelines/xbrl.py RAW_FACT_SCHEMA for the "
            "parse seam contract (each field's Arelle model source is "
            "documented there)"
        )
    coerced = df.withColumns(
        {
            f.name: F.col(f.name).cast(f.dataType)
            for f in RAW_FACT_SCHEMA.fields
            if df.schema[f.name].dataType != f.dataType
        }
    )
    return coerced


def build_xbrl_graph_frames(
    raw_facts: DataFrame,
    externalize_store: str | None = None,
) -> dict[str, DataFrame]:
    """Build roboledger node/relationship frames from raw XBRL facts
    (input contract: :data:`RAW_FACT_SCHEMA`, validated on entry)."""
    rf = validate_raw_facts(raw_facts)

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

    # divided units 'num/denom' carry numerator/denominator URIs
    # (make_units, xbrl_graph.py:720-744); single measures leave them
    # null (:698-705)
    is_divide = F.col("unit").contains("/")
    num = F.element_at(F.split("unit", "/"), 1)
    denom = F.element_at(F.split("unit", "/"), 2)
    unit = rf.filter(F.col("unit").isNotNull()).select(
        F.col("_unit_id").alias("identifier"),
        F.col("unit").alias("measure"),
        F.col("unit").alias("value"),
        F.when(is_divide, F.concat(F.lit("unit:"), num)).alias("numerator_uri"),
        F.when(is_divide, F.concat(F.lit("unit:"), denom)).alias("denominator_uri"),
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
        "identifier", "axis_uri", "member_uri",
        # context segment/scenario discrimination (xbrl_graph.py:782-788);
        # the fact-input shape carries explicit segment dimensions
        F.lit("segment").alias("type"),
        F.lit(True).alias("is_explicit"),
        F.lit(False).alias("is_typed"),
    ).dropDuplicates(["identifier"])

    def edge(src: str, dst: str) -> DataFrame:
        return rf.select(F.col(src).alias("src"), F.col(dst).alias("dst")).dropDuplicates()

    # one fact set per report (xbrl_graph.py:527-551: '{report_uri}#factset',
    # deterministic id; REPORT_HAS_FACT_SET context carries the form)
    rf = rf.withColumn(
        "_factset_id",
        content_hash_id(
            F.concat(F.col("accession"), F.lit("#factset")), prefix="fs_"
        ),
    )
    fact_set = rf.select(
        F.col("_factset_id").alias("identifier"),
        F.concat(F.col("accession"), F.lit("#factset")).alias("name"),
        F.lit(None).cast("string").alias("description"),
    ).dropDuplicates(["identifier"])

    frames = {
        "Entity": entity,
        "Report": report,
        "Element": element,
        "Period": period,
        "Unit": unit,
        "Fact": fact,
        "FactDimension": fact_dimension,
        "FactSet": fact_set,
        "REPORT_HAS_FACT_SET": rf.select(
            F.col("_report_id").alias("src"),
            F.col("_factset_id").alias("dst"),
            F.concat(
                F.lit("Report facts for "), F.coalesce("form", F.lit("filing"))
            ).alias("fact_set_context"),
        ).dropDuplicates(["src", "dst"]),
        "FACT_SET_CONTAINS_FACT": edge("_factset_id", "_fact_id"),
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


def classify_elements(elements: DataFrame) -> DataFrame:
    """Element classification (xbrl_graph.py:1584-1639 semantics) as a
    single CASE expression over element metadata columns.

    Expects nullable STRING/BOOLEAN columns ``substitution_group_qname``
    (e.g. 'xbrldt:hypercubeItem'), ``period_type``, ``type_name``
    (local type name, e.g. 'domainItemType'), ``nillable``, ``name``
    and BOOLEAN ``is_abstract``; adds/overwrites ``classification``.
    """
    sg = F.col("substitution_group_qname")
    abstract = F.coalesce(F.col("is_abstract"), F.lit(False))
    pt = F.col("period_type")
    tn = F.col("type_name")
    nillable = F.coalesce(F.col("nillable").cast("boolean"), F.lit(False))
    classification = (
        F.when(
            (sg == "xbrldt:hypercubeItem") & (pt == "duration") & abstract,
            F.lit("hypercubeElement"),
        )
        .when(
            (sg == "xbrldt:hypercubeItem") & (pt == "instant") & abstract,
            F.lit("dimensionElement"),
        )
        .when(
            (sg == "xbrli:item") & (pt == "duration") & abstract,
            F.when((tn == "domainItemType") & nillable, F.lit("domainElement"))
            .when((tn == "domainItemType") & ~nillable, F.lit("memberElement"))
            .when(F.col("name").endswith("LineItems"), F.lit("lineItemsElement"))
            .otherwise(F.lit("listItemsElement")),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return elements.withColumn("classification", classification)


# Arcrole URIs the reference branches on (xbrl_graph.py:1454-1458,
# XbrlConst.parentChild / summationItem)
ARCROLE_PARENT_CHILD = "http://www.xbrl.org/2003/arcrole/parent-child"
ARCROLE_SUMMATION_ITEM = "http://www.xbrl.org/2003/arcrole/summation-item"


def build_xbrl_taxonomy_frames(
    raw_arcs: DataFrame,
    raw_labels: DataFrame | None = None,
    raw_references: DataFrame | None = None,
    raw_elements: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Taxonomy linkbase rows → Structure / Association / Label /
    Reference / Taxonomy frames + their relationship tables.

    Re-expresses make_taxonomy/make_structures/make_associations/
    make_element_labels/make_element_references (xbrl_graph.py:
    1284-1734): the reference walks Arelle's in-memory relationship
    sets row by row; here the parsed linkbase IS the DataFrame and
    every frame is a projection + dropDuplicates (uniform hash
    shuffle), with the per-structure root-concept set derived by a
    distributed anti-join instead of Arelle's ``rootConcepts``.

    ``raw_arcs`` (one row per presentation/calculation/definition arc):
      accession, taxonomy_uri, role_uri, role_id (nullable: falls back
      to the role_uri fragment), role_definition (nullable,
      'Number - Type - Name' SEC convention), arcrole, parent_uri,
      child_uri, order_value DOUBLE (nullable), weight DOUBLE
      (nullable), preferred_label (nullable)

    ``raw_labels``: element_uri, value, type (label role URI), language
    ``raw_references``: element_uri, value, type (reference role URI)
    ``raw_elements`` (optional metadata for classification —
      classify_elements columns): element_uri, qname, period_type,
      type_name, nice_type, balance, substitution_group_qname,
      substitution_group_uri, item_type_uri, is_abstract, nillable, ...

    IDs are deterministic content hashes everywhere — including
    Association, where the reference used a random uuid7 per run
    (xbrl_graph.py:1449); determinism makes re-ingestion idempotent
    across a cluster, which random IDs cannot be.
    """
    arcs = raw_arcs.withColumns(
        {
            "_role_id": F.coalesce(
                "role_id", F.element_at(F.split("role_uri", "/"), -1)
            ),
            "_report_id": content_hash_id("accession", prefix="rep_"),
            "_taxonomy_id": content_hash_id("taxonomy_uri", prefix="tax_"),
        }
    )
    arcs = arcs.withColumns(
        {
            "_structure_uri": F.concat_ws("#", "taxonomy_uri", "_role_id"),
        }
    )
    # filing-specific structure id (xbrl_graph.py:1358-1368)
    arcs = arcs.withColumns(
        {
            "_structure_id": content_hash_id(
                F.concat(F.lit("structure:"), F.col("accession"), F.lit("#"), F.col("_structure_uri")),
                prefix="struct_",
            ),
            "_parent_id": content_hash_id("parent_uri", prefix="elem_"),
            "_child_id": content_hash_id("child_uri", prefix="elem_"),
            "_association_id": content_hash_id(
                "accession", "role_uri", "arcrole", "parent_uri", "child_uri",
                "order_value", prefix="assoc_",
            ),
        }
    ).cache()

    taxonomy = arcs.select(
        F.col("_taxonomy_id").alias("identifier"),
        F.col("taxonomy_uri").alias("uri"),
        F.element_at(F.split("taxonomy_uri", "/"), -1).alias("name"),
        F.lit(None).cast("string").alias("version"),
        F.col("taxonomy_uri").alias("namespace"),
    ).dropDuplicates(["identifier"])

    # 'Number - Type - Name' definition split (xbrl_graph.py:1373-1385)
    defn = F.col("role_definition")
    number = F.trim(F.regexp_extract(defn, r"^([^-]*)-", 1))
    net_type = F.trim(F.regexp_extract(defn, r"^[^-]*-\s*([^-]*)", 1))
    net_name = F.trim(F.regexp_extract(defn, r"^[^-]*-[^-]*-\s*(.*)$", 1))
    structure = arcs.select(
        F.col("_structure_id").alias("identifier"),
        F.col("_structure_uri").alias("uri"),
        F.col("role_uri").alias("network_uri"),
        F.coalesce(defn, F.lit("")).alias("definition"),
        F.when(number != "", number).alias("number"),
        F.when(net_type != "", net_type).alias("type"),
        F.when(net_name != "", net_name).alias("name"),
    ).dropDuplicates(["identifier"])

    # root concepts per structure: parents that never appear as a child
    # in the same structure (distributed twin of rootConcepts)
    children = arcs.select("_structure_id", F.col("_child_id").alias("_pid")).distinct()
    roots = (
        arcs.select("_structure_id", F.col("_parent_id").alias("_pid"))
        .distinct()
        .join(children, ["_structure_id", "_pid"], "left_anti")
        .withColumn("_is_root", F.lit(True))
    )
    assoc_base = arcs.join(
        roots.withColumnRenamed("_pid", "_parent_id"),
        ["_structure_id", "_parent_id"],
        "left",
    )
    association = assoc_base.select(
        F.col("_association_id").alias("identifier"),
        F.col("arcrole"),
        F.col("order_value").cast("double"),
        F.when(F.col("arcrole") == ARCROLE_PARENT_CHILD, "Presentation")
        .when(F.col("arcrole") == ARCROLE_SUMMATION_ITEM, "Calculation")
        .otherwise("Other")
        .alias("association_type"),
        F.when(
            F.col("arcrole") == ARCROLE_SUMMATION_ITEM, F.col("weight").cast("double")
        ).alias("weight"),
        F.coalesce("_is_root", F.lit(False)).alias("root"),
        F.col("preferred_label"),
    ).dropDuplicates(["identifier"])

    # elements referenced by arcs, enriched + classified when metadata
    # is supplied (make_element / make_element_classification)
    _null = F.lit(None).cast("string")
    arc_elems = (
        arcs.select(F.col("parent_uri").alias("uri"))
        .unionByName(arcs.select(F.col("child_uri").alias("uri")))
        .distinct()
    )
    if raw_elements is not None:
        meta = raw_elements.withColumnRenamed("element_uri", "uri")
        enriched = arc_elems.join(meta, "uri", "left")
        for c in ("qname",):
            if c not in enriched.columns:
                enriched = enriched.withColumn(c, _null)
        enriched = enriched.withColumn("qname", F.coalesce("qname", "uri")).withColumn(
            "name", F.element_at(F.split(F.coalesce("qname", "uri"), ":"), -1)
        )
        for c in ("substitution_group_qname", "period_type", "type_name", "nillable"):
            if c not in enriched.columns:
                enriched = enriched.withColumn(c, _null)
        if "is_abstract" not in enriched.columns:
            enriched = enriched.withColumn("is_abstract", F.lit(None).cast("boolean"))
        element = classify_elements(enriched).select(
            content_hash_id("uri", prefix="elem_").alias("identifier"),
            "uri",
            "qname",
            "name",
            "classification",
            "period_type",
            *[
                F.col(c)
                for c in ("type_name", "balance", "is_abstract",
                          "substitution_group_uri", "item_type_uri")
                if c in enriched.columns
            ],
        )
    else:
        element = arc_elems.select(
            content_hash_id("uri", prefix="elem_").alias("identifier"),
            "uri",
            F.col("uri").alias("qname"),
            F.element_at(F.split("uri", "#"), -1).alias("name"),
            _null.alias("classification"),
            _null.alias("period_type"),
        )
    element = element.dropDuplicates(["identifier"])

    frames: dict[str, DataFrame] = {
        "Taxonomy": taxonomy,
        "Structure": structure,
        "Association": association,
        "Element": element,
        "REPORT_USES_TAXONOMY": arcs.select(
            F.col("_report_id").alias("src"), F.col("_taxonomy_id").alias("dst"),
            F.concat(
                F.lit("Uses taxonomy: "),
                F.element_at(F.split("taxonomy_uri", "/"), -1),
            ).alias("taxonomy_context"),
        ).dropDuplicates(["src", "dst"]),
        "STRUCTURE_HAS_TAXONOMY": arcs.select(
            F.col("_structure_id").alias("src"), F.col("_taxonomy_id").alias("dst"),
            F.concat(F.lit("Taxonomy: "), F.col("taxonomy_uri")).alias(
                "taxonomy_context"
            ),
        ).dropDuplicates(["src", "dst"]),
        "STRUCTURE_HAS_ASSOCIATION": arcs.select(
            F.col("_structure_id").alias("src"),
            F.col("_association_id").alias("dst"),
        ).dropDuplicates(["src", "dst"]),
        "ASSOCIATION_HAS_FROM_ELEMENT": arcs.select(
            F.col("_association_id").alias("src"), F.col("_parent_id").alias("dst")
        ).dropDuplicates(["src", "dst"]),
        "ASSOCIATION_HAS_TO_ELEMENT": arcs.select(
            F.col("_association_id").alias("src"), F.col("_child_id").alias("dst")
        ).dropDuplicates(["src", "dst"]),
    }

    if raw_labels is not None:
        lbl = raw_labels.withColumns(
            {
                "_label_id": content_hash_id("value", "type", "language", prefix="lbl_"),
                "_element_id": content_hash_id("element_uri", prefix="elem_"),
            }
        )
        frames["Label"] = lbl.select(
            F.col("_label_id").alias("identifier"),
            F.col("value"),
            F.col("type"),
            F.col("language"),
        ).dropDuplicates(["identifier"])
        frames["ELEMENT_HAS_LABEL"] = lbl.select(
            F.col("_element_id").alias("src"),
            F.col("_label_id").alias("dst"),
            F.concat(F.lit("Label: "), F.coalesce("type", F.lit("unknown"))).alias(
                "label_context"
            ),
        ).dropDuplicates(["src", "dst"])
        frames["TAXONOMY_HAS_LABEL"] = (
            lbl.crossJoin(
                F.broadcast(taxonomy.select(F.col("identifier").alias("_tax_id")))
            )
            .select(
                F.col("_tax_id").alias("src"),
                F.col("_label_id").alias("dst"),
                F.concat(
                    F.lit("Taxonomy label: "), F.coalesce("type", F.lit("unknown"))
                ).alias("label_context"),
            )
            .dropDuplicates(["src", "dst"])
        )

    if raw_references is not None:
        ref = raw_references.withColumns(
            {
                "_reference_id": content_hash_id("value", "type", prefix="ref_"),
                "_element_id": content_hash_id("element_uri", prefix="elem_"),
            }
        )
        frames["Reference"] = ref.select(
            F.col("_reference_id").alias("identifier"),
            F.col("value"),
            F.col("type"),
        ).dropDuplicates(["identifier"])
        frames["ELEMENT_HAS_REFERENCE"] = ref.select(
            F.col("_element_id").alias("src"),
            F.col("_reference_id").alias("dst"),
            F.concat(
                F.lit("Reference: "), F.coalesce("type", F.lit("unknown"))
            ).alias("reference_context"),
        ).dropDuplicates(["src", "dst"])
        frames["TAXONOMY_HAS_REFERENCE"] = (
            ref.crossJoin(
                F.broadcast(taxonomy.select(F.col("identifier").alias("_tax_id")))
            )
            .select(
                F.col("_tax_id").alias("src"),
                F.col("_reference_id").alias("dst"),
                F.concat(
                    F.lit("Taxonomy reference: "),
                    F.coalesce("type", F.lit("unknown")),
                ).alias("reference_context"),
            )
            .dropDuplicates(["src", "dst"])
        )

    # ELEMENT_IN_TAXONOMY (schemas/base.py:206): every element that an
    # arc places in a taxonomy's structures — union of both arc ends,
    # one uniform dedup shuffle
    frames["ELEMENT_IN_TAXONOMY"] = (
        arcs.select(F.col("_parent_id").alias("src"), F.col("_taxonomy_id").alias("dst"))
        .unionByName(
            arcs.select(F.col("_child_id").alias("src"), F.col("_taxonomy_id").alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
    )
    return frames


NODE_TABLES = [
    "Entity", "Report", "Element", "Period", "Unit", "Fact", "FactDimension",
    "FactSet",
]
REL_TABLES = [
    "ENTITY_HAS_REPORT", "REPORT_HAS_FACT", "FACT_HAS_ELEMENT", "FACT_HAS_ENTITY",
    "FACT_HAS_PERIOD", "FACT_HAS_UNIT", "FACT_HAS_DIMENSION",
    "FACT_DIMENSION_AXIS_ELEMENT", "FACT_DIMENSION_MEMBER_ELEMENT",
    "REPORT_HAS_FACT_SET", "FACT_SET_CONTAINS_FACT",
]
TAXONOMY_NODE_TABLES = ["Taxonomy", "Structure", "Association", "Label", "Reference"]
TAXONOMY_REL_TABLES = [
    "REPORT_USES_TAXONOMY", "STRUCTURE_HAS_TAXONOMY", "STRUCTURE_HAS_ASSOCIATION",
    "ASSOCIATION_HAS_FROM_ELEMENT", "ASSOCIATION_HAS_TO_ELEMENT",
    "ELEMENT_HAS_LABEL", "TAXONOMY_HAS_LABEL",
    "ELEMENT_HAS_REFERENCE", "TAXONOMY_HAS_REFERENCE",
    "ELEMENT_IN_TAXONOMY",
]


def calculation_validation(
    facts: DataFrame,
    arcs: DataFrame,
    ndigits: int = 6,
) -> DataFrame:
    """Calculation-linkbase consistency as a DataFrame check (r12):
    for every (accession, context, unit, role, parent) with a reported
    parent fact, computed = Σ child_value · weight over the
    summation-item children REPORTED IN THE SAME context/unit, and the
    pair is consistent when |reported − computed| fits the
    decimals-derived tolerance (0.5·10^−min(decimals) across parent
    and bound children; decimals INF/absent mean exact, per XBRL 2.1
    §5.2.5.2 and Arelle's ValidateXbrlCalcs — the depth the
    reference reaches through Arelle, xbrl_graph.py:155-226).

    ``facts``: RAW_FACT_SCHEMA rows (value STRING, decimals STRING).
    ``arcs``: raw_arcs rows (e.g. :func:`~robosystems_spark.pipelines.
    xbrl_parse.resolve_dts` output) — only summation-item arcs bind.
    Fragment-vs-qname concept matching uses the locator fragment
    against the fact's concept local name (the fixture/SEC element-id
    convention ``<prefix>_<LocalName>`` with the prefix stripped).

    Scale shape: one equi-join keyed by (accession, concept key) to
    bind child facts to arcs, one grouped sum per (context, role,
    parent), one join back to the parent facts — all shuffle-keyed on
    bounded-cardinality keys; nothing collects.

    Returns (accession, context_key, role_uri, parent_concept,
    reported, computed, n_children, tolerance, consistent), rounded to
    ``ndigits`` for engine-stable hashing."""
    frag = lambda c: F.regexp_replace(  # noqa: E731
        F.element_at(F.split(F.col(c), "#"), -1), r"^[A-Za-z0-9]+_", ""
    )
    f = facts.select(
        "accession",
        F.element_at(F.split("concept_qname", ":"), -1).alias("_concept"),
        F.col("value").cast("double").alias("_val"),
        F.when(
            F.col("decimals").isNull() | (F.upper("decimals") == "INF"),
            F.lit(999),
        )
        .otherwise(F.col("decimals").cast("int"))
        .alias("_dec"),
        F.concat_ws(
            "|",
            F.coalesce(F.col("period_start"), F.lit("")),
            F.coalesce(F.col("period_end"), F.lit("")),
            F.coalesce(F.col("period_instant"), F.lit("")),
            F.coalesce(F.col("unit"), F.lit("")),
        ).alias("context_key"),
    ).filter(F.col("_val").isNotNull())
    calc = (
        arcs.filter(F.col("arcrole") == ARCROLE_SUMMATION_ITEM)
        .select(
            "accession",
            "role_uri",
            frag("parent_uri").alias("_parent"),
            frag("child_uri").alias("_child"),
            F.coalesce(F.col("weight"), F.lit(1.0)).alias("_w"),
        )
        # one relationship per (role, parent, child): a DTS that names
        # the same arc in two linkbase documents must not double-count
        # the child (XBRL 2.1 base-set equivalence)
        .dropDuplicates(["accession", "role_uri", "_parent", "_child"])
    )
    bound = calc.join(
        f.select(
            "accession",
            F.col("_concept").alias("_child"),
            "context_key",
            F.col("_val").alias("_cv"),
            F.col("_dec").alias("_cdec"),
        ),
        ["accession", "_child"],
    )
    sums = bound.groupBy(
        "accession", "context_key", "role_uri", "_parent"
    ).agg(
        F.sum(F.col("_w") * F.col("_cv")).alias("_computed"),
        F.count(F.lit(1)).alias("n_children"),
        F.min("_cdec").alias("_cmindec"),
    )
    parent_f = f.select(
        "accession",
        F.col("_concept").alias("_parent"),
        "context_key",
        F.col("_val").alias("_reported"),
        F.col("_dec").alias("_pdec"),
    )
    mindec = F.least(F.col("_pdec"), F.col("_cmindec"))
    tol = F.when(mindec >= 999, F.lit(0.0)).otherwise(
        F.lit(0.5) * F.pow(F.lit(10.0), -mindec.cast("double"))
    )
    return (
        sums.join(parent_f, ["accession", "context_key", "_parent"])
        .select(
            "accession",
            "context_key",
            "role_uri",
            F.col("_parent").alias("parent_concept"),
            F.round(F.col("_reported"), ndigits).alias("reported"),
            F.round(F.col("_computed"), ndigits).alias("computed"),
            "n_children",
            F.round(tol, ndigits).alias("tolerance"),
            (
                F.abs(F.col("_reported") - F.col("_computed")) <= tol
            ).alias("consistent"),
        )
    )
