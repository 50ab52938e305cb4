"""Element-mapping roll-ups: aggregate source elements into targets.

Semantics of /root/reference/robosystems/operations/views/
element_mapping.py:91-230: a mapping structure holds associations
(target_element, source_element, weight, aggregation_method); facts
for the source elements are grouped by (period_end, period_start,
entity_id, dimension_axis, dimension_member — whichever exist) and
rolled up per target with one of six methods:

  SUM, AVERAGE, WEIGHTED_AVERAGE (sum(v*w)/sum(w), 0 when total
  weight is 0), FIRST, LAST, CALCULATED (= SUM)

The reference implements this as a driver-side pandas groupby-apply;
here it is a single distributed aggregation: associations become a
broadcast DataFrame joined onto facts, every method's aggregate is
computed in one pass, and a CASE picks the method per target.

FIRST/LAST in a distributed engine need an explicit order; rows are
ordered by ``order_col`` (default: the group keys + element_id),
making the result deterministic where pandas relied on frame order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GROUPBY_CANDIDATES = (
    "period_end",
    "period_start",
    "entity_id",
    "dimension_axis",
    "dimension_member",
)

VALID_METHODS = {"sum", "average", "weighted_average", "first", "last", "calculated"}


@dataclass
class ElementAssociation:
    target_element: str
    source_element: str
    weight: float = 1.0
    aggregation_method: str = "sum"


@dataclass
class MappingStructure:
    name: str = "mapping"
    associations: list[ElementAssociation] = field(default_factory=list)


def mapping_from_frames(
    association: DataFrame,
    assoc_from: DataFrame,
    assoc_to: DataFrame,
    element: DataFrame,
    structure_assoc: DataFrame | None = None,
    structure_id: str | None = None,
    method: str = "sum",
    name: str = "mapping",
) -> MappingStructure:
    """Build a MappingStructure from pipeline frames (Association +
    ASSOCIATION_HAS_FROM/TO_ELEMENT + Element), optionally restricted
    to one Structure — the bridge from build_xbrl_taxonomy_frames
    output to apply_element_mapping, mirroring how the reference's
    mapping views read structure associations from the graph
    (/root/reference/robosystems/operations/views/element_mapping.py:91-143).

    The collect is bounded: a mapping structure is chart-of-accounts
    sized (the reference also holds it in memory).  Arc weight is the
    association weight (1.0 when null, the presentation-arc case).
    """
    assoc = association
    if structure_assoc is not None and structure_id is not None:
        keep = structure_assoc.filter(F.col("src") == structure_id).select(
            F.col("dst").alias("identifier")
        )
        assoc = assoc.join(keep, "identifier", "left_semi")
    elem = element.select(
        F.col("identifier").alias("_eid"), F.col("uri").alias("_euri")
    )
    rows = (
        assoc.select("identifier", "weight")
        .join(
            assoc_from.select(
                F.col("src").alias("identifier"), F.col("dst").alias("_from_id")
            ),
            "identifier",
        )
        .join(
            assoc_to.select(
                F.col("src").alias("identifier"), F.col("dst").alias("_to_id")
            ),
            "identifier",
        )
        .join(elem.withColumnRenamed("_eid", "_from_id").withColumnRenamed("_euri", "target"), "_from_id")
        .join(elem.withColumnRenamed("_eid", "_to_id").withColumnRenamed("_euri", "source"), "_to_id")
        .select("target", "source", "weight")
        .collect()
    )
    return MappingStructure(
        name=name,
        associations=[
            ElementAssociation(
                target_element=r["target"],
                source_element=r["source"],
                weight=float(r["weight"]) if r["weight"] is not None else 1.0,
                aggregation_method=method,
            )
            for r in rows
        ],
    )


def apply_element_mapping(
    fact_data: DataFrame,
    mapping: MappingStructure,
    order_col: str | None = None,
) -> DataFrame:
    """Roll up source-element facts into target elements.

    Returns one row per (target element x group key combination) with
    the aggregated value in the fact frame's value column
    (``numeric_value`` or ``net_balance``).
    """
    if not mapping.associations:
        return fact_data
    spark: SparkSession = fact_data.sparkSession
    cols = fact_data.columns
    value_col = "numeric_value" if "numeric_value" in cols else "net_balance"
    group_cols = [c for c in GROUPBY_CANDIDATES if c in cols]

    for a in mapping.associations:
        if a.aggregation_method not in VALID_METHODS:
            raise ValueError(f"Unknown aggregation method: {a.aggregation_method!r}")

    assoc = spark.createDataFrame(
        [
            (a.target_element, a.source_element, float(a.weight), a.aggregation_method)
            for a in mapping.associations
        ],
        "target_element string, source_element string, weight double, method string",
    )

    # source_element may be a URI or an element_id; map URIs to ids when
    # the fact frame carries both (reference uri_to_id_map behavior)
    facts = fact_data
    if "element_uri" in cols:
        facts = facts.withColumn("_src_key", F.coalesce("element_uri", "element_id"))
        assoc_joined = facts.join(
            F.broadcast(assoc),
            (F.col("_src_key") == F.col("source_element"))
            | (F.col("element_id") == F.col("source_element")),
        )
    else:
        assoc_joined = facts.join(
            F.broadcast(assoc), F.col("element_id") == F.col("source_element")
        )

    order_name = order_col or "element_id"
    v = F.col(value_col)
    agg = assoc_joined.groupBy("target_element", *group_cols).agg(
        F.first("method").alias("_method"),
        F.sum(v).alias("_sum"),
        F.avg(v).alias("_avg"),
        F.sum(v * F.col("weight")).alias("_wsum"),
        F.sum("weight").alias("_wtot"),
        F.expr(f"min_by(`{value_col}`, `{order_name}`)").alias("_first"),
        F.expr(f"max_by(`{value_col}`, `{order_name}`)").alias("_last"),
    )
    value = (
        F.when(F.col("_method").isin("sum", "calculated"), F.col("_sum"))
        .when(F.col("_method") == "average", F.col("_avg"))
        .when(
            F.col("_method") == "weighted_average",
            F.when(F.col("_wtot") == 0, F.lit(0.0)).otherwise(
                F.col("_wsum") / F.col("_wtot")
            ),
        )
        .when(F.col("_method") == "first", F.col("_first"))
        .when(F.col("_method") == "last", F.col("_last"))
    )
    out = agg.select(
        F.col("target_element").alias("element_id"),
        F.element_at(F.split("target_element", ":"), -1).alias("element_name"),
        *group_cols,
        value.alias(value_col),
    )
    return out
