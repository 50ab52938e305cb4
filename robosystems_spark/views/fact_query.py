"""Fact query with XBRL dimension filtering.

Semantics of /root/reference/robosystems/operations/views/
fact_query.py:48-103: a 4-way star join Fact→{Element, Period, Unit,
Entity}, an OPTIONAL MATCH to FactDimension→axis/member Elements, and
the dimension-filter subtlety (fact_query.py:78-82):

- ``requested_dimensions=None`` (or empty) must EXCLUDE all
  dimensional facts — compiled as a left join + ``fd IS NULL``
  null-filter (an anti-join), NOT a filter pushed before the join;
- a non-empty axis list keeps ONLY facts whose dimension axis name is
  in the list.

Spark shape: Fact is the fact table; Element/Period/Unit/Entity are
broadcast dims; the dimension path is a broadcast left join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fact_query(
    tables: dict[str, DataFrame],
    fact_set_id: str | None = None,
    period_start: str | None = None,
    period_end: str | None = None,
    entity_id: str | None = None,
    requested_dimensions: list[str] | None = None,
) -> DataFrame:
    fact = tables["Fact"].alias("f")
    elem = tables["Element"].alias("e")
    per = tables["Period"].alias("p")
    unit = tables["Unit"].alias("u")
    ent = tables["Entity"].alias("ent")
    f_e = tables["FACT_HAS_ELEMENT"].alias("fe")
    f_p = tables["FACT_HAS_PERIOD"].alias("fp")
    f_u = tables["FACT_HAS_UNIT"].alias("fu")
    f_ent = tables["FACT_HAS_ENTITY"].alias("fent")

    joined = (
        fact.join(F.broadcast(f_e), F.col("f.identifier") == F.col("fe.src"))
        .join(F.broadcast(elem), F.col("fe.dst") == F.col("e.identifier"))
        .join(F.broadcast(f_p), F.col("f.identifier") == F.col("fp.src"))
        .join(F.broadcast(per), F.col("fp.dst") == F.col("p.identifier"))
        .join(F.broadcast(f_u), F.col("f.identifier") == F.col("fu.src"))
        .join(F.broadcast(unit), F.col("fu.dst") == F.col("u.identifier"))
        .join(F.broadcast(f_ent), F.col("f.identifier") == F.col("fent.src"))
        .join(F.broadcast(ent), F.col("fent.dst") == F.col("ent.identifier"))
    )

    if fact_set_id:
        fs = tables["FactSet"].alias("fs")
        fs_f = tables["FACT_SET_CONTAINS_FACT"].alias("fsf")
        joined = joined.join(
            F.broadcast(fs_f), F.col("f.identifier") == F.col("fsf.dst")
        ).join(
            F.broadcast(fs.filter(F.col("fs.identifier") == fact_set_id)),
            F.col("fsf.src") == F.col("fs.identifier"),
        )

    # OPTIONAL MATCH (f)-[:FACT_HAS_DIMENSION]->(fd)-[:AXIS]->(axis)
    #                (fd)-[:MEMBER]->(member)
    f_d = tables["FACT_HAS_DIMENSION"].alias("fd_edge")
    fdim = tables["FactDimension"].alias("fd")
    d_axis = tables["FACT_DIMENSION_AXIS_ELEMENT"].alias("da")
    d_member = tables["FACT_DIMENSION_MEMBER_ELEMENT"].alias("dm")
    axis_elem = tables["Element"].alias("axis")
    member_elem = tables["Element"].alias("member")

    dim_path = (
        fdim.join(F.broadcast(f_d), F.col("fd.identifier") == F.col("fd_edge.dst"))
        .join(F.broadcast(d_axis), F.col("fd.identifier") == F.col("da.src"))
        .join(F.broadcast(axis_elem), F.col("da.dst") == F.col("axis.identifier"))
        .join(F.broadcast(d_member), F.col("fd.identifier") == F.col("dm.src"), "left")
        .join(F.broadcast(member_elem), F.col("dm.dst") == F.col("member.identifier"), "left")
        .select(
            F.col("fd_edge.src").alias("_dim_fact_id"),
            F.col("fd.identifier").alias("_fd_id"),
            F.col("axis.name").alias("dimension_axis"),
            F.col("member.name").alias("dimension_member"),
        )
    )
    # left join preserves dimensionless facts with NULL dimension cols
    joined = joined.join(
        F.broadcast(dim_path), F.col("f.identifier") == F.col("_dim_fact_id"), "left"
    )

    preds = []
    if period_start:
        preds.append(
            (F.col("p.start_date") >= period_start) | (F.col("p.end_date") >= period_start)
        )
    if period_end:
        preds.append(
            (F.col("p.end_date") <= period_end) | (F.col("p.start_date") <= period_end)
        )
    if entity_id:
        preds.append(F.col("ent.identifier") == entity_id)
    if not requested_dimensions:
        # the `fd IS NULL` idiom: exclude dimensional facts AFTER the
        # left join (anti-join), never a pre-join filter
        preds.append(F.col("_fd_id").isNull())
    else:
        preds.append(F.col("dimension_axis").isin(requested_dimensions))
    for p in preds:
        joined = joined.filter(p)

    return joined.select(
        F.col("f.identifier").alias("fact_id"),
        F.col("f.numeric_value").alias("numeric_value"),
        F.col("e.identifier").alias("element_id"),
        F.col("e.name").alias("element_name"),
        F.col("e.classification").alias("element_classification"),
        F.col("e.period_type").alias("element_period_type"),
        F.col("p.identifier").alias("period_id"),
        F.col("p.start_date").alias("period_start"),
        F.col("p.end_date").alias("period_end"),
        F.col("p.fiscal_year").alias("fiscal_year"),
        F.col("u.value").alias("unit_value"),
        F.col("ent.identifier").alias("entity_id"),
        F.col("dimension_axis"),
        F.col("dimension_member"),
    ).orderBy("element_name", "period_start")
