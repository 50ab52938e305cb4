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
TRUE dimensions (bounded taxonomies) and carry explicit broadcast
hints.  The FACT_HAS_* edge tables have ONE ROW PER FACT — the same
cardinality as the fact table itself — so they must NEVER carry a
hard broadcast hint: at 100x scale the driver would try to collect
and ship a billion-row edge table (OOM, not a slow plan).  Those
joins are left unhinted: AQE still broadcasts them when they are
genuinely small at runtime, and at scale they degrade to shuffle
joins (or exchange-free joins when the edges are pre-bucketed by
``src`` via sources/bucketing.py — see ``fact_query_bucketed``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fact-scale edge tables and the key they join to Fact on.  These
#: must never be broadcast-hinted; for exchange-free plans at scale,
#: bucket them together with Fact via ``bucket_fact_layout``.
FACT_EDGE_KEYS = {
    "FACT_HAS_ELEMENT": "src",
    "FACT_HAS_PERIOD": "src",
    "FACT_HAS_UNIT": "src",
    "FACT_HAS_ENTITY": "src",
    "FACT_SET_CONTAINS_FACT": "dst",
    "FACT_HAS_DIMENSION": "src",
}


def bucket_fact_layout(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    num_buckets: int = 16,
    prefix: str = "fq",
) -> dict[str, DataFrame]:
    """Persist Fact and its fact-scale edges as tables bucketed on the
    fact identifier, so every edge⋈fact join in ``fact_query`` is
    exchange-free (no shuffle, no broadcast collect).  Dimension
    tables pass through untouched — they stay broadcast.

    Returns a new ``tables`` dict backed by the bucketed layout; feed
    it straight to ``fact_query``.
    """
    from robosystems_spark.sources.bucketing import write_bucketed

    out = dict(tables)
    write_bucketed(
        tables["Fact"], f"{prefix}_fact", ["identifier"], num_buckets
    )
    out["Fact"] = spark.table(f"{prefix}_fact")
    for edge, key in FACT_EDGE_KEYS.items():
        if edge not in tables:
            continue
        tname = f"{prefix}_{edge.lower()}"
        write_bucketed(tables[edge], tname, [key], num_buckets)
        out[edge] = spark.table(tname)
    return out


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

    # fact-scale edges (one row per fact): NO broadcast hint — AQE
    # decides at runtime; true dims keep explicit hints.
    joined = (
        fact.join(f_e, F.col("f.identifier") == F.col("fe.src"))
        .join(F.broadcast(elem), F.col("fe.dst") == F.col("e.identifier"))
        .join(f_p, F.col("f.identifier") == F.col("fp.src"))
        .join(F.broadcast(per), F.col("fp.dst") == F.col("p.identifier"))
        .join(f_u, F.col("f.identifier") == F.col("fu.src"))
        .join(F.broadcast(unit), F.col("fu.dst") == F.col("u.identifier"))
        .join(f_ent, F.col("f.identifier") == F.col("fent.src"))
        .join(F.broadcast(ent), F.col("fent.dst") == F.col("ent.identifier"))
    )

    if fact_set_id:
        fs = tables["FactSet"].alias("fs")
        fs_f = tables["FACT_SET_CONTAINS_FACT"].alias("fsf")
        # FACT_SET_CONTAINS_FACT is fact-scale too — no hint
        joined = joined.join(
            fs_f, F.col("f.identifier") == F.col("fsf.dst")
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

    # FACT_HAS_DIMENSION and the per-FactDimension axis/member edges
    # scale with the dimensional-fact count — unhinted; only the
    # Element dim lookups stay broadcast.
    dim_path = (
        fdim.join(f_d, F.col("fd.identifier") == F.col("fd_edge.dst"))
        .join(d_axis, F.col("fd.identifier") == F.col("da.src"))
        .join(F.broadcast(axis_elem), F.col("da.dst") == F.col("axis.identifier"))
        .join(d_member, F.col("fd.identifier") == F.col("dm.src"), "left")
        .join(F.broadcast(member_elem), F.col("dm.dst") == F.col("member.identifier"), "left")
        .select(
            F.col("fd_edge.src").alias("_dim_fact_id"),
            F.col("fd.identifier").alias("_fd_id"),
            F.col("axis.name").alias("dimension_axis"),
            F.col("member.name").alias("dimension_member"),
        )
    )
    # left join preserves dimensionless facts with NULL dimension cols;
    # dim_path is dimensional-fact-scale → unhinted
    joined = joined.join(
        dim_path, F.col("f.identifier") == F.col("_dim_fact_id"), "left"
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
