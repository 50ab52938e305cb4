"""XBRL pipeline entries: offline DTS resolution + calculation-
linkbase validation over synthesized filings.

Per document a COMPLETE miniature DTS is synthesized from doc_id
(instance + entry schema + imported base schema + calculation
linkbase), the resolver walks schemaRef -> xsd:import -> linkbaseRef
through an in-memory loader (the same code path ``dir_loader`` serves
from a fixture directory), and the summation-item consistency check
runs as DataFrame joins/aggregates — the validation depth the
reference reaches only through Arelle's remote DTS resolution
(ref: robosystems/adapters/sec/processors/xbrl_graph.py:155-226).
A deterministic subset of filings carries a PLANTED inconsistency
(doc_id % 7 == 3 shifts Equity by doc_id % 5 + 1 past the
decimals-derived 0.5 tolerance), so the oracle hash pins both the
consistent and inconsistent verdicts — and the weight algebra (the
NetDebt role sums with weight −1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from robosystems_spark.inventory import register

_N_FILINGS = 120

_ROLE_BS = "http://example.com/role/balance"
_ROLE_ND = "http://example.com/role/netdebt"


def _filing_store(did: int) -> tuple[bytes, dict[str, bytes]]:
    """doc_id -> (instance bytes, {document name: bytes}) — the
    four-document DTS.  Values are a closed form of doc_id so the
    DuckDB oracle reproduces every number without XML."""
    assets = 1000 + 3 * did
    liab = 600 + 2 * did
    delta = (did % 5) + 1 if did % 7 == 3 else 0
    equity = assets - liab + delta
    debt = 500 + did
    cash = 100 + did % 50

    instance = f"""<?xml version="1.0"?>
<xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance"
            xmlns:link="http://www.xbrl.org/2003/linkbase"
            xmlns:xlink="http://www.w3.org/1999/xlink"
            xmlns:iso4217="http://www.xbrl.org/2003/iso4217"
            xmlns:ex="http://example.com/tax">
  <link:schemaRef xlink:type="simple" xlink:href="ex-{did}.xsd"/>
  <xbrli:context id="C1">
    <xbrli:entity>
      <xbrli:identifier scheme="http://www.sec.gov/CIK">0000123456</xbrli:identifier>
    </xbrli:entity>
    <xbrli:period><xbrli:instant>2024-12-31</xbrli:instant></xbrli:period>
  </xbrli:context>
  <xbrli:unit id="U"><xbrli:measure>iso4217:USD</xbrli:measure></xbrli:unit>
  <ex:Assets contextRef="C1" unitRef="U" decimals="0">{assets}</ex:Assets>
  <ex:Liabilities contextRef="C1" unitRef="U" decimals="0">{liab}</ex:Liabilities>
  <ex:Equity contextRef="C1" unitRef="U" decimals="0">{equity}</ex:Equity>
  <ex:NetDebt contextRef="C1" unitRef="U" decimals="0">{debt - cash}</ex:NetDebt>
  <ex:Debt contextRef="C1" unitRef="U" decimals="0">{debt}</ex:Debt>
  <ex:Cash contextRef="C1" unitRef="U" decimals="0">{cash}</ex:Cash>
</xbrli:xbrl>""".encode()

    entry_xsd = f"""<?xml version="1.0"?>
<xsd:schema xmlns:xsd="http://www.w3.org/2001/XMLSchema"
            xmlns:link="http://www.xbrl.org/2003/linkbase"
            xmlns:xlink="http://www.w3.org/1999/xlink"
            targetNamespace="http://example.com/tax/entry">
  <xsd:annotation><xsd:appinfo>
    <link:linkbaseRef xlink:type="simple" xlink:href="cal-{did}.xml"/>
    <link:linkbaseRef xlink:type="simple" xlink:href="pres-{did}.xml"/>
  </xsd:appinfo></xsd:annotation>
  <xsd:import namespace="http://example.com/tax" schemaLocation="base.xsd"/>
</xsd:schema>""".encode()

    base_xsd = b"""<?xml version="1.0"?>
<xsd:schema xmlns:xsd="http://www.w3.org/2001/XMLSchema"
            xmlns:xbrli="http://www.xbrl.org/2003/instance"
            targetNamespace="http://example.com/tax">
  <xsd:element name="Assets" id="ex_Assets"/>
  <xsd:element name="Liabilities" id="ex_Liabilities"/>
  <xsd:element name="Equity" id="ex_Equity"/>
  <xsd:element name="NetDebt" id="ex_NetDebt"/>
  <xsd:element name="Debt" id="ex_Debt"/>
  <xsd:element name="Cash" id="ex_Cash"/>
</xsd:schema>"""

    def loc(label: str, frag: str) -> str:
        return (
            f'<link:loc xlink:type="locator" '
            f'xlink:href="base.xsd#ex_{frag}" xlink:label="{label}"/>'
        )

    def arc(frm: str, to: str, weight: float, order: int) -> str:
        return (
            '<link:calculationArc xlink:type="arc" '
            'xlink:arcrole="http://www.xbrl.org/2003/arcrole/'
            f'summation-item" xlink:from="{frm}" xlink:to="{to}" '
            f'weight="{weight}" order="{order}"/>'
        )

    cal = f"""<?xml version="1.0"?>
<link:linkbase xmlns:link="http://www.xbrl.org/2003/linkbase"
               xmlns:xlink="http://www.w3.org/1999/xlink">
  <link:calculationLink xlink:type="extended" xlink:role="{_ROLE_BS}">
    {loc("p", "Assets")}{loc("c1", "Liabilities")}{loc("c2", "Equity")}
    {arc("p", "c1", 1.0, 1)}{arc("p", "c2", 1.0, 2)}
  </link:calculationLink>
  <link:calculationLink xlink:type="extended" xlink:role="{_ROLE_ND}">
    {loc("p", "NetDebt")}{loc("c1", "Debt")}{loc("c2", "Cash")}
    {arc("p", "c1", 1.0, 1)}{arc("p", "c2", -1.0, 2)}
  </link:calculationLink>
</link:linkbase>""".encode()

    def parc(frm: str, to: str, order: int, plabel: str | None) -> str:
        pl = f' preferredLabel="{plabel}"' if plabel else ""
        return (
            '<link:presentationArc xlink:type="arc" '
            'xlink:arcrole="http://www.xbrl.org/2003/arcrole/'
            f'parent-child" xlink:from="{frm}" xlink:to="{to}" '
            f'order="{order}"{pl}/>'
        )

    pres = f"""<?xml version="1.0"?>
<link:linkbase xmlns:link="http://www.xbrl.org/2003/linkbase"
               xmlns:xlink="http://www.w3.org/1999/xlink">
  <link:presentationLink xlink:type="extended" xlink:role="{_ROLE_BS}">
    {loc("p", "Assets")}{loc("c1", "Liabilities")}{loc("c2", "Equity")}
    {parc("p", "c1", 1, "http://www.xbrl.org/2003/role/terseLabel")}
    {parc("p", "c2", 2, None)}
  </link:presentationLink>
</link:linkbase>""".encode()

    store = {
        f"ex-{did}.xsd": entry_xsd,
        "base.xsd": base_xsd,
        f"cal-{did}.xml": cal,
        f"pres-{did}.xml": pres,
    }
    return instance, store


def _filing_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.io import read_table

    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _N_FILINGS)
        .repartition(16, "doc_id")
    )


@register(
    "xbrl_calc_validation",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             'a' || lpad(CAST(doc_id AS VARCHAR), 5, '0') AS accession,
             1000 + 3 * doc_id AS assets,
             600 + 2 * doc_id AS liab,
             CASE WHEN doc_id % 7 = 3 THEN doc_id % 5 + 1 ELSE 0 END AS delta,
             500 + doc_id AS debt,
             100 + doc_id % 50 AS cash
      FROM documents WHERE doc_id < {_N_FILINGS}
    )
    SELECT accession, context_key, role_uri, parent_concept,
           reported, computed, n_children, tolerance, consistent
    FROM (
      SELECT accession,
             '||2024-12-31|iso4217:USD' AS context_key,
             '{_ROLE_BS}' AS role_uri,
             'Assets' AS parent_concept,
             ROUND(CAST(assets AS DOUBLE), 6) AS reported,
             ROUND(CAST(assets + delta AS DOUBLE), 6) AS computed,
             CAST(2 AS BIGINT) AS n_children,
             CAST(0.5 AS DOUBLE) AS tolerance,
             delta = 0 AS consistent
      FROM d
      UNION ALL
      SELECT accession,
             '||2024-12-31|iso4217:USD' AS context_key,
             '{_ROLE_ND}' AS role_uri,
             'NetDebt' AS parent_concept,
             ROUND(CAST(debt - cash AS DOUBLE), 6) AS reported,
             ROUND(CAST(debt - cash AS DOUBLE), 6) AS computed,
             CAST(2 AS BIGINT) AS n_children,
             CAST(0.5 AS DOUBLE) AS tolerance,
             TRUE AS consistent
      FROM d
    )
    ORDER BY accession, parent_concept
    """,
    doc="Offline-DTS calculation validation end to end: per filing, a "
    "synthesized 4-document DTS (instance, entry schema, imported "
    "base schema, calculation linkbase) is RESOLVED by walking "
    "schemaRef -> xsd:import -> linkbaseRef through the loader seam "
    "(no network — the fixture-mirror shape), facts parse from the "
    "instance bytes, and summation-item consistency (Σ child·weight "
    "vs parent, decimals-derived 0.5 tolerance, a weight −1 role) "
    "runs as DataFrame joins/aggregates.  doc_id % 7 == 3 filings "
    "carry a planted Equity inconsistency, so the hash pins both "
    "verdicts and the weight algebra — the Arelle-depth check the "
    "reference runs remotely (xbrl_graph.py:155-226).",
    tags=("xbrl",),
)
def xbrl_calc_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from robosystems_spark.pipelines.xbrl import calculation_validation
    from robosystems_spark.pipelines.xbrl_parse import (
        parse_instance,
        resolve_dts,
    )

    fact_schema = T.StructType(
        [
            T.StructField("accession", T.StringType()),
            T.StructField("concept_qname", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("decimals", T.StringType()),
            T.StructField("period_start", T.StringType()),
            T.StructField("period_end", T.StringType()),
            T.StructField("period_instant", T.StringType()),
            T.StructField("unit", T.StringType()),
        ]
    )

    def gen_facts(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                instance, _ = _filing_store(int(did))
                for f in parse_instance(instance, f"a{int(did):05d}"):
                    rows.append(
                        {k.name: f.get(k.name) for k in fact_schema.fields}
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in fact_schema.fields]
            )

    arc_schema = T.StructType(
        [
            T.StructField("accession", T.StringType()),
            T.StructField("role_uri", T.StringType()),
            T.StructField("arcrole", T.StringType()),
            T.StructField("parent_uri", T.StringType()),
            T.StructField("child_uri", T.StringType()),
            T.StructField("weight", T.DoubleType()),
        ]
    )

    def gen_arcs(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                instance, store = _filing_store(int(did))
                dts = resolve_dts(
                    instance, store.get, accession=f"a{int(did):05d}"
                )
                assert not dts["unresolved"], dts["unresolved"]
                for a in dts["arcs"]:
                    rows.append(
                        {k.name: a.get(k.name) for k in arc_schema.fields}
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in arc_schema.fields]
            )

    ids = _filing_ids(spark, sf_dir)
    facts = ids.mapInPandas(gen_facts, fact_schema)
    arcs = ids.mapInPandas(gen_arcs, arc_schema)
    return calculation_validation(facts, arcs).orderBy(
        "accession", "parent_concept"
    )


@register(
    "xbrl_dts_taxonomy_structures",
    oracle=f"""
    WITH d AS (
      SELECT COUNT(*) AS nf FROM documents WHERE doc_id < {_N_FILINGS}
    )
    SELECT association_type, weight, preferred_label, root, n_assoc
    FROM (
      SELECT 'Calculation' AS association_type, CAST(1.0 AS DOUBLE) AS weight,
             CAST(NULL AS VARCHAR) AS preferred_label, TRUE AS root,
             CAST(3 * nf AS BIGINT) AS n_assoc
      FROM d
      UNION ALL
      SELECT 'Calculation', CAST(-1.0 AS DOUBLE), CAST(NULL AS VARCHAR), TRUE,
             CAST(nf AS BIGINT)
      FROM d
      UNION ALL
      SELECT 'Presentation', CAST(NULL AS DOUBLE),
             'http://www.xbrl.org/2003/role/terseLabel', TRUE,
             CAST(nf AS BIGINT)
      FROM d
      UNION ALL
      SELECT 'Presentation', CAST(NULL AS DOUBLE),
             CAST(NULL AS VARCHAR), TRUE, CAST(nf AS BIGINT)
      FROM d
    )
    ORDER BY association_type, weight, preferred_label
    """,
    doc="Resolver -> taxonomy-frames parity end to end: the SAME "
    "resolve_dts arc rows (now including each filing's presentation "
    "linkbase with preferredLabel and the two calculation roles) feed "
    "build_xbrl_taxonomy_frames, and the Association frame's "
    "type/weight/preferredLabel/root profile is hash-pinned — "
    "summation weights +1/-1 classified Calculation, parent-child "
    "arcs classified Presentation, and every parent (Assets/NetDebt) "
    "detected as a structure ROOT by the distributed "
    "never-a-child anti-join (the reference's Arelle rootConcepts "
    "walk, xbrl_graph.py:1358-1449).",
    tags=("xbrl",),
)
def xbrl_dts_taxonomy_structures(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from robosystems_spark.pipelines.xbrl import build_xbrl_taxonomy_frames
    from robosystems_spark.pipelines.xbrl_parse import resolve_dts

    arc_schema = T.StructType(
        [
            T.StructField("accession", T.StringType()),
            T.StructField("taxonomy_uri", T.StringType()),
            T.StructField("role_uri", T.StringType()),
            T.StructField("role_id", T.StringType()),
            T.StructField("role_definition", T.StringType()),
            T.StructField("arcrole", T.StringType()),
            T.StructField("parent_uri", T.StringType()),
            T.StructField("child_uri", T.StringType()),
            T.StructField("order_value", T.DoubleType()),
            T.StructField("weight", T.DoubleType()),
            T.StructField("preferred_label", T.StringType()),
        ]
    )

    def gen_arcs(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                instance, store = _filing_store(int(did))
                dts = resolve_dts(
                    instance, store.get, accession=f"a{int(did):05d}"
                )
                for a in dts["arcs"]:
                    rows.append(
                        {k.name: a.get(k.name) for k in arc_schema.fields}
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in arc_schema.fields]
            )

    arcs = _filing_ids(spark, sf_dir).mapInPandas(gen_arcs, arc_schema)
    assoc = build_xbrl_taxonomy_frames(arcs)["Association"]
    return (
        assoc.groupBy(
            "association_type", "weight", "preferred_label", "root"
        )
        .agg(F.count(F.lit(1)).alias("n_assoc"))
        .orderBy("association_type", "weight", "preferred_label")
    )
