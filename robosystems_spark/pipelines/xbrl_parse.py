"""Raw XBRL instance documents → RAW_FACT_SCHEMA rows (the parse seam).

The reference feeds its fact pipeline from Arelle's parsed model
(/root/reference/robosystems/adapters/sec/processors/xbrl_graph.py:
155-226 builds the controller, :527-620 walks ``cntlr.facts``); this
module is the dependency-free twin for plain XBRL 2.1 instance
documents: a stdlib ``xml.etree`` reader that emits one dict per
reported fact with exactly the fields ``pipelines/xbrl.py``'s
RAW_FACT_SCHEMA documents (each field's Arelle-side source is listed
there).  Anyone holding EDGAR bytes can now run raw XML →
``build_xbrl_graph_frames`` end-to-end without Arelle; Arelle (or any
richer parser) remains pluggable at the same seam for inline-XBRL /
full-DTS needs.

Supported envelope (fail-soft, never wrong-value):

- XBRL 2.1 instance documents: ``xbrli:context`` (entity identifier,
  duration/instant periods, ``xbrldi:explicitMember`` dimensions in
  segment or scenario), ``xbrli:unit`` (single measure or
  ``xbrli:divide``), and item facts anywhere under the root carrying
  ``contextRef`` (tuples are traversed, so facts nested in tuples are
  found).
- ``xsi:nil`` facts keep value NULL; unresolvable namespace prefixes
  fall back to the local name (never silently mislabel).
- Inline XBRL (ix: 2008/2013 namespaces, what EDGAR actually serves
  today): ``ix:nonFraction`` with decimals/scale/sign and the common
  numeric ixt transforms (num-dot-decimal, num-comma-decimal,
  zerodash/fixed-zero family), ``ix:nonNumeric`` (verbatim,
  fixed-true/false/empty, and the numeric date-order transforms),
  ``ix:continuation`` chains, ``ix:exclude`` subtrees, and hidden
  facts in ``ix:hidden`` (plain xbrli items).  Contexts and units
  live under ``ix:resources`` and parse with the same readers.
  An UNKNOWN ixt transform keeps the fact with value NULL — emitting
  the untransformed text would be a wrong value (fail-soft contract);
  ``ix:fraction`` facts are likewise emitted value-NULL.  ``escape``
  facts collapse to their text content (the reference's Arelle path
  preserves XHTML; stated simplification).

Distributed shape: parsing is per-document CPU work with no cross-file
state — ``raw_facts_from_filings`` runs it inside ``mapInPandas``
(one task per batch of filings, Arrow-framed), the same pattern as
``operators/multimodal.py``'s codec seam.  The driver never sees file
bytes.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame

XBRLI_NS = "http://www.xbrl.org/2003/instance"
XBRLDI_NS = "http://xbrl.org/2006/xbrldi"
LINK_NS = "http://www.xbrl.org/2003/linkbase"
XSI_NS = "http://www.w3.org/2001/XMLSchema-instance"
IX_NS_PREFIX = "http://www.xbrl.org/2013/inlineXBRL"
DEI_NS_PREFIX = "http://xbrl.sec.gov/dei"

_NON_FACT_NS = {XBRLI_NS, LINK_NS, XSI_NS}


def _split_tag(tag: str) -> tuple[str, str]:
    """'{ns}local' -> (ns, local); no-namespace tags -> ('', local)."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns, local
    return "", tag


def _parse_with_nsmap(
    data: bytes,
) -> tuple[ET.Element, dict[str, str], dict[str, str]]:
    """Parse and return (root, {namespace_uri: prefix}, {prefix: namespace_uri}).

    ElementTree drops prefix bindings from the tree, so they are
    collected from ``start-ns`` events; the first NON-EMPTY prefix
    seen for a URI wins (documents rebinding a URI to several
    prefixes are rare and any of them is a faithful qname)."""
    ns_by_uri: dict[str, str] = {}
    uri_by_prefix: dict[str, str] = {}
    root = None
    for event, payload in ET.iterparse(
        io.BytesIO(data), events=("start-ns", "start")
    ):
        if event == "start-ns":
            prefix, uri = payload
            if prefix and uri not in ns_by_uri:
                ns_by_uri[uri] = prefix
            if prefix and prefix not in uri_by_prefix:
                uri_by_prefix[prefix] = uri
        elif root is None:
            root = payload
    if root is None:
        raise ValueError("empty XML document")
    return root, ns_by_uri, uri_by_prefix


def _text(elem: ET.Element | None) -> str | None:
    if elem is None or elem.text is None:
        return None
    t = elem.text.strip()
    return t or None


def _parse_contexts(
    root: ET.Element,
) -> dict[str, dict]:
    """context id -> {cik, period_start, period_end, period_instant,
    dimensions} (xbrl_graph.py's make_fact reads the same context
    fields off Arelle's ModelContext)."""
    out: dict[str, dict] = {}
    for ctx in root.iter(f"{{{XBRLI_NS}}}context"):
        cid = ctx.get("id")
        if not cid:
            continue
        ident = ctx.find(f"{{{XBRLI_NS}}}entity/{{{XBRLI_NS}}}identifier")
        cik = _text(ident)
        period = ctx.find(f"{{{XBRLI_NS}}}period")
        start = end = instant = None
        if period is not None:
            start = _text(period.find(f"{{{XBRLI_NS}}}startDate"))
            end = _text(period.find(f"{{{XBRLI_NS}}}endDate"))
            instant = _text(period.find(f"{{{XBRLI_NS}}}instant"))
        dims: dict[str, str] = {}
        # explicit dimensions live in entity/segment or scenario
        for holder in (
            ctx.find(f"{{{XBRLI_NS}}}entity/{{{XBRLI_NS}}}segment"),
            ctx.find(f"{{{XBRLI_NS}}}scenario"),
        ):
            if holder is None:
                continue
            for mem in holder.iter(f"{{{XBRLDI_NS}}}explicitMember"):
                dim = mem.get("dimension")
                val = _text(mem)
                if dim and val:
                    dims[dim] = val
        out[cid] = {
            "cik": cik,
            "period_start": start,
            "period_end": end,
            "period_instant": instant,
            "dimensions": dims or None,
        }
    return out


def _parse_units(root: ET.Element) -> dict[str, str]:
    """unit id -> measure string: single measures keep their qname
    text; xbrli:divide renders 'numerator/denominator' (the shape
    pipelines/xbrl.py's unit frame splits back apart)."""
    out: dict[str, str] = {}
    for unit in root.iter(f"{{{XBRLI_NS}}}unit"):
        uid = unit.get("id")
        if not uid:
            continue
        divide = unit.find(f"{{{XBRLI_NS}}}divide")
        if divide is not None:
            num = _text(
                divide.find(
                    f"{{{XBRLI_NS}}}unitNumerator/{{{XBRLI_NS}}}measure"
                )
            )
            den = _text(
                divide.find(
                    f"{{{XBRLI_NS}}}unitDenominator/{{{XBRLI_NS}}}measure"
                )
            )
            if num and den:
                out[uid] = f"{num}/{den}"
        else:
            measure = _text(unit.find(f"{{{XBRLI_NS}}}measure"))
            if measure:
                out[uid] = measure
    return out


def _is_ix_ns(ns: str) -> bool:
    """True for any inline-XBRL namespace version (2008 draft + 2013)."""
    return ns.startswith("http://www.xbrl.org/") and "inlineXBRL" in ns


def _ix_text(elem: ET.Element) -> str:
    """Concatenated text content of an ix fact element, skipping
    ``ix:exclude`` subtrees (spec: excluded content is presentation-
    only, e.g. footnote markers inside the tagged number)."""
    parts: list[str] = []
    if elem.text:
        parts.append(elem.text)
    for child in elem:
        ns, local = _split_tag(child.tag)
        if not (_is_ix_ns(ns) and local == "exclude"):
            parts.append(_ix_text(child))
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def _ix_full_text(
    elem: ET.Element, continuations: dict[str, ET.Element]
) -> str:
    """Fact text including its ``continuedAt`` chain (cycle-guarded)."""
    parts = [_ix_text(elem)]
    seen: set[str] = set()
    nxt = elem.get("continuedAt")
    while nxt and nxt not in seen:
        seen.add(nxt)
        cont = continuations.get(nxt)
        if cont is None:
            break
        parts.append(_ix_text(cont))
        nxt = cont.get("continuedAt")
    return "".join(parts)


_IXT_DATE_ORDERS = {
    "date-day-month-year": (0, 1, 2),
    "datedaymonthyear": (0, 1, 2),
    "date-month-day-year": (1, 0, 2),
    "datemonthdayyear": (1, 0, 2),
    "date-year-month-day": (2, 1, 0),
    "dateyearmonthday": (2, 1, 0),
}


def _ixt_transform(fmt_local: str, raw: str) -> str | None:
    """Apply an ixt transform by LOCAL name (version-agnostic: the
    same local names appear across TRR v1-v4 namespaces).  Returns the
    canonical lexical value, or None for an unknown transform (the
    caller emits a NULL-valued fact rather than a wrong one)."""
    t = raw.strip()
    if fmt_local in ("num-dot-decimal", "numdotdecimal", "numcommadot"):
        return t.replace(",", "").replace(" ", "").replace("\xa0", "")
    if fmt_local in ("num-comma-decimal", "numcommadecimal", "numdotcomma"):
        return (
            t.replace(".", "")
            .replace(" ", "")
            .replace("\xa0", "")
            .replace(",", ".")
        )
    if fmt_local in (
        "zerodash", "numdash", "fixed-zero", "fixedzero", "num-dash"
    ):
        return "0"
    if fmt_local in ("fixed-empty", "fixedempty", "nocontent"):
        return ""
    if fmt_local in ("fixed-true", "fixedtrue", "booleantrue"):
        return "true"
    if fmt_local in ("fixed-false", "fixedfalse", "booleanfalse"):
        return "false"
    order = _IXT_DATE_ORDERS.get(fmt_local)
    if order is not None:
        import re

        comps = [c for c in re.split(r"[^0-9]+", t) if c]
        if len(comps) != 3:
            return None
        d, m, y = comps[order[0]], comps[order[1]], comps[order[2]]
        if len(y) == 2:  # TRR rule: two-digit years are 20yy
            y = "20" + y
        return f"{y}-{int(m):02d}-{int(d):02d}"
    return None


def _ix_numeric_value(
    raw: str, fmt_local: str | None, scale: str | None, sign: str | None
) -> str | None:
    """ix:nonFraction value: transform -> Decimal -> scale -> sign,
    rendered without exponent (integral values drop the point).  None
    when the transform is unknown or the text isn't numeric."""
    from decimal import Decimal, InvalidOperation

    if fmt_local is None:
        txt = raw.strip()
    else:
        txt = _ixt_transform(fmt_local, raw)
        if txt is None:
            return None
    try:
        v = Decimal(txt)
    except (InvalidOperation, ValueError):
        return None
    if scale:
        try:
            v = v.scaleb(int(scale))
        except (ValueError, InvalidOperation):
            return None
    if sign == "-":
        v = -v
    v = v.normalize()
    if v == v.to_integral_value():
        return str(v.quantize(Decimal(1)))
    return format(v, "f")


def _parse_inline(
    root: ET.Element,
    ns_by_uri: dict[str, str],
    uri_by_prefix: dict[str, str],
) -> list[dict]:
    """Walk an inline-XBRL document: ix fact elements resolve their
    concept from the ``name`` attribute (prefix form); hidden plain
    xbrli items (inside ``ix:hidden``) resolve from their tag, exactly
    like the 2.1 path.  Returns partially-filled RAW_FACT dicts (the
    caller backfills filing metadata)."""
    contexts = _parse_contexts(root)
    units = _parse_units(root)
    continuations: dict[str, ET.Element] = {}
    for elem in root.iter():
        ns, local = _split_tag(elem.tag)
        if _is_ix_ns(ns) and local == "continuation":
            cid = elem.get("id")
            if cid:
                continuations[cid] = elem

    facts: list[dict] = []
    for elem in root.iter():
        ctx_ref = elem.get("contextRef")
        if ctx_ref is None:
            continue
        ctx = contexts.get(ctx_ref)
        if ctx is None or ctx["cik"] is None:
            continue
        ns, local = _split_tag(elem.tag)
        if _is_ix_ns(ns):
            if local not in ("nonFraction", "nonNumeric", "fraction"):
                continue  # tuple refs etc. carry contextRef but no value
            name = elem.get("name") or ""
            prefix, _, cname = name.rpartition(":")
            concept_ns = uri_by_prefix.get(prefix, "") if prefix else ""
            qname = name if prefix else cname
            fmt = elem.get("format")
            fmt_local = fmt.rpartition(":")[2] if fmt else None
            nil = elem.get(f"{{{XSI_NS}}}nil")
            if nil == "true" or local == "fraction":
                value = None
            elif local == "nonFraction":
                value = _ix_numeric_value(
                    _ix_full_text(elem, continuations),
                    fmt_local,
                    elem.get("scale"),
                    elem.get("sign"),
                )
            else:  # nonNumeric
                raw = _ix_full_text(elem, continuations)
                if fmt_local is None:
                    value = raw.strip() or None
                else:
                    value = _ixt_transform(fmt_local, raw)
            facts.append(
                {
                    "concept_qname": qname,
                    "concept_uri": (
                        f"{concept_ns}#{cname}" if concept_ns else cname
                    ),
                    "value": value,
                    "decimals": elem.get("decimals"),
                    "unit": (
                        units.get(elem.get("unitRef"))
                        if elem.get("unitRef")
                        else None
                    ),
                    "_ctx": ctx,
                    "_ns": concept_ns,
                    "_local": cname,
                }
            )
        elif ns not in _NON_FACT_NS:
            # hidden plain items (ix:hidden) — the 2.1 item shape
            prefix = ns_by_uri.get(ns)
            qname = f"{prefix}:{local}" if prefix else local
            nil = elem.get(f"{{{XSI_NS}}}nil")
            unit_ref = elem.get("unitRef")
            facts.append(
                {
                    "concept_qname": qname,
                    "concept_uri": f"{ns}#{local}" if ns else local,
                    "value": None if nil == "true" else _text(elem),
                    "decimals": elem.get("decimals"),
                    "unit": units.get(unit_ref) if unit_ref else None,
                    "_ctx": ctx,
                    "_ns": ns,
                    "_local": local,
                }
            )
    return facts


def parse_instance(
    data: bytes,
    accession: str,
    form: str | None = None,
    filing_date: str | None = None,
    entity_name: str | None = None,
) -> list[dict]:
    """Parse one XBRL instance document into RAW_FACT_SCHEMA dicts.

    ``accession``/``form``/``filing_date`` are filing metadata the
    instance itself doesn't carry (the reference reads them from the
    SEC index); ``form`` and ``entity_name`` fall back to the
    dei:DocumentType / dei:EntityRegistrantName facts when present.
    """
    root, ns_by_uri, uri_by_prefix = _parse_with_nsmap(data)
    root_ns, _ = _split_tag(root.tag)
    inline = (
        _is_ix_ns(root_ns)
        or root_ns == "http://www.w3.org/1999/xhtml"
        or any(_is_ix_ns(u) for u in uri_by_prefix.values())
    )
    if inline:
        partial = _parse_inline(root, ns_by_uri, uri_by_prefix)
    else:
        contexts = _parse_contexts(root)
        units = _parse_units(root)
        partial = []
        for elem in root.iter():
            ctx_ref = elem.get("contextRef")
            if ctx_ref is None:
                continue
            ns, local = _split_tag(elem.tag)
            if ns in _NON_FACT_NS:
                continue
            ctx = contexts.get(ctx_ref)
            if ctx is None or ctx["cik"] is None:
                continue  # dangling contextRef: not a reportable fact
            prefix = ns_by_uri.get(ns)
            qname = f"{prefix}:{local}" if prefix else local
            nil = elem.get(f"{{{XSI_NS}}}nil")
            unit_ref = elem.get("unitRef")
            partial.append(
                {
                    "concept_qname": qname,
                    "concept_uri": f"{ns}#{local}" if ns else local,
                    "value": None if nil == "true" else _text(elem),
                    "decimals": elem.get("decimals"),
                    "unit": units.get(unit_ref) if unit_ref else None,
                    "_ctx": ctx,
                    "_ns": ns,
                    "_local": local,
                }
            )

    facts: list[dict] = []
    dei_name = None
    dei_form = None
    for p in partial:
        value = p["value"]
        if p["_ns"].startswith(DEI_NS_PREFIX) and value:
            if p["_local"] == "EntityRegistrantName":
                dei_name = value
            elif p["_local"] == "DocumentType":
                dei_form = value
        ctx = p["_ctx"]
        facts.append(
            {
                "entity_cik": ctx["cik"],
                "entity_name": None,  # backfilled below
                "accession": accession,
                "form": None,  # backfilled below
                "filing_date": filing_date,
                "concept_qname": p["concept_qname"],
                "concept_uri": p["concept_uri"],
                "value": value,
                "decimals": p["decimals"],
                "unit": p["unit"],
                "period_start": ctx["period_start"],
                "period_end": ctx["period_end"],
                "period_instant": ctx["period_instant"],
                "dimensions": ctx["dimensions"],
            }
        )
    name = entity_name or dei_name
    form_final = form or dei_form
    for f in facts:
        f["entity_name"] = name
        f["form"] = form_final
    return facts


def raw_facts_from_filings(filings: DataFrame) -> DataFrame:
    """Distributed front-end: a DataFrame of filings → one
    RAW_FACT_SCHEMA row per fact, parsed inside ``mapInPandas``.

    ``filings`` columns: ``accession`` STRING (required), ``content``
    BINARY (the instance document bytes, required), plus optional
    ``form``, ``filing_date``, ``entity_name`` STRINGs.

    Scale shape: one task per Arrow batch of filings, no shuffle, no
    driver-side bytes; a filing that fails to parse is reported as a
    single poison row (entity_cik='__parse_error__', value=the
    message) instead of killing the stage — the 100 TB crawl-corpus
    discipline every decode seam here follows."""
    from robosystems_spark.pipelines.xbrl import RAW_FACT_SCHEMA

    opt = set(filings.columns)

    def _parse_batch(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for _, r in pdf.iterrows():
                acc = r["accession"]
                try:
                    content = r["content"]
                    if isinstance(content, memoryview):
                        content = bytes(content)
                    rows.extend(
                        parse_instance(
                            content,
                            accession=acc,
                            form=r["form"] if "form" in opt else None,
                            filing_date=(
                                r["filing_date"] if "filing_date" in opt else None
                            ),
                            entity_name=(
                                r["entity_name"] if "entity_name" in opt else None
                            ),
                        )
                    )
                except Exception as exc:  # noqa: BLE001 - poison-row contract
                    rows.append(
                        {
                            "entity_cik": "__parse_error__",
                            "entity_name": None,
                            "accession": acc,
                            "form": None,
                            "filing_date": None,
                            "concept_qname": "__parse_error__",
                            "concept_uri": "__parse_error__",
                            "value": f"{type(exc).__name__}: {exc}",
                            "decimals": None,
                            "unit": None,
                            "period_start": None,
                            "period_end": None,
                            "period_instant": None,
                            "dimensions": None,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RAW_FACT_SCHEMA.fields]
            )

    return filings.mapInPandas(_parse_batch, schema=RAW_FACT_SCHEMA)


# ---------------------------------------------------------------------------
# Offline DTS resolution (r12): follow schemaRef -> xsd imports ->
# linkbaseRefs from a LOCAL store — no network.  The reference's
# Arelle path resolves the full remote DTS (xbrl_graph.py:155-226
# builds the controller with web-cache resolution); this is the
# dependency-free twin over a fixture directory / byte store, the
# seam a production deploy points at its taxonomy mirror.
# ---------------------------------------------------------------------------

XLINK_NS = "http://www.w3.org/1999/xlink"
XSD_NS = "http://www.w3.org/2001/XMLSchema"

_LINKBASE_KINDS = {
    "calculationLink": "calculationArc",
    "presentationLink": "presentationArc",
    "definitionLink": "definitionArc",
}


def dir_loader(fixture_dir: str):
    """Loader resolving DTS hrefs (including absolute http(s) URLs) to
    files in a LOCAL directory by basename — the offline fixture-cache
    convention (a flat mirror keyed by document filename, the shape
    taxonomy zip distributions unpack to).  Returns bytes or None
    (missing documents are recorded as unresolved, never fetched)."""
    import os

    def load(href: str) -> bytes | None:
        name = href.split("#", 1)[0].rstrip("/").rsplit("/", 1)[-1]
        if not name:
            return None
        p = os.path.join(fixture_dir, name)
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as fh:
            return fh.read()

    return load


def _doc_name(href: str) -> str:
    return href.split("#", 1)[0]


def _resolve_href(base_doc: str, href: str) -> str:
    """Resolve a relative href against the referencing document's
    location (posix semantics, scheme-agnostic — enough for the flat
    mirrors ``dir_loader`` serves and for http-style URLs)."""
    import posixpath

    doc, _, frag = href.partition("#")
    if not doc:
        doc = base_doc
    elif "://" not in doc and not doc.startswith("/"):
        base_dir = posixpath.dirname(base_doc)
        if base_dir:
            doc = posixpath.normpath(posixpath.join(base_dir, doc))
    return f"{doc}#{frag}" if frag else doc


def resolve_dts(
    instance_data: bytes,
    loader,
    accession: str = "",
) -> dict:
    """Resolve the Discoverable Taxonomy Set of one instance OFFLINE:
    parse ``link:schemaRef`` hrefs, then walk each schema's
    ``xsd:import``/``xsd:include`` and ``link:linkbaseRef`` references
    breadth-first through ``loader`` (e.g. :func:`dir_loader` over a
    fixture directory), collecting every linkbase arc.

    Returns ``{"documents": [...], "unresolved": [...], "arcs": [...]}``
    where each arc dict carries the ``raw_arcs`` columns
    ``build_xbrl_taxonomy_frames`` consumes (accession, taxonomy_uri,
    role_uri, role_id, role_definition, arcrole, parent_uri,
    child_uri, order_value, weight, preferred_label) — locator hrefs
    are resolved against the linkbase's own location, so
    ``parent_uri``/``child_uri`` are stable document#fragment ids.
    Missing documents go to ``unresolved`` (fail-soft: validation over
    a partial DTS is still meaningful; silently inventing arcs is
    not)."""
    root, _, _ = _parse_with_nsmap(instance_data)
    queue: list[str] = []
    for ref in root.iter(f"{{{LINK_NS}}}schemaRef"):
        href = ref.get(f"{{{XLINK_NS}}}href")
        if href:
            queue.append(_resolve_href("", href))
    seen: set[str] = set()
    documents: list[str] = []
    unresolved: list[str] = []
    arcs: list[dict] = []
    while queue:
        href = queue.pop(0)
        doc = _doc_name(href)
        if not doc or doc in seen:
            continue
        seen.add(doc)
        data = loader(doc)
        if data is None:
            unresolved.append(doc)
            continue
        documents.append(doc)
        try:
            droot, _, _ = _parse_with_nsmap(data)
        except ET.ParseError:
            unresolved.append(doc)
            continue
        ns, local = _split_tag(droot.tag)
        if ns == XSD_NS and local == "schema":
            tns = droot.get("targetNamespace") or doc
            for imp in droot.iter(f"{{{XSD_NS}}}import"):
                loc = imp.get("schemaLocation")
                if loc:
                    queue.append(_resolve_href(doc, loc))
            for inc in droot.iter(f"{{{XSD_NS}}}include"):
                loc = inc.get("schemaLocation")
                if loc:
                    queue.append(_resolve_href(doc, loc))
            for lbref in droot.iter(f"{{{LINK_NS}}}linkbaseRef"):
                lhref = lbref.get(f"{{{XLINK_NS}}}href")
                if lhref:
                    queue.append(_resolve_href(doc, lhref))
            continue
        if ns == LINK_NS and local == "linkbase":
            arcs.extend(_parse_linkbase_arcs(droot, doc, accession))
    return {"documents": documents, "unresolved": unresolved, "arcs": arcs}


def _parse_linkbase_arcs(
    droot: ET.Element, doc: str, accession: str
) -> list[dict]:
    """One linkbase document -> raw_arcs rows: per extended link, map
    xlink locator labels to resolved hrefs, then emit one row per arc
    (from/to resolved through the locator map; arcs naming unknown
    labels are dropped — a broken linkbase must not invent edges)."""
    out: list[dict] = []
    for kind, arc_local in _LINKBASE_KINDS.items():
        for link in droot.iter(f"{{{LINK_NS}}}{kind}"):
            role = link.get(f"{{{XLINK_NS}}}role") or ""
            locs: dict[str, str] = {}
            for loc in link.iter(f"{{{LINK_NS}}}loc"):
                label = loc.get(f"{{{XLINK_NS}}}label")
                href = loc.get(f"{{{XLINK_NS}}}href")
                if label and href:
                    locs[label] = _resolve_href(doc, href)
            for arc in link.iter(f"{{{LINK_NS}}}{arc_local}"):
                frm = locs.get(arc.get(f"{{{XLINK_NS}}}from") or "")
                to = locs.get(arc.get(f"{{{XLINK_NS}}}to") or "")
                if not frm or not to:
                    continue
                weight = arc.get("weight")
                order = arc.get("order")
                out.append(
                    {
                        "accession": accession,
                        "taxonomy_uri": doc,
                        "role_uri": role,
                        "role_id": None,
                        "role_definition": None,
                        "arcrole": arc.get(f"{{{XLINK_NS}}}arcrole") or "",
                        "parent_uri": frm,
                        "child_uri": to,
                        "order_value": float(order) if order else None,
                        "weight": float(weight) if weight is not None else None,
                        "preferred_label": arc.get("preferredLabel"),
                    }
                )
    return out
