"""HTML -> main-text extraction: the crawl-corpus front door.

A large-scale LLM training pipeline starts at crawled HTML, not
extracted text; every downstream gate this repo already has (Gopher
quality/repetition, CCNet tiers, DSIR, dedup) assumes the boilerplate
is gone.  This module supplies that step as a DETERMINISTIC
block-classification extractor in the jusText / trafilatura family
(Pomikalek 2011, "Removing boilerplate and duplicate content from web
corpora"), built on the stdlib ``html.parser`` so the exact same rules
run everywhere and the output is hash-oracle-able like the image/audio
codecs in :mod:`operators/multimodal`.

The reference system has no crawl path at all (its ingest starts at
structured filings — /root/reference/robosystems/adapters/sec); this
is extension surface prescribed by the LLM-pipeline brief.

Algorithm (all thresholds fixed and documented — no model, no
randomness):

1. **Segment** the document into text blocks.  Inline markup
   (``<b> <i> <span> <a> ...``) accumulates into the current block;
   any block-level tag boundary (``p div li h1-h6 td blockquote pre
   ...``) flushes it.  ``<script> <style> <noscript> <template> <svg>
   <math> <iframe> <select>`` subtrees are dropped wholesale;
   ``<title>`` is captured separately and is not a block.  Character
   references are decoded by the parser (``&amp;`` -> ``&``).
   Whitespace inside a block collapses to single spaces (HTML
   rendering semantics); empty blocks vanish.

2. **Classify** each block:

   - inside ``<nav> <footer> <aside> <header> <menu> <form>`` at any
     ancestor depth -> boilerplate (site chrome);
   - block link density (chars under ``<a>`` / block chars) >= 0.5
     -> boilerplate (link lists, share bars, related-article rails);
   - fewer than ``min_chars`` (default 3) characters -> boilerplate
     (stray separators);
   - otherwise main content.  Headings count as content: they carry
     topical signal the downstream quality gates want.

   jusText additionally smooths short blocks by their neighbours'
   classes; that pass is deliberately omitted — it helps marginally on
   messy pages but makes per-block classification non-local, which
   costs explainability and makes incremental re-extraction
   order-sensitive.  Stated deviation.

3. **Emit** the surviving blocks joined with ``\\n`` plus per-document
   diagnostics (block counts, whole-document link density) that feed
   the existing quality gates.

Scale shape: one document never leaves its executor — the extractor is
a pure ``str -> dict`` function applied inside ``mapInPandas`` (Arrow
batches, no row-at-a-time Python UDF), exactly the
:mod:`pipelines/xbrl_parse` pattern.  Malformed HTML cannot hang or
kill a stage: ``html.parser`` is non-raising by design, and the
extractor degrades to treating unparseable fragments as text.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "extract_blocks",
    "extract_main_text",
    "html_extract",
    "html_blocks",
]

_WS = re.compile(r"\s+")

# Subtrees that never contribute text.
_SKIP = {
    "script",
    "style",
    "noscript",
    "template",
    "svg",
    "math",
    "iframe",
    "select",
    "datalist",
    "object",
    "audio",
    "video",
    "canvas",
}

# Ancestor tags marking site chrome: every block inside is boilerplate.
_CHROME = {"nav", "footer", "aside", "header", "menu", "form"}

# Tags whose open OR close ends the current text block.  Both the
# dedicated text containers (p, headings, list items, cells) and the
# structural containers (div, section, table, ...) break blocks; the
# difference is only which tag the block reports as its own.
_BLOCK = {
    "p",
    "h1",
    "h2",
    "h3",
    "h4",
    "h5",
    "h6",
    "li",
    "dt",
    "dd",
    "td",
    "th",
    "caption",
    "figcaption",
    "blockquote",
    "pre",
    "div",
    "section",
    "article",
    "main",
    "body",
    "html",
    "ul",
    "ol",
    "dl",
    "table",
    "thead",
    "tbody",
    "tfoot",
    "tr",
    "figure",
    "details",
    "summary",
    "fieldset",
    "hr",
    "br",
    # chrome containers break blocks too (they do in rendering); the
    # open-tag flush runs BEFORE the chrome counter increments and the
    # close-tag flush BEFORE it decrements, so the blocks inside carry
    # the chrome flag and the neighbours don't.
    "nav",
    "footer",
    "aside",
    "header",
    "menu",
    "form",
}

# Void elements: no matching end tag ever arrives.
_VOID = {"br", "hr", "img", "input", "meta", "link", "wbr", "source", "area"}


class _Extractor(HTMLParser):
    """Streaming block segmenter.  ``convert_charrefs=True`` (the
    default) decodes entities before ``handle_data``."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self.title_parts: list[str] = []
        self._frags: list[tuple[str, bool]] = []  # (raw text, inside <a>)
        self._block_tag = ""
        self._skip = 0
        self._chrome = 0
        self._a = 0
        self._title = 0

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if not self._frags:
            return
        frags, self._frags = self._frags, []
        text = _WS.sub(" ", "".join(f for f, _ in frags)).strip()
        if not text:
            return
        link_chars = sum(
            len(_WS.sub(" ", f).strip()) for f, in_a in frags if in_a
        )
        self.blocks.append(
            {
                "tag": self._block_tag or "body",
                "text": text,
                "n_chars": len(text),
                # normalization can only shrink fragments, but clamp
                # anyway so density is always a valid ratio
                "link_chars": min(link_chars, len(text)),
                "chrome": self._chrome > 0,
            }
        )

    # -- parser hooks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "title":
            self._title += 1
            return
        if tag in _BLOCK:
            self._flush()
            if tag not in _VOID:
                self._block_tag = tag
        if tag in _CHROME:
            self._chrome += 1
        if tag == "a":
            self._a += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._skip:
            return
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "title":
            self._title = max(0, self._title - 1)
            return
        if tag in _BLOCK and tag not in _VOID:
            self._flush()
            self._block_tag = ""
        if tag in _CHROME:
            self._chrome = max(0, self._chrome - 1)
        if tag == "a":
            self._a = max(0, self._a - 1)

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        if self._title:
            self.title_parts.append(data)
            return
        if data:
            self._frags.append((data, self._a > 0))

    def close(self) -> None:  # flush trailing text outside any block
        super().close()
        self._flush()


def extract_blocks(html: str) -> tuple[str, list[dict]]:
    """Parse ``html`` and return ``(title, blocks)`` where each block
    is ``{tag, text, n_chars, link_chars, chrome}``.  Never raises on
    malformed markup — stray ``<`` and unbalanced tags degrade to text
    or empty blocks, matching browser error recovery closely enough
    for corpus work."""
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is documented non-raising; this guard exists so
        # a pathological input can at worst lose its tail, never a
        # stage.  Blocks collected so far are kept.
        p._flush()
    title = _WS.sub(" ", "".join(p.title_parts)).strip()
    return title, p.blocks


def extract_main_text(
    html: str,
    max_link_density: float = 0.5,
    min_chars: int = 3,
) -> dict:
    """Classify blocks and return the per-document extraction record:
    ``{title, text, n_blocks, n_boilerplate, link_density}``.

    ``text`` is the main-content blocks joined with newlines;
    ``link_density`` is the WHOLE-document anchor-text share (all
    blocks, chrome included) — the page-level spamminess signal the
    CCNet-style tiering wants, independent of what was kept."""
    title, blocks = extract_blocks(html)
    kept: list[str] = []
    n_boiler = 0
    tot = link = 0
    for b in blocks:
        tot += b["n_chars"]
        link += b["link_chars"]
        if (
            b["chrome"]
            or b["n_chars"] < min_chars
            or b["link_chars"] >= max_link_density * b["n_chars"]
        ):
            n_boiler += 1
        else:
            kept.append(b["text"])
    return {
        "title": title,
        "text": "\n".join(kept),
        "n_blocks": len(blocks),
        "n_boilerplate": n_boiler,
        "link_density": (float(link) / tot) if tot else 0.0,
    }


_EXTRACT_FIELDS = [
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_blocks", T.IntegerType()),
    T.StructField("n_boilerplate", T.IntegerType()),
    T.StructField("link_density", T.DoubleType()),
]


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
    min_chars: int = 3,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed main-text extraction: ``(id, html)`` ->
    ``(id, *keep_cols, title, text, n_blocks, n_boilerplate,
    link_density)``.  ``keep_cols`` ride through unchanged (the crawl
    timestamp / URL columns a streaming ingest needs downstream).

    Pure map over Arrow batches — no shuffle, no state, no driver
    round-trip; at 100 TB this is scan-bound and embarrassingly
    parallel, the same posture as the codec decoders.  Works on both
    batch and streaming frames (stateless mapInPandas)."""
    import pandas as pd

    keep_fields = [df.schema[c] for c in keep_cols]
    id_field = df.schema[id_col]
    schema = T.StructType([id_field, *keep_fields, *_EXTRACT_FIELDS])

    def run(it):
        for pdf in it:
            recs = [
                extract_main_text(
                    h if isinstance(h, str) else "",
                    max_link_density=max_link_density,
                    min_chars=min_chars,
                )
                for h in pdf[html_col]
            ]
            out = pd.DataFrame(recs)
            for k, c in enumerate(keep_cols):
                out.insert(k, c, pdf[c].values)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, *keep_cols, html_col).mapInPandas(run, schema)


def html_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
    min_chars: int = 3,
) -> DataFrame:
    """Per-BLOCK exploded view for auditing the classifier:
    ``(id, block_idx, tag, text, n_chars, link_density, is_boilerplate)``.
    Same map-only shape as :func:`html_extract`."""
    import pandas as pd

    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            id_field,
            T.StructField("block_idx", T.IntegerType()),
            T.StructField("tag", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("link_density", T.DoubleType()),
            T.StructField("is_boilerplate", T.BooleanType()),
        ]
    )

    def run(it):
        for pdf in it:
            rows = []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                _, blocks = extract_blocks(h if isinstance(h, str) else "")
                for i, b in enumerate(blocks):
                    boiler = (
                        b["chrome"]
                        or b["n_chars"] < min_chars
                        or b["link_chars"]
                        >= max_link_density * b["n_chars"]
                    )
                    rows.append(
                        (
                            did,
                            i,
                            b["tag"],
                            b["text"],
                            b["n_chars"],
                            float(b["link_chars"]) / b["n_chars"],
                            bool(boiler),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "block_idx",
                    "tag",
                    "text",
                    "n_chars",
                    "link_density",
                    "is_boilerplate",
                ],
            )

    return df.select(id_col, html_col).mapInPandas(run, schema)
