"""Crawl-corpus front-door registry entries with HARD DuckDB oracles.

Same verification pattern as :mod:`inventory/multimodal`: the payloads
(HTML pages, WARC archives) are synthesized DETERMINISTICALLY from the
``documents`` table by a closed-form template both engines can state,
the Spark side round-trips them through the REAL parsers
(:mod:`operators/html` block extractor, :mod:`sources/warc` record
walker) inside ``mapInPandas``, and the oracle computes the expected
output from the template directly.  An extractor that mishandles
skip-subtrees, chrome ancestors, link density, entity decoding, or
WARC framing diverges from the oracle immediately.

The fixture page exercises every classification rule at once: a
``<script>`` whose string literal CONTAINS markup (must not leak), a
``<nav>`` and a ``<footer>`` (chrome ancestors), an ``<h1>`` inside
``<header>`` (chrome wins over heading), a share-bar ``<div>`` that is
link-dense but NOT chrome (density rule must fire), an ``&copy;``
entity, and the real document text in the one main ``<p>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from robosystems_spark.checkpointing import materialize
from robosystems_spark.inventory import register
from robosystems_spark.io import read_table


def _page(doc_id: int, text: str) -> str:
    """The fixture page.  Layout constants the oracles depend on:
    6 blocks (nav, h1, h2, p, share-div, footer), 4 boilerplate,
    anchor chars = 9 (nav) + 14 (share) + 5 (footer) = 28, non-text
    block chars = 12 + (4+len(id)) + 9 + 16 + 20."""
    did = str(doc_id)
    return (
        "<html><head><title>Doc " + did + "</title>"
        "<style>p{color:red}</style>"
        '<script>var x="<p>nope</p>";</script></head>\n<body>\n'
        '<nav><a href="/">Home</a> | <a href="/a">About</a></nav>\n'
        "<header><h1>Doc " + did + "</h1></header>\n<article>\n"
        "  <h2>Section " + str(doc_id % 7) + "</h2>\n"
        "  <p>" + text + "</p>\n"
        '  <div class="share"><a href="#">Tweet</a> <a href="#">Share</a>'
        ' <a href="#">Like</a></div>\n'
        "</article>\n"
        "<footer>&copy; 2024 Example <a href=\"/t\">Terms</a></footer>\n"
        "</body></html>"
    )


def _doc_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan redistributed across cores: the per-row work
    here is Python (template render, gzip, parse), so a sub-split
    table must not run single-task (operators/text.py rationale)."""
    from robosystems_spark.operators.text import _parallelize_small_scan

    return _parallelize_small_scan(
        read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


def _html_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _doc_texts(spark, sf_dir)

    def gen(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "html": [
                        _page(int(i), t)
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return docs.mapInPandas(
        gen,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("html", T.StringType()),
            ]
        ),
    )


@register(
    "text_html_extract",
    oracle=r"""
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           'Section ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) || TRIM(text)
             AS main_text,
           6 AS n_blocks,
           4 AS n_boilerplate,
           ROUND(28.0 / (61 + LENGTH(CAST(doc_id AS VARCHAR))
                            + LENGTH(TRIM(text))), 6) AS link_density
    FROM documents
    ORDER BY doc_id
    """,
    doc="REAL HTML main-content extraction (jusText-class block "
    "classifier, operators/html.py): each document is wrapped in a "
    "fixture page with nav/header/footer chrome, a link-dense share "
    "bar, a script whose string literal contains markup, and an "
    "entity; the stdlib-parser extractor segments + classifies blocks "
    "in mapInPandas and must recover exactly the heading + article "
    "text, the block counts, and the page link density the template "
    "implies — any skip-subtree, chrome-ancestor, whitespace, or "
    "density bug diverges.",
    tags=("crawl", "text"),
    bench=True,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from robosystems_spark.operators.html import (
        _EXTRACT_FIELDS,
        extract_main_text,
    )

    # r13 (guide §4): render + extract FUSED into one mapInPandas —
    # the two-stage shape (one mapInPandas rendering pages, a second
    # one extracting) shipped every HTML string JVM->Python->JVM->
    # Python just to hand it to the next pure function.  The whole
    # corpus extracts in ~1.05 s single-core, so the extra Arrow
    # round trip WAS the entry's cost (1.7 s at 32 cores).  Same pure
    # functions (_page -> extract_main_text with html_extract's
    # defaults), same output schema; 2.7x fewer boundary crossings at
    # any scale.
    def run(it):
        for pdf in it:
            recs = [
                extract_main_text(_page(int(i), t))
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            out = pd.DataFrame(recs)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    extracted = _doc_texts(spark, sf_dir).mapInPandas(
        run,
        T.StructType([T.StructField("doc_id", T.LongType()), *_EXTRACT_FIELDS]),
    )
    # materialize before the sort: orderBy's range-partitioner
    # sampling pass is a SECOND consumer of the child, and an
    # un-checkpointed mapInPandas child re-runs the whole Python
    # extraction for it (measured 2x: 0.6 -> 1.2-1.8 s at sf0.1) —
    # the repo's fan-out checkpoint discipline applies to sorts too.
    return (
        extracted.select(
            "doc_id",
            "title",
            F.col("text").alias("main_text"),
            "n_blocks",
            "n_boilerplate",
            F.round("link_density", 6).alias("link_density"),
        )
        .transform(materialize)
        .orderBy("doc_id")
    )


# "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" = 45 octets
_HTTP_HEAD_LEN = 45


def _warc_blob_rows(pdf, body_of, content_type: str):
    """Build one per-record-gzip WARC blob for an Arrow batch and
    re-parse it with the real reader — the round-trip both warc
    entries share."""
    from robosystems_spark.sources.warc import build_warc, parse_warc_file

    recs = [
        {
            "warc_type": "response",
            "target_uri": f"http://corpus.example/doc/{int(did)}",
            "content_type": "application/http; msgtype=response",
            "payload": (
                b"HTTP/1.1 200 OK\r\nContent-Type: "
                + content_type.encode()
                + b"\r\n\r\n"
                + body_of(int(did), t).encode("utf-8")
            ),
        }
        for did, t in zip(pdf["doc_id"], pdf["text"])
    ]
    blob = build_warc(recs, per_record_gzip=True)
    return parse_warc_file("mem://batch", blob)


@register(
    "warc_http_records",
    oracle=f"""
    SELECT doc_id,
           'response' AS warc_type,
           200 AS http_status,
           'text/plain' AS http_content_type,
           CAST({_HTTP_HEAD_LEN} + OCTET_LENGTH(ENCODE(text)) AS BIGINT)
             AS content_length,
           text AS body_text
    FROM documents
    ORDER BY doc_id
    """,
    doc="REAL WARC front door (sources/warc.py): each document becomes "
    "a per-record-gzip WARC response member whose payload is a full "
    "HTTP/1.1 response; the reader must walk the gzip members, "
    "enforce Content-Length/CRLF framing, and strip the HTTP head — "
    "record type, status, content type, the record's octet length, "
    "and the exact body all hash-checked against the template.",
    tags=("crawl",),
)
def warc_http_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _doc_texts(spark, sf_dir)

    def run(it):
        for pdf in it:
            rows = _warc_blob_rows(pdf, lambda d, t: t, "text/plain")
            yield pd.DataFrame(
                {
                    "doc_id": [
                        int(r[4].rsplit("/", 1)[1]) for r in rows
                    ],
                    "warc_type": [r[3] for r in rows],
                    "http_status": [r[8] for r in rows],
                    "http_content_type": [r[9] for r in rows],
                    "content_length": [r[7] for r in rows],
                    "body_text": [r[10].decode("utf-8") for r in rows],
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("warc_type", T.StringType()),
            T.StructField("http_status", T.IntegerType()),
            T.StructField("http_content_type", T.StringType()),
            T.StructField("content_length", T.LongType()),
            T.StructField("body_text", T.StringType()),
        ]
    )
    # fan-out checkpoint before the sort (see text_html_extract)
    return docs.mapInPandas(run, out_schema).transform(materialize).orderBy("doc_id")


@register(
    "warc_html_quality_funnel",
    oracle=r"""
    SELECT doc_id,
           CAST(2 + LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INTEGER)
             AS n_words,
           (2 + LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+'))) >= 50 AS kept
    FROM documents
    ORDER BY doc_id
    """,
    doc="END-TO-END crawl funnel: WARC bytes (per-record gzip, HTTP "
    "payload carrying the fixture HTML page) -> real WARC record walk "
    "-> real HTML main-content extraction -> word-count quality gate "
    "(the Gopher lower bound, >= 50 words) — the full crawl-ingest "
    "path a training corpus runs, verified value-exact: extracted "
    "words = 2 heading words + the document's own words.",
    tags=("crawl", "text"),
    bench=True,
)
def warc_html_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from robosystems_spark.operators.html import extract_main_text

    docs = _doc_texts(spark, sf_dir)

    def run(it):
        for pdf in it:
            rows = _warc_blob_rows(pdf, _page, "text/html")
            ids, texts = [], []
            for r in rows:
                ids.append(int(r[4].rsplit("/", 1)[1]))
                texts.append(
                    extract_main_text(r[10].decode("utf-8"))["text"]
                )
            yield pd.DataFrame({"doc_id": ids, "extracted": texts})

    extracted = docs.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("extracted", T.StringType()),
            ]
        ),
    )
    n_words = F.size(F.split(F.col("extracted"), r"\s+"))
    # fan-out checkpoint before the sort (see text_html_extract)
    return (
        extracted.select(
            "doc_id",
            n_words.cast("int").alias("n_words"),
            (n_words >= F.lit(50)).alias("kept"),
        )
        .transform(materialize)
        .orderBy("doc_id")
    )


def _fixture_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy crawl URLs as a closed-form function of doc_id (pure
    column expressions — no UDF even in the synthesis): three shapes
    covering uppercase scheme/host, default ports, tracking params,
    unsorted query, fragments, and the empty path."""
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    k = (did % 37).cast("string")
    j = (did % 7).cast("string")
    url = (
        F.when(
            did % 10 == 5,
            F.concat(F.lit("HTTPS://Domain"), j, F.lit(".COM:443")),
        )
        .when(
            did % 2 == 0,
            F.concat(
                F.lit("HTTP://WWW.Sub"), k, F.lit(".Domain"), j,
                F.lit(".COM:80/articles/"), did.cast("string"),
                F.lit("/?utm_source=feed&b=2&a=1&fbclid=X"),
                did.cast("string"), F.lit("#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("HTTPS://Sub"), k, F.lit(".Domain"), j,
                F.lit(".COM:443/doc/"), did.cast("string"),
            )
        )
    )
    return d.select("doc_id", url.alias("url"))


_URL_ORACLE_RAW = """CASE
  WHEN doc_id % 10 = 5 THEN 'HTTPS://Domain' || CAST(doc_id % 7 AS VARCHAR) || '.COM:443'
  WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.Sub' || CAST(doc_id % 37 AS VARCHAR)
       || '.Domain' || CAST(doc_id % 7 AS VARCHAR) || '.COM:80/articles/'
       || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1&fbclid=X'
       || CAST(doc_id AS VARCHAR) || '#frag'
  ELSE 'HTTPS://Sub' || CAST(doc_id % 37 AS VARCHAR) || '.Domain'
       || CAST(doc_id % 7 AS VARCHAR) || '.COM:443/doc/'
       || CAST(doc_id AS VARCHAR)
END"""


@register(
    "crawl_url_normalize",
    oracle=f"""
    SELECT doc_id,
           CASE
             WHEN doc_id % 10 = 5 THEN
               'https://domain' || CAST(doc_id % 7 AS VARCHAR) || '.com/'
             WHEN doc_id % 2 = 0 THEN
               'http://www.sub' || CAST(doc_id % 37 AS VARCHAR)
               || '.domain' || CAST(doc_id % 7 AS VARCHAR)
               || '.com/articles/' || CAST(doc_id AS VARCHAR) || '/?a=1&b=2'
             ELSE
               'https://sub' || CAST(doc_id % 37 AS VARCHAR)
               || '.domain' || CAST(doc_id % 7 AS VARCHAR)
               || '.com/doc/' || CAST(doc_id AS VARCHAR)
           END AS canonical_url,
           'domain' || CAST(doc_id % 7 AS VARCHAR) || '.com'
             AS registered_domain
    FROM documents
    ORDER BY doc_id
    """,
    doc="URL canonicalization (RefinedWeb/CCNet curation front step): "
    "lowercase scheme+host, default-port strip, fragment strip, "
    "tracking-param drop (utm_*/fbclid/...), query-param sort, empty "
    "path -> '/', plus the registrable-domain extraction — all ONE "
    "codegen expression (RFC 3986 regex + array HOFs, no UDF); the "
    "oracle states the canonical string closed-form from doc_id, so "
    "any parsing/normalization bug diverges.",
    tags=("crawl",),
)
def crawl_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.urls import (
        normalize_url,
        registered_domain,
    )

    return (
        _fixture_urls(spark, sf_dir)
        .select(
            "doc_id",
            normalize_url("url").alias("canonical_url"),
            registered_domain("url").alias("registered_domain"),
        )
        .orderBy("doc_id")
    )


@register(
    "crawl_domain_caps",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_URL_ORACLE_RAW} AS url,
             'domain' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain
      FROM documents
    ),
    r AS (
      SELECT doc_id, url, domain,
             CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id)
                  AS INTEGER) AS domain_rank,
             COUNT(*) OVER (PARTITION BY domain) AS domain_total
      FROM u
    )
    SELECT doc_id, url, domain, domain_rank, domain_total
    FROM r WHERE domain_rank <= 5
    ORDER BY doc_id
    """,
    doc="Per-domain contribution caps (RefinedWeb section 3.1 shape): "
    "keep at most 5 docs per registered domain, lowest ids first, "
    "with each kept row's rank and the domain's total — the SEO-farm "
    "bound a crawl mixture needs; one shuffle on the domain key, "
    "window rank + count share it.",
    tags=("crawl",),
)
def crawl_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.urls import domain_caps

    return domain_caps(_fixture_urls(spark, sf_dir), cap=5).orderBy(
        "doc_id"
    )


def _curation_oracle() -> str:
    """Composed-funnel oracle: the closed-form extracted text
    ('Section k' + newline + body, pinned by the extraction goldens),
    the registered domain from the URL fixture, the Gopher word gate,
    RefinedWeb domain caps, and the FULL minhash oracle (nested WITH,
    table = the cap survivors) for the dedup stage."""
    from robosystems_spark.operators.dedup import minhash_oracle_sql

    inner = minhash_oracle_sql(threshold=0.7, table="surv")
    return rf"""
    WITH ex AS (
      SELECT doc_id,
             'Section ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) || text
               AS text,
             CAST(2 + LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INTEGER)
               AS n_words,
             'domain' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain
      FROM documents
    ),
    q AS (
      SELECT doc_id, text, n_words, domain, n_words >= 50 AS quality_pass
      FROM ex
    ),
    capr AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id)
                  AS INTEGER) AS domain_rank
      FROM q WHERE quality_pass
    ),
    surv AS (
      SELECT q.doc_id, q.text
      FROM q JOIN capr c USING (doc_id)
      WHERE c.domain_rank <= 5
    ),
    pairs AS (SELECT doc_a, doc_b FROM ({inner}) mp),
    dup AS (
      SELECT doc_b AS doc_id, MIN(doc_a) AS dup_of
      FROM pairs GROUP BY doc_b
    )
    SELECT q.doc_id,
           q.domain AS registered_domain,
           q.n_words,
           q.quality_pass,
           c.domain_rank,
           COALESCE(c.domain_rank <= 5, FALSE) AS cap_pass,
           d.dup_of,
           (q.quality_pass AND COALESCE(c.domain_rank <= 5, FALSE)
            AND d.dup_of IS NULL) AS kept
    FROM q
    LEFT JOIN capr c USING (doc_id)
    LEFT JOIN dup d USING (doc_id)
    ORDER BY q.doc_id
    """




def _curation_resident_tail(q: DataFrame) -> DataFrame | None:
    """Resident twin of the curation tail (domain-rank window ->
    RefinedWeb caps -> survivor minhash -> verdict assembly) over ONE
    bounded collect of the checkpointed q frame.  Exact by
    construction: the rank is a cumulative integer count within
    (domain, doc_id order), caps and verdict are boolean algebra, the
    dedup stage is the bit-exact resident minhash kernel
    (operators/resident_text.py).  Returns None on any corpus-gate
    miss (callers run the unchanged distributed tail)."""
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(
        q, "text", "doc_id",
        extra_cols=("registered_domain", "n_words", "quality_pass"),
    )
    if got is None:
        return None
    ids, texts, _n, ex = got
    doms = ex["registered_domain"]
    if any(d is None for d in doms):
        return None  # window over null domains: keep the Spark tail
    quality = np.array(
        [bool(x) if x is not None else False for x in ex["quality_pass"]]
    )
    qnull = np.array([x is None for x in ex["quality_pass"]])
    if qnull.any():
        return None
    # domain_rank: within (domain, doc_id asc), cumulative count of
    # quality rows, exposed only on quality rows (CASE NULL branch)
    order = np.lexsort((ids, np.array(doms, dtype=object)))
    dsorted = np.array(doms, dtype=object)[order]
    starts = np.flatnonzero(
        np.r_[True, dsorted[1:] != dsorted[:-1]]
    )
    seg = np.cumsum(np.r_[False, dsorted[1:] != dsorted[:-1]])
    csum = np.cumsum(quality[order])
    base = np.concatenate(([0], csum[starts[1:] - 1]))
    rank_sorted = csum - base[seg]
    rank = np.empty(len(ids), dtype=np.int64)
    rank[order] = rank_sorted
    # survivors: quality rows with rank <= 5
    surv = quality & (rank <= 5)
    pairs = RT.minhash_pairs_resident(
        ids[surv], [texts[i] for i in np.flatnonzero(surv)],
        threshold=0.7, num_hashes=64, bands=16, shingle_k=5,
    )
    if pairs is None:
        return None
    dup_of: dict[int, int] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        b = int(b)
        a = int(a)
        if b not in dup_of or a < dup_of[b]:
            dup_of[b] = a
    has_dup = np.array([int(i) in dup_of for i in ids])
    cap_pass = quality & (rank <= 5)
    kept = quality & cap_pass & ~has_dup
    o = np.argsort(ids, kind="stable")
    pdf = pd.DataFrame(
        {
            "doc_id": ids[o],
            "registered_domain": np.array(doms, dtype=object)[o],
            # nullable ints as OBJECT columns of python int/None: the
            # driver's vanilla session has no Arrow createDataFrame
            # path, and the row-path verifier rejects the NaN that
            # pandas nullable-Int columns round-trip through
            "n_words": pd.Series(
                [int(ex["n_words"][i]) for i in o], dtype=object
            ),
            "quality_pass": quality[o],
            "domain_rank": pd.Series(
                [int(rank[i]) if quality[i] else None for i in o],
                dtype=object,
            ),
            "cap_pass": cap_pass[o],
            "dup_of": pd.Series(
                [dup_of.get(int(ids[i])) for i in o], dtype=object
            ),
            "kept": kept[o],
        }
    )
    spark = q.sparkSession
    out = spark.createDataFrame(pdf, schema=_CURATION_SCHEMA)
    return out.orderBy("doc_id")


#: Output schema of the curation verdict — matches the distributed
#: tail bit-for-bit (pinned by the fused-vs-unfused parity test).
_CURATION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("registered_domain", T.StringType(), True),
        T.StructField("n_words", T.IntegerType(), True),
        T.StructField("quality_pass", T.BooleanType(), True),
        T.StructField("domain_rank", T.IntegerType(), True),
        T.StructField("cap_pass", T.BooleanType(), False),
        T.StructField("dup_of", T.LongType(), True),
        T.StructField("kept", T.BooleanType(), True),
    ]
)


@register(
    "crawl_curation_pipeline",
    oracle=_curation_oracle(),
    doc="The COMPOSED crawl front door as one funnel (r10 verdict item "
    "7, mirroring examples/crawl_pipeline_demo.py): WARC bytes -> real "
    "record walk -> real HTML main-text extraction -> URL "
    "canonicalization + registered domain -> Gopher word gate (>= 50) "
    "-> RefinedWeb per-domain caps (5) -> MinHash(64)+LSH(16) near-dup "
    "drop (keep the min id of each pair).  Per-document verdict row "
    "with every stage's flag, hash-checked end-to-end: the oracle "
    "replays extraction closed-form and the whole minhash pipeline "
    "over the cap survivors in DuckDB.",
    tags=("crawl", "text", "dedup"),
    bench=True,
)
def crawl_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from robosystems_spark.operators.dedup import minhash_near_duplicates
    from robosystems_spark.operators.html import extract_main_text
    from robosystems_spark.operators.urls import registered_domain
    from pyspark.sql.window import Window

    docs = _doc_texts(spark, sf_dir)

    def run(it):
        for pdf in it:
            rows = _warc_blob_rows(pdf, _page, "text/html")
            ids, texts = [], []
            for r in rows:
                ids.append(int(r[4].rsplit("/", 1)[1]))
                texts.append(
                    extract_main_text(r[10].decode("utf-8"))["text"]
                )
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    extracted = docs.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    urls = _fixture_urls(spark, sf_dir).select(
        "doc_id", registered_domain("url").alias("registered_domain")
    )
    from robosystems_spark.checkpointing import materialize

    n_words = F.size(F.split(F.col("text"), r"\s+"))
    # materialized once: q feeds the cap window, the dedup survivors,
    # AND the final verdict join — un-cut, the WARC+extract mapInPandas
    # would re-run ~3x (one per consumer)
    q = materialize(
        extracted.join(urls, "doc_id").select(
            "doc_id",
            "text",
            "registered_domain",
            n_words.cast("int").alias("n_words"),
            (n_words >= F.lit(50)).alias("quality_pass"),
        )
    )
    # r13 resident tail: everything after the q checkpoint is small
    # integer/boolean state (ranks, caps, the 35-survivor minhash) —
    # under the corpus gates it runs as ONE bounded collect of the
    # checkpointed q + numpy/python, replacing the window exchange,
    # the survivor re-collect and the verdict join jobs.  Values are
    # exact twins (cumulative integer ranks, the resident minhash
    # kernel, boolean algebra); parity + schema pinned in
    # tests/test_resident_tiers.py; any gate miss falls through to
    # the unchanged distributed tail.
    res = _curation_resident_tail(q)
    if res is not None:
        return res
    # domain_rank inline on q (r12): a quality row's rank among its
    # domain's quality rows (ordered by doc_id, unique) equals the
    # running sum of quality flags at its position, so ONE window over
    # q replaces the filtered row_number frame plus BOTH q⋈capr joins
    # (the survivor filter and the final verdict assembly) — guide
    # §2.4: operations keyed the same way share one exchange.
    # Non-quality rows take the CASE's NULL branch, exactly the LEFT
    # JOIN's null domain_rank in the oracle.
    w = Window.partitionBy("registered_domain").orderBy("doc_id")
    ranked = q.withColumn(
        "domain_rank",
        F.when(
            F.col("quality_pass"),
            F.sum(F.col("quality_pass").cast("int"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("int"),
        ),
    )
    surv = ranked.filter(F.col("domain_rank") <= 5).select(
        "doc_id", "text"
    )
    pairs = minhash_near_duplicates(surv, threshold=0.7)
    dup = pairs.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.min("doc_a").alias("dup_of")
    )
    return (
        ranked.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            "registered_domain",
            "n_words",
            "quality_pass",
            "domain_rank",
            F.coalesce(F.col("domain_rank") <= 5, F.lit(False)).alias(
                "cap_pass"
            ),
            "dup_of",
            (
                F.col("quality_pass")
                & F.coalesce(F.col("domain_rank") <= 5, F.lit(False))
                & F.col("dup_of").isNull()
            ).alias("kept"),
        )
        .orderBy("doc_id")
    )
