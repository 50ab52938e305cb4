"""URL canonicalization + per-domain curation for crawl corpora.

Web-scale corpus pipelines (RefinedWeb — Penedo et al. 2023; CCNet;
Dolma) curate by URL before any content operator runs: canonicalize so
the same page fetched under byte-different URLs dedups, then bound any
single site's contribution (per-domain caps) so SEO farms can't
dominate the mixture.  Both are pure column expressions here — JVM-side
regex/HOF, whole-stage codegen, no UDF — so at 100 TB they ride the
scan for free.

Canonicalization rules (deterministic, documented — the conservative
subset every crawler agrees on; no network, no public-suffix list):

- scheme and host lowercase;
- default ports stripped (``:80`` http, ``:443`` https);
- fragment stripped (never reaches the server);
- tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``, ``mc_eid``);
- remaining query parameters SORTED (order is almost never
  semantic; sorting merges permuted duplicates — stated tradeoff);
- empty path normalized to ``/``.

``registered_domain`` approximates the registrable domain as the last
two host labels (``a.b.example.com -> example.com``) — the documented
deviation from a full public-suffix-list lookup (``co.uk``-style
suffixes would need the PSL shipped as a broadcast table; the seam is
a one-join upgrade).

The reference has no crawl surface (extension-frontier, same as
operators/html.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "normalize_url",
    "registered_domain",
    "domain_caps",
    "TRACKING_PARAMS",
]

TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "mc_eid")

# RFC 3986 appendix B
_URL_RE = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"


def _part(url: Column, group: int) -> Column:
    return F.regexp_extract(url, _URL_RE, group)


def normalize_url(url_col: str | Column) -> Column:
    """Canonical URL as one codegen expression (rules in the module
    docstring)."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(_part(url, 2))
    authority = F.lower(_part(url, 4))
    # strip :80 only for http and :443 only for https
    host = (
        F.when(
            (scheme == "http") & authority.endswith(":80"),
            authority.substr(F.lit(1), F.length(authority) - 3),
        )
        .when(
            (scheme == "https") & authority.endswith(":443"),
            authority.substr(F.lit(1), F.length(authority) - 4),
        )
        .otherwise(authority)
    )
    path = _part(url, 5)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = _part(url, 7)
    tracked = "|".join(TRACKING_PARAMS)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(f"^(utm_[^=]*|{tracked})(=|$)"),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )


def registered_domain(host_or_url: str | Column, from_url: bool = True) -> Column:
    """Last two host labels (documented PSL approximation)."""
    c = (
        F.col(host_or_url)
        if isinstance(host_or_url, str)
        else host_or_url
    )
    host = F.lower(_part(c, 4)) if from_url else F.lower(c)
    host = F.regexp_replace(host, r":\d+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    )


def domain_caps(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 100,
) -> DataFrame:
    """Per-domain contribution bound (RefinedWeb §3.1 shape): keep at
    most ``cap`` documents per registered domain, lowest ids first (the
    deterministic 'earliest crawled' proxy), and report each kept row
    with its domain, rank, and the domain's total count.

    One shuffle on the domain key; the window and the count share it.
    Skewed mega-domains are exactly what the cap bounds — the window
    still has to SORT a hot domain's rows, so at extreme skew combine
    with operators/skew.py salting on the pre-cap count."""
    dom = registered_domain(url_col).alias("domain")
    w = Window.partitionBy("domain").orderBy(F.col(id_col).asc())
    wc = Window.partitionBy("domain")
    return (
        df.select(F.col(id_col), F.col(url_col), dom)
        .withColumn("domain_rank", F.row_number().over(w))
        .withColumn("domain_total", F.count(F.lit(1)).over(wc))
        .filter(F.col("domain_rank") <= cap)
        .select(
            id_col, url_col, "domain", "domain_rank", "domain_total"
        )
    )
