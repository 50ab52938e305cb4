"""Doc-search connector seam — the "OpenSearch connector" platform
component (BASELINE.json names it; the reference wires relevance
search over documents to an external OpenSearch cluster).

Two implementations of one interface:

- :class:`SparkBM25Index` — a fully Spark-native inverted index.
  ``index_documents`` tokenizes ONCE and persists three frames:

    postings  (term, doc_id, tf)   range-partitioned and sorted by
                                   term, so every parquet row group
                                   carries tight term min/max stats —
                                   a query's ``term IN (...)`` scan
                                   prunes to its posting lists (the
                                   search-engine property: query cost
                                   is O(posting lists), not O(corpus))
    doclen    (doc_id, dl)         per-document lengths
    stats     (n_docs, avgdl)      1-row corpus constants

  ``search`` then scores Okapi BM25 exactly like
  operators/search.py:32 ``bm25_topk`` but WITHOUT re-tokenizing the
  corpus — the index amortizes the explode across queries.

- :class:`ExternalSearchConnector` — the seam where a real external
  engine plugs in.  The Spark-side contract (what to ship at index
  time, what a search must return) is fixed here; the transport is a
  deliberate :class:`NotImplementedError` stub, exactly like
  multimodal.py's decode_fn seam (no search-engine client exists in
  this environment).

Both return the same search schema ``(doc_id, score,
n_terms_matched)``, so the relational index is a drop-in oracle for
an external engine wired through the same interface.
"""

from __future__ import annotations

import os
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from robosystems_spark.operators.text import tokens


class DocSearchConnector(Protocol):
    """What the platform expects of any doc-search backing."""

    def index_documents(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> dict:
        """(Re)build the index from a corpus; returns index stats."""
        ...

    def search(
        self, spark: SparkSession, query_terms: list[str], k: int = 10
    ) -> DataFrame:
        """Ranked retrieval: (doc_id, score, n_terms_matched) top-k."""
        ...


class SparkBM25Index:
    """Persisted inverted index over parquet; see module docstring.

    ``n_partitions`` bounds the postings layout: at 100 TB the postings
    frame is range-partitioned by term across this many files, each
    sorted, so term-predicate row-group pruning holds at any corpus
    size.  The doclen frame stays unsorted (joined by doc_id after the
    posting-list filter has already shrunk the candidate set).
    """

    def __init__(
        self, path: str, k1: float = 1.2, b: float = 0.75, n_partitions: int = 8
    ):
        self.path = path
        self.k1 = k1
        self.b = b
        self.n_partitions = n_partitions

    def _p(self, name: str) -> str:
        return os.path.join(self.path, name)

    def index_documents(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> dict:
        toks = docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
        )
        doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        postings = toks.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).alias("tf")
        )
        (
            postings.repartitionByRange(self.n_partitions, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(self._p("postings"))
        )
        doclen.write.mode("overwrite").parquet(self._p("doclen"))
        stats = doclen.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        stats.coalesce(1).write.mode("overwrite").parquet(self._p("stats"))
        row = stats.collect()[0]
        return {"n_docs": int(row["n_docs"]), "avgdl": float(row["avgdl"])}

    def search(
        self,
        spark: SparkSession,
        query_terms: list[str],
        k: int = 10,
        ndigits: int = 6,
    ) -> DataFrame:
        terms = [t.lower() for t in query_terms]
        # term IN (...) reaches the parquet scan as a pushed filter and
        # the sorted layout turns it into row-group pruning — the
        # pinned-plan test asserts PushedFilters contains In(term, ...)
        postings = spark.read.parquet(self._p("postings")).filter(
            F.col("term").isin(terms)
        )
        doclen = spark.read.parquet(self._p("doclen"))
        stats = spark.read.parquet(self._p("stats"))

        dfreq = postings.groupBy("term").agg(
            F.countDistinct("doc_id").alias("dfq")
        )
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("dfq") + F.lit(0.5))
            / (F.col("dfq") + F.lit(0.5))
        )
        tf_norm = (F.col("tf") * F.lit(self.k1 + 1.0)) / (
            F.col("tf")
            + F.lit(self.k1)
            * (
                F.lit(1.0 - self.b)
                + F.lit(self.b) * F.col("dl") / F.col("avgdl")
            )
        )
        contrib = (
            postings.join(F.broadcast(dfreq), "term")
            .join(doclen, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select(F.col("doc_id"), (idf * tf_norm).alias("w"))
        )
        scored = contrib.groupBy("doc_id").agg(
            F.round(F.sum("w"), ndigits).alias("score"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


class ExternalSearchConnector:
    """The external-engine seam (OpenSearch-shaped).

    A production wiring implements ``_bulk_index`` and ``_query``
    against the engine's transport; everything Spark-side is already
    decided here:

    - index time: documents are shipped per partition as bulk actions
      ``{"_id": <id_col>, "doc": {"text": <text_col>}}`` via
      ``foreachPartition`` (each executor opens its own client — the
      driver never materializes the corpus);
    - query time: the engine's response must yield rows
      ``(doc_id STRING, score DOUBLE, n_terms_matched BIGINT)`` —
      the same schema :class:`SparkBM25Index` returns, so either
      backing satisfies :class:`DocSearchConnector`.
    """

    #: schema an engine response must map to
    SEARCH_SCHEMA = "doc_id string, score double, n_terms_matched bigint"

    def __init__(self, endpoint: str, index_name: str = "documents"):
        self.endpoint = endpoint
        self.index_name = index_name

    def _bulk_index(self, actions) -> None:
        raise NotImplementedError(
            "external search transport is not available in this "
            "environment — implement _bulk_index against your engine's "
            "bulk API (actions are dicts per SEARCH_SCHEMA's docstring)"
        )

    def _query(self, query_terms: list[str], k: int) -> list[tuple]:
        raise NotImplementedError(
            "external search transport is not available in this "
            "environment — implement _query to return (doc_id, score, "
            "n_terms_matched) tuples"
        )

    def index_documents(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> dict:
        bulk = self._bulk_index
        shipped = docs.select(
            F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
        )

        def _ship(rows) -> None:
            bulk(
                {"_id": r["_id"], "doc": {"text": r["_text"]}} for r in rows
            )

        shipped.foreachPartition(_ship)
        return {"endpoint": self.endpoint, "index": self.index_name}

    def search(
        self, spark: SparkSession, query_terms: list[str], k: int = 10
    ) -> DataFrame:
        rows = self._query(query_terms, k)
        return spark.createDataFrame(rows, self.SEARCH_SCHEMA)
