"""Doc-search connector seam (sources/doc_search.py) — the
"OpenSearch connector" platform component: a persisted Spark-native
inverted index with score parity to the query-time BM25 path, and the
external-engine stub seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.operators.search import bm25_topk
from robosystems_spark.sources.doc_search import (
    ExternalSearchConnector,
    SparkBM25Index,
)

QUERY = ["spark", "vector", "window"]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_indexed_search_matches_query_time_bm25(spark, docs, tmp_path):
    idx = SparkBM25Index(str(tmp_path / "idx"))
    stats = idx.index_documents(docs)
    assert stats["n_docs"] == docs.count() and stats["avgdl"] > 0

    got = idx.search(spark, QUERY, k=25).collect()
    want = bm25_topk(docs, QUERY, k=25).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_postings_scan_prunes_to_query_terms(spark, docs, tmp_path):
    """The search-engine property: a query reads its posting lists, not
    the corpus — term IN (...) must reach the parquet scan."""
    from tests.test_plans import plan_of

    idx = SparkBM25Index(str(tmp_path / "idx2"))
    idx.index_documents(docs)
    plan = plan_of(idx.search(spark, QUERY, k=10))
    assert "In(term, [spark,vector,window])" in plan
    assert "TakeOrderedAndProject" in plan  # top-k never fully sorts


def test_index_rebuild_overwrites(spark, docs, tmp_path):
    idx = SparkBM25Index(str(tmp_path / "idx3"))
    idx.index_documents(docs.limit(10))
    assert idx.index_documents(docs)["n_docs"] == docs.count()


def test_external_connector_is_a_documented_stub(spark):
    conn = ExternalSearchConnector("https://search.example.internal:9200")
    with pytest.raises(NotImplementedError, match="bulk API"):
        conn._bulk_index([])
    with pytest.raises(NotImplementedError, match="doc_id, score"):
        conn.search(spark, QUERY)
    # the Spark-side response contract is concrete and parseable
    empty = spark.createDataFrame([], ExternalSearchConnector.SEARCH_SCHEMA)
    assert [f.name for f in empty.schema.fields] == [
        "doc_id",
        "score",
        "n_terms_matched",
    ]


def test_search_handles_unknown_terms(spark, docs, tmp_path):
    idx = SparkBM25Index(str(tmp_path / "idx4"))
    idx.index_documents(docs)
    assert idx.search(spark, ["zzzzznotaterm"], k=5).count() == 0


def test_hybrid_rrf_fuses_and_stays_topk_shaped(spark, sf_dir):
    """RRF hybrid: candidate lists are top-k plans (no global sort of
    the corpus), missing-side docs contribute 0, ranks total-ordered."""
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded
    from tests.test_plans import plan_of

    _ensure_loaded()
    # plan shape pinned on the DISTRIBUTED path (the r13 resident tier
    # returns a LocalTableScan under the gates); the value checks below
    # run on the default (resident) path
    from robosystems_spark.operators import resident_text as RT

    old = RT.RESIDENT_DOCS_MAX
    RT.RESIDENT_DOCS_MAX = 0
    try:
        plan = plan_of(REGISTRY["hybrid_search_rrf"].fn(spark, sf_dir))
    finally:
        RT.RESIDENT_DOCS_MAX = old
    df = REGISTRY["hybrid_search_rrf"].fn(spark, sf_dir)
    assert plan.count("TakeOrderedAndProject") >= 2  # both candidate lists + fusion
    rows = df.collect()
    assert rows and all(r["rrf_score"] > 0 for r in rows)
    # fused score equals the closed form of the two ranks
    for r in rows:
        want = (1.0 / (60 + r["lex_rank"]) if r["lex_rank"] else 0.0) + (
            1.0 / (60 + r["vec_rank"]) if r["vec_rank"] else 0.0
        )
        assert abs(r["rrf_score"] - want) < 1e-9
    # descending fusion order with id tiebreak
    keys = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_trigram_like_search_equals_plain_scan(spark, sf_dir):
    """Index-accelerated LIKE must be output-identical to the full
    contains() scan (the index only prunes candidates; the verify step
    removes trigram-coincidence false positives), including patterns
    whose trigrams all occur corpus-wide, and must fall back cleanly
    below 3 chars."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators.search import (
        trigram_like_search,
        trigram_postings,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = trigram_postings(docs).cache()
    for pat in ("merge batch", "stream window stream", "zz-not-there", "ta"):
        got = {r["doc_id"] for r in trigram_like_search(docs, pat, postings=idx).collect()}
        want = {
            r["doc_id"]
            for r in docs.filter(
                F.lower(F.col("text")).contains(pat.lower())
            ).collect()
        }
        assert got == want, pat
    # the index actually prunes: candidate posting rows for a selective
    # pattern cover far fewer docs than the corpus
    grams = sorted({"merge batch"[i : i + 3] for i in range(len("merge batch") - 2)})
    n_cand = (
        idx.filter(F.col("trigram").isin(grams))
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") == len(grams))
        .count()
    )
    assert n_cand < docs.count()
    idx.unpersist()
