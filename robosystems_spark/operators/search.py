"""BM25 ranked document retrieval — the OpenSearch-shaped doc-search
capability (BASELINE.json names an "OpenSearch connector for doc
search" as a platform component; reference context: robosystems uses
OpenSearch for relevance search over documents).

Re-expressed as pure relational Spark (Okapi BM25 is closed-form over
term statistics), so it is fully DuckDB-oracle-able and scales the
same way the TF-IDF path does:

- tokenize + explode once;
- per-doc length and the corpus aggregates (N, avgdl) as 1-row
  cross-joined aggregates — never a driver-side ``.count()``;
- the query-term filter lands BEFORE the tf/df aggregations, so the
  shuffled state is O(matching postings), not O(corpus vocabulary);
- no broadcast of data-scaled sides: the tiny per-query-term df frame
  is the only broadcast, and it is bounded by |query| rows.

At 100 TB this is the scatter-gather score path of a search engine:
one shuffle keyed by term (bounded by the query's posting lists), one
by doc_id, then a global top-k that Catalyst executes as
TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from robosystems_spark.checkpointing import materialize

from robosystems_spark.operators.text import tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
    resident_max: int | None = None,
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a bag-of-words query.

    score(D, Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
    with the Lucene-style non-negative idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).

    Returns (id_col, score, n_terms_matched) — the rounded score is
    the ranking key (with id tiebreak) so results are stable across
    engines and partitionings.

    r13 resident tier (the resident_text discipline): measured corpus
    gates + the rounding-boundary guard on the order-sensitive per-doc
    contribution sum (``resident_text.bm25_scores_resident``);
    distributed plan unchanged above any gate or on a guard trip.
    """
    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(docs, text_col, id_col, max_docs=resident_max)
    if got is not None:
        res = RT.bm25_scores_resident(
            got[0], got[1], query_terms, k1, b, ndigits
        )
        if res is not None:
            import pandas as pd

            mids, mscores, mterms = res
            rows = sorted(
                zip(mids.tolist(), mscores.tolist(), mterms.tolist()),
                key=lambda r: (-r[1], r[0]),
            )[:k]
            schema = T.StructType(
                [
                    T.StructField(id_col, docs.schema[id_col].dataType, True),
                    T.StructField("score", T.DoubleType(), True),
                    T.StructField("n_terms_matched", T.LongType(), False),
                ]
            )
            return docs.sparkSession.createDataFrame(
                pd.DataFrame(
                    {
                        id_col: [r[0] for r in rows],
                        "score": [r[1] for r in rows],
                        "n_terms_matched": [r[2] for r in rows],
                    }
                ).astype(
                    {id_col: "int64", "score": "float64",
                     "n_terms_matched": "int64"}
                ),
                schema=schema,
            )
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))

    # Per-document length (|D|) over ALL terms (must precede the query
    # filter: BM25 normalizes by full document length).  Checkpointed:
    # consumed by the corpus-constant aggregate AND the contribution
    # join — un-materialized, the tokenize+explode re-runs per consumer.
    doclen = (
        toks.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dl"))
        .transform(materialize)
    )

    # Corpus constants as a 1-row aggregate: broadcast-safe at any SF.
    corpus = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    # Postings for the query terms only — this filter prunes the
    # explode output to the |query| posting lists before any shuffle.
    # Checkpointed: the |query|-term posting rows feed BOTH tf and
    # document frequency — one corpus pass, not two.
    q = toks.filter(
        F.col("term").isin([t.lower() for t in query_terms])
    ).transform(materialize)
    tf = q.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = q.groupBy("term").agg(F.countDistinct(id_col).alias("dfq"))

    idf: Column = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfq") + F.lit(0.5)) / (F.col("dfq") + F.lit(0.5))
    )
    tf_norm: Column = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )

    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(corpus))
        .select(F.col(id_col), (idf * tf_norm).alias("w"))
    )
    scored = contrib.groupBy(id_col).agg(
        F.round(F.sum("w"), ndigits).alias("score"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec,
    k: int = 10,
    n_candidates: int = 100,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 9,
) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: fuse a BM25 ranking
    and an embedding-cosine ranking with
    ``rrf = Σ_systems 1/(rrf_k + rank)`` (Cormack et al.'s RRF — the
    standard lexical+vector hybrid).

    Each system contributes only its top ``n_candidates`` (two
    TakeOrderedAndProject plans — no global sorts), ranks use total
    orders (rounded score DESC, id ASC), and a document missing from
    one list contributes 0 for that system.  Deterministic end to end,
    hence DuckDB-oracle-able (:func:`hybrid_rrf_oracle_sql`).

    ``query_vec`` is a 1-row DataFrame with (``vec_col``,) — the query
    embedding; it is broadcast against the corpus.

    r13 resident tier: under the corpus + vector gates both rankings
    and the fusion run resident — the cosine leg calls the SAME numpy
    expressions the fused pandas-UDF executes (einsum dots, np.round),
    so it is bit-identical by construction; the BM25 leg carries its
    rounding-boundary guard; the RRF combination replicates the exact
    coalesce/divide/round expression.  Distributed plan unchanged
    above any gate or on a guard trip.
    """
    from pyspark.sql.window import Window

    from robosystems_spark.functions import vector as V

    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(docs, text_col, id_col)
    vecs = RT.collect_vectors(embeddings, vec_id_col, vec_col) if got else None
    if got is not None and vecs is not None:
        res = _rrf_resident(
            docs.sparkSession, got, vecs, query_vec, query_terms,
            k, n_candidates, rrf_k, id_col, vec_col, ndigits,
        )
        if res is not None:
            return res

    lex = bm25_topk(
        docs, query_terms, k=n_candidates, id_col=id_col, text_col=text_col
    ).select(
        F.col(id_col).alias("_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc(id_col)))
        .alias("lex_rank"),
    )

    q = query_vec.select(F.col(vec_col).alias("_qv"))
    vec = (
        embeddings.crossJoin(F.broadcast(q))
        .select(
            F.col(vec_id_col).alias("_id"),
            V.cosine(vec_col, "_qv").alias("_cos"),
        )
        .orderBy(F.desc("_cos"), F.asc("_id"))
        .limit(n_candidates)
        .select(
            "_id",
            F.row_number()
            .over(Window.orderBy(F.desc("_cos"), F.asc("_id")))
            .alias("vec_rank"),
        )
    )

    fused = lex.join(vec, "_id", "full_outer").select(
        F.col("_id").alias(id_col),
        F.round(
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)),
            ndigits,
        ).alias("rrf_score"),
        F.col("lex_rank"),
        F.col("vec_rank"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)


def _rrf_resident(
    spark, got, vecs, query_vec, query_terms, k, n_candidates, rrf_k,
    id_col, vec_col, ndigits,
):
    """Resident hybrid-RRF twin (see ``hybrid_rrf_topk``).  Returns a
    DataFrame or None (BM25 rounding guard / query-vec gate miss)."""
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators import resident_text as RT
    from robosystems_spark.operators.graph import _round_half_up_np

    ids, texts = got[0], got[1]
    vids, mat = vecs
    qrows = query_vec.select(F.col(vec_col).alias("_qv")).limit(2).collect()
    if len(qrows) != 1 or qrows[0]["_qv"] is None:
        return None
    qv = np.array(list(qrows[0]["_qv"]), dtype=np.float64)
    if qv.shape[0] != mat.shape[1]:
        return None
    lexres = RT.bm25_scores_resident(ids, texts, query_terms, 1.2, 0.75, 6)
    if lexres is None:
        return None
    mids, mscores, mterms = lexres
    lex_rows = sorted(
        zip(mids.tolist(), mscores.tolist()), key=lambda r: (-r[1], r[0])
    )[:n_candidates]
    lex_rank = {d: i + 1 for i, (d, _s) in enumerate(lex_rows)}
    # cosine leg: the EXACT numpy ops of functions.vector._cosine6
    B = np.broadcast_to(qv, mat.shape)
    num = np.einsum("ij,ij->i", mat, B)
    den = np.maximum(
        np.sqrt(np.einsum("ij,ij->i", mat, mat))
        * np.sqrt(np.einsum("ij,ij->i", B, B)),
        1e-300,
    )
    cos = np.round(num / den, 6)
    vec_rows = sorted(
        zip(vids.tolist(), cos.tolist()), key=lambda r: (-r[1], r[0])
    )[:n_candidates]
    vec_rank = {d: i + 1 for i, (d, _c) in enumerate(vec_rows)}
    all_ids = sorted(set(lex_rank) | set(vec_rank))
    lr = [lex_rank.get(d) for d in all_ids]
    vr = [vec_rank.get(d) for d in all_ids]
    raw = np.array(
        [
            (1.0 / (rrf_k + l) if l is not None else 0.0)
            + (1.0 / (rrf_k + v) if v is not None else 0.0)
            for l, v in zip(lr, vr)
        ],
        dtype=np.float64,
    )
    score = _round_half_up_np(raw, ndigits)
    rows = sorted(
        zip(all_ids, score.tolist(), lr, vr), key=lambda r: (-r[1], r[0])
    )[:k]
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), True),
            T.StructField("rrf_score", T.DoubleType(), True),
            T.StructField("lex_rank", T.IntegerType(), True),
            T.StructField("vec_rank", T.IntegerType(), True),
        ]
    )
    return spark.createDataFrame(
        pd.DataFrame(
            {
                id_col: [r[0] for r in rows],
                "rrf_score": [r[1] for r in rows],
                # nullable ints as object columns (see inventory/crawl)
                "lex_rank": pd.Series([r[2] for r in rows], dtype=object),
                "vec_rank": pd.Series([r[3] for r in rows], dtype=object),
            }
        ),
        schema=schema,
    )


def hybrid_rrf_oracle_sql(
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    n_candidates: int = 100,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 9,
) -> str:
    """Equivalent DuckDB SQL for :func:`hybrid_rrf_topk` with the query
    vector taken from ``embeddings`` at ``query_vec_id``."""
    bm25 = bm25_oracle_sql(query_terms, k=n_candidates, k1=k1, b=b)
    return f"""
    WITH lex0 AS ({bm25}),
    lex AS (
      SELECT doc_id AS _id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS lex_rank
      FROM lex0
    ),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {query_vec_id}),
    vec0 AS (
      SELECT e.vec_id AS _id,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
                                          CAST(qv.q AS DOUBLE[])), 6) AS cos
      FROM embeddings e, qv
      ORDER BY cos DESC, _id ASC
      LIMIT {n_candidates}
    ),
    vec AS (
      SELECT _id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, _id ASC) AS INT) AS vec_rank
      FROM vec0
    )
    SELECT COALESCE(lex._id, vec._id) AS doc_id,
           ROUND(COALESCE(1.0 / ({rrf_k} + lex_rank), 0.0)
                 + COALESCE(1.0 / ({rrf_k} + vec_rank), 0.0), {ndigits}) AS rrf_score,
           lex_rank, vec_rank
    FROM lex FULL OUTER JOIN vec ON lex._id = vec._id
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT {k}
    """


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 6,
    table: str = "documents",
) -> str:
    """The equivalent DuckDB SQL for :func:`bm25_topk` (same tokenizer
    regex as operators/text.py tokens), for the correctness oracle."""
    terms = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    return rf"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS term
      FROM {table}
    ),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM doclen),
    q AS (SELECT * FROM toks WHERE term IN ({terms})),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM q GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS dfq FROM q GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id,
             LN(1.0 + (corpus.n_docs - dfreq.dfq + 0.5) / (dfreq.dfq + 0.5))
             * (tf.tf * ({k1} + 1.0))
             / (tf.tf + {k1} * (1.0 - {b} + {b} * doclen.dl / corpus.avgdl)) AS w
      FROM tf
      JOIN dfreq USING (term)
      JOIN doclen USING (doc_id)
      CROSS JOIN corpus
    )
    SELECT doc_id,
           ROUND(SUM(w), {ndigits}) AS score,
           COUNT(*) AS n_terms_matched
    FROM contrib
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Trigram index: pg_trgm-style substring-search acceleration.
# ---------------------------------------------------------------------------
def trigram_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    only: list[str] | None = None,
) -> DataFrame:
    """Character-trigram posting lists over lowercased text — the
    pg_trgm-shaped index that turns ``LIKE '%pattern%'`` from a full
    corpus scan into a posting-list intersection.

    One pass: JVM-side ``transform(sequence(...))`` slices every
    3-char window (whole-stage codegen, no Python), explode, distinct
    per doc.  Persist the result corpus-partitioned by trigram and a
    search prunes to the pattern's posting lists only.

    ``only`` restricts the build to the given trigrams — the ad-hoc
    analog of that partition pruning.  r12: the ``only`` branch skips
    the positional gram generation entirely: a posting row for a
    KNOWN gram exists iff ``contains(gram)``, so it is one
    whole-stage-codegen ``contains`` per gram per doc and a map-side
    array — no per-position array materialization, no distinct
    shuffle at all (the rows are unique per doc by construction).
    Measured: the search entry's posting build drops from the
    interpreted O(len) transform + explode + distinct to a pure scan.
    """
    if only is not None:
        lowered = docs.select(
            F.col(id_col).alias("doc_id"),
            F.lower(F.col(text_col)).alias("_t"),
        )
        hits = F.array_compact(
            F.array(
                *[
                    F.when(F.col("_t").contains(g), F.lit(g))
                    for g in sorted(set(only))
                ]
            )
        )
        return lowered.select(
            "doc_id", F.explode(hits).alias("trigram")
        )
    # bind lower(text) as a LAMBDA VARIABLE: higher-order functions run
    # interpreted and re-evaluate child expressions per element, so
    # substring(lower(text), i, 3) would re-lower the whole string at
    # every position — O(len^2) per doc (measured 7.0 s -> 2.6 s at
    # sf0.1 for the search entry)
    # sub-3-char guard: Spark's two-arg sequence defaults to step -1
    # when start > stop, so sequence(1, 0) would yield [1, 0] and emit
    # junk postings for texts shorter than 3 chars — short docs get an
    # empty gram array instead.
    grams = F.element_at(
        F.transform(
            F.array(F.lower(F.col(text_col))),
            lambda t: F.when(
                F.length(t) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - 2),
                    lambda i: t.substr(i, F.lit(3)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), grams.alias("_g")
    ).select("doc_id", F.explode("_g").alias("trigram"))
    return exploded.distinct()


def trigram_like_search(
    docs: DataFrame,
    pattern: str,
    postings: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT case-insensitive substring search (``LIKE '%pattern%'``)
    accelerated by the trigram index: a doc can contain ``pattern``
    only if it contains EVERY trigram of the pattern, so candidates =
    docs whose posting rows cover all n pattern trigrams; the final
    ``contains()`` verify runs only on candidates (false positives
    from trigram coincidence are filtered, so the result is exactly
    the scan's answer — index use is invisible in the output).

    At 100 TB the index read touches |pattern trigrams| posting lists
    (partition-pruned if the postings table is partitioned/bucketed by
    trigram) and the verify re-reads only candidate docs — the classic
    two-tier text-index plan.  Patterns shorter than 3 chars fall back
    to the plain scan.

    Returns (doc_id) sorted — the id set a caller joins back to fetch
    full rows.
    """
    pat = pattern.lower()
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("_t")
    )
    if len(pat) < 3:
        return (
            base.filter(F.col("_t").contains(pat)).select("doc_id")
        )
    grams = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    # ad-hoc (no persisted index): build only the pattern's posting
    # lists — the shuffle carries |pattern grams| rows per doc, not the
    # corpus's whole gram set (persisted indexes get the same effect
    # from partition pruning on the isin filter below)
    idx = (
        postings
        if postings is not None
        else trigram_postings(docs, text_col, id_col, only=grams)
    )
    cand = (
        idx.filter(F.col("trigram").isin(grams))
        .groupBy("doc_id")
        .agg(F.countDistinct("trigram").alias("_hits"))
        .filter(F.col("_hits") == len(grams))
        .select("doc_id")
    )
    return (
        base.join(cand, "doc_id", "left_semi")
        .filter(F.col("_t").contains(pat))
        .select("doc_id")
    )


def trigram_like_oracle_sql(
    pattern: str, table: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle: the index path is exact (candidate superset +
    verify), so the oracle is the plain scan it replaces."""
    esc = pattern.lower().replace("'", "''")
    return f"""
    SELECT {id_col} AS doc_id FROM {table}
    WHERE CONTAINS(LOWER(text), '{esc}')
    """


def doc_top_terms(
    docs: DataFrame,
    topk_per_doc: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """Per-document keyphrase extraction: the ``topk_per_doc`` terms
    with the highest tf·idf in each document (idf = ln(N/df) over the
    tokenized corpus, N = documents with at least one token) — the
    summarization / tagging primitive feeding search facets and
    training-data topic labels.

    One tokenize+explode pass: term frequencies are the (doc, term)
    hash aggregate, document frequencies derive FROM that aggregate
    (one row per (doc, term), so df is a count, not a countDistinct),
    and the per-doc top-k is a window ordered by (score DESC, term
    ASC) — a total order, engine-stable.

    PORTABILITY: idf is rounded to 9 digits BEFORE the tf multiply and
    the score to ``decimals`` after — the cross-engine sync points.
    """
    from pyspark.sql.window import Window

    from robosystems_spark.operators.text import tokens

    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        # split('') yields [''] — drop the empty token (oracle parity)
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(materialize)  # feeds df agg, N agg AND the join
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.agg(
        F.countDistinct(F.col(id_col)).cast("double").alias("n_docs")
    )
    idf = F.round(F.log(F.col("n_docs") / F.col("df")), 9)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * idf, decimals).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk_per_doc)
        .select(id_col, "rank", "term", "tf", "df", "score")
    )


def doc_top_terms_oracle_sql(
    table: str = "documents",
    topk_per_doc: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> str:
    """DuckDB twin: identical tokenization, idf rounding sync point,
    and total-ordered per-doc window."""
    return rf"""
    WITH toks AS (
      SELECT {id_col},
             UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM({text_col})), '\s+')) AS term
      FROM {table}
    ),
    tf AS (
      SELECT {id_col}, term, COUNT(*) AS tf
      FROM toks WHERE term <> '' GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(DISTINCT {id_col}) AS DOUBLE) AS n_docs FROM tf),
    scored AS (
      SELECT tf.{id_col}, tf.term, tf.tf, d.df,
             ROUND(tf.tf * ROUND(LN(n.n_docs / d.df), 9), {decimals})
               AS score
      FROM tf JOIN dfreq d USING (term), n
    )
    SELECT {id_col},
           CAST(rank AS INTEGER) AS rank,
           term, tf, df, score
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY {id_col} ORDER BY score DESC, term ASC) AS rank
      FROM scored
    ) WHERE rank <= {topk_per_doc}
    """
