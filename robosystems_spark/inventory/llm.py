"""LLM-data-pipeline inventory: dedup, text analysis, similarity search.

These extend the reference surface (BASELINE.json north star) over the
``documents`` and ``embeddings`` tables.  SQL-expressible operators get
DuckDB oracles; LSH-based ones (engine-specific hash permutations) are
rows-only checked by the driver and covered by unit tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T2

from robosystems_spark.inventory import register
from robosystems_spark.io import read_table
from robosystems_spark.operators import clustering as CL
from robosystems_spark.operators import dedup as D
from robosystems_spark.operators import pq as PQ
from robosystems_spark.operators import projection as PR
from robosystems_spark.operators import similarity as S
from robosystems_spark.operators import text as T


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# Exact dedup — hash groupBy.
# ---------------------------------------------------------------------------
@register(
    "dedup_exact_groups",
    oracle=r"""
    SELECT MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup: md5(normalized text) hash-groupBy, keep min id (LLM-pipeline op).",
    tags=("dedup",),
    bench=True,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Token counting.
# ---------------------------------------------------------------------------
@register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'))                AS n_tokens,
           LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'))) AS n_unique_tokens,
           LENGTH(TRIM(text))                                               AS n_chars_trim
    FROM documents
    """,
    doc="Whitespace token counting per document (LLM-pipeline text analysis).",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_stats(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Quality scoring.
# ---------------------------------------------------------------------------
@register(
    "text_quality_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS DOUBLE)                AS n,
             CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'))) AS DOUBLE) AS uniq,
             CAST(LENGTH(REPLACE(TRIM(text), ' ', '')) AS DOUBLE)                             AS nospace
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           ROUND(uniq / n, 6) AS unique_ratio,
           ROUND(nospace / n, 6) AS avg_token_len,
           ROUND(LEAST(n / 100.0, 1.0) * 0.4 + (uniq / n) * 0.4
                 + LEAST(nospace / n / 8.0, 1.0) * 0.2, 6) AS quality_score
    FROM t
    """,
    doc="Heuristic quality scoring: length + uniqueness + token-shape components (LLM-pipeline op).",
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_score(_docs(spark, sf_dir))


@register(
    "text_gopher_quality_flags",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks,
             TRIM(text) AS c
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             LEN(toks) AS n,
             LIST_SUM(LIST_TRANSFORM(toks, t -> LENGTH(t))) AS sum_len,
             LENGTH(c) - LENGTH(REPLACE(c, '#', '')) AS n_hash,
             (LENGTH(c) - LENGTH(REPLACE(c, '...', ''))) / 3 AS n_ell,
             LEN(LIST_FILTER(toks, t -> REGEXP_MATCHES(t, '[a-z]')))
               AS alpha_words,
             LEN(LIST_INTERSECT(LIST_DISTINCT(toks),
                 ['the','be','to','of','and','that','have','with']))
               AS stops
      FROM t
    )
    SELECT doc_id,
           CAST(n AS INTEGER) AS n_words,
           ROUND(CAST(sum_len AS DOUBLE) / n, 6) AS mean_word_len,
           ROUND(CAST(n_hash + n_ell AS DOUBLE) / n, 6) AS symbol_ratio,
           ROUND(CAST(alpha_words AS DOUBLE) / n, 6) AS alpha_word_frac,
           CAST(stops AS INTEGER) AS n_required_stopwords,
           ((n >= 50) AND (n <= 100000)
            AND (CAST(sum_len AS DOUBLE) / n >= 3.0)
            AND (CAST(sum_len AS DOUBLE) / n <= 10.0)
            AND (CAST(n_hash + n_ell AS DOUBLE) / n <= 0.1)
            AND (CAST(alpha_words AS DOUBLE) / n >= 0.8)
            AND (stops >= 2)) AS passes_gopher
    FROM m
    """,
    doc="The PUBLISHED Gopher quality-filter rules (Rae et al. 2021 "
    "A1.1; the MassiveText/Dolma keep/drop bit): word-count bounds, "
    "mean-word-length bounds, symbol-to-word ratio, alphabetic-word "
    "fraction, required-stopword presence — each an integer count + "
    "one exact division in whole-stage codegen (list aggregates, no "
    "UDF), plus the AND of all rules. Line-based rules omitted "
    "(single-line corpus) — documented seam in operators/text.py.",
    tags=("text",),
)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.gopher_quality_flags(_docs(spark, sf_dir))


@register(
    "text_gopher_repetition_flags",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks,
             GREATEST(LENGTH(TRIM(text)), 1) AS total
      FROM documents),
    gi AS (SELECT t.doc_id, t.total, r.n, t.toks,
                  UNNEST(RANGE(1, LEN(t.toks) - r.n + 2)) AS i
           FROM t, RANGE(2, 11) r(n)),
    g AS (SELECT doc_id, total, n,
                 ARRAY_TO_STRING(toks[i : i + n - 1], ' ') AS gram
          FROM gi),
    c AS (SELECT doc_id, total, n, gram, COUNT(*) AS cnt, LENGTH(gram) AS l
          FROM g GROUP BY doc_id, total, n, gram),
    p AS (SELECT doc_id, total, n,
                 MAX(STRUCT_PACK(c := cnt, l := CAST(l AS BIGINT), g := gram)) AS win,
                 SUM(CASE WHEN cnt > 1 THEN cnt * l ELSE 0 END) AS dup
          FROM c GROUP BY doc_id, total, n),
    f AS (SELECT doc_id,
                 MAX(CASE WHEN n = 2 THEN win.c * win.l END) AS t2,
                 MAX(CASE WHEN n = 3 THEN win.c * win.l END) AS t3,
                 MAX(CASE WHEN n = 4 THEN win.c * win.l END) AS t4,
                 MAX(CASE WHEN n = 5 THEN dup END) AS d5,
                 MAX(CASE WHEN n = 6 THEN dup END) AS d6,
                 MAX(CASE WHEN n = 7 THEN dup END) AS d7,
                 MAX(CASE WHEN n = 8 THEN dup END) AS d8,
                 MAX(CASE WHEN n = 9 THEN dup END) AS d9,
                 MAX(CASE WHEN n = 10 THEN dup END) AS d10
          FROM p GROUP BY doc_id)
    SELECT t.doc_id,
           ROUND(COALESCE(f.t2, 0) / t.total, 6) AS rep_top2_frac,
           ROUND(COALESCE(f.t3, 0) / t.total, 6) AS rep_top3_frac,
           ROUND(COALESCE(f.t4, 0) / t.total, 6) AS rep_top4_frac,
           ROUND(COALESCE(f.d5, 0) / t.total, 6) AS rep_dup5_frac,
           ROUND(COALESCE(f.d6, 0) / t.total, 6) AS rep_dup6_frac,
           ROUND(COALESCE(f.d7, 0) / t.total, 6) AS rep_dup7_frac,
           ROUND(COALESCE(f.d8, 0) / t.total, 6) AS rep_dup8_frac,
           ROUND(COALESCE(f.d9, 0) / t.total, 6) AS rep_dup9_frac,
           ROUND(COALESCE(f.d10, 0) / t.total, 6) AS rep_dup10_frac,
           ((COALESCE(f.t2, 0) / t.total <= 0.20) AND (COALESCE(f.t3, 0) / t.total <= 0.18)
            AND (COALESCE(f.t4, 0) / t.total <= 0.16) AND (COALESCE(f.d5, 0) / t.total <= 0.15)
            AND (COALESCE(f.d6, 0) / t.total <= 0.14) AND (COALESCE(f.d7, 0) / t.total <= 0.13)
            AND (COALESCE(f.d8, 0) / t.total <= 0.12) AND (COALESCE(f.d9, 0) / t.total <= 0.11)
            AND (COALESCE(f.d10, 0) / t.total <= 0.10)) AS passes_repetition
    FROM t LEFT JOIN f USING (doc_id)
    ORDER BY t.doc_id
    """,
    doc="The PUBLISHED Gopher repetition-filter rules (Rae et al. 2021 "
    "A1.2, the other half of the MassiveText filter): fraction of "
    "characters in the most common {2,3,4}-gram and in duplicated "
    "{5..10}-grams, with the paper's drop thresholds and the AND "
    "keep/drop bit. Spark side is a map-only single-fold run-length "
    "pass over each document's sorted n-gram array (zero shuffles — "
    "the explode+groupBy formulation shuffles ~9x the corpus token "
    "count for a doc-local key); the oracle materializes the explode. "
    "Duplicate-line/paragraph rules live in text.gopher_line_flags "
    "(pytest-gated; this corpus is single-line).",
    tags=("text", "quality"),
)
def text_gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.gopher_repetition_flags(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "text_unigram_entropy",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS tok
      FROM documents),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
    d AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS k,
                 SUM(c * CAST(ROUND(1000000000.0 * LN(c)) AS BIGINT)) AS u
          FROM c GROUP BY doc_id)
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           CAST(k AS INT) AS n_unique_tokens,
           ROUND(LN(n) - (CAST(u AS DOUBLE) / 1000000000.0) / n, 6)
             AS unigram_entropy,
           ROUND(CASE WHEN k > 1
                      THEN (LN(n) - (CAST(u AS DOUBLE) / 1000000000.0) / n)
                           / LN(k)
                      ELSE 0.0 END, 6) AS norm_entropy
    FROM d ORDER BY doc_id
    """,
    doc="Per-document unigram Shannon entropy in nats + normalized "
    "entropy (RedPajama-v2-class information-density signal; low = "
    "boilerplate/keyword stuffing). H = ln N - (1/N) sum c ln c with "
    "every ln on an INTEGER count rounded to the 1e-9 lattice (the KL "
    "entry's discipline) so the per-doc sum is exact BIGINT. Spark "
    "side is a map-only run-length fold over the sorted token array — "
    "zero shuffles; the oracle uses the explode+groupBy form.",
    tags=("text", "quality"),
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.unigram_entropy(_docs(spark, sf_dir)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Language ID heuristic.
# ---------------------------------------------------------------------------
def _langid_oracle() -> str:
    score_cols = []
    for lang in sorted(T.LANG_MARKERS):
        markers = ", ".join(f"'{w}'" for w in T.LANG_MARKERS[lang])
        score_cols.append(
            f"ROUND(CAST(LEN(LIST_FILTER(toks, t -> t IN ({markers}))) AS DOUBLE)"
            f" / LEN(toks), 6) AS score_{lang}"
        )
    langs = sorted(T.LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return rf"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks FROM documents
    ), s AS (
      SELECT doc_id, {", ".join(score_cols)} FROM t
    )
    SELECT doc_id, {", ".join(f"score_{lang}" for lang in langs)}, {pred} AS pred_lang
    FROM s
    """


@register(
    "text_langid",
    oracle=_langid_oracle(),
    doc="Stopword-ratio language-ID heuristic, argmax with deterministic ties (LLM-pipeline op).",
    tags=("text",),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.langid(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Fingerprinting.
# ---------------------------------------------------------------------------
@register(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id, MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
    doc="Content fingerprint: md5 over normalized text (deterministic-ID pattern, SURVEY §2.8 F9).",
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(_docs(spark, sf_dir))


@register(
    "corpus_zipf_fit",
    oracle=T.zipf_fit_oracle_sql(top_n=200),
    doc="Zipf's-law fit over corpus token frequencies: closed-form OLS of "
    "ln(freq) on ln(rank) for the top-200 tokens (slope/intercept/r2) — "
    "generated or templated corpora bend away from the natural-language "
    "slope of ~-1, so this is a corpus-level quality/contamination signal. "
    "Exact integer ranks + ln over integer operands keep both engines on "
    "identical operands; one token-count shuffle, one top-n, one 1-row agg.",
    tags=("text", "corpus", "quality"),
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.zipf_fit(_docs(spark, sf_dir), top_n=200)


@register(
    "corpus_temperature_mixture",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n) AS nn FROM s),
    arr AS (
      SELECT list(SQRT(CAST(n AS DOUBLE)
                       / (SELECT CAST(nn AS DOUBLE) FROM tot))
                  ORDER BY source) AS xs
      FROM s
    ),
    den AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), xs),
                         (acc, v) -> acc + v) AS d
      FROM arr
    )
    SELECT s.source,
           CAST(s.n AS BIGINT) AS n_docs,
           ROUND(CAST(s.n AS DOUBLE) / tot.nn, 6) AS p,
           ROUND(SQRT(CAST(s.n AS DOUBLE) / tot.nn) / den.d, 6) AS weight,
           ROUND((SQRT(CAST(s.n AS DOUBLE) / tot.nn) / den.d)
                 / (CAST(s.n AS DOUBLE) / tot.nn), 6) AS upsample_factor
    FROM s CROSS JOIN tot CROSS JOIN den
    ORDER BY s.source
    """,
    doc="Temperature-based mixture reweighting (alpha = 0.5, the "
    "multilingual-LLM sampling rule: w_s proportional to p_s^alpha) "
    "per source: sampling weight and the implied upsample factor "
    "w_s/p_s. The normalizing sum of sqrt terms folds in FIXED "
    "source order (list fold seeded with 0) because a plain SUM of "
    "doubles is partial-aggregation-order-dependent — the harmonic-"
    "centrality discipline applied to a mixture formula. SQRT (not "
    "POWER(x, 0.5)) keeps both engines on the same libm entry "
    "point.",
    tags=("corpus",),
)
def corpus_temperature_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _docs(spark, sf_dir)
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = s.agg(F.sum("n").alias("nn"))
    packed = s.crossJoin(F.broadcast(tot)).select(
        "source", "n", "nn", (F.col("n").cast("double") / F.col("nn")).alias("p")
    )
    arr = packed.agg(
        F.array_sort(
            F.collect_list(F.struct("source", F.col("n").cast("double").alias("x")))
        ).alias("sx"),
        F.first("nn").alias("nn"),
    ).select(
        F.aggregate(
            F.transform(F.col("sx"), lambda r: r["x"]),
            F.lit(0.0),
            lambda acc, v: acc + F.sqrt(v / F.col("nn").cast("double")),
        ).alias("d")
    )
    return (
        packed.crossJoin(F.broadcast(arr))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round("p", 6).alias("p"),
            F.round(F.sqrt("p") / F.col("d"), 6).alias("weight"),
            F.round((F.sqrt("p") / F.col("d")) / F.col("p"), 6).alias(
                "upsample_factor"
            ),
        )
        .orderBy("source")
    )


@register(
    "corpus_source_kl_divergence",
    oracle=r"""
    WITH tok AS MATERIALIZED (
      SELECT source, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS t
      FROM documents
    ),
    st AS MATERIALIZED (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    gt AS MATERIALIZED (SELECT t, SUM(c) AS c FROM st GROUP BY 1),
    ns AS (SELECT source, SUM(c) AS n FROM st GROUP BY 1),
    tot AS (SELECT SUM(c) AS n FROM gt),
    contrib AS (
      SELECT st.source,
             SUM(st.c * (CAST(ROUND(1000000000.0 * LN(st.c)) AS BIGINT)
                         - CAST(ROUND(1000000000.0 * LN(ns.n)) AS BIGINT)
                         - CAST(ROUND(1000000000.0 * LN(gt.c)) AS BIGINT)
                         + CAST(ROUND(1000000000.0 * LN(tot.n)) AS BIGINT)))
               AS s
      FROM st
      JOIN gt ON gt.t = st.t
      JOIN ns ON ns.source = st.source
      CROSS JOIN tot
      GROUP BY st.source
    )
    SELECT c.source,
           CAST(ns.n AS BIGINT) AS n_tokens,
           ROUND(CAST(c.s AS DOUBLE) / (1000000000.0 * ns.n), 6)
             AS kl_to_corpus
    FROM contrib c JOIN ns ON ns.source = c.source
    ORDER BY c.source
    """,
    doc="Per-source KL divergence of the unigram distribution against "
    "the whole corpus — the domain-shift / mixture-drift monitor a "
    "training-data pipeline runs per ingest batch. KL = sum p ln(p/q) "
    "decomposes into integer-scaled log terms: every ln runs on an "
    "INTEGER count and is rounded to a 1e-9 lattice (the Adamic-Adar "
    "discipline), so the big per-term sum is exact BIGINT arithmetic "
    "and hash-stable; one float division at the very end. Two "
    "token-count shuffles + one broadcastable totals join.",
    tags=("text", "corpus", "quality"),
    bench=True,
)
def corpus_source_kl_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # r13 resident twin (resident_text discipline): exact integer
    # lattice arithmetic with the shared ln guard; the tiny result
    # frame still goes through the same Spark orderBy (null-source
    # ordering semantics stay Spark's).  Gate miss -> unchanged plan.
    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(docs, "text", "doc_id", extra_cols=("source",))
    if got is not None and isinstance(
        docs.schema["source"].dataType, T2.StringType
    ):
        pdf = RT.source_kl_resident(got[1], got[3]["source"])
        if pdf is not None:
            schema = T2.StructType(
                [
                    T2.StructField("source", T2.StringType(), True),
                    T2.StructField("n_tokens", T2.LongType(), True),
                    T2.StructField("kl_to_corpus", T2.DoubleType(), True),
                ]
            )
            return spark.createDataFrame(pdf, schema=schema).orderBy(
                "source"
            )
    tok = docs.select(
        "source", F.explode(T.tokens("text")).alias("t")
    )
    from robosystems_spark.checkpointing import materialize

    st = (
        tok.groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(materialize)  # feeds gt, ns, contrib (3 consumers)
    )
    gt = st.groupBy("t").agg(F.sum("c").alias("gc"))
    ns = st.groupBy("source").agg(F.sum("c").alias("n"))
    tot = gt.agg(F.sum("gc").alias("tn"))

    def sl(col):
        return F.round(F.lit(1000000000.0) * F.log(col)).cast("long")

    contrib = (
        st.join(gt, "t")
        .join(ns, "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum(
                F.col("c")
                * (sl(F.col("c")) - sl(F.col("n")) - sl(F.col("gc"))
                   + sl(F.col("tn")))
            ).alias("s"),
            F.first("n").alias("n_tokens"),
        )
    )
    return contrib.select(
        "source",
        "n_tokens",
        F.round(
            F.col("s").cast("double")
            / (F.lit(1000000000.0) * F.col("n_tokens")),
            6,
        ).alias("kl_to_corpus"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup with prefix blocking — SQL-expressible, so it
# gets a real oracle; blocking keeps both sides O(candidates).
# ---------------------------------------------------------------------------
# Per-block candidate cap: a block bigger than this is split into
# ceil(size/CAP) sub-blocks keyed by doc_id % n_sub, bounding the
# in-block self-join at CAP*(CAP-1)/2 pairs per sub-block.  Sub-split
# is engine-stable arithmetic (doc_id modulo), so the DuckDB oracle
# computes the identical candidate set.  Recall tradeoff: near-dup
# pairs landing in different sub-blocks of an oversized block are
# missed — the standard blocking compromise; boilerplate-heavy corpora
# otherwise make one SUBSTRING(text,1,32) block quadratic.
_JACCARD_BLOCK_CAP = 64


@register(
    "ngram_jaccard_blocked_pairs",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS toks,
             SUBSTRING(text, 1, 32) AS blk
      FROM documents
    ),
    s AS (
      SELECT blk, CAST(CEIL(COUNT(*) / {_JACCARD_BLOCK_CAP}.0) AS BIGINT) AS n_sub
      FROM t GROUP BY blk
    ),
    t2 AS (
      SELECT t.doc_id, t.toks, t.blk, t.doc_id % s.n_sub AS sub
      FROM t JOIN s USING (blk)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
                 / LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))), 6) AS jaccard
    FROM t2 a JOIN t2 b
      ON a.blk = b.blk AND a.sub = b.sub AND a.doc_id < b.doc_id
    WHERE CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
          / LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))) >= 0.5
    """,
    doc="Token-set Jaccard near-dup over prefix-blocked candidate pairs with a per-block "
    "size cap (oversized blocks sub-split by doc_id modulo, engine-stable) (LLM-pipeline op).",
    tags=("dedup",),
)
def ngram_jaccard_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return jaccard_blocked_pairs(docs, threshold=0.5, cap=_JACCARD_BLOCK_CAP)


@register(
    "dedup_weighted_jaccard_pairs",
    oracle=D.weighted_jaccard_oracle_sql(threshold_num=2, threshold_den=5),
    doc="IDF-weighted Jaccard near-dup pairs (weighted set similarity): "
    "tokens weighted ln(N/df) integer-scaled so boilerplate contributes "
    "~nothing; same 32-char-prefix + modulo-sub-split block discipline as "
    "the unweighted path; the threshold is an exact integer "
    "cross-multiplication (den*S_shared >= num*S_union), so both engines "
    "agree on every boundary pair — no float comparisons anywhere.",
    tags=("dedup", "text"),
    bench=True,
)
def dedup_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.weighted_jaccard_pairs(
        _docs(spark, sf_dir), threshold_num=2, threshold_den=5
    )


@register(
    "dedup_cross_source_matrix",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS toks,
             SUBSTRING(text, 1, 32) AS blk
      FROM documents
    ),
    s AS (
      SELECT blk, CAST(CEIL(COUNT(*) / {_JACCARD_BLOCK_CAP}.0) AS BIGINT) AS n_sub
      FROM t GROUP BY blk
    ),
    t2 AS (
      SELECT t.doc_id, t.toks, t.blk, t.doc_id % s.n_sub AS sub
      FROM t JOIN s USING (blk)
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM t2 a JOIN t2 b
        ON a.blk = b.blk AND a.sub = b.sub AND a.doc_id < b.doc_id
      WHERE CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
            / LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))) >= 0.5
    )
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           COUNT(*) AS n_dup_pairs
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY LEAST(da.source, db.source), GREATEST(da.source, db.source)
    """,
    doc="Cross-source duplicate matrix: the corpus-governance report — for "
    "each unordered source pair, how many near-dup pairs cross it (within-"
    "source dups on the diagonal). Composes the capped-block Jaccard pairs "
    "with two dimension joins and an unordered-pair normalization "
    "(LEAST/GREATEST); the rollup is one tiny shuffle over the pair set.",
    tags=("dedup", "corpus"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pairs = jaccard_blocked_pairs(docs, threshold=0.5, cap=_JACCARD_BLOCK_CAP)
    src = docs.select("doc_id", "source")
    return (
        pairs.join(src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("source", "_sa"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("source", "_sb"), "doc_b")
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


def jaccard_blocked_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    cap: int = _JACCARD_BLOCK_CAP,
    resident_max: int | None = None,
) -> DataFrame:
    """Prefix-blocked token-Jaccard near-dup with bounded block size.

    Oversized blocks (boilerplate-heavy corpora collapse onto one
    32-char prefix) are sub-split into ``ceil(size/cap)`` sub-blocks
    before the self-join, so per-block verify work is O(cap²) instead
    of quadratic in the block.  The block-size aggregation is one
    groupBy (AQE skew-join handles the join-back); the sub-key is
    ``doc_id % n_sub`` — deterministic, engine-stable, uniform for
    dense ids.

    r13 resident tier: under the measured corpus gates the block +
    verify pipeline runs as one bounded Arrow collect + numpy twin
    (``resident_text.blocked_pairs_resident``), schema from this lazy
    distributed plan; the distributed plan is unchanged above them.
    """
    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(docs, "text", "doc_id", max_docs=resident_max)
    if got is not None:
        pdf = RT.blocked_pairs_resident(got[0], got[1], threshold, cap)
        if pdf is not None:
            return docs.sparkSession.createDataFrame(
                pdf, schema=RT.pairs_schema(docs, "doc_id", ids_nullable=True)
            )
    t = docs.select(  # distributed plan — byte-identical to r12
        "doc_id",
        F.array_distinct(T.tokens("text")).alias("toks"),
        F.substring("text", 1, 32).alias("blk"),
    )
    sizes = t.groupBy("blk").agg(
        F.ceil(F.count(F.lit(1)) / float(cap)).alias("n_sub")
    )
    t2 = t.join(sizes, "blk").withColumn("sub", F.pmod("doc_id", F.col("n_sub"))).drop("n_sub")
    a, b = t2.alias("a"), t2.alias("b")
    jac = F.size(F.array_intersect("a.toks", "b.toks")).cast("double") / F.size(
        F.array_union("a.toks", "b.toks")
    )
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# Shared CTE prefix: capped-block Jaccard pairs -> recursive min-label
# components — consumed by the clusters oracle AND the representative-
# selection oracle below.
_DUP_CLUSTERS_CTES = rf"""
    WITH RECURSIVE t AS (
      SELECT doc_id,
             LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS toks,
             SUBSTRING(text, 1, 32) AS blk
      FROM documents
    ),
    s AS (
      SELECT blk, CAST(CEIL(COUNT(*) / {_JACCARD_BLOCK_CAP}.0) AS BIGINT) AS n_sub
      FROM t GROUP BY blk
    ),
    t2 AS (
      SELECT t.doc_id, t.toks, t.blk, t.doc_id % s.n_sub AS sub
      FROM t JOIN s USING (blk)
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM t2 a JOIN t2 b
        ON a.blk = b.blk AND a.sub = b.sub AND a.doc_id < b.doc_id
      WHERE CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
            / LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach AS (
      SELECT DISTINCT a AS node, a AS lbl FROM edges
      UNION
      SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)"""

_DUP_CLUSTERS_ORACLE = (
    _DUP_CLUSTERS_CTES
    + """,
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id)
    SELECT c.node AS doc_id, c.cluster_id, s.cluster_size,
           c.node = c.cluster_id AS keep
    FROM comp c JOIN sizes s USING (cluster_id)
    """
)


def _blocked_pairs_pre(docs: DataFrame, threshold: float = 0.5, cap: int = _JACCARD_BLOCK_CAP):
    """The resident blocked pair set as a ``(ids, si, di)`` triple for
    the fused ``duplicate_clusters`` hook (the
    ``_copurchase_pairs_np`` pattern) — or None when any corpus gate
    fails, in which case callers run the unchanged distributed plan.
    Skips the Spark pair build + CC setup checkpoint + re-collect
    round trip when the clusters consumer would have gone resident
    anyway."""
    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(docs, "text", "doc_id")
    if got is None:
        return None
    pdf = RT.blocked_pairs_resident(got[0], got[1], threshold, cap)
    if pdf is None:
        return None
    import numpy as np
    import pandas as pd

    src = pdf["doc_a"].to_numpy()
    dst = pdf["doc_b"].to_numpy()
    ids = np.sort(pd.unique(np.concatenate([src, dst])))
    return ids, np.searchsorted(ids, src), np.searchsorted(ids, dst)


@register(
    "dedup_duplicate_clusters",
    oracle=_DUP_CLUSTERS_ORACLE,
    doc="Near-dup pairs -> duplicate clusters via distributed min-label connected "
    "components (keep = cluster representative); oracle is a recursive CTE over "
    "the identical capped-block Jaccard pairs (LLM-pipeline op).",
    tags=("dedup", "graph"),
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import duplicate_clusters

    docs = _docs(spark, sf_dir)
    pre = _blocked_pairs_pre(docs, threshold=0.5)
    # pre built -> the pair frame is schema-only (resident_max=0 keeps
    # it the lazy distributed construction, never executed); pre None
    # -> same call IS the unchanged distributed plan (the corpus gate
    # already failed once — don't pay it twice)
    pairs = jaccard_blocked_pairs(
        docs, threshold=0.5, resident_max=0
    ).select("doc_a", "doc_b")
    return duplicate_clusters(pairs, precollected=pre)


# ---------------------------------------------------------------------------
# MinHash + LSH and SimHash — hash-permutation specific, rows-only checks.
# ---------------------------------------------------------------------------
@register(
    "dedup_minhash_lsh",
    oracle=D.minhash_oracle_sql(threshold=0.7),
    doc="MinHash(64 perms)+LSH(16 bands) near-dup: shingle→signature→band→bucket-join→Jaccard verify. "
    "md5-based shingle hash + Carter-Wegman permutations mod 2^31-1 are "
    "engine-portable, so the full approximate pipeline is DuckDB-hash-checked "
    "(plus the brute-force recall gate in tests/test_dedup.py).",
    tags=("dedup", "lsh"),
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_near_duplicates(_docs(spark, sf_dir), threshold=0.7)


@register(
    "dedup_minhash_estimate_error",
    oracle=D.minhash_estimate_oracle_sql(),
    doc="Sketch-quality evaluation: per LSH candidate pair, the "
    "signature-ESTIMATED Jaccard (matching positions / 64) beside "
    "the EXACT shingle Jaccard, plus a within-0.2 accuracy flag — "
    "the recall@k sibling for set similarity (is the sketch good "
    "enough to trust?). The flag cross-multiplies integers "
    "(tau_den*|est*u - 64*i| <= tau_num*64*u), so no float division "
    "feeds a comparison; candidates come from banding, never "
    "all-pairs.",
    tags=("dedup", "lsh"),
)
def dedup_minhash_estimate_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return D.minhash_estimate_error(_docs(spark, sf_dir))


@register(
    "dedup_simhash",
    oracle=D.simhash_oracle_sql(max_hamming=3),
    doc="60-bit md5-derived SimHash near-dup with 15-bit chunk banding + hamming "
    "verify; banding is exact for hamming<=3, so the DuckDB oracle is the "
    "brute-force pair join over the same portable simhash.",
    tags=("dedup", "lsh"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=3)


@register(
    "dedup_embedding_neardup",
    oracle=D.embedding_neardup_oracle_sql(
        dim=64, threshold=0.4, num_bands=8, planes_per_band=3
    ),
    doc="Embedding near-dup: banded random-hyperplane LSH (OR-of-ANDs, capped "
    "buckets) + exact cosine verify. DuckDB oracle regenerates the same "
    "hyperplanes as literals and applies the same band-collision rule, so the "
    "approximate operator is hash-checked, not rows-only. "
    "Threshold 0.4 because the synthetic embeddings top out at ~0.48 pairwise cosine.",
    tags=("dedup", "embedding"),
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_near_duplicates(
        _emb(spark, sf_dir), threshold=0.4, num_bands=8, planes_per_band=3
    )


# ---------------------------------------------------------------------------
# Similarity search.
# ---------------------------------------------------------------------------
@register(
    "embedding_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT 0 AS query_id, e.vec_id AS nn_id,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS cosine
      FROM embeddings e, q
    )
    SELECT query_id, nn_id, cosine,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, nn_id) AS INT) AS rank
    FROM sims
    ORDER BY cosine DESC, nn_id
    LIMIT 10
    """,
    doc="Brute-force cosine top-k ANN baseline: broadcast query, JVM-side zip_with dot product.",
    tags=("similarity",),
    bench=True,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    return S.cosine_topk(emb, queries, k=10)


@register(
    "embedding_hard_negatives",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    sims AS (
      SELECT q.query_id, e.vec_id AS nn_id,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    ),
    band AS (
      SELECT query_id, nn_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, nn_id) AS INT) AS rank
      FROM sims WHERE cosine >= 0.20 AND cosine < 0.32
    )
    SELECT query_id, nn_id, cosine, rank FROM band WHERE rank <= 5
    """,
    doc="Hard-negative mining for retrieval/contrastive training: per-query "
    "top-5 neighbors with cosine in [0.20, 0.32) — informative negatives "
    "below the near-duplicate zone. Band filter runs before the per-query "
    "rank, so window state is in-band pairs only; same broadcast-query + "
    "fused-Arrow shape as the exact top-k baseline.",
    tags=("similarity", "training"),
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return S.cosine_band_topk(emb, queries, k=5, lo=0.20, hi=0.32)


# IVF centroids: the PORTABLE cosine Lloyd (clustering.kmeans_fit),
# trained INSIDE every invocation.  r12 removed the per-sf_dir module
# memo this helper used to keep: a cross-invocation cache keyed on the
# data directory let timed bench runs serve training from state built
# in the warm run — precomputation, not optimization.  Every
# invocation now computes the full pipeline from the parquet inputs;
# the deterministic training is what lets the whole approximate
# pipeline carry a DuckDB oracle (recall@k gated in tests/test_dedup.py).
def _ivf_centroids(spark: SparkSession, sf_dir: str, num_centroids: int = 8):
    return CL.kmeans_fit(
        _emb(spark, sf_dir), k=num_centroids, iters=2, metric="cosine"
    )


@register(
    "embedding_ivf_topk",
    oracle=S.ivf_oracle_sql(
        num_centroids=8, iters=2, dim=64, nprobe=3, k=10, n_queries=3
    ),
    doc="IVF-bucketed approximate top-k over precomputed portable centroids: "
    "nprobe bucket pruning, no training in the query path. Train + assign + "
    "probe + in-bucket exact cosine are all hash-checked against the DuckDB "
    "oracle (the approximation itself is verified, not just row counts).",
    tags=("similarity",),
    bench=True,
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return S.ivf_topk(
        emb, queries, k=10, nprobe=3, centroids=_ivf_centroids(spark, sf_dir, 8)
    )


@register(
    "embedding_ivf_recall_at_k",
    oracle=f"""
    WITH allsims AS (
      SELECT q.vec_id AS query_id, e.vec_id AS nn_id,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6)
               AS cosine
      FROM embeddings e
      JOIN embeddings q ON q.vec_id < 3
    ),
    ex AS (
      SELECT query_id, nn_id FROM (
        SELECT query_id, nn_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, nn_id) AS rank
        FROM allsims
      ) WHERE rank <= 10
    ),
    ivf AS (
      SELECT query_id, nn_id FROM (
        {__import__("robosystems_spark.operators.similarity", fromlist=["ivf_oracle_sql"]).ivf_oracle_sql(num_centroids=8, iters=2, dim=64, nprobe=3, k=10, n_queries=3)}
      ) t
    )
    SELECT ex.query_id,
           COUNT(iv.nn_id) AS n_hit,
           ROUND(CAST(COUNT(iv.nn_id) AS DOUBLE) / 10, 6) AS recall_at_10
    FROM ex LEFT JOIN ivf iv
      ON iv.query_id = ex.query_id AND iv.nn_id = ex.nn_id
    GROUP BY ex.query_id
    ORDER BY ex.query_id
    """,
    doc="ANN quality evaluation: recall@10 of the IVF probe (8 "
    "centroids, nprobe=3) against exact brute-force cosine, per "
    "query — the metric every production ANN deployment monitors "
    "before trading exactness for speed. Exact side ranks on "
    "ROUND(cosine, 6) with an id tie-break IN BOTH ENGINES so the "
    "rank-10 boundary is engine-stable; overlap is an integer "
    "semi-count. Composes the existing IVF oracle as a subquery — "
    "the approximation AND its measured quality are both "
    "hash-checked.",
    tags=("similarity",),
)
def embedding_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from robosystems_spark.functions import vector as V

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    c = emb.select(F.col("vec_id").alias("nn_id"), F.col("embedding").alias("_cv"))
    q = queries.select("query_id", F.col("embedding").alias("_qv"))
    sims = c.crossJoin(F.broadcast(q)).select(
        "query_id", "nn_id", F.round(V.cosine("_cv", "_qv"), 6).alias("_cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("nn_id"))
    exact = (
        sims.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 10)
        .select("query_id", "nn_id")
    )
    approx = S.ivf_topk(
        emb, queries, k=10, nprobe=3,
        centroids=_ivf_centroids(spark, sf_dir, 8),
    ).select("query_id", "nn_id")
    hits = exact.join(approx, ["query_id", "nn_id"], "left_semi")
    return (
        exact.select("query_id")
        .distinct()
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / 10.0, 6
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


def _nsw_graph_and_queries(spark: SparkSession, sf_dir: str):
    from robosystems_spark.operators.ann_graph import build_nsw_graph

    emb = _emb(spark, sf_dir)
    graph = build_nsw_graph(
        emb, _ivf_centroids(spark, sf_dir, 8), M=8, nb=3
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return emb, graph, queries


# r12 note: an earlier draft of this round cached a built
# ResidentAnnIndex per (applicationId, sf_dir) at module level, so the
# ANN entries' timed bench runs served from an index the warm run had
# built — cross-invocation precomputation, which this round's rules
# (and honesty) forbid.  The cache is gone: every topk invocation
# trains centroids, builds its graph(s), and searches, all from the
# parquet inputs.  ResidentAnnIndex stays available as the
# build-once/search-many SERVING handle for library callers
# (tests/test_ann_graph.py), where amortizing the build across many
# searches is the point and nothing is being timed against a contract.


@register(
    "embedding_nsw_topk",
    oracle=__import__(
        "robosystems_spark.operators.ann_graph", fromlist=["nsw_oracle_sql"]
    ).nsw_oracle_sql(
        num_centroids=8, iters=2, dim=64, M=8, nb=3, k=10, ef=20, hops=4,
        entry_stride=8, n_queries=3,
    ),
    doc="Graph-ANN (NSW/DiskANN family): blocked k-NN graph over the "
    "shared portable centroids (top-8 neighbors among vectors sharing "
    "one of each side's 3 probe buckets — never all-pairs), then "
    "4-hop beam search (ef=20) from the deterministic stride-8 entry "
    "set. Every "
    "selection ranks on ROUND(cosine,6) with an id tie-break, so the "
    "search PATH is engine-stable and the DuckDB oracle (Lloyd CTEs + "
    "graph build + hop-unrolled beam) hash-checks the approximation "
    "itself, exactly like the IVF entry.",
    tags=("similarity",),
    bench=True,
)
def embedding_nsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.ann_graph import nsw_topk

    emb, graph, queries = _nsw_graph_and_queries(spark, sf_dir)
    return nsw_topk(
        emb, graph, queries, k=10, ef=20, hops=4, entry_stride=8
    )


@register(
    "embedding_hnsw_topk",
    oracle=__import__(
        "robosystems_spark.operators.ann_graph", fromlist=["hnsw_oracle_sql"]
    ).hnsw_oracle_sql(
        num_centroids=8, iters=2, dim=64, M=8, nb=3, k=10, ef=20, hops=4,
        level_mods=(8, 64), descent_beam=4, descent_hops=1, n_queries=3,
    ),
    doc="HNSW (Malkov & Yashunin 2016): md5-seeded geometric level "
    "draws (nested ~n/8 and ~n/64 layers, deterministic in any "
    "engine) with one blocked k-NN graph per layer; search enters at "
    "every top-layer member, descends with a narrow beam (width 4, "
    "one expansion per upper layer), then runs the standard ef=20 "
    "4-hop beam on the base layer.  The DuckDB oracle unrolls the "
    "Lloyd training, all three layer builds, the descent, and the "
    "base search — the hierarchy's exact output is hash-checked.",
    tags=("similarity",),
)
def embedding_hnsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.ann_graph import (
        build_hnsw_graphs,
        hnsw_topk,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    graphs = build_hnsw_graphs(
        emb, _ivf_centroids(spark, sf_dir, 8), M=8, nb=3, level_mods=(8, 64)
    )
    return hnsw_topk(
        emb, graphs, queries, k=10, ef=20, hops=4, level_mods=(8, 64),
        descent_beam=4, descent_hops=1,
    )


@register(
    "embedding_nsw_recall_at_k",
    oracle=f"""
    WITH allsims AS (
      SELECT q.vec_id AS query_id, e.vec_id AS nn_id,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6)
               AS cosine
      FROM embeddings e
      JOIN embeddings q ON q.vec_id < 3
    ),
    ex AS (
      SELECT query_id, nn_id FROM (
        SELECT query_id, nn_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, nn_id) AS rank
        FROM allsims
      ) WHERE rank <= 10
    ),
    nsw AS (
      SELECT query_id, nn_id FROM (
        {__import__("robosystems_spark.operators.ann_graph", fromlist=["nsw_oracle_sql"]).nsw_oracle_sql(num_centroids=8, iters=2, dim=64, M=8, nb=3, k=10, ef=20, hops=4, entry_stride=8, n_queries=3)}
      ) t
    )
    SELECT ex.query_id,
           COUNT(nv.nn_id) AS n_hit,
           ROUND(CAST(COUNT(nv.nn_id) AS DOUBLE) / 10, 6) AS recall_at_10
    FROM ex LEFT JOIN nsw nv
      ON nv.query_id = ex.query_id AND nv.nn_id = ex.nn_id
    GROUP BY ex.query_id
    ORDER BY ex.query_id
    """,
    doc="Graph-ANN quality evaluation: recall@10 of the 3-hop beam "
    "search against exact brute-force cosine, per query — the IVF "
    "recall entry's twin for the graph index, composing the NSW "
    "oracle as a subquery so the approximation AND its measured "
    "quality are both hash-checked.",
    tags=("similarity",),
)
def embedding_nsw_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from robosystems_spark.functions import vector as V
    from robosystems_spark.operators.ann_graph import nsw_topk

    emb, graph, queries = _nsw_graph_and_queries(spark, sf_dir)
    c = emb.select(F.col("vec_id").alias("nn_id"), F.col("embedding").alias("_cv"))
    q = queries.select("query_id", F.col("embedding").alias("_qv"))
    sims = c.crossJoin(F.broadcast(q)).select(
        "query_id", "nn_id", F.round(V.cosine("_cv", "_qv"), 6).alias("_cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("nn_id"))
    exact = (
        sims.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 10)
        .select("query_id", "nn_id")
    )
    approx = nsw_topk(
        emb, graph, queries, k=10, ef=20, hops=4, entry_stride=8
    ).select("query_id", "nn_id")
    hits = exact.join(approx, ["query_id", "nn_id"], "left_semi")
    return (
        exact.select("query_id")
        .distinct()
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / 10.0, 6
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


@register(
    "embedding_mmr_diversified",
    oracle=S.mmr_oracle_sql(k=5, pool=20, lam=0.7, n_queries=3),
    doc="Maximal Marginal Relevance diversified retrieval (Carbonell "
    "& Goldstein 1998) — the RAG re-selection step: greedy k=5 from "
    "each query's exact top-20 maximizing lam*sim(q,d) - (1-lam)*"
    "max sim(d, selected). Every similarity rounds to 6 decimals "
    "BEFORE comparison and the argmax tie-breaks on id, so the "
    "DuckDB oracle's unrolled 5-step selection picks identical "
    "documents. Stage 2 is applyInPandas over one query's pool "
    "(pool^2 floats per group, never corpus-sized).",
    tags=("similarity",),
)
def embedding_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return S.mmr_topk(emb, queries, k=5, pool=20, lam=0.7)


@register(
    "embedding_norm_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(AVG(SQRT(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 6) AS avg_l2_norm
    FROM embeddings
    GROUP BY label
    """,
    doc="Per-label embedding norm statistics — vectorized array aggregation (LLM-pipeline op).",
    tags=("similarity", "agg"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    norm = F.expr(
        "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(norm), 6).alias("avg_l2_norm"),
    )


@register(
    "embedding_kmeans_clusters",
    oracle=CL.kmeans_oracle_sql(k=8, iters=2, dim=64),
    doc="Distributed k-means (2 Lloyd iterations, deterministic lowest-id init): "
    "assignment is one Arrow matmul per batch, centroid update a posexplode "
    "groupBy mean; per-step centroid rounding makes the iterative algorithm "
    "hash-identical to the DuckDB unrolled-CTE oracle.",
    tags=("similarity", "clustering"),
    bench=True,
)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CL.kmeans(_emb(spark, sf_dir), k=8, iters=2)


# PQ codebooks: trained inside every invocation (r12 removed the
# per-sf_dir module memo — same cross-invocation-precomputation class
# as the former centroid cache; see _ivf_centroids).
def _pq_codebooks(spark: SparkSession, sf_dir: str):
    return PQ.pq_train_codebooks(
        _emb(spark, sf_dir), m=4, k=16, iters=1, dim=64
    )


@register(
    "embedding_pq_topk",
    oracle=PQ.pq_oracle_sql(m=4, k=16, iters=1, dim=64, topk=10, n_queries=3),
    doc="Product-quantization ADC top-k: per-subspace L2 codebooks (portable "
    "Lloyd), one-Arrow-pass encode, per-query distance-table lookup sum with "
    "TakeOrderedAndProject ranking. The full approximate pipeline — training, "
    "encoding, search — is hash-checked against the DuckDB oracle.",
    tags=("similarity", "quantization"),
    bench=True,
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return PQ.pq_topk(emb, queries, _pq_codebooks(spark, sf_dir), topk=10)


@register(
    "embedding_random_projection",
    oracle=PR.random_projection_long_oracle_sql(out_dim=16, dim=64, seed=42),
    doc="Johnson-Lindenstrauss random projection 64→16 dims: one seeded "
    "Gaussian matmul per Arrow batch, map-only (no shuffle); the seeded "
    "matrix is bit-stable so the projection is hash-checked cross-engine. "
    "Registry shape is scalar rows (vec_id, dim_index, value) — array "
    "columns crash the driver canonicalizer; the array API stays in "
    "operators/projection.py for library users.",
    tags=("similarity", "projection"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PR.random_projection_long(
        _emb(spark, sf_dir), out_dim=16, dim=64, seed=42
    )


# ---------------------------------------------------------------------------
# TF-IDF: classic relevance scoring, fully relational (explode + two
# aggregations + window) — the text-featurization workhorse.
# ---------------------------------------------------------------------------
@register(
    "text_tfidf_top_term",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS dfq FROM toks GROUP BY 1),
    total AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term,
             ROUND(tf * LN(CAST((SELECT n FROM total) AS DOUBLE) / dfq), 6) AS tfidf
      FROM tf JOIN dfreq USING (term)
    )
    SELECT doc_id, term AS top_term, tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    doc="TF-IDF top term per document: explode -> tf/df aggregations -> windowed argmax "
    "(LLM-pipeline text featurization; deterministic tiebreak on term).",
    tags=("text",),
    bench=True,
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    # r13 resident twin: integer tf/df + guarded ln product, per-doc
    # argmax over (rounded tfidf desc, term asc).  Gate miss or a
    # score within 1e-7 of a rounding boundary -> unchanged plan.
    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(docs, "text", "doc_id")
    if got is not None:
        pdf = RT.tfidf_top_resident(got[0], got[1], got[2])
        if pdf is not None:
            schema = T2.StructType(
                [
                    T2.StructField("doc_id", T2.LongType(), True),
                    T2.StructField("top_term", T2.StringType(), False),
                    T2.StructField("tfidf", T2.DoubleType(), True),
                ]
            )
            return spark.createDataFrame(pdf, schema=schema)
    toks = docs.select("doc_id", F.explode(T.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("dfq"))
    # Corpus size as a 1-row aggregate cross-joined in (genuinely
    # broadcast-safe), not a driver-side .count() action.  dfreq is one row
    # per distinct TERM — a 100 TB vocabulary does not broadcast — so the
    # tf⋈dfreq join is a plain shuffle join on `term` and AQE may still
    # broadcast it when it is actually small.
    total = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("dfq")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "tfidf")
    )


# ---------------------------------------------------------------------------
# BM25 doc search — the OpenSearch-shaped ranked-retrieval capability
# (BASELINE.json: "OpenSearch connector for doc search"), closed-form
# relational so it oracles exactly.
# ---------------------------------------------------------------------------
_BM25_QUERY = ["spark", "vector", "window"]


def _bm25_oracle() -> str:
    from robosystems_spark.operators.search import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_QUERY, k=25)


@register(
    "doc_search_bm25_topk",
    oracle=_bm25_oracle(),
    doc="BM25 ranked retrieval (query -> top-25 docs): per-term posting-list tf/df aggs "
    "pruned to the query before any shuffle, corpus stats as 1-row cross-join, "
    "global top-k (OpenSearch-shaped doc search, BASELINE.json).",
    tags=("text", "search"),
    bench=True,
)
def doc_search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), _BM25_QUERY, k=25)


def _trigram_oracle() -> str:
    from robosystems_spark.operators.search import trigram_like_oracle_sql

    return trigram_like_oracle_sql("merge batch")


@register(
    "doc_trigram_like_search",
    oracle=_trigram_oracle(),
    doc="pg_trgm-shaped substring search: LIKE '%merge batch%' answered via a "
    "character-trigram posting index — candidates must cover ALL pattern "
    "trigrams (posting-list intersection, partition-prunable by trigram at "
    "scale), then contains() verifies only candidates. Exact equality with "
    "the full scan, so the index path itself is hash-checked.",
    tags=("text", "search", "index"),
    bench=True,
)
def doc_trigram_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.search import trigram_like_search

    return trigram_like_search(_docs(spark, sf_dir), "merge batch")


def _hybrid_oracle() -> str:
    from robosystems_spark.operators.search import hybrid_rrf_oracle_sql

    return hybrid_rrf_oracle_sql(_BM25_QUERY, query_vec_id=0, k=20)


@register(
    "hybrid_search_rrf",
    oracle=_hybrid_oracle(),
    doc="Hybrid lexical+vector retrieval via reciprocal-rank fusion: BM25 "
    "top-100 and cosine top-100 candidate lists fused with 1/(60+rank) "
    "(Cormack RRF) — two TakeOrderedAndProject plans, deterministic ranks, "
    "full DuckDB oracle.",
    tags=("text", "search", "embedding"),
    bench=True,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.search import hybrid_rrf_topk

    emb = _emb(spark, sf_dir)
    return hybrid_rrf_topk(
        _docs(spark, sf_dir),
        emb,
        _BM25_QUERY,
        emb.filter(F.col("vec_id") == 0).select("embedding"),
        k=20,
    )


@register(
    "doc_search_bm25_indexed",
    oracle=_bm25_oracle(),
    doc="BM25 over a PERSISTED inverted index (sources/doc_search.py "
    "SparkBM25Index): tokenize once at index time into term-sorted postings "
    "parquet, then each query is a pushed-down term-IN scan over its posting "
    "lists — identical scores to the query-time path, same DuckDB oracle.",
    tags=("text", "search"),
)
def doc_search_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from robosystems_spark.sources.doc_search import SparkBM25Index

    idx = SparkBM25Index(tempfile.mkdtemp(prefix="bm25idx_"))
    idx.index_documents(_docs(spark, sf_dir).select("doc_id", "text"))
    return idx.search(spark, _BM25_QUERY, k=25)


# ---------------------------------------------------------------------------
# Dataset sampling / splitting — reproducible by construction.
# ---------------------------------------------------------------------------
@register(
    "sample_documents_systematic",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE doc_id % 5 = 0
    """,
    doc="Deterministic systematic sample (every 5th key) — reproducible across engines/partitionings.",
    tags=("sampling",),
)
def sample_documents_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.sampling import systematic_sample

    return systematic_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"), "doc_id", every_n=5
    )


@register(
    "split_documents_train_val_test",
    oracle="""
    SELECT split, COUNT(*) AS n_docs FROM (
      SELECT CASE
        WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
        WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
        ELSE 'test' END AS split
      FROM documents
    ) GROUP BY split
    """,
    doc="md5-bucketed 80/10/10 train/val/test split sizes — engine-portable hex-threshold "
    "assignment, identical in any engine with md5 (determinism + disjointness also "
    "asserted in tests/test_sampling.py).",
    tags=("sampling",),
)
def split_documents_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.sampling import split_column_md5

    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn(
            "split", split_column_md5("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Corpus curation: the end-to-end cleaning decisions (operators/corpus.py).
# ---------------------------------------------------------------------------
@register(
    "corpus_filter_funnel",
    oracle=r"""
    WITH d AS (
      SELECT source, doc_id, lang,
             STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks,
             MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fp,
             CAST(LENGTH(REPLACE(TRIM(text), ' ', '')) AS DOUBLE) AS nospace
      FROM documents
    ),
    s AS (
      SELECT source, doc_id, fp,
             (lang = 'en') AS s_lang,
             LEN(toks) AS n_toks,
             ROUND(LEAST(LEN(toks) / 100.0, 1.0) * 0.4
                   + (CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks)) * 0.4
                   + LEAST((nospace / LEN(toks)) / 8.0, 1.0) * 0.2, 6) AS q
      FROM d
    ),
    st AS (
      SELECT source, doc_id, fp, s_lang,
             (s_lang AND n_toks BETWEEN 20 AND 1000) AS s_len,
             (s_lang AND n_toks BETWEEN 20 AND 1000 AND q >= 0.55) AS s_quality
      FROM s
    ),
    k AS (
      SELECT source, s_lang, s_len, s_quality,
             (s_quality AND ROW_NUMBER() OVER (
                PARTITION BY fp, s_quality ORDER BY doc_id) = 1) AS s_kept
      FROM st
    )
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (s_lang) AS n_lang,
           COUNT(*) FILTER (s_len) AS n_len,
           COUNT(*) FILTER (s_quality) AS n_quality,
           COUNT(*) FILTER (s_kept) AS n_kept
    FROM k GROUP BY source
    """,
    doc="Corpus-cleaning funnel per source: total -> declared-lang -> token-length "
    "-> quality score -> first-of-duplicate (LLM-pipeline curation report).",
    tags=("corpus",),
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import filter_funnel

    return filter_funnel(_docs(spark, sf_dir))


@register(
    "dedup_representative_docs",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fp,
             LENGTH(TRIM(text)) AS len
      FROM documents
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY fp ORDER BY len DESC, doc_id ASC) AS rn
      FROM d
    )
    SELECT fp AS fingerprint,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc_id,
           COUNT(*) AS n_docs
    FROM r GROUP BY fp
    """,
    doc="Canonical doc per exact-duplicate cluster: keep longest text, ties by "
    "smallest id (curation keeps the BEST copy, not the first).",
    tags=("dedup", "corpus"),
)
def dedup_representative_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import representative_docs

    return representative_docs(_docs(spark, sf_dir))


@register(
    "decontamination_ngram_overlap",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT DISTINCT t.doc_id, ARRAY_TO_STRING(t.toks[i:i+7], ' ') AS gram
      FROM t, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(t.toks) - 7, 1))) AS u(i)
    ),
    hold AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0)
    SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_shared_ngrams
    FROM g JOIN hold USING (gram)
    WHERE g.doc_id % 20 <> 0
    GROUP BY g.doc_id
    """,
    doc="Benchmark decontamination: train docs sharing an 8-token shingle with the "
    "held-out set (doc_id % 20 = 0); holdout n-gram set broadcast, train side "
    "never shuffled for the join.",
    tags=("corpus",),
    bench=True,
)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import decontaminate

    docs = _docs(spark, sf_dir)
    # r13 resident tier for the same-table split: ONE bounded collect
    # feeds both sides (the operator-level path would gate + collect
    # train and holdout separately); pure set arithmetic, exact.
    # Parity pinned in tests/test_resident_tiers.py; gate miss falls
    # through to the unchanged broadcast-join plan.
    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(docs, "text", "doc_id")
    if got is not None:
        import numpy as np

        from pyspark.sql import types as _T

        pdf = RT.decontaminate_resident(
            got[0], got[1], np.mod(got[0], 20) != 0, ngram=8
        )
        schema = _T.StructType(
            [
                _T.StructField("doc_id", _T.LongType(), True),
                _T.StructField("n_shared_ngrams", _T.LongType(), False),
            ]
        )
        return spark.createDataFrame(pdf, schema=schema)
    return decontaminate(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
    )


@register(
    "text_repetition_stats",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT t.doc_id, ARRAY_TO_STRING(t.toks[i:i+1], ' ') AS gram
      FROM t, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(t.toks) - 1, 1))) AS u(i)
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           MAX(c) AS top_bigram_count,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_bigram_frac
    FROM c GROUP BY doc_id
    """,
    doc="Within-document repetition (Gopher-style): fraction of bigram occurrences "
    "taken by the most frequent bigram.",
    tags=("text", "corpus"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


@register(
    "text_bigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, t[gs.i] AS w1, t[gs.i + 1] AS w2
      FROM toks, UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS gs(i)
      WHERE LEN(t) >= 2
    ),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT UNNEST(t) AS tok FROM toks)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(LN((cb.cb + 0.5) / (c1.c1 + 0.5 * (SELECT v FROM vocab)))), 4)
             AS avg_logprob
    FROM big JOIN cb USING (w1, w2) JOIN c1 USING (w1)
    GROUP BY doc_id
    """,
    doc="Per-document bigram LM score (add-k smoothed, corpus-trained counts) — "
    "the perplexity-proxy quality signal: shared bigram explode, partial-agg "
    "counts, vocabulary-keyed shuffle join, broadcast 1-row vocab size.",
    tags=("text", "corpus"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bigram_logprob(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# PII redaction — regex scrub over documents augmented with synthetic,
# doc_id-derived PII (the raw corpus is word-soup with no PII, so the
# augmentation makes the oracle actually exercise every pattern).
# ---------------------------------------------------------------------------
_PII_AUG_SQL = (
    "text || ' contact user' || doc_id || '@mail.example.com"
    " ph 555-867-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ssn 123-45-' || LPAD(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '89'"
)


def _pii_augmented(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com ph 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ssn 123-45-"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit("89"),
        ).alias("text"),
    )


@register(
    "pii_redaction",
    oracle=rf"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents
    ),
    s1 AS (  -- each pattern counts on the text AS OF its stage
      SELECT doc_id,
             LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_emails,
             REGEXP_REPLACE(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g') AS t1
      FROM aug
    ),
    s2 AS (
      SELECT doc_id, n_emails,
             LEN(REGEXP_EXTRACT_ALL(t1, '\d{{3}}-\d{{2}}-\d{{4}}')) AS n_ssns,
             REGEXP_REPLACE(t1, '\d{{3}}-\d{{2}}-\d{{4}}', '<SSN>', 'g') AS t2
      FROM s1
    ),
    s3 AS (
      SELECT doc_id, n_emails, n_ssns,
             LEN(REGEXP_EXTRACT_ALL(t2, '\d{{3}}-\d{{3}}-\d{{4}}')) AS n_phones,
             REGEXP_REPLACE(t2, '\d{{3}}-\d{{3}}-\d{{4}}', '<PHONE>', 'g') AS redacted
      FROM s2
    )
    SELECT doc_id, n_emails, n_ssns, n_phones,
           LENGTH(redacted) AS redacted_len,
           MD5(redacted) AS redacted_hash
    FROM s3
    """,
    doc="Regex PII scrubbing (email/SSN/phone spans -> typed tokens) over documents "
    "augmented with deterministic doc_id-derived PII; counts + redacted hash "
    "(LLM-pipeline privacy pass, pure codegen expressions).",
    tags=("text", "corpus"),
    bench=True,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.redact_pii(_pii_augmented(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------------
# Context-window chunking — overlapping token windows per document.
# ---------------------------------------------------------------------------
@register(
    "text_context_chunks",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
      FROM documents
    )
    SELECT t.doc_id,
           CAST(s / 48 AS BIGINT) AS chunk_idx,
           LEN(LIST_SLICE(t.toks, s + 1, s + 64)) AS n_chunk_tokens,
           MD5(ARRAY_TO_STRING(LIST_SLICE(t.toks, s + 1, s + 64), ' ')) AS chunk_hash
    FROM t, UNNEST(GENERATE_SERIES(0, LEN(t.toks) - 1, 48)) AS u(s)
    """,
    doc="Overlapping context-window chunking (64-token windows, stride 48): "
    "sequence+explode+slice array expressions, chunk text hashed for a narrow "
    "result (RAG/pretraining splitting primitive).",
    tags=("text", "corpus"),
    bench=True,
)
def text_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.chunk_documents(_docs(spark, sf_dir), window=64, stride=48)


# ---------------------------------------------------------------------------
# Greedy sequence packing — fixed-capacity training sequences.
# ---------------------------------------------------------------------------
@register(
    "pack_sequences_greedy",
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source,
             CAST(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS BIGINT) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    rec AS (
      SELECT doc_id, source, n_tokens, rn,
             CAST(0 AS BIGINT) AS seq_idx, n_tokens AS fill
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.doc_id, t.source, t.n_tokens, t.rn,
             CASE WHEN r.fill + t.n_tokens > 512 THEN r.seq_idx + 1 ELSE r.seq_idx END,
             CASE WHEN r.fill + t.n_tokens > 512 THEN t.n_tokens ELSE r.fill + t.n_tokens END
      FROM rec r JOIN toks t ON t.source = r.source AND t.rn = r.rn + 1
    )
    SELECT source, doc_id, n_tokens, seq_idx FROM rec
    """,
    doc="Greedy fixed-capacity (512-token) sequence packing per source in doc_id "
    "order — pretraining batch construction; sequential per group, parallel "
    "across groups, only (group,id,count) rows reach the pandas loop. "
    "Oracle: recursive CTE replaying the same greedy rule.",
    tags=("corpus",),
    bench=True,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), capacity=512)


# ---------------------------------------------------------------------------
# Stratified sampling — first-k per group in md5(key) order.
# ---------------------------------------------------------------------------
@register(
    "sample_documents_stratified",
    oracle=r"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE rk <= 10
    """,
    doc="Deterministic stratified sample: 10 docs per source in md5(key) order — "
    "reproducible pseudo-random draw any engine replays identically "
    "(top-k-per-key window, one group-keyed shuffle).",
    tags=("sampling",),
)
def sample_documents_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.sampling import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "source"), "source", 10
    )


# ---------------------------------------------------------------------------
# Embedding quantization error profile — global min-max int8.
# ---------------------------------------------------------------------------
@register(
    "embedding_quantization_error",
    oracle=r"""
    WITH vals AS (
      SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x FROM embeddings
    ),
    stats AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM vals),
    e AS (
      SELECT vec_id,
             ABS(x - (mn + ROUND((x - mn) / ((mx - mn) / 255)) * ((mx - mn) / 255))) AS err
      FROM vals, stats
    )
    SELECT vec_id,
           COUNT(*) AS n_dims,
           ROUND(MAX(err), 6) AS max_abs_err,
           ROUND(AVG(err), 6) AS mean_abs_err
    FROM e GROUP BY vec_id
    """,
    doc="Int8 scalar-quantization reconstruction-error profile per vector "
    "(global min-max, 256 codes): posexplode -> broadcast 1-row stats "
    "cross-join -> per-element error -> per-vector agg; codegen end to end.",
    tags=("similarity",),
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.quantization_error_profile(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# Vocabulary building — corpus-wide top-k n-grams.
# ---------------------------------------------------------------------------
@register(
    "corpus_top_bigrams",
    oracle=r"""
    WITH t AS (
      SELECT STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks FROM documents
    ),
    g AS (
      SELECT ARRAY_TO_STRING(t.toks[i:i+1], ' ') AS gram
      FROM t, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(t.toks) - 1, 1))) AS u(i)
    )
    SELECT gram, COUNT(*) AS n_occurrences
    FROM g GROUP BY gram
    ORDER BY n_occurrences DESC, gram ASC
    LIMIT 100
    """,
    doc="Corpus-wide top-100 bigrams by count (vocabulary/merge-table precursor): "
    "explode -> partial-agg count -> deterministic top-k (TakeOrderedAndProject).",
    tags=("text", "corpus"),
)
def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import top_ngrams

    return top_ngrams(_docs(spark, sf_dir), n=2, k=100)


# ---------------------------------------------------------------------------
@register(
    "corpus_weighted_mixture",
    oracle="""
    WITH w(source, n_full, thr) AS (
      VALUES ('src1', 2, '80000000'), ('src2', 1, '00000000'), ('src3', 0, '40000000')
    ),
    d AS (
      SELECT doc_id, documents.source AS source,
             COALESCE(w.n_full, 0)
             + CASE WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)
                         < COALESCE(w.thr, '80000000') THEN 1 ELSE 0 END AS n_copies
      FROM documents LEFT JOIN w ON documents.source = w.source
    )
    SELECT doc_id, source, CAST(g.copy AS BIGINT) AS copy
    FROM d, UNNEST(GENERATE_SERIES(1, d.n_copies)) AS g(copy)
    """,
    doc="Pretraining data-mixture assembly: per-source sampling/upsampling rates "
    "(src1 x2.5, src2 x1.0, src3 x0.25, default x0.5) applied as floor(w) full "
    "copies + an md5-deterministic fractional draw — shuffle-free, engine-portable, "
    "replayable (the per-domain rate table every training run starts from).",
    tags=("corpus", "sampling"),
)
def corpus_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import weighted_mixture

    return weighted_mixture(
        _docs(spark, sf_dir),
        weights={"src1": 2.5, "src2": 1.0, "src3": 0.25},
        default_weight=0.5,
    )


@register(
    "corpus_vocab_prune",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(list_transform(toks, (x, i) -> {'pos': i, 'tok': x}),
                    recursive := true)
      FROM (SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
            FROM documents) t
    ),
    dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS dfq FROM toks GROUP BY tok),
    nd AS (SELECT COUNT(*) AS n FROM documents),
    keep AS (
      -- FLOOR before CAST: DuckDB CAST rounds-half-up while the Spark
      -- side uses Python int() truncation — for odd n the two cutoffs
      -- would differ by one and a boundary-df token flips the hash
      SELECT tok FROM dfreq, nd WHERE dfq >= 2 AND dfq <= CAST(FLOOR(0.5 * n) AS BIGINT)
    ),
    kept AS (
      SELECT doc_id, pos, tok FROM toks SEMI JOIN keep USING (tok)
    ),
    rebuilt AS (
      SELECT doc_id,
             STRING_AGG(tok, ' ' ORDER BY pos) AS kept_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    totals AS (
      SELECT doc_id, LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS n_total
      FROM documents
    )
    SELECT t.doc_id,
           COALESCE(r.kept_text, '') AS kept_text,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(t.n_total - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM totals t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
    """,
    doc="Vocabulary pruning (min_df=2, max_df=50%): rebuild each document "
    "keeping only in-band tokens in original order — the bag-of-words/TF-IDF "
    "featurization step; exploded df groupBy + semi-join + order-preserving "
    "re-aggregation, all codegen (SURVEY LLM-pipeline family).",
    tags=("text", "corpus"),
)
def corpus_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import vocab_prune

    return vocab_prune(_docs(spark, sf_dir), max_df_frac=0.5, min_df=2)


@register(
    "embedding_covariance_stats",
    oracle=PR.embedding_covariance_oracle_sql(dim=64),
    doc="Dimension-pair population covariance of the embedding column — the "
    "whitening/PCA preprocessing input: one Arrow Gram-matrix partial per "
    "partition (O(d^2) doubles, row-count independent), bounded driver "
    "reduce like the kmeans centroid step; relational explode-join oracle.",
    tags=("similarity", "projection"),
)
def embedding_covariance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PR.embedding_covariance(_emb(spark, sf_dir), dim=64)


# ---------------------------------------------------------------------------
@register(
    "dedup_duplicated_spans",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks FROM documents
    ),
    sp AS (
      SELECT doc_id,
             UNNEST([('0x' || SUBSTR(MD5(ARRAY_TO_STRING(toks[i+1:i+16], ' ')), 1, 15))::BIGINT
                     FOR i IN GENERATE_SERIES(0, GREATEST(LEN(toks) - 16, 0), 8)]) AS span
      FROM t
    ),
    d AS (
      SELECT span FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) > 1
    )
    SELECT sp.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           ROUND(CAST(SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS dup_fraction
    FROM sp LEFT JOIN d ON sp.span = d.span
    GROUP BY sp.doc_id
    """,
    doc="Substring-level duplication profile (suffix-array-dedup analog, Lee et al.): "
    "16-token spans every 8 tokens, md5 span identity; a span in >1 document is "
    "duplicated text — per-doc dup_fraction feeds the standard 'drop docs with >X% "
    "duplicated text' curation filter.  Catches boilerplate/license/quoted spans "
    "whole-doc near-dup misses.",
    tags=("dedup", "text"),
)
def dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.dedup import duplicated_span_profile

    return duplicated_span_profile(_docs(spark, sf_dir), window=16, stride=8)


# ---------------------------------------------------------------------------
# BPE tokenizer training — distributed merge learning (Sennrich 2016).
# Each entry trains inside its own invocation (r12 removed the
# per-sf_dir module memo that let the vocab/token-count entries skip
# retraining in the same process — cross-invocation precomputation;
# see _ivf_centroids); the operators' measured-vocabulary resident
# tier makes per-invocation training cheap.
# ---------------------------------------------------------------------------


@register(
    "bpe_train_merges",
    oracle=__import__(
        "robosystems_spark.operators.bpe", fromlist=["bpe_oracle_sql"]
    ).bpe_oracle_sql(n_merges=8),
    doc="Distributed BPE merge training: learn the top-8 symbol merges "
    "from corpus word frequencies — the tokenizer-training step of an "
    "LLM data pipeline.  Pair counting is a lead-window + groupBy-sum, "
    "greedy merge application is window-only (run-parity rule for "
    "overlapping candidates), one argmax row collected per iteration "
    "(kmeans-style bounded driver traffic); verified against a textbook "
    "reference implementation in tests and an 8x-unrolled CTE oracle.",
    tags=("text", "corpus", "tokenizer"),
    bench=True,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.bpe import bpe_train

    return bpe_train(_docs(spark, sf_dir), n_merges=8)


@register(
    "bpe_vocab_after_merges",
    oracle=__import__(
        "robosystems_spark.operators.bpe", fromlist=["bpe_oracle_sql"]
    ).bpe_oracle_sql(n_merges=8, mode="vocab"),
    doc="Symbol vocabulary after applying the 8 learned BPE merges: "
    "(sym, total_freq, n_words) — the trained tokenizer's unit "
    "inventory over this corpus; encode path is collect-free (all "
    "merge steps chain into one lazily-checkpointed plan).",
    tags=("text", "corpus", "tokenizer"),
)
def bpe_vocab_after_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.bpe import bpe_vocab

    # merges=None: train inside bpe_vocab over ONE word-frequency pass
    # (r12 — passing a pre-collected merge list made the operator
    # aggregate the corpus twice; results are identical either way)
    return bpe_vocab(_docs(spark, sf_dir), n_merges=8)


@register(
    "bpe_token_counts",
    oracle=__import__(
        "robosystems_spark.operators.bpe", fromlist=["bpe_oracle_sql"]
    ).bpe_oracle_sql(n_merges=8, mode="token_counts"),
    doc="Per-document token counts under the trained BPE tokenizer "
    "(doc_id, n_words, n_bpe_tokens) — the corpus token-budget "
    "question; per-word token counts computed once on the vocabulary "
    "and broadcast-joined to the exploded corpus, so the corpus never "
    "re-tokenizes.",
    tags=("text", "corpus", "tokenizer"),
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.bpe import bpe_token_counts

    return bpe_token_counts(_docs(spark, sf_dir), n_merges=8)


# ---------------------------------------------------------------------------
# SemDeDup semantic deduplication (Abbas et al. 2023).
# ---------------------------------------------------------------------------
@register(
    "dedup_semantic_semdedup",
    oracle=CL.semantic_dedup_oracle_sql(k=8, iters=2, tau=0.95, dim=64),
    doc="SemDeDup semantic deduplication: k-means-cluster the embedding "
    "space (shared Lloyd machinery, hash-identical oracle chain), then "
    "keep-lowest-id within-cluster cosine dedup at tau=0.95 with a "
    "modulo sub-split capping any cluster's self-join at O(cap^2) — "
    "the embedding-space analog of MinHash near-dup, nothing all-pairs.",
    tags=("dedup", "similarity", "clustering"),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CL.semantic_dedup(_emb(spark, sf_dir), k=8, iters=2, tau=0.95)


# ---------------------------------------------------------------------------
# PCA top principal component (power iteration).
# ---------------------------------------------------------------------------
@register(
    "embedding_pca_pc1",
    oracle=PR.pca_power_oracle_sql(dim=64, iters=8),
    doc="Projection onto the top principal component, estimated by 8 "
    "power-iteration steps over the rounded covariance matrix — the "
    "whitening/compression primitive eigendecomposition would give; "
    "corpus touched twice map-only (Arrow Gram partials + codegen "
    "zip_with dot), iteration is d x d driver work; oracle unrolls "
    "matvec->normalize->round per step (kmeans rounding discipline).",
    tags=("similarity", "projection"),
    bench=True,
)
def embedding_pca_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PR.pca_power_projection(_emb(spark, sf_dir), dim=64, iters=8)


# ---------------------------------------------------------------------------
# Linear quality classifier — distributed GD, distilled from the
# heuristic teacher.
# ---------------------------------------------------------------------------
@register(
    "quality_lr_classifier",
    oracle=__import__(
        "robosystems_spark.operators.classifier",
        fromlist=["quality_lr_oracle_sql"],
    ).quality_lr_oracle_sql(iters=6, lr=20.0),
    doc="fastText-style linear quality filter trained by 6 full-batch "
    "gradient-descent steps (lr=20) (distilled from the rule-based quality "
    "teacher): per iteration ONE distributed aggregation returns the "
    "4-double averaged gradient (kmeans-bounded driver traffic); "
    "scoring is a map-only codegen pass.  Oracle unrolls GD into "
    "single-row weight CTEs with per-step rounding re-sync.",
    tags=("text", "corpus", "classifier"),
    bench=True,
)
def quality_lr_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.classifier import quality_lr_score

    return quality_lr_score(_docs(spark, sf_dir), iters=6, lr=20.0)


@register(
    "corpus_ppmi_word_similarity",
    oracle=__import__(
        "robosystems_spark.operators.corpus",
        fromlist=["ppmi_word_similarity_oracle_sql"],
    ).ppmi_word_similarity_oracle_sql(),
    doc="Count-based word embeddings (Levy & Goldberg 2014): symmetric "
    "+/-2 skip-gram co-occurrence -> PPMI matrix -> top-50 most-similar "
    "word pairs by cosine over sparse PPMI rows. Pairs generate "
    "MAP-SIDE via array transforms (no window shuffle, no position "
    "self-join); the cosine is a sparse matmul bounded by the "
    "min_count vocabulary. Integer-scaled PPMI weights make dots and "
    "norms exact integer sums; per-norm sqrt avoids int64 overflow.",
    tags=("text", "corpus", "embedding"),
    bench=True,
)
def corpus_ppmi_word_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import ppmi_word_similarity

    return ppmi_word_similarity(_docs(spark, sf_dir))


@register(
    "nb_langid_confusion",
    oracle=__import__(
        "robosystems_spark.operators.classifier",
        fromlist=["naive_bayes_confusion_oracle_sql"],
    ).naive_bayes_confusion_oracle_sql(),
    doc="Multinomial Naive Bayes language classifier with Laplace "
    "smoothing, trained and scored in ONE relational plan (no "
    "iteration): class priors + token-class likelihoods from two hash "
    "aggregations, vocabulary as a one-row broadcast, scoring as a "
    "token-occurrence join against the likelihood table. Every log "
    "is integer-scaled at source (ROUND(ln*1e6)::BIGINT) so document "
    "scores are EXACT integer sums — order-independent, hence the "
    "confusion matrix carries a hard oracle; argmax ties break on "
    "class name.",
    tags=("text", "corpus", "classifier"),
)
def nb_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.classifier import naive_bayes_confusion

    return naive_bayes_confusion(_docs(spark, sf_dir))


@register(
    "dedup_duplicate_clusters_star",
    oracle=_DUP_CLUSTERS_ORACLE,
    doc="Same duplicate-cluster output computed by alternating "
    "large-star/small-star rounds (Kiveris et al.) instead of label "
    "propagation: O(log^2 n) shuffle rounds vs O(component diameter) "
    "— the right algorithm when near-dup graphs contain long chains; "
    "identical min-id fixpoint, so it shares the recursive-CTE oracle.",
    tags=("dedup", "graph"),
    bench=True,
)
def dedup_duplicate_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.graph import duplicate_clusters

    docs = _docs(spark, sf_dir)
    pre = _blocked_pairs_pre(docs, threshold=0.5)
    pairs = jaccard_blocked_pairs(
        docs, threshold=0.5, resident_max=0
    ).select("doc_a", "doc_b")
    return duplicate_clusters(pairs, method="star", precollected=pre)


# ---------------------------------------------------------------------------
# Record linkage: blocked fuzzy name matching.
# ---------------------------------------------------------------------------
@register(
    "linkage_fuzzy_part_names",
    oracle=__import__(
        "robosystems_spark.operators.linkage",
        fromlist=["fuzzy_name_oracle_sql"],
    ).fuzzy_name_oracle_sql("part", "p_name", max_dist=2),
    doc="Entity-resolution fuzzy matching: DISTINCT names first (a "
    "popular name never goes quadratic over its records), blocked by "
    "last name token with an md5 modulo sub-split cap, JVM-codegen "
    "levenshtein <= 2 within blocks — the Fellegi-Sunter blocking "
    "shape for ingest pipelines whose keys don't line up.",
    tags=("linkage", "text"),
    bench=True,
)
def linkage_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.linkage import fuzzy_name_matches

    return fuzzy_name_matches(
        read_table(spark, sf_dir, "part"), "p_name", "p_partkey", max_dist=2
    )


@register(
    "linkage_entity_clusters",
    oracle=__import__(
        "robosystems_spark.operators.linkage",
        fromlist=["entity_clusters_oracle_sql"],
    ).entity_clusters_oracle_sql("part", "p_name", max_dist=2),
    doc="End-to-end entity resolution: the blocked fuzzy matcher's pairs "
    "feed min-label connected components (transitive closure — A~B, B~C "
    "merge even when A,C exceed the edit threshold), canonical name = "
    "lexicographically smallest member; emits the per-entity merge "
    "worklist (n_names, total_records). Composition of two capped, "
    "never-quadratic primitives; recursive-CTE oracle.",
    tags=("linkage", "graph"),
)
def linkage_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.linkage import entity_clusters

    return entity_clusters(read_table(spark, sf_dir, "part"), "p_name", max_dist=2)


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-Res).
# ---------------------------------------------------------------------------
@register(
    "sample_documents_weighted",
    oracle=__import__(
        "robosystems_spark.operators.sampling",
        fromlist=["weighted_sample_ares_oracle_sql"],
    ).weighted_sample_ares_oracle_sql(
        "documents",
        r"LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'))",
        "doc_id",
        k=100,
    ),
    doc="Token-weighted sampling without replacement via A-Res "
    "priorities (Efraimidis-Spirakis): md5-uniform u per doc, "
    "priority ln(u)/n_tokens, global top-100 in one TakeOrdered pass "
    "— the reproducible mixture-draw primitive (longer docs "
    "proportionally likelier, same sample on any engine or rerun).",
    tags=("sampling", "corpus"),
)
def sample_documents_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.sampling import weighted_sample_ares

    d = _docs(spark, sf_dir)
    w = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return weighted_sample_ares(d, w, "doc_id", k=100)


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs persisted corpus index.
# ---------------------------------------------------------------------------
@register(
    "dedup_incremental_batch",
    oracle=D.incremental_dedup_oracle_sql(threshold=0.5, new_mod=10),
    doc="Incremental near-dup screen: the corpus (doc_id%10!=0) is "
    "signed ONCE into a persisted MinHash signature index; the new "
    "batch (doc_id%10==0) computes only its own signatures and "
    "band-joins against the store — daily dedup cost O(batch), not "
    "O(corpus).  Estimator = matching-component fraction (exact "
    "multiples of 1/64, engine-exact).",
    tags=("dedup",),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    path = tempfile.mkdtemp(prefix="minhash_idx_") + "/sigs"
    D.write_minhash_index(corpus, path)
    return D.dedup_against_index(new_batch, path, threshold=0.5)


@register(
    "dedup_remove_spans",
    oracle=r"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks FROM documents
    ),
    sp AS MATERIALIZED (
      SELECT doc_id, i,
             ('0x' || SUBSTR(MD5(ARRAY_TO_STRING(toks[i+1:i+16], ' ')), 1, 15))::BIGINT AS span
      FROM (SELECT doc_id, toks,
                   UNNEST(GENERATE_SERIES(0, GREATEST(LEN(toks) - 16, 0), 8)) AS i
            FROM t)
    ),
    dup AS (SELECT span FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) > 1),
    cover AS MATERIALIZED (
      SELECT DISTINCT doc_id, UNNEST(GENERATE_SERIES(i, i + 15)) AS pos
      FROM sp SEMI JOIN dup USING (span)
    ),
    tokrows AS (
      SELECT doc_id, pos0 - 1 AS pos, tok FROM (
        SELECT doc_id,
               UNNEST(list_transform(toks, (x, i) -> {'pos0': i, 'tok': x}),
                      recursive := true)
        FROM t)
    ),
    kept AS (
      SELECT doc_id, pos, tok FROM tokrows ANTI JOIN cover USING (doc_id, pos)
    ),
    rebuilt AS (
      SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY pos) AS cleaned_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(LEN(t.toks) AS BIGINT) AS n_tokens,
           CAST(LEN(t.toks) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(r.cleaned_text, '') AS cleaned_text
    FROM t LEFT JOIN rebuilt r USING (doc_id)
    """,
    doc="Exact-substring dedup, removal form (Lee et al.): every token "
    "covered by a cross-document duplicated 16-token span is excised "
    "and the document rebuilt in order — the actionable counterpart "
    "of dedup_duplicated_spans (same grid, same md5 span identity); "
    "coverage anti-join + order-preserving re-aggregation, all codegen.",
    tags=("dedup", "text"),
)
def dedup_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.remove_duplicated_spans(_docs(spark, sf_dir))


@register(
    "text_trigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      FROM documents
    ),
    tri AS MATERIALIZED (
      SELECT doc_id, t[gs.i] AS w1, t[gs.i + 1] AS w2, t[gs.i + 2] AS w3
      FROM toks, UNNEST(GENERATE_SERIES(1, LEN(t) - 2)) AS gs(i)
      WHERE LEN(t) >= 3
    ),
    c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri GROUP BY 1, 2, 3),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM tri GROUP BY 1, 2),
    c23 AS (SELECT w2, w3, COUNT(*) AS c23 FROM tri GROUP BY 1, 2),
    c2 AS (SELECT w2, COUNT(*) AS c2 FROM tri GROUP BY 1),
    cu AS (SELECT w3, COUNT(*) AS cu FROM tri GROUP BY 1),
    tot AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(DISTINCT w3) AS DOUBLE) AS v
      FROM tri
    )
    SELECT doc_id, COUNT(*) AS n_trigrams,
           ROUND(AVG(LN(
             0.6 * (c3.c3 / c12.c12)
             + 0.3 * (c23.c23 / c2.c2)
             + 0.1 * ((cu.cu + 0.5) / (tot.n + 0.5 * tot.v))
           )), 4) AS avg_logprob
    FROM tri
    JOIN c3 USING (w1, w2, w3)
    JOIN c12 USING (w1, w2)
    JOIN c23 USING (w2, w3)
    JOIN c2 USING (w2)
    JOIN cu USING (w3)
    CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc="Interpolated trigram LM score (Jelinek-Mercer over "
    "trigram/bigram MLs with an add-k unigram floor) — the stronger "
    "perplexity-proxy curation signal; one trigram explode shared by "
    "training and scoring, per-order count joins, broadcast totals.",
    tags=("text", "corpus"),
)
def text_trigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.trigram_interpolated_logprob(_docs(spark, sf_dir))


@register(
    "corpus_bigram_pmi",
    oracle=r"""
    WITH t AS (
      SELECT STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks FROM documents
    ),
    g AS MATERIALIZED (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM t, UNNEST(GENERATE_SERIES(1, LEN(toks) - 1)) AS u(i)
      WHERE LEN(toks) >= 2
    ),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM g GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM g GROUP BY 1),
    c2 AS (SELECT w2, COUNT(*) AS c2 FROM g GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM g)
    SELECT cb.w1, cb.w2, cb.cb AS pair_count,
           ROUND(LN(cb.cb * n.n / (c1.c1 * c2.c2)), 6) AS pmi
    FROM cb JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
    WHERE cb.cb >= 5
    ORDER BY pmi DESC, w1 ASC, w2 ASC
    LIMIT 50
    """,
    doc="Top-50 collocations by PMI (min pair count 5, marginals over "
    "the bigram-position universe): the phrase-mining signal for "
    "tokenizer vocabularies; count joins + broadcast total + "
    "deterministic TakeOrdered.",
    tags=("text", "corpus"),
)
def corpus_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import bigram_pmi

    return bigram_pmi(_docs(spark, sf_dir), k=50, min_count=5)


@register(
    "dedup_jaccard_prefix_join",
    oracle=D.jaccard_prefix_join_oracle_sql(threshold=0.7, shingle_k=5),
    doc="EXACT set-similarity join via prefix filtering (PPJoin "
    "family) over the SAME 5-shingle space as MinHash: elements "
    "ordered by ascending global frequency, prefix "
    "length n - ceil(t*n) + 1, candidates from shared prefix tokens "
    "(rarest tokens -> small posting lists), exact Jaccard verify — "
    "no recall loss, unlike the MinHash/SimHash banding paths; the "
    "exactness itself is unit-tested against brute force.",
    tags=("dedup", "text"),
    bench=True,
)
def dedup_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.jaccard_prefix_join(
        _docs(spark, sf_dir), threshold=0.7, shingle_k=5
    )


@register(
    "embedding_pca_top3",
    oracle=PR.pca_components_oracle_sql(dim=64, n_components=3, iters=8),
    doc="Top-3 PCA projection via power iteration WITH DEFLATION "
    "(C - lambda v v^T between components): the multi-component "
    "reduction whitening/compression uses; corpus touched twice "
    "map-only, all iteration is d x d driver arithmetic; oracle "
    "unrolls three power chains + rank-1 deflation CTEs with the "
    "same rounding sync points.",
    tags=("similarity", "projection"),
)
def embedding_pca_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PR.pca_power_components(
        _emb(spark, sf_dir), dim=64, n_components=3, iters=8
    )


@register(
    "recsys_part_neighbors",
    oracle=__import__(
        "robosystems_spark.operators.corpus",
        fromlist=["item_cooccurrence_oracle_sql"],
    ).item_cooccurrence_oracle_sql(
        "(SELECT l_orderkey, l_partkey FROM lineitem)",
        "l_orderkey",
        "l_partkey",
        k=5,
    ),
    doc="Item-to-item collaborative filtering from order baskets "
    "(Amazon-style memory-based CF): cosine over basket co-occurrence "
    "counts, top-5 neighbors per part; pair work bounded by "
    "sum(basket_size^2) via the basket-keyed self-join, min-cooc "
    "noise pruning, deterministic per-item rank window.",
    tags=("recsys", "graph"),
)
def recsys_part_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import item_cooccurrence_topk

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    return item_cooccurrence_topk(
        li, "l_orderkey", "l_partkey", k=5
    )


@register(
    "recsys_association_rules",
    oracle="""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT bk) AS DOUBLE) AS n FROM b),
    cnt AS (SELECT it, COUNT(*) AS c FROM b GROUP BY it),
    cooc AS (
      SELECT x.it AS antecedent, y.it AS consequent, COUNT(*) AS n_both
      FROM b x JOIN b y ON x.bk = y.bk AND x.it <> y.it
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT antecedent, consequent, n_both,
           ROUND(n_both / nb.n, 6) AS support,
           ROUND(n_both / ci.c, 6) AS confidence,
           ROUND((n_both / ci.c) / (cj.c / nb.n), 6) AS lift
    FROM cooc
    JOIN cnt ci ON ci.it = antecedent
    JOIN cnt cj ON cj.it = consequent
    CROSS JOIN nb
    WHERE ROUND((n_both / ci.c) / (cj.c / nb.n), 6) > 1.0
    """,
    doc="Association rules over order baskets (support/confidence/"
    "lift, min co-occurrence 3, lift > 1 only): the market-basket "
    "companion to the CF neighbor table — same basket-keyed pair "
    "generation, rule metrics as pure count arithmetic.",
    tags=("recsys", "graph"),
)
def recsys_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).dropDuplicates()
    nb = b.agg(F.countDistinct("bk").cast("double").alias("_n"))
    cnt = b.groupBy("it").agg(F.count(F.lit(1)).alias("_c"))
    x, y = b.alias("x"), b.alias("y")
    cooc = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x.it") != F.col("y.it")))
        .groupBy(F.col("x.it").alias("antecedent"), F.col("y.it").alias("consequent"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    ci = cnt.select(F.col("it").alias("antecedent"), F.col("_c").alias("_ci"))
    cj = cnt.select(F.col("it").alias("consequent"), F.col("_c").alias("_cj"))
    lift = F.round(
        (F.col("n_both") / F.col("_ci")) / (F.col("_cj") / F.col("_n")), 6
    )
    return (
        cooc.join(ci, "antecedent")
        .join(cj, "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.round(F.col("n_both") / F.col("_n"), 6).alias("support"),
            F.round(F.col("n_both") / F.col("_ci"), 6).alias("confidence"),
            lift.alias("lift"),
        )
        .filter(F.col("lift") > 1.0)
    )


@register(
    "embedding_ivfpq_topk",
    oracle=PQ.ivfpq_oracle_sql(
        num_centroids=8, ivf_iters=2, nprobe=3, m=4, k=16, pq_iters=1,
        dim=64, topk=10, n_queries=3,
    ),
    doc="IVF-PQ search (the FAISS IVFPQ architecture end-to-end): "
    "coarse cosine-Lloyd partitioning + per-subspace PQ codes, ADC "
    "restricted to the nprobe probed buckets — per-query corpus work "
    "drops by ~num_centroids/nprobe vs flat PQ; single broadcast-"
    "query plan; BOTH approximation stages hash-checked by the "
    "composed oracle.",
    tags=("similarity",),
    bench=True,
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return PQ.ivfpq_topk(
        emb, queries, num_centroids=8, ivf_iters=2, nprobe=3,
        m=4, k=16, pq_iters=1, dim=64, topk=10,
    )


@register(
    "embedding_ivfpq_topk_indexed",
    oracle=PQ.ivfpq_oracle_sql(
        num_centroids=8, ivf_iters=2, nprobe=3, m=4, k=16, pq_iters=1,
        dim=64, topk=10, n_queries=3,
    ),
    doc="IVF-PQ search over a PERSISTED index (pq.ivfpq_write_index): "
    "PQ codes written hive-partitioned by coarse centroid_id — the "
    "billion-scale FAISS deployment layout — so each probe is a "
    "partition-pruned scan (PartitionFilters plan gate in test_pq) of "
    "~nprobe/num_centroids of the already-compressed codes; training "
    "runs once at index time, never per query.  Value-identical to "
    "embedding_ivfpq_topk, so the same composed oracle hash-checks it.",
    tags=("similarity",),
)
def embedding_ivfpq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = tempfile.mkdtemp(prefix="ivfpqidx_")
    cents, books = PQ.ivfpq_write_index(
        emb, path, num_centroids=8, ivf_iters=2, m=4, k=16,
        pq_iters=1, dim=64,
    )
    return PQ.ivfpq_topk_indexed(
        spark, path, cents, books, queries, nprobe=3, topk=10
    )


@register(
    "corpus_deterministic_shuffle",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             ('0x' || SUBSTR(MD5(doc_id || ':42'), 1, 15))::BIGINT AS h
      FROM documents
    )
    SELECT doc_id,
           h % 16 AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % 16 ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM k
    ORDER BY shard, pos
    """,
    doc="Deterministic global training-order shuffle: md5(doc_id:seed) "
    "keys every document, documents shard by the key (16 shards) and "
    "order within shard by (key, doc_id) — the reproducible data-order "
    "step every training run needs (same seed -> same order, on any "
    "engine, forever).  Scale shape: ordering windows are PARTITIONED "
    "by shard, so no global single-partition row_number exists; at "
    "100 TB the shard count scales with the cluster and each shard "
    "sorts independently.",
    tags=("corpus", "sampling"),
)
def corpus_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42")))
    h = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    keyed = _docs(spark, sf_dir).select(
        "doc_id", h.alias("_h"), F.pmod(h, F.lit(16)).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("_h", "doc_id")
    return (
        keyed.select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


@register(
    "corpus_ngram_novelty",
    oracle=r"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             t[i - 1] || ' ' || t[i] || ' ' || t[i + 1] AS g
      FROM toks, UNNEST(range(2, len(t))) AS u(i)
    ),
    gdf AS (
      SELECT g, COUNT(*) AS df FROM grams GROUP BY g
    )
    SELECT grams.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN gdf.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           ROUND(CAST(SUM(CASE WHEN gdf.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM grams JOIN gdf USING (g)
    GROUP BY grams.doc_id
    ORDER BY doc_id
    """,
    doc="Per-document n-gram novelty: the fraction of a document's "
    "distinct token trigrams appearing in NO other document — the "
    "boilerplate/templated-content signal data-curation pipelines "
    "rank by (novel docs carry new information; near-zero novelty "
    "means the corpus already says it).  Map-side trigram generation "
    "(array transform, no window shuffle), distinct per doc, one "
    "gram-keyed df aggregation joined back — all codegen.",
    tags=("text", "corpus"),
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.text import tokens

    grams = (
        _docs(spark, sf_dir)
        .select("doc_id", tokens("text").alias("_t"))
        .filter(F.size("_t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(_t) - 1), "
                    "i -> concat_ws(' ', _t[i - 2], _t[i - 1], _t[i]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    gdf = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    uniq = (F.col("df") == 1).cast("long")
    return (
        grams.join(gdf, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(uniq).alias("n_unique"),
            F.round(
                F.sum(uniq).cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_cluster_representatives",
    oracle=_DUP_CLUSTERS_CTES
    + """,
    q AS (
      SELECT c.node AS doc_id, c.cluster_id, d.n_chars AS quality
      FROM comp c JOIN documents d ON d.doc_id = c.node
    ),
    reps AS (
      SELECT cluster_id, doc_id AS representative_id
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY cluster_id ORDER BY quality DESC, doc_id ASC) AS rn
        FROM q
      ) WHERE rn = 1
    )
    SELECT q.doc_id, q.cluster_id, r.representative_id, q.quality,
           q.doc_id = r.representative_id AS keep
    FROM q JOIN reps r USING (cluster_id)
    """,
    doc=(
        "Keep-best representative selection over duplicate clusters: "
        "within each near-dup cluster keep the doc with max n_chars "
        "(ties -> lowest id, a total order) and map every member to it "
        "— the drop-list decision after clustering. One quality join + "
        "one cluster-keyed row_number window + one broadcast map-back; "
        "oracle extends the recursive-CTE cluster oracle with the same "
        "window."
    ),
    tags=("dedup", "graph"),
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.dedup import cluster_representatives
    from robosystems_spark.operators.graph import duplicate_clusters

    docs = _docs(spark, sf_dir)
    pre = _blocked_pairs_pre(docs, threshold=0.5)
    pairs = jaccard_blocked_pairs(
        docs, threshold=0.5, resident_max=0
    ).select("doc_a", "doc_b")
    clusters = duplicate_clusters(pairs, precollected=pre).select(
        "doc_id", "cluster_id"
    )
    return cluster_representatives(clusters, docs, quality_col="n_chars")


@register(
    "doc_top_terms",
    oracle=__import__(
        "robosystems_spark.operators.search",
        fromlist=["doc_top_terms_oracle_sql"],
    ).doc_top_terms_oracle_sql(topk_per_doc=3),
    doc=(
        "Per-document keyphrase extraction: top-3 terms by tf*idf "
        "(idf = ln(N/df), rounded at 9 digits before the multiply — "
        "the cross-engine sync point). One tokenize+explode pass; df "
        "derives FROM the (doc, term) aggregate so the corpus is "
        "scanned once; per-doc top-k is a total-ordered window."
    ),
    tags=("text", "search"),
)
def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.search import doc_top_terms as _dtt

    return _dtt(_docs(spark, sf_dir), topk_per_doc=3)


@register(
    "dedup_containment_pairs",
    oracle=D.containment_oracle_sql(threshold_num=19, threshold_den=20, min_size_a=30),
    doc=(
        "Asymmetric containment dedup: C(a->b) = |S(a) n S(b)|/|S(a)| "
        ">= 19/20 over distinct token sets (contained side floored at 30 "
    "tokens — tiny sets are promiscuously contained) — doc-inside-doc "
        "detection (quotes, concats, boilerplate wrappers) symmetric Jaccard "
        "misses when the container is much larger. EXACT via the "
        "containment form of the prefix-filter theorem: candidates "
        "from each contained side's floor((1-t)n)+1 RAREST tokens "
        "against full postings — no recall loss, never all-pairs; the "
        "threshold is an integer cross-multiply. The oracle verifies "
        "all token-sharing pairs (the prefix is a pure performance "
        "device)."
    ),
    tags=("dedup",),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.dedup import containment_prefix_join

    return containment_prefix_join(
        _docs(spark, sf_dir), threshold_num=19, threshold_den=20,
        min_size_a=30,
    )


@register(
    "text_unicode_nfc",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             text || repeat('e' || chr(769), CAST(doc_id % 4 AS INTEGER)) AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(LENGTH(s) AS BIGINT) AS raw_len,
           CAST(LENGTH(nfc_normalize(s)) AS BIGINT) AS nfc_len,
           CAST(LENGTH(s) - LENGTH(nfc_normalize(s)) AS BIGINT) AS n_composed,
           LENGTH(s) = LENGTH(nfc_normalize(s)) AS already_nfc
    FROM t
    ORDER BY doc_id
    """,
    doc="Unicode NFC canonicalization stats: documents are augmented "
    "with doc_id%4 combining sequences ('e' + U+0301), then NFC'd — "
    "Spark runs stdlib unicodedata in an Arrow pandas_udf, the oracle "
    "runs DuckDB's utf8proc nfc_normalize, so two independent UCD "
    "implementations must agree on every composed character count. "
    "The canonicalization pass text pipelines run before dedup "
    "(combining sequences hash differently from precomposed forms).",
    tags=("text",),
)
def text_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.text import unicode_nfc_stats

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.expr("repeat('é', CAST(doc_id % 4 AS INT))"),
        ).alias("text"),
    )
    return unicode_nfc_stats(docs).orderBy("doc_id")


@register(
    "text_url_extraction",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             text || ' see http://site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.com/p/' || CAST(doc_id AS VARCHAR)
                  || ' and https://cdn' || CAST(doc_id % 3 AS VARCHAR)
                  || '.org/img.png done' AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(s, 'https?://[a-z0-9./-]+')) AS BIGINT)
             AS n_urls,
           regexp_extract_all(s, 'https?://[a-z0-9./-]+')[1] AS first_url,
           regexp_extract(s, 'https?://([a-z0-9.-]+)', 1) AS first_host
    FROM t
    ORDER BY doc_id
    """,
    doc="URL extraction/normalization over documents (crawl-pipeline "
    "link mining): deterministic URLs appended per doc_id, then "
    "extracted with the SAME regex in Spark (Java regex, "
    "regexp_extract_all) and DuckDB (RE2) — pattern restricted to a "
    "dialect-neutral class so both engines must return identical "
    "URL lists, first URLs, and hosts.",
    tags=("text",),
)
def text_url_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    s = F.concat(
        F.col("text"),
        F.lit(" see http://site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".com/p/"), F.col("doc_id").cast("string"),
        F.lit(" and https://cdn"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".org/img.png done"),
    )
    pat = r"https?://[a-z0-9./-]+"
    urls = F.regexp_extract_all(s, F.lit(pat), 0)
    return docs.select(
        "doc_id",
        F.size(urls).cast("long").alias("n_urls"),
        urls.getItem(0).alias("first_url"),
        F.regexp_extract(s, r"https?://([a-z0-9.-]+)", 1).alias("first_host"),
    ).orderBy("doc_id")


@register(
    "embedding_sq8_topk",
    oracle="""
    WITH ex AS (
      SELECT e.vec_id, g.i, CAST(e.embedding[g.i] AS DOUBLE) AS x
      FROM embeddings e
      JOIN (SELECT UNNEST(RANGE(1,
              (SELECT LEN(embedding) FROM embeddings LIMIT 1) + 1)) AS i
           ) g ON TRUE
    ),
    dims AS (SELECT i, MIN(x) AS lo, MAX(x) AS hi FROM ex GROUP BY i),
    rec AS (
      SELECT ex.vec_id,
             LIST(CASE WHEN d.hi = d.lo THEN d.lo
                  ELSE d.lo + LEAST(255, GREATEST(0,
                         FLOOR((ex.x - d.lo) / ((d.hi - d.lo) / 255) + 0.5)))
                       * ((d.hi - d.lo) / 255) END ORDER BY ex.i) AS r
      FROM ex JOIN dims d ON d.i = ex.i
      GROUP BY ex.vec_id
    ),
    q AS (SELECT r AS qr FROM rec WHERE vec_id = 0),
    scores AS (
      SELECT rec.vec_id AS nn_id,
             ROUND(list_dot_product(CAST(rec.r AS DOUBLE[]),
                                    CAST(q.qr AS DOUBLE[])), 6) AS score
      FROM rec, q
    )
    SELECT 0 AS query_id, nn_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, nn_id) AS INT) AS rank
    FROM scores ORDER BY score DESC, nn_id LIMIT 10
    """,
    doc="SQ8 scalar-quantized ANN (FAISS ScalarQuantizer QT_8bit): "
    "per-dimension (lo, (hi-lo)/255) codebook trained in one "
    "posexplode aggregate, vectors stored as dim uint8 codes (4x "
    "smaller than float32), symmetric reconstructed dot-product "
    "search entirely in JVM array expressions (explicit floor(x+0.5) "
    "half-up rounding shared with the oracle; sequential fold "
    "matching list_dot_product order). Completes the vector-"
    "compression family alongside PQ/IVF-PQ.",
    tags=("similarity",),
    bench=True,
)
def embedding_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    return S.sq8_topk(emb, queries, k=10)


@register(
    "corpus_dsir_importance",
    oracle=__import__(
        "robosystems_spark.operators.corpus", fromlist=["dsir_oracle_sql"]
    ).dsir_oracle_sql("lang = 'en'"),
    doc="DSIR importance weights (Xie et al. 2023): score every raw "
    "document by target-likeness — log w = Σ_f c(f)·ln(p̂_t(f)/p̂_r(f)) "
    "over Laplace-smoothed hashed unigram+bigram bag models (target = "
    "English docs here). Features hash via md5-15-hex mod 4096 "
    "(engine-portable), every ln runs on an INTEGER rounded to the "
    "1e-9 lattice, so the per-doc sum is exact BIGINT — one float "
    "division + ROUND at the end. One tokenize pass, bucket stats "
    "(≤4096 rows) broadcast back; the raw pool shuffles once.",
    tags=("text", "corpus", "sampling"),
    bench=True,
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import dsir_importance

    docs = _docs(spark, sf_dir).withColumn("is_target", F.col("lang") == "en")
    return dsir_importance(docs).orderBy("doc_id")


@register(
    "corpus_ccnet_buckets",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, t[gs.i] AS w1, t[gs.i + 1] AS w2
      FROM toks, UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS gs(i)
      WHERE LEN(t) >= 2
    ),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT UNNEST(t) AS tok FROM toks)
    ),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             ROUND(AVG(LN((cb.cb + 0.5) / (c1.c1 + 0.5 * (SELECT v FROM vocab)))), 4)
               AS avg_logprob
      FROM big JOIN cb USING (w1, w2) JOIN c1 USING (w1)
      GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           avg_logprob,
           CAST(NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id ASC)
                AS INTEGER) AS bucket,
           CASE NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id ASC)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS tier
    FROM scored
    ORDER BY doc_id
    """,
    doc="CCNet quality tiers (Wenzek et al. 2020): rank every document "
    "by the corpus-trained bigram-LM score and NTILE into equal head/"
    "middle/tail thirds — the quality bucketing CCNet mixtures sample "
    "at different rates. The tier boundary is NTILE over a TOTAL order "
    "(rounded score DESC, id) so bucket edges are engine-identical. "
    "Two count shuffles + one global window; corpora too large for one "
    "sort switch to approxQuantile boundaries (documented, not "
    "silently approximated).",
    tags=("text", "corpus", "quality"),
    bench=True,
)
def corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import ccnet_perplexity_buckets

    return ccnet_perplexity_buckets(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "quality_calibration_bins",
    oracle=__import__(
        "robosystems_spark.operators.classifier",
        fromlist=["quality_calibration_oracle_sql"],
    ).quality_calibration_oracle_sql(iters=6, lr=20.0, bins=10),
    doc="Reliability diagram (Guo et al. 2017) for the distilled "
    "quality classifier: decile-bin the predicted probability, "
    "compare mean predicted vs observed positive rate per bin (the "
    "ECE terms) — the calibration gate a filtering pipeline runs "
    "before trusting a learned keep/drop threshold. p_quality is "
    "engine-identical (per-step rounded GD), so the binning floor and "
    "the 1e6-lattice BIGINT mean hash-match the unrolled-GD oracle.",
    tags=("text", "classifier", "eval"),
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.classifier import (
        quality_calibration_bins as _cal,
    )

    return _cal(_docs(spark, sf_dir), iters=6, lr=20.0, bins=10)


_MRL_DIMS = (8, 16, 32)


@register(
    "embedding_matryoshka_recall",
    oracle=f"""
    WITH fullsims AS (
      SELECT q.vec_id AS query_id, e.vec_id AS nn_id,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[])), 6)
               AS cosine
      FROM embeddings e
      JOIN embeddings q ON q.vec_id < 3
    ),
    ex AS (
      SELECT query_id, nn_id FROM (
        SELECT query_id, nn_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, nn_id) AS rank
        FROM fullsims
      ) WHERE rank <= 10
    ),
    tr AS (
      {" UNION ALL ".join(f'''
      SELECT {d} AS trunc_dim, query_id, nn_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS nn_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(LIST_COSINE_SIMILARITY(
                     CAST(e.embedding[1:{d}] AS DOUBLE[]),
                     CAST(q.embedding[1:{d}] AS DOUBLE[])), 6) DESC,
                   e.vec_id) AS rank
        FROM embeddings e JOIN embeddings q ON q.vec_id < 3
      ) WHERE rank <= 10''' for d in _MRL_DIMS)}
    )
    SELECT t.trunc_dim, ex.query_id,
           COUNT(t2.nn_id) AS n_hit,
           ROUND(CAST(COUNT(t2.nn_id) AS DOUBLE) / 10, 6) AS recall_at_10
    FROM (SELECT DISTINCT trunc_dim FROM tr) t
    CROSS JOIN (SELECT DISTINCT query_id FROM ex) ex
    LEFT JOIN tr t2
      ON t2.trunc_dim = t.trunc_dim AND t2.query_id = ex.query_id
     AND EXISTS (SELECT 1 FROM ex e2
                 WHERE e2.query_id = t2.query_id AND e2.nn_id = t2.nn_id)
    GROUP BY t.trunc_dim, ex.query_id
    ORDER BY t.trunc_dim, ex.query_id
    """,
    doc="Matryoshka-truncation evaluation (Kusupati et al. 2022): "
    "recall@10 of prefix-truncated embeddings (dims 8/16/32) against "
    "full-dim exact cosine — the dimension-vs-quality trade curve an "
    "MRL deployment measures before shipping truncated vectors. Both "
    "sides rank on ROUND(cos, 6) with id tie-break; overlap is an "
    "integer semi-count, so the whole curve is hash-checked.",
    tags=("similarity", "eval"),
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from robosystems_spark.functions import vector as V

    emb = _emb(spark, sf_dir)
    c = emb.select(F.col("vec_id").alias("nn_id"), F.col("embedding").alias("_cv"))
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    pairs = c.crossJoin(F.broadcast(q))
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("nn_id"))
    exact = (
        pairs.select(
            "query_id", "nn_id", V.cosine("_cv", "_qv").alias("_cos")
        )
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 10)
        .select("query_id", "nn_id")
    )
    truncs = None
    for d in _MRL_DIMS:
        t = (
            pairs.select(
                "query_id",
                "nn_id",
                V.cosine(
                    F.slice("_cv", 1, d), F.slice("_qv", 1, d)
                ).alias("_cos"),
            )
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= 10)
            .select(F.lit(d).alias("trunc_dim"), "query_id", "nn_id")
        )
        truncs = t if truncs is None else truncs.unionAll(t)
    hits = truncs.join(exact, ["query_id", "nn_id"], "left_semi")
    grid = (
        exact.select("query_id")
        .distinct()
        .crossJoin(
            truncs.select("trunc_dim").distinct()
        )
    )
    return (
        grid.join(
            hits.groupBy("trunc_dim", "query_id").agg(
                F.count(F.lit(1)).alias("n_hit")
            ),
            ["trunc_dim", "query_id"],
            "left",
        )
        .select(
            "trunc_dim",
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / 10, 6
            ).alias("recall_at_10"),
        )
        .orderBy("trunc_dim", "query_id")
    )


@register(
    "dedup_winnowing_candidates",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks
      FROM documents),
    h AS (
      SELECT t.doc_id, r.i AS i,
             ('0x' || SUBSTR(MD5(ARRAY_TO_STRING(
                 t.toks[r.i : r.i + 3], ' ')), 1, 15))::BIGINT AS h
      FROM t, (SELECT UNNEST(RANGE(1, GREATEST(LEN(t.toks) - 4 + 2, 2)))
               AS i) r),
    m AS (
      SELECT doc_id, i,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS f,
             COUNT(*) OVER (PARTITION BY doc_id) AS nsh
      FROM h),
    fp AS (SELECT DISTINCT doc_id, f FROM m
           WHERE i <= GREATEST(nsh - 5 + 1, 1)),
    ok AS (SELECT f FROM fp GROUP BY f HAVING COUNT(*) <= 50),
    fpo AS (SELECT fp.doc_id, fp.f FROM fp JOIN ok USING (f))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_shared_fps
    FROM fpo a JOIN fpo b ON a.f = b.f AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY doc_a, doc_b
    """,
    doc="Winnowing near-dup candidates (Schleimer et al. 2003, the "
    "MOSS algorithm): min-hash-per-window fingerprint selection with "
    "the paper's guarantee (any shared run >= w+k-1 tokens shares a "
    "fingerprint, density 2/(w+1)) — the LOCAL-guarantee member of "
    "the dedup family next to MinHash's global Jaccard estimate. "
    "Pairs come from the inverted-index join with a stop-fingerprint "
    "document-frequency cap bounding the worst key; windows slide "
    "over a staged hash-array column so nothing re-evaluates "
    "per-element (k=4, w=5, >= 2 shared, df cap 50).",
    tags=("dedup",),
)
def dedup_winnowing_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.winnowing_candidates(
        _docs(spark, sf_dir), k=4, w=5, min_shared=2, max_fp_df=50
    ).orderBy("doc_a", "doc_b")


@register(
    "embedding_margin_bitext",
    oracle="""
    WITH a AS (
      SELECT e.vec_id AS x, e.embedding FROM embeddings e
      JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'en' AND e.vec_id < 64),
    b AS (
      SELECT e.vec_id AS y, e.embedding FROM embeddings e
      JOIN documents d ON d.doc_id = e.vec_id WHERE d.lang = 'de'),
    p AS (
      SELECT a.x, b.y,
             CAST(ROUND(ROUND(LIST_COSINE_SIMILARITY(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])), 6) * 1000000.0)
                  AS BIGINT) AS r
      FROM a, b),
    sx AS (
      SELECT x, SUM(r) AS sx FROM (
        SELECT x, r, ROW_NUMBER() OVER (PARTITION BY x
                                        ORDER BY r DESC, y) AS rn
        FROM p) WHERE rn <= 4 GROUP BY x),
    sy AS (
      SELECT y, SUM(r) AS sy FROM (
        SELECT y, r, ROW_NUMBER() OVER (PARTITION BY y
                                        ORDER BY r DESC, x) AS rn
        FROM p) WHERE rn <= 4 GROUP BY y),
    m AS (
      SELECT p.x, p.y, p.r,
             ROUND(8.0 * p.r / (sx.sx + sy.sy), 6) AS margin
      FROM p JOIN sx USING (x) JOIN sy USING (y)
      WHERE sx.sx + sy.sy > 0)
    SELECT x AS src_id, y AS tgt_id,
           ROUND(r / 1000000.0, 6) AS cosine, margin
    FROM m
    ORDER BY margin DESC, src_id, tgt_id
    LIMIT 20
    """,
    doc="Margin-based bitext mining (Artetxe & Schwenk 2019, the "
    "LASER/CCMatrix parallel-corpus miner): cross-lingual candidate "
    "pairs (en x de) scored by the RATIO margin — cosine over the "
    "mean of each side's 4-NN cosines — which cancels hubness that "
    "plain cosine thresholds cannot. Cosines scale to exact BIGINT "
    "1e-6 units, each k-NN sum is an exact integer (rank with id "
    "tie-break), margin is ONE float division of exact ints; top 20 "
    "by (margin, ids). At scale the candidate matrix composes with "
    "the ANN shortlist operators.",
    tags=("similarity", "ml"),
)
def embedding_margin_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.similarity import margin_bitext_mining

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    emb = _emb(spark, sf_dir)
    joined = emb.join(docs, emb.vec_id == docs.doc_id).select(
        F.col("vec_id").alias("id"), "embedding", "lang"
    )
    a = joined.filter(
        (F.col("lang") == "en") & (F.col("id") < 64)
    ).select("id", "embedding")
    b = joined.filter(F.col("lang") == "de").select("id", "embedding")
    return margin_bitext_mining(a, b, k=4, top=20)


@register(
    "corpus_datasheet",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks,
             TRIM(text) AS c,
             MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fp
      FROM documents),
    m AS (
      SELECT doc_id, lang, fp,
             LEN(toks) AS n,
             CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) AS uniq,
             CAST(LENGTH(REPLACE(c, ' ', '')) AS DOUBLE) AS nospace,
             LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS sum_len,
             LENGTH(c) - LENGTH(REPLACE(c, '#', '')) AS n_hash,
             (LENGTH(c) - LENGTH(REPLACE(c, '...', ''))) / 3 AS n_ell,
             LEN(LIST_FILTER(toks, x -> REGEXP_MATCHES(x, '[a-z]')))
               AS alpha_words,
             LEN(LIST_INTERSECT(LIST_DISTINCT(toks),
                 ['the','be','to','of','and','that','have','with']))
               AS stops
      FROM t),
    q AS (
      SELECT doc_id,
             ROUND(LEAST(n / 100.0, 1.0) * 0.4 + (uniq / n) * 0.4
                   + LEAST(nospace / n / 8.0, 1.0) * 0.2, 6) AS qs,
             ((n >= 50) AND (n <= 100000)
              AND (CAST(sum_len AS DOUBLE) / n >= 3.0)
              AND (CAST(sum_len AS DOUBLE) / n <= 10.0)
              AND (CAST(n_hash + n_ell AS DOUBLE) / n <= 0.1)
              AND (CAST(alpha_words AS DOUBLE) / n >= 0.8)
              AND (stops >= 2)) AS pg
      FROM m),
    agg AS (
      SELECT COUNT(*) AS n_docs,
             COUNT(DISTINCT m.fp) AS n_distinct_texts,
             SUM(CAST(q.pg AS BIGINT)) AS npg,
             SUM(CAST(m.n AS BIGINT)) AS n_tokens,
             SUM(CAST(ROUND(q.qs * 1000000.0) AS BIGINT)) AS qsu
      FROM m JOIN q USING (doc_id)),
    lc AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
    le AS (SELECT SUM(c) AS ln_total, COUNT(*) AS n_languages,
                  SUM(c * CAST(ROUND(1000000000.0 * LN(c)) AS BIGINT)) AS lu
           FROM lc)
    SELECT CAST(agg.n_docs AS BIGINT) AS n_docs,
           CAST(agg.n_tokens AS BIGINT) AS n_tokens,
           CAST(agg.n_distinct_texts AS BIGINT) AS n_distinct_texts,
           ROUND(CAST(agg.n_docs - agg.n_distinct_texts AS DOUBLE)
                 / agg.n_docs, 6) AS dup_doc_frac,
           CAST(le.n_languages AS BIGINT) AS n_languages,
           ROUND(LN(le.ln_total)
                 - (CAST(le.lu AS DOUBLE) / 1000000000.0) / le.ln_total,
                 6) AS lang_entropy_nats,
           ROUND(CAST(agg.qsu AS DOUBLE) / 1000000.0 / agg.n_docs, 6)
             AS mean_quality,
           ROUND(CAST(agg.npg AS DOUBLE) / agg.n_docs, 6)
             AS gopher_keep_rate
    FROM agg CROSS JOIN le
    """,
    doc="One-row corpus data card (Gebru et al. 2021 'Datasheets for "
    "Datasets', the quantitative half): size, exact-duplicate "
    "fraction, language-mix entropy (1e-9 integer-log lattice), mean "
    "heuristic quality (1e-6 lattice sums), and the Gopher A1.1 keep "
    "rate — the summary block a curation run publishes with its "
    "output. Two aggregations joined as 1-row broadcasts.",
    tags=("corpus", "quality"),
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import corpus_datasheet as _ds

    return _ds(_docs(spark, sf_dir))


@register(
    "corpus_fim_transform",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS toks,
             ('0x' || SUBSTR(MD5('42:' || CAST(doc_id AS VARCHAR) || ':0'),
                             1, 15))::BIGINT % 100 < 50 AS apply,
             ('0x' || SUBSTR(MD5('42:' || CAST(doc_id AS VARCHAR) || ':1'),
                             1, 15))::BIGINT AS u1,
             ('0x' || SUBSTR(MD5('42:' || CAST(doc_id AS VARCHAR) || ':2'),
                             1, 15))::BIGINT AS u2
      FROM documents),
    c AS (
      SELECT doc_id, text, toks, apply,
             LEAST(u1 % (LEN(toks) + 1), u2 % (LEN(toks) + 1)) AS i,
             GREATEST(u1 % (LEN(toks) + 1), u2 % (LEN(toks) + 1)) AS j,
             LEN(toks) AS n
      FROM t)
    SELECT doc_id, apply AS fim_applied,
           CASE WHEN apply THEN
             '<|fim_pre|>' || COALESCE(ARRAY_TO_STRING(toks[1 : i], ' '), '')
             || '<|fim_suf|>'
             || COALESCE(ARRAY_TO_STRING(toks[j + 1 : n], ' '), '')
             || '<|fim_mid|>'
             || COALESCE(ARRAY_TO_STRING(toks[i + 1 : j], ' '), '')
           ELSE text END AS fim_text
    FROM c
    ORDER BY doc_id
    """,
    doc="Fill-in-the-middle pretraining transform (Bavarian et al. "
    "2022): a deterministic 50% of documents split at two hash-drawn "
    "token cuts and emit the PSM reordering (prefix/suffix/middle "
    "with sentinels) that teaches a causal LM to infill; cuts come "
    "from md5(seed:doc:k) so the built corpus is reproducible and "
    "hash-checkable. Map-only - two md5s + array slices per row, no "
    "shuffle.",
    tags=("corpus", "ml"),
)
def corpus_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import fim_transform

    return fim_transform(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "corpus_moore_lewis",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, (lang = 'en') AS tg,
             STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS t
      FROM documents),
    pairs AS MATERIALIZED (
      SELECT doc_id, tg, t[gs.i] AS w1, t[gs.i + 1] AS w2
      FROM base, UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS gs(i)
      WHERE LEN(t) >= 2),
    cb AS (SELECT w1, w2, COUNT(*) AS cbr,
                  SUM(CASE WHEN tg THEN 1 ELSE 0 END) AS cbt
           FROM pairs GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1r,
                  SUM(CASE WHEN tg THEN 1 ELSE 0 END) AS c1t
           FROM pairs GROUP BY 1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vr,
             CAST(COUNT(DISTINCT CASE WHEN tg THEN tok END) AS DOUBLE)
               AS vt
      FROM (SELECT (lang = 'en') AS tg,
                   UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)),
                                             '\s+')) AS tok
            FROM documents)),
    scored AS (
      SELECT p.doc_id,
             CAST(ROUND(1000000000.0 * (
               LN((cb.cbt + 0.5) / (c1.c1t + 0.5 * vocab.vt))
               - LN((cb.cbr + 0.5) / (c1.c1r + 0.5 * vocab.vr))
             )) AS BIGINT) AS u
      FROM pairs p
      JOIN cb ON cb.w1 = p.w1 AND cb.w2 = p.w2
      JOIN c1 ON c1.w1 = p.w1
      CROSS JOIN vocab)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND((CAST(SUM(u) AS DOUBLE) / 1000000000.0) / COUNT(*), 6)
             AS ml_score
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Cross-entropy difference selection (Moore & Lewis 2010, the "
    "classic domain-data selector DSIR generalizes): per-bigram "
    "ln p_target - ln p_corpus under two add-k bigram LMs, each "
    "difference rounded to the 1e-9 lattice before an exact BIGINT "
    "per-doc sum (hiding last-ulp libm divergence), one division at "
    "the end. One shared bigram explode feeds both LMs and the "
    "scoring join; the target slice rides the same shuffle.",
    tags=("corpus", "quality"),
)
def corpus_moore_lewis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import moore_lewis_score

    docs = _docs(spark, sf_dir).withColumn(
        "is_target", F.col("lang") == "en"
    )
    return moore_lewis_score(docs).orderBy("doc_id")


_TP_INNER = __import__(
    "robosystems_spark.operators.bpe", fromlist=["bpe_oracle_sql"]
).bpe_oracle_sql(n_merges=8, mode="token_counts")


@register(
    "tokenizer_parity_by_lang",
    oracle=f"""
    WITH tc AS MATERIALIZED (
      {_TP_INNER}
    ),
    j AS (
      SELECT d.lang, LENGTH(TRIM(d.text)) AS ch, tc.n_bpe_tokens AS tk
      FROM tc JOIN documents d USING (doc_id)),
    l AS (
      SELECT lang, CAST(SUM(ch) AS BIGINT) AS chars,
             CAST(SUM(tk) AS BIGINT) AS toks
      FROM j GROUP BY 1),
    e AS (SELECT chars AS ce, toks AS te FROM l WHERE lang = 'en')
    SELECT lang,
           chars AS n_chars,
           toks AS n_bpe_tokens,
           ROUND(CAST(chars AS DOUBLE) / toks, 6) AS chars_per_token,
           ROUND((CAST(chars AS DOUBLE) / toks)
                 / (CAST(ce AS DOUBLE) / te), 6) AS parity_vs_en
    FROM l CROSS JOIN e
    ORDER BY lang
    """,
    doc="Tokenizer parity across languages (Petrov et al. 2023, "
    "'Language Model Tokenizers Introduce Unfairness Between "
    "Languages'): chars-per-BPE-token per language and its ratio to "
    "the English baseline — a language tokenized into more pieces "
    "pays proportionally more compute and context window. Composes "
    "the trained-BPE token counts (the unrolled-merge oracle rides "
    "inside as a CTE); per-language ratios are single float "
    "divisions of exact BIGINT sums.",
    tags=("text", "tokenizer", "eval"),
)
def tokenizer_parity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.bpe import bpe_token_counts as _tc

    docs = _docs(spark, sf_dir)
    tc = _tc(docs, n_merges=8)
    d = docs.select(
        "doc_id", "lang", F.length(F.trim(F.col("text"))).alias("_ch")
    )
    lang = (
        tc.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("_ch").cast("long").alias("n_chars"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )
    en = lang.filter(F.col("lang") == "en").select(
        F.col("n_chars").alias("_ce"), F.col("n_bpe_tokens").alias("_te")
    )
    cpt = F.col("n_chars").cast("double") / F.col("n_bpe_tokens")
    ecpt = F.col("_ce").cast("double") / F.col("_te")
    return (
        lang.crossJoin(F.broadcast(en))
        .select(
            "lang",
            "n_chars",
            "n_bpe_tokens",
            F.round(cpt, 6).alias("chars_per_token"),
            F.round(cpt / ecpt, 6).alias("parity_vs_en"),
        )
        .orderBy("lang")
    )


@register(
    "corpus_padding_waste",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS n_tok
      FROM documents),
    a AS (
      SELECT n_tok,
             (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 8 AS b
      FROM t),
    ab AS (SELECT b, COUNT(*) AS r, MAX(n_tok) AS mx, SUM(n_tok) AS s
           FROM a GROUP BY b),
    s AS (
      SELECT n_tok,
             (ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) - 1) // 8 AS b
      FROM t),
    sb AS (SELECT b, COUNT(*) AS r, MAX(n_tok) AS mx, SUM(n_tok) AS s
           FROM s GROUP BY b),
    u AS (
      SELECT 'arrival' AS strategy,
             CAST(SUM(s) AS BIGINT) AS n_tokens,
             CAST(SUM(r * mx - s) AS BIGINT) AS n_pad_slots
      FROM ab
      UNION ALL
      SELECT 'sorted',
             CAST(SUM(s) AS BIGINT),
             CAST(SUM(r * mx - s) AS BIGINT)
      FROM sb)
    SELECT strategy, n_tokens, n_pad_slots,
           ROUND(CAST(n_pad_slots AS DOUBLE)
                 / (n_tokens + n_pad_slots), 6) AS pad_frac
    FROM u
    ORDER BY strategy
    """,
    doc="Padding-waste accounting for fixed-size training batches: "
    "arrival-order vs length-sorted ('smart') batching, each padding "
    "every sequence to its batch max — the FLOPs-on-pad-tokens "
    "fraction that justifies length bucketing in every training "
    "loader. All-integer batch assignment over total orders; one "
    "division per row.",
    tags=("corpus",),
)
def corpus_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.corpus import padding_waste

    return padding_waste(_docs(spark, sf_dir), batch_size=8).orderBy(
        "strategy"
    )


_CL_INNER = __import__(
    "robosystems_spark.operators.classifier",
    fromlist=["quality_lr_oracle_sql"],
).quality_lr_oracle_sql(iters=6, lr=20.0)


@register(
    "quality_label_noise",
    oracle=f"""
    SELECT doc_id, y, p_quality, suspected_label FROM (
      SELECT s.doc_id, s.y, s.p_quality,
             CASE WHEN s.y = 0 AND s.p_quality >= t1.v THEN 1
                  WHEN s.y = 1 AND 1.0 - s.p_quality >= t0.v THEN 0
             END AS suspected_label
      FROM ({_CL_INNER}) s
      CROSS JOIN (
        SELECT CAST(SUM(CAST(ROUND(p_quality * 1000000.0) AS BIGINT))
                    AS DOUBLE) / 1000000.0 / COUNT(*) AS v
        FROM ({_CL_INNER}) WHERE y = 1) t1
      CROSS JOIN (
        SELECT 1.0 - CAST(SUM(CAST(ROUND(p_quality * 1000000.0) AS BIGINT))
                          AS DOUBLE) / 1000000.0 / COUNT(*) AS v
        FROM ({_CL_INNER}) WHERE y = 0) t0
    ) WHERE suspected_label IS NOT NULL
    ORDER BY doc_id
    """,
    doc="Confident-learning label-noise detection (Northcutt et al. "
    "2021, the cleanlab rule) over the distilled quality classifier: "
    "flag documents whose predicted probability for the OTHER class "
    "reaches that class's self-confidence threshold (its mean "
    "predicted probability) - the audit a pipeline runs on its "
    "heuristic teacher before retraining on its labels. Thresholds "
    "are 1e-6-lattice means of the engine-identical scores, so the "
    "flag boundary is engine-stable.",
    tags=("text", "classifier", "eval"),
)
def quality_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from robosystems_spark.operators.classifier import label_noise_candidates

    return label_noise_candidates(_docs(spark, sf_dir), iters=6, lr=20.0)
