"""Corpus-curation operators: the end-to-end steps a pretraining data
pipeline runs over a raw document pool.

Complements operators/text.py (per-doc signals) and operators/dedup.py
(pairwise dedup) with the CORPUS-level decisions built from them:

- ``filter_funnel``       — staged keep/drop counts (language → length
                            → quality → first-of-duplicate), the
                            standard corpus-cleaning report
- ``representative_docs`` — canonical document per exact-duplicate
                            cluster (longest text, then smallest id)
- ``decontaminate``       — n-gram overlap between the train pool and
                            a small held-out/benchmark set
- ``repetition_stats``    — within-document repetition signals
                            (top-bigram fraction), the Gopher-style
                            repetition filter input

Scale notes (100 TB):
- Everything is column expressions + one keyed shuffle per operator;
  no Python UDFs, no driver loops.
- ``decontaminate`` deliberately builds the n-gram set of the SMALL
  side (the benchmark suite) and broadcast-joins it against the train
  pool's exploded n-grams: the 100 TB side is never shuffled, only
  scanned, filtered map-side, and aggregated on matching doc ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from robosystems_spark.checkpointing import materialize

from robosystems_spark.operators.dedup import shingles_of
from robosystems_spark.operators.text import tokens


def _fingerprint(text_col: str):
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.md5(normalized.cast("binary"))


def filter_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    group_col: str = "source",
    keep_lang: str = "en",
    min_tokens: int = 20,
    max_tokens: int = 1000,
    min_quality: float = 0.55,
) -> DataFrame:
    """Per-``group_col`` staged keep counts for the standard cleaning
    funnel: total → declared-language → token-length window → quality
    score → first occurrence of each exact-duplicate fingerprint.

    Stages are cumulative (a doc is counted at stage N only if it
    passed stages 1..N-1), which is how curation reports read.
    One window (fingerprint) + one groupBy — two shuffles total.
    """
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    avg_len = F.length(F.translate(F.trim(F.col(text_col)), " ", "")).cast("double") / n
    quality = F.round(
        F.least(n / 100.0, F.lit(1.0)) * 0.4
        + (uniq / n) * 0.4
        + F.least(avg_len / 8.0, F.lit(1.0)) * 0.2,
        6,
    )
    staged = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col),
        (F.col(lang_col) == keep_lang).alias("s_lang"),
        F.size(toks).alias("_n_toks"),
        quality.alias("_q"),
        _fingerprint(text_col).alias("_fp"),
    ).withColumn(
        "s_len",
        F.col("s_lang") & F.col("_n_toks").between(min_tokens, max_tokens),
    )
    staged = staged.withColumn("s_quality", F.col("s_len") & (F.col("_q") >= min_quality))
    # first-of-fingerprint among quality survivors only: rank by doc id
    # within (fingerprint, survived) so dropped docs never block a kept one
    w = Window.partitionBy("_fp", "s_quality").orderBy(F.col(id_col))
    staged = staged.withColumn(
        "s_kept", F.col("s_quality") & (F.row_number().over(w) == 1)
    )
    return (
        staged.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if("s_lang").alias("n_lang"),
            F.count_if("s_len").alias("n_len"),
            F.count_if("s_quality").alias("n_quality"),
            F.count_if("s_kept").alias("n_kept"),
        )
    )


def representative_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical document per exact-duplicate cluster.

    dedup.exact_duplicates keeps ``min(doc_id)``; curation pipelines
    instead keep the BEST copy — here: longest trimmed text, ties by
    smallest id (a total order, so engine-independent).  Returns one
    row per cluster: (fingerprint, rep_doc_id, n_docs).
    """
    w = Window.partitionBy("_fp").orderBy(
        F.col("_len").desc(), F.col(id_col).asc()
    )
    return (
        df.select(
            F.col(id_col),
            _fingerprint(text_col).alias("_fp"),
            F.length(F.trim(F.col(text_col))).alias("_len"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .groupBy(F.col("_fp").alias("fingerprint"))
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col(id_col))).alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def decontaminate(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Benchmark decontamination: train documents sharing at least one
    ``ngram``-token shingle with any holdout document, with the count
    of distinct shared shingles per contaminated train doc.

    The holdout n-gram set is the SMALL side (a benchmark suite, not
    the corpus): it is deduplicated and broadcast, so the train side —
    the 100 TB side — is never shuffled for the join; only matching
    (doc, shingle) rows reach the final per-doc aggregation.
    """
    def grams(d: DataFrame) -> DataFrame:
        return (
            d.select(F.col(id_col), tokens(text_col).alias("_toks"))
            .select(
                F.col(id_col),
                F.explode(F.array_distinct(shingles_of("_toks", ngram))).alias("_g"),
            )
        )

    holdout_grams = F.broadcast(grams(holdout).select("_g").distinct())
    return (
        grams(train)
        .join(holdout_grams, "_g")
        .groupBy(id_col)
        .agg(F.count_distinct("_g").alias("n_shared_ngrams"))
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repetition: the fraction of bigram occurrences
    taken by the single most frequent bigram (degenerate/boilerplate
    text scores high).  explode + two-level aggregate — codegen'd,
    shuffle keyed by (doc, bigram) then doc."""
    grams = (
        df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        .select(F.col(id_col), F.explode(shingles_of("_toks", 2)).alias("_g"))
    )
    per_gram = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("_c").alias("n_bigrams"),
        F.max("_c").alias("top_bigram_count"),
        F.round(F.max("_c").cast("double") / F.sum("_c"), 6).alias("top_bigram_frac"),
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Greedy sequence packing: assign documents (in ``id_col`` order,
    within each ``group_col`` partition) to fixed-capacity training
    sequences — the batch-construction step of a pretraining pipeline.

    Greedy rule: keep a running token fill; when the next document
    would exceed ``capacity``, close the sequence and start a new one
    with that document (a document longer than ``capacity`` therefore
    occupies a sequence of its own).  This is inherently sequential
    PER GROUP, so the group is the parallelism unit: token counting is
    a JVM column expression, and only the tiny (group, id, n_tokens)
    projection reaches the per-group pandas loop — never the text.

    100 TB note: groups must be bounded for the in-group scan to fit;
    pre-bucket huge sources (e.g. group on
    ``concat(source, '#', xxhash64(doc_id) % B)``) — packing quality
    is per-bucket, which is what distributed trainers do anyway.
    """
    import pandas as pd  # noqa: F401 — applyInPandas batch type

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    base = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    )
    # id keeps the caller's dtype (long TPC-H keys, string ULIDs, ...)
    id_type = base.schema[id_col].dataType
    schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField(id_col, id_type),
            StructField("n_tokens", LongType()),
            StructField("seq_idx", LongType()),
        ]
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seq, fill = 0, 0
        out = []
        for i, n in enumerate(pdf["n_tokens"]):
            if i == 0:
                fill = n
            elif fill + n > capacity:
                seq += 1
                fill = n
            else:
                fill += n
            out.append(seq)
        pdf["seq_idx"] = out
        return pdf

    return base.groupBy(group_col).applyInPandas(_pack, schema)


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-``k`` ``n``-grams by occurrence count — the
    vocabulary/merge-table precursor of tokenizer training.

    explode -> count (map-side partial agg does the heavy lifting:
    only distinct grams shuffle) -> global top-k with a deterministic
    (count desc, gram asc) total order, which Spark executes as
    TakeOrderedAndProject — no full sort of the vocabulary.
    """
    grams = (
        df.select(tokens(text_col).alias("_toks"))
        .select(F.explode(shingles_of("_toks", n)).alias("gram"))
    )
    counted = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return counted.orderBy(F.desc("n_occurrences"), F.asc("gram")).limit(k)


def weighted_mixture(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 0.0,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-mixture assembly: sample/upsample each source to its
    mixture weight — the per-domain rate table every pretraining run
    starts from (e.g. Wikipedia x2.5, CommonCrawl x0.3).

    A weight w means each of the source's documents contributes
    floor(w) full copies plus one extra with probability frac(w),
    decided by a DETERMINISTIC per-document draw: the first 8 hex
    chars of md5(id) read as a fraction of [0, 1).  Same corpus +
    same weights = the same mixture in any engine with md5 — resumable
    and auditable, unlike rand()-based sampling.

    Returns (id, source, copy) with copy = 1..n_copies; sources
    absent from ``weights`` use ``default_weight``.

    Scale shape: pure codegen projections — the weight table compiles
    to a literal CASE chain (mixtures name tens of sources, not
    millions), the draw is one md5 per row, and the copy explosion
    emits only kept rows.  No shuffle at all: mixture runs map-side
    over a 100 TB scan and unions into the training manifest.
    """
    import math

    from robosystems_spark.operators.sampling import _hex_threshold

    def parts(w: float) -> tuple[int, str]:
        if w < 0:
            raise ValueError(f"negative mixture weight {w}")
        full = int(math.floor(w))
        return full, _hex_threshold(w - full)

    d_full, d_thr = parts(default_weight)
    full_expr = F.lit(d_full)
    thr_expr = F.lit(d_thr)
    for src, w in weights.items():
        s_full, s_thr = parts(w)
        cond = F.col(source_col) == src
        full_expr = F.when(cond, F.lit(s_full)).otherwise(full_expr)
        thr_expr = F.when(cond, F.lit(s_thr)).otherwise(thr_expr)

    draw = F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8)
    n_copies = (full_expr + (draw < thr_expr).cast("int")).alias("n_copies")
    return (
        df.select(F.col(id_col), F.col(source_col), n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            id_col,
            source_col,
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"), F.col("n_copies").cast("long")
                )
            ).alias("copy"),
        )
    )


def vocab_prune(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 0.5,
    min_df: int = 2,
) -> DataFrame:
    """Vocabulary pruning: rebuild each document keeping only tokens
    whose document frequency is inside [min_df, max_df_frac * corpus]
    — the min_df/max_df featurization step every bag-of-words or
    TF-IDF pipeline runs (too-common tokens carry no signal,
    too-rare ones bloat the vocabulary).

    Returns (id, kept_text, n_kept, n_removed); kept tokens preserve
    their original order.

    Scale shape: token df is one groupBy over the exploded corpus,
    then a semi-join of the exploded tokens against the in-band vocab
    (left to AQE — neither side is reliably small at web scale: the
    frequent band is short but the rare tail is the bulk of a raw
    vocabulary) and a posexplode-order re-aggregation; all codegen,
    no UDFs, two keyed shuffles total.
    """
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("_pos", "_t")
    )
    n_docs = df.count()  # one scalar to the driver, like tf-idf's total
    dfreq = toks.groupBy("_t").agg(F.countDistinct(id_col).alias("_df"))
    keep = dfreq.filter(
        (F.col("_df") >= min_df) & (F.col("_df") <= int(max_df_frac * n_docs))
    )
    kept = toks.join(keep.select("_t"), "_t", "left_semi")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_t")))
                    ),
                    lambda s: s["_t"],
                ),
                " ",
            ).alias("kept_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    totals = df.select(
        F.col(id_col), F.size(tokens(text_col)).alias("_n_total")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("_n_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def bigram_pmi(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 6,
) -> DataFrame:
    """Collocation extraction: top-k bigrams by pointwise mutual
    information, pmi = ln(c(w1,w2)·N / (c(w1)·c(w2))) over corpus
    token counts, restricted to bigrams with count >= ``min_count``
    (rare pairs otherwise dominate PMI) — the phrase-mining signal
    feeding tokenizer vocabularies and stop-phrase lists.

    One bigram explode, unigram/bigram count aggregations with
    map-side partials, count-table joins keyed by the word, broadcast
    1-row total, deterministic TakeOrdered top-k.
    """
    from robosystems_spark.operators.text import tokens

    toks = tokens(text_col)
    base = df.select(toks.alias("_t")).filter(F.size("_t") >= 2)
    pairs = base.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1), i -> "
                "struct(_t[i - 1] AS w1, _t[i] AS w2))"
            )
        ).alias("_p")
    ).select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    # Checkpoint BEFORE fanning out to four consumers (joint, both
    # marginals, total): Catalyst re-inlines the scan + tokenize +
    # explode per consumer otherwise — one materialization beats four
    # corpus passes (the PPJoin re-inlining lesson).
    pairs = pairs.transform(materialize)
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    # Unigram counts over the SAME bigram-position universe so the
    # marginals and the joint live on one sample space.
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    c2 = pairs.groupBy("w2").agg(F.count(F.lit(1)).alias("_c2"))
    n = pairs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    pmi = F.log(
        F.col("_cb") * F.col("_n") / (F.col("_c1") * F.col("_c2"))
    )
    return (
        cb.filter(F.col("_cb") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("_cb").alias("pair_count"),
            F.round(pmi, decimals).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def item_cooccurrence_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_cooc: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Item-item collaborative filtering from co-occurrence baskets:
    cosine(i, j) = cooc(i, j) / sqrt(cnt(i) * cnt(j)) over distinct
    (basket, item) pairs, top-``k`` neighbors per item — the classic
    memory-based recommender primitive (Amazon item-to-item CF).

    Scale shape: the pair generation is a self-join keyed by the
    basket id, so work is sum(basket_size^2) — bounded by basket
    size, never |items|^2; ``min_cooc`` prunes noise pairs before the
    per-item top-k window.  Everything is counts and one window — no
    vectors materialized.
    """
    from pyspark.sql.window import Window

    # Checkpoint BEFORE the three-consumer fan-out (item counts + both
    # sides of the basket self-join): Catalyst re-inlines the distinct
    # over the source per consumer (the PPJoin re-inlining lesson).
    b = (
        baskets.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .dropDuplicates()
        .transform(materialize)
    )
    # item-count frame is consumed twice (ci/cj) — it is item-sized,
    # so materializing beats re-running its shuffle per consumer
    cnt = (
        b.groupBy("_i")
        .agg(F.count(F.lit(1)).alias("_c"))
        .transform(materialize)
    )
    x, y = b.alias("x"), b.alias("y")
    cooc = (
        x.join(
            y,
            (F.col("x._b") == F.col("y._b"))
            & (F.col("x._i") != F.col("y._i")),
        )
        .groupBy(
            F.col("x._i").alias("item"), F.col("y._i").alias("neighbor")
        )
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
    )
    ci = cnt.select(F.col("_i").alias("item"), F.col("_c").alias("_ci"))
    cj = cnt.select(
        F.col("_i").alias("neighbor"), F.col("_c").alias("_cj")
    )
    sim = F.round(
        F.col("cooc") / F.sqrt(F.col("_ci") * F.col("_cj")), decimals
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("score"), F.asc("neighbor")
    )
    return (
        cooc.join(ci, "item")
        .join(cj, "neighbor")
        .select("item", "neighbor", "cooc", sim.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("item", "rank", "neighbor", "cooc", "score")
    )


def item_cooccurrence_oracle_sql(
    table: str,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_cooc: int = 2,
    decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical item-item neighbor table."""
    return f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT {basket_col} AS bk, {item_col} AS it FROM {table}
    ),
    cnt AS (SELECT it, COUNT(*) AS c FROM b GROUP BY it),
    cooc AS (
      SELECT x.it AS item, y.it AS neighbor, COUNT(*) AS cooc
      FROM b x JOIN b y ON x.bk = y.bk AND x.it <> y.it
      GROUP BY 1, 2 HAVING COUNT(*) >= {min_cooc}
    ),
    scored AS (
      SELECT cooc.item, cooc.neighbor, cooc.cooc,
             ROUND(cooc.cooc / SQRT(ci.c * cj.c), {decimals}) AS score
      FROM cooc
      JOIN cnt ci ON ci.it = cooc.item
      JOIN cnt cj ON cj.it = cooc.neighbor
    )
    SELECT item, CAST(rank AS INT) AS rank, neighbor, cooc, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY item
                                   ORDER BY score DESC, neighbor ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def ppmi_word_similarity(
    df: DataFrame,
    k: int = 50,
    min_count: int = 50,
    text_col: str = "text",
    scale: int = 10_000,
    decimals: int = 6,
    max_context_degree: int = 100_000,
    max_vocab: int = 10_000,
    resident_max: int | None = None,
) -> DataFrame:
    """Count-based word embeddings: symmetric +/-2 skip-gram
    co-occurrence -> PPMI matrix -> top-k most-similar word pairs by
    cosine over the sparse PPMI rows (Levy & Goldberg 2014: PPMI+SVD
    factorizes the same signal word2vec fits — the SVD is optional,
    the similarity structure lives in the PPMI rows themselves).

    ``max_context_degree`` bounds the sparse-matmul self-join's worst
    key: a context column appearing in more than that many PPMI rows
    (a stop-word that survives min_count) would contribute O(deg^2)
    join pairs at corpus scale.  Hot contexts are dropped from BOTH
    the dot products and the norms (the matrix itself is truncated,
    so cosines stay <= 1 and the oracle mirrors the same rule).
    Standard practice for count-based embeddings — near-ubiquitous
    contexts carry ~zero PPMI signal anyway.

    ``max_vocab`` bounds the OTHER axis (the sf10 decade run's
    lesson): the sparse matmul costs sum-over-contexts deg(c)^2, and
    deg grows with VOCABULARY, which grows with the corpus (Heaps'
    law; min_count alone does not bound it — measured 1.2/decade
    super-linear at sf10 when clone-marker vocab grew 240x).  Keeping
    only the ``max_vocab`` most frequent words (count desc, word asc —
    deterministic) bounds the matmul at V^2 regardless of corpus size,
    the standard count-based-embedding discipline (Levy & Goldberg
    train on a frequency-capped vocabulary).  Marginals and N are
    still computed over the FULL pair stream, so surviving PPMI
    values are unchanged by the cap.

    Plan: context pairs are generated MAP-SIDE with array transforms
    (offset-1 and offset-2 struct sequences, symmetrized) — no window
    shuffle, no self-join on positions; counts are two hash
    aggregations; the cosine is the classic sparse matmul (self-join
    on the context dimension, bounded by the min_count vocabulary
    filter); top-k is one TakeOrdered.

    PORTABILITY: PPMI weights are integer-scaled at source
    (``ROUND(max(0, ln(cwc*N/(cw*cc))) * scale)``), so dot products
    and norms are EXACT integer sums; the final cosine divides by
    sqrt of each norm separately (never norm1*norm2 — that product
    can overflow int64) in IEEE-exact double ops.

    r13 resident tier (the dedup-pair discipline,
    ``operators/resident_text.py``): under the measured corpus gates
    the whole pipeline runs as one bounded Arrow collect + numpy —
    identical skip-gram multiset, integer-lattice PPMI with a
    1e-5-of-boundary ln() guard (bails distributed when any scaled
    weight sits closer to a HALF_UP boundary than cross-library libm
    divergence could move it), exact integer dots/norms, IEEE cosine.
    Distributed plan unchanged above any gate; forced-gate parity in
    tests/test_resident_tiers.py."""
    from robosystems_spark.operators.text import tokens

    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(df, text_col, id_col=None, max_docs=resident_max)
    if got is not None:
        pdf = RT.ppmi_resident(
            got[1], k, min_count, scale, decimals,
            max_context_degree, max_vocab,
        )
        if pdf is not None:
            from pyspark.sql import types as _T

            schema = _T.StructType(
                [
                    _T.StructField("w1", _T.StringType(), True),
                    _T.StructField("w2", _T.StringType(), True),
                    _T.StructField("cosine", _T.DoubleType(), True),
                ]
            )
            return df.sparkSession.createDataFrame(pdf, schema=schema)

    base = df.select(tokens(text_col).alias("_t"))

    def _dir(o: int) -> DataFrame:
        # symmetrized MAP-SIDE: each position pair emits (a,b) AND
        # (b,a) from the same transform (r12) — the former
        # checkpoint-then-union-both-directions shape re-read a
        # materialized frame twice and paid an extra eager job; one
        # expression now produces the identical pair multiset in a
        # single pass.
        return (
            base.filter(F.size("_t") > o)
            .select(
                F.explode(
                    F.expr(
                        f"flatten(transform(sequence({o}, size(_t) - 1), "
                        f"i -> array(struct(_t[i - {o}] AS a, _t[i] AS b), "
                        f"struct(_t[i] AS a, _t[i - {o}] AS b))))"
                    )
                ).alias("_p")
            )
            .select(F.col("_p.a").alias("_w"), F.col("_p.b").alias("_c"))
        )

    pairs = _dir(1).unionAll(_dir(2))

    # ONE aggregation pass over the pair stream (r12): the joint
    # (word, context) counts are the finest granularity — the word
    # marginals and the total are exact integer roll-ups of it, so
    # the pair stream is scanned/shuffled once and the marginal/total
    # consumers read the much smaller materialized joint frame
    # (guide §2.3: aggregate before you shuffle; previously the
    # checkpointed pair stream fed three separate consumers).
    joint = (
        pairs.groupBy("_w", "_c")
        .agg(F.count(F.lit(1)).alias("cwc"))
        .transform(materialize)
    )
    cnt = (
        joint.groupBy("_w")
        .agg(F.sum("cwc").alias("cw"))
        .transform(materialize)
    )
    if max_vocab is not None:
        from pyspark.sql.window import Window as _W

        cnt = (
            cnt.withColumn(
                "_vr",
                F.row_number().over(
                    _W.orderBy(F.desc("cw"), F.asc("_w"))
                ),
            )
            .filter(F.col("_vr") <= max_vocab)
            .drop("_vr")
        )
    n = joint.agg(F.sum("cwc").cast("double").alias("_n"))
    ppmi = (
        joint.join(cnt.select(F.col("_w"), F.col("cw").alias("cw1")), "_w")
        .join(
            cnt.select(F.col("_w").alias("_c"), F.col("cw").alias("cw2")),
            "_c",
        )
        .filter((F.col("cw1") >= min_count) & (F.col("cw2") >= min_count))
        .crossJoin(F.broadcast(n))
        .select(
            "_w",
            "_c",
            F.round(
                F.greatest(
                    F.log(
                        F.col("cwc") * F.col("_n")
                        / (F.col("cw1") * F.col("cw2"))
                    ),
                    F.lit(0.0),
                )
                * scale
            )
            .cast("long")
            .alias("p_i"),
        )
        .filter(F.col("p_i") > 0)
    )
    # hot-context cap via ONE window pass (r12): count(*) over
    # partitionBy(_c) computes the same per-context degree the
    # census groupBy did, inside the same exchange the filter needs —
    # the former census + left-semi-join shape paid an extra
    # checkpoint of the pre-truncation matrix plus a join (guide
    # §2.4: two operations keyed the same way share one exchange).
    from pyspark.sql.window import Window as _W2

    ppmi = ppmi.withColumn(
        "_deg", F.count(F.lit(1)).over(_W2.partitionBy("_c"))
    ).filter(F.col("_deg") <= max_context_degree).drop("_deg")
    # Checkpoint: the truncated matrix fans out to the norm
    # aggregation and BOTH sides of the sparse-matmul self-join.
    ppmi = ppmi.transform(materialize)
    # vocab-sized norm frame joins twice (n2a/n2b) — materialize once
    norms = (
        ppmi.groupBy("_w")
        .agg(F.sum(F.col("p_i") * F.col("p_i")).alias("n2"))
        .transform(materialize)
    )
    left = ppmi.select(
        F.col("_w").alias("w1"), F.col("_c").alias("_cc"), F.col("p_i").alias("pa")
    )
    right = ppmi.select(
        F.col("_w").alias("w2"), F.col("_c").alias("_cc"), F.col("p_i").alias("pb")
    )
    dots = (
        left.join(right, "_cc")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.sum(F.col("pa") * F.col("pb")).alias("dot"))
    )
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double"))
    )
    return (
        dots.join(norms.select(F.col("_w").alias("w1"), F.col("n2").alias("n2a")), "w1")
        .join(norms.select(F.col("_w").alias("w2"), F.col("n2").alias("n2b")), "w2")
        .select("w1", "w2", F.round(cosine, decimals).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def ppmi_word_similarity_oracle_sql(
    table: str = "documents",
    k: int = 50,
    min_count: int = 50,
    text_col: str = "text",
    scale: int = 10_000,
    decimals: int = 6,
    max_context_degree: int = 100_000,
    max_vocab: int = 10_000,
) -> str:
    """DuckDB SQL computing the identical PPMI cosine top-k (ordered
    adjacency joins reproduce the map-side pair generation's counts)."""
    return f"""
    WITH toks AS (
      SELECT ROW_NUMBER() OVER () AS d,
             string_split_regex(LOWER(TRIM({text_col})), '\\s+') AS t
      FROM {table}
    ),
    pos AS (
      -- parallel unnests zip element-wise: (element, 1-based position)
      SELECT d, UNNEST(range(1, len(t) + 1)) AS p, UNNEST(t) AS w
      FROM toks
    ),
    raw AS (
      SELECT a.w AS wa, b.w AS wb
      FROM pos a JOIN pos b ON b.d = a.d AND b.p = a.p + 1
      UNION ALL
      SELECT a.w, b.w
      FROM pos a JOIN pos b ON b.d = a.d AND b.p = a.p + 2
    ),
    pairs AS (
      SELECT wa AS w, wb AS c FROM raw
      UNION ALL
      SELECT wb, wa FROM raw
    ),
    cnt AS (
      SELECT w, cw FROM (
        SELECT w, COUNT(*) AS cw,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS vr
        FROM pairs GROUP BY w
      ) WHERE vr <= {max_vocab}
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pairs),
    joint AS (SELECT w, c, COUNT(*) AS cwc FROM pairs GROUP BY w, c),
    ppmi AS (
      SELECT j.w, j.c,
             CAST(ROUND(GREATEST(
                    LN(j.cwc * (SELECT n FROM n) / (c1.cw * c2.cw)), 0.0)
                  * {scale}) AS BIGINT) AS p_i
      FROM joint j
      JOIN cnt c1 ON c1.w = j.w
      JOIN cnt c2 ON c2.w = j.c
      WHERE c1.cw >= {min_count} AND c2.cw >= {min_count}
    ),
    sp0 AS (SELECT * FROM ppmi WHERE p_i > 0),
    -- hot-context cap, mirroring the engine's truncated matrix
    ctx_ok AS (
      SELECT c FROM sp0 GROUP BY c HAVING COUNT(*) <= {max_context_degree}
    ),
    sp AS (SELECT * FROM sp0 SEMI JOIN ctx_ok USING (c)),
    norms AS (SELECT w, SUM(p_i * p_i) AS n2 FROM sp GROUP BY w),
    dots AS (
      SELECT x.w AS w1, y.w AS w2, SUM(x.p_i * y.p_i) AS dot
      FROM sp x JOIN sp y ON y.c = x.c AND x.w < y.w
      GROUP BY x.w, y.w
    )
    SELECT d.w1, d.w2,
           ROUND(CAST(d.dot AS DOUBLE)
                 / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))),
                 {decimals}) AS cosine
    FROM dots d
    JOIN norms na ON na.w = d.w1
    JOIN norms nb ON nb.w = d.w2
    ORDER BY cosine DESC, w1, w2
    LIMIT {k}
    """


def dsir_importance(
    docs: DataFrame,
    target_col: str = "is_target",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    decimals: int = 6,
    resident_max: int | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram features are —
    ``log w(x) = Σ_f c_x(f) · ln( p̂_target(f) / p̂_raw(f) )`` with
    Laplace-smoothed hashed-unigram+bigram bag models.  Selection is
    then top-k by weight (the paper adds Gumbel noise for sampled
    resampling; the deterministic top-k is the hash-checkable
    variant — callers wanting the sampled flavor add Gumbel keys on
    top of ``log_importance``).

    Cross-engine exactness (the KL/AA lattice discipline): features
    hash via the first 15 md5 hex chars (bit-identical in any engine,
    unlike engine hashes) mod ``buckets``; every ln runs on an
    INTEGER (count+1, N+B) and is rounded to the 1e-9 lattice, so the
    per-document sum is exact BIGINT arithmetic — one float division
    at the end, then one ROUND.

    Scale shape: one tokenize+explode pass builds (doc, bucket,
    count); bucket statistics are at most ``buckets`` rows →
    broadcast back; the raw pool is scanned once and shuffled once
    (by doc for the final sum).  The target indicator is just a
    boolean column, so "target" can be a tiny curated slice of the
    same table — the 100 TB side never joins anything bigger than
    the bucket table.

    Returns (id, n_features, log_importance), one row per document
    with at least one feature.

    r13 resident tier (see ``ppmi_word_similarity``): measured corpus
    gates + a BooleanType target column; numpy twin of the exact
    lattice arithmetic with the 1e-5 ln() boundary guard; distributed
    plan unchanged above any gate.
    """
    from pyspark.sql import types as _T

    from robosystems_spark.operators import resident_text as RT

    if isinstance(docs.schema[target_col].dataType, _T.BooleanType):
        got = RT.collect_corpus(
            docs, text_col, id_col, max_docs=resident_max,
            extra_cols=(target_col,),
        )
        if got is not None:
            pdf = RT.dsir_resident(
                got[0], got[1], got[3][target_col], buckets, decimals
            )
            if pdf is not None:
                schema = _T.StructType(
                    [
                        _T.StructField(
                            id_col, docs.schema[id_col].dataType, True
                        ),
                        _T.StructField("n_features", _T.LongType(), True),
                        _T.StructField(
                            "log_importance", _T.DoubleType(), True
                        ),
                    ]
                )
                return docs.sparkSession.createDataFrame(
                    pdf.rename(columns={"_id": id_col}), schema=schema
                )

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.col(target_col).cast("boolean").alias("_t"),
        tokens(text_col).alias("_toks"),
    )
    # Small-scan parallelism rescue (metadata-only decision, no job):
    # the explode+md5 map work below parallelizes by input split, so a
    # table smaller than one split would run single-task.  When splits
    # < cores the input is by definition tiny — redistribute it.  At
    # real scale splits >> cores and no shuffle is added.
    try:
        nin = docs.rdd.getNumPartitions()
        cores = docs.sparkSession.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 - connect sessions lack .rdd
        nin = cores = 0
    if nin and nin < cores:
        toks = toks.repartition(cores)
    # unigrams ++ bigrams in ONE array -> one explode -> one parquet
    # scan (the union-of-two-branches form scans the table twice)
    grams = F.concat(
        F.col("_toks"),
        F.when(
            F.size("_toks") >= 2,
            F.zip_with(
                F.slice(F.col("_toks"), 1, F.size("_toks") - 1),
                F.slice(F.col("_toks"), 2, F.size("_toks") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    feats = toks.select(
        "_id", "_t", F.explode(grams).alias("_f")
    ).select(
        "_id",
        "_t",
        (
            F.conv(F.substring(F.md5("_f"), 1, 15), 16, 10).cast("long")
            % buckets
        ).alias("_b"),
    )
    # (doc, bucket) counts — feeds bucket stats AND the per-doc sum
    dbc = (
        feats.groupBy("_id", "_t", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .transform(materialize)
    )
    bstats = dbc.groupBy("_b").agg(
        F.sum(F.when(F.col("_t"), F.col("_c")).otherwise(F.lit(0))).alias("_ct"),
        F.sum("_c").alias("_cr"),
    )
    totals = bstats.agg(
        F.sum("_ct").alias("_nt"), F.sum("_cr").alias("_nr")
    )

    def sl(col):
        return F.round(F.lit(1000000000.0) * F.log(col)).cast("long")

    scored = (
        dbc.join(F.broadcast(bstats), "_b")
        .crossJoin(F.broadcast(totals))
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_features"),
            F.sum(
                F.col("_c")
                * (
                    sl(F.col("_ct") + 1)
                    - sl(F.col("_cr") + 1)
                    + sl(F.col("_nr") + F.lit(buckets))
                    - sl(F.col("_nt") + F.lit(buckets))
                )
            ).alias("_s"),
        )
    )
    return scored.select(
        F.col("_id").alias(id_col),
        "n_features",
        F.round(
            F.col("_s").cast("double") / F.lit(1000000000.0), decimals
        ).alias("log_importance"),
    )


def dsir_oracle_sql(
    target_pred: str,
    buckets: int = 4096,
    decimals: int = 6,
    table: str = "documents",
    topk: int | None = None,
) -> str:
    """DuckDB twin of :func:`dsir_importance`: same md5-bucketed
    unigram+bigram features, same Laplace lattice.  ``target_pred``
    is a SQL boolean over the table's columns (e.g. ``lang = 'en'``).
    """
    sel = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, ({target_pred}) AS t,
             STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+') AS w
      FROM {table}
    ),
    feats AS MATERIALIZED (
      SELECT doc_id, t,
             ('0x' || SUBSTR(md5(f), 1, 15))::BIGINT % {buckets} AS b
      FROM (
        SELECT doc_id, t, UNNEST(w) AS f FROM toks
        UNION ALL
        SELECT doc_id, t, w[gs.i] || ' ' || w[gs.i + 1] AS f
        FROM toks, UNNEST(GENERATE_SERIES(1, LEN(w) - 1)) AS gs(i)
        WHERE LEN(w) >= 2
      )
    ),
    dbc AS MATERIALIZED (
      SELECT doc_id, t, b, COUNT(*) AS c FROM feats GROUP BY 1, 2, 3
    ),
    bs AS (
      SELECT b, SUM(CASE WHEN t THEN c ELSE 0 END) AS ct, SUM(c) AS cr
      FROM dbc GROUP BY b
    ),
    tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM bs)
    SELECT dbc.doc_id,
           CAST(SUM(dbc.c) AS BIGINT) AS n_features,
           ROUND(CAST(SUM(dbc.c * (
               CAST(ROUND(1000000000.0 * LN(bs.ct + 1)) AS BIGINT)
             - CAST(ROUND(1000000000.0 * LN(bs.cr + 1)) AS BIGINT)
             + CAST(ROUND(1000000000.0 * LN(tot.nr + {buckets})) AS BIGINT)
             - CAST(ROUND(1000000000.0 * LN(tot.nt + {buckets})) AS BIGINT)
           )) AS DOUBLE) / 1000000000.0, {decimals}) AS log_importance
    FROM dbc JOIN bs USING (b) CROSS JOIN tot
    GROUP BY dbc.doc_id"""
    if topk:
        return (
            sel
            + f"""
    ORDER BY log_importance DESC, dbc.doc_id ASC
    LIMIT {topk}"""
        )
    return sel + "\n    ORDER BY dbc.doc_id"


def ccnet_perplexity_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    resident_max: int | None = None,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): rank every document by a language-model score and split
    the corpus into equal-sized quality tiers — CCNet's head /
    middle / tail thirds, which downstream mixtures sample at
    different rates.  The LM here is the corpus-trained add-k bigram
    model (:func:`robosystems_spark.operators.text.bigram_logprob`),
    the repo's perplexity proxy; swapping in an external KenLM score
    column is the same NTILE over a different input.

    Determinism: the tier boundary is NTILE over a TOTAL order
    (rounded avg_logprob DESC, then id) — no engine-dependent tie
    placement at bucket edges.

    Scale shape: bigram_logprob's two count shuffles + one
    corpus-wide NTILE window.  A single global window is the honest
    formulation of exact equal-sized tiers; corpora too large for one
    sort should switch to approx percentile boundaries
    (approxQuantile on avg_logprob) — noted here rather than silently
    approximated.

    Returns (id, n_bigrams, avg_logprob, bucket, tier) with tier in
    head/middle/tail for 3 buckets (stringified index otherwise).

    r13 resident tier (see ``ppmi_word_similarity``): measured corpus
    gates; the twin bails whenever any scaled per-doc average sits
    within 1e-7 of a HALF_UP boundary (summation-order guard — the
    Spark AVG and the numpy sum differ at the last ulp; see
    ``resident_text.ccnet_buckets_resident``).
    """
    from robosystems_spark.operators.text import bigram_logprob

    from robosystems_spark.operators import resident_text as RT

    got = RT.collect_corpus(docs, text_col, id_col, max_docs=resident_max)
    if got is not None:
        pdf = RT.ccnet_buckets_resident(got[0], got[1], n_buckets)
        if pdf is not None:
            from pyspark.sql import types as _T

            idt = docs.schema[id_col].dataType
            schema = _T.StructType(
                [
                    _T.StructField(id_col, idt, True),
                    _T.StructField("n_bigrams", _T.LongType(), False),
                    _T.StructField("avg_logprob", _T.DoubleType(), True),
                    _T.StructField("bucket", _T.IntegerType(), False),
                    _T.StructField("tier", _T.StringType(), False),
                ]
            )
            return docs.sparkSession.createDataFrame(pdf, schema=schema)

    scored = bigram_logprob(docs, text_col, id_col)
    w = Window.orderBy(F.desc("avg_logprob"), F.asc(id_col))
    out = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    if n_buckets == 3:
        tier = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    else:
        tier = F.col("bucket").cast("string")
    return out.withColumn("tier", tier)


def corpus_datasheet(
    docs: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """One-row corpus data card (Gebru et al. 2021 "Datasheets for
    Datasets", the quantitative half): size, exact-duplicate fraction,
    language-mix entropy, mean heuristic quality, and the Gopher A1.1
    keep rate — the summary block a curation run publishes next to its
    output (compose with ``gopher_repetition_flags`` /
    ``ccnet_perplexity_buckets`` for the deeper slices).

    Float discipline: quality scores are already 1e-6-rounded, so the
    mean sums exact BIGINT units; language entropy uses the KL entry's
    1e-9 integer-log lattice; duplicate fraction is one division of
    exact counts.  Two aggregations total (corpus-wide + per-language)
    joined as 1-row broadcasts."""
    from robosystems_spark.operators.text import (
        gopher_quality_passes,
        quality_score,
    )

    q = quality_score(docs, text_col=text_col).select(
        "quality_score", "n_tokens"
    )
    fp = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )
    base = docs.select(
        fp.alias("_fp"),
        gopher_quality_passes(text_col).alias("_pg"),
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_fp").alias("n_distinct_texts"),
        F.sum(F.col("_pg").cast("long")).alias("_npg"),
    )
    qagg = q.agg(
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(
            F.round(F.col("quality_score") * 1000000.0).cast("long")
        ).alias("_qs"),
    )
    lc = docs.groupBy(F.col(lang_col).alias("_lang")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    le = lc.agg(
        F.sum("_c").alias("_ln"),
        F.count(F.lit(1)).alias("n_languages"),
        F.sum(
            F.col("_c")
            * F.round(F.log(F.col("_c").cast("double")) * 1e9).cast("long")
        ).alias("_lu"),
    )
    out = agg.crossJoin(F.broadcast(qagg)).crossJoin(F.broadcast(le))
    nd = F.col("n_docs").cast("double")
    return out.select(
        "n_docs",
        "n_tokens",
        "n_distinct_texts",
        F.round(
            (F.col("n_docs") - F.col("n_distinct_texts")).cast("double")
            / nd,
            6,
        ).alias("dup_doc_frac"),
        "n_languages",
        F.round(
            F.log(F.col("_ln").cast("double"))
            - (F.col("_lu").cast("double") / 1e9)
            / F.col("_ln").cast("double"),
            6,
        ).alias("lang_entropy_nats"),
        F.round(F.col("_qs").cast("double") / 1000000.0 / nd, 6).alias(
            "mean_quality"
        ),
        F.round(F.col("_npg").cast("double") / nd, 6).alias(
            "gopher_keep_rate"
        ),
    )


FIM_PRE, FIM_SUF, FIM_MID = "<|fim_pre|>", "<|fim_suf|>", "<|fim_mid|>"


def fim_transform(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fim_rate_pct: int = 50,
    seed: int = 42,
) -> DataFrame:
    """Fill-in-the-middle pretraining transform (Bavarian et al. 2022):
    for a deterministic ``fim_rate_pct``% of documents, split the token
    sequence at two hash-drawn cut points and emit the PSM reordering
    ``<|fim_pre|> prefix <|fim_suf|> suffix <|fim_mid|> middle`` (the
    format that teaches a causal LM to infill); the rest pass through
    unchanged.  The paper draws cuts uniformly at random — here they
    come from ``md5(seed:doc:k)`` so the corpus is REPRODUCIBLE and
    hash-checkable (the random-walk discipline; the paper's §3 notes
    the transform is applied once at dataset build, exactly this shape).

    Map-only: two md5s + array slices + concat per row, no shuffle.
    Returns (id, fim_applied, fim_text).
    """
    toks = tokens(text_col)

    def h(k: int):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(str(seed)), F.col(id_col), F.lit(str(k))
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    staged = docs.select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        toks.alias("_toks"),
        (h(0) % 100 < fim_rate_pct).alias("_apply"),
        h(1).alias("_u1"),
        h(2).alias("_u2"),
    )
    n = F.size("_toks")
    c1 = (F.col("_u1") % (n + 1)).cast("int")
    c2 = (F.col("_u2") % (n + 1)).cast("int")
    i = F.least(c1, c2)
    j = F.greatest(c1, c2)
    part = lambda s, ln: F.concat_ws(  # noqa: E731 - local slicer
        " ", F.slice(F.col("_toks"), s, ln)
    )
    psm = F.concat(
        F.lit(FIM_PRE),
        part(F.lit(1), i),
        F.lit(FIM_SUF),
        part(j + 1, n - j),
        F.lit(FIM_MID),
        part(i + 1, j - i),
    )
    return staged.select(
        id_col,
        F.col("_apply").alias("fim_applied"),
        F.when(F.col("_apply"), psm).otherwise(F.col("_text")).alias(
            "fim_text"
        ),
    )


def moore_lewis_score(
    docs: DataFrame,
    target_col: str = "is_target",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Cross-entropy difference selection (Moore & Lewis 2010, the
    classic domain-data selector DSIR §2 generalizes): score every
    document by the per-bigram log-probability difference between an
    in-domain LM (trained on the ``target_col`` slice) and the
    general-corpus LM — positive means target-like.  Both LMs are the
    add-k bigram models of :func:`...text.bigram_logprob`.

    Float discipline: each per-bigram ``ln(p_t) - ln(p_r)`` rounds to
    the 1e-9 lattice BEFORE summation (hiding last-ulp libm
    divergence, the KL/AA trick), so the per-doc sum is exact BIGINT;
    one division by the bigram count at the end.

    Plan shape: one bigram explode shared by both LMs and scoring, two
    count-table joins keyed by bigram (the target tables are a slice
    of the same shuffle), vocab sizes as 1-row broadcasts.  The target
    slice is tiny by construction — the 100 TB side shuffles once.
    """
    toks = tokens(text_col)
    base = docs.select(
        F.col(id_col),
        F.col(target_col).cast("boolean").alias("_tg"),
        toks.alias("_t"),
    ).filter(F.size("_t") >= 2)
    pairs = base.select(
        id_col,
        "_tg",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1), i -> "
                "struct(_t[i - 1] AS w1, _t[i] AS w2))"
            )
        ).alias("_p"),
    ).select(
        id_col, "_tg", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    ).transform(materialize)
    cb = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_cbr"),
        F.sum(F.when(F.col("_tg"), 1).otherwise(0)).alias("_cbt"),
    )
    c1 = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).alias("_c1r"),
        F.sum(F.when(F.col("_tg"), 1).otherwise(0)).alias("_c1t"),
    )
    vocab = docs.select(
        F.col(target_col).cast("boolean").alias("_tg"),
        F.explode(tokens(text_col)).alias("_tok"),
    ).agg(
        F.countDistinct("_tok").cast("double").alias("_vr"),
        F.countDistinct(F.when(F.col("_tg"), F.col("_tok"))).cast(
            "double"
        ).alias("_vt"),
    )
    lp_t = F.log(
        (F.col("_cbt") + k) / (F.col("_c1t") + k * F.col("_vt"))
    )
    lp_r = F.log(
        (F.col("_cbr") + k) / (F.col("_c1r") + k * F.col("_vr"))
    )
    unit = F.round((lp_t - lp_r) * 1e9).cast("long")
    return (
        pairs.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(id_col, unit.alias("_u"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                (F.sum("_u").cast("double") / 1e9)
                / F.count(F.lit(1)),
                decimals,
            ).alias("ml_score"),
        )
    )


def padding_waste(
    docs: DataFrame,
    batch_size: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Padding-waste accounting for fixed-size training batches — the
    throughput question behind length-bucketed ("smart") batching:
    a batch pads every sequence to its longest member, so arrival-order
    batching wastes up to half the FLOPs on pad tokens while
    length-sorted batching wastes almost none.  Returns one row per
    strategy ('arrival' = id order, 'sorted' = token-length order)
    with total real tokens, padded slots, and the waste fraction.

    All-integer: batch assignment is a row_number over a TOTAL order
    (length ties broken by id), waste = Σ(batch_rows · batch_max −
    batch_sum); one final division per row.  The two global windows
    are the honest exact formulation (the CCNet-tiers caveat); at
    corpus scale the same report runs per partition/shard.
    """
    n = F.size(tokens(text_col)).alias("n_tok")
    base = docs.select(F.col(id_col).alias("_id"), n).transform(materialize)

    def strategy(name: str, order) -> DataFrame:
        w = Window.orderBy(*order)
        b = ((F.row_number().over(w) - 1) / batch_size).cast("long")
        per_batch = (
            base.select("n_tok", b.alias("_b"))
            .groupBy("_b")
            .agg(
                F.count(F.lit(1)).alias("_rows"),
                F.max("n_tok").alias("_mx"),
                F.sum("n_tok").alias("_sum"),
            )
        )
        return per_batch.agg(
            F.lit(name).alias("strategy"),
            F.sum("_sum").cast("long").alias("n_tokens"),
            F.sum(F.col("_rows") * F.col("_mx") - F.col("_sum"))
            .cast("long")
            .alias("n_pad_slots"),
        )

    out = strategy("arrival", [F.asc("_id")]).unionAll(
        strategy("sorted", [F.asc("n_tok"), F.asc("_id")])
    )
    return out.select(
        "strategy",
        "n_tokens",
        "n_pad_slots",
        F.round(
            F.col("n_pad_slots").cast("double")
            / (F.col("n_tokens") + F.col("n_pad_slots")),
            6,
        ).alias("pad_frac"),
    )
