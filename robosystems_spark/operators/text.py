"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure column expressions (JVM-side, whole-stage
codegen) — no Python UDFs in the hot path.  They operate on a string
column and scale linearly with no shuffle except the final aggregation
a caller adds.

Operators: tokenization, token stats, quality scoring, language-ID
(stopword-ratio heuristic), document fingerprinting.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf hint resolution (dedup.py note)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Marker words per language for the stopword-ratio language-ID
# heuristic.  On real corpora these are the top function words; the
# heuristic is: predict the language whose marker set covers the
# largest fraction of the document's tokens (ties break by language
# code order, deterministic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "de", "que", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai"),
}


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokenization of lower-cased, trimmed text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counting (whitespace tokenizer)."""
    toks = tokens(text_col)
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length(F.trim(F.col(text_col))).alias("n_chars_trim"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document-quality scoring (length / repetition /
    mean-token-length components), rounded for cross-engine stability.

    score = 0.4 * min(n_tokens/100, 1)            (length credit)
          + 0.4 * unique_ratio                    (repetition penalty)
          + 0.2 * min(avg_token_len/8, 1)         (degenerate-token check)
    """
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    avg_len = (F.length(F.translate(F.trim(F.col(text_col)), " ", "")).cast("double") / n)
    score = (
        F.least(n / 100.0, F.lit(1.0)) * 0.4
        + (uniq / n) * 0.4
        + F.least(avg_len / 8.0, F.lit(1.0)) * 0.2
    )
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.round(uniq / n, 6).alias("unique_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(score, 6).alias("quality_score"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The published Gopher document-quality filter rules (Rae et al.
    2021 appendix A1.1, reused by MassiveText/Dolma/RefinedWeb-class
    pipelines) as exact column expressions:

    1. word count in [50, 100000]
    2. mean word length in [3, 10]
    3. symbol-to-word ratio <= 0.1  (symbols: '#' and '...')
    4. >= 80% of words contain at least one alphabetic character
    5. >= 2 distinct required stop words present

    (The two line-based rules — bullet-start and ellipsis-end line
    fractions — need newline structure this corpus doesn't have:
    :func:`gopher_line_flags` implements them, plus the duplicate-
    line family, for corpora that carry lines.)

    Everything is integer counting + one exact division per rule —
    whole-stage codegen, no UDFs — so the flags hash-match a SQL
    oracle exactly; ``passes_gopher`` is the AND of all rules, the
    production keep/drop bit."""
    toks = tokens(text_col)
    n = F.size(toks)
    nd = n.cast("double")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_len = sum_len.cast("double") / nd
    c = F.trim(F.col(text_col))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#")))
    n_ell = (F.length(c) - F.length(F.replace(c, F.lit("...")))) / F.lit(3)
    symbol_ratio = (n_hash + n_ell).cast("double") / nd
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_frac = alpha_words.cast("double") / nd
    stops = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    passes = (
        (n >= 50) & (n <= 100000)
        & (mean_len >= 3.0) & (mean_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (alpha_frac >= 0.8)
        & (stops >= 2)
    )
    return df.select(
        id_col,
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stops.alias("n_required_stopwords"),
        passes.alias("passes_gopher"),
    )


def _parallelize_small_scan(df: DataFrame) -> DataFrame:
    """Small-scan parallelism rescue (metadata-only decision, no job):
    per-document map work parallelizes by input split, so a table
    smaller than one split runs single-task.  When splits < cores the
    input is by definition tiny — redistribute it.  At real scale
    splits >> cores and no shuffle is added."""
    try:
        nin = df.rdd.getNumPartitions()
        cores = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 - connect sessions lack .rdd
        return df
    if nin and nin < cores:
        return df.repartition(cores)
    return df


# (frac_threshold) per rule, from Rae et al. 2021 table A1: a document
# is DROPPED when the fraction exceeds the threshold.
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "top2": 0.20,
    "top3": 0.18,
    "top4": 0.16,
    "dup5": 0.15,
    "dup6": 0.14,
    "dup7": 0.13,
    "dup8": 0.12,
    "dup9": 0.11,
    "dup10": 0.10,
}


def _ngram_run_stats(toks: Column, n: int) -> Column:
    """struct(top, dup) of character-coverage counts for word ``n``-grams.

    ``top`` = (occurrences of the winning n-gram) x (its char length);
    the winner maximizes (count, char length, gram) lexicographically —
    the published rule says "most common n-gram", and the (len, gram)
    tie-break makes count ties deterministic and engine-identical.
    ``dup`` = sum over n-grams occurring more than once of
    (count x char length) — every occurrence of a duplicated n-gram
    counts (the NeMo-Curator variant; DataTrove instead marks character
    spans so overlapping occurrences aren't double-counted — stated
    deviation).

    Entirely per-row higher-order functions on the token array (sort +
    one run-length FOLD over the sorted array): NO explode, NO shuffle —
    the 100 TB path is a map-only scan.  Char length of a gram includes
    the single joining spaces (length of the space-joined form).

    Implementation note: the fold is a SINGLE ``F.aggregate`` pass whose
    lambda references only the accumulator and the element.  Spark does
    no common-subexpression elimination inside lambda bodies, so the
    obvious staged form (``starts`` referencing the sorted array,
    ``runs`` referencing ``starts``, reductions referencing ``runs``)
    re-evaluates each upstream array per element — measured O(len^3..4)
    per document, 150 s for 20 rows.  The fold is O(len).
    """
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    s = F.array_sort(grams)
    zero = F.lit(0).cast("long")

    # acc: (prev gram, current run length, best (count, chars, gram),
    # duplicated-char sum).  Runs close when the gram changes; the
    # sorted order makes the (c, l, g)-lexicographic max equivalent to
    # "replace on strictly-better (c, l)" since g always increases.
    def _close(acc: Column):
        candc = acc["run"]
        candl = F.length(acc["prev"]).cast("long")
        better = (candc > acc["topc"]) | (
            (candc == acc["topc"]) & (candl >= acc["topl"])
        )
        return (
            F.when(better, candc).otherwise(acc["topc"]),
            F.when(better, candl).otherwise(acc["topl"]),
            acc["dup"] + F.when(candc > 1, candc * candl).otherwise(zero),
        )

    def _merge(acc: Column, x: Column) -> Column:
        is_close = acc["prev"].isNotNull() & (x != acc["prev"])
        tc, tl, dp = _close(acc)
        return F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(is_close, tc).otherwise(acc["topc"]).alias("topc"),
            F.when(is_close, tl).otherwise(acc["topl"]).alias("topl"),
            F.when(is_close, dp).otherwise(acc["dup"]).alias("dup"),
        )

    def _finish(acc: Column) -> Column:
        has = acc["prev"].isNotNull()
        tc, tl, dp = _close(acc)
        return F.struct(
            (F.when(has, tc).otherwise(zero) * F.when(has, tl).otherwise(zero)).alias(
                "top"
            ),
            F.when(has, dp).otherwise(zero).alias("dup"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("topc"),
        zero.alias("topl"),
        zero.alias("dup"),
    )
    return F.aggregate(s, init, _merge, _finish)


def gopher_repetition_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The published Gopher repetition filter rules (Rae et al. 2021
    appendix A1.2, the second half of the MassiveText filter next to
    :func:`gopher_quality_flags`):

    - fraction of characters in the most common {2,3,4}-gram must not
      exceed {0.20, 0.18, 0.16}
    - fraction of characters in duplicated {5..10}-grams must not
      exceed {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}

    The duplicate-line / duplicate-paragraph rules live in
    :func:`gopher_line_flags` (this corpus is single-line).  Character
    fractions use the trimmed document length as the denominator.

    Scale: a per-document map-only computation — token array sort +
    run-length per n, all whole-stage-codegen higher-order functions,
    zero shuffles (the naive explode->groupBy(doc, n, gram) formulation
    shuffles ~9x the corpus token count for a doc-local key).
    """
    denom = F.greatest(
        F.length(F.trim(F.col(text_col))).cast("long"), F.lit(1).cast("long")
    ).cast("double")
    # Two staging projections so non-cheap expressions evaluate ONCE
    # per row (CollapseProject declines to inline non-cheap
    # expressions referenced more than once): tokenization feeds all
    # nine folds, and each fold feeds both its frac column and the
    # keep/drop flag — without the barriers the re-expansion ran the
    # split 9x and every sort+fold 2x (measured).
    toked = _parallelize_small_scan(df).select(
        id_col, denom.alias("_denom"), tokens(text_col).alias("_toks")
    )
    staged = toked.select(
        id_col,
        "_denom",
        *[
            _ngram_run_stats(F.col("_toks"), n).alias(f"_n{n}")
            for n in range(2, 11)
        ],
    )
    fracs: dict[str, Column] = {}
    for n in (2, 3, 4):
        fracs[f"top{n}"] = F.col(f"_n{n}")["top"] / F.col("_denom")
    for n in range(5, 11):
        fracs[f"dup{n}"] = F.col(f"_n{n}")["dup"] / F.col("_denom")
    passes = F.lit(True)
    for key, thr in GOPHER_REPETITION_THRESHOLDS.items():
        passes = passes & (fracs[key] <= F.lit(thr))
    return staged.select(
        id_col,
        *[
            F.round(fracs[key], 6).alias(f"rep_{key}_frac")
            for key in GOPHER_REPETITION_THRESHOLDS
        ],
        passes.alias("passes_repetition"),
    )


def unigram_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram (Shannon) entropy in nats — the
    RedPajama-v2-class information-density signal (low entropy = boilerplate
    / keyword stuffing; the natural companion of the corpus-level KL drift
    monitor).

    H = ln(N) - (1/N) * sum_w c_w ln(c_w).  Float discipline follows the
    KL entry (Adamic-Adar lattice): every ln runs on an INTEGER count and
    is rounded to a 1e-9 lattice, the per-doc sum is exact BIGINT, and a
    single float expression at the end produces the value — hash-stable
    across engines.  ``norm_entropy`` = H / ln(n_unique) in [0, 1]
    (0 when the doc has a single distinct token).

    Scale: map-only like :func:`gopher_repetition_flags` — token-array
    sort + run-length fold, no shuffle.
    """
    s = F.array_sort(F.col("_toks"))
    zero = F.lit(0).cast("long")

    # Single-fold run-length pass (same no-CSE-inside-lambdas rationale
    # as _ngram_run_stats): acc = (prev token, run length,
    # sum c*round(1e9*ln(c)) over closed runs, distinct-token count).
    def _units(run: Column) -> Column:
        return run * F.round(F.log(run.cast("double")) * 1e9).cast("long")

    def _merge(acc: Column, x: Column) -> Column:
        is_close = acc["prev"].isNotNull() & (x != acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            (acc["u"] + F.when(is_close, _units(acc["run"])).otherwise(zero)).alias(
                "u"
            ),
            (acc["k"] + F.when(is_close, F.lit(1)).otherwise(F.lit(0))).alias("k"),
        )

    def _finish(acc: Column) -> Column:
        has = acc["prev"].isNotNull()
        return F.struct(
            (acc["u"] + F.when(has, _units(acc["run"])).otherwise(zero)).alias("u"),
            (acc["k"] + F.when(has, F.lit(1)).otherwise(F.lit(0))).alias("k"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("u"),
        F.lit(0).alias("k"),
    )
    folded = F.aggregate(s, init, _merge, _finish)
    # stage tokenization, then the fold + the token count (same
    # CollapseProject rationale as gopher_repetition_flags: each is
    # referenced by several downstream expressions)
    toked = _parallelize_small_scan(df).select(
        id_col, tokens(text_col).alias("_toks")
    )
    staged = toked.select(
        id_col, F.size("_toks").alias("_m"), folded.alias("_f")
    )
    m = F.col("_m")
    u = F.col("_f")["u"]
    k = F.col("_f")["k"]
    nd = m.cast("double")
    entropy = F.when(
        m > 0, F.log(nd) - (u.cast("double") / 1e9) / nd
    ).otherwise(F.lit(0.0))
    norm = F.when(k > 1, entropy / F.log(k.cast("double"))).otherwise(F.lit(0.0))
    return staged.select(
        id_col,
        m.alias("n_tokens"),
        k.alias("n_unique_tokens"),
        F.round(entropy, 6).alias("unigram_entropy"),
        F.round(norm, 6).alias("norm_entropy"),
    )


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram/stopword language-ID heuristic.

    Computes, per candidate language, the fraction of tokens that are
    marker words, and predicts the argmax (ties -> lexicographically
    first language code).  Pure array expressions — no UDF.
    """
    toks = tokens(text_col)
    df = df.select(id_col, toks.alias("_toks"))
    n = F.size("_toks").cast("double")
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        hit = F.expr(f"size(filter(_toks, t -> t IN ({markers})))").cast("double")
        scores.append(F.round(hit / n, 6).alias(f"score_{lang}"))
    df = df.select(id_col, *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.lit(None).cast("string")
    # reversed so earlier language codes win ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return df.select(
        id_col,
        *[f"score_{lang}" for lang in sorted(LANG_MARKERS)],
        pred.alias("pred_lang"),
    )


# PII redaction patterns, applied in this order.  Written in the
# common subset of Java regex (Spark) and RE2 (DuckDB oracle): no
# backrefs, no lookaround.  Digit-run patterns CAN overlap on
# adversarial inputs (e.g. '111-22-3333-444-5555' holds both an SSN
# and a phone span sharing a digit), so each pattern is counted on the
# text AS IT EXISTS at its stage — after the prior replacements —
# which keeps every reported count equal to the number of tokens
# actually substituted.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Regex PII scrubbing (emails / SSN-shaped / phone-shaped spans),
    the standard pre-training privacy pass.

    Pure column expressions (regexp_extract_all / regexp_replace —
    JVM-side, codegen): scales linearly, no shuffle, no UDF.  Returns
    per-stage match counts (exactly what was substituted) plus the
    redacted text's length and md5 (hash rather than the full text
    keeps the result frame narrow for cross-engine comparison).
    """
    stage = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(stage, F.lit(pat), F.lit(0))).alias(
                f"n_{name}s"
            )
        )
        stage = F.regexp_replace(stage, pat, token)
    return df.select(
        id_col,
        *counts,
        F.length(stage).alias("redacted_len"),
        F.md5(stage.cast("binary")).alias("redacted_hash"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping context-window chunking: token windows of size
    ``window`` starting every ``stride`` tokens — the RAG/pretraining
    document-splitting primitive.

    One generated ``sequence`` + ``explode`` per document (fan-out
    ~n_tokens/stride, bounded), then ``slice`` on the already-split
    token array — all JVM array expressions, no UDF, no shuffle.
    Chunk text is returned as an md5 hash (narrow, comparable) plus
    the chunk token count; ``chunk_idx`` is the 0-based window index.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(text_col)
    chunk = F.slice(F.col("_toks"), F.col("_s") + 1, window)
    return (
        df.select(id_col, toks.alias("_toks"))
        .select(
            id_col,
            "_toks",
            F.explode(F.expr(f"sequence(0, size(_toks) - 1, {stride})")).alias("_s"),
        )
        .select(
            id_col,
            (F.col("_s") / stride).cast("long").alias("chunk_idx"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_hash"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lower-cased text.  Reference analog: content-hash fact IDs
    (/root/reference/robosystems/adapters/sec/processors/ids.py)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(id_col, F.md5(normalized.cast("binary")).alias("fingerprint"))


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document bigram language-model score — the perplexity-proxy
    quality signal corpus curation pipelines rank documents by (the
    heavier cousin of quality_score's surface ratios): average
    ``ln((c(w1,w2)+k) / (c(w1)+k*V))`` over the document's bigram
    instances, with add-k smoothing against the corpus-trained counts.

    Plan shape: one bigram explode shared by training and scoring,
    count aggregations with map-side partials, a shuffle join keyed by
    the bigram (the count tables are vocabulary-sized — never
    broadcast by assumption; AQE may when they are actually small),
    and the vocabulary size as a broadcast 1-row cross join.  Docs
    with fewer than 2 tokens have no bigrams and drop out, like every
    per-bigram aggregate.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_t")).filter(F.size("_t") >= 2)
    pairs = base.select(
        id_col,
        F.explode(
            F.expr("transform(sequence(1, size(_t) - 1), i -> "
                   "struct(_t[i - 1] AS w1, _t[i] AS w2))")
        ).alias("_p"),
    ).select(id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    vocab = (
        df.select(F.explode(toks).alias("_tok"))
        .agg(F.countDistinct("_tok").cast("double").alias("_v"))
    )
    lp = F.log((F.col("_cb") + k) / (F.col("_c1") + k * F.col("_v")))
    return (
        pairs.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(id_col, lp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("_lp"), 4).alias("avg_logprob"),
        )
    )


def trigram_interpolated_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    k: float = 0.5,
) -> DataFrame:
    """Per-document INTERPOLATED trigram LM score — the stronger
    perplexity proxy: for each trigram instance,

        p = l3*c(w1w2w3)/c(w1w2) + l2*c(w2w3)/c(w2) + l1*(c(w3)+k)/(N+kV)

    (Jelinek-Mercer interpolation of the trigram/bigram MLs with an
    add-k unigram floor; the floor keeps p > 0 so ln never sees zero,
    and every trigram's context occurs in the corpus by construction,
    so the ML denominators are >= 1).

    Plan shape mirrors :func:`bigram_logprob` one order up: a single
    trigram explode shared between training and scoring, count
    aggregations with map-side partials at each order, shuffle joins
    keyed by the n-gram, and the (N, V) totals as one broadcast row.
    Docs with < 3 tokens drop out.
    """
    l3, l2, l1 = lambdas
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_t")).filter(F.size("_t") >= 3)
    tri = base.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 2), i -> "
                "struct(_t[i - 1] AS w1, _t[i] AS w2, _t[i + 1] AS w3))"
            )
        ).alias("_g"),
    ).select(
        id_col,
        F.col("_g.w1").alias("w1"),
        F.col("_g.w2").alias("w2"),
        F.col("_g.w3").alias("w3"),
    )
    c3 = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("_c3"))
    c12 = tri.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    c23 = tri.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("_c23"))
    c2 = tri.groupBy("w2").agg(F.count(F.lit(1)).alias("_c2"))
    cu = tri.groupBy("w3").agg(F.count(F.lit(1)).alias("_cu"))
    totals = tri.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.countDistinct("w3").cast("double").alias("_v"),
    )
    p = (
        F.lit(l3) * (F.col("_c3") / F.col("_c12"))
        + F.lit(l2) * (F.col("_c23") / F.col("_c2"))
        + F.lit(l1) * ((F.col("_cu") + k) / (F.col("_n") + k * F.col("_v")))
    )
    return (
        tri.join(c3, ["w1", "w2", "w3"])
        .join(c12, ["w1", "w2"])
        .join(c23, ["w2", "w3"])
        .join(c2, "w2")
        .join(cu, "w3")
        .crossJoin(F.broadcast(totals))
        .select(id_col, F.log(p).alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.avg("_lp"), 4).alias("avg_logprob"),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 200,
    decimals: int = 6,
) -> DataFrame:
    """Zipf's-law fit over the corpus token frequencies: least-squares
    slope/intercept of ln(freq) on ln(rank) for the ``top_n`` tokens
    (natural corpora slope toward -1; generated or templated text bends
    away — a corpus-level quality signal next to the per-doc ones).

    Returns ONE row (n_tokens_fit, slope, intercept, r2).

    Fully relational and portable: frequency ranks are exact integers
    (count DESC, token ASC total order), ln() inputs are integers so
    both engines see identical operands, and the closed-form OLS
    aggregates (sums of x, y, xy, x^2, y^2) are plain SUMs with
    output rounding absorbing summation-order drift.  Scale shape:
    token count aggregation (one shuffle), a top-n TakeOrdered, and a
    single-row aggregate over n rows.
    """
    toks = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    ranked = (
        toks.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("freq").cast("double")).alias("y"),
        )
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cov / varx
    return agg.select(
        F.col("n").alias("n_tokens_fit"),
        F.round(slope, decimals).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, decimals).alias(
            "intercept"
        ),
        F.round(cov * cov / (varx * vary), decimals).alias("r2"),
    )


def zipf_fit_oracle_sql(
    table: str = "documents", top_n: int = 200, decimals: int = 6
) -> str:
    """DuckDB twin: same exact integer ranks, ln() over integer
    operands, closed-form OLS sums, and output rounding."""
    return f"""
    WITH toks AS (
      SELECT tok, COUNT(*) AS freq
      FROM (
        SELECT UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) AS tok
        FROM {table}
      )
      WHERE LENGTH(tok) > 0
      GROUP BY tok
    ),
    ranked AS (
      SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS DOUBLE)) AS x,
             LN(CAST(freq AS DOUBLE)) AS y,
             ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS r
      FROM toks
      QUALIFY r <= {top_n}
    ),
    agg AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM ranked
    )
    SELECT n AS n_tokens_fit,
           ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), {decimals}) AS slope,
           ROUND((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n, {decimals}) AS intercept,
           ROUND((sxy - sx * sy / n) * (sxy - sx * sy / n)
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)), {decimals}) AS r2
    FROM agg
    """


def unicode_nfc_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Unicode NFC normalization stats: raw character
    length, NFC'd length, number of characters composed away, and an
    already-normalized flag — the canonicalization pass every text
    pipeline runs before dedup/tokenization (combining sequences like
    'e' + U+0301 otherwise hash differently from the precomposed
    form).

    Normalization runs in an Arrow-batched pandas_udf over stdlib
    ``unicodedata``; the DuckDB oracle uses ``nfc_normalize``
    (utf8proc), so the gate compares two INDEPENDENT UCD
    implementations."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    # pd must resolve via module globals (future-annotations string
    # hints; see operators/dedup.py header note), and the returnType
    # must be a DataType object, not a DDL string
    @pandas_udf(StringType())
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    raw_len = F.length(F.col(text_col))
    nfc_len = F.length(nfc(F.col(text_col)))
    return df.select(
        F.col(id_col),
        raw_len.cast("long").alias("raw_len"),
        nfc_len.cast("long").alias("nfc_len"),
        (raw_len - nfc_len).cast("long").alias("n_composed"),
        (raw_len == nfc_len).alias("already_nfc"),
    )


def gopher_line_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """The line/paragraph-structured Gopher rules (Rae et al. 2021
    A1.1 + A1.2) that :func:`gopher_quality_flags` /
    :func:`gopher_repetition_flags` omit on single-line corpora —
    provided for documents that carry newline structure:

    - fraction of lines starting with a bullet character <= 0.90
    - fraction of lines ending with an ellipsis <= 0.30
    - duplicate-line fraction <= 0.30 (fraction of LINES that are
      repeats of an earlier-seen line)
    - duplicate-line CHARACTER fraction <= 0.20 (fraction of non-
      newline characters inside duplicated lines, every occurrence
      beyond the first counted — the repetition-family definition)

    Lines are ``\\n``-separated, trimmed, empties ignored.  Paragraph
    variants are the same computation over ``\\n\\n`` splits; callers
    pass ``sep="\\n\\n"``.  All list aggregates in codegen-free HOFs
    (same fold machinery as the n-gram rules), map-only.
    """
    return _gopher_line_flags(df, text_col, id_col, sep=sep)


def _gopher_line_flags(
    df: DataFrame, text_col: str, id_col: str, sep: str
) -> DataFrame:
    raw_lines = F.split(F.col(text_col), sep)
    lines = F.filter(
        F.transform(raw_lines, lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n = F.size(lines)
    nd = F.greatest(n, F.lit(1)).cast("double")
    bullets = F.size(
        F.filter(
            lines,
            lambda s: F.substring(s, 1, 1).isin("-", "*", "•"),
        )
    )
    ellipsis = F.size(
        F.filter(
            lines,
            lambda s: s.endswith("...") | s.endswith("…"),
        )
    )
    # duplicate-line stats: run-length fold over the sorted line array
    # (the unigram_entropy shape): d = lines beyond first occurrence,
    # dc = their characters
    s = F.array_sort(lines)
    zero = F.lit(0).cast("long")

    def _merge(acc: Column, x: Column) -> Column:
        dup = acc["prev"].isNotNull() & (x == acc["prev"])
        return F.struct(
            x.alias("prev"),
            (acc["d"] + F.when(dup, 1).otherwise(0)).alias("d"),
            (
                acc["dc"]
                + F.when(dup, F.length(x).cast("long")).otherwise(zero)
            ).alias("dc"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("d"),
        zero.alias("dc"),
    )
    folded = F.aggregate(s, init, _merge)
    total_chars = F.aggregate(
        lines, zero, lambda acc, x: acc + F.length(x)
    )
    staged = _parallelize_small_scan(df).select(
        id_col,
        n.alias("_n"),
        nd.alias("_nd"),
        bullets.alias("_b"),
        ellipsis.alias("_e"),
        folded.alias("_f"),
        F.greatest(total_chars, F.lit(1).cast("long")).alias("_tc"),
    )
    bullet_frac = F.col("_b") / F.col("_nd")
    ell_frac = F.col("_e") / F.col("_nd")
    dup_frac = F.col("_f")["d"] / F.col("_nd")
    dup_char_frac = F.col("_f")["dc"].cast("double") / F.col("_tc")
    passes = (
        (bullet_frac <= 0.90)
        & (ell_frac <= 0.30)
        & (dup_frac <= 0.30)
        & (dup_char_frac <= 0.20)
    )
    return staged.select(
        id_col,
        F.col("_n").alias("n_lines"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ell_frac, 6).alias("ellipsis_line_frac"),
        F.round(dup_frac, 6).alias("dup_line_frac"),
        F.round(dup_char_frac, 6).alias("dup_line_char_frac"),
        passes.alias("passes_line_rules"),
    )


def gopher_quality_passes(text_col: str | Column = "text") -> Column:
    """The A1.1 keep/drop bit of :func:`gopher_quality_flags` as a
    single reusable boolean expression (for streaming monitors and
    filter pushdown; each component referenced once, so no staging
    projection is needed)."""
    toks = tokens(text_col)
    n = F.size(toks)
    nd = n.cast("double")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_len = sum_len.cast("double") / nd
    c = F.trim(F.col(text_col) if isinstance(text_col, str) else text_col)
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#")))
    n_ell = (F.length(c) - F.length(F.replace(c, F.lit("...")))) / F.lit(3)
    symbol_ratio = (n_hash + n_ell).cast("double") / nd
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / nd
    )
    stops = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    return (
        (n >= 50) & (n <= 100000)
        & (mean_len >= 3.0) & (mean_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (alpha_frac >= 0.8)
        & (stops >= 2)
    )


def gopher_repetition_passes(text_col: str | Column = "text") -> Column:
    """The A1.2 keep/drop bit of :func:`gopher_repetition_flags` as a
    single boolean expression (each fold referenced exactly once, so
    the staging projection the flags variant needs is unnecessary)."""
    toks = tokens(text_col)
    denom = F.greatest(
        F.length(
            F.trim(F.col(text_col) if isinstance(text_col, str) else text_col)
        ).cast("long"),
        F.lit(1).cast("long"),
    ).cast("double")
    passes = F.lit(True)
    for key, thr in GOPHER_REPETITION_THRESHOLDS.items():
        n = int(key.replace("top", "").replace("dup", ""))
        field = "top" if key.startswith("top") else "dup"
        frac = _ngram_run_stats(toks, n)[field] / denom
        passes = passes & (frac <= F.lit(thr))
    return passes
