"""Distributed linear quality classifier trained by gradient descent.

The fastText-style quality-filter pattern of LLM data curation: a
linear model over cheap text statistics, distilled from a rule-based
teacher (here the heuristic quality score in ``operators/text.py``),
then applied corpus-wide as a codegen expression.  Real pipelines
distill from an expensive teacher (an LLM judge, a curated seed set);
the trainer below is agnostic to where the labels come from.

Spark-first shape: one feature projection over the corpus (pure
codegen, checkpointed once), then per GD iteration a SINGLE
aggregation returning 4 doubles (the averaged gradient) to the driver
— bounded driver traffic exactly like the kmeans centroid step.
Scoring is one map-only pass with the learned weights as literals.

PORTABILITY CONTRACT (kmeans discipline): features are exact integer
ratios (identical doubles both engines); weights are re-rounded to
``iter_decimals`` after every update, re-synchronizing the ~1e-16
libm ``exp`` drift inside the sigmoid before it can compound; scores
round to ``out_decimals``, and the predicted label thresholds the
ROUNDED probability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.checkpointing import materialize

FEATURES = ("x_len", "x_uniq", "x_shape")
LABEL_THRESHOLD = 0.52


def _feature_frame(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, x_len, x_uniq, x_shape, y): the three quality-score
    components as features; teacher label y = heuristic score >=
    LABEL_THRESHOLD."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    nospace = F.length(
        F.replace(F.trim(F.col(text_col)), F.lit(" "), F.lit(""))
    ).cast("double")
    x_len = F.least(n / 100.0, F.lit(1.0))
    x_uniq = uniq / n
    x_shape = F.least(nospace / n / 8.0, F.lit(1.0))
    teacher = x_len * 0.4 + x_uniq * 0.4 + x_shape * 0.2
    return docs.select(
        F.col(id_col),
        x_len.alias("x_len"),
        x_uniq.alias("x_uniq"),
        x_shape.alias("x_shape"),
        (teacher >= LABEL_THRESHOLD).cast("int").alias("y"),
    )


def quality_lr_train(
    docs: DataFrame,
    iters: int = 4,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    iter_decimals: int = 9,
) -> list[float]:
    """Batch gradient descent from zero weights; returns
    [w_len, w_uniq, w_shape, bias] after ``iters`` full-batch steps.
    Each step is one distributed aggregation (4 doubles back)."""
    feats = _feature_frame(docs, text_col, id_col).transform(materialize)
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(iters):
        # Left-associated dot product — the oracle mirrors this exact
        # expression shape so z is bit-identical both engines.
        z = (
            F.lit(w[0]) * F.col("x_len")
            + F.lit(w[1]) * F.col("x_uniq")
            + F.lit(w[2]) * F.col("x_shape")
            + F.lit(w[3])
        )
        g = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y").cast(
            "double"
        )
        row = feats.agg(
            F.avg(g * F.col("x_len")).alias("g0"),
            F.avg(g * F.col("x_uniq")).alias("g1"),
            F.avg(g * F.col("x_shape")).alias("g2"),
            F.avg(g).alias("g3"),
        ).collect()[0]
        w = [
            round(w[i] - lr * row[f"g{i}"], iter_decimals)
            for i in range(4)
        ]
    return w


def quality_lr_score(
    docs: DataFrame,
    iters: int = 4,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    iter_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """Train, then score the corpus: (id, p_quality, pred_label, y).
    Scoring is one map-only codegen pass with the weights inlined."""
    w = quality_lr_train(
        docs, iters, lr, text_col, id_col, iter_decimals
    )
    feats = _feature_frame(docs, text_col, id_col)
    z = (
        F.lit(w[0]) * F.col("x_len")
        + F.lit(w[1]) * F.col("x_uniq")
        + F.lit(w[2]) * F.col("x_shape")
        + F.lit(w[3])
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), out_decimals)
    return feats.select(
        F.col(id_col),
        p.alias("p_quality"),
        (p >= 0.5).cast("int").alias("pred_label"),
        F.col("y"),
    )


def quality_lr_oracle_sql(
    iters: int = 4,
    lr: float = 1.0,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    iter_decimals: int = 9,
    out_decimals: int = 6,
) -> str:
    """DuckDB SQL training the identical model: the GD loop unrolled
    into ``iters`` single-row weight CTEs, then the scoring pass."""
    parts = [
        rf"""feats AS MATERIALIZED (
  SELECT {id_col},
         LEAST(n / 100.0, 1.0) AS x_len,
         uniq / n AS x_uniq,
         LEAST(nospace / n / 8.0, 1.0) AS x_shape,
         CAST(LEAST(n / 100.0, 1.0) * 0.4 + (uniq / n) * 0.4
              + LEAST(nospace / n / 8.0, 1.0) * 0.2
              >= {LABEL_THRESHOLD} AS INT) AS y
  FROM (
    SELECT {id_col},
           CAST(LEN(STRING_SPLIT_REGEX(LOWER(TRIM({text_col})), '\s+')) AS DOUBLE) AS n,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM({text_col})), '\s+'))) AS DOUBLE) AS uniq,
           CAST(LENGTH(REPLACE(TRIM({text_col}), ' ', '')) AS DOUBLE) AS nospace
    FROM {table}
  )
)""",
        "w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT ROUND(w.w1 - {lr} * AVG(g * x_len), {iter_decimals}) AS w1,
         ROUND(w.w2 - {lr} * AVG(g * x_uniq), {iter_decimals}) AS w2,
         ROUND(w.w3 - {lr} * AVG(g * x_shape), {iter_decimals}) AS w3,
         ROUND(w.b - {lr} * AVG(g), {iter_decimals}) AS b
  FROM (
    SELECT f.*, 1.0 / (1.0 + EXP(-(w.w1 * f.x_len + w.w2 * f.x_uniq
                                   + w.w3 * f.x_shape + w.b)))
               - CAST(f.y AS DOUBLE) AS g,
           w.w1, w.w2, w.w3, w.b
    FROM feats f CROSS JOIN w{t - 1} w
  ) s CROSS JOIN w{t - 1} w
  GROUP BY w.w1, w.w2, w.w3, w.b
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT f.{id_col},
       ROUND(1.0 / (1.0 + EXP(-(w.w1 * f.x_len + w.w2 * f.x_uniq
                                + w.w3 * f.x_shape + w.b))),
             {out_decimals}) AS p_quality,
       CAST(ROUND(1.0 / (1.0 + EXP(-(w.w1 * f.x_len + w.w2 * f.x_uniq
                                     + w.w3 * f.x_shape + w.b))),
                  {out_decimals}) >= 0.5 AS INT) AS pred_label,
       f.y
FROM feats f CROSS JOIN w{iters} w"""
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes (the other classic cheap text classifier,
# complementing the GD-trained linear model above): closed-form
# training — three aggregations — and scoring as joins, no iteration.
# ---------------------------------------------------------------------------

def naive_bayes_confusion(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Multinomial Naive Bayes with Laplace smoothing, trained and
    applied in one relational plan; returns the (actual, predicted,
    n_docs) confusion matrix.

    PORTABILITY CONTRACT: every log-likelihood is integer-scaled at
    its source — ``CAST(ROUND(ln(p) * scale) AS BIGINT)`` per
    (token, class) — so document scores are EXACT integer sums
    (order-independent, unlike double summation); the argmax breaks
    ties on class name.  The only float op is the per-pair ln of an
    identically-computed double ratio, and a 1-ulp ln wobble moves an
    integer score by at most 1 micro-unit — argmax-stable.

    Scale shape: training is two hash aggregations (class totals,
    token-class counts) + one distinct (vocabulary size as a one-row
    broadcast, never a driver collect); scoring joins each token
    occurrence to the per-class likelihood table on (token, class) —
    an ordinary shuffle join at vocab scale — with the 5-row class
    frame broadcast.  No UDFs anywhere."""
    toks = docs.select(
        F.col(id_col),
        F.col(label_col).alias("_actual"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("token"),
    ).filter(F.length("token") > 0)

    n_total = docs.agg(F.count(F.lit(1)).alias("_nd"))
    vocab = toks.select("token").distinct().agg(
        F.count(F.lit(1)).alias("_v")
    )
    classes = (
        docs.groupBy(F.col(label_col).alias("_cls"))
        .agg(F.count(F.lit(1)).alias("_cnd"))
        .join(F.broadcast(n_total))
        .select(
            "_cls",
            (
                F.round(
                    F.log(
                        F.col("_cnd").cast("double")
                        / F.col("_nd").cast("double")
                    )
                    * scale
                )
            ).cast("long").alias("prior_i"),
        )
    )
    class_totals = (
        toks.groupBy("_actual")
        .agg(F.count(F.lit(1)).alias("_ct"))
        .join(F.broadcast(vocab))
        .select(
            F.col("_actual").alias("_cls"),
            "_ct",
            "_v",
            (
                F.round(
                    F.log(
                        F.lit(1.0)
                        / (F.col("_ct") + F.col("_v")).cast("double")
                    )
                    * scale
                )
            ).cast("long").alias("dflt_i"),
        )
    )
    likelihood = (
        toks.groupBy("token", F.col("_actual").alias("_cls"))
        .agg(F.count(F.lit(1)).alias("_ctc"))
        .join(class_totals.select("_cls", "_ct", "_v"), "_cls")
        .select(
            "token",
            "_cls",
            (
                F.round(
                    F.log(
                        (F.col("_ctc") + F.lit(1)).cast("double")
                        / (F.col("_ct") + F.col("_v")).cast("double")
                    )
                    * scale
                )
            ).cast("long").alias("lp_i"),
        )
    )
    class_frame = class_totals.select("_cls", "dflt_i").join(
        classes, "_cls"
    )
    # Disambiguate the shared-lineage self-join explicitly (likelihood
    # derives from toks): rename its join keys so the equi-join
    # condition can never collapse to a trivially-true same-attribute
    # compare.
    lk = likelihood.select(
        F.col("token").alias("_lk_token"),
        F.col("_cls").alias("_lk_cls"),
        "lp_i",
    )
    scored = (
        toks.join(F.broadcast(class_frame))
        .join(
            lk,
            (F.col("token") == F.col("_lk_token"))
            & (F.col("_cls") == F.col("_lk_cls")),
            "left",
        )
        .select(
            F.col(id_col).alias("_doc"),
            F.col("_actual").alias("actual_lang"),
            F.col("_cls").alias("_pred_cls"),
            F.col("prior_i"),
            F.coalesce(F.col("lp_i"), F.col("dflt_i")).alias("_lp"),
        )
        .groupBy("_doc", "actual_lang", "_pred_cls", "prior_i")
        .agg(F.sum("_lp").alias("_s"))
        .select(
            "_doc",
            "actual_lang",
            "_pred_cls",
            (F.col("prior_i") + F.col("_s")).alias("score_i"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("_doc").orderBy(
        F.col("score_i").desc(), F.col("_pred_cls").asc()
    )
    preds = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return (
        preds.groupBy(
            "actual_lang", F.col("_pred_cls").alias("predicted_lang")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual_lang", "predicted_lang")
    )


def naive_bayes_confusion_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> str:
    """DuckDB SQL computing the identical NB confusion matrix (same
    integer-scaled log-likelihoods, same all-integer scores, same
    class-name tiebreak)."""
    return f"""
    WITH toks_raw AS (
      SELECT {id_col}, {label_col} AS actual,
             UNNEST(string_split_regex(LOWER({text_col}), '\\s+')) AS token
      FROM {table}
    ),
    toks AS (SELECT * FROM toks_raw WHERE LENGTH(token) > 0),
    n_total AS (SELECT COUNT(*) AS nd FROM {table}),
    vocab AS (SELECT COUNT(DISTINCT token) AS v FROM toks),
    classes AS (
      SELECT {label_col} AS cls,
             CAST(ROUND(LN(CAST(COUNT(*) AS DOUBLE)
                           / CAST((SELECT nd FROM n_total) AS DOUBLE))
                        * {scale}) AS BIGINT) AS prior_i
      FROM {table} GROUP BY {label_col}
    ),
    class_totals AS (
      SELECT actual AS cls, COUNT(*) AS ct, (SELECT v FROM vocab) AS v,
             CAST(ROUND(LN(1.0 / CAST(COUNT(*) + (SELECT v FROM vocab)
                                       AS DOUBLE)) * {scale}) AS BIGINT)
               AS dflt_i
      FROM toks GROUP BY actual
    ),
    likelihood AS (
      SELECT t.token, t.actual AS cls,
             CAST(ROUND(LN(CAST(COUNT(*) + 1 AS DOUBLE)
                           / CAST(ct.ct + ct.v AS DOUBLE)) * {scale})
                  AS BIGINT) AS lp_i
      FROM toks t JOIN class_totals ct ON ct.cls = t.actual
      GROUP BY t.token, t.actual, ct.ct, ct.v
    ),
    scored AS (
      SELECT t.{id_col} AS doc, t.actual AS actual_lang, c.cls AS pred_cls,
             cl.prior_i + SUM(COALESCE(l.lp_i, c.dflt_i)) AS score_i
      FROM toks t
      CROSS JOIN class_totals c
      JOIN classes cl ON cl.cls = c.cls
      LEFT JOIN likelihood l ON l.token = t.token AND l.cls = c.cls
      GROUP BY t.{id_col}, t.actual, c.cls, cl.prior_i
    ),
    preds AS (
      SELECT actual_lang, pred_cls,
             ROW_NUMBER() OVER (PARTITION BY doc
                                ORDER BY score_i DESC, pred_cls ASC) AS rn
      FROM scored
    )
    SELECT actual_lang, pred_cls AS predicted_lang, COUNT(*) AS n_docs
    FROM preds WHERE rn = 1
    GROUP BY 1, 2 ORDER BY 1, 2
    """


def quality_calibration_bins(
    docs: DataFrame,
    iters: int = 4,
    lr: float = 1.0,
    bins: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reliability diagram for the distilled quality classifier — the
    calibration check (Guo et al. 2017) a filtering pipeline runs
    before trusting a learned keep/drop threshold: bin documents by
    predicted probability, compare mean predicted vs observed positive
    rate per bin (their gaps are the ECE terms).

    Float discipline: ``p_quality`` is already rounded to 1e-6 (the LR
    entry's per-step re-sync makes the weights, hence the score,
    engine-identical), so binning multiplies the SAME double in both
    engines (identical floor even at representation boundaries) and the
    per-bin mean sums exact 1e6-lattice BIGINTs with one final
    division.  One map pass + one ``bins``-ary groupBy on top of the
    trained scorer."""
    scored = quality_lr_score(docs, iters, lr, text_col, id_col)
    b = F.least(
        F.floor(F.col("p_quality") * bins).cast("int"), F.lit(bins - 1)
    )
    return (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").cast("long").alias("n_quality"),
            F.sum(
                F.round(F.col("p_quality") * 1000000.0).cast("long")
            ).alias("_ps"),
        )
        .select(
            "bin",
            "n_docs",
            "n_quality",
            F.round(
                F.col("_ps").cast("double") / 1000000.0 / F.col("n_docs"), 6
            ).alias("mean_predicted"),
            F.round(
                F.col("n_quality").cast("double") / F.col("n_docs"), 6
            ).alias("observed_rate"),
        )
        .orderBy("bin")
    )


def quality_calibration_oracle_sql(
    iters: int = 4,
    lr: float = 1.0,
    bins: int = 10,
    table: str = "documents",
) -> str:
    """:func:`quality_calibration_bins` oracle: the full LR oracle as
    a subquery, binned with the same 1e6-lattice mean."""
    inner = quality_lr_oracle_sql(iters=iters, lr=lr, table=table)
    return f"""
SELECT LEAST(CAST(FLOOR(p_quality * {bins}) AS INT), {bins - 1}) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(y) AS BIGINT) AS n_quality,
       ROUND(CAST(SUM(CAST(ROUND(p_quality * 1000000.0) AS BIGINT))
                  AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS mean_predicted,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS observed_rate
FROM (
{inner}
) scored
GROUP BY 1
ORDER BY bin"""


def label_noise_candidates(
    docs: DataFrame,
    iters: int = 4,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Confident-learning label-noise detection (Northcutt, Jiang &
    Chuang 2021, the cleanlab rule) over the distilled quality
    classifier: a document is a suspected label error when its
    predicted probability for the OTHER class reaches that class's
    self-confidence threshold t_j = mean p_j over documents labeled j.
    The curation use: audit the heuristic teacher's labels before
    retraining on them.

    Binary form: flag (y=0, p1 >= t1) as suspected-1 and
    (y=1, p0 >= t0) as suspected-0, where p1 = p_quality (already
    1e-6-rounded and engine-identical) and p0 = 1 - p1.  Thresholds
    are 1e-6-lattice means (exact BIGINT sums, one division), compared
    against lattice values — the boundary is engine-stable.  One
    scoring pass + one 2-row threshold aggregate broadcast back.

    Returns the flagged documents: (id, y, p_quality,
    suspected_label), ordered by id.
    """
    scored = quality_lr_score(docs, iters, lr, text_col, id_col)
    units = F.round(F.col("p_quality") * 1000000.0).cast("long")
    th = scored.groupBy("y").agg(
        F.sum(units).alias("_su"), F.count(F.lit(1)).alias("_n")
    ).select(
        "y",
        (F.col("_su").cast("double") / 1000000.0 / F.col("_n")).alias("_t1"),
    )
    t1 = th.filter(F.col("y") == 1).select(F.col("_t1").alias("_thr1"))
    t0 = th.filter(F.col("y") == 0).select(
        (1.0 - F.col("_t1")).alias("_thr0")
    )
    flagged = (
        scored.crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t0))
        .withColumn(
            "suspected_label",
            F.when(
                (F.col("y") == 0) & (F.col("p_quality") >= F.col("_thr1")),
                F.lit(1),
            ).when(
                (F.col("y") == 1)
                & (1.0 - F.col("p_quality") >= F.col("_thr0")),
                F.lit(0),
            ),
        )
        .filter(F.col("suspected_label").isNotNull())
    )
    return flagged.select(
        id_col, "y", "p_quality", "suspected_label"
    ).orderBy(id_col)
