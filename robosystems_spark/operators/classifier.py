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
    feats = _feature_frame(docs, text_col, id_col).localCheckpoint(
        eager=True
    )
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
