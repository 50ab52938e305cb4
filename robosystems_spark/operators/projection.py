"""Random-projection dimensionality reduction for embedding columns.

The Johnson-Lindenstrauss primitive of the embedding toolbox: project
``dim``-dimensional vectors through a seeded Gaussian matrix to
``out_dim`` dimensions, approximately preserving pairwise distances —
the standard preprocessing that makes hyperplane LSH, clustering, and
ANN cheaper at 100 TB (project once, bucket/search in the small
space; operators/dedup.py's hyperplane LSH is the 1-bit extreme of
the same idea).

Spark shape: ONE (batch, dim) @ (dim, out_dim) matmul per Arrow batch
against the closure-held matrix — a map-only pass, no shuffle.

PORTABILITY: the matrix comes from numpy's RandomState(seed)
(MT19937 — bit-stable across platforms and numpy versions), and the
oracle embeds the identical values as SQL literals, so the projected
output is hash-checkable like every other operator here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


def projection_matrix(dim: int, out_dim: int, seed: int = 42) -> np.ndarray:
    """The seeded Gaussian JL matrix, scaled by 1/sqrt(out_dim) so
    expected squared norms are preserved."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((dim, out_dim)) / np.sqrt(out_dim)


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """(id, projected array<double>) — one matmul per Arrow batch."""
    R = projection_matrix(dim, out_dim, seed)
    r = round_decimals

    @pandas_udf(ArrayType(DoubleType()))
    def _project(a: pd.Series) -> pd.Series:
        A = np.array(a.tolist(), dtype=np.float64)
        return pd.Series(list(np.round(A @ R, r)))

    return emb.select(F.col(id_col), _project(vec_col).alias("projected"))


def random_projection_long(
    emb: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Scalar-row shape of :func:`random_projection`:
    ``(id, dim_index int, value double)`` — one row per output dimension.

    Harness-friendly: array-typed result columns crash canonicalizers
    that sort raw pandas columns (round-4 driver gate), so registry
    entries expose this long shape while library users keep the
    array-typed API above.
    """
    proj = random_projection(
        emb, out_dim=out_dim, dim=dim, seed=seed,
        vec_col=vec_col, id_col=id_col, round_decimals=round_decimals,
    )
    return proj.select(
        F.col(id_col), F.posexplode("projected").alias("dim_index", "value")
    )


def random_projection_oracle_sql(
    out_dim: int = 16,
    dim: int = 64,
    seed: int = 42,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical projection: one
    LIST_DOT_PRODUCT against the same matrix column, per output dim."""
    R = projection_matrix(dim, out_dim, seed)
    cols = []
    for j in range(out_dim):
        lits = ", ".join(repr(float(v)) for v in R[:, j])
        cols.append(
            f"ROUND(LIST_DOT_PRODUCT(CAST({vec_col} AS DOUBLE[]), "
            f"[{lits}]), {round_decimals})"
        )
    return (
        f"SELECT {id_col}, [{', '.join(cols)}] AS projected FROM {table}"
    )


def embedding_covariance(
    emb: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Dimension-pair covariance of an embedding column — the input of
    whitening / PCA preprocessing (center, then rotate by the
    covariance eigenbasis) that typically precedes quantization or
    LSH over learned embeddings.

    Returns (dim_i, dim_j, cov) for i <= j (0-based), population
    covariance rounded for cross-engine hash checks.

    Scale shape: the corpus pass is ONE Arrow Gram-matrix partial per
    partition (A^T A + column sums + count — O(d^2) doubles each,
    independent of row count); the final reduce folds <=num-partition
    partials on the driver, the same bounded-collect pattern as the
    kmeans centroid step.  The 100 TB side is never shuffled at all.
    """
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("g", ArrayType(DoubleType())),
        ]
    )

    def gram(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [int(A.shape[0])],
                    "s": [A.sum(axis=0).tolist()],
                    "g": [(A.T @ A).ravel().tolist()],
                }
            )

    partials = emb.select(vec_col).mapInPandas(gram, schema).collect()
    n = sum(p["n"] for p in partials)
    S = np.zeros(dim)
    G = np.zeros((dim, dim))
    for p in partials:
        S += np.array(p["s"])
        G += np.array(p["g"]).reshape(dim, dim)
    mean = S / n
    cov = G / n - np.outer(mean, mean)
    rows = [
        (i, j, float(np.round(cov[i, j], round_decimals)))
        for i in range(dim)
        for j in range(i, dim)
    ]
    return emb.sparkSession.createDataFrame(
        rows, "dim_i int, dim_j int, cov double"
    )


def embedding_covariance_oracle_sql(
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical population covariance via the
    relational explode-join formulation (fine at oracle scale; the
    Spark side uses Arrow Gram partials for the 100 TB shape)."""
    return f"""
    WITH y AS (
      SELECT rn AS rid, gs.i AS i, CAST({vec_col}[gs.i] AS DOUBLE) AS v
      FROM (SELECT {vec_col}, ROW_NUMBER() OVER () AS rn FROM {table}) t,
           generate_series(1, {dim}) gs(i)
    ),
    n AS (SELECT COUNT(*) AS n FROM {table}),
    sums AS (SELECT i, SUM(v) AS s FROM y GROUP BY i),
    g AS (
      SELECT a.i AS di, b.i AS dj, SUM(a.v * b.v) AS sxy
      FROM y a JOIN y b ON a.rid = b.rid AND a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT CAST(g.di - 1 AS INT) AS dim_i, CAST(g.dj - 1 AS INT) AS dim_j,
           ROUND(g.sxy / n.n - (sa.s / n.n) * (sb.s / n.n),
                 {round_decimals}) AS cov
    FROM g
    JOIN sums sa ON sa.i = g.di
    JOIN sums sb ON sb.i = g.dj, n
    """


def random_projection_long_oracle_sql(
    out_dim: int = 16,
    dim: int = 64,
    seed: int = 42,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> str:
    """Scalar-row oracle for :func:`random_projection_long`: the array
    oracle laterally unnested via ``generate_series`` (DuckDB's
    WITH-ORDINALITY idiom), matching Spark's 0-based ``posexplode``."""
    inner = random_projection_oracle_sql(
        out_dim=out_dim, dim=dim, seed=seed, table=table,
        vec_col=vec_col, id_col=id_col, round_decimals=round_decimals,
    )
    return (
        f"SELECT {id_col}, CAST(gs.i - 1 AS INT) AS dim_index, "
        f"projected[gs.i] AS value "
        f"FROM ({inner}) base, generate_series(1, {out_dim}) AS gs(i)"
    )
