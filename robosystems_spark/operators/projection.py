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


# ---------------------------------------------------------------------------
# PCA top principal component via power iteration — fully SQL-oracled
# (eigendecomposition is not SQL-expressible, but T matvec+normalize
# steps over the rounded covariance matrix are).
# ---------------------------------------------------------------------------


def pca_power_projection(
    emb: DataFrame,
    dim: int = 64,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cov_decimals: int = 6,
    iter_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """Project every vector onto the TOP principal component,
    estimated by ``iters`` power-iteration steps over the population
    covariance matrix: (id, pc1).

    Scale shape: the corpus is touched exactly twice, both map-only —
    once by the Arrow Gram-partial covariance pass (O(d^2) driver
    reduce, row-count independent) and once by the projection (a
    codegen zip_with dot against the literal component).  The power
    iteration itself runs on the d x d matrix on the driver — O(d^2)
    work, nothing distributed to iterate.

    PORTABILITY CONTRACT (same discipline as kmeans): the covariance
    input is rounded to ``cov_decimals`` on both engines; each
    iterate is re-rounded to ``iter_decimals`` after normalization,
    re-synchronizing ~1e-15 summation-order drift before it can
    compound; the projection output rounds to ``out_decimals``.
    Starting vector is the exact constant 1/sqrt(dim); the converged
    sign is determined by the iteration itself, so no sign convention
    is needed.
    """
    import math

    cov_rows = embedding_covariance(
        emb, dim, vec_col, id_col, cov_decimals
    ).collect()
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r["dim_i"], r["dim_j"]] = C[r["dim_j"], r["dim_i"]] = r["cov"]
    v = np.full(dim, round(1.0 / math.sqrt(dim), iter_decimals))
    for _ in range(iters):
        w = C @ v
        nrm = math.sqrt(float(np.dot(w, w)))
        if nrm < 1e-12:
            raise ValueError(
                "covariance matrix has no signal (zero matvec norm)"
            )
        v = np.round(w / nrm, iter_decimals)

    # Center: per-dimension mean rounded like the covariance, then the
    # offset mu . v subtracts driver-side.
    mean_rows = (
        emb.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(F.avg(F.col("x").cast("double")), cov_decimals).alias("m"))
        .collect()
    )
    mu = np.zeros(dim)
    for r in mean_rows:
        mu[r["pos"]] = r["m"]
    offset = float(np.dot(mu, v))

    lits = ", ".join(repr(float(x)) for x in v)
    dot = (
        f"aggregate(zip_with({vec_col}, array({lits}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), "
        f"(a, x) -> a + x)"
    )
    return emb.select(
        F.col(id_col),
        F.round(F.expr(dot) - F.lit(offset), out_decimals).alias("pc1"),
    )


def pca_power_oracle_sql(
    dim: int = 64,
    iters: int = 8,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cov_decimals: int = 6,
    iter_decimals: int = 9,
    out_decimals: int = 6,
) -> str:
    """DuckDB SQL computing the identical pc1 projection: the
    covariance oracle as a CTE, the power iteration unrolled into
    ``iters`` (matvec -> norm -> round) blocks, then a centered
    list_dot_product projection."""
    cov_inner = embedding_covariance_oracle_sql(
        dim=dim, table=table, vec_col=vec_col,
        round_decimals=cov_decimals,
    )
    parts = [
        f"cov AS MATERIALIZED ({cov_inner})",
        """covfull AS MATERIALIZED (
  SELECT dim_i AS i, dim_j AS j, cov FROM cov
  UNION ALL
  SELECT dim_j AS i, dim_i AS j, cov FROM cov WHERE dim_i <> dim_j
)""",
        f"""v0 AS (
  SELECT UNNEST(GENERATE_SERIES(0, {dim - 1})) AS dim,
         ROUND(1.0 / SQRT({dim}), {iter_decimals}) AS val
)""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT c.i AS dim, SUM(c.cov * v.val) AS val
  FROM covfull c JOIN v{t - 1} v ON v.dim = c.j
  GROUP BY c.i
)"""
        )
        parts.append(
            f"""v{t} AS MATERIALIZED (
  SELECT dim, ROUND(val / (SELECT SQRT(SUM(val * val)) FROM w{t}),
               {iter_decimals}) AS val
  FROM w{t}
)"""
        )
    parts.append(
        f"pvec AS (SELECT LIST(val ORDER BY dim) AS pv FROM v{iters})"
    )
    parts.append(
        f"""means AS (
  SELECT gs.i AS i,
         ROUND(AVG(CAST({vec_col}[gs.i] AS DOUBLE)), {cov_decimals}) AS m
  FROM {table}, generate_series(1, {dim}) gs(i)
  GROUP BY gs.i
)"""
    )
    parts.append("mvec AS (SELECT LIST(m ORDER BY i) AS mv FROM means)")
    parts.append(
        "off AS (SELECT LIST_DOT_PRODUCT(mv, pv) AS o FROM mvec, pvec)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT {id_col},
       ROUND(LIST_DOT_PRODUCT(CAST({vec_col} AS DOUBLE[]), pv) - o,
             {out_decimals}) AS pc1
FROM {table}, pvec, off"""
    )


def pca_power_components(
    emb: DataFrame,
    dim: int = 64,
    n_components: int = 3,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cov_decimals: int = 6,
    iter_decimals: int = 9,
    out_decimals: int = 6,
) -> DataFrame:
    """Top-``n_components`` PCA projection via power iteration WITH
    DEFLATION: after extracting component v_m, the covariance deflates
    to C - lambda_m v_m v_m^T (lambda_m = v_m^T C v_m) and the next
    component is the new dominant direction — the multi-component
    reduction whitening/compression pipelines actually use.

    Output: (id, pc1 .. pc{n_components}), centered projections.

    Same scale shape as :func:`pca_power_projection` (corpus touched
    twice, map-only; all iteration is d x d driver arithmetic) and the
    same rounding contract, extended with two deflation sync points:
    lambda rounds to ``iter_decimals`` and the deflated matrix
    re-rounds to ``cov_decimals`` before the next component.
    """
    import math

    cov_rows = embedding_covariance(
        emb, dim, vec_col, id_col, cov_decimals
    ).collect()
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r["dim_i"], r["dim_j"]] = C[r["dim_j"], r["dim_i"]] = r["cov"]

    comps: list[np.ndarray] = []
    for _ in range(n_components):
        v = np.full(dim, round(1.0 / math.sqrt(dim), iter_decimals))
        for _ in range(iters):
            w = C @ v
            nrm = math.sqrt(float(np.dot(w, w)))
            if nrm < 1e-12:
                raise ValueError(
                    "covariance exhausted before n_components "
                    "(zero matvec norm)"
                )
            v = np.round(w / nrm, iter_decimals)
        lam = round(float(v @ C @ v), iter_decimals)
        comps.append(v)
        C = np.round(C - lam * np.outer(v, v), cov_decimals)

    mean_rows = (
        emb.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.round(F.avg(F.col("x").cast("double")), cov_decimals).alias("m")
        )
        .collect()
    )
    mu = np.zeros(dim)
    for r in mean_rows:
        mu[r["pos"]] = r["m"]

    cols = [F.col(id_col)]
    for m, v in enumerate(comps, start=1):
        lits = ", ".join(repr(float(x)) for x in v)
        dot = (
            f"aggregate(zip_with({vec_col}, array({lits}), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), "
            f"(a, x) -> a + x)"
        )
        offset = float(np.dot(mu, v))
        cols.append(
            F.round(F.expr(dot) - F.lit(offset), out_decimals).alias(
                f"pc{m}"
            )
        )
    return emb.select(*cols)


def pca_components_oracle_sql(
    dim: int = 64,
    n_components: int = 3,
    iters: int = 8,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cov_decimals: int = 6,
    iter_decimals: int = 9,
    out_decimals: int = 6,
) -> str:
    """DuckDB SQL for the identical multi-component projection: per
    component an unrolled power chain over the (deflated) covariance,
    then a rank-1 deflation CTE re-rounded like the Spark side."""
    cov_inner = embedding_covariance_oracle_sql(
        dim=dim, table=table, vec_col=vec_col,
        round_decimals=cov_decimals,
    )
    parts = [
        f"cov AS MATERIALIZED ({cov_inner})",
        """cf0 AS MATERIALIZED (
  SELECT dim_i AS i, dim_j AS j, cov FROM cov
  UNION ALL
  SELECT dim_j AS i, dim_i AS j, cov FROM cov WHERE dim_i <> dim_j
)""",
    ]
    final_vs = []
    for m in range(n_components):
        parts.append(
            f"""v{m}_0 AS (
  SELECT UNNEST(GENERATE_SERIES(0, {dim - 1})) AS dim,
         ROUND(1.0 / SQRT({dim}), {iter_decimals}) AS val
)"""
        )
        for t in range(1, iters + 1):
            parts.append(
                f"""w{m}_{t} AS MATERIALIZED (
  SELECT c.i AS dim, SUM(c.cov * v.val) AS val
  FROM cf{m} c JOIN v{m}_{t - 1} v ON v.dim = c.j
  GROUP BY c.i
)"""
            )
            parts.append(
                f"""v{m}_{t} AS MATERIALIZED (
  SELECT dim, ROUND(val / (SELECT SQRT(SUM(val * val)) FROM w{m}_{t}),
               {iter_decimals}) AS val
  FROM w{m}_{t}
)"""
            )
        vfin = f"v{m}_{iters}"
        final_vs.append(vfin)
        if m < n_components - 1:
            parts.append(
                f"""lam{m} AS (
  SELECT ROUND(SUM(c.cov * vi.val * vj.val), {iter_decimals}) AS lam
  FROM cf{m} c
  JOIN {vfin} vi ON vi.dim = c.i
  JOIN {vfin} vj ON vj.dim = c.j
)"""
            )
            parts.append(
                f"""cf{m + 1} AS MATERIALIZED (
  SELECT c.i, c.j,
         ROUND(c.cov - (SELECT lam FROM lam{m}) * vi.val * vj.val,
               {cov_decimals}) AS cov
  FROM cf{m} c
  JOIN {vfin} vi ON vi.dim = c.i
  JOIN {vfin} vj ON vj.dim = c.j
)"""
            )
    for m, vfin in enumerate(final_vs, start=1):
        parts.append(
            f"pv{m} AS (SELECT LIST(val ORDER BY dim) AS pv FROM {final_vs[m - 1]})"
        )
    parts.append(
        f"""means AS (
  SELECT gs.i AS i,
         ROUND(AVG(CAST({vec_col}[gs.i] AS DOUBLE)), {cov_decimals}) AS m
  FROM {table}, generate_series(1, {dim}) gs(i)
  GROUP BY gs.i
)"""
    )
    parts.append("mvec AS (SELECT LIST(m ORDER BY i) AS mv FROM means)")
    sel = [f"{id_col}"]
    for m in range(1, n_components + 1):
        sel.append(
            f"ROUND(LIST_DOT_PRODUCT(CAST({vec_col} AS DOUBLE[]), "
            f"(SELECT pv FROM pv{m})) "
            f"- LIST_DOT_PRODUCT((SELECT mv FROM mvec), "
            f"(SELECT pv FROM pv{m})), {out_decimals}) AS pc{m}"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT "
        + ",\n       ".join(sel)
        + f"\nFROM {table}"
    )
