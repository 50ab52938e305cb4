"""Arrow-vectorized vector math for the ANN / embedding paths.

Why not pure column expressions: Spark's higher-order functions
(``aggregate``/``zip_with``/``transform``) run on the INTERPRETED
expression path — no whole-stage codegen — so a per-pair dot product
in an ANN verify join pays a large per-element cost (measured 60x on
the simhash bit-vote before it was restructured).  A scalar
``pandas_udf`` receives Arrow record batches and computes the whole
batch as one numpy matmul/einsum — the vectorized slow-path the brief
prescribes when built-ins can't express the op efficiently (measured
~1.35x faster than the interpreted expression at 100k pairs locally,
and the gap grows with batch volume since the Arrow transfer cost
amortizes while the interpreted per-element cost doesn't).

Row-at-a-time Python UDFs remain banned everywhere
(tests/test_plans.py pins BatchEvalPython out of all paths; these
appear as ArrowEvalPython, allowed only in ANN paths).

Inputs are non-null fixed-dimension ``array<float|double>`` columns
(the embeddings table shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType

# All pandas_udf returnTypes in this module MUST be DataType instances,
# never DDL strings: a string returnType is parsed eagerly via
# _parse_datatype_string, which requires a live SparkContext — absent
# both at sessionless import time (pytest collection) and inside
# executor Python workers that unpickle the UDF and re-import this
# module.  tests/test_sessionless_import.py pins this.


def _mat(s: pd.Series) -> np.ndarray:
    """Arrow list column -> (batch, dim) float64 matrix."""
    return np.array(s.tolist(), dtype=np.float64)


@pandas_udf(DoubleType())
def _dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    A, B = _mat(a), _mat(b)
    return pd.Series(np.einsum("ij,ij->i", A, B))


@pandas_udf(DoubleType())
def _norm_udf(a: pd.Series) -> pd.Series:
    A = _mat(a)
    return pd.Series(np.sqrt(np.einsum("ij,ij->i", A, A)))


def _make_cosine_udf(ndigits: int):
    @pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A, B = _mat(a), _mat(b)
        num = np.einsum("ij,ij->i", A, B)
        den = np.maximum(
            np.sqrt(np.einsum("ij,ij->i", A, A))
            * np.sqrt(np.einsum("ij,ij->i", B, B)),
            1e-300,
        )
        return pd.Series(np.round(num / den, ndigits))

    return _cos


# fused cosine at the default rounding — the per-pair hot path as ONE
# Arrow round trip (dot + both norms + divide + round in a single
# numpy pass).  Separate dot/norm UDF stages measured ~2x slower at
# sf0.1 (extra Arrow transfers + Python-worker stages dominate small
# batches); at scale the fused form also shrinks the shuffled row
# (no carried norm columns).
_cosine6 = _make_cosine_udf(6)


def dot(a: str | Column, b: str | Column) -> Column:
    """Row-wise dot product of two array columns (one numpy einsum
    per Arrow batch)."""
    return _dot_udf(a, b)


def l2_norm(a: str | Column) -> Column:
    """Row-wise L2 norm of an array column."""
    return _norm_udf(a)


def nearest_centroid(
    vec_col: str | Column,
    centroids: list[list[float]],
    metric: str = "cosine",
) -> Column:
    """Nearest-centroid id for every vector (argmax cosine, or argmin
    squared-L2 with ``metric="l2"``): ONE (batch, dim) @ (dim, k)
    matmul per Arrow batch against the broadcast-in-closure centroid
    matrix — replaces k interpreted per-centroid dot expressions
    (which also cost seconds of driver-side analysis for large k).
    Ties break to the lowest centroid id (numpy first-extreme),
    matching the oracles' row_number order."""
    C = np.array(centroids, dtype=np.float64)  # (k, dim)
    if metric == "cosine":
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

        @pandas_udf(IntegerType())
        def _nearest(a: pd.Series) -> pd.Series:
            A = _mat(a)
            An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
            return pd.Series(np.argmax(An @ Cn.T, axis=1).astype(np.int32))

        return _nearest(vec_col)
    if metric != "l2":
        raise ValueError(f"unknown metric {metric!r}")
    cc = np.einsum("ij,ij->i", C, C)  # (k,)

    @pandas_udf(IntegerType())
    def _nearest_l2(a: pd.Series) -> pd.Series:
        A = _mat(a)
        # ||x||^2 is constant per row — drop it; argmin over
        # -2 x.c + ||c||^2 matches the oracle's full expansion
        d2 = -2.0 * (A @ C.T) + cc[None, :]
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return _nearest_l2(vec_col)


def top_centroids(
    vec_col: str | Column, centroids: list[list[float]], nprobe: int
) -> Column:
    """The ``nprobe`` nearest centroid ids (cosine, descending) per
    vector — the IVF probe list, as one matmul + argsort per batch.
    Ties break on the lower centroid id (stable sort on negated
    similarity), deterministic across engines."""
    C = np.array(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    n = min(nprobe, len(centroids))

    @pandas_udf(ArrayType(IntegerType()))
    def _probes(a: pd.Series) -> pd.Series:
        A = _mat(a)
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        sims = An @ Cn.T  # (batch, k)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n].astype(np.int32)
        return pd.Series(list(order))

    return _probes(vec_col)


def nearest_codes(
    vec_col: str | Column, codebooks: list[list[list[float]]]
) -> Column:
    """Product-quantization encode: for each of the m codebooks (one
    per contiguous subspace of the vector), the argmin-squared-L2 code
    id — all m codes in ONE Arrow pass per batch (reshape to
    (batch, m, sub_dim), one ||x-c||^2 distance tensor per codebook,
    argmin with first-min = lowest-code tie-break, matching the
    oracle's row_number order)."""
    CBs = [np.array(cb, dtype=np.float64) for cb in codebooks]  # m x (k, d)
    sub_dim = CBs[0].shape[1]
    m = len(CBs)

    @pandas_udf(ArrayType(IntegerType()))
    def _codes(a: pd.Series) -> pd.Series:
        A = _mat(a).reshape(len(a), m, sub_dim)
        codes = np.empty((len(a), m), dtype=np.int32)
        for j, C in enumerate(CBs):
            X = A[:, j, :]  # (batch, d)
            d2 = (
                np.einsum("ij,ij->i", X, X)[:, None]
                - 2.0 * X @ C.T
                + np.einsum("ij,ij->i", C, C)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return _codes(vec_col)


def cosine(
    a: str | Column,
    b: str | Column,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
    ndigits: int = 6,
) -> Column:
    """Rounded cosine similarity (zero-norm clamped to 1e-300 like the
    centroid paths, so zero vectors yield ~0 instead of NaN/Inf).

    Default: the fused single-UDF path.  Pass precomputed norm columns
    only when they already exist on the frame for other reasons — that
    variant splits into a dot UDF + JVM divide."""
    if a_norm is None and b_norm is None:
        return _cosine6(a, b) if ndigits == 6 else _make_cosine_udf(ndigits)(a, b)
    an = a_norm if a_norm is not None else l2_norm(a)
    bn = b_norm if b_norm is not None else l2_norm(b)
    return F.round(dot(a, b) / F.greatest(an * bn, F.lit(1e-300)), ndigits)
