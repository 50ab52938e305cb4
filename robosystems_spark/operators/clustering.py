"""Distributed k-means document clustering over embedding columns.

The LLM-curation use: cluster the corpus embedding space to stratify
sampling, find topic-duplicate groups, or pick cluster representatives
(operators/corpus.py).  The reference has no clustering operator — this
extends the engine the way the brief's training-data pipeline requires.

Spark-first shape: every Lloyd iteration is DataFrame work —
assignment is one Arrow-batched matmul per batch
(functions/vector.py nearest_centroid), the centroid update is
``posexplode -> groupBy(cluster, dim) -> avg`` — so the corpus never
leaves the cluster; only the (k x dim) centroid matrix is collected
per iteration (exactly what Spark MLlib's KMeans collects).

PORTABILITY CONTRACT (what makes this approximate-looking iterative
algorithm hash-checkable against DuckDB): deterministic init (the k
lowest-id vectors), float64 math, and every centroid element ROUNDed
to ``round_decimals`` after each update on BOTH engines, which
re-synchronizes the ~1e-15 summation-order drift before it can
compound across iterations.  ``kmeans_oracle_sql`` emits the same
computation as unrolled CTE chains (DuckDB list_cosine_similarity +
per-dimension AVG + list(ORDER BY) rebuild).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.checkpointing import materialize

from robosystems_spark.functions import vector as V

# Corpora up to this many vectors train Lloyd on a DRIVER-RESIDENT
# matrix: one bounded collect (the same per-process budget class as
# ann_graph._BROADCAST_VEC_MAX / graph.MAX_BROADCAST_NODES — ~100 MB of
# float64 at 64 dims), then every iteration is two numpy matmuls
# instead of a Spark job pipeline.  The distributed path — the 100 TB
# plan — is unchanged above the gate and stays pinned by the
# forced-gate tests (resident_max=0).  Training runs INSIDE each
# calling query invocation either way; nothing is memoized.
RESIDENT_FIT_MAX = 200_000


def _collect_matrix(emb: DataFrame, vec_col: str, id_col: str):
    """(ids, float64 matrix) sorted by id — one bounded collect."""
    import numpy as np

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows])
    order = np.argsort(ids, kind="stable")
    mat = np.array([r[1] for r in rows], dtype=np.float64)[order]
    return ids[order], mat


def _resident_assign(mat, cents, metric: str):
    """Nearest-centroid ids over a resident matrix — the same formulas
    (and first-extreme = lowest-id tie-break) as the Arrow-batched
    ``functions.vector.nearest_centroid`` UDF, which scores each row
    independently, so the two paths are bit-identical per row."""
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    if metric == "cosine":
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
        An = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
        )
        return np.argmax(An @ Cn.T, axis=1)
    d2 = -2.0 * (mat @ C.T) + np.einsum("ij,ij->i", C, C)[None, :]
    return np.argmin(d2, axis=1)


def _resident_lloyd(
    mat,
    k: int,
    iters: int,
    round_decimals: int,
    metric: str,
) -> list[list[float]]:
    """Driver-resident Lloyd over an id-sorted matrix: identical
    contract to the distributed path — k-lowest-id rounded seed,
    per-step rounded means, empty clusters keep their previous
    centroid.  The per-step ROUND is the same cross-engine float
    contract that already absorbs DuckDB-vs-Spark summation-order
    drift; numpy's mean sits inside the same tolerance
    (equality is pinned against the distributed path across all local
    SFs in tests/test_clustering_resident.py)."""
    import numpy as np

    cents = [list(np.round(mat[i], round_decimals)) for i in range(k)]
    for _ in range(iters):
        cid = _resident_assign(mat, cents, metric)
        new = []
        for c in range(k):
            members = mat[cid == c]
            if len(members):
                new.append(
                    list(np.round(members.mean(axis=0), round_decimals))
                )
            else:
                new.append(cents[c])
        cents = new
    return [[float(x) for x in c] for c in cents]


def _init_centroids(
    emb: DataFrame, k: int, vec_col: str, id_col: str, round_decimals: int
) -> list[list[float]]:
    """The k lowest-id vectors, cast to double and rounded — the
    deterministic seed both engines agree on."""
    rows = (
        emb.orderBy(id_col)
        .limit(k)
        .select(
            F.expr(
                f"transform({vec_col}, x -> round(cast(x as double), "
                f"{round_decimals}))"
            ).alias("c")
        )
        .collect()
    )
    return [list(r["c"]) for r in rows]


def _lloyd_update(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
    round_decimals: int,
    metric: str = "cosine",
) -> list[list[float]]:
    """One Lloyd step: assign, then per-cluster element-wise mean.
    Empty clusters keep their previous centroid.  Only k x dim doubles
    come back to the driver."""
    assigned = emb.select(
        F.col(vec_col),
        V.nearest_centroid(vec_col, centroids, metric).alias("cid"),
    )
    means = (
        assigned.select("cid", F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.round(F.avg(F.col("x").cast("double")), round_decimals).alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pairs"))
        .select("cid", F.expr("transform(pairs, p -> p.m)").alias("c"))
        .collect()
    )
    new = {r["cid"]: list(r["c"]) for r in means}
    return [new.get(i, centroids[i]) for i in range(len(centroids))]


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
    metric: str = "cosine",
    corpus_count: int | None = None,
    resident_max: int = RESIDENT_FIT_MAX,
) -> list[list[float]]:
    """Train centroids with ``iters`` Lloyd updates from the
    deterministic seed.  Returns the final (k x dim) centroid list.

    Tier dispatch by measured size (r12): corpora within
    ``resident_max`` collect once and iterate on the driver
    (:func:`_resident_lloyd` — replaces ~3 Spark jobs per iteration
    with two matmuls; measured 1.44s -> ~0.2s at sf0.1), larger
    corpora keep the distributed per-iteration plan.  Both tiers
    return identical centroids (pinned in tests)."""
    if corpus_count is None:
        corpus_count = emb.count()
    if corpus_count <= resident_max:
        _ids, mat = _collect_matrix(emb, vec_col, id_col)
        return _resident_lloyd(mat, k, iters, round_decimals, metric)
    centroids = _init_centroids(emb, k, vec_col, id_col, round_decimals)
    for _ in range(iters):
        centroids = _lloyd_update(
            emb, centroids, vec_col, id_col, round_decimals, metric
        )
    return centroids


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> DataFrame:
    """Tag every vector with its nearest centroid id (max cosine, or
    min squared-L2) — ties break to the lowest id, matching the
    oracle's row_number."""
    return emb.select(
        F.col(id_col),
        V.nearest_centroid(vec_col, centroids, metric).alias("centroid_id"),
    )


def kmeans(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
) -> DataFrame:
    """Fit + final assignment: (id_col, centroid_id) for every vector."""
    centroids = kmeans_fit(emb, k, iters, vec_col, id_col, round_decimals)
    return kmeans_assign(emb, centroids, vec_col, id_col)


def kmeans_cluster_profile(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cluster size profile: (centroid_id, n_vectors) sorted by id —
    the quick skew check before using clusters for stratification."""
    return (
        kmeans(emb, k, iters, vec_col, id_col)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("centroid_id")
    )


def _nearest_order_sql(vec_sql: str, cent: str, metric: str) -> str:
    """The ORDER BY that picks the nearest centroid — formula-identical
    to functions/vector.py nearest_centroid (the l2 form drops the
    per-row ||x||^2 constant on both engines)."""
    if metric == "cosine":
        return f"LIST_COSINE_SIMILARITY({vec_sql}, {cent}.cvec) DESC"
    return (
        f"(-2 * LIST_DOT_PRODUCT({vec_sql}, {cent}.cvec) "
        f"+ LIST_DOT_PRODUCT({cent}.cvec, {cent}.cvec)) ASC"
    )


def lloyd_ctes(
    prefix: str,
    k: int,
    iters: int,
    dim: int,
    table: str,
    vec_sql: str,
    elem_sql: str,
    id_col: str,
    round_decimals: int,
    metric: str = "cosine",
) -> tuple[list[str], str]:
    """The unrolled Lloyd loop as CTE strings: init -> (assign ->
    means -> rebuild) x iters.  ``vec_sql`` is a DOUBLE[] format
    string over row-alias placeholder ``{e}`` (e.g.
    ``"CAST({e}embedding AS DOUBLE[])"``); ``elem_sql`` likewise for
    its 1-based ``gs.pos`` element access.  Returns the CTE list and
    the name of the final centroid CTE (cid, cvec).  Shared by the
    k-means oracle and the per-subspace PQ codebook oracle."""
    r = round_decimals
    p = prefix
    init_vec = vec_sql.format(e="")
    vec_sql = vec_sql.format(e="e.")
    elem_sql = elem_sql.format(e="e.")
    parts = [
        f"""{p}cent0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS INT) AS cid,
         LIST_TRANSFORM({init_vec}, x -> ROUND(x, {r})) AS cvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {k})
)"""
    ]
    for i in range(iters):
        parts.append(
            f"""{p}assign{i} AS (
  SELECT {id_col}, cid FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY {_nearest_order_sql(vec_sql, 'c', metric)}, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {p}cent{i} c
  ) WHERE rn = 1
)"""
        )
        parts.append(
            f"""{p}means{i} AS (
  SELECT a.cid, gs.pos,
         ROUND(AVG({elem_sql}), {r}) AS m
  FROM {p}assign{i} a
  JOIN {table} e USING ({id_col})
  CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {dim})) AS pos) gs
  GROUP BY a.cid, gs.pos
)"""
        )
        parts.append(
            f"""{p}cent{i + 1} AS (
  SELECT c.cid, COALESCE(m.cvec, c.cvec) AS cvec
  FROM {p}cent{i} c
  LEFT JOIN (
    SELECT cid, LIST(m ORDER BY pos) AS cvec FROM {p}means{i} GROUP BY cid
  ) m USING (cid)
)"""
        )
    return parts, f"{p}cent{iters}"


def kmeans_oracle_sql(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
    metric: str = "cosine",
    profile: bool = False,
) -> str:
    """DuckDB SQL computing the identical clustering: the Lloyd loop
    unrolled into ``iters`` chained (assign -> means -> rebuild) CTE
    blocks with the same rounding contract.  ``profile`` emits the
    (centroid_id, n_vectors) aggregate instead of per-vector rows."""
    vec_fmt = f"CAST({{e}}{vec_col} AS DOUBLE[])"
    elem_fmt = f"CAST({{e}}{vec_col}[gs.pos] AS DOUBLE)"
    parts, final_cent = lloyd_ctes(
        "", k, iters, dim, table, vec_fmt, elem_fmt, id_col,
        round_decimals, metric,
    )
    vec_sql = vec_fmt.format(e="e.")
    parts.append(
        f"""final AS (
  SELECT {id_col}, cid AS centroid_id FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY {_nearest_order_sql(vec_sql, 'c', metric)}, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {final_cent} c
  ) WHERE rn = 1
)"""
    )
    if profile:
        select = (
            "SELECT centroid_id, COUNT(*) AS n_vectors FROM final "
            "GROUP BY centroid_id ORDER BY centroid_id"
        )
    else:
        select = f"SELECT {id_col}, centroid_id FROM final"
    return "WITH " + ",\n".join(parts) + "\n" + select


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster the
# embedding space, then near-dup only WITHIN clusters — the pairwise
# work drops from O(n^2) to O(sum cluster_size^2), and the modulo
# sub-split caps any one cluster's self-join at O(cap^2) (same
# discipline as the Jaccard block cap and the LSH bucket cap).
# ---------------------------------------------------------------------------


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.95,
    cluster_cap: int = 1024,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
    ndigits: int = 6,
) -> DataFrame:
    """Per-vector semantic-dedup decision: (id, centroid_id, is_kept,
    max_sim_to_lower).  A vector is DROPPED when some lower-id vector
    in its cluster (and modulo sub-block) has rounded cosine >= tau —
    the keep-lowest-id representative rule, applied within k-means
    clusters so nothing goes all-pairs."""
    from robosystems_spark.functions import vector as V

    centroids = kmeans_fit(
        emb, k, iters, vec_col, id_col, round_decimals
    )
    a = kmeans_assign(emb, centroids, vec_col, id_col).join(
        emb.select(id_col, vec_col), id_col
    )
    sizes = a.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("_csz"))
    a = (
        a.join(F.broadcast(sizes), "centroid_id")
        .withColumn(
            "_sub",
            F.col(id_col)
            % F.ceil(F.col("_csz") / F.lit(cluster_cap)).cast("long"),
        )
        .drop("_csz")
        # The assignment is an Arrow matmul per batch — checkpoint so
        # the self-join doesn't recompute it for both sides.
        .transform(materialize)
    )
    x, y = a.alias("x"), a.alias("y")
    sim = F.round(
        V.cosine(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}")), ndigits
    )
    dups = (
        x.join(
            y,
            (F.col("x.centroid_id") == F.col("y.centroid_id"))
            & (F.col("x._sub") == F.col("y._sub"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(F.col(f"y.{id_col}").alias(id_col), sim.alias("s"))
        .filter(F.col("s") >= tau)
        .groupBy(id_col)
        .agg(F.max("s").alias("max_sim_to_lower"))
    )
    return (
        a.select(id_col, "centroid_id")
        .join(dups, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.col("max_sim_to_lower").isNull().alias("is_kept"),
            "max_sim_to_lower",
        )
    )


def semantic_dedup_oracle_sql(
    k: int = 8,
    iters: int = 2,
    tau: float = 0.95,
    cluster_cap: int = 1024,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
    ndigits: int = 6,
) -> str:
    """DuckDB SQL for the identical decision table: the Lloyd chain
    (shared ``lloyd_ctes``) + final assignment + capped within-cluster
    pairwise with the same round-then-threshold contract."""
    vec_fmt = f"CAST({{e}}{vec_col} AS DOUBLE[])"
    elem_fmt = f"CAST({{e}}{vec_col}[gs.pos] AS DOUBLE)"
    parts, cent = lloyd_ctes(
        "", k, iters, dim, table, vec_fmt, elem_fmt, id_col,
        round_decimals, "cosine",
    )
    vec_sql = vec_fmt.format(e="e.")
    cos = (
        f"ROUND(LIST_COSINE_SIMILARITY(CAST(ex.{vec_col} AS DOUBLE[]), "
        f"CAST(ey.{vec_col} AS DOUBLE[])), {ndigits})"
    )
    parts.append(
        f"""af AS MATERIALIZED (
  SELECT {id_col}, cid AS centroid_id FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY {_nearest_order_sql(vec_sql, 'c', 'cosine')}, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {cent} c
  ) WHERE rn = 1
)"""
    )
    parts.append(
        f"""sz AS (
  SELECT centroid_id, COUNT(*) AS csz FROM af GROUP BY centroid_id
)"""
    )
    parts.append(
        f"""sub AS MATERIALIZED (
  SELECT af.{id_col}, af.centroid_id,
         af.{id_col} % CAST(CEIL(sz.csz / {cluster_cap}.0) AS BIGINT) AS sub
  FROM af JOIN sz USING (centroid_id)
)"""
    )
    parts.append(
        f"""dups AS (
  SELECT y.{id_col} AS {id_col}, MAX({cos}) AS max_sim_to_lower
  FROM sub x
  JOIN sub y ON x.centroid_id = y.centroid_id AND x.sub = y.sub
            AND x.{id_col} < y.{id_col}
  JOIN {table} ex ON ex.{id_col} = x.{id_col}
  JOIN {table} ey ON ey.{id_col} = y.{id_col}
  WHERE {cos} >= {tau}
  GROUP BY y.{id_col}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT s.{id_col}, s.centroid_id,
       d.max_sim_to_lower IS NULL AS is_kept,
       d.max_sim_to_lower
FROM sub s LEFT JOIN dups d USING ({id_col})"""
    )
