"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``cosine_topk`` — exact brute-force top-k, the correctness baseline.
  One broadcast of the query vectors, one pass over the corpus, a
  top-k per query (TakeOrderedAndProject after a window rank).
- ``ivf_topk`` — IVF-style approximate search: corpus is bucketed by
  nearest centroid (k-means-lite with deterministic seeding), queries
  probe only ``nprobe`` buckets.  At 100 TB the corpus pass becomes a
  partition-pruned scan of the probed buckets only.

All dot products / norms / centroid assignments are Arrow-vectorized
pandas UDFs (one numpy matmul per batch, ``functions/vector.py``) —
the interpreted ``aggregate(zip_with(...))`` formulation was measured
slower and doesn't codegen; row-at-a-time Python UDFs are banned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.functions import vector as V


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k nearest neighbors by cosine for every query vector.

    ``queries`` must have (query_id_col, vec_col).  Queries are
    broadcast (the small side by construction); ranking uses a window
    partitioned by query id with a deterministic (sim DESC, id ASC)
    tiebreak.  The per-pair work is ONE fused Arrow batch pass
    (dot + norms + divide in a single numpy kernel — separate
    norm/dot UDF stages measured ~2x slower, see functions/vector.py).
    """
    c = corpus.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
    )
    sims = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "nn_id",
        V.cosine("_cv", "_qv").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def train_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """K-means-lite centroid training, deterministically seeded by
    picking the ``num_centroids`` lowest-id vectors as init.

    Lloyd iterations are DataFrame aggregations (groupBy nearest
    centroid -> element-wise mean via ``posexplode``), so training
    scales out; only the (num_centroids x dim) result is collected.
    """
    init = (
        corpus.orderBy(id_col)
        .limit(num_centroids)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in row[vec_col]] for row in init]

    for _ in range(iters):
        assigned = assign_to_centroids(corpus, centroids, vec_col, id_col)
        means = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("mean"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mean"))).alias("pairs"))
            .select("centroid_id", F.expr("transform(pairs, p -> p.mean)").alias("centroid"))
            .collect()
        )
        new = dict(centroids_row for centroids_row in ((r["centroid_id"], list(r["centroid"])) for r in means))
        centroids = [new.get(i, centroids[i]) for i in range(len(centroids))]
    return list(enumerate(centroids))


def assign_to_centroids(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Tag every corpus vector with its nearest centroid id (max
    cosine): one batched (batch, dim) @ (dim, k) matmul, not k
    per-centroid expressions (which also ballooned driver-side plan
    analysis for large k)."""
    return corpus.select(
        id_col, vec_col, V.nearest_centroid(vec_col, centroids).alias("centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` centroids
    nearest to each query, then exact cosine within those buckets.

    Pass precomputed ``centroids`` (from ``train_centroids`` or
    ``ivf_write_index``) so the query path measures SEARCH only —
    training inline is supported for convenience but runs Lloyd
    iterations (driver-coordinated aggregations) per call, which does
    not belong in a hot query path.  At scale, write the assigned
    corpus partitioned by ``centroid_id`` (``ivf_write_index`` /
    ``ivf_topk_indexed``) so the probe is a partition-pruned read
    (nprobe/num_centroids of the data per query batch).
    """
    if centroids is None:
        centroids = [
            c
            for _, c in train_centroids(
                corpus, num_centroids, iters=3, vec_col=vec_col, id_col=id_col
            )
        ]
    cvecs = centroids
    assigned = assign_to_centroids(corpus, cvecs, vec_col, id_col)

    q_probe = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            V.top_centroids(vec_col, cvecs, nprobe).alias("probe_cids"),
        )
        .withColumn("centroid_id", F.explode("probe_cids"))
        .drop("probe_cids")
    )
    joined = assigned.join(F.broadcast(q_probe), "centroid_id")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        joined.select(
            "query_id",
            F.col(id_col).alias("nn_id"),
            # fused per-pair cosine: one Arrow pass, no carried norms
            V.cosine(vec_col, "_qv").alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def ivf_oracle_sql(
    num_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    nprobe: int = 3,
    k: int = 10,
    n_queries: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
) -> str:
    """DuckDB SQL for the full IVF pipeline with PORTABLE centroids
    (clustering.kmeans_fit's deterministic cosine Lloyd): train,
    assign the corpus, probe the ``nprobe`` nearest centroids per
    query, exact cosine within probed buckets, rank — bit-for-bit what
    the registry entry computes with queries ``{id_col} < n_queries``.
    Approximate-by-construction (a neighbor outside the probed buckets
    is missed identically in both engines), so the approximation
    itself is what gets hash-checked."""
    from robosystems_spark.operators import clustering as CL

    vec_fmt = f"CAST({{e}}{vec_col} AS DOUBLE[])"
    elem_fmt = f"CAST({{e}}{vec_col}[gs.pos] AS DOUBLE)"
    parts, cent = CL.lloyd_ctes(
        "ivf_", num_centroids, iters, dim, table, vec_fmt, elem_fmt,
        id_col, round_decimals, metric="cosine",
    )
    vec_sql = vec_fmt.format(e="e.")
    parts.append(
        f"""assigned AS (
  SELECT {id_col}, cid FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY LIST_COSINE_SIMILARITY({vec_sql}, c.cvec) DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {cent} c
  ) WHERE rn = 1
)"""
    )
    parts.append(
        f"""probes AS (
  SELECT query_id, cid FROM (
    SELECT e.{id_col} AS query_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY LIST_COSINE_SIMILARITY({vec_sql}, c.cvec) DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {cent} c
    WHERE e.{id_col} < {n_queries}
  ) WHERE rn <= {nprobe}
)"""
    )
    parts.append(
        f"""pairs AS (
  SELECT p.query_id, a.{id_col} AS nn_id,
         ROUND(LIST_COSINE_SIMILARITY(
           CAST(e.{vec_col} AS DOUBLE[]), CAST(q.{vec_col} AS DOUBLE[])
         ), 6) AS cosine
  FROM probes p
  JOIN assigned a USING (cid)
  JOIN {table} e ON e.{id_col} = a.{id_col}
  JOIN {table} q ON q.{id_col} = p.query_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT query_id, nn_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, nn_id ASC
         ) AS INT) AS rank
  FROM pairs
) WHERE rank <= {k}"""
    )


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Materialize the IVF index: corpus assigned to centroids and
    written hive-partitioned by ``centroid_id`` — the layout that turns
    a probe into a partition-pruned scan of ``nprobe/num_centroids`` of
    the data (the 100 TB scale path SCALE.md describes).  Returns the
    centroid vectors for the query-side probe computation."""
    centroids = train_centroids(corpus, num_centroids, iters=3, vec_col=vec_col, id_col=id_col)
    cvecs = [c for _, c in centroids]
    assign_to_centroids(corpus, cvecs, vec_col, id_col).write.partitionBy(
        "centroid_id"
    ).mode("overwrite").parquet(path)
    return cvecs


def ivf_topk_indexed(
    spark,
    path: str,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe a written IVF index: only the ``nprobe`` partitions per
    query are read (``centroid_id`` is a partition column, so the
    isin-filter prunes at the file index — verify with
    ``PartitionFilters`` in the plan)."""
    q_probe = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            V.top_centroids(vec_col, centroids, nprobe).alias("probe_cids"),
        )
        .withColumn("centroid_id", F.explode("probe_cids"))
        .drop("probe_cids")
    )
    # bounded collect: distinct probed centroid ids (<= nprobe * |queries|)
    probed = [r["centroid_id"] for r in q_probe.select("centroid_id").distinct().collect()]
    index = spark.read.parquet(path).filter(F.col("centroid_id").isin(probed))
    joined = index.join(F.broadcast(q_probe), "centroid_id")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        joined.select(
            "query_id",
            F.col(id_col).alias("nn_id"),
            V.cosine(vec_col, "_qv").alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def quantization_error_profile(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", levels: int = 255
) -> DataFrame:
    """Int8 scalar-quantization error profile: per-vector max/mean
    absolute reconstruction error under global min-max quantization to
    ``levels`` + 1 codes — the go/no-go check before shipping a
    quantized embedding store.

    Pure relational plan (posexplode -> 1-row min/max cross-join ->
    per-element error -> groupBy id): whole-stage codegen end to end,
    one keyed shuffle, the corpus-stats frame is a broadcast 1-row
    cross join exactly like the TF-IDF/BM25 corpus counts.
    """
    vals = emb.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("_pos", "_x"),
    ).select(id_col, F.col("_x").cast("double").alias("_x"))
    stats = vals.agg(
        F.min("_x").alias("_mn"), F.max("_x").alias("_mx")
    )
    j = vals.crossJoin(F.broadcast(stats))
    scale = (F.col("_mx") - F.col("_mn")) / levels
    code = F.round((F.col("_x") - F.col("_mn")) / scale)
    # degenerate corpus (all elements equal): scale = 0 would make the
    # error 0/0 = NaN; the true reconstruction error is exactly 0
    err = F.when(F.col("_mx") == F.col("_mn"), F.lit(0.0)).otherwise(
        F.abs(F.col("_x") - (F.col("_mn") + code * scale))
    )
    return (
        j.select(id_col, err.alias("_err"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.round(F.max("_err"), 6).alias("max_abs_err"),
            F.round(F.avg("_err"), 6).alias("mean_abs_err"),
        )
    )


def cosine_band_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lo: float = 0.20,
    hi: float = 0.32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for retrieval/contrastive training: for
    every query, the top-k corpus neighbors whose cosine falls in the
    band ``[lo, hi)`` — similar enough to be informative negatives,
    below the near-duplicate zone that would poison the label.

    Same single fused Arrow pass and broadcast-query shape as
    ``cosine_topk``; the band filter runs BEFORE the per-query window
    rank, so ranking state is only the in-band pairs.  Self-pairs are
    excluded explicitly (a query's own row has cosine 1.0, but the
    guard keeps the semantics honest if ``hi`` were ever raised).
    At 100 TB the corpus side is one scan; per-query state is the
    in-band top-k heap — the standard mining pass next to a trained
    retriever's checkpoint refresh.
    """
    c = corpus.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "nn_id",
            V.cosine("_cv", "_qv").alias("cosine"),
        )
        .filter(
            (F.col("nn_id") != F.col("query_id"))
            & (F.col("cosine") >= lo)
            & (F.col("cosine") < hi)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def sq8_fit(
    corpus: DataFrame,
    vec_col: str = "embedding",
) -> tuple[list[float], list[float]]:
    """Train an SQ8 scalar quantizer: per-dimension (lo, scale) with
    scale = (hi - lo) / 255 — one posexplode + groupBy(dim) aggregate
    over the corpus; only the 2*dim doubles come to the driver (the
    FAISS ScalarQuantizer QT_8bit train step)."""
    stats = (
        corpus.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "pos", "x"
            )
        )
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("pos")
        .collect()
    )
    lo = [float(r["lo"]) for r in stats]
    scale = [(float(r["hi"]) - float(r["lo"])) / 255.0 for r in stats]
    return lo, scale


def _sq8_reconstruct(vec_col, lo: list[float], scale: list[float]):
    """SQ8 quantize-then-reconstruct as one JVM-side array transform:
    r_i = lo_i + clamp_0_255(floor((x_i - lo_i)/scale_i + 0.5)) *
    scale_i (floor(x+0.5) is the explicit half-up shared with the SQL
    oracle — numpy/SQL ROUND disagree at .5).  Constant dimensions
    (scale 0) reconstruct to lo_i."""
    lo_arr = F.array(*[F.lit(float(v)) for v in lo])
    sc_arr = F.array(*[F.lit(float(v)) for v in scale])

    def recon(x, i):
        l = F.element_at(lo_arr, i + 1)
        s = F.element_at(sc_arr, i + 1)
        code = F.least(
            F.lit(255.0),
            F.greatest(F.lit(0.0), F.floor((x - l) / s + F.lit(0.5))),
        )
        return F.when(s == 0.0, l).otherwise(l + code * s)

    return F.transform(F.col(vec_col).cast("array<double>"), recon)


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    codebook: tuple[list[float], list[float]] | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Top-k ANN over SQ8 scalar-quantized vectors (FAISS SQ8): every
    vector is stored as dim uint8 codes (4x smaller than float32, 8x
    vs float64); search scores the SYMMETRIC reconstructed dot
    product.  100 TB shape: the (2*dim)-double codebook broadcasts as
    literals, reconstruction + dot run entirely in JVM array
    expressions (one sequential fold, matching the SQL oracle's
    list_dot_product order), and ranking reuses the cosine_topk
    window with the deterministic (score DESC, id ASC) tiebreak."""
    lo, scale = codebook if codebook is not None else sq8_fit(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("nn_id"),
        _sq8_reconstruct(vec_col, lo, scale).alias("_cr"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _sq8_reconstruct(vec_col, lo, scale).alias("_qr"),
    )
    dot = F.aggregate(
        F.zip_with("_cr", "_qr", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sims = c.crossJoin(F.broadcast(q)).select(
        "query_id", "nn_id", F.round(dot, decimals).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "score", "rank")
    )


MMR_SCHEMA = "query_id LONG, step INT, nn_id LONG, mmr_score DOUBLE"


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance diversified retrieval (Carbonell &
    Goldstein 1998) — the RAG re-selection step: from each query's
    exact-cosine top-``pool``, greedily pick ``k`` documents
    maximizing ``lam*sim(q,d) - (1-lam)*max sim(d, selected)`` so the
    context window isn't k copies of the same passage.

    Cross-engine determinism: every similarity is rounded to 6
    decimals BEFORE any comparison (the repo's cosine contract), the
    greedy argmax tie-breaks on id, and pairwise sims use the same
    dot/(na*nb) clamp as :mod:`functions.vector` — so the unrolled
    selection in the DuckDB oracle picks identical documents step for
    step.

    Scale: stage 1 is the broadcast-query exact top-k (or swap in any
    ANN tier); stage 2 is ``applyInPandas`` over ONE query's pool —
    pool × pool floats per group, never corpus-sized.  The greedy
    loop runs k times over ≤ pool candidates inside one task.
    """
    import numpy as np
    import pandas as pd

    cand = cosine_topk(corpus, queries, k=pool, vec_col=vec_col,
                       id_col=id_col)
    withv = cand.select("query_id", "nn_id", "cosine").join(
        corpus.select(
            F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_v")
        ),
        "nn_id",
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("nn_id").reset_index(drop=True)
        vv = np.array([list(v) for v in pdf["_v"]], dtype=np.float64)
        num = vv @ vv.T
        nrm = np.sqrt(np.einsum("ij,ij->i", vv, vv))
        sims = np.round(
            num / np.maximum(np.outer(nrm, nrm), 1e-300), 6
        )
        qs = pdf["cosine"].to_numpy()  # already round-6 by contract
        ids = pdf["nn_id"].to_numpy()
        qid = int(pdf["query_id"].iloc[0])
        chosen: list[int] = []
        remaining = list(range(len(ids)))
        rows = []
        for step in range(min(k, len(ids))):
            best = None
            for idx in remaining:
                div = max((sims[idx][c] for c in chosen), default=0.0)
                score = lam * qs[idx] - (1.0 - lam) * div
                key = (-score, ids[idx])
                if best is None or key < best[0]:
                    best = (key, idx, score)
            _, bidx, bscore = best
            chosen.append(bidx)
            remaining.remove(bidx)
            rows.append(
                (qid, step + 1, int(ids[bidx]), round(float(bscore), 6))
            )
        return pd.DataFrame(
            rows, columns=["query_id", "step", "nn_id", "mmr_score"]
        )

    return (
        withv.groupBy("query_id")
        .applyInPandas(mmr, MMR_SCHEMA)
        .orderBy("query_id", "step")
    )


def mmr_oracle_sql(
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    n_queries: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB SQL for :func:`mmr_topk`: the greedy selection unrolled
    into ``k`` argmax CTEs over the same round-6 similarities."""
    lam_s = f"{lam}e0"
    red_s = f"{1.0 - lam}e0"
    parts = [
        f"""q AS (SELECT {id_col} AS query_id, {vec_col} AS qv
      FROM {table} WHERE {id_col} < {n_queries}),
    allsims AS (
      SELECT q.query_id, e.{id_col} AS nn_id,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e.{vec_col} AS DOUBLE[]),
                                          CAST(q.qv AS DOUBLE[])), 6)
               AS qsim
      FROM {table} e JOIN q ON TRUE
    ),
    pool AS MATERIALIZED (
      SELECT query_id, nn_id, qsim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY qsim DESC, nn_id) AS rn
        FROM allsims
      ) WHERE rn <= {pool}
    ),
    pair AS MATERIALIZED (
      SELECT p1.query_id, p1.nn_id AS i, p2.nn_id AS j,
             ROUND(LIST_COSINE_SIMILARITY(CAST(e1.{vec_col} AS DOUBLE[]),
                                          CAST(e2.{vec_col} AS DOUBLE[])),
                   6) AS s
      FROM pool p1
      JOIN pool p2 ON p2.query_id = p1.query_id
      JOIN {table} e1 ON e1.{id_col} = p1.nn_id
      JOIN {table} e2 ON e2.{id_col} = p2.nn_id
    ),
    sel1 AS (
      SELECT query_id, nn_id, CAST(1 AS INT) AS step,
             ROUND({lam_s} * qsim, 6) AS mmr_score
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY {lam_s} * qsim DESC,
                                              nn_id) AS rn
        FROM pool
      ) WHERE rn = 1
    ),
    chosen1 AS (SELECT query_id, nn_id FROM sel1)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""sc{i} AS (
      SELECT p.query_id, p.nn_id, p.qsim,
             {lam_s} * p.qsim - {red_s} * (
               SELECT MAX(pr.s) FROM pair pr
               JOIN chosen{i - 1} c
                 ON c.query_id = pr.query_id AND c.nn_id = pr.j
               WHERE pr.query_id = p.query_id AND pr.i = p.nn_id
             ) AS sc
      FROM pool p
      WHERE NOT EXISTS (
        SELECT 1 FROM chosen{i - 1} c
        WHERE c.query_id = p.query_id AND c.nn_id = p.nn_id
      )
    ),
    sel{i} AS (
      SELECT query_id, nn_id, CAST({i} AS INT) AS step,
             ROUND(sc, 6) AS mmr_score
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sc DESC, nn_id) AS rn
        FROM sc{i}
      ) WHERE rn = 1
    ),
    chosen{i} AS MATERIALIZED (
      SELECT query_id, nn_id FROM chosen{i - 1}
      UNION ALL SELECT query_id, nn_id FROM sel{i}
    )"""
        )
    union = " UNION ALL ".join(
        f"SELECT query_id, nn_id, step, mmr_score FROM sel{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, step, nn_id, mmr_score
FROM ({union})
ORDER BY query_id, step"""
    )


def margin_bitext_mining(
    emb_a: DataFrame,
    emb_b: DataFrame,
    k: int = 4,
    top: int = 20,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    LASER/CCMatrix method): score every cross-lingual candidate pair
    by the RATIO margin — cosine normalized by the mean cosine of each
    side's k nearest neighbors — and keep the top pairs.  The margin
    cancels hubness (a vector that is close to everything gets a high
    denominator), which plain cosine thresholding cannot; this is the
    standard miner behind large-scale parallel-corpus construction.

    ``emb_a``/``emb_b``: (id, embedding) frames for the two sides.

    Float discipline: cosines round to 1e-6 and scale to BIGINT units;
    each side's k-NN sum is an exact integer (rank by units desc, id
    tie-break), so margin = 2k·r/(sx+sy) is ONE float division of
    exact integers, rounded once — hash-identical cross-engine.
    Pairs with a non-positive neighborhood sum are dropped (margin
    undefined; stated).  Scale: the candidate matrix is |A|x|B| with
    the smaller side broadcast — production miners narrow A/B to ANN
    shortlists first (compose with the IVF operators); the margin
    algebra is shortlist-agnostic."""
    if k < 1 or top < 1:
        raise ValueError("k and top must be >= 1")
    from robosystems_spark.checkpointing import materialize

    a = emb_a.select(F.col("id").alias("x"), F.col("embedding").alias("_xa"))
    b = emb_b.select(F.col("id").alias("y"), F.col("embedding").alias("_yb"))
    from robosystems_spark.functions import vector as V

    p = a.crossJoin(F.broadcast(b)).select(
        "x",
        "y",
        F.round(V.cosine("_xa", "_yb") * 1000000.0)
        .cast("long")
        .alias("_r"),
    ).transform(materialize)
    wx = Window.partitionBy("x").orderBy(F.desc("_r"), F.asc("y"))
    sx = (
        p.withColumn("_rn", F.row_number().over(wx))
        .filter(F.col("_rn") <= k)
        .groupBy("x")
        .agg(F.sum("_r").alias("_sx"))
    )
    wy = Window.partitionBy("y").orderBy(F.desc("_r"), F.asc("x"))
    sy = (
        p.withColumn("_rn", F.row_number().over(wy))
        .filter(F.col("_rn") <= k)
        .groupBy("y")
        .agg(F.sum("_r").alias("_sy"))
    )
    m = (
        p.join(sx, "x")
        .join(sy, "y")
        .filter(F.col("_sx") + F.col("_sy") > 0)
        .select(
            F.col("x").alias("src_id"),
            F.col("y").alias("tgt_id"),
            F.round(F.col("_r").cast("double") / 1000000.0, 6).alias(
                "cosine"
            ),
            F.round(
                (F.lit(float(2 * k)) * F.col("_r"))
                / (F.col("_sx") + F.col("_sy")),
                6,
            ).alias("margin"),
        )
    )
    return m.orderBy(
        F.desc("margin"), F.asc("src_id"), F.asc("tgt_id")
    ).limit(top)
