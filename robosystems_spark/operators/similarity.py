"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``cosine_topk`` — exact brute-force top-k, the correctness baseline.
  One broadcast of the query vectors, one pass over the corpus, a
  top-k per query (TakeOrderedAndProject after a window rank).
- ``ivf_topk`` — IVF-style approximate search: corpus is bucketed by
  nearest centroid (k-means-lite with deterministic seeding), queries
  probe only ``nprobe`` buckets.  At 100 TB the corpus pass becomes a
  partition-pruned scan of the probed buckets only.

All dot products are JVM-side ``zip_with``/``aggregate`` expressions in
double precision — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _norm(col: str):
    return F.expr(
        f"sqrt(aggregate({col}, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


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
    tiebreak.
    """
    c = corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv"), _norm(vec_col).alias("_cn")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"), _norm(vec_col).alias("_qn")
    )
    sims = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "nn_id",
        F.round(_dot("_cv", "_qv") / (F.col("_cn") * F.col("_qn")), 6).alias("cosine"),
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
    """Tag every corpus vector with its nearest centroid id (max cosine)."""
    out = corpus
    sims = []
    for i, cvec in enumerate(centroids):
        out = out.withColumn(f"_c{i}", F.array(*[F.lit(float(x)) for x in cvec]))
        sims.append((_dot(vec_col, f"_c{i}") / (_norm(vec_col) * _norm(f"_c{i}"))).alias(f"_s{i}"))
    out = out.select(id_col, vec_col, *sims)
    best = F.greatest(*[F.col(f"_s{i}") for i in range(len(centroids))])
    cid = F.lit(0)
    for i in reversed(range(len(centroids))):
        cid = F.when(F.col(f"_s{i}") == best, F.lit(i)).otherwise(cid)
    return out.select(id_col, vec_col, cid.alias("centroid_id"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` centroids
    nearest to each query, then exact cosine within those buckets.

    At scale, write the assigned corpus partitioned by ``centroid_id``
    so the probe is a partition-pruned read (1/num_centroids*nprobe of
    the data per query batch).
    """
    centroids = train_centroids(corpus, num_centroids, iters=3, vec_col=vec_col, id_col=id_col)
    cvecs = [c for _, c in centroids]
    assigned = assign_to_centroids(corpus, cvecs, vec_col, id_col)

    q_assigned = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col))
    out = q_assigned
    sims = []
    for i, cvec in enumerate(cvecs):
        out = out.withColumn(f"_c{i}", F.array(*[F.lit(float(x)) for x in cvec]))
        sims.append((_dot(vec_col, f"_c{i}") / (_norm(vec_col) * _norm(f"_c{i}"))).alias(f"_s{i}"))
    out = out.select("query_id", vec_col, *sims)
    probes = F.expr(
        "slice(transform(array_sort(zip_with("
        + "array(" + ",".join(f"_s{i}" for i in range(len(cvecs))) + "), "
        + "sequence(0, " + str(len(cvecs) - 1) + "), (s, i) -> struct(-s AS negs, i AS cid))), "
        + f"p -> p.cid), 1, {nprobe})"
    )
    q_probe = out.select("query_id", F.col(vec_col).alias("_qv"), probes.alias("probe_cids")).withColumn(
        "centroid_id", F.explode("probe_cids")
    )
    joined = assigned.join(
        F.broadcast(q_probe.select("query_id", "_qv", "centroid_id")), "centroid_id"
    )
    sim = F.round(_dot(vec_col, "_qv") / (_norm(vec_col) * _norm("_qv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        joined.select(
            "query_id", F.col(id_col).alias("nn_id"), sim.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )
