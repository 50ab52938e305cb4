"""Graph-based ANN: proximity-graph build + beam search (NSW/DiskANN
family) — the accuracy-frontier index real retrieval stacks default to.

Two pieces, both deterministic and both expressible as DataFrame plans:

1. **Graph build** (:func:`build_nsw_graph`): a blocked k-NN graph.
   Every vector keeps its ``M`` nearest neighbors (rounded cosine,
   id tie-break) among CANDIDATES that share at least one of its
   ``nb`` nearest k-means centroids — the same portable centroids the
   IVF index trains.  This is the standard scalable construction
   (all-pairs is never materialized; candidate volume is
   sum-of-squared-bucket-sizes, controlled by the centroid count the
   way IVF controls it: nc grows ~sqrt(n), bucket size stays bounded).
   At cluster scale the self-join shuffles on centroid id — a plain
   co-located equi-join, no broadcast nested loop.

2. **Beam search** (:func:`nsw_topk`): greedy best-first search with a
   beam of width ``ef`` (Malkov & Yashunin's NSW base layer; DiskANN /
   Vamana run exactly this shape over a single-layer graph from a
   fixed entry set instead of HNSW's hierarchy — Subramanya et al.
   2019).  Entry points are the deterministic stride sample
   ``id % entry_stride == 0`` (a spread seed set, the medoid-set
   analog).  Each hop expands the beam's out-neighbors, scores them,
   merges into the visited set, and re-takes the top ``ef``; after
   ``hops`` rounds the answer is the top ``k`` of everything visited.
   Every selection ranks on ROUND(cosine, 6) DESC with an id
   tie-break, so the search path — and therefore the approximation's
   exact output — is engine-stable and hash-oracle-able
   (:func:`nsw_oracle_sql` unrolls the identical hops in SQL, the
   ``_random_walk_ctes`` trick).

Scale shape: the per-hop work is (beam x M) candidate rows per query —
independent of corpus size; queries broadcast (bounded query batch,
the cosine_topk contract); the corpus-side joins are equi-joins on
vector id against the (distributed) graph and vector frames.  Nothing
iterates on the driver except the ``hops`` loop itself (a handful of
rounds, like the Pregel operators in operators/graph.py).

The reference engine has no vector index at all (SURVEY §2 — its
column types stop at scalars/lists); this continues the extension
family brute/IVF/PQ/IVFPQ/SQ8 in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.checkpointing import materialize
from robosystems_spark.functions import vector as V

__all__ = [
    "build_nsw_graph",
    "nsw_topk",
    "nsw_oracle_sql",
    "nsw_write_index",
    "nsw_topk_indexed",
    "hnsw_level_hash",
    "build_hnsw_graphs",
    "hnsw_topk",
    "hnsw_oracle_sql",
]


# Corpora up to this many vectors score candidate pairs via a
# BROADCAST vector matrix (64-dim float64 -> ~100 MB at the cap, the
# same per-executor budget class as operators.graph.MAX_BROADCAST_NODES);
# larger corpora keep the shuffle-join path.  Measured: the broadcast
# path moves only (src, dst) id pairs through Arrow (~26 MB for 1.6M
# pairs) instead of both 64-dim vectors per pair (~1.6 GB).
_BROADCAST_VEC_MAX = 200_000


def _score_pairs(
    corpus: DataFrame, pairs: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """(src, dst) id pairs -> (src, dst, cosine), bit-identical to
    ``V.cosine`` (same row-wise float64 einsum on gathered rows).  If
    the MEASURED corpus fits ``_BROADCAST_VEC_MAX``, vectors ride a
    broadcast id->row matrix and only the slim id pairs cross the
    Arrow boundary (``mapInPandas``); otherwise the vectors attach via
    two distributed equi-joins and the fused cosine UDF scores them."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if corpus.count() <= _BROADCAST_VEC_MAX:
        rows = corpus.select(id_col, vec_col).collect()
        ids = np.array([r[0] for r in rows])
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        order = np.argsort(ids)
        bcv = corpus.sparkSession.sparkContext.broadcast(
            (ids[order], mat[order])
        )
        out_schema = T.StructType(
            list(pairs.select("src", "dst").schema.fields)
            + [T.StructField("cosine", T.DoubleType())]
        )

        def _score(batches):
            sid, m = bcv.value
            for pdf in batches:
                if not len(pdf):
                    continue
                X = m[np.searchsorted(sid, pdf["src"].to_numpy())]
                Y = m[np.searchsorted(sid, pdf["dst"].to_numpy())]
                num = np.einsum("ij,ij->i", X, Y)
                den = np.maximum(
                    np.sqrt(np.einsum("ij,ij->i", X, X))
                    * np.sqrt(np.einsum("ij,ij->i", Y, Y)),
                    1e-300,
                )
                yield pd.DataFrame(
                    {
                        "src": pdf["src"],
                        "dst": pdf["dst"],
                        "cosine": np.round(num / den, 6),
                    }
                )

        return pairs.select("src", "dst").mapInPandas(_score, out_schema)

    vec_s = corpus.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("_sv")
    )
    vec_d = corpus.select(
        F.col(id_col).alias("dst"), F.col(vec_col).alias("_dv")
    )
    return (
        pairs.join(vec_s, "src")
        .join(vec_d, "dst")
        .select("src", "dst", V.cosine("_sv", "_dv").alias("cosine"))
    )


def build_nsw_graph(
    corpus: DataFrame,
    centroids: list[list[float]],
    M: int = 6,
    nb: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Blocked k-NN graph: ``(src, dst, cosine)`` with the top-``M``
    neighbors per src among vectors sharing >= 1 of the ``nb`` nearest
    centroids.  Deterministic given ``centroids`` (rounded-cosine
    ranking, dst tie-break).

    Candidate pairs stay SLIM (two ids) through the bucket self-join
    and the shared-two-buckets dedup; vectors attach afterwards via
    two id equi-joins.  Carrying both 64-dim vectors through the
    dedup shuffle cost ~5 GB of exchange at a 2k-vector corpus
    (bench-sweep catch: 28s -> ~4s).  r11: only the ``src < dst``
    HALF of each pair is generated, deduplicated, and scored; the
    mirror is a free select over the materialized half (cosine is
    symmetric BIT-exactly: the row-wise einsum dot commutes
    elementwise and the norm product commutes in float64), halving
    the dedup shuffle and the scoring-UDF Arrow traffic."""
    memb = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(V.top_centroids(vec_col, centroids, nb)).alias("_cid"),
    )
    cand = (
        memb.select("_cid", F.col("_id").alias("src"))
        .join(memb.select("_cid", F.col("_id").alias("dst")), "_cid")
        .filter(F.col("src") < F.col("dst"))
        # a pair sharing two buckets must count once
        .dropDuplicates(["src", "dst"])
    )
    half = materialize(_score_pairs(corpus, cand, vec_col, id_col))
    scored = half.unionByName(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "cosine"
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= M)
        .select("src", "dst", "cosine")
    )


def nsw_topk(
    corpus: DataFrame,
    graph: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ef: int = 12,
    hops: int = 3,
    entry_stride: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Beam search over ``graph``: returns ``(query_id, nn_id, cosine,
    rank)`` with rank <= k, ranked over EVERYTHING visited (entry
    scores + all expanded frontiers), the standard best-first ANN
    answer set."""
    vecs = corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    # the graph is consumed once PER HOP: un-materialized, Catalyst
    # re-inlines (and re-executes) the whole blocked build into every
    # hop's plan — measured 28s vs ~4s at sf0.1 (bench-sweep catch)
    edges = materialize(graph.select("src", "dst"))
    # measured-size broadcast gate (the _state_bc discipline): a graph
    # under ~2M edges (16B/row -> ~32 MB) broadcasts into every hop's
    # frontier join, removing one shuffle per hop; web-scale graphs
    # keep the shuffle path
    if edges.count() <= 2_000_000:
        edges = F.broadcast(edges)

    entries = vecs.filter(F.col("nn_id") % entry_stride == 0)
    visited = materialize(
        entries.crossJoin(F.broadcast(q)).select(
            "query_id", "nn_id", V.cosine("_cv", "_qv").alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nn_id")
    )
    beam = (
        visited.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= ef)
        .drop("_rn")
    )
    for h in range(hops):
        frontier = (
            beam.join(edges, beam["nn_id"] == edges["src"])
            .select("query_id", F.col("dst").alias("nn_id"))
            .distinct()
        )
        # dedup ONLY the new frontier against the accumulated visited
        # set (anti-join), then append: re-shuffling the whole visited
        # set through dropDuplicates every hop re-paid the full
        # accumulated width per hop (r10 verdict item 3).  A
        # re-visited node would score identically (cosine is a
        # function of the pair), so anti-join + blind union is exact.
        # visited is bounded by (entries + hops*beam*M) per query — a
        # bounded query batch by contract, so the broadcast is safe.
        fresh = frontier.join(
            F.broadcast(visited), ["query_id", "nn_id"], "left_anti"
        )
        scored = (
            fresh.join(vecs, "nn_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "nn_id", V.cosine("_cv", "_qv").alias("cosine")
            )
        )
        # materialized per hop so lineage stays one-hop deep (beam,
        # anti-join, and union all re-read visited; a lazy hop in
        # between re-executed the hop plan 3x — measured slower)
        visited = materialize(visited.unionByName(scored))
        beam = (
            visited.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= ef)
            .drop("_rn")
        )
    return (
        visited.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def nsw_write_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    M: int = 8,
    nb: int = 3,
    n_buckets: int = 32,
    entry_stride: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the proximity graph as a DISK-RESIDENT index (the
    DiskANN shape): adjacency lists and vectors hive-partitioned by
    ``id % n_buckets``, plus the stride entry sample as its own tiny
    dataset.  A beam search then touches only the buckets its frontier
    names — partition-pruned reads of O(beam * M) rows per hop instead
    of a full graph scan (verify with PartitionFilters in the plan,
    the ivf_write_index discipline)."""
    graph = build_nsw_graph(
        corpus, centroids, M=M, nb=nb, vec_col=vec_col, id_col=id_col
    )
    adj = graph.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("dsts")
    )
    adj.withColumn("bucket", F.pmod(F.col("src"), F.lit(n_buckets))).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(f"{path}/graph")
    vecs = corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("vec")
    )
    vecs.withColumn("bucket", F.pmod(F.col("nn_id"), F.lit(n_buckets))).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(f"{path}/vectors")
    vecs.filter(F.col("nn_id") % entry_stride == 0).write.mode(
        "overwrite"
    ).parquet(f"{path}/entries")


def nsw_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    ef: int = 20,
    hops: int = 4,
    n_buckets: int = 32,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Beam search over a written index: per hop, the frontier's
    bucket set (a BOUNDED collect, <= ef * |queries| ids) prunes both
    the adjacency and the vector reads to the named partitions —
    per-query IO proportional to the beam, not the corpus.  Returns
    identical values to :func:`nsw_topk` over the same graph/params
    (pytest-pinned)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    entries = spark.read.parquet(f"{path}/entries")
    visited = entries.crossJoin(F.broadcast(q)).select(
        "query_id", "nn_id", V.cosine("vec", "_qv").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nn_id")
    )
    beam = (
        visited.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= ef)
        .drop("_rn")
    )
    for _ in range(hops):
        frontier = beam.select("query_id", "nn_id").cache()
        fbuckets = [
            r[0]
            for r in frontier.select(
                F.pmod(F.col("nn_id"), F.lit(n_buckets))
            )
            .distinct()
            .collect()
        ]
        adj = spark.read.parquet(f"{path}/graph").filter(
            F.col("bucket").isin(fbuckets)
        )
        expand = (
            frontier.join(adj, frontier["nn_id"] == adj["src"])
            .select("query_id", F.explode("dsts").alias("nn_id"))
            .distinct()
            .cache()
        )
        cbuckets = [
            r[0]
            for r in expand.select(F.pmod(F.col("nn_id"), F.lit(n_buckets)))
            .distinct()
            .collect()
        ]
        cvecs = spark.read.parquet(f"{path}/vectors").filter(
            F.col("bucket").isin(cbuckets)
        )
        scored = (
            expand.join(cvecs, "nn_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "nn_id", V.cosine("vec", "_qv").alias("cosine")
            )
        )
        visited = visited.unionByName(scored).dropDuplicates(
            ["query_id", "nn_id"]
        )
        beam = (
            visited.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= ef)
            .drop("_rn")
        )
        frontier.unpersist()
        expand.unpersist()
    return (
        visited.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def nsw_oracle_sql(
    num_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    M: int = 6,
    nb: int = 2,
    k: int = 10,
    ef: int = 12,
    hops: int = 3,
    entry_stride: int = 16,
    n_queries: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
) -> str:
    """DuckDB SQL for the FULL pipeline — centroid training (the
    shared Lloyd CTEs), blocked graph build, and the beam search
    unrolled hop by hop — bit-for-bit what ``build_nsw_graph`` +
    ``nsw_topk`` compute.  The approximation itself is hash-checked,
    not just row counts."""
    from robosystems_spark.operators import clustering as CL

    vec_fmt = f"CAST({{e}}{vec_col} AS DOUBLE[])"
    elem_fmt = f"CAST({{e}}{vec_col}[gs.pos] AS DOUBLE)"
    parts, cent = CL.lloyd_ctes(
        "nsw_", num_centroids, iters, dim, table, vec_fmt, elem_fmt,
        id_col, round_decimals, metric="cosine",
    )
    vec_e = vec_fmt.format(e="e.")
    cos = (
        "ROUND(LIST_COSINE_SIMILARITY(CAST({a} AS DOUBLE[]),"
        " CAST({b} AS DOUBLE[])), 6)"
    )
    parts.append(
        f"""memb AS (
  SELECT {id_col} AS id, cid FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY LIST_COSINE_SIMILARITY({vec_e}, c.cvec) DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {cent} c
  ) WHERE rn <= {nb}
)"""
    )
    parts.append(
        """cand AS (
  SELECT DISTINCT a.id AS src, b.id AS dst
  FROM memb a JOIN memb b USING (cid)
  WHERE a.id <> b.id
)"""
    )
    parts.append(
        f"""gr AS (
  SELECT src, dst FROM (
    SELECT c.src, c.dst,
           ROW_NUMBER() OVER (
             PARTITION BY c.src
             ORDER BY {cos.format(a=f"s.{vec_col}", b=f"d.{vec_col}")} DESC,
                      c.dst
           ) AS rn
    FROM cand c
    JOIN {table} s ON s.{id_col} = c.src
    JOIN {table} d ON d.{id_col} = c.dst
  ) WHERE rn <= {M}
)"""
    )
    parts.append(
        f"""qq AS (
  SELECT {id_col} AS query_id, {vec_col} AS qv
  FROM {table} WHERE {id_col} < {n_queries}
)"""
    )
    parts.append(
        f"""v0 AS (
  SELECT q.query_id, e.{id_col} AS nn_id,
         {cos.format(a=f"e.{vec_col}", b="q.qv")} AS cosine
  FROM {table} e CROSS JOIN qq q
  WHERE e.{id_col} % {entry_stride} = 0
)"""
    )

    def beam(src: str, name: str) -> str:
        return f"""{name} AS (
  SELECT query_id, nn_id, cosine FROM (
    SELECT query_id, nn_id, cosine,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, nn_id
           ) AS rn
    FROM {src}
  ) WHERE rn <= {ef}
)"""

    parts.append(beam("v0", "b0"))
    for t in range(1, hops + 1):
        parts.append(
            f"""s{t} AS (
  SELECT n.query_id, n.nn_id,
         {cos.format(a=f"e.{vec_col}", b="q.qv")} AS cosine
  FROM (SELECT DISTINCT b.query_id, g.dst AS nn_id
        FROM b{t - 1} b JOIN gr g ON g.src = b.nn_id) n
  JOIN {table} e ON e.{id_col} = n.nn_id
  JOIN qq q ON q.query_id = n.query_id
)"""
        )
        parts.append(
            f"""v{t} AS (
  SELECT DISTINCT query_id, nn_id, cosine FROM (
    SELECT * FROM v{t - 1} UNION ALL SELECT * FROM s{t}
  )
)"""
        )
        if t < hops:
            parts.append(beam(f"v{t}", f"b{t}"))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT query_id, nn_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, nn_id ASC
         ) AS INT) AS rank
  FROM v{hops}
) WHERE rank <= {k}"""
    )


# ---------------------------------------------------------------------------
# HNSW: hierarchical layers atop the NSW base graph (Malkov & Yashunin
# 2016).  Levels come from a DETERMINISTIC md5 draw (the repo's
# seed:key discipline — bit-identical in any engine), so the hierarchy
# — and therefore the search path and the approximation's exact output
# — is hash-oracle-able like the flat NSW entry.
# ---------------------------------------------------------------------------


def hnsw_level_hash(id_col: str | Column) -> Column:
    """The per-node level-draw hash: a 60-bit integer from
    ``md5(cast(id as string))`` — ``h % mod == 0`` selects a ~1/mod
    subset, and nested mods (8, 64, ...) give geometrically thinning
    NESTED layers, the HNSW level distribution with p = 1/8 per level
    instead of a float RNG (deterministic, engine-portable)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def build_hnsw_graphs(
    corpus: DataFrame,
    centroids: list[list[float]],
    M: int = 8,
    nb: int = 3,
    level_mods: tuple[int, ...] = (8, 64),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[DataFrame]:
    """One blocked k-NN graph per layer: index 0 is the full-corpus
    NSW base layer; index l >= 1 covers the nodes whose level hash is
    divisible by ``level_mods[l-1]`` (nested subsets, ~n/8, ~n/64...).
    Same centroids, same M/nb at every layer — upper layers are just
    sparser, the long-range express lanes of the hierarchy."""
    graphs = [
        build_nsw_graph(
            corpus, centroids, M=M, nb=nb, vec_col=vec_col, id_col=id_col
        )
    ]
    h = hnsw_level_hash(id_col)
    for mod in level_mods:
        sub = corpus.filter(h % mod == 0)
        graphs.append(
            build_nsw_graph(
                sub, centroids, M=M, nb=nb, vec_col=vec_col, id_col=id_col
            )
        )
    return graphs


def hnsw_topk(
    corpus: DataFrame,
    graphs: list[DataFrame],
    queries: DataFrame,
    k: int = 10,
    ef: int = 20,
    hops: int = 4,
    level_mods: tuple[int, ...] = (8, 64),
    descent_beam: int = 4,
    descent_hops: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hierarchical beam search: enter at the TOP layer (all its ~n/64
    members scored — the medoid-set analog, O(n / top_mod) instead of
    the flat NSW's O(n / stride) entries), descend layer by layer with
    a narrow beam (``descent_beam``, ``descent_hops`` expansions per
    upper layer), then run the standard ``ef``-beam ``hops``-hop search
    on the base layer seeded by everything the descent visited.
    Returns (query_id, nn_id, cosine, rank), rank <= k over ALL visited
    nodes.  Never cartesian: queries broadcast (bounded batch), every
    expansion is an equi-join on node id."""
    vecs = corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    layer_edges = []
    for g in graphs:
        e = materialize(g.select("src", "dst"))
        if e.count() <= 2_000_000:
            e = F.broadcast(e)
        layer_edges.append(e)

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nn_id")
    )
    top_mod = level_mods[-1]
    entries = vecs.filter(
        hnsw_level_hash(F.col("nn_id")) % top_mod == 0
    )
    visited = materialize(
        entries.crossJoin(F.broadcast(q)).select(
            "query_id", "nn_id", V.cosine("_cv", "_qv").alias("cosine")
        )
    )

    def expand(edges, beam_width: int, n_hops: int):
        nonlocal visited
        for _ in range(n_hops):
            beam = (
                visited.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= beam_width)
                .drop("_rn")
            )
            frontier = (
                beam.join(edges, beam["nn_id"] == edges["src"])
                .select("query_id", F.col("dst").alias("nn_id"))
                .distinct()
            )
            fresh = frontier.join(
                F.broadcast(visited), ["query_id", "nn_id"], "left_anti"
            )
            scored = (
                fresh.join(vecs, "nn_id")
                .join(F.broadcast(q), "query_id")
                .select(
                    "query_id",
                    "nn_id",
                    V.cosine("_cv", "_qv").alias("cosine"),
                )
            )
            visited = materialize(visited.unionByName(scored))

    # descent: upper layers, top-down, narrow beam
    for layer in range(len(level_mods), 0, -1):
        expand(layer_edges[layer], descent_beam, descent_hops)
    # base layer: the full beam search, seeded by the descent's visited
    expand(layer_edges[0], ef, hops)
    return (
        visited.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def hnsw_oracle_sql(
    num_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    M: int = 8,
    nb: int = 3,
    k: int = 10,
    ef: int = 20,
    hops: int = 4,
    level_mods: tuple[int, ...] = (8, 64),
    descent_beam: int = 4,
    descent_hops: int = 1,
    n_queries: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
) -> str:
    """DuckDB SQL twin of ``build_hnsw_graphs`` + ``hnsw_topk`` — the
    shared Lloyd CTEs, one blocked-graph build PER LAYER (the upper
    layers filtered by the md5 level hash), the top-layer entry scan,
    the narrow-beam descent, and the base-layer beam search, all
    unrolled.  The hierarchy's exact output is hash-checked."""
    from robosystems_spark.operators import clustering as CL

    vec_fmt = f"CAST({{e}}{vec_col} AS DOUBLE[])"
    elem_fmt = f"CAST({{e}}{vec_col}[gs.pos] AS DOUBLE)"
    parts, cent = CL.lloyd_ctes(
        "hnsw_", num_centroids, iters, dim, table, vec_fmt, elem_fmt,
        id_col, round_decimals, metric="cosine",
    )
    vec_e = vec_fmt.format(e="e.")
    cos = (
        "ROUND(LIST_COSINE_SIMILARITY(CAST({a} AS DOUBLE[]),"
        " CAST({b} AS DOUBLE[])), 6)"
    )
    hexpr = (
        f"('0x' || SUBSTR(MD5(CAST({{e}}{id_col} AS VARCHAR)), 1, 15))"
        "::BIGINT"
    )
    # one blocked graph per layer; layer 0 = whole corpus
    mods = [None] + list(level_mods)
    for lyr, mod in enumerate(mods):
        where = (
            "" if mod is None
            else f"WHERE {hexpr.format(e='e.')} % {mod} = 0"
        )
        parts.append(
            f"""memb{lyr} AS (
  SELECT {id_col} AS id, cid FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY LIST_COSINE_SIMILARITY({vec_e}, c.cvec) DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {cent} c {where}
  ) WHERE rn <= {nb}
)"""
        )
        parts.append(
            f"""cand{lyr} AS (
  SELECT DISTINCT a.id AS src, b.id AS dst
  FROM memb{lyr} a JOIN memb{lyr} b USING (cid)
  WHERE a.id <> b.id
)"""
        )
        parts.append(
            f"""gr{lyr} AS (
  SELECT src, dst FROM (
    SELECT c.src, c.dst,
           ROW_NUMBER() OVER (
             PARTITION BY c.src
             ORDER BY {cos.format(a=f"s.{vec_col}", b=f"d.{vec_col}")} DESC,
                      c.dst
           ) AS rn
    FROM cand{lyr} c
    JOIN {table} s ON s.{id_col} = c.src
    JOIN {table} d ON d.{id_col} = c.dst
  ) WHERE rn <= {M}
)"""
        )
    parts.append(
        f"""qq AS (
  SELECT {id_col} AS query_id, {vec_col} AS qv
  FROM {table} WHERE {id_col} < {n_queries}
)"""
    )
    # entries: every member of the TOP layer
    parts.append(
        f"""v0 AS (
  SELECT q.query_id, e.{id_col} AS nn_id,
         {cos.format(a=f"e.{vec_col}", b="q.qv")} AS cosine
  FROM {table} e CROSS JOIN qq q
  WHERE {hexpr.format(e='e.')} % {level_mods[-1]} = 0
)"""
    )

    def beam(src: str, name: str, width: int) -> str:
        return f"""{name} AS (
  SELECT query_id, nn_id, cosine FROM (
    SELECT query_id, nn_id, cosine,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, nn_id
           ) AS rn
    FROM {src}
  ) WHERE rn <= {width}
)"""

    # hop schedule mirroring hnsw_topk: descent over upper layers
    # top-down (narrow beam), then the base-layer ef search
    schedule = []
    for layer in range(len(level_mods), 0, -1):
        schedule += [(layer, descent_beam)] * descent_hops
    schedule += [(0, ef)] * hops
    t = 0
    for layer, width in schedule:
        parts.append(beam(f"v{t}", f"b{t}", width))
        parts.append(
            f"""s{t + 1} AS (
  SELECT n.query_id, n.nn_id,
         {cos.format(a=f"e.{vec_col}", b="q.qv")} AS cosine
  FROM (SELECT DISTINCT b.query_id, g.dst AS nn_id
        FROM b{t} b JOIN gr{layer} g ON g.src = b.nn_id) n
  JOIN {table} e ON e.{id_col} = n.nn_id
  JOIN qq q ON q.query_id = n.query_id
)"""
        )
        parts.append(
            f"""v{t + 1} AS (
  SELECT DISTINCT query_id, nn_id, cosine FROM (
    SELECT * FROM v{t} UNION ALL SELECT * FROM s{t + 1}
  )
)"""
        )
        t += 1
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT query_id, nn_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, nn_id ASC
         ) AS INT) AS rank
  FROM v{t}
) WHERE rank <= {k}"""
    )
