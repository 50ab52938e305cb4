"""Product quantization: compressed-domain approximate nearest neighbor.

The third ANN tier beside brute-force cosine and IVF
(operators/similarity.py): vectors are split into ``m`` contiguous
subspaces, each subspace k-means'd into a ``k``-codeword codebook
(L2 Lloyd via operators/clustering.py — the same portable rounding
contract), and every vector stored as ``m`` small codes.  Search is
asymmetric distance computation (ADC): the query builds an m x k
table of exact subspace distances once, and each corpus vector's
approximate distance is just ``m`` table lookups — no vector math on
the corpus side.

100 TB shape: the encoded corpus is ~dim*32/m bits per vector smaller
than raw floats (64-dim float32 -> 4 bytes of codes at m=4, a 64x
compression), the distance tables are a per-query broadcast literal,
and the scan + lookup + top-k is whole-stage codegen with
TakeOrderedAndProject — the classic IVF-ADC layout's in-partition
half.  Composes with IVF bucketing for the full billion-scale path.

PORTABILITY: codebook training inherits clustering.py's determinism
(lowest-id init, per-step ROUND), encode drops the per-row ||x||^2
constant identically on both engines, and ADC tables are rounded to
``round_decimals`` before use — so the whole approximate pipeline is
hash-checkable against the DuckDB oracle (``pq_oracle_sql``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.functions import vector as V
from robosystems_spark.operators import clustering as CL


def _subspace(vec_col: str, j: int, sub_dim: int):
    """DOUBLE[] slice of subspace j (1-based slice, like the oracle's
    LIST_SLICE)."""
    return F.expr(
        f"transform(slice({vec_col}, {j * sub_dim + 1}, {sub_dim}), "
        "x -> cast(x as double))"
    )


def pq_train_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 1,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
    corpus_count: int | None = None,
    resident_max: int | None = None,
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means codebooks (m codebooks of k x dim/m),
    trained FUSED: all m subspaces assign and aggregate in ONE job per
    Lloyd iteration instead of m independent loops (m x fewer job
    submissions; measured 2-3x faster at sf0.1 AND sf1).  Values are
    identical to the per-subspace loops:
    the deterministic k-lowest-id seed sliced per subspace, each
    subspace's argmin and per-(cluster, position) rounded means are
    computed over exactly the same groups with the same expressions.
    Only m * k * dim/m doubles ever return to the driver.

    Tier dispatch on measured corpus size (r12, the
    clustering.kmeans_fit discipline): within
    ``clustering.RESIDENT_FIT_MAX`` the whole per-subspace Lloyd runs
    on one collected matrix (same argmin/rounded-mean/empty-cluster
    contract, numpy; forced-gate parity pinned in tests); the fused
    distributed iteration is unchanged above the gate."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    if resident_max is None:
        resident_max = CL.RESIDENT_FIT_MAX
    if corpus_count is None:
        corpus_count = emb.count()
    if corpus_count <= resident_max:
        import numpy as np

        _ids, mat = CL._collect_matrix(emb, vec_col, id_col)
        books = [
            [
                list(np.round(mat[i], round_decimals)[j * sub_dim:(j + 1) * sub_dim])
                for i in range(k)
            ]
            for j in range(m)
        ]
        for _ in range(iters):
            for j in range(m):
                X = mat[:, j * sub_dim:(j + 1) * sub_dim]
                cid = CL._resident_assign(X, books[j], "l2")
                new = []
                for c in range(k):
                    members = X[cid == c]
                    if len(members):
                        new.append(
                            list(
                                np.round(
                                    members.mean(axis=0), round_decimals
                                )
                            )
                        )
                    else:
                        new.append(books[j][c])
                books[j] = new
        return [
            [[float(x) for x in c] for c in book] for book in books
        ]
    # deterministic seed: ONE pass takes the k lowest-id vectors;
    # slicing after element-wise rounding equals rounding each slice
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
    books = [
        [list(r["c"])[j * sub_dim : (j + 1) * sub_dim] for r in rows]
        for j in range(m)
    ]
    for _ in range(iters):
        # one SLIM branch per subspace, unioned into a single job:
        # each exploded row carries exactly (j, cid, pos, x) — row
        # volume identical to the per-subspace loops (an earlier
        # variant that exploded the full vector and attached the
        # m-element cid ARRAY to every element was 3x SLOWER at sf1:
        # the array replicated x dim per row).  Catalyst prunes the
        # unused subspace columns per branch, so each branch costs one
        # scan + one argmin UDF + one 1/m-width explode.
        parts = [
            emb.select(
                F.lit(j).alias("_j"),
                V.nearest_centroid(
                    _subspace(vec_col, j, sub_dim), books[j], "l2"
                ).alias("_cid"),
                F.posexplode(_subspace(vec_col, j, sub_dim)).alias(
                    "_sp", "_x"
                ),
            )
            for j in range(m)
        ]
        means = (
            reduce(lambda a, b: a.unionByName(b), parts)
            .groupBy("_j", "_cid", "_sp")
            .agg(F.round(F.avg("_x"), round_decimals).alias("_m"))
            .collect()
        )
        new: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            new.setdefault((r["_j"], r["_cid"]), {})[r["_sp"]] = r["_m"]
        # empty (j, cluster) groups keep their previous centroid
        books = [
            [
                new.get((j, c), None)
                and [new[(j, c)][p] for p in range(sub_dim)]
                or books[j][c]
                for c in range(k)
            ]
            for j in range(m)
        ]
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — all m argmin-L2 codes in one Arrow
    pass per batch."""
    return emb.select(
        F.col(id_col), V.nearest_codes(vec_col, codebooks).alias("codes")
    )


def _adc_table(
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    round_decimals: int,
) -> list[list[float]]:
    """m x k exact squared subspace distances, rounded — identical
    literals on both engines (the oracle rounds the same expansion)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    sub_dim = len(codebooks[0][0])
    table = []
    for j, cb in enumerate(codebooks):
        C = np.asarray(cb, dtype=np.float64)
        x = q[j * sub_dim : (j + 1) * sub_dim]
        d2 = (
            np.einsum("i,i->", x, x)
            - 2.0 * (C @ x)
            + np.einsum("ij,ij->i", C, C)
        )
        table.append([float(v) for v in np.round(d2, round_decimals)])
    return table


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    round_decimals: int = 9,
) -> DataFrame:
    """ADC top-k in ONE plan: the collected queries (small side by
    construction, same as cosine_topk's broadcast) become a single
    broadcast frame of precomputed m x k ADC tables; distance is m
    nested ``element_at`` lookups per (query, corpus-vector) pair,
    ranked by (rounded adc, id) so ordering is engine-portable.

    An earlier formulation unioned one plan branch per query, each
    carrying m*k distance literals — correct, but a 100-1000-query
    batch exploded Catalyst analysis time and plan size (the DRIVER
    became the bottleneck, not the cluster).  Here the per-query
    tables travel as broadcast DATA, not as plan literals: plan size
    is O(m) regardless of batch size, and the join is
    corpus x queries with no shuffle on the corpus side.  Returns
    (query_id, nn_id, adc, rank)."""
    m = len(codebooks)
    encoded = pq_encode(corpus, codebooks, vec_col, id_col).select(
        F.col(id_col).alias("nn_id"), "codes"
    )
    q_rows = queries.select(query_id_col, vec_col).collect()
    qid_type = queries.schema[query_id_col].dataType
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    q_schema = StructType(
        [
            StructField("query_id", qid_type, False),
            StructField(
                "_adc_tables", ArrayType(ArrayType(DoubleType())), False
            ),
        ]
    )
    q_frame = corpus.sparkSession.createDataFrame(
        [
            (
                row[query_id_col],
                _adc_table(list(row[vec_col]), codebooks, round_decimals),
            )
            for row in q_rows
        ],
        q_schema,
    )
    lookups = [
        F.element_at(
            F.element_at("_adc_tables", j + 1),
            F.element_at("codes", j + 1) + 1,
        )
        for j in range(m)
    ]
    adc = F.round(reduce(lambda a, b: a + b, lookups), 6)
    sims = encoded.crossJoin(F.broadcast(q_frame)).select(
        "query_id", "nn_id", adc.alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "nn_id", "adc", "rank")
    )


def pq_oracle_sql(
    m: int = 4,
    k: int = 16,
    iters: int = 1,
    dim: int = 64,
    topk: int = 10,
    n_queries: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
) -> str:
    """DuckDB SQL for the whole PQ pipeline — per-subspace codebook
    training (reusing clustering.lloyd_ctes per subspace), corpus
    encoding, query ADC tables and the ranked lookup-sum search —
    computing bit-for-bit what pq_topk computes with queries
    ``{id_col} < n_queries``."""
    sub_dim = dim // m
    r = round_decimals
    parts: list[str] = []
    cent_names = []
    for j in range(m):
        lo = j * sub_dim + 1
        vec_fmt = (
            f"LIST_SLICE(CAST({{e}}{vec_col} AS DOUBLE[]), {lo}, "
            f"{lo + sub_dim - 1})"
        )
        elem_fmt = f"CAST({{e}}{vec_col}[gs.pos + {lo - 1}] AS DOUBLE)"
        ctes, cent = CL.lloyd_ctes(
            f"pq{j}_", k, iters, sub_dim, table, vec_fmt, elem_fmt,
            id_col, r, metric="l2",
        )
        parts.extend(ctes)
        cent_names.append((cent, vec_fmt.format(e="e.")))

    # corpus encoding: one (vec, sub, code) row per subspace via the
    # same dropped-||x||^2 argmin
    enc_selects = []
    for j, (cent, vec_sql) in enumerate(cent_names):
        enc_selects.append(
            f"""SELECT {id_col}, {j} AS sub, cid AS code FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY (-2 * LIST_DOT_PRODUCT({vec_sql}, c.cvec)
                       + LIST_DOT_PRODUCT(c.cvec, c.cvec)) ASC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {cent} c
  ) WHERE rn = 1"""
        )
    parts.append("enc AS (\n  " + "\n  UNION ALL\n  ".join(enc_selects) + "\n)")

    # query ADC tables: exact squared subspace distance, rounded
    tab_selects = []
    for j, (cent, vec_sql) in enumerate(cent_names):
        tab_selects.append(
            f"""SELECT e.{id_col} AS query_id, {j} AS sub, c.cid AS code,
         ROUND(LIST_DOT_PRODUCT({vec_sql}, {vec_sql})
               - 2 * LIST_DOT_PRODUCT({vec_sql}, c.cvec)
               + LIST_DOT_PRODUCT(c.cvec, c.cvec), {r}) AS d2
  FROM {table} e CROSS JOIN {cent} c
  WHERE e.{id_col} < {n_queries}"""
        )
    parts.append("qtab AS (\n  " + "\n  UNION ALL\n  ".join(tab_selects) + "\n)")

    parts.append(
        f"""adc AS (
  SELECT t.query_id, enc.{id_col} AS nn_id, ROUND(SUM(t.d2), 6) AS adc
  FROM enc JOIN qtab t USING (sub, code)
  GROUP BY t.query_id, enc.{id_col}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, nn_id, adc, rank FROM (
  SELECT query_id, nn_id, adc,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY adc ASC, nn_id ASC
         ) AS INT) AS rank
  FROM adc
) WHERE rank <= {topk}"""
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the FAISS IVFPQ architecture end-to-end — coarse IVF
# partitioning (cosine Lloyd) + PQ codes within, ADC restricted to the
# probed buckets.  Composes the two oracled pipelines above, so the
# full index architecture is hash-checkable.
# ---------------------------------------------------------------------------


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    num_centroids: int = 8,
    ivf_iters: int = 2,
    nprobe: int = 3,
    m: int = 4,
    k: int = 16,
    pq_iters: int = 1,
    dim: int = 64,
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    round_decimals: int = 9,
) -> DataFrame:
    """IVF-PQ search: probe the ``nprobe`` nearest coarse centroids
    per query, ADC-rank the PQ codes of their members only — corpus
    work per query drops by ~num_centroids/nprobe vs flat PQ, the
    FAISS IVFPQ trade.  Single plan (pq_topk's broadcast-query shape)
    with the probe set as an array membership test on the bucket id.

    Returns (query_id, nn_id, adc, rank).  Approximate by
    construction in BOTH stages (unprobed buckets are missed, ADC is
    quantized distance) — and both approximations are hash-checked by
    the composed oracle.
    """
    cents = CL.kmeans_fit(
        corpus, num_centroids, ivf_iters, vec_col, id_col,
        round_decimals, metric="cosine",
    )
    assigned = CL.kmeans_assign(corpus, cents, vec_col, id_col)
    books = pq_train_codebooks(
        corpus, m, k, pq_iters, dim, vec_col, id_col, round_decimals
    )
    encoded = (
        pq_encode(corpus, books, vec_col, id_col)
        .join(assigned, id_col)
        .select(F.col(id_col).alias("nn_id"), "codes", "centroid_id")
    )
    q_frame = _ivfpq_query_frame(
        queries, cents, books, nprobe, query_id_col, vec_col, round_decimals
    )
    return _adc_rank_probed(encoded, q_frame, m, topk)


def _ivfpq_query_frame(
    queries: DataFrame,
    cents: list[list[float]],
    books: list[list[list[float]]],
    nprobe: int,
    query_id_col: str,
    vec_col: str,
    round_decimals: int,
) -> DataFrame:
    """(query_id, _probes, _adc_tables) — probe sets and ADC lookup
    tables computed driver-side (queries are a small broadcast-scale
    frame by contract) and shipped as one broadcast literal frame."""
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    C = np.asarray(cents, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    q_rows = queries.select(query_id_col, vec_col).collect()
    qid_type = queries.schema[query_id_col].dataType

    def probe_ids(vec: list[float]) -> list[int]:
        q = np.asarray(vec, dtype=np.float64)
        qn = q / max(float(np.linalg.norm(q)), 1e-30)
        sims = Cn @ qn
        # ORDER BY cosine DESC, cid ASC — the oracle's probe ordering
        order = sorted(range(len(sims)), key=lambda i: (-sims[i], i))
        return [int(i) for i in order[:nprobe]]

    q_schema = StructType(
        [
            StructField("query_id", qid_type, False),
            StructField("_probes", ArrayType(IntegerType()), False),
            StructField(
                "_adc_tables", ArrayType(ArrayType(DoubleType())), False
            ),
        ]
    )
    return queries.sparkSession.createDataFrame(
        [
            (
                row[query_id_col],
                probe_ids(list(row[vec_col])),
                _adc_table(list(row[vec_col]), books, round_decimals),
            )
            for row in q_rows
        ],
        q_schema,
    )


def _adc_rank_probed(
    encoded: DataFrame, q_frame: DataFrame, m: int, topk: int
) -> DataFrame:
    """ADC ranking of (nn_id, codes, centroid_id) rows against a
    broadcast query frame, restricted to each query's probe set."""
    lookups = [
        F.element_at(
            F.element_at("_adc_tables", j + 1),
            F.element_at("codes", j + 1) + 1,
        )
        for j in range(m)
    ]
    adc = F.round(reduce(lambda a, b: a + b, lookups), 6)
    sims = (
        encoded.crossJoin(F.broadcast(q_frame))
        .filter(F.array_contains("_probes", F.col("centroid_id")))
        .select("query_id", "nn_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "nn_id", "adc", "rank")
    )


def ivfpq_write_index(
    corpus: DataFrame,
    path: str,
    num_centroids: int = 8,
    ivf_iters: int = 2,
    m: int = 4,
    k: int = 16,
    pq_iters: int = 1,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Materialize the IVF-PQ index — the actual billion-scale FAISS
    deployment shape: PQ codes written hive-partitioned by coarse
    ``centroid_id`` (the ``ivf_write_index`` layout), so a probe is a
    partition-pruned scan of ~nprobe/num_centroids of the CODES (each
    already ~dim*32/m-fold smaller than the raw vectors).  Training
    (coarse Lloyd + per-subspace codebooks) happens ONCE here, never
    per query.  Returns ``(centroids, codebooks)`` for the query side.
    """
    cents = CL.kmeans_fit(
        corpus, num_centroids, ivf_iters, vec_col, id_col,
        round_decimals, metric="cosine",
    )
    assigned = CL.kmeans_assign(corpus, cents, vec_col, id_col)
    books = pq_train_codebooks(
        corpus, m, k, pq_iters, dim, vec_col, id_col, round_decimals
    )
    (
        pq_encode(corpus, books, vec_col, id_col)
        .join(assigned, id_col)
        .select(F.col(id_col).alias("nn_id"), "codes", "centroid_id")
        .write.partitionBy("centroid_id")
        .mode("overwrite")
        .parquet(path)
    )
    return cents, books


def ivfpq_topk_indexed(
    spark,
    path: str,
    cents: list[list[float]],
    books: list[list[list[float]]],
    queries: DataFrame,
    nprobe: int = 3,
    topk: int = 10,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_decimals: int = 9,
) -> DataFrame:
    """Probe a written IVF-PQ index: only the probed ``centroid_id``
    partitions are read (isin-filter prunes at the file index — verify
    with ``PartitionFilters`` in the plan), then ADC-rank their codes.
    Value-identical to ``ivfpq_topk`` with the same training params:
    both rank the same codes with the same tables over the same probe
    sets — the index just swaps per-call re-training and a full-corpus
    scan for one partition-pruned read."""
    m = len(books)
    q_frame = _ivfpq_query_frame(
        queries, cents, books, nprobe, query_id_col, vec_col, round_decimals
    )
    # bounded collect: distinct probe ids, <= nprobe * |queries| ints
    probed = sorted(
        {
            int(c)
            for r in q_frame.select("_probes").collect()
            for c in r["_probes"]
        }
    )
    index = spark.read.parquet(path).filter(F.col("centroid_id").isin(probed))
    return _adc_rank_probed(index, q_frame, m, topk)


def ivfpq_oracle_sql(
    num_centroids: int = 8,
    ivf_iters: int = 2,
    nprobe: int = 3,
    m: int = 4,
    k: int = 16,
    pq_iters: int = 1,
    dim: int = 64,
    topk: int = 10,
    n_queries: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 9,
) -> str:
    """DuckDB SQL for the composed IVF-PQ pipeline: the cosine Lloyd
    chain (coarse), per-subspace L2 Lloyd chains (codes), corpus
    encode + assignment, per-query probes, and the ADC ranking
    restricted to probed buckets — queries are ``{id_col} <
    n_queries``, like the sibling oracles."""
    sub_dim = dim // m
    r = round_decimals
    vec_fmt = f"CAST({{e}}{vec_col} AS DOUBLE[])"
    elem_fmt = f"CAST({{e}}{vec_col}[gs.pos] AS DOUBLE)"
    parts, coarse = CL.lloyd_ctes(
        "ivf_", num_centroids, ivf_iters, dim, table, vec_fmt, elem_fmt,
        id_col, r, metric="cosine",
    )
    vec_sql = vec_fmt.format(e="e.")
    parts.append(
        f"""assigned AS MATERIALIZED (
  SELECT {id_col}, cid FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY LIST_COSINE_SIMILARITY({vec_sql}, c.cvec) DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {coarse} c
  ) WHERE rn = 1
)"""
    )
    parts.append(
        f"""probes AS MATERIALIZED (
  SELECT query_id, cid FROM (
    SELECT e.{id_col} AS query_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY LIST_COSINE_SIMILARITY({vec_sql}, c.cvec) DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {coarse} c
    WHERE e.{id_col} < {n_queries}
  ) WHERE rn <= {nprobe}
)"""
    )
    cent_names = []
    for j in range(m):
        lo = j * sub_dim + 1
        sv = (
            f"LIST_SLICE(CAST({{e}}{vec_col} AS DOUBLE[]), {lo}, "
            f"{lo + sub_dim - 1})"
        )
        se = f"CAST({{e}}{vec_col}[gs.pos + {lo - 1}] AS DOUBLE)"
        ctes, cent = CL.lloyd_ctes(
            f"pq{j}_", k, pq_iters, sub_dim, table, sv, se, id_col, r,
            metric="l2",
        )
        parts.extend(ctes)
        cent_names.append((cent, sv.format(e="e.")))
    enc_selects = []
    for j, (cent, sv) in enumerate(cent_names):
        enc_selects.append(
            f"""SELECT {id_col}, {j} AS sub, cid AS code FROM (
    SELECT e.{id_col}, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.{id_col}
             ORDER BY (-2 * LIST_DOT_PRODUCT({sv}, c.cvec)
                       + LIST_DOT_PRODUCT(c.cvec, c.cvec)) ASC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN {cent} c
  ) WHERE rn = 1"""
        )
    parts.append(
        "enc AS MATERIALIZED (\n  "
        + "\n  UNION ALL\n  ".join(enc_selects)
        + "\n)"
    )
    tab_selects = []
    for j, (cent, sv) in enumerate(cent_names):
        tab_selects.append(
            f"""SELECT e.{id_col} AS query_id, {j} AS sub, c.cid AS code,
         ROUND(LIST_DOT_PRODUCT({sv}, {sv})
               - 2 * LIST_DOT_PRODUCT({sv}, c.cvec)
               + LIST_DOT_PRODUCT(c.cvec, c.cvec), {r}) AS d2
  FROM {table} e CROSS JOIN {cent} c
  WHERE e.{id_col} < {n_queries}"""
        )
    parts.append(
        "qtab AS MATERIALIZED (\n  "
        + "\n  UNION ALL\n  ".join(tab_selects)
        + "\n)"
    )
    parts.append(
        f"""adc AS (
  SELECT t.query_id, enc.{id_col} AS nn_id, ROUND(SUM(t.d2), 6) AS adc
  FROM enc
  JOIN assigned a USING ({id_col})
  JOIN probes p ON p.cid = a.cid
  JOIN qtab t ON t.query_id = p.query_id
             AND t.sub = enc.sub AND t.code = enc.code
  GROUP BY t.query_id, enc.{id_col}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, nn_id, adc, rank FROM (
  SELECT query_id, nn_id, adc,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY adc ASC, nn_id ASC
         ) AS INT) AS rank
  FROM adc
) WHERE rank <= {topk}"""
    )
