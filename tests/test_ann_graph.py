"""Graph-ANN (operators/ann_graph.py) semantics: blocked build bounds,
beam-search quality vs the IVF baseline, determinism, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.operators import clustering as CL
from robosystems_spark.operators.ann_graph import build_nsw_graph, nsw_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = read_table(spark, sf_dir, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def centroids(emb):
    return CL.kmeans_fit(emb, k=8, iters=2, metric="cosine")


@pytest.fixture(scope="module")
def graph(emb, centroids):
    g = build_nsw_graph(emb, centroids, M=8, nb=3).cache()
    g.count()
    yield g
    g.unpersist()


def _queries(emb, n=3):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_graph_degree_bounded_and_no_self_loops(graph):
    assert graph.filter(F.col("src") == F.col("dst")).count() == 0
    deg = graph.groupBy("src").count().agg(F.max("count")).first()[0]
    assert deg <= 8


def test_graph_neighbors_are_locally_nearest(emb, centroids, graph):
    """Each kept edge must carry a cosine >= any DROPPED candidate of
    the same src (the top-M contract), spot-checked for one src."""
    src = graph.select("src").first()["src"]
    kept = {r["dst"] for r in graph.filter(F.col("src") == src).collect()}
    m = graph.filter(F.col("src") == src).agg(F.min("cosine")).first()[0]
    # rebuild this src's candidate set with a huge M: anything the
    # bounded graph dropped must not beat the kept minimum
    full = build_nsw_graph(emb, centroids, M=10**6, nb=3)
    dropped = full.filter(
        (F.col("src") == src) & (~F.col("dst").isin(kept))
    )
    worst = dropped.agg(F.max("cosine")).first()[0]
    assert worst is None or worst <= m


def test_nsw_topk_shape_and_rank(emb, graph):
    out = nsw_topk(emb, graph, _queries(emb), k=10, ef=20, hops=4,
                   entry_stride=8)
    rows = out.collect()
    assert len(rows) == 30
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, 11))
        ordered = sorted(rs, key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in ordered]
        assert cosines == sorted(cosines, reverse=True)


def test_nsw_recall_meets_ivf_baseline(spark, sf_dir):
    """The VERDICT gate: graph-ANN recall@10 >= the IVF baseline at
    the oracle SFs (both indexes share centroids, queries, k)."""
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded

    _ensure_loaded()
    nsw = sum(
        r["recall_at_10"]
        for r in REGISTRY["embedding_nsw_recall_at_k"].fn(spark, sf_dir).collect()
    )
    ivf = sum(
        r["recall_at_10"]
        for r in REGISTRY["embedding_ivf_recall_at_k"].fn(spark, sf_dir).collect()
    )
    assert nsw >= ivf
    assert nsw / 3 >= 0.9


def test_nsw_deterministic_across_runs(emb, graph):
    a = sorted(map(tuple, nsw_topk(emb, graph, _queries(emb)).collect()))
    b = sorted(map(tuple, nsw_topk(emb, graph, _queries(emb)).collect()))
    assert a == b


def test_nsw_more_hops_never_hurts(emb, graph):
    """Beam search is monotone in visited set: the top-1 cosine after
    h+1 hops is >= after h hops for every query."""
    q = _queries(emb)
    best = {}
    for hops in (1, 2, 4):
        rows = (
            nsw_topk(emb, graph, q, k=1, ef=20, hops=hops, entry_stride=8)
            .collect()
        )
        for r in rows:
            prev = best.get(r["query_id"])
            assert prev is None or r["cosine"] >= prev
            best[r["query_id"]] = r["cosine"]


def test_nsw_graph_build_never_cartesian(emb, centroids):
    plan = build_nsw_graph(emb, centroids, M=8, nb=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nsw_indexed_matches_inmemory_and_prunes(spark, sf_dir, emb, centroids, graph, tmp_path):
    """The disk-resident index returns IDENTICAL values to the
    in-memory search over the same graph, and its per-hop reads carry
    PartitionFilters (the DiskANN promise: IO proportional to the
    beam, not the corpus)."""
    from robosystems_spark.operators.ann_graph import (
        nsw_topk_indexed,
        nsw_write_index,
    )

    path = str(tmp_path / "nsw_index")
    nsw_write_index(emb, path, centroids, M=8, nb=3, n_buckets=16,
                    entry_stride=8)
    q = _queries(emb)
    mem = sorted(
        map(tuple, nsw_topk(emb, graph, q, k=10, ef=20, hops=4,
                            entry_stride=8).collect())
    )
    idx_df = nsw_topk_indexed(spark, path, q, k=10, ef=20, hops=4,
                              n_buckets=16)
    idx = sorted(map(tuple, idx_df.collect()))
    assert mem == idx
    plan = idx_df._jdf.queryExecution().executedPlan().toString()
    # every graph/vector scan in the final plan is partition-pruned on
    # the bucket column (non-empty PartitionFilters naming bucket)
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    pruned = [f for f in pf if "bucket" in f]
    assert pruned, plan[:2000]
    assert all("bucket" in f for f in pf if f.strip()), pf


# -- HNSW hierarchy (r11) -----------------------------------------------------


@pytest.fixture(scope="module")
def hgraphs(emb, centroids):
    from robosystems_spark.operators.ann_graph import build_hnsw_graphs

    gs = [g.cache() for g in build_hnsw_graphs(emb, centroids, M=8, nb=3)]
    for g in gs:
        g.count()
    yield gs
    for g in gs:
        g.unpersist()


def test_hnsw_layers_are_nested_and_thinner(emb, hgraphs):
    """Upper layers cover geometrically thinner NESTED node subsets."""
    from robosystems_spark.operators.ann_graph import hnsw_level_hash

    n = emb.count()
    sizes = [
        g.select("src").distinct().count() for g in hgraphs
    ]
    assert sizes[0] > sizes[1] > sizes[2] >= 1
    assert sizes[1] < n / 4  # ~n/8 draw
    # nested: every layer-2 node hash-qualifies for layer 1 too
    h = hnsw_level_hash(F.col("vec_id"))
    l2 = emb.filter(h % 64 == 0)
    assert l2.filter(~(h % 8 == 0)).count() == 0


def test_hnsw_recall_meets_nsw_at_equal_ef(spark, sf_dir, emb, centroids, hgraphs):
    """VERDICT r10 item 6 gate: HNSW recall@10 >= flat NSW at equal
    ef/hops/k (exact brute-force top-10 as ground truth)."""
    from robosystems_spark.operators.ann_graph import hnsw_topk

    q = _queries(emb)
    # exact ground truth: brute-force cosine top-10 per query
    from robosystems_spark.functions import vector as V

    exact = (
        emb.crossJoin(F.broadcast(q.select(F.col("query_id"), F.col("embedding").alias("_qv"))))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("nn_id"),
            V.cosine("embedding", "_qv").alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    truth = {
        (r["query_id"], r["nn_id"])
        for r in exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    }
    hns = {
        (r["query_id"], r["nn_id"])
        for r in hnsw_topk(emb, hgraphs, q, k=10, ef=20, hops=4).collect()
    }
    nsw = {
        (r["query_id"], r["nn_id"])
        for r in nsw_topk(
            emb, hgraphs[0], q, k=10, ef=20, hops=4, entry_stride=8
        ).collect()
    }
    hnsw_recall = len(hns & truth) / len(truth)
    nsw_recall = len(nsw & truth) / len(truth)
    assert hnsw_recall >= nsw_recall, (hnsw_recall, nsw_recall)
    assert hnsw_recall >= 0.9


def test_hnsw_deterministic_across_runs(emb, hgraphs):
    from robosystems_spark.operators.ann_graph import hnsw_topk

    a = sorted(map(tuple, hnsw_topk(emb, hgraphs, _queries(emb)).collect()))
    b = sorted(map(tuple, hnsw_topk(emb, hgraphs, _queries(emb)).collect()))
    assert a == b and len(a) == 30


# -- execution tiers + scale policy (r12) -------------------------------------


def test_resident_tier_matches_distributed(emb, graph):
    """The executor-resident fast path (one mapInPandas over queries)
    returns bit-identical rows to the distributed hop loop — same
    einsum, same lexsort order as the window rank."""
    from robosystems_spark.operators.ann_graph import nsw_topk

    q = _queries(emb)
    fast = sorted(map(tuple, nsw_topk(
        emb, graph, q, k=10, ef=20, hops=4, entry_stride=8).collect()))
    dist = sorted(map(tuple, nsw_topk(
        emb, graph, q, k=10, ef=20, hops=4, entry_stride=8,
        index_broadcast_max=0).collect()))
    assert fast == dist and len(fast) == 30


def test_visited_broadcast_gate(emb, graph, monkeypatch):
    """VERDICT r11 item 1: with the visited cap forced to 0, no hop's
    anti-join may broadcast the accumulated visited state (shuffle
    anti-join fallback); with the default cap the broadcast fast path
    is used.  Values identical either way."""
    from robosystems_spark.operators import ann_graph as AG

    captured: list[str] = []
    real = AG.materialize

    def spy(df, **kw):
        captured.append(
            df._jdf.queryExecution().executedPlan().toString()
        )
        return real(df, **kw)

    monkeypatch.setattr(AG, "materialize", spy)
    q = _queries(emb)
    gated = sorted(map(tuple, AG.nsw_topk(
        emb, graph, q, k=10, ef=20, hops=2, entry_stride=8,
        index_broadcast_max=0, visited_broadcast_max=0).collect()))
    anti_lines = [
        line
        for plan in captured
        for line in plan.splitlines()
        if "LeftAnti" in line
    ]
    assert anti_lines, "no anti-join hop plans captured"
    assert all("Broadcast" not in line for line in anti_lines), anti_lines

    captured.clear()
    open_ = sorted(map(tuple, AG.nsw_topk(
        emb, graph, q, k=10, ef=20, hops=2, entry_stride=8,
        index_broadcast_max=0).collect()))
    anti_lines = [
        line
        for plan in captured
        for line in plan.splitlines()
        if "LeftAnti" in line
    ]
    assert any("Broadcast" in line for line in anti_lines), anti_lines
    assert gated == open_


def test_entry_set_scale_policy():
    """auto_entry_stride keeps the seed set ~min(cap, sqrt(n));
    auto_level_mods keeps the HNSW top layer sublinear."""
    from robosystems_spark.operators.ann_graph import (
        auto_entry_stride,
        auto_level_mods,
    )

    for n in (100, 10_000, 1_000_000, 10**9):
        stride = auto_entry_stride(n)
        entries = n // stride
        import math

        assert entries <= max(1, min(4096, math.isqrt(n))) * 2
        assert stride >= 1
    # entry count grows sublinearly: 1000x corpus -> ~32x entries
    assert (10**9 // auto_entry_stride(10**9)) < 50 * (
        10**6 // auto_entry_stride(10**6)
    )
    mods = auto_level_mods(10**9)
    assert 10**9 // mods[-1] <= 4096
    assert list(mods) == sorted(mods)
    # at 20k vectors the top layer must thin to <= ~sqrt(n): 3 levels
    assert auto_level_mods(20_000) == (8, 64, 512)


def test_auto_stride_accepted_by_search(emb, graph):
    from robosystems_spark.operators.ann_graph import nsw_topk

    out = nsw_topk(emb, graph, _queries(emb), k=5, ef=20, hops=2,
                   entry_stride="auto")
    rows = out.collect()
    assert len(rows) == 15


def test_hnsw_indexed_matches_inmemory_and_prunes(
    spark, emb, centroids, hgraphs, tmp_path
):
    """VERDICT r11 item 2: the written HNSW index (build once,
    partition-pruned search) returns IDENTICAL values to the
    per-invocation hierarchy, and every graph/vector scan carries a
    bucket PartitionFilter."""
    from robosystems_spark.operators.ann_graph import (
        hnsw_topk,
        hnsw_topk_indexed,
        hnsw_write_index,
    )

    path = str(tmp_path / "hnsw_index")
    hnsw_write_index(emb, path, centroids, M=8, nb=3,
                     level_mods=(8, 64), n_buckets=16)
    q = _queries(emb)
    mem = sorted(map(tuple, hnsw_topk(
        emb, hgraphs, q, k=10, ef=20, hops=4, level_mods=(8, 64),
        descent_beam=4, descent_hops=1).collect()))
    idx_df = hnsw_topk_indexed(
        spark, path, q, k=10, ef=20, hops=4, n_levels=2,
        descent_beam=4, descent_hops=1, n_buckets=16,
    )
    idx = sorted(map(tuple, idx_df.collect()))
    assert mem == idx
    import re

    plan = idx_df._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    pruned = [f for f in pf if "bucket" in f]
    assert pruned, plan[:2000]
    assert all("bucket" in f for f in pf if f.strip()), pf


def test_resident_index_reuse(emb, graph, hgraphs):
    """Build-once/search-many: a ResidentAnnIndex handle returns
    bit-identical rows to the one-shot dispatch for both NSW and HNSW
    schedules, across repeated topk calls."""
    from pyspark.sql import functions as F2

    from robosystems_spark.operators.ann_graph import (
        build_resident_index,
        hnsw_level_hash,
        hnsw_topk,
        nsw_topk,
    )

    q = _queries(emb)
    nsw_idx = build_resident_index(
        emb, [graph], F2.col("vec_id") % 8 == 0
    )
    want = sorted(map(tuple, nsw_topk(
        emb, graph, q, k=10, ef=20, hops=4, entry_stride=8).collect()))
    for _ in range(2):
        got = sorted(map(tuple, nsw_idx.topk(q, k=10, ef=20, hops=4).collect()))
        assert got == want
    h_idx = build_resident_index(
        emb, hgraphs, hnsw_level_hash(F2.col("vec_id")) % 64 == 0
    )
    hwant = sorted(map(tuple, hnsw_topk(
        emb, hgraphs, q, k=10, ef=20, hops=4).collect()))
    hgot = sorted(map(tuple, h_idx.topk(
        q, k=10, ef=20, hops=4, descent_beam=4, descent_hops=1).collect()))
    assert hgot == hwant
    nsw_idx.unpersist()
    h_idx.unpersist()
