"""r12 resident-tier parity: every measured-size fast path must return
results identical to the distributed plan it replaces (forced via the
gate argument), at the smoke SF the suite runs on.  These are the
focused tests the optimization round requires for operator-internal
changes: the resident tiers change PLANS, never values."""

from __future__ import annotations

from pyspark.sql import functions as F

from robosystems_spark.io import read_table


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_kmeans_fit_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators import clustering as CL

    emb = _emb(spark, sf_dir)
    for metric in ("cosine", "l2"):
        fast = CL.kmeans_fit(emb, k=8, iters=2, metric=metric)
        dist = CL.kmeans_fit(emb, k=8, iters=2, metric=metric, resident_max=0)
        assert fast == dist, f"kmeans_fit tier mismatch ({metric})"


def test_pq_codebooks_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators import pq as PQ

    emb = _emb(spark, sf_dir)
    fast = PQ.pq_train_codebooks(emb, m=4, k=16, iters=1, dim=64)
    dist = PQ.pq_train_codebooks(
        emb, m=4, k=16, iters=1, dim=64, resident_max=0
    )
    assert fast == dist


def test_nsw_build_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators import clustering as CL
    from robosystems_spark.operators.ann_graph import build_nsw_graph

    emb = _emb(spark, sf_dir)
    cents = CL.kmeans_fit(emb, k=8, iters=2, metric="cosine")
    fast = sorted(
        map(tuple, build_nsw_graph(emb, cents, M=8, nb=3).collect())
    )
    dist = sorted(
        map(
            tuple,
            build_nsw_graph(emb, cents, M=8, nb=3, resident_max=0).collect(),
        )
    )
    assert fast == dist and len(fast) > 0


def test_bpe_train_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.bpe import _train_loop

    docs = read_table(spark, sf_dir, "documents")
    _, fast = _train_loop(docs, 8, "text")
    _, dist = _train_loop(docs, 8, "text", resident_max=0)
    assert fast == dist and len(fast) > 0


def test_bpe_vocab_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.bpe import bpe_vocab

    docs = read_table(spark, sf_dir, "documents")
    fast = sorted(map(tuple, bpe_vocab(docs, n_merges=8).collect()))
    dist = sorted(
        map(tuple, bpe_vocab(docs, n_merges=8, resident_max=0).collect())
    )
    assert fast == dist and len(fast) > 0


def test_copurchase_pairs_match_self_join(spark, sf_dir):
    """The collect_set + slice-explode pair build produces exactly the
    DISTINCT src<dst co-purchase pair set the o-keyed self-join did."""
    from robosystems_spark.inventory.graph import _copurchase_pairs

    li = read_table(spark, sf_dir, "lineitem")
    fast = sorted(map(tuple, _copurchase_pairs(li).collect()))
    base = li.select("l_orderkey", "l_partkey").distinct()
    a = base.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = base.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    ref = sorted(
        map(
            tuple,
            a.join(b, "o")
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct()
            .collect(),
        )
    )
    assert fast == ref and len(fast) > 0


def test_copurchase_pairs_np_matches_spark_build(spark, sf_dir):
    """r13 fused construction: the numpy pair build must return the
    exact DISTINCT src<dst pair set of the Spark construction, and
    bail out (None) on inputs that violate its gates (nulls,
    non-integral keys) so callers fall back to the unchanged plan."""
    from robosystems_spark.inventory.graph import (
        _copurchase_pairs,
        _copurchase_pairs_np,
    )

    li = read_table(spark, sf_dir, "lineitem")
    ids, si, di = _copurchase_pairs_np(li)
    fast = sorted(zip(ids[si].tolist(), ids[di].tolist()))
    ref = sorted(map(tuple, _copurchase_pairs(li).collect()))
    assert fast == ref and len(fast) > 0
    # messy input: duplicate rows and single-part orders are handled
    messy = li.unionByName(li.limit(50)).unionByName(
        li.select(
            (F.col("l_orderkey") + 90_000_000).alias("l_orderkey"),
            "l_partkey",
            *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
        ).limit(7)
    )
    ids2, si2, di2 = _copurchase_pairs_np(messy)
    fast2 = sorted(zip(ids2[si2].tolist(), ids2[di2].tolist()))
    ref2 = sorted(map(tuple, _copurchase_pairs(messy).collect()))
    assert fast2 == ref2
    # gate bailouts: NULL keys and non-integral keys return None
    with_null = li.withColumn(
        "l_partkey",
        F.when(F.col("l_orderkey") % 97 == 0, None).otherwise(
            F.col("l_partkey")
        ),
    )
    assert _copurchase_pairs_np(with_null) is None
    as_str = li.withColumn("l_partkey", F.col("l_partkey").cast("string"))
    assert _copurchase_pairs_np(as_str) is None


def test_fused_copurchase_entries_match_unfused(spark, sf_dir):
    """The precollected fused path must equal the r12 plan (schema
    included) for both bench consumers."""
    from robosystems_spark.inventory.graph import (
        _copurchase_pairs,
        _copurchase_pairs_np,
    )
    from robosystems_spark.operators.graph import (
        kcore,
        triangle_counts_per_node,
    )

    li = read_table(spark, sf_dir, "lineitem")
    pre = _copurchase_pairs_np(li)
    fused_tri = triangle_counts_per_node(
        _copurchase_pairs(li), canonical=True, precollected=pre
    )
    plain_tri = triangle_counts_per_node(
        _copurchase_pairs(li), canonical=True
    )
    assert fused_tri.schema == plain_tri.schema
    assert sorted(map(tuple, fused_tri.collect())) == sorted(
        map(tuple, plain_tri.collect())
    )
    fused_kc = kcore(
        _copurchase_pairs(li), k=3, rounds=2, canonical=True,
        broadcast_keep=True, precollected=pre,
    )
    plain_kc = kcore(
        _copurchase_pairs(li), k=3, rounds=2, canonical=True,
        broadcast_keep=True,
    )
    assert fused_kc.schema == plain_kc.schema
    assert sorted(map(tuple, fused_kc.collect())) == sorted(
        map(tuple, plain_kc.collect())
    )


def _sp_edges_small(spark, sf_dir):
    from robosystems_spark.inventory.graph import _sp_edges

    return _sp_edges(read_table(spark, sf_dir, "lineitem"))


def test_pagerank_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.graph import pagerank

    e = _sp_edges_small(spark, sf_dir)
    fast = sorted(map(tuple, pagerank(e, num_iter=3).collect()))
    dist = sorted(
        map(tuple, pagerank(e, num_iter=3, resident_max=0).collect())
    )
    assert fast == dist and len(fast) > 0


def test_kcore_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.inventory.graph import _copurchase_pairs
    from robosystems_spark.operators.graph import kcore

    pairs = _copurchase_pairs(read_table(spark, sf_dir, "lineitem"))
    fast = sorted(
        map(tuple, kcore(pairs, k=3, rounds=2, canonical=True).collect())
    )
    dist = sorted(
        map(
            tuple,
            kcore(
                pairs, k=3, rounds=2, canonical=True, resident_max=0
            ).collect(),
        )
    )
    assert fast == dist and len(fast) > 0


def test_lpa_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.graph import label_propagation

    e = _sp_edges_small(spark, sf_dir).dropDuplicates()
    fast = sorted(
        map(tuple, label_propagation(e, rounds=2, canonical=True).collect())
    )
    dist = sorted(
        map(
            tuple,
            label_propagation(
                e, rounds=2, canonical=True, resident_max=0
            ).collect(),
        )
    )
    assert fast == dist and len(fast) > 0


def test_hits_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.graph import hits

    e = _sp_edges_small(spark, sf_dir).dropDuplicates()
    fast = sorted(map(tuple, hits(e, num_iter=2).collect()))
    dist = sorted(map(tuple, hits(e, num_iter=2, resident_max=0).collect()))
    assert fast == dist and len(fast) > 0


def test_bounded_paths_resident_matches_distributed(spark, sf_dir):
    """r12: the resident BFS twin (numpy set ops over one bounded
    collect) must produce the exact (src, dst, min-depth) pair set of
    the distributed level loop, schema included."""
    from robosystems_spark.operators.graph import bounded_paths

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("src")
    )
    n = cust.agg(F.count("*").alias("_n"))
    edges = cust.crossJoin(F.broadcast(n)).select(
        "src", ((F.col("src") * 31 + 7) % F.col("_n")).alias("dst")
    )
    fast_df = bounded_paths(edges, 3)
    dist_df = bounded_paths(edges, 3, resident_max=0)
    assert fast_df.schema == dist_df.schema
    fast = sorted(map(tuple, fast_df.collect()))
    dist = sorted(map(tuple, dist_df.collect()))
    assert fast == dist and len(fast) > 0


def test_harmonic_resident_matches_distributed(spark, sf_dir):
    """r12: the resident harmonic fold (numpy bincount + fixed-order
    fold + Catalyst-twin HALF_UP round) must equal the distributed
    groupBy fold bit-for-bit, schema included."""
    import robosystems_spark.operators.graph as G
    from robosystems_spark.operators.graph import harmonic_centrality

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("src")
    )
    n = cust.agg(F.count("*").alias("_n"))
    edges = cust.crossJoin(F.broadcast(n)).select(
        "src", ((F.col("src") * 31 + 7) % F.col("_n")).alias("dst")
    )
    fast_df = harmonic_centrality(edges, 3)
    old = G.RESIDENT_EDGES_MAX
    G.RESIDENT_EDGES_MAX = 0
    try:
        dist_df = harmonic_centrality(edges, 3)
    finally:
        G.RESIDENT_EDGES_MAX = old
    assert fast_df.schema == dist_df.schema
    fast = sorted(map(tuple, fast_df.collect()))
    dist = sorted(map(tuple, dist_df.collect()))
    assert fast == dist and len(fast) > 0


def test_connected_components_resident_matches_distributed(spark, sf_dir):
    """r12: the resident scatter-min fixpoint must match both
    distributed formulations (labelprop and star) on the minhash pair
    graph, schema included."""
    from robosystems_spark.inventory.llm import _docs
    from robosystems_spark.operators.dedup import minhash_near_duplicates
    from robosystems_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    pairs = minhash_near_duplicates(_docs(spark, sf_dir), threshold=0.7)
    for fn in (connected_components, connected_components_star):
        fast_df = fn(pairs, "doc_a", "doc_b")
        dist_df = fn(pairs, "doc_a", "doc_b", resident_max=0)
        assert fast_df.schema == dist_df.schema, fn.__name__
        fast = sorted(map(tuple, fast_df.collect()))
        dist = sorted(map(tuple, dist_df.collect()))
        assert fast == dist and len(fast) > 0, fn.__name__


def test_triangle_counts_resident_matches_distributed(spark, sf_dir):
    """r12: the resident bitset triangle count (degree-ordered
    orientation + diagonal wedge enumeration) must equal the
    distributed compact-forward closure count bit-for-bit, schema
    included — on the co-purchase graph AND on a non-canonical edge
    list with duplicates/loops."""
    import robosystems_spark.operators.graph as G
    from robosystems_spark.inventory.graph import _copurchase_pairs
    from robosystems_spark.operators.graph import triangle_counts_per_node

    li = read_table(spark, sf_dir, "lineitem")
    cases = [
        (_copurchase_pairs(li), dict(canonical=True)),
        # messy input: both directions + loops exercise canonicalize
        (
            _copurchase_pairs(li)
            .unionByName(
                _copurchase_pairs(li).select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .unionByName(li.select(F.col("l_partkey").alias("src"), F.col("l_partkey").alias("dst")).limit(5)),
            dict(canonical=False),
        ),
    ]
    for edges, kw in cases:
        fast_df = triangle_counts_per_node(edges, **kw)
        old = G.RESIDENT_EDGES_MAX
        G.RESIDENT_EDGES_MAX = 0
        try:
            dist_df = triangle_counts_per_node(edges, **kw)
        finally:
            G.RESIDENT_EDGES_MAX = old
        assert fast_df.schema == dist_df.schema, kw
        fast = sorted(map(tuple, fast_df.collect()))
        dist = sorted(map(tuple, dist_df.collect()))
        assert fast == dist and len(fast) > 0, kw


# ---------------------------------------------------------------------------
# r13 resident text-similarity tier (operators/resident_text.py)
# ---------------------------------------------------------------------------


def _messy_docs(spark, sf_dir):
    """sf docs + adversarial rows: NULL text, empty text, whitespace-
    only text, a doc that is pure tabs/newlines (split edge cases)."""
    docs = read_table(spark, sf_dir, "documents").limit(200)
    extra = spark.createDataFrame(
        [
            (900001, None, None, None, None),
            (900002, "", "en", "web", 0),
            (900003, "   ", "en", "web", 3),
            (900004, "\tword\na  b\t", "en", "web", 12),
            (900005, " the quick the quick the quick ", "en", "web", 31),
        ],
        schema=docs.schema,
    )
    return docs.unionByName(extra)


def _assert_text_tier_parity(fast_df, dist_df, allow_empty=False):
    assert fast_df.schema == dist_df.schema
    fast = sorted(map(tuple, fast_df.collect()))
    dist = sorted(map(tuple, dist_df.collect()))
    assert fast == dist
    if not allow_empty:
        assert len(fast) > 0


def test_minhash_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators import dedup as D

    docs = _messy_docs(spark, sf_dir)
    _assert_text_tier_parity(
        D.minhash_near_duplicates(docs, threshold=0.7),
        D.minhash_near_duplicates(docs, threshold=0.7, resident_max=0),
    )


def test_jaccard_prefix_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators import dedup as D

    docs = _messy_docs(spark, sf_dir)
    # shingle path (the bench entry's config) and the unigram path
    _assert_text_tier_parity(
        D.jaccard_prefix_join(docs, threshold=0.7, shingle_k=5),
        D.jaccard_prefix_join(docs, threshold=0.7, shingle_k=5, resident_max=0),
    )
    _assert_text_tier_parity(
        D.jaccard_prefix_join(docs.limit(60), threshold=0.6),
        D.jaccard_prefix_join(docs.limit(60), threshold=0.6, resident_max=0),
    )


def test_weighted_jaccard_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators import dedup as D

    docs = _messy_docs(spark, sf_dir)
    _assert_text_tier_parity(
        D.weighted_jaccard_pairs(docs, threshold_num=2, threshold_den=5),
        D.weighted_jaccard_pairs(
            docs, threshold_num=2, threshold_den=5, resident_max=0
        ),
    )


def test_blocked_pairs_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.inventory.llm import jaccard_blocked_pairs

    docs = _messy_docs(spark, sf_dir)
    _assert_text_tier_parity(
        jaccard_blocked_pairs(docs, threshold=0.5),
        jaccard_blocked_pairs(docs, threshold=0.5, resident_max=0),
    )


def test_text_tier_gates_bail(spark, sf_dir):
    """Non-ASCII corpora, duplicate ids and string ids must fall back
    to the distributed plan (collect_corpus returns None)."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators import resident_text as RT

    docs = read_table(spark, sf_dir, "documents").limit(50)
    non_ascii = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.lit("café au lait")).otherwise(
            F.col("text")
        ),
    )
    assert RT.collect_corpus(non_ascii, "text", "doc_id") is None
    dup_ids = docs.unionByName(docs.limit(5))
    assert RT.collect_corpus(dup_ids, "text", "doc_id") is None
    str_ids = docs.withColumn("doc_id", F.col("doc_id").cast("string"))
    assert RT.collect_corpus(str_ids, "text", "doc_id") is None
    assert RT.collect_corpus(docs, "text", "doc_id", max_docs=0) is None
    assert RT.collect_corpus(docs, "text", "doc_id", max_docs=10) is None
    # and the non-ASCII corpus still computes correctly distributed:
    from robosystems_spark.operators import dedup as D

    out = D.minhash_near_duplicates(non_ascii, threshold=0.7)
    out2 = D.minhash_near_duplicates(non_ascii, threshold=0.7, resident_max=0)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, out2.collect())
    )


def test_fused_duplicate_clusters_match_unfused(spark, sf_dir):
    """The precollected clusters path (resident blocked pairs -> numpy
    components/sizes/keep) must equal the unfused plan, schema
    included, for both CC methods."""
    from robosystems_spark.inventory.llm import (
        _blocked_pairs_pre,
        jaccard_blocked_pairs,
    )
    from robosystems_spark.operators.graph import duplicate_clusters

    docs = read_table(spark, sf_dir, "documents")
    pre = _blocked_pairs_pre(docs, threshold=0.5)
    assert pre is not None
    pairs = jaccard_blocked_pairs(docs, threshold=0.5, resident_max=0).select(
        "doc_a", "doc_b"
    )
    for method in ("labelprop", "star"):
        fused = duplicate_clusters(pairs, method=method, precollected=pre)
        plain = duplicate_clusters(pairs, method=method)
        assert fused.schema == plain.schema, method
        f = sorted(map(tuple, fused.collect()))
        p = sorted(map(tuple, plain.collect()))
        assert f == p and len(f) > 0, method


def test_sp_edges_np_matches_spark_build(spark, sf_dir):
    """r13 fused _sp_edges construction: the numpy edge build must
    equal the Spark distinct edge set (both directions of the doubled
    variant), and bail (None) on gate violations."""
    from robosystems_spark.inventory.graph import _sp_edges, _sp_edges_np

    li = read_table(spark, sf_dir, "lineitem")
    ids, si, di = _sp_edges_np(li)
    fast = sorted(zip(ids[si].tolist(), ids[di].tolist()))
    ref = sorted(map(tuple, _sp_edges(li).dropDuplicates().collect()))
    assert fast == ref and len(fast) > 0
    ids2, si2, di2 = _sp_edges_np(li, doubled=True)
    fast2 = sorted(zip(ids2[si2].tolist(), ids2[di2].tolist()))
    ref2 = sorted(fast + [(b, a) for a, b in fast])
    assert fast2 == ref2
    # gate bailouts
    with_null = li.withColumn(
        "l_partkey",
        F.when(F.col("l_orderkey") % 97 == 0, None).otherwise(
            F.col("l_partkey")
        ),
    )
    assert _sp_edges_np(with_null) is None
    as_str = li.withColumn("l_suppkey", F.col("l_suppkey").cast("string"))
    assert _sp_edges_np(as_str) is None


def test_fused_sp_edges_entries_match_unfused(spark, sf_dir):
    """pagerank / HITS / LPA with the precollected triple must equal
    the r12 plans (schema included)."""
    from robosystems_spark.inventory.graph import _sp_edges, _sp_edges_np
    from robosystems_spark.operators.graph import (
        hits,
        label_propagation,
        pagerank,
    )

    li = read_table(spark, sf_dir, "lineitem")
    e = _sp_edges(li)
    cases = [
        (
            pagerank(e, num_iter=2, precollected=_sp_edges_np(li)),
            pagerank(e, num_iter=2),
        ),
        (
            hits(e, num_iter=2, precollected=_sp_edges_np(li)),
            hits(e, num_iter=2),
        ),
        (
            label_propagation(
                e.dropDuplicates(), rounds=2, canonical=True,
                precollected=_sp_edges_np(li, doubled=True),
            ),
            label_propagation(e.dropDuplicates(), rounds=2, canonical=True),
        ),
    ]
    for fused, plain in cases:
        assert fused.schema == plain.schema
        f = sorted(map(tuple, fused.collect()))
        p = sorted(map(tuple, plain.collect()))
        assert f == p and len(f) > 0


def test_ppmi_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.corpus import ppmi_word_similarity

    docs = _messy_docs(spark, sf_dir)
    for kw in (dict(), dict(min_count=5, k=20)):
        fast = ppmi_word_similarity(docs, **kw)
        dist = ppmi_word_similarity(docs, resident_max=0, **kw)
        assert fast.schema == dist.schema
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, dist.collect())
        )


def test_dsir_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.corpus import dsir_importance

    docs = _messy_docs(spark, sf_dir).withColumn(
        "is_target",
        F.when(F.col("doc_id") % 3 == 0, F.col("lang") == "en"),
    )
    fast = dsir_importance(docs)
    dist = dsir_importance(docs, resident_max=0)
    assert fast.schema == dist.schema
    f = sorted(map(tuple, fast.collect()))
    d = sorted(map(tuple, dist.collect()))
    assert f == d and len(f) > 0


def test_curation_resident_tail_matches_distributed(spark, sf_dir):
    """The curation entry's resident tail (rank/caps/minhash/verdict
    over one collect of the checkpointed q frame) must equal the
    distributed tail, schema included."""
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded
    from robosystems_spark.operators import resident_text as RT

    _ensure_loaded()
    fn = REGISTRY["crawl_curation_pipeline"].fn
    fast_df = fn(spark, sf_dir)
    old = RT.RESIDENT_DOCS_MAX
    RT.RESIDENT_DOCS_MAX = 0
    try:
        dist_df = fn(spark, sf_dir)
    finally:
        RT.RESIDENT_DOCS_MAX = old
    assert fast_df.schema == dist_df.schema
    fast = sorted(map(tuple, fast_df.collect()))
    dist = sorted(map(tuple, dist_df.collect()))
    assert fast == dist and len(fast) > 0


def test_ccnet_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.corpus import ccnet_perplexity_buckets

    docs = _messy_docs(spark, sf_dir)
    fast = ccnet_perplexity_buckets(docs)
    dist = ccnet_perplexity_buckets(docs, resident_max=0)
    assert fast.schema == dist.schema
    f = sorted(map(tuple, fast.collect()))
    d = sorted(map(tuple, dist.collect()))
    assert f == d and len(f) > 0


def test_decontamination_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded
    from robosystems_spark.operators import resident_text as RT

    _ensure_loaded()
    fn = REGISTRY["decontamination_ngram_overlap"].fn
    fast_df = fn(spark, sf_dir)
    old = RT.RESIDENT_DOCS_MAX
    RT.RESIDENT_DOCS_MAX = 0
    try:
        dist_df = fn(spark, sf_dir)
    finally:
        RT.RESIDENT_DOCS_MAX = old
    assert fast_df.schema == dist_df.schema
    assert sorted(map(tuple, fast_df.collect())) == sorted(
        map(tuple, dist_df.collect())
    )


def test_bm25_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators.search import bm25_topk

    docs = _messy_docs(spark, sf_dir)
    q = ["spark", "vector", "window"]
    fast = bm25_topk(docs, q, k=25)
    dist = bm25_topk(docs, q, k=25, resident_max=0)
    assert fast.schema == dist.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, dist.collect())
    )


def test_rrf_resident_matches_distributed(spark, sf_dir):
    from robosystems_spark.operators import resident_text as RT
    from robosystems_spark.operators.search import hybrid_rrf_topk

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding")
    q = ["spark", "vector", "window"]
    fast = hybrid_rrf_topk(docs, emb, q, qv, k=20)
    old = RT.RESIDENT_DOCS_MAX
    RT.RESIDENT_DOCS_MAX = 0
    try:
        dist = hybrid_rrf_topk(docs, emb, q, qv, k=20)
    finally:
        RT.RESIDENT_DOCS_MAX = old
    assert fast.schema == dist.schema
    f = sorted(map(tuple, fast.collect()))
    d = sorted(map(tuple, dist.collect()))
    assert f == d and len(f) > 0


def test_kl_and_tfidf_resident_match_distributed(spark, sf_dir):
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded
    from robosystems_spark.operators import resident_text as RT

    _ensure_loaded()
    for name in ("corpus_source_kl_divergence", "text_tfidf_top_term"):
        fn = REGISTRY[name].fn
        fast_df = fn(spark, sf_dir)
        old = RT.RESIDENT_DOCS_MAX
        RT.RESIDENT_DOCS_MAX = 0
        try:
            dist_df = fn(spark, sf_dir)
        finally:
            RT.RESIDENT_DOCS_MAX = old
        assert fast_df.schema == dist_df.schema, name
        f = sorted(map(tuple, fast_df.collect()))
        d = sorted(map(tuple, dist_df.collect()))
        assert f == d and len(f) > 0, name
