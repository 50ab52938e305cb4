"""Product quantization: recall quality, determinism, plan discipline.

(The cross-engine hash gate runs via test_oracle_inventory on the
``embedding_pq_topk`` registry entry.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from robosystems_spark.operators import pq as PQ


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebooks(emb):
    return PQ.pq_train_codebooks(emb, m=4, k=16, iters=1, dim=64)


def _exact_l2_topk(spark, emb, query_ids, k):
    """Brute-force squared-L2 top-k ground truth via column exprs."""
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    d2 = F.expr(
        "aggregate(zip_with(embedding, qv, (a, b) -> "
        "(cast(a as double) - cast(b as double)) * "
        "(cast(a as double) - cast(b as double))), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    sims = emb.crossJoin(F.broadcast(q)).select(
        "query_id", F.col("vec_id").alias("nn_id"), d2.alias("d2")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("nn_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_pq_recall_against_exact_l2(spark, emb, codebooks):
    """ADC with m=4, k=16 codebooks must keep recall@10 well above
    chance (10/500 = 2%) — the quantitative gate that the compressed
    search still finds real neighbors."""
    qids = [0, 1, 2]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = PQ.pq_topk(emb, queries, codebooks, topk=10)
    exact = _exact_l2_topk(spark, emb, qids, 10)
    a = {(r["query_id"], r["nn_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["nn_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.3, f"PQ recall@10 degraded to {recall}"
    # the query vector itself must always be its own nearest neighbor
    # (its own codes give the minimal table sum)
    for qid in qids:
        assert (qid, qid) in a


def test_encode_is_partitioning_invariant(spark, emb, codebooks):
    a = {(r["vec_id"], tuple(r["codes"]))
         for r in PQ.pq_encode(emb, codebooks).collect()}
    b = {(r["vec_id"], tuple(r["codes"]))
         for r in PQ.pq_encode(emb.repartition(7), codebooks).collect()}
    assert a == b


def test_codes_shape_and_range(emb, codebooks):
    rows = PQ.pq_encode(emb, codebooks).collect()
    assert all(len(r["codes"]) == 4 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])


def test_codebook_shapes(codebooks):
    assert len(codebooks) == 4
    assert all(len(cb) == 16 for cb in codebooks)
    assert all(len(c) == 16 for cb in codebooks for c in cb)  # 64/4 dims


def test_dim_divisibility_guard(emb):
    with pytest.raises(ValueError, match="not divisible"):
        PQ.pq_train_codebooks(emb, m=5, k=8, dim=64)


def test_pq_search_plan_is_codegen_with_topk(spark, sf_dir, emb, codebooks):
    """The ADC scan must be Arrow-encoded + JVM lookups: no row UDFs,
    ranking never fully sorts (window top-k over small partitions)."""
    from tests.test_plans import plan_of

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = plan_of(PQ.pq_topk(emb, queries, codebooks, topk=5))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan  # the encode UDF


def test_pq_search_is_one_plan_for_large_batches(spark, emb, codebooks):
    """A 100-query batch must compile to ONE broadcast join over the
    encoded corpus — not a 100-branch union each carrying m*k distance
    literals (that shape made Catalyst analysis, not the cluster, the
    scale bottleneck)."""
    from tests.test_plans import plan_of

    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = PQ.pq_topk(emb, queries, codebooks, topk=3)
    plan = plan_of(df)
    assert "Union" not in plan, "per-query plan branches are back"
    # formatted explain prints each node in the tree AND a details
    # section — count joins in the tree section only
    tree = plan.split("\n\n")[0]
    assert (
        tree.count("BroadcastNestedLoopJoin") + tree.count("BroadcastHashJoin")
        == 1
    )
    # and it still answers: every query finds itself at rank 1
    top1 = {
        (r["query_id"], r["nn_id"])
        for r in df.filter("rank = 1").collect()
    }
    assert all((q, q) in top1 for q in range(100))


def test_random_projection_preserves_relative_distances(spark, emb):
    """JL property: after 64→16 projection, pairwise distance RATIOS
    stay within a loose band (enough to bucket/cluster in the small
    space)."""
    import numpy as np

    from robosystems_spark.operators.projection import random_projection

    orig = {r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in emb.filter("vec_id < 40").collect()}
    proj = {r["vec_id"]: np.array(r["projected"])
            for r in random_projection(emb.filter("vec_id < 40")).collect()}
    ids = sorted(orig)
    ratios = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d0 = np.linalg.norm(orig[a] - orig[b])
        d1 = np.linalg.norm(proj[a] - proj[b])
        if d0 > 0:
            ratios.append(d1 / d0)
    assert 0.5 < np.median(ratios) < 1.5
    assert all(0.2 < r < 2.5 for r in ratios)


def test_ivfpq_recall_against_exact(spark, sf_dir):
    """The composed IVF-PQ search keeps useful recall vs exact cosine
    top-10 (two approximation stages, so the bar is lower than flat
    PQ's, but it must beat random)."""
    from pyspark.sql import functions as F

    from robosystems_spark.io import read_table
    from robosystems_spark.operators.pq import ivfpq_topk
    from robosystems_spark.operators.similarity import cosine_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ivfpq_topk(emb, queries, nprobe=3, topk=10)
    exact = cosine_topk(emb, queries, k=10)
    a = {(r["query_id"], r["nn_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["nn_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.3, recall
    # each query returns a full ranked top-10
    ranks = {}
    for r in approx.collect():
        ranks.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in ranks.values())


def test_ivfpq_indexed_partition_pruned_and_value_identical(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ index (FAISS deployment shape): a probe's
    scan must carry PartitionFilters on centroid_id (only nprobe
    partitions read), and with identical deterministic training params
    the indexed search returns EXACTLY ivfpq_topk's rows."""
    from pyspark.sql import functions as F

    from robosystems_spark.io import read_table
    from robosystems_spark.operators.pq import (
        ivfpq_topk,
        ivfpq_topk_indexed,
        ivfpq_write_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivfpq_index")
    cents, books = ivfpq_write_index(emb, path)
    out = ivfpq_topk_indexed(spark, path, cents, books, queries, nprobe=3, topk=10)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:300]
    assert "centroid_id" in seg

    got = sorted(tuple(r) for r in out.collect())
    want = sorted(
        tuple(r) for r in ivfpq_topk(emb, queries, nprobe=3, topk=10).collect()
    )
    assert got == want
    # full ranked top-10 per query
    ranks = {}
    for q, _nn, _adc, rank in got:
        ranks.setdefault(q, []).append(rank)
    assert all(sorted(v) == list(range(1, 11)) for v in ranks.values())
