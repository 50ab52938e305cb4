"""k-means clustering operator: determinism, empty clusters, quality.

(The cross-engine hash gate runs via test_oracle_inventory on the
``embedding_kmeans_clusters`` registry entry.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.operators import clustering as C


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_assignment_is_partitioning_invariant(spark, emb):
    """Same clusters regardless of physical layout — the portability
    contract that makes the oracle possible."""
    a = {(r["vec_id"], r["centroid_id"])
         for r in C.kmeans(emb, k=4, iters=2).collect()}
    b = {(r["vec_id"], r["centroid_id"])
         for r in C.kmeans(emb.repartition(13), k=4, iters=2).collect()}
    assert a == b


def test_lloyd_iterations_do_not_hurt_inertia(spark, emb):
    """Mean assigned-cosine must not decrease across Lloyd updates
    (k-means monotonicity, up to the 1e-9 rounding contract)."""
    from robosystems_spark.functions import vector as V

    def mean_cos(centroids):
        assigned = emb.select(
            "embedding", V.nearest_centroid("embedding", centroids).alias("cid")
        )
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], ["cid", "cvec"]
        )
        return (
            assigned.join(F.broadcast(cent_df), "cid")
            .select(V.cosine("embedding", "cvec").alias("cos"))
            .agg(F.avg("cos"))
            .first()[0]
        )

    c0 = C.kmeans_fit(emb, k=6, iters=0)
    c2 = C.kmeans_fit(emb, k=6, iters=2)
    assert mean_cos(c2) >= mean_cos(c0) - 1e-6


def test_empty_cluster_keeps_previous_centroid(spark):
    """Two far-apart groups seeded with 3 centroids: a centroid that
    captures no vectors must survive unchanged, not vanish or NaN."""
    rows = [
        (0, [10.0, 0.0]), (1, [10.0, 0.1]),   # seed 0 and 1: same region
        (2, [0.0, 10.0]), (3, [0.1, 10.0]),   # seed 2: other region
        (4, [10.1, 0.0]), (5, [0.0, 10.1]),
    ]
    emb2 = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = C.kmeans_fit(emb2, k=3, iters=2, round_decimals=6)
    assert len(cents) == 3
    assert all(len(c) == 2 and all(x == x for x in c) for c in cents)
    out = C.kmeans_assign(emb2, cents)
    assert out.count() == 6
    # every vector lands in a cluster near its region
    got = {r["vec_id"]: r["centroid_id"] for r in out.collect()}
    assert got[0] == got[4] and got[2] == got[5]


def test_cluster_profile_covers_all_vectors(spark, emb):
    prof = C.kmeans_cluster_profile(emb, k=8, iters=1)
    rows = prof.collect()
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    assert [r["centroid_id"] for r in rows] == sorted(r["centroid_id"] for r in rows)


def test_oracle_sql_shape():
    sql = C.kmeans_oracle_sql(k=4, iters=3, dim=16)
    assert sql.count("LIST_COSINE_SIMILARITY") == 4  # 3 assigns + final
    assert "cent3" in sql and "cent4" not in sql.replace("cent4 AS", "cent4_")
    prof = C.kmeans_oracle_sql(k=4, iters=1, dim=16, profile=True)
    assert "n_vectors" in prof


# -- PageRank ---------------------------------------------------------------


def test_pagerank_known_graph(spark):
    """3-node cycle => uniform ranks; star => center dominates; ranks
    always sum to 1 (dangling mass redistributed, not lost)."""
    from robosystems_spark.operators.graph import pagerank

    cycle = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r = {row["node"]: row["rank"] for row in pagerank(cycle, num_iter=5).collect()}
    assert all(abs(v - 1 / 3) < 1e-9 for v in r.values())

    # star with dangling leaves: b,c,d have no out-edges
    star = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")], "src string, dst string"
    )
    ranks = {row["node"]: row["rank"] for row in pagerank(star, num_iter=8).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # mass conserved
    assert ranks["b"] == ranks["c"] == ranks["d"]
    assert ranks["b"] > ranks["a"]  # leaves receive all of a's rank

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(cycle, num_iter=0)
