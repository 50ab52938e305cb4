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


def test_semantic_dedup_drops_near_identical(spark):
    from robosystems_spark.operators.clustering import semantic_dedup

    # Two tight groups far apart; within each group the vectors are
    # near-identical (cos > 0.999) -> lowest id kept per group.
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (1, base_a),
        (2, [0.999, 0.001, 0.0, 0.0]),  # ~base_a
        (3, base_b),
        (4, [0.002, 0.998, 0.0, 0.0]),  # ~base_b
        (5, [0.0, 0.0, 1.0, 0.0]),      # singleton direction
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, k=3, iters=2, tau=0.99).collect()
    }
    assert out[1]["is_kept"] and not out[2]["is_kept"]
    assert out[3]["is_kept"] and not out[4]["is_kept"]
    assert out[5]["is_kept"]
    assert out[2]["max_sim_to_lower"] > 0.99
    # Dropped vectors share their keeper's cluster.
    assert out[2]["centroid_id"] == out[1]["centroid_id"]


def test_semantic_dedup_cap_splits_cluster(spark):
    from robosystems_spark.operators.clustering import semantic_dedup

    # 6 identical vectors, cluster_cap=2 -> sub-blocks {id%3}: dedup
    # only within a sub-block, so each block keeps its lowest id.
    rows = [(i, [1.0, 0.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {
        r["vec_id"]: r["is_kept"]
        for r in semantic_dedup(
            emb, k=1, iters=1, tau=0.99, cluster_cap=2
        ).collect()
    }
    # ids 0,1,2 are the lowest of sub-blocks 0,1,2 -> kept; 3,4,5 dropped.
    assert out == {0: True, 1: True, 2: True, 3: False, 4: False, 5: False}


def test_kcore_peels_cascade(spark):
    from robosystems_spark.operators.graph import kcore

    # 4-clique (every node degree 3) + a pendant chain hanging off it:
    # at k=2 the chain peels away over successive rounds (cascade),
    # the clique survives with full degree.
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "src LONG, dst LONG")
    out = {r["node"]: r["core_degree"] for r in kcore(edges, k=2, rounds=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(v == 3 for v in out.values())

    # One round only: the degree-1 leaf (12) peels; 11 survives the
    # round but its residual degree drops to 1 (next round's victim).
    one = {r["node"]: r["core_degree"] for r in kcore(edges, k=2, rounds=1).collect()}
    assert 12 not in one and one[11] == 1 and 10 in one

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kcore(edges, k=0)


def test_label_propagation_finds_two_cliques(spark):
    """Two 4-cliques joined by a single bridge edge: LPA must converge
    to exactly two communities of 4, each labeled by its min node."""
    from robosystems_spark.operators.graph import label_propagation

    clique_a = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"),
                ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
    clique_b = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"),
                ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
    bridge = [("a4", "b1")]
    edges = spark.createDataFrame(
        clique_a + clique_b + bridge, "src STRING, dst STRING"
    )
    out = {
        r["community"]: r["n_nodes"]
        for r in label_propagation(edges, rounds=4).collect()
    }
    assert out == {"a1": 4, "b1": 4}


def test_label_propagation_deterministic_across_runs(spark):
    from robosystems_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)],
        "src STRING, dst STRING",
    )
    a = sorted(map(tuple, label_propagation(edges, rounds=3).collect()))
    b = sorted(map(tuple, label_propagation(edges, rounds=3).collect()))
    assert a == b


def test_personalized_pagerank_localizes_mass_near_seeds(spark):
    """PPR semantics on a barbell: two 3-cycles bridged by one edge.
    Seeding in the left cycle must (a) conserve total mass at ~1,
    (b) concentrate most mass on the left cycle, (c) still leak some
    across the bridge — and an unreachable isolated edge gets zero."""
    from robosystems_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),   # left cycle
            ("c", "x"),                             # bridge
            ("x", "y"), ("y", "z"), ("z", "x"),   # right cycle
            ("q1", "q2"),                           # unreachable from seeds
        ],
        ["src", "dst"],
    )
    r = {
        row["node"]: row["rank"]
        for row in personalized_pagerank(edges, ["a"], num_iter=12).collect()
    }
    assert abs(sum(r.values()) - 1.0) < 1e-6
    left = r["a"] + r["b"] + r["c"]
    right = r["x"] + r["y"] + r["z"]
    assert left > right > 0
    assert r["q1"] == 0.0 and r["q2"] == 0.0
    import pytest

    with pytest.raises(ValueError):
        personalized_pagerank(edges, [], num_iter=3)


def test_clustering_coefficient_known_graph(spark):
    """Golden semantics: a triangle plus a pendant. In K3+pendant
    {a-b, b-c, a-c, c-d}: a,b have coefficient 1.0 (their whole
    neighborhood is connected), c has 2 neighbors of 3 connected ->
    2*1/(3*2)=1/3, d has degree 1 -> excluded."""
    from robosystems_spark.operators.graph import clustering_coefficient

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["src", "dst"]
    )
    out = {
        r["node"]: (r["degree"], r["n_triangles"], r["coefficient"])
        for r in clustering_coefficient(edges).collect()
    }
    assert out["a"] == (2, 1, 1.0)
    assert out["b"] == (2, 1, 1.0)
    assert out["c"] == (3, 1, round(1 / 3, 6))
    assert "d" not in out


def test_scc_known_graphs(spark):
    """SCC goldens: two cycles + bridge + tail; a pure DAG (all
    singletons); a single big cycle; disposal of cross-SCC edges."""
    from robosystems_spark.operators.graph import strongly_connected_components

    def run(edges):
        df = spark.createDataFrame(edges, ["src", "dst"])
        return sorted(
            (r["node"], r["component"])
            for r in strongly_connected_components(df).collect()
        )

    # 1->2->3->1 cycle, bridge 3->4, 4<->5 cycle, tail 5->6
    got = run([(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6)])
    assert got == [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)]

    # DAG: every node its own SCC despite full weak connectivity
    got = run([(1, 2), (1, 3), (2, 4), (3, 4)])
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4)]

    # one big cycle: everything labeled by the minimum member
    got = run([(5, 6), (6, 7), (7, 8), (8, 5)])
    assert got == [(5, 5), (6, 5), (7, 5), (8, 5)]

    # descending chain (worst case for naive peeling): singletons
    got = run([(3, 2), (2, 1)])
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_harmonic_centrality_star_golden(spark):
    """Star graph golden: leaves -> hub.  H(hub) = (n-1)/1; each leaf
    receives nothing (directed).  Reversed star: H(leaf) = 1."""
    from robosystems_spark.operators.graph import harmonic_centrality

    star = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], ["src", "dst"]
    )
    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(star, max_depth=3).collect()
    }
    assert got == {0: 5.0}

    rev = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(rev, max_depth=3).collect()
    }
    assert got == {i: 1.0 for i in range(1, 6)}

    # path 1->2->3->4 at depth 3: H(4) = 1 + 1/2 + 1/3 = 1.833333
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(path, max_depth=3).collect()
    }
    assert got[4] == 1.833333 and got[3] == 1.5 and got[2] == 1.0


def test_modularity_two_cliques_golden(spark):
    """Two 4-cliques + one bridge with the perfect 2-community
    assignment: m = 13, within A: e=6 d=13 (a4 carries the bridge),
    so Q_a = 6/13 - (13/26)^2 and symmetric for B — the textbook
    closed form, checked to the cent."""
    from robosystems_spark.operators.graph import (
        label_propagation_assignments,
        modularity,
    )

    clique_a = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"),
                ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
    clique_b = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"),
                ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
    edges = spark.createDataFrame(
        clique_a + clique_b + [("a4", "b1")], "src STRING, dst STRING"
    )
    assign = label_propagation_assignments(edges, rounds=4)
    rows = {r["community"]: r for r in modularity(edges, assign).collect()}
    assert set(rows) == {"a1", "b1"}
    for c in ("a1", "b1"):
        r = rows[c]
        assert r["n_nodes"] == 4
        assert r["internal_edges"] == 6
        assert r["degree_sum"] == 13  # 3+3+3+4 (bridge endpoint)
        expected = 6.0 / 13.0 - (13.0 / 26.0) * (13.0 / 26.0)
        assert abs(r["q_contrib"] - round(expected, 9)) < 1e-12
    # total modularity of the ideal split is positive and large
    assert sum(r["q_contrib"] for r in rows.values()) > 0.35


def test_ktruss_peels_bridge_keeps_cliques(spark):
    """Two 5-cliques joined by one bridge edge: in the 4-truss every
    clique edge has support 3 (>= k-2 = 2) and survives; the bridge
    has support 0 and peels in round 1."""
    from robosystems_spark.operators.graph import ktruss

    import itertools

    def clique(prefix):
        nodes = [f"{prefix}{i}" for i in range(5)]
        return list(itertools.combinations(nodes, 2))

    edges = spark.createDataFrame(
        clique("a") + clique("b") + [("a0", "b0")],
        "src STRING, dst STRING",
    )
    out = ktruss(edges, k=4, rounds=2).collect()
    assert len(out) == 20  # 2 * C(5,2)
    assert all(r["support"] == 3 for r in out)
    assert ("a0", "b0") not in {(r["a"], r["b"]) for r in out}

    # cascade: a triangle hanging off a clique by one shared edge
    # survives round 1 (support 1 each... k=4 -> needs 2) and peels;
    # with k=3 it survives
    tri = [("a0", "x"), ("a1", "x")]
    edges2 = spark.createDataFrame(
        clique("a") + tri, "src STRING, dst STRING"
    )
    k3 = ktruss(edges2, k=3, rounds=3).collect()
    assert {(r["a"], r["b"]) for r in k3} >= {("a0", "x"), ("a1", "x")}
    k4 = ktruss(edges2, k=4, rounds=3).collect()
    surv = {(r["a"], r["b"]) for r in k4}
    assert ("a0", "x") not in surv and ("a1", "x") not in surv
    assert len(surv) == 10  # the 5-clique survives intact


def test_stress_centrality_star_and_path_goldens(spark):
    """Star: every leaf pair's shortest path runs through the center
    -> stress(center) = 2 * C(3,2) = 6 with all nodes as sources.
    Path a-b-c-d: stress(b) counts (a->c), (a->d), (c->a), (d->a)
    within depth 3 = 4; interior symmetric for c."""
    from robosystems_spark.operators.graph import stress_centrality

    star = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("c", "l3")], "src STRING, dst STRING"
    )
    nodes = spark.createDataFrame(
        [("c",), ("l1",), ("l2",), ("l3",)], "s STRING"
    )
    out = {r["node"]: r["stress"] for r in
           stress_centrality(star, nodes, max_depth=3).collect()}
    assert out["c"] == 6
    assert out["l1"] == 0 and out["l2"] == 0 and out["l3"] == 0

    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src STRING, dst STRING"
    )
    pnodes = spark.createDataFrame([(x,) for x in "abcd"], "s STRING")
    out = {r["node"]: r["stress"] for r in
           stress_centrality(path, pnodes, max_depth=3).collect()}
    assert out == {"a": 0, "b": 4, "c": 4, "d": 0}

    # sigma multiplicity: a 4-cycle a-b, a-c, b-d, c-d; paths a->d
    # have sigma=2, both through b and c once each: stress(b) counts
    # a->d (1 path via b) and d->a (1) plus... b interior only for
    # a<->d pairs = 2
    cyc = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "src STRING, dst STRING",
    )
    cnodes = spark.createDataFrame([(x,) for x in "abcd"], "s STRING")
    out = {r["node"]: r["stress"] for r in
           stress_centrality(cyc, cnodes, max_depth=3).collect()}
    assert out == {"a": 2, "b": 2, "c": 2, "d": 2}


def test_betweenness_centrality_goldens(spark):
    """Exact Brandes values on small graphs (ordered-pair convention):
    star center 6.0; path interior 4.0; 4-cycle: each a<->d shortest
    path splits sigma 2 ways -> 1.0 per intermediate."""
    from robosystems_spark.operators.graph import betweenness_centrality

    star = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("c", "l3")], "src STRING, dst STRING"
    )
    nodes = spark.createDataFrame(
        [("c",), ("l1",), ("l2",), ("l3",)], "s STRING"
    )
    out = {r["node"]: r["betweenness"] for r in
           betweenness_centrality(star, nodes, max_depth=3).collect()}
    assert out["c"] == 6.0 and out["l1"] == 0.0

    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src STRING, dst STRING"
    )
    pnodes = spark.createDataFrame([(x,) for x in "abcd"], "s STRING")
    out = {r["node"]: r["betweenness"] for r in
           betweenness_centrality(path, pnodes, max_depth=3).collect()}
    assert out == {"a": 0.0, "b": 4.0, "c": 4.0, "d": 0.0}

    cyc = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "src STRING, dst STRING",
    )
    cnodes = spark.createDataFrame([(x,) for x in "abcd"], "s STRING")
    out = {r["node"]: r["betweenness"] for r in
           betweenness_centrality(cyc, cnodes, max_depth=3).collect()}
    assert out == {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}


def test_mmr_diversifies_against_redundancy(spark):
    """MMR must skip a near-duplicate of an already-selected document
    in favor of a less relevant but novel one (the whole point), and
    must reduce to pure relevance order at lam=1."""
    from robosystems_spark.operators.similarity import mmr_topk

    # query q; a and a2 nearly identical and most relevant; b distinct
    vecs = [
        (0, [1.0, 0.0, 0.0]),          # the query itself
        (1, [0.98, 0.20, 0.0]),        # a: very relevant
        (2, [0.97, 0.24, 0.0]),        # a2: near-dup of a
        (3, [0.60, 0.0, 0.80]),        # b: less relevant, novel
        (4, [0.0, 1.0, 0.0]),          # c: irrelevant
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], "l") for i, v in vecs],
        "vec_id LONG, embedding ARRAY<DOUBLE>, label STRING",
    )
    q = emb.filter("vec_id = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    # lam=0.3 (diversity-heavy): score(a2) = 0.3*0.97 - 0.7*~0.999
    # (near-dup of already-picked a) loses to score(b) = 0.3*0.6 -
    # 0.7*0.6 — hand-checked closed form
    picks = [
        (r["step"], r["nn_id"])
        for r in mmr_topk(emb, q, k=3, pool=5, lam=0.3).collect()
    ]
    order = [n for _, n in sorted(picks)]
    assert order[0] == 0  # the query vector itself is most relevant
    # step 3 must prefer novel b(3) over near-dup a2(2)
    assert 3 in order and 2 not in order, order

    # lam=1: pure relevance order (cosine desc, id tiebreak)
    picks = [
        (r["step"], r["nn_id"])
        for r in mmr_topk(emb, q, k=3, pool=5, lam=1.0).collect()
    ]
    order = [n for _, n in sorted(picks)]
    assert order == [0, 1, 2]


def test_graph_summary_star_golden(spark):
    """Star graph: center degree 3, leaves 1 -> perfectly
    disassortative, r = -1 exactly (integer-sum check: m2=6, sxy=18,
    sx=12, sxx=30 -> num=-36, den=36); density = 6/(4*3) = 0.5."""
    from robosystems_spark.operators.graph import graph_summary

    star = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("c", "l3")], "src STRING, dst STRING"
    )
    r = graph_summary(star).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 3
    assert r["avg_degree"] == 1.5
    assert r["density"] == 0.5
    assert r["assortativity"] == -1.0

    # 4-cycle: all degrees equal -> correlation undefined (den=0);
    # both engines produce NULL/NaN-free behavior is not required
    # here, but a regular graph plus one chord is well-defined
    g = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        "src STRING, dst STRING",
    )
    r = graph_summary(g).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 5
    assert -1.0 <= r["assortativity"] <= 0.0  # chord makes it disassortative


def test_scc_long_cycle_converges_past_soft_cap(spark):
    """ADVICE r8 (medium): a directed cycle LONGER than the fixpoint's
    soft iteration target used to return non-converged labels silently,
    splitting one SCC into singletons.  The fixpoint now runs to true
    convergence, so a 34-node cycle is one component labeled 0."""
    from robosystems_spark.operators.graph import strongly_connected_components

    n = 34
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], ["src", "dst"]
    )
    got = sorted(
        (r["node"], r["component"])
        for r in strongly_connected_components(edges).collect()
    )
    assert got == [(i, 0) for i in range(n)]


def test_scc_empty_edges_returns_empty_frame(spark):
    """ADVICE r8: no edges -> an empty (node, component) DataFrame,
    not None."""
    from robosystems_spark.operators.graph import strongly_connected_components

    edges = spark.createDataFrame([], "src long, dst long")
    out = strongly_connected_components(edges)
    assert out is not None
    assert out.columns == ["node", "component"]
    assert out.count() == 0


def test_margin_bitext_cancels_hubness(spark):
    """The ratio margin ranks a mutually-exclusive match above a hub
    that is merely close to everything (the property plain cosine
    thresholding lacks)."""
    from robosystems_spark.operators.similarity import margin_bitext_mining

    # x1 matches y1 tightly and nothing else; hub x2 is moderately
    # close to EVERY y, so its neighborhood mean is as high as its
    # best cosine -> margin ~= 2k/(k+k) ~ 1, while x1-y1 margin >> 1.
    a = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.5, 0.5, 0.5, 0.5]),
        ],
        "id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [
            (10, [0.99, 0.1, 0.0, 0.0]),
            (11, [0.5, 0.5, 0.5, 0.49]),
            (12, [0.49, 0.5, 0.5, 0.5]),
            (13, [0.5, 0.49, 0.5, 0.5]),
        ],
        "id long, embedding array<float>",
    )
    rows = margin_bitext_mining(a, b, k=3, top=10).collect()
    best = rows[0]
    assert (best["src_id"], best["tgt_id"]) == (1, 10)
    hub_margins = [r["margin"] for r in rows if r["src_id"] == 2]
    assert best["margin"] > max(hub_margins) + 0.05


def test_scc_distributed_path_matches_endgame(spark, monkeypatch):
    """r11: the MultiStep Tarjan endgame handles every fixture-sized
    graph, so force MAX_BROADCAST_NODES=0 to exercise the DISTRIBUTED
    trim + fused-fixpoint peeling path and pin it to the same answer
    (rings of different sizes, a bridge chain, dangling singletons)."""
    import robosystems_spark.operators.graph as G

    edges = []
    base = 0
    ring_mins = []
    for size in (3, 5, 4):
        ids = list(range(base, base + size))
        edges += [(ids[i], ids[(i + 1) % size]) for i in range(size)]
        ring_mins.append(ids[0])
        base += size
    # one-directional bridges between ring minima (must NOT merge)
    edges += [(ring_mins[0], ring_mins[1]), (ring_mins[1], ring_mins[2])]
    # dangling leaves (singleton SCCs, exercises trim)
    edges += [(ring_mins[2], 100), (100, 101)]
    df = spark.createDataFrame(edges, ["src", "dst"])

    expected = sorted(
        (r["node"], r["component"])
        for r in G.strongly_connected_components(df).collect()
    )
    monkeypatch.setattr(G, "MAX_BROADCAST_NODES", 0)
    distributed = sorted(
        (r["node"], r["component"])
        for r in G.strongly_connected_components(df).collect()
    )
    assert distributed == expected
    # ground truth: each ring is one SCC keyed by its min; leaves singleton
    truth = []
    base = 0
    for size in (3, 5, 4):
        truth += [(base + i, base) for i in range(size)]
        base += size
    truth += [(100, 100), (101, 101)]
    assert expected == sorted(truth)


def test_betweenness_lattice_overflow_raises(spark):
    """ADVICE r10 (medium): (lattice + dint) * sigma is BIGINT; on
    inputs where it would exceed 2^63-1 the operator must raise loudly
    (matching DuckDB's overflow error) instead of wrapping silently in
    non-ANSI Spark.  A huge `lattice` makes a tiny path graph trigger
    the product overflow deterministically."""
    import pytest as _pytest

    from robosystems_spark.operators.graph import betweenness_centrality

    # diamond + tail: sigma(3 from 0) = 2 with node 3 mid-path, so the
    # backward term multiplies (lattice + dint) by sigma(v)=2 and
    # crosses 2^63 at lattice = 5e18
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], ["src", "dst"]
    )
    sources = spark.createDataFrame([(0,)], ["s"])
    with _pytest.raises(Exception, match="integer-lattice overflow"):
        betweenness_centrality(
            edges, sources, max_depth=3, lattice=5 * 10**18
        ).collect()
    # sane lattice on the same graph still works
    out = betweenness_centrality(edges, sources, max_depth=3).collect()
    assert len(out) > 0
