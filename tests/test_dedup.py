"""Near-dup operator quality: recall against brute-force ground truth.

The LSH operators are rows-only in the driver gate (engine-specific
hash permutations), so exactness lives here: on the sf0.001 documents
(500 docs — small enough for exact all-pairs), every true near-dup
pair must be recovered.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def true_pairs(docs):
    """Exact shingle-set Jaccard >= 0.7 pairs by brute force (driver-side,
    fine at 500 docs)."""
    rows = docs.select("doc_id", "text").collect()

    def sh(text, k=5):
        toks = text.lower().split()
        return {" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 1))}

    shingled = [(r["doc_id"], sh(r["text"])) for r in rows]
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(shingled, 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.7:
            out.add((min(ia, ib), max(ia, ib)))
    return out


def test_minhash_recall_and_precision(spark, docs, true_pairs):
    found = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_near_duplicates(docs, threshold=0.7).collect()
    }
    assert true_pairs, "fixture should contain near-duplicates"
    missed = true_pairs - found
    # LSH banding (16 bands x 4 rows) catches j>=0.7 with prob ~99.8%;
    # on this corpus demand full recall
    assert not missed, f"minhash missed true pairs: {sorted(missed)[:5]}"
    # precision is exact by construction (jaccard verify) — no false pairs
    assert found <= true_pairs | {p for p in found}  # sanity
    extra = [p for p in found if p not in true_pairs]
    assert not extra, f"verified pairs not in ground truth: {extra[:5]}"


def test_simhash_finds_identical_docs(spark, docs):
    """Hamming<=3 on 64-bit simhash is a much tighter near-dup notion;
    identical token multisets must collide at distance 0."""
    out = D.simhash_near_duplicates(docs, max_hamming=3).collect()
    assert out, "expected at least one simhash near-dup in the corpus"
    assert all(r["hamming"] <= 3 for r in out)


def test_embedding_neardup_verifies_cosine(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    out = D.embedding_near_duplicates(
        emb, threshold=0.4, num_bands=4, planes_per_band=4
    ).collect()
    for r in out:
        assert r["cosine"] >= 0.4
        assert r["id_a"] < r["id_b"]


@pytest.fixture(scope="module")
def emb_true_pairs(spark, sf_dir):
    """Brute-force cosine >= 0.4 pairs (driver-side numpy, fine at 500
    vectors) — ground truth for the LSH recall gates."""
    import numpy as np

    rows = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    A = np.array([r["embedding"] for r in rows], dtype=np.float64)
    A = A / np.linalg.norm(A, axis=1, keepdims=True)
    C = A @ A.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if C[i, j] >= 0.4:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_embedding_neardup_recall_and_precision(spark, sf_dir, emb_true_pairs):
    """The registry's banded-LSH parameters (8 bands x 3 planes) must
    recover >= 90% of true cosine>=0.4 pairs (seeded hyperplanes ->
    deterministic), and the cosine verify makes precision exact."""
    emb = read_table(spark, sf_dir, "embeddings")
    found = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_near_duplicates(
            emb, threshold=0.4, num_bands=8, planes_per_band=3
        ).collect()
    }
    assert emb_true_pairs, "fixture should contain near-duplicate embeddings"
    recall = len(found & emb_true_pairs) / len(emb_true_pairs)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9"
    assert found <= emb_true_pairs, f"false pairs: {sorted(found - emb_true_pairs)[:5]}"


def test_simhash_recall_and_precision_vs_brute_force(spark, docs):
    """The 4x16-bit chunk banding is EXACT for hamming <= 3 (pigeonhole:
    3 bit flips leave at least one chunk untouched), so the operator
    must return precisely the brute-force hamming<=3 pair set."""
    hashes = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    truth = set()
    items = sorted(hashes.items())
    for i, (ia, ha) in enumerate(items):
        for ib, hb in items[i + 1 :]:
            if bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3:
                truth.add((ia, ib))
    found = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_near_duplicates(docs, max_hamming=3).collect()
    }
    assert truth, "fixture should contain simhash near-dups"
    assert found == truth, (
        f"missed: {sorted(truth - found)[:5]}; false: {sorted(found - truth)[:5]}"
    )


def test_embedding_bucket_cap_bounds_skewed_corpus(spark):
    """An adversarial corpus (every vector near-identical, the case
    that collapses single-signature LSH into one quadratic bucket)
    must keep every (band, sig, sub) group at or under the cap, while
    the banded pipeline still completes and verifies true cosines."""
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        (i, (base + 1e-6 * rng.standard_normal(16)).tolist()) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cap = 16

    side = D.embedding_band_assignments(
        emb, num_bands=6, planes_per_band=4, bucket_cap=cap
    )
    counts = side.groupBy("_band", "_sig", "_sub").count().collect()
    assert max(r["count"] for r in counts) <= cap

    out = D.embedding_near_duplicates(
        emb, threshold=0.99, num_bands=6, planes_per_band=4, bucket_cap=cap
    ).collect()
    # sub-splitting sacrifices SOME pairs per band, but band-distinct
    # salts keep enough edges that transitive clustering (the dedup
    # consumer, operators/graph.py) would still merge the clone set
    assert out and all(r["cosine"] >= 0.99 for r in out)


def test_ivf_recall_at_k_vs_exact(spark, sf_dir):
    """IVF with precomputed centroids (registry parameters: 8
    centroids, nprobe 3) must reach recall@10 >= 0.9 against the
    exact cosine_topk oracle on the same queries."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators import similarity as S

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = {
        (r["query_id"], r["nn_id"]) for r in S.cosine_topk(emb, queries, k=10).collect()
    }
    cents = [c for _, c in S.train_centroids(emb, 8, iters=3)]
    approx = {
        (r["query_id"], r["nn_id"])
        for r in S.ivf_topk(emb, queries, k=10, nprobe=3, centroids=cents).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"ivf recall@10 {recall:.3f} < 0.9"


def test_exact_duplicates_keep_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (5, "same  TEXT "), (9, "different")],
        ["doc_id", "text"],
    )
    out = {r["fingerprint"]: r for r in D.exact_duplicates(df).collect()}
    groups = sorted((r["n_docs"], r["keep_doc_id"]) for r in out.values())
    # whitespace/case-normalized: docs 1 and 5 collapse, keep id 1
    assert groups == [(1, 9), (2, 1)]


def test_jaccard_block_cap_bounds_skewed_blocks(spark):
    """A boilerplate-heavy corpus (many docs sharing one 32-char
    prefix) must not produce a quadratic block: the sub-split bounds
    every (blk, sub) group at the cap while still pairing true
    near-dups that land in the same sub-block."""
    from robosystems_spark.inventory.llm import jaccard_blocked_pairs

    cap = 8
    boiler = "the quick brown fox jumps over the lazy dog "  # >32 chars
    rows = [(i, boiler + f"unique tail {i} " + " ".join(f"w{i}_{j}" for j in range(5)))
            for i in range(100)]
    # two exact near-dup pairs with adjacent ids (same sub-block for
    # any n_sub that divides evenly... use identical ids mod everything:
    # duplicate content at ids 200/201 sharing a DIFFERENT prefix)
    rows += [(200, "zz completely different prefix content alpha beta gamma"),
             (201, "zz completely different prefix content alpha beta gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # bounded sub-blocks: recompute the grouping the operator uses
    t = docs.select(
        "doc_id", F.substring("text", 1, 32).alias("blk")
    )
    sizes = t.groupBy("blk").agg(F.ceil(F.count(F.lit(1)) / float(cap)).alias("n_sub"))
    grouped = (
        t.join(sizes, "blk")
        .withColumn("sub", F.pmod("doc_id", F.col("n_sub")))
        .groupBy("blk", "sub")
        .count()
        .collect()
    )
    assert max(r["count"] for r in grouped) <= cap

    pairs = jaccard_blocked_pairs(docs, threshold=0.9, cap=cap).collect()
    # the duplicate pair (200,201) shares a 2-doc block -> n_sub=1 -> found
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} >= {(200, 201)}


def test_connected_components_and_clusters(spark):
    from robosystems_spark.operators.graph import (
        connected_components,
        duplicate_clusters,
    )

    # chain 1-2-3 (one component), pair 10-11, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (21, 20)], ["doc_a", "doc_b"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs, "doc_a", "doc_b").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    clusters = {r["doc_id"]: r for r in duplicate_clusters(pairs).collect()}
    assert clusters[3]["cluster_id"] == 1 and clusters[3]["cluster_size"] == 3
    assert clusters[1]["keep"] and not clusters[2]["keep"]
    assert clusters[20]["keep"] and clusters[20]["cluster_id"] == 20
    # drop-list: everything not kept
    drop = sorted(d for d, r in clusters.items() if not r["keep"])
    assert drop == [2, 3, 11, 21]


def test_connected_components_random_graphs_match_union_find(spark):
    """Property check: distributed min-label propagation agrees with a
    driver-side union-find on random graphs (including multi-hop
    chains that need several propagation rounds)."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(25 + 10 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        # reference: union-find with min-id representatives
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        touched = {x for e in edges for x in e}
        expected = {x: find(x) for x in touched}
        # min-id canonicalization: representative must be component min
        comp_min = {}
        for x in touched:
            comp_min.setdefault(find(x), []).append(x)
        canon = {r: min(members) for r, members in comp_min.items()}
        expected = {x: canon[find(x)] for x in touched}

        from robosystems_spark.operators.graph import connected_components

        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, "doc_a", "doc_b").collect()
        }
        assert got == expected, f"trial {trial}"


def test_weighted_shortest_paths_relaxes_through_cheaper_route(spark):
    from robosystems_spark.operators.graph import weighted_shortest_paths

    # direct a->c costs 10; a->b->c costs 1+2=3; relaxation must win
    edges = spark.createDataFrame(
        [("a", "c", 10.0), ("a", "b", 1.0), ("b", "c", 2.0)],
        "src string, dst string, weight double",
    )
    out = {(r["src"], r["dst"]): r["w"] for r in
           weighted_shortest_paths(edges, max_iter=3).collect()}
    assert out == {("a", "c"): 3.0, ("a", "b"): 1.0, ("b", "c"): 2.0}

    # max_iter=1 forbids the 2-hop route: direct edge stands
    direct = {(r["src"], r["dst"]): r["w"] for r in
              weighted_shortest_paths(edges, max_iter=1).collect()}
    assert direct[("a", "c")] == 10.0


def test_duplicated_span_profile_planted_boilerplate(spark):
    """Documents sharing a 16+-token boilerplate block must show
    dup spans; fully unique documents must show none."""
    boiler = " ".join(f"LICENSE{i}" for i in range(20))
    uniq = lambda tag: " ".join(f"{tag}tok{i}" for i in range(40))  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, boiler + " " + uniq("a")),
            (2, boiler + " " + uniq("b")),
            (3, uniq("c")),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in D.duplicated_span_profile(df, window=16, stride=8).collect()
    }
    assert out[1]["n_dup_spans"] > 0 and out[2]["n_dup_spans"] > 0
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_fraction"] == 0.0
    # the shared block is at the head: the first spans align and match
    assert out[1]["dup_fraction"] > 0 and out[1]["dup_fraction"] < 1


def test_duplicated_span_profile_short_docs_single_span(spark):
    """Docs shorter than the window produce exactly one span covering
    the whole text; identical short docs are mutual duplicates."""
    df = spark.createDataFrame(
        [(1, "tiny identical text"), (2, "tiny identical text"), (3, "different")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in D.duplicated_span_profile(df, window=16, stride=8).collect()
    }
    assert out[1]["n_spans"] == 1 and out[1]["dup_fraction"] == 1.0
    assert out[2]["dup_fraction"] == 1.0
    assert out[3]["n_spans"] == 1 and out[3]["dup_fraction"] == 0.0


def test_star_components_match_labelprop(spark):
    from robosystems_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    import random

    rnd = random.Random(11)
    # Random graph + a 64-node chain (worst case for label propagation).
    edges = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(60)]
    edges += [(100 + i, 101 + i) for i in range(63)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    ref = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iters=80).collect()
    }
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df, max_iters=12).collect()
    }
    assert got == ref
    # The whole chain collapses to one component rooted at 100.
    assert got[163] == 100


def test_star_converges_logarithmically_on_chain(spark):
    from robosystems_spark.operators.graph import connected_components_star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src LONG, dst LONG"
    )
    # 6 rounds suffice for a 64-node path (log2 64) + slack; plain
    # label propagation needs ~63.
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(chain, max_iters=8).collect()
    }
    assert set(got.values()) == {0} and len(got) == 64


def test_fuzzy_name_matches_semantics(spark):
    from robosystems_spark.operators.linkage import fuzzy_name_matches

    rows = [
        (1, "red widget"), (2, "red widget"), (3, "rad widget"),
        (4, "blue widget"), (5, "red gadget"), (6, "bolt"),
    ]
    df = spark.createDataFrame(rows, "id LONG, name STRING")
    out = {
        (r["name_a"], r["name_b"]): r
        for r in fuzzy_name_matches(df, "name", "id", max_dist=2).collect()
    }
    # 'rad widget' is 1 edit from 'red widget' (same block 'widget');
    # record counts carried through (red widget appears twice).
    r = out[("rad widget", "red widget")]
    assert r["distance"] == 1 and r["n_records_b"] == 2
    # 'blue widget' is 3 edits from 'red widget' -> excluded at 2.
    assert ("blue widget", "red widget") not in out
    # 'red gadget' blocks under 'gadget' -> never compared to widgets.
    assert not any("gadget" in k[0] or "gadget" in k[1] for k in out)


def test_incremental_dedup_against_index(spark, tmp_path):
    from robosystems_spark.operators.dedup import (
        dedup_against_index,
        write_minhash_index,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "completely unrelated text about financial statements and ledgers"),
        ],
        "doc_id LONG, text STRING",
    )
    path = str(tmp_path / "sigs")
    write_minhash_index(corpus, path)
    # New batch: doc 10 is a near-copy of doc 1; doc 11 is novel.
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again tonight"),
            (11, "novel content with no counterpart in the stored corpus at all"),
        ],
        "doc_id LONG, text STRING",
    )
    out = dedup_against_index(new, path, threshold=0.3).collect()
    pairs = {(r["new_doc_id"], r["corpus_doc_id"]): r["est_jaccard"] for r in out}
    assert (10, 1) in pairs and pairs[(10, 1)] > 0.3
    assert not any(n == 11 for n, _ in pairs)
    # Estimator is a multiple of 1/64.
    assert abs(pairs[(10, 1)] * 64 - round(pairs[(10, 1)] * 64)) < 1e-9


def test_remove_duplicated_spans_excises_boilerplate(spark):
    from robosystems_spark.operators.dedup import remove_duplicated_spans

    boiler = " ".join(f"lic{i}" for i in range(16))  # 16-token license block
    rows = [
        (1, boiler + " unique alpha beta gamma delta"),
        (2, boiler + " other content entirely different here"),
        (3, "no duplicated spans in this document at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(docs, window=16, stride=8).collect()
    }
    # The shared 16-token block is excised from both docs 1 and 2...
    assert out[1]["n_removed"] >= 16 and out[2]["n_removed"] >= 16
    assert "lic0" not in out[1]["cleaned_text"]
    # ...while their unique tails survive in order.
    assert "alpha" in out[1]["cleaned_text"]
    assert out[1]["cleaned_text"].index("alpha") < out[1]["cleaned_text"].index("gamma")
    # Doc 3 untouched.
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == rows[2][1]


def test_prefix_join_is_exact_vs_brute_force(spark):
    from robosystems_spark.operators.dedup import jaccard_prefix_join

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # 4/6 = 0.667 with doc 1
        (3, "alpha beta gamma delta epsilon"),   # 1.0 with doc 1
        (4, "totally different words here now"),
        (5, "alpha different words here now"),   # 4/6 with doc 4
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_prefix_join(docs, threshold=0.6).collect()
    }
    # brute force over token sets
    sets = {i: set(t.split()) for i, t in rows}
    want = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j:
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                if round(jac, 6) >= 0.6:
                    want[(i, j)] = round(jac, 6)
    assert got == want and (1, 3) in got and got[(1, 3)] == 1.0


def test_prefix_join_superset_of_minhash(spark, sf_dir):
    """Exactness vs banding: on the same 5-shingle space and threshold,
    the exact prefix join finds every pair the LSH path verified."""
    from robosystems_spark.io import read_table
    from robosystems_spark.operators.dedup import (
        jaccard_prefix_join,
        minhash_near_duplicates,
    )

    docs = read_table(spark, sf_dir, "documents")
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(docs, threshold=0.7).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_join(
            docs, threshold=0.7, shingle_k=5
        ).collect()
    }
    assert lsh <= exact


def test_hard_negative_band_is_band_restricted_brute_force(spark, sf_dir):
    """cosine_band_topk == brute-force cosine ranking restricted to the
    band: every returned pair sits in [lo, hi), excludes self, and the
    per-query ranking is the same (sim DESC, id ASC) order the exact
    top-k baseline uses."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators.similarity import (
        cosine_band_topk,
        cosine_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lo, hi = 0.20, 0.32
    band = cosine_band_topk(emb, queries, k=5, lo=lo, hi=hi).collect()
    assert band, "band should be non-empty on the synthetic embeddings"
    for r in band:
        assert lo <= r["cosine"] < hi
        assert r["nn_id"] != r["query_id"]
    # rank order agrees with the full brute-force ranking filtered to the band
    full = cosine_topk(emb, queries, k=emb.count()).collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(full, key=lambda r: (r["query_id"], r["rank"])):
        if lo <= r["cosine"] < hi and r["nn_id"] != r["query_id"]:
            by_q.setdefault(r["query_id"], []).append(r["nn_id"])
    got: dict[int, list[int]] = {}
    for r in sorted(band, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["nn_id"])
    for q, ids in got.items():
        assert ids == by_q[q][: len(ids)]


def test_entity_clusters_transitive_closure(spark):
    """A~B and B~C must merge into one entity even when dist(A, C)
    exceeds the edit threshold — the defining property the pairwise
    matcher alone lacks; canonical = lexicographic min; records sum."""
    from robosystems_spark.operators.linkage import entity_clusters

    rows = (
        [("alpha widget",)] * 3
        + [("alphb widget",)] * 2   # dist 1 from alpha
        + [("alphc widget",)] * 1   # dist 1 from alphb, dist 2 from alpha... use max_dist=1
        + [("omega gadget",)] * 4   # unmatched singleton: excluded
    )
    df = spark.createDataFrame(rows, ["name"])
    out = {
        r["canonical_name"]: (r["n_names"], r["total_records"])
        for r in entity_clusters(df, "name", max_dist=1).collect()
    }
    assert out == {"alpha widget": (3, 6)}


def test_weighted_jaccard_downweights_boilerplate(spark):
    """IDF weighting semantics: two docs overlapping ONLY in corpus-wide
    boilerplate stay below the weighted threshold even though their
    unweighted Jaccard clears it, while two docs sharing rare tokens
    pair; exact integer threshold arithmetic at the boundary."""
    from robosystems_spark.operators.dedup import weighted_jaccard_pairs

    boiler = "the common filler words here"  # appear in every doc
    rows = [
        (1, f"{boiler} alpha beta"),
        (2, f"{boiler} gamma delta"),           # shares ONLY boilerplate with 1
        (3, f"{boiler} rareword otherrare"),
        (4, f"{boiler} rareword otherrare"),    # shares rare pair with 3
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["doc_a"], r["doc_b"]): r["weighted_jaccard"]
        for r in weighted_jaccard_pairs(
            docs, threshold_num=2, threshold_den=5
        ).collect()
    }
    assert (3, 4) in out and out[(3, 4)] == 1.0  # identical non-boiler content
    assert (1, 2) not in out  # boilerplate-only overlap: weight ~0
    # unweighted Jaccard of (1, 2) is 5/9 > 0.4 — the weighting is what
    # rejects it, not the threshold
    assert 5 / 9 > 2 / 5


def test_containment_prefix_join_matches_bruteforce(spark, sf_dir):
    """The containment prefix filter must have ZERO recall loss: output
    equals the brute-force all-ordered-pairs containment join."""
    from pyspark.sql import functions as F

    from robosystems_spark.io import read_table
    from robosystems_spark.operators.dedup import containment_prefix_join

    docs = read_table(spark, sf_dir, "documents").limit(150)
    got = {
        (r["doc_a"], r["doc_b"], r["containment"])
        for r in containment_prefix_join(
            docs, threshold_num=3, threshold_den=5
        ).collect()
    }
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+")).alias("t")
    )
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    ov = F.size(F.array_intersect("ta", "tb"))
    brute = {
        (r["doc_a"], r["doc_b"], r["c"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(ov.cast("double") / F.size("ta"), 6).alias("c"),
            (ov * 5 >= F.size("ta") * 3).alias("hit"),
        )
        .filter("hit")
        .collect()
    }
    assert got == brute and len(got) > 0


def test_containment_catches_doc_inside_doc(spark):
    """A short doc fully quoted inside a long one: containment = 1.0
    in the contained->container direction while Jaccard is far below
    any dedup threshold (the case this operator exists for)."""
    from robosystems_spark.operators.dedup import containment_prefix_join

    short = "alpha bravo charlie delta"
    filler = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, short),
        (2, filler + " " + short + " " + filler),
        (3, "totally unrelated text here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_prefix_join(
            df, threshold_num=4, threshold_den=5
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert (2, 1) not in out  # asymmetric: the big doc is NOT contained
    assert all(3 not in pair for pair in out)


def test_winnowing_guarantee_and_density(spark):
    """The paper's detection guarantee: two documents sharing a run of
    >= w+k-1 tokens share at least one selected fingerprint; disjoint
    documents share none; selected density is far below 1 per
    position."""
    from robosystems_spark.operators.dedup import (
        winnowing_candidates,
        winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail one"),
            (2, "completely different start " + shared + " other end"),
            (3, "no overlap with anything else at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    # k=4, w=5 -> guarantee kicks in at 8 shared tokens
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in winnowing_candidates(
            docs, k=4, w=5, min_shared=1, max_fp_df=50
        ).collect()
    }
    assert (1, 2) in cands
    assert (1, 3) not in cands and (2, 3) not in cands

    fps = winnowing_fingerprints(docs, k=4, w=5)
    per_doc = {r["doc_id"]: r["n"] for r in
               fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # density bound: far fewer fingerprints than positions
    assert all(0 < n <= 12 for n in per_doc.values())


def test_winnowing_stop_fingerprint_cap(spark):
    """A fingerprint shared by more documents than the cap never
    produces pairs (the quadratic-key guard)."""
    from robosystems_spark.operators.dedup import winnowing_candidates

    same = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(i, same) for i in range(6)], "doc_id long, text string"
    )
    # df cap below the 6 identical docs: no candidates at all
    none = winnowing_candidates(docs, k=4, w=5, min_shared=1, max_fp_df=5)
    assert none.count() == 0
    # with a permissive cap every pair appears
    allp = winnowing_candidates(docs, k=4, w=5, min_shared=1, max_fp_df=10)
    assert allp.count() == 15
