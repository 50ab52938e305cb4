"""Deterministic sampling / splitting tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.operators.sampling import hash_split, systematic_sample


def test_systematic_sample(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = systematic_sample(docs, "doc_id", 5)
    assert out.count() == docs.filter(F.col("doc_id") % 5 == 0).count()


def test_hash_split_disjoint_exhaustive_deterministic(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    splits = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    counts = {k: v.count() for k, v in splits.items()}
    assert sum(counts.values()) == n  # exhaustive
    ids = [set(r["doc_id"] for r in v.select("doc_id").collect()) for v in splits.values()]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])
    # roughly proportional (hash-uniform over 500 docs)
    assert counts["train"] > 0.7 * n
    # deterministic: rerun gives identical membership
    again = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert set(r["doc_id"] for r in again["val"].collect()) == ids[1]


def test_hash_split_rejects_bad_fractions(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="sum to 1.0"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.1})


def test_stratified_sample_deterministic_and_bounded(spark, sf_dir):
    from robosystems_spark.io import read_table
    from robosystems_spark.operators.sampling import stratified_sample

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = stratified_sample(docs, "source", 5)
    b = stratified_sample(docs.repartition(13), "source", 5)
    # per-group cap holds and the draw ignores physical partitioning
    counts = {r["source"]: r["n"] for r in a.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert all(n <= 5 for n in counts.values())
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_weighted_mixture_upsampling_and_determinism(spark, sf_dir):
    """Mixture weights: floor(w) full copies per doc + an
    md5-deterministic fractional extra; absent sources use the
    default; weight 0 drops the source entirely."""
    from robosystems_spark.operators.corpus import weighted_mixture

    docs = read_table(spark, sf_dir, "documents")
    out = weighted_mixture(
        docs,
        weights={"src1": 2.0, "src2": 0.0, "src3": 0.5},
        default_weight=1.0,
    ).cache()
    per_doc = {
        (r["source"], r["doc_id"]): r["n"]
        for r in out.groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_src1_docs = docs.filter("source = 'src1'").count()
    # integer weight 2.0: EVERY src1 doc appears exactly twice
    assert all(n == 2 for (s, _), n in per_doc.items() if s == "src1")
    assert sum(1 for (s, _) in per_doc if s == "src1") == n_src1_docs
    # weight 0: src2 fully dropped
    assert not any(s == "src2" for (s, _) in per_doc)
    # fractional 0.5: src3 keeps a strict nonempty subset, one copy each
    n_src3 = sum(1 for (s, _) in per_doc if s == "src3")
    assert 0 < n_src3 < docs.filter("source = 'src3'").count()
    assert all(n == 1 for (s, _), n in per_doc.items() if s == "src3")
    # default 1.0: every other source keeps every doc once
    others = docs.filter("source NOT IN ('src1','src2','src3')").count()
    assert sum(1 for (s, _) in per_doc if s not in ("src1", "src2", "src3")) == others
    # copy indices are 1..n per doc
    bad = out.groupBy("source", "doc_id").agg(
        F.min("copy").alias("lo"), F.max("copy").alias("hi"), F.count(F.lit(1)).alias("n")
    ).filter("lo <> 1 OR hi <> n").count()
    assert bad == 0
    # deterministic: identical on rerun
    again = weighted_mixture(
        docs, weights={"src1": 2.0, "src2": 0.0, "src3": 0.5}, default_weight=1.0
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))
    out.unpersist()


def test_weighted_sample_favors_heavy_rows(spark):
    from pyspark.sql import functions as F

    from robosystems_spark.operators.sampling import weighted_sample_ares

    # 500 light rows (w=1) + 100 heavy rows (w=50): a top-100 draw
    # should be mostly heavy rows (heavy mass 5000 vs light 500).
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 50) for i in range(100)]
    df = spark.createDataFrame(rows, "id LONG, w INT")
    out = weighted_sample_ares(df, "w", "id", k=100).collect()
    heavy = sum(1 for r in out if r["id"] >= 1000)
    assert heavy > 70, heavy
    assert len(out) == 100
    # Deterministic: same call, same sample.
    again = weighted_sample_ares(df, "w", "id", k=100).collect()
    assert [r["id"] for r in out] == [r["id"] for r in again]


def test_item_cooccurrence_cf_semantics(spark):
    from robosystems_spark.operators.corpus import item_cooccurrence_topk

    # Baskets: A+B together 3x, A+C once, D alone.
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "B"), (3, "C"),
        (4, "D"),
    ]
    b = spark.createDataFrame(rows, "basket LONG, item STRING")
    out = {
        (r["item"], r["neighbor"]): r
        for r in item_cooccurrence_topk(b, "basket", "item", k=3, min_cooc=1).collect()
    }
    # cosine(A,B) = 3/sqrt(3*3) = 1.0; cosine(A,C) = 1/sqrt(3*1)
    assert out[("A", "B")]["score"] == 1.0
    assert abs(out[("A", "C")]["score"] - 1 / 3**0.5) < 1e-6
    assert out[("A", "B")]["rank"] == 1 and out[("A", "C")]["rank"] == 2
    # D never co-occurs -> absent
    assert not any(i == "D" for i, _ in out)
