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
