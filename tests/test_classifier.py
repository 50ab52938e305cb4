"""Linear quality classifier: the GD trainer actually learns."""

from __future__ import annotations

from robosystems_spark.io import read_table
from robosystems_spark.operators.classifier import (
    quality_lr_score,
    quality_lr_train,
)


def test_training_reduces_separation_error(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    rows = quality_lr_score(docs, iters=6, lr=20.0).collect()
    n = len(rows)
    agree = sum(1 for r in rows if r["pred_label"] == r["y"]) / n
    base = max(
        sum(1 for r in rows if r["y"] == 1), sum(1 for r in rows if r["y"] == 0)
    ) / n
    # Better than the majority-class baseline: the model learned the
    # teacher's decision surface, not just the prior.
    assert agree > base, (agree, base)


def test_weights_move_from_zero_and_are_rounded(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    w = quality_lr_train(docs, iters=3)
    assert any(abs(x) > 1e-6 for x in w)
    for x in w:
        assert x == round(x, 9)


def test_probability_monotone_in_features(spark):
    # Synthetic corpus: long diverse docs labeled 1, short repetitive
    # labeled 0 by the teacher -> trained p must rank them accordingly.
    long_doc = " ".join(f"tok{i}" for i in range(120))
    short_doc = "a a a a"
    docs = spark.createDataFrame(
        [(i, long_doc) for i in range(20)]
        + [(100 + i, short_doc) for i in range(20)],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r["p_quality"] for r in quality_lr_score(docs, iters=8).collect()}
    assert out[0] > out[100]


def test_naive_bayes_separates_disjoint_vocabularies(spark):
    """Two classes with disjoint vocabularies must classify perfectly —
    the smoothed likelihoods of unseen tokens can't outweigh seen ones."""
    from robosystems_spark.operators.classifier import naive_bayes_confusion

    a = "alpha beta gamma delta epsilon"
    b = "uno dos tres cuatro cinco"
    docs = spark.createDataFrame(
        [(i, a, "A") for i in range(15)] + [(50 + i, b, "B") for i in range(15)],
        "doc_id LONG, text STRING, lang STRING",
    )
    out = {
        (r["actual_lang"], r["predicted_lang"]): r["n_docs"]
        for r in naive_bayes_confusion(docs).collect()
    }
    assert out == {("A", "A"): 15, ("B", "B"): 15}


def test_naive_bayes_prior_decides_empty_overlap(spark):
    """A doc whose tokens are equally likely in both classes falls to
    the prior: the majority class must win; ties break on class name."""
    from robosystems_spark.operators.classifier import naive_bayes_confusion

    shared = "same same same"
    docs = spark.createDataFrame(
        [(i, shared, "major") for i in range(9)]
        + [(100, shared, "minor")],
        "doc_id LONG, text STRING, lang STRING",
    )
    out = {
        (r["actual_lang"], r["predicted_lang"]): r["n_docs"]
        for r in naive_bayes_confusion(docs).collect()
    }
    # every doc predicted 'major' (larger prior, identical likelihoods)
    assert out == {("major", "major"): 9, ("minor", "major"): 1}


def test_label_noise_flags_planted_contradictions(spark):
    """Docs whose teacher label contradicts a confident prediction are
    flagged with the opposite class; confidently-consistent docs are
    not flagged."""
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["quality_label_noise"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["suspected_label"] != r["y"]
        if r["suspected_label"] == 1:
            assert r["y"] == 0 and r["p_quality"] > 0.5 - 0.5  # >= t1 > 0
