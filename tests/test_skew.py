"""Salted aggregation / join equivalence tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' holds 90% of rows
    hot = spark.range(0, 900).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(0, 100).select(
        F.concat(F.lit("k"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"], r["a"])
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"), F.avg("v").alias("a"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"], r["a"])
        for r in salted_aggregate(
            skewed,
            ["k"],
            {"s": ("sum", "v"), "c": ("count", "v"), "mn": ("min", "v"),
             "mx": ("max", "v"), "a": ("avg", "v")},
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert salted[k] == pytest.approx(plain[k])


def test_salted_aggregate_rejects_nonalgebraic(spark, skewed):
    with pytest.raises(ValueError, match="not algebraic"):
        salted_aggregate(skewed, ["k"], {"m": ("median", "v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], ["k", "label"]
    )
    plain = sorted(tuple(r) for r in skewed.join(dim, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(skewed, dim, "k").collect())
    assert plain == salted
    # left join keeps unmatched big-side rows
    plain_l = skewed.join(dim, "k", "left").count()
    salted_l = salted_join(skewed, dim, "k", how="left").count()
    assert plain_l == salted_l
