"""Bucketed-join tests: the co-location must actually elide the shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.sources.bucketing import (
    bucketed_join,
    is_exchange_free,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse.dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8,
                   sort_keys=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", ["o_orderkey"], num_buckets=8, sort_keys=["o_orderkey"],
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_elides_shuffle(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast: at test scale the planner would broadcast the
    # small side; the bucketed path is for the both-sides-huge case
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, on=["o_orderkey"])
        assert is_exchange_free(joined), (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        # and the result is correct vs the plain join
        plain = read_table(spark, sf_dir, "orders").join(
            read_table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    # control: the same join without bucketing needs an Exchange
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(li, "o_orderkey")
        assert not is_exchange_free(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_aggregation_elides_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    assert is_exchange_free(agg)
