"""Bucketed tables: shuffle-free co-located joins.

At 100 TB, the lineitem⋈orders-class joins (both sides too big to
broadcast) dominate shuffle volume.  Pre-bucketing both tables on the
join key makes every subsequent join between them exchange-free: each
bucket pairs with its counterpart locally.  The reference has no
analog (single-node embedded engines don't shuffle); this is the
Spark-native answer to its co-located storage.

Bucket counts should be a multiple of cluster parallelism and chosen
once per subject area; both sides MUST use the same count for the
exchange to be elided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int = 16,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) table.

    Sorting within buckets additionally enables shuffle-free AND
    sort-free sort-merge joins.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables; with matching bucket specs the plan
    contains no Exchange on either side (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def is_exchange_free(df: DataFrame) -> bool:
    """True when the physical plan has no shuffle Exchange."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
