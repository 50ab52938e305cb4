"""Table loading / catalog registration for the synthetic test tables.

The driver provides TPC-H-ish parquet tables plus ``events``,
``documents`` and ``embeddings`` (see TESTDATA.md).  This module is
the single place that maps a scale-factor directory onto Spark
DataFrames and temp views, mirroring the reference's staging-table
registration (/root/reference/robosystems/graph_api/core/duckdb/
manager.py:505-598 rebuilds views over registered files the same way).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table, normalizing physical-type quirks.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    reader surfaces only as a raw long (``spark.sql.legacy.parquet.
    nanosAsLong``); convert it to a microsecond TimestampType to match
    what every other engine (and DuckDB) sees.
    """
    if name == "events":
        # the caller's session (e.g. the driver's) may not carry this
        # conf; it is runtime-settable and required to scan NANOS parquet
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: ns magnitudes (~1.7e18) exceed double's 53-bit
        # mantissa, so a float divide would corrupt microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table under ``sf_dir`` and register temp views.

    Column pruning + predicate pushdown happen at the parquet scan, so
    registering all tables is free until a query actually touches one.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
