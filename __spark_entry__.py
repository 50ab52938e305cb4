"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``robosystems_spark.inventory`` (one registry
entry per operator from SURVEY.md §2 plus the LLM-pipeline
extensions); this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from robosystems_spark.inventory import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Six-table join chain (region→nation→supplier⋈lineitem⋈orders⋈customer)
    with broadcast dims + grouped aggregation — the engine's core
    graph-pattern-as-join shape (SURVEY §2.3 J1).
    """
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded

    _ensure_loaded()
    return REGISTRY["q5_region_nation_volume"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted => rows-only check)."""
    return all_oracles()
