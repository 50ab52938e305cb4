"""Query inventory: every implemented operator, as (Spark fn, oracle SQL).

This registry is the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``bench.py`` and the test
suite.  Each entry declares one operator/query from SURVEY.md §2 (or
an LLM-pipeline extension) as

- a Python callable ``(spark, sf_dir) -> DataFrame`` built with the
  DataFrame API (the engine under test), and
- an equivalent ANSI-SQL string DuckDB can run on the same parquet
  tables (the oracle) — ``None`` for genuinely non-SQL-expressible
  operators, which the driver checks rows-only.

Column names are aligned on both sides because the driver's compare
sorts columns by name and hashes values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # included in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator registering a query spec under ``name``.

    Duplicate names are a hard error: a silent dict overwrite DROPS an
    existing operator from the driver contract (this nearly shipped in
    round 7 — a second `events_retention_cohorts` replaced the
    day-level entry).
    """
    if name in REGISTRY:
        raise ValueError(f"duplicate registry entry {name!r}")

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The caller's session may not be ours (the driver builds a
            # vanilla SparkSession): ship the package zip to executors
            # idempotently so pandas-UDF / mapInPandas queries can
            # unpickle functions whose globals live in this package.
            from robosystems_spark.session import _ship_package

            _ship_package(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = getattr(fn, "__name__", name)
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, doc=doc, tags=tags, bench=bench
        )
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every inventory module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from robosystems_spark.inventory import (  # noqa: F401
        crawl,
        graph,
        llm,
        multimodal,
        relational,
        subqueries,
        tpch,
        windows,
        xbrl,
    )

    _LOADED = True
