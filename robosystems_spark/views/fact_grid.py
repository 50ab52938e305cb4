"""Fact grid: pivoted element x period value matrix.

Semantics of /root/reference/robosystems/operations/views/
fact_grid_builder.py:174-295 — a pandas ``pivot_table(index=element,
columns=period, aggfunc='sum')`` with ordered axes — expressed as
``groupBy().pivot().sum()``.  Passing ``column_values`` explicitly
skips Spark's extra distinct scan over the pivot column (and bounds
the output width, which matters when periods are unbounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_fact_grid(
    facts: DataFrame,
    index_col: str = "element_name",
    column_col: str = "period_end",
    value_col: str = "numeric_value",
    agg: str = "sum",
    column_values: list[str] | None = None,
    fill_value: float | None = None,
) -> DataFrame:
    """Pivot facts into a grid: one row per ``index_col``, one column
    per ``column_col`` value, aggregated ``value_col`` cells."""
    grouped = facts.groupBy(index_col)
    pivoted = (
        grouped.pivot(column_col, column_values)
        if column_values
        else grouped.pivot(column_col)
    )
    if agg == "sum":
        grid = pivoted.sum(value_col)
    elif agg == "avg":
        grid = pivoted.avg(value_col)
    elif agg == "count":
        grid = pivoted.count()
    elif agg == "min":
        grid = pivoted.min(value_col)
    elif agg == "max":
        grid = pivoted.max(value_col)
    else:
        raise ValueError(f"Unsupported aggfunc: {agg!r}")
    if fill_value is not None:
        grid = grid.fillna(fill_value)
    return grid.orderBy(index_col)
