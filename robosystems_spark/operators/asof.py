"""As-of (temporal) join.

Not in the reference's query corpus (SURVEY §2.3 notes theta/as-of
joins are absent) but a core training-data-pipeline operator: align
events with the most recent prior state (price, config, label).

Implementation: the union trick — tag both sides, sort by (key, ts)
within a window, carry the right side's last non-null payload forward,
keep left rows.  ONE shuffle on (key), no range-explosion, no
per-row Python.  Equivalent to DuckDB's ``ASOF JOIN`` (backward
direction), which serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same ``on`` key (backward as-of).

    Left rows with no prior right row keep NULL payload columns.
    Ties on timestamp: the right row sorts before the left row at the
    same instant (inclusive match, DuckDB ASOF semantics).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    ).withColumn("_side", F.lit(0))

    merged = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows (_side=0) order before left rows at equal timestamps →
    # an exact-timestamp right row is visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]
    for c in carried:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.filter(F.col("_side") == 1).drop("_side", "_ats")
