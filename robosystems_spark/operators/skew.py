"""Skew mitigation: salted aggregation and salted broadcast-side joins.

At 100 TB a handful of hot keys (one entity with millions of facts,
one user with millions of events) make a single reducer the critical
path.  Two standard remedies, both pure DataFrame transforms:

- ``salted_aggregate``: two-phase aggregation — partial aggregate on
  (key, salt), final aggregate on key.  The hot key's work spreads
  over ``num_salts`` reducers; only algebraic aggregates (sum/count/
  min/max and avg via sum+count) compose this way.
- ``salted_join``: explode the SMALL side ``num_salts`` ways and salt
  the big side's key randomly — every big-side row still meets its
  match, but a hot key's rows land in ``num_salts`` partitions.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew automatically at runtime; these helpers cover aggregations and
forced-shuffle joins where AQE doesn't reach.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALGEBRAIC = {"sum", "count", "min", "max"}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (function, input column), function
    in {sum, count, min, max, avg}.  Salt is derived from a hash of
    the full row (deterministic), not rand(), so retries reproduce.
    """
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % num_salts).alias("_salt")
    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partial_exprs += [
                F.sum(col).alias(f"_{out}_sum"),
                F.count(col).alias(f"_{out}_cnt"),
            ]
            final_exprs.append(
                (F.sum(f"_{out}_sum") / F.sum(f"_{out}_cnt")).alias(out)
            )
        elif fn in ALGEBRAIC:
            partial = getattr(F, fn)(col).alias(f"_{out}_p")
            partial_exprs.append(partial)
            # counts re-aggregate with SUM; min/max/sum with themselves
            refn = F.sum if fn == "count" else getattr(F, fn)
            final_exprs.append(refn(f"_{out}_p").alias(out))
        else:
            raise ValueError(
                f"{fn!r} is not algebraic; salted two-phase aggregation "
                "supports sum/count/min/max/avg"
            )
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the small side across salts,
    scatter the big side's hot keys.

    The join key column must exist on both sides; output columns match
    a plain ``big.join(small, on, how)``.
    """
    salted_big = big.withColumn(
        "_salt", (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % num_salts)
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")
