"""Deterministic sampling & dataset splitting for training pipelines.

Random sampling (``df.sample``) is seed-dependent per partition and
not reproducible across engines or re-partitioning; these operators
derive membership from row KEYS so any engine, any partitioning, any
re-run produces the same split — the property that matters for
train/val/test hygiene at 100 TB.

- ``systematic_sample``: key modulo — portable even to SQL oracles.
- ``hash_split``: xxhash64-bucketed fractions — uniform regardless of
  key distribution (keys may be sequential); engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def systematic_sample(df: DataFrame, key_col: str, every_n: int, offset: int = 0) -> DataFrame:
    """Every n-th row by key (deterministic systematic sampling)."""
    return df.filter((F.col(key_col) % every_n) == offset)


def split_column(key_col: str | Column, fractions: dict[str, float], salt: int = 42) -> Column:
    """A ``split`` label column ('train'/'val'/...) from a hashed key.

    Buckets the key uniformly via xxhash64 and assigns labels by
    cumulative fraction.  Same key → same split, forever.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"Fractions must sum to 1.0, got {total}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    bucket = F.abs(F.xxhash64(F.lit(salt), key)) % 1_000_000 / 1_000_000.0
    expr = None
    cumulative = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cumulative += frac
        cond = bucket < cumulative
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return expr.otherwise(last) if expr is not None else F.lit(last)


def _hex_threshold(cum_fraction: float, digits: int = 8) -> str:
    """The ``digits``-char lowercase-hex string T such that a uniform
    hex string h satisfies h < T with probability ``cum_fraction``."""
    v = min(int(cum_fraction * (16**digits)), 16**digits - 1)
    return format(v, f"0{digits}x")


def split_column_md5(key_col: str | Column, fractions: dict[str, float]) -> Column:
    """Engine-portable split label: the first 8 hex chars of
    md5(key-as-string) are uniform in [0, 1) read as a hex fraction,
    so labels are assigned by comparing against cumulative-fraction
    hex thresholds (0.8 -> 'cccccccc', 0.9 -> 'e6666666').  Any engine
    with md5 replays the identical assignment — this is the
    oracle-checkable variant of ``split_column`` (xxhash64 is
    Spark-specific; md5 is universal).  Same key → same split, forever.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"Fractions must sum to 1.0, got {total}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.substring(F.md5(key.cast("string").cast("binary")), 1, 8)
    expr = None
    cumulative = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cumulative += frac
        cond = h < _hex_threshold(cumulative)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return expr.otherwise(last) if expr is not None else F.lit(last)


def hash_split(
    df: DataFrame, key_col: str, fractions: dict[str, float], salt: int = 42
) -> dict[str, DataFrame]:
    """Split into named DataFrames by hashed-key fractions."""
    labeled = df.withColumn("_split", split_column(key_col, fractions, salt))
    return {
        name: labeled.filter(F.col("_split") == name).drop("_split")
        for name in fractions
    }


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: the first ``n_per_group`` rows
    per group in md5(key) order — a reproducible pseudo-random draw
    that any engine replays identically (md5 is engine-portable where
    xxhash64 is not, so this variant is oracle-checkable).

    One shuffle keyed by the group column; the per-group window is the
    standard top-k-per-key pattern, which Spark executes with a
    partial sort per partition — no global sort.
    """
    from pyspark.sql import Window

    key_hash = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(group_col).orderBy(key_hash, key_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def weighted_sample_ares(
    df: DataFrame,
    weight_col: str | Column,
    id_col: str,
    k: int,
    decimals: int = 6,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via A-Res priorities
    (Efraimidis-Spirakis): each row gets priority ln(u)/w for an
    md5-derived uniform u, and the global top-k by priority is the
    sample — inclusion probability proportional to weight, one
    TakeOrdered pass, no driver-side randomness.

    Deterministic and engine-portable (same md5 uniform idiom as
    ``split_column_md5``): any engine replays the identical sample —
    the property that matters when a 100 TB mixture draw must be
    reproducible across reruns and engines.

    Returns (id, weight, priority) for the k selected rows.
    """
    w = (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    ).cast("double")
    # u in (0, 1]: 15 md5 hex chars -> [0, 2^60), +1 to avoid ln(0).
    v = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("double")
    u = (v + F.lit(1.0)) / F.lit(float(16**15))
    pr = F.ln(u) / w
    return (
        # w <= 0 has no A-Res priority (ln(u)/w flips sign / divides by
        # zero); such rows are excluded, mirrored by the oracle's WHERE.
        df.filter(w > 0).select(
            F.col(id_col),
            w.cast("bigint").alias("weight"),
            pr.alias("_pr"),
        )
        .orderBy(F.desc("_pr"), F.asc(id_col))
        .limit(k)
        .select(
            id_col, "weight", F.round("_pr", decimals).alias("priority")
        )
    )


def weighted_sample_ares_oracle_sql(
    table: str,
    weight_sql: str,
    id_col: str,
    k: int,
    decimals: int = 6,
) -> str:
    """DuckDB SQL for the identical A-Res top-k sample.
    ``weight_sql`` is the weight expression over ``table``."""
    return f"""
    WITH w AS (
      SELECT {id_col}, CAST({weight_sql} AS DOUBLE) AS wt FROM {table}
    ),
    p AS (
      SELECT {id_col}, wt,
             LN((('0x' || SUBSTR(MD5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT
                 + 1.0) / {float(16**15)!r}) / wt AS pr
      FROM w WHERE wt > 0
    )
    SELECT {id_col}, CAST(wt AS BIGINT) AS weight,
           ROUND(pr, {decimals}) AS priority
    FROM p ORDER BY pr DESC, {id_col} LIMIT {k}
    """
