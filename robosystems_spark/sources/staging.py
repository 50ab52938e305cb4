"""File staging: uploaded files → deduplicated staging tables.

Re-expresses the reference's DuckDB staging layer
(/root/reference/robosystems/graph_api/core/duckdb/manager.py:85-334)
in Spark:

- multi-file parquet/csv/json reads (S1, S3)
- schema probe: node table (has ``identifier``) vs relationship table
  (has ``from``+``to``) (S2, manager.py:279-285)
- relationship staging renames ``from``/``to`` → ``src``/``dst``
  (manager.py:124-135)
- per-file ``file_id`` provenance column (v2 path, manager.py:144-228)
- window dedup: ROW_NUMBER() PARTITION BY identifier / (src,dst),
  keep rn=1 (P9, manager.py:112-135)
- per-file incremental delete (S9, manager.py:626-730)

Scale notes: dedup is one shuffle on the PK hash; ``file_id`` is a
literal injected per input file (no shuffle).  Staging tables are
hive-partitioned by ``file_id``, so the per-file incremental delete
(S9) is a partition drop — O(one file's rows), never a 100 TB rewrite
— exactly the pruning a Delta ``DELETE WHERE file_id = ?`` would do.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class StagedTable:
    name: str
    path: str
    is_relationship: bool
    columns: list[str]


def probe_table_kind(df: DataFrame) -> str:
    """'node' if the file has an ``identifier`` column, 'relationship'
    if it has ``from``+``to`` (or ``src``+``dst``), else 'generic'."""
    cols = {c.lower() for c in df.columns}
    if {"from", "to"} <= cols or {"src", "dst"} <= cols:
        return "relationship"
    if "identifier" in cols:
        return "node"
    return "generic"


def read_file(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Read one staged file (parquet/csv/json by extension or explicit)."""
    fmt = fmt or os.path.splitext(path)[1].lstrip(".").lower()
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt in ("json", "ndjson", "jsonl"):
        return spark.read.json(path)
    raise ValueError(f"Unsupported staging format: {fmt!r} ({path})")


def _dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """ROW_NUMBER dedup keeping the first row per key, with a total
    order over all non-key columns so the survivor is deterministic
    (the reference orders only by the key, accepting arbitrary
    survivors; we keep determinism for distributed reproducibility)."""
    others = [c for c in df.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in keys + others])
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def stage_files(
    spark: SparkSession,
    files: list[str] | list[tuple[str, str]],
    table_name: str,
    staging_root: str,
    fmt: str | None = None,
    with_file_id: bool = True,
) -> StagedTable:
    """Create/replace a staging table from input files.

    ``files`` is a list of paths or (path, file_id) pairs.  Per-file
    SELECTs are unioned with an injected ``file_id`` literal, the
    node/rel kind is probed from the first file, relationship columns
    are renamed, and rows are deduplicated on the PK — the v2 staging
    pipeline of the reference (manager.py:144-228).
    """
    pairs = [(f, f"file_{i:04d}") if isinstance(f, str) else f for i, f in enumerate(files)]
    parts = []
    kind = None
    for path, file_id in pairs:
        df = read_file(spark, path, fmt)
        if kind is None:
            kind = probe_table_kind(df)
        if kind == "relationship":
            renames = {"from": "src", "to": "dst"}
            for old, new in renames.items():
                if old in df.columns:
                    df = df.withColumnRenamed(old, new)
        if with_file_id:
            df = df.withColumn("file_id", F.lit(file_id))
        parts.append(df)
    if not parts:
        raise ValueError("stage_files requires at least one input file")
    staged = parts[0]
    for p in parts[1:]:
        staged = staged.unionByName(p, allowMissingColumns=True)

    keys = ["src", "dst"] if kind == "relationship" else (
        ["identifier"] if kind == "node" else staged.columns[:1]
    )
    staged = _dedup(staged, [k for k in keys if k in staged.columns])

    path = os.path.join(staging_root, table_name)
    if with_file_id:
        # Partition by provenance so delete_file_rows is a partition
        # drop instead of a table rewrite (manager.py:626-730 semantics).
        staged.write.mode("overwrite").partitionBy("file_id").parquet(path)
    else:
        staged.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    return StagedTable(
        name=table_name,
        path=path,
        is_relationship=kind == "relationship",
        columns=out.columns,
    )


def read_staged(spark: SparkSession, staging_root: str, table_name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(staging_root, table_name))


def delete_file_rows(
    spark: SparkSession, staging_root: str, table_name: str, file_id: str
) -> int:
    """Per-file incremental delete: remove only that file's rows
    (DELETE FROM t WHERE file_id = ?, manager.py:626-730).

    On the partitioned layout this drops exactly the ``file_id=X``
    partition dir — a metadata-scale operation, like Delta's pruned
    DELETE — and rows whose ``file_id`` is NULL (or any other value)
    are untouched by construction.  Unpartitioned tables fall back to
    a null-safe filtered rewrite with an atomic rename-aside swap.
    Returns the number of rows removed.
    """
    import shutil
    from urllib.parse import unquote

    path = os.path.join(staging_root, table_name)
    part_dirs = [
        d for d in os.listdir(path)
        if d.startswith("file_id=") and unquote(d[len("file_id="):]) == file_id
    ]
    if part_dirs:
        schema = spark.read.parquet(path).schema
        part = os.path.join(path, part_dirs[0])
        removed = spark.read.parquet(part).count()
        trash = os.path.join(staging_root, ".trash_" + table_name)
        if os.path.exists(trash):
            shutil.rmtree(trash)
        os.rename(part, trash)
        shutil.rmtree(trash)
        if not any(d.startswith("file_id=") for d in os.listdir(path)):
            # Last partition dropped: leave a readable schema-only table.
            tmp = path + "__rewrite"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            spark.createDataFrame([], schema).write.mode("overwrite").parquet(tmp)
            shutil.rmtree(path)
            os.rename(tmp, path)
        return removed
    if any(d.startswith("file_id=") for d in os.listdir(path)):
        return 0  # partitioned table, no partition for this file_id

    # Unpartitioned fallback: null-safe keep-filter (NULL file_id rows
    # must survive a targeted delete), atomic swap.
    df = spark.read.parquet(path).cache()
    before = df.count()
    kept = df.filter(~F.col("file_id").eqNullSafe(F.lit(file_id)))
    tmp = path + "__rewrite"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    kept.write.mode("overwrite").parquet(tmp)
    after = spark.read.parquet(tmp).count()
    df.unpersist()
    old = path + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return before - after
