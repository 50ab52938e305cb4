"""Materialization: staging tables → graph tables (and back out).

Re-expresses the reference's COPY-based materialization
(/root/reference/robosystems/graph_api/routers/databases/tables/
materialize.py:42-487 and robosystems/operations/lbug/ingest.py:588-683):

- bulk load = append, never row-wise MERGE (the reference measured
  MERGE 40x slower and removed it from the bulk path)
- ``ignore_errors=true`` duplicate-tolerant COPY ≈ left-anti join of
  incoming rows against existing primary keys before append
- nodes are loaded before relationships (FK-like integrity,
  materialize.py:334-343)
- ``file_id`` provenance is stripped at materialization
- fork: copy all/selected tables parent → subgraph (S8)
- export: per-table parquet/csv backup (S7)

The graph store is a directory of parquet table dirs per graph_id; on
a production deployment each table is a Delta/Iceberg table and the
anti-join append becomes ``MERGE ... WHEN NOT MATCHED THEN INSERT``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class GraphStore:
    """A graph database: one parquet table dir per node/rel table."""

    def __init__(self, spark: SparkSession, root: str, graph_id: str):
        self.spark = spark
        self.root = root
        self.graph_id = graph_id
        os.makedirs(self.graph_path, exist_ok=True)

    @property
    def graph_path(self) -> str:
        return os.path.join(self.root, self.graph_id)

    def table_path(self, table: str) -> str:
        return os.path.join(self.graph_path, table)

    def exists(self, table: str) -> bool:
        return os.path.exists(self.table_path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(table))

    def tables(self) -> list[str]:
        if not os.path.exists(self.graph_path):
            return []
        return sorted(
            d for d in os.listdir(self.graph_path)
            if os.path.isdir(os.path.join(self.graph_path, d)) and not d.startswith("_")
        )

    # -- load paths ---------------------------------------------------------

    def copy_into(
        self,
        table: str,
        df: DataFrame,
        primary_keys: list[str] | None = None,
        ignore_errors: bool = False,
    ) -> int:
        """Bulk COPY semantics: append all rows; with ``ignore_errors``
        drop incoming rows whose PK already exists (duplicate-tolerant
        load) via a left-anti join — the scalable MERGE-free path.

        Returns rows loaded.
        """
        if "file_id" in df.columns:
            df = df.drop("file_id")
        if ignore_errors and primary_keys and self.exists(table):
            existing = self.read(table).select(*primary_keys)
            df = df.join(existing, primary_keys, "left_anti")
        df = df.cache()
        n = df.count()
        df.write.mode("append").parquet(self.table_path(table))
        df.unpersist()
        return n

    def upsert(self, table: str, df: DataFrame, primary_keys: list[str]) -> None:
        """Point-upsert (Cypher MERGE analog, save_view.py writebacks).

        Full-table rewrite here; Delta MERGE INTO in production.  Kept
        off the bulk path per the reference's 40x measurement.
        """
        if not self.exists(table):
            df.write.mode("overwrite").parquet(self.table_path(table))
            return
        existing = self.read(table)
        merged = existing.join(df.select(*primary_keys), primary_keys, "left_anti").unionByName(
            df, allowMissingColumns=True
        )
        self._rewrite(table, merged)

    def update_where(self, table: str, condition, assignments: dict) -> int:
        """UPDATE ... SET ... WHERE (the Cypher SET analog,
        save_view.py:180-199 update_report_metadata).  ``assignments``
        maps column -> Column/literal.  Full rewrite here; Delta
        ``UPDATE`` in production.  Returns rows updated."""
        df = self.read(table).cache()
        n = df.filter(condition).count()
        updated = df
        for col_name, value in assignments.items():
            value_col = value if isinstance(value, Column) else F.lit(value)
            updated = updated.withColumn(
                col_name, F.when(condition, value_col).otherwise(F.col(col_name))
            )
        self._rewrite(table, updated)
        df.unpersist()
        return n

    def delete_where(self, table: str, condition) -> int:
        """DELETE ... WHERE (DETACH DELETE analog, save_view.py:121-143)."""
        df = self.read(table).cache()
        before = df.count()
        kept = df.filter(~condition)
        kept_count = kept.count()
        self._rewrite(table, kept)
        # unpersist AFTER the rewrite so the write is served from cache,
        # and so later reads of the path don't hit the stale cached plan
        df.unpersist()
        return before - kept_count

    def _rewrite(self, table: str, df: DataFrame) -> None:
        tmp = self.table_path(table) + "__rewrite"
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.table_path(table))
        os.rename(tmp, self.table_path(table))

    # -- orchestration ------------------------------------------------------

    def materialize(
        self,
        staged: dict[str, DataFrame],
        node_tables: list[str],
        rel_tables: list[str],
        pk_map: dict[str, list[str]] | None = None,
        ignore_errors: bool = True,
    ) -> dict[str, int]:
        """Load a batch of staged tables, nodes before relationships."""
        pk_map = pk_map or {}
        loaded: dict[str, int] = {}
        for t in list(node_tables) + list(rel_tables):
            if t not in staged:
                continue
            pks = pk_map.get(t) or (["identifier"] if t in node_tables else ["src", "dst"])
            loaded[t] = self.copy_into(t, staged[t], primary_keys=pks, ignore_errors=ignore_errors)
        return loaded

    def fork(self, target_graph_id: str, tables: list[str] | None = None) -> "GraphStore":
        """Cross-database fork: copy tables parent → subgraph
        (materialize.py:241-487), nodes-first ordering preserved by
        the caller's table list."""
        child = GraphStore(self.spark, self.root, target_graph_id)
        for t in tables or self.tables():
            self.read(t).write.mode("overwrite").parquet(child.table_path(t))
        return child

    def restore(self, backup_dir: str, tables: list[str] | None = None) -> list[str]:
        """Restore tables from a parquet export (backup.py:110-365
        restore path): each backed-up table dir replaces the live one."""
        import os as _os

        names = tables or sorted(
            d for d in _os.listdir(backup_dir)
            if _os.path.isdir(_os.path.join(backup_dir, d))
        )
        restored = []
        for t in names:
            src = _os.path.join(backup_dir, t)
            self.spark.read.parquet(src).write.mode("overwrite").parquet(
                self.table_path(t) + "__rewrite"
            )
            if self.exists(t):
                shutil.rmtree(self.table_path(t))
            _os.rename(self.table_path(t) + "__rewrite", self.table_path(t))
            restored.append(t)
        return restored

    def export(self, out_dir: str, fmt: str = "parquet") -> dict[str, str]:
        """Full-database export (backup_manager.py:577-760): every
        table to parquet or csv under ``out_dir``."""
        out: dict[str, str] = {}
        for t in self.tables():
            dest = os.path.join(out_dir, t)
            df = self.read(t)
            if fmt == "parquet":
                df.write.mode("overwrite").parquet(dest)
            elif fmt == "csv":
                df.write.mode("overwrite").option("header", "true").csv(dest)
            else:
                raise ValueError(f"Unsupported export format: {fmt!r}")
            out[t] = dest
        return out
