#!/usr/bin/env python3
"""Storage-layer walkthrough: the lakehouse features of GraphStore.

Demonstrates, in order, on one table:
  1. bucketed create + blind appends (data job outside the writer lock)
  2. snapshot-isolated reads + time travel over the commit log
  3. merge-on-read deletes (deletion vectors) and the change feed
  4. small-file compaction with Z-order clustering
  5. per-file stats data skipping (read_where)
  6. an incremental materialized view maintained from the change feed
  7. vacuum retention

Run: python examples/storage_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from robosystems_spark import GraphStore, get_spark
from robosystems_spark.sources.matview import (
    create_materialized_view,
    refresh_materialized_view,
)


def main() -> None:
    spark = get_spark(app_name="storage-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="storage-demo-")
    store = GraphStore(spark, root, "kgstoragedemo000", n_buckets=8)

    # 1. create + appends (each append is its own committed version)
    for k in range(4):
        store.copy_into(
            "trades",
            spark.createDataFrame(
                [(k * 100 + i, f"desk{i % 3}", float(i), k) for i in range(100)],
                "trade_id long, desk string, notional double, batch long",
            ),
            primary_keys=["trade_id"],
        )
    print(f"loaded 4 batches -> version {store.version('trades')}, "
          f"{store.read('trades').count()} rows")

    # 2. snapshot isolation + time travel
    pinned = store.read("trades")  # plans against the current manifest
    v_before = store.version("trades")

    # 3. merge-on-read delete: no data file rewritten
    files_before = len(store._current_manifest("trades"))
    n = store.delete_where(
        "trades", F.col("trade_id") % 97 == 0, merge_on_read=True
    )
    print(f"MOR-deleted {n} rows; data files unchanged: "
          f"{len(store._current_manifest('trades')) == files_before}")
    print(f"pinned reader still sees {pinned.count()} rows; "
          f"fresh read sees {store.read('trades').count()}; "
          f"time travel v{v_before} sees "
          f"{store.read('trades', version=v_before).count()}")
    feed = store.changes("trades", v_before)
    print(f"change feed v{v_before}->now: "
          f"{feed.groupBy('_change_type').count().collect()}")

    # 4. compaction with Z-order clustering on (notional, batch)
    replaced = store.compact(
        "trades", min_files=2, zorder_by=["notional", "batch"]
    )
    print(f"compacted {replaced} small files; DV entries materialized: "
          f"{store._dv_at('trades') == []}")

    # 5. stats-pruned read: only files whose footer range can match
    full = len(store.read("trades").inputFiles())
    pruned = store.read_where("trades", {"notional": (0.0, 5.0)})
    print(f"read_where scans {len(pruned.inputFiles())}/{full} files "
          f"for a tight notional range ({pruned.count()} rows)")

    # 6. incremental materialized view over the change feed
    create_materialized_view(
        store, "desk_totals", "trades", ["desk"],
        {"total_notional": ("sum", "notional"), "n_trades": ("count", "*")},
    )
    store.copy_into(
        "trades",
        spark.createDataFrame(
            [(9000, "desk0", 500.0, 9)],
            "trade_id long, desk string, notional double, batch long",
        ),
        primary_keys=["trade_id"],
    )
    r = refresh_materialized_view(store, "desk_totals")
    print(f"matview refresh: mode={r['mode']}, "
          f"groups touched={r['groups_touched']}")
    store.read("desk_totals").orderBy("desk").show()

    # 7. vacuum: retire superseded files outside the retention window
    removed = store.vacuum("trades", keep_last=2)
    print(f"vacuum removed {removed} unreferenced files; table intact: "
          f"{store.read('trades').count()} rows")


if __name__ == "__main__":
    main()
