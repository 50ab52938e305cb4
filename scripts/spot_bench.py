#!/usr/bin/env python3
"""Spot-bench named registry entries with the bench.py methodology
(per-entry quiesce, 1 warm + median of N timed noop-sink runs) plus the
fixed-work canary, so numbers are comparable across the A/B worktrees
on a noisy box.

Usage: python scripts/spot_bench.py entry1 entry2 ...
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPOT_RUNS (default 3)
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robosystems_spark.inventory import REGISTRY, _ensure_loaded  # noqa: E402
from robosystems_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPOT_RUNS", "3"))
    spark = get_spark(app_name="spot-bench")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()
    queries = REGISTRY

    def canary() -> float:
        s = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(100_000_000).selectExpr("sum(id * 2 + 1) as s").collect()
            s.append(time.perf_counter() - t0)
        return round(statistics.median(s), 3)

    def quiesce() -> None:
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd_id in list(jmap.keySet().toArray()):
                spark.sparkContext._jsc.sc().unpersistRDD(int(str(rdd_id)), True)
        except Exception:  # noqa: BLE001
            pass
        spark.sparkContext._jvm.System.gc()

    print(f"canary_first {canary()}", flush=True)
    for name in names:
        fn = queries[name].fn
        quiesce()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(runs):
                quiesce()  # outside the timed region, like bench.py
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
            med = round(statistics.median(samples), 3)
            print(f"{name} {med} {samples}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name} ERROR {type(exc).__name__}: {exc}", flush=True)
    print(f"canary_last {canary()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
