#!/usr/bin/env python3
"""Full-registry timing sweep at the driver's bench SF (sf0.1):
luck-proofing for the BENCH set the way the in-tree oracle sweep
luck-proofs the CORRECTNESS sample.

The per-round driver bench runs only the ``bench=True`` entries; the
other ~170 registry entries have verified VALUES at sf0.01 but have
never been TIMED at sf0.1 — a future bench-set rotation could surprise
on performance where correctness can no longer surprise.  This sweep
runs EVERY registry entry once (single steady-state run after a warm
run, one wall-clock-budgeted pass — coarser than bench.py's 3-run
median, which is fine for spotting order-of-magnitude outliers) and
writes ``BENCH_SWEEP.json`` at the repo root.

Usage: python scripts/bench_sweep.py [--budget SECONDS]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robosystems_spark.inventory import REGISTRY, _ensure_loaded  # noqa: E402
from robosystems_spark.session import get_spark  # noqa: E402


def main() -> None:
    budget = 3000.0
    if "--budget" in sys.argv:
        budget = float(sys.argv[sys.argv.index("--budget") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark(app_name="robosystems-bench-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def _quiesce() -> None:
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd_id in list(jmap.keySet().toArray()):
                spark.sparkContext._jsc.sc().unpersistRDD(
                    int(str(rdd_id)), True
                )
        except Exception:  # noqa: BLE001
            pass
        spark.sparkContext._jvm.System.gc()

    t_start = time.time()
    timings: dict[str, float] = {}
    skipped: list[str] = []
    for name in sorted(REGISTRY):
        if time.time() - t_start > budget:
            skipped.append(name)
            continue
        spec = REGISTRY[name]
        try:
            _quiesce()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm: JIT, footers, python workers
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            print(
                f"# sweep error in {name}: {type(exc).__name__}: {exc}",
                file=sys.stderr,
            )
            timings[name] = -1.0
    out = {
        "sf_dir": sf_dir,
        "aggregation": "1 steady-state run after 1 warm run per entry",
        "n_entries": len(timings),
        "total_sec": round(sum(t for t in timings.values() if t > 0), 3),
        "wall_sec": round(time.time() - t_start, 1),
        "skipped_over_budget": skipped,
        "queries": timings,
    }
    Path(__file__).resolve().parent.parent.joinpath(
        "BENCH_SWEEP.json"
    ).write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(
        json.dumps(
            {k: out[k] for k in ("n_entries", "total_sec", "wall_sec")}
        )
    )


if __name__ == "__main__":
    main()
