#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is executed once to warm the JVM/code-gen caches and then
timed SPARK_GRAFT_BENCH_RUNS times (default 3); the reported number is
the per-query MEDIAN — single-run timings on this box swing +/-15-45%
run-to-run (JIT, page cache, GC alignment), which made cross-round
regression adjudication guesswork.  The timed run materializes results
via a noop sink so the full plan executes without driver-side collect
overhead.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from robosystems_spark.inventory import bench_queries  # noqa: E402
from robosystems_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="robosystems-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = bench_queries()
    timings: dict[str, float] = {}
    # Warm-up: JVM JIT + parquet footer caches, one light action.
    next(iter(specs.values())).fn(spark, sf_dir).limit(1).collect()
    # Warm-up 2: executor Python-worker pool + Arrow path — pandas-UDF
    # queries otherwise absorb the one-time worker spin-up in their
    # timing (the reference's engine has no analogous cold start).
    from pyspark.sql import functions as F  # noqa: E402

    from robosystems_spark.functions import vector as V  # noqa: E402

    spark.range(64).select(
        V.cosine(
            F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(2.0), F.lit(1.0))
        ).alias("c")
    ).collect()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spread: dict[str, float] = {}

    def _canary() -> float:
        """Fixed-work calibration: a constant 1e8-row whole-stage-codegen
        aggregate, median of 3.  Pure CPU, no IO, no Python — its time
        depends ONLY on available cycles, so a contended box shows up as
        an inflated canary (r10's driver bench ran 1.55x slow purely
        from box load; cross-checking BENCH_SWEEP was the only tell).
        Timed FIRST and LAST: compare canary_first/canary_last between
        rounds (and to the ~0.1-0.2 s idle-box figure) before reading
        any query delta as a regression."""
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(100_000_000).selectExpr(
                "sum(id * 2 + 1) as s"
            ).collect()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 3)

    canary_first = _canary()

    def _quiesce() -> None:
        # De-noise between queries: drop cached blocks + localCheckpoint
        # RDDs left by earlier entries and force a JVM GC, so later
        # queries aren't inflated by session debris (r6 saw
        # dedup_minhash_lsh at 4.61 s in-run vs 2.97 s isolated).
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd_id in list(jmap.keySet().toArray()):
                spark.sparkContext._jsc.sc().unpersistRDD(int(str(rdd_id)), True)
        except Exception:  # noqa: BLE001 - best-effort cleanup
            pass
        spark.sparkContext._jvm.System.gc()

    # Iterate in registration order — stable across rounds so per-query
    # numbers are comparable round-over-round.
    for name, spec in specs.items():
        try:
            _quiesce()
            # per-query warm run (as documented above): JIT of this
            # plan's generated code, parquet footers, shuffle setup —
            # then the timed runs measure steady-state execution
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(runs):
                # r12 measurement fix: quiesce before EVERY timed
                # sample, not just once per entry.  localCheckpoint
                # blocks left by the warm run / previous samples are
                # only reclaimed by async GC, so checkpoint-heavy
                # entries otherwise time their own block accumulation,
                # not steady-state execution (graph_kcore_parts
                # measured 9.6 -> 35.4 s across 6 back-to-back
                # invocations, flat ~6 s with per-sample quiesce; the
                # r6 between-entry quiesce fixed the same bug one
                # level up).  Documented in OPTIMIZATION_r12.md with
                # before/after numbers.
                _quiesce()
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                # force full materialization of every row/column
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 3)
            spread[name] = round(max(samples) - min(samples), 3)
        except Exception as exc:  # noqa: BLE001 - one bad query must not kill the bench
            print(f"# bench error in {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            timings[name] = -1.0

    canary_last = _canary()
    total = round(sum(t for t in timings.values() if t > 0), 3)
    # Diagnostics go to STDERR: the driver keeps only a ~2000-char tail
    # of stdout, and the r5 artifact was unparseable because the spread
    # dict + variance note pushed the JSON line past that window.
    print(
        json.dumps(
            {
                "aggregation": f"median of {runs} steady-state runs after 1 warm run",
                "spread_max_minus_min": spread,
                "variance_note": (
                    "reported timings are median-of-3 steady-state runs with "
                    "per-query quiesce (clearCache + unpersist + JVM GC); "
                    "residual box variance ~+/-15%"
                ),
            }
        ),
        file=sys.stderr,
    )
    # The primary line MUST stay compact (<~1500 chars at 40+ queries):
    # no spaces, 3-decimal floats, nothing but the driver contract keys.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # fixed-work contamination canary (see _canary): if
                # these exceed ~2x the idle-box figure recorded in
                # README.md, the whole artifact ran contended
                "canary_first": canary_first,
                "canary_last": canary_last,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
