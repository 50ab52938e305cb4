#!/usr/bin/env python3
"""Decade scale spot-run: time a focused entry list at two SF dirs and
print per-entry ratio + exponent (SCALE.md protocol: exponent =
log10(t_hi / t_lo) for a 10x data jump; 1.0 = data-linear, 0 = flat).

Usage:
  python scripts/scale_spot.py LO_DIR HI_DIR [--runs N] [--long-cutoff S] \
      entry1 entry2 ...

Entries taking longer than ``--long-cutoff`` seconds on their first
timed run at the HI dir are reported from that single run (at 100s+
the JIT/GC noise bench.py's 3-run median guards against is a small
fraction of the signal).
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robosystems_spark.inventory import REGISTRY, _ensure_loaded  # noqa: E402
from robosystems_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = 2
    long_cutoff = 120.0
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            runs = int(argv[i + 1])
            i += 2
        elif argv[i] == "--long-cutoff":
            long_cutoff = float(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    lo_dir, hi_dir, entries = args[0], args[1], args[2:]

    _ensure_loaded()
    spark = get_spark(app_name="scale-spot")
    spark.sparkContext.setLogLevel("ERROR")

    def _quiesce() -> None:
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                spark.sparkContext._jsc.sc().unpersistRDD(int(str(rid)), True)
        except Exception:  # noqa: BLE001
            pass
        spark.sparkContext._jvm.System.gc()

    def timed(name: str, sf_dir: str, warm: bool) -> float:
        fn = REGISTRY[name].fn
        _quiesce()
        if warm:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples.append(dt)
            if dt > long_cutoff:
                break  # one run is the number for long entries
        return statistics.median(samples)

    out = {}
    for name in entries:
        try:
            lo = timed(name, lo_dir, warm=True)
            hi = timed(name, hi_dir, warm=False)
            out[name] = {
                "lo_sec": round(lo, 2),
                "hi_sec": round(hi, 2),
                "ratio": round(hi / lo, 2),
                "exponent": round(math.log10(hi / lo), 2),
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
