#!/usr/bin/env python3
"""Dump .explain("formatted") for named registry entries to files.

Usage:
    python scripts/explain_dump.py SUFFIX entry1 entry2 ...
    python scripts/explain_dump.py SUFFIX --bench        # every bench entry

Writes plans/r12/<entry>_<SUFFIX>.txt (SUFFIX is typically "before" or
"after").  Uses the same session factory and sf dir as bench.py so the
captured plan is the one the bench executes.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robosystems_spark.inventory import bench_queries, all_queries  # noqa: E402
from robosystems_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="robosystems-explain")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get("PLANS_ROUND", "r13")
    out_dir.mkdir(parents=True, exist_ok=True)
    if names == ["--bench"]:
        names = list(bench_queries().keys())
    queries = all_queries()
    for name in names:
        fn = queries[name]
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
