"""Ad-hoc r12 check: graph resident tiers vs distributed vs DuckDB oracle.

For each affected entry at sf0.001 and sf0.01:
  1. oracle compare (the driver's check) with resident tiers ACTIVE;
  2. row-identical parity between the resident tier and the forced
     distributed path (resident_max=0).
"""
from __future__ import annotations

import functools
import sys

from robosystems_spark.inventory import REGISTRY, _ensure_loaded
from robosystems_spark.oracle import compare, duckdb_conn
from robosystems_spark.session import get_spark
import robosystems_spark.operators.graph as G

_ensure_loaded()

ENTRIES = [
    "graph_pagerank_supplier_part",
    "graph_kcore_parts",
    "graph_label_propagation",
    "graph_hits_supplier_part",
    "graph_modularity_lpa",
]

spark = get_spark(app_name="r12-graph-parity", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
fails = 0
for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    con = duckdb_conn(sf_dir)
    for name in ENTRIES:
        if name not in REGISTRY:
            print(f"SKIP {name} (not in registry)")
            continue
        spec = REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        res = compare(name, df, spec.oracle, con)
        ok1 = res.ok
        # forced-distributed twin
        orig = {}
        for fn_name in ("pagerank", "kcore", "label_propagation",
                        "label_propagation_assignments", "hits"):
            fn = getattr(G, fn_name)
            orig[fn_name] = fn
            setattr(G, fn_name, functools.partial(fn, resident_max=0))
        try:
            df2 = spec.fn(spark, sf_dir)
            rows_res = sorted(map(tuple, df.collect()))
            rows_dist = sorted(map(tuple, df2.collect()))
            ok2 = rows_res == rows_dist
        finally:
            for fn_name, fn in orig.items():
                setattr(G, fn_name, fn)
        status = "OK " if (ok1 and ok2) else "FAIL"
        if not (ok1 and ok2):
            fails += 1
        print(f"{status} {sf_dir.split('/')[-1]:8s} {name:35s} "
              f"oracle={ok1} resident==distributed={ok2} "
              f"({'' if ok1 else res.detail})")
    con.close()
sys.exit(1 if fails else 0)
