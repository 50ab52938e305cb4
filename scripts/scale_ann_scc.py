#!/usr/bin/env python3
"""Two-SF scale rows for the graph-ANN family and SCC (SCALE.md
protocol: exponent = log10(t_hi / t_lo) across a 10x data jump).

Unlike scale_spot.py (which times REGISTRY entries verbatim), this
harness times the OPERATORS under their production scale policy:

- NSW/HNSW build: the blocked-kNN contract says the centroid count
  grows ~sqrt(n) so bucket sizes stay bounded (candidates ~ n^1.5 /
  nc).  The registry entries pin nc=8 for oracle-ability, which is
  the right CORRECTNESS config and the wrong SCALE config — at sf1
  (20k vectors) nc=8 means ~225M candidate pairs.  Here nc =
  round(sqrt(n)), matching the operator docstring.
- NSW search: timed separately over a prebuilt materialized graph —
  per-hop work is (beam x M) per query, corpus-independent.
- SCC: a customer-derived digraph (functional graph j = i*31+7 mod n:
  large cycles + trees, grows with SF).  Timed BOTH ways: the
  MultiStep endgame path (default; remainder under the broadcast
  budget collects into serial Tarjan) and the forced-distributed
  path (MAX_BROADCAST_NODES=0: trim + fused FW-BW fixpoints only).

Usage: python scripts/scale_ann_scc.py [LO_DIR] [HI_DIR]
Defaults: /root/testdata/sf0.1  /tmp/scale_sf1
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from robosystems_spark.checkpointing import materialize  # noqa: E402
from robosystems_spark.io import read_table  # noqa: E402
from robosystems_spark.operators import clustering as CL  # noqa: E402
from robosystems_spark.session import get_spark  # noqa: E402


def main() -> None:
    lo_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hi_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    spark = get_spark(app_name="scale-ann-scc")
    spark.sparkContext.setLogLevel("ERROR")

    import robosystems_spark.operators.graph as G
    from robosystems_spark.operators.ann_graph import (
        build_nsw_graph,
        nsw_topk,
    )

    def ann_times(sf_dir: str) -> dict[str, float]:
        emb = read_table(spark, sf_dir, "embeddings")
        n = emb.count()
        nc = max(8, int(round(math.sqrt(n))))
        cents = CL.kmeans_fit(emb, k=nc, iters=2, metric="cosine")
        t0 = time.perf_counter()
        g = materialize(
            build_nsw_graph(emb, cents, M=8, nb=3).select("src", "dst")
        )
        g.count()
        t_build = time.perf_counter() - t0
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # r12: three search tiers.  "search" = the default dispatch
        # (executor-resident under the 200k gate at these SFs);
        # "search_dist" forces the distributed hop loop with the
        # broadcast anti-join; "search_shuffle_anti" additionally
        # forces the gated fallback (visited cap 0 -> shuffle
        # anti-join), the billion-vector plan shape.
        timings = {}
        for key, kw in (
            ("search_s", {}),
            ("search_dist_s", {"index_broadcast_max": 0}),
            (
                "search_shuffle_anti_s",
                {"index_broadcast_max": 0, "visited_broadcast_max": 0},
            ),
        ):
            t0 = time.perf_counter()
            nsw_topk(
                emb, g, q, k=10, ef=20, hops=4, entry_stride=8,
                corpus_count=n, **kw
            ).write.format("noop").mode("overwrite").save()
            timings[key] = time.perf_counter() - t0
        return {"n": n, "nc": nc, "build_s": t_build, **timings}

    def scc_graph(sf_dir: str):
        cust = read_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").cast("long").alias("src")
        )
        # Fixed-diameter graph: n/32 disjoint 32-cycles.  Min-label
        # fixpoints converge in O(diameter) iterations, so the honest
        # scale experiment holds the diameter FIXED and grows the DATA
        # 10x — the web-graph shape (small diameter, huge n).  A
        # single giant cycle or a broken-cycle chain instead measures
        # the documented O(diameter) iteration bound, not data scaling.
        n = cust.count() // 32 * 32
        cust = cust.filter(F.col("src") <= n)
        base = ((F.col("src") - 1) - (F.col("src") - 1) % 32) + 1
        return (
            cust.select(
                "src",
                (base + (F.col("src") - base + 1) % 32).alias("dst"),
            ),
            n,
        )

    def scc_times(sf_dir: str) -> dict[str, float]:
        edges, n = scc_graph(sf_dir)
        edges = materialize(edges)
        t0 = time.perf_counter()
        G.strongly_connected_components(edges).write.format("noop").mode(
            "overwrite"
        ).save()
        t_end = time.perf_counter() - t0
        saved = G.MAX_BROADCAST_NODES
        G.MAX_BROADCAST_NODES = 0
        try:
            t0 = time.perf_counter()
            G.strongly_connected_components(
                edges, max_rounds=64
            ).write.format("noop").mode("overwrite").save()
            t_dist = time.perf_counter() - t0
        finally:
            G.MAX_BROADCAST_NODES = saved
        return {"n": n, "endgame_s": t_end, "distributed_s": t_dist}

    out: dict[str, dict] = {}
    def _log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)
    _log("ann lo...")
    lo_ann = ann_times(lo_dir)
    _log(f"ann lo done {lo_ann}")
    hi_ann = ann_times(hi_dir)
    _log(f"ann hi done {hi_ann}")
    for key in (
        "build_s", "search_s", "search_dist_s", "search_shuffle_anti_s"
    ):
        out[f"nsw_{key[:-2]}"] = {
            "lo_sec": round(lo_ann[key], 2),
            "hi_sec": round(hi_ann[key], 2),
            "exponent": round(math.log10(hi_ann[key] / lo_ann[key]), 2),
        }
    out["nsw_meta"] = {
        "lo": {k: lo_ann[k] for k in ("n", "nc")},
        "hi": {k: hi_ann[k] for k in ("n", "nc")},
    }
    _log("scc lo...")
    lo_scc = scc_times(lo_dir)
    _log(f"scc lo done {lo_scc}")
    hi_scc = scc_times(hi_dir)
    _log(f"scc hi done {hi_scc}")
    for key in ("endgame_s", "distributed_s"):
        out[f"scc_{key[:-2]}"] = {
            "lo_sec": round(lo_scc[key], 2),
            "hi_sec": round(hi_scc[key], 2),
            "exponent": round(math.log10(hi_scc[key] / lo_scc[key]), 2),
        }
    out["scc_meta"] = {"lo_n": lo_scc["n"], "hi_n": hi_scc["n"]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
