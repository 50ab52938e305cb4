"""Graph-pattern operators expressed over edge DataFrames.

The reference executes Cypher pattern matches inside an embedded graph
engine; its query corpus uses bounded var-length paths ``[*1..3]``
(flagged by /root/reference/robosystems/middleware/mcp/
query_validator.py:33-43) and warns against unbounded ``[*]``.  Spark
has no recursive-join builtin, so bounded traversal is an iterative
BFS loop of DataFrame joins — the one operator family SURVEY §4 calls
out as genuinely custom.

Scale notes:
- The frontier is deduplicated each level (``dropDuplicates``) so the
  join input never exceeds |reachable pairs|, not |paths| (path count
  can be exponential; pair count is bounded by |V|^2).
- Each level is persisted and the previous level unpersisted to keep
  lineage short; at cluster scale substitute ``localCheckpoint()``.
- The edge table is reused across iterations — on a real cluster,
  pre-partition it by ``src`` (``repartition("src")`` or bucketing)
  once so every BFS level joins without reshuffling the edges side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def bounded_paths(
    edges: DataFrame,
    max_depth: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """All (src, dst, depth) pairs reachable in 1..max_depth hops.

    ``depth`` is the MINIMUM hop count (BFS level at first discovery),
    matching the ``MIN(depth)`` semantics of a recursive-CTE oracle.
    """
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")

    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).dropDuplicates()
    # reached: best-known (src,dst,depth); frontier: pairs discovered last level
    frontier = edges.withColumn("depth", F.lit(1))
    reached = frontier
    reached.persist(StorageLevel.MEMORY_AND_DISK)

    for level in range(2, max_depth + 1):
        nxt = (
            frontier.alias("p")
            .join(edges.alias("e"), F.col("p.dst") == F.col("e.src"))
            .select(F.col("p.src").alias("src"), F.col("e.dst").alias("dst"))
            .dropDuplicates()
            .withColumn("depth", F.lit(level))
        )
        # keep only pairs not already reached at a shallower depth
        nxt = nxt.join(reached.select("src", "dst"), ["src", "dst"], "left_anti")
        nxt.persist(StorageLevel.MEMORY_AND_DISK)
        if nxt.isEmpty():
            nxt.unpersist()
            break
        new_reached = reached.unionByName(nxt)
        new_reached.persist(StorageLevel.MEMORY_AND_DISK)
        reached.unpersist()
        reached = new_reached
        frontier = nxt

    return reached


def undirected(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Union of both edge directions — the ``(a)--(b)`` Cypher idiom
    (reference usage: robosystems/operations/views/save_view.py:42-45)."""
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    rev = edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    return fwd.unionByName(rev)
