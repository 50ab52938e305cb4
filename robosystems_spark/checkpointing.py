"""Pluggable lineage-cut / materialization for iterative operators.

Every iterative or fan-out operator in this engine must materialize an
intermediate frame: loop frames so lineage stays flat across rounds,
fan-out frames so Catalyst doesn't re-inline an expensive subplan into
each consumer (see SCALE.md, "fan-out checkpoint discipline").  The
mechanism that does the materializing is a DEPLOYMENT decision, not an
operator decision:

- ``localCheckpoint`` (default) — executor-block storage, zero setup,
  ideal for local[] and benchmarks.  NOT fault-tolerant: blocks have no
  lineage to recompute from, so one lost executor (spot reclaim,
  OOM-kill, dynamic-allocation scale-in) fails the job.
- ``diskPersist`` — ``persist(StorageLevel.DISK_ONLY)`` + a count to
  force it.  Blocks are recomputable from lineage if an executor dies
  (at re-run cost), and disk-only avoids memory pressure.  Lineage is
  NOT cut, so very deep loops still grow plans — our loops are fixed
  small round counts, which keeps that bounded.  Persisted frames are
  tracked in a bounded FIFO (``spark.robosystems.materialize.
  maxPersisted``, default 64): the oldest frame beyond the window is
  unpersisted automatically, so long-lived sessions don't accumulate
  pinned disk blocks round after round; ``release(df)`` unpersists a
  superseded frame explicitly.
- ``checkpoint`` — reliable ``DataFrame.checkpoint()`` to the cluster
  checkpoint dir (HDFS/S3).  Cuts lineage AND survives executor loss;
  the right backend for 1000-executor production runs.

Operators call ``df.transform(materialize)`` (or
``materialize(df)``); the backend comes from the session conf
``spark.robosystems.materialize`` so a cluster deploy flips ONE conf
instead of touching 70+ call sites.

Reference parity note: the reference engine holds intermediates in its
own buffer manager (single-node, process-lifetime); Spark's analog is
exactly this storage-level choice.
"""

from __future__ import annotations

import os
import tempfile
from collections import deque

from pyspark.sql import DataFrame

CONF_KEY = "spark.robosystems.materialize"
CHECKPOINT_DIR_KEY = "spark.robosystems.checkpointDir"
MAX_PERSISTED_KEY = "spark.robosystems.materialize.maxPersisted"

_BACKENDS = ("localCheckpoint", "diskPersist", "checkpoint")

# diskPersist registers every materialized frame in the CacheManager,
# which the ContextCleaner never reclaims (persist() is not GC-driven),
# so iterative loops would pin one disk block set per round for the
# session's lifetime.  This FIFO evicts the oldest persisted frame
# beyond a bounded window — diskPersist keeps lineage, so an evicted
# frame that is still referenced simply recomputes (cost, not
# correctness).  Loop frames are superseded within 1-2 rounds; the
# default window of 64 is far wider than any loop's live set.
_persisted: deque[DataFrame] = deque()


def _register_persisted(df: DataFrame, limit: int) -> None:
    _persisted.append(df)
    while len(_persisted) > max(limit, 1):
        old = _persisted.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session torn down / already unpersisted


def release(df: DataFrame) -> None:
    """Explicitly unpersist a frame returned by ``materialize`` under
    the diskPersist backend (no-op handle for the other backends)."""
    try:
        _persisted.remove(df)
    except ValueError:
        pass
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass


def materialize(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Materialize ``df`` with the session-configured backend.

    ``eager=False`` registers the cut without forcing computation now
    (the next action materializes it) — used where the caller's own
    first action on the frame is immediate anyway.
    """
    spark = df.sparkSession
    try:
        backend = spark.conf.get(CONF_KEY, "localCheckpoint")
    except Exception:
        backend = "localCheckpoint"
    if backend == "localCheckpoint":
        return df.localCheckpoint(eager=eager)
    if backend == "diskPersist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        if eager:
            out.count()
        try:
            limit = int(spark.conf.get(MAX_PERSISTED_KEY, "64"))
        except Exception:
            limit = 64
        _register_persisted(out, limit)
        return out
    if backend == "checkpoint":
        _ensure_checkpoint_dir(spark)
        return df.checkpoint(eager=eager)
    raise ValueError(
        f"unknown {CONF_KEY}={backend!r}; expected one of {_BACKENDS}"
    )


def _ensure_checkpoint_dir(spark) -> None:
    """Set a checkpoint dir if the cluster hasn't configured one.

    Production sets ``spark.robosystems.checkpointDir`` (an HDFS/S3
    path) or calls ``setCheckpointDir`` at bootstrap; the tempdir
    fallback keeps local runs working without ceremony.
    """
    sc = spark.sparkContext
    try:
        has_dir = sc._jsc.sc().getCheckpointDir().isDefined()
    except Exception:
        has_dir = False
    if not has_dir:
        conf_dir = None
        try:
            conf_dir = spark.conf.get(CHECKPOINT_DIR_KEY, None)
        except Exception:
            pass
        sc.setCheckpointDir(
            conf_dir
            or os.path.join(tempfile.gettempdir(), "robosystems-spark-ckpt")
        )
