"""Timeout cascade + Spark job cancellation.

Semantics of /root/reference/robosystems/routers/graphs/query/
strategies.py:288-334: each inner layer gets 30s less than the outer
(endpoint > queue > execution), with caps of 30s (testing) / 300s
(streaming) / 600s (queued).  Execution-level enforcement in Spark is
``cancelJobGroup`` on a timer — the analog of the reference's
per-connection ``CALL timeout=`` (engine.py:94-112).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import SparkSession

LAYER_DECREMENT_S = 30
CAP_TESTING_S = 30
CAP_STREAMING_S = 300
CAP_QUEUED_S = 600


@dataclass
class TimeoutBudget:
    endpoint_s: float
    queue_s: float
    execution_s: float


class TimeoutCascade:
    def budget(self, endpoint_timeout_s: float, mode: str = "streaming") -> TimeoutBudget:
        cap = {
            "testing": CAP_TESTING_S,
            "streaming": CAP_STREAMING_S,
            "queued": CAP_QUEUED_S,
        }.get(mode, CAP_STREAMING_S)
        endpoint = min(endpoint_timeout_s, cap)
        queue = max(1.0, endpoint - LAYER_DECREMENT_S)
        execution = max(1.0, queue - LAYER_DECREMENT_S)
        return TimeoutBudget(endpoint, queue, execution)

    @contextmanager
    def enforce(self, spark: SparkSession, group_id: str, timeout_s: float):
        """Run a block under a job group that is cancelled at timeout."""
        sc = spark.sparkContext
        sc.setJobGroup(group_id, f"timeout={timeout_s}s", interruptOnCancel=True)
        timer = threading.Timer(timeout_s, lambda: sc.cancelJobGroup(group_id))
        timer.daemon = True
        timer.start()
        try:
            yield
        finally:
            timer.cancel()
            # clearJobGroup was removed in Spark 4; resetting to a null
            # group id is the supported equivalent
            sc.setJobGroup("", "")
