"""Tier-priority query queue with per-user caps.

Semantics of /root/reference/robosystems/middleware/graph/
query_queue.py:69-120: bounded queue (default 1000), bounded
concurrency (50), per-user cap (10), priority by subscription tier.
The Spark analog additionally maps tiers onto fair-scheduler pools so
executor time follows the same priorities.
"""

from __future__ import annotations

import heapq
import itertools
import threading
from dataclasses import dataclass, field

DEFAULT_MAX_QUEUED = 1000
DEFAULT_MAX_CONCURRENT = 50
DEFAULT_MAX_PER_USER = 10

TIER_PRIORITY = {"enterprise": 0, "premium": 1, "standard": 2, "free": 3}


class QueueFullError(RuntimeError):
    pass


class UserQuotaError(RuntimeError):
    pass


@dataclass(order=True)
class _Entry:
    priority: int
    seq: int
    item: object = field(compare=False)
    user_id: str = field(compare=False, default="")


class QueryQueue:
    """Thread-safe priority queue with admission bookkeeping.

    ``submit`` enqueues (raises when full / user over quota);
    ``acquire`` pops the highest-priority entry if a concurrency slot
    is free; ``release`` returns the slot.
    """

    def __init__(
        self,
        max_queued: int = DEFAULT_MAX_QUEUED,
        max_concurrent: int = DEFAULT_MAX_CONCURRENT,
        max_per_user: int = DEFAULT_MAX_PER_USER,
    ):
        self.max_queued = max_queued
        self.max_concurrent = max_concurrent
        self.max_per_user = max_per_user
        self._heap: list[_Entry] = []
        self._seq = itertools.count()
        self._user_counts: dict[str, int] = {}
        self._running = 0
        self._lock = threading.Lock()

    def submit(self, item, user_id: str, tier: str = "standard") -> None:
        with self._lock:
            if len(self._heap) >= self.max_queued:
                raise QueueFullError(f"Queue full ({self.max_queued})")
            if self._user_counts.get(user_id, 0) >= self.max_per_user:
                raise UserQuotaError(
                    f"User {user_id!r} exceeds {self.max_per_user} queued queries"
                )
            prio = TIER_PRIORITY.get(tier, TIER_PRIORITY["standard"])
            heapq.heappush(
                self._heap, _Entry(prio, next(self._seq), item, user_id)
            )
            self._user_counts[user_id] = self._user_counts.get(user_id, 0) + 1

    def acquire(self):
        """Pop the next item if a concurrency slot is free, else None."""
        with self._lock:
            if self._running >= self.max_concurrent or not self._heap:
                return None
            entry = heapq.heappop(self._heap)
            self._user_counts[entry.user_id] -= 1
            if self._user_counts[entry.user_id] <= 0:
                del self._user_counts[entry.user_id]
            self._running += 1
            return entry.item

    def release(self) -> None:
        with self._lock:
            self._running = max(0, self._running - 1)

    @property
    def depth(self) -> int:
        with self._lock:
            return len(self._heap)

    @property
    def running(self) -> int:
        with self._lock:
            return self._running
