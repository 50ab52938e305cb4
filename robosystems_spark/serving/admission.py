"""Admission control: probabilistic load shedding.

Semantics of /root/reference/robosystems/middleware/graph/
admission_control.py:18-80 and graph_api/core/admission_control.py:16-60:
sample memory/CPU/queue pressure and shed load probabilistically as
thresholds (memory 85%, CPU 90-95%, queue 80%) are approached.

The Spark engine sits behind the same Python layer; executor-side
pressure is additionally governed by Spark's scheduler pools.
"""

from __future__ import annotations

import random
from dataclasses import dataclass


@dataclass
class AdmissionDecision:
    admitted: bool
    reason: str
    memory_pct: float
    cpu_pct: float
    queue_pct: float


class AdmissionController:
    def __init__(
        self,
        memory_threshold: float = 0.85,
        cpu_threshold: float = 0.90,
        queue_threshold: float = 0.80,
        max_queue: int = 1000,
        seed: int | None = None,
    ):
        self.memory_threshold = memory_threshold
        self.cpu_threshold = cpu_threshold
        self.queue_threshold = queue_threshold
        self.max_queue = max_queue
        self.queue_depth = 0
        self._rng = random.Random(seed)

    def _sample_system(self) -> tuple[float, float]:
        try:
            import psutil

            return psutil.virtual_memory().percent / 100.0, psutil.cpu_percent() / 100.0
        except ImportError:
            return 0.0, 0.0

    def check(self) -> AdmissionDecision:
        mem, cpu = self._sample_system()
        queue_pct = self.queue_depth / self.max_queue if self.max_queue else 0.0

        def shed_probability(value: float, threshold: float) -> float:
            """0 below threshold, ramping linearly to 1 at 100%."""
            if value < threshold:
                return 0.0
            span = 1.0 - threshold
            return min(1.0, (value - threshold) / span) if span > 0 else 1.0

        for name, value, threshold in (
            ("memory", mem, self.memory_threshold),
            ("cpu", cpu, self.cpu_threshold),
            ("queue", queue_pct, self.queue_threshold),
        ):
            p = shed_probability(value, threshold)
            if p > 0 and self._rng.random() < p:
                return AdmissionDecision(False, f"{name}_pressure", mem, cpu, queue_pct)
        return AdmissionDecision(True, "ok", mem, cpu, queue_pct)

    def enter(self) -> None:
        self.queue_depth += 1

    def leave(self) -> None:
        self.queue_depth = max(0, self.queue_depth - 1)
