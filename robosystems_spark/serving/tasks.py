"""Background tasks with progress events.

Re-expresses the reference's long-running-ingest pattern
(/root/reference/robosystems/graph_api/routers/databases/copy.py:55-381
+ graph_api/core/task_sse.py): a task runs off the request path,
reports monotonically-increasing progress events, supports polling
and terminal states.  The SSE transport is an API-layer concern; this
provides the task registry + progress channel it would wrap.
"""

from __future__ import annotations

import threading
import traceback
import uuid
from dataclasses import dataclass, field
from enum import Enum


class TaskState(str, Enum):
    PENDING = "pending"
    RUNNING = "running"
    COMPLETED = "completed"
    FAILED = "failed"


@dataclass
class TaskInfo:
    task_id: str
    state: TaskState
    progress: float = 0.0
    message: str = ""
    result: object = None
    error: str | None = None
    events: list[dict] = field(default_factory=list)


class BackgroundTaskRunner:
    """Thread-backed task registry (asyncio in the reference; threads
    here since Spark actions block)."""

    def __init__(self):
        self._tasks: dict[str, TaskInfo] = {}
        self._lock = threading.Lock()

    def submit(self, fn, *args, **kwargs) -> str:
        """Run ``fn(progress, *args, **kwargs)`` in the background.
        ``progress(fraction, message)`` is injected as the first arg."""
        task_id = uuid.uuid4().hex[:12]
        info = TaskInfo(task_id=task_id, state=TaskState.PENDING)
        with self._lock:
            self._tasks[task_id] = info

        def progress(fraction: float, message: str = "") -> None:
            with self._lock:
                info.progress = max(info.progress, min(1.0, fraction))
                info.message = message
                info.events.append(
                    {"type": "progress", "progress": info.progress, "message": message}
                )

        def run():
            with self._lock:
                info.state = TaskState.RUNNING
            try:
                result = fn(progress, *args, **kwargs)
                with self._lock:
                    info.result = result
                    info.progress = 1.0
                    info.state = TaskState.COMPLETED
                    info.events.append({"type": "completed"})
            except Exception as exc:  # noqa: BLE001 - surfaced via status
                with self._lock:
                    info.error = f"{type(exc).__name__}: {exc}"
                    info.state = TaskState.FAILED
                    info.events.append({"type": "failed", "error": info.error})
                    info.events.append({"type": "traceback", "detail": traceback.format_exc()})

        t = threading.Thread(target=run, daemon=True)
        t.start()
        return task_id

    def status(self, task_id: str) -> TaskInfo:
        with self._lock:
            if task_id not in self._tasks:
                raise KeyError(f"Unknown task {task_id!r}")
            return self._tasks[task_id]

    def wait(self, task_id: str, timeout_s: float = 60.0, poll_s: float = 0.05) -> TaskInfo:
        import time

        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            info = self.status(task_id)
            if info.state in (TaskState.COMPLETED, TaskState.FAILED):
                return info
            time.sleep(poll_s)
        return self.status(task_id)
