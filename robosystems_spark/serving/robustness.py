"""Circuit breaker + tier-based rate limiting for the query lifecycle.

Re-expresses:
- the per-(graph, operation) circuit breaker
  (/root/reference/robosystems/middleware/robustness/circuit_breaker.py:
  28-150: failure threshold opens the circuit, recovery timeout moves
  it half-open, a success closes it)
- the sliding-window, subscription-tier rate limiter
  (middleware/rate_limits/repository_rate_limits.py:78-172 and
  rate_limits/cache.py:48-65: per-user per-operation request counts
  over a rolling window, limits by tier)

Both are process-local here (the reference backs them with Valkey);
the class boundary is the swap point.  Time is injected for
deterministic tests.
"""

from __future__ import annotations

import time as _time
from collections import defaultdict, deque
from dataclasses import dataclass, field


class CircuitOpenError(RuntimeError):
    pass


class RateLimitExceeded(RuntimeError):
    pass


@dataclass
class _CircuitState:
    failure_count: int = 0
    last_failure_time: float | None = None
    is_open: bool = False


class CircuitBreaker:
    """Per-(graph_id, operation) circuit breaker."""

    def __init__(
        self,
        failure_threshold: int = 5,
        recovery_timeout: float = 60.0,
        clock=_time.monotonic,
    ):
        self.failure_threshold = failure_threshold
        self.recovery_timeout = recovery_timeout
        self._clock = clock
        self._circuits: dict[str, _CircuitState] = defaultdict(_CircuitState)

    def _key(self, graph_id: str, operation: str) -> str:
        return f"{graph_id}:{operation}"

    def check(self, graph_id: str, operation: str = "query") -> None:
        """Raise CircuitOpenError unless the request may proceed.
        An open circuit past its recovery timeout moves half-open
        (one probe allowed; its outcome re-opens or closes)."""
        c = self._circuits[self._key(graph_id, operation)]
        if not c.is_open:
            return
        if (
            c.last_failure_time is not None
            and self._clock() - c.last_failure_time >= self.recovery_timeout
        ):
            # half-open: allow a probe
            c.is_open = False
            c.failure_count = self.failure_threshold - 1
            return
        raise CircuitOpenError(
            f"Circuit open for {graph_id}:{operation}; retry after "
            f"{self.recovery_timeout}s of stability"
        )

    def record_success(self, graph_id: str, operation: str = "query") -> None:
        c = self._circuits[self._key(graph_id, operation)]
        c.failure_count = 0
        c.is_open = False
        c.last_failure_time = None

    def record_failure(self, graph_id: str, operation: str = "query") -> None:
        c = self._circuits[self._key(graph_id, operation)]
        c.failure_count += 1
        c.last_failure_time = self._clock()
        if c.failure_count >= self.failure_threshold:
            c.is_open = True

    def is_open(self, graph_id: str, operation: str = "query") -> bool:
        return self._circuits[self._key(graph_id, operation)].is_open


# requests per rolling window, by subscription tier (the shape of
# RepositoryBillingConfig.RATE_LIMITS — values local defaults)
DEFAULT_TIER_LIMITS = {
    "free": 30,
    "standard": 120,
    "premium": 600,
    "enterprise": 3000,
}


@dataclass
class _Window:
    timestamps: deque = field(default_factory=deque)


class SlidingWindowRateLimiter:
    """Per-(user, operation) sliding-window rate limiting by tier."""

    def __init__(
        self,
        tier_limits: dict[str, int] | None = None,
        window_s: float = 60.0,
        clock=_time.monotonic,
    ):
        self.tier_limits = dict(tier_limits or DEFAULT_TIER_LIMITS)
        self.window_s = window_s
        self._clock = clock
        self._windows: dict[str, _Window] = defaultdict(_Window)

    def check(self, user_id: str, tier: str = "standard", operation: str = "query") -> dict:
        """Record one request; raise RateLimitExceeded past the tier
        limit.  Returns {allowed, remaining, limit} (the data the
        reference surfaces as X-RateLimit-* headers)."""
        limit = self.tier_limits.get(tier, self.tier_limits.get("standard", 120))
        now = self._clock()
        w = self._windows[f"{user_id}:{operation}"]
        while w.timestamps and now - w.timestamps[0] > self.window_s:
            w.timestamps.popleft()
        if len(w.timestamps) >= limit:
            raise RateLimitExceeded(
                f"Rate limit {limit}/{int(self.window_s)}s exceeded for "
                f"{user_id} ({tier})"
            )
        w.timestamps.append(now)
        return {"allowed": True, "remaining": limit - len(w.timestamps), "limit": limit}


def with_retry(
    fn,
    max_attempts: int = 3,
    base_delay: float = 1.0,
    max_delay: float = 30.0,
    exponential_base: float = 2.0,
    jitter: bool = True,
    retry_on: tuple = (Exception,),
    sleep=_time.sleep,
    seed: int | None = None,
):
    """Run ``fn`` with exponential-backoff retries (the reference's
    with_retry decorator, graph_api/client/factory.py:123-160, as a
    plain callable wrapper).  Delay_i = min(base * b^i, max_delay),
    +/-25% deterministic jitter when ``seed`` is given (random
    otherwise).  Raises the last error after ``max_attempts``."""
    import random

    rng = random.Random(seed)
    last = None
    for attempt in range(max_attempts):
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203 - retry loop by design
            last = e
            if attempt == max_attempts - 1:
                break
            delay = min(base_delay * (exponential_base**attempt), max_delay)
            if jitter:
                delay *= 1 + (rng.random() - 0.5) / 2
            sleep(delay)
    raise last
