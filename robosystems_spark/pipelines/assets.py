"""Dependency-ordered asset orchestration (the Dagster-asset seam).

The reference chains its ingestion as Dagster assets — download →
process → stage → materialize (ref: robosystems/dagster/assets/
sec.py:288-907: ``@asset`` with ``deps=[...]``, year/filing
``partitions_def``, ``RetryPolicy(max_retries=1)``, concurrency
op_tags, and ``MaterializeResult`` metadata).  SURVEY scopes the
orchestrator itself as replaceable ("keep Dagster or plain jobs");
this module is the plain-jobs half: a dependency-ordered, retrying,
partition-aware asset runner with NO scheduler daemon — enough to
run the reference's pipelines as ordinary Python against a shared
SparkSession, while remaining trivially portable to Dagster/Airflow
(each asset function is already the op body).

Semantics:

- ``@graph.asset(deps=[...])`` registers a function as an asset; the
  function receives an ``AssetContext`` (spark handle, partition key,
  upstream results, logger) and returns any value, which downstream
  assets see via ``context.upstream[name]``.
- ``graph.materialize(select=..., partition_key=...)`` runs the
  selected assets and every transitive dependency in topological
  order.  Independent assets at the same depth run concurrently in a
  thread pool (Spark job submission is thread-safe; this is the
  local analog of Dagster's concurrency tags) capped by
  ``max_concurrent``.
- Per-asset ``retries`` re-run a failing asset (the reference's
  transient-OOM retry); after exhaustion the asset is FAILED and its
  transitive dependents are SKIPPED (status ``upstream_failed``) —
  independent branches keep running.
- Results are memoized per (asset, partition) within a run; an
  optional on-disk ledger (JSON) records successful materializations
  so re-runs skip fresh assets unless ``force=True`` — the poor
  man's freshness policy, deliberately simple (real deployments have
  Dagster for the rest).  A ledger-skipped ("fresh") asset
  contributes ``value=None`` downstream, so assets that hand values
  to dependents should pass durable references (paths, table names —
  exactly what the reference's assets exchange), not live objects.

Scale: the orchestrator moves NO data — assets exchange small
metadata values (paths, counts); the heavy lifting stays inside each
asset's Spark plans.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any, Callable

logger = logging.getLogger("robosystems_spark.assets")


@dataclass
class AssetContext:
    """What an asset body gets: the session, its partition, upstream
    results, and a logger — the AssetExecutionContext analog."""

    spark: Any
    partition_key: str | None
    upstream: dict[str, Any]
    log: logging.Logger = field(default_factory=lambda: logger)


@dataclass
class MaterializeResult:
    """One asset's outcome; ``value`` flows to dependents."""

    asset: str
    status: str  # ok | failed | skipped | upstream_failed | fresh
    value: Any = None
    error: str | None = None
    attempts: int = 0
    seconds: float = 0.0


class AssetGraph:
    """A named DAG of assets over one SparkSession."""

    def __init__(
        self,
        spark: Any = None,
        ledger_path: str | None = None,
        max_concurrent: int = 4,
    ) -> None:
        self._spark = spark
        self._assets: dict[str, Callable[[AssetContext], Any]] = {}
        self._deps: dict[str, list[str]] = {}
        self._retries: dict[str, int] = {}
        self._ledger_path = ledger_path
        self._ledger_lock = threading.Lock()
        self._max_concurrent = max(1, max_concurrent)

    # -- registration -----------------------------------------------------
    def asset(
        self,
        name: str | None = None,
        deps: list[str | Callable] | None = None,
        retries: int = 0,
        description: str | None = None,
    ):
        """Decorator registering an asset (``@asset`` analog)."""

        def wrap(fn: Callable[[AssetContext], Any]):
            aname = name or fn.__name__
            if aname in self._assets:
                raise ValueError(f"duplicate asset {aname!r}")
            self._assets[aname] = fn
            self._deps[aname] = [
                d if isinstance(d, str) else d.__name__ for d in (deps or [])
            ]
            self._retries[aname] = retries
            fn.__asset_name__ = aname  # type: ignore[attr-defined]
            return fn

        return wrap

    # -- planning ---------------------------------------------------------
    def _closure(self, select: list[str] | None) -> list[str]:
        """Selected assets + transitive deps, topologically ordered;
        raises on unknown names and cycles."""
        targets = list(select) if select else list(self._assets)
        for t in targets:
            if t not in self._assets:
                raise KeyError(f"unknown asset {t!r}")
        needed: set[str] = set()

        def grow(n: str, trail: tuple[str, ...]) -> None:
            if n in trail:
                cyc = " -> ".join(trail + (n,))
                raise ValueError(f"asset dependency cycle: {cyc}")
            if n in needed:
                return
            for d in self._deps[n]:
                if d not in self._assets:
                    raise KeyError(f"asset {n!r} depends on unknown {d!r}")
                grow(d, trail + (n,))
            needed.add(n)

        for t in targets:
            grow(t, ())
        # Kahn ordering over the needed subgraph
        order: list[str] = []
        pending = {n: [d for d in self._deps[n] if d in needed] for n in needed}
        while pending:
            ready = sorted(n for n, ds in pending.items() if not ds)
            if not ready:  # unreachable given the cycle check above
                raise ValueError("asset graph did not converge")
            for n in ready:
                order.append(n)
                del pending[n]
            for n, ds in pending.items():
                pending[n] = [d for d in ds if d not in set(order)]
        return order

    # -- ledger -----------------------------------------------------------
    def _ledger(self) -> dict:
        if not self._ledger_path or not os.path.exists(self._ledger_path):
            return {}
        try:
            with open(self._ledger_path) as f:
                return json.load(f)
        except Exception:
            return {}

    def _record(self, key: str) -> None:
        if not self._ledger_path:
            return
        with self._ledger_lock:
            led = self._ledger()
            led[key] = {"at": time.time()}
            tmp = self._ledger_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(led, f)
            os.replace(tmp, self._ledger_path)

    # -- execution ----------------------------------------------------------
    def materialize(
        self,
        select: list[str] | None = None,
        partition_key: str | None = None,
        force: bool = False,
    ) -> dict[str, MaterializeResult]:
        """Run the selection + transitive deps in dependency order.

        Independent ready assets run concurrently (thread pool, capped);
        a failed asset (after retries) marks all transitive dependents
        ``upstream_failed`` without stopping unrelated branches."""
        order = self._closure(select)
        ledger = self._ledger() if not force else {}
        results: dict[str, MaterializeResult] = {}
        remaining = {
            n: set(d for d in self._deps[n] if d in order) for n in order
        }
        lock = threading.Lock()

        def run_one(name: str) -> MaterializeResult:
            key = f"{name}@{partition_key or '-'}"
            if key in ledger:
                return MaterializeResult(asset=name, status="fresh")
            ctx = AssetContext(
                spark=self._spark,
                partition_key=partition_key,
                upstream={
                    d: results[d].value
                    for d in self._deps[name]
                    if d in results
                },
            )
            attempts = 0
            t0 = time.perf_counter()
            while True:
                attempts += 1
                try:
                    value = self._assets[name](ctx)
                    self._record(key)
                    return MaterializeResult(
                        asset=name,
                        status="ok",
                        value=value,
                        attempts=attempts,
                        seconds=round(time.perf_counter() - t0, 3),
                    )
                except Exception as exc:  # noqa: BLE001 - retry policy
                    if attempts > self._retries[name]:
                        return MaterializeResult(
                            asset=name,
                            status="failed",
                            error=f"{type(exc).__name__}: {exc}",
                            attempts=attempts,
                            seconds=round(time.perf_counter() - t0, 3),
                        )

        failed_roots: set[str] = set()
        with ThreadPoolExecutor(max_workers=self._max_concurrent) as pool:
            futures: dict = {}
            while remaining or futures:
                # launch every ready asset (deps resolved, not failed)
                with lock:
                    ready = [
                        n for n, ds in remaining.items()
                        if not ds and n not in futures
                    ]
                for n in ready:
                    blocked = any(
                        results.get(d) is not None
                        and results[d].status in ("failed", "upstream_failed")
                        for d in self._deps[n]
                    )
                    if blocked:
                        results[n] = MaterializeResult(
                            asset=n, status="upstream_failed"
                        )
                        with lock:
                            del remaining[n]
                            for ds in remaining.values():
                                ds.discard(n)
                        continue
                    futures[pool.submit(run_one, n)] = n
                    with lock:
                        del remaining[n]
                if not futures:
                    continue
                done, _ = wait(list(futures), return_when=FIRST_COMPLETED)
                for fut in done:
                    n = futures.pop(fut)
                    res = fut.result()
                    results[n] = res
                    if res.status == "failed":
                        failed_roots.add(n)
                    with lock:
                        for ds in remaining.values():
                            ds.discard(n)
        return results
