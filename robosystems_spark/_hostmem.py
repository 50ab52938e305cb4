"""Host-memory hardening (r12).

This sandbox's hypervisor has a pathological transparent-hugepage
fault path: faulting in a THP-madvised region costs ~100-600 ms PER
2 MB PAGE (host-side backing allocation).  numpy madvises THP for
every allocation >= 4 MB, so each fresh large array pays seconds of
wall time (measured on this box: 32 MB first-touch 8.6-12 s vs
0.04-0.08 s with madvise off) — wrecking the resident numpy tiers,
the Arrow/pandas executor paths, and every benchmark number.

The guard is probe-based so healthy hosts keep THP untouched:

1. ``NUMPY_MADVISE_HUGEPAGE=0`` is exported for child processes
   (executor Python workers inherit the JVM's env).
2. A fresh-allocation numpy first-touch probe measures the actual
   fault path (healthy: ~5 ms; broken: >2 s for 8 MB).  Only when it
   is catastrophically slow does the guard flip numpy's runtime
   madvise switch off and (best-effort, root, silent otherwise)
   disable THP host-wide so non-numpy allocators recover too.

Runs once per process, at package import and again from
``session.get_spark`` (no-op the second time).
"""

from __future__ import annotations

import os

_DONE = False

# Broken-host threshold for the 8 MB first-touch probe: healthy hosts
# measure ~3-10 ms, the pathological host >2 s — 0.25 s splits the two
# by >25x in both directions.
_PROBE_SLOW_S = 0.25


def harden_host_memory() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    try:
        import time

        import numpy as np

        try:  # numpy 1.x
            from numpy.core.multiarray import _set_madvise_hugepage
        except ImportError:  # pragma: no cover - numpy 2.x
            from numpy._core.multiarray import _set_madvise_hugepage

        size = 8 << 20  # 4 huge pages
        t0 = time.perf_counter()
        arr = np.empty(size, dtype=np.uint8)
        arr[::4096] = 1  # touch every 4K page -> faults the region in
        slow = (time.perf_counter() - t0) > _PROBE_SLOW_S
        del arr
        if not slow:
            return
        _set_madvise_hugepage(False)
        try:
            with open(
                "/sys/kernel/mm/transparent_hugepage/enabled", "w"
            ) as fh:
                fh.write("never")
        except OSError:
            pass
    except Exception:  # pragma: no cover - never block startup
        pass
