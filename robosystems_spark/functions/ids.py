"""Deterministic identifiers.

The reference derives IDs two ways (/root/reference/robosystems/
adapters/sec/processors/ids.py): UUIDv7 (time-ordered, random) for
user-created rows, and content-hash IDs (md5 of a URI) for facts so
re-ingestion is idempotent.  Distributed execution forbids anything
monotonic or stateful (SURVEY §7 hard-part #3), so both helpers here
are pure column expressions, reproducible on any executor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_hash_id(*cols: Column | str, prefix: str = "") -> Column:
    """Deterministic ID from content: md5 over the concatenated inputs
    (null-safe, unit-separated to avoid ambiguity)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    sep = F.lit("\x1f")
    joined = F.concat_ws("\x1f", *[F.coalesce(p.cast("string"), F.lit("\x00")) for p in parts])
    h = F.md5(joined.cast("binary"))
    return F.concat(F.lit(prefix), h) if prefix else h


def deterministic_uuid(*cols: Column | str) -> Column:
    """UUID-shaped deterministic ID (UUIDv8-style: content-derived).

    Formats the md5 of the inputs as 8-4-4-4-12.  Used where the
    reference uses UUIDv7 but reproducibility across re-runs matters
    more than time-ordering.
    """
    h = content_hash_id(*cols)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
