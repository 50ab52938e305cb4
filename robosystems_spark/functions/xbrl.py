"""XBRL numeric handling.

Decimal scaling per /root/reference/robosystems/adapters/sec/
processors/xbrl_graph.py:573-587: a fact's raw value is scaled by
10**decimals when decimals is a (possibly negative) integer; "INF"
or missing means the value is exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def apply_decimal_scaling(
    raw_value: Column | str, decimals: Column | str, scale_up: bool = False
) -> Column:
    """Numeric fact value from raw + decimals.

    With ``scale_up=False`` (default) the raw value is already in
    units and ``decimals`` only describes precision — value passes
    through unless it needs power-of-ten scaling (``scale_up=True``,
    the processor's ``raw * 10**decimals`` path for scaled filings).
    Non-numeric / 'INF' decimals pass the value through unchanged.
    """
    v = F.col(raw_value) if isinstance(raw_value, str) else raw_value
    d = F.col(decimals) if isinstance(decimals, str) else decimals
    # try_cast throughout: non-numeric values and 'INF'/malformed
    # decimals become NULL instead of throwing under ANSI mode
    v = v.try_cast("double")
    d_int = d.try_cast("int")
    if not scale_up:
        return v
    return F.when(d_int.isNull(), v).otherwise(v * F.pow(F.lit(10.0), d_int.cast("double")))
