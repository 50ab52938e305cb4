"""Externalize oversized column values to a content store.

The reference pushes fact text blocks above a size threshold to S3 and
keeps the URL in the column (/root/reference/robosystems/adapters/sec/
processors/textblock.py:19-46, used at xbrl_graph.py:590-610).  Here
the store is a directory (S3 in production); writes happen inside
``mapInPandas`` on the executors — no driver round-trip — and
filenames are content hashes so re-runs are idempotent.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EXTERNALIZED_PREFIX = "external://"


def externalize_large_values(
    df: DataFrame,
    value_col: str,
    store_dir: str,
    threshold_bytes: int = 1024,
) -> DataFrame:
    """Replace values larger than ``threshold_bytes`` with a pointer
    ``external://<sha256>`` after writing the payload to the store."""
    os.makedirs(store_dir, exist_ok=True)
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != value_col]
        + [T.StructField(value_col, T.StringType())]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != value_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_vals = []
            for v in pdf[value_col]:
                if v is not None and len(str(v).encode()) > threshold_bytes:
                    data = str(v).encode()
                    digest = hashlib.sha256(data).hexdigest()
                    path = os.path.join(store_dir, digest)
                    if not os.path.exists(path):  # idempotent re-run
                        with open(path, "wb") as fh:
                            fh.write(data)
                    out_vals.append(EXTERNALIZED_PREFIX + digest)
                else:
                    out_vals.append(v if v is None else str(v))
            out = pdf[other_cols].copy()
            out[value_col] = out_vals
            yield out

    return df.mapInPandas(batches, schema)


def resolve_external(value: str, store_dir: str) -> str:
    """Dereference an ``external://`` pointer (read-side helper)."""
    if not value.startswith(EXTERNALIZED_PREFIX):
        return value
    digest = value[len(EXTERNALIZED_PREFIX):]
    with open(os.path.join(store_dir, digest), "rb") as fh:
        return fh.read().decode()
