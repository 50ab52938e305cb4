"""The main correctness gate, mirrored locally: every inventory query
with an oracle must hash-match DuckDB on the smoke-scale tables.

This is the same compare the driver runs at sf0.01 (CORRECTNESS_r{N});
keeping it in-tree means a red query never reaches a commit.
"""

from __future__ import annotations

import pytest

from robosystems_spark.inventory import REGISTRY, _ensure_loaded
from robosystems_spark.oracle import compare, duckdb_conn

_ensure_loaded()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, con):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert df.count() >= 0
        assert df.columns
        return
    result = compare(name, df, spec.oracle, con)
    assert result.ok, f"{name}: {result.detail} (rows {result.spark_rows}/{result.oracle_rows})"
