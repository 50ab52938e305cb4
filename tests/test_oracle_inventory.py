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


def test_registry_outputs_are_atomic(spark, sf_dir):
    """Driver-shape gate: the round-4 driver canonicalizer crashed on an
    array<double> result column (pandas sort_values -> 'unhashable type:
    list').  Every registry entry must therefore expose only atomic
    column types; array-shaped operators keep their typed API in
    operators/ and register a posexploded / serialized long shape."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-atomic registry output columns: {bad}"


def test_no_oracle_emits_hugeint_or_wide_decimal(con):
    """Driver-type gate: DuckDB's SUM(BIGINT) returns HUGEINT, which
    Arrow presents as decimal128(38,0) — a type the driver's
    type-sensitive value hash can never match against Spark's int64,
    even when every value is identical (round-6 red row
    `dedup_weighted_jaccard_pairs`).  Sweep every oracle's Arrow output
    schema: no column may be decimal128(38,*) or decimal256; sums that
    should be integers must CAST(... AS BIGINT), and decimal money
    columns must pin an explicit precision both sides share."""
    import pyarrow as pa

    bad = []
    for name in sorted(REGISTRY):
        sql = REGISTRY[name].oracle
        if sql is None:
            continue
        schema = con.execute(sql).arrow().schema
        for f in schema:
            t = f.type
            if pa.types.is_decimal(t) and (t.precision >= 38):
                bad.append(f"{name}.{f.name}: {t}")
    assert not bad, f"oracle columns with unhashable wide-decimal types: {bad}"


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


# ---------------------------------------------------------------------------
# Driver-sample insurance (VERDICT r8 #4): the driver samples 50
# queries per round, so half the registry has never faced its sf0.01
# compare — the sweep above covers sf0.001 only.  Run EVERY entry at
# the driver's scale factor too, so a future draw can't surprise:
# cardinality-dependent bugs (empty groups at tiny SF, tie-break order
# flips, quantile boundaries) show up between SFs, not within one.
# ---------------------------------------------------------------------------

_INSURED = sorted(REGISTRY)


@pytest.fixture(scope="module")
def con_correct():
    c = duckdb_conn("/root/testdata/sf0.01")
    yield c
    c.close()


@pytest.mark.parametrize("name", _INSURED)
def test_insured_families_match_oracle_at_driver_sf(name, spark, con_correct):
    spec = REGISTRY[name]
    df = spec.fn(spark, "/root/testdata/sf0.01")
    if spec.oracle is None:
        assert df.count() >= 0 and df.columns
        return
    result = compare(name, df, spec.oracle, con_correct)
    assert result.ok, (
        f"{name}@sf0.01: {result.detail} "
        f"(rows {result.spark_rows}/{result.oracle_rows})"
    )
