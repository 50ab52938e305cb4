"""Data profiling: per-column statistics and numeric histograms.

The ANALYZE/SUMMARIZE surface of an analytics engine (DuckDB
``SUMMARIZE``, Spark ``df.summary()``), re-expressed as oracled
operators: ingest pipelines gate on exactly these numbers (null-rate
regressions, cardinality drift, range drift) before data reaches
training.

Spark-first shape: ``table_profile`` is ONE aggregation over the table
(all per-column exprs in a single pass; the count-distincts expand via
Catalyst's standard Expand rewrite, still one shuffle), unpivoted to
a long (column, metric...) grid on the driver from a single collected
row.  ``numeric_histogram`` is two passes: a min/max aggregate, then a
map-side bin assignment + one groupBy — the classic two-pass
equi-width histogram.

PORTABILITY: min/max render through explicit CAST AS STRING on both
engines (dates/strings/integers format identically; doubles round to
6 first); bin edges derive from identical double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "double", "float", "smallint", "tinyint")


def _min_max_str(col: str, dtype: str):
    c = F.col(col)
    if dtype.startswith(("double", "float", "decimal")):
        return (
            F.round(F.min(c), 6).cast("string"),
            F.round(F.max(c), 6).cast("string"),
        )
    return F.min(c).cast("string"), F.max(c).cast("string")


def table_profile(df: DataFrame) -> DataFrame:
    """Per-column profile: (column, dtype, n_rows, n_null, n_distinct,
    min_value, max_value) — one distributed aggregation, rows built
    from the single collected result."""
    spark = df.sparkSession
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    for name, dtype in fields:
        c = F.col(name)
        mn, mx = _min_max_str(name, dtype)
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"{name}__null"),
            F.countDistinct(c).alias(f"{name}__dist"),
            mn.alias(f"{name}__min"),
            mx.alias(f"{name}__max"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            name,
            dtype,
            int(row["_n"]),
            int(row[f"{name}__null"]),
            int(row[f"{name}__dist"]),
            row[f"{name}__min"],
            row[f"{name}__max"],
        )
        for name, dtype in fields
    ]
    return spark.createDataFrame(
        out,
        "column STRING, dtype STRING, n_rows BIGINT, n_null BIGINT, "
        "n_distinct BIGINT, min_value STRING, max_value STRING",
    )


def table_profile_oracle_sql(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB SQL for the identical profile.  ``cols`` is the
    [(name, spark_dtype_string)] spec — dtype strings are emitted as
    literals because type NAMES are engine-specific even when the
    parquet physical types are identical."""
    branches = []
    for name, dtype in cols:
        if dtype.startswith(("double", "float", "decimal")):
            mn = f"CAST(ROUND(MIN({name}), 6) AS VARCHAR)"
            mx = f"CAST(ROUND(MAX({name}), 6) AS VARCHAR)"
        else:
            mn = f"CAST(MIN({name}) AS VARCHAR)"
            mx = f"CAST(MAX({name}) AS VARCHAR)"
        branches.append(
            f"""SELECT '{name}' AS "column", '{dtype}' AS dtype,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
       {mn} AS min_value, {mx} AS max_value
FROM {table}"""
        )
    return "\nUNION ALL\n".join(branches)


def numeric_histogram(
    df: DataFrame, col: str, n_bins: int = 20, decimals: int = 6
) -> DataFrame:
    """Equi-width histogram: (bin, lo, hi, n_rows) over the observed
    [min, max] range; the max value lands in the last bin.  Two
    passes: one min/max aggregate, one map-side bin + groupBy."""
    bounds = df.agg(
        F.min(F.col(col).cast("double")).alias("mn"),
        F.max(F.col(col).cast("double")).alias("mx"),
    ).collect()[0]
    if bounds["mn"] is None:
        raise ValueError(f"no non-null values in {col}")
    mn, mx = float(bounds["mn"]), float(bounds["mx"])
    if mx <= mn:
        raise ValueError(f"degenerate range for {col}: [{mn}, {mx}]")
    w = (mx - mn) / n_bins
    bin_expr = F.least(
        F.floor((F.col(col).cast("double") - F.lit(mn)) / F.lit(w)),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bin",
            F.round(F.lit(mn) + F.col("bin") * F.lit(w), decimals).alias("lo"),
            F.round(F.lit(mn) + (F.col("bin") + 1) * F.lit(w), decimals).alias(
                "hi"
            ),
            "n_rows",
        )
    )


def numeric_histogram_oracle_sql(
    table: str, col: str, n_bins: int = 20, decimals: int = 6
) -> str:
    """DuckDB SQL for the identical histogram (bounds computed in-SQL
    with the same double arithmetic)."""
    return f"""
    WITH b AS (
      SELECT CAST(MIN({col}) AS DOUBLE) AS mn,
             (CAST(MAX({col}) AS DOUBLE) - CAST(MIN({col}) AS DOUBLE))
               / {n_bins} AS w
      FROM {table}
    ),
    binned AS (
      SELECT CAST(LEAST(FLOOR((CAST(t.{col} AS DOUBLE) - b.mn) / b.w),
                        {n_bins - 1}) AS INT) AS bin
      FROM {table} t, b
      WHERE t.{col} IS NOT NULL
    )
    SELECT binned.bin,
           ROUND(b.mn + binned.bin * b.w, {decimals}) AS lo,
           ROUND(b.mn + (binned.bin + 1) * b.w, {decimals}) AS hi,
           COUNT(*) AS n_rows
    FROM binned, b
    GROUP BY binned.bin, b.mn, b.w
    """


def dq_rule_audit(rules: list[tuple[str, DataFrame]]) -> DataFrame:
    """Data-quality rule audit: each rule is (name, violations_frame);
    the audit emits ONE row per rule with its violation count — zero
    rows included, so a green audit is explicit, not absent.

    Callers build the violation frames declaratively (anti-joins for
    referential integrity, filters for domain/order rules) and this
    unions the counts; each count is an independent aggregate, so
    Spark runs the rule scans as separate stages that share nothing —
    at 100 TB each rule still reads only the columns it needs (column
    pruning survives the union).
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    counted = [
        df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )
        for name, df in rules
    ]
    out = counted[0]
    for c in counted[1:]:
        out = out.unionByName(c)
    return out


def tpch_dq_rules(tables: dict[str, DataFrame]) -> list[tuple[str, DataFrame]]:
    """The standard referential/domain/ordering rule set over the
    TPC-H-ish tables: FK orphans via anti-joins, date-ordering and
    sign rules via filters."""
    li, orders, cust, nation = (
        tables["lineitem"],
        tables["orders"],
        tables["customer"],
        tables["nation"],
    )
    return [
        (
            "lineitem.l_orderkey -> orders",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti"),
        ),
        (
            "orders.o_custkey -> customer",
            orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti"),
        ),
        (
            "customer.c_nationkey -> nation",
            cust.join(nation, cust.c_nationkey == nation.n_nationkey, "left_anti"),
        ),
        (
            "l_shipdate >= o_orderdate",
            li.join(
                orders.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"),
            ).filter(F.col("l_shipdate") < F.col("o_orderdate")),
        ),
        (
            "l_discount in [0, 0.5]",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)),
        ),
        ("o_totalprice > 0", orders.filter(F.col("o_totalprice") <= 0)),
        (
            "l_quantity in (0, 60]",
            li.filter((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 60)),
        ),
    ]


def dq_rule_audit_oracle_sql() -> str:
    """DuckDB twin of the TPC-H rule set — plain NOT EXISTS / filter
    counts unioned in the same rule order."""
    return """
    SELECT 'lineitem.l_orderkey -> orders' AS rule,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'l_shipdate >= o_orderdate',
           (SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate < o.o_orderdate)
    UNION ALL
    SELECT 'l_discount in [0, 0.5]',
           (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.5)
    UNION ALL
    SELECT 'o_totalprice > 0',
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'l_quantity in (0, 60]',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0 OR l_quantity > 60)
    """
