"""Engine-portable cardinality sketches as column expressions.

``approx_count_distinct`` (SURVEY §2.4 A12) is the right production
answer — Spark's native HLL++ merges across partitions in the JVM.
But native sketches are engine-specific, so their estimates can only
ever be rows-only checked.  This module implements classic
HyperLogLog (Flajolet et al. 2007) from PORTABLE primitives — the
md5-derived 60-bit hash the dedup pipeline already uses, bucket/rank
extraction via integer arithmetic and exact binary-string length
(no floating log2), and the standard bias-corrected estimator — so
the SAME sketch computes bit-identically in Spark and DuckDB and the
approximate result carries a hard oracle.

Plan shape: two hash-aggregates (group,bucket max-rank -> group
estimate), both with map-side partial aggregation — the sketch state
per group is m=2^p registers, exactly HLL's scale contract.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.checkpointing import materialize

# 60-bit portable hash (15 md5 hex chars), as in operators/dedup.py
_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def portable_hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 9,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group HLL cardinality estimate, engine-portable.

    bucket = h mod 2^p; rank = leading zeros of the remaining
    ``60-p`` bits + 1 (computed as ``width - length(bin(w)) + 1`` —
    exact integer/string ops, no log).  Register = max rank per
    (group, bucket); estimate = alpha * m^2 / sum(2^-M) with the
    standard small-range linear-counting correction.  The 2^-M terms
    and their sum stay in double — identical in any engine up to
    summation order, absorbed by the 4-decimal output rounding."""
    m = 1 << p
    width = _HASH_BITS - p
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    bucket = h % m
    # h >> p == h // 2^p for the non-negative 60-bit hash — integer
    # shift, never the double-typed `/` (which loses bits past 2^53)
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(w)) + 1
    )
    regs = (
        df.select(F.col(group_col), bucket.alias("_b"), rank.alias("_r"))
        .groupBy(group_col, "_b")
        .agg(F.max("_r").alias("_m"))
    )
    agg = regs.groupBy(group_col).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    return agg.select(
        F.col(group_col), F.round(_hll_estimate(m), 4).alias(out_col)
    )


def _hll_estimate(m: int):
    """Bias-corrected HLL estimator over the aggregated register
    columns ``_s`` (sum of 2^-M) and ``_nb`` (non-empty buckets) —
    shared by the per-group sketch and the set-algebra merges so both
    paths stay expression-identical to the oracle SQL."""
    raw = F.lit(_alpha(m) * m * m) / (F.col("_s") + (F.lit(m) - F.col("_nb")))
    zeros = F.lit(m) - F.col("_nb")
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)


def portable_hll_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    p: int = 9,
    out_col: str = "approx_distinct",
) -> str:
    """DuckDB SQL computing the identical sketch (same hash, same
    integer rank extraction via binary-string length, same estimator)."""
    m = 1 << p
    width = _HASH_BITS - p
    alpha = _alpha(m)
    return f"""
    WITH hashed AS (
      SELECT {group_col},
             ('0x' || SUBSTR(MD5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table}
    ),
    ranked AS (
      SELECT {group_col}, h % {m} AS b,
             CASE WHEN h // {m} = 0 THEN {width + 1}
                  ELSE {width} - LENGTH(FORMAT('{{:b}}', h // {m})) + 1
             END AS r
      FROM hashed
    ),
    regs AS (
      SELECT {group_col}, b, MAX(r) AS mr FROM ranked GROUP BY {group_col}, b
    ),
    agg AS (
      SELECT {group_col}, SUM(POWER(2.0, -mr)) AS s, COUNT(*) AS nb
      FROM regs GROUP BY {group_col}
    )
    SELECT {group_col},
           ROUND(CASE WHEN CAST({alpha * m * m!r} AS DOUBLE) / (s + ({m} - nb)) <= {2.5 * m}
                       AND ({m} - nb) > 0
                 THEN {float(m)} * LN({float(m)} / ({m} - nb))
                 ELSE CAST({alpha * m * m!r} AS DOUBLE) / (s + ({m} - nb))
                 END, 4) AS {out_col}
    FROM agg
    """


def portable_countmin(
    df: DataFrame,
    value_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) from portable
    primitives: row i's hash is the md5 of ``i:value`` reduced mod
    ``width``, so the counter matrix is bit-identical in any engine —
    a DETERMINISTIC approximate structure, hence a hard oracle.

    Returns (row, bucket, cnt) — depth x width counters, built with
    one explode + one hash-aggregate (map-side partial agg; state is
    depth*width counters, independent of input size)."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    keyed = df.select(F.col(value_col).cast("string").alias("_v")).select(
        "_v", rows
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_v"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        keyed.select("row", (h % width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_heavy_hitters(
    df: DataFrame,
    value_col: str,
    width: int = 256,
    depth: int = 4,
    min_estimate: int = 0,
) -> DataFrame:
    """Heavy-hitter estimates: each candidate value's count-min
    estimate is the MIN over its depth counters (one-sided: estimate
    >= true count, inflated only by collisions).  Candidates are the
    distinct values — the scan is one pass; the sketch join is
    depth x |candidates| rows against a broadcast-sized counter
    matrix.  Returns (value, est) filtered to ``min_estimate``."""
    sketch = portable_countmin(df, value_col, width, depth)
    cand = df.select(F.col(value_col).cast("string").alias("value")).distinct()
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    probes = cand.select("value", rows)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("value"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    probes = probes.select("value", "row", (h % width).alias("bucket"))
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left_outer")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
    return est.filter(F.col("est") >= min_estimate)


def bloom_bits(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Build a portable Bloom filter over the distinct keys of ``df``
    as a DataFrame of SET BIT POSITIONS (Bloom 1970).

    Position ``i`` for a key is the 60-bit md5 of ``"{i}:{key}"``
    reduced mod ``m_bits`` — the same portable hash family the HLL /
    count-min sketches use, so any engine reproduces the identical
    filter.  Representing the filter as its distinct set positions
    (instead of a packed bitmap) keeps the build fully relational:
    one explode + one DISTINCT, and the result is at most
    ``min(m_bits, k * |keys|)`` single-int rows — broadcast-sized by
    construction (4096 bits => <= 4096 rows regardless of key count).

    At 100 TB this is the classic runtime join filter: build on the
    small/filtered side, broadcast, and pre-filter the big probe side
    BEFORE its shuffle — rows that fail the membership test never
    enter the exchange.  Spark's AQE injects such filters opportunistically;
    this operator makes the structure explicit, portable, and testable."""
    hashes = F.explode(
        F.array(*[F.lit(i) for i in range(k_hashes)])
    ).alias("_i")
    keyed = df.select(F.col(key_col).cast("string").alias("_k")).select(
        "_k", hashes
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("_i").cast("string"), F.lit(":"), F.col("_k"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return keyed.select((h % m_bits).alias("pos")).distinct()


def bloom_probe(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Tag every probe row with its Bloom membership verdict.

    Each probe key hashes to ``k`` positions; the row passes iff ALL
    ``k`` are set.  The check is a broadcast left join of the probe's
    exploded positions against the bits frame + a count-match — no
    shuffle of the probe side, no UDF.  One-sided error only: a true
    member always passes (no false negatives); a non-member passes
    with probability ~(1-e^(-kn/m))^k."""
    hashes = F.array(*[F.lit(i) for i in range(k_hashes)])
    # Verdicts are per KEY: probe distinct keys only, so the all-k
    # membership count is exactly k for a member regardless of how
    # many probe rows share the key.
    exploded = probe.select(key_col).distinct().select(
        F.col(key_col), F.explode(hashes).alias("_i")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("_i").cast("string"),
                    F.lit(":"),
                    F.col(key_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    probed = exploded.select(F.col(key_col), (h % m_bits).alias("pos"))
    hits = (
        probed.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg((F.count("_set") == k_hashes).alias(out_col))
    )
    return probe.join(F.broadcast(hits), key_col, "left")


def bloom_filter_probe(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Runtime-filter a probe table by a Bloom filter built over the
    build side's keys: returns only probe rows whose key MIGHT be in
    the build set (superset of the exact semi-join, never drops a
    true match).  Follow with the exact join — the filter exists to
    shrink what reaches the shuffle, not to replace the join."""
    bits = bloom_bits(build, build_key, m_bits, k_hashes)
    tagged = bloom_probe(probe, bits, probe_key, m_bits, k_hashes)
    return tagged.filter(F.col("bloom_pass")).drop("bloom_pass")


def bloom_join_audit(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    group_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Audit the Bloom runtime filter against exact membership, per
    ``group_col`` of the probe side: rows scanned, rows passing the
    bloom, rows truly matching, and false positives let through.

    Because the filter is deterministic (portable md5 positions), the
    false-positive count itself is reproducible in any engine — the
    approximate structure carries a hard oracle, like the portable
    HLL/count-min sketches above."""
    bits = bloom_bits(build, build_key, m_bits, k_hashes)
    tagged = bloom_probe(probe, bits, probe_key, m_bits, k_hashes)
    exact = build.select(
        F.col(build_key).cast("long").alias(probe_key)
    ).distinct().withColumn("_true", F.lit(1))
    audited = tagged.join(F.broadcast(exact), probe_key, "left")
    return (
        audited.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("bloom_pass").cast("long")).alias("n_bloom_pass"),
            F.sum(F.coalesce(F.col("_true"), F.lit(0))).alias("n_true_match"),
            F.sum(
                (F.col("bloom_pass").cast("long"))
                * (F.lit(1) - F.coalesce(F.col("_true"), F.lit(0)))
            ).alias("n_false_positive"),
        )
        .orderBy(group_col)
    )


def bloom_join_audit_oracle_sql(
    build_table: str,
    probe_table: str,
    build_key: str,
    probe_key: str,
    group_col: str,
    build_where: str = "TRUE",
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> str:
    """DuckDB SQL computing the identical Bloom filter (same md5
    positions, same all-k membership rule) and the same audit."""
    idx = ", ".join(f"({i})" for i in range(k_hashes))
    return f"""
    WITH keys AS (
      SELECT DISTINCT CAST({build_key} AS VARCHAR) AS k
      FROM {build_table} WHERE {build_where}
    ),
    hseq AS (SELECT * FROM (VALUES {idx}) t(i)),
    bits AS (
      SELECT DISTINCT
        ('0x' || SUBSTR(MD5(CAST(i AS VARCHAR) || ':' || k), 1, 15))::BIGINT
          % {m_bits} AS pos
      FROM keys CROSS JOIN hseq
    ),
    probe_pos AS (
      SELECT p.{probe_key},
        ('0x' || SUBSTR(MD5(CAST(h.i AS VARCHAR) || ':' ||
                        CAST(p.{probe_key} AS VARCHAR)), 1, 15))::BIGINT
          % {m_bits} AS pos
      FROM (SELECT DISTINCT {probe_key} FROM {probe_table}) p
      CROSS JOIN hseq h
    ),
    verdicts AS (
      SELECT pp.{probe_key},
             COUNT(b.pos) = {k_hashes} AS bloom_pass
      FROM probe_pos pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pp.{probe_key}
    ),
    truth AS (
      SELECT DISTINCT {build_key} AS {probe_key}, 1 AS _true
      FROM {build_table} WHERE {build_where}
    )
    SELECT p.{group_col},
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN v.bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(COALESCE(t._true, 0)) AS BIGINT) AS n_true_match,
           CAST(SUM(CASE WHEN v.bloom_pass THEN 1 ELSE 0 END
               * (1 - COALESCE(t._true, 0))) AS BIGINT) AS n_false_positive
    FROM {probe_table} p
    JOIN verdicts v ON v.{probe_key} = p.{probe_key}
    LEFT JOIN truth t ON t.{probe_key} = p.{probe_key}
    GROUP BY p.{group_col}
    ORDER BY p.{group_col}
    """


def countmin_heavy_hitters_oracle_sql(
    table: str,
    value_col: str,
    width: int = 256,
    depth: int = 4,
    min_estimate: int = 0,
) -> str:
    """DuckDB SQL computing the identical count-min estimates (same
    per-row md5 hashes, same min-over-depth), for the hard oracle."""
    rows = ", ".join(f"({i})" for i in range(depth))
    return f"""
    WITH vals AS (
      SELECT CAST({value_col} AS VARCHAR) AS v FROM {table}
    ),
    depths AS (SELECT * FROM (VALUES {rows}) t(row)),
    keyed AS (
      SELECT d.row,
             ('0x' || SUBSTR(MD5(CAST(d.row AS VARCHAR) || ':' || vals.v), 1, 15))::BIGINT
               % {width} AS bucket
      FROM vals CROSS JOIN depths d
    ),
    sketch AS (
      SELECT row, bucket, COUNT(*) AS cnt FROM keyed GROUP BY row, bucket
    ),
    cand AS (SELECT DISTINCT v AS value FROM vals),
    probes AS (
      SELECT c.value, d.row,
             ('0x' || SUBSTR(MD5(CAST(d.row AS VARCHAR) || ':' || c.value), 1, 15))::BIGINT
               % {width} AS bucket
      FROM cand c CROSS JOIN depths d
    )
    SELECT p.value, MIN(COALESCE(s.cnt, 0)) AS est
    FROM probes p LEFT JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
    GROUP BY p.value
    HAVING MIN(COALESCE(s.cnt, 0)) >= {min_estimate}
    """


# ---------------------------------------------------------------------------
# Misra-Gries frequent items: bounded-memory candidates + exact verify.
# ---------------------------------------------------------------------------
def misra_gries_candidates(
    df: DataFrame,
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-partition Misra-Gries summaries (Misra & Gries 1982;
    mergeable form per Agarwal et al. 2013): each partition keeps at
    most ``k`` counters, folding Arrow batches in via the exact
    batch histogram followed by the standard merge step — when the
    table exceeds ``k`` entries, subtract the (k+1)-th largest count
    from every counter and drop the non-positive ones.

    GUARANTEE (what makes ``frequent_items_exact`` hash-exact, not
    approximate): a summary's undercount is at most n_p/(k+1), so any
    value with partition frequency > n_p/(k+1) survives in that
    partition's candidate set.  A global value with frequency
    > N/(k+1) = sum(n_p)/(k+1) must exceed n_p/(k+1) in at least one
    partition, hence always appears in the union of candidates.

    Scale contract vs ``countmin_heavy_hitters``: the count-min path
    enumerates ALL distinct values as probe candidates — itself a
    full shuffle on a 100 TB high-cardinality key.  This path's state
    is k counters per partition and its output is <= k rows per
    partition, no matter the key cardinality; only the candidate
    union (tiny) and one broadcast semi-join touch the cluster.

    The pandas body sees only the value column (Arrow-batched); no
    row-at-a-time Python.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    src = df.select(F.col(value_col).cast("string").alias("value"))
    out_schema = StructType([StructField("value", StringType())])

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for v, c in pdf["value"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # merge step: subtract the (k+1)-th largest count
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - cut for v, c in counters.items() if c > cut}
        yield pd.DataFrame({"value": list(counters.keys())})

    return src.mapInPandas(mg, schema=out_schema)


def frequent_items_exact(
    df: DataFrame,
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """EXACT phi-frequent items (phi = 1/(k+1)) in two passes:
    Misra-Gries candidates (bounded memory, superset of the answer —
    see ``misra_gries_candidates``), then one exact recount restricted
    to the candidates via a broadcast semi-join, filtered with the
    integer-exact predicate ``cnt * (k+1) > N``.

    Returns (value, cnt) — identical to ``GROUP BY ... HAVING
    COUNT(*)*(k+1) > N`` but without ever building the full
    per-distinct-value count table: the second pass aggregates only
    rows whose value is a candidate, of which there are <= k per
    partition of the first pass.

    NULLs are excluded entirely — from the candidates (pandas
    value_counts drops them), from the recount, AND from N — so the
    phi threshold is over non-null rows; a column where NULLs exceed
    N/(k+1) cannot silently diverge from the oracle.
    """
    cand = misra_gries_candidates(df, value_col, k).distinct()
    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("value")
    )
    total = src.count()
    return (
        src.join(F.broadcast(cand), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * (k + 1) > F.lit(total))
    )


def frequent_items_oracle_sql(
    table: str, value_col: str, k: int
) -> str:
    """DuckDB oracle: the candidate pass is provably a superset, so
    the exact answer is plain GROUP BY / HAVING with the same
    integer-arithmetic threshold (no float division either side)."""
    return f"""
    WITH n AS (
      SELECT COUNT(*) AS total FROM {table} WHERE {value_col} IS NOT NULL
    )
    SELECT CAST({value_col} AS VARCHAR) AS value, COUNT(*) AS cnt
    FROM {table}, n
    WHERE {value_col} IS NOT NULL
    GROUP BY CAST({value_col} AS VARCHAR), n.total
    HAVING COUNT(*) * {k + 1} > n.total
    """


def portable_hll_set_algebra(
    df: DataFrame,
    label_col: str,
    value_col: str,
    label_a: str,
    label_b: str,
    p: int = 9,
) -> DataFrame:
    """HLL sketch SET ALGEBRA — the mergeability that makes sketches a
    100 TB primitive: two cohorts' register vectors union by per-bucket
    MAX (never re-reading the data), and the intersection follows by
    inclusion-exclusion over the three estimates.

    Returns ONE row: (approx_a, approx_b, approx_union,
    approx_intersection) for the cohorts ``label_col == label_a`` /
    ``label_b`` over ``value_col``.  Same portable md5 hash / integer
    rank / estimator as ``portable_hll_distinct``, so every number —
    including the merged ones — carries a hard DuckDB oracle.  State
    is 3 x 2^p registers regardless of input size; the union merge is
    a register-frame aggregation, not a data pass.
    """
    m = 1 << p
    width = _HASH_BITS - p
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(w)) + 1
    )
    tagged = (
        df.filter(F.col(label_col).isin(label_a, label_b))
        .select(
            F.when(F.col(label_col) == label_a, F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("_set"),
            (h % m).alias("_b"),
            rank.alias("_r"),
        )
    )
    # <= 2*m register rows, but consumed by BOTH the union merge and
    # the per-set estimate — un-materialized, the full data scan runs
    # twice; checkpointing keeps it one pass + register-frame algebra
    per_set = (
        tagged.groupBy("_set", "_b")
        .agg(F.max("_r").alias("_m"))
        .transform(materialize)
    )
    union = (
        per_set.groupBy("_b")
        .agg(F.max("_m").alias("_m"))
        .select(F.lit("union").alias("_set"), "_b", "_m")
    )
    est = (
        per_set.unionByName(union)
        .groupBy("_set")
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_s"),
            F.count(F.lit(1)).alias("_nb"),
        )
        .select("_set", F.round(_hll_estimate(m), 4).alias("_e"))
    )
    wide = est.groupBy().agg(
        F.sum(F.when(F.col("_set") == "a", F.col("_e"))).alias("approx_a"),
        F.sum(F.when(F.col("_set") == "b", F.col("_e"))).alias("approx_b"),
        F.sum(F.when(F.col("_set") == "union", F.col("_e"))).alias("approx_union"),
    )
    return wide.select(
        "approx_a",
        "approx_b",
        "approx_union",
        F.round(
            F.col("approx_a") + F.col("approx_b") - F.col("approx_union"), 4
        ).alias("approx_intersection"),
    )


def portable_hll_set_algebra_oracle_sql(
    table: str,
    label_col: str,
    value_col: str,
    label_a: str,
    label_b: str,
    p: int = 9,
) -> str:
    """DuckDB twin of ``portable_hll_set_algebra`` — identical hash,
    rank, register-MAX union merge, estimator, and rounding."""
    m = 1 << p
    width = _HASH_BITS - p
    alpha = _alpha(m)
    est = (
        f"ROUND(CASE WHEN CAST({alpha * m * m!r} AS DOUBLE) / (s + ({m} - nb)) <= {2.5 * m} "
        f"AND ({m} - nb) > 0 "
        f"THEN {float(m)} * LN({float(m)} / ({m} - nb)) "
        f"ELSE CAST({alpha * m * m!r} AS DOUBLE) / (s + ({m} - nb)) END, 4)"
    )
    return f"""
    WITH tagged AS (
      SELECT CASE WHEN {label_col} = '{label_a}' THEN 'a' ELSE 'b' END AS st,
             ('0x' || SUBSTR(MD5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table} WHERE {label_col} IN ('{label_a}', '{label_b}')
    ),
    ranked AS (
      SELECT st, h % {m} AS b,
             CASE WHEN h // {m} = 0 THEN {width + 1}
                  ELSE {width} - LENGTH(FORMAT('{{:b}}', h // {m})) + 1
             END AS r
      FROM tagged
    ),
    per_set AS (SELECT st, b, MAX(r) AS mr FROM ranked GROUP BY st, b),
    unioned AS (
      SELECT st, b, mr FROM per_set
      UNION ALL
      SELECT 'union' AS st, b, MAX(mr) AS mr FROM per_set GROUP BY b
    ),
    agg AS (
      SELECT st, SUM(POWER(2.0, -mr)) AS s, COUNT(*) AS nb
      FROM unioned GROUP BY st
    ),
    est AS (SELECT st, {est} AS e FROM agg),
    wide AS (
      SELECT SUM(CASE WHEN st = 'a' THEN e END) AS approx_a,
             SUM(CASE WHEN st = 'b' THEN e END) AS approx_b,
             SUM(CASE WHEN st = 'union' THEN e END) AS approx_union
      FROM est
    )
    SELECT approx_a, approx_b, approx_union,
           ROUND(approx_a + approx_b - approx_union, 4) AS approx_intersection
    FROM wide
    """


def log2_histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Mergeable quantile SKETCH (the DDSketch idea with an
    INTEGER-EXACT bucket function, so it is hash-checkable): values
    scale to ints (``round(x*scale)``), each positive int buckets by
    (bit length, top ``sub_bits`` mantissa bits) — a log2 histogram
    with 2^sub_bits sub-buckets per octave, guaranteeing relative
    error <= 2^(1/2^sub_bits)-1 (~9% at sub_bits=3) for any quantile.

    Unlike exact percentile_disc (a per-group sort) this is ONE
    hash-aggregation over the data into a bounded register frame
    (<= 64 * 2^sub_bits buckets), buckets merge by addition across
    partitions/days/shards, and quantile extraction is a window over
    the tiny bucket frame — the 100 TB shape for latency/size
    percentile monitoring.  Zero/negative values clamp into bucket 0
    (count-only; the estimate floor is 1/scale).

    The bucket function is pure integer arithmetic (bit length via
    BIN-string length, shift, mask) — bit-identical in any engine, no
    libm in the bucketing path (floor(log(x)/log(gamma)) flips on
    last-ulp LN differences across engines; this formulation cannot).

    Returns one row per requested quantile: (quantile, n_values,
    bucket_id, estimate) where estimate is the bucket's geometric
    lower bound divided back by ``scale``.
    """
    from pyspark.sql.window import Window

    m = 1 << sub_bits
    scaled = df.select(
        F.greatest(
            F.round(F.col(value_col).cast("double") * scale).cast("long"),
            F.lit(0).cast("long"),
        ).alias("_v")
    )
    # small values (< 2^sub_bits) get EXACT singleton buckets (= v);
    # larger values bucket by (octave, top sub_bits mantissa bits).
    # expr() because the shift amount is itself a column (the Python
    # F.shiftright helper only takes a literal offset).
    bucketed = scaled.select(
        F.expr(
            f"CASE WHEN _v <= 0 THEN CAST(0 AS BIGINT) "
            f"WHEN length(bin(_v)) <= {sub_bits} THEN _v "
            f"ELSE CAST((length(bin(_v)) - 1) * {m} AS BIGINT) "
            f"     + shiftright(_v, length(bin(_v)) - {sub_bits} - 1) "
            f"     - {m} + 1 END"
        ).alias("bucket_id")
    )
    hist = bucketed.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "bucket_id",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_values"),
    )
    # invert the bucket function: lower bound of bucket b>0 is
    # 2^(octave) * (1 + sub/2^sub_bits) at octave=(b-1)>>sub_bits ...
    # for small buckets (v <= 2^sub_bits) the bucket IS the value.
    b0 = F.col("bucket_id") - 1
    octave = F.floor(b0 / (1 << sub_bits))
    subv = b0 % (1 << sub_bits)
    small = F.col("bucket_id") <= (1 << sub_bits)
    lower = F.when(F.col("bucket_id") == 0, F.lit(0.0)).otherwise(
        F.when(small, F.col("bucket_id").cast("double")).otherwise(
            F.pow(F.lit(2.0), octave)
            * (F.lit(1.0) + subv / F.lit(float(1 << sub_bits)))
        )
    )
    parts = []
    for q in quantiles:
        parts.append(
            cum.filter(
                F.col("cum") * 1_000_000
                >= F.lit(int(round(q * 1_000_000))) * F.col("n_values")
            )
            .orderBy("bucket_id")
            .limit(1)
            .select(
                F.lit(q).alias("quantile"),
                "n_values",
                "bucket_id",
                F.round(lower / scale, 9).alias("estimate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def log2_histogram_oracle_sql(
    table: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    sub_bits: int = 3,
    scale: int = 100,
    where: str = "TRUE",
) -> str:
    """DuckDB twin: the same integer bucket function via BIT_LENGTH-
    style arithmetic (LENGTH(BIN(v))), shift, mask — no libm."""
    m = 1 << sub_bits
    qsel = " UNION ALL ".join(
        f"""
    (SELECT CAST({q} AS DOUBLE) AS quantile, n_values, bucket_id, estimate
    FROM est
    WHERE cum * 1000000 >= {int(round(q * 1_000_000))} * n_values
    ORDER BY bucket_id LIMIT 1)""".strip()
        for q in quantiles
    )
    return f"""
    WITH vals AS (
      SELECT GREATEST(CAST(ROUND(CAST({value_col} AS DOUBLE) * {scale})
                      AS BIGINT), 0) AS v
      FROM {table} WHERE {where}
    ),
    bucketed AS (
      SELECT CASE WHEN v <= 0 THEN 0
                  WHEN LENGTH(BIN(v)) <= {sub_bits} THEN v
                  ELSE (LENGTH(BIN(v)) - 1) * {m}
                       + (v >> (LENGTH(BIN(v)) - {sub_bits} - 1)) - {m}
                       + 1 END AS bucket_id
      FROM vals
    ),
    hist AS (SELECT bucket_id, COUNT(*) AS cnt FROM bucketed GROUP BY 1),
    cum AS (
      SELECT bucket_id, cnt,
             SUM(cnt) OVER (ORDER BY bucket_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n_values
      FROM hist
    ),
    est AS (
      SELECT bucket_id, cnt, cum,
             CAST(n_values AS BIGINT) AS n_values,
             ROUND(CASE WHEN bucket_id = 0 THEN 0.0
                   WHEN bucket_id <= {m} THEN CAST(bucket_id AS DOUBLE)
                   ELSE POW(2.0, FLOOR((bucket_id - 1) / {m}.0))
                        * (1.0 + ((bucket_id - 1) % {m}) / {m}.0)
                   END / {scale}, 9) AS estimate
      FROM cum
    )
    {qsel}
    """
