"""Portable HLL sketch: accuracy, invariance, estimator regimes.

(The cross-engine hash gate runs via test_oracle_inventory on the
``approx_distinct_portable_hll`` registry entry.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from robosystems_spark.operators.sketches import portable_hll_distinct


def test_accuracy_within_hll_error_bounds(spark, sf_dir):
    """p=9 gives ~4.6% standard error; allow 4 sigma plus small-n slack."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    est = {
        r["p_brand"]: r["approx_distinct"]
        for r in portable_hll_distinct(part, "p_brand", "p_partkey").collect()
    }
    exact = {
        r["p_brand"]: r["n"]
        for r in part.groupBy("p_brand")
        .agg(F.countDistinct("p_partkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for brand, n in exact.items():
        assert abs(est[brand] - n) <= max(0.2 * n, 3), (
            f"{brand}: est {est[brand]} vs exact {n}"
        )


def test_partitioning_invariance(spark, sf_dir):
    """max-rank registers merge associatively — layout can't change
    the estimate (the property that lets the sketch distribute)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    a = sorted(
        tuple(r) for r in portable_hll_distinct(part, "p_brand", "p_partkey").collect()
    )
    b = sorted(
        tuple(r)
        for r in portable_hll_distinct(
            part.repartition(17), "p_brand", "p_partkey"
        ).collect()
    )
    assert a == b


def test_large_cardinality_leaves_linear_counting(spark):
    """A group with cardinality >> m must use the raw HLL estimator
    (every bucket hit) and still land near the truth."""
    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    est = portable_hll_distinct(df, "g", "v", p=9).first()["approx_distinct"]
    assert abs(est - n) / n < 0.15


def test_duplicates_do_not_inflate(spark):
    df = spark.createDataFrame(
        [("g", "x")] * 500 + [("g", "y")] * 300, ["g", "v"]
    )
    est = portable_hll_distinct(df, "g", "v").first()["approx_distinct"]
    assert 1.5 <= est <= 2.5


def test_countmin_estimates_are_one_sided_and_tight_when_wide(spark):
    """CMS guarantee: estimate >= true count always; with width >>
    distinct values, collisions vanish and estimates are exact."""
    from robosystems_spark.operators.sketches import countmin_heavy_hitters

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5
    df = spark.createDataFrame(rows, "v string")
    wide = {
        r["value"]: r["est"]
        for r in countmin_heavy_hitters(df, "v", width=512, depth=4).collect()
    }
    assert wide == {"a": 50, "b": 30, "c": 5}
    narrow = {
        r["value"]: r["est"]
        for r in countmin_heavy_hitters(df, "v", width=2, depth=2).collect()
    }
    assert narrow["a"] >= 50 and narrow["b"] >= 30 and narrow["c"] >= 5


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    """Bloom contract: every true member passes — the runtime filter
    may only ADD rows (false positives) relative to the exact
    semi-join, never drop one."""
    from robosystems_spark.operators.sketches import bloom_filter_probe

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pruned_keys = {
        r["o_custkey"]
        for r in bloom_filter_probe(
            cust, orders, "c_custkey", "o_custkey", m_bits=1024, k_hashes=3
        )
        .select("o_custkey")
        .distinct()
        .collect()
    }
    exact_keys = {
        r["o_custkey"]
        for r in orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_semi"
        )
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert exact_keys <= pruned_keys  # superset: no false negatives
    # and it actually prunes: far fewer keys than the full probe side
    all_keys = orders.select("o_custkey").distinct().count()
    assert len(pruned_keys) < all_keys


def test_bloom_bits_bounded_and_broadcast(spark, sf_dir):
    """The filter representation is <= m_bits rows no matter how many
    build keys, and the probe-side membership join broadcasts it —
    the probe side never shuffles for the filter."""
    from robosystems_spark.operators.sketches import bloom_bits, bloom_probe

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bits = bloom_bits(cust, "c_custkey", m_bits=256, k_hashes=4)
    assert bits.count() <= 256
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    tagged = bloom_probe(orders, bits, "o_custkey", m_bits=256, k_hashes=4)
    plan = tagged._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan


def test_native_hll_relative_error_bound_per_group(spark):
    """approx_distinct_parts_per_brand is the one rows-only registry
    entry (native HLL++ can't hash-match across engines) — give it a
    QUANTITATIVE gate instead: per-brand relative error vs the exact
    distinct count must stay within 5x the configured rsd=0.01 (HLL++
    at that precision is well inside this at sf0.01 cardinalities)."""
    from robosystems_spark.inventory import REGISTRY, _ensure_loaded
    from robosystems_spark.io import read_table

    _ensure_loaded()
    sf_dir = "/root/testdata/sf0.01"
    approx = {
        r["p_brand"]: r["approx_parts"]
        for r in REGISTRY["approx_distinct_parts_per_brand"].fn(spark, sf_dir).collect()
    }
    from pyspark.sql import functions as F

    exact = {
        r["p_brand"]: r["exact"]
        for r in read_table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.countDistinct("p_partkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) > 0
    for brand, e in exact.items():
        rel = abs(approx[brand] - e) / max(e, 1)
        assert rel <= 0.05, f"{brand}: approx={approx[brand]} exact={e} rel={rel:.4f}"


def test_misra_gries_candidates_superset_under_any_partitioning(spark):
    """The MG candidate pass must contain every true phi-frequent item
    regardless of how rows are partitioned — that superset property is
    what makes frequent_items_exact's output partitioning-independent
    (and therefore hash-checkable).  Skewed synthetic stream: value
    'hot' = 40% of rows, 'warm' = 20%, tail uniform over 200 keys."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators.sketches import (
        frequent_items_exact,
        misra_gries_candidates,
    )

    n = 4000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 4, F.lit("hot"))
        .when(F.col("id") % 10 < 6, F.lit("warm"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 200).cast("string")))
        .alias("v")
    )
    k = 9  # phi = 1/10: hot (40%) and warm (20%) qualify, tail (~0.2%) never
    for parts in (1, 7, 32):
        cand = {
            r["value"]
            for r in misra_gries_candidates(df.repartition(parts), "v", k=k).collect()
        }
        assert {"hot", "warm"} <= cand
        exact = {
            r["value"]: r["cnt"]
            for r in frequent_items_exact(df.repartition(parts), "v", k=k).collect()
        }
        assert set(exact) == {"hot", "warm"}
        assert exact["hot"] == 1600 and exact["warm"] == 800


def test_misra_gries_candidate_count_is_bounded(spark):
    """State contract: each partition emits at most k candidate rows,
    independent of key cardinality (the reason this path beats the
    count-min distinct-enumeration at 100 TB)."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators.sketches import misra_gries_candidates

    df = spark.range(5000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("v")
    ).repartition(4)
    out = misra_gries_candidates(df, "v", k=16)
    assert out.count() <= 4 * 16


def test_hll_set_algebra_tracks_exact_set_sizes(spark):
    """The merged estimates must track the true cohort set sizes: at
    p=9 (rsd ~4.6%) every estimate — including the union merge and the
    inclusion-exclusion intersection — stays within 10% of exact on
    the sf0.01 cohorts (clickers/viewers are ~150-user sets with heavy
    overlap, the adversarial case for inclusion-exclusion)."""
    from pyspark.sql import functions as F

    from robosystems_spark.operators.sketches import portable_hll_set_algebra

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = portable_hll_set_algebra(
        ev, "event_type", "user_id", "click", "view", p=9
    ).collect()[0]
    a = {r["user_id"] for r in ev.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    b = {r["user_id"] for r in ev.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    exact = {
        "approx_a": len(a),
        "approx_b": len(b),
        "approx_union": len(a | b),
        "approx_intersection": len(a & b),
    }
    for col, e in exact.items():
        rel = abs(got[col] - e) / max(e, 1)
        assert rel <= 0.10, f"{col}: est={got[col]} exact={e} rel={rel:.3f}"


def test_log2_histogram_quantiles_accuracy_and_merge(spark, sf_dir):
    """The log2 histogram sketch must stay within its theoretical
    relative-error bound (2^(1/8)-1 ~ 9.05% at sub_bits=3) against
    exact quantiles, and its registers must MERGE: sketching two
    halves and summing bucket counts gives the identical histogram to
    sketching the whole."""
    from pyspark.sql import functions as F

    from robosystems_spark.io import read_table
    from robosystems_spark.operators.sketches import log2_histogram_quantiles

    ev = read_table(spark, sf_dir, "events")
    out = {r["quantile"]: r["estimate"] for r in
           log2_histogram_quantiles(ev, "value").collect()}
    exact = ev.select(
        F.expr("percentile(greatest(value, 0), array(0.5, 0.9, 0.99))").alias("p")
    ).collect()[0]["p"]
    bound = 2 ** (1 / 8) - 1 + 1e-9
    for q, true in zip([0.5, 0.9, 0.99], exact):
        est = out[q]
        assert abs(est - true) / max(true, 1e-9) <= bound + 0.005, (q, est, true)

    # mergeability: bucket histograms add
    lo = ev.filter(F.col("event_id") % 2 == 0)
    hi = ev.filter(F.col("event_id") % 2 == 1)

    def hist(df):
        from robosystems_spark.operators.sketches import (
            log2_histogram_quantiles as s,
        )
        # reuse the operator's bucketing by grabbing its internal
        # histogram through the public API at quantile 1.0 is awkward;
        # instead recompute buckets with the same expression
        scaled = df.select(
            F.greatest(
                F.round(F.col("value").cast("double") * 100).cast("long"),
                F.lit(0).cast("long"),
            ).alias("_v")
        )
        b = scaled.select(F.expr(
            "CASE WHEN _v <= 0 THEN CAST(0 AS BIGINT) "
            "WHEN length(bin(_v)) <= 3 THEN _v "
            "ELSE CAST((length(bin(_v)) - 1) * 8 AS BIGINT) "
            "  + shiftright(_v, length(bin(_v)) - 4) - 8 + 1 END").alias("bucket_id"))
        return {r["bucket_id"]: r["n"] for r in
                b.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("n")).collect()}

    hall, hlo, hhi = hist(ev), hist(lo), hist(hi)
    merged = {k: hlo.get(k, 0) + hhi.get(k, 0) for k in set(hlo) | set(hhi)}
    assert merged == hall
