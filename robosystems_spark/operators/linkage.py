"""Record linkage: blocked fuzzy matching over entity name columns.

The entity-resolution primitive (Fellegi-Sunter blocking + edit
distance): find name pairs that likely refer to the same real-world
entity.  The reference models entities relationally (schema/base.py
Entity/Element identity); this adds the fuzzy-identity operator a
large-scale ingest pipeline needs when keys don't line up.

Spark-first shape: names are DISTINCT'd before any pairing (records
sharing a name collapse to one node — the classic blow-up when a
popular name appears 10^4 times), blocked by a cheap key (last name
token), and block-capped by an md5 modulo sub-split so no block goes
quadratic — the same discipline as the Jaccard block cap and the LSH
bucket cap.  Levenshtein runs JVM-side (whole-stage codegen), never
in Python.

PORTABILITY: md5-derived sub-split constants and integer edit
distances — exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from robosystems_spark.checkpointing import materialize


def _sub_key(col: str, n_sub_col: str):
    """Engine-portable hash bucket: md5 hex prefix -> int, mod n_sub."""
    return F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast(
        "long"
    ) % F.col(n_sub_col)


def fuzzy_name_matches(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 2,
    block_cap: int = 256,
) -> DataFrame:
    """Distinct-name fuzzy pairs: (name_a, name_b, distance,
    n_records_a, n_records_b), blocked by the last name token, pairs
    ordered name_a < name_b, edit distance <= ``max_dist``.

    ``n_records_*`` carry how many input records each matched name
    represents, so consumers can weigh a merge decision.
    """
    names = (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .withColumn(
            "blk", F.element_at(F.split(F.col("name"), " "), -1)
        )
    )
    sizes = names.groupBy("blk").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(block_cap))
        .cast("long")
        .alias("n_sub")
    )
    names = names.join(F.broadcast(sizes), "blk").withColumn(
        "sub", _sub_key("name", "n_sub")
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .filter(dist <= max_dist)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.alias("distance"),
            F.col("a.n_records").alias("n_records_a"),
            F.col("b.n_records").alias("n_records_b"),
        )
    )


def fuzzy_name_oracle_sql(
    table: str,
    name_col: str,
    max_dist: int = 2,
    block_cap: int = 256,
) -> str:
    """DuckDB SQL computing the identical blocked fuzzy-match table."""
    return f"""
    WITH names AS MATERIALIZED (
      SELECT {name_col} AS name, COUNT(*) AS n_records,
             STRING_SPLIT({name_col}, ' ')[-1] AS blk
      FROM {table} GROUP BY {name_col}
    ),
    sizes AS (
      SELECT blk, CAST(CEIL(COUNT(*) / {block_cap}.0) AS BIGINT) AS n_sub
      FROM names GROUP BY blk
    ),
    sub AS MATERIALIZED (
      SELECT n.*,
             ('0x' || SUBSTR(MD5(n.name), 1, 15))::BIGINT % s.n_sub AS sub
      FROM names n JOIN sizes s USING (blk)
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS distance,
           a.n_records AS n_records_a, b.n_records AS n_records_b
    FROM sub a JOIN sub b
      ON a.blk = b.blk AND a.sub = b.sub AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {max_dist}
    """


def entity_clusters(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block_cap: int = 256,
) -> DataFrame:
    """Full entity-resolution pipeline: blocked fuzzy matching →
    transitive closure → canonical entities.  Names linked by any
    chain of <=``max_dist`` edits collapse into one cluster whose
    canonical name is the lexicographically smallest member (a
    deterministic, engine-portable representative).

    Returns (canonical_name, n_names, total_records) per multi-name
    entity — the merge worklist an ingest pipeline acts on.

    Composition of two scale-safe primitives: the capped-block fuzzy
    matcher (never quadratic in a block) and min-label connected
    components (O(diameter) rounds over the match edges, which are
    tiny relative to the corpus).
    """
    from robosystems_spark.operators.graph import connected_components

    pairs = fuzzy_name_matches(df, name_col, name_col, max_dist, block_cap)
    comp = connected_components(pairs, "name_a", "name_b")
    # distinct-name-sized; consumed by the blocked pair generation AND
    # the final rollup join — materialize once, not two source scans
    names = (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .transform(materialize)
    )
    return (
        comp.join(names, comp.node == names.name)
        .groupBy(F.col("component").alias("canonical_name"))
        .agg(
            F.count(F.lit(1)).alias("n_names"),
            F.sum("n_records").alias("total_records"),
        )
    )


def entity_clusters_oracle_sql(
    table: str,
    name_col: str,
    max_dist: int = 2,
    block_cap: int = 256,
) -> str:
    """DuckDB twin: identical fuzzy pairs, then a recursive min-label
    fixpoint and the same canonical rollup."""
    return f"""
    WITH RECURSIVE names AS MATERIALIZED (
      SELECT {name_col} AS name, COUNT(*) AS n_records,
             STRING_SPLIT({name_col}, ' ')[-1] AS blk
      FROM {table} GROUP BY {name_col}
    ),
    sizes AS (
      SELECT blk, CAST(CEIL(COUNT(*) / {block_cap}.0) AS BIGINT) AS n_sub
      FROM names GROUP BY blk
    ),
    sub AS MATERIALIZED (
      SELECT n.*,
             ('0x' || SUBSTR(MD5(n.name), 1, 15))::BIGINT % s.n_sub AS sub
      FROM names n JOIN sizes s USING (blk)
    ),
    pairs AS MATERIALIZED (
      SELECT a.name AS name_a, b.name AS name_b
      FROM sub a JOIN sub b
        ON a.blk = b.blk AND a.sub = b.sub AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= {max_dist}
    ),
    edges AS (
      SELECT name_a AS a, name_b AS b FROM pairs
      UNION ALL
      SELECT name_b AS a, name_a AS b FROM pairs
    ),
    reach AS (
      SELECT DISTINCT a AS node, a AS lbl FROM edges
      UNION
      SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, MIN(lbl) AS canonical_name FROM reach GROUP BY node)
    SELECT c.canonical_name,
           COUNT(*) AS n_names,
           CAST(SUM(n.n_records) AS BIGINT) AS total_records
    FROM comp c JOIN names n ON n.name = c.node
    GROUP BY c.canonical_name
    """
