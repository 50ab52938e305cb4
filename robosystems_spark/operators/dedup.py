"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
- Exact dedup is a hash-groupBy on a fingerprint column — one shuffle
  keyed by a uniformly-distributed hash (no skew by construction).
- Near-dup never compares all pairs: MinHash/SimHash use LSH banding so
  the only shuffle is groupBy(band-bucket), and candidate verification
  touches |candidate pairs|, not |n^2|.
- Everything is column expressions (xxhash64, array transforms) —
  whole-stage codegen, no Python UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from robosystems_spark.operators.text import tokens

# pandas/numpy MUST be module-level imports here: under
# ``from __future__ import annotations`` the ``pd.Series`` hints on
# pandas_udf functions are strings that infer_eval_type resolves
# against module globals — a function-local import makes them
# unresolvable (UNSUPPORTED_SIGNATURE).  Likewise returnTypes must be
# DataType objects, not DDL strings (string parsing needs a live
# SparkContext).  tests/test_sessionless_import.py pins both.


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate groups by normalized-content hash.

    Returns one row per distinct content: (fingerprint, n_docs,
    keep_doc_id = min id).  The staging-ingest dedup idiom
    (/root/reference/robosystems/graph_api/core/duckdb/manager.py:112-135)
    as a distributed hash-groupBy.
    """
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.select(F.col(id_col), F.md5(normalized.cast("binary")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_doc_id"))
    )


def shingles(text_col: str = "text", k: int = 5):
    """k-token shingle array (contiguous token windows joined by space).

    Tokenization happens ONCE via a named lambda binding; putting
    ``split(...)`` inside the transform lambda re-tokenizes the
    document per shingle position (O(tokens^2)) — measured ~5x slower
    on the sf0.1 corpus.
    """
    toks = tokens(text_col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )


def shingles_of(toks_col: str, k: int = 5):
    """Shingles from an already-materialized token-array column —
    guarantees single tokenization (see ``shingles`` perf note)."""
    toks = F.col(toks_col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )


def distinct_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
) -> DataFrame:
    """(id, _sh = distinct shingle array) — the shared input of both
    the signature pipeline and the exact-Jaccard verify, so the corpus
    is tokenized/shingled exactly once per near-dup run."""
    return df.select(F.col(id_col), tokens(text_col).alias("_toks")).select(
        F.col(id_col),
        F.array_distinct(shingles_of("_toks", shingle_k)).alias("_sh"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes``
    seeded xxhash64 permutations, the minimum hash over the shingle set.

    xxhash64(seed, shingle) is JVM-side and deterministic, so
    signatures are reproducible across executors and runs (the
    distributed-determinism requirement SURVEY §7 flags for IDs).
    Classic permutation scheme: each distinct shingle is hashed ONCE
    (xxhash64), then the i-th permutation is a rotate-XOR bijection
    ``rot(h, r_i) ^ b_i`` — bitwise ops only (no ANSI overflow, stays
    in whole-stage codegen) and 64 cheap transforms per shingle
    instead of 64 full string hashes.  Constants are literals (a
    dynamic nested-lambda variant measured ~20x slower).
    """
    base = (
        shingles_df
        if shingles_df is not None
        else distinct_shingles(df, text_col, id_col, shingle_k)
    )
    # explode -> plain projections + min aggregates: the whole pipeline
    # stays in whole-stage codegen with map-side partial mins, and the
    # plan compiles in ms (an earlier 64x nested-lambda formulation
    # spent ~4s per query in driver-side analysis alone)
    exploded = base.select(
        F.col(id_col), F.explode("_sh").alias("_s")
    ).withColumn("_h", F.xxhash64("_s"))

    def perm(seed: int):
        r = (seed * 7 + 13) % 63 + 1
        b = (seed * 0x9E3779B97F4A7C15 + 0xC2B2AE3D27D4EB4F) % 2**63
        rotated = F.shiftleft("_h", r).bitwiseOR(F.shiftrightunsigned("_h", 64 - r))
        return rotated.bitwiseXOR(F.lit(b).cast("long"))

    agg = exploded.groupBy(id_col).agg(
        *[F.min(perm(seed)).alias(f"_m{seed}") for seed in range(num_hashes)]
    )
    sig = F.array(*[F.col(f"_m{seed}") for seed in range(num_hashes)]).alias("signature")
    return agg.select(id_col, sig)


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: documents sharing any band-hash become candidate
    pairs.  Shuffle is groupBy(band, band_hash) — O(n·bands), never n².
    Returns distinct (doc_a, doc_b) with doc_a < doc_b.
    """
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b), F.expr(f"slice(signature, {b * rows_per_band + 1}, {rows_per_band})")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # localCheckpoint (not persist): the self-join would otherwise
    # recompute the full shingle->signature->band pipeline for BOTH
    # sides; unlike persist(), checkpointed partitions are reclaimed by
    # the ContextCleaner once this frame is unreferenced, so repeated
    # pipeline runs in a long-lived session don't leak executor memory
    banded = banded.localCheckpoint(eager=True)
    left = banded.alias("l")
    right = banded.alias("r")
    out = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b"))
        .dropDuplicates()
    )
    return out


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 5,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only.

    Pass ``shingles_df`` (an already-materialized ``distinct_shingles``
    frame) to skip re-tokenizing; otherwise one is built and
    localCheckpoint'ed here (GC-reclaimable, unlike persist())."""
    sh = (
        shingles_df
        if shingles_df is not None
        else distinct_shingles(df, text_col, id_col, shingle_k).localCheckpoint(
            eager=True
        )
    )
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("_sh").alias("sh_b"))
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle → signature → band →
    bucket-join → exact-Jaccard verify.

    The distinct-shingle frame is materialized ONCE (localCheckpoint)
    and shared by the signature pipeline and the verify join — the
    corpus is tokenized/shingled a single time."""
    sh = distinct_shingles(df, text_col, id_col, shingle_k).localCheckpoint(eager=True)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, shingles_df=sh)
    cands = minhash_lsh_candidates(sigs, id_col, bands, num_hashes // bands)
    return jaccard_verify(
        df, cands, text_col, id_col, threshold, shingle_k, shingles_df=sh
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document via bit-voting over token hashes.

    Explode + 64 conditional-sum aggregates + bit packing: every step
    is a plain codegen'd projection/aggregate with map-side combine.
    (The folklore nested ``aggregate(zip_with(...))`` formulation runs
    on the interpreted expression path — measured 60x slower.)
    """
    from functools import reduce

    exploded = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{b}")
            for b in range(64)
        ]
    )
    bits = [
        F.when(F.col(f"_b{b}") > 0, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    packed = reduce(lambda a, b: a.bitwiseOR(b), bits)
    return votes.select(id_col, packed.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup: candidates via 16-bit chunk banding (any pair
    within hamming distance 3 of a 64-bit hash shares at least one of
    four 16-bit chunks), verified with popcount(xor)."""
    hashed = simhash(df, text_col, id_col)
    banded = hashed.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.expr(f"shiftright(simhash, {16 * c}) & 65535L")
                    for c in range(4)
                ]
            )
        ).alias("chunk", "chunk_val"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cands.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_band_assignments(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_bands: int = 4,
    planes_per_band: int = 6,
    seed: int = 42,
    bucket_cap: int = 1024,
) -> DataFrame | None:
    """(id, vec, _band, _sig, _sub) — each vector's banded hyperplane
    signatures with the skew sub-split applied; the candidate-bucket
    frame ``embedding_near_duplicates`` self-joins (exposed so tests
    can assert bucket-size bounds mechanically).  None for an empty
    corpus."""
    from pyspark.sql.types import ArrayType, LongType

    rng = np.random.default_rng(seed)
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return None
    dim = first["d"]
    planes = rng.standard_normal((num_bands * planes_per_band, dim))
    weights = 1 << np.arange(planes_per_band, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _band_sigs(a: pd.Series) -> pd.Series:
        A = np.array(a.tolist(), dtype=np.float64)
        bits = (A @ planes.T) > 0  # (batch, bands*planes_per_band)
        sigs = bits.reshape(len(A), num_bands, planes_per_band) @ weights
        return pd.Series(list(sigs))

    from pyspark.sql.window import Window

    exploded = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(_band_sigs(vec_col)).alias("_band", "_sig"),
    )
    # HARD cap via rank-based sub-split: members of an oversized
    # (band, sig) bucket are ordered by a band-salted hash and cut into
    # groups of exactly <= bucket_cap (a modulo split only bounds the
    # EXPECTED group size; its tail exceeds the cap).  The band salt
    # re-deals the grouping per band, so a pair cut apart in one band
    # can still co-locate in another.  One shuffle: the window
    # partition — the same key the bucket join needs anyway.
    w = Window.partitionBy("_band", "_sig").orderBy(
        F.xxhash64(F.col("_band"), F.col(id_col)), F.col(id_col)
    )
    return exploded.withColumn(
        "_sub", F.floor((F.row_number().over(w) - F.lit(1)) / bucket_cap)
    )


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_bands: int = 4,
    planes_per_band: int = 6,
    seed: int = 42,
    bucket_cap: int = 1024,
) -> DataFrame:
    """Embedding near-dup via BANDED random-hyperplane LSH + cosine
    verify (OR-of-ANDs, like MinHash bands): each vector gets
    ``num_bands`` independent sign signatures of ``planes_per_band``
    hyperplanes, and a pair is a candidate if it collides in ANY band —
    clustered corpora (the common near-dup case) that would pile into
    one bucket of a single wide signature instead get ``num_bands``
    independent chances at small buckets.

    Skew guard: a (band, signature) bucket larger than ``bucket_cap``
    is rank-split (band-salted hash order) into groups of AT MOST
    ``bucket_cap``, a hard bound on per-bucket self-join work (O(cap²))
    even when every vector is near-identical; a pair cut apart in one
    band can still co-locate in another (the salt re-deals per band),
    and the transitive clustering consumer (operators/graph.py)
    recovers clone sets from the surviving edges.  Same discipline as
    the Jaccard block cap (inventory/llm.py), with a hard rather than
    expected bound.

    The signature is ONE Arrow-batched (batch, dim) @ (dim, planes)
    matmul per batch; the verify a fused batched cosine
    (``functions/vector.py``).  Shuffles: the bucket-size groupBy and
    the banded self-join — both O(n·bands), never n².
    """
    from robosystems_spark.functions import vector as V

    side = embedding_band_assignments(
        df, vec_col, id_col, num_bands, planes_per_band, seed, bucket_cap
    )
    if side is None:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    # localCheckpoint: the self-join would otherwise run the Arrow
    # signature matmul for BOTH sides; checkpointed partitions are
    # GC-reclaimed once the frame is unreferenced (unlike persist)
    side = side.localCheckpoint(eager=True)
    a, b = side.alias("a"), side.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._sig") == F.col("b._sig"))
            & (F.col("a._sub") == F.col("b._sub"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{vec_col}").alias("_vb"),
        )
        # a pair can collide in several bands: dedup BEFORE the cosine
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select(
            "id_a",
            "id_b",
            # fused cosine: one Arrow pass per candidate batch
            V.cosine("_va", "_vb").alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
