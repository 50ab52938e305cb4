#!/usr/bin/env python3
"""Training-data curation pipeline, end-to-end.

The 100 TB shape of LLM data prep, run at demo scale: every stage is a
registry operator, composed the way a production curation DAG would be:

  1. profile the raw corpus               (operators/profile.py)
  2. published + learned quality gates    (operators/text.py Gopher
     A1.1/A1.2; classifier.py LR + calibration check)
  3. exact + MinHash near-dedup           (operators/dedup.py)
  4. screen a "new crawl" incrementally   (dedup_against_index)
  5. semantic dedup over embeddings       (operators/clustering.py)
  6. train a BPE tokenizer, budget tokens (operators/bpe.py)
  7. weighted mixture draw                (operators/sampling.py)
  8. pack sequences for training          (operators/corpus.py)
  9. ship WebDataset tar shards           (sources/shards.py)

Run: python examples/llm_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="llm-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    n0 = docs.count()
    print(f"corpus: {n0} documents ({sf_dir})")

    # 1. Profile the raw table before trusting it.
    from robosystems_spark.operators.profile import table_profile

    for r in table_profile(docs.select("doc_id", "text", "lang")).collect():
        print(
            f"  profile {r['column']:8s} nulls={r['n_null']} "
            f"distinct={r['n_distinct']}"
        )

    # 2a. Published rule filters: Gopher quality (A1.1) + repetition
    #     (A1.2) — the MassiveText keep/drop gate, map-only.
    from robosystems_spark.operators.text import (
        gopher_quality_flags,
        gopher_repetition_flags,
    )

    rep_ok = gopher_repetition_flags(docs).filter(
        F.col("passes_repetition")
    ).select("doc_id")
    print(
        f"gopher repetition gate: kept {rep_ok.count()}/{n0} "
        f"(quality-rule gate would keep "
        f"{gopher_quality_flags(docs).filter(F.col('passes_gopher')).count()})"
    )

    # 2b. Learned quality: train the linear filter against the
    #     heuristic teacher, CHECK ITS CALIBRATION, keep docs >= 0.5.
    from robosystems_spark.operators.classifier import (
        quality_calibration_bins,
        quality_lr_score,
    )

    scored = quality_lr_score(docs, iters=6, lr=20.0)
    cal = quality_calibration_bins(docs, iters=6, lr=20.0).collect()
    worst = max(
        abs(r["mean_predicted"] - r["observed_rate"]) for r in cal
    )
    print(f"calibration: {len(cal)} bins, worst |pred-obs| gap {worst:.3f}")
    keep_q = scored.filter(F.col("pred_label") == 1).select("doc_id")
    print(f"quality filter: kept {keep_q.count()}/{n0}")

    # 3. Near-dedup: MinHash LSH pairs -> clusters -> representatives.
    from robosystems_spark.operators.dedup import minhash_near_duplicates
    from robosystems_spark.operators.graph import duplicate_clusters

    pairs = minhash_near_duplicates(docs, threshold=0.7)
    clusters = duplicate_clusters(pairs, method="star")
    drop = clusters.filter(~F.col("keep")).select("doc_id")
    print(f"near-dedup: dropping {drop.count()} non-representatives")

    # 4. Incremental screen: sign the corpus once, test a 'new crawl'.
    from robosystems_spark.operators.dedup import (
        dedup_against_index,
        write_minhash_index,
    )

    idx = tempfile.mkdtemp(prefix="demo_minhash_") + "/sigs"
    write_minhash_index(docs.filter(F.col("doc_id") % 10 != 0), idx)
    hits = dedup_against_index(
        docs.filter(F.col("doc_id") % 10 == 0), idx, threshold=0.5
    )
    print(f"incremental screen: {hits.count()} new-batch collisions")

    # 5. Semantic dedup over the embedding space.
    from robosystems_spark.operators.clustering import semantic_dedup

    sem = semantic_dedup(emb, k=8, iters=2, tau=0.95)
    sem_drop = sem.filter(~F.col("is_kept"))
    print(f"semantic dedup: dropping {sem_drop.count()} near-twins")

    # Apply the keep decisions.
    curated = (
        docs.join(keep_q, "doc_id")
        .join(drop, "doc_id", "left_anti")
    )
    print(f"curated corpus: {curated.count()} documents")

    # 6. Tokenizer: learn 8 BPE merges, then budget the corpus.
    from robosystems_spark.operators.bpe import bpe_token_counts, bpe_train

    merges = bpe_train(curated, n_merges=8)
    print("BPE merges:", [
        f"{r['left_sym']}+{r['right_sym']}" for r in merges.collect()
    ])
    budget = bpe_token_counts(
        curated, merges=[(r["left_sym"], r["right_sym"]) for r in merges.collect()]
    ).agg(F.sum("n_bpe_tokens").alias("total")).collect()[0]
    print(f"token budget: {budget['total']} BPE tokens")

    # 7. Weighted mixture draw: longer documents proportionally likelier.
    from robosystems_spark.operators.sampling import weighted_sample_ares

    w = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    sample = weighted_sample_ares(curated, w, "doc_id", k=min(50, n0))
    print(f"weighted draw: {sample.count()} documents")

    # 8. Pack into fixed-size training sequences.
    from robosystems_spark.operators.corpus import pack_sequences

    packed = pack_sequences(
        curated.join(sample.select("doc_id"), "doc_id"), capacity=256
    )
    n_packs = packed.select("source", "seq_idx").distinct().count()
    print(f"packed into {n_packs} sequences of <= 256 tokens")

    # 9. Ship the curated corpus as WebDataset tar shards (the format
    #    training loaders mount) — byte-deterministic, manifest-signed.
    from robosystems_spark.sources.shards import write_webdataset_shards

    shard_dir = tempfile.mkdtemp(prefix="demo_wds_")
    manifest = write_webdataset_shards(
        curated.withColumn("meta", F.to_json(F.struct("lang", "source"))),
        shard_dir,
        members={"txt": "text", "json": "meta"},
        key_col="doc_id",
        n_shards=4,
    ).collect()
    print(
        f"shards: {len(manifest)} tars, "
        f"{sum(r['n_samples'] for r in manifest)} samples, "
        f"sha256[0]={manifest[0]['sha256'][:12]}..."
    )
    print("pipeline complete.")


if __name__ == "__main__":
    main()
