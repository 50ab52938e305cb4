"""The crawl-ingest pipeline as ONE living end-to-end test: HTML pages
arrive as a stream -> real main-content extraction -> Gopher quality
gate -> LSH dedup-at-ingest -> GraphStore CDC merge -> materialized-
view refresh — every streaming piece wired together the way a
production training-corpus ingest runs, with the batch twin asserted
equal at each stage (the house contract: a stream and a batch over the
same rows must agree row-for-row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.sources.materialize import GraphStore
from robosystems_spark.sources.matview import (
    create_materialized_view,
    refresh_materialized_view,
)


def _pages(spark, sf_dir, lo, hi, id_offset=0, text_from=None):
    """(doc_id, ts, html) rows built from the documents table with the
    inventory fixture page; ``text_from`` re-keys ids while keeping
    another doc's text (planted exact duplicates)."""
    from robosystems_spark.inventory.crawl import _page

    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .collect()
    }
    rows = []
    for did, text in sorted(docs.items()):
        out_id = did + id_offset
        src_text = text_from.get(did, text) if text_from else text
        rows.append((out_id, 1700000000 + out_id * 60, _page(out_id, src_text)))
    return spark.createDataFrame(
        rows, "doc_id long, epoch long, html string"
    ).select(
        "doc_id", F.timestamp_seconds("epoch").alias("ts"), "html"
    )


def _extracted_stream(spark, src):
    from robosystems_spark.operators.html import html_extract

    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, html string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    return html_extract(stream, keep_cols=("ts",))


def _gate_and_shape(extracted):
    """Quality gate + CDC shaping — shared verbatim by the stream and
    its batch twin.  The gate is the word-count lower bound (the
    warc_html_quality_funnel gate): the synthetic corpus has no real
    stopword structure, so the FULL Gopher AND-of-rules keeps zero
    docs here — the windowed monitor still computes the full-rule
    keep rates for the dashboard comparison."""
    n_words = F.size(F.split("text", r"\s+"))

    return extracted.filter(n_words >= 50).select(
        "doc_id",
        (F.col("doc_id") % 7).cast("long").alias("section"),
        "title",
        "text",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_words"),
        F.lit("upsert").alias("op"),
        F.col("doc_id").alias("seq"),
    )


def _run_round(spark, store, src, tmp_path, round_id):
    """One availableNow pass of all three queries over whatever files
    the shared checkpoints have not seen yet; returns the neardup
    matches emitted this round."""
    from robosystems_spark.streaming.events import (
        corpus_quality_monitor,
        run_to_memory,
    )
    from robosystems_spark.streaming.ingest import stream_apply_changes
    from robosystems_spark.streaming.stateful import (
        streaming_neardup_monitor,
    )

    mon_out = str(tmp_path / "quality_windows")
    dup_out = str(tmp_path / "dup_matches")

    def _mon_sink(batch_df, batch_id):  # complete mode: full refresh
        batch_df.write.mode("overwrite").parquet(mon_out)

    def _dup_sink(batch_df, batch_id):  # update mode: new matches only
        batch_df.write.mode("append").parquet(dup_out)

    extracted = _extracted_stream(spark, src)
    q_ingest = stream_apply_changes(
        store,
        "Document",
        _gate_and_shape(extracted),
        keys=["doc_id"],
        sequence_col="seq",
        checkpoint_dir=str(tmp_path / "ck_ingest"),
    )
    q_mon = (
        corpus_quality_monitor(
            _extracted_stream(spark, src), window_size="1 hour"
        )
        .writeStream.foreachBatch(_mon_sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_mon"))
        .trigger(availableNow=True)
        .start()
    )
    q_dup = (
        streaming_neardup_monitor(
            _extracted_stream(spark, src).select("doc_id", "text"),
            est_threshold=0.9,  # near-exact: the crawl re-fetch case
        )
        .writeStream.foreachBatch(_dup_sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_dup"))
        .trigger(availableNow=True)
        .start()
    )
    for q in (q_ingest, q_mon, q_dup):
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
    try:
        matches = (
            spark.read.parquet(dup_out)
            .select("doc_id", "matched_doc_id")
            .distinct()
            .collect()
        )
    except Exception:  # no micro-batch ever ran -> dir absent
        matches = []
    seen = str(tmp_path / "dup_seen.txt")
    already = set()
    try:
        with open(seen) as fh:
            already = {tuple(map(int, ln.split())) for ln in fh}
    except OSError:
        pass
    fresh = [
        r for r in matches
        if (r["doc_id"], r["matched_doc_id"]) not in already
    ]
    with open(seen, "w") as fh:
        for r in matches:
            fh.write(f"{r['doc_id']} {r['matched_doc_id']}\n")
    matches = fresh
    # dedup-at-ingest: the monitor's flagged ids leave the store in the
    # same round they arrived (don't keep the duplicate, don't embed it)
    flagged = {r["doc_id"] for r in matches}
    if flagged:
        ids = spark.createDataFrame(
            [(i,) for i in sorted(flagged)], "doc_id long"
        )
        store.delete_where_in("Document", ["doc_id"], ids)
    return matches


def test_crawl_ingest_stream_end_to_end(spark, sf_dir, tmp_path):
    from robosystems_spark.operators.html import html_extract

    from pyspark.sql import types as T

    store = GraphStore(spark, str(tmp_path), "kgcrawlstream000", n_buckets=8)
    store.create_table(
        "Document",
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("section", T.LongType()),
                T.StructField("title", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("n_words", T.LongType()),
            ]
        ),
        primary_keys=["doc_id"],
    )
    src = str(tmp_path / "crawl_src")

    # ---- phase 1: two micro-batch files, ids 0..89 ----------------------
    _pages(spark, sf_dir, 0, 45).write.mode("append").parquet(src)
    _pages(spark, sf_dir, 45, 90).write.mode("append").parquet(src)
    m1 = _run_round(spark, store, src, tmp_path, 1)
    # the synthetic corpus carries ORGANIC near-duplicates (docs 8/12
    # sit at ~0.97 shingle-Jaccard) — flagging one of such a pair is
    # correct behavior; which side is "earlier" is chunk-arrival order
    # within the micro-batch, so only the pair identity is asserted
    for r in m1:
        assert r["doc_id"] != r["matched_doc_id"]

    stored_v1 = store.read("Document")
    assert stored_v1.count() > 0

    # matview over the ingested table, maintained incrementally from here
    create_materialized_view(
        store,
        "DocStats",
        "Document",
        group_by=["section"],
        aggs={"n_docs": ("count", "*"), "sum_words": ("sum", "n_words")},
    )

    # ---- phase 2: one more file — new docs 90..119 plus three EXACT
    # duplicates of phase-1 texts under fresh ids (the crawl re-fetch) --
    dup_sources = {3: None, 7: None, 11: None}
    texts = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(list(dup_sources)))
        .collect()
    }
    new_docs = _pages(spark, sf_dir, 90, 120)
    dups = _pages(
        spark, sf_dir, 0, 12, id_offset=1000,
        text_from={k: texts[k] for k in texts},
    ).filter(F.col("doc_id").isin([1003, 1007, 1011]))
    new_docs.unionByName(dups).write.mode("append").parquet(src)

    m2 = _run_round(spark, store, src, tmp_path, 2)
    # every planted duplicate is flagged against its original
    flagged = {(r["doc_id"], r["matched_doc_id"]) for r in m2}
    assert {(1003, 3), (1007, 7), (1011, 11)} <= flagged
    # only round-2 ARRIVALS can be flagged: phase-1 residents are state
    assert all(d >= 90 for d, _ in flagged)

    refresh_materialized_view(store, "DocStats")

    # ---- batch twin: same operators, one batch frame ---------------------
    static = spark.read.parquet(src)
    extracted_b = html_extract(static, keep_cols=("ts",))
    gated_b = _gate_and_shape(extracted_b).drop("op", "seq")
    dup_ids = {r["doc_id"] for r in m1} | {d for d, _ in flagged}
    twin = gated_b.filter(~F.col("doc_id").isin(sorted(dup_ids)))

    stored = store.read("Document").select(*twin.columns)
    assert {tuple(r) for r in stored.collect()} == {
        tuple(r) for r in twin.collect()
    }

    # matview twin: direct recompute over the final table
    mv = store.read("DocStats").select("section", "n_docs", "sum_words")
    recomputed = (
        store.read("Document")
        .groupBy("section")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("sum_words"),
        )
    )
    assert {tuple(r) for r in mv.collect()} == {
        tuple(r) for r in recomputed.collect()
    }

    # quality-monitor twin: complete-mode windows == batch monitor rows
    from robosystems_spark.streaming.events import corpus_quality_monitor

    batch_mon = corpus_quality_monitor(extracted_b)
    got = spark.read.parquet(str(tmp_path / "quality_windows"))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in batch_mon.collect()
    }

    # exactly-once: re-running with the same checkpoints is a no-op
    v_before = store.version("Document")
    m3 = _run_round(spark, store, src, tmp_path, 3)
    assert m3 == []
    assert store.version("Document") == v_before
