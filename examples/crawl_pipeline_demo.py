#!/usr/bin/env python3
"""Crawl-corpus front door, end-to-end at demo scale.

The path every web-scale training corpus walks before any curation
operator can run, each stage a real component of this repo:

  1. crawl bytes: per-record-gzip WARC files       (sources/warc.py)
  2. record walk + HTTP header strip               (read_warc)
  3. HTML -> main text (boilerplate removal)       (operators/html.py)
  4. quality funnel: word-count + Gopher flags     (operators/text.py)
  5. near-dup screen on the extracted text         (operators/dedup.py)

At 100 TB: step 1-3 are map-only over ~1 GB .warc.gz files (one task
per file, nothing shuffles until the dedup banding) — the listing IS
the parallelism.  The streaming twin of this pipeline (ingest as the
crawl arrives: gate -> LSH dedup-at-ingest -> GraphStore CDC merge ->
matview refresh) lives in tests/test_crawl_stream_e2e.py.

Run: python examples/crawl_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from robosystems_spark.io import read_table
from robosystems_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="crawl-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. synthesize a little crawl: WARC files of HTML pages -------
    from robosystems_spark.inventory.crawl import _page
    from robosystems_spark.sources.warc import build_warc, read_warc

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    crawl_dir = tempfile.mkdtemp(prefix="crawl_segments_")
    rows = docs.filter(F.col("doc_id") < 200).collect()
    for seg in range(4):  # 4 "crawl segment" files
        recs = [
            {
                "warc_type": "response",
                "target_uri": f"http://corpus.example/doc/{r['doc_id']}",
                "content_type": "application/http; msgtype=response",
                "payload": (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + _page(int(r["doc_id"]), r["text"]).encode()
                ),
            }
            for r in rows
            if r["doc_id"] % 4 == seg
        ]
        with open(os.path.join(crawl_dir, f"seg-{seg:05d}.warc.gz"), "wb") as f:
            f.write(build_warc(recs, per_record_gzip=True))
    print(f"[1] wrote 4 WARC segments to {crawl_dir}")

    # ---- 2. record walk: one task per segment file ---------------------
    records = read_warc(spark, crawl_dir)
    ok = records.filter(F.col("http_status") == 200)
    print(f"[2] {ok.count()} HTTP-200 records "
          f"({records.filter(F.col('error').isNotNull()).count()} poison)")

    # ---- 3. HTML -> main text ------------------------------------------
    from robosystems_spark.operators.html import html_extract

    pages = ok.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.decode("body", "utf-8").alias("html"),
    )
    extracted = html_extract(pages, html_col="html").cache()
    stats = extracted.agg(
        F.count("*").alias("n"),
        F.round(F.avg("n_boilerplate"), 2).alias("avg_boiler_blocks"),
        F.round(F.avg("link_density"), 4).alias("avg_link_density"),
    ).first()
    print(f"[3] extracted {stats['n']} pages; "
          f"avg boilerplate blocks {stats['avg_boiler_blocks']}, "
          f"page link density {stats['avg_link_density']}")

    # ---- 4. quality funnel ----------------------------------------------
    from robosystems_spark.operators.text import gopher_quality_flags

    n_words = F.size(F.split("text", r"\s+"))
    gated = extracted.filter(n_words >= 50)
    flags = gopher_quality_flags(gated.select("doc_id", "text"))
    print(f"[4] word-count gate kept {gated.count()}/{stats['n']}; "
          f"Gopher A1.1 full-rule pass: "
          f"{flags.filter('passes_gopher').count()}")

    # ---- 5. near-dup screen over extracted text -------------------------
    from robosystems_spark.operators.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(
        gated.select("doc_id", "text"), threshold=0.8
    )
    print(f"[5] near-dup pairs at est>=0.8: {pairs.count()}")
    print("crawl funnel complete")


if __name__ == "__main__":
    main()
