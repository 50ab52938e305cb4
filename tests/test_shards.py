"""WebDataset tar shard sink/source: round-trip, determinism, manifest."""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from robosystems_spark.sources.shards import (
    read_webdataset_shards,
    write_webdataset_shards,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_shard_round_trip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "wds")
    docs = _docs(spark).withColumn(
        "meta", F.to_json(F.struct("lang", "source"))
    )
    manifest = write_webdataset_shards(
        docs, out, members={"txt": "text", "json": "meta"},
        key_col="doc_id", n_shards=4,
    ).collect()
    assert len(manifest) == 4
    assert sum(r["n_samples"] for r in manifest) == docs.count()
    for r in manifest:
        assert os.path.getsize(r["path"]) == r["n_bytes"]
        with open(r["path"], "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == r["sha256"]

    back = read_webdataset_shards(spark, out)
    txt = {
        r["key"]: r["content"].decode("utf-8")
        for r in back.filter("ext = 'txt'").collect()
    }
    want = {str(r["doc_id"]): r["text"] for r in docs.collect()}
    assert txt == want
    # every sample carries both members
    counts = back.groupBy("key").count().collect()
    assert all(r["count"] == 2 for r in counts)


def test_shards_are_byte_deterministic(spark, tmp_path):
    docs = _docs(spark).limit(50)
    hashes = []
    for run in ("a", "b"):
        out = str(tmp_path / run)
        m = write_webdataset_shards(
            docs, out, members={"txt": "text"}, key_col="doc_id", n_shards=2
        ).collect()
        hashes.append({r["shard_id"]: r["sha256"] for r in m})
    assert hashes[0] == hashes[1]


def test_shard_members_sorted_null_members_skipped(spark, tmp_path):
    out = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [(1, "alpha", b"\x01\x02"), (2, "beta", None), (3, None, b"\x03")],
        "doc_id long, text string, blob binary",
    )
    manifest = write_webdataset_shards(
        df, out, members={"txt": "text", "bin": "blob"},
        key_col="doc_id", n_shards=1,
    ).collect()
    assert manifest[0]["n_samples"] == 3
    with tarfile.open(manifest[0]["path"]) as tar:
        names = tar.getnames()
    # keys sorted within the shard; null members absent
    assert names == ["1.txt", "1.bin", "2.txt", "3.bin"]
    # pinned metadata: mtime 0, uid/gid 0
    with tarfile.open(manifest[0]["path"]) as tar:
        for info in tar:
            assert info.mtime == 0 and info.uid == 0 and info.mode == 0o644


def test_shard_read_rejects_empty_and_bad_args(spark, tmp_path):
    with pytest.raises(ValueError, match="no tar shards"):
        read_webdataset_shards(spark, str(tmp_path))
    with pytest.raises(ValueError, match="members"):
        write_webdataset_shards(
            _docs(spark), str(tmp_path), members={}, n_shards=1
        )
