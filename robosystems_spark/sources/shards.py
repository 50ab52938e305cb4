"""WebDataset-style tar shard sink/source for training pipelines.

Large-scale training loaders (WebDataset, torchdata, NeMo) consume
corpora as numbered POSIX tar shards whose members group into samples
by basename: ``{key}.txt`` + ``{key}.json`` + ``{key}.bin`` are one
sample (Aizman et al. 2019, the WebDataset convention).  This module
writes a DataFrame into such shards and reads them back:

- **Deterministic sharding**: sample -> shard via the first 15 hex
  chars of ``md5(key)`` mod ``n_shards`` (the portable-hash trick the
  DSIR/random-walk operators use), members sorted by key within the
  shard, and tar metadata pinned (mtime=0, uid/gid=0, mode 0644,
  USTAR) — so a re-run produces BYTE-IDENTICAL shards and the manifest
  sha256 doubles as an integrity + reproducibility check.
- **Distributed shape**: one ``applyInPandas`` group per shard writes
  its tar; the driver never sees sample bytes.  A shard must fit one
  task's memory — that is the WebDataset contract itself (shards are
  the unit of sequential IO; size them via ``n_shards``).  Reading is
  ``mapInPandas`` over the shard listing: one task per shard, sequential
  tar scan, no seeks.

The reference's export surface is parquet/csv backups
(ref: robosystems/operations/graph/backup_manager.py); this extends the
sink family with the format ML training jobs actually mount.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _shard_expr(key_col: str, n_shards: int):
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    members: dict[str, str],
    key_col: str = "doc_id",
    n_shards: int = 8,
    prefix: str = "shard",
) -> DataFrame:
    """Write ``df`` as ``{out_dir}/{prefix}-{00000d}.tar`` WebDataset
    shards and return the manifest DataFrame (shard_id, path,
    n_samples, n_bytes, sha256).

    ``members`` maps tar-member extension -> source column: string
    columns are written utf-8, binary columns raw; NULL members are
    skipped (a sample may lack an extension).  The sample key is
    ``CAST(key_col AS STRING)``; keys must be unique.

    ``out_dir`` must be a SHARED filesystem visible to every executor
    (NFS/FUSE mount, or local disk in local mode): the tar members are
    written with plain ``open()`` inside ``applyInPandas``, so on a
    multi-node cluster without a shared mount the shards would scatter
    across executor-local disks while the manifest implies one
    location.  Object stores need the Hadoop FS API instead — the
    documented upgrade seam.
    """
    if not members:
        raise ValueError("members mapping must not be empty")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    width = max(5, len(str(n_shards - 1)))
    cols = [
        F.col("_k").alias("_k"),
        *[F.col(c).alias(f"_m_{ext}") for ext, c in members.items()],
    ]
    staged = df.select(
        F.col(key_col).cast("string").alias("_k"), *[F.col(c) for c in set(members.values())]
    ).select(_shard_expr("_k", n_shards).alias("_shard"), *cols)
    exts = list(members)

    def _write(pdf):
        import pandas as pd

        shard = int(pdf["_shard"].iloc[0])
        os.makedirs(out_dir, exist_ok=True)  # executors see the dir too
        path = os.path.join(out_dir, f"{prefix}-{shard:0{width}d}.tar")
        pdf = pdf.sort_values("_k", kind="mergesort")
        buf = io.BytesIO()
        n = 0
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for _, row in pdf.iterrows():
                n += 1
                for ext in exts:
                    val = row[f"_m_{ext}"]
                    if val is None or (isinstance(val, float) and pd.isna(val)):
                        continue
                    data = (
                        val.encode("utf-8")
                        if isinstance(val, str)
                        else bytes(val)
                    )
                    info = tarfile.TarInfo(name=f"{row['_k']}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.mode = 0o644
                    tar.addfile(info, io.BytesIO(data))
        payload = buf.getvalue()
        with open(path, "wb") as f:
            f.write(payload)
        return pd.DataFrame(
            [
                {
                    "shard_id": shard,
                    "path": path,
                    "n_samples": n,
                    "n_bytes": len(payload),
                    "sha256": hashlib.sha256(payload).hexdigest(),
                }
            ]
        )

    return (
        staged.groupBy("_shard")
        .applyInPandas(_write, schema=MANIFEST_SCHEMA)
        .orderBy("shard_id")
    )


def read_webdataset_shards(
    spark: SparkSession, paths: list[str] | str
) -> DataFrame:
    """Read tar shards back as one row per member (shard_id, key, ext,
    content BINARY) — one task per shard, sequential scan.  ``paths``
    is a directory (all ``*.tar`` inside) or an explicit list."""
    if isinstance(paths, str):
        files = sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith(".tar")
        )
    else:
        files = sorted(paths)
    if not files:
        raise ValueError("no tar shards to read")
    plist = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files), "path")

    def _read(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for path in pdf["path"]:
                rows = []
                base = os.path.basename(path)
                shard = int(base.rsplit("-", 1)[1].split(".")[0])
                with tarfile.open(path, mode="r") as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        key, _, ext = info.name.rpartition(".")
                        rows.append(
                            {
                                "shard_id": shard,
                                "key": key,
                                "ext": ext,
                                "content": tar.extractfile(info).read(),
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in MEMBER_SCHEMA.fields]
                )

    return plist.mapInPandas(_read, schema=MEMBER_SCHEMA)
