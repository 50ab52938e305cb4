"""Multimodal-pipeline registry entries with HARD DuckDB oracles.

The decode step itself is real here (pure-numpy BMP pixel and WAV PCM
decoding — operators/multimodal.py), so these entries hash-check the
whole encode -> decode -> statistics pipeline: payloads are
synthesized deterministically from ``doc_id`` (a closed-form byte
formula both engines can state), the Spark side round-trips them
through REAL container bytes inside ``mapInPandas``, and the oracle
computes the same statistics from the formula directly.  A decoder
that mishandles BMP row padding, bottom-up layout, BGR order, or WAV
chunk walking diverges from the oracle immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from robosystems_spark.inventory import register
from robosystems_spark.checkpointing import materialize
from robosystems_spark.io import read_table

_N_DOCS = 200
_IMG_W, _IMG_H = 8, 4
_WAV_N, _WAV_RATE = 64, 8000


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash-repartition the id list: the documents table arrives as 1-2
    # parquet splits, which would run every downstream mapInPandas
    # codec (pure-CPU Python) nearly serially — a 200-row shuffle buys
    # 32-way codec parallelism (sweep: jpeg_scan_equivalence 11.1s ->
    # ~2s).  Deterministic (hash of doc_id), content unchanged.
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _N_DOCS)
        .repartition(32, "doc_id")
    )


@register(
    "multimodal_bmp_channel_stats",
    oracle=f"""
    SELECT d.doc_id,
           CAST({_IMG_W} AS INTEGER) AS width,
           CAST({_IMG_H} AS INTEGER) AS height,
           ROUND(AVG(CAST((d.doc_id * 7 + 3 * t.i) % 256 AS DOUBLE)), 6) AS mean_r,
           ROUND(AVG(CAST((d.doc_id * 7 + 3 * t.i + 1) % 256 AS DOUBLE)), 6) AS mean_g,
           ROUND(AVG(CAST((d.doc_id * 7 + 3 * t.i + 2) % 256 AS DOUBLE)), 6) AS mean_b,
           CAST((d.doc_id * 7) % 256 AS INTEGER) AS corner_r
    FROM documents d, range({_IMG_W * _IMG_H}) t(i)
    WHERE d.doc_id < {_N_DOCS}
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
    doc="REAL image decode path: synthesize a 24-bit BMP per document "
    "(pixel bytes are a closed-form function of doc_id), round-trip "
    "through actual BMP container bytes (row padding, bottom-up rows, "
    "BGR order) in mapInPandas, and emit per-channel means + the "
    "row-order-sensitive top-left red value; the oracle computes the "
    "same stats from the formula — any decode-layout bug diverges.",
    tags=("multimodal",),
)
def multimodal_bmp_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import (
        encode_bmp,
        image_channel_stats,
    )

    w, h = _IMG_W, _IMG_H

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                px = (int(did) * 7 + np.arange(w * h * 3)) % 256
                payloads.append(
                    encode_bmp(px.astype(np.uint8).reshape(h, w, 3))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        image_channel_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


_PNG_W, _PNG_H = 8, 8


@register(
    "multimodal_png_channel_stats",
    oracle=f"""
    SELECT d.doc_id,
           CAST({_PNG_W} AS INTEGER) AS width,
           CAST({_PNG_H} AS INTEGER) AS height,
           ROUND(AVG(CAST((d.doc_id * 13 + 7 * (3 * t.i)) % 256 AS DOUBLE)), 6) AS mean_r,
           ROUND(AVG(CAST((d.doc_id * 13 + 7 * (3 * t.i + 1)) % 256 AS DOUBLE)), 6) AS mean_g,
           ROUND(AVG(CAST((d.doc_id * 13 + 7 * (3 * t.i + 2)) % 256 AS DOUBLE)), 6) AS mean_b,
           CAST((d.doc_id * 13) % 256 AS INTEGER) AS corner_r
    FROM documents d, range({_PNG_W * _PNG_H}) t(i)
    WHERE d.doc_id < {_N_DOCS}
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
    doc="REAL compressed-image decode path: synthesize an 8x8 RGB PNG "
    "per document (pixel bytes are a closed-form function of doc_id; "
    "the encoder cycles the row filter through None/Sub/Up/Average/"
    "Paeth so every unfilter path executes), zlib-inflate and "
    "unfilter the actual IDAT stream in mapInPandas (stdlib zlib + "
    "numpy, no PIL), and emit per-channel means + the row-order-"
    "sensitive top-left red value; the oracle computes the same "
    "stats from the formula — any inflate/unfilter bug diverges.",
    tags=("multimodal",),
)
def multimodal_png_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import (
        encode_png,
        image_channel_stats,
    )

    w, h = _PNG_W, _PNG_H

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                px = (int(did) * 13 + 7 * np.arange(w * h * 3)) % 256
                payloads.append(
                    encode_png(px.astype(np.uint8).reshape(h, w, 3))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        image_channel_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


@register(
    "multimodal_png_subbyte_stats",
    oracle=f"""
    WITH params AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS depth,
             (doc_id % 6) >= 3 AS pal
      FROM documents WHERE doc_id < {_N_DOCS}
    ),
    px AS (
      SELECT p.doc_id, p.depth, p.pal,
             (p.doc_id * 5 + t.i)
               % (CASE p.depth WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 16 END) AS v,
             t.i,
             CASE p.depth WHEN 1 THEN 255 WHEN 2 THEN 85 ELSE 17 END AS scale
      FROM params p, range(64) t(i)
    )
    SELECT doc_id,
           CAST(depth AS INTEGER) AS depth,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           ROUND(AVG(CASE WHEN pal THEN CAST((v * 7) % 256 AS DOUBLE)
                          ELSE CAST(v * scale AS DOUBLE) END), 6) AS mean_r,
           ROUND(AVG(CASE WHEN pal THEN CAST((v * 11) % 256 AS DOUBLE)
                          ELSE CAST(v * scale AS DOUBLE) END), 6) AS mean_g,
           ROUND(AVG(CASE WHEN pal THEN CAST((v * 13) % 256 AS DOUBLE)
                          ELSE CAST(v * scale AS DOUBLE) END), 6) AS mean_b,
           CAST(MAX(CASE WHEN i = 0 THEN
                 CASE WHEN pal THEN (v * 7) % 256 ELSE v * scale END
               END) AS INTEGER) AS corner_r
    FROM px
    GROUP BY doc_id, depth, pal
    ORDER BY doc_id
    """,
    doc="Sub-byte PNG decode path (1/2/4-bit, the icons/scans/fax "
    "depths): each document cycles depth by doc_id%3 and gray-vs-"
    "palette by doc_id%6, samples are a closed-form function of "
    "doc_id packed MSB-first with the row filter cycling through all "
    "five types; the decoder must unfilter the PADDED byte scanline "
    "at one-byte pixel distance, unpack, and apply exact gray "
    "scaling (255//maxv) or the closed-form PLTE — any packing, "
    "stride, or palette bug diverges from the formula oracle.",
    tags=("multimodal",),
)
def multimodal_png_subbyte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import (
        encode_png,
        image_channel_stats,
    )

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                depth = {0: 1, 1: 2, 2: 4}[did % 3]
                nv = 1 << depth
                s = ((did * 5 + np.arange(64)) % nv).astype(np.uint8)
                s = s.reshape(8, 8)
                if did % 6 >= 3:
                    plte = bytes(
                        b
                        for j in range(nv)
                        for b in ((j * 7) % 256, (j * 11) % 256, (j * 13) % 256)
                    )
                    payloads.append(encode_png(s, depth=depth, plte=plte))
                else:
                    payloads.append(encode_png(s, depth=depth))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    depth_expr = (
        F.when(F.col("doc_id") % 3 == 0, 1)
        .when(F.col("doc_id") % 3 == 1, 2)
        .otherwise(4)
        .cast("int")
    )
    return (
        image_channel_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .select(
            "doc_id",
            depth_expr.alias("depth"),
            "width",
            "height",
            "mean_r",
            "mean_g",
            "mean_b",
            "corner_r",
        )
        .transform(materialize)
        .orderBy("doc_id")
    )


_TIFFJ_W, _TIFFJ_H = 16, 16


@register(
    "multimodal_tiff_jpeg_stats",
    oracle=f"""
    SELECT d.doc_id,
           CAST({_TIFFJ_W} AS INTEGER) AS width,
           CAST({_TIFFJ_H} AS INTEGER) AS height,
           ROUND(CAST((d.doc_id * 26) % 256 AS DOUBLE), 6) AS mean_r,
           ROUND(CAST((d.doc_id * 26) % 256 AS DOUBLE), 6) AS mean_g,
           ROUND(CAST((d.doc_id * 26) % 256 AS DOUBLE), 6) AS mean_b,
           CAST((d.doc_id * 26) % 256 AS INTEGER) AS corner_r
    FROM documents d
    WHERE d.doc_id < {_N_DOCS}
    ORDER BY d.doc_id
    """,
    doc="New-style JPEG-in-TIFF (compression 7, TIFF Technote 2): one "
    "baseline-JPEG stream per strip/tile, shared DQT/DHT via the "
    "JPEGTables tag.  JPEG is lossy, so the hash-exact oracle rides "
    "the DC-only exactness property: a CONSTANT grayscale image at an "
    "EVEN level survives FDCT->quantize->IDCT bit-exactly (odd levels "
    "do not — verified), making decode(encode(const)) == const a hard "
    "contract.  Variants cycle by doc_id: strips / strips+JPEGTables / "
    "tiles / tiles+JPEGTables / old-style-interchange / old-style-"
    "fragmented (compression 6, TIFF 6.0 section 22: table-tag "
    "reconstruction), so the table-splice path, the edge-replicated "
    "tile padding, AND both deprecated old-style shapes sit inside "
    "the oracle gate.",
    tags=("multimodal",),
    bench=True,
)
def multimodal_tiff_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import image_channel_stats
    from robosystems_spark.operators.tiff import encode_tiff

    w, h = _TIFFJ_W, _TIFFJ_H

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                v = (int(did) * 26) % 256  # always even: DC-exact
                img = np.full((h, w), v, dtype=np.uint8)
                variant = int(did) % 6
                if variant < 4:
                    payloads.append(
                        encode_tiff(
                            img,
                            compression=7,
                            rows_per_strip=8 if variant < 2 else None,
                            tile=(16, 16) if variant >= 2 else None,
                            jpeg_tables=variant % 2 == 1,
                        )
                    )
                else:  # old-style (compression 6), both real shapes
                    payloads.append(
                        encode_tiff(
                            img,
                            compression=6,
                            oldjpeg=(
                                "interchange"
                                if variant == 4
                                else "fragmented"
                            ),
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        image_channel_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


_TIFF_W, _TIFF_H = 8, 4


@register(
    "multimodal_tiff_channel_stats",
    oracle=f"""
    SELECT d.doc_id,
           CAST({_TIFF_W} AS INTEGER) AS width,
           CAST({_TIFF_H} AS INTEGER) AS height,
           ROUND(AVG(CAST((d.doc_id * 11 + 5 * (3 * t.i)) % 256 AS DOUBLE)), 6) AS mean_r,
           ROUND(AVG(CAST((d.doc_id * 11 + 5 * (3 * t.i + 1)) % 256 AS DOUBLE)), 6) AS mean_g,
           ROUND(AVG(CAST((d.doc_id * 11 + 5 * (3 * t.i + 2)) % 256 AS DOUBLE)), 6) AS mean_b,
           CAST((d.doc_id * 11) % 256 AS INTEGER) AS corner_r
    FROM documents d, range({_TIFF_W * _TIFF_H}) t(i)
    WHERE d.doc_id < {_N_DOCS}
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
    doc="REAL TIFF decode path (the dominant scanned-document corpus "
    "format): synthesize an RGB TIFF per document (pixels a closed-"
    "form function of doc_id) with the STORAGE VARIANT cycling by "
    "doc_id — uncompressed / LZW / LZW+predictor-2 / PackBits, II "
    "and MM byte orders, multi-strip AND tiled — decode the actual "
    "strips/tiles in "
    "mapInPandas (operators/tiff.py, pure numpy LZW/PackBits), and "
    "emit per-channel means + the top-left red value; the oracle is "
    "variant-blind, so any compression/byte-order/predictor/strip "
    "bug diverges on exactly the affected doc_ids.",
    tags=("multimodal",),
    bench=True,
)
def multimodal_tiff_channel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import image_channel_stats
    from robosystems_spark.operators.tiff import encode_tiff

    w, h = _TIFF_W, _TIFF_H

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                px = ((int(did) * 11 + 5 * np.arange(w * h * 3)) % 256)
                img = px.astype(np.uint8).reshape(h, w, 3)
                variant = int(did) % 8
                comp = (1, 5, 5, 32773)[variant % 4]
                pred = 2 if variant == 2 or variant == 6 else 1
                bo = "<" if variant < 4 else ">"
                rps = 2 if variant in (1, 7) else None
                til = (16, 16) if variant in (3, 4) else None
                payloads.append(
                    encode_tiff(
                        img,
                        compression=comp,
                        byte_order=bo,
                        predictor=pred,
                        rows_per_strip=rps,
                        tile=til,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        image_channel_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


_G4_W, _G4_H = 32, 16


@register(
    "multimodal_tiff_g4_stats",
    oracle=f"""
    SELECT d.doc_id,
           CAST({_G4_W} AS INTEGER) AS width,
           CAST({_G4_H} AS INTEGER) AS height,
           ROUND(AVG(CASE WHEN (d.doc_id * 7 + t.i) % 13 < 4
                          THEN 0.0 ELSE 255.0 END), 6) AS mean_r,
           ROUND(AVG(CASE WHEN (d.doc_id * 7 + t.i) % 13 < 4
                          THEN 0.0 ELSE 255.0 END), 6) AS mean_g,
           ROUND(AVG(CASE WHEN (d.doc_id * 7 + t.i) % 13 < 4
                          THEN 0.0 ELSE 255.0 END), 6) AS mean_b,
           CAST(CASE WHEN (d.doc_id * 7) % 13 < 4 THEN 0 ELSE 255 END
                AS INTEGER) AS corner_r
    FROM documents d, range({_G4_W * _G4_H}) t(i)
    WHERE d.doc_id < {_N_DOCS}
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
    doc="REAL CCITT Group 4 (ITU-T T.6) decode path — the "
    "compression of scanned-document corpora: synthesize a bilevel "
    "page per document (ink bit a closed-form function of doc_id), "
    "CCITT-encode it — G4 (vertical/pass/horizontal modes), MH RLE "
    "(compression 2), G3 1-D and G3 2-D (compression 3, EOL-framed "
    "with tag bits), and G3 uncompressed mode in both entry shapes "
    "(T4Options bit 1, the T.4 extension codes — r11) — each over "
    "single-strip/multi-strip/tiled layouts, all cycling by doc_id "
    "(operators/g4.py: shared T.4 MH tables) — decode the actual "
    "fax stream in mapInPandas, and "
    "emit channel means + the corner pixel; the oracle computes the "
    "same stats from the ink formula — any mode/MH-table/reference-"
    "row bug diverges.",
    tags=("multimodal",),
)
def multimodal_tiff_g4_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import image_channel_stats
    from robosystems_spark.operators.tiff import encode_tiff

    w, h = _G4_W, _G4_H

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                ink = (
                    ((int(did) * 7 + np.arange(w * h)) % 13) < 4
                ).astype(np.uint8).reshape(h, w)
                variant = int(did) % 18
                # G4 / MH RLE / G3 1-D / G3 2-D / G3 1-D uncompressed /
                # G3 2-D uncompressed (r11: T.4 extension codes), each
                # over the three layout variants (single strip /
                # multi-strip / tiles).  The oracle computes stats from
                # the ink formula, so widening the cycle leaves the
                # hash UNCHANGED — only a decode bug would diverge.
                comp = (4, 2, 3, 3, 3, 3)[variant // 3]
                kw = {}
                t4 = (0, 0, 0, 1, 2, 3)[variant // 3]
                if t4:
                    kw["t4options"] = t4
                if variant % 3 == 1:
                    kw["rows_per_strip"] = 5
                elif variant % 3 == 2:
                    kw["tile"] = (16, 16)
                payloads.append(
                    encode_tiff(
                        ink, bits=1, photometric=0, compression=comp,
                        **kw,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        image_channel_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


@register(
    "multimodal_wav_pcm_rms",
    oracle=f"""
    WITH s AS (
      SELECT d.doc_id,
             CAST((d.doc_id * 131 + t.i * 17) % 65536 - 32768 AS BIGINT) AS v
      FROM documents d, range({_WAV_N}) t(i)
      WHERE d.doc_id < {_N_DOCS}
    )
    SELECT doc_id,
           CAST({_WAV_RATE} AS INTEGER) AS sample_rate_hz,
           CAST(1 AS INTEGER) AS channels,
           CAST({_WAV_N} AS BIGINT) AS n_samples,
           ROUND(SQRT(AVG(CAST(v * v AS DOUBLE))), 6) AS rms,
           CAST(MAX(ABS(v)) AS INTEGER) AS peak
    FROM s
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="REAL audio decode path: synthesize 16-bit mono PCM WAV per "
    "document (samples are a closed-form int16 function of doc_id), "
    "round-trip through actual RIFF/fmt/data chunk bytes in "
    "mapInPandas, and emit per-clip RMS + absolute peak; the oracle "
    "computes the identical statistics from the formula.",
    tags=("multimodal",),
)
def multimodal_wav_pcm_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import (
        audio_clip_stats,
        encode_wav_pcm,
    )

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                v = (int(did) * 131 + np.arange(_WAV_N) * 17) % 65536 - 32768
                payloads.append(
                    encode_wav_pcm(v.astype(np.int16), _WAV_RATE, 1)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        audio_clip_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


@register(
    "multimodal_mp4_metadata",
    oracle=f"""
    SELECT d.doc_id,
           'mp4' AS container,
           'isom' AS major_brand,
           CAST(600 AS BIGINT) AS timescale,
           CAST(d.doc_id * 600 + 30 AS BIGINT) AS duration_ticks,
           CAST((d.doc_id * 600 + 30) * 1000 // 600 AS BIGINT) AS duration_ms,
           CAST(1 + d.doc_id % 3 AS INTEGER) AS n_tracks
    FROM documents d
    WHERE d.doc_id < {_N_DOCS}
    ORDER BY d.doc_id
    """,
    doc="REAL video-container path: synthesize a structurally-valid ISO "
    "BMFF file per document (ftyp + moov{{mvhd, trak*}} + mdat; duration "
    "ticks and track count are closed-form functions of doc_id), walk the "
    "actual box tree in mapInPandas (size+fourcc grammar, version-0 mvhd), "
    "and emit timescale/duration/track metadata; the oracle computes the "
    "same values from the formula — a size/recursion bug in the walker "
    "diverges immediately.",
    tags=("multimodal",),
)
def multimodal_mp4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from robosystems_spark.operators.multimodal import (
        encode_mp4_stub,
        video_container_stats,
    )

    def encode(it):
        for pdf in it:
            payloads = [
                encode_mp4_stub(
                    duration_ticks=int(did) * 600 + 30,
                    timescale=600,
                    n_tracks=1 + int(did) % 3,
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        video_container_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


_SIL_WINDOW, _SIL_THRESH = 16, 256


@register(
    "multimodal_wav_silence_ratio",
    oracle=f"""
    WITH s AS (
      SELECT d.doc_id, t.i,
             CASE WHEN (t.i // {_SIL_WINDOW}) % 3 = 0 THEN 0
                  ELSE (d.doc_id * 131 + t.i * 17) % 65536 - 32768 END AS v
      FROM documents d, range({_WAV_N}) t(i)
      WHERE d.doc_id < {_N_DOCS}
    ),
    w AS (
      SELECT doc_id, i // {_SIL_WINDOW} AS win, MAX(ABS(v)) AS mx
      FROM s GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_windows,
           CAST(SUM(CASE WHEN mx < {_SIL_THRESH} THEN 1 ELSE 0 END)
                AS INTEGER) AS n_silent,
           ROUND(CAST(SUM(CASE WHEN mx < {_SIL_THRESH} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS silence_ratio
    FROM w
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="REAL audio silence detection: synthesize 16-bit PCM WAV per "
    "document where every third 16-sample window is zeroed (closed-"
    "form function of doc_id), round-trip through actual RIFF bytes, "
    "and flag silent windows by integer max-|sample| < threshold in "
    "mapInPandas — voice-activity screening with an exact integer "
    "decision; the oracle computes the identical windows from the "
    "formula.",
    tags=("multimodal",),
)
def multimodal_wav_silence_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import (
        audio_silence_profile,
        encode_wav_pcm,
    )

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                i = np.arange(_WAV_N)
                v = (int(did) * 131 + i * 17) % 65536 - 32768
                v[(i // _SIL_WINDOW) % 3 == 0] = 0
                payloads.append(
                    encode_wav_pcm(v.astype(np.int16), _WAV_RATE, 1)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        audio_silence_profile(
            media, id_col="doc_id", window=_SIL_WINDOW, threshold=_SIL_THRESH
        )
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


_JPG_W, _JPG_H = 16, 16


@register(
    "multimodal_jpeg_roundtrip_bound",
    oracle=f"""
    SELECT doc_id,
           CAST({_JPG_W} AS INTEGER) AS width,
           CAST({_JPG_H} AS INTEGER) AS height,
           TRUE AS within_bound
    FROM documents
    WHERE doc_id < {_N_DOCS}
    ORDER BY doc_id
    """,
    doc="REAL baseline-JPEG codec path (pure-numpy DCT + Huffman, "
    "operators/jpeg.py): synthesize a 16x16 RGB image per document "
    "(closed-form pixels), encode with unit quantization tables, "
    "decode the actual entropy-coded stream, and assert the lossy "
    "round-trip honors its error CONTRACT (max |err| <= 3: <=0.5 per "
    "quantized coefficient + YCbCr rounding). JPEG pixels are not "
    "SQL-expressible (lossy DCT), so the oracle pins the contract "
    "plus the SOF dimensions — a codec bug (Huffman, zigzag, DC "
    "prediction, stuffing, IDCT) breaks the bound and the hash.",
    tags=("multimodal",),
)
def multimodal_jpeg_roundtrip_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.jpeg import decode_jpeg, encode_jpeg

    w, h = _JPG_W, _JPG_H

    def roundtrip(it):
        q1 = np.ones((8, 8), dtype=int)
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                px = ((int(did) * 37 + 11 * np.arange(w * h * 3)) % 256).astype(
                    np.uint8
                ).reshape(h, w, 3)
                dec = decode_jpeg(encode_jpeg(px, q_luma=q1, q_chroma=q1))
                err = int(np.abs(dec.astype(int) - px.astype(int)).max())
                rows.append(
                    {
                        "doc_id": did,
                        "width": dec.shape[1],
                        "height": dec.shape[0],
                        "within_bound": bool(err <= 3),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        _doc_ids(spark, sf_dir)
        .mapInPandas(
            roundtrip,
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("within_bound", T.BooleanType()),
                ]
            ),
        )
        .transform(materialize)
        .orderBy("doc_id")
    )


_GIF_W, _GIF_H, _GIF_NCOL = 12, 10, 6


@register(
    "multimodal_gif_channel_stats",
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id, (d.doc_id * 3 + t.i) % {_GIF_NCOL} AS c
      FROM documents d, range({_GIF_W * _GIF_H}) t(i)
      WHERE d.doc_id < {_N_DOCS}
    )
    SELECT doc_id,
           CAST({_GIF_W} AS INTEGER) AS width,
           CAST({_GIF_H} AS INTEGER) AS height,
           ROUND(AVG(CAST(40 * c AS DOUBLE)), 6) AS mean_r,
           ROUND(AVG(CAST(80 + 20 * c AS DOUBLE)), 6) AS mean_g,
           ROUND(AVG(CAST(5 * c AS DOUBLE)), 6) AS mean_b,
           CAST(40 * ((doc_id * 3) % {_GIF_NCOL}) AS INTEGER) AS corner_r
    FROM px
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="REAL GIF decode path (pure-Python LZW, operators/gif.py): "
    "synthesize an INTERLACED 6-color GIF per document (palette index "
    "and color values are closed-form functions of doc_id), LZW-"
    "compress with a genuine dictionary encoder, decode the actual "
    "variable-width code stream + 4-pass de-interlace in mapInPandas, "
    "and emit per-channel means + the interlace-order-sensitive "
    "top-left red value; GIF is lossless for palette images, so the "
    "oracle computes the same stats from the formula — an LZW or "
    "interlace bug diverges.",
    tags=("multimodal",),
)
def multimodal_gif_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.gif import encode_gif
    from robosystems_spark.operators.multimodal import image_channel_stats

    w, h, ncol = _GIF_W, _GIF_H, _GIF_NCOL
    pal = np.stack(
        [
            40 * np.arange(ncol),
            80 + 20 * np.arange(ncol),
            5 * np.arange(ncol),
        ],
        axis=1,
    ).astype(np.uint8)

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                idx = ((int(did) * 3 + np.arange(w * h)) % ncol).reshape(h, w)
                payloads.append(encode_gif(pal[idx], interlace=True))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        image_channel_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


_ANIM_NCOL = 6


@register(
    "multimodal_gif_animation_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(2 + doc_id % 3 AS INTEGER) AS frame_count,
           CAST(5 * (2 + doc_id % 3) * (3 + doc_id % 3) AS BIGINT)
             AS total_duration_cs,
           ROUND(CAST(2 + doc_id % 3 AS DOUBLE), 6) AS mean_delta_pixels,
           ROUND(CAST(40 * (doc_id % {_ANIM_NCOL}) AS DOUBLE), 6)
             AS first_frame_mean_r
    FROM documents
    WHERE doc_id < {_N_DOCS}
    ORDER BY doc_id
    """,
    doc="REAL animated-GIF decode + frame COMPOSITION (operators/"
    "gif.py decode_gif_frames): synthesize a 2-4 frame animation per "
    "document — uniform 8x8 base frame, then RGBA delta frames whose "
    "opaque 2xk rects land at offset (k, k) with GCE transparency, "
    "per-frame delays 10(k+1) cs, disposal keep — decode and compose "
    "every frame in mapInPandas, and emit frame count, total GCE "
    "duration, mean changed-pixels between consecutive composed "
    "frames, and first-frame mean red.  Closed-form oracle: rect k "
    "paints exactly 2k pixels a color nothing under it holds, so "
    "mean delta = n, duration = 5n(n+1); an offset, transparency, or "
    "composition bug diverges immediately.",
    tags=("multimodal",),
)
def multimodal_gif_animation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.gif import encode_gif_animation
    from robosystems_spark.operators.multimodal import gif_animation_stats

    ncol = _ANIM_NCOL
    pal = np.stack(
        [
            40 * np.arange(ncol),
            80 + 20 * np.arange(ncol),
            5 * np.arange(ncol),
        ],
        axis=1,
    ).astype(np.uint8)

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                b = int(did) % ncol
                n = 2 + int(did) % 3
                base = np.empty((8, 8, 3), np.uint8)
                base[:, :] = pal[b]
                frames = [base]
                offsets = [(0, 0)]
                delays = [10]
                for k in range(1, n):
                    delta = np.zeros((4, 4, 4), np.uint8)
                    delta[0:2, 0:k, :3] = pal[(b + k) % ncol]
                    delta[0:2, 0:k, 3] = 255
                    frames.append(delta)
                    offsets.append((k, k))
                    delays.append(10 * (k + 1))
                payloads.append(
                    encode_gif_animation(
                        frames,
                        delays_cs=delays,
                        disposals=[1] * n,
                        offsets=offsets,
                        screen=(8, 8),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        gif_animation_stats(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )


@register(
    "multimodal_jpeg_scan_equivalence",
    oracle=f"""
    SELECT doc_id,
           CAST(0 AS INTEGER) AS progressive_diff,
           CAST(0 AS INTEGER) AS noninterleaved_diff,
           CAST(0 AS INTEGER) AS restart_diff,
           CAST(0 AS INTEGER) AS prog12_diff,
           CAST(0 AS INTEGER) AS subsamp_diff,
           CAST(0 AS INTEGER) AS prog_subsamp_diff,
           TRUE AS within_bound
    FROM documents
    WHERE doc_id < {_N_DOCS}
    ORDER BY doc_id
    """,
    doc="JPEG scan-organization equivalence, proven INSIDE the Spark "
    "pipeline: per document, encode the same image five ways — "
    "interleaved baseline, progressive SOF2 (spectral selection + "
    "successive approximation), non-interleaved baseline (one SOS "
    "per component), progressive with restart intervals, and (r11) "
    "12-BIT progressive vs 12-bit extended-sequential — and decode "
    "all of them.  The quantized coefficients are identical by "
    "construction within each precision, so every variant must "
    "decode to EXACTLY its baseline's pixels: the oracle pins all "
    "four max-abs-diffs to 0.  Any entropy-coding divergence "
    "(EOBRUN, refinement bits, RSTn re-sync, per-scan predictors, "
    "extended DC/AC tables, 2048 level shift) flips a diff and the "
    "hash.  r12 adds prog_subsamp_diff: progressive AND "
    "non-interleaved encodings at 4:2:2/4:1:1 (the web-crawl "
    "progressive-subsampled composition) must decode exactly to the "
    "interleaved-baseline decode at the SAME subsampling — the "
    "multi-scan MCU geometry for non-square sampling grids is what "
    "this pins.",
    tags=("multimodal",),
)
def multimodal_jpeg_scan_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_noninterleaved,
        encode_jpeg_progressive,
    )

    w, h = _JPG_W, _JPG_H

    def compare(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                px = ((int(did) * 37 + 11 * np.arange(w * h * 3)) % 256).astype(
                    np.uint8
                ).reshape(h, w, 3)
                base = decode_jpeg(encode_jpeg(px)).astype(int)
                diffs = {}
                for key, data in (
                    ("progressive_diff", encode_jpeg_progressive(px)),
                    ("noninterleaved_diff", encode_jpeg_noninterleaved(px)),
                    (
                        "restart_diff",
                        encode_jpeg_progressive(px, restart_interval=2),
                    ),
                ):
                    diffs[key] = int(
                        np.abs(decode_jpeg(data).astype(int) - base).max()
                    )
                # 12-bit multi-scan: progressive SOF2 at precision 12
                # must decode to the 12-bit extended-sequential pixels
                px12 = (
                    (int(did) * 571 + 13 * np.arange(w * h * 3)) % 4096
                ).astype(np.uint16).reshape(h, w, 3)
                base12 = decode_jpeg(encode_jpeg(px12, precision=12)).astype(
                    int
                )
                diffs["prog12_diff"] = int(
                    np.abs(
                        decode_jpeg(
                            encode_jpeg_progressive(px12, precision=12)
                        ).astype(int)
                        - base12
                    ).max()
                )
                # 4:2:2 / 4:1:1 (sampling factor 4, r11): a CONSTANT
                # even-level image is DC-exact AND subsample-invariant
                # (block means of a constant are the constant), so the
                # subsampled decode must equal the 4:4:4 decode exactly
                v = (int(did) * 26) % 256  # always even
                cimg = np.full((h, w, 3), v, dtype=np.uint8)
                mode = "411" if int(did) % 2 else "422"
                diffs["subsamp_diff"] = int(
                    np.abs(
                        decode_jpeg(
                            encode_jpeg(cimg, subsample=mode)
                        ).astype(int)
                        - decode_jpeg(encode_jpeg(cimg)).astype(int)
                    ).max()
                )
                # progressive / non-interleaved at 422/411 (r12):
                # identical quantized coefficients by construction, so
                # both must decode EXACTLY to the interleaved baseline
                # at the same subsampling — on the full gradient image
                base_sub = decode_jpeg(
                    encode_jpeg(px, subsample=mode)
                ).astype(int)
                diffs["prog_subsamp_diff"] = max(
                    int(
                        np.abs(
                            decode_jpeg(
                                encode_jpeg_progressive(px, subsample=mode)
                            ).astype(int)
                            - base_sub
                        ).max()
                    ),
                    int(
                        np.abs(
                            decode_jpeg(
                                encode_jpeg_noninterleaved(
                                    px, subsample=mode
                                )
                            ).astype(int)
                            - base_sub
                        ).max()
                    ),
                )
                rows.append(
                    {
                        "doc_id": did,
                        **diffs,
                        "within_bound": all(v == 0 for v in diffs.values()),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        _doc_ids(spark, sf_dir)
        .mapInPandas(
            compare,
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("progressive_diff", T.IntegerType()),
                    T.StructField("noninterleaved_diff", T.IntegerType()),
                    T.StructField("restart_diff", T.IntegerType()),
                    T.StructField("prog12_diff", T.IntegerType()),
                    T.StructField("subsamp_diff", T.IntegerType()),
                    T.StructField("prog_subsamp_diff", T.IntegerType()),
                    T.StructField("within_bound", T.BooleanType()),
                ]
            ),
        )
        .transform(materialize)
        .orderBy("doc_id")
    )


_SPEC_N = 256


@register(
    "multimodal_wav_spectral_peak",
    oracle=f"""
    WITH s AS (
      SELECT d.doc_id,
             3 + d.doc_id % 100 AS k,
             CAST(FLOOR((2000 + d.doc_id % 89 * 100)
                        * SIN(2 * PI() * (3 + d.doc_id % 100) * t.i / {_SPEC_N})
                        + 0.5) AS BIGINT) AS v
      FROM documents d, range({_SPEC_N}) t(i)
      WHERE d.doc_id < {_N_DOCS}
    )
    SELECT doc_id,
           CAST({_SPEC_N} AS BIGINT) AS n_samples,
           CAST(MIN(k) AS INTEGER) AS peak_bin,
           CAST(SUM(v * v) AS BIGINT) AS energy
    FROM s
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Dominant-frequency detection (the pitch-detection / spectral-"
    "fingerprint feature extractor): synthesize an integer-cycle sine "
    "per document (bin and amplitude closed-form in doc_id), round-trip "
    "through real WAV bytes, numpy-rfft in mapInPandas, and emit the "
    "argmax bin + the EXACT BIGINT sample-energy. Float spectra never "
    "reach the compare: peak_bin is an integer decision with a huge "
    "margin (pure tone), and energy is Parseval's time-domain side — "
    "both computable identically in DuckDB from the synthesis formula "
    "(half-up FLOOR(x+0.5) quantization matches the generator).",
    tags=("multimodal",),
    bench=True,
)
def multimodal_wav_spectral_peak(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np
    import pandas as pd

    from robosystems_spark.operators.multimodal import (
        audio_spectral_peak,
        encode_wav_pcm,
    )

    def encode(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                k = 3 + int(did) % 100
                a = 2000 + int(did) % 89 * 100
                i = np.arange(_SPEC_N, dtype=np.float64)
                v = np.floor(
                    a * np.sin(2 * np.pi * k * i / _SPEC_N) + 0.5
                ).astype(np.int16)
                payloads.append(encode_wav_pcm(v, _WAV_RATE, 1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    media = _doc_ids(spark, sf_dir).mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return (
        audio_spectral_peak(media, id_col="doc_id")
        .withColumnRenamed("media_id", "doc_id")
        .transform(materialize)
        .orderBy("doc_id")
    )
