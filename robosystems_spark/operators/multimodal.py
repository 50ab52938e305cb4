"""Multimodal columns: image/audio/video as opaque binary + metadata.

The pattern the reference uses for oversized text content — externalize
payload, keep a typed pointer column (/root/reference/robosystems/
adapters/sec/processors/textblock.py:19-46) — generalized to binary
media columns for training-data pipelines.

Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec step is STUBBED
behind ``decode_fn`` because image/audio libraries are not available
in this environment — ``deterministic_fake_features`` stands in, and
``NotImplementedError`` marks the real-decoder seam.

Scale notes: all per-item work runs in ``mapInPandas`` (Arrow-batched,
no per-row Python overhead); binary payloads never shuffle — metadata
extraction happens before any wide operation, and downstream joins
carry only the metadata/feature columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("size_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("magic", T.StringType()),
        T.StructField("detected_type", T.StringType()),
    ]
)

_MAGIC_TYPES = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav-or-video/avi",
    b"ID3": "audio/mp3",
    b"\x00\x00\x00": "video/mp4-family",
}


def attach_media_metadata(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Typed metadata for a binary column: size, content hash, sniffed
    type.  Pure column expressions — hashing/sniffing stays JVM-side."""
    b = F.col(binary_col)
    magic = F.hex(F.expr(f"substring({binary_col}, 1, 4)"))
    detected = F.lit("application/octet-stream")
    for prefix, mime in _MAGIC_TYPES.items():
        detected = F.when(
            F.expr(f"substring({binary_col}, 1, {len(prefix)})") == F.lit(prefix), mime
        ).otherwise(detected)
    return df.withColumns(
        {
            "size_bytes": F.length(b).cast("long"),
            "content_hash": F.sha2(b, 256),
            "magic": magic,
            "detected_type": detected,
        }
    )


def deterministic_fake_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decoder: a feature vector
    derived from the content hash.  Replace with a real codec
    (PIL/librosa/ffmpeg) when available."""
    h = hashlib.sha256(payload).digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    return [
        int.from_bytes(raw[i * 4 : (i + 1) * 4], "big") / 2**32 for i in range(dim)
    ]


def extract_features(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "media_id",
    dim: int = 16,
    decode_fn=None,
) -> DataFrame:
    """Feature extraction over a binary column via ``mapInPandas``.

    ``decode_fn: bytes -> list[float]`` is the codec seam; defaults to
    the deterministic fake.  Passing ``decode_fn='real'`` raises
    ``NotImplementedError`` to mark where a real image/audio decoder
    plugs in.
    """
    if decode_fn == "real":
        raise NotImplementedError(
            "Real media decoding requires PIL/librosa/ffmpeg, not present "
            "in this environment; supply decode_fn=bytes->list[float]."
        )
    fn = decode_fn or (lambda b: deterministic_fake_features(b, dim))
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [fn(bytes(x)) for x in pdf[binary_col]],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "media_id",
    every_n_bytes: int = 1024,
    frame_size: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """'Frame sampling' over opaque video bytes: fixed-stride byte
    windows standing in for decoded frames (real decoder = ffmpeg seam).
    Emits one row per sampled frame — the explode shape a real
    frame-sampler would produce."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload)
                for k in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    start = k * every_n_bytes
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(data[start : start + frame_size])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame_bytes": frames})

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


def resize_media(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "media_id",
    target_width: int = 224,
    target_height: int = 224,
    resize_fn=None,
) -> DataFrame:
    """Resize over a binary image column via ``mapInPandas`` — the
    preprocessing step a vision-training pipeline runs before feature
    extraction (real codec = PIL seam, like ``extract_features``).

    ``resize_fn: (bytes, w, h) -> bytes`` is the codec seam; passing
    ``resize_fn='real'`` raises ``NotImplementedError``.  The
    deterministic stand-in strides the payload down to w*h bytes, so
    output size is exactly what a (w, h, 1-channel) decode would
    produce and downstream plumbing (schema, batch shape, size
    accounting) is exercised for real.
    """
    if resize_fn == "real":
        raise NotImplementedError(
            "Real image resizing requires PIL/opencv, not present in this "
            "environment; supply resize_fn=(bytes, w, h)->bytes."
        )

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        target = w * h
        if len(payload) >= target:
            stride = max(1, len(payload) // target)
            return payload[::stride][:target]
        reps = target // max(1, len(payload)) + 1
        return (payload * reps)[:target]

    fn = resize_fn or _fake_resize
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": [
                        fn(bytes(x), target_width, target_height)
                        for x in pdf[binary_col]
                    ],
                    "width": target_width,
                    "height": target_height,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------------
# REAL container-header parsing — pure byte arithmetic, no codec
# libraries, so unlike the decode seams above this transform is fully
# exercisable in any environment: PNG IHDR, JPEG SOF frame headers,
# and WAV fmt chunks yield actual dimensions / sample formats.
# ---------------------------------------------------------------------------

HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate_hz", T.IntegerType()),
    ]
)


def parse_header(data: bytes) -> dict:
    """Parse real container headers from raw bytes (no codec libs):

    - PNG: IHDR chunk at offset 8 -> width/height/bit depth/color type
    - JPEG: scan markers for SOF0/1/2 -> height/width/components
    - WAV: RIFF/WAVE fmt chunk -> channels/sample rate/bits per sample

    Returns a dict with None for fields the container doesn't carry;
    ``container`` is 'unknown' when no signature matches.
    """
    out = {
        "container": "unknown",
        "width": None,
        "height": None,
        "bit_depth": None,
        "channels": None,
        "sample_rate_hz": None,
    }
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        out["container"] = "png"
        out["width"] = int.from_bytes(data[16:20], "big")
        out["height"] = int.from_bytes(data[20:24], "big")
        if len(data) >= 26:
            out["bit_depth"] = data[24]
            # color type -> channel count (grayscale/rgb/palette/ga/rgba)
            out["channels"] = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(data[25])
        return out
    if len(data) >= 4 and data[:3] == b"\xff\xd8\xff":
        out["container"] = "jpeg"
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            # JPEG permits runs of 0xFF fill bytes before a marker —
            # skip them or the fill byte is read as the marker and the
            # segment-length read is misaligned
            while data[i + 1] == 0xFF and i + 10 < len(data):
                i += 1
            marker = data[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                out["bit_depth"] = data[i + 4]
                out["height"] = int.from_bytes(data[i + 5 : i + 7], "big")
                out["width"] = int.from_bytes(data[i + 7 : i + 9], "big")
                out["channels"] = data[i + 9]
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            i += 2 + seg_len
        return out
    if (
        len(data) >= 36
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
        and data[12:16] == b"fmt "
    ):
        out["container"] = "wav"
        out["channels"] = int.from_bytes(data[22:24], "little")
        out["sample_rate_hz"] = int.from_bytes(data[24:28], "little")
        out["bit_depth"] = int.from_bytes(data[34:36], "little")
        return out
    return out


def parse_media_headers(
    df: DataFrame, binary_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Container-header extraction over a binary column — REAL parsing
    (unlike the decode seams): one Arrow-batched ``mapInPandas`` pass,
    payloads never shuffle, output carries only the header fields."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [parse_header(bytes(x)) for x in pdf[binary_col]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf[id_col].values)
            yield out

    return df.select(
        F.col(id_col).alias(id_col), F.col(binary_col)
    ).mapInPandas(batches, HEADER_SCHEMA)
