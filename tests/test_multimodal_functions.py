"""Multimodal plumbing + scalar-function helper tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from robosystems_spark.functions import (
    apply_decimal_scaling,
    content_hash_id,
    deterministic_uuid,
    externalize_large_values,
)
from robosystems_spark.functions.external import resolve_external
from robosystems_spark.operators.multimodal import (
    attach_media_metadata,
    deterministic_fake_features,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n" + b"x" * 100),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 50),
        (3, b"plainbytes" * 30),
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_media_metadata(spark, media):
    out = {r["media_id"]: r for r in attach_media_metadata(media).collect()}
    assert out[1]["detected_type"] == "image/png"
    assert out[2]["detected_type"] == "image/jpeg"
    assert out[3]["detected_type"] == "application/octet-stream"
    assert out[1]["size_bytes"] == 106
    payload = b"\x89PNG\r\n" + b"x" * 100
    assert out[1]["content_hash"] == hashlib.sha256(payload).hexdigest()


def test_feature_extraction_batch_shape(spark, media):
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 3
    for r in feats:
        assert len(r["features"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["features"])
    # deterministic: same content -> same features
    payload = b"plainbytes" * 30
    expected = deterministic_fake_features(payload, 16)
    got = [r["features"] for r in feats if r["media_id"] == 3][0]
    assert got == pytest.approx(expected)


def test_real_decoder_seam_is_marked(spark, media):
    with pytest.raises(NotImplementedError, match="decoding"):
        extract_features(media, decode_fn="real")


def test_frame_sampling(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 20)], "media_id long, content binary"
    )
    frames = sample_frames(df, every_n_bytes=1024, frame_size=64, max_frames=4).collect()
    assert len(frames) == 4
    assert [r["frame_index"] for r in frames] == [0, 1, 2, 3]
    assert all(len(r["frame_bytes"]) == 64 for r in frames)


def test_content_hash_ids(spark):
    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], ["u", "n"])
    out = df.select(
        content_hash_id("u", "n", prefix="fact_").alias("id"),
        deterministic_uuid("u", "n").alias("uid"),
    ).collect()
    assert out[0]["id"] == out[1]["id"] != out[2]["id"]
    assert out[0]["id"].startswith("fact_")
    assert len(out[0]["uid"]) == 36 and out[0]["uid"].count("-") == 4
    # null-safety: null and empty string must hash differently
    df2 = spark.createDataFrame([(None, 1), ("", 1)], "u string, n int")
    ids = [r["id"] for r in df2.select(content_hash_id("u", "n").alias("id")).collect()]
    assert ids[0] != ids[1]


def test_decimal_scaling(spark):
    df = spark.createDataFrame(
        [(1234.0, "-3"), (5.5, "2"), (7.0, "INF"), (9.0, None)],
        "raw double, decimals string",
    )
    out = df.select(
        apply_decimal_scaling("raw", "decimals", scale_up=True).alias("v")
    ).collect()
    assert [r["v"] for r in out] == [pytest.approx(1.234), pytest.approx(550.0), 7.0, 9.0]
    passthrough = df.select(apply_decimal_scaling("raw", "decimals").alias("v")).collect()
    assert [r["v"] for r in passthrough] == [1234.0, 5.5, 7.0, 9.0]


def test_externalize_large_values(spark, tmp_path):
    store = str(tmp_path / "store")
    big = "Z" * 5000
    df = spark.createDataFrame([(1, "small"), (2, big)], "id long, value string")
    out = {r["id"]: r["value"] for r in
           externalize_large_values(df, "value", store, threshold_bytes=1024).collect()}
    assert out[1] == "small"
    assert out[2].startswith("external://")
    assert resolve_external(out[2], store) == big
    # idempotent second run produces the same pointer
    out2 = {r["id"]: r["value"] for r in
            externalize_large_values(df, "value", store, threshold_bytes=1024).collect()}
    assert out2[2] == out[2]


def test_resize_media_shape_and_determinism(spark):
    from robosystems_spark.operators.multimodal import resize_media

    rows = [(1, b"\x89PNG" + bytes(range(256)) * 40), (2, b"\xff\xd8\xffsmall")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in resize_media(df, target_width=16, target_height=8).collect()}
    # every output is exactly w*h bytes (the 1-channel decode contract)
    assert all(len(r["resized"]) == 16 * 8 for r in out.values())
    assert out[1]["width"] == 16 and out[1]["height"] == 8
    # deterministic across runs
    again = {r["media_id"]: r["resized"] for r in resize_media(df, target_width=16, target_height=8).collect()}
    assert {k: v["resized"] for k, v in out.items()} == again
    # the real-codec seam is explicit
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        resize_media(df, resize_fn="real")


def _png(w, h, bit_depth=8, color_type=6):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, 0])
        + b"\x00\x00\x00\x00"
    )


def _jpeg(w, h):
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(rate, channels=2, bits=16):
    return (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * bits // 8).to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )


def test_parse_media_headers_real_containers(spark):
    """REAL header parsing (no codec libs): PNG IHDR, JPEG SOF0, WAV
    fmt — actual dimensions and sample formats from raw bytes."""
    from robosystems_spark.operators.multimodal import parse_media_headers

    rows = [
        (1, _png(640, 480)),
        (2, _jpeg(1024, 768)),
        (3, _wav(44100, channels=1, bits=24)),
        (4, b"not a media file at all"),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    out = {r["media_id"]: r for r in parse_media_headers(df).collect()}
    png = out[1]
    assert png["container"] == "png" and (png["width"], png["height"]) == (640, 480)
    assert png["bit_depth"] == 8 and png["channels"] == 4  # RGBA
    jpg = out[2]
    assert jpg["container"] == "jpeg" and (jpg["width"], jpg["height"]) == (1024, 768)
    assert jpg["channels"] == 3
    wav = out[3]
    assert wav["container"] == "wav" and wav["sample_rate_hz"] == 44100
    assert wav["channels"] == 1 and wav["bit_depth"] == 24
    assert out[4]["container"] == "unknown" and out[4]["width"] is None


def test_parse_header_pure_function_jpeg_marker_walk(spark):
    """The JPEG walk skips a padding APPn segment before SOF0 (real
    files put EXIF/quant tables first)."""
    from robosystems_spark.operators.multimodal import parse_header

    h = parse_header(_jpeg(33, 77))
    assert (h["width"], h["height"]) == (33, 77)
    # truncated payloads degrade to unknown/None, never raise
    assert parse_header(b"\xff\xd8\xff")["width"] is None
    assert parse_header(b"")["container"] == "unknown"


def test_parse_header_jpeg_fill_bytes_before_marker(spark):
    """JPEG permits runs of 0xFF padding before a marker; the scanner
    must skip fill bytes instead of reading 0xFF as the marker and
    misaligning the segment-length read (r5-cycle advice bug)."""
    from robosystems_spark.operators.multimodal import parse_header

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
        + (77).to_bytes(2, "big") + (33).to_bytes(2, "big") + bytes([3])
        + b"\x00" * 9
    )
    # fill bytes between APP0 and SOF0, and straight after SOI
    padded = b"\xff\xd8" + b"\xff\xff" + app0 + b"\xff\xff\xff" + sof0 + b"\xff\xd9"
    h = parse_header(padded)
    assert h["container"] == "jpeg"
    assert (h["width"], h["height"]) == (33, 77)
    assert h["channels"] == 3 and h["bit_depth"] == 8
    # a pathological all-0xFF tail still terminates without raising
    assert parse_header(b"\xff\xd8\xff" + b"\xff" * 64)["width"] is None


def test_bmp_decode_golden_bytes(spark):
    """Byte-level BMP decode: row padding, bottom-up layout, BGR order
    — a hand-assembled 2x2 24-bit BMP with known pixels."""
    import numpy as np

    from robosystems_spark.operators.multimodal import decode_bmp, encode_bmp

    # pixels (RGB): top row [red, green], bottom row [blue, white]
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    # hand-build: 2*3=6 bytes/row padded to 8; bottom-up; BGR
    row_bottom = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    header = (
        b"BM" + (54 + 16).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (16).to_bytes(4, "little")
        + b"\x00" * 16
    )
    data = header + row_bottom + row_top
    assert (decode_bmp(data) == img).all()
    # encode is the exact inverse (including the padding bytes)
    assert decode_bmp(encode_bmp(img)).tolist() == img.tolist()
    # top-down (negative height) variant
    neg = bytearray(encode_bmp(img))
    h = int.from_bytes(neg[22:26], "little")
    neg[22:26] = (-h).to_bytes(4, "little", signed=True)
    body = bytearray(neg[:54])
    body += row_top + row_bottom  # top-down order now
    assert (decode_bmp(bytes(body)) == img).all()
    import pytest as _pytest

    # RLE8 now decodes for 8-bpp (see test_bmp_palette_rle_and_32bit);
    # an RLE8 flag on a 24-bpp stream is malformed
    with _pytest.raises(ValueError):
        decode_bmp(header[:30] + (1).to_bytes(4, "little") + header[34:] + b"\x00" * 16)
    # an RLE4 flag on a 24-bpp stream is likewise malformed
    with _pytest.raises(ValueError):
        decode_bmp(header[:30] + (2).to_bytes(4, "little") + header[34:] + b"\x00" * 16)


def test_wav_pcm_decode_golden_bytes(spark):
    """RIFF chunk walking: an extra chunk before fmt, odd-length chunk
    padding, 8-bit and 16-bit PCM, non-PCM rejection."""
    import numpy as np
    import pytest as _pytest

    from robosystems_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    s = np.array([0, 1000, -1000, 32767, -32768, 7], dtype=np.int16)
    base = encode_wav_pcm(s, 44100, 2)
    out, rate = decode_wav_pcm(base)
    assert rate == 44100 and out.shape == (3, 2) and (out.reshape(-1) == s).all()

    # inject a junk chunk with ODD length before fmt: the walker must
    # skip its pad byte or everything after is misaligned
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    padded = base[:12] + junk + base[12:]
    padded = padded[:4] + (len(padded) - 8).to_bytes(4, "little") + padded[8:]
    out2, rate2 = decode_wav_pcm(padded)
    assert rate2 == 44100 and (out2 == out).all()

    # 8-bit unsigned PCM: 128 decodes to 0
    fmt8 = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    body8 = bytes([128, 255, 0])
    wav8 = (
        b"RIFF" + (4 + 8 + len(fmt8) + 8 + len(body8) + 1).to_bytes(4, "little")
        + b"WAVE" + b"fmt " + len(fmt8).to_bytes(4, "little") + fmt8
        + b"data" + len(body8).to_bytes(4, "little") + body8 + b"\x00"
    )
    out8, rate8 = decode_wav_pcm(wav8)
    assert rate8 == 8000 and out8.reshape(-1).tolist() == [0, 127, -128]

    # IEEE float now decodes (see test_wav_extended_formats); a
    # format-3 header with an illegal 8-bit width is a stream error
    float_fmt = (3).to_bytes(2, "little") + fmt8[2:]
    bad = wav8.replace(fmt8, float_fmt)
    with _pytest.raises(ValueError):
        decode_wav_pcm(bad)


def test_ppm_decode_comments_and_errors(spark):
    import numpy as np
    import pytest as _pytest

    from robosystems_spark.operators.multimodal import decode_image, decode_ppm

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = b"P6\n# a comment\n3 # inline\n2\n255\n" + img.tobytes()
    assert (decode_ppm(data) == img).all()
    assert (decode_image(data) == img).all()  # dispatch by magic
    with _pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n3 2\n255\n" + img.tobytes()[:-1])
    # PNG and baseline JPEG decode for REAL now — malformed streams are
    # ValueErrors, not codec seams (the seams moved inside the codecs:
    # progressive/subsampled JPEG, 16-bit/interlaced PNG).
    with _pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 20)


def test_image_and_audio_stats_distributed(spark):
    """The stats operators run the REAL decoders inside mapInPandas
    (Arrow-batched) and return exact scalars."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        audio_clip_stats,
        encode_bmp,
        encode_wav_pcm,
        image_channel_stats,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[:, :, 0] = [[10, 20], [30, 40]]  # R channel
    img[:, :, 2] = 200  # B channel
    rows = [(1, bytearray(encode_bmp(img)))]
    df = spark.createDataFrame(rows, "media_id LONG, content BINARY")
    r = image_channel_stats(df).collect()[0]
    assert (r["width"], r["height"]) == (2, 2)
    assert r["mean_r"] == 25.0 and r["mean_g"] == 0.0 and r["mean_b"] == 200.0
    assert r["corner_r"] == 10

    s = np.array([3, -4, 0, 0], dtype=np.int16)  # rms = sqrt(25/4) = 2.5
    adf = spark.createDataFrame(
        [(7, bytearray(encode_wav_pcm(s, 16000, 1)))],
        "media_id LONG, content BINARY",
    )
    a = audio_clip_stats(adf).collect()[0]
    assert a["sample_rate_hz"] == 16000 and a["channels"] == 1
    assert a["n_samples"] == 4 and a["rms"] == 2.5 and a["peak"] == 4


def test_mp4_box_walker_golden_and_edge_cases():
    """Byte-level contract for the ISO BMFF walker: golden sizes for
    the stub encoder, version-1 mvhd (64-bit duration), unknown boxes
    skipped by declared size, truncated trees degrade gracefully."""
    from robosystems_spark.operators.multimodal import (
        _box,
        encode_mp4_stub,
        parse_mp4,
    )

    b = encode_mp4_stub(600, timescale=600, n_tracks=1)
    # golden: ftyp payload = brand(4)+minor(4)+compat(8) -> box of 24
    assert b[:4] == (24).to_bytes(4, "big") and b[4:8] == b"ftyp"
    m = parse_mp4(b)
    assert m["duration_ms"] == 1000 and m["n_tracks"] == 1
    assert m["major_brand"] == "isom"

    # version-1 mvhd: u64 creation/modification, u32 timescale, u64 duration
    mvhd_v1 = _box(
        b"mvhd",
        b"\x01\x00\x00\x00"
        + (0).to_bytes(8, "big")
        + (0).to_bytes(8, "big")
        + (90000).to_bytes(4, "big")
        + (270000).to_bytes(8, "big")
        + b"\x00" * 80,
    )
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isommp42")
    tree = ftyp + _box(b"moov", mvhd_v1 + _box(b"trak", b"") * 0)
    m1 = parse_mp4(tree)
    assert m1["timescale"] == 90000 and m1["duration_ticks"] == 270000
    assert m1["duration_ms"] == 3000

    # unknown sibling boxes are skipped by size, not parsed
    noisy = ftyp + _box(b"free", b"\xde\xad" * 8) + _box(
        b"moov", mvhd_v1 + _box(b"trak", b"") + _box(b"udta", b"x" * 3) + _box(b"trak", b"")
    )
    mn = parse_mp4(noisy)
    assert mn["n_tracks"] == 2 and mn["timescale"] == 90000

    # truncation: declared size overruns the buffer -> stop, keep what parsed
    assert parse_mp4(tree[:30])["timescale"] is None
    assert parse_mp4(b"")["container"] == "unknown"
    assert parse_mp4(b"\x00" * 40)["container"] == "unknown"


def test_mp4_walker_largesize_and_size0_boxes():
    """ISO BMFF top-level edge encodings: size==1 means a 64-bit
    largesize follows the fourcc, size==0 means the box runs to end of
    file; a truncated largesize header degrades to the parsed prefix."""
    from robosystems_spark.operators.multimodal import _box, parse_mp4

    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isommp42")
    mvhd = _box(
        b"mvhd",
        b"\x00" * 4
        + (0).to_bytes(4, "big") * 2
        + (600).to_bytes(4, "big")
        + (1200).to_bytes(4, "big")
        + b"\x00" * 80,
    )
    payload = mvhd + _box(b"trak", b"x" * 8)

    large = (1).to_bytes(4, "big") + b"moov" + (16 + len(payload)).to_bytes(8, "big") + payload
    m = parse_mp4(ftyp + large)
    assert (m["timescale"], m["duration_ms"], m["n_tracks"]) == (600, 2000, 1)

    zero = (0).to_bytes(4, "big") + b"moov" + payload
    m0 = parse_mp4(ftyp + zero)
    assert (m0["timescale"], m0["n_tracks"]) == (600, 1)

    assert parse_mp4(ftyp + (1).to_bytes(4, "big") + b"moov")["timescale"] is None


def test_png_decode_golden_bytes():
    """Byte-level PNG decode against a HAND-ASSEMBLED file (independent
    of encode_png): chunk grammar, split IDAT streams, and Sub/Up/
    Average/Paeth unfiltering with hand-computed reconstructions."""
    import zlib

    import numpy as np
    import pytest

    from robosystems_spark.operators.multimodal import decode_png

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # 2x4 RGB, stride 6, bpp 3; four rows, one per nontrivial filter.
    # row0 Sub:  raw [10,20,30, 5,5,5]   -> recon [10,20,30,15,25,35]
    # row1 Up:   raw [1,2,3, 4,5,6]      -> recon [11,22,33,19,30,41]
    # row2 Avg:  raw [7,8,9, 1,1,1]      -> recon pixel0 = raw + (0+up)//2
    #            = [7+5, 8+11, 9+16, ...] with up=[11,22,33,19,30,41]:
    #            x0: 7+(0+11)//2=12; x1: 8+(0+22)//2=19; x2: 9+(0+33)//2=25
    #            x3: 1+((12+19)//2)=16; x4: 1+((19+30)//2)=25; x5: 1+((25+41)//2)=34
    # row3 Paeth: raw [2,2,2, 3,3,3] with up=row2, upleft lanes:
    #            x<bpp: pred=up -> [2+12,2+19,2+25]=[14,21,27]
    #            x3: a=14,b=16,c=12 -> p=18, pa=4,pb=2,pc=6 -> pred=b=16 -> 19
    #            x4: a=21,b=25,c=19 -> p=27, pa=6,pb=2,pc=8 -> pred=25 -> 28
    #            x5: a=27,b=34,c=25 -> p=36, pa=9,pb=2,pc=11 -> pred=34 -> 37
    scan = (
        b"\x01" + bytes([10, 20, 30, 5, 5, 5])
        + b"\x02" + bytes([1, 2, 3, 4, 5, 6])
        + b"\x03" + bytes([7, 8, 9, 1, 1, 1])
        + b"\x04" + bytes([2, 2, 2, 3, 3, 3])
    )
    comp = zlib.compress(scan)
    ihdr = (
        (2).to_bytes(4, "big") + (4).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    # split the IDAT stream across two chunks: decoders must concatenate
    data = (
        sig + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp[:7]) + chunk(b"IDAT", comp[7:])
        + chunk(b"IEND", b"")
    )
    expected = np.array(
        [
            [[10, 20, 30], [15, 25, 35]],
            [[11, 22, 33], [19, 30, 41]],
            [[12, 19, 25], [16, 25, 34]],
            [[14, 21, 27], [19, 28, 37]],
        ],
        dtype=np.uint8,
    )
    got = decode_png(data)
    assert got.shape == (4, 2, 3)
    assert (got == expected).all()

    # 16-bit and sub-byte depths are now REAL (see the dedicated
    # tests); a 16-bit header over 8-bit-sized scanlines is a size
    # error, and spec-ILLEGAL depth/color combos are rejected
    bad_ihdr = (
        (2).to_bytes(4, "big") + (4).to_bytes(4, "big")
        + bytes([16, 2, 0, 0, 0])
    )
    bad = sig + chunk(b"IHDR", bad_ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)
    illegal_ihdr = (
        (2).to_bytes(4, "big") + (4).to_bytes(4, "big")
        + bytes([4, 2, 0, 0, 0])  # 4-bit RGB does not exist in the spec
    )
    illegal = (
        sig + chunk(b"IHDR", illegal_ihdr) + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(illegal)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNX" + data[4:])


def test_png_adam7_interlaced_decode():
    """Adam7 de-interlacing: a hand-built 7-pass IDAT stream (each pass
    an independently-filtered sub-image) must scatter back to the
    original pixels; a 9x5 image also exercises partial passes."""
    import zlib

    import numpy as np
    import pytest

    from robosystems_spark.operators.multimodal import decode_png

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    sig = b"\x89PNG\r\n\x1a\n"
    passes = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )

    def build_interlaced(img: np.ndarray) -> bytes:
        h, w, ch = img.shape
        scan = bytearray()
        for x0, y0, dx, dy in passes:
            sub = img[y0::dy, x0::dx, :]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            flat = sub.reshape(ph, pw * ch)
            for r in range(ph):
                if r == 0:
                    scan += b"\x00" + flat[r].tobytes()  # filter None
                else:  # filter Up: exercises per-pass prev-row state
                    scan += b"\x02" + ((flat[r].astype(np.int16)
                                        - flat[r - 1]) & 0xFF).astype(
                        np.uint8
                    ).tobytes()
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 1])  # RGB, Adam7
        )
        return (
            sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(scan)))
            + chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(5)
    for shape in [(8, 8, 3), (9, 5, 3), (16, 11, 3), (1, 1, 3), (3, 2, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(build_interlaced(img))
        assert got.shape == img.shape, shape
        assert (got == img).all(), shape
    # unknown interlace method is an error
    bad_ihdr = (
        (2).to_bytes(4, "big") + (2).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 7])
    )
    with pytest.raises(ValueError):
        decode_png(
            sig + chunk(b"IHDR", bad_ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )

    # palette (color type 3): index bytes map through PLTE to RGB.
    # 3x2 image, filter 0 rows, palette [red, green, blue, white].
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    pscan = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 3, 0])
    pihdr = (
        (3).to_bytes(4, "big") + (2).to_bytes(4, "big")
        + bytes([8, 3, 0, 0, 0])
    )
    pdata = (
        sig + chunk(b"IHDR", pihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(pscan)) + chunk(b"IEND", b"")
    )
    pexp = np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
            [[0, 0, 255], [255, 255, 255], [255, 0, 0]],
        ],
        dtype=np.uint8,
    )
    assert (decode_png(pdata) == pexp).all()
    # palette PNG without PLTE, and out-of-range index, are errors
    with pytest.raises(ValueError):
        decode_png(sig + chunk(b"IHDR", pihdr)
                   + chunk(b"IDAT", zlib.compress(pscan)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(
            sig + chunk(b"IHDR", pihdr) + chunk(b"PLTE", plte[:9])
            + chunk(b"IDAT", zlib.compress(pscan)) + chunk(b"IEND", b"")
        )


def test_png_roundtrip_every_filter_and_channel_count():
    """encode_png cycles row filters None/Sub/Up/Average/Paeth; decode
    must invert all of them for gray, gray+alpha, RGB, and RGBA."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        a = rng.randint(0, 256, size=(11, 5, ch), dtype=np.uint8)
        assert (decode_png(encode_png(a)) == a).all(), f"channels={ch}"
    # correlated data (gradients) stresses Average/Paeth predictions
    g = (np.arange(9 * 7 * 3) % 251).astype(np.uint8).reshape(9, 7, 3)
    assert (decode_png(encode_png(g)) == g).all()
    # dispatch by magic
    assert decode_image(encode_png(g)).shape == (9, 7, 3)


def test_jpeg_baseline_roundtrip_error_bounds():
    """Pure-numpy baseline JPEG codec: constant blocks (DC-only) must
    round-trip within +-1; q=1 tables are near-lossless (+-3 incl.
    YCbCr rounding); flat q=16 keeps gradients above 30 dB PSNR; the
    decoder reads arbitrary DQT/DHT from the stream."""
    import numpy as np
    import pytest

    from robosystems_spark.operators.jpeg import decode_jpeg, encode_jpeg

    a = np.full((16, 24, 3), 77, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(a))
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 1

    rng = np.random.RandomState(0)
    q1 = np.ones((8, 8), dtype=int)
    b = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(b, q_luma=q1, q_chroma=q1))
    assert int(np.abs(d.astype(int) - b.astype(int)).max()) <= 3

    g = (np.arange(32 * 40 * 3) % 256).astype(np.uint8).reshape(32, 40, 3)
    d = decode_jpeg(encode_jpeg(g))
    mse = ((d.astype(float) - g.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30

    # grayscale single-component stream
    gray = (np.arange(17 * 19) % 256).astype(np.uint8).reshape(17, 19)
    d = decode_jpeg(encode_jpeg(gray))
    assert d.shape == (17, 19, 1)

    # non-baseline markers are honest seams, garbage is an error
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00")
    enc = bytearray(encode_jpeg(a))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic coding)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    # SOF2 now dispatches to the real progressive decoder — a
    # baseline-shaped scan header under SOF2 is a malformed stream
    # (DC scan with Se=63), rejected loudly rather than mis-decoded
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


def test_jpeg_decode_via_dispatch_and_channel_stats(spark):
    """decode_image dispatches JPEG by magic and the channel-stats
    operator consumes real JPEG payloads end to end."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from robosystems_spark.operators.jpeg import encode_jpeg
    from robosystems_spark.operators.multimodal import (
        decode_image,
        image_channel_stats,
    )

    a = np.full((8, 8, 3), 200, dtype=np.uint8)
    assert decode_image(encode_jpeg(a)).shape == (8, 8, 3)

    rows = [(i, encode_jpeg(np.full((8, 8, 3), 10 * i, dtype=np.uint8)))
            for i in range(5)]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]),
    )
    out = {r["media_id"]: r for r in image_channel_stats(df).collect()}
    for i in range(5):
        assert abs(out[i]["mean_r"] - 10 * i) <= 1.0
        assert out[i]["width"] == 8 and out[i]["height"] == 8


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 chroma subsampling (the near-universal web/camera layout):
    MCU = 4 luma + Cb + Cr; constant images round-trip exactly,
    constant-hue gradients within +-1 at q=1, textured color stays
    above 35 dB PSNR, odd dimensions crop correctly."""
    import numpy as np

    from robosystems_spark.operators.jpeg import decode_jpeg, encode_jpeg

    c = np.full((24, 40, 3), 130, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(c, subsample=True))
    assert d.shape == (24, 40, 3)
    assert int(np.abs(d.astype(int) - c.astype(int)).max()) == 0

    q1 = np.ones((8, 8), dtype=int)
    y = np.linspace(30, 220, 32 * 48).reshape(32, 48)
    img = np.stack([y, y, y], axis=2).astype(np.uint8)  # constant chroma
    d = decode_jpeg(encode_jpeg(img, subsample=True, q_luma=q1, q_chroma=q1))
    assert int(np.abs(d.astype(int) - img.astype(int)).max()) <= 1

    x = np.arange(48 * 48 * 3).reshape(48, 48, 3)
    img = ((np.sin(x / 97.0) + 1) * 127).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, subsample=True))
    mse = ((d.astype(float) - img.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 35

    rng = np.random.RandomState(1)
    o = rng.randint(0, 256, (17, 21, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(o, subsample=True)).shape == (17, 21, 3)


def test_jpeg_restart_intervals_roundtrip():
    """DRI + RSTn markers (common in camera JPEGs): the decoder must
    re-sync at the byte boundary and reset DC predictors at every
    restart; round-trip error bounds are unchanged."""
    import numpy as np

    from robosystems_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(3)
    q1 = np.ones((8, 8), dtype=int)
    a = rng.randint(0, 256, (32, 48, 3), dtype=np.uint8)
    for ri in (1, 2, 5):
        enc = encode_jpeg(a, q_luma=q1, q_chroma=q1, restart_interval=ri)
        assert any(bytes([0xFF, 0xD0 + m]) in enc for m in range(8))
        d = decode_jpeg(enc)
        assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 3
    # 4:2:0 with restarts on a constant-chroma image
    y = np.linspace(20, 230, 40 * 56).reshape(40, 56)
    img = np.stack([y, y, y], axis=2).astype(np.uint8)
    d = decode_jpeg(
        encode_jpeg(img, subsample=True, q_luma=q1, q_chroma=q1, restart_interval=3)
    )
    assert int(np.abs(d.astype(int) - img.astype(int)).max()) <= 1


def test_gif_lzw_roundtrip_and_edge_cases():
    """GIF LZW codec: palette round-trips are LOSSLESS; dictionary
    growth through 9-12 bit codes, CLEAR-on-overflow, the KwKwK
    decoder case, 4-pass interlace, and dispatch by magic."""
    import numpy as np
    import pytest

    from robosystems_spark.operators.gif import (
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        encode_gif,
    )
    from robosystems_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (7, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 7, (23, 31))]
    assert (decode_gif(encode_gif(img)) == img).all()
    assert (decode_image(encode_gif(img)) == img).all()  # magic dispatch

    # interlaced
    timg = pal[rng.randint(0, 7, (17, 9))]
    assert (decode_gif(encode_gif(timg, interlace=True)) == timg).all()

    # 256 distinct colors: forces code-width growth + CLEAR emission
    gray = rng.randint(0, 256, (64, 64, 1)).repeat(3, axis=2).astype(np.uint8)
    assert (decode_gif(encode_gif(gray)) == gray).all()

    # KwKwK: a run of identical symbols makes the decoder read a code
    # equal to next_code before the table entry exists
    seq = np.zeros(5, dtype=np.uint8)
    assert (_lzw_decode(_lzw_encode(seq, 2), 2, 5) == seq).all()

    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF")
    # > 256 distinct colors is refused (GIF is palette-only)
    yy, xx = np.mgrid[0:17, 0:17]
    many = np.stack([xx * 15, yy * 15, xx + yy], axis=2).astype(np.uint8)
    with pytest.raises(ValueError):
        encode_gif(many)


def test_gif_animation_compose_disposals():
    """Animated GIF: frame composition onto the logical screen with
    disposal 0-3, GCE transparency, frame deltas at offsets."""
    import numpy as np

    from robosystems_spark.operators.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    red = np.zeros((8, 10, 3), np.uint8); red[:, :, 0] = 200
    blue_sq = np.zeros((3, 4, 4), np.uint8)
    blue_sq[:, :, 2] = 220
    blue_sq[:, :, 3] = 255

    # --- disposal 1 (keep): delta frame persists into frame 3's base
    delta3 = np.zeros((2, 2, 4), np.uint8)
    delta3[:, :, 1] = 180
    delta3[:, :, 3] = 255
    data = encode_gif_animation(
        [red, blue_sq, delta3],
        delays_cs=[10, 20, 30],
        disposals=[1, 1, 1],
        offsets=[(0, 0), (2, 3), (7, 1)],
    )
    frames = decode_gif_frames(data)
    assert len(frames) == 3
    assert [f["delay_cs"] for f in frames] == [10, 20, 30]
    f1, f2, f3 = (f["image"] for f in frames)
    assert f1.shape == (8, 10, 4)
    assert (f1[:, :, 0] == 200).all() and (f1[:, :, 3] == 255).all()
    # frame 2 = red with blue square at x=2,y=3
    assert (f2[3:6, 2:6, 2] == 220).all()
    assert (f2[0, 0] == [200, 0, 0, 255]).all()
    # frame 3 keeps the blue square (disposal 1) and adds green at x=7,y=1
    assert (f3[3:6, 2:6, 2] == 220).all()
    assert (f3[1:3, 7:9, 1] == 180).all()
    # single-frame decode still returns the first frame's own rect
    assert (decode_gif(data) == red).all()

    # --- disposal 2 (restore to background): square's rect cleared
    data2 = encode_gif_animation(
        [red, blue_sq, delta3],
        disposals=[1, 2, 1],
        offsets=[(0, 0), (2, 3), (7, 1)],
    )
    g1, g2, g3 = (f["image"] for f in decode_gif_frames(data2))
    assert (g2[3:6, 2:6, 2] == 220).all()          # visible while shown
    assert (g3[3:6, 2:6, 3] == 0).all()            # cleared after disposal
    assert (g3[0, 0] == [200, 0, 0, 255]).all()    # rest of canvas kept
    assert (g3[1:3, 7:9, 1] == 180).all()

    # --- disposal 3 (restore previous): canvas reverts to frame-1 state
    data3 = encode_gif_animation(
        [red, blue_sq, delta3],
        disposals=[1, 3, 1],
        offsets=[(0, 0), (2, 3), (7, 1)],
    )
    h1, h2, h3 = (f["image"] for f in decode_gif_frames(data3))
    assert (h2[3:6, 2:6, 2] == 220).all()
    assert (h3[3:6, 2:6, 0] == 200).all()          # red restored
    assert (h3[3:6, 2:6, 3] == 255).all()
    assert (h3[1:3, 7:9, 1] == 180).all()


def test_gif_animation_transparency_and_metadata():
    import numpy as np

    from robosystems_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    base = np.zeros((4, 4, 3), np.uint8)
    base[:, :] = [10, 20, 30]
    # delta with a transparent hole: only the border is painted
    delta = np.zeros((4, 4, 4), np.uint8)
    delta[:, :, 0] = 99
    delta[:, :, 3] = 255
    delta[1:3, 1:3, 3] = 0  # hole
    data = encode_gif_animation([base, delta], disposals=[1, 0])
    f1, f2 = (f["image"] for f in decode_gif_frames(data))
    assert (f2[0, 0, :3] == [99, 0, 0]).all()       # painted border
    assert (f2[1, 1, :3] == [10, 20, 30]).all()     # hole shows base
    assert decode_gif_frames(data)[1]["disposal"] == 0
    # NETSCAPE loop block present
    assert b"NETSCAPE2.0" in data


def test_gif_animation_rejects_bad_metadata():
    import numpy as np
    import pytest as _pytest

    from robosystems_spark.operators.gif import encode_gif_animation

    f = np.zeros((2, 2, 3), np.uint8)
    with _pytest.raises(ValueError):
        encode_gif_animation([f], disposals=[7])
    with _pytest.raises(ValueError):
        encode_gif_animation([f, f], delays_cs=[1])
    with _pytest.raises(ValueError):
        encode_gif_animation([])


def test_png_16bit_depth_roundtrip_and_goldens():
    """16-bit PNG: byte-level filters at 2x pixel distance, big-endian
    samples, round(v/257) scale-to-8 — a v*257 expansion of an 8-bit
    image round-trips LOSSLESSLY through the 16-bit container."""
    import numpy as np

    from robosystems_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    for shape in [(6, 5, 3), (4, 4), (7, 3, 4), (5, 9, 2)]:
        img8 = rng.randint(0, 256, size=shape, dtype=np.uint8)
        img16 = img8.astype(np.uint16) * 257  # exact 8->16 expansion
        got = decode_png(encode_png(img16, depth=16))
        want = img8[:, :, None] if img8.ndim == 2 else img8
        assert got.shape == want.shape
        assert (got == want).all(), shape

    # golden: known 16-bit values scale by round(v/257)
    vals = np.array([[0, 257, 258, 65535, 32767, 128]], dtype=np.uint16)
    got = decode_png(encode_png(vals, depth=16))
    assert got.reshape(-1).tolist() == [0, 1, 1, 255, 127, 0]

    # 16-bit Adam7 interlace: hand-build (encode_png is sequential)
    import zlib

    def chunk(typ, payload):
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    img8 = rng.randint(0, 256, size=(9, 5, 3), dtype=np.uint8)
    img16 = img8.astype(np.uint16) * 257
    h, w, ch = img16.shape
    scan = bytearray()
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        sub = img16[y0::dy, x0::dx, :]
        b2 = np.empty((ph, pw, ch, 2), dtype=np.uint8)
        b2[:, :, :, 0] = sub >> 8
        b2[:, :, :, 1] = sub & 0xFF
        flat = b2.reshape(ph, pw * ch * 2)
        for r in range(ph):
            scan += b"\x00" + flat[r].tobytes()
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([16, 2, 0, 0, 1])
    )
    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(data) == img8).all()


def test_png_trns_transparency():
    """tRNS: palette per-entry alpha; gray/RGB color-key matching at
    the source bit depth."""
    import zlib

    import numpy as np

    from robosystems_spark.operators.multimodal import decode_png, encode_png

    # RGB color key (8-bit): key pixels get alpha 0
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = [10, 20, 30]
    img[1, 2] = [10, 20, 30]
    img[0, 1] = [10, 20, 31]  # near-miss must stay opaque
    out = decode_png(encode_png(img, trns=(10, 20, 30)))
    assert out.shape == (2, 3, 4)
    assert out[0, 0, 3] == 0 and out[1, 2, 3] == 0
    assert out[0, 1, 3] == 255 and out[1, 1, 3] == 255
    assert (out[:, :, :3] == img).all()

    # gray key at 16-bit: keyed at source depth BEFORE scaling
    g16 = np.array([[1000, 1001], [65535, 1000]], dtype=np.uint16)
    out = decode_png(encode_png(g16, depth=16, trns=(1000,)))
    assert out.shape == (2, 2, 2)
    assert out[0, 0, 1] == 0 and out[1, 1, 1] == 0
    assert out[0, 1, 1] == 255 and out[1, 0, 1] == 255
    # 1000/257 rounds to 4; near-key 1001 also scales to 4 but opaque
    assert out[0, 0, 0] == 4 and out[0, 1, 0] == 4

    # palette tRNS: per-entry alpha, missing entries opaque
    def chunk(typ, payload):
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    pscan = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 1, 0])
    pihdr = (
        (3).to_bytes(4, "big") + (2).to_bytes(4, "big")
        + bytes([8, 3, 0, 0, 0])
    )
    pdata = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", pihdr) + chunk(b"PLTE", plte)
        + chunk(b"tRNS", bytes([0, 128]))  # entry0 clear, entry1 half
        + chunk(b"IDAT", zlib.compress(pscan)) + chunk(b"IEND", b"")
    )
    out = decode_png(pdata)
    assert out.shape == (2, 3, 4)
    assert out[0, 0].tolist() == [255, 0, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0, 128]
    assert out[0, 2].tolist() == [0, 0, 255, 255]  # beyond tRNS: opaque
    # encoder refuses a tRNS key on alpha-bearing color types
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 4), np.uint8), trns=(0, 0, 0))


def test_png_sub_byte_depths():
    """1/2/4-bit PNG (gray + palette): filters run on the PADDED byte
    scanline with one-byte pixel distance; samples unpack MSB-first;
    gray scales exactly (255 divisible by 2^d-1).  Covers sequential
    + Adam7, non-byte-aligned widths, Sub/Up filters, tRNS keys."""
    import zlib

    import numpy as np

    from robosystems_spark.operators.multimodal import decode_png

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, payload):
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    def pack_rows(samples, depth):
        """(h, w) samples -> padded scanline bytes, MSB-first."""
        h, w = samples.shape
        rows = []
        for r in range(h):
            bits = np.zeros(w * depth, dtype=np.uint8)
            for x in range(w):
                v = int(samples[r, x])
                for b in range(depth):
                    bits[x * depth + b] = (v >> (depth - 1 - b)) & 1
            rows.append(np.packbits(bits).tobytes())
        return rows

    def build(samples, depth, color, plte=None, trns=None, filters=None):
        h, w = samples.shape
        rows = pack_rows(samples, depth)
        stride = (w * depth + 7) // 8
        scan = bytearray()
        prev = b"\x00" * stride
        for r, row in enumerate(rows):
            ft = (filters or [0] * h)[r]
            if ft == 0:
                scan += b"\x00" + row
            elif ft == 1:  # Sub with bpp=1
                arr = np.frombuffer(row, np.uint8).astype(np.int16)
                left = np.concatenate([[0], arr[:-1]])
                scan += b"\x01" + ((arr - left) & 0xFF).astype(np.uint8).tobytes()
            elif ft == 2:  # Up
                arr = np.frombuffer(row, np.uint8).astype(np.int16)
                pr = np.frombuffer(prev, np.uint8).astype(np.int16)
                scan += b"\x02" + ((arr - pr) & 0xFF).astype(np.uint8).tobytes()
            prev = row
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, color, 0, 0, 0])
        )
        out = sig + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        if trns is not None:
            out += chunk(b"tRNS", trns)
        return out + chunk(b"IDAT", zlib.compress(bytes(scan))) + chunk(b"IEND", b"")

    rng = np.random.RandomState(11)
    # gray at each depth, non-byte-aligned width, mixed filters
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        s = rng.randint(0, maxv + 1, size=(5, 11)).astype(np.uint8)
        got = decode_png(build(s, depth, 0, filters=[0, 1, 2, 1, 2]))
        scale = 255 // maxv
        assert got.shape == (5, 11, 1)
        assert (got[:, :, 0] == s * scale).all(), depth

    # 2-bit palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    s = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]], dtype=np.uint8)
    got = decode_png(build(s, 2, 3, plte=plte))
    assert got.shape == (2, 5, 3)
    assert got[0, 3].tolist() == [9, 9, 9] and got[1, 0].tolist() == [9, 9, 9]
    assert got[0, 0].tolist() == [255, 0, 0]

    # 4-bit palette + tRNS per-entry alpha
    plte4 = bytes(bytearray(range(48)))  # 16 entries
    s = np.array([[0, 5, 15], [7, 0, 3]], dtype=np.uint8)
    got = decode_png(build(s, 4, 3, plte=plte4, trns=bytes([0, 200])))
    assert got.shape == (2, 3, 4)
    assert got[0, 0, 3] == 0 and got[1, 1, 3] == 0      # entry 0 clear
    assert got[0, 1, 3] == 255 and got[1, 0, 3] == 255  # beyond tRNS
    assert got[0, 1, :3].tolist() == [15, 16, 17]

    # 1-bit gray with tRNS key (white transparent)
    s = np.array([[1, 0, 1, 1]], dtype=np.uint8)
    got = decode_png(build(s, 1, 0, trns=(1).to_bytes(2, "big")))
    assert got.shape == (1, 4, 2)
    assert got[0, :, 0].tolist() == [255, 0, 255, 255]
    assert got[0, :, 1].tolist() == [0, 255, 0, 0]

    # Adam7 at 2-bit: scatter on the sample grid, per-pass strides
    s = rng.randint(0, 4, size=(9, 7)).astype(np.uint8)
    scan = bytearray()
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        sub = s[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in pack_rows(sub, 2):
            scan += b"\x00" + row
    ihdr = (
        (7).to_bytes(4, "big") + (9).to_bytes(4, "big")
        + bytes([2, 0, 0, 0, 1])
    )
    data = (
        sig + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan))) + chunk(b"IEND", b"")
    )
    got = decode_png(data)
    assert (got[:, :, 0] == s * 85).all()


def test_wav_extended_formats():
    """24/32-bit PCM, IEEE float, and WAVE_FORMAT_EXTENSIBLE decode;
    8-bit unsigned-offset round-trips; sign extension is exact at the
    24-bit extremes."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    # 24-bit: extremes + sign extension
    vals = np.array([-(2**23), 2**23 - 1, 0, -1, 1234567, -1234567])
    got, rate = decode_wav_pcm(encode_wav_pcm(vals, 8000, bits=24))
    assert rate == 8000
    assert got.reshape(-1).tolist() == vals.tolist()

    # 32-bit int PCM
    vals32 = np.array([-(2**31), 2**31 - 1, 7, -7], dtype=np.int64)
    got, _ = decode_wav_pcm(encode_wav_pcm(vals32, 44100, bits=32))
    assert got.reshape(-1).tolist() == vals32.tolist()

    # 8-bit unsigned offset
    vals8 = np.array([-128, 127, 0, 1])
    got, _ = decode_wav_pcm(encode_wav_pcm(vals8, 8000, bits=8))
    assert got.reshape(-1).tolist() == vals8.tolist()

    # IEEE float 32/64: [-1, 1] scaled to int32 domain
    f = np.array([0.0, 0.5, -0.5, 1.0, -1.0])
    for bits in (32, 64):
        got, _ = decode_wav_pcm(
            encode_wav_pcm(f, 16000, bits=bits, float_format=True)
        )
        v = got.reshape(-1)
        assert v[0] == 0
        assert abs(int(v[1]) - 2**30) <= 64  # 0.5 * (2^31-1), f32 rounding
        assert v[3] == 2**31 - 1 and v[4] == -(2**31 - 1)

    # EXTENSIBLE wrapper: real format from the SubFormat GUID
    stereo = np.array([1000, -1000, 2000, -2000])
    got, rate = decode_wav_pcm(
        encode_wav_pcm(stereo, 48000, channels=2, bits=24, extensible=True)
    )
    assert rate == 48000 and got.shape == (2, 2)
    assert got.reshape(-1).tolist() == stereo.tolist()
    gotf, _ = decode_wav_pcm(
        encode_wav_pcm(f, 16000, bits=32, float_format=True, extensible=True)
    )
    assert gotf.reshape(-1)[3] == 2**31 - 1

    # remaining seams stay honest: a perceptual-codec format code
    import pytest as _pytest

    bad = bytearray(encode_wav_pcm(vals8, 8000, bits=8))
    i = bad.find(b"fmt ") + 8
    bad[i:i+2] = (0x55).to_bytes(2, "little")  # MP3-in-WAV
    with _pytest.raises(NotImplementedError):
        decode_wav_pcm(bytes(bad))


def test_wav_g711_companding():
    """G.711 mu-law/A-law: ITU reference golden values, exact
    encode/decode inverse on the quantization lattice, WAV container
    round-trip (formats 7/6), and the standard <=1024 max
    quantization error across the full 16-bit range."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        _g711_alaw_table,
        _g711_ulaw_table,
        decode_wav_pcm,
        encode_wav_pcm,
        g711_alaw_encode,
        g711_ulaw_encode,
    )

    ut, at = _g711_ulaw_table(), _g711_alaw_table()
    # golden values from the ITU-T G.711 reference tables
    assert ut[0x00] == -32124 and ut[0x80] == 32124 and ut[0xFF] == 0
    assert ut[0x7F] == 0 and ut[0xF0] == 120  # mu-law negative zero
    assert at[0x55] == -8 and at[0xD5] == 8
    assert at[0x2A] == -32256 and at[0xAA] == 32256

    # encode inverts decode exactly on the lattice (all 256 codes)
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(ut[g711_ulaw_encode(ut[b])], ut[b])
    assert np.array_equal(at[g711_alaw_encode(at[b])], at[b])

    # full-range error bound: top segment step is 1024 (A) / 512+bias (mu)
    x = np.arange(-32768, 32768, dtype=np.int64)
    xc = np.clip(x, -32635, 32635)
    assert np.max(np.abs(ut[g711_ulaw_encode(x)] - xc)) <= 1024
    assert np.max(np.abs(at[g711_alaw_encode(x)] - xc)) <= 1024

    # WAV container round-trip: fmt codes 7 (mu) and 6 (A), 8-bit
    s = ut[np.arange(0, 256, 7, dtype=np.uint8)]
    got, rate = decode_wav_pcm(encode_wav_pcm(s, 8000, g711="ulaw"))
    assert rate == 8000 and got.reshape(-1).tolist() == s.tolist()
    got, _ = decode_wav_pcm(encode_wav_pcm(at[b], 8000, g711="alaw"))
    assert got.reshape(-1).tolist() == at[b].tolist()
    # stereo interleave survives companding
    st = at[np.arange(0, 64, dtype=np.uint8)]
    got, _ = decode_wav_pcm(
        encode_wav_pcm(st, 16000, channels=2, g711="alaw")
    )
    assert got.shape == (32, 2) and got.reshape(-1).tolist() == st.tolist()


def _bmp_header(w, h, bpp, compression, body_len, n_pal=0, extra=b""):
    off = 54 + len(extra) + 4 * n_pal
    return (
        b"BM" + (off + body_len).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
        + compression.to_bytes(4, "little")
        + body_len.to_bytes(4, "little") + b"\x00" * 8
        + n_pal.to_bytes(4, "little") + b"\x00" * 4
    ) + extra


def test_bmp_rle4_bitfields_16bpp_1bpp():
    """The final BMP variants: RLE4 (alternating-nibble runs +
    absolute mode + escapes), 16-bpp BI_RGB 5-5-5 default, 5-6-5
    BI_BITFIELDS masks, 32-bpp BITFIELDS with a zero channel, and
    1-bpp monochrome; BI_JPEG stays the honest seam."""
    import numpy as np
    import pytest as _pytest

    from robosystems_spark.operators.multimodal import decode_bmp

    # RLE4: bottom row = run of 4 alternating 1,2; top row =
    # absolute(3,4,5) + run(6)
    pal = b"".join(bytes([i * 17, i * 17, i * 17, 0]) for i in range(16))
    pix = bytes(
        [4, 0x12, 0, 0,       # run 4 of 0x12, EOL
         0, 3, 0x34, 0x50,    # absolute 3 nibbles (word-aligned)
         1, 0x66,             # run 1 of 6
         0, 0, 0, 1]          # EOL, EOF
    )
    hdr = _bmp_header(4, 2, 4, 2, len(pix), n_pal=16)
    img = decode_bmp(hdr + pal + pix)
    assert img.shape == (2, 4, 3)
    assert [p[0] for p in img[0]] == [51, 68, 85, 102]
    assert [p[0] for p in img[1]] == [17, 34, 17, 34]

    def bmp16(vals, compression=0, masks=None):
        w, h = len(vals[0]), len(vals)
        row = (w * 2 + 3) & ~3
        body = b""
        for r in vals[::-1]:
            rb = b"".join(int(v).to_bytes(2, "little") for v in r)
            body += rb + b"\x00" * (row - len(rb))
        extra = (
            b"".join(m.to_bytes(4, "little") for m in masks)
            if masks else b""
        )
        return _bmp_header(w, h, 16, compression, len(body), extra=extra) + body

    # BI_RGB 16-bpp defaults to 5-5-5: red 0x7C00, half-green 15/31
    img = decode_bmp(bmp16([[0x7C00, 0x01E0]]))
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 123, 0]  # round(15*255/31)
    # BI_BITFIELDS 5-6-5
    img = decode_bmp(
        bmp16([[0x07E0, 31 << 11]], 3, [0xF800, 0x07E0, 0x001F])
    )
    assert img[0, 0].tolist() == [0, 255, 0]
    assert img[0, 1].tolist() == [255, 0, 0]

    # 32-bpp BITFIELDS with a zero blue mask -> blue forced 0
    body = (0x00FF8040).to_bytes(4, "little")
    data = _bmp_header(
        1, 1, 32, 3, 4,
        extra=b"".join(
            m.to_bytes(4, "little") for m in (0x00FF0000, 0x0000FF00, 0)
        ),
    ) + body
    assert decode_bmp(data)[0, 0].tolist() == [255, 128, 0]

    # 1-bpp monochrome, MSB first
    pal2 = bytes([0, 0, 0, 0, 255, 255, 255, 0])
    row = bytes([0b10100000]) + b"\x00" * 3
    img = decode_bmp(_bmp_header(3, 1, 1, 0, 4, n_pal=2) + pal2 + row)
    assert [p[0] for p in img[0]] == [255, 0, 255]

    # BI_JPEG now delegates to the real decoder: a corrupt embedded
    # stream fails via its ValueError contract
    # (test_bmp_embedded_png_and_jpeg_streams covers the decode path)
    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_bmp(_bmp_header(1, 1, 24, 4, 4) + b"\x00" * 4)


def test_ppm_16bit_and_scaled_maxval():
    """PPM maxval generality: 2-byte big-endian samples above 255,
    integer-round scaling for both 16-bit and sub-255 maxvals."""
    from robosystems_spark.operators.multimodal import decode_ppm

    d = (
        b"P6 2 1 65535\n"
        + (65535).to_bytes(2, "big") + (0).to_bytes(2, "big") * 2
        + (32768).to_bytes(2, "big") * 3
    )
    img = decode_ppm(d)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [128, 128, 128]  # round(32768*255/65535)

    img = decode_ppm(b"P6 1 1 15\n" + bytes([15, 0, 7]))
    assert img[0, 0].tolist() == [255, 0, 119]  # round(7*255/15)=119


def test_bmp_palette_rle_and_32bit():
    """BMP beyond 24-bit: 8-bit palette (uncompressed + RLE8 with
    runs/absolute/EOL/EOF), 4-bit nibble palette, 32-bit BGRA
    (alpha dropped), and top-down negative-height rows."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_palette,
    )

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)

    # runs + heterogeneous spans: exercises both RLE modes
    idx = np.zeros((6, 23), dtype=np.uint8)
    idx[0, :] = 5
    idx[1, :10] = np.arange(10) % 16
    idx[2, 3:20] = 7
    idx[3] = rng.randint(0, 16, 23)
    expected = pal[idx]
    got_plain = decode_bmp(encode_bmp_palette(idx, pal, rle=False))
    assert (got_plain == expected).all()
    got_rle = decode_bmp(encode_bmp_palette(idx, pal, rle=True))
    assert (got_rle == expected).all()

    # 4-bit palette: hand-build (encoder is 8-bpp only)
    pal4 = pal[:4]
    quads = np.zeros((4, 4), np.uint8)
    quads[:, :3] = pal4[:, ::-1]
    idx4 = np.array([[0, 1, 2, 3, 1], [3, 2, 1, 0, 2]], dtype=np.uint8)
    h, w = idx4.shape
    row_bytes = (((w * 4 + 7) // 8) + 3) & ~3
    grid = np.zeros((h, row_bytes), np.uint8)
    for r in range(h):
        for c in range(w):
            grid[r, c // 2] |= idx4[r, c] << (4 if c % 2 == 0 else 0)
    body = grid[::-1].tobytes()
    off = 54 + 16
    hdr = (
        b"BM" + (off + len(body)).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + b"\x00" * 8 + (4).to_bytes(4, "little") + b"\x00" * 4
    )
    assert (decode_bmp(hdr + quads.tobytes() + body) == pal4[idx4]).all()

    # 32-bit BGRA, TOP-DOWN (negative height): alpha dropped
    rgb = rng.randint(0, 256, (3, 5, 3)).astype(np.uint8)
    bgra = np.zeros((3, 5, 4), np.uint8)
    bgra[:, :, :3] = rgb[:, :, ::-1]
    bgra[:, :, 3] = 200
    body32 = bgra.tobytes()  # 5*4=20 bytes/row, already 4-aligned
    hdr32 = (
        b"BM" + (54 + len(body32)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (5).to_bytes(4, "little", signed=True)
        + (-3).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body32).to_bytes(4, "little")
        + b"\x00" * 16
    )
    assert (decode_bmp(hdr32 + body32) == rgb).all()

    # an RLE4 flag on an 8-bpp stream is malformed (RLE4 itself
    # decodes: see test_bmp_rle4_bitfields_16bpp_1bpp)
    import pytest as _pytest

    bad = bytearray(encode_bmp_palette(idx, pal, rle=True))
    bad[30:34] = (2).to_bytes(4, "little")  # compression=2 (RLE4)
    with _pytest.raises(ValueError):
        decode_bmp(bytes(bad))


def test_wav_ima_adpcm():
    """IMA ADPCM (WAV format 0x11): the block-vectorized decoder
    matches a scalar reference implementation bit-for-bit; the
    container round-trips with fact-chunk sample trim; tracking
    error on a smooth signal stays small (N-channel decode:
    test_ima_adpcm_four_channel_round_trip)."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        _ima_adpcm_decode_blocks,
        _ima_tables,
        decode_wav_pcm,
        encode_wav_ima_adpcm,
        ima_adpcm_encode,
    )

    st, it = _ima_tables()
    # goldens from the IMA spec tables
    assert st[0] == 7 and st[88] == 32767 and st[44] == 494
    assert it[7] == 8 and it[0] == -1 and it[15] == 8

    def ref_decode(body, ba):
        out = []
        for b0 in range(0, len(body) - ba + 1, ba):
            blk = body[b0:b0 + ba]
            pred = int.from_bytes(blk[0:2], "little", signed=True)
            index = min(88, max(0, blk[2]))
            out.append(pred)
            nibs = []
            for byte in blk[4:]:
                nibs.append(byte & 0xF)
                nibs.append(byte >> 4)
            for code in nibs:
                step = int(st[index])
                diff = step >> 3
                if code & 1:
                    diff += step >> 2
                if code & 2:
                    diff += step >> 1
                if code & 4:
                    diff += step
                pred = pred - diff if code & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                index = max(0, min(88, index + int(it[code])))
                out.append(pred)
        return np.array(out, dtype=np.int32)

    rng = np.random.RandomState(9)
    t = np.arange(3000)
    sig = (12000 * np.sin(t / 30)
           + rng.randint(-200, 200, t.size)).astype(np.int64)
    ba = 256
    body = ima_adpcm_encode(sig, block_align=ba)
    assert np.array_equal(
        _ima_adpcm_decode_blocks(body, ba), ref_decode(body, ba)
    )
    dec, rate = decode_wav_pcm(encode_wav_ima_adpcm(sig, 8000, block_align=ba))
    assert rate == 8000 and dec.shape == (3000, 1)
    err = np.abs(dec.reshape(-1) - np.clip(sig, -32768, 32767))
    assert err.max() < 4000 and err.mean() < 300



def test_wav_ms_adpcm():
    """MS-ADPCM (WAV format 2): block-vectorized decoder matches a
    scalar reference; two-tap LPC with adaptive delta tracks a smooth
    signal; high-nibble-first packing; per-block best-coefficient
    choice round-trips through the container."""
    import numpy as np
    import pytest as _pytest

    from robosystems_spark.operators.multimodal import (
        _MSADPCM_ADAPT,
        _MSADPCM_COEFS,
        _ms_adpcm_decode_blocks,
        decode_wav_pcm,
        encode_wav_ms_adpcm,
        ms_adpcm_encode,
    )

    def ref_decode(body, ba):
        out = []
        for b0 in range(0, len(body) - ba + 1, ba):
            blk = body[b0:b0 + ba]
            c1, c2 = _MSADPCM_COEFS[min(blk[0], 6)]
            delta = int.from_bytes(blk[1:3], "little", signed=True)
            s1 = int.from_bytes(blk[3:5], "little", signed=True)
            s2 = int.from_bytes(blk[5:7], "little", signed=True)
            out += [s2, s1]
            nibs = []
            for byte in blk[7:]:
                nibs.append(byte >> 4)
                nibs.append(byte & 0xF)
            for code in nibs:
                signed = code - 16 if code >= 8 else code
                # msadpcm.c: / 256 truncating toward zero, NOT >> 8
                acc = s1 * c1 + s2 * c2
                pred = acc >> 8 if acc >= 0 else -((-acc) >> 8)
                sample = max(-32768, min(32767, pred + signed * delta))
                out.append(sample)
                s2, s1 = s1, sample
                delta = max(16, (_MSADPCM_ADAPT[code] * delta) >> 8)
        return np.array(out, dtype=np.int32)

    rng = np.random.RandomState(13)
    t = np.arange(2500)
    sig = (9000 * np.sin(t / 25)
           + rng.randint(-150, 150, t.size)).astype(np.int64)
    ba = 256
    body = ms_adpcm_encode(sig, block_align=ba)
    assert np.array_equal(
        _ms_adpcm_decode_blocks(body, ba), ref_decode(body, ba)
    )
    dec, rate = decode_wav_pcm(
        encode_wav_ms_adpcm(sig, 16000, block_align=ba)
    )
    assert rate == 16000 and dec.shape == (2500, 1)
    err = np.abs(dec.reshape(-1) - np.clip(sig, -32768, 32767))
    assert err.max() < 4000 and err.mean() < 300

    # >2-channel MS-ADPCM is spec-invalid input (ADPCMWAVEFORMAT
    # defines the header interleave for 1-2 channels only)
    bad = bytearray(encode_wav_ms_adpcm(sig[:100], 8000, block_align=ba))
    i = bad.find(b"fmt ") + 8
    bad[i + 2:i + 4] = (3).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="1-2 channels"):
        decode_wav_pcm(bytes(bad))


def test_wav_ima_adpcm_stereo():
    """Stereo IMA ADPCM: per-channel 4-byte headers + alternating
    4-byte nibble groups; channels decode independently (no bleed:
    a silent right channel stays at the step floor while the left
    tracks its signal)."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_ima_adpcm,
    )

    t = np.arange(2000)
    left = (9000 * np.sin(t / 33)).astype(np.int64)
    right = (7000 * np.cos(t / 21)).astype(np.int64)
    inter = np.stack([left, right], axis=1)
    dec, rate = decode_wav_pcm(
        encode_wav_ima_adpcm(inter, 16000, block_align=256, channels=2)
    )
    assert rate == 16000 and dec.shape == (2000, 2)
    assert np.abs(dec[:, 0] - left).mean() < 300
    assert np.abs(dec[:, 1] - right).mean() < 300

    silent = np.stack([left, np.zeros_like(left)], axis=1)
    dec, _ = decode_wav_pcm(
        encode_wav_ima_adpcm(silent, 8000, block_align=256, channels=2)
    )
    assert np.abs(dec[:, 1]).max() <= 16
    assert np.abs(dec[:, 0] - left).mean() < 300


def test_wav_ms_adpcm_stereo():
    """Stereo MS-ADPCM: header fields channel-interleaved, nibbles
    left-high/right-low per byte; channels independent (no bleed)."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_ms_adpcm,
    )

    t = np.arange(2000)
    left = (9000 * np.sin(t / 33)).astype(np.int64)
    right = (7000 * np.cos(t / 21)).astype(np.int64)
    inter = np.stack([left, right], axis=1)
    dec, rate = decode_wav_pcm(
        encode_wav_ms_adpcm(inter, 16000, block_align=256, channels=2)
    )
    assert rate == 16000 and dec.shape == (2000, 2)
    assert np.abs(dec[:, 0] - left).mean() < 300
    assert np.abs(dec[:, 1] - right).mean() < 300
    sil = np.stack([left, np.zeros_like(left)], axis=1)
    dec, _ = decode_wav_pcm(
        encode_wav_ms_adpcm(sil, 8000, block_align=256, channels=2)
    )
    assert np.abs(dec[:, 1]).max() <= 16
    assert np.abs(dec[:, 0] - left).mean() < 300


def test_wav_ms_adpcm_negative_predictor_golden():
    """ADVICE r8: the MS-ADPCM predictor divides by 256 truncating
    toward ZERO (msadpcm.c), not flooring — round-trip tests can't
    catch the off-by-one on negative sums because the encoder mirrors
    the decoder, so this golden is hand-computed from the spec.

    Block: coef idx 3 (c1=192, c2=64), delta=16, s1=-1, s2=0, code
    nibbles [0, 1]:
      step 1: acc = (-1)*192 + 0*64 = -192 -> pred = trunc(-192/256) = 0
              (floor would give -1); sample = 0 + 0*16 = 0
      step 2: state s1=0, s2=-1, delta = max(16, (230*16)>>8) = 16;
              acc = 0*192 + (-1)*64 = -64 -> pred = 0 (floor: -1);
              sample = 0 + 1*16 = 16
    Decoded block = [s2, s1, step1, step2] = [0, -1, 0, 16]."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        _ms_adpcm_decode_blocks,
    )

    block = (
        bytes([3])
        + (16).to_bytes(2, "little", signed=True)
        + (-1).to_bytes(2, "little", signed=True)
        + (0).to_bytes(2, "little", signed=True)
        + bytes([0x01])  # high nibble 0, low nibble 1
    )
    got = _ms_adpcm_decode_blocks(block, block_align=8, channels=1)
    assert np.array_equal(got, np.array([0, -1, 0, 16], dtype=np.int32))


def test_jpeg_12bit_extended_sequential():
    """12-bit JPEG (SOF1 extended sequential, r8 verdict #8): level
    shift 2048, Pq=1 16-bit DQT entries, extended Huffman category
    ranges; output scales to the uint8 contract via
    round(v*255/4095).  Gray + color + 4:2:0 + restart intervals;
    8-bit SOF1 also decodes (same process); 12-bit multi-scan stays
    a loud seam."""
    import numpy as np
    import pytest

    from robosystems_spark.operators.jpeg import decode_jpeg, encode_jpeg

    x = np.linspace(0, 4 * np.pi, 48)
    g12 = (2048 + 1500 * np.sin(x)[None, :] * np.cos(0.8 * x)[:, None]).astype(np.uint16)
    stream = encode_jpeg(g12, precision=12)
    # container facts: SOF1 marker present, SOF0 absent, Pq=1 DQT
    assert b"\xff\xc1" in stream and b"\xff\xc0" not in stream
    i = stream.find(b"\xff\xdb")
    assert stream[i + 4] >> 4 == 1  # Pq=1 (16-bit entries)
    out = decode_jpeg(stream)
    assert out.shape == (48, 48, 1)
    ref = np.round(g12 * 255.0 / 4095)
    assert np.abs(out[:, :, 0].astype(float) - ref).mean() < 3

    c12 = np.stack([g12, 4095 - g12, g12 // 2 + 1024], axis=2).astype(np.uint16)
    ref3 = np.round(c12 * 255.0 / 4095)
    out = decode_jpeg(encode_jpeg(c12, precision=12))
    assert out.shape == (48, 48, 3)
    assert np.abs(out.astype(float) - ref3).mean() < 5
    out = decode_jpeg(
        encode_jpeg(c12, precision=12, subsample=True, restart_interval=2)
    )
    assert np.abs(out.astype(float) - ref3).mean() < 8

    # an 8-bit stream relabeled SOF1 decodes identically (same process)
    img8 = (g12 >> 4).astype(np.uint8)
    s8 = encode_jpeg(img8)
    assert decode_jpeg(s8.replace(b"\xff\xc0", b"\xff\xc1", 1)).tobytes() \
        == decode_jpeg(s8).tobytes()

    with pytest.raises(ValueError, match="precision"):
        encode_jpeg(g12, precision=10)


def test_bmp_embedded_png_and_jpeg_streams():
    """BI_PNG/BI_JPEG BMPs delegate to the in-repo codecs; PNG
    round-trips exactly, JPEG is DC-exact on constant even gray."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_embedded,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    got = decode_bmp(encode_bmp_embedded(img, codec="png"))
    assert np.array_equal(got, img)

    gray = np.full((16, 16, 3), 128, dtype=np.uint8)
    got_j = decode_bmp(encode_bmp_embedded(gray, codec="jpeg"))
    assert np.array_equal(got_j, gray)


def test_bmp_embedded_normalizes_channels_and_checks_dims():
    """Gray embedded PNGs replicate to RGB; RGBA drops alpha; a
    header/stream dimension mismatch raises ValueError."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_embedded,
        encode_png,
    )

    gray = np.arange(20, dtype=np.uint8).reshape(5, 4)
    bmp = bytearray(encode_bmp_embedded(np.repeat(gray[:, :, None], 3, 2)))
    # swap the embedded stream for a single-channel PNG of the same dims
    stream = encode_png(gray)
    base = bmp[:54]
    base[34:38] = len(stream).to_bytes(4, "little")
    got = decode_bmp(bytes(base) + stream)
    assert got.shape == (5, 4, 3)
    assert np.array_equal(got[:, :, 0], gray)
    assert np.array_equal(got[:, :, 1], gray)

    rgba = np.dstack([gray, gray, gray, np.full((5, 4), 9, np.uint8)])
    stream4 = encode_png(rgba)
    base[34:38] = len(stream4).to_bytes(4, "little")
    got4 = decode_bmp(bytes(base) + stream4)
    assert got4.shape == (5, 4, 3)
    assert np.array_equal(got4[:, :, 2], gray)

    import pytest

    wrong = encode_png(np.zeros((7, 7), np.uint8))
    base[34:38] = len(wrong).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_bmp(bytes(base) + wrong)


def test_ima_adpcm_four_channel_round_trip():
    """IMA ADPCM at >2 channels: the 4-byte nibble groups cycle
    through all channels and each channel's predictor state is
    independent (a silent channel stays bit-silent)."""
    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_ima_adpcm,
        ima_adpcm_encode,
        _ima_adpcm_decode_blocks,
    )

    rng = np.random.default_rng(3)
    n, ch = 4 * 505, 4
    base = np.cumsum(rng.integers(-300, 301, size=(n, ch)), axis=0)
    x = np.clip(base, -30000, 30000).astype(np.int64)
    x[:, 2] = 0  # silent third channel
    block_align = 4 * ch + 4 * ch * 15  # 31 frames/block
    wav = encode_wav_ima_adpcm(x.reshape(-1), 16000, block_align, ch)
    got, rate = decode_wav_pcm(wav)
    assert rate == 16000 and got.shape == (n, ch)
    # ADPCM is lossy but stepwise-bounded; silent channel is exact
    assert np.array_equal(got[:, 2], np.zeros(n, dtype=got.dtype))
    err = np.abs(got.astype(np.int64) - x)
    assert err.max() < 2048  # worst step bound, far under full scale
    # container-free core agrees with the container path
    raw = ima_adpcm_encode(x.reshape(-1), block_align, ch)
    core = _ima_adpcm_decode_blocks(raw, block_align, ch).reshape(-1, ch)
    assert np.array_equal(core[: got.shape[0]], got)


def test_ms_adpcm_channel_limit_is_a_value_error():
    """MS-ADPCM beyond 2 channels is spec-invalid input, not a seam."""
    import pytest

    from robosystems_spark.operators.multimodal import decode_wav_pcm

    fmt = (
        (2).to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (256).to_bytes(2, "little") + (4).to_bytes(2, "little")
    )
    wav = (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + (0).to_bytes(4, "little")
    )
    with pytest.raises(ValueError, match="1-2 channels"):
        decode_wav_pcm(wav)


def test_bmp_embedded_fuzz_fails_fast():
    """Bit-flipped BI_PNG/BI_JPEG BMPs must raise promptly (the
    crawl-corpus fail-loud contract every decode seam follows)."""
    import time

    import numpy as np

    from robosystems_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_embedded,
    )

    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, size=(24, 18, 3)).astype(np.uint8)
    t0 = time.time()
    for codec in ("png", "jpeg"):
        good = bytearray(encode_bmp_embedded(img, codec=codec))
        for _ in range(120):
            bad = bytearray(good)
            for _k in range(3):
                bad[rng.randint(2, len(bad))] ^= 1 << rng.randint(0, 8)
            try:
                decode_bmp(bytes(bad))
            except Exception:
                pass
    assert time.time() - t0 < 60
