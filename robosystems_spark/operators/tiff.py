"""Baseline TIFF 6.0 codec in pure numpy + stdlib — no libtiff/PIL.

TIFF is the dominant container for scanned-document corpora (the
exact kind of 100 TB crawl/archive input a training-data pipeline
ingests), so the decode path is real, not a stub:

- both byte orders (``II`` little-endian, ``MM`` big-endian)
- strip organization (any RowsPerStrip, multiple strips) AND tile
  organization (TIFF 6.0 §15: tile grid with edge padding — the
  layout of aerial/satellite/pyramid TIFFs)
- Compression 1 (none), 5 (LZW: MSB-first variable-width codes with
  the TIFF "early change" width bump, optional horizontal-
  differencing Predictor 2), 32773 (PackBits), 2 (CCITT MH RLE) and
  4 (CCITT Group 4 / T.6 MMR — operators/g4.py) for bilevel scans
- PhotometricInterpretation 0/1 (WhiteIsZero / BlackIsZero grayscale
  and bilevel at 1/2/4/8/16 bits per sample), 2 (RGB at 8/16 bits),
  3 (palette-color via the 16-bit ColorMap)
- chunky (PlanarConfiguration 1) AND planar (2, plane-major
  strips) sample layouts

Output is always an (h, w, 3) uint8 RGB array matching the repo's
other decoders: 16-bit samples scale as ``round(v / 257)`` (the exact
inverse of ``v * 257``), sub-byte grayscale scales by
``round(v * 255 / (2^bits - 1))``.

Honest seams (loud ``NotImplementedError``): floating-point samples,
per-sample heterogeneous BitsPerSample.  Old-style JPEG (compression
6, both interchange and fragmented-table shapes), new-style JPEG
(compression 7, strips/tiles/JPEGTables), G3 uncompressed mode
(T4Options bit 1, r11), and planar configuration 2 with strips AND
tiles all decode.

``encode_tiff`` is the fixture synthesizer (the decode inverse) so
oracle entries and tests round-trip REAL container bytes, including a
genuine TIFF-variant LZW compressor.

Reference parity: the reference repo ships no image codecs; this
module exists for the multimodal ingestion surface its pipelines
gate on (robosystems/operations/pipelines, binary payload columns),
re-expressed as pure-numpy decode inside Spark's mapInPandas seam.
"""

from __future__ import annotations

import numpy as np

# TIFF tag ids (TIFF 6.0 spec section 8)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_T4OPTIONS = 292
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_JPEGTABLES = 347
# old-style JPEG (TIFF 6.0 section 22, deprecated by Technote 2)
_T_JPEGPROC = 512
_T_JPEGIF = 513  # JPEGInterchangeFormat: offset of a full JPEG stream
_T_JPEGIF_LEN = 514
_T_JPEGRESTART = 515
_T_JPEGQTABLES = 519  # per-component offsets of 64 zigzag quant bytes
_T_JPEGDCTABLES = 520  # per-component offsets of 16+values DHT payloads
_T_JPEGACTABLES = 521
_T_YCBCRSUBSAMPLING = 530

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes, bo: str) -> dict[int, list[int]]:
    """Parse the first IFD into {tag: [values...]} (ints only;
    RATIONAL returned as numerator/denominator pairs flattened)."""
    ifd_off = int.from_bytes(data[4:8], "little" if bo == "<" else "big")
    end = "little" if bo == "<" else "big"
    n = int.from_bytes(data[ifd_off : ifd_off + 2], end)
    tags: dict[int, list[int]] = {}
    for k in range(n):
        e = ifd_off + 2 + 12 * k
        tag = int.from_bytes(data[e : e + 2], end)
        typ = int.from_bytes(data[e + 2 : e + 4], end)
        cnt = int.from_bytes(data[e + 4 : e + 8], end)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            off = int.from_bytes(data[e + 8 : e + 12], end)
            raw = data[off : off + size]
        step = _TYPE_SIZES.get(typ, 1)
        # iterate over the bytes actually present, not the DECLARED
        # count — a corrupt count field (crawl corpora have them)
        # would otherwise spin this loop for billions of empty slices
        n_bytes = min(size, len(raw))
        if typ == 5:  # RATIONAL: pairs of u32
            vals = [
                int.from_bytes(raw[i : i + 4], end)
                for i in range(0, n_bytes, 4)
            ]
        else:
            vals = [
                int.from_bytes(raw[i : i + step], end)
                for i in range(0, n_bytes, step)
            ]
        # a declared count of 0, or a value offset past EOF, yields an
        # empty list — skip the entry entirely so downstream [0] indexing
        # hits the decoder's "missing tag" ValueError path instead of
        # IndexError (fuzz contract: corrupt files fail with ValueError)
        if vals:
            tags[tag] = vals
    return tags


def _lzw_decode(buf: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9-bit initial codes,
    Clear=256 / EOI=257, and the early code-width change (width bumps
    when the table reaches 2^bits - 1, one code before GIF would)."""
    out = bytearray()
    bitpos = 0
    nbits = 9
    total_bits = len(buf) * 8
    table: list[bytes] = []
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal bitpos
        byte = bitpos >> 3
        shift = bitpos & 7
        chunk = int.from_bytes(buf[byte : byte + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - shift - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        return code

    while bitpos + nbits <= total_bits:
        code = read_code()
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if code == 257:  # EndOfInformation
            break
        if prev is None:
            if not table:
                raise ValueError("LZW stream must start with Clear")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream (code ahead of table)")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one entry (an entry completes only when the
        # NEXT code arrives), so it must widen at 2^n - 2 where the
        # encoder widens at 2^n - 1 — the classic TIFF LZW off-by-one
        if len(table) == (1 << nbits) - 2 and nbits < 12:
            nbits += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compressor (the _lzw_decode inverse): emits
    Clear up front and whenever the table fills to 4094 entries."""
    out = bytearray()
    acc = 0
    accbits = 0

    state = {"nbits": 9, "next": 258, "dict": {}}

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc = (acc << state["nbits"]) | code
        accbits += state["nbits"]
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    def reset() -> None:
        emit(256)
        state["nbits"] = 9
        state["next"] = 258
        state["dict"] = {bytes([i]): i for i in range(256)}

    reset()
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in state["dict"]:
            w = wc
            continue
        emit(state["dict"][w])
        state["dict"][wc] = state["next"]
        state["next"] += 1
        # early change: width bumps when the NEXT code to assign
        # equals 2^bits - 1 (decoder mirrors on table length)
        if state["next"] == (1 << state["nbits"]) - 1:
            if state["nbits"] < 12:
                state["nbits"] += 1
            else:
                pass
        if state["next"] >= 4094:
            reset()
            w = b""
        w = c
    if w:
        emit(state["dict"][w])
    emit(257)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(buf: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(buf):
        n = buf[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += buf[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i < len(buf):
                out += bytes([buf[i]]) * (257 - n)
                i += 1
        # n == 128: noop per spec
    return bytes(out)


def _packbits_encode(row: bytes) -> bytes:
    """Greedy PackBits: replicate packets for runs >= 3, literal
    packets otherwise (max 128 per packet)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # measure run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i = j
            continue
        # literal: scan until a run of >=3 starts (or 128 bytes)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def _jpeg_splice_tables(chunk: bytes, tables: bytes | None) -> bytes:
    """TIFF Technote 2 table sharing: the JPEGTables tag holds an
    abbreviated tables-only stream (SOI, DQT/DHT..., EOI) whose
    tables apply to every strip/tile stream (themselves often
    abbreviated: SOI straight to SOF/SOS).  Splicing the tables body
    after the chunk's SOI yields one self-contained stream; tables a
    chunk redefines come later in marker order, so they override —
    exactly the Technote's precedence."""
    if not tables or len(tables) < 4:
        return chunk
    if tables[:2] != b"\xff\xd8" or chunk[:2] != b"\xff\xd8":
        raise ValueError("JPEGTables / strip stream missing SOI")
    body = tables[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    return b"\xff\xd8" + body + chunk[2:]


def _decode_tiff_jpeg(
    data: bytes,
    tags: dict[int, list[int]],
    w: int,
    h: int,
    spp: int,
    photometric: int,
    planar: int,
):
    """Compression-7 organization walker: decode each strip/tile with
    the baseline/progressive JPEG decoder (operators/jpeg.py) and
    paste pixels.  Photometric 6 (YCbCr, the Technote-2 standard for
    color) rides the decoder's built-in YCbCr->RGB; 0/1 grayscale
    replicates; photometric 2 would need the 3 components passed
    through UNconverted, which the shared decoder doesn't expose —
    loud seam, never wrong colors."""
    from robosystems_spark.operators.jpeg import decode_jpeg

    if planar != 1:
        raise NotImplementedError("planar JPEG-in-TIFF")
    if photometric not in (0, 1, 6):
        raise NotImplementedError(
            f"JPEG-in-TIFF photometric {photometric} (0/1 grayscale and "
            "6 YCbCr supported)"
        )
    if spp not in (1, 3):
        raise ValueError("JPEG-in-TIFF requires 1 or 3 samples per pixel")
    tables_vals = tags.get(_T_JPEGTABLES)
    tables = bytes(tables_vals) if tables_vals else None

    def dec(off: int, cnt: int, n_rows: int, n_cols: int) -> np.ndarray:
        px = decode_jpeg(_jpeg_splice_tables(bytes(data[off : off + cnt]), tables))
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        if px.shape[0] < n_rows or px.shape[1] < n_cols:
            raise ValueError("JPEG strip/tile smaller than declared region")
        return px[:n_rows, :n_cols]

    out = np.zeros((h, w, 3), dtype=np.uint8)
    if _T_TILE_WIDTH in tags:
        tw = tags[_T_TILE_WIDTH][0]
        tl = tags.get(_T_TILE_LENGTH, [0])[0]
        offsets = tags.get(_T_TILE_OFFSETS)
        counts = tags.get(_T_TILE_COUNTS)
        if not tw or not tl or not offsets or not counts:
            raise ValueError("tiled TIFF missing tile tags")
        if tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + tl - 1) // tl
        if (len(offsets) < tiles_across * tiles_down
                or len(counts) < tiles_across * tiles_down):
            raise ValueError("tile count does not cover the image")
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                i = ty * tiles_across + tx
                y0, x0 = ty * tl, tx * tw
                ch = min(tl, h - y0)
                cw = min(tw, w - x0)
                # JPEG tiles are encoded at full tile size (edge tiles
                # padded); crop to the in-image region
                out[y0 : y0 + ch, x0 : x0 + cw] = dec(
                    offsets[i], counts[i], ch, cw
                )
    else:
        offsets = tags.get(_T_STRIP_OFFSETS)
        counts = tags.get(_T_STRIP_COUNTS)
        if not offsets or not counts:
            raise ValueError("TIFF missing StripOffsets/StripByteCounts")
        rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
        y = 0
        for off, cnt in zip(offsets, counts):
            n_rows = min(rps, h - y)
            if n_rows <= 0:
                break
            out[y : y + n_rows] = dec(off, cnt, n_rows, w)
            y += n_rows
        if y < h:
            raise ValueError("JPEG strips do not cover the image height")
    if photometric == 0:  # WhiteIsZero grayscale: invert
        out = (255 - out.astype(np.int32)).astype(np.uint8)
    return out


def _decode_tiff_oldjpeg(
    data: bytes,
    tags: dict[int, list[int]],
    w: int,
    h: int,
    spp: int,
    photometric: int,
):
    """Old-style JPEG-in-TIFF (compression 6, TIFF 6.0 section 22 —
    deprecated by Technote 2 but alive in scanned archives).  Two
    real-world shapes, both decoded via the shared baseline decoder:

    1. **JPEGInterchangeFormat** (tags 513/514): the file simply
       embeds one complete JPEG stream — by far the most common shape
       (libtiff's primary OJPEG path) — decode it whole and crop.
    2. **Fragmented tables** (tags 519/520/521 + strips): quant
       tables are raw 64-byte zigzag blobs, Huffman tables raw
       16-count+values DHT payloads, and strips carry bare entropy
       data; a self-contained stream is RECONSTRUCTED (SOI, DQT/DHT
       per component, SOF0 with the YCbCrSubSampling tag's factors,
       SOS, entropy data with RSTm markers re-inserted between
       strips, EOI) and decoded.  Multi-strip files without a
       JPEGRestartInterval cannot be stitched (the spec requires it)
       and fail loudly.

    Lossless procs (JPEGProc != 1) are a loud seam — never wrong
    pixels."""
    from robosystems_spark.operators.jpeg import decode_jpeg

    if photometric not in (0, 1, 6):
        raise NotImplementedError(
            f"old-style JPEG photometric {photometric}"
        )
    if _T_JPEGIF in tags:
        off = tags[_T_JPEGIF][0]
        ln = tags.get(_T_JPEGIF_LEN, [len(data) - off])[0]
        px = decode_jpeg(bytes(data[off : off + ln]))
    else:
        proc = tags.get(_T_JPEGPROC, [1])[0]
        if proc != 1:
            raise NotImplementedError(
                f"old-style JPEG proc {proc} (only baseline proc 1)"
            )
        qoffs = tags.get(_T_JPEGQTABLES)
        dcoffs = tags.get(_T_JPEGDCTABLES)
        acoffs = tags.get(_T_JPEGACTABLES)
        offsets = tags.get(_T_STRIP_OFFSETS)
        counts = tags.get(_T_STRIP_COUNTS)
        if not (qoffs and dcoffs and acoffs and offsets and counts):
            raise ValueError(
                "old-style JPEG missing table tags or strip data"
            )
        if not (len(qoffs) >= spp and len(dcoffs) >= spp
                and len(acoffs) >= spp):
            raise ValueError("old-style JPEG table count < components")
        sub = tags.get(_T_YCBCRSUBSAMPLING, [2, 2])
        sh_, sv_ = (sub + [2])[0], (sub + [2])[1]
        stream = bytearray(b"\xff\xd8")

        def dht_payload(off: int) -> bytes:
            n_vals = sum(data[off : off + 16])
            if n_vals > 256:
                raise ValueError("old-style JPEG DHT counts out of range")
            return bytes(data[off : off + 16 + n_vals])

        for i in range(spp):
            q = bytes(data[qoffs[i] : qoffs[i] + 64])
            if len(q) != 64:
                raise ValueError("old-style JPEG quant table truncated")
            stream += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([i]) + q
            for tc, off in ((0, dcoffs[i]), (1, acoffs[i])):
                payload = dht_payload(off)
                stream += (
                    b"\xff\xc4"
                    + (3 + len(payload)).to_bytes(2, "big")
                    + bytes([(tc << 4) | i])
                    + payload
                )
        ri = tags.get(_T_JPEGRESTART, [0])[0]
        if ri:
            stream += b"\xff\xdd" + (4).to_bytes(2, "big") + ri.to_bytes(
                2, "big"
            )
        elif len(offsets) > 1:
            raise ValueError(
                "multi-strip old-style JPEG requires JPEGRestartInterval"
            )
        sof = bytearray()
        sof += (8 + 3 * spp).to_bytes(2, "big")
        sof += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        sof += bytes([spp])
        for i in range(spp):
            fac = (sh_ << 4) | sv_ if (spp == 3 and i == 0) else 0x11
            sof += bytes([i, fac, i])
        stream += b"\xff\xc0" + sof
        sos = bytearray()
        sos += (6 + 2 * spp).to_bytes(2, "big") + bytes([spp])
        for i in range(spp):
            sos += bytes([i, (i << 4) | i])
        sos += bytes([0, 63, 0])
        stream += b"\xff\xda" + sos
        for k, (off, cnt) in enumerate(zip(offsets, counts)):
            if k:
                stream += bytes([0xFF, 0xD0 + ((k - 1) % 8)])
            stream += data[off : off + cnt]
        stream += b"\xff\xd9"
        px = decode_jpeg(bytes(stream))
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    if px.shape[0] < h or px.shape[1] < w:
        raise ValueError("old-style JPEG stream smaller than declared")
    px = px[:h, :w]
    if photometric == 0:
        px = (255 - px.astype(np.int32)).astype(np.uint8)
    return px


def decode_tiff(data: bytes):
    """Decode a baseline TIFF into an (h, w, 3) uint8 RGB array.

    See the module docstring for the supported envelope; unsupported
    organizations raise loudly instead of decoding wrong pixels.
    """
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF file")
    bo = "<" if data[:2] == b"II" else ">"
    end = "little" if bo == "<" else "big"
    if int.from_bytes(data[2:4], end) != 42:
        raise ValueError("bad TIFF magic")
    tags = _read_ifd(data, bo)
    if _T_WIDTH not in tags or _T_HEIGHT not in tags:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    w = tags[_T_WIDTH][0]
    h = tags[_T_HEIGHT][0]
    spp = _spp = tags.get(_T_SPP, [1])[0]
    if not (0 < w and 0 < h and 0 < spp <= 16):
        raise ValueError("TIFF dimensions out of range")
    if w * h > (1 << 26):
        # corrupt headers in a crawl corpus routinely declare
        # billion-pixel images; fail loudly instead of allocating
        raise ValueError(f"TIFF {w}x{h} exceeds the decode pixel cap")
    bits_list = tags.get(_T_BITS, [1] * spp)
    if len(set(bits_list)) != 1:
        raise NotImplementedError("per-sample heterogeneous BitsPerSample")
    bits = bits_list[0]
    compression = tags.get(_T_COMPRESSION, [1])[0]
    photometric = tags.get(_T_PHOTOMETRIC, [1])[0]
    planar = tags.get(_T_PLANAR, [1])[0]
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if planar not in (1, 2):
        raise NotImplementedError(f"planar configuration {planar}")
    t4opts = tags.get(_T_T4OPTIONS, [0])[0]
    if compression == 6:
        return _decode_tiff_oldjpeg(data, tags, w, h, spp, photometric)
    if compression == 7:
        # new-style JPEG (TIFF Technote 2): each strip/tile is a JPEG
        # stream, shared tables come from the JPEGTables tag — decodes
        # straight to pixels, bypassing the byte-row unpack machinery
        return _decode_tiff_jpeg(data, tags, w, h, spp, photometric, planar)
    if compression not in (1, 2, 3, 4, 5, 32773):
        raise NotImplementedError(f"TIFF compression {compression}")
    if compression in (2, 3, 4) and (bits != 1 or spp != 1):
        raise ValueError("CCITT data requires 1-bit single samples")
    if bits not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"{bits}-bit samples not supported")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if predictor == 2 and bits < 8:
        raise ValueError("predictor 2 requires 8/16-bit samples")

    def decompress(off: int, cnt: int, n_rows: int, w_px: int) -> bytes:
        chunk = bytes(data[off : off + cnt])
        if compression == 5:
            return _lzw_decode(chunk)
        if compression == 32773:
            return _packbits_decode(chunk)
        if compression in (2, 3, 4):
            # each strip/tile is an independent CCITT stream; decode
            # to the same packed-bit row layout the uncompressed path
            # uses ('1' = black = the photometric-0 sample value;
            # invert for BlackIsZero)
            from robosystems_spark.operators.g4 import (
                g3_decode,
                g4_decode,
                mh_decode_rows,
                transitions_to_bits,
            )

            if compression == 4:
                trs = g4_decode(chunk, w_px, n_rows)
            elif compression == 3:
                trs = g3_decode(
                    chunk, w_px, n_rows, bool(t4opts & 1),
                    uncompressed=bool(t4opts & 2),
                )
            else:
                trs = mh_decode_rows(chunk, w_px, n_rows)
            bitrows = transitions_to_bits(trs, w_px)
            if photometric == 1:
                bitrows = 1 - bitrows
            return np.packbits(bitrows, axis=1).tobytes()
        return chunk

    def unpack(raw: bytes, n_rows: int, w_px: int, n_spp: int | None = None):
        """Byte rows -> (n_rows, w_px, n_spp) uint32 at source depth,
        predictor undone.  Shared by the strip, tile, and planar
        paths (a tile is just a little image with its own filtered
        rows; a plane is a 1-component image)."""
        spp = n_spp if n_spp is not None else _spp
        row_bytes = (w_px * spp * bits + 7) // 8
        if len(raw) < row_bytes * n_rows:
            raise ValueError("truncated TIFF pixel data")
        rows = np.frombuffer(
            raw, dtype=np.uint8, count=row_bytes * n_rows
        ).reshape(n_rows, row_bytes)
        if bits == 16:
            px = (
                rows.reshape(n_rows, -1)
                .view(np.uint8)
                .reshape(n_rows, w_px * spp, 2)
                .copy()
                .view(f"{bo}u2")
                .reshape(n_rows, w_px, spp)
                .astype(np.uint32)
            )
        elif bits == 8:
            px = (
                rows[:, : w_px * spp]
                .reshape(n_rows, w_px, spp)
                .astype(np.uint32)
            )
        else:  # sub-byte: MSB-first bit order within each byte
            unpacked = np.unpackbits(rows, axis=1)[:, : w_px * spp * bits]
            g = unpacked.reshape(n_rows, w_px * spp, bits)
            weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint32)
            px = (
                (g * weights)
                .sum(axis=2)
                .reshape(n_rows, w_px, spp)
                .astype(np.uint32)
            )
        if predictor == 2:
            # horizontal differencing: undo by cumulative sum along
            # the row, per sample channel, modulo the sample width
            mod = 1 << bits
            px = (np.cumsum(px, axis=1, dtype=np.uint64) % mod).astype(
                np.uint32
            )
        return px

    if planar == 2 and _T_TILE_WIDTH in tags:
        # plane-major TILES (TIFF 6.0 §15 + PlanarConfiguration 2:
        # the full tile grid of plane 0, then plane 1, ...) — each
        # tile is a 1-component little image
        tw = tags[_T_TILE_WIDTH][0]
        tl = tags.get(_T_TILE_LENGTH, [0])[0]
        offsets = tags.get(_T_TILE_OFFSETS)
        counts = tags.get(_T_TILE_COUNTS)
        if not tw or not tl or not offsets or not counts:
            raise ValueError("tiled TIFF missing tile tags")
        if tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + tl - 1) // tl
        tpp = tiles_across * tiles_down  # tiles per plane
        if len(offsets) < tpp * spp or len(counts) < tpp * spp:
            raise ValueError("tile count does not cover all planes")
        planes = []
        for pidx in range(spp):
            plane = np.zeros((h, w), dtype=np.uint32)
            for ty in range(tiles_down):
                for tx in range(tiles_across):
                    i = pidx * tpp + ty * tiles_across + tx
                    tile = unpack(
                        decompress(offsets[i], counts[i], tl, tw), tl, tw, 1
                    )[:, :, 0]
                    y0, x0 = ty * tl, tx * tw
                    ch = min(tl, h - y0)
                    cw = min(tw, w - x0)
                    plane[y0 : y0 + ch, x0 : x0 + cw] = tile[:ch, :cw]
            planes.append(plane)
        px = np.stack(planes, axis=2)
    elif planar == 2:  # plane-major strips (all strips of plane 0, ...)
        offsets = tags.get(_T_STRIP_OFFSETS)
        counts = tags.get(_T_STRIP_COUNTS)
        if not offsets or not counts or len(offsets) % spp:
            raise ValueError("planar TIFF strip tags malformed")
        spl = len(offsets) // spp
        rps_dec = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
        planes = []
        for pidx in range(spp):
            raw = bytearray()
            remaining = h
            for off, cnt in zip(
                offsets[pidx * spl : (pidx + 1) * spl],
                counts[pidx * spl : (pidx + 1) * spl],
            ):
                n_rows = min(rps_dec, remaining)
                raw += decompress(off, cnt, n_rows, w)
                remaining -= n_rows
            planes.append(unpack(bytes(raw), h, w, 1)[:, :, 0])
        px = np.stack(planes, axis=2).astype(np.uint32)
    elif _T_TILE_WIDTH in tags:  # tile organization (TIFF 6.0 §15)
        tw = tags[_T_TILE_WIDTH][0]
        tl = tags.get(_T_TILE_LENGTH, [0])[0]
        offsets = tags.get(_T_TILE_OFFSETS)
        counts = tags.get(_T_TILE_COUNTS)
        if not tw or not tl or not offsets or not counts:
            raise ValueError("tiled TIFF missing tile tags")
        if tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + tl - 1) // tl
        if (len(offsets) < tiles_across * tiles_down
                or len(counts) < tiles_across * tiles_down):
            raise ValueError("tile count does not cover the image")
        px = np.zeros((h, w, spp), dtype=np.uint32)
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                i = ty * tiles_across + tx
                tile = unpack(
                    decompress(offsets[i], counts[i], tl, tw), tl, tw
                )
                y0, x0 = ty * tl, tx * tw
                ch = min(tl, h - y0)
                cw = min(tw, w - x0)
                px[y0 : y0 + ch, x0 : x0 + cw] = tile[:ch, :cw]
    else:
        offsets = tags.get(_T_STRIP_OFFSETS)
        counts = tags.get(_T_STRIP_COUNTS)
        if not offsets:
            raise ValueError("TIFF missing StripOffsets")
        if not counts:  # single uncompressed strip may legally omit it
            if len(offsets) != 1 or compression != 1:
                raise ValueError("TIFF missing StripByteCounts")
            counts = [len(data) - offsets[0]]
        rps_dec = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
        raw = bytearray()
        remaining = h
        for off, cnt in zip(offsets, counts):
            n_rows = min(rps_dec, remaining)
            raw += decompress(off, cnt, n_rows, w)
            remaining -= n_rows
        px = unpack(bytes(raw), h, w)

    if photometric == 3:  # palette-color
        cmap = tags.get(_T_COLORMAP)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        n = 1 << bits
        if len(cmap) < 3 * n:
            raise ValueError("ColorMap shorter than 3 * 2^bits")
        table = np.array(
            [cmap[0:n], cmap[n : 2 * n], cmap[2 * n : 3 * n]],
            dtype=np.uint32,
        ).T  # (n, 3) 16-bit entries
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("palette index out of ColorMap range")
        out16 = table[idx]  # (h, w, 3) in 0..65535
        return ((out16 + 128) // 257).astype(np.uint8)

    # scale samples to 0..255 with integer rounding
    maxval = (1 << bits) - 1
    if bits == 16:
        scaled = (px + 128) // 257
    elif bits == 8:
        scaled = px
    else:
        scaled = (px * 255 + maxval // 2) // maxval
    if photometric == 0:  # WhiteIsZero
        scaled = 255 - scaled
    scaled = scaled.astype(np.uint8)
    if photometric in (0, 1):
        if spp != 1:
            raise NotImplementedError("extra samples on grayscale TIFF")
        return np.repeat(scaled, 3, axis=2).reshape(h, w, 3)
    if photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF requires >= 3 samples per pixel")
        return scaled[:, :, :3].copy()  # extra samples (alpha) dropped
    raise NotImplementedError(f"TIFF photometric {photometric}")


def _jpeg_split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a self-contained JPEG into (tables-only stream,
    abbreviated image stream) — the Technote-2 JPEGTables factoring
    ``_jpeg_splice_tables`` reverses.  DQT/DHT segments move to the
    tables stream; everything else (APPn, SOF, SOS + entropy data)
    stays in the image stream."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray()
    rest = bytearray()
    i = 2
    while i + 4 <= len(stream):
        if stream[i] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = stream[i + 1]
        if marker == 0xDA:  # SOS: entropy data through EOI stays
            rest += stream[i:]
            break
        seglen = int.from_bytes(stream[i + 2 : i + 4], "big")
        seg = stream[i : i + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        i += 2 + seglen
    return (
        b"\xff\xd8" + bytes(tables) + b"\xff\xd9",
        b"\xff\xd8" + bytes(rest),
    )


def _jpeg_parse_for_oldstyle(stream: bytes) -> dict:
    """Walk a self-contained baseline JPEG and pull out the pieces
    the old-style (compression 6) tag set stores separately: raw
    64-byte zigzag quant bodies by Tq, raw DHT payloads by (Tc, Th),
    SOF/SOS per-component table ids + sampling factors, and the bare
    entropy data (SOS to EOI, exclusive)."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    out: dict = {"dqt": {}, "dht": {}}
    i = 2
    while i + 4 <= len(stream):
        if stream[i] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = stream[i + 1]
        seglen = int.from_bytes(stream[i + 2 : i + 4], "big")
        seg = stream[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                if seg[j] >> 4:
                    raise NotImplementedError(
                        "16-bit quant tables have no old-style tag form"
                    )
                out["dqt"][seg[j] & 0xF] = bytes(seg[j + 1 : j + 65])
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                n_vals = sum(seg[j + 1 : j + 17])
                out["dht"][(tc, th)] = bytes(seg[j + 1 : j + 17 + n_vals])
                j += 17 + n_vals
        elif marker == 0xC0:
            n = seg[5]
            out["sof"] = [
                (seg[6 + 3 * c], seg[7 + 3 * c] >> 4,
                 seg[7 + 3 * c] & 0xF, seg[8 + 3 * c])
                for c in range(n)
            ]
        elif marker == 0xDA:
            n = seg[0]
            out["sos"] = [
                (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF)
                for c in range(n)
            ]
            body = stream[i + 2 + seglen :]
            if body[-2:] != b"\xff\xd9":
                raise ValueError("JPEG stream missing EOI")
            out["entropy"] = bytes(body[:-2])
            return out
        i += 2 + seglen
    raise ValueError("JPEG stream missing SOS")


def _split_entropy_at_rst(entropy: bytes) -> list[bytes]:
    """Split entropy-coded data at top-level RSTm markers (stuffed
    FF00 bytes skipped) — the strip boundaries of a multi-strip
    old-style JPEG."""
    parts, start, i, n = [], 0, 0, len(entropy)
    while i + 1 < n:
        if entropy[i] == 0xFF and 0xD0 <= entropy[i + 1] <= 0xD7:
            parts.append(entropy[start:i])
            i += 2
            start = i
        else:
            i += 1
    parts.append(entropy[start:])
    return parts


def encode_tiff(
    arr,
    compression: int = 1,
    byte_order: str = "<",
    bits: int = 8,
    photometric: int | None = None,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    palette=None,
    tile: tuple[int, int] | None = None,
    planar: int = 1,
    t4options: int = 0,
    jpeg_tables: bool = False,
    oldjpeg: str = "interchange",
    oldjpeg_restart_interval: int = 0,
    jpeg_subsample: bool = False,
) -> bytes:
    """Encode an array as a baseline TIFF (decode_tiff inverse) —
    fixture synthesis for oracle entries and tests.

    ``arr``: (h, w, 3) RGB for photometric 2; (h, w) grayscale for
    photometric 0/1 (values at SOURCE depth for bits <= 8, or 16-bit
    values when ``bits=16``); (h, w) palette indices with
    ``palette=(n, 3) uint8`` for photometric 3 (ColorMap entries
    written as ``c * 257``).  ``compression``: 1 / 5 (LZW, with
    optional ``predictor=2``) / 32773 (PackBits, per-row packets) /
    2/3/4 (CCITT bilevel) / 7 (new-style JPEG: one baseline stream
    per strip/tile; ``jpeg_tables=True`` factors the shared DQT/DHT
    into a JPEGTables tag with abbreviated per-chunk streams, the
    real-world Technote-2 shape).
    """
    a = np.asarray(arr)
    end = "little" if byte_order == "<" else "big"
    if palette is not None:
        photometric = 3
        spp = 1
        h, w = a.shape
    elif a.ndim == 3:
        photometric = 2 if photometric is None else photometric
        h, w, spp = a.shape
    else:
        photometric = 1 if photometric is None else photometric
        spp = 1
        h, w = a.shape
    if predictor == 2 and compression != 5:
        raise ValueError("predictor 2 is only meaningful with LZW")
    _spp = spp

    def pack(sub, n_spp: int | None = None) -> np.ndarray:
        """Pack a (rows, cols[, n_spp]) sub-image into filtered byte
        rows — predictor differencing restarts at the sub-image's
        left edge, which is why tiles pack independently."""
        spp = n_spp if n_spp is not None else _spp
        sh, sw = sub.shape[0], sub.shape[1]
        if bits == 16:
            vals = sub.reshape(sh, sw, spp).astype(np.uint16)
            if predictor == 2:
                vals = np.diff(
                    vals.astype(np.int64),
                    axis=1,
                    prepend=np.zeros((sh, 1, spp), dtype=np.int64),
                ).astype(np.uint16)
            return (
                vals.reshape(sh, sw * spp)
                .astype(f"{byte_order}u2")
                .view(np.uint8)
                .reshape(sh, -1)
            )
        if bits == 8:
            vals = sub.reshape(sh, sw, spp).astype(np.uint8)
            if predictor == 2:
                vals = np.diff(
                    vals.astype(np.int16),
                    axis=1,
                    prepend=np.zeros((sh, 1, spp), dtype=np.int16),
                ).astype(np.uint8)
            return vals.reshape(sh, sw * spp)
        if bits in (1, 2, 4):
            flat = sub.reshape(sh, sw * spp).astype(np.uint8)
            b = np.unpackbits(
                flat[..., None], axis=2, count=8, bitorder="big"
            )[:, :, 8 - bits :]
            packed = np.packbits(b.reshape(sh, -1), axis=1)
            return packed[:, : (sw * spp * bits + 7) // 8]
        raise ValueError(f"unsupported bits {bits}")

    def compress_rows(rows: np.ndarray) -> bytes:
        if compression == 5:
            return _lzw_encode(rows.tobytes())
        if compression == 32773:
            return b"".join(
                _packbits_encode(rows[r].tobytes())
                for r in range(rows.shape[0])
            )
        if compression != 1:
            raise ValueError(f"unsupported compression {compression}")
        return rows.tobytes()

    def g4_chunk(sub) -> bytes:
        from robosystems_spark.operators.g4 import (
            bits_to_transitions,
            g3_encode,
            g4_encode,
            mh_encode_rows,
        )

        bits01 = np.asarray(sub, dtype=np.uint8)
        if photometric == 1:
            bits01 = 1 - bits01
        trs = bits_to_transitions(bits01)
        if compression == 4:
            return g4_encode(trs, bits01.shape[1])
        if compression == 3:
            return g3_encode(
                trs, bits01.shape[1], two_d=bool(t4options & 1),
                uncompressed=bool(t4options & 2),
            )
        return mh_encode_rows(trs, bits01.shape[1])

    if compression in (2, 3, 4) and (bits != 1 or spp != 1):
        raise ValueError("CCITT data requires 1-bit single samples")

    chunks = []
    jpeg_tables_bytes: bytes | None = None
    oldjpeg_meta: dict | None = None
    if compression == 6:
        from robosystems_spark.operators.jpeg import encode_jpeg

        if planar != 1 or tile is not None:
            raise ValueError("old-style JPEG supports chunky strips only")
        if bits != 8:
            raise ValueError("JPEG-in-TIFF requires 8-bit samples")
        photometric = 6 if spp == 3 else 1
        a3 = a.reshape(h, w, spp)
        img = a3 if spp == 3 else a3[:, :, 0]
        stream = encode_jpeg(
            img,
            subsample=jpeg_subsample and spp == 3,
            restart_interval=oldjpeg_restart_interval,
        )
        rps = h
        if oldjpeg == "interchange":
            # shape 1: the whole interchange stream, referenced by
            # JPEGInterchangeFormat/-Length instead of strip tags
            chunks = [stream]
            oldjpeg_meta = {"shape": "interchange"}
        elif oldjpeg == "fragmented":
            parsed = _jpeg_parse_for_oldstyle(stream)
            strips = (
                _split_entropy_at_rst(parsed["entropy"])
                if oldjpeg_restart_interval
                else [parsed["entropy"]]
            )
            if oldjpeg_restart_interval:
                rps = oldjpeg_restart_interval * (
                    16 if (jpeg_subsample and spp == 3) else 8
                )
            chunks = list(strips)
            # per-component raw table blobs ride along as aux regions
            sof, sos = parsed["sof"], parsed["sos"]
            aux = []
            for i in range(spp):
                aux.append(parsed["dqt"][sof[i][3]])
            for i in range(spp):
                aux.append(parsed["dht"][(0, sos[i][1])])
            for i in range(spp):
                aux.append(parsed["dht"][(1, sos[i][2])])
            oldjpeg_meta = {
                "shape": "fragmented",
                "aux": aux,
                "subsampling": [sof[0][1], sof[0][2]],
                "restart": oldjpeg_restart_interval,
            }
        else:
            raise ValueError(f"unknown oldjpeg shape {oldjpeg!r}")
    elif compression == 7:
        from robosystems_spark.operators.jpeg import encode_jpeg

        if planar != 1:
            raise ValueError("planar JPEG-in-TIFF not supported")
        if bits != 8:
            raise ValueError("JPEG-in-TIFF requires 8-bit samples")
        photometric = 6 if spp == 3 else 1
        a3 = a.reshape(h, w, spp)
        img = a3 if spp == 3 else a3[:, :, 0]
        if tile is not None:
            tw, tl = tile
            if tw % 16 or tl % 16:
                raise ValueError("tile dimensions must be multiples of 16")
            ph = ((h + tl - 1) // tl) * tl
            pw = ((w + tw - 1) // tw) * tw
            # edge-replicate (not zero-fill): zero padding would put a
            # hard edge inside boundary DCT blocks and ring back into
            # the cropped region on decode
            pad = ((0, ph - h), (0, pw - w)) + (
                ((0, 0),) if spp == 3 else ()
            )
            padded = np.pad(np.asarray(img, dtype=np.uint8), pad, mode="edge")
            for y0 in range(0, padded.shape[0], tl):
                for x0 in range(0, padded.shape[1], tw):
                    chunks.append(
                        encode_jpeg(padded[y0 : y0 + tl, x0 : x0 + tw])
                    )
            rps = None
        else:
            rps = rows_per_strip or h
            for y0 in range(0, h, rps):
                chunks.append(encode_jpeg(img[y0 : y0 + rps]))
        if jpeg_tables:
            split = [_jpeg_split_tables(c) for c in chunks]
            jpeg_tables_bytes = split[0][0]
            if any(t != jpeg_tables_bytes for t, _ in split):
                raise ValueError("per-chunk tables differ; cannot share")
            chunks = [abbrev for _, abbrev in split]
    elif planar == 2:
        if spp < 2:
            raise ValueError("planar 2 needs multiple samples")
        a3 = a.reshape(h, w, spp)
        if tile is not None:
            tw, tl = tile
            if tw % 16 or tl % 16:
                raise ValueError("tile dimensions must be multiples of 16")
            ph = ((h + tl - 1) // tl) * tl
            pw = ((w + tw - 1) // tw) * tw
            for pidx in range(spp):  # plane-major tile order
                padded = np.zeros((ph, pw), dtype=a3.dtype)
                padded[:h, :w] = a3[:, :, pidx]
                for y0 in range(0, ph, tl):
                    for x0 in range(0, pw, tw):
                        chunks.append(
                            compress_rows(
                                pack(padded[y0 : y0 + tl, x0 : x0 + tw], 1)
                            )
                        )
            rps = None
        else:
            rps = rows_per_strip or h
            for pidx in range(spp):
                rows = pack(a3[:, :, pidx], 1)
                for y0 in range(0, h, rps):
                    chunks.append(compress_rows(rows[y0 : y0 + rps]))
    elif tile is not None:
        tw, tl = tile
        if tw % 16 or tl % 16:
            raise ValueError("tile dimensions must be multiples of 16")
        a3 = a.reshape(h, w, spp)
        padded = np.zeros(
            (((h + tl - 1) // tl) * tl, ((w + tw - 1) // tw) * tw, spp),
            dtype=a3.dtype,
        )
        padded[:h, :w] = a3
        for y0 in range(0, padded.shape[0], tl):
            for x0 in range(0, padded.shape[1], tw):
                sub = padded[y0 : y0 + tl, x0 : x0 + tw]
                chunks.append(
                    g4_chunk(sub[:, :, 0])
                    if compression in (2, 3, 4)
                    else compress_rows(pack(sub))
                )
        rps = None
    else:
        rps = rows_per_strip or h
        if compression in (2, 3, 4):
            flat = a.reshape(h, w)
            for y0 in range(0, h, rps):
                chunks.append(g4_chunk(flat[y0 : y0 + rps]))
        else:
            rows = pack(
                a.reshape(h, w, spp) if a.ndim == 3 else a.reshape(h, w)
            )
            for y0 in range(0, h, rps):
                chunks.append(compress_rows(rows[y0 : y0 + rps]))

    # layout: header(8) | strip/tile data | IFD | out-of-line values
    body = bytearray(b"\x00" * 8)
    strip_offsets, strip_counts = [], []
    for s in chunks:
        strip_offsets.append(len(body))
        strip_counts.append(len(s))
        body += s
        if len(body) & 1:
            body += b"\x00"
    aux_offsets: list[int] = []
    if oldjpeg_meta and oldjpeg_meta["shape"] == "fragmented":
        for blob in oldjpeg_meta["aux"]:
            aux_offsets.append(len(body))
            body += blob
            if len(body) & 1:
                body += b"\x00"

    extra = bytearray()  # out-of-line tag values, placed after the IFD

    entries: list[tuple[int, int, int, bytes | int]] = []

    def tag(tid: int, typ: int, vals: list[int]) -> None:
        entries.append((tid, typ, len(vals), vals))

    tag(_T_WIDTH, 4, [w])
    tag(_T_HEIGHT, 4, [h])
    tag(_T_BITS, 3, [bits] * spp)
    tag(_T_COMPRESSION, 3, [compression])
    tag(_T_PHOTOMETRIC, 3, [photometric])
    tag(_T_SPP, 3, [spp])
    if oldjpeg_meta and oldjpeg_meta["shape"] == "interchange":
        tag(_T_JPEGIF, 4, [strip_offsets[0]])
        tag(_T_JPEGIF_LEN, 4, [strip_counts[0]])
    elif oldjpeg_meta:  # fragmented
        tag(_T_STRIP_OFFSETS, 4, strip_offsets)
        tag(_T_ROWS_PER_STRIP, 4, [rps])
        tag(_T_STRIP_COUNTS, 4, strip_counts)
        tag(_T_JPEGPROC, 3, [1])
        tag(_T_JPEGQTABLES, 4, aux_offsets[:spp])
        tag(_T_JPEGDCTABLES, 4, aux_offsets[spp : 2 * spp])
        tag(_T_JPEGACTABLES, 4, aux_offsets[2 * spp : 3 * spp])
        if spp == 3:
            tag(_T_YCBCRSUBSAMPLING, 3, oldjpeg_meta["subsampling"])
        if oldjpeg_meta["restart"]:
            tag(_T_JPEGRESTART, 3, [oldjpeg_meta["restart"]])
    elif tile is not None:
        tag(_T_TILE_WIDTH, 4, [tile[0]])
        tag(_T_TILE_LENGTH, 4, [tile[1]])
        tag(_T_TILE_OFFSETS, 4, strip_offsets)
        tag(_T_TILE_COUNTS, 4, strip_counts)
    else:
        tag(_T_STRIP_OFFSETS, 4, strip_offsets)
        tag(_T_ROWS_PER_STRIP, 4, [rps])
        tag(_T_STRIP_COUNTS, 4, strip_counts)
    tag(_T_PLANAR, 3, [planar])
    if compression == 3:
        tag(_T_T4OPTIONS, 4, [t4options])
    if predictor == 2:
        tag(_T_PREDICTOR, 3, [predictor])
    if jpeg_tables_bytes is not None:
        tag(_T_JPEGTABLES, 7, list(jpeg_tables_bytes))
    if palette is not None:
        p = np.asarray(palette, dtype=np.uint32)
        n = 1 << bits
        full = np.zeros((n, 3), dtype=np.uint32)
        full[: p.shape[0]] = p * 257
        cmap = list(full[:, 0]) + list(full[:, 1]) + list(full[:, 2])
        tag(_T_COLORMAP, 3, [int(v) for v in cmap])

    entries.sort(key=lambda e: e[0])
    ifd_off = len(body)
    ifd = bytearray(len(entries).to_bytes(2, end))
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    for tid, typ, cnt, vals in entries:
        step = _TYPE_SIZES[typ]
        raw = b"".join(int(v).to_bytes(step, end) for v in vals)
        ent = tid.to_bytes(2, end) + typ.to_bytes(2, end)
        ent += cnt.to_bytes(4, end)
        if len(raw) <= 4:
            ent += raw.ljust(4, b"\x00")
        else:
            off = extra_base + len(extra)
            ent += off.to_bytes(4, end)
            extra += raw
            if len(extra) & 1:
                extra += b"\x00"
        ifd += ent
    ifd += (0).to_bytes(4, end)  # next-IFD pointer: none

    body[0:2] = b"II" if byte_order == "<" else b"MM"
    body[2:4] = (42).to_bytes(2, end)
    body[4:8] = ifd_off.to_bytes(4, end)
    return bytes(body) + bytes(ifd) + bytes(extra)
