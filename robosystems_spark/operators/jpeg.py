"""Baseline JPEG (ITU T.81 sequential DCT) codec in pure numpy —
no PIL/libjpeg.  Closes the last compressed-image seam for the
multimodal pipeline: ``decode_jpeg`` handles any baseline, 8-bit
JFIF stream with sampling factors 1 or 2 per axis — including 4:2:0,
the layout virtually every camera/web JPEG uses — with arbitrary
DQT/DHT tables read FROM THE FILE (as the standard requires — no
table constants are assumed); ``encode_jpeg`` produces structurally
standard 4:4:4 or 4:2:0 streams for fixture synthesis, embedding its
own valid canonical Huffman tables (flat-length, suboptimal but
legal — decoders must read DHT, so optimality is irrelevant to
correctness).

Restart intervals (DRI + RSTn markers, common in camera files)
are honored on both sides: the decoder re-syncs at the byte boundary
and resets DC predictors; the encoder emits them via
``restart_interval``.  Honest seams: progressive (SOF2), arithmetic
coding, 12-bit depth, and sampling factors > 2 raise
``NotImplementedError`` — each is a decode-path variant, not a new
idea; the implemented paths cover the round-trip semantics (DCT,
quantization, zigzag, DC prediction, run-length + Huffman entropy
coding, byte stuffing, chroma down/upsampling, restart re-sync)
end to end.

JPEG is LOSSY, so unlike BMP/PPM/PNG there is no closed-form pixel
oracle — correctness is gated by round-trip error bounds instead:
quantization error per coefficient is <= Q[u,v]/2, so a constant
block (DC-only) must round-trip within +-1 and smooth gradients
within a computable bound (tests/test_multimodal_functions.py).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# 8x8 DCT basis (orthonormal type-II); FDCT: C f C^T, IDCT: C^T F C
# ---------------------------------------------------------------------------
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# default quantization tables for the encoder (flat: uniform loss,
# simple error bounds; any table works — the decoder reads DQT)
_Q_LUMA = np.full((8, 8), 16, dtype=np.int32)
_Q_CHROMA = np.full((8, 8), 16, dtype=np.int32)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _category(v: int) -> int:
    """JPEG magnitude category: number of bits in |v| (0 for v=0)."""
    return int(abs(v)).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    """Ones'-complement amplitude encoding (T.81 F.1.2.1)."""
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    """Inverse of _amplitude_bits (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# Canonical Huffman helpers: tables live in DHT as (BITS[1..16], VALS)
# ---------------------------------------------------------------------------
def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical (BITS, VALS) table."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


# encoder's own tables: every symbol at one length (Kraft-valid, legal)
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))  # categories 0..11
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0]
_AC_VALS = [
    (r << 4) | s for r in range(16) for s in range(11) if not (r != 0 and s == 0)
] + [0xF0]  # (run 0-15, size 1-10) + EOB(0x00) + ZRL(0xF0)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    de-stuffing; 0xFF followed by a marker ends the stream."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("hit marker inside entropy stream")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[:, :, i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _write_block(
    writer: _BitWriter,
    plane: np.ndarray,
    by: int,
    bx: int,
    q: np.ndarray,
    dc_codes,
    ac_codes,
    prev_dc: int,
) -> int:
    """FDCT + quantize + entropy-code one 8x8 block; returns new DC."""
    block = plane[by : by + 8, bx : bx + 8] - 128.0
    coef = np.round(_fdct(block) / q).astype(np.int64)
    zz = coef.flatten()[_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    size = _category(diff)
    c, ln = dc_codes[size]
    writer.write(c, ln)
    if size:
        writer.write(_amplitude_bits(diff, size), size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            zc, zl = ac_codes[0xF0]
            writer.write(zc, zl)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        writer.write(c, ln)
        writer.write(_amplitude_bits(v, size), size)
        run = 0
    if run:
        ec, el = ac_codes[0x00]
        writer.write(ec, el)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    q_luma=None,
    q_chroma=None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array as a
    baseline JFIF JPEG — 4:4:4 by default, 4:2:0 with
    ``subsample=True`` (2x2-mean chroma downsampling, the layout
    virtually every camera/web JPEG uses).  Interleaved scan, flat
    default quantization tables (override per call)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qy = np.asarray(q_luma if q_luma is not None else _Q_LUMA, dtype=np.int32)
    qc = np.asarray(q_chroma if q_chroma is not None else _Q_CHROMA, dtype=np.int32)

    mcu = 16 if (subsample and not gray) else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu  # pad to MCU multiples
    if gray:
        planes = [np.pad(a.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")]
    else:
        ycc = _rgb_to_ycbcr(a)
        planes = [
            np.pad(ycc[:, :, i], ((0, ph - h), (0, pw - w)), mode="edge")
            for i in range(3)
        ]
        if subsample:  # 2x2 mean downsample of Cb/Cr
            for i in (1, 2):
                p = planes[i]
                planes[i] = (
                    p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
                ) / 4.0

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT: table 0 (luma) and, for color, table 1 (chroma); 8-bit precision
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qy.flatten()[_ZIGZAG]))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(int(v) for v in qc.flatten()[_ZIGZAG]))
    # SOF0: baseline; luma samples 2x2 in 4:2:0 mode
    ncomp = 1 if gray else 3
    y_samp = 0x22 if (subsample and not gray) else 0x11
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, y_samp if ci == 0 else 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    # DHT: class 0 (DC) id 0, class 1 (AC) id 0 — shared by all components
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    writer = _BitWriter()
    prev = [0] * ncomp
    mcu_count = 0
    rst = 0

    def maybe_restart():
        nonlocal mcu_count, rst, writer, prev
        mcu_count += 1
        if restart_interval and mcu_count % restart_interval == 0:
            out.extend(writer.flush())
            writer = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            prev = [0] * ncomp
    if subsample and not gray:
        # MCU = 4 luma blocks (2x2) + 1 Cb + 1 Cr
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                    prev[0] = _write_block(
                        writer, planes[0], my + dy, mx + dx, qy,
                        dc_codes, ac_codes, prev[0],
                    )
                for ci in (1, 2):
                    prev[ci] = _write_block(
                        writer, planes[ci], my // 2, mx // 2, qc,
                        dc_codes, ac_codes, prev[ci],
                    )
                maybe_restart()
    else:
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci in range(ncomp):
                    q = qy if ci == 0 else qc
                    prev[ci] = _write_block(
                        writer, planes[ci], by, bx, q, dc_codes, ac_codes, prev[ci]
                    )
                maybe_restart()
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline, 8-bit, non-subsampled JPEG into (h, w, 3)
    RGB (or (h, w, 1) for grayscale streams).  All quantization and
    Huffman tables are read from the file's DQT/DHT segments."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    i = 2
    restart_interval = 0
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    comps = []
    scan_comps = []
    scan_start = None
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        length = int.from_bytes(data[i + 2 : i + 4], "big")
        payload = data[i + 4 : i + 2 + length]
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                q = np.zeros(64, dtype=np.int32)
                q[_ZIGZAG] = np.frombuffer(payload[j + 1 : j + 65], np.uint8)
                qtabs[tq] = q.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            j = 0
            while j < len(payload):
                tc, th = payload[j] >> 4, payload[j] & 0x0F
                bits = list(payload[j + 1 : j + 17])
                n = sum(bits)
                vals = list(payload[j + 17 : j + 17 + n])
                htabs[(tc, th)] = _decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = payload[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            hh = int.from_bytes(payload[1:3], "big")
            ww = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            for c in range(nc):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} (1 or 2 supported)"
                    )
                comps.append((cid, tq, hi, vi))
            sof = (hh, ww, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "non-baseline JPEG (progressive/arithmetic/lossless)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(payload[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            for c in range(ns):
                cid, tabs = payload[1 + 2 * c], payload[2 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            scan_start = i + 2 + length
            break
        i += 2 + length
    if sof is None or scan_start is None:
        raise ValueError("missing SOF/SOS")
    h, w, nc = sof
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)
    meta = {cid: (tq, hi, vi) for cid, tq, hi, vi in comps}
    # per-component plane at its NATIVE (possibly subsampled) resolution
    planes = {}
    for cid, _tq, hi, vi in comps:
        planes[cid] = np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), np.float64)

    reader = _BitReader(data, scan_start)
    prev = {cid: 0 for cid, _, _ in scan_comps}

    def read_block(dc_tab, ac_tab, cid) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        size = reader.huff(dc_tab)
        diff = _extend(reader.bits(size), size)
        prev[cid] += diff
        zz[0] = prev[cid]
        k = 1
        while k < 64:
            sym = reader.huff(ac_tab)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                raise ValueError("invalid AC symbol")
            k += run
            if k >= 64:
                raise ValueError("AC run past block end")
            zz[k] = _extend(reader.bits(size), size)
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        coef[_ZIGZAG] = zz
        return _idct(coef.reshape(8, 8) * qtabs[meta[cid][0]]) + 128.0

    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # RSTn: skip to the marker at the next byte boundary,
                # consume it, reset bit state and DC predictors
                reader.n = 0
                while reader.data[reader.pos] != 0xFF or not (
                    0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 1
                reader.pos += 2
                for cid in prev:
                    prev[cid] = 0
            mcu_count += 1
            for cid, dct, act in scan_comps:
                _tq, hi, vi = meta[cid]
                dc_tab, ac_tab = htabs[(0, dct)], htabs[(1, act)]
                for byi in range(vi):
                    for bxi in range(hi):
                        by = (my * vi + byi) * 8
                        bx = (mx * hi + bxi) * 8
                        planes[cid][by : by + 8, bx : bx + 8] = read_block(
                            dc_tab, ac_tab, cid
                        )

    # upsample subsampled components to full resolution (replication)
    full = []
    for cid, _tq, hi, vi in comps:
        p = planes[cid]
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        full.append(p[:h, :w])
    if nc == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    ycc = np.stack(full, axis=2)
    return _ycbcr_to_rgb(ycc)
