"""CCITT Group 4 (ITU-T T.6, MMR) bilevel codec in pure Python —
the compression of scanned-document TIFFs (every fax archive and
most book/document scans on the web), wired into the TIFF decoder
as compression 4.

G4 codes each row against the row above via CHANGING ELEMENTS:

- vertical modes V(d), d in [-3, 3]: this row's next color change
  sits within 3 pixels of the reference row's (the common case on
  text — strokes move slowly between rows);
- pass mode: the reference row's structure ends before this row's
  next change (skip past it);
- horizontal mode: structure diverged — fall back to two explicit
  T.4 modified-Huffman run lengths (white/black tables below).

Rows are materialized from transition-position lists (positions
where the color flips, starting white), so a row's pixel work is
O(changes), not O(width).

Tables are the public ITU-T T.4 white/black terminating + makeup
codes and the shared extended makeups.  ``_validate_tables`` checks
prefix-freeness and Kraft completeness of each table at import time
— a transcription typo in any code breaks one of those properties
loudly rather than silently producing self-consistent-but-wrong
streams.

Scale shape: like the other codecs, G4 streams decode inside one
mapInPandas task; strips/tiles are independent G4 streams (the
reference row resets), so they remain the intra-file parallel unit.
"""

from __future__ import annotations

from bisect import bisect_right

# ITU-T T.4 modified-Huffman run-length codes: {run: bitstring}.
_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}
# extended makeups 1792-2560, shared by both colors (T.4 table 3)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# 2D mode codes (T.6 table 1); EOL-prefixed codes never occur in G4
_MODE_CODES = {
    "1": ("V", 0),
    "011": ("V", 1),
    "010": ("V", -1),
    "001": ("H", None),
    "0001": ("P", None),
    "000011": ("V", 2),
    "000010": ("V", -2),
    "0000011": ("V", 3),
    "0000010": ("V", -3),
}


def _validate_tables() -> None:
    """Prefix-freeness + Kraft completeness of each Huffman table —
    catches transcription typos at import (a wrong code would
    otherwise stay self-consistent between our encoder/decoder and
    only fail on REAL files)."""
    for name, table in (
        ("white", {**_WHITE_TERM, **_WHITE_MAKEUP, **_EXT_MAKEUP}),
        ("black", {**_BLACK_TERM, **_BLACK_MAKEUP, **_EXT_MAKEUP}),
    ):
        codes = sorted(table.values())
        if len(set(codes)) != len(codes):
            raise AssertionError(f"duplicate code in {name} MH table")
        for i, c in enumerate(codes):
            for d in codes[i + 1 :]:
                if d.startswith(c):
                    raise AssertionError(
                        f"{name} MH table not prefix-free: {c} / {d}"
                    )
        # Kraft sum: the full T.4 tree also contains the EOL/extension
        # prefix 0000000...; each color table must fit under 1
        kraft = sum(2.0 ** -len(c) for c in codes)
        if not 0.97 < kraft <= 1.0:
            raise AssertionError(f"{name} MH Kraft sum {kraft}")
    modes = sorted(_MODE_CODES)
    for i, c in enumerate(modes):
        for d in modes[i + 1 :]:
            if d.startswith(c):
                raise AssertionError(f"mode codes not prefix-free")


_validate_tables()

_WHITE_DEC = {v: k for k, v in {**_WHITE_TERM, **_WHITE_MAKEUP,
                                **_EXT_MAKEUP}.items()}
_BLACK_DEC = {v: k for k, v in {**_BLACK_TERM, **_BLACK_MAKEUP,
                                **_EXT_MAKEUP}.items()}
_MH_MAXLEN = 13


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = "".join(f"{b:08b}" for b in data)
        self.pos = 0

    def read_mode(self):
        for ln in range(1, 8):
            c = self.bits[self.pos : self.pos + ln]
            if c in _MODE_CODES:
                self.pos += ln
                return _MODE_CODES[c]
        raise ValueError(
            f"bad G4 mode code at bit {self.pos}: "
            f"{self.bits[self.pos : self.pos + 14]!r}"
        )

    def read_run(self, black: bool) -> int:
        """One full MH run: zero or more makeup codes + a terminating
        code (< 64)."""
        table = _BLACK_DEC if black else _WHITE_DEC
        total = 0
        while True:
            run = None
            for ln in range(2, _MH_MAXLEN + 1):
                c = self.bits[self.pos : self.pos + ln]
                if c in table:
                    run = table[c]
                    self.pos += ln
                    break
            if run is None:
                raise ValueError(
                    f"bad MH code at bit {self.pos} "
                    f"({'black' if black else 'white'})"
                )
            total += run
            if run < 64:  # terminating code ends the run
                return total


def _next_ref(ref: list[int], a0: int, parity: int, width: int):
    """(b1, b2): the first reference-line change > a0 whose index
    parity matches (even = white->black), and the change after it."""
    j = bisect_right(ref, a0)
    if j < len(ref) and (j & 1) != parity:
        j += 1
    b1 = ref[j] if j < len(ref) else width
    b2 = ref[j + 1] if j + 1 < len(ref) else width
    return b1, b2


def g4_decode(data: bytes, width: int, height: int) -> list[list[int]]:
    """Decode a G4 stream into per-row transition lists (positions
    where color flips; rows start white)."""
    r = _BitReader(data)
    ref: list[int] = []
    rows: list[list[int]] = []
    for _y in range(height):
        cur: list[int] = []
        a0 = -1
        color = 0  # 0 = white
        budget = 2 * width + 64  # corrupt streams must fail, not hang
        while a0 < width:
            budget -= 1
            if budget < 0:
                raise ValueError("G4 row does not terminate")
            kind, d = r.read_mode()
            b1, b2 = _next_ref(ref, a0, color, width)
            if kind == "P":
                a0 = b2
            elif kind == "V":
                a1 = b1 + d
                if not -1 <= a1 <= width:
                    raise ValueError("G4 vertical mode out of range")
                cur.append(a1)
                a0 = a1
                color ^= 1
            else:  # horizontal: two explicit runs, color unchanged
                s = max(a0, 0)
                r1 = r.read_run(black=bool(color))
                r2 = r.read_run(black=not bool(color))
                a1 = s + r1
                a2 = a1 + r2
                if a2 > width:
                    raise ValueError("G4 horizontal run past row end")
                cur.append(a1)
                cur.append(a2)
                a0 = a2
        rows.append([t for t in cur if t < width])
        ref = cur
    return rows


def g4_encode(rows: list[list[int]], width: int) -> bytes:
    """Encode per-row transition lists as a G4 stream (the decoder
    inverse; fixture synthesis).  Emits EOFB and pads to a byte."""
    out: list[str] = []

    def emit_run(run: int, black: bool) -> None:
        term = _BLACK_TERM if black else _WHITE_TERM
        makeup = {**(_BLACK_MAKEUP if black else _WHITE_MAKEUP),
                  **_EXT_MAKEUP}
        while run >= 64:
            best = max(m for m in makeup if m <= run)
            # a makeup must leave a representable terminator (< 64
            # after all makeups) — largest-first always does, since
            # makeups step by 64
            if run - best >= 64:
                out.append(makeup[2560])
                run -= 2560
                continue
            out.append(makeup[best])
            run -= best
        out.append(term[run])

    ref: list[int] = []
    for cur in rows:
        a0 = -1
        color = 0
        while a0 < width:
            j = bisect_right(cur, a0)
            a1 = cur[j] if j < len(cur) else width
            b1, b2 = _next_ref(ref, a0, color, width)
            if b2 < a1:
                out.append("0001")  # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                out.append(
                    {0: "1", 1: "011", -1: "010", 2: "000011",
                     -2: "000010", 3: "0000011", -3: "0000010"}[a1 - b1]
                )
                a0 = a1
                color ^= 1
            else:
                out.append("001")  # horizontal
                s = max(a0, 0)
                a2 = cur[j + 1] if j + 1 < len(cur) else width
                emit_run(a1 - s, black=bool(color))
                emit_run(a2 - a1, black=not bool(color))
                a0 = a2
        ref = cur
    out.append("000000000001" * 2)  # EOFB
    bits = "".join(out)
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def transitions_to_bits(rows: list[list[int]], width: int):
    """Transition lists -> (h, w) uint8 bit array (1 = black)."""
    import numpy as np

    h = len(rows)
    out = np.zeros((h, width), dtype=np.uint8)
    for y, tr in enumerate(rows):
        for i in range(0, len(tr), 2):
            start = tr[i]
            end = tr[i + 1] if i + 1 < len(tr) else width
            out[y, start:end] = 1
    return out


def bits_to_transitions(arr) -> list[list[int]]:
    """(h, w) 0/1 array -> per-row transition lists."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    rows = []
    for y in range(a.shape[0]):
        row = a[y]
        prev = np.concatenate(([0], row[:-1]))
        rows.append(list(np.nonzero(row != prev)[0].astype(int)))
    return rows


def mh_decode_rows(
    data: bytes, width: int, height: int
) -> list[list[int]]:
    """CCITT Modified-Huffman RLE (TIFF compression 2): each row is
    an independent 1-D sequence of alternating white/black T.4 run
    codes, BYTE-ALIGNED at the start of every row (no EOL codes —
    the TIFF flavor).  Returns per-row transition lists."""
    rows: list[list[int]] = []
    r = _BitReader(data)
    for _y in range(height):
        if r.pos % 8:  # rows start on byte boundaries
            r.pos += 8 - (r.pos % 8)
        cur: list[int] = []
        pos = 0
        black = False
        budget = 2 * width + 64
        while pos < width:
            budget -= 1
            if budget < 0:
                raise ValueError("MH row does not terminate")
            run = r.read_run(black=black)
            pos += run
            if pos > width:
                raise ValueError("MH run past row end")
            cur.append(pos)
            black = not black
        rows.append([t for t in cur if t < width])
    return rows


def mh_encode_rows(rows: list[list[int]], width: int) -> bytes:
    """MH RLE encoder (decode inverse): alternating runs per row,
    byte-aligned rows."""
    out = bytearray()
    bitbuf = ""

    def flush_row(bits: str) -> None:
        nonlocal bitbuf
        bitbuf += bits
        bitbuf += "0" * (-len(bitbuf) % 8)
        while len(bitbuf) >= 8:
            out.append(int(bitbuf[:8], 2))
            bitbuf = bitbuf[8:]

    for tr in rows:
        bits_parts: list[str] = []
        prev = 0
        black = False
        for t in list(tr) + [width]:
            run = t - prev
            term = _BLACK_TERM if black else _WHITE_TERM
            makeup = {
                **(_BLACK_MAKEUP if black else _WHITE_MAKEUP),
                **_EXT_MAKEUP,
            }
            while run >= 64:
                best = max(m for m in makeup if m <= run)
                if run - best >= 64:
                    bits_parts.append(makeup[2560])
                    run -= 2560
                    continue
                bits_parts.append(makeup[best])
                run -= best
            bits_parts.append(term[run])
            prev = t
            black = not black
        flush_row("".join(bits_parts))
    return bytes(out)


_EOL = "000000000001"


# T.4 uncompressed-mode entry codes: the 2-D extension code
# 0000001xxx and the 1-D extension code 000000001xxx, both with
# xxx = 111 (T.4 sections 4.2.1.3.5 / table 10)
_UNC_ENTRY_2D = "0000001111"
_UNC_ENTRY_1D = "000000001111"


def _read_uncompressed(
    r: "_BitReader", pos: int, color: int, cur: list[int], width: int
) -> tuple[int, int]:
    """Decode one T.4 uncompressed-mode span: literal pixel codes
    (n<=4 zeros + '1' emits n whites + a black; five zeros + '1'
    emits five whites; 6..10 zeros + '1' + T exits with 0..4 whites
    and T = the color of the next ordinary run).  Appends transitions
    to ``cur`` as the literal pixels change color; returns the new
    position and the resumed coding color."""

    def emit(px_color: int, count: int) -> int:
        nonlocal pos, color
        if count and px_color != color:
            cur.append(pos)
            color = px_color
        pos += count
        if pos > width:
            raise ValueError("G3 uncompressed run past row end")
        return pos

    while True:
        zeros = 0
        while r.bits[r.pos : r.pos + 1] == "0":
            zeros += 1
            r.pos += 1
            if zeros > 10:
                raise ValueError("bad G3 uncompressed code")
        if r.bits[r.pos : r.pos + 1] != "1":
            raise ValueError("truncated G3 uncompressed code")
        r.pos += 1
        if zeros <= 4:
            emit(0, zeros)
            emit(1, 1)
        elif zeros == 5:
            emit(0, 5)
        else:  # 6..10: exit with (zeros - 6) whites + next-color bit
            emit(0, zeros - 6)
            t = r.bits[r.pos : r.pos + 1]
            if t not in ("0", "1"):
                raise ValueError("truncated G3 uncompressed exit")
            r.pos += 1
            if int(t) != color and pos < width:
                # the color flips AT the exit point; ordinary coding
                # resumes with the new color, so the transition must
                # be recorded here or it is lost
                cur.append(pos)
            return pos, int(t)


def g3_decode(
    data: bytes, width: int, height: int, two_d: bool,
    uncompressed: bool = False,
) -> list[list[int]]:
    """CCITT T.4 Group 3 decode (TIFF compression 3): every row is
    framed by an EOL code (with optional zero fill bits before it);
    in 2-D mode (T4Options bit 0) a tag bit after each EOL says
    whether the row is 1-D (MH runs) or 2-D (the G4 modes against
    the previous row).  With ``uncompressed`` (T4Options bit 1), the
    T.4 extension codes may switch any row into literal-pixel
    uncompressed mode mid-row.  Returns per-row transition lists."""
    r = _BitReader(data)
    rows: list[list[int]] = []
    ref: list[int] = []
    for _y in range(height):
        at = r.bits.find(_EOL, r.pos)
        if at < 0:
            raise ValueError("missing G3 EOL")
        if r.bits[r.pos : at].strip("0"):
            raise ValueError("non-zero fill bits before G3 EOL")
        r.pos = at + len(_EOL)
        one_d = True
        if two_d:
            one_d = r.bits[r.pos] == "1"
            r.pos += 1
        cur: list[int] = []
        budget = 2 * width + 64
        if one_d:
            pos = 0
            black = False
            while pos < width:
                budget -= 1
                if budget < 0:
                    raise ValueError("G3 row does not terminate")
                if uncompressed and r.bits.startswith(
                    _UNC_ENTRY_1D, r.pos
                ):
                    r.pos += len(_UNC_ENTRY_1D)
                    pos, nxt = _read_uncompressed(
                        r, pos, int(black), cur, width
                    )
                    black = bool(nxt)
                    continue
                run = r.read_run(black=black)
                pos += run
                if pos > width:
                    raise ValueError("G3 1-D run past row end")
                cur.append(pos)
                black = not black
        else:
            a0 = -1
            color = 0
            while a0 < width:
                budget -= 1
                if budget < 0:
                    raise ValueError("G3 row does not terminate")
                if uncompressed and r.bits.startswith(
                    _UNC_ENTRY_2D, r.pos
                ):
                    r.pos += len(_UNC_ENTRY_2D)
                    a0, color = _read_uncompressed(
                        r, max(a0, 0), color, cur, width
                    )
                    continue
                kind, d = r.read_mode()
                b1, b2 = _next_ref(ref, a0, color, width)
                if kind == "P":
                    a0 = b2
                elif kind == "V":
                    a1 = b1 + d
                    if not -1 <= a1 <= width:
                        raise ValueError("G3 2-D vertical out of range")
                    cur.append(a1)
                    a0 = a1
                    color ^= 1
                else:
                    s = max(a0, 0)
                    r1 = r.read_run(black=bool(color))
                    r2 = r.read_run(black=not bool(color))
                    a1 = s + r1
                    a2 = a1 + r2
                    if a2 > width:
                        raise ValueError("G3 2-D run past row end")
                    cur.append(a1)
                    cur.append(a2)
                    a0 = a2
        rows.append([t for t in cur if t < width])
        ref = cur
    return rows


def g3_encode(
    rows: list[list[int]], width: int, two_d: bool,
    uncompressed: bool = False,
) -> bytes:
    """G3 encoder (decode inverse): EOL-framed rows; in 2-D mode,
    rows alternate 1-D / 2-D so both tag-bit paths are exercised
    (the K-parameter discipline of real G3 encoders).  With
    ``uncompressed`` (T4Options bit 1), every row is coded in T.4
    uncompressed mode — entry extension code, literal pixel codes,
    exit at row end — exercising both entry shapes (1-D and 2-D tag
    rows keep their tag bits)."""
    out: list[str] = []

    def emit_uncompressed(cur: list[int]) -> None:
        whites = 0
        prev, c = 0, 0
        for t in list(cur) + [width]:
            ln = t - prev
            prev = t
            if c == 0:
                whites += ln
            else:
                for _ in range(ln):
                    while whites >= 5:
                        out.append("000001")
                        whites -= 5
                    out.append("0" * whites + "1")
                    whites = 0
            c ^= 1
        while whites > 4:
            out.append("000001")
            whites -= 5
        # exit: 0..4 trailing whites folded into the code, next-run
        # color bit 0 (white) — the row ends here anyway
        out.append("0" * (6 + whites) + "1" + "0")

    def emit_run(run: int, black: bool) -> None:
        term = _BLACK_TERM if black else _WHITE_TERM
        makeup = {**(_BLACK_MAKEUP if black else _WHITE_MAKEUP),
                  **_EXT_MAKEUP}
        while run >= 64:
            best = max(m for m in makeup if m <= run)
            if run - best >= 64:
                out.append(makeup[2560])
                run -= 2560
                continue
            out.append(makeup[best])
            run -= best
        out.append(term[run])

    ref: list[int] = []
    for y, cur in enumerate(rows):
        out.append(_EOL)
        one_d = (y % 2 == 0) or not two_d
        if two_d:
            out.append("1" if one_d else "0")
        if uncompressed:
            out.append(_UNC_ENTRY_1D if one_d else _UNC_ENTRY_2D)
            emit_uncompressed(cur)
            ref = cur
            continue
        if one_d:
            prev = 0
            black = False
            for t in list(cur) + [width]:
                emit_run(t - prev, black)
                prev = t
                black = not black
        else:
            a0 = -1
            color = 0
            while a0 < width:
                j = bisect_right(cur, a0)
                a1 = cur[j] if j < len(cur) else width
                b1, b2 = _next_ref(ref, a0, color, width)
                if b2 < a1:
                    out.append("0001")
                    a0 = b2
                elif abs(a1 - b1) <= 3:
                    out.append(
                        {0: "1", 1: "011", -1: "010", 2: "000011",
                         -2: "000010", 3: "0000011",
                         -3: "0000010"}[a1 - b1]
                    )
                    a0 = a1
                    color ^= 1
                else:
                    out.append("001")
                    s = max(a0, 0)
                    a2 = cur[j + 1] if j + 1 < len(cur) else width
                    emit_run(a1 - s, black=bool(color))
                    emit_run(a2 - a1, black=not bool(color))
                    a0 = a2
        ref = cur
    bits = "".join(out)
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
