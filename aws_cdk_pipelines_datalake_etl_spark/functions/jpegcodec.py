"""Pure-Python baseline + progressive JPEG codec (VERDICT r5 #7 /
r6 stretch).

Closes the compressed-image seam without external libraries: both
halves are built from the public JPEG specification (ITU-T T.81 /
ISO 10918-1) — marker structure from Annex B, the example
quantization and Huffman tables from Annex K, the DCT definition from
A.3.3, progressive scan semantics from Annex G — with numpy used for
the 8x8 transform math only.

Scope (and honest non-scope):

- **Decoder**: baseline sequential DCT (SOF0) AND progressive DCT
  (SOF2) — spectral selection and successive approximation, DC and
  AC refinement scans, EOB-run coding — 8-bit samples, 1 or 3
  components, 4:4:4 only (all sampling factors 1x1).  Both frame
  types share one scan decoder: baseline is simply the single
  interleaved Ss=0..Se=63, Ah=Al=0 scan of the coefficient-
  accumulation model.  Subsampled, 12-bit, lossless/hierarchical,
  arithmetic-coded, and restart-interval streams raise
  ``NotImplementedError`` with the exact reason — same policy as the
  PNG decoder's bit-depth gate.
- **Encoder**: the matching subset — ``encode_jpeg`` (SOF0) and
  ``encode_jpeg_progressive`` (SOF2 with a libjpeg-style default
  scan script: shifted DC first, split+shifted AC bands, AC and DC
  refinement scans), both 4:4:4 with the Annex-K example tables.
  Progressive re-orders the SAME quantized coefficients, so
  progressive decode is bit-identical to baseline decode of the same
  image — the invariance the tests assert.

Determinism: the 2-D DCT/IDCT is an exact orthonormal matrix product
in float64 (the JPEG A.3.3 definition, not a fast factorization), so
decode output is bit-identical across platforms — IEEE 754 matmul on
the same inputs, then one round-half-away-from-zero to uint8.

Exact-fixed-point device used by the registry oracle: an 8x8 block
holding one CONSTANT value ``v`` has a single nonzero coefficient,
DC = 8*(v-128).  With the Annex-K luminance DC step of 16, the
quantized DC is exactly (v-128)/2 whenever ``v-128`` is even, so
quantize -> dequantize -> IDCT reproduces ``v`` EXACTLY (the matmul
reconstructs a constant within ~1e-13, and the final rounding lands
it).  Per-block-constant gray images with even offsets therefore
round-trip bit-exactly through the real entropy coder — a closed
form a SQL oracle can replay — while the Huffman/marker layers are
exercised for real (nonzero DC diffs, EOBs, byte stuffing).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC_JPEG = b"\xff\xd8\xff"

# --- ITU-T T.81 Annex K.1: example quantization tables (natural order)
STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag scan: ZIGZAG[k] = natural-order index of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# --- Annex K.3: typical Huffman tables as (BITS[1..16], HUFFVAL) ---
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: the JPEG A.3.3 transform is
    exactly F = M @ f @ M.T (M[0,:] = 1/(2*sqrt(2)); M[u,x] =
    cos((2x+1)u*pi/16) / 2)."""
    m = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            m[u, x] = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return m


_DCT_M = _dct_matrix()


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float64 plane -> (n_blocks_y, n_blocks_x, 8, 8), padding
    by edge replication (the standard encoder convention)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    )


# --------------------------------------------------------------------
# Huffman machinery (spec Annex C: canonical codes from BITS/HUFFVAL)
# --------------------------------------------------------------------


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _HuffTable:
    """16-bit-lookahead Huffman decode table (round 9): every possible
    16-bit window maps to (code length, symbol) — one peek + two
    indexed loads per symbol instead of the bit-by-bit
    ``(length, code)`` dict walk (which cost one dict probe PER BIT;
    the profile showed ``huff``+``bit`` at ~75% of progressive decode).
    JPEG codes are <= 16 bits, so the table is total: a window whose
    prefix is no code has length 0 (invalid-code sentinel)."""

    __slots__ = ("lut_len", "lut_sym")

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lut_len = bytearray(1 << 16)
        self.lut_sym = bytearray(1 << 16)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                self.lut_len[lo:hi] = bytes([length]) * (hi - lo)
                self.lut_sym[lo:hi] = bytes([vals[k]]) * (hi - lo)
                code += 1
                k += 1
            code <<= 1


def _build_decode_table(bits: list[int], vals: list[int]) -> _HuffTable:
    """Huffman decode table (see :class:`_HuffTable`)."""
    return _HuffTable(bits, vals)


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (a 0xFF data
    byte is followed by 0x00 so it can't be mistaken for a marker)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.put(0x7F, 8 - self._n)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data; raises on markers
    inside the scan (no restart support).

    Round 9: the whole entropy-coded segment is DESTUFFED ONCE up
    front (numpy scan for the terminating marker + vectorized 0xFF00
    unstuffing), after which ``bit`` is two shifts on a flat bit
    cursor, ``bits`` one ``int.from_bytes`` window, and ``huff`` one
    16-bit peek into the :class:`_HuffTable` lookahead — the
    bit-by-bit dict walk this replaces was ~75% of progressive decode
    time.  ``pos`` (used only by the caller's ``_next_marker``) is the
    marker position the destuffer already found."""

    def __init__(self, data: bytes, pos: int) -> None:
        arr = np.frombuffer(data, dtype=np.uint8)[pos:]
        cand = np.flatnonzero((arr[:-1] == 0xFF) & (arr[1:] != 0x00))
        if cand.size:
            end = int(cand[0])
            self.pos = pos + end  # the 0xFF of the next marker
            self._end_is_marker = int(arr[end + 1])
        else:
            end = len(arr)
            self.pos = pos + end
            self._end_is_marker = None
        seg = arr[:end]
        stuffed = np.flatnonzero(seg[:-1] == 0xFF) + 1
        self._dest = (
            np.delete(seg, stuffed).tobytes() if stuffed.size else seg.tobytes()
        )
        self._nbits = 8 * len(self._dest)
        self._bitpos = 0

    def _end_error(self) -> Exception:
        if self._end_is_marker is not None:
            return NotImplementedError(
                f"marker 0xFF{self._end_is_marker:02X} inside scan "
                "(restart intervals / multi-scan streams not supported)"
            )
        return ValueError("truncated entropy-coded segment")

    def bit(self) -> int:
        bp = self._bitpos
        if bp >= self._nbits:
            raise self._end_error()
        self._bitpos = bp + 1
        return (self._dest[bp >> 3] >> (7 - (bp & 7))) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        bp = self._bitpos
        if bp + n > self._nbits:
            raise self._end_error()
        self._bitpos = bp + n
        lo = bp >> 3
        hi = (bp + n - 1) >> 3
        chunk = int.from_bytes(self._dest[lo : hi + 1], "big")
        return (chunk >> (8 * (hi - lo + 1) - (bp & 7) - n)) & ((1 << n) - 1)

    def huff(self, table: _HuffTable) -> int:
        bp = self._bitpos
        lo = bp >> 3
        window = self._dest[lo : lo + 3]
        peek = (
            int.from_bytes(window, "big") << (8 * (3 - len(window)))
            >> (8 - (bp & 7))
        ) & 0xFFFF
        length = table.lut_len[peek]
        if length == 0:
            if bp + 16 > self._nbits:
                raise self._end_error()
            raise ValueError("invalid Huffman code in scan")
        if bp + length > self._nbits:
            raise self._end_error()
        self._bitpos = bp + length
        return table.lut_sym[peek]


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(bits_val: int, size: int) -> int:
    """Inverse of :func:`_magnitude` (spec F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


# --------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w, 3) float64 YCbCr (JFIF full range)."""
    f = px.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    """(h, w, 3) float64 YCbCr -> (h, w, 3) uint8 RGB (JFIF)."""
    y, cb, cr = planes[:, :, 0], planes[:, :, 1] - 128.0, planes[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _encode_plane_blocks(
    plane: np.ndarray, qt: np.ndarray
) -> tuple[np.ndarray, int, int]:
    """Plane -> (by, bx, 64) int32 quantized zigzagged coefficients."""
    blocks = _blocks(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ux,ijxy,vy->ijuv", _DCT_M, blocks, _DCT_M)
    q = qt.reshape(8, 8).astype(np.float64)
    # round half away from zero, like every reference implementation
    quant = np.sign(coeffs) * np.floor(np.abs(coeffs) / q + 0.5)
    zz = quant.reshape(blocks.shape[0], blocks.shape[1], 64)[
        :, :, ZIGZAG
    ].astype(np.int32)
    return zz, blocks.shape[0], blocks.shape[1]


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 1|3) uint8 pixels as a baseline-sequential 4:4:4
    JPEG with the Annex-K example quantization and Huffman tables."""
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError(f"channels {nc} (1 or 3)")
    if nc == 3:
        planes = _rgb_to_ycbcr(pixels)
    else:
        planes = pixels.astype(np.float64)

    qts = [STD_LUMA_QT] + ([STD_CHROMA_QT] if nc == 3 else [])
    comp_qt = [0] + [1, 1][: max(0, nc - 1)]
    zz = []
    for ci in range(nc):
        plane = planes[:, :, ci] if nc == 3 else planes[:, :, 0]
        z, by, bx = _encode_plane_blocks(plane, qts[comp_qt[ci]])
        zz.append(z)

    dc_enc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_enc = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)]
    if nc == 3:
        dc_enc.append(_build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_enc.append(_build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS))
    comp_ht = comp_qt  # table 0 for luma, 1 for chroma

    wtr = _BitWriter()
    pred = [0] * nc
    for my in range(by):
        for mx in range(bx):
            for ci in range(nc):
                block = zz[ci][my, mx]
                t = comp_ht[ci]
                diff = int(block[0]) - pred[ci]
                pred[ci] = int(block[0])
                size, bits_val = _magnitude(diff)
                code, ln = dc_enc[t][size]
                wtr.put(code, ln)
                if size:
                    wtr.put(bits_val, size)
                run = 0
                for k in range(1, 64):
                    v = int(block[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[t][0xF0]  # ZRL
                        wtr.put(code, ln)
                        run -= 16
                    size, bits_val = _magnitude(v)
                    code, ln = ac_enc[t][(run << 4) | size]
                    wtr.put(code, ln)
                    wtr.put(bits_val, size)
                    run = 0
                if run:
                    code, ln = ac_enc[t][0x00]  # EOB
                    wtr.put(code, ln)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qts):
        out += seg(0xDB, bytes([i]) + bytes(int(qt[z]) for z in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, comp_qt[ci]])
    out += seg(0xC0, sof)
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if nc == 3:
        hts += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, bits, vals in hts:
        out += seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (comp_ht[ci] << 4) | comp_ht[ci]])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------
# Progressive encoder (T.81 Annex G.1, Huffman procedures)
# --------------------------------------------------------------------

# The Annex-K AC tables carry no EOBn symbols for n >= 1 (baseline
# never emits them), so progressive scans use this self-describing
# FLAT table instead: every possible RRRRSSSS symbol, 128 at 8 bits
# and 128 at 9 bits (a BITS entry is one byte, so one length can hold
# at most 255 codes).  It is a valid canonical Huffman table, costs
# compression these synthetic-test JPEGs don't care about, and lets
# the encoder emit true multi-block EOB runs — which is exactly the
# decoder path worth exercising.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(256))

_MAX_EOBRUN = 0x7FFF


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (G.1.2.2): magnitude shift, sign kept."""
    return v >> al if v >= 0 else -((-v) >> al)


def _default_prog_scans(nc: int) -> list[tuple[tuple[int, ...], int, int, int, int]]:
    """libjpeg-style default script: shifted DC first, split+shifted
    AC bands, then AC and DC refinements down to Al=0 — covering the
    spectral-selection AND successive-approximation decode paths.
    Each entry is (components, Ss, Se, Ah, Al)."""
    if nc == 3:
        return [
            ((0, 1, 2), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((2,), 1, 63, 0, 1),
            ((1,), 1, 63, 0, 1),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0, 1, 2), 0, 0, 1, 0),
            ((2,), 1, 63, 1, 0),
            ((1,), 1, 63, 1, 0),
            ((0,), 1, 63, 1, 0),
        ]
    return [
        ((0,), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 2),
        ((0,), 6, 63, 0, 2),
        ((0,), 1, 63, 2, 1),
        ((0,), 0, 0, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]


class _EobState:
    """Cross-block EOB-run accumulator for one AC scan, with the
    refinement-scan correction bits that ride along with it."""

    def __init__(self, wtr: _BitWriter, ac_enc: dict) -> None:
        self.wtr = wtr
        self.ac_enc = ac_enc
        self.run = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.run:
            nbits = self.run.bit_length() - 1
            code, ln = self.ac_enc[nbits << 4]
            self.wtr.put(code, ln)
            if nbits:
                self.wtr.put(self.run - (1 << nbits), nbits)
        for b in self.pending:
            self.wtr.put(b, 1)
        self.run = 0
        self.pending = []

    def add(self, bits: list[int]) -> None:
        self.run += 1
        self.pending.extend(bits)
        if self.run == _MAX_EOBRUN or len(self.pending) > 900:
            self.flush()


def _enc_ac_first_block(
    wtr: _BitWriter, eob: _EobState, zz: np.ndarray, ss: int, se: int, al: int,
    ac_enc: dict,
) -> None:
    vals = [_pt_ac(int(zz[k]), al) for k in range(ss, se + 1)]
    if not any(vals):
        eob.add([])
        return
    eob.flush()
    run = 0
    last_nz = max(i for i, v in enumerate(vals) if v)
    for i, v in enumerate(vals):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            wtr.put(code, ln)
            run -= 16
        size, bits_val = _magnitude(v)
        code, ln = ac_enc[(run << 4) | size]
        wtr.put(code, ln)
        wtr.put(bits_val, size)
        run = 0
    if last_nz < len(vals) - 1:
        eob.add([])


def _enc_ac_refine_block(
    wtr: _BitWriter, eob: _EobState, zz: np.ndarray, ss: int, se: int, al: int,
    ac_enc: dict,
) -> None:
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    newly = [i for i, t in enumerate(absv) if t == 1]
    last_new = newly[-1] if newly else -1
    run = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if i > last_new:
            break
        if t == 0:
            run += 1
            continue
        # A ZRL must go out as soon as the zero-history run exceeds 15
        # DURING the walk (libjpeg encode_mcu_AC_refine) — the decoder
        # reads buffered correction bits positionally while skipping,
        # so deferring the ZRL past an already-significant coefficient
        # would misalign its correction bit.  Only while a newly-
        # significant coefficient still follows (i <= last_new);
        # trailing runs fold into the EOB run instead.
        while run > 15:
            eob.flush()
            code, ln = ac_enc[0xF0]
            wtr.put(code, ln)
            run -= 16
            for b in br:
                wtr.put(b, 1)
            br = []
        if t > 1:  # already significant: one correction bit
            br.append(t & 1)
            continue
        # t == 1: newly significant coefficient
        eob.flush()
        code, ln = ac_enc[(run << 4) | 1]
        wtr.put(code, ln)
        wtr.put(1 if int(zz[ss + i]) > 0 else 0, 1)
        for b in br:
            wtr.put(b, 1)
        br = []
        run = 0
    # The tail (zero-history runs and/or correction bits after the
    # last newly-significant coefficient) joins the EOB run — but ONLY
    # if something actually remains (libjpeg: ``r > 0 || BR > 0``).  A
    # block whose last new coefficient lands exactly on Se ends the
    # decoder's walk naturally; recording an EOB for it would make the
    # decoder eat the NEXT block's first symbol as a phantom EOB.
    tail = [absv[i] & 1 for i in range(last_new + 1, len(absv)) if absv[i] > 1]
    trailing_zeros = sum(
        1 for i in range(last_new + 1, len(absv)) if absv[i] == 0
    )
    if trailing_zeros > 0 or br or tail:
        eob.add(br + tail)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    scans: list[tuple[tuple[int, ...], int, int, int, int]] | None = None,
) -> bytes:
    """Encode (h, w, 1|3) uint8 pixels as a PROGRESSIVE (SOF2) 4:4:4
    JPEG.  ``scans`` is a list of (components, Ss, Se, Ah, Al); the
    default script covers spectral selection and two levels of
    successive approximation.  Progressive re-orders the same
    quantized coefficients baseline emits, so decoding this stream is
    bit-identical to decoding ``encode_jpeg(pixels)``."""
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError(f"channels {nc} (1 or 3)")
    planes = _rgb_to_ycbcr(pixels) if nc == 3 else pixels.astype(np.float64)
    qts = [STD_LUMA_QT] + ([STD_CHROMA_QT] if nc == 3 else [])
    comp_qt = [0] + [1, 1][: max(0, nc - 1)]
    zz = []
    for ci in range(nc):
        plane = planes[:, :, ci] if nc == 3 else planes[:, :, 0]
        z, by, bx = _encode_plane_blocks(plane, qts[comp_qt[ci]])
        zz.append(z)
    scans = scans if scans is not None else _default_prog_scans(nc)
    for comps_s, ss, se, ah, al in scans:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scans must have Ss=Se=0")
        if ss > 0 and len(comps_s) != 1:
            raise ValueError("progressive AC scans take one component")
        if not 0 <= ss <= se <= 63 or any(c >= nc for c in comps_s):
            raise ValueError(f"bad scan spec {(comps_s, ss, se, ah, al)}")

    dc_enc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)]
    if nc == 3:
        dc_enc.append(_build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS))
    ac_enc = _build_encode_table(PROG_AC_BITS, PROG_AC_VALS)
    comp_ht = comp_qt

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, qt in enumerate(qts):
        out += seg(0xDB, bytes([i]) + bytes(int(qt[z]) for z in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, comp_qt[ci]])
    out += seg(0xC2, sof)  # SOF2: progressive DCT, Huffman
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS)]
    if nc == 3:
        hts.append((0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
    hts.append((0x10, PROG_AC_BITS, PROG_AC_VALS))
    for tc, bits, vals in hts:
        out += seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))

    for comps_s, ss, se, ah, al in scans:
        sos = bytes([len(comps_s)])
        for ci in comps_s:
            sos += bytes([ci + 1, (comp_ht[ci] << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        wtr = _BitWriter()
        if ss == 0 and ah == 0:  # DC first scan (interleaved)
            pred = {ci: 0 for ci in comps_s}
            for my in range(by):
                for mx in range(bx):
                    for ci in comps_s:
                        v = int(zz[ci][my, mx, 0]) >> al
                        diff = v - pred[ci]
                        pred[ci] = v
                        size, bits_val = _magnitude(diff)
                        code, ln = dc_enc[comp_ht[ci]][size]
                        wtr.put(code, ln)
                        if size:
                            wtr.put(bits_val, size)
        elif ss == 0:  # DC refinement: one raw bit per block
            for my in range(by):
                for mx in range(bx):
                    for ci in comps_s:
                        wtr.put((int(zz[ci][my, mx, 0]) >> al) & 1, 1)
        else:  # AC scan, single component
            ci = comps_s[0]
            eob = _EobState(wtr, ac_enc)
            for my in range(by):
                for mx in range(bx):
                    if ah == 0:
                        _enc_ac_first_block(
                            wtr, eob, zz[ci][my, mx], ss, se, al, ac_enc
                        )
                    else:
                        _enc_ac_refine_block(
                            wtr, eob, zz[ci][my, mx], ss, se, al, ac_enc
                        )
            eob.flush()
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------
# Decoder (baseline AND progressive: one coefficient-accumulation
# model; baseline is the single interleaved Ss=0..63 Ah=Al=0 scan)
# --------------------------------------------------------------------


def _decode_scan_dc(
    rdr: _BitReader, scan: list[int], coefs: list[np.ndarray],
    dc_t: dict[int, dict], scan_dc: dict[int, int],
    by: int, bx: int, ah: int, al: int, baseline_ac=None,
) -> None:
    """DC scan (interleaved over ``scan`` components).  When
    ``baseline_ac`` is given (a per-component AC-table mapping), this
    is a baseline Ss=0..63 scan and ACs decode inline."""
    pred = {ci: 0 for ci in scan}
    for my in range(by):
        for mx in range(bx):
            for ci in scan:
                block = coefs[ci][my, mx]
                if ah == 0:
                    size = rdr.huff(dc_t[scan_dc[ci]])
                    diff = _extend(rdr.bits(size), size) if size else 0
                    pred[ci] += diff
                    block[0] = pred[ci] << al
                else:  # DC refinement: one raw bit
                    if rdr.bit():
                        block[0] = int(block[0]) | (1 << al)
                if baseline_ac is None:
                    continue
                ac = baseline_ac[ci]
                k = 1
                while k < 64:
                    rs = rdr.huff(ac)
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    block[k] = _extend(rdr.bits(size), size)
                    k += 1


def _decode_scan_ac_first(
    rdr: _BitReader, coef: np.ndarray, ac: dict,
    by: int, bx: int, ss: int, se: int, al: int,
) -> None:
    eobrun = 0
    for my in range(by):
        for mx in range(bx):
            if eobrun > 0:
                eobrun -= 1
                continue
            block = coef[my, mx]
            k = ss
            while k <= se:
                rs = rdr.huff(ac)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << run) - 1 + (rdr.bits(run) if run else 0)
                    break
                k += run
                if k > se:
                    raise ValueError("AC run past end of band")
                block[k] = _extend(rdr.bits(size), size) * (1 << al)
                k += 1


def _decode_scan_ac_refine(
    rdr: _BitReader, coef: np.ndarray, ac: dict,
    by: int, bx: int, ss: int, se: int, al: int,
) -> None:
    """Successive-approximation AC refinement (G.2 / spec figure
    G.10): correction bits for already-significant coefficients,
    (run<<4)|1 symbols placing newly-significant ones, EOB runs
    covering whole blocks of corrections."""
    p1 = 1 << al
    eobrun = 0

    def correct(block: np.ndarray, k: int) -> None:
        if rdr.bit():
            v = int(block[k])
            if (v & p1) == 0:
                block[k] = v + p1 if v >= 0 else v - p1

    for my in range(by):
        for mx in range(bx):
            block = coef[my, mx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = rdr.huff(ac)
                    run, size = rs >> 4, rs & 0x0F
                    newval = 0
                    if size == 0:
                        if run < 15:
                            eobrun = (1 << run) + (
                                rdr.bits(run) if run else 0
                            )
                            break
                        # run == 15: ZRL — skip 16 zero-history coefs
                    elif size == 1:
                        newval = p1 if rdr.bit() else -p1
                    else:
                        raise ValueError(
                            "refinement symbol with size > 1"
                        )
                    while k <= se:
                        if int(block[k]) != 0:
                            correct(block, k)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if newval and k <= se:
                        block[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if int(block[k]) != 0:
                        correct(block, k)
                    k += 1
                eobrun -= 1


def _next_marker(data: bytes, pos: int) -> int:
    """Advance to the next marker boundary after an entropy-coded
    segment (skipping pad bits and stuffed 0xFF00 pairs)."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    raise ValueError("ran off the end looking for a marker")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline (SOF0) or progressive (SOF2) 4:4:4 JPEG:
    returns ``(w, h, channels, pixels)`` with pixels (h, w) for
    grayscale or (h, w, 3) RGB uint8."""
    if payload[:3] != _MAGIC_JPEG:
        raise ValueError("not a JPEG stream")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int]] = []  # (component id, qt id)
    h = w = nc = 0
    progressive = False
    coefs: list[np.ndarray] = []
    by = bx = 0
    pos = 2
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quantization tables")
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int32)
                qts[tid] = nat
                i += 65
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0} (baseline SOF0 / progressive SOF2 only)"
            )
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            progressive = marker == 0xC2
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit samples (8 only)")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc} components (1 or 3)")
            for ci in range(nc):
                cid, hv, qid = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        f"sampling factors {hv >> 4}x{hv & 15} (4:4:4 only)"
                    )
                comps.append((cid, qid))
            by, bx = -(-h // 8), -(-w // 8)
            coefs = [np.zeros((by, bx, 64), dtype=np.int32) for _ in range(nc)]
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                (ac_tabs if tc else dc_tabs)[tid] = _build_decode_table(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI)")
        elif marker == 0xDA:  # SOS
            if not comps or not qts:
                raise ValueError("missing SOF/DQT before scan")
            ns = body[0]
            scan: list[int] = []
            scan_dc: dict[int, int] = {}
            scan_ac: dict[int, int] = {}
            cid_to_ci = {cid: ci for ci, (cid, _) in enumerate(comps)}
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                ci = cid_to_ci[cid]
                scan.append(ci)
                scan_dc[ci], scan_ac[ci] = tabs >> 4, tabs & 0x0F
            ss, se, aa = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = aa >> 4, aa & 0x0F
            if not progressive:
                if ns != nc or (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("malformed baseline scan header")
            rdr = _BitReader(data, pos + 2 + ln)
            if ss == 0:  # DC (or full baseline) scan
                if progressive and se != 0:
                    raise ValueError("progressive DC scan with Se != 0")
                _decode_scan_dc(
                    rdr, scan, coefs, dc_tabs, scan_dc, by, bx, ah, al,
                    baseline_ac=None if progressive else {
                        ci: ac_tabs[scan_ac[ci]] for ci in scan
                    },
                )
            else:  # progressive AC scan: single component
                if len(scan) != 1:
                    raise ValueError("AC scan with multiple components")
                ci = scan[0]
                if ah == 0:
                    _decode_scan_ac_first(
                        rdr, coefs[ci], ac_tabs[scan_ac[ci]],
                        by, bx, ss, se, al,
                    )
                else:
                    _decode_scan_ac_refine(
                        rdr, coefs[ci], ac_tabs[scan_ac[ci]],
                        by, bx, ss, se, al,
                    )
            pos = _next_marker(data, rdr.pos)
            continue
        # APPn / COM / anything else: skip
        pos = pos + 2 + ln

    if not comps or not qts:
        raise ValueError("no image frame decoded")
    planes = np.zeros((nc, by * 8, bx * 8), dtype=np.float64)
    for ci in range(nc):
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = coefs[ci].astype(np.float64)
        nat *= qts[comps[ci][1]].astype(np.float64)
        blocks = np.einsum(
            "xu,ijuv,yv->ijxy", _DCT_M.T, nat.reshape(by, bx, 8, 8), _DCT_M.T
        )
        planes[ci] = (
            blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        )

    planes = planes[:, :h, :w]
    if nc == 1:
        px = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return w, h, 1, px
    rgb = _ycbcr_to_rgb(planes.transpose(1, 2, 0))
    return w, h, 3, rgb
