"""Pure-Python image codecs: PPM/PGM (P5/P6), uncompressed BMP, and
PNG (stdlib zlib inflate + full scanline unfiltering).

The multimodal operators (:mod:`..operators.multimodal`) need a REAL
default decode path, but this environment has no pillow/ffmpeg.  These
formats are decodable with zero dependencies (stdlib ``zlib`` for PNG
DEFLATE; numpy for the pixel math only), which de-stubs
``decode_image_batch`` / ``resize_image_batch`` for real bytes while
keeping the injectable seam for richer codecs (JPEG still raises a
clear NotImplementedError — it genuinely needs an external library).

Determinism: luma uses integer ITU-R BT.601 weights (299/587/114 over
1000) summed exactly, so ``mean_luma`` is bit-identical everywhere.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

#: formats this module can decode, by magic bytes
_MAGIC_PPM = (b"P5", b"P6")
_MAGIC_BMP = b"BM"
_MAGIC_PNG = b"\x89PNG\r\n\x1a\n"
_MAGIC_JPEG = b"\xff\xd8\xff"


def sniff_format(payload: bytes) -> str | None:
    """``'ppm'``, ``'bmp'``, ``'png'``, ``'jpeg'`` or None for
    unrecognized bytes."""
    if payload[:2] in _MAGIC_PPM:
        return "ppm"
    if payload[:2] == _MAGIC_BMP:
        return "bmp"
    if payload[:8] == _MAGIC_PNG:
        return "png"
    if payload[:3] == _MAGIC_JPEG:
        return "jpeg"
    return None


def _ppm_header(payload: bytes) -> tuple[bytes, list[int], int]:
    """Parse the PNM token header: returns (magic, [w, h, maxval],
    offset-of-raster).  Tokens are whitespace-separated; ``#`` starts a
    comment running to end of line."""
    magic = payload[:2]
    i = 2
    vals: list[int] = []
    n = len(payload)
    while len(vals) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(payload[i:j]))
        i = j
    return magic, vals, i + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode binary PGM (P5, grayscale) / PPM (P6, RGB) with
    maxval <= 255.  Returns (width, height, n_channels, pixels) with
    pixels shaped (h, w, c) uint8."""
    magic, (w, h, maxval), off = _ppm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported (maxval > 255)")
    c = 1 if magic == b"P5" else 3
    need = w * h * c
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return w, h, c, raster.reshape(h, w, c)


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode uncompressed (BI_RGB) 24/32-bpp BMP.  Returns
    (width, height, n_channels=3, pixels) in RGB order, handling
    bottom-up (positive height) and top-down (negative) layouts and
    4-byte row padding."""
    if payload[:2] != _MAGIC_BMP:
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (24, 32):
        raise ValueError(f"{bpp}-bpp BMP not supported (24/32 only)")
    top_down = h < 0
    h = abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * nbytes].reshape(h, w, nbytes)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB; alpha (if any) dropped
    return w, h, 3, px[:, :, 2::-1].copy()


#: PNG color type -> raw channel count (depth 8)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Iterate (type, data) over PNG chunks, verifying each CRC."""
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r}: CRC mismatch")
        yield typ, data
        pos += 12 + ln
        if typ == b"IEND":
            return
    raise ValueError("truncated PNG (no IEND)")


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4: None, Sub, Up,
    Average, Paeth) -> (h, w*ch) uint8.  Sub is a per-lane cumsum;
    Up is a vector add; Average/Paeth carry a left-dependency so they
    walk the row (fine: decode is a per-row control loop over
    fixture-sized images; corpus-scale decode distributes per image
    across executors, never per pixel)."""
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG raster")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-ch]
            rec = line.reshape(-1, ch).cumsum(axis=0).reshape(-1) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        prev = rec
        out[y] = rec.astype(np.uint8)
    return out


# Adam7 pass geometry (PNG spec 8.2): (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_pass_dims(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """(x0, y0, dx, dy, pass_w, pass_h) per non-empty Adam7 pass."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw and ph:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode an 8-bit-depth PNG (color types 0 gray, 2 RGB,
    3 palette, 4 gray+alpha, 6 RGBA; interlace methods 0 none and
    1 Adam7) using stdlib zlib.  Returns (width, height, n_channels,
    pixels): gray forms -> c=1, color forms -> c=3; alpha is dropped
    (feature extraction wants luma/geometry, not compositing).  An
    Adam7 stream is seven independently-filtered sub-images scattered
    back on the pass grid — decoded output is identical to the
    non-interlaced encoding of the same pixels (round-trip-tested)."""
    if payload[:8] != _MAGIC_PNG:
        raise ValueError("not a PNG")
    ihdr = plte = None
    idat = bytearray()
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (8 only)")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ctype} invalid")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        px = _png_unfilter(raw, w, h, ch).reshape(h, w, ch)
    else:  # Adam7
        px = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(w, h):
            size = ph * (pw * ch + 1)
            sub = _png_unfilter(raw[off : off + size], pw, ph, ch)
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
            off += size
        if off != len(raw):
            raise ValueError("Adam7 raster length mismatch")
    if ctype == 3:  # palette -> RGB
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return w, h, 3, pal[px[:, :, 0]]
    if ctype == 4:  # gray+alpha -> gray
        return w, h, 1, px[:, :, :1].copy()
    if ctype == 6:  # RGBA -> RGB
        return w, h, 3, px[:, :, :3].copy()
    return w, h, ch, px


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _png_filter_row(
    line: np.ndarray, prev: np.ndarray, ftype: int, ch: int
) -> np.ndarray:
    """Apply PNG filter ``ftype`` to a reconstructed scanline (the
    encoder half; exact inverse of :func:`_png_unfilter`'s cases)."""
    line = line.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
    upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
    if ftype == 0:
        out = line
    elif ftype == 1:
        out = line - left
    elif ftype == 2:
        out = line - prev
    elif ftype == 3:
        out = line - ((left + prev) >> 1)
    elif ftype == 4:
        p = left + prev - upleft
        pa, pb, pc = (
            np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
        )
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
        )
        out = line - pred
    else:
        raise ValueError(f"PNG filter type {ftype} invalid")
    return (out & 0xFF).astype(np.uint8)


def _png_filter_pass(pixels: np.ndarray, filters) -> bytearray:
    """Filter one (sub-)image's rows (the shared encoder inner loop)."""
    h, w, c = pixels.shape
    rows = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        line = pixels[y].reshape(-1)
        ftype = filters[y] if filters is not None else y % 5
        rows.append(ftype)
        rows += _png_filter_row(line, prev, ftype, c).tobytes()
        prev = line
    return rows


def encode_png(
    pixels: np.ndarray,
    filters: "list[int] | None" = None,
    interlace: bool = False,
) -> bytes:
    """Encode (h, w, 1|3) uint8 pixels as an 8-bit PNG (gray or RGB),
    optionally Adam7-interlaced.  ``filters`` optionally pins the
    per-row filter types (default: row y uses y % 5, exercising every
    filter — this encoder exists for fixtures and round-trip tests,
    not ratio); under Adam7 the default applies per pass row."""
    h, w, c = pixels.shape
    if c not in (1, 3):
        raise ValueError(
            f"encode_png: {c}-channel pixels unsupported (1=gray, 3=RGB); "
            "drop alpha before encoding"
        )
    ctype = 0 if c == 1 else 2
    if not interlace:
        rows = _png_filter_pass(pixels, filters)
    else:
        rows = bytearray()
        for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(w, h):
            rows += _png_filter_pass(
                np.ascontiguousarray(pixels[y0::dy, x0::dx]), filters
            )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, int(interlace))
    return (
        _MAGIC_PNG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows), 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> dict:
    """Decode recognized bytes into the ``decode_image_batch`` feature
    dict: width, height, n_channels, mean_luma (string, 4 dp).

    Luma per pixel is BT.601 ``(299 R + 587 G + 114 B) / 1000`` (== the
    value itself for grayscale); the mean is an exact integer sum
    divided once, rounded to 4 dp — deterministic across platforms."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        w, h, c, px = decode_ppm(payload)
    elif fmt == "bmp":
        w, h, c, px = decode_bmp(payload)
    elif fmt == "png":
        w, h, c, px = decode_png(payload)
    elif fmt == "jpeg":
        from aws_cdk_pipelines_datalake_etl_spark.functions.jpegcodec import (
            decode_jpeg,
        )

        w, h, c, px = decode_jpeg(payload)
        if c == 1:
            px = px.reshape(h, w)
    else:
        raise NotImplementedError(
            "unrecognized image format (PPM/PGM/BMP/PNG/baseline-JPEG "
            "decode natively; inject a decoder= for anything richer)"
        )
    flat = px.astype(np.int64)
    if c == 1:
        total = int(flat.sum()) * 1000
    else:
        total = int(
            flat[:, :, 0].sum() * 299
            + flat[:, :, 1].sum() * 587
            + flat[:, :, 2].sum() * 114
        )
    mean_luma = f"{total / (1000 * w * h):.4f}"
    return {"width": w, "height": h, "n_channels": c, "mean_luma": mean_luma}


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 1|3) uint8 pixels as binary PGM/PPM."""
    h, w, c = pixels.shape
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated-PNM video stream into per-frame byte
    strings.

    The zero-dependency video container for this environment: a
    "video" is binary P5/P6 frames laid head-to-tail (each frame is
    self-describing, so boundaries are recovered by walking headers —
    no index needed).  Real containers (MP4/WebM) raise
    ``NotImplementedError``; inject a sampler for those."""
    frames: list[bytes] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 2] not in _MAGIC_PPM:
            raise NotImplementedError(
                "unrecognized video container (concatenated PNM streams "
                "split natively; for MP4/WebM inject a sampler= or run "
                "where ffmpeg is installed)"
            )
        magic, (w, h, maxval), off = _ppm_header(payload[pos:])
        c = 1 if magic == b"P5" else 3
        end = pos + off + w * h * c
        frames.append(payload[pos:end])
        pos = end
    return frames


def sample_ppm_stream(payload: bytes, every_nth: int) -> list[bytes]:
    """Default video frame sampler: every n-th frame of a
    concatenated-PNM stream (always includes frame 0)."""
    return split_ppm_stream(payload)[::every_nth]


def synth_ppm_video(doc_id: int) -> tuple[bytes, int]:
    """Deterministic concatenated-P6 "video" for a document id — the
    synthesis shared by the registry query and unit tests, chosen so
    every sampled frame has a closed form the DuckDB oracle replays:
    ``3 + doc_id % 4`` frames of 4x4 pixels, frame ``i`` filled with
    the constant byte ``32 + (doc_id*7 + i*13) % 96`` (printable ASCII
    so the oracle can rebuild the exact bytes with ``repeat(chr(v))``).
    Returns (payload, n_frames)."""
    n_frames = 3 + doc_id % 4
    frames = []
    for i in range(n_frames):
        v = 32 + (doc_id * 7 + i * 13) % 96
        frames.append(encode_ppm(np.full((4, 4, 3), v, dtype=np.uint8)))
    return b"".join(frames), n_frames


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize of recognized bytes; output is always
    PGM/PPM (same channel count as the input — BMP comes back as P6).
    Nearest-neighbor keeps the op exact-integer (no resampling kernel
    ambiguity), which is what a dedup/feature pipeline wants from a
    thumbnail pass."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        w, h, c, px = decode_ppm(payload)
    elif fmt == "bmp":
        w, h, c, px = decode_bmp(payload)
    elif fmt == "png":
        w, h, c, px = decode_png(payload)
    else:
        raise NotImplementedError(
            "unrecognized image format (PPM/PGM/BMP/PNG resize natively; "
            "inject resizer= for other formats)"
        )
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return encode_ppm(px[np.ix_(ys, xs)])
