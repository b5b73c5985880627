"""Pure-Python image codecs: PPM/PGM (P5/P6) and uncompressed BMP.

The multimodal operators (:mod:`..operators.multimodal`) need a REAL
default decode path, but this environment has no pillow/ffmpeg.  These
two formats are decodable with zero dependencies (numpy for the pixel
math only), which de-stubs ``decode_image_batch`` /
``resize_image_batch`` for real bytes while keeping the injectable
seam for richer codecs (PNG/JPEG still raise a clear
NotImplementedError).

Determinism: luma uses integer ITU-R BT.601 weights (299/587/114 over
1000) summed exactly, so ``mean_luma`` is bit-identical everywhere.
"""

from __future__ import annotations

import numpy as np

#: formats this module can decode, by magic bytes
_MAGIC_PPM = (b"P5", b"P6")
_MAGIC_BMP = b"BM"


def sniff_format(payload: bytes) -> str | None:
    """``'ppm'``, ``'bmp'`` or None for unrecognized bytes."""
    if payload[:2] in _MAGIC_PPM:
        return "ppm"
    if payload[:2] == _MAGIC_BMP:
        return "bmp"
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
    else:
        raise NotImplementedError(
            "unrecognized image format (PPM/PGM/BMP decode natively; "
            "for PNG/JPEG inject a decoder= or run where pillow is "
            "installed)"
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
    else:
        raise NotImplementedError(
            "unrecognized image format (PPM/PGM/BMP resize natively; "
            "inject resizer= for other formats)"
        )
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return encode_ppm(px[np.ix_(ys, xs)])
