"""Pure-Python WAV (RIFF/PCM) codec + audio feature extraction.

The audio analogue of :mod:`.imagecodec`: a REAL zero-dependency
default path for the multimodal operators so ``decode_audio_batch``
works on actual bytes in this environment (no soundfile/librosa here).
Scope: canonical PCM WAV — 8/16-bit integer samples, any channel
count, any sample rate, chunk-walked RIFF parsing (fmt/data chunks in
any order, unknown chunks skipped).  Compressed codecs (MP3/FLAC/AAC)
raise ``NotImplementedError`` — inject a decoder for those.

Determinism: features are exact-integer where possible (duration via
floor division, peak/zero-crossings as ints) and the one float (RMS)
is computed as a single sqrt over an exact integer sum of squares, so
it is bit-stable across platforms.
"""

from __future__ import annotations

import math

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == _RIFF and payload[8:12] == _WAVE


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode ``(n_frames, n_channels)`` int16 samples as a canonical
    PCM WAV byte string (fmt chunk then data chunk)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    n_frames, n_channels = samples.shape
    bits = 16
    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    data = samples.astype("<i2").tobytes()
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return _RIFF + (4 + len(chunks)).to_bytes(4, "little") + _WAVE + chunks


def decode_wav(payload: bytes) -> dict:
    """Chunk-walk a RIFF/WAVE payload; returns ``sample_rate``,
    ``n_channels``, ``bits_per_sample``, and ``samples`` shaped
    ``(n_frames, n_channels)`` as int16 (8-bit input is widened,
    recentred from unsigned)."""
    if not sniff_wav(payload):
        raise NotImplementedError(
            "unrecognized audio format (PCM WAV decodes natively; for "
            "MP3/FLAC/AAC inject a decoder= or run where soundfile is "
            "installed)"
        )
    fmt = None
    data = None
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit PCM WAV supported (format={audio_format}, bits={bits})"
        )
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2")
    else:
        raw = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
    n_frames = len(raw) // n_channels
    samples = raw[: n_frames * n_channels].reshape(n_frames, n_channels)
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bits,
        "samples": samples,
    }


def audio_features(payload: bytes) -> dict:
    """Decode + feature-extract one WAV payload.

    Features (channel 0 where per-channel): ``sample_rate``,
    ``n_channels``, ``n_frames``, ``duration_ms`` (exact floor ms),
    ``rms`` (sqrt of exact integer mean square), ``peak`` (max |s|),
    ``zero_crossings`` (strict sign flips, zero samples keep the
    previous sign)."""
    d = decode_wav(payload)
    ch0 = d["samples"][:, 0].astype(np.int64)
    n_frames = len(ch0)
    sq = int((ch0 * ch0).sum())
    rms = math.sqrt(sq / n_frames) if n_frames else 0.0
    sign = np.sign(ch0)
    # carry previous sign through exact zeros so a touch of zero is not
    # double-counted as two crossings
    nz = sign != 0
    if nz.any():
        idx = np.where(nz, np.arange(n_frames), 0)
        np.maximum.accumulate(idx, out=idx)
        carried = sign[idx]
    else:
        carried = sign
    crossings = int(np.count_nonzero(carried[1:] * carried[:-1] < 0))
    return {
        "sample_rate": d["sample_rate"],
        "n_channels": d["n_channels"],
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // d["sample_rate"] if n_frames else 0,
        "rms": rms,
        "peak": int(np.abs(ch0).max()) if n_frames else 0,
        "zero_crossings": crossings,
    }


def synth_square_wave(
    doc_id: int,
) -> tuple[bytes, int, int, int, int, int]:
    """Deterministic square-wave WAV for a document id — the test /
    oracle synthesis shared by the registry query and the unit tests.

    Parameters derive from ``doc_id`` alone so every feature has a
    closed form the DuckDB oracle replays: rate 8/12/16 kHz, 1-2
    channels, amplitude 1000..10500, half-period 1..5 samples,
    800..1760 frames.  Returns (payload, rate, channels, amplitude,
    half_period, n_frames)."""
    rate = 8000 + (doc_id % 3) * 4000
    channels = 1 + doc_id % 2
    amp = 1000 + (doc_id % 20) * 500
    half_period = 1 + doc_id % 5
    n_frames = 800 + (doc_id % 7) * 160
    i = np.arange(n_frames)
    wave = np.where((i // half_period) % 2 == 0, amp, -amp).astype(np.int16)
    samples = np.repeat(wave[:, None], channels, axis=1)
    return encode_wav(samples, rate), rate, channels, amp, half_period, n_frames
