"""Pure-Python WAV (RIFF) codec + audio feature extraction.

The audio analogue of :mod:`.imagecodec`: a REAL zero-dependency
default path for the multimodal operators so ``decode_audio_batch``
works on actual bytes in this environment (no soundfile/librosa here).
Scope: canonical PCM WAV — 8/16-bit integer samples, any channel
count, any sample rate, chunk-walked RIFF parsing (fmt/data chunks in
any order, unknown chunks skipped) — plus IMA ADPCM (format tag
0x0011, the classic 4-bit compressed WAV codec, mono): both encode
(``encode_adpcm_wav``) and decode, from the public IMA/DVI spec
("Recommended Practices for Enhancing Digital Audio Compatibility",
IMA 1992) — all-integer arithmetic, so reconstruction is exact and
cross-platform deterministic.  Perceptual codecs (MP3/FLAC/AAC)
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


# --- IMA ADPCM (format 0x0011, mono) ------------------------------
# Tables from the IMA/DVI recommended practice (public spec).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
_IMA_INDEX_NP = np.array(_IMA_INDEX, dtype=np.int64)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA decode step: (predictor, index) -> updated pair."""
    step = int(_IMA_STEPS[index])
    diffq = step >> 3
    if nibble & 4:
        diffq += step
    if nibble & 2:
        diffq += step >> 1
    if nibble & 1:
        diffq += step >> 2
    pred = pred - diffq if nibble & 8 else pred + diffq
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX[nibble]))
    return pred, index


def encode_adpcm_wav(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode MONO int16 samples as an IMA ADPCM (format 0x0011) WAV.

    Block layout per the IMA practice: a 4-byte header (first sample
    verbatim as the predictor, a block-local starting step index —
    see below — and a reserved byte) followed by 4-bit nibbles for the
    remaining
    ``samples_per_block - 1`` samples, low nibble first.  The default
    505 samples/block gives the classic 256-byte block align.  The
    final short block is zero-padded in the nibble area (decoders stop
    at the ``fact`` frame count)."""
    if samples.ndim == 2:
        if samples.shape[1] != 1:
            raise NotImplementedError("IMA ADPCM encoder is mono-only")
        samples = samples[:, 0]
    if samples.dtype != np.int16:
        raise ValueError("encode_adpcm_wav expects int16 samples")
    if samples_per_block < 2 or samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd and >= 3")
    n = len(samples)
    block_align = 4 + (samples_per_block - 1) // 2
    # Blocks are encoded INDEPENDENTLY (the seekable-stream form:
    # every block is self-contained through its header, which is why
    # the header carries predictor+index at all).  Each block's
    # STARTING step index is chosen block-locally — the smallest step
    # covering the block's mean |sample delta| — so the quantizer is
    # already at the right scale at every block boundary (a chained
    # index would need no warm-up either, but chains sequentially
    # across blocks; the local estimate decodes identically well and
    # is what lets the encoder vectorize).  A constant signal has
    # mean delta 0 -> index 0 -> step(0)>>3 == 0: the exactness
    # device the registry oracle relies on is preserved.  The nibble
    # loop below runs samples_per_block - 1 iterations total,
    # advancing every block one sample per iteration, mirroring the
    # vectorized _decode_adpcm.
    spb = samples_per_block
    n_blocks = (n + spb - 1) // spb
    if n_blocks < _VECTORIZE_MIN_BLOCKS:
        # scalar twin (byte-identical; see _VECTORIZE_MIN_BLOCKS)
        data = bytearray()
        s64 = samples.astype(np.int64)
        for start in range(0, n, spb):
            chunk = s64[start : start + spb]
            rl = len(chunk)
            mean_ad = (
                int(np.abs(np.diff(chunk)).sum()) // max(1, rl - 1)
            )
            index = int(np.clip(np.searchsorted(_IMA_STEPS, mean_ad), 0, 88))
            pred = int(chunk[0])
            data += int(pred & 0xFFFF).to_bytes(2, "little")
            data.append(index)
            data.append(0)
            nibs = []
            for s in chunk[1:]:
                s = int(s)
                step = int(_IMA_STEPS[index])
                diff = s - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                pred, index = _ima_step(pred, index, nib)
                nibs.append(nib)
            while len(nibs) < spb - 1:
                nibs.append(0)  # pad; beyond the fact frame count
            for lo, hi in zip(nibs[0::2], nibs[1::2]):
                data.append(lo | (hi << 4))
        return _adpcm_wrap(bytes(data), n, sample_rate, spb, block_align)
    real_len = np.minimum(
        np.full(n_blocks, spb, dtype=np.int64),
        n - spb * np.arange(n_blocks, dtype=np.int64),
    )
    padded = np.zeros(n_blocks * spb, dtype=np.int64)
    padded[:n] = samples.astype(np.int64)
    chunks = padded.reshape(n_blocks, spb)
    pred = chunks[:, 0].copy()
    deltas = np.abs(np.diff(chunks, axis=1))
    valid = np.arange(1, spb)[None, :] < real_len[:, None]
    mean_ad = (deltas * valid).sum(axis=1) // np.maximum(
        1, real_len - 1
    )
    index = np.clip(
        np.searchsorted(_IMA_STEPS, mean_ad), 0, 88
    ).astype(np.int64)
    index0 = index.copy()
    nibbles = np.zeros((n_blocks, spb - 1), dtype=np.int64)
    for k in range(1, spb):
        s = chunks[:, k]
        step = _IMA_STEPS[index]
        diff = s - pred
        sign = diff < 0
        ad = np.abs(diff)
        b4 = ad >= step
        ad = ad - np.where(b4, step, 0)
        h = step >> 1
        b2 = ad >= h
        ad = ad - np.where(b2, h, 0)
        b1 = ad >= (step >> 2)
        nib = (
            np.where(sign, 8, 0)
            + np.where(b4, 4, 0)
            + np.where(b2, 2, 0)
            + np.where(b1, 1, 0)
        )
        nib = np.where(k < real_len, nib, 0)  # zero-pad short tail
        diffq = (
            (step >> 3)
            + np.where(b4, step, 0)
            + np.where(b2, step >> 1, 0)
            + np.where(b1, step >> 2, 0)
        )
        pred = np.clip(np.where(sign, pred - diffq, pred + diffq), -32768, 32767)
        index = np.clip(index + _IMA_INDEX_NP[nib], 0, 88)
        nibbles[:, k - 1] = nib
    headers = np.zeros((n_blocks, 4), dtype=np.uint8)
    first = chunks[:, 0] & 0xFFFF
    headers[:, 0] = first & 0xFF
    headers[:, 1] = first >> 8
    headers[:, 2] = index0  # block-local starting step index
    packed_nibs = (
        nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)
    ).astype(np.uint8)
    data = np.concatenate([headers, packed_nibs], axis=1).tobytes()
    return _adpcm_wrap(data, n, sample_rate, spb, block_align)


def _adpcm_wrap(
    data: bytes, n: int, sample_rate: int, samples_per_block: int,
    block_align: int,
) -> bytes:
    """RIFF container for an IMA ADPCM nibble stream: fmt (tag 0x11,
    cbSize=2 samplesPerBlock extension), fact (true frame count —
    the decode stop marker past zero-padded tails), data."""
    byte_rate = (
        sample_rate * block_align + samples_per_block - 1
    ) // samples_per_block
    fmt = (
        b"fmt "
        + (20).to_bytes(4, "little")
        + (0x11).to_bytes(2, "little")  # IMA ADPCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")  # bits per (coded) sample
        + (2).to_bytes(2, "little")  # cbSize
        + samples_per_block.to_bytes(2, "little")
    )
    fact = b"fact" + (4).to_bytes(4, "little") + n.to_bytes(4, "little")
    chunks = (
        fmt + fact + b"data" + len(data).to_bytes(4, "little") + data
    )
    return _RIFF + (4 + len(chunks)).to_bytes(4, "little") + _WAVE + chunks


#: below this many blocks the scalar loops win: the vectorized paths
#: pay ~samples_per_block numpy-dispatch calls regardless of block
#: count, which loses on short clips (the many-tiny-blobs shape) and
#: wins roughly linearly beyond it (the long-recording shape).
_VECTORIZE_MIN_BLOCKS = 8


def _decode_adpcm_scalar(
    data: bytes, block_align: int, samples_per_block: int, n_frames: int
) -> np.ndarray:
    """Per-sample reference decode — the fast path for SHORT clips
    (see :data:`_VECTORIZE_MIN_BLOCKS`); semantics identical to the
    vectorized path (property-asserted around the threshold)."""
    out = np.empty(n_frames, dtype=np.int16)
    got = 0
    for off in range(0, len(data), block_align):
        if got >= n_frames:
            break
        block = data[off : off + block_align]
        if len(block) < 4:
            break
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = max(0, min(88, block[2]))
        out[got] = pred
        got += 1
        want = min(samples_per_block - 1, n_frames - got)
        k = 0
        for b in block[4:]:
            for nib in (b & 0x0F, b >> 4):
                if k >= want:
                    break
                pred, index = _ima_step(pred, index, nib)
                out[got] = pred
                got += 1
                k += 1
            if k >= want:
                break
    if got < n_frames:
        raise ValueError("truncated ADPCM data")
    return out


def _decode_adpcm(
    data: bytes, block_align: int, samples_per_block: int, n_frames: int
) -> np.ndarray:
    """Vectorized IMA decode (VERDICT r7 #6): the nibble unpack, sign/
    magnitude bit tests, and both table lookups are numpy ops over ALL
    blocks at once; only the predictor/index recurrence is a Python
    loop — and it runs ``samples_per_block - 1`` iterations total,
    each advancing every block one sample in parallel, instead of one
    iteration per output sample.  All arithmetic stays int64 with the
    same shifts/clamps as the scalar :func:`_ima_step`, so the output
    is bit-identical (property-tested encode->decode identity).
    Short clips dispatch to the scalar loop instead — fewer than
    :data:`_VECTORIZE_MIN_BLOCKS` blocks cannot amortize the
    per-iteration numpy dispatch."""
    if len(data) < _VECTORIZE_MIN_BLOCKS * block_align:
        return _decode_adpcm_scalar(
            data, block_align, samples_per_block, n_frames
        )
    arr = np.frombuffer(data, dtype=np.uint8)
    n_full = len(arr) // block_align
    usable = n_full * block_align
    rem = arr[usable:]
    last_cap = None
    if rem.size >= 4:  # truncated trailing block: decode what's there
        padded = np.zeros(block_align, dtype=np.uint8)
        padded[: rem.size] = rem
        blocks = np.concatenate(
            [arr[:usable].reshape(n_full, block_align), padded[None, :]]
        )
        last_cap = 1 + 2 * (rem.size - 4)
    else:
        blocks = arr[:usable].reshape(n_full, block_align)
    if blocks.shape[0] == 0:
        raise ValueError("truncated ADPCM data")
    # 4-byte header: int16 LE predictor seed + step index
    pred = (
        blocks[:, 0].astype(np.int64) | (blocks[:, 1].astype(np.int64) << 8)
    )
    pred = (pred ^ 0x8000) - 0x8000  # sign-extend
    index = np.clip(blocks[:, 2].astype(np.int64), 0, 88)
    # nibble unpack, low nibble first
    nib_bytes = blocks[:, 4:]
    spb1 = samples_per_block - 1
    nibs = np.empty((blocks.shape[0], nib_bytes.shape[1] * 2), dtype=np.int64)
    nibs[:, 0::2] = nib_bytes & 0x0F
    nibs[:, 1::2] = nib_bytes >> 4
    nibs = nibs[:, :spb1]
    sign = (nibs & 8) != 0
    b4 = nibs & 4
    b2 = nibs & 2
    b1 = nibs & 1
    idx_adj = _IMA_INDEX_NP[nibs]
    out_blocks = np.empty((blocks.shape[0], 1 + nibs.shape[1]), dtype=np.int64)
    out_blocks[:, 0] = pred
    for k in range(nibs.shape[1]):
        step = _IMA_STEPS[index]
        diffq = (
            (step >> 3)
            + np.where(b4[:, k] != 0, step, 0)
            + np.where(b2[:, k] != 0, step >> 1, 0)
            + np.where(b1[:, k] != 0, step >> 2, 0)
        )
        pred = np.clip(
            np.where(sign[:, k], pred - diffq, pred + diffq), -32768, 32767
        )
        index = np.clip(index + idx_adj[:, k], 0, 88)
        out_blocks[:, k + 1] = pred
    if last_cap is not None:
        out = np.concatenate(
            [out_blocks[:-1].reshape(-1), out_blocks[-1, :last_cap]]
        )
    else:
        out = out_blocks.reshape(-1)
    if out.size < n_frames:
        raise ValueError("truncated ADPCM data")
    return out[:n_frames].astype(np.int16)


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
    fact_frames = None
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
        elif cid == b"fact":
            fact_frames = int.from_bytes(body[0:4], "little")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 0x11:  # IMA ADPCM
        if n_channels != 1:
            raise NotImplementedError("IMA ADPCM decode is mono-only")
        if len(fmt) < 20:
            raise ValueError("IMA ADPCM fmt chunk missing samplesPerBlock")
        samples_per_block = int.from_bytes(fmt[18:20], "little")
        if fact_frames is None:
            n_blocks = len(data) // block_align
            fact_frames = n_blocks * samples_per_block
        raw = _decode_adpcm(data, block_align, samples_per_block, fact_frames)
        return {
            "sample_rate": sample_rate,
            "n_channels": 1,
            "bits_per_sample": 4,
            "samples": raw.reshape(-1, 1),
        }
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit PCM and IMA-ADPCM WAV supported "
            f"(format={audio_format}, bits={bits})"
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
