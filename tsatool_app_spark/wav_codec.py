"""Dependency-free WAV (RIFF/PCM) codec — stdlib struct only.

Same role for audio that sinks_png plays for images: the container ships no
audio libraries, but PCM WAV is a trivial container, so encode/decode are
implemented natively and the multimodal audio kernels
(functions/multimodal.decode_audio_batch) run for real on one format
instead of being import-gated stubs.

Supports PCM 16-bit little-endian, any channel count/sample rate — the
format every ML audio pipeline normalizes to before featurization. Other
encodings (float32 WAV, ADPCM, mp3, …) are out of scope and rejected with
a clear error.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF_HDR = struct.Struct("<4sI4s")      # 'RIFF', chunk size, 'WAVE'
_CHUNK_HDR = struct.Struct("<4sI")        # chunk id, chunk size
_FMT_PCM = struct.Struct("<HHIIHH")       # audio_fmt, ch, rate, byterate, align, bits


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples (shape ``(n,)`` mono or ``(n, channels)``) as a
    canonical 44-byte-header PCM WAV."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, channels = arr.shape
    data = arr.tobytes()  # C order == interleaved frames
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = _FMT_PCM.pack(1, channels, sample_rate, byte_rate, block_align, 16)
    body = (
        _CHUNK_HDR.pack(b"fmt ", len(fmt))
        + fmt
        + _CHUNK_HDR.pack(b"data", len(data))
        + data
    )
    return _RIFF_HDR.pack(b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """Decode PCM-16 WAV bytes → ``(sample_rate, samples[n_frames, channels]
    int16)``. Walks RIFF chunks (tolerates extra chunks like LIST/fact);
    raises ValueError on non-RIFF input and NotImplementedError on non-PCM-16
    encodings."""
    if len(buf) < 12:
        raise ValueError("not a WAV: too short")
    magic, _, wave = _RIFF_HDR.unpack_from(buf, 0)
    if magic != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE magic")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid, size = _CHUNK_HDR.unpack_from(buf, pos)
        pos += 8
        if cid == b"fmt ":
            fmt = _FMT_PCM.unpack_from(buf, pos)
        elif cid == b"data":
            data = buf[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("not a WAV: fmt/data chunk missing")
    audio_fmt, channels, sample_rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM-16 WAV is supported (got fmt={audio_fmt}, bits={bits})"
        )
    arr = np.frombuffer(data, dtype="<i2")
    n_frames = len(arr) // channels
    return sample_rate, arr[: n_frames * channels].reshape(n_frames, channels)
