"""RIFF/WAVE PCM codec (stdlib struct + numpy — no audio libraries).

Real audio decode for the multimodal operators: uncompressed PCM WAV
(8-bit unsigned / 16-bit signed, any channel count) parsed from scratch.
Compressed audio (MP3/AAC/…) stays behind the documented stub in
operators/multimodal.py — this module is the real path for the one format
the environment can honestly support.

Layout (RIFF spec): 'RIFF' size 'WAVE' then chunks; 'fmt ' carries
(audio_format, n_channels, sample_rate, byte_rate, block_align,
bits_per_sample); 'data' carries the PCM frames. Chunks are word-aligned
(odd sizes pad one byte).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """mono int16 samples → minimal PCM WAV bytes (test fixture builder)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float32 waveform in [-1, 1], sample_rate).

    Multi-channel input is averaged to mono. Raises ValueError on non-RIFF
    input, non-PCM encodings, or truncated chunks."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # word alignment
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"non-PCM wav (format {audio_format}) not supported")
    if bits == 16:
        wave = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        wave = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM not supported")
    if n_channels > 1:
        usable = (wave.size // n_channels) * n_channels
        wave = wave[:usable].reshape(-1, n_channels).mean(axis=1)
    return wave, int(sample_rate)
