"""WAV (RIFF PCM) encoder + decoder — pure python, from scratch.

Upgrades the audio half of the multimodal surface from stub to real for
PCM payloads (the public RIFF/WAVE format: 'fmt ' chunk with
audio_format=1, interleaved little-endian samples). Compressed audio
(MP3/AAC/Opus) remains ffmpeg-bound and stubbed.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 (n,) mono or (n, ch) interleaved → WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("expected (n,) or (n, channels) int16")
    n, ch = arr.shape
    byte_rate = sample_rate * ch * 2
    data = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 (n, ch) array, sample_rate). PCM-16 only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    ch = None
    bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            audio_format, ch, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1:
                raise NotImplementedError("compressed WAV (non-PCM)")
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if pcm is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit PCM (16-bit only)")
    arr = np.frombuffer(pcm, dtype="<i2").reshape(-1, ch)
    return arr.astype(np.int16), sample_rate
