"""WAV (RIFF PCM) encoder + decoder — pure python, from scratch.

Upgrades the audio half of the multimodal surface from stub to real for
PCM payloads (the public RIFF/WAVE format). Encode: PCM-16. Decode (r5,
foreign-capable): PCM 8/16/24/32, IEEE float 32/64, A-law / μ-law
(G.711 closed forms), WAVE_FORMAT_EXTENSIBLE dispatch. Compressed audio
(MP3/AAC/Opus/ADPCM) remains ffmpeg-bound and raises.
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


# ITU-T G.711 expansion (r5: foreign-file tail closure). Both tables are
# generated from the published closed forms, not hardcoded.
def _mulaw_table() -> np.ndarray:
    u = np.arange(256, dtype=np.uint8)
    v = ~u & 0xFF
    exp = (v >> 4) & 0x07
    mant = v & 0x0F
    mag = ((mant.astype(np.int32) << 3) + 0x84) << exp
    mag = mag - 0x84
    return np.where(v & 0x80, -mag, mag).astype(np.int16)


def _alaw_table() -> np.ndarray:
    a = np.arange(256, dtype=np.uint8)
    v = (a ^ 0x55).astype(np.int32)
    seg = (v >> 4) & 0x07
    mant = v & 0x0F
    mag = np.where(
        seg == 0, (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    # A-law's sign convention is inverted vs μ-law: sign bit SET → positive
    return np.where(v & 0x80, mag, -mag).astype(np.int16)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, ch) array, sample_rate).

    PCM 8/16/24/32-bit (format 1; 8-bit is unsigned per spec, returned
    re-centred as int16<<8; 24/32-bit return int32), IEEE float 32/64
    (format 3, returned float), A-law / μ-law (formats 6/7 → int16 via
    the G.711 closed forms), and WAVE_FORMAT_EXTENSIBLE (format 0xFFFE,
    dispatched on the fmt SubFormat GUID). Truly compressed codecs
    (MP3/ADPCM/...) raise."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    ch = None
    bits = None
    fmt_code = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, ch, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_code == 0xFFFE:  # EXTENSIBLE: real format in SubFormat
                if size < 40:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt")
                fmt_code = struct.unpack("<H", body[24:26])[0]
        elif tag == b"data":
            if pos + 8 + size > len(data):
                raise ValueError(
                    "WAV: data chunk declares %d bytes but only %d remain"
                    % (size, len(data) - pos - 8)
                )
            pcm = body
        pos += 8 + size + (size & 1)
    if pcm is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code == 1:  # integer PCM
        if bits == 16:
            arr = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
        elif bits == 8:  # unsigned by definition; re-centre to int16
            arr = ((np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128)
                   << 8)
        elif bits == 24:  # 3-byte little-endian two's complement
            b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
            arr = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            arr = np.where(arr & 0x800000, arr - (1 << 24), arr)
        elif bits == 32:
            arr = np.frombuffer(pcm, dtype="<i4").astype(np.int32)
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
    elif fmt_code == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(pcm, dtype="<f4").astype(np.float32)
        elif bits == 64:
            arr = np.frombuffer(pcm, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit IEEE-float PCM")
    elif fmt_code == 6:  # A-law
        arr = _alaw_table()[np.frombuffer(pcm, dtype=np.uint8)]
    elif fmt_code == 7:  # μ-law
        arr = _mulaw_table()[np.frombuffer(pcm, dtype=np.uint8)]
    else:
        raise NotImplementedError(f"compressed WAV (format {fmt_code})")
    return arr.reshape(-1, ch), sample_rate
