"""AIFF audio container (Apple/EA IFF 85 'FORM'/'AIFF') — big-endian
PCM, the classic Mac-origin sibling of RIFF/WAVE that still shows up
in crawled audio archives.

Public layout: FORM container with AIFF form type; COMM chunk carries
channels, frame count, bit depth and the sample rate as an 80-bit IEEE
754 extended float (1 sign + 15 exponent, bias 16383 + explicit-1
64-bit mantissa — parsed exactly here, no float round-trip); SSND
carries offset/blockSize then big-endian sample frames. Chunks are
word-aligned like RIFF.

Encoder twin + decoder, both exact for 8/16/24/32-bit PCM. AIFC
(compressed forms, form type 'AIFC') raises naming the compression.

Reference context: the reference has no audio path at all; this
extends the engine's multimodal envelope (operators/multimodal.py
audio decode dispatch).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_aiff", "encode_aiff"]


def _f80_encode(value: int) -> bytes:
    """Positive integer sample rate → 80-bit IEEE extended."""
    if value <= 0:
        raise ValueError("sample rate must be positive")
    e = value.bit_length() - 1
    mant = value << (63 - e)  # explicit leading 1 at bit 63
    return struct.pack(">HQ", 16383 + e, mant)


def _f80_decode(raw: bytes) -> int:
    se, mant = struct.unpack(">HQ", raw)
    if se & 0x8000:
        raise ValueError("negative AIFF sample rate")
    e = (se & 0x7FFF) - 16383
    if e < 0 or e > 62:
        raise ValueError("AIFF sample rate out of integer range")
    # round-to-nearest on the shifted-out bits (rates are integers in
    # practice; this keeps 44100.0 exact even if written sloppily)
    shift = 63 - e
    return (mant + (1 << (shift - 1) if shift else 0)) >> shift


_DTYPES = {8: ">i1", 16: ">i2", 24: None, 32: ">i4"}


def encode_aiff(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n,) or (n, channels) int array → AIFF bytes (big-endian PCM)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if bits == 24:
        i32 = s.astype(">i4").view(np.uint8).reshape(n, ch, 4)
        body = i32[:, :, 1:4].tobytes()  # drop the high byte: 24-bit BE
    else:
        body = s.astype(_DTYPES[bits]).tobytes()
    comm = struct.pack(">hIh", ch, n, bits) + _f80_encode(rate)
    ssnd = struct.pack(">II", 0, 0) + body

    def chunk(cc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cc + struct.pack(">I", len(payload)) + payload + pad

    form = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(form)) + form


def decode_aiff(data: bytes) -> tuple[np.ndarray, int]:
    """AIFF bytes → (int32 samples shaped (n, channels), rate). 8/16/
    24/32-bit PCM widths all return int32 at their native scale."""
    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF file")
    if data[8:12] == b"AIFC":
        raise NotImplementedError("AIFC (compressed AIFF) not supported")
    (form_size,) = struct.unpack(">I", data[4:8])
    end = min(8 + form_size, len(data))
    pos = 12
    ch = n = bits = rate = None
    body = None
    while pos + 8 <= end:
        cc = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError(f"AIFF chunk {cc!r} overruns container")
        payload = data[pos + 8 : pos + 8 + size]
        if cc == b"COMM":
            ch, n, bits = struct.unpack(">hIh", payload[:8])
            rate = _f80_decode(payload[8:18])
        elif cc == b"SSND":
            off, _blk = struct.unpack(">II", payload[:8])
            body = payload[8 + off :]
        pos += 8 + size + (size & 1)
    if ch is None or body is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    if bits == 24:
        raw = np.frombuffer(body[: (len(body) // 3) * 3], np.uint8)
        raw = raw.reshape(-1, 3).astype(np.uint32)
        v = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]
        s = v.astype(np.int32)
        s[s >= 1 << 23] -= 1 << 24
    elif bits in (8, 16, 32):
        s = np.frombuffer(body, _DTYPES[bits]).astype(np.int32)
    else:
        raise NotImplementedError(f"AIFF sample width {bits}")
    frames = len(s) // ch
    if frames < n:
        raise ValueError("AIFF SSND shorter than COMM frame count")
    return s[: n * ch].reshape(n, ch), rate
