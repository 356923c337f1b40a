"""Pure-python paletted PNG encoder (SURVEY.md F10/S8 — PIL absent).

Produces P-mode (color type 3) PNGs equivalent to the reference's
PIL-based image creation (/root/reference/trefoil/render/renderers/
__init__.py:59-77): 8-bit palette indices, PLTE from the renderer palette
with the background color appended as the last entry, and a tRNS chunk
making the background index transparent when its alpha is 0.

Deterministic output (fixed zlib level, filter 0 on every scanline) —
the render tests assert byte-stable PNGs across runs, mirroring the
reference's exact-bytes renderer tests (test_renderers.py:59,94).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    data = tag + payload
    return struct.pack(">I", len(payload)) + data + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)


def encode_palette_png(
    indices: np.ndarray,
    palette_rgb: np.ndarray,
    transparent_index: int | None = None,
    compress_level: int = 6,
) -> bytes:
    """uint8 (H, W) palette indices + (N, 3) uint8 palette → PNG bytes."""
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("indices must be 2-D (H, W)")
    h, w = idx.shape
    pal = np.ascontiguousarray(palette_rgb, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or pal.shape[0] > 256:
        raise ValueError("palette must be (N<=256, 3) uint8")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)  # 8-bit, paletted
    # scanlines with filter byte 0
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = idx
    idat = zlib.compress(raw.tobytes(), compress_level)

    out = [_SIGNATURE, _chunk(b"IHDR", ihdr), _chunk(b"PLTE", pal.tobytes())]
    if transparent_index is not None:
        trns = b"\xff" * transparent_index + b"\x00"
        out.append(_chunk(b"tRNS", trns))
    out.append(_chunk(b"IDAT", idat))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_palette_png(data: bytes):
    """Minimal decoder for round-trip tests: returns (indices, palette,
    transparent_index). Only reads PNGs produced by encode_palette_png."""
    assert data[:8] == _SIGNATURE
    pos = 8
    pal = None
    trans = None
    idat = b""
    w = h = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 3
        elif tag == b"PLTE":
            pal = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            alphas = np.frombuffer(payload, dtype=np.uint8)
            zero = np.flatnonzero(alphas == 0)
            trans = int(zero[0]) if zero.size else None
        elif tag == b"IDAT":
            idat += payload
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w + 1)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    return raw[:, 1:].copy(), pal, trans


def encode_rgb_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 (H, W, 3) RGB or (H, W, 4) RGBA → truecolor PNG bytes.

    The Lanczos-resized render path (F11) produces a continuous-tone
    composite that no longer fits a 256-entry palette — color type 2/6.
    Deterministic like the palette encoder (filter 0, fixed level)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("image must be (H, W, 3|4) uint8")
    h, w, c = arr.shape
    ctype = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.empty((h, w * c + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return b"".join(
        [_SIGNATURE, _chunk(b"IHDR", ihdr), _chunk(b"IDAT", idat), _chunk(b"IEND", b"")]
    )


def decode_rgb_png(data: bytes) -> np.ndarray:
    """Round-trip decoder for encode_rgb_png output only."""
    assert data[:8] == _SIGNATURE
    pos = 8
    idat = b""
    w = h = c = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype in (2, 6)
            c = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += payload
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * c + 1)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    return raw[:, 1:].reshape(h, w, c).copy()
