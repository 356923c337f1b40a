"""Extended WebP container (VP8X): ALPH alpha planes and animation.

All fixtures are FOREIGN hand-built chunk compositions per the public
WebP Container Specification — never round-trips of a container the
decoder itself wrote (the repo has no VP8X writer).  Alpha filter
fixtures are forward-filtered by an independent in-test twin of the
spec's prediction filters; expected base pixels come from the codec
twins already validated elsewhere (tests/test_vp8.py,
tests/test_webp_foreign.py).
"""

import struct

import numpy as np
import pytest

from trefoil_spark.functions.vp8 import decode_vp8, encode_webp_lossy
from trefoil_spark.functions.webp import decode_webp, encode_webp


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _container(*chunks: bytes) -> bytes:
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8x(w: int, h: int, alpha: bool = False, anim: bool = False) -> bytes:
    flags = (0x10 if alpha else 0) | (0x02 if anim else 0)
    return _chunk(
        b"VP8X",
        bytes([flags, 0, 0, 0])
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little"),
    )


def _vp8_chunk_bytes(img_rgb: np.ndarray, qi: int = 20) -> bytes:
    """Raw 'VP8 ' chunk payload from the own encoder's simple container."""
    data = encode_webp_lossy(img_rgb, qi=qi)
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _vp8l_chunk_bytes(img: np.ndarray) -> bytes:
    data = encode_webp(img)
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8L":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8L chunk")


def _alpha_plane(w: int, h: int) -> np.ndarray:
    i = np.arange(h * w, dtype=np.int64).reshape(h, w)
    return ((i * 37 + 11) % 256).astype(np.uint8)


def _forward_filter(plane: np.ndarray, method: int) -> np.ndarray:
    """Independent forward twin of the spec's alpha prediction filters:
    residual = value - predictor (mod 256), horizontal/vertical/gradient
    with the spec's row-0 / first-column fallbacks."""
    h, w = plane.shape
    p = plane.astype(np.int16)
    out = np.zeros_like(plane)

    def clip(v):
        return max(0, min(255, v))

    for y in range(h):
        for x in range(w):
            if method == 1 or y == 0:  # horizontal (and row 0 of 2/3)
                if x == 0:
                    pred = 0 if y == 0 else int(plane[y - 1, 0])
                else:
                    pred = int(plane[y, x - 1])
            elif method == 2:  # vertical
                pred = int(plane[y - 1, x])
            else:  # gradient
                left = int(plane[y, x - 1]) if x else int(plane[y - 1, 0])
                top = int(plane[y - 1, x])
                tl = int(plane[y - 1, x - 1]) if x else int(plane[y - 1, 0])
                pred = clip(left + top - tl)
            out[y, x] = (int(p[y, x]) - pred) & 0xFF
    return out


@pytest.fixture(scope="module")
def base16():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    chunk = _vp8_chunk_bytes(img)
    return img, chunk, decode_vp8(chunk)


def test_vp8x_still_lossy_raw_alpha(base16):
    _, chunk, ref = base16
    a = _alpha_plane(16, 16)
    data = _container(
        _vp8x(16, 16, alpha=True),
        _chunk(b"ALPH", bytes([0]) + a.tobytes()),
        _chunk(b"VP8 ", chunk),
    )
    out = decode_webp(data)
    assert out.shape == (16, 16, 4)
    assert np.array_equal(out[..., :3], ref)
    assert np.array_equal(out[..., 3], a)


@pytest.mark.parametrize("method", [1, 2, 3])
def test_vp8x_alpha_filters(base16, method):
    _, chunk, ref = base16
    a = _alpha_plane(16, 16)
    filtered = _forward_filter(a, method)
    data = _container(
        _vp8x(16, 16, alpha=True),
        _chunk(b"ALPH", bytes([method << 2]) + filtered.tobytes()),
        _chunk(b"VP8 ", chunk),
    )
    out = decode_webp(data)
    assert np.array_equal(out[..., 3], a), f"filter {method}"
    assert np.array_equal(out[..., :3], ref)


def test_vp8x_alpha_lossless_compressed(base16):
    """Compression method 1: headless VP8L stream (the 5-byte VP8L
    header is exactly 40 bits, so stripping it from an own-encoder
    chunk yields a spec headless stream) with alpha in green."""
    _, chunk, ref = base16
    a = _alpha_plane(16, 16)
    carrier = np.zeros((16, 16, 3), np.uint8)
    carrier[..., 1] = a
    headless = _vp8l_chunk_bytes(carrier)[5:]
    data = _container(
        _vp8x(16, 16, alpha=True),
        _chunk(b"ALPH", bytes([1]) + headless),
        _chunk(b"VP8 ", chunk),
    )
    out = decode_webp(data)
    assert np.array_equal(out[..., 3], a)
    assert np.array_equal(out[..., :3], ref)


def test_vp8x_still_vp8l_passthrough():
    img = np.zeros((8, 9, 4), np.uint8)
    img[..., 0] = 200
    img[..., 3] = np.arange(8 * 9, dtype=np.uint8).reshape(8, 9)
    data = _container(_vp8x(9, 8), _chunk(b"VP8L", _vp8l_chunk_bytes(img)))
    out = decode_webp(data)
    assert np.array_equal(out, img[..., [0, 1, 2, 3]])


def test_vp8x_animation_first_frame():
    """ANIM/ANMF: first frame composited at its (x,y) offset onto a
    transparent canvas — the GIF first-frame semantics."""
    frame = np.full((6, 5, 4), 255, np.uint8)
    frame[..., 0] = 31
    frame[..., 1] = 77
    anmf = (
        (1).to_bytes(3, "little")  # x = 2
        + (2).to_bytes(3, "little")  # y = 4
        + (5 - 1).to_bytes(3, "little")
        + (6 - 1).to_bytes(3, "little")
        + (100).to_bytes(3, "little")  # duration
        + bytes([0])
        + _chunk(b"VP8L", _vp8l_chunk_bytes(frame))
    )
    data = _container(
        _vp8x(12, 14, anim=True),
        _chunk(b"ANIM", b"\x00" * 6),
        _chunk(b"ANMF", anmf),
        _chunk(b"ANMF", anmf),  # second frame must be ignored
    )
    out = decode_webp(data)
    assert out.shape == (14, 12, 4)
    assert np.array_equal(out[4:10, 2:7], frame)
    assert out[0, 0, 3] == 0 and out[13, 11, 3] == 0


def test_alph_without_vp8x_raises(base16):
    _, chunk, _ = base16
    a = _alpha_plane(16, 16)
    data = _container(
        _chunk(b"ALPH", bytes([0]) + a.tobytes()), _chunk(b"VP8 ", chunk)
    )
    with pytest.raises(ValueError, match="VP8X"):
        decode_webp(data)


def test_alph_bad_compression_raises(base16):
    _, chunk, _ = base16
    data = _container(
        _vp8x(16, 16, alpha=True),
        _chunk(b"ALPH", bytes([2]) + b"\x00" * 256),
        _chunk(b"VP8 ", chunk),
    )
    with pytest.raises(ValueError, match="compression"):
        decode_webp(data)


def test_metadata_chunks_skipped(base16):
    """ICCP/EXIF/XMP chunks (and odd-size padding) don't derail the
    walk."""
    _, chunk, ref = base16
    data = _container(
        _vp8x(16, 16),
        _chunk(b"ICCP", b"\x01\x02\x03"),  # odd size -> padded
        _chunk(b"EXIF", b"Exif\x00\x00"),
        _chunk(b"VP8 ", chunk),
    )
    out = decode_webp(data)
    assert np.array_equal(out[..., :3], ref)
