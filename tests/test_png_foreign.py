"""Foreign PNG decode (r5): hand-built files exercising what this repo's
own encoder never emits — scanline filters 1-4, grayscale / gray+alpha
color types, sub-byte palette depths, tRNS alpha. The filtered scanlines
are produced by an independent forward-filter twin implemented here (per
the PNG spec's filter definitions), so a decoder bug can't cancel.

Reference parity context: trefoil renders via PIL (renderers/__init__.py)
— PIL reads any of these; this suite certifies the PIL-free decoder does
too for the multimodal ingest path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from trefoil_spark.functions.png import (
    _SIGNATURE,
    _chunk,
    decode_png,
    decode_rgb_png,
    encode_rgb_png,
)


# ---------------------------------------------------------------------------
# fixture builder: arbitrary IHDR + per-row filter choice, independent
# forward filtering
# ---------------------------------------------------------------------------


def _paeth_ref(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _forward_filter(rows: np.ndarray, bpp: int, ftypes: list[int]) -> bytes:
    """Scalar forward filters straight from the spec (the twin)."""
    h, stride = rows.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = rows[y].astype(np.int32)
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        for x in range(stride):
            left = int(cur[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            upleft = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = cur[x] - left
            elif ft == 2:
                v = cur[x] - up
            elif ft == 3:
                v = cur[x] - ((left + up) // 2)
            else:
                v = cur[x] - _paeth_ref(left, up, upleft)
            out.append(int(v) & 0xFF)
        prev = cur
    return bytes(out)


def _build_png(
    w: int, h: int, depth: int, ctype: int, rows: np.ndarray, bpp: int,
    ftypes: list[int], pal: np.ndarray | None = None,
    trns: bytes | None = None, interlace: int = 0,
) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = [_SIGNATURE, _chunk(b"IHDR", ihdr)]
    if pal is not None:
        out.append(_chunk(b"PLTE", pal.tobytes()))
    if trns is not None:
        out.append(_chunk(b"tRNS", trns))
    out.append(_chunk(b"IDAT", zlib.compress(_forward_filter(rows, bpp, ftypes))))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_rgb_filters_roundtrip(ftypes):
    rng = np.random.default_rng(sum(ftypes) + 1)
    h, w = 9, 7
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = _build_png(w, h, 8, 2, img.reshape(h, w * 3), 3, ftypes)
    out = decode_png(data)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("ftypes", [[4], [3], [1, 4, 2]])
def test_rgba_filters_roundtrip(ftypes):
    rng = np.random.default_rng(len(ftypes))
    h, w = 6, 11
    img = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    data = _build_png(w, h, 8, 6, img.reshape(h, w * 4), 4, ftypes)
    np.testing.assert_array_equal(decode_png(data), img)


def test_grayscale_8bit():
    rng = np.random.default_rng(3)
    h, w = 5, 13
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    data = _build_png(w, h, 8, 0, img, 1, [4])
    np.testing.assert_array_equal(decode_png(data), img)
    # decode_rgb_png expands gray → RGB
    rgb = decode_rgb_png(data)
    assert rgb.shape == (h, w, 3)
    np.testing.assert_array_equal(rgb[..., 0], img)


def test_gray_alpha():
    rng = np.random.default_rng(4)
    h, w = 4, 6
    img = rng.integers(0, 256, size=(h, w, 2), dtype=np.uint8)
    data = _build_png(w, h, 8, 4, img.reshape(h, w * 2), 2, [2, 4])
    np.testing.assert_array_equal(decode_png(data), img)
    rgba = decode_rgb_png(data)
    assert rgba.shape == (h, w, 4)
    np.testing.assert_array_equal(rgba[..., 3], img[..., 1])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette(depth):
    rng = np.random.default_rng(depth)
    h, w = 5, 11  # odd width → partial trailing byte per row
    n_pal = 1 << depth
    pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
    idx = rng.integers(0, n_pal, size=(h, w), dtype=np.uint8)
    # pack MSB-first
    per_byte = 8 // depth
    stride = (w * depth + 7) // 8
    rows = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            byte_i, pos = divmod(x, per_byte)
            shift = (per_byte - 1 - pos) * depth
            rows[y, byte_i] |= int(idx[y, x]) << shift
    data = _build_png(w, h, depth, 3, rows, 1, [0, 1], pal=pal)
    out = decode_png(data)
    np.testing.assert_array_equal(out, pal[idx.astype(np.int64)])


def test_palette_trns_alpha():
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1]], dtype=np.uint8)
    data = _build_png(4, 1, 8, 3, idx, 1, [0], pal=pal, trns=b"\x00\x80")
    out = decode_png(data)
    assert out.shape == (1, 4, 4)
    np.testing.assert_array_equal(out[0, :, 3], [0, 0x80, 255, 0x80])


def test_subbyte_gray_rescales():
    # depth-2 gray: sample 3 → 255, 1 → 85
    rows = np.array([[0b00011011 << 0]], dtype=np.uint8)  # samples 0,1,2,3
    data = _build_png(4, 1, 2, 0, rows, 1, [0])
    np.testing.assert_array_equal(decode_png(data)[0], [0, 85, 170, 255])


# Adam7 pass grid, written out independently from the spec (8.2) rather
# than imported from the decoder — the twin discipline again.
_ADAM7_REF = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _build_adam7_png(
    img: np.ndarray, ctype: int, channels: int, ftypes: list[int]
) -> bytes:
    """(H, W[, C]) uint8 → interlaced PNG: extract each pass with strided
    slicing, forward-filter it as its own sub-image, concatenate."""
    h, w = img.shape[:2]
    bpp = channels
    stream = bytearray()
    for x0, y0, dx, dy in _ADAM7_REF:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        ph, pw = sub.shape[:2]
        rows = np.ascontiguousarray(sub).reshape(ph, pw * channels)
        stream += _forward_filter(rows, bpp, ftypes)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
    return b"".join([
        _SIGNATURE, _chunk(b"IHDR", ihdr),
        _chunk(b"IDAT", zlib.compress(bytes(stream))),
        _chunk(b"IEND", b""),
    ])


@pytest.mark.parametrize("ftypes", [[0], [1, 4, 2, 3]])
@pytest.mark.parametrize("hw", [(16, 16), (9, 7), (1, 1), (3, 10), (8, 2)])
def test_adam7_rgb_roundtrip(hw, ftypes):
    h, w = hw
    rng = np.random.default_rng(h * 31 + w)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(_build_adam7_png(img, 2, 3, ftypes)), img
    )


def test_adam7_grayscale_and_rgba():
    rng = np.random.default_rng(77)
    gray = rng.integers(0, 256, size=(13, 5), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(_build_adam7_png(gray[..., None], 0, 1, [2])), gray
    )
    rgba = rng.integers(0, 256, size=(6, 21, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(_build_adam7_png(rgba, 6, 4, [4])), rgba
    )


@pytest.mark.parametrize("ftypes", [[0], [1, 4]])
def test_16bit_grayscale_and_rgb(ftypes):
    rng = np.random.default_rng(16)
    h, w = 4, 5
    gray16 = rng.integers(0, 1 << 16, size=(h, w), dtype=np.uint16)
    rows = gray16.astype(">u2").view(np.uint8).reshape(h, w * 2)
    data = _build_png(w, h, 16, 0, rows, 2, ftypes)
    out = decode_png(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, gray16)
    # decode_rgb_png downscales to 8-bit
    rgb = decode_rgb_png(data)
    assert rgb.dtype == np.uint8
    np.testing.assert_array_equal(rgb[..., 0], (gray16 >> 8).astype(np.uint8))

    rgb16 = rng.integers(0, 1 << 16, size=(h, w, 3), dtype=np.uint16)
    rows = rgb16.astype(">u2").view(np.uint8).reshape(h, w * 6)
    data = _build_png(w, h, 16, 2, rows, 6, ftypes)
    out = decode_png(data)
    assert out.dtype == np.uint16 and out.shape == (h, w, 3)
    np.testing.assert_array_equal(out, rgb16)


def test_bad_filter_type_raises():
    img = np.zeros((1, 2, 3), dtype=np.uint8)
    good = _build_png(2, 1, 8, 2, img.reshape(1, 6), 3, [0])
    # rebuild IDAT with filter byte 7
    raw = bytearray(b"\x07" + b"\x00" * 6)
    bad = good.replace(
        _chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6)),
        _chunk(b"IDAT", zlib.compress(bytes(raw))),
    )
    with pytest.raises(ValueError, match="filter type 7"):
        decode_png(bad)


def test_own_encoder_still_roundtrips():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(8, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_rgb_png(encode_rgb_png(img)), img)
    np.testing.assert_array_equal(decode_png(encode_rgb_png(img)), img)
