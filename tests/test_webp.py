"""WebP lossless (VP8L) codec round trips (F11 webp tail — PIL-free)."""

import struct

import numpy as np
import pytest

from trefoil_spark.functions.webp import decode_webp, encode_webp


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


class TestWebpContainer:
    def test_riff_framing(self):
        b = encode_webp(_gradient(10, 10))
        assert b[:4] == b"RIFF" and b[8:12] == b"WEBP" and b[12:16] == b"VP8L"
        (riff_size,) = struct.unpack("<I", b[4:8])
        assert riff_size == len(b) - 8
        (chunk_size,) = struct.unpack("<I", b[16:20])
        assert len(b) == 20 + chunk_size + (chunk_size & 1)
        assert b[20] == 0x2F  # VP8L signature

    def test_deterministic(self):
        img = _gradient(16, 24)
        assert encode_webp(img) == encode_webp(img)


class TestWebpRoundtrip:
    def test_rgb_exact(self):
        img = _gradient(20, 30)
        out = decode_webp(encode_webp(img))
        assert out.shape == (20, 30, 4)
        assert np.array_equal(out[..., :3], img)
        assert np.all(out[..., 3] == 255)

    def test_rgba_exact(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (17, 23, 4), dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp(img)), img)

    def test_noise_exact(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (31, 9, 3), dtype=np.uint8)
        out = decode_webp(encode_webp(img))
        assert np.array_equal(out[..., :3], img)

    def test_grayscale_input(self):
        g = np.tile(np.arange(32, dtype=np.uint8) * 8, (8, 1))
        out = decode_webp(encode_webp(g))
        assert np.array_equal(out[..., 0], g)
        assert np.array_equal(out[..., 1], g)

    def test_single_pixel(self):
        img = np.array([[[1, 2, 3, 4]]], dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp(img)), img)

    def test_all_byte_values(self):
        img = np.arange(256, dtype=np.uint8).reshape(16, 16)
        out = decode_webp(encode_webp(img))
        assert np.array_equal(out[..., 1], img)

    def test_rejects_oversize(self):
        with pytest.raises(ValueError):
            encode_webp(np.zeros((1 << 14 + 1, 4, 3), np.uint8))


class TestRenderWebp:
    def test_render_image_bytes_webp(self):
        from trefoil_spark.functions.color import Color
        from trefoil_spark.raster.render import StretchedRenderer, render_image_bytes

        r = StretchedRenderer(
            [(0.0, Color(0, 0, 0, 255)), (100.0, Color(255, 0, 0, 255))]
        )
        data = np.linspace(0, 100, 30 * 40).reshape(30, 40)
        wb = render_image_bytes(r, data, scale=1.5, format="webp")
        img = decode_webp(wb)
        assert img.shape == (45, 60, 4)
        # the lanczos-resized composite must round-trip losslessly: webp
        # bytes decode to the exact same RGBA as the PNG twin
        from trefoil_spark.functions.png import decode_rgb_png

        png = decode_rgb_png(render_image_bytes(r, data, scale=1.5, format="png"))
        assert np.array_equal(img, png)


def test_vp8l_compression_ratio():
    """r4 entropy+LZ77 coding: classified-raster renders compress by
    orders of magnitude vs the old ~4 B/px literal-only stream, while
    staying byte-exact lossless; incompressible content stays bounded."""
    rng = np.random.default_rng(0)
    h, w = 256, 256
    cls = np.repeat(np.repeat(rng.integers(0, 5, (16, 16)), 16, axis=0), 16, axis=1)
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0], [128, 128, 128]],
        np.uint8,
    )
    img = palette[cls]
    e = encode_webp(img)
    assert np.array_equal(decode_webp(e)[..., :3], img)
    assert len(e) < h * w * 0.02, len(e)  # ≥ 200x below literal-only

    noise = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    en = encode_webp(noise)
    assert np.array_equal(decode_webp(en)[..., :3], noise)
    assert len(en) < h * w * 3.1  # ~3 B/px: entropy floor of random RGB

    stripes = np.tile(rng.integers(0, 256, (1, w, 3)).astype(np.uint8), (h, 1, 1))
    es = encode_webp(stripes)
    assert np.array_equal(decode_webp(es)[..., :3], stripes)
    assert len(es) < h * w * 0.05  # vertical copy via dist=w references


def test_vp8l_lz77_edge_shapes():
    """Overlapping run copies, single-column images, 2-live-symbol
    channels with a length code (normal-code fallback), determinism."""
    rng = np.random.default_rng(3)
    for shape in [(1, 1, 4), (1, 1, 3), (2, 3, 4), (7, 1, 3), (1, 9, 3), (64, 64, 3)]:
        x = rng.integers(0, 256, shape).astype(np.uint8)
        got = decode_webp(encode_webp(x))
        assert np.array_equal(got[..., : shape[2]], x), shape
    const = np.full((64, 64, 3), 42, np.uint8)  # one literal + one 4095-run
    e = encode_webp(const)
    assert np.array_equal(decode_webp(e)[..., :3], const)
    assert len(e) < 64
    assert encode_webp(const) == e


def test_vp8l_subtract_green():
    """The SUBTRACT_GREEN transform collapses grayscale-as-RGB content
    to near-single-symbol R'/B' channels (~270x smaller than without),
    stays byte-exact lossless, and is neutral on independent channels."""
    h, w = 128, 128
    grad = np.linspace(0, 255, h * w).reshape(h, w).astype(np.uint8)
    gray3 = np.stack([grad] * 3, -1)
    e = encode_webp(gray3)
    assert np.array_equal(decode_webp(e)[..., :3], gray3)
    assert len(e) < h * w * 0.1
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    en = encode_webp(noise)
    assert np.array_equal(decode_webp(en)[..., :3], noise)
    assert len(en) < h * w * 3.1
