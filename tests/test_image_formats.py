"""F11 full surface: Lanczos resampling + baseline JPEG codec + truecolor
PNG (reference render_image, cli/utilities.py:16-34 — PIL-free)."""

import struct

import numpy as np
import pytest

from trefoil_spark.functions.jpeg import decode_jpeg, encode_jpeg, quality_tables
from trefoil_spark.functions.png import decode_rgb_png, encode_rgb_png
from trefoil_spark.functions.resample import resample_lanczos, resample_weights


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


class TestLanczos:
    def test_identity_weights(self):
        assert np.allclose(resample_weights(64, 64), np.eye(64), atol=1e-12)

    def test_constant_preserved(self):
        img = np.full((50, 70, 3), 173, np.uint8)
        out = resample_lanczos(img, 23, 31)
        assert out.shape == (23, 31, 3)
        assert np.all(out == 173)

    def test_linear_ramp_downscale(self):
        ramp = np.tile(np.arange(100, dtype=np.float64), (10, 1))
        down = resample_lanczos(ramp, 10, 50)
        # away from edges a 2x box center sits at 2*o + 0.5
        want = np.arange(10, 40) * 2 + 0.5
        assert np.abs(down[5, 10:40] - want).max() < 1e-9

    def test_upscale_interpolates(self):
        ramp = np.tile(np.arange(10, dtype=np.float64) * 10, (4, 1))
        up = resample_lanczos(ramp, 4, 40)
        # monotone-ish in the interior, endpoints near original range
        assert up[2, 2] < up[2, 20] < up[2, 37]

    def test_uint8_clips(self):
        img = np.zeros((8, 16), np.uint8)
        img[:, 8:] = 255  # hard edge → ringing must clip, not wrap
        out = resample_lanczos(img, 8, 8)
        assert out.dtype == np.uint8

    def test_weights_rows_normalized(self):
        for n_in, n_out in [(100, 37), (37, 100), (256, 256), (5, 1)]:
            w = resample_weights(n_in, n_out)
            assert np.allclose(w.sum(axis=1), 1.0, atol=1e-12)


class TestJpeg:
    def test_markers(self):
        b = encode_jpeg(_gradient(40, 56), 80)
        assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
        assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"

    def test_roundtrip_psnr(self):
        img = _gradient(120, 200)
        dec = decode_jpeg(encode_jpeg(img, 90))
        mse = ((dec.astype(float) - img.astype(float)) ** 2).mean()
        assert 10 * np.log10(255**2 / mse) > 40

    def test_quality_monotone_size(self):
        img = _gradient(64, 64)
        assert len(encode_jpeg(img, 10)) < len(encode_jpeg(img, 90))

    def test_non_multiple_of_8(self):
        img = _gradient(13, 21)
        dec = decode_jpeg(encode_jpeg(img, 95))
        assert dec.shape == (13, 21, 3)
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 6

    def test_grayscale_input(self):
        g = np.tile(np.arange(64, dtype=np.uint8) * 4, (16, 1))
        dec = decode_jpeg(encode_jpeg(g, 90))
        assert dec.shape == (16, 64, 3)
        # gray stays gray (channels nearly equal)
        assert np.abs(dec[..., 0].astype(int) - dec[..., 1].astype(int)).max() <= 3

    def test_noise_roundtrip_bounded(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 95))
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 10

    def test_quality_tables_clip(self):
        lq, cq = quality_tables(1)
        assert lq.max() <= 255 and cq.max() <= 255
        lq100, _ = quality_tables(100)
        assert lq100.min() >= 1

    def test_deterministic(self):
        img = _gradient(32, 32)
        assert encode_jpeg(img, 75) == encode_jpeg(img, 75)


class TestTruecolorPng:
    def test_rgb_roundtrip(self):
        img = _gradient(20, 30)
        assert np.array_equal(decode_rgb_png(encode_rgb_png(img)), img)

    def test_rgba_roundtrip(self):
        img = np.dstack([_gradient(20, 30), np.full((20, 30), 127, np.uint8)])
        assert np.array_equal(decode_rgb_png(encode_rgb_png(img)), img)

    def test_rejects_bad_shape(self):
        with pytest.raises(ValueError):
            encode_rgb_png(np.zeros((4, 4), np.uint8))


class TestRenderImageBytes:
    def _renderer(self):
        from trefoil_spark.functions.color import Color
        from trefoil_spark.raster.render import StretchedRenderer

        return StretchedRenderer(
            [(0.0, Color(0, 0, 0, 255)), (100.0, Color(255, 0, 0, 255))]
        )

    def test_palette_fast_path_identical(self):
        from trefoil_spark.raster.render import render_image_bytes, render_image_png

        r = self._renderer()
        data = np.linspace(0, 100, 40 * 60).reshape(40, 60)
        assert render_image_bytes(
            r, data, scale=2, format="png", resampling="nearest"
        ) == render_image_png(r, data, 2)

    def test_lanczos_fractional_scale_png(self):
        from trefoil_spark.raster.render import render_image_bytes

        r = self._renderer()
        data = np.linspace(0, 100, 40 * 60).reshape(40, 60)
        img = decode_rgb_png(render_image_bytes(r, data, scale=2.5, format="png"))
        assert img.shape == (100, 150, 4)

    def test_jpg_decodes_close_to_composite(self):
        from trefoil_spark.raster.render import render_image_bytes

        r = self._renderer()
        data = np.linspace(0, 100, 40 * 60).reshape(40, 60)
        jpg = render_image_bytes(r, data, scale=1, format="jpg", quality=92)
        dec = decode_jpeg(jpg)
        # red ramp: red channel grows along the flattened gradient
        assert dec.shape == (40, 60, 3)
        assert dec[0, 0, 0] < 30 and dec[-1, -1, 0] > 225

    def test_flip_y(self):
        from trefoil_spark.raster.render import render_image_bytes

        r = self._renderer()
        data = np.linspace(0, 100, 20 * 20).reshape(20, 20)
        up = decode_rgb_png(render_image_bytes(r, data, format="png", scale=1.5))
        fl = decode_rgb_png(
            render_image_bytes(r, data, format="png", scale=1.5, flip_y=True)
        )
        assert up[0, 0, 0] < fl[0, 0, 0]  # flipped starts at the hot end

    def test_rejects_bad_args(self):
        from trefoil_spark.raster.render import render_image_bytes

        r = self._renderer()
        data = np.zeros((8, 8))
        with pytest.raises(ValueError):
            render_image_bytes(r, data, format="gif")
        with pytest.raises(ValueError):
            render_image_bytes(r, data, resampling="cubic")
        with pytest.raises(ValueError):
            render_image_bytes(r, data, scale=0)


class TestJpeg420:
    def test_roundtrip_psnr(self):
        img = _gradient(121, 203)  # non-multiple of 16
        dec = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
        assert dec.shape == (121, 203, 3)
        mse = ((dec.astype(float) - img.astype(float)) ** 2).mean()
        assert 10 * np.log10(255**2 / mse) > 40

    def test_smaller_than_444(self):
        img = _gradient(96, 96)
        assert len(encode_jpeg(img, 85, subsampling="420")) < len(
            encode_jpeg(img, 85, subsampling="444")
        )

    def test_luma_full_resolution(self):
        # a luma-only checkerboard survives 420 (chroma flat, Y full-res)
        yy, xx = np.mgrid[0:32, 0:32]
        g = (((yy // 4 + xx // 4) % 2) * 200 + 20).astype(np.uint8)
        img = np.stack([g] * 3, axis=-1)
        dec = decode_jpeg(encode_jpeg(img, 95, subsampling="420"))
        assert np.abs(dec.astype(float) - img.astype(float)).mean() < 6

    def test_rejects_unknown_subsampling(self):
        with pytest.raises(ValueError):
            encode_jpeg(_gradient(8, 8), subsampling="422")

    def test_default_444_bytes_unchanged(self):
        img = _gradient(40, 56)
        assert encode_jpeg(img, 80) == encode_jpeg(img, 80, subsampling="444")


class TestJpegProgressive:
    def test_pixel_identical_to_baseline(self):
        img = _gradient(77, 130)
        db = decode_jpeg(encode_jpeg(img, 90))
        dp = decode_jpeg(encode_jpeg(img, 90, progressive=True))
        assert np.array_equal(db, dp)

    def test_sof2_marker(self):
        b = encode_jpeg(_gradient(16, 16), 80, progressive=True)
        assert b"\xff\xc2" in b and b"\xff\xc0" not in b
        # four SOS markers: DC + three per-component AC scans
        assert b.count(b"\xff\xda") == 4

    def test_noise_identical(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (41, 29, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, 75)),
            decode_jpeg(encode_jpeg(img, 75, progressive=True)),
        )

    def test_rejects_progressive_420(self):
        with pytest.raises(ValueError):
            encode_jpeg(_gradient(8, 8), progressive=True, subsampling="420")

    def test_render_jpg_is_progressive(self):
        from trefoil_spark.functions.color import Color
        from trefoil_spark.raster.render import StretchedRenderer, render_image_bytes

        r = StretchedRenderer(
            [(0.0, Color(0, 0, 0, 255)), (100.0, Color(255, 0, 0, 255))]
        )
        data = np.linspace(0, 100, 20 * 20).reshape(20, 20)
        jpg = render_image_bytes(r, data, format="jpg")
        assert b"\xff\xc2" in jpg
        assert decode_jpeg(jpg).shape == (20, 20, 3)


def test_jpeg_vectorized_entropy_identical_to_scalar():
    """r4 vectorized baseline entropy coder (flat token lexsort +
    MSB-first 4-plane packing + vectorized stuffing) is BIT-identical
    to the per-block scalar loop on both subsampling modes."""
    import numpy as np

    import trefoil_spark.functions.jpeg as J

    rng = np.random.default_rng(17)
    imgs = [
        rng.integers(0, 256, (48, 40, 3)).astype(np.uint8),
        np.full((17, 23, 3), 200, np.uint8),
        rng.integers(0, 256, (16, 16, 3)).astype(np.uint8),
    ]
    for img in imgs:
        for sub in ("444", "420"):
            h, w = img.shape[:2]
            qt_l, qt_c = J.quality_tables(85)
            ycc = J.rgb_to_ycbcr(img)
            if sub == "444":
                comps = []
                for ci in range(3):
                    qt = qt_l if ci == 0 else qt_c
                    comps.append(
                        J._fdct_quant(J._to_blocks(ycc[..., ci]), qt)[:, J._Z // 8, J._Z % 8]
                    )
                n_mcus = comps[0].shape[0]
                layout = [(0, 1), (1, 1), (2, 1)]
            else:
                mh, mw = -(-h // 16), -(-w // 16)
                ypl = J._pad_to(ycc[..., 0], mh * 16, mw * 16)
                yb = (ypl.reshape(mh, 16, mw, 16).transpose(0, 2, 1, 3)
                      .reshape(mh, mw, 2, 8, 2, 8).transpose(0, 1, 2, 4, 3, 5)
                      .reshape(-1, 8, 8))

                def half(chan):
                    p = J._pad_to(chan, -(-h // 2) * 2, -(-w // 2) * 2)
                    q = (p[0::2, 0::2] + p[0::2, 1::2]
                         + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
                    return J._pad_to(q, mh * 8, mw * 8)

                cb = half(ycc[..., 1]).reshape(mh, 8, mw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
                cr = half(ycc[..., 2]).reshape(mh, 8, mw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
                comps = [J._fdct_quant(yb, qt_l)[:, J._Z // 8, J._Z % 8],
                         J._fdct_quant(cb, qt_c)[:, J._Z // 8, J._Z % 8],
                         J._fdct_quant(cr, qt_c)[:, J._Z // 8, J._Z % 8]]
                n_mcus = mh * mw
                layout = [(0, 4), (1, 1), (2, 1)]
            tabs = [(J._DC_L, J._AC_L), (J._DC_C, J._AC_C), (J._DC_C, J._AC_C)]
            vec = J._entropy_encode_baseline(comps, layout, n_mcus, tabs)
            sca = J._entropy_encode_baseline_scalar(comps, layout, n_mcus, tabs)
            assert vec == sca, (img.shape, sub)


class TestJpegRestartMarkers:
    """DRI/RSTm support (r5) — the error-resilience layout real
    camera/libjpeg baseline files use (ITU T.81 F.2.1.3.1)."""

    def _img(self, h, w, seed=5):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    @pytest.mark.parametrize("subsampling,interval", [
        ("444", 1), ("444", 3), ("444", 7), ("420", 2),
    ])
    def test_roundtrip_matches_unrestarted(self, subsampling, interval):
        img = self._img(40, 56)
        plain = decode_jpeg(encode_jpeg(img, 90, subsampling=subsampling))
        rst = decode_jpeg(encode_jpeg(
            img, 90, subsampling=subsampling, restart_interval=interval))
        np.testing.assert_array_equal(plain, rst)

    def test_markers_present_and_cyclic(self):
        # enough MCUs (25 @ 444) for the RSTm index to wrap past 7
        data = encode_jpeg(self._img(40, 40), 85, restart_interval=1)
        body = data[2:]
        markers = []
        i = 0
        while i + 1 < len(body):
            if body[i] == 0xFF and 0xD0 <= body[i + 1] <= 0xD7:
                markers.append(body[i + 1] & 7)
                i += 2
            else:
                i += 1
        assert len(markers) == 24  # 25 MCUs, marker between each pair
        assert markers == [m & 7 for m in range(24)]  # cyclic 0..7,0..

    def test_dri_segment_value(self):
        data = encode_jpeg(self._img(24, 24), 85, restart_interval=3)
        k = data.find(b"\xff\xdd")
        assert k > 0
        ln, val = struct.unpack(">HH", data[k + 2:k + 6])
        assert ln == 4 and val == 3

    def test_out_of_sequence_marker_rejected(self):
        data = bytearray(encode_jpeg(self._img(24, 24), 85, restart_interval=1))
        # find the first RSTm and corrupt its index
        for i in range(len(data) - 1):
            if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
                data[i + 1] = 0xD5
                break
        with pytest.raises(ValueError, match="out of sequence"):
            decode_jpeg(bytes(data))

    def test_progressive_rejects_restart(self):
        with pytest.raises(ValueError, match="baseline-only"):
            encode_jpeg(self._img(8, 8), progressive=True, restart_interval=2)
