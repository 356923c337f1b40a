"""Foreign-stream VP8L decode (r5, VERDICT r4 item 3): hand-built
bitstreams exercising the features this repo's own encoder never emits —
predictor / cross-color / color-indexing transforms, color cache, meta
prefix image, 2D distance plane codes — plus malformed-stream bounds
(ADVICE r4). Fixtures are assembled with the encoder's own bit-writer +
prefix-code emitter (spec-valid by the round-trip suite), while the
expected pixel values come from independent forward-transform twins
implemented here, so a decoder bug can't cancel against itself.

Reference parity context: trefoil/cli/utilities.py:16-34 saves WebP via
PIL; this suite covers the decode direction PIL would provide there.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from trefoil_spark.functions.webp import (
    _CODE_TO_PLANE,
    _PLANE_TO_CODE_LUT,
    _TokenStream,
    _emit_prefix_code,
    decode_webp,
    encode_webp,
)
from trefoil_spark.functions.webp_huffman import prefix_encode_value


# ---------------------------------------------------------------------------
# fixture-building helpers
# ---------------------------------------------------------------------------


def _wrap_riff(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(ts: _TokenStream, w: int, h: int) -> None:
    ts.put(0x2F, 8)
    ts.put(w - 1, 14)
    ts.put(h - 1, 14)
    ts.put(1, 1)  # alpha hint
    ts.put(0, 3)  # version


class _Emitter:
    """Prefix-code-backed literal/ref emitter for one entropy-coded image."""

    def __init__(self, ts, g_freq, r_freq, b_freq, a_freq, d_freq):
        self.ts = ts
        self.g = _emit_prefix_code(ts, np.asarray(g_freq, dtype=np.int64))
        self.r = _emit_prefix_code(ts, np.asarray(r_freq, dtype=np.int64))
        self.b = _emit_prefix_code(ts, np.asarray(b_freq, dtype=np.int64))
        self.a = _emit_prefix_code(ts, np.asarray(a_freq, dtype=np.int64))
        self.d = _emit_prefix_code(ts, np.asarray(d_freq, dtype=np.int64))

    def _put(self, table, sym):
        rev, lens = table
        self.ts.put(int(rev[sym]), int(lens[sym]))

    def literal(self, r, g, b, a=255):
        self._put(self.g, g)
        self._put(self.r, r)
        self._put(self.b, b)
        self._put(self.a, a)

    def green_sym(self, sym):
        self._put(self.g, sym)

    def backref(self, length, dv):
        """Backward reference; dv is the spec distance value (plane code
        if <= 120, else dist + 120)."""
        lc, lx, lv = prefix_encode_value(length)
        self._put(self.g, 256 + lc)
        if lx:
            self.ts.put(lv, lx)
        dc, dx, dvv = prefix_encode_value(dv)
        self._put(self.d, dc)
        if dx:
            self.ts.put(dvv, dx)


def _literal_freqs(pixels, g_alphabet=280):
    g = np.zeros(g_alphabet, dtype=np.int64)
    r = np.zeros(256, dtype=np.int64)
    b = np.zeros(256, dtype=np.int64)
    a = np.zeros(256, dtype=np.int64)
    for pr, pg, pb, pa in pixels:
        g[pg] += 1
        r[pr] += 1
        b[pb] += 1
        a[pa] += 1
    return g, r, b, a, np.zeros(40, dtype=np.int64)


def _emit_sub_image(ts: _TokenStream, pixels) -> None:
    """entropy-coded image of pure literals (transform data / palette /
    entropy image), no color cache."""
    ts.put(0, 1)  # no color cache
    em = _Emitter(ts, *_literal_freqs(pixels))
    for pr, pg, pb, pa in pixels:
        em.literal(pr, pg, pb, pa)


def _cache_key(r, g, b, a, bits):
    argb = (a << 24) | (r << 16) | (g << 8) | b
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------------------
# the 2D distance table itself
# ---------------------------------------------------------------------------


def test_plane_code_table_is_a_bijection_with_spec_head():
    vals = [c for c in _PLANE_TO_CODE_LUT if c != 255]
    assert sorted(vals) == list(range(120))
    # independent cross-check: the first 24 (dx, dy) pairs as published
    # in the VP8L spec's distance-mapping table
    spec_head = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert _CODE_TO_PLANE[:24] == spec_head
    # structural invariant of the whole table: codes are ordered by
    # non-decreasing squared euclidean neighborhood distance
    d2 = [dx * dx + dy * dy for dx, dy in _CODE_TO_PLANE]
    assert all(d2[i] <= d2[i + 1] for i in range(119))
    # and every pair is inside the 8-neighborhood the encoder maps
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _CODE_TO_PLANE)


# ---------------------------------------------------------------------------
# color cache + 2D distances + meta prefix
# ---------------------------------------------------------------------------


def test_color_cache_hits_decode():
    w, h, bits = 4, 1, 4
    p0 = (10, 20, 30, 255)
    p1 = (40, 50, 60, 200)
    k0 = _cache_key(*p0, bits)
    k1 = _cache_key(*p1, bits)
    assert k0 != k1  # fixture sanity
    cache_size = 1 << bits
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(0, 1)  # no transforms
    ts.put(1, 1)  # color cache present
    ts.put(bits, 4)
    ts.put(0, 1)  # no meta prefix
    g, r, b, a, d = _literal_freqs([p0, p1], g_alphabet=280 + cache_size)
    g[280 + k0] += 1
    g[280 + k1] += 1
    em = _Emitter(ts, g, r, b, a, d)
    em.literal(*p0)
    em.literal(*p1)
    em.green_sym(280 + k0)  # cache hit → p0
    em.green_sym(280 + k1)  # cache hit → p1
    out = decode_webp(_wrap_riff(ts.pack()))
    assert out.shape == (1, 4, 4)
    np.testing.assert_array_equal(out[0, 2], out[0, 0])
    np.testing.assert_array_equal(out[0, 3], out[0, 1])
    np.testing.assert_array_equal(out[0, 0], np.array(p0, dtype=np.uint8))
    np.testing.assert_array_equal(out[0, 1], np.array(p1, dtype=np.uint8))


def test_2d_distance_plane_code_vertical_copy():
    # plane code 1 = (dx 0, dy 1) → distance = width; row 1 copies row 0
    w, h = 4, 2
    row = [(i * 3, i * 5, i * 7, 255) for i in range(w)]
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(0, 1)  # no transforms
    ts.put(0, 1)  # no cache
    ts.put(0, 1)  # no meta
    g, r, b, a, d = _literal_freqs(row)
    lc, _, _ = prefix_encode_value(w)
    g[256 + lc] += 1
    dc, _, _ = prefix_encode_value(1)  # dv=1 → plane code (0, 1)
    d[dc] += 1
    em = _Emitter(ts, g, r, b, a, d)
    for px in row:
        em.literal(*px)
    em.backref(w, 1)
    out = decode_webp(_wrap_riff(ts.pack()))
    np.testing.assert_array_equal(out[1], out[0])
    np.testing.assert_array_equal(
        out[0], np.array(row, dtype=np.uint8)[:, [0, 1, 2, 3]]
    )


def test_2d_distance_negative_dx():
    # plane code 4 = (dx -1, dy 1) → distance = width - 1
    w, h = 4, 2
    row = [(1, 2, 3, 255), (4, 5, 6, 255), (7, 8, 9, 255), (10, 11, 12, 255)]
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(0, 1)
    ts.put(0, 1)
    ts.put(0, 1)
    g, r, b, a, d = _literal_freqs(row)
    lc, _, _ = prefix_encode_value(4)
    g[256 + lc] += 1
    dc, _, _ = prefix_encode_value(4)  # dv=4 → (-1, 1)
    d[dc] += 1
    em = _Emitter(ts, g, r, b, a, d)
    for px in row:
        em.literal(*px)
    em.backref(4, 4)  # copies px[1:4] then the just-copied pixel
    out = decode_webp(_wrap_riff(ts.pack()))
    flat = out.reshape(-1, 4)
    dist = w - 1
    expect = np.array(row, dtype=np.uint8)
    for i in range(4, 8):
        np.testing.assert_array_equal(flat[i], flat[i - dist])
    np.testing.assert_array_equal(flat[:4], expect)


def test_meta_prefix_image_two_groups():
    # width 8, meta_bits=2 → two 4px tile columns, each its own group.
    # Group 0 knows only green=100, group 1 only green=200 — decoding
    # proves per-tile group switching (a single group couldn't express
    # two different zero-bit literal alphabets).
    w, h, mbits = 8, 1, 2
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(0, 1)  # no transforms
    ts.put(0, 1)  # no color cache
    ts.put(1, 1)  # meta prefix image present
    ts.put(mbits - 2, 3)
    # meta image (2x1): group indices 0 and 1 via (red<<8)|green
    _emit_sub_image(ts, [(0, 0, 0, 255), (0, 1, 0, 255)])
    # group 0 then group 1
    g0, r0, b0, a0, d0 = _literal_freqs([(7, 100, 9, 255)] * 4)
    em0_tables = (g0, r0, b0, a0, d0)
    g1, r1, b1, a1, d1 = _literal_freqs([(17, 200, 19, 128)] * 4)
    em0 = _Emitter(ts, *em0_tables)
    em1 = _Emitter(ts, g1, r1, b1, a1, d1)
    for _ in range(4):
        em0.literal(7, 100, 9, 255)
    for _ in range(4):
        em1.literal(17, 200, 19, 128)
    out = decode_webp(_wrap_riff(ts.pack()))
    np.testing.assert_array_equal(
        out[0, :4], np.tile(np.array([7, 100, 9, 255], np.uint8), (4, 1))
    )
    np.testing.assert_array_equal(
        out[0, 4:], np.tile(np.array([17, 200, 19, 128], np.uint8), (4, 1))
    )


# ---------------------------------------------------------------------------
# transforms — independent forward twins in the test
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return (a + b) >> 1


def _forward_predict(img: np.ndarray, w: int, h: int, bits: int, modes: np.ndarray):
    """Forward predictor transform (test-side twin): residual = pixel -
    prediction (mod 256), scanning in decode order."""
    tw = (w + (1 << bits) - 1) >> bits
    flat = img.reshape(-1, 4).astype(np.int16)
    res = np.empty_like(flat)
    black = np.array([0, 0, 0, 255], dtype=np.int16)
    for i in range(w * h):
        if i == 0:
            pred = black
        elif i < w:
            pred = flat[i - 1]
        elif i % w == 0:
            pred = flat[i - w]
        else:
            mode = int(modes[((i // w) >> bits) * tw + ((i % w) >> bits)])
            L, T = flat[i - 1], flat[i - w]
            TL, TR = flat[i - w - 1], flat[i - w + 1]
            if mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 11:
                pT = int(np.abs(L - TL).sum())
                pL = int(np.abs(T - TL).sum())
                pred = T if pT <= pL else L
            elif mode == 12:
                pred = np.clip(L + T - TL, 0, 255)
            elif mode == 13:
                ave = _avg2(L, T)
                d = ave - TL
                half = np.where(d >= 0, d >> 1, -((-d) >> 1))
                pred = np.clip(ave + half, 0, 255)
            elif mode == 9:
                pred = _avg2(T, TR)
            else:
                raise AssertionError(f"twin has no mode {mode}")
        res[i] = (flat[i] - pred) & 0xFF
    return res.astype(np.uint8)


@pytest.mark.parametrize("mode", [1, 2, 7, 9, 11, 12, 13])
def test_predictor_transform_decode(mode):
    rng = np.random.default_rng(mode)
    w, h, bits = 8, 4, 3  # single 8x8 tile
    img = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    img[..., 3] = 255
    modes = np.array([mode])
    res = _forward_predict(img, w, h, bits, modes)
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(1, 1)  # transform present
    ts.put(0, 2)  # predictor
    ts.put(bits - 2, 3)
    _emit_sub_image(ts, [(0, mode, 0, 255)])  # 1x1 tile image
    ts.put(0, 1)  # no more transforms
    ts.put(0, 1)  # no cache
    ts.put(0, 1)  # no meta
    pixels = [tuple(int(v) for v in res[i]) for i in range(w * h)]
    g, r, b, a, d = _literal_freqs(pixels)
    em = _Emitter(ts, g, r, b, a, d)
    for px in pixels:
        em.literal(*px)
    out = decode_webp(_wrap_riff(ts.pack()))
    np.testing.assert_array_equal(out, img)


def test_predictor_rightmost_column_tr_wraps_to_row_start():
    # mode 3 (TR): for x = w-1 the TR pixel is the leftmost pixel of the
    # SAME row (spec's exceptional border rule / contiguous-buffer rule)
    w, h, bits = 2, 2, 3
    img = np.array(
        [[[10, 20, 30, 255], [40, 50, 60, 255]],
         [[70, 80, 90, 255], [0, 0, 0, 0]]],
        dtype=np.uint8,
    )
    # decode order: (1,1) has TR = flat[i-w+1] = flat[2] = (70,80,90,255)
    img[1, 1] = img[1, 0]  # make expectation: pixel == TR
    flat = img.reshape(-1, 4).astype(np.int16)
    res = flat.copy()
    res[1] = (flat[1] - flat[0]) & 0xFF        # top row: L
    res[2] = (flat[2] - flat[0]) & 0xFF        # left col: T
    res[3] = (flat[3] - flat[2]) & 0xFF        # mode 3: TR == flat[2]
    res[0] = (flat[0] - np.array([0, 0, 0, 255], np.int16)) & 0xFF
    pixels = [tuple(int(v) for v in res[i]) for i in range(4)]
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(1, 1)
    ts.put(0, 2)
    ts.put(bits - 2, 3)
    _emit_sub_image(ts, [(0, 3, 0, 255)])
    ts.put(0, 1)
    ts.put(0, 1)
    ts.put(0, 1)
    g, r, b, a, d = _literal_freqs(pixels)
    em = _Emitter(ts, g, r, b, a, d)
    for px in pixels:
        em.literal(*px)
    out = decode_webp(_wrap_riff(ts.pack()))
    np.testing.assert_array_equal(out, img)


def _s8(v):
    return int(np.array(v, dtype=np.uint8).astype(np.int8))


def _ctd_scalar(t, c):
    return (_s8(t) * _s8(c)) >> 5


def _forward_cross_color(img, w, h, bits, cte):
    """Forward color transform twin: subtract the deltas (spec encoder
    direction), single tile. cte = (g2r, g2b, r2b) as uint8."""
    g2r, g2b, r2b = cte
    out = img.reshape(-1, 4).astype(np.int32).copy()
    for i in range(w * h):
        r, g, b = out[i, 0], out[i, 1], out[i, 2]
        new_r = (r - _ctd_scalar(g2r, g)) & 0xFF
        # decode restores red BEFORE the red→blue delta, so the forward
        # direction subtracts the delta of the ORIGINAL red
        new_b = (b - _ctd_scalar(g2b, g) - _ctd_scalar(r2b, r)) & 0xFF
        out[i, 0], out[i, 2] = new_r, new_b
    return out.astype(np.uint8)


def test_cross_color_transform_decode():
    rng = np.random.default_rng(42)
    w, h, bits = 4, 4, 2  # single 4x4 tile
    img = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    cte = (250, 10, 133)  # g2r=-6, g2b=10, r2b=-123 as int8
    res = _forward_cross_color(img, w, h, bits, cte)
    # sanity: the twin must invert (checked independently of the decoder)
    ri = res.astype(np.int32)
    g = ri[:, 1]
    back_r = (ri[:, 0] + ((_s8(cte[0]) * g.astype(np.uint8).view(np.int8).astype(np.int32)) >> 5)) & 0xFF
    assert np.array_equal(back_r.astype(np.uint8), img.reshape(-1, 4)[:, 0])

    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(1, 1)
    ts.put(1, 2)  # cross-color
    ts.put(bits - 2, 3)
    # transform pixel: blue=g2r, green=g2b, red=r2b
    _emit_sub_image(ts, [(cte[2], cte[1], cte[0], 255)])
    ts.put(0, 1)
    ts.put(0, 1)
    ts.put(0, 1)
    pixels = [tuple(int(v) for v in res[i]) for i in range(w * h)]
    g_, r_, b_, a_, d_ = _literal_freqs(pixels)
    em = _Emitter(ts, g_, r_, b_, a_, d_)
    for px in pixels:
        em.literal(*px)
    out = decode_webp(_wrap_riff(ts.pack()))
    np.testing.assert_array_equal(out, img)


def test_color_indexing_with_bundling():
    # 3-color palette → wbits=2 → 4 indices per packed green byte
    w, h = 6, 1
    palette = np.array(
        [[10, 20, 30, 255], [50, 60, 70, 255], [90, 100, 110, 255]],
        dtype=np.uint8,
    )
    indices = [0, 1, 2, 2, 1, 0]
    packed_w = (w + 3) // 4
    packed = []
    for p in range(packed_w):
        byte = 0
        for j in range(4):
            x = p * 4 + j
            if x < w:
                byte |= indices[x] << (2 * j)
        packed.append(byte)
    # delta-coded palette entries
    deltas = np.diff(
        np.vstack([np.zeros(4, np.int16), palette.astype(np.int16)]), axis=0
    ) & 0xFF
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(1, 1)
    ts.put(3, 2)  # color indexing
    ts.put(len(palette) - 1, 8)
    _emit_sub_image(ts, [tuple(int(v) for v in row) for row in deltas])
    ts.put(0, 1)  # no more transforms
    ts.put(0, 1)  # no cache
    ts.put(0, 1)  # no meta
    pixels = [(0, byte, 0, 255) for byte in packed]
    g, r, b, a, d = _literal_freqs(pixels)
    em = _Emitter(ts, g, r, b, a, d)
    for px in pixels:
        em.literal(*px)
    out = decode_webp(_wrap_riff(ts.pack()))
    np.testing.assert_array_equal(out[0], palette[indices])


def test_color_indexing_out_of_range_index_is_transparent_black():
    w, h = 2, 1
    palette = np.array([[5, 6, 7, 255]], dtype=np.uint8)  # size 1 → wbits=3
    # 8 indices/byte; second pixel index 1 is out of range → 0x00000000
    packed_byte = 0 | (1 << 1)
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(1, 1)
    ts.put(3, 2)
    ts.put(0, 8)  # palette size 1
    _emit_sub_image(ts, [(5, 6, 7, 255)])
    ts.put(0, 1)
    ts.put(0, 1)
    ts.put(0, 1)
    pixels = [(0, packed_byte, 0, 255)]
    g, r, b, a, d = _literal_freqs(pixels)
    em = _Emitter(ts, g, r, b, a, d)
    em.literal(*pixels[0])
    out = decode_webp(_wrap_riff(ts.pack()))
    np.testing.assert_array_equal(out[0, 0], np.array([5, 6, 7, 255], np.uint8))
    np.testing.assert_array_equal(out[0, 1], np.zeros(4, np.uint8))


# ---------------------------------------------------------------------------
# malformed streams (ADVICE r4: clean errors, not IndexError/garbage)
# ---------------------------------------------------------------------------


def _minimal_stream(backref=None):
    w, h = 2, 2
    px = (1, 2, 3, 255)
    ts = _TokenStream()
    _header(ts, w, h)
    ts.put(0, 1)
    ts.put(0, 1)
    ts.put(0, 1)
    g, r, b, a, d = _literal_freqs([px])
    if backref is not None:
        length, dv = backref
        lc, _, _ = prefix_encode_value(length)
        g[256 + lc] += 1
        dc, _, _ = prefix_encode_value(dv)
        d[dc] += 1
    em = _Emitter(ts, g, r, b, a, d)
    em.literal(*px)
    if backref is not None:
        em.backref(*backref)
    return _wrap_riff(ts.pack())


def test_backref_before_start_raises():
    # dist 3 > decoded position 1
    with pytest.raises(ValueError, match="before image start"):
        decode_webp(_minimal_stream(backref=(2, 123)))


def test_backref_past_end_raises():
    # length 8 from position 1 overruns the 4-pixel image
    with pytest.raises(ValueError, match="past image end"):
        decode_webp(_minimal_stream(backref=(8, 121)))


def test_roundtrip_still_green_after_decoder_rewrite():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, size=(13, 17, 4), dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    np.testing.assert_array_equal(out, img)
