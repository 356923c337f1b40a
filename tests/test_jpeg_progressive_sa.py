"""Progressive successive-approximation decode (r5).

The module's own progressive encoder emits spectral selection only
(Ah=Al=0), so SA coverage needs an independent twin: this file
implements a from-the-spec SA *encoder* (ITU T.81 G.1.2.2 DC point
transform / G.1.2.3 AC refinement with correction-bit buffering — the
algorithm libjpeg's default progressive scan script uses) and asserts
decode_jpeg recovers pixels bit-identical to the module's own non-SA
progressive stream of the same image (both streams carry the exact same
quantized coefficients, so the decoded pixels must match exactly).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from trefoil_spark.functions.jpeg import (
    _Z,
    AC_CHROMA_SPEC,
    AC_LUMA_SPEC,
    DC_CHROMA_SPEC,
    DC_LUMA_SPEC,
    _BitWriter,
    _build_codes,
    _fdct_quant,
    _magnitude,
    _seg,
    _to_blocks,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
    rgb_to_ycbcr,
)

_DCL, _DCC = _build_codes(DC_LUMA_SPEC), _build_codes(DC_CHROMA_SPEC)
_ACL, _ACC = _build_codes(AC_LUMA_SPEC), _build_codes(AC_CHROMA_SPEC)


def _quantized_components(img: np.ndarray, quality: int):
    """(nb, 64) zigzag coefficient arrays for Y, Cb, Cr (444)."""
    qt_l, qt_c = quality_tables(quality)
    ycc = rgb_to_ycbcr(img)
    comps = []
    for ci in range(3):
        qt = qt_l if ci == 0 else qt_c
        blocks = _to_blocks(ycc[..., ci])
        comps.append(_fdct_quant(blocks, qt)[:, _Z // 8, _Z % 8].astype(np.int64))
    return comps, (qt_l, qt_c)


class _SAWriter(_BitWriter):
    """BitWriter plus the refinement-scan correction-bit buffer."""

    def __init__(self):
        super().__init__()
        self.pending: list[int] = []

    def emit_sym(self, tab, sym):
        code, ln = tab[sym]
        self.write(code, ln)

    def flush_pending(self):
        for b in self.pending:
            self.write(b, 1)
        self.pending = []


def _rst(bw, state):
    """Emit the next cyclic RSTm: 1-pad to byte, raw marker bytes."""
    bw.flush()
    bw.buf += bytes((0xFF, 0xD0 + state[0]))
    state[0] = (state[0] + 1) & 7


def _encode_dc_first(bw, comps, dc_tabs, al, ri=0):
    preds = [0] * len(comps)
    nb = comps[0].shape[0]
    rst = [0]
    for bi in range(nb):
        if ri and bi and bi % ri == 0:
            _rst(bw, rst)
            preds = [0] * len(comps)
        for ci, zz in enumerate(comps):
            v = int(zz[bi, 0]) >> al  # arithmetic shift = DC point transform
            diff = v - preds[ci]
            preds[ci] = v
            size, bits = _magnitude(diff)
            bw.emit_sym(dc_tabs[ci], size)
            if size:
                bw.write(bits, size)


def _encode_dc_refine(bw, comps, al, ri=0):
    nb = comps[0].shape[0]
    rst = [0]
    for bi in range(nb):
        if ri and bi and bi % ri == 0:
            _rst(bw, rst)
        for zz in comps:
            bw.write((int(zz[bi, 0]) >> al) & 1, 1)


def _encode_ac_first(bw, zz, ac_tab, ss, se, al, ri=0):
    """Band first pass at precision al; one EOB per block (run len 1)."""
    nb = zz.shape[0]
    rst = [0]
    for bi in range(nb):
        if ri and bi and bi % ri == 0:
            _rst(bw, rst)
        r = 0
        wrote = False
        for k in range(ss, se + 1):
            v = int(zz[bi, k])
            t = (abs(v) >> al) * (1 if v >= 0 else -1)
            if t == 0:
                r += 1
                continue
            while r > 15:
                bw.emit_sym(ac_tab, 0xF0)  # ZRL
                r -= 16
            size, bits = _magnitude(t)
            bw.emit_sym(ac_tab, (r << 4) | size)
            bw.write(bits, size)
            r = 0
            wrote = True
        if r > 0 or not wrote:
            bw.emit_sym(ac_tab, 0x00)  # EOB (run of 1)


def _encode_ac_refine(bw, zz, ac_tab, ss, se, al, ri=0):
    """G.1.2.3 refinement: newly-significant (temp==1) coefficients get
    (run, 1)+sign; already-nonzero get buffered correction bits flushed
    after the next emitted code; per-block EOB when a tail remains."""
    nb = zz.shape[0]
    p_mask = 1
    rst = [0]
    for bi in range(nb):
        if ri and bi and bi % ri == 0:
            _rst(bw, rst)
        absv = [abs(int(zz[bi, k])) >> al for k in range(ss, se + 1)]
        eob_idx = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob_idx = i
        r = 0
        bw.pending = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob_idx:
                bw.emit_sym(ac_tab, 0xF0)
                r -= 16
                bw.flush_pending()
            if t > 1:  # history coefficient: buffer its correction bit
                bw.pending.append(t & p_mask)
                continue
            # newly significant
            bw.emit_sym(ac_tab, (r << 4) | 1)
            bw.write(1 if int(zz[bi, ss + i]) >= 0 else 0, 1)
            bw.flush_pending()
            r = 0
        if r > 0 or bw.pending:
            bw.emit_sym(ac_tab, 0x00)  # EOB, run of 1
            bw.flush_pending()


def _scan(marker_payload: bytes, body: bytes) -> bytes:
    return _seg(0xFFDA, marker_payload) + body


def _sa_stream(img: np.ndarray, quality: int, band_split: int = 5, ri: int = 0) -> bytes:
    """Full SOF2 JFIF stream using a 2-level SA ladder (Al=1 → Al=0)."""
    comps, (qt_l, qt_c) = _quantized_components(img, quality)
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    out += _seg(0xFFDB, b"\x00" + bytes(int(qt_l[z // 8, z % 8]) for z in _Z))
    out += _seg(0xFFDB, b"\x01" + bytes(int(qt_c[z // 8, z % 8]) for z in _Z))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)
    out += _seg(0xFFC2, sof)
    for tcth, spec in ((0x00, DC_LUMA_SPEC), (0x01, DC_CHROMA_SPEC),
                       (0x10, AC_LUMA_SPEC), (0x11, AC_CHROMA_SPEC)):
        bits, vals = spec
        out += _seg(0xFFC4, bytes([tcth]) + bytes(bits) + bytes(vals))

    dc_tabs = [_DCL, _DCC, _DCC]
    ac_tabs = [_ACL, _ACC, _ACC]
    if ri:
        out += _seg(0xFFDD, struct.pack(">H", ri))

    # scan 1: interleaved DC first, Al=1
    bw = _SAWriter()
    _encode_dc_first(bw, comps, dc_tabs, al=1, ri=ri)
    bw.flush()
    hdr = struct.pack(">B", 3)
    for cid, t in ((1, 0x00), (2, 0x11), (3, 0x11)):
        hdr += struct.pack(">BB", cid, t)
    out += _scan(hdr + bytes([0, 0, 0x01]), bytes(bw.buf))

    # AC first passes, two bands per component, Al=1
    for ci, (cid, ta) in enumerate(((1, 0x00), (2, 0x01), (3, 0x01))):
        for ss, se in ((1, band_split), (band_split + 1, 63)):
            bw = _SAWriter()
            _encode_ac_first(bw, comps[ci], ac_tabs[ci], ss, se, al=1, ri=ri)
            bw.flush()
            out += _scan(
                struct.pack(">BBB", 1, cid, ta) + bytes([ss, se, 0x01]),
                bytes(bw.buf),
            )

    # DC refinement, Ah=1 Al=0
    bw = _SAWriter()
    _encode_dc_refine(bw, comps, al=0, ri=ri)
    bw.flush()
    out += _scan(hdr + bytes([0, 0, 0x10]), bytes(bw.buf))

    # AC refinement passes, Ah=1 Al=0
    for ci, (cid, ta) in enumerate(((1, 0x00), (2, 0x01), (3, 0x01))):
        for ss, se in ((1, band_split), (band_split + 1, 63)):
            bw = _SAWriter()
            _encode_ac_refine(bw, comps[ci], ac_tabs[ci], ss, se, al=0, ri=ri)
            bw.flush()
            out += _scan(
                struct.pack(">BBB", 1, cid, ta) + bytes([ss, se, 0x10]),
                bytes(bw.buf),
            )
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("hw,quality,seed", [
    ((16, 16), 90, 1), ((24, 40), 75, 2), ((8, 8), 95, 3), ((17, 9), 85, 4),
])
def test_sa_stream_decodes_identical_to_spectral_only(hw, quality, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    expected = decode_jpeg(encode_jpeg(img, quality, progressive=True))
    got = decode_jpeg(_sa_stream(img, quality))
    np.testing.assert_array_equal(got, expected)


def test_sa_smooth_gradient():
    # smooth content → many zero/±1 AC coefficients → exercises the
    # newly-significant path and EOB tails heavily
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([(x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256],
                   axis=-1).astype(np.uint8)
    expected = decode_jpeg(encode_jpeg(img, 85, progressive=True))
    got = decode_jpeg(_sa_stream(img, 85))
    np.testing.assert_array_equal(got, expected)


def test_sa_flat_image():
    img = np.full((16, 24, 3), 130, dtype=np.uint8)
    expected = decode_jpeg(encode_jpeg(img, 85, progressive=True))
    got = decode_jpeg(_sa_stream(img, 85))
    np.testing.assert_array_equal(got, expected)


# ---------------------------------------------------------------------------
# progressive + 4:2:0 (r5): most real-world progressive JPEGs are
# subsampled; the twin encoder below emits an interleaved DC scan (4 Y +
# 1 Cb + 1 Cr blocks per MCU) and per-component AC scans over each
# component's own ceil-dims raster (T.81 A.2.2), indexed into the
# MCU-padded coefficient grid. Expected pixels come from the module's
# own BASELINE 420 stream of the same image: the coefficient math below
# replicates encode_jpeg's 420 branch exactly, so baseline and
# progressive decodes must agree bit-for-bit.
# ---------------------------------------------------------------------------

from trefoil_spark.functions.jpeg import _pad_to  # noqa: E402


def _coeffs_420(img, quality):
    """(Y, Cb, Cr) zigzag coefficient arrays in RASTER block order on the
    MCU-padded grids, matching encode_jpeg's 420 sampling math."""
    qt_l, qt_c = quality_tables(quality)
    ycc = rgb_to_ycbcr(img)
    h, w = img.shape[:2]
    mh, mw = -(-h // 16), -(-w // 16)
    ypl = _pad_to(ycc[..., 0], mh * 16, mw * 16)
    yb = (
        ypl.reshape(mh * 2, 8, mw * 2, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )

    def half(chan):
        p = _pad_to(chan, -(-h // 2) * 2, -(-w // 2) * 2)
        q = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        return _pad_to(q, mh * 8, mw * 8)

    out = [_fdct_quant(yb, qt_l)[:, _Z // 8, _Z % 8].astype(np.int64)]
    for ch in (1, 2):
        cpl = half(ycc[..., ch])
        cb = cpl.reshape(mh, 8, mw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        out.append(_fdct_quant(cb, qt_c)[:, _Z // 8, _Z % 8].astype(np.int64))
    return out, (qt_l, qt_c), (mh, mw)


def _encode_dc_first_mcu(bw, comps, dc_tabs, samp, mh, mw, al):
    """Interleaved DC first pass in MCU order with hi×vi blocks/comp."""
    preds = [0] * len(comps)
    for my in range(mh):
        for mx in range(mw):
            for ci, zz in enumerate(comps):
                hi, vi = samp[ci]
                bw_c = mw * hi
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * bw_c + mx * hi + bx
                        v = int(zz[bi, 0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        size, bits = _magnitude(diff)
                        bw.emit_sym(dc_tabs[ci], size)
                        if size:
                            bw.write(bits, size)


def _encode_dc_refine_mcu(bw, comps, samp, mh, mw, al):
    for my in range(mh):
        for mx in range(mw):
            for ci, zz in enumerate(comps):
                hi, vi = samp[ci]
                bw_c = mw * hi
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * bw_c + mx * hi + bx
                        bw.write((int(zz[bi, 0]) >> al) & 1, 1)


def _raster_indices(nh, nw, bw_c):
    return [r * bw_c + c for r in range(nh) for c in range(nw)]


def _sa_stream_420(img: np.ndarray, quality: int) -> bytes:
    comps, (qt_l, qt_c), (mh, mw) = _coeffs_420(img, quality)
    h, w = img.shape[:2]
    samp = [(2, 2), (1, 1), (1, 1)]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    out += _seg(0xFFDB, b"\x00" + bytes(int(qt_l[z // 8, z % 8]) for z in _Z))
    out += _seg(0xFFDB, b"\x01" + bytes(int(qt_c[z // 8, z % 8]) for z in _Z))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for (cid, tq), (hi, vi) in zip(((1, 0), (2, 1), (3, 1)), samp):
        sof += struct.pack(">BBB", cid, (hi << 4) | vi, tq)
    out += _seg(0xFFC2, sof)
    for tcth, spec in ((0x00, DC_LUMA_SPEC), (0x01, DC_CHROMA_SPEC),
                      (0x10, AC_LUMA_SPEC), (0x11, AC_CHROMA_SPEC)):
        bits, vals = spec
        out += _seg(0xFFC4, bytes([tcth]) + bytes(bits) + bytes(vals))

    dc_tabs = [_DCL, _DCC, _DCC]
    ac_tabs = [_ACL, _ACC, _ACC]
    hdr = struct.pack(">B", 3)
    for cid, t in ((1, 0x00), (2, 0x11), (3, 0x11)):
        hdr += struct.pack(">BB", cid, t)

    # interleaved DC first (Al=1), then per-comp AC first (Al=1),
    # then DC refine + AC refine down to Al=0
    bwr = _SAWriter()
    _encode_dc_first_mcu(bwr, comps, dc_tabs, samp, mh, mw, al=1)
    bwr.flush()
    out += _scan(hdr + bytes([0, 0, 0x01]), bytes(bwr.buf))

    # per-component non-interleaved dims: Y real dims == padded MCU dims
    # only when h,w are multiples of 16 — use ceil dims per T.81 A.2.2
    dims = [((-(-h // 8)), (-(-w // 8)), mw * 2),
            ((-(-h // 16)), (-(-w // 16)), mw),
            ((-(-h // 16)), (-(-w // 16)), mw)]
    for ci, (cid, ta) in enumerate(((1, 0x00), (2, 0x01), (3, 0x01))):
        nh, nw, bw_c = dims[ci]
        sub = comps[ci][_raster_indices(nh, nw, bw_c)]
        bwr = _SAWriter()
        _encode_ac_first(bwr, sub, ac_tabs[ci], 1, 63, al=1)
        bwr.flush()
        out += _scan(struct.pack(">BBB", 1, cid, ta) + bytes([1, 63, 0x01]),
                     bytes(bwr.buf))

    bwr = _SAWriter()
    _encode_dc_refine_mcu(bwr, comps, samp, mh, mw, al=0)
    bwr.flush()
    out += _scan(hdr + bytes([0, 0, 0x10]), bytes(bwr.buf))

    for ci, (cid, ta) in enumerate(((1, 0x00), (2, 0x01), (3, 0x01))):
        nh, nw, bw_c = dims[ci]
        sub = comps[ci][_raster_indices(nh, nw, bw_c)]
        bwr = _SAWriter()
        _encode_ac_refine(bwr, sub, ac_tabs[ci], 1, 63, al=0)
        bwr.flush()
        out += _scan(struct.pack(">BBB", 1, cid, ta) + bytes([1, 63, 0x10]),
                     bytes(bwr.buf))
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("hw,quality,seed", [
    ((32, 32), 90, 11), ((24, 40), 80, 12), ((17, 23), 85, 13),
])
def test_progressive_420_sa_matches_baseline_420(hw, quality, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    expected = decode_jpeg(encode_jpeg(img, quality, subsampling="420"))
    got = decode_jpeg(_sa_stream_420(img, quality))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("ri", [1, 3])
def test_progressive_sa_with_restart_markers(ri):
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    expected = decode_jpeg(encode_jpeg(img, 85, progressive=True))
    got = decode_jpeg(_sa_stream(img, 85, ri=ri))
    np.testing.assert_array_equal(got, expected)
