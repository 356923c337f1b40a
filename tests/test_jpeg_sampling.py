"""Foreign chroma-sampling decode (r5): 4:2:2 (2×1) and 4:4:0 (1×2) —
camera-typical layouts this repo's encoder never emits. Twin discipline:
the streams are hand-assembled here (baseline interleaved MCU walk AND
progressive per-component scans, per T.81 A.2), and the decoder's output
is checked two ways: baseline-decode ≡ progressive-decode (two
independent scan-walker code paths must agree coefficient-exactly), and
both ≡ an expected-pixels computation done with plain numpy here."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from trefoil_spark.functions.jpeg import (
    _C,
    _Z,
    AC_CHROMA_SPEC,
    AC_LUMA_SPEC,
    DC_CHROMA_SPEC,
    DC_LUMA_SPEC,
    _BitWriter,
    _build_codes,
    _encode_block,
    _fdct_quant,
    _pad_to,
    _seg,
    decode_jpeg,
    quality_tables,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)

_DCL, _DCC = _build_codes(DC_LUMA_SPEC), _build_codes(DC_CHROMA_SPEC)
_ACL, _ACC = _build_codes(AC_LUMA_SPEC), _build_codes(AC_CHROMA_SPEC)


def _raster_blocks(plane: np.ndarray) -> np.ndarray:
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _coeffs_sampled(img, quality, samp):
    """Per-component zigzag coefficient arrays (raster block order on the
    MCU-padded grid) for arbitrary luma sampling (hy, vy) with 1×1
    chroma: chroma is box-averaged by the sampling ratio."""
    (hy, vy) = samp
    qt_l, qt_c = quality_tables(quality)
    ycc = rgb_to_ycbcr(img)
    h, w = img.shape[:2]
    mpx, mpy = 8 * hy, 8 * vy  # MCU pixel size
    mw, mh = -(-w // mpx), -(-h // mpy)
    ypl = _pad_to(ycc[..., 0], mh * mpy, mw * mpx)
    comps = [_fdct_quant(_raster_blocks(ypl), qt_l)[:, _Z // 8, _Z % 8]]

    def down(chan):
        p = _pad_to(chan, -(-h // vy) * vy, -(-w // hy) * hy)
        acc = np.zeros((p.shape[0] // vy, p.shape[1] // hy))
        for dy in range(vy):
            for dx in range(hy):
                acc += p[dy::vy, dx::hy]
        return _pad_to(acc / (vy * hy), mh * 8, mw * 8)

    for ch in (1, 2):
        comps.append(
            _fdct_quant(_raster_blocks(down(ycc[..., ch])), qt_c)[:, _Z // 8, _Z % 8]
        )
    return [c.astype(np.int64) for c in comps], (qt_l, qt_c), (mh, mw)


def _headers(h, w, samp, qt_l, qt_c, sof_marker):
    hy, vy = samp
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    out += _seg(0xFFDB, b"\x00" + bytes(int(qt_l[z // 8, z % 8]) for z in _Z))
    out += _seg(0xFFDB, b"\x01" + bytes(int(qt_c[z // 8, z % 8]) for z in _Z))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq, (hi, vi) in ((1, 0, (hy, vy)), (2, 1, (1, 1)), (3, 1, (1, 1))):
        sof += struct.pack(">BBB", cid, (hi << 4) | vi, tq)
    out += _seg(sof_marker, sof)
    for tcth, spec in ((0x00, DC_LUMA_SPEC), (0x01, DC_CHROMA_SPEC),
                      (0x10, AC_LUMA_SPEC), (0x11, AC_CHROMA_SPEC)):
        bits, vals = spec
        out += _seg(0xFFC4, bytes([tcth]) + bytes(bits) + bytes(vals))
    return out


def _baseline_stream(img, quality, samp):
    comps, (qt_l, qt_c), (mh, mw) = _coeffs_sampled(img, quality, samp)
    hy, vy = samp
    h, w = img.shape[:2]
    out = _headers(h, w, samp, qt_l, qt_c, 0xFFC0)
    sos = struct.pack(">B", 3)
    for cid, tabs_b in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tabs_b)
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)
    bw = _BitWriter()
    preds = [0, 0, 0]
    tabs = [(_DCL, _ACL), (_DCC, _ACC), (_DCC, _ACC)]
    geo = [(hy, vy, mw * hy), ((1, 1, mw))[0:0] or (1, 1, mw), (1, 1, mw)]
    for my in range(mh):
        for mx in range(mw):
            for ci in range(3):
                hi, vi, bw_c = geo[ci]
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * bw_c + mx * hi + bx
                        preds[ci] = _encode_block(
                            bw, comps[ci][bi], preds[ci], tabs[ci][0], tabs[ci][1]
                        )
    bw.flush()
    out += bytes(bw.buf) + b"\xff\xd9"
    return bytes(out), comps, (qt_l, qt_c), (mh, mw)


def _progressive_stream(img, quality, samp):
    """Spectral-selection only (Ah=Al=0): interleaved DC + per-comp AC."""
    comps, (qt_l, qt_c), (mh, mw) = _coeffs_sampled(img, quality, samp)
    from test_jpeg_progressive_sa import (  # the SA twin helpers
        _SAWriter,
        _encode_ac_first,
        _encode_dc_first_mcu,
    )
    hy, vy = samp
    h, w = img.shape[:2]
    out = _headers(h, w, samp, qt_l, qt_c, 0xFFC2)
    hdr = struct.pack(">B", 3)
    for cid, t in ((1, 0x00), (2, 0x11), (3, 0x11)):
        hdr += struct.pack(">BB", cid, t)
    sw = _SAWriter()
    _encode_dc_first_mcu(sw, comps, [_DCL, _DCC, _DCC],
                         [(hy, vy), (1, 1), (1, 1)], mh, mw, al=0)
    sw.flush()
    out += _seg(0xFFDA, hdr + bytes([0, 0, 0])) + bytes(sw.buf)
    # per-component AC over each component's own ceil dims (A.2.2)
    dims = [((-(-h // 8)), (-(-w // 8)), mw * hy),
            ((-(-h // (8 * vy))), (-(-w // (8 * hy))), mw),
            ((-(-h // (8 * vy))), (-(-w // (8 * hy))), mw)]
    ac_tabs = [_ACL, _ACC, _ACC]
    for ci, (cid, ta) in enumerate(((1, 0x00), (2, 0x01), (3, 0x01))):
        nh, nw, bw_c = dims[ci]
        idx = [r * bw_c + c for r in range(nh) for c in range(nw)]
        sw = _SAWriter()
        _encode_ac_first(sw, comps[ci][idx], ac_tabs[ci], 1, 63, al=0)
        sw.flush()
        out += _seg(0xFFDA, struct.pack(">BBB", 1, cid, ta) + bytes([1, 63, 0]))
        out += bytes(sw.buf)
    return bytes(out) + b"\xff\xd9"


def _expected_pixels(comps, qts, samp, mh, mw, h, w):
    """Independent dequant + IDCT + replicate-upsample + color convert."""
    hy, vy = samp
    qt_l, qt_c = qts
    chans = []
    for ci, (zz, qt, (hi, vi)) in enumerate(
        zip(comps, (qt_l, qt_c, qt_c), ((hy, vy), (1, 1), (1, 1)))
    ):
        blk = np.zeros((zz.shape[0], 8, 8))
        blk[:, _Z // 8, _Z % 8] = zz * qt[_Z // 8, _Z % 8]
        px = np.einsum("ji,njk,kl->nil", _C, blk, _C) + 128.0
        bh_c, bw_c = mh * vi, mw * hi
        full = (
            px.reshape(bh_c, bw_c, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh_c * 8, bw_c * 8)
        )
        if (hi, vi) != (hy, vy):
            full = np.repeat(np.repeat(full, vy // vi, axis=0), hy // hi, axis=1)
        chans.append(full[:h, :w])
    return ycbcr_to_rgb(np.stack(chans, axis=-1))


@pytest.mark.parametrize("samp", [(2, 1), (1, 2)])
@pytest.mark.parametrize("hw", [(32, 32), (19, 27)])
def test_422_and_440_baseline_vs_progressive_vs_numpy(samp, hw):
    rng = np.random.default_rng(samp[0] * 10 + samp[1] + hw[0])
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
    base, comps, qts, (mh, mw) = _baseline_stream(img, 88, samp)
    prog = _progressive_stream(img, 88, samp)
    got_b = decode_jpeg(base)
    got_p = decode_jpeg(prog)
    np.testing.assert_array_equal(got_b, got_p)
    exp = _expected_pixels(comps, qts, samp, mh, mw, *hw)
    np.testing.assert_array_equal(got_b, exp)


def test_fractional_sampling_rejected():
    # hmax=3, hi=2 → 3/2 replicate factor is not integral: must raise
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    comps, (qt_l, qt_c), _ = _coeffs_sampled(img, 85, (2, 1))
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, b"\x00" + bytes(int(qt_l[z // 8, z % 8]) for z in _Z))
    sof = struct.pack(">BHHB", 8, 8, 8, 2)
    sof += struct.pack(">BBB", 1, 0x31, 0)  # 3x1 luma
    sof += struct.pack(">BBB", 2, 0x21, 0)  # 2x1 chroma → 3/2 ratio
    out += _seg(0xFFC0, sof)
    bits, vals = DC_LUMA_SPEC
    out += _seg(0xFFC4, b"\x00" + bytes(bits) + bytes(vals))
    bits, vals = AC_LUMA_SPEC
    out += _seg(0xFFC4, b"\x10" + bytes(bits) + bytes(vals))
    sos = struct.pack(">B", 2) + struct.pack(">BB", 1, 0) + struct.pack(">BB", 2, 0)
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos) + b"\x00" * 64 + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="fractional"):
        decode_jpeg(bytes(out))
