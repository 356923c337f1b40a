"""Adobe APP14 color-transform decode (r6): 4-component CMYK and YCCK
plus Adobe-declared plain RGB — print-workflow layouts this repo's
encoder never emits. Twin discipline (as test_jpeg_sampling.py): the
streams are hand-assembled here per T.81 A.2 with an APP14 segment, and
the expected pixels are computed independently with plain numpy from
the quantized coefficients and the public Adobe conventions (stored
byte = 255 - ink; YCCK YCbCr-codes the complement of the stored CMY),
never from the decoder's own color stage."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from trefoil_spark.functions.jpeg import (
    _C,
    _Z,
    AC_LUMA_SPEC,
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
)

_DCL, _ACL = _build_codes(DC_LUMA_SPEC), _build_codes(AC_LUMA_SPEC)


def _raster_blocks(plane: np.ndarray) -> np.ndarray:
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _app14(transform: int) -> bytes:
    return _seg(
        0xFFEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform)
    )


def _assemble(planes: list[np.ndarray], quality: int, transform: int | None):
    """Hand-build a baseline interleaved stream: N components, all 1x1
    sampling, one shared (luma) quant + Huffman table set. Returns the
    bytes and each component's quantized zigzag coefficients."""
    h, w = planes[0].shape
    qt_l, _ = quality_tables(quality)
    mh, mw = -(-h // 8), -(-w // 8)
    comps = [
        _fdct_quant(
            _raster_blocks(_pad_to(p.astype(np.float64), mh * 8, mw * 8)), qt_l
        )[:, _Z // 8, _Z % 8].astype(np.int64)
        for p in planes
    ]
    out = bytearray(b"\xff\xd8")
    if transform is not None:
        out += _app14(transform)
    out += _seg(0xFFDB, b"\x00" + bytes(int(qt_l[z // 8, z % 8]) for z in _Z))
    n = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, n)
    for cid in range(1, n + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)
    out += _seg(0xFFC0, sof)
    for tcth, spec in ((0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)):
        bits, vals = spec
        out += _seg(0xFFC4, bytes([tcth]) + bytes(bits) + bytes(vals))
    sos = struct.pack(">B", n)
    for cid in range(1, n + 1):
        sos += struct.pack(">BB", cid, 0x00)
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)
    bw = _BitWriter()
    preds = [0] * n
    for bi in range(mh * mw):
        for ci in range(n):
            preds[ci] = _encode_block(bw, comps[ci][bi], preds[ci], _DCL, _ACL)
    bw.flush()
    out += bytes(bw.buf) + b"\xff\xd9"
    return bytes(out), comps, qt_l, (mh, mw)


def _reconstruct(comps, qt, mh, mw, h, w):
    """Independent dequant + IDCT: the planes the decoder must have
    produced before its color stage (float, unclipped)."""
    chans = []
    for zz in comps:
        blk = np.zeros((zz.shape[0], 8, 8))
        blk[:, _Z // 8, _Z % 8] = zz * qt[_Z // 8, _Z % 8]
        px = np.einsum("ji,njk,kl->nil", _C, blk, _C) + 128.0
        chans.append(
            px.reshape(mh, mw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(mh * 8, mw * 8)[:h, :w]
        )
    return chans


@pytest.mark.parametrize("hw", [(16, 16), (11, 21)])
def test_adobe_cmyk_transform0(hw):
    """transform 0: the four planes are stored (inverted-ink) CMYK;
    display RGB is channel * K / 255 on the stored values."""
    h, w = hw
    rng = np.random.default_rng(61)
    stored = rng.integers(0, 256, (h, w, 4)).astype(np.float64)
    data, comps, qt, (mh, mw) = _assemble(
        [stored[..., i] for i in range(4)], 92, transform=0
    )
    got = decode_jpeg(data)
    c, m, y, k = _reconstruct(comps, qt, mh, mw, h, w)
    cmy = np.clip(np.stack([c, m, y], axis=-1), 0.0, 255.0)
    kk = np.clip(k, 0.0, 255.0)[..., None]
    want = np.clip(np.rint(cmy * kk / 255.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_adobe_cmyk_no_marker_defaults_to_transform0():
    """4 components without an APP14 segment decode as inverted CMYK."""
    h = w = 16
    rng = np.random.default_rng(62)
    stored = rng.integers(0, 256, (h, w, 4)).astype(np.float64)
    data, comps, qt, (mh, mw) = _assemble(
        [stored[..., i] for i in range(4)], 92, transform=None
    )
    got = decode_jpeg(data)
    c, m, y, k = _reconstruct(comps, qt, mh, mw, h, w)
    cmy = np.clip(np.stack([c, m, y], axis=-1), 0.0, 255.0)
    kk = np.clip(k, 0.0, 255.0)[..., None]
    want = np.clip(np.rint(cmy * kk / 255.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("hw", [(16, 16), (13, 18)])
def test_adobe_ycck_transform2(hw):
    """transform 2: channels 0-2 YCbCr-code the COMPLEMENT of the stored
    (inverted) CMY; K is stored directly. Forward twin: complement the
    stored CMY, run it through this module's rgb_to_ycbcr, encode those
    planes. Expected pixels re-derive the inverse by hand (the exact
    BT.601 inverse matrix, not _color_out)."""
    h, w = hw
    rng = np.random.default_rng(63)
    stored = rng.integers(0, 256, (h, w, 4)).astype(np.float64)
    ycc = rgb_to_ycbcr(255.0 - stored[..., :3])
    planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2], stored[..., 3]]
    data, comps, qt, (mh, mw) = _assemble(planes, 95, transform=2)
    got = decode_jpeg(data)
    y, cb, cr, k = _reconstruct(comps, qt, mh, mw, h, w)
    c = 255.0 - (y + 1.402 * (cr - 128.0))
    m = 255.0 - (y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
    ye = 255.0 - (y + 1.772 * (cb - 128.0))
    cmy = np.clip(np.stack([c, m, ye], axis=-1), 0.0, 255.0)
    kk = np.clip(k, 0.0, 255.0)[..., None]
    want = np.clip(np.rint(cmy * kk / 255.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)
    # sanity on the convention itself: zero ink everywhere decodes white
    white = np.zeros((8, 8, 4))  # ink 0 -> stored bytes 255
    white[:] = 0.0
    stored_w = 255.0 - white
    ycc_w = rgb_to_ycbcr(255.0 - stored_w[..., :3])
    data_w, *_ = _assemble(
        [ycc_w[..., 0], ycc_w[..., 1], ycc_w[..., 2], stored_w[..., 3]],
        95,
        transform=2,
    )
    got_w = decode_jpeg(data_w)
    assert got_w.min() >= 250  # white up to quantization error


def test_adobe_rgb_transform0_3comp():
    """3 components with transform 0: planes are RGB directly (no YCbCr
    inverse is applied)."""
    h = w = 16
    rng = np.random.default_rng(64)
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    data, comps, qt, (mh, mw) = _assemble(
        [rgb[..., i] for i in range(3)], 92, transform=0
    )
    got = decode_jpeg(data)
    chans = _reconstruct(comps, qt, mh, mw, h, w)
    want = np.clip(np.rint(np.stack(chans, axis=-1)), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_adobe_bad_transform_combinations_raise():
    rng = np.random.default_rng(65)
    p3 = [rng.integers(0, 256, (8, 8)).astype(np.float64) for _ in range(3)]
    data3, *_ = _assemble(p3, 90, transform=2)
    with pytest.raises(ValueError, match="Adobe transform"):
        decode_jpeg(data3)
    p4 = [rng.integers(0, 256, (8, 8)).astype(np.float64) for _ in range(4)]
    data4, *_ = _assemble(p4, 90, transform=1)
    with pytest.raises(ValueError, match="Adobe transform"):
        decode_jpeg(data4)
