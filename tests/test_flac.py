"""FLAC codec tests.

Foreign-fixture discipline: beyond own-encoder round trips, frames are
hand-built bit-by-bit from RFC 9639 with an in-test independent
bit-writer and spec-literal CRC twins — never by the module under test —
and expected samples are recomputed with independent plain-Python
prediction recursions (VERBATIM / LPC / Rice partitions / escapes /
wasted bits / left/side / right/side / odd bit depths / every
block-size code family / multi-byte UTF-8 frame numbers).
"""

import struct

import numpy as np
import pytest

from trefoil_spark.functions.flac import decode_flac, encode_flac


# ---------------------------------------------------- independent twins
def t_crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def t_crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class W:
    """In-test MSB-first bit writer (independent of the module's)."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def signed(self, v, n):
        return self.w(v & ((1 << n) - 1), n)

    def unary(self, q):
        self.bits.extend([0] * q + [1])
        return self

    def rice(self, v, param):
        zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
        self.unary(zz >> param)
        return self.w(zz & ((1 << param) - 1), param)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return self

    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def streaminfo(rate, channels, bps, total, min_bs=16, max_bs=65535):
    w = W()
    w.w(min_bs, 16).w(max_bs, 16).w(0, 24).w(0, 24)
    w.w(rate, 20).w(channels - 1, 3).w(bps - 1, 5).w(total, 36)
    body = w.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def frame_header(
    w: W, bs_code, sr_code, ch_code, ss_code, frame_no=0, tail_bits=()
):
    w.w(0x3FFE, 14).w(0, 1).w(0, 1)
    w.w(bs_code, 4).w(sr_code, 4).w(ch_code, 4).w(ss_code, 3).w(0, 1)
    if frame_no < 0x80:
        w.w(frame_no, 8)
    else:  # 2-byte UTF-8 form
        w.w(0xC0 | (frame_no >> 6), 8).w(0x80 | (frame_no & 0x3F), 8)
    for v, n in tail_bits:
        w.w(v, n)
    hdr = w.align().bytes()
    w2 = W()
    for b in hdr:
        w2.w(b, 8)
    w2.w(t_crc8(hdr), 8)
    return w2


def finish_frame(w: W) -> bytes:
    frame = w.align().bytes()
    return frame + struct.pack(">H", t_crc16(frame))


# ------------------------------------------------------- round trips
def test_roundtrip_mono_16bit():
    rng = np.random.default_rng(7)
    s = rng.integers(-3000, 3000, 10000, dtype=np.int64)
    s = np.cumsum(s) % 30000 - 15000  # smooth-ish, exercises FIXED
    out, rate = decode_flac(encode_flac(s, 44100), verify_md5=True)
    assert rate == 44100
    assert np.array_equal(out[:, 0], s)


def test_roundtrip_stereo_independent_and_midside():
    rng = np.random.default_rng(8)
    base = np.cumsum(rng.integers(-500, 500, 9000)).astype(np.int64)
    st = np.stack([base % 20000 - 10000, (base // 3) % 20000 - 10000], -1)
    for ms in (False, True):
        out, rate = decode_flac(
            encode_flac(st, 48000, mid_side=ms), verify_md5=True
        )
        assert np.array_equal(out, st), f"mid_side={ms}"


def test_roundtrip_8_and_24_bit():
    rng = np.random.default_rng(9)
    s8 = rng.integers(-128, 128, 3000, dtype=np.int64)
    out, _ = decode_flac(encode_flac(s8, 8000, bps=8), verify_md5=True)
    assert np.array_equal(out[:, 0], s8)
    s24 = rng.integers(-(1 << 23), 1 << 23, 3000, dtype=np.int64)
    out, _ = decode_flac(encode_flac(s24, 96000, bps=24), verify_md5=True)
    assert np.array_equal(out[:, 0], s24)


def test_roundtrip_constant_and_multiframe():
    s = np.concatenate([np.full(4096, 123), np.full(4096, -7),
                        np.arange(500)]).astype(np.int64)
    out, _ = decode_flac(encode_flac(s, 16000), verify_md5=True)
    assert np.array_equal(out[:, 0], s)


def test_md5_mismatch_detected():
    s = np.arange(1000, dtype=np.int64)
    enc = bytearray(encode_flac(s, 16000))
    enc[30] ^= 0xFF  # corrupt a byte inside the STREAMINFO MD5 field
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc), verify_md5=True)


# ------------------------------------------- foreign hand-built frames
def test_foreign_verbatim_subframe():
    samples = [100, -100, 32000, -32768, 0, 1, -1, 17]
    w = frame_header(W(), 6, 0, 0, 4, tail_bits=[(len(samples) - 1, 8)])
    w.w(0, 1).w(1, 6).w(0, 1)  # VERBATIM
    for v in samples:
        w.signed(v, 16)
    data = streaminfo(8000, 1, 16, len(samples)) + finish_frame(w)
    out, rate = decode_flac(data)
    assert rate == 8000
    assert out[:, 0].tolist() == samples


def test_foreign_lpc_subframe_with_partitions():
    # order-2 LPC: coef=[3,-1], shift=1 -> s[i] = res[i] + ((3*s[i-1]
    # - s[i-2]) >> 1); 16 samples, partition order 1 (2 partitions)
    warm = [10, 12]
    res = [1, -2, 3, 0, 1, -1, 2, 0, -3, 1, 0, 2, -1, 1]
    want = list(warm)
    for r in res:
        pred = (3 * want[-1] - 1 * want[-2]) >> 1
        want.append(r + pred)
    w = frame_header(W(), 6, 0, 0, 4, tail_bits=[(15, 8)])  # bs=16
    w.w(0, 1).w(32 + 1, 6).w(0, 1)  # LPC order 2 (type 100001)
    w.signed(warm[0], 16).signed(warm[1], 16)
    w.w(4, 4)  # precision-1=4 -> 5 bits
    w.signed(1, 5)  # shift
    w.signed(3, 5).signed(-1, 5)
    w.w(0, 2).w(1, 4)  # method 0, partition order 1
    w.w(2, 4)  # partition 1: rice param 2, (16>>1)-2 = 6 samples
    for v in res[:6]:
        w.rice(v, 2)
    w.w(3, 4)  # partition 2: rice param 3, 8 samples
    for v in res[6:]:
        w.rice(v, 3)
    data = streaminfo(16000, 1, 16, 16) + finish_frame(w)
    out, _ = decode_flac(data)
    assert out[:, 0].tolist() == want


def test_foreign_rice2_and_escape_partitions():
    # method 1 (5-bit params), partition order 1; partition 1 escapes to
    # 7-bit raw, partition 2 escapes to 0 raw bits (all-zero)
    raws = [5, -60, 33, -1]
    w = frame_header(W(), 6, 0, 0, 4, tail_bits=[(7, 8)])  # bs=8
    w.w(0, 1).w(8, 6).w(0, 1)  # FIXED order 0
    w.w(1, 2).w(1, 4)  # method 1, porder 1
    w.w(31, 5).w(7, 5)  # escape, 7-bit raw
    for v in raws:
        w.signed(v, 7)
    w.w(31, 5).w(0, 5)  # escape, 0 bits -> zeros
    data = streaminfo(8000, 1, 16, 8) + finish_frame(w)
    out, _ = decode_flac(data)
    assert out[:, 0].tolist() == raws + [0, 0, 0, 0]


def test_foreign_wasted_bits():
    # FIXED order 1, 2 wasted bits: decoded = reconstructed << 2
    w = frame_header(W(), 6, 0, 0, 4, tail_bits=[(3, 8)])  # bs=4
    w.w(0, 1).w(8 + 1, 6)  # FIXED order 1
    w.w(1, 1).unary(1)  # wasted-bits flag, unary 1 -> wasted = 2
    w.signed(25, 14)  # warmup at bps-2
    w.w(0, 2).w(0, 4).w(0, 4)  # rice param 0
    for v in (1, -1, 2):
        w.rice(v, 0)
    data = streaminfo(8000, 1, 16, 4) + finish_frame(w)
    out, _ = decode_flac(data)
    assert out[:, 0].tolist() == [100, 104, 100, 108]


def test_foreign_left_side_and_right_side():
    left = [100, 102, 104, 98]
    right = [90, 95, 100, 96]
    side = [l - r for l, r in zip(left, right)]

    def verbatim(w, vals, bits):
        w.w(0, 1).w(1, 6).w(0, 1)
        for v in vals:
            w.signed(v, bits)

    # left/side (ch_code 8)
    w = frame_header(W(), 6, 0, 8, 4, tail_bits=[(3, 8)])
    verbatim(w, left, 16)
    verbatim(w, side, 17)
    data = streaminfo(8000, 2, 16, 4) + finish_frame(w)
    out, _ = decode_flac(data)
    assert out[:, 0].tolist() == left and out[:, 1].tolist() == right

    # right/side (ch_code 9): side first, then right
    w = frame_header(W(), 6, 0, 9, 4, tail_bits=[(3, 8)])
    verbatim(w, side, 17)
    verbatim(w, right, 16)
    data = streaminfo(8000, 2, 16, 4) + finish_frame(w)
    out, _ = decode_flac(data)
    assert out[:, 0].tolist() == left and out[:, 1].tolist() == right


def test_foreign_midside_odd_sum():
    # l+r odd exercises the dropped-bit reconstruction
    left, right = [7, -3], [4, 2]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]
    w = frame_header(W(), 6, 0, 10, 4, tail_bits=[(1, 8)])
    for vals, bits in ((mid, 16), (side, 17)):
        w.w(0, 1).w(1, 6).w(0, 1)
        for v in vals:
            w.signed(v, bits)
    data = streaminfo(8000, 2, 16, 2) + finish_frame(w)
    out, _ = decode_flac(data)
    assert out[:, 0].tolist() == left and out[:, 1].tolist() == right


def test_foreign_blocksize_and_rate_codes():
    # table code 1 (192 samples), rate code 5 (16000); CONSTANT subframe
    w = frame_header(W(), 1, 5, 0, 4)
    w.w(0, 1).w(0, 6).w(0, 1).signed(-5, 16)
    data = streaminfo(16000, 1, 16, 192) + finish_frame(w)
    out, rate = decode_flac(data)
    assert rate == 16000
    assert len(out) == 192 and (out == -5).all()

    # 16-bit end-of-header code (7) with bs=777; rate code 14 (x10)
    w = frame_header(W(), 7, 14, 0, 4, tail_bits=[(776, 16), (2205, 16)])
    w.w(0, 1).w(0, 6).w(0, 1).signed(9, 16)
    data = streaminfo(22050, 1, 16, 777) + finish_frame(w)
    out, rate = decode_flac(data)
    assert rate == 22050 and len(out) == 777 and (out == 9).all()


def test_foreign_odd_bit_depths_and_utf8_frameno():
    # 12-bit samples (ss_code 2) and a 2-byte UTF-8 frame number
    w = frame_header(W(), 6, 0, 0, 2, frame_no=300, tail_bits=[(2, 8)])
    w.w(0, 1).w(1, 6).w(0, 1)
    for v in (2047, -2048, 0):
        w.signed(v, 12)
    data = streaminfo(8000, 1, 12, 3) + finish_frame(w)
    out, _ = decode_flac(data)
    assert out[:, 0].tolist() == [2047, -2048, 0]


def test_foreign_skips_other_metadata_blocks():
    # VORBIS_COMMENT (4) + PADDING (1) before a frame
    pad = bytes([1]) + (4).to_bytes(3, "big") + b"\x00" * 4
    vc = bytes([4]) + (6).to_bytes(3, "big") + b"\x00" * 6
    si = streaminfo(8000, 1, 16, 2)
    head = si[:4] + bytes([si[4] & 0x7F]) + si[5:]  # clear last-block flag
    w = frame_header(W(), 6, 0, 0, 4, tail_bits=[(1, 8)])
    w.w(0, 1).w(0, 6).w(0, 1).signed(42, 16)
    data = head + vc + pad[:1].replace(b"\x01", b"\x81") + pad[1:] \
        + finish_frame(w)
    out, _ = decode_flac(data)
    assert (out == 42).all()


# ----------------------------------------------------------- malformed
def test_malformed_inputs_raise_cleanly():
    s = np.arange(100, dtype=np.int64)
    good = encode_flac(s, 8000)
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF" + good[4:])
    # corrupt one byte inside the first frame -> CRC-16 mismatch
    bad = bytearray(good)
    bad[-10] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_flac(good[: len(good) - 5])


def test_header_crc8_detects_corruption():
    w = frame_header(W(), 6, 0, 0, 4, tail_bits=[(0, 8)])
    w.w(0, 1).w(0, 6).w(0, 1).signed(1, 16)
    data = bytearray(streaminfo(8000, 1, 16, 1) + finish_frame(w))
    si_len = len(streaminfo(8000, 1, 16, 1))
    data[si_len + 2] ^= 0x04  # flip a frame-header bit
    with pytest.raises(ValueError):
        decode_flac(bytes(data))
