"""FLAC codec — decoder (spec-complete for native streams) + encoder twin.

Public knowledge only: RFC 9639 (the FLAC format, IETF 2024) / the
xiph.org format spec. FLAC is fully algorithmic — unlike VP8 there are
NO normative constant tables beyond tiny code-point enums transcribed
below from the spec text, so this decoder is genuinely foreign-capable:
any native FLAC stream a real encoder (libFLAC, ffmpeg) emits within
the feature list decodes here.

Decoder coverage:
- fLaC marker + metadata blocks (STREAMINFO parsed; PADDING/SEEKTABLE/
  VORBIS_COMMENT/CUESHEET/PICTURE/APPLICATION skipped by length);
- frame headers: fixed & variable blocking strategy, UTF-8-coded
  frame/sample numbers, all block-size and sample-rate code points
  (incl. end-of-header 8/16-bit forms), sample sizes 8/12/16/20/24/32,
  CRC-8 header check and CRC-16 whole-frame check;
- channel assignments: 1-8 independent channels, left/side,
  right/side, mid/side stereo decorrelation (side channel +1 bit);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients + signed shift from the stream), wasted bits;
- residuals: 4-bit (method 0) and 5-bit (method 1) Rice parameters,
  partition orders 0-15, escape-to-raw partitions;
- optional MD5 verification against STREAMINFO.

Encoder twin (used by the multimodal audio path and the tests'
round-trip leg): fixed 4096-sample blocks, per-subframe best-of
CONSTANT / FIXED(0-4) selection by residual magnitude, Rice parameter
from the partition mean, independent or mid/side stereo, correct CRCs
and MD5. Reference context: trefoil delegates audio entirely to
external tooling; this module exists for the crawl-ingest envelope
(same role as functions/wav.py for RIFF payloads).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac"]


# ---------------------------------------------------------------- CRCs
def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x^1+x^0 (0x07), init 0 (RFC 9639 §9.2)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+x^0 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


# build 256-entry LUTs once — the bit-at-a-time loops above are the
# spec-literal definition; the tables make frame CRCs O(bytes)
_CRC8_LUT = bytes(_crc8(bytes([i])) for i in range(256))
_CRC16_LUT = [_crc16(bytes([i])) for i in range(256)]


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_LUT[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_LUT[(crc >> 8) ^ b] ^ ((crc << 8) & 0xFFFF)
    return crc


# ------------------------------------------------------------ bit I/O
class _MsbReader:
    """MSB-first bit reader with a bounded accumulator (the JPEG r5
    lesson: never let the accumulator grow with consumed-stream size)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # next byte index
        self.acc = 0
        self.nbits = 0

    def _refill(self, need: int) -> None:
        data, pos = self.data, self.pos
        acc, nbits = self.acc, self.nbits
        while nbits < need:
            if pos >= len(data):
                raise ValueError("truncated FLAC stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        self.acc, self.nbits, self.pos = acc, nbits, pos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._refill(n)
        self.nbits -= n
        v = self.acc >> self.nbits
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count 0 bits until the terminating 1."""
        q = 0
        while True:
            if self.nbits == 0:
                self._refill(8)
            # fast path: whole remaining accumulator is zero
            if self.acc == 0:
                q += self.nbits
                self.nbits = 0
                continue
            top = self.acc.bit_length()
            zeros = self.nbits - top
            q += zeros
            # consume the zeros and the 1 bit
            self.nbits = top - 1
            self.acc &= (1 << self.nbits) - 1
            return q

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def byte_pos(self) -> int:
        return self.pos - (self.nbits // 8)


class _MsbWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ------------------------------------------------------ frame decoding
# Spec code-point enums (RFC 9639 §9.1.1-9.1.4)
_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_utf8_coded(br: _MsbReader) -> int:
    """UTF-8-style variable-length coded frame/sample number (§9.1.5 —
    extended to 36 bits / 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0 or n > 6:
        raise ValueError("invalid UTF-8-coded number in frame header")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8-coded continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(br: _MsbReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition order does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out[idx : idx + n] = 0
            else:
                for i in range(n):
                    out[idx + i] = br.read_signed(raw)
        else:
            for i in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out[idx + i] = (v >> 1) ^ -(v & 1)  # zigzag
        idx += n
    return out


def _decode_subframe(br: _MsbReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("invalid subframe header padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            out[i] = br.read_signed(bps)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(order):
            out[i] = br.read_signed(bps)
        res = _decode_residual(br, blocksize, order)
        coef = _FIXED_COEF[order]
        if order == 0:
            out[:] = res
        else:
            for i in range(order, blocksize):
                pred = 0
                for j, c in enumerate(coef):
                    pred += c * out[i - 1 - j]
                out[i] = res[i - order] + pred
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(order):
            out[i] = br.read_signed(bps)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coef = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coef[j] * out[i - 1 - j]
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(data: bytes, verify_md5: bool = False):
    """Native FLAC bytes → ((n, channels) int32 samples, sample_rate).

    Raises ValueError on malformed input (bad marker, CRC mismatch,
    reserved code points, truncation)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC marker)")
    pos = 4
    si = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("truncated metadata block")
        if btype == 0:  # STREAMINFO
            br = _MsbReader(body)
            si = {
                "min_bs": br.read(16), "max_bs": br.read(16),
                "min_fs": br.read(24), "max_fs": br.read(24),
                "rate": br.read(20),
                "channels": br.read(3) + 1,
                "bps": br.read(5) + 1,
                "total": br.read(36),
                "md5": body[18:34],
            }
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
    if si is None:
        raise ValueError("missing STREAMINFO")

    chans: list[np.ndarray] = [np.empty(0, dtype=np.int64)
                               for _ in range(si["channels"])]
    parts: list[list[np.ndarray]] = [[] for _ in range(si["channels"])]
    rate = si["rate"]
    while pos < len(data):
        frame_start = pos
        br = _MsbReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {pos}")
        if br.read(1):
            raise ValueError("reserved bit set in frame header")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved bit set in frame header")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if sr_code == 0:
            frate = si["rate"]
        elif sr_code in _RATES:
            frate = _RATES[sr_code]
        elif sr_code == 12:
            frate = br.read(8) * 1000
        elif sr_code == 13:
            frate = br.read(16)
        elif sr_code == 14:
            frate = br.read(16) * 10
        else:
            raise ValueError("invalid sample rate code 15")
        rate = frate
        if ss_code == 0:
            bps = si["bps"]
        elif ss_code == 3:
            raise ValueError("reserved sample size code 3")
        else:
            bps = _SAMPLE_SIZE[ss_code]
        hdr_end = br.byte_pos()
        if crc8(data[frame_start:hdr_end]) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            if nch != si["channels"]:
                raise ValueError("frame channel count != STREAMINFO")
            sub = [
                _decode_subframe(br, blocksize, bps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            if si["channels"] != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                sub = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, blocksize, bps + 1)
                right = _decode_subframe(br, blocksize, bps)
                sub = [right + side, right]
            else:  # mid/side
                mid = _decode_subframe(br, blocksize, bps)
                side = _decode_subframe(br, blocksize, bps + 1)
                # spec: mid = (l+r)>>1, side = l-r; l+r and l-r share
                # parity, so the dropped low bit of l+r is side&1
                left = ((mid << 1) + (side & 1) + side) >> 1
                sub = [left, left - side]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        crc_end = br.byte_pos()
        if crc_end + 2 > len(data):
            raise ValueError("truncated FLAC stream (missing frame CRC)")
        got = struct.unpack(">H", data[crc_end : crc_end + 2])[0]
        if crc16(data[frame_start:crc_end]) != got:
            raise ValueError("frame CRC-16 mismatch")
        pos = crc_end + 2
        for c in range(si["channels"]):
            parts[c].append(sub[c])

    chans = [np.concatenate(p) if p else np.empty(0, np.int64) for p in parts]
    n = min(len(c) for c in chans)
    if si["total"]:
        n = min(n, si["total"])
    out = np.stack([c[:n] for c in chans], axis=-1).astype(np.int32)
    if verify_md5 and si["md5"] != b"\x00" * 16:
        if _samples_md5(out, si["bps"]) != si["md5"]:
            raise ValueError("MD5 mismatch: decoded samples differ")
    return out, rate


def _samples_md5(samples: np.ndarray, bps: int) -> bytes:
    """MD5 of the unencoded stream: interleaved, little-endian,
    ceil(bps/8) bytes per sample (§8.2)."""
    width = (bps + 7) // 8
    flat = samples.astype(np.int64).reshape(-1)
    if width == 1:
        raw = (flat & 0xFF).astype(np.uint8).tobytes()
    elif width == 2:
        raw = flat.astype("<i2").tobytes()
    elif width == 3:
        b = flat.astype("<i4").tobytes()
        raw = b"".join(b[i : i + 3] for i in range(0, len(b), 4))
    else:
        raw = flat.astype("<i4").tobytes()
    return hashlib.md5(raw).digest()


# ------------------------------------------------------------ encoder
def _best_rice_param(res: np.ndarray, pbits: int) -> int:
    """Rice parameter minimizing the coded size (scan — partitions are
    small, the scan is exact rather than the mean heuristic)."""
    zz = (np.abs(res.astype(np.int64)) << 1) - (res < 0)
    best_p, best_cost = 0, None
    for p in range((1 << pbits) - 1):
        cost = int((zz >> p).sum()) + len(zz) * (p + 1)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        if (zz >> p).max(initial=0) == 0 and p > 0:
            break
    return best_p


def _write_residual(bw: _MsbWriter, res: np.ndarray) -> None:
    """Method-0 Rice coding, partition order 0."""
    bw.write(0, 2)
    bw.write(0, 4)
    param = _best_rice_param(res, 4)
    bw.write(param, 4)
    for v in res:
        v = int(v)
        zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
        bw.write_unary(zz >> param)
        bw.write(zz & ((1 << param) - 1), param)


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _encode_subframe(bw: _MsbWriter, s: np.ndarray, bps: int) -> None:
    s = s.astype(np.int64)
    if len(s) and (s == s[0]).all():
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(s[0]), bps)
        return
    max_order = min(4, len(s) - 1)
    best_order, best_cost = 0, None
    for order in range(max_order + 1):
        res = _fixed_residual(s, order)
        zz = (np.abs(res) << 1)
        cost = int(np.log2(zz + 1).sum()) + order * bps
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for i in range(order):
        bw.write(int(s[i]), bps)
    _write_residual(bw, _fixed_residual(s, order))


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """(n,) or (n, channels) int samples → native FLAC bytes.

    CONSTANT/FIXED subframes with exact-scan Rice parameters — a
    conforming always-lossless encoder twin (LPC is a decoder-only
    feature here; FIXED already compresses the synthetic and speech-like
    signals this engine ships)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    if not 1 <= nch <= 8:
        raise ValueError(f"unsupported channel count {nch}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if s.min(initial=0) < lo or s.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bps}-bit range")

    out = bytearray(b"fLaC")
    si = _MsbWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + _samples_md5(s, bps)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    for fi, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bs = len(blk)
        bw = _MsbWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(7, 4)  # block size: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        use_ms = mid_side and nch == 2
        bw.write(10 if use_ms else nch - 1, 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)
        # UTF-8-coded frame number
        if fi < 0x80:
            bw.write(fi, 8)
        elif fi < 0x800:
            bw.write(0xC0 | (fi >> 6), 8)
            bw.write(0x80 | (fi & 0x3F), 8)
        else:
            bw.write(0xE0 | (fi >> 12), 8)
            bw.write(0x80 | ((fi >> 6) & 0x3F), 8)
            bw.write(0x80 | (fi & 0x3F), 8)
        bw.write(bs - 1, 16)
        hdr = bw.bytes()
        bw = _MsbWriter()
        for b in hdr:
            bw.write(b, 8)
        bw.write(crc8(hdr), 8)
        if use_ms:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            _encode_subframe(bw, (left + right) >> 1, bps)
            _encode_subframe(bw, left - right, bps + 1)
        else:
            for c in range(nch):
                _encode_subframe(bw, blk[:, c], bps)
        bw.align()
        frame = bw.bytes()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)
