"""WebP lossless (VP8L) encoder + decoder — pure python, from scratch.

Closes the final F11 format tail (reference `trefoil/cli/utilities.py:
16-34` saves `format='webp'` via PIL with ``lossless=True``). Implements
the public "WebP Lossless Bitstream Specification" (VP8L) subset:

- encoder (r4: size-competitive): RIFF/WEBP/VP8L container, LSB-first
  bit writer, no transforms, no color cache, single prefix-code group.
  Per-channel canonical HUFFMAN codes built from the image's actual
  symbol histograms (simple codes for 1-2 symbol channels, full
  code-length-code RLE emission otherwise) + greedy LZ77 backward
  references over the two distances that dominate raster tiles —
  1 (horizontal runs) and width (vertical copy) — with spec prefix
  coding of lengths/distances (distances always emitted as raw
  ``dist+120``, never 2D plane codes). Deterministic: Huffman ties
  break by symbol id. Still byte-exact lossless.
- decoder (r5: foreign-stream capable): simple AND normal prefix codes
  with full code-length-code decoding, max-symbol handling, LZ77 with
  raw distances AND 2D distance plane codes, color cache, meta prefix
  image, and all four transforms (predictor, cross-color,
  subtract-green, color-indexing with pixel bundling) — decodes
  libwebp-emitted files, not just this module's own encoder output.
  Malformed streams (overrunning back-references, code-length repeats
  past the alphabet) raise clean ValueErrors.
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are written (spec section 4.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _TokenStream:
    """(value, nbits) token accumulator with vectorized LSB-first
    bit-packing: tokens occupy disjoint bit ranges, so a 4-plane
    bitwise_or scatter assembles the byte array without a Python loop."""

    def __init__(self):
        self.vals: list[np.ndarray] = []
        self.bits: list[np.ndarray] = []

    def put(self, value: int, n: int):
        self.vals.append(np.array([value], dtype=np.int64))
        self.bits.append(np.array([n], dtype=np.int64))

    def put_arrays(self, vals: np.ndarray, bits: np.ndarray):
        self.vals.append(np.asarray(vals, dtype=np.int64))
        self.bits.append(np.asarray(bits, dtype=np.int64))

    def pack(self) -> bytes:
        vals = np.concatenate(self.vals)
        bits = np.concatenate(self.bits)
        keep = bits > 0
        vals, bits = vals[keep], bits[keep]
        end = np.cumsum(bits)
        start = end - bits
        total = int(end[-1]) if len(end) else 0
        nbytes = (total + 7) // 8
        out = np.zeros(nbytes + 4, dtype=np.uint8)
        byte_idx = (start // 8).astype(np.int64)
        shift = (start % 8).astype(np.int64)
        v = (vals & ((np.int64(1) << bits) - 1)).astype(np.int64) << shift
        for plane in range(5):  # nbits<=30 + shift<=7 → ≤ 37 bits ≤ 5 bytes
            np.bitwise_or.at(
                out, byte_idx + plane, ((v >> (8 * plane)) & 0xFF).astype(np.uint8)
            )
        return out[:nbytes].tobytes()


def _emit_prefix_code(ts: _TokenStream, freqs: np.ndarray):
    """Write one prefix-code description + return (rev_codes, lengths)
    lookup tables for emission. Simple codes for ≤2 live symbols, else a
    normal code via Huffman + code-length-code RLE with max-symbol cap."""
    from .webp_huffman import (
        CL_ORDER,
        canonical_codes,
        huffman_lengths,
        reversed_codes,
        rle_code_lengths,
    )

    alphabet = len(freqs)
    live = np.flatnonzero(freqs > 0)
    rev = np.zeros(alphabet, dtype=np.int64)
    lens = np.zeros(alphabet, dtype=np.int64)
    if len(live) == 0:
        live = np.array([0])
    if len(live) <= 2 and int(live[-1]) <= 255:
        # simple codes carry symbols in 8 bits — length symbols (≥256 in
        # the green alphabet) must take the normal-code path
        ts.put(1, 1)  # simple code
        ts.put(len(live) - 1, 1)
        s0 = int(live[0])
        if s0 <= 1 and len(live) == 1:
            ts.put(0, 1)  # first symbol in 1 bit
            ts.put(s0, 1)
        else:
            ts.put(1, 1)
            ts.put(s0, 8)
        if len(live) == 2:
            ts.put(int(live[1]), 8)
            # canonical 1-bit code: smaller symbol → 0
            lens[live] = 1
            rev[int(live[0])] = 0
            rev[int(live[1])] = 1
        # 1-symbol codes consume no bits
        return rev, lens

    ts.put(0, 1)  # normal code
    lengths = huffman_lengths(freqs)
    toks = rle_code_lengths(lengths[: int(live[-1]) + 1])
    cl_freq = np.zeros(19, dtype=np.int64)
    for sym, _extra in toks:
        cl_freq[sym] += 1
    cl_lengths = huffman_lengths(cl_freq, max_len=7)
    cl_codes = canonical_codes(cl_lengths)
    cl_rev = reversed_codes(cl_codes, cl_lengths)
    # number of 3-bit CL lengths to write (order CL_ORDER, min 4)
    order_pos = {s: i for i, s in enumerate(CL_ORDER)}
    n_cl = max([order_pos[s] + 1 for s in range(19) if cl_lengths[s] > 0] + [4])
    ts.put(n_cl - 4, 4)
    for s in CL_ORDER[:n_cl]:
        ts.put(int(cl_lengths[s]), 3)
    # max-symbol field = number of token READS the decoder performs
    n_tokens = len(toks)
    f = 0
    while n_tokens - 2 >= (1 << (2 + 2 * f)):
        f += 1
    ts.put(1, 1)
    ts.put(f, 3)
    ts.put(n_tokens - 2, 2 + 2 * f)
    for sym, extra in toks:
        ts.put(int(cl_rev[sym]), int(cl_lengths[sym]))
        if sym == 16:
            ts.put(extra, 2)
        elif sym == 17:
            ts.put(extra, 3)
        elif sym == 18:
            ts.put(extra, 7)
    codes = canonical_codes(lengths)
    if len(live) == 1:
        # degenerate normal code (single symbol ≥ 256): decoders treat
        # 1-symbol codes as consuming no bits — emit none
        return np.zeros(alphabet, dtype=np.int64), np.zeros(alphabet, dtype=np.int64)
    return reversed_codes(codes, lengths), lengths


_LZ_MIN = 4       # shortest backward reference worth a token
_LZ_MAX = 4096    # length prefix code 23 ceiling


def _forward_runs(mask: np.ndarray) -> np.ndarray:
    """runs[i] = count of consecutive True at i, i+1, ... (vectorized)."""
    n = len(mask)
    nf = np.full(n + 1, n, dtype=np.int64)
    fp = np.flatnonzero(~mask)
    nf[fp] = fp
    nf = np.minimum.accumulate(nf[::-1])[::-1]
    return nf[:n] - np.arange(n)


def encode_webp(img: np.ndarray) -> bytes:
    """uint8 (H,W,3) RGB / (H,W,4) RGBA / (H,W) gray → lossless WebP."""
    from .webp_huffman import prefix_encode_value

    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("expected (H,W), (H,W,3) or (H,W,4) uint8")
    arr = arr.astype(np.uint8)
    h, w = arr.shape[:2]
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("VP8L dimensions are 14-bit")
    has_alpha = arr.shape[2] == 4

    g = arr[..., 1].ravel()
    # SUBTRACT_GREEN transform (spec type 2): decorrelates R/B from G —
    # gray-ish and gradient content collapses to near-single-symbol R'/B'
    # channels; exactly invertible per pixel, applied before LZ77
    r = (arr[..., 0].ravel().astype(np.int16) - g).astype(np.uint8)
    b = (arr[..., 2].ravel().astype(np.int16) - g).astype(np.uint8)
    a = arr[..., 3].ravel() if has_alpha else np.full(g.shape, 255, np.uint8)
    n = g.size
    px = (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    )

    # greedy LZ77 over the raster-friendly distances: 1 (run) and w (above)
    m1 = np.zeros(n, dtype=bool)
    m1[1:] = px[1:] == px[:-1]
    mw = np.zeros(n, dtype=bool)
    if n > w:
        mw[w:] = px[w:] == px[:-w]
    rl1 = _forward_runs(m1)
    rlw = _forward_runs(mw)
    best = np.maximum(rl1, rlw)
    cand = np.flatnonzero(best >= _LZ_MIN)
    refs: list[tuple[int, int, int]] = []  # (pos, length, dist)
    i = 0
    ci = 0
    while ci < len(cand):
        p = int(cand[ci])
        if p < i:
            ci = int(np.searchsorted(cand, i))
            continue
        length = int(min(best[p], _LZ_MAX))
        dist = 1 if rl1[p] >= rlw[p] else w
        refs.append((p, length, dist))
        i = p + length
        ci = int(np.searchsorted(cand, i))

    lit_mask = np.ones(n, dtype=bool)
    for p, ln, _ in refs:
        lit_mask[p : p + ln] = False
    lit_idx = np.flatnonzero(lit_mask)

    # histograms
    ghist = np.zeros(280, dtype=np.int64)
    ghist[:256] = np.bincount(g[lit_idx], minlength=256)
    rhist = np.bincount(r[lit_idx], minlength=256).astype(np.int64)
    bhist = np.bincount(b[lit_idx], minlength=256).astype(np.int64)
    ahist = np.bincount(a[lit_idx], minlength=256).astype(np.int64)
    dhist = np.zeros(40, dtype=np.int64)
    ref_tok = []
    for _p, ln, dist in refs:
        lc, lx, lv = prefix_encode_value(ln)
        dc, dx, dv = prefix_encode_value(dist + 120)  # raw distance form
        ghist[256 + lc] += 1
        dhist[dc] += 1
        ref_tok.append((lc, lx, lv, dc, dx, dv))

    ts = _TokenStream()
    ts.put(0x2F, 8)  # signature
    ts.put(w - 1, 14)
    ts.put(h - 1, 14)
    ts.put(1 if has_alpha else 0, 1)
    ts.put(0, 3)  # version
    ts.put(1, 1)  # transform present...
    ts.put(2, 2)  # ...SUBTRACT_GREEN (no payload)
    ts.put(0, 1)  # no more transforms
    ts.put(0, 1)  # no color cache
    ts.put(0, 1)  # no meta prefix image
    grev, glen = _emit_prefix_code(ts, ghist)
    rrev, rlen = _emit_prefix_code(ts, rhist)
    brev, blen = _emit_prefix_code(ts, bhist)
    arev, alen = _emit_prefix_code(ts, ahist)
    drev, dlen = _emit_prefix_code(ts, dhist)

    # emission: literal segments between refs (vectorized), ref tokens
    def put_literals(lo: int, hi: int):
        if hi <= lo:
            return
        idx = np.arange(lo, hi)
        m = lit_mask[idx]
        idx = idx[m]
        if len(idx) == 0:
            return
        vals = np.empty(len(idx) * 4, dtype=np.int64)
        bits = np.empty(len(idx) * 4, dtype=np.int64)
        vals[0::4] = grev[g[idx]]
        bits[0::4] = glen[g[idx]]
        vals[1::4] = rrev[r[idx]]
        bits[1::4] = rlen[r[idx]]
        vals[2::4] = brev[b[idx]]
        bits[2::4] = blen[b[idx]]
        vals[3::4] = arev[a[idx]]
        bits[3::4] = alen[a[idx]]
        ts.put_arrays(vals, bits)

    pos = 0
    for (p, ln, _dist), (lc, lx, lv, dc, dx, dv) in zip(refs, ref_tok):
        put_literals(pos, p)
        ts.put(int(grev[256 + lc]), int(glen[256 + lc]))
        if lx:
            ts.put(lv, lx)
        ts.put(int(drev[dc]), int(dlen[dc]))
        if dx:
            ts.put(dv, dx)
        pos = p + ln
    put_literals(pos, n)

    payload = ts.pack()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# decoder (literal subset)
# ---------------------------------------------------------------------------

class _LsbReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc |= byte << self.nbits
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _PrefixCode:
    """Canonical (DEFLATE-style) prefix code with a single-level LUT
    decoder: peek max_len LSB-first bits, index (symbol, length) lists.
    r5: replaces the bit-by-bit dict walk (the multimodal decode hot
    loop) — identical symbols/consumption, ~10× fewer Python ops/sym."""

    def __init__(self, lengths: list[int]):
        pairs = sorted(
            (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
        )
        self.single = pairs[0][1] if len(pairs) == 1 else None
        if self.single is not None:
            return
        max_len = pairs[-1][0]
        if max_len > 15:
            raise ValueError("VP8L: prefix code length > 15")
        size = 1 << max_len
        self.max_len = max_len
        self.mask = size - 1
        # index 0 in lut_len marks an invalid (unassigned) codeword
        self.lut_sym = [0] * size
        self.lut_len = [0] * size
        code = 0
        prev_len = 0
        for ln, sym in pairs:
            code <<= ln - prev_len
            prev_len = ln
            if code >= (1 << ln):
                raise ValueError("VP8L: over-subscribed prefix code")
            # stream stores the code MSB-first, reader is LSB-first:
            # the reversed codeword is the low-ln-bits of the peek
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            step = 1 << ln
            count = size >> ln
            self.lut_sym[rev::step] = [sym] * count
            self.lut_len[rev::step] = [ln] * count
            code += 1

    def decode(self, br: _LsbReader) -> int:
        s = self.single
        if s is not None:
            return s  # 1-symbol codes consume no bits
        data, dn = br.data, len(br.data)
        while br.nbits < self.max_len:
            byte = data[br.pos] if br.pos < dn else 0
            br.pos += 1
            br.acc |= byte << br.nbits
            br.nbits += 8
        idx = br.acc & self.mask
        ln = self.lut_len[idx]
        if ln == 0:
            raise ValueError("invalid prefix code")
        br.acc >>= ln
        br.nbits -= ln
        return self.lut_sym[idx]


def _read_prefix_code(br: _LsbReader, alphabet: int) -> _PrefixCode:
    if br.read(1):  # simple
        n_sym = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        syms = [first]
        if n_sym == 2:
            syms.append(br.read(8))
        lengths = [0] * alphabet
        for s in syms:
            lengths[s] = 1
        if n_sym == 1:
            lengths[syms[0]] = 1
        return _PrefixCode(lengths)
    n_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # max-symbol cap
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet:
                raise ValueError("VP8L: code-length repeat past alphabet")
            lengths[sym:sym + rep] = [prev] * rep
            sym += rep
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _PrefixCode(lengths)


# libwebp's plane_to_code_lut (backward_references_enc.c; the table is
# normative — RFC 9649 publishes the equivalent 120 (dx, dy) pairs):
# lut[dy*16 + 8 - dx] = plane_code - 1 for the close-neighborhood 2D
# distance codes; 255 marks unused slots. Inverted below into
# _CODE_TO_PLANE: code-1 → (dx, dy), distance = dy*width + dx (min 1).
_PLANE_TO_CODE_LUT = [
    96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
    101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
    102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
    105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
    110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
    115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
    118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
    119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117,
]
_CODE_TO_PLANE: list[tuple[int, int]] = [(0, 0)] * 120
for _i, _c in enumerate(_PLANE_TO_CODE_LUT):
    if _c != 255:
        _CODE_TO_PLANE[_c] = (8 - (_i % 16), _i // 16)


def _prefix_value(br: _LsbReader, code: int) -> int:
    # inverse of webp_huffman.prefix_encode_value (spec 4.2.1)
    if code < 4:
        return code + 1
    extra = (code >> 1) - 1
    base = (2 + (code & 1)) << extra
    return base + br.read(extra) + 1


def _read_code_groups(br: _LsbReader, n_groups: int, cache_bits: int):
    cache_size = (1 << cache_bits) if cache_bits else 0
    out = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        out.append((green, red, blue, alpha, dist))
    return out


def _decode_pixels(
    br: _LsbReader,
    w: int,
    h: int,
    groups,
    meta: np.ndarray | None,
    meta_bits: int,
    cache_bits: int,
) -> np.ndarray:
    """LZ77-coded VP8L pixel stream → (w*h, 4) uint8 [R,G,B,A].

    Handles color-cache symbols (green alphabet ≥ 280), 2D distance
    plane codes (dv ≤ 120) and per-tile meta prefix groups."""
    n = w * h
    # r5: interleaved [R,G,B,A] bytearray instead of an (n, 4) ndarray —
    # numpy scalar row writes dominated the profile; bytearray item and
    # slice ops are the fast pure-Python path
    buf = bytearray(n * 4)
    cache = None
    if cache_bits:
        cache = bytearray(4 << cache_bits)
        cache_shift = 32 - cache_bits
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta is not None else 0
    meta_l = meta.tolist() if meta is not None else None

    gidx = -1
    green = red = blue = alpha = dist_code = None
    i = 0
    while i < n:
        if meta_l is not None:
            y, x = divmod(i, w)
            gi = meta_l[(y >> meta_bits) * mw + (x >> meta_bits)]
        else:
            gi = 0
        if gi != gidx:
            if gi >= len(groups):
                raise ValueError("VP8L: meta prefix group out of range")
            green, red, blue, alpha, dist_code = groups[gi]
            gidx = gi
        gsym = green.decode(br)
        if gsym < 256:  # literal
            r = red.decode(br)
            b = blue.decode(br)
            a = alpha.decode(br)
            o = i * 4
            buf[o] = r
            buf[o + 1] = gsym
            buf[o + 2] = b
            buf[o + 3] = a
            if cache is not None:
                argb = (a << 24) | (r << 16) | (gsym << 8) | b
                ck = (((0x1E35A7BD * argb) & 0xFFFFFFFF) >> cache_shift) * 4
                cache[ck] = r
                cache[ck + 1] = gsym
                cache[ck + 2] = b
                cache[ck + 3] = a
            i += 1
        elif gsym < 280:  # backward reference
            length = _prefix_value(br, gsym - 256)
            dv = _prefix_value(br, dist_code.decode(br))
            if dv > 120:
                dist = dv - 120
            else:
                dx, dy = _CODE_TO_PLANE[dv - 1]
                dist = max(1, dy * w + dx)
            if dist > i:
                raise ValueError("VP8L: backward reference before image start")
            if i + length > n:
                raise ValueError("VP8L: backward reference past image end")
            if cache is None and dist >= length:
                # non-overlapping, no cache bookkeeping: block copy
                o = i * 4
                s = (i - dist) * 4
                buf[o : o + length * 4] = buf[s : s + length * 4]
            else:
                d4 = dist * 4
                for o in range(i * 4, (i + length) * 4, 4):
                    # sequential: overlapping runs valid
                    r = buf[o] = buf[o - d4]
                    g = buf[o + 1] = buf[o - d4 + 1]
                    b = buf[o + 2] = buf[o - d4 + 2]
                    a = buf[o + 3] = buf[o - d4 + 3]
                    if cache is not None:
                        argb = (a << 24) | (r << 16) | (g << 8) | b
                        ck = (((0x1E35A7BD * argb) & 0xFFFFFFFF)
                              >> cache_shift) * 4
                        cache[ck : ck + 4] = buf[o : o + 4]
            i += length
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L: color-cache symbol without a cache")
            ck = (gsym - 280) * 4
            o = i * 4
            buf[o : o + 4] = cache[ck : ck + 4]
            i += 1
    # frombuffer over the (mutable) bytearray is writable and zero-copy
    return np.frombuffer(buf, dtype=np.uint8).reshape(n, 4)


def _decode_sub_image(br: _LsbReader, w: int, h: int) -> np.ndarray:
    """entropy-coded-image (transform data / entropy image / palette):
    color-cache-info + one prefix-code group + LZ77 stream, no meta."""
    cache_bits = br.read(4) if br.read(1) else 0
    groups = _read_code_groups(br, 1, cache_bits)
    return _decode_pixels(br, w, h, groups, None, 0, cache_bits)


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a + b) >> 1


def _inv_predictor(img: np.ndarray, w: int, h: int, bits: int, tdata: np.ndarray) -> np.ndarray:
    """Inverse predictor transform (type 0). Residuals + predicted value
    mod 256 per channel; per-tile mode lives in the transform image's
    green channel. Border rules per spec: (0,0) predicts ARGB black, top
    row L, left column T; TR for the rightmost column wraps to the
    leftmost pixel of the SAME row (the contiguous-buffer rule)."""
    tw = (w + (1 << bits) - 1) >> bits
    modes = tdata[:, 1]
    res = img.astype(np.int16)
    out = np.zeros_like(res)
    n = w * h
    black = np.array([0, 0, 0, 255], dtype=np.int16)
    for i in range(n):
        if i == 0:
            pred = black
        elif i < w:
            pred = out[i - 1]  # top row: L
        elif i % w == 0:
            pred = out[i - w]  # left column: T
        else:
            mode = int(modes[((i // w) >> bits) * tw + ((i % w) >> bits)])
            L = out[i - 1]
            T = out[i - w]
            if mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 0:
                pred = black
            elif mode == 3:
                pred = out[i - w + 1]
            elif mode == 4:
                pred = out[i - w - 1]
            elif mode == 5:
                pred = _avg2(_avg2(L, out[i - w + 1]), T)
            elif mode == 6:
                pred = _avg2(L, out[i - w - 1])
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(out[i - w - 1], T)
            elif mode == 9:
                pred = _avg2(T, out[i - w + 1])
            elif mode == 10:
                pred = _avg2(_avg2(L, out[i - w - 1]), _avg2(T, out[i - w + 1]))
            elif mode == 11:
                # Select: p = T + L - TL; pick whichever of T/L is
                # Manhattan-closer to p (ties → T), per libwebp Sub3
                TL = out[i - w - 1]
                pT = int(np.abs(L - TL).sum())
                pL = int(np.abs(T - TL).sum())
                pred = T if pT <= pL else L
            elif mode == 12:
                TL = out[i - w - 1]
                pred = np.clip(L + T - TL, 0, 255)
            elif mode == 13:
                TL = out[i - w - 1]
                ave = _avg2(L, T)
                d = ave - TL
                # C truncation toward zero for (a - b) / 2
                half = np.where(d >= 0, d >> 1, -((-d) >> 1))
                pred = np.clip(ave + half, 0, 255)
            else:
                raise ValueError(f"VP8L: predictor mode {mode}")
        out[i] = (res[i] + pred) & 0xFF
    return out.astype(np.uint8)


def _color_transform_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    # both operands are signed int8 per spec; >>5 arithmetic
    return (t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)) >> 5


def _inv_cross_color(img: np.ndarray, w: int, h: int, bits: int, tdata: np.ndarray) -> np.ndarray:
    """Inverse color (cross-color) transform (type 1), fully vectorized.
    Transform pixel channels: blue=green_to_red, green=green_to_blue,
    red=red_to_blue (spec ColorTransformElement packing)."""
    tw = (w + (1 << bits) - 1) >> bits
    n = w * h
    ys, xs = np.divmod(np.arange(n), w)
    ti = (ys >> bits) * tw + (xs >> bits)
    g2r = tdata[ti, 2]
    g2b = tdata[ti, 1]
    r2b = tdata[ti, 0]
    g = img[:, 1]
    red = (img[:, 0].astype(np.int32) + _color_transform_delta(g2r, g)) & 0xFF
    blue = (img[:, 2].astype(np.int32) + _color_transform_delta(g2b, g)) & 0xFF
    blue = (blue + _color_transform_delta(r2b, red.astype(np.uint8))) & 0xFF
    img[:, 0] = red.astype(np.uint8)
    img[:, 2] = blue.astype(np.uint8)
    return img


def _inv_palette(
    img: np.ndarray, packed_w: int, h: int, wbits: int, pal: np.ndarray, full_w: int
) -> np.ndarray:
    """Inverse color-indexing transform (type 3): unpack bundled indices
    from the green channel and look up the (delta-decoded) palette.
    Out-of-range indices map to 0x00000000 per spec."""
    if wbits == 0:
        idx = img[:, 1].astype(np.int64)
    else:
        ibits = 8 >> wbits
        ppb = 1 << wbits  # pixels per packed green byte
        packed = img[:, 1].reshape(h, packed_w).astype(np.int64)
        shifts = np.arange(ppb, dtype=np.int64) * ibits  # LSB = leftmost
        expanded = (packed[:, :, None] >> shifts) & ((1 << ibits) - 1)
        idx = expanded.reshape(h, packed_w * ppb)[:, :full_w].reshape(-1)
    out = np.zeros((idx.size, 4), dtype=np.uint8)
    valid = idx < len(pal)
    out[valid] = pal[idx[valid]]
    return out


def _decode_vp8l_payload(payload: bytes) -> np.ndarray:
    """VP8L chunk payload (with the 5-byte signature/dims header) →
    (H,W,4) RGBA."""
    br = _LsbReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    return _decode_vp8l_stream(br, w, h)


def _decode_vp8l_stream(br: "_LsbReader", w: int, h: int) -> np.ndarray:
    """Headless VP8L bitstream (dims known from context — the normal
    header, or the VP8X canvas for compressed ALPH planes) → (H,W,4)."""
    cur_w = w  # shrinks when color-indexing bundles pixels
    transforms: list[tuple[int, object]] = []
    seen: set[int] = set()
    while br.read(1):  # transform list (each type at most once)
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError(f"VP8L: duplicate transform type {ttype}")
        seen.add(ttype)
        if ttype == 2:  # subtract green: no payload
            transforms.append((2, None))
        elif ttype in (0, 1):  # predictor / cross-color: tile image
            bits = br.read(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tdata = _decode_sub_image(br, tw, th)
            transforms.append((ttype, (bits, tdata)))
        else:  # color indexing: delta-coded palette, possible bundling
            psize = br.read(8) + 1
            pal_raw = _decode_sub_image(br, psize, 1)
            pal = (np.cumsum(pal_raw.astype(np.int64), axis=0) & 0xFF).astype(np.uint8)
            if psize <= 2:
                wbits = 3
            elif psize <= 4:
                wbits = 2
            elif psize <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append((3, (wbits, pal)))
            if wbits:
                cur_w = (cur_w + (1 << wbits) - 1) >> wbits

    # spatially-coded image: color-cache-info, meta-prefix, data
    cache_bits = br.read(4) if br.read(1) else 0
    meta_idx = None
    meta_bits = 0
    n_groups = 1
    if br.read(1):  # meta prefix image
        meta_bits = br.read(3) + 2
        mw = (cur_w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_sub_image(br, mw, mh)
        # group index = (red << 8) | green of the entropy-image pixel
        meta_idx = (meta_img[:, 0].astype(np.int64) << 8) | meta_img[:, 1]
        n_groups = int(meta_idx.max()) + 1
    groups = _read_code_groups(br, n_groups, cache_bits)
    img = _decode_pixels(br, cur_w, h, groups, meta_idx, meta_bits, cache_bits)

    # inverse transforms in reverse read order; track the running width
    width = cur_w
    for ttype, payload_t in reversed(transforms):
        if ttype == 3:
            wbits, pal = payload_t
            img = _inv_palette(img, width, h, wbits, pal, w)
            width = w
        elif ttype == 2:
            img[:, 0] = (img[:, 0].astype(np.int16) + img[:, 1]).astype(np.uint8)
            img[:, 2] = (img[:, 2].astype(np.int16) + img[:, 1]).astype(np.uint8)
        elif ttype == 1:
            bits, tdata = payload_t
            img = _inv_cross_color(img, width, h, bits, tdata)
        else:
            bits, tdata = payload_t
            img = _inv_predictor(img, width, h, bits, tdata)
    return img.reshape(h, w, 4)


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH chunk's prediction filter (container spec
    'Alpha filtering method': 0 none, 1 horizontal, 2 vertical,
    3 gradient).  Row 0 of the vertical/gradient filters falls back to
    horizontal, and the first pixel of each subsequent horizontal row
    predicts from the first pixel of the row above, per the spec's
    boundary conventions."""
    if method == 0:
        return plane
    h, w = plane.shape
    out = np.zeros_like(plane)
    if method == 1:  # horizontal
        for y in range(h):
            pred = 0 if y == 0 else int(out[y - 1, 0])
            row = out[y]
            src = plane[y]
            for x in range(w):
                pred = (pred + int(src[x])) & 0xFF
                row[x] = pred
    elif method == 2:  # vertical (row 0: horizontal)
        _unfilter_row0_horizontal(plane, out)
        for y in range(1, h):
            out[y] = out[y - 1] + plane[y]  # uint8 wraps mod 256
    elif method == 3:  # gradient (row 0: horizontal)
        _unfilter_row0_horizontal(plane, out)
        for y in range(1, h):
            left = int(out[y - 1, 0])
            top_left = left
            src = plane[y]
            row = out[y]
            prev = out[y - 1]
            for x in range(w):
                top = int(prev[x])
                g = left + top - top_left
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (int(src[x]) + g) & 0xFF
                top_left = top
                row[x] = left
    else:
        raise ValueError(f"ALPH filtering method {method}")
    return out


def _unfilter_row0_horizontal(plane: np.ndarray, out: np.ndarray) -> None:
    pred = 0
    src = plane[0]
    row = out[0]
    for x in range(plane.shape[1]):
        pred = (pred + int(src[x])) & 0xFF
        row[x] = pred


def _decode_alph(payload: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk → (H,W) uint8 alpha plane.  Compression 0 is a raw
    row-major plane; compression 1 is a headless VP8L stream of the
    VP8X canvas dims with alpha in the GREEN channel (container spec
    §Alpha).  The optional prediction filter is inverted afterwards;
    level-reduction preprocessing is lossy and needs no inversion."""
    if not payload:
        raise ValueError("empty ALPH chunk")
    b0 = payload[0]
    compression = b0 & 0x3
    filtering = (b0 >> 2) & 0x3
    data = payload[1:]
    if compression == 0:
        if len(data) < w * h:
            raise ValueError("ALPH raw plane shorter than canvas")
        plane = np.frombuffer(data[: w * h], dtype=np.uint8).reshape(h, w)
    elif compression == 1:
        img = _decode_vp8l_stream(_LsbReader(data), w, h)
        plane = img[:, :, 1]  # alpha rides the green channel
    else:
        raise ValueError(f"ALPH compression method {compression}")
    return _unfilter_alpha(plane.copy(), filtering)


def _walk_chunks(data: bytes, pos: int):
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        yield tag, data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def decode_webp(data: bytes, strict_vp8: bool = False) -> np.ndarray:
    """WebP → (H,W,4) uint8 RGBA.

    Simple containers: VP8L lossless (all four transforms, color cache,
    meta prefix image, 2D distance codes — foreign libwebp streams, not
    just the own-encoder subset) and lossy VP8 key frames (functions/
    vp8.py, RFC 6386).  Extended containers (VP8X, r6): still images
    with an ALPH alpha plane (raw or headless-VP8L compressed, all four
    prediction filters) over either base codec, and animated WebP
    (ANIM/ANMF) decoded as the first frame composited onto the canvas —
    the same first-frame semantics as the GIF decoder.  ICCP/EXIF/XMP
    metadata chunks are skipped.  strict_vp8=True propagates the
    lossy-VP8 provenance assertion (vp8.Vp8DefaultTablesUnavailable for
    streams that cannot be trusted against placeholder tables); VP8L
    lossless is unaffected — it has no default-table dependency."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    from .vp8 import decode_vp8

    canvas_wh = None
    alph = None
    for tag, chunk in _walk_chunks(data, 12):
        if tag == b"VP8X":
            if len(chunk) < 10:
                raise ValueError("short VP8X chunk")
            cw = int.from_bytes(chunk[4:7], "little") + 1
            ch = int.from_bytes(chunk[7:10], "little") + 1
            canvas_wh = (cw, ch)
        elif tag == b"ALPH":
            alph = chunk
        elif tag == b"VP8L":
            return _decode_vp8l_payload(chunk)  # carries its own alpha
        elif tag == b"VP8 ":
            rgb = decode_vp8(chunk, strict=strict_vp8)
            h, w = rgb.shape[:2]
            if alph is not None:
                if canvas_wh is None:
                    raise ValueError("ALPH chunk without VP8X header")
                a = _decode_alph(alph, canvas_wh[0], canvas_wh[1])
                a = a[:h, :w, None]
            else:
                a = np.full((h, w, 1), 255, np.uint8)
            return np.concatenate([rgb, a], axis=-1)
        elif tag == b"ANMF":
            if canvas_wh is None:
                raise ValueError("ANMF chunk without VP8X header")
            fx, fy, fw, fh, _dur, _dispose, _blend, frame = (
                _decode_anmf(chunk)
            )
            cw, ch = canvas_wh
            canvas = np.zeros((ch, cw, 4), np.uint8)
            vh = min(frame.shape[0], ch - fy)
            vw = min(frame.shape[1], cw - fx)
            canvas[fy:fy + vh, fx:fx + vw] = frame[:vh, :vw]
            return canvas
    raise ValueError("no image chunk (VP8/VP8L) in WebP container")


def _rewrap_simple(tag: bytes, payload: bytes, alph: bytes | None,
                   fw: int, fh: int) -> bytes:
    """Re-wrap an ANMF frame's bare image (+optional ALPH) chunks as a
    standalone simple/extended WebP file so decode_webp can recurse."""
    parts = []
    if alph is not None:
        vp8x = (b"\x10\x00\x00\x00"
                + (fw - 1).to_bytes(3, "little")
                + (fh - 1).to_bytes(3, "little"))
        parts.append(b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x)
        pad = b"\x00" if len(alph) & 1 else b""
        parts.append(b"ALPH" + struct.pack("<I", len(alph)) + alph + pad)
    pad = b"\x00" if len(payload) & 1 else b""
    parts.append(tag + struct.pack("<I", len(payload)) + payload + pad)
    body = b"WEBP" + b"".join(parts)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_anmf(chunk: bytes):
    """ANMF payload → (fx, fy, fw, fh, duration_ms, dispose, blend,
    (fh,fw,4) RGBA frame).  Container spec: X/Y are stored in 2-pixel
    units; the flags byte packs blending in bit 1 (0 = alpha-blend,
    1 = overwrite) and disposal in bit 0 (0 = none, 1 = dispose to
    the ANIM background color)."""
    if len(chunk) < 16:
        raise ValueError("short ANMF chunk")
    fx = int.from_bytes(chunk[0:3], "little") * 2
    fy = int.from_bytes(chunk[3:6], "little") * 2
    fw = int.from_bytes(chunk[6:9], "little") + 1
    fh = int.from_bytes(chunk[9:12], "little") + 1
    duration = int.from_bytes(chunk[12:15], "little")
    flags = chunk[15]
    blend = (flags >> 1) & 1
    dispose = flags & 1
    alph = None
    for t2, c2 in _walk_chunks(chunk, 16):
        if t2 == b"ALPH":
            alph = c2
        elif t2 in (b"VP8 ", b"VP8L"):
            frame = decode_webp(_rewrap_simple(t2, c2, alph, fw, fh))
            return fx, fy, fw, fh, duration, dispose, blend, frame
    raise ValueError("ANMF frame without image data")


def decode_webp_frames(data: bytes) -> list[np.ndarray]:
    """Animated WebP → list of (H, W, 4) uint8 RGBA canvases, one per
    ANMF frame, composited per the container spec's dispose/blend
    semantics: the canvas starts fully transparent; blending method 0
    alpha-blends the frame over the canvas with the spec's
    straight-alpha formula, method 1 overwrites the rectangle; disposal
    method 1 fills the frame rectangle with the ANIM background color
    (stored BGRA) after the frame is rendered.  A non-animated WebP
    (simple VP8/VP8L or still VP8X) yields its single image."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    canvas_wh = None
    bg = np.zeros(4, np.uint8)
    anmf_chunks: list[bytes] = []
    animated = False
    for tag, chunk in _walk_chunks(data, 12):
        if tag == b"VP8X":
            if len(chunk) < 10:
                raise ValueError("short VP8X chunk")
            cw = int.from_bytes(chunk[4:7], "little") + 1
            ch = int.from_bytes(chunk[7:10], "little") + 1
            canvas_wh = (cw, ch)
        elif tag == b"ANIM":
            if len(chunk) < 6:
                raise ValueError("short ANIM chunk")
            animated = True
            # background color is stored [B, G, R, A]
            bg = np.array([chunk[2], chunk[1], chunk[0], chunk[3]],
                          np.uint8)
        elif tag == b"ANMF":
            anmf_chunks.append(chunk)
    if not animated or not anmf_chunks:
        return [decode_webp(data)]
    if canvas_wh is None:
        raise ValueError("ANIM chunk without VP8X header")
    cw, ch = canvas_wh
    canvas = np.zeros((ch, cw, 4), np.uint8)
    out: list[np.ndarray] = []
    for chunk in anmf_chunks:
        fx, fy, fw, fh, _dur, dispose, blend, frame = _decode_anmf(chunk)
        if fx + fw > cw or fy + fh > ch:
            raise ValueError("ANMF frame region outside canvas")
        vh = min(frame.shape[0], fh)
        vw = min(frame.shape[1], fw)
        src = frame[:vh, :vw]
        region = canvas[fy:fy + vh, fx:fx + vw]
        if blend == 1:  # do not blend: overwrite
            region[:] = src
        else:  # alpha-blend: straight-alpha spec formula
            sa = src[..., 3:4].astype(np.float64) / 255.0
            da = region[..., 3:4].astype(np.float64) / 255.0
            oa = sa + da * (1.0 - sa)
            rgb = (src[..., :3] * sa + region[..., :3] * da * (1.0 - sa))
            safe = np.where(oa > 0.0, oa, 1.0)
            region[..., :3] = np.clip(
                np.rint(rgb / safe), 0, 255
            ).astype(np.uint8)
            region[..., 3:4] = np.clip(
                np.rint(oa * 255.0), 0, 255
            ).astype(np.uint8)
        out.append(canvas.copy())
        if dispose == 1:
            canvas[fy:fy + fh, fx:fx + fw] = bg
    return out


def encode_webp_anim(frames, offsets=None, duration_ms: int = 100,
                     dispose: int = 0, blend: int = 1,
                     background=(0, 0, 0, 0)) -> bytes:
    """Twin writer: list of (h, w, 3|4) uint8 frames → animated WebP
    (VP8X + ANIM + one VP8L ANMF per frame).  offsets, if given, is a
    list of (x, y) canvas positions per frame (must be even, per the
    2-pixel storage units); the canvas is the union extent.  Every
    frame shares the same dispose/blend flags."""
    if not frames:
        raise ValueError("animated WebP twin needs at least one frame")
    if offsets is None:
        offsets = [(0, 0)] * len(frames)
    cw = max(x + f.shape[1] for (x, y), f in zip(offsets, frames))
    ch = max(y + f.shape[0] for (x, y), f in zip(offsets, frames))

    def chunk(tag, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    vp8x = (b"\x12\x00\x00\x00"  # animation + alpha flags
            + (cw - 1).to_bytes(3, "little")
            + (ch - 1).to_bytes(3, "little"))
    r, g, b, a = background
    anim = bytes([b, g, r, a]) + struct.pack("<H", 0)  # BGRA + loop 0
    parts = [chunk(b"VP8X", vp8x), chunk(b"ANIM", anim)]
    for (x, y), f in zip(offsets, frames):
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets are stored in 2-pixel units")
        h, w = f.shape[:2]
        simple = encode_webp(np.asarray(f, np.uint8))
        vp8l = None
        for t2, c2 in _walk_chunks(simple, 12):
            if t2 == b"VP8L":
                vp8l = c2
        if vp8l is None:
            raise ValueError("encoder twin produced no VP8L chunk")
        head = ((x // 2).to_bytes(3, "little")
                + (y // 2).to_bytes(3, "little")
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little")
                + int(duration_ms).to_bytes(3, "little")
                + bytes([((blend & 1) << 1) | (dispose & 1)]))
        parts.append(chunk(b"ANMF", head + chunk(b"VP8L", vp8l)))
    body = b"WEBP" + b"".join(parts)
    return b"RIFF" + struct.pack("<I", len(body)) + body
