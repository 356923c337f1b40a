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
- decoder: simple AND normal prefix codes with full code-length-code
  decoding, max-symbol handling, LZ77 references with raw distances —
  round-trips the tests without PIL and rejects features outside the
  subset loudly (transforms, color cache, 2D distance plane codes).
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
    def __init__(self, lengths: list[int]):
        # canonical (DEFLATE-style) code; lookup by (length, code) walk
        self.table: dict[tuple[int, int], int] = {}
        pairs = sorted(
            (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
        )
        code = 0
        prev_len = 0
        for ln, sym in pairs:
            code <<= ln - prev_len
            self.table[(ln, code)] = sym
            code += 1
            prev_len = ln
        self.single = pairs[0][1] if len(pairs) == 1 else None

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single  # 1-symbol codes consume no bits
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            if (length, code) in self.table:
                return self.table[(length, code)]
        raise ValueError("invalid prefix code")


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
            lengths[sym:sym + rep] = [prev] * rep
            sym += rep
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _PrefixCode(lengths)


def decode_webp(data: bytes) -> np.ndarray:
    """Lossless WebP (literal VP8L subset) → (H,W,4) uint8 RGBA."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if tag == b"VP8L":
            payload = data[pos + 8:pos + 8 + size]
            break
        if tag == b"VP8 " or tag == b"VP8X":
            raise NotImplementedError("lossy/extended WebP")
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk")
    br = _LsbReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    subtract_green = False
    while br.read(1):  # transform loop
        ttype = br.read(2)
        if ttype == 2:
            subtract_green = True
        else:
            raise NotImplementedError(f"VP8L transform type {ttype}")
    if br.read(1):
        raise NotImplementedError("color cache")
    if br.read(1):
        raise NotImplementedError("meta prefix image")
    green = _read_prefix_code(br, 280)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    dist_code = _read_prefix_code(br, 40)

    def prefix_value(code: int) -> int:
        # inverse of webp_huffman.prefix_encode_value (spec 4.2.1)
        if code < 4:
            return code + 1
        extra = (code >> 1) - 1
        base = (2 + (code & 1)) << extra
        return base + br.read(extra) + 1

    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    i = 0
    while i < n:
        gsym = green.decode(br)
        if gsym >= 256:
            length = prefix_value(gsym - 256)
            dv = prefix_value(dist_code.decode(br))
            if dv <= 120:
                raise NotImplementedError("2D distance plane codes")
            dist = dv - 120
            for k in range(length):  # sequential: overlapping runs valid
                out[i + k] = out[i + k - dist]
            i += length
            continue
        out[i, 1] = gsym
        out[i, 0] = red.decode(br)
        out[i, 2] = blue.decode(br)
        out[i, 3] = alpha.decode(br)
        i += 1
    if subtract_green:  # inverse: add green back to R and B
        out[:, 0] = (out[:, 0].astype(np.int16) + out[:, 1]).astype(np.uint8)
        out[:, 2] = (out[:, 2].astype(np.int16) + out[:, 1]).astype(np.uint8)
    return out.reshape(h, w, 4)
