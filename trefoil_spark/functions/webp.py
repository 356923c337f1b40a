"""WebP lossless (VP8L) encoder + decoder — pure python, from scratch.

Closes the final F11 format tail (reference `trefoil/cli/utilities.py:
16-34` saves `format='webp'` via PIL with ``lossless=True``). Implements
the public "WebP Lossless Bitstream Specification" (VP8L) subset:

- encoder: RIFF/WEBP/VP8L container, LSB-first bit writer, no transforms,
  no color cache, single prefix-code group, flat 8-bit prefix codes for
  the G/R/B/A literal channels (256 symbols × length 8 — a complete
  canonical code whose codeword IS the byte value, bit-reversed for the
  LSB-first stream) and a 1-symbol simple code for distances. Literal-only
  (no LZ77 backward references): byte-exact lossless, deterministic, at
  ~4 bytes/pixel — the VP8L analog of PNG filter-0/stored, chosen over
  entropy-optimal coding for the same reason the PNG encoder pins its
  filter: byte-stability and auditability of a from-scratch codec.
- decoder: the general literal subset (simple AND normal prefix codes
  with full code-length-code decoding, max-symbol handling) — round-trips
  the tests without PIL and rejects features outside the subset loudly.
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are written (spec section 4.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _reverse_bits(v: int, n: int) -> int:
    out = 0
    for _ in range(n):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


class _LsbWriter:
    """VP8L packs bits LSB-first within bytes."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int):
        """Prefix codes are canonical (MSB-first) — emit reversed."""
        self.write(_reverse_bits(code, length), length)

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _write_flat8_code(bw: _LsbWriter, alphabet: int):
    """Emit a normal prefix code: symbols 0..255 all length 8, rest 0.

    Uses the code-length code {8: len 1, 16: len 1} (complete): one
    literal '8' then 43 'repeat-previous' (symbol 16) ops covering the
    other 255 symbols (42×6 + 1×3). For alphabets larger than 256 the
    max-symbol field caps the decoder at exactly those 44 token READS
    (the spec counts reads, not assigned symbols), making the trailing
    zero lengths implicit.
    """
    # ops: ('lit', 8) + repeats of the previous nonzero length
    reps = []
    remaining = 255
    while remaining:
        rep = min(6, remaining)
        if remaining - rep in (1, 2):  # keep the tail expressible (>= 3)
            rep = remaining - 3
        reps.append(rep)
        remaining -= rep
    n_tokens = 1 + len(reps)

    bw.write(0, 1)  # not a simple code
    # code-length-code: cover _CL_ORDER up to index of symbol 8 (11) → 12
    cl_lengths = {16: 1, 8: 1}
    bw.write(12 - 4, 4)
    for sym in _CL_ORDER[:12]:
        bw.write(cl_lengths.get(sym, 0), 3)
    # canonical CL code over {8, 16}: 8 → 0, 16 → 1 (1 bit each)
    cl_code = {8: (0, 1), 16: (1, 1)}
    if alphabet > 256:
        bw.write(1, 1)  # use max-symbol (= max token reads)
        bw.write(2, 3)  # length_nbits = 2 + 2*2 = 6
        bw.write(n_tokens - 2, 6)
    else:
        bw.write(0, 1)
    code, ln = cl_code[8]
    bw.write_code(code, ln)  # lengths[0] = 8
    code16, ln16 = cl_code[16]
    for rep in reps:
        bw.write_code(code16, ln16)
        bw.write(rep - 3, 2)


def encode_webp(img: np.ndarray) -> bytes:
    """uint8 (H,W,3) RGB / (H,W,4) RGBA / (H,W) gray → lossless WebP."""
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

    bw = _LsbWriter()
    bw.write(0x2F, 8)  # signature
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    # 5 prefix codes: green(+len), red, blue, alpha, distance
    _write_flat8_code(bw, 280)
    _write_flat8_code(bw, 256)
    _write_flat8_code(bw, 256)
    _write_flat8_code(bw, 256)
    bw.write(1, 1)  # distance: simple code
    bw.write(0, 1)  # one symbol
    bw.write(0, 1)  # symbol in 1 bit
    bw.write(0, 1)  # symbol 0

    g = arr[..., 1].ravel()
    r = arr[..., 0].ravel()
    b = arr[..., 2].ravel()
    a = arr[..., 3].ravel() if has_alpha else np.full(g.shape, 255, np.uint8)
    # flat-8 canonical code: codeword == symbol value; stream order G,R,B,A
    rev = np.array([_reverse_bits(i, 8) for i in range(256)], dtype=np.uint8)
    interleaved = np.empty(g.size * 4, dtype=np.uint8)
    interleaved[0::4] = rev[g]
    interleaved[1::4] = rev[r]
    interleaved[2::4] = rev[b]
    interleaved[3::4] = rev[a]
    # vectorized 8-bit emission at arbitrary bit phase: each byte b at
    # phase k contributes (b<<k)&0xFF to its own slot and b>>(8-k) to the
    # next — a shift+OR chain, no per-pixel Python loop
    k = bw.nbits
    if k == 0:
        bw.buf.extend(interleaved.tobytes())
    else:
        v = interleaved.astype(np.uint16) << np.uint16(k)
        lo = (v & 0xFF).astype(np.uint8)
        hi = (v >> 8).astype(np.uint8)
        out = lo
        out[1:] |= hi[:-1]
        out[0] |= np.uint8(bw.acc)
        bw.buf.extend(out.tobytes())
        bw.acc = int(hi[-1])
    payload = bw.flush()

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
    if br.read(1):
        raise NotImplementedError("VP8L transforms")
    if br.read(1):
        raise NotImplementedError("color cache")
    if br.read(1):
        raise NotImplementedError("meta prefix image")
    green = _read_prefix_code(br, 280)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    _read_prefix_code(br, 40)  # distance (unused in literal subset)
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    for i in range(n):
        gsym = green.decode(br)
        if gsym >= 256:
            raise NotImplementedError("LZ77 backward reference")
        out[i, 1] = gsym
        out[i, 0] = red.decode(br)
        out[i, 2] = blue.decode(br)
        out[i, 3] = alpha.decode(br)
    return out.reshape(h, w, 4)
