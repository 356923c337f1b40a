"""Canonical Huffman machinery for the VP8L encoder (public WebP
Lossless Bitstream Specification; DEFLATE-style canonical codes).

Pure numpy/python — deterministic: ties in the Huffman build break by
symbol id, so the same input always produces the same bitstream.
"""

from __future__ import annotations

import heapq

import numpy as np

# order in which code-length-code lengths are written (spec 4.2.2)
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

MAX_CODE_LEN = 15
MAX_CL_LEN = 7


def huffman_lengths(freqs: np.ndarray, max_len: int = MAX_CODE_LEN) -> np.ndarray:
    """Code lengths (0 = unused) for a frequency table; length-limited by
    frequency flattening (freq → freq//2+1 rebuild) — not bit-optimal at
    the limit but deterministic and valid; 0/1/2-symbol cases are the
    caller's (simple-code) business but handled safely here."""
    freqs = np.asarray(freqs, dtype=np.int64)
    n = len(freqs)
    lengths = np.zeros(n, dtype=np.int64)
    live = np.flatnonzero(freqs > 0)
    if len(live) == 0:
        return lengths
    if len(live) == 1:
        lengths[live[0]] = 1
        return lengths
    f = freqs.copy()
    while True:
        # heap of (freq, tiebreak, [symbols])
        heap = [(int(f[s]), int(s), [int(s)]) for s in live]
        heapq.heapify(heap)
        tb = n  # fresh tiebreak ids for merged nodes
        depth = {int(s): 0 for s in live}
        while len(heap) > 1:
            fa, _, sa = heapq.heappop(heap)
            fb, _, sb = heapq.heappop(heap)
            for s in sa + sb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, tb, sa + sb))
            tb += 1
        max_d = max(depth.values())
        if max_d <= max_len:
            for s, dd in depth.items():
                lengths[s] = dd
            return lengths
        f = f // 2 + 1
        f[freqs == 0] = 0


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """DEFLATE-canonical codewords (MSB-first ints) for given lengths."""
    lengths = np.asarray(lengths)
    codes = np.zeros(len(lengths), dtype=np.int64)
    pairs = sorted((int(l), int(s)) for s, l in enumerate(lengths) if l > 0)
    code = 0
    prev = 0
    for ln, sym in pairs:
        code <<= ln - prev
        codes[sym] = code
        code += 1
        prev = ln
    return codes


_REV_TABLE = np.zeros((MAX_CODE_LEN + 1, 1 << MAX_CODE_LEN), dtype=np.int64)
for _n in range(1, MAX_CODE_LEN + 1):
    idx = np.arange(1 << _n)
    rev = np.zeros_like(idx)
    src = idx.copy()
    for _ in range(_n):
        rev = (rev << 1) | (src & 1)
        src >>= 1
    _REV_TABLE[_n, : 1 << _n] = rev


def reversed_codes(codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Bit-reverse each codeword to LSB-first emission order."""
    out = np.zeros(len(codes), dtype=np.int64)
    for ln in np.unique(lengths):
        if ln == 0:
            continue
        m = lengths == ln
        out[m] = _REV_TABLE[int(ln)][codes[m]]
    return out


def rle_code_lengths(lengths: np.ndarray) -> list[tuple[int, int]]:
    """Code-length array → (cl_symbol, extra_value) token list using the
    16 (repeat prev nonzero, 3-6) / 17 (zeros 3-10) / 18 (zeros 11-138)
    ops — exactly the DEFLATE/VP8L scheme."""
    toks: list[tuple[int, int]] = []
    prev_nz = 8  # spec: initial "previous" length is 8
    i = 0
    n = len(lengths)
    while i < n:
        ln = int(lengths[i])
        if ln == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 3:
                take = min(run, 138)
                if run - take in (1, 2):
                    take = run - 3  # keep the remainder expressible
                if take <= 10:
                    toks.append((17, take - 3))
                else:
                    toks.append((18, take - 11))
                run -= take
            toks.extend([(0, -1)] * run)
            i = j
        else:
            toks.append((ln, -1))
            prev_nz = ln
            j = i + 1
            run = 0
            while j < n and lengths[j] == prev_nz:
                j += 1
                run += 1
            while run >= 3:
                take = min(run, 6)
                if run - take in (1, 2):
                    take = run - 3
                toks.append((16, take - 3))
                run -= take
            toks.extend([(prev_nz, -1)] * run)
            i = j
    return toks


def prefix_encode_value(v: int) -> tuple[int, int, int]:
    """VP8L backward-reference value → (prefix code, n extra bits, extra
    value); spec 4.2.1 ("prefix coding" of lengths and distances)."""
    if v <= 2:
        return v - 1, 0, 0
    x = v - 1
    highest = x.bit_length() - 1
    second = (x >> (highest - 1)) & 1
    extra_bits = highest - 1
    code = 2 * highest + second
    return code, extra_bits, x & ((1 << extra_bits) - 1)
