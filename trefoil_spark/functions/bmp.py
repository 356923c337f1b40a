"""BMP (Windows bitmap) and ICO (favicon container) codecs — pure
numpy, no external libs.

Closes the last common crawl-image tail after JPEG/PNG/GIF/WebP: BMPs
still appear as legacy payloads and nearly every site serves a
/favicon.ico, whose container is an ICONDIR of BMP-without-fileheader
entries (with a 1-bit AND transparency mask) or, since Vista, embedded
PNG — the PNG leg delegates to functions/png.py.

Decode envelope (all public, the Windows BITMAPINFOHEADER family):
  - headers: BITMAPCOREHEADER (12, OS/2) and BITMAPINFOHEADER 40/52/56/
    108/124 (V2–V5 accepted; the extra color-space fields are ignored);
  - depths 1/4/8 palettized, 16 (555 default or BITFIELDS), 24 BGR,
    32 BGRX / BITFIELDS (incl. alpha when the mask says so);
  - compressions BI_RGB, BI_RLE8, BI_RLE4 (runs, absolute mode, EOL,
    EOB, delta), BI_BITFIELDS / BI_ALPHABITFIELDS;
  - bottom-up (default) and top-down (negative height) row orders.

Encoder twins: encode_bmp (24-bit BI_RGB) and encode_bmp_rle8 for
round-trip tests; foreign-fixture tests hand-build streams instead of
trusting these.

Reference context: the reference delegates all image formats to PIL
(trefoil/cli/utilities.py:16-34); this module re-implements the BMP/ICO
subset from the public format layouts.
"""

from __future__ import annotations

import struct

import numpy as np

BI_RGB, BI_RLE8, BI_RLE4, BI_BITFIELDS = 0, 1, 2, 3
BI_ALPHABITFIELDS = 6


def _mask_shift(mask: int) -> tuple[int, int]:
    """(right-shift, bit-width) of a contiguous channel mask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    return shift, width


def _expand_channel(vals: np.ndarray, mask: int) -> np.ndarray:
    """Masked integer samples → uint8 with correct scaling (v*255/max)."""
    shift, width = _mask_shift(mask)
    if width == 0:
        return np.zeros(vals.shape, np.uint8)
    c = (vals >> shift) & ((1 << width) - 1)
    if width == 8:
        return c.astype(np.uint8)
    return ((c.astype(np.uint32) * 255 + ((1 << width) - 1) // 2)
            // ((1 << width) - 1)).astype(np.uint8)


def _unpack_indices(raw: bytes, w: int, h: int, bpp: int,
                    top_down: bool) -> np.ndarray:
    """Padded palettized scanlines (1/4/8 bpp, MSB-first) → (h, w) idx."""
    stride = ((w * bpp + 31) // 32) * 4
    if len(raw) < stride * h:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(raw[: stride * h], np.uint8).reshape(h, stride)
    if bpp == 8:
        idx = rows[:, :w]
    else:
        bits = np.unpackbits(rows, axis=1)
        if bpp == 1:
            idx = bits[:, :w]
        else:  # 4: high nibble first
            nib = bits.reshape(h, -1, 4)
            idx = (nib[..., 0] * 8 + nib[..., 1] * 4
                   + nib[..., 2] * 2 + nib[..., 3])[:, :w]
    idx = idx.astype(np.uint8)
    return idx if top_down else idx[::-1]


def _decode_rle(data: bytes, w: int, h: int, bpp: int,
                top_down: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4: (count, value) runs; escape 0 → EOL / EOB /
    delta(dx, dy) / absolute mode (word-aligned). Rows are stored
    bottom-up; delta moves toward higher stored rows.

    Hot loop is plain bytearray slicing — per-run numpy allocation made
    the worst case (noise input, all runs length 1-2) slower than the
    JPEG decoder."""
    rows = [bytearray(w) for _ in range(h)]
    x = y = pos = 0
    end = False
    n_data = len(data)
    while pos + 1 < n_data and not end:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if y < h and x < w:
                n = min(cnt, w - x)
                if bpp == 8:
                    rows[y][x : x + n] = bytes((val,)) * n
                else:
                    pat = bytes((val >> 4, val & 0xF)) * ((n + 2) // 2)
                    rows[y][x : x + n] = pat[:n]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            end = True
        elif val == 2:  # delta
            if pos + 1 >= n_data:
                raise ValueError("BMP RLE delta truncated")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val literal pixels, word-aligned
            nbytes = (val if bpp == 8 else (val + 1) // 2)
            nbytes += nbytes & 1
            chunk = data[pos : pos + nbytes]
            if len(chunk) < nbytes:
                raise ValueError("BMP RLE absolute run truncated")
            pos += nbytes
            if y < h and x < w:
                n = min(val, w - x)
                if bpp == 8:
                    rows[y][x : x + n] = chunk[:n]
                else:
                    lit = bytearray()
                    for b in chunk:
                        lit.append(b >> 4)
                        lit.append(b & 0xF)
                    rows[y][x : x + n] = lit[:n]
            x += val
    idx = np.frombuffer(b"".join(rows), np.uint8).reshape(h, w)
    # stored bottom-up (RLE is never top-down per spec)
    return idx if top_down else idx[::-1]


def _parse_dib(data: bytes, pos: int):
    """DIB header at pos → (w, h, bpp, comp, palette_n, masks, hdr_size,
    top_down). Handles BITMAPCOREHEADER and the INFOHEADER family."""
    (hsz,) = struct.unpack_from("<I", data, pos)
    if hsz == 12:  # BITMAPCOREHEADER: uint16 dims, no compression field
        w, h, planes, bpp = struct.unpack_from("<HHHH", data, pos + 4)
        return w, h, bpp, BI_RGB, 0, None, hsz, False
    if hsz not in (40, 52, 56, 64, 108, 124):
        raise ValueError(f"unsupported BMP header size {hsz}")
    w, h, planes, bpp, comp, _isz, _xp, _yp, nclr, _imp = struct.unpack_from(
        "<iihhIIiiII", data, pos + 4
    )
    top_down = h < 0
    h = abs(h)
    masks = None
    if comp in (BI_BITFIELDS, BI_ALPHABITFIELDS):
        if hsz >= 52:
            nm = 4 if hsz >= 56 else 3
            masks = list(struct.unpack_from(f"<{nm}I", data, pos + 40))
        else:  # header 40: masks follow the header
            nm = 4 if comp == BI_ALPHABITFIELDS else 3
            masks = list(struct.unpack_from(f"<{nm}I", data, pos + 40))
            hsz += 4 * nm
        if len(masks) == 3:
            masks.append(0)
    return w, h, bpp, comp, nclr, masks, hsz, top_down


def _decode_dib(data: bytes, pos: int, pix_pos: int | None,
                ico_mask: bool = False) -> np.ndarray:
    """Decode a DIB (header + palette + pixels) → (h, w, 3|4) uint8 RGB.

    ico_mask: the DIB's stated height is doubled and a 1-bit AND
    transparency mask follows the XOR pixel data (ICO layout)."""
    w, h, bpp, comp, nclr, masks, hsz, top_down = _parse_dib(data, pos)
    if ico_mask:
        if h % 2:
            raise ValueError("ICO DIB height must be doubled")
        h //= 2
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError(f"implausible BMP dimensions {w}x{h}")
    pal_pos = pos + hsz
    pal = None
    if bpp <= 8:
        n = nclr or (1 << bpp)
        entry = 3 if hsz == 12 else 4  # core header packs RGB triples
        raw = data[pal_pos : pal_pos + n * entry]
        if len(raw) < n * entry:
            raise ValueError("BMP palette truncated")
        tbl = np.frombuffer(raw, np.uint8).reshape(n, entry)
        pal = tbl[:, [2, 1, 0]]  # stored BGR(A) → RGB
        pal_pos += n * entry
    if pix_pos is None:  # ICO DIBs have no file header / pixel offset
        pix_pos = pal_pos
    pix = data[pix_pos:]

    if comp in (BI_RLE8, BI_RLE4):
        if bpp not in (8, 4) or (comp == BI_RLE8) != (bpp == 8):
            raise ValueError("BMP RLE compression/depth mismatch")
        idx = _decode_rle(pix, w, h, bpp, top_down)
        rgb = pal[np.minimum(idx, len(pal) - 1)]
    elif bpp <= 8:
        idx = _unpack_indices(pix, w, h, bpp, top_down)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("BMP palette index out of range")
        rgb = pal[idx]
    elif bpp in (16, 32):
        stride = ((w * bpp + 31) // 32) * 4
        if len(pix) < stride * h:
            raise ValueError("BMP pixel data truncated")
        dt = np.uint16 if bpp == 16 else np.uint32
        rows = np.frombuffer(pix[: stride * h], np.uint8).reshape(h, stride)
        vals = (
            np.ascontiguousarray(rows[:, : w * bpp // 8])
            .view(dt)
            .reshape(h, w)
            .astype(np.uint32)
        )
        if masks is None:
            # 32bpp ICO XOR data is ARGB in practice (alpha in byte 3,
            # the AND mask is legacy) — mirror the PIL/Windows reading.
            a32 = 0xFF000000 if ico_mask else 0
            masks = ([0x7C00, 0x03E0, 0x001F, 0] if bpp == 16
                     else [0xFF0000, 0x00FF00, 0x0000FF, a32])
        chans = [_expand_channel(vals, m) for m in masks[:3]]
        if masks[3]:
            chans.append(_expand_channel(vals, masks[3]))
        rgb = np.stack(chans, -1)
        if not top_down:
            rgb = rgb[::-1]
    elif bpp == 24:
        stride = ((w * 3 + 3) // 4) * 4
        if len(pix) < stride * h:
            raise ValueError("BMP pixel data truncated")
        rows = np.frombuffer(pix[: stride * h], np.uint8).reshape(h, stride)
        rgb = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]
        if not top_down:
            rgb = rgb[::-1]
    else:
        raise ValueError(f"unsupported BMP depth {bpp}")

    rgb = np.ascontiguousarray(rgb)
    if ico_mask and (rgb.shape[-1] == 3 or not (masks and masks[3])):
        # AND mask: 1-bit, 32-bit-padded rows, bottom-up; 1 = transparent
        xor_bytes = ((w * bpp + 31) // 32) * 4 * h
        mask_off = pix_pos + xor_bytes
        mstride = ((w + 31) // 32) * 4
        mraw = data[mask_off : mask_off + mstride * h]
        if len(mraw) == mstride * h:
            mrows = np.frombuffer(mraw, np.uint8).reshape(h, mstride)
            mbits = np.unpackbits(mrows, axis=1)[:, :w][::-1]
            alpha = np.where(mbits == 1, 0, 255).astype(np.uint8)
        else:  # tolerate a missing mask: fully opaque
            alpha = np.full((h, w), 255, np.uint8)
        if rgb.shape[-1] == 4:
            rgb = rgb[..., :3]
        rgb = np.concatenate([rgb, alpha[..., None]], -1)
    return rgb


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP file bytes → (h, w, 3|4) uint8 RGB(A)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    if len(data) < 18:
        raise ValueError("BMP header truncated")
    (offset,) = struct.unpack_from("<I", data, 10)
    if offset == 0 or offset > len(data):
        raise ValueError("BMP pixel offset out of range")
    return _decode_dib(data, 14, offset)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP (bottom-up, padded)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3)")
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    pix = rows.tobytes()
    dib = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, BI_RGB,
                      len(pix), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + len(dib) + len(pix), 0, 0,
                      14 + len(dib))
    return hdr + dib + pix


def _rle8_pack(idx: np.ndarray) -> bytes:
    """(h, w) uint8 indices → BI_RLE8 run-coded bytes (simple run
    coding, bottom-up rows, EOL per row, EOB at end). Shared by the
    BMP twin and the AVI BI_RLE8 twin."""
    h, w = idx.shape
    out = bytearray()
    for row in idx[::-1]:  # stored bottom-up
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            out += bytes((run, int(row[x])))
            x += run
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return bytes(out)


def encode_bmp_rle8(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 indices + (n, 3) RGB palette → BI_RLE8 BMP twin
    (simple run coding, EOL per row, EOB at end)."""
    idx = np.asarray(idx, np.uint8)
    palette = np.asarray(palette, np.uint8)
    h, w = idx.shape
    out = _rle8_pack(idx)
    pal = np.zeros((len(palette), 4), np.uint8)
    pal[:, :3] = palette[:, ::-1]
    dib = struct.pack("<IiihhIIiiII", 40, w, h, 1, 8, BI_RLE8,
                      len(out), 2835, 2835, len(palette), 0)
    off = 14 + len(dib) + pal.size
    hdr = struct.pack("<2sIHHI", b"BM", off + len(out), 0, 0, off)
    return hdr + dib + pal.tobytes() + bytes(out)


# --------------------------------------------------------------------- ICO
def decode_ico(data: bytes) -> np.ndarray:
    """ICO favicon bytes → (h, w, 4) uint8 RGBA of the LARGEST entry
    (ties: higher bit depth). Entries are PNG (delegated to
    functions/png.py) or BMP-without-fileheader with doubled height and
    an AND transparency mask."""
    if len(data) < 6:
        raise ValueError("ICO header truncated")
    rsv, typ, count = struct.unpack_from("<HHH", data, 0)
    if rsv != 0 or typ not in (1, 2) or count == 0:
        raise ValueError("not an ICO file")
    best = None
    for i in range(count):
        e = 6 + 16 * i
        if e + 16 > len(data):
            raise ValueError("ICO directory truncated")
        bw, bh, _ncol, _rsv, _planes, bcount, size, off = struct.unpack_from(
            "<BBBBHHII", data, e
        )
        bw, bh = bw or 256, bh or 256
        key = (bw * bh, bcount)
        if best is None or key > best[0]:
            best = (key, off, size)
    _, off, size = best
    if off + size > len(data):
        raise ValueError("ICO image data out of range")
    blob = data[off : off + size]
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        img = decode_png(blob)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], -1
            )
        return img.astype(np.uint8)
    img = _decode_dib(data, off, None, ico_mask=True)
    if img.shape[-1] == 3:
        img = np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], -1
        )
    return img


def encode_ico(img: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 → single-entry ICO (32-bit BMP leg with AND
    mask derived from alpha==0). Encoder twin for decode tests."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    if h > 256 or w > 256:
        raise ValueError("ICO entries are at most 256x256")
    if img.shape[-1] == 3:
        img = np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], -1
        )
    bgra = img[::-1][..., [2, 1, 0, 3]].tobytes()
    mstride = ((w + 31) // 32) * 4
    mbits = np.zeros((h, mstride * 8), np.uint8)
    mbits[:, :w] = (img[::-1, :, 3] == 0).astype(np.uint8)
    mask = np.packbits(mbits, axis=1).tobytes()
    dib = struct.pack("<IiihhIIiiII", 40, w, h * 2, 1, 32, BI_RGB,
                      len(bgra) + len(mask), 0, 0, 0, 0)
    blob = dib + bgra + mask
    entry = struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                        len(blob), 6 + 16)
    return struct.pack("<HHH", 0, 1, 1) + entry + blob
