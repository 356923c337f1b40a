"""Foreign-stream GIF decode (r6, VERDICT r5 item 1): fixtures are
hand-packed code lists and an independently written forward-twin LZW
compressor (string-keyed, deferred-clear — structurally different from
trefoil_spark.functions.gif._lzw_encode), so a decoder bug cannot cancel
against its own encoder.  Covers: literal streams, dictionary
references, the KwKwK case, the 3->4 bit width boundary, deferred clear
at a full table, interlace, local color tables, GCE transparency,
animated multi-frame compositing with disposal 1/2/3, GIF87a, 1-byte
sub-block framing, and malformed-stream errors.

Reference parity context: trefoil delegates image I/O to PIL
(trefoil/cli/utilities.py:16-34); this suite covers the decode
direction PIL would provide there.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from trefoil_spark.functions.gif import (
    _lzw_decode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)

# ---------------------------------------------------------------------------
# fixture builders (independent of the module's encoder)
# ---------------------------------------------------------------------------


def pack_codes(codes: list[tuple[int, int]]) -> bytes:
    """[(code, width)] -> LSB-first packed bytes (GIF bit order)."""
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes:
        assert code < (1 << width)
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def twin_lzw(indices: list[int], mcs: int, defer_clear: bool = False):
    """Forward-twin GIF LZW compressor: string-keyed dictionary, emits
    (code, width) pairs. With defer_clear=True the table freezes at 4096
    and existing codes keep flowing (spec-legal; the module's encoder
    never produces this shape)."""
    clear = 1 << mcs
    eoi = clear + 1
    codes: list[tuple[int, int]] = []
    width = mcs + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    codes.append((clear, width))
    seq = b""
    for k in indices:
        cand = seq + bytes([k])
        if cand in table:
            seq = cand
            continue
        codes.append((table[seq], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        elif not defer_clear:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        seq = bytes([k])
    if seq:
        codes.append((table[seq], width))
    codes.append((eoi, width))
    return codes


def subblocks(raw: bytes, size: int = 255) -> bytes:
    out = bytearray()
    for i in range(0, len(raw), size):
        chunk = raw[i : i + size]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def build_gif(
    w,
    h,
    gct,
    images,
    sig=b"GIF89a",
    bg=0,
    subblock_size=255,
):
    """images: list of dicts with keys x,y,w,h,codes(list[(code,width)]),
    mcs, and optional lct, interlace, gce=(disposal, transparent_idx)."""
    out = bytearray(sig)
    packed = 0
    if gct is not None:
        bits = max(1, (len(gct) - 1).bit_length())
        assert len(gct) == 1 << bits
        packed = 0x80 | (bits - 1)
    out += struct.pack("<HHBBB", w, h, packed, bg, 0)
    if gct is not None:
        out += np.asarray(gct, dtype=np.uint8).tobytes()
    for im in images:
        gce = im.get("gce")
        if gce is not None:
            disposal, tidx = gce
            flags = (disposal & 7) << 2 | (1 if tidx >= 0 else 0)
            out += b"\x21\xf9\x04" + bytes(
                [flags, 0, 0, max(tidx, 0)]
            ) + b"\x00"
        ipacked = 0x40 if im.get("interlace") else 0
        lct = im.get("lct")
        if lct is not None:
            bits = max(1, (len(lct) - 1).bit_length())
            ipacked |= 0x80 | (bits - 1)
        out += b"\x2c" + struct.pack(
            "<HHHHB", im["x"], im["y"], im["w"], im["h"], ipacked
        )
        if lct is not None:
            out += np.asarray(lct, dtype=np.uint8).tobytes()
        out.append(im["mcs"])
        out += subblocks(pack_codes(im["codes"]), subblock_size)
    out += b"\x3b"
    return bytes(out)


PAL4 = [(10, 20, 30), (200, 0, 0), (0, 200, 0), (0, 0, 200)]


# ---------------------------------------------------------------------------
# hand-packed LZW streams (decoder vs pencil-and-paper expectations)
# ---------------------------------------------------------------------------


class TestHandPackedLZW:
    def test_literal_stream_with_width_growth(self):
        # pixels [0,1,2,3,0,1]: decoder appends from the 2nd code and
        # must widen 3->4 bits at table length 7 (the decode-lag rule)
        codes = [(4, 3), (0, 3), (1, 3), (2, 4), (3, 4), (0, 4), (1, 4), (5, 4)]
        got = _lzw_decode(pack_codes(codes), 2, 6)
        np.testing.assert_array_equal(got, [0, 1, 2, 3, 0, 1])

    def test_dictionary_reference_and_kwkwk(self):
        # pixels [0,1,0,1,0,1,0]: emits ref code 6 then the KwKwK code 8
        codes = [(4, 3), (0, 3), (1, 3), (6, 4), (8, 4), (5, 4)]
        got = _lzw_decode(pack_codes(codes), 2, 7)
        np.testing.assert_array_equal(got, [0, 1, 0, 1, 0, 1, 0])

    def test_mid_stream_clear_resets_width_and_table(self):
        # [0,1] grows the table, clear resets, then 3-bit literals again
        codes = [
            (4, 3), (0, 3), (1, 3),  # table len 7 -> width now 4
            (4, 4),                  # clear (emitted at current width)
            (3, 3), (2, 3), (5, 3),
        ]
        got = _lzw_decode(pack_codes(codes), 2, 4)
        np.testing.assert_array_equal(got, [0, 1, 3, 2])

    def test_first_code_must_be_literal(self):
        with pytest.raises(ValueError, match="literal"):
            _lzw_decode(pack_codes([(4, 3), (6, 3)]), 2, 2)

    def test_out_of_range_code_rejected(self):
        with pytest.raises(ValueError, match="out of range"):
            _lzw_decode(pack_codes([(4, 3), (0, 3), (7, 3)]), 2, 9)

    def test_truncated_stream_rejected(self):
        with pytest.raises(ValueError, match="truncated|ended"):
            _lzw_decode(pack_codes([(4, 3), (0, 3)]), 2, 50)


class TestTwinCompressor:
    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_random_stream_roundtrips_through_decoder(self, mcs):
        rng = np.random.default_rng(mcs)
        idx = rng.integers(0, 1 << mcs, 5000).tolist()
        raw = pack_codes(twin_lzw(idx, mcs))
        got = _lzw_decode(raw, mcs, len(idx))
        np.testing.assert_array_equal(got, idx)

    def test_deferred_clear_full_table(self):
        # enough 2-bit noise to assign all 4096 codes, then keep going
        # with a frozen table — the module's encoder always clears here
        rng = np.random.default_rng(99)
        idx = rng.integers(0, 4, 60000).tolist()
        codes = twin_lzw(idx, 2, defer_clear=True)
        assert sum(1 for c, _ in codes[1:] if c == 4) == 0  # no mid clears
        assert max(c for c, _ in codes) >= 4000  # table actually filled
        got = _lzw_decode(pack_codes(codes), 2, len(idx))
        np.testing.assert_array_equal(got, idx)


# ---------------------------------------------------------------------------
# container-level foreign fixtures
# ---------------------------------------------------------------------------


def _codes_for(pixels: list[int], mcs: int) -> list[tuple[int, int]]:
    return twin_lzw(pixels, mcs)


class TestForeignContainers:
    def test_gif87a_global_palette(self):
        pix = [0, 1, 2, 3, 3, 2, 1, 0, 0, 0, 1, 1]
        g = build_gif(
            4, 3, PAL4,
            [dict(x=0, y=0, w=4, h=3, mcs=2, codes=_codes_for(pix, 2))],
            sig=b"GIF87a",
        )
        got = decode_gif(g)
        want = np.array(PAL4, dtype=np.uint8)[np.array(pix).reshape(3, 4)]
        np.testing.assert_array_equal(got, want)

    def test_one_byte_subblocks(self):
        pix = list(np.arange(16) % 4)
        g = build_gif(
            4, 4, PAL4,
            [dict(x=0, y=0, w=4, h=4, mcs=2, codes=_codes_for(pix, 2))],
            subblock_size=1,
        )
        want = np.array(PAL4, dtype=np.uint8)[np.array(pix).reshape(4, 4)]
        np.testing.assert_array_equal(decode_gif(g), want)

    def test_interlaced_rows_deinterleave(self):
        # 4x8 image, one palette index per row -> row r must come back
        # as color r even though the stream stores pass order 0,4,2,6,1,3,5,7
        pal8 = [(i * 30, 255 - i * 30, i) for i in range(8)]
        rows_screen = np.repeat(np.arange(8), 4).reshape(8, 4)
        pass_order = [0, 4, 2, 6, 1, 3, 5, 7]
        stream_pix = np.concatenate(
            [rows_screen[r] for r in pass_order]
        ).tolist()
        g = build_gif(
            4, 8, pal8,
            [dict(x=0, y=0, w=4, h=8, mcs=3,
                  codes=_codes_for(stream_pix, 3), interlace=True)],
        )
        want = np.array(pal8, dtype=np.uint8)[rows_screen]
        np.testing.assert_array_equal(decode_gif(g), want)

    def test_local_palette_overrides_global(self):
        lct = [(5, 6, 7), (8, 9, 10), (11, 12, 13), (14, 15, 16)]
        pix = [0, 1, 2, 3]
        g = build_gif(
            2, 2, PAL4,
            [dict(x=0, y=0, w=2, h=2, mcs=2,
                  codes=_codes_for(pix, 2), lct=lct)],
        )
        want = np.array(lct, dtype=np.uint8)[np.array(pix).reshape(2, 2)]
        np.testing.assert_array_equal(decode_gif(g), want)

    def test_transparency_shows_background(self):
        # bg color index 1 (red); pixel index 3 declared transparent
        pix = [0, 3, 3, 2]
        g = build_gif(
            2, 2, PAL4,
            [dict(x=0, y=0, w=2, h=2, mcs=2,
                  codes=_codes_for(pix, 2), gce=(0, 3))],
            bg=1,
        )
        got = decode_gif(g)
        np.testing.assert_array_equal(got[0, 0], PAL4[0])
        np.testing.assert_array_equal(got[0, 1], PAL4[1])  # bg fills
        np.testing.assert_array_equal(got[1, 0], PAL4[1])
        np.testing.assert_array_equal(got[1, 1], PAL4[2])
        # RGBA surface: transparent pixels carry alpha 0
        frames = decode_gif_frames(g)
        assert frames[0][0, 1, 3] == 0 and frames[0][0, 0, 3] == 255

    def test_animation_disposal_keep_and_background(self):
        # frame 1 fills 4x4 with color 0 (disposal=keep); frame 2 paints
        # a 2x2 patch color 1 at (1,1) with disposal=background; frame 3
        # paints 1x1 color 2 at (0,0). After frame 2's disposal the patch
        # region is cleared, so frame 3's canvas shows color 0 ONLY
        # outside the patch.
        f1 = dict(x=0, y=0, w=4, h=4, mcs=2,
                  codes=_codes_for([0] * 16, 2), gce=(1, -1))
        f2 = dict(x=1, y=1, w=2, h=2, mcs=2,
                  codes=_codes_for([1] * 4, 2), gce=(2, -1))
        f3 = dict(x=0, y=0, w=1, h=1, mcs=2,
                  codes=_codes_for([2], 2), gce=(1, -1))
        frames = decode_gif_frames(build_gif(4, 4, PAL4, [f1, f2, f3]))
        assert len(frames) == 3
        np.testing.assert_array_equal(
            frames[0][..., :3],
            np.broadcast_to(np.array(PAL4[0], np.uint8), (4, 4, 3)),
        )
        np.testing.assert_array_equal(frames[1][1, 1, :3], PAL4[1])
        np.testing.assert_array_equal(frames[1][0, 0, :3], PAL4[0])
        # frame 3: patch was restored-to-background (transparent)
        assert frames[2][1, 1, 3] == 0
        np.testing.assert_array_equal(frames[2][0, 0, :3], PAL4[2])
        np.testing.assert_array_equal(frames[2][3, 3, :3], PAL4[0])

    def test_animation_disposal_previous(self):
        # frame 2 uses disposal=3: frame 3's canvas must match frame 1's
        f1 = dict(x=0, y=0, w=2, h=2, mcs=2,
                  codes=_codes_for([0, 1, 2, 3], 2), gce=(1, -1))
        f2 = dict(x=0, y=0, w=2, h=2, mcs=2,
                  codes=_codes_for([3, 3, 3, 3], 2), gce=(3, -1))
        f3 = dict(x=0, y=0, w=1, h=1, mcs=2,
                  codes=_codes_for([1], 2), gce=(0, -1))
        frames = decode_gif_frames(build_gif(2, 2, PAL4, [f1, f2, f3]))
        want1 = np.array(PAL4, np.uint8)[np.array([0, 1, 2, 3]).reshape(2, 2)]
        np.testing.assert_array_equal(frames[0][..., :3], want1)
        np.testing.assert_array_equal(
            frames[1][..., :3], np.array(PAL4, np.uint8)[np.full((2, 2), 3)]
        )
        np.testing.assert_array_equal(frames[2][0, 0, :3], PAL4[1])
        np.testing.assert_array_equal(frames[2][0, 1, :3], want1[0, 1])
        np.testing.assert_array_equal(frames[2][1, 1, :3], want1[1, 1])

    def test_comment_and_application_extensions_skipped(self):
        pix = [0, 1, 2, 3]
        g = build_gif(
            2, 2, PAL4,
            [dict(x=0, y=0, w=2, h=2, mcs=2, codes=_codes_for(pix, 2))],
        )
        # splice a NETSCAPE app extension + comment before the descriptor
        head, img = g[: 13 + 12], g[13 + 12 :]
        app = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
        com = b"\x21\xfe\x05hello\x00"
        got = decode_gif(head + app + com + img)
        want = np.array(PAL4, np.uint8)[np.array(pix).reshape(2, 2)]
        np.testing.assert_array_equal(got, want)


class TestMalformedGif:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            decode_gif(b"NOTAGIF" + b"\x00" * 20)

    def test_pixel_index_outside_palette(self):
        # palette of 2 entries but a literal code 3 in the stream
        pal2 = [(0, 0, 0), (255, 255, 255)]
        g = build_gif(
            2, 1, pal2,
            [dict(x=0, y=0, w=2, h=1, mcs=2, codes=_codes_for([0, 3], 2))],
        )
        with pytest.raises(ValueError, match="outside color table"):
            decode_gif(g)

    def test_image_past_logical_screen(self):
        g = build_gif(
            2, 2, PAL4,
            [dict(x=1, y=0, w=2, h=2, mcs=2,
                  codes=_codes_for([0, 1, 2, 3], 2))],
        )
        with pytest.raises(ValueError, match="logical screen"):
            decode_gif(g)

    def test_truncated_subblock_chain(self):
        pix = [0, 1, 2, 3]
        g = build_gif(
            2, 2, PAL4,
            [dict(x=0, y=0, w=2, h=2, mcs=2, codes=_codes_for(pix, 2))],
        )
        with pytest.raises(ValueError):
            decode_gif(g[:-4])

    def test_no_color_table_anywhere(self):
        g = bytearray(b"GIF89a")
        g += struct.pack("<HHBBB", 1, 1, 0, 0, 0)  # no GCT
        g += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)  # no LCT
        g += bytes([2]) + subblocks(pack_codes([(4, 3), (0, 3), (5, 3)]))
        g += b"\x3b"
        with pytest.raises(ValueError, match="no color table"):
            decode_gif(bytes(g))


class TestEncoderRoundtrip:
    def test_lossless_under_256_colors(self):
        rng = np.random.default_rng(7)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 256, (48, 32))]
        np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)

    def test_interlaced_encode_roundtrip(self):
        rng = np.random.default_rng(8)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 16, (33, 9))]
        np.testing.assert_array_equal(
            decode_gif(encode_gif(img, interlace=True)), img
        )

    def test_too_many_colors_rejected(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        assert len(np.unique(
            img.reshape(-1, 3), axis=0)) > 256
        with pytest.raises(ValueError, match="quantize"):
            encode_gif(img)
