"""BMP + ICO codec: foreign hand-built fixtures (every container field
packed by the test, pixel expectations written out literally — never
decoder self-output) plus encoder-twin round trips."""

import struct

import numpy as np
import pytest

from trefoil_spark.functions.bmp import (
    decode_bmp,
    decode_ico,
    encode_bmp,
    encode_bmp_rle8,
    encode_ico,
)


def bmp_file(dib: bytes, palette: bytes, pix: bytes) -> bytes:
    off = 14 + len(dib) + len(palette)
    return (
        struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
        + dib + palette + pix
    )


def info_header(w, h, bpp, comp=0, nclr=0) -> bytes:
    return struct.pack("<IiihhIIiiII", 40, w, h, 1, bpp, comp, 0, 0, 0,
                       nclr, 0)


def test_24bit_bottom_up_padded():
    # 3x2, stride 12 (3 pad bytes/row). Stored bottom-up BGR:
    # file row 0 = image row 1.
    row_img1 = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255]) + b"\0\0\0"
    row_img0 = bytes([1, 2, 3,  4, 5, 6,  7, 8, 9]) + b"\0\0\0"
    img = decode_bmp(bmp_file(info_header(3, 2, 24), b"",
                              row_img1 + row_img0))
    assert img.shape == (2, 3, 3)
    # BGR → RGB
    assert img[0].tolist() == [[3, 2, 1], [6, 5, 4], [9, 8, 7]]
    assert img[1].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]


def test_24bit_top_down():
    pix = bytes([10, 20, 30]) + b"\0" + bytes([40, 50, 60]) + b"\0"
    img = decode_bmp(bmp_file(info_header(1, -2, 24), b"", pix))
    assert img[0, 0].tolist() == [30, 20, 10]
    assert img[1, 0].tolist() == [60, 50, 40]


def test_8bit_palette():
    pal = bytes([0, 0, 255, 0,  0, 255, 0, 0])  # BGRA: red, green
    pix = bytes([0, 1, 0, 0])  # 2x1... w=2 stride 4
    img = decode_bmp(bmp_file(info_header(2, 1, 8, nclr=2), pal, pix))
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]


def test_4bit_and_1bit_palette():
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in
                   [(10, 11, 12), (20, 21, 22), (30, 31, 32)])
    # 4bpp, w=3: nibbles 0,1,2 → bytes 0x01 0x20, padded to 4
    img = decode_bmp(bmp_file(info_header(3, 1, 4, nclr=3), pal,
                              bytes([0x01, 0x20, 0, 0])))
    assert img[0].tolist() == [[10, 11, 12], [20, 21, 22], [30, 31, 32]]
    # 1bpp, w=10: bits 1010101010 → 0xAA 0x80
    pal1 = bytes([0, 0, 0, 0, 255, 255, 255, 0])
    img = decode_bmp(bmp_file(info_header(10, 1, 1, nclr=2), pal1,
                              bytes([0xAA, 0x80, 0, 0])))
    assert img[0, :, 0].tolist() == [255, 0] * 5


def test_16bit_555_default_and_565_bitfields():
    # 555: 0x7FFF = white; 0x7C00 = pure red
    pix = struct.pack("<HH", 0x7FFF, 0x7C00)
    img = decode_bmp(bmp_file(info_header(2, 1, 16), b"", pix))
    assert img[0, 0].tolist() == [255, 255, 255]
    assert img[0, 1].tolist() == [255, 0, 0]
    # 565 via BITFIELDS (masks follow a 40-byte header)
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    pix = struct.pack("<HH", 0xFFFF, 0x07E0)
    img = decode_bmp(bmp_file(info_header(2, 1, 16, comp=3) + masks,
                              b"", pix))
    assert img[0, 0].tolist() == [255, 255, 255]
    assert img[0, 1].tolist() == [0, 255, 0]


def test_32bit_default_and_alpha_bitfields_v4():
    pix = struct.pack("<I", 0x00123456)
    img = decode_bmp(bmp_file(info_header(1, 1, 32), b"", pix))
    assert img[0, 0].tolist() == [0x12, 0x34, 0x56]
    # V4 header (108 bytes) with ARGB masks → 4-channel output
    v4 = struct.pack("<IiihhIIiiII", 108, 1, 1, 1, 32, 3, 0, 0, 0, 0, 0)
    v4 += struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF,
                      0xFF000000)
    v4 += bytes(108 - len(v4))
    img = decode_bmp(bmp_file(v4, b"", struct.pack("<I", 0x80102030)))
    assert img.shape[-1] == 4
    assert img[0, 0].tolist() == [0x10, 0x20, 0x30, 0x80]


def test_core_header_os2():
    # BITMAPCOREHEADER: 12 bytes, uint16 dims, RGB-triple palette of
    # exactly 2^bpp entries (no nclr field)
    dib = struct.pack("<IHHHH", 12, 2, 1, 1, 1)
    pal = bytes([5, 6, 7]) + bytes([50, 60, 70])  # BGR triples
    img = decode_bmp(bmp_file(dib, pal, bytes([0x40, 0, 0, 0])))
    assert img[0, 0].tolist() == [7, 6, 5]
    assert img[0, 1].tolist() == [70, 60, 50]


def test_rle8_runs_eol_absolute_delta():
    pal = b"".join(bytes([i, i, i, 0]) for i in range(10))
    # 6x2 bottom-up. Stored row 0 (image row 1):
    #   run 3 of idx 2; absolute 3 literals 4,5,6 (pad to word); EOL
    # Stored row 1 (image row 0): run 2 of idx 9, delta skips the rest,EOB
    rle = bytes(
        [3, 2, 0, 3, 4, 5, 6, 0, 0, 0,
         2, 9, 0, 2, 4, 0, 0, 1]
    )
    dib = info_header(6, 2, 8, comp=1, nclr=10)
    img = decode_bmp(bmp_file(dib, pal, rle))
    assert img[1, :, 0].tolist() == [2, 2, 2, 4, 5, 6]
    assert img[0, :2, 0].tolist() == [9, 9]
    assert img[0, 2:, 0].tolist() == [0, 0, 0, 0]  # delta leaves zeros


def test_rle4():
    pal = b"".join(bytes([i, i, i, 0]) for i in range(16))
    # 5x1: run 4 alternating nibbles of 0xA7 -> a,7,a,7 then run 1 of 3
    rle = bytes([4, 0xA7, 1, 0x30, 0, 0, 0, 1])
    img = decode_bmp(bmp_file(info_header(5, 1, 4, comp=2, nclr=16),
                              pal, rle))
    assert img[0, :, 0].tolist() == [10, 7, 10, 7, 3]


def test_encode_bmp_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (7, 5, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_encode_rle8_roundtrip():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 6, (9, 13)).astype(np.uint8)
    idx[3, :] = 5  # long run
    pal = rng.integers(0, 256, (6, 3)).astype(np.uint8)
    img = decode_bmp(encode_bmp_rle8(idx, pal))
    assert np.array_equal(img, pal[idx])


def test_ico_bmp_entry_with_and_mask():
    """Hand-built 2x2 8bpp ICO: doubled-height DIB, palette, bottom-up
    XOR rows, AND mask marking pixel (0,1) transparent."""
    pal = bytes([0, 0, 255, 0,  0, 255, 0, 0])  # red, green
    xor = bytes([1, 0, 0, 0]) + bytes([0, 1, 0, 0])  # stored bottom-up
    # AND rows (bottom-up, 4-byte padded): image row 1 = 0, row 0 = pixel 1
    mask = bytes([0x00, 0, 0, 0]) + bytes([0x40, 0, 0, 0])
    dib = info_header(2, 4, 8, nclr=2)  # height doubled: 2*2
    blob = dib + pal + xor + mask
    entry = struct.pack("<BBBBHHII", 2, 2, 2, 0, 1, 8, len(blob), 22)
    ico = struct.pack("<HHH", 0, 1, 1) + entry + blob
    img = decode_ico(ico)
    assert img.shape == (2, 2, 4)
    # image row 0 = stored XOR row 1 = [green, red]... indices [0,1]?
    assert img[0, 0, :3].tolist() == [255, 0, 0]   # idx 0 → red
    assert img[0, 1, :3].tolist() == [0, 255, 0]   # idx 1 → green
    assert img[0, 1, 3] == 0                        # AND-masked out
    assert img[0, 0, 3] == 255
    assert img[1, 0, :3].tolist() == [0, 255, 0]
    assert img[1, 0, 3] == 255


def test_ico_png_entry_delegates():
    from trefoil_spark.functions.png import encode_rgb_png

    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 1] = 200
    blob = encode_rgb_png(img)
    entry = struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 32, len(blob), 22)
    out = decode_ico(struct.pack("<HHH", 0, 1, 1) + entry + blob)
    assert out.shape == (4, 4, 4)
    assert np.array_equal(out[..., :3], img)
    assert (out[..., 3] == 255).all()


def test_ico_picks_largest_entry():
    from trefoil_spark.functions.png import encode_rgb_png

    small = encode_rgb_png(np.full((2, 2, 3), 9, np.uint8))
    big = encode_rgb_png(np.full((8, 8, 3), 7, np.uint8))
    off1 = 6 + 32
    e1 = struct.pack("<BBBBHHII", 2, 2, 0, 0, 1, 32, len(small), off1)
    e2 = struct.pack("<BBBBHHII", 8, 8, 0, 0, 1, 32, len(big),
                     off1 + len(small))
    out = decode_ico(struct.pack("<HHH", 0, 1, 2) + e1 + e2 + small + big)
    assert out.shape == (8, 8, 4)
    assert out[0, 0, 0] == 7


def test_encode_ico_roundtrip_alpha():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 6, 4)).astype(np.uint8)
    out = decode_ico(encode_ico(img))
    assert np.array_equal(out, img)


def test_malformed():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(20))
    with pytest.raises(ValueError, match="truncated|range"):
        decode_bmp(bmp_file(info_header(4, 4, 24), b"", b"\0\0"))
    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(bytes(6))
    with pytest.raises(ValueError, match="header size"):
        decode_bmp(bmp_file(struct.pack("<I", 99) + bytes(36), b"",
                            b""))
