"""EXIF orientation (r6): hand-built foreign APP1 blocks (both TIFF
byte orders), orientation parse, and upright correction — the
camera-rotated crawl JPEG case."""

import struct

import numpy as np
import pytest

from trefoil_spark.functions.jpeg import (
    apply_exif_orientation,
    decode_jpeg,
    decode_jpeg_oriented,
    encode_jpeg,
    exif_orientation,
)


def exif_app1(orientation: int, endian: str = "<") -> bytes:
    """Minimal foreign Exif APP1: one IFD0 entry (0x0112 SHORT)."""
    tag = struct.pack(endian + "HHI", 0x0112, 3, 1) + struct.pack(
        endian + "H", orientation
    ) + b"\x00\x00"
    ifd = struct.pack(endian + "H", 1) + tag + struct.pack(endian + "I", 0)
    tiff = (
        (b"II" if endian == "<" else b"MM")
        + struct.pack(endian + "H", 42)
        + struct.pack(endian + "I", 8)
        + ifd
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def splice_app1(jfif: bytes, app1: bytes) -> bytes:
    return jfif[:2] + app1 + jfif[2:]


def test_orientation_parse_both_endians():
    img = np.zeros((8, 8, 3), np.uint8)
    base = encode_jpeg(img, 90)
    assert exif_orientation(base) == 1  # no APP1 at all
    for endian in ("<", ">"):
        for o in (1, 3, 6, 8):
            j = splice_app1(base, exif_app1(o, endian))
            assert exif_orientation(j) == o
            # the extra APP1 must not disturb pixel decode
            assert np.array_equal(decode_jpeg(j), decode_jpeg(base))
    # malformed Exif body degrades to 1, decode still works
    bad = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    assert exif_orientation(splice_app1(base, bad)) == 1


def test_apply_orientation_literal_semantics():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(apply_exif_orientation(img, 1), img)
    assert np.array_equal(apply_exif_orientation(img, 2), img[:, ::-1])
    assert np.array_equal(apply_exif_orientation(img, 3), np.rot90(img, 2))
    assert np.array_equal(apply_exif_orientation(img, 4), img[::-1])
    assert np.array_equal(
        apply_exif_orientation(img, 5), img.swapaxes(0, 1)
    )
    assert np.array_equal(apply_exif_orientation(img, 6), np.rot90(img, -1))
    # transverse: flip across the anti-diagonal → img[H-1-j, W-1-i]
    assert np.array_equal(
        apply_exif_orientation(img, 7), np.rot90(img, 1)[:, ::-1]
    )
    assert np.array_equal(apply_exif_orientation(img, 8), np.rot90(img, 1))
    with pytest.raises(ValueError, match="1-8"):
        apply_exif_orientation(img, 9)


def test_oriented_decode_rights_the_scene():
    """Store a 90°-CCW-rotated sensor image + orientation 6: the
    oriented decode returns the upright scene bit-exactly (flat blocks
    survive JPEG), plain decode returns it sideways."""
    up = np.zeros((16, 32, 3), np.uint8)
    up[:, 16:] = 200  # right half bright
    stored = np.rot90(up, 1)  # camera sensor: scene rotated CCW
    j = splice_app1(encode_jpeg(np.ascontiguousarray(stored), 95), exif_app1(6))
    got = decode_jpeg_oriented(j)
    assert got.shape == up.shape
    assert np.array_equal(got, up)
    assert decode_jpeg(j).shape == stored.shape


# ---------------------------------------------------------------------------
# EXIF GPS (late r6)
# ---------------------------------------------------------------------------

def test_exif_gps_roundtrip_quadrants():
    from trefoil_spark.functions.jpeg import (
        embed_exif_gps,
        encode_jpeg,
        exif_gps,
        decode_jpeg,
    )

    img = np.full((8, 8, 3), 128, np.uint8)
    base = encode_jpeg(img, 90)
    for lat, lon in [(34.0522, -118.2437), (-33.8688, 151.2093),
                     (51.5074, -0.1278), (-22.9068, -43.1729), (0.0, 0.0)]:
        tagged = embed_exif_gps(base, lat, lon)
        got = exif_gps(tagged)
        assert got is not None
        assert abs(got[0] - lat) < 1e-7 and abs(got[1] - lon) < 1e-7
        # the added APP1 must not disturb pixel decode
        assert np.array_equal(decode_jpeg(tagged), decode_jpeg(base))
    assert exif_gps(base) is None  # untagged


def test_exif_gps_big_endian_and_malformed():
    from trefoil_spark.functions.jpeg import embed_exif_gps, encode_jpeg, exif_gps

    img = np.zeros((8, 8, 3), np.uint8)
    base = encode_jpeg(img, 90)
    tagged = bytearray(embed_exif_gps(base, 12.5, -7.25))
    # truncate the TIFF block inside APP1: must degrade to None
    i = tagged.find(b"Exif\x00\x00")
    broken = bytes(tagged[: i + 14])
    app1_len = 14 - (i - 2) + 2
    assert exif_gps(bytes(tagged[:2]) + b"\xff\xe1"
                    + app1_len.to_bytes(2, "big")
                    + bytes(tagged[4 : i + 14]) + bytes(tagged[-2:])) in (
        None,
    )


def test_image_gps_to_zonal_pipeline(spark):
    """The axis crossover: crawl images with EXIF GPS → image_gps →
    PIP join → per-zone counts. Points planted inside known zones of
    the synthetic layer."""
    from pyspark.sql import functions as F

    from trefoil_spark.functions.jpeg import embed_exif_gps, encode_jpeg
    from trefoil_spark.operators.multimodal import image_gps
    from trefoil_spark.operators.pip_join import pip_join
    from trefoil_spark.sources.zones import ZONE_LAYER

    img = np.full((8, 8, 3), 64, np.uint8)
    base = encode_jpeg(img, 90)
    pts = [
        (0, 34.0, -118.2),   # urban box (inside east)
        (1, 34.5, -122.0),   # west polygon
        (2, 33.0, -115.0),   # east polygon
        (3, 33.1, -115.1),   # east polygon
        (4, 0.0, 0.0),       # outside every zone
    ]
    rows = [(i, bytearray(embed_exif_gps(base, lat, lon)))
            for i, lat, lon in pts]
    rows.append((5, bytearray(b"\x89PNG not a jpeg")))
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    gps = image_gps(df)
    joined = pip_join(gps, ZONE_LAYER)
    counts = {
        r["zone_value"]: r["n"]
        for r in joined.groupBy("zone_value").agg(
            F.count("*").alias("n")).collect()
    }
    assert counts == {"urban": 1, "west": 1, "east": 2}
