"""S6 GeoTIFF sink + S2 scan: pure-numpy TIFF 6.0/GeoTIFF 1.1 writer and
reader, roundtrip through the tile engine."""

import numpy as np
import pytest

from trefoil_spark.grid.bbox import BBox
from trefoil_spark.raster.gridspec import GridSpec
from trefoil_spark.raster.synth import block_values, synthetic_tiles
from trefoil_spark.sources.geotiff import (
    geotiff_to_tiles,
    read_geotiff,
    save_window_geotiff,
    write_geotiff,
)

SPEC = GridSpec.from_bbox(BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326"), 512, 256)


def test_write_read_roundtrip_float32(tmp_path):
    rng = np.random.default_rng(5)
    data = rng.normal(size=(37, 53)).astype(np.float32)
    p = str(tmp_path / "a.tif")
    write_geotiff(p, data, x0=-125.0, y0=38.0, dx=0.1, dy=0.1, nodata=-9999.0)
    back, meta = read_geotiff(p)
    assert np.array_equal(back, data)
    assert meta["x0"] == -125.0 and meta["y0"] == 38.0
    assert meta["dx"] == 0.1 and meta["crs"] == "EPSG:4326"
    assert meta["nodata"] == -9999.0


def test_write_read_uint8_and_3857(tmp_path):
    data = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = str(tmp_path / "b.tif")
    write_geotiff(p, data, x0=0.0, y0=100.0, dx=10.0, dy=10.0, crs="EPSG:3857")
    back, meta = read_geotiff(p)
    assert np.array_equal(back, data)
    assert meta["crs"] == "EPSG:3857"


def test_single_row_inline_strip(tmp_path):
    """h == 1 exercises the inline (≤4 byte) strip-offset encoding."""
    data = np.array([[1.5, 2.5, 3.5]], dtype=np.float32)
    p = str(tmp_path / "c.tif")
    write_geotiff(p, data, x0=0.0, y0=0.0, dx=1.0, dy=1.0)
    back, _ = read_geotiff(p)
    assert np.array_equal(back, data)


def test_window_export_and_reingest(spark, tmp_path):
    """tiles → window GeoTIFF → back to tiles: values identical (NaN ↔
    nodata), grid metadata carried through."""
    tiles = synthetic_tiles(spark, SPEC)
    bbox = BBox((-122.3, 33.1, -115.7, 36.9), "EPSG:4326")
    p = str(tmp_path / "win.tif")
    meta = save_window_geotiff(p, tiles, SPEC, bbox)

    w = SPEC.window_for_bbox(bbox)
    full = np.full((SPEC.height, SPEC.width), np.nan, dtype=np.float32)
    for ty in range(SPEC.ntiles_y):
        for tx in range(SPEC.ntiles_x):
            b = block_values(SPEC, 0, ty, tx)
            full[ty * 256 : ty * 256 + b.shape[0], tx * 256 : tx * 256 + b.shape[1]] = b
    want = full[w.y_slice, w.x_slice]

    spec2, tiles2 = geotiff_to_tiles(spark, p, tile=64)
    assert (spec2.height, spec2.width) == want.shape
    assert spec2.x0 == meta["x0"] and spec2.crs == "EPSG:4326"
    got = np.full(want.shape, np.nan, dtype=np.float32)
    for r in tiles2.collect():
        blk = np.frombuffer(r["block"], dtype=np.float32).reshape(r["h"], r["w"])
        got[r["ty"] * 64 : r["ty"] * 64 + r["h"], r["tx"] * 64 : r["tx"] * 64 + r["w"]] = blk
    assert np.array_equal(got, want, equal_nan=True)


def test_reader_rejects_compressed(tmp_path):
    p = str(tmp_path / "bad.tif")
    data = np.zeros((2, 2), dtype=np.float32)
    write_geotiff(p, data, 0, 0, 1, 1)
    raw = bytearray(open(p, "rb").read())
    # flip the compression tag value to 5 (LZW)
    import struct

    (n,) = struct.unpack_from("<H", raw, 8)
    for i in range(n):
        tag = struct.unpack_from("<H", raw, 10 + i * 12)[0]
        if tag == 259:
            struct.pack_into("<H", raw, 10 + i * 12 + 8, 5)
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="uncompressed"):
        read_geotiff(p)
