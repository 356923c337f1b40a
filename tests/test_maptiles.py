"""XYZ tile pyramid: alignment, coverage, and pixel-level render checks."""

import numpy as np
from pyspark.sql import functions as F

from trefoil_spark.functions.color import Color
from trefoil_spark.functions.png import decode_palette_png
from trefoil_spark.grid import proj
from trefoil_spark.grid.bbox import BBox
from trefoil_spark.raster.gridspec import GridSpec
from trefoil_spark.raster.maptiles import (
    render_xyz_tiles,
    stats_prepass,
    xyz_range_for_bbox,
    xyz_tile_bounds,
)
from trefoil_spark.raster.render import StretchedRenderer
from trefoil_spark.raster.synth import block_values, synthetic_tiles

REGION = BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326")
SPEC = GridSpec.from_bbox(REGION, width=1024, height=512)


def test_xyz_tile_math():
    # zoom 0: one world tile
    assert xyz_tile_bounds(0, 0, 0)[0] == -20037508.342789244
    x0, x1, y0, y1 = xyz_range_for_bbox(REGION.project("EPSG:3857"), 5)
    assert x0 <= x1 and y0 <= y1
    # region ~(-125..-113) lon → tiles west of center at z5
    b = xyz_tile_bounds(5, x0, y0)
    lon_w, _ = proj.webmercator_to_lonlat(b[0], 0.0)
    assert lon_w <= -113.0


def test_render_xyz_pipeline(spark):
    tiles = synthetic_tiles(spark, SPEC)
    vmin, vmax = stats_prepass(tiles)
    assert vmin == 0.0 and vmax == 999.0  # fixture value range

    renderer = StretchedRenderer(
        ((vmin, Color(255, 0, 0, 255)), (vmax, Color(0, 0, 255, 255)))
    )
    out = render_xyz_tiles(spark, tiles, SPEC, renderer, zoom=5).collect()
    x0, x1, y0, y1 = xyz_range_for_bbox(REGION.project("EPSG:3857"), 5)
    assert len(out) == (x1 - x0 + 1) * (y1 - y0 + 1)

    by_key = {(r["z"], r["x"], r["y"]): bytes(r["png"]) for r in out}
    # pick the tile containing the region center and check one pixel
    cx, cy = proj.lonlat_to_webmercator(-119.0, 35.0)
    import math

    from trefoil_spark.raster.maptiles import WEB_MERCATOR_EXTENT

    n = 1 << 5
    size = 2 * WEB_MERCATOR_EXTENT / n
    tx = int((cx + WEB_MERCATOR_EXTENT) // size)
    ty = int((WEB_MERCATOR_EXTENT - cy) // size)
    idx, pal, trans = decode_palette_png(by_key[(5, tx, ty)])
    assert idx.shape == (256, 256)

    # pixel-level oracle: back-project the pixel center, gather the source
    # value, and recompute the expected stretch index
    bx0, _, _, by0 = xyz_tile_bounds(5, tx, ty)
    px, py = 100, 137
    mx = bx0 + (px + 0.5) * (size / 256)
    my = by0 - (py + 0.5) * (size / 256)
    lon, lat = proj.webmercator_to_lonlat(mx, my)
    six = int(np.floor((lon - SPEC.x0) / SPEC.dx))
    siy = int(np.floor((SPEC.y0 - lat) / SPEC.dy))
    src_tile = block_values(SPEC, 0, siy // 256, six // 256)
    v = src_tile[siy % 256, six % 256]
    if np.isnan(v):
        assert idx[py, px] == pal.shape[0] - 1  # background
    else:
        factor = (renderer.palette.shape[0] - 1) / (vmax - vmin)
        want = int(np.clip(int((float(v) - vmin) * factor), 0, renderer.palette.shape[0] - 1))
        assert idx[py, px] == want
