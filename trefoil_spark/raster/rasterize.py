"""Polygon rasterization to zone tiles (SURVEY.md J1).

Reference semantics: GDAL ``rasterize(geometries, out_shape, transform,
all_touched=False, fill, dtype)`` at /root/reference/trefoil/cli/
zones.py:136-144 — a pixel gets the zone whose polygon contains the pixel
CENTER; overlapping features are burned in order (later wins); pixels in
no polygon hold the fill value. dtype by feature count (zones.py:123-130):
<255 → uint8, <65535 → uint16 (we always use uint16 + 0xFFFF fill).

Distributed form: one row per tile, ``zone_block:binary`` of uint16
feature indices. For small layers the result is broadcastable; at scale
it is written alongside the value tiles with the same (ty, tx) keying so
the zonal join is co-partitioned (no shuffle of the big side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geometry import Polygon, points_in_rings
from .gridspec import GridSpec

FILL = 0xFFFF

ZONE_TILE_SCHEMA = "ty int, tx int, zone_block binary, h int, w int"


def rasterize_tile(spec: GridSpec, polygons: list[Polygon], ty: int, tx: int) -> np.ndarray:
    """uint16 zone-index block for one tile (burn order: later feature wins)."""
    lat, lon = spec.pixel_centers(ty, tx)
    h, w = lat.shape
    out = np.full((h, w), FILL, dtype=np.uint16)
    # tile bbox for cheap polygon prefilter (reference J2 bbox pushdown)
    bx0, bx1 = lon[0, 0] - spec.dx, lon[0, -1] + spec.dx
    by0, by1 = lat[-1, 0] - spec.dy, lat[0, 0] + spec.dy
    flat_lon = lon.ravel()
    flat_lat = lat.ravel()
    flat = out.ravel()
    for fid, poly in enumerate(polygons):  # ascending: later burns overwrite
        xmin, ymin, xmax, ymax = poly.bbox
        if xmax < bx0 or xmin > bx1 or ymax < by0 or ymin > by1:
            continue
        inside = points_in_rings(flat_lon, flat_lat, poly.rings)
        flat[inside] = fid
    return flat.reshape(h, w)


def rasterize_zones(
    spark: SparkSession, spec: GridSpec, polygons: list[Polygon]
) -> DataFrame:
    """Zone-tile DataFrame over the whole grid (distributed mapInPandas)."""
    nty, ntx = spec.ntiles_y, spec.ntiles_x
    n = nty * ntx
    par = min(n, spark.sparkContext.defaultParallelism * 2)
    idx = spark.range(0, n, numPartitions=par)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                ty, tx = int(i) // ntx, int(i) % ntx
                blk = rasterize_tile(spec, polygons, ty, tx)
                h, w = blk.shape
                rows.append((ty, tx, blk.tobytes(), h, w))
            yield pd.DataFrame(rows, columns=["ty", "tx", "zone_block", "h", "w"])

    return idx.mapInPandas(gen, schema=ZONE_TILE_SCHEMA)
