"""XYZ (slippy-map) tile pyramid rendering — the distributed form of the
reference's `render_netcdf` pipeline (SURVEY.md §3.2: stats pre-pass →
renderer → warp to EPSG:3857 → palette PNG per tile; reference
cli/render_netcdf.py:148-328).

Pipeline per zoom level:
1. **stats pre-pass** (when the renderer needs min/max anchors): one agg
   job — the "collect scalar subquery then reuse" pattern (§3.2);
2. the XYZ tiles intersecting the source bbox form a contiguous window of
   the global 2^z x 2^z web-mercator grid → ONE destination GridSpec
   aligned to tile boundaries;
3. distributed warp (inverse-mapping gather, raster/warp.py);
4. render each 256x256 block to a paletted PNG (raster/render.py);
5. output rows (z, x, y, png) — the standard tile-server table, keyed so
   a z/x/y lookup is a point query.

Everything after the pre-pass is shuffle-free except the warp's grouped
gather (one shuffle of tile rows).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import proj
from .gridspec import GridSpec
from .render import RasterRenderer, render_tiles
from .warp import warp_tiles

WEB_MERCATOR_EXTENT = 2 * math.pi * 6378137.0 / 2.0  # 20037508.342789244


def xyz_tile_bounds(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """Web-mercator bounds (xmin, ymin, xmax, ymax) of XYZ tile z/x/y
    (y counts from the NORTH, slippy-map convention)."""
    n = 1 << z
    size = 2 * WEB_MERCATOR_EXTENT / n
    xmin = -WEB_MERCATOR_EXTENT + x * size
    ymax = WEB_MERCATOR_EXTENT - y * size
    return xmin, ymax - size, xmin + size, ymax


def xyz_range_for_bbox(bbox_3857, z: int) -> tuple[int, int, int, int]:
    """(x0, x1, y0, y1) inclusive XYZ tile range covering a 3857 bbox."""
    n = 1 << z
    size = 2 * WEB_MERCATOR_EXTENT / n
    x0 = int(math.floor((bbox_3857.xmin + WEB_MERCATOR_EXTENT) / size))
    x1 = int(math.floor((bbox_3857.xmax + WEB_MERCATOR_EXTENT) / size - 1e-12))
    y0 = int(math.floor((WEB_MERCATOR_EXTENT - bbox_3857.ymax) / size))
    y1 = int(math.floor((WEB_MERCATOR_EXTENT - bbox_3857.ymin) / size - 1e-12))
    clamp = lambda v: max(0, min(v, n - 1))
    return clamp(x0), clamp(x1), clamp(y0), clamp(y1)


def render_xyz_tiles(
    spark: SparkSession,
    src_tiles: DataFrame,
    src_spec: GridSpec,
    renderer: RasterRenderer,
    zoom: int,
    var: str = "render",
) -> DataFrame:
    """Source tile table → (z, x, y, png) rows for one zoom level."""
    b3857 = src_spec.bbox.project("EPSG:3857")
    x0, x1, y0, y1 = xyz_range_for_bbox(b3857, zoom)
    n = 1 << zoom
    size = 2 * WEB_MERCATOR_EXTENT / n

    # destination grid = the covering XYZ window, aligned to tile edges
    dst_spec = GridSpec(
        x0=-WEB_MERCATOR_EXTENT + x0 * size,
        y0=WEB_MERCATOR_EXTENT - y0 * size,
        dx=size / 256.0,
        dy=size / 256.0,
        width=(x1 - x0 + 1) * 256,
        height=(y1 - y0 + 1) * 256,
        crs="EPSG:3857",
        tile=256,
    )

    warped = warp_tiles(spark, src_tiles, src_spec, dst_spec, var=var)
    rendered = render_tiles(warped, renderer)
    return rendered.select(
        F.lit(zoom).alias("z"),
        (F.col("tx") + F.lit(x0)).alias("x"),
        (F.col("ty") + F.lit(y0)).alias("y"),
        "png",
    )


def stats_prepass(src_tiles: DataFrame) -> tuple[float, float]:
    """min/max over the tile table for renderer anchors (§3.2 step 2).

    One Arrow pass emitting per-tile partials + a scalar agg — at scale
    this reads tile stats metadata instead (SURVEY.md S1)."""
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                v = np.frombuffer(row.block, dtype=np.float32)
                ok = ~np.isnan(v)
                if ok.any():
                    rows.append((float(v[ok].min()), float(v[ok].max())))
            yield pd.DataFrame(rows, columns=["vmin", "vmax"])

    agg = (
        src_tiles.mapInPandas(partials, schema="vmin double, vmax double")
        .agg(F.min("vmin").alias("mn"), F.max("vmax").alias("mx"))
        .collect()[0]
    )
    return float(agg["mn"]), float(agg["mx"])
