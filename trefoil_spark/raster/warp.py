"""Distributed nearest-neighbor warp / reprojection (SURVEY.md R1/R2/J6).

Reference semantics (/root/reference/trefoil/netcdf/warp.py:14-66,70-161):
``warp_array`` fills nodata, calls GDAL reproject (nearest default), then
re-masks == fill; ``warp_like`` drives the output grid from a template
dataset, looping timesteps. GDAL is absent, so the kernel is ours:

    for each DESTINATION pixel center: project to the source CRS, take
    the nearest source pixel (round to index), copy; outside the source
    grid → masked.

This is inverse-mapping gather — exactly what GDAL does for nearest.

Distributed shape (the J6 "template-domain join"):
1. destination tile grid enumerated (spark.range over tiles);
2. each dst tile's bbox back-projects into source CRS (densified edges,
   reference BBox.project semantics) → covering source-tile range;
3. equi-join dst-tile rows to the source tiles they need (broadcast of
   the small side; co-partitioned sort-merge when both are big);
4. grouped gather: applyInPandas assembles each dst tile from its source
   tiles with one vectorized numpy index operation.

Shuffle count: 1 (the dst-keyed grouping); source tiles are replicated
only along dst-tile boundaries (halo), i.e. O(perimeter) duplication.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import proj
from ..grid.bbox import BBox
from .gridspec import GridSpec


def warp_tile_numpy(
    src: np.ndarray,
    src_spec: GridSpec,
    dst_spec: GridSpec,
    ty: int,
    tx: int,
) -> np.ndarray:
    """Single-process kernel: one dst tile gathered from a full src array
    (unit-test oracle + small-grid path)."""
    lat, lon = dst_spec.pixel_centers(ty, tx)
    sx, sy = proj.transform(dst_spec.crs, src_spec.crs, lon, lat)
    # source pixel index of each dst center (nearest = containing cell)
    ix = np.floor((sx - src_spec.x0) / src_spec.dx).astype(np.int64)
    iy = np.floor((src_spec.y0 - sy) / src_spec.dy).astype(np.int64)
    ok = (ix >= 0) & (ix < src_spec.width) & (iy >= 0) & (iy < src_spec.height)
    out = np.full(lat.shape, np.nan, dtype=np.float32)
    out[ok] = src[iy[ok], ix[ok]]
    return out


def warp_tiles(
    spark: SparkSession,
    src_tiles: DataFrame,
    src_spec: GridSpec,
    dst_spec: GridSpec,
    var: str = "synth",
) -> DataFrame:
    """Distributed warp: source tile table → destination tile table.

    Plan: enumerate (dst_ty, dst_tx, src_ty, src_tx) need-pairs on the
    driver (pure grid math, tiny), join source tiles to their dst
    consumers (broadcast of the pair list), group by dst tile, gather.
    """
    pairs = []
    for dty in range(dst_spec.ntiles_y):
        for dtx in range(dst_spec.ntiles_x):
            h, w = dst_spec.tile_shape(dty, dtx)
            y0 = dst_spec.y0 - dty * dst_spec.tile * dst_spec.dy
            x0 = dst_spec.x0 + dtx * dst_spec.tile * dst_spec.dx
            dst_bbox = BBox(
                (x0, y0 - h * dst_spec.dy, x0 + w * dst_spec.dx, y0), dst_spec.crs
            )
            sb = dst_bbox.project(src_spec.crs)
            sx0 = int(np.floor((sb.xmin - src_spec.x0) / src_spec.dx))
            sx1 = int(np.floor((sb.xmax - src_spec.x0) / src_spec.dx))
            sy0 = int(np.floor((src_spec.y0 - sb.ymax) / src_spec.dy))
            sy1 = int(np.floor((src_spec.y0 - sb.ymin) / src_spec.dy))
            for sty in range(max(sy0 // src_spec.tile, 0),
                             min(sy1 // src_spec.tile, src_spec.ntiles_y - 1) + 1):
                for stx in range(max(sx0 // src_spec.tile, 0),
                                 min(sx1 // src_spec.tile, src_spec.ntiles_x - 1) + 1):
                    pairs.append((dty, dtx, sty, stx))
    pair_df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["dty", "dtx", "sty", "stx"])
    )

    joined = src_tiles.join(
        F.broadcast(pair_df),
        (src_tiles["ty"] == pair_df["sty"]) & (src_tiles["tx"] == pair_df["stx"]),
    ).select("t", "dty", "dtx", "ty", "tx", "block", "h", "w")

    tile = src_spec.tile

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        t, dty, dtx = int(key[0]), int(key[1]), int(key[2])
        dh, dw = dst_spec.tile_shape(dty, dtx)
        lat, lon = dst_spec.pixel_centers(dty, dtx)
        sx, sy = proj.transform(dst_spec.crs, src_spec.crs, lon, lat)
        gx = np.floor((sx - src_spec.x0) / src_spec.dx).astype(np.int64)
        gy = np.floor((src_spec.y0 - sy) / src_spec.dy).astype(np.int64)
        out = np.full((dh, dw), np.nan, dtype=np.float32)
        for row in pdf.itertuples(index=False):
            blk = np.frombuffer(row.block, dtype=np.float32).reshape(row.h, row.w)
            oy, ox = int(row.ty) * tile, int(row.tx) * tile
            ly, lx = gy - oy, gx - ox
            sel = (ly >= 0) & (ly < row.h) & (lx >= 0) & (lx < row.w)
            out[sel] = blk[ly[sel], lx[sel]]
        return pd.DataFrame(
            [(var, t, dty, dtx, 0, out.tobytes(), dh, dw)],
            columns=["var", "t", "ty", "tx", "cell", "block", "h", "w"],
        )

    return joined.groupBy("t", "dty", "dtx").applyInPandas(
        gather,
        schema="var string, t int, ty int, tx int, cell bigint, block binary, h int, w int",
    )
