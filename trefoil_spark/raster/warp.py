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
2. each dst tile's bbox back-projects into source CRS (closed-form
   corner math as Catalyst expressions — the supported transforms are
   separable and monotone, so corners are exact) → covering
   source-tile range, generated fully distributed via spark.range;
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

    Plan: the (dst_ty, dst_tx, src_ty, src_tx) need-pairs are generated
    DISTRIBUTED — ``spark.range`` over the dst tile grid, the covered
    source-tile range computed with the same closed-form corner math as
    Catalyst expressions (the supported transforms are separable and
    monotone, so corner projection is exact), then exploded. Zero driver
    work / zero ``createDataFrame`` of a driver list: a 4×10⁸-tile
    destination grid enumerates in parallel. Source tiles join to their
    dst consumers (equi-join; broadcast-hinted when the pair side is
    known-small from grid metadata, otherwise AQE picks the strategy),
    group by dst tile, gather.
    """
    ds, dd = dst_spec, src_spec  # dd: the grid we index into
    ntx = ds.ntiles_x
    base = spark.range(ds.ntiles_y * ntx).select(
        F.floor(F.col("id") / ntx).cast("int").alias("dty"),
        F.pmod(F.col("id"), F.lit(ntx)).cast("int").alias("dtx"),
    )
    # dst tile bbox corners in dst CRS (closed-form; matches tile_shape)
    th = F.least(F.lit(ds.tile), F.lit(ds.height) - F.col("dty") * ds.tile)
    tw = F.least(F.lit(ds.tile), F.lit(ds.width) - F.col("dtx") * ds.tile)
    dx0 = F.lit(ds.x0) + F.col("dtx") * F.lit(float(ds.tile)) * F.lit(ds.dx)
    dy0 = F.lit(ds.y0) - F.col("dty") * F.lit(float(ds.tile)) * F.lit(ds.dy)
    dx1 = dx0 + tw * F.lit(ds.dx)
    dy1 = dy0 - th * F.lit(ds.dy)
    # project the dst tile boundary to src CRS. For the separable
    # monotone pairs (4326⇄3857, identity) two opposite corners are
    # EXACT extremes; for conic/azimuthal CRS (aea) extremes can sit on
    # edges, so sample corners + edge midpoints and pad the tile range
    # by one tile of slack (conservative cover: extra pairs only cost a
    # few spurious join rows, the gather drops them).
    def _sep(a: str, b: str) -> bool:
        sep = {"EPSG:4326", "EPSG:3857"}
        return proj.normalize_crs(a) in sep and proj.normalize_crs(b) in sep

    separable = _sep(ds.crs, dd.crs)
    dxm = (dx0 + dx1) / 2
    dym = (dy0 + dy1) / 2
    pts = (
        [(dx0, dy0), (dx1, dy1)]
        if separable
        else [
            (dx0, dy0), (dx1, dy0), (dx0, dy1), (dx1, dy1),
            (dxm, dy0), (dxm, dy1), (dx0, dym), (dx1, dym),
        ]
    )
    prj = [proj.transform_cols(ds.crs, dd.crs, px, py) for px, py in pts]
    sxmin = F.least(*[p[0] for p in prj]) if len(prj) > 1 else prj[0][0]
    sxmax = F.greatest(*[p[0] for p in prj]) if len(prj) > 1 else prj[0][0]
    symin = F.least(*[p[1] for p in prj])
    symax = F.greatest(*[p[1] for p in prj])
    slack = 0 if separable else 1
    # covered source tile range (floor pixel index // tile, clamped)
    def _tile_range(lo_px, hi_px, n_tiles):
        lo = F.greatest(
            F.floor(lo_px / F.lit(float(dd.tile))).cast("int") - F.lit(slack),
            F.lit(0),
        )
        hi = F.least(
            F.floor(hi_px / F.lit(float(dd.tile))).cast("int") + F.lit(slack),
            F.lit(n_tiles - 1),
        )
        return lo, hi

    px_x0 = F.floor((sxmin - F.lit(dd.x0)) / F.lit(dd.dx))
    px_x1 = F.floor((sxmax - F.lit(dd.x0)) / F.lit(dd.dx))
    px_y0 = F.floor((F.lit(dd.y0) - symax) / F.lit(dd.dy))
    px_y1 = F.floor((F.lit(dd.y0) - symin) / F.lit(dd.dy))
    sty_lo, sty_hi = _tile_range(px_y0, px_y1, dd.ntiles_y)
    stx_lo, stx_hi = _tile_range(px_x0, px_x1, dd.ntiles_x)
    pair_df = (
        base.withColumn(
            "sty",
            F.explode(
                F.when(sty_lo <= sty_hi, F.sequence(sty_lo, sty_hi)).otherwise(
                    F.array().cast("array<int>")
                )
            ),
        )
        .withColumn(
            "stx",
            F.explode(
                F.when(stx_lo <= stx_hi, F.sequence(stx_lo, stx_hi)).otherwise(
                    F.array().cast("array<int>")
                )
            ),
        )
        .select("dty", "dtx", "sty", "stx")
    )
    # grid metadata bounds the pair count — hint broadcast only when the
    # whole dst grid is provably small (no data-dependent driver action)
    if ds.ntiles_y * ntx <= 4096:
        pair_df = F.broadcast(pair_df)

    joined = src_tiles.join(
        pair_df,
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
