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


def _sample_grid(
    arr: np.ndarray,
    origin: tuple[int, int],
    src_spec: GridSpec,
    sx: np.ndarray,
    sy: np.ndarray,
    method: str,
) -> np.ndarray:
    """Gather values at world coords (sx, sy) from ``arr``, a (possibly
    partial) mosaic of the source grid whose [0,0] sits at global pixel
    ``origin`` = (oy, ox).

    - 'nearest': containing-cell copy (GDAL nearest semantics);
    - 'bilinear': pixel-center interpolation, edge-replicate clamping at
      the grid border, NaN if ANY of the four contributors is NaN
      (conservative nodata propagation) or the center is off-grid.
    - 'cubic': 4×4 Keys kernel with a=-0.5 (Catmull-Rom, GDAL's cubic),
      same clamping/NaN rules; fixed tap order + left-associated
      accumulation so the DuckDB oracle reproduces it bit-exactly.
    - 'lanczos': 6×6 windowed-sinc (a=3, GDAL's lanczos; reference
      resampling choice list trefoil/cli/warp.py:21-23), separable
      per-axis weight normalization (fixed-order sums), same clamping
      and tap-order/association discipline as cubic.
    """
    oy, ox = origin
    h, w = arr.shape
    gx = (sx - src_spec.x0) / src_spec.dx
    gy = (src_spec.y0 - sy) / src_spec.dy
    ok = (
        (gx >= 0) & (gx < src_spec.width) & (gy >= 0) & (gy < src_spec.height)
    )
    out = np.full(sx.shape, np.nan, dtype=np.float32)
    if method == "mode":
        raise ValueError("mode resampling goes through sample_tile (needs pixel boxes)")
    if method == "nearest":
        ix = np.clip(np.floor(gx).astype(np.int64) - ox, 0, w - 1)
        iy = np.clip(np.floor(gy).astype(np.int64) - oy, 0, h - 1)
        out[ok] = arr[iy[ok], ix[ok]]
        return out
    if method == "cubic":
        fx = gx - 0.5
        fy = gy - 0.5
        x0i = np.floor(fx).astype(np.int64)
        y0i = np.floor(fy).astype(np.int64)
        tx = (fx - x0i).astype(np.float64)
        ty = (fy - y0i).astype(np.float64)

        def inner(s):  # |s| <= 1, association mirrored by the SQL oracle
            return (1.5 * s - 2.5) * s * s + 1.0

        def outer(s):  # 1 < |s| <= 2
            return ((-0.5 * s + 2.5) * s - 4.0) * s + 2.0

        wxs = [outer(tx + 1.0), inner(tx), inner(1.0 - tx), outer(2.0 - tx)]
        wys = [outer(ty + 1.0), inner(ty), inner(1.0 - ty), outer(2.0 - ty)]
        xs = [
            np.clip(np.clip(x0i + k, 0, src_spec.width - 1) - ox, 0, w - 1)
            for k in (-1, 0, 1, 2)
        ]
        ys = [
            np.clip(np.clip(y0i + k, 0, src_spec.height - 1) - oy, 0, h - 1)
            for k in (-1, 0, 1, 2)
        ]
        acc = None
        for ky in range(4):
            for kx in range(4):
                term = (arr[ys[ky], xs[kx]].astype(np.float64) * wys[ky]) * wxs[kx]
                acc = term if acc is None else acc + term
        out[ok] = acc[ok].astype(np.float32)
        return out
    if method == "lanczos":
        fx = gx - 0.5
        fy = gy - 0.5
        x0i = np.floor(fx).astype(np.int64)
        y0i = np.floor(fy).astype(np.int64)
        tx = (fx - x0i).astype(np.float64)
        ty = (fy - y0i).astype(np.float64)
        wxs = _lanczos_weights(tx)
        wys = _lanczos_weights(ty)
        xs = [
            np.clip(np.clip(x0i + k, 0, src_spec.width - 1) - ox, 0, w - 1)
            for k in (-2, -1, 0, 1, 2, 3)
        ]
        ys = [
            np.clip(np.clip(y0i + k, 0, src_spec.height - 1) - oy, 0, h - 1)
            for k in (-2, -1, 0, 1, 2, 3)
        ]
        acc = None
        for ky in range(6):
            for kx in range(6):
                term = (arr[ys[ky], xs[kx]].astype(np.float64) * wys[ky]) * wxs[kx]
                acc = term if acc is None else acc + term
        out[ok] = acc[ok].astype(np.float32)
        return out
    if method != "bilinear":
        raise ValueError(
            "method must be 'nearest', 'bilinear', 'cubic' or 'lanczos'"
        )
    fx = gx - 0.5
    fy = gy - 0.5
    x0i = np.floor(fx).astype(np.int64)
    y0i = np.floor(fy).astype(np.int64)
    wx = (fx - x0i).astype(np.float64)
    wy = (fy - y0i).astype(np.float64)
    xa = np.clip(x0i, 0, src_spec.width - 1) - ox
    xb = np.clip(x0i + 1, 0, src_spec.width - 1) - ox
    ya = np.clip(y0i, 0, src_spec.height - 1) - oy
    yb = np.clip(y0i + 1, 0, src_spec.height - 1) - oy
    for c in (xa, xb):
        np.clip(c, 0, w - 1, out=c)
    for c in (ya, yb):
        np.clip(c, 0, h - 1, out=c)
    v = (
        arr[ya, xa].astype(np.float64) * (1 - wy) * (1 - wx)
        + arr[ya, xb].astype(np.float64) * (1 - wy) * wx
        + arr[yb, xa].astype(np.float64) * wy * (1 - wx)
        + arr[yb, xb].astype(np.float64) * wy * wx
    )
    out[ok] = v[ok].astype(np.float32)
    return out


def _sinc(x: np.ndarray) -> np.ndarray:
    """sin(πx)/(πx) with sinc(0)=1 — the exact expression the DuckDB
    oracle evaluates (`CASE WHEN x=0 THEN 1 ELSE SIN(PI()*x)/(PI()*x)`),
    so the two sides share one libm-level arithmetic tree."""
    px = np.pi * x
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(x == 0.0, 1.0, np.sin(px) / px)


def _lanczos_weights(t: np.ndarray) -> list[np.ndarray]:
    """Normalized Lanczos-3 tap weights at distances t-k, k=-2..3.

    Fixed tap order and a left-associated normalization sum so the SQL
    twin reproduces the float64 arithmetic bit-exactly."""
    ws = [_sinc(t - k) * _sinc((t - k) / 3.0) for k in (-2, -1, 0, 1, 2, 3)]
    s = ws[0]
    for wk in ws[1:]:
        s = s + wk
    return [wk / s for wk in ws]


MODE_MAX_KERNEL = 64  # candidate cap per dst pixel (box_h × box_w)


def _mode_ranges(edges: np.ndarray, g0: float, d: float, n: int):
    """Candidate src index range per dst pixel along one axis: src pixel
    centers (i+0.5) falling inside the dst pixel's box [lo, hi). Empty
    boxes (upsampling) degrade to the box center's containing cell."""
    g = (edges - g0) / d
    lo = np.minimum(g[:-1], g[1:])
    hi = np.maximum(g[:-1], g[1:])
    i0 = np.ceil(lo - 0.5).astype(np.int64)
    i1 = np.ceil(hi - 0.5).astype(np.int64) - 1
    empty = i1 < i0
    mid = np.floor((lo + hi) / 2.0).astype(np.int64)
    i0 = np.where(empty, mid, i0)
    i1 = np.where(empty, mid, i1)
    return i0, i1


def _sample_grid_mode(
    arr: np.ndarray,
    origin: tuple[int, int],
    src_spec: GridSpec,
    sx_edges: np.ndarray,
    sy_edges: np.ndarray,
) -> np.ndarray:
    """Majority-vote gather for CATEGORICAL warps (GDAL-style 'mode'):
    each dst pixel takes the most frequent value among the source pixels
    whose centers fall inside its footprint box; ties break to the
    SMALLEST value (deterministic, engine-portable); candidates off the
    source grid don't vote; no voters → nodata."""
    oy, ox = origin
    h, w = arr.shape
    cx0, cx1 = _mode_ranges(sx_edges, src_spec.x0, src_spec.dx, src_spec.width)
    ry0, ry1 = _mode_ranges(sy_edges, src_spec.y0, -src_spec.dy, src_spec.height)
    max_ky = int((ry1 - ry0).max()) + 1
    max_kx = int((cx1 - cx0).max()) + 1
    if max_ky * max_kx > MODE_MAX_KERNEL:
        raise ValueError(
            f"mode kernel {max_ky}x{max_kx} exceeds {MODE_MAX_KERNEL} "
            "candidates/pixel — aggregate-classify before warping this far down"
        )
    H, W = len(ry0), len(cx0)
    stack = np.full((H, W, max_ky * max_kx), np.nan, dtype=np.float32)
    for ky in range(max_ky):
        cy = ry0 + ky  # (H,)
        vy = (cy <= ry1) & (cy >= 0) & (cy < src_spec.height)
        my = np.clip(cy - oy, 0, h - 1)
        for kx in range(max_kx):
            cx = cx0 + kx  # (W,)
            vx = (cx <= cx1) & (cx >= 0) & (cx < src_spec.width)
            mx = np.clip(cx - ox, 0, w - 1)
            vals = arr[my[:, None], mx[None, :]].astype(np.float32)
            valid = vy[:, None] & vx[None, :]
            stack[:, :, ky * max_kx + kx] = np.where(valid, vals, np.nan)
    s = np.sort(stack, axis=2)  # ascending, NaN last
    # run-length majority over the sorted axis — O(H·W·K) memory instead
    # of the (H,W,K,K) pairwise-equality tensor (~268MB/task at the
    # K=64 cap on a 256² tile). cum[k] = #elements of k's run up to k;
    # its max is reached at the END of the longest run, and argmax's
    # first-occurrence rule lands in the EARLIEST such run = smallest
    # value among tied majorities (NaN runs are length-1: NaN != NaN).
    K = s.shape[2]
    idx3 = np.broadcast_to(np.arange(K, dtype=np.int64), s.shape)
    boundary = np.ones(s.shape, dtype=bool)
    boundary[:, :, 1:] = s[:, :, 1:] != s[:, :, :-1]
    start = np.maximum.accumulate(np.where(boundary, idx3, 0), axis=2)
    cum = idx3 - start + 1
    pick = cum.argmax(axis=2)  # first max = smallest majority value
    return np.take_along_axis(s, pick[:, :, None], axis=2)[:, :, 0]


def sample_tile(
    arr: np.ndarray,
    origin: tuple[int, int],
    src_spec: GridSpec,
    dst_spec: GridSpec,
    ty: int,
    tx: int,
    method: str,
) -> np.ndarray:
    """Gather one dst tile from a (partial) source mosaic — dispatches on
    kernel: center-based (nearest/bilinear) or box-based (mode)."""
    if method in ("nearest", "bilinear", "cubic", "lanczos"):
        lat, lon = dst_spec.pixel_centers(ty, tx)
        sx, sy = proj.transform(dst_spec.crs, src_spec.crs, lon, lat)
        return _sample_grid(arr, origin, src_spec, sx, sy, method)
    if method != "mode":
        raise ValueError(
            "method must be 'nearest', 'bilinear', 'cubic', 'lanczos' or 'mode'"
        )
    h, w = dst_spec.tile_shape(ty, tx)
    ey = dst_spec.y0 - (ty * dst_spec.tile + np.arange(h + 1, dtype=np.float64)) * dst_spec.dy
    ex = dst_spec.x0 + (tx * dst_spec.tile + np.arange(w + 1, dtype=np.float64)) * dst_spec.dx
    # box edges must stay boxes: separable transforms only (the mode use
    # case is categorical grid downsampling — same-CRS or 4326⇄3857)
    if not _separable(dst_spec.crs, src_spec.crs):
        raise ValueError(
            "mode resampling requires a separable CRS pair "
            "(same CRS or 4326<->3857); got "
            f"{dst_spec.crs!r} -> {src_spec.crs!r}"
        )
    sx_e, _ = proj.transform(dst_spec.crs, src_spec.crs, ex, np.zeros_like(ex))
    _, sy_e = proj.transform(dst_spec.crs, src_spec.crs, np.zeros_like(ey), ey)
    return _sample_grid_mode(arr, origin, src_spec, sx_e, sy_e)


def _separable(a: str, b: str) -> bool:
    """x'=f(x), y'=g(y) transforms: identity and 4326⇄3857 — corners are
    exact extremes and boxes map to boxes."""
    if proj.same_crs(a, b):
        return True
    sep = {"EPSG:4326", "EPSG:3857"}
    try:
        return proj.normalize_crs(a) in sep and proj.normalize_crs(b) in sep
    except ValueError:
        return False


def warp_tile_numpy(
    src: np.ndarray,
    src_spec: GridSpec,
    dst_spec: GridSpec,
    ty: int,
    tx: int,
    method: str = "nearest",
) -> np.ndarray:
    """Single-process kernel: one dst tile gathered from a full src array
    (unit-test oracle + small-grid path)."""
    return sample_tile(src, (0, 0), src_spec, dst_spec, ty, tx, method)


def warp_tiles(
    spark: SparkSession,
    src_tiles: DataFrame,
    src_spec: GridSpec,
    dst_spec: GridSpec,
    var: str = "synth",
    method: str = "nearest",
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
    # EXACT extremes; for conic/azimuthal CRS (aea/lcc/tmerc/stere/laea)
    # extremes can sit on edges, so sample corners + edge midpoints and
    # pad the tile range by one tile of slack (conservative cover: extra
    # pairs only cost a few spurious join rows, the gather drops them).
    separable = _separable(ds.crs, dd.crs)
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

    # neighborhood px the gather reads beyond the center's cell
    halo = {"bilinear": 1, "mode": 1, "cubic": 2, "lanczos": 3}.get(method, 0)
    px_x0 = F.floor((sxmin - F.lit(dd.x0)) / F.lit(dd.dx)) - F.lit(halo)
    px_x1 = F.floor((sxmax - F.lit(dd.x0)) / F.lit(dd.dx)) + F.lit(halo)
    px_y0 = F.floor((F.lit(dd.y0) - symax) / F.lit(dd.dy)) - F.lit(halo)
    px_y1 = F.floor((F.lit(dd.y0) - symin) / F.lit(dd.dy)) + F.lit(halo)
    sty_lo, sty_hi = _tile_range(px_y0, px_y1, dd.ntiles_y)
    stx_lo, stx_hi = _tile_range(px_x0, px_x1, dd.ntiles_x)
    # materialize the corner-math bounds BEFORE the explodes: a generator
    # expression referencing the projection tree would re-evaluate the
    # full corner math once per exploded row (measured +16% on warp_3857
    # in r2); as named columns below the first Generate it runs once per
    # dst tile
    bounds = base.select(
        "dty", "dtx",
        sty_lo.alias("sty_lo"), sty_hi.alias("sty_hi"),
        stx_lo.alias("stx_lo"), stx_hi.alias("stx_hi"),
    )
    pair_df = (
        bounds.withColumn(
            "sty",
            F.explode(
                F.when(
                    F.col("sty_lo") <= F.col("sty_hi"),
                    F.sequence(F.col("sty_lo"), F.col("sty_hi")),
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .withColumn(
            "stx",
            F.explode(
                F.when(
                    F.col("stx_lo") <= F.col("stx_hi"),
                    F.sequence(F.col("stx_lo"), F.col("stx_hi")),
                ).otherwise(F.array().cast("array<int>"))
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
        # mosaic-first: paste the contributing source tiles into one
        # local window so bilinear/mode neighborhoods spanning tile
        # borders resolve without inter-row coordination
        oy = min(int(r.ty) for r in pdf.itertuples(index=False)) * tile
        ox = min(int(r.tx) for r in pdf.itertuples(index=False)) * tile
        ey = max(int(r.ty) * tile + int(r.h) for r in pdf.itertuples(index=False))
        ex = max(int(r.tx) * tile + int(r.w) for r in pdf.itertuples(index=False))
        mosaic = np.full((ey - oy, ex - ox), np.nan, dtype=np.float32)
        for row in pdf.itertuples(index=False):
            blk = np.frombuffer(row.block, dtype=np.float32).reshape(row.h, row.w)
            y, x = int(row.ty) * tile - oy, int(row.tx) * tile - ox
            mosaic[y : y + row.h, x : x + row.w] = blk
        out = sample_tile(mosaic, (oy, ox), src_spec, dst_spec, dty, dtx, method)
        dh, dw = out.shape
        return pd.DataFrame(
            [(var, t, dty, dtx, 0, out.tobytes(), dh, dw)],
            columns=["var", "t", "ty", "tx", "cell", "block", "h", "w"],
        )

    return joined.groupBy("t", "dty", "dtx").applyInPandas(
        gather,
        schema="var string, t int, ty int, tx int, cell bigint, block binary, h int, w int",
    )
