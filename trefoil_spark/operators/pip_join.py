"""Distributed point-in-polygon join (SURVEY.md J1/J2; reference
rasterize-centroid semantics at /root/reference/trefoil/cli/zones.py:136-144).

Physical strategy (scale-first):

1. **Covering index** (driver): each polygon's bbox → qcell covering at
   ``res``; per cell we precompute the candidate feature list (descending =
   burn order) AND, when the cell is *interior* to its top-burn candidate
   (no polygon edge crosses the cell box and the cell center is inside),
   the already-resolved winner. Mirrors + extends the reference's fiona
   bbox pushdown (zones.py:101-107).
2. **Broadcast hash join** on ``cell`` (the point side computes ``cell``
   with pure Catalyst integer expressions — whole-stage codegen, no
   shuffle of the big side).
3. **Interior fast path**: points in resolved cells get their feature_id
   from the broadcast row — pure JVM, no Python. At geographic scale the
   interior area dominates the boundary ring (O(area) vs O(perimeter)),
   so the Python fraction *shrinks* as data grows.
4. **Exact refine** for boundary cells only: Arrow-batched pandas UDF
   runs the vectorized even-odd crossing test, resolving burn order
   in-UDF (highest feature_id wins = GDAL rasterize overwrite order).
   Non-boundary rows pass NULL into the UDF and cost only the Arrow copy
   of three numeric columns.

Plan shape at 100 TB: Scan → codegen cell expr → BroadcastHashJoin →
ArrowEvalPython(boundary only) → Filter. Zero shuffles. The covering
``res`` trades broadcast size (≈4^res rows) against boundary-ring width
(cell size); pick res so the vector layer's covering is ~10^4-10^6 cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..geometry import Polygon, points_in_rings
from ..grid import cells

DEFAULT_RES = 10


def cell_col(lon_col: str = "lon", lat_col: str = "lat", res: int = DEFAULT_RES) -> Column:
    """qcell id as a pure Catalyst expression (JVM-side, codegen-friendly)."""
    ix = F.expr(cells.ix_sql_expr(lon_col, res))
    iy = F.expr(cells.iy_sql_expr(lat_col, res))
    morton = F.lit(0).cast("bigint")
    for b in range(res):
        # (ix & 2^b) * 2^(b+5) lands ix bit b at morton bit 2b (+5 res shift)
        morton = morton + ix.bitwiseAND(F.lit(1 << b)).cast("bigint") * F.lit(1 << (b + 5))
        morton = morton + iy.bitwiseAND(F.lit(1 << b)).cast("bigint") * F.lit(1 << (b + 6))
    return morton + F.lit(res)


def _segments_intersect_boxes(rings, bx0, by0, bx1, by1) -> np.ndarray:
    """Vectorized: does any polygon edge intersect each of N boxes?

    bx0..by1 are arrays of box corners; returns bool[N]. Standard
    separating-axis test (bbox overlap AND corners straddle the edge's
    supporting line).
    """
    n = bx0.shape[0]
    hit = np.zeros(n, dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        # (boxes, edges) bbox overlap
        overlap = (
            (np.maximum(x1, x2)[None, :] >= bx0[:, None])
            & (np.minimum(x1, x2)[None, :] <= bx1[:, None])
            & (np.maximum(y1, y2)[None, :] >= by0[:, None])
            & (np.minimum(y1, y2)[None, :] <= by1[:, None])
        )
        dx, dy = (x2 - x1)[None, :], (y2 - y1)[None, :]
        xa, ya = x1[None, :], y1[None, :]
        allpos = np.ones_like(overlap)
        allneg = np.ones_like(overlap)
        for cx, cy in ((bx0, by0), (bx1, by0), (bx1, by1), (bx0, by1)):
            side = dx * (cy[:, None] - ya) - dy * (cx[:, None] - xa)
            allpos &= side > 0
            allneg &= side < 0
        straddle = ~(allpos | allneg)  # incl. corner-on-line (conservative)
        hit |= (overlap & straddle).any(axis=1)
    return hit


def build_covering_index(polygons: list[Polygon], res: int = DEFAULT_RES):
    """Driver-side covering index (memoized, fully vectorized).

    Returns (rows, rings_by_fid); rows = [(cell, fids_desc, resolved)]:
    - resolved >= 0: whole cell interior to that burn-order winner — pure
      JVM resolution at runtime;
    - resolved == -1: cell uniformly outside every candidate — resolved
      to "no zone" without any exact test;
    - resolved is None: boundary cell → exact PIP in the Python stage.
    """
    key = (res, tuple(
        (str(p.value), tuple(r.tobytes() for r in p.rings)) for p in polygons
    ))
    cached = _COVERING_CACHE.get(key)
    if cached is not None:
        return cached

    by_cell: dict[int, list[int]] = {}
    for fid, poly in enumerate(polygons):
        xmin, ymin, xmax, ymax = poly.bbox
        for c in cells.covering_cells(xmin, ymin, xmax, ymax, res).tolist():
            by_cell.setdefault(int(c), []).append(fid)

    cell_ids = np.fromiter(by_cell.keys(), dtype=np.int64, count=len(by_cell))
    lat0, lon0, dlat, dlon = cells.cell_to_latlon(cell_ids)
    cx, cy = lon0 + dlon / 2.0, lat0 + dlat / 2.0
    nf, nc = len(polygons), cell_ids.shape[0]
    cand = np.zeros((nf, nc), dtype=bool)
    boundary = np.zeros((nf, nc), dtype=bool)
    inside = np.zeros((nf, nc), dtype=bool)
    pos = {int(c): i for i, c in enumerate(cell_ids)}
    for fid, poly in enumerate(polygons):
        idx = np.fromiter(
            (pos[c] for c, fids in by_cell.items() if fid in fids), dtype=np.int64
        )
        cand[fid, idx] = True
        boundary[fid, idx] = _segments_intersect_boxes(
            poly.rings, lon0[idx], lat0[idx], (lon0 + dlon)[idx], (lat0 + dlat)[idx]
        )
        inside[fid, idx] = points_in_rings(cx[idx], cy[idx], poly.rings)

    resolved = np.full(nc, -1, dtype=np.int64)  # -1 = uniformly no zone
    is_boundary = np.zeros(nc, dtype=bool)
    undecided = np.ones(nc, dtype=bool)
    for fid in range(nf - 1, -1, -1):  # burn order: highest first
        consider = undecided & cand[fid]
        b = consider & boundary[fid]
        is_boundary |= b
        undecided &= ~b
        i = consider & ~boundary[fid] & inside[fid]
        resolved[i] = fid
        undecided &= ~i

    rows = []
    for c, fids in by_cell.items():
        k = pos[c]
        rows.append(
            (
                c,
                sorted(fids, reverse=True),
                None if is_boundary[k] else int(resolved[k]),
            )
        )

    rings_by_fid = {fid: [r.copy() for r in poly.rings] for fid, poly in enumerate(polygons)}
    _COVERING_CACHE[key] = (rows, rings_by_fid)
    return rows, rings_by_fid


_COVERING_CACHE: dict = {}


def covering_index_df(
    spark: SparkSession, polygons: list[Polygon], res: int = DEFAULT_RES
) -> DataFrame:
    rows, _ = build_covering_index(polygons, res)
    return spark.createDataFrame(
        rows, "cell bigint, fids array<bigint>, resolved_fid bigint"
    )


def _make_winner_udf(polygons: list[Polygon], res: int):
    """Vectorized pandas UDF: (lon, lat, boundary_cell) -> feature_id|null.

    Only boundary-cell rows carry a non-null cell; everything else is
    masked out before any math. Rows are grouped per distinct cell
    (np.unique, no per-row Python), each (cell, polygon) evaluation is one
    vectorized points-x-edges numpy call over still-unresolved rows.
    """
    rows, rings_by_fid = build_covering_index(polygons, res)
    cell_fids = {c: fids for c, fids, _resolved in rows}

    @F.pandas_udf(LongType())
    def winner(lon: pd.Series, lat: pd.Series, cell: pd.Series) -> pd.Series:
        cells_v = cell.to_numpy(dtype="float64", na_value=np.nan)
        out = np.full(len(cells_v), -1, dtype=np.int64)
        active = ~np.isnan(cells_v)
        if active.any():
            lon_v = lon.to_numpy(dtype=np.float64)
            lat_v = lat.to_numpy(dtype=np.float64)
            cells_i = cells_v.astype(np.int64)
            for c in np.unique(cells_i[active]):
                idx = np.flatnonzero(active & (cells_i == c))
                for fid in cell_fids.get(int(c), ()):  # descending = burn order
                    if idx.size == 0:
                        break
                    inside = points_in_rings(lon_v[idx], lat_v[idx], rings_by_fid[fid])
                    out[idx[inside]] = fid
                    idx = idx[~inside]
        result = pd.Series(out)
        return result.where(result >= 0, other=None)

    # deterministic in fact, but marked otherwise so Catalyst doesn't
    # duplicate the (expensive) UDF when pushing filters through projects
    return winner.asNondeterministic()


def pip_join(
    points: DataFrame,
    polygons: list[Polygon],
    key_cols: list[str] | None = None,  # kept for API compat; unused
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = DEFAULT_RES,
    how: str = "inner",
    cell_col_name: str | None = None,
    split_python: bool = True,
) -> DataFrame:
    """Join points to the polygon layer; adds ``feature_id`` + ``zone_value``.

    Zero-shuffle; interior cells resolve JVM-side, only boundary cells run
    Python. Points matching no polygon are dropped under ``how='inner'``
    (reference zone-raster fill semantics) or kept with nulls under 'left'.
    """
    spark = points.sparkSession
    cov = covering_index_df(spark, polygons, res)

    pts = points
    if cell_col_name is None:
        cell_col_name = "_pip_cell"
        pts = pts.withColumn(cell_col_name, cell_col(lon_col, lat_col, res))

    joined = pts.join(
        F.broadcast(cov), on=pts[cell_col_name] == cov["cell"], how="left"
    ).drop("cell")

    winner = _make_winner_udf(polygons, res)
    if split_python:
        # Interior/exterior rows never touch Python: union of a pure-JVM
        # branch and a boundary-only Python branch. The boundary branch's
        # input is O(perimeter)·rows — the Python fraction SHRINKS as the
        # grid refines (res↑). Costs a second pass over the joined scan;
        # with column pruning that is 3 numeric cols, cheaper than pushing
        # every row through Arrow.
        interior = joined.filter(
            F.col("resolved_fid").isNotNull() | F.col("fids").isNull()
        ).withColumn(
            "feature_id",
            F.when(F.col("resolved_fid") >= 0, F.col("resolved_fid")),
        )
        boundary = joined.filter(
            F.col("resolved_fid").isNull() & F.col("fids").isNotNull()
        ).withColumn(
            "feature_id", winner(F.col(lon_col), F.col(lat_col), F.col(cell_col_name))
        )
        joined = interior.unionByName(boundary).drop("fids", "resolved_fid")
    else:
        boundary_cell = F.when(
            F.col("resolved_fid").isNull() & F.col("fids").isNotNull(),
            F.col(cell_col_name),
        )
        joined = (
            joined.withColumn(
                "feature_id",
                F.when(F.col("resolved_fid") >= 0, F.col("resolved_fid")).otherwise(
                    F.when(
                        F.col("resolved_fid").isNull(),
                        winner(F.col(lon_col), F.col(lat_col), boundary_cell),
                    )
                ),
            )
            .drop("fids", "resolved_fid")
        )

    value_map = F.create_map(
        *[x for fid, poly in enumerate(polygons) for x in (F.lit(fid), F.lit(str(poly.value)))]
    )
    joined = joined.withColumn("zone_value", value_map[F.col("feature_id")])
    if how == "inner":
        joined = joined.filter(F.col("feature_id").isNotNull())
    return joined.drop("_pip_cell") if cell_col_name == "_pip_cell" else joined
