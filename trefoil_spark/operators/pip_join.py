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


def _segments_intersect_box(rings, bx0, by0, bx1, by1) -> bool:
    """True if any polygon edge intersects the axis-aligned box."""
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        # bbox reject
        alive = ~(
            (np.maximum(x1, x2) < bx0)
            | (np.minimum(x1, x2) > bx1)
            | (np.maximum(y1, y2) < by0)
            | (np.minimum(y1, y2) > by1)
        )
        if not alive.any():
            continue
        xa, ya, xb, yb = x1[alive], y1[alive], x2[alive], y2[alive]
        # line side test for the 4 corners: if all corners strictly one side
        # of the segment's supporting line, no intersection for that edge
        dx, dy = xb - xa, yb - ya
        corners = [(bx0, by0), (bx1, by0), (bx1, by1), (bx0, by1)]
        sides = np.stack([dx * (cy - ya) - dy * (cx - xa) for cx, cy in corners])
        straddles = ~((sides > 0).all(axis=0) | (sides < 0).all(axis=0))
        if straddles.any():
            return True
    return False


def build_covering_index(polygons: list[Polygon], res: int = DEFAULT_RES):
    """Driver-side covering index.

    Returns (rows, rings_by_fid) where rows = [(cell, fids_desc, resolved)]:
    ``resolved`` is the burn-order winner when the whole cell is interior
    to that polygon (no exact test needed at runtime), else None.
    """
    by_cell: dict[int, list[int]] = {}
    for fid, poly in enumerate(polygons):
        xmin, ymin, xmax, ymax = poly.bbox
        for c in cells.covering_cells(xmin, ymin, xmax, ymax, res).tolist():
            by_cell.setdefault(int(c), []).append(fid)

    rows = []
    for c, fids in by_cell.items():
        fids_desc = sorted(fids, reverse=True)
        lat0, lon0, dlat, dlon = cells.cell_to_latlon(np.int64(c))
        lat0, lon0, dlat, dlon = float(lat0), float(lon0), float(dlat), float(dlon)
        resolved = None
        for fid in fids_desc:  # burn order: highest first
            poly = polygons[fid]
            if _segments_intersect_box(poly.rings, lon0, lat0, lon0 + dlon, lat0 + dlat):
                break  # boundary cell for the top candidate → needs exact test
            # no edge crosses the cell: membership is uniform across the cell
            if poly.contains(lon0 + dlon / 2.0, lat0 + dlat / 2.0):
                resolved = fid
                break
            # uniformly outside this candidate → try the next-lower fid
        rows.append((c, fids_desc, resolved))

    rings_by_fid = {fid: [r.copy() for r in poly.rings] for fid, poly in enumerate(polygons)}
    return rows, rings_by_fid


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
        ).withColumn("feature_id", F.col("resolved_fid"))
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
                F.coalesce(
                    F.col("resolved_fid"),
                    winner(F.col(lon_col), F.col(lat_col), boundary_cell),
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
