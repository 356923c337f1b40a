"""Distributed point-in-polygon join (SURVEY.md J1/J2; reference
rasterize-centroid semantics at /root/reference/trefoil/cli/zones.py:136-144).

Physical strategy (scale-first):
1. **Covering index** (driver): each polygon's bbox → qcell covering at
   ``res`` → a small (cell, feature_id) DataFrame. Cheap theta-join
   avoidance, mirrors the reference's fiona bbox pushdown (zones.py:101-107).
2. **Broadcast hash join** on ``cell`` (points side computes ``cell`` with
   pure Catalyst integer expressions — whole-stage codegen, no shuffle of
   the big side, no Python).
3. **Exact refine**: Arrow-batched pandas UDF running the vectorized
   even-odd crossing test (numpy, points x edges) per candidate row.
4. **Burn order**: on overlap the highest feature_id wins (GDAL rasterize
   burn order) via max_by per point key — the only shuffle in the operator,
   skipped when ``resolve_overlaps=False`` (declared-disjoint layers).

At 100 TB the plan is: scan → codegen cell expr → BroadcastHashJoin →
ArrowEvalPython (refine) → [optional shuffle for burn order]. The covering
res trades broadcast size (4^res growth) vs refine selectivity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType

from ..geometry import Polygon, points_in_rings
from ..grid import cells

DEFAULT_RES = 7


def cell_col(lon_col: str = "lon", lat_col: str = "lat", res: int = DEFAULT_RES) -> Column:
    """qcell id as a pure Catalyst expression (JVM-side, codegen-friendly)."""
    ix = F.expr(cells.ix_sql_expr(lon_col, res))
    iy = F.expr(cells.iy_sql_expr(lat_col, res))
    morton = F.lit(0).cast("bigint")
    for b in range(res):
        morton = morton + ix.bitwiseAND(F.lit(1 << b)).cast("bigint") * F.lit(1 << (b + 5))
        # shifting (ix & 2^b) left by (b+5) lands bit b at 2b+5; iy at 2b+6
        morton = morton + iy.bitwiseAND(F.lit(1 << b)).cast("bigint") * F.lit(1 << (b + 6))
    return morton + F.lit(res)


def covering_pairs_df(
    spark: SparkSession, polygons: list[Polygon], res: int = DEFAULT_RES
) -> DataFrame:
    """(cell, feature_id, zone_value) covering-index DataFrame (broadcast side)."""
    rows = []
    for fid, poly in enumerate(polygons):
        xmin, ymin, xmax, ymax = poly.bbox
        for c in cells.covering_cells(xmin, ymin, xmax, ymax, res).tolist():
            rows.append((int(c), fid, str(poly.value)))
    return spark.createDataFrame(rows, "cell bigint, feature_id bigint, zone_value string")


def covering_lists_df(
    spark: SparkSession, polygons: list[Polygon], res: int = DEFAULT_RES
) -> DataFrame:
    """(cell, fids:array<bigint>) — one row per cell, candidate features
    sorted DESCENDING (burn order: later feature wins, so test it first)."""
    by_cell: dict[int, list[int]] = {}
    for fid, poly in enumerate(polygons):
        xmin, ymin, xmax, ymax = poly.bbox
        for c in cells.covering_cells(xmin, ymin, xmax, ymax, res).tolist():
            by_cell.setdefault(int(c), []).append(fid)
    rows = [(c, sorted(fids, reverse=True)) for c, fids in by_cell.items()]
    return spark.createDataFrame(rows, "cell bigint, fids array<bigint>")


def _make_refine_udf(polygons: list[Polygon]):
    """Vectorized pandas UDF: (lon, lat, feature_id) -> inside:boolean.

    The polygon rings ride the closure (small; serialized once per task,
    the broadcast-variable pattern). Batches are grouped by feature_id so
    each group is one vectorized points-x-edges numpy evaluation.
    """
    rings_by_fid = {fid: [r.copy() for r in poly.rings] for fid, poly in enumerate(polygons)}

    @F.pandas_udf(BooleanType())
    def refine(lon: pd.Series, lat: pd.Series, fid: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        lon_v = lon.to_numpy(dtype=np.float64)
        lat_v = lat.to_numpy(dtype=np.float64)
        fid_v = fid.to_numpy()
        for f in np.unique(fid_v):
            sel = fid_v == f
            out[sel] = points_in_rings(lon_v[sel], lat_v[sel], rings_by_fid[int(f)])
        return pd.Series(out)

    return refine


def _make_winner_udf(polygons: list[Polygon]):
    """Vectorized pandas UDF: (lon, lat, fids) -> winning feature_id or null.

    ``fids`` arrives sorted descending (burn order), so the first polygon
    containing the point wins — exactly GDAL's rasterize overwrite order.
    Batch rows are grouped by their candidate list; each (list, polygon)
    evaluation is one vectorized points-x-edges numpy call over only the
    still-unresolved rows, so total work ≈ candidates, same as the explode
    plan but with no row multiplication and no later dedup shuffle.
    """
    rings_by_fid = {fid: [r.copy() for r in poly.rings] for fid, poly in enumerate(polygons)}

    @F.pandas_udf(LongType())
    def winner(lon: pd.Series, lat: pd.Series, fids: pd.Series) -> pd.Series:
        lon_v = lon.to_numpy(dtype=np.float64)
        lat_v = lat.to_numpy(dtype=np.float64)
        out = np.full(len(lon_v), -1, dtype=np.int64)
        # group rows by identical candidate list (few distinct lists/batch)
        keys = fids.map(lambda a: tuple(a) if a is not None else ())
        for key in keys.unique():
            sel = (keys == key).to_numpy()
            idx = np.flatnonzero(sel)
            unresolved = idx
            for fid in key:  # already descending = burn order
                if unresolved.size == 0:
                    break
                inside = points_in_rings(
                    lon_v[unresolved], lat_v[unresolved], rings_by_fid[int(fid)]
                )
                out[unresolved[inside]] = int(fid)
                unresolved = unresolved[~inside]
        return pd.Series(out).where(lambda s: s >= 0, other=None)

    # deterministic in fact, but marked otherwise so Catalyst doesn't
    # duplicate the (expensive) UDF when pushing filters through the project
    return winner.asNondeterministic()


def pip_join(
    points: DataFrame,
    polygons: list[Polygon],
    key_cols: list[str] | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = DEFAULT_RES,
    how: str = "inner",
    cell_col_name: str | None = None,
) -> DataFrame:
    """Join points to the polygon layer; adds feature_id + zone_value.

    Zero-shuffle plan: scan → codegen cell expr → BroadcastHashJoin with
    the per-cell candidate-list index (1:1, no row multiplication) →
    ArrowEvalPython winner UDF (burn-order resolved inside the UDF) →
    filter. Points matching no polygon are dropped under ``how='inner'``
    (reference zone-raster fill semantics); ``how='left'`` keeps them with
    null zone_value.

    ``key_cols`` is accepted for API compatibility but no longer needed —
    burn order is resolved without a dedup shuffle.
    """
    spark = points.sparkSession
    cov = covering_lists_df(spark, polygons, res)

    pts = points
    if cell_col_name is None:
        cell_col_name = "_pip_cell"
        pts = pts.withColumn(cell_col_name, cell_col(lon_col, lat_col, res))

    joined = pts.join(
        F.broadcast(cov), on=pts[cell_col_name] == cov["cell"], how="left"
    ).drop("cell")

    winner = _make_winner_udf(polygons)
    joined = joined.withColumn(
        "feature_id",
        F.when(
            F.col("fids").isNotNull(),
            winner(F.col(lon_col), F.col(lat_col), F.col("fids")),
        ),
    ).drop("fids")

    value_map = F.create_map(
        *[x for fid, poly in enumerate(polygons) for x in (F.lit(fid), F.lit(str(poly.value)))]
    )
    joined = joined.withColumn("zone_value", value_map[F.col("feature_id")])
    if how == "inner":
        joined = joined.filter(F.col("feature_id").isNotNull())
    return joined.drop("_pip_cell") if cell_col_name == "_pip_cell" else joined
