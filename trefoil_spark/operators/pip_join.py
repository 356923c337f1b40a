"""Distributed point-in-polygon join (SURVEY.md J1/J2; reference
rasterize-centroid semantics at /root/reference/trefoil/cli/zones.py:136-144).

Physical strategy (scale-first):

1. **Two-level quadtree covering index** (driver, memoized): polygons →
   qcell covering at a coarse res; every cell is classified as
   *interior* (whole cell inside its burn-order winner → resolved with
   no runtime test), *uniformly outside* (resolved to no-match), or
   *boundary*. Boundary coarse cells subdivide into a fine-res covering
   classified the same way. Interior area scales O(area) while boundary
   scales O(perimeter·cell_size), so the unresolved fraction shrinks
   quadratically with the fine res — this is what tames hot small
   polygons (dense urban cells) that would otherwise push their whole
   point mass through Python.
2. **Broadcast hash joins** on the cell keys (the point side computes the
   fine cell with pure Catalyst integer expressions and derives the
   coarse cell from it by bit-shift — whole-stage codegen, no shuffle).
3. **Interior fast path**: rows in resolved cells (either level) get
   their feature_id from the broadcast row — pure JVM.
4. **Exact refine** for fine-boundary rows only (a few % of input):
   Arrow-batched pandas UDF running the chunked vectorized even-odd
   crossing test, burn order resolved in-UDF (highest feature_id wins =
   GDAL rasterize overwrite order). With ``split_python=True`` those rows
   are a separate union branch, so interior rows never even transit Arrow.

Plan at 100 TB: Scan → codegen cell exprs → BHJ ×2 → [interior branch
pure JVM] ∪ [boundary branch ArrowEvalPython]. Zero shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..geometry import Polygon, points_in_rings
from ..grid import cells

DEFAULT_RES = 9
DEFAULT_FINE_RES = 14
BOUNDARY = -2  # fine-index sentinel: cell needs the exact per-point test


def cell_col(lon_col: str = "lon", lat_col: str = "lat", res: int = DEFAULT_RES) -> Column:
    """qcell id as a pure Catalyst expression (JVM-side, codegen-friendly).

    r8: ONE spread-bits SQL expression instead of a 2·res-step Column
    loop — the loop cost ~0.25 s of py4j round trips per plan build and
    2× the per-row work (bench: 0.20 s → 0.11 s per 20M rows; value
    parity with the per-bit form asserted in tests/test_cells.py).
    """
    return F.expr(cells.cell_fast_sql(lon_col, lat_col, res))


def parent_cell_col(cell: Column, res: int, parent_res: int) -> Column:
    """Derive the ancestor cell id from a finer one (pure bit arithmetic)."""
    steps = res - parent_res
    morton = F.shiftrightunsigned(cell, 5)
    return F.shiftleft(F.shiftrightunsigned(morton, 2 * steps), 5) + F.lit(parent_res)


def _segments_intersect_boxes(rings, bx0, by0, bx1, by1) -> np.ndarray:
    """Vectorized: does any polygon edge intersect each of N boxes?

    Standard separating-axis test (edge bbox overlaps box AND the box's
    corners straddle the edge's supporting line); corner-exactly-on-line
    counts as intersecting (conservative → extra exact tests, never wrong).
    """
    n = bx0.shape[0]
    hit = np.zeros(n, dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
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
        straddle = ~(allpos | allneg)
        hit |= (overlap & straddle).any(axis=1)
    return hit


def _classify_cells(polygons: list[Polygon], cell_ids: np.ndarray, cand: np.ndarray):
    """Burn-order classification of cells: (resolved[int], is_boundary[bool]).

    resolved: winning fid, or -1 = uniformly outside all candidates.
    is_boundary: needs an exact per-point test at runtime.
    """
    lat0, lon0, dlat, dlon = cells.cell_to_latlon(cell_ids)
    cx, cy = lon0 + dlon / 2.0, lat0 + dlat / 2.0
    nf, nc = cand.shape
    boundary = np.zeros((nf, nc), dtype=bool)
    inside = np.zeros((nf, nc), dtype=bool)
    for fid, poly in enumerate(polygons):
        idx = np.flatnonzero(cand[fid])
        if idx.size == 0:
            continue
        boundary[fid, idx] = _segments_intersect_boxes(
            poly.rings, lon0[idx], lat0[idx], (lon0 + dlon)[idx], (lat0 + dlat)[idx]
        )
        inside[fid, idx] = points_in_rings(cx[idx], cy[idx], poly.rings)

    resolved = np.full(nc, -1, dtype=np.int64)
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
    return resolved, is_boundary


_COVERING_CACHE: dict = {}


def build_covering_index(
    polygons: list[Polygon], res: int = DEFAULT_RES, fine_res: int = DEFAULT_FINE_RES
):
    """Two-level covering index (memoized).

    ``fine_res`` must be strictly finer than ``res`` (an equal or coarser
    fine level would make the fine index empty, silently dropping every
    boundary point), and ≤ 24: fine cell ids pass through a float64
    na_value round-trip in the winner UDF, and 2·24+6 = 54 bits is the
    last size exactly representable in a double's 53-bit mantissa.

    Returns dict with:
      coarse: [(cell, fids_desc, resolved|None)]   (None = boundary)
      fine:   [(cell, resolved|None)]              (children of boundary
               coarse cells at fine_res; None = still boundary)
      fine_fids: {fine_cell: fids_desc} for boundary fine cells (UDF map)
      rings_by_fid: {fid: rings}
    """
    if not res < fine_res <= 24:
        raise ValueError(
            f"require res < fine_res <= 24 (got res={res}, fine_res={fine_res}): "
            "fine_res == res would produce an empty fine index (boundary "
            "points silently unresolved); fine_res > 24 would corrupt cell "
            "ids in the winner UDF's float64 round-trip"
        )
    key = (
        res,
        fine_res,
        tuple((str(p.value), tuple(r.tobytes() for r in p.rings)) for p in polygons),
    )
    cached = _COVERING_CACHE.get(key)
    if cached is not None:
        return cached

    by_cell: dict[int, list[int]] = {}
    for fid, poly in enumerate(polygons):
        xmin, ymin, xmax, ymax = poly.bbox
        for c in cells.covering_cells(xmin, ymin, xmax, ymax, res).tolist():
            by_cell.setdefault(int(c), []).append(fid)

    cell_ids = np.fromiter(by_cell.keys(), dtype=np.int64, count=len(by_cell))
    pos = {int(c): i for i, c in enumerate(cell_ids)}
    nf, nc = len(polygons), cell_ids.shape[0]
    cand = np.zeros((nf, nc), dtype=bool)
    for c, fids in by_cell.items():
        for fid in fids:
            cand[fid, pos[c]] = True
    resolved, is_boundary = _classify_cells(polygons, cell_ids, cand)

    coarse = []
    for c, fids in by_cell.items():
        k = pos[c]
        coarse.append(
            (c, sorted(fids, reverse=True), None if is_boundary[k] else int(resolved[k]))
        )

    # subdivide boundary coarse cells to fine_res
    steps = fine_res - res
    fine: list[tuple[int, int | None]] = []
    fine_fids: dict[int, list[int]] = {}
    b_idx = np.flatnonzero(is_boundary)
    if steps > 0 and b_idx.size:
        per = 1 << steps
        bix, biy = cells.cell_to_xy(cell_ids[b_idx])
        # enumerate all fine children of each boundary coarse cell
        off = np.arange(per, dtype=np.int64)
        fx = (bix[:, None, None] << steps) + off[None, None, :]
        fy = (biy[:, None, None] << steps) + off[None, :, None]
        f_cells = cells.xy_to_cell(
            np.broadcast_to(fx, (b_idx.size, per, per)).ravel(),
            np.broadcast_to(fy, (b_idx.size, per, per)).ravel(),
            fine_res,
        )
        parent_row = np.repeat(b_idx, per * per)
        f_cand = cand[:, parent_row]  # candidates inherited from parent
        f_resolved, f_boundary = _classify_cells(polygons, f_cells, f_cand)
        for i, fc in enumerate(f_cells.tolist()):
            if f_boundary[i]:
                fine.append((fc, None))
                parent_fids = sorted(
                    np.flatnonzero(cand[:, parent_row[i]]).tolist(), reverse=True
                )
                fine_fids[fc] = parent_fids
            else:
                fine.append((fc, int(f_resolved[i])))

    rings_by_fid = {fid: [r.copy() for r in poly.rings] for fid, poly in enumerate(polygons)}
    out = {
        "coarse": coarse,
        "fine": fine,
        "fine_fids": fine_fids,
        "rings_by_fid": rings_by_fid,
        "res": res,
        "fine_res": fine_res,
    }
    _COVERING_CACHE[key] = out
    return out


def _covering_dfs(spark: SparkSession, index: dict):
    """(cov1, cov2) DataFrames for a covering index, memoized per session.

    r8: the fine index is ~10^5 rows; uploading it (pandas→Arrow→JVM
    createDataFrame) cost ~0.4 s of driver time and materializing it for
    the broadcast build another ~0.2 s on EVERY pip query. The index is
    a pure function of the polygon layer (same memoization contract as
    ``_COVERING_CACHE`` — no input data involved), so the session-lived
    DataFrames are built once and persisted (~1.5 MB) and each query's
    broadcast build reads the cached blocks.

    Arrow path (pandas), not pickled tuples, for the upload. r2 uses an
    INTEGER SENTINEL (-2 = boundary) instead of NULL: nullable columns
    round-tripped through pandas turn into DOUBLE NaN when the session
    has arrow.pyspark.enabled=false (NaN is not NULL → silently corrupts
    the resolution ladder and then explodes under ANSI casts). Pure
    int64 is representation-proof.
    """
    key = spark.sparkContext.applicationId
    dfs = index.setdefault("_session_dfs", {})
    cached = dfs.get(key)
    if cached is not None:
        return cached
    # coalesce(1): the per-query broadcast build re-reads these from the
    # block cache — one task instead of defaultParallelism near-empty
    # tasks per build (they are ≤ ~10^5 rows by construction)
    cov1 = spark.createDataFrame(
        index["coarse"], "c1 bigint, fids array<bigint>, r1 bigint"
    ).coalesce(1).persist()
    fine_rows = [
        (c, BOUNDARY if r is None else r) for c, r in (index["fine"] or [(-1, -1)])
    ]
    fine_pdf = pd.DataFrame(fine_rows, columns=["c2", "r2"]).astype("int64")
    cov2 = spark.createDataFrame(fine_pdf).coalesce(1).persist()
    dfs.clear()  # a dead session's persist handles are useless — drop them
    dfs[key] = (cov1, cov2)
    return cov1, cov2


def covering_index_df(
    spark: SparkSession, polygons: list[Polygon], res: int = DEFAULT_RES
) -> DataFrame:
    """Coarse covering as a DataFrame (kept for tests/inspection)."""
    idx = build_covering_index(polygons, res)
    return spark.createDataFrame(
        idx["coarse"], "cell bigint, fids array<bigint>, resolved_fid bigint"
    )


def _make_winner_udf(index: dict):
    """Vectorized pandas UDF: (lon, lat, fine_cell) -> feature_id|null.

    r8: rows are grouped per distinct CANDIDATE FID LIST, not per
    distinct fine cell. A point's exact tests depend only on its cell's
    (burn-ordered) candidate list, and the number of distinct lists is
    bounded by polygon-overlap combinations (a handful) while distinct
    boundary cells number in the hundreds per batch — the per-cell loop
    paid points_in_rings' fixed numpy setup ~800x per batch for ~500
    boundary rows (measured 35-130 ms/batch; now ~#groups x #fids
    calls). The cell -> group mapping is two sorted int64 arrays built
    once per index (vectorized searchsorted lookup, no per-row Python);
    per-point test order (descending fid burn order within the point's
    list) is unchanged, so results are identical.
    """
    rings_by_fid = index["rings_by_fid"]
    groups = index.get("_fid_groups")
    if groups is None:
        cell_fids = index["fine_fids"]
        gid_by_list: dict[tuple, int] = {}
        group_fids: list[tuple] = []
        keys = np.empty(len(cell_fids), dtype=np.int64)
        gids = np.empty(len(cell_fids), dtype=np.int64)
        for i, (c, fids) in enumerate(cell_fids.items()):
            t = tuple(fids)
            g = gid_by_list.get(t)
            if g is None:
                g = gid_by_list[t] = len(group_fids)
                group_fids.append(t)
            keys[i] = c
            gids[i] = g
        order = np.argsort(keys)
        groups = index["_fid_groups"] = (keys[order], gids[order], group_fids)
    cell_keys, cell_gids, group_fids = groups

    @F.pandas_udf(LongType())
    def winner(lon: pd.Series, lat: pd.Series, cell: pd.Series) -> pd.Series:
        cells_v = cell.to_numpy(dtype="float64", na_value=np.nan)
        out = np.full(len(cells_v), -1, dtype=np.int64)
        active = np.flatnonzero(~np.isnan(cells_v))
        if active.size and cell_keys.size:
            lon_v = lon.to_numpy(dtype=np.float64)
            lat_v = lat.to_numpy(dtype=np.float64)
            cells_i = cells_v[active].astype(np.int64)
            pos = np.searchsorted(cell_keys, cells_i)
            pos = np.clip(pos, 0, cell_keys.size - 1)
            known = cell_keys[pos] == cells_i  # guard: unknown cell -> -1
            g = np.where(known, cell_gids[pos], -1)
            for gid in np.unique(g[g >= 0]).tolist():
                idx = active[g == gid]
                for fid in group_fids[gid]:  # descending = burn order
                    if idx.size == 0:
                        break
                    inside = points_in_rings(lon_v[idx], lat_v[idx], rings_by_fid[fid])
                    out[idx[inside]] = fid
                    idx = idx[~inside]
        # plain int64 with -1 = no match: an object series with Nones
        # degrades to NaN doubles when the session runs the non-Arrow UDF
        # serializer (arrow.pyspark.enabled=false), silently corrupting
        # results — the NULL translation happens JVM-side instead
        return pd.Series(out)

    # deterministic in fact, but marked otherwise so Catalyst doesn't
    # duplicate the (expensive) UDF when pushing filters through projects
    return winner.asNondeterministic()


EXPR_REFINE_MAX_EDGES = 64


def _expr_refine_feature(polygons: list[Polygon], lon_col: str, lat_col: str) -> Column:
    """Boundary refine as a pure Catalyst CASE chain (burn order: highest
    fid first). CASE short-circuits in codegen, so only boundary rows pay
    the crossing tests — zero Python, zero Arrow traffic."""
    from ..geometry import pip_sql_expr

    expr = None
    for fid in range(len(polygons) - 1, -1, -1):
        cond = F.expr(pip_sql_expr(lon_col, lat_col, polygons[fid]))
        expr = F.when(cond, F.lit(fid)) if expr is None else expr.when(cond, F.lit(fid))
    return expr.otherwise(F.lit(None).cast("bigint"))


def pip_join(
    points: DataFrame,
    polygons: list[Polygon],
    key_cols: list[str] | None = None,  # kept for API compat; unused
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = DEFAULT_RES,
    fine_res: int = DEFAULT_FINE_RES,
    how: str = "inner",
    split_python: bool = False,
    refine: str = "auto",
) -> DataFrame:
    """Join points to the polygon layer; adds ``feature_id`` + ``zone_value``.

    Zero-shuffle; interior cells resolve JVM-side at two index levels;
    only fine-boundary rows (measured 0.83% on the flagship layer) need
    the exact test. ``refine`` picks its engine:
    - 'expr' — Catalyst CASE chain of crossing tests (pure JVM; best for
      small layers, total edges ≤ ~{EXPR_REFINE_MAX_EDGES});
    - 'udf'  — Arrow-batched numpy (per-cell candidate pruning; scales to
      arbitrarily complex layers);
    - 'auto' — currently 'udf' (see the measured trade below).

    ``split_python=True`` physically splits interior from boundary rows
    so interior rows never touch the refine engine at all:
    - with 'udf': interior rows skip the Arrow pipe entirely — the
      fastest mode at every core count on pre-projected (narrow) inputs
      and the best-scaling (BENCH/BASELINE.md round-2 table);
    - with 'expr': the CASE chain runs in its own post-exchange stage
      over boundary rows only (zero Python workers in the whole job) —
      without the exchange the chain's codegen fallback would drop the
      entire scan stage to interpreted execution.
    Default False keeps the single-pass plan (one scan; right for wide
    inputs where a second scan costs more than the Arrow pipe).

    Points matching no polygon are dropped under ``how='inner'``
    (reference zone-raster fill semantics) or kept with nulls under 'left'.
    """
    spark = points.sparkSession
    index = build_covering_index(polygons, res, fine_res)
    cov1, cov2 = _covering_dfs(spark, index)

    # compute the integer coords ONCE as columns; the spread-bits morton
    # references them several times and CollapseProject declines to inline
    # non-cheap exprs used more than once, so the plan stays linear-sized
    # and codegen evaluates each coord once per row
    pts = points.withColumn(
        "_qx", F.expr(cells.ix_sql_expr(lon_col, fine_res))
    ).withColumn("_qy", F.expr(cells.iy_sql_expr(lat_col, fine_res)))
    pts = pts.withColumn(
        "_cf", F.expr(cells.morton_fast_sql("_qx", "_qy", fine_res))
    ).drop("_qx", "_qy")
    pts = pts.withColumn("_cc", parent_cell_col(F.col("_cf"), fine_res, res))

    joined = (
        pts.join(F.broadcast(cov1), on=pts["_cc"] == cov1["c1"], how="left")
        .drop("c1")
        .join(F.broadcast(cov2), on=pts["_cf"] == cov2["c2"], how="left")
        .drop("c2")
    )

    # resolution ladder (pure JVM): coarse-resolved → fine-resolved → refine
    jvm_feature = F.when(F.col("r1") >= 0, F.col("r1")).when(
        F.col("r1").isNull() & (F.col("r2") >= 0), F.col("r2")
    )
    is_py = (
        F.col("r1").isNull()
        & F.col("fids").isNotNull()
        & (F.col("r2").isNull() | (F.col("r2") == BOUNDARY))
    )

    if refine == "auto":
        # 'udf' wins on measured throughput (4.1M rows/s @16 cores vs
        # 1.3M for 'expr' on the 40M-row flagship): the big CASE chain
        # exceeds whole-stage-codegen size limits and falls back to
        # interpreted evaluation, and Catalyst re-evaluates it under
        # filter pushdown. 'expr' scales more linearly ((4,16) efficiency
        # 0.84 vs 0.72) because it has no Python-worker contention —
        # useful on clusters where Python workers are the constraint.
        refine = "udf"

    if refine == "expr":
        if split_python:
            # split_expr: interior rows take the pure-column JVM ladder;
            # ONLY the ~1% boundary rows evaluate the big CASE chain.
            # This keeps the whole job JVM-side (zero Python workers —
            # nothing rides Arrow) without paying the chain's
            # interpreted-evaluation cost on every row: measured at the
            # hardware scaling ceiling on the 320M-row flagship
            # (BENCH/BASELINE.md), the cluster-shaped plan of choice.
            interior = joined.filter(~is_py).withColumn("feature_id", jvm_feature)
            # the repartition is load-bearing: the big CASE chain exceeds
            # codegen limits, which would otherwise drop the ENTIRE
            # scan+join+filter stage to interpreted execution for every
            # row. The exchange isolates the interpreted projection in
            # its own post-shuffle stage that only ever sees the ~1%
            # boundary rows (measured: 16.1s → ~2s on the 20M-row
            # flagship).
            boundary = (
                joined.filter(is_py)
                .repartition(max(joined.sparkSession.sparkContext.defaultParallelism, 1))
                .withColumn(
                    "feature_id", _expr_refine_feature(polygons, lon_col, lat_col)
                )
            )
            joined = interior.unionByName(boundary)
        else:
            joined = joined.withColumn(
                "feature_id",
                F.when(~is_py, jvm_feature).otherwise(
                    _expr_refine_feature(polygons, lon_col, lat_col)
                ),
            )
        joined = joined.drop("fids", "r1", "r2", "_cf", "_cc")
        value_map = F.create_map(
            *[x for fid, poly in enumerate(polygons) for x in (F.lit(fid), F.lit(str(poly.value)))]
        )
        joined = joined.withColumn("zone_value", value_map[F.col("feature_id")])
        if how == "inner":
            joined = joined.filter(F.col("feature_id").isNotNull())
        return joined

    winner = _make_winner_udf(index)
    # the raw UDF output uses -1 for "no match"; the NULL translation is a
    # separate JVM step (the UDF is nondeterministic-marked, so Catalyst
    # cannot collapse/duplicate it into downstream expressions)
    if split_python:
        interior = joined.filter(~is_py).withColumn("feature_id", jvm_feature)
        boundary = (
            joined.filter(is_py)
            .withColumn(
                "_fid_raw", winner(F.col(lon_col), F.col(lat_col), F.col("_cf"))
            )
            .withColumn(
                "feature_id", F.when(F.col("_fid_raw") >= 0, F.col("_fid_raw"))
            )
            .drop("_fid_raw")
        )
        joined = interior.unionByName(boundary)
    else:
        # single-pass: non-boundary rows pass NULL cell into the UDF so the
        # Python side does zero math for them (they still ride the Arrow
        # pipe — use split_python=True to avoid even that)
        joined = joined.withColumn(
            "_fid_raw",
            winner(F.col(lon_col), F.col(lat_col), F.when(is_py, F.col("_cf"))),
        ).withColumn(
            "feature_id",
            F.when(~is_py, jvm_feature).otherwise(
                F.when(F.col("_fid_raw") >= 0, F.col("_fid_raw"))
            ),
        )
    joined = joined.drop("fids", "r1", "r2", "_cf", "_cc", "_fid_raw")

    value_map = F.create_map(
        *[x for fid, poly in enumerate(polygons) for x in (F.lit(fid), F.lit(str(poly.value)))]
    )
    joined = joined.withColumn("zone_value", value_map[F.col("feature_id")])
    if how == "inner":
        joined = joined.filter(F.col("feature_id").isNotNull())
    return joined
