"""kNN join on geotagged records (north-rule operator; SURVEY.md §2.3 "—").

Two physical strategies:

- **Brute force** (exactness baseline): queries broadcast against all
  points, ranking window per query. WindowGroupLimit gives partial top-k
  before the exchange, so the shuffle carries ≤ k rows per (query,
  partition) — correct at any scale, O(N·Q) distance evaluations.
- **Cell-bucketed ring join** (the scale path): both sides keyed by
  qcell at ``res``; candidates = points in the query's cell + its ring-R
  neighborhood (driver-enumerated neighbor offsets exploded on the SMALL
  query side, broadcast, equi-join on cell). Exact iff the true k-th
  neighbor lies within the ring — guaranteed when ring_radius·cell_size
  ≥ the k-th-neighbor distance bound; callers pick (res, ring) from
  point density, the classic grid-kNN trade.

Distance: squared Euclidean in degrees (deterministic rational ops on
exact inputs → bit-identical ranking in the DuckDB oracle; ties broken
by neighbor id). Haversine available for real-distance use."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .pip_join import cell_col


def sq_dist(qlon, qlat, plon, plat) -> Column:
    dx = F.col(qlon) - F.col(plon)
    dy = F.col(qlat) - F.col(plat)
    return dx * dx + dy * dy


def haversine_m(qlon, qlat, plon, plat) -> Column:
    """Great-circle metres (spherical, R=6371008.8)."""
    r = 6371008.8
    lat1, lat2 = F.radians(F.col(qlat)), F.radians(F.col(plat))
    dlat = lat2 - lat1
    dlon = F.radians(F.col(plon)) - F.radians(F.col(qlon))
    a = F.sin(dlat / 2) ** 2 + F.cos(lat1) * F.cos(lat2) * F.sin(dlon / 2) ** 2
    return F.lit(2 * r) * F.asin(F.sqrt(a))


def knn_join_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(lon_col).alias("_qlon"),
        F.col(lat_col).alias("_qlat"),
    )
    p = points.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(lon_col).alias("_plon"),
        F.col(lat_col).alias("_plat"),
    )
    cand = p.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.withColumn("_d", sq_dist("_qlon", "_qlat", "_plon", "_plat"))
    w = W.partitionBy("query_id").orderBy(F.col("_d"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def knn_join_cells(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 7,
    ring: int = 1,
) -> DataFrame:
    """Grid kNN: equi-join on the qcell neighborhood instead of cross join.

    The query side explodes its cell's (2·ring+1)² neighborhood (pure
    integer cell arithmetic via ix/iy offsets) and broadcasts; the big
    point side computes one cell id — no shuffle of points, candidates
    shrink from N to N·(ring²·cellarea/worldarea)."""
    n = 1 << res
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(lon_col).alias("_qlon"),
        F.col(lat_col).alias("_qlat"),
    )
    # neighborhood cells via ix/iy offsets (clamp lat, wrap lon)
    ix = F.expr(
        f"CAST(LEAST(GREATEST(FLOOR((_qlon + 180) / 360 * {n}), 0), {n - 1}) AS BIGINT)"
    )
    iy = F.expr(
        f"CAST(LEAST(GREATEST(FLOOR((_qlat + 90) / 180 * {n}), 0), {n - 1}) AS BIGINT)"
    )
    q = q.withColumn("_ix", ix).withColumn("_iy", iy)
    offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    cells_arr = F.array_distinct(
        F.array(
            *[
                _cell_from_xy(
                    F.pmod(F.col("_ix") + dx, F.lit(n)),
                    F.least(F.greatest(F.col("_iy") + dy, F.lit(0)), F.lit(n - 1)),
                    res,
                )
                for dx, dy in offsets
            ]
        )
    )
    q_exp = q.withColumn("_cell", F.explode(cells_arr)).drop("_ix", "_iy")

    p = points.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(lon_col).alias("_plon"),
        F.col(lat_col).alias("_plat"),
    ).withColumn("_pcell", cell_col("_plon", "_plat", res))

    cand = p.join(F.broadcast(q_exp), F.col("_pcell") == F.col("_cell")).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn("_d", sq_dist("_qlon", "_qlat", "_plon", "_plat"))
    w = W.partitionBy("query_id").orderBy(F.col("_d"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _cell_from_xy(ix: Column, iy: Column, res: int) -> Column:
    morton = F.lit(0).cast("bigint")
    for b in range(res):
        morton = morton + ix.bitwiseAND(F.lit(1 << b)).cast("bigint") * F.lit(1 << (b + 5))
        morton = morton + iy.bitwiseAND(F.lit(1 << b)).cast("bigint") * F.lit(1 << (b + 6))
    return morton + F.lit(res)
