"""Tile-grain zonal statistics (SURVEY.md A1, J3/J5) — the flagship
raster pipeline: value tiles ⨝ zone tiles → per-tile partial aggregation
(vectorized numpy, no per-row Python) → native final hash aggregate.

Reference semantics (/root/reference/trefoil/analysis/summary.py:116-173):
stats {mean,min,max,std,sum,count}; population std; masked pixels excluded;
all-masked zones skipped (they simply emit no partials).

Physical plan: BroadcastHashJoin on (ty, tx) [zone side small / co-keyed
at scale] → mapInPandas partials (bincount-style numpy per tile, the same
trick the reference uses at summary.py:19-25) → ONE shuffle of tiny
(zone, partial) rows → final agg. Partial rows per tile ≤ #zones, so the
shuffle is O(tiles × zones), independent of pixel count — this is the
map-side-combine structure that makes the job scan-bound at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rasterize import FILL

PARTIAL_SCHEMA = (
    "t int, zone int, psum double, psumsq double, pmin double, pmax double, pcount bigint"
)


def tile_zonal_partials(joined: DataFrame) -> DataFrame:
    """Per-tile per-zone partials from rows carrying block + zone_block."""

    def gen(batches):
        for pdf in batches:
            out: list[tuple] = []
            for row in pdf.itertuples(index=False):
                v = np.frombuffer(row.block, dtype=np.float32).astype(np.float64)
                z = np.frombuffer(row.zone_block, dtype=np.uint16)
                ok = ~np.isnan(v) & (z != FILL)
                if not ok.any():
                    continue
                zv = z[ok].astype(np.int64)
                vv = v[ok]
                # bincount partials (vectorized; reference summary.py:19-25)
                nz = int(zv.max()) + 1
                cnt = np.bincount(zv, minlength=nz)
                s = np.bincount(zv, weights=vv, minlength=nz)
                sq = np.bincount(zv, weights=vv * vv, minlength=nz)
                order = np.argsort(zv, kind="stable")
                zs, starts = np.unique(zv[order], return_index=True)
                vmin = np.minimum.reduceat(vv[order], starts)
                vmax = np.maximum.reduceat(vv[order], starts)
                for k, zone in enumerate(zs):
                    out.append(
                        (
                            int(row.t),
                            int(zone),
                            float(s[zone]),
                            float(sq[zone]),
                            float(vmin[k]),
                            float(vmax[k]),
                            int(cnt[zone]),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=["t", "zone", "psum", "psumsq", "pmin", "pmax", "pcount"],
            )

    return joined.mapInPandas(gen, schema=PARTIAL_SCHEMA)


def finalize_zonal(partials: DataFrame, by_time: bool = False) -> DataFrame:
    """Final agg over partials; mean/std as deterministic expression trees
    over exact sums (engine-portable, see operators/zonal.py)."""
    keys = ["zone", "t"] if by_time else ["zone"]
    g = partials.groupBy(*keys).agg(
        F.sum("psum").alias("_s"),
        F.sum("psumsq").alias("_sq"),
        F.min("pmin").alias("min"),
        F.max("pmax").alias("max"),
        F.sum("pcount").alias("count"),
    )
    return g.select(
        *keys,
        (F.col("_s") / F.col("count")).alias("mean"),
        F.col("min"),
        F.col("max"),
        F.sqrt(
            F.col("_sq") / F.col("count")
            - (F.col("_s") / F.col("count")) * (F.col("_s") / F.col("count"))
        ).alias("std"),
        F.col("_s").alias("sum"),
        F.col("count"),
    )


def tile_zonal_statistics(
    tiles: DataFrame, zone_tiles: DataFrame, by_time: bool = False
) -> DataFrame:
    """values ⨝ zones on (ty, tx) → partials → final agg."""
    joined = tiles.join(F.broadcast(zone_tiles.select("ty", "tx", "zone_block")), ["ty", "tx"])
    return finalize_zonal(tile_zonal_partials(joined), by_time=by_time)
