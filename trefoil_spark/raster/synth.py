"""Synthetic tile source — the sandbox stand-in for raster ingestion.

The reference ingests GeoTIFF/NetCDF (conversion.py:17-69, convert.py:42-195);
rasterio/netCDF4 are absent here, so the tile DataFrame is generated
deterministically from a pixel formula. The FORMULA is the fixture: it has
an exact SQL twin, so every downstream tile operator can be checked against
a DuckDB pixel-grain oracle (tile path vs row path, same numbers).

Pixel value (integer-valued double → exact float64 sums):
    v(t, y, x)  = (y*37 + x*17 + t*101) % 1000
Nodata mask (reference masked-array semantics, summary.py:143-144):
    masked(t, y, x) iff (y*131 + x*7) % 97 == 0

Tile DataFrame schema:
    var:string, t:int, ty:int, tx:int, cell:bigint,
    block:binary (float32 LE, row-major, NaN = masked),
    h:int, w:int
``cell`` is the qcell of the tile's center at DEFAULT_RES — the spatial
partition/sort key for pruning at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..grid import cells
from .gridspec import GridSpec

TILE_SCHEMA = (
    "var string, t int, ty int, tx int, cell bigint, block binary, h int, w int"
)

CELL_RES = 7


def block_values(spec: GridSpec, t: int, ty: int, tx: int) -> np.ndarray:
    """float32 block with NaN at masked pixels (the fixture formula)."""
    h, w = spec.tile_shape(ty, tx)
    ys = ty * spec.tile + np.arange(h, dtype=np.int64)[:, None]
    xs = tx * spec.tile + np.arange(w, dtype=np.int64)[None, :]
    v = ((ys * 37 + xs * 17 + t * 101) % 1000).astype(np.float32)
    masked = (ys * 131 + xs * 7) % 97 == 0
    v[np.broadcast_to(masked, v.shape)] = np.nan
    return v


def value_sql(y_col: str, x_col: str, t_col: str = "0") -> str:
    """SQL twin of block_values (NULL where masked) — Spark & DuckDB."""
    v = f"CAST(({y_col}*37 + {x_col}*17 + ({t_col})*101) % 1000 AS DOUBLE)"
    masked = f"(({y_col}*131 + {x_col}*7) % 97 = 0)"
    return f"(CASE WHEN {masked} THEN NULL ELSE {v} END)"


def synthetic_tiles(
    spark: SparkSession,
    spec: GridSpec,
    timesteps: int = 1,
    var: str = "synth",
) -> DataFrame:
    """Distributed tile generation: range over tile indices → mapInPandas.

    One task generates a handful of 256 KiB blocks; nothing large ever
    lives on the driver. At real scale this node is replaced by a scan of
    the stored tile table — every operator downstream is identical.
    """
    nty, ntx = spec.ntiles_y, spec.ntiles_x
    n = nty * ntx * timesteps
    par = min(n, spark.sparkContext.defaultParallelism * 2)
    idx = spark.range(0, n, numPartitions=par)

    tile = spec.tile

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"].to_numpy():
                t = int(i) // (nty * ntx)
                rem = int(i) % (nty * ntx)
                ty, tx = rem // ntx, rem % ntx
                blk = block_values(spec, t, ty, tx)
                h, w = blk.shape
                lat_c = spec.y0 - (ty * tile + h / 2.0) * spec.dy
                lon_c = spec.x0 + (tx * tile + w / 2.0) * spec.dx
                cell = int(cells.latlon_to_cell(lat_c, lon_c, CELL_RES))
                out.append((var, t, ty, tx, cell, blk.tobytes(), h, w))
            yield pd.DataFrame(
                out, columns=["var", "t", "ty", "tx", "cell", "block", "h", "w"]
            )

    return idx.mapInPandas(gen, schema=TILE_SCHEMA)
