"""Data-window autocrop (SURVEY.md P10).

Reference semantics: on every convert, trim all-nodata borders — the
output grid shrinks to the bounding window of real data
(/root/reference/trefoil/cli/convert.py:140-152: per-variable data_window
from the nodata mask, then slice + adjusted affine transform).

Distributed shape:
1. per tile, one vectorized numpy pass finds the local non-NaN bounding
   box (all-nodata tiles emit nothing) — mapInPandas, shuffle-free;
2. a single global min/max aggregation over the ≤ntiles partial rows
   (exact integers) yields the GLOBAL data window;
3. ``crop_to_window`` trims the tile table to that window: interior
   tiles pass through untouched (predicate only — no byte copying),
   edge tiles are sliced. The cropped table keeps (ty, tx) relative to
   a new origin so downstream operators see a dense grid.

The scalar window collect in ``autocrop`` is bounded by construction
(exactly one row), matching the engine's prepass convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..grid.window import Window
from .gridspec import GridSpec

_PARTIAL_SCHEMA = (
    "ymin bigint, ymax bigint, xmin bigint, xmax bigint, n_valid bigint"
)


def data_window_partials(tiles: DataFrame, tile_size: int) -> DataFrame:
    """Per-tile non-NaN bounding boxes in GLOBAL pixel coords."""

    def gen(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blk = np.frombuffer(row.block, dtype=np.float32).reshape(
                    row.h, row.w
                )
                ok = ~np.isnan(blk)
                n = int(ok.sum())
                if n == 0:
                    continue
                ys = np.flatnonzero(ok.any(axis=1))
                xs = np.flatnonzero(ok.any(axis=0))
                oy, ox = int(row.ty) * tile_size, int(row.tx) * tile_size
                out.append(
                    (oy + int(ys[0]), oy + int(ys[-1]),
                     ox + int(xs[0]), ox + int(xs[-1]), n)
                )
            yield pd.DataFrame(
                out, columns=["ymin", "ymax", "xmin", "xmax", "n_valid"]
            )

    return tiles.mapInPandas(gen, schema=_PARTIAL_SCHEMA)


def data_window_df(tiles: DataFrame, spec: GridSpec) -> DataFrame:
    """1-row DataFrame: the global data window (inclusive pixel bounds)
    + valid-pixel count. All-integer — engine-portable for oracles."""
    return data_window_partials(tiles, spec.tile).agg(
        F.min("ymin").alias("ymin"),
        F.max("ymax").alias("ymax"),
        F.min("xmin").alias("xmin"),
        F.max("xmax").alias("xmax"),
        F.sum("n_valid").alias("n_valid"),
    )


def autocrop(tiles: DataFrame, spec: GridSpec) -> tuple[DataFrame, GridSpec, Window]:
    """Trim all-nodata borders: returns (cropped tile table, cropped
    GridSpec, the data Window). Tiles fully inside the window pass
    through with re-based (ty, tx) and untouched bytes; edge tiles are
    sliced in one Arrow pass."""
    row = data_window_df(tiles, spec).collect()[0]  # bounded: 1 row
    if row["ymin"] is None:
        raise ValueError("autocrop: no valid data in any tile")
    y0, y1 = int(row["ymin"]), int(row["ymax"]) + 1
    x0, x1 = int(row["xmin"]), int(row["xmax"]) + 1
    window = Window(slice(y0, y1), slice(x0, x1))

    new_spec = GridSpec(
        crs=spec.crs,
        x0=spec.x0 + x0 * spec.dx,
        y0=spec.y0 - y0 * spec.dy,
        dx=spec.dx,
        dy=spec.dy,
        width=x1 - x0,
        height=y1 - y0,
        tile=spec.tile,
    )
    tile = spec.tile
    ty0, ty1, tx0, tx1 = window.tile_range(tile)
    pruned = tiles.filter(
        (F.col("ty") >= ty0) & (F.col("ty") <= ty1)
        & (F.col("tx") >= tx0) & (F.col("tx") <= tx1)
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in tiles.schema.fields
    )
    cols = list(tiles.columns)

    def gen(batches):
        for pdf in batches:
            rows = []
            for row_ in pdf.itertuples(index=False):
                d = dict(zip(cols, row_))
                oy, ox = int(d["ty"]) * tile, int(d["tx"]) * tile
                sy0, sy1 = max(y0 - oy, 0), min(y1 - oy, int(d["h"]))
                sx0, sx1 = max(x0 - ox, 0), min(x1 - ox, int(d["w"]))
                if sy0 >= sy1 or sx0 >= sx1:
                    continue
                if (sy0, sy1, sx0, sx1) != (0, int(d["h"]), 0, int(d["w"])):
                    blk = np.frombuffer(d["block"], dtype=np.float32).reshape(
                        int(d["h"]), int(d["w"])
                    )
                    sub = blk[sy0:sy1, sx0:sx1]
                    d["block"] = np.ascontiguousarray(sub).tobytes()
                    d["h"], d["w"] = sub.shape
                # re-key into the cropped grid: new origin pixel (y0, x0).
                # NOTE: edge trims can leave tiles narrower than `tile`
                # mid-grid only when y0/x0 aren't tile-aligned; the new
                # (ty, tx) indexes the OLD tile lattice shifted to the
                # window's first tile — downstream ops use h/w per row,
                # never assume a full tile.
                d["ty"] = int(d["ty"]) - ty0
                d["tx"] = int(d["tx"]) - tx0
                rows.append(tuple(d[c] for c in cols))
            yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(gen, schema=schema), new_spec, window
