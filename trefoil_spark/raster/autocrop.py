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
3. the tile table is re-tiled onto the CROPPED grid's lattice. When the
   window origin is tile-aligned this is a shuffle-free map (interior
   tiles pass through untouched — predicate only, no byte copying; edge
   tiles are sliced). When it is NOT aligned, every pixel's new tile
   spans up to four old tiles, so the re-cut emits fragments keyed by
   new (ty, tx) and reassembles them with ONE grouped paste — otherwise
   downstream consumers that compute a tile's offset as ty*tile against
   new_spec would see every tile after the first displaced by
   (origin % tile) pixels.

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
    return _retile(pruned, tiles, y0, y1, x0, x1, new_spec), new_spec, window


def _retile(
    pruned: DataFrame,
    tiles: DataFrame,
    y0: int,
    y1: int,
    x0: int,
    x1: int,
    new_spec: GridSpec,
) -> DataFrame:
    """Crop tiles to pixel window [y0,y1)×[x0,x1) and re-key onto the
    cropped grid's OWN tile lattice (origin pixel (y0, x0) → tile (0,0)).

    Aligned window origin (y0, x0 multiples of tile): shuffle-free map —
    old tile (ty, tx) becomes exactly new tile (ty-ty0, tx-tx0), interior
    bytes pass through untouched. Unaligned: each old tile's cropped
    block is split along new-lattice boundaries into ≤4 fragments, then
    ONE grouped paste per new tile reassembles them (fragments of a new
    tile come from up to 4 old tiles)."""
    tile = new_spec.tile
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in tiles.schema.fields
    )
    cols = list(tiles.columns)

    if y0 % tile == 0 and x0 % tile == 0:
        oty0, otx0 = y0 // tile, x0 // tile

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
                    d["ty"] = int(d["ty"]) - oty0
                    d["tx"] = int(d["tx"]) - otx0
                    rows.append(tuple(d[c] for c in cols))
                yield pd.DataFrame(rows, columns=cols)

        return pruned.mapInPandas(gen, schema=schema)

    # unaligned: fragment + grouped paste (requires the engine tile schema)
    required = {"var", "t", "ty", "tx", "cell", "block", "h", "w"}
    if not required <= set(cols):
        raise ValueError(
            "autocrop with a non-tile-aligned data window requires the "
            f"standard tile schema {sorted(required)}; got {cols}"
        )
    frag_schema = (
        "var string, t int, ty int, tx int, fy int, fx int, "
        "block binary, h int, w int"
    )

    def fragment(batches):
        for pdf in batches:
            rows = []
            for row_ in pdf.itertuples(index=False):
                oy, ox = int(row_.ty) * tile, int(row_.tx) * tile
                sy0, sy1 = max(y0 - oy, 0), min(y1 - oy, int(row_.h))
                sx0, sx1 = max(x0 - ox, 0), min(x1 - ox, int(row_.w))
                if sy0 >= sy1 or sx0 >= sx1:
                    continue
                blk = np.frombuffer(row_.block, dtype=np.float32).reshape(
                    int(row_.h), int(row_.w)
                )
                gy0, gx0 = oy + sy0 - y0, ox + sx0 - x0  # cropped-grid px
                hh, ww = sy1 - sy0, sx1 - sx0
                for nty in range(gy0 // tile, (gy0 + hh - 1) // tile + 1):
                    ay0 = max(nty * tile, gy0)
                    ay1 = min((nty + 1) * tile, gy0 + hh)
                    for ntx in range(gx0 // tile, (gx0 + ww - 1) // tile + 1):
                        ax0 = max(ntx * tile, gx0)
                        ax1 = min((ntx + 1) * tile, gx0 + ww)
                        sub = blk[
                            sy0 + ay0 - gy0 : sy0 + ay1 - gy0,
                            sx0 + ax0 - gx0 : sx0 + ax1 - gx0,
                        ]
                        rows.append(
                            (
                                row_.var, int(row_.t), nty, ntx,
                                ay0 - nty * tile, ax0 - ntx * tile,
                                np.ascontiguousarray(sub).tobytes(),
                                sub.shape[0], sub.shape[1],
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["var", "t", "ty", "tx", "fy", "fx", "block", "h", "w"],
            )

    frags = pruned.mapInPandas(fragment, schema=frag_schema)

    from ..grid import cells
    from .synth import CELL_RES

    def paste(key, pdf: pd.DataFrame) -> pd.DataFrame:
        var, t, nty, ntx = key[0], int(key[1]), int(key[2]), int(key[3])
        th, tw = new_spec.tile_shape(nty, ntx)
        canvas = np.full((th, tw), np.nan, dtype=np.float32)
        for r in pdf.itertuples(index=False):
            blk = np.frombuffer(r.block, dtype=np.float32).reshape(r.h, r.w)
            canvas[r.fy : r.fy + r.h, r.fx : r.fx + r.w] = blk
        lat_c = new_spec.y0 - (nty * tile + th / 2.0) * new_spec.dy
        lon_c = new_spec.x0 + (ntx * tile + tw / 2.0) * new_spec.dx
        cell = int(cells.latlon_to_cell(lat_c, lon_c, CELL_RES))
        return pd.DataFrame(
            [(var, t, nty, ntx, cell, canvas.tobytes(), th, tw)],
            columns=["var", "t", "ty", "tx", "cell", "block", "h", "w"],
        )

    return frags.groupBy("var", "t", "ty", "tx").applyInPandas(
        paste,
        schema="var string, t int, ty int, tx int, cell bigint, "
        "block binary, h int, w int",
    )
