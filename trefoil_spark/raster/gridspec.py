"""Grid specification for the distributed tile engine.

A GridSpec describes a dense regular raster exactly like the reference's
SpatialCoordinateVariables (variable.py:199-350) but as a pure value
object: the tile DataFrame stores only (t, ty, tx, block); world
coordinates are *computed* from the spec (never stored per pixel) —
the same design as the reference's affine transform (variable.py:277-288).

y is descending by default (row 0 = top), matching the reference's
`from_bbox(..., y_ascending=False)` convention (variable.py:313-350).

Pixel-center math here is float64 with dyadic-friendly formulas:
    lon(x) = x0 + (x + 0.5) * dx
    lat(y) = y0 - (y + 0.5) * dy      (descending)
When dx/dy are dyadic rationals (e.g. 12/1024) these are EXACT IEEE
doubles, so Spark expressions, DuckDB oracle SQL, and numpy agree
bit-for-bit. For reference-parity coordinate *vectors* (float32
accumulation order) use grid.coords.SpatialCoordinates.from_bbox.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..grid.bbox import BBox
from ..grid.coords import CoordinateVariable, SpatialCoordinates
from ..grid.window import Window


@dataclass(frozen=True)
class GridSpec:
    x0: float          # west edge
    y0: float          # NORTH edge (y descending)
    dx: float          # pixel width (positive)
    dy: float          # pixel height (positive)
    width: int         # pixels in x
    height: int        # pixels in y
    crs: str = "EPSG:4326"
    tile: int = 256

    @staticmethod
    def from_bbox(bbox: BBox, width: int, height: int, tile: int = 256) -> "GridSpec":
        return GridSpec(
            x0=bbox.xmin,
            y0=bbox.ymax,
            dx=(bbox.xmax - bbox.xmin) / float(width),
            dy=(bbox.ymax - bbox.ymin) / float(height),
            width=width,
            height=height,
            crs=bbox.projection or "EPSG:4326",
            tile=tile,
        )

    @property
    def bbox(self) -> BBox:
        return BBox(
            (self.x0, self.y0 - self.dy * self.height, self.x0 + self.dx * self.width, self.y0),
            self.crs,
        )

    @property
    def ntiles_y(self) -> int:
        return -(-self.height // self.tile)

    @property
    def ntiles_x(self) -> int:
        return -(-self.width // self.tile)

    def tile_shape(self, ty: int, tx: int) -> tuple[int, int]:
        h = min(self.tile, self.height - ty * self.tile)
        w = min(self.tile, self.width - tx * self.tile)
        return (h, w)

    def pixel_centers(self, ty: int, tx: int):
        """(lat2d, lon2d) float64 pixel-center coords for one tile."""
        h, w = self.tile_shape(ty, tx)
        ys = ty * self.tile + np.arange(h, dtype=np.float64)
        xs = tx * self.tile + np.arange(w, dtype=np.float64)
        lat = self.y0 - (ys + 0.5) * self.dy
        lon = self.x0 + (xs + 0.5) * self.dx
        return np.broadcast_to(lat[:, None], (h, w)), np.broadcast_to(lon[None, :], (h, w))

    def coords(self, dtype="float64") -> SpatialCoordinates:
        """Reference-style coordinate vectors (descending y)."""
        x = self.x0 + (np.arange(self.width, dtype=dtype) + 0.5) * self.dx
        y = self.y0 - (np.arange(self.height, dtype=dtype) + 0.5) * self.dy
        return SpatialCoordinates(CoordinateVariable(x), CoordinateVariable(y), self.crs)

    def window_for_bbox(self, bbox: BBox) -> Window:
        """Reference P3 semantics (variable.py:412-426) via coords()."""
        return self.coords().get_window_for_bbox(bbox)

    # --- SQL twins (pixel index -> world coords), exact in float64 when
    # dx/dy are dyadic; identical text runs in Spark SQL and DuckDB ---

    def lon_sql(self, x_col: str) -> str:
        return (
            f"(CAST({self.x0!r} AS DOUBLE) + (CAST({x_col} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
            f" * CAST({self.dx!r} AS DOUBLE))"
        )

    def lat_sql(self, y_col: str) -> str:
        return (
            f"(CAST({self.y0!r} AS DOUBLE) - (CAST({y_col} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
            f" * CAST({self.dy!r} AS DOUBLE))"
        )
