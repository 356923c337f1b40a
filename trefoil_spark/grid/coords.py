"""Regular-grid coordinate math with exact reference-semantics parity.

Parity targets (all /root/reference/trefoil/netcdf/variable.py):
- indices_for_range  :47-87  (searchsorted + isclose tolerance, asc & desc)
- slice_by_range     :89-102
- pixel_size/edges   :213-229
- bbox               :261-275 (half-pixel outset)
- affine             :277-288
- from_bbox          :313-350 (FLOAT32 accumulation order — bit-exact)
- slice_by_bbox      :375-388 (half-pixel inset)
- get_window_for_bbox:412-426 (half-pixel inset via indices_for_range)

These run driver-side (or inside tile UDFs) on 1-D coordinate vectors —
they are cheap; the *result* (a Window / tile-key range) is what gets
pushed into Spark as partition-pruning filters, so the distributed plan
sees plain `cell/ty/tx BETWEEN` predicates.
"""

from __future__ import annotations

import numpy as np

from .bbox import BBox
from .window import Window


class CoordinateVariable:
    """1-D ordered coordinate vector (ascending or descending)."""

    def __init__(self, values):
        self.values = np.asarray(values)

    def __len__(self):
        return self.values.shape[0]

    def is_ascending_order(self) -> bool:
        return bool(self.values[0] < self.values[1])

    def indices_for_range(self, start, stop):
        """(start_idx, stop_idx) of the value range — reference variable.py:47-87.

        Half-open searchsorted adjusted one left unless the boundary matches
        within numpy.isclose tolerance; clamps at both ends; descending axes
        handled by reversing.
        """
        assert stop > start

        values = self.values
        if start > values.max():
            return values.size - 1, values.size - 1
        elif stop < values.min():
            return 0, 0

        if self.is_ascending_order():
            start_index = min(int(values.searchsorted(start)), values.size - 1)
            if start_index > 0 and not np.isclose(start, values[start_index]):
                start_index -= 1
            stop_index = min(int(values.searchsorted(stop)), values.size - 1)
            if not np.isclose(stop, values[stop_index]) and stop < values[stop_index]:
                stop_index -= 1
            return start_index, stop_index

        temp = values[::-1]
        start_index = min(int(temp.searchsorted(start)), temp.size - 1)
        if start_index > 0 and not np.isclose(start, temp[start_index]):
            start_index -= 1
        stop_index = min(int(temp.searchsorted(stop)), temp.size - 1)
        if not np.isclose(stop, temp[stop_index]) and stop < temp[stop_index]:
            stop_index -= 1
        size = values.size - 1
        return max(size - stop_index, 0), max(size - start_index, 0)

    def slice_by_range(self, start, stop) -> np.ndarray:
        """Values within [start, stop] — reference variable.py:89-102."""
        assert stop > start
        if start >= self.values.max() or stop <= self.values.min():
            return np.array([])
        start_index, stop_index = self.indices_for_range(start, stop)
        return self.values[start_index : stop_index + 1]

    # --- spatial extensions (SpatialCoordinateVariable parity) ---

    @property
    def min(self):
        return self.values.min()

    @property
    def max(self):
        return self.values.max()

    @property
    def pixel_size(self) -> float:
        return float(abs(self.values[1] - self.values[0]))

    @property
    def edges(self) -> np.ndarray:
        """Pixel-edge coordinates min..max — reference variable.py:217-229."""
        pixel_size = self.pixel_size
        if self.is_ascending_order():
            temp = np.append(self.values, self.values[-1] + pixel_size)
        else:
            temp = np.append(self.values[0] + pixel_size, self.values)
        return temp - (pixel_size / 2.0)

    def get_offset_for_subset(self, other: "CoordinateVariable") -> int:
        """Exact-match offset of `other` inside self — variable.py:231-239."""
        assert len(other) <= self.values.shape[0]
        return list(self.values).index(other.values[0])


class SpatialCoordinates:
    """x + y coordinate vectors with a CRS name (SpatialCoordinateVariables)."""

    def __init__(self, x: CoordinateVariable, y: CoordinateVariable, projection: str | None):
        self.x = x
        self.y = y
        self.projection = projection

    @property
    def shape(self):
        return (len(self.y), len(self.x))

    @property
    def bbox(self) -> BBox:
        """Half-pixel outset envelope — reference variable.py:261-275."""
        hx = self.x.pixel_size / 2.0
        hy = self.y.pixel_size / 2.0
        return BBox(
            (self.x.min - hx, self.y.min - hy, self.x.max + hx, self.y.max + hy),
            self.projection,
        )

    @property
    def affine(self):
        """(a, b, c, d, e, f) affine row-major terms — variable.py:277-288.

        c = xmin edge; f = ymin edge if ascending else ymax edge; e keeps the
        sign of the y axis direction.
        """
        bbox = self.bbox
        return (
            self.x.pixel_size,
            0.0,
            bbox.xmin,
            0.0,
            float(self.y.values[1] - self.y.values[0]),
            bbox.ymin if self.y.is_ascending_order() else bbox.ymax,
        )

    @staticmethod
    def from_bbox(bbox: BBox, x_size: int, y_size: int, dtype="float32",
                  y_ascending: bool = False) -> "SpatialCoordinates":
        """Centroid coordinate generation — reference variable.py:313-350.

        NOTE the accumulation order and dtype: arange in `dtype` (float32 by
        default), then *= pixel_size, then += offset — kept bit-exact so tile
        assignments match the reference.
        """
        if not bbox.projection:
            raise ValueError("bbox projection must be defined")
        x_pixel_size = (bbox.xmax - bbox.xmin) / float(x_size)
        y_pixel_size = (bbox.ymax - bbox.ymin) / float(y_size)

        x_arr = np.arange(x_size, dtype=dtype)
        x_arr *= x_pixel_size
        x_arr += bbox.xmin + x_pixel_size / 2.0

        if y_ascending:
            y_arr = np.arange(y_size, dtype=dtype)
            y_arr *= y_pixel_size
            y_arr += bbox.ymin + y_pixel_size / 2.0
        else:
            y_arr = np.arange(0, -y_size, -1, dtype=dtype)
            y_arr *= y_pixel_size
            y_arr += bbox.ymax - y_pixel_size / 2.0

        return SpatialCoordinates(
            CoordinateVariable(x_arr), CoordinateVariable(y_arr), bbox.projection
        )

    def slice_by_bbox(self, bbox: BBox) -> "SpatialCoordinates":
        """Half-pixel-inset value slice — reference variable.py:375-388."""
        hx = float(self.x.pixel_size) / 2
        hy = float(self.y.pixel_size) / 2
        return SpatialCoordinates(
            CoordinateVariable(self.x.slice_by_range(bbox.xmin + hx, bbox.xmax - hx)),
            CoordinateVariable(self.y.slice_by_range(bbox.ymin + hy, bbox.ymax - hy)),
            self.projection,
        )

    def slice_by_window(self, window: Window) -> "SpatialCoordinates":
        return SpatialCoordinates(
            CoordinateVariable(self.x.values[window.x_slice]),
            CoordinateVariable(self.y.values[window.y_slice]),
            self.projection,
        )

    def get_window_for_subset(self, subset: "SpatialCoordinates") -> Window:
        """Exact-coordinate-match window — reference variable.py:397-410."""
        y_offset = self.y.get_offset_for_subset(subset.y)
        x_offset = self.x.get_offset_for_subset(subset.x)
        return Window(
            (y_offset, len(subset.y) + y_offset),
            (x_offset, len(subset.x) + x_offset),
        )

    def get_window_for_bbox(self, bbox: BBox) -> Window:
        """BBox -> index Window with half-pixel inset — variable.py:412-426.

        THE tile-assignment parity function: every bbox/window query in the
        engine derives its tile-key predicate from this result.
        """
        hy = float(self.y.pixel_size) / 2
        hx = float(self.x.pixel_size) / 2
        y_offset, y_max = self.y.indices_for_range(bbox.ymin + hy, bbox.ymax - hy)
        x_offset, x_max = self.x.indices_for_range(bbox.xmin + hx, bbox.xmax - hx)
        return Window((y_offset, y_max + 1), (x_offset, x_max + 1))
