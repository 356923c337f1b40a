from .cells import (  # noqa: F401
    MAX_RES,
    cell_to_latlon,
    cell_to_res,
    cell_to_xy,
    children,
    covering_cells,
    latlon_to_cell,
    neighbors,
    parent,
    xy_to_cell,
)
from .coords import CoordinateVariable, SpatialCoordinates  # noqa: F401
from .window import Window  # noqa: F401
from .bbox import BBox, union_bbox  # noqa: F401
