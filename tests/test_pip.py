"""PIP even-odd rule: numpy path vs SQL twin vs scalar oracle."""

import duckdb
import numpy as np
import pandas as pd

from trefoil_spark.geometry import Polygon, pip_sql_expr, points_in_polygon


SQUARE = Polygon([[(0, 0), (10, 0), (10, 10), (0, 10)]])
CONCAVE = Polygon([[(0, 0), (10, 0), (10, 10), (5, 5), (0, 10)]])  # notch at top
HOLED = Polygon([
    [(0, 0), (10, 0), (10, 10), (0, 10)],
    [(4, 4), (6, 4), (6, 6), (4, 6)],  # hole
])


def test_square():
    assert SQUARE.contains(5, 5)
    assert not SQUARE.contains(-1, 5)
    assert not SQUARE.contains(11, 5)
    assert not SQUARE.contains(5, 10.5)


def test_concave():
    assert CONCAVE.contains(1, 1)
    assert not CONCAVE.contains(5, 8)  # inside the notch
    assert CONCAVE.contains(5, 4)


def test_hole():
    assert HOLED.contains(2, 2)
    assert not HOLED.contains(5, 5)  # inside the hole
    assert HOLED.contains(7, 7)


def test_adjacent_polygons_no_double_claim():
    """Centroid rule (all_touched=False, zones.py:141): a point on the shared
    edge of two adjacent polygons is claimed by exactly one."""
    left = Polygon([[(0, 0), (5, 0), (5, 10), (0, 10)]])
    right = Polygon([[(5, 0), (10, 0), (10, 10), (5, 10)]])
    rng = np.random.default_rng(3)
    ys = rng.uniform(0.01, 9.99, 200)
    xs = np.full_like(ys, 5.0)  # exactly on the shared edge
    in_left = points_in_polygon(xs, ys, left)
    in_right = points_in_polygon(xs, ys, right)
    assert not np.any(in_left & in_right)
    # interior points are claimed properly
    assert points_in_polygon(np.array([2.0]), np.array([5.0]), left)[0]
    assert points_in_polygon(np.array([7.0]), np.array([5.0]), right)[0]


def test_vectorized_matches_grid():
    gy, gx = np.mgrid[0.25:10:0.5, 0.25:10:0.5]
    got = points_in_polygon(gx.ravel(), gy.ravel(), CONCAVE)
    # oracle: scalar loop
    want = np.array([CONCAVE.contains(x, y) for x, y in zip(gx.ravel(), gy.ravel())])
    assert np.array_equal(got, want)


def test_sql_twin_matches_numpy():
    rng = np.random.default_rng(11)
    xs = rng.uniform(-2, 12, 3000)
    ys = rng.uniform(-2, 12, 3000)
    for poly in (SQUARE, CONCAVE, HOLED):
        want = points_in_polygon(xs, ys, poly)
        con = duckdb.connect()
        con.register("pts", pd.DataFrame({"x": xs, "y": ys}))
        got = con.execute(
            f"SELECT {pip_sql_expr('x', 'y', poly)} AS inside FROM pts"
        ).fetchnumpy()["inside"]
        assert np.array_equal(got.astype(bool), want)
