"""Property-based tests (hypothesis) — coverage the reference never had
(SURVEY.md §5.1 notes its absence). Pure-numpy properties only: fast,
no Spark session."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from trefoil_spark.geometry.pip import Polygon, points_in_rings
from trefoil_spark.grid import cells
from trefoil_spark.grid.coords import CoordinateVariable
from trefoil_spark.raster.vectorize import boundary_rings, label_components

finite_lat = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
finite_lon = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)


@given(lat=finite_lat, lon=finite_lon, res=st.integers(min_value=0, max_value=29))
@settings(max_examples=200, deadline=None)
def test_cell_contains_its_point(lat, lon, res):
    c = cells.latlon_to_cell(lat, lon, res)
    clat, clon, dlat, dlon = cells.cell_to_latlon(c)
    # 1e-9° slack: points within an ulp of a cell boundary may round to
    # the adjacent cell — identically in numpy, Spark SQL, and DuckDB
    # (same formula), which is the property that actually matters
    assert clat - 1e-9 <= lat < clat + dlat + 1e-9
    assert clon - 1e-9 <= lon < clon + dlon + 1e-9
    assert int(cells.cell_to_res(c)) == res


@given(lat=finite_lat, lon=finite_lon, res=st.integers(min_value=1, max_value=29))
@settings(max_examples=100, deadline=None)
def test_parent_contains_child(lat, lon, res):
    c = cells.latlon_to_cell(lat, lon, res)
    p = cells.parent(c)
    plat, plon, dlat, dlon = cells.cell_to_latlon(p)
    assert plat - 1e-9 <= lat < plat + dlat + 1e-9
    assert plon - 1e-9 <= lon < plon + dlon + 1e-9
    assert c in cells.children(int(p))


@given(
    start=st.integers(min_value=-50, max_value=200),
    span=st.integers(min_value=1, max_value=100),
    n=st.integers(min_value=2, max_value=60),
    ascending=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_indices_for_range_invariants(start, span, n, ascending):
    """Window picks are always valid in-bounds ordered index pairs."""
    values = np.arange(n, dtype=float)
    if not ascending:
        values = values[::-1]
    v = CoordinateVariable(values)
    lo, hi = v.indices_for_range(float(start), float(start + span))
    assert 0 <= lo <= hi <= n - 1


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_pip_matches_matplotlib_free_oracle(data):
    """Vectorized chunked PIP == naive per-point crossing count."""
    n_vert = data.draw(st.integers(min_value=3, max_value=8))
    # build a simple polygon from angular sort of random points
    pts = data.draw(
        st.lists(
            st.tuples(
                st.floats(min_value=-5, max_value=5, allow_nan=False),
                st.floats(min_value=-5, max_value=5, allow_nan=False),
            ),
            min_size=n_vert,
            max_size=n_vert,
            unique=True,
        )
    )
    arr = np.array(pts)
    c = arr.mean(axis=0)
    order = np.argsort(np.arctan2(arr[:, 1] - c[1], arr[:, 0] - c[0]))
    ring = arr[order]
    if len(np.unique(ring, axis=0)) < 3:
        return
    try:
        poly = Polygon([ring])
    except ValueError:
        return
    qx = np.linspace(-6, 6, 25)
    qy = np.linspace(-6, 6, 25)
    gx, gy = np.meshgrid(qx, qy)
    got = points_in_rings(gx.ravel(), gy.ravel(), poly.rings)

    # naive scalar oracle
    def naive(px, py):
        cnt = 0
        r = poly.rings[0]
        m = len(r)
        for i in range(m):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % m]
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                cnt += 1
        return cnt % 2 == 1

    want = np.array([naive(x, y) for x, y in zip(gx.ravel(), gy.ravel())])
    assert np.array_equal(got, want)


@given(data=st.data())
@settings(max_examples=40, deadline=None)
def test_vectorize_roundtrip_random(data):
    """boundary_rings: even-odd PIP of pixel centers == the mask, and
    label_components partitions the mask, for arbitrary masks."""
    h = data.draw(st.integers(min_value=1, max_value=10))
    w = data.draw(st.integers(min_value=1, max_value=10))
    bits = data.draw(st.lists(st.booleans(), min_size=h * w, max_size=h * w))
    mask = np.array(bits, dtype=bool).reshape(h, w)

    labels = label_components(mask)
    assert ((labels > 0) == mask).all()

    rings = boundary_rings(mask)
    yy, xx = np.mgrid[0:h, 0:w]
    got = points_in_rings(xx.ravel() + 0.5, yy.ravel() + 0.5, rings).reshape(h, w)
    assert np.array_equal(got, mask)
