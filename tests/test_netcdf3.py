"""Classic NetCDF (CDF-1/2) reader/writer + distributed ingest (S1/S2
format-gap closure; public format spec). The reference's tests exercise
netCDF4.Dataset round-trips; here: byte-level fixture parse (independent
of our writer), writer↔reader round-trips, record variables, fill/scale
unpacking, and the byte-range tile ingest."""

import struct

import numpy as np
import pytest

from trefoil_spark.sources.netcdf3 import (
    NC_FLOAT,
    NC_INT,
    ingest_netcdf3,
    read_header,
    write_netcdf3,
)


def _pad(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    return struct.pack(">i", len(s)) + _pad(s.encode())


def test_parse_handbuilt_cdf1(tmp_path):
    """Parse a CDF-1 file assembled by hand from the spec — catches any
    symmetric writer/reader misunderstanding."""
    # dims: y=2, x=3; global attr title='t'; var v(y,x) float32,
    # attr _FillValue=-9.0f, begin at header end
    hdr = b"CDF\x01" + struct.pack(">i", 0)  # numrecs=0
    hdr += struct.pack(">ii", 0x0A, 2) + _name("y") + struct.pack(">i", 2)
    hdr += _name("x") + struct.pack(">i", 3)
    hdr += struct.pack(">ii", 0x0C, 1) + _name("title")
    hdr += struct.pack(">ii", 2, 1) + _pad(b"t")  # NC_CHAR, 1 elem
    hdr += struct.pack(">ii", 0x0B, 1) + _name("v") + struct.pack(">i", 2)
    hdr += struct.pack(">ii", 0, 1)  # dimids y, x
    hdr += struct.pack(">ii", 0x0C, 1) + _name("_FillValue")
    hdr += struct.pack(">ii", NC_FLOAT, 1) + struct.pack(">f", -9.0)
    vsize = 2 * 3 * 4
    begin = len(hdr) + 12  # + nc_type + vsize + begin words
    hdr += struct.pack(">iii", NC_FLOAT, vsize, begin)
    data = np.array([[1, 2, -9], [4, 5, 6]], dtype=">f4").tobytes()
    p = tmp_path / "hand.nc"
    p.write_bytes(hdr + data)

    nc = read_header(str(p))
    assert nc.version == 1
    assert nc.dimensions == {"y": 2, "x": 3}
    assert nc.attrs == {"title": "t"}
    v = nc.variables["v"]
    assert v.dims == ("y", "x") and v.shape == (2, 3) and v.begin == begin
    arr = nc.read("v")
    assert np.isnan(arr[0, 2]) and arr[1, 0] == 4.0  # fill masked


@pytest.mark.parametrize("version", [1, 2])
def test_roundtrip_fixed_and_record(tmp_path, version):
    p = str(tmp_path / f"rt{version}.nc")
    y = np.array([38.0, 37.0, 36.0])
    x = np.array([-125.0, -124.0])
    temp = np.arange(4 * 3 * 2, dtype=np.float32).reshape(4, 3, 2)
    elev = (np.arange(6, dtype=np.int32) * 10).reshape(3, 2)
    write_netcdf3(
        p,
        dims={"time": None, "y": 3, "x": 2},
        variables={
            "y": (("y",), {"standard_name": "latitude"}, y),
            "x": (("x",), {"standard_name": "longitude"}, x),
            "elev": (("y", "x"), {"units": "m"}, elev),
            "temp": (("time", "y", "x"), {"units": "K"}, temp),
        },
        global_attrs={"title": "fixture", "version": np.int32(3)},
        version=version,
    )
    nc = read_header(p)
    assert nc.version == version and nc.numrecs == 4
    assert nc.record_dim == "time"
    assert nc.dimensions == {"time": 4, "y": 3, "x": 2}
    assert nc.attrs["title"] == "fixture" and nc.attrs["version"] == 3
    assert nc.variables["temp"].attrs == {"units": "K"}
    assert np.array_equal(nc.read("elev"), elev)
    assert np.array_equal(nc.read("temp"), temp)
    assert np.array_equal(nc.read("y"), y)


def test_two_record_vars_interleave(tmp_path):
    """recsize = Σ padded slabs when >1 record var (spec interleaving)."""
    p = str(tmp_path / "two.nc")
    a = np.arange(3, dtype=np.float64)          # (time,)
    b = np.arange(6, dtype=np.int16).reshape(3, 2)  # (time, x)
    write_netcdf3(
        p, dims={"time": None, "x": 2},
        variables={"a": (("time",), {}, a), "b": (("time", "x"), {}, b)},
    )
    nc = read_header(p)
    assert nc.recsize == 8 + 4  # f8 slab + padded 2*i2 slab
    assert np.array_equal(nc.read("a"), a)
    assert np.array_equal(nc.read("b"), b)


def test_scale_offset_unpack(tmp_path):
    p = str(tmp_path / "packed.nc")
    packed = np.array([[0, 100], [200, -32768]], dtype=np.int16)
    write_netcdf3(
        p, dims={"y": 2, "x": 2},
        variables={
            "v": (("y", "x"),
                  {"scale_factor": 0.1, "add_offset": 5.0,
                   "_FillValue": np.int16(-32768)}, packed),
        },
    )
    arr = read_header(p).read("v")
    assert arr[0, 0] == 5.0 and abs(arr[1, 0] - 25.0) < 1e-12
    assert np.isnan(arr[1, 1])
    raw = read_header(p).read("v", mask_and_scale=False)
    # reader hands back native-endian arrays regardless of file order
    assert raw.dtype == np.dtype("int16") and raw[1, 1] == -32768


def test_ingest_netcdf3_tiles(spark, tmp_path):
    """Distributed ingest: header-only driver parse, per-tile byte-range
    reads, ascending-y flip, grid spec from coordinate vectors."""
    p = str(tmp_path / "grid.nc")
    h, w, nt = 300, 520, 2  # forces partial tiles (tile=256)
    ys = 38.0 - (np.arange(h) + 0.5) * 0.01     # descending (north first)
    xs = -125.0 + (np.arange(w) + 0.5) * 0.01
    data = (np.arange(nt * h * w, dtype=np.float32).reshape(nt, h, w) % 997)
    data[:, 5, 7] = -9999.0
    write_netcdf3(
        p, dims={"time": None, "lat": h, "lon": w},
        variables={
            "lat": (("lat",), {"standard_name": "latitude"}, ys),
            "lon": (("lon",), {"standard_name": "longitude"}, xs),
            "tmin": (("time", "lat", "lon"),
                     {"_FillValue": np.float32(-9999.0)}, data),
        },
    )
    tiles, spec = ingest_netcdf3(spark, p, "tmin")
    assert (spec.width, spec.height) == (w, h)
    assert abs(spec.x0 - -125.0) < 1e-9 and abs(spec.y0 - 38.0) < 1e-9
    rows = {(r["t"], r["ty"], r["tx"]): r for r in tiles.collect()}
    assert len(rows) == nt * 2 * 3
    got = np.full((nt, h, w), np.inf, dtype=np.float32)
    for (t, ty, tx), r in rows.items():
        blk = np.frombuffer(r["block"], dtype=np.float32).reshape(r["h"], r["w"])
        got[t, ty * 256 : ty * 256 + r["h"], tx * 256 : tx * 256 + r["w"]] = blk
    want = data.copy()
    want[:, 5, 7] = np.nan
    assert np.array_equal(got, want, equal_nan=True)


def test_ingest_ascending_y_flips(spark, tmp_path):
    p = str(tmp_path / "asc.nc")
    h, w = 4, 4
    ys = 10.0 + np.arange(h) * 1.0   # ASCENDING latitudes
    xs = np.arange(w) * 1.0
    data = np.arange(h * w, dtype=np.float32).reshape(h, w)
    write_netcdf3(
        p, dims={"lat": h, "lon": w},
        variables={
            "lat": (("lat",), {"standard_name": "latitude"}, ys),
            "lon": (("lon",), {"standard_name": "longitude"}, xs),
            "v": (("lat", "lon"), {}, data),
        },
    )
    tiles, spec = ingest_netcdf3(spark, p, "v")
    blk = np.frombuffer(tiles.collect()[0]["block"], dtype=np.float32).reshape(h, w)
    # tile row 0 = NORTH edge = the LAST source row
    assert np.array_equal(blk, data[::-1])
    assert abs(spec.y0 - 13.5) < 1e-9


def test_export_netcdf3_roundtrip(spark):
    """tiles → export window .nc (CF coords, descending lats) → read back
    equals the stitched array, NaN holes preserved."""
    import os
    import tempfile

    from trefoil_spark.grid.bbox import BBox
    from trefoil_spark.raster.gridspec import GridSpec
    from trefoil_spark.raster.synth import synthetic_tiles
    from trefoil_spark.raster.window_ops import stitch_window
    from trefoil_spark.sources.netcdf3 import export_netcdf3, read_header

    spec = GridSpec.from_bbox(BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326"), 512, 256)
    bbox = BBox((-122.0, 33.0, -116.0, 37.0), "EPSG:4326")
    tiles = synthetic_tiles(spark, spec)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "w.nc")
        h, w = export_netcdf3(tiles, spec, bbox, p, variable="v")
        nc = read_header(p)
        assert nc.attrs["Conventions"] == "CF-1.6" and nc.attrs["crs"] == "EPSG:4326"
        assert nc.variables["y"].attrs["standard_name"] == "latitude"
        got = nc.read("v")
        want = stitch_window(tiles, spec, bbox)
        assert got.shape == (h, w) == want.shape
        assert np.array_equal(got, want.astype(np.float32), equal_nan=True)
        assert np.isnan(want).any()  # the synth holes actually exercised
        ys = nc.read("y")
        assert ys[0] > ys[-1]  # north-first (descending), CF-consistent


def test_ingest_fixed_time_dim(spark, tmp_path):
    """3-D variable over a FIXED (non-record) time dim: each timestep slab
    must seek to begin + t*h*w*itemsize, not replay t=0 (r3 advice, high)."""
    p = str(tmp_path / "fixed_t.nc")
    nt, h, w = 3, 4, 5
    ys = 10.0 - np.arange(h) * 1.0
    xs = np.arange(w) * 1.0
    data = np.arange(nt * h * w, dtype=np.float32).reshape(nt, h, w)
    write_netcdf3(
        p, dims={"time": nt, "lat": h, "lon": w},  # time FIXED, not None
        variables={
            "lat": (("lat",), {"standard_name": "latitude"}, ys),
            "lon": (("lon",), {"standard_name": "longitude"}, xs),
            "v": (("time", "lat", "lon"), {}, data),
        },
    )
    assert read_header(p).record_dim is None  # precondition: truly fixed
    tiles, spec = ingest_netcdf3(spark, p, "v")
    got = {r["t"]: np.frombuffer(r["block"], dtype=np.float32).reshape(h, w)
           for r in tiles.collect()}
    for t in range(nt):
        assert np.array_equal(got[t], data[t]), f"timestep {t} slab wrong"


def test_ingest_descending_x(spark, tmp_path):
    """Descending x coordinates: dx stays positive, tile col 0 = WEST edge
    (the last source column)."""
    p = str(tmp_path / "descx.nc")
    h, w = 3, 4
    ys = 10.0 - np.arange(h) * 1.0
    xs = 3.0 - np.arange(w) * 1.0  # DESCENDING longitudes
    data = np.arange(h * w, dtype=np.float32).reshape(h, w)
    write_netcdf3(
        p, dims={"lat": h, "lon": w},
        variables={
            "lat": (("lat",), {"standard_name": "latitude"}, ys),
            "lon": (("lon",), {"standard_name": "longitude"}, xs),
            "v": (("lat", "lon"), {}, data),
        },
    )
    tiles, spec = ingest_netcdf3(spark, p, "v")
    assert spec.dx > 0 and abs(spec.x0 - -0.5) < 1e-9
    blk = np.frombuffer(tiles.collect()[0]["block"], dtype=np.float32).reshape(h, w)
    assert np.array_equal(blk, data[:, ::-1])


def test_ingest_length1_axis(spark, tmp_path):
    """A 1-pixel-wide grid must not IndexError on spacing inference."""
    p = str(tmp_path / "one.nc")
    ys = np.array([5.0, 4.0])
    xs = np.array([0.0])  # single-element x axis
    data = np.array([[1.0], [2.0]], dtype=np.float32)
    write_netcdf3(
        p, dims={"lat": 2, "lon": 1},
        variables={
            "lat": (("lat",), {"standard_name": "latitude"}, ys),
            "lon": (("lon",), {"standard_name": "longitude"}, xs),
            "v": (("lat", "lon"), {}, data),
        },
    )
    tiles, spec = ingest_netcdf3(spark, p, "v")
    assert spec.dx == 1.0 and spec.width == 1
    blk = np.frombuffer(tiles.collect()[0]["block"], dtype=np.float32).reshape(2, 1)
    assert np.array_equal(blk, data)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    h=st.integers(2, 30),
    w=st.integers(2, 30),
    nt=st.integers(1, 3),
    y_asc=st.booleans(),
    x_desc=st.booleans(),
    record=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_ingest_geometry_property(spark, tmp_path_factory, h, w, nt, y_asc,
                                  x_desc, record, seed):
    """Randomized grid geometry through write→distributed ingest:
    ascending/descending axes, record vs fixed time, odd shapes — the
    reassembled north-first/west-first mosaic equals the source."""
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 997, size=(nt, h, w)).astype(np.float32)
    ys = (np.arange(h) if y_asc else -np.arange(h)).astype(np.float64)
    xs = (-np.arange(w) if x_desc else np.arange(w)).astype(np.float64)
    d = tmp_path_factory.mktemp("ncprop")
    p = str(d / "g.nc")
    write_netcdf3(
        p, dims={"time": (None if record else nt), "lat": h, "lon": w},
        variables={
            "lat": (("lat",), {"standard_name": "latitude"}, ys),
            "lon": (("lon",), {"standard_name": "longitude"}, xs),
            "v": (("time", "lat", "lon"), {}, data),
        },
    )
    tiles, spec = ingest_netcdf3(spark, p, "v")
    got = {r["t"]: np.frombuffer(r["block"], dtype=np.float32).reshape(r["h"], r["w"])
           for r in tiles.collect()}
    want = data
    if y_asc:
        want = want[:, ::-1, :]
    if x_desc:
        want = want[:, :, ::-1]
    for t in range(nt):
        assert np.array_equal(got[t], want[t]), (t, y_asc, x_desc, record)
