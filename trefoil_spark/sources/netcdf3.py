"""Pure-python NetCDF classic (CDF-1 / CDF-2) reader + writer — the
reference's native format, implemented from the public file-format spec
(NetCDF Classic Format Specification, Unidata / ESDS-RFC-011) the same
way .shp and GeoTIFF were closed in round 2 (netCDF4/HDF5 absent here;
the netCDF-4/HDF5 container remains out of scope).

Reference parity surface: trefoil reads variables/dims/attrs via
netCDF4.Dataset (trefoil/netcdf/utilities.py, conversion.py:17-69,
cli/convert.py:42-195); this module supplies the same primitives:
dimensions, global/variable attributes, variable arrays (fixed and
record variables), fill-value masking and scale/offset unpacking
(CF packed-data convention, matching functions/packing.py semantics).

Scale shape of :func:`ingest_netcdf3`: ONLY the header (KBs) is parsed
on the driver; pixel data never touches it. Each tile task seeks
directly to its row segments (begin + row*width*itemsize arithmetic from
the header), so a 10^5-tile grid ingests embarrassingly parallel — the
classic format's flat layout is exactly a byte-range-addressable tile
store.

Format notes implemented (all from the public spec):
- magic 'CDF\\x01' (32-bit offsets) / 'CDF\\x02' (64-bit offsets);
- big-endian throughout; names and attr values padded to 4 bytes;
- tag constants NC_DIMENSION=0x0A, NC_VARIABLE=0x0B, NC_ATTRIBUTE=0x0C;
  absent lists are encoded as (0, 0);
- vsize = product(non-record dims) * itemsize rounded UP to 4;
- record variables interleave per record (recsize = Σ vsize), EXCEPT
  when there is exactly one record variable, whose slab is unpadded.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6

_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_NC_OF_KIND = {"i1": NC_BYTE, "i2": NC_SHORT, "i4": NC_INT,
               "f4": NC_FLOAT, "f8": NC_DOUBLE, "S1": NC_CHAR}

_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C


def _pad4(n: int) -> int:
    return (n + 3) & ~3


@dataclass
class NCVariable:
    name: str
    dims: tuple[str, ...]
    nc_type: int
    attrs: dict
    shape: tuple[int, ...]          # record dim reported at its current count
    begin: int
    vsize: int
    is_record: bool

    @property
    def dtype(self) -> np.dtype:
        return _DTYPES[self.nc_type]


@dataclass
class NCFile:
    path: str
    version: int
    numrecs: int
    dimensions: dict               # name -> size (record dim: current count)
    record_dim: str | None
    attrs: dict
    variables: dict = field(default_factory=dict)
    recsize: int = 0

    # ------------------------------------------------------------------
    def read(self, name: str, mask_and_scale: bool = True) -> np.ndarray:
        """Full variable array (record vars assembled across records)."""
        v = self.variables[name]
        with open(self.path, "rb") as f:
            if not v.is_record:
                f.seek(v.begin)
                raw = f.read(int(np.prod(v.shape, dtype=np.int64)) * v.dtype.itemsize)
                arr = np.frombuffer(raw, dtype=v.dtype).reshape(v.shape)
            else:
                per_rec = v.shape[1:] if len(v.shape) > 1 else ()
                n_el = int(np.prod(per_rec, dtype=np.int64)) if per_rec else 1
                nbytes = n_el * v.dtype.itemsize
                out = np.empty((self.numrecs,) + per_rec, dtype=v.dtype)
                for r in range(self.numrecs):
                    f.seek(v.begin + r * self.recsize)
                    out[r] = np.frombuffer(f.read(nbytes), dtype=v.dtype).reshape(per_rec)
                arr = out
        # file storage is big-endian; hand callers native-endian arrays
        # (downstream .tobytes()/Arrow paths assume native byte order)
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("="))
        return _unpack(arr, v.attrs) if mask_and_scale else arr


def _unpack(arr: np.ndarray, attrs: dict) -> np.ndarray:
    """CF packed-data + fill masking (reference set_auto_maskandscale
    semantics; same rules as functions/packing.py): fill → NaN, then
    v*scale_factor + add_offset."""
    if arr.dtype.kind == "S":
        return arr
    fill = attrs.get("_FillValue", attrs.get("missing_value"))
    scale = attrs.get("scale_factor")
    offset = attrs.get("add_offset")
    if fill is None and scale is None and offset is None:
        return arr
    out = arr.astype(np.float64)
    if fill is not None:
        out[arr == np.asarray(fill, dtype=arr.dtype)] = np.nan
    if scale is not None:
        out = out * float(scale)
    if offset is not None:
        out = out + float(offset)
    return out


# ---------------------------------------------------------------------------
# header parsing
# ---------------------------------------------------------------------------


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += _pad4(n)
        return s

    def values(self, nc_type: int, n: int):
        dt = _DTYPES[nc_type]
        nbytes = n * dt.itemsize
        arr = np.frombuffer(self.buf[self.pos : self.pos + nbytes], dtype=dt)
        self.pos += _pad4(nbytes)
        if nc_type == NC_CHAR:
            return arr.tobytes().decode("utf-8", errors="replace")
        vals = arr.tolist()
        return vals[0] if n == 1 else vals


def _read_attrs(c: _Cursor) -> dict:
    tag, n = c.i4(), c.i4()
    if tag == 0 and n == 0:
        return {}
    if tag != _TAG_ATT:
        raise ValueError(f"bad attribute-list tag 0x{tag:X}")
    out = {}
    for _ in range(n):
        name = c.name()
        nc_type = c.i4()
        nelems = c.i4()
        out[name] = c.values(nc_type, nelems)
    return out


def read_header(path: str) -> NCFile:
    """Parse the classic header (driver-side; a few KB)."""
    with open(path, "rb") as f:
        head = f.read(65536)
        if head[:8] == b"\x89HDF\r\n\x1a\n":
            # NetCDF-4/HDF5 container → the own HDF5 subset reader,
            # exposed through the NCFile-shaped adapter
            from .hdf5 import NC4File

            return NC4File(path)
        if head[:3] != b"CDF" or (len(head) > 3 and head[3] not in (1, 2)):
            # fail fast on wrong magic — no point growing the buffer
            raise ValueError(f"{path}: not a classic NetCDF (CDF-1/CDF-2) file")
        while True:  # headers are usually tiny; grow if unusually large
            try:
                return _parse_header(path, head)
            # a truncated header can surface as struct.error/IndexError
            # (cursor math), ValueError (np.frombuffer on a short slice),
            # or UnicodeDecodeError (a UTF-8 name split at the boundary)
            except (struct.error, IndexError, ValueError, UnicodeDecodeError):
                more = f.read(1 << 20)
                if not more:
                    raise
                head += more


def _parse_header(path: str, buf: bytes) -> NCFile:
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic NetCDF (CDF-1/CDF-2) file")
    version = buf[3]
    c = _Cursor(buf)
    c.pos = 4
    numrecs = c.i4()
    if numrecs == -1:
        raise ValueError(f"{path}: STREAMING numrecs not supported")
    # dim list
    tag, n = c.i4(), c.i4()
    dims: list[tuple[str, int]] = []
    record_dim = None
    if not (tag == 0 and n == 0):
        if tag != _TAG_DIM:
            raise ValueError(f"bad dimension-list tag 0x{tag:X}")
        for _ in range(n):
            dname = c.name()
            dlen = c.i4()
            if dlen == 0:
                record_dim = dname
            dims.append((dname, dlen))
    gattrs = _read_attrs(c)
    nc = NCFile(
        path=path, version=version, numrecs=numrecs,
        dimensions={d: (numrecs if s == 0 else s) for d, s in dims},
        record_dim=record_dim, attrs=gattrs,
    )
    # var list
    tag, n = c.i4(), c.i4()
    rec_vars = []
    if not (tag == 0 and n == 0):
        if tag != _TAG_VAR:
            raise ValueError(f"bad variable-list tag 0x{tag:X}")
        for _ in range(n):
            vname = c.name()
            ndims = c.i4()
            dimids = [c.i4() for _ in range(ndims)]
            vattrs = _read_attrs(c)
            nc_type = c.i4()
            vsize = c.i4()
            begin = c.i8() if version == 2 else c.i4()
            dnames = tuple(dims[i][0] for i in dimids)
            is_rec = bool(dnames) and dnames[0] == record_dim
            shape = tuple(
                numrecs if (is_rec and k == 0) else dims[dimids[k]][1]
                for k in range(ndims)
            )
            v = NCVariable(vname, dnames, nc_type, vattrs, shape, begin, vsize, is_rec)
            nc.variables[vname] = v
            if is_rec:
                rec_vars.append(v)
    if len(rec_vars) == 1:
        v = rec_vars[0]
        per = int(np.prod(v.shape[1:], dtype=np.int64)) if len(v.shape) > 1 else 1
        nc.recsize = per * v.dtype.itemsize  # spec: single record var unpadded
    else:
        nc.recsize = sum(v.vsize for v in rec_vars)
    return nc


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _attr_bytes(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = [struct.pack(">ii", _TAG_ATT, len(attrs))]
    for name, val in attrs.items():
        nb = name.encode("utf-8")
        out.append(struct.pack(">i", len(nb)) + nb.ljust(_pad4(len(nb)), b"\x00"))
        if isinstance(val, str):
            vb = val.encode("utf-8")
            out.append(struct.pack(">ii", NC_CHAR, len(vb)))
            out.append(vb.ljust(_pad4(len(vb)), b"\x00"))
        else:
            arr = np.atleast_1d(np.asarray(val))
            if arr.dtype.kind == "f":
                arr = arr.astype(">f8") if arr.dtype.itemsize == 8 else arr.astype(">f4")
            elif arr.dtype.kind in "iu":
                arr = arr.astype(">i2") if arr.dtype.itemsize <= 2 else arr.astype(">i4")
            nct = _NC_OF_KIND[f"{arr.dtype.kind}{arr.dtype.itemsize}"]
            raw = arr.tobytes()
            out.append(struct.pack(">ii", nct, arr.size))
            out.append(raw.ljust(_pad4(len(raw)), b"\x00"))
    return b"".join(out)


def write_netcdf3(
    path: str,
    dims: dict,
    variables: dict,
    global_attrs: dict | None = None,
    version: int = 1,
) -> None:
    """Write a classic NetCDF file.

    ``dims``: {name: size} — exactly one size may be None (the record
    dimension). ``variables``: {name: (dim_names, attrs, ndarray)} with
    array dtypes in {int8,int16,int32,float32,float64,S1}; arrays over
    the record dim carry the record count as their first axis.
    """
    dims = dict(dims)
    record_dim = next((d for d, s in dims.items() if s is None), None)
    dim_ids = {d: i for i, d in enumerate(dims)}
    numrecs = 0
    for _, (vdims, _a, arr) in variables.items():
        if vdims and vdims[0] == record_dim:
            numrecs = max(numrecs, arr.shape[0])

    # canonical order: fixed vars first (spec requires record vars last
    # in the DATA section; keeping the header in the same order is tidy)
    names = sorted(
        variables, key=lambda nm: (variables[nm][0][:1] == (record_dim,), nm)
        if record_dim else (False, nm)
    )

    metas = []
    for nm in names:
        vdims, vattrs, arr = variables[nm]
        arr = np.asarray(arr)
        be = arr.dtype.newbyteorder(">") if arr.dtype.byteorder != ">" else arr.dtype
        nd = arr.ndim
        arr = np.ascontiguousarray(arr, dtype=be)
        if nd == 0:
            # ascontiguousarray promotes 0-d to 1-d; classic scalars
            # (zero dims) are legal — restore the shape
            arr = arr.reshape(())
        nct = _NC_OF_KIND[f"{arr.dtype.kind}{arr.dtype.itemsize}"]
        is_rec = bool(vdims) and vdims[0] == record_dim
        per_shape = arr.shape[1:] if is_rec else arr.shape
        want = tuple(dims[d] for d in (vdims[1:] if is_rec else vdims))
        if tuple(want) != tuple(per_shape):
            raise ValueError(f"{nm}: array shape {arr.shape} != dims {vdims}")
        slab = int(np.prod(per_shape, dtype=np.int64)) * arr.dtype.itemsize
        vsize = _pad4(slab)
        metas.append([nm, vdims, vattrs, arr, nct, is_rec, slab, vsize])

    rec_metas = [m for m in metas if m[5]]
    one_rec = len(rec_metas) == 1

    # header size prepass (begin offsets depend on it)
    def header_bytes(begins: dict) -> bytes:
        out = [b"CDF", bytes([version]), struct.pack(">i", numrecs)]
        if dims:
            out.append(struct.pack(">ii", _TAG_DIM, len(dims)))
            for d, s in dims.items():
                nb = d.encode("utf-8")
                out.append(struct.pack(">i", len(nb)) + nb.ljust(_pad4(len(nb)), b"\x00"))
                out.append(struct.pack(">i", 0 if s is None else int(s)))
        else:
            out.append(struct.pack(">ii", 0, 0))
        out.append(_attr_bytes(global_attrs or {}))
        if metas:
            out.append(struct.pack(">ii", _TAG_VAR, len(metas)))
            for nm, vdims, vattrs, _arr, nct, _ir, _slab, vsize in metas:
                nb = nm.encode("utf-8")
                out.append(struct.pack(">i", len(nb)) + nb.ljust(_pad4(len(nb)), b"\x00"))
                out.append(struct.pack(">i", len(vdims)))
                out.extend(struct.pack(">i", dim_ids[d]) for d in vdims)
                out.append(_attr_bytes(vattrs))
                out.append(struct.pack(">ii", nct, vsize))
                out.append(
                    struct.pack(">q" if version == 2 else ">i", begins.get(nm, 0))
                )
        else:
            out.append(struct.pack(">ii", 0, 0))
        return b"".join(out)

    hlen = len(header_bytes({}))
    begins: dict[str, int] = {}
    off = hlen
    for m in metas:  # fixed vars first (names ordering above)
        if not m[5]:
            begins[m[0]] = off
            off += m[7]
    recsize = (rec_metas[0][6] if one_rec else sum(m[7] for m in rec_metas))
    for m in rec_metas:
        begins[m[0]] = off
        off += m[6] if one_rec else m[7]

    with open(path, "wb") as f:
        f.write(header_bytes(begins))
        for m in metas:
            if not m[5]:
                raw = m[3].tobytes()
                f.seek(begins[m[0]])
                f.write(raw.ljust(m[7], b"\x00"))
        for r in range(numrecs):
            for m in rec_metas:
                # slice (not index): indexing a 1-D array to a numpy
                # SCALAR loses the big-endian dtype in tobytes()
                raw = m[3][r : r + 1].tobytes()
                f.seek(begins[m[0]] + r * recsize)
                f.write(raw if one_rec else raw.ljust(m[7], b"\x00"))


# ---------------------------------------------------------------------------
# distributed ingest: header on the driver, byte-range reads per tile task
# ---------------------------------------------------------------------------


def ingest_netcdf3(spark, path: str, variable: str, var_label: str | None = None):
    """NetCDF (y, x) or (t, y, x) variable → tile DataFrame.

    The driver parses ONLY the header; each tile task opens the file and
    seeks to its own row segments (flat classic layout → exact byte
    arithmetic), so no pixel byte ever routes through the driver and the
    ingest parallelism equals the tile count. Geographic dims are
    classified with the S1 heuristic (standard_name first), the grid
    from the coordinate variables' uniform spacing.
    """
    import pandas as pd

    from ..grid import cells
    from ..raster.gridspec import GridSpec
    from ..raster.synth import CELL_RES, TILE_SCHEMA
    from .ingest import detect_geo_dims

    with open(path, "rb") as _f:
        if _f.read(8) == b"\x89HDF\r\n\x1a\n":
            # NetCDF-4/HDF5 container → chunk-grain distributed ingest
            from .hdf5 import ingest_netcdf4

            return ingest_netcdf4(spark, path, variable, var_label)

    nc = read_header(path)
    v = nc.variables[variable]
    if len(v.dims) == 2:
        ydim, xdim = v.dims
        nt = 1
    elif len(v.dims) == 3:
        _t, ydim, xdim = v.dims
        nt = v.shape[0]
    else:
        raise ValueError(f"{variable}: expected 2-D or 3-D, got dims {v.dims}")
    # geo-dim heuristic parity check (F21) when coord vars exist
    std_names = {
        d: nc.variables[d].attrs.get("standard_name")
        for d in v.dims
        if d in nc.variables and nc.variables[d].attrs.get("standard_name")
    }
    roles = detect_geo_dims(list(v.dims), std_names, dict(nc.dimensions))
    if roles["y"] and roles["x"]:
        ydim, xdim = roles["y"], roles["x"]

    ys = nc.read(ydim).astype(np.float64) if ydim in nc.variables else None
    xs = nc.read(xdim).astype(np.float64) if xdim in nc.variables else None
    h, w = nc.dimensions[ydim], nc.dimensions[xdim]
    if ys is None or xs is None:
        spec = GridSpec(x0=0.0, y0=float(h), dx=1.0, dy=1.0, width=w, height=h)
        y_flip = False
        x_flip = False
    else:
        # length-1 axes carry no spacing information — fall back to unit
        # spacing instead of indexing past the end
        dy = float(abs(ys[1] - ys[0])) if len(ys) > 1 else 1.0
        dx = float(abs(xs[1] - xs[0])) if len(xs) > 1 else 1.0
        y_desc = bool(ys[0] > ys[-1])
        y_flip = not y_desc  # tile row 0 is the NORTH edge
        x_flip = bool(xs[0] > xs[-1])  # tile col 0 is the WEST edge
        y_top = float(ys[0] if y_desc else ys[-1])
        x_left = float(xs[-1] if x_flip else xs[0])
        spec = GridSpec(
            x0=x_left - dx / 2.0, y0=y_top + dy / 2.0,
            dx=dx, dy=dy, width=w, height=h,
        )

    tile = spec.tile
    nty, ntx = spec.ntiles_y, spec.ntiles_x
    itemsize = v.dtype.itemsize
    dt = v.dtype
    begin, is_rec, recsize = v.begin, v.is_record, nc.recsize
    attrs = dict(v.attrs)
    label = var_label or variable
    n = nt * nty * ntx
    idx = spark.range(0, n, numPartitions=min(n, spark.sparkContext.defaultParallelism * 2))

    def cut(batches):
        f = open(path, "rb")
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                t = int(i) // (nty * ntx)
                rem = int(i) % (nty * ntx)
                ty, tx = rem // ntx, rem % ntx
                th = min(tile, h - ty * tile)
                tw = min(tile, w - tx * tile)
                # record vars stride by the file recsize; FIXED 3-D vars
                # store time-major contiguous slabs of h*w*itemsize each
                base = begin + t * (recsize if is_rec else h * w * itemsize)
                blk = np.empty((th, tw), dtype=dt)
                for r in range(th):
                    row_src = ty * tile + r
                    src_r = (h - 1 - row_src) if y_flip else row_src
                    src_c = (w - (tx * tile + tw)) if x_flip else tx * tile
                    f.seek(base + (src_r * w + src_c) * itemsize)
                    seg = np.frombuffer(f.read(tw * itemsize), dtype=dt)
                    blk[r] = seg[::-1] if x_flip else seg
                vals = _unpack(blk, attrs).astype(np.float32)
                lat_c = spec.y0 - (ty * tile + th / 2.0) * spec.dy
                lon_c = spec.x0 + (tx * tile + tw / 2.0) * spec.dx
                cell = int(cells.latlon_to_cell(lat_c, lon_c, CELL_RES))
                rows.append((label, t, ty, tx, cell, vals.tobytes(), th, tw))
            yield pd.DataFrame(
                rows, columns=["var", "t", "ty", "tx", "cell", "block", "h", "w"]
            )

    return idx.mapInPandas(cut, schema=TILE_SCHEMA), spec


def export_netcdf3(
    tiles,
    spec,
    bbox,
    path: str,
    variable: str = "synth",
    t: int = 0,
    global_attrs: dict | None = None,
    max_pixels: int = 64_000_000,
):
    """Tiles → window stitch → classic NetCDF with CF coordinate
    variables (S5/S10 in the reference's NATIVE format — the inverse of
    :func:`ingest_netcdf3`; reference netcdf_to_raster surface,
    conversion.py:72-136, with .nc instead of GTiff).

    Driver-side by design like ``stitch_window`` (a raster *file* is a
    single-machine artifact; ``max_pixels`` guards the export window).
    Returns the written (height, width).
    """
    from ..raster.window_ops import stitch_window

    arr = stitch_window(tiles, spec, bbox, t=t, max_pixels=max_pixels)
    win = spec.window_for_bbox(bbox)
    ys = (
        spec.y0
        - (np.arange(win.y_slice.start, win.y_slice.stop, dtype=np.float64) + 0.5)
        * spec.dy
    )
    xs = (
        spec.x0
        + (np.arange(win.x_slice.start, win.x_slice.stop, dtype=np.float64) + 0.5)
        * spec.dx
    )
    geographic = spec.crs in ("EPSG:4326", "epsg:4326")
    y_attrs = (
        {"standard_name": "latitude", "units": "degrees_north"}
        if geographic
        else {"standard_name": "projection_y_coordinate", "units": "m"}
    )
    x_attrs = (
        {"standard_name": "longitude", "units": "degrees_east"}
        if geographic
        else {"standard_name": "projection_x_coordinate", "units": "m"}
    )
    write_netcdf3(
        path,
        {"y": len(ys), "x": len(xs)},
        {
            "y": (("y",), y_attrs, ys),
            "x": (("x",), x_attrs, xs),
            variable: (("y", "x"), {}, arr.astype(np.float32)),
        },
        global_attrs={"Conventions": "CF-1.6", "crs": spec.crs,
                      **(global_attrs or {})},
    )
    return arr.shape
