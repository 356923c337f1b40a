"""Pure-numpy GeoTIFF writer/reader (SURVEY.md S6 raster sink + S2 scan).

The reference shells out to GDAL for this
(/root/reference/trefoil/utilities/conversion.py:5-27 ``array_to_raster``
→ GTiff; read path rasterio). GDAL is absent here, and the formats are
public (TIFF 6.0 spec, 1992; OGC GeoTIFF 1.1), so a minimal-but-real
implementation replaces the previous "declared out of scope":

- single-band float32/uint8, little-endian, uncompressed, strip layout
  (one strip per row block) — the exact shape GDAL's
  ``CreateCopy(..., COMPRESS=NONE)`` produces;
- georeferencing via ModelPixelScaleTag + ModelTiepointTag +
  GeoKeyDirectoryTag (EPSG:4326 geographic / EPSG:3857 projected);
- nodata via the GDAL_NODATA ASCII tag (tag 42113), matching GDAL's
  convention so GDAL itself can read these files back.

Scale note: a GeoTIFF is a single-machine artifact; the distributed part
is the window stitch (window_ops.stitch_window, bounded by max_pixels).
This module is the file-format tail of that export, plus the inverse
(file → tile table) for ingest.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids
T_WIDTH, T_HEIGHT, T_BPS, T_COMPRESSION, T_PHOTOMETRIC = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_SAMPLE_FORMAT = 339
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT = 33550, 33922
T_GEO_KEYS, T_GEO_ASCII = 34735, 34737
T_GDAL_NODATA = 42113

# TIFF field types
TY_SHORT, TY_LONG, TY_RATIONAL, TY_ASCII, TY_DOUBLE = 3, 4, 5, 2, 12
_TYPE_SIZE = {TY_SHORT: 2, TY_LONG: 4, TY_ASCII: 1, TY_DOUBLE: 8}

_EPSG_GEOKEYS = {
    "EPSG:4326": [
        (1024, 0, 1, 2),   # GTModelType = geographic
        (1025, 0, 1, 1),   # GTRasterType = PixelIsArea
        (2048, 0, 1, 4326),  # GeographicType
    ],
    "EPSG:3857": [
        (1024, 0, 1, 1),   # GTModelType = projected
        (1025, 0, 1, 1),
        (3072, 0, 1, 3857),  # ProjectedCSType
    ],
}


def write_geotiff(
    path: str,
    data: np.ndarray,
    x0: float,
    y0: float,
    dx: float,
    dy: float,
    crs: str = "EPSG:4326",
    nodata: float | None = None,
) -> None:
    """(H, W) float32|uint8 array → uncompressed striped GeoTIFF.

    (x0, y0) is the OUTER corner of the top-left pixel (GDAL geotransform
    convention); dy positive (north-up, rows go south)."""
    if data.ndim != 2:
        raise ValueError("data must be 2-D (single band)")
    if data.dtype == np.float32:
        bps, fmt = 32, 3  # IEEE float
    elif data.dtype == np.uint8:
        bps, fmt = 8, 1  # unsigned int
    else:
        raise ValueError("supported dtypes: float32, uint8")
    if crs not in _EPSG_GEOKEYS:
        raise ValueError(f"supported CRS: {sorted(_EPSG_GEOKEYS)}")
    h, w = data.shape
    row_bytes = w * (bps // 8)

    geokeys = _EPSG_GEOKEYS[crs]
    key_shorts = [1, 1, 0, len(geokeys)]
    for k in geokeys:
        key_shorts.extend(k)

    entries = []  # (tag, type, count, packed-or-None, payload bytes)

    def entry(tag, ty, values):
        if isinstance(values, (bytes, str)):
            raw = values.encode("ascii") if isinstance(values, str) else values
            if not raw.endswith(b"\x00"):
                raw += b"\x00"
            count = len(raw)
        else:
            values = list(values)
            count = len(values)
            pack = {TY_SHORT: "<H", TY_LONG: "<I", TY_DOUBLE: "<d"}[ty]
            raw = b"".join(struct.pack(pack, v) for v in values)
        entries.append([tag, ty, count, raw])

    entry(T_WIDTH, TY_LONG, [w])
    entry(T_HEIGHT, TY_LONG, [h])
    entry(T_BPS, TY_SHORT, [bps])
    entry(T_COMPRESSION, TY_SHORT, [1])
    entry(T_PHOTOMETRIC, TY_SHORT, [1])
    entry(T_SPP, TY_SHORT, [1])
    entry(T_ROWS_PER_STRIP, TY_LONG, [1])
    entry(T_SAMPLE_FORMAT, TY_SHORT, [fmt])
    entry(T_MODEL_PIXEL_SCALE, TY_DOUBLE, [dx, dy, 0.0])
    # tiepoint: raster (0,0,0) ↔ model (x0, y0, 0)
    entry(T_MODEL_TIEPOINT, TY_DOUBLE, [0.0, 0.0, 0.0, x0, y0, 0.0])
    entry(T_GEO_KEYS, TY_SHORT, key_shorts)
    entry(T_GEO_ASCII, TY_ASCII, crs + "|")
    if nodata is not None:
        entry(T_GDAL_NODATA, TY_ASCII, repr(float(nodata)))
    # strip tables appended after we know the layout
    entry(T_STRIP_OFFSETS, TY_LONG, [0] * h)      # patched below
    entry(T_STRIP_COUNTS, TY_LONG, [row_bytes] * h)
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_offset = 8
    ifd_size = 2 + n * 12 + 4
    ext_offset = ifd_offset + ifd_size  # out-of-line values land here
    ext = bytearray()
    for e in entries:
        tag, ty, count, raw = e
        if len(raw) <= 4:
            e.append(None)
        else:
            e.append(ext_offset + len(ext))
            ext.extend(raw)
            if len(ext) % 2:  # TIFF 6.0: values must begin on a word boundary
                ext.append(0)
    data_offset = ext_offset + len(ext)

    # patch strip offsets now that data_offset is known
    for e in entries:
        if e[0] == T_STRIP_OFFSETS:
            raw = b"".join(
                struct.pack("<I", data_offset + i * row_bytes) for i in range(h)
            )
            if e[4] is None:  # h == 1: inline
                e[3] = raw
            else:
                ext[e[4] - ext_offset : e[4] - ext_offset + len(raw)] = raw

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += struct.pack("<H", n)
    for tag, ty, count, raw, off in entries:
        out += struct.pack("<HHI", tag, ty, count)
        out += struct.pack("<I", off) if off is not None else raw.ljust(4, b"\x00")
    out += struct.pack("<I", 0)  # no next IFD
    out += ext
    arr = np.ascontiguousarray(data)
    if arr.dtype.byteorder == ">":
        arr = arr.astype(arr.dtype.newbyteorder("<"))
    out += arr.tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_geotiff(path: str):
    """Uncompressed single-band GeoTIFF → (array, meta dict).

    meta: {x0, y0, dx, dy, crs, nodata} (GDAL geotransform convention)."""
    with open(path, "rb") as f:
        buf = f.read()
    order, magic, ifd_off = struct.unpack("<2sHI", buf[:8])
    if order != b"II" or magic != 42:
        raise ValueError("expected little-endian classic TIFF")
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    for i in range(n):
        tag, ty, count, val = struct.unpack_from("<HHII", buf, ifd_off + 2 + i * 12)
        size = _TYPE_SIZE.get(ty, 4) * count
        off = val if size > 4 else ifd_off + 2 + i * 12 + 8
        raw = buf[off : off + size]
        if ty == TY_SHORT:
            vals = list(struct.unpack(f"<{count}H", raw))
        elif ty == TY_LONG:
            vals = list(struct.unpack(f"<{count}I", raw))
        elif ty == TY_DOUBLE:
            vals = list(struct.unpack(f"<{count}d", raw))
        elif ty == TY_ASCII:
            vals = raw.rstrip(b"\x00").decode("ascii", "replace")
        else:
            vals = raw
        tags[tag] = vals

    w, h = tags[T_WIDTH][0], tags[T_HEIGHT][0]
    if tags.get(T_COMPRESSION, [1])[0] != 1:
        raise ValueError("only uncompressed TIFF supported")
    bps = tags[T_BPS][0]
    fmt = tags.get(T_SAMPLE_FORMAT, [1])[0]
    dtype = {(32, 3): np.float32, (8, 1): np.uint8}.get((bps, fmt))
    if dtype is None:
        raise ValueError(f"unsupported sample layout bps={bps} fmt={fmt}")
    offsets = tags[T_STRIP_OFFSETS]
    counts = tags[T_STRIP_COUNTS]
    raw = b"".join(buf[o : o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw, dtype=f"<{np.dtype(dtype).str[1:]}").reshape(h, w)

    scale = tags.get(T_MODEL_PIXEL_SCALE, [1.0, 1.0, 0.0])
    tie = tags.get(T_MODEL_TIEPOINT, [0.0] * 6)
    crs = "EPSG:4326"
    keys = tags.get(T_GEO_KEYS, [])
    for i in range(4, len(keys), 4):
        kid, _loc, _cnt, kval = keys[i : i + 4]
        if kid == 2048 or kid == 3072:
            crs = f"EPSG:{kval}"
    nodata = None
    if T_GDAL_NODATA in tags:
        try:
            nodata = float(tags[T_GDAL_NODATA])
        except ValueError:
            pass
    meta = {
        "x0": tie[3], "y0": tie[4], "dx": scale[0], "dy": scale[1],
        "crs": crs, "nodata": nodata, "width": w, "height": h,
    }
    return arr.copy(), meta


def save_window_geotiff(path, tiles, spec, bbox, t: int = 0,
                        nodata: float = -9999.0) -> dict:
    """S6 sink: distributed window stitch → GeoTIFF file (NaN → nodata)."""
    from ..raster.window_ops import stitch_window

    arr = stitch_window(tiles, spec, bbox, t=t)
    out = np.where(np.isnan(arr), np.float32(nodata), arr).astype(np.float32)
    window = spec.window_for_bbox(bbox)
    x0 = spec.x0 + window.x_slice.start * spec.dx
    y0 = spec.y0 - window.y_slice.start * spec.dy
    write_geotiff(path, out, x0, y0, spec.dx, spec.dy, crs=spec.crs, nodata=nodata)
    return {"path": path, "height": out.shape[0], "width": out.shape[1],
            "x0": x0, "y0": y0, "crs": spec.crs, "nodata": nodata}


def geotiff_to_tiles(spark, path: str, var: str = "ingest", t: int = 0,
                     tile: int = 256):
    """S2 scan: GeoTIFF file → (GridSpec, tile DataFrame). The file read
    happens once; the tile cut is distributed over the row blocks
    (parallelize of (ty, tx) indices + broadcast array for small files;
    big rasters would stream strips via binaryFile + mapInPandas)."""
    import pandas as pd

    from ..raster.gridspec import GridSpec

    arr, meta = read_geotiff(path)
    if meta["nodata"] is not None and arr.dtype == np.float32:
        arr = np.where(arr == np.float32(meta["nodata"]), np.nan, arr)
    spec = GridSpec(
        x0=meta["x0"], y0=meta["y0"], dx=meta["dx"], dy=meta["dy"],
        width=meta["width"], height=meta["height"], crs=meta["crs"], tile=tile,
    )
    bc = spark.sparkContext.broadcast(arr)
    nty, ntx = spec.ntiles_y, spec.ntiles_x
    idx = spark.range(nty * ntx)

    def gen(batches):
        full = bc.value
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                ty, tx = int(i) // ntx, int(i) % ntx
                blk = full[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
                h, w = blk.shape
                rows.append((var, t, ty, tx, 0, np.ascontiguousarray(blk).tobytes(), h, w))
            yield pd.DataFrame(
                rows, columns=["var", "t", "ty", "tx", "cell", "block", "h", "w"]
            )

    tiles = idx.mapInPandas(
        gen,
        schema="var string, t int, ty int, tx int, cell bigint, block binary, h int, w int",
    )
    return spec, tiles
