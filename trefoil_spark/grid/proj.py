"""Closed-form coordinate transforms (pyproj absent — from scratch).

Supported CRS: EPSG:4326 (lon/lat degrees, WGS84) and EPSG:3857
(spherical Web Mercator), plus a local equirectangular helper. This is the
declared v1 projection surface (SURVEY.md F20); the full proj database is
out of scope.

All functions are numpy-vectorized and are used both driver-side (bbox
math) and inside Arrow-batched pandas UDFs (warp gather), never per-row.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0  # WGS84 semi-major, spherical mercator convention
WEBMERC_MAX = np.pi * EARTH_RADIUS  # ±20037508.342789244
# Web-Mercator latitude clamp (where |y| == WEBMERC_MAX)
MAX_LAT = 85.05112877980659

_ALIASES = {
    "epsg:4326": "EPSG:4326",
    "wgs84": "EPSG:4326",
    "latlong": "EPSG:4326",
    "+proj=longlat": "EPSG:4326",
    "epsg:3857": "EPSG:3857",
    "epsg:900913": "EPSG:3857",
    "web_mercator": "EPSG:3857",
    "+proj=merc": "EPSG:3857",
}


def normalize_crs(crs: str) -> str:
    key = crs.strip().lower()
    for alias, canon in _ALIASES.items():
        if key.startswith(alias):
            return canon
    raise ValueError(f"Unsupported CRS: {crs!r} (v1 supports EPSG:4326, EPSG:3857)")


def same_crs(a: str, b: str) -> bool:
    return normalize_crs(a) == normalize_crs(b)


def is_latlong(crs: str) -> bool:
    """Reference parity: trefoil/utilities/proj.py:1-8 (is_latlong check)."""
    return normalize_crs(crs) == "EPSG:4326"


def lonlat_to_webmercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = np.radians(lon) * EARTH_RADIUS
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * EARTH_RADIUS
    return x, y


def webmercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


def transform(src_crs: str, dst_crs: str, x, y):
    """Vectorized transform between supported CRS."""
    s, d = normalize_crs(src_crs), normalize_crs(dst_crs)
    if s == d:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if s == "EPSG:4326" and d == "EPSG:3857":
        return lonlat_to_webmercator(x, y)
    if s == "EPSG:3857" and d == "EPSG:4326":
        return webmercator_to_lonlat(x, y)
    raise ValueError(f"Unsupported transform {src_crs} -> {dst_crs}")


def transform_cols(src_crs: str, dst_crs: str, x, y):
    """Catalyst-expression twin of :func:`transform` (same closed-form
    math, JVM-side). Returns ``(x_col, y_col)``; used to generate
    distributed grid math (e.g. warp tile-cover enumeration) without any
    driver-side loops."""
    from pyspark.sql import functions as F

    s, d = normalize_crs(src_crs), normalize_crs(dst_crs)
    x, y = F.col(x) if isinstance(x, str) else x, F.col(y) if isinstance(y, str) else y
    if s == d:
        return x.cast("double"), y.cast("double")
    if s == "EPSG:4326" and d == "EPSG:3857":
        lat = F.least(F.greatest(y, F.lit(-MAX_LAT)), F.lit(MAX_LAT))
        return (
            F.radians(x) * F.lit(EARTH_RADIUS),
            F.log(F.tan(F.lit(np.pi / 4.0) + F.radians(lat) / 2)) * F.lit(EARTH_RADIUS),
        )
    if s == "EPSG:3857" and d == "EPSG:4326":
        return (
            F.degrees(x / F.lit(EARTH_RADIUS)),
            F.degrees(F.atan(F.exp(y / F.lit(EARTH_RADIUS))) * 2 - F.lit(np.pi / 2.0)),
        )
    raise ValueError(f"Unsupported transform {src_crs} -> {dst_crs}")
