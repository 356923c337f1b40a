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
    if key.startswith("+proj=aea"):
        return crs.strip()  # aea proj4 strings are their own canonical form
    for alias, canon in _ALIASES.items():
        if key.startswith(alias):
            return canon
    raise ValueError(
        f"Unsupported CRS: {crs!r} (supported: EPSG:4326, EPSG:3857, +proj=aea)"
    )


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
    if s == "EPSG:4326" and d.startswith("+proj=aea"):
        return aea_forward(d, x, y)
    if s.startswith("+proj=aea") and d == "EPSG:4326":
        return aea_inverse(s, x, y)
    if s.startswith("+proj=aea") or d.startswith("+proj=aea"):
        # via geographic
        lon, lat = transform(s, "EPSG:4326", x, y)
        return transform("EPSG:4326", d, lon, lat)
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
    if s == "EPSG:4326" and d.startswith("+proj=aea"):
        return aea_forward_cols(d, x, y)
    if s.startswith("+proj=aea") and d == "EPSG:4326":
        return aea_inverse_cols(s, x, y)
    raise ValueError(f"Unsupported transform {src_crs} -> {dst_crs}")


# ---------------------------------------------------------------------------
# Albers Equal-Area Conic, ellipsoidal (WGS84) — Snyder, USGS PP 1395,
# eqs. 14-1..14-21 (public formulas). Completes the reference's
# "project-to-local-Albers for area-true stats" workflow
# (reference zones.py --albers path; our pick rule: grid/bbox.py:85).
# ---------------------------------------------------------------------------

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
_WGS84_E = np.sqrt(WGS84_E2)


def parse_proj4_aea(proj4: str) -> dict:
    """+proj=aea parameter dict (lat_1, lat_2, lat_0, lon_0, x_0, y_0)."""
    toks = dict(
        t.split("=", 1) for t in proj4.split() if t.startswith("+") and "=" in t
    )
    if toks.get("+proj") != "aea":
        raise ValueError(f"not an aea proj4 string: {proj4!r}")
    return {
        k: float(toks.get(f"+{k}", 0.0))
        for k in ("lat_1", "lat_2", "lat_0", "lon_0", "x_0", "y_0")
    }


def _aea_q(sin_phi):
    """Snyder eq. 3-12: the equal-area auxiliary q."""
    e = _WGS84_E
    es = e * sin_phi
    return (1.0 - WGS84_E2) * (
        sin_phi / (1.0 - es * es)
        - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
    )


def _aea_m(sin_phi, cos_phi):
    """Snyder eq. 14-15."""
    return cos_phi / np.sqrt(1.0 - WGS84_E2 * sin_phi * sin_phi)


def _aea_constants(p: dict):
    phi1, phi2 = np.radians(p["lat_1"]), np.radians(p["lat_2"])
    phi0 = np.radians(p["lat_0"])
    m1 = _aea_m(np.sin(phi1), np.cos(phi1))
    m2 = _aea_m(np.sin(phi2), np.cos(phi2))
    q1, q2, q0 = _aea_q(np.sin(phi1)), _aea_q(np.sin(phi2)), _aea_q(np.sin(phi0))
    if abs(phi1 - phi2) < 1e-12:
        n = np.sin(phi1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = WGS84_A * np.sqrt(C - n * q0) / n
    return n, C, rho0


def aea_forward(proj4: str, lon, lat):
    """lon/lat degrees → aea x/y metres (vectorized)."""
    p = parse_proj4_aea(proj4)
    n, C, rho0 = _aea_constants(p)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(p["lon_0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    q = _aea_q(np.sin(phi))
    rho = WGS84_A * np.sqrt(C - n * q) / n
    theta = n * lam
    x = rho * np.sin(theta) + p["x_0"]
    y = rho0 - rho * np.cos(theta) + p["y_0"]
    return x, y


def aea_inverse(proj4: str, x, y, iters: int = 6):
    """aea x/y metres → lon/lat degrees (Snyder iteration 3-16)."""
    p = parse_proj4_aea(proj4)
    n, C, rho0 = _aea_constants(p)
    x = np.asarray(x, dtype=np.float64) - p["x_0"]
    y = rho0 - (np.asarray(y, dtype=np.float64) - p["y_0"])
    rho = np.hypot(x, y)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * y)
    q = (C - (rho * n / WGS84_A) ** 2) / n
    lam = theta / n + np.radians(p["lon_0"])
    # iterate phi from q
    e = _WGS84_E
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(iters):
        s = np.sin(phi)
        es = e * s
        phi = phi + ((1.0 - es * es) ** 2 / (2.0 * np.cos(phi))) * (
            q / (1.0 - WGS84_E2)
            - s / (1.0 - es * es)
            + (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
        )
    return np.degrees(lam), np.degrees(phi)


def _aea_q_col(s, F):
    """Catalyst twin of _aea_q (s = sin(phi) Column)."""
    e = float(_WGS84_E)
    e2 = float(WGS84_E2)
    es = s * F.lit(e)
    return F.lit(1.0 - e2) * (
        s / (F.lit(1.0) - es * es)
        - F.lit(1.0 / (2.0 * e)) * F.log((F.lit(1.0) - es) / (F.lit(1.0) + es))
    )


def aea_forward_cols(proj4: str, lon, lat):
    """Catalyst twin of aea_forward (same closed-form math, JVM-side)."""
    from pyspark.sql import functions as F

    p = parse_proj4_aea(proj4)
    n, C, rho0 = (float(v) for v in _aea_constants(p))
    lam = F.radians(lon) - F.lit(float(np.radians(p["lon_0"])))
    s = F.sin(F.radians(lat))
    q = _aea_q_col(s, F)
    rho = F.lit(WGS84_A) * F.sqrt(F.lit(C) - F.lit(n) * q) / F.lit(n)
    theta = F.lit(n) * lam
    x = rho * F.sin(theta) + F.lit(p["x_0"])
    y = F.lit(rho0) - rho * F.cos(theta) + F.lit(p["y_0"])
    return x, y


def aea_inverse_cols(proj4: str, x, y, iters: int = 6):
    """Catalyst twin of aea_inverse. The Snyder phi fixed-point runs as
    ONE ``aggregate(sequence(...))`` higher-order lambda — written once,
    evaluated iteratively — because naive unrolling multiplies the
    expression tree ~10x per iteration and OOMs the analyzer."""
    from pyspark.sql import functions as F

    p = parse_proj4_aea(proj4)
    n, C, rho0 = (float(v) for v in _aea_constants(p))
    e = float(_WGS84_E)
    e2 = float(WGS84_E2)
    xs = x - F.lit(p["x_0"])
    ys = F.lit(rho0) - (y - F.lit(p["y_0"]))
    rho = F.sqrt(xs * xs + ys * ys)
    sgn = F.lit(float(np.sign(n) or 1.0))
    theta = F.atan2(sgn * xs, sgn * ys)
    q = (F.lit(C) - (rho * F.lit(n) / F.lit(WGS84_A)) ** F.lit(2.0)) / F.lit(n)
    lam = theta / F.lit(n) + F.lit(float(np.radians(p["lon_0"])))
    phi0 = F.asin(F.least(F.greatest(q / F.lit(2.0), F.lit(-1.0)), F.lit(1.0)))

    def step(acc, _i):
        s = F.sin(acc)
        es = s * F.lit(e)
        one_m = F.lit(1.0) - es * es
        return acc + (one_m * one_m / (F.lit(2.0) * F.cos(acc))) * (
            q / F.lit(1.0 - e2)
            - s / one_m
            + F.lit(1.0 / (2.0 * e)) * F.log((F.lit(1.0) - es) / (F.lit(1.0) + es))
        )

    phi = F.aggregate(
        F.sequence(F.lit(1), F.lit(iters)), phi0.cast("double"), step
    )
    return F.degrees(lam), F.degrees(phi)
