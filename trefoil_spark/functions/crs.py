"""CF grid_mapping attributes ↔ proj4 string conversion (SURVEY.md F18/F19).

Reference semantics: /root/reference/trefoil/netcdf/crs.py:44-258 — CRS is
METADATA in this engine (stored in table properties); transforms are done
by grid/proj.py. These converters translate between the two public
conventions (CF grid_mapping names and proj4 parameter keys) on plain
dicts — no pyproj (absent), so the ellipsoid table carries the common
entries the reference pulls from pyproj.pj_ellps, and datum→ellipsoid
fixups mirror crs.py:231-243.
"""

from __future__ import annotations

import re

PROJ4_CF_ELLIPSOID_MAP = {
    "a": "semi_major_axis",
    "b": "semi_minor_axis",
    "rf": "inverse_flattening",
}

PROJ4_CF_NAMES = {
    "aea": "albers_conical_equal_area",
    "latlong": "latitude_longitude",
    "laea": "lambert_azimuthal_equal_area",
    "lcc": "lambert_conformal_conic",
    "stere": "polar_stereographic",
    "tmerc": "transverse_mercator",
    "utm": "universal_transverse_mercator",
}

PROJ4_CF_PARAM_MAP = {
    "aea": {
        "lat_0": "latitude_of_projection_origin",
        "lat_{0}": "standard_parallel",
        "lon_0": "longitude_of_central_meridian",
        "x_0": "false_easting",
        "y_0": "false_northing",
    },
    "latlong": {},
    "laea": {
        "lat_0": "latitude_of_projection_origin",
        "lon_0": "longitude_of_projection_origin",
        "x_0": "false_easting",
        "y_0": "false_northing",
    },
    "lcc": {
        "lat_0": "latitude_of_projection_origin",
        "lat_{0}": "standard_parallel",
        "lon_0": "longitude_of_central_meridian",
        "x_0": "false_easting",
        "y_0": "false_northing",
    },
    "stere": {
        "k_0": "scale_factor",
        "lat_0": "latitude_of_projection_origin",
        "lat_ts": "standard_parallel",
        "lon_0": "straight_vertical_longitude_from_pole",
        "x_0": "false_easting",
        "y_0": "false_northing",
    },
    "tmerc": {
        "k_0": "scale_factor",
        "lat_0": "latitude_of_projection_origin",
        "lon_0": "longitude_of_central_meridian",
        "x_0": "false_easting",
        "y_0": "false_northing",
    },
    "utm": {"zone": "utm_zone_number"},
}

CF_PROJ4_NAMES = {v: k for k, v in PROJ4_CF_NAMES.items()}
CF_PROJ4_ELLIPSOID_MAP = {v: k for k, v in PROJ4_CF_ELLIPSOID_MAP.items()}
CF_PROJ4_PARAM_MAP = {
    PROJ4_CF_NAMES[k]: {v2: k2 for k2, v2 in m.items()}
    for k, m in PROJ4_CF_PARAM_MAP.items()
}

# common ellipsoids (values per the public proj ellipsoid table)
ELLIPSOIDS = {
    "WGS84": {"a": 6378137.0, "rf": 298.257223563},
    "GRS80": {"a": 6378137.0, "rf": 298.257222101},
    "clrk66": {"a": 6378206.4, "b": 6356583.8},
    "sphere": {"a": 6370997.0, "b": 6370997.0},
}

_DATUM_ELLPS = {"WGS84": "WGS84", "NAD83": "GRS80", "NAD27": "clrk66"}


def parse_proj4(proj4: str) -> dict:
    out: dict = {}
    for token in proj4.strip().split():
        token = token.lstrip("+")
        if "=" in token:
            k, v = token.split("=", 1)
            try:
                out[k] = int(v) if re.fullmatch(r"-?\d+", v) else float(v)
            except ValueError:
                out[k] = v
        else:
            out[token] = True
    if out.get("proj") == "longlat":
        out["proj"] = "latlong"  # reference normalization (crs.py:40-41)
    return out


def format_proj4(params: dict) -> str:
    parts = []
    for k, v in params.items():
        if v is True:
            parts.append(f"+{k}")
        else:
            parts.append(f"+{k}={v:.17g}" if isinstance(v, float) else f"+{k}={v}")
    return " ".join(parts)


def cf_to_proj4(crs_atts: dict) -> str | None:
    """CF grid_mapping attribute dict → proj4 string (reference get_crs
    semantics, crs.py:111-179; returns None for unsupported mappings)."""
    if "proj4" in crs_atts:
        return crs_atts["proj4"]
    name = crs_atts.get("grid_mapping_name")
    if not name or name not in CF_PROJ4_PARAM_MAP:
        return None
    param_map = CF_PROJ4_PARAM_MAP[name]
    params: dict = {"proj": CF_PROJ4_NAMES[name]}
    for cf_key, value in crs_atts.items():
        if cf_key in param_map:
            p4 = param_map[cf_key]
            if cf_key == "standard_parallel" and "{" in p4:
                values = value if isinstance(value, (list, tuple)) else [value]
                for i, v in enumerate(values, start=1):
                    params[p4.format(i)] = v
            else:
                params[p4] = value
        elif cf_key in CF_PROJ4_ELLIPSOID_MAP:
            params[CF_PROJ4_ELLIPSOID_MAP[cf_key]] = value
    return format_proj4(params)


def proj4_to_cf(proj4: str) -> dict:
    """proj4 string → CF grid_mapping attribute dict (reference set_crs
    semantics, crs.py:182-258, incl. datum→ellipsoid fixups)."""
    data = parse_proj4(proj4)
    proj_key = "latlong" if data.get("proj") in ("latlong", "longlat", None) else data["proj"]
    if proj_key not in PROJ4_CF_PARAM_MAP:
        raise ValueError(
            f"CF Convention mapping is not yet available for projection {proj_key}"
        )
    atts: dict = {"grid_mapping_name": PROJ4_CF_NAMES[proj_key]}
    for p4, cf_key in PROJ4_CF_PARAM_MAP[proj_key].items():
        if "{" in p4:
            values = [data[p4.format(i)] for i in (1, 2) if p4.format(i) in data]
            if values:
                atts[cf_key] = values[0] if len(values) == 1 else values
        elif p4 in data:
            atts[cf_key] = data[p4]
    # datum → ellipsoid fixups (crs.py:231-243)
    if "datum" in data and "ellps" not in data:
        datum = data["datum"]
        if datum in _DATUM_ELLPS:
            data["ellps"] = _DATUM_ELLPS[datum]
        else:
            raise ValueError(
                f"projection ellipsoid must be specified, datum {datum} "
                "does not match a known ellipsoid"
            )
    if "ellps" in data:
        if data["ellps"] not in ELLIPSOIDS:
            raise ValueError("projection ellipsoid does not match a known ellipsoid")
        data.update(ELLIPSOIDS[data["ellps"]])
    for p4, cf_key in PROJ4_CF_ELLIPSOID_MAP.items():
        if p4 in data:
            atts[cf_key] = data[p4]
    return atts
