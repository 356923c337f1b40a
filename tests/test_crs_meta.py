"""F18/F19 CF ↔ proj4 metadata round-trips — mirrors the reference's
test_crs.py cases (lcc w/ 2 standard parallels, latlong, utm, stere)."""

from trefoil_spark.functions.crs import cf_to_proj4, parse_proj4, proj4_to_cf


def test_lcc_roundtrip():
    # reference test_crs.py:12-41
    atts = {
        "grid_mapping_name": "lambert_conformal_conic",
        "latitude_of_projection_origin": 47.5,
        "longitude_of_central_meridian": -97,
        "standard_parallel": [30, 60],
        "false_northing": 3200000,
        "false_easting": 3825000,
    }
    p4 = cf_to_proj4(atts)
    d = parse_proj4(p4)
    assert d["proj"] == "lcc"
    assert d["lat_0"] == 47.5 and d["lon_0"] == -97
    assert d["lat_1"] == 30 and d["lat_2"] == 60
    assert d["x_0"] == 3825000 and d["y_0"] == 3200000

    back = proj4_to_cf(p4)
    assert back["grid_mapping_name"] == "lambert_conformal_conic"
    assert back["standard_parallel"] == [30, 60]
    assert back["latitude_of_projection_origin"] == 47.5


def test_latlong_with_ellipsoid():
    # reference test_crs.py:43-60
    atts = {
        "grid_mapping_name": "latitude_longitude",
        "semi_major_axis": 6378137.0,
        "inverse_flattening": 298.257223563,
    }
    p4 = cf_to_proj4(atts)
    d = parse_proj4(p4)
    assert d["proj"] == "latlong"
    assert d["a"] == 6378137.0 and d["rf"] == 298.257223563


def test_datum_fixups():
    cf = proj4_to_cf("+proj=tmerc +lat_0=0 +lon_0=-123 +k_0=0.9996 +datum=NAD83")
    assert cf["grid_mapping_name"] == "transverse_mercator"
    assert cf["semi_major_axis"] == 6378137.0
    assert cf["inverse_flattening"] == 298.257222101  # GRS80

    cf27 = proj4_to_cf("+proj=utm +zone=10 +datum=NAD27")
    assert cf27["utm_zone_number"] == 10
    assert cf27["semi_major_axis"] == 6378206.4  # clrk66


def test_stere():
    cf = proj4_to_cf(
        "+proj=stere +lat_0=90 +lat_ts=60 +lon_0=263 +k_0=90 +x_0=3475000 "
        "+y_0=7475000 +ellps=WGS84"
    )
    assert cf["grid_mapping_name"] == "polar_stereographic"
    assert cf["straight_vertical_longitude_from_pole"] == 263
    assert cf["standard_parallel"] == 60
    # and back
    p4 = cf_to_proj4(cf)
    d = parse_proj4(p4)
    assert d["proj"] == "stere" and d["lat_ts"] == 60


def test_existing_proj4_passthrough():
    assert cf_to_proj4({"proj4": "+proj=merc"}) == "+proj=merc"
    assert cf_to_proj4({"grid_mapping_name": "unsupported_thing"}) is None
