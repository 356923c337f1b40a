"""CF time codec, packing, fill values, path parsing (F14-F17, F22)."""

import datetime

import pytest

from trefoil_spark.functions.cftime import date2num, infer_unit, num2date, parse_units
from trefoil_spark.functions.packing import (
    get_fill_value,
    get_pack_atts,
    resolve_dataset_variable,
)


def test_parse_units():
    unit, epoch = parse_units("days since 1990-01-01")
    assert unit == "day" and epoch == datetime.datetime(1990, 1, 1)
    unit, epoch = parse_units("hours since 2000-06-15 12:00:00")
    assert unit == "hour" and epoch.hour == 12


def test_num2date_standard_roundtrip():
    dates = num2date([0, 1, 365], "days since 1990-01-01", "standard")
    assert dates[0] == datetime.datetime(1990, 1, 1)
    assert dates[1] == datetime.datetime(1990, 1, 2)
    assert dates[2] == datetime.datetime(1991, 1, 1)
    nums = date2num(dates, "days since 1990-01-01")
    assert nums == [0.0, 1.0, 365.0]


def test_num2date_360day():
    # 360-day calendar: every month is 30 days
    out = num2date([0, 30, 359, 360], "days since 2000-01-01", "360_day")
    assert out[0][:3] == (2000, 1, 1)
    assert out[1][:3] == (2000, 2, 1)
    assert out[2][:3] == (2000, 12, 30)
    assert out[3][:3] == (2001, 1, 1)


def test_num2date_noleap():
    out = num2date([0, 59, 365], "days since 2000-01-01", "noleap")
    assert out[0][:3] == (2000, 1, 1)
    assert out[1][:3] == (2000, 3, 1)  # no Feb 29 in noleap
    assert out[2][:3] == (2001, 1, 1)


def test_infer_unit():
    assert infer_unit([86400.0]) == "day"
    assert infer_unit([3600.0]) == "hour"
    assert infer_unit([60.0]) == "minute"
    assert infer_unit([366 * 86400.0]) == "year"


def test_pack_atts_reference_formula():
    # reference utilities.py:385-416: scale=(max-min)/(2^bits-2), offset=min
    scale, offset = get_pack_atts("uint8", 0.0, 254.0)
    assert scale == 1.0 and offset == 0.0
    scale, offset = get_pack_atts("uint16", 1.0, 50.0)
    assert scale == 49.0 / 65534
    with pytest.raises(ValueError):
        get_pack_atts("float32", 0, 1)


def test_fill_values():
    assert get_fill_value("uint16") == 65535
    assert get_fill_value("float32") == pytest.approx(9.969209968386869e36)
    with pytest.raises(ValueError):
        get_fill_value("complex128")


def test_resolve_dataset_variable():
    assert resolve_dataset_variable("file.nc:tmin") == ("file.nc", "tmin")
    assert resolve_dataset_variable("file.nc") == ("file.nc", None)
    assert resolve_dataset_variable("C:\\data\\file.nc") == ("C:\\data\\file.nc", None)
    assert resolve_dataset_variable("/a/b.nc:v2") == ("/a/b.nc", "v2")


def test_zonal_csv_layout(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    from trefoil_spark.operators.zonal import write_zonal_csv, zonal_statistics

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.lit("file0").alias("filename"),
        F.lit("qty").alias("variable"),
        F.col("l_returnflag").alias("zone"),
        F.col("l_quantity").alias("v"),
    )
    stats = zonal_statistics(df, ["filename", "variable", "zone"], "v")
    out = str(tmp_path / "zonal_csv")
    write_zonal_csv(stats, out, has_time=False)
    back = spark.read.option("header", True).csv(out)
    # reference layout: filename, variable, zone lead the stat columns
    assert back.columns[:3] == ["filename", "variable", "zone"]
    assert back.count() == stats.count()


def test_detect_geo_dims_and_interval():
    """F21 heuristic parity (reference describe.py:10-26,95-105)."""
    from trefoil_spark.sources.ingest import detect_geo_dims, get_interval

    # bare common names
    d = detect_geo_dims(["time", "lat", "lon"], dim_sizes={"time": 12})
    assert d == {"x": "lon", "y": "lat", "time": "time"}
    # standard_name wins over unrecognized bare names
    d = detect_geo_dims(
        ["t", "rlat", "rlon"],
        standard_names={"rlat": "grid_latitude", "rlon": "grid_longitude",
                        "t": "time"},
        dim_sizes={"t": 4},
    )
    assert d == {"x": "rlon", "y": "rlat", "time": "t"}
    # single-step time is NOT a time dimension (reference :104)
    d = detect_geo_dims(["time", "y", "x"], dim_sizes={"time": 1})
    assert d["time"] is None and d["x"] == "x" and d["y"] == "y"

    assert get_interval([0.0, 0.5, 1.0, 1.5]) == 0.5
    assert get_interval([3.0, 2.0, 1.0]) == 1.0  # descending → abs
    assert get_interval([0.0, 1.0, 3.0]) is None
    assert get_interval([7.0]) is None
