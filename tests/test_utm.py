"""UtmConverter port: the UtmConverterTest goldens, the full
grid-zone round trip, inverse conversion, and the pure-JVM column
twin (plan-asserted zero Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgp.utm import (UTM_BAND_CHARS, grid_zone_to_lat_lon, to_lat_lon,
                     to_utm, utm_band, utm_cols, utm_to_string,
                     utm_zone)


def test_to_utm_golden():
    # UtmConverterTest.testToUtm (Dresden)
    e, n, zone, band = to_utm(51.049259, 13.73836)
    assert zone == 33 and band == "U"
    assert e == pytest.approx(411566.4905930299, abs=1e-5)
    assert n == pytest.approx(5656059.942193874, abs=1e-5)
    assert utm_to_string(e, n, zone, band) == "33U 411566 5656060"


def test_to_lat_lon_golden():
    lat, lon = to_lat_lon(411566, 5656059, 33, False)
    assert lat == pytest.approx(51.049259, abs=1e-4)
    assert lon == pytest.approx(13.73836, abs=1e-4)


def test_utm_zone_and_band_goldens():
    assert utm_zone(51.049259, 13.73836) == 33
    assert utm_band(-75) == "C"
    assert utm_band(-23) == "K"
    assert utm_band(-31) == "J"
    assert utm_band(85) == "Z"


def test_zone_exceptions():
    # Norway 32V widening
    assert utm_zone(60.0, 5.0) == 32
    # Svalbard bands
    assert utm_zone(78.0, 8.0) == 31
    assert utm_zone(78.0, 15.0) == 33
    assert utm_zone(78.0, 25.0) == 35
    assert utm_zone(78.0, 35.0) == 37


def test_grid_zone_full_round_trip():
    # UtmConverterTest.testGridZoneToCoordinate
    for zone in range(1, 61):
        for band in UTM_BAND_CHARS:
            gz = f"{zone}{band}"
            if gz in ("32X", "34X", "36X"):
                continue  # does not exist
            lat, lon = grid_zone_to_lat_lon(gz)
            _, _, z2, b2 = to_utm(lat, lon)
            assert f"{z2}{b2}" == gz


def test_grid_zone_illegal_arguments():
    for bad in ("", "0C", "61C", "1A", "1Z"):
        with pytest.raises(ValueError):
            grid_zone_to_lat_lon(bad)


def test_forward_inverse_consistency():
    for lat, lon in [(51.05, 13.74), (-33.86, 151.21), (40.71, -74.0),
                     (-0.5, 0.5), (83.9, 170.0), (-79.9, -170.0)]:
        e, n, zone, _ = to_utm(lat, lon)
        la, lo = to_lat_lon(e, n, zone, lat < 0)
        assert la == pytest.approx(lat, abs=1e-6)
        assert lo == pytest.approx(lon, abs=1e-6)


def test_column_twin_matches_pure(spark):
    rows = [(i, -80.0 + i * 7.37, -180.0 + i * 16.1)
            for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = df.select("lat", "lon",
                    *utm_cols(F.col("lat"), F.col("lon"))).collect()
    for r in out:
        e, n, zone, band = to_utm(r["lat"], r["lon"])
        assert r["zone"] == zone and r["band"] == band
        assert r["easting"] == pytest.approx(e, abs=1e-6)
        assert r["northing"] == pytest.approx(n, abs=1e-6)


def test_column_twin_plan_pure_jvm(spark):
    df = spark.range(5).select(
        (F.col("id") * 1.0).alias("lat"), (F.col("id") * 2.0).alias("lon"))
    plan = df.select(*utm_cols(F.col("lat"), F.col("lon"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
