"""UTM <-> lat/lon conversion (palladian-experimental
helper/geo/UtmConverter.java:1-396, UtmCoordinate.java:1-66).

Transverse-Mercator series (Hoffmann-Wellenhof et al.) with the WGS84
constants sm_a=6378137.0 / sm_b=6356752.314 and scale 0.9996 exactly
as the reference; utmZone with the Norway and Svalbard exception
bands (UtmConverter.java:312-336); utmBand over the CDEFGHJKLMNPQRS
TUVWXX table with 'Z' outside [-80, 84] (:346-350); gridZoneToLatLon
grid-center approximation incl. the 31V/32V Norway longitudes
(:365-394); UtmCoordinate.toString's Math.round (= floor(x+0.5))
formatting.

Spark shape: `utm_cols` renders the ENTIRE forward conversion as
pure JVM column expressions (sin/cos/tan/pow + CASE zone logic) —
whole-stage-codegen, zero Python, suitable for converting billions of
coordinates; the pure twins below remain for driver-side use and
goldens.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

SM_A = 6378137.0
SM_B = 6356752.314
UTM_SCALE = 0.9996
UTM_BAND_CHARS = "CDEFGHJKLMNPQRSTUVWXX"


def arc_length_of_meridian(phi: float) -> float:
    """UtmConverter.arcLengthOfMeridian (:54-70)."""
    n = (SM_A - SM_B) / (SM_A + SM_B)
    alpha = ((SM_A + SM_B) / 2.0) * (1.0 + n ** 2 / 4.0 + n ** 4 / 64.0)
    beta = -3.0 * n / 2.0 + 9.0 * n ** 3 / 16.0 - 3.0 * n ** 5 / 32.0
    gamma = 15.0 * n ** 2 / 16.0 - 15.0 * n ** 4 / 32.0
    delta = -35.0 * n ** 3 / 48.0 + 105.0 * n ** 5 / 256.0
    epsilon = 315.0 * n ** 4 / 512.0
    return alpha * (phi + beta * math.sin(2 * phi)
                    + gamma * math.sin(4 * phi)
                    + delta * math.sin(6 * phi)
                    + epsilon * math.sin(8 * phi))


def utm_central_meridian(zone: int) -> float:
    return math.radians(-183.0 + zone * 6.0)


def footpoint_latitude(y: float) -> float:
    """UtmConverter.footpointLatitude (:96-117)."""
    n = (SM_A - SM_B) / (SM_A + SM_B)
    alpha_ = ((SM_A + SM_B) / 2.0) * (1 + n ** 2 / 4 + n ** 4 / 64)
    y_ = y / alpha_
    beta_ = 3.0 * n / 2.0 - 27.0 * n ** 3 / 32.0 + 269.0 * n ** 5 / 512.0
    gamma_ = 21.0 * n ** 2 / 16.0 - 55.0 * n ** 4 / 32.0
    delta_ = 151.0 * n ** 3 / 96.0 - 417.0 * n ** 5 / 128.0
    epsilon_ = 1097.0 * n ** 4 / 512.0
    return (y_ + beta_ * math.sin(2 * y_) + gamma_ * math.sin(4 * y_)
            + delta_ * math.sin(6 * y_) + epsilon_ * math.sin(8 * y_))


def map_lat_lon_to_xy(lat: float, lon: float,
                      lambda0: float) -> tuple[float, float]:
    """UtmConverter.mapLatLonToXY (:127-166)."""
    phi = math.radians(lat)
    lam = math.radians(lon)
    ep2 = (SM_A ** 2 - SM_B ** 2) / SM_B ** 2
    nu2 = ep2 * math.cos(phi) ** 2
    big_n = SM_A ** 2 / (SM_B * math.sqrt(1 + nu2))
    t = math.tan(phi)
    t2 = t * t
    ln = lam - lambda0
    l3 = 1.0 - t2 + nu2
    l4 = 5.0 - t2 + 9 * nu2 + 4.0 * nu2 * nu2
    l5 = 5.0 - 18.0 * t2 + t2 * t2 + 14.0 * nu2 - 58.0 * t2 * nu2
    l6 = 61.0 - 58.0 * t2 + t2 * t2 + 270.0 * nu2 - 330.0 * t2 * nu2
    l7 = 61.0 - 479.0 * t2 + 179.0 * t2 * t2 - t2 * t2 * t2
    l8 = 1385.0 - 3111.0 * t2 + 543.0 * t2 * t2 - t2 * t2 * t2
    cp = math.cos(phi)
    x = (big_n * cp * ln + big_n / 6.0 * cp ** 3 * l3 * ln ** 3
         + big_n / 120.0 * cp ** 5 * l5 * ln ** 5
         + big_n / 5040.0 * cp ** 7 * l7 * ln ** 7)
    y = (arc_length_of_meridian(phi)
         + t / 2.0 * big_n * cp ** 2 * ln ** 2
         + t / 24.0 * big_n * cp ** 4 * l4 * ln ** 4
         + t / 720.0 * big_n * cp ** 6 * l6 * ln ** 6
         + t / 40320.0 * big_n * cp ** 8 * l8 * ln ** 8)
    return x, y


def map_xy_to_lat_lon(x: float, y: float,
                      lambda0: float) -> tuple[float, float]:
    """UtmConverter.mapXYToLatLon (:182-257) — returns radians."""
    phif = footpoint_latitude(y)
    ep2 = (SM_A ** 2 - SM_B ** 2) / SM_B ** 2
    cf = math.cos(phif)
    nuf2 = ep2 * cf ** 2
    nf = SM_A ** 2 / (SM_B * math.sqrt(1 + nuf2))
    nfpow = nf
    tf = math.tan(phif)
    tf2 = tf * tf
    tf4 = tf2 * tf2
    x1frac = 1.0 / (nfpow * cf)
    nfpow *= nf
    x2frac = tf / (2.0 * nfpow)
    nfpow *= nf
    x3frac = 1.0 / (6.0 * nfpow * cf)
    nfpow *= nf
    x4frac = tf / (24.0 * nfpow)
    nfpow *= nf
    x5frac = 1.0 / (120.0 * nfpow * cf)
    nfpow *= nf
    x6frac = tf / (720.0 * nfpow)
    nfpow *= nf
    x7frac = 1.0 / (5040.0 * nfpow * cf)
    nfpow *= nf
    x8frac = tf / (40320.0 * nfpow)
    x2poly = -1.0 - nuf2
    x3poly = -1.0 - 2 * tf2 - nuf2
    x4poly = (5.0 + 3.0 * tf2 + 6.0 * nuf2 - 6.0 * tf2 * nuf2
              - 3.0 * nuf2 * nuf2 - 9.0 * tf2 * nuf2 * nuf2)
    x5poly = 5.0 + 28.0 * tf2 + 24.0 * tf4 + 6.0 * nuf2 + 8.0 * tf2 * nuf2
    x6poly = -61.0 - 90.0 * tf2 - 45.0 * tf4 - 107.0 * nuf2 \
        + 162.0 * tf2 * nuf2
    x7poly = -61.0 - 662.0 * tf2 - 1320.0 * tf4 - 720.0 * tf4 * tf2
    x8poly = 1385.0 + 3633.0 * tf2 + 4095.0 * tf4 + 1575 * tf4 * tf2
    lat = (phif + x2frac * x2poly * x * x + x4frac * x4poly * x ** 4
           + x6frac * x6poly * x ** 6 + x8frac * x8poly * x ** 8)
    lon = (lambda0 + x1frac * x + x3frac * x3poly * x ** 3
           + x5frac * x5poly * x ** 5 + x7frac * x7poly * x ** 7)
    return lat, lon


def utm_zone(lat: float, lon: float) -> int:
    """UtmConverter.utmZone (:312-336): Norway + Svalbard rules."""
    zone = int(math.floor((lon + 180.0) / 6)) + 1
    if 56.0 <= lat < 64.0 and 3.0 <= lon < 12.0:
        zone = 32
    if 72.0 <= lat < 84.0:
        if 0.0 <= lon < 9.0:
            zone = 31
        elif 9.0 <= lon < 21.0:
            zone = 33
        elif 21.0 <= lon < 33.0:
            zone = 35
        elif 33.0 <= lon < 42.0:
            zone = 37
    return zone


def utm_band(lat: float) -> str:
    """UtmConverter.utmBand (:346-350)."""
    if -80 <= lat <= 84:
        return UTM_BAND_CHARS[int(lat + 80) // 8]
    return "Z"


def to_utm(lat: float, lon: float) -> tuple[float, float, int, str]:
    """UtmConverter.toUtm (:266-277) -> (easting, northing, zone,
    band)."""
    zone = utm_zone(lat, lon)
    band = utm_band(lat)
    x, y = map_lat_lon_to_xy(lat, lon, utm_central_meridian(zone))
    x = x * UTM_SCALE + 500000.0
    y *= UTM_SCALE
    if y < 0.0:
        y += 10000000.0
    return x, y, zone, band


def to_lat_lon(easting: float, northing: float, zone: int,
               south_hemi: bool) -> tuple[float, float]:
    """UtmConverter.toLatLon (:289-300)."""
    easting = (easting - 500000.0) / UTM_SCALE
    if south_hemi:
        northing -= 10000000.0
    northing /= UTM_SCALE
    lat, lon = map_xy_to_lat_lon(easting, northing,
                                 utm_central_meridian(zone))
    return math.degrees(lat), math.degrees(lon)


def utm_to_string(easting: float, northing: float, zone: int,
                  band: str) -> str:
    """UtmCoordinate.toString (:55-57): Math.round = floor(x+0.5)."""
    return (f"{zone}{band} {int(math.floor(easting + 0.5))} "
            f"{int(math.floor(northing + 0.5))}")


def grid_zone_to_lat_lon(grid_zone: str) -> tuple[float, float]:
    """UtmConverter.gridZoneToLatLon (:365-394)."""
    import re
    if not grid_zone:
        raise ValueError("gridZone must not be empty")
    digits = re.sub(r"[A-Z]+", "", grid_zone)
    try:
        zone = int(digits)
    except ValueError as e:
        raise ValueError(f"'{grid_zone}' cannot be parsed.") from e
    if zone < 1 or zone > 60:
        raise ValueError(f"Invalid UTM zone: {zone}.")
    band = re.sub(r"[0-9]+", "", grid_zone)[0]
    band_idx = UTM_BAND_CHARS.find(band)
    if band_idx == -1:
        raise ValueError(f"Unknown UTM band: '{band}'.")
    lat = band_idx * 8 - 76
    lon = (zone - 1) * 6 - 177
    if band == "V":
        if zone == 31:
            lon = 1.5
        elif zone == 32:
            lon = 7.5
    return float(lat), float(lon)


# ---------------------------------------------------------- column twin

def utm_zone_col(lat: Column, lon: Column) -> Column:
    """utmZone as a pure column expression (Norway/Svalbard CASEs)."""
    base = F.floor((lon + 180.0) / 6).cast("int") + 1
    zone = F.when((lat >= 56.0) & (lat < 64.0)
                  & (lon >= 3.0) & (lon < 12.0), 32).otherwise(base)
    return (F.when((lat >= 72.0) & (lat < 84.0),
                   F.when((lon >= 0.0) & (lon < 9.0), 31)
                   .when((lon >= 9.0) & (lon < 21.0), 33)
                   .when((lon >= 21.0) & (lon < 33.0), 35)
                   .when((lon >= 33.0) & (lon < 42.0), 37)
                   .otherwise(zone))
            .otherwise(zone))


def utm_band_col(lat: Column) -> Column:
    idx = ((lat + 80).cast("int") / 8).cast("int") + 1  # 1-based substr
    return F.when((lat >= -80) & (lat <= 84),
                  F.substring(F.lit(UTM_BAND_CHARS), idx, 1)) \
        .otherwise(F.lit("Z"))


def utm_cols(lat: Column, lon: Column) -> list[Column]:
    """toUtm as pure JVM columns -> [easting, northing, zone, band]
    (whole-stage codegen; no Python anywhere in the plan)."""
    zone = utm_zone_col(lat, lon)
    lambda0 = F.radians(-183.0 + zone.cast("double") * 6.0)
    phi = F.radians(lat)
    lam = F.radians(lon)
    n = (SM_A - SM_B) / (SM_A + SM_B)
    alpha = ((SM_A + SM_B) / 2.0) * (1.0 + n ** 2 / 4.0 + n ** 4 / 64.0)
    beta = -3.0 * n / 2.0 + 9.0 * n ** 3 / 16.0 - 3.0 * n ** 5 / 32.0
    gamma = 15.0 * n ** 2 / 16.0 - 15.0 * n ** 4 / 32.0
    delta = -35.0 * n ** 3 / 48.0 + 105.0 * n ** 5 / 256.0
    epsilon = 315.0 * n ** 4 / 512.0
    arc = alpha * (phi + beta * F.sin(2 * phi) + gamma * F.sin(4 * phi)
                   + delta * F.sin(6 * phi) + epsilon * F.sin(8 * phi))
    ep2 = (SM_A ** 2 - SM_B ** 2) / SM_B ** 2
    cp = F.cos(phi)
    nu2 = ep2 * cp * cp
    big_n = SM_A ** 2 / (SM_B * F.sqrt(nu2 + 1))
    t = F.tan(phi)
    t2 = t * t
    ln = lam - lambda0
    l3 = 1.0 - t2 + nu2
    l4 = 5.0 - t2 + 9 * nu2 + 4.0 * nu2 * nu2
    l5 = 5.0 - 18.0 * t2 + t2 * t2 + 14.0 * nu2 - 58.0 * t2 * nu2
    l6 = 61.0 - 58.0 * t2 + t2 * t2 + 270.0 * nu2 - 330.0 * t2 * nu2
    l7 = 61.0 - 479.0 * t2 + 179.0 * t2 * t2 - t2 * t2 * t2
    l8 = 1385.0 - 3111.0 * t2 + 543.0 * t2 * t2 - t2 * t2 * t2
    x = (big_n * cp * ln
         + big_n / 6.0 * F.pow(cp, 3.0) * l3 * F.pow(ln, 3.0)
         + big_n / 120.0 * F.pow(cp, 5.0) * l5 * F.pow(ln, 5.0)
         + big_n / 5040.0 * F.pow(cp, 7.0) * l7 * F.pow(ln, 7.0))
    y = (arc + t / 2.0 * big_n * cp * cp * ln * ln
         + t / 24.0 * big_n * F.pow(cp, 4.0) * l4 * F.pow(ln, 4.0)
         + t / 720.0 * big_n * F.pow(cp, 6.0) * l6 * F.pow(ln, 6.0)
         + t / 40320.0 * big_n * F.pow(cp, 8.0) * l8 * F.pow(ln, 8.0))
    easting = x * UTM_SCALE + 500000.0
    northing_raw = y * UTM_SCALE
    northing = F.when(northing_raw < 0.0,
                      northing_raw + 10000000.0).otherwise(northing_raw)
    return [easting.alias("easting"), northing.alias("northing"),
            zone.alias("zone"), utm_band_col(lat).alias("band")]
