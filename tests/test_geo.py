"""UTM inverse projection tests against known geodetic fixtures."""

import math

import pytest

from treee_tpu import geo


def test_parse_proj_reference_default():
    # the reference's default location string (mod.rs:53)
    p = geo.parse_proj("+proj=utm\n+ellps=GRS80\n+zone=32")
    assert p == {"zone": 32, "south": False, "ellps": "GRS80"}


def test_parse_proj_rejects_unknown():
    with pytest.raises(geo.ProjError):
        geo.parse_proj("+proj=merc +zone=32")
    with pytest.raises(geo.ProjError):
        geo.parse_proj("+proj=utm +zone=99")


def test_utm_known_point_munich():
    # UTM 32U 691609.6 5334759.9 ~= 48.1372N 11.5756E (Munich Marienplatz)
    lon, lat = geo.utm_to_latlong(691609.6, 5334759.9, zone=32)
    assert abs(math.degrees(lat) - 48.1372) < 2e-4
    assert abs(math.degrees(lon) - 11.5756) < 2e-4


def test_utm_central_meridian():
    # on the central meridian, easting = 500000 -> longitude = zone center
    lon, lat = geo.utm_to_latlong(500000.0, 5000000.0, zone=32)
    assert abs(math.degrees(lon) - 9.0) < 1e-9
    assert 45.0 < math.degrees(lat) < 45.2  # ~45.1N


def _utm_forward(lat_deg, lon_deg, zone, south=False, ellps="GRS80"):
    """Forward Krüger series (independent alpha coefficients) as test oracle."""
    a, f = geo._ELLIPSOIDS[ellps]
    n = f / (2.0 - f)
    big_a = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    lat = math.radians(lat_deg)
    lon0 = math.radians(zone * 6.0 - 183.0)
    dlon = math.radians(lon_deg) - lon0
    t = math.sinh(
        math.atanh(math.sin(lat))
        - 2.0 * math.sqrt(n) / (1.0 + n) * math.atanh(
            2.0 * math.sqrt(n) / (1.0 + n) * math.sin(lat))
    )
    xi = math.atan2(t, math.cos(dlon))
    eta = math.atanh(math.sin(dlon) / math.sqrt(1.0 + t * t))
    alpha = [
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0 + 41.0 * n**4 / 180.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0 + 557.0 * n**4 / 1440.0,
        61.0 * n**3 / 240.0 - 103.0 * n**4 / 140.0,
        49561.0 * n**4 / 161280.0,
    ]
    x, y = eta, xi
    for j, c in enumerate(alpha, start=1):
        y += c * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        x += c * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    easting = geo.UTM_FALSE_EASTING + geo.UTM_SCALE * big_a * x
    northing = geo.UTM_SCALE * big_a * y
    if south:
        northing += geo.UTM_FALSE_NORTHING_SOUTH
    return easting, northing


def test_utm_forward_inverse_roundtrip():
    for lat, lon, zone, south in (
        (48.1372, 11.5756, 32, False),
        (-33.8688, 151.2093, 56, True),
        (63.4305, 10.3951, 32, False),   # Trondheim, off-zone longitude
        (0.5, 9.1, 32, False),
    ):
        e, nn = _utm_forward(lat, lon, zone, south)
        lon2, lat2 = geo.utm_to_latlong(e, nn, zone, south)
        assert abs(math.degrees(lat2) - lat) < 1e-7
        assert abs(math.degrees(lon2) - lon) < 1e-7


def test_segment_coords_swizzle():
    # world z is -northing (laz.rs:210 swizzle); offsets add
    lon1, lat1 = geo.segment_coords(
        [500000.0, 0.0, -5334000.0], [0.0, 0, 0.0], [0.0, 0, 0.0],
        "+proj=utm +zone=32",
    )
    lon2, lat2 = geo.utm_to_latlong(500000.0, 5334000.0, 32)
    assert (lon1, lat1) == (lon2, lat2)


def test_format_degrees():
    s = geo.format_degrees(math.radians(48.5))
    assert s == "48°30'00.0\""
